package graft.sources

import graft.sources.lwes.{LwesKeyedPartition, LwesOptions, LwesScan}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** A29 — storage-partitioned joins: a partitioned journal layout
  * reports KeyGroupedPartitioning (identity transforms over the path
  * partition columns) and every planned task carries its key row, so
  * two co-partitioned journal tables join — and aggregate on the key —
  * with ZERO hash exchanges when Spark's
  * `spark.sql.sources.v2.bucketing.enabled` is on. Every plan-shape
  * assertion is paired with a value-parity assertion against the
  * conf-off plan: the report may only move WHERE rows meet, never
  * which rows. */
class LwesSpjSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val Spj = "spark.sql.sources.v2.bucketing.enabled"
  private val Abj = "spark.sql.autoBroadcastJoinThreshold"

  /** Run `body` with SPJ on and broadcasts off, restoring both confs. */
  private def withSpj[T](on: Boolean)(body: => T): T = {
    val (s0, a0) = (spark.conf.get(Spj, "false"), spark.conf.get(Abj))
    spark.conf.set(Spj, on.toString); spark.conf.set(Abj, "-1")
    try body finally { spark.conf.set(Spj, s0); spark.conf.set(Abj, a0) }
  }

  private def tmp(): String = Files.createTempDirectory("lwes-spj").toString

  private def writeDirs(nTypes: Int = 4, bDrops: Set[Int] = Set.empty)
      : (String, String) = {
    import spark.implicits._
    val (dirA, dirB) = (tmp(), tmp())
    val base = (0 until 2000).toDF("id")
      .select(col("id"), concat(lit("t"), col("id") % nTypes).as("etype"),
        (col("id") % 37).as("user_id"), (col("id") * 1.5).as("value"))
    base.write.format("lwes").option("eventName", "Sp::A")
      .option("partitionBy", "etype").mode("append").save(dirA)
    base.filter(!col("etype").isin(bDrops.map(i => s"t$i").toSeq.map(lit): _*))
      .select(col("id"), col("etype"), col("user_id"))
      .write.format("lwes").option("eventName", "Sp::B")
      .option("partitionBy", "etype").mode("append").save(dirB)
    (dirA, dirB)
  }

  private def joined(dirA: String, dirB: String,
      extra: (String, String)*): DataFrame = {
    def rd(dir: String, ev: String, ddl: String) = {
      val b = spark.read.format("lwes").schema(ddl).option("eventName", ev)
      extra.foldLeft(b) { case (r, (k, v)) => r.option(k, v) }.load(dir)
    }
    val a = rd(dirA, "Sp::A", "id long, user_id long, value double, etype string")
    val b = rd(dirB, "Sp::B", "id long, user_id long, etype string")
      .groupBy(col("etype")).agg(countDistinct(col("user_id")).as("nu"))
    a.join(b, Seq("etype"))
      .groupBy(col("etype"), col("nu"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("tv"))
      .orderBy(col("etype"))
  }

  private def hashExchanges(df: DataFrame): Int = {
    df.collect()
    "Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).length
  }

  test("co-partitioned join + key aggregate run with zero hash exchanges") {
    val (a, b) = writeDirs()
    val (on, off) = withSpj(on = true) {
      val d = joined(a, b)
      val rows = d.collect()
      val plan = d.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        "storage-partitioned join still shuffled")
      (rows, withSpj(on = false) { joined(a, b).collect() })
    }
    assert(on.map(_.toString).sameElements(off.map(_.toString)))
  }

  test("conf off keeps the shuffling plan and the same answer") {
    val (a, b) = writeDirs()
    withSpj(on = false) {
      assert(hashExchanges(joined(a, b)) > 0,
        "expected the ordinary shuffle plan with SPJ disabled")
    }
  }

  test("spjPartitioning=false opts out under an enabled conf") {
    val (a, b) = writeDirs()
    withSpj(on = true) {
      val opt = LwesOptions.SpjPartitioning -> "false"
      assert(hashExchanges(joined(a, b, opt)) > 0)
      val d = joined(a, b, opt)
      d.collect()
      val parts = LwesScan.scansIn(d.queryExecution.executedPlan)
        .flatMap(_.planInputPartitions())
      assert(parts.nonEmpty && !parts.exists(_.isInstanceOf[LwesKeyedPartition]))
    }
  }

  test("key-grouped planning wraps every partition with its key") {
    val (a, _) = writeDirs()
    withSpj(on = true) {
      // aggPushdown off: a pushed GROUP BY partition-col COUNT (A32)
      // would answer this from metadata and re-plan around the keyed
      // partitioning; this test pins the SPJ path that non-pushable
      // aggregates (SUM, AVG) still ride
      val d = spark.read.format("lwes")
        .schema("id long, etype string").option("eventName", "Sp::A")
        .option(graft.sources.lwes.LwesOptions.AggPushdown, "false").load(a)
        .groupBy(col("etype")).agg(count(lit(1)).as("n")).orderBy(col("etype"))
      d.collect()
      assert(!d.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"),
        "group-by on the partition key still shuffled")
      val parts = LwesScan.scansIn(d.queryExecution.executedPlan)
        .flatMap(_.planInputPartitions())
      assert(parts.nonEmpty && parts.forall(_.isInstanceOf[LwesKeyedPartition]))
      val keys = parts.map(_.asInstanceOf[LwesKeyedPartition].keyVals)
      assert(keys.forall(_.length == 1) && keys.flatten.forall(_.startsWith("t")))
    }
  }

  test("misaligned partition sets still answer exactly") {
    val (a, b) = writeDirs(nTypes = 4, bDrops = Set(2))
    val (on, off) = withSpj(on = true) {
      (joined(a, b).collect(), withSpj(on = false) { joined(a, b).collect() })
    }
    assert(on.map(_.toString).sameElements(off.map(_.toString)))
    assert(on.length == 3, "the dropped key must vanish from the inner join")
  }

  test("DPP under SPJ: runtime pruning drops whole key groups, answers exact") {
    // A17 x A29: a dim-side-only predicate runtime-prunes whole
    // `etype=` key groups from a scan that is REPORTING key-grouped
    // partitioning (SPJ conf on, every partition keyed). Spark permits
    // a SUBSET of the reported partition values post-filter; the
    // one-listing-per-scan cache guarantees a replan can never surface
    // a NEW value (which Spark rejects). Spark 4.1 plans the fact-fact
    // join with shuffles here (it does not see key-grouping through
    // the interposed BroadcastHashJoin) — the pin is coexistence and
    // exactness, not plan shape. Values must match the conf-off replay.
    def q(): DataFrame = {
      val (a, b) = writeDirs(nTypes = 4)
      // the build side needs a SELECTIVE filter for DPP to engage, on a
      // NON-key column so nothing propagates statically to the fact
      // scan — and NOT over a LocalRelation, which constant-folds the
      // Filter away before the DPP rule can see it
      val dim = spark.range(4)
        .select(concat(lit("t"), col("id")).as("etype"),
          (col("id") % 2).as("keep"))
        .filter(col("keep") === 1).select("etype")
      def rd(dir: String, ev: String, ddl: String) = spark.read
        .format("lwes").schema(ddl).option("eventName", ev).load(dir)
      val fa = rd(a, "Sp::A", "id long, user_id long, value double, etype string")
        .join(broadcast(dim), Seq("etype"))
      val fb = rd(b, "Sp::B", "id long, user_id long, etype string")
        .groupBy(col("etype")).agg(countDistinct(col("user_id")).as("nu"))
      fa.join(fb, Seq("etype"))
        .groupBy(col("etype"), col("nu"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("tv"))
        .orderBy(col("etype"))
    }
    val (onRows, pruned) = withSpj(on = true) {
      val d = q()
      val rows = d.collect()
      (rows, LwesScan.scansIn(d.queryExecution.executedPlan)
        .map(_.partitionPrunedFileCount).sum)
    }
    assert(pruned > 0, "dynamic pruning never reached the key-grouped scan")
    val offRows = withSpj(on = false) { q().collect() }
    assert(onRows.map(_.toString).sameElements(offRows.map(_.toString)))
    assert(onRows.length == 2, "only the dim's two keys survive")
  }
}
