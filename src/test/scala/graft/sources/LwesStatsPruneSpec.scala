package graft.sources

import graft.sources.lwes.{LwesOptions, LwesScan, LwesStats}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** A27 — attribute zone-map sidecars: batch writes drop a hidden
  * `.<journal>.stats` file; pushed attribute predicates then prune
  * whole journals at plan time. Every test asserts BOTH the prune
  * count and result parity with the unpruned plan — pruning must be
  * invisible to answers. */
class LwesStatsPruneSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(): String = Files.createTempDirectory("lwes-stats").toString

  /** Three disjoint-range files: ids [0,100), [100,200), [200,300);
    * pages "a..", "m..", "z.." respectively. */
  private def writeRanged(dir: String): Unit = {
    import spark.implicits._
    Seq(("a", 0), ("m", 100), ("z", 200)).foreach { case (p, base) =>
      (base until base + 100).map(i => (i.toLong, s"$p/${i % 10}", i * 1.5))
        .toDF("id", "page", "cost").repartition(1)
        .write.format("lwes").option("eventName", "St::E")
        .mode("append").save(dir)
    }
  }

  private def rd(dir: String, extra: (String, String)*): DataFrame = {
    val base = spark.read.format("lwes")
      .schema("id long, page string, cost double")
      .option("eventName", "St::E")
    extra.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }.load(dir)
  }

  private def prunedOf(df: DataFrame): Long = {
    df.collect() // force planning+execution
    LwesScan.scansIn(df.queryExecution.executedPlan)
      .map(_.statsPrunedFileCount).sum
  }

  private def parity(dir: String, f: DataFrame => DataFrame): Unit = {
    val a = f(rd(dir)).orderBy("id").collect()
    val b = f(rd(dir, LwesOptions.StatsPrune -> "false")).orderBy("id").collect()
    assert(a.sameElements(b), "pruned and unpruned answers diverged")
  }

  test("integral range predicates prune whole files from sidecar stats") {
    val dir = tmp()
    writeRanged(dir)
    val q = rd(dir).filter(col("id") < 100)
    assert(q.collect().length == 100)
    assert(prunedOf(rd(dir).filter(col("id") < 100)) == 2L)
    assert(prunedOf(rd(dir).filter(col("id") >= 250)) == 2L)
    assert(prunedOf(rd(dir).filter(col("id") === 150L)) == 2L)
    assert(prunedOf(rd(dir).filter(col("id").isin(5L, 7L))) == 2L)
    parity(dir, _.filter(col("id") < 100))
    parity(dir, _.filter(col("id") === 150L))
  }

  test("string equality / range / prefix predicates prune files") {
    val dir = tmp()
    writeRanged(dir)
    assert(prunedOf(rd(dir).filter(col("page") === "m/5")) == 2L)
    assert(prunedOf(rd(dir).filter(col("page") > "n")) == 2L)
    assert(prunedOf(rd(dir).filter(col("page").startsWith("z/"))) == 2L)
    assert(prunedOf(rd(dir).filter(col("page").isin("a/1", "a/2"))) == 2L)
    parity(dir, _.filter(col("page") === "m/5"))
    parity(dir, _.filter(col("page").startsWith("z/")))
  }

  test("a COMPLETE sidecar lacking the attribute prunes the file") {
    import spark.implicits._
    val dir = tmp()
    (0 until 50).map(i => (i.toLong, i.toLong)).toDF("id", "extra")
      .repartition(1).write.format("lwes").option("eventName", "St::E")
      .mode("append").save(dir)
    (100 until 150).map(i => Tuple1(i.toLong)).toDF("id")
      .repartition(1).write.format("lwes").option("eventName", "St::E")
      .mode("append").save(dir)
    def r(extra: (String, String)*) = {
      val base = spark.read.format("lwes")
        .schema("id long, extra long").option("eventName", "St::E")
      extra.foldLeft(base) { case (x, (k, v)) => x.option(k, v) }.load(dir)
    }
    // the attr-less file cannot satisfy any null-rejecting predicate
    val q = r().filter(col("extra").isNotNull)
    assert(q.collect().length == 50)
    assert(LwesScan.scansIn(q.queryExecution.executedPlan)
      .map(_.statsPrunedFileCount).sum == 1L)
    val a = r().filter(col("extra") === 7L).collect()
    val b = r(LwesOptions.StatsPrune -> "false")
      .filter(col("extra") === 7L).collect()
    assert(a.sameElements(b) && a.length == 1)
  }

  test("deleted or corrupted sidecars keep their files (no pruning)") {
    val dir = tmp()
    writeRanged(dir)
    val d = new java.io.File(dir)
    val sidecars = d.listFiles().filter(_.getName.endsWith(".stats"))
    assert(sidecars.length == 3, "expected one sidecar per journal")
    // corrupt one, delete another
    java.nio.file.Files.writeString(sidecars(0).toPath, "not a sidecar")
    assert(sidecars(1).delete())
    val q = rd(dir).filter(col("id") < 100)
    assert(q.collect().length == 100)
    val pruned = LwesScan.scansIn(q.queryExecution.executedPlan)
      .map(_.statsPrunedFileCount).sum
    assert(pruned <= 1L, s"only the intact sidecar may prune (got $pruned)")
    parity(dir, _.filter(col("id") < 100))
  }

  test("writeStats=false writes no sidecars; statsPrune=false reads none") {
    val dir = tmp()
    import spark.implicits._
    (0 until 50).map(i => (i.toLong, s"p$i", 1.0)).toDF("id", "page", "cost")
      .repartition(1).write.format("lwes").option("eventName", "St::E")
      .option(LwesOptions.WriteStats, "false").mode("append").save(dir)
    assert(!new java.io.File(dir).listFiles()
      .exists(_.getName.endsWith(".stats")))
    assert(rd(dir).filter(col("id") < 10).collect().length == 10)
    val dir2 = tmp()
    writeRanged(dir2)
    assert(prunedOf(rd(dir2, LwesOptions.StatsPrune -> "false")
      .filter(col("id") < 100)) == 0L)
  }

  test("non-ASCII string values disable string pruning for the attr") {
    import spark.implicits._
    val dir = tmp()
    (0 until 50).map(i => (i.toLong, if (i == 0) "café" else s"b$i"))
      .toDF("id", "page").repartition(1)
      .write.format("lwes").option("eventName", "St::E").mode("append").save(dir)
    val q = spark.read.format("lwes").schema("id long, page string")
      .option("eventName", "St::E").load(dir)
      .filter(col("page") === "zzz") // outside [b.., café] byte-range either way
    assert(q.collect().isEmpty)
    assert(LwesScan.scansIn(q.queryExecution.executedPlan)
      .map(_.statsPrunedFileCount).sum == 0L,
      "a non-ASCII value must mark the attr unprunable")
  }

  test("ESF read defaults disable zone-map pruning (defaults satisfy predicates)") {
    import spark.implicits._
    val dir = tmp()
    // journal rows NEVER carry `bonus`; the read-side template defaults
    // it to 42 — a zone map would call the file impossible for
    // bonus = 42 and silently drop every row
    (0 until 30).map(i => Tuple1(i.toLong)).toDF("id")
      .repartition(1).write.format("lwes").option("eventName", "St::E")
      .mode("append").save(dir)
    val tdir = tmp()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(tdir, "t.esf"),
      "St::E {\n  int64 id;\n  int64 bonus = 42;\n}\n")
    val q = spark.read.format("lwes").schema("id long, bonus long")
      .option("eventName", "St::E").option("esf", s"$tdir/t.esf").load(dir)
      .filter(col("bonus") === 42L)
    assert(q.collect().length == 30,
      "default-filled rows must survive the pushed predicate")
    assert(LwesScan.scansIn(q.queryExecution.executedPlan)
      .map(_.statsPrunedFileCount).sum == 0L)
  }

  test("narrowing reads keep files whose stats overflow the column type") {
    import spark.implicits._
    val dir = tmp()
    // int64 attr with values far beyond Int range; read into an INT
    // column — stats min/max cannot speak for the narrowed values
    (0 until 20).map(i => (i.toLong, (1L << 40) + i)).toDF("id", "big")
      .repartition(1).write.format("lwes").option("eventName", "St::E")
      .mode("append").save(dir)
    val q = spark.read.format("lwes").schema("id long, big int")
      .option("eventName", "St::E").load(dir).filter(col("big") < 10)
    q.collect() // whatever the narrowing yields, pruning must not engage
    assert(LwesScan.scansIn(q.queryExecution.executedPlan)
      .map(_.statsPrunedFileCount).sum == 0L)
  }

  test("compaction carries sidecars across the rewrite") {
    val dir = tmp()
    writeRanged(dir)
    graft.sources.lwes.Compact.compact(spark, dir, targetFiles = 1)
    assert(new java.io.File(dir).listFiles()
      .exists(f => f.getName.startsWith(".compact-") &&
        f.getName.endsWith(".stats")),
      "compacted journal should keep a zone-map sidecar")
    val q = rd(dir).filter(col("id") < 100)
    assert(q.collect().length == 100)
    parity(dir, _.filter(col("id") < 100))
  }

  test("the listing proves sidecar absence: bare dirs never pay a GET") {
    import graft.sources.lwes.LwesInputPartition
    def flags(dir: String): Seq[Boolean] = {
      val df = rd(dir).filter(col("id") < 0)
      df.collect()
      LwesScan.scansIn(df.queryExecution.executedPlan)
        .flatMap(_.planInputPartitions().toSeq).flatMap {
          case p: LwesInputPartition => Seq(p)
          case m: graft.sources.lwes.LwesFilesPartition => m.files
        }.map(_.hasStats)
    }
    // raw-writer journals (no sidecars): every planned partition knows
    // from the LISTING that no sidecar exists — statsPrune costs zero
    // extra requests on foreign/bare directories
    val bare = tmp()
    (0 until 3).foreach { i =>
      val w = graft.lwes.JournalWriter.create(s"$bare/j$i.gz")
      w.write(graft.lwes.LwesEvent("St::E").setInt64("id", i.toLong)
        .setString("page", "x").setDouble("cost", 1.0))
      w.close()
    }
    val bf = flags(bare)
    assert(bf.nonEmpty && bf.forall(_ == false), s"bare-dir flags: $bf")
    // DSv2-written journals: flags are true and files actually prune
    val rich = tmp()
    writeRanged(rich)
    val q = rd(rich).filter(col("id") < 0)
    assert(q.collect().isEmpty)
    assert(LwesScan.scansIn(q.queryExecution.executedPlan)
      .map(_.statsPrunedFileCount).sum == 3L)
  }

  test("over the placement cap, pruning defers to executor-side skims") {
    val dir = tmp()
    writeRanged(dir)
    // cap 0 < 3 candidates: the driver plans every file (no sidecar
    // wave, statsPrunedFileCount stays 0) and each task skims its own
    // files — same files skipped, reported under the same metric name
    def q(vec: String) = rd(dir,
      LwesOptions.StatsPruneMaxFiles -> "0", "vectorized" -> vec)
      .filter(col("id") < 0)
    Seq("true", "false").foreach { vec =>
      val df = q(vec)
      assert(df.collect().isEmpty)
      assert(LwesScan.scansIn(df.queryExecution.executedPlan)
        .map(_.statsPrunedFileCount).sum == 0L,
        "over the cap the DRIVER must not have pruned")
      assert(LwesScan.scanMetricSum(df.queryExecution.executedPlan,
        "filesPrunedByStats") == 3L, s"executor skim (vectorized=$vec)")
      assert(LwesScan.scanMetricSum(df.queryExecution.executedPlan,
        "eventsParsed") == 0L)
    }
    // partial skims keep surviving files readable: answers match the
    // plan-time-pruned and the unpruned reads exactly
    val capped = rd(dir, LwesOptions.StatsPruneMaxFiles -> "0")
      .filter(col("id") < 100).orderBy("id").collect()
    val planned = rd(dir).filter(col("id") < 100).orderBy("id").collect()
    val plain = rd(dir, LwesOptions.StatsPrune -> "false")
      .filter(col("id") < 100).orderBy("id").collect()
    assert(capped.sameElements(planned) && capped.sameElements(plain))
  }
}
