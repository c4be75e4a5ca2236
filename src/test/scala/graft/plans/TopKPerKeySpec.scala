package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** B33: per-key top-k via the TopKFromWindow rewrite — custom
  * LogicalPlan + SparkStrategy + bounded-heap exec, no per-group sort. */
class TopKPerKeySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .withExtensions(new graft.GraftExtensions)
    .getOrCreate()

  import spark.implicits._

  test("matches an independently computed top-k per key") {
    val rows = (1 to 5000).map { i => (i % 37L, (i * 7919) % 1000, s"row$i") }
    val df = rows.toDF("k", "score", "payload")
    val topk = TopK.perKey(df, Seq(col("k")),
        Seq(col("score").desc, col("payload").asc), 5)
      .select("k", "rnk", "score", "payload").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    val expected = rows.groupBy(_._1).flatMap { case (k, g) =>
      g.sortBy { case (_, s, p) => (-s, p) }.take(5).zipWithIndex
        .map { case ((_, s, p), i) => (k, i + 1, s, p) }
    }.toSet
    assert(topk.length == expected.size)
    assert(topk.toSet == expected)
  }

  test("k larger than group size returns whole groups, ranked") {
    val df = Seq((1L, 30), (1L, 10), (2L, 20)).toDF("k", "v")
    val out = TopK.perKey(df, Seq(col("k")), Seq(col("v").asc), 10)
      .orderBy("k", "rnk").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(out.toSeq == Seq((1L, 10, 1), (1L, 30, 2), (2L, 20, 1)))
  }

  test("plans as TopKPerKeyExec with a hash exchange and NO sort or window") {
    val df = (1 to 100).map(i => (i % 5L, i)).toDF("k", "v")
    val topk = TopK.perKey(df, Seq(col("k")), Seq(col("v").desc), 3)
    topk.collect() // force AQE final plan
    // physical nodes render without the Exec suffix
    val plan = topk.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(!plan.contains("!TopKPerKey"), plan) // no missing-attribute marker
    assert(!plan.contains("Sort ") && !plan.contains("Window "), plan)
    assert(plan.contains("hashpartitioning"), plan)
  }

  test("buffered-row cap degrades to the spillable sort fallback, same result") {
    // 2000 distinct keys × k=3 = 6000 buffered rows; a cap of 100 forces
    // the external-sort + streaming-rank path almost immediately
    val rows = (1 to 20000).map { i => (i % 2000L, (i * 7919) % 1000, s"r$i") }
    val df = rows.toDF("k", "score", "payload")
    def run() = TopK.perKey(df, Seq(col("k")),
        Seq(col("score").desc, col("payload").asc), 3)
      .select("k", "rnk", "score", "payload").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSet
    val unbounded = run()
    spark.conf.set("spark.graft.topk.maxBufferedRows", "100")
    try {
      val spilled = run()
      assert(spilled == unbounded)
      val expected = rows.groupBy(_._1).flatMap { case (k, g) =>
        g.sortBy { case (_, s, p) => (-s, p) }.take(3).zipWithIndex
          .map { case ((_, s, p), i) => (k, i + 1, s, p) }
      }.toSet
      assert(spilled == expected)
    } finally spark.conf.unset("spark.graft.topk.maxBufferedRows")
  }

  test("rewrite leaves rank()/multi-function windows and global windows alone") {
    import org.apache.spark.sql.expressions.Window
    val df = Seq((1L, 10), (1L, 10), (2L, 5)).toDF("k", "v")
    // rank() has tie semantics a bounded heap cannot honor
    val ranked = df.withColumn("r",
        rank().over(Window.partitionBy("k").orderBy(col("v").desc)))
      .filter(col("r") <= 1)
    assert(!ranked.queryExecution.executedPlan.toString.contains("TopKPerKeyExec"))
    assert(ranked.count() == 3) // both tied rows of k=1 kept by rank()
  }

  test("Similarity ANN top-k paths compile into TopKPerKey (regression guard)") {
    // a Cast between the rnk Filter and the Window once silently blocked
    // the TopKFromWindow rewrite in every ANN path — assert the plans,
    // not just the results
    import graft.operators.Similarity
    val emb = (0 until 40)
      .map(i => (i.toLong, Seq.tabulate(8)(d => ((i * 31 + d * 7) % 13 - 6).toFloat)))
      .toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") < 3)
    for ((name, df) <- Seq(
        "cosineTopK" -> Similarity.cosineTopK(emb, q, "vec_id", "embedding", 5),
        "quantizedTopK" -> Similarity.quantizedTopK(emb, q, "vec_id", "embedding", 5),
        "lshTopK" -> Similarity.lshTopK(emb, q, "vec_id", "embedding", 5),
        "ivfTopK" -> Similarity.ivfTopK(emb, q, "vec_id", "embedding", 5,
          nLists = 2, nprobe = 2))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey"), s"$name lost the TopKPerKey plan:\n$plan")
    }
  }

  test("sampleKPerGroup: exact k per group, salts decorrelate, heap plan (C24)") {
    import graft.operators.Sampling
    val docs = (1 to 200).map(i => (i.toLong, if (i % 2 == 0) "en" else "fr", s"d$i"))
      .toDF("doc_id", "lang", "text")
    def draw(salt: String): Set[(String, Long)] =
      Sampling.sampleKPerGroup(docs, "lang", "doc_id", 5, salt)
        .select("lang", "doc_id").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
    val s = Sampling.sampleKPerGroup(docs, "lang", "doc_id", 5, "a")
    assert(s.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    val a = draw("a")
    assert(a.groupBy(_._1).forall(_._2.size == 5))
    assert(a == draw("a")) // same salt -> same sample
    assert(a != draw("b")) // different salt -> decorrelated draw
  }
}
