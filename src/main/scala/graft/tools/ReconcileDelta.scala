package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the r15 reconcile change: events parsed by the journal
  * scans when reconcileKeepBest re-shingles the full corpus text
  * (old) vs feeding pairs from the stream's persisted signature
  * journal (new). Run: sbt "runMain graft.tools.ReconcileDelta". */
object ReconcileDelta {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // day's ingest journal: documents as Doc::K, plus the signature
    // journal the stream would have persisted (computed batch-side
    // here with the same simhashPortable kernel)
    val dir = java.nio.file.Files.createTempDirectory("recdelta").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"),
        col("n_chars").cast("long").as("n_chars"))
    docs.write.format("lwes").option("eventName", "Doc::K")
      .mode("append").save(dir)
    docs.select(col("doc_id"),
        graft.operators.Dedup.simhashPortable(col("text")).as("sig"))
      .write.format("lwes").option("eventName", "Sig::K")
      .mode("append").save(dir)
    val corpus = spark.read.format("lwes")
      .schema("doc_id long, text string, lang string, n_chars long")
      .option("eventName", "Doc::K").load(dir)
    val sigs = spark.read.format("lwes")
      .schema("doc_id long, sig long")
      .option("eventName", "Sig::K").load(dir)
    def measure(tag: String, sigsOpt: Option[org.apache.spark.sql.DataFrame]): Unit = {
      // wall + survivor count only: the chain runs several actions
      // (CC rounds, the final count), so no single plan's scan metric
      // covers it — pairParse below carries the metric-exact numbers
      val t0 = System.nanoTime()
      val settled = graft.streaming.StreamOps.reconcileKeepBest(corpus,
        "doc_id", "text", length(col("text")).cast("double"), sigs = sigsOpt)
      val n = settled.count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[reconcile-delta] $tag%-10s survivors=$n%d wall=$secs%.2fs")
    }
    measure("from-text", None)
    measure("from-sigs", Some(sigs))
    // pair-stage parse work, metric-exact: the same-DF collect() path
    // populates the executed plan's scan metrics (count() would spawn
    // a separate queryExecution and read zero)
    def pairParse(tag: String, pairs: org.apache.spark.sql.DataFrame): Unit = {
      val agged = pairs.agg(count(lit(1)).as("n"))
      val n = agged.collect().head.getLong(0)
      val parsed = graft.sources.lwes.LwesScan
        .scanMetricSum(agged.queryExecution.executedPlan, "eventsParsed")
      println(s"[reconcile-delta] pairs-$tag: n_pairs=$n eventsParsed=$parsed")
    }
    pairParse("from-text", graft.operators.Dedup.simhashPairs(
      corpus, "text", "doc_id", maxHamming = 3, portable = true))
    pairParse("from-sigs", graft.operators.Dedup.simhashPairsFromSigs(
      sigs, "doc_id", "sig", maxHamming = 3, bits = 48))
    spark.stop()
  }
}
