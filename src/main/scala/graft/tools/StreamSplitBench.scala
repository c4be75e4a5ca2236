package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the r15 streaming `.zsj` split: an AvailableNow drain of
  * ONE fat split journal with frame-run splitting on vs off. Run:
  * `sbt "runMain graft.tools.StreamSplitBench"`
  * (SPARK_GRAFT_SSB_EVENTS to resize, default 2M). */
object StreamSplitBench {
  def main(args: Array[String]): Unit = {
    val nEvents = sys.env.getOrElse("SPARK_GRAFT_SSB_EVENTS", "2000000").toLong
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("ssb").toString
    println(s"writing one fat .zsj of $nEvents events...")
    // monotone ReceiptTime (= id) so the .zsj frame bounds are tight —
    // the shape a real journaller produces (arrival-ordered receipts)
    spark.range(nEvents)
      .select(col("id"), (col("id") % 99991).as("user"),
        concat(lit("payload-"), col("id") % 1000).as("tag"),
        col("id").as("ReceiptTime"))
      .repartition(1)
      .write.format("lwes").option("eventName", "Ssb::E")
      .mode("append").save(dir)
    // simple pass-through drain (no stateful ops): parse-bound, which
    // is what the split parallelism addresses
    def drainFlat(tag: String, split: Option[Long]): Unit = {
      val out = java.nio.file.Files.createTempDirectory(s"ssb-$tag-out").toString
      val ckpt = java.nio.file.Files.createTempDirectory(s"ssb-$tag-ck").toString
      val t0 = System.nanoTime()
      val r = spark.readStream.format("lwes")
        .schema("id long, user long, tag string, ReceiptTime long")
        .option("eventName", "Ssb::E")
      val q = split.fold(r)(t => r.option(
          graft.sources.lwes.LwesOptions.SplitTargetBytes, t.toString))
        .load(dir)
        .select(col("id"), col("user"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val secs = (System.nanoTime() - t0) / 1e9
      val n = spark.read.parquet(out).count()
      require(n == nEvents, s"$tag drained $n of $nEvents rows")
      println(f"[stream-split] $tag%-10s wall=$secs%.2fs " +
        f"(${nEvents / secs / 1e6}%.2f M events/s, rows ok)")
    }
    drainFlat("unsplit", Some(Long.MaxValue >> 1)) // target too big to split
    drainFlat("split", Some(4L << 20))

    // r16: bounded backfill — a 10% ReceiptTime admission window over
    // the same fat journal should decode ~10% of the frames (exact
    // footer bounds), not the whole file
    val lo = nEvents / 10
    val hi = nEvents / 5 - 1
    val out = java.nio.file.Files.createTempDirectory("ssb-win-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ssb-win-ck").toString
    val t0 = System.nanoTime()
    val q = spark.readStream.format("lwes")
      .schema("id long, user long, tag string, ReceiptTime long")
      .option("eventName", "Ssb::E")
      .option(graft.sources.lwes.LwesOptions.SplitTargetBytes, (4L << 20).toString)
      .option(graft.sources.lwes.LwesOptions.ReceiptTimeMin, lo.toString)
      .option(graft.sources.lwes.LwesOptions.ReceiptTimeMax, hi.toString)
      .load(dir)
      .filter(col("ReceiptTime").between(lo, hi))
      .select(col("id"), col("user"))
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val secs = (System.nanoTime() - t0) / 1e9
    val n = spark.read.parquet(out).count()
    require(n == hi - lo + 1, s"windowed drain got $n of ${hi - lo + 1} rows")
    println(f"[stream-split] windowed-10%%  wall=$secs%.2fs (rows ok — " +
      "frame pruning decoded only the in-window byte subset)")
    spark.stop()
  }
}
