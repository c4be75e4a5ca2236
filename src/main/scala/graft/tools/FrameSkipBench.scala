package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A31 measurement: range predicate over ONE fat key-sorted `.zsj` —
  * wall-clock and frames decompressed, per-frame stats on vs off.
  * Prints one line per scenario; run via
  * `sbt -batch "runMain graft.tools.FrameSkipBench"`. */
object FrameSkipBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val events = sys.env.getOrElse("SPARK_GRAFT_FS_EVENTS", "60000000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("frame-skip-bench").getOrCreate()

    val dir = java.nio.file.Files.createTempDirectory("fskip-bench").toString
    // ONE fat id-sorted .zsj, default 4 MiB frames
    spark.range(events)
      .select(col("id"), (col("id") % 97).cast("double").as("v"),
        concat(lit("u"), (col("id") % 100000).cast("string")).as("tag"))
      .repartition(1).sortWithinPartitions("id")
      .write.format("lwes").option("eventName", "Fb::E")
      .option(graft.sources.lwes.LwesOptions.Compression, "split-zstd")
      .mode("append").save(dir)
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".zsj")).head
    println(s"journal: ${f.length()} bytes, $events events")

    def run(statsPrune: Boolean, frac: Long): (Double, Long, Long) = {
      val cut = events / frac
      val df = spark.read.format("lwes")
        .schema("id long, v double, tag string")
        .option("eventName", "Fb::E")
        .option(graft.sources.lwes.LwesOptions.StatsPrune, statsPrune.toString)
        .load(dir)
        .filter(col("id") < cut)
        .agg(count(lit(1)).as("n"), round(sum("v"), 2).as("tv"))
      val t0 = System.nanoTime()
      val rows = df.collect()
      val sec = (System.nanoTime() - t0) / 1e9
      require(rows.head.getLong(0) == cut, s"wrong count ${rows.head}")
      val plan = df.queryExecution.executedPlan
      val pruned = graft.sources.lwes.LwesScan.scansIn(plan)
        .map(_.statsPrunedFrameCount).sum
      val parsed = graft.sources.lwes.LwesScan.scanMetricSum(plan, "eventsParsed")
      (sec, pruned, parsed)
    }

    // warm-up
    run(statsPrune = false, 100)
    Seq(1000L, 100L, 10L).foreach { frac =>
      val on = (1 to 3).map(_ => run(statsPrune = true, frac)).minBy(_._1)
      val off = (1 to 3).map(_ => run(statsPrune = false, frac)).minBy(_._1)
      println(f"sel=1/$frac%-4d  statsPrune=on  ${on._1}%6.3f s  " +
        f"framesPruned=${on._2}%4d eventsParsed=${on._3}%9d | " +
        f"off ${off._1}%6.3f s eventsParsed=${off._3}%9d | " +
        f"speedup ${off._1 / on._1}%5.2fx")
    }
    spark.stop()
  }
}
