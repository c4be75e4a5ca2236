package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The splittable-journal headline measurement (SURVEY §7 series):
  * scan wall-time over ONE fat journal, classic gzip container vs the
  * `.zsj` split container — the case the A22 format exists for (a
  * single file is the gzip read path's parallelism floor).
  * SPARK_GRAFT_SSB_EVENTS (default 2M) / _CPUS (default 16) resize. */
object SplitScanBench {
  def main(args: Array[String]): Unit = {
    val nEvents = sys.env.getOrElse("SPARK_GRAFT_SSB_EVENTS", "2000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_SSB_CPUS", "16")
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files.createTempDirectory("ssb").toString
    val src = spark.range(nEvents).select(col("id"),
      (col("id") % 1000).cast("double").as("value"),
      concat(lit("user-"), col("id") % 5000).as("who"),
      (lit(1700000000000L) + col("id")).as("ReceiptTime"))
    def write(dir: String, codec: String): Unit =
      src.repartition(1).write.format("lwes")
        .option("eventName", "B::E").option("compression", codec)
        .mode("append").save(dir)
    write(s"$base/gz", "gzip")
    write(s"$base/zsj", "split-zstd")
    def fileInfo(dir: String) = {
      val f = new java.io.File(dir).listFiles()
        .filter(x => x.isFile && !x.getName.startsWith(".")).head
      s"${f.getName} (${f.length() / 1048576} MiB)"
    }
    println(s"== gz:  ${fileInfo(s"$base/gz")}")
    println(s"== zsj: ${fileInfo(s"$base/zsj")}")
    def scan(dir: String) = spark.read.format("lwes")
      .schema("id long, value double, who string, ReceiptTime long")
      .option("eventName", "B::E").load(dir)
    def time(tag: String, dir: String): Unit = (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val r = scan(dir).agg(count(lit(1)), round(sum(col("value")), 2),
        approx_count_distinct(col("who"))).head()
      val secs = (System.nanoTime() - t0) / 1e9
      val parts = scan(dir).rdd.getNumPartitions
      println(f"== $tag iter$i: $secs%.2f s  tasks=$parts  rows=${r.getLong(0)}")
    }
    time("gz ", s"$base/gz")
    time("zsj", s"$base/zsj")
    spark.stop()
  }
}
