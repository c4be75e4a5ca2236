package graft.tools

import org.apache.spark.sql.SparkSession

/** Listing/planning scale check for the A3 claim that huge journal
  * counts neither plan one task per file nor melt the driver: creates
  * `SPARK_GRAFT_LS_FILES` (default 50 000) one-event journals across
  * `SPARK_GRAFT_LS_DIRS` (default 24) date-style subdirectories, then
  * measures (a) wall to LIST + plan a scan, (b) the number of planned
  * partitions vs Spark's own maxSplitBytes bin-packing formula, and
  * (c) wall to actually count the corpus. The point is driver-side:
  * at 100 TB a year of hourly journals across sites is O(10^5..10^6)
  * files, and the failure modes are per-file task explosion or
  * quadratic listing, both of which this surfaces as measured time.
  */
object ListingScale {
  def main(args: Array[String]): Unit = {
    val nFiles = sys.env.getOrElse("SPARK_GRAFT_LS_FILES", "50000").toInt
    val nDirs = sys.env.getOrElse("SPARK_GRAFT_LS_DIRS", "24").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("lwes-listing").toString
    println(s"writing $nFiles one-event journals across $nDirs dirs...")
    val t0 = System.nanoTime()
    (0 until nDirs).foreach(d =>
      new java.io.File(f"$dir/dt=2026-01-${d % 28 + 1}%02d").mkdirs())
    java.util.stream.IntStream.range(0, nFiles).parallel().forEach { i =>
      val sub = f"$dir/dt=2026-01-${i % nDirs % 28 + 1}%02d"
      val w = graft.lwes.JournalWriter.create(s"$sub/j$i.journal")
      w.write(graft.lwes.LwesEvent("Ls::E").setInt64("id", i.toLong))
      w.close()
    }
    println(f"wrote in ${(System.nanoTime() - t0) / 1e9}%.1f s")

    val t1 = System.nanoTime()
    val df = spark.read.format("lwes").schema("id long").load(dir)
    val planned = df.rdd.getNumPartitions
    val planSec = (System.nanoTime() - t1) / 1e9
    val t2 = System.nanoTime()
    val n = df.count()
    val countSec = (System.nanoTime() - t2) / 1e9
    println(f"[listing-scale] files=$nFiles planned_partitions=$planned " +
      f"plan_sec=$planSec%.2f count=$n count_sec=$countSec%.2f")
    assert(n == nFiles, s"row count $n != $nFiles")
    assert(planned < nFiles / 10,
      s"bin-packing failed: $planned partitions for $nFiles files")
    spark.stop()
  }
}
