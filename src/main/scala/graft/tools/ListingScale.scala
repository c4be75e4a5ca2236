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

    // r19: SPARK_GRAFT_LS_STATS=true also writes a zone-map sidecar per
    // journal and measures the pruning-scan wall at directory scale;
    // SPARK_GRAFT_LS_MANIFEST=true additionally consolidates each
    // directory's sidecars into the per-directory manifest and measures
    // the same pruning scan through it — the 10^6-file comparison the
    // r18 verdict asked for (driver GET wave vs one read per dir).
    val withStats = sys.env.getOrElse("SPARK_GRAFT_LS_STATS", "false").toBoolean
    val withManifest =
      sys.env.getOrElse("SPARK_GRAFT_LS_MANIFEST", "false").toBoolean

    val dir = java.nio.file.Files.createTempDirectory("lwes-listing").toString
    println(s"writing $nFiles one-event journals across $nDirs dirs" +
      s" (stats=$withStats manifest=$withManifest)...")
    val t0 = System.nanoTime()
    (0 until nDirs).foreach(d =>
      new java.io.File(f"$dir/dt=2026-01-${d % 28 + 1}%02d").mkdirs())
    java.util.stream.IntStream.range(0, nFiles).parallel().forEach { i =>
      val sub = f"$dir/dt=2026-01-${i % nDirs % 28 + 1}%02d"
      val path = s"$sub/j$i.journal"
      val ev = graft.lwes.LwesEvent("Ls::E").setInt64("id", i.toLong)
      val w = graft.lwes.JournalWriter.create(path)
      w.write(ev)
      w.close()
      if (withStats) {
        val tr = new graft.sources.lwes.LwesStats.Tracker
        tr.observe(ev)
        val len = new java.io.File(path).length()
        java.nio.file.Files.write(
          java.nio.file.Paths.get(sub, s".j$i.journal.stats"),
          tr.serialize(len).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    }
    println(f"wrote in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    if (withManifest) {
      val tm = System.nanoTime()
      val hconf = spark.sessionState.newHadoopConf()
      java.util.stream.IntStream.range(0, math.min(nDirs, 28)).parallel()
        .forEach { d =>
          graft.sources.lwes.LwesStats.writeManifest(
            new org.apache.hadoop.fs.Path(f"$dir/dt=2026-01-${d % 28 + 1}%02d"),
            hconf)
        }
      println(f"manifests written in ${(System.nanoTime() - tm) / 1e9}%.1f s")
    }

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

    if (withStats) {
      // pruning scan: a pushed predicate no record satisfies — with
      // stats every file is provably empty, so the measured wall IS the
      // stats path (per-file GETs under the cap / executor skims over
      // it without a manifest; one manifest read per dir with one)
      val t3 = System.nanoTime()
      val q = spark.read.format("lwes").schema("id long").load(dir)
        .filter(org.apache.spark.sql.functions.col("id") < 0)
      val zero = q.count()
      val pruneSec = (System.nanoTime() - t3) / 1e9
      // metric read needs the same execution: re-run via collect
      val q2 = spark.read.format("lwes").schema("id long").load(dir)
        .filter(org.apache.spark.sql.functions.col("id") < 0)
      q2.collect()
      val plan = q2.queryExecution.executedPlan
      val prunedPlan = graft.sources.lwes.LwesScan.scansIn(plan)
        .map(_.statsPrunedFileCount).sum
      val prunedSkim = graft.sources.lwes.LwesScan
        .scanMetricSum(plan, "filesPrunedByStats")
      println(f"[listing-scale] prune_scan_sec=$pruneSec%.2f " +
        f"rows=$zero plan_pruned=$prunedPlan skim_pruned=$prunedSkim " +
        f"manifest=$withManifest")
      assert(zero == 0L)
      assert(prunedPlan + prunedSkim > 0L,
        "stats pruning never engaged on the scale corpus")
    }
    spark.stop()
  }
}
