package graft.tools

import graft.sources.lwes.{LwesOptions, LwesScan, LwesStats}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Zone-map placement scale check for the A27 claims: at directory
  * scale, is the DRIVER-side sidecar wave acceptable, where does it
  * stop being so, and does the over-cap EXECUTOR-skim placement hold
  * the line? Creates `SPARK_GRAFT_SS_FILES` (default 20 000) journals
  * (each `SPARK_GRAFT_SS_EVENTS`, default 50, events with a disjoint
  * per-file id range) WITH zone-map sidecars, then measures a selective
  * pushed-range scan three ways:
  *   (a) plan-time prune (cap raised above the file count),
  *   (b) executor-side skim (cap 0),
  *   (c) statsPrune=false (the full parse the prune avoids).
  * In-tool assertions: all three return identical answers, (a) prunes
  * at plan time and parses only the matching file, (b) skims the same
  * files task-side with the same metric total. Times are printed, not
  * asserted — the point is the measured shape, judged in docs/. */
object StatsScale {
  def main(args: Array[String]): Unit = {
    val nFiles = sys.env.getOrElse("SPARK_GRAFT_SS_FILES", "20000").toInt
    val perFile = sys.env.getOrElse("SPARK_GRAFT_SS_EVENTS", "50").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("lwes-statscale").toString
    println(s"writing $nFiles journals x $perFile events with sidecars...")
    val t0 = System.nanoTime()
    java.util.stream.IntStream.range(0, nFiles).parallel().forEach { i =>
      val p = s"$dir/j$i.journal"
      val tr = new LwesStats.Tracker
      val w = graft.lwes.JournalWriter.create(p)
      (0 until perFile).foreach { k =>
        val e = graft.lwes.LwesEvent("Ss::E")
          .setInt64("id", i.toLong * perFile + k)
        w.write(e); tr.observe(e)
      }
      w.close()
      val len = new java.io.File(p).length
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/.j$i.journal.stats"),
        tr.serialize(len).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    println(f"wrote in ${(System.nanoTime() - t0) / 1e9}%.1f s")

    // the predicate matches exactly one file's id range
    def scan(extra: (String, String)*) = {
      val base = spark.read.format("lwes").schema("id long")
      extra.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }.load(dir)
        .filter(col("id") >= 0 && col("id") < perFile)
    }
    def run(tag: String, extra: (String, String)*): (Long, Long, Long, Double) = {
      val t = System.nanoTime()
      val df = scan(extra: _*)
      val n = df.collect().length.toLong
      val sec = (System.nanoTime() - t) / 1e9
      val plan = df.queryExecution.executedPlan
      val driver = LwesScan.scansIn(plan).map(_.statsPrunedFileCount).sum
      val metric = LwesScan.scanMetricSum(plan, "filesPrunedByStats")
      val touched = LwesScan.scanMetricSum(plan, "eventsParsed") +
        LwesScan.scanMetricSum(plan, "rowsFiltered") // opened + in-parse rejects
      println(f"[stats-scale] $tag%-12s rows=$n wall=$sec%6.2f s " +
        f"driver_pruned=$driver metric=$metric records_touched=$touched")
      assert(n == perFile.toLong, s"$tag returned $n rows, want $perFile")
      (driver, metric, touched, sec)
    }

    // untimed warm-up: codegen + FileSystem init would otherwise bill
    // entirely to whichever mode runs first
    scan(LwesOptions.StatsPrune -> "false").collect()

    val (dp, dm, dTouched, planSec) =
      run("plan-time", LwesOptions.StatsPruneMaxFiles -> s"${nFiles * 2}")
    val (ep, em, eTouched, execSec) =
      run("exec-skim", LwesOptions.StatsPruneMaxFiles -> "0")
    val (_, _, fTouched, fullSec) = run("unpruned", LwesOptions.StatsPrune -> "false")

    assert(dp == nFiles - 1L && dm == dp,
      s"plan-time prune dropped $dp of ${nFiles - 1} prunable files")
    assert(ep == 0L && em == nFiles - 1L,
      s"executor skim: driver=$ep metric=$em, want 0/${nFiles - 1}")
    assert(dTouched == perFile.toLong && eTouched == perFile.toLong,
      s"pruned scans touched $dTouched/$eTouched records, want $perFile")
    assert(fTouched == nFiles.toLong * perFile,
      s"unpruned scan touched $fTouched records")
    println(f"[stats-scale] files=$nFiles per_file=$perFile ratios vs full " +
      f"parse: plan-time ${fullSec / planSec}%.2fx, " +
      f"exec-skim ${fullSec / execSec}%.2fx")

    // A26 COMPLETE pushdown at directory scale (r20): consolidate the
    // sidecars into ONE directory manifest, then run the ungrouped
    // count/min/max/sum dashboard. The push-time probe counts only
    // manifest-LESS candidates against the GET cap, so at any file
    // count the proof costs one manifest read per directory — and the
    // plan is a single metadata-only partition: no aggregate node, no
    // exchange, zero events parsed.
    LwesStats.writeManifest(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.conf.Configuration())
    import org.apache.spark.sql.functions.{count, lit, max, min, sum}
    def dash(extra: (String, String)*) = {
      val base = spark.read.format("lwes").schema("id long")
      extra.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }.load(dir)
        .agg(count(lit(1)).as("n"), min(col("id")).as("mn"),
          max(col("id")).as("mx"), sum(col("id")).as("sm"))
    }
    def runDash(tag: String, extra: (String, String)*) = {
      val t = System.nanoTime()
      val df = dash(extra: _*)
      val row = df.collect()(0)
      val sec = (System.nanoTime() - t) / 1e9
      val ps = df.queryExecution.executedPlan.toString
      val parsed = LwesScan.scanMetricSum(df.queryExecution.executedPlan,
        "eventsParsed")
      println(f"[stats-scale] dash:$tag%-10s wall=$sec%6.2f s " +
        f"eventsParsed=$parsed complete=${ps.contains(" complete")} " +
        f"n=${row.getLong(0)}")
      (row, ps, parsed, sec)
    }
    val (cRow, cPlan, cParsed, cSec) = runDash("complete")
    val (fRow, _, _, fDashSec) =
      runDash("unpushed", LwesOptions.AggPushdown -> "false")
    assert(cPlan.contains(" complete") && !cPlan.contains("HashAggregate") &&
      !cPlan.contains("Exchange"),
      s"complete dashboard did not plan single-stage:\n$cPlan")
    assert(cParsed == 0L, s"complete dashboard parsed $cParsed events")
    assert(cRow == fRow, s"$cRow vs $fRow")
    println(f"[stats-scale] dashboard: complete-push $cSec%.2f s vs " +
      f"full parse $fDashSec%.2f s = ${fDashSec / cSec}%.1fx " +
      f"(one manifest read, one metadata partition)")
    spark.stop()
  }
}
