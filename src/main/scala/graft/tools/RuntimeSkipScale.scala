package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A30/A31 at directory scale (r18 verdict task 8): drive the
  * runtime-filter REPLAN over `SPARK_GRAFT_RS_FILES` (default 20 000)
  * day-clustered journals with zone-map sidecars and record the wall.
  * The scan plans once (listing cached per scan — the one-listing
  * invariant, r18), Spark's runtime filtering then hands the join's
  * actual key values to `filterAttributes`, and the replan must drop
  * the overwhelming majority of files from their sidecar min/max
  * without a second listing. Prints the join wall with the skip on vs
  * off and the prune attribution counters. */
object RuntimeSkipScale {
  def main(args: Array[String]): Unit = {
    val nFiles = sys.env.getOrElse("SPARK_GRAFT_RS_FILES", "20000").toInt
    val perFile = sys.env.getOrElse("SPARK_GRAFT_RS_EVENTS", "50").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // one journal per "day": file i holds perFile events with
    // ship_day == i — runtime IN-filters on ship_day are then exactly
    // file-selective, the shape A30 exists for
    val dir = java.nio.file.Files.createTempDirectory("lwes-rskip").toString
    println(s"writing $nFiles day-clustered journals ($perFile events each)...")
    val t0 = System.nanoTime()
    java.util.stream.IntStream.range(0, nFiles).parallel().forEach { i =>
      val path = s"$dir/day$i.journal"
      val tr = new graft.sources.lwes.LwesStats.Tracker
      val w = graft.lwes.JournalWriter.create(path)
      (0 until perFile).foreach { j =>
        val ev = graft.lwes.LwesEvent("Rs::E")
          .setInt64("id", (i.toLong * perFile) + j)
          .setInt64("ship_day", i.toLong)
          .setInt32("qty", j)
        w.write(ev); tr.observe(ev)
      }
      w.close()
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, s".day$i.journal.stats"),
        tr.serialize(new java.io.File(path).length())
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    println(f"wrote in ${(System.nanoTime() - t0) / 1e9}%.1f s")

    // 30 "days" out of nFiles, behind a SELECTIVE dim predicate —
    // Spark only inserts a runtime (DPP-style) filter when the dim
    // side carries one (the production shape: `WHERE month = X` on a
    // date dim). Materialized as parquet so the dim is a real scan.
    val dimDir = java.nio.file.Files.createTempDirectory("rskip-dim").toString
    (0 until nFiles).map(k => (k.toLong, k / 30))
      .toDF("ship_day", "month").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
      .filter(col("month") === nFiles / 60).select(col("ship_day"))

    def run(skip: Boolean): (Double, Long, Long, Long) = {
      val fact = spark.read.format("lwes")
        .schema("id long, ship_day long, qty int")
        .option("eventName", "Rs::E")
        .option(graft.sources.lwes.LwesOptions.StatsPrune, skip.toString)
        .load(dir)
      val t = System.nanoTime()
      val q = fact.join(broadcast(dim), Seq("ship_day"))
        .agg(count(lit(1)).as("n"), sum(col("qty")).as("s"))
      val r = q.collect()(0)
      val wall = (System.nanoTime() - t) / 1e9
      assert(r.getLong(0) == 30L * perFile, s"join rows ${r.getLong(0)}")
      val scans = graft.sources.lwes.LwesScan
        .scansIn(q.queryExecution.executedPlan)
      val statsPruned = scans.map(_.statsPrunedFileCount).sum
      val partPruned = scans.map(_.partitionPrunedFileCount).sum
      val skimPruned = graft.sources.lwes.LwesScan
        .scanMetricSum(q.queryExecution.executedPlan, "filesPrunedByStats")
      (wall, statsPruned, partPruned, skimPruned)
    }

    run(skip = true) // warm (JIT + page cache), measure second
    val (onWall, onStats, onPart, onSkim) = run(skip = true)
    val (offWall, _, _, _) = run(skip = false)
    println(f"[runtime-skip-scale] files=$nFiles skip_on_wall=$onWall%.2f " +
      f"skip_off_wall=$offWall%.2f speedup=${offWall / onWall}%.2f " +
      f"stats_pruned=$onStats skim_pruned=$onSkim part_pruned=$onPart")
    assert(onPart == 0, "no partition columns: prune must be stats-attributed")
    assert(onStats + onSkim >= (nFiles - 30).toLong,
      s"runtime skip engaged on too few files: plan=$onStats skim=$onSkim")

    // with the directory manifest the runtime-filter REPLAN prunes at
    // PLAN time (uncovered candidates = 0 <= cap): zero tasks scheduled
    // for the 19 970 dead files instead of 20 000 open-and-skim tasks
    graft.sources.lwes.LwesStats.writeManifest(
      new org.apache.hadoop.fs.Path(dir), spark.sessionState.newHadoopConf())
    run(skip = true) // warm the manifest cache; measure second
    val (mWall, mStats, mPart, mSkim) = run(skip = true)
    println(f"[runtime-skip-scale] manifest replan: wall=$mWall%.2f " +
      f"plan_pruned=$mStats skim_pruned=$mSkim part_pruned=$mPart")
    assert(mStats >= (nFiles - 30).toLong,
      s"manifest replan should prune at plan time: plan=$mStats skim=$mSkim")
    spark.stop()
  }
}
