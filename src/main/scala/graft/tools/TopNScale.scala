package graft.tools

import graft.sources.lwes.{LwesOptions, LwesScan, LwesStats}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Top-N pushdown scale check for the A28 claim: at directory scale,
  * "latest k events" must be a listing + a couple of sidecar reads +
  * one file's parse — not a full-corpus decompress-sort. Creates
  * `SPARK_GRAFT_TN_FILES` (default 20 000) tag-named journals WITH
  * zone-map sidecars (each `SPARK_GRAFT_TN_EVENTS`, default 50, events
  * over a disjoint per-file receipt range), then measures
  * `ORDER BY ReceiptTime DESC LIMIT 100` two ways:
  *   (a) the pushed plan (default),
  *   (b) `topNPrune=false` (the full scan the bound avoids).
  * In-tool assertions: identical answers, (a) prunes all but the
  * newest file at plan time and parses only that file's events.
  * Times are printed, not asserted — the point is the measured shape,
  * judged in docs/. */
object TopNScale {
  def main(args: Array[String]): Unit = {
    val nFiles = sys.env.getOrElse("SPARK_GRAFT_TN_FILES", "20000").toInt
    val perFile = sys.env.getOrElse("SPARK_GRAFT_TN_EVENTS", "50").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("lwes-topnscale").toString
    println(s"writing $nFiles tagged journals x $perFile events with sidecars...")
    val t0 = System.nanoTime()
    java.util.stream.IntStream.range(0, nFiles).parallel().forEach { i =>
      val lo = i.toLong * perFile
      val hi = lo + perFile - 1
      val p = s"$dir/j$i.t$lo-$hi.journal"
      val tr = new LwesStats.Tracker
      val w = graft.lwes.JournalWriter.create(p)
      (0 until perFile).foreach { k =>
        val e = graft.lwes.LwesEvent("Tn::E")
          .setInt64(graft.lwes.LwesEvent.ReceiptTime, lo + k)
          .setInt64("id", lo + k)
        w.write(e); tr.observe(e)
      }
      w.close()
      val len = new java.io.File(p).length
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/.j$i.t$lo-$hi.journal.stats"),
        tr.serialize(len).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    println(f"wrote in ${(System.nanoTime() - t0) / 1e9}%.1f s")

    def run(tag: String, extra: (String, String)*)
        : (Array[Long], Long, Long, Double) = {
      val t = System.nanoTime()
      val base = spark.read.format("lwes")
        .schema("id long, ReceiptTime long")
      val df = extra.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }
        .load(dir)
        .orderBy(col("ReceiptTime").desc).limit(100)
      val vals = df.collect().map(_.getLong(1))
      val wall = (System.nanoTime() - t) / 1e9
      val scans = LwesScan.scansIn(df.queryExecution.executedPlan)
      val pruned = scans.map(_.topNPrunedFileCount).sum
      val parsed =
        LwesScan.scanMetricSum(df.queryExecution.executedPlan, "eventsParsed")
      println(f"$tag%-14s wall=$wall%7.2fs prunedFiles=$pruned%6d eventsParsed=$parsed%9d")
      (vals, pruned, parsed, wall)
    }

    run("warmup")
    val (a, prunedA, parsedA, _) = run("pushed")
    val (b, prunedB, parsedB, _) = run("topNPrune=off",
      LwesOptions.TopNPrune -> "false")
    require(a.sameElements(b), "pushed and unpushed top-100 diverged")
    require(prunedB == 0L, s"escape hatch still pruned $prunedB files")
    // k=100 spans the two newest files (50 events each); allow the
    // greedy bound one extra file of slack
    require(prunedA >= nFiles - 3,
      s"expected ~${nFiles - 2} files pruned, got $prunedA")
    require(parsedA <= 3L * perFile,
      s"pushed plan parsed $parsedA events (> ${3 * perFile})")
    require(parsedB == nFiles.toLong * perFile,
      s"full scan parsed $parsedB events")
    println("TOPN_SCALE_OK")
    spark.stop()
  }
}
