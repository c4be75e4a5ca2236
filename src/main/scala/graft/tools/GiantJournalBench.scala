package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The giant-gzip remediation measurement (r18 verdict task 5): a
  * multi-GB *gzip* journal is ONE unsplittable task by format law — the
  * reference inherited the same constraint (JournalInputFormat.java:
  * 58-60 returns isSplitable=false) and had no remedy. This tool
  * measures the named remedy: one [[graft.sources.lwes.Compact]] pass
  * rewrites the file into the splittable `.zsj` container, after which
  * the same scan runs one task per frame-range slice.
  *
  * SPARK_GRAFT_GJ_EVENTS sizes the journal (default 20M, ~a few hundred
  * MB gzipped — scale up on a box with disk to spare). Prints wall for
  * a 3-column aggregate over (a) the single gzip journal, (b) the same
  * data post-Compact, plus the task counts that explain the ratio. */
object GiantJournalBench {
  def main(args: Array[String]): Unit = {
    val nEvents = sys.env.getOrElse("SPARK_GRAFT_GJ_EVENTS", "20000000").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("lwes-giant").toString
    println(s"writing ONE gzip journal of $nEvents events...")
    val t0 = System.nanoTime()
    val w = graft.lwes.JournalWriter.create(s"$dir/giant.journal.gz")
    var i = 0
    while (i < nEvents) {
      w.write(graft.lwes.LwesEvent(if (i % 3 == 0) "G::A" else "G::B")
        .setInt64("id", i.toLong)
        .setInt32("score", i % 1000)
        .setString("page", s"/p/${i % 50}"))
      i += 1
    }
    w.close()
    val gzBytes = new java.io.File(s"$dir/giant.journal.gz").length()
    println(f"wrote ${gzBytes / 1e6}%.0f MB gzip in ${(System.nanoTime() - t0) / 1e9}%.1f s")

    def scan(label: String): (Double, Long, Int) = {
      val best = (1 to 3).map { _ =>
        val t = System.nanoTime()
        val df = spark.read.format("lwes")
          .schema("id long, score int, page string").load(dir)
          .agg(count(lit(1)), sum(col("score")), max(col("id")))
        val r = df.collect()(0)
        assert(r.getLong(0) == nEvents.toLong, s"count ${r.getLong(0)}")
        (System.nanoTime() - t) / 1e9
      }.min
      val tasks = spark.read.format("lwes")
        .schema("id long, score int, page string").load(dir)
        .rdd.getNumPartitions
      println(f"$label: best_wall=$best%.2f s tasks=$tasks")
      (best, nEvents.toLong, tasks)
    }

    // aggregate pushdown would answer the count from metadata; the SUM
    // forces a full parse, which is the honest single-task measurement
    val (gzWall, _, gzTasks) = scan("gzip single file")
    assert(gzTasks == 1, s"a gzip journal must be one task, got $gzTasks")

    val tC = System.nanoTime()
    val (nb, na) = graft.sources.lwes.Compact.compact(spark, dir,
      targetFiles = cpus.toInt)
    val compactSec = (System.nanoTime() - tC) / 1e9
    println(f"compacted $nb -> $na files in $compactSec%.1f s")

    val (zsjWall, _, zsjTasks) = scan("post-compact .zsj")
    assert(zsjTasks > 1, "compacted .zsj should scan as multiple tasks")

    println(f"[giant-journal] events=$nEvents gz_wall=$gzWall%.2f " +
      f"zsj_wall=$zsjWall%.2f speedup=${gzWall / zsjWall}%.2f " +
      f"gz_tasks=$gzTasks zsj_tasks=$zsjTasks compact_sec=$compactSec%.1f")
    spark.stop()
  }
}
