package graft.sources

import java.nio.file.Files

import graft.lwes.{JournalWriter, LwesEvent}
import graft.sources.lwes.LwesScan
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ReceiptTime-range FILE pruning: a pushed range filter on the
  * receipt-time column must skip whole journals from the listing alone
  * (name tag / capture stamp / mtime), without opening them — the most
  * common 100 TB journal query is "events from window X" over a year of
  * rotated files. Correctness stays with Spark's residual filter; these
  * tests pin the BOUNDS (never drop a file that could hold a matching
  * record) and the pruning effect (skip everything that can't).
  */
class LwesTimePruneSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(): String = Files.createTempDirectory("lwes-prune").toString

  private val T0 = 1700000000000L
  private val Hour = 3600000L

  /** One journal per hour-bucket via the BATCH WRITER (so files carry
    * the exact `.t<min>-<max>.` name tag), ids = bucket*100+i. */
  private def writeTaggedHours(dir: String, hours: Int, perHour: Int): Unit = {
    import spark.implicits._
    (0 until hours).foreach { h =>
      (0 until perHour).map { i =>
        (h * 100L + i, T0 + h * Hour + i * 1000L)
      }.toDF("id", "ReceiptTime").coalesce(1)
        .write.format("lwes").option("eventName", "Pr::E")
        .mode("append").save(dir)
    }
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame): LwesScan =
    df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => s
    }.head.scan.asInstanceOf[LwesScan]

  test("writer tags file names with exact receipt bounds") {
    val dir = tmp()
    writeTaggedHours(dir, 3, 5)
    val names = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted
    assert(names.length == 3)
    val Tag = """.*\.t(\d+)-(\d+)\.zsj$""".r // default container is .zsj (r14)
    val bounds = names.toSeq.map { case Tag(mn, mx) => (mn.toLong, mx.toLong) }
    assert(bounds.sorted == (0 until 3).map(h =>
      (T0 + h * Hour, T0 + h * Hour + 4000L)))
  }

  test("range filter prunes exact-tagged files and keeps results identical") {
    val dir = tmp()
    writeTaggedHours(dir, 6, 10)
    def read() = spark.read.format("lwes")
      .schema("id long, ReceiptTime long").option("eventName", "Pr::E").load(dir)
    // window covering hour 2 only
    val lo = T0 + 2 * Hour
    val hi = T0 + 2 * Hour + 9000L
    val filtered = read()
      .filter(col("ReceiptTime") >= lo && col("ReceiptTime") <= hi)
    val rows = filtered.collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq == (200L to 209L))
    val scan = scanOf(filtered)
    assert(scan.prunedFileCount == 5, s"5 of 6 hour files must be pruned, " +
      s"pruned=${scan.prunedFileCount}")
    assert(scan.reportDriverMetrics().exists(m =>
      m.name() == "filesPruned" && m.value() == 5L))
    // unfiltered read must not prune
    val all = read()
    assert(all.count() == 60)
    assert(scanOf(all).prunedFileCount == 0)
  }

  test("half-open windows prune from the correct side") {
    val dir = tmp()
    writeTaggedHours(dir, 4, 3)
    def read() = spark.read.format("lwes")
      .schema("id long, ReceiptTime long").option("eventName", "Pr::E").load(dir)
    val ge = read().filter(col("ReceiptTime") >= T0 + 3 * Hour)
    assert(ge.count() == 3)
    assert(scanOf(ge).prunedFileCount == 3)
    val lt = read().filter(col("ReceiptTime") < T0 + Hour)
    assert(lt.count() == 3)
    assert(scanOf(lt).prunedFileCount == 3)
  }

  test("timePrune=false disables pruning; results unchanged") {
    val dir = tmp()
    writeTaggedHours(dir, 4, 3)
    val df = spark.read.format("lwes")
      .schema("id long, ReceiptTime long").option("eventName", "Pr::E")
      .option("timePrune", "false").load(dir)
      .filter(col("ReceiptTime") >= T0 + 3 * Hour)
    assert(df.count() == 3)
    assert(scanOf(df).prunedFileCount == 0)
  }

  test("unrecognized timePrune values are rejected, never defaulted to pruning") {
    // a typo like "exat" silently selecting the heuristic mode is the
    // silent-row-loss hazard the exact mode exists to prevent
    val dir = tmp()
    writeTaggedHours(dir, 2, 3)
    val e = intercept[IllegalArgumentException] {
      spark.read.format("lwes").schema("id long, ReceiptTime long")
        .option("eventName", "Pr::E").option("timePrune", "exat")
        .load(dir).filter(col("ReceiptTime") >= T0 + Hour).count()
    }
    assert(e.getMessage.contains("exat"))
  }

  test("capture-name stamps lower-bound, mtime upper-bounds, slack respected") {
    val dir = tmp()
    // capture files (journaller convention): name stamp = open time
    (0 until 3).foreach { h =>
      val w = JournalWriter.create(f"$dir/capture-${T0 + h * Hour}-$h%05d.journal")
      (0 until 4).foreach { i =>
        w.write(LwesEvent("Cp::E").setInt64("id", h * 10L + i)
          .setInt64(LwesEvent.ReceiptTime, T0 + h * Hour + i * 1000L))
      }
      w.close()
      // age the file so the mtime upper bound bites: records end at
      // open + 3 s; pretend the file closed then
      new java.io.File(f"$dir/capture-${T0 + h * Hour}-$h%05d.journal")
        .setLastModified(T0 + h * Hour + 3000L)
    }
    val slack = 60000L // 1 min for the test
    def read() = spark.read.format("lwes")
      .schema("id long, ReceiptTime long").option("eventName", "Cp::E")
      .option("timePruneSlackMs", slack.toString).load(dir)
    // upper side: ask for events after hour 2 opened — hours 0 and 1
    // files end (mtime+slack) long before, both pruned
    val tail = read().filter(col("ReceiptTime") >= T0 + 2 * Hour)
    assert(tail.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(20L, 21L, 22L, 23L))
    assert(scanOf(tail).prunedFileCount == 2)
    // lower side: ask for events before hour 0 closed — hours 1 and 2
    // opened (stamp−slack) after the window, both pruned
    val head = read().filter(col("ReceiptTime") <= T0 + 2000L)
    assert(head.collect().map(_.getLong(0)).sorted.toSeq == Seq(0L, 1L, 2L))
    assert(scanOf(head).prunedFileCount == 2)
    // inside the slack margin nothing is pruned: a window ending just
    // 30 s before hour 1's stamp still keeps hour 1's file
    val nearMiss = read().filter(col("ReceiptTime") <= T0 + Hour - 30000L)
    assert(scanOf(nearMiss).prunedFileCount == 1, // only hour 2 pruned
      "a bound within the slack must not prune")
  }

  test("foreign tag-shaped names never produce unsound bounds") {
    // inverted "tag" (a date-ish foreign convention): must degrade to
    // the mtime heuristic, not prune on garbage bounds
    val (lo1, hi1) = graft.sources.lwes.LwesDataSource
      .receiptTimeBounds("app.t20240131-000001.journal.gz", T0, 60000L)
    assert(lo1 == Long.MinValue && hi1 == T0 + 60000L)
    // >18-digit run: must not match (and must not throw on parse)
    val (lo2, hi2) = graft.sources.lwes.LwesDataSource
      .receiptTimeBounds(".t99999999999999999999-1.x", T0, 60000L)
    assert(lo2 == Long.MinValue && hi2 == T0 + 60000L)
    // the real thing still parses exactly
    assert(graft.sources.lwes.LwesDataSource
      .receiptTimeBounds("part-00000-3.t100-200.gz", T0, 60000L) == (100L, 200L))
    // end-to-end: a directory containing ONLY a foreign-tagged file
    // keeps its rows under a range filter (mtime bound is generous)
    val dir = tmp()
    val w = JournalWriter.create(s"$dir/app.t20240131-000001.journal")
    (0 until 3).foreach(i => w.write(LwesEvent("Fx::E").setInt64("id", i.toLong)
      .setInt64(LwesEvent.ReceiptTime, T0 + i * 1000L)))
    w.close()
    val df = spark.read.format("lwes")
      .schema("id long, ReceiptTime long").option("eventName", "Fx::E").load(dir)
      .filter(col("ReceiptTime") >= T0)
    assert(df.count() == 3)
  }

  test("fractional double thresholds round outward, never over-prune") {
    val dir = tmp()
    writeTaggedHours(dir, 2, 3)
    // declare the receipt column as double: Spark pushes Double literals
    def read() = spark.read.format("lwes")
      .schema("id long, ReceiptTime double").option("eventName", "Pr::E").load(dir)
    // hour-1 file's tag starts exactly at T0+Hour; a threshold a hair
    // below must keep it (floor+1 semantics), and the rows must survive
    val ge = read().filter(col("ReceiptTime") > (T0 + Hour - 0.5))
    assert(ge.collect().map(_.getLong(0)).sorted.toSeq == Seq(100L, 101L, 102L))
    assert(scanOf(ge).prunedFileCount == 1) // hour 0 pruned, hour 1 kept
    // likewise on the upper side: < T0 + 0.5 keeps the file whose min
    // is exactly T0
    val lt = read().filter(col("ReceiptTime") < (T0 + 0.5))
    assert(lt.collect().map(_.getLong(0)).sorted.toSeq == Seq(0L))
    assert(scanOf(lt).prunedFileCount == 1)
  }

  test("timePrune=exact prunes tagged files but never untagged ones") {
    val dir = tmp()
    writeTaggedHours(dir, 3, 3) // exact-tagged, hours 0..2
    // an untagged legacy file whose records POST-date its mtime (the
    // layout that violates the heuristic contract): closed-looking but
    // holding future receipt times
    val w = JournalWriter.create(s"$dir/legacy-0.journal")
    (0 until 3).foreach(i => w.write(LwesEvent("Pr::E").setInt64("id", 900L + i)
      .setInt64(LwesEvent.ReceiptTime, T0 + 10 * Hour + i * 1000L)))
    w.close()
    new java.io.File(s"$dir/legacy-0.journal").setLastModified(T0)
    def read(mode: String) = spark.read.format("lwes")
      .schema("id long, ReceiptTime long").option("eventName", "Pr::E")
      .option("timePrune", mode).option("timePruneSlackMs", "60000").load(dir)
      .filter(col("ReceiptTime") >= T0 + 10 * Hour)
    // heuristic mode would mis-prune the contract-violating file...
    assert(read("true").count() == 0)
    // ...exact mode keeps it (and still prunes the 3 tagged hour files)
    val exact = read("exact")
    assert(exact.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(900L, 901L, 902L))
    assert(scanOf(exact).prunedFileCount == 3)
  }

  test("untagged, unstamped names keep only the mtime upper bound") {
    val dir = tmp()
    (0 until 2).foreach { h =>
      val w = JournalWriter.create(s"$dir/legacy-$h.journal")
      (0 until 3).foreach { i =>
        w.write(LwesEvent("Lg::E").setInt64("id", h * 10L + i)
          .setInt64(LwesEvent.ReceiptTime, T0 + h * Hour + i * 1000L))
      }
      w.close()
      new java.io.File(s"$dir/legacy-$h.journal")
        .setLastModified(T0 + h * Hour + 2000L)
    }
    def read() = spark.read.format("lwes")
      .schema("id long, ReceiptTime long").option("eventName", "Lg::E")
      .option("timePruneSlackMs", "60000").load(dir)
    // no lower bound derivable from a legacy name: a past-window query
    // keeps everything (conservative)...
    val past = read().filter(col("ReceiptTime") <= T0 + 1000L)
    assert(past.count() == 2)
    assert(scanOf(past).prunedFileCount == 0)
    // ...but the mtime upper bound still prunes closed-long-ago files
    val future = read().filter(col("ReceiptTime") >= T0 + Hour)
    assert(future.count() == 3)
    assert(scanOf(future).prunedFileCount == 1)
  }
}
