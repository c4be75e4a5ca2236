package graft.tools

import java.nio.file.Files

import graft.lwes.{JournalWriter, LwesEvent}
import graft.sources.lwes._
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.types.StructType

/** Single-threaded reader microbenchmark: row-path
  * [[LwesPartitionReader]] vs the decode-into-vectors
  * [[LwesColumnarBatchReader]] over one journal file, no Spark session,
  * no aggregation — isolates pure parse cost from scan-pipeline cost
  * (ScanThroughput measures the end-to-end picture).
  * Run: `sbt "runMain graft.tools.ReaderBench"`.
  */
object ReaderBench {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_RB_EVENTS", "2000000").toInt
    val dir = Files.createTempDirectory("lwes-rb").toString
    val path = s"$dir/j0.journal" // uncompressed: parse cost only
    val w = JournalWriter.create(path)
    (0 until n).foreach { i =>
      w.write(LwesEvent(if (i % 4 == 0) "Tp::Want" else "Tp::Skip")
        .setInt64("id", i.toLong)
        .setInt64("user", i.toLong % 99991)
        .setInt32("score", i % 1000)
        .setString("page", s"/p/${i % 50}")
        .setString("cost", (i % 97 * 0.25).toString)
        .setBool("flag", i % 3 == 0)
        .setUInt16("site", i % 5))
    }
    w.close()

    val schema = StructType.fromDDL(
      "id long, user long, score int, page string, cost double, " +
        "flag boolean, site int")
    val config = LwesReadConfig(schema, Map.empty, Map.empty, Set.empty, Nil)
    val part = LwesInputPartition(path, new java.io.File(path).length(), Map.empty)
    val conf = new Configuration()

    def time(tag: String)(body: => Long): Unit = {
      body // warm
      val best = (0 until 5).map { _ =>
        val t0 = System.nanoTime()
        val rows = body
        val dt = (System.nanoTime() - t0) / 1e9
        require(rows == n, s"$tag: $rows rows")
        dt
      }.min
      println(f"$tag%-24s ${n / best / 1e6}%6.2f M events/s  (best $best%.3f s)")
    }

    time("row reader") {
      val r = new LwesPartitionReader(part, config, conf)
      var rows = 0L
      while (r.next()) { r.get(); rows += 1 }
      r.close()
      rows
    }
    time("columnar reader") {
      val r = new LwesColumnarBatchReader(Seq(part), config, conf)
      var rows = 0L
      while (r.next()) rows += r.get().numRows()
      r.close()
      rows
    }
  }
}
