package graft.sources

import graft.lwes.{LwesCodec, LwesEvent}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.{BytesWritable, LongWritable, SequenceFile}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** A15: journals stored as SequenceFiles of EventWritable.
  *
  * The files here are written with Hadoop's own SequenceFile.Writer and
  * BytesWritable payloads — byte-identical on the wire to the
  * reference's `EventWritable` (4-byte length prefix + serialized
  * event, reference EventWritable.java:52-57) — then read back through
  * `format("lwes")`, whose container sniffing must pick the
  * SequenceFile parser (reference "detects through introspection",
  * EventSerDe.java:36-38).
  */
class LwesSequenceFileSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def writeSeqFile(path: String, from: Int, until: Int,
      compression: SequenceFile.CompressionType = SequenceFile.CompressionType.NONE): Unit = {
    val conf = new Configuration()
    val w = SequenceFile.createWriter(conf,
      SequenceFile.Writer.file(new Path(path)),
      SequenceFile.Writer.keyClass(classOf[LongWritable]),
      SequenceFile.Writer.valueClass(classOf[BytesWritable]),
      SequenceFile.Writer.compression(compression))
    (from until until).foreach { i =>
      val ev = LwesEvent(if (i % 2 == 0) "Seq::A" else "Seq::B")
        .setInt64("id", i.toLong)
        .setString("tag", s"t${i % 7}")
        .setInt32("score", i * 3)
      val bytes = LwesCodec.serialize(ev)
      w.append(new LongWritable(i.toLong), new BytesWritable(bytes))
    }
    w.close()
  }

  test("sequence-file journals auto-detect and read (A15)") {
    val dir = Files.createTempDirectory("lwes-seq").toString
    writeSeqFile(s"$dir/j0.seq", 0, 400)
    writeSeqFile(s"$dir/j1.seq", 400, 500)
    val df = spark.read.format("lwes")
      .schema("id long, tag string, score int").load(dir)
    assert(df.count() == 500)
    assert(df.agg(sum("id")).head.getLong(0) == (0 until 500).map(_.toLong).sum)
    assert(df.agg(countDistinct("tag")).head.getLong(0) == 7)
  }

  test("eventName filter and column pruning work on sequence containers") {
    val dir = Files.createTempDirectory("lwes-seq-f").toString
    writeSeqFile(s"$dir/j.seq", 0, 300)
    val a = spark.read.format("lwes")
      .schema("id long, score int")
      .option("eventName", "Seq::A").load(dir)
    assert(a.count() == 150)
    assert(a.agg(max(expr("id % 2"))).head.get(0) == 0L)
    val pruned = a.select("id")
    assert(pruned.agg(sum("id")).head.getLong(0) == (0 until 300 by 2).map(_.toLong).sum)
  }

  test("mixed directory: datagram and sequence files in one load") {
    val dir = Files.createTempDirectory("lwes-mixed").toString
    writeSeqFile(s"$dir/a.seq", 0, 100)
    val w = graft.lwes.JournalWriter.create(s"$dir/b.gz")
    (100 until 160).foreach { i =>
      w.write(LwesEvent("Seq::A").setInt64("id", i.toLong)
        .setString("tag", "x").setInt32("score", 0))
    }
    w.close()
    val df = spark.read.format("lwes").schema("id long").load(dir)
    assert(df.count() == 160)
    assert(df.agg(countDistinct("id")).head.getLong(0) == 160)
  }

  test("record-compressed (zlib) sequence journals read transparently") {
    val dir = Files.createTempDirectory("lwes-seq-rc").toString
    writeSeqFile(s"$dir/rc.seq", 0, 250, SequenceFile.CompressionType.RECORD)
    val df = spark.read.format("lwes").schema("id long, score int").load(dir)
    assert(df.count() == 250)
    assert(df.agg(sum("score")).head.getLong(0) == (0 until 250).map(_ * 3L).sum)
  }

  test("block-compressed (zlib) sequence journals read transparently") {
    val dir = Files.createTempDirectory("lwes-seq-bc").toString
    // small block size forces multiple blocks (sync + 4 zlib buffers each)
    val conf = new Configuration()
    conf.setInt("io.seqfile.compress.blocksize", 4096)
    val w = SequenceFile.createWriter(conf,
      SequenceFile.Writer.file(new Path(s"$dir/bc.seq")),
      SequenceFile.Writer.keyClass(classOf[LongWritable]),
      SequenceFile.Writer.valueClass(classOf[BytesWritable]),
      SequenceFile.Writer.compression(SequenceFile.CompressionType.BLOCK))
    (0 until 1000).foreach { i =>
      val ev = LwesEvent(if (i % 2 == 0) "Seq::A" else "Seq::B")
        .setInt64("id", i.toLong)
        .setString("tag", s"t${i % 7}")
        .setInt32("score", i * 3)
      w.append(new LongWritable(i.toLong), new BytesWritable(LwesCodec.serialize(ev)))
    }
    w.close()
    val df = spark.read.format("lwes").schema("id long, tag string, score int").load(dir)
    assert(df.count() == 1000)
    assert(df.agg(sum("id")).head.getLong(0) == (0 until 1000).map(_.toLong).sum)
    assert(df.agg(sum("score")).head.getLong(0) == (0 until 1000).map(_ * 3L).sum)
    // eventName filter still applies inside blocks
    val a = spark.read.format("lwes").schema("id long")
      .option("eventName", "Seq::A").load(dir)
    assert(a.count() == 500)
  }
}
