package graft.sources.lwes

import java.nio.file.Files

import graft.lwes.{JournalWriter, LwesEvent}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Vectorized scan output (A-surface scale polish): batches of events
  * land in ColumnarBatch vectors and Spark converts via codegen'd
  * ColumnarToRow; results must be bit-identical to the row path across
  * every type the wire format can carry.
  */
class LwesColumnarSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def writeJournal(dir: String, files: Int, perFile: Int): Unit =
    (0 until files).foreach { f =>
      val w = JournalWriter.create(s"$dir/j$f.journal.gz")
      (0 until perFile).foreach { i =>
        val id = f * perFile + i
        val ev = LwesEvent(if (id % 4 == 0) "Col::A" else "Col::B")
          .setInt64("id", id.toLong)
          .setInt32("i32", id * 3)
          .setInt16("i16", (id % 100).toShort)
          .setUInt16("u16", id % 500)
          .setUInt32("u32", id.toLong * 7)
          .setUInt64("u64", -1L - id) // wraps: unsigned 2^64-1-id
          .setBool("flag", id % 3 == 0)
          .setString("cost", (id * 0.25).toString) // float-from-string
          .setIpAddr("ip", Array(10, 0, (id % 200).toByte, 1))
          .setInt64(LwesEvent.ReceiptTime, 1700000000000L + id)
        if (id % 5 != 0) ev.setString("opt", s"v$id") // sometimes-missing attr
        w.write(ev)
      }
      w.close()
    }

  private val schemaDdl =
    "id long, i32 int, i16 short, u16 int, u32 long, u64 decimal(20,0), " +
      "flag boolean, cost double, ip string, opt string, ReceiptTime long"

  test("columnar scan is active and matches the row path on every type") {
    val dir = Files.createTempDirectory("lwes-col").toString
    writeJournal(dir, 3, 400)
    def read(vectorized: Boolean) = spark.read.format("lwes")
      .schema(schemaDdl).option("uint64As", "decimal")
      .option("vectorized", vectorized.toString).load(dir)
    // the default plan really takes the columnar path
    val plan = read(vectorized = true).queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"),
      s"expected ColumnarToRow in the plan:\n$plan")
    val rowPlan = read(vectorized = false).queryExecution.executedPlan.toString
    assert(!rowPlan.contains("ColumnarToRow"), "vectorized=false must be row-based")
    // bit-identical outputs, nulls included
    val a = read(vectorized = true).orderBy("id").collect()
    val b = read(vectorized = false).orderBy("id").collect()
    assert(a.length == 1200 && a.sameElements(b))
    // spot-check semantics survived the vector writes
    val r = a(10) // id 10: % 5 == 0 -> opt null; % 4 != 0 -> Col::B
    assert(r.getLong(0) == 10L && r.getInt(1) == 30 && r.getShort(2) == 10)
    assert(r.getDouble(7) == 2.5) // float-from-string
    assert(r.getString(8) == "10.0.10.1")
    assert(r.isNullAt(9))
    assert(r.getDecimal(5).toString == (BigInt(2).pow(64) - 11).toString)
  }

  test("columnar path honors eventName filter, mapping, and LIMIT") {
    val dir = Files.createTempDirectory("lwes-col2").toString
    writeJournal(dir, 2, 200)
    val df = spark.read.format("lwes")
      .schema("key long, c double")
      .option("eventName", "Col::A")
      .option("mapping", "key:id, c:cost").load(dir)
    assert(df.count() == 100) // every 4th of 400
    assert(df.agg(sum("key")).head.getLong(0) == (0 until 400 by 4).map(_.toLong).sum)
    val lim = df.limit(7).collect()
    assert(lim.length == 7)
    // multi-event mapping nulls columns of foreign types
    val multi = spark.read.format("lwes")
      .schema("a_id long, b_id long")
      .option("mapping", "a_id:Col::A::id, b_id:Col::B::id").load(dir)
    val counts = multi.agg(count(col("a_id")), count(col("b_id"))).head
    assert(counts.getLong(0) == 100 && counts.getLong(1) == 300)
  }

  test("malformed-UTF-8 wire strings round-trip identically in both paths") {
    import graft.lwes.LwesCodec
    val bad = Array(0xC3, 0x28, 0xFF, 0x80, 0xE2, 0x82).map(_.toByte)
    val dir = Files.createTempDirectory("lwes-col-utf8").toString
    val w = JournalWriter.create(s"$dir/j.journal")
    (0 until 50).foreach { i =>
      val payload = LwesCodec.serialize(LwesEvent("Col::U")
        .setInt64("id", i.toLong).setString("s", "ZZZZZZ")
        .setString("ok", "héllo→世界"))
      if (i % 2 == 0) {
        // patch the marker value to invalid UTF-8 on the wire: bad
        // continuation (C3 28), stray FF, lone continuation (80), and a
        // truncated 3-byte sequence (E2 82) — equal length keeps framing
        val at = payload.indexOfSlice("ZZZZZZ".getBytes("UTF-8"))
        assert(at > 0)
        System.arraycopy(bad, 0, payload, at, bad.length)
      }
      w.writeRecord(payload, 0, payload.length, 1700000000000L + i,
        Array[Byte](0, 0, 0, 0), 0, 0)
    }
    w.close()
    def read(v: Boolean) = spark.read.format("lwes")
      .schema("id long, s string, ok string")
      .option("vectorized", v.toString).load(dir)
    val a = read(v = true).orderBy("id").collect()
    val b = read(v = false).orderBy("id").collect()
    assert(a.length == 50 && a.sameElements(b))
    assert(a(1).getString(1) == "ZZZZZZ")
    // malformed bytes surface as the JVM's replacement-char decode
    assert(a(0).getString(1) ==
      new String(bad, java.nio.charset.StandardCharsets.UTF_8))
    assert(a(0).getString(2) == "héllo→世界")
    // non-ASCII equality can't early-check (StrEqEarly defers) but the
    // post check over the finished vectors must still be exact
    assert(read(v = true)
      .filter(col("ok") === "héllo→世界").count() == 50)
    assert(read(v = true).filter(col("ok") === "héllo").count() == 0)
  }

  test("invalid-UTF-8 EVENT NAMES filter identically in both paths") {
    import graft.lwes.LwesCodec
    val dir = Files.createTempDirectory("lwes-col-name").toString
    val w = JournalWriter.create(s"$dir/j.journal")
    (0 until 30).foreach { i =>
      val payload = LwesCodec.serialize(
        LwesEvent(if (i % 2 == 0) "Col::AB" else "Col::OK")
          .setInt64("id", i.toLong))
      if (i % 2 == 0) {
        // patch the name's trailing "AB" (payload offset 1 + 5) to a
        // stray 0xFF + lone continuation 0x80 — invalid UTF-8 that the
        // row path DECODES (two replacement chars) before comparing
        payload(6) = 0xFF.toByte
        payload(7) = 0x80.toByte
      }
      w.writeRecord(payload, 0, payload.length, 1700000000000L + i,
        Array[Byte](0, 0, 0, 0), 0, 0)
    }
    w.close()
    val decodedBad = "Col::��"
    def read(v: Boolean, name: String) = spark.read.format("lwes")
      .schema("id long").option("eventName", name)
      .option("vectorized", v.toString).load(dir)
    // a name that only matches after UTF-8 decode: the columnar byte
    // compare misses, the non-ASCII fallback must recover row parity
    val a = read(v = true, decodedBad).orderBy("id").collect().map(_.getLong(0))
    val b = read(v = false, decodedBad).orderBy("id").collect().map(_.getLong(0))
    assert(a.toSeq == (0 until 30 by 2).map(_.toLong))
    assert(a.sameElements(b))
    // pure-ASCII names stay on the fast byte path
    assert(read(v = true, "Col::OK").count() ==
      read(v = false, "Col::OK").count())
    assert(read(v = true, "Col::OK").count() == 15)
  }

  test("corruption resync and torn tails behave identically in both paths") {
    val dir = Files.createTempDirectory("lwes-col-torn").toString
    val path = s"$dir/j.journal"
    val w = JournalWriter.create(path)
    (0 until 300).foreach { i =>
      w.write(LwesEvent("Col::T").setInt64("id", i.toLong)
        .setString("s", s"v$i"))
      if (i % 50 == 25) { // undecodable-but-framed garbage mid-file
        val junk = Array.fill[Byte](40)(0x55)
        junk(0) = 0xF0.toByte // invalid name length -> forces resync
        w.writeRecord(junk, 0, junk.length, 0L, Array[Byte](0, 0, 0, 0), 0, 0)
      }
    }
    w.close()
    val raf = new java.io.RandomAccessFile(path, "rw")
    raf.setLength(raf.length() - 7) // tear mid-payload of the last record
    raf.close()
    def read(v: Boolean) = spark.read.format("lwes")
      .schema("id long, s string").option("eventName", "Col::T")
      .option("vectorized", v.toString).load(dir)
    val a = read(v = true).orderBy("id").collect()
    val b = read(v = false).orderBy("id").collect()
    assert(a.sameElements(b))
    // only the torn final record is lost; garbage cost no good rows
    assert(a.length == 299 && a.map(_.getLong(0)).toSeq == (0L until 299L))
  }

  test("SEQ containers use the byte path and match the row path on every type") {
    import org.apache.hadoop.io.{BytesWritable, LongWritable, SequenceFile}
    import graft.lwes.LwesCodec
    val dir = Files.createTempDirectory("lwes-col-seq").toString
    val conf = spark.sessionState.newHadoopConf()
    def open(path: String, ct: SequenceFile.CompressionType) =
      SequenceFile.createWriter(conf,
        SequenceFile.Writer.file(new org.apache.hadoop.fs.Path(path)),
        SequenceFile.Writer.keyClass(classOf[LongWritable]),
        SequenceFile.Writer.valueClass(classOf[BytesWritable]),
        SequenceFile.Writer.compression(ct))
    val writers = Array(
      open(s"$dir/j0.seq", SequenceFile.CompressionType.NONE),
      open(s"$dir/j1.seq", SequenceFile.CompressionType.RECORD),
      open(s"$dir/j2.seq", SequenceFile.CompressionType.BLOCK))
    (0 until 300).foreach { id =>
      val ev = LwesEvent(if (id % 4 == 0) "Col::A" else "Col::B")
        .setInt64("id", id.toLong)
        .setInt32("i32", id * 3)
        .setInt16("i16", (id % 100).toShort)
        .setUInt16("u16", id % 500)
        .setUInt32("u32", id.toLong * 7)
        .setUInt64("u64", -1L - id)
        .setBool("flag", id % 3 == 0)
        .setString("cost", (id * 0.25).toString)
        .setIpAddr("ip", Array(10, 0, (id % 200).toByte, 1))
        .setInt64(LwesEvent.ReceiptTime, 1700000000000L + id)
      if (id % 5 != 0) ev.setString("opt", s"v$id")
      val payload = LwesCodec.serialize(ev)
      val framed = new Array[Byte](payload.length + 4)
      framed(0) = (payload.length >>> 24).toByte
      framed(1) = (payload.length >>> 16).toByte
      framed(2) = (payload.length >>> 8).toByte
      framed(3) = payload.length.toByte
      System.arraycopy(payload, 0, framed, 4, payload.length)
      writers(id % 3).append(new LongWritable(id.toLong),
        new BytesWritable(framed))
    }
    writers.foreach(_.close())
    def read(v: Boolean) = spark.read.format("lwes").schema(schemaDdl)
      .option("uint64As", "decimal").option("vectorized", v.toString).load(dir)
    val a = read(v = true).orderBy("id").collect()
    val b = read(v = false).orderBy("id").collect()
    assert(a.length == 300 && a.sameElements(b))
    // SEQ has no journal frame header, and header-mapped columns are
    // header-derived in both paths -> NULL for SEQ (row-path parity)
    assert(a(5).isNullAt(10) && b(5).isNullAt(10))
    // sometimes-missing attr is null in both
    assert(a(0).isNullAt(9) && b(0).isNullAt(9))
    // eventName filter applies on the wire bytes
    assert(read(v = true).where("id % 4 = 0").count() ==
      spark.read.format("lwes").schema(schemaDdl).option("uint64As", "decimal")
        .option("eventName", "Col::A").option("vectorized", "true").load(dir)
        .count())
  }

  test("decimal-element arrays are vectorized and match the row path (r16)") {
    val dir = Files.createTempDirectory("lwes-col-decarr").toString
    val w = JournalWriter.create(s"$dir/j.journal.gz")
    (0 until 5000).foreach { i => // crosses the 4096-row batch boundary
      val ev = LwesEvent("Dec::Arr")
        .setInt64("id", i.toLong)
        .setUInt64("u64", -1L - i)
        .setUInt64Array("us", Array(i.toLong, -1L - i, Long.MinValue + i))
        .setInt32Array("is", Array(i, i + 1))
      if (i % 7 != 0) ev.setUInt64Array("opt_us", Array(-2L - i))
      w.write(ev)
    }
    w.close()
    val ddl = "id long, u64 decimal(20,0), us array<decimal(20,0)>, " +
      "is array<int>, opt_us array<decimal(20,0)>"
    def read(v: Boolean) = spark.read.format("lwes").schema(ddl)
      .option("uint64As", "decimal").option("vectorized", v.toString).load(dir)
    // the uint64As=decimal + uint64[] schema STAYS on the columnar path
    // (the exact mixed-schema shape that used to fall back to rows)
    val plan = read(v = true).queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"),
      s"decimal-element arrays must ride the vectorized scan:\n$plan")
    val a = read(v = true).orderBy("id").collect()
    val b = read(v = false).orderBy("id").collect()
    assert(a.length == 5000 && a.sameElements(b))
    // unsigned-exact element values, 2^63..2^64-1 range included
    val r = a(3)
    assert(r.getSeq[java.math.BigDecimal](2).map(_.toString) == Seq(
      "3", (BigInt(2).pow(64) - 4).toString,
      (BigInt(2).pow(63) + 3).toString))
    assert(a(0).isNullAt(4) && a(1).getSeq[java.math.BigDecimal](4).head
      .toString == (BigInt(2).pow(64) - 3).toString)
  }

  test("columnar batches cross the 4096-row boundary intact") {
    val dir = Files.createTempDirectory("lwes-col3").toString
    writeJournal(dir, 1, 9000) // one file -> one reader, 3 batches
    val df = spark.read.format("lwes").schema("id long").load(dir)
    assert(df.count() == 9000)
    assert(df.agg(sum("id")).head.getLong(0) == (0L until 9000L).sum)
  }
}
