package graft.lwes

import java.net.{DatagramPacket, DatagramSocket, InetAddress}
import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** UDP capture → journal → Spark read, end to end over loopback — the
  * reference deployment's journaller/analytics split. */
class UdpJournallerSpec extends AnyFunSuite {

  // registers the extensions like every other suite: sessions are
  // JVM-shared across suites, and whichever suite builds it first must
  // not strip the TopKPerKey rule/strategy from the rest of the run
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("live pipeline: UDP capture feeding a running streaming query") {
    // the whole reference deployment in one test: emit -> capture ->
    // age-rotate -> streaming source admits the promoted files ->
    // aggregate. Age-based rotation (300 ms) is what makes the data
    // flow WHILE capture continues.
    val dir = Files.createTempDirectory("udp-live").toString
    val j = new UdpJournaller(dir, port = 0, siteId = 1,
      rotateBytes = 1L << 20, rotateMs = 300L, compression = "gzip").start()
    val stream = spark.readStream.format("lwes")
      .schema("id long")
      .option("eventName", "Live::E").load(dir)
    val q = stream.writeStream.format("memory")
      .queryName("udp_live").outputMode("append").start()
    try {
      val sender = new DatagramSocket()
      val target = InetAddress.getLoopbackAddress
      val n = 120
      def send(range: Range): Unit = range.foreach { i =>
        val payload = LwesCodec.serialize(
          LwesEvent("Live::E").setInt64("id", i.toLong))
        sender.send(new DatagramPacket(payload, payload.length, target, j.boundPort))
      }
      // first chunk, then WAIT until the running query has surfaced it
      // before sending the rest — proves data flows during capture
      // rather than as one post-hoc backfill
      send(0 until 40)
      val seenFirst = System.currentTimeMillis() + 15000
      while (spark.table("udp_live").isEmpty &&
          System.currentTimeMillis() < seenFirst)
        Thread.sleep(100)
      assert(!spark.table("udp_live").isEmpty,
        "streaming query must surface rows while capture continues")
      send(40 until n)
      sender.close()
      val deadline = System.currentTimeMillis() + 10000
      while (j.received < n && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      assert(j.received == n)
      j.close() // promotes the in-flight tail file
      q.processAllAvailable()
      val got = spark.table("udp_live").collect().map(_.getLong(0)).toSet
      assert(got == (0 until n).map(_.toLong).toSet,
        s"missing: ${(0 until n).map(_.toLong).toSet -- got}")
      assert(q.recentProgress.count(_.numInputRows > 0) >= 2)
    } finally q.stop()
  }

  test("multicast capture journals group traffic (canceled if the netns lacks multicast)") {
    val dir = Files.createTempDirectory("udp-mcast").toString
    val group = "230.21.42.9"
    val j = try
      new UdpJournaller(dir, port = 0, compression = "none",
        multicastGroup = Some(group)).start()
    catch { case e: java.io.IOException => cancel(s"multicast join unavailable: $e") }
    try {
      val sender = new DatagramSocket()
      val payload = LwesCodec.serialize(LwesEvent("MC::E").setInt64("id", 1L))
      (0 until 5).foreach { _ =>
        sender.send(new DatagramPacket(payload, payload.length,
          InetAddress.getByName(group), j.boundPort))
        Thread.sleep(20)
      }
      sender.close()
      val deadline = System.currentTimeMillis() + 3000
      while (j.received < 5 && System.currentTimeMillis() < deadline) Thread.sleep(20)
      if (j.received == 0) cancel("multicast loopback not routed in this netns")
      j.close()
      val df = spark.read.format("lwes").schema("id long")
        .option("eventName", "MC::E").load(dir)
      assert(df.count() == j.received)
    } finally j.close()
  }

  test("split-zstd capture lands splittable journals readable by the source") {
    val dir = Files.createTempDirectory("udp-split").toString
    val j = new UdpJournaller(dir, port = 0, siteId = 3,
      rotateBytes = 1L << 20, rotateMs = 60000L,
      compression = "split-zstd").start()
    val sender = new DatagramSocket()
    val target = InetAddress.getLoopbackAddress
    val n = 150
    (0 until n).foreach { i =>
      val payload = LwesCodec.serialize(
        LwesEvent("Cap::S").setInt64("id", i.toLong))
      sender.send(new DatagramPacket(payload, payload.length, target, j.boundPort))
      if (i % 20 == 19) Thread.sleep(2)
    }
    val deadline = System.currentTimeMillis() + 10000
    while (j.received < n && System.currentTimeMillis() < deadline)
      Thread.sleep(20)
    assert(j.received == n, s"journaller received ${j.received}/$n")
    j.close()
    sender.close()
    val files = new java.io.File(dir).listFiles()
    assert(files.nonEmpty && files.forall(_.getName.endsWith(".journal.zsj")))
    // a valid split container: footer index parses and covers every record
    val f = files.head
    val pth = new org.apache.hadoop.fs.Path(f.getAbsolutePath)
    val hfs = pth.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val in = hfs.open(pth)
    val frames =
      try SplitJournal.readFooter(in, f.length()).get
      finally in.close()
    assert(frames.map(_.records.toLong).sum == n.toLong)
    // receipt-time bounds stamped per frame at capture time
    assert(frames.forall(fr => fr.minReceipt > 0 && fr.minReceipt <= fr.maxReceipt))
    val rows = spark.read.format("lwes")
      .schema("id long, SiteID int")
      .option("eventName", "Cap::S").load(dir).collect()
    assert(rows.length == n)
    assert(rows.map(_.getLong(0)).toSet == (0 until n).map(_.toLong).toSet)
    assert(rows.forall(_.getInt(1) == 3))
  }

  test("split-zstd capture flushes the open frame on the frameFlushMs timer") {
    // r13 ADVICE: with split-zstd the open frame used to hold up to
    // frameRawBytes (4 MiB) in memory — a crash lost it all. The loop
    // now force-flushes every frameFlushMs, so received bytes reach the
    // (hidden, in-flight) file within the flush window even with no
    // rotation and no further traffic.
    val dir = Files.createTempDirectory("udp-flush").toString
    val j = new UdpJournaller(dir, port = 0, siteId = 4,
      rotateBytes = 64L << 20, rotateMs = 600000L, // rotation never fires
      compression = "split-zstd", frameFlushMs = 200L).start()
    val sender = new DatagramSocket()
    val target = InetAddress.getLoopbackAddress
    val n = 30
    (0 until n).foreach { i =>
      val payload = LwesCodec.serialize(
        LwesEvent("Cap::F").setInt64("id", i.toLong))
      sender.send(new DatagramPacket(payload, payload.length, target, j.boundPort))
    }
    sender.close()
    val deadline = System.currentTimeMillis() + 5000
    while (j.received < n && System.currentTimeMillis() < deadline)
      Thread.sleep(20)
    assert(j.received == n, s"journaller received ${j.received}/$n")
    def tmpLen: Long = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith(".capture-")).map(_.length()).sum
    // the timer fires on the 200ms SoTimeout tick; give it a few ticks
    val flushDeadline = System.currentTimeMillis() + 3000
    while (tmpLen == 0 && System.currentTimeMillis() < flushDeadline)
      Thread.sleep(50)
    assert(tmpLen > 0,
      "open frame must reach disk within the flush window without rotation")
    j.close()
    // and the flush cadence must not corrupt the container
    val df = spark.read.format("lwes").schema("id long")
      .option("eventName", "Cap::F").load(dir)
    assert(df.count() == n)
  }

  test("datagrams are journaled with receipt headers and read back by the source") {
    val dir = Files.createTempDirectory("udp-journal").toString
    // tiny rotateBytes forces several rotations mid-capture
    val j = new UdpJournaller(dir, port = 0, siteId = 7,
      rotateBytes = 4096, rotateMs = 60000L, compression = "gzip").start()
    val sender = new DatagramSocket()
    val target = InetAddress.getLoopbackAddress
    val n = 200
    (0 until n).foreach { i =>
      val payload = LwesCodec.serialize(
        LwesEvent("Cap::E").setInt64("id", i.toLong)
          .setString("pad", "x" * 50))
      sender.send(new DatagramPacket(payload, payload.length, target, j.boundPort))
      // loopback is lossless only while the receiver keeps up; pace a
      // little so rotation pauses never overrun the 4 MB socket buffer
      if (i % 20 == 19) Thread.sleep(2)
    }
    val deadline = System.currentTimeMillis() + 10000
    while (j.received < n && System.currentTimeMillis() < deadline)
      Thread.sleep(20)
    assert(j.received == n, s"journaller received ${j.received}/$n")
    assert(j.failed.isEmpty, s"healthy capture must report no error: ${j.failed}")
    j.close()
    val senderPort = sender.getLocalPort
    sender.close()

    val files = new java.io.File(dir).listFiles()
    assert(files.forall(f => !f.getName.startsWith(".")),
      "no hidden in-flight files may remain after close")
    assert(files.length > 1, s"rotateBytes=4096 must rotate: ${files.length} file(s)")
    assert(files.forall(_.getName.endsWith(".journal.gz")))

    val df = spark.read.format("lwes")
      .schema("id long, pad string, ReceiptTime long, SenderPort int, SiteID int")
      .option("eventName", "Cap::E").load(dir)
    val rows = df.collect()
    assert(rows.length == n)
    assert(rows.map(_.getLong(0)).toSet == (0 until n).map(_.toLong).toSet)
    assert(rows.forall(_.getString(1) == "x" * 50))
    assert(rows.forall(_.getInt(4) == 7), "SiteID stamped from the journaller")
    assert(rows.forall(_.getInt(3) == senderPort), "SenderPort from the packet")
    val now = System.currentTimeMillis()
    assert(rows.forall(r => math.abs(r.getLong(2) - now) < 600000),
      "ReceiptTime stamped at capture")
  }
}
