package graft.lwes

import java.io.File
import java.net.{DatagramPacket, DatagramSocket, SocketTimeoutException}

/** UDP journal capture — the reference system's ingest side: LWES
  * events arrive as UDP datagrams and are appended to journal files
  * with a 22-byte receipt header stamped from the packet (receipt time,
  * sender ip/port, site id — DatagramPacketOutputStream.java:30-74).
  * The payload is journaled VERBATIM, never parsed: capture must not
  * depend on being able to decode what it captures.
  *
  * Files rotate by size and age and become visible atomically
  * (hidden `.capture-*.tmp` while open, renamed on close), so the
  * streaming source tailing the directory — which skips hidden files —
  * only ever admits complete journals. Capture (this class, one cheap
  * single-threaded loop per listener) and analytics (Spark over the
  * journal directory) scale independently, which is exactly the
  * reference deployment's journaller/Hadoop split.
  */
final class UdpJournaller(dir: String, port: Int = 0, siteId: Int = 0,
    rotateBytes: Long = 64L << 20, rotateMs: Long = 60000L,
    compression: String = "gzip", multicastGroup: Option[String] = None,
    frameFlushMs: Long = 1000L)
    extends AutoCloseable {

  private val ext = compression match {
    case "gzip" => "journal.gz"
    case "zstd" | "zst" => "journal.zst"
    // capture straight into the splittable container (A22): rotated
    // files scan as many tasks without a compaction pass in between.
    // Tradeoff vs the stream codecs: records buffer in the open frame
    // (up to the writer's frameRawBytes) before touching disk, so the
    // capture loop force-flushes the open frame every `frameFlushMs`
    // to keep the crash-loss window time-bounded — smaller frames cost
    // some compression ratio but a dead daemon loses ≤ frameFlushMs of
    // traffic instead of a whole 4 MiB frame.
    case "split-zstd" => s"journal.${SplitJournal.Extension}"
    case "none" => "journal"
    case other => throw new IllegalArgumentException(
      s"unsupported capture compression '$other' (gzip|zstd|split-zstd|none)")
  }

  new File(dir).mkdirs()
  // lwes emitters broadcast to a multicast group (the canonical lwes
  // transport); a plain unicast socket otherwise
  private val socket: DatagramSocket = multicastGroup match {
    case Some(group) =>
      val ms = new java.net.MulticastSocket(port)
      ms.joinGroup(new java.net.InetSocketAddress(
        java.net.InetAddress.getByName(group), port), null)
      ms
    case None => new DatagramSocket(port)
  }
  // a deep OS buffer rides out rotation pauses (close+rename happens
  // on the receive thread; packets arriving meanwhile queue here)
  socket.setReceiveBufferSize(4 << 20)
  socket.setSoTimeout(200) // wake to check the age-based rotation clock

  /** The bound port (useful with port = 0, an ephemeral port). */
  def boundPort: Int = socket.getLocalPort

  @volatile private var running = true
  private var seq = 0
  private var cur: JournalRecordWriter = null
  private var curTmp: File = null
  private var curBytes = 0L
  private var curOpenedAt = 0L
  private var lastFrameFlush = 0L
  @volatile private var receivedCount = 0L
  @volatile private var lastError: Option[Throwable] = None

  /** Datagrams journaled so far (monotonic; for tests/monitoring). */
  def received: Long = receivedCount

  /** Last unexpected capture-loop error, if any. A non-empty value with
    * `received` not advancing means capture is degraded — the signal an
    * operator (or a liveness probe) should alert on.
    */
  def failed: Option[Throwable] = lastError

  private def ensureWriter(now: Long): Unit = if (cur == null) {
    // hidden while open; the ".tmp" suffix defeats extension-based codec
    // detection, so the codec is chosen explicitly here
    curTmp = new File(dir, s".capture-$seq.$ext.tmp")
    val fos = new java.io.FileOutputStream(curTmp)
    cur = compression match {
      case "gzip" => new JournalWriter(new java.util.zip.GZIPOutputStream(fos, 1 << 16))
      case "zstd" | "zst" => new JournalWriter(new com.github.luben.zstd.ZstdOutputStream(fos))
      case "split-zstd" => new SplitJournalWriter(fos)
      case _ => new JournalWriter(fos)
    }
    curBytes = 0L
    curOpenedAt = now
    lastFrameFlush = now
  }

  /** Time-bound the split-zstd crash-loss window: the open frame holds
    * received-but-unwritten datagrams, so force it to disk every
    * `frameFlushMs` (no-op for the stream codecs, whose own buffers are
    * ≤64 KiB and flushed by rotation). */
  private def maybeFlushFrame(now: Long): Unit = cur match {
    case w: SplitJournalWriter if now - lastFrameFlush >= frameFlushMs =>
      w.flushOpenFrame()
      lastFrameFlush = now
    case _ =>
  }

  private def rotate(): Unit = if (cur != null) {
    cur.close()
    val dest = new File(dir, f"capture-$curOpenedAt-$seq%05d.$ext")
    val promoted = curTmp.renameTo(dest)
    val tmp = curTmp
    // clear state BEFORE any throw: a failed promote must not leave a
    // closed writer behind for the next writeRecord to hit
    seq += 1
    cur = null
    curTmp = null
    if (!promoted)
      throw new java.io.IOException(s"cannot promote ${tmp.getPath}")
  }

  private val thread = new Thread(() => loop(), "lwes-udp-journaller")
  thread.setDaemon(true)

  def start(): UdpJournaller = { thread.start(); this }

  private def loop(): Unit = {
    val buf = new Array[Byte](0xffff)
    val pkt = new DatagramPacket(buf, buf.length)
    while (running) {
      try {
        socket.receive(pkt)
        val now = System.currentTimeMillis()
        ensureWriter(now)
        val a = pkt.getAddress.getAddress
        val ip4 = if (a.length == 4) a else Array[Byte](0, 0, 0, 0)
        cur.writeRecord(pkt.getData, pkt.getOffset, pkt.getLength,
          now, ip4, pkt.getPort, siteId)
        curBytes += pkt.getLength + Journal.HeaderLength
        receivedCount += 1
        if (curBytes >= rotateBytes || now - curOpenedAt >= rotateMs) rotate()
        else maybeFlushFrame(now)
      } catch {
        case _: SocketTimeoutException =>
          // no traffic: age-based rotation still has to fire, or a slow
          // trickle would pin events invisible in the hidden file
          val now = System.currentTimeMillis()
          if (cur != null && now - curOpenedAt >= rotateMs) rotate()
          else maybeFlushFrame(now)
        case _: java.net.SocketException if !running => // closed by close()
        case scala.util.control.NonFatal(e) if running =>
          // disk-full IOException, a failed promote from rotate(), … —
          // without this arm any such error would silently kill the
          // daemon receive thread while the process looks healthy
          lastError = Some(e)
          System.err.println(
            s"[graft-udp-journaller] capture error (retrying): $e")
          try Thread.sleep(200)
          catch { case _: InterruptedException => running = false }
      }
    }
  }

  override def close(): Unit = {
    running = false
    socket.close()
    thread.join(5000)
    if (!thread.isAlive)
      rotate() // promote the in-flight file so nothing captured is lost
    else
      // a wedged receive thread may still hold the writer; rotating here
      // would race it (double-close / write-after-close)
      System.err.println("[graft-udp-journaller] receive thread still " +
        "alive after 5s; skipping final rotate to avoid racing the writer")
  }
}
