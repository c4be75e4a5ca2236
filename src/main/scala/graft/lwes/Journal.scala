package graft.lwes

import java.io.{BufferedInputStream, BufferedOutputStream, EOFException, InputStream, OutputStream}
import java.nio.ByteBuffer
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** Journal record framing: 22-byte datagram header + serialized event.
  *
  * Header layout (big-endian), matching the reference
  * DatagramPacketOutputStream.java:30-74:
  * {{{
  * uint16 payloadLength | int64 receiptTimeMillis | 4B senderIP (reversed)
  * | uint16 senderPort | uint16 siteId | uint32 zero-padding
  * }}}
  */
object Journal {
  val HeaderLength = 22

  final case class Header(payloadLength: Int, receiptTime: Long,
      senderIp: Array[Byte], senderPort: Int, siteId: Int)

  def isGzip(path: String): Boolean =
    path.endsWith(".gz") || path.endsWith(".gzip")

  /** zstd rides zstd-jni (shipped with Spark for shuffle/parquet) rather
    * than Hadoop's ZStandardCodec, which needs the native libhadoop
    * binding that plain Spark deployments don't carry. `.zsj` (the
    * splittable container, [[SplitJournal]]) IS a valid multi-frame zstd
    * stream — its footer index rides a skippable frame that zstd
    * decoders pass over — so sequential readers treat it as plain zstd. */
  def isZstd(path: String): Boolean =
    path.endsWith(".zst") || path.endsWith(".zstd") ||
      path.endsWith("." + SplitJournal.Extension)

  /** Encode the 22-byte record header into `bb` (cleared first) —
    * shared by the sequential and splittable journal writers so the
    * wire layout has exactly one definition. */
  def encodeHeader(bb: ByteBuffer, len: Int, time: Long, ip: Array[Byte],
      port: Int, site: Int): Unit = {
    // the header length field is uint16 (wire-format constraint — events
    // are datagrams); a silent Short truncation would corrupt the stream
    if (len > 0xffff)
      throw new IllegalArgumentException(
        s"journal record of $len bytes; " +
          "LWES journal records are capped at 65535 (uint16 length header)")
    bb.clear()
    bb.putShort(len.toShort)
    bb.putLong(time)
    bb.put(ip(3)).put(ip(2)).put(ip(1)).put(ip(0))
    bb.putShort(port.toShort)
    bb.putShort(site.toShort)
    bb.putInt(0)
  }
}

/** Record-level journal write surface: the sequential gzip/zstd writer
  * ([[JournalWriter]]) and the splittable framed writer
  * ([[SplitJournalWriter]]) share it, so the DSv2 write path is
  * container-agnostic. */
trait JournalRecordWriter extends AutoCloseable {
  def writeRecord(payload: Array[Byte], off: Int, len: Int, time: Long,
      ip: Array[Byte], port: Int, site: Int): Unit

  /** Header fields are carried from the event's ReceiptTime/SenderIP/
    * SenderPort/SiteID attributes when present, zeros otherwise
    * (reference DatagramPacketOutputStream.java:83-119). */
  def write(ev: LwesEvent): Unit = {
    val payload = LwesCodec.serialize(ev)
    val time = ev.get(LwesEvent.ReceiptTime).map(_.value.asInstanceOf[Long]).getOrElse(0L)
    val ip = ev.get(LwesEvent.SenderIp).map(_.value.asInstanceOf[Array[Byte]])
      .getOrElse(Array[Byte](0, 0, 0, 0))
    val port = ev.get(LwesEvent.SenderPort).map(_.value.asInstanceOf[Int]).getOrElse(0)
    val site = ev.get(LwesEvent.SiteId).map(_.value.asInstanceOf[Int]).getOrElse(0)
    writeRecord(payload, 0, payload.length, time, ip, port, site)
  }
}

/** Common surface for the two journal container readers. */
trait EventStreamReader extends AutoCloseable {
  def next(): Option[LwesEvent]
  /** Records skipped because their payload was undecodable (0 for
    * containers without record-level resync). */
  def corruptRecords: Long = 0L
  def iterator: Iterator[LwesEvent] = new Iterator[LwesEvent] {
    private var nextEv: Option[LwesEvent] = EventStreamReader.this.next()
    def hasNext: Boolean = nextEv.isDefined
    def next(): LwesEvent = {
      val e = nextEv.get; nextEv = EventStreamReader.this.next(); e
    }
  }
}

/** Streaming journal reader.
  *
  * Mirrors reference DatagramPacketInputStream.readEvent
  * (DatagramPacketInputStream.java:41-87): reads the header, parses the
  * payload, then injects ReceiptTime/SenderIP/SenderPort/SiteID from
  * the header as event attributes. Improvements over the reference:
  *   - `eventNameFilter` rejects foreign events from the name byte alone
  *     (no attribute parse);
  *   - `wanted` projects the parse to requested attributes only.
  */
final class JournalReader(raw: InputStream,
    eventNameFilter: String => Boolean = null,
    wanted: String => Boolean = null) extends EventStreamReader {

  private val in = new BufferedInputStream(raw, 1 << 16)
  private val headerBuf = new Array[Byte](Journal.HeaderLength)
  private var payloadBuf = new Array[Byte](1 << 16)

  private def readFully(b: Array[Byte], len: Int): Boolean = {
    var off = 0
    while (off < len) {
      val n = in.read(b, off, len - off)
      if (n < 0) {
        if (off == 0) return false
        throw new EOFException(s"truncated journal record ($off/$len bytes)")
      }
      off += n
    }
    true
  }

  /** Next event passing the filters, or None at EOF. */
  def next(): Option[LwesEvent] = {
    while (true) {
      if (!readFully(headerBuf, Journal.HeaderLength)) return None
      val hb = ByteBuffer.wrap(headerBuf)
      val len = hb.getShort() & 0xffff
      val time = hb.getLong()
      val d = hb.get(); val c = hb.get(); val b = hb.get(); val a = hb.get()
      val ip = Array(a, b, c, d)
      val port = hb.getShort() & 0xffff
      val site = hb.getShort() & 0xffff
      if (payloadBuf.length < len) payloadBuf = new Array[Byte](len)
      if (!readFully(payloadBuf, len)) return None
      val evOrSkip: Option[LwesEvent] =
        try {
          val accept = eventNameFilter == null ||
            eventNameFilter(LwesCodec.eventName(payloadBuf, 0))
          if (!accept) None // foreign event never parsed
          else Some(LwesCodec.deserialize(payloadBuf, 0, len, wanted))
        } catch {
          // Record-level resync: the uint16 length header frames every
          // record, so an undecodable PAYLOAD (foreign traffic captured
          // on the port, flipped bytes) costs exactly one record and
          // the reader continues at the next frame — an improvement
          // over the reference, which treats the first bad record as
          // EOF (DatagramPacketInputStream.java:79-85). Short reads
          // (torn tail) still end the file via EOFException above.
          case _: IllegalArgumentException | _: IndexOutOfBoundsException |
              _: java.nio.BufferUnderflowException =>
            corruptCount += 1
            None
        }
      evOrSkip match {
        case Some(ev) =>
          // header-derived attrs overwrite any payload copies, like the
          // reference (DatagramPacketInputStream.java:75-78)
          if (wanted == null || wanted(LwesEvent.ReceiptTime))
            ev.setInt64(LwesEvent.ReceiptTime, time)
          if (wanted == null || wanted(LwesEvent.SenderIp))
            ev.setIpAddr(LwesEvent.SenderIp, ip)
          if (wanted == null || wanted(LwesEvent.SenderPort))
            ev.setUInt16(LwesEvent.SenderPort, port)
          if (wanted == null || wanted(LwesEvent.SiteId))
            ev.setUInt16(LwesEvent.SiteId, site)
          return Some(ev)
        case None => // skip and loop
      }
    }
    None // unreachable
  }

  private var corruptCount = 0L

  /** Records skipped by the resync path (undecodable payloads). */
  override def corruptRecords: Long = corruptCount

  override def close(): Unit = in.close()
}

object JournalReader {
  /** Open a local file, transparently un-gzipping by extension. */
  def open(path: String, eventNameFilter: String => Boolean = null,
      wanted: String => Boolean = null): JournalReader = {
    val fis = new java.io.FileInputStream(path)
    val is: InputStream =
      if (Journal.isGzip(path)) new GZIPInputStream(fis, 1 << 16)
      else if (Journal.isZstd(path)) new com.github.luben.zstd.ZstdInputStream(fis)
      else fis
    new JournalReader(is, eventNameFilter, wanted)
  }
}

/** Streaming journal writer (reference DatagramPacketOutputStream
  * .writeEvent, DatagramPacketOutputStream.java:83-119).
  */
final class JournalWriter(raw: OutputStream) extends JournalRecordWriter {
  private val out = new BufferedOutputStream(raw, 1 << 16)
  private val headerBuf = ByteBuffer.allocate(Journal.HeaderLength)

  /** Raw capture write: header + payload bytes verbatim, no parse — the
    * shape of the reference's datagram journaling (a received packet is
    * stamped and appended without deserializing it,
    * DatagramPacketOutputStream.java:42-74). */
  def writeRecord(payload: Array[Byte], off: Int, len: Int, time: Long,
      ip: Array[Byte], port: Int, site: Int): Unit = {
    Journal.encodeHeader(headerBuf, len, time, ip, port, site)
    out.write(headerBuf.array(), 0, Journal.HeaderLength)
    out.write(payload, off, len)
  }

  override def close(): Unit = { out.flush(); out.close() }
}

object JournalWriter {
  /** Open a journal writer for a local file, container by extension:
    * `.zsj` selects the splittable [[SplitJournalWriter]] (the
    * extension IS the split-container contract — a plain zstd stream
    * under that name would silently never split), everything else the
    * sequential [[JournalWriter]] with gzip/zstd by extension. */
  def create(path: String): JournalRecordWriter = {
    val f = new java.io.File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    val fos = new java.io.FileOutputStream(f)
    if (SplitJournal.isSplit(path)) new SplitJournalWriter(fos)
    else {
      val os: OutputStream =
        if (Journal.isGzip(path)) new GZIPOutputStream(fos, 1 << 16)
        else if (Journal.isZstd(path)) new com.github.luben.zstd.ZstdOutputStream(fos)
        else fos
      new JournalWriter(os)
    }
  }
}
