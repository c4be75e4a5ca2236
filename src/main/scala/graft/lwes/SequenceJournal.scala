package graft.lwes

import java.io.{BufferedInputStream, DataInputStream, EOFException, InputStream}

/** Reader for LWES journals stored as Hadoop SequenceFiles of
  * `EventWritable` — the second journal layout the reference supported
  * ("Journal files may either be stored as a stream of EventWritable or
  * EventListWritable, SerDe will detect that through introspection",
  * reference EventSerDe.java:36-38).
  *
  * The container is parsed directly from the public SequenceFile byte
  * layout (SEQ magic, version, class names, sync markers, framed
  * records), so the reference's `org.lwes.hadoop.EventWritable` class
  * does not need to exist on the classpath: the value payload is
  * `[4-byte big-endian length][serialized event]`
  * (reference EventWritable.java:52-57), identical to `BytesWritable`'s
  * wire shape. Supports uncompressed, zlib record-compressed, and zlib
  * block-compressed containers (the three layouts Hive tables over the
  * reference SerDe could physically contain).
  */
final class SequenceJournalReader(raw: InputStream,
    eventNameFilter: String => Boolean = null,
    wanted: String => Boolean = null) extends EventStreamReader {

  private val in = new DataInputStream(
    if (raw.isInstanceOf[BufferedInputStream]) raw
    else new BufferedInputStream(raw, 1 << 16))

  private val sync = new Array[Byte](16)
  private var recordCompressed = false
  private var blockCompressed = false

  // ----------------------------------------------------------- header
  {
    val magic = new Array[Byte](3)
    in.readFully(magic)
    require(magic.sameElements("SEQ".getBytes), "not a SequenceFile")
    val version = in.readByte()
    require(version >= 5, s"unsupported SequenceFile version $version")
    readVIntString() // key class name (e.g. o.a.h.io.LongWritable)
    readVIntString() // value class name (e.g. org.lwes.hadoop.EventWritable)
    recordCompressed = in.readBoolean()
    blockCompressed = in.readBoolean()
    if (recordCompressed || blockCompressed) {
      val codec = readVIntString()
      require(codec == "org.apache.hadoop.io.compress.DefaultCodec",
        s"unsupported SequenceFile codec $codec (only zlib/DefaultCodec)")
    }
    val metaCount = in.readInt()
    (0 until metaCount).foreach { _ => readVIntString(); readVIntString() }
    in.readFully(sync)
  }

  /** zlib-inflate a record-compressed value. */
  private def inflate(compressed: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(compressed)
    val out = new java.io.ByteArrayOutputStream(compressed.length * 3)
    val buf = new Array[Byte](8192)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      if (n == 0 && inf.needsInput()) throw new EOFException("truncated deflate value")
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  /** Hadoop Text encoding: vint length + UTF-8 bytes. */
  private def readVIntString(): String = {
    val len = readVInt()
    val b = new Array[Byte](len)
    in.readFully(b)
    new String(b, "UTF-8")
  }

  /** Hadoop WritableUtils vint. */
  private def readVInt(): Int = {
    val first = in.readByte()
    val len = if (first >= -112) 1
      else if (first >= -120) -111 - first
      else -119 - first
    if (len == 1) return first.toInt
    var v = 0L
    (0 until len - 1).foreach { _ => v = (v << 8) | (in.readByte() & 0xff) }
    val negative = first < -120
    (if (negative) ~v else v).toInt
  }

  // ------------------------------------------- block-compressed format
  // Each block: sync escape (-1) + 16B sync, vint record count, then
  // four vint-framed zlib buffers (key-lengths, keys, value-lengths,
  // values). Keys are skipped; value lengths frame the values buffer.
  private var blockValues: Iterator[Array[Byte]] = Iterator.empty

  /** vint length + zlib bytes → decompressed buffer. */
  private def readZlibBuffer(): Array[Byte] = {
    val len = readVInt()
    val b = new Array[Byte](len)
    in.readFully(b)
    inflate(b)
  }

  /** Loads the next block's values; false at EOF. */
  private def readNextBlock(): Boolean = {
    val escape = try in.readInt() catch { case _: EOFException => return false }
    require(escape == -1, s"expected block sync escape, got $escape")
    val marker = new Array[Byte](16)
    in.readFully(marker)
    require(marker.sameElements(sync), "sync marker mismatch (corrupt block)")
    val nRecords = readVInt()
    readZlibBuffer() // key lengths (unused)
    readZlibBuffer() // keys (unused)
    val valLens = readZlibBuffer()
    val values = readZlibBuffer()
    // value-lengths buffer is a sequence of vints framing `values`
    var p = 0
    def bufVInt(): Int = {
      val first = valLens(p); p += 1
      val len = if (first >= -112) 1
        else if (first >= -120) -111 - first
        else -119 - first
      if (len == 1) return first.toInt
      var v = 0L
      (0 until len - 1).foreach { _ => v = (v << 8) | (valLens(p) & 0xff); p += 1 }
      (if (first < -120) ~v else v).toInt
    }
    var off = 0
    blockValues = (0 until nRecords).map { _ =>
      val l = bufVInt()
      val slice = java.util.Arrays.copyOfRange(values, off, off + l)
      off += l
      slice
    }.iterator
    true
  }

  /** Parse + filter one EventWritable payload (4B BE length + event). */
  private def toEvent(value: Array[Byte]): Option[LwesEvent] = {
    val evLen = ((value(0) & 0xff) << 24) | ((value(1) & 0xff) << 16) |
      ((value(2) & 0xff) << 8) | (value(3) & 0xff)
    require(evLen == value.length - 4,
      s"EventWritable length $evLen != record payload ${value.length - 4}")
    if (eventNameFilter == null || eventNameFilter(LwesCodec.eventName(value, 4)))
      Some(LwesCodec.deserialize(value, 4, evLen, wanted))
    else None
  }

  /** Next raw EventWritable VALUE bytes (`[4B BE length][event]`, event
    * at offset 4), or null at EOF — the columnar path's zero-object
    * handle; container framing and corruption behavior identical to
    * [[next]], but name filtering / attr pruning are the CALLER's job
    * (it has the wire bytes). */
  def nextRawValue(): Array[Byte] = {
    if (blockCompressed) {
      if (blockValues.hasNext || readNextBlock()) return blockValues.next()
      return null
    }
    while (true) {
      val recordLen = try in.readInt() catch { case _: EOFException => return null }
      if (recordLen == -1) {
        val marker = new Array[Byte](16)
        in.readFully(marker) // sync escape
      } else {
        val keyLen = in.readInt()
        in.skipNBytes(keyLen.toLong)
        val valueLen = recordLen - keyLen
        require(valueLen >= 4, s"bad EventWritable record ($valueLen bytes)")
        val raw = new Array[Byte](valueLen)
        in.readFully(raw)
        return if (recordCompressed) inflate(raw) else raw
      }
    }
    null // unreachable
  }

  /** Next event passing the filters, or None at EOF. */
  def next(): Option[LwesEvent] = {
    if (blockCompressed) {
      while (blockValues.hasNext || readNextBlock()) {
        val ev = toEvent(blockValues.next())
        if (ev.isDefined) return ev
      }
      return None
    }
    while (true) {
      val recordLen = try in.readInt() catch { case _: EOFException => return None }
      if (recordLen == -1) {
        val marker = new Array[Byte](16)
        in.readFully(marker) // sync escape
      } else {
        val keyLen = in.readInt()
        in.skipNBytes(keyLen.toLong)
        val valueLen = recordLen - keyLen
        require(valueLen >= 4, s"bad EventWritable record ($valueLen bytes)")
        val value = {
          val raw = new Array[Byte](valueLen)
          in.readFully(raw)
          if (recordCompressed) inflate(raw) else raw
        }
        val ev = toEvent(value)
        if (ev.isDefined) return ev
      }
    }
    None // unreachable
  }

  override def close(): Unit = in.close()
}
