package graft.lwes

import java.io.{BufferedOutputStream, InputStream, OutputStream}
import java.nio.ByteBuffer

import com.github.luben.zstd.Zstd

/** Splittable journal container (`.zsj`) — removes the reference's
  * deepest scale limitation, the unsplittable journal
  * (JournalInputFormat.java:58-60 forces one mapper per file, so
  * parallelism = file count and one fat journal serializes a scan).
  *
  * Layout: N independent zstd frames, each holding WHOLE records
  * (22-byte header + payload — a frame boundary is always a record
  * boundary), followed by a footer index carried inside a zstd
  * SKIPPABLE frame. The whole file is therefore one VALID multi-frame
  * zstd stream: any sequential zstd reader — including this library's
  * own pre-split read path — decodes the record frames back-to-back
  * and passes over the footer without knowing the format exists. Only
  * the PLANNER reads the footer (one tail read per large file, the
  * journal counterpart of a parquet footer), turning one file into N
  * independent (seek, bounded-decompress) tasks.
  *
  * Footer data layout (big-endian), inside the skippable frame:
  * {{{
  * "GSJ1" | int32 frameCount
  * | frameCount × { int64 offset, int32 compressedLen, int32 rawLen,
  *                  int32 records, int64 minReceipt, int64 maxReceipt }
  * | int32 footerDataLen | "GSJ1"
  * }}}
  * The trailing (len, magic) pair lets a reader locate the footer from
  * the file tail alone; the per-frame receipt bounds give EXACT
  * frame-level time pruning (the sub-file analogue of the writer's
  * `.t<min>-<max>.` file-name tag).
  *
  * Version 2 ("GSJ2", written only when a frame carries per-frame
  * attribute zone-map stats — A31) appends one opaque UTF-8 blob per
  * frame after the fixed entries:
  * {{{
  * "GSJ2" | int32 frameCount
  * | frameCount × fixed entries (exactly as GSJ1)
  * | frameCount × { int32 statsLen (0 = none) | statsLen UTF-8 bytes }
  * | int32 footerDataLen | "GSJ2"
  * }}}
  * The container stays stats-agnostic: the blob's format belongs to
  * the source layer (the per-file sidecar text, `LwesStats`). Readers
  * accept both versions; stats-less writes keep emitting GSJ1
  * byte-for-byte.
  */
object SplitJournal {
  val Extension = "zsj"
  private val Magic = Array[Byte]('G', 'S', 'J', '1')
  private val Magic2 = Array[Byte]('G', 'S', 'J', '2')
  /** Any value in 0x184D2A50-5F is a legal zstd skippable-frame magic. */
  private val SkippableMagic = 0x184D2A50
  private val EntryBytes = 8 + 4 + 4 + 4 + 8 + 8
  /** magic + count + trailing len + trailing magic */
  private val FixedFooterBytes = 4 + 4 + 4 + 4
  private[lwes] val CompressionLevel = 3

  /** One zstd frame of whole records: byte position in the file,
    * compressed/raw sizes, record count, exact ReceiptTime bounds
    * (min > max ⟺ no record carried a receipt time), and the optional
    * per-frame zone-map stats blob (GSJ2; null = none — the container
    * treats it as opaque text owned by the source layer). */
  final case class FrameMeta(offset: Long, compressedLen: Int, rawLen: Int,
      records: Int, minReceipt: Long, maxReceipt: Long,
      stats: String = null)

  def isSplit(path: String): Boolean = path.endsWith("." + Extension)

  /** The footer as file bytes: skippable-frame header + footer data.
    * GSJ1 unless any frame carries stats (byte-stable legacy output). */
  private[lwes] def footerBytes(frames: Seq[FrameMeta]): Array[Byte] = {
    val v2 = frames.exists(_.stats != null)
    val blobs: Seq[Array[Byte]] =
      if (!v2) Nil
      else frames.map(f => if (f.stats == null) Array.emptyByteArray
        else f.stats.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val dataLen = FixedFooterBytes + frames.length * EntryBytes +
      (if (v2) frames.length * 4 + blobs.iterator.map(_.length).sum else 0)
    val magic = if (v2) Magic2 else Magic
    val bb = ByteBuffer.allocate(8 + dataLen)
    bb.order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(SkippableMagic)
    bb.putInt(dataLen)
    bb.order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.put(magic)
    bb.putInt(frames.length)
    frames.foreach { f =>
      bb.putLong(f.offset); bb.putInt(f.compressedLen); bb.putInt(f.rawLen)
      bb.putInt(f.records); bb.putLong(f.minReceipt); bb.putLong(f.maxReceipt)
    }
    if (v2) blobs.foreach { b => bb.putInt(b.length); bb.put(b) }
    bb.putInt(dataLen)
    bb.put(magic)
    bb.array()
  }

  /** Parse the footer index from an open seekable stream, or None when
    * the tail is not a well-formed footer (not a split journal, or a
    * torn tail — callers fall back to the unsplit sequential read,
    * which is always correct). Validates the skippable-frame header and
    * that the frame chain tiles [0, footerStart) exactly. */
  def readFooter(in: org.apache.hadoop.fs.FSDataInputStream,
      fileLen: Long): Option[Vector[FrameMeta]] = {
    if (fileLen < 8 + FixedFooterBytes) return None
    val tail = new Array[Byte](8)
    in.readFully(fileLen - 8, tail)
    val tb = ByteBuffer.wrap(tail)
    val dataLen = tb.getInt()
    val v2 =
      tail(4) == Magic2(0) && tail(5) == Magic2(1) &&
        tail(6) == Magic2(2) && tail(7) == Magic2(3)
    if (!v2 && !(tail(4) == Magic(0) && tail(5) == Magic(1) &&
        tail(6) == Magic(2) && tail(7) == Magic(3))) return None
    if (dataLen < FixedFooterBytes || dataLen > fileLen - 8) return None
    val dataStart = fileLen - dataLen
    if (dataStart < 8) return None
    val buf = new Array[Byte](8 + dataLen)
    in.readFully(dataStart - 8, buf)
    val bb = ByteBuffer.wrap(buf)
    bb.order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val skipMagic = bb.getInt()
    val skipLen = bb.getInt()
    if ((skipMagic & 0xfffffff0) != SkippableMagic || skipLen != dataLen) return None
    bb.order(java.nio.ByteOrder.BIG_ENDIAN)
    val lead = new Array[Byte](4)
    bb.get(lead)
    if (!java.util.Arrays.equals(lead, if (v2) Magic2 else Magic)) return None
    val n = bb.getInt()
    // Long-domain bounds BEFORE the n-sized allocation: a corrupt tail
    // must fall back to the unsplit read (None), never OOM the planner
    // via an Int-overflowed size check
    if (n < 0) return None
    if (!v2 && dataLen.toLong != FixedFooterBytes.toLong + n.toLong * EntryBytes)
      return None
    if (v2 && dataLen.toLong <
        FixedFooterBytes.toLong + n.toLong * (EntryBytes + 4)) return None
    val fixed = new Array[FrameMeta](n)
    var expectOffset = 0L
    var i = 0
    while (i < n) {
      val f = FrameMeta(bb.getLong(), bb.getInt(), bb.getInt(),
        bb.getInt(), bb.getLong(), bb.getLong())
      if (f.offset != expectOffset || f.compressedLen <= 0 || f.rawLen < 0)
        return None
      expectOffset = f.offset + f.compressedLen
      fixed(i) = f
      i += 1
    }
    if (expectOffset != dataStart - 8) return None // chain must tile the data region
    if (v2) {
      // per-frame zone-map blobs; lengths must tile the rest exactly
      i = 0
      while (i < n) {
        val len = bb.getInt()
        if (len < 0 || len > bb.remaining() - 8 - (n - 1 - i) * 4) return None
        if (len > 0) {
          val b = new Array[Byte](len)
          bb.get(b)
          fixed(i) = fixed(i).copy(stats =
            new String(b, java.nio.charset.StandardCharsets.UTF_8))
        }
        i += 1
      }
      if (bb.remaining() != 8) return None // only (len, magic) may remain
    }
    Some(fixed.toVector)
  }
}

/** Splittable journal writer: buffers whole records, closes a zstd
  * frame whenever the raw buffer reaches `frameRawBytes`, and appends
  * the footer index on close. Same record wire layout as
  * [[JournalWriter]] (shared [[Journal.encodeHeader]]), so readers are
  * container-agnostic. */
final class SplitJournalWriter(raw: OutputStream,
    frameRawBytes: Int = 4 << 20,
    /** A31 hook: called once per closed frame with the frame's RAW byte
      * length, returning that frame's zone-map stats text (or null) —
      * the caller segments its own per-frame accumulator here, since
      * only this writer knows where frame boundaries fall. Fires after
      * every record of the frame was handed to `writeRecord` and before
      * the next frame's first record, so an observe-before-write caller
      * sees exactly the frame's records. */
    frameStats: Int => String = null) extends JournalRecordWriter {
  require(frameRawBytes >= Journal.HeaderLength,
    s"frameRawBytes=$frameRawBytes too small")
  // Ceiling keeps every downstream Int size computation (initial buffer
  // +64K slack, doubling growth, compressBound) overflow-free; a frame
  // over 1 GiB raw would also defeat the container's whole point
  // (bounded-memory splittable scan units).
  require(frameRawBytes <= (1 << 30),
    s"frameRawBytes=$frameRawBytes exceeds 1 GiB frame ceiling")

  private val out = new BufferedOutputStream(raw, 1 << 16)
  private val headerBuf = ByteBuffer.allocate(Journal.HeaderLength)
  private var buf = new Array[Byte](math.min(frameRawBytes + (1 << 16), 1 << 26))
  private var bufLen = 0
  private val frames = scala.collection.mutable.ArrayBuffer.empty[SplitJournal.FrameMeta]
  private var offset = 0L
  private var recs = 0
  private var minRt = Long.MaxValue
  private var maxRt = Long.MinValue
  private var closed = false

  def writeRecord(payload: Array[Byte], off: Int, len: Int, time: Long,
      ip: Array[Byte], port: Int, site: Int): Unit = {
    Journal.encodeHeader(headerBuf, len, time, ip, port, site)
    val need = bufLen + Journal.HeaderLength + len
    if (need > buf.length) {
      // Long-domain doubling so buf.length*2 can't wrap negative near
      // Int.MaxValue (the 1 GiB frameRawBytes ceiling makes `need`
      // itself safe: at most one record past the frame threshold).
      val doubled = math.min((Int.MaxValue - 16).toLong, buf.length.toLong * 2)
      buf = java.util.Arrays.copyOf(buf, math.max(need.toLong, doubled).toInt)
    }
    System.arraycopy(headerBuf.array(), 0, buf, bufLen, Journal.HeaderLength)
    bufLen += Journal.HeaderLength
    System.arraycopy(payload, off, buf, bufLen, len)
    bufLen += len
    recs += 1
    if (time < minRt) minRt = time
    if (time > maxRt) maxRt = time
    if (bufLen >= frameRawBytes) flushFrame()
  }

  /** Close the open frame (if any) and push its bytes through to the
    * underlying stream. For capture daemons this bounds the crash-loss
    * window by TIME, not just by `frameRawBytes`: a footerless torn
    * file is still one valid multi-frame zstd stream, so every frame
    * flushed here is salvageable by the unsplit read path even when
    * the process dies before close() writes the footer index. Frequent
    * calls trade compression ratio for durability — callers pick the
    * cadence. */
  def flushOpenFrame(): Unit = { flushFrame(); out.flush() }

  private def flushFrame(): Unit = if (recs > 0) {
    // offset/length one-shot API: compresses buf[0, bufLen) in place —
    // no per-frame copy of up to frameRawBytes on the write hot path
    val bound = Zstd.compressBound(bufLen.toLong).toInt
    val dst = new Array[Byte](bound)
    val n = Zstd.compressByteArray(dst, 0, bound, buf, 0, bufLen,
      SplitJournal.CompressionLevel).toInt
    out.write(dst, 0, n)
    frames += SplitJournal.FrameMeta(offset, n, bufLen, recs, minRt, maxRt,
      stats = if (frameStats == null) null else frameStats(bufLen))
    offset += n
    bufLen = 0; recs = 0; minRt = Long.MaxValue; maxRt = Long.MinValue
  }

  override def close(): Unit = if (!closed) {
    closed = true
    flushFrame()
    out.write(SplitJournal.footerBytes(frames.toSeq))
    out.flush()
    out.close()
  }
}

/** Reads at most `limit` bytes from `in` (the byte span of a frame run
  * within a split journal); never closes more than it was given. */
final class BoundedInputStream(in: InputStream, private var remaining: Long)
    extends InputStream {
  override def read(): Int =
    if (remaining <= 0) -1
    else {
      val b = in.read()
      if (b >= 0) remaining -= 1
      b
    }
  override def read(b: Array[Byte], off: Int, len: Int): Int =
    if (remaining <= 0) -1
    else {
      val n = in.read(b, off, math.min(len.toLong, remaining).toInt)
      if (n > 0) remaining -= n
      n
    }
  override def available(): Int = math.min(in.available().toLong, remaining).toInt
  override def close(): Unit = in.close()
}
