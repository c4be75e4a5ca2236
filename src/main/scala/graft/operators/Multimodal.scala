package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2 C12).
  *
  * Media ride as opaque `binary` columns next to typed metadata — the
  * same pattern a 100 TB image/audio pipeline uses (bytes in parquet or
  * pointer columns, decode on executors). Both the Spark-side plumbing
  * (schema, per-partition batch shape, feature columns) AND the decode
  * kernels are real: PNG/JPEG through JDK ImageIO, WAV through a RIFF
  * PCM parser, MJPEG-in-AVI per-frame PIXELS through a RIFF chunk walk +
  * per-frame JPEG decode, MP4/QuickTime container METADATA (moov/mvhd
  * duration, track count, tkhd dims, stts frame count) through an
  * ISO-BMFF box walk, and H.264-in-MP4 per-frame PIXELS through a
  * from-scratch bitstream decoder for the I_PCM/P_Skip subset
  * ([[H264]]: NAL/RBSP, Exp-Golomb, SPS/PPS/slice headers, zero-MV
  * reference-frame copy — true inter-frame decode) — no extra
  * dependencies. Only entropy-coded video residuals (CAVLC/CABAC +
  * prediction + IDCT, i.e. typical camera footage, which needs a full
  * codec library like ffmpeg) fall back to a deterministic stand-in, as
  * do unrecognized byte payloads (which keeps the synthetic-media test
  * harness and the `mm_meta`/`mm_h264` gates stable).
  */
object Multimodal {

  final case class MediaMeta(media_type: String, n_bytes: Long, checksum: Long)
  final case class MediaFeatures(doc_id: Long, media_type: String,
      n_bytes: Long, checksum: Long, width: Int, height: Int, n_frames: Int)

  /** Decoder boundary. Real kernels for the formats the JDK can decode
    * (PNG/JPEG via ImageIO, WAV PCM via a RIFF parse, MJPEG AVI frames
    * via RIFF walk + ImageIO); a deterministic byte-derived stand-in for
    * inter-frame-coded video containers (no codec library in the JDK)
    * and unrecognized payloads. */
  object MediaCodec {

    private def isPng(b: Array[Byte]): Boolean =
      b.length > 8 && (b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G'
    private def isJpeg(b: Array[Byte]): Boolean =
      b.length > 3 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8 && (b(2) & 0xFF) == 0xFF
    private def isWav(b: Array[Byte]): Boolean =
      b.length >= 44 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'
    private def isAvi(b: Array[Byte]): Boolean =
      b.length > 24 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' '

    /** PNG/JPEG → pixels. None for anything else (including corrupt
      * streams — at 100 TB some payloads are always torn, and a decode
      * failure must be a null-ish feature row, not a task failure). */
    def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
      if (!isPng(bytes) && !isJpeg(bytes)) None
      else try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      catch { case _: Exception => None }

    /** Interleaved PCM normalized to [-1, 1]. */
    final case class WavPcm(sampleRate: Int, channels: Int,
        bitsPerSample: Int, samples: Array[Double]) {
      def nFrames: Int = if (channels == 0) 0 else samples.length / channels
    }

    /** RIFF/WAVE parse: fmt + data chunks, PCM 8-bit unsigned and
      * 16-bit signed little-endian. None for non-WAV/non-PCM bytes. */
    def decodeWav(bytes: Array[Byte]): Option[WavPcm] = {
      if (!isWav(bytes)) return None
      try {
        val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.position(12) // past RIFF<len>WAVE
        var fmt: Option[(Int, Int, Int, Int)] = None // audioFormat, channels, rate, bits
        var data: Option[(Int, Int)] = None // offset, length
        while (bb.remaining() >= 8 && (fmt.isEmpty || data.isEmpty)) {
          val id = new String(Array(bb.get(), bb.get(), bb.get(), bb.get()), "US-ASCII")
          val len = bb.getInt()
          val start = bb.position()
          if (id == "fmt " && len >= 16) {
            val audioFormat = bb.getShort() & 0xFFFF
            val channels = bb.getShort() & 0xFFFF
            val rate = bb.getInt()
            bb.getInt(); bb.getShort() // byteRate, blockAlign
            val bits = bb.getShort() & 0xFFFF
            fmt = Some((audioFormat, channels, rate, bits))
          } else if (id == "data") {
            data = Some((start, math.min(len, bytes.length - start)))
          }
          bb.position(math.min(start + len + (len & 1), bytes.length)) // chunks are word-aligned
        }
        for {
          (audioFormat, channels, rate, bits) <- fmt
          if audioFormat == 1 && channels > 0 && (bits == 8 || bits == 16)
          (off, len) <- data
        } yield {
          val n = len / (bits / 8)
          val samples = new Array[Double](n)
          var i = 0
          if (bits == 8) {
            while (i < n) { samples(i) = ((bytes(off + i) & 0xFF) - 128) / 128.0; i += 1 }
          } else {
            val sb = java.nio.ByteBuffer.wrap(bytes, off, len)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN).asShortBuffer()
            while (i < n) { samples(i) = sb.get(i) / 32768.0; i += 1 }
          }
          WavPcm(rate, channels, bits, samples)
        }
      } catch { case _: Exception => None }
    }

    /** MP4/QuickTime (ISO BMFF) container metadata: presentation
      * duration and timescale from `moov/mvhd`, track count, the first
      * non-zero `tkhd` width/height (16.16 fixed point), and the sample
      * (frame) count summed from the first `stts` table. A pure-JVM box
      * walk — container METADATA is parseable without a codec library;
      * per-frame pixel decode is not, and still falls back to the
      * stand-in. Torn/overrunning boxes end the walk (partial metadata
      * beats a task failure); None for non-BMFF bytes. */
    final case class Mp4Meta(timescale: Long, durationUnits: Long,
        nTracks: Int, width: Int, height: Int, nSamples: Long) {
      def durationSec: Double =
        if (timescale == 0) 0.0 else durationUnits.toDouble / timescale
    }

    def decodeMp4(bytes: Array[Byte]): Option[Mp4Meta] = {
      if (bytes.length < 16) return None
      def u32(off: Int): Long =
        ((bytes(off) & 0xFFL) << 24) | ((bytes(off + 1) & 0xFFL) << 16) |
          ((bytes(off + 2) & 0xFFL) << 8) | (bytes(off + 3) & 0xFFL)
      def u64(off: Int): Long = (u32(off) << 32) | u32(off + 4)
      def boxType(off: Int): String = new String(bytes, off + 4, 4, "ISO-8859-1")
      val t0 = boxType(0)
      if (t0 != "ftyp" && t0 != "moov") return None
      // visit each box in [start, end) as (type, payloadStart, payloadEnd)
      def walk(start: Int, end: Int)(f: (String, Int, Int) => Unit): Unit = {
        var off = start
        var done = false
        while (!done && off + 8 <= end) {
          var size = u32(off)
          var hdr = 8
          if (size == 1 && off + 16 <= end) { size = u64(off + 8); hdr = 16 }
          else if (size == 0) size = (end - off).toLong
          if (size < hdr || off + size > end) done = true // torn box: stop
          else {
            f(boxType(off), off + hdr, (off + size).toInt)
            off += size.toInt
          }
        }
      }
      var timescale = 0L; var duration = 0L; var tracks = 0
      var w = 0; var h = 0; var samples = 0L
      try {
        walk(0, bytes.length) { (t, s, e) =>
          if (t == "moov") walk(s, e) { (t2, s2, e2) =>
            if (t2 == "mvhd" && e2 - s2 >= 20) {
              // a torn v1 box (payload 20-31 bytes) must be SKIPPED, not
              // read with v0 offsets — that would yield garbage
              // timescale/duration from the middle of the 64-bit times
              val ver = bytes(s2) & 0xFF
              if (ver == 1) {
                if (e2 - s2 >= 32) {
                  timescale = u32(s2 + 20); duration = u64(s2 + 24)
                }
              } else {
                timescale = u32(s2 + 12); duration = u32(s2 + 16)
              }
            } else if (t2 == "trak") {
              tracks += 1
              walk(s2, e2) { (t3, s3, e3) =>
                if (t3 == "tkhd" && e3 - s3 >= 84) {
                  val ww = (u32(e3 - 8) >> 16).toInt
                  val hh = (u32(e3 - 4) >> 16).toInt
                  if (w == 0 && ww > 0) { w = ww; h = hh }
                } else if (t3 == "mdia") walk(s3, e3) { (t4, s4, e4) =>
                  if (t4 == "minf") walk(s4, e4) { (t5, s5, e5) =>
                    if (t5 == "stbl") walk(s5, e5) { (t6, s6, e6) =>
                      if (t6 == "stts" && e6 - s6 >= 8 && samples == 0) {
                        val n = u32(s6 + 4).toInt
                        var i = 0; var cnt = 0L
                        while (i < n && s6 + 8 + i * 8 + 8 <= e6) {
                          cnt += u32(s6 + 8 + i * 8); i += 1
                        }
                        samples = cnt
                      }
                    }
                  }
                }
              }
            }
          }
        }
      } catch { case _: Exception => return None }
      if (timescale == 0 && tracks == 0) None
      else Some(Mp4Meta(timescale, duration, tracks, w, h, samples))
    }

    /** MJPEG-in-AVI per-frame PIXEL decode — the one video codec a bare
      * JVM can fully decode (each movi `..dc`/`..db` chunk is a baseline
      * JPEG, which ImageIO handles). RIFF chunk walk: sizes are
      * little-endian, chunks word-aligned; a torn chunk ends the walk
      * (partial frames beat a task failure), mirroring the MP4 walker. */
    def aviFrameChunks(bytes: Array[Byte]): Option[IndexedSeq[Array[Byte]]] = {
      if (!isAvi(bytes)) return None
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val out = IndexedSeq.newBuilder[Array[Byte]]
      def walk(start: Int, end: Int, inMovi: Boolean): Unit = {
        var off = start
        var done = false
        while (!done && off + 8 <= end) {
          val id = new String(bytes, off, 4, "ISO-8859-1")
          val size = bb.getInt(off + 4)
          if (size < 0 || off + 8 + size > end) done = true // torn chunk
          else {
            if (id == "LIST" && size >= 4) {
              val tpe = new String(bytes, off + 8, 4, "ISO-8859-1")
              walk(off + 12, off + 8 + size, inMovi || tpe == "movi")
            } else if (inMovi && (id.endsWith("dc") || id.endsWith("db")) && size > 0) {
              out += java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + size)
            }
            off += 8 + size + (size & 1)
          }
        }
      }
      try walk(12, bytes.length, inMovi = false)
      catch { case _: Exception => return None }
      val frames = out.result()
      if (frames.isEmpty) None else Some(frames)
    }

    final case class FrameStat(width: Int, height: Int, meanLuma: Double)

    /** H.264-in-MP4 per-frame PIXEL statistics for the I_PCM/P_Skip
      * subset — a real bitstream decode (NAL/RBSP unescape, Exp-Golomb
      * headers, macroblock layer, zero-MV reference copy for skipped
      * macroblocks; [[H264]]). None when the stream carries
      * entropy-coded residual macroblocks (CAVLC/CABAC — full-codec
      * territory), so callers fall back to container metadata or the
      * stand-in. */
    def mp4FrameStats(bytes: Array[Byte]): Option[IndexedSeq[FrameStat]] =
      H264.decodeMp4(bytes).map(_.frames.map(p =>
        FrameStat(p.width, p.height, p.meanLuma)))

    /** Decoded 4:2:0 plane → standalone PNG (BT.601 full-range
      * YCbCr→RGB), so sampled H.264 frames ride downstream exactly like
      * sampled MJPEG frames. */
    def planePng(p: H264.Plane): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(p.width, p.height,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      def clamp(v: Double): Int = math.max(0, math.min(255, math.round(v).toInt))
      var yy = 0
      while (yy < p.height) {
        var x = 0
        while (x < p.width) {
          val l = p.y(yy * p.width + x) & 0xFF
          val cbv = (p.cb((yy / 2) * (p.width / 2) + x / 2) & 0xFF) - 128
          val crv = (p.cr((yy / 2) * (p.width / 2) + x / 2) & 0xFF) - 128
          val r = clamp(l + 1.402 * crv)
          val g = clamp(l - 0.344136 * cbv - 0.714136 * crv)
          val b = clamp(l + 1.772 * cbv)
          img.setRGB(x, yy, (r << 16) | (g << 8) | b)
          x += 1
        }
        yy += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Real per-frame pixel statistics for an MJPEG AVI: each frame's
      * dimensions and mean luma (Rec.601 from the decoded RGB). Frames
      * whose JPEG payload is torn are skipped. None for non-AVI bytes. */
    def aviFrameStats(bytes: Array[Byte]): Option[IndexedSeq[FrameStat]] =
      aviFrameChunks(bytes).map(_.flatMap { fb =>
        decodeImage(fb).map { img =>
          val (w, h) = (img.getWidth, img.getHeight)
          var sum = 0.0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sum += 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
                0.114 * (rgb & 0xFF)
              x += 1
            }
            y += 1
          }
          FrameStat(w, h, if (w * h == 0) 0.0 else sum / (w * h))
        }
      })

    /** (width, height, n_frames) feature triple:
      *  - image: pixel dims, 1 frame;
      *  - WAV audio: (sampleRate, channels, PCM frame count);
      *  - MP4/QuickTime video: tkhd display dims + stts sample count
      *    (container metadata — real; pixel decode still needs a codec
      *    library);
      *  - unrecognized payloads: deterministic byte-derived stand-in. */
    def decode(mediaType: String, bytes: Array[Byte]): (Int, Int, Int) =
      decodeImage(bytes).map(img => (img.getWidth, img.getHeight, 1))
        .orElse(decodeWav(bytes).map(w => (w.sampleRate, w.channels, w.nFrames)))
        .orElse(aviFrameChunks(bytes).flatMap(frames =>
          // MJPEG AVI: real pixel decode — dims from the first decodable
          // frame, count from the movi chunk list
          frames.iterator.flatMap(decodeImage).buffered.headOption
            .map(img => (img.getWidth, img.getHeight, frames.length))))
        .orElse(decodeMp4(bytes).map { m =>
          // clamp: a corrupt stts sum past Int.MaxValue must not wrap to
          // a negative frame count (frameSample would silently emit
          // nothing); durations clamp the same way
          val frames =
            if (m.nSamples > 0) math.min(m.nSamples, Int.MaxValue.toLong).toInt
            else math.min(math.ceil(m.durationSec), Int.MaxValue.toDouble).toInt
          (m.width, m.height, frames)
        })
        .getOrElse(fakeDecode(mediaType, bytes))

    private def fakeDecode(mediaType: String, bytes: Array[Byte]): (Int, Int, Int) = {
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      val w = 64 + math.floorMod(h, 1024).toInt
      val ht = 64 + math.floorMod(h >> 10, 1024).toInt
      val frames = mediaType match {
        case "video" => 1 + math.floorMod(h >> 20, 240).toInt
        case "audio" => 1 + math.floorMod(h >> 20, 48000).toInt
        case _ => 1
      }
      (w, ht, frames)
    }

    /** Decode → bilinear resample → PNG re-encode. None when the bytes
      * are not a decodable image (caller falls back). */
    def resizeImage(bytes: Array[Byte], targetW: Int, targetH: Int): Option[Array[Byte]] =
      decodeImage(bytes).map { img =>
        val out = new java.awt.image.BufferedImage(targetW, targetH,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, targetW, targetH, null)
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        bos.toByteArray
      }
  }

  /** Media-generation harness — moved to [[graft.tools.MediaGen]]
    * (r16 verdict nit): the PNG/WAV/MP4/AVC stream GENERATORS are
    * gate/spec tooling, not shipped operator surface, so they live
    * under tools/ now. Aliased here so `Multimodal.MediaGen.*` call
    * sites (gates, specs) keep reading naturally. */
  val MediaGen = graft.tools.MediaGen

  /** Attach REAL media (PNG / WAV / MP4, [[MediaGen]]) + typed metadata
    * to a table, distributed per partition — the oracle-checkable
    * harness behind the `mm_meta` gate. */
  def withRealMedia(spark: SparkSession, df: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("__t"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val (mt, bytes) = MediaGen.mediaBucket(text) match {
            case 0 => ("image", MediaGen.makePng(text))
            case 1 => ("audio", MediaGen.makeWav(text))
            case _ => ("video", MediaGen.makeMp4(text))
          }
          (id, mt, bytes)
        }
      }.toDF("doc_id", "media_type", "media")
      .withColumn("n_bytes", length(col("media")).cast("long"))
      .withColumn("checksum", xxhash64(col("media")))
  }

  /** Per-document H.264 pixel audit (the `mm_h264` gate): encode a
    * real I_PCM/P_Skip H.264 MP4 per row, then DECODE it back through
    * the full bitstream path ([[H264]]) on the executors, emitting
    * frame count, dims, and the per-doc sum of doubled mean lumas —
    * exact integers (PCM pixels, no DCT/entropy rounding), so a DuckDB
    * oracle replays them closed-form from `length(text)`. A bug
    * anywhere in NAL escaping, Exp-Golomb, slice parsing, the
    * macroblock layer, or the reference-frame copy changes the sums
    * and fails the hash. */
  def h264PixelAudit(spark: SparkSession, df: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("__t"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val bytes = MediaGen.makeMp4Avc(text)
          val stats = MediaCodec.mp4FrameStats(bytes).getOrElse(
            throw new IllegalStateException(
              s"generated H.264 stream failed to decode for doc $id"))
          val luma2x = stats.map(fs => math.round(fs.meanLuma * 2)).sum
          (id, stats.length, stats.head.width, stats.head.height, luma2x)
        }
      }.toDF("doc_id", "n_frames", "width", "height", "luma2x")
  }

  /** Per-document CAVLC pixel audit (the `mm_h264_cavlc` gate): encode
    * a real ENTROPY-CODED H.264 MP4 per row (Intra16x16 DC-refinement
    * profile, [[H264.encodeCavlcIntra]]), decode it back through the
    * full bitstream path on the executors — coeff_token, level
    * entropy codes, inverse Hadamard, dequant, 4x4 IDCT, DC
    * prediction — and emit the per-doc sum of quadrupled mean lumas,
    * which the construction makes exact integers (frame mean = quarter
    * of the four MB values): a DuckDB oracle replays them closed-form
    * from `length(text)`. A bug anywhere in the entropy decode or the
    * transform/prediction pipeline shifts the sums and fails the hash. */
  def h264CavlcAudit(spark: SparkSession, df: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("__t"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val bytes = MediaGen.makeMp4AvcCavlc(text)
          val stats = MediaCodec.mp4FrameStats(bytes).getOrElse(
            throw new IllegalStateException(
              s"generated CAVLC H.264 stream failed to decode for doc $id"))
          val luma4x = stats.map(fs => math.round(fs.meanLuma * 4)).sum
          (id, stats.length, stats.head.width, stats.head.height, luma4x)
        }
      }.toDF("doc_id", "n_frames", "width", "height", "luma4x")
  }

  /** C12 general-CAVLC gate: per doc, build a TEXTURED full-CAVLC
    * H.264 mp4 (AC residuals in every block, all four Intra16x16 and
    * chroma prediction modes, per-doc QP 20–28), decode it through the
    * mux/demux + bitstream chain, and
    *
    *  - `exact`: decoded planes equal the encoder's independently
    *    reconstructed output BIT-FOR-BIT — any desynchronization in
    *    the CAVLC tables, level codes, nC contexts, transforms, or
    *    prediction corrupts pixels and flips this false;
    *  - `fidelity_ok`: frame-0 luma mean-abs-deviation from the
    *    closed-form SOURCE texture < 6 (the quant-calibration
    *    contract at qp ≤ 28) — guards against a vacuous exact match
    *    (e.g. an encoder quantizing everything to zero).
    *
    * The oracle replays n_frames/dims/qp closed-form from
    * `length(text)` and expects both booleans true. Scale shape: one
    * `mapPartitions` projection, no shuffle, no driver work. */
  def h264TexturedAudit(spark: SparkSession, df: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("__t"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val n = MediaGen.textLen(text)
          val (mp4, expected, qp) = MediaGen.makeMp4AvcTextured(text)
          val dec = H264.decodeMp4(mp4).getOrElse(
            throw new IllegalStateException(
              s"generated textured H.264 stream failed to decode for doc $id"))
          if (!dec.filterExact)
            throw new IllegalStateException(
              s"generated stream for doc $id did not disable the loop " +
                "filter - player parity broken")
          val exact = dec.frames.length == expected.length &&
            dec.frames.zip(expected).forall { case (g, e) =>
              java.util.Arrays.equals(g.y, e.y) &&
                java.util.Arrays.equals(g.cb, e.cb) &&
                java.util.Arrays.equals(g.cr, e.cr)
            }
          val y0 = dec.frames.head.y
          var sad = 0L
          var i = 0
          while (i < y0.length) {
            sad += math.abs((y0(i) & 0xFF) -
              MediaGen.h264TexPix(n, 0, i % dec.width, i / dec.width, 0))
            i += 1
          }
          val fidelityOk = sad.toDouble / y0.length < 6.0
          (id, dec.frames.length, dec.width, dec.height, qp, exact, fidelityOk)
        }
      }.toDF("doc_id", "n_frames", "width", "height", "qp", "exact",
        "fidelity_ok")
  }

  /** C12 CABAC gate (r20): per doc, build a textured CABAC H.264 mp4
    * ([[MediaGen.makeMp4AvcCabac]]) and decode it back through the
    * mux/demux + CABAC bitstream chain; pin `exact` (decoded planes
    * equal the encoder's independent reconstruction BIT-FOR-BIT — any
    * desync anywhere in the arithmetic engine, context modeling,
    * binarizations, or transform chain corrupts pixels) and
    * `fidelity_ok` (frame-0 luma MAD vs the closed-form source < 6,
    * the same quant-calibration bound as the CAVLC gate). Scale shape:
    * one mapPartitions projection, no shuffle. */
  def h264CabacAudit(spark: SparkSession, df: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("__t"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val n = MediaGen.textLen(text)
          val (mp4, expected, qp) = MediaGen.makeMp4AvcCabac(text)
          val dec = H264.decodeMp4(mp4).getOrElse(
            throw new IllegalStateException(
              s"generated CABAC H.264 stream failed to decode for doc $id"))
          if (!dec.filterExact)
            throw new IllegalStateException(
              s"generated CABAC stream for doc $id did not disable the " +
                "loop filter")
          val exact = dec.frames.length == expected.length &&
            dec.frames.zip(expected).forall { case (g, e) =>
              java.util.Arrays.equals(g.y, e.y) &&
                java.util.Arrays.equals(g.cb, e.cb) &&
                java.util.Arrays.equals(g.cr, e.cr)
            }
          val y0 = dec.frames.head.y
          var sad = 0L
          var i = 0
          while (i < y0.length) {
            sad += math.abs((y0(i) & 0xFF) -
              MediaGen.h264TexPix(n, 0, i % dec.width, i / dec.width, 0))
            i += 1
          }
          val fidelityOk = sad.toDouble / y0.length < 6.0
          (id, dec.frames.length, dec.width, dec.height, qp, exact, fidelityOk)
        }
      }.toDF("doc_id", "n_frames", "width", "height", "qp", "exact",
        "fidelity_ok")
  }

  /** C12 multi-slice gate (r15): per doc, build a 32x64 textured H.264
    * mp4 whose every picture is 2..4 row-aligned I SLICES
    * ([[MediaGen.makeMp4AvcSliced]]), decode it through the mux/demux
    * + bitstream chain, and pin
    *
    *  - `exact`: decoded planes equal the encoder's independent
    *    reconstruction BIT-FOR-BIT — any desync in first_mb_in_slice
    *    handling, per-slice nC state, or the slice-boundary
    *    availability gating corrupts pixels and flips this false;
    *  - `n_slices`: replayed closed-form by the oracle, so the gate
    *    cannot silently degrade to single-slice streams;
    *  - `fidelity_ok`: frame-0 luma MAD vs the closed-form source < 6
    *    (qp ≤ 28 calibration) — guards against a vacuous match.
    *
    * Scale shape: one mapPartitions projection, no shuffle. */
  def h264SlicedAudit(spark: SparkSession, df: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("__t"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val n = MediaGen.textLen(text)
          val (mp4, expected, qp, slices) = MediaGen.makeMp4AvcSliced(text)
          val dec = H264.decodeMp4(mp4).getOrElse(
            throw new IllegalStateException(
              s"generated multi-slice H.264 stream failed to decode for doc $id"))
          val exact = dec.frames.length == expected.length &&
            dec.frames.zip(expected).forall { case (g, e) =>
              java.util.Arrays.equals(g.y, e.y) &&
                java.util.Arrays.equals(g.cb, e.cb) &&
                java.util.Arrays.equals(g.cr, e.cr)
            }
          val y0 = dec.frames.head.y
          var sad = 0L
          var i = 0
          while (i < y0.length) {
            sad += math.abs((y0(i) & 0xFF) -
              MediaGen.h264TexPix(n, 0, i % dec.width, i / dec.width, 0))
            i += 1
          }
          val fidelityOk = sad.toDouble / y0.length < 6.0
          (id, dec.frames.length, dec.width, dec.height, qp, slices,
            exact, fidelityOk)
        }
      }.toDF("doc_id", "n_frames", "width", "height", "qp", "n_slices",
        "exact", "fidelity_ok")
  }

  /** C12 multi-slice P gate (r15): the moving-scene GOP with every
    * picture — IDR and P — as 2..4 row-aligned slices
    * ([[MediaGen.makeMp4AvcI4PSliced]]): `exact` pins encoder/decoder
    * bit-agreement across slice-gated MV prediction, skip-vector
    * zeroing, and intra availability; `n_slices` is oracle-replayed so
    * the gate cannot degrade to single-slice; `fidelity_ok` tracks the
    * closed-form moving source. */
  def h264SlicedI4PAudit(spark: SparkSession, df: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("__t"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val n = MediaGen.textLen(text)
          val (mp4, expected, qp, slices) = MediaGen.makeMp4AvcI4PSliced(text)
          val dec = H264.decodeMp4(mp4).getOrElse(
            throw new IllegalStateException(
              s"generated multi-slice I4P H.264 stream failed to decode for doc $id"))
          val exact = dec.frames.length == expected.length &&
            dec.frames.zip(expected).forall { case (g, e) =>
              java.util.Arrays.equals(g.y, e.y) &&
                java.util.Arrays.equals(g.cb, e.cb) &&
                java.util.Arrays.equals(g.cr, e.cr)
            }
          val y0 = dec.frames.head.y
          var sad = 0L
          var i = 0
          while (i < y0.length) {
            sad += math.abs((y0(i) & 0xFF) -
              MediaGen.h264I4pPix(n, 0, i % dec.width, i / dec.width, 0))
            i += 1
          }
          val fidelityOk = sad.toDouble / y0.length < 6.0
          (id, dec.frames.length, dec.width, dec.height, qp, slices,
            exact, fidelityOk)
        }
      }.toDF("doc_id", "n_frames", "width", "height", "qp", "n_slices",
        "exact", "fidelity_ok")
  }

  /** C12 Intra_4x4/inter gate: per doc, build a MOVING-SCENE H.264 mp4
    * whose IDR is Intra_4x4 (per-block 9-mode prediction) and whose P
    * frames carry real motion vectors and inter residuals
    * ([[MediaGen.makeMp4AvcI4P]]), decode it through the mux/demux +
    * bitstream chain, and
    *
    *  - `exact`: decoded planes equal the encoder's independently
    *    reconstructed output BIT-FOR-BIT — any desync in the Intra_4x4
    *    mode predictor, the nine prediction formulas, the MV median
    *    predictor, skip semantics, MC, or inter residual decode
    *    corrupts pixels and flips this false;
    *  - `fidelity_ok`: frame-0 luma mean-abs-deviation from the
    *    closed-form SOURCE texture < 6 (qp ≤ 28 calibration bound) —
    *    guards against a vacuous exact match.
    *
    * The oracle replays n_frames/dims/qp closed-form from
    * `length(text)` and expects both booleans true. Scale shape: one
    * `mapPartitions` projection, no shuffle, no driver work. */
  def h264I4PAudit(spark: SparkSession, df: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("__t"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val n = MediaGen.textLen(text)
          val (mp4, expected, qp) = MediaGen.makeMp4AvcI4P(text)
          val dec = H264.decodeMp4(mp4).getOrElse(
            throw new IllegalStateException(
              s"generated Intra_4x4/P H.264 stream failed to decode for doc $id"))
          val exact = dec.frames.length == expected.length &&
            dec.frames.zip(expected).forall { case (g, e) =>
              java.util.Arrays.equals(g.y, e.y) &&
                java.util.Arrays.equals(g.cb, e.cb) &&
                java.util.Arrays.equals(g.cr, e.cr)
            }
          val y0 = dec.frames.head.y
          var sad = 0L
          var i = 0
          while (i < y0.length) {
            sad += math.abs((y0(i) & 0xFF) -
              MediaGen.h264I4pPix(n, 0, i % dec.width, i / dec.width, 0))
            i += 1
          }
          val fidelityOk = sad.toDouble / y0.length < 6.0
          (id, dec.frames.length, dec.width, dec.height, qp, exact, fidelityOk)
        }
      }.toDF("doc_id", "n_frames", "width", "height", "qp", "exact",
        "fidelity_ok")
  }

  /** Sub-pel motion audit (the C12 boundary retired in r13): per doc,
    * generate the half-pel-drifting stream ([[MediaGen.makeMp4AvcSubpel]]),
    * decode it, and emit
    *  - `exact`: decoded planes equal the encoder's independent
    *    reconstruction bit-for-bit — the 6-tap interpolation grid,
    *    quarter-pel MV coding, and refinement search all agree between
    *    encoder and decoder;
    *  - `used_subpel`: the stream really carries fractional vectors
    *    (decoder-counted inter MBs with a fractional MV component > 0)
    *    — the non-vacuity guard, without which a full-pel fallback
    *    would pass `exact` trivially;
    *  - `fidelity_ok`: frame 0 tracks the closed-form source.
    * The oracle replays n_frames/dims/qp from `length(text)` and pins
    * all three booleans true. One mapPartitions projection. */
  def h264SubpelAudit(spark: SparkSession, df: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("__t"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val n = MediaGen.textLen(text)
          val (mp4, expected, qp) = MediaGen.makeMp4AvcSubpel(text)
          val dec = H264.decodeMp4(mp4).getOrElse(
            throw new IllegalStateException(
              s"generated sub-pel H.264 stream failed to decode for doc $id"))
          val exact = dec.frames.length == expected.length &&
            dec.frames.zip(expected).forall { case (g, e) =>
              java.util.Arrays.equals(g.y, e.y) &&
                java.util.Arrays.equals(g.cb, e.cb) &&
                java.util.Arrays.equals(g.cr, e.cr)
            }
          val y0 = dec.frames.head.y
          var sad = 0L
          var i = 0
          while (i < y0.length) {
            sad += math.abs((y0(i) & 0xFF) -
              MediaGen.h264SubpelPix(n, 0, i % dec.width, i / dec.width, 0))
            i += 1
          }
          val fidelityOk = sad.toDouble / y0.length < 6.0
          (id, dec.frames.length, dec.width, dec.height, qp, exact,
            dec.subpelMbs > 0, fidelityOk)
        }
      }.toDF("doc_id", "n_frames", "width", "height", "qp", "exact",
        "used_subpel", "fidelity_ok")
  }

  /** Attach an opaque binary media column + typed metadata to a table
    * (test harness: fabricates bytes from a text column). */
  def withFakeMedia(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("media", encode(col(textCol), "UTF-8").cast("binary"))
      .withColumn("media_type",
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (abs(xxhash64(col(textCol))) % 3 + 1).cast("int")))
      .withColumn("n_bytes", length(col("media")).cast("long"))
      .withColumn("checksum", xxhash64(col("media")))

  /** Decode/feature-extract over partition-local batches. Executors see
    * an iterator per partition — the batch shape a vectorized decoder
    * wants — and emit typed feature rows. */
  def extractFeatures(spark: SparkSession, df: DataFrame,
      idCol: String = "doc_id"): Dataset[MediaFeatures] = {
    import spark.implicits._
    df.select(col(idCol).as("doc_id"), col("media_type"), col("media"),
        col("n_bytes"), col("checksum"))
      .as[(Long, String, Array[Byte], Long, Long)]
      .mapPartitions { rows =>
        rows.map { case (id, mt, bytes, nBytes, checksum) =>
          val (w, h, f) = MediaCodec.decode(mt, bytes)
          MediaFeatures(id, mt, nBytes, checksum, w, h, f)
        }
      }
  }

  final case class ResizedMedia(doc_id: Long, media_type: String,
      target_w: Int, target_h: Int, resized: Array[Byte])

  /** Resize: decode → bilinear resample → PNG re-encode per row, batched
    * per partition (binary in, binary out, no driver involvement, no
    * shuffle — the production shape). Real for decodable images
    * (ImageIO); non-image/undecodable payloads get a deterministic
    * byte-resample so synthetic test media still flows through. */
  def resize(spark: SparkSession, df: DataFrame, targetW: Int, targetH: Int,
      idCol: String = "doc_id"): Dataset[ResizedMedia] = {
    import spark.implicits._
    df.select(col(idCol).as("doc_id"), col("media_type"), col("media"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        val outLen = math.max(targetW * targetH / 16, 1)
        rows.map { case (id, mt, bytes) =>
          val out = MediaCodec.resizeImage(bytes, targetW, targetH).getOrElse {
            val o = new Array[Byte](outLen)
            var i = 0
            while (i < outLen) {
              o(i) = if (bytes.isEmpty) 0
                else bytes((i.toLong * bytes.length / outLen).toInt)
              i += 1
            }
            o
          }
          ResizedMedia(id, mt, targetW, targetH, out)
        }
      }
  }

  final case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Frame sampling: video rows fan out to `n` evenly-spaced frame rows
    * (explode-shaped; output partitioning inherits the input, so a
    * downstream per-frame model call is embarrassingly parallel). */
  def frameSample(spark: SparkSession, df: DataFrame, n: Int,
      idCol: String = "doc_id"): Dataset[Frame] = {
    import spark.implicits._
    df.filter(col("media_type") === "video")
      .select(col(idCol).as("doc_id"), col("media_type"), col("media"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, mt, bytes) =>
          MediaCodec.aviFrameChunks(bytes) match {
            // MJPEG AVI: REAL frames — each emitted row carries that
            // frame's standalone JPEG, decodable downstream
            case Some(frames) =>
              val take = math.min(n, frames.length)
              (0 until take).iterator.map { k =>
                val fi = (k.toLong * frames.length / math.max(take, 1)).toInt
                Frame(id, fi, frames(fi))
              }
            case None => H264.decodeMp4(bytes) match {
              // H.264 MP4 (I_PCM/P_Skip subset): REAL decoded frames,
              // re-encoded as standalone PNGs — note a sampled frame is
              // fully materialized even when its bits were mostly
              // P_Skip references into earlier frames
              case Some(dec) =>
                val take = math.min(n, dec.frames.length)
                (0 until take).iterator.map { k =>
                  val fi = (k.toLong * dec.frames.length / math.max(take, 1)).toInt
                  Frame(id, fi, MediaCodec.planePng(dec.frames(fi)))
                }
              case None =>
                val (_, _, nFrames) = MediaCodec.decode(mt, bytes)
                val take = math.min(n, nFrames)
                (0 until take).iterator.map { k =>
                  val fi = (k.toLong * nFrames / math.max(take, 1)).toInt
                  // entropy-coded video (CAVLC/CABAC residuals) still
                  // needs an external codec library; a deterministic
                  // byte slice stands in while keeping the fan-out shape
                  val sliceLen = math.max(bytes.length / math.max(nFrames, 1), 1)
                  val start = math.min(fi.toLong * sliceLen, math.max(bytes.length - 1, 0)).toInt
                  val end = math.min(start + sliceLen, bytes.length)
                  Frame(id, fi, java.util.Arrays.copyOfRange(bytes, start, math.max(end, start)))
                }
            }
          }
        }
      }
  }
}
