package graft.tools

import graft.operators.H264

/** Media-generation harness: builds REAL media containers per row —
  * a PNG (ImageIO-encoded, dims derived from the text length), an
  * 8-bit PCM WAV (samples = the text's chars), or a minimal MP4
  * (mvhd/tkhd/stts metadata derived from the text length) — chosen by
  * an engine-portable md5 bucket of the text. Every decoded feature
  * is then a closed-form function of `length(text)`, which is what
  * lets the `mm_meta` gate hash-match a DuckDB oracle WHILE the
  * distributed path runs the real PNG/WAV/MP4 decode kernels. */
object MediaGen {
  // in-memory image IO: the default FileCacheImageOutputStream would
  // create+delete a temp file per encoded row in the hot partition loop
  javax.imageio.ImageIO.setUseCache(false)

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** md5-bucket in {0,1,2}: first 8 hex chars of md5(text) as an
    * integer, mod 3 — the same value SQL gets from
    * `CAST(('0x' || substr(md5(text),1,8)) AS BIGINT) % 3`. */
  def mediaBucket(text: String): Int = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(text.getBytes("UTF-8"))
    var h = 0L
    var i = 0
    while (i < 4) { h = (h << 8) | (d(i) & 0xFFL); i += 1 }
    (h % 3).toInt
  }

  /** CODE POINTS, not UTF-16 units: SQL `length(text)` counts code
    * points, and every decoded feature must be a closed-form function
    * of the same n in both engines (a supplementary-plane char would
    * otherwise silently break the mm_meta hash). */
  def textLen(text: String): Int = text.codePointCount(0, text.length)

  def pngDims(n: Int): (Int, Int) = (16 + n % 32, 16 + (n / 32) % 32)

  def makePng(text: String): Array[Byte] = {
    val (w, h) = pngDims(textLen(text))
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val c = if (text.isEmpty) 0 else text.charAt((x + y * w) % text.length) & 0x7F
        img.setRGB(x, y, (c << 16) | (c << 8) | c)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Mono 8-bit PCM at 8 kHz; one sample per text CODE POINT. */
  def makeWav(text: String): Array[Byte] = {
    val n = textLen(text)
    val bb = java.nio.ByteBuffer.allocate(44 + n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + n).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(8000).putInt(8000).putShort(1).putShort(8)
    bb.put("data".getBytes).putInt(n)
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      bb.put((cp & 0x7F).toByte)
      i += Character.charCount(cp)
    }
    bb.array()
  }

  /** Minimal ISO-BMFF: ftyp + moov(mvhd + trak(tkhd + stbl/stts)). */
  def makeMp4(text: String): Array[Byte] = {
    val n = textLen(text)
    val duration = n * 100
    val frames = 1 + n % 240
    def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(tpe.getBytes("ISO-8859-1")).put(payload)
      bb.array()
    }
    val ftyp = box("ftyp", "isom".getBytes ++ Array.fill[Byte](4)(0) ++ "isom".getBytes)
    val mvhd = {
      val bb = java.nio.ByteBuffer.allocate(100)
      bb.putInt(0).putInt(0).putInt(0).putInt(600).putInt(duration)
      box("mvhd", bb.array())
    }
    val tkhd = {
      val bb = java.nio.ByteBuffer.allocate(84)
      bb.putInt(0).putInt(0).putInt(0).putInt(1).putInt(0).putInt(duration)
      bb.position(84 - 8)
      bb.putInt(640 << 16).putInt(360 << 16)
      box("tkhd", bb.array())
    }
    val stts = {
      val bb = java.nio.ByteBuffer.allocate(16)
      bb.putInt(0).putInt(1).putInt(frames).putInt(100)
      box("stts", bb.array())
    }
    val trak = box("trak", tkhd ++ box("mdia", box("minf", box("stbl", stts))))
    ftyp ++ box("moov", mvhd ++ trak)
  }

  /** Closed-form gray level of H.264 frame k for an n-code-point
    * text: 20 + (n*31 + k*40) % 200 — PCM-exact (no JPEG rounding). */
  def h264Gray(n: Int, k: Int): Int = 20 + (n * 31 + k * 40) % 200
  def h264FrameCount(n: Int): Int = 3 + n % 5
  val H264W = 32
  val H264H = 32

  /** REAL H.264/AVC in MP4 (avc1 + avcC): 32×32, 3–7 frames. Frame 0
    * is an IDR of solid I_PCM gray `h264Gray(n, 0)`; every later
    * frame k is a P slice that intra-refreshes its TOP macroblock row
    * to `h264Gray(n, k)` and P_Skips the bottom row — whose pixels
    * therefore only exist by zero-motion copy from frame k-1 in the
    * DECODER's reference buffer. True inter-frame coding with every
    * decoded pixel closed-form in n: mean luma of frame 0 is g(0), of
    * frame k≥1 is (g(k) + g(0)) / 2. Spec-valid baseline H.264 — any
    * conformant player decodes the same pixels. */
  def makeMp4Avc(text: String): Array[Byte] = {
    val n = textLen(text)
    val (w, h) = (H264W, H264H)
    val nFrames = h264FrameCount(n)
    val neutral = 128.toByte
    var prev: H264.Plane = null
    val frames = (0 until nFrames).map { k =>
      val g = h264Gray(n, k).toByte
      val y = new Array[Byte](w * h)
      val cb = Array.fill[Byte]((w / 2) * (h / 2))(neutral)
      val cr = Array.fill[Byte]((w / 2) * (h / 2))(neutral)
      if (k == 0) java.util.Arrays.fill(y, g)
      else {
        System.arraycopy(prev.y, 0, y, 0, y.length) // P_Skip persists
        java.util.Arrays.fill(y, 0, 16 * w, g) // top MB row refresh
      }
      val p = H264.Plane(w, h, y, cb, cr)
      prev = p
      p
    }
    val enc = H264.encode(frames, refreshMbs = w / 16) // top row of MBs
    muxAvcMp4(enc, w, h)
  }

  /** Closed-form flat gray of CAVLC frame k, macroblock m (n = text
    * code points): 30 + (n*17 + k*53 + m*29) % 196 — every value in
    * [30, 225], so reconstruction never clips. */
  def h264CavlcVal(n: Int, k: Int, m: Int): Int =
    30 + (n * 17 + k * 53 + m * 29) % 196
  def h264CavlcFrameCount(n: Int): Int = 2 + n % 4

  /** REAL entropy-coded H.264 in MP4: 32×32, 2–5 all-Intra frames of
    * I_16x16_2_0_0 macroblocks whose CAVLC-coded luma-DC residuals
    * refine each flat MB from its DC prediction to
    * [[h264CavlcVal]](n, k, m) — exact by construction
    * ([[H264.encodeCavlcIntra]]), so frame k's mean luma is
    * closed-form: (Σ_m v(n,k,m)) / 4. */
  def makeMp4AvcCavlc(text: String): Array[Byte] = {
    val n = textLen(text)
    val (w, h) = (H264W, H264H)
    val wMbs = w / 16
    val nMbs = wMbs * (h / 16)
    val mbVals = (0 until h264CavlcFrameCount(n)).map(k =>
      (0 until nMbs).map(m => h264CavlcVal(n, k, m)))
    muxAvcMp4(H264.encodeCavlcIntra(mbVals, wMbs, h / 16), w, h)
  }

  /** Deterministic textured pixel for the general-CAVLC stream:
    * gradient + multiplicative-hash noise — real AC energy in every
    * 4x4 block. `c`: 0 luma, 1 Cb, 2 Cr. */
  def h264TexPix(n: Int, k: Int, x: Int, y: Int, c: Int): Int = {
    val h = (n * 131L + k * 101 + x * 31 + y * 17 + c * 59) * 2654435761L
    (x * 2 + y + ((h >>> 33) % 97).toInt) & 0xFF
  }
  def h264TexQp(n: Int): Int = 20 + n % 9 // 20..28: fidelity bound holds
  def h264TexFrameCount(n: Int): Int = 1 + n % 3

  /** REAL general entropy-coded H.264 in MP4: textured 32×32 frames
    * (AC residuals in every block, prediction-mode sweep, chroma
    * DC+AC) encoded by the full forward CAVLC encoder
    * ([[H264.encodeCavlcTextured]]) at a per-doc QP. Returns the mp4,
    * the encoder's decoder-exact expected reconstruction, and the
    * QP. */
  def makeMp4AvcTextured(text: String): (Array[Byte], IndexedSeq[H264.Plane], Int) = {
    val n = textLen(text)
    val (w, h) = (H264W, H264H)
    val frames = (0 until h264TexFrameCount(n)).map { k =>
      H264.Plane(w, h,
        Array.tabulate(w * h)(i => h264TexPix(n, k, i % w, i / w, 0).toByte),
        Array.tabulate(w / 2 * (h / 2))(i =>
          h264TexPix(n, k, i % (w / 2), i / (w / 2), 1).toByte),
        Array.tabulate(w / 2 * (h / 2))(i =>
          h264TexPix(n, k, i % (w / 2), i / (w / 2), 2).toByte))
    }
    val qp = h264TexQp(n)
    val (enc, expected) = H264.encodeCavlcTextured(frames, qp)
    (muxAvcMp4(enc, w, h), expected, qp)
  }

  /** REAL CABAC H.264 in MP4 (r20): the same textured 32×32 frames as
    * [[makeMp4AvcTextured]], entropy-coded through the CABAC engine
    * ([[H264.encodeCabacTextured]]: context-coded mb_type/cbf/
    * significance/levels, bypass signs, terminate, flush) at a per-doc
    * QP. The stream carries the CABAC PPS + the marker SEI; returns
    * the mp4, the decoder-exact expected reconstruction, and the QP. */
  def makeMp4AvcCabac(text: String): (Array[Byte], IndexedSeq[H264.Plane], Int) = {
    val n = textLen(text)
    val (w, h) = (H264W, H264H)
    val frames = (0 until h264TexFrameCount(n)).map { k =>
      H264.Plane(w, h,
        Array.tabulate(w * h)(i => h264TexPix(n, k, i % w, i / w, 0).toByte),
        Array.tabulate(w / 2 * (h / 2))(i =>
          h264TexPix(n, k, i % (w / 2), i / (w / 2), 1).toByte),
        Array.tabulate(w / 2 * (h / 2))(i =>
          h264TexPix(n, k, i % (w / 2), i / (w / 2), 2).toByte))
    }
    val qp = h264TexQp(n)
    val (enc, expected) = H264.encodeCabacTextured(frames, qp)
    (muxAvcMp4(enc, w, h), expected, qp)
  }

  /** MULTI-SLICE textured stream (r15): a TALLER picture (32x64,
    * 4 MB rows) encoded as 2..4 row-aligned I slices per frame —
    * the error-resilience/row-parallel structure real footage uses.
    * Exercises first_mb_in_slice > 0, per-slice nC state, and the
    * slice-boundary availability gating on both sides of the codec;
    * returns (mp4 bytes, expected planes, qp, slices). */
  def makeMp4AvcSliced(text: String): (Array[Byte], IndexedSeq[H264.Plane], Int, Int) = {
    val n = textLen(text)
    val (w, h) = (32, 64) // hMbs = 4: room for up to 4 slices
    val slices = 2 + n % 3 // 2..4
    val frames = (0 until (1 + n % 2)).map { k =>
      H264.Plane(w, h,
        Array.tabulate(w * h)(i => h264TexPix(n, k, i % w, i / w, 0).toByte),
        Array.tabulate(w / 2 * (h / 2))(i =>
          h264TexPix(n, k, i % (w / 2), i / (w / 2), 1).toByte),
        Array.tabulate(w / 2 * (h / 2))(i =>
          h264TexPix(n, k, i % (w / 2), i / (w / 2), 2).toByte))
    }
    val qp = h264TexQp(n)
    val (enc, expected) = H264.encodeCavlcTextured(frames, qp, slices)
    (muxAvcMp4(enc, w, h), expected, qp, slices)
  }

  /** Textured pixel with GLOBAL MOTION for the Intra_4x4/P-frame
    * stream: frame k shows the frame-0 pattern shifted by (2k, k),
    * so the full-pel search finds real vectors and residual blocks
    * still carry energy. `c`: 0 luma, 1 Cb, 2 Cr. */
  def h264I4pPix(n: Int, k: Int, x: Int, y: Int, c: Int): Int = {
    val sx = x + 2 * k
    val sy = y + k
    val h = (n * 131L + sx * 31 + sy * 17 + c * 59) * 2654435761L
    (sx * 2 + sy + ((h >>> 33) % 97).toInt) & 0xFF
  }
  def h264I4pQp(n: Int): Int = 20 + n % 9 // 20..28: fidelity bound holds
  def h264I4pFrameCount(n: Int): Int = 2 + n % 3 // 2..4: always ≥1 P frame

  /** Triangle wave: 0..p, period 2p — piecewise-LINEAR, which is the
    * signal class the 6-tap half-pel filter reconstructs almost
    * exactly, so a half-pel-shifted source makes sub-pel motion
    * vectors genuinely win the SAD search. */
  private def tri(t: Int, p: Int): Int = {
    // every caller passes t >= 0, where floorMod(t, 2p) == t % (2p)
    // (floorMod was a measured leaf of the subpel gate's frame synth)
    val m = t % (2 * p)
    math.abs(m - p)
  }

  /** Smooth pixel with HALF-PEL global drift for the sub-pel MC
    * stream: the pattern lives on a double-resolution grid and frame
    * k samples it at (x + k/2, y + k/2) — consecutive frames are
    * exactly (0.5, 0.5) pels apart, so every P macroblock's best
    * vector is fractional. `c`: 0 luma, 1 Cb, 2 Cr. */
  def h264SubpelPix(n: Int, k: Int, x: Int, y: Int, c: Int): Int = {
    val u = 2 * x + k
    val v = 2 * y + k
    val base = tri(u * 2 + n % 7, 40) * 3 + tri(v * 2 + n % 11, 56) * 2 +
      tri(u + v, 24)
    math.min(255, 8 + base + c * 5)
  }

  /** H.264 with SUB-PEL luma motion in MP4: the Intra_4x4 IDR plus
    * P frames whose motion search refines onto the half/quarter-pel
    * grid ([[H264.encodeCavlcI4P]] with `subpelSearch`, 8.4.2.2.1
    * 6-tap interpolation shared with the decoder). The source drifts
    * (0.5, 0.5) pels per frame, so fractional vectors genuinely win. */
  def makeMp4AvcSubpel(text: String): (Array[Byte], IndexedSeq[H264.Plane], Int) = {
    val n = textLen(text)
    val (w, h) = (H264W, H264H)
    val frames = (0 until h264I4pFrameCount(n)).map { k =>
      H264.Plane(w, h,
        Array.tabulate(w * h)(i => h264SubpelPix(n, k, i % w, i / w, 0).toByte),
        Array.tabulate(w / 2 * (h / 2))(i =>
          h264SubpelPix(n, k, i % (w / 2), i / (w / 2), 1).toByte),
        Array.tabulate(w / 2 * (h / 2))(i =>
          h264SubpelPix(n, k, i % (w / 2), i / (w / 2), 2).toByte))
    }
    val qp = h264I4pQp(n)
    val (enc, expected) = H264.encodeCavlcI4P(frames, qp, subpelSearch = true)
    (muxAvcMp4(enc, w, h), expected, qp)
  }

  /** REAL Intra_4x4 + inter H.264 in MP4 — the GOP shape of actual
    * baseline footage: an Intra_4x4 IDR (per-block 9-mode prediction)
    * followed by P_L0_16x16/P_Skip motion-predicted frames
    * ([[H264.encodeCavlcI4P]], full-pel SAD search, median MV
    * predictors, inter cbp + residuals). Returns the mp4, the
    * encoder's decoder-exact expected reconstruction, and the QP. */
  def makeMp4AvcI4P(text: String): (Array[Byte], IndexedSeq[H264.Plane], Int) = {
    val n = textLen(text)
    val (w, h) = (H264W, H264H)
    val frames = (0 until h264I4pFrameCount(n)).map { k =>
      H264.Plane(w, h,
        Array.tabulate(w * h)(i => h264I4pPix(n, k, i % w, i / w, 0).toByte),
        Array.tabulate(w / 2 * (h / 2))(i =>
          h264I4pPix(n, k, i % (w / 2), i / (w / 2), 1).toByte),
        Array.tabulate(w / 2 * (h / 2))(i =>
          h264I4pPix(n, k, i % (w / 2), i / (w / 2), 2).toByte))
    }
    val qp = h264I4pQp(n)
    val (enc, expected) = H264.encodeCavlcI4P(frames, qp)
    (muxAvcMp4(enc, w, h), expected, qp)
  }

  /** MULTI-SLICE moving-scene GOP (r15): the [[makeMp4AvcI4P]] stream
    * family — Intra_4x4 IDR + motion-predicted P frames — on a
    * taller 32x64 picture with 2..4 row-aligned slices per PICTURE
    * (P frames included: MV prediction and the 8.4.1.1 skip-zero
    * rule gate on the slice boundary). Returns (mp4, expected
    * planes, qp, slices). */
  def makeMp4AvcI4PSliced(text: String): (Array[Byte], IndexedSeq[H264.Plane], Int, Int) = {
    val n = textLen(text)
    val (w, h) = (32, 64)
    val slices = 2 + n % 3
    val frames = (0 until h264I4pFrameCount(n)).map { k =>
      H264.Plane(w, h,
        Array.tabulate(w * h)(i => h264I4pPix(n, k, i % w, i / w, 0).toByte),
        Array.tabulate(w / 2 * (h / 2))(i =>
          h264I4pPix(n, k, i % (w / 2), i / (w / 2), 1).toByte),
        Array.tabulate(w / 2 * (h / 2))(i =>
          h264I4pPix(n, k, i % (w / 2), i / (w / 2), 2).toByte))
    }
    val qp = h264I4pQp(n)
    val (enc, expected) = H264.encodeCavlcI4P(frames, qp, slices = slices)
    (muxAvcMp4(enc, w, h), expected, qp, slices)
  }

  /** Mux an encoded AVC elementary stream into ISO-BMFF: ftyp, mdat
    * (length-prefixed NALs), moov with an avc1+avcC sample table. */
  private def muxAvcMp4(enc: H264.Encoded, w: Int, h: Int): Array[Byte] = {
    // one SAMPLE per access unit: a multi-slice picture's NALs share
    // a sample (each length-prefixed inside it), so stts/stsz report
    // true frame counts and duration whatever the slice structure
    val pictures = H264.groupPictures(enc.frameNals)
    val nFrames = pictures.length
    def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(tpe.getBytes("ISO-8859-1")).put(payload)
      bb.array()
    }
    def be(fields: Int*): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(fields.length * 4)
      fields.foreach(bb.putInt)
      bb.array()
    }
    val sampleBytes = pictures.map { pic =>
      val bb = java.nio.ByteBuffer.allocate(pic.map(_.length + 4).sum)
      pic.foreach(nal => bb.putInt(nal.length).put(nal))
      bb.array()
    }
    val mdatPayload = sampleBytes.toArray.flatten
    val ftyp = box("ftyp",
      "isom".getBytes ++ Array.fill[Byte](4)(0) ++ "isom".getBytes)
    val mdat = box("mdat", mdatPayload)
    val mdatOff = ftyp.length + 8 // payload offset of mdat in the file
    val duration = nFrames * 60 // timescale 600, 10 fps
    val avcC = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(1); bos.write(66); bos.write(0); bos.write(20) // ver/profile/compat/level
      bos.write(0xFF) // reserved + lengthSizeMinusOne=3
      bos.write(0xE1) // reserved + numSps=1
      bos.write(enc.sps.length >> 8); bos.write(enc.sps.length & 0xFF)
      bos.write(enc.sps)
      bos.write(1) // numPps
      bos.write(enc.pps.length >> 8); bos.write(enc.pps.length & 0xFF)
      bos.write(enc.pps)
      box("avcC", bos.toByteArray)
    }
    val avc1 = {
      val bb = java.nio.ByteBuffer.allocate(78)
      bb.position(6) // reserved
      bb.putShort(1) // data_reference_index
      bb.position(24) // pre_defined/reserved
      bb.putShort(w.toShort).putShort(h.toShort)
      bb.putInt(0x00480000).putInt(0x00480000) // 72 dpi
      bb.putInt(0)
      bb.putShort(1) // frame_count
      bb.position(74) // skip compressorname(32)
      bb.putShort(0x0018) // depth
      bb.putShort(-1) // pre_defined
      box("avc1", bb.array() ++ avcC)
    }
    val stsd = box("stsd", be(0, 1) ++ avc1)
    val stts = box("stts", be(0, 1, nFrames, 60))
    val stsc = box("stsc", be(0, 1, 1, nFrames, 1))
    val stsz = box("stsz", be(Seq(0, 0, nFrames) ++ sampleBytes.map(_.length): _*))
    val stco = box("stco", be(0, 1, mdatOff))
    val stbl = box("stbl", stsd ++ stts ++ stsc ++ stsz ++ stco)
    val url0 = box("url ", be(1))
    val dinf = box("dinf", box("dref", be(0, 1) ++ url0))
    val vmhd = box("vmhd", be(1, 0))
    val hdlr = box("hdlr",
      be(0, 0) ++ "vide".getBytes("ISO-8859-1") ++ be(0, 0, 0) ++ Array[Byte](0))
    val mdhd = box("mdhd", be(0, 0, 0, 600, duration) ++ Array[Byte](0x55, -60, 0, 0))
    val minf = box("minf", vmhd ++ dinf ++ stbl)
    val mdia = box("mdia", mdhd ++ hdlr ++ minf)
    val tkhd = {
      val bb = java.nio.ByteBuffer.allocate(84)
      bb.putInt(7) // version 0, flags: enabled|in_movie|in_preview
      bb.putInt(0).putInt(0) // ctime/mtime
      bb.putInt(1).putInt(0).putInt(duration) // track id, reserved, duration
      bb.position(84 - 8)
      bb.putInt(w << 16).putInt(h << 16)
      box("tkhd", bb.array())
    }
    val mvhd = {
      val bb = java.nio.ByteBuffer.allocate(100)
      bb.putInt(0).putInt(0).putInt(0).putInt(600).putInt(duration)
      box("mvhd", bb.array())
    }
    val moov = box("moov", mvhd ++ box("trak", tkhd ++ mdia))
    ftyp ++ mdat ++ moov
  }

  /** Real MJPEG-in-AVI: RIFF('AVI ') with hdrl(avih + strl(strh'vids'/
    * 'MJPG' + strf BITMAPINFOHEADER)) and movi holding one baseline-
    * JPEG `00dc` chunk per frame. Frame k is solid gray
    * `20 + (n*31 + k*40) % 200` (n = text code points), so decoded
    * mean luma is predictable to JPEG rounding — the spec's handle on
    * REAL per-frame pixel decode. */
  def makeAvi(text: String): Array[Byte] = {
    val n = textLen(text)
    val w = 32; val h = 24
    val nFrames = 2 + n % 6
    val jpegs = (0 until nFrames).map { k =>
      val g = 20 + (n * 31 + k * 40) % 200
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (g << 16) | (g << 8) | g
      var y = 0
      while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val pad = payload.length & 1
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(id.getBytes("ISO-8859-1")).putInt(payload.length).put(payload)
      bb.array()
    }
    def list(tpe: String, children: Array[Byte]): Array[Byte] =
      chunk("LIST", tpe.getBytes("ISO-8859-1") ++ children)
    def le(fields: (Int, Int)*): Array[Byte] = { // (byteWidth, value)*
      val bb = java.nio.ByteBuffer
        .allocate(fields.map(_._1).sum).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      fields.foreach {
        case (2, v) => bb.putShort(v.toShort)
        case (_, v) => bb.putInt(v)
      }
      bb.array()
    }
    val avih = chunk("avih", le((4, 40000), (4, 0), (4, 0), (4, 0),
      (4, nFrames), (4, 0), (4, 1), (4, 0), (4, w), (4, h),
      (4, 0), (4, 0), (4, 0), (4, 0)))
    val strh = chunk("strh", "vids".getBytes ++ "MJPG".getBytes ++
      le((4, 0), (2, 0), (2, 0), (4, 0), (4, 1), (4, 25), (4, 0),
        (4, nFrames), (4, 0), (4, 0), (4, 0), (2, 0), (2, 0), (2, w), (2, h)))
    val strf = chunk("strf", le((4, 40), (4, w), (4, h), (2, 1), (2, 24)) ++
      "MJPG".getBytes ++ le((4, w * h * 3), (4, 0), (4, 0), (4, 0), (4, 0)))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi", jpegs.flatMap(j => chunk("00dc", j)).toArray)
    chunk("RIFF", "AVI ".getBytes("ISO-8859-1") ++ hdrl ++ movi)
  }
}
