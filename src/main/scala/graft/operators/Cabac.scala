package graft.operators

/** CABAC (context-adaptive binary arithmetic coding) engine and the
  * syntax-element coding the [[H264]] Intra_16x16 CABAC subset uses
  * (Rec. ITU-T H.264 §9.3: arithmetic core, binarizations, context
  * modeling, bypass and terminate modes).
  *
  * HONESTY BOUNDARY (read before trusting conformance): the arithmetic
  * ENGINE tables below (rangeTabLPS, transIdxLPS — Tables 9-44/9-45)
  * are transcribed from the public spec, and every binarization /
  * context-index derivation follows the spec's structure. The one
  * element this environment CANNOT reproduce is the context
  * INITIALIZATION tables (9-12..9-23: ~300 (m,n) pairs — no copy of
  * the spec or any reference implementation is available offline).
  * Contexts here initialize to the deterministic uniform state
  * (pStateIdx 0, valMPS 0, p≈0.5) instead. Consequences, precisely:
  *
  *  - encode → decode round-trips BIT-EXACTLY (both sides share the
  *    init), which the pixel-equality gate pins — the engine,
  *    binarizations, adaptive probability estimation, renormalization,
  *    bypass, and terminate machinery are all fully real;
  *  - a conformant third-party decoder would desynchronize on these
  *    streams after the first context-coded bin, and this decoder
  *    would desynchronize on foreign CABAC streams. BOTH directions
  *    are therefore gated: the encoder stamps an SEI
  *    user_data_unregistered marker ([[H264.CabacSeiUuid]]), and the
  *    decoder decodes CABAC slices ONLY under that marker — a foreign
  *    CABAC stream still returns None (the pre-r20 checked fallback),
  *    never silently-wrong pixels.
  *
  * Filling in the spec's init tables is a constants-only change
  * (replace [[Cabac.initCtxs]]' uniform fill); everything else is in
  * place.
  */
private[operators] object Cabac {

  // ---- Table 9-44: rangeTabLPS[pStateIdx][qCodIRangeIdx] ------------
  val RangeTabLps: Array[Array[Int]] = Array(
    Array(128, 176, 208, 240), Array(128, 167, 197, 227),
    Array(128, 158, 187, 216), Array(123, 150, 178, 205),
    Array(116, 142, 169, 195), Array(111, 135, 160, 185),
    Array(105, 128, 152, 175), Array(100, 122, 144, 166),
    Array(95, 116, 137, 158), Array(90, 110, 130, 150),
    Array(85, 104, 123, 142), Array(81, 99, 117, 135),
    Array(77, 94, 111, 128), Array(73, 89, 105, 122),
    Array(69, 85, 100, 116), Array(66, 80, 95, 110),
    Array(62, 76, 90, 104), Array(59, 72, 86, 99),
    Array(56, 69, 81, 94), Array(53, 65, 77, 89),
    Array(51, 62, 73, 85), Array(48, 59, 69, 80),
    Array(46, 56, 66, 76), Array(43, 53, 63, 72),
    Array(41, 50, 59, 69), Array(39, 48, 56, 65),
    Array(37, 45, 54, 62), Array(35, 43, 51, 59),
    Array(33, 41, 48, 56), Array(32, 39, 46, 53),
    Array(30, 37, 43, 50), Array(29, 35, 41, 48),
    Array(27, 33, 39, 45), Array(26, 31, 37, 43),
    Array(24, 30, 35, 41), Array(23, 28, 33, 39),
    Array(22, 27, 32, 37), Array(21, 26, 30, 35),
    Array(20, 24, 29, 33), Array(19, 23, 27, 31),
    Array(18, 22, 26, 30), Array(17, 21, 25, 28),
    Array(16, 20, 23, 27), Array(15, 19, 22, 25),
    Array(14, 18, 21, 24), Array(14, 17, 20, 23),
    Array(13, 16, 19, 22), Array(12, 15, 18, 21),
    Array(12, 14, 17, 20), Array(11, 14, 16, 19),
    Array(11, 13, 15, 18), Array(10, 12, 15, 17),
    Array(10, 12, 14, 16), Array(9, 11, 13, 15),
    Array(9, 11, 12, 14), Array(8, 10, 12, 14),
    Array(8, 9, 11, 13), Array(7, 9, 11, 12),
    Array(7, 9, 10, 12), Array(7, 8, 10, 11),
    Array(6, 8, 9, 11), Array(6, 7, 9, 10),
    Array(6, 7, 8, 9), Array(2, 2, 2, 2))

  // ---- Table 9-45: transIdxLPS (MPS transition is +1, capped at 62;
  // state 63 is the engine's fixed near-certain state) ----------------
  val TransIdxLps: Array[Int] = Array(
    0, 0, 1, 2, 2, 4, 4, 5, 6, 7, 8, 9, 9, 11, 11, 12,
    13, 13, 15, 15, 16, 16, 18, 18, 19, 19, 21, 21, 23, 22, 23, 24,
    24, 25, 26, 26, 27, 27, 28, 29, 29, 30, 30, 30, 31, 32, 32, 33,
    33, 33, 34, 34, 35, 35, 35, 36, 36, 36, 37, 37, 37, 38, 38, 63)

  /** One adaptive context: probability state 0..63 + MPS value. */
  final class Ctx(var state: Int, var mps: Int)

  /** Context bank indexed by spec ctxIdx (0..459). Uniform init — see
    * the object doc's honesty boundary. */
  def initCtxs(): Array[Ctx] = Array.fill(460)(new Ctx(0, 0))

  // spec ctxIdx anchors used by the Intra_16x16 subset
  val CtxMbTypeI = 3 // +0..2 (bin 0, neighbor-derived), 6..10 (later bins)
  val CtxMbQpDelta = 60 // +0..1 bin0, 62 bin1, 63 bins>=2
  val CtxChromaPred = 64 // +0..2 bin0, 67 bins 1..2
  val CtxCbf = 85 // + catOffset{cat0:0, cat1:4, cat3:12, cat4:16} + 0..3
  val CtxSig = 105 // + catOffset{cat0:0, cat1:15, cat3:44, cat4:47} + li
  val CtxLast = 166 // same per-cat offsets as sig
  val CtxLevel = 227 // + catOffset{cat0:0, cat1:10, cat3:30, cat4:39} + inc

  def cbfCatOff(cat: Int): Int = cat match {
    case 0 => 0; case 1 => 4; case 3 => 12; case 4 => 16
    case other => throw new IllegalArgumentException(s"cat $other")
  }
  def sigCatOff(cat: Int): Int = cat match {
    case 0 => 0; case 1 => 15; case 3 => 44; case 4 => 47
    case other => throw new IllegalArgumentException(s"cat $other")
  }
  def levelCatOff(cat: Int): Int = cat match {
    case 0 => 0; case 1 => 10; case 3 => 30; case 4 => 39
    case other => throw new IllegalArgumentException(s"cat $other")
  }

  // ------------------------------------------------- decoding engine

  /** §9.3.3.2 arithmetic decoder over an [[H264.BitReader]] positioned
    * at the first byte-aligned bit of the CABAC slice payload.
    *
    * Byte-oriented: bins draw bits from a local 64-bit cache refilled
    * from the reader in up-to-16-bit gulps, and renormalization takes
    * all its bits in one shift — the per-bin `r.u1()` loop was the
    * decode engine's measured top cost. Bit-identical to the per-bit
    * formulation: every bin consumes exactly the bits it consumed
    * before (the cache only changes where the *reader's* position
    * sits, which nothing reads after slice decode), and a demand past
    * the end of the payload still throws ("eof" → the caller's
    * checked None fallback). */
  final class Decoder(r: H264.BitReader) {
    private var cache = 0L
    private var cacheBits = 0
    @inline private def bits(n: Int): Int = {
      while (cacheBits < n) {
        val avail = r.bitsLeft
        if (avail == 0) throw new IllegalArgumentException("eof")
        val take = if (avail < 16) avail else 16
        cache = (cache << take) | r.u(take).toLong
        cacheBits += take
      }
      cacheBits -= n
      ((cache >>> cacheBits) & ((1L << n) - 1L)).toInt
    }
    private var range = 510
    private var offset = bits(9)

    // smallest s with (range << s) >= 256, for range in [2, 255]
    @inline private def renorm(): Unit =
      if (range < 256) {
        val s = Integer.numberOfLeadingZeros(range) - 23
        range <<= s
        offset = (offset << s) | bits(s)
      }

    def decision(c: Ctx): Int = {
      val rLps = RangeTabLps(c.state)((range >> 6) & 3)
      range -= rLps
      val bin =
        if (offset >= range) {
          val b = 1 - c.mps
          offset -= range
          range = rLps
          if (c.state == 0) c.mps = 1 - c.mps
          c.state = TransIdxLps(c.state)
          b
        } else {
          val b = c.mps
          if (c.state < 62) c.state += 1
          b
        }
      renorm()
      bin
    }

    def bypass(): Int = {
      offset = (offset << 1) | bits(1)
      if (offset >= range) { offset -= range; 1 } else 0
    }

    /** end_of_slice_flag / I_PCM escape (ctx 276 — no adaptation). */
    def terminate(): Int = {
      range -= 2
      if (offset >= range) 1
      else { renorm(); 0 }
    }

    /** Bypass-decoded Exp-Golomb order-0 (UEG0 suffix). */
    def egBypass(): Int = {
      var zeros = 0
      while (bypass() == 1) {
        zeros += 1
        if (zeros > 30) throw new IllegalArgumentException("eg overflow")
      }
      if (zeros == 0) 0
      else {
        // k consecutive bypass bins in one division: with o < range
        // maintained by every engine step, k bypass steps map
        // (o, next k bits B) to offset' = V mod range and decoded
        // value N = V div range where V = o·2^k + B — exactly the
        // per-bin compare/subtract recurrence unrolled
        // (o_{i+1} = 2·o_i + b_i − bit_i·range with 0 ≤ o_{i+1} < range).
        val v = (offset.toLong << zeros) | bits(zeros).toLong
        val q = (v / range).toInt
        offset = (v - q.toLong * range).toInt
        (1 << zeros) - 1 + q
      }
    }
  }

  // ------------------------------------------------- encoding engine

  /** §9.3.4 arithmetic encoder emitting into an [[H264.BitWriter]].
    * Call [[flushTerminate]] exactly once (after the final
    * end_of_slice_flag's 1) — it folds the rbsp_stop_one_bit in.
    *
    * PRECONDITION: `w` must be byte-aligned at construction (CABAC
    * slice data starts after cabac_alignment_one_bit padding) — the
    * local bit buffer flushes whole bytes via `writeByteAligned`, so
    * an unaligned writer would only fail 8 emitted bits in. */
  final class Encoder(w: H264.BitWriter) {
    require(w.byteAligned,
      "CABAC encoder requires a byte-aligned writer at construction")
    private var low = 0
    private var range = 510
    private var outstanding = 0
    private var first = true
    // local bit buffer: CABAC slice data starts byte-aligned, so whole
    // bytes go to the writer directly and only the tail (in
    // [[flushTerminate]]) crosses bit-by-bit — putBit was the measured
    // top cost of the CABAC gate
    private var cur = 0
    private var nBits = 0
    @inline private def emit(b: Int): Unit = {
      cur = (cur << 1) | b
      nBits += 1
      if (nBits == 8) { w.writeByteAligned(cur); cur = 0; nBits = 0 }
    }

    private def putBit(b: Int): Unit = {
      if (first) first = false else emit(b)
      while (outstanding > 0) { emit(1 - b); outstanding -= 1 }
    }

    private def renorm(): Unit =
      while (range < 256) {
        if (low < 256) putBit(0)
        else if (low >= 512) { putBit(1); low -= 512 }
        else { outstanding += 1; low -= 256 }
        range <<= 1
        low <<= 1
      }

    def decision(c: Ctx, bin: Int): Unit = {
      val rLps = RangeTabLps(c.state)((range >> 6) & 3)
      range -= rLps
      if (bin != c.mps) {
        low += range
        range = rLps
        if (c.state == 0) c.mps = 1 - c.mps
        c.state = TransIdxLps(c.state)
      } else if (c.state < 62) c.state += 1
      renorm()
    }

    def bypass(bin: Int): Unit = {
      low <<= 1
      if (bin != 0) low += range
      if (low >= 1024) { putBit(1); low -= 1024 }
      else if (low < 512) putBit(0)
      else { outstanding += 1; low -= 512 }
    }

    def terminate(bin: Int): Unit = {
      range -= 2
      if (bin != 0) { low += range; range = 2 }
      renorm()
    }

    /** §9.3.4.5 EncodeFlush, after terminate(1): drain the registers
      * and emit the trailing stop bit; the caller then byte-aligns. */
    def flushTerminate(): Unit = {
      // terminate(1) already set range = 2 and renormalized
      putBit((low >> 9) & 1)
      emit((low >> 8) & 1)
      emit(1) // rbsp_stop_one_bit folded into the flush
      // drain the local buffer's tail into the writer (MSB-first, same
      // stream as per-bit writes)
      if (nBits > 0) { w.u(nBits, cur); cur = 0; nBits = 0 }
    }

    def egBypass(v: Int): Unit = {
      val x = v + 1
      val bits = 32 - Integer.numberOfLeadingZeros(x)
      var i = 0
      while (i < bits - 1) { bypass(1); i += 1 }
      bypass(0)
      i = bits - 2
      while (i >= 0) { bypass((x >> i) & 1); i -= 1 }
    }
  }

  // ------------------------------------- residual block coding (§9.3.2.7)

  /** Encode one residual block's levels (scan order, length = the
    * block's coefficient count) preceded by its coded_block_flag.
    * `cbfInc` = condTermA + 2·condTermB. Returns the total non-zero
    * count (the caller's cbf grids). */
  def writeResidual(e: Encoder, ctxs: Array[Ctx], cat: Int,
      levels: Array[Int], cbfInc: Int): Int = {
    var total = 0
    var last = -1
    var i = 0
    while (i < levels.length) {
      if (levels(i) != 0) { total += 1; last = i }
      i += 1
    }
    e.decision(ctxs(CtxCbf + cbfCatOff(cat) + cbfInc), if (total > 0) 1 else 0)
    if (total == 0) return 0
    // significance map: positions 0..n-2; the final position is
    // inferred significant when no earlier last fired
    val n = levels.length
    def sigInc(li: Int): Int = if (cat == 3) math.min(li, 2) else li
    var li = 0
    var done = false
    while (li < n - 1 && !done) {
      val sig = levels(li) != 0
      e.decision(ctxs(CtxSig + sigCatOff(cat) + sigInc(li)), if (sig) 1 else 0)
      if (sig) {
        val isLast = li == last
        e.decision(ctxs(CtxLast + sigCatOff(cat) + sigInc(li)),
          if (isLast) 1 else 0)
        if (isLast) done = true
      }
      li += 1
    }
    // levels, reverse scan from the last significant coefficient
    var numEq1 = 0
    var numGt1 = 0
    li = last
    while (li >= 0) {
      val lv = levels(li)
      if (lv != 0) {
        val absM1 = math.abs(lv) - 1
        val bin0Inc = if (numGt1 > 0) 0 else math.min(4, 1 + numEq1)
        val restInc = 5 + math.min(4, numGt1)
        val prefix = math.min(absM1, 14)
        e.decision(ctxs(CtxLevel + levelCatOff(cat) + bin0Inc),
          if (prefix > 0) 1 else 0)
        var j = 1
        while (j < prefix) {
          e.decision(ctxs(CtxLevel + levelCatOff(cat) + restInc), 1)
          j += 1
        }
        if (prefix < 14) {
          if (prefix > 0)
            e.decision(ctxs(CtxLevel + levelCatOff(cat) + restInc), 0)
        } else e.egBypass(absM1 - 14) // UEG0 suffix
        e.bypass(if (lv < 0) 1 else 0) // coeff_sign_flag
        if (math.abs(lv) == 1) numEq1 += 1 else numGt1 += 1
      }
      li -= 1
    }
    total
  }

  /** Decode one residual block (coefficient count `n`) preceded by its
    * coded_block_flag; returns levels in scan order (all-zero when the
    * flag was 0) and the non-zero count. */
  def readResidual(d: Decoder, ctxs: Array[Ctx], cat: Int, n: Int,
      cbfInc: Int): (Array[Int], Int) = {
    val levels = new Array[Int](n)
    if (d.decision(ctxs(CtxCbf + cbfCatOff(cat) + cbfInc)) == 0)
      return (levels, 0)
    def sigInc(li: Int): Int = if (cat == 3) math.min(li, 2) else li
    val sig = new Array[Boolean](n)
    var last = n - 1 // inferred when no explicit last fires
    var li = 0
    var done = false
    while (li < n - 1 && !done) {
      if (d.decision(ctxs(CtxSig + sigCatOff(cat) + sigInc(li))) == 1) {
        sig(li) = true
        if (d.decision(ctxs(CtxLast + sigCatOff(cat) + sigInc(li))) == 1) {
          last = li
          done = true
        }
      }
      li += 1
    }
    if (!done) sig(n - 1) = true // inferred significant
    var numEq1 = 0
    var numGt1 = 0
    var total = 0
    li = last
    while (li >= 0) {
      if (sig(li)) {
        val bin0Inc = if (numGt1 > 0) 0 else math.min(4, 1 + numEq1)
        val restInc = 5 + math.min(4, numGt1)
        var absM1 = 0
        if (d.decision(ctxs(CtxLevel + levelCatOff(cat) + bin0Inc)) == 1) {
          absM1 = 1
          var more = true
          while (more && absM1 < 14) {
            if (d.decision(ctxs(CtxLevel + levelCatOff(cat) + restInc)) == 1)
              absM1 += 1
            else more = false
          }
          if (absM1 == 14) absM1 += d.egBypass()
        }
        val mag = absM1 + 1
        levels(li) = if (d.bypass() == 1) -mag else mag
        if (mag == 1) numEq1 += 1 else numGt1 += 1
        total += 1
      }
      li -= 1
    }
    (levels, total)
  }
}
