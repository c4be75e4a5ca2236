package graft.operators

/** CAVLC entropy tables and the general residual-block codec
  * (Rec. ITU-T H.264 §9.2) used by [[H264]] for entropy-coded
  * macroblocks beyond the single-DC profile: coeff_token over all five
  * nC contexts (three VLC tables, the nC ≥ 8 fixed-length code, and the
  * chroma-DC table), trailing-one signs, level_prefix/level_suffix with
  * the full suffixLength adaptation and escape rules, total_zeros (4x4
  * and chroma-DC variants), and run_before.
  *
  * Table constants are transcribed from the public spec (Tables 9-5,
  * 9-7/9-8, 9-9(a), 9-10). The ENCODER ([[H264.encodeCavlcTextured]])
  * and DECODER share this single module, and CavlcSpec validates each
  * table row is prefix-free and round-trips every symbol — so a
  * desynchronization anywhere in the entropy layer corrupts decoded
  * pixels and fails the exact-reconstruction gates end-to-end.
  *
  * Scale note: this runs per-row inside `mapPartitions` media decode
  * (no Spark shuffle is ever entropy-coded); the hot loops are
  * allocation-free over int arrays.
  */
private[operators] object Cavlc {
  import H264.{BitReader, BitWriter}

  // ------------------------------------------------------ coeff_token
  // (TotalCoeff 0..16) x (TrailingOnes 0..min(3,TC)) bit strings per
  // VLC context: 0 -> 0<=nC<2, 1 -> 2<=nC<4, 2 -> 4<=nC<8.
  private val CoeffTokenVlc: Array[Array[Array[String]]] = Array(
    // context 0: 0 <= nC < 2
    Array(
      Array("1"),
      Array("000101", "01"),
      Array("00000111", "000100", "001"),
      Array("000000111", "00000110", "0000101", "00011"),
      Array("0000000111", "000000110", "00000101", "000011"),
      Array("00000000111", "0000000110", "000000101", "0000100"),
      Array("0000000001111", "00000000110", "0000000101", "00000100"),
      Array("0000000001011", "0000000001110", "00000000101", "000000100"),
      Array("0000000001000", "0000000001010", "0000000001101", "0000000100"),
      Array("00000000001111", "00000000001110", "0000000001001", "00000000100"),
      Array("00000000001011", "00000000001010", "00000000001101", "0000000001100"),
      Array("000000000001111", "000000000001110", "00000000001001", "00000000001100"),
      Array("000000000001011", "000000000001010", "000000000001101", "00000000001000"),
      Array("0000000000001111", "000000000000001", "000000000001001", "000000000001100"),
      Array("0000000000001011", "0000000000001110", "0000000000001101", "000000000001000"),
      Array("0000000000000111", "0000000000001010", "0000000000001001", "0000000000001100"),
      Array("0000000000000100", "0000000000000110", "0000000000000101", "0000000000001000")),
    // context 1: 2 <= nC < 4
    Array(
      Array("11"),
      Array("001011", "10"),
      Array("000111", "00111", "011"),
      Array("0000111", "001010", "001001", "0101"),
      Array("00000111", "000110", "000101", "0100"),
      Array("00000100", "0000110", "0000101", "00110"),
      Array("000000111", "00000110", "00000101", "001000"),
      Array("00000001111", "000000110", "000000101", "000100"),
      Array("00000001011", "00000001110", "00000001101", "0000100"),
      Array("000000001111", "00000001010", "00000001001", "000000100"),
      Array("000000001011", "000000001110", "000000001101", "00000001100"),
      Array("000000001000", "000000001010", "000000001001", "00000001000"),
      Array("0000000001111", "0000000001110", "0000000001101", "000000001100"),
      Array("0000000001011", "0000000001010", "0000000001001", "0000000001100"),
      Array("0000000000111", "00000000001011", "0000000000110", "0000000001000"),
      Array("00000000001001", "00000000001000", "00000000001010", "0000000000001"),
      Array("00000000000111", "00000000000110", "00000000000101", "00000000000100")),
    // context 2: 4 <= nC < 8
    Array(
      Array("1111"),
      Array("001111", "1110"),
      Array("001011", "01111", "1101"),
      Array("001000", "01100", "01110", "1100"),
      Array("0001111", "01010", "01011", "1011"),
      Array("0001011", "01000", "01001", "1010"),
      Array("0001001", "001110", "001101", "1001"),
      Array("0001000", "001010", "001001", "1000"),
      Array("00001111", "0001110", "0001101", "01101"),
      Array("00001011", "00001110", "0001010", "001100"),
      Array("000001111", "00001010", "00001101", "0001100"),
      Array("000001011", "000001110", "00001001", "00001100"),
      Array("000001000", "000001010", "000001101", "00001000"),
      Array("0000001101", "000000111", "000001001", "000001100"),
      Array("0000001001", "0000001100", "0000001011", "0000001010"),
      Array("0000000101", "0000001000", "0000000111", "0000000110"),
      Array("0000000001", "0000000100", "0000000011", "0000000010")))

  // chroma DC (4:2:0), nC == -1: TotalCoeff 0..4
  private val CoeffTokenChromaDc: Array[Array[String]] = Array(
    Array("01"),
    Array("000111", "1"),
    Array("000100", "000110", "001"),
    Array("000011", "0000011", "0000010", "000101"),
    Array("000010", "00000011", "00000010", "0000000"))

  // ------------------------------------------------------ total_zeros
  // 4x4 blocks (Table 9-7/9-8): row = TotalCoeff 1..15, column =
  // total_zeros 0..(16-TC).
  private val TotalZeros4x4: Array[Array[String]] = Array(
    Array("1", "011", "010", "0011", "0010", "00011", "00010", "000011",
      "000010", "0000011", "0000010", "00000011", "00000010", "000000011",
      "000000010", "000000001"),
    Array("111", "110", "101", "100", "011", "0101", "0100", "0011",
      "0010", "00011", "00010", "000011", "000010", "000001", "000000"),
    Array("0101", "111", "110", "101", "0100", "0011", "100", "011",
      "0010", "00011", "00010", "000001", "00001", "000000"),
    Array("00011", "111", "0101", "0100", "110", "101", "100", "0011",
      "011", "0010", "00010", "00001", "00000"),
    Array("0101", "0100", "0011", "111", "110", "101", "100", "011",
      "0010", "00001", "0001", "00000"),
    Array("000001", "00001", "111", "110", "101", "100", "011", "010",
      "0001", "001", "000000"),
    Array("000001", "00001", "101", "100", "011", "11", "010", "0001",
      "001", "000000"),
    Array("000001", "0001", "00001", "011", "11", "10", "010", "001",
      "000000"),
    Array("000001", "000000", "0001", "11", "10", "001", "01", "00001"),
    Array("00001", "00000", "001", "11", "10", "01", "0001"),
    Array("0000", "0001", "001", "010", "1", "011"),
    Array("0000", "0001", "01", "1", "001"),
    Array("000", "001", "1", "01"),
    Array("00", "01", "1"),
    Array("0", "1"))

  // chroma DC 2x2 (Table 9-9(a)): TotalCoeff 1..3
  private val TotalZerosChromaDc: Array[Array[String]] = Array(
    Array("1", "01", "001", "000"),
    Array("1", "01", "00"),
    Array("1", "0"))

  // ------------------------------------------------------- run_before
  // (Table 9-10): row = min(zerosLeft,7)-1, column = run_before.
  private val RunBefore: Array[Array[String]] = Array(
    Array("1", "0"),
    Array("1", "01", "00"),
    Array("11", "10", "01", "00"),
    Array("11", "10", "01", "001", "000"),
    Array("11", "10", "011", "010", "001", "000"),
    Array("11", "000", "001", "011", "010", "101", "100"),
    Array("111", "110", "101", "100", "011", "010", "001", "0001",
      "00001", "000001", "0000001", "00000001", "000000001", "0000000001",
      "00000000001"))

  // ----------------------------------------------- VLC decode tables
  // dec(len)(value) -> symbol (-1 = no code of this length/value);
  // reading proceeds one bit at a time so prefix-freeness (spec-checked
  // in CavlcSpec) guarantees a unique hit within maxLen bits. Flat int
  // arrays replace the earlier (len,value)->symbol HashMaps: the
  // per-bit tuple allocation + boxed lookup was a measured hotspot of
  // every CAVLC decode gate. ~1 MB of static tables total.
  private final class VlcTable(rows: IndexedSeq[(String, Int)]) {
    val maxLen: Int = rows.iterator.map(_._1.length).max
    val dec: Array[Array[Int]] = Array.tabulate(maxLen + 1) { l =>
      if (l == 0) null else Array.fill(1 << l)(-1)
    }
    rows.foreach { case (bits, sym) =>
      dec(bits.length)(Integer.parseInt(bits, 2)) = sym
    }
    // first-level lookup, CACHE-SMALL (<= 256 entries so it lives in
    // L1, unlike a full 2^16 expansion): fast(fbBits-bit window) =
    // (len << 16 | sym) for codes of len <= fbBits, -1 when only a
    // longer code can match. One probe answers the common short codes;
    // longer ones continue the per-bit walk from fbBits+1, seeded with
    // the peeked window (prefix-freeness makes both exact).
    val fbBits: Int = math.min(maxLen, 8)
    val fast: Array[Int] = {
      val f = Array.fill(1 << fbBits)(-1)
      rows.foreach { case (bits, sym) =>
        val l = bits.length
        if (l <= fbBits) {
          val pad = fbBits - l
          val base = Integer.parseInt(bits, 2) << pad
          var i = 0
          while (i < (1 << pad)) { f(base + i) = (l << 16) | sym; i += 1 }
        }
      }
      f
    }
  }
  private def buildMap(rows: IndexedSeq[(String, Int)]): VlcTable =
    new VlcTable(rows)

  private val coeffTokenMaps: Array[VlcTable] =
    (CoeffTokenVlc.map { ctx =>
      buildMap(for {
        tc <- 0 until ctx.length
        t1 <- 0 until ctx(tc).length
      } yield (ctx(tc)(t1), tc << 2 | t1))
    }) :+ buildMap(for {
      tc <- 0 until CoeffTokenChromaDc.length
      t1 <- 0 until CoeffTokenChromaDc(tc).length
    } yield (CoeffTokenChromaDc(tc)(t1), tc << 2 | t1))

  private val totalZerosMaps: Array[VlcTable] =
    TotalZeros4x4.map(row => buildMap(row.zipWithIndex.map {
      case (b, i) => (b, i) }.toIndexedSeq))
  private val totalZerosChromaMaps: Array[VlcTable] =
    TotalZerosChromaDc.map(row => buildMap(row.zipWithIndex.map {
      case (b, i) => (b, i) }.toIndexedSeq))
  private val runBeforeMaps: Array[VlcTable] =
    RunBefore.map(row => buildMap(row.zipWithIndex.map {
      case (b, i) => (b, i) }.toIndexedSeq))

  // ----------------------------------------------- VLC encode tables
  // (len << 20 | value) per symbol, precomputed once — the write path
  // previously re-parsed the bit-string literals per symbol written.
  private def encCode(bits: String): Int =
    bits.length << 20 | Integer.parseInt(bits, 2)
  private val coeffTokenEnc: Array[Array[Array[Int]]] =
    CoeffTokenVlc.map(_.map(_.map(encCode)))
  private val coeffTokenChromaDcEnc: Array[Array[Int]] =
    CoeffTokenChromaDc.map(_.map(encCode))
  private val totalZeros4x4Enc: Array[Array[Int]] =
    TotalZeros4x4.map(_.map(encCode))
  private val totalZerosChromaDcEnc: Array[Array[Int]] =
    TotalZerosChromaDc.map(_.map(encCode))
  private val runBeforeEnc: Array[Array[Int]] =
    RunBefore.map(_.map(encCode))
  @inline private def writeCode(w: BitWriter, code: Int): Unit =
    w.u(code >>> 20, code & 0xFFFFF)

  /** Expose the raw rows for the spec's prefix-freeness audit. */
  private[operators] def tableRows: Seq[(String, Seq[String])] =
    CoeffTokenVlc.zipWithIndex.map { case (ctx, i) =>
      (s"coeff_token ctx$i", ctx.flatten.toSeq) } ++
    Seq(("coeff_token chromaDC", CoeffTokenChromaDc.flatten.toSeq)) ++
    TotalZeros4x4.zipWithIndex.map { case (row, i) =>
      (s"total_zeros tc${i + 1}", row.toSeq) } ++
    TotalZerosChromaDc.zipWithIndex.map { case (row, i) =>
      (s"total_zeros_chroma tc${i + 1}", row.toSeq) } ++
    RunBefore.zipWithIndex.map { case (row, i) =>
      (s"run_before zl${i + 1}", row.toSeq) }

  private def readVlc(r: BitReader, m: VlcTable, what: String): Int = {
    val maxLen = m.maxLen
    val fb = m.fbBits
    var len = 0
    var v = 0
    if (r.bitsLeft >= fb) {
      // one L1-sized table probe answers every code of len <= fbBits —
      // symbol and consumed length identical to the per-bit walk
      val w = r.peek(fb)
      val e = m.fast(w)
      if (e >= 0) { r.skip(e >>> 16); return e & 0xFFFF }
      if (fb == maxLen)
        throw new IllegalArgumentException(s"invalid $what code")
      // longer code: continue the walk from fbBits+1, seeded with the
      // peeked window (now consumed)
      r.skip(fb)
      len = fb
      v = w
    }
    // per-bit walk (long codes, or the buffer tail where eof must fire
    // exactly where the original formulation fired it)
    val dec = m.dec
    while (len < maxLen) {
      v = (v << 1) | r.u1()
      len += 1
      val sym = dec(len)(v)
      if (sym >= 0) return sym
    }
    throw new IllegalArgumentException(s"invalid $what code")
  }

  private def ctxOf(nC: Int): Int =
    if (nC < 0) 3 else if (nC < 2) 0 else if (nC < 4) 1 else 2

  /** coeff_token -> (TotalCoeff, TrailingOnes). nC >= 8 is the 6-bit
    * fixed-length code; nC == -1 selects the chroma-DC table. */
  def readCoeffToken(r: BitReader, nC: Int): (Int, Int) = {
    if (nC >= 8) {
      val v = r.u(6)
      if (v == 3) return (0, 0)
      val tc = (v >> 2) + 1
      val t1 = v & 3
      if (t1 > math.min(tc, 3))
        throw new IllegalArgumentException("invalid FLC coeff_token")
      (tc, t1)
    } else {
      val sym = readVlc(r, coeffTokenMaps(ctxOf(nC)), "coeff_token")
      (sym >> 2, sym & 3)
    }
  }

  def writeCoeffToken(w: BitWriter, nC: Int, tc: Int, t1: Int): Unit = {
    if (nC >= 8) {
      if (tc == 0) w.u(6, 3)
      else w.u(6, ((tc - 1) << 2) | t1)
    } else if (nC < 0) {
      writeCode(w, coeffTokenChromaDcEnc(tc)(t1))
    } else {
      writeCode(w, coeffTokenEnc(ctxOf(nC))(tc)(t1))
    }
  }

  private def readTotalZeros(r: BitReader, tc: Int, maxCoeffs: Int): Int =
    if (maxCoeffs <= 4) readVlc(r, totalZerosChromaMaps(tc - 1), "total_zeros")
    else readVlc(r, totalZerosMaps(tc - 1), "total_zeros")

  private def writeTotalZeros(w: BitWriter, tc: Int, maxCoeffs: Int, tz: Int): Unit =
    writeCode(w,
      if (maxCoeffs <= 4) totalZerosChromaDcEnc(tc - 1)(tz)
      else totalZeros4x4Enc(tc - 1)(tz))

  private def readRunBefore(r: BitReader, zerosLeft: Int): Int =
    readVlc(r, runBeforeMaps(math.min(zerosLeft, 7) - 1), "run_before")

  private def writeRunBefore(w: BitWriter, zerosLeft: Int, run: Int): Unit =
    writeCode(w, runBeforeEnc(math.min(zerosLeft, 7) - 1)(run))

  // ------------------------------------------------------ level codes

  /** level_prefix/level_suffix -> levelCode (9.2.2.1, full escape
    * rules). Prefix capped at 24: conformant levels fit well inside,
    * and the cap bounds hostile inputs. */
  private def readLevelCode(r: BitReader, suffixLength: Int): Int = {
    // level_prefix: leading-zero count over a peeked window (one clz
    // replaces the per-bit loop); prefixes are almost always < 8, so a
    // narrow peek answers first; conformant prefixes are <= 24, so a
    // 25-bit all-zero window is the same overflow the loop threw on
    val prefix = {
      val avail = r.bitsLeft
      var p = -1
      if (avail >= 8) {
        val w8 = r.peek(8)
        if (w8 != 0) { p = Integer.numberOfLeadingZeros(w8) - 24; r.skip(p + 1) }
      }
      if (p < 0) {
        val wlen = if (avail < 25) avail else 25
        val w = if (wlen == 0) 0 else r.peek(wlen)
        if (w == 0) {
          if (wlen == 25)
            throw new IllegalArgumentException("level_prefix overflow")
          else throw new IllegalArgumentException("eof")
        }
        val nz = Integer.numberOfLeadingZeros(w) - (32 - wlen)
        r.skip(nz + 1)
        p = nz
      }
      p
    }
    val suffixSize =
      if (prefix == 14 && suffixLength == 0) 4
      else if (prefix >= 15) prefix - 3
      else suffixLength
    var lc = (math.min(15, prefix) << suffixLength) +
      (if (suffixSize > 0) r.u(suffixSize) else 0)
    if (prefix >= 15 && suffixLength == 0) lc += 15
    if (prefix >= 16) lc += (1 << (prefix - 3)) - 4096
    lc
  }

  private def writeLevelCode(w: BitWriter, lc: Int, suffixLength: Int): Unit = {
    if (suffixLength == 0) {
      if (lc < 14) { w.u(lc, 0); w.u1(1) }
      else if (lc < 30) { w.u(14, 0); w.u1(1); w.u(4, lc - 14) }
      else {
        require(lc < 30 + 4096, s"levelCode $lc out of encoder range")
        w.u(15, 0); w.u1(1); w.u(12, lc - 30)
      }
    } else {
      if (lc < (15 << suffixLength)) {
        w.u(lc >> suffixLength, 0); w.u1(1)
        w.u(suffixLength, lc & ((1 << suffixLength) - 1))
      } else {
        val rem = lc - (15 << suffixLength)
        require(rem < 4096, s"levelCode $lc out of encoder range")
        w.u(15, 0); w.u1(1); w.u(12, rem)
      }
    }
  }

  // -------------------------------------------------- residual blocks

  /** Read one CAVLC residual block (9.2): returns the coefficient
    * levels in scan order (length `maxCoeffs`) and implicitly consumes
    * coeff_token, T1 signs, levels, total_zeros, and run_befores.
    * Throws on any syntax outside the tables (caller maps to a clean
    * `None`). `nC`: the 9.2.1 predictor (-1 for chroma DC). */
  def readResidual(r: BitReader, nC: Int, maxCoeffs: Int): Array[Int] = {
    val (tc, t1) = readCoeffToken(r, nC)
    if (tc > maxCoeffs)
      throw new IllegalArgumentException(s"TotalCoeff $tc > $maxCoeffs")
    val out = new Array[Int](maxCoeffs)
    if (tc == 0) return out
    // levels, highest scan frequency first
    val levels = new Array[Int](tc)
    var i = 0
    while (i < t1) {
      levels(i) = if (r.u1() == 1) -1 else 1
      i += 1
    }
    var sl = if (tc > 10 && t1 < 3) 1 else 0
    while (i < tc) {
      var lc = readLevelCode(r, sl)
      if (i == t1 && t1 < 3) lc += 2
      levels(i) = if ((lc & 1) == 0) (lc + 2) >> 1 else -((lc + 1) >> 1)
      if (sl == 0) sl = 1
      if (math.abs(levels(i)) > (3 << (sl - 1)) && sl < 6) sl += 1
      i += 1
    }
    val totalZeros = if (tc == maxCoeffs) 0 else readTotalZeros(r, tc, maxCoeffs)
    if (tc + totalZeros > maxCoeffs)
      throw new IllegalArgumentException("total_zeros overflows block")
    var zerosLeft = totalZeros
    var pos = tc + totalZeros - 1
    var k = 0
    while (k < tc) {
      out(pos) = levels(k)
      if (k < tc - 1) {
        val run = if (zerosLeft > 0) readRunBefore(r, zerosLeft) else 0
        if (run > zerosLeft)
          throw new IllegalArgumentException("run_before > zerosLeft")
        zerosLeft -= run
        pos -= run + 1
      }
      k += 1
    }
    out
  }

  /** Write one CAVLC residual block — the exact inverse of
    * [[readResidual]]. `coeffs` in scan order, length 4 (chroma DC),
    * 15 (AC), or 16 (DC / full 4x4). Returns TotalCoeff for the
    * caller's nC bookkeeping. */
  def writeResidual(w: BitWriter, coeffs: Array[Int], nC: Int): Int = {
    val maxCoeffs = coeffs.length
    val pos = new Array[Int](maxCoeffs)
    var tc = 0
    var j = 0
    while (j < maxCoeffs) { if (coeffs(j) != 0) { pos(tc) = j; tc += 1 }; j += 1 }
    var t1 = 0
    var i = tc - 1
    while (i >= 0 && t1 < 3 && math.abs(coeffs(pos(i))) == 1) {
      t1 += 1; i -= 1
    }
    writeCoeffToken(w, nC, tc, t1)
    if (tc == 0) return 0
    var k = 0
    while (k < t1) {
      w.u1(if (coeffs(pos(tc - 1 - k)) < 0) 1 else 0)
      k += 1
    }
    var sl = if (tc > 10 && t1 < 3) 1 else 0
    while (k < tc) {
      val level = coeffs(pos(tc - 1 - k))
      var lc = if (level > 0) 2 * level - 2 else -2 * level - 1
      if (k == t1 && t1 < 3) lc -= 2
      writeLevelCode(w, lc, sl)
      if (sl == 0) sl = 1
      if (math.abs(level) > (3 << (sl - 1)) && sl < 6) sl += 1
      k += 1
    }
    val totalZeros = pos(tc - 1) + 1 - tc
    if (tc < maxCoeffs) writeTotalZeros(w, tc, maxCoeffs, totalZeros)
    var zerosLeft = totalZeros
    var idx = tc - 1
    while (idx > 0 && zerosLeft > 0) {
      val run = pos(idx) - pos(idx - 1) - 1
      writeRunBefore(w, zerosLeft, run)
      zerosLeft -= run
      idx -= 1
    }
    tc
  }
}
