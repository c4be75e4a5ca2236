package graft.operators

import scala.util.Random

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** r21 optimization-equivalence pins: each rewritten kernel must compute
  * EXACTLY what the formulation it replaced computed — these specs hold
  * the slow-but-obviously-correct reference implementation against the
  * optimized one over randomized inputs. */
class OptEquivalenceSpec extends AnyFunSuite {

  // ---------------------------------------------------- char_trigrams

  test("charTrigramsEval equals substring(t, i, 3) for i in 1..len-2, " +
    "including multi-byte codepoints") {
    val rnd = new Random(42)
    val alphabets = Seq(
      "abcdefgh ijklmnop",            // ascii
      "äöüßéñçø",                     // 2-byte
      "日本語中文한국어",                // 3-byte
      "a €𝄞b ö")                      // mixed incl. 4-byte surrogate pair
    for (alpha <- alphabets; n <- Seq(0, 1, 2, 3, 4, 17, 123)) {
      val s = (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      val u = UTF8String.fromString(s)
      val got = graft.functions.SignatureExpressions.charTrigramsEval(u)
      val numChars = u.numChars()
      val want = (1 to math.max(numChars - 2, 0))
        .map(i => u.substringSQL(i, 3).toString)
      val gotStrs = (0 until got.numElements())
        .map(i => got.getUTF8String(i).toString)
      assert(gotStrs == want, s"trigrams diverge for '$s'")
    }
  }

  // --------------------------------------------------- band_signatures

  test("bandSignaturesEval equals xxhash64(concat_ws(',', " +
    "transform(slice(mh, b*r+1, r), cast to string))) per band, " +
    "including negative values and short tails") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val rnd = new Random(21)
    for (trial <- 0 until 30; (bands, r) <- Seq((8, 4), (4, 4), (16, 1), (3, 5))) {
      // lengths exercise exact fit, short tail, and empty tail bands
      val n = Seq(bands * r, bands * r - rnd.nextInt(r), bands * r - r)(trial % 3)
      val mh = Array.fill(math.max(n, 0))(rnd.nextLong())
      val got = graft.functions.SignatureExpressions
        .bandSignaturesEval(new GenericArrayData(mh), bands, r)
      (0 until bands).foreach { b =>
        // reference formulation: 1-based slice of length r, cast each
        // long to its decimal string, join with ',', xxhash64 seed 42
        val sliced = mh.slice(b * r, math.min(b * r + r, mh.length))
        val joined = sliced.map(_.toString).mkString(",")
        val u = UTF8String.fromString(joined)
        val want = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
        assert(got.getLong(b) == want,
          s"trial $trial band $b bands=$bands r=$r n=$n diverged")
      }
    }
  }

  // ----------------------------------------------------- roundHalfUp

  test("roundHalfUpEval equals BigDecimal.valueOf(d).setScale(s, HALF_UP)" +
    ".doubleValue — Spark round(double, s) — over random and adversarial " +
    "inputs") {
    def ref(d: Double, s: Int): Double =
      if (d.isNaN || d.isInfinite) d
      else java.math.BigDecimal.valueOf(d)
        .setScale(s, java.math.RoundingMode.HALF_UP).doubleValue()
    def got(d: Double, s: Int): Double =
      graft.functions.SignatureExpressions
        .roundHalfUpEval(d, s, math.pow(10, s))
    val rnd = new Random(4242)
    val adversarial = Seq(0.0, -0.0, Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, Double.MinPositiveValue, -Double.MinPositiveValue,
      0.5, -0.5, 0.00005, -0.00005, 0.000049999999999, 0.15, -0.15,
      0.44445, -0.44445, 0.123450000000001, 1.0000500000000001,
      4.9e-324, 1e300, -1e300, 2.2250738585072014e-308,
      0.9999499999999999, 0.99995, 123456789.000045, -123456789.000045)
    for (s <- Seq(0, 2, 4, 6)) {
      adversarial.foreach { d =>
        val (w, g) = (ref(d, s), got(d, s))
        assert(java.lang.Double.doubleToRawLongBits(w) ==
          java.lang.Double.doubleToRawLongBits(g) || (w.isNaN && g.isNaN),
          s"adversarial d=$d s=$s want=$w got=$g")
      }
      (0 until 200000).foreach { i =>
        val d = rnd.nextInt(4) match {
          case 0 => rnd.nextDouble() * 2 - 1 // cosine range
          case 1 => (rnd.nextDouble() * 2 - 1) * math.pow(10, rnd.nextInt(12) - 6)
          case 2 => // near half-grid decision boundaries
            (rnd.nextInt(200001) - 100000 + 0.5) / math.pow(10, s) +
              (rnd.nextInt(7) - 3) * 1e-13
          case _ => java.lang.Double.longBitsToDouble(rnd.nextLong())
        }
        val (w, g) = (ref(d, s), got(d, s))
        assert(java.lang.Double.doubleToRawLongBits(w) ==
          java.lang.Double.doubleToRawLongBits(g) || (w.isNaN && g.isNaN),
          s"i=$i d=$d s=$s want=$w got=$g")
      }
    }
  }

  // -------------------------------------------------------- ExactSum

  test("ExactSum expansions equal per-value BigDecimal accumulation " +
    "regardless of addition order") {
    val rnd = new Random(7)
    (0 until 20).foreach { trial =>
      val vals = Array.fill(200)((rnd.nextDouble() - 0.5) *
        math.pow(10, rnd.nextInt(12) - 6))
      val es = Array(new Array[Double](Similarity.ExactSum.Cap))
      var len = 0
      vals.foreach(v => len = Similarity.ExactSum.add(es, 0, len, v))
      val viaExpansion = Similarity.ExactSum.toBigDecimal(es(0), len)
      var viaBd = java.math.BigDecimal.ZERO
      // reversed order: the guarantee is order independence
      vals.reverse.foreach(v => viaBd = viaBd.add(new java.math.BigDecimal(v)))
      assert(viaExpansion.compareTo(viaBd) == 0, s"trial $trial diverged")
    }
  }

  test("ExactSum merge equals adding both streams' values") {
    val rnd = new Random(13)
    val a = Array.fill(100)(rnd.nextGaussian() * 1e3)
    val b = Array.fill(100)(rnd.nextGaussian() * 1e-3)
    val e1 = Array(new Array[Double](Similarity.ExactSum.Cap)); var l1 = 0
    val e2 = Array(new Array[Double](Similarity.ExactSum.Cap)); var l2 = 0
    a.foreach(v => l1 = Similarity.ExactSum.add(e1, 0, l1, v))
    b.foreach(v => l2 = Similarity.ExactSum.add(e2, 0, l2, v))
    l1 = Similarity.ExactSum.merge(e1, 0, l1, e2(0), l2)
    val all = Array(new Array[Double](Similarity.ExactSum.Cap)); var la = 0
    (a ++ b).foreach(v => la = Similarity.ExactSum.add(all, 0, la, v))
    assert(Similarity.ExactSum.toBigDecimal(e1(0), l1)
      .compareTo(Similarity.ExactSum.toBigDecimal(all(0), la)) == 0)
  }

  // --------------------------------------- bound quarter-pel SAD

  test("sadLuma16QpelBound equals mcLuma16Qpel + SAD when not bailing, " +
    "and never under-reports past the limit") {
    val rnd = new Random(99)
    val (w, h) = (32, 32)
    val ref = Array.fill[Byte](w * h)(rnd.nextInt(256).toByte)
    val src = Array.fill[Byte](w * h)(rnd.nextInt(256).toByte)
    for (mx <- 0 to 1; my <- 0 to 1; mvx <- -5 to 5; mvy <- -5 to 5) {
      val pred = H264.mcLuma16Qpel(ref, w, h, mx, my, mvx, mvy)
      var want = 0
      var i = 0
      while (i < 256) {
        want += math.abs(
          (src((my * 16 + i / 16) * w + mx * 16 + i % 16) & 0xFF) - pred(i))
        i += 1
      }
      val full = H264.sadLuma16QpelBound(ref, w, h, mx, my, src,
        mvx, mvy, Int.MaxValue)
      assert(full == want, s"full SAD diverges at ($mx,$my,$mvx,$mvy)")
      // with a random limit, the result must either be the exact SAD
      // (< limit) or an abandoned partial >= limit — never a value
      // below the limit that differs from the true SAD
      val limit = rnd.nextInt(want + 2)
      val bounded = H264.sadLuma16QpelBound(ref, w, h, mx, my, src,
        mvx, mvy, limit)
      if (bounded < limit) assert(bounded == want)
      else assert(want >= limit)
    }
  }

  // ---------------------------------------------------- bit I/O

  test("BitWriter.u(n,v) multi-bit fill equals per-bit writes; " +
    "BitReader.u(n) equals per-bit reads") {
    val rnd = new Random(5)
    (0 until 50).foreach { _ =>
      val ops = (0 until 200).map { _ =>
        val n = 1 + rnd.nextInt(24)
        (n, rnd.nextInt(1 << n))
      }
      val w1 = new H264.BitWriter
      ops.foreach { case (n, v) => w1.u(n, v) }
      w1.rbspTrailing()
      val w2 = new H264.BitWriter
      ops.foreach { case (n, v) =>
        var i = n - 1
        while (i >= 0) { w2.u1((v >> i) & 1); i -= 1 }
      }
      w2.rbspTrailing()
      assert(java.util.Arrays.equals(w1.toBytes, w2.toBytes))
      val r = new H264.BitReader(w1.toBytes)
      ops.foreach { case (n, v) => assert(r.u(n) == v) }
    }
  }
}
