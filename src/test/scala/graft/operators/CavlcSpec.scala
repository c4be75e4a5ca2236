package graft.operators

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** The CAVLC entropy layer: every VLC table row must be prefix-free
  * (decode reads bit-by-bit, so a prefix collision would misdecode
  * silently), and the writer must be the exact inverse of the reader
  * over the whole symbol space — sparse and dense blocks, all nC
  * contexts, trailing-one runs, suffixLength adaptation, and the
  * level escape codes. */
class CavlcSpec extends AnyFunSuite {

  test("every VLC table row is prefix-free with codes <= 16 bits") {
    Cavlc.tableRows.foreach { case (name, codes) =>
      assert(codes.forall(c => c.nonEmpty && c.length <= 16 &&
        c.forall(b => b == '0' || b == '1')), s"$name: malformed code")
      assert(codes.distinct.size == codes.size, s"$name: duplicate code")
      for (a <- codes; b <- codes if a != b)
        assert(!b.startsWith(a), s"$name: '$a' is a prefix of '$b'")
    }
  }

  private def roundTrip(coeffs: Array[Int], nC: Int): Array[Int] = {
    val w = new H264.BitWriter
    val tcW = Cavlc.writeResidual(w, coeffs, nC)
    w.rbspTrailing()
    val r = new H264.BitReader(w.toBytes)
    val back = Cavlc.readResidual(r, nC, coeffs.length)
    assert(tcW == coeffs.count(_ != 0))
    back
  }

  test("residual blocks round-trip across all nC contexts and block sizes") {
    val rnd = new Random(20260813L)
    val nCs = Seq(-1, 0, 1, 2, 3, 4, 7, 8, 16)
    (0 until 4000).foreach { trial =>
      val nC = nCs(rnd.nextInt(nCs.length))
      val maxCoeffs = if (nC == -1) 4 else if (rnd.nextBoolean()) 15 else 16
      val coeffs = new Array[Int](maxCoeffs)
      // density sweep: empty, sparse, dense, and full blocks
      val n = rnd.nextInt(maxCoeffs + 1)
      rnd.shuffle((0 until maxCoeffs).toList).take(n).foreach { p =>
        // magnitude sweep hits trailing ones, small levels, and the
        // level_prefix escape ranges (4-bit and 12-bit suffixes)
        val mag = rnd.nextInt(4) match {
          case 0 => 1
          case 1 => 1 + rnd.nextInt(3)
          case 2 => 1 + rnd.nextInt(40)
          case _ => 1 + rnd.nextInt(2000)
        }
        coeffs(p) = if (rnd.nextBoolean()) mag else -mag
      }
      val back = roundTrip(coeffs, nC)
      assert(back.sameElements(coeffs),
        s"trial $trial nC=$nC: ${coeffs.toSeq} != ${back.toSeq}")
    }
  }

  test("coeff_token round-trips every (TotalCoeff, TrailingOnes) pair") {
    for (nC <- Seq(-1, 0, 2, 4, 8)) {
      val maxTc = if (nC == -1) 4 else 16
      for (tc <- 0 to maxTc; t1 <- 0 to math.min(3, tc)) {
        val w = new H264.BitWriter
        Cavlc.writeCoeffToken(w, nC, tc, t1)
        w.rbspTrailing()
        val r = new H264.BitReader(w.toBytes)
        assert(Cavlc.readCoeffToken(r, nC) == ((tc, t1)),
          s"nC=$nC tc=$tc t1=$t1")
      }
    }
  }

  test("hostile bitstreams throw cleanly, never misdecode or hang") {
    val rnd = new Random(777)
    (0 until 2000).foreach { _ =>
      val junk = Array.fill[Byte](1 + rnd.nextInt(12))(rnd.nextInt().toByte)
      val r = new H264.BitReader(junk)
      try {
        val c = Cavlc.readResidual(r, rnd.nextInt(10) - 1 match {
          case n if n < -1 => -1; case n => n
        }, 16)
        assert(c.length == 16) // decoded fine - acceptable for junk
      } catch { case _: IllegalArgumentException => /* clean reject */ }
    }
  }
}
