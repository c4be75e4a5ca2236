package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** r20 — CABAC entropy coding for the Intra_16x16 H.264 subset: the
  * arithmetic engine (decision/bypass/terminate + renormalization),
  * residual block coding (coded_block_flag, significance map, UEG0
  * levels, bypass signs), and the full encode→decode pixel equality.
  * Conformance boundary: context INIT values are not spec-table-backed
  * (see Cabac.scala's honesty boundary), so CABAC decode is gated on
  * the encoder's SEI marker — the foreign-stream test pins that gate. */
class CabacSpec extends AnyFunSuite {

  test("arithmetic engine round-trips context-coded + bypass bins exactly") {
    val rnd = new java.util.Random(7)
    // several adversarial mixes: skewed contexts, bypass runs,
    // mid-stream terminates kept 0 until the end
    for (trial <- 0 until 20) {
      val nCtx = 8
      val bins = Array.fill(400 + trial * 37) {
        val kind = rnd.nextInt(10)
        if (kind < 6) (0, rnd.nextInt(nCtx), // context-coded, skewed
          if (rnd.nextInt(10) < 7) 1 else 0)
        else (1, 0, rnd.nextInt(2)) // bypass
      }
      val w = new H264.BitWriter
      val ectx = Cabac.initCtxs()
      val e = new Cabac.Encoder(w)
      bins.foreach {
        case (0, c, b) => e.decision(ectx(c), b)
        case (_, _, b) => e.bypass(b)
      }
      e.terminate(1)
      e.flushTerminate()
      w.byteAlignZero()
      val bytes = w.toBytes
      val r = new H264.BitReader(bytes)
      val dctx = Cabac.initCtxs()
      val d = new Cabac.Decoder(r)
      bins.zipWithIndex.foreach {
        case ((0, c, b), i) =>
          assert(d.decision(dctx(c)) == b, s"trial $trial ctx bin $i")
        case ((_, _, b), i) =>
          assert(d.bypass() == b, s"trial $trial bypass bin $i")
      }
      assert(d.terminate() == 1, s"trial $trial terminate")
    }
  }

  test("residual block coding round-trips adversarial level patterns") {
    val rnd = new java.util.Random(11)
    for (trial <- 0 until 30) {
      val blocks = (0 until 40).map { _ =>
        val cat = Seq(0, 1, 3, 4)(rnd.nextInt(4))
        val n = cat match { case 0 => 16; case 3 => 4; case _ => 15 }
        val levels = new Array[Int](n)
        val density = rnd.nextInt(4) // 0 = often all-zero
        var i = 0
        while (i < n) {
          if (rnd.nextInt(4) < density)
            levels(i) = (rnd.nextInt(40) + 1) *
              (if (rnd.nextBoolean()) 1 else -1) *
              (if (rnd.nextInt(10) == 0) 50 else 1) // exercise EG0 suffix
          i += 1
        }
        (cat, levels, rnd.nextInt(4))
      }
      val w = new H264.BitWriter
      val ectx = Cabac.initCtxs()
      val e = new Cabac.Encoder(w)
      blocks.foreach { case (cat, levels, inc) =>
        Cabac.writeResidual(e, ectx, cat, levels, inc)
      }
      e.terminate(1); e.flushTerminate(); w.byteAlignZero()
      val d = new Cabac.Decoder(new H264.BitReader(w.toBytes))
      val dctx = Cabac.initCtxs()
      blocks.zipWithIndex.foreach { case ((cat, levels, inc), bi) =>
        val (got, total) = Cabac.readResidual(d, dctx, cat, levels.length, inc)
        assert(got.sameElements(levels),
          s"trial $trial block $bi: ${got.toSeq} vs ${levels.toSeq}")
        assert(total == levels.count(_ != 0))
      }
      assert(d.terminate() == 1)
    }
  }

  test("CABAC Intra_16x16 encode -> decode is pixel-exact across QPs and sizes") {
    for ((wMbs, hMbs, qp, nFrames, seed) <- Seq(
        (2, 2, 20, 3, 1), (2, 2, 28, 1, 2), (3, 2, 24, 2, 3),
        (2, 3, 36, 2, 4), (4, 4, 22, 1, 5))) {
      val rnd = new java.util.Random(seed)
      val (w, h) = (wMbs * 16, hMbs * 16)
      val frames = (0 until nFrames).map { k =>
        H264.Plane(w, h,
          Array.tabulate(w * h)(i =>
            ((i % w) * 2 + i / w + rnd.nextInt(97) + k * 5).toByte),
          Array.tabulate(w / 2 * (h / 2))(i => (rnd.nextInt(256)).toByte),
          Array.tabulate(w / 2 * (h / 2))(i => (rnd.nextInt(256)).toByte))
      }
      val (enc, expected) = H264.encodeCabacTextured(frames, qp)
      val dec = H264.decodeNals(Seq(enc.sps, enc.pps) ++ enc.frameNals)
        .getOrElse(fail(s"CABAC stream failed to decode (${wMbs}x$hMbs qp $qp)"))
      assert(dec.filterExact, "loop filter must be disabled in-stream")
      assert(dec.frames.length == expected.length)
      dec.frames.zip(expected).zipWithIndex.foreach { case ((g, e), i) =>
        assert(g.y.sameElements(e.y), s"frame $i luma mismatch")
        assert(g.cb.sameElements(e.cb), s"frame $i cb mismatch")
        assert(g.cr.sameElements(e.cr), s"frame $i cr mismatch")
      }
    }
  }

  test("foreign CABAC (no marker SEI) keeps the checked fallback: None") {
    val frames = IndexedSeq(H264.Plane(32, 32,
      Array.tabulate(32 * 32)(i => (i * 7).toByte),
      Array.fill(16 * 16)(100.toByte), Array.fill(16 * 16)(80.toByte)))
    val (enc, _) = H264.encodeCabacTextured(frames, 26)
    // drop the SEI marker: the stream now looks like FOREIGN CABAC,
    // whose context inits this decoder cannot verify — must reject
    val noSei = enc.frameNals.filter(n => (n(0) & 0x1F) != 6)
    assert(H264.decodeNals(Seq(enc.sps, enc.pps) ++ noSei).isEmpty,
      "unmarked CABAC must fall back loudly, never decode silently")
    // and with the marker restored it decodes again
    assert(H264.decodeNals(Seq(enc.sps, enc.pps) ++ enc.frameNals).isDefined)
  }
}
