package graft.tools

import java.util.concurrent.{Callable, Executors}

/** Measures whether per-picture SLICE-parallel decode would pay inside
  * the mapPartitions H.264 kernel (r15 PLANS.md note: slices are
  * independent by the 7.4.3 availability argument, so a decoder COULD
  * fan a picture's slices across threads).
  *
  * The question at 100 TB is not "can slices decode in parallel" but
  * "is there idle CPU for them": the kernel already decodes one ROW
  * per task thread, so slice threads only help when in-flight rows <
  * cores (the single-fat-file tail). This tool measures exactly that —
  * a fixed corpus of multi-slice AVC streams decoded under thread
  * pools of 1..32, where each task is one whole-stream decode (the
  * production shape). Near-linear scaling to the core count means
  * row-level parallelism saturates the box and intra-picture slice
  * threading would only re-slice the same saturated CPU.
  *
  * Env: SPARK_GRAFT_SLICE_COPIES (streams, default 64),
  * SPARK_GRAFT_SLICE_REPS (decode repetitions per stream, default 8).
  */
object SliceParallelBench {
  def main(args: Array[String]): Unit = {
    val copies = sys.env.getOrElse("SPARK_GRAFT_SLICE_COPIES", "64").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_SLICE_REPS", "8").toInt
    val streams = (0 until copies).map { i =>
      val text = s"slice parallel probe $i " + ("lorem ipsum " * (4 + i % 23))
      val (mp4, _, _, slices) = MediaGen.makeMp4AvcI4PSliced(text)
      (mp4, slices)
    }.toArray
    val slicesPerPic = streams.map(_._2)
    println(s"[slice-bench] $copies sliced I/P streams, " +
      s"${streams.map(_._1.length.toLong).sum / 1024} KiB total, " +
      s"slices/picture min=${slicesPerPic.min} max=${slicesPerPic.max}, " +
      s"reps=$reps")

    def decodeAll(threads: Int): Double = {
      val pool = Executors.newFixedThreadPool(threads)
      val t0 = System.nanoTime
      val futs = for (_ <- 0 until reps; (b, _) <- streams) yield
        pool.submit(new Callable[Int] {
          def call(): Int =
            graft.operators.H264.decodeMp4(b).map(_.frames.length).getOrElse(-1)
        })
      val frames = futs.map(_.get()).sum
      val sec = (System.nanoTime - t0) / 1e9
      pool.shutdown()
      require(frames > 0, "decode failed")
      sec
    }

    decodeAll(4) // JIT warm-up, discarded
    val base = decodeAll(1)
    println(f"[slice-bench] threads= 1 wall=$base%.3f s (baseline)")
    for (threads <- Seq(4, 8, 16, 32)) {
      val sec = decodeAll(threads)
      println(f"[slice-bench] threads=$threads%2d wall=$sec%.3f s " +
        f"speedup=${base / sec}%.2f x")
    }
    println("[slice-bench] loadavg " +
      scala.io.Source.fromFile("/proc/loadavg").mkString.trim)
  }
}
