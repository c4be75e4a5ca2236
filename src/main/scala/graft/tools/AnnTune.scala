package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Floor-setting scaffolding for the C7/C30 recall gates: measure
  * recall@10 vs exact cosine for the IVF/LSH/PQ/IVF-PQ paths across
  * candidate parameter settings, at both gate SFs. */
object AnnTune {

  /** Deterministic mixture-of-Gaussians embeddings (r20, verdict task
    * 3): `k` unit-sphere centers (seeded gaussians, normalized), each
    * point = normalize(center + noise), noise entries N(0, noiseSigma).
    * At the defaults the within-cluster cosine is ≈ 0.93 and the
    * across-cluster cosine ≈ 0 — the CLUSTERED corpus shape IVF exists
    * for (the testdata embeddings are isotropic, docs/ANN_TUNE.md).
    * Pure function of the seed: generation happens on the driver and
    * parallelizes, so the same seed pins the same corpus anywhere. */
  def clusteredEmbeddings(spark: SparkSession, n: Int, dim: Int = 64,
      k: Int = 32, seed: Long = 42L, noiseSigma: Double = 0.05)
      : org.apache.spark.sql.DataFrame = {
    val rnd = new java.util.Random(seed)
    def unit(v: Array[Double]): Array[Double] = {
      val nrm = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / math.max(nrm, 1e-12))
    }
    val centers = Array.fill(k)(unit(Array.fill(dim)(rnd.nextGaussian())))
    val rows = (0 until n).map { i =>
      val c = centers(i % k)
      val p = unit(Array.tabulate(dim)(j =>
        c(j) + noiseSigma * rnd.nextGaussian()))
      (i.toLong, p.map(_.toFloat).toSeq)
    }
    import spark.implicits._
    spark.createDataset(rows).toDF("vec_id", "embedding")
      .repartition(8)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val d = s"/root/testdata/$sf"
      val emb = spark.read.parquet(s"$d/embeddings.parquet")
      val q = emb.filter(col("vec_id") % 20 === 0)
      val exact = Similarity.cosineTopK(emb, q, "vec_id", "embedding", 10)
        .select(col("query_id"), col("neighbor_id")).cache()
      exact.count()
      def recallOf(name: String, a: => org.apache.spark.sql.DataFrame): Unit = {
        val t0 = System.nanoTime()
        val approx = a.select(col("query_id").as("aq"), col("neighbor_id").as("an"))
        val r = exact.join(approx,
            col("query_id") === col("aq") && col("neighbor_id") === col("an"),
            "left_outer")
          .agg(count(col("an")).cast("double") / count(lit(1))).head.getDouble(0)
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"== $sf $name recall@10 = $r%.4f wall = $secs%.2f s")
      }
      for (np <- Seq(4, 6, 8)) recallOf(s"IVF np=$np it=2",
        Similarity.ivfTopK(emb, q, "vec_id", "embedding", 10, nLists = 16, nprobe = np))
      for (it <- Seq(4)) recallOf(s"IVF np=6 it=$it",
        Similarity.ivfTopK(emb, q, "vec_id", "embedding", 10, nLists = 16,
          nprobe = 6, kmeansIters = it))
      // r19: finer partitioning at the SAME scan fraction — 64 lists
      // probe 32 scans the same ~50% of the corpus as 16/8 but routes
      // far better on this isotropic testdata (routing-bound simulation
      // in docs/ANN_TUNE.md)
      for ((nl, np) <- Seq((16, 10), (16, 12), (32, 16), (64, 24), (64, 32)))
        recallOf(s"IVF nl=$nl np=$np it=2",
          Similarity.ivfTopK(emb, q, "vec_id", "embedding", 10,
            nLists = nl, nprobe = np))
      for ((nl, np, rf) <- Seq((64, 32, 3), (64, 32, 5), (32, 16, 5), (16, 8, 5)))
        recallOf(s"IVFPQ nl=$nl np=$np refine=$rf",
          Similarity.ivfPqTopK(emb, q, "vec_id", "embedding", 10,
            nLists = nl, nprobe = np, refine = rf))
      recallOf("LSH 4x8", Similarity.lshTopK(emb, q, "vec_id", "embedding", 10))
      recallOf("LSH 4x12", Similarity.lshTopK(emb, q, "vec_id", "embedding", 10,
        nPlanes = 4, nTables = 12))
      recallOf("LSH 3x12", Similarity.lshTopK(emb, q, "vec_id", "embedding", 10,
        nPlanes = 3, nTables = 12))
      recallOf("PQ 32/32", Similarity.pqTopK(emb, q, "vec_id", "embedding", 10))
      recallOf("IVFPQ 16/8", Similarity.ivfPqTopK(emb, q, "vec_id", "embedding", 10,
        nLists = 16, nprobe = 8))
      recallOf("IVFPQ-res 16/8", Similarity.ivfPqTopK(emb, q, "vec_id", "embedding", 10,
        nLists = 16, nprobe = 8, residual = true))
      recallOf("IVFPQ 16/8 refine=3", Similarity.ivfPqTopK(emb, q, "vec_id", "embedding", 10,
        nLists = 16, nprobe = 8, refine = 3))
      recallOf("IVFPQ 16/8 refine=5", Similarity.ivfPqTopK(emb, q, "vec_id", "embedding", 10,
        nLists = 16, nprobe = 8, refine = 5))
      recallOf("IVFPQ-res 16/8 refine=3", Similarity.ivfPqTopK(emb, q, "vec_id", "embedding", 10,
        nLists = 16, nprobe = 8, residual = true, refine = 3))
      recallOf("PQ refine=3", Similarity.pqTopK(emb, q, "vec_id", "embedding", 10,
        refine = 3))
      exact.unpersist()
    }
    // r20 (verdict task 3): the same ivfTopK code on CLUSTERED
    // embeddings — the corpus shape the index exists for — must reach
    // high recall at a SMALL scan fraction (the isotropic sections
    // above are data-bound near ~50%; see docs/ANN_TUNE.md).
    for ((n, tag) <- Seq((20000, "clustered-20k"), (60000, "clustered-60k"))) {
      val emb = clusteredEmbeddings(spark, n).cache()
      emb.count()
      val q = emb.filter(col("vec_id") % 20 === 0)
      val exact = Similarity.cosineTopK(emb, q, "vec_id", "embedding", 10)
        .select(col("query_id"), col("neighbor_id")).cache()
      exact.count()
      for ((nl, np, it) <- Seq((32, 2, 4), (32, 4, 4), (64, 4, 4), (64, 8, 4))) {
        val t0 = System.nanoTime()
        val approx = Similarity.ivfTopK(emb, q, "vec_id", "embedding", 10,
            nLists = nl, nprobe = np, kmeansIters = it)
          .select(col("query_id").as("aq"), col("neighbor_id").as("an"))
        val r = exact.join(approx,
            col("query_id") === col("aq") && col("neighbor_id") === col("an"),
            "left_outer")
          .agg(count(col("an")).cast("double") / count(lit(1))).head.getDouble(0)
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"== $tag IVF nl=$nl np=$np it=$it (nominal scan ${np.toDouble / nl}%.3f) " +
          f"recall@10 = $r%.4f wall = $secs%.2f s")
      }
      exact.unpersist(); emb.unpersist()
    }
    spark.stop()
  }
}
