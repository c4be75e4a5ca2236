package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Floor-setting scaffolding for the C7/C30 recall gates: measure
  * recall@10 vs exact cosine for the IVF/LSH/PQ/IVF-PQ paths across
  * candidate parameter settings, at both gate SFs. */
object AnnTune {
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
    spark.stop()
  }
}
