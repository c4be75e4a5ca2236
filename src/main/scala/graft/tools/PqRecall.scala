package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure PQ-ANN recall@10 vs exact cosine on the testdata embeddings
  * (floor-setting scaffolding for the sim_pq_recall gate, like
  * RecallCheck for LSH/IVF). Args: sfDir [m] [ks]. */
object PqRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val m = args.lift(1).map(_.toInt).getOrElse(16)
    val ks = args.lift(2).map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = emb.filter(col("vec_id") % 20 === 0)
    val exact = Similarity.cosineTopK(emb, q, "vec_id", "embedding", 10)
      .select(col("query_id"), col("neighbor_id"))
    def recallOf(name: String,
        a: org.apache.spark.sql.DataFrame): Unit = {
      val approx = a.select(col("query_id").as("aq"), col("neighbor_id").as("an"))
      val r = exact.join(approx,
          col("query_id") === col("aq") && col("neighbor_id") === col("an"),
          "left_outer")
        .agg(count(col("an")).cast("double") / count(lit(1))).head.getDouble(0)
      println(f"$name m=$m ks=$ks recall@10 = $r%.4f  ($sfDir)")
    }
    recallOf("PQ", Similarity.pqTopK(emb, q, "vec_id", "embedding", 10, m, ks))
    recallOf("IVF-PQ(16,8)", Similarity.ivfPqTopK(emb, q, "vec_id", "embedding",
      10, nLists = 16, nprobe = 8, m = m, ks = ks))
    spark.stop()
  }
}
