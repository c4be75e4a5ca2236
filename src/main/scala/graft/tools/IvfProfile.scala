package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object IvfProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"== $tag: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    // warm
    emb.count(); spark.range(100).selectExpr("sum(id)").collect()
    for (i <- 1 to 2) {
      val c = emb.select(col("vec_id").as("neighbor_id"),
        transform(col("embedding"), x => x.cast("double")).as("v_c"))
      val cents = time(s"kmeans iter$i") { Similarity.kmeansCentroids(c, 16).collect() }
      val full = time(s"ivfTopK full $i") {
        Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
          k = 5, nLists = 16, nprobe = 4).count()
      }
    }
    spark.stop()
  }
}
