package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch: is LSH-emitted pair set == exact threshold set on testdata? */
object RecallCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Dedup, Similarity, TextAnalysis}
    import graft.functions.SignatureExpressions

    for (sf <- Seq("sf0.01", "sf0.1")) {
      val d = s"/root/testdata/$sf"
      val docs = spark.read.parquet(s"$d/documents.parquet")
      // exact jaccard pairs via unfiltered shingle-share candidates
      val sh = docs.select(col("doc_id").as("__id"),
        SignatureExpressions.shingle_hashes(
          TextAnalysis.tokens(col("text")), 3).as("__sh"))
      val inv = sh.select(col("__id"), explode(col("__sh")).as("g"))
      val cand = inv.select(col("g"), col("__id").as("id_a"))
        .join(inv.select(col("g"), col("__id").as("id_b")), Seq("g"))
        .filter(col("id_a") < col("id_b")).select("id_a", "id_b").distinct()
      val a = sh.as("sa"); val b = sh.as("sb")
      val exact = cand
        .join(a, col("id_a") === col("sa.__id"))
        .join(b, col("id_b") === col("sb.__id"))
        .withColumn("j",
          size(array_intersect(col("sa.__sh"), col("sb.__sh"))).cast("double") /
            greatest(size(array_union(col("sa.__sh"), col("sb.__sh"))), lit(1)).cast("double"))
      for (th <- Seq(0.3, 0.5, 0.8)) {
        val ex = exact.filter(col("j") >= th).select("id_a", "id_b")
        val lsh = Dedup.minhashPairs(docs, "text", "doc_id",
          k = 32, bands = 8, w = 3, threshold = th).select("id_a", "id_b")
        val nEx = ex.count(); val nLsh = lsh.count()
        val miss = ex.except(lsh).count()
        println(s"== $sf minhash th=$th exact=$nEx lsh=$nLsh missed=$miss")
      }
      // exact jaccard distribution near thresholds
      val dist = exact.filter(col("j") >= 0.25)
        .select(round(col("j"), 2).as("jr")).groupBy("jr").count()
        .orderBy("jr").collect().map(r => s"${r.get(0)}:${r.getLong(1)}").mkString(" ")
      println(s"== $sf jaccard dist >=0.25: $dist")

      // embeddings: exact cosine pairs vs LSH-bucketed near-dup
      val emb = spark.read.parquet(s"$d/embeddings.parquet")
      val v = emb.select(col("vec_id").as("id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      val exactCos = v.as("va").crossJoin(v.as("vb"))
        .filter(col("va.id") < col("vb.id"))
        .withColumn("c", SignatureExpressions.cosine_sim(col("va.v"), col("vb.v")))
        .filter(col("c") >= 0.8)
      val nExC = exactCos.count()
      val lshPairs = Similarity.embeddingNearDup(emb, "vec_id", "embedding",
        threshold = 0.8, nPlanes = 8)
      val nLshC = lshPairs.count()
      val missC = exactCos.select(col("va.id").as("id_a"), col("vb.id").as("id_b"))
        .except(lshPairs.select("id_a", "id_b")).count()
      println(s"== $sf embed th=0.8 exact=$nExC lsh=$nLshC missed=$missC")
      val distC = exactCos.select(round(col("c"), 2).as("cr")).groupBy("cr").count()
        .orderBy("cr").collect().map(r => s"${r.get(0)}:${r.getLong(1)}").mkString(" ")
      println(s"== $sf cosine dist >=0.8: $distC")
    }
    spark.stop()
  }
}
