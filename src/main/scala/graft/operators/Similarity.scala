package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (SURVEY.md §2 C5-C7).
  *
  * Vector math is composed from codegen'd higher-order functions
  * (`zip_with` + `aggregate`) over `array<double>` — no UDFs. The
  * brute-force path broadcasts the (small) query side so the big side
  * never shuffles; the LSH path confines candidate generation to
  * hyperplane-sign buckets, which is the shape that survives 100 TB.
  */
object Similarity {

  /** Dot product of two array<double> columns (composed formulation;
    * [[cosine]] uses the one-pass expression with identical fold order). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    graft.functions.SignatureExpressions.cosine_sim(a, b)

  private def asDouble(c: Column): Column =
    transform(c, x => x.cast("double"))

  // --------------------------------------------------------------- C6

  /** Brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors (excluding self). Query side is broadcast; ranking
    * is a keyed window (never a global sort). */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("v_c"))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("v_q"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", round(cosine(col("v_q"), col("v_c")), 4))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), col("score"))
  }

  // --------------------------------------------------------------- C7

  /** Sign-bucket id from `nPlanes` deterministic pseudo-random
    * hyperplanes — one tight-loop expression per row
    * (SignatureExpressions.HyperplaneBucket). */
  def lshBucket(vec: Column, nPlanes: Int): Column =
    graft.functions.SignatureExpressions.hyperplane_bucket(vec, nPlanes)

  /** Per-table sign buckets (`nTables` tables of `nPlanes` planes each)
    * as (tbl, bucket) rows — the multi-table LSH candidate key. */
  private def tableBuckets(vec: Column, nPlanes: Int, nTables: Int) =
    posexplode(graft.functions.SignatureExpressions
      .hyperplane_buckets(vec, nPlanes, nTables))

  /** LSH-bucketed ANN, multi-table: candidates share a hyperplane-sign
    * bucket in ANY of `nTables` independent tables of `nPlanes` planes;
    * exact cosine re-ranks the deduped candidate set. One long table
    * has vanishing recall on near-orthogonal corpora (P = (1−θ/π)^m per
    * pair); L short tables lift it to 1 − (1 − (1−θ/π)^m)^L — measured
    * on the testdata embeddings: 0.016 (1×8 planes) → ~0.8 (8×4).
    * Still never a cross join: the bucket join's cost is bucket
    * occupancy × L with id-only rows, and vectors are re-attached by
    * key afterwards. Recall < 1 by construction — this is the scale
    * path; [[cosineTopK]] is the exact baseline. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nPlanes: Int = 4, nTables: Int = 8): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("v_c"))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("v_q"))
    val cB = c.select(col("neighbor_id"),
      tableBuckets(col("v_c"), nPlanes, nTables).as(Seq("tbl", "bucket")))
    val qB = q.select(col("query_id"),
      tableBuckets(col("v_q"), nPlanes, nTables).as(Seq("tbl", "bucket")))
    // narrow id-only candidate rows; a pair colliding in several tables
    // is scored once
    val cand = cB.join(broadcast(qB), Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id")).distinct()
    val scored = cand.join(c, Seq("neighbor_id")).join(broadcast(q), Seq("query_id"))
      .withColumn("score", round(cosine(col("v_q"), col("v_c")), 4))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), col("score"))
  }

  /** Deterministic k-means centroids for IVF lists: init = the k corpus
    * rows with the smallest id-hash, then `iters` Lloyd rounds. Each
    * round is one broadcast of k·dim doubles (assignment) + one
    * element-wise mean (posexplode → per-dimension mean → re-assemble,
    * ordered by position so the collect is deterministic). The mean
    * accumulates in decimal (exact, order-insensitive addition), so
    * centroids are bit-stable across partition layouts and cluster
    * sizes — not merely same-plan reproducible. Clusters that lose all
    * members keep their previous centroid. */
  def kmeansCentroids(c: DataFrame, nLists: Int, iters: Int = 2): DataFrame = {
    var cents = c
      .withColumn("__h", xxhash64(col("neighbor_id")))
      .orderBy(col("__h")).limit(nLists)
      // constant-but-NON-FOLDABLE partition key: nLists rows, so
      // single-partition is the point — but Spark 4's
      // EliminateWindowPartitions folds literal partition keys away,
      // which re-exposes WindowExec's "no partition defined" warning;
      // pmod(__h, 1) is 0 for every row yet survives the optimizer
      .withColumn("centroid_id", row_number().over(
        Window.partitionBy(pmod(col("__h"), lit(1))).orderBy(col("__h"))).cast("long"))
      .select(col("centroid_id"), col("v_c").as("v_cent"))
      // k·dim rows only — materializing each round truncates the
      // otherwise multiplicative lineage (every consumer of `cents`
      // would re-execute all previous Lloyd rounds)
      .localCheckpoint()
    for (_ <- 0 until iters) {
      val assigned = c.crossJoin(broadcast(cents))
        .withColumn("sim", cosine(col("v_c"), col("v_cent")))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("neighbor_id"))
            .orderBy(col("sim").desc, col("centroid_id"))))
        .filter(col("rk") === 1)
      val means = assigned
        .select(col("centroid_id"), posexplode(col("v_c")).as(Seq("pos", "x")))
        .groupBy(col("centroid_id"), col("pos"))
        // decimal sum: exact and commutative, so the per-dimension mean
        // does not depend on partition-dependent accumulation order
        .agg((sum(col("x").cast("decimal(38,18)")) / count(lit(1)))
          .cast("double").as("m"))
        .groupBy(col("centroid_id"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("v_new"))
      cents = cents.join(means, Seq("centroid_id"), "left")
        .select(col("centroid_id"),
          coalesce(col("v_new"), col("v_cent")).as("v_cent"))
        .localCheckpoint()
    }
    cents
  }

  /** IVF-flat ANN: k-means centroid vectors partition the corpus into
    * inverted lists (assignment = nearest centroid); each query probes
    * its `nprobe` closest lists and exact-ranks within them. The plan
    * shape that survives 100 TB: a broadcast of k·dim doubles, one
    * corpus pass to assign, and a join confined to probed lists
    * (≈ nprobe/k of the corpus per query). */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nLists: Int = 16, nprobe: Int = 4,
      kmeansIters: Int = 2): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("v_c"))
    val cents = kmeansCentroids(c, nLists, kmeansIters).cache()
    val assigned = c.crossJoin(broadcast(cents))
      .withColumn("sim", cosine(col("v_c"), col("v_cent")))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("neighbor_id")).orderBy(col("sim").desc, col("centroid_id"))))
      .filter(col("rk") === 1)
      .select(col("centroid_id"), col("neighbor_id"), col("v_c"))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("v_q"))
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("sim", cosine(col("v_q"), col("v_cent")))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("centroid_id"))))
      .filter(col("rk") <= nprobe)
      .select(col("query_id"), col("v_q"), col("centroid_id"))
    val scored = assigned.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", round(cosine(col("v_q"), col("v_c")), 4))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), col("score"))
  }

  // --------------------------------------------------------------- C5

  /** Embedding near-duplicates: pairs with cosine >= threshold, found
    * inside multi-table LSH buckets (bucket join in any of `nTables`
    * tables — never a cross join), deduped to id-only rows, then
    * exact-cosine verified. At threshold 0.8 (θ≈37°), 6 planes × 8
    * tables give pair recall ≈ 0.9; the exact filter keeps precision
    * at 1 regardless of the bucket tuning. */
  def embeddingNearDup(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, nPlanes: Int = 6, nTables: Int = 8): DataFrame = {
    val v = df.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val b = v.select(col("id"),
      tableBuckets(col("v"), nPlanes, nTables).as(Seq("tbl", "bucket")))
    val cand = b.select(col("tbl"), col("bucket"), col("id").as("id_a"))
      .join(b.select(col("tbl"), col("bucket"), col("id").as("id_b")),
        Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    cand
      .join(v.select(col("id").as("id_a"), col("v").as("v_a")), Seq("id_a"))
      .join(v.select(col("id").as("id_b"), col("v").as("v_b")), Seq("id_b"))
      .withColumn("cosine", round(cosine(col("v_a"), col("v_b")), 4))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
