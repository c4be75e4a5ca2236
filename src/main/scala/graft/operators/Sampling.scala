package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splits (SURVEY.md §2 C17).
  *
  * Training pipelines need REPRODUCIBLE sampling: the same document
  * must land in the same sample/split on every run, on any cluster, in
  * any engine — `rand()`-based sampling gives none of that. Bucketing
  * a key's hash delivers it as a pure per-row projection: no shuffle,
  * no state, stable under repartitioning and retries.
  */
object Sampling {

  /** Null keys map to the empty string: deterministic (all null-keyed
    * rows bucket together), identical on both hash paths, and never a
    * silent fall-through. */
  private def keyStr(key: Column, salt: String): Column =
    concat(coalesce(key.cast("string"), lit("")), lit(salt))

  /** Stable bucket in [0, buckets) from a key column (xxhash64 — the
    * fast path for Spark-only pipelines). */
  def hashBucket(key: Column, buckets: Int, salt: String = ""): Column =
    pmod(xxhash64(keyStr(key, salt)), lit(buckets))

  /** Engine-portable bucket (md5-derived, identical in any SQL engine
    * with md5: first 8 hex chars as an integer, mod buckets). */
  def md5Bucket(key: Column, buckets: Int, salt: String = ""): Column =
    conv(substring(md5(keyStr(key, salt)), 1, 8), 16, 10)
      .cast("long") % buckets

  /** Keep `pct` of 100 hash-buckets of the key — a deterministic
    * `pct`% sample. */
  def hashSample(df: DataFrame, keyCol: String, pct: Int,
      salt: String = "", portable: Boolean = false): DataFrame = {
    require(pct >= 0 && pct <= 100, "pct in [0,100]")
    val b = if (portable) md5Bucket(col(keyCol), 100, salt)
      else hashBucket(col(keyCol), 100, salt)
    df.filter(b < pct)
  }

  /** Adds a `split` column assigning each row to a named fraction
    * (e.g. Seq("train" -> 98, "val" -> 1, "test" -> 1); weights sum to
    * 100). Assignment is per-key deterministic and engine-portable. */
  def assignSplits(df: DataFrame, keyCol: String,
      splits: Seq[(String, Int)], portable: Boolean = false): DataFrame = {
    require(splits.map(_._2).sum == 100, "split weights must sum to 100")
    val b = if (portable) md5Bucket(col(keyCol), 100)
      else hashBucket(col(keyCol), 100)
    val cums = splits.scanLeft(0)(_ + _._2).tail
    // materialize the bucket once — a cascading CASE over the raw hash
    // expression would recompute the md5/xxhash per branch tested
    val caseExpr = splits.zip(cums).reverse
      .foldLeft(lit(splits.last._1)) { case (acc, ((name, _), cum)) =>
        when(col("__bucket") < cum, lit(name)).otherwise(acc)
      }
    df.withColumn("__bucket", b)
      .withColumn("split", caseExpr)
      .drop("__bucket")
  }

  // -------------------------------------------------------------- C26

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES),
    * deterministic: each row's uniform u ∈ (0,1] comes from the
    * engine-portable md5 hash of its key (not `rand()` — the sample
    * must be reproducible across runs, clusters, and engines), and the
    * row's sort key is u^(1/w); the k largest sort keys are exactly a
    * weight-proportional sample without replacement. Rows with
    * non-positive weights are filtered out (u^(1/w) would be Inf/NaN
    * and float to the top of the sample). Adds a `sample_key` column.
    *
    * u uses 60 hash bits (15 md5 hex chars) with NO modulo: a modulo
    * over a 32-bit hash (the md5Bucket shape) makes low residues ~25%
    * more likely at 10^9 buckets, skewing inclusion probabilities away
    * from weight-proportional; dividing the full 60-bit value by 2^60
    * has zero modulo bias and stays exact in a BIGINT in any engine.
    *
    * Scale shape: the hash and pow are per-row projections; the global
    * top-k executes as TakeOrdered (per-partition bounded heaps, then a
    * driver merge of k-row partials) — no global sort, no shuffle of
    * the input, the right shape for "sample 1M docs from 100 TB by
    * length/quality weight". */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
      k: Int, salt: String = ""): DataFrame = {
    val u = (conv(substring(md5(keyStr(col(keyCol), salt)), 1, 15), 16, 10)
      .cast("long") + lit(1.0)) / lit(1152921504606846976.0) // 2^60
    df.filter(col(weightCol).cast("double") > 0)
      .withColumn("sample_key", pow(u, lit(1.0) / col(weightCol).cast("double")))
      .orderBy(col("sample_key").desc, col(keyCol))
      .limit(k)
  }

  // -------------------------------------------------------------- C22

  /** Training-shard assignment by running token budget: within each
    * `partCol` group, rows ordered by `idCol` accumulate whitespace
    * token counts, and `shard_id = floor(tokens_before / budget)` —
    * contiguous ~budget-token shards, the layout a sequence-packing
    * data loader consumes. One ordered prefix-sum window per group key
    * (same shuffle shape as sessionization: key-partitioned, no global
    * sort), then everything downstream groups on (part, shard). Counts
    * stay far below 2^53 so the floor-division replays exactly in any
    * engine.
    *
    * `tokenCount` is the budget's unit — default whitespace split; pass
    * `c => graft.functions.Bpe.bpe_token_count(TextAnalysis.tokens(c), merges)`
    * to budget in REAL BPE tokens (what the trainer's loader consumes),
    * so shard sizes match what the model actually sees. */
  def shardByTokenBudget(df: DataFrame, partCol: String, idCol: String,
      textCol: String, budget: Int,
      tokenCount: Column => Column = c => size(split(c, " ")).cast("long")): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(partCol)).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("n_tok", tokenCount(col(textCol)).cast("long"))
      .withColumn("shard_id",
        floor(coalesce(sum(col("n_tok")).over(w), lit(0L)) / budget).cast("long"))
  }

  // -------------------------------------------------------------- C24

  /** Deterministic exact-k-per-group sample: within each `groupCol`,
    * keep the k rows ranked first by the md5 of (key ‖ salt) — a
    * reservoir-sample shape whose selection is reproducible across
    * runs, engines, and partitionings (no RNG state). Different salts
    * draw decorrelated samples. Rides the B33 TopKPerKey plan (bounded
    * heap per group, no per-group sort), so a 100 TB corpus pays one
    * keyed shuffle of k·groups surviving rows. Adds `smp_rank` 1..k. */
  def sampleKPerGroup(df: DataFrame, groupCol: String, keyCol: String,
      k: Int, salt: String = ""): DataFrame = {
    require(k > 0, "k must be positive")
    // TopK.perKey materializes its rank as `rnk`; refuse to silently
    // overwrite caller columns of either name
    require(!df.columns.contains("rnk") && !df.columns.contains("smp_rank"),
      "input already has a rnk/smp_rank column — rename it first")
    // null-safe key and a separator between key and salt: a null key
    // would hash to NULL and sort opposite ways across engines (Spark
    // ASC = nulls first, most SQL engines = nulls last), and without a
    // separator distinct (key, salt) pairs can collide ('1'+'1s' ==
    // '11'+'s'), correlating draws across salts
    val hk = md5(concat(coalesce(col(keyCol).cast("string"), lit("")),
      lit("|"), lit(salt)))
    graft.plans.TopK.perKey(df, Seq(col(groupCol)),
        Seq(hk.asc, col(keyCol).asc), k)
      .withColumn("smp_rank", col("rnk").cast("long"))
      .drop("rnk")
  }

  // -------------------------------------------------------------- C39

  /** Leakage-safe splits: near-duplicate documents must land in the
    * SAME split — a val/test doc with a train-side near-dup leaks
    * training data into evaluation through its cluster. Assignment
    * therefore hashes the duplicate-cluster REPRESENTATIVE (the min-id
    * member of the near-dup component; documents with no near-dup hash
    * their own key), so a whole cluster inherits ONE verdict,
    * engine-portably (md5 — replayable in SQL, like [[assignSplits]]).
    * `pairs` is any symmetric near-dup pair set (`id_a`, `id_b`) —
    * MinHash, SimHash, and embedding near-dup all produce one.
    *
    * Scale shape: the pair set and its connected components are the
    * (already bucket-confined) dedup machinery's output; this adds one
    * hash join of the corpus against the CC label map (|map| ≤ |docs
    * with a near-dup| ≪ corpus, so AQE broadcasts it in the common
    * case) and a per-row md5 projection. Adds `split_key` (the
    * representative — kept so audits can PROVE no cluster straddles
    * splits) and `split`. */
  def leakageSafeSplits(df: DataFrame, keyCol: String, pairs: DataFrame,
      splits: Seq[(String, Int)]): DataFrame = {
    // reserved-name collisions fail loudly; note the input may freely
    // carry a `cluster_id` (the dedup machinery's own output shape) —
    // the label map's columns are renamed before the join
    Seq("split_key", "__cc_id", "__cc_rep").foreach { c =>
      require(!df.columns.contains(c),
        s"input already has a $c column — rename it first")
    }
    // star CC, not label propagation: a deep near-dup CHAIN (a-b-c-...
    // incremental edits) has diameter ≈ cluster size, and this operator
    // exists for exactly the corpora where such chains occur
    val cc = Dedup.connectedComponentsStar(pairs)
      .select(col("id").as("__cc_id"), col("cluster_id").as("__cc_rep"))
    val withRep = df
      .join(cc, df(keyCol) === col("__cc_id"), "left")
      .withColumn("split_key", coalesce(col("__cc_rep"), df(keyCol)))
      .drop("__cc_id", "__cc_rep")
    assignSplits(withRep, "split_key", splits, portable = true)
  }
}
