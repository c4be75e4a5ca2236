package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators (SURVEY.md §2 C1-C4).
  *
  * Scale design: exact dedup is one keyed shuffle; MinHash-LSH generates
  * candidates only inside LSH buckets (a `groupBy(band, signature)`
  * shuffle — never a cross join); SimHash buckets on a 16-bit prefix.
  * All signature math is composed from codegen'd collection functions
  * (`transform`/`aggregate`/`xxhash64`), no UDFs.
  */
object Dedup {

  /** Default occupancy cap for LSH/band bucket pair generation.
    * Within-bucket pairing is quadratic in occupancy, so the cap bounds
    * a DEGENERATE bucket (a boilerplate mega-family collapsing into one
    * band value) at ~cap²/2 comparisons (~34M at 8192 — seconds on one
    * executor) before it degrades to linear hub-star edges. The r14
    * scale-stress audit showed the previous 100000 default put that
    * knee at ~5×10⁹ comparisons — hours of work the cap was supposed
    * to prevent (same defect class as Similarity.SemDedupMaxBucket,
    * fixed the same round). Healthy buckets never approach it. */
  val SaturationCap: Int = 8192

  // --------------------------------------------------------------- C1

  /** Exact dedup: keep the row with the smallest `tieBreaker` per
    * duplicate group. One shuffle on the key columns. */
  def exact(df: DataFrame, keyCols: Seq[String], tieBreaker: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tieBreaker))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  // --------------------------------------------------------------- C2

  /** MinHash signatures: `k` min-hashes over hashed w-token shingles,
    * computed by two tight-loop expressions (ShingleHashes + MinHashes,
    * ~20x the composed transform/aggregate formulation). `shingles` is
    * the distinct shingle-hash set (array<long>) used for exact Jaccard
    * verification. */
  def minhashSignatures(df: DataFrame, textCol: String, idCol: String,
      k: Int = 32, w: Int = 3): DataFrame =
    df.select(col(idCol),
        graft.functions.SignatureExpressions.shingle_hashes(
          TextAnalysis.tokens(col(textCol)), w).as("shingles"))
      .withColumn("minhashes",
        graft.functions.SignatureExpressions.minhashes(col("shingles"), k))

  /** LSH candidate pairs: split signatures into `bands` bands, bucket by
    * (band, band-signature-hash), emit doc pairs sharing a bucket, then
    * verify with true shingle Jaccard. Returns (id_a, id_b, jaccard)
    * for pairs with jaccard >= threshold.
    *
    * Bucket-occupancy bound (`maxBucket`): the all-pairs self-join is
    * O(f²) per bucket for a duplicate family of size f — a 10^6-copy
    * boilerplate family would emit 8×10^12 candidate rows across 8
    * bands. Buckets at or below `maxBucket` do all-pairs as before;
    * a SATURATED bucket degrades to star edges through its min-id
    * member (every member pairs with the hub), bounding per-bucket
    * work at O(maxBucket² + f) while keeping the whole bucket in one
    * connected component. Connectivity contract: saturated buckets are
    * near-identical duplicate families (an exact band match at r
    * hashes/band implies high expected Jaccard), so hub verification
    * passes for true dups; a member whose Jaccard clears `threshold`
    * against some member but not the hub can still pair in another
    * band's sub-cap bucket, and the C16 inverted-shingle chain
    * re-verifies edges independently downstream. */
  def minhashPairs(df: DataFrame, textCol: String, idCol: String,
      k: Int = 32, bands: Int = 8, w: Int = 3, threshold: Double = 0.5,
      maxBucket: Int = SaturationCap): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    val sigs = minhashSignatures(df, textCol, idCol, k, w).cache()
    val cand = minhashCandidates(sigs, idCol, k, bands, maxBucket)
    val sh = sigs.select(col(idCol).as("__id"), col("shingles"))
    cand
      .join(sh.withColumnRenamed("__id", "id_a").withColumnRenamed("shingles", "sh_a"), Seq("id_a"))
      .join(sh.withColumnRenamed("__id", "id_b").withColumnRenamed("shingles", "sh_b"), Seq("id_b"))
      .withColumn("jaccard", graft.functions.SignatureExpressions.round_half_up(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          greatest(size(array_union(col("sh_a"), col("sh_b"))), lit(1)).cast("double"), 4))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Unverified LSH candidate pairs from a [[minhashSignatures]] frame —
    * the bucketing half of [[minhashPairs]], factored out so its
    * occupancy bound is spec-testable. `sigs` must carry `idCol` and
    * `minhashes`. Candidate pairs always satisfy id_a < id_b.
    *
    * Plan shape: ONE occupancy window (count+min share the spec, so
    * Catalyst plans a single Window exec) feeding the LEFT join side
    * only — sub-cap members plus saturated-bucket hubs; the right side
    * is the raw (id, band, sig) explode with no window or sort. One
    * self-join then yields all i<j pairs for sub-cap buckets and the
    * |bucket|−1 hub star edges for saturated ones in the same pass
    * (the hub is the only left row of a saturated bucket). The r12 A/B
    * found the previous three-consumer shape re-ran the explode +
    * window 3× (~15% of pipeline_clean_corpus); this one runs it once.
    * See [[minhashPairs]] for the connectivity contract. */
  private[graft] def minhashCandidates(sigs: DataFrame, idCol: String,
      k: Int, bands: Int, maxBucket: Int): DataFrame = {
    val r = k / bands
    // bucket join carries only (id, band, sig) — candidate pairs stay
    // narrow; shingles are re-joined once per *unique* pair afterwards
    val bw = Window.partitionBy(col("band"), col("sig"))
    // one-pass codegen'd band hashes — value-equal to the previous
    // xxhash64(concat_ws(",", transform(slice(minhashes, b*r+1, r),
    // cast to string))) per band (pinned by OptEquivalenceSpec), whose
    // interpreted nested ArrayTransform was a measured profile leaf
    val banded = sigs.select(col(idCol).as("id"),
        posexplode(graft.functions.SignatureExpressions
          .band_signatures(col("minhashes"), bands, r)).as(Seq("band", "sig")))
    val left = banded
      .withColumn("__occ", count(lit(1)).over(bw))
      .withColumn("__hub", min(col("id")).over(bw))
      // saturated buckets keep ONLY their hub on the probe side, so a
      // 10^8-row degenerate bucket emits linear star edges, never a
      // quadratic cross product
      .filter(col("__occ") <= maxBucket || col("id") === col("__hub"))
      .select(col("id").as("id_a"), col("band"), col("sig"))
    val right = banded.select(col("id").as("id_b"), col("band"), col("sig"))
    left.join(right, Seq("band", "sig"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  // --------------------------------------------------------------- C3

  /** 64-bit SimHash over whitespace tokens: bit b of the signature is 1
    * iff the sum over token-hashes of ±1 (by bit b) is positive. One
    * tight-loop expression per row (SignatureExpressions.SimHash64). */
  def simhash(text: Column): Column = {
    graft.functions.SignatureExpressions.simhash64(TextAnalysis.tokens(text))
  }

  /** Portable 48-bit SimHash: token hash = first 12 hex chars of
    * md5(token) (exact in any engine with md5 — divisions by powers of
    * two are exact in binary floating point, and 48-bit values fit a
    * double's 53-bit mantissa, so the bit tests replay bit-identically
    * in SQL). One tight codegen'd loop per row
    * (SignatureExpressions.SimHashPortable48); it exists to make the
    * banded pair semantics oracle-checkable — the xxhash64 path stays
    * the production default. */
  def simhashPortable(text: Column): Column =
    graft.functions.SignatureExpressions.simhash_portable48(
      TextAnalysis.tokens(text))

  /** SimHash near-dup pairs, banded (Manku et al., WWW'07 "Detecting
    * Near-Duplicates for Web Crawling" §3): the 64-bit signature splits
    * into 4 disjoint 16-bit bands; documents pair when ANY band matches
    * exactly, then the full hamming distance filters. By pigeonhole, a
    * pair within hamming 3 always shares an intact band — recall is
    * GUARANTEED up to maxHamming 3 and decays gracefully beyond (a miss
    * needs a differing bit in every band). A single prefix bucket (the
    * previous shape) silently missed ~45% of true near-dups on the test
    * corpus. Candidate generation stays bucket-confined: cost is band
    * occupancy, never a cross join.
    *
    * With 4 disjoint bands the pigeonhole guarantee makes the emitted
    * set at `maxHamming <= 3` EXACTLY the brute-force hamming-ball pair
    * set — in `portable = true` mode (48-bit md5-derived signature,
    * [[simhashPortable]]) that set is replayable in SQL, which is what
    * the dedup_simhash oracle gate does.
    *
    * `maxBucket` is the same saturation backstop as [[minhashPairs]]'s
    * (this path had NONE until r14 — a boilerplate mega-family of
    * near-identical texts collapses into one (band, value) bucket and
    * went full all-pairs): a saturated bucket keeps only its min-id
    * hub on the probe side, emitting linear star edges. For a TRUE
    * duplicate family the hub is within `maxHamming` of every member
    * (near-identical signatures), so the family stays one component;
    * the exactness guarantee above holds verbatim for every bucket
    * under the cap, which at gate/corpus scales is all of them. */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 6, portable: Boolean = false,
      maxBucket: Int = SaturationCap): DataFrame = {
    val (sig, bits) =
      if (portable) (simhashPortable(col(textCol)), 48)
      else (simhash(col(textCol)), 64)
    simhashPairsOfSigs(df.select(col(idCol).as("id"), sig.as("sh")),
      bits, maxHamming, maxBucket)
  }

  /** [[simhashPairs]] fed from PRE-COMPUTED signatures — the reuse path
    * when an upstream pass (e.g. the C35 ingest stream) already paid
    * the shingle+simhash compute and persisted (id, sig): the banded
    * hamming join then runs off a NARROW (id, long) scan instead of
    * re-hashing every document's text. `bits` must match the producer
    * (48 = [[simhashPortable]], 64 = [[simhash]]); same saturation
    * window and pair contract as the from-text operator. */
  def simhashPairsFromSigs(sigs: DataFrame, idCol: String, sigCol: String,
      maxHamming: Int = 6, bits: Int = 48,
      maxBucket: Int = SaturationCap): DataFrame =
    simhashPairsOfSigs(
      sigs.select(col(idCol).as("id"), col(sigCol).as("sh")),
      bits, maxHamming, maxBucket)

  private def simhashPairsOfSigs(sigRows: DataFrame, bits: Int,
      maxHamming: Int, maxBucket: Int): DataFrame = {
    val bandBits = bits / 4
    val mask = (1L << bandBits) - 1
    val banded = sigRows
      .select(col("id"), col("sh"),
        posexplode(array((0 until 4).map(i =>
          shiftrightunsigned(col("sh"), bandBits * i).bitwiseAND(lit(mask))): _*))
          .as(Seq("band", "bval")))
    val bw = Window.partitionBy(col("band"), col("bval"))
    val a = banded
      .withColumn("__occ", count(lit(1)).over(bw))
      .withColumn("__hub", min(col("id")).over(bw))
      .filter(col("__occ") <= maxBucket || col("id") === col("__hub"))
      .select(col("id").as("id_a"), col("sh").as("sh_a"),
        col("band"), col("bval"))
    val b = banded.select(col("id").as("id_b"), col("sh").as("sh_b"),
      col("band"), col("bval"))
    a.join(b, Seq("band", "bval"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
      .distinct()
  }

  // -------------------------------------------------------------- C16

  /** Candidate pairs from an inverted shingle index: documents sharing
    * >= minShared distinct w-shingles, with stop-shingles (document
    * frequency > maxDf) dropped first. The scale shape: one shuffle to
    * build the index, a document-frequency filter that bounds bucket
    * sizes (the "the quick brown" problem), and a self-join confined to
    * rare shingles. */
  def shingleCandidates(df: DataFrame, textCol: String, idCol: String,
      w: Int = 3, maxDf: Int = 20, minShared: Int = 5): DataFrame = {
    val inv = df.select(col(idCol).as("id"),
      explode(graft.functions.SignatureExpressions.shingle_hashes(
        TextAnalysis.tokens(col(textCol)), w)).as("g"))
    val rare = inv.groupBy(col("g"))
      .agg(count(lit(1)).as("__df")).filter(col("__df") <= maxDf).select("g")
    val r = inv.join(rare, Seq("g"))
    val a = r.select(col("g"), col("id").as("id_a"))
    val b = r.select(col("g"), col("id").as("id_b"))
    a.join(b, Seq("g")).filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .select("id_a", "id_b")
  }

  /** Duplicate-cluster resolution by iterative min-label propagation —
    * the EXPLICITLY-CHOSEN shallow-graph fast path: each iteration is
    * one distributed join+aggregate, converging in O(component
    * diameter) rounds, which beats the star variant's constant factors
    * when clusters are provably shallow (verified near-dup families).
    * DEFAULT to [[connectedComponentsStar]] (O(log n) rounds,
    * diameter-independent) — every gate does since r20; this variant
    * fails LOUD (never wrong) past maxIter. Returns
    * (id, cluster_id = min reachable id), same contract as the star. */
  def connectedComponents(edges: DataFrame, idA: String = "id_a",
      idB: String = "id_b", maxIter: Int = 30): DataFrame = {
    // localCheckpoint: materializes AND truncates the logical lineage —
    // `und` would otherwise drag the whole upstream plan (e.g. a MinHash
    // pipeline) into every round's analysis, and labels would nest one
    // layer per round
    val und = edges.select(col(idA).as("src"), col(idB).as("dst"))
      .union(edges.select(col(idB).as("src"), col(idA).as("dst")))
      .localCheckpoint()
    var labels = und.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).localCheckpoint()
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val prop = und.join(labels, col("src") === col("id"))
        .select(col("dst").as("id"), col("label"))
      val next = labels.unionByName(prop)
        .groupBy(col("id")).agg(min(col("label")).as("label")).localCheckpoint()
      changed = next.join(labels.withColumnRenamed("label", "__old"), Seq("id"))
        .filter(col("label") =!= col("__old")).count()
      labels = next
      i += 1
    }
    // wrong-but-plausible cluster ids are worse than failing loud: a
    // component with diameter > maxIter would silently split — for deep
    // graphs use [[connectedComponentsStar]] (O(log n) rounds)
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds " +
          s"($changed labels still changing); raise maxIter or use " +
          "connectedComponentsStar")
    labels.withColumnRenamed("label", "cluster_id")
  }

  /** Connected components by the alternating large-star/small-star
    * algorithm (public MapReduce CC literature): converges in
    * O(log n) rounds regardless of component diameter — the deep-graph
    * path where plain label propagation's O(diameter) rounds don't
    * hold. Each round is two groupBy+join passes; hub neighborhoods
    * shrink monotonically (large-star hangs big neighbors under the
    * local min), so no collect_list of a hub's full adjacency ever
    * materializes. Returns (id, cluster_id = component min). */
  def connectedComponentsStar(edges: DataFrame, idA: String = "id_a",
      idB: String = "id_b", maxIter: Int = 25): DataFrame = {
    // canonical undirected pair set, larger endpoint first.
    // localCheckpoint (not cache) everywhere in the loop: caching only
    // substitutes at PHYSICAL planning, so the logical lineage would
    // still nest twice per round and blow up plan analysis after ~8
    // rounds; checkpointing truncates the plan to a LogicalRDD.
    var e = edges.select(
        greatest(col(idA), col(idB)).as("u"), least(col(idA), col(idB)).as("v"))
      .filter(col("u") =!= col("v")).distinct().localCheckpoint()
    val vertices = e.select(col("u").as("id"))
      .union(e.select(col("v").as("id"))).distinct().localCheckpoint()

    def checksum(d: DataFrame): (Long, Long) = {
      // bit_xor: order-independent and cannot overflow under ANSI mode
      val r = d.agg(count(lit(1)), bit_xor(xxhash64(col("u"), col("v")))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    def largeStar(d: DataFrame): DataFrame = {
      val nbrs = d.union(d.select(col("v").as("u"), col("u").as("v")))
      val m = nbrs.groupBy(col("u")).agg(min(col("v")).as("__minv"))
        .select(col("u").as("__c"), least(col("__minv"), col("u")).as("__m"))
      nbrs.filter(col("v") > col("u"))
        .join(m, col("u") === col("__c"))
        .select(col("v").as("u"), col("__m").as("v"))
        .filter(col("u") =!= col("v")).distinct()
    }

    def smallStar(d: DataFrame): DataFrame = {
      // d is (u, v) with v < u: neighbors-below plus self
      val m = d.groupBy(col("u")).agg(min(col("v")).as("__m"))
        .withColumnRenamed("u", "__c")
      val re = d.join(m, col("u") === col("__c"))
        .select(col("u"), col("v"), col("__m"))
      re.filter(col("v") =!= col("__m"))
        .select(col("v").as("u"), col("__m").as("v"))
        .union(re.select(col("u"), col("__m").as("v")))
        .filter(col("u") =!= col("v")).distinct()
    }

    var prev = checksum(e)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // eager checkpoint: materializes AND truncates lineage; the old
      // round's blocks are released by the ContextCleaner once the
      // previous DataFrame is unreferenced
      e = smallStar(largeStar(e)).localCheckpoint()
      val cs = checksum(e)
      converged = cs == prev
      prev = cs
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponentsStar did not converge in $maxIter rounds")
    // converged: e is a union of stars (u -> component min)
    vertices
      .join(e, vertices("id") === e("u"), "left")
      .select(col("id"), coalesce(col("v"), col("id")).as("cluster_id"))
  }

  // --------------------------------------------------------------- C4

  /** Brute n-gram Jaccard for a candidate pair set (id_a, id_b):
    * re-joins texts and computes exact Jaccard over hashed shingle sets
    * (identical to string-shingle Jaccard up to 2^-64 collisions). */
  def ngramJaccard(pairs: DataFrame, docs: DataFrame, textCol: String,
      idCol: String, w: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol).as("__id"),
      graft.functions.SignatureExpressions.shingle_hashes(
        TextAnalysis.tokens(col(textCol)), w).as("__sh"))
    val a = sh.as("sha")
    val b = sh.as("shb")
    pairs
      .join(a, col("id_a") === col("sha.__id"))
      .join(b, col("id_b") === col("shb.__id"))
      .withColumn("jaccard", graft.functions.SignatureExpressions.round_half_up(
        size(array_intersect(col("sha.__sh"), col("shb.__sh"))).cast("double") /
          greatest(size(array_union(col("sha.__sh"), col("shb.__sh"))), lit(1)).cast("double"), 4))
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  // -------------------------------------------------------------- C34

  /** Quality-aware dedup (SURVEY §2 C34): among each near-duplicate
    * cluster keep exactly ONE document — the member maximizing
    * `quality`, ties broken by the smallest id — and pass every
    * unclustered document through untouched. The pipeline-standard
    * "keep the best version" step after near-dup clustering: the
    * longest/cleanest copy survives, truncated or boilerplate shards
    * drop.
    *
    * Scale shape: `clusters` holds near-dup MEMBERS only, so the
    * quality join and the per-cluster argmax (row_number k=1 — the B33
    * TopKPerKey rule lowers it to a bounded heap) shuffle only the
    * members relation. The corpus pays one anti-join against the loser
    * set, whose size is CORPUS-PROPORTIONAL at realistic web-crawl
    * duplication rates (30-50% near-dup), so no broadcast is forced:
    * AQE converts the anti-join to a broadcast at runtime when the
    * built loser side is actually under `autoBroadcastJoinThreshold`,
    * and keeps a shuffle join when it is not — either way the plan
    * cannot OOM on a duplicate-heavy corpus. Callers that KNOW their
    * loser set is bounded (e.g. capped cluster counts) may force the
    * hint with `broadcastLosers = true`. */
  def keepBestPerCluster(docs: DataFrame, clusters: DataFrame,
      idCol: String, quality: Column,
      broadcastLosers: Boolean = false): DataFrame = {
    val q = docs.select(col(idCol).as("__kb_id"), quality.as("__kb_q"))
    val members = clusters
      .select(col(idCol).as("__kb_id"), col("cluster_id"))
      .join(q, Seq("__kb_id"))
    val winners = members
      .withColumn("__kb_rn", row_number().over(
        Window.partitionBy(col("cluster_id"))
          .orderBy(col("__kb_q").desc, col("__kb_id"))))
      .filter(col("__kb_rn") === 1)
      .select(col("__kb_id"))
    // losers = clustered docs that win NOWHERE. Defined as the
    // member-minus-winner difference (not "lost somewhere") so that
    // with overlapping memberships a doc winning any of its clusters
    // survives — every cluster keeps its argmax; CC partitions make
    // the two definitions coincide.
    val losers = members.select(col("__kb_id")).distinct()
      .join(winners, Seq("__kb_id"), "left_anti")
    val loserSide = if (broadcastLosers) broadcast(losers) else losers
    docs.join(loserSide, col(idCol) === col("__kb_id"), "left_anti")
  }
}
