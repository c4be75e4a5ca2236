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

  /** Exact double summation via Shewchuk nonoverlapping expansions
    * (Shewchuk 1997, GROW-EXPANSION + zero elimination): the running
    * sum is an array of doubles whose exact mathematical sum equals
    * the exact sum of every value added — commutative and
    * partition-layout-independent like the BigDecimal fold it
    * replaces, at a tiny fraction of the cost (`new BigDecimal(double)`
    * per row×dim was a measured hotspot of the Lloyd rounds; its exact
    * decimal expansion needs BigInteger.pow). Only the FINAL conversion
    * touches BigDecimal, through [[toBigDecimal]], so the divide /
    * rounding semantics (and hence every emitted centroid bit) are
    * unchanged. */
  private[operators] object ExactSum {
    val Cap = 40 // > (double exponent range) / 53 — not hit by full-width
    // components, but narrow-component expansions can theoretically
    // exceed it, so [[add]] grows the slot on demand instead of throwing

    /** Add `b` into expansion `es(i)(0..len)`; returns the new length.
      * Grows `es(i)` (Arrays.copyOf, 2×) when the expansion outgrows
      * it — exactness is never a capacity assumption. */
    def add(es: Array[Array[Double]], i: Int, len: Int, b: Double): Int = {
      var e = es(i)
      var q = b
      var newLen = 0
      var k = 0
      while (k < len) {
        val a = e(k)
        val s = a + q
        val bv = s - a
        val av = s - bv
        val err = (a - av) + (q - bv)
        if (err != 0.0) { e(newLen) = err; newLen += 1 }
        q = s
        k += 1
      }
      if (q != 0.0 || newLen == 0) {
        if (newLen >= e.length) {
          e = java.util.Arrays.copyOf(e, e.length << 1)
          es(i) = e
        }
        e(newLen) = q
        newLen += 1
      }
      newLen
    }

    /** Merge expansion `src(0..srcLen)` into `dsts(di)(0..dstLen)`. */
    def merge(dsts: Array[Array[Double]], di: Int, dstLen: Int,
        src: Array[Double], srcLen: Int): Int = {
      var len = dstLen
      var k = 0
      while (k < srcLen) { len = add(dsts, di, len, src(k)); k += 1 }
      len
    }

    /** The exact value as a BigDecimal (sum of the components' exact
      * decimal expansions — identical to the BigDecimal the per-value
      * fold would have produced, since both equal the exact sum). */
    def toBigDecimal(e: Array[Double], len: Int): java.math.BigDecimal = {
      var acc = java.math.BigDecimal.ZERO
      var k = 0
      while (k < len) { acc = acc.add(new java.math.BigDecimal(e(k))); k += 1 }
      acc
    }
  }

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
    // bounded broadcast: the ANN API contract is |queries| << |corpus|
    // (a probe set, not a second corpus) — all-pairs self-similarity
    // goes through lshTopK/selfSimilarPairs, never this cross join
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", graft.functions.SignatureExpressions.round_half_up(cosine(col("v_q"), col("v_c")), 4))
    rankTopK(scored, k, orderCol = "score", outCol = "score")
  }

  // -------------------------------------------------------------- C21

  /** Symmetric int8 quantization of an embedding column:
    * `q_i = floor(v_i · 127/max|v| + 0.5)` as `array<tinyint>` — 4×
    * smaller than float32 at rest and on the shuffle wire, which is the
    * change that matters when the corpus is 100 TB and every ANN stage
    * re-shuffles vectors. `floor(x + 0.5)` instead of `round` because it
    * replays bit-identically across engines (IEEE division and floor are
    * exact); an all-zero vector quantizes to zeros. */
  def quantize(vec: Column): Column = {
    val v = asDouble(vec)
    val maxAbs = array_max(transform(v, x => abs(x)))
    when(maxAbs === lit(0.0), transform(v, _ => lit(0).cast("tinyint")))
      .otherwise(transform(v,
        x => floor(x * (lit(127.0) / maxAbs) + lit(0.5)).cast("tinyint")))
  }

  /** Dot product of two quantized vectors in exact 64-bit integer math
    * (dim·127² ≪ 2⁶³ — no accumulation-order sensitivity at all). */
  def quantizedDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("long") * y.cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** Brute-force cosine top-k in the quantized domain: same plan shape
    * as [[cosineTopK]] (broadcast queries, keyed window — never a global
    * sort) but the corpus side carries int8 vectors and the score is an
    * exact integer dot over pre-computed integer norms, so the result is
    * fully deterministic and the per-pair work is integer-only. Emits
    * the raw integer dot alongside the rank. */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val c = corpus
      .select(col(idCol).as("neighbor_id"), quantize(col(vecCol)).as("q_c"))
      .withColumn("n_c", sqrt(quantizedDot(col("q_c"), col("q_c"))))
    val q = queries
      .select(col(idCol).as("query_id"), quantize(col(vecCol)).as("q_q"))
      .withColumn("n_q", sqrt(quantizedDot(col("q_q"), col("q_q"))))
    // bounded broadcast: query probe set (|queries| << |corpus|), int8
    // codes — 4x narrower than the float vectors on the wire
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("qdot", quantizedDot(col("q_q"), col("q_c")))
      // norm floor guards the all-zero vector (qcos would be 0/0 = NaN,
      // which Spark sorts FIRST desc while SQL engines return NULL —
      // a cross-engine rank divergence); mirrored in the gate oracle
      .withColumn("qcos",
        col("qdot") / greatest(col("n_q") * col("n_c"), lit(1e-12)))
    rankTopK(scored, k, orderCol = "qcos", outCol = "qdot")
  }

  /** Shared ranking epilogue for the ANN paths: per-`query_id` top-k by
    * `orderCol` desc (neighbor_id tie-break), keeping `outCol`. Built on
    * [[graft.plans.TopK.perKey]] so the `Filter(rnk <= k,
    * Window(row_number))` shape reaches the TopKFromWindow rule intact —
    * a Cast between Filter and Window silently loses the B33
    * spillable-heap plan (the long cast happens after the filter). */
  private def rankTopK(scored: DataFrame, k: Int, orderCol: String,
      outCol: String): DataFrame =
    graft.plans.TopK.perKey(scored, Seq(col("query_id")),
        Seq(col(orderCol).desc, col("neighbor_id")), k)
      .select(col("query_id"), col("rnk").cast("long").as("rnk"),
        col("neighbor_id"), col(outCol))

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

  /** Occupancy cap for hyperplane buckets — the [[Dedup.shingleCandidates]]
    * `maxDf` idea applied to sign buckets: a degenerate corpus (all
    * near-identical vectors, or a collapsed embedding space) piles every
    * row into one (tbl, bucket) and makes the candidate self-join
    * quadratic with no bound. Rows in buckets above `maxBucket` are
    * dropped IN-PLAN (a count window over the bucket key — one shuffle
    * that co-locates exactly what the candidate join needs next, no
    * eager driver jobs, no pinned checkpoint blocks); recall inside a
    * dropped bucket is 0 by construction, which is the documented LSH
    * trade — the exact paths ([[cosineTopK]], the verify stage) are
    * unaffected. */
  private def capBuckets(b: DataFrame, maxBucket: Int): DataFrame =
    b.withColumn("__occ",
        count(lit(1)).over(Window.partitionBy(col("tbl"), col("bucket"))))
      .filter(col("__occ") <= maxBucket)
      .drop("__occ")

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
      vecCol: String, k: Int, nPlanes: Int = 4, nTables: Int = 8,
      maxBucket: Int = 100000): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("v_c"))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("v_q"))
    val cB = capBuckets(
      c.select(col("neighbor_id"),
        tableBuckets(col("v_c"), nPlanes, nTables).as(Seq("tbl", "bucket"))),
      maxBucket)
    val qB = q.select(col("query_id"),
      tableBuckets(col("v_q"), nPlanes, nTables).as(Seq("tbl", "bucket")))
    // narrow id-only candidate rows; a pair colliding in several tables
    // is scored once. Bounded broadcasts: qB is L bucket rows per query
    // and q one vector per query — both |queries|-proportional, and the
    // ANN contract is |queries| << |corpus|
    val cand = cB.join(broadcast(qB), Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id")).distinct()
    val scored = cand.join(c, Seq("neighbor_id")).join(broadcast(q), Seq("query_id"))
      .withColumn("score", graft.functions.SignatureExpressions.round_half_up(cosine(col("v_q"), col("v_c")), 4))
    rankTopK(scored, k, orderCol = "score", outCol = "score")
  }

  /** Per-row nearest-centroid id (1-based) against a LITERAL centroid
    * table: k cosines + argmax inside one codegen'd projection — no
    * crossJoin, no per-row window, no shuffle. The k cosines are
    * UNROLLED into a plain `array(...)` rather than `transform` over an
    * array literal — higher-order functions are CodegenFallback, which
    * would drop the whole projection out of whole-stage codegen. Ties
    * break to the smallest centroid_id (array_position returns the
    * first match). */
  private def nearestCentroid(v: Column, cents: Seq[Seq[Double]]): Column =
    if (cents.length <= UnrollCellLimit) {
      val sims = array(cents.map(cv => cosine(v, typedLit(cv))): _*)
      array_position(sims, array_max(sims)).cast("long")
    } else
      // large-k path: tight-loop argmax expression — the unrolled
      // literal generates O(k) code and collapses at production cell
      // counts (10^4-10^5 IVF lists / SemDeDup cells); identical
      // arithmetic and tie-break, spec-pinned equal
      graft.functions.SignatureExpressions.nearest_cell(v,
        cents.map(_.toArray).toArray)

  /** Above this cell count, centroid assignment/probing switches from
    * the unrolled per-centroid literal projection (fastest to plan and
    * fully inlined for small k) to the tight-loop expressions. */
  private val UnrollCellLimit = 64

  /** Materialize a (centroid_id, v_cent) table to the driver in id
    * order — bounded: k rows of dim doubles, index metadata not data. */
  private def collectCentroids(centsDf: DataFrame): Seq[Seq[Double]] =
    centsDf.orderBy(col("centroid_id")).collect()
      .map(_.getAs[scala.collection.Seq[Double]]("v_cent").toIndexedSeq).toIndexedSeq

  /** Per-query probe list over `v_q`: the `nprobe` nearest centroid
    * ids, similarity desc with smallest-id tie-break (sort
    * struct(-sim, id) ascending) — a pure projection against the k·dim
    * centroid literal (no crossJoin, no window), ready to explode to
    * (query, centroid) rows. 1-based ids to match [[nearestCentroid]]. */
  private def probeIdsCol(cents: Seq[Seq[Double]], nprobe: Int): Column =
    if (cents.length <= UnrollCellLimit)
      transform(
        slice(
          array_sort(array(cents.zipWithIndex.map { case (cv, i) =>
            struct((-cosine(col("v_q"), typedLit(cv))).as("ns"),
              lit(i + 1).as("cid"))
          }: _*)),
          1, nprobe),
        s => s.getField("cid"))
    else
      graft.functions.SignatureExpressions.probe_cells(col("v_q"),
        cents.map(_.toArray).toArray, nprobe)

  /** Shared ADC scoring epilogue for the PQ family: drop self-pairs,
    * score by asymmetric distance (the round-to-6 cross-layout
    * determinism contract lives here and ONLY here), rank through the
    * B33 bounded heap. `cands` carries (query_id, neighbor_id, tbl,
    * codes).
    *
    * `refine > 0` adds the standard exact re-rank stage (FAISS
    * `RefineFlat` shape): ADC keeps the top `refine × k` candidates per
    * query, their FULL vectors are fetched by key join (refine·k rows
    * per query — query-proportional, the corpus itself still only ever
    * shipped codes), and exact cosine picks the final k. Quantization
    * error then only costs recall when a true neighbor falls outside
    * the ADC top-refine·k, not whenever ADC misorders the boundary. */
  private def adcRank(cands: DataFrame, ks: Int, k: Int, refine: Int = 0,
      corpusVecs: DataFrame = null, queryVecs: DataFrame = null): DataFrame = {
    import graft.functions.SignatureExpressions._
    val scored = cands.filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc_dist", graft.functions.SignatureExpressions.round_half_up(pq_adc(col("tbl"), col("codes"), ks), 6))
      .withColumn("score", -col("adc_dist"))
    if (refine <= 0) rankTopK(scored, k, orderCol = "score", outCol = "adc_dist")
    else {
      val pre = graft.plans.TopK.perKey(scored, Seq(col("query_id")),
          Seq(col("score").desc, col("neighbor_id")), refine * k)
        .select(col("query_id"), col("neighbor_id"), col("adc_dist"))
      // the CANDIDATE side broadcasts (refine·k rows per query —
      // query-proportional), so the corpus vector fetch streams the big
      // side exactly once; without the hint small-SF stats can invert
      // the build side, which would broadcast the corpus at scale
      val re = broadcast(pre).join(corpusVecs, Seq("neighbor_id"))
        .join(broadcast(queryVecs), Seq("query_id"))
        .withColumn("score", graft.functions.SignatureExpressions.round_half_up(cosine(col("v_q"), col("v_c")), 4))
      rankTopK(re, k, orderCol = "score", outCol = "adc_dist")
    }
  }

  /** Deterministic k-means centroids for IVF lists: init = the k rows
    * with the smallest id-hash, then `iters` Lloyd rounds.
    *
    * Trains on a deterministic hash-SAMPLE capped at `sampleCap` rows —
    * at the 100 TB design point you cluster a bounded sample once and
    * reuse the centroid table ([[ivfTopK]]'s `centroids` parameter),
    * you don't re-scan the corpus per query. Each round assigns rows
    * with [[nearestCentroid]] (a per-row projection against the k·dim
    * literal — no crossJoin, no window) and recomputes per-dimension
    * means with a decimal sum (exact, order-insensitive), so centroids
    * are bit-stable across partition layouts and cluster sizes — not
    * merely same-plan reproducible. Clusters that lose all members keep
    * their previous centroid. Returns (centroid_id, v_cent). */
  def kmeansCentroids(c: DataFrame, nLists: Int, iters: Int = 2,
      sampleCap: Long = 100000L): DataFrame = {
    val spark = c.sparkSession
    // ONE corpus pass returns both the row count (sizes the training
    // sample) and the k rows with the smallest id-hash (the init
    // centroids): a bounded per-partition selection folded with
    // treeAggregate — k·dim doubles of driver metadata, never corpus
    // data. Selection (not summation), so partition order can't change
    // the result (modulo astronomically-unlikely 64-bit hash ties,
    // matching the previous orderBy(hash).limit(k) semantics).
    // The per-partition fold is a bounded MAX-heap on the hash: a full
    // heap rejects most rows with one root compare, O(log k) only on
    // accept — the earlier sort-per-row formulation was O(k log k) per
    // ROW, which at production cell counts (k ≈ 10^5, the r14
    // scale-stress parameter law) would have made init selection
    // dominate training. Same selected set, same ascending-hash order.
    val heapOrd = Ordering.by[(Long, IndexedSeq[Double]), Long](_._1)
    def push(heap: scala.collection.mutable.PriorityQueue[(Long, IndexedSeq[Double])],
        t: (Long, IndexedSeq[Double])): Unit =
      if (heap.size < nLists) heap.enqueue(t)
      else if (t._1 < heap.head._1) { heap.dequeue(); heap.enqueue(t) }
    val (n, initHeap) = c
      .select(xxhash64(col("neighbor_id")).as("__h"), col("v_c"))
      .rdd.treeAggregate(
        (0L, scala.collection.mutable.PriorityQueue.empty[(Long, IndexedSeq[Double])](heapOrd)))(
        { case ((cnt, heap), row) =>
          push(heap, (row.getLong(0), row.getSeq[Double](1).toIndexedSeq))
          (cnt + 1, heap) },
        { case ((c1, h1), (c2, h2)) =>
          h2.foreach(push(h1, _)); (c1 + c2, h1) })
    val init = initHeap.toIndexedSeq.sortBy(_._1)
    val train =
      if (n > sampleCap) {
        // per-mille hash bucket keeps ~sampleCap rows; deterministic
        // per-row, stable under repartitioning and retries
        val keepPerMillion = math.max(1L, sampleCap * 1000000L / n)
        c.filter(pmod(xxhash64(col("neighbor_id")), lit(1000000L)) < keepPerMillion)
      } else c
    var cents: Seq[Seq[Double]] = init.map(_._2)
    // Each Lloyd round is ONE single-stage pass: per partition, assign
    // each row to its nearest centroid (argmax of k cosines, first-index
    // tie-break) and fold exact BigDecimal per-(centroid, dimension)
    // sums; merge is element-wise. BigDecimal addition of binary-exact
    // doubles is exact, hence commutative — centroids stay bit-stable
    // across partition layouts and cluster sizes (the round-2 ADVICE
    // guarantee), without shuffling sample×dim exploded rows the way a
    // posexplode/groupBy formulation would. Only k·dim decimals travel
    // per partition. Clusters that lose all members keep their previous
    // centroid.
    val dims = cents.headOption.map(_.length).getOrElse(0)
    for (_ <- 0 until iters if cents.nonEmpty) {
      val centArr: Array[Array[Double]] = cents.map(_.toArray).toArray
      val k = centArr.length
      // per-(centroid, dim) exact expansions (see ExactSum) — same
      // exact sums as the BigDecimal fold, BigDecimal only at the end
      def zero() = (
        Array.fill(k * dims)(new Array[Double](ExactSum.Cap)),
        new Array[Int](k * dims),
        new Array[Long](k))
      val (sums, lens, counts) = train.select(col("v_c"))
        .rdd.treeAggregate(zero())(
          { case ((s, sl, cnt), row) =>
            val v = row.getSeq[Double](0)
            var best = 0; var bestSim = Double.NegativeInfinity
            var j = 0
            while (j < k) {
              val cv = centArr(j)
              var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
              while (i < dims) {
                dot += v(i) * cv(i); na += v(i) * v(i); nb += cv(i) * cv(i); i += 1
              }
              val sim = dot / math.max(math.sqrt(na) * math.sqrt(nb), 1e-12)
              if (sim > bestSim) { bestSim = sim; best = j }
              j += 1
            }
            var i = 0
            while (i < dims) {
              val cell = best * dims + i
              sl(cell) = ExactSum.add(s, cell, sl(cell), v(i)); i += 1
            }
            cnt(best) += 1
            (s, sl, cnt) },
          { case ((s1, l1, c1), (s2, l2, c2)) =>
            var cell = 0
            while (cell < k * dims) {
              l1(cell) = ExactSum.merge(s1, cell, l1(cell), s2(cell), l2(cell))
              cell += 1
            }
            var j = 0
            while (j < k) { c1(j) += c2(j); j += 1 }
            (s1, l1, c1) })
      cents = cents.zipWithIndex.map { case (old, j) =>
        if (counts(j) == 0L) old // empty cluster keeps its centroid
        else (0 until dims).map(i =>
          ExactSum.toBigDecimal(sums(j * dims + i), lens(j * dims + i))
            .divide(java.math.BigDecimal.valueOf(counts(j)),
              java.math.MathContext.DECIMAL128).doubleValue)
      }
    }
    spark.createDataFrame(
      cents.zipWithIndex.map { case (v, i) => ((i + 1).toLong, v) })
      .toDF("centroid_id", "v_cent")
  }

  /** Two-level k-means for PRODUCTION cell counts. Flat Lloyd training
    * costs O(sample · k · dim · iters) — at the k ≈ 10⁵ the SemDeDup
    * parameter law itself demands ([[suggestedCells]]), that is ~10¹⁴
    * multiplies on a 10⁵-row sample: the trainer, not the dedup,
    * becomes the bottleneck. The standard escape is hierarchical
    * training: √k coarse cells trained flat, then each coarse cell's
    * sample rows trained LOCALLY into √k sub-centroids — total cost
    * O(sample · √k · dim · iters), a √k-fold cut (~316× at k = 10⁵).
    *
    * Scale shape: the corpus never moves — only the capped hash-sample
    * is assigned and grouped, and each `mapGroups` group holds
    * ~sample/√k rows and emits √k centroids (driver sees k·dim doubles
    * of metadata, as with the flat trainer). Determinism: the coarse
    * level reuses [[kmeansCentroids]] (bit-stable); local training
    * sorts each group by id-hash before a sequential double fold, so
    * FP addition order — and hence every centroid — is fixed under any
    * partitioning. Cells with fewer points than their sub-centroid
    * budget emit one centroid per point, so the result can total
    * slightly under `nLists` on skewed samples; callers treat `nLists`
    * as a target, not a contract (every consumer takes the centroid
    * TABLE). */
  def kmeansCentroidsHierarchical(c: DataFrame, nLists: Int,
      iters: Int = 2, sampleCap: Long = 100000L): DataFrame = {
    require(nLists >= 4, "hierarchical training needs nLists >= 4")
    val k1 = math.max(2, math.ceil(math.sqrt(nLists.toDouble)).toInt)
    val k2 = math.max(1, math.ceil(nLists.toDouble / k1).toInt)
    val coarse = collectCentroids(kmeansCentroids(c, k1, iters, sampleCap))
    val n = c.count()
    val train =
      if (n > sampleCap) {
        val keepPerMillion = math.max(1L, sampleCap * 1000000L / n)
        c.filter(pmod(xxhash64(col("neighbor_id")), lit(1000000L)) < keepPerMillion)
      } else c
    val spark = c.sparkSession
    import spark.implicits._
    val sub = train
      .select(nearestCentroid(col("v_c"), coarse).cast("int").as("__cell"),
        xxhash64(col("neighbor_id")).as("__h"), col("v_c"))
      .as[(Int, Long, Seq[Double])]
      .groupByKey(_._1)
      .flatMapGroups { (cell, it) =>
        val rows = it.map(t => (t._2, t._3.toArray)).toArray.sortBy(_._1)
        localLloyd(rows.map(_._2), k2, iters).zipWithIndex.map {
          case (v, j) => ((cell - 1).toLong * k2 + j + 1, v.toSeq) }
      }
    sub.toDF("centroid_id", "v_cent")
  }

  /** In-memory Lloyd over ONE coarse cell's sample rows (already
    * hash-sorted by the caller): init from the first k distinct-enough
    * points, cosine argmax with first-index tie-break (mirroring
    * [[nearestCentroid]]'s direction), empty clusters keep their
    * previous centroid. Sequential folds over the fixed row order keep
    * the result deterministic. */
  private def localLloyd(points: Array[Array[Double]], k: Int,
      iters: Int): Array[Array[Double]] = {
    if (points.isEmpty) return Array.empty
    val kk = math.min(k, points.length)
    val dims = points(0).length
    // init from the first kk DISTINCT-ENOUGH points (cosine < 0.9999 to
    // every already-chosen seed): a heavily-cloned cell would otherwise
    // seed several centroids on the same clone family, and duplicate
    // centroids never separate (argmax ties break to the lowest index,
    // so the copies receive no points and never move) — undercutting
    // the effective sub-centroid count exactly where SemDeDup needs it.
    // Cells with fewer distinct directions than kk fill the remaining
    // slots verbatim from the front (the old behavior); still a single
    // deterministic pass over the caller's hash-sorted order.
    val seeds = new Array[Array[Double]](kk)
    var nSeeds = 0
    var pi = 0
    while (pi < points.length && nSeeds < kk) {
      val p = points(pi)
      var dup = false; var s = 0
      while (s < nSeeds && !dup) {
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < dims) {
          dot += p(i) * seeds(s)(i); na += p(i) * p(i)
          nb += seeds(s)(i) * seeds(s)(i); i += 1
        }
        dup = dot / math.max(math.sqrt(na) * math.sqrt(nb), 1e-12) > 0.9999
        s += 1
      }
      if (!dup) { seeds(nSeeds) = p.clone(); nSeeds += 1 }
      pi += 1
    }
    pi = 0
    while (nSeeds < kk) { seeds(nSeeds) = points(pi).clone(); nSeeds += 1; pi += 1 }
    var cents = seeds
    for (_ <- 0 until iters) {
      val sums = Array.ofDim[Double](kk, dims)
      val counts = new Array[Long](kk)
      points.foreach { p =>
        var best = 0; var bestSim = Double.NegativeInfinity; var j = 0
        while (j < kk) {
          var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
          while (i < dims) {
            dot += p(i) * cents(j)(i); na += p(i) * p(i)
            nb += cents(j)(i) * cents(j)(i); i += 1
          }
          val sim = dot / math.max(math.sqrt(na) * math.sqrt(nb), 1e-12)
          if (sim > bestSim) { bestSim = sim; best = j }
          j += 1
        }
        var i = 0
        while (i < dims) { sums(best)(i) += p(i); i += 1 }
        counts(best) += 1
      }
      cents = Array.tabulate(kk)(j =>
        if (counts(j) == 0L) cents(j)
        else Array.tabulate(dims)(i => sums(j)(i) / counts(j)))
    }
    cents
  }

  /** IVF-flat ANN: k-means centroid vectors partition the corpus into
    * inverted lists (assignment = nearest centroid); each query probes
    * its `nprobe` closest lists and exact-ranks within them.
    *
    * Pass `centroids` (a (centroid_id, v_cent) table, e.g. a persisted
    * [[kmeansCentroids]] result) to skip training entirely — the
    * 100 TB shape, where the index is built once and served many times.
    * Without it, training runs on a hash-sample capped at `sampleCap`.
    * Assignment and probe selection are per-row projections against the
    * k·dim centroid literal (no crossJoin, no window); the only
    * remaining joins are the probed-list join (≈ nprobe/nLists of the
    * corpus per query) and the final top-k window per query. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nLists: Int = 16, nprobe: Int = 4,
      kmeansIters: Int = 2, centroids: Option[DataFrame] = None,
      sampleCap: Long = 100000L): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("v_c"))
    val centsDf = centroids.getOrElse(kmeansCentroids(c, nLists, kmeansIters, sampleCap))
    val cents = collectCentroids(centsDf)
    val assigned = c.withColumn("centroid_id", nearestCentroid(col("v_c"), cents))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("v_q"))
    val probes = q.withColumn("pr", explode(probeIdsCol(cents, nprobe)))
      .select(col("query_id"), col("v_q"), col("pr").cast("long").as("centroid_id"))
    // bounded broadcast: nprobe rows per query (probe lists), so size
    // is |queries| x nprobe — query-proportional, never corpus-sized
    val scored = assigned.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", graft.functions.SignatureExpressions.round_half_up(cosine(col("v_q"), col("v_c")), 4))
    rankTopK(scored, k, orderCol = "score", outCol = "score")
  }

  // --------------------------------------------------------------- C5

  /** Embedding near-duplicates: pairs with cosine >= threshold, found
    * inside multi-table LSH buckets (bucket join in any of `nTables`
    * tables — never a cross join), deduped to id-only rows, then
    * exact-cosine verified. At threshold 0.8 (θ≈37°), 6 planes × 8
    * tables give pair recall ≈ 0.9; the exact filter keeps precision
    * at 1 regardless of the bucket tuning. */
  def embeddingNearDup(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, nPlanes: Int = 6, nTables: Int = 8,
      maxBucket: Int = SemDedupMaxBucket): DataFrame = {
    val v = df.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val b = v.select(col("id"),
      tableBuckets(col("v"), nPlanes, nTables).as(Seq("tbl", "bucket")))
    // saturation: occupancy window on the LEFT side of the self-join
    // only (the [[semanticDedupByCell]] shape) — a (tbl, bucket) above
    // `maxBucket` keeps just its min-id hub there, so a near-identical
    // family of any size degrades to LINEAR hub-star edges (the hub
    // pairs with every member and id_a < id_b holds since the hub is
    // the minimum) instead of either all-pairs blowup or — the r14
    // regression this replaces — dropping the bucket wholesale and
    // silently emitting zero pairs for exactly the corpora dedup
    // exists for
    val bw = Window.partitionBy(col("tbl"), col("bucket"))
    val left = b
      .withColumn("__occ", count(lit(1)).over(bw))
      .withColumn("__hub", min(col("id")).over(bw))
      .filter(col("__occ") <= maxBucket || col("id") === col("__hub"))
      .select(col("tbl"), col("bucket"), col("id").as("id_a"))
    val cand = left
      .join(b.select(col("tbl"), col("bucket"), col("id").as("id_b")),
        Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    cand
      .join(v.select(col("id").as("id_a"), col("v").as("v_a")), Seq("id_a"))
      .join(v.select(col("id").as("id_b"), col("v").as("v_b")), Seq("id_b"))
      .withColumn("cosine", graft.functions.SignatureExpressions.round_half_up(cosine(col("v_a"), col("v_b")), 4))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** Semantic deduplication (SemDeDup shape, Abbas et al. 2023):
    * partition the embedding space into buckets, connect within-bucket
    * pairs with cosine >= `threshold` into components, and keep ONE
    * representative per component (the smallest id) plus every
    * unbucketed-duplicate-free vector — the "drop semantically
    * redundant copies" step a training pipeline runs on embeddings
    * rather than text. Returns (idCol, n_members): each kept id with
    * its component size (1 if it had no near-semantic neighbor).
    *
    * Bucketing is the SIGN PATTERN of the first `signDims` dimensions
    * — an axis-aligned locality partition that is a pure per-row
    * projection and replays exactly in any engine (the gate's oracle
    * recomputes it in SQL), standing in for SemDeDup's k-means cells;
    * like those cells it bounds the candidate set, and cross-bucket
    * near-duplicates are accepted misses — the documented SemDeDup
    * contract, not a bug. Scale shape mirrors [[embeddingNearDup]]:
    * raise `signDims` so expected occupancy stays bounded (2^B cells),
    * and the single occupancy window keeps a degenerate bucket (e.g.
    * all-zero embeddings) linear — saturated buckets verify only
    * against their min-id hub. Components come from the O(log n)
    * large-star/small-star CC, so deep chains cannot stall the round
    * count. */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.3, signDims: Int = 4,
      maxBucket: Int = SemDedupMaxBucket): DataFrame = {
    require(signDims >= 1 && signDims <= 30, "signDims in [1,30]")
    val v = df.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val bucketExpr = (0 until signDims).map(i =>
      when(element_at(col("v"), i + 1) > 0,
        lit(1 << (signDims - 1 - i))).otherwise(lit(0)))
      .reduce(_ + _)
    semanticDedupByCell(v, idCol, bucketExpr, threshold, maxBucket)
  }

  /** Semantic dedup over TRAINED k-means cells — the actual SemDeDup
    * structure (Abbas et al. 2023 cluster the embedding space with
    * k-means and dedup within clusters). `cents` is a pinned
    * [[kmeansCentroids]] result (train once on a bounded sample, serve
    * every corpus pass — and a PINNED literal is what lets an external
    * oracle replay the assignment exactly). Cell assignment is the
    * codegen'd [[nearestCentroid]] argmax with sims rounded to 4
    * decimals first, so the argmax replays identically in engines whose
    * last-ulp cosine may differ; ties break to the smallest cell id.
    * Scales past the sign-pattern variant: k chooses the cell count
    * directly (production SemDeDup wants ~10^5 cells; signDims caps at
    * 2^30 structurally but saturates maxBucket long before), and cell
    * geometry follows the data rather than axis signs.
    *
    * COST LAW (measured, docs/SCALE_STRESS.md): within-cell pairing is
    * all-pairs, so total edge work is Θ(k · occ²) = Θ(n²/k) at mean
    * occupancy occ = n/k. Holding k fixed while the corpus grows is
    * therefore QUADRATIC — the r14 10×→100× stress run showed exactly
    * that (184× time for 100× data at a fixed 16 cells). Linearity
    * requires the SemDeDup discipline of scaling the cell count with
    * the corpus: k ≈ n / targetOcc (see [[suggestedCells]]) keeps
    * occupancy — and hence per-cell work — constant, making the total
    * Θ(n · occ). `maxBucket` is the BACKSTOP for degenerate cells
    * (near-identical mass the training couldn't split), not the
    * primary control: a saturated cell degrades to hub-star edges. */
  def semanticDedupKMeans(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, cents: Seq[Seq[Double]],
      maxBucket: Int = SemDedupMaxBucket): DataFrame = {
    require(cents.nonEmpty, "semanticDedupKMeans needs centroids")
    val v = df.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val cell =
      if (cents.length <= UnrollCellLimit) {
        val sims = array(cents.map(cv =>
          graft.functions.SignatureExpressions.round_half_up(cosine(col("v"), typedLit(cv)), 4)): _*)
        array_position(sims, array_max(sims)).cast("long")
      } else
        // production SemDeDup cell counts (~10^5): tight-loop argmax
        // with the SAME round-4 HALF_UP per-cosine contract
        graft.functions.SignatureExpressions.nearest_cell(col("v"),
          cents.map(_.toArray).toArray, roundTo = 4)
    semanticDedupByCell(v, idCol, cell, threshold, maxBucket)
  }

  /** Default occupancy cap for the SemDeDup variants. Within-cell work
    * is quadratic in occupancy, so the cap bounds a DEGENERATE cell's
    * cost at ~maxBucket²/2 comparisons (8192 → ~34M cosines, seconds on
    * one executor) before it degrades to linear hub-star edges. The
    * previous 100000 default put the knee at ~5×10⁹ comparisons per
    * cell — hours of work the cap was supposed to prevent; the r14
    * scale-stress run is what surfaced it. Correctly-parameterized
    * corpora (occ ≈ 200–1000 via [[suggestedCells]]) never reach it. */
  val SemDedupMaxBucket: Int = 8192

  /** The SemDeDup parameter law: cells for corpus size `n` at a target
    * mean occupancy (default 500). Keeps within-cell all-pairs work
    * linear in n; see the cost law at [[semanticDedupKMeans]]. */
  def suggestedCells(n: Long, targetOcc: Int = 500): Int =
    math.max(16L, math.min(1L << 20, n / math.max(1, targetOcc))).toInt

  /** Shared SemDeDup body: within-cell threshold edges (occupancy-
    * capped), O(log n) star CC, keep each component's smallest id with
    * its size. `v` carries (id, v); `bucketExpr` is the cell id. */
  private def semanticDedupByCell(v: DataFrame, idCol: String,
      bucketExpr: Column, threshold: Double, maxBucket: Int): DataFrame = {
    val b = v.withColumn("bucket", bucketExpr)
    // the r12 minhash single-window shape: occupancy window on the
    // LEFT side only; saturated buckets keep just their hub there
    val bw = Window.partitionBy(col("bucket"))
    val left = b
      .withColumn("__occ", count(lit(1)).over(bw))
      .withColumn("__hub", min(col("id")).over(bw))
      .filter(col("__occ") <= maxBucket || col("id") === col("__hub"))
      .select(col("id").as("id_a"), col("bucket"), col("v").as("v_a"))
    val right = b.select(col("id").as("id_b"), col("bucket"), col("v").as("v_b"))
    val edges = left.join(right, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", graft.functions.SignatureExpressions.round_half_up(cosine(col("v_a"), col("v_b")), 4))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"))
    val cc = graft.operators.Dedup.connectedComponentsStar(edges)
    val losers = cc.filter(col("id") =!= col("cluster_id"))
      .select(col("id").as("__loser"))
    val sizes = cc.groupBy(col("cluster_id")).agg(count(lit(1)).as("__n"))
    v.join(losers, col("id") === col("__loser"), "left_anti")
      .join(sizes, col("id") === col("cluster_id"), "left")
      .select(col("id").as(idCol), coalesce(col("__n"), lit(1L)).as("n_members"))
  }

  // -------------------------------------------------------------- C30

  /** Deterministic product-quantization codebooks (Jégou et al. 2011):
    * the vector space splits into `m` subspaces of dim/m dimensions,
    * each clustered independently into `ks` sub-centroids — a vector
    * then compresses to m small codes (here m·log2(ks) bits vs dim·32
    * for raw floats: 16-64× smaller at rest AND on every shuffle, far
    * past int8's 4×, which is what lets a 100 TB embedding corpus fit
    * an in-memory ANN scan).
    *
    * Same train-once discipline as [[kmeansCentroids]]: a capped
    * deterministic hash-sample, init from the ks smallest-id-hash rows,
    * and Lloyd rounds folding exact BigDecimal per-(subspace, centroid,
    * dimension) sums in ONE treeAggregate per round (all m subspaces
    * together) — codebooks are bit-stable across partition layouts.
    * Vectors are L2-normalized first so squared-L2 ADC ranking equals
    * cosine ranking. Returns the flattened (m × ks × dsub) codebook —
    * k·dim doubles of driver metadata, reusable across queries. */
  def pqCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int = 32, ks: Int = 32, iters: Int = 2,
      sampleCap: Long = 100000L,
      residualCents: Option[Seq[Seq[Double]]] = None): Array[Double] = {
    def normalize(v: Seq[Double]): Array[Double] = {
      val a = v.toArray
      val n = math.sqrt(a.map(x => x * x).sum)
      if (n > 0) a.map(_ / n) else a
    }
    // Residual mode (IVF-PQ, Jégou et al. 2011 §IV): train the
    // sub-codebooks on `normalize(v) − nearestUnitCentroid(v)` instead
    // of the vector itself. Residuals are an order of magnitude smaller
    // than the vectors, so the same ks sub-centroids quantize them far
    // more finely — the recall lift that justifies the per-(query,
    // probed-list) ADC table cost. Assignment here (max dot over unit
    // centroids, first-index tie-break) matches [[nearestCentroid]]'s
    // cosine argmax exactly, so train-time and encode-time residuals
    // agree.
    val centArr: Array[Array[Double]] =
      residualCents.map(_.map(_.toArray).toArray).getOrElse(Array.empty)
    def prep(v: Seq[Double]): Array[Double] = {
      val x = normalize(v)
      if (centArr.isEmpty) x
      else {
        var best = 0; var bestS = Double.NegativeInfinity; var j = 0
        while (j < centArr.length) {
          val cv = centArr(j)
          var d = 0.0; var i = 0
          while (i < x.length) { d += x(i) * cv(i); i += 1 }
          if (d > bestS) { bestS = d; best = j }
          j += 1
        }
        val r = x.clone()
        var i = 0
        while (i < r.length) { r(i) -= centArr(best)(i); i += 1 }
        r
      }
    }
    val rows = corpus.select(xxhash64(col(idCol)).as("__h"),
      transform(col(vecCol), x => x.cast("double")).as("__v"))
    val (n, init) = rows.rdd
      .treeAggregate((0L, Vector.empty[(Long, Array[Double])]))(
        { case ((cnt, acc), row) =>
          val t = (row.getLong(0), prep(row.getSeq[Double](1)))
          (cnt + 1, (acc :+ t).sortBy(_._1).take(ks)) },
        { case ((c1, a1), (c2, a2)) =>
          (c1 + c2, (a1 ++ a2).sortBy(_._1).take(ks)) })
    require(init.nonEmpty, "pqCodebooks: empty corpus")
    val dim = init.head._2.length
    require(dim % m == 0, s"dim $dim must be divisible by m=$m")
    val dsub = dim / m
    // cb(s)(c)(j) flattened to (s * ks + c) * dsub + j
    var cb = new Array[Double](m * ks * dsub)
    init.zipWithIndex.foreach { case ((_, v), c) =>
      var s = 0
      while (s < m) {
        System.arraycopy(v, s * dsub, cb, (s * ks + c) * dsub, dsub)
        s += 1
      }
    }
    // fewer init rows than ks: duplicate the last so every code is valid
    if (init.length < ks) (init.length until ks).foreach { c =>
      var s = 0
      while (s < m) {
        System.arraycopy(cb, (s * ks + init.length - 1) * dsub,
          cb, (s * ks + c) * dsub, dsub)
        s += 1
      }
    }
    val train =
      if (n > sampleCap) {
        val keepPerMillion = math.max(1L, sampleCap * 1000000L / n)
        rows.filter(pmod(col("__h"), lit(1000000L)) < keepPerMillion)
      } else rows
    for (_ <- 0 until iters) {
      val cbNow = cb
      // exact expansions per (subspace·code, dim) — see ExactSum
      def zero() = (Array.fill(m * ks * dsub)(new Array[Double](ExactSum.Cap)),
        new Array[Int](m * ks * dsub),
        new Array[Long](m * ks))
      val (sums, lens, counts) = train.select(col("__v")).rdd.treeAggregate(zero())(
        { case ((sm, sl, cnt), row) =>
          val x = prep(row.getSeq[Double](0))
          var s = 0
          while (s < m) {
            var best = 0
            var bestD = Double.MaxValue
            var c = 0
            while (c < ks) {
              val base = (s * ks + c) * dsub
              // running bound — abandoning at bestD is bit-identical
              // under strict-< (terms >= 0, same addition order)
              var d = 0.0
              var j = 0
              while (j < dsub && d < bestD) {
                val diff = x(s * dsub + j) - cbNow(base + j)
                d += diff * diff
                j += 1
              }
              if (d < bestD) { bestD = d; best = c }
              c += 1
            }
            val cell = s * ks + best
            cnt(cell) += 1
            var j = 0
            while (j < dsub) {
              val e = cell * dsub + j
              sl(e) = ExactSum.add(sm, e, sl(e), x(s * dsub + j))
              j += 1
            }
            s += 1
          }
          (sm, sl, cnt) },
        { case ((s1, l1, c1), (s2, l2, c2)) =>
          var i = 0
          while (i < s1.length) {
            l1(i) = ExactSum.merge(s1, i, l1(i), s2(i), l2(i)); i += 1
          }
          i = 0
          while (i < c1.length) { c1(i) += c2(i); i += 1 }
          (s1, l1, c1) })
      val next = cb.clone()
      var cell = 0
      while (cell < m * ks) {
        if (counts(cell) > 0) {
          var j = 0
          while (j < dsub) {
            next(cell * dsub + j) = ExactSum
              .toBigDecimal(sums(cell * dsub + j), lens(cell * dsub + j))
              .divide(new java.math.BigDecimal(counts(cell)),
                java.math.MathContext.DECIMAL64).doubleValue()
            j += 1
          }
        } // empty cluster keeps its previous sub-centroid
        cell += 1
      }
      cb = next
    }
    cb
  }

  /** PQ-ANN top-k (asymmetric distance): corpus vectors compress to m
    * codes against the codebook (one codegen'd projection); each query
    * precomputes its m×ks ADC lookup table once; scoring a pair is m
    * table lookups — no vector math on the corpus side and only CODES
    * on the shuffle wire. Ranking rides the B33 bounded heap. Recall
    * < 1 by construction (quantization error); [[cosineTopK]] is the
    * exact baseline and the `sim_pq_recall` gate pins the floor. Pass
    * a pre-trained `codebook` in production — train once, serve many. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, m: Int = 32, ks: Int = 32,
      codebook: Option[Array[Double]] = None, refine: Int = 0): DataFrame = {
    import graft.functions.SignatureExpressions._
    val cb = codebook.getOrElse(pqCodebooks(corpus, idCol, vecCol, m, ks))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("v_c"))
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("v_q"))
    val enc = c.select(col("neighbor_id"),
      pq_encode(col("v_c"), cb, m, ks).as("codes"))
    val qt = q.select(col("query_id"),
      pq_adc_table(col("v_q"), cb, m, ks).as("tbl"))
    // bounded broadcast: one m x ks float ADC table per query —
    // |queries|-proportional (ANN contract: |queries| << |corpus|)
    adcRank(enc.crossJoin(broadcast(qt)), ks, k, refine, c, q)
  }

  // ----------------------------------------------------------- C7+C30

  /** IVF-PQ top-k — the standard production ANN at corpus scale
    * (Jégou et al. 2011, the FAISS `IVFx,PQy` shape): IVF centroids
    * route each query to its `nprobe` nearest inverted lists, and only
    * that sliver of the corpus is scored, by PQ asymmetric distance —
    * m table lookups per candidate, never vector math.
    *
    * Composition of [[ivfTopK]]'s routing with [[pqTopK]]'s codes:
    *  - the corpus side is ONE projection emitting (id, centroid_id,
    *    m codes) — centroid assignment and PQ encoding fused, so the
    *    probed-list join shuffles m bytes of codes per row, not dim
    *    floats (the 25×+ wire shrink that makes the 100 TB scan fit);
    *  - codes are NON-residual by default (encode v, not v − centroid),
    *    so one codebook serves every list and each query needs a single
    *    ADC table regardless of how many lists it probes. `residual =
    *    true` switches to residual encoding (one ADC table per (query,
    *    probed list) — still query-proportional): the standard win on
    *    CLUSTERED corpora, but measured WORSE on near-isotropic
    *    embeddings (tools/AnnTune: 0.55 → 0.46 at sf0.1), where
    *    centroids are weak and residuals are as large as the vectors —
    *    choose per corpus geometry;
    *  - `refine = R > 0` adds the exact re-rank stage (FAISS RefineFlat
    *    shape): ADC keeps top R·k per query, full vectors are fetched
    *    for just those R·k rows, exact cosine picks the final k —
    *    measured recall@10 0.55 → 0.75 at sf0.1 for nprobe=8/refine=3,
    *    nearly saturating the routing bound, at query-proportional
    *    extra cost;
    *  - both the centroid table and the codebook accept pre-trained
    *    inputs (`centroids`, `codebook`) — train once on a bounded
    *    hash-sample, serve many queries, the [[kmeansCentroids]] /
    *    [[pqCodebooks]] discipline.
    *
    * Recall < 1 by construction (routing loss × quantization error);
    * [[cosineTopK]] is the exact baseline and the `sim_ivfpq_recall`
    * gate pins the floor. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nLists: Int = 16, nprobe: Int = 4,
      m: Int = 32, ks: Int = 32, kmeansIters: Int = 2,
      centroids: Option[DataFrame] = None,
      codebook: Option[Array[Double]] = None,
      sampleCap: Long = 100000L, residual: Boolean = false,
      refine: Int = 0): DataFrame = {
    import graft.functions.SignatureExpressions._
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("v_c"))
    val centsDf = centroids.getOrElse(kmeansCentroids(c, nLists, kmeansIters, sampleCap))
    val cents = collectCentroids(centsDf)
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("v_q"))
    if (residual) {
      // RESIDUAL IVF-PQ (Jégou et al. 2011 §IV, the FAISS default):
      // encode v − c(v) in the unit-normalized space against a
      // residual-trained codebook. Residual magnitudes ≪ vector
      // magnitudes, so quantization error drops sharply (measured
      // recall@10 lift documented at the sim_ivfpq_recall gate). The
      // cost is one ADC table per (query, probed list) instead of one
      // per query — still |queries| × nprobe × (m × ks) broadcast
      // floats, query-proportional, never corpus-sized.
      val centsN: Seq[Seq[Double]] = cents.map { cv =>
        val n = math.sqrt(cv.map(x => x * x).sum)
        if (n > 0) cv.map(_ / n) else cv
      }
      val centsLit = typedLit(centsN.map(_.toIndexedSeq).toIndexedSeq)
      val cb = codebook.getOrElse(pqCodebooks(corpus, idCol, vecCol, m, ks,
        sampleCap = sampleCap, residualCents = Some(centsN)))
      val enc = c
        .withColumn("centroid_id", nearestCentroid(col("v_c"), cents))
        .select(col("neighbor_id"), col("centroid_id"),
          pq_encode_res(col("v_c"),
            element_at(centsLit, col("centroid_id").cast("int")),
            cb, m, ks).as("codes"))
      val probes = q
        .withColumn("pr", explode(probeIdsCol(cents, nprobe)))
        .withColumn("centroid_id", col("pr").cast("long"))
        .select(col("query_id"), col("centroid_id"),
          pq_adc_table_res(col("v_q"),
            element_at(centsLit, col("centroid_id").cast("int")),
            cb, m, ks).as("tbl"))
      adcRank(enc.join(broadcast(probes), Seq("centroid_id")), ks, k,
        refine, c, q)
    } else {
      val cb = codebook.getOrElse(pqCodebooks(corpus, idCol, vecCol, m, ks, sampleCap = sampleCap))
      // corpus: route + encode in one pass; only (id, centroid_id, codes)
      // ever leaves the scan
      val enc = c.select(col("neighbor_id"),
        nearestCentroid(col("v_c"), cents).as("centroid_id"),
        pq_encode(col("v_c"), cb, m, ks).as("codes"))
      // per-query probe lists (the shared ivfTopK projection), each
      // carrying the query's ONE ADC table (non-residual codes: one
      // codebook serves every list, so one table per query suffices)
      val probes = q
        .withColumn("tbl", pq_adc_table(col("v_q"), cb, m, ks))
        .withColumn("pr", explode(probeIdsCol(cents, nprobe)))
        .select(col("query_id"), col("tbl"),
          col("pr").cast("long").as("centroid_id"))
      // bounded broadcast: nprobe rows per query, each one ADC table —
      // |queries| x nprobe x (m x ks floats), query-proportional
      adcRank(enc.join(broadcast(probes), Seq("centroid_id")), ks, k,
        refine, c, q)
    }
  }
}
