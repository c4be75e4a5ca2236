package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OperatorsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog and runs far away home tonight"

  test("repeatedSpans finds cross-doc spans, counts multiplicity (C28)") {
    val boiler = "all rights reserved contact us for more information today"
    val df = Seq(
      (1L, s"alpha beta $boiler gamma"),
      (2L, s"delta $boiler epsilon zeta"),
      (3L, s"unrelated text with no repeated content at all whatsoever here"),
      // doc 4 repeats the boilerplate TWICE within one doc, plus its
      // own internal-only repeated phrase
      (4L, s"$boiler and again $boiler"),
      (5L, "one two three four five six seven eight nine stop " +
        "one two three four five six seven eight nine")).toDF("doc_id", "text")
    val spans = Spans.repeatedSpans(df, w = 9, minDocs = 2).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // the 9-token boilerplate appears once in docs 1,2 and twice in 4
    val md = java.security.MessageDigest.getInstance("MD5")
    val key = md.digest(boiler.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(spans.contains(key), s"missing boilerplate span in ${spans.keys}")
    assert(spans(key) == ((4L, 3L, 1L)), s"got ${spans(key)}")
    // no span unique to one document leaks through minDocs
    val all = Spans.repeatedSpans(df, w = 9, minDocs = 2)
      .agg(min("n_docs")).head.getLong(0)
    assert(all >= 2)
    // within-doc-only repetition (minDocs=1) IS visible when asked for:
    // doc 5's nine-token phrase repeats internally and nowhere else
    val withinDoc = Spans.repeatedSpans(df, w = 9, minDocs = 1)
      .filter(col("n_occurrences") >= 2 && col("n_docs") === 1).count()
    assert(withinDoc > 0, "doc-5 internal repeats must surface at minDocs=1")
  }

  test("bloomDecontaminate equals the exact join; bloom actually prunes (C29)") {
    val probeText = "the secret benchmark question about quantum gravity"
    val docs = (1L to 200L).map { i =>
      val t = if (i % 50 == 0) s"leaked copy: $probeText appears here"
        else s"clean document number $i with its own distinct words w$i x$i y$i z$i"
      (i, t)
    }.toDF("doc_id", "text")
    val probes = Seq((1L, probeText)).toDF("probe_id", "text")
    val out = Spans.bloomDecontaminate(docs, probes, threshold = 0.3)
    val rows = out.select("doc_id", "bloom_hit", "contaminated").collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2))).toMap
    // exact answer: exactly the 4 leaked docs
    val contaminated = rows.filter(_._2._2).keys.toSet
    assert(contaminated == Set(50L, 100L, 150L, 200L))
    // matches the full-join operator (the Bloom gate loses nothing)
    val exactKept = Contamination.decontaminate(docs, probes, threshold = 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rows.filterNot(_._2._2).keys.toSet == exactKept)
    // contaminated ⇒ bloom-flagged, and the filter prunes most of the
    // clean corpus from the verification join
    assert(rows.filter(_._2._2).forall(_._2._1), "no false negatives")
    val flagged = rows.count(_._2._1)
    assert(flagged < 50, s"bloom should prune most clean docs, flagged=$flagged")
  }

  test("source-level curation profiles and filters by origin quality (C31)") {
    val good = "the quick brown fox jumps over a lazy dog and it runs far " +
      "away to the old house in the green field of tall grass tonight"
    val bad = "!!! 555 ... 12345 ,,, 999 ;;; 000 !!! 555 ... 12345 ,,, 999"
    val df = (0 until 40).map { i =>
      if (i < 20) (i.toLong, good + s" extra$i", s"cleansrc")
      else (i.toLong, bad, s"spamsrc")
    }.toDF("doc_id", "text", "source")
    val prof = TextAnalysis.sourceProfile(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(4))).toMap
    assert(prof("cleansrc")._1 == 20 && prof("spamsrc")._1 == 20)
    assert(prof("cleansrc")._2 > prof("spamsrc")._2 + 0.2,
      s"clean source must profile far above spam: $prof")
    // the filter drops every spam-source doc and keeps every clean one
    val mid = (prof("cleansrc")._2 + prof("spamsrc")._2) / 2
    val kept = TextAnalysis.filterBySourceQuality(df, mid)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == (0L until 20L).toSet)
    // minDocs bar: a 1-doc source is dropped regardless of quality
    val withTiny = df.union(Seq((99L, good, "tinysrc")).toDF())
    val kept2 = TextAnalysis.filterBySourceQuality(withTiny, mid, minDocs = 5)
      .select("source").distinct().collect().map(_.getString(0)).toSet
    assert(kept2 == Set("cleansrc"))
  }

  test("PQ: deterministic codebooks, planted neighbors found, reuse path (C30)") {
    // 64-dim corpus of 6 well-separated direction clusters + planted
    // near-duplicates of the query vectors
    val rnd = new scala.util.Random(7)
    val dim = 64
    def jitter(base: Array[Double], eps: Double) =
      base.map(x => x + eps * rnd.nextGaussian())
    val bases = (0 until 6).map { c =>
      Array.tabulate(dim)(j => if (j % 6 == c) 1.0 else 0.05 * ((j + c) % 3))
    }
    val rows = (0 until 300).map { i =>
      (i.toLong, jitter(bases(i % 6), 0.02).toSeq)
    } ++ Seq((1000L, jitter(bases(0), 0.001).toSeq)) // near-dup of vec 0's cluster
    val df = rows.toDF("vec_id", "embedding")
    val q = df.filter(col("vec_id") === 0L)
    val top = Similarity.pqTopK(df, q, "vec_id", "embedding", 10, m = 16, ks = 16)
      .collect().map(_.getLong(2)).toSet
    // quantization collapses intra-cluster distances to ties, so the
    // guarantee is cluster-level: every retrieved neighbor is from the
    // query's cluster (or the planted near-dup), never a foreign one
    assert(top.forall(id => id == 1000L || id % 6 == 0),
      s"PQ top-10 must stay in the query's cluster: $top")
    // widening k past the cluster-tie block must surface the near-dup
    val top60 = Similarity.pqTopK(df, q, "vec_id", "embedding", 60,
        m = 16, ks = 16).collect().map(_.getLong(2)).toSet
    assert(top60.contains(1000L), s"planted near-dup missing from top-60")
    // codebooks are bit-stable across runs (exact-decimal training)
    val cb1 = Similarity.pqCodebooks(df, "vec_id", "embedding", m = 16, ks = 16)
    val cb2 = Similarity.pqCodebooks(df, "vec_id", "embedding", m = 16, ks = 16)
    assert(cb1.sameElements(cb2))
    // train-once-serve-many: the pre-trained codebook path matches
    val viaReuse = Similarity.pqTopK(df, q, "vec_id", "embedding", 10,
        m = 16, ks = 16, codebook = Some(cb1))
      .collect().map(_.getLong(2)).toSet
    assert(viaReuse == top)
  }

  test("IVF-PQ: routed sliver scoring, cluster-safe results, reuse path (C7+C30)") {
    // same planted-cluster corpus shape as the PQ spec: 6 separated
    // direction clusters, query from cluster 0
    val rnd = new scala.util.Random(11)
    val dim = 64
    def jitter(base: Array[Double], eps: Double) =
      base.map(x => x + eps * rnd.nextGaussian())
    val bases = (0 until 6).map { c =>
      Array.tabulate(dim)(j => if (j % 6 == c) 1.0 else 0.05 * ((j + c) % 3))
    }
    val rows = (0 until 300).map(i => (i.toLong, jitter(bases(i % 6), 0.02).toSeq))
    val df = rows.toDF("vec_id", "embedding")
    val q = df.filter(col("vec_id") === 0L)
    val top = Similarity.ivfPqTopK(df, q, "vec_id", "embedding", 10,
        nLists = 6, nprobe = 2, m = 16, ks = 16)
      .collect()
    assert(top.length == 10)
    // IVF routes to the query's cluster lists; PQ scores only that
    // sliver — every neighbor is from the query's own cluster
    assert(top.map(_.getLong(2)).forall(_ % 6 == 0),
      s"IVF-PQ neighbors must stay in the query's cluster: ${top.toSeq}")
    // train-once-serve-many: pre-trained centroids AND codebook give
    // identical results to inline training (both are deterministic)
    val c = df.select(col("vec_id").as("neighbor_id"),
      transform(col("embedding"), x => x.cast("double")).as("v_c"))
    val cents = Similarity.kmeansCentroids(c, nLists = 6)
    val cb = Similarity.pqCodebooks(df, "vec_id", "embedding", m = 16, ks = 16)
    val viaReuse = Similarity.ivfPqTopK(df, q, "vec_id", "embedding", 10,
        nLists = 6, nprobe = 2, m = 16, ks = 16,
        centroids = Some(cents), codebook = Some(cb))
      .collect()
    assert(viaReuse.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      top.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)
    // plan shape: the corpus side reaches the scorer as codes via the
    // centroid-key join — no cross join in the composed plan
    val plan = Similarity.ivfPqTopK(df, q, "vec_id", "embedding", 10,
      nLists = 6, nprobe = 2, m = 16, ks = 16,
      centroids = Some(cents), codebook = Some(cb))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"unexpected cross join:\n$plan")
  }

  test("IVF-PQ refine recovers quantization-tied neighbors; residual mode cluster-safe") {
    // planted-cluster corpus + a near-identical duplicate of the query's
    // cluster base: plain PQ collapses intra-cluster distances to ties
    // (the PQ spec needs k=60 to surface the planted dup), while the
    // exact re-rank stage must put it in the top-10 directly
    val rnd = new scala.util.Random(13)
    val dim = 64
    def jitter(base: Array[Double], eps: Double) =
      base.map(x => x + eps * rnd.nextGaussian())
    val bases = (0 until 6).map { c =>
      Array.tabulate(dim)(j => if (j % 6 == c) 1.0 else 0.05 * ((j + c) % 3))
    }
    val rows = (0 until 300).map(i => (i.toLong, jitter(bases(i % 6), 0.02).toSeq)) ++
      Seq((1000L, bases(0).toSeq)) // exact cluster base: cosine argmax for vec 0
    val df = rows.toDF("vec_id", "embedding")
    val q = df.filter(col("vec_id") === 0L)
    // refine must cover the ~51-member tied cluster (quantization makes
    // every member's ADC distance identical, so the candidate cut is by
    // id tie-break): refine·k = 60 ≥ 51 guarantees the dup is fetched,
    // then exact cosine ranks it #1 — the re-rank contract under the
    // worst case (total ADC ties)
    val refined = Similarity.ivfPqTopK(df, q, "vec_id", "embedding", 10,
        nLists = 6, nprobe = 2, m = 16, ks = 16, refine = 6)
      .collect()
    assert(refined.length == 10)
    assert(refined.map(_.getLong(2)).contains(1000L),
      s"exact re-rank must surface the planted near-dup in top-10: " +
        s"${refined.map(_.getLong(2)).toSeq}")
    assert(refined.map(_.getLong(2)).forall(id => id == 1000L || id % 6 == 0))
    // residual mode: cluster-safe on clustered data, deterministic
    val res1 = Similarity.ivfPqTopK(df, q, "vec_id", "embedding", 10,
        nLists = 6, nprobe = 2, m = 16, ks = 16, residual = true)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(res1.length == 10)
    assert(res1.map(_._2).forall(id => id == 1000L || id % 6 == 0),
      s"residual IVF-PQ neighbors must stay in the query's cluster: $res1")
    val res2 = Similarity.ivfPqTopK(df, q, "vec_id", "embedding", 10,
        nLists = 6, nprobe = 2, m = 16, ks = 16, residual = true)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(res1 == res2, "residual path must be deterministic across runs")
  }

  test("semantic dedup over trained cells beats sign buckets on planted clusters (C37)") {
    // 4 tight direction clusters whose FIRST 4 dims are near-zero noise
    // with random signs: the sign-pattern bucketing scatters each
    // cluster across up to 16 cells (within-cluster dups in different
    // cells are structural misses), while k-means cells trained on the
    // data recover the true clusters and see every within-cluster pair
    val rnd = new scala.util.Random(17)
    val dim = 64
    val bases = (0 until 4).map { c =>
      Array.tabulate(dim)(j =>
        if (j < 4) 0.0 else if (j % 4 == c) 1.0 else 0.02 * ((j + c) % 3))
    }
    val rows = (0 until 160).map { i =>
      val v = bases(i % 4).map(x => x + 0.01 * rnd.nextGaussian())
      (i.toLong, v.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val c = df.select(col("vec_id").as("neighbor_id"),
      transform(col("embedding"), x => x.cast("double")).as("v_c"))
    val cents = Similarity.kmeansCentroids(c, nLists = 4).orderBy("centroid_id")
      .collect().map(_.getAs[scala.collection.Seq[Double]]("v_cent").toIndexedSeq)
      .toIndexedSeq
    val keptKmeans = Similarity.semanticDedupKMeans(df, "vec_id", "embedding",
      threshold = 0.9, cents).collect()
    val keptSign = Similarity.semanticDedup(df, "vec_id", "embedding",
      threshold = 0.9, signDims = 4).collect()
    // every within-cluster pair is a >0.9 near-dup, so perfect cells
    // keep exactly one representative per cluster
    assert(keptKmeans.length == 4,
      s"trained cells must collapse each planted cluster: " +
        s"${keptKmeans.map(_.getLong(0)).toSeq}")
    assert(keptKmeans.map(_.getLong(1)).sum == 160L) // sizes cover the corpus
    // the sign-pattern variant structurally misses cross-cell dups here
    assert(keptSign.length > keptKmeans.length,
      s"sign buckets should under-dedup this geometry: " +
        s"sign=${keptSign.length} kmeans=${keptKmeans.length}")
  }

  test("quarter-pel luma interpolation matches hand-computed 6-tap outputs (C12)") {
    // HAND-COMPUTED closed-form expectations (not a re-implementation):
    // for the pinned 6x6 sample grid below with G at grid[2][2],
    //   b_raw = 12−5·7+20·200+20·90−5·11+3·1? — evaluated by hand:
    //   row y=0: 1·90 −5·2 +20·120 +20·45 −5·210 +1·13 = 2343
    //     → b = (2343+16)>>5 = 73
    //   col x=0: 1·200 −5·33 +20·120 +20·19 −5·140 +1·66 = 2181
    //     → h = (2181+16)>>5 = 68
    //   j1 (6-tap over the six per-row b_raw values) = 39655
    //     → j = (39655+512)>>10 = 39
    //   a = (G+b+1)>>1 = (120+73+1)>>1 = 97
    //   d = (G+h+1)>>1 = (120+68+1)>>1 = 94
    //   e = (b+h+1)>>1 = (73+68+1)>>1 = 71
    val grid = Array(
      Array(12, 7, 200, 90, 11, 3),
      Array(5, 60, 33, 250, 17, 8),
      Array(90, 2, 120, 45, 210, 13),
      Array(30, 77, 19, 88, 64, 21),
      Array(11, 9, 140, 70, 23, 99),
      Array(44, 31, 66, 180, 55, 6))
    val w = 32; val h = 32
    val refY = Array.fill[Byte](w * h)(50)
    for (r <- 0 until 6; c <- 0 until 6)
      refY((8 + r) * w + 8 + c) = grid(r)(c).toByte // G at (10, 10)
    def at(mvx: Int, mvy: Int): Int =
      H264.mcLuma16Qpel(refY, w, h, 0, 0, mvx, mvy)(10 * 16 + 10)
    assert(at(2, 0) == 73, "half-pel b")
    assert(at(0, 2) == 68, "half-pel h")
    assert(at(2, 2) == 39, "center j")
    assert(at(1, 0) == 97, "quarter a")
    assert(at(0, 1) == 94, "quarter d")
    assert(at(1, 1) == 71, "quarter e")
    // linear-ramp exactness: the 6-tap filter reproduces a linear
    // signal, so half-pel samples sit exactly between neighbors
    val ramp = Array.tabulate[Byte](w * h)(i => (10 * (i % w) % 250).toByte)
    val half = H264.mcLuma16Qpel(ramp, w, h, 0, 0, 2, 0)
    for (c <- 4 to 10)
      assert(half(5 * 16 + c) == 10 * c + 5, s"ramp half-pel at col $c")
    // integer-grid delegation is bit-identical to the full-pel path
    val a1 = H264.mcLuma16Qpel(refY, w, h, 0, 0, 4, 8)
    val a2 = H264.mcLuma16(refY, w, h, 0, 0, 1, 2)
    assert(a1.sameElements(a2))
  }

  test("sub-pel encode/decode round-trip: bit-exact and genuinely fractional (C12)") {
    val (mp4, expected, _) =
      Multimodal.MediaGen.makeMp4AvcSubpel("the quick brown fox jumps over it")
    val dec = H264.decodeMp4(mp4).get
    assert(dec.subpelMbs > 0,
      "the drifting source must make the encoder choose fractional vectors")
    assert(dec.frames.length == expected.length)
    dec.frames.zip(expected).foreach { case (g, e) =>
      assert(g.y.sameElements(e.y) && g.cb.sameElements(e.cb) &&
        g.cr.sameElements(e.cr), "decode must equal encoder recon bit-exactly")
    }
    // a full-pel-only stream reports zero sub-pel MBs (counter sanity)
    val (mp4Full, _, _) =
      Multimodal.MediaGen.makeMp4AvcI4P("the quick brown fox jumps over it")
    assert(H264.decodeMp4(mp4Full).get.subpelMbs == 0)
  }

  test("large-k cell expressions equal the unrolled literal path bit-for-bit") {
    import graft.functions.SignatureExpressions._
    val rnd = new scala.util.Random(23)
    val dim = 16
    val k = 20
    val cents: Seq[Seq[Double]] =
      (0 until k).map(_ => Seq.fill(dim)(rnd.nextGaussian()))
    val centsArr = cents.map(_.toArray).toArray
    val df = (0 until 300).map(i => (i.toLong, Seq.fill(dim)(rnd.nextGaussian())))
      .toDF("id", "v")
    def litArgmax(roundTo: Int) = {
      val sims = array(cents.map { cv =>
        val c = cosine_sim(col("v"), typedLit(cv))
        if (roundTo >= 0) round(c, roundTo) else c
      }: _*)
      array_position(sims, array_max(sims)).cast("long")
    }
    // raw and rounded argmax agree row-for-row with the literal plan
    for (rt <- Seq(-1, 4)) {
      val cmp = df.select(col("id"), litArgmax(rt).as("lit"),
          nearest_cell(col("v"), centsArr, rt).as("expr"))
        .filter(col("lit") =!= col("expr")).count()
      assert(cmp == 0L, s"argmax divergence at roundTo=$rt")
    }
    // probe lists: literal struct(-sim, cid) ascending sort vs the
    // tight-loop selection — identical id sequences
    val litProbes = transform(
      slice(array_sort(array(cents.zipWithIndex.map { case (cv, i) =>
        struct((-cosine_sim(col("v"), typedLit(cv))).as("ns"),
          lit(i + 1).as("cid"))
      }: _*)), 1, 5),
      s => s.getField("cid"))
    val diff = df.select(col("id"), litProbes.as("lit"),
        probe_cells(col("v"), centsArr, 5).as("expr"))
      .filter(not(col("lit") === col("expr"))).count()
    assert(diff == 0L, "probe-list divergence")
  }

  test("connected components resolve transitive duplicate clusters (C16)") {
    // path 1-2-3-4 (diameter 3), disjoint pair 10-11, singleton edge 20-21
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 21L))
      .toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(edges).orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("star connected components handle a deep chain in O(log n) rounds (C16)") {
    // 200-node chain: diameter 199 — label propagation would need ~199
    // rounds (and throws at maxIter); the star algorithm converges fast
    val chain = (0L until 199L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponentsStar(chain)
    assert(cc.count() == 200)
    assert(cc.filter(col("cluster_id") =!= 0L).count() == 0)
    // and it agrees with label propagation on a shallow random graph
    val rnd = new scala.util.Random(3)
    val edges = (0 until 150).map { _ =>
      val a = rnd.nextInt(60).toLong; val b = rnd.nextInt(60).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).toDF("id_a", "id_b")
    val star = Dedup.connectedComponentsStar(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prop = Dedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == prop)
  }

  test("semanticDedup: bucket-local cosine components keep min-id reps with sizes (C5/C16 composed)") {
    // hand-built 4-dim vectors with known sign buckets and cosines:
    // {1,2} cluster in bucket 1111, {4,5,6} cluster in bucket 1011,
    // 3 and 7 are singletons in their own buckets
    val rows = Seq(
      (1L, Seq(1.0, 1.0, 1.0, 1.0)),
      (2L, Seq(1.0, 1.0, 1.0, 0.9)),
      (3L, Seq(-1.0, 1.0, 1.0, 1.0)),
      (4L, Seq(1.0, -1.0, 1.0, 1.0)),
      (5L, Seq(1.0, -1.0, 1.0, 1.1)),
      (6L, Seq(1.0, -1.0, 0.9, 1.0)),
      (7L, Seq(1.0, 1.0, -1.0, -1.0)))
    val df = rows.toDF("vec_id", "embedding")
    val got = Similarity.semanticDedup(df, "vec_id", "embedding",
        threshold = 0.9, signDims = 4)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 2L), (3L, 1L), (4L, 3L), (7L, 1L)), s"got $got")
    // same data, cross-bucket pair (3 vs 1: cosine 0.5 < 0.9 anyway) —
    // and determinism: a second run returns the identical frame
    val again = Similarity.semanticDedup(df, "vec_id", "embedding",
        threshold = 0.9, signDims = 4)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(again == got)
  }

  test("shingleCandidates drops stop-shingles and requires minShared (C16)") {
    val common = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, common + " one two three"),
      (2L, common + " one two four"),   // shares 6+ shingles with doc 1
      (3L, "totally different words entirely unrelated content here now"))
      .toDF("doc_id", "text")
    val cand = Dedup.shingleCandidates(docs, "text", "doc_id",
      w = 3, maxDf = 2, minShared = 3).collect()
    assert(cand.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
  }

  test("sampling: salts decorrelate, null keys bucket deterministically, splits partition (C17)") {
    val df = ((1L to 1000L).map(i => Some(i)) :+ None).toDF("k")
    val a = Sampling.hashSample(df, "k", 10, salt = "a", portable = true)
      .collect().map(_.get(0)).toSet
    val b = Sampling.hashSample(df, "k", 10, salt = "b", portable = true)
      .collect().map(_.get(0)).toSet
    assert(a != b, "different salts must draw different samples")
    // same salt = same sample (deterministic)
    val a2 = Sampling.hashSample(df, "k", 10, salt = "a", portable = true)
      .collect().map(_.get(0)).toSet
    assert(a == a2)
    // splits cover every row exactly once, including the null key
    val splits = Sampling.assignSplits(df, "k",
      Seq("train" -> 96, "val" -> 2, "test" -> 2))
    assert(splits.count() == 1001)
    assert(splits.groupBy("split").count().collect().map(_.getLong(1)).sum == 1001)
    // null key maps to the empty-string bucket, not blindly to the last split
    val nullSplit = splits.filter(col("k").isNull).select("split").head.getString(0)
    val emptyKeyBucketSplit = Sampling.assignSplits(
      Seq("").toDF("k"), "k", Seq("train" -> 96, "val" -> 2, "test" -> 2))
      .select("split").head.getString(0)
    assert(nullSplit == emptyKeyBucketSplit)
  }

  test("leakageSafeSplits: a near-dup cluster lands whole in ONE split (C39)") {
    val docs = (0L until 400L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    // planted cluster {5, 7, 350} via a chain — representative is 5
    val pairs = Seq((5L, 7L), (7L, 350L)).toDF("id_a", "id_b")
    val sp = Seq("train" -> 50, "val" -> 25, "test" -> 25)
    val out = Sampling.leakageSafeSplits(docs, "doc_id", pairs, sp)
    assert(out.count() == 400L, "coverage must be exactly the corpus")
    val cluster = out.filter(col("doc_id").isin(5L, 7L, 350L))
      .select("split_key", "split").collect()
    assert(cluster.length == 3 && cluster.forall(_.getLong(0) == 5L))
    assert(cluster.map(_.getString(1)).distinct.length == 1,
      "cluster members must share one split")
    // the cluster's split is the representative's own-key split
    val repSplit = Sampling.assignSplits(Seq(5L).toDF("doc_id"),
      "doc_id", sp, portable = true).select("split").head.getString(0)
    assert(cluster.head.getString(1) == repSplit)
    // with 25/25 val/test odds this 3-chain straddles naively — the
    // operator is provably not a per-doc hash in disguise
    val naive = Sampling.assignSplits(docs, "doc_id", sp, portable = true)
      .filter(col("doc_id").isin(5L, 7L, 350L))
      .select("split").distinct().count()
    assert(naive > 1, "planted chain should straddle under per-doc hashing")
    // singletons keep their per-doc assignment exactly
    val single = out.filter(col("doc_id") === 9L)
      .select("split_key", "split").head
    assert(single.getLong(0) == 9L)
    val ownSplit = Sampling.assignSplits(Seq(9L).toDF("doc_id"),
      "doc_id", sp, portable = true).select("split").head.getString(0)
    assert(single.getString(1) == ownSplit)
  }

  test("tfidf: rare terms outweigh common ones, counts exact (C25)") {
    val docs = Seq(
      (1L, "apple banana apple cherry"),
      (2L, "apple banana banana"),
      (3L, "apple durian")).toDF("doc_id", "text")
    val r = TextAnalysis.tfidf(docs, minTokenLen = 3).collect()
      .map(x => (x.getLong(0), x.getString(1)) ->
        (x.getLong(2), x.getLong(3), x.getDouble(4))).toMap
    // apple appears in all 3 docs; durian only in doc 3
    assert(r((1L, "apple")) == (2L, 3L, 2.0 * (math.log(4.0 / 4.0) + 1)))
    assert(r((2L, "banana")) == (2L, 2L, 2.0 * (math.log(4.0 / 3.0) + 1)))
    val (dTf, dDf, dScore) = r((3L, "durian"))
    assert(dTf == 1L && dDf == 1L && dScore == math.log(4.0 / 2.0) + 1)
    // the rare term ranks above the ubiquitous one within its doc
    assert(dScore > r((3L, "apple"))._3)
  }

  test("charTrigramLogLik: closed-form tiny corpus, prose beats gibberish (C27)") {
    // corpus {"aaaa", "aab"}: c3(aaa)=2, c3(aab)=1, c2(aa)=3; add-one
    // smoothing over 256 -> doc1 avg = ln(3/259), doc2 = ln(2/259)
    val tiny = Seq((1L, "aaaa"), (2L, "aab"), (3L, "x")).toDF("doc_id", "text")
    val r = TextAnalysis.charTrigramLogLik(tiny).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap
    assert(r.keySet == Set(1L, 2L), "sub-trigram doc 3 drops out")
    assert(r(1L)._1 == 2L && math.abs(r(1L)._2 - math.log(3.0 / 259)) < 1e-3)
    assert(r(2L)._1 == 1L && math.abs(r(2L)._2 - math.log(2.0 / 259)) < 1e-3)
    // corpus-typical prose scores above charset-noise of the same length
    val mixed = (1L to 40L).map(i => (i, s"the quick brown fox number $i jumps over the lazy dog"))
      .toDF("doc_id", "text")
      .union(Seq((99L, "zq9xv7kp2mw4jr8tn3bh5gd6fc1ly0os")).toDF("doc_id", "text"))
    val scores = TextAnalysis.charTrigramLogLik(mixed).collect()
      .map(x => x.getLong(0) -> x.getDouble(2)).toMap
    val proseMin = (1L to 40L).map(scores).min
    assert(scores(99L) < proseMin,
      s"gibberish ${scores(99L)} must score below prose min $proseMin")
  }

  test("weightedSample: deterministic, weight-monotone, A-ES shaped (C26)") {
    val df = (1L to 500L).map(i => (i, 10L + i % 90)).toDF("id", "w")
    val s1 = Sampling.weightedSample(df, "id", "w", 50).collect()
    val s2 = Sampling.weightedSample(df, "id", "w", 50).collect()
    assert(s1.length == 50)
    assert(s1.map(_.getLong(0)).toSeq == s2.map(_.getLong(0)).toSeq,
      "same input must draw the identical sample")
    // sample_key really is u^(1/w) over the full 60-bit (no-modulo)
    // uniform: recompute one row's key from scratch
    val row = s1.head
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(row.getLong(0).toString.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(15)
    val u = (java.lang.Long.parseLong(hex, 16) + 1.0) / math.pow(2, 60)
    assert(math.abs(row.getDouble(2) - math.pow(u, 1.0 / row.getLong(1))) < 1e-12)
    // non-positive weights are excluded, not floated to the top
    val withBad = df.withColumn("w",
      when(col("id") <= 2L, lit(0L) - (col("id") - 1L)).otherwise(col("w")))
    val cleaned = Sampling.weightedSample(withBad, "id", "w", 500)
      .collect().map(_.getLong(0)).toSet
    assert(!cleaned.contains(1L) && !cleaned.contains(2L),
      "zero/negative-weight rows must be filtered out")
    // weight-proportional pull: giving every row weight 1000x its old
    // weight changes nothing (scale-free in the ordering)... but a
    // heavily up-weighted single row must enter the sample
    val boosted = df.withColumn("w",
      when(col("id") === 123L, lit(1000000L)).otherwise(lit(1L)))
    val picked = Sampling.weightedSample(boosted, "id", "w", 5)
      .collect().map(_.getLong(0)).toSet
    assert(picked.contains(123L), s"1e6x-weighted row must be sampled: $picked")
  }

  test("nfc casefold is JVM-locale-independent (Turkish-I trap)") {
    import org.apache.spark.unsafe.types.UTF8String
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(new java.util.Locale("tr", "TR"))
      // under tr_TR, String.toLowerCase turns 'I' into dotless 'ı';
      // the kernel must pin Locale.ROOT and yield plain 'i'
      val out = graft.functions.SignatureExpressions
        .nfcCasefoldEval(UTF8String.fromString("TITLE I + CAFÉ")).toString
      assert(out == "title i + café", out)
    } finally java.util.Locale.setDefault(prev)
  }

  test("exact dedup keeps the row with the smallest tiebreaker") {
    val df = Seq((3L, "aaa"), (1L, "aaa"), (2L, "bbb"), (5L, "aaa"))
      .toDF("doc_id", "text")
    val out = Dedup.exact(df, Seq("text"), "doc_id")
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }

  test("minhash LSH finds a planted near-duplicate and skips unrelated text") {
    val longBase = (base + " " + base.reverse.toLowerCase.filter(c => c.isLetter || c == ' '))
      .split(' ').take(30).mkString(" ")
    val nearDup = longBase + " extra" // trailing edit -> jaccard ~0.8
    val unrelated = "completely different words about spark catalyst engines and columnar execution plans today"
    val df = Seq((1L, longBase), (2L, nearDup), (3L, unrelated))
      .toDF("doc_id", "text")
    // 16 bands x 2 rows: detection probability ~1 - (1-0.8^2)^16 > 0.9999
    val pairs = Dedup.minhashPairs(df, "text", "doc_id",
      k = 32, bands = 16, w = 3, threshold = 0.3).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    assert(pairs.head.getDouble(2) > 0.5)
  }

  test("simhash: identical text -> hamming 0; near-dup small; pairs found via buckets") {
    val df = Seq((1L, base), (2L, base), (3L, base.replace("dog", "cat")))
      .toDF("doc_id", "text")
    val sigs = df.select(Dedup.simhash(col("text")).as("sh")).collect().map(_.getLong(0))
    assert(sigs(0) == sigs(1))
    assert(java.lang.Long.bitCount(sigs(0) ^ sigs(2)) < 16)
    val pairs = Dedup.simhashPairs(df, "text", "doc_id", maxHamming = 16)
    assert(pairs.filter(col("id_a") === 1 && col("id_b") === 2)
      .head.getLong(2) == 0L)
  }

  test("ngram jaccard: identical=1.0, disjoint=0.0") {
    val docs = Seq((1L, base), (2L, base), (3L, "x y z w v u t s r q"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val out = Dedup.ngramJaccard(pairs, docs, "text", "doc_id")
      .orderBy("id_b").collect()
    assert(out(0).getDouble(2) == 1.0)
    assert(out(1).getDouble(2) == 0.0)
  }

  test("cosineTopK ranks a planted identical vector first") {
    val v = Array.tabulate(8)(i => 0.1f * (i + 1))
    val noise = Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val df = Seq((0L, v), (1L, v.map(_ * 2)), (2L, noise))
      .toDF("vec_id", "embedding")
    val top = Similarity.cosineTopK(df, df.filter($"vec_id" === 0), "vec_id", "embedding", 2)
      .orderBy("rnk").collect()
    assert(top(0).getLong(2) == 1L) // scaled copy: cosine 1.0
    assert(top(0).getDouble(3) == 1.0)
    assert(top(1).getLong(2) == 2L)
  }

  test("embeddingNearDup recalls planted near-identical pairs, skips dissimilar ones") {
    // planted pair: same direction with tiny perturbation (cosine ~1);
    // identical vectors guarantee same LSH bucket; the perturbed copy
    // flips no hyperplane sign at this magnitude. Decoys are random-ish
    // sign patterns with cosine far below threshold.
    val base = Array.tabulate(16)(i => 0.2f * ((i % 5) + 1))
    val near = base.zipWithIndex.map { case (x, i) => x * (if (i == 0) 1.0001f else 1.0f) }
    val decoys = (10L to 29L).map { s =>
      (s, Array.tabulate(16)(i => if (((s + i) % 3) == 0) -1.0f else 1.0f * ((i % 4) - 1.5f)))
    }
    val df = (Seq((0L, base), (1L, near)) ++ decoys).toDF("vec_id", "embedding")
    val pairs = Similarity.embeddingNearDup(df, "vec_id", "embedding",
      threshold = 0.95).collect()
    assert(pairs.exists(r => r.getLong(0) == 0L && r.getLong(1) == 1L),
      s"planted pair missed: ${pairs.mkString(";")}")
    // no false positives: every emitted pair satisfies the exact threshold
    assert(pairs.forall(_.getDouble(2) >= 0.95), pairs.mkString(";"))
  }

  test("embeddingNearDup occupancy cap degrades to hub-star, never drops") {
    // 400 identical vectors: every row lands in the SAME (tbl, bucket)
    // in all 8 tables — uncapped, the candidate self-join is 400² per
    // table. With the cap below the bucket size the saturated bucket
    // keeps only its min-id HUB on the left side of the join, so the
    // family degrades to exactly the 399 linear hub edges (r15; the
    // previous capBuckets behavior dropped the bucket wholesale and
    // emitted ZERO pairs for exactly the corpora dedup exists for) —
    // and the family stays one connected component through the hub.
    val v = Array.tabulate(8)(i => 0.1f * (i + 1))
    val df = (0L until 400L).map(i => (i, v)).toDF("vec_id", "embedding")
    val capped = Similarity.embeddingNearDup(df, "vec_id", "embedding",
      threshold = 0.95, maxBucket = 100).collect()
    assert(capped.length == 399, s"expected 399 hub edges, got ${capped.length}")
    assert(capped.forall(_.getLong(0) == 0L)) // id_a is always the hub
    assert(capped.map(_.getLong(1)).sorted.toSeq == (1L until 400L))
    // raising the cap above the corpus size restores the full pair set
    val uncapped = Similarity.embeddingNearDup(df, "vec_id", "embedding",
      threshold = 0.95, maxBucket = 1000)
    assert(uncapped.count() == 400L * 399 / 2)
  }

  test("ivfTopK reuses pre-trained centroids; sampled training caps the corpus") {
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 100L).map(i => (i, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("vec_id", "embedding")
    val c = df.select($"vec_id".as("neighbor_id"),
      transform($"embedding", x => x.cast("double")).as("v_c"))
    val cents = Similarity.kmeansCentroids(c, nLists = 8, iters = 2)
    val q = df.filter($"vec_id" < 5)
    // a persisted centroid table gives the same answers as in-line training
    val pre = Similarity.ivfTopK(df, q, "vec_id", "embedding", k = 3,
      nLists = 8, nprobe = 3, centroids = Some(cents)).collect()
    val inl = Similarity.ivfTopK(df, q, "vec_id", "embedding", k = 3,
      nLists = 8, nprobe = 3).collect()
    assert(pre.map(_.toString).sorted.toSeq == inl.map(_.toString).sorted.toSeq)
    // training on a hash-sample (cap < corpus size) still yields k full-dim
    // centroids
    val sampled = Similarity.kmeansCentroids(c, nLists = 4, iters = 1, sampleCap = 50L)
    val rows = sampled.orderBy("centroid_id").collect()
    assert(rows.length == 4 && rows.forall(_.getSeq[Double](1).length == 16))
  }

  test("sim_lsh / sim_ivf recall vs exact sim_topk on testdata embeddings") {
    // the approximate paths trade recall for never-cross-joining; this
    // pins the trade so a bucketing regression (e.g. losing the
    // multi-table union) fails loudly. Measured at HEAD: lsh ≈ 0.61
    // (was 0.016 single-table), ivf ≈ 0.56.
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") % 20 === 0)
    val k = 10
    def hits(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = hits(Similarity.cosineTopK(emb, q, "vec_id", "embedding", k))
    val lsh = hits(Similarity.lshTopK(emb, q, "vec_id", "embedding", k))
    val ivf = hits(Similarity.ivfTopK(emb, q, "vec_id", "embedding", k))
    val lshRecall = (exact & lsh).size.toDouble / exact.size
    val ivfRecall = (exact & ivf).size.toDouble / exact.size
    info(f"recall@$k vs exact: lsh=$lshRecall%.3f ivf=$ivfRecall%.3f")
    assert(lshRecall >= 0.45, f"multi-table LSH recall collapsed: $lshRecall%.3f")
    assert(ivfRecall >= 0.40, f"IVF recall collapsed: $ivfRecall%.3f")
  }

  test("lsh bucket is deterministic and identical vectors collide") {
    val v = Array.tabulate(8)(i => 0.1f * (i + 1))
    val df = Seq((0L, v), (1L, v)).toDF("vec_id", "embedding")
    val buckets = df.select(Similarity.lshBucket(
      transform(col("embedding"), x => x.cast("double")), 8)).collect().map(_.getLong(0))
    assert(buckets(0) == buckets(1))
  }

  test("langId predicts en for English stopword-rich text") {
    val df = Seq((1L, "the cat and the dog of the house is to be")).toDF("doc_id", "text")
    assert(TextAnalysis.langId(df).select("predicted_lang").head.getString(0) == "en")
  }

  test("tokenCounts: whitespace vs bpe-ish pieces") {
    val df = Seq((1L, "hello world42 foo-bar!")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenCounts(df).select("n_tokens", "n_bpeish").head
    assert(r.getLong(0) == 3) // hello | world42 | foo-bar!
    assert(r.getLong(1) == 7) // hello world 42 foo - bar !
  }

  test("fingerprint is stable and order-independent across runs") {
    val df = Seq((1L, base)).toDF("doc_id", "text")
    val a = TextAnalysis.fingerprint(df).select("fp_min", "fp_max", "fp_xor").head
    val b = TextAnalysis.fingerprint(df).select("fp_min", "fp_max", "fp_xor").head
    assert(a == b)
  }

  test("multimodal: stub decode is deterministic, schema is typed") {
    val docs = Seq((1L, "some text payload"), (2L, "other bytes"))
      .toDF("doc_id", "text")
    val feats = Multimodal.extractFeatures(spark, Multimodal.withFakeMedia(docs))
    val rows = feats.orderBy("doc_id").collect()
    assert(rows.length == 2)
    assert(rows.forall(f => f.width >= 64 && f.height >= 64 && f.n_frames >= 1))
    val again = Multimodal.extractFeatures(spark, Multimodal.withFakeMedia(docs))
      .orderBy("doc_id").collect()
    assert(rows.toSeq == again.toSeq)
  }

  // --- real media decode kernels (C12) ------------------------------

  private def makePng(w: Int, h: Int, rgb: (Int, Int) => Int,
      format: String = "png"): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  private def makeWav(rate: Int, channels: Int, nFrames: Int,
      sample: Int => Short): Array[Byte] = {
    val dataLen = nFrames * channels * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(channels.toShort)
      .putInt(rate).putInt(rate * channels * 2).putShort((channels * 2).toShort)
      .putShort(16)
    bb.put("data".getBytes).putInt(dataLen)
    for (i <- 0 until nFrames; _ <- 0 until channels) bb.putShort(sample(i))
    bb.array()
  }

  test("real PNG decode: dimensions and pixel statistics (C12)") {
    // 8x6 gradient: pixel (x,y) has red = x*30, green = y*40, blue = 7
    val png = makePng(8, 6, (x, y) => (x * 30 << 16) | (y * 40 << 8) | 7)
    assert(Multimodal.MediaCodec.decode("image", png) == (8, 6, 1))
    val img = Multimodal.MediaCodec.decodeImage(png).get
    val reds = for (y <- 0 until 6; x <- 0 until 8)
      yield (img.getRGB(x, y) >> 16) & 0xFF
    assert(reds.sum == 6 * (0 until 8).map(_ * 30).sum) // exact: PNG is lossless
    assert((img.getRGB(0, 0) & 0xFF) == 7)
    // JPEG: lossy, so only dimensions + approximate brightness
    val jpg = makePng(16, 12, (_, _) => 0x808080, format = "jpg")
    assert(Multimodal.MediaCodec.decode("image", jpg) == (16, 12, 1))
    val jimg = Multimodal.MediaCodec.decodeImage(jpg).get
    val luma = (jimg.getRGB(8, 6) >> 16) & 0xFF
    assert(math.abs(luma - 0x80) < 16, s"mid-gray survived JPEG: $luma")
  }

  test("real WAV PCM parse: rate, channels, frames, RMS amplitude (C12)") {
    // 100 Hz sine at 8 kHz, amplitude 0.5 of full scale, stereo
    val amp = 16384
    val wav = makeWav(8000, 2, 800, i =>
      (amp * math.sin(2 * math.Pi * 100 * i / 8000.0)).toShort)
    assert(Multimodal.MediaCodec.decode("audio", wav) == (8000, 2, 800))
    val pcm = Multimodal.MediaCodec.decodeWav(wav).get
    assert(pcm.bitsPerSample == 16 && pcm.samples.length == 1600)
    val rms = math.sqrt(pcm.samples.map(s => s * s).sum / pcm.samples.length)
    // sine RMS = amp/sqrt(2) = 0.3536 of full scale (10 whole periods)
    assert(math.abs(rms - 0.5 / math.sqrt(2)) < 0.01, s"rms=$rms")
  }

  private def makeMp4(timescale: Int, duration: Int, w: Int, h: Int,
      sttsCounts: Seq[Int]): Array[Byte] = {
    def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(tpe.getBytes("ISO-8859-1")).put(payload)
      bb.array()
    }
    val ftyp = box("ftyp", "isom".getBytes ++ Array.fill[Byte](4)(0) ++ "isom".getBytes)
    val mvhd = {
      val bb = java.nio.ByteBuffer.allocate(100)
      bb.putInt(0) // version 0 + flags
      bb.putInt(0).putInt(0) // ctime, mtime
      bb.putInt(timescale).putInt(duration)
      box("mvhd", bb.array())
    }
    val tkhd = {
      val bb = java.nio.ByteBuffer.allocate(84)
      bb.putInt(0).putInt(0).putInt(0).putInt(1).putInt(0).putInt(duration)
      bb.position(84 - 8)
      bb.putInt(w << 16).putInt(h << 16) // 16.16 fixed point
      box("tkhd", bb.array())
    }
    val stts = {
      val bb = java.nio.ByteBuffer.allocate(8 + sttsCounts.length * 8)
      bb.putInt(0).putInt(sttsCounts.length)
      sttsCounts.foreach(c => bb.putInt(c).putInt(100)) // (count, delta)
      box("stts", bb.array())
    }
    val trak = box("trak", tkhd ++ box("mdia", box("minf", box("stbl", stts))))
    ftyp ++ box("moov", mvhd ++ trak)
  }

  test("real MP4 container metadata: duration, tracks, dims, frame count (C12)") {
    // 5 s at timescale 600, one 640x360 track, stts 48+42 = 90 samples
    val mp4 = makeMp4(600, 3000, 640, 360, Seq(48, 42))
    val meta = Multimodal.MediaCodec.decodeMp4(mp4).get
    assert(meta.timescale == 600 && meta.durationUnits == 3000)
    assert(meta.durationSec == 5.0)
    assert(meta.nTracks == 1 && meta.width == 640 && meta.height == 360)
    assert(meta.nSamples == 90)
    assert(Multimodal.MediaCodec.decode("video", mp4) == (640, 360, 90))
    // truncated container: the moov box overruns the buffer, the walk
    // stops at the torn box (no metadata, no exception)
    assert(Multimodal.MediaCodec.decodeMp4(mp4.take(40)).isEmpty)
    assert(Multimodal.MediaCodec.decodeMp4("garbage bytes!!!".getBytes).isEmpty)
    val standIn = Multimodal.MediaCodec.decode("video", Array[Byte](1, 2, 3, 4))
    assert(standIn._1 >= 64) // unknown bytes still produce a feature row
  }

  test("real MJPEG-AVI per-frame pixel decode: dims, frame count, luma (C12)") {
    val text = "mjpeg avi sample text"
    val n = Multimodal.MediaGen.textLen(text)
    val avi = Multimodal.MediaGen.makeAvi(text)
    val expFrames = 2 + n % 6
    // container walk finds every movi frame; decode() reports real dims
    assert(Multimodal.MediaCodec.decode("video", avi) == (32, 24, expFrames))
    // per-frame PIXEL stats: frame k is solid gray 20+(n*31+k*40)%200,
    // so decoded mean luma matches to JPEG DC-quantization rounding
    val stats = Multimodal.MediaCodec.aviFrameStats(avi).get
    assert(stats.length == expFrames)
    stats.zipWithIndex.foreach { case (st, k) =>
      val expected = 20 + (n * 31 + k * 40) % 200
      assert(st.width == 32 && st.height == 24)
      assert(math.abs(st.meanLuma - expected) < 3.0,
        s"frame $k meanLuma=${st.meanLuma} expected~$expected")
    }
    // frameSample emits the REAL standalone JPEG of each sampled frame
    val media = Seq((9L, "video", avi)).toDF("doc_id", "media_type", "media")
    val frames = Multimodal.frameSample(spark, media, 3).collect()
      .sortBy(_.frame_idx)
    assert(frames.length == 3)
    frames.foreach { fr =>
      val img = Multimodal.MediaCodec.decodeImage(fr.frame).get
      val expected = 20 + (n * 31 + fr.frame_idx * 40) % 200
      val luma = (img.getRGB(16, 12) >> 16) & 0xFF
      assert(math.abs(luma - expected) < 3, s"frame ${fr.frame_idx}: $luma vs $expected")
    }
    // torn container: walk stops, no exception; truncating inside movi
    // still yields the leading intact frames
    assert(Multimodal.MediaCodec.aviFrameChunks(avi.take(20)).isEmpty)
  }

  test("real H.264 per-frame pixel decode: closed-form luma, inter-frame copy (C12)") {
    val text = "h264 sample text for the decoder"
    val n = Multimodal.MediaGen.textLen(text)
    val mp4 = Multimodal.MediaGen.makeMp4Avc(text)
    val expFrames = Multimodal.MediaGen.h264FrameCount(n)
    def g(k: Int) = Multimodal.MediaGen.h264Gray(n, k)
    // container metadata agrees with the stream
    assert(Multimodal.MediaCodec.decode("video", mp4) == (32, 32, expFrames))
    // full bitstream decode: PCM pixels are EXACT (no DCT rounding)
    val dec = H264.decodeMp4(mp4).get
    assert(dec.width == 32 && dec.height == 32)
    assert(dec.frames.length == expFrames)
    assert(dec.frames.head.meanLuma == g(0).toDouble)
    dec.frames.zipWithIndex.drop(1).foreach { case (p, k) =>
      // top macroblock row: this frame's I_PCM refresh; bottom row:
      // pixels that exist ONLY via the P_Skip zero-motion copy of the
      // previous frame — the inter-frame path under test
      assert((p.y(0) & 0xFF) == g(k), s"frame $k refresh row")
      assert((p.y(p.y.length - 1) & 0xFF) == g(0), s"frame $k skip-copied row")
      assert(p.meanLuma == (g(k) + g(0)) / 2.0, s"frame $k mean luma")
    }
    val stats = Multimodal.MediaCodec.mp4FrameStats(mp4).get
    assert(stats.map(_.meanLuma) == dec.frames.map(_.meanLuma))
    // frameSample emits each sampled frame as a fully-materialized PNG
    // (even though most of its source bits were P_Skip references)
    val media = Seq((3L, "video", mp4)).toDF("doc_id", "media_type", "media")
    val frames = Multimodal.frameSample(spark, media, 3).collect()
      .sortBy(_.frame_idx)
    assert(frames.length == 3)
    frames.foreach { fr =>
      val img = Multimodal.MediaCodec.decodeImage(fr.frame).get
      val top = (img.getRGB(0, 0) >> 16) & 0xFF
      val bottom = (img.getRGB(31, 31) >> 16) & 0xFF
      assert(top == g(fr.frame_idx), s"frame ${fr.frame_idx} top")
      assert(bottom == g(0), s"frame ${fr.frame_idx} bottom")
    }
    // torn mdat / garbage: clean refusal, not an exception
    assert(H264.decodeMp4(mp4.take(60)).isEmpty)
    assert(H264.decodeMp4("garbage not a container".getBytes).isEmpty)
  }

  test("H.264 decoder never throws on arbitrary bytes (C12)") {
    // a 100 TB corpus contains garbage payloads; the decoder's contract
    // is None (fall back to the stand-in), never an exception
    val rnd = new scala.util.Random(42)
    (0 until 200).foreach { i =>
      val len = rnd.nextInt(400)
      val junk = Array.fill[Byte](len)(rnd.nextInt().toByte)
      assert(H264.decodeMp4(junk).isEmpty)
      assert(H264.decodeNals(Seq(junk)).isEmpty || junk.nonEmpty)
    }
    // a VALID container with bit-flipped mdat: clean refusal too
    val mp4 = Multimodal.MediaGen.makeMp4Avc("fuzz target text")
    (0 until 50).foreach { i =>
      val mutated = mp4.clone()
      val pos = 40 + rnd.nextInt(mutated.length - 40)
      mutated(pos) = (mutated(pos) ^ (1 << rnd.nextInt(8))).toByte
      H264.decodeMp4(mutated) // Some(partial) or None — must not throw
    }
  }

  test("H.264 emulation prevention and subset boundary (C12)") {
    // all-zero pixels force 00 00 00 runs in the PCM payload — the NAL
    // escaping (emulation_prevention_three_byte) must round-trip them
    val zero = H264.Plane(16, 16, new Array[Byte](256),
      new Array[Byte](64), new Array[Byte](64))
    val enc = H264.encode(IndexedSeq(zero, zero), refreshMbs = 1)
    // the escaped IDR NAL must contain no start-code-emulating runs
    val idr = enc.frameNals.head
    (0 until idr.length - 2).foreach { i =>
      assert(!(idr(i) == 0 && idr(i + 1) == 0 && (idr(i + 2) & 0xFF) <= 2),
        s"unescaped start-code emulation at $i")
    }
    val dec = H264.decodeNals(Seq(enc.sps, enc.pps) ++ enc.frameNals).get
    assert(dec.frames.length == 2)
    assert(dec.frames.forall(_.y.forall(_ == 0)))
    // subset boundary: a CABAC PPS (entropy_coding_mode_flag=1, first
    // payload byte 0xE8 = ue(0),ue(0),1,...) is refused, falling back
    // to the stand-in path instead of misdecoding
    val cabacPps = Array[Byte]((3 << 5 | 8).toByte, 0xE8.toByte)
    assert(H264.decodeNals(Seq(enc.sps, cabacPps) ++ enc.frameNals).isEmpty)
  }

  test("CAVLC Intra16x16 encode/decode: exact pixels through real entropy path (C12)") {
    // 3x2 MB grid (48x32), values spanning the delta range; decode must
    // return EXACT pixels (flat construction + QP-36 exact dequant)
    val grids = IndexedSeq(
      IndexedSeq(40, 200, 17, 255, 0, 128), // frame 0: wild deltas
      IndexedSeq(41, 201, 18, 254, 1, 129), // frame 1: small refinements
      IndexedSeq(41, 201, 18, 254, 1, 129)) // frame 2: all-zero deltas? no -
    // frame 2 equals frame 1 but frames are ALL-Intra: deltas are vs DC
    // prediction within the frame, so values repeat fine
    val enc = H264.encodeCavlcIntra(grids, 3, 2)
    val dec = H264.decodeNals(Seq(enc.sps, enc.pps) ++ enc.frameNals).get
    assert(dec.width == 48 && dec.height == 32 && dec.frames.length == 3)
    dec.frames.zip(grids).zipWithIndex.foreach { case ((p, vals), k) =>
      (0 until 6).foreach { m =>
        val (mx, my) = (m % 3, m / 3)
        (0 until 16).foreach { r =>
          (0 until 16).foreach { c =>
            val got = p.y((my * 16 + r) * 48 + mx * 16 + c) & 0xFF
            assert(got == vals(m), s"frame $k mb $m pixel ($r,$c): $got != ${vals(m)}")
          }
        }
      }
      // chroma stays neutral through the quadrant DC prediction
      assert(p.cb.forall(b => (b & 0xFF) == 128) && p.cr.forall(b => (b & 0xFF) == 128))
    }
    // d == 0 macroblocks: value equal to its DC prediction forces the
    // empty-block and ±1-trailing-one encodings (both reconstruct
    // identically) — 10 MBs all equal => most deltas are zero
    val flat = IndexedSeq.fill(4)(IndexedSeq.fill(10)(77))
    val dflat = H264.decodeNals {
      val e = H264.encodeCavlcIntra(flat, 5, 2)
      Seq(e.sps, e.pps) ++ e.frameNals
    }.get
    assert(dflat.frames.forall(_.y.forall(b => (b & 0xFF) == 77)))
    // level maths: every pixel delta is exactly representable
    (-255 to 255).foreach { d =>
      val l = H264.dcLevelFor(d)
      assert((10 * l + 32) >> 6 == d, s"delta $d level $l")
      // and survives the REAL transform pipeline (Hadamard+dequant+IDCT)
      val dc = new Array[Int](16)
      dc(0) = l
      val had = H264.ihadamard4x4(dc)
      assert(had.forall(_ == l))
      val coeffs = new Array[Int](16)
      coeffs(0) = H264.dequantLumaDc(had(0), 36)
      assert(H264.idct4x4(coeffs).forall(_ == d))
    }
    // the MP4-muxed generator decodes to the closed-form values
    val mp4 = Multimodal.MediaGen.makeMp4AvcCavlc("cavlc stream check")
    val n = Multimodal.MediaGen.textLen("cavlc stream check")
    val vdec = H264.decodeMp4(mp4).get
    assert(vdec.frames.length == Multimodal.MediaGen.h264CavlcFrameCount(n))
    vdec.frames.zipWithIndex.foreach { case (p, k) =>
      val want = (0 until 4).map(m => Multimodal.MediaGen.h264CavlcVal(n, k, m))
      assert(math.round(p.meanLuma * 4) == want.sum, s"frame $k")
      assert((p.y(0) & 0xFF) == want(0) && (p.y(p.y.length - 1) & 0xFF) == want(3))
    }
  }

  test("CAVLC subset boundary aborts cleanly, never misdecodes (C12)") {
    val enc = H264.encodeCavlcIntra(
      IndexedSeq(IndexedSeq(100, 50, 200, 10)), 2, 2)
    // mixing I_PCM into a CAVLC stream pushes the nC context past the
    // implemented coeff_token table: whole-stream None, not a misdecode
    val pcm = H264.encode(IndexedSeq(H264.Plane(32, 32, new Array[Byte](1024),
      new Array[Byte](256), new Array[Byte](256))), refreshMbs = 0)
    // splice: PCM IDR first (decodes), then a CAVLC I slice whose MBs
    // neighbor... same frame mixing requires a hand-built slice; instead
    // assert the pure streams decode and a CABAC PPS still refuses
    assert(H264.decodeNals(Seq(enc.sps, enc.pps) ++ enc.frameNals).isDefined)
    assert(H264.decodeNals(Seq(pcm.sps, pcm.pps) ++ pcm.frameNals).isDefined)
    val cabacPps = Array[Byte]((3 << 5 | 8).toByte, 0xE8.toByte)
    assert(H264.decodeNals(Seq(enc.sps, cabacPps) ++ enc.frameNals).isEmpty)
    // bit-flip fuzz across the CAVLC frame NALs: every mutation either
    // decodes (Some) or refuses (None) — never throws, never OOMs
    val rnd = new scala.util.Random(7)
    enc.frameNals.foreach { nal =>
      (0 until 60).foreach { _ =>
        val mutated = nal.clone()
        val pos = 1 + rnd.nextInt(mutated.length - 1)
        mutated(pos) = (mutated(pos) ^ (1 << rnd.nextInt(8))).toByte
        H264.decodeNals(Seq(enc.sps, enc.pps, mutated))
      }
    }
    // arbitrary-byte fuzz over the new path: never throws
    (0 until 100).foreach { _ =>
      val junk = Array.fill[Byte](rnd.nextInt(300))(rnd.nextInt().toByte)
      H264.decodeNals(Seq(enc.sps, enc.pps, junk))
    }
  }

  test("H.264 memory-amplification payloads are refused, not allocated (C12)") {
    // hand-assembled SPS claiming 4000x4000 MACROBLOCKS (~6 GB of
    // planes): parseSps must reject past the level-5.2 MaxFS ceiling
    // instead of letting decodeSlice allocate (OutOfMemoryError is an
    // Error — the never-throws contract wouldn't catch it)
    class BW { // minimal ue()/u() writer, MSB first
      val out = new java.io.ByteArrayOutputStream(); var cur = 0; var n = 0
      def u1(v: Int): Unit = { cur = (cur << 1) | (v & 1); n += 1
        if (n == 8) { out.write(cur); cur = 0; n = 0 } }
      def u(bits: Int, v: Int): Unit = (bits - 1 to 0 by -1).foreach(i => u1((v >> i) & 1))
      def ue(v: Int): Unit = { val x = v + 1
        val b = 32 - Integer.numberOfLeadingZeros(x); u(b - 1, 0); u(b, x) }
      def bytes: Array[Byte] = { u1(1); while (n != 0) u1(0); out.toByteArray }
    }
    val w = new BW
    w.u(8, 66); w.u(8, 0); w.u(8, 52) // profile/constraints/level
    w.ue(0) // sps_id
    w.ue(0) // log2_max_frame_num_minus4
    w.ue(2) // pic_order_cnt_type
    w.ue(1); w.u1(0) // max_num_ref_frames, gaps flag
    w.ue(3999); w.ue(3999) // 4000x4000 MBs
    w.u1(1); w.u1(0); w.u1(0); w.u1(0) // frame_mbs_only, direct8x8, crop, vui
    val hugeSps = Array[Byte]((3 << 5 | 7).toByte) ++ w.bytes
    val good = H264.encode(IndexedSeq(H264.Plane(16, 16, new Array[Byte](256),
      new Array[Byte](64), new Array[Byte](64))), refreshMbs = 0)
    assert(H264.decodeNals(Seq(hugeSps, good.pps) ++ good.frameNals).isEmpty)
    // ue() overflow: width_minus1 = Int.MaxValue wraps wMbs to
    // Int.MinValue; the NEGATIVE product would sail under the MaxFS cap
    // and "decode" a width-0 frame — must be rejected before the cap
    val w2 = new BW
    w2.u(8, 66); w2.u(8, 0); w2.u(8, 52)
    w2.ue(0); w2.ue(0); w2.ue(2); w2.ue(1); w2.u1(0)
    w2.ue(Int.MaxValue); w2.ue(1) // wMbs = Int.MinValue, hMbs = 2
    w2.u1(1); w2.u1(0); w2.u1(0); w2.u1(0)
    val wrapSps = Array[Byte]((3 << 5 | 7).toByte) ++ w2.bytes
    assert(H264.decodeNals(Seq(wrapSps, good.pps) ++ good.frameNals).isEmpty)
    // stsz memory bomb: a sample COUNT (and fixed-size) far beyond what
    // the file's bytes could hold must not materialize a sizes table
    val mp4 = Multimodal.MediaGen.makeMp4Avc("stsz bound check")
    val idx = {
      var i = -1
      (0 until mp4.length - 4).foreach { p =>
        if (i < 0 && mp4(p) == 's' && mp4(p + 1) == 't' && mp4(p + 2) == 's' &&
          mp4(p + 3) == 'z') i = p
      }
      assert(i > 0); i
    }
    def patched(fixed: Long, count: Long): Array[Byte] = {
      val m = mp4.clone()
      (0 until 4).foreach { k =>
        m(idx + 8 + k) = ((fixed >> (24 - 8 * k)) & 0xFF).toByte // sample_size
        m(idx + 12 + k) = ((count >> (24 - 8 * k)) & 0xFF).toByte // sample_count
      }
      m
    }
    assert(H264.decodeMp4(patched(0L, 0x40000000L)).isEmpty) // variable path
    assert(H264.decodeMp4(patched(0xFFFFFFL, 0x40000000L)).isEmpty) // fixed path
    // the unpatched container still decodes
    assert(H264.decodeMp4(mp4).isDefined)
  }

  test("H.264 full-CAVLC textured encode/decode is pixel-exact (C12)") {
    // deterministic textured content: gradients + hash noise drive real
    // AC coefficients through every nC context and prediction mode
    def textured(wPix: Int, hPix: Int, nFrames: Int): IndexedSeq[H264.Plane] =
      (0 until nFrames).map { f =>
        def pix(x: Int, y: Int, c: Int): Byte = {
          val h = (x * 31 + y * 17 + f * 101 + c * 59) * 2654435761L
          ((x * 2 + y + ((h >>> 33) % 97)).toInt & 0xFF).toByte
        }
        H264.Plane(wPix, hPix,
          Array.tabulate(wPix * hPix)(i => pix(i % wPix, i / wPix, 0)),
          Array.tabulate(wPix / 2 * (hPix / 2))(i => pix(i % (wPix / 2), i / (wPix / 2), 1)),
          Array.tabulate(wPix / 2 * (hPix / 2))(i => pix(i % (wPix / 2), i / (wPix / 2), 2)))
      }
    for {
      (wPix, hPix, nF) <- Seq((16, 16, 1), (48, 32, 3), (64, 48, 2))
      qp <- Seq(20, 28, 36, 44)
    } {
      val frames = textured(wPix, hPix, nF)
      val (enc, expected) = H264.encodeCavlcTextured(frames, qp)
      val dec = H264.decodeNals(Seq(enc.sps, enc.pps) ++ enc.frameNals)
      assert(dec.isDefined, s"decode failed at ${wPix}x$hPix qp=$qp")
      val got = dec.get.frames
      assert(got.length == nF)
      got.zip(expected).zipWithIndex.foreach { case ((g, e), i) =>
        assert(g.y.sameElements(e.y), s"luma mismatch frame $i ${wPix}x$hPix qp=$qp")
        assert(g.cb.sameElements(e.cb), s"cb mismatch frame $i qp=$qp")
        assert(g.cr.sameElements(e.cr), s"cr mismatch frame $i qp=$qp")
      }
      // quality sanity: the match must not be vacuous (all-flat recon).
      // At qp<=28 the transform+quant chain reproduces the texture well.
      if (qp <= 28) {
        val src = frames.head.y.map(_ & 0xFF)
        val rec = got.head.y.map(_ & 0xFF)
        val mad = src.zip(rec).map { case (a, b) => math.abs(a - b) }.sum /
          src.length.toDouble
        assert(mad < 6.0, s"mean abs err $mad at qp=$qp - quant degenerate?")
      }
    }
    // extreme-contrast content at low QP overflows the raw quantizer
    // output past the CAVLC-representable range: the encoder must CLAMP
    // (like every real encoder) and stay pixel-exact, not crash
    val hot = IndexedSeq(H264.Plane(16, 16,
      Array.fill[Byte](256)(255.toByte), Array.fill[Byte](64)(0.toByte),
      Array.fill[Byte](64)(255.toByte)))
    val (encHot, expHot) = H264.encodeCavlcTextured(hot, qp = 10)
    val decHot = H264.decodeNals(Seq(encHot.sps, encHot.pps) ++ encHot.frameNals)
    assert(decHot.isDefined)
    assert(decHot.get.frames.head.y.sameElements(expHot.head.y))
    assert(decHot.get.frames.head.cb.sameElements(expHot.head.cb))
    // the clamped DC level still moves every pixel toward the source
    // (128 -> 144 at qp 10; exactness, not fidelity, is the contract
    // for clamped pathological content)
    assert(decHot.get.frames.head.meanLuma > 140)

    // every generated family explicitly disables the loop filter, so
    // decode is player-exact end to end — filterExact must report true
    assert(decHot.get.filterExact)
    val pcmEnc = H264.encode(IndexedSeq(H264.Plane(16, 16,
      new Array[Byte](256), new Array[Byte](64), new Array[Byte](64))), 0)
    assert(H264.decodeNals(
      Seq(pcmEnc.sps, pcmEnc.pps) ++ pcmEnc.frameNals).get.filterExact)

    // entropy-level integrity: corrupting any single byte of a textured
    // CAVLC slice never throws (clean None or a decoded-but-different
    // frame are both acceptable outcomes for corrupt input)
    val (enc1, _) = H264.encodeCavlcTextured(textured(32, 32, 1), 28)
    val rnd = new scala.util.Random(42)
    (0 until 300).foreach { _ =>
      val mutated = enc1.frameNals.head.clone()
      val pos = 1 + rnd.nextInt(mutated.length - 1)
      mutated(pos) = (mutated(pos) ^ (1 << rnd.nextInt(8))).toByte
      H264.decodeNals(Seq(enc1.sps, enc1.pps, mutated))
    }
  }

  test("H.264 MULTI-SLICE pictures encode/decode pixel-exact (C12 r15)") {
    def textured(wPix: Int, hPix: Int, nFrames: Int): IndexedSeq[H264.Plane] =
      (0 until nFrames).map { f =>
        def pix(x: Int, y: Int, c: Int): Byte = {
          val h = (x * 31 + y * 17 + f * 101 + c * 59) * 2654435761L
          ((x * 2 + y + ((h >>> 33) % 97)).toInt & 0xFF).toByte
        }
        H264.Plane(wPix, hPix,
          Array.tabulate(wPix * hPix)(i => pix(i % wPix, i / wPix, 0)),
          Array.tabulate(wPix / 2 * (hPix / 2))(i => pix(i % (wPix / 2), i / (wPix / 2), 1)),
          Array.tabulate(wPix / 2 * (hPix / 2))(i => pix(i % (wPix / 2), i / (wPix / 2), 2)))
      }
    for {
      (wPix, hPix, nF) <- Seq((32, 64, 2), (48, 48, 1), (64, 96, 3))
      slices <- Seq(2, 3)
      qp <- Seq(20, 28, 36)
      if slices <= hPix / 16
    } {
      val frames = textured(wPix, hPix, nF)
      val (enc, expected) = H264.encodeCavlcTextured(frames, qp, slices)
      // each picture must genuinely be `slices` NALs
      assert(enc.frameNals.length == slices * nF)
      val dec = H264.decodeNals(Seq(enc.sps, enc.pps) ++ enc.frameNals)
      assert(dec.isDefined, s"decode failed ${wPix}x$hPix slices=$slices qp=$qp")
      val got = dec.get.frames
      assert(got.length == nF, s"frame count: ${got.length} != $nF")
      got.zip(expected).zipWithIndex.foreach { case ((g, e), i) =>
        assert(g.y.sameElements(e.y),
          s"luma mismatch frame $i ${wPix}x$hPix slices=$slices qp=$qp")
        assert(g.cb.sameElements(e.cb), s"cb mismatch frame $i slices=$slices")
        assert(g.cr.sameElements(e.cr), s"cr mismatch frame $i slices=$slices")
      }
      // sliced and unsliced encodes agree at the PIXEL level only via
      // their own reconstructions (slice boundaries change prediction);
      // both must track the source at low QP
      if (qp <= 28) {
        val src = frames.head.y.map(_ & 0xFF)
        val rec = got.head.y.map(_ & 0xFF)
        val mad = src.zip(rec).map { case (a, b) => math.abs(a - b) }.sum /
          src.length.toDouble
        assert(mad < 6.0, s"mean abs err $mad slices=$slices qp=$qp")
      }
    }
    // multi-slice GOP (r15): Intra_4x4 IDR + motion-predicted P frames,
    // every picture sliced — MV prediction and the skip-vector zero
    // rule gate on the slice boundary on both codec sides
    def moving(wPix: Int, hPix: Int, nFrames: Int): IndexedSeq[H264.Plane] =
      (0 until nFrames).map { f =>
        def pix(x: Int, y: Int, c: Int): Byte = {
          val sx = x + 2 * f; val sy = y + f
          val hh = (sx * 31 + sy * 17 + c * 59) * 2654435761L
          ((sx * 2 + sy + ((hh >>> 33) % 97)).toInt & 0xFF).toByte
        }
        H264.Plane(wPix, hPix,
          Array.tabulate(wPix * hPix)(i => pix(i % wPix, i / wPix, 0)),
          Array.tabulate(wPix / 2 * (hPix / 2))(i => pix(i % (wPix / 2), i / (wPix / 2), 1)),
          Array.tabulate(wPix / 2 * (hPix / 2))(i => pix(i % (wPix / 2), i / (wPix / 2), 2)))
      }
    for (slices <- Seq(2, 3); subpel <- Seq(false, true)) {
      val fr = moving(32, 64, 3)
      val (encP, expP) = H264.encodeCavlcI4P(fr, qp = 24,
        searchRange = 4, subpelSearch = subpel, slices = slices)
      assert(encP.frameNals.length == slices * 3)
      val decP = H264.decodeNals(Seq(encP.sps, encP.pps) ++ encP.frameNals)
      assert(decP.isDefined, s"I4P multi-slice decode failed slices=$slices subpel=$subpel")
      decP.get.frames.zip(expP).zipWithIndex.foreach { case ((g, e), i) =>
        assert(g.y.sameElements(e.y),
          s"I4P luma mismatch frame $i slices=$slices subpel=$subpel")
        assert(g.cb.sameElements(e.cb) && g.cr.sameElements(e.cr),
          s"I4P chroma mismatch frame $i slices=$slices")
      }
    }

    // container metadata under multi-slice: an ISO-BMFF SAMPLE is one
    // access unit, so the muxed mp4's stts sample count must equal the
    // FRAME count (not slices x frames — the bug the r15 review caught)
    val (mp4ms, expMs, _, slicesMs) =
      graft.operators.Multimodal.MediaGen.makeMp4AvcSliced("sliced sample count check")
    assert(slicesMs >= 2)
    val metaMs = graft.operators.Multimodal.MediaCodec.decodeMp4(mp4ms).get
    assert(metaMs.nSamples == expMs.length,
      s"stts samples ${metaMs.nSamples} != frames ${expMs.length}")
    assert(H264.decodeMp4(mp4ms).get.frames.length == expMs.length)

    // torn multi-slice picture (stream ends mid-picture) → clean None
    val (encT, _) = H264.encodeCavlcTextured(textured(32, 64, 1), 28, slices = 4)
    assert(H264.decodeNals(
      Seq(encT.sps, encT.pps) ++ encT.frameNals.dropRight(1)).isEmpty)
    // non-contiguous slices (gap) → clean None
    assert(H264.decodeNals(
      Seq(encT.sps, encT.pps, encT.frameNals.head, encT.frameNals.last)).isEmpty)
  }

  test("H.264 Intra_4x4 + P-frame encode/decode is pixel-exact (C12)") {
    // textured frames with GLOBAL MOTION: frame f shows the same
    // pattern shifted by (2f, f) pixels plus evolving noise, so the
    // P-frame search finds real vectors and still has residual to code
    def moving(wPix: Int, hPix: Int, nFrames: Int): IndexedSeq[H264.Plane] =
      (0 until nFrames).map { f =>
        def pix(x: Int, y: Int, c: Int): Byte = {
          val sx = x + 2 * f
          val sy = y + f
          val h = (sx * 31 + sy * 17 + c * 59) * 2654435761L
          ((sx * 2 + sy + ((h >>> 33) % 97) + (f * (c + 1)) % 5).toInt & 0xFF).toByte
        }
        H264.Plane(wPix, hPix,
          Array.tabulate(wPix * hPix)(i => pix(i % wPix, i / wPix, 0)),
          Array.tabulate(wPix / 2 * (hPix / 2))(i => pix(i % (wPix / 2), i / (wPix / 2), 1)),
          Array.tabulate(wPix / 2 * (hPix / 2))(i => pix(i % (wPix / 2), i / (wPix / 2), 2)))
      }
    for {
      (wPix, hPix, nF) <- Seq((16, 16, 1), (48, 32, 3), (64, 48, 2))
      qp <- Seq(20, 28, 36)
    } {
      val frames = moving(wPix, hPix, nF)
      val (enc, expected) = H264.encodeCavlcI4P(frames, qp)
      val dec = H264.decodeNals(Seq(enc.sps, enc.pps) ++ enc.frameNals)
      assert(dec.isDefined, s"decode failed at ${wPix}x$hPix qp=$qp")
      val got = dec.get.frames
      assert(got.length == nF)
      got.zip(expected).zipWithIndex.foreach { case ((g, e), i) =>
        assert(g.y.sameElements(e.y), s"luma mismatch frame $i ${wPix}x$hPix qp=$qp")
        assert(g.cb.sameElements(e.cb), s"cb mismatch frame $i qp=$qp")
        assert(g.cr.sameElements(e.cr), s"cr mismatch frame $i qp=$qp")
      }
      assert(dec.get.filterExact)
      if (qp <= 28) {
        val src = frames.head.y.map(_ & 0xFF)
        val rec = got.head.y.map(_ & 0xFF)
        val mad = src.zip(rec).map { case (a, b) => math.abs(a - b) }.sum /
          src.length.toDouble
        assert(mad < 6.0, s"mean abs err $mad at qp=$qp - quant degenerate?")
      }
    }
    // a STATIC scene: when a P source equals the reference
    // reconstruction (decoded-loop content), every macroblock satisfies
    // the 8.4.1.1 skip conditions and the P frame collapses to one
    // skip run (a few bytes)
    val still = moving(64, 48, 1)
    val (_, rec0) = H264.encodeCavlcI4P(IndexedSeq(still.head), 28)
    val staticFrames = IndexedSeq(still.head, rec0.head, rec0.head)
    val (encS, expS) = H264.encodeCavlcI4P(staticFrames, 28)
    assert(encS.frameNals(1).length < 16,
      s"static P frame should be a bare skip run, got ${encS.frameNals(1).length}B")
    val decS = H264.decodeNals(Seq(encS.sps, encS.pps) ++ encS.frameNals)
    assert(decS.isDefined)
    decS.get.frames.zip(expS).foreach { case (g, e) =>
      assert(g.y.sameElements(e.y) && g.cb.sameElements(e.cb) &&
        g.cr.sameElements(e.cr))
    }
    // corrupting any single byte of an I4/P stream never throws
    val (enc1, _) = H264.encodeCavlcI4P(moving(32, 32, 2), 28)
    val rnd = new scala.util.Random(7)
    (0 until 300).foreach { _ =>
      val fi = rnd.nextInt(2)
      val mutated = enc1.frameNals(fi).clone()
      val pos = 1 + rnd.nextInt(mutated.length - 1)
      mutated(pos) = (mutated(pos) ^ (1 << rnd.nextInt(8))).toByte
      H264.decodeNals(Seq(enc1.sps, enc1.pps) ++
        enc1.frameNals.updated(fi, mutated))
    }
  }

  test("H.264 Intra_4x4 prediction formulas and MV predictors (C12)") {
    // mode formulas against hand-computed vectors: T = 10,20,30,40
    // (TR absent -> 40 substituted), L = 50,60,70,80, X = 90
    val px: (Int, Int) => Int = {
      case (-1, -1) => 90
      case (x, -1) => 10 * (x + 1)
      case (-1, y) => 50 + 10 * y
      case _ => fail("pred read inside block")
    }
    val pxT: (Int, Int) => Int = { case (x, -1) => 10 * (x + 1); case _ => fail("x") }
    // Vertical: rows repeat T
    assert(H264.predIntra4x4(0, hasL = false, hasT = true, hasTR = false, pxT)
      .toSeq == Seq(10, 20, 30, 40, 10, 20, 30, 40, 10, 20, 30, 40, 10, 20, 30, 40))
    // DC over both sides: (10+20+30+40+50+60+70+80+4)>>3 = 45
    assert(H264.predIntra4x4(2, hasL = true, hasT = true, hasTR = false, px)
      .forall(_ == 45))
    // DC with nothing available = 128
    assert(H264.predIntra4x4(2, hasL = false, hasT = false, hasTR = false,
      (_, _) => fail("no neighbors")).forall(_ == 128))
    // Diagonal Down-Left with substituted top-right (T4..7 = 40):
    // pred[0,0] = (T0 + 2T1 + T2 + 2) >> 2 = (10+40+30+2)>>2 = 20
    // pred[3,3] = (T6 + 3*T7 + 2) >> 2 = (40 + 120 + 2) >> 2 = 40
    val ddl = H264.predIntra4x4(3, hasL = false, hasT = true, hasTR = false, pxT)
    assert(ddl(0) == 20 && ddl(15) == 40)
    // Horizontal-Up: pred[0,0] = (L0+L1+1)>>1 = 55; bottom-right = L3
    val hu = H264.predIntra4x4(8, hasL = true, hasT = false, hasTR = false, px)
    assert(hu(0) == 55 && hu(15) == 80)
    // Diagonal Down-Right main diagonal = (T0 + 2X + L0 + 2)>>2
    val ddr = H264.predIntra4x4(4, hasL = true, hasT = true, hasTR = false, px)
    assert(ddr(0) == ((10 + 180 + 50 + 2) >> 2))
    assert(ddr(5) == ddr(0) && ddr(10) == ddr(0) && ddr(15) == ddr(0))

    // --- 8.4.1.3 median MV prediction on a 3x2 MB grid
    val mvx = Array(4, 8, 16, 0, 0, 0)
    val mvy = Array(0, -4, 4, 0, 0, 0)
    val inter = Array(true, true, true, false, false, false)
    // mb 4 (mid bottom): A=mb3 (intra -> 0), B=mb1, C=mb2 -> more than
    // one match -> median(0, 8, 16)=8, median(0, -4, 4)=0
    assert(H264.mvPred16x16(mvx, mvy, inter, 4, 3, 4) == ((8, 0)))
    // mb 1 top row: B,C,D unavailable, A available -> mvA
    assert(H264.mvPred16x16(mvx, mvy, inter, 1, 3, 1) == ((4, 0)))
    // exactly-one-match: A intra, B inter, C(D) intra -> B's mv
    val inter2 = Array(false, true, false, false, false, false)
    assert(H264.mvPred16x16(mvx, mvy, inter2, 4, 3, 4) == ((8, -4)))
    // skip rule: left neighbor zero-MV inter -> skip MV is (0,0)
    val zx = Array(0, 8, 8, 0, 0, 0)
    val zy = Array(0, 4, 4, 0, 0, 0)
    val zi = Array(true, true, true, true, false, false)
    assert(H264.skipMv(zx, zy, zi, 4, 3, 4) == ((0, 0)))
    // skip rule: all neighbors moving -> the median prediction
    val mx2 = Array(8, 8, 8, 8, 0, 0)
    val my2 = Array(4, 4, 4, 4, 0, 0)
    val mi2 = Array(true, true, true, true, false, false)
    assert(H264.skipMv(mx2, my2, mi2, 4, 3, 4) == ((8, 4)))
    // edge MB (no left or above) -> (0,0)
    assert(H264.skipMv(mx2, my2, mi2, 0, 3, 0) == ((0, 0)))
  }

  test("keepBestPerCluster keeps the argmax per cluster, passes singletons (C34)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", 100L), (2L, "en", 300L), (3L, "de", 300L), // cluster A
      (4L, "fr", 50L), (5L, "fr", 60L), // cluster B
      (6L, "en", 10L), (7L, "de", 999L) // unclustered
    ).toDF("doc_id", "lang", "n_chars")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L))
      .toDF("doc_id", "cluster_id")
    val kept = Dedup.keepBestPerCluster(docs, clusters, "doc_id",
        col("n_chars"))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    // cluster A: 2 and 3 tie at 300 -> smaller id 2 wins; cluster B: 5
    assert(kept == Seq(2L, 5L, 6L, 7L))
  }

  test("keepBestPerCluster leaves the loser join strategy to AQE by default (C34)") {
    import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Join}
    val docs = Seq(
      (1L, 100L), (2L, 300L), (3L, 300L), (4L, 50L), (5L, 60L), (6L, 10L)
    ).toDF("doc_id", "n_chars")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L))
      .toDF("doc_id", "cluster_id")
    val kept = Dedup.keepBestPerCluster(docs, clusters, "doc_id", col("n_chars"))
    // no join in the default plan carries a forced strategy hint — AQE
    // (or stats) picks broadcast only when the loser side is actually
    // small, so a corpus-sized loser set can never OOM the driver
    val hints = kept.queryExecution.optimizedPlan.collect { case j: Join => j.hint }
    assert(hints.nonEmpty)
    assert(hints.forall(h => h.leftHint.isEmpty && h.rightHint.isEmpty),
      s"unexpected forced join hints: $hints")
    assert(kept.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(2L, 5L, 6L))
    // the opt-in still forces the hint for callers with bounded losers
    val forced = Dedup.keepBestPerCluster(docs, clusters, "doc_id",
      col("n_chars"), broadcastLosers = true)
    val forcedHints = forced.queryExecution.optimizedPlan.collect { case j: Join => j.hint }
    assert(forcedHints.exists(h =>
      h.rightHint.exists(_.strategy.contains(BROADCAST)) ||
        h.leftHint.exists(_.strategy.contains(BROADCAST))))
    assert(forced.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(2L, 5L, 6L))
  }

  test("minhashCandidates bounds saturated buckets with star edges (C2)") {
    // a 1e5-copy duplicate family: uncapped banding would emit
    // ~bands * f^2 / 2 = 4e10 candidate rows; the occupancy cap must
    // degrade every saturated bucket to f-1 star edges through the
    // min-id hub instead
    val fam = spark.range(100000L)
      .select(col("id").as("doc_id"), lit(base).as("text"))
    val sigs = Dedup.minhashSignatures(fam, "text", "doc_id", k = 32, w = 3)
    val cand = Dedup.minhashCandidates(sigs, "doc_id", k = 32, bands = 8,
      maxBucket = 100)
    // identical docs -> identical signatures -> one bucket per band, all
    // saturated; every band's star set is the same f-1 edges from hub 0
    assert(cand.count() == 99999L)
    assert(cand.agg(max(col("id_a"))).head.getLong(0) == 0L)
    // star edges keep the family one connected component
    val nClusters = Dedup.connectedComponentsStar(cand)
      .agg(countDistinct(col("cluster_id"))).head.getLong(0)
    assert(nClusters == 1L)
  }

  test("minhashCandidates sub-cap buckets still emit all pairs (C2)") {
    // mixed corpus: a saturated 300-copy family under cap 100 plus a
    // sub-cap near-dup pair; the pair must come through the all-pairs
    // path untouched
    val longBase = (base + " " + base.reverse.toLowerCase.filter(c => c.isLetter || c == ' '))
      .split(' ').take(30).mkString(" ")
    val nearDup = longBase + " extra"
    val fam = spark.range(1000L, 1300L)
      .select(col("id").as("doc_id"), lit(base).as("text"))
    val df = Seq((1L, longBase), (2L, nearDup)).toDF("doc_id", "text")
      .unionByName(fam)
    val pairs = Dedup.minhashPairs(df, "text", "doc_id",
      k = 32, bands = 16, w = 3, threshold = 0.3, maxBucket = 100)
    val famEdges = pairs.filter(col("id_a") >= 1000L)
    // saturated family: exactly f-1 hub edges, all verified at jaccard 1
    assert(famEdges.count() == 299L)
    assert(famEdges.agg(min(col("jaccard"))).head.getDouble(0) == 1.0)
    assert(pairs.filter(col("id_a") === 1L && col("id_b") === 2L).count() == 1L)
  }

  test("Misra-Gries heavy hitters equal the exact answer across layouts (C33)") {
    import spark.implicits._
    // skewed synthetic stream: term t_i has frequency ~ 4000/i (Zipf),
    // plus a long tail of singletons that must NOT displace true HHs
    val items = (1 to 50).flatMap(i => Seq.fill(4000 / i)(s"t$i")) ++
      (0 until 5000).map(i => s"noise$i")
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = items.size
    val minShare = 0.004
    val expect = exact.filter(_._2 >= math.ceil(minShare * n))
      .toSeq.sortBy { case (v, c) => (-c, v) }
    for (parts <- Seq(1, 7, 32)) {
      val ds = spark.createDataset(items).repartition(parts)
      val got = Sketches.heavyHitters(ds, capacity = 300, minShare = minShare)
        .orderBy(col("n").desc, col("value"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got == expect, s"parts=$parts: ${got.take(3)} vs ${expect.take(3)}")
    }
    // capacity below the guarantee line is refused, not silently lossy —
    // INCLUDING the exact boundary (capacity+1 == 1/minShare, where a
    // term at precisely the threshold frequency could be evicted) and
    // the float-rounding hazard just under it
    intercept[IllegalArgumentException] {
      Sketches.heavyHitters(spark.createDataset(items), 100, minShare)
    }
    intercept[IllegalArgumentException] {
      Sketches.heavyHitters(spark.createDataset(items), 249, minShare)
    }
    intercept[IllegalArgumentException] {
      Sketches.heavyHitters(spark.createDataset(items), 250, minShare)
    }
  }

  test("filterExact reports false for streams that leave the loop filter on (C12)") {
    // hand-built PPS with deblocking_filter_control_present_flag = 0
    // (the common foreign layout: loop filter implicitly ON) + a PCM
    // slice carrying no deblocking syntax — decode must succeed but
    // must NOT claim player-pixel parity
    val w = new H264.BitWriter
    w.ue(0); w.ue(0); w.u1(0); w.u1(0); w.ue(0); w.ue(0); w.ue(0)
    w.u1(0); w.u(2, 0); w.se(0); w.se(0); w.se(0)
    w.u1(0) // deblocking_filter_control_present_flag = 0
    w.u1(0); w.u1(0)
    w.rbspTrailing()
    val pps0 = Array[Byte]((3 << 5 | 8).toByte) ++ H264.escape(w.toBytes)
    val sw = new H264.BitWriter
    sw.ue(0); sw.ue(7); sw.ue(0); sw.u(4, 0) // first_mb/slice_type/pps/frame_num
    sw.ue(0); sw.u1(0); sw.u1(0) // idr_pic_id + IDR flags
    sw.se(0) // slice_qp_delta; NO deblocking fields follow (flag 0)
    sw.ue(25) // mb_type I_PCM
    sw.byteAlignZero()
    (0 until 384).foreach(_ => sw.writeByteAligned(128))
    sw.rbspTrailing()
    val slice = Array[Byte]((3 << 5 | 5).toByte) ++ H264.escape(sw.toBytes)
    val sps16 = H264.encode(IndexedSeq(H264.Plane(16, 16,
      new Array[Byte](256), new Array[Byte](64), new Array[Byte](64))), 0).sps
    val dec = H264.decodeNals(Seq(sps16, pps0, slice))
    assert(dec.isDefined, "filter-on stream must still decode")
    assert(!dec.get.filterExact, "filter-on stream must not claim parity")
    assert(dec.get.frames.head.y.forall(_ == 128.toByte))
  }

  test("withRealMedia: generated PNG/WAV/MP4 decode to closed-form features (C12)") {
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "x"), (3L, ""),
      (4L, "the quick brown fox jumps over the lazy dog repeatedly and often"))
      .toDF("doc_id", "text")
    val feats = Multimodal.extractFeatures(spark,
        Multimodal.withRealMedia(spark, docs))
      .collect().map(f => f.doc_id -> f).toMap
    val texts = Map(1L -> "alpha beta gamma delta", 2L -> "x", 3L -> "",
      4L -> "the quick brown fox jumps over the lazy dog repeatedly and often")
    texts.foreach { case (id, text) =>
      val n = text.length
      val f = feats(id)
      Multimodal.MediaGen.mediaBucket(text) match {
        case 0 =>
          assert(f.media_type == "image" &&
            (f.width, f.height, f.n_frames) == (16 + n % 32, 16 + (n / 32) % 32, 1))
        case 1 =>
          assert(f.media_type == "audio" &&
            (f.width, f.height, f.n_frames) == (8000, 1, n))
        case _ =>
          assert(f.media_type == "video" &&
            (f.width, f.height, f.n_frames) == (640, 360, 1 + n % 240))
      }
    }
  }

  test("real decode flows through the distributed feature/resize path (C12)") {
    val png = makePng(20, 10, (x, y) => (x * 12 << 16) | (y * 25 << 8) | 3)
    val wav = makeWav(16000, 1, 320, _ => 1000.toShort)
    val media = Seq(
      (1L, "image", png),
      (2L, "audio", wav),
      (3L, "video", Array[Byte](1, 2, 3, 4, 5, 6, 7, 8))) // stub path
      .toDF("doc_id", "media_type", "media")
      .withColumn("n_bytes", length(col("media")).cast("long"))
      .withColumn("checksum", xxhash64(col("media")))
    val feats = Multimodal.extractFeatures(spark, media)
      .collect().map(f => f.doc_id -> f).toMap
    assert((feats(1L).width, feats(1L).height, feats(1L).n_frames) == (20, 10, 1))
    assert((feats(2L).width, feats(2L).height, feats(2L).n_frames) == (16000, 1, 320))
    assert(feats(3L).width >= 64) // video falls back to the stand-in
    // distributed resize: output is a real PNG at the target dims with
    // bilinear-resampled pixels
    val resized = Multimodal.resize(spark, media.filter(col("doc_id") === 1L), 5, 5)
      .collect().head
    val out = Multimodal.MediaCodec.decodeImage(resized.resized).get
    assert(out.getWidth == 5 && out.getHeight == 5)
    assert((out.getRGB(0, 0) & 0xFF) == 3) // blue plane constant survives
  }

  test("contamination: planted probe overlap found, clean docs survive") {
    import graft.operators.Contamination
    val probeText = "the secret benchmark question about spark shuffles and joins"
    val corpus = Seq(
      (1L, "intro text " + probeText + " trailing words here"), // contaminated
      (2L, "totally unrelated document about cooking pasta al dente tonight"),
      (3L, probeText)) // exact copy
      .toDF("doc_id", "text")
    val probes = Seq((100L, probeText)).toDF("probe_id", "text")
    val overlap = Contamination.ngramOverlap(corpus, probes)
      .orderBy("doc_id").collect()
    assert(overlap.map(_.getLong(0)).toSeq == Seq(1L, 3L))
    assert(overlap.find(_.getLong(0) == 3L).get.getDouble(3) == 1.0)
    val clean = Contamination.decontaminate(corpus, probes, threshold = 0.5)
    assert(clean.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("asof join picks latest right row at-or-before each left ts") {
    import graft.operators.Temporal
    val left = Seq((1L, 10L, "p1"), (1L, 25L, "p2"), (2L, 5L, "p3"))
      .toDF("k", "ts", "label")
    val right = Seq((1L, 10L, 100.0, 1L), (1L, 20L, 200.0, 2L),
      (1L, 30L, 300.0, 3L), (3L, 1L, 999.0, 4L))
      .toDF("k", "ts", "v", "rid")
    val out = Temporal.asofJoin(left, right, Seq("k"), "ts", "ts",
      rightCols = Seq("v", "rid"), tieBreak = "rid")
      .orderBy("label").collect()
    // p1: ts=10 -> right ts=10 (inclusive) v=100
    assert(out(0).getString(2) == "p1" && out(0).getDouble(3) == 100.0)
    // p2: ts=25 -> right ts=20 v=200
    assert(out(1).getString(2) == "p2" && out(1).getDouble(3) == 200.0)
    // p3: key 2 has no right rows -> nulls
    assert(out(2).getString(2) == "p3" && out(2).isNullAt(3))
  }

  test("ivf ann finds a planted duplicate via probed lists") {
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 100L).map(i => (i, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    val planted = (100L, vecs(5)._2.map(x => x * 3f)) // scaled copy of vec 5
    val df = (vecs :+ planted).toDF("vec_id", "embedding")
    val out = Similarity.ivfTopK(df, df.filter($"vec_id" === 5), "vec_id", "embedding",
      k = 3, nLists = 8, nprobe = 3).collect()
    assert(out.nonEmpty)
    // the scaled copy lands in the same list as its source and ranks first
    assert(out.head.getLong(2) == 100L && out.head.getDouble(3) == 1.0)
  }

  test("kmeans centroids: k rows, dims preserved, deterministic, lossless fallback") {
    val rnd = new scala.util.Random(11)
    val df = (0L until 60L).map(i => (i, Array.fill(8)(rnd.nextDouble() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val c = df.select($"vec_id".as("neighbor_id"),
      transform($"embedding", x => x.cast("double")).as("v_c"))
    val cents = Similarity.kmeansCentroids(c, nLists = 4, iters = 2)
    val rows = cents.orderBy("centroid_id").collect()
    assert(rows.length == 4)
    assert(rows.forall(_.getSeq[Double](1).length == 8))
    // deterministic: a second evaluation yields identical vectors
    val rows2 = Similarity.kmeansCentroids(c, nLists = 4, iters = 2)
      .orderBy("centroid_id").collect()
    assert(rows.map(_.getSeq[Double](1)).toSeq == rows2.map(_.getSeq[Double](1)).toSeq)
  }

  test("repetition signals: boilerplate vs distinct text, short docs dropped (C20)") {
    val docs = Seq(
      (1L, "a b a b a b"), // 2-grams: ab,ba,ab,ba,ab -> top 3/5; 3-grams all dup -> 4/4
      (2L, "v w x y z"), //   all grams distinct -> top2 1/4, dup3 0/3
      (3L, "x y")) //         < 3 words: dropped
      .toDF("doc_id", "text")
    val r = TextAnalysis.repetitionSignals(docs).orderBy("doc_id").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(r(0).getLong(1) == 6L && r(0).getDouble(2) == 0.6 && r(0).getDouble(3) == 1.0)
    assert(r(1).getLong(1) == 5L && r(1).getDouble(2) == 0.25 && r(1).getDouble(3) == 0.0)
  }

  test("int8 quantize: scale to ±127, floor(x+0.5) rounding, zero vector (C21)") {
    val df = Seq(
      (1L, Seq(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("q"))
      .orderBy("vec_id")
    assert(df.schema("q").dataType.simpleString == "array<tinyint>")
    val r = df.collect()
    // scale 127/1.0: floor(63.5+0.5)=64, floor(-127+0.5)=-127, floor(31.75+0.5)=32
    assert(r(0).getSeq[Byte](1) == Seq[Byte](64, -127, 32, 0))
    assert(r(1).getSeq[Byte](1) == Seq[Byte](0, 0, 0, 0))
  }

  test("quantizedTopK ranks a planted identical vector first, integer dots (C21)") {
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(0.99f, 0.01f, 0.0f)), // near-identical to 1
      (3L, Seq(0.0f, 1.0f, 0.0f)),
      (4L, Seq(0.0f, 0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val top = Similarity
      .quantizedTopK(corpus, corpus.filter(col("vec_id") === 1L), "vec_id", "embedding", 2)
      .collect()
    assert(top.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 1L, 2L), (1L, 2L, 3L)))
    // q1=[127,0,0], q2=[127,1,0] -> dot exactly 127*127
    assert(top(0).getLong(3) == 127L * 127L)
  }

  test("shardByTokenBudget: contiguous budget chunks reset per group (C22)") {
    val docs = Seq(
      (1L, "en", "a b c"), //     3 tok, 0 before  -> shard 0
      (2L, "en", "d e f g"), //   4 tok, 3 before  -> shard 0
      (3L, "en", "h i"), //       2 tok, 7 before  -> shard 1 (budget 5)
      (4L, "fr", "x y z w v u")) // other group starts at shard 0
      .toDF("doc_id", "lang", "text")
    val r = Sampling.shardByTokenBudget(docs, "lang", "doc_id", "text", 5)
      .select(col("doc_id"), col("shard_id")).orderBy("doc_id").collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toSeq
    assert(r == Seq(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 0L))
  }

  test("chunkByTokens: stride windows, short tail, single chunk when doc fits (C23)") {
    val docs = Seq(
      (1L, (1 to 9).map(i => s"t$i").mkString(" ")), // 9 tok, size 4 stride 3:
      //   chunks [t1..t4], [t4..t7], [t7..t9] (tail of 3)
      (2L, "a b c")) //                                 fits in one chunk
      .toDF("doc_id", "text")
    val r = TextAnalysis.chunkByTokens(docs, "doc_id", "text", chunkSize = 4, overlap = 1)
      .orderBy("doc_id", "chunk_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2)))
    assert(r.toSeq == Seq(
      (1L, 0L, "t1 t2 t3 t4"), (1L, 1L, "t4 t5 t6 t7"), (1L, 2L, "t7 t8 t9"),
      (2L, 0L, "a b c")))
  }

  test("chunkByTokens: null text yields one empty chunk, not a dropped row (C23)") {
    val docs = Seq((1L, null.asInstanceOf[String]), (2L, "x y"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.chunkByTokens(docs, "doc_id", "text", chunkSize = 4, overlap = 1)
      .orderBy("doc_id", "chunk_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2)))
    assert(r.toSeq == Seq((1L, 0L, ""), (2L, 0L, "x y")))
  }

  test("sampleKPerGroup: deterministic, null keys don't vanish, rnk input refused (C24)") {
    val docs = (1 to 50).map(i => (if (i <= 48) i.toLong else -1L, "en"))
      .map { case (id, g) => (if (id < 0) None else Some(id), g) }
      .toDF("doc_id", "lang")
    def draw(k: Int) = Sampling.sampleKPerGroup(docs, "lang", "doc_id", k, "s")
      .select("smp_rank", "doc_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    val a = draw(10)
    assert(a.size == 10 && a == draw(10))
    // k >= group size keeps every row: the null-keyed row must be IN the
    // sample (hashed as empty string), not silently dropped
    assert(draw(49).exists(_._2 == -1L))
    val withRnk = docs.withColumn("rnk", lit(1))
    assertThrows[IllegalArgumentException] {
      Sampling.sampleKPerGroup(withRnk, "lang", "doc_id", 3)
    }
  }

  test("simhashPairs saturated buckets degrade to hub-star, keep the family connected (r14)") {
    // one mega-family: 100 identical texts collapse into ONE (band,
    // value) bucket per band — pre-r14 this went full all-pairs
    val fam = (0L until 100L).map(i => (i, base)).toDF("doc_id", "text")
    val starred = Dedup.simhashPairs(fam, "text", "doc_id",
      maxHamming = 3, maxBucket = 10).collect()
    // saturated: probe side keeps only the min-id hub -> exactly the
    // 99 (hub, member) edges, every member at hamming 0 from the hub
    assert(starred.length == 99)
    assert(starred.forall(r => r.getLong(0) == 0L && r.getLong(2) == 0L))
    val cc = Dedup.connectedComponentsStar(
      Dedup.simhashPairs(fam, "text", "doc_id", maxHamming = 3,
        maxBucket = 10).select("id_a", "id_b")).collect()
    assert(cc.length == 100 && cc.map(_.getLong(1)).distinct.sameElements(Array(0L)))
    // under the cap the exact pigeonhole pair set is unchanged
    val allPairs = Dedup.simhashPairs(fam, "text", "doc_id",
      maxHamming = 3, maxBucket = 1000).count()
    assert(allPairs == 100L * 99 / 2)
  }
}
