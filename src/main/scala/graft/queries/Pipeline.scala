package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Training-data pipeline operators (SURVEY.md §2 C) as driver-gate
  * queries, every one oracle-matched — engine-specific internals
  * (signature/LSH/PQ values) gate through structural or recall
  * contracts the oracle CAN assert rather than rows-only checks.
  */
object Pipeline {
  import Tables.t

  val withOracle: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(

    // C1: exact dedup (keep smallest doc_id per identical text).
    "dedup_exact" -> ((
      (s: SparkSession, d: String) => {
        Dedup.exact(t(s, d, "documents"), Seq("text"), "doc_id")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
          .orderBy(col("lang"))
      },
      """SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM (SELECT * FROM documents
        |      QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1) deduped
        |GROUP BY lang ORDER BY lang""".stripMargin)),

    // C10: token counting (whitespace + BPE-ish regex pieces).
    "text_tokens" -> ((
      (s: SparkSession, d: String) => {
        TextAnalysis.tokenCounts(t(s, d, "documents"))
          .groupBy(col("lang"))
          .agg(sum(col("n_tokens")).as("total_tokens"),
            sum(col("n_bpeish")).as("total_bpeish"),
            round(avg(col("n_tokens")), 4).as("avg_tokens"))
          .orderBy(col("lang"))
      },
      """SELECT lang,
        |  CAST(sum(len(regexp_split_to_array(lower(trim(text)), '\s+'))) AS BIGINT) AS total_tokens,
        |  CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS total_bpeish,
        |  round(avg(len(regexp_split_to_array(lower(trim(text)), '\s+'))), 4) AS avg_tokens
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    // C10 upgrade: REAL byte-pair-merge token counts under the pinned
    // build-time merge table; the oracle replays the greedy merge loop
    // per distinct word with a recursive CTE (one leftmost-lowest-rank
    // merge per iteration — equivalent to the reference merge-all step
    // for any trained table, since a merge involving a composite symbol
    // always ranks after the merge that created it).
    "text_tokens_bpe" -> ((
      (s: SparkSession, d: String) => {
        TextAnalysis.tokenCounts(t(s, d, "documents"),
            bpeMerges = Some(graft.functions.Bpe.PinnedMerges))
          .select(col("doc_id"), col("n_bpe"))
          .orderBy(col("doc_id"))
      },
      {
        val merges = graft.functions.Bpe.PinnedMerges
        val keys = merges.map { case (l, r) =>
          s"'$l' || chr(31) || '$r'"
        }.mkString(", ")
        val vals = merges.indices.mkString(", ")
        s"""WITH RECURSIVE
           |mm AS (SELECT map([$keys], [$vals]) AS m),
           |words AS (
           |  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
           |  FROM documents
           |),
           |vocab AS (SELECT DISTINCT w FROM words),
           |bpe(w, syms) AS (
           |  SELECT w, list_transform(generate_series(1, length(w)), i -> w[i]) FROM vocab
           |  UNION ALL
           |  SELECT w, syms[1:pos-1] || [syms[pos] || syms[pos+1]] || syms[pos+2:len(syms)]
           |  FROM (
           |    SELECT w, syms,
           |      list_position(rks, list_aggregate(rks, 'min')) AS pos,
           |      list_aggregate(rks, 'min') AS best
           |    FROM (
           |      SELECT w, syms,
           |        list_transform(generate_series(1, len(syms) - 1),
           |          i -> coalesce(m[syms[i] || chr(31) || syms[i+1]][1], 1000000)) AS rks
           |      FROM bpe, mm
           |    )
           |  )
           |  WHERE best < 1000000
           |),
           |enc AS (SELECT w, min(len(syms)) AS n FROM bpe GROUP BY w)
           |SELECT d.doc_id, CAST(sum(e.n) AS BIGINT) AS n_bpe
           |FROM words d JOIN enc e USING (w)
           |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin
      })),

    // C10 end-to-end: CORPUS-TRAINED BPE. The distributed vocabulary
    // extraction + Sennrich merge loop (TextAnalysis.trainBpeMerges)
    // runs at the gate's own SF, documents are encoded under the table
    // it just learned, and the oracle independently REPLAYS THE
    // TRAINING in SQL: a recursive CTE carries (word, enc) state on a
    // single-char symbol alphabet (merged symbols get private-use-area
    // chars, so string replace() IS the left-to-right merge-all step),
    // each step aggregates pair frequencies over the working table and
    // applies the (count desc, pair lex asc) argmax until no pair
    // occurs twice or 160 merges — the same stopping rule as the
    // trainer. Output pins the per-doc trained-token counts AND an md5
    // of the full merge table, so a divergence anywhere in vocabulary
    // selection, tie-breaking, merge application, or encoding fails
    // the hash.
    "text_tokens_bpe_trained" -> ((
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        // The oracle replays training over ALL distinct words, while
        // trainBpeMerges keeps the top-65536 by (f desc, w): the gate
        // is only equivalent below the cap, so the trainer itself
        // asserts its vocab stayed uncapped (derived from its own
        // collection — no extra corpus scan in the timed gate body).
        // The (f desc, w) tie-break also assumes ASCII-ish tokens,
        // where UTF-16 and UTF-8 orderings coincide.
        val merges = TextAnalysis.trainBpeMerges(docs, requireUncapped = true)
        TextAnalysis.tokenCounts(docs, bpeMerges = Some(merges))
          .select(col("doc_id"), col("n_bpe").as("n_bpe_trained"),
            md5(lit(merges.map { case (l, r) => s"$l $r" }.mkString("\n")))
              .as("merges_md5"))
          .orderBy(col("doc_id"))
      },
      """WITH RECURSIVE
        |words AS (
        |  SELECT w, count(*)::BIGINT AS f FROM (
        |    SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
        |    FROM documents) WHERE w <> '' GROUP BY w
        |),
        |st(kind, iter, w, f, enc, c, s, l, r, rnk) AS (
        |  SELECT 'w', 0, w, f, w,
        |         NULL::VARCHAR, NULL::VARCHAR, NULL::VARCHAR, NULL::VARCHAR, NULL::INT
        |  FROM words
        |  UNION ALL
        |  (
        |    WITH prev AS (SELECT * FROM st),
        |    pairs AS (
        |      SELECT substring(p.enc, gs.i, 2) AS p2, sum(p.f) AS n
        |      FROM prev p, lateral (SELECT unnest(generate_series(1, length(p.enc) - 1)) AS i) gs
        |      WHERE p.kind = 'w' AND length(p.enc) > 1
        |      GROUP BY 1
        |    ),
        |    dict AS (SELECT c, s FROM prev WHERE kind = 'm'),
        |    best AS (
        |      SELECT p2, n,
        |        coalesce(dl.s, substring(p2, 1, 1)) AS l_str,
        |        coalesce(dr.s, substring(p2, 2, 1)) AS r_str
        |      FROM pairs
        |      LEFT JOIN dict dl ON dl.c = substring(p2, 1, 1)
        |      LEFT JOIN dict dr ON dr.c = substring(p2, 2, 1)
        |      WHERE n >= 2
        |      ORDER BY n DESC, l_str ASC, r_str ASC
        |      LIMIT 1
        |    ),
        |    k AS (SELECT coalesce(max(iter), 0) AS k FROM prev),
        |    gate AS (SELECT * FROM best, k WHERE k.k < 160)
        |    SELECT * FROM (
        |      SELECT 'w' AS kind, k.k + 1 AS iter, p.w, p.f,
        |        replace(p.enc, g.p2, chr(57344 + k.k)) AS enc,
        |        NULL::VARCHAR AS c, NULL::VARCHAR AS s,
        |        NULL::VARCHAR AS l, NULL::VARCHAR AS r, NULL::INT AS rnk
        |      FROM prev p, gate g, k WHERE p.kind = 'w'
        |      UNION ALL
        |      SELECT 'm', k.k + 1, NULL, NULL, NULL, p.c, p.s, p.l, p.r, p.rnk
        |      FROM prev p, gate g, k WHERE p.kind = 'm'
        |      UNION ALL
        |      SELECT 'm', k.k + 1, NULL, NULL, NULL,
        |        chr(57344 + k.k), g.l_str || g.r_str, g.l_str, g.r_str, k.k
        |      FROM gate g, k
        |    )
        |  )
        |),
        |fin AS (SELECT * FROM st WHERE iter = (SELECT max(iter) FROM st)),
        |tbl AS (
        |  SELECT md5(coalesce(string_agg(l || ' ' || r, chr(10) ORDER BY rnk), ''))
        |    AS merges_md5
        |  FROM fin WHERE kind = 'm'),
        |docw AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
        |  FROM documents)
        |SELECT d.doc_id,
        |  CAST(sum(coalesce(length(f.enc), 0)) AS BIGINT) AS n_bpe_trained,
        |  tbl.merges_md5
        |FROM docw d
        |LEFT JOIN (SELECT w, enc FROM fin WHERE kind = 'w') f USING (w)
        |CROSS JOIN tbl
        |GROUP BY d.doc_id, tbl.merges_md5
        |ORDER BY d.doc_id""".stripMargin)),

    // C9: per-document quality metrics.
    "text_quality" -> ((
      (s: SparkSession, d: String) => {
        TextAnalysis.qualityScore(t(s, d, "documents"))
          .select(col("doc_id"), col("n_words"), col("avg_word_len"),
            col("punct_ratio"), col("stopword_ratio"), col("distinct_ratio"),
            col("quality_score"))
          .orderBy(col("doc_id"))
      },
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS n_words,
        |    round(length(text)::DOUBLE /
        |      greatest(len(regexp_split_to_array(lower(trim(text)), '\s+')), 1), 4) AS avg_word_len,
        |    round(length(regexp_replace(text, '[^.!?,;:]', '', 'g'))::DOUBLE /
        |      greatest(length(text), 1), 4) AS punct_ratio,
        |    round(length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE /
        |      greatest(length(text), 1), 4) AS digit_ratio,
        |    round(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
        |        x -> x IN ('the','a','of','and','to','in','is','it')))::DOUBLE /
        |      greatest(len(regexp_split_to_array(lower(trim(text)), '\s+')), 1), 4) AS stopword_ratio,
        |    round(len(list_distinct(regexp_split_to_array(lower(trim(text)), '\s+')))::DOUBLE /
        |      greatest(len(regexp_split_to_array(lower(trim(text)), '\s+')), 1), 4) AS distinct_ratio
        |  FROM documents)
        |SELECT doc_id, n_words, avg_word_len, punct_ratio, stopword_ratio,
        |  distinct_ratio,
        |  round(least(1.0, greatest(0.0,
        |    0.25 * least(n_words / 100.0, 1.0)
        |    + 0.25 * distinct_ratio
        |    + 0.25 * (1.0 - punct_ratio)
        |    + 0.25 * (1.0 - digit_ratio))), 6) AS quality_score
        |FROM m ORDER BY doc_id""".stripMargin)),

    // C31: source-level curation — per-source quality profile with the
    // keep decision computed in exact integer arithmetic (the 6-decimal
    // quality grid scaled to 1e6), so the aggregate is accumulation-
    // order-independent and the oracle replays it bit-for-bit.
    "text_source_quality" -> ((
      (s: SparkSession, d: String) => {
        TextAnalysis.sourceProfile(t(s, d, "documents"))
          .withColumn("keep",
            col("quality_sum_1e6") >= lit(550000L) * col("n_docs"))
          .select(col("source"), col("n_docs"), col("total_words"),
            col("quality_sum_1e6"), col("keep"))
          .orderBy(col("source"))
      },
      """WITH m AS (
        |  SELECT source,
        |    CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS n_words,
        |    round(length(regexp_replace(text, '[^.!?,;:]', '', 'g'))::DOUBLE /
        |      greatest(length(text), 1), 4) AS punct_ratio,
        |    round(length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE /
        |      greatest(length(text), 1), 4) AS digit_ratio,
        |    round(len(list_distinct(regexp_split_to_array(lower(trim(text)), '\s+')))::DOUBLE /
        |      greatest(len(regexp_split_to_array(lower(trim(text)), '\s+')), 1), 4) AS distinct_ratio
        |  FROM documents),
        |q AS (
        |  SELECT source, n_words,
        |    CAST(round(round(least(1.0, greatest(0.0,
        |      0.25 * least(n_words / 100.0, 1.0)
        |      + 0.25 * distinct_ratio
        |      + 0.25 * (1.0 - punct_ratio)
        |      + 0.25 * (1.0 - digit_ratio))), 6) * 1000000) AS BIGINT) AS q6
        |  FROM m)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_words) AS BIGINT) AS total_words,
        |  CAST(sum(q6) AS BIGINT) AS quality_sum_1e6,
        |  (sum(q6) >= 550000 * count(*)) AS keep
        |FROM q GROUP BY source ORDER BY source""".stripMargin)),

    // C8: language-ID heuristic vs the labeled lang column.
    "text_langid" -> ((
      (s: SparkSession, d: String) => {
        TextAnalysis.langId(t(s, d, "documents"))
          .groupBy(col("lang"), col("predicted_lang"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("lang"), col("predicted_lang"))
      },
      """WITH scored AS (
        |  SELECT lang,
        |    len(regexp_extract_all(text, '\b(the|a|of|and|to|is)\b')) AS s_en,
        |    len(regexp_extract_all(text, '\b(der|die|das|und|ist|nicht)\b')) AS s_de,
        |    len(regexp_extract_all(text, '\b(el|la|los|las|es|y)\b')) AS s_es,
        |    len(regexp_extract_all(text, '\b(le|la|les|et|est|ne)\b')) AS s_fr,
        |    regexp_matches(text, '[\x{4e00}-\x{9fff}]') AS has_cjk
        |  FROM documents)
        |SELECT lang,
        |  CASE WHEN has_cjk THEN 'zh'
        |       WHEN s_en >= greatest(s_de, s_es, s_fr) AND s_en > 0 THEN 'en'
        |       WHEN s_de >= greatest(s_es, s_fr) AND s_de > 0 THEN 'de'
        |       WHEN s_es >= s_fr AND s_es > 0 THEN 'es'
        |       WHEN s_fr > 0 THEN 'fr'
        |       ELSE 'und' END AS predicted_lang,
        |  count(*) AS n
        |FROM scored
        |GROUP BY lang, predicted_lang
        |ORDER BY lang, predicted_lang""".stripMargin)),

    // C6: brute-force cosine top-k ANN baseline.
    "sim_topk" -> ((
      (s: SparkSession, d: String) => {
        val emb = t(s, d, "embeddings")
        Similarity.cosineTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", 5)
          .orderBy(col("query_id"), col("rnk"))
      },
      """WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
        |scored AS (
        |  -- double-precision cosine, left-fold order: bit-identical to the
        |  -- Spark zip_with/aggregate formulation (list_cosine_similarity
        |  -- computes in float32 and would hash-mismatch)
        |  SELECT q.qid AS query_id, e.vec_id AS neighbor_id,
        |    round(
        |      list_sum(list_transform(list_zip(q.qe, e.embedding),
        |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
        |      / greatest(
        |          sqrt(list_sum(list_transform(q.qe, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
        |          * sqrt(list_sum(list_transform(e.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))),
        |          1e-12), 4) AS score
        |  FROM embeddings e CROSS JOIN q
        |  WHERE e.vec_id <> q.qid)
        |SELECT query_id, rnk, neighbor_id, score
        |FROM (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |        ORDER BY score DESC, neighbor_id) AS BIGINT) AS rnk
        |      FROM scored) ranked
        |WHERE rnk <= 5
        |ORDER BY query_id, rnk""".stripMargin)),

    // C20: Gopher-style repetition quality signals.
    "text_repetition" -> ((
      (s: SparkSession, d: String) => {
        TextAnalysis.repetitionSignals(t(s, d, "documents"))
          .orderBy(col("doc_id"))
      },
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS words FROM documents
        |), g AS (
        |  SELECT doc_id, len(words) AS nw,
        |    list_transform(list_filter(list_zip(words, words[2:]),
        |      p -> p[2] IS NOT NULL), p -> p[1] || ' ' || p[2]) AS g2,
        |    list_transform(list_filter(list_zip(words, words[2:], words[3:]),
        |      p -> p[3] IS NOT NULL), p -> p[1] || ' ' || p[2] || ' ' || p[3]) AS g3
        |  FROM w WHERE len(words) >= 3
        |), c2 AS (
        |  SELECT doc_id, nw, g, count(*) AS cnt
        |  FROM (SELECT doc_id, nw, unnest(g2) AS g FROM g) GROUP BY 1, 2, 3
        |), a2 AS (
        |  SELECT doc_id, nw, max(cnt) AS top2 FROM c2 GROUP BY 1, 2
        |), c3 AS (
        |  SELECT doc_id, g, count(*) AS cnt
        |  FROM (SELECT doc_id, unnest(g3) AS g FROM g) GROUP BY 1, 2
        |), a3 AS (
        |  SELECT doc_id, sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS dup3
        |  FROM c3 GROUP BY 1
        |)
        |SELECT a2.doc_id, CAST(a2.nw AS BIGINT) AS n_words,
        |  round(top2::DOUBLE / (a2.nw - 1), 6) AS top2_frac,
        |  round(CAST(dup3 AS BIGINT)::DOUBLE / (a2.nw - 2), 6) AS dup3_frac
        |FROM a2 JOIN a3 ON a2.doc_id = a3.doc_id
        |ORDER BY a2.doc_id""".stripMargin)),

    // C21: int8-quantized ANN top-k (exact integer scoring, so fully
    // oracle-replayable unlike the float sketch paths).
    "embed_quantized_topk" -> ((
      (s: SparkSession, d: String) => {
        val emb = t(s, d, "embeddings")
        Similarity.quantizedTopK(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", 10)
          .orderBy(col("query_id"), col("rnk"))
      },
      """WITH qz AS (
        |  -- floor(x + 0.5) quantization replayed exactly (see Similarity.quantize)
        |  SELECT vec_id,
        |    CASE WHEN list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) = 0
        |      THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
        |      ELSE list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) *
        |        (127.0 / list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE))))) + 0.5) AS BIGINT))
        |    END AS qv
        |  FROM embeddings
        |), n AS (
        |  SELECT vec_id, qv,
        |    sqrt(CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT)) AS nrm
        |  FROM qz
        |), scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    CAST(list_sum(list_transform(list_zip(q.qv, c.qv), p -> p[1] * p[2])) AS BIGINT) AS qdot,
        |    q.nrm AS n_q, c.nrm AS n_c
        |  FROM (SELECT * FROM n WHERE vec_id < 5) q CROSS JOIN n c
        |  WHERE c.vec_id <> q.vec_id
        |)
        |SELECT query_id, rnk, neighbor_id, qdot
        |FROM (SELECT query_id, neighbor_id, qdot,
        |        CAST(row_number() OVER (PARTITION BY query_id
        |          ORDER BY qdot / greatest(n_q * n_c, 1e-12) DESC, neighbor_id) AS BIGINT) AS rnk
        |      FROM scored) ranked
        |WHERE rnk <= 10
        |ORDER BY query_id, rnk""".stripMargin))
  )

  /** Distinct w=3 string-shingle set per document in DuckDB terms —
    * hash-cardinality-equivalent to ShingleHashes (space can't occur
    * inside a token, so joined strings are bijective with token
    * sequences; 64-bit collisions are ~2^-40 at this scale). Mirrors the
    * n<w edge case: one whole-doc shingle. */
  private val duckShingles: String =
    """tok AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS ts
      |        FROM documents),
      |sh AS (SELECT doc_id,
      |    CASE WHEN len(ts) >= 3
      |         THEN list_distinct(list_transform(range(1, len(ts) - 1),
      |                i -> array_to_string(ts[i:i+2], ' ')))
      |         ELSE [array_to_string(ts, ' ')] END AS s
      |  FROM tok)""".stripMargin

  /** The near-dup cluster construction shared by the dedup_clusters
    * and dedup_keep_best oracles: rare-shingle candidate pairs, exact
    * Jaccard verification, undirected edges, transitive closure
    * (recursive CTE) — must match `Dedup.shingleCandidates` +
    * `ngramJaccard(>=0.5)` + `connectedComponents` exactly. */
  private val duckClusterCte: String =
    """inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
      |rare AS (SELECT g FROM inv GROUP BY g HAVING count(*) <= 20),
      |cand AS (
      |  SELECT a.doc_id AS ida, b.doc_id AS idb
      |  FROM inv a JOIN rare USING (g) JOIN inv b USING (g)
      |  WHERE a.doc_id < b.doc_id
      |  GROUP BY ida, idb HAVING count(*) >= 5),
      |ver AS (
      |  SELECT ida, idb
      |  FROM cand JOIN sh sa ON sa.doc_id = ida JOIN sh sb ON sb.doc_id = idb
      |  WHERE round(len(list_intersect(sa.s, sb.s))::DOUBLE /
      |          greatest(len(list_distinct(list_concat(sa.s, sb.s))), 1), 4) >= 0.5),
      |und AS (SELECT ida AS src, idb AS dst FROM ver
      |        UNION ALL SELECT idb, ida FROM ver),
      |reach(id, label) AS (
      |  SELECT DISTINCT src, src FROM und
      |  UNION
      |  SELECT u.dst, r.label FROM reach r JOIN und u ON u.src = r.id)""".stripMargin

  /** Inverted-index intersection counts for the pair oracles: shingle
    * lists are distinct, so joining the unnested index with itself
    * yields exactly one row per shared shingle — count(*) IS the
    * intersection size, and |A∪B| = |A|+|B|−|A∩B|. Lossless for any
    * jaccard threshold > 0 (j > 0 requires a shared shingle) and ~40×
    * faster than per-pair list_intersect at sf0.1. */
  private val duckShingleInter: String =
    """sz AS (SELECT doc_id, len(s) AS n FROM sh),
      |inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
      |inter AS (SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS i
      |          FROM inv a JOIN inv b USING (g) WHERE a.doc_id < b.doc_id
      |          GROUP BY 1, 2)""".stripMargin

  val withOracle2: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(

    // C4: exact n-gram Jaccard over a deterministic candidate set
    // (consecutive doc ids) — always non-empty.
    "dedup_ngram" -> ((
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        val pairs = docs.select(col("doc_id").as("id_a"), (col("doc_id") + 1).as("id_b"))
        Dedup.ngramJaccard(pairs, docs, "text", "doc_id", w = 3)
          .orderBy(col("id_a"))
      },
      s"""WITH $duckShingles
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  round(len(list_intersect(a.s, b.s))::DOUBLE /
        |    greatest(len(list_distinct(list_concat(a.s, b.s))), 1), 4) AS jaccard
        |FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
        |ORDER BY id_a""".stripMargin)),

    // C13: benchmark decontamination — corpus docs sharing 3-gram
    // shingles with a probe set (here: 5 corpus docs as probes; each
    // probe's self-match guarantees non-empty output).
    "text_contamination" -> ((
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        val probes = docs.filter(col("doc_id") < 5)
          .select(col("doc_id").as("probe_id"), col("text"))
        graft.operators.Contamination.ngramOverlap(docs, probes)
          .filter(col("shared_shingles") >= 3)
          .orderBy(col("probe_id"), col("containment").desc, col("doc_id"))
      },
      s"""WITH $duckShingles,
        |probes AS (SELECT doc_id AS probe_id, s AS ps FROM sh WHERE doc_id < 5)
        |SELECT d.doc_id, p.probe_id,
        |  CAST(len(list_intersect(d.s, p.ps)) AS BIGINT) AS shared_shingles,
        |  round(len(list_intersect(d.s, p.ps))::DOUBLE /
        |    greatest(len(p.ps), 1), 4) AS containment
        |FROM sh d CROSS JOIN probes p
        |WHERE len(list_intersect(d.s, p.ps)) >= 3
        |ORDER BY probe_id, containment DESC, doc_id""".stripMargin)),

    // C16: duplicate-cluster resolution — inverted-shingle-index
    // candidates (df-filtered), exact-Jaccard-verified edges, connected
    // components by min-label propagation. The oracle recomputes the
    // same edge set over string shingles and closes it with a recursive
    // CTE (transitive closure, min reachable id).
    "dedup_clusters" -> ((
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        val cand = Dedup.shingleCandidates(docs, "text", "doc_id",
          w = 3, maxDf = 20, minShared = 5)
        val edges = Dedup.ngramJaccard(cand, docs, "text", "doc_id", w = 3)
          .filter(col("jaccard") >= 0.5)
        Dedup.connectedComponentsStar(edges)
          .select(col("id").as("doc_id"), col("cluster_id"))
          .orderBy(col("doc_id"))
      },
      s"""WITH RECURSIVE $duckShingles,
        |$duckClusterCte
        |SELECT id AS doc_id, min(label) AS cluster_id
        |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin)),

    // C34: quality-aware dedup — keep the best (longest, id-tiebreak)
    // member of each near-dup cluster, pass unclustered docs through.
    // Same cluster construction as dedup_clusters; the corpus pays one
    // broadcast anti-join against the per-cluster losers.
    "dedup_keep_best" -> ((
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        val cand = Dedup.shingleCandidates(docs, "text", "doc_id",
          w = 3, maxDf = 20, minShared = 5)
        val edges = Dedup.ngramJaccard(cand, docs, "text", "doc_id", w = 3)
          .filter(col("jaccard") >= 0.5)
        val clusters = Dedup.connectedComponentsStar(edges)
          .select(col("id").as("doc_id"), col("cluster_id"))
        Dedup.keepBestPerCluster(docs, clusters, "doc_id", col("n_chars"))
          .select(col("doc_id"), col("lang"),
            col("n_chars").cast("long").as("n_chars"))
          .orderBy(col("doc_id"))
      },
      s"""WITH RECURSIVE $duckShingles,
        |$duckClusterCte,
        |clus AS (SELECT id AS doc_id, min(label) AS cluster_id
        |         FROM reach GROUP BY id),
        |best AS (
        |  SELECT c.doc_id
        |  FROM clus c JOIN documents dd USING (doc_id)
        |  QUALIFY row_number() OVER (PARTITION BY c.cluster_id
        |    ORDER BY dd.n_chars DESC, c.doc_id) = 1),
        |losers AS (SELECT doc_id FROM clus
        |           WHERE doc_id NOT IN (SELECT doc_id FROM best))
        |SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
        |FROM documents
        |WHERE doc_id NOT IN (SELECT doc_id FROM losers)
        |ORDER BY doc_id""".stripMargin)),

    // C18: canonical text normalization — NFC + casefold + whitespace
    // collapse. The corpus is ASCII, so decomposed unicode is injected
    // per doc (e + combining acute, extra whitespace, mixed case) and
    // the oracle must produce the byte-identical normalized text (md5).
    "text_normalize" -> ((
      (s: SparkSession, d: String) => {
        val decorated = t(s, d, "documents")
          .withColumn("text", concat(col("text"),
            lit("  CAFE"), lit("\u0301"), lit("  Mixed\tCase  ")))
        decorated
          .select(col("doc_id"),
            md5(TextAnalysis.normalizeText(col("text"))).as("norm_md5"),
            length(TextAnalysis.normalizeText(col("text"))).as("norm_len"))
          .orderBy(col("doc_id"))
      },
      """WITH n AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(lower(nfc_normalize(
        |      text || '  CAFE' || chr(769) || '  Mixed' || chr(9) || 'Case  ')),
        |      '[ \x09\x0a\x0d\x0c\x0b]+', ' ', 'g')) AS nt
        |  FROM documents)
        |SELECT doc_id, md5(nt) AS norm_md5, CAST(length(nt) AS INT) AS norm_len
        |FROM n ORDER BY doc_id""".stripMargin)),

    // C19: per-language top terms — exploded token counts ranked by the
    // TopKPerKey operator (the window-rewrite fires inside this plan).
    "text_top_terms" -> ((
      (s: SparkSession, d: String) => {
        val counts = t(s, d, "documents")
          .select(col("lang"), explode(TextAnalysis.tokens(col("text"))).as("token"))
          .filter(length(col("token")) >= 3)
          .groupBy(col("lang"), col("token")).agg(count(lit(1)).as("n"))
        graft.plans.TopK.perKey(counts, Seq(col("lang")),
            Seq(col("n").desc, col("token").asc), 5)
          .select(col("lang"), col("rnk").cast("long").as("rnk"),
            col("token"), col("n"))
          .orderBy(col("lang"), col("rnk"))
      },
      """WITH counts AS (
        |  SELECT lang, token, count(*) AS n
        |  FROM (SELECT lang, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
        |        FROM documents)
        |  WHERE length(token) >= 3
        |  GROUP BY lang, token)
        |SELECT lang, rnk, token, n FROM (
        |  SELECT lang, token, n,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY n DESC, token) AS BIGINT) AS rnk
        |  FROM counts) ranked
        |WHERE rnk <= 5
        |ORDER BY lang, rnk""".stripMargin)),

    // C17: deterministic hash sampling — per-lang stats of a portable
    // 10% sample (md5-bucketed key; identical row set in any engine).
    "text_sample" -> ((
      (s: SparkSession, d: String) => {
        graft.operators.Sampling.hashSample(
            t(s, d, "documents"), "doc_id", pct = 10, portable = true)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
          .orderBy(col("lang"))
      },
      """SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 10
        |GROUP BY lang ORDER BY lang""".stripMargin)),

    // C17b: deterministic train/val/test split assignment — per-split
    // doc counts (stable across runs, engines, and repartitioning).
    "text_splits" -> ((
      (s: SparkSession, d: String) => {
        graft.operators.Sampling.assignSplits(t(s, d, "documents"), "doc_id",
            Seq("train" -> 96, "val" -> 2, "test" -> 2), portable = true)
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"))
          .orderBy(col("split"))
      },
      """SELECT CASE
        |    WHEN b < 96 THEN 'train' WHEN b < 98 THEN 'val' ELSE 'test'
        |  END AS split,
        |  count(*) AS n_docs, min(doc_id) AS min_doc
        |FROM (SELECT doc_id,
        |        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS b
        |      FROM documents)
        |GROUP BY split ORDER BY split""".stripMargin)),

    // C39: LEAKAGE-SAFE splits — C17's portable split hashed on the
    // near-dup CLUSTER representative (C16's min-id star label) instead
    // of the document, so no val/test document can have a train-side
    // near-duplicate. The in-gate requires prove both directions: the
    // NAIVE per-doc split WOULD have straddled ≥1 cluster on this very
    // corpus (the hazard is real, not hypothetical), and the
    // cluster-keyed split straddles none. The oracle replays shingles →
    // banded-minhash candidates → exact-Jaccard verify → recursive-CTE
    // closure → min-label representative → md5 split, end to end.
    "text_splits_safe" -> ((
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        val pairs = Dedup.minhashPairs(docs, "text", "doc_id",
          k = 32, bands = 8, w = 3, threshold = 0.5)
        val sp = Seq("train" -> 96, "val" -> 2, "test" -> 2)
        val df = graft.operators.Sampling
          .leakageSafeSplits(docs, "doc_id", pairs, sp)
          .select(col("doc_id"), col("split_key"), col("split"))
          .localCheckpoint() // two aggregates + the require read it
        val naiveStraddle = graft.operators.Sampling
          .assignSplits(df.select(col("doc_id"), col("split_key")),
            "doc_id", sp, portable = true)
          .groupBy(col("split_key"))
          .agg(countDistinct(col("split")).as("ns"))
          .filter(col("ns") > 1).count()
        require(naiveStraddle > 0,
          "corpus has no naively-straddling cluster — the gate proves " +
            "nothing here")
        val straddle = df.groupBy(col("split_key"))
          .agg(countDistinct(col("split")).as("ns"))
          .filter(col("ns") > 1).count()
        require(straddle == 0, s"$straddle clusters straddle splits")
        df.groupBy(col("split"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("split_key")).as("n_groups"),
            min(col("doc_id")).as("min_doc"))
          .orderBy(col("split"))
      },
      s"""WITH RECURSIVE $duckShingles,
        |$duckShingleInter,
        |ver AS (
        |  SELECT ida, idb FROM inter
        |  JOIN sz sa ON sa.doc_id = ida JOIN sz sb ON sb.doc_id = idb
        |  WHERE round(i::DOUBLE / greatest(sa.n + sb.n - i, 1), 4) >= 0.5),
        |und AS (SELECT ida AS src, idb AS dst FROM ver
        |        UNION ALL SELECT idb, ida FROM ver),
        |reach(id, label) AS (
        |  SELECT DISTINCT src, src FROM und
        |  UNION
        |  SELECT u.dst, r.label FROM reach r JOIN und u ON u.src = r.id),
        |rep AS (SELECT id, min(label) AS rep FROM reach GROUP BY id),
        |sp AS (
        |  SELECT d.doc_id, COALESCE(r.rep, d.doc_id) AS skey,
        |    CAST(('0x' || substr(md5(CAST(COALESCE(r.rep, d.doc_id) AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS b
        |  FROM documents d LEFT JOIN rep r ON r.id = d.doc_id)
        |SELECT CASE WHEN b < 96 THEN 'train' WHEN b < 98 THEN 'val' ELSE 'test' END AS split,
        |  count(*) AS n_docs, count(DISTINCT skey) AS n_groups,
        |  min(doc_id) AS min_doc
        |FROM sp GROUP BY split ORDER BY split""".stripMargin)),

    // C22: training-shard assignment by running token budget — the
    // sequence-packing layout a data loader consumes. Per-shard stats
    // (cumulative sums stay ≪ 2^53, so the floor-division is exact in
    // both engines).
    "text_shards" -> ((
      (s: SparkSession, d: String) => {
        graft.operators.Sampling
          .shardByTokenBudget(t(s, d, "documents"), "lang", "doc_id", "text", 500)
          .groupBy(col("lang"), col("shard_id"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("shard_tokens"))
          .orderBy(col("lang"), col("shard_id"))
      },
      """WITH tk AS (
        |  SELECT lang, doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
        |  FROM documents
        |), c AS (
        |  SELECT lang, ntok,
        |    sum(ntok) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cumb
        |  FROM tk
        |)
        |SELECT lang, CAST(floor(COALESCE(cumb, 0)::DOUBLE / 500) AS BIGINT) AS shard_id,
        |  count(*) AS n_docs, CAST(sum(ntok) AS BIGINT) AS shard_tokens
        |FROM c GROUP BY 1, 2 ORDER BY lang, shard_id""".stripMargin)),

    // C7 recall gates (necessary-condition oracle): sim_lsh / sim_ivf
    // stay rows-only (bucket selections aren't SQL-replayable), but
    // their recall-vs-exact CONTRACT is gated — the query joins the
    // approximate top-k against the exact top-k in-plan and emits one
    // row with a recall-floor boolean the oracle expects to be true.
    // Both paths are deterministic functions of the data (seeded
    // hyperplanes, exact-decimal k-means), so the boolean is stable.
    // All floors ≥ 0.50 with every measured recall ≥ 0.62
    // (lsh 0.62/0.69 across sf0.01/sf0.1; per-path numbers below).
    // C7: multi-table LSH at 4 planes x 12 tables (measured recall@10
    // 0.76/0.83 at sf0.01/sf0.1, tools/AnnTune; was 0.62/0.69 at the
    // 8-table default). At 100 TB the plane count scales with the
    // corpus (m ~ log2(n / target bucket occupancy)) so the occupancy
    // cap never saturates; the table count buys recall back.
    "sim_lsh_recall" -> recallGate("sim_lsh_recall", 0.60,
      (emb, q) => Similarity.lshTopK(emb, q, "vec_id", "embedding", 10,
        nPlanes = 4, nTables = 12)),
    // C7b: multi-probe IVF — nprobe=10 of 16 lists (r19 retune:
    // measured recall@10 0.89/0.86 at sf0.01/sf0.1 at wall parity with
    // the old nprobe=8's 0.80/0.78 — docs/ANN_TUNE.md has the full
    // recall-vs-scan-fraction curve and the isotropy evidence that
    // bounds it). The 0.75 floor keeps >10% margin on deterministic
    // measurements.
    "sim_ivf_recall" -> recallGate("sim_ivf_recall", 0.75,
      (emb, q) => Similarity.ivfTopK(emb, q, "vec_id", "embedding", 10,
        nLists = 16, nprobe = 10)),
    // C30: product quantization with the exact re-rank stage (FAISS
    // RefineFlat shape): ADC keeps top-3k, exact cosine picks the
    // final k — measured recall@10 0.96/0.91 at sf0.01/sf0.1
    // (tools/AnnTune); the 0.70 floor keeps >20% margin.
    "sim_pq_recall" -> recallGate("sim_pq_recall", 0.70,
      (emb, q) => Similarity.pqTopK(emb, q, "vec_id", "embedding", 10,
        refine = 3)),
    // C7+C30 composed: IVF routing over PQ codes + exact re-rank —
    // r19 retune to nprobe=12/refine=5: measured recall@10 0.94/0.92
    // at sf0.01/sf0.1 (was 0.80/0.75 at nprobe=8/refine=3) at LOWER
    // wall (1.97 s vs 2.05 s, tools/AnnTune — refine=5 keeps more ADC
    // candidates so the exact re-rank recovers nearly the full routing
    // bound; residual encoding measured WORSE on this near-isotropic
    // corpus — mode kept for clustered data, documented at
    // Similarity.ivfPqTopK). The 0.80 floor keeps >12% margin on
    // deterministic measurements.
    "sim_ivfpq_recall" -> recallGate("sim_ivfpq_recall", 0.80,
      (emb, q) => Similarity.ivfPqTopK(emb, q, "vec_id", "embedding", 10,
        nLists = 16, nprobe = 12, refine = 5)),
    // C7+C30 across a SESSION boundary: the index (k-means centroid
    // table + PQ codebook) is trained once, PERSISTED as parquet, and
    // served from a FRESH SparkSession (s.newSession(): new state/
    // catalog/plans, nothing shared but the context) that never sees
    // the training path — the train-once/serve-many production shape
    // the in-memory `centroids`/`codebook` parameters only prove
    // within one session. Same parameters as sim_ivfpq_recall (r19:
    // nprobe=12/refine=5 — query-side knobs; the persisted index
    // itself is unchanged), so the persisted index must reproduce the
    // in-session recall exactly; the 0.80 floor is hash-gated like the
    // other recall gates.
    "sim_ivf_persisted" -> ((
      (s: SparkSession, d: String) => {
        val idxDir = cached(s"annidx|$d") { dir =>
          val emb = t(s, d, "embeddings")
          Similarity.kmeansCentroids(
              emb.select(col("vec_id").as("neighbor_id"),
                col("embedding").cast("array<double>").as("v_c")),
              nLists = 16)
            .write.parquet(s"$dir/centroids")
          val cb = Similarity.pqCodebooks(emb, "vec_id", "embedding")
          import s.implicits._
          cb.zipWithIndex.map { case (v, i) => (i, v) }.toSeq
            .toDF("i", "value").coalesce(1).write.parquet(s"$dir/codebook")
        }
        // serve side: fresh session, index only from disk
        val s2 = s.newSession()
        val emb2 = s2.read.parquet(s"$d/embeddings.parquet")
        val q2 = emb2.filter(col("vec_id") % 20 === 0)
        val cents = s2.read.parquet(s"$idxDir/centroids")
        val cb2 = s2.read.parquet(s"$idxDir/codebook")
          .orderBy(col("i")).collect().map(_.getDouble(1))
        val exact = Similarity.cosineTopK(emb2, q2, "vec_id", "embedding", 10)
          .select(col("query_id"), col("neighbor_id"))
        val approx = Similarity.ivfPqTopK(emb2, q2, "vec_id", "embedding", 10,
            nLists = 16, nprobe = 12, refine = 5,
            centroids = Some(cents), codebook = Some(cb2))
          .select(col("query_id").as("aq"), col("neighbor_id").as("an"))
        val row = exact.join(approx,
            col("query_id") === col("aq") && col("neighbor_id") === col("an"),
            "left_outer")
          .agg(countDistinct(col("query_id")).as("n_queries"),
            (count(col("an")).cast("double") / count(lit(1))).as("recall"))
          .head()
        val recall = row.getDouble(1)
        annRecall("sim_ivf_persisted") = recall
        import s.implicits._
        Seq((row.getLong(0), recall >= 0.80))
          .toDF("n_queries", "recall_floor_met")
      },
      """SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n_queries,
        |  true AS recall_floor_met
        |FROM embeddings WHERE vec_id % 20 = 0""".stripMargin)),

    // C24: deterministic exact-k-per-group sampling (portable md5
    // order — selection reproducible across engines; rides TopKPerKey).
    "text_sample_group" -> ((
      (s: SparkSession, d: String) => {
        graft.operators.Sampling
          .sampleKPerGroup(t(s, d, "documents"), "lang", "doc_id", 3, "s1")
          .select(col("lang"), col("smp_rank"), col("doc_id"))
          .orderBy(col("lang"), col("smp_rank"))
      },
      """SELECT lang, CAST(rnk AS BIGINT) AS smp_rank, doc_id
        |FROM (SELECT lang, doc_id,
        |        row_number() OVER (PARTITION BY lang
        |          ORDER BY md5(COALESCE(CAST(doc_id AS VARCHAR), '') || '|' || 's1'),
        |            doc_id) AS rnk
        |      FROM documents) r
        |WHERE rnk <= 3
        |ORDER BY lang, smp_rank""".stripMargin)),

    // C23: fixed-window token chunking with overlap (32-token chunks,
    // stride 24) — one row per chunk, md5 pins the exact chunk text.
    "text_chunks" -> ((
      (s: SparkSession, d: String) => {
        TextAnalysis.chunkByTokens(t(s, d, "documents"), "doc_id", "text",
            chunkSize = 32, overlap = 8)
          .select(col("doc_id"), col("chunk_id"),
            size(split(col("chunk_text"), " ")).cast("long").as("n_chunk_tokens"),
            md5(col("chunk_text")).as("chunk_md5"))
          .orderBy(col("doc_id"), col("chunk_id"))
      },
      """WITH tk AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |    len(string_split(text, ' ')) AS n
        |  FROM documents
        |), nc AS (
        |  SELECT doc_id, toks,
        |    unnest(range(CASE WHEN n <= 32 THEN 1
        |                      ELSE (n - 32 + 23) // 24 + 1 END)) AS i
        |  FROM tk
        |), ch AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
        |    array_to_string(toks[(i*24 + 1):(i*24 + 32)], ' ') AS chunk_text
        |  FROM nc
        |)
        |SELECT doc_id, chunk_id,
        |  CAST(len(string_split(chunk_text, ' ')) AS BIGINT) AS n_chunk_tokens,
        |  md5(chunk_text) AS chunk_md5
        |FROM ch ORDER BY doc_id, chunk_id""".stripMargin)),

    // C3: SimHash near-dup pairs, portable 48-bit signature, banded
    // candidates at maxHamming=3 (promoted from rows-only in round 4).
    // With 4 disjoint 12-bit bands, pigeonhole guarantees every pair
    // within hamming 3 shares an intact band, so the banded emission
    // EQUALS the brute-force hamming ball — which the oracle replays:
    // the same md5-derived signature built in SQL (divisions by powers
    // of two are exact in binary floating point; 48-bit values fit the
    // 53-bit mantissa), then an O(n²) hamming join. A missed or
    // spurious banded pair fails the hash. The xxhash64 64-bit kernel
    // stays the operator default for Spark-only pipelines.
    "dedup_simhash" -> ((
      (s: SparkSession, d: String) => {
        Dedup.simhashPairs(t(s, d, "documents"), "text", "doc_id",
            maxHamming = 3, portable = true)
          .orderBy(col("id_a"), col("id_b"))
      },
      """WITH tokh AS (
        |  SELECT doc_id, CAST(('0x' || substr(md5(t), 1, 12)) AS BIGINT) AS h
        |  FROM (SELECT doc_id,
        |          unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
        |        FROM documents)),
        |bitsum AS (
        |  SELECT doc_id, b,
        |    sum(CASE WHEN CAST(floor(h / power(2, b)) AS BIGINT) % 2 = 1
        |        THEN 1 ELSE -1 END) AS s
        |  FROM tokh CROSS JOIN (SELECT unnest(range(48)) AS b) bb
        |  GROUP BY doc_id, b),
        |sig AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN s > 0 THEN power(2, b) ELSE 0 END) AS BIGINT) AS sg
        |  FROM bitsum GROUP BY doc_id)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(bit_count(xor(a.sg, b.sg)) AS BIGINT) AS hamming
        |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sg, b.sg)) <= 3
        |ORDER BY id_a, id_b""".stripMargin)),

    // C3 in PURE SQL (r17, the dedup_minhash_sql pattern extended to
    // the simhash chain): signature via the SQL-registered
    // simhash_portable kernel, then vanilla-SQL 4×12-bit banding with
    // the occ/hub saturation window, bucket-confined self-join, and
    // bit_count hamming verify — replicating Dedup.simhashPairs
    // (portable, maxHamming=3) line for line. The oracle is the SAME
    // exact hamming-ball pair set as dedup_simhash, so a hash match
    // proves SQL composition ≡ Scala operator ≡ brute force. Plan
    // note: like the minhash SQL gate, the `sigs` CTE is re-scanned by
    // both join sides — a 100 TB SQL user materializes it first
    // (CREATE TABLE sigs AS ...), which is what the Scala operator's
    // narrow signature frame does.
    "dedup_simhash_sql" -> ((
      (s: SparkSession, d: String) => {
        t(s, d, "documents").createOrReplaceTempView("graft_simhash_sql_docs")
        s.sql(
          """WITH sigs AS (
            |  SELECT doc_id AS id,
            |    simhash_portable(split(lower(trim(text)), '\\s+')) AS sh
            |  FROM graft_simhash_sql_docs),
            |banded AS (
            |  SELECT id, sh, band,
            |    shiftrightunsigned(sh, band * 12) & 4095 AS bval
            |  FROM sigs LATERAL VIEW explode(sequence(0, 3)) AS band),
            |probe AS (
            |  SELECT id, sh, band, bval FROM (
            |    SELECT id, sh, band, bval,
            |      count(1) OVER (PARTITION BY band, bval) AS occ,
            |      min(id)  OVER (PARTITION BY band, bval) AS hub
            |    FROM banded)
            |  WHERE occ <= 8192 OR id = hub)
            |SELECT DISTINCT l.id AS id_a, r.id AS id_b,
            |  cast(bit_count(l.sh ^ r.sh) AS BIGINT) AS hamming
            |FROM probe l JOIN banded r
            |  ON l.band = r.band AND l.bval = r.bval AND l.id < r.id
            |WHERE bit_count(l.sh ^ r.sh) <= 3
            |ORDER BY id_a, id_b""".stripMargin)
      },
      """WITH tokh AS (
        |  SELECT doc_id, CAST(('0x' || substr(md5(t), 1, 12)) AS BIGINT) AS h
        |  FROM (SELECT doc_id,
        |          unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
        |        FROM documents)),
        |bitsum AS (
        |  SELECT doc_id, b,
        |    sum(CASE WHEN CAST(floor(h / power(2, b)) AS BIGINT) % 2 = 1
        |        THEN 1 ELSE -1 END) AS s
        |  FROM tokh CROSS JOIN (SELECT unnest(range(48)) AS b) bb
        |  GROUP BY doc_id, b),
        |sig AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN s > 0 THEN power(2, b) ELSE 0 END) AS BIGINT) AS sg
        |  FROM bitsum GROUP BY doc_id)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(bit_count(xor(a.sg, b.sg)) AS BIGINT) AS hamming
        |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sg, b.sg)) <= 3
        |ORDER BY id_a, id_b""".stripMargin)),

    // C11: per-document fingerprints, portable-hash mode (md5-derived
    // shingle hash — promoted from rows-only in round 4; the xxhash64
    // rolling kernel stays the operator default for Spark-only use).
    "text_fingerprint" -> ((
      (s: SparkSession, d: String) => {
        TextAnalysis.fingerprint(t(s, d, "documents"), portable = true)
          .select("doc_id", "fp_min", "fp_max", "fp_xor")
          .orderBy("doc_id")
      },
      s"""WITH $duckShingles,
        |h AS (SELECT doc_id,
        |        CAST(('0x' || substr(md5(g), 1, 8)) AS BIGINT) AS hv
        |      FROM (SELECT doc_id, unnest(s) AS g FROM sh))
        |SELECT doc_id, min(hv) AS fp_min, max(hv) AS fp_max,
        |  bit_xor(hv) AS fp_xor
        |FROM h GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // C12: multimodal decode (promoted from rows-only in round 4): the
    // harness builds REAL media per row (PNG via ImageIO, 8-bit PCM WAV,
    // minimal MP4 container — MediaGen), type chosen by a portable md5
    // bucket of the text; the distributed path then runs the real
    // decode kernels, and every decoded feature is a closed-form
    // function of length(text), which the oracle replays. A broken
    // encoder, decoder, or batch path changes the features and fails
    // the hash. (checksum/n_bytes stay out of the output: container
    // byte size depends on deflate, not on a SQL-expressible formula.)
    "mm_meta" -> ((
      (s: SparkSession, d: String) => {
        Multimodal.extractFeatures(s,
            Multimodal.withRealMedia(s, t(s, d, "documents")))
          .toDF()
          .select(col("doc_id"), col("media_type"), col("width"),
            col("height"), col("n_frames"))
          .orderBy(col("doc_id"))
      },
      """WITH b AS (
        |  SELECT doc_id, length(text) AS n,
        |    CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 3 AS mb
        |  FROM documents)
        |SELECT doc_id,
        |  CASE mb WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
        |    AS media_type,
        |  CAST(CASE mb WHEN 0 THEN 16 + n % 32 WHEN 1 THEN 8000
        |       ELSE 640 END AS INT) AS width,
        |  CAST(CASE mb WHEN 0 THEN 16 + (n // 32) % 32 WHEN 1 THEN 1
        |       ELSE 360 END AS INT) AS height,
        |  CAST(CASE mb WHEN 0 THEN 1 WHEN 1 THEN n
        |       ELSE 1 + n % 240 END AS INT) AS n_frames
        |FROM b ORDER BY doc_id""".stripMargin)),

    // C12, pixel level: REAL H.264 decode under the hash gate. Every
    // document becomes a spec-valid baseline H.264 MP4 (IDR of I_PCM
    // macroblocks, then P slices mixing an I_PCM intra-refresh row with
    // P_Skip runs), decoded back on the executors through the from-
    // scratch bitstream decoder (NAL/RBSP, Exp-Golomb, slice headers,
    // zero-MV reference copy). PCM pixels are exact, so per-frame mean
    // lumas are closed-form in length(text): frame 0 = g(0), frame k =
    // (g(k)+g(0))/2 with g(k) = 20 + (n*31 + k*40) % 200 — the oracle
    // replays the doubled-luma sum as exact integers.
    "mm_h264" -> ((
      (s: SparkSession, d: String) => {
        Multimodal.h264PixelAudit(s, t(s, d, "documents"))
          .orderBy(col("doc_id"))
      },
      """WITH f AS (
        |  SELECT doc_id, length(text) AS n,
        |    3 + length(text) % 5 AS nf,
        |    20 + (length(text) * 31) % 200 AS g0
        |  FROM documents),
        |tail AS (
        |  SELECT f.doc_id,
        |    SUM(20 + (n * 31 + t.k * 40) % 200 + g0) AS pairs
        |  FROM f JOIN range(1, 7) t(k) ON t.k <= nf - 1
        |  GROUP BY f.doc_id)
        |SELECT f.doc_id, CAST(nf AS INT) AS n_frames,
        |  CAST(32 AS INT) AS width, CAST(32 AS INT) AS height,
        |  CAST(2 * g0 + coalesce(tail.pairs, 0) AS BIGINT) AS luma2x
        |FROM f LEFT JOIN tail USING (doc_id)
        |ORDER BY doc_id""".stripMargin)),

    // C12, entropy level: REAL CAVLC H.264 decode under the hash gate.
    // Every document becomes an all-Intra stream of I_16x16_2_0_0
    // macroblocks whose luma-DC residuals are genuinely entropy-coded
    // (coeff_token, trailing-one signs, level_prefix/suffix,
    // total_zeros), decoded back through inverse Hadamard, spec
    // dequantization, the 4x4 IDCT, and pixel-wise DC prediction. The
    // construction (flat MBs, QP 36) makes every decoded pixel exact,
    // so per-frame mean luma is closed-form: frame k of an n-char doc
    // averages v(n,k,m) = 30 + (n*17 + k*53 + m*29) % 196 over the
    // four macroblocks m — the oracle replays the quadrupled sums as
    // exact integers.
    "mm_h264_cavlc" -> ((
      (s: SparkSession, d: String) => {
        Multimodal.h264CavlcAudit(s, t(s, d, "documents"))
          .orderBy(col("doc_id"))
      },
      """WITH f AS (
        |  SELECT doc_id, length(text) AS n, 2 + length(text) % 4 AS nf
        |  FROM documents),
        |v AS (
        |  SELECT f.doc_id,
        |    SUM(30 + (n * 17 + tk.k * 53 + tm.m * 29) % 196) AS luma4x
        |  FROM f
        |  JOIN range(0, 5) tk(k) ON tk.k < nf
        |  CROSS JOIN range(0, 4) tm(m)
        |  GROUP BY f.doc_id)
        |SELECT f.doc_id, CAST(nf AS INT) AS n_frames,
        |  CAST(32 AS INT) AS width, CAST(32 AS INT) AS height,
        |  CAST(v.luma4x AS BIGINT) AS luma4x
        |FROM f JOIN v USING (doc_id)
        |ORDER BY doc_id""".stripMargin)),

    // C12 (general CAVLC): textured full-CAVLC H.264 — AC residuals in
    // every block, all prediction modes, per-doc QP. The decoded planes
    // must equal the encoder's independent reconstruction bit-for-bit
    // (`exact`) and track the closed-form source texture (`fidelity_ok`,
    // the quant-calibration bound); the oracle replays the stream
    // geometry closed-form and pins both booleans true.
    "mm_h264_textured" -> ((
      (s: SparkSession, d: String) => {
        Multimodal.h264TexturedAudit(s, t(s, d, "documents"))
          .orderBy(col("doc_id"))
      },
      """SELECT doc_id,
        |  CAST(1 + length(text) % 3 AS INT) AS n_frames,
        |  CAST(32 AS INT) AS width, CAST(32 AS INT) AS height,
        |  CAST(20 + length(text) % 9 AS INT) AS qp,
        |  true AS exact, true AS fidelity_ok
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // C12 (CABAC, r20): the textured stream entropy-coded through the
    // real CABAC machinery — arithmetic decision/bypass/terminate
    // engine, context-coded mb_type / chroma mode / coded_block_flags
    // / significance maps / UEG0 levels — decoded back to pixel
    // equality with the encoder's independent reconstruction. Context
    // INIT values are self-consistent rather than spec-table-verified
    // (no reference copy offline), so the decoder only accepts CABAC
    // under the encoder's SEI marker; foreign CABAC keeps the checked
    // fallback (Cabac.scala's documented boundary). The oracle replays
    // the stream geometry closed-form and pins both booleans.
    "mm_h264_cabac" -> ((
      (s: SparkSession, d: String) => {
        // deterministic half-sample, like mm_h264_multislice: the
        // (frames x qp) lattice (27 combos) is covered many times over
        Multimodal.h264CabacAudit(s,
            t(s, d, "documents").filter(col("doc_id") % 2 === 1))
          .orderBy(col("doc_id"))
      },
      """SELECT doc_id,
        |  CAST(1 + length(text) % 3 AS INT) AS n_frames,
        |  CAST(32 AS INT) AS width, CAST(32 AS INT) AS height,
        |  CAST(20 + length(text) % 9 AS INT) AS qp,
        |  true AS exact, true AS fidelity_ok
        |FROM documents WHERE doc_id % 2 = 1 ORDER BY doc_id""".stripMargin)),

    // C12 (multi-slice, r15): every picture arrives as 2..4 row-aligned
    // I slices (first_mb_in_slice > 0, per-slice nC state, 7.4.3
    // slice-boundary availability) — encoder and decoder must agree
    // bit-for-bit across the boundary; the oracle replays the slice
    // count closed-form so the gate cannot degrade to single-slice.
    "mm_h264_multislice" -> ((
      (s: SparkSession, d: String) => {
        // deterministic half-sample: the pixel-exact property is
        // per-document and the (frames x slices x qp) parameter
        // lattice (54 combos) is covered many times over; the full
        // corpus would only re-prove the same combinations at 2x cost
        Multimodal.h264SlicedAudit(s,
            t(s, d, "documents").filter(col("doc_id") % 2 === 0))
          .orderBy(col("doc_id"))
      },
      """SELECT doc_id,
        |  CAST(1 + length(text) % 2 AS INT) AS n_frames,
        |  CAST(32 AS INT) AS width, CAST(64 AS INT) AS height,
        |  CAST(20 + length(text) % 9 AS INT) AS qp,
        |  CAST(2 + length(text) % 3 AS INT) AS n_slices,
        |  true AS exact, true AS fidelity_ok
        |FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""".stripMargin)),

    // C12 (multi-slice P, r15): the moving-scene GOP with EVERY picture
    // (IDR and motion-predicted P) as 2..4 row-aligned slices — MV
    // prediction, skip-vector zeroing, and intra availability all gate
    // on the slice boundary, bit-exactly on both codec sides.
    "mm_h264_multislice_p" -> ((
      (s: SparkSession, d: String) => {
        // deterministic quarter-sample (see mm_h264_multislice): the
        // I4P motion search on the doubled 32x64 area is the suite's
        // most expensive kernel, and 1250 docs still cover the
        // 54-combo parameter lattice ~23x over
        Multimodal.h264SlicedI4PAudit(s,
            t(s, d, "documents").filter(col("doc_id") % 4 === 0))
          .orderBy(col("doc_id"))
      },
      """SELECT doc_id,
        |  CAST(2 + length(text) % 3 AS INT) AS n_frames,
        |  CAST(32 AS INT) AS width, CAST(64 AS INT) AS height,
        |  CAST(20 + length(text) % 9 AS INT) AS qp,
        |  CAST(2 + length(text) % 3 AS INT) AS n_slices,
        |  true AS exact, true AS fidelity_ok
        |FROM documents WHERE doc_id % 4 = 0 ORDER BY doc_id""".stripMargin)),

    // C12 (Intra_4x4/inter): moving-scene H.264 — Intra_4x4 IDR +
    // motion-predicted P_L0_16x16/P_Skip frames, the GOP shape of real
    // baseline footage. The decoded planes must equal the encoder's
    // independent reconstruction bit-for-bit (`exact`: Intra_4x4 mode
    // prediction, MV median predictors, skip semantics, MC, inter
    // residuals) and track the closed-form moving source (`fidelity_ok`);
    // the oracle replays the stream geometry and pins both booleans true.
    "mm_h264_intra4x4" -> ((
      (s: SparkSession, d: String) => {
        Multimodal.h264I4PAudit(s, t(s, d, "documents"))
          .orderBy(col("doc_id"))
      },
      """SELECT doc_id,
        |  CAST(2 + length(text) % 3 AS INT) AS n_frames,
        |  CAST(32 AS INT) AS width, CAST(32 AS INT) AS height,
        |  CAST(20 + length(text) % 9 AS INT) AS qp,
        |  true AS exact, true AS fidelity_ok
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // C12 (sub-pel motion): half/quarter-pel luma MC — the last
    // verifiable inter-prediction boundary, retired. The source drifts
    // (0.5, 0.5) pels per frame (piecewise-linear texture, the class
    // the 6-tap filter reconstructs), the encoder refines onto the
    // fractional grid, and the decoder runs the full 8.4.2.2.1
    // interpolation. `exact` pins encoder/decoder bit-agreement,
    // `used_subpel` pins non-vacuity (fractional vectors genuinely in
    // the stream — decoder-counted), `fidelity_ok` tracks the
    // closed-form source; the oracle replays the geometry and expects
    // all three true.
    "mm_h264_subpel" -> ((
      (s: SparkSession, d: String) => {
        Multimodal.h264SubpelAudit(s, t(s, d, "documents"))
          .orderBy(col("doc_id"))
      },
      """SELECT doc_id,
        |  CAST(2 + length(text) % 3 AS INT) AS n_frames,
        |  CAST(32 AS INT) AS width, CAST(32 AS INT) AS height,
        |  CAST(20 + length(text) % 9 AS INT) AS qp,
        |  true AS exact, true AS used_subpel, true AS fidelity_ok
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // C33: Misra-Gries heavy hitters — sketch candidates (one
    // treeAggregate, bounded summary, no raw-term shuffle) + exact
    // broadcast recount; the no-false-negative guarantee at
    // capacity 400 > 1/0.004 makes the emitted set EQUAL the true
    // heavy-hitter set, so the oracle replays it with a plain
    // GROUP BY ... HAVING.
    "text_heavy_hitters" -> ((
      (s: SparkSession, d: String) => {
        import s.implicits._
        val toks = t(s, d, "documents")
          .select(explode(split(lower(trim(col("text"))), "\\s+")).as("value"))
          .filter(length(col("value")) > 0)
          .as[String]
        graft.operators.Sketches.heavyHitters(toks, capacity = 400,
            minShare = 0.004)
          .orderBy(col("n").desc, col("value"))
      },
      """WITH toks AS (
        |  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS value
        |  FROM documents),
        |tok AS (SELECT value FROM toks WHERE value <> ''),
        |tot AS (SELECT count(*) AS total FROM tok)
        |SELECT value, count(*) AS n
        |FROM tok
        |GROUP BY value
        |HAVING count(*) >= (SELECT ceil(0.004 * total) FROM tot)
        |ORDER BY n DESC, value""".stripMargin)),

    // C15: PII scrubbing. The corpus is synthetic (no PII), so the query
    // injects deterministic emails/IPs/phones per doc, scrubs them, and
    // the oracle compares the full scrubbed text via md5 (identical
    // lowercase-hex semantics in both engines).
    "text_scrub_pii" -> ((
      (s: SparkSession, d: String) => {
        val withPii = t(s, d, "documents")
          .withColumn("text", concat(col("text"),
            lit(" contact user"), col("doc_id"), lit("@example.com or 192.168."),
            pmod(col("doc_id"), lit(256)), lit(".1 call +1 555 010-"),
            lit(1000) + pmod(col("doc_id"), lit(9000))))
        TextAnalysis.scrubPii(withPii)
          .select(col("doc_id"), col("n_pii"), md5(col("text")).as("scrub_md5"))
          .orderBy(col("doc_id"))
      },
      s"""WITH p AS (
        |  SELECT doc_id,
        |    text || ' contact user' || doc_id || '@example.com or 192.168.' ||
        |      (doc_id % 256) || '.1 call +1 555 010-' || (1000 + doc_id % 9000) AS t2
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t2, '${TextAnalysis.EmailRe}'))
        |     + len(regexp_extract_all(t2, '${TextAnalysis.Ipv4Re}'))
        |     + len(regexp_extract_all(t2, '${TextAnalysis.PhoneRe}')) AS BIGINT) AS n_pii,
        |  md5(regexp_replace(regexp_replace(regexp_replace(t2,
        |    '${TextAnalysis.EmailRe}', '<EMAIL>', 'g'),
        |    '${TextAnalysis.Ipv4Re}', '<IP>', 'g'),
        |    '${TextAnalysis.PhoneRe}', '<PHONE>', 'g')) AS scrub_md5
        |FROM p ORDER BY doc_id""".stripMargin))
  )

  /** Promoted from rows-only (round 3): on this corpus the LSH-emitted
    * pair set provably EQUALS the exact threshold set — every qualifying
    * pair is high-jaccard (≥0.8), where 8-band/4-row collision is
    * near-certain, and the minhash coefficients are fixed, so the banding
    * is deterministic. The oracles below therefore compute the EXACT
    * pair set in SQL; a single missed (or spurious) LSH pair changes
    * the aggregate and fails the hash — the gate now proves both
    * no-false-positives AND completeness of the bucketed path. */
  val withOracle3: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(

    // C2: MinHash+LSH near-dup pairs vs the exact jaccard pair set.
    // sum goes through decimal so the aggregate is accumulation-order-
    // independent in both engines.
    "dedup_minhash" -> ((
      (s: SparkSession, d: String) => {
        Dedup.minhashPairs(t(s, d, "documents"), "text", "doc_id",
            k = 32, bands = 8, w = 3, threshold = 0.3)
          .agg(count(lit(1)).as("n_pairs"),
            round(sum(col("jaccard").cast("decimal(18,4)")), 4)
              .cast("double").as("sum_jaccard"),
            round(max(col("jaccard")), 4).as("max_jaccard"))
      },
      s"""WITH $duckShingles,
        |$duckShingleInter,
        |jp AS (
        |  SELECT round(i::DOUBLE / greatest(sa.n + sb.n - i, 1), 4) AS j
        |  FROM inter JOIN sz sa ON sa.doc_id = ida JOIN sz sb ON sb.doc_id = idb)
        |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(round(sum(CAST(j AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_jaccard,
        |  round(max(j), 4) AS max_jaccard
        |FROM jp WHERE j >= 0.3""".stripMargin)),

    // C2 in PURE SQL (r16): the same minhash→band→bucket→verify chain
    // as dedup_minhash, built entirely from the SQL-registered
    // signature kernels (GraftExtensions: shingle_hashes/minhashes) +
    // vanilla Spark SQL — how the reference's HiveQL-only users lived.
    // Saturation (occ/hub), banding (xxhash64 over 4-slice), and
    // verification replicate Dedup.minhashPairs line for line; the
    // oracle is the SAME exact-jaccard pair set, so a hash match
    // proves the SQL composition ≡ the Scala operator. Plan note: SQL
    // has no `.cache()`, so the documents scan repeats 4× (banded
    // probe/build + both verify sides) — at 100 TB a SQL user
    // materializes the `sh` CTE as a table first (CREATE TABLE sigs
    // AS SELECT doc_id, shingle_hashes(...) ...), which is exactly
    // what the Scala operator's cached signature frame does.
    "dedup_minhash_sql" -> ((
      (s: SparkSession, d: String) => {
        t(s, d, "documents").createOrReplaceTempView("graft_minhash_sql_docs")
        s.sql(
          """WITH sh AS (
            |  SELECT doc_id,
            |    shingle_hashes(split(lower(trim(text)), '\\s+'), 3) AS shingles
            |  FROM graft_minhash_sql_docs),
            |sigs AS (
            |  SELECT doc_id, minhashes(shingles, 32) AS mh FROM sh),
            |banded AS (
            |  SELECT doc_id AS id, band,
            |    xxhash64(concat_ws(',',
            |      transform(slice(mh, band * 4 + 1, 4),
            |        m -> cast(m AS string)))) AS sig
            |  FROM sigs LATERAL VIEW explode(sequence(0, 7)) AS band),
            |probe AS (
            |  SELECT id, band, sig FROM (
            |    SELECT id, band, sig,
            |      count(1) OVER (PARTITION BY band, sig) AS occ,
            |      min(id)  OVER (PARTITION BY band, sig) AS hub
            |    FROM banded)
            |  WHERE occ <= 8192 OR id = hub),
            |cand AS (
            |  SELECT DISTINCT l.id AS id_a, r.id AS id_b
            |  FROM probe l JOIN banded r
            |    ON l.band = r.band AND l.sig = r.sig AND l.id < r.id),
            |verified AS (
            |  SELECT id_a, id_b,
            |    round(cast(size(array_intersect(sa.shingles, sb.shingles)) AS double)
            |      / cast(greatest(size(array_union(sa.shingles, sb.shingles)), 1)
            |             AS double), 4) AS jaccard
            |  FROM cand
            |  JOIN sh sa ON sa.doc_id = id_a
            |  JOIN sh sb ON sb.doc_id = id_b)
            |SELECT cast(count(1) AS BIGINT) AS n_pairs,
            |  cast(round(sum(cast(jaccard AS DECIMAL(18,4))), 4) AS DOUBLE)
            |    AS sum_jaccard,
            |  round(max(jaccard), 4) AS max_jaccard
            |FROM verified WHERE jaccard >= 0.3""".stripMargin)
      },
      s"""WITH $duckShingles,
        |$duckShingleInter,
        |jp AS (
        |  SELECT round(i::DOUBLE / greatest(sa.n + sb.n - i, 1), 4) AS j
        |  FROM inter JOIN sz sa ON sa.doc_id = ida JOIN sz sb ON sb.doc_id = idb)
        |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(round(sum(CAST(j AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_jaccard,
        |  round(max(j), 4) AS max_jaccard
        |FROM jp WHERE j >= 0.3""".stripMargin)),

    // C2+C16 composed: the production dedup chain — MinHash-LSH pair
    // discovery, connected components, keep the cluster representative
    // (min doc_id), report survivor stats. Oracle: recursive-CTE
    // connected components over the exact jaccard edge set.
    "dedup_minhash_clusters" -> ((
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        val pairs = Dedup.minhashPairs(docs, "text", "doc_id",
          k = 32, bands = 8, w = 3, threshold = 0.5)
        val cc = Dedup.connectedComponentsStar(pairs)
        val removed = cc.filter(col("id") =!= col("cluster_id"))
          .select(col("id").as("__rm"))
        docs.join(removed, docs("doc_id") === col("__rm"), "left_anti")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
          .orderBy(col("lang"))
      },
      s"""WITH RECURSIVE $duckShingles,
        |$duckShingleInter,
        |ver AS (
        |  SELECT ida, idb FROM inter
        |  JOIN sz sa ON sa.doc_id = ida JOIN sz sb ON sb.doc_id = idb
        |  WHERE round(i::DOUBLE / greatest(sa.n + sb.n - i, 1), 4) >= 0.5),
        |und AS (SELECT ida AS src, idb AS dst FROM ver
        |        UNION ALL SELECT idb, ida FROM ver),
        |reach(id, label) AS (
        |  SELECT DISTINCT src, src FROM und
        |  UNION
        |  SELECT u.dst, r.label FROM reach r JOIN und u ON u.src = r.id),
        |removed AS (SELECT id FROM reach GROUP BY id HAVING min(label) <> id)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents WHERE doc_id NOT IN (SELECT id FROM removed)
        |GROUP BY lang ORDER BY lang""".stripMargin)),

    // C5: embedding near-dup via hyperplane-LSH buckets. The exact
    // cosine-threshold pair set on this corpus is EMPTY (max pairwise
    // cosine ≈ 0.6 at both SFs, far from the 0.8 threshold and from any
    // float32-vs-double boundary), so the oracle proves the bucketed
    // path emits no false positives; planted-pair recall is spec-covered
    // (OperatorsSpec "embeddingNearDup recalls planted near-identical
    // pairs").
    // C5/C16/C34 composed on EMBEDDINGS (SemDeDup shape): sign-pattern
    // buckets stand in for k-means cells (pure per-row projection, so
    // the oracle recomputes them in SQL), within-bucket cosine >= 0.3
    // edges close into components via the O(log n) star CC, and each
    // component keeps its smallest id. Cross-bucket near-dups are
    // accepted misses — the SemDeDup contract — and BOTH engines apply
    // the same bucket rule, so the kept set is deterministic and fully
    // hash-gated (unlike the rows-only ANN gates).
    "dedup_semantic" -> ((
      (s: SparkSession, d: String) => {
        Similarity.semanticDedup(t(s, d, "embeddings"), "vec_id", "embedding",
            threshold = 0.3, signDims = 4)
          .orderBy(col("vec_id"))
      },
      """WITH RECURSIVE v AS (SELECT vec_id, embedding FROM embeddings),
        |b AS (
        |  SELECT vec_id, embedding,
        |    (CASE WHEN embedding[1] > 0 THEN 8 ELSE 0 END +
        |     CASE WHEN embedding[2] > 0 THEN 4 ELSE 0 END +
        |     CASE WHEN embedding[3] > 0 THEN 2 ELSE 0 END +
        |     CASE WHEN embedding[4] > 0 THEN 1 ELSE 0 END) AS bucket
        |  FROM v),
        |e AS (
        |  SELECT a.vec_id AS ida, b2.vec_id AS idb
        |  FROM b a JOIN b b2
        |    ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
        |  WHERE round(list_cosine_similarity(a.embedding, b2.embedding), 4) >= 0.3),
        |und AS (SELECT ida AS src, idb AS dst FROM e
        |        UNION ALL SELECT idb, ida FROM e),
        |reach(id, label) AS (
        |  SELECT DISTINCT src, src FROM und
        |  UNION
        |  SELECT u.dst, r.label FROM reach r JOIN und u ON u.src = r.id),
        |cc AS (SELECT id, min(label) AS cluster_id FROM reach GROUP BY id),
        |sizes AS (SELECT cluster_id, count(*) AS n FROM cc GROUP BY cluster_id)
        |SELECT v.vec_id, CAST(COALESCE(s.n, 1) AS BIGINT) AS n_members
        |FROM v
        |LEFT JOIN cc ON cc.id = v.vec_id
        |LEFT JOIN sizes s ON s.cluster_id = cc.cluster_id
        |WHERE cc.id IS NULL OR cc.cluster_id = v.vec_id
        |ORDER BY v.vec_id""".stripMargin)),

    // C37 over TRAINED cells — the actual SemDeDup structure (Abbas et
    // al. 2023): cells are the deterministic kmeansCentroids result,
    // trained once on the sf0.01 embeddings and PINNED
    // (functions.PinnedCentroids, the train-once-serve-many
    // discipline); assignment = argmax of round-4 cosines against the
    // literal with smallest-cell tie-break. The oracle replays the
    // SAME literal: cell assignment, within-cell threshold edges, CC,
    // and the kept set are all recomputed in SQL — fully hash-gated at
    // every SF, including SFs the centroids were never trained on.
    "dedup_semantic_kmeans" -> ((
      (s: SparkSession, d: String) => {
        Similarity.semanticDedupKMeans(t(s, d, "embeddings"), "vec_id",
            "embedding", threshold = 0.3,
            cents = graft.functions.PinnedCentroids.cells16)
          .orderBy(col("vec_id"))
      }, {
        val sims = graft.functions.PinnedCentroids.sqlLists
          .map(l => s"round(list_cosine_similarity(embedding, $l), 4)")
          .mkString(",\n        |      ")
        s"""WITH RECURSIVE v AS (SELECT vec_id, embedding FROM embeddings),
        |b AS (
        |  SELECT vec_id, embedding,
        |    list_position(sims, list_max(sims)) AS bucket
        |  FROM (
        |    SELECT vec_id, embedding, [
        |      $sims
        |    ] AS sims FROM v)),
        |e AS (
        |  SELECT a.vec_id AS ida, b2.vec_id AS idb
        |  FROM b a JOIN b b2
        |    ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
        |  WHERE round(list_cosine_similarity(a.embedding, b2.embedding), 4) >= 0.3),
        |und AS (SELECT ida AS src, idb AS dst FROM e
        |        UNION ALL SELECT idb, ida FROM e),
        |reach(id, label) AS (
        |  SELECT DISTINCT src, src FROM und
        |  UNION
        |  SELECT u.dst, r.label FROM reach r JOIN und u ON u.src = r.id),
        |cc AS (SELECT id, min(label) AS cluster_id FROM reach GROUP BY id),
        |sizes AS (SELECT cluster_id, count(*) AS n FROM cc GROUP BY cluster_id)
        |SELECT v.vec_id, CAST(COALESCE(s.n, 1) AS BIGINT) AS n_members
        |FROM v
        |LEFT JOIN cc ON cc.id = v.vec_id
        |LEFT JOIN sizes s ON s.cluster_id = cc.cluster_id
        |WHERE cc.id IS NULL OR cc.cluster_id = v.vec_id
        |ORDER BY v.vec_id""".stripMargin
      })),

    // The synthetic embeddings carry NO pair above 0.8, which left this
    // gate verifying an empty answer (r12 finding). Planted EXACT
    // duplicates (every 9th vector re-appended under a shifted id) make
    // it a genuine detection gate: identical vectors share every LSH
    // bucket by construction, so banded recall for the planted pairs is
    // structurally 1 — no probabilistic recall leaks into the hash
    // compare — while every non-identical pair stays below threshold.
    "embed_near_dup" -> ((
      (s: SparkSession, d: String) => {
        val emb = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
        val maxIdRow = emb.agg(max(col("vec_id"))).head
        val maxId = if (maxIdRow.isNullAt(0)) 0L else maxIdRow.getLong(0)
        val corpus = emb.unionAll(emb.filter(col("vec_id") % 9 === 0)
          .select((col("vec_id") + lit(maxId + 1)).as("vec_id"),
            col("embedding")))
        Similarity.embeddingNearDup(corpus, "vec_id", "embedding",
            threshold = 0.8)
          .agg(count(lit(1)).as("n_pairs"),
            round(coalesce(avg(col("cosine")), lit(-1.0)), 4).as("avg_cosine"))
      },
      """WITH corpus AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + (SELECT max(vec_id) + 1 FROM embeddings), embedding
        |  FROM embeddings WHERE vec_id % 9 = 0)
        |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |  round(coalesce(avg(c), -1.0), 4) AS avg_cosine
        |FROM (
        |  SELECT list_cosine_similarity(a.embedding, b.embedding) AS c
        |  FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id)
        |WHERE c >= 0.8""".stripMargin))
  )

  /** Measured recall@10 per ANN gate, recorded when the gate last ran —
    * surfaced by Bench as the `ann_recall` block in bench-out.json so a
    * recall regression is visible in round artifacts without re-reading
    * gate internals. */
  val annRecall = scala.collection.concurrent.TrieMap[String, Double]()

  /** Train-once artifact dirs (persisted ANN index, …), memoized per
    * (tag, source dir) within the JVM — same discipline as
    * LwesQueries' journal cache. */
  private val artifactCache =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private def cached(key: String)(build: String => Unit): String =
    artifactCache.getOrElseUpdate(key, {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-${key.takeWhile(_ != '|')}").toString
      build(dir)
      dir
    })

  /** Builds a (query fn, oracle SQL) pair asserting an ANN path's
    * recall@10 vs the exact brute-force top-k meets `floor` — the
    * necessary-condition-oracle shape used by the C7 recall gates.
    * The aggregate is computed ONCE (same distributed work as before);
    * the measured value lands in [[annRecall]] and the gate returns a
    * local one-row frame with the unchanged (n_queries,
    * recall_floor_met) schema. */
  private def recallGate(key: String, floor: Double,
      approx: (DataFrame, DataFrame) => DataFrame)
      : ((SparkSession, String) => DataFrame, String) = ((
    (s: SparkSession, d: String) => {
      val emb = t(s, d, "embeddings")
      val q = emb.filter(col("vec_id") % 20 === 0)
      val exact = Similarity.cosineTopK(emb, q, "vec_id", "embedding", 10)
        .select(col("query_id"), col("neighbor_id"))
      val a = approx(emb, q)
        .select(col("query_id").as("aq"), col("neighbor_id").as("an"))
      val row = exact.join(a,
          col("query_id") === col("aq") && col("neighbor_id") === col("an"),
          "left_outer")
        .agg(countDistinct(col("query_id")).as("n_queries"),
          (count(col("an")).cast("double") / count(lit(1))).as("recall"))
        .head()
      val recall = row.getDouble(1)
      annRecall(key) = recall
      import s.implicits._
      Seq((row.getLong(0), recall >= floor))
        .toDF("n_queries", "recall_floor_met")
    },
    """SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n_queries,
      |  true AS recall_floor_met
      |FROM embeddings WHERE vec_id % 20 = 0""".stripMargin))

  /** Wraps a raw ANN top-k run (result: query_id, rnk, neighbor_id,
    * score) in the STRUCTURAL contracts an external oracle CAN assert —
    * the r14 verdict's "deterministic count+floor" conversion that
    * retires the suite's last `no_oracle` rows. The neighbor SETS stay
    * engine-specific (that's what the recall twins measure against the
    * exact top-k); what is deterministic, and now hash-gated:
    *
    *  - `n_queries`: every probe (vec_id < 10) returned ≥ 1 neighbor —
    *    the oracle counts the probe rows from the table itself, so a
    *    routing regression that silently drops a query breaks the hash;
    *  - `k_contract_ok`: per query, ≤ k distinct neighbors with a dense
    *    1..n rank sequence;
    *  - `scores_exact_ok`: every reported score equals the exact
    *    round-4 cosine of (query, neighbor) recomputed from the table —
    *    the re-rank stage's exactness promise, which is what makes ANN
    *    precision 1 whatever the bucketing missed;
    *  - `scores_sorted_ok`: scores non-increasing in rank (desc
    *    tie-break by neighbor_id is pinned by rankTopK);
    *  - `no_self_ok`: a query never reports itself.
    *
    * The ANN plan itself is UNCHANGED — the checks ride on its ≤
    * |queries|·k output rows (two joins that AQE broadcasts), so the
    * bench keys keep measuring the same distributed work. */
  /** Per-path ordering contract for [[annStructuralGate]]:
    *  - ExactScore: result has `score` == round-4 exact cosine, ranked
    *    desc (lshTopK/ivfTopK — both exact-rescore their candidates);
    *  - AdcAsc: result has `adc_dist` ranked asc (pqTopK refine=0 —
    *    ADC values are codebook-specific, but their ORDER is pinned);
    *  - RefinedCosine: rank order is by the exact cosine recomputed
    *    from the table even though the exposed column is `adc_dist`
    *    (ivfPqTopK refine>0 — the RefineFlat re-rank promise). */
  private sealed trait AnnOrder
  private case object ExactScore extends AnnOrder
  private case object AdcAsc extends AnnOrder
  private case object RefinedCosine extends AnnOrder

  private def annStructuralGate(k: Int, order: AnnOrder,
      approx: (SparkSession, DataFrame, DataFrame) => DataFrame)
      : ((SparkSession, String) => DataFrame, String) = ((
    (s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val emb = t(s, d, "embeddings")
      val r = approx(s, emb, emb.filter(col("vec_id") < 10))
      val v = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      val w = Window.partitionBy(col("query_id")).orderBy(col("rnk"))
      val exactCos = round(graft.functions.SignatureExpressions
        .cosine_sim(col("v_q"), col("v_n")), 4)
      val base = r
        .join(v.select(col("vec_id").as("query_id"), col("v").as("v_q")),
          Seq("query_id"))
        .join(v.select(col("vec_id").as("neighbor_id"), col("v").as("v_n")),
          Seq("neighbor_id"))
        .withColumn("not_self",
          (col("query_id") =!= col("neighbor_id")).cast("int"))
      val checked = order match {
        case ExactScore => base
          .withColumn("exact_ok", (col("score") === exactCos).cast("int"))
          .withColumn("order_ok", coalesce(
            col("score") <= lag(col("score"), 1).over(w), lit(true))
            .cast("int"))
        case AdcAsc => base
          .withColumn("exact_ok", lit(1))
          .withColumn("order_ok", coalesce(
            col("adc_dist") >= lag(col("adc_dist"), 1).over(w), lit(true))
            .cast("int"))
        case RefinedCosine => base
          .withColumn("__c", exactCos)
          .withColumn("exact_ok", lit(1))
          .withColumn("order_ok", coalesce(
            col("__c") <= lag(col("__c"), 1).over(w), lit(true)).cast("int"))
      }
      val perQ = checked.groupBy(col("query_id")).agg(
        count(lit(1)).as("n"), min(col("rnk")).as("min_rnk"),
        max(col("rnk")).as("max_rnk"),
        countDistinct(col("neighbor_id")).as("n_dist"),
        min(col("exact_ok")).as("ex"), min(col("not_self")).as("ns"),
        min(col("order_ok")).as("so"))
      val agg = perQ.agg(
        count(lit(1)).as("n_queries"),
        (min((col("n") <= k && col("min_rnk") === 1 &&
          col("max_rnk") === col("n") && col("n_dist") === col("n"))
          .cast("int")) === 1).as("k_contract_ok"),
        (min(col("ex")) === 1).as("ex_ok"),
        (min(col("so")) === 1).as("order_contract_ok"),
        (min(col("ns")) === 1).as("no_self_ok"))
      order match {
        case ExactScore => agg
          .withColumnRenamed("ex_ok", "scores_exact_ok")
        case _ => agg.drop("ex_ok") // vacuously-true column would be noise
      }
    },
    (if (order == ExactScore)
      """SELECT CAST(count(*) AS BIGINT) AS n_queries,
        |  true AS k_contract_ok, true AS scores_exact_ok,
        |  true AS order_contract_ok, true AS no_self_ok
        |FROM embeddings WHERE vec_id < 10"""
    else
      """SELECT CAST(count(*) AS BIGINT) AS n_queries,
        |  true AS k_contract_ok,
        |  true AS order_contract_ok, true AS no_self_ok
        |FROM embeddings WHERE vec_id < 10""").stripMargin))

  /** C7/C30 raw ANN paths, structurally oracle-gated (their recall-vs-
    * exact contracts live in the `*_recall` twins). */
  val withOracle6: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(

    // C7: LSH-bucketed ANN (scale path of sim_topk).
    "sim_lsh" -> annStructuralGate(5, ExactScore, (s, emb, q) =>
      Similarity.lshTopK(emb, q, "vec_id", "embedding",
        k = 5, nPlanes = 4, nTables = 12)),

    // C7b: IVF-flat ANN (inverted-list scale path; r19: nprobe=10,
    // aligned with the recall twin's retune).
    "sim_ivf" -> annStructuralGate(5, ExactScore, (s, emb, q) =>
      Similarity.ivfTopK(emb, q, "vec_id", "embedding",
        k = 5, nLists = 16, nprobe = 10)),

    // C30: product-quantization ANN (memory-bound scale path: codes on
    // the wire, table lookups per pair). ADC distances are codebook-
    // specific so only their ORDER is contract; recall twin sim_pq_recall
    // carries the quality floor.
    "sim_pq" -> annStructuralGate(5, AdcAsc, (s, emb, q) =>
      Similarity.pqTopK(emb, q, "vec_id", "embedding", k = 5)),

    // C7+C30: composed IVF-PQ (routing + codes — the production ANN
    // shape at corpus scale); refine>0 re-ranks by exact cosine, which
    // the gate recomputes from the table to pin the order.
    "sim_ivfpq" -> annStructuralGate(5, RefinedCosine, (s, emb, q) =>
      Similarity.ivfPqTopK(emb, q, "vec_id", "embedding",
        k = 5, nLists = 16, nprobe = 12, refine = 5)),
  )


  /** C1-C13 composed: the full corpus-cleaning pipeline in one plan —
    * exact dedup -> quality filter -> near-dup removal (MinHash-LSH) ->
    * decontamination -> per-lang stats of the surviving corpus.
    * Stage order is the 100 TB-shaped one: the per-row quality filter
    * is O(n) and cuts the corpus BEFORE the candidate-pair stage, whose
    * cost scales with bucket occupancy.
    *
    * Promoted from rows-only (round 3): every stage is SQL-expressible
    * (the LSH pair set equals the exact jaccard set on this corpus, see
    * [[withOracle3]]), so the oracle replays the whole chain as one CTE
    * pipeline. Quality totals go through decimal sums so no aggregate
    * depends on accumulation order. */
  val withOracle4: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "pipeline_clean_corpus" -> ((
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        val exact = Dedup.exact(docs, Seq("text"), "doc_id")
        // persist the filtered corpus: four downstream subtrees (minhash
        // signatures, anti-join left side, decontamination shingles,
        // final anti-join) would each re-run the dedup window + quality
        // regexes otherwise — the same midpoint you'd checkpoint at 100 TB
        val quality = TextAnalysis.qualityScore(exact)
          .filter(col("quality_score") >= 0.3).cache()
        val nearDupIds = Dedup.minhashPairs(quality, "text", "doc_id",
            k = 32, bands = 8, w = 3, threshold = 0.8)
          .select(col("id_b").as("__dup_id")).distinct()
        val noDups = quality.join(nearDupIds,
          quality("doc_id") === col("__dup_id"), "left_anti").cache()
        val probes = docs.filter(col("doc_id") % 100 === 0)
          .select(col("doc_id").as("probe_id"), col("text"))
        val clean = graft.operators.Contamination.decontaminate(
          noDups, probes, threshold = 0.9)
        clean.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            round(sum(col("quality_score").cast("decimal(18,6)")), 4)
              .cast("double").as("total_quality"),
            sum(col("n_chars")).as("total_chars"))
          .orderBy(col("lang"))
      },
      s"""WITH $duckShingles,
        |$duckShingleInter,
        |ex AS (
        |  SELECT * FROM documents
        |  QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1),
        |m AS (
        |  SELECT doc_id, lang, n_chars,
        |    CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS BIGINT) AS n_words,
        |    round(length(regexp_replace(text, '[^.!?,;:]', '', 'g'))::DOUBLE /
        |      greatest(length(text), 1), 4) AS punct_ratio,
        |    round(length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE /
        |      greatest(length(text), 1), 4) AS digit_ratio,
        |    round(len(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')))::DOUBLE /
        |      greatest(len(regexp_split_to_array(lower(trim(text)), '\\s+')), 1), 4) AS distinct_ratio
        |  FROM ex),
        |q AS (
        |  SELECT * FROM (
        |    SELECT doc_id, lang, n_chars,
        |      round(least(1.0, greatest(0.0,
        |        0.25 * least(n_words / 100.0, 1.0)
        |        + 0.25 * distinct_ratio
        |        + 0.25 * (1.0 - punct_ratio)
        |        + 0.25 * (1.0 - digit_ratio))), 6) AS quality_score
        |    FROM m)
        |  WHERE quality_score >= 0.3),
        |ver AS (
        |  SELECT ida, idb FROM inter
        |  JOIN sz sa ON sa.doc_id = ida JOIN sz sb ON sb.doc_id = idb
        |  WHERE ida IN (SELECT doc_id FROM q)
        |    AND idb IN (SELECT doc_id FROM q)
        |    AND round(i::DOUBLE / greatest(sa.n + sb.n - i, 1), 4) >= 0.8),
        |nodups AS (
        |  SELECT * FROM q WHERE doc_id NOT IN (SELECT idb FROM ver)),
        |pinv AS (SELECT doc_id AS pid, unnest(s) AS g FROM sh
        |         WHERE doc_id % 100 = 0),
        |psz AS (SELECT doc_id AS pid, len(s) AS n FROM sh
        |        WHERE doc_id % 100 = 0),
        |pint AS (
        |  SELECT di.doc_id, pi.pid, count(*) AS i
        |  FROM inv di JOIN pinv pi USING (g)
        |  WHERE di.doc_id IN (SELECT doc_id FROM nodups)
        |  GROUP BY 1, 2),
        |bad AS (
        |  SELECT DISTINCT doc_id FROM pint JOIN psz USING (pid)
        |  WHERE round(i::DOUBLE / greatest(psz.n, 1), 4) >= 0.9),
        |clean AS (SELECT * FROM nodups WHERE doc_id NOT IN (SELECT doc_id FROM bad))
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(round(sum(CAST(quality_score AS DECIMAL(18,6))), 4) AS DOUBLE) AS total_quality,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM clean GROUP BY lang ORDER BY lang""".stripMargin))
  )

  /** Round-7 additions: relevance weighting + weighted sampling. */
  val withOracle5: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(

    // C25: TF-IDF keyword extraction — top-3 terms per doc. The RANKING
    // is pure integer math (tf desc, df asc, token asc), so rank order
    // replays exactly in any engine; the tfidf VALUE (the one float,
    // ln-based) is emitted rounded to 2 decimals. TopK.perKey re-plans
    // the window into the bounded-heap TopKPerKey exec.
    "text_tfidf" -> ((
      (s: SparkSession, d: String) => {
        val scored = TextAnalysis.tfidf(t(s, d, "documents"))
        graft.plans.TopK.perKey(scored, Seq(col("doc_id")),
            Seq(col("tf").desc, col("df").asc, col("token").asc), 3)
          .select(col("doc_id"), col("rnk").cast("long").as("rnk"),
            col("token"), col("tf"), col("df"),
            round(col("tfidf"), 2).as("tfidf"))
          .orderBy(col("doc_id"), col("rnk"))
      },
      """WITH tf AS (
        |  SELECT doc_id, token, count(*) AS tf
        |  FROM (SELECT doc_id,
        |          unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
        |        FROM documents)
        |  WHERE length(token) >= 3
        |  GROUP BY doc_id, token),
        |dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
        |n AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
        |ranked AS (
        |  SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
        |    round(tf.tf * (ln((n.n + 1.0) / (dfreq.df + 1.0)) + 1.0), 2) AS tfidf,
        |    CAST(row_number() OVER (PARTITION BY tf.doc_id
        |      ORDER BY tf.tf DESC, dfreq.df ASC, tf.token ASC) AS BIGINT) AS rnk
        |  FROM tf JOIN dfreq USING (token) CROSS JOIN n)
        |SELECT doc_id, rnk, token, tf, df, tfidf FROM ranked WHERE rnk <= 3
        |ORDER BY doc_id, rnk""".stripMargin)),

    // C27: char-trigram LM likelihood (corpus self-scoring). Per-term
    // logs are decimal-quantized before the sum, so the float aggregate
    // is accumulation-order-independent — same device as
    // pipeline_clean_corpus's quality totals.
    "text_lm_score" -> ((
      (s: SparkSession, d: String) => {
        TextAnalysis.charTrigramLogLik(t(s, d, "documents"))
          .orderBy(col("doc_id"))
      },
      """WITH t AS (SELECT doc_id, lower(trim(text)) AS tx FROM documents),
        |g AS (SELECT doc_id, unnest(generate_series(1, length(tx) - 2)) AS i, tx
        |      FROM t WHERE length(tx) >= 3),
        |tr AS (SELECT doc_id, substring(tx, i, 3) AS tri FROM g),
        |m AS (SELECT doc_id, tri, count(*) AS m FROM tr GROUP BY doc_id, tri),
        |c3 AS (SELECT tri, sum(m) AS c3 FROM m GROUP BY tri),
        |c2 AS (SELECT substring(tri, 1, 2) AS bi, sum(c3) AS c2 FROM c3 GROUP BY bi),
        |ll AS (
        |  SELECT m.doc_id, m.m,
        |    CAST(ln(CAST(c3.c3 + 1 AS DOUBLE) / (c2.c2 + 256)) AS DECIMAL(18,9)) AS l
        |  FROM m JOIN c3 USING (tri)
        |  JOIN c2 ON substring(m.tri, 1, 2) = c2.bi)
        |SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_tri,
        |  round(CAST(sum(m * l) AS DOUBLE) / sum(m), 4) AS avg_ll
        |FROM ll GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // C26: deterministic weighted sampling (A-ES exponential keys over
    // a portable md5 uniform) — 20 docs weight-proportional to length.
    // The selected SET is ulp-robust (adjacent order statistics of the
    // random keys are far wider apart than float error); the key itself
    // is emitted rounded to 4 decimals.
    "text_sample_weighted" -> ((
      (s: SparkSession, d: String) => {
        graft.operators.Sampling.weightedSample(
            t(s, d, "documents"), "doc_id", "n_chars", 20)
          .select(col("doc_id"), col("lang"), col("n_chars"),
            round(col("sample_key"), 4).as("sample_key"))
          .orderBy(col("doc_id"))
      },
      """SELECT * FROM (
        |  SELECT doc_id, lang, n_chars,
        |    round(pow(u, 1.0 / n_chars), 4) AS sample_key
        |  FROM (SELECT doc_id, lang, n_chars,
        |          (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
        |            + 1.0) / 1152921504606846976.0 AS u
        |        FROM documents WHERE n_chars > 0)
        |  ORDER BY pow(u, 1.0 / n_chars) DESC, doc_id
        |  LIMIT 20)
        |ORDER BY doc_id""".stripMargin)),

    // C28: cross-document repeated 8-token spans (the exact-substring
    // dedup signal of Lee et al. 2021) — every span in >= 2 distinct
    // docs, with occurrence counts. The md5 span keys make the whole
    // table replayable in SQL; a missed or spurious span changes the
    // aggregate and fails the hash.
    "text_spans" -> ((
      (s: SparkSession, d: String) => {
        graft.operators.Spans.repeatedSpans(
            t(s, d, "documents"), w = 8, minDocs = 2)
          .orderBy(col("span_md5"))
      },
      """WITH tok AS (
        |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
        |  FROM documents),
        |spans AS (
        |  SELECT doc_id, md5(array_to_string(t[k:k+7], ' ')) AS span_md5
        |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 7)) AS k
        |        FROM tok WHERE len(t) >= 8))
        |SELECT span_md5, CAST(count(*) AS BIGINT) AS n_occurrences,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  min(doc_id) AS first_doc
        |FROM spans GROUP BY span_md5
        |HAVING count(DISTINCT doc_id) >= 2
        |ORDER BY span_md5""".stripMargin)),

    // C14/C27/C17/C22 composed: the END-TO-END TRAINING-MIX layout —
    // LM-score every document (C27), keep the above-threshold half,
    // draw a deterministic portable 50% hash sample of the keepers
    // (C17), and pack the survivors into per-language token-budget
    // shards (C22). One gate proves the whole score->filter->sample->
    // pack chain composes without any stage disturbing another's
    // contract; the oracle replays every stage (quantized trigram
    // log-lik, md5 bucket, running-sum shard assignment) and the
    // per-shard decimal-quantized score totals pin the score values
    // that flowed THROUGH the pipeline, not just survivor counts.
    "pipeline_training_mix" -> ((
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        val scored = TextAnalysis.charTrigramLogLik(docs)
        val kept = docs.join(scored, "doc_id")
          .filter(col("avg_ll") >= lit(-0.95))
        val sampled = graft.operators.Sampling.hashSample(
          kept, "doc_id", pct = 50, portable = true)
        val sharded = graft.operators.Sampling.shardByTokenBudget(
          sampled, "lang", "doc_id", "text", 400)
        sharded.groupBy(col("lang"), col("shard_id"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tok")).as("shard_tokens"),
            round(sum(col("avg_ll").cast("decimal(18,4)")), 4)
              .cast("double").as("sum_ll"))
          .orderBy(col("lang"), col("shard_id"))
      },
      """WITH t AS (SELECT doc_id, lower(trim(text)) AS tx FROM documents),
        |g AS (SELECT doc_id, unnest(generate_series(1, length(tx) - 2)) AS i, tx
        |      FROM t WHERE length(tx) >= 3),
        |tr AS (SELECT doc_id, substring(tx, i, 3) AS tri FROM g),
        |m AS (SELECT doc_id, tri, count(*) AS m FROM tr GROUP BY doc_id, tri),
        |c3 AS (SELECT tri, sum(m) AS c3 FROM m GROUP BY tri),
        |c2 AS (SELECT substring(tri, 1, 2) AS bi, sum(c3) AS c2 FROM c3 GROUP BY bi),
        |ll AS (
        |  SELECT m.doc_id, m.m,
        |    CAST(ln(CAST(c3.c3 + 1 AS DOUBLE) / (c2.c2 + 256)) AS DECIMAL(18,9)) AS l
        |  FROM m JOIN c3 USING (tri)
        |  JOIN c2 ON substring(m.tri, 1, 2) = c2.bi),
        |score AS (
        |  SELECT doc_id, round(CAST(sum(m * l) AS DOUBLE) / sum(m), 4) AS avg_ll
        |  FROM ll GROUP BY doc_id),
        |samp AS (
        |  SELECT d.doc_id, d.lang, d.text, s.avg_ll
        |  FROM documents d JOIN score s USING (doc_id)
        |  WHERE s.avg_ll >= -0.95
        |    AND CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 50),
        |tk AS (
        |  SELECT lang, doc_id, avg_ll,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
        |  FROM samp),
        |c AS (
        |  SELECT lang, avg_ll, ntok,
        |    sum(ntok) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cumb
        |  FROM tk)
        |SELECT lang, CAST(floor(COALESCE(cumb, 0)::DOUBLE / 400) AS BIGINT) AS shard_id,
        |  count(*) AS n_docs, CAST(sum(ntok) AS BIGINT) AS shard_tokens,
        |  CAST(round(sum(CAST(avg_ll AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_ll
        |FROM c GROUP BY 1, 2 ORDER BY lang, shard_id""".stripMargin)),

    // C29: Bloom-gated decontamination — the corpus side is a pure
    // projection against a broadcast Bloom filter of probe shingles;
    // only flagged docs pay the exact verification join. The oracle
    // replays the EXACT containment answer (the Bloom no-false-negative
    // contract means the gated path must equal the full join), and
    // bloom_caught pins the contaminated ⇒ flagged implication.
    "text_bloom_decontam" -> ((
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        val probes = docs.filter(col("doc_id") < 5)
          .select(col("doc_id").as("probe_id"), col("text"))
        graft.operators.Spans.bloomDecontaminate(docs, probes, threshold = 0.5)
          .select(col("doc_id"), col("contaminated"),
            (!col("contaminated") || col("bloom_hit")).as("bloom_caught"))
          .orderBy(col("doc_id"))
      },
      s"""WITH $duckShingles,
        |probes AS (SELECT doc_id AS probe_id, s AS ps FROM sh WHERE doc_id < 5),
        |cont AS (
        |  SELECT DISTINCT d.doc_id
        |  FROM sh d CROSS JOIN probes p
        |  WHERE round(len(list_intersect(d.s, p.ps))::DOUBLE /
        |          greatest(len(p.ps), 1), 4) >= 0.5)
        |SELECT doc_id,
        |  (doc_id IN (SELECT doc_id FROM cont)) AS contaminated,
        |  true AS bloom_caught
        |FROM documents ORDER BY doc_id""".stripMargin))
  )
}
