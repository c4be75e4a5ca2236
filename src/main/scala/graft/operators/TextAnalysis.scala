package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (SURVEY.md §2
  * C8-C11). Everything is built from codegen'd `functions._` — no UDFs —
  * so the hot path stays inside whole-stage codegen and scales linearly
  * with executors.
  */
object TextAnalysis {

  /** Whitespace tokens of a text column (lowercased). */
  def tokens(text: Column): Column =
    split(lower(trim(text)), "\\s+")

  // -------------------------------------------------------------- C10

  /** BPE-ish token pattern: letter runs, digit runs, single punctuation. */
  val BpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Adds `n_tokens` (whitespace) and `n_bpeish` (regex pieces); with
    * `bpeMerges` set, also `n_bpe` — the REAL byte-pair-merge token
    * count under that table ([[graft.functions.Bpe]]), which is what a
    * training pipeline budgets shards and chunks with. */
  def tokenCounts(df: DataFrame, textCol: String = "text",
      bpeMerges: Option[Seq[(String, String)]] = None): DataFrame = {
    val base = df
      .withColumn("n_tokens", size(tokens(col(textCol))).cast("long"))
      .withColumn("n_bpeish",
        size(regexp_extract_all(col(textCol), lit(BpeishPattern), lit(0))).cast("long"))
    bpeMerges.fold(base)(m => base.withColumn("n_bpe",
      graft.functions.Bpe.bpe_token_count(tokens(col(textCol)), m)))
  }

  /** Train a BPE merge table from the corpus (C10 upgrade). The
    * distributed half is ONE keyed shuffle: explode to words, count,
    * and keep the top `maxVocab` words by (frequency desc, word) — a
    * TakeOrdered of bounded driver size (per-partition heaps, no global
    * sort), exactly the reservoir a production tokenizer trains on. The
    * Sennrich merge loop itself then runs locally over that bounded
    * vocabulary ([[graft.functions.Bpe.train]]) and the resulting table
    * ships back to executors as an expression reference object. At
    * 100 TB nothing changes: vocabulary extraction is corpus-parallel,
    * the collected table is maxVocab rows regardless of corpus size,
    * and training cost is independent of document count. */
  def trainBpeMerges(df: DataFrame, textCol: String = "text",
      numMerges: Int = 160, maxVocab: Int = 65536,
      requireUncapped: Boolean = false): IndexedSeq[(String, String)] = {
    val wf = df.select(explode(tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("w")).limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // `requireUncapped`: callers whose CONTRACT assumes the trainer saw
    // every distinct word (the gate whose oracle replays training over
    // the full vocabulary) fail loudly when the cap may have truncated.
    // Derived from the trainer's own collected vocab — no extra scan; a
    // full collection of exactly maxVocab rows is indistinguishable
    // from a truncated one, so it conservatively aborts too.
    if (requireUncapped) require(wf.length < maxVocab,
      s"trainBpeMerges: vocabulary reached the maxVocab=$maxVocab cap; " +
        "a full-vocabulary replay would diverge")
    graft.functions.Bpe.train(wf, numMerges)
  }

  // --------------------------------------------------------------- C9

  /** Quality signals: length, word stats, punctuation/digit ratios,
    * stopword ratio, repetition (distinct-token ratio), plus a single
    * composite `quality_score` in [0,1]. */
  def qualityScore(df: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    val nTok = size(toks).cast("double")
    val nChar = length(col(textCol)).cast("double")
    df.withColumn("n_chars_q", nChar.cast("long"))
      .withColumn("n_words", nTok.cast("long"))
      .withColumn("avg_word_len", round(nChar / greatest(nTok, lit(1.0)), 4))
      .withColumn("punct_ratio",
        round(length(regexp_replace(col(textCol), "[^.!?,;:]", "")) / greatest(nChar, lit(1.0)), 4))
      .withColumn("digit_ratio",
        round(length(regexp_replace(col(textCol), "[^0-9]", "")) / greatest(nChar, lit(1.0)), 4))
      .withColumn("stopword_ratio",
        round(size(filter(toks, t => t.isin(Seq("the", "a", "of", "and", "to", "in", "is", "it"): _*)))
          / greatest(nTok, lit(1.0)), 4))
      .withColumn("distinct_ratio",
        round(size(array_distinct(toks)) / greatest(nTok, lit(1.0)), 4))
      // components sit on a 1e-4 grid, so the weighted sum is on a
      // 2.5e-5 grid: round to 6 decimals (never a .5 rounding boundary,
      // which Spark and other engines break differently)
      .withColumn("quality_score",
        round(least(lit(1.0), greatest(lit(0.0),
          lit(0.25) * least(nTok / 100.0, lit(1.0)) // enough content
            + lit(0.25) * col("distinct_ratio") // not repetitive
            + lit(0.25) * (lit(1.0) - col("punct_ratio")) // not punct soup
            + lit(0.25) * (lit(1.0) - col("digit_ratio")))), 6)) // not number soup
  }

  // -------------------------------------------------------------- C31

  /** Source-level curation profile (RefinedWeb/CCNet shape): corpora
    * are curated per ORIGIN (domain / crawl / feed) before per-document
    * filtering — a low-quality source taints all its documents, and
    * source decisions amortize over millions of them. One row per
    * source: doc count, token totals, and mean document quality
    * ([[qualityScore]]) — carried as `quality_sum_1e6`, an EXACT
    * integer sum (order-independent, engine-portable: the 6-decimal
    * quality grid scaled to integers), plus the derived double mean.
    * Sources are a low-cardinality dimension next to the corpus, so
    * the aggregate is one keyed shuffle of per-source partials. */
  def sourceProfile(df: DataFrame, textCol: String = "text",
      sourceCol: String = "source"): DataFrame =
    qualityScore(df, textCol)
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("total_words"),
        sum(round(col("quality_score") * 1e6).cast("long")).as("quality_sum_1e6"))
      .withColumn("mean_quality",
        round(col("quality_sum_1e6") / (col("n_docs") * lit(1e6)), 4))

  /** Drop every document of sources below the quality bar (mean doc
    * quality < minMeanQuality, or fewer than minDocs documents — tiny
    * sources have unreliable means). The keep-set is one row per
    * surviving origin — usually dimension-sized but not PROVABLY
    * bounded (URL-grained corpora can reach 1e8 origins), so the
    * semi-join strategy is left to AQE, which broadcasts exactly when
    * the built keep side is under the threshold and falls back to a
    * shuffle semi-join when it is not. `broadcastKeep = true` forces
    * the hint for callers with a known-small origin dimension. */
  def filterBySourceQuality(df: DataFrame, minMeanQuality: Double,
      minDocs: Long = 1L, textCol: String = "text",
      sourceCol: String = "source", broadcastKeep: Boolean = false): DataFrame = {
    val keep = sourceProfile(df, textCol, sourceCol)
      .filter(col("mean_quality") >= minMeanQuality && col("n_docs") >= minDocs)
      .select(col(sourceCol))
    val keepSide = if (broadcastKeep) broadcast(keep) else keep
    df.join(keepSide, Seq(sourceCol), "left_semi")
  }

  // --------------------------------------------------------------- C8

  /** Marker-word scores per language (n-gram/stopword heuristic). CJK
    * presence short-circuits to zh. Deterministic priority on ties:
    * en > de > es > fr. */
  def langId(df: DataFrame, textCol: String = "text"): DataFrame = {
    def score(markers: String): Column =
      size(regexp_extract_all(col(textCol), lit(s"\\b($markers)\\b"), lit(0))).cast("long")
    df.withColumn("score_en", score("the|a|of|and|to|is"))
      .withColumn("score_de", score("der|die|das|und|ist|nicht"))
      .withColumn("score_es", score("el|la|los|las|es|y"))
      .withColumn("score_fr", score("le|la|les|et|est|ne"))
      .withColumn("has_cjk", col(textCol).rlike("[\\x{4e00}-\\x{9fff}]"))
      .withColumn("predicted_lang",
        when(col("has_cjk"), "zh")
          .when(col("score_en") >= greatest(col("score_de"), col("score_es"), col("score_fr")) &&
            col("score_en") > 0, "en")
          .when(col("score_de") >= greatest(col("score_es"), col("score_fr")) &&
            col("score_de") > 0, "de")
          .when(col("score_es") >= col("score_fr") && col("score_es") > 0, "es")
          .when(col("score_fr") > 0, "fr")
          .otherwise("und"))
  }

  // -------------------------------------------------------------- C11

  /** Rolling-hash document fingerprint: min/max/xor-fold of the hashed
    * w-token shingle set — order-independent, stable 64-bit ids.
    *
    * `portable = true` swaps the xxhash64 rolling kernel for an
    * md5-derived shingle hash (first 8 hex chars of md5 of the
    * space-joined shingle, like [[Sampling.md5Bucket]]): slower, but
    * replayable bit-for-bit in any engine with md5 — that's the
    * oracle-gate path. Default stays on the fast kernel. */
  def fingerprint(df: DataFrame, textCol: String = "text", w: Int = 3,
      portable: Boolean = false): DataFrame = {
    val shingles =
      if (portable)
        transform(Shingles.shingles(col(textCol), w),
          g => conv(substring(md5(g), 1, 8), 16, 10).cast("long"))
      else
        graft.functions.SignatureExpressions.shingle_hashes(tokens(col(textCol)), w)
    df.withColumn("shingles", shingles)
      .withColumn("fp_min", array_min(col("shingles")))
      .withColumn("fp_max", array_max(col("shingles")))
      .withColumn("fp_xor",
        aggregate(col("shingles"), lit(0L), (acc, h) => acc.bitwiseXOR(h)))
      .drop("shingles")
  }

  // -------------------------------------------------------------- C18

  /** Canonical text normalization for training corpora: Unicode NFC
    * (composed forms — 'e'+combining-acute becomes 'é'), Locale.ROOT
    * casefold (Spark's `lower()` is JVM-default-locale-sensitive on
    * non-ASCII — the Turkish-I trap), trim, and whitespace collapse
    * over an EXPLICIT class (Java `\s` includes \x0B, RE2's does not —
    * the explicit class means the same bytes in every engine). Pure
    * per-row projection. */
  val WhitespaceClass = "[ \\x09\\x0A\\x0D\\x0C\\x0B]+"

  def normalizeText(text: Column): Column =
    // collapse BEFORE trim: trim only strips spaces, so a leading tab
    // must first become a space to be trimmed
    trim(regexp_replace(
      graft.functions.SignatureExpressions.nfc_casefold(text),
      WhitespaceClass, " "))

  // -------------------------------------------------------------- C15

  /** PII patterns — the RE2/Java-regex common subset so the same
    * pattern strings run identically in Spark and in SQL engines. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val PhoneRe = "\\+[0-9][0-9\\- ]{7,}[0-9]"

  /** PII scrubbing for training corpora: masks emails, IPv4s, and
    * international-format phone numbers (in that fixed order), and
    * counts what was masked. Pure per-row codegen'd expressions — no
    * shuffle, no UDF. */
  def scrubPii(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_pii",
        (size(regexp_extract_all(t, lit(EmailRe), lit(0))) +
          size(regexp_extract_all(t, lit(Ipv4Re), lit(0))) +
          size(regexp_extract_all(t, lit(PhoneRe), lit(0)))).cast("long"))
      .withColumn(textCol,
        regexp_replace(
          regexp_replace(
            regexp_replace(t, EmailRe, "<EMAIL>"),
            Ipv4Re, "<IP>"),
          PhoneRe, "<PHONE>"))
  }

  // -------------------------------------------------------------- C20

  /** Gopher-style repetition signals (word-level): `top2_frac` is the
    * share of word 2-grams taken by the single most common 2-gram, and
    * `dup3_frac` the share of word 3-grams that occur more than once in
    * the document. High values flag boilerplate/templated text that the
    * charset- and length-based [[qualityScore]] signals miss. Tokens are
    * a plain single-space split (engine-portable, matches the corpus
    * format). Grams explode to (doc, gram) rows and aggregate with
    * map-side combine — two keyed shuffles, no per-doc state, so the
    * shape holds at 100 TB. Docs with fewer than 3 words are dropped
    * (no 3-gram denominator). */
  def repetitionSignals(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val words = split(col(textCol), " ")
    val base = df
      .select(col(idCol), words.as("w"), size(words).as("nw"))
      .filter(col("nw") >= 3)
    def grams(n: Int): Column = {
      // n aligned slices of length nw-(n-1), zipped into space-joined
      // n-grams; zip_with operands share one length so nothing pads null
      val len = col("nw") - (n - 1)
      (2 to n).foldLeft(slice(col("w"), lit(1), len)) { (acc, j) =>
        zip_with(acc, slice(col("w"), lit(j), len), (g, x) => concat_ws(" ", g, x))
      }
    }
    val top2 = base
      .select(col(idCol), col("nw"), explode(grams(2)).as("g"))
      .groupBy(col(idCol), col("nw"), col("g")).count()
      .groupBy(col(idCol), col("nw"))
      .agg(max(col("count")).as("top2"))
    val dup3 = base
      .select(col(idCol), explode(grams(3)).as("g"))
      .groupBy(col(idCol), col("g")).count()
      .groupBy(col(idCol))
      .agg(sum(when(col("count") > 1, col("count")).otherwise(0L)).as("dup3"))
    top2.join(dup3, Seq(idCol))
      .select(col(idCol), col("nw").cast("long").as("n_words"),
        // k/n with n <= a few hundred never sits on a 6-decimal .5
        // rounding boundary (that needs a 2^7·5^b denominator), so the
        // round replays identically cross-engine
        round(col("top2").cast("double") / (col("nw") - 1), 6).as("top2_frac"),
        round(col("dup3").cast("double") / (col("nw") - 2), 6).as("dup3_frac"))
  }

  // -------------------------------------------------------------- C23

  /** Fixed-size token chunking with overlap — the context-window layout
    * a pretraining tokenizer (or RAG indexer) consumes: chunk `i` of a
    * document covers whitespace tokens `[i·stride, i·stride + chunkSize)`
    * with `stride = chunkSize - overlap`; the last chunk may be shorter
    * and no chunk starts beyond the final `chunkSize` window. Pure
    * per-row array expressions exploded to one output row per chunk —
    * no shuffle at all, so it pipelines into whatever keyed op follows.
    * Integer count math only (exact in any engine).
    *
    * With `bpeMerges` set, each chunk also carries `chunk_bpe_tokens` —
    * its REAL BPE token count under that table — so a sequence packer
    * can budget context windows in model tokens while the chunk
    * BOUNDARIES stay whitespace-defined (cheap, streaming-stable). */
  def chunkByTokens(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", chunkSize: Int, overlap: Int,
      bpeMerges: Option[Seq[(String, String)]] = None): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      "need 0 <= overlap < chunkSize")
    val stride = chunkSize - overlap
    // null text behaves like empty text (one empty chunk) — exploding a
    // null chunk count would otherwise DROP the row silently, and a
    // corpus-layout operator must keep docs-in == docs-represented
    val toks = split(coalesce(col(textCol), lit("")), " ")
    val n = size(toks)
    val nChunks = when(n <= chunkSize, lit(1))
      // ceil((n - chunkSize)/stride) + 1 in exact integer math
      .otherwise(floor((n - chunkSize + (stride - 1)) / lit(stride.toDouble))
        .cast("int") + 1)
    val chunks = df.select(col(idCol), toks.as("__toks"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_id"))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        concat_ws(" ",
          slice(col("__toks"), col("chunk_id") * stride + 1, lit(chunkSize)))
          .as("chunk_text"))
    bpeMerges.fold(chunks)(m => chunks.withColumn("chunk_bpe_tokens",
      graft.functions.Bpe.bpe_token_count(tokens(col("chunk_text")), m)))
  }

  // -------------------------------------------------------------- C27

  /** Character-trigram language-model likelihood scoring: each doc's
    * mean log P(c | ab) under the corpus's own trigram statistics —
    * the CCNet/Gopher-style "does this text look like the corpus"
    * quality signal (gibberish, wrong-charset, and template spam score
    * far below prose). `avg_ll = mean over trigram occurrences of
    * ln((count(abc) + 1) / (count(ab·) + 256))` — add-one smoothing
    * over a fixed 256-char alphabet. The smoothing is what makes
    * self-scoring discriminative: unsmoothed conditional likelihood
    * scores a doc whose contexts are UNIQUE in the corpus as perfect
    * (c3 = c2 → ln 1 = 0), i.e. gibberish would beat prose.
    *
    * Scale shape: one explode feeding a (doc, trigram) aggregation; the
    * trigram model is two further aggregations OF that result. Unlike
    * TF-IDF's unbounded vocabulary, the char-trigram model is bounded
    * by charset³, so the model side of both joins is broadcast-sized at
    * any corpus scale — Catalyst's stats pick that up on their own.
    * Per-term logs are quantized to DECIMAL(18,9) before summing so the
    * aggregate is independent of accumulation order (Spark's partial
    * aggregation order is nondeterministic, and the oracle replays the
    * same quantized sum exactly). Docs shorter than one trigram drop
    * out (no likelihood is defined for them). */
  def charTrigramLogLik(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    // char_trigrams = transform(sequence(1, length-2), i -> substring(t,i,3))
    // in one linear pass (Substring re-walks from byte 0 per call →
    // O(n²)/doc; this was the measured top hotspot of the whole suite)
    val tr = docs
      .select(col(idCol).as("doc_id"), lower(trim(col(textCol))).as("__t"))
      .filter(length(col("__t")) >= 3)
      .select(col("doc_id"), explode(
        graft.functions.SignatureExpressions.char_trigrams(col("__t")))
        .as("tri"))
    // Catalyst does not dedupe shared subtrees, so the c3/c2 model
    // branches re-run the explode+agg. Measured at bench scale, the
    // codegen'd recompute beats a .cache() of `m` (columnar encode +
    // broken pipelines cost more than two extra passes); a 100 TB
    // caller should persist `m` externally instead — see scaladoc.
    val m = tr.groupBy(col("doc_id"), col("tri")).agg(count(lit(1)).as("m"))
    val c3 = m.groupBy(col("tri")).agg(sum(col("m")).as("c3"))
    val c2 = c3.groupBy(substring(col("tri"), 1, 2).as("bi"))
      .agg(sum(col("c3")).as("c2"))
    m.join(c3, "tri")
      .withColumn("bi", substring(col("tri"), 1, 2))
      .join(c2, "bi")
      .withColumn("l",
        log((col("c3") + lit(1)).cast("double") / (col("c2") + lit(256)))
          .cast("decimal(18,9)"))
      .groupBy(col("doc_id"))
      .agg(sum(col("m")).cast("long").as("n_tri"),
        round(sum(col("m") * col("l")).cast("double") / sum(col("m")), 4)
          .as("avg_ll"))
  }

  // -------------------------------------------------------------- C25

  /** Per-(doc, token) TF-IDF over a corpus: `tf * (ln((N+1)/(df+1)) + 1)`
    * (the smoothed sklearn-style variant — never negative, defined for
    * every df). The keyword/rare-term weighting a corpus curator uses
    * for relevance filtering and near-duplicate triage.
    *
    * Scale shape: one tokenize+explode pass feeding a (doc, token)
    * aggregation; document frequency is a SECOND aggregation of that
    * result (each (doc, token) row counts once — no re-tokenize, no
    * count-distinct over raw token rows); the tf←→df combine is a
    * token-keyed shuffle join — at 100 TB the vocabulary is itself
    * billions of rows, so it must never be a broadcast or a driver map.
    * The corpus size N is the only scalar, carried by a 1-row broadcast
    * cross join. All inputs to the float math are exact integers, so
    * the expression replays bit-identically in any engine up to the
    * final ln.
    *
    * df is a join, not a `count over (partition by token)` window, on
    * purpose: stopword tokens make either shape hot, but AQE skew-split
    * rescues the join and cannot rescue a window. Catalyst does not
    * dedupe the shared tf subtree (the df branch recomputes it), so a
    * 100 TB caller should persist/checkpoint the (doc,token) aggregate
    * and pass it through this same combine — at gate scale the
    * recompute is cheaper than polluting the storage layer. */
  def tfidf(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", minTokenLen: Int = 3): DataFrame = {
    val tf = docs
      .select(col(idCol).as("__doc"), explode(tokens(col(textCol))).as("token"))
      .filter(length(col("token")) >= minTokenLen)
      .groupBy(col("__doc"), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = docs.agg(countDistinct(col(idCol)).as("__n"))
    tf.join(dfreq, "token")
      // bounded broadcast: `n` is a single-row global aggregate
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        col("tf") * (log((col("__n") + lit(1.0)) / (col("df") + lit(1.0))) + lit(1.0)))
      .select(col("__doc").as(idCol), col("token"), col("tf"), col("df"),
        col("tfidf"))
  }
}

/** Shared shingling helpers. */
object Shingles {
  /** Distinct space-joined w-token shingles of a text column. */
  def shingles(text: Column, w: Int): Column = {
    val toks = TextAnalysis.tokens(text)
    array_distinct(
      transform(
        sequence(lit(0), greatest(size(toks) - w, lit(0))),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(w)))))
  }
}
