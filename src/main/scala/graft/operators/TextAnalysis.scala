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

  /** Adds `n_tokens` (whitespace) and `n_bpeish` (regex pieces). */
  def tokenCounts(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("n_tokens", size(tokens(col(textCol))).cast("long"))
      .withColumn("n_bpeish",
        size(regexp_extract_all(col(textCol), lit(BpeishPattern), lit(0))).cast("long"))

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
