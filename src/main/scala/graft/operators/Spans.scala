package graft.operators

import graft.functions.SignatureExpressions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-document span mining and Bloom-gated decontamination
  * (SURVEY.md §2 C28/C29) — two more operators a 100 TB training-data
  * pipeline runs beside the dedup/contamination family.
  */
object Spans {

  /** C28: repeated w-token spans across documents — the exact-substring
    * dedup signal ("Deduplicating Training Data Makes Language Models
    * Better", Lee et al. 2021): runs of tokens appearing verbatim in
    * many documents mark boilerplate/templates that inflate
    * memorization, and this table drives span-level masking/removal.
    * Emits (span_md5, n_occurrences, n_docs, first_doc) for every span
    * present in >= minDocs distinct documents.
    *
    * Scale shape: one per-row explode (len−w+1 spans per doc) and ONE
    * shuffle keyed on the span md5 — the suffix-shingle shape. Raw span
    * text never crosses the wire (the md5 is computed inside the
    * projection, so the shuffle carries 32-hex-char keys regardless of
    * span width), counts get map-side combine, and the minDocs filter
    * lands after the keyed aggregate so only the repeated tail
    * survives. md5 keys make the whole table engine-portable (the gate
    * replays it in SQL). */
  def repeatedSpans(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", w: Int = 8, minDocs: Int = 2): DataFrame = {
    require(w >= 2, "span width must be >= 2")
    require(minDocs >= 1, "minDocs must be >= 1")
    df.select(col(idCol).as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("t"))
      .withColumn("len", size(col("t")))
      .filter(col("len") >= w)
      .select(col("doc_id"), explode(
        transform(sequence(lit(1), col("len") - lit(w - 1)),
          i => md5(concat_ws(" ", slice(col("t"), i, lit(w)))))).as("span_md5"))
      .groupBy("span_md5")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") >= minDocs)
  }

  /** C29: Bloom-gated decontamination. [[Contamination.ngramOverlap]]
    * explodes EVERY corpus document's shingles into a shuffle join —
    * at 100 TB that shuffles the corpus to answer a question whose
    * answer is almost always "clean". This variant builds a Bloom
    * filter over the probe set's shingle hashes once (driver-side — a
    * benchmark probe set is small; a few MB covers millions of
    * shingles at fpp 1%), ships it inside a codegen'd any-hit
    * expression, and exact-verifies ONLY the flagged sliver: the
    * corpus side stays a pure per-row projection with no shuffle and
    * no exploded rows on the wire.
    *
    * Bloom contract: false positives cost one redundant exact check;
    * false NEGATIVES are impossible, so `contaminated` is exactly the
    * answer the full join would give — which is what the gate's oracle
    * checks, and the `bloom_hit` implication (contaminated ⇒ flagged)
    * pins separately. Returns the corpus annotated with `bloom_hit`
    * and the exact `contaminated` boolean. */
  def bloomDecontaminate(corpus: DataFrame, probes: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      probeIdCol: String = "probe_id", probeTextCol: String = "text",
      w: Int = 3, threshold: Double = 0.5, fpp: Double = 0.01): DataFrame = {
    val probeHashes = probes.select(explode(
        SignatureExpressions.shingle_hashes(
          TextAnalysis.tokens(col(probeTextCol)), w)).as("h"))
      .distinct()
    // two bounded driver actions (count + filter build), both O(probe
    // shingles) — the IVF train-once pattern, not a data-path collect
    val bf = probeHashes.stat.bloomFilter("h",
      math.max(probeHashes.count(), 1L), fpp)
    val flagged = corpus.withColumn("bloom_hit",
      SignatureExpressions.bloom_any_contains(
        SignatureExpressions.shingle_hashes(
          TextAnalysis.tokens(col(textCol)), w), bf))
    val bad = Contamination.ngramOverlap(
        flagged.filter(col("bloom_hit")), probes,
        textCol, idCol, probeIdCol, probeTextCol, w)
      .filter(col("containment") >= threshold)
      .select(col("doc_id").as("__bad_id")).distinct()
    flagged.join(bad, flagged(idCol) === col("__bad_id"), "left")
      .withColumn("contaminated", col("__bad_id").isNotNull)
      .drop("__bad_id")
  }
}
