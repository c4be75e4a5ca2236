package graft.operators

import graft.functions.SignatureExpressions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-decontamination operator (training-data pipeline): find
  * corpus documents that share w-gram shingles with a probe set (e.g.
  * an eval benchmark), so they can be dropped before training.
  *
  * Scale shape: both sides reduce to exploded (shingle-hash, id) pairs;
  * the match is one shuffle join on the 64-bit hash — never a text
  * cross-join. Probe sets are usually tiny: broadcast.
  */
object Contamination {

  /** Per (doc, probe) overlap: number of shared w-gram shingles and the
    * containment ratio (share of the probe's shingles found in the
    * doc). Only pairs with >= minShared shingles are returned. */
  def ngramOverlap(corpus: DataFrame, probes: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      probeIdCol: String = "probe_id", probeTextCol: String = "text",
      w: Int = 3, minShared: Int = 1): DataFrame = {
    val docSh = corpus.select(col(idCol).as("doc_id"),
        SignatureExpressions.shingle_hashes(
          TextAnalysis.tokens(col(textCol)), w).as("sh"))
      .select(col("doc_id"), explode(col("sh")).as("h"))
    val probeSh = probes.select(col(probeIdCol).as("probe_id"),
        SignatureExpressions.shingle_hashes(
          TextAnalysis.tokens(col(probeTextCol)), w).as("sh"))
      .withColumn("probe_size", size(col("sh")))
      .select(col("probe_id"), col("probe_size"), explode(col("sh")).as("h"))
    // bounded broadcast: `probes` is the eval/benchmark set — thousands
    // of documents by construction, never corpus-scale; its exploded
    // shingle rows are |probes| x shingles-per-doc, still dimension-sized
    docSh.join(broadcast(probeSh), Seq("h"))
      .groupBy(col("doc_id"), col("probe_id"), col("probe_size"))
      .agg(count(lit(1)).as("shared_shingles"))
      .filter(col("shared_shingles") >= minShared)
      .withColumn("containment",
        graft.functions.SignatureExpressions.round_half_up(
          col("shared_shingles").cast("double") /
          greatest(col("probe_size"), lit(1)).cast("double"), 4))
      .select("doc_id", "probe_id", "shared_shingles", "containment")
  }

  /** Corpus minus any document whose containment of some probe is
    * >= threshold. */
  def decontaminate(corpus: DataFrame, probes: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      probeIdCol: String = "probe_id", probeTextCol: String = "text",
      w: Int = 3, threshold: Double = 0.5): DataFrame = {
    val bad = ngramOverlap(corpus, probes, textCol, idCol, probeIdCol,
        probeTextCol, w)
      .filter(col("containment") >= threshold)
      .select(col("doc_id").as("__bad_id")).distinct()
    corpus.join(bad, corpus(idCol) === col("__bad_id"), "left_anti")
  }
}
