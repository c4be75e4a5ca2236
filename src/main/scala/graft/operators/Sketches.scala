package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Frequency sketches (SURVEY §2 C33): Misra-Gries heavy hitters as a
  * MERGEABLE summary (Misra & Gries 1982; mergeability per Agarwal et
  * al., "Mergeable Summaries", PODS 2012) — the corpus-scale "what are
  * the dominant terms/URLs/sources" primitive.
  *
  * Scale shape: ONE `treeAggregate` pass builds a bounded summary
  * (≤ capacity counters per partition, merged pairwise up a tree — no
  * shuffle of raw terms, driver holds ≤ capacity entries), then ONE
  * broadcast-semi-joined exact recount of the candidates. The summary
  * guarantees every term with true frequency > n/(capacity+1) survives
  * (no false negatives), so after the exact recount the emitted set
  * EQUALS the true heavy-hitter set — deterministic across partition
  * layouts, which is what lets a SQL oracle replay it exactly.
  */
object Sketches {

  /** Add one item to a Misra-Gries summary of bounded `capacity`. */
  private def mgAdd(m: scala.collection.mutable.HashMap[String, Long],
      t: String, capacity: Int): scala.collection.mutable.HashMap[String, Long] = {
    m.get(t) match {
      case Some(c) => m.update(t, c + 1)
      case None =>
        if (m.size < capacity) m.update(t, 1L)
        else {
          // decrement-all: drop zeros (amortized O(1) per insert)
          val dead = List.newBuilder[String]
          m.foreach { case (k, v) =>
            if (v == 1L) dead += k else m.update(k, v - 1)
          }
          dead.result().foreach(m.remove)
        }
    }
    m
  }

  /** Merge two summaries, re-bounding to `capacity` by subtracting the
    * (capacity+1)-th largest count (the PODS'12 mergeable rule, which
    * preserves the n/(capacity+1) error bound). */
  private def mgMerge(a: scala.collection.mutable.HashMap[String, Long],
      b: scala.collection.mutable.HashMap[String, Long],
      capacity: Int): scala.collection.mutable.HashMap[String, Long] = {
    b.foreach { case (k, v) => a.update(k, a.getOrElse(k, 0L) + v) }
    if (a.size > capacity) {
      val kth = a.values.toArray.sorted(Ordering[Long].reverse)(capacity)
      val dead = List.newBuilder[String]
      a.foreach { case (k, v) =>
        if (v - kth <= 0L) dead += k else a.update(k, v - kth)
      }
      dead.result().foreach(a.remove)
    }
    a
  }

  /** Exact heavy hitters over a string column: every value whose
    * frequency is ≥ `minShare` of all rows, with its EXACT count.
    * Requires `capacity ≥ ceil(1/minShare) + 1` so the sketch's
    * STRICT no-false-negative guarantee covers the threshold even at
    * the n/(capacity+1) boundary (enforced). Returns (value, n) —
    * deterministic, partition-layout independent, SQL-replayable. */
  def heavyHitters(items: Dataset[String], capacity: Int,
      minShare: Double): DataFrame = {
    // strict-inequality guarantee in integer arithmetic: a term at
    // exactly freq = n/(capacity+1) CAN be evicted, and
    // `capacity+1 > 1.0/minShare` passes at the boundary when the
    // double quotient rounds just under the integer — demand one whole
    // counter of slack past ceil(1/minShare) so both hazards are out
    val minCap = math.ceil(1.0 / minShare).toInt + 1
    require(minShare > 0 && capacity >= minCap,
      s"capacity $capacity cannot guarantee recall at minShare $minShare " +
        s"(needs >= $minCap)")
    val spark = items.sparkSession
    import spark.implicits._
    // pass 1: candidates AND the total count in one traversal
    // (summary, n) — a separate count() would re-scan the (typically
    // uncached, tokenization-heavy) input a second time
    val (summary, n) = items.rdd.treeAggregate(
      (scala.collection.mutable.HashMap.empty[String, Long], 0L))(
      { case ((m, c), t) => (mgAdd(m, t, capacity), c + 1) },
      { case ((a, ca), (b, cb)) => (mgMerge(a, b, capacity), ca + cb) })
    val candidates = summary.keys.toSeq
    val threshold = math.ceil(minShare * n).toLong
    // pass 2: exact recount of the candidates (broadcast join — the
    // corpus shuffles nothing), then the exact threshold filter.
    // Bounded broadcast: the MG summary holds ≤ `capacity` keys by
    // construction, independent of corpus size
    items.toDF("value")
      .join(broadcast(candidates.toDF("value")), Seq("value"))
      .groupBy(col("value")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= threshold)
  }
}
