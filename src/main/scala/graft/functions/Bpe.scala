package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenization (SURVEY.md §2 C10 upgrade).
  *
  * The real BPE algorithm (Sennrich et al., ACL'16 "Neural Machine
  * Translation of Rare Words with Subword Units"; the merge loop is the
  * same one the public GPT-2 encoder uses): a word starts as its
  * sequence of characters, and the pair table's merges apply greedily —
  * always the LOWEST-RANK adjacent pair present in the word, all of its
  * non-overlapping occurrences left-to-right, until no listed pair
  * remains. Token counts from this segmentation are what a trainer's
  * tokenizer actually produces, unlike the C10 regex approximation
  * (`TextAnalysis.BpeishPattern`), which stays available as the cheap
  * path.
  *
  * Scale shape: the merge table is rank metadata, not data — a few
  * hundred to a few tens of thousands of entries — attached to the
  * expression as a codegen reference object (Spark ships it once per
  * executor with the serialized plan, the expression-level equivalent
  * of a broadcast variable). Encoding is a per-row tight loop inside
  * whole-stage codegen; a bounded thread-local word→count memo exploits
  * natural-language vocabulary skew (Zipf: the same words recur
  * millions of times at corpus scale) without any coordination.
  *
  * Determinism: segmentation is a pure function of (word, merge table);
  * training breaks count ties lexicographically, so a trained table is
  * itself reproducible across runs, partitionings, and engines.
  */
object Bpe {

  /** Separator for pair keys in rank maps — never occurs in corpus
    * symbols (unit separator). Mirrored by chr(31) in the DuckDB
    * oracle replay. */
  val Sep: Char = ''

  /** A merge table pinned at build time: [[graft.operators.TextAnalysis.trainBpeMerges]]
    * with numMerges = 160 over the sf0.01 `documents` corpus
    * (deterministic: count ties break lexicographically). Pinned so the
    * `text_tokens_bpe` oracle can replay the exact table in SQL at any
    * SF; regenerate with `graft.tools.BpeTrainDump` if the testdata
    * corpus ever changes. */
  lazy val PinnedMerges: IndexedSeq[(String, String)] = PinnedMergesData.merges

  // ---------------------------------------------------------- training

  /** Train `numMerges` BPE merges from a (word, frequency) vocabulary —
    * the classic Sennrich loop: repeatedly take the most frequent
    * adjacent symbol pair (ties: lexicographically smallest pair, so
    * training is deterministic) and merge it everywhere. Local
    * O(numMerges × vocab × wordLen); the DISTRIBUTED part of training
    * is producing the bounded vocabulary (see
    * [[graft.operators.TextAnalysis.trainBpeMerges]]). Stops early when
    * no pair occurs twice. */
  def train(vocab: Seq[(String, Long)], numMerges: Int): IndexedSeq[(String, String)] = {
    require(numMerges >= 0, "numMerges must be >= 0")
    var words: Array[(Array[String], Long)] = vocab.map { case (w, f) =>
      (codePoints(w), f)
    }.toArray
    val merges = IndexedSeq.newBuilder[(String, String)]
    var m = 0
    var done = false
    while (m < numMerges && !done) {
      val counts = new java.util.HashMap[(String, String), Long]()
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          counts.merge((syms(i), syms(i + 1)), f, _ + _)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        var best: (String, String) = null
        var bestN = 0L
        counts.forEach { (p, n) =>
          if (n > bestN || (n == bestN && (best == null ||
              p._1 < best._1 || (p._1 == best._1 && p._2 < best._2))))
            { best = p; bestN = n }
        }
        // a pair seen once compresses nothing and would make the table
        // corpus-order-dependent noise
        if (bestN < 2) done = true
        else {
          merges += best
          words = words.map { case (syms, f) => (mergeAll(syms, best), f) }
          m += 1
        }
      }
    }
    merges.result()
  }

  private def codePoints(w: String): Array[String] =
    w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))

  /** Merge every non-overlapping occurrence of `pair`, left to right —
    * the reference application step shared by training and encoding. */
  private def mergeAll(syms: Array[String], pair: (String, String)): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  // ---------------------------------------------------------- encoding

  /** Rank lookup keyed "left SEP right" → merge rank. Built once per
    * expression instance and shipped as a plan reference object. */
  def buildRanks(merges: Seq[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      m.putIfAbsent(l + Sep + r, Integer.valueOf(i))
    }
    m
  }

  /** Encode one word; returns the final symbol sequence. The greedy
    * lowest-rank loop with merge-all application — bit-for-bit the
    * public reference algorithm. */
  def encodeWord(word: String, ranks: java.util.HashMap[String, Integer]): Array[String] = {
    var syms = codePoints(word)
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var bestL: String = null
      var bestR: String = null
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.get(syms(i) + Sep + syms(i + 1))
        if (r != null && r.intValue() < bestRank) {
          bestRank = r.intValue(); bestL = syms(i); bestR = syms(i + 1)
        }
        i += 1
      }
      if (bestL == null) continue = false
      else {
        syms = mergeAll(syms, (bestL, bestR))
        continue = syms.length > 1
      }
    }
    syms
  }

  // Bounded per-thread word→count memo: vocabulary is Zipf-skewed, so
  // the hit rate at corpus scale is near 1. Cleared when full — never
  // affects results, only speed.
  private val CacheMax = 1 << 16
  private val countCache = new ThreadLocal[java.util.HashMap[String, Long]]() {
    override def initialValue(): java.util.HashMap[String, Long] =
      new java.util.HashMap[String, Long](1024)
  }

  /** Eval kernel: total BPE token count over a document's word array.
    * Public so generated code can call it. */
  def tokenCountEval(tokens: ArrayData, ranks: java.util.HashMap[String, Integer]): Long = {
    val cache = countCache.get()
    var total = 0L
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      val w = tokens.getUTF8String(i).toString
      var c = cache.getOrDefault(w, -1L)
      if (c < 0) {
        c = if (w.isEmpty) 0L else encodeWord(w, ranks).length.toLong
        if (cache.size >= CacheMax) cache.clear()
        cache.put(w, c)
      }
      total += c
      i += 1
    }
    total
  }

  /** Eval kernel: the BPE pieces themselves (flat, word order
    * preserved) — the inspection/debug surface; counting goes through
    * [[tokenCountEval]]. */
  def piecesEval(tokens: ArrayData, ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String]()
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      val w = tokens.getUTF8String(i).toString
      if (w.nonEmpty) encodeWord(w, ranks).foreach(s => out += UTF8String.fromString(s))
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  // -------------------------------------------------------- expressions

  /** `bpe_token_count(array<string>) → long`: total BPE tokens across
    * the word array under the given merge table. Whole-stage-codegen
    * participant — `doGenCode` emits a static call against the table
    * reference object. */
  case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
      extends UnaryExpression {
    override def dataType: DataType = LongType
    @transient private lazy val ranks = buildRanks(merges)
    override def nullSafeEval(input: Any): Any =
      tokenCountEval(input.asInstanceOf[ArrayData], ranks)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ranksRef = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.Bpe.tokenCountEval($c, $ranksRef)")
    }
    override protected def withNewChildInternal(c: Expression): BpeTokenCount = copy(child = c)
  }

  /** `bpe_pieces(array<string>) → array<string>`: the segmentation
    * itself, for specs and inspection. */
  case class BpePieces(child: Expression, merges: Seq[(String, String)])
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    @transient private lazy val ranks = buildRanks(merges)
    override def nullSafeEval(input: Any): Any =
      piecesEval(input.asInstanceOf[ArrayData], ranks)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ranksRef = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.Bpe.piecesEval($c, $ranksRef)")
    }
    override protected def withNewChildInternal(c: Expression): BpePieces = copy(child = c)
  }

  def bpe_token_count(tokens: Column, merges: Seq[(String, String)]): Column =
    bridge.toColumn(BpeTokenCount(bridge.toExpression(tokens), merges))

  def bpe_pieces(tokens: Column, merges: Seq[(String, String)]): Column =
    bridge.toColumn(BpePieces(bridge.toExpression(tokens), merges))
}
