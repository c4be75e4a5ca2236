package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // Sennrich's own worked example vocabulary
  private val vocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("train follows the reference greedy loop with lexicographic tie-breaks") {
    val merges = Bpe.train(vocab, numMerges = 3)
    // pair counts round 1: es=9, st=9 tie -> (e,s) wins lexicographically;
    // round 2: (es,t)=9; round 3: lo=7, ow=7 tie -> (l,o)
    assert(merges == IndexedSeq(("e", "s"), ("es", "t"), ("l", "o")))
  }

  test("train stops when no pair repeats, numMerges=0 is empty") {
    assert(Bpe.train(Seq(("abc", 1L)), 10) == IndexedSeq())
    assert(Bpe.train(vocab, 0) == IndexedSeq())
    // merges never reference a symbol created later (training-consistent
    // table — the property the one-merge-at-a-time oracle replay needs)
    val merges = Bpe.train(vocab, numMerges = 50)
    val known = scala.collection.mutable.Set[String]()
    merges.foreach { case (l, r) =>
      assert(l.length == 1 || known.contains(l), s"unknown left $l")
      assert(r.length == 1 || known.contains(r), s"unknown right $r")
      known += l + r
    }
  }

  test("encodeWord applies lowest-rank merges greedily") {
    val ranks = Bpe.buildRanks(IndexedSeq(("e", "s"), ("es", "t"), ("l", "o")))
    assert(Bpe.encodeWord("lowest", ranks).toSeq == Seq("lo", "w", "est"))
    assert(Bpe.encodeWord("low", ranks).toSeq == Seq("lo", "w"))
    assert(Bpe.encodeWord("zzq", ranks).toSeq == Seq("z", "z", "q"))
    assert(Bpe.encodeWord("a", ranks).toSeq == Seq("a"))
  }

  test("bpe_token_count and bpe_pieces agree, codegen path included") {
    val merges = IndexedSeq(("e", "s"), ("es", "t"), ("l", "o"))
    val df = Seq((1L, "lowest low zzq"), (2L, ""), (3L, "est est est"))
      .toDF("id", "text")
    val toks = graft.operators.TextAnalysis.tokens(col("text"))
    val out = df.select(col("id"),
        Bpe.bpe_token_count(toks, merges).as("n"),
        Bpe.bpe_pieces(toks, merges).as("p"))
      .orderBy("id").collect()
    assert(out(0).getLong(1) == 3 + 2 + 3)
    assert(out(0).getSeq[String](2) ==
      Seq("lo", "w", "est", "lo", "w", "z", "z", "q"))
    // empty text -> [""] token -> zero symbols
    assert(out(1).getLong(1) == 0L)
    assert(out(2).getLong(1) == 3L)
    assert(out(2).getSeq[String](2) == Seq("est", "est", "est"))
  }

  test("trainBpeMerges: distributed vocab extraction matches local training") {
    val df = vocab.flatMap { case (w, f) => Seq.fill(f.toInt)(w) }
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("id", "text").repartition(4)
    val merges = graft.operators.TextAnalysis.trainBpeMerges(
      df, "text", numMerges = 3)
    assert(merges == IndexedSeq(("e", "s"), ("es", "t"), ("l", "o")))
  }

  test("shardByTokenBudget accepts the BPE counter (C22)") {
    val merges = IndexedSeq(("e", "s"), ("es", "t"), ("l", "o"))
    // each doc = 3 BPE tokens ("lowest") but 1 whitespace token; with
    // budget 6 the BPE counter packs 2 docs per shard
    val df = (0 until 6).map(i => (i.toLong, "p", "lowest")).toDF("id", "part", "text")
    val bpeCounter: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      c => Bpe.bpe_token_count(graft.operators.TextAnalysis.tokens(c), merges)
    val shards = graft.operators.Sampling.shardByTokenBudget(
        df, "part", "id", "text", budget = 6, tokenCount = bpeCounter)
      .select("id", "shard_id").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(shards == Map(0L -> 0L, 1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 2L))
    // default counter unchanged: 1 whitespace token per doc -> one shard
    val ws = graft.operators.Sampling.shardByTokenBudget(
        df, "part", "id", "text", budget = 6)
      .select("shard_id").distinct().count()
    assert(ws == 1L)
  }

  test("chunkByTokens attaches chunk_bpe_tokens when merges given (C23)") {
    val merges = IndexedSeq(("e", "s"), ("es", "t"), ("l", "o"))
    val df = Seq((1L, "lowest lowest lowest lowest")).toDF("doc_id", "text")
    val chunks = graft.operators.TextAnalysis.chunkByTokens(
        df, chunkSize = 2, overlap = 1, bpeMerges = Some(merges))
      .orderBy("chunk_id").collect()
    assert(chunks.length == 3)
    assert(chunks.forall(_.getLong(3) == 6L)) // 2 words x 3 BPE tokens
    // without merges the schema is unchanged
    assert(graft.operators.TextAnalysis.chunkByTokens(
      df, chunkSize = 2, overlap = 1).columns.toSeq ==
      Seq("doc_id", "chunk_id", "chunk_text"))
  }
}
