package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators (SURVEY.md §2 C1-C4).
  *
  * Scale design: exact dedup is one keyed shuffle; MinHash-LSH generates
  * candidates only inside LSH buckets (a `groupBy(band, signature)`
  * shuffle — never a cross join); SimHash buckets on a 16-bit prefix.
  * All signature math is composed from codegen'd collection functions
  * (`transform`/`aggregate`/`xxhash64`), no UDFs.
  */
object Dedup {

  // --------------------------------------------------------------- C1

  /** Exact dedup: keep the row with the smallest `tieBreaker` per
    * duplicate group. One shuffle on the key columns. */
  def exact(df: DataFrame, keyCols: Seq[String], tieBreaker: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tieBreaker))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  // --------------------------------------------------------------- C2

  /** MinHash signatures: `k` min-hashes over w-token shingles.
    * h_i(s) = xxhash64(s || '#' || i); minhash_i = min over shingles. */
  def minhashSignatures(df: DataFrame, textCol: String, idCol: String,
      k: Int = 32, w: Int = 3): DataFrame =
    df.select(col(idCol), Shingles.shingles(col(textCol), w).as("shingles"))
      .withColumn("minhashes",
        transform(sequence(lit(0), lit(k - 1)),
          i => array_min(transform(col("shingles"),
            s => xxhash64(concat(s, lit("#"), i.cast("string")))))))

  /** LSH candidate pairs: split signatures into `bands` bands, bucket by
    * (band, band-signature-hash), emit doc pairs sharing a bucket, then
    * verify with true shingle Jaccard. Returns (id_a, id_b, jaccard)
    * for pairs with jaccard >= threshold. */
  def minhashPairs(df: DataFrame, textCol: String, idCol: String,
      k: Int = 32, bands: Int = 8, w: Int = 3, threshold: Double = 0.5): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    val r = k / bands
    val sigs = minhashSignatures(df, textCol, idCol, k, w).cache()
    val banded = sigs.select(col(idCol).as("id"), col("shingles"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(concat_ws(",",
            transform(slice(col("minhashes"), b * lit(r) + lit(1), lit(r)),
              m => m.cast("string")))))).as(Seq("band", "sig")))
      .select(col("id"), col("band"), col("sig"), col("shingles"))
    val a = banded.select(col("id").as("id_a"), col("band"), col("sig"),
      col("shingles").as("sh_a"))
    val b = banded.select(col("id").as("id_b"), col("band"), col("sig"),
      col("shingles").as("sh_b"))
    a.join(b, Seq("band", "sig"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .distinct()
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          greatest(size(array_union(col("sh_a"), col("sh_b"))), lit(1)).cast("double"), 4))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // --------------------------------------------------------------- C3

  /** 64-bit SimHash over whitespace tokens: bit b of the signature is 1
    * iff the sum over token-hashes of ±1 (by bit b) is positive. */
  def simhash(text: Column): Column = {
    val hashes = transform(TextAnalysis.tokens(text), w => xxhash64(w))
    aggregate(
      sequence(lit(0), lit(63)),
      lit(0L),
      (acc, b) => acc + when(
        aggregate(hashes, lit(0),
          (a2, h) => a2 + when(call_function("shiftright", h, b.cast("int"))
            .bitwiseAND(1) === 1, 1).otherwise(-1)) > 0,
        call_function("shiftleft", lit(1L), b.cast("int"))).otherwise(0L))
  }

  /** SimHash near-dup pairs: bucket on the top-16-bit prefix, pair within
    * buckets, keep pairs with hamming distance <= maxHamming. */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 6): DataFrame = {
    val sigs = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sh"))
      .withColumn("bucket", shiftrightunsigned(col("sh"), 48))
    val a = sigs.select(col("id").as("id_a"), col("sh").as("sh_a"), col("bucket"))
    val b = sigs.select(col("id").as("id_b"), col("sh").as("sh_b"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
  }

  // --------------------------------------------------------------- C4

  /** Brute n-gram Jaccard for a candidate pair set (id_a, id_b):
    * re-joins texts and computes exact shingle Jaccard. */
  def ngramJaccard(pairs: DataFrame, docs: DataFrame, textCol: String,
      idCol: String, w: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol).as("__id"),
      Shingles.shingles(col(textCol), w).as("__sh"))
    pairs
      .join(sh.withColumnRenamed("__id", "id_a").withColumnRenamed("__sh", "sh_a"), Seq("id_a"))
      .join(sh.withColumnRenamed("__id", "id_b").withColumnRenamed("__sh", "sh_b"), Seq("id_b"))
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          greatest(size(array_union(col("sh_a"), col("sh_b"))), lit(1)).cast("double"), 4))
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}
