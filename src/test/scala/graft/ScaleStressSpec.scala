package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

import graft.tools.ScaleStress

/** The scale-stress harness itself is load-bearing evidence (SURVEY §13
  * cites its numbers), so pin its contracts: the derivation is
  * deterministic, id-disjoint, and exactly mult×; the op registry runs
  * on a derived corpus; the SemDeDup parameter law has its floors/caps.
  */
class ScaleStressSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("derive is deterministic, id-disjoint, and exactly mult x") {
    val (a, b) = (Files.createTempDirectory("ss-a").toString,
      Files.createTempDirectory("ss-b").toString)
    ScaleStress.derive(spark, sf, a, 3)
    ScaleStress.derive(spark, sf, b, 3)
    val base = spark.read.parquet(s"$sf/documents.parquet").count()
    val da = spark.read.parquet(s"$a/documents.parquet")
    assert(da.count() == 3 * base)
    assert(da.select(countDistinct(col("doc_id"))).head.getLong(0) == 3 * base)
    // byte-for-byte determinism of the derived CONTENT across runs
    def ck(dir: String) = spark.read.parquet(s"$dir/documents.parquet")
      .agg(sum(pmod(xxhash64(col("doc_id"), col("text"), col("n_chars")),
        lit(1000000007L))))
      .head.getLong(0)
    assert(ck(a) == ck(b))
    // the marker makes re-derivation a no-op (same checksum after)
    ScaleStress.derive(spark, sf, a, 3)
    assert(ck(a) == ck(b))
    // events ts survives as epoch-nano longs in the derived layout
    val ev = spark.read.parquet(s"$a/events.parquet")
    assert(ev.schema("ts").dataType.typeName == "long")
    assert(ev.count() == 3 * spark.read.parquet(s"$sf/events.parquet").count())
  }

  test("a registered stress op runs against a derived corpus") {
    val root = Files.createTempDirectory("ss-ops").toString
    val dir = s"$root/x2"
    ScaleStress.derive(spark, sf, dir, 2)
    val op = ScaleStress.ops(spark, root).collectFirst {
      case ("repeated_spans", f) => f }.get
    assert(op(dir) > 0L)
  }

  test("suggestedCells follows k = n/occ with floor 16 and a 2^20 cap") {
    import graft.operators.Similarity.suggestedCells
    assert(suggestedCells(2000) == 16)        // floor
    assert(suggestedCells(200000) == 400)     // law: n/500
    assert(suggestedCells(1000000, 100) == 10000)
    assert(suggestedCells(Long.MaxValue) == (1 << 20)) // cap
  }
}
