package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** kmeansCentroidsHierarchical: the O(sample·√k·dim) trainer for
  * production cell counts must be deterministic under any partitioning,
  * hit its target cell count on non-degenerate data, and produce cells
  * that actually work (semanticDedupKMeans over them still collapses
  * planted near-duplicate families).
  */
class HierarchicalKMeansSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def prep(df: org.apache.spark.sql.DataFrame) =
    df.select(col("vec_id").as("neighbor_id"),
      col("embedding").cast("array<double>").as("v_c"))

  test("deterministic across reruns and repartitionings, ~nLists cells") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def run(parts: Int) = Similarity
      .kmeansCentroidsHierarchical(prep(e).repartition(parts), nLists = 25)
      .orderBy("centroid_id").collect()
      .map(r => (r.getLong(0),
        r.getAs[scala.collection.Seq[Double]]("v_cent").toIndexedSeq))
      .toIndexedSeq
    val a = run(4)
    val b = run(11)
    assert(a == b, "centroids must be bit-identical under repartitioning")
    // 25 target -> k1=5 coarse x k2=5 sub; 500 well-spread rows should
    // populate every coarse cell with >= 5 points
    assert(a.length == 25, s"expected 25 cells, got ${a.length}")
    assert(a.map(_._1).distinct.length == a.length)
    assert(a.forall(_._2.length == 64))
  }

  test("hierarchical cells drive semanticDedupKMeans to collapse clones") {
    import spark.implicits._
    // 80 well-separated base vectors x 5 near-identical clones each
    val rnd = new scala.util.Random(7)
    val base = Array.fill(80)(Array.fill(16)(rnd.nextGaussian()))
    val rows = for (b <- 0 until 80; c <- 0 until 5) yield
      ((b * 5 + c).toLong, base(b).zipWithIndex.map {
        case (x, i) => x + 0.001 * ((b * 16 + i + c) % 7 - 3) }.toSeq)
    val df = rows.toDF("vec_id", "embedding")
    val cents = Similarity
      .kmeansCentroidsHierarchical(
        df.select(col("vec_id").as("neighbor_id"), col("embedding").as("v_c")),
        nLists = 16)
      .orderBy("centroid_id").collect()
      .map(_.getAs[scala.collection.Seq[Double]]("v_cent").toIndexedSeq)
      .toIndexedSeq
    val kept = Similarity.semanticDedupKMeans(df, "vec_id", "embedding",
      threshold = 0.999, cents).collect()
    // every 5-clone family shares a cell (clones are ~identical, cells
    // are trained on them) and collapses; survivors = one per family
    assert(kept.length == 80, s"expected 80 survivors, got ${kept.length}")
    assert(kept.map(_.getLong(1)).sum == 400L) // member counts cover all
  }
}
