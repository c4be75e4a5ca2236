package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for each left row, the most recent right row
  * with the same key and `rightTs <= leftTs` (SURVEY.md §2 B21).
  *
  * Spark has no built-in as-of join; rather than a custom physical
  * node, this composes as union → one keyed shuffle → running
  * last-non-null window — the sort-merge shape a dedicated operator
  * would produce anyway, expressed declaratively so Catalyst/AQE still
  * own partitioning. Never a range cross-join: cost is one shuffle of
  * |left| + |right| rows on the key.
  */
object Temporal {

  /** @param rightCols columns carried from the right side (others drop)
    * @param tieBreak right-side column deciding among equal timestamps
    *                 (larger wins), e.g. a sequence id */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String, rightCols: Seq[String],
      tieBreak: String): DataFrame = {
    val rv = struct(rightCols.map(col): _*)
    val r = right.select(
      keyCols.map(col) ++ Seq(col(rightTs).as("__ts"),
        col(tieBreak).as("__tie"), rv.as("__rv"), lit(1).as("__isR")): _*)
    val leftCols = left.columns.toSeq
    val l = left.select(
      leftCols.map(col) ++ Seq(col(leftTs).as("__ts"),
        lit(null).cast(r.schema("__tie").dataType).as("__tie"),
        lit(null).cast(r.schema("__rv").dataType).as("__rv"),
        lit(0).as("__isR")): _*)
    // at equal ts the right row must sort first (<= is inclusive);
    // among equal-ts right rows the larger tieBreak wins (sorts later)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__isR").desc, col("__tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l, allowMissingColumns = true)
      .withColumn("__matched", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__isR") === 0)
      .select(leftCols.map(col) ++
        rightCols.map(c => col(s"__matched.$c").as(c)): _*)
  }

  /** Interval-overlap join (SURVEY.md §2 B34): pairs (a, b) with
    * `a.start <= b.end && b.start <= a.end`, found WITHOUT an
    * inequality cross-join. Both sides explode their interval onto a
    * `binSize` grid; candidates share a grid cell (equi-join, one
    * shuffle), are deduped (an overlapping pair can share several
    * cells), then the exact predicate filters. Cost scales with
    * overlap density, not |A|×|B|; choose `binSize` near the typical
    * interval length (each interval lands in len/binSize + 1 cells).
    *
    * Inputs need columns (`startCol`, `endCol`) in the same numeric
    * unit; every other column is carried with the given prefix. */
  def intervalJoin(a: DataFrame, b: DataFrame, startCol: String,
      endCol: String, binSize: Long, prefixA: String = "a_",
      prefixB: String = "b_"): DataFrame = {
    require(binSize > 0, "binSize must be positive")
    def binned(df: DataFrame, prefix: String): DataFrame = {
      val renamed = df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, prefix + c))
      // integer `div`, not floor(double /): epoch nanos exceed 2^53
      renamed.withColumn("__bin", explode(sequence(
        expr(s"`$prefix$startCol` div ${binSize}L"),
        expr(s"`$prefix$endCol` div ${binSize}L"))))
    }
    // dedup multi-cell candidates WITHOUT distinct() (which would also
    // collapse legitimately identical input rows and change join
    // multiplicity): keep each pair only in the FIRST cell both
    // intervals share — max(starts) div binSize, which any truly
    // overlapping pair covers exactly once
    binned(a, prefixA).join(binned(b, prefixB), Seq("__bin"))
      .filter(col(prefixA + startCol) <= col(prefixB + endCol) &&
        col(prefixB + startCol) <= col(prefixA + endCol))
      .filter(col("__bin") === expr(
        s"greatest(`$prefixA$startCol`, `$prefixB$startCol`) div ${binSize}L"))
      .drop("__bin")
  }
}
