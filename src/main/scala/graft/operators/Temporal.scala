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
}
