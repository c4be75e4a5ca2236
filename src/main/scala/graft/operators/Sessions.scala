package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable event-stream operators (SURVEY.md §2 B14/B15) — the
  * building blocks behind the `q_sessionize` / `q_funnel` gate queries,
  * exposed as library API. All windows are keyed by user: no global
  * sorts, one shuffle on the user key.
  */
object Sessions {

  /** Gap-based sessionization: adds `session_id` (per-user ordinal) to
    * each event. `tsCol` must be monotonic-comparable (epoch numeric or
    * timestamp); `gap` in the same unit. */
  def sessionize(df: DataFrame, userCol: String, tsCol: String,
      orderTieBreak: String, gap: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(orderTieBreak))
    df.withColumn("__prev", lag(col(tsCol), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull || col(tsCol) - col("__prev") > gap, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev", "__new")
  }

  /** Ordered-funnel first-touch times: one row per user with the
    * earliest `tsCol` of each named stage, or null if never reached. */
  def funnelStages(df: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[String]): DataFrame =
    df.groupBy(col(userCol))
      .agg(
        min(when(col(typeCol) === stages.head, col(tsCol))).as(s"t_${stages.head}"),
        stages.tail.map(st =>
          min(when(col(typeCol) === st, col(tsCol))).as(s"t_$st")): _*)

  /** Count of users who completed each funnel prefix in stage order. */
  def funnelCounts(df: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[String]): DataFrame = {
    val staged = funnelStages(df, userCol, typeCol, tsCol, stages)
    val conds: Seq[Column] = stages.indices.map { i =>
      (1 to i).map(j => col(s"t_${stages(j - 1)}") < col(s"t_${stages(j)}"))
        .foldLeft(col(s"t_${stages.head}").isNotNull)(_ && _)
    }
    staged.agg(
      sum(when(conds.head, 1).otherwise(0)).cast("long").as(s"n_${stages.head}"),
      stages.indices.tail.map(i =>
        sum(when(conds(i), 1).otherwise(0)).cast("long").as(s"n_${stages(i)}")): _*)
  }
}
