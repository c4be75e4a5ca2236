package graft

import graft.functions.LwesExpressions
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.unsafe.types.UTF8String

/** SparkSessionExtensions entry point: makes the LWES SQL functions
  * available in every session created with
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`), so pure-SQL users get
  * `from_lwes` / `to_lwes` / `lwes_event_name` without touching the
  * Scala API — the Spark-native equivalent of dropping the reference
  * SerDe jar into HIVE_AUX_JARS_PATH (reference README).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def strLit(e: Expression): String = e.eval(null) match {
    case u: UTF8String => u.toString
    case s: String => s
    case other => throw new IllegalArgumentException(
      s"expected foldable string literal, got $other")
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => graft.functions.EliminateLwesRoundTrip)
    e.injectOptimizerRule(_ => graft.plans.TopKFromWindow)
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    e.injectFunction((FunctionIdentifier("from_lwes"),
      new ExpressionInfo(classOf[LwesExpressions.FromLwes].getName, "from_lwes"),
      (exprs: Seq[Expression]) => LwesExpressions.FromLwes(exprs.head, strLit(exprs(1)))))
    e.injectFunction((FunctionIdentifier("to_lwes"),
      new ExpressionInfo(classOf[LwesExpressions.ToLwes].getName, "to_lwes"),
      (exprs: Seq[Expression]) => LwesExpressions.ToLwes(exprs.head, strLit(exprs(1)))))
    e.injectFunction((FunctionIdentifier("lwes_event_name"),
      new ExpressionInfo(classOf[LwesExpressions.LwesEventNameExpr].getName, "lwes_event_name"),
      (exprs: Seq[Expression]) => LwesExpressions.LwesEventNameExpr(exprs.head)))
  }
}
