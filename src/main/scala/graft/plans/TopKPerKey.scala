package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, GenericInternalRow, IntegerLiteral, JoinedRow, LessThan, LessThanOrEqual, NamedExpression, RowNumber, SortOrder, UnsafeProjection, UnsafeRow, WindowExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

import scala.collection.mutable

/** Per-key top-k as a first-class operator (SURVEY.md §2 B33).
  *
  * The composed formulation — `row_number().over(partitionBy(key)
  * .orderBy(ord)) <= k` — must SORT every group in full before
  * discarding all but k rows; at 100 TB that is a sort of the whole
  * fact table to keep a sliver of it. This operator holds a bounded
  * heap of k rows per key instead: one shuffle on the key (enforced
  * via `requiredChildDistribution`, so AQE plans/reuses it like any
  * exchange), O(n log k) per partition, memory O(keys·k), no spillable
  * sort buffers. Emits the child's columns plus a `rnk` long (1-based
  * within key, best first).
  *
  * The custom `LogicalPlan` + `SparkStrategy` route (registered via
  * [[graft.GraftExtensions]]) is deliberate: it is the Spark-sanctioned
  * extension ladder's last rung, used here because no composition of
  * built-in operators avoids the full sort.
  */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    rankAttr: Attribute, child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKey =
    copy(child = c)
}

/** Optimizer rule: `Filter(rnk <= k, Window(row_number() as rnk))` —
  * the idiomatic top-k-per-group formulation — becomes [[TopKPerKey]].
  * Users keep writing the natural window query; the plan drops the
  * per-group sort. Fires only for a lone row_number over a non-empty
  * partition spec (global top-k is already TakeOrdered territory, and
  * rank/dense_rank have tie semantics a bounded heap cannot honor).
  * Tolerates the WindowGroupLimit node Spark's own InferWindowGroupLimit
  * may already have inserted below the window. */
object TopKFromWindow extends Rule[LogicalPlan] {

  private def rankLimit(cond: Expression, rnk: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rnk) => Some(k)
    case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rnk) => Some(k - 1)
    case org.apache.spark.sql.catalyst.expressions.EqualTo(a: Attribute, IntegerLiteral(1))
        if a.semanticEquals(rnk) => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case Filter(cond,
        Window(Seq(alias @ Alias(WindowExpression(RowNumber(), _), _)),
          partitionSpec, orderSpec, windowChild, _))
        if partitionSpec.nonEmpty && orderSpec.nonEmpty &&
          rankLimit(cond, alias.toAttribute).exists(_ > 0) =>
      val child = windowChild match {
        case WindowGroupLimit(_, _, _, _, grandChild) => grandChild
        case other => other
      }
      TopKPerKey(partitionSpec, orderSpec,
        rankLimit(cond, alias.toAttribute).get, alias.toAttribute, child)
  }
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    rankAttr: Attribute, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keys, childOutput)
      val ordering = GenerateOrdering.generate(order, childOutput)
      // mutable.PriorityQueue surfaces the MAX of `ordering` = the row
      // that sorts LAST = the current worst of the kept k
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(h) =>
            if (h.size < k) h.enqueue(row.copy())
            else if (ordering.compare(row, h.head) < 0) {
              h.dequeue(); h.enqueue(row.copy())
            }
          case None =>
            val h = new mutable.PriorityQueue[InternalRow]()(ordering)
            h.enqueue(row.copy())
            heaps.put(key.copy(), h)
        }
      }
      val toUnsafe = UnsafeProjection.create(output.map(_.dataType).toArray)
      val rankRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      val rankIsLong = rankAttr.dataType == org.apache.spark.sql.types.LongType
      heaps.valuesIterator.flatMap { h =>
        // drain worst-first, then reverse so rank 1 = best
        val drained = mutable.ArrayBuffer.empty[InternalRow]
        while (h.nonEmpty) drained += h.dequeue()
        drained.reverseIterator.zipWithIndex.map { case (r, i) =>
          rankRow.update(0, if (rankIsLong) (i + 1).toLong else i + 1)
          toUnsafe(joined(r, rankRow))
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}

/** Plans [[TopKPerKey]]; injected via `injectPlannerStrategy`. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, rank, child) =>
      TopKPerKeyExec(keys, order, k, rank, planLater(child)) :: Nil
    case _ => Nil
  }
}

object TopK {
  /** `df` + key/order columns → child columns + `rnk` (int, 1..k per
    * key). Sugar over the idiomatic window formulation; in sessions
    * with [[graft.GraftExtensions]] registered, [[TopKFromWindow]]
    * plans it as the bounded-heap [[TopKPerKeyExec]] — elsewhere it
    * degrades gracefully to the sorted window. */
  def perKey(df: DataFrame, keyCols: Seq[Column], orderCols: Seq[Column],
      k: Int): DataFrame = {
    import org.apache.spark.sql.functions.{col, row_number}
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols: _*).orderBy(orderCols: _*)
    df.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }
}
