package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, GenericInternalRow, IntegerLiteral, JoinedRow, LessThan, LessThanOrEqual, NamedExpression, RowNumber, SortOrder, UnsafeProjection, UnsafeRow, WindowExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode, UnsafeExternalRowSorter}

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
    // the heap map holds O(distinct keys × k) copied rows per partition
    // with no spill path; past this cap the operator degrades to a
    // SPILLABLE external sort (TaskMemoryManager-backed) + streaming
    // rank — memory pressure becomes disk instead of executor OOM
    val maxBuffered = conf
      .getConfString("spark.graft.topk.maxBufferedRows", (1 << 20).toString)
      .toLong
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keys, childOutput)
      val ordering = GenerateOrdering.generate(order, childOutput)
      val toUnsafe = UnsafeProjection.create(output.map(_.dataType).toArray)
      val rankRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      val rankIsLong = rankAttr.dataType == org.apache.spark.sql.types.LongType
      def emit(r: InternalRow, rank: Int): InternalRow = {
        rankRow.update(0, if (rankIsLong) rank.toLong else rank)
        toUnsafe(joined(r, rankRow))
      }
      // mutable.PriorityQueue surfaces the MAX of `ordering` = the row
      // that sorts LAST = the current worst of the kept k
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      var buffered = 0L
      var overflowed = false
      while (iter.hasNext && !overflowed) {
        val row = iter.next()
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(h) =>
            if (h.size < k) { h.enqueue(row.copy()); buffered += 1 }
            else if (ordering.compare(row, h.head) < 0) {
              h.dequeue(); h.enqueue(row.copy())
            }
          case None =>
            val h = new mutable.PriorityQueue[InternalRow]()(ordering)
            h.enqueue(row.copy())
            heaps.put(key.copy(), h)
            buffered += 1
        }
        if (buffered > maxBuffered) overflowed = true
      }
      if (!overflowed) {
        heaps.valuesIterator.flatMap { h =>
          // drain worst-first, then reverse so rank 1 = best
          val drained = mutable.ArrayBuffer.empty[InternalRow]
          while (h.nonEmpty) drained += h.dequeue()
          drained.reverseIterator.zipWithIndex.map { case (r, i) => emit(r, i + 1) }
        }
      } else {
        // fallback: external sort by (key, order) — spills through
        // TaskMemoryManager — then a streaming first-k-per-key pass
        // (the shape of Spark's own WindowGroupLimit final phase).
        // Heap contents so far are already ≤ k per key and feed the
        // same sorter, so no work is lost.
        val schema = org.apache.spark.sql.types.StructType(childOutput.map(a =>
          org.apache.spark.sql.types.StructField(a.name, a.dataType, a.nullable)))
        val sortOrder = keys.map(e =>
          SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)) ++ order
        val fullOrdering = GenerateOrdering.generate(sortOrder, childOutput)
        val prefixComputer = new UnsafeExternalRowSorter.PrefixComputer {
          private val p = new UnsafeExternalRowSorter.PrefixComputer.Prefix
          override def computePrefix(row: InternalRow)
              : UnsafeExternalRowSorter.PrefixComputer.Prefix = {
            p.isNull = false; p.value = 0L; p
          }
        }
        val sorter = UnsafeExternalRowSorter.create(schema, fullOrdering,
          org.apache.spark.util.collection.unsafe.sort.PrefixComparators.LONG,
          prefixComputer, 4L * 1024 * 1024, false)
        val childToUnsafe = UnsafeProjection.create(childOutput, childOutput)
        def asUnsafe(r: InternalRow): UnsafeRow = r match {
          case u: UnsafeRow => u
          case other => childToUnsafe(other)
        }
        heaps.valuesIterator.foreach(_.foreach(r => sorter.insertRow(asUnsafe(r))))
        heaps.clear()
        iter.foreach(row => sorter.insertRow(asUnsafe(row)))
        var curKey: UnsafeRow = null
        var rank = 0
        sorter.sort().flatMap { r =>
          val key = keyProj(r)
          if (curKey == null || key != curKey) { curKey = key.copy(); rank = 0 }
          rank += 1
          if (rank <= k) Some(emit(r, rank)) else None
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
