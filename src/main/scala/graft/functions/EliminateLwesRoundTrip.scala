package graft.functions

import graft.functions.LwesExpressions.{FromLwes, ToLwes}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: `from_lwes(to_lwes(s, name), ddl)` never needs to
  * serialize — when every requested field exists in `s` with a
  * round-trip-lossless type, the pair collapses to a struct projection.
  *
  * This is the kind of plan users write when staging events through a
  * binary column (build payload, then inspect it downstream); the rule
  * removes both the serialize and the parse from the hot path.
  * Registered by [[graft.GraftExtensions]].
  */
object EliminateLwesRoundTrip extends Rule[LogicalPlan] {

  /** Types whose LWES wire round-trip is value-exact and total.
    * (Binary and byte are excluded: 4-byte-only ipaddr carriage and the
    * int16 upcast are not identity round-trips.) */
  private def lossless(dt: DataType): Boolean = dt match {
    case BooleanType | ShortType | IntegerType | LongType |
        FloatType | DoubleType | StringType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case original @ FromLwes(ToLwes(child, _), ddl) =>
        child.dataType match {
          case st: StructType =>
            val wanted = StructType.fromDDL(ddl)
            // Header-named fields are NOT lossless: setAttr coerces
            // SiteID/SenderPort to uint16 (70000 round-trips to 4464),
            // SenderIP is parsed as an IPv4 string (throws on non-IP,
            // canonicalizes '01.2.3.4'), ReceiptTime to int64 — so the
            // collapsed plan could differ from the executed round-trip.
            // Any such field anywhere in the input struct blocks the
            // rewrite (even unprojected ones: serialize may throw).
            // Known residual divergence, accepted by design: a string
            // field >65535 UTF-8 bytes makes the unoptimized serialize
            // throw, while the collapsed plan succeeds.
            val headerClash =
              st.fields.exists(g => graft.lwes.LwesEvent.HeaderAttrs.contains(g.name))
            val ok = !headerClash && wanted.fields.forall { f =>
              st.fields.exists(g => g.name == f.name && g.dataType == f.dataType &&
                lossless(f.dataType))
            }
            if (!ok) original
            else if (st == wanted) child
            else {
              val projected = CreateNamedStruct(wanted.fields.toSeq.flatMap { f =>
                Seq(Literal(f.name),
                  GetStructField(child, st.fieldIndex(f.name), Some(f.name)))
              })
              // preserve null-struct semantics for nullable inputs
              if (child.nullable)
                If(IsNull(child), Literal(null, projected.dataType), projected)
              else projected
            }
          case _ => original
        }
    }
}
