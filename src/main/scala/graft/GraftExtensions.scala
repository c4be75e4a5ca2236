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

    // The signature kernels behind the dedup/similarity operators
    // (r15): pure-SQL users can build the same pipelines the Scala
    // operators build — `simhash_portable(text_tokens)`, banded
    // minhash joins, hyperplane buckets, exact cosine re-ranks —
    // without touching the Scala API. All codegen'd expressions; the
    // numeric parameters must be foldable integer literals.
    import graft.functions.{SignatureExpressions => SE}
    def intLit(ex: Expression): Int = {
      if (!ex.foldable) throw new IllegalArgumentException(
        s"expected a foldable integer literal, got the non-foldable $ex")
      ex.eval(null) match {
        case i: Int => i
        case l: Long => l.toInt
        case s: Short => s.toInt
        case b: Byte => b.toInt
        case other => throw new IllegalArgumentException(
          s"expected an integer literal, got $other (${ex.dataType.simpleString})")
      }
    }
    e.injectFunction((FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[SE.ShingleHashes].getName, "shingle_hashes"),
      (ex: Seq[Expression]) => SE.ShingleHashes(ex.head, intLit(ex(1)))))
    e.injectFunction((FunctionIdentifier("minhashes"),
      new ExpressionInfo(classOf[SE.MinHashes].getName, "minhashes"),
      (ex: Seq[Expression]) => SE.MinHashes(ex.head, intLit(ex(1)))))
    e.injectFunction((FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SE.SimHash64].getName, "simhash64"),
      (ex: Seq[Expression]) => SE.SimHash64(ex.head)))
    e.injectFunction((FunctionIdentifier("simhash_portable"),
      new ExpressionInfo(classOf[SE.SimHashPortable48].getName, "simhash_portable"),
      (ex: Seq[Expression]) => SE.SimHashPortable48(ex.head)))
    e.injectFunction((FunctionIdentifier("hyperplane_bucket"),
      new ExpressionInfo(classOf[SE.HyperplaneBucket].getName, "hyperplane_bucket"),
      (ex: Seq[Expression]) => SE.HyperplaneBucket(ex.head, intLit(ex(1)))))
    e.injectFunction((FunctionIdentifier("hyperplane_buckets"),
      new ExpressionInfo(classOf[SE.HyperplaneBuckets].getName, "hyperplane_buckets"),
      (ex: Seq[Expression]) =>
        SE.HyperplaneBuckets(ex.head, intLit(ex(1)), intLit(ex(2)))))
    e.injectFunction((FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[SE.CosineSim].getName, "cosine_sim"),
      (ex: Seq[Expression]) => SE.CosineSim(ex.head, ex(1))))
    e.injectFunction((FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[SE.NfcNormalize].getName, "nfc_normalize"),
      (ex: Seq[Expression]) => SE.NfcNormalize(ex.head)))
    e.injectFunction((FunctionIdentifier("nfc_casefold"),
      new ExpressionInfo(classOf[SE.NfcCasefold].getName, "nfc_casefold"),
      (ex: Seq[Expression]) => SE.NfcCasefold(ex.head)))
  }
}
