package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (SURVEY.md §5).
  *
  * AQE's skew-join handles most cases at runtime; salting is the static
  * fallback when one build-side key is hot enough to overwhelm a single
  * shuffle partition (the classic 100 TB failure mode). The left
  * (large, skewed) side gets a random salt in [0, salt); the right side
  * is replicated `salt` times; the join key becomes (key, salt), so the
  * hot key spreads over `salt` shuffle partitions.
  *
  * The salt is derived deterministically from a second left-side column
  * (`saltBy`, e.g. a unique id) rather than `rand()`, so results are
  * reproducible run-to-run.
  */
object SkewJoin {

  /** Join types where replicating the right side is semantics-preserving.
    * Right/full outer are NOT: each unmatched right row would be emitted
    * `salt` times (one per replica), corrupting the null-extension. */
  private val SupportedJoinTypes =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "semi", "left_anti", "leftanti", "anti", "cross")

  def salted(left: DataFrame, right: DataFrame, key: String,
      saltBy: String, salt: Int = 16, joinType: String = "inner"): DataFrame = {
    require(salt > 0, "salt must be positive")
    require(SupportedJoinTypes.contains(joinType.toLowerCase.replace(" ", "_")),
      s"salted join replicates the right side and cannot preserve " +
        s"right/full outer semantics; got '$joinType'")
    val l = left.withColumn("__salt",
      pmod(xxhash64(col(saltBy)), lit(salt)).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
