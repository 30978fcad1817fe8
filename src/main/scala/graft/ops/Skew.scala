package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (DESIGN.md §2). AQE's skew-join split handles
  * most cases at runtime; explicit salting remains the tool when one key
  * dominates so heavily that even split shuffle blocks overload a task —
  * e.g. the null-key or power-law user in a 100 TB fact table.
  */
object Skew {

  /** Join types for which salting is result-identical to the plain join.
    * For right/full outer the replicated dim side would emit every
    * unmatched dim row `salts` times, so those are rejected. */
  private val supportedJoinTypes =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti")

  /** Salted equi-join, result-identical to
    * `fact.join(dim, fact(factKey) === dim(dimKey), joinType)` for the
    * fact-probe join types (inner / left outer / left semi / left anti):
    * each fact row takes one of `salts` salt values; the (small) dim side
    * is replicated across every salt, so a hot key's rows spread over
    * `salts` reducers instead of one. The salt never reaches the output.
    * Right/full outer are rejected — the replicated dim side would emit
    * unmatched dim rows once per salt.
    *
    * The per-row salt only influences placement, not the result, so a
    * nondeterministic spread source is safe and cheapest
    * (monotonically_increasing_id ^ key hash).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame,
                 factKey: String, dimKey: String,
                 salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(supportedJoinTypes.contains(joinType.toLowerCase),
      s"saltedJoin supports fact-probe join types $supportedJoinTypes, got '$joinType'")
    val saltedFact = fact.withColumn("_graft_salt",
      pmod(xxhash64(col(factKey), monotonically_increasing_id()), lit(salts.toLong)))
    val repl = dim.withColumn("_graft_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    val cond: Column = saltedFact(factKey) === repl(dimKey) &&
      saltedFact("_graft_salt") === repl("_graft_salt")
    saltedFact.join(repl, cond, joinType)
      .drop("_graft_salt")
  }
}
