package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed strict-prefix aggregates over keyed bucket aggregates —
  * the general form of the super-bucket two-pass machinery first built
  * for the late-data watermark overlay
  * ([[graft.ops.StreamingAnalogs.bucketPrefixMax]]) and now shared by
  * every running-window query whose partition key has CONSTANT
  * cardinality (event_type: 5 values, day: one per calendar day). A
  * plain `Window.partitionBy(key).orderBy(t)` running sum/max/lead puts
  * one task per key value — at 100 TB that task sorts ~1/|key| of the
  * table. Decomposing by (key, time-bucket) instead makes the row-level
  * pass fully parallel (one window partition per bucket) and reduces the
  * cross-bucket carry to metadata scale: one row per non-empty bucket.
  *
  * Input contract: `perBucket` has columns `keys :+ "b" :+ "v"` — one
  * row per non-empty (key, bucket), `v` the bucket's aggregate. Output:
  * `keys :+ "b" :+ result` where result aggregates `v` over all buckets
  * of the SAME key strictly before (prefix) / after (suffix) `b`.
  *
  * Shape: buckets group into super-buckets of `superSize`; within a
  * super-bucket the strict-prefix aggregate is a partitioned window
  * (≤ superSize rows per partition), across super-buckets a broadcast
  * theta self-join over the per-(key, super-bucket) aggregates — m²
  * pairs on a table of #buckets/superSize rows per key, bounded by
  * construction. The incoming bucket aggregate is localCheckpoint'd:
  * three branches consume it, and without materialization each branch
  * would recompute the caller's aggregation — and whatever scan feeds
  * it — from scratch. Property-tested against the naive global window
  * in PrefixSuite (keyed sum + suffix min; the max form keeps its
  * original tests via the [[StreamingAnalogs.bucketPrefixMax]] shim).
  */
object Prefix {

  /** Strict-prefix MAX per key: `(keys, b, prev)`, prev = max(v) over
    * buckets of the same key with smaller b; NULL for each key's first
    * bucket. */
  def bucketPrefixMax(perBucket: DataFrame, keys: Seq[String], superSize: Long): DataFrame =
    core(perBucket, keys, superSize, max, greatest(_, _), "prev")

  /** Strict-prefix SUM per key: `(keys, b, prev)`, prev = sum(v) over
    * buckets of the same key with smaller b; 0 for each key's first
    * bucket (the identity a running sum wants, unlike max's NULL). */
  def bucketPrefixSum(perBucket: DataFrame, keys: Seq[String], superSize: Long): DataFrame =
    core(perBucket, keys, superSize, sum,
      (a, b) => coalesce(a, lit(0L)) + coalesce(b, lit(0L)), "prev")

  /** Strict-suffix MIN per key: `(keys, b, nxt)`, nxt = min(v) over
    * buckets of the same key with LARGER b; NULL for each key's last
    * bucket. When buckets partition a monotone ordering key (b = t DIV
    * span), this is "the first t of the next non-empty bucket" — the
    * cross-bucket carry a distributed lead() needs. Implemented by
    * mirroring: negate b and v, take the prefix max, negate back
    * (integer DIV truncates toward zero, so negated buckets still group
    * into contiguous monotone super-buckets).
    *
    * Domain exclusion: `Long.MinValue` (for either `b` or `v`) negates
    * to itself in two's complement, so a MinValue input would silently
    * corrupt the mirror — out of contract here. Every current caller
    * feeds timestamps / non-negative measures; a general caller must
    * pre-shift or use a direct descending-window implementation. */
  def bucketSuffixMin(perBucket: DataFrame, keys: Seq[String], superSize: Long): DataFrame = {
    val n = perBucket.withColumn("b", -col("b")).withColumn("v", -col("v"))
    core(n, keys, superSize, max, greatest(_, _), "nxt")
      .select((keys.map(col) :+ (-col("b")).as("b") :+ (-col("nxt")).as("nxt")): _*)
  }

  private def core(perBucket: DataFrame, keys: Seq[String], superSize: Long,
                   agg: Column => Column, merge: (Column, Column) => Column,
                   outName: String): DataFrame = {
    val grp = (keys :+ "sb").map(col)
    val pb = perBucket.withColumn("sb", expr(s"b DIV ${superSize}L")).localCheckpoint()
    val inSb = Window.partitionBy(grp: _*).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val perSb = pb.groupBy(grp: _*).agg(agg(col("v")).as("sbv"))
    val rhs = perSb.select(
      (keys.map(k => col(k).as(s"${k}__r")) :+ col("sb").as("sb__r") :+ col("sbv").as("sbv__r")): _*)
    val cond = keys.foldLeft(col("sb__r") < col("sb")) { (c, k) => c && col(k) === col(s"${k}__r") }
    val prevSb = perSb.join(broadcast(rhs), cond)
      .groupBy(grp: _*).agg(agg(col("sbv__r")).as("prev_sb"))
    pb.withColumn("prev_in_sb", agg(col("v")).over(inSb))
      .join(broadcast(prevSb), keys :+ "sb", "left")
      .select((keys.map(col) :+ col("b") :+ merge(col("prev_in_sb"), col("prev_sb")).as(outName)): _*)
  }
}
