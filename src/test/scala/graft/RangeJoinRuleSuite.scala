package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RewriteRangeJoin: the pure time-band join (no equi key) must compile
  * to a bucketed equi join — never a nested-loop — with results
  * identical to the brute-force evaluation, including the inclusive
  * upper boundary and pre-1970 timestamps (floor vs truncating division
  * disagree there; the rule must use floor).
  */
class RangeJoinRuleSuite extends SparkSuite {
  import spark.implicits._

  Engine.init(spark) // rules install via Tables in other suites; none read here

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val aRows = Seq(
    (1L, ts("2024-01-01 10:00:00")),
    (2L, ts("2024-01-01 12:00:00")),
    (3L, ts("1969-12-31 23:30:00")), // pre-epoch: floor-div territory
    (4L, ts("2024-01-02 05:59:00")))
  private val bRows = Seq(
    (10L, ts("2024-01-01 10:30:00")),  // in band of 1 (30 min later)
    (11L, ts("2024-01-01 11:00:00")),  // exactly at 1's upper bound → inclusive
    (12L, ts("2024-01-01 13:30:00")),  // out of every band
    (13L, ts("1969-12-31 23:59:00")),  // in band of 3, crosses the epoch
    (14L, ts("2024-01-02 06:30:00")))  // in band of 4

  private def bandJoin(): DataFrame = {
    val a = aRows.toDF("ida", "ta")
    val b = bRows.toDF("idb", "tb")
    a.join(b, col("ta") < col("tb") &&
      col("tb") <= col("ta") + expr("INTERVAL 1 HOUR"))
  }

  test("pure band join compiles to a bucketed equi join, not a nested loop") {
    val p = bandJoin().queryExecution.executedPlan.toString()
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(2000))
    assert(p.contains("Generate"), p.take(2000))
  }

  test("rewritten band join returns exactly the brute-force pairs") {
    val got = bandJoin().select("ida", "idb").as[(Long, Long)].collect().toSet
    val want = (for {
      (ida, ta) <- aRows
      (idb, tb) <- bRows
      if ta.getTime < tb.getTime && tb.getTime <= ta.getTime + 3600000L
    } yield (ida, idb)).toSet
    assert(got == want)
    // the boundary-exact and pre-epoch pairs are actually present
    assert(want.contains((1L, 11L)) && want.contains((3L, 13L)))
  }

  test("SQL-surface parity: a spark.sql band join gets the same rewrite") {
    // the optimizer rule must serve SQL users identically to DataFrame
    // users — extensions are session-level, not API-level
    aRows.toDF("ida", "ta").createOrReplaceTempView("band_a")
    bRows.toDF("idb", "tb").createOrReplaceTempView("band_b")
    val df = spark.sql(
      """SELECT ida, idb FROM band_a JOIN band_b
         ON ta < tb AND tb <= ta + INTERVAL 1 HOUR""")
    val p = df.queryExecution.executedPlan.toString()
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(2000))
    val got = df.as[(Long, Long)].collect().toSet
    val want = bandJoin().select("ida", "idb").as[(Long, Long)].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("rule leaves equi-keyed interval joins alone") {
    val a = aRows.toDF("ida", "ta").withColumn("k", col("ida") % 2)
    val b = bRows.toDF("idb", "tb").withColumn("kb", col("idb") % 2)
    val j = a.join(b, col("k") === col("kb") && col("ta") < col("tb") &&
      col("tb") <= col("ta") + expr("INTERVAL 1 HOUR"))
    val p = j.queryExecution.executedPlan.toString()
    assert(!p.contains("Generate"), p.take(2000))
  }

  test("int64 band join rewrites too, correct across negative values") {
    // raw int64 event times (e.g. nanosecond longs), including negatives
    val a = Seq((1L, -150L), (2L, 0L), (3L, 970L)).toDF("ida", "xa")
    val b = Seq((10L, -100L), (11L, 0L), (12L, 1000L), (13L, 2000L)).toDF("idb", "xb")
    val j = a.join(b, col("xa") < col("xb") && col("xb") <= col("xa") + lit(100L))
    val p = j.queryExecution.executedPlan.toString()
    assert(!p.contains("BroadcastNestedLoopJoin") && p.contains("Generate"), p.take(2000))
    val got = j.select("ida", "idb").as[(Long, Long)].collect().toSet
    val want = (for {
      (ida, xa) <- Seq((1L, -150L), (2L, 0L), (3L, 970L))
      (idb, xb) <- Seq((10L, -100L), (11L, 0L), (12L, 1000L), (13L, 2000L))
      if xa < xb && xb <= xa + 100L
    } yield (ida, idb)).toSet
    assert(got == want && want.contains((1L, 10L)) && want.contains((3L, 12L)))
  }

  test("rule is a no-op for outer joins") {
    val a = aRows.toDF("ida", "ta")
    val b = bRows.toDF("idb", "tb")
    val j = a.join(b, col("ta") < col("tb") &&
      col("tb") <= col("ta") + expr("INTERVAL 1 HOUR"), "left")
    // still correct (nested loop is acceptable here — rule must not fire)
    assert(j.queryExecution.executedPlan.toString().contains("BroadcastNestedLoopJoin"))
    assert(j.count() == 5) // every a row survives a left join
  }
}
