package graft

import org.apache.spark.sql.functions._
import graft.ops.Skew

/** Salted-join equivalence: salting changes placement, never results. */
class SkewSuite extends SparkSuite {
  import spark.implicits._

  test("saltedJoin == plain join on a skewed fact table") {
    // manufacture skew: 80% of events hit user 0
    val skewed = Tables.events(spark, sf0001)
      .withColumn("user_id", when(col("event_id") % 5 =!= 0, 0L).otherwise(col("user_id")))
      .select("event_id", "user_id")
    val dim = Tables.customer(spark, sf0001)
      .select(col("c_custkey").as("user_key"), col("c_mktsegment"))
    val plain = skewed.join(dim, col("user_id") === col("user_key"))
      .groupBy("c_mktsegment").count().as[(String, Long)].collect().toMap
    val salted = Skew.saltedJoin(skewed, dim, "user_id", "user_key", salts = 8)
      .groupBy("c_mktsegment").count().as[(String, Long)].collect().toMap
    assert(salted == plain)
    assert(plain.values.sum > 0)
  }

  test("saltedJoin with salts=1 degenerates to the plain join") {
    val ev = Tables.events(spark, sf0001).select("event_id", "user_id")
    val dim = Tables.customer(spark, sf0001)
      .select(col("c_custkey").as("user_key"), col("c_mktsegment"))
    val plain = ev.join(dim, col("user_id") === col("user_key")).count()
    val salted = Skew.saltedJoin(ev, dim, "user_id", "user_key", salts = 1).count()
    assert(salted == plain)
  }

  test("saltedJoin rejects join types where dim replication breaks results") {
    val ev = Tables.events(spark, sf0001).select("event_id", "user_id")
    val dim = Tables.customer(spark, sf0001)
      .select(col("c_custkey").as("user_key"), col("c_mktsegment"))
    for (jt <- Seq("right", "right_outer", "full", "full_outer", "cross"))
      assertThrows[IllegalArgumentException](
        Skew.saltedJoin(ev, dim, "user_id", "user_key", 4, jt))
  }

  test("saltedJoin matches plain join for semi and anti") {
    val ev = Tables.events(spark, sf0001).select("event_id", "user_id")
    val smallDim = Tables.customer(spark, sf0001).filter(col("c_custkey") < 8)
      .select(col("c_custkey").as("user_key"))
    for (jt <- Seq("left_semi", "left_anti")) {
      val plain = ev.join(smallDim, col("user_id") === col("user_key"), jt)
        .select("event_id").as[Long].collect().sorted.toSeq
      val salted = Skew.saltedJoin(ev, smallDim, "user_id", "user_key", 4, jt)
        .select("event_id").as[Long].collect().sorted.toSeq
      assert(salted == plain)
    }
  }

  test("saltedJoin preserves left-join row multiplicity") {
    val ev = Tables.events(spark, sf0001).select("event_id", "user_id")
    val smallDim = Tables.customer(spark, sf0001).filter(col("c_custkey") < 5)
      .select(col("c_custkey").as("user_key"), col("c_mktsegment"))
    val plain = ev.join(smallDim, col("user_id") === col("user_key"), "left").count()
    val salted = Skew.saltedJoin(ev, smallDim, "user_id", "user_key", 4, "left").count()
    assert(salted == plain)
  }
}
