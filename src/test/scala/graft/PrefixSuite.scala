package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Prefix

/** The shared super-bucket two-pass prefix machinery (graft.ops.Prefix)
  * and the three running-window queries reworked onto it in round 7
  * (VERDICT r6 item 1: q_twap, q_sample_systematic, q_peak_concurrency
  * previously put one sort task per constant-cardinality key).
  *
  * Three layers: (a) property tests of the keyed prefix-sum / suffix-min
  * primitives against the naive per-key walk on sparse random buckets;
  * (b) result-equivalence of each reworked query against its retired
  * single-window form on the real fixture; (c) the scale pins — the
  * row-level window partitions by (key, bucket) in the executed plan,
  * and on a manufactured one-hot-key dataset the biggest window
  * partition is bucket-bounded, not key-bounded. */
class PrefixSuite extends SparkSuite {
  import spark.implicits._

  test("bucketPrefixSum (keyed) equals the naive per-key strict-prefix sum") {
    val rnd = new scala.util.Random(7)
    val rows = for {
      k <- Seq("a", "b", "c")
      b <- 0L until 300L if rnd.nextBoolean()
    } yield (k, b, rnd.nextLong(100000L) - 20000L) // negatives too
    val got = Prefix.bucketPrefixSum(rows.toDF("k", "b", "v"), Seq("k"), 4L)
      .as[(String, Long, Long)].collect()
      .map { case (k, b, p) => (k, b) -> p }.toMap
    rows.groupBy(_._1).foreach { case (k, rs) =>
      var run = 0L
      rs.sortBy(_._2).foreach { case (_, b, v) =>
        assert(got((k, b)) == run, s"($k,$b): got ${got((k, b))}, want $run")
        run += v
      }
    }
    assert(rows.size > 300 && got.size == rows.size)
  }

  test("bucketSuffixMin (keyed) equals the naive per-key strict-suffix min") {
    val rnd = new scala.util.Random(11)
    val rows = for {
      k <- Seq("x", "y")
      b <- 0L until 300L if rnd.nextBoolean()
    } yield (k, b, rnd.nextLong(1000000L))
    val got = Prefix.bucketSuffixMin(rows.toDF("k", "b", "v"), Seq("k"), 4L)
      .as[(String, Long, Option[Long])].collect()
      .map { case (k, b, n) => (k, b) -> n }.toMap
    rows.groupBy(_._1).foreach { case (k, rs) =>
      var run = Option.empty[Long]
      rs.sortBy(-_._2).foreach { case (_, b, v) =>
        assert(got((k, b)) == run, s"($k,$b): got ${got((k, b))}, want $run")
        run = Some(run.fold(v)(math.min(_, v)))
      }
    }
    assert(rows.size > 200 && got.size == rows.size)
  }

  test("bucketPrefixSum: NEGATIVE bucket ids (desc-order negation, negative balances) stay exact") {
    // integer DIV truncates toward zero, so negative buckets group into
    // contiguous-but-uneven super-buckets around zero — the contract the
    // suffix-min mirror and q_win_ntile's negative-cents buckets rely on
    val rnd = new scala.util.Random(23)
    val rows = (-150L until 150L).filter(_ => rnd.nextBoolean())
      .map(b => ("k", b, rnd.nextLong(1000L))).toSeq
    val got = Prefix.bucketPrefixSum(rows.toDF("k", "b", "v"), Seq("k"), 4L)
      .as[(String, Long, Long)].collect()
      .map { case (_, b, p) => b -> p }.toMap
    var run = 0L
    rows.sortBy(_._2).foreach { case (_, b, v) =>
      assert(got(b) == run, s"bucket $b: got ${got(b)}, want $run")
      run += v
    }
    assert(rows.count(_._2 < 0) > 50 && got.size == rows.size)
  }

  test("prefix primitives degenerate correctly: empty input, single bucket per key") {
    assert(Prefix.bucketPrefixSum(
      Seq.empty[(String, Long, Long)].toDF("k", "b", "v"), Seq("k"), 4L).count() == 0)
    val one = Prefix.bucketPrefixSum(
      Seq(("a", 5L, 42L), ("b", 9L, 7L)).toDF("k", "b", "v"), Seq("k"), 4L)
      .as[(String, Long, Long)].collect().toSet
    assert(one == Set(("a", 5L, 0L), ("b", 9L, 0L)),
      s"single bucket per key must carry the sum identity 0: $one")
    val oneMin = Prefix.bucketSuffixMin(
      Seq(("a", 5L, 42L)).toDF("k", "b", "v"), Seq("k"), 4L)
      .as[(String, Long, Option[Long])].collect().toSeq
    assert(oneMin == Seq(("a", 5L, None)),
      s"last bucket must have NULL suffix min: $oneMin")
  }

  test("q_twap: bucketed lead equals the retired single-window form") {
    val naive = {
      val w = Window.partitionBy(col("event_type")).orderBy(col("tu"), col("event_id"))
      Tables.events(spark, sf0001)
        .filter(col("value").isNotNull)
        .select(col("event_type"), col("event_id"),
          expr("ts DIV 1000").as("tu"),
          (graft.Dsl.dec(col("value")) * 100).cast("long").as("cents"))
        .withColumn("nxt", lead(col("tu"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .withColumn("gap", col("nxt") - col("tu"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_segments"),
          sum(col("gap")).cast("long").as("span_us"),
          expr("sum(cents * gap) DIV sum(gap)").as("twap_cents"))
        .orderBy("event_type")
        .as[(String, Long, Long, Long)].collect().toSeq
    }
    val got = SparkEntry.queries("q_twap")(spark, sf0001)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == naive, s"bucketed twap drifted:\n got=$got\n want=$naive")
    assert(naive.nonEmpty)
  }

  test("q_sample_systematic: bucketed running sum equals the retired single-window form") {
    val naive = {
      val ev = Tables.events(spark, sf0001).select(
        col("event_type"), col("event_id"), unix_micros(col("t")).as("tu"),
        (graft.Dsl.dec(col("value"), 12, 2) * 100).cast("long").as("cents"))
      val byType = Window.partitionBy(col("event_type"))
      ev.withColumn("cum", sum(col("cents")).over(
          byType.orderBy(col("tu"), col("event_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("total", sum(col("cents")).over(byType))
        .filter(expr(
          "cum DIV greatest(total DIV 50, 1) > (cum - cents) DIV greatest(total DIV 50, 1)"))
        .select(col("event_type"), col("event_id"), col("cents"),
          col("cum").cast("long").as("cum"))
        .orderBy("event_type", "event_id")
        .as[(String, Long, Long, Long)].collect().toSeq
    }
    val got = SparkEntry.queries("q_sample_systematic")(spark, sf0001)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == naive, s"bucketed systematic sample drifted (sizes ${got.size}/${naive.size})")
    assert(naive.size > 50)
  }

  test("q_peak_concurrency: bucketed sweep-line equals the retired single-window form") {
    val naive = {
      val iv = Tables.events(spark, sf0001)
        .groupBy(col("user_id"), to_date(col("t")).as("day"))
        .agg(expr("min(ts DIV 1000)").as("st"), expr("max(ts DIV 1000)").as("en"))
      val pts = iv.select(col("day"), col("user_id"), col("st").as("tu"), lit(1).as("delta"))
        .unionAll(iv.select(col("day"), col("user_id"),
          (col("en") + 1).as("tu"), lit(-1).as("delta")))
      val run = pts.withColumn("cur", sum(col("delta")).over(
        Window.partitionBy(col("day"))
          .orderBy(col("tu"), col("delta").desc, col("user_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val pk = run.groupBy(col("day")).agg(max(col("cur")).as("peak"))
      val nSess = iv.groupBy(col("day")).agg(count(lit(1)).as("n_sessions"))
      run.join(pk, Seq("day")).filter(col("cur") === col("peak"))
        .groupBy(col("day"), col("peak"))
        .agg(min(col("tu")).as("peak_tu"))
        .join(nSess, Seq("day"))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("n_sessions"), col("peak").cast("long").as("peak"),
          col("peak_tu").cast("long").as("peak_tu"))
        .orderBy("day")
        .as[(String, Long, Long, Long)].collect().toSeq
    }
    val got = SparkEntry.queries("q_peak_concurrency")(spark, sf0001)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == naive, s"bucketed sweep-line drifted:\n got=$got\n want=$naive")
    assert(naive.nonEmpty)
  }

  test("scale pin: the reworked queries' row-level windows partition by (key, bucket)") {
    // A physical Window whose partition spec is the bare constant-
    // cardinality key is the defect this round removed; the row-level
    // window must carry the time-bucket column too. Every Window in each
    // plan is either (key, b)-partitioned or one of the metadata-scale
    // in-super-bucket windows inside Prefix (partitioned by sb).
    for (q <- Seq("q_twap", "q_sample_systematic", "q_peak_concurrency")) {
      val phys = SparkEntry.queries(q)(spark, sf0001)
        .queryExecution.executedPlan.toString()
      val windows = phys.linesIterator.filter(_.contains("Window [")).toSeq
      assert(windows.nonEmpty, s"$q: expected window operators")
      val bare = windows.filterNot(l => l.contains("b#") || l.contains("sb#"))
      assert(bare.isEmpty, s"$q: window not bucket-partitioned:\n${bare.mkString("\n")}")
    }
  }

  test("distributed ranking: in-bucket ranks + Prefix carries equal rank/dense_rank/row_number") {
    // the 100x path for the constant-cardinality ranking family
    // (q_win_rank's scaladoc, q_win_ntile's shipped shape): bucket by
    // the ordering prefix, rank within buckets, carry counts across.
    // row_number/rank carry = prefix SUM of bucket row counts;
    // dense_rank carry = prefix SUM of bucket DISTINCT-value counts
    // (value buckets mean tie groups never straddle buckets).
    val n = 5000L
    val rows = spark.range(n).select(
      lit("hot").as("k"),
      col("id").as("uid"),
      (col("id") % 700).as("s")) // ties: ~7 rows per score
    val wT = Window.partitionBy(col("k")).orderBy(col("s").desc)
    val wU = Window.partitionBy(col("k")).orderBy(col("s").desc, col("uid"))
    val want = rows
      .withColumn("rnk", rank().over(wT))
      .withColumn("drnk", dense_rank().over(wT))
      .withColumn("rn", row_number().over(wU))
      .select(col("uid"), col("rnk"), col("drnk"), col("rn"))
      .as[(Long, Int, Int, Int)].collect().toSet
    val b = rows.withColumn("b", expr("(0 - s) DIV 64")) // desc order -> negate
    val inT = Window.partitionBy(col("k"), col("b")).orderBy(col("s").desc)
    val inU = Window.partitionBy(col("k"), col("b")).orderBy(col("s").desc, col("uid"))
    val perBucket = b.groupBy(col("k"), col("b"))
      .agg(count(lit(1)).cast("long").as("cnt"),
        countDistinct(col("s")).cast("long").as("dct"))
    val carryCnt = Prefix.bucketPrefixSum(
      perBucket.select(col("k"), col("b"), col("cnt").as("v")), Seq("k"), 16L)
    val carryDct = Prefix.bucketPrefixSum(
      perBucket.select(col("k"), col("b"), col("dct").as("v")), Seq("k"), 16L)
      .withColumnRenamed("prev", "prevd")
    val got = b
      .withColumn("rnk_in", rank().over(inT))
      .withColumn("drnk_in", dense_rank().over(inT))
      .withColumn("rn_in", row_number().over(inU))
      .join(broadcast(carryCnt), Seq("k", "b"))
      .join(broadcast(carryDct), Seq("k", "b"))
      .select(col("uid"),
        (col("rnk_in") + col("prev")).cast("int").as("rnk"),
        (col("drnk_in") + col("prevd")).cast("int").as("drnk"),
        (col("rn_in") + col("prev")).cast("int").as("rn"))
      .as[(Long, Int, Int, Int)].collect().toSet
    assert(got == want,
      s"decomposed ranks drifted: missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    assert(want.size == n.toInt)
  }

  test("q_win_ntile: the decomposed tile equals the plain ntile window") {
    val c = Tables.customer(spark, sf0001)
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    val want = c.select(col("c_custkey"), col("c_mktsegment").as("seg"),
        ntile(4).over(w).cast("long").as("tile"))
      .as[(Long, String, Long)].collect().toSet
    val got = SparkEntry.queries("q_win_ntile")(spark, sf0001)
      .as[(Long, String, Long)].collect().toSet
    assert(got == want, s"decomposed ntile drifted (sizes ${got.size}/${want.size})")
    assert(want.nonEmpty)
  }

  test("hot key no longer serializes: one key, many buckets -> bucket-bounded window partitions") {
    // Manufacture the distribution the rework exists for: ONE event type
    // carrying every row, spread across the time axis. Under the retired
    // plan the running sum was a single window partition of n rows; the
    // bucketed plan's largest window partition is the largest BUCKET.
    // The deterministic quantity (what makes a straggler at 100 TB) is
    // max-rows-per-window-partition; assert it is bucket-bounded and the
    // carry reconstruction still matches the naive walk exactly.
    val n = 20000L
    val span = 1L << 32
    val one = spark.range(n).select(
      lit("hot").as("k"),
      col("id").as("event_id"),
      (col("id") * (span / 64)).as("tu"), // ~64 rows per bucket, ~312 buckets
      (col("id") % 97 + 1).as("cents"))
    val inB = Window.partitionBy(col("k"), col("b"))
      .orderBy(col("tu"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bucketed = one.withColumn("b", expr(s"tu DIV ${span}L"))
    val carry = Prefix.bucketPrefixSum(
      bucketed.groupBy(col("k"), col("b")).agg(sum(col("cents")).as("v")), Seq("k"), 16L)
    val got = bucketed.withColumn("cum_in", sum(col("cents")).over(inB))
      .join(broadcast(carry), Seq("k", "b"))
      .select(col("event_id"), (col("cum_in") + col("prev")).as("cum"))
      .as[(Long, Long)].collect().sortBy(_._1)
    var run = 0L
    got.foreach { case (id, cum) =>
      run += id % 97 + 1
      assert(cum == run, s"event $id: cum $cum != $run")
    }
    val maxBucket = bucketed.groupBy(col("k"), col("b")).count()
      .agg(max(col("count"))).as[Long].head()
    assert(maxBucket <= 64L && maxBucket * 100 < n,
      s"largest window partition ($maxBucket rows) must be bucket-bounded, not the full key ($n)")
  }
}
