package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Dev-only: phase-level timing of individual lifecycle queries (which
  * commit/drain/read dominates). Not part of the declared surface. */
object DevPhase {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[phase] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
  }

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    t("warmup entry")(SparkEntry.entry(spark).count())
    val which = if (args.nonEmpty) args.toSeq else Seq("zorder")
    which.foreach {
      case "zorder" =>
        // replicate qTableZorder with phase timers (twice: cold+warm)
        for (i <- 1 to 2) {
          import graft.sources.ManifestTable
          val tdir = s"${graft.Scratch.dir(s"dev_zorder_$i")}/x"
          org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tdir))
          val li = Tables.lineitem(spark, d).select(
            col("l_partkey"), col("l_suppkey"),
            col("l_quantity").cast(LongType).as("qty"))
          t(s"z$i append32")(ManifestTable.append(spark, tdir, li.repartition(32)))
          t(s"z$i clusterBy")(ManifestTable.clusterBy(spark, tdir, "l_partkey", "l_suppkey"))
          t(s"z$i prunedAgg")(ManifestTable.readPruned2(spark, tdir,
              "l_partkey", 100L, 299L, "l_suppkey", 3L, 6L)
            .groupBy(col("l_suppkey"))
            .agg(count(lit(1)).as("n_rows"),
              sum(col("l_partkey")).cast(LongType).as("sum_part"),
              sum(col("qty")).cast(LongType).as("sum_qty"))
            .orderBy("l_suppkey").count())
        }
      case "stage" =>
        import graft.sources.ManifestTable
        for (i <- 1 to 2) {
          val out = s"${graft.Scratch.dir(s"dev_stage_$i")}/w"
          val li = Tables.lineitem(spark, d).select(
            col("l_partkey"), col("l_suppkey"),
            col("l_quantity").cast(LongType).as("qty"))
          t(s"s$i write32")(li.repartition(32).write.parquet(out))
          val files = new java.io.File(out).listFiles()
            .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
          println(s"files=${files.size}")
          t(s"s$i footerStatsTyped x${files.size}")(files.foreach(ManifestTable.footerStatsTyped))
          t(s"s$i footerRowCount x${files.size}")(files.foreach(ManifestTable.footerRowCount))
          t(s"s$i footerNullCounts x${files.size}")(files.foreach(ManifestTable.footerNullCounts))
        }
      case "mvjoin" =>
        import graft.sources.{ChangeFeed, ManifestTable}
        for (i <- 1 to 2) {
          val root = s"${graft.Scratch.dir(s"dev_mvj_$i")}/x"
          org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
          val (ordT, custT, mv) = (s"$root/ord", s"$root/cust", s"$root/mv")
          val (cpO, cpC) = (s"$root/cpo", s"$root/cpc")
          val ord = Tables.orders(spark, d).select(
            col("o_orderkey").as("okey"), col("o_custkey").as("ckey"),
            (col("o_totalprice").cast("decimal(12,2)") * 100).cast(LongType).as("cents"))
          val cust = Tables.customer(spark, d).select(
            col("c_custkey").as("ckey"), col("c_mktsegment").as("seg"))
          t(s"m$i seed wave")(graft.Parallel.run(
            () => ManifestTable.append(spark, ordT, ord.filter(col("okey") % 2 === 0)),
            () => ManifestTable.append(spark, custT, cust)))
          t(s"m$i drain v0")({
            ChangeFeed.availableNow(spark, ordT, cpO)((_, _, _) => ())
            ChangeFeed.availableNow(spark, custT, cpC)((_, _, _) => ())
          })
          def signed(ch: org.apache.spark.sql.DataFrame) = ch.withColumn("sgn",
            when(col("_change_type").isin("insert", "update_postimage"), 1L).otherwise(-1L))
          def partial(j: org.apache.spark.sql.DataFrame) =
            j.groupBy(col("seg"))
              .agg(sum(col("sgn") * col("cents")).cast(LongType).as("d_cents"),
                sum(col("sgn")).cast(LongType).as("d_rows"))
          val custV0 = ManifestTable.latestVersion(custT).get
          t(s"m$i batch0")(ManifestTable.idempotentAppend(spark, mv,
            partial(ManifestTable.read(spark, ordT).withColumn("sgn", lit(1L))
              .join(ManifestTable.read(spark, custT), "ckey")), batchId = 0L))
          t(s"m$i merge wave")(graft.Parallel.run(
            () => ManifestTable.merge(spark, ordT,
              ord.filter(col("okey") % 4 === 0 || col("okey") % 4 === 1)
                .select(col("okey"), col("ckey"), (col("cents") + 7L).as("cents")), "okey"),
            () => ManifestTable.merge(spark, custT,
              cust.filter(col("ckey") % 5 === 0)
                .select(col("ckey"), lit("REASSIGNED").as("seg")), "ckey")))
          t(s"m$i drain ord")(ChangeFeed.availableNow(spark, ordT, cpO) { (ch, _, toV) =>
            ManifestTable.idempotentAppend(spark, mv,
              partial(signed(ch).select(col("ckey"), col("cents"), col("sgn"))
                .join(ManifestTable.read(spark, custT, Some(custV0)), "ckey")),
              batchId = 2 * toV); ()
          })
          t(s"m$i drain cust")(ChangeFeed.availableNow(spark, custT, cpC) { (ch, _, toV) =>
            ManifestTable.idempotentAppend(spark, mv,
              partial(ManifestTable.read(spark, ordT)
                .join(signed(ch).select(col("ckey"), col("seg"), col("sgn")), "ckey")),
              batchId = 2 * toV + 1); ()
          })
          t(s"m$i final read")(ManifestTable.read(spark, mv)
            .groupBy(col("seg"))
            .agg(sum(col("d_cents")).cast(LongType).as("sum_cents"),
              sum(col("d_rows")).cast(LongType).as("n_rows"))
            .filter(col("n_rows") > 0).orderBy("seg").count())
        }
      case "cdf" =>
        import graft.sources.ManifestTable
        for (i <- 1 to 2) {
          val tdir = s"${graft.Scratch.dir(s"dev_cdf_$i")}/x"
          org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tdir))
          val ev = Tables.events(spark, d)
            .select(col("event_id"), col("user_id"), col("event_type"))
          for (b <- 0L to 2L)
            t(s"c$i append$b")(ManifestTable.append(spark, tdir, ev.filter(col("event_id") % 3 === b)))
          t(s"c$i delete1")(ManifestTable.deleteWhere(spark, tdir, "user_id", 3L, 3L))
          val vDel = t(s"c$i delete2")(ManifestTable.deleteWhere(spark, tdir, "user_id", 7L, 7L))
          val vC = t(s"c$i compact")(ManifestTable.compact(spark, tdir))
          t(s"c$i census")(ManifestTable.readChanges(spark, tdir, -1L, vC)
            .groupBy(col("_commit_version").as("v"), col("_change_type").as("ctype"))
            .agg(count(lit(1)).as("n_rows"),
              sum(col("event_id")).cast(LongType).as("sum_id"))
            .orderBy("v", "ctype").count())
        }
      case "rfmplan" =>
        val df = SparkEntry.queries("q_rfm")(spark, d)
        df.count()
        val p = df.queryExecution.executedPlan.toString()
        println("=== executed plan ===")
        p.linesIterator.filter(l => l.contains("Window") || l.contains("windowspec"))
          .foreach(println)
      case "basket" =>
        for (i <- 1 to 3) {
          val t0 = System.nanoTime()
          val baskets = Tables.lineitem(spark, d)
            .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
            .groupBy(col("o")).agg(sort_array(collect_set(col("p"))).as("ps"))
            .localCheckpoint()
          println(f"[phase] b$i ckpt: ${(System.nanoTime() - t0) / 1e9}%.3f s")
          val t1 = System.nanoTime()
          SparkEntry.queries("q_basket_lift")(spark, d).count()
          println(f"[phase] b$i full: ${(System.nanoTime() - t1) / 1e9}%.3f s")
        }
      case "layers" =>
        import graft.sources.{ChangeFeed, ManifestTable}
        for (i <- 1 to 2) {
          val root = s"${graft.Scratch.dir(s"dev_layers_$i")}/x"
          org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
          val ods = s"$root/ods"; val dwd = s"$root/dwd"; val dws = s"$root/dws"
          val ev = Tables.events(spark, d).select(
            col("event_id"), col("event_type"), col("user_id"), col("value"),
            dayofmonth(col("t")).cast(LongType).as("day"))
          def clean(ch: org.apache.spark.sql.DataFrame) = ch
            .filter(col("_change_type") === "insert")
            .filter(col("value").isNotNull)
            .select(col("event_id"), col("event_type"), col("day"),
              (col("value").cast("decimal(12,2)") * 100).cast(LongType).as("cents"))
          def partial(ch: org.apache.spark.sql.DataFrame) = ch
            .filter(col("_change_type") === "insert")
            .groupBy(col("event_type"), col("day"))
            .agg(count(lit(1)).as("cnt"), sum(col("cents")).as("sum_cents"),
              max(col("cents")).as("max_cents"))
          for (b <- 0L to 2L) {
            t(s"l$i append$b")(ManifestTable.append(spark, ods, ev.filter(col("event_id") % 3 === b)))
            t(s"l$i drain ods->dwd $b")(ChangeFeed.availableNow(spark, ods, s"$root/cp_dwd") { (ch, _, to) =>
              ManifestTable.idempotentAppend(spark, dwd, clean(ch), to); ()
            })
            t(s"l$i drain dwd->dws $b")(ChangeFeed.availableNow(spark, dwd, s"$root/cp_dws") { (ch, _, to) =>
              ManifestTable.idempotentAppend(spark, dws, partial(ch), to); ()
            })
          }
          t(s"l$i replay")(ChangeFeed.availableNow(spark, ods, s"$root/cp_replay") { (ch, _, to) =>
            require(ManifestTable.idempotentAppend(spark, dwd, clean(ch), to).isEmpty)
          })
          val dwd2 = s"$root/dwd2"
          t(s"l$i stream recover")({
            val rq = spark.readStream.format("graft.sources.ManifestStreamSource")
              .option("table", ods).option("maxFilesPerTrigger", "2").load()
              .writeStream.option("checkpointLocation", s"$root/cp_recover")
              .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
                ManifestTable.idempotentAppend(spark, dwd2, df
                  .filter(col("value").isNotNull)
                  .select(col("event_id"), col("event_type"), col("day"),
                    (col("value").cast("decimal(12,2)") * 100).cast(LongType).as("cents")), id)
                ()
              }
              .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
            try require(rq.awaitTermination(120000)) finally rq.stop()
          })
          def fp(df: org.apache.spark.sql.DataFrame) =
            df.agg(count(lit(1)).cast(LongType),
              coalesce(sum(xxhash64(col("event_id"), col("event_type"),
                col("day"), col("cents")).cast("decimal(38,0)")),
                lit(java.math.BigDecimal.ZERO))).head()
          t(s"l$i fingerprints")(graft.Parallel.run(
            () => fp(ManifestTable.read(spark, dwd)),
            () => fp(ManifestTable.read(spark, dwd2))))
          t(s"l$i final read")(ManifestTable.read(spark, dws)
            .groupBy(col("event_type"), col("day"))
            .agg(sum(col("cnt")).cast(LongType).as("n_events"))
            .count())
        }
      case "ivfpq" =>
        for (i <- 1 to 2) {
          t(s"i$i full")(SparkEntry.queries("q_sim_ivfpq")(spark, d).count())
        }
        val embs = Tables.embeddings(spark, d)
        val probes = embs.filter(col("vec_id") < 10)
        for (i <- 1 to 2) {
          t(s"i$i knn")(graft.ops.TextSim.knn(probes, embs, 5).count())
          t(s"i$i knn+ckpt")(graft.ops.TextSim.knn(probes, embs, 5)
            .select(col("qid"), col("nid")).localCheckpoint().count())
          t(s"i$i ivfCells refresh")(graft.ops.TextSim.ivfCells(spark, d).count())
          t(s"i$i pqCodes refresh")(graft.ops.TextSim.pqCodes(spark, d).count())
          t(s"i$i pqDists(probes)")(graft.ops.TextSim.pqDists(spark, d, probes).count())
        }
      case other => println(s"unknown phase target $other")
    }
    spark.stop()
  }
}
