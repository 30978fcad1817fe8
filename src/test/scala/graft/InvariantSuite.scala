package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Prop, Test => SCTest}
import graft.multimodal.Multimodal
import graft.ops.{Dedup, TextSim}

/** Dataset-level invariants (SURVEY.md §5.3) plus ScalaCheck properties on
  * the pure kernels. */
class InvariantSuite extends SparkSuite {
  import spark.implicits._

  private def check(p: Prop): Unit =
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(50), p).passed)

  test("tumbling windows partition events: window counts sum to total") {
    val total = Tables.events(spark, sf0001).count()
    val winSum = streaming.StreamOps.tumblingDaily(Tables.events(spark, sf0001))
      .agg(sum("cnt")).as[Long].head()
    assert(winSum == total)
  }

  test("sliding 1d/6h windows assign each event exactly 4 windows") {
    val total = Tables.events(spark, sf0001).count()
    val winSum = streaming.StreamOps.slidingDaily(Tables.events(spark, sf0001))
      .agg(sum("cnt")).as[Long].head()
    assert(winSum == 4 * total)
  }

  test("session windows partition events per user") {
    val total = Tables.events(spark, sf0001).count()
    val sessSum = streaming.StreamOps.sessionPerUser(Tables.events(spark, sf0001))
      .agg(sum("len")).as[Long].head()
    assert(sessSum == total)
  }

  test("systematic sampling: every stratum sampled, picks bounded by the stride count") {
    val out = SparkEntry.queries("q_sample_systematic")(spark, sf0001)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(out.keySet.size == 5, s"all 5 strata must be sampled: ${out.keySet}")
    out.foreach { case (et, n) =>
      // ~50 stride crossings per stratum; a heavy row crossing several
      // boundaries emits once, so picks are in (0, 51]
      assert(n >= 1 && n <= 51, s"$et picked $n rows, expected 1..51")
    }
  }

  test("linear attribution conserves revenue to the cent") {
    val credited = SparkEntry.queries("q_attribution_linear")(spark, sf0001)
      .agg(sum("credited_cents")).as[Long].head()
    val purchases = Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase")
      .agg(sum((col("value").cast("decimal(12,2)") * 100).cast("long"))).as[Long].head()
    assert(credited == purchases,
      s"credits $credited must equal purchase cents $purchases exactly")
  }

  test("topk(3) per nation is a subset of topk(5)") {
    def topk(k: Int) = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("c_nationkey")).orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.customer(spark, sf0001)
        .select(col("c_custkey"), row_number().over(w).as("rn"))
        .filter(col("rn") <= k).select("c_custkey").as[Long].collect().toSet
    }
    assert(topk(3).subsetOf(topk(5)))
  }

  test("pagerank is bit-identical under any input partitioning and bounded by total mass") {
    import graft.ops.Graph
    // pseudo-random 40-vertex multigraph, deterministic seed
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(200)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong,
      (rnd.nextInt(9) + 1).toLong))
      .filter { case (a, b, _) => a != b }
      .toDF("src", "dst", "w")
    val verts = (0L until 40L).toDF("id")
    def run(parts: Int): Map[Long, Long] =
      Graph.pagerank(verts.repartition(parts), edges.repartition(parts), 3)
        .as[(Long, Long)].collect().toMap
    val r1 = run(1)
    val r7 = run(7)
    assert(r1 == r7, "integer fixed-point ranks must not depend on partitioning")
    // truncating division only loses mass: total <= 10^12, and every
    // vertex keeps at least (almost) the teleport floor
    assert(r1.values.sum <= 1000000000000L)
    val floor = 15L * (1000000000000L / 40) / 100
    assert(r1.values.forall(_ >= floor - 1), r1.values.min.toString)
  }

  test("dedup is idempotent") {
    val once = Tables.documents(spark, sf0001).dropDuplicates("text")
    val twice = once.dropDuplicates("text")
    assert(once.count() == twice.count())
  }

  test("union-all count additivity") {
    val ev = Tables.events(spark, sf0001)
    val a = ev.filter(col("event_type") === "click")
    val b = ev.filter(col("event_type") === "view")
    assert(a.unionByName(b).count() == a.count() + b.count())
  }

  test("minhash-LSH candidates + exact verify reproduce the exact near-dup pairs") {
    val near = SparkEntry.queries("q_dedup_near")(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect().toSet
    val lsh = SparkEntry.queries("q_dedup_minhash")(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(near == lsh)
    assert(near.nonEmpty) // fixtures plant near-dup pairs
  }

  test("simhash candidates cover the planted high-similarity pairs") {
    val near = SparkEntry.queries("q_dedup_near")(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect()
      .filter(p => p._3 * 10 >= 9 * p._4).map(p => (p._1, p._2)).toSet // J >= 0.9
    val sim = SparkEntry.queries("q_dedup_simhash")(spark, sf0001)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val covered = near.count(sim.contains)
    assert(near.isEmpty || covered.toDouble / near.size >= 0.5,
      s"simhash covered $covered of ${near.size} planted pairs")
  }

  test("banded hamming LSH == all-pairs scan on random signature corpora") {
    // Pigeonhole banding (13 banks × <=5 bits) is provably recall-exact at
    // hd <= 12; this pins the implementation to the proof. Random corpus +
    // planted near-pairs at every distance 0..16 so both sides of the
    // threshold are exercised (13..16 must NOT surface; 0..12 must).
    val rnd = new scala.util.Random(42)
    val base = Seq.tabulate(300)(i => (i.toLong, rnd.nextLong()))
    val planted = Seq.tabulate(17) { hd =>
      val (id, sig) = base(rnd.nextInt(base.size))
      val flips = rnd.shuffle((0 until 64).toList).take(hd)
      (1000L + hd, flips.foldLeft(sig)((s, b) => s ^ (1L << b)))
    }
    val sigs = (base ++ planted).toDF("doc_id", "sig")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long)].collect().toSet
    val naive = pairs(Dedup.simhashPairsNaive(sigs))
    val banded = pairs(Dedup.simhashPairsBanded(sigs))
    assert(banded == naive,
      s"banded\\naive=${(banded -- naive).take(5)} naive\\banded=${(naive -- banded).take(5)}")
    // the hd<=12 planted pairs guarantee the comparison is non-vacuous
    assert(naive.size >= 13, s"only ${naive.size} true pairs in corpus")
  }

  test("IVF kNN recall >= 0.6 vs exact kNN") {
    val exact = SparkEntry.queries("q_sim_knn")(spark, sf0001)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val ivf = SparkEntry.queries("q_sim_ivf")(spark, sf0001)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = exact.count(ivf.contains).toDouble / exact.size
    assert(recall >= 0.6, s"IVF recall $recall")
  }

  test("bucketPrefixMax: empty input and single bucket degenerate correctly") {
    val empty = ops.StreamingAnalogs.bucketPrefixMax(
      Seq.empty[(Long, Long)].toDF("b", "bmax"), 4)
    assert(empty.count() == 0)
    val single = ops.StreamingAnalogs.bucketPrefixMax(
      Seq((7L, 99L)).toDF("b", "bmax"), 4)
      .as[(Long, Option[Long])].collect().toSeq
    assert(single == Seq((7L, None)), s"single bucket must have NULL prevmax: $single")
  }

  test("bucketPrefixMax equals the naive global strict-prefix window (multi-super-bucket)") {
    val rnd = new scala.util.Random(42)
    // sparse, shuffled bucket ids across many super-buckets of size 4
    val rows = rnd.shuffle((0L until 300L).filter(_ => rnd.nextBoolean()).toList)
      .map(b => (b, rnd.nextLong(1000000L)))
    val perBucket = rows.toDF("b", "bmax")
    val got = ops.StreamingAnalogs.bucketPrefixMax(perBucket, 4)
      .as[(Long, Option[Long])].collect().toMap
    val sorted = rows.sortBy(_._1)
    var run = Option.empty[Long]
    sorted.foreach { case (b, v) =>
      assert(got(b) == run, s"bucket $b: got ${got(b)}, want $run")
      run = Some(run.fold(v)(math.max(_, v)))
    }
    assert(rows.size > 100 && got.size == rows.size)
  }

  test("q_agg_approx_quantile lossless precondition: 10x headroom over the largest fixture group") {
    // the declared query's oracle (= DuckDB quantile_disc) is exact ONLY
    // while every group stays under the GK sketch's accuracy parameter;
    // fail here, with headroom, before a fixture scale-up can turn the
    // oracle compare into a false failure
    val maxGroup = Tables.orders(spark, "/root/testdata/sf0.1")
      .groupBy(col("o_orderstatus")).count()
      .agg(max(col("count"))).as[Long].head()
    assert(maxGroup * 10 <= 1000000L,
      s"largest o_orderstatus group ($maxGroup rows at sf0.1) is within 10x of " +
        "q_agg_approx_quantile's accuracy=1000000 — raise accuracy or drop the oracle")
  }

  test("approx_percentile within 5% of the exact percentile") {
    val both = Tables.orders(spark, sf0001)
      .groupBy(col("o_orderstatus"))
      .agg(
        expr("approx_percentile(o_totalprice, 0.5D, 1000)").as("ap"),
        expr("percentile(o_totalprice, 0.5D)").as("ex"))
      .as[(String, Double, Double)].collect()
    both.foreach { case (st, ap, ex) =>
      assert(math.abs(ap - ex) / ex < 0.05, s"status $st: approx $ap vs exact $ex")
    }
  }

  test("multimodal: metadata extraction preserves ids, sizes and digests") {
    val docs = Tables.documents(spark, sf0001)
    val media = Multimodal.syntheticMedia(spark, docs)
    val meta = Multimodal.extractMeta(media)
    assert(meta.count() == docs.count())
    // nbytes == octet_length(text) (ASCII fixture text)
    val viaSql = docs.select(col("doc_id"), octet_length(col("text")).cast("long").as("nbytes"))
      .as[(Long, Long)].collect().toMap
    val viaMeta = meta.select(col("media_id"), col("nbytes")).as[(Long, Long)].collect().toMap
    assert(viaSql == viaMeta)
    // digest matches Spark's builtin sha2 over the same bytes
    val sqlDigest = docs.select(col("doc_id"), sha2(col("text").cast("binary"), 256).as("d"))
      .as[(Long, String)].collect().toMap
    val metaDigest = meta.select(col("media_id"), col("digest")).as[(Long, String)].collect().toMap
    assert(sqlDigest == metaDigest)
  }

  test("multimodal frame sampling emits n frames per payload") {
    val docs = Tables.documents(spark, sf0001).limit(20)
    val frames = Multimodal.sampleFrames(Multimodal.syntheticMedia(spark, docs), 4)
    val counts = frames.groupBy("media_id").count().select("count").as[Long].collect()
    assert(counts.forall(_ == 4))
  }

  test("resizeImage: real raster rescale — exact target dims, no invented colors, in-budget passthrough") {
    def png(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def decode(p: Array[Byte]) =
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
    // exact closed-form dims on a non-square downscale (31x23 -> 8x5)
    val src = png(31, 23, (x, y) => x * 31 + y * 7919)
    val out = decode(Multimodal.resizeImage(src, 8))
    assert(out.getWidth == 8 && out.getHeight == 23 * 8 / 31)
    // nearest-neighbor invents NO colors: every output pixel is a source
    // pixel (the property an interpolating or byte-subsampling fake lacks)
    val srcColors = (for (y <- 0 until 23; x <- 0 until 31)
      yield (x * 31 + y * 7919) & 0xffffff).toSet
    for (y <- 0 until out.getHeight; x <- 0 until out.getWidth)
      assert(srcColors.contains(out.getRGB(x, y) & 0xffffff),
        s"output pixel ($x,$y) must be some source pixel")
    // a constant raster downscales to the same constant
    val flat = decode(Multimodal.resizeImage(png(20, 20, (_, _) => 0x123456), 8))
    for (y <- 0 until flat.getHeight; x <- 0 until flat.getWidth)
      assert((flat.getRGB(x, y) & 0xffffff) == 0x123456)
    // an image already inside the budget passes through byte-identical
    val small = png(8, 6, (x, y) => x + y)
    assert(Multimodal.resizeImage(small, 8).toSeq == small.toSeq)
  }

  test("pure kernels: resize/frameSample/decodeDims properties") {
    check(Prop.forAll { (bytes: Array[Byte]) =>
      val r = Multimodal.resize(bytes, 32)
      r.length <= 32 || bytes.length <= 32
    })
    check(Prop.forAll { (bytes: Array[Byte]) =>
      bytes.isEmpty || Multimodal.frameSample(bytes, 3).size == 3
    })
    check(Prop.forAll { (bytes: Array[Byte]) =>
      val (w1, h1) = Multimodal.decodeDims(bytes)
      val (w2, h2) = Multimodal.decodeDims(bytes)
      w1 == w2 && h1 == h2 && w1 >= 16 && h1 >= 16
    })
  }

  test("resize/frameSample closed forms match the q_multimodal_* oracle arithmetic") {
    // the DuckDB oracles replay these stubs as closed-form integer
    // arithmetic on octet_length; pin the equivalence so a stub edit
    // can't silently diverge from the shipped oracle SQL
    check(Prop.forAll { (bytes: Array[Byte]) =>
      val n = bytes.length
      val expected = if (n <= 64) n else math.min(64, (n - 1) / (n / 64) + 1)
      Multimodal.resize(bytes, 64).length == expected
    })
    check(Prop.forAll { (bytes: Array[Byte]) =>
      val n = bytes.length.toLong
      val expected =
        if (n == 0) Seq.empty
        else (0 until 4).map { k =>
          val start = n * k / 4
          (math.min(start + 16, n) - start).toInt
        }
      Multimodal.frameSample(bytes, 4).map(_.length) == expected
    })
  }

  test("containment reference property: engine matches a pure-Scala computation") {
    def shingleSet(text: String): Set[String] =
      text.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    val texts = Seq(
      // snippet verbatim inside a longer page (containment 1, Jaccard low)
      "a b c d e" -> "a b c d e x y z w v u t s r q p o n m l",
      // identical docs
      "p q r s t u" -> "p q r s t u",
      // disjoint
      "m n o p" -> "x y z w",
      // partial overlap below the 0.9 bar
      "a b c d e f g h i j" -> "a b c d x f g h i j"
    )
    texts.zipWithIndex.foreach { case ((t1, t2), i) =>
      val s1 = shingleSet(t1); val s2 = shingleSet(t2)
      val inter = (s1 & s2).size; val minsz = math.min(s1.size, s2.size)
      val docs = Seq((1L, t1), (2L, t2)).toDF("doc_id", "text")
      val got = ops.Dedup.containPairs(docs)
        .as[(Long, Long, Long, Long)].collect().toSeq
      val expected =
        if (inter > 0 && inter * 10 >= 9 * minsz)
          Seq((1L, 2L, inter.toLong, minsz.toLong)) else Seq.empty
      assert(got == expected, s"case $i: got $got want $expected")
    }
  }

  test("jaccard reference property: engine matches a pure-Scala computation") {
    def shingleSet(text: String): Set[String] =
      text.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    val texts = Seq(
      "a b c d e f g h" -> "a b c d e f g x",
      "p q r s t u" -> "p q r s t u",
      "m n o p" -> "x y z w"
    )
    texts.zipWithIndex.foreach { case ((t1, t2), i) =>
      val s1 = shingleSet(t1); val s2 = shingleSet(t2)
      val inter = (s1 & s2).size; val union = (s1 | s2).size
      val docs = Seq((1L, t1), (2L, t2)).toDF("doc_id", "text")
      val got = Dedup.jaccardPairs(Dedup.shingles(docs))
        .as[(Long, Long, Long, Long)].collect().toSeq
      val expected =
        if (inter * 10 >= 8 * union) Seq((1L, 2L, inter.toLong, union.toLong)) else Seq.empty
      assert(got == expected, s"case $i")
    }
  }

  // ---------------------------------------------------- 10× scale probes
  //
  // Empirical backing for the 100 TB claims on the dedup family: the
  // candidate structures must grow LINEARLY in corpus size under the
  // generative model real corpora follow (vocabulary grows with the
  // corpus — Heaps' law — and duplication arrives at a fixed RATE), not
  // quadratically as a fixed-vocabulary worst case would. A planted-dup
  // corpus at 1× and 10× makes the growth exponent measurable.

  /** Deterministic synthetic corpus: `n` docs of 12 tokens each, token
    * ids drawn from a vocabulary proportional to n (Heaps-ish, so
    * cross-doc shingle collisions stay at a constant RATE as the corpus
    * grows), with every 20th doc a near-copy of its predecessor (the
    * planted 5% dup rate, preserved at every scale). */
  private def plantedCorpus(n: Int) = {
    val base = (0 until n).map { i =>
      if (i % 20 == 19 && i > 0) {
        // planted near-dup: predecessor's text with one token changed
        val prev = (0 until 12).map(j => s"t${EventGenSourceMix.mix((i - 1).toLong * 12 + j) % (n * 4)}")
        (i.toLong, (prev.dropRight(1) :+ "CHANGED").mkString(" "))
      } else
        (i.toLong, (0 until 12).map(j => s"t${EventGenSourceMix.mix(i.toLong * 12 + j) % (n * 4)}").mkString(" "))
    }
    base.toDF("doc_id", "text")
  }

  test("scale probe: shingle-index candidate pairs grow linearly at 10x corpus size") {
    // Σ C(f,2) over shingle doc-frequencies — the candidate count every
    // inverted-index dedup stage (near/minhash/prefix) is bounded by
    def candidates(n: Int): Long =
      Dedup.shingles(plantedCorpus(n)).groupBy(col("s")).agg(count(lit(1)).as("f"))
        .agg(sum(expr("f * (f - 1) DIV 2"))).as[Long].head()
    val c1 = candidates(1500)
    val c10 = candidates(15000)
    assert(c1 > 0, "the planted dups must produce candidates at 1x")
    val growth = c10.toDouble / c1
    assert(growth < 20.0,
      s"candidate growth must be ~linear (quadratic would be 100x): c1=$c1 c10=$c10 growth=$growth")
    assert(growth > 5.0, s"10x corpus should grow candidates ~10x, got $growth (c1=$c1 c10=$c10)")
  }

  test("scale probe: probe-sampled exact pair scan grows linearly at 10x corpus size") {
    // q_dedup_embed's ground-truth contract: exact pairs for a bounded
    // probe slice (v1 < 500) × the full corpus. The theta-join's pair
    // work is |probe| × n — linear in corpus size — where the unbounded
    // all-pairs form would be n²/2 (100x at 10x). Measure the executed
    // pair count directly on synthetic ids.
    def pairs(n: Int): Long = {
      val ids = spark.range(n).select(col("id"))
      ids.select(col("id").as("v1")).filter(col("v1") < 500)
        .join(ids.select(col("id").as("v2")), col("v1") < col("v2"))
        .count()
    }
    val p1 = pairs(1500)
    val p10 = pairs(15000)
    val growth = p10.toDouble / p1
    assert(growth < 20.0,
      s"probe-bounded pair scan must be ~linear (all-pairs would be ~100x): p1=$p1 p10=$p10 growth=$growth")
    assert(growth > 5.0, s"10x corpus should grow pairs ~10x, got $growth")
  }

  test("scale probe: IVF-routed candidate work grows linearly at 10x corpus size") {
    // q_sim_ivfpq's serving path: a probe touches only its nprobe cells'
    // members, so candidate rows per probe grow with CELL population
    // (~n/16), never with n² — the routing property the composed index
    // inherits from IVF. Measure the executed candidate count with a
    // synthetic 16-cell assignment at 1x and 10x.
    def cand(n: Int): Long = {
      val cells = spark.range(n).select(col("id").as("nid"), (col("id") % 16).as("cid"))
      val pc = spark.range(10).select(col("id").as("qid"),
        explode(expr("sequence(0, 3)")).as("x"))
        .select(col("qid"), ((col("qid") + col("x")) % 16).as("cid"))
      pc.join(cells, Seq("cid")).filter(col("qid") =!= col("nid")).count()
    }
    val c1 = cand(1600)
    val c10 = cand(16000)
    val growth = c10.toDouble / c1
    assert(growth < 20.0,
      s"cell-routed candidates must be ~linear (all-pairs would be ~100x): c1=$c1 c10=$c10 growth=$growth")
    assert(growth > 5.0, s"10x corpus should grow candidates ~10x, got $growth")
  }

  test("scale probe: LSH band-bucket histogram grows linearly per bucket at 10x") {
    // sign-LSH buckets (16 per band) must stay BALANCED as the corpus
    // grows: every bucket's load scales ~10x, so per-band candidate work
    // is governed by the band width — the documented scale knob — and no
    // bucket degenerates into an all-pairs hotspot
    def rnd(seed: Long): Double = (EventGenSourceMix.mix(seed) % 10000L) / 10000.0
    def vecs(n: Int): Seq[(Long, Array[Float])] = (0 until n).map { i =>
      val v =
        if (i % 20 == 19 && i > 0)
          Array.tabulate(64)(j => (rnd((i - 1).toLong * 64 + j) + 0.01 * rnd(i.toLong * 997 + j)).toFloat)
        else Array.tabulate(64)(j => rnd(i.toLong * 64 + j).toFloat)
      (i.toLong, v)
    }
    val planes = TextSim.lshPlanes.map(_.toArray)
    def sig(v: Array[Float]): Long =
      (0 until 64).map { p =>
        var s = 0d; var j = 0
        while (j < 64) { s += v(j).toDouble * planes(p)(j); j += 1 }
        if (s >= 0d) 1L << p else 0L
      }.reduce(_ | _)
    def bucketLoads(n: Int): Map[(Int, Long), Long] =
      vecs(n).map(x => sig(x._2))
        .flatMap(s => (0 until 16).map(b => (b, (s >>> (4 * b)) & 15L)))
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val l1 = bucketLoads(1500)
    val l10 = bucketLoads(15000)
    assert(l10.keySet.size <= 16 * 16, "bucket COUNT is fixed by the band width")
    // every bucket with meaningful 1x load grows ~10x, never ~100x
    val ratios = l1.collect { case (k, v1) if v1 >= 20 => l10.getOrElse(k, 0L).toDouble / v1 }
    assert(ratios.nonEmpty)
    assert(ratios.forall(r => r > 3.0 && r < 30.0),
      s"bucket loads must scale ~linearly; ratios=${ratios.toSeq.sorted.reverse.take(5)}...")
    val max1 = l1.values.max.toDouble
    val max10 = l10.values.max.toDouble
    assert(max10 / max1 < 20.0,
      s"the hottest bucket must grow ~linearly: $max1 -> $max10")
  }

  test("scale probe: semantic-dedup cell candidates grow linearly when cells scale with the corpus") {
    // q_dedup_semantic's candidate work is Σ C(n_c, 2) over cell
    // populations. With a FIXED quantizer that term is quadratic in n —
    // the documented contract is that the cell count is the scale knob
    // (~√n-to-∝n cells in production, 16 at fixture scale). This probe
    // runs the definitional assignment with k ∝ n and asserts the
    // candidate total and the hottest cell both grow ~10× at a 10×
    // corpus — the empirical form of that claim.
    def rnd(seed: Long): Double = (EventGenSourceMix.mix(seed) % 10000L) / 10000.0
    // unit-norm, zero-centered — the fixture embedding model (dot =
    // cosine); without the normalization argmax-dot is norm-dominated
    // and no quantizer balances
    def vecs(n: Int): IndexedSeq[Array[Double]] =
      (0 until n).map { i =>
        val v = Array.tabulate(64)(j => rnd(i.toLong * 64 + j) - 0.5)
        val nrm = math.sqrt(v.map(x => x * x).sum)
        v.map(_ / nrm)
      }
    def candidates(n: Int, k: Int): (Long, Long) = {
      val vs = vecs(n)
      val cents = vs.take(k)
      val loads = new Array[Long](k)
      vs.foreach { v =>
        var best = 0; var bestDot = Double.NegativeInfinity
        var c = 0
        while (c < k) {
          var s = 0d; var j = 0
          while (j < 64) { s += v(j) * cents(c)(j); j += 1 }
          if (s > bestDot) { bestDot = s; best = c }
          c += 1
        }
        loads(best) += 1
      }
      (loads.map(f => f * (f - 1) / 2).sum, loads.max)
    }
    val (c1, h1) = candidates(1500, 15)
    val (c10, h10) = candidates(15000, 150)
    assert(c1 > 0)
    val growth = c10.toDouble / c1
    assert(growth < 30.0,
      s"cell-candidate growth must be ~linear when k scales with n (quadratic would be 100x): c1=$c1 c10=$c10 growth=$growth")
    assert(growth > 3.0, s"10x corpus should grow candidates ~10x, got $growth")
    assert(h10.toDouble / h1 < 20.0,
      s"hottest cell must grow ~linearly: $h1 -> $h10")
  }

  test("k-fold assignment is balanced: every fold within binomial tolerance of 1/5") {
    val byFold = SparkEntry.queries("q_fold_assign")(spark, sf0001)
      .groupBy(col("fold")).agg(sum(col("n_docs")).as("n"))
      .as[(Long, Long)].collect().toMap
    val total = byFold.values.sum.toDouble
    assert(byFold.keySet == Set(0L, 1L, 2L, 3L, 4L), byFold.toString)
    // md5 draws are ~uniform: 4σ binomial tolerance at p = 1/5
    val p = 0.2
    val tol = 4 * math.sqrt(p * (1 - p) / total)
    byFold.foreach { case (f, n) =>
      val rate = n / total
      assert(math.abs(rate - p) <= tol, s"fold $f: rate $rate vs $p (tol $tol)")
    }
  }
}

/** splitmix64 for the scale probes (the same public mixer EventGenSource
  * uses), aliased to keep the test self-contained. */
private object EventGenSourceMix {
  def mix(i: Long): Long = {
    val m = graft.sources.EventGenSource.mix(i)
    if (m < 0) -m else m // non-negative for modulo-into-vocab use
  }
}
