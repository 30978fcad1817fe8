package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness's timing contract — no SparkSession needed.
  * The load-bearing property: a THROWING query must surface as an
  * explicit error, never as a near-zero timing sample that flatters
  * the total (the silent-pass failure mode VERDICT r5 flagged). */
class BenchTimingSuite extends AnyFunSuite {

  test("timeOnce: success yields the elapsed seconds, failure yields the error") {
    val ok = Bench.timeOnce(() => Thread.sleep(10))
    assert(ok.isRight && ok.toOption.get >= 0.010)
    val bad = Bench.timeOnce(() => throw new IllegalStateException("boom"))
    assert(bad == Left("IllegalStateException: boom"))
  }

  test("timeOnce: a null exception message doesn't mask the error class") {
    val bad = Bench.timeOnce(() => throw new NullPointerException())
    assert(bad.isLeft && bad.swap.toOption.get.startsWith("NullPointerException"))
  }

  test("minOfK: agreeing samples take the min without a third pass") {
    var calls = 0
    val samples = Iterator(Right(1.0), Right(1.1))
    val r = Bench.minOfK(() => { calls += 1; samples.next() })
    assert(r == Right(1.0) && calls == 2)
  }

  test("minOfK: a >2x disagreement above 0.5s triggers exactly one tiebreak pass") {
    var calls = 0
    val samples = Iterator(Right(3.0), Right(1.0), Right(0.9))
    val r = Bench.minOfK(() => { calls += 1; samples.next() })
    assert(r == Right(0.9) && calls == 3)
  }

  test("minOfK: sub-0.5s jitter never pays a third pass even at >2x ratio") {
    var calls = 0
    val samples = Iterator(Right(0.4), Right(0.1))
    val r = Bench.minOfK(() => { calls += 1; samples.next() })
    assert(r == Right(0.1) && calls == 2)
  }

  test("minOfK: a slow query (min > 2s) escalates to k=3 even when the samples agree") {
    // both samples could have been inflated by the same host stall — the
    // expensive lines earn a third pass so per-query figures are
    // steady-state, not just the total
    var calls = 0
    val samples = Iterator(Right(4.3), Right(4.1), Right(2.2))
    val r = Bench.minOfK(() => { calls += 1; samples.next() })
    assert(r == Right(2.2) && calls == 3)
  }

  test("minOfK: agreeing samples at exactly the 2s boundary stay at k=2") {
    var calls = 0
    val samples = Iterator(Right(2.0), Right(2.1))
    val r = Bench.minOfK(() => { calls += 1; samples.next() })
    assert(r == Right(2.0) && calls == 2)
  }

  test("minOfK: ANY thrown sample fails the query — min-of-k never averages over brokenness") {
    // first sample throws: short-circuit, no more samples
    var calls = 0
    val r1 = Bench.minOfK { () => calls += 1; Left("X: broke") }
    assert(r1 == Left("X: broke") && calls == 1)
    // second sample throws after a fast success: still an error, and the
    // fast success must NOT leak out as the query's timing
    val s2 = Iterator(Right(0.001), Left("Y: broke"))
    assert(Bench.minOfK(() => s2.next()) == Left("Y: broke"))
    // tiebreak sample throws
    val s3 = Iterator[Either[String, Double]](Right(3.0), Right(1.0), Left("Z: broke"))
    assert(Bench.minOfK(() => s3.next()) == Left("Z: broke"))
  }

  test("minOfK: a sample >3x its committed reference escalates to a third pass") {
    // both early samples inside one host-stall window: the committed
    // bench_detail reference says this query runs in 0.2s, so a 0.9s
    // running min is a stall, not a timing — resample
    var calls = 0
    val samples = Iterator(Right(0.9), Right(0.95), Right(0.21))
    val r = Bench.minOfK(() => { calls += 1; samples.next() }, ref = Some(0.2))
    assert(r == Right(0.21) && calls == 3)
  }

  test("minOfK: still stalled after the third pass earns exactly one fourth") {
    var calls = 0
    val samples = Iterator(Right(0.9), Right(0.95), Right(0.91), Right(0.22))
    val r = Bench.minOfK(() => { calls += 1; samples.next() }, ref = Some(0.2))
    assert(r == Right(0.22) && calls == 4)
  }

  test("minOfK: four samples is the cap — a genuine regression must surface") {
    var calls = 0
    val samples = Iterator(Right(0.9), Right(0.95), Right(0.91), Right(0.93))
    val r = Bench.minOfK(() => { calls += 1; samples.next() }, ref = Some(0.2))
    assert(r == Right(0.9) && calls == 4,
      "a persistent 4.5x-of-reference timing is a regression, not a stall")
  }

  test("minOfK: the reference rule has a 0.3s floor — sub-noise timings never escalate") {
    var calls = 0
    val samples = Iterator(Right(0.2), Right(0.21))
    val r = Bench.minOfK(() => { calls += 1; samples.next() }, ref = Some(0.05))
    assert(r == Right(0.2) && calls == 2)
  }

  test("loadRefs: parses the committed detail for the matching sf, ignores other sfs") {
    val f = java.nio.file.Files.createTempFile("graft-bench-detail", ".json")
    val json = """{"metric":"total","value":12.3,"unit":"sec","n_queries":2,""" +
      """"n_errors":0,"errors":{},"queries":{"q_a":1.234,"q_b":0.560},"sf":"/root/testdata/sf0.1"}"""
    java.nio.file.Files.write(f, json.getBytes("UTF-8"))
    val refs = Bench.loadRefs(f.toString, "/root/testdata/sf0.1")
    assert(refs == Map("q_a" -> 1.234, "q_b" -> 0.56))
    assert(Bench.loadRefs(f.toString, "/root/testdata/sf0.01").isEmpty,
      "a detail recorded at another sf must not gate this run's samples")
    assert(Bench.loadRefs("/nonexistent/detail.json", "/root/testdata/sf0.1").isEmpty)
  }
}
