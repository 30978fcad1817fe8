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

  // --- passMin: pass-structured sampling (k full passes, per-query min
  // across passes) -------------------------------------------------------

  /** A scripted runner: per-query queues of samples, recording the global
    * order in which queries were sampled. */
  private def scripted(script: Map[String, Seq[Either[String, Double]]]) = {
    val qs = script.map { case (k, v) => k -> scala.collection.mutable.Queue(v: _*) }
    val order = scala.collection.mutable.ArrayBuffer.empty[String]
    val run = (n: String) => { order += n; qs(n).dequeue() }
    (run, order)
  }

  test("passMin: samples interleave by PASS — every query once before any query twice") {
    // the decorrelation property this design exists for: a's two samples
    // must be separated by b's work, never back-to-back
    val (run, order) = scripted(Map(
      "a" -> Seq(Right(1.0), Right(1.1)),
      "b" -> Seq(Right(0.2), Right(0.21))))
    val r = Bench.passMin(Seq("a", "b"), run)
    assert(order.toSeq == Seq("a", "b", "a", "b"))
    assert(r == Map("a" -> Right(1.0), "b" -> Right(0.2)))
  }

  test("passMin: agreeing samples stop after two passes") {
    val (run, order) = scripted(Map("a" -> Seq(Right(1.0), Right(1.1))))
    assert(Bench.passMin(Seq("a"), run) == Map("a" -> Right(1.0)))
    assert(order.size == 2)
  }

  test("passMin: a >2x disagreement above 0.5s earns exactly one third pass") {
    val (run, order) = scripted(Map("a" -> Seq(Right(3.0), Right(1.0), Right(0.9))))
    assert(Bench.passMin(Seq("a"), run) == Map("a" -> Right(0.9)))
    assert(order.size == 3)
  }

  test("passMin: sub-0.5s jitter never pays a third pass even at >2x ratio") {
    val (run, order) = scripted(Map("a" -> Seq(Right(0.4), Right(0.1))))
    assert(Bench.passMin(Seq("a"), run) == Map("a" -> Right(0.1)))
    assert(order.size == 2)
  }

  test("passMin: a slow query (min > 2s) escalates to a third pass even when agreeing") {
    val (run, order) = scripted(Map("a" -> Seq(Right(4.3), Right(4.1), Right(2.2))))
    assert(Bench.passMin(Seq("a"), run) == Map("a" -> Right(2.2)))
    assert(order.size == 3)
  }

  test("passMin: escalation passes re-run ONLY the still-suspicious queries") {
    // a settles after two passes; b (slow) alone joins pass 3
    val (run, order) = scripted(Map(
      "a" -> Seq(Right(0.3), Right(0.31)),
      "b" -> Seq(Right(4.0), Right(4.1), Right(2.5))))
    val r = Bench.passMin(Seq("a", "b"), run)
    assert(order.toSeq == Seq("a", "b", "a", "b", "b"))
    assert(r == Map("a" -> Right(0.3), "b" -> Right(2.5)))
  }

  test("passMin: a min >3x its committed reference escalates to a third pass") {
    val (run, order) = scripted(Map("a" -> Seq(Right(0.9), Right(0.95), Right(0.21))))
    val r = Bench.passMin(Seq("a"), run, refs = Map("a" -> 0.2))
    assert(r == Map("a" -> Right(0.21)) && order.size == 3)
  }

  test("passMin: still stalled after the third pass earns exactly one fourth") {
    val (run, order) = scripted(Map(
      "a" -> Seq(Right(0.9), Right(0.95), Right(0.91), Right(0.22))))
    val r = Bench.passMin(Seq("a"), run, refs = Map("a" -> 0.2))
    assert(r == Map("a" -> Right(0.22)) && order.size == 4)
  }

  test("passMin: four passes is the cap — a genuine regression must surface") {
    val (run, order) = scripted(Map(
      "a" -> Seq(Right(0.9), Right(0.95), Right(0.91), Right(0.93))))
    val r = Bench.passMin(Seq("a"), run, refs = Map("a" -> 0.2))
    assert(r == Map("a" -> Right(0.9)) && order.size == 4,
      "a persistent 4.5x-of-reference timing is a regression, not a stall")
  }

  test("passMin: the reference rule has a 0.3s floor — sub-noise timings never escalate") {
    val (run, order) = scripted(Map("a" -> Seq(Right(0.2), Right(0.21))))
    val r = Bench.passMin(Seq("a"), run, refs = Map("a" -> 0.05))
    assert(r == Map("a" -> Right(0.2)) && order.size == 2)
  }

  test("passMin: ANY thrown sample fails the query and drops it from later passes") {
    // throw on pass 1: no second sample ever taken for that query, and a
    // healthy neighbor is unaffected
    val (run1, order1) = scripted(Map(
      "bad" -> Seq(Left("X: broke")),
      "ok" -> Seq(Right(0.1), Right(0.11))))
    val r1 = Bench.passMin(Seq("bad", "ok"), run1)
    assert(r1 == Map("bad" -> Left("X: broke"), "ok" -> Right(0.1)))
    assert(order1.count(_ == "bad") == 1)
    // throw on pass 2 after a fast pass-1 success: still an error — the
    // fast success must NOT leak out as the query's timing
    val (run2, _) = scripted(Map("a" -> Seq(Right(0.001), Left("Y: broke"))))
    assert(Bench.passMin(Seq("a"), run2) == Map("a" -> Left("Y: broke")))
    // throw on an escalation pass
    val (run3, _) = scripted(Map(
      "a" -> Seq[Either[String, Double]](Right(3.0), Right(1.0), Left("Z: broke"))))
    assert(Bench.passMin(Seq("a"), run3) == Map("a" -> Left("Z: broke")))
  }

  test("passMin: onSample sees every sample with its pass number") {
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    val (run, _) = scripted(Map("a" -> Seq(Right(3.0), Right(1.0), Right(0.9))))
    Bench.passMin(Seq("a"), run,
      onSample = (p, n, _) => seen += ((p, n)))
    assert(seen.toSeq == Seq((1, "a"), (2, "a"), (3, "a")))
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

  test("mergeRefs: per-query min against the previous committed reference (monotone refs)") {
    val prev = Map("q_a" -> 0.48, "q_b" -> 2.00, "q_gone" -> 1.00)
    val fresh = Map("q_a" -> 1.14, "q_b" -> 1.50, "q_new" -> 0.30)
    val merged = Bench.mergeRefs(fresh, prev)
    // a stall-inflated fresh figure never loosens the reference
    assert(merged("q_a") == 0.48)
    // a genuinely faster run ratchets the reference down
    assert(merged("q_b") == 1.50)
    // new queries enter at their measured figure; removed queries drop
    assert(merged("q_new") == 0.30)
    assert(!merged.contains("q_gone"))
  }

  test("refSfOf: reads the recorded sf so a dev-scale run can refuse the overwrite") {
    val f = java.nio.file.Files.createTempFile("graft-bench-detail", ".json")
    java.nio.file.Files.write(f,
      """{"metric":"total","value":1.0,"queries":{},"sf":"/root/testdata/sf0.1"}"""
        .getBytes("UTF-8"))
    assert(Bench.refSfOf(f.toString).contains("/root/testdata/sf0.1"))
    assert(Bench.refSfOf("/nonexistent/detail.json").isEmpty)
  }
}
