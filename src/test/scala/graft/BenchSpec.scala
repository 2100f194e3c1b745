package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins Bench's comparability classification (VERDICT r9 item 4): the
  * machine-visible replacement for the README's "check uniform scaling
  * before calling a regression" discipline. The two failure modes it
  * exists to separate: host contention (every query scales by ~the same
  * factor → uniform, whatever the total) and a real regression or a
  * wrong core count (a few queries blow past the uniform scale →
  * outliers named). */
class BenchSpec extends AnyFunSuite {

  private def comp(medians: Seq[(String, Double)], ref: String): String =
    Bench.comparabilityJson(medians, ref.linesIterator, "ref")

  test("uniform contention scaling (every query ~1.4x) reports the scale " +
    "and uniform=true with zero outliers") {
    val ref = "# comment\nq01 1.0\nq02 2.0\nq03 4.0\n"
    val cur = Seq("q01" -> 1.4, "q02" -> 2.9, "q03" -> 5.5)
    val json = comp(cur, ref)
    assert(json.contains(""""uniform":true"""), json)
    assert(json.contains(""""outliers":{}"""), json)
    assert(json.contains(""""scale":1.4"""), json)
  }

  test("a single regressed query is a named outlier against the uniform " +
    "scale even when the run is otherwise contention-inflated") {
    val ref = "q01 1.0\nq02 2.0\nq03 4.0\nq04 1.0\nq05 3.0\n"
    // everything 1.3x except q03 at 3x
    val cur = Seq("q01" -> 1.3, "q02" -> 2.6, "q03" -> 12.0,
      "q04" -> 1.3, "q05" -> 3.9)
    val json = comp(cur, ref)
    assert(json.contains(""""uniform":false"""), json)
    assert(json.contains(""""q03":3.00"""), json)
    assert(!json.contains("q02"), json)
  }

  test("an immaterial blip (both sides under 0.5 s) never flags, however " +
    "large its ratio — sub-second jitter is noise, not signal") {
    val ref = "q01 0.05\nq02 2.0\nq03 4.0\n"
    val cur = Seq("q01" -> 0.4, "q02" -> 2.0, "q03" -> 4.0)
    val json = comp(cur, ref)
    assert(json.contains(""""uniform":true"""), json)
  }

  test("a query FASTER than the uniform scale by >1.6x also flags — a " +
    "silently-broken fast failure or a plan change both deserve a look") {
    val ref = "q01 1.0\nq02 2.0\nq03 4.0\nq04 2.0\nq05 1.0\n"
    val cur = Seq("q01" -> 1.0, "q02" -> 2.0, "q03" -> 0.8,
      "q04" -> 2.0, "q05" -> 1.0)
    val json = comp(cur, ref)
    assert(json.contains(""""uniform":false"""), json)
    assert(json.contains(""""q03":0.20"""), json)
  }

  test("queries missing from the reference (new since it was recorded) " +
    "and zero-median failures are excluded, not misclassified") {
    val ref = "q01 1.0\nq02 2.0\n"
    val cur = Seq("q01" -> 1.0, "q02" -> 2.0, "q99_new" -> 50.0,
      "q98_failed" -> 0.0)
    val json = comp(cur, ref)
    assert(json.contains(""""uniform":true"""), json)
  }

  test("an empty or non-overlapping reference reports scale null rather " +
    "than inventing a comparison") {
    assert(comp(Seq("q01" -> 1.0), "# nothing\n")
      .contains(""""scale":null"""))
    assert(comp(Seq("q01" -> 1.0), "q77 3.0\n")
      .contains(""""scale":null"""))
  }

  test("a single-pass run carries the first-run-JIT caveat in the JSON; " +
    "median-of-N runs do not") {
    val ref = "q01 1.0\n"
    val json1 = Bench.comparabilityJson(Seq("q01" -> 1.0),
      ref.linesIterator, "ref", singlePass = true)
    assert(json1.contains(""""note":"single pass"""), json1)
    val json3 = Bench.comparabilityJson(Seq("q01" -> 1.0),
      ref.linesIterator, "ref")
    assert(!json3.contains(""""note""""), json3)
  }

  test("median: odd count takes the middle, even takes the upper middle, " +
    "empty is 0.0 (the failed-every-pass sentinel)") {
    assert(Bench.median(List(3.0, 1.0, 2.0)) === 2.0)
    assert(Bench.median(List(4.0, 1.0, 2.0, 3.0)) === 3.0)
    assert(Bench.median(Nil) === 0.0)
  }
}
