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
    assert(json.contains(""""q03":{"ratio":3.00}"""), json)
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
    assert(json.contains(""""q03":{"ratio":0.20}"""), json)
  }

  test("a recorded wide run-to-run band (third reference column) widens " +
    "that query's tolerance — 2x on a rel_mad=0.3 query does not flag, " +
    "the identical 2x on a tight query does; the 1.6 floor holds for " +
    "small rel_mad") {
    // q03 carries rel_mad 0.3 -> tol = 1 + 6*0.3 = 2.8; q04 rel_mad
    // 0.01 -> tol floors at 1.6; q05 has no third column -> 1.6
    val ref = "q01 1.0\nq02 2.0\nq03 4.0 0.3000\nq04 4.0 0.0100\nq05 4.0\n"
    val wide = Seq("q01" -> 1.0, "q02" -> 2.0, "q03" -> 8.0,
      "q04" -> 4.0, "q05" -> 4.0)
    val json1 = comp(wide, ref)
    assert(json1.contains(""""uniform":true"""), json1)
    val tight = Seq("q01" -> 1.0, "q02" -> 2.0, "q03" -> 4.0,
      "q04" -> 8.0, "q05" -> 4.0)
    val json2 = comp(tight, ref)
    assert(json2.contains(""""q04":{"ratio":2.00}"""), json2)
    val legacy = Seq("q01" -> 1.0, "q02" -> 2.0, "q03" -> 4.0,
      "q04" -> 4.0, "q05" -> 8.0)
    val json3 = comp(legacy, ref)
    assert(json3.contains(""""q05":{"ratio":2.00}"""), json3)
  }

  test("'# col3: tolerance' directive (cross-window-aware references): a " +
    "recorded-wide IO query at its observed contention ratio reads " +
    "UNIFORM on unchanged code, while a genuine 2x regression on a " +
    "tight query in the same run still flags") {
    // q130-class: recorded cross-window deviation gave tol 3.96; q04 is
    // tight (tol at the 1.6 floor); q05 has no col3 -> floor
    val ref = "# col3: tolerance\n" +
      "q01 1.0 1.6000\nq02 2.0 1.6000\nq03 4.0 3.9600\n" +
      "q04 4.0 1.6000\nq05 4.0\n"
    // a contended window: everything ~1.1x, the IO query at 3.3x — the
    // r12 driver-window shape that produced 9 false flags
    val contended = Seq("q01" -> 1.1, "q02" -> 2.2, "q03" -> 13.2,
      "q04" -> 4.4, "q05" -> 4.4)
    val json1 = comp(contended, ref)
    assert(json1.contains(""""uniform":true"""), json1)
    // same reference, a REAL single-query regression: 2x on the tight
    // query must still flag even though the wide query's band is open
    val regressed = Seq("q01" -> 1.0, "q02" -> 2.0, "q03" -> 4.0,
      "q04" -> 8.0, "q05" -> 4.0)
    val json2 = comp(regressed, ref)
    assert(json2.contains(""""uniform":false"""), json2)
    assert(json2.contains(""""q04":{"ratio":2.00}"""), json2)
    assert(!json2.contains("q03"), json2)
    // under the directive, col3 is NOT a rel-MAD: a sub-1.6 value
    // floors at 1.6 instead of collapsing the tolerance
    val refFloor = "# col3: tolerance\nq01 1.0 0.0100\nq02 1.0 1.6\n" +
      "q03 1.0 1.6\n"
    val j3 = comp(Seq("q01" -> 1.5, "q02" -> 1.0, "q03" -> 1.0), refFloor)
    assert(j3.contains(""""uniform":true"""), j3)
    val j4 = comp(Seq("q01" -> 1.7, "q02" -> 1.0, "q03" -> 1.0), refFloor)
    assert(j4.contains(""""q01":{"ratio":1.70}"""), j4)
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

  test("the outlier list is capped at the 12 worst deviations (a skewed " +
    "run must not balloon the bench line) while outliers_n keeps the " +
    "true count") {
    // 30 stable queries pin the scale at 1.0; 20 outliers at graded ratios
    val stable = (1 to 30).map(i => f"s$i%02d" -> 2.0)
    val out = (1 to 20).map(i => f"o$i%02d" -> (2.0 * (2.0 + i)))
    val ref = (stable ++ out.map { case (n, _) => n -> 2.0 })
      .map { case (n, v) => s"$n $v" }.mkString("\n")
    val json = comp(stable ++ out, ref)
    assert(json.contains(""""outliers_n":20"""), json)
    assert(json.contains(""""uniform":false"""), json)
    // the 12 WORST survive the cap: o20 (largest ratio) in, o01 dropped
    assert(json.contains("\"o20\":"), json)
    assert(!json.contains("\"o01\":"), json)
    assert("\"o\\d\\d\":".r.findAllIn(json).size == 12, json)
  }

  test("labels are JSON-escaped: a reference path or query name with a " +
    "quote or backslash must not make the bench line unparseable") {
    val json = Bench.comparabilityJson(
      Seq("q01" -> 1.0, "q02" -> 1.0, "q\"1\\" -> 3.0),
      "q01 1.0\nq02 1.0\nq\"1\\ 1.0\n".linesIterator,
      """C:\bench "ref".txt""")
    assert(json.contains("""C:\\bench \"ref\".txt"""), json)
    assert(json.contains("""{"q\"1\\":{"ratio":3.00}}"""), json)
    // and the escape helper round-trips control characters
    assert(Bench.esc("a\nb\tc") == "a\\nb\\tc")
  }

  test("a reference recorded at a different scale factor is refused — " +
    "cross-sf ratios are scale-curve artifacts, not regressions") {
    val ref = "# sfdir: /root/testdata/sf0.1\nq01 1.0\n"
    val skipped = Bench.comparabilityJson(Seq("q01" -> 5.0),
      ref.linesIterator, "ref", sfDir = "/root/testdata/sf0.001")
    assert(skipped.contains(""""skipped""""), skipped)
    assert(skipped.contains(""""scale":null"""), skipped)
    val matching = Bench.comparabilityJson(Seq("q01" -> 5.0),
      ref.linesIterator, "ref", sfDir = "/root/testdata/sf0.1")
    assert(matching.contains(""""scale":5.000"""), matching)
    // a directive-less reference stays comparable (old format)
    val legacy = Bench.comparabilityJson(Seq("q01" -> 5.0),
      "q01 1.0\n".linesIterator, "ref", sfDir = "/root/testdata/sf0.001")
    assert(legacy.contains(""""scale":5.000"""), legacy)
  }

  test("a calibration probe far above the reference's recorded probe " +
    "classifies the WINDOW as contended — machine-attributable evidence, " +
    "so a uniform contention spike self-attributes instead of costing a " +
    "judge re-run") {
    val ref = "# col3: tolerance\n" +
      "# calibration: cpu_s=0.50 io_s=2.00 threads=32\n" +
      "q01 1.0 1.6\nq02 2.0 1.6\n"
    // uniform 4x contention, probe reading 3x CPU / 4.5x IO
    val json = Bench.comparabilityJson(Seq("q01" -> 4.0, "q02" -> 8.0),
      ref.linesIterator, "ref", calib = Some((1.5, 9.0, 32)))
    assert(json.contains(""""contended":true"""), json)
    assert(json.contains(""""cpu_ratio":3.00"""), json)
    assert(json.contains(""""io_ratio":4.50"""), json)
    assert(json.contains(""""uniform":true"""), json)
    // a probe at a DIFFERENT thread count than the baseline's is not
    // comparable (mean-wall scales with threads past the core count):
    // refused with a reason, never misclassified
    val mismatch = Bench.comparabilityJson(Seq("q01" -> 4.0, "q02" -> 8.0),
      ref.linesIterator, "ref", calib = Some((1.5, 9.0, 64)))
    assert(mismatch.contains(""""calibration":{"skipped""""), mismatch)
    assert(!mismatch.contains("contended"), mismatch)
  }

  test("a calibration probe at the reference's level reads " +
    "contended=false — a genuine regression cannot hide behind the flag") {
    val ref = "# col3: tolerance\n# calibration: cpu_s=0.50 io_s=2.00\n" +
      "q01 1.0 1.6\nq02 2.0 1.6\nq03 1.0 1.6\n"
    val json = Bench.comparabilityJson(
      Seq("q01" -> 1.0, "q02" -> 2.0, "q03" -> 4.0),
      ref.linesIterator, "ref", calib = Some((0.55, 2.2, 32)))
    assert(json.contains(""""contended":false"""), json)
    assert(json.contains(""""uniform":false"""), json) // q03 still flags
    assert(json.contains(""""q03":"""), json)
  }

  test("no calibration directive in the reference (or no probe this " +
    "run) → no calibration object, and the rest is unchanged") {
    val ref = "q01 1.0\nq02 2.0\n"
    val withProbe = Bench.comparabilityJson(Seq("q01" -> 1.0, "q02" -> 2.0),
      ref.linesIterator, "ref", calib = Some((0.5, 2.0, 32)))
    assert(!withProbe.contains("calibration"), withProbe)
    val refCal = "# calibration: cpu_s=0.50 io_s=2.00\nq01 1.0\n"
    val noProbe = Bench.comparabilityJson(Seq("q01" -> 1.0),
      refCal.linesIterator, "ref")
    assert(!noProbe.contains("calibration"), noProbe)
    assert(noProbe.contains(""""scale":1.000"""), noProbe)
  }

  test("mid-window sub-probe interleaving: a probe is due on the 16-query " +
    "cadence, immediately after an anomalously slow query (3x its " +
    "reference median, 5 s floored), and never for ordinary queries " +
    "between cadence points") {
    // cadence
    assert(Bench.probeDue(16, 0.1, Some(0.1)))
    assert(!Bench.probeDue(15, 0.1, Some(0.1)))
    // slow-query trigger: q130's r14 driver reading (249 s vs median
    // 14.95) fires a probe right where the evidence is needed...
    assert(Bench.probeDue(1, 249.07, Some(14.95)))
    // ...but its normal quiet reading (11 s < 3x median) does not
    assert(!Bench.probeDue(1, 10.97, Some(14.95)))
    // the 5 s floor keeps sub-second jitter from probing constantly
    assert(!Bench.probeDue(1, 4.0, Some(0.5)))
    assert(Bench.probeDue(1, 5.5, Some(0.5)))
    // a query NEW since the reference (no median) never slow-triggers —
    // the cadence still covers it
    assert(!Bench.probeDue(1, 300.0, None))
    // nearest-probe attribution picks the reading closest in time
    val log = Seq((1000L, 1.0), (5000L, 3.0), (9000L, 1.1))
    assert(Bench.nearestProbe(1200L, log) === 1.0)
    assert(Bench.nearestProbe(4500L, log) === 3.0)
    assert(Bench.nearestProbe(999999L, log) === 1.1)
    // sub-probe readings are full-probe-equivalent: quarter iterations,
    // scaled x4 (pinned via the iteration constants, not wall time)
    assert(Bench.subCpuIters * 4 === Bench.mainCpuIters)
  }

  test("an outlier with a nearby hot probe reading self-attributes as " +
    "machine (probe >1.5x the reference cpu_s); one whose nearest probe " +
    "read clean stays machine:false — a regression cannot hide behind a " +
    "calm probe, and contention no longer costs a judge re-run") {
    val ref = "# col3: tolerance\n" +
      "# calibration: cpu_s=0.90 io_s=6.00 threads=32\n" +
      "q01 1.0 1.6\nq02 2.0 1.6\nq03 4.0 1.6\nq04 1.0 1.6\nq05 3.0 1.6\n"
    val cur = Seq("q01" -> 1.0, "q02" -> 2.0, "q03" -> 16.0,
      "q04" -> 1.0, "q05" -> 9.0)
    // q03's nearest sub-probe read 2.25 (2.5x the 0.90 baseline → hot);
    // q05's read 0.95 (1.06x → clean, so its 3x is NOT the machine)
    val json = Bench.comparabilityJson(cur, ref.linesIterator, "ref",
      calib = Some((0.92, 6.1, 32)),
      probeCpu = Map("q01" -> 0.91, "q02" -> 0.91, "q03" -> 2.25,
        "q04" -> 0.91, "q05" -> 0.95))
    assert(json.contains(""""uniform":false"""), json)
    assert(json.contains(
      """"q03":{"ratio":4.00,"probe_cpu_ratio":2.50,"machine":true}"""),
      json)
    assert(json.contains(
      """"q05":{"ratio":3.00,"probe_cpu_ratio":1.06,"machine":false}"""),
      json)
    // the window-level classification is independent: start-of-window
    // probe read clean here even though q03's mid-window stamp was hot —
    // exactly the r14 shape the per-query attribution exists for
    assert(json.contains(""""contended":false"""), json)
  }

  test("probe attribution degrades cleanly — always to the SAME object " +
    "shape (r15 ADVICE): no probe map → {ratio} alone; probe map but " +
    "thread-mismatched calibration → attribution suppressed along with " +
    "the window ratio (same comparability gate), never a bare number") {
    val ref = "# col3: tolerance\n" +
      "# calibration: cpu_s=0.90 io_s=6.00 threads=32\n" +
      "q01 1.0 1.6\nq02 2.0 1.6\nq03 4.0 1.6\nq04 1.0 1.6\nq05 3.0 1.6\n"
    val cur = Seq("q01" -> 1.0, "q02" -> 2.0, "q03" -> 16.0,
      "q04" -> 1.0, "q05" -> 3.0)
    val plain = Bench.comparabilityJson(cur, ref.linesIterator, "ref",
      calib = Some((0.92, 6.1, 32)))
    assert(plain.contains(""""q03":{"ratio":4.00}"""), plain)
    val mismatch = Bench.comparabilityJson(cur, ref.linesIterator, "ref",
      calib = Some((0.92, 6.1, 64)), probeCpu = Map("q03" -> 2.25))
    assert(mismatch.contains(""""calibration":{"skipped""""), mismatch)
    assert(mismatch.contains(""""q03":{"ratio":4.00}"""), mismatch)
    assert(!mismatch.contains("probe_cpu_ratio"), mismatch)
  }

  test("post-window adjudication: machineFlaggedFrom extracts exactly " +
    "the machine:true outliers from the emitted JSON; adjudicatedTotal " +
    "substitutes re-measures and leaves everything else; the final JSON " +
    "carries each re-measured outlier's seconds") {
    val ref = "# col3: tolerance\n" +
      "# calibration: cpu_s=0.90 io_s=6.00 threads=32\n" +
      "q01 1.0 1.6\nq02 2.0 1.6\nq03 4.0 1.6\nq04 1.0 1.6\nq05 3.0 1.6\n"
    val cur = Seq("q01" -> 1.0, "q02" -> 2.0, "q03" -> 16.0,
      "q04" -> 1.0, "q05" -> 9.0)
    val probe = Map("q01" -> 0.91, "q02" -> 0.91, "q03" -> 2.25,
      "q04" -> 0.91, "q05" -> 0.95)
    val json0 = Bench.comparabilityJson(cur, ref.linesIterator, "ref",
      calib = Some((0.92, 6.1, 32)), probeCpu = probe)
    // q03 machine:true, q05 machine:false → only q03 is re-run
    assert(Bench.machineFlaggedFrom(json0) === Seq("q03"), json0)
    // substitution arithmetic: q03's 16.0 replaced by its 4.1 re-measure
    val adj = Bench.adjudicatedTotal(cur, Map("q03" -> 4.1))
    assert(math.abs(adj - (1.0 + 2.0 + 4.1 + 1.0 + 9.0)) < 1e-9)
    // and with nothing re-measured the totals agree
    assert(Bench.adjudicatedTotal(cur, Map.empty) ===
      cur.map(_._2).sum)
    val json1 = Bench.comparabilityJson(cur, ref.linesIterator, "ref",
      calib = Some((0.92, 6.1, 32)), probeCpu = probe,
      remeasured = Map("q03" -> 4.1))
    assert(json1.contains(""""q03":{"ratio":4.00,"probe_cpu_ratio":2.50,""" +
      """"machine":true,"remeasured":4.10}"""), json1)
    assert(!json1.contains(""""q05":{"ratio":3.00,"probe_cpu_ratio":1.06,""" +
      """"machine":false,"remeasured""""), json1)
  }

  test("median: odd count takes the middle, even takes the upper middle, " +
    "empty is 0.0 (the failed-every-pass sentinel)") {
    assert(Bench.median(List(3.0, 1.0, 2.0)) === 2.0)
    assert(Bench.median(List(4.0, 1.0, 2.0, 3.0)) === 3.0)
    assert(Bench.median(Nil) === 0.0)
  }
}
