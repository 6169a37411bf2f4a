package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench-regression tripwire's parse + compare rules
  * ([[BenchCanary]]): cpu/mem probe normalization direction, the
  * 2×-AND-0.25s trip condition, new-query and failed-query skips,
  * worst-first order, and the ≥30-pair box-shift median correction.
  */
class BenchCanarySpec extends AnyFunSuite {

  private val baselineJson =
    """{
      "sf": "sf0.1",
      "cpu_probe_s": 1.0,
      "stat": "min_of_3",
      "queries": {"q_a": 0.500, "q_b": 1.000, "q_floor": 0.080,
        "q01_pricing_summary": 0.250, "cdc_convert": 0.700}
    }"""

  test("parse: sf, probe and query mins come back — including the " +
    "TPC-H-numbered q01 style — and garbage returns None") {
    val b = BenchCanary.parse(baselineJson).get
    assert(b.sf == "sf0.1" && b.cpuProbeS == 1.0)
    assert(b.memProbeS.isEmpty, "pre-round-15-late baselines have no mem probe")
    assert(b.mins == Map("q_a" -> 0.5, "q_b" -> 1.0, "q_floor" -> 0.08,
      "q01_pricing_summary" -> 0.25, "cdc_convert" -> 0.7))
    assert(BenchCanary.parse("not json at all").isEmpty)
    assert(BenchCanary.parse("""{"queries":{"q_a":1.0}}""").isEmpty,
      "missing sf/probe must not parse")
  }

  test("parse: optional mem_probe_s comes back when present") {
    val b = BenchCanary.parse(
      """{"sf":"sf0.1","cpu_probe_s":1.0,"mem_probe_s":0.42,
        "queries":{"q_a":0.5}}""").get
    assert(b.memProbeS.contains(0.42))
  }

  test("same box: only a >2x AND >0.25s-excess min trips") {
    val b = BenchCanary.parse(baselineJson).get
    val regs = BenchCanary.regressions(b, Map(
      "q_a" -> 1.9, // 3.8x, excess 1.4 → trips
      "q_b" -> 1.9, // 1.9x → no (ratio rule)
      "q_floor" -> 0.2, // 2.5x but excess 0.12 → no (absolute floor)
      "cdc_convert" -> 0.71), runProbeS = 1.0).regs
    assert(regs.map(_._1) == Seq("q_a"))
    val (_, base, norm) = regs.head
    assert(base == 0.5 && math.abs(norm - 1.9) < 1e-9)
  }

  test("cpu_probe normalization: a faster run box scales times UP onto " +
    "the baseline box before comparing") {
    val b = BenchCanary.parse(baselineJson).get
    // run box 2x faster (probe 0.5 vs baseline 1.0): 0.6s here ≈ 1.2s
    // there → 2.4x of 0.5 → trips; the raw ratio (1.2x) would not
    assert(BenchCanary.regressions(b, Map("q_a" -> 0.6), 0.5)
      .regs.map(_._1) == Seq("q_a"))
    // symmetric: a 2x slower run box scales DOWN — 1.9s here ≈ 0.95s
    // there → not a regression
    assert(BenchCanary.regressions(b, Map("q_a" -> 1.9), 2.0).regs.isEmpty)
  }

  test("mem probe: the more forgiving probe ratio wins; one-sided mem " +
    "probes are ignored") {
    val b = BenchCanary.parse(
      """{"sf":"sf0.1","cpu_probe_s":1.0,"mem_probe_s":1.0,
        "queries":{"q_a":0.5}}""").get
    // box reads FASTER on ALU (0.5) but 2x slower on memory (2.0): a
    // 1.9 s min is 0.95 s on the baseline's memory vintage → no trip
    // (cpu-only normalization would read it as 3.8 s → trip)
    assert(BenchCanary.regressions(b, Map("q_a" -> 1.9), 0.5, Some(2.0))
      .regs.isEmpty)
    // same numbers but the baseline lacks mem_probe_s → cpu-only → trip
    val noMem = BenchCanary.parse(baselineJson).get
    assert(BenchCanary.regressions(noMem, Map("q_a" -> 1.9), 0.5, Some(2.0))
      .regs.nonEmpty)
    // and the forgiving direction is symmetric: mem says faster box,
    // cpu says slower — cpu's scale (the smaller) applies
    assert(BenchCanary.regressions(b, Map("q_a" -> 1.9), 2.0, Some(0.5))
      .regs.isEmpty)
  }

  test("mem probe: a zero/garbage baseline probe is ignored, not used " +
    "as a zero scale that would normalize every min to 0 forever") {
    val b = BenchCanary.parse(
      """{"sf":"sf0.1","cpu_probe_s":1.0,"mem_probe_s":0.0,
        "queries":{"q_a":0.5}}""").get
    assert(b.memProbeS.contains(0.0))
    // with an unguarded bm, probeScale would be 0 and 1.9 s would
    // normalize to 0.0 → no trip; the guard falls back to cpu-only → trip
    assert(BenchCanary.regressions(b, Map("q_a" -> 1.9), 1.0, Some(0.02))
      .regs.nonEmpty)
  }

  test("compared counts the pairs the shift gate counts: both sides " +
    "present AND positive") {
    val b = BenchCanary.parse(baselineJson).get
    val res = BenchCanary.regressions(b, Map(
      "q_a" -> 0.5, "q_new" -> 1.0, "q_gone" -> -1.0), 1.0)
    assert(res.compared == 1,
      "q_new absent from baseline and q_gone failed must not count")
  }

  test("box-shift: >=30 pairs, a box-wide uniform slowdown is divided " +
    "out; a single regressed query still trips above the shifted floor") {
    val qs = (1 to 30).map(i => s"q_x$i" -> 0.4)
    val base = BenchCanary.Baseline("sf0.1", 1.0, None,
      qs.toMap + ("q_bad" -> 0.4))
    // every query 2.6x slower (box-wide contention the probes missed),
    // q_bad 9x slower (a real plan regression)
    val run = qs.map { case (n, t) => n -> t * 2.6 }.toMap +
      ("q_bad" -> 3.6)
    val res = BenchCanary.regressions(base, run, 1.0)
    assert(math.abs(res.boxShift - 2.6) < 1e-9)
    assert(res.regs.map(_._1) == Seq("q_bad"),
      s"only the true regression may trip, got ${res.regs}")
    // without the correction every one of the 31 would have tripped
  }

  test("box-shift: never applied in the inflating direction (a faster-" +
    "than-probe box must not manufacture trips), and skipped below 30 " +
    "pairs") {
    val qs = (1 to 30).map(i => s"q_x$i" -> 0.4)
    val base = BenchCanary.Baseline("sf0.1", 1.0, None, qs.toMap)
    // run uniformly 2x FASTER than the probe predicts: shift floor at 1.0
    val fast = qs.map { case (n, t) => n -> t / 2 }.toMap
    val res = BenchCanary.regressions(base, fast, 1.0)
    assert(res.boxShift == 1.0 && res.regs.isEmpty)
    // 29 pairs: no correction computed
    val small = qs.take(29).map { case (n, t) => n -> t * 2.6 }.toMap
    val res2 = BenchCanary.regressions(
      BenchCanary.Baseline("sf0.1", 1.0, None, qs.take(29).toMap),
      small, 1.0)
    assert(res2.boxShift == 1.0 && res2.regs.size == 29,
      "below the pair floor the old cpu-only behavior holds exactly")
  }

  test("new queries (absent from baseline) and failed runs (t<=0) are " +
    "skipped; trips sort worst-first") {
    val b = BenchCanary.parse(baselineJson).get
    val regs = BenchCanary.regressions(b, Map(
      "q_new" -> 99.0, "q_a" -> 5.0, "q_b" -> 99.0, "q_gone" -> -1.0),
      1.0).regs
    assert(regs.map(_._1) == Seq("q_b", "q_a"),
      "q_b at 99x must sort ahead of q_a at 10x; q_new/q_gone skipped")
  }

  test("both-probe path end-to-end: a memory-vintage slowdown the cpu " +
    "probe can't see is normalized by the mem ratio, the residual by the " +
    "box-shift median, and a true regression still trips through both") {
    val qs = (1 to 30).map(i => s"q_x$i" -> 0.4)
    val base = BenchCanary.Baseline("sf0.1", 1.0, Some(0.03),
      qs.toMap + ("q_bad" -> 0.4))
    // run box: same ALU speed (cpu ratio 1.0) but 2x slower memory
    // (mem scale = 0.03/0.06 = 0.5 — times here HALVE onto the baseline
    // box) — plus a further 1.3x ambient residual neither probe saw;
    // q_bad additionally 6x (the one true plan regression).
    val run = qs.map { case (n, t) => n -> t * 2.0 * 1.3 }.toMap +
      ("q_bad" -> 0.4 * 2.0 * 1.3 * 6.0)
    val res = BenchCanary.regressions(base, run,
      runProbeS = 1.0, runMemProbeS = Some(0.06))
    // mem ratio (0.5) is more forgiving than cpu (1.0) → applied FIRST,
    // so the shift median reads the 1.3 ambient residual, not the full
    // 2.6 (a 2.6 shift here would mean the mem probe never engaged);
    // only q_bad survives both corrections
    assert(math.abs(res.boxShift - 1.3) < 1e-9, s"shift=${res.boxShift}")
    assert(res.regs.map(_._1) == Seq("q_bad"), res.regs.toString)
    assert(math.abs(BenchCanary.regressions(base, run, 1.0, None).boxShift
      - 2.6) < 1e-9, "without the mem probe the median must absorb 2.6x")
  }

  test("the committed baseline file parses, is at the bench sf, and " +
    "carries the mem probe (round 16+) so two-probe normalization engages") {
    val f = new java.io.File("BENCH_BASELINE_QUERIES.json")
    assert(f.isFile, "BENCH_BASELINE_QUERIES.json must be committed " +
      "(regenerate with tools/make_bench_baseline.py after a full bench)")
    val src = scala.io.Source.fromFile(f, "UTF-8")
    val txt = try src.mkString finally src.close()
    val b = BenchCanary.parse(txt).get
    assert(b.sf == "sf0.1" && b.cpuProbeS > 0 && b.mins.size > 200,
      s"baseline looks wrong: sf=${b.sf} probe=${b.cpuProbeS} n=${b.mins.size}")
    assert(b.memProbeS.exists(_ > 0),
      "the committed baseline must carry mem_probe_s — without it the " +
        "two-probe canary normalization is dormant (r15 verdict item 1)")
  }
}
