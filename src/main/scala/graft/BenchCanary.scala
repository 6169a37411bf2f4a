package graft

/** Bench-regression tripwire (round-15): compares a run's per-query MIN
  * pass times against the committed baseline mins
  * (`BENCH_BASELINE_QUERIES.json`, regenerated each round from the round's
  * BENCH detail via `tools/make_bench_baseline.py`), normalized across
  * driver-box vintages. A query whose normalized min exceeds 2× its
  * committed min is a REGRESSION the round must explain — the gate stops
  * being a round-end reading and becomes a per-run wire.
  *
  * Normalization (late round-15, after two same-tree runs on one box
  * tripped two DISJOINT sets of queries): box vintage has more than one
  * axis, and the probes bracket it from three directions —
  *
  *  1. `cpu_probe_s` (single-thread ALU, always present) — the round-13+
  *     bridge, validated to 1.8% across the r13/r14 driver boxes.
  *  2. `mem_probe_s` (16-thread aggregate memory bandwidth, round-15+) —
  *     boxes measured with IDENTICAL cpu_probe (~0.95 s) ran the
  *     32-thread snappy+parquet path up to 5× apart; scan/shuffle-bound
  *     queries live on this axis, which the ALU probe cannot see. Used
  *     only when BOTH the baseline and the run carry it; the scale is the
  *     more forgiving of the two probe ratios (benefit of the doubt — a
  *     tripwire must only fire when the PLAN got slower).
  *  3. Box-shift median correction: with ≥ [[MinPairsForShift]] compared
  *     queries, the median of the probe-normalized run/baseline ratios
  *     estimates whatever residual box slowdown the probes missed — a
  *     box-wide effect moves all ~286 ratios together, while a genuine
  *     plan regression moves only the touched queries and still stands
  *     out above the shifted floor. Only ever applied in the forgiving
  *     direction (shift > 1), never to inflate times; a code change that
  *     slows the WHOLE suite is the round-total gate's job, not the
  *     per-query wire's. Small comparisons (specs, SPARK_GRAFT_ONLY dev
  *     runs) skip the correction — a population statistic needs a
  *     population.
  *
  * Min-vs-min is deliberate: the min pass is the least load-polluted
  * statistic on both sides, so a trip means the PLAN got slower, not the
  * box got busy (the median-based comparisons needed manual re-benches to
  * rule load out).
  *
  * Pure functions over strings/maps — no filesystem, no Spark — so
  * BenchCanarySpec pins the parse + compare rules directly.
  */
object BenchCanary {

  /** Compared pairs below this count skip the box-shift correction. */
  val MinPairsForShift = 30

  final case class Baseline(
      sf: String, cpuProbeS: Double, memProbeS: Option[Double],
      mins: Map[String, Double])

  /** Tripwire outcome: regressions as (name, committed min, normalized
    * run min) worst-first, the box-shift median actually observed (1.0
    * when not computed or not applied), and the number of pairs that
    * actually compared (both sides present AND positive — the same
    * population the box-shift gate counts, so the artifact's `compared`
    * can never imply a correction that was skipped).
    */
  final case class Result(
      regs: Seq[(String, Double, Double)], boxShift: Double, compared: Int)

  /** Parse the committed baseline JSON. Hand-rolled (the classpath rule:
    * no libraries beyond Spark's), tolerant of whitespace: top-level
    * `"sf"`, `"cpu_probe_s"`, optional `"mem_probe_s"` (baselines
    * committed before round-15-late lack it), and a `"queries"` object
    * of name→min.
    */
  def parse(txt: String): Option[Baseline] = {
    val sfRe = """"sf"\s*:\s*"([^"]+)"""".r
    val probeRe = """"cpu_probe_s"\s*:\s*([0-9.Ee+\-]+)""".r
    val memRe = """"mem_probe_s"\s*:\s*([0-9.Ee+\-]+)""".r
    // `q...` covers both name families (q_dedup_*, q01_pricing_summary —
    // the first cut's `q_` prefix silently dropped the 23 TPC-H-numbered
    // queries from comparison, compared=263 of 286); cdc_ covers the
    // conversion probes. cpu_probe_s starts with "cp", not matched.
    val qRe = """"(q[^"]*|cdc_[^"]*)"\s*:\s*([0-9.Ee+\-]+)""".r
    for {
      sf <- sfRe.findFirstMatchIn(txt).map(_.group(1))
      probe <- probeRe.findFirstMatchIn(txt).map(_.group(1).toDouble)
    } yield Baseline(sf, probe,
      memRe.findFirstMatchIn(txt).map(_.group(1).toDouble),
      qRe.findAllMatchIn(txt)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap)
  }

  /** Regressions: queries whose min, mapped onto the baseline box (probe
    * ratio, then box-shift correction — see the object doc), exceeds
    * `factor ×` the committed min AND by at least 0.25 s of absolute
    * excess — the ratio alone would flag 0.05→0.12 s scheduling jitter on
    * the per-entry suite floor, while the absolute floor alone would miss
    * a 1.2× creep on a 10 s query (which the ratio rule correctly leaves
    * to the round-total gate). Queries absent from the baseline (new this
    * round) are skipped.
    */
  def regressions(
      base: Baseline,
      runMins: Map[String, Double],
      runProbeS: Double,
      runMemProbeS: Option[Double] = None,
      factor: Double = 2.0): Result = {
    val cpuScale = if (runProbeS > 0) base.cpuProbeS / runProbeS else 1.0
    val memScale = for {
      bm <- base.memProbeS
      rm <- runMemProbeS
      // BOTH sides must be positive: a baseline probe quantized to 0.0
      // (or a failed run sample) would otherwise zero probeScale and
      // normalize every min to 0.0 — a canary that reports ok forever
      if bm > 0 && rm > 0
    } yield bm / rm
    // the more forgiving (smaller) of the available probe ratios
    val probeScale = memScale.fold(cpuScale)(m => math.min(cpuScale, m))
    val pairs = runMins.iterator.collect {
      case (name, t) if t > 0 && base.mins.get(name).exists(_ > 0) =>
        (name, t, base.mins(name))
    }.toSeq
    val boxShift =
      if (pairs.size < MinPairsForShift) 1.0
      else {
        val ratios = pairs.map { case (_, t, b) => t * probeScale / b }.sorted
        val mid = ratios.size / 2
        val m =
          if (ratios.size % 2 == 1) ratios(mid)
          else (ratios(mid - 1) + ratios(mid)) / 2
        math.max(1.0, m) // forgiving direction only
      }
    val scale = probeScale / boxShift
    val regs = pairs.flatMap { case (name, t, b) =>
      val norm = t * scale
      if (norm > factor * b && norm - b > 0.25) Some((name, b, norm))
      else None
    }.sortBy { case (_, b, n) => -(n / b) }
    Result(regs, boxShift, pairs.size)
  }
}
