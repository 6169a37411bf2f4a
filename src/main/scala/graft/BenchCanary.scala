package graft

/** Bench-regression tripwire (round-15): compares a run's per-query MIN
  * pass times against the committed baseline mins
  * (`BENCH_BASELINE_QUERIES.json`, regenerated each round from the round's
  * BENCH detail via `tools/make_bench_baseline.py`), normalized across
  * driver-box vintages by the cpu_probe bridge (BASELINE.md §calibration —
  * validated to 1.8% in round 14). A query whose normalized min exceeds
  * 2× its committed min is a REGRESSION the round must explain — the gate
  * stops being a round-end reading and becomes a per-run wire.
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

  final case class Baseline(
      sf: String, cpuProbeS: Double, mins: Map[String, Double])

  /** Parse the committed baseline JSON. Hand-rolled (the classpath rule:
    * no libraries beyond Spark's), tolerant of whitespace: top-level
    * `"sf"`, `"cpu_probe_s"`, and a `"queries"` object of name→min.
    */
  def parse(txt: String): Option[Baseline] = {
    val sfRe = """"sf"\s*:\s*"([^"]+)"""".r
    val probeRe = """"cpu_probe_s"\s*:\s*([0-9.Ee+\-]+)""".r
    // `q...` covers both name families (q_dedup_*, q01_pricing_summary —
    // the first cut's `q_` prefix silently dropped the 23 TPC-H-numbered
    // queries from comparison, compared=263 of 286); cdc_ covers the
    // conversion probes. cpu_probe_s starts with "cp", not matched.
    val qRe = """"(q[^"]*|cdc_[^"]*)"\s*:\s*([0-9.Ee+\-]+)""".r
    for {
      sf <- sfRe.findFirstMatchIn(txt).map(_.group(1))
      probe <- probeRe.findFirstMatchIn(txt).map(_.group(1).toDouble)
    } yield Baseline(sf, probe,
      qRe.findAllMatchIn(txt)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap)
  }

  /** Regressions: queries whose min, mapped onto the baseline box via
    * `t × (probe_base / probe_run)`, exceeds `factor ×` the committed min
    * AND by at least 0.25 s of absolute excess — the ratio alone would
    * flag 0.05→0.12 s scheduling jitter on the per-entry suite floor,
    * while the absolute floor alone would miss a 1.2× creep on a 10 s
    * query (which the ratio rule correctly leaves to the round-total
    * gate). Queries absent from the baseline (new this round) are
    * skipped. Returns (name, committed min, normalized run min) sorted
    * worst-first.
    */
  def regressions(
      base: Baseline,
      runMins: Map[String, Double],
      runProbeS: Double,
      factor: Double = 2.0): Seq[(String, Double, Double)] = {
    val scale = if (runProbeS > 0) base.cpuProbeS / runProbeS else 1.0
    runMins.iterator.flatMap { case (name, t) =>
      base.mins.get(name) match {
        case Some(b) if b > 0 && t > 0 =>
          val norm = t * scale
          if (norm > factor * b && norm - b > 0.25) Some((name, b, norm))
          else None
        case _ => None
      }
    }.toSeq.sortBy { case (_, b, n) => -(n / b) }
  }
}
