package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Mechanized driver-side-materialization audit: every `.collect()` /
  * `.head()` in main source is pinned here with its justification. The
  * r9 verdict re-adjudicated these sites by hand ("the 5 collect() sites
  * in ops are fixed-size models — verified again"); this spec makes that
  * check a failing test instead. A new collect that isn't a FIXED-SIZE
  * model (k-bounded, domain-bounded, or a one-row digest) is exactly the
  * kind of operator that stops being distributed at 100 TB — add it here
  * ONLY with a scaladoc justification at the site.
  *
  * Pinned sites (justifications live in the scaladoc at each location):
  *  - Dedup: anchor-signature one-row digest; PPJoin token-frequency
  *    dictionary (vocabulary-bounded broadcast model).
  *  - EventOps: 2× `max(ts)` one-row sentinels for stream fixtures;
  *    survival life-table (calendar-bounded).
  *  - GraphOps: one-row graph-order digest.
  *  - Similarity: trained-index models (centroids, codebooks, anchors —
  *    all fixed-size by construction) and the k-bounded k-center loop.
  *  - TextAnalysis: BPE merge-step winner (one row per round).
  *  - convert/AvroToParquetJob: per-file fallback column list (schema-
  *    width-bounded).
  */
class CollectAuditSpec extends AnyFunSuite {
  private val root = new java.io.File("src/main/scala/graft")

  private def sites(sub: String): Map[String, Int] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".scala")) Seq(f) else Nil
    def occurrences(src: String, lit: String): Int =
      src.split(java.util.regex.Pattern.quote(lit), -1).length - 1
    walk(new java.io.File(root, sub)).map { f =>
      val src = new String(java.nio.file.Files.readAllBytes(f.toPath))
      f.getName -> (occurrences(src, ".collect()") +
        occurrences(src, ".head()"))
    }.filter(_._2 > 0).toMap
  }

  test("ops collect()/head() sites match the pinned fixed-size models") {
    val expected = Map(
      "Dedup.scala" -> 2,
      // the round-16 family split moved sites with their queries, total
      // unchanged (6 event + 1 text): EventOps keeps qEventsPagerank's
      // |types|²-bounded edge aggregate (the walk iterates the
      // dimension-scale model driver-side); EventStreaming holds the
      // 1-row max-ts fixture heads and qStreamLateData's fused
      // per-batch ledger/watermark scalar rows (each a single-row
      // aggregate, the fixed-size-model shape); EventStats holds
      // qEventsSurvival's 12-row life table
      "EventOps.scala" -> 1,
      "EventStreaming.scala" -> 4,
      "EventStats.scala" -> 1,
      "GraphOps.scala" -> 1,
      // Similarity: +2 for qAnnMmr's K·10 shortlist + K·90 integer-sim
      // collects (fixed by Anchors, the trained-model discipline)
      "Similarity.scala" -> 10,
      // the BPE-train iterative merge's per-round 1-row argmax
      "TextModels.scala" -> 1)
    assert(sites("ops") == expected,
      s"collect-site drift: found ${sites("ops")}, pinned $expected — " +
        "a NEW site needs a fixed-size-model justification in scaladoc " +
        "and a pin here")
  }

  test("conversion path has exactly the schema-bounded fallback collect") {
    assert(sites("convert") == Map("AvroToParquetJob.scala" -> 1),
      sites("convert").toString)
  }

  test("avro reader collects only file-count-bounded control metadata") {
    // schemaFingerprints: per-file (path, fingerprint) pairs; the batch
    // status report: one FileStatus per input file. Both are control-
    // plane metadata sized by the FILE LIST, never row data.
    assert(sites("avro") == Map("AvroCdcReader.scala" -> 2),
      sites("avro").toString)
  }

  test("kernel/source/extension layers never materialize to the driver") {
    Seq("functions", "sources", "streaming", "plans", "cdc")
      .foreach { sub =>
        assert(sites(sub).isEmpty, s"$sub: ${sites(sub)}")
      }
  }

  test("every crossJoin carries an explicit broadcast side (1-row digests " +
    "and domain-bounded dimension tables only)") {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".scala")) Seq(f) else Nil
    val offenders = walk(root).flatMap { f =>
      val src = new String(java.nio.file.Files.readAllBytes(f.toPath))
      // a crossJoin whose argument is not an explicit broadcast(...) is
      // one optimizer estimate away from a full cartesian at scale
      src.split(java.util.regex.Pattern.quote(".crossJoin(")).drop(1)
        .filterNot(_.startsWith("broadcast("))
        .map(tail => s"${f.getName}: .crossJoin(${tail.take(40)}…")
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
