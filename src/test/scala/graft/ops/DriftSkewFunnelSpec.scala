package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Semantics + rounding-boundary audits for the round-9 monitoring and
  * curation operators: PSI drift, shuffle-key skew diagnostic, hashed
  * linear quality classifier, and the curation funnel report.
  *
  * The value-level gate is the DuckDB oracle; these pin the invariants
  * that make an oracle pass meaningful (PSI non-negativity, funnel
  * monotonicity, classifier recompute) and the determinism argument
  * (every emitted rounded double sits far from its rounding boundary).
  */
class DriftSkewFunnelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf001 = "/root/testdata/sf0.01"
  private val dirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  test("stats_drift: bins partition the corpus, every PSI contribution " +
    "is non-negative and finite, and rounded values are boundary-safe") {
    for (dir <- dirs) {
      val rows = EventStats.qStatsDrift(spark, dir).collect()
      assert(rows.nonEmpty && rows.length <= 10, s"$dir: ${rows.length} bins")
      val total = Tables.events(spark, dir).count()
      assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum == total,
        s"$dir: bin counts do not partition the $total events")
      rows.foreach { r =>
        val psi = r.getDouble(3)
        // (p-q) and ln(p/q) always share a sign, so each term is >= 0
        assert(psi >= 0.0 && !psi.isNaN && !psi.isInfinite,
          s"$dir bin ${r.getInt(0)}: psi $psi")
        // rounding-boundary distance of the pre-rounded value at 6 dp
        val scaled = psi * 1e6
        assert(math.abs(scaled - math.rint(scaled)) < 0.499,
          s"$dir bin ${r.getInt(0)}: psi $psi sits on a rounding boundary")
      }
    }
  }

  test("skew_diagnose: profiles both candidate keys in one pass with " +
    "exact integer metrics") {
    val rows = EventOps.qSkewDiagnose(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.map(_._1).toSeq == Seq("event_type", "user_id"))
    val total = Tables.events(spark, sf001).count()
    rows.foreach { case (name, nKeys, nRows, maxCnt, avgX100, skewX100, salt) =>
      assert(nRows == total, s"$name: profiled $nRows of $total rows")
      assert(maxCnt * 100 >= avgX100, s"$name: max below average")
      assert(avgX100 == nRows * 100 / nKeys)
      assert(skewX100 == maxCnt * 100 * nKeys / nRows)
      assert(salt == (maxCnt * nKeys + nRows - 1) / nRows && salt >= 1)
    }
  }

  test("quality_classifier: raw score recomputes from md5 hashing " +
    "per-token; margin is exact truncating integer division; keep is " +
    "the integer sign") {
    val rows = TextModels.qQualityClassifier(spark, sf001).collect()
    val docs = Tables.documents(spark, sf001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == docs.size)
    def weight(w: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 6), 16) % 4096 % 101 - 50
    }
    var signs = Set.empty[Boolean]
    rows.foreach { r =>
      val (id, nWords, raw, margin, keep) = (r.getLong(0), r.getInt(1),
        r.getLong(2), r.getLong(3), r.getInt(4))
      val toks = docs(id).split(" ", -1)
      assert(toks.length == nWords)
      assert(toks.map(weight).sum == raw, s"doc $id: raw score mismatch")
      // Spark DIV and DuckDB // both truncate toward zero, like Java /
      assert(margin == raw * 10000 / (nWords * 50L),
        s"doc $id: margin mismatch")
      assert(keep == (if (raw > 0) 1 else 0))
      signs += raw > 0
    }
    // the classifier separates: both classes occur on this corpus
    assert(signs == Set(true, false))
  }

  test("bpe_train: the merge table equals a local replay of the whole " +
    "greedy trajectory, and the chosen pair count never increases") {
    val rows = TextModels.qBpeTrain(spark, sf001).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(rows.length == TextModels.BpeMerges)
    // local replay: word freqs -> greedy argmax merge loop
    var vocab: Map[Vector[String], Long] = Tables.documents(spark, sf001)
      .selectExpr("explode(split(text, ' ')) AS w").collect()
      .map(_.getString(0)).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) =>
        w.split("").toVector -> ws.length.toLong
      }
    def applyMerge(syms: Vector[String], pa: String, pb: String) =
      syms.foldLeft(Vector.empty[String]) { (acc, s) =>
        if (acc.nonEmpty && acc.last == pa && s == pb)
          acc.init :+ (acc.last + s)
        else acc :+ s
      }
    val local = (1 to TextModels.BpeMerges).map { step =>
      val counts = collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.sliding(2).filter(_.length == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + f
        }
      }
      val ((pa, pb), cnt) = counts.toSeq
        .minBy { case ((a, b), c) => (-c, a, b) }
      vocab = vocab.groupBy { case (syms, _) => applyMerge(syms, pa, pb) }
        .map { case (s, m) => s -> m.values.sum }
      (step, pa, pb, cnt)
    }
    assert(rows.toSeq == local, s"engine ${rows.toSeq} vs local $local")
    rows.map(_._4).sliding(2).foreach {
      case Array(prev, next) => assert(next <= prev,
        "greedy argmax counts must be non-increasing")
      case _ => ()
    }
  }

  test("bpe_encode: per-doc token counts equal the local model applied " +
    "to every word; merging always compresses") {
    val rows = TextModels.qBpeEncode(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // local model: replay training to the final per-word token count
    var vocab: Map[Vector[String], Long] = Tables.documents(spark, sf001)
      .selectExpr("explode(split(text, ' ')) AS w").collect()
      .map(_.getString(0)).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) =>
        w.split("").toVector -> ws.length.toLong
      }
    def applyMerge(syms: Vector[String], pa: String, pb: String) =
      syms.foldLeft(Vector.empty[String]) { (acc, s) =>
        if (acc.nonEmpty && acc.last == pa && s == pb)
          acc.init :+ (acc.last + s)
        else acc :+ s
      }
    (1 to TextModels.BpeMerges).foreach { _ =>
      val counts = collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.sliding(2).filter(_.length == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + f
        }
      }
      val ((pa, pb), _) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
      vocab = vocab.groupBy { case (syms, _) => applyMerge(syms, pa, pb) }
        .map { case (s, m) => s -> m.values.sum }
    }
    val tok = vocab.keys.map(syms => syms.mkString -> syms.length.toLong).toMap
    val docs = Tables.documents(spark, sf001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == docs.size)
    rows.foreach { case (id, nWords, nChars, nTokens, ratio) =>
      val ws = docs(id).split(" ", -1).filter(_.nonEmpty)
      assert(nWords == ws.length)
      assert(nChars == ws.map(_.length.toLong).sum)
      assert(nTokens == ws.map(tok).sum, s"doc $id token count")
      assert(nTokens <= nChars && nTokens >= nWords)
      assert(ratio == nChars * 100 / nTokens && ratio >= 100)
    }
  }

  test("events_forecast: trailing-MA forecast equals a local integer " +
    "replay; only full-history days are emitted") {
    val rows = EventOps.qEventsForecast(spark, sf001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    val daily = Tables.events(spark, sf001)
      .selectExpr("event_type", "CAST(to_date(ts) AS STRING) AS day",
        "CAST(round(value * 100) AS BIGINT) AS cents").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(t => (t._1, t._2)).map { case (k, v) => k -> v.map(_._3).sum }
    val local = daily.keys.groupBy(_._1).toSeq.flatMap { case (tpe, keys) =>
      val days = keys.map(_._2).toSeq.sorted
      days.zipWithIndex.collect { case (d, i) if i >= 7 =>
        val hist = days.slice(i - 7, i).map(x => daily((tpe, x))).sum
        (tpe, d, daily((tpe, d)), hist / 7, math.abs(daily((tpe, d)) - hist / 7))
      }
    }.sortBy(t => (t._1, t._2))
    assert(rows.toSeq == local, s"engine ${rows.length} vs local ${local.length}")
  }

  test("graph_labelprop: 3-round synchronous LPA equals a local replay " +
    "with the same min-label tie-break; community sizes partition nodes") {
    val rows = GraphOps.qGraphLabelprop(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty)
    // rebuild the co-purchase graph locally
    val small = Tables.part(spark, sf001).where("p_size <= 10")
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val li = Tables.lineitem(spark, sf001)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter(t => small(t._2)).distinct.toSeq
    val edges = li.groupBy(_._1).values.toSeq.flatMap { ps =>
      val s = ps.map(_._2).distinct.sorted
      for (a <- s; b <- s if a < b) yield (a, b)
    }.toSet
    val nbrs = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (n, vs) => n -> vs.map(_._2) }
    var labels: Map[Long, Long] = nbrs.keys.map(n => n -> n).toMap
    (1 to 3).foreach { _ =>
      labels = nbrs.map { case (n, vs) =>
        val counts = vs.map(labels).groupBy(identity)
          .map { case (l, o) => l -> o.size }
        n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val local = labels.values.groupBy(identity)
      .map { case (l, m) => (l, m.size.toLong) }.toSeq.sorted
    assert(rows.toSeq == local)
    assert(rows.map(_._2).sum == nbrs.size, "communities must partition nodes")
  }

  test("embed_whiten: certification flags are 1 with real margin — the " +
    "local whitened covariance sits orders under the 1e-3 tolerance, " +
    "and UNwhitened data would fail it") {
    for (dir <- dirs) {
      val row = Similarity.qEmbedWhiten(spark, dir).collect().head
      assert(row.getString(0) == "zca_cholesky" && row.getInt(1) == 8)
      assert(row.getInt(3) == 1 && row.getInt(4) == 1,
        s"$dir: certification flags must hold: $row")
      // local replay: quantize, fit covariance, Cholesky-whiten, measure
      val xs = Tables.embeddings(spark, dir)
        .selectExpr("transform(slice(embedding, 1, 8), " +
          "x -> cast(round(cast(x AS DOUBLE) * 1000) AS BIGINT))")
        .collect().map(_.getSeq[Long](0).toArray.map(_ / 1000.0))
      val n = xs.length.toDouble
      val mean = (0 until 8).map(d => xs.map(_(d)).sum / n).toArray
      def cov(data: Array[Array[Double]], m: Array[Double]) =
        Array.tabulate(8, 8)((i, j) =>
          data.map(v => (v(i) - m(i)) * (v(j) - m(j))).sum / n)
      val c = cov(xs, mean)
      val l = Array.ofDim[Double](8, 8)
      for (i <- 0 until 8; j <- 0 to i) {
        val s = c(i)(j) - (0 until j).map(k => l(i)(k) * l(j)(k)).sum
        if (i == j) l(i)(i) = math.sqrt(s + 1e-9) else l(i)(j) = s / l(j)(j)
      }
      val w = Array.ofDim[Double](8, 8)
      for (i <- 0 until 8) {
        w(i)(i) = 1.0 / l(i)(i)
        for (j <- 0 until i)
          w(i)(j) = -(j until i).map(k => l(i)(k) * w(k)(j)).sum / l(i)(i)
      }
      val ys = xs.map(v => Array.tabulate(8)(i =>
        (0 until 8).map(j => w(i)(j) * (v(j) - mean(j))).sum))
      val cy = cov(ys, new Array[Double](8))
      val devW = (for (i <- 0 until 8; j <- 0 until 8)
        yield math.abs(cy(i)(j) - (if (i == j) 1.0 else 0.0))).max
      assert(devW < 1e-5, s"$dir: whitened dev $devW has no margin")
      // the tolerance separates: raw (unwhitened) covariance fails it
      val devRaw = (for (i <- 0 until 8; j <- 0 until 8)
        yield math.abs(c(i)(j) - (if (i == j) 1.0 else 0.0))).max
      assert(devRaw > 1e-3, s"$dir: raw dev $devRaw would pass — vacuous")
    }
  }

  test("stats_profile: every column's stats recompute from a local " +
    "profile of the same corpus") {
    val rows = TextAnalysis.qStatsProfile(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getLong(5)))
    val docs = Tables.documents(spark, sf001)
      .selectExpr("lang", "source",
        "concat('b', least(floor(n_chars / 100), 9))").collect()
      .map(r => Map("lang" -> r.getString(0), "source" -> r.getString(1),
        "len_bucket" -> r.getString(2)))
    assert(rows.map(_._1).toSeq == Seq("lang", "len_bucket", "source"))
    rows.foreach { case (colName, nRows, nNulls, nDistinct, topV, topC) =>
      val vals = docs.map(_(colName))
      assert(nRows == vals.length && nNulls == vals.count(_ == null))
      val byV = vals.filter(_ != null).groupBy(identity)
        .map { case (v, o) => v -> o.length }
      assert(nDistinct == byV.size)
      val (expTopV, expTopC) = byV.toSeq.minBy { case (v, c) => (-c, v) }
      assert(topV == expTopV && topC == expTopC,
        s"$colName: top ($topV, $topC) vs local ($expTopV, $expTopC)")
    }
  }

  test("events_pattern: journey counts equal a local replay of the " +
    "view→click→purchase state machine with error resets") {
    val rows = EventOps.qEventsPattern(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val ev = Tables.events(spark, sf001)
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id",
        "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val W = 86400000000L
    val local = ev.groupBy(_._1).flatMap { case (uid, es) =>
      var (vt, ct, m) = (-1L, -1L, 0L)
      es.sortBy(e => (e._2, e._3)).foreach { case (_, ts, _, tp) =>
        tp match {
          case "view" => vt = ts; ct = -1L
          case "click" if vt >= 0 && ts - vt <= W => ct = ts
          case "purchase" if ct >= 0 && ts - ct <= W =>
            m += 1; vt = -1L; ct = -1L
          case "error" => vt = -1L; ct = -1L
          case _ => ()
        }
      }
      if (m > 0) Some(uid -> m) else None
    }
    assert(rows == local, s"engine $rows vs local $local")
    assert(rows.nonEmpty, "pattern must match on this corpus")
  }

  test("curate_funnel: stages chain (n_out becomes the next n_in), " +
    "counts are monotone, and the head stages really drop documents") {
    for (dir <- dirs) {
      val rows = TextAnalysis.qCurateFunnel(spark, dir).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
      assert(rows.map(_._1).toSeq == (1 to 5))
      assert(rows.head._3 == Tables.documents(spark, dir).count())
      rows.foreach { case (no, stage, nIn, nOut, dropX100) =>
        assert(nOut <= nIn, s"$dir $stage: grew")
        assert(dropX100 == (nIn - nOut) * 100 / nIn)
      }
      rows.sliding(2).foreach {
        case Array((_, _, _, prevOut, _), (_, stage, nIn, _, _)) =>
          assert(nIn == prevOut, s"$dir: chain broken at $stage")
        case _ => ()
      }
      // the allowlist and length window are never vacuous on this corpus
      assert(rows(0)._4 < rows(0)._3, s"$dir: lang stage dropped nothing")
      assert(rows(1)._4 < rows(1)._3, s"$dir: length stage dropped nothing")
    }
  }
}
