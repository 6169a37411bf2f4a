package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Local-reference replays for the scoring family added in round 9:
  * link prediction, bigram-LM perplexity, DSIR importance weights, and
  * the mutual-information feature audit. The value-level gate is the
  * DuckDB oracle; these specs prove the engine against an independent
  * in-JVM recompute and pin each operator's structural invariants.
  */
class ScoringOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // the co-purchase graph, rebuilt independently of GraphOps
  private lazy val graph: (Set[(Long, Long)], Map[Long, Long],
      Map[Long, Set[Long]]) = {
    val small = Tables.part(spark, dir).where("p_size <= 10")
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter(t => small(t._2)).distinct
    val edges = li.groupBy(_._1).values.flatMap { ps =>
      val s = ps.map(_._2).distinct.sorted
      for (i <- s.indices; j <- i + 1 until s.size) yield (s(i), s(j))
    }.toSet
    val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    (edges, deg, adj)
  }

  test("linkpred: candidate scores equal a local reference and every " +
    "quantized Adamic-Adar weight sits clear of its rounding boundary") {
    val rows = GraphOps.qGraphLinkpred(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty, "link prediction must yield candidates")
    val (edges, deg, adj) = graph
    val cap = 64L
    val aw = (2L to cap).map(d => d -> math.round(1e6 / math.log(d.toDouble)))
      .toMap
    val score = collection.mutable.Map.empty[(Long, Long), (Long, Long)]
    adj.foreach { case (w, ns) =>
      if (deg(w) <= cap) {
        val s = ns.toSeq.sorted
        for (i <- s.indices; j <- i + 1 until s.size) {
          val k = (s(i), s(j))
          val (cn, aa) = score.getOrElse(k, (0L, 0L))
          score(k) = (cn + 1, aa + aw(deg(w)))
        }
      }
    }
    val local = score.toSeq
      .filterNot { case ((u, v), _) => edges((u, v)) }
      .map { case ((u, v), (cn, aa)) =>
        (u, v, cn, aa, cn * 1000000L / (deg(u) + deg(v) - cn)) }
      .sortBy { case (u, v, cn, _, _) => (-cn, u, v) }
      .take(30)
    assert(rows.toSeq == local, s"engine ${rows.toSeq} vs local $local")
    // no candidate is an existing edge, and the per-term quantization
    // that makes the AA sum an exact integer is safely off every .5
    // boundary for all reachable center degrees
    rows.foreach { case (u, v, _, _, _) =>
      assert(!edges((u, v)), s"($u,$v) is already an edge")
    }
    (2L to cap).foreach { d =>
      val x = 1e6 / math.log(d.toDouble)
      val frac = math.abs(x - math.floor(x) - 0.5)
      assert(frac > 1e-3, s"degree $d AA weight $x too close to boundary")
    }
  }

  test("perplexity: per-doc bigram NLL equals a local add-one-smoothed " +
    "LM recompute") {
    val rows = TextModels.qTextPerplexity(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val bigs = docs.flatMap { case (id, ws) =>
      ws.dropRight(1).zip(ws.drop(1)).map(p => (id, p)) }
    val c2 = bigs.groupBy(_._2).map { case (k, v) => k -> v.size.toDouble }
    val c1 = bigs.groupBy(_._2._1)
      .map { case (k, v) => k -> v.size.toDouble }
    val v = docs.flatMap(_._2).distinct.length.toDouble
    val local = bigs.groupBy(_._1).map { case (id, bs) =>
      val nll = bs.map { case (_, (w1, w2)) =>
        -math.log((c2((w1, w2)) + 1) / (c1(w1) + v)) }
      (id, bs.length.toLong, round6(nll.sum / nll.length))
    }.toSeq.sortBy(_._1)
    assert(rows.length == local.length)
    rows.toSeq.zip(local).foreach { case ((d1, n1, x1), (d2, n2, x2)) =>
      assert(d1 == d2 && n1 == n2, s"row mismatch $d1/$d2")
      assert(math.abs(x1 - x2) <= 2e-6, s"doc $d1: nll $x1 vs $x2")
    }
    // smoothing sanity: every NLL is positive and bounded by ln of the
    // worst case (unseen bigram out of the richest context)
    val maxNll = math.log(c1.values.max + v)
    rows.foreach { case (id, _, x) =>
      assert(x > 0 && x <= maxNll, s"doc $id nll $x outside (0, $maxNll]")
    }
  }

  test("dsir: per-doc importance log-weights equal a local reference " +
    "and rank the target language above the rest on average") {
    val rows = TextModels.qCurateDsir(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ", -1)))
    val b = 256L
    def bucket(w: String): Long =
      java.lang.Long.parseLong(md5hex(w).substring(0, 6), 16) % b
    val toks = docs.flatMap { case (id, lang, ws) =>
      ws.map(w => (id, lang, bucket(w))) }
    val cr = toks.groupBy(_._3).map { case (k, v) => k -> v.size.toLong }
    val ct = toks.filter(_._2 == "en").groupBy(_._3)
      .map { case (k, v) => k -> v.size.toLong }
    val tr = cr.values.sum
    val tt = ct.values.sum
    val local = toks.groupBy(_._1).map { case (id, ts) =>
      val lw = ts.map { case (_, _, bk) =>
        math.log(((ct.getOrElse(bk, 0L) + 1).toDouble * (tr + b)) /
          ((cr(bk) + 1).toDouble * (tt + b))) }
      (id, ts.length.toLong, round6(lw.sum))
    }.toSeq.sortBy(_._1)
    assert(rows.length == local.length)
    rows.toSeq.zip(local).foreach { case ((d1, n1, x1), (d2, n2, x2)) =>
      assert(d1 == d2 && n1 == n2, s"row mismatch $d1/$d2")
      assert(math.abs(x1 - x2) <= 2e-6, s"doc $d1: logw $x1 vs $x2")
    }
    // the whole point of the estimator: target-slice docs score higher
    // per token than the rest on average
    val lang = docs.map(d => d._1 -> d._2).toMap
    val perTok = rows.map { case (id, n, x) => (lang(id), x / n) }
    val en = perTok.collect { case ("en", x) => x }
    val rest = perTok.collect { case (l, x) if l != "en" => x }
    assert(en.nonEmpty && rest.nonEmpty)
    assert(en.sum / en.length > rest.sum / rest.length,
      "target-language docs should carry higher mean importance weight")
  }

  test("mutual info: bucket contributions equal a local reference and " +
    "are non-negative (each is p(b) * KL(p(l|b) || p(l)))") {
    val rows = TextEval.qStatsMutualinfo(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, dir).select("lang", "text")
      .collect().map(r => (r.getString(0), r.getString(1).split(" ", -1)))
    val bCount = 64L
    def bucket(w: String): Long =
      java.lang.Long.parseLong(md5hex(w).substring(0, 6), 16) % bCount
    val cells = docs.flatMap { case (l, ws) => ws.map(w => (bucket(w), l)) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cb = cells.groupBy(_._1._1)
      .map { case (k, v) => k -> v.values.sum }
    val cl = cells.groupBy(_._1._2)
      .map { case (k, v) => k -> v.values.sum }
    val n = cells.values.sum.toDouble
    val local = cells.toSeq.groupBy(_._1._1).map { case (bk, cs) =>
      val mi = cs.map { case ((_, l), cbl) =>
        (cbl / n) * math.log((cbl * n) / (cb(bk) * cl(l)).toDouble) }
      (bk, cb(bk),
        BigDecimal(mi.sum).setScale(9, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
    }.toSeq.sortBy(_._1)
    assert(rows.length == local.length)
    rows.toSeq.zip(local).foreach { case ((b1, n1, x1), (b2, n2, x2)) =>
      assert(b1 == b2 && n1 == n2, s"bucket mismatch $b1/$b2")
      assert(math.abs(x1 - x2) <= 2e-9, s"bucket $b1: mi $x1 vs $x2")
    }
    rows.foreach { case (bk, _, mi) =>
      assert(mi >= -1e-9, s"bucket $bk MI contribution $mi negative")
    }
  }

  test("survival: gap life table equals a local replay and satisfies " +
    "the at-risk / exhaustiveness invariants") {
    val rows = EventStats.qEventsSurvival(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, dir)
      .select("user_id", "ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000,
        r.getLong(2)))
    val tend = ev.map(_._2).max
    // every event contributes exactly one subject: a completed gap to
    // the next event, or the censored open gap to the horizon
    val subjects = ev.groupBy(_._1).values.flatMap { es =>
      val ts = es.sortBy(e => (e._2, e._3)).map(_._2)
      val completed = ts.dropRight(1).zip(ts.drop(1))
        .map { case (a, b) => ((b - a) / 3600, true) }
      completed :+ (((tend - ts.last) / 3600, false))
    }.toSeq
    val byHour = subjects.groupBy(_._1).map { case (t, gs) =>
      (t, gs.count(_._2).toLong, gs.count(!_._2).toLong)
    }.toSeq.sortBy(_._1)
    val local = byHour.reverse
      .scanLeft((0L, 0L, 0L, 0L)) { case ((_, risk, _, _), (t, d, c)) =>
        (t, risk + d + c, d, c) }
      .drop(1).reverse
      .map { case (t, risk, d, c) => (t, risk, d, c, d * 1000000L / risk) }
    assert(rows.toSeq == local, s"engine ${rows.toSeq} vs local $local")
    // invariants: risk set shrinks with t, subjects partition exactly
    // (one per event), censored count equals the user count at the tail
    rows.sliding(2).foreach {
      case Array((t1, r1, _, _, _), (t2, r2, _, _, _)) =>
        assert(t1 < t2 && r1 > r2, s"risk set must shrink: $t1/$r1 -> $t2/$r2")
      case _ =>
    }
    assert(rows.map(r => r._3 + r._4).sum == ev.length,
      "every event contributes exactly one subject")
    assert(rows.map(_._4).sum == ev.map(_._1).distinct.length,
      "exactly one censored open gap per user")
    assert(rows.head._2 == ev.length, "hour-0 risk set is every subject")
    rows.foreach { case (t, _, _, _, h) =>
      assert(h >= 0 && h <= 1000000L, s"t=$t hazard $h out of range")
    }
  }

  test("sql recursive: the fixed-point Kaplan-Meier curve equals a " +
    "local sequential replay and is monotone non-increasing") {
    val rows = EventStats.qSqlRecursive(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty && rows.head._1 == 0L)
    val ev = Tables.events(spark, dir)
      .select("user_id", "ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000,
        r.getLong(2)))
    val tend = ev.map(_._2).max
    val subjects = ev.groupBy(_._1).values.flatMap { es =>
      val ts = es.sortBy(e => (e._2, e._3)).map(_._2)
      val completed = ts.dropRight(1).zip(ts.drop(1))
        .map { case (a, b) => (math.min((b - a) / 14400, 11L), true) }
      completed :+ ((math.min((tend - ts.last) / 14400, 11L), false))
    }.toSeq
    val byHour = subjects.groupBy(_._1).map { case (t, gs) =>
      t -> (gs.count(_._2).toLong, gs.count(!_._2).toLong)
    }
    // sequential fixed-point replay, truncating at every step like both
    // engines' integer division
    var risk = subjects.size.toLong
    var s = 0L
    val local = (0L to 11L).iterator.takeWhile(_ => risk > 0).map { t =>
      val (d, c) = byHour.getOrElse(t, (0L, 0L))
      s = if (t == 0) (risk - d) * 1000000000L / risk
          else s * (risk - d) / risk
      val row = (t, risk, d, c, s)
      risk = risk - d - c
      row
    }.toSeq
    assert(rows.toSeq == local, s"engine ${rows.take(3).toSeq}... vs " +
      s"local ${local.take(3)}...")
    rows.sliding(2).foreach {
      case Array((_, _, _, _, s1), (_, _, _, _, s2)) =>
        assert(s2 <= s1, "survival must be non-increasing")
      case _ =>
    }
    assert(rows.last._5 >= 0 && rows.head._5 <= 1000000000L)
  }

  test("variant: construct -> parse_json -> variant_get round-trip is " +
    "the identity against a raw-column recompute") {
    val rows = EventOps.qVariantJson(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, dir)
      .selectExpr("event_type",
        "CAST(get_json_object(props, '$.k') AS BIGINT) AS k",
        "CAST(round(value * 100) AS BIGINT) AS cents").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val local = ev.groupBy(_._1).map { case (t, es) =>
      (t, es.length.toLong, es.map(_._2).sum, es.map(_._3).sum,
        es.map(_._3 * 2).max,
        "OBJECT<cents: ARRAY<BIGINT>, meta: OBJECT<k: BIGINT, type: STRING>>")
    }.toSeq.sortBy(_._1)
    assert(rows.toSeq == local, s"engine ${rows.head} vs local ${local.head}")
  }

  test("stats corr: correlations equal a local exact-moment recompute " +
    "and are valid (|r| <= 1)") {
    val rows = Relational.qStatsCorr(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(rows.length == 6)
    val li = Tables.lineitem(spark, dir)
      .selectExpr("round(l_quantity) AS a", "round(l_extendedprice) AS b",
        "round(l_discount * 100) AS c", "round(l_tax * 100) AS d")
      .collect()
      .map(r => Array(r.getDouble(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)).map(_.toLong))
    val names = Array("quantity", "price_usd", "discount", "tax")
    val n = li.length.toLong
    def corr(i: Int, j: Int): Double = {
      val si = li.map(_(i)).sum; val sj = li.map(_(j)).sum
      val sij = li.map(e => e(i) * e(j)).sum
      val sii = li.map(e => e(i) * e(i)).sum
      val sjj = li.map(e => e(j) * e(j)).sum
      val num = (BigInt(n) * sij - BigInt(si) * sj).toDouble
      num / (math.sqrt((BigInt(n) * sii - BigInt(si) * si).toDouble) *
        math.sqrt((BigInt(n) * sjj - BigInt(sj) * sj).toDouble))
    }
    val local = (for (i <- 0 until 4; j <- i + 1 until 4)
      yield (names(i), names(j), n, round6(corr(i, j))))
      .sortBy(t => (t._1, t._2))
    assert(rows.length == local.length)
    rows.toSeq.zip(local).foreach { case ((a1, b1, n1, c1), (a2, b2, n2, c2)) =>
      assert(a1 == a2 && b1 == b2 && n1 == n2, s"cell mismatch $a1/$b1")
      assert(math.abs(c1 - c2) <= 1e-9, s"$a1/$b1: corr $c1 vs $c2")
      assert(math.abs(c1) <= 1.0, s"$a1/$b1: invalid correlation $c1")
    }
  }

  test("token budget: greedy per-source fill equals a local replay and " +
    "never exceeds the budget") {
    val rows = TextAnalysis.qCurateTokenBudget(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "source", "text").collect()
      .map { r =>
        val ws = r.getString(2).split(" ", -1)
        val score = ws.map { w =>
          java.lang.Long.parseLong(md5hex(w).substring(0, 6), 16) %
            4096 % 101 - 50
        }.sum
        (r.getLong(0), r.getString(1), ws.length.toLong, score)
      }
    val local = docs.groupBy(_._2).map { case (src, ds) =>
      val ordered = ds.sortBy(d => (-d._4, d._1))
      var cum = 0L
      val kept = ordered.takeWhile { d => cum += d._3; cum <= 1000L }
      (src, ds.length.toLong, kept.length.toLong, kept.map(_._3).sum,
        if (kept.isEmpty) None else Some(kept.map(_._4).min))
    }.toSeq.sortBy(_._1)
    assert(rows.toSeq == local, s"engine ${rows.head} vs local ${local.head}")
    rows.foreach { case (src, _, _, toks, _) =>
      assert(toks <= 1000L, s"$src exceeded the token budget: $toks")
    }
  }

  test("abtest: per-type z statistics equal a local recompute on " +
    "user-day exposure units") {
    val rows = EventStats.qEventsAbtest(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, dir)
      .selectExpr("user_id", "user_id % 2 AS v", "to_date(ts) AS d",
        "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDate(2), r.getString(3)))
    val exposure = ev.map(e => (e._2, e._1, e._3)).distinct
      .groupBy(_._1).map { case (v, s) => v -> s.size.toLong }
    val conv = ev.map(e => (e._4, e._2, e._1, e._3)).distinct
      .groupBy(t => (t._1, t._2)).map { case (k, s) => k -> s.size.toLong }
    val local = ev.map(_._4).distinct.sorted.map { t =>
      val (n0, n1) = (exposure(0L), exposure(1L))
      val (x0, x1) = (conv((t, 0L)), conv((t, 1L)))
      val p = (x0 + x1).toDouble / (n0 + n1)
      val z = (x0.toDouble / n0 - x1.toDouble / n1) /
        math.sqrt(p * (1.0 - p) * (1.0 / n0 + 1.0 / n1))
      (t, n0, n1, x0, x1, round6(z))
    }
    assert(rows.length == local.length)
    rows.toSeq.zip(local).foreach { case ((t1, a, b, c, d, z1),
        (t2, a2, b2, c2, d2, z2)) =>
      assert(t1 == t2 && a == a2 && b == b2 && c == c2 && d == d2)
      assert(math.abs(z1 - z2) <= 1e-9, s"$t1: z $z1 vs $z2")
    }
    // the variant split covers every user exactly once
    assert(ev.map(_._1).distinct.length ==
      ev.filter(_._2 == 0L).map(_._1).distinct.length +
      ev.filter(_._2 == 1L).map(_._1).distinct.length)
  }

  test("langid eval: scorecard equals a confusion recompute from the " +
    "prediction table and satisfies the count identities") {
    val rows = TextEval.qLangidEval(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5)),
        r.getLong(6),
        if (r.isNullAt(7)) None else Some(r.getLong(7))))
    assert(rows.nonEmpty)
    val pred = TextAnalysis.qTextLangid(spark, dir)
      .select("lang", "pred_lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val local = pred.map(_._1).distinct.sorted.map { l =>
      val nDocs = pred.count(_._1 == l).toLong
      val tp = pred.count(p => p._1 == l && p._2 == l).toLong
      val nPred = pred.count(_._2 == l).toLong
      (l, nDocs, tp, nPred - tp, nDocs - tp,
        if (nPred > 0) Some(tp * 1000000L / nPred) else None,
        tp * 1000000L / nDocs,
        if (nPred + nDocs > 0) Some(2 * tp * 1000000L / (nPred + nDocs))
        else None)
    }
    assert(rows.toSeq == local.toSeq)
    assert(rows.map(_._2).sum == pred.length, "supports cover the corpus")
    rows.foreach { case (l, nDocs, tp, _, fn, _, _, _) =>
      assert(tp + fn == nDocs, s"$l: tp + fn must equal support")
    }
  }

  test("calibration: reliability bins equal a local recompute and the " +
    "bins partition the corpus") {
    val rows = TextEval.qQualityCalibration(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, dir)
      .select("lang", "text").collect()
      .map { r =>
        val ws = r.getString(1).split(" ", -1)
        val score = ws.map { w =>
          java.lang.Long.parseLong(md5hex(w).substring(0, 6), 16) %
            4096 % 101 - 50
        }.sum
        val margin = score * 10000L / (ws.length * 50L)
        val bin = math.max(0L, math.min(9L, (margin + 10000) / 2000))
        (r.getString(0), bin, margin)
      }
    val local = docs.groupBy(_._2).map { case (bin, ds) =>
      val nEn = ds.count(_._1 == "en").toLong
      val sumM = ds.map(_._3).sum
      (bin, ds.length.toLong, nEn, nEn * 1000000L / ds.length,
        // integer DIV truncates toward zero in both engines
        sumM / ds.length)
    }.toSeq.sortBy(_._1)
    assert(rows.toSeq == local)
    assert(rows.map(_._2).sum == docs.length, "bins partition the corpus")
  }

  test("lm heldout: per-doc NLL on the held-out slice equals a local " +
    "replay and no train doc leaks into the eval") {
    val rows = TextEval.qTextLmHeldout(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    def heldout(id: Long): Boolean =
      md5hex(id.toString).substring(0, 2) < "20"
    val trainTok = docs.filterNot(d => heldout(d._1)).flatMap(_._2)
    val ct = trainTok.groupBy(identity).map { case (w, v) => w -> v.size }
    val tv1 = (trainTok.length + ct.size + 1).toDouble
    val local = docs.filter(d => heldout(d._1)).map { case (id, ws) =>
      val nll = ws.map(w => -math.log((ct.getOrElse(w, 0) + 1) / tv1))
      (id, ws.length.toLong, ws.count(!ct.contains(_)).toLong,
        round6(nll.sum / nll.length))
    }.sortBy(_._1)
    assert(rows.length == local.length)
    rows.toSeq.zip(local).foreach { case ((i1, n1, o1, x1), (i2, n2, o2, x2)) =>
      assert(i1 == i2 && n1 == n2 && o1 == o2, s"row mismatch $i1/$i2")
      assert(math.abs(x1 - x2) <= 2e-6, s"doc $i1: nll $x1 vs $x2")
    }
    // leakage guard: every emitted doc is in the held-out slice, and the
    // split covers the corpus
    rows.foreach { case (id, _, _, _) =>
      assert(heldout(id), s"doc $id leaked from the train slice") }
    assert(rows.length + docs.count(d => !heldout(d._1)) == docs.length)
  }

  test("pca: certification flags hold; the Jacobi eigenpair checks out " +
    "against an independent covariance build, non-vacuously") {
    val row = Similarity.qEmbedPca(spark, dir).collect()
    assert(row.length == 1)
    val r = row.head
    assert(r.getString(0) == "pca_jacobi" && r.getInt(1) == 8)
    assert(r.getInt(3) == 1, "eigen_ok: residual/maximality must hold")
    assert(r.getInt(4) == 1, "lambda_ok: projection variance must match")
    // independent covariance build from the raw vectors (NOT pcaFit)
    val embs = Tables.embeddings(spark, dir).select("embedding").collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    assert(r.getLong(2) == embs.length)
    val d = 8
    val q = embs.map(e => e.take(d).map(x => math.round(x * 1000).toDouble))
    val n = q.length.toDouble
    val mean = (0 until d).map(i => q.map(_(i)).sum / n / 1000.0).toArray
    val cov = Array.tabulate(d, d) { (i, j) =>
      val sij = q.map(e => e(i) * e(j)).sum
      (sij / n - (q.map(_(i)).sum / n) * (q.map(_(j)).sum / n)) / 1e6
    }
    // the solver on the independent matrix: residual at solver precision,
    // eigenvalue maximal, sign pinned
    val (lambda, v) = Similarity.jacobiTopEig(cov)
    val cv = cov.map(row => row.zip(v).map { case (a, b) => a * b }.sum)
    val res = math.sqrt(cv.zip(v)
      .map { case (a, b) => (a - lambda * b) * (a - lambda * b) }.sum) / lambda
    assert(res < 1e-8, s"Jacobi residual $res")
    assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-12)
    (0 until d).foreach(i => assert(lambda >= cov(i)(i) - 1e-12,
      s"lambda $lambda below diagonal variance ${cov(i)(i)}"))
    val mIdx = v.indices.maxBy(i => math.abs(v(i)))
    assert(v(mIdx) > 0, "sign must be pinned deterministically")
    // the distributed certificate, replayed locally
    def projVar(dirV: Array[Double]): Double = {
      val ps = embs.map { e =>
        math.round(dirV.indices.map(i => dirV(i) * (e(i) - mean(i))).sum
          * 1000).toDouble
      }
      val (s, ss) = (ps.sum, ps.map(p => p * p).sum)
      (ss / n - (s / n) * (s / n)) / 1e6
    }
    assert(math.abs(projVar(v) - lambda) < lambda * 1e-3,
      "top-eigenvector projection variance must equal lambda")
    // non-vacuity: a non-eigen direction's variance misses lambda
    val start = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    assert(math.abs(projVar(start) - lambda) > lambda * 1e-3,
      "certificate would be vacuous: start direction also passes")
  }

  test("kneser-ney: held-out doc NLLs equal a local replay of the full " +
    "interpolated model and per-context mass is a proper distribution") {
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).toSeq))
      .filter(_._2.length >= 2)
    def held(id: Long): Boolean = md5hex(id.toString).substring(0, 2) < "20"
    val trainBi = docs.filterNot(d => held(d._1))
      .flatMap { case (_, ws) => ws.zip(ws.drop(1)) }
    val c12 = trainBi.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ctx = c12.toSeq.groupBy(_._1._1).view.mapValues { xs =>
      (xs.map(_._2).sum, xs.size.toLong) }.toMap
    val cont = c12.keys.toSeq.groupBy(_._2).view
      .mapValues(_.size.toLong).toMap
    val ntot = c12.size.toLong
    val v = ctx.size.toLong
    def pcont(w2: String): Double =
      (cont.getOrElse(w2, 0L) + 1L).toDouble / (ntot + v + 1L).toDouble
    def p(w1: String, w2: String): Double = ctx.get(w1) match {
      case None => pcont(w2)
      case Some((c1, n1f)) =>
        math.max(c12.getOrElse((w1, w2), 0L).toDouble - 0.75, 0.0) /
          c1.toDouble +
          0.75 * n1f.toDouble / c1.toDouble * pcont(w2)
    }
    val local = docs.filter(d => held(d._1)).map { case (id, ws) =>
      val bs = ws.zip(ws.drop(1))
      val n9 = bs.map { case (a, b) =>
        math.rint(-math.log(p(a, b)) * 1e9).toLong }.sum
      (id, bs.length.toLong, bs.count(b => !ctx.contains(b._1)).toLong, n9)
    }
    val rows = TextEval.qTextKneserNey(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == local.toSeq)
    // proper-distribution check on the three heaviest contexts: the
    // seen-bigram mass plus lambda times the FULL continuation mass
    // (all w2 types + the OOV slot) must land at ~1
    ctx.toSeq.sortBy(-_._2._1).take(3).foreach { case (w1, (c1, n1f)) =>
      val seen = c12.collect { case ((a, b), c) if a == w1 =>
        math.max(c.toDouble - 0.75, 0.0) / c1.toDouble }.sum
      val lambda = 0.75 * n1f.toDouble / c1.toDouble
      val contAll = (ntot + cont.size + 1).toDouble / (ntot + v + 1L)
      val mass = seen + lambda * contAll
      assert(mass > 0.97 && mass < 1.03,
        s"context '$w1': probability mass $mass not ~1")
    }
  }

  // margins + labels for the AUC/isotonic pair, replayed locally
  private lazy val marginLabels: Array[(Long, Boolean)] =
    Tables.documents(spark, dir).select("lang", "text").collect()
      .map { r =>
        val ws = r.getString(1).split(" ", -1)
        val score = ws.map { w =>
          java.lang.Long.parseLong(md5hex(w).substring(0, 6), 16) %
            4096 % 101 - 50
        }.sum
        (score * 10000L / (ws.length * 50L), r.getString(0) == "en")
      }

  test("auc: the tie-aware statistic equals a brute-force pairwise " +
    "count over every (pos, neg) pair") {
    val pos = marginLabels.filter(_._2).map(_._1)
    val neg = marginLabels.filterNot(_._2).map(_._1)
    // O(n_pos * n_neg) ground truth: 2U = 2*concordant + ties
    var u2 = BigInt(0)
    pos.foreach { p =>
      neg.foreach { n =>
        if (p > n) u2 += 2 else if (p == n) u2 += 1
      }
    }
    val r = TextEval.qEvalAuc(spark, dir).collect().head
    assert(r.getLong(0) == pos.length.toLong &&
      r.getLong(1) == neg.length.toLong)
    assert(BigInt(r.getLong(2)) == u2,
      s"2U ${r.getLong(2)} != pairwise $u2")
    val denom = BigInt(pos.length) * neg.length
    assert(r.getLong(3) == (u2 * 1000000 / (denom * 2)).toLong)
    assert(r.getLong(4) == (u2 * 1000000 / denom - 1000000).toLong)
    // the hash-derived scorer must be non-degenerate on this corpus
    assert(r.getLong(3) > 0L && r.getLong(3) < 1000000L)
  }

  test("isotonic: fitted rates equal a sequential PAV replay as exact " +
    "fractions and are monotone non-decreasing in the margin bin") {
    val bins = marginLabels
      .map { case (m, en) => (math.max(0L, math.min(9L, (m + 10000) / 2000)),
        en) }
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (b, xs) => (b, xs.length.toLong,
        xs.count(_._2).toLong) }
    // classic stack PAV over (weight=n_docs, value=n_en/n_docs)
    case class Block(num: Long, den: Long)
    val stack = scala.collection.mutable.ArrayBuffer.empty[Block]
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Int]
    bins.foreach { case (_, n, e) =>
      stack += Block(e, n); sizes += 1
      while (stack.length > 1 &&
        // pool while previous block mean >= current block mean
        BigInt(stack(stack.length - 2).num) * stack.last.den >=
          BigInt(stack.last.num) * stack(stack.length - 2).den) {
        val b = stack.remove(stack.length - 1)
        val a = stack.remove(stack.length - 1)
        stack += Block(a.num + b.num, a.den + b.den)
        val s = sizes.remove(sizes.length - 1)
        sizes(sizes.length - 1) += s
      }
    }
    val fitted = stack.zip(sizes).flatMap { case (b, k) =>
      Seq.fill(k)(b) }
    val rows = TextEval.qCalibrateIsotonic(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.map(r => (r._1, r._2, r._3)).toSeq == bins,
      "bin table must match the local aggregate")
    rows.zip(fitted).foreach { case (r, blk) =>
      assert(BigInt(r._5) * blk.den == BigInt(blk.num) * r._6,
        s"bin ${r._1}: minimax ${r._5}/${r._6} != PAV ${blk.num}/${blk.den}")
      assert(r._7 == r._5 * 1000000L / r._6)
    }
    // monotone: each successive fraction is >= the previous one
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(BigInt(a._5) * b._6 <= BigInt(b._5) * a._6,
          s"isotonic fit not monotone between bins ${a._1} and ${b._1}")
      case _ =>
    }
    // non-vacuity: the raw rates on this corpus are NOT monotone, so
    // the fit had to pool at least two bins
    val rawMonotone = rows.sliding(2).forall {
      case Array(a, b) => BigInt(a._3) * b._2 <= BigInt(b._3) * a._2
      case _ => true
    }
    assert(!rawMonotone || stack.length < bins.length,
      "corpus gives monotone raw rates AND no pooling: spec is vacuous")
  }
}
