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
    val rows = TextAnalysis.qTextPerplexity(spark, dir).collect()
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
    val rows = TextAnalysis.qCurateDsir(spark, dir).collect()
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
    val rows = TextAnalysis.qStatsMutualinfo(spark, dir).collect()
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
}
