package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Behavior + floating-point boundary audits for the round-6 curation
  * operators (Gopher quality rules, temperature mixture, SemDeDup).
  *
  * The value-level gate is the DuckDB oracle; these tests pin down the
  * SEMANTICS (flags really are the rules they claim) and the determinism
  * argument (every emitted rounded double sits far from its rounding
  * boundary, every threshold compare far from the threshold) so an
  * engine-vs-oracle pass can't be a coincidence of summation order.
  */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  test("pack_sequences invariants: windows never exceed 512 tokens " +
    "except a lone oversize doc; offsets are contiguous; next-fit is " +
    "greedy (each window break was forced)") {
    val rows = TextSampling.qPackSequences(spark, dirs(1))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(r => (r._1, r._4)).foreach { case ((src, seq), docs) =>
      val fill = docs.map(_._3).sum
      assert(fill <= 512 || docs.length == 1,
        s"($src,$seq) holds $fill tokens across ${docs.length} docs")
      // offsets are the exclusive prefix sums in doc_id order
      val sorted = docs.sortBy(_._2)
      var expect = 0L
      sorted.foreach { d =>
        assert(d._5 == expect, s"offset gap at doc ${d._2} in ($src,$seq)")
        expect += d._3
      }
    }
    // greedy: the first doc of window k+1 would NOT have fit in window k
    rows.groupBy(_._1).foreach { case (src, ds) =>
      val bySeq = ds.groupBy(_._4).toSeq.sortBy(_._1)
      bySeq.sliding(2).foreach {
        case Seq((_, prev), (_, next)) =>
          val prevFill = prev.map(_._3).sum
          val firstNext = next.minBy(_._2)._3
          assert(prevFill + firstNext > 512,
            s"$src: window break was not forced (${prevFill} + ${firstNext})")
        case _ => ()
      }
    }
  }

  test("packGroup edge cases the corpus lacks: oversize docs get a " +
    "window alone (and close it), exact fits stay, zero-fill reopen") {
    def pack(lens: Long*): Seq[(Long, Long, Long)] =
      TextSampling.packGroup("s",
        lens.zipWithIndex.map { case (n, i) => ("s", i.toLong, n) }.iterator,
        window = 10L)
        .map(r => (r._3, r._4, r._5)).toSeq // (n_tok, seq_id, off)
    // oversize doc mid-stream: forces a new window, sits alone
    // (overflowing), and the NEXT doc opens yet another window
    assert(pack(4L, 25L, 3L) ===
      Seq((4L, 0L, 0L), (25L, 1L, 0L), (3L, 2L, 0L)))
    // oversize doc FIRST: occupies window 0 alone
    assert(pack(25L, 3L) === Seq((25L, 0L, 0L), (3L, 1L, 0L)))
    // exact fit closes flush: 4+6 = 10 stays, the next doc breaks
    assert(pack(4L, 6L, 1L) ===
      Seq((4L, 0L, 0L), (6L, 0L, 4L), (1L, 1L, 0L)))
    // greedy: a small doc after a near-full window still fits
    assert(pack(9L, 1L, 1L) ===
      Seq((9L, 0L, 0L), (1L, 0L, 9L), (1L, 1L, 0L)))
  }

  test("gopher rules: flags recompute from the raw text, keep is their AND") {
    val docs = Tables.documents(spark, dirs.head).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = TextAnalysis.qQualityGopher(spark, dirs.head).collect()
    assert(out.length == docs.size)
    val stops = Set("the", "a", "of", "and", "to")
    out.foreach { r =>
      val (id, nWords, nDistinct) = (r.getLong(0), r.getInt(1), r.getInt(2))
      val flags = (3 to 8).map(r.getInt)
      assert(flags.forall(f => f == 0 || f == 1), s"doc $id: non-binary flag")
      val words = docs(id).split(" ", -1)
      assert(nWords == words.length, s"doc $id: word count")
      assert(nDistinct == words.distinct.length, s"doc $id: distinct count")
      val noSpace = words.map(_.length).sum
      assert(flags(0) == (if (words.length >= 30 && words.length <= 100000) 1 else 0))
      assert(flags(1) ==
        (if (noSpace >= 3 * words.length && noSpace <= 10 * words.length) 1 else 0))
      // ASCII letters only — the rule the engine AND oracle implement
      // ([a-zA-Z]); Character.isLetter would diverge on non-Latin text
      def asciiLetter(c: Char) = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
      assert(flags(2) ==
        (if (words.count(_.exists(asciiLetter)) * 10 >= words.length * 8) 1 else 0))
      assert(flags(3) == (if (words.distinct.count(stops) >= 2) 1 else 0))
      assert(flags(4) ==
        (if ((words.length - words.distinct.length) * 2 <= words.length) 1 else 0))
      assert(flags(5) == flags.take(5).product, s"doc $id: keep != AND(flags)")
    }
    // the rule set must be discriminative on this corpus, not vacuous
    val kept = out.count(_.getInt(8) == 1)
    assert(kept > 0 && kept < out.length,
      s"gopher filter kept $kept/${out.length} — rules not discriminative")
  }

  test("mix temperature: weights near-normalized; every 6-dp rounding is " +
    "boundary-safe at all SFs") {
    dirs.foreach { dir =>
      val rows = TextAnalysis.qMixTemperature(spark, dir).collect()
      assert(rows.length > 1)
      val weightSum = rows.map(_.getDouble(3)).sum
      assert(math.abs(weightSum - 1.0) <= rows.length * 5e-7,
        s"$dir: rounded weights sum to $weightSum")
      // recompute unrounded weights and audit distance to the 6-dp grid
      // boundary: the cross-engine freedom is the denominator's summation
      // order (~1e-13 relative), so a margin of 1e-9 is 4 orders beyond it
      val sqs = rows.map(r => math.sqrt(r.getLong(2).toDouble))
      val denom = sqs.sum
      sqs.zip(rows).foreach { case (sq, r) =>
        val w = sq / denom
        val frac = w * 1e6 - math.floor(w * 1e6)
        val margin = math.abs(frac - 0.5)
        assert(margin > 1e-3, // i.e. w is >1e-9 from a rounding boundary
          s"$dir source ${r.getString(0)}: weight $w within 1e-9 of boundary")
        assert(math.abs(r.getDouble(3) - w) < 5.000001e-7)
        // alloc derives from the ROUNDED weight; never lands near .5
        assert(r.getLong(4) == math.round(r.getDouble(3) * 1e6))
      }
    }
  }

  test("incremental dedup: new-batch matching equals the full recompute " +
    "restricted to pairs touching the batch") {
    import org.apache.spark.sql.functions.{col, pmod, lit}
    val full = Dedup.qDedupMinhash(spark, dirs.head).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val expected = full.filter { case (d1, d2, _) =>
      d1 % 10 >= 8 || d2 % 10 >= 8
    }
    val got = Dedup.qDedupIncremental(spark, dirs.head).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected,
      s"missing=${expected -- got}, spurious=${got -- expected}")
    // no pair entirely inside the history may appear
    assert(got.forall { case (d1, d2, _) => d1 % 10 >= 8 || d2 % 10 >= 8 })
    assert(got.nonEmpty)
  }

  test("signature index: build on batch 1, match batch 2 without " +
    "re-scanning batch 1; index stays current for batch 3") {
    import org.apache.spark.sql.functions.{col, pmod, lit}
    val docs = Tables.documents(spark, dirs.head)
    val b1 = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
    val b2 = docs.filter(pmod(col("doc_id"), lit(3)) === 1)
    val b3 = docs.filter(pmod(col("doc_id"), lit(3)) === 2)
    val idx = java.nio.file.Files.createTempDirectory("graft-sigidx")
      .resolve("index").toString
    Dedup.writeSignatureIndex(b1, idx)
    val m2 = Dedup.matchAndUpdateIndex(spark, b2, idx).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val m3 = Dedup.matchAndUpdateIndex(spark, b3, idx).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth: the full pair set, attributed to the batch in which
    // its LATER member arrives (1,2-pairs surface when batch 2 lands, …)
    val full = Dedup.qDedupMinhash(spark, dirs.head).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def batchOf(id: Long) = id % 3
    val exp2 = full.filter { case (a, b) =>
      Set(batchOf(a), batchOf(b)).subsetOf(Set(0L, 1L)) &&
        (batchOf(a) == 1 || batchOf(b) == 1)
    }
    val exp3 = full.filter { case (a, b) => batchOf(a) == 2 || batchOf(b) == 2 }
    assert(m2 == exp2, s"missing=${exp2 -- m2}, spurious=${m2 -- exp2}")
    assert(m3 == exp3, s"missing=${exp3 -- m3}, spurious=${m3 -- exp3}")
    assert((m2 ++ m3 ++ full.filter { case (a, b) =>
      batchOf(a) == 0 && batchOf(b) == 0 }) == full,
      "batch-attributed pairs must reconstruct the full pair set")
  }

  test("k-center: selection trajectory equals a local greedy replay; " +
    "radius sequence is non-increasing") {
    dirs.foreach { dir =>
      val vecs = Tables.embeddings(spark, dir).collect()
        .map(r => (r.getLong(0), r.getInt(2),
          r.getSeq[Float](1).map(_.toDouble).toArray))
        .sortBy(_._1)
      def dist(a: Array[Double], b: Array[Double]): Double = {
        var s = 0.0; var i = 0
        while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
        math.sqrt(s)
      }
      val byId = vecs.map(v => v._1 -> v).toMap
      var centers = Vector(byId(0L))
      val expected = scala.collection.mutable.ArrayBuffer(
        (1, 0L, byId(0L)._2, 0.0))
      while (expected.length < 8) {
        val cand = vecs.filter(v => !centers.exists(_._1 == v._1))
          .map(v => (v, centers.map(c => dist(c._3, v._3)).min))
        val w = cand.minBy { case (v, d) => (-d, v._1) }
        centers :+= w._1
        expected += ((expected.length + 1, w._1._1, w._1._2, w._2))
      }
      val got = Similarity.qSampleKcenter(spark, dir).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      val exp = expected.map { case (s, id, l, d) =>
        (s, id, l, BigDecimal(d).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      assert(got.toSeq == exp.toSeq, s"$dir: $got vs $exp")
      // Gonzalez invariant: the selection distances never increase
      val ds = got.drop(1).map(_._4)
      assert(ds.zip(ds.tail).forall { case (a, b) => b <= a }, ds.toSeq)
    }
  }

  test("window index: substring stats per snapshot equal the cumulative " +
    "recount; index advances by append and stays content-free") {
    import org.apache.spark.sql.functions.{col, pmod, lit}
    val docs = Tables.documents(spark, dirs.head)
    val b1 = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
    val b2 = docs.filter(pmod(col("doc_id"), lit(3)) === 1)
    val b3 = docs.filter(pmod(col("doc_id"), lit(3)) === 2)
    val idx = java.nio.file.Files.createTempDirectory("graft-winidx")
      .resolve("index").toString
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    Dedup.writeWindowIndex(b1, idx)
    val m2 = rows(Dedup.matchWindowsAgainstIndex(spark, b2, idx))
    val m3 = rows(Dedup.matchWindowsAgainstIndex(spark, b3, idx))
    // ground truth: a FULL recount over the docs seen so far, restricted
    // to the arriving batch — count additivity says they must be equal
    val exp2 = rows(Dedup.substringStats(b1.union(b2))
      .filter(pmod(col("doc_id"), lit(3)) === 1))
    val exp3 = rows(Dedup.substringStats(docs)
      .filter(pmod(col("doc_id"), lit(3)) === 2))
    assert(m2 == exp2, s"missing=${exp2 -- m2}, spurious=${m2 -- exp2}")
    assert(m3 == exp3, s"missing=${exp3 -- m3}, spurious=${m3 -- exp3}")
    assert(m2.nonEmpty && m3.nonEmpty)
    assert(m3.exists(_._3 > 0), "batch 3 must see cross-snapshot dups")
    // the index is (h, cnt) only — content-free — and append-only:
    // summed per hash it equals the full-corpus occurrence counts
    val idxDf = spark.read.parquet(idx)
    assert(idxDf.columns.toSet == Set("h", "cnt"), idxDf.columns.mkString(","))
    val summed = idxDf.groupBy(col("h"))
      .agg(org.apache.spark.sql.functions.sum(col("cnt")).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    import org.apache.spark.sql.functions.{explode, size, split, count}
    val fullCnt = docs.filter(size(split(col("text"), " ", -1)) >= 10)
      .select(explode(graft.functions.TextFeatures
        .wordWindowHashesCol(col("text"), 10)).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(summed == fullCnt,
      "appended index summed per hash must equal the full-corpus counts")
  }

  test("streaming dedup loop: files arriving across two stream runs are " +
    "matched incrementally; checkpoint skips processed files") {
    import org.apache.spark.sql.functions.{col, pmod, lit}
    val docs = Tables.documents(spark, dirs.head)
    val root = java.nio.file.Files.createTempDirectory("graft-sdd")
    val (in, idx, pairs, chk) = (s"$root/in", s"$root/idx", s"$root/pairs",
      s"$root/chk")
    val schema = docs.schema

    docs.filter(pmod(col("doc_id"), lit(2)) === 0)
      .repartition(1).write.parquet(s"$in/b0")
    // file source watches a glob of the batch subdirs
    Dedup.runStreamingDedup(spark, s"$in/*", schema, idx, pairs, chk)
    val after1 = spark.read.parquet(pairs).count()

    docs.filter(pmod(col("doc_id"), lit(2)) === 1)
      .repartition(1).write.parquet(s"$in/b1")
    Dedup.runStreamingDedup(spark, s"$in/*", schema, idx, pairs, chk)

    val got = spark.read.parquet(pairs)
      .select(col("d1"), col("d2")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Dedup.qDedupMinhash(spark, dirs.head).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == full,
      s"missing=${full -- got}, spurious=${got -- full}")
    // the second run must have contributed the cross+odd-intra remainder,
    // not reprocessed batch 0 (checkpoint dedups the file set)
    assert(after1 < full.size || full.isEmpty)
    val batches = spark.read.parquet(pairs)
      .select(col("batch_id")).distinct().count()
    assert(batches >= 2, "each stream run must process its own batch")
  }

  test("misra-gries buffer: guarantees hold under adversarial merge " +
    "orders and splits") {
    import graft.functions.MgBuffer
    val k = 4
    // skewed stream: key i appears 2^(8-i) times, i in 0..8 → n = 511
    val stream = (0 to 8).flatMap(i => Seq.fill(1 << (8 - i))(s"key$i"))
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = stream.size.toLong
    val rnd = new scala.util.Random(7)
    (0 until 20).foreach { trial =>
      val shuffled = rnd.shuffle(stream)
      // split into 1..8 partial buffers, merge in random order
      val parts = shuffled.grouped(
        math.max(1, shuffled.size / (1 + rnd.nextInt(8)))).toSeq
      val bufs = parts.map { p =>
        val b = new MgBuffer(k); p.foreach(b.add(_, 1L)); b
      }
      val merged = rnd.shuffle(bufs).reduce { (a, b) =>
        b.counts.foreach { case (key, c) => a.addNoTrim(key, c) }
        a.trim(); a
      }
      assert(merged.counts.size <= k, s"trial $trial: size bound broken")
      merged.counts.foreach { case (key, est) =>
        val t = exact(key)
        assert(est <= t, s"trial $trial: $key overcounted ($est > $t)")
        assert((t - est) * (k + 1) <= n,
          s"trial $trial: $key undercount ${t - est} exceeds n/(k+1)")
      }
      // every key with true count > n/(k+1) must survive
      exact.foreach { case (key, t) =>
        if (t * (k + 1) > n) {
          assert(merged.counts.contains(key),
            s"trial $trial: guaranteed key $key missing")
        }
      }
    }
  }

  test("semdedup: keep/n_dups recompute from exact pairwise cosine; " +
    "threshold margin >= 1e-4 at all SFs") {
    val tau = 0.43
    dirs.foreach { dir =>
      val vecs = Tables.embeddings(spark, dir).collect()
        .map(r => (r.getLong(0),
          r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2)))
        .sortBy(_._1)
      val byLabel = vecs.groupBy(_._3)
      def cos(a: Array[Double], b: Array[Double]): Double = {
        var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) {
          d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
        }
        d / (math.sqrt(na) * math.sqrt(nb))
      }
      var minMargin = Double.MaxValue
      val expected = scala.collection.mutable.Map[Long, Long]()
      byLabel.values.foreach { members =>
        for {
          Array((ia, va, _), (ib, vb, _)) <- members.combinations(2)
            .map(_.sortBy(_._1).toArray)
        } {
          val c = cos(va, vb)
          minMargin = math.min(minMargin, math.abs(c - tau))
          if (BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP)
              .toDouble >= tau) {
            expected(ib) = expected.getOrElse(ib, 0L) + 1L
          }
          val _ = ia
        }
      }
      assert(minMargin >= 1e-4,
        s"$dir: a pair cosine sits $minMargin from tau — boundary-unsafe")
      val out = Similarity.qDedupSemantic(spark, dir).collect()
      assert(out.length == vecs.length)
      out.foreach { r =>
        val (id, nDups, keep) = (r.getLong(0), r.getLong(2), r.getInt(3))
        assert(nDups == expected.getOrElse(id, 0L), s"$dir vec $id: n_dups")
        assert(keep == (if (expected.contains(id)) 0 else 1), s"$dir vec $id")
      }
      // non-vacuous: some vectors dropped, most kept
      val dropped = out.count(_.getInt(3) == 0)
      assert(dropped > 0 && dropped < out.length / 2,
        s"$dir: $dropped/${out.length} dropped")
    }
  }

  test("semantic decontamination: hits/max_cos recompute from exact " +
    "benchmark-vs-corpus cosine; threshold margin >= 1e-4 at all SFs") {
    val tau = 0.43
    dirs.foreach { dir =>
      val vecs = Tables.embeddings(spark, dir).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
        .sortBy(_._1)
      val (bench, corpus) = vecs.partition(_._1 < 50L)
      def cos(a: Array[Double], b: Array[Double]): Double = {
        var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) {
          d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
        }
        d / (math.sqrt(na) * math.sqrt(nb))
      }
      var minMargin = Double.MaxValue
      val expected = corpus.map { case (id, v) =>
        val cs = bench.map(b => cos(b._2, v))
        cs.foreach(c => minMargin = math.min(minMargin, math.abs(c - tau)))
        id -> cs.count(_ >= tau).toLong
      }.toMap
      assert(minMargin >= 1e-4,
        s"$dir: a benchmark cosine sits $minMargin from tau — boundary-unsafe")
      val out = Similarity.qDecontaminateSemantic(spark, dir).collect()
      assert(out.length == corpus.length)
      out.foreach { r =>
        val (id, nHits, flag) = (r.getLong(0), r.getLong(2), r.getInt(4))
        assert(nHits == expected(id), s"$dir vec $id: n_hits")
        assert(flag == (if (expected(id) > 0) 1 else 0), s"$dir vec $id")
      }
      // non-vacuous: some contamination found, but rare
      val flagged = out.count(_.getInt(4) == 1)
      assert(flagged > 0 && flagged < out.length / 10,
        s"$dir: $flagged/${out.length} flagged")
    }
  }
}
