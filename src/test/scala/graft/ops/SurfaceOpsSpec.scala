package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Local-reference replays for the SQL-surface family (pipe syntax,
  * LATERAL, UNPIVOT) and bounded BFS. The value-level gate is the
  * DuckDB oracle; these replays prove the engine against in-JVM
  * recomputes so a Spark-side semantic drift (not just a cross-engine
  * one) would also be caught.
  */
class SurfaceOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("pipe syntax: |> pipeline equals a local recompute of the " +
    "classic aggregate") {
    val rows = Relational.qSqlPipe(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(rows.nonEmpty)
    val orders = Tables.orders(spark, dir)
      .select("o_orderstatus", "o_orderpriority", "o_totalprice").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      .filter(_._1 == "O")
    val local = orders.groupBy(_._2).map { case (pri, os) =>
      val total = os.map(o => BigDecimal(o._3)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
      (pri, os.length.toLong, total.toString)
    }.toSeq.sortBy(_._1)
    assert(rows.toSeq == local, s"engine ${rows.head} vs local ${local.head}")
  }

  test("lateral: per-nation top-2 balances equal a local recompute") {
    val rows = Relational.qLateralJoin(spark, dir).collect()
      .map(r => (r.getString(0), r.getAs[Number](1).longValue, r.getString(2)))
    assert(rows.nonEmpty)
    val nations = Tables.nation(spark, dir)
      .select("n_nationkey", "n_name").collect()
      .map(r => (r.getAs[Number](0).longValue, r.getString(1)))
    val custs = Tables.customer(spark, dir)
      .select("c_custkey", "c_nationkey", "c_acctbal").collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
        BigDecimal(r.getDouble(2)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP)))
    val local = nations.sortBy(_._2).flatMap { case (nk, name) =>
      custs.filter(_._2 == nk)
        .sortBy(c => (-c._3, c._1))
        .take(2)
        .map(c => (name, c._1, c._3.toString))
    }
    assert(rows.toSeq == local.toSeq,
      s"engine ${rows.take(3).toSeq} vs local ${local.take(3).toSeq}")
    // each nation contributes at most 2 rows
    rows.groupBy(_._1).foreach { case (n, rs) =>
      assert(rs.length <= 2, s"nation $n has ${rs.length} rows")
    }
  }

  test("unpivot: per-measure stats equal a local melt") {
    val rows = Relational.qUnpivot(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.length == 4)
    val li = Tables.lineitem(spark, dir)
      .select("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .collect()
    val measures = Seq(
      "discount" -> li.map(r => math.round(r.getDouble(2) * 100)),
      "price" -> li.map(r => math.round(r.getDouble(1) * 100)),
      "quantity" -> li.map(r => math.round(r.getDouble(0) * 100)),
      "tax" -> li.map(r => math.round(r.getDouble(3) * 100)))
    val local = measures.map { case (m, vs) =>
      (m, vs.length.toLong, vs.sum, vs.min, vs.max)
    }
    assert(rows.toSeq == local, s"engine ${rows.toSeq} vs local $local")
  }

  test("stream abtest: the streaming panel reproduces the batch readout " +
    "row for row") {
    val batch = EventStats.qEventsAbtest(spark, dir).collect().map(_.toSeq)
    val stream = EventStreaming.qStreamAbtest(spark, dir).collect().map(_.toSeq)
    assert(batch.nonEmpty)
    assert(stream.toSeq == batch.toSeq,
      s"stream ${stream.take(2).toSeq} vs batch ${batch.take(2).toSeq}")
  }

  test("compact: the rewritten table matches the source checksum and " +
    "actually reduced the file count") {
    val row = Formats.qCompactFiles(spark, dir).collect()
    assert(row.length == 1)
    val r = row.head
    assert(r.getInt(3) == 64, "fragmented landing must be 64 files")
    assert(r.getInt(4) == 1, "compaction must hit the size-derived target")
    val docs = Tables.documents(spark, dir)
      .select("text", "n_chars").collect()
      .map(x => (x.getString(0), x.getLong(1)))
    assert(r.getLong(0) == docs.length)
    assert(r.getLong(1) == docs.map(_._2).sum)
    val checksum = docs.map { case (t, _) =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).take(6)
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h, 16)
    }.sum
    assert(r.getLong(2) == checksum, "content checksum must survive")
  }

  test("tar codec: roundtrip recovers every member exactly; a corrupt " +
    "header truncates the walk; non-tar payloads parse to null") {
    import graft.functions.TarCodec
    val entries = Seq(
      "a.txt" -> "hello".getBytes("US-ASCII"),
      "dir/b.bin" -> Array.tabulate(700)(i => (i % 251).toByte),
      "empty" -> Array.empty[Byte])
    val tar = TarCodec.writeUstar(entries)
    assert(tar.length % 512 == 0)
    val parsed = TarCodec.entries(tar)
    assert(parsed.map(_._1).toSeq == entries.map(_._1))
    parsed.zip(entries).foreach { case ((n, sz, bs), (_, data)) =>
      assert(sz == data.length.toLong, s"$n size")
      assert(bs == data.map(b => (b & 0xff).toLong).sum, s"$n byte_sum")
    }
    // flip a byte inside the SECOND member's header (first member:
    // 512 header + "hello" padded to 512) — its checksum no longer
    // verifies, so the walk keeps only the first member
    val corrupt = tar.clone()
    corrupt(1024 + 130) = 'Z'.toByte
    val p2 = TarCodec.entries(corrupt)
    assert(p2.length == 1 && p2.head._1 == "a.txt",
      "corrupt header must truncate, not fail or mis-parse")
    // not a tar at all
    assert(TarCodec.entries(
      Array.fill(2048)("x".getBytes("US-ASCII").head)) == null)
    // a VALID EMPTY archive (two terminator blocks — writeUstar(Nil))
    // is an empty array, NOT null: corrupt and legitimately-empty
    // shards must stay distinguishable (review finding)
    assert(TarCodec.entries(TarCodec.writeUstar(Seq.empty)).isEmpty)
    assert(TarCodec.entries(TarCodec.writeUstar(Seq.empty)) != null)
    // pre-POSIX NUL typeflag is a REGULAR FILE (pax: '\0' shall be
    // treated as such) — flip the typeflag and fix the checksum
    def retypeFirst(t: Array[Byte], tf: Byte): Array[Byte] = {
      val c = t.clone(); c(156) = tf
      java.util.Arrays.fill(c, 148, 156, ' '.toByte)
      var sum = 0L; (0 until 512).foreach(i => sum += (c(i) & 0xff))
      val ck = java.lang.Long.toOctalString(sum)
      val ckB = (("0" * (6 - ck.length)) + ck + "\u0000 ").getBytes("US-ASCII")
      System.arraycopy(ckB, 0, c, 148, 8); c
    }
    val oneTar = TarCodec.writeUstar(Seq("a.txt" -> "hello".getBytes))
    val nulType = TarCodec.entries(retypeFirst(oneTar, 0.toByte))
    assert(nulType.length == 1 && nulType.head._1 == "a.txt" &&
      nulType.head._2 == 5L, "NUL typeflag must parse as a regular file")
    // a SYMLINK ('2') carries NO data blocks even when its size field is
    // nonzero (sloppy writers store the link-target length there): the
    // walk must not skip phantom payload and drop later members. Build:
    // [symlink header claiming size 5][real member]
    val linkHdr = retypeFirst(oneTar.take(512), '2'.toByte)
    val linked = linkHdr ++ TarCodec.writeUstar(
      Seq("after.txt" -> "world".getBytes))
    val afterLink = TarCodec.entries(linked)
    assert(afterLink.map(_._1).toSeq == Seq("after.txt"),
      "members after a sized symlink header must survive the walk")
    // the SQL registration exposes the same kernel
    import spark.implicits._
    val viaSql = Seq(tar).toDF("content")
      .selectExpr("size(tar_entries(content)) AS n")
      .collect().head.getInt(0)
    assert(viaSql == entries.length)
  }

  test("skyline: the frontier equals a local brute-force dominance " +
    "check over the per-size maxima") {
    val rows = Relational.qSkyline(spark, dir).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getString(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val parts = Tables.part(spark, dir)
      .select("p_size", "p_retailprice").collect()
      .map(r => (r.getAs[Number](0).longValue,
        BigDecimal(r.getDouble(1)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP)))
    val perSize = parts.groupBy(_._1).map { case (s, ps) =>
      (s, ps.map(_._2).max, ps.length.toLong) }.toSeq
    // brute force: candidate dominated iff some other (size, price) is
    // >= on both and > on one
    val local = perSize.filterNot { case (s, p, _) =>
      perSize.exists { case (s2, p2, _) =>
        (s2 >= s && p2 >= p) && (s2 > s || p2 > p) }
    }.sortBy(_._1).map { case (s, p, n) => (s, p.toString, n) }
    assert(rows.toSeq == local, s"engine ${rows.toSeq} vs local $local")
    // frontier shape: strictly decreasing price as size increases
    rows.sliding(2).foreach {
      case Array((s1, p1, _), (s2, p2, _)) =>
        assert(s1 < s2 && BigDecimal(p1) > BigDecimal(p2),
          "skyline must be strictly monotone")
      case _ =>
    }
  }

  test("fuzzy match: candidate pairs equal a local edit-distance " +
    "recompute over the distinct dictionary") {
    val rows = Relational.qFuzzyMatch(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val counts = Tables.part(spark, dir).select("p_name").collect()
      .map(_.getString(0)).groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val dict = counts.keys.toSeq.sorted
    val local = (for {
      i <- dict.indices; j <- i + 1 until dict.length
      d = lev(dict(i), dict(j)) if d <= 3
    } yield (dict(i), dict(j), d, counts(dict(i)), counts(dict(j))))
      .sortBy(t => (t._3, t._1, t._2)).take(30)
    assert(rows.toSeq == local, s"engine ${rows.take(3).toSeq} vs " +
      s"local ${local.take(3)}")
    rows.foreach { case (a, b, d, _, _) =>
      assert(d >= 1 && a < b, s"pair ($a,$b) dist $d malformed") }
  }

  test("entity resolution: components equal a local union-find closure " +
    "of the naive edit-distance graph (transitivity across chains)") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val counts = Tables.part(spark, dir).select("p_name").collect()
      .map(_.getString(0)).groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val dict = counts.keys.toSeq.sorted
    val parent = scala.collection.mutable.Map(dict.map(x => x -> x): _*)
    def find(x: String): String =
      if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    for (i <- dict.indices; j <- i + 1 until dict.length
         if lev(dict(i), dict(j)) <= 3) {
      val (ra, rb) = (find(dict(i)), find(dict(j)))
      if (ra != rb) parent(if (ra < rb) rb else ra) = if (ra < rb) ra else rb
    }
    // canonical = min member (path-compress to the final root's min)
    val byRoot = dict.groupBy(find)
    val local = byRoot.values.map { members =>
      (members.min, members.size.toLong, members.map(counts).sum)
    }.toSeq.sortBy(_._1)
    val rows = RelationalQuality.qEntityResolve(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == local, s"engine ${rows.take(4).toSeq} vs " +
      s"local ${local.take(4)}")
    // the resolution is a total mapping: entity coverage = dictionary
    assert(rows.map(_._2).sum == dict.size.toLong)
    assert(rows.map(_._3).sum == counts.values.sum)
    // transitivity actually exercised: some component must be wider than
    // any single pair radius (chained merges, ends > tau apart)
    assert(rows.exists(_._2 > 2), "no multi-hop component in fixture")
  }

  test("bfs: per-level aggregates equal a local frontier walk and " +
    "levels partition the reached set") {
    val rows = GraphOps.qGraphBfs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty && rows.head._1 == 0L)
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
    val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val src = edges.flatMap(e => Seq(e._1, e._2)).min
    var distMap = Map(src -> 0L)
    var frontier = Set(src)
    for (round <- 1 to 4) {
      val next = frontier.flatMap(adj.getOrElse(_, Set.empty))
        .diff(distMap.keySet)
      distMap ++= next.map(_ -> round.toLong)
      frontier = next
    }
    val local = distMap.toSeq.groupBy(_._2).map { case (d, ns) =>
      val ids = ns.map(_._1)
      (d, ids.length.toLong, ids.min, ids.max, ids.sum)
    }.toSeq.sortBy(_._1)
    assert(rows.toSeq == local, s"engine ${rows.toSeq} vs local $local")
    // levels partition: total reached equals the union of level counts
    assert(rows.map(_._2).sum == distMap.size)
  }
}
