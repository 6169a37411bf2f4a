package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Plan-regression guard: the scale properties PLANS.md documents,
  * asserted on the actual physical plans so a refactor cannot silently
  * turn a broadcast into a shuffle or un-prune a scan.
  */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, dir)
      .queryExecution.executedPlan.toString

  test("q05: every dimension join is broadcast; fact scan is pruned") {
    val p = plan("q05_local_supplier")
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) == 5, p)
    assert(!p.contains("SortMergeJoin"), "fact side must not shuffle for dims")
    val scanLine = p.linesIterator
      .find(l => l.contains("FileScan parquet") && l.contains("lineitem")).get
    assert(scanLine.contains(
      "ReadSchema: struct<l_orderkey:bigint,l_suppkey:bigint," +
        "l_extendedprice:double,l_discount:double>"),
      s"lineitem scan must read exactly 4 columns: $scanLine")
  }

  test("q01: partial aggregation before the exchange") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("partial_sum"), p)
    val partialIdx = p.indexOf("partial_sum")
    val exchangeIdx = p.indexOf("Exchange hashpartitioning")
    // plans print top-down: the exchange appears before (above) the
    // partial aggregate that feeds it
    assert(exchangeIdx >= 0 && partialIdx > exchangeIdx, p)
  }

  test("q_topk_agg: heap aggregate runs in partial mode") {
    val p = plan("q_topk_agg")
    assert(p.contains("partial_topkbyscore"), p)
    assert(p.contains("ObjectHashAggregate"), p)
  }

  test("minhash: no cartesian/nested-loop joins anywhere") {
    val p = plan("q_dedup_minhash")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("fuzzy match: dictionary self-compare is a blocked equi-join " +
    "(the r9 a<b cartesian is quadratic in dictionary size)") {
    val p = plan("q_fuzzy_match")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("simhash: candidate join keys are 16-bit words, not bytes " +
    "(262144 bucket keys — the r2 byte blocking degenerated at scale)") {
    val p = plan("q_dedup_simhash")
    assert(p.contains("& 65535"), "blocking must extract 16-bit words")
    assert(!p.contains("& 255)"),
      "byte-granularity blocking reappeared — occupancy n/256 is quadratic")
  }

  test("similarity: anchor predicates are fixed-count pushed filters, " +
    "never a corpus-fraction modulo") {
    // The exact-cosine consumers read the ann_scored session fixture, whose
    // checkpoint truncates lineage — audit the anchor filter on the
    // fixture-PRODUCING plan, where the scan actually runs.
    val fixturePlan = Similarity.annScoredCompute(spark, dir)
      .queryExecution.executedPlan.toString
    assert(fixturePlan.contains("LessThan(vec_id,50)"),
      s"ann_scored fixture: anchor filter not pushed to the scan:\n$fixturePlan")
    assert(!fixturePlan.contains("%"),
      "ann_scored fixture: modulo anchor rule reappeared — " +
        "anchors must not scale with the corpus")
    Seq("q_embed_neardup", "q_ann_topk", "q_ann_lsh", "q_ann_quantized",
      "q_ann_pq").foreach { q =>
      val p = plan(q)
      assert(p.contains("LessThan(vec_id,50)") || p.contains("vec_id#") ||
        p.contains("Scan ExistingRDD"),
        s"$q: neither an anchor filter nor the ann_scored fixture scan")
      assert(!p.contains("%"), s"$q: modulo anchor rule reappeared — " +
        "anchors must not scale with the corpus")
    }
  }

  test("q_join_broadcast: dimension broadcast survives, fact not shuffled " +
    "before the aggregation") {
    val p = plan("q_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p)
    // only exchanges allowed: the dimension broadcast itself, the
    // aggregation key, and the final ordering
    val exchanges = p.linesIterator.filter(_.contains("Exchange ")).toSeq
    assert(exchanges.forall(l =>
      l.contains("BroadcastExchange") || l.contains("p_brand") ||
        l.contains("rangepartitioning")), exchanges.mkString("\n"))
  }

  test("q_text_fingerprint: custom expressions stay inside the scan stage " +
    "(single narrow plan, no exchange before projection)") {
    val p = plan("q_text_fingerprint")
    assert(p.contains("rollinghash"), p)
    val projIdx = p.indexOf("rollinghash")
    val exIdx = p.indexOf("Exchange ")
    // the only exchange is the final global sort, printed above the project
    assert(exIdx < projIdx, p)
  }

  test("q_cdc_apply: exactly one hash exchange (the MERGE key), pruned scan") {
    val p = plan("q_cdc_apply")
    val hashEx = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.size == 1, s"expected one key shuffle:\n$p")
    val scanLine = p.linesIterator
      .find(l => l.contains("FileScan parquet") && l.contains("lineitem")).get
    assert(scanLine.contains("l_orderkey") && !scanLine.contains("l_comment"),
      s"lineitem scan must be pruned: $scanLine")
  }

  test("q_grouping_sets: one Expand feeding one partial aggregation") {
    val p = plan("q_grouping_sets")
    assert(p.linesIterator.count(_.trim.startsWith("+- Expand")) +
      p.linesIterator.count(_.trim.startsWith("Expand")) >= 1, p)
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
  }

  test("q_sample_hash: the sample filter costs no shuffle (only the " +
    "report agg exchanges) and the scan is pruned") {
    val p = plan("q_sample_hash")
    val exchanges = p.linesIterator.filter(_.contains("Exchange ")).toSeq
    assert(exchanges.forall(l =>
      l.contains("lang") || l.contains("rangepartitioning")),
      s"only the lang agg + output sort may exchange: $exchanges")
    val scan = p.linesIterator
      .find(l => l.contains("FileScan parquet") && l.contains("documents")).get
    assert(scan.contains("ReadSchema: struct<doc_id:bigint,lang:string," +
      "n_chars:bigint>"), s"sampling must not read text: $scan")
  }

  test("q_decontaminate: phrase probe is a broadcast nested-loop anti " +
    "join — the corpus never shuffles for the match") {
    val p = plan("q_decontaminate")
    assert(p.contains("BroadcastNestedLoopJoin") && p.contains("LeftAnti"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q_exists_subquery: EXISTS/NOT EXISTS decorrelate to semi + anti " +
    "joins with pushed filters") {
    val p = plan("q_exists_subquery")
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"), p)
    assert(p.contains("PushedFilters: [IsNotNull(o_orderpriority), " +
      "EqualTo(o_orderpriority,1-URGENT)]"), p)
  }

  test("q06: every predicate is pushed to the parquet scan and the " +
    "ReadSchema carries only the four referenced columns") {
    // formatted explain — the one-line plan truncates PushedFilters
    val p = graft.SparkEntry.queries("q06_forecast_revenue")(spark, dir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    Seq("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
      "GreaterThanOrEqual(l_discount,0.02)", "LessThanOrEqual(l_discount,0.04)",
      "LessThan(l_quantity,24.0)").foreach { f =>
      assert(p.contains(f), s"predicate $f not pushed: $p")
    }
    assert(p.contains("ReadSchema: struct<l_quantity:double," +
      "l_extendedprice:double,l_discount:double,l_shipdate:timestamp_ntz>"),
      s"scan must read exactly 4 columns: $p")
  }

  test("q_array_funcs: lambda kernels run scan-side — the only exchange " +
    "is the output ordering") {
    val p = plan("q_array_funcs")
    val exchanges = p.linesIterator.filter(_.contains("Exchange ")).toSeq
    assert(exchanges.forall(_.contains("rangepartitioning")),
      s"array lambdas must not shuffle: $exchanges")
  }

  test("q_dedup_paragraph: keep-first runs as a chunk-hash window (high-" +
    "cardinality partitions), never a single-partition sort") {
    val p = plan("q_dedup_paragraph")
    assert(!p.contains("SinglePartition"),
      s"global single-partition stage found:\n$p")
    val hashEx = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.exists(_.contains("m#")),
      s"expected a shuffle keyed on the chunk hash: $hashEx")
  }

  test("q_cdc_scd2: full-history build pays exactly one key shuffle — " +
    "same cost shape as the latest-row merge") {
    val p = plan("q_cdc_scd2")
    val hashEx = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.size == 1, s"expected one key shuffle:\n$p")
    assert(!p.contains("SinglePartition"), p)
  }

  test("q_ann_filtered: the metadata predicate turns the candidate join " +
    "into a broadcast HASH join on the label — no nested loop") {
    val p = plan("q_ann_filtered")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"filtered search must hash-partition candidates by the predicate:\n$p")
  }

  test("runtime bloom filter: a selective dim filter injects might_contain " +
    "into the fact scan of a shuffle join") {
    import org.apache.spark.sql.functions.col
    val keep = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold").map(k =>
      k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      val ord = spark.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val p = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .groupBy("o_orderpriority").count()
        .queryExecution.executedPlan.toString
      // the fact side is pre-filtered by a bloom built from the filtered
      // dim — rows that cannot join never enter the exchange (the big
      // lever on a 100 TB shuffle join)
      assert(p.contains("might_contain"), p)
      assert(p.contains("bloom_filter_agg"), p)
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("date-partitioned layout: a date filter becomes PartitionFilters — " +
    "non-matching partitions are pruned before any IO") {
    import org.apache.spark.sql.functions.{col, to_date}
    val out = java.nio.file.Files.createTempDirectory("graft-audit-part")
      .toFile.getAbsolutePath
    graft.ops.Tables.events(spark, dir)
      .withColumn("d", to_date(col("ts")))
      .write.partitionBy("d").parquet(s"$out/events_by_day")
    val p = spark.read.parquet(s"$out/events_by_day")
      .filter(col("d") === "2024-01-05")
      .groupBy(col("event_type")).count()
      .queryExecution.executedPlan.toString
    val scan = p.linesIterator.find(_.contains("FileScan parquet")).get
    assert(scan.contains("PartitionFilters: [isnotnull(d#") &&
      scan.contains("= 2024-01-05)"),
      s"date filter must prune partitions, not rows: $scan")
    assert(!scan.contains("PushedFilters: [IsNotNull(d)"),
      "d must be a partition column, not a data column")
  }

  test("dynamic partition pruning: a join against a FILTERED dim prunes " +
    "the partitioned fact at runtime — the filter never names the fact") {
    import org.apache.spark.sql.functions.{col, to_date, lit}
    val out = java.nio.file.Files.createTempDirectory("graft-audit-dpp")
      .toFile.getAbsolutePath
    val ev = graft.ops.Tables.events(spark, dir)
      .withColumn("d", to_date(col("ts")))
    ev.write.partitionBy("d").parquet(s"$out/fact_by_day")
    // dim: one row per day, filtered to a 2-day window; the fact filter
    // can only arrive THROUGH the join (that is what DPP is)
    // the dim filter must be a LIKELY-SELECTIVE predicate shape (equality/
    // IN/LIKE) — a bare boolean column does not qualify for DPP insertion
    val dim = ev.select(col("d")).distinct()
      .withColumn("kind",
        org.apache.spark.sql.functions.when(
          col("d").isin("2024-01-05", "2024-01-06"), "hot").otherwise("cold"))
    dim.write.parquet(s"$out/dim_days")
    val keep = Seq(
      "spark.sql.optimizer.dynamicPartitionPruning.enabled",
      "spark.sql.optimizer.dynamicPartitionPruning.useStats",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
      // at test scale the stats-based benefit estimate rounds to zero;
      // the fallback ratio heuristic is the path a warehouse without
      // fresh stats takes, so pin that one
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "50.0")
      // DPP needs the dim side to look worth it; the fallback-broadcast
      // path is the one a real star join takes
      val fact = spark.read.parquet(s"$out/fact_by_day")
      val hot = spark.read.parquet(s"$out/dim_days")
        .filter(col("kind") === "hot")
      val q = fact.join(hot, Seq("d")).groupBy(col("event_type"))
        .agg(org.apache.spark.sql.functions.count(lit(1)).as("n"))
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("dynamicpruningexpression"),
        s"fact scan must carry a runtime pruning predicate: $p")
      // correctness: equals the statically-filtered computation
      val expect = ev.filter(col("d").isin("2024-01-05", "2024-01-06"))
        .groupBy(col("event_type")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expect)
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE skew join: a white-hot key is split at runtime " +
    "(AQEShuffleRead skewed) — the automatic fallback when manual " +
    "salting (q_salted_join) isn't applied") {
    import org.apache.spark.sql.functions.{col, count, lit, sum}
    val keys = Seq(
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.adaptive.forceOptimizeSkewedJoin",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.shuffle.partitions")
    val keep = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // scaled-down trigger sizes so the skew is visible at test volume;
      // in production the defaults (256MB / factor 5) do the same job
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      // enough reducers that the hot partition towers over the MEDIAN —
      // at 4 partitions the uniform tail inflates the median past the
      // factor (measured); production partition counts don't have this
      // small-denominator artifact
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      import spark.implicits._
      val fact = spark.range(500000L).select(lit(0L).as("k"), $"id".as("v"))
        .union(spark.range(500000L)
          .select(($"id" % 1000L + 1L).as("k"), $"id".as("v")))
      val dim = spark.range(1001L).select($"id".as("k"), ($"id" * 2).as("w"))
      val j = fact.join(dim, "k")
        .groupBy(lit(1).as("g")).agg(count(lit(1)).as("n"), sum($"w").as("s"))
      val row = j.collect().head
      // correctness unaffected by the split
      assert(row.getAs[Long]("n") == 1000000L)
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin(skew=true)"), p)
      assert(p.contains("AQEShuffleRead skewed"), p)
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("q04: EXISTS is a semi join (no row multiplication), both scans " +
    "pruned and the date window pushed") {
    val p = plan("q04_order_priority")
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("Expand"), p)
    val ordersScan = p.linesIterator
      .find(l => l.contains("FileScan parquet") && l.contains("orders")).get
    assert(ordersScan.contains("GreaterThanOrEqual(o_orderdate"),
      s"date window must reach the orders scan: $ordersScan")
    val liScan = p.linesIterator
      .find(l => l.contains("FileScan parquet") && l.contains("lineitem")).get
    assert(liScan.contains("ReadSchema: struct<l_orderkey:bigint,l_shipdate"),
      s"lineitem must read exactly orderkey+shipdate: $liScan")
  }

  test("q14: single aggregate pass (CASE rides the partial agg, no " +
    "second join for the denominator)") {
    val p = plan("q14_promo_revenue")
    assert(p.linesIterator.count(l =>
      l.contains("HashAggregate") && l.contains("partial_sum")) == 1, p)
    assert(p.linesIterator.count(_.contains("Join")) == 1, p)
  }

  test("q_decontaminate_ngram: candidate generation is an equi join on " +
    "the n-gram key, never a nested loop") {
    val p = plan("q_decontaminate_ngram")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    assert(p.contains("LeftSemi"), p)
  }

  test("multimodal decode queries: header parse stays scan-side — no " +
    "shuffle before the final sort") {
    Seq("q_multimodal_meta", "q_multimodal_audio", "q_multimodal_video")
      .foreach { q =>
        val p = plan(q)
        assert(p.linesIterator.count(_.contains("Exchange")) == 1,
          s"$q must only exchange for the output sort: $p")
        assert(!p.contains("Join"), s"$q must be a pure scan-side pipeline: $p")
      }
  }

  test("ann self-certification: approx and exact sides join on bucketed " +
    "keys only (no cartesian), one row out") {
    val p = plan("q_ann_lsh")
    assert(!p.contains("CartesianProduct"), p)
    val df = graft.SparkEntry.queries("q_ann_lsh")(spark, dir)
    val rows = df.collect()
    assert(rows.length == 1)
    val r = rows(0)
    // the certification contract itself: all anchors above floor, mean
    // above spec — the same row the DuckDB oracle hash-matches
    assert(r.getAs[Long]("n_anchors") == 50)
    assert(r.getAs[Long]("n_ge_floor") == 50)
    assert(r.getAs[Long]("mean_ge_spec") == 1L)
  }

  test("q17: correlated scalar subqueries decorrelate — no nested loop, " +
    "brand filter pushed to the part scan") {
    val p = plan("q17_small_qty_revenue")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    val partScan = p.linesIterator
      .find(l => l.contains("FileScan parquet") && l.contains("part.parquet")).get
    assert(partScan.contains("EqualTo(p_brand,Brand#3)"),
      s"brand predicate must reach the part scan: $partScan")
  }

  test("q18: HAVING prunes before the joins; final order is a top-k, " +
    "not a global sort") {
    val p = plan("q18_large_orders")
    assert(p.contains("TakeOrderedAndProject"), p)
    // the quantity filter sits directly on the aggregate, above the joins
    assert(p.contains("sum_qty") && p.contains("> 150"), p)
    assert(p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning")) == 1,
      s"only the l_orderkey aggregate may shuffle: $p")
  }

  test("q19: disjunctive predicate stays on an equi join; the quantity " +
    "disjunction is pushed to the lineitem scan") {
    val p = plan("q19_disjunctive_pred")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    val liScan = p.linesIterator
      .find(l => l.contains("FileScan parquet") && l.contains("lineitem")).get
    assert(liScan.contains("GreaterThanOrEqual(l_quantity,1.0)"),
      s"quantity disjunction must reach the lineitem scan: $liScan")
  }

  test("q_mix_temperature: the global denominator is a window over the " +
    "aggregate — the fact table is scanned exactly once") {
    val p = plan("q_mix_temperature")
    assert(p.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("documents")) == 1,
      s"q_mix_temperature must scan documents once: $p")
    assert(p.contains("Window"), s"global agg must be a window: $p")
  }

  test("q15: no unpartitioned window — the global max is agg + broadcast " +
    "equality join, and exchange reuse keeps ONE fact shuffle at runtime") {
    val df = graft.SparkEntry.queries("q15_top_supplier")(spark, dir)
    assert(df.collect().nonEmpty) // materialize THIS queryExecution so AQE finalizes
    // AQE final plan only (the toString also replays the pre-AQE initial
    // plan, where the exchanges are still duplicated)
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!p.contains("Window"), s"global window reappeared:\n$p")
    assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage"),
      s"the per-supplier aggregate must be shuffled once and reused:\n$p")
    assert(p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && l.contains("l_suppkey") &&
        !l.contains("Reused")) == 1,
      s"expected exactly one live l_suppkey exchange:\n$p")
    assert(p.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("lineitem")) == 1,
      s"lineitem must be scanned once:\n$p")
  }

  test("q_percentiles: no per-group total order — every window ordering " +
    "by the value column must also partition by the bucket id") {
    val p = plan("q_percentiles")
    // the r6 scale-killer: row_number over partitionBy(l_returnflag)
    // orderBy(l_extendedprice) sorts n/3 rows in one task; the bucketed
    // plan only ever sorts (flag, bucket) partitions
    assert(!("""windowspecdefinition\(l_returnflag#\d+, l_extendedprice""".r
      .findFirstIn(p).isDefined),
      s"per-group total-order window reappeared:\n$p")
    assert(p.contains("windowspecdefinition"), p) // bucket windows remain
    // two-pass structure: bucket-count pass + located-bucket refinement
    assert(p.linesIterator.count(_.contains("FileScan parquet")) == 2,
      s"expected exactly 2 fact scans:\n$p")
  }

  test("q02: correlated min decorrelates to a partkey-partitioned window; " +
    "the part filter prunes the fact before aggregation") {
    val p = plan("q02_min_cost_supplier")
    assert(p.contains("windowspecdefinition(l_partkey"),
      s"min must be a partkey window: $p")
    assert(!p.contains("CartesianProduct"), p)
    val partScan = p.linesIterator
      .find(l => l.contains("FileScan parquet") && l.contains("part.parquet")).get
    assert(partScan.contains("LessThanOrEqual(p_size,5)") &&
      partScan.contains("EqualTo(p_type,SMALL)"),
      s"part filters must be pushed: $partScan")
  }

  test("q11: the global threshold is a 1-row broadcast over the SAME " +
    "per-part aggregate — exchange reuse keeps one fact shuffle at runtime") {
    val df = graft.SparkEntry.queries("q11_important_parts")(spark, dir)
    assert(df.collect().nonEmpty)
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage"),
      s"per-part aggregate must be shuffled once and reused:\n$p")
    assert(p.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("lineitem")) == 1,
      s"lineitem must be scanned once:\n$p")
    assert(!p.contains("Window"), p)
  }

  test("q_stats_drift: the totals side reuses the binned aggregate's " +
    "exchange — one events scan at runtime, no global window") {
    val df = graft.SparkEntry.queries("q_stats_drift")(spark, dir)
    assert(df.collect().nonEmpty)
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage"),
      s"binned aggregate must be shuffled once and reused:\n$p")
    assert(p.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("events")) == 1,
      s"events must be scanned once:\n$p")
    assert(!p.contains("Window"), p)
  }

  test("q_skew_diagnose: candidate keys profiled in ONE events pass — " +
    "scan-side explode below the per-key exchange, two combine-fed aggs") {
    val p = plan("q_skew_diagnose")
    assert(p.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("events")) == 1,
      s"events must be scanned once:\n$p")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 2,
      s"expected the per-key and per-candidate exchanges only:\n$p")
    assert(p.contains("Generate explode"), s"key fan-out must be scan-side:\n$p")
  }

  test("q_quality_classifier: pure scan-side scoring — zero hash " +
    "exchanges before the output ordering") {
    val p = plan("q_quality_classifier")
    assert(!p.contains("Exchange hashpartitioning"),
      s"classifier scoring must not shuffle:\n$p")
    // the scoring scan is the shared scored-docs fixture (one eager
    // build per session; TextAnalysis.scoredDocs): the planned query
    // reads its checkpoint, not the corpus
    assert(p.contains("Scan ExistingRDD") &&
      !p.contains("FileScan parquet"), p)
  }

  test("q_curate_funnel: one hash exchange (the dedup window's prefix-" +
    "hash partition); the window is never global") {
    val p = plan("q_curate_funnel")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
      s"only the h8 window exchange is allowed:\n$p")
    assert(p.contains("windowspecdefinition(h8"),
      s"dedup keep-rule must partition by the prefix hash:\n$p")
    assert(p.linesIterator.count(_.contains("FileScan parquet")) == 1, p)
  }

  test("q09: part filter prunes the fact via broadcast; one fact-fact join " +
    "on orderkey; single aggregation pass") {
    val p = plan("q09_product_profit")
    assert(!p.contains("CartesianProduct"), p)
    val partScan = p.linesIterator
      .find(l => l.contains("FileScan parquet") && l.contains("part.parquet")).get
    assert(partScan.contains("StringContains(p_name,bolt)"),
      s"part name filter must be pushed: $partScan")
    assert(p.linesIterator.count(l =>
      l.contains("HashAggregate") && l.contains("partial_sum")) == 1,
      s"one aggregation pass expected: $p")
  }

  test("q16: NOT IN is a broadcast anti join over the distinct pair set") {
    val p = plan("q16_supplier_diversity")
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q20: the nested IN chain is two semi joins; the per-part total is " +
    "a partkey-partitioned window over the pair aggregate") {
    val p = plan("q20_excess_share_supplier")
    assert(p.linesIterator.count(_.contains("LeftSemi")) == 2, p)
    assert(p.contains("windowspecdefinition(l_partkey"), p)
    val liScan = p.linesIterator
      .find(l => l.contains("FileScan parquet") && l.contains("lineitem")).get
    assert(liScan.contains("GreaterThanOrEqual(l_shipdate"),
      s"date window must reach the lineitem scan: $liScan")
  }

  test("q21: multi-way EXISTS + NOT EXISTS decorrelates to one semi + one " +
    "anti self-join, no correlated nested loop, top-k not a global sort") {
    val p = plan("q21_sole_failing_supplier")
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), s"top-k must not global-sort: $p")
    val ordersScan = p.linesIterator
      .find(l => l.contains("FileScan parquet") && l.contains("orders")).get
    assert(ordersScan.contains("EqualTo(o_orderstatus,F)"),
      s"status filter must reach the orders scan: $ordersScan")
    // every fact self-join leg keys on l_orderkey (co-partitioned at scale)
    Seq("l2_orderkey", "l3_orderkey").foreach { k =>
      assert(p.contains(k), s"self-join leg $k missing: $p")
    }
  }

  test("q22: NOT EXISTS is an anti join with the date filter pushed to " +
    "the orders scan") {
    val p = plan("q22_dormant_customers")
    assert(p.contains("LeftAnti"), p)
    val ordersScan = p.linesIterator
      .find(l => l.contains("FileScan parquet") && l.contains("orders")).get
    assert(ordersScan.contains("GreaterThanOrEqual(o_orderdate"),
      s"date filter must reach the orders scan: $ordersScan")
  }

  test("q_dedup_semantic: candidate pairs come from an equi join on the " +
    "cluster id — never a cartesian; gopher filter is scan-side") {
    val p = plan("q_dedup_semantic")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("a_label") && p.contains("b_label"),
      s"pair join must key on the cluster label: $p")
    val g = plan("q_quality_gopher")
    assert(g.linesIterator.count(_.contains("Exchange")) == 1,
      s"gopher rules must be scan-side, one exchange for the sort: $g")
    assert(!g.contains("Join"), g)
  }

  test("q_pipeline_full: composed curation pipeline fuses — keep-first " +
    "dedup runs map-side (WindowGroupLimit Partial), 2 hash exchanges") {
    val p = plan("q_pipeline_full")
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
      s"rn=1 dedup must reduce map-side before the exchange: $p")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 2,
      s"exactly dedup-key + agg-key exchanges expected: $p")
    assert(p.linesIterator.count(_.contains("FileScan")) == 1, p)
  }

  test("global-window allowlist: no registered query plans a partition-less " +
    "WindowExec unless pinned here") {
    import org.apache.spark.sql.execution.window.WindowExec
    // queries whose FUNCTIONS run eagerly (streams driven to completion,
    // avro/orc/csv fixture writes, persisted dedup index) — conversion
    // paths with no window analytics; excluded so the sweep stays a pure
    // planning pass
    val eager = Set(
      "q_stream_tumbling", "q_stream_recovery", "q_stream_session",
      "q_stream_dedup",
      "q_stream_join", "q_stream_outer_join", "q_stream_static_join",
      "q_stream_quality", "q_stream_abtest", "q_stream_cdc_apply",
      "q_cdc_convert_roundtrip", "q_cdc_convert_exact", "q_cdc_dsv2_scan",
      "q_cdc_schema_evolution", "q_observe_metrics",
      "q_cdc_catalog", "q_csv_json_roundtrip", "q_orc_roundtrip",
      "q_malformed_quarantine", "q_binary_source", "q_dedup_incremental",
      "q_compact_files", "q_multimodal_shard_write")
    // queries ALLOWED a partition-less window, each because the window
    // input is a bounded post-aggregate (dimension-scale), never the fact:
    //  - q_mix_temperature: denominator over per-lang aggregate (~#langs
    //    rows; TextAnalysis.qMixTemperature scaladoc)
    //  - q_events_cum_users: running sum over per-day new-user counts
    //    (~#days rows; EventOps.qEventsCumulativeUsers scaladoc)
    //  - q_vocab_growth: running totals over the TEN decile rows
    //    (decile-cardinality by construction; TextAnalysis.qVocabGrowth
    //    scaladoc)
    //  - q_text_rrf: rank windows over the two FIFTEEN-row top-k lists
    //    (TakeOrdered bounds them; TextModels.qTextRrf scaladoc)
    //  - q_events_survival: at-risk reverse running sum over the
    //    per-lifetime life table (calendar-bounded, ~#days rows;
    //    EventStats.qEventsSurvival scaladoc)
    //  - q_skyline: running-max frontier test over the per-size maxima
    //    (bounded by the size DOMAIN, ~50 rows; Relational.qSkyline
    //    scaladoc)
    //  - q_events_changepoint: row_number + running sum over the per-day
    //    count series (calendar-bounded, ~#days rows;
    //    EventStats.qEventsChangepoint scaladoc)
    //  - q_text_zipf: rank window over the LIMIT-100 bigram cut
    //    (TakeOrdered bounds it; TextEval.qTextZipf scaladoc)
    // q_stats_ks also runs a partition-less CDF window over its ~100-row
    // bin table, but behind an eager localCheckpoint — the planned query
    // no longer contains it, so it needs no pin (bound documented in
    // EventStats.qStatsKs scaladoc).
    val allow = Set("q_mix_temperature", "q_events_cum_users",
      "q_vocab_growth", "q_text_rrf", "q_events_survival", "q_skyline",
      "q_events_changepoint", "q_text_zipf")
    val offenders = graft.SparkEntry.queries.keys.toSeq.sorted
      .filterNot(eager)
      .filter { name =>
        val p = graft.SparkEntry.queries(name)(spark, dir)
          .queryExecution.sparkPlan
        p.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }.nonEmpty
      }
    assert(offenders.toSet == allow,
      s"partition-less WindowExec drift — found ${offenders.sorted}, " +
        s"allowlist ${allow.toSeq.sorted}; either fix the plan or pin it " +
        "here with a bounded-input rationale")
  }

  test("q_join_dpp: the fact scan carries a DynamicPruningExpression on " +
    "its partition column and the dim side broadcasts") {
    val p = plan("q_join_dpp")
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"dynamic partition pruning must be planned: $p")
    assert(p.contains("BroadcastHashJoin"),
      s"the campaign dim must broadcast (DPP reuses that exchange): $p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_spatial_join: radius join is an equi join on the grid cell — " +
    "never a nested loop; the 9x fan-out stays on one side") {
    val p = plan("q_spatial_join")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("jx") && p.contains("jy"),
      s"candidate join must key on the probed cell: $p")
  }

  test("q_dedup_bloom: one OR-reduction pass builds the bitmap, the probe " +
    "rides the scan — no shuffle of probe rows before the final aggregate") {
    val p = plan("q_dedup_bloom")
    // the bitmap (1 row) and member chunk set reach the probe side as
    // broadcasts; the probe chunks themselves never sort-merge
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p)
    // the bloom aggregate runs partial (map-side OR) before its exchange
    assert(p.contains("partial_bloombitsagg"), p)
  }

  test("q_text_bm25: df and corpus stats are broadcast; only query-term " +
    "postings and per-doc lengths shuffle") {
    val p = plan("q_text_bm25")
    val smj = p.linesIterator.count(_.contains("SortMergeJoin"))
    // dl join may sort-merge (both sides doc-keyed aggregates); df and
    // the 1-row stats must NOT
    assert(smj <= 1, s"expected at most the tf⋈dl join to sort-merge:\n$p")
    assert(p.linesIterator.count(_.contains("BroadcastExchange")) >= 2, p)
    // the query-term filter rides the token scan, before any exchange
    assert(p.contains("hash#") || p.contains("query"), p)
  }

  test("catalog scan: column pruning reaches the cdc-avro table") {
    val root = java.nio.file.Files.createTempDirectory("graft-audit-cat")
      .toFile.getAbsolutePath
    graft.avro.AvroFixtures.writeAvro(s"$root/avro/t/a.avro",
      graft.avro.AvroFixtures.BasicEnvelope, Seq(
        Map("uuid" -> "u", "read_timestamp" -> 0L,
          "source_metadata" -> graft.avro.AvroFixtures.sm("t"),
          "payload" -> Map("id" -> 1L, "name" -> "n", "qty" -> 2))))
    spark.conf.set("spark.sql.catalog.cdc_audit",
      classOf[graft.sources.AvroCdcCatalog].getName)
    spark.conf.set("spark.sql.catalog.cdc_audit.root", root)
    val p = spark.sql("SELECT id FROM cdc_audit.t")
      .queryExecution.executedPlan.toString
    assert(p.contains("columns=[id]"), s"scan must prune to id: $p")
  }

  test("q_cluster_kmeans: centroids broadcast to the corpus (assignment " +
    "never shuffles points) and the update combines map-side") {
    val p = plan("q_cluster_kmeans")
    // both Lloyd assignments join the corpus against a ONE-ROW packed
    // centroid aggregate — broadcast, never a repartition of the points
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"),
      "assignment must not shuffle the corpus against centroids")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    // the centroid update partial-aggregates the exploded (cluster, dim)
    // integer sums before its exchange — the map-side combine that keeps
    // the shuffle O(tasks * k * dims)
    assert(p.contains("partial_sum"), p)
    val exIdx = p.indexOf("Exchange hashpartitioning")
    assert(exIdx >= 0 && p.indexOf("partial_sum", exIdx) > 0,
      "centroid-update exchange must be fed by a partial aggregate")
  }

  test("q_dedup_containment: anchor shingles broadcast — the corpus probes " +
    "them without shuffling, and only matched pairs reach the aggregation") {
    val p = plan("q_dedup_containment")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      "corpus must not shuffle to meet the anchors")
    val hashEx = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.nonEmpty && hashEx.forall(l =>
      l.contains("d1") && l.contains("d2")),
      s"only the pair aggregation may hash-exchange:\n${hashEx.mkString("\n")}")
  }

  test("q_ann_rerank: anchors broadcast; the shortlist rank-filter runs " +
    "map-side so only C candidates per anchor pay the full-dim dot") {
    val p = plan("q_ann_rerank")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // the row_number <= C shortlist cut plans as a WindowGroupLimit,
    // whose Partial mode drops non-candidates before the exchange
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q_quantile_sketch: the fact pays one combine-fed shuffle on " +
    "(group, bin); all windows partition by the group") {
    val p = plan("q_quantile_sketch")
    assert(p.contains("partial_count"), p)
    val hashEx = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.count(_.contains("bin")) == 1,
      s"exactly one fact shuffle keyed on the bin:\n${hashEx.mkString("\n")}")
    assert(hashEx.forall(_.contains("l_returnflag")), hashEx.mkString("\n"))
  }

  test("q_multimodal_resize: ONE png decode per row — the struct-returning " +
    "expression stays in its own projection, never inlined per field") {
    val p = plan("q_multimodal_resize")
    // exactly one decode: the four readouts (width/height/brightness/
    // resized) extract from ONE png_decode_stats struct; a CollapseProject
    // regression (or a revert to per-stat expressions) would print the
    // decode — or png_brightness/png_resize4 — once per consumed field
    assert(p.sliding("png_decode_stats".length).count(
      _ == "png_decode_stats") == 1,
      s"q_multimodal_resize must decode exactly once per row: $p")
    assert(!p.contains("png_brightness") && !p.contains("png_resize4"),
      s"per-stat decoders would re-run the full inflate per field: $p")
    // and the decode is still scan-side: only the presentation sort
    // exchanges
    assert(p.linesIterator.count(_.contains("Exchange")) == 1,
      s"q_multimodal_resize must stay a pure scan-side pipeline: $p")
  }

  test("q_audio_pcm / q_multimodal_vad: ONE payload fold per row — the " +
    "filter gates on the walk-only count, readouts extract from one struct") {
    Seq(("q_audio_pcm", "wav_pcm_stats", "wav_pcm_samples",
      Seq("wav_pcm_sum_sq", "wav_pcm_peak")),
      ("q_multimodal_vad", "wav_vad_stats", "wav_vad_frames",
        Seq("wav_vad_active", "wav_vad_run"))).foreach {
      case (q, structFn, gateFn, perStat) =>
        val p = plan(q)
        assert(p.sliding(structFn.length).count(_ == structFn) == 1,
          s"$q must fold the payload exactly once: $p")
        perStat.foreach(f => assert(!p.contains(f),
          s"$q: per-stat fold $f would re-run the whole-payload pass: $p"))
        // the zero-row gate costs a header walk, not a fold
        assert(p.contains(gateFn), s"$q must gate on the walk-only count: $p")
        assert(p.linesIterator.count(_.contains("Exchange")) == 1,
          s"$q must stay a pure scan-side pipeline: $p")
    }
  }

  test("q_image_dedup: encode+decode+hash are one scan-side projection — " +
    "the only exchange keys on the hash") {
    val p = plan("q_image_dedup")
    assert(p.contains("png_ahash"), p)
    val exIdx = p.indexOf("Exchange hashpartitioning")
    assert(exIdx >= 0 && p.indexOf("png_ahash", exIdx) > 0,
      "codec work must happen below the hash-key exchange")
    val hashEx = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.forall(_.contains("ahash")), hashEx.mkString("\n"))
  }

  test("q_image_neardup: codec work stays below the hash-key exchange; " +
    "pairing runs over the distinct-hash aggregate, never all corpus pairs") {
    val p = plan("q_image_neardup")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("png_ahash"), p)
    // the corpus-sized exchange keys on the 64-bit hash; the band
    // self-join happens above that aggregate (distinct-content scale)
    val exIdx = p.indexOf("Exchange hashpartitioning")
    assert(exIdx >= 0 && p.indexOf("png_ahash", exIdx) > 0,
      "codec projection must sit below the first exchange")
    assert(p.contains("& 65535"), "banding must extract 16-bit words")
  }

  test("q_dedup_ppjoin: candidate generation joins on the token key — " +
    "no cartesian, no nested loop; pair dedup is combine-fed") {
    val p = plan("q_dedup_ppjoin")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    // the candidate join is an equi-join on the prefix token (hash or
    // sort-merge depending on stats — never a product)
    assert(p.linesIterator.exists(l =>
      (l.contains("HashJoin") || l.contains("SortMergeJoin")) &&
        l.contains("[p#")),
      s"candidate join must key on the prefix token: $p")
    // the tokenized corpus is checkpointed (df count + canonical order ran
    // once, eagerly); the final plan reads only the materialization
    assert(!p.contains("FileScan") && p.contains("Scan ExistingRDD"),
      s"final plan must read the checkpointed tokenized corpus: $p")
    // no token ARRAY rides the exploded prefix shuffle: the join inputs
    // carry only (doc, size, prefix); pairs dedup on the pair key, then
    // the arrays are fetched once per side by doc-keyed joins
    val hashEx = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.exists(l => l.contains("d1#") && l.contains("d2#")),
      s"pair dedup must key on the pair:\n${hashEx.mkString("\n")}")
    assert(!hashEx.exists(_.contains("toks")),
      s"token arrays must not cross a shuffle:\n${hashEx.mkString("\n")}")
    assert(p.linesIterator.exists(l =>
      (l.contains("HashJoin") || l.contains("SortMergeJoin")) &&
        l.contains("[d1#")) &&
      p.linesIterator.exists(l =>
        (l.contains("HashJoin") || l.contains("SortMergeJoin")) &&
          l.contains("[d2#")),
      s"array fetches must be doc-keyed equi-joins: $p")
  }

  test("q_embed_covariance: pair terms are scan-side; one combine-fed " +
    "exchange on the 36 dimension pairs; no join anywhere") {
    val p = plan("q_embed_covariance")
    assert(p.contains("partial_sum"), p)
    val hashEx = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.length == 1 && hashEx.head.contains("di") &&
      hashEx.head.contains("dj"), hashEx.mkString("\n"))
    assert(!p.contains("Join"), s"no join belongs in this plan: $p")
  }

  test("q_events_pagerank: the corpus pays one user_id shuffle (inside " +
    "the shared transition fixture); the walk is a driver-side model") {
    val p = plan("q_events_pagerank")
    // the corpus pass lives in the typeTransitions fixture; the returned
    // plan presents a |types|-row LOCAL result — no file scan, no corpus
    // shuffle, no join machinery can remain
    assert(!p.contains("FileScan"),
      s"final plan must present only the local model result: $p")
    assert(p.contains("LocalTableScan") || p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("Join"), s"no join belongs in this plan: $p")
  }

  test("q_text_winnow: the whole selection runs as one scan-side kernel — " +
    "zero hash exchanges, no window, no explode") {
    val p = plan("q_text_winnow")
    assert(!p.contains("Exchange hashpartitioning"),
      s"winnowing is per-doc sequential — nothing may shuffle: $p")
    assert(p.contains("winnowstats") || p.contains("WinnowStats") ||
      p.toLowerCase.contains("winnow"),
      s"kernel must appear in the scan-side project: $p")
    // executedPlan.toString strips the Exec suffix ("Window ", not
    // "WindowExec") — matching the printed form so a reintroduced window
    // can actually trip this
    assert(!p.contains("Window ") && !p.contains("Generate"),
      s"no window sort or gram explode may remain: $p")
  }

  test("q_bpe_pairs: explodes stay scan-side (partial agg feeds the only " +
    "hash exchange) and the top-20 is a top-k, not a global sort") {
    val p = plan("q_bpe_pairs")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 must be a top-k operator: $p")
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
    // distinct-word support is the Expand two-phase distinct; the only
    // hash exchanges key on the pair (alphabet-bounded), never on the
    // exploded token stream
    val hashEx = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.nonEmpty && hashEx.forall(_.contains("pair")),
      hashEx.mkString("\n"))
  }

  test("q_graph_triangles: wedge and closing joins are equi-joins over " +
    "the checkpointed edge list; top-20 is a top-k; no cartesian") {
    val p = plan("q_graph_triangles")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("TakeOrderedAndProject(limit=20"),
      s"top-20 must be a top-k operator: $p")
    // the corpus scan + quadratic pair step ran once, eagerly, into the
    // localCheckpoint — the executed plan reads only the materialized
    // graph (ExistingRDD), never a file
    assert(!p.contains("FileScan"),
      s"final plan must read the checkpointed graph, not the corpus: $p")
    assert(p.contains("Scan ExistingRDD"), p)
    // wedge join keys on the pivot node; the triangle-closing join keys
    // on the (v, w) endpoint pair — both real equi-joins
    val joins = p.linesIterator.filter(l =>
      l.contains("SortMergeJoin") || l.contains("HashJoin")).toSeq
    assert(joins.exists(l => l.contains("[u#") && l.contains("(rv#")),
      s"wedge join must key on the pivot with the rank-order condition:\n$p")
    assert(joins.exists(l => l.contains("[v#") && l.contains("w#")),
      s"closing join must key on the endpoint pair:\n$p")
    assert(p.contains("partial_count"), p)
  }

  test("q_vocab_growth: no global row-number over the corpus — deciles " +
    "come from integer id arithmetic; shuffles key on shingle and decile") {
    val p = plan("q_vocab_growth")
    assert(!p.contains("row_number"),
      s"decile must be id arithmetic, not a global rank: $p")
    val hashEx = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.exists(_.contains("s#")) && hashEx.exists(_.contains("dec#")),
      s"first-occurrence and token-mass shuffles:\n${hashEx.mkString("\n")}")
    // the only single-partition stages are decile-cardinality (10 rows)
    // and the doc-count row
    assert(p.contains("partial_count"), p)
  }

  test("q_join_bucketed: the fact-fact join reads co-located buckets — " +
    "zero exchanges on the join key; only the rollup shuffles") {
    // pin the at-scale regime: with two large facts neither side
    // broadcasts, and the bucketed layout must carry the join alone
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val p = try plan("q_join_bucketed")
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    assert(p.linesIterator.exists(l =>
      l.contains("FileScan") && l.contains("Bucketed: true")),
      s"both sides must scan bucketed layouts: $p")
    val hashEx = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(!hashEx.exists(_.contains("orderkey")),
      s"bucketed join must not re-shuffle the join key:\n${hashEx.mkString("\n")}")
    assert(hashEx.forall(_.contains("o_orderpriority")),
      s"only the rollup exchange may exist:\n${hashEx.mkString("\n")}")
    assert(p.contains("SortMergeJoin"), p)
  }

  test("q_layout_comodal: the cross-modal join reads co-bucketed " +
    "modalities — zero exchanges on doc_id; only the lang rollup shuffles") {
    // at-scale regime: both modalities are corpus-sized, neither
    // broadcasts — the co-bucketed layout must carry the join alone
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val p = try plan("q_layout_comodal")
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    assert(p.linesIterator.exists(l =>
      l.contains("FileScan") && l.contains("Bucketed: true")),
      s"both modalities must scan bucketed layouts: $p")
    val hashEx = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(!hashEx.exists(_.contains("doc_id")),
      s"co-bucketed modalities must not re-shuffle doc_id:\n${hashEx.mkString("\n")}")
    assert(hashEx.forall(_.contains("lang")),
      s"only the lang rollup exchange may exist:\n${hashEx.mkString("\n")}")
    assert(p.contains("SortMergeJoin"), p)
  }

  test("q_market_basket: support sides broadcast; the top-5 cut runs " +
    "map-side (partial WindowGroupLimit) before the part exchange") {
    val p = plan("q_market_basket")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) == 2,
      s"both support joins must broadcast: $p")
    assert(p.contains("WindowGroupLimit") && p.contains(", Partial"),
      s"rank cut must drop rows before the exchange: $p")
    assert(!p.contains("FileScan") && p.contains("Scan ExistingRDD"),
      s"final plan must read the checkpointed basket list: $p")
  }

  test("q_events_engagement: sessions aggregate WITHOUT a (user, sid) " +
    "re-shuffle — only the user and opener exchanges exist") {
    val p = plan("q_events_engagement")
    assert(!p.contains("Join"), p)
    val hashEx = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.length == 2, s"user + opener only:\n${hashEx.mkString("\n")}")
    assert(hashEx.exists(l => l.contains("user_id") && !l.contains("sid")), p)
    assert(hashEx.exists(_.contains("opener")), p)
    assert(p.linesIterator.filter(_.contains("windowspecdefinition"))
      .forall(_.contains("user_id")), p)
  }

  test("q_partitioned_layout: the week predicate resolves against " +
    "partition metadata — PartitionFilters on the scan, dt never a " +
    "data filter") {
    val p = plan("q_partitioned_layout")
    val scan = p.linesIterator.filter(_.contains("FileScan")).toSeq
    assert(scan.exists(l => l.contains("PartitionFilters: [") &&
      l.contains("2024-01-08")),
      s"week bounds must be partition filters:\n${scan.mkString("\n")}")
    assert(scan.forall(l =>
      !l.contains("PushedFilters: [IsNotNull(dt") &&
        !l.contains("DataFilters: [isnotnull(dt")),
      s"dt must never reach the data filters:\n${scan.mkString("\n")}")
    assert(!p.contains("Join"), p)
  }

  test("q_events_streaks: gaps-and-islands needs no self-join; rollups " +
    "reuse the user shuffle; top-20 is a top-k") {
    val p = plan("q_events_streaks")
    assert(!p.contains("Join"), s"islands must come from the window: $p")
    assert(p.contains("TakeOrderedAndProject(limit=20"), p)
    val hashEx = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.length <= 2 && hashEx.forall(_.contains("user_id")),
      s"distinct + window only; rollups reuse:\n${hashEx.mkString("\n")}")
  }

  test("q_events_attribution: breaks, opener carry, and conversion filter " +
    "share ONE user shuffle — no session-id re-shuffle, no join") {
    val p = plan("q_events_attribution")
    assert(!p.contains("Join"), p)
    val hashEx = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.count(l => l.contains("user_id") && !l.contains("first_touch")) == 1,
      s"windows must share one user_id shuffle:\n${hashEx.mkString("\n")}")
    assert(!hashEx.exists(_.contains("sid")),
      "a session-id exchange means the LOCF fusion broke")
    assert(p.linesIterator.filter(_.contains("windowspecdefinition"))
      .forall(_.contains("user_id")), p)
    assert(p.contains("partial_count"), p)
  }

  test("q_graph_kcore: the converged plan reads only checkpointed graph " +
    "state; induced-degree joins key on the node") {
    val p = plan("q_graph_kcore")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("FileScan"),
      s"final plan must read the checkpointed graph, not the corpus: $p")
    assert(p.contains("Scan ExistingRDD"), p)
    assert(p.linesIterator.exists(l =>
      (l.contains("HashJoin") || l.contains("SortMergeJoin")) &&
        (l.contains("pa#") || l.contains("pb#"))),
      s"survivor joins must key on the edge endpoints: $p")
    assert(p.contains("partial_count"), p)
  }

  test("q_dedup_canonical: the keep decision is one combine-fed aggregate " +
    "on the cluster key — no rank window; quality scan is pruned") {
    val p = plan("q_dedup_canonical")
    assert(!p.contains("Window"),
      s"argmax must be the packed-struct min aggregate, not a rank window: $p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("partial_min") || p.contains("partial_count"), p)
    // the quality join reads only (doc_id, n_chars) from the corpus
    val scanLine = p.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("documents")).toSeq
    assert(scanLine.nonEmpty &&
      scanLine.forall(_.contains("ReadSchema: struct<doc_id:bigint,n_chars:bigint>")),
      s"documents scan must prune to the two quality columns:\n${scanLine.mkString("\n")}")
  }

  test("q_ann_ivf_sq8: candidates join on the inverted-list key; the " +
    "compressed cut is a WindowGroupLimit before the exact refine") {
    val p = graft.ops.Similarity.qAnnIvfSq8(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"in-list scan must be an equi-join on list_id: $p")
    assert(p.linesIterator.exists(l =>
      (l.contains("HashJoin") || l.contains("SortMergeJoin")) &&
        l.contains("list_id")), p)
    // both rank cuts (int8 shortlist, exact top-10) plan as group limits
    // that drop rows before their exchanges
    assert(p.linesIterator.count(_.contains("WindowGroupLimit")) >= 2, p)
    assert(!p.contains("%"), "modulo anchor rule reappeared")
  }

  test("q_text_postings: two combine-fed shuffles — (token, doc) then " +
    "token; the posting list is a partial collect; no join") {
    val p = plan("q_text_postings")
    assert(!p.contains("Join"), s"index build must be pure aggregation: $p")
    val hashEx = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.length == 2, s"exactly two shuffles:\n${hashEx.mkString("\n")}")
    assert(p.contains("partial_collect_list"),
      s"posting list must combine map-side: $p")
    assert(p.contains("partial_count"), p)
  }

  test("q_text_pmi: bigrams explode scan-side (no adjacency self-join); " +
    "unigram sides broadcast; top-30 is a top-k") {
    val p = plan("q_text_pmi")
    assert(p.contains("TakeOrderedAndProject(limit=30"), p)
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) == 2,
      s"both unigram joins must broadcast: $p")
    assert(!p.contains("SortMergeJoin"), p)
    val hashEx = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.exists(l => l.contains("w1#") && l.contains("w2#")),
      s"pair counts must key on the bigram:\n${hashEx.mkString("\n")}")
  }

  test("q_quality_normalize: both windows share ONE group-key shuffle; " +
    "no join anywhere") {
    val p = plan("q_quality_normalize")
    assert(!p.contains("Join"), p)
    val hashEx = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.length == 1 && hashEx.head.contains("lang"),
      s"rank + count must reuse one lang shuffle:\n${hashEx.mkString("\n")}")
    assert(p.linesIterator.count(_.trim.startsWith("+- Window")) +
      p.linesIterator.count(_.trim.startsWith(":- Window")) >= 1, p)
  }

  test("q_text_rrf: both sources end in top-k cuts before fusion; the " +
    "fused output is a TakeOrdered top-10 on the integer score") {
    val p = plan("q_text_rrf")
    assert(p.contains("TakeOrderedAndProject(limit=10"), p)
    assert(p.contains("FullOuter"),
      s"fusion must keep docs present in only one source: $p")
    assert(!p.contains("CartesianProduct"), p)
    // the two rank windows run over TakeOrdered-bounded 15-row inputs
    assert(p.linesIterator.count(_.contains("TakeOrderedAndProject")) >= 2, p)
  }

  test("q_text_boilerplate: the boilerplate set broadcasts to a " +
    "scan-side tag join; reassembly shuffles once on doc_id") {
    val p = plan("q_text_boilerplate")
    assert(p.contains("BroadcastHashJoin"),
      s"the tag join must broadcast the boilerplate set: $p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("partial_count"), p)
    val hashEx = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.exists(_.contains("doc_id")),
      s"reassembly must key on doc_id:\n${hashEx.mkString("\n")}")
  }

  test("q_embed_centroid_eval: the 10-row centroid table broadcasts into " +
    "a scan-side score; the rank-1 cut runs map-side") {
    val p = plan("q_embed_centroid_eval")
    assert(!p.contains("CartesianProduct"),
      s"score join must be the broadcast of the centroid table: $p")
    assert(p.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) <= 1, p)
    assert(p.contains("WindowGroupLimit"),
      s"rank-1 cut must drop rows before the vec_id exchange: $p")
    val hashEx = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.exists(l => l.contains("label") && l.contains("i#")),
      s"centroid sums must shuffle on (label, dim):\n${hashEx.mkString("\n")}")
    assert(p.contains("partial_sum"), p)
  }

  test("q_heavy_hitters_grouped: sketch is map-side partial-merged and " +
    "shuffles only on the group key; certification joins broadcast") {
    val p = plan("q_heavy_hitters_grouped")
    assert(p.contains("partial_misragriesagg"),
      s"sketch must partial-merge map-side: $p")
    assert(p.linesIterator.exists(l =>
      l.contains("ObjectHashAggregate(keys=[lang") &&
        l.contains("partial_misragriesagg")),
      s"sketch partial aggregate must key on the group only: $p")
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) == 2,
      s"both certification joins must broadcast (group-sized sides): $p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q_join_bloom: bitmap probe filters the fact BELOW its exchange; " +
    "the key join stays a shuffle join (the modeled too-big-to-broadcast " +
    "case)") {
    val p = plan("q_join_bloom")
    assert(p.contains("ShuffledHashJoin"),
      s"key join must be shuffle-hash (pinned by hint): $p")
    val exIdx = p.indexOf("Exchange hashpartitioning(l_orderkey")
    assert(exIdx >= 0, s"fact side must shuffle on the join key: $p")
    // the probe's bit test (shiftleft over the broadcast bitmap) is unique
    // to the filter — the build side OR-reduces positions without it
    val probeIdx = p.indexOf("shiftleft")
    // plans print top-down: the probe filter must sit INSIDE (after) the
    // fact-side exchange subtree, i.e. rows die before shuffling
    assert(probeIdx > exIdx,
      s"bloom probe must run scan-side, below the fact exchange: $p")
    // the bitmap rides a single-row broadcast; no other nested-loop join
    assert(p.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) <= 1, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_dedup_url: canonicalization runs scan-side (kernel below the " +
    "only hash exchange); no join anywhere; scan pruned to 2 columns") {
    val p = plan("q_dedup_url")
    val exIdx = p.indexOf("Exchange hashpartitioning")
    val kIdx = p.indexOf("urlcanonicalexpr")
    assert(exIdx >= 0 && kIdx > exIdx,
      s"url_canonical must evaluate below the aggregate exchange: $p")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1, p)
    assert(!p.contains("Join"), s"linear dedup must not join: $p")
    assert(p.contains("partial_count"), "map-side combine required")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,source:string>"),
      s"documents scan must prune to (doc_id, source): $p")
  }

  test("q_pack_sequences: ONE hash exchange (the group key), the doc_id " +
    "sort rides the shuffle, and the text scan prunes to 3 columns") {
    val p = plan("q_pack_sequences")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
      s"packing is one group-key shuffle: $p")
    assert(p.contains("MapGroups"), p)
    // the per-group doc_id order is a LOCAL sort (global=false) feeding
    // MapGroups — not a second global exchange
    assert(p.linesIterator.exists(l => l.contains("Sort [") &&
      l.contains("doc_id") && l.contains("], false, 0")),
      s"group sort must be local under the exchange: $p")
    assert(p.contains(
      "ReadSchema: struct<doc_id:bigint,text:string,source:string>"), p)
  }

  test("q_ann_refresh: history rides the persisted index state — the " +
    "merge path scans embeddings once (the delta); the second scan is " +
    "the in-plan rebuild used as the identity proof") {
    val p = plan("q_ann_refresh")
    assert(p.contains("graft_ann_ivf_state"),
      s"history must come from the persisted list table: $p")
    val embScans = p.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("embeddings.parquet"))
    assert(embScans == 2,
      s"exactly delta + rebuild scans expected, got $embScans:\n$p")
    assert(p.contains("% 5) = 0"),
      s"the merge-side scan must be delta-filtered: $p")
  }

  test("q_dedup_substring: window hashes are generated scan-side (kernel " +
    "below every exchange); both exchanges are long-keyed and combine-fed") {
    val p = plan("q_dedup_substring")
    val kIdx = p.indexOf("wordwindowhashes")
    val exIdx = p.indexOf("Exchange hashpartitioning")
    assert(kIdx > exIdx && exIdx >= 0,
      s"window kernel must evaluate below the exchanges: $p")
    assert(p.contains("partial_count"), "occurrence count must map-combine")
    assert(!p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"documents scan must prune to (doc_id, text): $p")
  }

  test("q_mix_epochs: the epoch explode stays scan-side below the single " +
    "combine-fed rollup exchange") {
    val p = plan("q_mix_epochs")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
      s"one rollup exchange expected: $p")
    val gen = p.indexOf("Generate explode")
    val ex = p.indexOf("Exchange hashpartitioning")
    assert(gen > ex && ex >= 0, s"explode must run below the exchange: $p")
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
  }

  test("q_matview_merge: refresh scans the fact ONCE (delta only, date " +
    "filter pushed); history comes from compact state") {
    val p = plan("q_matview_merge")
    val orderScans = p.linesIterator.filter(l =>
      l.contains("FileScan parquet") && l.contains("orders.parquet")).toSeq
    assert(orderScans.size == 1,
      s"exactly one fact scan (the delta side), got ${orderScans.size}:\n$p")
    assert(orderScans.head.contains("GreaterThanOrEqual(o_orderdate"),
      s"delta date filter must be pushed into the fact scan: ${orderScans.head}")
    assert(p.contains("graft_mv_orders_state"),
      s"history side must read the materialized state file: $p")
    assert(p.contains("partial_sum"), "merge must partial-aggregate map-side")
  }

  test("bfs: hint-free visited-set anti-join still plans small-side " +
    "(AQE broadcasts it at runtime; a forced hint would be a driver " +
    "hazard on an unbounded node domain)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val e = GraphOps.coPurchaseEdges(spark, dir)
    val adj = e.select(col("pa").as("node"), col("pb").as("nbr"))
      .unionByName(e.select(col("pb").as("node"), col("pa").as("nbr")))
    val src = e.agg(least(min(col("pa")), min(col("pb"))).as("p"))
      .collect().head.getLong(0)
    import spark.implicits._
    // round-1 shape of qGraphBfs, verbatim: frontier inner join keeps its
    // hint (one-row level table), visited anti-join is hint-free
    val dist = Seq((src, 0L)).toDF("node", "dist").localCheckpoint()
    val discovered = adj
      .join(broadcast(dist.select(col("node"))), "node")
      .select(col("nbr").as("node"))
      .join(dist.select(col("node")), Seq("node"), "left_anti")
      .groupBy(col("node")).agg(count(lit(1)).as("n"))
    discovered.collect()
    val p = discovered.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case other => other.toString
    }
    val anti = p.linesIterator.filter(_.contains("LeftAnti")).toSeq
    assert(anti.nonEmpty, s"no anti-join in plan:\n$p")
    assert(anti.forall(_.contains("BroadcastHashJoin")),
      s"visited-set anti-join must plan broadcast-small-side at this SF:\n$p")
  }
}
