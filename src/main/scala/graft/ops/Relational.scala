package graft.ops

import Checkpoints._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator coverage over the TPC-H-ish test tables: scans with
  * pushdown, aggregations, joins of every flavor, window functions,
  * rollup/cube, set operations, subqueries, pivot, top-k.
  *
  * Every query is paired with equivalent ANSI SQL (the DuckDB oracle).
  * Conventions that keep the hash-compare honest across engines:
  *  - every computed column is aliased identically on both sides;
  *  - double aggregates are rounded (sums of binary fractions differ in the
  *    last ulp across summation orders);
  *  - every query has a total deterministic ORDER BY.
  *
  * Scale notes (100 TB posture): group-bys aggregate partially map-side;
  * the dimension sides of joins (nation/region/part/supplier/customer at
  * their natural scale) are broadcast; no collect()s anywhere; sorts are
  * either top-k (global limit pushed into TakeOrderedAndProject) or
  * partition-local.
  */
object Relational {

  // ---------- q01: pricing summary (scan → partial agg → final agg) ----------
  def q01PricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity").as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_base_price"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("sum_disc_price"),
        round(avg($"l_quantity"), 4).as("avg_qty"),
        round(avg($"l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")

  val q01Oracle: String =
    """SELECT l_returnflag, l_linestatus,
      sum(l_quantity) AS sum_qty,
      round(sum(l_extendedprice), 2) AS sum_base_price,
      round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
      round(avg(l_quantity), 4) AS avg_qty,
      round(avg(l_discount), 4) AS avg_disc,
      count(*) AS count_order
      FROM lineitem GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""

  // ---------- q02: global top-k with tie-break (TakeOrderedAndProject) ----------
  def q02TopkOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_custkey", round($"o_totalprice", 2).as("price"),
        $"o_orderdate")
      .orderBy($"price".desc, $"o_orderkey".asc)
      .limit(20)

  val q02Oracle: String =
    """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price, o_orderdate
      FROM orders ORDER BY price DESC, o_orderkey ASC LIMIT 20"""

  // ---------- q03: selective join + agg + top-k ----------
  def q03ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).filter($"c_mktsegment" === "BUILDING")
    val ord = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .groupBy($"o_orderkey", $"o_orderdate")
      .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"))
      .orderBy($"revenue".desc, $"o_orderkey".asc)
      .limit(10)
  }

  val q03Oracle: String =
    """SELECT o_orderkey, o_orderdate,
      round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
      GROUP BY o_orderkey, o_orderdate
      ORDER BY revenue DESC, o_orderkey ASC LIMIT 10"""

  // ---------- q05: multi-way join through the star schema ----------
  def q05LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(spark, dir)
    val n = Tables.nation(spark, dir)
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    val s = Tables.supplier(spark, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(s), l("l_suppkey") === s("s_suppkey") &&
        c("c_nationkey") === s("s_nationkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy($"n_name")
      .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"))
      .orderBy($"n_name")
  }

  val q05Oracle: String =
    """SELECT n_name,
      round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY n_name ORDER BY n_name"""

  // ---------- q06: pure scan + filter + agg (full pushdown showcase) ----------
  /** TPC-H Q6 shape: a single selective scan with every predicate pushed
    * to the parquet reader (shipdate band, discount band, quantity cap)
    * and a two-column ReadSchema — the query whose plan proves the
    * scan-side machinery (PushedFilters + column pruning) is working.
    * At 100 TB the date band additionally prunes partitions when the
    * table is date-partitioned; no shuffle at all (partial + final agg
    * over a single global group).
    */
  def q06ForecastRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-01-01").cast("timestamp") &&
        $"l_discount".between(0.02, 0.04) && $"l_quantity" < 24)
      .agg(round(sum($"l_extendedprice" * $"l_discount"), 2).as("revenue"),
        count(lit(1)).as("n_items"))

  val q06Oracle: String =
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
      count(*) AS n_items
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount BETWEEN 0.02 AND 0.04 AND l_quantity < 24"""

  // ---------- q04: correlated EXISTS with a date window ----------
  /** TPC-H Q4 shape: priority distribution of orders in a date window that
    * have at least one late line item. The correlated EXISTS becomes a
    * LEFT SEMI join — Spark dedups order keys inside the join instead of
    * materializing the multiplied order×lineitem rows, and the EXISTS
    * predicate (shipped > 60 days after the order date, this schema's
    * stand-in for Q4's `l_commitdate < l_receiptdate`) rides the join
    * condition. At scale both sides shuffle once on orderkey; the date
    * window prunes the orders scan before the shuffle, and the aggregate
    * is 5 groups — the semi join is the whole query.
    */
  def q04OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1996-07-01").cast("timestamp"))
    val l = Tables.lineitem(spark, dir)
    o.join(l,
        o("o_orderkey") === l("l_orderkey") &&
          l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 60 DAY"),
        "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }

  val q04Oracle: String =
    """SELECT o_orderpriority, count(*) AS order_count
      FROM orders o
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1996-07-01'
        AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  // ---------- q12: fact-to-fact join + CASE aggregate ----------
  /** TPC-H Q12 shape: line items in a ship-date year joined to their
    * orders, classified into high/low priority CASE counts per class
    * column (this schema has no `l_shipmode`; `l_returnflag` plays the
    * class role). The join is fact-to-fact — orders is NOT broadcast at
    * 100 TB — so the right plan is a single shuffle on orderkey with the
    * date filter pushed to the lineitem scan and orders pruned to
    * (orderkey, priority) before the exchange; the CASE aggregation is
    * map-side partial over 3 groups.
    */
  def q12PriorityClass(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-01-01").cast("timestamp"))
    val o = Tables.orders(spark, dir).select($"o_orderkey", $"o_orderpriority")
    val high = $"o_orderpriority".isin("1-URGENT", "2-HIGH")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy($"l_returnflag")
      .agg(
        sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy($"l_returnflag")
  }

  val q12Oracle: String =
    """SELECT l_returnflag,
      sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
          THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
      sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
          THEN 0 ELSE 1 END)::BIGINT AS low_line_count
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_returnflag ORDER BY l_returnflag"""

  // ---------- q14: conditional ratio aggregate over a part join ----------
  /** TPC-H Q14 shape: the share of revenue from promo parts in one ship
    * month — a conditional-sum / total-sum ratio over lineitem⋈part.
    * Both sums come out of ONE aggregate pass (the CASE rides the same
    * partial aggregation; no second join or self-join for the
    * denominator), and the ratio is derived from the ROUNDED sums so the
    * two engines divide hash-identical inputs instead of racing summation
    * order in the 4th decimal. part is broadcast by size at test scale
    * but grows with the corpus — the query forces neither join strategy,
    * so AQE's size decision stands at 100 TB.
    */
  def q14PromoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1996-03-01").cast("timestamp") &&
        $"l_shipdate" < lit("1996-04-01").cast("timestamp"))
    val p = Tables.part(spark, dir).select($"p_partkey", $"p_type")
    val rev = $"l_extendedprice" * (lit(1.0) - $"l_discount")
    l.join(p, l("l_partkey") === p("p_partkey"))
      .agg(
        round(sum(when($"p_type" === "PROMO", rev).otherwise(0.0)), 2)
          .as("promo_revenue"),
        round(sum(rev), 2).as("total_revenue"))
      .select($"promo_revenue", $"total_revenue",
        round($"promo_revenue" * 100.0 / $"total_revenue", 4).as("promo_pct"))
  }

  val q14Oracle: String =
    """WITH t AS (SELECT
        round(sum(CASE WHEN p_type = 'PROMO'
          THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END), 2)
          AS promo_revenue,
        round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS total_revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-03-01'
        AND l_shipdate < TIMESTAMP '1996-04-01')
      SELECT promo_revenue, total_revenue,
        round(promo_revenue * 100.0 / total_revenue, 4) AS promo_pct
      FROM t"""

  // ---------- q10: returned-item reporting (4-way join + group + top-k) ----------
  /** TPC-H Q10 shape: revenue lost to returned items per customer in a
    * quarter, top 20 customers. Both selective predicates are pushed to
    * their scans (returnflag on lineitem, the date window on orders)
    * BEFORE the fact-fact join; customer joins by size (broadcast at
    * test scale, shuffle at corpus scale — unforced); nation is a true
    * fixed-size dimension and is broadcast explicitly. The top-20 runs
    * as TakeOrderedAndProject on the rounded revenue with custkey
    * tiebreak, so the LIMIT boundary is deterministic on both engines.
    */
  def q10ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1996-04-01").cast("timestamp"))
    val l = Tables.lineitem(spark, dir).filter($"l_returnflag" === "R")
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    // Revenue in EXACT decimal, not rounded double: a double sum is
    // order-dependent in its last ULP, and at sf0.01 this query's top
    // customer landed within an ULP of a cent boundary — Spark and DuckDB
    // rounded opposite ways. Price and discount are 2-dp values stored as
    // doubles, so casting each to DECIMAL recovers the exact operand and
    // the sum becomes associative: identical on both engines regardless
    // of aggregation order. Emitted as a string (the gate's decimal
    // convention); ordering happens on the decimal value itself.
    val revDec = sum($"l_extendedprice".cast("decimal(18,2)") *
      (lit(1).cast("decimal(3,2)") - $"l_discount".cast("decimal(18,2)")))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy($"c_custkey", $"c_name", $"n_name", $"c_acctbal")
      .agg(revDec.as("rev_dec"))
      .orderBy($"rev_dec".desc, $"c_custkey".asc)
      .limit(20)
      .select($"c_custkey", $"c_name", $"n_name",
        round($"c_acctbal", 2).as("acctbal"),
        // full scale-4 string, no rescale: Spark rounds HALF_UP on a
        // decimal down-cast while DuckDB rounds half toward zero, and
        // exact .xx50 sums are common when 2-dp prices meet 2-dp
        // discounts — emitting the exact sum sidesteps the mode entirely
        $"rev_dec".cast("string").as("revenue"))
  }

  val q10Oracle: String =
    """SELECT c_custkey, c_name, n_name, round(c_acctbal, 2) AS acctbal,
      sum(l_extendedprice::DECIMAL(18,2)
        * (1 - l_discount::DECIMAL(18,2)))::VARCHAR AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1996-04-01'
      GROUP BY c_custkey, c_name, n_name, c_acctbal
      ORDER BY sum(l_extendedprice::DECIMAL(18,2)
        * (1 - l_discount::DECIMAL(18,2))) DESC, c_custkey ASC LIMIT 20"""

  // ---------- q13: customer order-count distribution (count of counts) ----------
  /** TPC-H Q13 shape: the histogram of orders-per-customer — a LEFT OUTER
    * join with an extra non-key condition (so customers with zero
    * qualifying orders appear with count 0), a per-customer count, then a
    * count-of-counts regroup. Two shuffles by necessity (custkey, then
    * c_count); all-integer output, so the hash compare has no rounding
    * surface at all. The outer join keys on custkey — at 100 TB both
    * sides shuffle once and the second aggregate is tiny (distinct count
    * values).
    */
  def q13CustomerDistribution(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o,
        c("c_custkey") === o("o_custkey") &&
          o("o_orderpriority") =!= "1-URGENT", "left_outer")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
      .groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  val q13Oracle: String =
    """SELECT c_count, count(*) AS custdist FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey) t
      GROUP BY c_count ORDER BY custdist DESC, c_count DESC"""

  // ---------- q07: nation-pair volume shipping ----------
  /** TPC-H Q7 shape: bilateral trade volume between two nations per ship
    * year — supplier nation and customer nation joined through
    * lineitem→orders→customer, with the symmetric PAIR predicate
    * `(n1, n2) ∈ {(A,B), (B,A)}` and a year extraction as the group key.
    * Revenue uses the exact-decimal pattern ([[q10ReturnedItems]]): only
    * 4 output rows, but each aggregates thousands of line items, so a
    * cent boundary is one unlucky dataset away — exact decimal removes
    * the class instead of betting on the data.
    */
  def q07VolumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val n1 = Tables.nation(spark, dir)
      .select($"n_nationkey".as("s_nk"), $"n_name".as("supp_nation"))
    val n2 = Tables.nation(spark, dir)
      .select($"n_nationkey".as("c_nk"), $"n_name".as("cust_nation"))
    val l = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1998-01-01").cast("timestamp"))
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val s = Tables.supplier(spark, dir)
    val revDec = sum($"l_extendedprice".cast("decimal(18,2)") *
      (lit(1).cast("decimal(3,2)") - $"l_discount".cast("decimal(18,2)")))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(s), l("l_suppkey") === s("s_suppkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n1), s("s_nationkey") === $"s_nk")
      .join(broadcast(n2), c("c_nationkey") === $"c_nk")
      .filter(
        ($"supp_nation" === "NATION_18" && $"cust_nation" === "NATION_19") ||
          ($"supp_nation" === "NATION_19" && $"cust_nation" === "NATION_18"))
      .groupBy($"supp_nation", $"cust_nation",
        year($"l_shipdate").as("l_year"))
      .agg(revDec.cast("string").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"supp_nation", $"cust_nation", $"l_year")
  }

  val q07Oracle: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      year(l_shipdate)::INT AS l_year,
      sum(l_extendedprice::DECIMAL(18,2)
        * (1 - l_discount::DECIMAL(18,2)))::VARCHAR AS revenue,
      count(*) AS n_items
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
        AND ((n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
          OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18'))
      GROUP BY supp_nation, cust_nation, l_year
      ORDER BY supp_nation, cust_nation, l_year"""

  // ---------- broadcast dimension join ----------
  def qJoinBroadcast(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)),
        $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand")
      .agg(
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"p_brand")

  val qJoinBroadcastOracle: String =
    """SELECT p_brand,
      round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
      count(*) AS n_items
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand ORDER BY p_brand"""

  // ---------- bucketed co-located join (exchange-free fact-fact) ----------
  /** The bucketing discipline for REPEATED fact-to-fact joins: both
    * sides are written once as bucketed tables (8 buckets on the join
    * key, bucket-sorted), after which every join on that key reads
    * co-located buckets and the join plans with NO Exchange on either
    * side — the shuffle is paid once at layout time, not per query.
    * At 100 TB this is the difference between re-shuffling two
    * multi-TB facts on every analytical run and a pure merge of
    * pre-partitioned files; it is also the batch analogue of the
    * DSv2 source's partitioned layout. The PlanAudit pins the contract:
    * zero `Exchange hashpartitioning` below the join.
    *
    * The aggregation itself is the priority-mix revenue rollup, oracled
    * against DuckDB joining the ORIGINAL parquet — proving the bucketed
    * round-trip byte-preserves the data.
    */
  /** Which sf dir the current session's bucketed layout was built from —
    * the layout is built ONCE per (session, dir) and reused, which is the
    * bucketing discipline itself: the shuffle is paid at layout time, and
    * every subsequent join on the key (including a bench's repeated
    * passes) reads co-located buckets. A fresh session re-lays-out (the
    * in-memory catalog died with the old one).
    */
  def qJoinBucketed(spark: SparkSession, dir: String): DataFrame = {
    val B = 8
    // content-tagged table names: concurrent processes over different
    // data never share a bucketed layout's warehouse directory
    // (SessionFixtures.contentTag); old-content generations leak one dir
    // each until the warehouse is cleaned — the price of not deleting a
    // directory another live process may be reading
    val tag = SessionFixtures.contentTag(spark, dir)
    val liTable = s"graft_bucketed_lineitem_$tag"
    val ordTable = s"graft_bucketed_orders_$tag"
    val haveCatalog = spark.catalog.tableExists(liTable) &&
      spark.catalog.tableExists(ordTable)
    if (SessionFixtures.stale("bucketed_layout", spark, dir) || !haveCatalog) {
      // the managed-table LOCATION outlives the in-memory catalog: a fresh
      // session doesn't know the table, so overwrite can't reclaim it —
      // drop both the entry and the directory before (re)laying out
      val wh = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"))
      val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
      Seq(liTable, ordTable).foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
        fs.delete(new org.apache.hadoop.fs.Path(wh, t), true)
      }
      Tables.lineitem(spark, dir)
        .select($"l_orderkey", $"l_quantity", $"l_extendedprice", $"l_discount")
        .write.mode("overwrite").format("parquet")
        .bucketBy(B, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(liTable)
      Tables.orders(spark, dir)
        .select($"o_orderkey", $"o_orderpriority")
        .write.mode("overwrite").format("parquet")
        .bucketBy(B, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(ordTable)
      SessionFixtures.mark("bucketed_layout", spark, dir)
    }
    spark.table(ordTable)
      .join(spark.table(liTable),
        $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        sum($"l_quantity").as("sum_qty"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2)
          .as("revenue"))
      .orderBy($"o_orderpriority")
  }

  val qJoinBucketedOracle: String =
    """SELECT o_orderpriority, count(*) AS n_items,
      sum(l_quantity) AS sum_qty,
      round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  // ---------- semi / anti joins ----------
  def qSemiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir).filter(year($"o_orderdate") === 1995),
        $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")

  val qSemiJoinOracle: String =
    """SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND year(o_orderdate) = 1995)
      ORDER BY c_custkey"""

  // anti-join against the 1995 order subset: non-vacuous at every SF
  // (every customer has SOME order in this data, so a bare anti-join
  // would always return 0 rows and test nothing)
  def qAntiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir).filter(year($"o_orderdate") === 1995),
        $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")

  val qAntiJoinOracle: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND year(o_orderdate) = 1995)
      ORDER BY c_custkey"""

  // ---------- outer join + conditional agg ----------
  def qOuterJoinAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), $"c_custkey" === $"o_custkey", "left_outer")
      .groupBy($"c_custkey")
      .agg(
        count($"o_orderkey").as("n_orders"),
        round(sum(coalesce($"o_totalprice", lit(0.0))), 2).as("total_spent"))
      .orderBy($"c_custkey")

  val qOuterJoinAggOracle: String =
    """SELECT c_custkey, count(o_orderkey) AS n_orders,
      round(sum(coalesce(o_totalprice, 0.0)), 2) AS total_spent
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey ORDER BY c_custkey"""

  // ---------- window: rank / running / lag ----------
  def qWindowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    Tables.orders(spark, dir)
      .withColumn("rnk", rank().over(w))
      .filter($"rnk" <= 3)
      .select($"o_custkey", $"o_orderkey", round($"o_totalprice", 2).as("price"), $"rnk")
      .orderBy($"o_custkey", $"rnk", $"o_orderkey")
  }

  val qWindowRankOracle: String =
    """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price, rnk FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
        rank() OVER (PARTITION BY o_custkey
          ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
      FROM orders) t WHERE rnk <= 3
      ORDER BY o_custkey, rnk, o_orderkey"""

  def qWindowRunning(spark: SparkSession, dir: String): DataFrame = {
    // l_quantity closes the ordering: (orderkey, linenumber) is NOT a key
    // in this testdata (true duplicates, up to 6 deep), and two tied rows
    // with DIFFERENT quantities make the running sum order-dependent —
    // flaky across engines and across runs (observed once at sf0.1).
    // With quantity as the last tiebreak, any remaining ties contribute
    // identical values, so every prefix sum is order-invariant.
    val w = Window.partitionBy($"l_suppkey")
      .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber", $"l_quantity")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(spark, dir)
      .withColumn("run_qty", sum($"l_quantity").over(w))
      .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"run_qty")
      .orderBy($"l_suppkey", $"l_orderkey", $"l_linenumber")
  }

  val qWindowRunningOracle: String =
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      sum(l_quantity) OVER (PARTITION BY l_suppkey
        ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_qty
      FROM lineitem ORDER BY l_suppkey, l_orderkey, l_linenumber"""

  // ---------- DISTINCT aggregation over a moving window ----------
  /** Rolling DISTINCT count — the SQL-surface gap users actually hit:
    * Spark rejects `COUNT(DISTINCT …) OVER`, so the rolling type
    * diversity of a user's last 10 events is spelled
    * `size(array_distinct(collect_list(…) over w))` — the frame's values
    * ride as an array and dedup in the projection, which is exactly how
    * an engine would implement frame-distinct anyway (the frame is
    * BOUNDED at 10 rows, so the per-row array is O(frame), not
    * O(partition) — this spelling is only safe with bounded frames, a
    * constraint the scaladoc is the right place to record). The oracle
    * uses DuckDB's native windowed `count(DISTINCT)`, so the hash match
    * certifies the emulation against an engine that implements the real
    * thing. Rolled up to each user's PEAK diversity (one combine-fed
    * aggregate on the same user key — no second shuffle: the window
    * already partitioned by user).
    */
  def qWindowDistinct(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(-9, Window.currentRow)
    Tables.events(spark, dir)
      .withColumn("rt", size(array_distinct(collect_list($"event_type").over(w))))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"), max($"rt").as("peak_types"))
      .orderBy($"user_id")
  }

  val qWindowDistinctOracle: String =
    """WITH r AS (SELECT user_id, count(DISTINCT event_type) OVER
        (PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS rt
      FROM events)
      SELECT user_id, count(*) AS n_events, max(rt)::INT AS peak_types
      FROM r GROUP BY user_id ORDER BY user_id"""

  def qWindowLag(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    Tables.orders(spark, dir)
      .withColumn("prev_price", round(lag($"o_totalprice", 1).over(w), 2))
      .withColumn("next_key", lead($"o_orderkey", 1).over(w))
      .withColumn("days_since_prev",
        datediff($"o_orderdate".cast("date"),
          lag($"o_orderdate", 1).over(w).cast("date")))
      .select($"o_custkey", $"o_orderkey", $"prev_price", $"next_key", $"days_since_prev")
      .orderBy($"o_custkey", $"o_orderkey")
  }

  val qWindowLagOracle: String =
    """SELECT o_custkey, o_orderkey,
      round(lag(o_totalprice, 1) OVER w, 2) AS prev_price,
      lead(o_orderkey, 1) OVER w AS next_key,
      date_diff('day', (lag(o_orderdate, 1) OVER w)::DATE, o_orderdate::DATE)::INT
        AS days_since_prev
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, o_orderkey"""

  // ---------- window: first_value / last_value / nth_value ----------
  /** Whole-partition value picks: each customer's first, last, and second
    * order key in date order, via the unbounded-both-ends frame. One
    * shuffle on the partition key; the row_number filter keeps exactly
    * one row per customer, so the output is partition-sized, not
    * row-sized.
    */
  def qWindowFirstLast(spark: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    val wFull = wOrd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("first_key", first($"o_orderkey").over(wFull))
      .withColumn("last_key", last($"o_orderkey").over(wFull))
      .withColumn("second_key", nth_value($"o_orderkey", 2).over(wFull))
      .filter($"rn" === 1)
      .select($"o_custkey", $"first_key", $"last_key", $"second_key")
      .orderBy($"o_custkey")
  }

  val qWindowFirstLastOracle: String =
    """SELECT o_custkey, first_key, last_key, second_key FROM (
      SELECT o_custkey,
        row_number() OVER w1 AS rn,
        first_value(o_orderkey) OVER w AS first_key,
        last_value(o_orderkey) OVER w AS last_key,
        nth_value(o_orderkey, 2) OVER w AS second_key
      FROM orders
      WINDOW w1 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ) t WHERE rn = 1 ORDER BY o_custkey"""

  // ---------- rollup / cube ----------
  def qRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"), sum($"l_quantity").as("sum_qty"))
      .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)

  val qRollupOracle: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n, sum(l_quantity) AS sum_qty
      FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""

  def qCube(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
      .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)

  val qCubeOracle: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      round(sum(o_totalprice), 2) AS total
      FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST"""

  // ---------- set operations ----------
  def qSetOps(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val building = c.filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val automobile = c.filter($"c_mktsegment" === "AUTOMOBILE").select($"c_custkey")
    val withOrders = o.select($"o_custkey".as("c_custkey"))
    val negative = c.filter($"c_acctbal" < 0).select($"c_custkey")
    building.intersect(withOrders)
      .union(automobile)
      .except(negative)
      .distinct()
      .orderBy($"c_custkey")
  }

  val qSetOpsOracle: String =
    """SELECT DISTINCT c_custkey FROM (
      (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
       INTERSECT SELECT o_custkey FROM orders)
      UNION
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
      EXCEPT
      SELECT c_custkey FROM customer WHERE c_acctbal < 0) t
      ORDER BY c_custkey"""

  // ---------- distinct aggregates ----------
  def qDistinctAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        countDistinct($"l_orderkey").as("n_orders"),
        countDistinct($"l_partkey").as("n_parts"))
      .orderBy($"l_returnflag")

  val qDistinctAggOracle: String =
    """SELECT l_returnflag, count(*) AS n,
      count(DISTINCT l_orderkey) AS n_orders,
      count(DISTINCT l_partkey) AS n_parts
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  // ---------- exact-moment correlation matrix ----------
  /** Pearson correlation across the lineitem numeric measures from ONE
    * corpus scan — the dataset-card correlation panel ("is discount
    * independent of quantity?") computed the only way two engines can
    * agree on it bit-for-bit: every sufficient statistic is an EXACT
    * integer (measures quantize to their natural grids — whole units,
    * whole dollars, basis points — chosen so Σq² stays inside BIGINT
    * past sf100), the cross products that exceed 63 bits go through
    * DECIMAL(38,0)/HUGEINT arithmetic (still exact), and doubles appear
    * only in the LAST expression — division and square root of
    * identical exact operands, both correctly rounded IEEE on both
    * engines, so `round(corr, 6)` matches by construction rather than
    * by luck (the r6 cent-boundary lesson applied to second moments).
    *
    * Scale shape: all 14 moment sums (4 firsts + 10 seconds) fuse into
    * ONE scan-side aggregate — a single combine-fed exchange carrying
    * one partial row per task, the cheapest possible plan for a moment
    * matrix on a fact table (the [[graft.ops.Similarity]] covariance
    * kernel explodes pair cells instead, fine at 36 cells on the
    * embedding table; on the fact table the explode shuffled 10× the
    * rows and measured 5× slower). The 6-row correlation panel unfolds
    * from the aggregate row with a one-row explode. Corr is
    * scale-invariant, so the quantization grids cost nothing but the
    * documented overflow budget.
    */
  def qStatsCorr(spark: SparkSession, dir: String): DataFrame = {
    // all 14 moment sums fuse into ONE scan-side aggregate row (no row
    // explosion: an earlier explode-10-cells form shuffled 10x the fact
    // rows and measured 3.7 s vs ~0.7 s at sf0.1); the 6-row output
    // panel then unfolds from that single row with a trivial explode
    val dims = Seq("quantity", "price_usd", "discount", "tax")
    val moments = Tables.lineitem(spark, dir)
      .select(expr(
        """array(CAST(round(l_quantity) AS BIGINT),
                 CAST(round(l_extendedprice) AS BIGINT),
                 CAST(round(l_discount * 100) AS BIGINT),
                 CAST(round(l_tax * 100) AS BIGINT))""").as("q"))
      .agg(count(lit(1)).as("n"),
        (for (i <- 0 until 4) yield
          sum(expr(s"q[$i]")).as(s"s$i")) ++
        (for (i <- 0 until 4; j <- i until 4) yield
          sum(expr(s"q[$i] * q[$j]")).as(s"p$i$j")): _*)
    val cells = (for (i <- 0 until 4; j <- i + 1 until 4) yield
      s"""struct('${dims(i)}' AS col_i, '${dims(j)}' AS col_j,
           s$i AS si, s$j AS sj, p$i$j AS sij,
           p$i$i AS sii, p$j$j AS sjj)""").mkString("array(", ", ", ")")
    moments
      .select(col("n"), explode(expr(cells)).as("c"))
      .select(
        col("c.col_i").as("col_i"), col("c.col_j").as("col_j"), col("n"),
        round(
          expr("""CAST(CAST(n AS DECIMAL(38,0)) * c.sij
                    - CAST(c.si AS DECIMAL(38,0)) * c.sj AS DOUBLE)""") /
          (sqrt(expr("""CAST(CAST(n AS DECIMAL(38,0)) * c.sii
                    - CAST(c.si AS DECIMAL(38,0)) * c.si AS DOUBLE)""")) *
           sqrt(expr("""CAST(CAST(n AS DECIMAL(38,0)) * c.sjj
                    - CAST(c.sj AS DECIMAL(38,0)) * c.sj AS DOUBLE)"""))),
          6).as("corr6"))
      .orderBy(col("col_i"), col("col_j"))
  }

  val qStatsCorrOracle: String =
    """WITH q AS (SELECT round(l_quantity)::BIGINT q0,
        round(l_extendedprice)::BIGINT q1,
        round(l_discount * 100)::BIGINT q2,
        round(l_tax * 100)::BIGINT q3 FROM lineitem),
      u AS (SELECT i::INT i, j::INT j,
          CASE i WHEN 0 THEN q0 WHEN 1 THEN q1 WHEN 2 THEN q2 ELSE q3 END qi,
          CASE j WHEN 0 THEN q0 WHEN 1 THEN q1 WHEN 2 THEN q2 ELSE q3 END qj
        FROM q, range(0, 4) ti(i), range(0, 4) tj(j) WHERE j >= i),
      cells AS (SELECT i, j, count(*)::BIGINT n, sum(qi)::BIGINT s_i,
          sum(qj)::BIGINT s_j, sum(qi * qj)::BIGINT s_ij
        FROM u GROUP BY i, j),
      diag AS (SELECT i d, s_i sd, s_ij sdd FROM cells WHERE i = j),
      nm AS (SELECT unnest(range(0, 4))::INT ix,
        unnest(['quantity', 'price_usd', 'discount', 'tax']) nam)
      SELECT n1.nam AS col_i, n2.nam AS col_j, c.n,
        round((c.n::HUGEINT * c.s_ij - c.s_i::HUGEINT * c.s_j)::DOUBLE /
          (sqrt((c.n::HUGEINT * d1.sdd - d1.sd::HUGEINT * d1.sd)::DOUBLE) *
           sqrt((c.n::HUGEINT * d2.sdd - d2.sd::HUGEINT * d2.sd)::DOUBLE)),
          6) AS corr6
      FROM cells c
      JOIN diag d1 ON d1.d = c.i JOIN diag d2 ON d2.d = c.j
      JOIN nm n1 ON n1.ix = c.i JOIN nm n2 ON n2.ix = c.j
      WHERE c.i < c.j
      ORDER BY col_i, col_j"""

  // ---------- skyline (Pareto frontier) ----------
  /** The SKYLINE / Pareto-frontier preference query (Börzsönyi et al.
    * 2001): parts not dominated on (larger size, higher retail price) —
    * no other part is ≥ on both dimensions and > on one. Classic
    * example of an operator SQL lacks a keyword for that still reduces
    * to a scale-correct plan: the fact first collapses to ONE
    * candidate per x-value (`max(price) per size` — dominated rows
    * within a size can never be skyline, so this combine-fed aggregate
    * is lossless), and the frontier test runs on that DOMAIN-bounded
    * table (≤ |distinct sizes| rows) as a running-max window ordered
    * by size descending: a candidate survives iff its price strictly
    * exceeds every larger size's price. The window is partition-less
    * but its input is bounded by the SIZE DOMAIN, not the corpus —
    * pinned in the global-window allowlist with that rationale.
    * Prices compare as DECIMAL(18,2), so dominance is exact.
    */
  def qSkyline(spark: SparkSession, dir: String): DataFrame = {
    val perSize = Tables.part(spark, dir)
      .groupBy($"p_size")
      .agg(max($"p_retailprice".cast("decimal(18,2)")).as("best_price"),
        count(lit(1)).as("n_parts"))
    perSize
      .withColumn("max_above",
        max($"best_price").over(Window.orderBy($"p_size".desc)
          .rowsBetween(Window.unboundedPreceding, -1)))
      .filter($"max_above".isNull || $"best_price" > $"max_above")
      .select($"p_size", $"best_price".cast("string").as("best_price"),
        $"n_parts")
      .orderBy($"p_size")
  }

  val qSkylineOracle: String =
    """WITH ps AS (SELECT p_size,
        max(p_retailprice::DECIMAL(18,2)) best_price,
        count(*) n_parts
      FROM part GROUP BY p_size),
      sky AS (SELECT *, max(best_price) OVER (ORDER BY p_size DESC
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) max_above
        FROM ps)
      SELECT p_size, best_price::VARCHAR AS best_price, n_parts
      FROM sky WHERE max_above IS NULL OR best_price > max_above
      ORDER BY p_size"""

  // ---------- fuzzy entity matching (edit-distance on the dictionary) ----------
  /** Entity-resolution by EDIT DISTANCE — the data-cleaning pass that
    * catches what token/shingle dedup structurally cannot (typo-level
    * variants: `"red bolt"` vs `"red bolts"`). Fuzzy matching never runs
    * on the corpus — the DISTINCT value dictionary collapses first (one
    * combine-fed aggregate, cardinality = |vocabulary|,
    * Heaps-sublinear) — and the dictionary self-comparison is a BLOCKED
    * equi-join, never a cartesian: at 10⁷–10⁸ dictionary entries an
    * all-pairs `a < b` is 10¹⁴⁺ candidates, a scale-killer even though
    * the verify step is cheap per pair.
    *
    * Blocking is PROVABLY COMPLETE for `ed ≤ τ =` [[FuzzyMaxDist]] via
    * the q-gram prefix-filter lemma (Gravano et al. VLDB'01 bound +
    * the PPJoin prefix principle already used in `Dedup.qDedupPpjoin`):
    * each edit destroys at most q gram occurrences, so the DISTINCT
    * 2-gram sets of two strings within distance τ differ by ≤ q·τ per
    * side, i.e. share ≥ max(|Qa|,|Qb|) − q·τ grams — and by the prefix
    * lemma any such pair shares a gram among each side's q·τ+1 = 7
    * RAREST grams (global document-frequency order, rarest first, so
    * the blocking buckets are the emptiest ones available). The only
    * uncovered case — BOTH sides have ≤ q·τ distinct grams — meets in
    * one sentinel bucket (bounded: near-empty on real text). Candidates
    * additionally require |len(a) − len(b)| ≤ τ (length lower-bounds
    * edit distance) before the integer-DP `levenshtein` verify. The
    * oracle stays the naive all-pairs join, so the hash match doubles
    * as an end-to-end completeness proof of the blocking at every SF.
    */
  private val FuzzyMaxDist = 3
  private val FuzzyGramLen = 2
  private val FuzzyPrefix = FuzzyGramLen * FuzzyMaxDist + 1 // q·τ+1 = 7

  /** The blocked edit-distance pipeline over an arbitrary `(p_name, n)`
    * dictionary — extracted so the completeness property spec can drive
    * it on adversarial dictionaries (planted ≤τ-edit variants, strings
    * short enough to need the sentinel bucket). Returns every pair
    * within [[FuzzyMaxDist]] with support counts, unordered.
    */
  private[ops] def fuzzyPairs(names: DataFrame): DataFrame = {
    // distinct 2-grams per dictionary entry (≤ len−1 of them)
    val grams = names.select($"p_name", $"n",
      explode(array_distinct(expr(
        s"transform(sequence(1, greatest(length(p_name) - 1, 1)), " +
          s"i -> substring(p_name, i, $FuzzyGramLen))"))).as("g"))

    // global gram rarity (document frequency over the dictionary): the
    // gram DOMAIN is ≤ alphabet², so this side always broadcasts
    val gramDf = grams.groupBy($"g").agg(count(lit(1)).as("df"))
    val ranked = grams.join(broadcast(gramDf), "g")
      .withColumn("rk", row_number().over(
        Window.partitionBy($"p_name").orderBy($"df", $"g")))

    val prefix = ranked.filter($"rk" <= FuzzyPrefix)
      .select($"p_name", $"n", $"g")
    // names whose distinct-gram set is ≤ q·τ fall outside the lemma's
    // hypothesis when paired with EACH OTHER — route them through a
    // sentinel bucket (mixed short/long pairs are still prefix-covered)
    val short = ranked.groupBy($"p_name", $"n").agg(max($"rk").as("ng"))
      .filter($"ng" <= FuzzyGramLen * FuzzyMaxDist)
      .select($"p_name", $"n", lit("\u0000").as("g"))
    val keyed = prefix.unionByName(short)

    val cand = keyed.toDF("a", "na", "g")
      .join(keyed.toDF("b", "nb", "gb"),
        $"g" === $"gb" && $"a" < $"b" &&
          abs(length($"a") - length($"b")) <= FuzzyMaxDist)
      .select($"a", $"b", $"na", $"nb").distinct()

    cand.withColumn("dist", levenshtein($"a", $"b"))
      .filter($"dist" <= FuzzyMaxDist)
  }

  /** The part-name dictionary (name, support count) — vocabulary-scale,
    * checkpointed once per (session, dir, content) and shared by both
    * fuzzy consumers.
    */
  private def nameDict(spark: SparkSession, dir: String): DataFrame =
    SessionFixtures.cachedFrame("name_dict", spark, dir)(
      Tables.part(spark, dir)
        .groupBy($"p_name").agg(count(lit(1)).as("n")).stageCheckpoint())

  /** The verified ≤τ-edit pair graph over [[nameDict]] — like the dedup
    * pair table, a persisted pipeline artifact (pair-table-sized) with
    * two registered consumers ([[qFuzzyMatch]], [[qEntityResolve]]),
    * each of which previously re-ran the q-gram blocking + levenshtein
    * verify per invocation.
    */
  private def fuzzyNamePairs(spark: SparkSession, dir: String): DataFrame =
    SessionFixtures.cachedFrame("fuzzy_name_pairs", spark, dir)(
      fuzzyPairs(nameDict(spark, dir)).stageCheckpoint())

  def qFuzzyMatch(spark: SparkSession, dir: String): DataFrame =
    fuzzyNamePairs(spark, dir)
      .select($"a", $"b", $"dist", $"na", $"nb")
      .orderBy($"dist", $"a", $"b")
      .limit(30)

  val qFuzzyMatchOracle: String =
    s"""WITH names AS (SELECT p_name, count(*)::BIGINT n FROM part
        GROUP BY p_name)
      SELECT a.p_name AS a, b.p_name AS b,
        levenshtein(a.p_name, b.p_name)::INT AS dist,
        a.n AS na, b.n AS nb
      FROM names a JOIN names b ON a.p_name < b.p_name
      WHERE levenshtein(a.p_name, b.p_name) <= $FuzzyMaxDist
      ORDER BY dist, a, b LIMIT 30"""

  // ---------- scalar subquery ----------
  def qScalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    val avgPrice = p.agg(avg($"p_retailprice").as("ap"))
    p.crossJoin(broadcast(avgPrice))
      .filter($"p_retailprice" > $"ap")
      .select($"p_partkey", $"p_name", round($"p_retailprice", 2).as("price"))
      .orderBy($"p_partkey")
  }

  val qScalarSubqueryOracle: String =
    """SELECT p_partkey, p_name, round(p_retailprice, 2) AS price FROM part
      WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)
      ORDER BY p_partkey"""

  // ---------- case / conditional aggregation ----------
  def qCaseWhen(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .withColumn("bucket",
        when($"o_totalprice" < 50000, "low")
          .when($"o_totalprice" < 150000, "mid")
          .otherwise("high"))
      .groupBy($"o_orderstatus", $"bucket")
      .agg(count(lit(1)).as("n"),
        sum(when($"o_orderpriority" === "1-URGENT", 1).otherwise(0)).as("n_urgent"))
      .orderBy($"o_orderstatus", $"bucket")

  val qCaseWhenOracle: String =
    """SELECT o_orderstatus,
      CASE WHEN o_totalprice < 50000 THEN 'low'
           WHEN o_totalprice < 150000 THEN 'mid'
           ELSE 'high' END AS bucket,
      count(*) AS n,
      sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)::BIGINT AS n_urgent
      FROM orders GROUP BY o_orderstatus, bucket
      ORDER BY o_orderstatus, bucket"""

  // ---------- string functions ----------
  def qStringFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .groupBy($"p_brand")
      .agg(
        count(lit(1)).as("n"),
        round(avg(length($"p_name")), 4).as("avg_name_len"),
        sum(when(upper($"p_type").contains("BRASS"), 1).otherwise(0)).as("n_brass"),
        min(substring($"p_name", 1, 8)).as("first_prefix"))
      .orderBy($"p_brand")

  val qStringFuncsOracle: String =
    """SELECT p_brand, count(*) AS n,
      round(avg(length(p_name)), 4) AS avg_name_len,
      sum(CASE WHEN upper(p_type) LIKE '%BRASS%' THEN 1 ELSE 0 END)::BIGINT AS n_brass,
      min(substr(p_name, 1, 8)) AS first_prefix
      FROM part GROUP BY p_brand ORDER BY p_brand"""

  // ---------- date functions ----------
  def qDateFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(year($"o_orderdate").as("yr"), month($"o_orderdate").as("mo"))
      .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"),
        min($"o_orderdate").as("first_order"))
      .orderBy($"yr", $"mo")

  val qDateFuncsOracle: String =
    """SELECT year(o_orderdate)::INT AS yr, month(o_orderdate)::INT AS mo,
      count(*) AS n, round(sum(o_totalprice), 2) AS total,
      min(o_orderdate) AS first_order
      FROM orders GROUP BY yr, mo ORDER BY yr, mo"""

  // ---------- having ----------
  def qHaving(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_orders"))
      .filter($"n_orders" >= 15)
      .orderBy($"o_custkey")

  val qHavingOracle: String =
    """SELECT o_custkey, count(*) AS n_orders FROM orders
      GROUP BY o_custkey HAVING count(*) >= 15 ORDER BY o_custkey"""

  // ---------- pivot ----------
  def qPivot(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy($"l_linestatus")
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(sum($"l_quantity"))
      .na.fill(0.0)
      .orderBy($"l_linestatus")

  val qPivotOracle: String =
    """SELECT l_linestatus,
      coalesce(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 0) AS A,
      coalesce(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 0) AS N,
      coalesce(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 0) AS R
      FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus"""

  // ---------- statistical aggregates ----------
  def qStats(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 4).as("median_qty"),
        round(expr("percentile(l_quantity, 0.9)"), 4).as("p90_qty"),
        round(stddev_samp($"l_extendedprice"), 4).as("sd_price"),
        round(var_samp($"l_discount"), 6).as("var_disc"),
        round(corr($"l_quantity", $"l_extendedprice"), 6).as("corr_qty_price"))
      .orderBy($"l_returnflag")

  /** Spark `percentile` and DuckDB `quantile_cont` share the (n-1)p linear
    * interpolation definition; moment aggregates are rounded to absorb
    * summation-order ulp differences.
    */
  val qStatsOracle: String =
    """SELECT l_returnflag,
      round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
      round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
      round(stddev_samp(l_extendedprice), 4) AS sd_price,
      round(var_samp(l_discount), 6) AS var_disc,
      round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  // ---------- custom aggregate (typed Aggregator via udaf) ----------
  def qGeomMean(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .groupBy($"p_brand")
      .agg(round(graft.functions.GeomMean.geomMean($"p_retailprice"), 4)
        .as("gm_price"))
      .orderBy($"p_brand")

  val qGeomMeanOracle: String =
    """SELECT p_brand, round(exp(avg(ln(p_retailprice))), 4) AS gm_price
      FROM part WHERE p_retailprice > 0 GROUP BY p_brand ORDER BY p_brand"""

  // ---------- range (non-equi) join ----------
  /** For each signup event: activity by the same user within the following
    * hour. A time-band non-equi join — the pattern behind sessionized
    * attribution at scale (band condition keeps the join from degenerating
    * to a cross product; Spark plans it as a broadcast/BNLJ with the band
    * predicate, and at cluster scale the user_id equi-key carries the
    * shuffle).
    */
  def qRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val signups = e.filter($"event_type" === "signup")
      .select($"user_id", $"event_id".as("signup_id"), $"ts".as("signup_ts"))
    val acts = e.select($"user_id", $"ts".as("act_ts"), $"event_type")
    signups.join(acts,
        Seq("user_id"))
      .filter($"act_ts" > $"signup_ts" &&
        $"act_ts" <= $"signup_ts" + expr("INTERVAL 1 HOUR"))
      .groupBy($"signup_id", $"user_id")
      .agg(count(lit(1)).as("n_acts"),
        countDistinct($"event_type").as("n_types"))
      .orderBy($"signup_id")
  }

  val qRangeJoinOracle: String =
    """SELECT s.event_id AS signup_id, s.user_id,
      count(*) AS n_acts, count(DISTINCT a.event_type) AS n_types
      FROM events s JOIN events a ON s.user_id = a.user_id
        AND a.ts > s.ts AND a.ts <= s.ts + INTERVAL 1 HOUR
      WHERE s.event_type = 'signup'
      GROUP BY signup_id, s.user_id ORDER BY signup_id"""

  // ---------- salted join (skew-mitigation pattern, result-identical) ----------
  /** Key-salting demo: the build side is replicated `Salt` ways and the
    * probe side's key is salted with a deterministic hash, spreading a hot
    * key over `Salt` reducers. Result is identical to the plain join (the
    * oracle is the plain join) — this query exists to keep the technique
    * exercised and verified; at 100 TB it is the fallback when AQE's
    * skew-join splitting can't help (e.g. skewed build side of a
    * shuffle-hash join).
    */
  def qSaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val salt = 4
    val li = Tables.lineitem(spark, dir)
      .withColumn("salt", pmod(xxhash64($"l_linenumber"), lit(salt)).cast("int"))
    val ord = Tables.orders(spark, dir)
      .withColumn("salt", explode(array((0 until salt).map(lit): _*)))
    li.join(ord, li("l_orderkey") === ord("o_orderkey") && li("salt") === ord("salt"))
      .groupBy($"o_orderpriority")
      .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"o_orderpriority")
  }

  val qSaltedJoinOracle: String =
    """SELECT o_orderpriority,
      round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
      count(*) AS n_items
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  // ---------- heap-based top-k per key (TypedImperativeAggregate) ----------
  /** Top-3 orders per customer WITHOUT a window sort: the bounded-heap
    * aggregate ([[graft.functions.TopKByScore]]) keeps k entries per group
    * through partial aggregation, so the shuffle carries O(groups × k)
    * instead of every row. Same answer as the row_number window
    * formulation — which is exactly what the oracle runs.
    */
  def qTopkAgg(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .withColumn("price", round($"o_totalprice", 2))
    o.groupBy($"o_custkey")
      .agg(graft.functions.TopKByScore.topKByScore($"price", $"o_orderkey", 3).as("top"))
      .select($"o_custkey", posexplode($"top").as(Seq("i", "e")))
      .select($"o_custkey", ($"i" + 1).cast("int").as("rnk"),
        $"e.id".as("o_orderkey"), $"e.score".as("price"))
      .orderBy($"o_custkey", $"rnk")
  }

  val qTopkAggOracle: String =
    """SELECT o_custkey, rnk, o_orderkey, price FROM (
      SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price,
        row_number() OVER (PARTITION BY o_custkey
          ORDER BY round(o_totalprice, 2) DESC, o_orderkey ASC)::INT AS rnk
      FROM orders) t WHERE rnk <= 3
      ORDER BY o_custkey, rnk"""

  // ---------- typed Dataset[T] surface ----------
  /** The case-class-typed API (`Dataset[Order]`, `groupByKey`, typed
    * `mapGroups`) over the same data: compile-time field checks where the
    * row shape is static. Output identical to the untyped formulation the
    * oracle runs. mapGroups is deliberate here (not agg): it demonstrates
    * arbitrary per-group JVM logic — min/max/total in one pass.
    */
  def qTypedDataset(spark: SparkSession, dir: String): DataFrame = {
    // col(), not this object's $-interpolator: spark.implicits._ brings its
    // own StringContext $ and the two would be ambiguous
    import spark.implicits.{newProductEncoder, rddToDatasetHolder}
    val ds = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_totalprice"), col("o_orderpriority"))
      .as[(Long, Double, String)](
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaDouble,
          org.apache.spark.sql.Encoders.STRING))
    implicit val longEnc = org.apache.spark.sql.Encoders.scalaLong
    implicit val outEnc =
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaDouble,
        org.apache.spark.sql.Encoders.scalaDouble,
        org.apache.spark.sql.Encoders.scalaLong)
    ds.groupByKey(_._1)
      .mapGroups { (cust, rows) =>
        var n = 0L
        var total = 0.0
        var maxP = Double.MinValue
        var urgent = 0L
        rows.foreach { case (_, price, prio) =>
          n += 1; total += price
          if (price > maxP) maxP = price
          if (prio == "1-URGENT") urgent += 1
        }
        (cust, n, BigDecimal(total).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble,
          BigDecimal(maxP).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble, urgent)
      }
      .toDF("o_custkey", "n_orders", "total_spent", "max_price", "n_urgent")
      .orderBy(col("o_custkey"))
  }

  val qTypedDatasetOracle: String =
    """SELECT o_custkey, count(*) AS n_orders,
      round(sum(o_totalprice), 2) AS total_spent,
      round(max(o_totalprice), 2) AS max_price,
      sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)::BIGINT
        AS n_urgent
      FROM orders GROUP BY o_custkey ORDER BY o_custkey"""

  // ---------- approximate distinct (sketch surface; rows-only check) ----------
  /** HLL++ approx distinct next to the exact answer with its realized
    * relative error — the sketch surface a 100 TB pipeline uses when exact
    * distinct is too expensive. Sketch estimates are engine-specific, so
    * this query carries no DuckDB oracle (rows-only check); the exact
    * column doubles as an internal consistency anchor.
    */
  /** approx_count_distinct's HLL++ estimate is engine-specific, so the
    * hash-matched surface emits the exact count plus a `within_bound`
    * flag: the estimate (rsd 0.02) must land within 10% of truth — a
    * 5-sigma envelope, deterministic for a given dataset since HLL
    * sketches carry no runtime randomness. The oracle computes the same
    * exact columns with `true`, giving this query a full value-level
    * gate instead of the old rows-only check.
    */
  def qApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    // both aggregates run over the pre-deduplicated (flag, orderkey) set:
    // HLL sketches are duplicate-insensitive, so the estimate is
    // IDENTICAL to approx_count_distinct over the raw rows, and the
    // two-level aggregate (partial-combinable both levels) replaces the
    // Expand plan that countDistinct-next-to-another-agg forces
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag", $"l_orderkey").agg(lit(1))
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).as("exact_orders"),
        approx_count_distinct($"l_orderkey", 0.02).as("approx_orders"))
      .withColumn("within_bound",
        abs($"approx_orders" - $"exact_orders") /
          $"exact_orders".cast("double") <= 0.1)
      .select($"l_returnflag", $"exact_orders", $"within_bound")
      .orderBy($"l_returnflag")

  val qApproxDistinctOracle: String =
    """SELECT l_returnflag, count(DISTINCT l_orderkey) AS exact_orders,
      true AS within_bound
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  // ---------- SQL surface (spark.sql over registered views) ----------
  def qSqlSurface(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("graft_orders")
    Tables.customer(spark, dir).createOrReplaceTempView("graft_customer")
    spark.sql(
      """SELECT c_mktsegment, count(*) AS n_orders,
        round(avg(o_totalprice), 2) AS avg_price
        FROM graft_orders JOIN graft_customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")
  }

  val qSqlSurfaceOracle: String =
    """SELECT c_mktsegment, count(*) AS n_orders,
      round(avg(o_totalprice), 2) AS avg_price
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  // ---------- pipe-syntax SQL (Spark 4 |> operators) ----------
  /** Spark 4's PIPE SQL syntax (SPARK-49555) driven end-to-end: the
    * linear `FROM … |> WHERE … |> AGGREGATE … |> ORDER BY` form that
    * reads in execution order — proving the modern surface compiles to
    * the same plan a JDBC consumer would get from classic SQL (the
    * oracle IS that classic form, so the hash match certifies semantic
    * equivalence, with the revenue decimal-exact per the q10
    * discipline). Planwise this is an ordinary filter → partial/final
    * aggregate → sort; the syntax is the feature under test.
    */
  def qSqlPipe(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("graft_orders_pipe")
    spark.sql(
      """FROM graft_orders_pipe
        |> WHERE o_orderstatus = 'O'
        |> AGGREGATE count(*) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS STRING)
               AS total_price
           GROUP BY o_orderpriority
        |> ORDER BY o_orderpriority""")
  }

  val qSqlPipeOracle: String =
    """SELECT o_orderpriority, count(*) AS n_orders,
      sum(o_totalprice::DECIMAL(18,2))::VARCHAR AS total_price
      FROM orders WHERE o_orderstatus = 'O'
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  // ---------- LATERAL correlated subquery (top-N per group via join) ----------
  /** The LATERAL top-N-per-group idiom: for every nation, its two
    * highest-balance customers via a correlated `LATERAL (… ORDER BY …
    * LIMIT 2)` subquery — the SQL surface users reach for before they
    * learn window functions, and a real decorrelation workout for
    * Catalyst (the correlated limit must become a per-key rank, not a
    * per-row re-scan). Balances compare as DECIMAL(18,2) so the top-2
    * cut is exact; ties break on the customer key.
    *
    * Scale shape: Catalyst decorrelates to a partitioned rank over the
    * customer side — one nation-keyed exchange, no per-nation re-scan
    * of the fact; the 25-row nation dimension broadcasts.
    */
  def qLateralJoin(spark: SparkSession, dir: String): DataFrame = {
    Tables.nation(spark, dir).createOrReplaceTempView("graft_nation_lat")
    Tables.customer(spark, dir).createOrReplaceTempView("graft_customer_lat")
    spark.sql(
      """SELECT n.n_name, c.c_custkey,
           CAST(c.bal AS STRING) AS acctbal
         FROM graft_nation_lat n
         JOIN LATERAL (
           SELECT c_custkey, CAST(c_acctbal AS DECIMAL(18,2)) AS bal
           FROM graft_customer_lat
           WHERE c_nationkey = n.n_nationkey
           ORDER BY bal DESC, c_custkey
           LIMIT 2) c
         ORDER BY n.n_name, c.bal DESC, c.c_custkey""")
  }

  val qLateralJoinOracle: String =
    """SELECT n.n_name, c.c_custkey, c.bal::VARCHAR AS acctbal
      FROM nation n
      JOIN LATERAL (
        SELECT c_custkey, c_acctbal::DECIMAL(18,2) AS bal
        FROM customer
        WHERE c_nationkey = n.n_nationkey
        ORDER BY bal DESC, c_custkey
        LIMIT 2) c ON true
      ORDER BY n.n_name, c.bal DESC, c.c_custkey"""

  // ---------- UNPIVOT (wide → long reshape) ----------
  /** The UNPIVOT clause (Spark 3.4+ SQL surface): the four lineitem
    * measures reshape wide → long and aggregate per measure — the melt
    * step of every profiling/reporting pipeline, complementing
    * [[qPivot]]'s long → wide. Measures quantize to exact e2 integers
    * AFTER the reshape so the sums are associative BIGINTs.
    *
    * Scale shape: UNPIVOT is a scan-side Expand (4 output rows per
    * input row, no exchange); the aggregate is one combine-fed
    * 4-group exchange. The fan-out is the reshape's semantics — the
    * plan adds nothing on top.
    */
  def qUnpivot(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("graft_li_unpivot")
    spark.sql(
      """SELECT m, count(*) AS n,
           sum(CAST(round(v * 100) AS BIGINT)) AS sum_e2,
           min(CAST(round(v * 100) AS BIGINT)) AS min_e2,
           max(CAST(round(v * 100) AS BIGINT)) AS max_e2
         FROM (
           SELECT l_quantity AS quantity, l_extendedprice AS price,
                  l_discount AS discount, l_tax AS tax
           FROM graft_li_unpivot)
         UNPIVOT (v FOR m IN (quantity, price, discount, tax))
         GROUP BY m ORDER BY m""")
  }

  val qUnpivotOracle: String =
    """WITH long AS (
        SELECT 'quantity' AS m, l_quantity AS v FROM lineitem
        UNION ALL SELECT 'price', l_extendedprice FROM lineitem
        UNION ALL SELECT 'discount', l_discount FROM lineitem
        UNION ALL SELECT 'tax', l_tax FROM lineitem)
      SELECT m, count(*) AS n,
        sum(round(v * 100)::BIGINT)::BIGINT AS sum_e2,
        min(round(v * 100)::BIGINT) AS min_e2,
        max(round(v * 100)::BIGINT) AS max_e2
      FROM long GROUP BY m ORDER BY m"""

  import org.apache.spark.sql.SparkSession
  private implicit class Dollar(val sc: StringContext) {
    def $(args: Any*): org.apache.spark.sql.Column = col(sc.s(args: _*))
  }

  // ---------- SQL surface of the graft kernel library ----------
  /** Every custom kernel is registered as a SQL function by
    * [[graft.plans.GraftExtensions]]; this query exercises them from PURE
    * SQL (no Scala Column API) against a DuckDB reimplementation of the
    * same semantics — proving the library is fully reachable for
    * SQL-only/JDBC consumers.
    */
  def qSqlKernels(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir).createOrReplaceTempView("docs_sqlk")
    // REPARTITION hint: documents is a single parquet file (one input
    // partition) and this query is per-doc kernel-heavy — without the
    // hint it runs single-core
    spark.sql(s"""
      SELECT /*+ REPARTITION(${spark.sparkContext.defaultParallelism}) */
        doc_id,
        size(word_shingles(text, 3)) AS n_shingles,
        size(char_grams(text, 5)) AS n_grams,
        rolling_hash(text) AS roll_fp,
        round(array_jaccard(word_shingles(text, 3),
                            word_shingles(lower(text), 3)), 6) AS case_jac,
        image_width(png_encode_gray(CAST(8 + doc_id % 9 AS INT), 8, doc_id))
          AS png_w,
        round(png_brightness(
          png_encode_gray(CAST(8 + doc_id % 9 AS INT), 8, doc_id)), 4)
          AS png_bright
      FROM docs_sqlk
      WHERE size(split(text, ' ', -1)) >= 3
      ORDER BY doc_id""")
  }

  val qSqlKernelsOracle: String =
    """WITH d AS (SELECT doc_id, text, string_split(text, ' ') ws
        FROM documents WHERE len(string_split(text, ' ')) >= 3),
      sh AS (SELECT doc_id, text,
        list_distinct([ws[i]||' '||ws[i+1]||' '||ws[i+2]
          for i in range(1, len(ws)-1)]) s1,
        list_distinct([lws[i]||' '||lws[i+1]||' '||lws[i+2]
          for i in range(1, len(lws)-1)]) s2
        FROM (SELECT doc_id, text, ws, string_split(lower(text), ' ') lws FROM d)),
      j AS (SELECT doc_id, text, len(s1) n_shingles,
        len(list_filter(s1, x -> list_contains(s2, x))) i,
        len(s1) + len(s2) AS ab FROM sh)
      SELECT doc_id, n_shingles,
        len(list_distinct(CASE WHEN len(text) < 5 THEN []::VARCHAR[]
          ELSE [substr(text, i, 5) for i in range(1, len(text) - 3)] END))
          AS n_grams,
        list_reduce(list_transform(string_split(text, ''), c -> ascii(c)::BIGINT),
          (h, c) -> (h * 31 + c) % 1000000007) AS roll_fp,
        round(i * 1.0 / (ab - i), 6) AS case_jac,
        (8 + doc_id % 9)::INT AS png_w,
        round(list_sum(flatten([[ (7 * x + 13 * y + doc_id) % 256
            for x in range(0, (8 + doc_id % 9)::INT)] for y in range(0, 8)]))
          ::DOUBLE / ((8 + doc_id % 9) * 8), 4) AS png_bright
      FROM j ORDER BY doc_id"""

  // ---------- grouping sets (arbitrary set list beyond rollup/cube) ----------
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupingSets(
        Seq(Seq($"l_returnflag", $"l_linestatus"), Seq($"l_returnflag"),
          Seq($"l_linestatus"), Seq.empty),
        $"l_returnflag", $"l_linestatus")
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        round(sum($"l_extendedprice"), 2).as("sum_price"))
      .orderBy($"gid", $"l_returnflag".asc_nulls_first,
        $"l_linestatus".asc_nulls_first)

  /** grouping_id(): both engines use the SQL-standard bit vector
    * (1 = column aggregated away), so gid values compare directly.
    */
  val qGroupingSetsOracle: String =
    """SELECT l_returnflag, l_linestatus,
      GROUPING(l_returnflag, l_linestatus)::BIGINT AS gid,
      count(*) AS n, round(sum(l_extendedprice), 2) AS sum_price
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        (l_returnflag), (l_linestatus), ())
      ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""

  // ---------- RANGE-frame window (value-based frame, not row-based) ----------
  /** Frame contents depend only on the ORDER value, so peers (equal
    * quantity) share results; the output is the DISTINCT per-(flag,
    * quantity) frame aggregate — deterministic without a unique row key.
    * Quantities are integral doubles, so the in-frame sums are exact and
    * need no rounding.
    */
  def qWindowRange(spark: SparkSession, dir: String): DataFrame = {
    // pre-aggregate to one weighted row per (flag, quantity) BEFORE the
    // window: the RANGE frame depends only on the order value, so the
    // window runs over ~50 rows per flag (with counts as weights) instead
    // of sorting the full fact table inside each partition — same result,
    // and the expensive sort shrinks by the dedup factor (~4000x here)
    val g = Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag", $"l_quantity")
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy($"l_returnflag").orderBy($"l_quantity")
      .rangeBetween(-5, Window.currentRow)
    g.withColumn("range_n", sum($"cnt").over(w))
      .withColumn("range_qty", sum($"l_quantity" * $"cnt").over(w))
      .select($"l_returnflag", $"l_quantity", $"range_n", $"range_qty")
      .orderBy($"l_returnflag", $"l_quantity")
  }

  val qWindowRangeOracle: String =
    """SELECT DISTINCT l_returnflag, l_quantity,
      count(*) OVER w AS range_n,
      sum(l_quantity) OVER w AS range_qty
      FROM lineitem
      WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity
        RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
      ORDER BY l_returnflag, l_quantity"""

  // ---------- exact percentiles ----------
  /** Exact interpolated percentiles per group WITHOUT a per-group total
    * order. The r6 spelling ranked every row with `row_number` over
    * `Window.partitionBy(l_returnflag)` — with 3 distinct flags that is 3
    * tasks each sorting n/3 rows, the suite's clearest single-task
    * bottleneck at 100×. This plan finds the ≤ 2 bracketing ORDER
    * STATISTICS per target rank by value-bucketed rank location instead,
    * in exactly TWO fact scans and zero fact-wide sorts:
    *
    *  1. a monotone scan-side bucket id (`floor(512·ln v)` — needs no
    *     min/max pre-pass) feeds a per-(group, bucket) count; running-sum
    *     + total windows over that BUCKET AGGREGATE (≤ ~2400 rows per
    *     group — dimension-scale, never the fact) locate which bucket
    *     holds each target rank `floor/ceil((n-1)·q)`;
    *  2. only rows in located buckets survive an inner broadcast join
    *     (≤ 8 buckets per group, expected n/B rows each), get bucket-local
    *     `row_number` (small sorted partitions, parallel across buckets),
    *     and the rows whose global rank = bucket cum-count + local rank
    *     is a target are picked;
    *  3. one conditional aggregate interpolates — identical rank math and
    *     FP order as before, so the oracle is unchanged.
    *
    * Equal values share a bucket, so bucket-local ranking reproduces
    * global order statistics exactly regardless of tie order. Log-value
    * buckets can skew (worst case: one bucket holds everything and
    * degrades to the old per-group sort); at 100 TB seed equi-depth
    * boundaries with `approx_quantile` instead — the refinement stays
    * exact either way. Spark's exact `percentile` aggregate is still
    * worse: it buffers every (value → count) per group into one in-memory
    * map merged single-threaded per group (measured 4.7 s at sf0.1, OOMs
    * long before 100 TB). DuckDB's `quantile_cont` does the same linear
    * interpolation, so the oracle is exact at 2 dp.
    */
  def qPercentiles(spark: SparkSession, dir: String): DataFrame = {
    val qs = Seq(0.25 -> "p25", 0.5 -> "p50", 0.75 -> "p75", 0.95 -> "p95")
    // monotone scan-side bucket id — no min/max pre-pass needed: for
    // positive values floor(512·ln v) is order-preserving with ~512
    // buckets per e-fold (≈ 2400 over lineitem's price range); all values
    // ≤ 1e-300 (incl. would-be-NaN inputs) collapse into the single lowest
    // bucket, which stays monotone and is resolved by the in-bucket sort
    val bucket = floor(log(greatest(col("l_extendedprice"), lit(1e-300))) * 512)
    val base = Tables.table(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"), bucket.as("b"))

    // pass 1: per-(group, bucket) counts; the running sum + group total are
    // windows over the BUCKET AGGREGATE (≤ ~2400 rows per group —
    // dimension-scale, never the fact)
    val wb = Window.partitionBy(col("l_returnflag")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wg = Window.partitionBy(col("l_returnflag"))
    val cum = base.groupBy(col("l_returnflag"), col("b"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum_before", sum(col("cnt")).over(wb) - col("cnt"))
      .withColumn("n", sum(col("cnt")).over(wg).cast("double"))

    // explode each bucket row into the 8 target ranks floor/ceil((n-1)·q)
    // and keep the (bucket, rank) pairs where the rank falls inside the
    // bucket's [cum_before, cum_before+cnt) range — no self-join, the
    // bucket aggregate is read once
    val located = cum
      .withColumn("rank", explode(array(qs.flatMap { case (q, _) =>
        val t = (col("n") - 1) * q
        Seq(floor(t).cast("long"), ceil(t).cast("long"))
      }: _*)))
      .filter(col("rank") >= col("cum_before") &&
        col("rank") < col("cum_before") + col("cnt"))
      .groupBy(col("l_returnflag"), col("b"), col("cum_before"), col("n"))
      .agg(collect_set(col("rank")).as("ranks"))

    // pass 2: the inner broadcast join keeps only rows in located buckets
    // (≤ 8 buckets per group, expected n/B rows each); bucket-local
    // row_number sorts those small partitions in parallel, and the row
    // whose global rank (cum_before + local) is a target survives
    val wl = Window.partitionBy(col("l_returnflag"), col("b"))
      .orderBy(col("l_extendedprice"))
    val picked = base
      .join(broadcast(located), Seq("l_returnflag", "b"))
      .withColumn("local", row_number().over(wl).cast("long") - 1)
      .filter(array_contains(col("ranks"), col("cum_before") + col("local")))
      .select(col("l_returnflag"),
        (col("cum_before") + col("local")).cast("double").as("i"),
        col("l_extendedprice"), col("n"))

    // interpolate — identical FP expression (and order) as the oracle
    val interp = qs.map { case (q, name) =>
      val t = (col("n") - 1) * q
      val lo = max(when(col("i") === floor(t), col("l_extendedprice")))
      val hi = max(when(col("i") === ceil(t), col("l_extendedprice")))
      // round-to-cents as round(v*100)/100 — NOT round(v, 2): Spark rounds
      // the double's DECIMAL string (BigDecimal.valueOf) while DuckDB
      // rounds the scaled BINARY (std::round(v*100)/100), and an
      // interpolated v of ...2449999995 whose v*100 is exactly ...24.5
      // flips a cent between the two. Scaling explicitly makes both
      // engines round the identical scaled double, which they treat the
      // same way in every case (half-away at exact .5, down below it).
      (round((lo + (hi - lo) * (first(t) - floor(first(t)))) * 100, 0) / 100)
        .as(name)
    }
    val aggs = interp :+ first(col("n")).cast("long").as("n")
    picked
      .groupBy(col("l_returnflag"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col("l_returnflag"))
  }

  /** The oracle mirrors the rank-math interpolation TERM FOR TERM
    * (`lo + (hi - lo) * (t - floor(t))`, `t = (n-1)·q`, all double)
    * rather than calling DuckDB's `quantile_cont`: the two formulas are
    * algebraically equal but not FP-equal (quantile_cont interpolates in
    * its own operation order), and at sf0.001 a p50 landed exactly on a
    * half-cent rounding boundary — one ULP flipped the 2-dp output.
    * Identical formula + identical order = bit-identical doubles.
    */
  val qPercentilesOracle: String = {
    val qs = Seq(0.25 -> "p25", 0.5 -> "p50", 0.75 -> "p75", 0.95 -> "p95")
    val aggs = qs.map { case (q, name) =>
      s"""max(CASE WHEN i = floor((n - 1) * $q) THEN l_extendedprice END) AS lo_$name,
        max(CASE WHEN i = ceil((n - 1) * $q) THEN l_extendedprice END) AS hi_$name,
        max((n - 1) * $q - floor((n - 1) * $q)) AS f_$name"""
    }.mkString(",\n        ")
    val outs = qs.map { case (_, name) =>
      s"round((lo_$name + (hi_$name - lo_$name) * f_$name) * 100) / 100 AS $name"
    }.mkString(",\n        ")
    s"""WITH r AS (SELECT l_returnflag, l_extendedprice,
        (row_number() OVER (PARTITION BY l_returnflag
           ORDER BY l_extendedprice) - 1)::DOUBLE AS i,
        (count(*) OVER (PARTITION BY l_returnflag))::DOUBLE AS n
        FROM lineitem),
      g AS (SELECT l_returnflag,
        $aggs,
        max(n)::BIGINT AS n_rows
        FROM r GROUP BY l_returnflag)
      SELECT l_returnflag,
        $outs,
        n_rows AS n
      FROM g ORDER BY l_returnflag"""
  }

  // ---------- mergeable histogram quantiles ----------
  /** Approximate quantiles with a GUARANTEED resolution bound via a
    * fixed-grid histogram — the sketch you actually run at 100 TB for
    * monitoring and data-quality gates, where `q_percentiles`' exact
    * order statistics are overkill. State is one integer count per
    * occupied bin (O(range/step), here ≤ ~1800), merges are plain
    * integer sums — associative and commutative, so the result is
    * deterministic under ANY executor/merge order. That determinism is
    * the design point: GK and t-digest sketches give tighter bounds but
    * their outputs depend on merge order, which this engine's hash-exact
    * oracle contract (and any reproducible pipeline) refuses.
    *
    * Bin = floor(value / 64): a power-of-two step, so the division is
    * EXACT in IEEE doubles and the bin id is engine-identical for
    * identical inputs. Emitted per (group, quantile): the bracketing
    * [lo, hi) value bounds, hi - lo = 64 the certified worst-case error.
    * `OpsSpec` asserts the exact percentile falls inside every emitted
    * bracket.
    *
    * Scale shape: the fact pays ONE shuffle, keyed (group, bin), with
    * map-side combine; the cumulative/total windows run over the bucket
    * AGGREGATE (dimension-scale, partitioned by group — never a global
    * window); quantile selection is a filter + min over those same rows.
    */
  def qQuantileSketch(spark: SparkSession, dir: String): DataFrame = {
    val bins = Tables.table(spark, dir, "lineitem")
      .select(col("l_returnflag"),
        floor(col("l_extendedprice") / lit(64.0)).cast("long").as("bin"))
      .groupBy(col("l_returnflag"), col("bin"))
      .agg(count(lit(1)).as("cnt"))
    val wb = Window.partitionBy(col("l_returnflag")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wg = Window.partitionBy(col("l_returnflag"))
    bins
      .withColumn("cum", sum(col("cnt")).over(wb))
      .withColumn("total", sum(col("cnt")).over(wg))
      .withColumn("quantile",
        explode(array(lit(0.5), lit(0.9), lit(0.99))))
      .filter(col("cum") >= ceil(col("quantile") * col("total")))
      .groupBy(col("l_returnflag"), col("quantile"))
      .agg(min(col("bin")).as("qbin"))
      .select(col("l_returnflag"), col("quantile"),
        (col("qbin") * 64).as("lo"), ((col("qbin") + 1) * 64).as("hi"))
      .orderBy(col("l_returnflag"), col("quantile"))
  }

  val qQuantileSketchOracle: String =
    """WITH b AS (SELECT l_returnflag,
        floor(l_extendedprice / 64)::BIGINT bin, count(*) cnt
        FROM lineitem GROUP BY 1, 2),
      c AS (SELECT l_returnflag, bin,
          sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY bin) cum,
          sum(cnt) OVER (PARTITION BY l_returnflag) total FROM b),
      q AS (SELECT unnest([0.5::DOUBLE, 0.9::DOUBLE, 0.99::DOUBLE]) quantile),
      sel AS (SELECT l_returnflag, quantile, min(bin) qbin
        FROM c, q WHERE cum >= ceil(quantile * total) GROUP BY 1, 2)
      SELECT l_returnflag, quantile, qbin * 64 lo, (qbin + 1) * 64 hi
      FROM sel ORDER BY l_returnflag, quantile"""

  // ---------- distribution window functions ----------
  /** percent_rank / cume_dist / ntile over a total per-partition order
    * (tie-broken by key, so every function is deterministic), folded to a
    * per-decile summary. One shuffle on the window partition key; the
    * decile report reuses the same partitioning.
    */
  def qWindowDist(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.table(spark, dir, "customer")
      .select(col("c_mktsegment"), col("c_acctbal"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"),
        ntile(10).over(w).as("decile"))
      .groupBy(col("c_mktsegment"), col("decile"))
      .agg(count(lit(1)).as("n"),
        round(min(col("pr")), 6).as("min_pr"),
        round(max(col("cd")), 6).as("max_cd"),
        round(min(col("c_acctbal")), 2).as("lo_bal"),
        round(max(col("c_acctbal")), 2).as("hi_bal"))
      .orderBy(col("c_mktsegment"), col("decile"))
  }

  val qWindowDistOracle: String =
    """WITH t AS (SELECT c_mktsegment, c_acctbal,
        percent_rank() OVER w AS pr, cume_dist() OVER w AS cd,
        ntile(10) OVER w AS decile
      FROM customer
      WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey))
      SELECT c_mktsegment, decile, count(*) AS n,
        round(min(pr), 6) AS min_pr, round(max(cd), 6) AS max_cd,
        round(min(c_acctbal), 2) AS lo_bal, round(max(c_acctbal), 2) AS hi_bal
      FROM t GROUP BY c_mktsegment, decile ORDER BY c_mktsegment, decile"""

  // ---------- correlated EXISTS / NOT EXISTS ----------
  /** Correlated existential subqueries: customers with at least one
    * urgent order and no large finished order. Catalyst decorrelates
    * both into joins (semi + anti) on `o_custkey` — no per-row subquery
    * execution, one shuffle per probe side.
    */
  def qExistsSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.table(spark, dir, "customer").createOrReplaceTempView("cust_ex")
    Tables.table(spark, dir, "orders").createOrReplaceTempView("ord_ex")
    spark.sql("""
      SELECT c_mktsegment, count(*) AS n_cust
      FROM cust_ex c
      WHERE EXISTS (SELECT 1 FROM ord_ex o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT')
        AND NOT EXISTS (SELECT 1 FROM ord_ex o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderstatus = 'F' AND o.o_totalprice > 200000)
      GROUP BY c_mktsegment ORDER BY c_mktsegment""")
  }

  val qExistsSubqueryOracle: String =
    """SELECT c_mktsegment, count(*) AS n_cust
      FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT')
        AND NOT EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderstatus = 'F' AND o.o_totalprice > 200000)
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  // ---------- q17 shape: correlated scalar subqueries (small-qty revenue) ----
  /** TPC-H Q17 re-shaped to this schema: revenue from lineitems whose
    * quantity is below 20% of their part's average. The Spark side is
    * deliberately written as SQL with TWO correlated scalar subqueries so
    * Catalyst's decorrelation (`DecorrelateInnerQuery` → outer join on a
    * per-part aggregate) is exercised: the plan has no nested loop, but
    * Catalyst does NOT merge the two correlated aggregates, so lineitem
    * is scanned three times — at 100 TB one writes the single joint
    * aggregate + join form instead (the shape q18 demonstrates); this
    * query exists to pin the subquery path's correctness.
    * The 20%-of-average predicate is integer cross-multiplied
    * (`5·qty·cnt < sum`): quantities are integral, so both engines compare
    * exact BIGINTs and the decision is FP-free. Revenue is the exact
    * DECIMAL sum emitted as a string (q10's convention).
    */
  def q17SmallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("li17")
    Tables.part(spark, dir).createOrReplaceTempView("pt17")
    spark.sql("""
      SELECT count(*) AS n_items,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS STRING) AS revenue_sum
      FROM li17 l JOIN pt17 p ON l.l_partkey = p.p_partkey
      WHERE p.p_brand = 'Brand#3'
        AND 5 * CAST(round(l.l_quantity) AS BIGINT) *
              (SELECT count(*) FROM li17 l2 WHERE l2.l_partkey = l.l_partkey)
            < (SELECT CAST(round(sum(l2.l_quantity)) AS BIGINT) FROM li17 l2
               WHERE l2.l_partkey = l.l_partkey)""")
  }

  val q17Oracle: String =
    """SELECT count(*) AS n_items,
      sum(l_extendedprice::DECIMAL(18,2))::VARCHAR AS revenue_sum
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_brand = 'Brand#3'
        AND 5 * round(l.l_quantity)::BIGINT *
              (SELECT count(*) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
            < (SELECT round(sum(l2.l_quantity))::BIGINT FROM lineitem l2
               WHERE l2.l_partkey = l.l_partkey)"""

  // ---------- q18 shape: large-volume orders (IN-subquery with HAVING) ----
  /** TPC-H Q18: orders whose total quantity exceeds 150, with customer.
    * The heavy side is one shuffle on `l_orderkey` with map-side partial
    * sums; the HAVING filter reduces the key set to ~0.3% BEFORE the
    * orders/customer joins, and the final top-100 is a
    * TakeOrderedAndProject, not a global sort. Quantity sums are integral
    * doubles → exact BIGINTs on both engines.
    */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy($"l_orderkey")
      // round-then-cast, both engines: Spark's bare double→long cast
      // TRUNCATES while DuckDB's ::BIGINT rounds half-even — identical
      // only while quantities stay integral. round() is away-from-zero
      // on the exact binary value in BOTH engines, data-independent.
      .agg(round(sum($"l_quantity")).cast("long").as("sum_qty"))
      .filter($"sum_qty" > 150)
    big.join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .select($"c_custkey", $"c_name", $"o_orderkey",
        $"o_orderdate".as("orderdate"),
        round($"o_totalprice", 2).as("totalprice"), $"sum_qty")
      .orderBy($"totalprice".desc, $"o_orderkey".asc)
      .limit(100)
  }

  val q18Oracle: String =
    """SELECT c_custkey, c_name, o_orderkey, o_orderdate AS orderdate,
      round(o_totalprice, 2) AS totalprice, sum_qty
      FROM (SELECT l_orderkey, round(sum(l_quantity))::BIGINT AS sum_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING round(sum(l_quantity))::BIGINT > 150) t
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      ORDER BY totalprice DESC, o_orderkey ASC LIMIT 100"""

  // ---------- q19 shape: disjunctive join predicates ----------
  /** TPC-H Q19: revenue under an OR of three brand/size/quantity windows.
    * The interesting planner property: the join stays a plain equi-join on
    * `p_partkey` (broadcast — part is a dimension) with the disjunction
    * applied as a post-join filter, and the common `p_partkey` conjunct is
    * NOT lost inside the OR. Revenue is decimal-exact (2-dp price × 2-dp
    * discount factor → scale-4, associative on both engines).
    */
  def q19DisjunctivePredicates(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir)
    val rev = sum($"l_extendedprice".cast("decimal(18,2)") *
      (lit(1).cast("decimal(3,2)") - $"l_discount".cast("decimal(18,2)")))
    l.join(broadcast(p), $"l_partkey" === $"p_partkey")
      .filter(
        ($"p_brand" === "Brand#12" && $"p_size".between(1, 15) &&
          $"l_quantity".between(1, 11)) ||
        ($"p_brand" === "Brand#23" && $"p_size".between(1, 25) &&
          $"l_quantity".between(10, 20)) ||
        ($"p_brand" === "Brand#3" && $"p_size".between(1, 35) &&
          $"l_quantity".between(20, 30)))
      .agg(count(lit(1)).as("n_items"), rev.cast("string").as("revenue"))
  }

  val q19Oracle: String =
    """SELECT count(*) AS n_items,
      sum(l_extendedprice::DECIMAL(18,2)
        * (1 - l_discount::DECIMAL(18,2)))::VARCHAR AS revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
         OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 20)
         OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 30)"""

  // ---------- q15 shape: top supplier by revenue (max-equality on agg) ----
  /** TPC-H Q15: supplier(s) achieving the maximum 3-month revenue. The
    * revenue per supplier is an exact DECIMAL sum, so the `revenue =
    * max(revenue)` equality is deterministic — with double sums the
    * last-ULP summation order could pick a different supplier near a tie.
    * The global max is a separate `agg(max)` broadcast back as an equality
    * join — NO unpartitioned window anywhere in the plan. The two uses of
    * `rev` plan the same `Exchange hashpartitioning(l_suppkey)` subtree,
    * which Spark's exchange reuse dedupes at execution (the plan carries a
    * `ReusedExchange`, pinned by PlanAuditSpec): the fact is scanned,
    * partially aggregated and shuffled ONCE, and the max side reads the
    * reused shuffle output — same single-scan cost as the old window
    * spelling without serializing the dimension-sized aggregate through
    * one task.
    */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    // the explicit isnotnull mirrors what the supplier join pushes into
    // the join branch — WITHOUT it the two rev subtrees canonicalize
    // differently (one has the pushed filter, the max side doesn't) and
    // AQE cannot reuse the shuffle stage
    val rev = Tables.lineitem(spark, dir)
      .filter($"l_suppkey".isNotNull &&
        $"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1996-04-01").cast("timestamp"))
      .groupBy($"l_suppkey")
      .agg(sum($"l_extendedprice".cast("decimal(18,2)") *
        (lit(1).cast("decimal(3,2)") - $"l_discount".cast("decimal(18,2)")))
        .as("total_rev"))
    val maxRev = rev.agg(max($"total_rev").as("max_rev"))
    rev.join(broadcast(maxRev), $"total_rev" === $"max_rev")
      .join(Tables.supplier(spark, dir), $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name", $"total_rev".cast("string").as("total_revenue"))
      .orderBy($"s_suppkey")
  }

  val q15Oracle: String =
    """WITH rev AS (SELECT l_suppkey,
        sum(l_extendedprice::DECIMAL(18,2)
          * (1 - l_discount::DECIMAL(18,2))) AS total_rev
        FROM lineitem
        WHERE l_suppkey IS NOT NULL
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, total_rev::VARCHAR AS total_revenue
      FROM rev JOIN supplier ON l_suppkey = s_suppkey
      WHERE total_rev = (SELECT max(total_rev) FROM rev)
      ORDER BY s_suppkey"""

  // ---------- q02 shape: min-cost supplier per part ----------
  /** TPC-H Q2's shape without a partsupp table: the part↔supplier bridge
    * is derived from lineitem (cheapest observed sale price per pair —
    * exact DECIMAL min, so the min-equality is deterministic). The
    * correlated scalar subquery `cost = (SELECT min(cost) ... WHERE
    * partkey = outer.partkey)` decorrelates to a min window PARTITIONED BY
    * the part key over the pair aggregate — partkey cardinality grows with
    * the catalog, so the window partitions stay small at any scale (this
    * is the high-cardinality-safe sibling of the q15 global max, which
    * needs the agg+broadcast spelling instead). The selective part filter
    * broadcasts and prunes the fact scan BEFORE the aggregation.
    */
  def q02MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val pSel = Tables.part(spark, dir)
      .filter($"p_size" <= 5 && $"p_type" === "SMALL")
      .select($"p_partkey", $"p_name")
    val offers = Tables.lineitem(spark, dir)
      .join(broadcast(pSel), $"l_partkey" === $"p_partkey")
      .groupBy($"l_partkey", $"p_name", $"l_suppkey")
      .agg(min($"l_extendedprice".cast("decimal(18,2)")).as("cost"))
    val wMin = Window.partitionBy($"l_partkey")
    offers
      .withColumn("min_cost", min($"cost").over(wMin))
      .filter($"cost" === $"min_cost")
      .join(broadcast(Tables.supplier(spark, dir)), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(Tables.nation(spark, dir)), $"s_nationkey" === $"n_nationkey")
      .select($"l_partkey".as("p_partkey"), $"p_name", $"s_name", $"n_name",
        $"cost".cast("string").as("cost"))
      .orderBy($"p_partkey", $"s_name")
  }

  val q02MinCostOracle: String =
    """WITH offers AS (SELECT l_partkey, p_name, l_suppkey,
        min(l_extendedprice::DECIMAL(18,2)) AS cost
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_size <= 5 AND p_type = 'SMALL'
        GROUP BY 1, 2, 3),
      m AS (SELECT *, min(cost) OVER (PARTITION BY l_partkey) AS min_cost
        FROM offers)
      SELECT l_partkey AS p_partkey, p_name, s_name, n_name,
        cost::VARCHAR AS cost
      FROM m
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      WHERE cost = min_cost
      ORDER BY p_partkey, s_name"""

  // ---------- q11 shape: parts above a global value fraction ----------
  /** TPC-H Q11's shape: per-part traded value, kept where it exceeds a
    * fraction of the GLOBAL total — the scalar-subquery-over-aggregate
    * pattern. The global total is a second-level aggregate of the same
    * per-part aggregate, broadcast back through a 1-row cross join (never
    * an unpartitioned window); both branches plan the identical
    * per-partkey exchange, which AQE's exchange reuse dedupes — one fact
    * scan, one fact shuffle. All sums are exact DECIMAL and the threshold
    * multiply is DECIMAL×DECIMAL, so the strict > keep-set is
    * deterministic on both engines.
    */
  def q11ImportantParts(spark: SparkSession, dir: String): DataFrame = {
    val vals = Tables.lineitem(spark, dir)
      .filter($"l_partkey".isNotNull)
      .groupBy($"l_partkey")
      .agg(sum($"l_extendedprice".cast("decimal(18,2)")).as("value"))
    val total = vals.agg(
      (sum($"value") * lit(0.0008).cast("decimal(8,6)")).as("threshold"))
    vals.crossJoin(broadcast(total))
      .filter($"value" > $"threshold")
      .select($"l_partkey", $"value".cast("string").as("value"))
      .orderBy(desc("value"), $"l_partkey")
  }

  val q11Oracle: String =
    """WITH vals AS (SELECT l_partkey,
        sum(l_extendedprice::DECIMAL(18,2)) AS value
        FROM lineitem WHERE l_partkey IS NOT NULL GROUP BY 1)
      SELECT l_partkey, value::VARCHAR AS value
      FROM vals
      WHERE value > (SELECT sum(value) FROM vals) * 0.0008::DECIMAL(8,6)
      ORDER BY value DESC, l_partkey"""

  // ---------- q16 shape: supplier diversity minus excluded suppliers ----
  /** TPC-H Q16's shape: distinct supplier count per part attribute,
    * excluding suppliers from a NOT IN subquery. The bridge is the
    * DISTINCT (part, supplier) pair set from lineitem (map-side
    * pre-aggregated); the NOT IN decorrelates to a broadcast LEFT ANTI
    * join (keys are non-null, so NOT IN ≡ NOT EXISTS); the distinct count
    * shuffles once on the attribute key. Part attributes ride the
    * broadcast dimension join.
    */
  def q16SupplierDiversity(spark: SparkSession, dir: String): DataFrame = {
    val sizes = Seq(1, 5, 9, 14, 19, 23, 36, 45)
    val pairs = Tables.lineitem(spark, dir)
      .select($"l_partkey", $"l_suppkey").distinct()
    val excl = Tables.supplier(spark, dir)
      .filter($"s_name".like("%1%")).select($"s_suppkey")
    val p = Tables.part(spark, dir)
      .filter($"p_type" =!= "ECONOMY" && $"p_size".isin(sizes: _*))
    pairs
      .join(broadcast(p), $"l_partkey" === $"p_partkey")
      .join(broadcast(excl), $"l_suppkey" === $"s_suppkey", "left_anti")
      .groupBy($"p_brand", $"p_type", $"p_size")
      .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
      .orderBy(desc("supplier_cnt"), $"p_brand", $"p_type", $"p_size")
  }

  val q16Oracle: String =
    """WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
      SELECT p_brand, p_type, p_size,
        count(DISTINCT l_suppkey) AS supplier_cnt
      FROM pairs JOIN part ON p_partkey = l_partkey
      WHERE p_type <> 'ECONOMY' AND p_size IN (1,5,9,14,19,23,36,45)
        AND NOT EXISTS (SELECT 1 FROM supplier
          WHERE s_suppkey = l_suppkey AND s_name LIKE '%1%')
      GROUP BY 1, 2, 3
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""

  // ---------- q20 shape: excess-share suppliers (nested IN chain) ------
  /** TPC-H Q20's shape: suppliers who shipped MORE THAN HALF of some
    * filtered part's 1996 volume — a two-level nested IN chain,
    * decorrelated to two LEFT SEMI joins. The part-name IN prunes the
    * fact BEFORE aggregation (broadcast semi); the per-part total is a
    * sum window partitioned by the high-cardinality part key over the
    * pair aggregate (no second shuffle of the same data); the final
    * supplier IN is a semi join against the qualifying-supplier set.
    * Quantities are integral doubles, so the sums and the ·0.5 threshold
    * are exact and the strict > is deterministic.
    */
  def q20ExcessShareSupplier(spark: SparkSession, dir: String): DataFrame = {
    val selParts = Tables.part(spark, dir)
      .filter($"p_name".like("red%")).select($"p_partkey")
    val perPair = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-01-01").cast("timestamp"))
      .join(broadcast(selParts), $"l_partkey" === $"p_partkey", "left_semi")
      .groupBy($"l_partkey", $"l_suppkey")
      .agg(sum($"l_quantity").as("q"))
    val qualified = perPair
      .withColumn("total_q", sum($"q").over(Window.partitionBy($"l_partkey")))
      .filter($"q" > $"total_q" * 0.5)
      .select($"l_suppkey")
    Tables.supplier(spark, dir)
      .join(qualified, $"s_suppkey" === $"l_suppkey", "left_semi")
      .select($"s_suppkey", $"s_name")
      .orderBy($"s_suppkey")
  }

  val q20Oracle: String =
    """WITH ps AS (SELECT l_partkey, l_suppkey, sum(l_quantity) AS q,
        sum(sum(l_quantity)) OVER (PARTITION BY l_partkey) AS total_q
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_partkey IN (SELECT p_partkey FROM part
            WHERE p_name LIKE 'red%')
        GROUP BY l_partkey, l_suppkey)
      SELECT s_suppkey, s_name FROM supplier
      WHERE s_suppkey IN (SELECT l_suppkey FROM ps WHERE q > 0.5 * total_q)
      ORDER BY s_suppkey"""

  // ---------- q09 shape: product-type profit by nation and year ----------
  /** TPC-H Q9's shape (the last classic shape in the suite): profit per
    * supplier nation per order year over name-filtered parts, with the
    * cost side derived from `p_retailprice` (no partsupp in this schema).
    * Both profit terms are exact DECIMAL products carried through one
    * aggregation pass — revenue at scale 4, cost at scale 6, difference
    * at scale 6 in BOTH engines (Spark's precision-capped multiply and
    * DuckDB's width-capped multiply land on the same scale here, so the
    * VARCHAR render is identical). The selective part filter broadcasts
    * and prunes the fact first; lineitem⋈orders is the one fact-fact join
    * (co-keyed on orderkey); the group-by shuffles once on
    * (nation, year).
    */
  def q09ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir).select($"o_orderkey", $"o_orderdate")
    val p = Tables.part(spark, dir)
      .filter($"p_name".like("%bolt%"))
      .select($"p_partkey", $"p_retailprice")
    val s = Tables.supplier(spark, dir).select($"s_suppkey", $"s_nationkey")
    val n = Tables.nation(spark, dir).select($"n_nationkey", $"n_name")
    val profitTerm =
      $"l_extendedprice".cast("decimal(18,2)") *
        (lit(1).cast("decimal(3,2)") - $"l_discount".cast("decimal(18,2)")) -
      $"p_retailprice".cast("decimal(18,2)") *
        $"l_quantity".cast("decimal(18,2)") * lit("0.06").cast("decimal(3,2)")
    l.join(broadcast(p), $"l_partkey" === $"p_partkey")
      .join(o, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(s), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name".as("nation"), year($"o_orderdate").as("o_year"))
      .agg(sum(profitTerm).cast("string").as("profit"))
      .orderBy($"nation", desc("o_year"))
  }

  val q09Oracle: String =
    """SELECT n_name AS nation, EXTRACT(year FROM o_orderdate)::INT AS o_year,
      sum(l_extendedprice::DECIMAL(18,2) * (1 - l_discount::DECIMAL(18,2))
        - p_retailprice::DECIMAL(18,2) * l_quantity::DECIMAL(18,2)
          * 0.06::DECIMAL(3,2))::VARCHAR AS profit
      FROM lineitem
      JOIN orders ON o_orderkey = l_orderkey
      JOIN part ON p_partkey = l_partkey AND p_name LIKE '%bolt%'
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      GROUP BY 1, 2
      ORDER BY nation, o_year DESC"""

  // ---------- q21 shape: sole failing supplier (EXISTS + NOT EXISTS) ----
  /** TPC-H Q21's join topology on the available columns: suppliers (from a
    * nation subset) who returned items on COMPLETED multi-supplier orders
    * where no OTHER supplier on the order also returned — the hardest
    * decorrelation shape in the suite, a multi-way EXISTS + NOT EXISTS
    * against the SAME fact table. Spelled directly as one left-semi and
    * one left-anti self-join (no correlated subquery survives to the
    * plan):
    *
    *   - all three lineitem legs join on `l_orderkey`, so the shuffles are
    *     CO-PARTITIONED — at 100 TB the fact is hashed on the one key
    *     three times and never re-keyed (the reference Q21 bottleneck);
    *   - the nation→supplier filter broadcasts and prunes l1 rows ~5×
    *     BEFORE the self-joins (dimension filter first, like q05);
    *   - `orders(status='F')` joins on the same l_orderkey key;
    *   - the final top-k is TakeOrderedAndProject over the per-supplier
    *     aggregate (supplier-cardinality), never a global sort of facts.
    *
    * The (numwait DESC, s_name) order is total (names unique), so the
    * LIMIT is deterministic.
    */
  def q21SoleFailingSupplier(spark: SparkSession, dir: String): DataFrame = {
    val nations = Seq("NATION_1", "NATION_7", "NATION_13", "NATION_19",
      "NATION_24")
    val li = Tables.lineitem(spark, dir)
    val l1 = li.filter($"l_returnflag" === "R")
      .select($"l_orderkey", $"l_suppkey")
    val l2 = li.select($"l_orderkey".as("l2_orderkey"),
      $"l_suppkey".as("l2_suppkey"))
    val l3 = li.filter($"l_returnflag" === "R")
      .select($"l_orderkey".as("l3_orderkey"), $"l_suppkey".as("l3_suppkey"))
    val o = Tables.orders(spark, dir)
      .filter($"o_orderstatus" === "F").select($"o_orderkey")
    val sn = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
        .filter($"n_name".isin(nations: _*))),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"s_name")
    l1.join(broadcast(sn), $"l_suppkey" === $"s_suppkey")
      .join(o, $"l_orderkey" === $"o_orderkey")
      .join(l2, $"l_orderkey" === $"l2_orderkey" &&
        $"l_suppkey" =!= $"l2_suppkey", "left_semi")
      .join(l3, $"l_orderkey" === $"l3_orderkey" &&
        $"l_suppkey" =!= $"l3_suppkey", "left_anti")
      .groupBy($"s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(desc("numwait"), $"s_name")
      .limit(10)
  }

  val q21Oracle: String =
    """SELECT s_name, count(*) AS numwait
      FROM lineitem l1
      JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
      JOIN supplier ON s_suppkey = l1.l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
        AND n_name IN ('NATION_1','NATION_7','NATION_13','NATION_19','NATION_24')
      WHERE l1.l_returnflag = 'R'
        AND EXISTS (SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_returnflag = 'R')
      GROUP BY s_name
      ORDER BY numwait DESC, s_name
      LIMIT 10"""

  // ---------- q08 shape: national market share ----------
  /** TPC-H Q8 reshaped: NATION_2's share of supplier revenue into ASIA
    * customers, per order year. Both the share's numerator and
    * denominator are exact DECIMAL sums carried through the aggregate
    * (numerator = CASE-gated partial sum riding the same pass as the
    * denominator — one aggregation, no second join); the final share is
    * ONE double division of two engine-identical decimals, which IEEE
    * rounds identically on both sides — so round(·,6) is deterministic
    * with no summation-order audit needed. Dimension sides all broadcast;
    * the fact shuffles once on the year.
    */
  def q08MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val s = Tables.supplier(spark, dir)
    val nC = Tables.nation(spark, dir)
      .select($"n_nationkey".as("cn_key"), $"n_regionkey".as("cn_region"))
    val nS = Tables.nation(spark, dir)
      .select($"n_nationkey".as("sn_key"), $"n_name".as("sn_name"))
    val r = Tables.region(spark, dir).filter($"r_name" === "ASIA")
    val vol = $"l_extendedprice".cast("decimal(18,2)") *
      (lit(1).cast("decimal(3,2)") - $"l_discount".cast("decimal(18,2)"))
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .join(broadcast(nC), $"c_nationkey" === $"cn_key")
      .join(broadcast(r), $"cn_region" === $"r_regionkey")
      .join(s, $"l_suppkey" === $"s_suppkey")
      .join(broadcast(nS), $"s_nationkey" === $"sn_key")
      .groupBy(year($"o_orderdate").as("o_year"))
      .agg(
        sum(when($"sn_name" === "NATION_2", vol)
          .otherwise(lit(0).cast("decimal(18,2)"))).as("nation_vol"),
        sum(vol).as("total_vol"))
      .select($"o_year",
        round($"nation_vol".cast("double") / $"total_vol".cast("double"), 6)
          .as("mkt_share"),
        $"nation_vol".cast("string").as("nation_vol"),
        $"total_vol".cast("string").as("total_vol"))
      .orderBy($"o_year")
  }

  val q08Oracle: String =
    """SELECT year(o_orderdate)::INT AS o_year,
      round((sum(CASE WHEN n2.n_name = 'NATION_2'
            THEN l_extendedprice::DECIMAL(18,2)
              * (1 - l_discount::DECIMAL(18,2))
            ELSE 0::DECIMAL(18,2) END))::DOUBLE
        / (sum(l_extendedprice::DECIMAL(18,2)
            * (1 - l_discount::DECIMAL(18,2))))::DOUBLE, 6) AS mkt_share,
      sum(CASE WHEN n2.n_name = 'NATION_2'
          THEN l_extendedprice::DECIMAL(18,2) * (1 - l_discount::DECIMAL(18,2))
          ELSE 0::DECIMAL(18,2) END)::VARCHAR AS nation_vol,
      sum(l_extendedprice::DECIMAL(18,2)
          * (1 - l_discount::DECIMAL(18,2)))::VARCHAR AS total_vol
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      GROUP BY o_year ORDER BY o_year"""

  // ---------- q22 shape: dormant positive-balance customers ----------
  /** TPC-H Q22 reshaped (no phone column): positive-balance customers with
    * no order in the final data year, grouped by nation. The NOT EXISTS is
    * a left-anti join against the date-filtered orders (the filter reaches
    * the orders scan before the join), and the per-nation balance total is
    * decimal-exact so no rounded-sum boundary exists.
    */
  def q22DormantCustomers(spark: SparkSession, dir: String): DataFrame = {
    val recent = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("2001-01-01").cast("timestamp"))
      .select($"o_custkey")
    Tables.customer(spark, dir)
      .filter($"c_acctbal" > 0)
      .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_nationkey")
      .agg(count(lit(1)).as("n_cust"),
        sum($"c_acctbal".cast("decimal(18,2)")).cast("string").as("total_bal"))
      .orderBy($"c_nationkey")
  }

  val q22Oracle: String =
    """SELECT c_nationkey, count(*) AS n_cust,
      sum(c_acctbal::DECIMAL(18,2))::VARCHAR AS total_bal
      FROM customer c
      WHERE c_acctbal > 0
        AND NOT EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderdate >= TIMESTAMP '2001-01-01')
      GROUP BY c_nationkey ORDER BY c_nationkey"""

  // ---------- bloom-reduced shuffle join (runtime-filter shape) ----------
  /** Bloom parameters for the join runtime filter: 2^20 bits = 128 KB of
    * broadcast for ~40× fewer bits set than slots even at sf1 build-side
    * cardinality, k = 5 probes. Hashing is `xxhash64` double hashing
    * (h1, then an odd-forced reseeded h2, Kirsch–Mitzenmacher slots) —
    * NOT the md5/`conv` chain the dedup-gate family uses: that chain
    * exists so a SQL oracle can reproduce the filter bit-for-bit, which
    * this query never needs (the bloom is semantically transparent — the
    * oracle is the plain join), and `conv` routes through BigInteger at
    * ~8 µs/row, which at fact-table row counts would cost more than the
    * shuffle it saves. xxhash64 is codegen'd and long-native; the filter
    * stays fully deterministic.
    */
  private val JoinBloomM = 1 << 20
  private val JoinBloomK = 5

  private def joinBloomPositions(item: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    // both hashes reduced into [0, m) BEFORE the affine combination so the
    // k-step arithmetic stays far from Long range (ANSI overflow-safe);
    // h2 forced odd → coprime with the power-of-two m, all slots reachable
    val h1 = pmod(xxhash64(item), lit(JoinBloomM.toLong))
    val h2 = pmod(xxhash64(item, lit(0x9e3779b9L)),
      lit(JoinBloomM.toLong / 2)) * 2 + 1
    transform(sequence(lit(0), lit(JoinBloomK - 1)),
      i => pmod(h1 + i * h2, lit(JoinBloomM.toLong)))
  }

  /** Fact-fact join behind a deterministic bloom RUNTIME FILTER: the
    * build side's join keys are OR-reduced into one m-bit bitmap in a
    * single distributed pass ([[graft.functions.BloomBitsAgg]] —
    * map-side partial bitmaps, the exchange carries O(tasks · m/8)
    * bytes regardless of input size), the 128 KB word array broadcasts,
    * and the probe runs SCAN-SIDE on the fact so non-matching rows die
    * before the join exchange. This is the reduction for the case
    * broadcast-join can't cover at 100 TB: a build side too big to ship
    * as ROWS whose bloom is still tiny. The real join still runs
    * (pinned shuffle-hash, not broadcast — that is the scenario being
    * modeled), so bloom false positives only waste shuffle bytes and
    * the result stays exact: the oracle is the plain SQL join with no
    * bloom anywhere.
    *
    * PlanAudit pins the contract: the bitmap probe (`forall` over bit
    * tests) sits BELOW the fact-side exchange, and the join is a
    * ShuffledHashJoin.
    */
  def qJoinBloom(spark: SparkSession, dir: String): DataFrame = {
    val urgent = Tables.orders(spark, dir)
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_orderkey", $"o_orderdate")
    val bitmap = urgent.agg(graft.functions.BloomBitsAgg
      .bloomBits(joinBloomPositions($"o_orderkey"), JoinBloomM)
      .as("bitmap"))
    // probe inlined as k scalar conjuncts (no per-row position array):
    // h1/h2 are computed once into columns, each slot is an affine form,
    // and the whole test stays in one codegen stage with short-circuit
    // evaluation on the first clear bit
    val slotTests = (0 until JoinBloomK).map { i =>
      expr(s"(bitmap[CAST(pmod(bh1 + $i * bh2, ${JoinBloomM}L) DIV 64 AS INT)]" +
        s" & shiftleft(1L, CAST(pmod(bh1 + $i * bh2, ${JoinBloomM}L) % 64 AS INT))) != 0")
    }.reduce(_ && _)
    val probed = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
      .crossJoin(broadcast(bitmap))
      .withColumn("bh1", pmod(xxhash64($"l_orderkey"), lit(JoinBloomM.toLong)))
      .withColumn("bh2", pmod(xxhash64($"l_orderkey", lit(0x9e3779b9L)),
        lit(JoinBloomM.toLong / 2)) * 2 + 1)
      .filter(slotTests)
      .drop("bh1", "bh2", "bitmap")
    // Revenue as an EXACT decimal sum, not round(sum(double), 2): the
    // sf0.01 group (1999, 5) sums to 7634437.805000002 — exactly on a
    // half-cent boundary, where double fold ORDER decides the rounded
    // cent and Spark vs DuckDB flip (r8's only red row). Price and
    // discount are 2-dp values stored as doubles; casting each operand
    // to DECIMAL recovers them exactly and makes the sum associative —
    // identical on both engines regardless of aggregation order. Same
    // treatment as q10 (SURVEY §12); emitted as string per the gate's
    // decimal convention.
    // hash table builds on the URGENT side (the hint goes there): even
    // after the bloom, matching lineitems are ~4x the urgent-order rows,
    // so building on the probe side would inflate build memory for nothing
    probed.join(urgent.hint("shuffle_hash"), $"l_orderkey" === $"o_orderkey")
      .groupBy(year($"o_orderdate").as("yr"), month($"o_orderdate").as("mo"))
      .agg(sum($"l_extendedprice".cast("decimal(18,2)") *
          (lit(1).cast("decimal(3,2)") - $"l_discount".cast("decimal(18,2)")))
          .cast("string").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"yr", $"mo")
  }

  val qJoinBloomOracle: String =
    """SELECT year(o_orderdate)::INT AS yr, month(o_orderdate)::INT AS mo,
      sum(l_extendedprice::DECIMAL(18,2)
        * (1 - l_discount::DECIMAL(18,2)))::VARCHAR AS revenue,
      count(*) AS n_items
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority = '1-URGENT'
      GROUP BY yr, mo ORDER BY yr, mo"""

  // ---------- incremental materialized-view maintenance ----------
  /** The refresh path of a 100 TB materialized view: history lives as
    * COMPACT partial-aggregate state — one row per (year, month,
    * priority) carrying only ALGEBRAIC measures (a count and an exact
    * DECIMAL sum) — and a refresh touches ONLY the delta rows
    * (`o_orderdate >= cutoff`, pushed into the scan) plus that state.
    * The merge is re-aggregation of the union: counts and decimal sums
    * are associative and exact, so merged state ≡ full recompute
    * bit-for-bit — which is exactly what the oracle checks by
    * recomputing the view from the whole base table. The query first
    * builds the state file (the "previous refresh" output, written
    * once), then returns the merge plan, which scans orders.parquet
    * exactly ONCE — the delta side, date filter pushed down; history
    * never touches the fact again (PlanAudit-pinned). DECIMAL, not
    * DOUBLE, is load-bearing: float partials would make the merged sum
    * order-dependent and the view would drift from the recompute.
    */
  /** Which sf dir the session's MV state was built from — the state file
    * is the "previous refresh" fixture; like the bucketed layout and the
    * CC label table, it is built once per (session, dir) so repeated
    * calls time the REFRESH (state read + delta scan + merge), which is
    * the operation this query exists to demonstrate.
    */
  def qMatviewMerge(spark: SparkSession, dir: String): DataFrame = {
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    // content-tagged: concurrent processes over different data never share
    // the matview state (SessionFixtures.contentTag)
    val state = s"$wh/graft_mv_orders_state_${SessionFixtures.contentTag(spark, dir)}"
    val cutoff = lit("2001-01-01").cast("timestamp")
    def partial(df: DataFrame): DataFrame =
      df.groupBy(year($"o_orderdate").as("yr"),
          month($"o_orderdate").as("mo"), $"o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          sum($"o_totalprice".cast("decimal(18,2)")).as("sum_total"))
    // _SUCCESS at the content-tagged path alone gates the rebuild (see
    // qPartitionedLayout): a valid state is reused, never overwritten
    // under a concurrent same-content reader
    if (!new java.io.File(state, "_SUCCESS").isFile) {
      partial(Tables.orders(spark, dir).filter($"o_orderdate" < cutoff))
        .write.mode("overwrite").parquet(state)
    }
    val delta = partial(
      Tables.orders(spark, dir).filter($"o_orderdate" >= cutoff))
    spark.read.parquet(state).unionByName(delta)
      .groupBy($"yr", $"mo", $"o_orderpriority")
      .agg(sum($"n_orders").as("n_orders"),
        sum($"sum_total").as("sum_total"))
      .select($"yr", $"mo", $"o_orderpriority", $"n_orders",
        $"sum_total".cast("string").as("sum_total"))
      .orderBy($"yr", $"mo", $"o_orderpriority")
  }

  val qMatviewMergeOracle: String =
    """SELECT year(o_orderdate)::INT AS yr, month(o_orderdate)::INT AS mo,
      o_orderpriority, count(*) AS n_orders,
      (sum(o_totalprice::DECIMAL(18,2)))::VARCHAR AS sum_total
      FROM orders
      GROUP BY yr, mo, o_orderpriority ORDER BY yr, mo, o_orderpriority"""

  // ---------- declarative constraint validation (DQ audit) ----------
  /** Referential-integrity + domain + nullability constraints validated
    * in one audit pass — the data-contract check that gates a pipeline
    * promotion (dbt tests / Deequ's verification suite, re-expressed as
    * plain combine-fed plans). Each FK check is a LEFT ANTI join counted
    * (null-keyed rows are orphans by definition here: an FK with a NULL
    * key cannot resolve, and anti-join semantics keep them — documented
    * because NOT-IN style SQL would silently drop them); domain and
    * nullability checks are scan-side predicates summed. Every check
    * emits `(check_name, n_violations, n_checked)` so a clean run still
    * proves it LOOKED (n_checked carries the evidence; a 0/0 row is a
    * broken audit, not a clean table).
    *
    * Scale shape: anti joins shuffle on their key like any join (orders
    * is NOT assumed broadcastable); predicate checks ride their scan and
    * aggregate partially map-side. The seven one-row aggregates union
    * into one result — dimension-bounded, no collect.
    */
  def qDqConstraints(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val p = Tables.part(spark, dir)
    val s = Tables.supplier(spark, dir)

    def fkCheck(name: String, fact: DataFrame, key: Column,
        dim: DataFrame, dimKey: Column): DataFrame = {
      val orphans = fact.select(key.as("k"))
        .join(dim.select(dimKey.as("k")), Seq("k"), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
      val checked = fact.agg(count(lit(1)).as("n_checked"))
      orphans.crossJoin(broadcast(checked))
        .select(lit(name).as("check_name"), $"n_violations", $"n_checked")
    }

    def predCheck(name: String, df: DataFrame, bad: Column): DataFrame =
      df.agg(
        sum(when(bad, 1L).otherwise(0L)).as("n_violations"),
        count(lit(1)).as("n_checked"))
        .select(lit(name).as("check_name"), $"n_violations", $"n_checked")

    fkCheck("fk_lineitem_orders", li, $"l_orderkey", o, $"o_orderkey")
      .unionByName(fkCheck("fk_orders_customer", o, $"o_custkey",
        c, $"c_custkey"))
      .unionByName(fkCheck("fk_lineitem_part", li, $"l_partkey",
        p, $"p_partkey"))
      .unionByName(fkCheck("fk_lineitem_supplier", li, $"l_suppkey",
        s, $"s_suppkey"))
      .unionByName(predCheck("dom_quantity_1_50", li,
        $"l_quantity" < 1 || $"l_quantity" > 50))
      .unionByName(predCheck("dom_discount_0_10", li,
        $"l_discount" < 0 || $"l_discount" > 0.10))
      .unionByName(predCheck("null_orderdate", o, $"o_orderdate".isNull))
      .orderBy($"check_name")
  }

  val qDqConstraintsOracle: String =
    """SELECT 'dom_discount_0_10' check_name,
        sum(CASE WHEN l_discount < 0 OR l_discount > 0.10
          THEN 1 ELSE 0 END)::BIGINT n_violations,
        count(*)::BIGINT n_checked FROM lineitem
      UNION ALL
      SELECT 'dom_quantity_1_50',
        sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
          THEN 1 ELSE 0 END)::BIGINT, count(*)::BIGINT FROM lineitem
      UNION ALL
      SELECT 'fk_lineitem_orders',
        (SELECT count(*) FROM lineitem WHERE l_orderkey NOT IN
          (SELECT o_orderkey FROM orders WHERE o_orderkey IS NOT NULL)
          OR l_orderkey IS NULL)::BIGINT,
        count(*)::BIGINT FROM lineitem
      UNION ALL
      SELECT 'fk_lineitem_part',
        (SELECT count(*) FROM lineitem WHERE l_partkey NOT IN
          (SELECT p_partkey FROM part WHERE p_partkey IS NOT NULL)
          OR l_partkey IS NULL)::BIGINT,
        count(*)::BIGINT FROM lineitem
      UNION ALL
      SELECT 'fk_lineitem_supplier',
        (SELECT count(*) FROM lineitem WHERE l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_suppkey IS NOT NULL)
          OR l_suppkey IS NULL)::BIGINT,
        count(*)::BIGINT FROM lineitem
      UNION ALL
      SELECT 'fk_orders_customer',
        (SELECT count(*) FROM orders WHERE o_custkey NOT IN
          (SELECT c_custkey FROM customer WHERE c_custkey IS NOT NULL)
          OR o_custkey IS NULL)::BIGINT,
        count(*)::BIGINT FROM orders
      UNION ALL
      SELECT 'null_orderdate',
        sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)::BIGINT,
        count(*)::BIGINT FROM orders
      ORDER BY check_name"""

  // ---------- k-anonymity audit (privacy risk before release) ----------
  /** k-anonymity screen over a quasi-identifier tuple — the privacy
    * audit run before releasing or sharing a derived dataset: customers
    * whose (nation, market segment, account-balance band) combination
    * is shared by fewer than k = 5 others are re-identifiable by
    * linkage. Output is the per-segment risk readout (equivalence-class
    * counts, risky classes, customers exposed, smallest class) — the
    * numbers a release review actually reads. Balance bands are integer
    * thousand-dollar FLOORS over cents — written as an explicit
    * `floor()` in BOTH engines because the obvious shortcuts disagree
    * on the negative balances TPC-H contains: DuckDB's `//` TRUNCATES
    * integers toward zero (−199999//100000 = −1, floor says −2) and
    * stays fractional on DECIMAL inputs (measured −2.5), while floor is
    * floor everywhere.
    *
    * Scale shape: one combine-fed groupBy over the quasi-identifier
    * domain (bounded: nations × segments × bands), then a groupBy over
    * segments — both dimension-scale. No windows, no collects.
    */
  def qPrivacyKanon(spark: SparkSession, dir: String): DataFrame = {
    val k = 5
    val qi = Tables.customer(spark, dir)
      .select($"c_mktsegment".as("seg"), $"c_nationkey".as("nat"),
        expr("CAST(floor(CAST(c_acctbal AS DECIMAL(18,2)) * 100 / 100000)" +
          " AS BIGINT)").as("band"))
    qi.groupBy($"seg", $"nat", $"band").agg(count(lit(1)).as("cls"))
      .groupBy($"seg")
      .agg(count(lit(1)).as("n_classes"),
        sum(when($"cls" < k, 1L).otherwise(0L)).as("risky_classes"),
        sum(when($"cls" < k, $"cls").otherwise(0L)).as("exposed_customers"),
        min($"cls").as("min_class"), max($"cls").as("max_class"))
      .orderBy($"seg")
  }

  val qPrivacyKanonOracle: String =
    """WITH qi AS (SELECT c_mktsegment seg, c_nationkey nat,
        floor((c_acctbal::DECIMAL(18,2) * 100) / 100000)::BIGINT band
      FROM customer),
      cls AS (SELECT seg, nat, band, count(*)::BIGINT cls FROM qi
        GROUP BY 1, 2, 3)
      SELECT seg, count(*)::BIGINT n_classes,
        sum(CASE WHEN cls < 5 THEN 1 ELSE 0 END)::BIGINT risky_classes,
        sum(CASE WHEN cls < 5 THEN cls ELSE 0 END)::BIGINT exposed_customers,
        min(cls)::BIGINT min_class, max(cls)::BIGINT max_class
      FROM cls GROUP BY seg ORDER BY seg"""

  // ---------- HLL sketch mergeability (per-partition union ≡ global) ----------
  /** The sketch-merge contract that makes distinct-counting feasible at
    * 100 TB: per-day (= per-partition) HLL sketches unioned into one
    * estimate, certified against both the single-pass global sketch and
    * the exact count. The Datasketches HLL register state is
    * order-insensitive (each register is a max over item hashes), but
    * the ESTIMATORS differ — a directly-built sketch answers with the
    * HIP estimator while a union must fall back to the composite
    * estimator — so the merged and global estimates are certified equal
    * within 2 % of the exact count rather than bit-equal, and both
    * within 5 % of exact (lgK = 12 ⇒ σ ≈ 0.8 %, so these bounds hold
    * with enormous margin; the self-certifying-boolean discipline of
    * `q_approx_distinct`). The oracle contributes the exact count and
    * `true` for both certificates.
    *
    * Scale shape: two combine-fed sketch aggregates over the fact (the
    * per-day one is exactly the daily-rollup + monthly-merge pattern),
    * one broadcast single-row join. No distinct-shuffle of raw ids
    * anywhere — that is the point.
    */
  def qSketchMerge(spark: SparkSession, dir: String): DataFrame = {
    val du = Tables.events(spark, dir)
      .select(to_date($"ts").as("dte"), $"user_id")
    val merged = du
      .groupBy($"dte").agg(hll_sketch_agg($"user_id").as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("est_merged"))
    du.agg(
        hll_sketch_estimate(hll_sketch_agg($"user_id")).as("est_global"),
        countDistinct($"user_id").as("exact_users"))
      .crossJoin(broadcast(merged))
      .select($"exact_users",
        (abs($"est_merged" - $"est_global") <=
          $"exact_users" * 2 / 100).as("merge_consistent"),
        (abs($"est_global" - $"exact_users") <=
          $"exact_users" * 5 / 100).as("within_bound"))
  }

  val qSketchMergeOracle: String =
    """SELECT count(DISTINCT user_id) AS exact_users,
      true AS merge_consistent, true AS within_bound FROM events"""

  // ---------- Count-Min join-size estimation ----------
  /** Join-cardinality estimation via Count-Min sketch inner product —
    * the optimizer-side sketch that answers "how big is events ⋈ orders
    * on the customer key?" WITHOUT running the join: each side collapses
    * to a d×w = 4×512 counter grid (h_r(k) = md5-derived bucket), the
    * per-row bucket-wise inner products upper-bound the true size
    * Σ_k c₁(k)·c₂(k), and the minimum over rows is the estimate. The CM
    * guarantee is one-sided — estimate ≥ exact ALWAYS (collisions only
    * add) and exceeds it by ≤ ‖c₁‖₁‖c₂‖₁/w in expectation per row — and
    * both sides of that sandwich are emitted as exact integers along
    * with the true size, so the readout IS the proof.
    *
    * Scale shape: this is the whole point — the exact answer needs a
    * key join of two count tables (a shuffle), while the sketch needs
    * ONE combine-fed aggregate per side into 2048 cells and a
    * cell-aligned broadcast join; at 100 TB the sketch path is the only
    * one an optimizer can afford at plan time. Products route through
    * DECIMAL(38,0); everything is integer end-to-end.
    */
  def qSketchJoinsize(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val w = 512L
    val left = Tables.events(spark, dir)
      .groupBy(col("user_id").as("k")).agg(count(lit(1)).as("c"))
    val right = Tables.orders(spark, dir)
      .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("c"))
    def cm(df: DataFrame, out: String): DataFrame =
      df.withColumn("r", explode(sequence(lit(0), lit(3))))
        .withColumn("b", pmod(conv(substring(md5(concat(col("r"),
          lit(":"), col("k"))), 1, 6), 16, 10).cast("long"), lit(w)))
        .groupBy(col("r"), col("b")).agg(sum(col("c")).as(out))
    val est = cm(left, "c1").join(cm(right, "c2"), Seq("r", "b"))
      .groupBy(col("r"))
      .agg(sum(col("c1").cast(dec) * col("c2").cast(dec)).as("ip"))
      .agg(min(col("ip")).as("est"))
    val exact = left.join(right, "k")
      .agg(sum(left("c").cast(dec) * right("c").cast(dec)).as("exact"))
    val tot = left.agg(sum(col("c")).as("n1"))
      .crossJoin(broadcast(right.agg(sum(col("c")).as("n2"))))
    tot.crossJoin(broadcast(exact)).crossJoin(broadcast(est))
      .select(col("n1"), col("n2"),
        col("exact").cast("long").as("exact_size"),
        col("est").cast("long").as("est_size"),
        (col("est") - col("exact")).cast("long").as("overcount"),
        (col("est") >= col("exact") &&
          (col("est") - col("exact")).cast("double") <=
            lit(4.0) * col("n1").cast("double") * col("n2").cast("double")
              / w).as("bound_ok"))
  }

  val qSketchJoinsizeOracle: String =
    """WITH l AS (SELECT user_id k, count(*)::BIGINT c FROM events
        GROUP BY 1),
      r AS (SELECT o_custkey k, count(*)::BIGINT c FROM orders GROUP BY 1),
      cml AS (SELECT rr r, ('0x' || substr(md5(rr::VARCHAR || ':' ||
            k::VARCHAR), 1, 6))::BIGINT % 512 b, sum(c)::BIGINT c1
        FROM l CROSS JOIN (SELECT unnest(range(0, 4)) rr) GROUP BY 1, 2),
      cmr AS (SELECT rr r, ('0x' || substr(md5(rr::VARCHAR || ':' ||
            k::VARCHAR), 1, 6))::BIGINT % 512 b, sum(c)::BIGINT c2
        FROM r CROSS JOIN (SELECT unnest(range(0, 4)) rr) GROUP BY 1, 2),
      ip AS (SELECT cml.r, sum(c1::HUGEINT * c2)::HUGEINT ip FROM cml
        JOIN cmr ON cml.r = cmr.r AND cml.b = cmr.b GROUP BY 1),
      est AS (SELECT min(ip) est FROM ip),
      ex AS (SELECT sum(l.c::HUGEINT * r.c)::HUGEINT exact FROM l
        JOIN r ON l.k = r.k),
      t AS (SELECT (SELECT sum(c) FROM l)::BIGINT n1,
        (SELECT sum(c) FROM r)::BIGINT n2)
      SELECT n1, n2, exact::BIGINT exact_size, est::BIGINT est_size,
        (est - exact)::BIGINT overcount,
        (est >= exact AND (est - exact)::DOUBLE <=
          4.0 * n1::DOUBLE * n2::DOUBLE / 512) AS bound_ok
      FROM t CROSS JOIN ex CROSS JOIN est"""

  // ---------- RFM segmentation (histogram-exact median cutoffs) ----------
  /** Recency/Frequency/Monetary customer segmentation — the classic
    * marketing-analytics cut, built the way exact data-dependent
    * cutoffs stay computable at corpus scale: a global `ntile(4)` needs
    * a single-partition window over every customer (a scale-killer),
    * so instead each metric is QUANTIZED to a bounded domain (recency
    * in days, frequency in orders, monetary in whole thousands of
    * dollars) and its exact lower median read off a VALUE HISTOGRAM —
    * one combine-fed `groupBy(metric, value)` whose cardinality is the
    * metric domain, not the customer count, then a running sum
    * partitioned BY METRIC (3 partitions of domain-bounded series).
    * The three cutoffs pivot to one broadcast row; segment labeling is
    * a pure map. Integer end-to-end (cents, days, counts) ⇒ hash-exact.
    *
    * The lower median is `min{v : 2·cum(v) ≥ N}` — stated once and
    * reimplemented verbatim in the oracle, so both engines share the
    * definition rather than trusting two `median()` builtins to agree
    * on interpolation.
    */
  def qRfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val anchor = o.agg(max(to_date($"o_orderdate")).as("anchor"))
    val cust = o.groupBy($"o_custkey")
      .agg(max(to_date($"o_orderdate")).as("last_order"),
        count(lit(1)).as("freq"),
        sum(($"o_totalprice".cast("decimal(18,2)") * 100).cast("long"))
          .as("cents"))
    val m = cust.crossJoin(broadcast(anchor))
      .select($"o_custkey",
        datediff($"anchor", $"last_order").cast("long").as("recency"),
        $"freq", expr("cents div 100000").as("mon_k"), $"cents")
    val stacked = m.select(explode(map(
      lit("recency"), $"recency",
      lit("freq"), $"freq",
      lit("mon_k"), $"mon_k")).as(Seq("metric", "v")))
    val hist = stacked.groupBy($"metric", $"v").agg(count(lit(1)).as("c"))
    val tot = hist.groupBy($"metric").agg(sum($"c").as("n"))
    val cut = hist
      .withColumn("cum", sum($"c").over(
        Window.partitionBy($"metric").orderBy($"v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(broadcast(tot), "metric")
      .filter($"cum" * 2 >= $"n")
      .groupBy($"metric").agg(min($"v").as("med"))
    val cuts = cut.groupBy()
      .pivot("metric", Seq("recency", "freq", "mon_k")).agg(first($"med"))
      .select($"recency".as("r_med"), $"freq".as("f_med"),
        $"mon_k".as("m_med"))
    m.crossJoin(broadcast(cuts))
      .withColumn("seg", concat(
        when($"recency" <= $"r_med", lit("R")).otherwise(lit("r")),
        when($"freq" > $"f_med", lit("F")).otherwise(lit("f")),
        when($"mon_k" > $"m_med", lit("M")).otherwise(lit("m"))))
      .groupBy($"seg")
      .agg(count(lit(1)).as("n_cust"), sum($"cents").as("total_cents"),
        sum($"freq").as("n_orders"))
      .orderBy($"seg")
  }

  val qRfmSegmentsOracle: String =
    """WITH anchor AS (SELECT max(o_orderdate::DATE) a FROM orders),
      cust AS (SELECT o_custkey, max(o_orderdate::DATE) last_order,
          count(*)::BIGINT freq,
          sum((o_totalprice::DECIMAL(18,2) * 100)::BIGINT)::BIGINT cents
        FROM orders GROUP BY 1),
      m AS (SELECT o_custkey,
          date_diff('day', last_order, a)::BIGINT recency,
          freq, cents // 100000 AS mon_k, cents FROM cust, anchor),
      stacked AS (
        SELECT 'recency' metric, recency v FROM m
        UNION ALL SELECT 'freq', freq FROM m
        UNION ALL SELECT 'mon_k', mon_k FROM m),
      hist AS (SELECT metric, v, count(*)::BIGINT c FROM stacked
        GROUP BY 1, 2),
      cum AS (SELECT metric, v,
          sum(c) OVER (PARTITION BY metric ORDER BY v) cum,
          sum(c) OVER (PARTITION BY metric) n FROM hist),
      cut AS (SELECT metric, min(v) med FROM cum WHERE cum * 2 >= n
        GROUP BY 1),
      cuts AS (SELECT
        max(CASE WHEN metric = 'recency' THEN med END) r_med,
        max(CASE WHEN metric = 'freq' THEN med END) f_med,
        max(CASE WHEN metric = 'mon_k' THEN med END) m_med FROM cut)
      SELECT (CASE WHEN recency <= r_med THEN 'R' ELSE 'r' END ||
              CASE WHEN freq > f_med THEN 'F' ELSE 'f' END ||
              CASE WHEN mon_k > m_med THEN 'M' ELSE 'm' END) AS seg,
        count(*)::BIGINT n_cust, sum(cents)::BIGINT total_cents,
        sum(freq)::BIGINT n_orders
      FROM m, cuts GROUP BY seg ORDER BY seg"""

  // ---------- rolling exact median over a bounded window frame ----------
  /** Rolling 7-day EXACT median of daily revenue per order priority —
    * the robust companion to a rolling mean (one outlier day skews a
    * mean for a week; the median shrugs). Exactness without doubles:
    * revenue is summed in integer cents per (priority, day) — ONE
    * combine-fed aggregate collapsing the fact to a calendar-bounded
    * series — and the median over each ≤7-row frame is read from the
    * sorted frame list as `L[(n+1) div 2] + L[(n+2) div 2]` (twice the
    * median; odd n doubles the middle, even n sums the two middles), so
    * the output `med2` is a BIGINT both engines agree on bit-for-bit —
    * no division, no `.5` rendering hazard.
    *
    * Scale shape: the window partitions by priority over the per-day
    * aggregate — its input is domain-bounded (#priorities × #days), the
    * frame is a constant 7 rows, and the corpus-scale fact never
    * reaches the window. The year filter is applied before aggregation
    * IDENTICALLY in both engines, so the frames align.
    */
  def qWindowMedian(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .filter(year($"o_orderdate") === 1995)
      .groupBy($"o_orderpriority".as("prio"),
        to_date($"o_orderdate").as("dte"))
      .agg(sum(($"o_totalprice".cast("decimal(18,2)") * 100).cast("long"))
        .as("cents"))
    val w = Window.partitionBy($"prio").orderBy($"dte").rowsBetween(-6, 0)
    daily
      .withColumn("ls", sort_array(collect_list($"cents").over(w)))
      .withColumn("n", size($"ls"))
      .withColumn("med2",
        element_at($"ls", expr("(n + 1) div 2").cast("int")) +
          element_at($"ls", expr("(n + 2) div 2").cast("int")))
      .select($"prio", $"dte".cast("string").as("dte"), $"cents", $"med2")
      .orderBy($"prio", $"dte")
  }

  val qWindowMedianOracle: String =
    """WITH daily AS (SELECT o_orderpriority prio, o_orderdate::DATE dte,
        sum((o_totalprice::DECIMAL(18,2) * 100)::BIGINT)::BIGINT cents
      FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 1, 2),
      r AS (SELECT prio, dte, cents,
        list_sort(list(cents) OVER (PARTITION BY prio ORDER BY dte
          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) ls FROM daily)
      SELECT prio, dte::VARCHAR dte, cents,
        (ls[(len(ls) + 1) // 2] + ls[(len(ls) + 2) // 2])::BIGINT AS med2
      FROM r ORDER BY prio, dte"""

  // ---------- spatial distance join (grid-blocked, provably complete) ----------
  /** All-pairs distance join on a 2-D integer grid — the spatial-blocking
    * pattern (geohash/S2-cell style) reduced to its provable core. Points
    * get deterministic integer coordinates derived from the key by two
    * Lehmer-style scrambles (pure 64-bit arithmetic both engines
    * reproduce bit-for-bit), and the radius-r self-join never goes
    * quadratic: each point buckets to a ⌈cell = r⌉ grid square, ONE side
    * expands to its 3×3 neighborhood, and the candidate join is an
    * EQUI-join on the cell key. Completeness is the floor-function
    * pigeonhole: |Δx| ≤ r = cell ⇒ the cell indices differ by at most 1
    * (⌊(a+r)/r⌋ = ⌊a/r⌋+1), so every true pair meets in exactly one of
    * the 9 probed cells — exactly once, so no distinct is needed. The
    * oracle is the NAIVE all-pairs join, making the hash match an
    * end-to-end completeness proof of the blocking (the PPJoin /
    * fuzzy-match discipline applied to geometry). Distances stay
    * squared integers (`dist2`), so the compare is exact.
    *
    * Scale shape: 9× fan-out on one side of a shuffle equi-join —
    * linear in the corpus, never quadratic; per-cell density bounds the
    * verify fan-in the way LSH band buckets do.
    */
  private[ops] def spatialPairs(pts: DataFrame, radius: Int): DataFrame = {
    val cells = pts.select($"id", $"x", $"y",
      expr(s"x div $radius").as("cx"), expr(s"y div $radius").as("cy"))
    val probe = cells.select($"id".as("a"), $"x".as("ax"), $"y".as("ay"),
      explode(expr("flatten(transform(sequence(-1, 1), dx -> " +
        "transform(sequence(-1, 1), dy -> " +
        "struct(cx + dx AS jx, cy + dy AS jy))))")).as("c"))
      .select($"a", $"ax", $"ay", $"c.jx", $"c.jy")
    probe
      .join(cells.select($"id".as("b"), $"x".as("bx"), $"y".as("by_"),
        $"cx", $"cy"),
        $"jx" === $"cx" && $"jy" === $"cy" && $"a" < $"b")
      .withColumn("dist2",
        ($"ax" - $"bx") * ($"ax" - $"bx") +
          ($"ay" - $"by_") * ($"ay" - $"by_"))
      .filter($"dist2" <= radius * radius)
  }

  def qSpatialJoin(spark: SparkSession, dir: String): DataFrame = {
    // quadratic (not affine) scramble: an affine map of the key makes
    // every pair's distance a function of Δkey alone — the measured
    // distance spectrum degenerated to two values. The k² term breaks
    // the translation symmetry; k is reduced mod a prime first so k²·7
    // stays far from the 64-bit edge at any conceivable key
    val pts = Tables.customer(spark, dir)
      .filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey".as("id"),
        expr("((c_custkey % 65521) * (c_custkey % 65521) * 3 + " +
          "(c_custkey % 65521) * 48271 + 11) % 1024").as("x"),
        expr("((c_custkey % 65521) * (c_custkey % 65521) * 7 + " +
          "(c_custkey % 65521) * 69621 + 5) % 1024").as("y"))
    spatialPairs(pts, 16)
      .groupBy(expr("dist2 div 64").as("qbin"))
      .agg(count(lit(1)).as("n_pairs"), min($"dist2").as("min_d2"),
        max($"dist2").as("max_d2"), sum($"dist2").as("sum_d2"))
      .orderBy($"qbin")
  }

  val qSpatialJoinOracle: String =
    """WITH pts AS (SELECT c_custkey id,
        ((c_custkey % 65521) * (c_custkey % 65521) * 3 +
          (c_custkey % 65521) * 48271 + 11) % 1024 x,
        ((c_custkey % 65521) * (c_custkey % 65521) * 7 +
          (c_custkey % 65521) * 69621 + 5) % 1024 y
      FROM customer WHERE c_mktsegment = 'BUILDING'),
      pairs AS (SELECT a.id a, b.id b,
          (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
        FROM pts a JOIN pts b ON a.id < b.id)
      SELECT dist2 // 64 AS qbin, count(*)::BIGINT n_pairs,
        min(dist2)::BIGINT min_d2, max(dist2)::BIGINT max_d2,
        sum(dist2)::BIGINT sum_d2
      FROM pairs WHERE dist2 <= 256 GROUP BY 1 ORDER BY 1"""

  // ---------- local differential privacy (k-ary randomized response) ----------
  /** LOCAL differential privacy (k-ary randomized response) — the
    * companion of [[qPrivacyDp]]'s central mechanism: each EVENT
    * reports its type through k-RR before any aggregation, so the
    * collector never sees a true row. ε = ln 3 is chosen to make the
    * whole mechanism EXACT RATIONALS: p = e^ε/(e^ε+k−1) = 3/7 with
    * k = 5, and the seeded per-event draw h = md5(event_id) mod 7·10⁵
    * lives on a domain DIVISIBLE by e^ε+k−1 = 7, so "report truth iff
    * h < 3·10⁵" hits 3/7 exactly and each of the k−1 decoy arms gets
    * exactly 10⁵ residues (a 10⁶ domain would make p = 0.428572 and
    * the arms non-uniform — a bias the unbiased estimator doesn't
    * correct). Derandomization IS the testability discipline, as in
    * q_privacy_dp; the unbiased estimator
    * n̂ = (o·(k−1+e^ε) − n)/(e^ε−1) = (7o − n)/2 emits as the exact
    * integer 2n̂ plus one rounded double. The oracle replays draw,
    * report, and debias bit-for-bit.
    *
    * Scale shape: one broadcast of the k-row alphabet, one scan-side
    * report pass, two combine-fed counts. The per-type relative error
    * lands near √n/n — visible in the emitted rel_err column.
    */
  def qPrivacyLdp(spark: SparkSession, dir: String): DataFrame = {
    val types = Tables.events(spark, dir)
      .select(col("event_type")).distinct()
      .withColumn("rt", row_number()
        .over(Window.orderBy(col("event_type"))) - 1)
      .stageCheckpoint() // the k-row type alphabet (k = 5)
    // e^ε = 3 ⇒ p_truth = 3/(3 + k − 1); a draw domain of
    // unit·(3 + k − 1) makes the truth arm and each decoy arm an exact
    // residue count — no 1e6-domain rounding bias
    val k = 5
    val unit = 100000L
    val dom = (3 + k - 1) * unit // 700000
    val reported = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"))
      .join(broadcast(types), "event_type")
      .withColumn("h", pmod(
        conv(substring(md5(col("event_id").cast("string")), 1, 6), 16, 10)
          .cast("long"), lit(dom)))
      // report truth iff h < 3·unit (p = 3/7 exactly); otherwise
      // r = h − 3·unit ∈ [0, (k−1)·unit) picks j = r DIV unit uniformly
      .withColumn("truth", col("h") < 3 * unit)
      .withColumn("j", expr(s"(h - ${3 * unit}) DIV $unit"))
      .withColumn("rr",
        when(col("truth"), col("rt"))
          .otherwise(when(col("j") < col("rt"), col("j"))
            .otherwise(col("j") + 1L)))
    val obs = reported.groupBy(col("rr"))
      .agg(count(lit(1)).as("o"))
      .join(broadcast(types.select(col("rt").as("rr"),
        col("event_type"))), "rr")
    val truth = Tables.events(spark, dir).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_true"))
      .stageCheckpoint() // k rows; also supplies the total below
    val n = truth.agg(sum(col("n_true")).as("n"))
    obs.join(truth, "event_type").crossJoin(broadcast(n))
      .select(col("event_type"), col("n_true"), col("o").as("n_observed"),
        (lit(7L) * col("o") - col("n")).as("est2"),
        round((lit(7L) * col("o") - col("n")).cast("double") / 2.0, 6)
          .as("est6"),
        round(abs((lit(7L) * col("o") - col("n")).cast("double") / 2.0 -
          col("n_true").cast("double")) /
          col("n_true").cast("double"), 6).as("rel_err6"))
      .orderBy(col("event_type"))
  }

  val qPrivacyLdpOracle: String =
    """WITH types AS (SELECT event_type,
        row_number() OVER (ORDER BY event_type) - 1 AS rt
      FROM (SELECT DISTINCT event_type FROM events)),
      rep AS (SELECT e.event_id, t.rt,
          ('0x' || substr(md5(e.event_id::VARCHAR), 1, 6))::BIGINT
            % 700000 AS h
        FROM events e JOIN types t USING (event_type)),
      rr AS (SELECT CASE WHEN h < 300000 THEN rt
          ELSE CASE WHEN (h - 300000) // 100000 < rt
            THEN (h - 300000) // 100000
            ELSE (h - 300000) // 100000 + 1 END END AS r
        FROM rep),
      obs AS (SELECT t.event_type, count(*)::BIGINT o
        FROM rr JOIN types t ON t.rt = rr.r GROUP BY 1),
      tr AS (SELECT event_type, count(*)::BIGINT n_true FROM events
        GROUP BY 1),
      nn AS (SELECT count(*)::BIGINT n FROM events)
      SELECT obs.event_type, tr.n_true, obs.o AS n_observed,
        7 * obs.o - nn.n AS est2,
        round((7 * obs.o - nn.n)::DOUBLE / 2.0, 6) AS est6,
        round(abs((7 * obs.o - nn.n)::DOUBLE / 2.0 - tr.n_true::DOUBLE)
          / tr.n_true::DOUBLE, 6) AS rel_err6
      FROM obs JOIN tr USING (event_type) CROSS JOIN nn
      ORDER BY obs.event_type"""

  // ---------- differentially-private count/sum release ----------
  /** Differentially-private release of the per-segment customer counts
    * and (clipped) balance sums — the privacy-budgeted aggregate a data
    * platform publishes when the raw counts themselves are sensitive.
    * Standard Laplace mechanism, ε = 0.5 per statistic (sequential
    * composition ⇒ ε_total = 1.0 for the pair): count sensitivity 1,
    * sum sensitivity = the CLIP WIDTH — balances are clamped to
    * [−1000, 10000] dollars (1,100,000 cents) before summing, the
    * clipping step that BOUNDS a sum release's sensitivity (here the
    * natural data range already sits inside the clamp, so clipping is
    * numerically a no-op while still establishing the bound).
    *
    * Noise is the inverse-CDF Laplace draw from a DETERMINISTIC uniform
    * seeded per (segment, statistic) by md5 — u = (h + 0.5)/10⁶ with
    * h = md5 % 10⁶, so u is never exactly ½ and 1 − 2|u − ½| ≥ 10⁻⁶ keeps
    * the log finite — which the oracle replays exactly (a production
    * system would draw from a secure RNG; the derandomization is what
    * makes the release hash-checkable, the same plant discipline as
    * q_text_pii). Dollar sums go through DECIMAL(18,2)·100 integer cents
    * (exact, associative); the ONLY doubles are the final noise adds,
    * rounded to 1e-6.
    *
    * Scale shape: one combine-fed aggregate over the fact; the noise
    * arithmetic runs on the 5-row segment table. Nothing else.
    */
  def qPrivacyDp(spark: SparkSession, dir: String): DataFrame = {
    def lap(tag: String, scale: Double): Column = {
      val h = pmod(
        conv(substring(md5(concat($"seg", lit(":" + tag))), 1, 6), 16, 10)
          .cast("long"), lit(1000000L))
      val u = (h.cast("double") + lit(0.5)) / lit(1000000.0)
      val c = u - lit(0.5)
      -lit(scale) * signum(c) * log(lit(1.0) - lit(2.0) * abs(c))
    }
    Tables.customer(spark, dir)
      .select($"c_mktsegment".as("seg"),
        expr("CAST(least(greatest(CAST(c_acctbal AS DECIMAL(18,2)), " +
          "-1000.00), 10000.00) * 100 AS BIGINT)").as("cents"))
      .groupBy($"seg")
      .agg(count(lit(1)).as("n_true"), sum($"cents").as("clip_cents"))
      .select($"seg", $"n_true",
        round($"n_true".cast("double") + lap("n", 2.0), 6).as("noisy_n6"),
        $"clip_cents",
        round($"clip_cents".cast("double") + lap("sum", 2200000.0), 6)
          .as("noisy_cents6"),
        lit(1.0).as("eps_total"))
      .orderBy($"seg")
  }

  val qPrivacyDpOracle: String =
    """WITH agg AS (SELECT c_mktsegment seg, count(*)::BIGINT n_true,
        sum(CAST(least(greatest(c_acctbal::DECIMAL(18,2), -1000.00),
          10000.00) * 100 AS BIGINT))::BIGINT clip_cents
      FROM customer GROUP BY 1),
      noise AS (SELECT seg, n_true, clip_cents,
        (('0x' || substr(md5(seg || ':n'), 1, 6))::BIGINT % 1000000 + 0.5)
          / 1000000.0 AS un,
        (('0x' || substr(md5(seg || ':sum'), 1, 6))::BIGINT % 1000000 + 0.5)
          / 1000000.0 AS us
      FROM agg)
      SELECT seg, n_true,
        round(n_true + (-2.0 * sign(un - 0.5) *
          ln(1.0 - 2.0 * abs(un - 0.5))), 6) AS noisy_n6,
        clip_cents,
        round(clip_cents + (-2200000.0 * sign(us - 0.5) *
          ln(1.0 - 2.0 * abs(us - 0.5))), 6) AS noisy_cents6,
        1.0::DOUBLE AS eps_total
      FROM noise ORDER BY seg"""

  // ---------- GDPR right-to-be-forgotten purge audit ----------
  /** Right-to-be-forgotten propagation: given a forget-list of user ids
    * (deterministic ~5 % md5-parity sample of customers — the plant
    * discipline), run the purge as a LEFT ANTI join on every fact table
    * that references users and report, per table, total rows, rows
    * purged, rows kept, and the RESIDUAL count — forgotten ids still
    * present after the purge, recomputed from the purged output itself
    * (the audit is only evidence if it re-derives zero from the result,
    * not from the construction). This is the governance counterpart of
    * q_privacy_kanon/q_text_pii: deletion, not masking.
    *
    * Scale shape: the forget-list is broadcast (deletion requests are
    * bounded — thousands, not billions); each fact pays one scan with a
    * broadcast-hash anti probe plus one aggregate; no shuffle of fact
    * rows at all. At 100 TB this is exactly the shape of a compaction
    * pass with an anti-join predicate pushed into the rewrite.
    */
  def qGdprForget(spark: SparkSession, dir: String): DataFrame = {
    val forget = Tables.customer(spark, dir)
      .select($"c_custkey".as("fid"))
      .filter(pmod(conv(substring(md5($"fid".cast("string")), 1, 6), 16, 10)
        .cast("long"), lit(20L)) === 0L)
    def audit(df: DataFrame, key: Column, tbl: String): DataFrame = {
      val total = df.agg(count(lit(1)).as("n_rows"))
      val kept = df.join(broadcast(forget), key === $"fid", "left_anti")
      kept.join(broadcast(forget), key === $"fid", "left_outer")
        .agg(count(lit(1)).as("n_kept"),
          sum(when($"fid".isNotNull, 1L).otherwise(0L)).as("n_residual"))
        .crossJoin(broadcast(total))
        .select(lit(tbl).as("tbl"), $"n_rows",
          ($"n_rows" - $"n_kept").as("n_purged"), $"n_kept", $"n_residual")
    }
    audit(Tables.customer(spark, dir), $"c_custkey", "customer")
      .unionByName(audit(Tables.orders(spark, dir), $"o_custkey", "orders"))
      .unionByName(audit(Tables.events(spark, dir), $"user_id", "events"))
      .orderBy($"tbl")
  }

  val qGdprForgetOracle: String =
    """WITH forget AS (SELECT c_custkey fid FROM customer
        WHERE ('0x' || substr(md5(c_custkey::VARCHAR), 1, 6))::BIGINT
          % 20 = 0),
      ck AS (SELECT c.c_custkey, f.fid FROM customer c
        LEFT JOIN forget f ON c.c_custkey = f.fid),
      ok AS (SELECT o.o_custkey, f.fid FROM orders o
        LEFT JOIN forget f ON o.o_custkey = f.fid),
      ek AS (SELECT e.user_id, f.fid FROM events e
        LEFT JOIN forget f ON e.user_id = f.fid)
      SELECT 'customer' AS tbl, count(*)::BIGINT n_rows,
        sum(CASE WHEN fid IS NOT NULL THEN 1 ELSE 0 END)::BIGINT n_purged,
        sum(CASE WHEN fid IS NULL THEN 1 ELSE 0 END)::BIGINT n_kept,
        0::BIGINT AS n_residual FROM ck
      UNION ALL
      SELECT 'events', count(*)::BIGINT,
        sum(CASE WHEN fid IS NOT NULL THEN 1 ELSE 0 END)::BIGINT,
        sum(CASE WHEN fid IS NULL THEN 1 ELSE 0 END)::BIGINT,
        0::BIGINT FROM ek
      UNION ALL
      SELECT 'orders', count(*)::BIGINT,
        sum(CASE WHEN fid IS NOT NULL THEN 1 ELSE 0 END)::BIGINT,
        sum(CASE WHEN fid IS NULL THEN 1 ELSE 0 END)::BIGINT,
        0::BIGINT FROM ok
      ORDER BY tbl"""

  // ---------- entity resolution: fuzzy pairs → components → canon ----------
  /** Full entity resolution over the name dictionary: the
    * [[qFuzzyMatch]] edit-distance pair graph closed into CONNECTED
    * COMPONENTS, each component collapsed to a canonical entity (min
    * name) with its member count and total row coverage — the step that
    * turns pairwise fuzzy matches into an actual dedup table
    * (transitivity matters: "blue bolt" ~ "blue bolts" ~ "blue boltz"
    * must land in ONE entity even when the ends differ by more than τ).
    * Singleton names become their own entity, so the output is a total
    * mapping of the dictionary.
    *
    * Scale shape: pairs come from the provably-complete q-gram blocking
    * equi-join (never a cartesian — see [[fuzzyPairs]]); the min-label
    * propagation fixpoint runs on the DICTIONARY graph (distinct names —
    * vocabulary-scale, corpus-independent), with lineage truncated per
    * round and rounds bounded by component diameter (edit-chains are
    * short in practice; the loop asserts convergence). The corpus pays
    * only the initial name aggregate. The oracle's recursive
    * transitive closure over the naive pair join doubles as the
    * end-to-end completeness proof of blocking + fixpoint.
    */
  def qEntityResolve(spark: SparkSession, dir: String): DataFrame = {
    // dictionary and pair graph come from the shared session fixtures —
    // the per-invocation work is the fixpoint + rollup only
    val names = nameDict(spark, dir)
    val pairs = fuzzyNamePairs(spark, dir).select($"a", $"b")
    val edges = pairs.union(pairs.select($"b", $"a")).toDF("src", "dst")
      .stageCheckpoint()
    var labels = names.select($"p_name".as("node"), $"p_name".as("lab"))
      .stageCheckpoint()
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < 20) {
      val prop = edges.join(labels, $"dst" === $"node")
        .select($"src".as("node"), $"lab", lit(null).cast("string").as("old"))
      val next = labels.select($"node", $"lab", $"lab".as("old"))
        .union(prop)
        .groupBy($"node").agg(min($"lab").as("lab"), min($"old").as("old"))
        .stageCheckpoint()
      changed = next.filter($"lab" =!= $"old").count()
      labels = next.select($"node", $"lab")
      rounds += 1
    }
    require(changed == 0, s"entity fixpoint did not converge in $rounds rounds")
    labels.join(names, $"node" === $"p_name")
      .groupBy($"lab".as("canonical"))
      .agg(countDistinct($"node").as("n_names"), sum($"n").as("total_rows"))
      .orderBy($"canonical")
  }

  val qEntityResolveOracle: String =
    """WITH RECURSIVE names AS (SELECT p_name, count(*)::BIGINT n FROM part
        GROUP BY 1),
      pairs AS (SELECT a.p_name a, b.p_name b FROM names a JOIN names b
        ON a.p_name < b.p_name AND levenshtein(a.p_name, b.p_name) <= 3),
      edges AS (SELECT a src, b dst FROM pairs UNION SELECT b, a FROM pairs),
      reach(node, lab) AS (
        SELECT p_name, p_name FROM names
        UNION
        SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node),
      labels AS (SELECT node, min(lab) lab FROM reach GROUP BY node)
      SELECT l.lab AS canonical, count(*)::BIGINT n_names,
        sum(nm.n)::BIGINT total_rows
      FROM labels l JOIN names nm ON nm.p_name = l.node
      GROUP BY 1 ORDER BY canonical"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_entity_resolve" -> (qEntityResolve _),
    "q_sketch_joinsize" -> (qSketchJoinsize _),
    "q_privacy_dp" -> (qPrivacyDp _),
    "q_privacy_ldp" -> (qPrivacyLdp _),
    "q_gdpr_forget" -> (qGdprForget _),
    "q_dq_constraints" -> (qDqConstraints _),
    "q_privacy_kanon" -> (qPrivacyKanon _),
    "q_sketch_merge" -> (qSketchMerge _),
    "q_spatial_join" -> (qSpatialJoin _),
    "q_rfm_segments" -> (qRfmSegments _),
    "q_window_median" -> (qWindowMedian _),
    "q_join_bloom" -> (qJoinBloom _),
    "q_matview_merge" -> (qMatviewMerge _),
    "q01_pricing_summary" -> (q01PricingSummary _),
    "q02_topk_orders" -> (q02TopkOrders _),
    "q03_shipping_priority" -> (q03ShippingPriority _),
    "q04_order_priority" -> (q04OrderPriority _),
    "q05_local_supplier" -> (q05LocalSupplier _),
    "q06_forecast_revenue" -> (q06ForecastRevenue _),
    "q07_volume_shipping" -> (q07VolumeShipping _),
    "q10_returned_items" -> (q10ReturnedItems _),
    "q13_customer_distribution" -> (q13CustomerDistribution _),
    "q12_priority_class" -> (q12PriorityClass _),
    "q14_promo_revenue" -> (q14PromoRevenue _),
    "q08_market_share" -> (q08MarketShare _),
    "q15_top_supplier" -> (q15TopSupplier _),
    "q17_small_qty_revenue" -> (q17SmallQtyRevenue _),
    "q18_large_orders" -> (q18LargeOrders _),
    "q19_disjunctive_pred" -> (q19DisjunctivePredicates _),
    "q02_min_cost_supplier" -> (q02MinCostSupplier _),
    "q09_product_profit" -> (q09ProductProfit _),
    "q11_important_parts" -> (q11ImportantParts _),
    "q16_supplier_diversity" -> (q16SupplierDiversity _),
    "q20_excess_share_supplier" -> (q20ExcessShareSupplier _),
    "q21_sole_failing_supplier" -> (q21SoleFailingSupplier _),
    "q22_dormant_customers" -> (q22DormantCustomers _),
    "q_window_firstlast" -> (qWindowFirstLast _),
    "q_join_broadcast" -> (qJoinBroadcast _),
    "q_join_bucketed" -> (qJoinBucketed _),
    "q_semi_join" -> (qSemiJoin _),
    "q_anti_join" -> (qAntiJoin _),
    "q_outer_join_agg" -> (qOuterJoinAgg _),
    "q_window_rank" -> (qWindowRank _),
    "q_window_running" -> (qWindowRunning _),
    "q_window_lag" -> (qWindowLag _),
    "q_window_distinct" -> (qWindowDistinct _),
    "q_rollup" -> (qRollup _),
    "q_cube" -> (qCube _),
    "q_set_ops" -> (qSetOps _),
    "q_distinct_agg" -> (qDistinctAgg _),
    "q_stats_corr" -> (qStatsCorr _),
    "q_sql_pipe" -> (qSqlPipe _),
    "q_lateral_join" -> (qLateralJoin _),
    "q_unpivot" -> (qUnpivot _),
    "q_skyline" -> (qSkyline _),
    "q_fuzzy_match" -> (qFuzzyMatch _),
    "q_scalar_subquery" -> (qScalarSubquery _),
    "q_case_when" -> (qCaseWhen _),
    "q_string_funcs" -> (qStringFuncs _),
    "q_date_funcs" -> (qDateFuncs _),
    "q_having" -> (qHaving _),
    "q_pivot" -> (qPivot _),
    "q_stats" -> (qStats _),
    "q_geom_mean" -> (qGeomMean _),
    "q_range_join" -> (qRangeJoin _),
    "q_salted_join" -> (qSaltedJoin _),
    "q_topk_agg" -> (qTopkAgg _),
    "q_typed_dataset" -> (qTypedDataset _),
    "q_approx_distinct" -> (qApproxDistinct _),
    "q_sql_surface" -> (qSqlSurface _),
    "q_grouping_sets" -> (qGroupingSets _),
    "q_window_range" -> (qWindowRange _),
    "q_sql_kernels" -> (qSqlKernels _),
    "q_percentiles" -> (qPercentiles _),
    "q_quantile_sketch" -> (qQuantileSketch _),
    "q_window_dist" -> (qWindowDist _),
    "q_exists_subquery" -> (qExistsSubquery _),
  )

  val oracles: Map[String, String] = Map(
    "q_entity_resolve" -> qEntityResolveOracle,
    "q_sketch_joinsize" -> qSketchJoinsizeOracle,
    "q_privacy_dp" -> qPrivacyDpOracle,
    "q_privacy_ldp" -> qPrivacyLdpOracle,
    "q_gdpr_forget" -> qGdprForgetOracle,
    "q_dq_constraints" -> qDqConstraintsOracle,
    "q_privacy_kanon" -> qPrivacyKanonOracle,
    "q_sketch_merge" -> qSketchMergeOracle,
    "q_spatial_join" -> qSpatialJoinOracle,
    "q_rfm_segments" -> qRfmSegmentsOracle,
    "q_window_median" -> qWindowMedianOracle,
    "q_join_bloom" -> qJoinBloomOracle,
    "q_matview_merge" -> qMatviewMergeOracle,
    "q_approx_distinct" -> qApproxDistinctOracle,
    "q01_pricing_summary" -> q01Oracle,
    "q02_topk_orders" -> q02Oracle,
    "q03_shipping_priority" -> q03Oracle,
    "q04_order_priority" -> q04Oracle,
    "q05_local_supplier" -> q05Oracle,
    "q06_forecast_revenue" -> q06Oracle,
    "q07_volume_shipping" -> q07Oracle,
    "q10_returned_items" -> q10Oracle,
    "q13_customer_distribution" -> q13Oracle,
    "q12_priority_class" -> q12Oracle,
    "q14_promo_revenue" -> q14Oracle,
    "q08_market_share" -> q08Oracle,
    "q15_top_supplier" -> q15Oracle,
    "q17_small_qty_revenue" -> q17Oracle,
    "q18_large_orders" -> q18Oracle,
    "q19_disjunctive_pred" -> q19Oracle,
    "q02_min_cost_supplier" -> q02MinCostOracle,
    "q09_product_profit" -> q09Oracle,
    "q11_important_parts" -> q11Oracle,
    "q16_supplier_diversity" -> q16Oracle,
    "q20_excess_share_supplier" -> q20Oracle,
    "q21_sole_failing_supplier" -> q21Oracle,
    "q22_dormant_customers" -> q22Oracle,
    "q_window_firstlast" -> qWindowFirstLastOracle,
    "q_join_broadcast" -> qJoinBroadcastOracle,
    "q_join_bucketed" -> qJoinBucketedOracle,
    "q_semi_join" -> qSemiJoinOracle,
    "q_anti_join" -> qAntiJoinOracle,
    "q_outer_join_agg" -> qOuterJoinAggOracle,
    "q_window_rank" -> qWindowRankOracle,
    "q_window_running" -> qWindowRunningOracle,
    "q_window_lag" -> qWindowLagOracle,
    "q_window_distinct" -> qWindowDistinctOracle,
    "q_rollup" -> qRollupOracle,
    "q_cube" -> qCubeOracle,
    "q_set_ops" -> qSetOpsOracle,
    "q_distinct_agg" -> qDistinctAggOracle,
    "q_stats_corr" -> qStatsCorrOracle,
    "q_sql_pipe" -> qSqlPipeOracle,
    "q_lateral_join" -> qLateralJoinOracle,
    "q_unpivot" -> qUnpivotOracle,
    "q_skyline" -> qSkylineOracle,
    "q_fuzzy_match" -> qFuzzyMatchOracle,
    "q_scalar_subquery" -> qScalarSubqueryOracle,
    "q_case_when" -> qCaseWhenOracle,
    "q_string_funcs" -> qStringFuncsOracle,
    "q_date_funcs" -> qDateFuncsOracle,
    "q_having" -> qHavingOracle,
    "q_pivot" -> qPivotOracle,
    "q_stats" -> qStatsOracle,
    "q_geom_mean" -> qGeomMeanOracle,
    "q_range_join" -> qRangeJoinOracle,
    "q_salted_join" -> qSaltedJoinOracle,
    "q_topk_agg" -> qTopkAggOracle,
    "q_typed_dataset" -> qTypedDatasetOracle,
    "q_sql_surface" -> qSqlSurfaceOracle,
    "q_grouping_sets" -> qGroupingSetsOracle,
    "q_window_range" -> qWindowRangeOracle,
    "q_sql_kernels" -> qSqlKernelsOracle,
    "q_percentiles" -> qPercentilesOracle,
    "q_quantile_sketch" -> qQuantileSketchOracle,
    "q_window_dist" -> qWindowDistOracle,
    "q_exists_subquery" -> qExistsSubqueryOracle,
  )
}
