package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.util.Exact

/** Relational operator coverage (SURVEY §2.2-§2.6): scans, projections,
  * filters, multi-key equi-joins (J1/J2), semi/anti joins, hash
  * aggregation (A1-A5), tumbling time-window aggregation (W1-W3),
  * analytic window functions, sorts and top-k.
  *
  * Every query aliases its columns identically to its DuckDB oracle and
  * uses order-independent exact aggregation (see [[graft.util.Exact]]) so
  * results hash-match bit-for-bit.
  */
object RelationalQueries {

  type Q = (SparkSession, String) => DataFrame

  /** A1/W-free pricing summary — TPC-H Q1 shape (ref: the per-cell
    * mean-of-daily-stats aggregate, wrf_voronoi.py:156-173, re-expressed
    * relationally on the driver testdata). */
  val q1PricingSummary: Q = (spark, dir) => {
    val li = Tables(spark, dir, "lineitem")
    li.groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"),
        Exact.fixedSum(col("l_extendedprice"), 2).as("sum_base_price"),
        (Exact.int128Sum((round(col("l_extendedprice") * 100).cast("long")) *
          (lit(100) - round(col("l_discount") * 100).cast("long")))
          .cast("double") / lit(10000.0))
          .as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  sum(l_quantity) AS sum_qty,
      |  sum(cast(round(l_extendedprice*100) as bigint)) / 100.0 AS sum_base_price,
      |  sum(cast(round(l_extendedprice*100) as bigint) * (100 - cast(round(l_discount*100) as bigint))) / 10000.0 AS sum_disc_price,
      |  count(*) AS count_order
      |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** J1 three-table equi-join + agg + top-k — TPC-H Q3 shape (ref: the
    * chained index joins at wrf_voronoi.py:175-180). */
  val q3TopRevenue: Q = (spark, dir) => {
    val cust = Tables(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables(spark, dir, "orders")
    val li = Tables(spark, dir, "lineitem")
    cust.join(ord, col("c_custkey") === col("o_custkey"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey", "o_orderdate")
      .agg((Exact.int128Sum(round(col("l_extendedprice") * 100).cast("long") *
        (lit(100) - round(col("l_discount") * 100).cast("long")))
        .cast("double") / lit(10000.0))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  val q3Sql: String =
    """SELECT o_orderkey, o_orderdate,
      |  sum(cast(round(l_extendedprice*100) as bigint) * (100 - cast(round(l_discount*100) as bigint))) / 10000.0 AS revenue
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND o_orderkey = l_orderkey
      |GROUP BY 1, 2 ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin

  /** J1 six-table star join — TPC-H Q5 shape: revenue by nation where the
    * supplier and customer share a nation. The dimension chain
    * (region⋈nation⋈...) is broadcast by Catalyst/AQE. */
  val q5NationRevenue: Q = (spark, dir) => {
    val region = Tables(spark, dir, "region")
    val nation = Tables(spark, dir, "nation")
    val cust = Tables(spark, dir, "customer")
    val ord = Tables(spark, dir, "orders")
    val li = Tables(spark, dir, "lineitem")
    val supp = Tables(spark, dir, "supplier")
    region.join(nation, col("r_regionkey") === col("n_regionkey"))
      .join(cust, col("n_nationkey") === col("c_nationkey"))
      .join(ord, col("c_custkey") === col("o_custkey"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey") &&
        col("s_nationkey") === col("c_nationkey"))
      .groupBy("r_name", "n_name")
      .agg((Exact.int128Sum(round(col("l_extendedprice") * 100).cast("long") *
        (lit(100) - round(col("l_discount") * 100).cast("long")))
        .cast("double") / lit(10000.0))
        .as("revenue"))
      .orderBy("r_name", "n_name")
  }

  val q5Sql: String =
    """SELECT r_name, n_name,
      |  sum(cast(round(l_extendedprice*100) as bigint) * (100 - cast(round(l_discount*100) as bigint))) / 10000.0 AS revenue
      |FROM region, nation, customer, orders, lineitem, supplier
      |WHERE r_regionkey = n_regionkey AND n_nationkey = c_nationkey
      |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
      |  AND l_suppkey = s_suppkey AND s_nationkey = c_nationkey
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** J1 with a twice-joined dimension — TPC-H Q7 shape (volume shipping):
    * revenue between two nation pairs by ship year; the nation table
    * joins once through supplier and once through customer (disambiguated
    * aliases), both broadcast. */
  val q7VolumeShipping: Q = (spark, dir) => {
    val n1 = Tables(spark, dir, "nation")
      .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
    val n2 = Tables(spark, dir, "nation")
      .select(col("n_nationkey").as("c_nkey"), col("n_name").as("cust_nation"))
    val li = Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
    val supp = Tables(spark, dir, "supplier")
    val ord = Tables(spark, dir, "orders")
    val cust = Tables(spark, dir, "customer")
    li.join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(n1, col("s_nationkey") === col("s_nkey"))
      .join(n2, col("c_nationkey") === col("c_nkey"))
      .filter((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_7") ||
        (col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_3"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg((Exact.int128Sum(round(col("l_extendedprice") * 100).cast("long") *
        (lit(100) - round(col("l_discount") * 100).cast("long")))
        .cast("double") / lit(10000.0))
        .as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val q7Sql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  year(l_shipdate) AS l_year,
      |  sum(cast(round(l_extendedprice*100) as bigint) * (100 - cast(round(l_discount*100) as bigint))) / 10000.0 AS revenue
      |FROM lineitem, supplier, orders, customer, nation n1, nation n2
      |WHERE l_suppkey = s_suppkey AND l_orderkey = o_orderkey
      |  AND o_custkey = c_custkey AND s_nationkey = n1.n_nationkey
      |  AND c_nationkey = n2.n_nationkey
      |  AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      |    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** Conditional-aggregation ratio — TPC-H Q8 shape (market share): the
    * share of one supplier nation's revenue within a customer region,
    * per order year. Numerator and denominator are both exact integer
    * sums; the single final division is IEEE-identical on both
    * engines. */
  val q8MarketShare: Q = (spark, dir) => {
    val region = Tables(spark, dir, "region").filter(col("r_name") === "ASIA")
    val nationC = Tables(spark, dir, "nation")
      .select(col("n_nationkey").as("cn_key"), col("n_regionkey"))
    val nationS = Tables(spark, dir, "nation")
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val cust = Tables(spark, dir, "customer")
    val ord = Tables(spark, dir, "orders")
    val li = Tables(spark, dir, "lineitem")
    val supp = Tables(spark, dir, "supplier")
    val vol = round(col("l_extendedprice") * 100).cast("long") *
      (lit(100) - round(col("l_discount") * 100).cast("long"))
    region.join(nationC, col("r_regionkey") === col("n_regionkey"))
      .join(cust, col("cn_key") === col("c_nationkey"))
      .join(ord, col("c_custkey") === col("o_custkey"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(nationS, col("s_nationkey") === col("sn_key"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        (Exact.int128Sum(when(col("supp_nation") === "NATION_9", vol)
          .otherwise(lit(0L))).cast("double") /
          Exact.int128Sum(vol).cast("double")).as("mkt_share"),
        count(lit(1)).as("n_items"))
      .orderBy("o_year")
  }

  val q8Sql: String =
    """SELECT year(o_orderdate) AS o_year,
      |  sum(CASE WHEN n2.n_name = 'NATION_9'
      |        THEN cast(round(l_extendedprice*100) as bigint) * (100 - cast(round(l_discount*100) as bigint))
      |        ELSE 0 END)
      |    / cast(sum(cast(round(l_extendedprice*100) as bigint) * (100 - cast(round(l_discount*100) as bigint))) as double) AS mkt_share,
      |  count(*) AS n_items
      |FROM region, nation n1, customer, orders, lineitem, supplier, nation n2
      |WHERE r_name = 'ASIA' AND r_regionkey = n1.n_regionkey
      |  AND n1.n_nationkey = c_nationkey AND c_custkey = o_custkey
      |  AND o_orderkey = l_orderkey AND l_suppkey = s_suppkey
      |  AND s_nationkey = n2.n_nationkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Semi + anti joins: per-segment counts of customers with and without
    * orders (EXISTS / NOT EXISTS). */
  val qSemiAnti: Q = (spark, dir) => {
    val cust = Tables(spark, dir, "customer")
    val ord = Tables(spark, dir, "orders").select("o_custkey")
    val withO = cust.join(ord, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_with_orders"))
    val without = cust.join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_without_orders"))
    withO.join(without, Seq("c_mktsegment"), "full_outer")
      .na.fill(0, Seq("n_with_orders", "n_without_orders"))
      .orderBy("c_mktsegment")
  }

  val qSemiAntiSql: String =
    """WITH w AS (
      |  SELECT c_mktsegment, count(*) AS n_with_orders FROM customer
      |  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) GROUP BY 1),
      |wo AS (
      |  SELECT c_mktsegment, count(*) AS n_without_orders FROM customer
      |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) GROUP BY 1)
      |SELECT c_mktsegment, coalesce(n_with_orders, 0) AS n_with_orders,
      |       coalesce(n_without_orders, 0) AS n_without_orders
      |FROM w FULL OUTER JOIN wo USING (c_mktsegment) ORDER BY 1""".stripMargin

  /** Analytic window: top-3 orders per customer by totalprice
    * (row_number over partition — not in the reference, engine breadth). */
  val qWindowTopPerCustomer: Q = (spark, dir) => {
    val ord = Tables(spark, dir, "orders")
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    ord.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rn")
  }

  val qWindowTopPerCustomerSql: String =
    """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  /** Analytic window: lag — inter-shipment gap per supplier in seconds. */
  val qWindowLag: Q = (spark, dir) => {
    val li = Tables(spark, dir, "lineitem")
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    li.withColumn("prev_ship", lag(col("l_shipdate"), 1).over(w))
      .withColumn("gap_s",
        unix_timestamp(col("l_shipdate")) - unix_timestamp(col("prev_ship")))
      .groupBy("l_suppkey")
      .agg(count(col("gap_s")).as("n_gaps"), sum("gap_s").as("total_gap_s"))
      .orderBy("l_suppkey")
  }

  val qWindowLagSql: String =
    """SELECT l_suppkey, count(gap_s) AS n_gaps, cast(sum(gap_s) as bigint) AS total_gap_s FROM (
      |  SELECT l_suppkey,
      |    cast(epoch(l_shipdate) as bigint) - cast(epoch(lag(l_shipdate, 1) OVER (
      |      PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)) as bigint) AS gap_s
      |  FROM lineitem) GROUP BY 1 ORDER BY 1""".stripMargin

  /** W1-W3: tumbling 1-day window min/max/mean — the reference's
    * `resample(XTIME="1D")` (wrf_voronoi.py:156-173) on the events table,
    * keyed by event_type instead of grid cell. */
  val qEventsDaily: Q = (spark, dir) => {
    val ev = Tables(spark, dir, "events")
    ev.groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        min("value").as("min_value"),
        max("value").as("max_value"),
        Exact.fixedAvg(col("value"), 2).as("avg_value"))
      .select(col("w.start").cast("date").as("day"), col("event_type"),
        col("n"), col("min_value"), col("max_value"), col("avg_value"))
      .orderBy("day", "event_type")
  }

  val qEventsDailySql: String =
    """SELECT cast(date_trunc('day', ts) as date) AS day, event_type,
      |  count(*) AS n, min(value) AS min_value, max(value) AS max_value,
      |  sum(cast(round(value*100) as bigint)) / (count(*) * 100.0) AS avg_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** SESSIONIZATION via Spark's native `session_window`: per-user
    * sessions split at ≥ 6-hour gaps. The gap-merge runs inside the
    * session-window aggregate (one shuffle on user_id, map-side
    * partials), so no per-event window-function sort is needed — and
    * the identical plan replays as a stream (`stream_sessions`).
    * Session bounds are emitted as exact epoch-microsecond longs
    * (`unix_micros` == DuckDB `epoch_us`); the end bound is max(ts),
    * not window.end (which adds the gap by convention). */
  val qSessions: Q = (spark, dir) => {
    val ev = Tables(spark, dir, "events")
    ev.groupBy(col("user_id"), session_window(col("ts"), "6 hours").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        max("ts").as("max_ts"),
        Exact.fixedSum(col("value"), 2).as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("start_us"),
        unix_micros(col("max_ts")).as("end_us"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "start_us")
  }

  /** Gap-and-island reformulation of the same sessions — what an engine
    * without session windows runs. Spark merges an event into the open
    * session while ts < prev + gap, so a new session starts at >= gap. */
  val qSessionsSql: String =
    """WITH x AS (SELECT user_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w >= INTERVAL 6 HOUR THEN 1 ELSE 0 END AS brk
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts) AS sid FROM x)
      |SELECT user_id, epoch_us(min(ts)) AS start_us, epoch_us(max(ts)) AS end_us,
      |  count(*) AS n_events,
      |  sum(cast(round(value*100) as bigint)) / 100.0 AS sum_value
      |FROM s GROUP BY user_id, sid ORDER BY 1, 2""".stripMargin

  /** Z-ORDER clustering key: Morton interleave of (l_partkey,
    * l_suppkey) — the write-path layout value ([[Layout.zorderValue]],
    * a compiled expression) that makes one file layout serve range
    * predicates on EITHER key. The query emits the 100 smallest
    * z-values over the distinct key pairs; `ZOrderSpec` proves the
    * locality claim (a box predicate touches ~√N of the files under a
    * z-clustered layout vs all of them under insertion order). */
  val qLayoutZorder: Q = (spark, dir) => {
    val li = Tables(spark, dir, "lineitem")
      .select("l_partkey", "l_suppkey").distinct()
    li.withColumn("z",
        graft.operators.Layout.zorderValue(
          Seq(col("l_partkey"), col("l_suppkey")), bits = 16))
      .orderBy("z")
      .limit(100)
  }

  val qLayoutZorderSql: String =
    """SELECT l_partkey, l_suppkey,
      |  cast(list_sum(list_transform(range(16), b ->
      |    (((l_partkey >> b) & 1) << (b*2)) +
      |    (((l_suppkey >> b) & 1) << (b*2+1)))) as bigint) AS z
      |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
      |ORDER BY z LIMIT 100""".stripMargin

  /** Distinct aggregation: exact distinct users per event type. */
  val qEventsDistinct: Q = (spark, dir) => {
    val ev = Tables(spark, dir, "events")
    ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("n_users"), count(lit(1)).as("n_events"))
      .orderBy("event_type")
  }

  val qEventsDistinctSql: String =
    """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** Sort + limit top-k with deterministic tie-break. */
  val qTopParts: Q = (spark, dir) => {
    Tables(spark, dir, "part")
      .select("p_partkey", "p_name", "p_retailprice")
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
      .limit(10)
  }

  val qTopPartsSql: String =
    """SELECT p_partkey, p_name, p_retailprice FROM part
      |ORDER BY p_retailprice DESC, p_partkey LIMIT 10""".stripMargin

  /** Filter + projection pushdown (P1-P6 family): selective scan. */
  val qFilterScan: Q = (spark, dir) => {
    Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_quantity") < 25)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
      .orderBy("l_orderkey", "l_linenumber")
  }

  val qFilterScanSql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_discount >= 0.05 AND l_quantity < 25
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** A3/A4 global scalar aggregate + weighted mean (two-phase):
    * `sum(w*x)/sum(w)` — the reference's population-weighted temperature
    * (delphine/regrid.py:334), with quantity as weight, price as value. */
  val qWeightedMean: Q = (spark, dir) => {
    val li = Tables(spark, dir, "lineitem")
    li.agg(
      (Exact.int128Sum(round(col("l_extendedprice") * 100).cast("long") *
        col("l_quantity").cast("long")).cast("double") /
        (Exact.unitSum(col("l_quantity"), 1).cast("double") * lit(100.0)))
        .as("weighted_avg_price"),
      count(lit(1)).as("n"))
  }

  val qWeightedMeanSql: String =
    """SELECT sum(cast(round(l_extendedprice*100) as bigint) * cast(l_quantity as bigint))
      |  / (sum(cast(l_quantity as bigint)) * 100.0) AS weighted_avg_price,
      |  count(*) AS n FROM lineitem""".stripMargin

  /** The salted two-phase variant of Q1 — identical results (and the
    * identical oracle) through the skew-mitigation path: each group key
    * splits over 16 salt buckets before the final combine, so one hot
    * key cannot funnel into a single reduce task. */
  val q1Salted: Q = (spark, dir) => {
    val li = Tables(spark, dir, "lineitem")
    graft.operators.Skew.saltedAgg(li,
      Seq("l_returnflag", "l_linestatus"), 16)(
      ("sum_qty", sum("l_quantity"), (c: Column) => sum(c)),
      ("sbp_units",
        Exact.unitSum(col("l_extendedprice"), 100),
        (c: Column) => sum(c)),
      ("sdp_units",
        Exact.int128Sum(round(col("l_extendedprice") * 100).cast("long") *
          (lit(100) - round(col("l_discount") * 100).cast("long"))),
        (c: Column) => sum(c)),
      ("count_order", count(lit(1)), (c: Column) => sum(c)))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("sum_qty"),
        (col("sbp_units").cast("double") / 100.0).as("sum_base_price"),
        (col("sdp_units").cast("double") / 10000.0).as("sum_disc_price"),
        col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Approximate distinct (HLL) with an exactness-band invariant the
    * oracle can assert — approximate sketches differ across engines, so
    * the query emits the exact count plus a bounded-relative-error
    * check of the HLL estimate (Spark's default rsd 5%; band 15%). */
  val qEventsApproxDistinct: Q = (spark, dir) => {
    val ev = Tables(spark, dir, "events")
    ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("n_exact"),
        approx_count_distinct("user_id").as("n_approx"))
      .select(col("event_type"), col("n_exact"),
        (abs(col("n_approx") - col("n_exact")).cast("double") /
          col("n_exact") < 0.15).as("approx_ok"))
      .orderBy("event_type")
  }

  val qEventsApproxDistinctSql: String =
    """SELECT event_type, count(DISTINCT user_id) AS n_exact,
      |  true AS approx_ok
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** Hierarchical aggregation: ROLLUP over (returnflag, linestatus) —
    * subtotals + grand total in one pass (Expand + partial agg under
    * the hood; no reference equivalent, engine breadth). */
  val qRollupPricing: Q = (spark, dir) => {
    val li = Tables(spark, dir, "lineitem")
    li.rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val qRollupPricingSql: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n, sum(l_quantity) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY 1, 2""".stripMargin

  /** CUBE over (returnflag, linestatus) — every grouping-set subtotal
    * in ONE pass (Expand + map-side partial agg, the [[qRollupPricing]]
    * plan with the full power set). Quantities are integral doubles,
    * so sums are exact under any accumulation order. */
  val qCubePricing: Q = (spark, dir) => {
    val li = Tables(spark, dir, "lineitem")
    li.cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val qCubePricingSql: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |  sum(l_quantity) AS sum_qty
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY 1, 2""".stripMargin

  /** Forward-fill (gap repair): error events lose their reading; each
    * takes the user's most recent good value — `last(ignoreNulls)` over
    * a running row frame, the time-series imputation primitive. One
    * shuffle on user_id; values are COPIED, never recomputed, so the
    * fill is exact by construction. */
  val qWindowFfill: Q = (spark, dir) => {
    val ev = Tables(spark, dir, "events")
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapped = ev.withColumn("v",
      when(col("event_type") === "error", lit(null).cast("double"))
        .otherwise(col("value")))
    gapped.select(col("event_id"), col("user_id"),
      last(col("v"), ignoreNulls = true).over(w).as("v_filled"),
      col("v").isNull.as("was_gap"))
      .orderBy("event_id")
  }

  val qWindowFfillSql: String =
    """WITH g AS (SELECT event_id, user_id, ts,
      |    CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
      |  FROM events)
      |SELECT event_id, user_id,
      |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
      |    ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled,
      |  (v IS NULL) AS was_gap
      |FROM g ORDER BY event_id""".stripMargin

  /** Returned-item revenue per customer — TPC-H Q10 shape: fact-fact
    * join filtered on the return flag, dimension joins broadcast,
    * exact-integer revenue, top-20. */
  val q10Returns: Q = (spark, dir) => {
    val cust = Tables(spark, dir, "customer")
    val ord = Tables(spark, dir, "orders")
    val li = Tables(spark, dir, "lineitem").filter(col("l_returnflag") === "R")
    val nat = Tables(spark, dir, "nation")
    cust.join(ord, col("c_custkey") === col("o_custkey"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .join(nat, col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name")
      .agg((Exact.int128Sum(round(col("l_extendedprice") * 100).cast("long") *
        (lit(100) - round(col("l_discount") * 100).cast("long")))
        .cast("double") / lit(10000.0))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q10Sql: String =
    """SELECT c_custkey, c_name, n_name,
      |  sum(cast(round(l_extendedprice*100) as bigint) * (100 - cast(round(l_discount*100) as bigint))) / 10000.0 AS revenue
      |FROM customer, orders, lineitem, nation
      |WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
      |  AND c_nationkey = n_nationkey AND l_returnflag = 'R'
      |GROUP BY 1, 2, 3 ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** Distribution-rank analytics: quartile (`ntile`) and `percent_rank`
    * of each event within its type, ordered by exact cents with the
    * event id as a unique tie-break (rank functions over ties are
    * order-dependent; a total order makes them deterministic).
    * percent_rank = (rank−1)/(n−1) — one exact-operand division,
    * identical in both engines. */
  val qNtileRanks: Q = (spark, dir) => {
    val ev = Tables(spark, dir, "events")
      .withColumn("cents", round(col("value") * 100).cast("long"))
    val w = Window.partitionBy("event_type").orderBy("cents", "event_id")
    ev.select(col("event_id"), col("event_type"), col("cents"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"))
      .orderBy("event_id")
  }

  val qNtileRanksSql: String =
    """SELECT event_id, event_type,
      |  cast(round(value*100) as bigint) AS cents,
      |  ntile(4) OVER w AS quartile,
      |  percent_rank() OVER w AS pct_rank
      |FROM events
      |WINDOW w AS (PARTITION BY event_type
      |             ORDER BY cast(round(value*100) as bigint), event_id)
      |ORDER BY event_id""".stripMargin

  /** Semi-structured JSON column: per-type stats over a property
    * extracted from the events `props` JSON string (`get_json_object`
    * is codegen'd; the payload never shuffles — only the extracted
    * long rides the aggregation). */
  val qJsonProps: Q = (spark, dir) => {
    val ev = Tables(spark, dir, "events")
    ev.select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
        min("k").as("min_k"), max("k").as("max_k"))
      .orderBy("event_type")
  }

  val qJsonPropsSql: String =
    """SELECT event_type, count(*) AS n,
      |  cast(sum(json_extract(props, '$.k')::BIGINT) as bigint) AS sum_k,
      |  min(json_extract(props, '$.k')::BIGINT) AS min_k,
      |  max(json_extract(props, '$.k')::BIGINT) AS max_k
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** Wide-form PIVOT: daily value totals per event type as columns —
    * `groupBy().pivot(values)` compiles to one pass of conditional
    * aggregates (no extra shuffle vs the long form); the explicit value
    * list keeps the schema static, as a production pivot should. */
  val qPivotDaily: Q = (spark, dir) => {
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables(spark, dir, "events")
      .withColumn("day", col("ts").cast("date"))
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .groupBy("day").pivot("event_type", types)
      .agg(sum("cents"))
      .orderBy("day")
  }

  val qPivotDailySql: String =
    """SELECT cast(date_trunc('day', ts) as date) AS day,
      |  cast(sum(CASE WHEN event_type = 'click' THEN cast(round(value*100) as bigint) END) as bigint) AS click,
      |  cast(sum(CASE WHEN event_type = 'error' THEN cast(round(value*100) as bigint) END) as bigint) AS error,
      |  cast(sum(CASE WHEN event_type = 'purchase' THEN cast(round(value*100) as bigint) END) as bigint) AS purchase,
      |  cast(sum(CASE WHEN event_type = 'signup' THEN cast(round(value*100) as bigint) END) as bigint) AS signup,
      |  cast(sum(CASE WHEN event_type = 'view' THEN cast(round(value*100) as bigint) END) as bigint) AS view
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** Exact continuous quantiles (sort-based `percentile`): p25/median/
    * p75 of event values per type. Both engines interpolate at
    * p·(n−1); emitting 4·q25, 2·median, 4·q75 makes every output an
    * INTEGER (cent units; interpolation fractions are quarters), so
    * the hash compare is immune to formula-order ULP drift. */
  val qQuantiles: Q = (spark, dir) => {
    val ev = Tables(spark, dir, "events")
      .withColumn("cents", round(col("value") * 100).cast("long"))
    ev.groupBy("event_type")
      .agg(
        round(percentile(col("cents"), lit(0.25)) * 4).cast("long").as("q25x4"),
        round(percentile(col("cents"), lit(0.5)) * 2).cast("long").as("medx2"),
        round(percentile(col("cents"), lit(0.75)) * 4).cast("long").as("q75x4"),
        count(lit(1)).as("n"))
      .orderBy("event_type")
  }

  val qQuantilesSql: String =
    """SELECT event_type,
      |  cast(round(4*quantile_cont(cast(round(value*100) as bigint), 0.25)) as bigint) AS q25x4,
      |  cast(round(2*quantile_cont(cast(round(value*100) as bigint), 0.5)) as bigint) AS medx2,
      |  cast(round(4*quantile_cont(cast(round(value*100) as bigint), 0.75)) as bigint) AS q75x4,
      |  count(*) AS n
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** Histogram-sketch quantiles ([[graft.operators.Sketches]]): the
    * mergeable fixed-width-bin path that answers p25/p50/p75/p95/p99 of
    * lineitem prices from ≤ ~1k map-side counters instead of a global
    * value sort — THE quantile plan that survives 100 TB (the exact
    * [[qQuantiles]] stays as the small-data / high-precision mode).
    * Bin width 100 ⇒ answers are exact to ±100; the oracle replays
    * bin/cumulate/select integer-for-integer. */
  val qHistQuantiles: Q = (spark, dir) => {
    val li = Tables(spark, dir, "lineitem")
    graft.operators.Sketches.histogramQuantiles(li, "l_extendedprice",
      width = 100.0, qMicros = Seq(250000L, 500000L, 750000L, 950000L, 990000L))
  }

  val qHistQuantilesSql: String =
    """WITH bins AS (SELECT cast(floor(l_extendedprice/100.0) as bigint) AS bin,
      |                     count(*) AS cnt FROM lineitem GROUP BY 1),
      |c AS (SELECT bin, sum(cnt) OVER (ORDER BY bin) AS cum,
      |             sum(cnt) OVER () AS total FROM bins),
      |qs(q) AS (VALUES (250000),(500000),(750000),(950000),(990000))
      |SELECT q AS q_micros, cast(min(bin) as bigint) AS bin,
      |  cast(min(bin)*10000 as bigint) AS approx_cents
      |FROM c JOIN qs ON cum*1000000 >= q*total
      |GROUP BY q ORDER BY q""".stripMargin

  /** Winsorized robust aggregates ([[graft.operators.Stats.winsorized]]):
    * per-event-type value sums with the tails clamped to the exact
    * p05/p95 bounds — the outlier-bounded metric feeding quality
    * dashboards. Bounds in integer 20ths (percentile interpolation at
    * q=k/20 over integers is exact in 20ths), so clip counts and the
    * winsorized sum replay bit-for-bit in SQL. */
  val qWinsorize: Q = (spark, dir) => {
    val ev = Tables(spark, dir, "events")
      .withColumn("cents", round(col("value") * 100).cast("long"))
    graft.operators.Stats.winsorized(ev, Seq("event_type"), "cents")
      .orderBy("event_type")
  }

  val qWinsorizeSql: String =
    """WITH ev AS (SELECT event_type, CAST(round(value*100) AS BIGINT) AS cents
      |  FROM events),
      |b AS (SELECT event_type,
      |    CAST(round(20*quantile_cont(cents, 0.05)) AS BIGINT) AS lo20,
      |    CAST(round(20*quantile_cont(cents, 0.95)) AS BIGINT) AS hi20
      |  FROM ev GROUP BY 1)
      |SELECT ev.event_type, count(*) AS n,
      |  CAST(sum(CASE WHEN cents*20 < lo20 THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
      |  CAST(sum(CASE WHEN cents*20 > hi20 THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
      |  CAST(sum(least(greatest(cents*20, lo20), hi20)) AS BIGINT) AS wsum20
      |FROM ev JOIN b ON ev.event_type = b.event_type
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Grouped OLS trend ([[graft.operators.Stats.groupedOls]]): the
    * per-month price trend over orders — slope/intercept of cents
    * regressed on day-of-month, fitted from the five sufficient
    * statistics in ONE aggregate pass (five counters per group cross
    * the shuffle, never the rows). Fixed-point ppm outputs via
    * integral division; a zero-variance month yields NULL — both
    * engines agree on truncation toward zero and NULL-on-zero-divide. */
  val qOlsTrend: Q = (spark, dir) => {
    val pts = Tables(spark, dir, "orders").select(
      to_date(date_trunc("month", col("o_orderdate"))).as("mon"),
      dayofmonth(col("o_orderdate")).cast("long").as("x"),
      round(col("o_totalprice") * 100).cast("long").as("y"))
    graft.operators.Stats.groupedOls(pts, Seq("mon"), "x", "y")
      .orderBy("mon")
  }

  val qOlsTrendSql: String =
    """WITH pts AS (SELECT date_trunc('month', o_orderdate) AS mon,
      |    CAST(date_part('day', o_orderdate) AS BIGINT) AS x,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS y FROM orders),
      |s AS (SELECT mon, CAST(count(*) AS HUGEINT) n,
      |    CAST(sum(x) AS HUGEINT) sx, CAST(sum(y) AS HUGEINT) sy,
      |    CAST(sum(x*x) AS HUGEINT) sxx, CAST(sum(x*y) AS HUGEINT) sxy
      |  FROM pts GROUP BY 1),
      |r AS (SELECT mon, n, sx, sy,
      |    n*sxy - sx*sy AS num, n*sxx - sx*sx AS den FROM s)
      |SELECT mon, CAST(n AS BIGINT) AS n,
      |  CAST(num*1000000 // den AS BIGINT) AS slope_ppm,
      |  CAST((sy*den - num*sx)*1000000 // (n*den) AS BIGINT) AS icept_ppm
      |FROM r ORDER BY mon""".stripMargin

  /** SCD Type-2 dimension history ([[graft.operators.Merge.scd2FromLog]]):
    * the orders log collapsed into versioned (custkey, orderstatus)
    * ranges — consecutive same-status orders merge into one validity
    * interval, the latest version stays open. One key-partitioned
    * window chain, one shuffle. */
  val qScd2History: Q = (spark, dir) => {
    val ord = Tables(spark, dir, "orders")
      .select("o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey")
    graft.operators.Merge.scd2FromLog(ord, "o_custkey", "o_orderstatus",
        Seq("o_orderdate", "o_orderkey"))
      .select(col("o_custkey"), col("o_orderstatus"),
        col("valid_from"), col("valid_to"), col("version_nr").cast("long").as("version_nr"),
        col("is_current"))
      .orderBy("o_custkey", "version_nr")
  }

  val qScd2HistorySql: String =
    """WITH w AS (SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
      |  lag(o_orderstatus) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey) AS prev
      |  FROM orders),
      |s AS (SELECT * FROM w WHERE prev IS NULL OR prev <> o_orderstatus),
      |v AS (SELECT o_custkey, o_orderstatus, o_orderdate AS valid_from,
      |  lead(o_orderdate) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey) AS valid_to,
      |  row_number() OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey) AS version_nr
      |  FROM s)
      |SELECT o_custkey, o_orderstatus, valid_from, valid_to,
      |  cast(version_nr as bigint) AS version_nr,
      |  valid_to IS NULL AS is_current
      |FROM v ORDER BY o_custkey, version_nr""".stripMargin

  /** As-of join: each event enriched with the user's most recent order
    * at-or-before the event time (operators/AsOf — one key shuffle +
    * running window, no range self-join). Oracle: DuckDB's native
    * ASOF LEFT JOIN. */
  val qAsofLastOrder: Q = (spark, dir) => {
    val ev = Tables(spark, dir, "events")
      .select(col("event_id"), col("user_id").cast("long").as("user_id"), col("ts"))
    val ord = Tables(spark, dir, "orders")
      .groupBy(col("o_custkey").cast("long").as("k"), col("o_orderdate").as("t"))
      .agg(max(round(col("o_totalprice") * 100).cast("long")).as("best_cents"))
    graft.operators.AsOf.joinBackward(ev, ord, "user_id", "k", "ts", "t")
      .select(col("event_id"), col("user_id"),
        col("__match.t").as("last_order_ts"),
        col("__match.best_cents").as("best_cents"))
      .orderBy("event_id")
  }

  val qAsofLastOrderSql: String =
    """WITH r AS (
      |  SELECT o_custkey AS k, o_orderdate AS t,
      |    max(cast(round(o_totalprice*100) as bigint)) AS best_cents
      |  FROM orders GROUP BY 1, 2)
      |SELECT e.event_id, cast(e.user_id as bigint) AS user_id,
      |  r.t AS last_order_ts, r.best_cents
      |FROM events e ASOF LEFT JOIN r
      |  ON e.user_id = r.k AND e.ts >= r.t
      |ORDER BY e.event_id""".stripMargin

  /** Interval-containment join ([[graft.operators.IntervalJoin]]): per
    * event, how many of the user's high-value windows (2 h after any
    * value > 180 event) cover it. Bucketized equi-join on
    * (user, hour-bucket) + exact refine — per-task fan-in stays
    * bounded however hot a user key is, unlike the stock
    * hash-join-on-key + range-filter plan. The oracle compares in
    * exact epoch micros (events.ts is ns in parquet; both engines
    * truncate identically). */
  val qIntervalWindows: Q = (spark, dir) => {
    val ev = Tables(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val windows = ev.filter(col("value") > 180)
      .select(col("user_id"), col("ts").as("w_start"),
        (col("ts") + expr("INTERVAL 2 HOURS")).as("w_end"))
    graft.operators.IntervalJoin.pointsInIntervals(
        ev.select(col("event_id"), col("user_id"), col("ts")), "ts",
        windows, "w_start", "w_end", Seq("user_id"), bucketSeconds = 3600)
      .groupBy("event_id").agg(count(lit(1)).as("n_windows"))
      .orderBy("event_id")
  }

  val qIntervalWindowsSql: String =
    """WITH e AS (SELECT event_id, user_id, epoch_ns(ts)//1000 AS tus, value
      |           FROM events),
      |w AS (SELECT user_id, tus AS w_start, tus + 7200000000 AS w_end
      |      FROM e WHERE value > 180)
      |SELECT e.event_id, count(*) AS n_windows
      |FROM e JOIN w ON e.user_id = w.user_id
      |  AND w.w_start <= e.tus AND e.tus < w.w_end
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Range-frame analytic window: per event, count + exact sum of
    * same-type events in the trailing 3 days, tie-safe over exact
    * epoch-microsecond longs.
    *
    * NOT computed with `rangeBetween(-3d, 0)`: Spark's sliding window
    * frame rebuilds the aggregation buffer per row — O(rows × frame),
    * and a 3-day frame here spans ~10% of each partition (measured
    * ~6 s at sf0.1). The scale-safe reformulation: running cumulative
    * aggregates over an UNBOUNDED-preceding range frame (incremental,
    * O(rows), ties share one cum value) minus the cumulative value
    * just before the window start, found with the as-of join
    * ([[graft.operators.AsOf]]) at lookup time t − 3d − 1µs. Identical
    * output; O(rows log rows). */
  val qTrailing3d: Q = (spark, dir) => {
    val win = 259200000000L // 3 days in µs
    val ev = Tables(spark, dir, "events")
      .withColumn("ep_us", unix_micros(col("ts")))
      .withColumn("cents", round(col("value") * 100).cast("long"))
    val wCum = Window.partitionBy("event_type").orderBy("ep_us")
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = ev.select(col("event_id"), col("event_type"), col("ep_us"),
      count(lit(1)).over(wCum).as("cum_n"),
      sum("cents").over(wCum).as("cum_s"))
    val boundary = cum.groupBy(col("event_type").as("bk"), col("ep_us").as("bt"))
      .agg(max("cum_n").as("b_n"), max("cum_s").as("b_s"))
    val lookups = cum.withColumn("lk_t", col("ep_us") - win - 1L)
    graft.operators.AsOf.joinBackward(lookups, boundary,
      "event_type", "bk", "lk_t", "bt")
      .select(col("event_id"),
        (col("cum_n") - coalesce(col("__match.b_n"), lit(0L))).as("n_trail"),
        (col("cum_s") - coalesce(col("__match.b_s"), lit(0L))).as("sum_trail_cents"))
      .orderBy("event_id")
  }

  val qTrailing3dSql: String =
    """SELECT event_id,
      |  count(*) OVER w AS n_trail,
      |  cast(sum(cast(round(value*100) as bigint)) OVER w as bigint) AS sum_trail_cents
      |FROM events
      |WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts)
      |             RANGE BETWEEN 259200000000 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** TPC-H Q17 shape: revenue impact of small-quantity orders — join
    * against a per-group aggregate threshold (the decorrelated form of
    * the correlated avg subquery). */
  val q17SmallQuantity: Q = (spark, dir) => {
    val li = Tables(spark, dir, "lineitem")
    val p = Tables(spark, dir, "part").filter(col("p_size") === 1)
    val lim = li.groupBy(col("l_partkey").as("pk"))
      .agg((avg("l_quantity") * 0.2).as("lim"))
    p.join(li, col("p_partkey") === col("l_partkey"))
      .join(lim, col("pk") === col("l_partkey"))
      .filter(col("l_quantity") < col("lim"))
      .agg((sum(round(col("l_extendedprice") * 100).cast("long")).cast("double") /
        lit(700.0)).as("avg_yearly"))
  }

  val q17Sql: String =
    """SELECT cast(sum(cast(round(l_extendedprice*100) as bigint)) as double) / 700.0 AS avg_yearly
      |FROM lineitem, part,
      |  (SELECT l_partkey AS pk, avg(l_quantity) * 0.2 AS lim FROM lineitem GROUP BY 1) t
      |WHERE p_partkey = l_partkey AND pk = l_partkey AND l_quantity < lim
      |  AND p_size = 1""".stripMargin

  /** TPC-H Q6 shape: forecasting-revenue-change — the pure filter+agg
    * plan every warehouse benchmarks first. All three predicates reach
    * the parquet reader as pushed filters; one partial-aggregated scan,
    * no shuffle beyond the single-row final agg. */
  val q6ForecastRevenue: Q = (spark, dir) => {
    val li = Tables(spark, dir, "lineitem")
    li.filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg((Exact.int128Sum(round(col("l_extendedprice") * 100).cast("long") *
        round(col("l_discount") * 100).cast("long"))
        .cast("double") / lit(10000.0)).as("revenue"))
  }

  val q6Sql: String =
    """SELECT sum(cast(round(l_extendedprice*100) as bigint) *
      |           cast(round(l_discount*100) as bigint)) / 10000.0 AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  /** TPC-H Q13 shape: customer order-count distribution — the
    * left-outer join + double aggregation (per-customer count, then
    * histogram of counts). */
  val q13OrderCounts: Q = (spark, dir) => {
    val cust = Tables(spark, dir, "customer")
    val ord = Tables(spark, dir, "orders")
      .filter(col("o_orderpriority") =!= "1-URGENT")
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q13Sql: String =
    """SELECT c_count, count(*) AS custdist
      |FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY 1)
      |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** TPC-H Q14 shape: promotion revenue share — conditional aggregate
    * over a fact⋈dimension join; part broadcasts. The ratio is one
    * IEEE division of two exactly-accumulated integer-unit sums. */
  val q14PromoShare: Q = (spark, dir) => {
    val li = Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
    val p = Tables(spark, dir, "part")
    val discPrice = round(col("l_extendedprice") * 100).cast("long") *
      (lit(100) - round(col("l_discount") * 100).cast("long"))
    li.join(p, col("l_partkey") === col("p_partkey"))
      .agg(((Exact.int128Sum(when(col("p_type") === "PROMO", discPrice)
        .otherwise(lit(0L))) * 100).cast("double") /
        Exact.int128Sum(discPrice).cast("double")).as("promo_revenue_pct"))
  }

  val q14Sql: String =
    """SELECT (sum(CASE WHEN p_type = 'PROMO'
      |        THEN cast(round(l_extendedprice*100) as bigint) *
      |             (100 - cast(round(l_discount*100) as bigint))
      |        ELSE 0 END) * 100)::DOUBLE /
      |  sum(cast(round(l_extendedprice*100) as bigint) *
      |      (100 - cast(round(l_discount*100) as bigint)))::DOUBLE
      |  AS promo_revenue_pct
      |FROM lineitem, part
      |WHERE l_partkey = p_partkey
      |  AND l_shipdate >= TIMESTAMP '1996-03-01'
      |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin

  /** TPC-H Q18 shape: large-volume customers — a semi-join against a
    * HAVING aggregate (orders whose lineitems sum past a threshold),
    * then the customer/order detail, top-100. Quantities are
    * integer-valued, so the double sums are order-independent. */
  val q18LargeVolume: Q = (spark, dir) => {
    val li = Tables(spark, dir, "lineitem")
    val big = li.groupBy(col("l_orderkey").as("bok"))
      .agg(sum("l_quantity").as("total_qty"))
      .filter(col("total_qty") > 150)
    val ord = Tables(spark, dir, "orders")
    val cust = Tables(spark, dir, "customer")
    big.join(ord, col("bok") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  val q18Sql: String =
    """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
      |  total_qty
      |FROM (SELECT l_orderkey, sum(l_quantity) AS total_qty
      |      FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 150) b
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  /** TPC-H Q19 shape: discounted revenue under a DISJUNCTION of
    * brand/size/quantity windows — the classic test that a composite
    * OR predicate still runs as ONE broadcast hash join on the equi
    * part with the disjunction as a post-join filter (not a fallback
    * to a nested loop). */
  val q19Disjunctive: Q = (spark, dir) => {
    val li = Tables(spark, dir, "lineitem")
    val p = Tables(spark, dir, "part")
    li.join(p, col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#11" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#13" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30)))
      .agg((Exact.int128Sum(round(col("l_extendedprice") * 100).cast("long") *
        (lit(100) - round(col("l_discount") * 100).cast("long")))
        .cast("double") / lit(10000.0))
        .as("revenue"))
  }

  val q19Sql: String =
    """SELECT sum(cast(round(l_extendedprice*100) as bigint) *
      |  (100 - cast(round(l_discount*100) as bigint))) / 10000.0 AS revenue
      |FROM lineitem, part
      |WHERE l_partkey = p_partkey AND (
      |  (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 5
      |    AND l_quantity BETWEEN 1 AND 11) OR
      |  (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 10
      |    AND l_quantity BETWEEN 10 AND 20) OR
      |  (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15
      |    AND l_quantity BETWEEN 20 AND 30))""".stripMargin

  /** TPC-H Q22 shape: global-sales-opportunity — customers above the
    * positive-balance average with no orders at all: a single-row
    * broadcast threshold (the decorrelated scalar subquery) + an
    * anti join, grouped by a derived country code. */
  val q22GlobalSales: Q = (spark, dir) => {
    val cust = Tables(spark, dir, "customer")
    val ord = Tables(spark, dir, "orders")
    val avgBal = cust.filter(col("c_acctbal") > 0.0)
      .agg(Exact.fixedAvg(col("c_acctbal"), 2).as("abal"))
    cust.join(broadcast(avgBal))
      .filter(col("c_acctbal") > col("abal"))
      .join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy((col("c_nationkey") % 10).as("cntrycode"))
      .agg(count(lit(1)).as("numcust"),
        Exact.fixedSum(col("c_acctbal"), 2).as("totacctbal"))
      .orderBy("cntrycode")
  }

  val q22Sql: String =
    """WITH a AS (
      |  SELECT sum(cast(round(c_acctbal*100) as bigint)) / (count(*) * 100.0)
      |    AS abal
      |  FROM customer WHERE c_acctbal > 0.0)
      |SELECT c_nationkey % 10 AS cntrycode, count(*) AS numcust,
      |  sum(cast(round(c_acctbal*100) as bigint)) / 100.0 AS totacctbal
      |FROM customer, a
      |WHERE c_acctbal > abal
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** TPC-H Q4 shape: order-priority checking — a SEMI join from orders
    * to "any late lineitem" (ship date after order date stands in for
    * commit<receipt, absent in this schema), then a priority histogram.
    * The semi join keeps the probe side row-at-most-once with no
    * dedup pass, and the date window reaches the orders scan as a
    * pushed filter. */
  val q4PriorityCheck: Q = (spark, dir) => {
    val ord = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
    val li = Tables(spark, dir, "lineitem")
    ord.join(li, col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  val q4Sql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1996-04-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** TPC-H Q12 shape: shipping-mode priority split — fact⋈dimension
    * join with a DUAL conditional aggregate (urgent vs other order
    * priorities) per mode (`l_returnflag` stands in for the absent
    * `l_shipmode`). One shuffle: the join's; the two counts ride the
    * same map-side partial agg. */
  val q12ShipModes: Q = (spark, dir) => {
    val li = Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
    val ord = Tables(spark, dir, "orders")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag").as("shipmode"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
      .orderBy("shipmode")
  }

  val q12Sql: String =
    """SELECT l_returnflag AS shipmode,
      |  cast(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |      THEN 1 ELSE 0 END) as bigint) AS high_line_count,
      |  cast(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |      THEN 0 ELSE 1 END) as bigint) AS low_line_count
      |FROM lineitem, orders
      |WHERE l_orderkey = o_orderkey
      |  AND l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** TPC-H Q15 shape: top supplier — a per-supplier revenue view, the
    * decorrelated scalar MAX broadcast back, and the equality filter
    * that keeps every tied winner. Revenue accumulates in integer
    * units (decimal(38,0)) so the max-equality is exact on both
    * engines. */
  val q15TopSupplier: Q = (spark, dir) => {
    val li = Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
    val rev = li.groupBy(col("l_suppkey"))
      .agg(Exact.int128Sum(round(col("l_extendedprice") * 100).cast("long") *
        (lit(100) - round(col("l_discount") * 100).cast("long")))
        .as("rev_units"))
    val top = rev.agg(max("rev_units").as("max_units"))
    val sup = Tables(spark, dir, "supplier")
    rev.join(broadcast(top), col("rev_units") === col("max_units"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        (col("rev_units").cast("double") / lit(10000.0)).as("total_revenue"))
      .orderBy("s_suppkey")
  }

  val q15Sql: String =
    """WITH rev AS (
      |  SELECT l_suppkey, sum(cast(round(l_extendedprice*100) as bigint) *
      |    (100 - cast(round(l_discount*100) as bigint))) AS rev_units
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY 1)
      |SELECT s_suppkey, s_name, rev_units::DOUBLE / 10000.0 AS total_revenue
      |FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |WHERE rev_units = (SELECT max(rev_units) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q21 shape: suppliers who kept orders waiting — the
    * hardest TPC-H correlation (EXISTS another supplier in the order,
    * NOT EXISTS another LATE supplier), decorrelated into ONE
    * per-order aggregate: count distinct suppliers and distinct late
    * suppliers, keep multi-supplier orders whose only late supplier
    * is this one. The oracle states the same query with the classic
    * correlated EXISTS / NOT EXISTS pair, proving the decorrelation.
    * "Late" = shipped after the order date (commit/receipt dates are
    * absent in this schema).
    *
    * 100 TB shape: no correlated per-row subqueries — one join, one
    * grouped agg on the order key, one join-back; all three shuffles
    * share the order-key partitioning and AQE coalesces them. */
  val q21WaitingSupplier: Q = (spark, dir) => {
    val ord = Tables(spark, dir, "orders")
      .filter(col("o_orderstatus") === "F")
    val li = Tables(spark, dir, "lineitem")
    val j = li.join(ord, col("l_orderkey") === col("o_orderkey"))
    // ONE pass over the joined fact (r16 opt): the former shape ran the
    // lineitem⋈orders join TWICE (once under the per-order aggregate,
    // once under a late-pair distinct) and then joined the two back
    // together. With the qualifying predicate `nlate === 1`, the single
    // late supplier of a qualifying order is recoverable from the same
    // aggregate as max(late supplier) — so the second join subtree, its
    // distinct, and the re-join all drop out (guide §2.4): two scans of
    // each fact table become one, three shuffles become one plus an
    // order-count-sized aggregation.
    val perOrder = j.groupBy(col("l_orderkey").as("ok"))
      .agg(countDistinct(col("l_suppkey")).as("nsupp"),
        countDistinct(when(col("l_shipdate") > col("o_orderdate"),
          col("l_suppkey"))).as("nlate"),
        max(when(col("l_shipdate") > col("o_orderdate"),
          col("l_suppkey"))).as("late_supp"))
      .filter(col("nsupp") >= 2 && col("nlate") === 1)
    val sup = Tables(spark, dir, "supplier")
    perOrder
      .groupBy(col("late_supp").as("l_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  val q21Sql: String =
    """WITH late AS (
      |  SELECT DISTINCT l_orderkey, l_suppkey
      |  FROM lineitem, orders
      |  WHERE o_orderkey = l_orderkey AND o_orderstatus = 'F'
      |    AND l_shipdate > o_orderdate)
      |SELECT s_name, count(*) AS numwait
      |FROM late l1, supplier
      |WHERE s_suppkey = l1.l_suppkey
      |  AND EXISTS (SELECT 1 FROM lineitem l2, orders
      |    WHERE o_orderkey = l2.l_orderkey AND o_orderstatus = 'F'
      |      AND l2.l_orderkey = l1.l_orderkey
      |      AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM late l3
      |    WHERE l3.l_orderkey = l1.l_orderkey
      |      AND l3.l_suppkey <> l1.l_suppkey)
      |GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin

  /** TPC-H Q9 shape: product-type profit by nation and year — the
    * widest dimensional join in the suite (lineitem ⋈ part ⋈ supplier
    * ⋈ nation), every dimension broadcast so the fact table moves
    * exactly once (the final groupBy shuffle). This schema has no
    * partsupp, so supply cost is defined as 60% of `p_retailprice`;
    * profit accumulates in 10^-4-of-a-unit integer cells
    * (`decimal(38,0)`) so the per-(nation,year) sums are exact on both
    * engines, narrowed to money by ONE final division. */
  val q9ProfitByNation: Q = (spark, dir) => {
    val li = Tables(spark, dir, "lineitem")
    val part = Tables(spark, dir, "part")
      .filter(col("p_name").contains("widget"))
      .select(col("p_partkey"), col("p_retailprice"))
    val sup = Tables(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
    val nat = Tables(spark, dir, "nation")
      .select(col("n_nationkey"), col("n_name"))
    val revUnits = round(col("l_extendedprice") * 100).cast("long") *
      (lit(100) - round(col("l_discount") * 100).cast("long"))
    val costUnits = round(col("p_retailprice") * 100).cast("long") *
      lit(60L) * round(col("l_quantity")).cast("long")
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("l_shipdate")).as("o_year"))
      .agg(Exact.int128Sum(revUnits - costUnits)
        .cast("long").as("profit_units"))
      .select(col("nation"), col("o_year"),
        (col("profit_units").cast("double") / lit(10000.0)).as("profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  val q9Sql: String =
    """SELECT n_name AS nation, year(l_shipdate) AS o_year,
      |  cast(sum(cast(round(l_extendedprice*100) as bigint) *
      |        (100 - cast(round(l_discount*100) as bigint)) -
      |      cast(round(p_retailprice*100) as bigint) * 60 *
      |        cast(round(l_quantity) as bigint)) as bigint)::DOUBLE
      |    / 10000.0 AS profit
      |FROM lineitem, part, supplier, nation
      |WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
      |  AND s_nationkey = n_nationkey AND p_name LIKE '%widget%'
      |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin

  /** TPC-H Q11 shape: important stock — per-part inventory value for
    * one nation's suppliers, kept only where the part's value exceeds
    * 1/1000 of the nation's total (the classic decorrelated
    * HAVING-vs-global-scalar). No partsupp here, so value =
    * `l_quantity × p_retailprice` over shipped lines. The comparison
    * is cross-multiplied in integers (`1000·part > total`) — no
    * fraction ever computed, so the threshold is exact. The 1-row
    * total rides a broadcast nested-loop join, the same contract as
    * `q22_global_sales`. */
  val q11ImportantValue: Q = (spark, dir) => {
    val li = Tables(spark, dir, "lineitem")
    val part = Tables(spark, dir, "part")
      .select(col("p_partkey"), col("p_retailprice"))
    val sup = Tables(spark, dir, "supplier")
      .join(broadcast(Tables(spark, dir, "nation")
        .filter(col("n_name") === "NATION_7")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val valUnits = round(col("p_retailprice") * 100).cast("long") *
      round(col("l_quantity")).cast("long")
    val perPart = li
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey").as("partkey"))
      .agg(Exact.int128Sum(valUnits).cast("long").as("value_units"))
    val total = perPart.agg(Exact.int128Sum(col("value_units"))
      .cast("long").as("total_units"))
    perPart.crossJoin(broadcast(total))
      .filter(col("value_units") * 1000 > col("total_units"))
      .select(col("partkey"), col("value_units"))
      .orderBy(col("value_units").desc, col("partkey"))
  }

  val q11Sql: String =
    """WITH pp AS (
      |  SELECT l_partkey AS partkey,
      |    cast(sum(cast(round(p_retailprice*100) as bigint) *
      |      cast(round(l_quantity) as bigint)) as bigint) AS value_units
      |  FROM lineitem, part, supplier, nation
      |  WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
      |    AND s_nationkey = n_nationkey AND n_name = 'NATION_7'
      |  GROUP BY 1)
      |SELECT partkey, value_units FROM pp
      |WHERE value_units * 1000 > (SELECT cast(sum(value_units) as bigint)
      |  FROM pp)
      |ORDER BY value_units DESC, partkey""".stripMargin

  /** TPC-H Q16 shape: parts/supplier relationship — how many DISTINCT
    * suppliers ship each (brand, type, size) bucket, with an
    * anti-join exclusion list (low-balance suppliers stand in for the
    * complaints subquery; this schema has no partsupp, so the
    * relationship comes from shipped lineitems). The distinct
    * (part, supplier) pair set is reduced BEFORE the dimension join:
    * one pair-dedup shuffle, then broadcast part attributes, then the
    * count-distinct agg. */
  val q16PartSuppliers: Q = (spark, dir) => {
    val li = Tables(spark, dir, "lineitem")
    val excl = Tables(spark, dir, "supplier")
      .filter(col("s_acctbal") < 3000).select(col("s_suppkey"))
    val part = Tables(spark, dir, "part")
      .filter(col("p_brand") =!= "Brand#13" && col("p_size") <= 25)
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    val pairs = li.select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(broadcast(excl), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
    pairs.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  val q16Sql: String =
    """SELECT p_brand, p_type, p_size,
      |  count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) li, part
      |WHERE l_partkey = p_partkey
      |  AND p_brand <> 'Brand#13' AND p_size <= 25
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
      |    WHERE s_acctbal < 3000)
      |GROUP BY 1, 2, 3
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** TPC-H Q20 shape: potential part promotion — suppliers who moved
    * MORE THAN HALF of some small part's 1996 volume. The correlated
    * "my quantity > 0.5 × part total" is decorrelated into one
    * per-(supplier, part) agg, re-aggregated per part, joined back,
    * and cross-multiplied in integers (`2·mine > total`); the
    * surviving supplier set semi-joins to the supplier dimension.
    * Both aggs share the part-key shuffle; AQE reuses the exchange. */
  val q20PromoSuppliers: Q = (spark, dir) => {
    val li = Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
    val part = Tables(spark, dir, "part")
      .filter(col("p_name").startsWith("small"))
      .select(col("p_partkey"))
    val qtyInt = round(col("l_quantity")).cast("long")
    val perSupPart = li
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(qtyInt).as("sup_qty"))
    val perPart = perSupPart.groupBy(col("l_partkey").as("pk"))
      .agg(sum(col("sup_qty")).as("part_qty"))
    val winners = perSupPart
      .join(perPart, col("l_partkey") === col("pk"))
      .filter(col("sup_qty") * 2 > col("part_qty"))
      .select(col("l_suppkey")).distinct()
    Tables(spark, dir, "supplier")
      .join(winners, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy("s_suppkey")
  }

  val q20Sql: String =
    """WITH sp AS (
      |  SELECT l_suppkey, l_partkey,
      |    cast(sum(cast(round(l_quantity) as bigint)) as bigint) AS sup_qty
      |  FROM lineitem, part
      |  WHERE l_partkey = p_partkey AND p_name LIKE 'small%'
      |    AND l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1997-01-01'
      |  GROUP BY 1, 2)
      |SELECT s_suppkey, s_name FROM supplier
      |WHERE s_suppkey IN (SELECT l_suppkey FROM sp
      |  WHERE sup_qty * 2 > (SELECT cast(sum(sup_qty) as bigint) FROM sp s2
      |    WHERE s2.l_partkey = sp.l_partkey))
      |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q2 shape: minimum-cost supplier — per-part MIN with an
    * equality join-back that keeps every tied winner (the correlated
    * scalar subquery of Q2, decorrelated into one grouped agg; this
    * schema's cost proxy is the integer-unit sale price). Both aggs
    * share the part-key shuffle; dimensions broadcast. */
  val q2MinCost: Q = (spark, dir) => {
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"),
        round(col("l_extendedprice") * 100).cast("long").as("price_units"))
    val minP = li.groupBy(col("l_partkey").as("pk"))
      .agg(min("price_units").as("min_units"))
    val part = Tables(spark, dir, "part").filter(col("p_size") <= 10)
      .select(col("p_partkey"), col("p_brand"))
    val sup = Tables(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_name"))
    li.join(minP, col("l_partkey") === col("pk") &&
        col("price_units") === col("min_units"))
      .select("l_partkey", "l_suppkey", "min_units").distinct()
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .select(col("p_partkey"), col("p_brand"), col("s_name"),
        (col("min_units").cast("double") / 100.0).as("min_price"))
      .orderBy("p_partkey", "s_name")
  }

  val q2Sql: String =
    """WITH li AS (SELECT l_partkey, l_suppkey,
      |    cast(round(l_extendedprice*100) as bigint) AS pu FROM lineitem),
      |mn AS (SELECT l_partkey AS pk, min(pu) AS mu FROM li GROUP BY 1)
      |SELECT DISTINCT p_partkey, p_brand, s_name, mu::DOUBLE / 100.0
      |    AS min_price
      |FROM li JOIN mn ON l_partkey = pk AND pu = mu
      |JOIN part ON l_partkey = p_partkey AND p_size <= 10
      |JOIN supplier ON l_suppkey = s_suppkey
      |ORDER BY p_partkey, s_name""".stripMargin

  /** MERGE upsert ([[graft.operators.Merge.upsert]]): yesterday's
    * corpus + a batch of re-crawled (updated) and brand-new documents
    * folded in one full-outer key join; the oracle states the same
    * merge as FULL OUTER + row-wise winner. Text rides as md5 so the
    * whole merged corpus hashes. */
  val qMergeUpsert: Q = (spark, dir) => {
    val d = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    val updates = d.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id"), col("source"),
        concat(lit("updated: "), col("text")).as("text"))
    val inserts = d.filter(col("doc_id") % 11 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"),
        lit("ingest").as("source"), col("text"))
    graft.operators.Merge.upsert(d, updates.union(inserts), "doc_id")
      .select(col("doc_id"), col("source"), md5(col("text")).as("text_md5"))
      .orderBy("doc_id")
  }

  val qMergeUpsertSql: String =
    """WITH src AS (
      |  SELECT doc_id, source, 'updated: ' || text AS text
      |  FROM documents WHERE doc_id % 7 = 0
      |  UNION ALL
      |  SELECT doc_id + 1000000, 'ingest', text
      |  FROM documents WHERE doc_id % 11 = 0),
      |m AS (
      |  SELECT CASE WHEN s.doc_id IS NOT NULL THEN s.doc_id
      |      ELSE t.doc_id END AS doc_id,
      |    CASE WHEN s.doc_id IS NOT NULL THEN s.source
      |      ELSE t.source END AS source,
      |    CASE WHEN s.doc_id IS NOT NULL THEN s.text
      |      ELSE t.text END AS text
      |  FROM documents t FULL OUTER JOIN src s ON t.doc_id = s.doc_id)
      |SELECT doc_id, source, md5(text) AS text_md5 FROM m
      |ORDER BY doc_id""".stripMargin

  /** Snapshot DIFF — the audit companion to [[qMergeUpsert]]: classify
    * every doc across two corpus versions as added / removed / changed
    * / unchanged from ONE full-outer join of (id, content-digest)
    * frames. Only 16-byte digests shuffle; at 100 TB both snapshots
    * live bucketed by id and the diff is co-located. */
  val qCorpusDiff: Q = (spark, dir) => {
    val old = Tables(spark, dir, "documents").select("doc_id", "text")
    val neu = old.filter(col("doc_id") % 13 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0,
          concat(lit("updated: "), col("text"))).otherwise(col("text"))
          .as("text"))
      .union(old.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
    old.select(col("doc_id"), md5(col("text")).as("h_old"))
      .join(neu.select(col("doc_id"), md5(col("text")).as("h_new")),
        Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("h_old").isNull, "added")
          .when(col("h_new").isNull, "removed")
          .when(col("h_old") === col("h_new"), "unchanged")
          .otherwise("changed").as("status"))
      .orderBy("doc_id")
  }

  val qCorpusDiffSql: String =
    """WITH old AS (SELECT doc_id, md5(text) AS h FROM documents),
      |neu AS (
      |  SELECT doc_id, md5(CASE WHEN doc_id % 7 = 0
      |      THEN 'updated: ' || text ELSE text END) AS h
      |  FROM documents WHERE doc_id % 13 <> 0
      |  UNION ALL
      |  SELECT doc_id + 1000000, md5(text) FROM documents
      |  WHERE doc_id % 11 = 0)
      |SELECT coalesce(old.doc_id, neu.doc_id) AS doc_id,
      |  CASE WHEN old.h IS NULL THEN 'added'
      |    WHEN neu.h IS NULL THEN 'removed'
      |    WHEN old.h = neu.h THEN 'unchanged'
      |    ELSE 'changed' END AS status
      |FROM old FULL OUTER JOIN neu ON old.doc_id = neu.doc_id
      |ORDER BY doc_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "q2_min_cost" -> q2MinCost,
    "j_merge_upsert" -> qMergeUpsert,
    "j_corpus_diff" -> qCorpusDiff,
    "q9_profit_nation" -> q9ProfitByNation,
    "q11_important_value" -> q11ImportantValue,
    "q16_part_suppliers" -> q16PartSuppliers,
    "q20_promo_suppliers" -> q20PromoSuppliers,
    "q4_priority_check" -> q4PriorityCheck,
    "q12_ship_modes" -> q12ShipModes,
    "q15_top_supplier" -> q15TopSupplier,
    "q21_waiting_supplier" -> q21WaitingSupplier,
    "q6_forecast_revenue" -> q6ForecastRevenue,
    "q13_order_counts" -> q13OrderCounts,
    "q14_promo_share" -> q14PromoShare,
    "q18_large_volume" -> q18LargeVolume,
    "q19_disjunctive" -> q19Disjunctive,
    "q22_global_sales" -> q22GlobalSales,
    "w_trailing_3d" -> qTrailing3d,
    "q17_small_quantity" -> q17SmallQuantity,
    "j_asof_last_order" -> qAsofLastOrder,
    "j_interval_windows" -> qIntervalWindows,
    "a_quantiles" -> qQuantiles,
    "a_hist_quantiles" -> qHistQuantiles,
    "a_ols_trend" -> qOlsTrend,
    "a_winsorize" -> qWinsorize,
    "j_scd2_history" -> qScd2History,
    "a_rollup_pricing" -> qRollupPricing,
    "a_cube_pricing" -> qCubePricing,
    "w_ffill" -> qWindowFfill,
    "a_json_props" -> qJsonProps,
    "a_pivot_daily" -> qPivotDaily,
    "q10_returns" -> q10Returns,
    "w_ntile_ranks" -> qNtileRanks,
    "q1_pricing_salted" -> q1Salted,
    "a_events_approx_distinct" -> qEventsApproxDistinct,
    "q1_pricing_summary" -> q1PricingSummary,
    "q3_top_revenue" -> q3TopRevenue,
    "q5_nation_revenue" -> q5NationRevenue,
    "q7_volume_shipping" -> q7VolumeShipping,
    "q8_market_share" -> q8MarketShare,
    "j_semi_anti" -> qSemiAnti,
    "w_top_per_customer" -> qWindowTopPerCustomer,
    "w_lag_gaps" -> qWindowLag,
    "w1_events_daily" -> qEventsDaily,
    "w_sessions" -> qSessions,
    "layout_zorder" -> qLayoutZorder,
    "a_events_distinct" -> qEventsDistinct,
    "o_top_parts" -> qTopParts,
    "p_filter_scan" -> qFilterScan,
    "a4_weighted_mean" -> qWeightedMean)

  val oracles: Map[String, String] = Map(
    "q2_min_cost" -> q2Sql,
    "j_merge_upsert" -> qMergeUpsertSql,
    "j_corpus_diff" -> qCorpusDiffSql,
    "q9_profit_nation" -> q9Sql,
    "q11_important_value" -> q11Sql,
    "q16_part_suppliers" -> q16Sql,
    "q20_promo_suppliers" -> q20Sql,
    "q4_priority_check" -> q4Sql,
    "q12_ship_modes" -> q12Sql,
    "q15_top_supplier" -> q15Sql,
    "q21_waiting_supplier" -> q21Sql,
    "q6_forecast_revenue" -> q6Sql,
    "q13_order_counts" -> q13Sql,
    "q14_promo_share" -> q14Sql,
    "q18_large_volume" -> q18Sql,
    "q19_disjunctive" -> q19Sql,
    "q22_global_sales" -> q22Sql,
    "w_trailing_3d" -> qTrailing3dSql,
    "q17_small_quantity" -> q17Sql,
    "j_asof_last_order" -> qAsofLastOrderSql,
    "j_interval_windows" -> qIntervalWindowsSql,
    "a_quantiles" -> qQuantilesSql,
    "a_hist_quantiles" -> qHistQuantilesSql,
    "a_ols_trend" -> qOlsTrendSql,
    "a_winsorize" -> qWinsorizeSql,
    "j_scd2_history" -> qScd2HistorySql,
    "a_rollup_pricing" -> qRollupPricingSql,
    "a_cube_pricing" -> qCubePricingSql,
    "w_ffill" -> qWindowFfillSql,
    "a_json_props" -> qJsonPropsSql,
    "a_pivot_daily" -> qPivotDailySql,
    "q10_returns" -> q10Sql,
    "w_ntile_ranks" -> qNtileRanksSql,
    "q1_pricing_salted" -> q1Sql,
    "a_events_approx_distinct" -> qEventsApproxDistinctSql,
    "q1_pricing_summary" -> q1Sql,
    "q3_top_revenue" -> q3Sql,
    "q5_nation_revenue" -> q5Sql,
    "q7_volume_shipping" -> q7Sql,
    "q8_market_share" -> q8Sql,
    "j_semi_anti" -> qSemiAntiSql,
    "w_top_per_customer" -> qWindowTopPerCustomerSql,
    "w_lag_gaps" -> qWindowLagSql,
    "w1_events_daily" -> qEventsDailySql,
    "w_sessions" -> qSessionsSql,
    "layout_zorder" -> qLayoutZorderSql,
    "a_events_distinct" -> qEventsDistinctSql,
    "o_top_parts" -> qTopPartsSql,
    "p_filter_scan" -> qFilterScanSql,
    "a4_weighted_mean" -> qWeightedMeanSql)
}
