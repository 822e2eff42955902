package graft.analytics

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational analytics over the tape-archive test tables (SURVEY §2.2).
  *
  * Every query is declarative DataFrame code — Catalyst gets a full
  * logical plan (filter/projection pushdown to parquet, broadcast joins
  * for dims, partial aggregation, AQE) with no RDD/closure black boxes.
  *
  * Oracle-parity rules used throughout: double aggregates are round()ed
  * identically in both engines (summation order differs), dates and
  * truncated timestamps are emitted as strings (parquet ns vs µs), and
  * every result carries a deterministic ORDER BY on a unique key.
  */
object AnalyticsQueries {

  /** revenue term: extendedprice * (1 - discount) */
  private def disc: Column =
    col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  /** A2 / TPC-H Q1 style pricing summary: hash agg with map-side combine. */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(disc), 2).as("sum_disc_price"),
        round(sum(disc * (lit(1.0) + col("l_tax"))), 2)
          .as("sum_charge"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        round(avg(col("l_extendedprice")), 6).as("avg_price"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q1PricingSummarySql: String = """
    SELECT l_returnflag, l_linestatus,
      round(sum(l_quantity), 2) AS sum_qty,
      round(sum(l_extendedprice), 2) AS sum_base_price,
      round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
      round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS sum_charge,
      round(avg(l_quantity), 6) AS avg_qty,
      round(avg(l_extendedprice), 6) AS avg_price,
      round(avg(l_discount), 6) AS avg_disc,
      count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""

  /** A1: narrow projection + selective filter — both must reach the
    * parquet scan (PushedFilters / pruned ReadSchema).
    */
  def qScanPushdown(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("2000-01-01").cast("timestamp") &&
        col("l_quantity") > lit(45.0))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  val qScanPushdownSql: String = """
    SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2000-01-01' AND l_quantity > 45.0
    ORDER BY l_orderkey, l_linenumber"""

  /** A3 / TPC-H Q3 style: revenue of unshipped orders for one market
    * segment; customer is a broadcast dim, orders⋈lineitem shuffles on
    * the order key.
    */
  def q3Shipping(s: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1998-03-15").cast("timestamp")
    val c = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val o = Tables.orders(s, dir).filter(col("o_orderdate") < cutoff)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val l = Tables.lineitem(s, dir).filter(col("l_shipdate") > cutoff)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(disc), 2).as("revenue"))
      .select(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority"), col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3ShippingSql: String = """
    SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
           o_orderpriority,
           round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, l_orderkey LIMIT 10"""

  /** A4 / TPC-H Q5 style: 6-table join — region/nation/supplier/customer
    * broadcast, the lineitem⋈orders fact join shuffles once.
    */
  def q5LocalSupplier(s: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
    val n = Tables.nation(s, dir)
    val c = Tables.customer(s, dir)
    val su = Tables.supplier(s, dir)
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val l = Tables.lineitem(s, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(su), l("l_suppkey") === su("s_suppkey") &&
        c("c_nationkey") === su("s_nationkey"))
      .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(disc), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5LocalSupplierSql: String = """
    SELECT n_name,
           round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name ORDER BY revenue DESC, n_name"""

  /** A5: left-semi and left-anti joins as physical operators, reconciled
    * per market segment.
    */
  def qSemiAnti(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val bigOrders = Tables.orders(s, dir)
      .filter(col("o_totalprice") > lit(150000.0)).select("o_custkey")
    val withBig = c.join(bigOrders, c("c_custkey") === bigOrders("o_custkey"),
      "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("with_big_order"))
    val without = c.join(bigOrders, c("c_custkey") === bigOrders("o_custkey"),
      "left_anti")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("without_big_order"))
    withBig.join(without, Seq("c_mktsegment"), "full_outer")
      .select(col("c_mktsegment"),
        coalesce(col("with_big_order"), lit(0L)).as("with_big_order"),
        coalesce(col("without_big_order"), lit(0L)).as("without_big_order"))
      .orderBy(col("c_mktsegment"))
  }

  val qSemiAntiSql: String = """
    WITH w AS (
      SELECT c_mktsegment, count(*) AS with_big_order FROM customer
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                    AND o_totalprice > 150000.0)
      GROUP BY c_mktsegment),
    wo AS (
      SELECT c_mktsegment, count(*) AS without_big_order FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                        AND o_totalprice > 150000.0)
      GROUP BY c_mktsegment)
    SELECT coalesce(w.c_mktsegment, wo.c_mktsegment) AS c_mktsegment,
           coalesce(with_big_order, 0) AS with_big_order,
           coalesce(without_big_order, 0) AS without_big_order
    FROM w FULL OUTER JOIN wo ON w.c_mktsegment = wo.c_mktsegment
    ORDER BY c_mktsegment"""

  /** A6: window top-N — top-3 parts by revenue within each brand. */
  def qWindowTopn(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val p = Tables.part(s, dir)
    val perPart = l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .groupBy(col("p_brand"), col("p_partkey"))
      .agg(round(sum(disc), 2).as("revenue"))
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("revenue").desc, col("p_partkey"))
    perPart.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .orderBy(col("p_brand"), col("rank"))
  }

  val qWindowTopnSql: String = """
    WITH per_part AS (
      SELECT p_brand, p_partkey,
             round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand, p_partkey),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY p_brand
               ORDER BY revenue DESC, p_partkey) AS rank
      FROM per_part)
    SELECT p_brand, p_partkey, revenue, rank FROM ranked
    WHERE rank <= 3 ORDER BY p_brand, rank"""

  /** A7: exact distinct aggregation (two distinct counts in one agg →
    * expand + two-phase shuffle).
    */
  def qDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("parts"),
        countDistinct(col("l_suppkey")).as("suppliers"),
        count(lit(1)).as("lines"))
      .orderBy(col("l_returnflag"))

  val qDistinctSql: String = """
    SELECT l_returnflag, count(DISTINCT l_partkey) AS parts,
           count(DISTINCT l_suppkey) AS suppliers, count(*) AS lines
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** A8: global top-k by aggregate (TakeOrderedAndProject, no full sort). */
  def qTopkRevenue(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    o.groupBy(col("o_custkey"))
      .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
        count(lit(1)).as("orders"))
      .join(broadcast(c), col("o_custkey") === c("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("revenue"), col("orders"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(10)
  }

  val qTopkRevenueSql: String = """
    SELECT c_custkey, c_name, round(sum(o_totalprice), 2) AS revenue,
           count(*) AS orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name ORDER BY revenue DESC, c_custkey LIMIT 10"""

  /** A9: time-bucketed stream aggregation (the batch face of R2). */
  def qEventsMinutely(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(date_format(date_trunc("hour", col("ts")),
        "yyyy-MM-dd HH:mm:ss").as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("value_sum"))
      .orderBy(col("hour"), col("event_type"))

  val qEventsMinutelySql: String = """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
           event_type, count(*) AS n, round(sum(value), 2) AS value_sum
    FROM events GROUP BY 1, 2 ORDER BY hour, event_type"""

  /** A10: gap-based sessionization (30 min) with window functions — the
    * batch equivalent of the reference's replay stream cut into visits.
    */
  def qSessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gapUs = 30L * 60 * 1000000
    Tables.events(s, dir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("event_id")).as("first_event"),
        max(col("event_id")).as("last_event"),
        (max(unix_micros(col("ts"))) - min(unix_micros(col("ts"))))
          .as("duration_us"))
      .orderBy(col("user_id"), col("session_id"))
  }

  val qSessionizeSql: String = """
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                  OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sessioned AS (
      SELECT *, sum(new_session) OVER (PARTITION BY user_id
               ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id
      FROM flagged)
    SELECT user_id, session_id, count(*) AS n_events,
           min(event_id) AS first_event, max(event_id) AS last_event,
           max(epoch_us(ts)) - min(epoch_us(ts)) AS duration_us
    FROM sessioned GROUP BY user_id, session_id
    ORDER BY user_id, session_id"""

  /** A11: as-of join — each event matched to the latest order of the
    * same customer at or before the event time, executed by the native
    * single-pass AsOfJoinExec (graft.operators.AsOfJoinPlan): one
    * hash Exchange per side + (key, time) sort, no per-key history
    * explosion. The oracle states the same semantics as join+rank SQL;
    * AsOfJoinPlanSpec/AsOfJoinSpec prove the three forms agree.
    */
  def qAsofJoin(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(
      col("event_id"), col("user_id"), col("ts"))
    // The archive's orders end in 2001 while events live in 2024; shift
    // order dates into the event month so the as-of match is non-trivial.
    val o = Tables.orders(s, dir).select(
      col("o_orderkey"), col("o_custkey"),
      timestamp_micros(unix_micros(lit("2024-01-01 00:00:00").cast("timestamp"))
        + (col("o_orderkey") % 2592000) * 1000000).as("o_ts"))
    graft.operators.AsOfJoinPlan.backward(e, o,
      leftKey = "user_id", rightKey = "o_custkey",
      leftTime = "ts", rightTime = "o_ts")
      .select(col("event_id"), col("user_id"), col("o_orderkey"),
        date_format(col("o_ts"), "yyyy-MM-dd HH:mm:ss").as("o_ts"))
      .orderBy(col("event_id"))
  }

  val qAsofJoinSql: String = """
    WITH shifted AS (
      SELECT o_orderkey, o_custkey,
             TIMESTAMP '2024-01-01 00:00:00'
               + to_microseconds((o_orderkey % 2592000) * 1000000) AS o_ts
      FROM orders),
    joined AS (
      SELECT e.event_id, e.user_id, s.o_orderkey, s.o_ts,
             row_number() OVER (PARTITION BY e.event_id
               ORDER BY s.o_ts DESC NULLS LAST,
                        s.o_orderkey DESC NULLS LAST) AS rn
      FROM events e LEFT JOIN shifted s
        ON e.user_id = s.o_custkey AND s.o_ts <= e.ts)
    SELECT event_id, user_id, o_orderkey,
           strftime(o_ts, '%Y-%m-%d %H:%M:%S') AS o_ts
    FROM joined WHERE rn = 1 ORDER BY event_id"""

  /** A13: range join — events inside each (sampled) order's 3-day
    * window, via the bucketed point-in-interval operator
    * (graft.operators.RangeJoin): equi-join on (user, day-bucket) +
    * exact filter instead of the nested-loop a bare range predicate
    * would plan.
    */
  def qRangeJoin(s: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400000000L
    val e = Tables.events(s, dir).select(
      col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
    val o = Tables.orders(s, dir)
      .filter(col("o_orderkey") % 50 === 0)
      .select(col("o_orderkey"), col("o_custkey"),
        (unix_micros(lit("2024-01-01 00:00:00").cast("timestamp"))
          + (col("o_orderkey") % 2592000) * 1000000L).as("lo_us"))
      .withColumn("hi_us", col("lo_us") + lit(3 * dayUs))
    graft.operators.RangeJoin.pointInInterval(e, o,
      pt = col("ts_us"), lo = col("lo_us"), hi = col("hi_us"),
      width = dayUs,
      leftKeys = Seq(col("user_id")), rightKeys = Seq(col("o_custkey")))
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n_events"),
        min(col("event_id")).as("first_event"),
        max(col("event_id")).as("last_event"))
      .orderBy(col("o_orderkey"))
  }

  val qRangeJoinSql: String = """
    WITH e AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events),
    o AS (
      SELECT o_orderkey, o_custkey,
             epoch_us(TIMESTAMP '2024-01-01 00:00:00'
               + to_microseconds((o_orderkey % 2592000) * 1000000)) AS lo_us
      FROM orders WHERE o_orderkey % 50 = 0)
    SELECT o_orderkey, count(*) AS n_events,
           min(event_id) AS first_event, max(event_id) AS last_event
    FROM e JOIN o ON e.user_id = o.o_custkey
      AND e.ts_us >= o.lo_us AND e.ts_us <= o.lo_us + 259200000000
    GROUP BY o_orderkey ORDER BY o_orderkey"""

  /** A14 / TPC-H Q6: forecast revenue change — a pure scan-side query,
    * every predicate pushed to parquet, one scalar out.
    */
  def q6Forecast(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount") >= 0.03 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
        .as("revenue"), count(lit(1)).as("n"))

  val q6ForecastSql: String = """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount >= 0.03 AND l_discount <= 0.07 AND l_quantity < 24"""

  /** A15 / TPC-H Q14 style: promo revenue share — conditional
    * aggregation over a broadcast dim join.
    */
  def q14Promo(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
    val p = Tables.part(s, dir)
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .agg(
        round(sum(when(col("p_type").startsWith("PROMO"), disc)
          .otherwise(lit(0.0))), 2).as("promo_revenue"),
        round(sum(disc), 2).as("total_revenue"),
        count(lit(1)).as("n"))

  }

  val q14PromoSql: String = """
    SELECT round(sum(CASE WHEN p_type LIKE 'PROMO%'
                     THEN l_extendedprice * (1.0 - l_discount)
                     ELSE 0.0 END), 2) AS promo_revenue,
           round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS total_revenue,
           count(*) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate < TIMESTAMP '1997-10-01'"""

  /** A16 / TPC-H Q18 style: large-volume customers — an aggregated
    * semi-join (orders whose line quantity total exceeds a threshold).
    */
  def q18Volume(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val bigOrders = l.groupBy(col("l_orderkey"))
      .agg(round(sum(col("l_quantity")), 2).as("total_qty"))
      .filter(col("total_qty") > 300)
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    bigOrders
      .join(o, bigOrders("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        round(col("o_totalprice"), 2).as("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
  }

  val q18VolumeSql: String = """
    WITH big AS (
      SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING round(sum(l_quantity), 2) > 300)
    SELECT c_custkey, c_name, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
           round(o_totalprice, 2) AS o_totalprice, total_qty
    FROM big JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 20"""

  /** A12: rollup over two grouping levels (grand total via 'ALL'). */
  def qRollup(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("lines"), round(sum(col("l_quantity")), 2).as("qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
        col("lines"), col("qty"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val qRollupSql: String = """
    SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
           coalesce(l_linestatus, 'ALL') AS l_linestatus,
           count(*) AS lines, round(sum(l_quantity), 2) AS qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag, l_linestatus"""

  /** A17 / TPC-H Q4 style: EXISTS decorrelated to a LEFT SEMI join —
    * orders in a quarter with at least one line shipped >90 days after
    * the order date, counted by priority. The semi join keeps one probe
    * row per match (no fan-out, no distinct) and shuffles only the
    * quarter's orders.
    */
  def q4OrderPriority(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
    val l = Tables.lineitem(s, dir)
    o.join(l, o("o_orderkey") === l("l_orderkey") &&
        l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 90 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  val q4OrderPrioritySql: String = """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  /** A18 / TPC-H Q13 style: customer order-count distribution — the
    * inventory's LEFT OUTER join: every customer survives (count 0 for
    * the orderless), with a non-equi residual on the join. Two-phase
    * counts; customer is the small side but the OUTER side must be
    * preserved, so the build is on orders' partial counts.
    */
  def q13Custdist(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    c.join(o, c("c_custkey") === o("o_custkey") &&
        o("o_orderpriority") =!= lit("1-URGENT"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q13CustdistSql: String = """
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey)
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC"""

  /** A19 / TPC-H Q19 style: disjunctive join predicate — the equi key
    * (p_partkey = l_partkey) must still drive a hash join with the
    * OR-of-ANDs evaluated as a residual filter, never a nested loop.
    * Catalyst splits the disjunction per table and pushes each side's
    * Or-of-ranges into its parquet scan (plan-verified: both FileScans
    * carry the Or(...) in PushedFilters).
    */
  def q19Disjunctive(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val p = Tables.part(s, dir)
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#15" && col("p_size").between(1, 35) &&
          col("l_quantity").between(20, 30)))
      .agg(round(sum(disc), 2).as("revenue"), count(lit(1)).as("n"))

  }

  val q19DisjunctiveSql: String = """
    SELECT round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
           count(*) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)"""

  /** A20 / TPC-H Q17 style: correlated aggregate subquery, decorrelated
    * to a per-key aggregate + equi join — lines under 20% of their
    * part's average quantity. The per-part threshold is rounded to 6dp
    * in both engines before the comparison (a raw avg's last bit
    * depends on summation order).
    */
  def q17SmallQty(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val thresholds = l.groupBy(col("l_partkey").as("t_partkey"))
      .agg(round(lit(0.2) * avg(col("l_quantity")), 6).as("qty_thr"))
    val p = Tables.part(s, dir).filter(col("p_brand") === "Brand#23")
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .join(thresholds, l("l_partkey") === col("t_partkey"))
      .filter(col("l_quantity") < col("qty_thr"))
      .agg(round(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"),
        count(lit(1)).as("n"))

  }

  val q17SmallQtySql: String = """
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
           count(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (SELECT round(0.2 * avg(l_quantity), 6)
                        FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)"""

  /** A21 / TPC-H Q22 style: scalar subquery + NOT EXISTS — lapsed
    * customers with above-average positive balance and no orders since
    * 2000, by nation. The scalar average is evaluated first and
    * injected as a literal — exactly how Spark executes a SQL scalar
    * subquery (the subplan runs ahead of the main plan; a 1-row fetch
    * is bounded metadata, not a data collect) — rounded 6dp before the
    * float-sensitive comparison. The NOT EXISTS is a LEFT ANTI join
    * with the date filter pushed to the orders scan.
    */
  def q22Global(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val abRow = c.filter(col("c_acctbal") > 0.0)
      .agg(round(avg(col("c_acctbal")), 6).as("ab"))
      .head()
    // no positive balances ⇒ NULL average ⇒ the oracle's `> NULL`
    // comparison selects nothing; +∞ reproduces that empty result
    val ab = if (abRow.isNullAt(0)) Double.PositiveInfinity
      else abRow.getDouble(0)
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
    c.filter(col("c_acctbal") > lit(ab))
      .join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"),
        round(sum(col("c_acctbal")), 2).as("totacctbal"))
      .orderBy(col("c_nationkey"))
  }

  val q22GlobalSql: String = """
    SELECT c_nationkey, count(*) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT round(avg(c_acctbal), 6) FROM customer
                       WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_nationkey ORDER BY c_nationkey"""

  /** A22: exact percentiles per group — Spark's `percentile` (exact,
    * linearly interpolated) against DuckDB's quantile_cont, rounded 4dp
    * (interpolation arithmetic is order-independent, but the final
    * bits aren't guaranteed across engines). Exact percentile sorts
    * within each group; for 100 TB dashboards the approx_percentile
    * sketch (t-digest-style, mergeable, one pass) is the scale path —
    * bound-asserted in PlanSpec-adjacent suites like HLL.
    */
  def qPercentiles(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(percentile(col("l_extendedprice"), lit(0.5)), 4).as("p50"),
        round(percentile(col("l_extendedprice"), lit(0.9)), 4).as("p90"),
        round(percentile(col("l_extendedprice"), lit(0.99)), 4).as("p99"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  val qPercentilesSql: String = """
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
           round(quantile_cont(l_extendedprice, 0.99), 4) AS p99,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** A59: time-to-convert distribution — the duration analytics the
    * funnel (A26) counts and A22's percentiles complete: for each
    * funnel transition (first view → first qualifying click → first
    * qualifying purchase), the distribution of elapsed time across
    * converting users. Stage frames are A26's verbatim (shrinking
    * aggregates + joins); durations are exact integer seconds
    * (µs difference, one floor-division — positive by construction,
    * no floor/truncate hazard); the distribution is the A22 exact
    * percentile per transition. The marketing read: p50 view→click is
    * the hesitation window, p90 click→purchase prices the remarketing
    * deadline.
    */
  def qTimeToConvert(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("tm"))
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("tm")).as("t_view"))
    val c = e.filter(col("event_type") === "click")
      .join(v, Seq("user_id")).filter(col("tm") > col("t_view"))
      .groupBy(col("user_id")).agg(min(col("tm")).as("t_click"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id")).filter(col("tm") > col("t_click"))
      .groupBy(col("user_id")).agg(min(col("tm")).as("t_purchase"))
    val d1 = c.join(v, Seq("user_id"))
      .select(lit("1_view_to_click").as("stage"),
        expr("(t_click - t_view) div 1000000").as("gap_s"))
    val d2 = p.join(c, Seq("user_id"))
      .select(lit("2_click_to_purchase").as("stage"),
        expr("(t_purchase - t_click) div 1000000").as("gap_s"))
    d1.unionByName(d2)
      .groupBy(col("stage"))
      .agg(count(lit(1)).as("n"),
        round(percentile(col("gap_s"), lit(0.5)), 4).as("p50_s"),
        round(percentile(col("gap_s"), lit(0.9)), 4).as("p90_s"),
        max(col("gap_s")).as("max_s"))
      .orderBy(col("stage"))
  }

  val qTimeToConvertSql: String = """
    WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tm FROM events),
    v AS (SELECT user_id, min(tm) AS t_view FROM e
          WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, min(e.tm) AS t_click
          FROM e JOIN v USING (user_id)
          WHERE event_type = 'click' AND e.tm > v.t_view
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.tm) AS t_purchase
          FROM e JOIN c USING (user_id)
          WHERE event_type = 'purchase' AND e.tm > c.t_click
          GROUP BY e.user_id),
    gaps AS (
      SELECT '1_view_to_click' AS stage,
             (t_click - t_view) // 1000000 AS gap_s
      FROM c JOIN v USING (user_id)
      UNION ALL
      SELECT '2_click_to_purchase',
             (t_purchase - t_click) // 1000000
      FROM p JOIN c USING (user_id))
    SELECT stage, count(*) AS n,
           round(quantile_cont(gap_s, 0.5), 4) AS p50_s,
           round(quantile_cont(gap_s, 0.9), 4) AS p90_s,
           max(gap_s)::BIGINT AS max_s
    FROM gaps GROUP BY stage ORDER BY stage"""

  /** A60 minimum pair support for the basket gate. */
  val BasketMinSupport = 3L

  /** A60: market-basket co-occurrence lift — the association-rule
    * primitive (the single-level A-priori step): which part PAIRS
    * appear in the same order more often than independence predicts.
    * lift(a,b) = N·c_ab / (c_a·c_b), support-floored. The scale story
    * is WHY this is feasible at all: the pair generation is a
    * self-join keyed on the ORDER — each join bucket is one basket,
    * bounded by basket size (≤ C(lines,2) pairs per order, never a
    * corpus cross product), and the support floor prunes before the
    * lift join. Both self-join sides are O(corpus): SHUFFLE_HASH by
    * the §8a rule. Baskets dedup (order, part) first — quantity
    * doesn't inflate co-occurrence. Lift is one positive integer
    * floor-division of exact BIGINTs per surviving pair.
    */
  def qBasketLift(s: SparkSession, dir: String): DataFrame = {
    val op = graft.CachedFrames.persist(Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct())
    val n = op.select(col("o")).distinct().count()
    val parts = op.groupBy(col("p")).agg(count(lit(1)).as("c"))
    val pairs = op.select(col("o"), col("p").as("pa"))
      .hint("shuffle_hash")
      .join(op.select(col("o"), col("p").as("pb")), Seq("o"))
      .filter(col("pa") < col("pb"))
      .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= BasketMinSupport)
    pairs
      .join(parts.select(col("p").as("pa"), col("c").as("c_a"))
        .hint("shuffle_hash"), Seq("pa"))
      .join(parts.select(col("p").as("pb"), col("c").as("c_b"))
        .hint("shuffle_hash"), Seq("pb"))
      .select(col("pa"), col("pb"), col("c_ab"), col("c_a"), col("c_b"),
        expr(s"c_ab * $n * 1000000 div (c_a * c_b)").as("lift_micro"))
      .orderBy(col("lift_micro").desc, col("pa"), col("pb"))
      .limit(20)
  }

  val qBasketLiftSql: String = s"""
    WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                FROM lineitem),
    tot AS (SELECT count(DISTINCT o) AS n FROM op),
    parts AS (SELECT p, count(*) AS c FROM op GROUP BY p),
    pairs AS (
      SELECT a.p AS pa, b.p AS pb, count(*) AS c_ab
      FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
      GROUP BY 1, 2 HAVING count(*) >= $BasketMinSupport)
    SELECT pa, pb, c_ab, ca.c AS c_a, cb.c AS c_b,
           (c_ab * n * 1000000 // (ca.c * cb.c))::BIGINT AS lift_micro
    FROM pairs JOIN parts ca ON ca.p = pa
               JOIN parts cb ON cb.p = pb, tot
    ORDER BY lift_micro DESC, pa, pb LIMIT 20"""

  /** A61: semi-structured JSON extraction — the schema-on-read step
    * every event pipeline starts with: `props` is a JSON string
    * column, and the Spark-first move is `from_json` with an explicit
    * schema (codegen'd JsonToStructs — typed at plan time, vectorized,
    * malformed input becomes NULL instead of an exception) rather than
    * per-row string surgery or a UDF. The gate extracts the typed
    * field and aggregates it per event type, counting missing/
    * malformed extractions explicitly — at 100 TB the malformed rate
    * is a monitored number, not a silent drop. All aggregates exact
    * BIGINTs.
    */
  def qJsonExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("k",
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k LONG"))
          .getField("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_missing"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  val qJsonExtractSql: String = """
    SELECT event_type, count(*) AS n,
           sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_missing,
           sum(k)::BIGINT AS sum_k, min(k)::BIGINT AS min_k,
           max(k)::BIGINT AS max_k
    FROM (SELECT event_type, (props ->> 'k')::BIGINT AS k FROM events)
    GROUP BY event_type ORDER BY event_type"""

  /** A46: quantile estimation over a DETERMINISTIC hash-threshold
    * sample — the scale face of A22: exact percentiles shuffle the
    * full value distribution; at 100 TB the standard move is a uniform
    * sample, and a hash threshold (keep rows whose md5-prefix draw
    * falls below 2²⁸/rate) makes the sample a pure codegen filter —
    * no RNG state, no seed coordination across executors, identical
    * in any engine. The gate emits estimated beside exact percentiles
    * with their absolute errors, so the hash-match VERIFIES the
    * measured sampling error (the D11/A45 discipline applied to
    * quantiles). The filter pushes to the scan; the exact side exists
    * only to verify (production runs the sample side alone).
    */
  val QsRate = 16 // keep ~1/16 of rows

  def qSketchQuantiles(s: SparkSession, dir: String): DataFrame = {
    val li = graft.CachedFrames.persist(Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_extendedprice"),
        graft.dedup.Shingling.h28(concat(lit("qs-"),
          col("l_orderkey").cast("string"), lit("-"),
          col("l_linenumber").cast("string"))).as("h")))
    def pcts(df: DataFrame, suffix: String) =
      df.groupBy(col("l_returnflag")).agg(
        round(percentile(col("l_extendedprice"), lit(0.5)), 4)
          .as(s"p50$suffix"),
        round(percentile(col("l_extendedprice"), lit(0.9)), 4)
          .as(s"p90$suffix"),
        round(percentile(col("l_extendedprice"), lit(0.99)), 4)
          .as(s"p99$suffix"),
        count(lit(1)).as(s"n$suffix"))
    val est = pcts(li.filter(col("h") < lit(268435456L / QsRate)), "_est")
    val tru = pcts(li, "")
    tru.join(est, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("n"), col("n_est").as("n_sample"),
        col("p50"), col("p50_est"),
        round(abs(col("p50_est") - col("p50")), 4).as("err50"),
        col("p90"), col("p90_est"),
        round(abs(col("p90_est") - col("p90")), 4).as("err90"),
        col("p99"), col("p99_est"),
        round(abs(col("p99_est") - col("p99")), 4).as("err99"))
      .orderBy(col("l_returnflag"))
  }

  val qSketchQuantilesSql: String = s"""
    WITH li AS (
      SELECT l_returnflag, l_extendedprice,
             ('0x' || substring(md5('qs-' || l_orderkey::VARCHAR || '-' ||
               l_linenumber::VARCHAR), 1, 7))::BIGINT AS h
      FROM lineitem),
    est AS (
      SELECT l_returnflag,
             round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_est,
             round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_est,
             round(quantile_cont(l_extendedprice, 0.99), 4) AS p99_est,
             count(*) AS n_sample
      FROM li WHERE h < ${268435456L / QsRate} GROUP BY l_returnflag),
    tru AS (
      SELECT l_returnflag,
             round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
             round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
             round(quantile_cont(l_extendedprice, 0.99), 4) AS p99,
             count(*) AS n
      FROM li GROUP BY l_returnflag)
    SELECT t.l_returnflag, n, n_sample,
           p50, p50_est, round(abs(p50_est - p50), 4) AS err50,
           p90, p90_est, round(abs(p90_est - p90), 4) AS err90,
           p99, p99_est, round(abs(p99_est - p99), 4) AS err99
    FROM tru t JOIN est e ON t.l_returnflag = e.l_returnflag
    ORDER BY t.l_returnflag"""

  /** A23: pivot — order counts per year × priority (wide layout) plus
    * yearly revenue, in ONE scan: `.pivot` with explicit values and two
    * aggregates per cell (count + raw revenue) compiles to a single
    * two-phase hash aggregate; the yearly total is the sum of the five
    * per-priority cell sums (exact partials; the 2dp rounding of a
    * ~1e8 total absorbs the reassociation ulps vs the oracle's
    * single-pass sum). Missing cells coalesce to 0 so the wide schema
    * is total.
    */
  def qPivot(s: SparkSession, dir: String): DataFrame = {
    val priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
      "4-NOT SPECIFIED", "5-LOW")
    val renamed = Seq("urgent", "high", "medium", "notspec", "low")
    val wide = Tables.orders(s, dir)
      .withColumn("yr", year(col("o_orderdate")))
      .groupBy(col("yr"))
      .pivot("o_orderpriority", priorities)
      .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("r"))
    val counts = priorities.zip(renamed).map { case (from, to) =>
      coalesce(col(s"`${from}_n`"), lit(0L)).as(to)
    }
    val revenue = round(priorities.map(p =>
      coalesce(col(s"`${p}_r`"), lit(0.0))).reduce(_ + _), 2).as("revenue")
    wide.select((col("yr") +: counts :+ revenue): _*)
      .orderBy(col("yr"))
  }

  val qPivotSql: String = """
    SELECT year(o_orderdate) AS yr,
           count(*) FILTER (o_orderpriority = '1-URGENT') AS urgent,
           count(*) FILTER (o_orderpriority = '2-HIGH') AS high,
           count(*) FILTER (o_orderpriority = '3-MEDIUM') AS medium,
           count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS notspec,
           count(*) FILTER (o_orderpriority = '5-LOW') AS low,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders GROUP BY yr ORDER BY yr"""

  /** A62: UNPIVOT (melt) — A23's inverse, and the lossless-roundtrip
    * claim behind both: pivot to wide (one two-phase hash agg),
    * `stack` back to long (a narrow codegen'd generator — no shuffle:
    * the inverse direction is FREE, which is why storing long and
    * pivoting late is the right layout at scale), and the oracle
    * states the roundtrip IDENTITY — unpivot(pivot(x)) must equal the
    * direct GROUP BY, so the gate hash-fails if either direction
    * drops or fabricates a cell. Absent combinations surface as NULL
    * cells in the wide frame and are filtered, exactly the rows the
    * direct aggregate never had.
    */
  def qUnpivot(s: SparkSession, dir: String): DataFrame = {
    val flags = Seq("A", "N", "R")
    val wide = Tables.lineitem(s, dir)
      .groupBy(col("l_linestatus"))
      .pivot("l_returnflag", flags)
      .agg(sum(round(col("l_quantity") * 100.0, 0).cast("long")))
    wide.select(col("l_linestatus"),
        expr(s"stack(${flags.length}, " +
          flags.map(f => s"'$f', `$f`").mkString(", ") +
          ") as (l_returnflag, qty_cq)"))
      .filter(col("qty_cq").isNotNull)
      .orderBy(col("l_linestatus"), col("l_returnflag"))
  }

  val qUnpivotSql: String = """
    SELECT l_linestatus, l_returnflag,
           sum(round(l_quantity * 100.0, 0)::BIGINT)::BIGINT AS qty_cq
    FROM lineitem GROUP BY l_linestatus, l_returnflag
    ORDER BY l_linestatus, l_returnflag"""

  /** A63: join-key skew diagnostics — the measurement you run BEFORE
    * reaching for A34's salt: per prospective join key, the bucket
    * size distribution (exact percentiles + max), the skew factor
    * (max/mean, integer micro — the number that decides salting), and
    * the share of rows under the single hottest key. One map-side-
    * combinable count per key, one tiny distribution aggregate per
    * diagnosed key column; the row output is one line per candidate
    * key — the table a planner (human or AQE threshold tuner) reads.
    * Diagnosed here: the three fact join keys of this schema.
    */
  def qSkewDiagnose(s: SparkSession, dir: String): DataFrame = {
    val li = graft.CachedFrames.persist(Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey")))
    def diag(key: String): DataFrame = {
      val c = li.groupBy(col(key)).agg(count(lit(1)).as("c"))
      val agg = c.agg(count(lit(1)).as("n_keys"), sum(col("c")).as("n_rows"),
        round(percentile(col("c"), lit(0.5)), 4).as("p50"),
        round(percentile(col("c"), lit(0.99)), 4).as("p99"),
        max(col("c")).as("max_c"))
      agg.select(lit(key).as("join_key"), col("n_keys"), col("n_rows"),
        col("p50"), col("p99"), col("max_c"),
        expr("max_c * n_keys * 1000000 div n_rows").as("skew_micro"),
        expr("max_c * 1000000 div n_rows").as("top_key_share_ppm"))
    }
    Seq("l_orderkey", "l_partkey", "l_suppkey").map(diag)
      .reduce(_.unionByName(_))
      .orderBy(col("join_key"))
  }

  val qSkewDiagnoseSql: String = {
    def one(key: String): String = s"""
      SELECT '$key' AS join_key, count(*) AS n_keys,
             sum(c)::BIGINT AS n_rows,
             round(quantile_cont(c, 0.5), 4) AS p50,
             round(quantile_cont(c, 0.99), 4) AS p99,
             max(c)::BIGINT AS max_c,
             (max(c) * count(*) * 1000000 // sum(c))::BIGINT AS skew_micro,
             (max(c) * 1000000 // sum(c))::BIGINT AS top_key_share_ppm
      FROM (SELECT $key, count(*) AS c FROM lineitem GROUP BY $key)"""
    Seq("l_orderkey", "l_partkey", "l_suppkey").map(one)
      .mkString("", " UNION ALL ", " ORDER BY join_key")
  }

  /** A24: set operations — customers active in 1997 INTERSECT/EXCEPT
    * customers active in 2000, tagged and stacked. Both ops compile to
    * aggregate/anti shapes on the key (no sort-based set diff).
    */
  def qSetops(s: SparkSession, dir: String): DataFrame = {
    def active(yr: Int) = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit(s"$yr-01-01").cast("timestamp") &&
        col("o_orderdate") < lit(s"${yr + 1}-01-01").cast("timestamp"))
      .select(col("o_custkey")).distinct()
    val a = active(1997)
    val b = active(2000)
    a.intersect(b).withColumn("tag", lit("both"))
      .unionByName(a.except(b).withColumn("tag", lit("only_1997")))
      .select(col("tag"), col("o_custkey"))
      .orderBy(col("tag"), col("o_custkey"))
  }

  val qSetopsSql: String = """
    WITH a AS (SELECT DISTINCT o_custkey FROM orders
               WHERE o_orderdate >= TIMESTAMP '1997-01-01'
                 AND o_orderdate < TIMESTAMP '1998-01-01'),
    b AS (SELECT DISTINCT o_custkey FROM orders
          WHERE o_orderdate >= TIMESTAMP '2000-01-01'
            AND o_orderdate < TIMESTAMP '2001-01-01')
    SELECT 'both' AS tag, o_custkey FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
    UNION ALL
    SELECT 'only_1997' AS tag, o_custkey FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
    ORDER BY tag, o_custkey"""

  /** A25: per-group top-k via the custom heap aggregate (E18 TopKAgg) —
    * shuffle volume k·|groups| with map-side combine, vs. the window
    * idiom that shuffles and sorts every row of every group. The DuckDB
    * oracle IS the window idiom, so the gate proves the two agree row
    * for row (the ordering is total: ties break on the id).
    */
  def qTopkPerGroup(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .groupBy(col("c_mktsegment"))
      .agg(graft.functions.TopKAgg(col("c_acctbal"), col("c_custkey"), 3)
        .as("top"))
      .select(col("c_mktsegment"), posexplode(col("top")))
      .select(col("c_mktsegment"), (col("pos") + 1).cast("long").as("rank"),
        col("col.score").as("c_acctbal"), col("col.id").as("c_custkey"))
      .orderBy(col("c_mktsegment"), col("rank"))

  val qTopkPerGroupSql: String = """
    SELECT c_mktsegment, rank, c_acctbal, c_custkey FROM (
      SELECT c_mktsegment, c_acctbal, c_custkey,
             row_number() OVER (PARTITION BY c_mktsegment
               ORDER BY c_acctbal DESC, c_custkey) AS rank
      FROM customer)
    WHERE rank <= 3 ORDER BY c_mktsegment, rank"""

  /** A26: funnel analysis — users progressing view → click → purchase
    * in strict event-time order. Decorrelated to three shrinking
    * aggregate+join stages (each stage joins only the users who
    * survived the previous one — no self-join of the raw stream, no
    * window over all events).
    */
  def qFunnel(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    def firstAfter(tpe: String, prev: DataFrame, prevTs: String,
        out: String): DataFrame =
      e.filter(col("event_type") === tpe)
        .join(prev, Seq("user_id"))
        .filter(col("ts") > col(prevTs))
        .groupBy(col("user_id")).agg(min(col("ts")).as(out))
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
    val c = firstAfter("click", v, "t_view", "t_click")
    val p = firstAfter("purchase", c.select("user_id", "t_click"), "t_click",
      "t_purchase")
    // one conditional aggregate over the tagged stages (a cross join of
    // three 1-row counts would plan as a nested-loop join)
    v.select(lit("v").as("st"))
      .unionByName(c.select(lit("c").as("st")))
      .unionByName(p.select(lit("p").as("st")))
      .agg(sum(when(col("st") === "v", 1L).otherwise(0L)).as("viewed"),
        sum(when(col("st") === "c", 1L).otherwise(0L)).as("clicked"),
        sum(when(col("st") === "p", 1L).otherwise(0L)).as("purchased"))
  }

  val qFunnelSql: String = """
    WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, min(e.ts) AS t_click
          FROM events e JOIN v USING (user_id)
          WHERE e.event_type = 'click' AND e.ts > v.t_view
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.ts) AS t_purchase
          FROM events e JOIN c USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts > c.t_click
          GROUP BY e.user_id)
    SELECT sum(CASE WHEN st = 'v' THEN 1 ELSE 0 END)::BIGINT AS viewed,
           sum(CASE WHEN st = 'c' THEN 1 ELSE 0 END)::BIGINT AS clicked,
           sum(CASE WHEN st = 'p' THEN 1 ELSE 0 END)::BIGINT AS purchased
    FROM (SELECT 'v' AS st FROM v UNION ALL SELECT 'c' FROM c
          UNION ALL SELECT 'p' FROM p)"""

  /** A64: deadline-windowed funnel — A26 with the semantics production
    * funnels actually use: a click only converts if it lands within
    * [[FunnelWindowDays]] of the FIRST view, and a purchase within the
    * same window of the qualifying click (no deadline ⇒ a user who
    * views in January and buys in December "converts"). Same shrinking
    * aggregate+join stages as A26 — the deadline is one extra
    * predicate per stage, evaluated in exact integer µs — plus a
    * per-stage emitted count of conversions the UNWINDOWED funnel
    * would have over-counted (the window's bite, as a number).
    */
  val FunnelWindowDays = 7L

  def qFunnelWindowed(s: SparkSession, dir: String): DataFrame = {
    val windowUs = FunnelWindowDays * 86400L * 1000000L
    val e = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("tm"))
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("tm")).as("t_view"))
    def stage(tpe: String, prev: DataFrame, prevTs: String,
              out: String, windowed: Boolean): DataFrame = {
      val base = e.filter(col("event_type") === tpe)
        .join(prev, Seq("user_id"))
        .filter(col("tm") > col(prevTs))
      val bounded = if (windowed)
        base.filter(col("tm") <= col(prevTs) + lit(windowUs)) else base
      bounded.groupBy(col("user_id")).agg(min(col("tm")).as(out))
    }
    val c = stage("click", v, "t_view", "t_click", windowed = true)
    val p = stage("purchase", c.select("user_id", "t_click"), "t_click",
      "t_purchase", windowed = true)
    val cAny = stage("click", v, "t_view", "t_click", windowed = false)
    val pAny = stage("purchase", cAny.select("user_id", "t_click"),
      "t_click", "t_purchase", windowed = false)
    v.select(lit("v").as("st"))
      .unionByName(c.select(lit("c").as("st")))
      .unionByName(p.select(lit("p").as("st")))
      .unionByName(cAny.select(lit("ca").as("st")))
      .unionByName(pAny.select(lit("pa").as("st")))
      .agg(sum(when(col("st") === "v", 1L).otherwise(0L)).as("viewed"),
        sum(when(col("st") === "c", 1L).otherwise(0L)).as("clicked_7d"),
        sum(when(col("st") === "p", 1L).otherwise(0L)).as("purchased_7d"),
        (sum(when(col("st") === "ca", 1L).otherwise(0L)) -
          sum(when(col("st") === "c", 1L).otherwise(0L)))
          .as("clicks_lost_to_window"),
        (sum(when(col("st") === "pa", 1L).otherwise(0L)) -
          sum(when(col("st") === "p", 1L).otherwise(0L)))
          .as("purchases_lost_to_window"))
  }

  val qFunnelWindowedSql: String = s"""
    WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tm FROM events),
    v AS (SELECT user_id, min(tm) AS t_view FROM e
          WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, min(e.tm) AS t_click
          FROM e JOIN v USING (user_id)
          WHERE event_type = 'click' AND e.tm > v.t_view
            AND e.tm <= v.t_view + ${FunnelWindowDays * 86400L * 1000000L}
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.tm) AS t_purchase
          FROM e JOIN c USING (user_id)
          WHERE event_type = 'purchase' AND e.tm > c.t_click
            AND e.tm <= c.t_click + ${FunnelWindowDays * 86400L * 1000000L}
          GROUP BY e.user_id),
    ca AS (SELECT e.user_id, min(e.tm) AS t_click
           FROM e JOIN v USING (user_id)
           WHERE event_type = 'click' AND e.tm > v.t_view
           GROUP BY e.user_id),
    pa AS (SELECT e.user_id, min(e.tm) AS t_purchase
           FROM e JOIN ca USING (user_id)
           WHERE event_type = 'purchase' AND e.tm > ca.t_click
           GROUP BY e.user_id)
    SELECT sum(CASE WHEN st = 'v' THEN 1 ELSE 0 END)::BIGINT AS viewed,
           sum(CASE WHEN st = 'c' THEN 1 ELSE 0 END)::BIGINT AS clicked_7d,
           sum(CASE WHEN st = 'p' THEN 1 ELSE 0 END)::BIGINT
             AS purchased_7d,
           (sum(CASE WHEN st = 'ca' THEN 1 ELSE 0 END)
             - sum(CASE WHEN st = 'c' THEN 1 ELSE 0 END))::BIGINT
             AS clicks_lost_to_window,
           (sum(CASE WHEN st = 'pa' THEN 1 ELSE 0 END)
             - sum(CASE WHEN st = 'p' THEN 1 ELSE 0 END))::BIGINT
             AS purchases_lost_to_window
    FROM (SELECT 'v' AS st FROM v UNION ALL SELECT 'c' FROM c
          UNION ALL SELECT 'p' FROM p UNION ALL SELECT 'ca' FROM ca
          UNION ALL SELECT 'pa' FROM pa)"""

  /** A27: retention cohorts — users grouped by first-seen week, counted
    * per active week. Two aggregates and one join on user_id; the
    * cohort dimension rides the join, so no row ever carries more than
    * its own week.
    */
  def qCohort(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val cohorts = e.groupBy(col("user_id"))
      .agg(date_format(date_trunc("week", min(col("ts"))), "yyyy-MM-dd")
        .as("cohort"))
    val active = e.select(col("user_id"),
      date_format(date_trunc("week", col("ts")), "yyyy-MM-dd").as("week"))
      .distinct()
    active.join(cohorts, Seq("user_id"))
      .groupBy(col("cohort"), col("week"))
      .agg(countDistinct(col("user_id")).as("users"))
      .orderBy(col("cohort"), col("week"))
  }

  val qCohortSql: String = """
    WITH cohorts AS (
      SELECT user_id,
             strftime(date_trunc('week', min(ts)), '%Y-%m-%d') AS cohort
      FROM events GROUP BY user_id),
    active AS (
      SELECT DISTINCT user_id,
             strftime(date_trunc('week', ts), '%Y-%m-%d') AS week
      FROM events)
    SELECT cohort, week, count(DISTINCT user_id) AS users
    FROM active JOIN cohorts USING (user_id)
    GROUP BY cohort, week ORDER BY cohort, week"""

  /** A28: statistical aggregates — sample stddev/variance, correlation
    * and covariance per event type, each rounded where last-ulp
    * summation order lives.
    */
  def qStats(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        round(stddev_samp(col("value")), 4).as("sd"),
        round(var_samp(col("value")), 2).as("variance"),
        round(corr(col("value"), col("user_id").cast("double")), 6).as("r"),
        round(covar_samp(col("value"), col("user_id").cast("double")), 2)
          .as("cov"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  val qStatsSql: String = """
    SELECT event_type,
           round(stddev_samp(value), 4) AS sd,
           round(var_samp(value), 2) AS variance,
           round(corr(value, user_id::DOUBLE), 6) AS r,
           round(covar_samp(value, user_id::DOUBLE), 2) AS cov,
           count(*) AS n
    FROM events GROUP BY event_type ORDER BY event_type"""

  /** A29: numeric histogram — fixed-width binning by exact integer
    * division of the double (identical in both engines; no
    * width_bucket dependency), with per-bin bounds.
    */
  def qHistogram(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .withColumn("bin", floor(col("o_totalprice") / 50000.0).cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        round(min(col("o_totalprice")), 2).as("lo"),
        round(max(col("o_totalprice")), 2).as("hi"))
      .orderBy(col("bin"))

  val qHistogramSql: String = """
    SELECT floor(o_totalprice / 50000.0)::BIGINT AS bin, count(*) AS n,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM orders GROUP BY bin ORDER BY bin"""

  /** A30: FULL OUTER reconciliation — activity snapshots of two years
    * joined so customers on either side survive, with presence
    * classified. The canonical "diff two partitions of the archive"
    * job; both sides pre-aggregate before the join so the shuffle
    * carries one row per customer per side.
    */
  def qFullOuter(s: SparkSession, dir: String): DataFrame = {
    def snapshot(yr: Int, n: String) = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit(s"$yr-01-01").cast("timestamp") &&
        col("o_orderdate") < lit(s"${yr + 1}-01-01").cast("timestamp"))
      .groupBy(col("o_custkey")).agg(count(lit(1)).as(n))
    val a = snapshot(1997, "n_1997")
    val b = snapshot(2000, "n_2000")
    a.join(b, Seq("o_custkey"), "full_outer")
      .select(col("o_custkey"),
        coalesce(col("n_1997"), lit(0L)).as("n_1997"),
        coalesce(col("n_2000"), lit(0L)).as("n_2000"),
        when(col("n_1997").isNotNull && col("n_2000").isNotNull, "both")
          .when(col("n_1997").isNotNull, "only_1997")
          .otherwise("only_2000").as("status"))
      .orderBy(col("o_custkey"))
  }

  val qFullOuterSql: String = """
    WITH a AS (SELECT o_custkey, count(*) AS n_1997 FROM orders
               WHERE o_orderdate >= TIMESTAMP '1997-01-01'
                 AND o_orderdate < TIMESTAMP '1998-01-01'
               GROUP BY o_custkey),
    b AS (SELECT o_custkey, count(*) AS n_2000 FROM orders
          WHERE o_orderdate >= TIMESTAMP '2000-01-01'
            AND o_orderdate < TIMESTAMP '2001-01-01'
          GROUP BY o_custkey)
    SELECT coalesce(a.o_custkey, b.o_custkey) AS o_custkey,
           coalesce(n_1997, 0) AS n_1997,
           coalesce(n_2000, 0) AS n_2000,
           CASE WHEN n_1997 IS NOT NULL AND n_2000 IS NOT NULL THEN 'both'
                WHEN n_1997 IS NOT NULL THEN 'only_1997'
                ELSE 'only_2000' END AS status
    FROM a FULL OUTER JOIN b USING (o_custkey)
    ORDER BY o_custkey"""

  /** A31: time-series gap filling — a dense hourly axis generated from
    * the stream's own bounds (two bounded scalars, fetched like a
    * scalar subquery), left-joined against the sparse counts and
    * zero-filled. The axis is sequence+explode — rows/hour regardless
    * of data skew — so the dense frame never materializes on one task.
    */
  def qGapfill(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val counts = e.filter(col("event_type") === "purchase" &&
        col("value") > 95)
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"))
    val bounds = e.agg(
      min(date_trunc("hour", col("ts"))).as("t0"),
      max(date_trunc("hour", col("ts"))).as("t1")).head()
    // empty stream ⇒ NULL bounds ⇒ empty axis (what the oracle's
    // generate_series over NULL yields), not an NPE
    val hours =
      if (bounds.isNullAt(0))
        e.sparkSession.range(0).select(lit(null).cast("timestamp").as("h"))
      else e.sparkSession.range(1).select(explode(sequence(
        lit(bounds.getTimestamp(0)), lit(bounds.getTimestamp(1)),
        expr("INTERVAL 1 HOUR"))).as("h"))
    hours.join(counts, Seq("h"), "left")
      .select(date_format(col("h"), "yyyy-MM-dd HH:00").as("hour"),
        coalesce(col("n"), lit(0L)).as("n"))
      .orderBy(col("hour"))
  }

  val qGapfillSql: String = """
    WITH counts AS (
      SELECT date_trunc('hour', ts) AS h, count(*) AS n
      FROM events WHERE event_type = 'purchase' AND value > 95
      GROUP BY h),
    bounds AS (SELECT min(date_trunc('hour', ts)) AS t0,
                      max(date_trunc('hour', ts)) AS t1 FROM events),
    hours AS (SELECT unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS h
              FROM bounds)
    SELECT strftime(h, '%Y-%m-%d %H:00') AS hour, coalesce(n, 0)::BIGINT AS n
    FROM hours LEFT JOIN counts USING (h) ORDER BY hour"""

  /** A32: forward fill (LOCF) — last observation carried forward over
    * each series' dense hourly axis. Partitioned BY SERIES, so the
    * window parallelizes across keys (a global ordered window would
    * funnel the corpus through one task — same trap `data_pack`'s
    * prefix sum avoids); the axis is per-series sequence+explode from
    * that series' own bounds, no cross join. Filled values are copies
    * of already-rounded observations — the fill itself adds no
    * floating-point work.
    */
  def qLocf(s: SparkSession, dir: String): DataFrame = {
    val obs = Tables.events(s, dir)
      .filter(col("value") > 150)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(round(avg(col("value")), 6).as("v"))
    val axis = obs.groupBy(col("event_type"))
      .agg(min(col("h")).as("t0"), max(col("h")).as("t1"))
      .select(col("event_type"),
        explode(sequence(col("t0"), col("t1"), expr("INTERVAL 1 HOUR")))
          .as("h"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, 0)
    axis.join(obs, Seq("event_type", "h"), "left")
      .withColumn("filled", last(col("v"), ignoreNulls = true).over(w))
      .select(col("event_type"),
        date_format(col("h"), "yyyy-MM-dd HH:00").as("hour"),
        col("filled"), col("v").isNull.as("was_gap"))
      .orderBy(col("event_type"), col("hour"))
  }

  val qLocfSql: String = """
    WITH obs AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             round(avg(value), 6) AS v
      FROM events WHERE value > 150 GROUP BY event_type, h),
    bounds AS (SELECT event_type, min(h) AS t0, max(h) AS t1
               FROM obs GROUP BY event_type),
    axis AS (SELECT event_type,
                    unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS h
             FROM bounds),
    joined AS (SELECT axis.event_type, axis.h, obs.v
               FROM axis LEFT JOIN obs USING (event_type, h))
    SELECT event_type, strftime(h, '%Y-%m-%d %H:00') AS hour,
           last_value(v IGNORE NULLS) OVER (PARTITION BY event_type
             ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS filled,
           (v IS NULL) AS was_gap
    FROM joined ORDER BY event_type, hour"""

  /** A33: explicit GROUPING SETS — two one-dimension margins plus the
    * grand total in one pass (rollup/cube's general form; one expand +
    * one aggregate, not three scans unioned).
    */
  def qGroupingSets(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("lines"),
        round(sum(col("l_quantity")), 2).as("qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
        col("lines"), col("qty"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val qGroupingSetsSql: String = """
    SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
           coalesce(l_linestatus, 'ALL') AS l_linestatus,
           count(*) AS lines, round(sum(l_quantity), 2) AS qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    ORDER BY l_returnflag, l_linestatus"""

  /** A34: skew-salted fact⋈dim aggregation — the gate face of E11
    * ([[graft.operators.SaltedJoin]]). The events fact side gets a
    * deterministic row-derived salt, the customer dim is replicated
    * once per salt, and the join runs on (user_id, __salt): a hot
    * user_id's rows spread over `nSalts` shuffle partitions instead of
    * melting one task — the hand-rolled form of what AQE's skew-join
    * split does at runtime, for when skew is KNOWN ahead of planning
    * (a viral user at 100 TB). The `shuffle_hash` hint keeps the plan a
    * shuffled join (PlanSpec asserts the salted exchange); semantics
    * are salt-free, so the oracle is the plain join + aggregate.
    */
  def qSkewJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("value"))
    val cust = Tables.customer(s, dir)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      .hint("shuffle_hash")
    graft.operators.SaltedJoin.inner(ev, cust, Seq("user_id"), nSalts = 8)
      .groupBy(col("c_mktsegment"), col("event_type"))
      // integer-cents: quantize per row, sum exact BIGINT (the q10
      // discipline) — a 2dp-rounded double sum can land on a .005
      // boundary where summation order flips the last digit
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100.0, 0).cast("long")).as("value_cents"))
      .orderBy(col("c_mktsegment"), col("event_type"))
  }

  val qSkewJoinSql: String = """
    SELECT c_mktsegment, event_type, count(*) AS n_events,
           sum(round(value * 100.0, 0)::BIGINT)::BIGINT AS value_cents
    FROM events JOIN customer ON c_custkey = user_id
    GROUP BY 1, 2 ORDER BY c_mktsegment, event_type"""

  /** A35 / TPC-H Q7 style: bilateral trade volume between two nations by
    * ship year — the two nation dims broadcast under DIFFERENT aliases
    * (supplier side vs customer side), the disjunctive pair filter runs
    * after both, and the only shuffle is lineitem⋈orders on the order
    * key plus the final small agg.
    */
  def q7VolumeShipping(s: SparkSession, dir: String): DataFrame = {
    val n1 = Tables.nation(s, dir)
      .select(col("n_nationkey").as("supp_nkey"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, dir)
      .select(col("n_nationkey").as("cust_nkey"), col("n_name").as("cust_nation"))
    val l = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
    val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
    val c = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
    val su = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("supp_nkey"))
      .join(broadcast(n2), col("c_nationkey") === col("cust_nkey"))
      .filter(
        (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      // integer-cents revenue (q10 discipline): exact BIGINT sums
      .agg(sum(round(disc * 100.0, 0).cast("long")).as("revenue_cents"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  val q7VolumeShippingSql: String = """
    SELECT supp_nation, cust_nation, l_year,
           sum(round(volume * 100.0, 0)::BIGINT)::BIGINT AS revenue_cents
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year,
             l_extendedprice * (1.0 - l_discount) AS volume
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        AND c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01')
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year"""

  /** A36 / TPC-H Q8 style: one nation's market share of a product
    * type's revenue inside one region, by order year. Numerator and
    * denominator come out of ONE aggregate (conditional sum), both
    * rounded before the division so the share is deterministic
    * cross-engine.
    */
  def q8MarketShare(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir).filter(col("p_type") === "PROMO")
      .select("p_partkey")
    val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
    val nCust = Tables.nation(s, dir)
      .select(col("n_nationkey").as("cn_key"), col("n_regionkey"))
    val nSupp = Tables.nation(s, dir)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val base = Tables.lineitem(s, dir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nCust), col("c_nationkey") === col("cn_key"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .join(broadcast(Tables.supplier(s, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nSupp), col("s_nationkey") === col("sn_key"))
      .select(year(col("o_orderdate")).cast("long").as("o_year"),
        disc.as("volume"), col("supp_nation"))
    base.groupBy(col("o_year"))
      // integer-cents numerator and denominator (q10 discipline): both
      // sums are exact BIGINT, so the share divides two integers —
      // deterministic cross-engine with no .005-boundary hazard
      .agg(
        sum(when(col("supp_nation") === "NATION_3",
          round(col("volume") * 100.0, 0).cast("long"))
          .otherwise(lit(0L))).as("nation_rev_cents"),
        sum(round(col("volume") * 100.0, 0).cast("long"))
          .as("total_rev_cents"))
      .withColumn("mkt_share",
        round(col("nation_rev_cents") / col("total_rev_cents"), 6))
      .orderBy(col("o_year"))
  }

  val q8MarketShareSql: String = """
    SELECT o_year, nation_rev_cents, total_rev_cents,
           round(nation_rev_cents / total_rev_cents, 6) AS mkt_share
    FROM (
      SELECT year(o_orderdate) AS o_year,
             sum(CASE WHEN n2.n_name = 'NATION_3'
               THEN round(l_extendedprice * (1.0 - l_discount) * 100.0,
                 0)::BIGINT ELSE 0 END)::BIGINT AS nation_rev_cents,
             sum(round(l_extendedprice * (1.0 - l_discount) * 100.0,
               0)::BIGINT)::BIGINT AS total_rev_cents
      FROM part, lineitem, orders, customer, nation n1, region,
           supplier, nation n2
      WHERE p_partkey = l_partkey AND p_type = 'PROMO'
        AND o_orderkey = l_orderkey AND c_custkey = o_custkey
        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        AND r_name = 'ASIA' AND s_suppkey = l_suppkey
        AND s_nationkey = n2.n_nationkey
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY o_year)
    ORDER BY o_year"""

  /** A47 / TPC-H Q9 style: product-line profit by supplier nation and
    * order year — the widest join tree in the relational suite
    * (lineitem ⋈ orders ⋈ part ⋈ supplier ⋈ nation, 5 tables). The
    * schema carries no partsupp, so line cost is modeled as
    * p_retailprice·l_quantity (the join SHAPE — fact⋈fact on the order
    * key with three broadcast dims, a substring part filter pruning
    * before the join — is the graded thing, per SURVEY §2.2). Profit
    * quantizes per row to integer cents, so the sum is exact BIGINT
    * arithmetic in both engines regardless of summation order.
    */
  def q9Profit(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir).filter(col("p_name").contains("red"))
      .select("p_partkey", "p_retailprice")
    val o = Tables.orders(s, dir).select("o_orderkey", "o_orderdate")
    val su = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
    val n = Tables.nation(s, dir).select("n_nationkey", "n_name")
    val amount = col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
      col("p_retailprice") * col("l_quantity")
    Tables.lineitem(s, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(round(amount * 100.0, 0).cast("long")).as("profit_cents"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  val q9ProfitSql: String = """
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           sum(round((l_extendedprice * (1.0 - l_discount)
             - p_retailprice * l_quantity) * 100.0, 0)::BIGINT)::BIGINT
             AS profit_cents
    FROM part, supplier, lineitem, orders, nation
    WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
      AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
      AND p_name LIKE '%red%'
    GROUP BY n_name, o_year
    ORDER BY nation, o_year DESC"""

  /** A48 / TPC-H Q16 style: how many distinct suppliers offer each
    * part configuration, excluding a supplier blacklist. The schema
    * has no partsupp, so the offering relation derives as DISTINCT
    * (l_partkey, l_suppkey) FROM lineitem — itself the Q16-relevant
    * shape (a distinct-pair projection of the fact table that shuffles
    * two keys, never payloads). Then: anti join against the blacklist
    * (negative-balance suppliers — NOT IN with no NULL hazard since
    * s_suppkey is a key), broadcast part dim filtered before the join,
    * count(DISTINCT) per group. The count-distinct is Spark's
    * two-phase expand — partial per partition, exact global.
    */
  def q16PartSuppliers(s: SparkSession, dir: String): DataFrame = {
    val ps = Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val bad = Tables.supplier(s, dir).filter(col("s_acctbal") < 0)
      .select(col("s_suppkey"))
    val p = Tables.part(s, dir)
      .filter(col("p_type") =!= "PROMO")
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    ps.join(broadcast(bad), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
  }

  val q16PartSuppliersSql: String = """
    SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part ON p_partkey = l_partkey
    WHERE p_type != 'PROMO'
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0)
    GROUP BY p_brand, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_size"""

  /** A49 / TPC-H Q11 style: which parts carry an outsized share of one
    * nation's shipped value — group + HAVING against a scalar computed
    * over the SAME aggregate. Value quantizes per line to integer
    * cents (exact BIGINT sums); the per-part frame persists, its sum
    * collects as ONE bounded plan-time scalar (the T11 `n` idiom — a
    * cross join with the 1-row total would plan the BNLJ the no-BNLJ
    * guard exists to forbid), and the threshold compares
    * value_cents · 10⁴ > total · 20 in pure integers so no engine
    * ever divides.
    */
  def q11ImportantParts(s: SparkSession, dir: String): DataFrame = {
    val su = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)
        .filter(col("n_name") === "NATION_1")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val perPart = graft.CachedFrames.persist(Tables.lineitem(s, dir)
      .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(round(disc * 100.0, 0).cast("long")).as("value_cents")))
    // coalesce: an SF/nation combination with zero matching lines sums
    // to NULL; the empty frame then filters to empty whatever the total
    val total = perPart.agg(coalesce(sum(col("value_cents")), lit(0L)))
      .head.getLong(0)
    perPart
      .filter(col("value_cents") * 10000L > lit(total) * lit(20L))
      .select(col("l_partkey"), col("value_cents"))
      .orderBy(col("value_cents").desc, col("l_partkey"))
  }

  val q11ImportantPartsSql: String = """
    WITH pp AS (
      SELECT l_partkey,
             sum(round(l_extendedprice * (1.0 - l_discount) * 100.0,
               0)::BIGINT)::BIGINT AS value_cents
      FROM lineitem, supplier, nation
      WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        AND n_name = 'NATION_1'
      GROUP BY l_partkey)
    SELECT l_partkey, value_cents
    FROM pp
    WHERE value_cents * 10000 > (SELECT sum(value_cents) FROM pp) * 20
    ORDER BY value_cents DESC, l_partkey"""

  /** A50 / TPC-H Q2 style: the min-cost supplier per part within a
    * region — the classic correlated-MIN decorrelation. The schema has
    * no partsupp, so the offering relation derives from the fact
    * table: per (l_partkey, l_suppkey), supply cost = the best unit
    * price ever transacted, quantized to integer cents BEFORE the
    * integer division so both engines compare identical BIGINTs. The
    * plan is the Q2 shape Spark should pick: one fact shuffle to build
    * the offering, region-filtered suppliers broadcast (a dim at any
    * scale), the per-part MIN as a partial agg over the offering
    * (≪ fact rows), and the "achieves the min" join-back as an
    * equi-join on (partkey, cost) — never a correlated per-row
    * subquery.
    */
  def q2MinCostSupplier(s: SparkSession, dir: String): DataFrame = {
    val elig = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)
        .filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
        col("n_name"))
    val offering = Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        expr("cast(round(l_extendedprice * 100.0, 0) as bigint) " +
          "div cast(l_quantity as bigint)").as("uc"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("uc")).as("cost_cents"))
      .join(broadcast(elig), col("l_suppkey") === col("s_suppkey"))
    val minCost = offering.groupBy(col("l_partkey"))
      .agg(min(col("cost_cents")).as("min_cost"))
    val p = Tables.part(s, dir)
      .filter(col("p_size") % 10 === 5 && col("p_type") === "LARGE")
      .select(col("p_partkey"), col("p_brand"))
    offering.join(minCost, Seq("l_partkey"))
      .filter(col("cost_cents") === col("min_cost"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_brand"), col("cost_cents"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
      .limit(100)
  }

  val q2MinCostSupplierSql: String = """
    WITH elig AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier, nation, region
      WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        AND r_name = 'EUROPE'),
    offering AS (
      SELECT l_partkey, s_suppkey, s_name, s_acctbal, n_name,
             min(round(l_extendedprice * 100.0, 0)::BIGINT
               // l_quantity::BIGINT) AS cost_cents
      FROM lineitem JOIN elig ON l_suppkey = s_suppkey
      GROUP BY 1, 2, 3, 4, 5),
    mc AS (
      SELECT l_partkey, min(cost_cents) AS min_cost
      FROM offering GROUP BY 1)
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, cost_cents
    FROM offering
    JOIN mc USING (l_partkey)
    JOIN part ON p_partkey = l_partkey
    WHERE cost_cents = min_cost
      AND p_size % 10 = 5 AND p_type = 'LARGE'
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100"""

  /** A51 / TPC-H Q20 style: which of one nation's suppliers hold
    * excess stock of a part family — stock that didn't move. With no
    * partsupp, availability models as the all-time quantity a
    * (part, supplier) pair ever transacted, and "moved" as the slice
    * shipped in 1996; excess = avail > 2 × moved. Both sums come out
    * of ONE conditional aggregation over the fact table (a single
    * shuffle on the pair key — never two scans), the part-family
    * filter is a broadcast semi-join BEFORE the aggregation so
    * non-family lines never shuffle, and the supplier/nation dims
    * broadcast. Output is the per-supplier excess ledger.
    */
  def q20ExcessSuppliers(s: SparkSession, dir: String): DataFrame = {
    val fam = Tables.part(s, dir).filter(col("p_name").endsWith("bolt"))
      .select(col("p_partkey"))
    val su = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)
        .filter(col("n_name") === "NATION_2")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"))
    Tables.lineitem(s, dir)
      .join(broadcast(fam), col("l_partkey") === col("p_partkey"),
        "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity").cast("long")).as("avail_qty"),
        coalesce(sum(when(year(col("l_shipdate")) === 1996,
          col("l_quantity").cast("long"))), lit(0L)).as("moved_qty"))
      .filter(col("avail_qty") > col("moved_qty") * 2L)
      .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(count(lit(1)).as("n_excess_parts"),
        sum(col("avail_qty") - col("moved_qty") * 2L).as("excess_qty"))
      .orderBy(col("s_name"))
  }

  val q20ExcessSuppliersSql: String = """
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             sum(l_quantity::BIGINT)::BIGINT AS avail_qty,
             coalesce(sum(CASE WHEN year(l_shipdate) = 1996
               THEN l_quantity::BIGINT END), 0)::BIGINT AS moved_qty
      FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part
                          WHERE p_name LIKE '%bolt')
      GROUP BY 1, 2)
    SELECT s_suppkey, s_name, count(*) AS n_excess_parts,
           sum(avail_qty - moved_qty * 2)::BIGINT AS excess_qty
    FROM ps, supplier, nation
    WHERE avail_qty > moved_qty * 2 AND l_suppkey = s_suppkey
      AND s_nationkey = n_nationkey AND n_name = 'NATION_2'
    GROUP BY 1, 2
    ORDER BY s_name"""

  /** A52: distribution window functions — ntile / percent_rank /
    * cume_dist, the rank-normalization family the window suite didn't
    * yet cover (A6/A41-A43 cover rank, frames, lag, first_value).
    * Where they earn their keep in a curation pipeline: score
    * normalization — "which decile of its priority class is this
    * order's value in" is the same shape as "which quality decile of
    * its source is this document in". One window per partition key,
    * partitions independent (the parallelism axis); the ORDER BY
    * carries the unique key as tiebreak so every rank statistic is
    * deterministic and engine-identical. percent_rank/cume_dist are
    * exact rationals of ranks — 6dp rounding is cosmetic, not a
    * summation-order hazard.
    */
  def qDistributionWindows(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    o.select(col("o_orderpriority"), col("o_orderkey"),
        col("o_totalprice"),
        ntile(10).over(w).as("decile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
      .orderBy(col("o_orderpriority"), col("o_orderkey"))
  }

  val qDistributionWindowsSql: String = """
    SELECT o_orderpriority, o_orderkey, o_totalprice,
           ntile(10) OVER w AS decile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-04-01'
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderpriority, o_orderkey"""

  /** A53: behavioral transition matrix — P(next event type | current)
    * over per-user event sequences, the first-order Markov summary
    * every clickstream/product analysis starts from (and the event
    * analog of T11's pair statistics). One lag window per user
    * (partition-parallel, the A42 shape, unique (ts, event_id)
    * tiebreak), then two bounded aggregates: pair counts and per-row
    * totals over ≤ |types|² cells. Probabilities are exact integer
    * micro units (cnt·10⁶ div row_total) — no engine divides a float.
    */
  def qTransitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    val totals = pairs.groupBy(col("prev_type"))
      .agg(sum(col("cnt")).as("row_total"))
    pairs.join(totals, Seq("prev_type"))
      .withColumn("p_micro", expr("cnt * 1000000 div row_total"))
      .select(col("prev_type"), col("event_type").as("next_type"),
        col("cnt"), col("row_total"), col("p_micro"))
      .orderBy(col("prev_type"), col("next_type"))
  }

  val qTransitionsSql: String = """
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS prev_type
      FROM events),
    pairs AS (
      SELECT prev_type, event_type AS next_type, count(*) AS cnt
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type),
    totals AS (
      SELECT prev_type, sum(cnt)::BIGINT AS row_total
      FROM pairs GROUP BY prev_type)
    SELECT prev_type, next_type, cnt, row_total,
           (cnt * 1000000 // row_total)::BIGINT AS p_micro
    FROM pairs JOIN totals USING (prev_type)
    ORDER BY prev_type, next_type"""

  /** A37 / TPC-H Q10 style: top customers by revenue lost to returned
    * items in one quarter — fact⋈fact on the order key, customer and
    * nation broadcast, TakeOrderedAndProject for the top 20.
    */
  def q10ReturnedItems(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      // integer-cents revenue: each line's amount quantizes once, the
      // sum is exact BIGINT arithmetic — this group-set lands a 2dp
      // rounded double sum exactly on a .005 boundary where summation
      // order flips the last digit (the §8a micro-nat lesson)
      .agg(sum(round(disc * 100.0, 0).cast("long")).as("revenue_cents"))
      .orderBy(col("revenue_cents").desc, col("c_custkey"))
      .limit(20)
  }

  val q10ReturnedItemsSql: String = """
    SELECT c_custkey, c_name, c_acctbal, n_name,
           sum(round(l_extendedprice * (1.0 - l_discount) * 100.0,
             0)::BIGINT)::BIGINT AS revenue_cents
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND l_returnflag = 'R' AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue_cents DESC, c_custkey LIMIT 20"""

  /** A38 / TPC-H Q12 shape adapted to this schema (no l_shipmode /
    * l_receiptdate): lines bucketed by ship delay vs the order date,
    * counting high- vs low-priority orders per bucket — the Q12
    * conditional-sum-over-a-join shape with the delay standing in for
    * the ship mode.
    */
  def q12ShipDelay(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select("o_orderkey", "o_orderdate",
      "o_orderpriority")
    Tables.lineitem(s, dir).select("l_orderkey", "l_shipdate")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .withColumn("delay_days",
        datediff(col("l_shipdate"), col("o_orderdate")).cast("long"))
      .withColumn("delay_bucket",
        when(col("delay_days") < 30, "FAST")
          .when(col("delay_days") <= 90, "NORMAL")
          .otherwise("SLOW"))
      .groupBy(col("delay_bucket"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
      .orderBy(col("delay_bucket"))
  }

  val q12ShipDelaySql: String = """
    SELECT delay_bucket,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 0 ELSE 1 END)::BIGINT AS low_line_count
    FROM (
      SELECT o_orderpriority,
             CASE WHEN date_diff('day', o_orderdate, l_shipdate) < 30
                  THEN 'FAST'
                  WHEN date_diff('day', o_orderdate, l_shipdate) <= 90
                  THEN 'NORMAL'
                  ELSE 'SLOW' END AS delay_bucket
      FROM lineitem, orders WHERE l_orderkey = o_orderkey)
    GROUP BY delay_bucket ORDER BY delay_bucket"""

  /** A39 / TPC-H Q15 style: the quarter's top supplier(s) by revenue —
    * the per-supplier aggregate builds once, its max comes back as a
    * one-row broadcast (the scalar-subquery shape), and the equality
    * join keeps every supplier tied at the top.
    */
  def q15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      // integer-cents (q10 discipline): the revenue feeds an EQUALITY
      // join against its own max — exact BIGINT makes the tie exact
      .agg(sum(round(disc * 100.0, 0).cast("long")).as("revenue_cents"))
    val mx = rev.agg(max(col("revenue_cents")).as("mx"))
    rev.join(broadcast(mx), col("revenue_cents") === col("mx"))
      .join(broadcast(Tables.supplier(s, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("revenue_cents"))
      .orderBy(col("s_suppkey"))
  }

  val q15TopSupplierSql: String = """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(round(l_extendedprice * (1.0 - l_discount) * 100.0,
               0)::BIGINT)::BIGINT AS revenue_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, revenue_cents
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND revenue_cents = (SELECT max(revenue_cents) FROM revenue)
    ORDER BY s_suppkey"""

  /** A40 / TPC-H Q21 shape adapted (late = shipped >90 days after the
    * order date): suppliers whose late line sits on a multi-supplier
    * order where NO OTHER supplier was late — a fact self-SEMI-join
    * plus a fact self-ANTI-join on the order key, the exists/not-exists
    * pair decorrelated to physical semi/anti joins.
    */
  def q21LateSuppliers(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
    val l = Tables.lineitem(s, dir).select("l_orderkey", "l_suppkey",
      "l_shipdate")
    val l1 = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .withColumn("late",
        datediff(col("l_shipdate"), col("o_orderdate")) > 90)
      .select(col("l_orderkey"), col("l_suppkey"), col("late"))
    val lateLines = l1.filter(col("late"))
      .select(col("l_orderkey"), col("l_suppkey"))
    // EXISTS: another supplier contributed to the same order
    val l2 = l1.select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"))
    val withOthers = lateLines.join(l2,
      col("l_orderkey") === col("o2") && col("l_suppkey") =!= col("s2"),
      "left_semi")
    // NOT EXISTS: no OTHER supplier was late on that order
    val l3 = l1.filter(col("late"))
      .select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3"))
    val sole = withOthers.join(l3,
      col("l_orderkey") === col("o3") && col("l_suppkey") =!= col("s3"),
      "left_anti")
    sole.join(broadcast(Tables.supplier(s, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  val q21LateSuppliersSql: String = """
    WITH l1 AS (
      SELECT l_orderkey, l_suppkey,
             date_diff('day', o_orderdate, l_shipdate) > 90 AS late
      FROM lineitem, orders
      WHERE l_orderkey = o_orderkey AND o_orderstatus = 'F')
    SELECT s_name, count(*) AS numwait
    FROM l1, supplier
    WHERE late AND s_suppkey = l_suppkey
      AND EXISTS (SELECT 1 FROM l1 l2 WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM l1 l3 WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
    GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20"""

  /** A41: sliding-window moving average — a 7-row centered frame per
    * event-type daily series. Frames partition by the series key, so
    * every series windows independently in parallel; the daily rollup
    * before the window keeps frame rows tiny (days, not events).
    */
  def qMovingAvg(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-3, 3)
    daily
      .withColumn("ma7", round(avg(col("n")).over(w), 6))
      .withColumn("frame_n", count(lit(1)).over(w))
      .orderBy(col("event_type"), col("day"))
  }

  val qMovingAvgSql: String = """
    WITH daily AS (
      SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             count(*) AS n
      FROM events GROUP BY 1, 2)
    SELECT event_type, day, n,
           round(avg(n) OVER w, 6) AS ma7,
           count(*) OVER w AS frame_n
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ORDER BY event_type, day"""

  /** A58: RANGE-frame trailing window — the time-window aggregate A41
    * CANNOT express: a ROWS frame counts 7 neighboring OBSERVATIONS,
    * silently stretching over gaps (a series missing three days
    * averages a 10-day span and calls it 7) — the classic
    * moving-average bug. A RANGE frame bounds the frame by the
    * ORDERING VALUE: trailing 7 CALENDAR days, exactly, however many
    * rows exist inside. Ordering is an integer day number (epoch
    * days), so the frame arithmetic is exact integers in both engines
    * (a timestamp-interval range frame would drag in engine-specific
    * interval semantics); per-series partitioning keeps the window
    * parallel across keys. `frame_n` ≤ 7 by construction where the
    * A41 gate's `frame_n` is always 7 — the spec-visible difference
    * between the two frame types. Sum is exact integer micro-value
    * units; the mean divides two exact BIGINTs once per row.
    */
  def qRangeFrame(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .filter(col("event_type").isin("purchase", "view"))
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
          .cast("long").as("day_no"))
      .agg(sum(round(col("value") * 1e6, 0).cast("long")).as("v_micro"),
        count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day_no"))
      .rangeBetween(-6, 0)
    daily
      .withColumn("sum7d_micro", sum(col("v_micro")).over(w))
      .withColumn("n7d", sum(col("n")).over(w))
      .withColumn("frame_n", count(lit(1)).over(w))
      .select(col("event_type"),
        date_format(date_add(lit("1970-01-01").cast("date"),
          col("day_no").cast("int")), "yyyy-MM-dd").as("day"),
        col("v_micro"), col("sum7d_micro"),
        expr("sum7d_micro div n7d").as("mean7d_micro"), col("frame_n"))
      .orderBy(col("event_type"), col("day"))
  }

  val qRangeFrameSql: String = """
    WITH daily AS (
      SELECT event_type, datediff('day', DATE '1970-01-01', ts::DATE) AS day_no,
             sum(round(value * 1e6, 0)::BIGINT)::BIGINT AS v_micro,
             count(*) AS n
      FROM events WHERE event_type IN ('purchase', 'view')
      GROUP BY 1, 2)
    SELECT event_type,
           strftime(DATE '1970-01-01' + day_no::INT, '%Y-%m-%d') AS day,
           v_micro,
           sum(v_micro) OVER w::BIGINT AS sum7d_micro,
           (sum(v_micro) OVER w // sum(n) OVER w)::BIGINT AS mean7d_micro,
           count(*) OVER w AS frame_n
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day_no
                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    ORDER BY event_type, day"""

  /** A42: lead/lag deltas — per-user inter-event gaps, then the gap
    * distribution per event type. The lag window partitions by user
    * (parallel across keys); the distribution agg is a second small
    * shuffle.
    */
  def qLagDelta(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("gap_us",
        unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(byUser))
      .filter(col("gap_us").isNotNull)
      .groupBy(col("event_type"))
      // gaps stay integer microseconds end to end: the mean is exact
      // BIGINT division, immune to double-summation-order boundaries
      .agg(count(lit(1)).as("n_gaps"),
        expr("sum(gap_us) div count(1)").as("mean_gap_us"),
        min(col("gap_us")).as("min_gap_us"),
        max(col("gap_us")).as("max_gap_us"))
      .orderBy(col("event_type"))
  }

  val qLagDeltaSql: String = """
    WITH gaps AS (
      SELECT event_type,
             epoch_us(ts) - lag(epoch_us(ts), 1) OVER (
                PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events)
    SELECT event_type, count(*) AS n_gaps,
           (sum(gap_us)::BIGINT // count(*)) AS mean_gap_us,
           min(gap_us) AS min_gap_us,
           max(gap_us) AS max_gap_us
    FROM gaps WHERE gap_us IS NOT NULL
    GROUP BY event_type ORDER BY event_type"""

  /** A43: first-touch attribution — each user's first event (by time)
    * claims all their subsequent value; one window pass tags the first
    * touch, one aggregate attributes. first_value frames degenerate to
    * running min-by, so no full-partition materialization.
    */
  def qFirstTouch(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("first_type", first(col("event_type")).over(byUser))
      .groupBy(col("first_type"))
      // integer-cents attribution (q10 discipline): exact BIGINT sum
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 100.0, 0).cast("long"))
          .as("attributed_cents"))
      .orderBy(col("first_type"))
  }

  val qFirstTouchSql: String = """
    WITH tagged AS (
      SELECT user_id, value,
             first_value(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS first_type
      FROM events)
    SELECT first_type, count(DISTINCT user_id) AS n_users,
           count(*) AS n_events,
           sum(round(value * 100.0, 0)::BIGINT)::BIGINT AS attributed_cents
    FROM tagged GROUP BY first_type ORDER BY first_type"""

  /** A44: heavy hitters via sketch-then-verify — the E22 Misra-Gries
    * aggregate prunes an unbounded key space to ≤k candidates in ONE
    * pass with k-bounded state per task (no full groupBy over every
    * key), then an exact count over the broadcast candidate set
    * verifies. The MG guarantee (every item with freq > n/(k+1)
    * survives any merge order) makes the candidate set a superset of
    * the truth, so the verified output is EXACT and the plain-SQL
    * heavy-hitter query is its oracle — the LSH/MinHash two-phase
    * discipline applied to frequency. At 100 TB: the first pass
    * shuffles k-entry summaries (one per task), the verify pass
    * shuffles only candidate keys.
    */
  val HeavyHittersK = 124 // threshold = n/125 of the stream

  def qHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    // NULL user_ids are excluded on BOTH sides by construction: the MG
    // sketch skips nulls and the broadcast verify join drops them, but
    // SQL's GROUP BY would emit a NULL group — filter before counting
    // so threshold n and the oracle agree on nullable data
    val ev = Tables.events(s, dir)
      .filter(col("user_id").isNotNull).select(col("user_id"))
    val sketch = ev.agg(
      graft.functions.MisraGriesAgg(col("user_id"), HeavyHittersK).as("mg"),
      count(lit(1)).as("n"))
    val cand = sketch
      .select(explode(col("mg")).as("c"),
        expr(s"n div ${HeavyHittersK + 1}").as("thresh"))
      .select(col("c.item").as("user_id"), col("thresh"))
    ev.join(broadcast(cand), Seq("user_id"))
      .groupBy(col("user_id"), col("thresh"))
      .agg(count(lit(1)).as("freq"))
      .filter(col("freq") > col("thresh"))
      .select(col("user_id"), col("freq"))
      .orderBy(col("freq").desc, col("user_id"))
  }

  val qHeavyHittersSql: String = s"""
    SELECT user_id, count(*) AS freq
    FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    HAVING count(*) > (SELECT count(*) // ${HeavyHittersK + 1}
                       FROM events WHERE user_id IS NOT NULL)
    ORDER BY freq DESC, user_id"""

  /** A45: Count-Min point-frequency serving (E26) — the complement to
    * A44: Misra-Gries answers "which keys are frequent", the CM sketch
    * answers "how often is THIS key" for ANY key from d·w counters,
    * whatever the key cardinality. One aggregate pass builds the
    * 8·d·w-byte counter matrix (elementwise-add merge — order-free,
    * so the matrix is bit-identical under any partitioning and a
    * DuckDB oracle reproduces it exactly); serving collects it once
    * (8 KB — the D11 Bloom-words discipline) and estimates are pure
    * codegen min-of-d-lookups over the broadcast literal: no join, no
    * shuffle. The gate outputs est alongside the exact count for the
    * top-20 probe keys, so the hash-match VERIFIES both the CM
    * guarantee (est ≥ true, checkable in the overshoot column) and
    * the measured error — the strongest statement a sketch can make.
    */
  val CmDepth = 4
  val CmWidth = 256

  def qCountMin(s: SparkSession, dir: String): DataFrame = {
    // NULL keys excluded on both sides, as in A44
    val ev = graft.CachedFrames.persist(Tables.events(s, dir)
      .filter(col("user_id").isNotNull).select(col("user_id")))
    // bounded plan-time scalar: d·w longs = 8 KB however large the input
    val counters = ev
      .agg(graft.functions.CountMinAgg(col("user_id"), CmDepth, CmWidth)
        .as("cm"))
      .head().getSeq[Long](0).toArray
    val probes = ev.groupBy(col("user_id")).agg(count(lit(1)).as("true_cnt"))
      .orderBy(col("true_cnt").desc, col("user_id")).limit(20)
    probes
      .withColumn("cmarr", lit(counters))
      .withColumn("est_cnt", graft.functions.CountMinAgg.estimate(
        "cmarr", "user_id", CmDepth, CmWidth))
      .select(col("user_id"), col("true_cnt"), col("est_cnt"),
        (col("est_cnt") - col("true_cnt")).as("overshoot"))
      .orderBy(col("true_cnt").desc, col("user_id"))
  }

  val qCountMinSql: String = s"""
    WITH ev AS (SELECT user_id FROM events WHERE user_id IS NOT NULL),
    ctr AS (
      SELECT r, pos, count(*) AS c FROM (
        SELECT t.r AS r,
               ('0x' || substring(md5(t.r::VARCHAR || '-' ||
                 user_id::VARCHAR), 1, 7))::BIGINT % $CmWidth AS pos
        FROM ev CROSS JOIN range(1, ${CmDepth + 1}) t(r))
      GROUP BY r, pos),
    probes AS (
      SELECT user_id, count(*) AS true_cnt FROM ev GROUP BY user_id
      ORDER BY true_cnt DESC, user_id LIMIT 20),
    est AS (
      SELECT p.user_id, p.true_cnt, min(ctr.c) AS est_cnt
      FROM probes p
      CROSS JOIN range(1, ${CmDepth + 1}) t(r)
      JOIN ctr ON ctr.r = t.r
       AND ctr.pos = ('0x' || substring(md5(t.r::VARCHAR || '-' ||
             p.user_id::VARCHAR), 1, 7))::BIGINT % $CmWidth
      GROUP BY p.user_id, p.true_cnt)
    SELECT user_id, true_cnt, est_cnt, est_cnt - true_cnt AS overshoot
    FROM est ORDER BY true_cnt DESC, user_id"""

  /** A65: HyperLogLog distinct-count serving (E28) — the cardinality
    * rung that completes the sketch shelf: per event_type, m = 64
    * one-byte registers answer "how many distinct users" in constant
    * state however many users exist (KMV's k retained hashes answer
    * the same question in k·8 bytes; HLL is the production-standard
    * constant-byte form). The register array comes from one HllAgg
    * pass over the 60-bit md5-prefix hash (max-merge: order-free AND
    * idempotent, so replays don't move it); everything downstream is
    * derived arithmetic the oracle reproduces bit-for-bit — harmonic
    * sum as an exact BIGINT in 2^(55−rank) units, the α·m² factor as
    * one literal-parenthesized double chain (the D22 IEEE discipline,
    * no libm pow), and Flajolet's small-range linear-counting branch
    * m·ln(m/V) as a 63-entry literal table both engines share, so ln
    * never runs at query time. The two gate SFs land on OPPOSITE
    * branches (sf0.01: V=10 zero registers → linear counting; sf0.1:
    * V=0 → raw harmonic estimate), so both corrections are
    * hash-verified. n_exact rides along: the estimate's error is a
    * VERIFIED number, the A44/A45/D11 discipline.
    */
  val HllP = 6 // m = 64 registers
  /** round(m·ln(m/V)) for V = 1..63 — shared literal, both engines. */
  private val HllLcTable: IndexedSeq[Long] =
    (1 to 63).map(v => math.round(64.0 * math.log(64.0 / v)))

  def sketchHll(s: SparkSession, dir: String): DataFrame = {
    val lc = HllLcTable.mkString(",")
    Tables.events(s, dir)
      .filter(col("user_id").isNotNull)
      .select(col("event_type"), col("user_id"),
        graft.dedup.Shingling.h60(col("user_id").cast("string")).as("h"))
      .groupBy(col("event_type"))
      .agg(graft.functions.HllAgg(col("h"), HllP).as("regs"),
        countDistinct(col("user_id")).as("n_exact"))
      .withColumn("n_zero",
        expr("cast(size(filter(regs, r -> r = 0)) as bigint)"))
      .withColumn("harm_scaled", expr(
        "aggregate(regs, cast(0 as bigint), " +
          "(acc, r) -> acc + shiftleft(cast(1 as bigint), cast(55 - r as int)))"))
      .withColumn("est_raw", expr(
        "cast(round(((0.709d * 4096) * 36028797018963968.0) / harm_scaled) as bigint)"))
      .withColumn("est_hll",
        when(col("n_zero") > 0 && col("est_raw") <= 160,
          expr(s"element_at(array($lc), cast(n_zero as int))"))
          .otherwise(col("est_raw")))
      .select(col("event_type"), col("n_exact"), col("n_zero"),
        col("harm_scaled"), col("est_hll"))
      .orderBy(col("event_type"))
  }

  val sketchHllSql: String = {
    val lc = HllLcTable.mkString(",")
    s"""
    WITH ev AS (
      SELECT DISTINCT event_type,
             ('0x' || substring(md5(user_id::VARCHAR), 1, 15))::BIGINT AS h
      FROM events WHERE user_id IS NOT NULL),
    hits AS (
      SELECT event_type, (h >> 54) & 63 AS idx,
             max(CASE WHEN (h & 18014398509481983) = 0 THEN 55
                 ELSE 55 - length(bin(h & 18014398509481983)) END) AS reg
      FROM ev GROUP BY 1, 2),
    regs AS (
      SELECT t.event_type, r.i AS idx, coalesce(hi.reg, 0) AS reg
      FROM (SELECT DISTINCT event_type FROM ev) t
      CROSS JOIN range(0, 64) r(i)
      LEFT JOIN hits hi ON hi.event_type = t.event_type AND hi.idx = r.i),
    agg AS (
      SELECT event_type,
             sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END)::BIGINT AS n_zero,
             sum(1::BIGINT << (55 - reg)::INTEGER)::BIGINT AS harm_scaled
      FROM regs GROUP BY 1),
    ex AS (SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_exact
           FROM events WHERE user_id IS NOT NULL GROUP BY 1),
    est AS (
      SELECT event_type, n_zero, harm_scaled,
             CAST(round(((0.709::DOUBLE * 4096) * 36028797018963968.0)
                  / harm_scaled) AS BIGINT) AS est_raw
      FROM agg)
    SELECT e.event_type, x.n_exact, e.n_zero, e.harm_scaled,
           CASE WHEN e.n_zero > 0 AND e.est_raw <= 160
                THEN ([$lc])[e.n_zero::INTEGER]::BIGINT
                ELSE e.est_raw END AS est_hll
    FROM est e JOIN ex x ON x.event_type = e.event_type
    ORDER BY e.event_type"""
  }

  /** A66: experiment guardrail — Pearson χ² independence test between
    * the assignment arm (deterministic user_id parity) and the event
    * mix, the sample-ratio-mismatch check every A/B platform runs
    * before it trusts a lift number. The contingency table is one
    * map-side-combined count aggregate (|types|·2 cells however many
    * events); expected counts are exact rationals over BIGINT totals,
    * each cell's (O·N − r·c)²/(N·r·c) contribution is micro-quantized
    * PER CELL and the total is an order-free BIGINT sum — the D22
    * discipline, so no floating summation order anywhere. The df=4
    * critical value at α=0.05 (9.487729) ships as a literal; the gate
    * emits per-cell contributions AND the verdict, so a mismatch is
    * attributable to its cell.
    */
  def qAbChisq(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.events(s, dir)
      .filter(col("user_id").isNotNull)
      .groupBy(col("event_type"), (col("user_id") % 2).as("arm"))
      .agg(count(lit(1)).as("n_events"))
    // marginals and the grand total as windows over the CELL frame —
    // |types|·2 rows however many events, so the empty-partition
    // window is the A54 bounded-axis case, and no join (let alone a
    // cartesian scalar attach) appears anywhere in the plan
    val scored = cells
      .withColumn("r_tot", sum(col("n_events")).over(
        Window.partitionBy(col("event_type"))))
      .withColumn("c_tot", sum(col("n_events")).over(
        Window.partitionBy(col("arm"))))
      .withColumn("n_tot", sum(col("n_events")).over(
        Window.partitionBy()))
      .withColumn("chi_cell_micro", expr(
        "cast(round(((cast(n_events * n_tot - r_tot * c_tot as double) " +
          "* cast(n_events * n_tot - r_tot * c_tot as double)) " +
          "/ cast(n_tot * r_tot * c_tot as double)) * 1000000.0) as bigint)"))
    scored
      .withColumn("chi2_micro",
        sum(col("chi_cell_micro")).over(Window.partitionBy()))
      .withColumn("significant", col("chi2_micro") > 9487729L)
      .select(col("event_type"), col("arm"), col("n_events"),
        col("chi_cell_micro"), col("chi2_micro"), col("significant"))
      .orderBy(col("event_type"), col("arm"))
  }

  val qAbChisqSql: String = """
    WITH cells AS (
      SELECT event_type, user_id % 2 AS arm, count(*)::BIGINT AS n_events
      FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2),
    marg AS (
      SELECT event_type, arm, n_events,
             sum(n_events) OVER (PARTITION BY event_type)::BIGINT AS r_tot,
             sum(n_events) OVER (PARTITION BY arm)::BIGINT AS c_tot,
             sum(n_events) OVER ()::BIGINT AS n_tot
      FROM cells),
    scored AS (
      SELECT event_type, arm, n_events,
             CAST(round((((n_events * n_tot - r_tot * c_tot)::DOUBLE
               * (n_events * n_tot - r_tot * c_tot)::DOUBLE)
               / (n_tot * r_tot * c_tot)::DOUBLE) * 1000000.0)
               AS BIGINT) AS chi_cell_micro
      FROM marg)
    SELECT event_type, arm, n_events, chi_cell_micro,
           sum(chi_cell_micro) OVER ()::BIGINT AS chi2_micro,
           sum(chi_cell_micro) OVER ()::BIGINT > 9487729 AS significant
    FROM scored
    ORDER BY event_type, arm"""

  /** A70: U-shaped (position-based) multi-touch attribution — the
    * model between A43's first-touch ("all credit to discovery") and
    * last-touch: 40% to the first touch, 40% to the last, 20% split
    * across the middles. Exactness discipline: credits are integer
    * MICROS and the middle split uses explicit remainder assignment
    * (mid = 200000 div (n−2), remainder to the first middle), so
    * every user's credits sum to EXACTLY 10⁶ — a conservation law
    * the whole model rides, emitted per channel so the hash check
    * proves no micro leaked. Channel is the deterministic k%5 from
    * the A61-parsed props. One per-user window for position/count,
    * then one channel aggregate; the window partitions by user —
    * bounded by a user's touch count, never corpus-sized.
    */
  def qAttributionU(s: SparkSession, dir: String): DataFrame = {
    val touches = Tables.events(s, dir)
      .filter(col("event_type") === "click" && col("user_id").isNotNull)
      .select(col("user_id"), col("event_id"),
        (get_json_object(col("props"), "$.k").cast("long") % 5)
          .as("channel"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("event_id"))
    val pos = touches
      .withColumn("pos", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(col("user_id"))))
    val credited = pos.withColumn("credit_micro",
      when(col("n") === 1, lit(1000000L))
        .when(col("n") === 2, lit(500000L))
        .when(col("pos") === 1 || col("pos") === col("n"), lit(400000L))
        .otherwise(expr("200000 div (n - 2) + " +
          "CASE WHEN pos = 2 THEN 200000 % (n - 2) ELSE 0 END")))
    credited.groupBy(col("channel"))
      .agg(count(lit(1)).as("n_touches"),
        sum(col("credit_micro")).as("credit_micro"))
      .orderBy(col("channel"))
  }

  val qAttributionUSql: String = """
    WITH touches AS (
      SELECT user_id, event_id,
             (json_extract(props, '$.k')::BIGINT % 5) AS channel
      FROM events
      WHERE event_type = 'click' AND user_id IS NOT NULL),
    pos AS (
      SELECT user_id, event_id, channel,
             row_number() OVER (PARTITION BY user_id
               ORDER BY event_id) AS pos,
             count(*) OVER (PARTITION BY user_id) AS n
      FROM touches),
    credited AS (
      SELECT channel,
             CASE WHEN n = 1 THEN 1000000
                  WHEN n = 2 THEN 500000
                  WHEN pos = 1 OR pos = n THEN 400000
                  ELSE 200000 // (n - 2) +
                    CASE WHEN pos = 2 THEN 200000 % (n - 2) ELSE 0 END
             END AS credit_micro
      FROM pos)
    SELECT channel, count(*)::BIGINT AS n_touches,
           sum(credit_micro)::BIGINT AS credit_micro
    FROM credited GROUP BY 1 ORDER BY channel"""

  /** A69: DAU/WAU/MAU active-user grid — the product-analytics
    * staple, and the one sliding-window metric the window-function
    * family can't express: DISTINCT over a sliding range doesn't
    * decompose, so a per-day "distinct users in the trailing 7/28
    * days" is naively a per-day range self-join against the event
    * table (O(days·events)). The scalable re-expression: collapse to
    * the USER-DAY grain once (≪ event grain), then each active
    * (user, day) COVERS the windows ending on days d..d+6 (d..d+27) —
    * a bounded ×7/×28 explode of the small grain — and a distinct
    * count per window key finishes it. Stickiness = DAU/WAU in exact
    * integer micros. Every shuffle keys on (user, window) or
    * (window); nothing is ever per-day-times-corpus.
    */
  def qActiveUsers(s: SparkSession, dir: String): DataFrame = {
    val ud = graft.CachedFrames.persist(
      Tables.events(s, dir).filter(col("user_id").isNotNull)
        .select(col("user_id"), to_date(col("ts")).as("d")).distinct())
    def windowed(days: Int, name: String): DataFrame = ud
      .select(col("user_id"),
        explode(expr(s"sequence(0, ${days - 1})")).as("i"), col("d"))
      .select(col("user_id"), expr("date_add(d, i)").as("w"))
      .distinct()
      .groupBy(col("w")).agg(count(lit(1)).as(name))
    val dau = ud.groupBy(col("d")).agg(count(lit(1)).as("dau"))
    dau
      .join(windowed(7, "wau").withColumnRenamed("w", "d"), Seq("d"))
      .join(windowed(28, "mau").withColumnRenamed("w", "d"), Seq("d"))
      .withColumn("stickiness_micro", expr("dau * 1000000 div wau"))
      .select(col("d"), col("dau"), col("wau"), col("mau"),
        col("stickiness_micro"))
      .orderBy(col("d"))
  }

  val qActiveUsersSql: String = """
    WITH ud AS (
      SELECT DISTINCT user_id, ts::DATE AS d
      FROM events WHERE user_id IS NOT NULL),
    dau AS (SELECT d, count(*)::BIGINT AS dau FROM ud GROUP BY 1),
    wau AS (
      SELECT w, count(*)::BIGINT AS wau FROM (
        SELECT DISTINCT user_id, d + i::INTEGER AS w
        FROM (SELECT user_id, d, unnest(range(0, 7)) AS i FROM ud))
      GROUP BY 1),
    mau AS (
      SELECT w, count(*)::BIGINT AS mau FROM (
        SELECT DISTINCT user_id, d + i::INTEGER AS w
        FROM (SELECT user_id, d, unnest(range(0, 28)) AS i FROM ud))
      GROUP BY 1)
    SELECT d, dau, wau, mau, dau * 1000000 // wau AS stickiness_micro
    FROM dau JOIN wau ON wau.w = dau.d JOIN mau ON mau.w = dau.d
    ORDER BY d"""

  /** A68: robust outlier fence — median/MAD, the robust-statistics
    * complement to A28's moment aggregates (one fat-fingered 10⁹ value
    * moves a mean/stddev fence arbitrarily; the median and the median
    * absolute deviation have breakdown point ½). Exactness trick: on
    * per-row micro-quantized BIGINTs, the 0.5-interpolated percentile
    * is (a+b)/2 — EXACT in a double for 2⁵³-bounded ints — so med2 =
    * 2·median and mad4 = 2·median(|2v − med2|) are exact integers in
    * both engines, and the fence |v − med| > 3·MAD becomes the
    * integer predicate 2·dev2 > 3·mad4 (the ×2/×4 scalings cancel):
    * no float comparison anywhere, no ulp-at-the-fence hazard. Two
    * aggregate passes + two broadcast joins of a |types|-row frame.
    */
  def qOutliersMad(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        round(col("value") * 1000000.0, 0).cast("long").as("v"))
    val med = ev.groupBy(col("event_type"))
      .agg((percentile(col("v"), lit(0.5)) * 2).cast("long").as("med2"))
    val dev = ev.join(broadcast(med), Seq("event_type"))
      .withColumn("dev2", abs(lit(2) * col("v") - col("med2")))
    val mad = dev.groupBy(col("event_type"))
      .agg((percentile(col("dev2"), lit(0.5)) * 2).cast("long").as("mad4"))
    dev.join(broadcast(mad), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        min(col("med2")).as("med_micro_x2"),
        min(col("mad4")).as("mad_micro_x4"),
        sum(when(lit(2) * col("dev2") > lit(3) * col("mad4"), 1L)
          .otherwise(0L)).as("n_outliers"))
      .orderBy(col("event_type"))
  }

  val qOutliersMadSql: String = """
    WITH ev AS (
      SELECT event_type, round(value * 1000000.0, 0)::BIGINT AS v
      FROM events WHERE value IS NOT NULL),
    med AS (
      SELECT event_type, CAST(quantile_cont(v, 0.5) * 2 AS BIGINT) AS med2
      FROM ev GROUP BY 1),
    dev AS (
      SELECT e.event_type, abs(2 * e.v - m.med2) AS dev2, m.med2
      FROM ev e JOIN med m USING (event_type)),
    mad AS (
      SELECT event_type, CAST(quantile_cont(dev2, 0.5) * 2 AS BIGINT) AS mad4
      FROM dev GROUP BY 1)
    SELECT d.event_type, count(*)::BIGINT AS n,
           min(d.med2)::BIGINT AS med_micro_x2,
           min(a.mad4)::BIGINT AS mad_micro_x4,
           sum(CASE WHEN 2 * d.dev2 > 3 * a.mad4 THEN 1 ELSE 0 END)::BIGINT
             AS n_outliers
    FROM dev d JOIN mad a USING (event_type)
    GROUP BY 1 ORDER BY 1"""

  /** A67: per-group least-squares trend — the slope every dashboard
    * fits ("is this brand's revenue growing?") as ONE aggregation
    * pass, no iteration: the closed-form OLS slope needs only the
    * moment sums Σx, Σy, Σxy, Σx², all exact BIGINTs here (x = month
    * index from a calendar epoch, y = monthly revenue in integer
    * cents via the q10 per-row quantization), so `n·Σxy − Σx·Σy` and
    * `n·Σx² − (Σx)²` are EXACT integers (bounded: x ≤ ~10³ months,
    * y ≤ ~10¹¹ cents/month keeps the products under 2⁶³) and the one
    * double division at the end is IEEE-deterministic, rounded 6dp in
    * both engines. Two grains, both bounded: (brand, month) then
    * brand — the moment-sum shape scales to any row count because the
    * exchange only ever carries the five sums.
    */
  def qTrendSlope(s: SparkSession, dir: String): DataFrame = {
    val monthly = Tables.lineitem(s, dir)
      .join(Tables.part(s, dir).select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"),
        ((year(col("l_shipdate")) - 1992) * 12 + month(col("l_shipdate")) - 1)
          .cast("long").as("x"))
      .agg(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        * 100.0, 0).cast("long")).as("y"))
    monthly.groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_months"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .withColumn("slope_cents_per_month", expr(
        "round((n_months * sxy - sx * sy) / (n_months * sxx - sx * sx), 6)"))
      .withColumn("intercept_cents", expr(
        "round((sy * sxx - sx * sxy) / (n_months * sxx - sx * sx), 6)"))
      .select(col("p_brand"), col("n_months"),
        col("slope_cents_per_month"), col("intercept_cents"))
      .orderBy(col("p_brand"))
  }

  val qTrendSlopeSql: String = """
    WITH monthly AS (
      SELECT p.p_brand,
             ((year(l.l_shipdate) - 1992) * 12
               + month(l.l_shipdate) - 1)::BIGINT AS x,
             sum(round(l.l_extendedprice * (1.0 - l.l_discount) * 100.0,
                 0)::BIGINT)::BIGINT AS y
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2),
    moments AS (
      SELECT p_brand, count(*)::BIGINT AS n_months,
             sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
             sum(x * y)::BIGINT AS sxy, sum(x * x)::BIGINT AS sxx
      FROM monthly GROUP BY 1)
    SELECT p_brand, n_months,
           round((n_months * sxy - sx * sy)
                 / (n_months * sxx - sx * sx), 6) AS slope_cents_per_month,
           round((sy * sxx - sx * sxy)
                 / (n_months * sxx - sx * sx), 6) AS intercept_cents
    FROM moments ORDER BY p_brand"""

  /** A54: sweep-line peak concurrency — the classic interval-overlap
    * question ("how many orders were in flight at once?") answered
    * without an interval self-join. An order is OPEN from its order
    * date until the last shipment of its lines; a naive overlap count
    * is a range self-join (O(n²) pairs at 100 TB). The sweep-line
    * re-expression is two narrow passes: every interval becomes a
    * (+1 at open, −1 at close+1) delta, deltas aggregate to the DAY
    * grain — after which the axis is bounded by the CALENDAR, not the
    * data (seven years ≈ 2.6k rows whether the input is 60k orders or
    * 60 billion) — and one running sum over that bounded axis is the
    * concurrency timeline. The single-partition ordered window is
    * deliberate and safe for exactly that reason (the A32/P4 trap is a
    * global window over DATA-sized input; this one is calendar-sized).
    * Reported at the month grain: peak open orders + the first day the
    * peak is reached. Cross-engine: pure integer counts end to end.
    */
  def qConcurrency(s: SparkSession, dir: String): DataFrame = {
    val closes = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(max(to_date(col("l_shipdate"))).as("close_d"))
    val iv = Tables.orders(s, dir)
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("open_d"))
      .join(closes, Seq("o_orderkey"))
    val deltas = iv.select(explode(array(
        struct(col("open_d").as("d"), lit(1L).as("delta")),
        struct(date_add(col("close_d"), 1).as("d"), lit(-1L).as("delta"))))
        .as("e"))
      .groupBy(col("e.d").as("d"))
      .agg(sum(col("e.delta")).as("delta"))
    val timeline = deltas
      .withColumn("open_cnt",
        sum(col("delta")).over(Window.orderBy(col("d"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    timeline
      .groupBy(date_format(col("d"), "yyyy-MM").as("ym"))
      .agg(max(col("open_cnt")).as("peak_open"),
        min_by(col("d"), struct(col("open_cnt") * -1, col("d")))
          .as("peak_day"))
      .orderBy(col("ym"))
  }

  val qConcurrencySql: String = """
    WITH closes AS (
      SELECT l_orderkey AS o_orderkey, max(l_shipdate::DATE) AS close_d
      FROM lineitem GROUP BY 1),
    iv AS (
      SELECT o_orderdate::DATE AS open_d, close_d
      FROM orders JOIN closes USING (o_orderkey)),
    deltas AS (
      SELECT d, sum(delta)::BIGINT AS delta FROM (
        SELECT open_d AS d, 1 AS delta FROM iv
        UNION ALL
        SELECT close_d + 1, -1 FROM iv)
      GROUP BY d),
    timeline AS (
      SELECT d, sum(delta) OVER (ORDER BY d
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS open_cnt
      FROM deltas),
    monthly AS (
      SELECT strftime(d, '%Y-%m') AS ym, d, open_cnt,
             max(open_cnt) OVER (PARTITION BY strftime(d, '%Y-%m'))
               AS peak_open
      FROM timeline)
    SELECT ym, peak_open::BIGINT AS peak_open, min(d) AS peak_day
    FROM monthly WHERE open_cnt = peak_open
    GROUP BY ym, peak_open ORDER BY ym"""

  /** A55: revenue-concentration curve — per-nation top-decile share
    * and trapezoid Gini over the customer revenue distribution (the
    * "how skewed is this market" operator; its answer also prices the
    * A34 salting decision). Shape: one fact aggregate to customer
    * grain, dims broadcast, then ntile(10) windows partitioned BY
    * NATION — parallel across nations, never a global sort. The Gini
    * integrates the Lorenz curve over the TEN decile aggregates, so
    * the final arithmetic touches 10 bounded values per nation.
    * Cross-engine exactness: revenue quantizes to integer cents once
    * per line; decile sums/cumulative sums are exact BIGINTs; the two
    * reported ratios are single integer floor-divisions of positive
    * BIGINTs (Spark `div` = DuckDB `//` on positives; no negative
    * floor-vs-truncate hazard). Overflow bound: lorenz_sum·1e5 ≤
    * 2·10·total_cents·1e5 — total revenue per nation must stay under
    * ~4.6e12 dollars, comfortably true at 100 TB grain; past that the
    * one scalar multiply moves to DECIMAL(38,0).
    */
  def qLorenz(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(round(disc * 100.0, 0).cast("long")).as("rev_cents"))
    val byNation = rev
      .join(broadcast(Tables.customer(s, dir)
          .select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
    val w = Window.partitionBy(col("n_name"))
      .orderBy(col("rev_cents"), col("c_custkey"))
    val deciles = byNation
      .withColumn("decile", ntile(10).over(w))
      .groupBy(col("n_name"), col("decile"))
      .agg(sum(col("rev_cents")).as("dec_cents"),
        count(lit(1)).as("dec_n"))
    val wd = Window.partitionBy(col("n_name")).orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deciles
      .withColumn("cum_cents", sum(col("dec_cents")).over(wd))
      .groupBy(col("n_name"))
      .agg(sum(col("dec_n")).as("n_cust"),
        max(col("cum_cents")).as("revenue_cents"),
        // top decile = total − cumulative through decile 9
        (max(col("cum_cents")) -
          max(when(col("decile") === 9, col("cum_cents")))).as("top_cents"),
        // trapezoid ∫Lorenz: Σ_d (cum_{d-1} + cum_d) with cum_0 = 0
        (sum(col("cum_cents")) * 2 - max(col("cum_cents")))
          .as("lorenz_sum"))
      .select(col("n_name"), col("n_cust"), col("revenue_cents"),
        expr("top_cents * 1000000 div revenue_cents")
          .as("top_decile_share_micro"),
        expr("1000000 - (lorenz_sum * 100000 div revenue_cents)")
          .as("gini_micro"))
      .orderBy(col("n_name"))
  }

  val qLorenzSql: String = """
    WITH rev AS (
      SELECT o_custkey,
             sum(round(l_extendedprice * (1.0 - l_discount) * 100.0,
               0)::BIGINT)::BIGINT AS rev_cents
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_custkey),
    tagged AS (
      SELECT n_name, c_custkey, rev_cents,
             ntile(10) OVER (PARTITION BY n_name
               ORDER BY rev_cents, c_custkey) AS decile
      FROM rev JOIN customer ON o_custkey = c_custkey
               JOIN nation ON c_nationkey = n_nationkey),
    deciles AS (
      SELECT n_name, decile, sum(rev_cents)::BIGINT AS dec_cents,
             count(*) AS dec_n
      FROM tagged GROUP BY n_name, decile),
    cum AS (
      SELECT n_name, decile, dec_n, dec_cents,
             sum(dec_cents) OVER (PARTITION BY n_name ORDER BY decile
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
               AS cum_cents
      FROM deciles)
    SELECT n_name, sum(dec_n)::BIGINT AS n_cust,
           max(cum_cents)::BIGINT AS revenue_cents,
           ((max(cum_cents) - max(CASE WHEN decile = 9 THEN cum_cents END))
             * 1000000 // max(cum_cents))::BIGINT AS top_decile_share_micro,
           (1000000 - ((sum(cum_cents) * 2 - max(cum_cents))
             * 100000 // max(cum_cents)))::BIGINT AS gini_micro
    FROM cum GROUP BY n_name ORDER BY n_name"""

  /** A56: calendar-aligned year-over-year comparison — the BI staple
    * row-lag windows get WRONG: lag(12) over observed months silently
    * misaligns the moment any month is missing from the data, so the
    * correct form is a self-join on the shifted CALENDAR key (month =
    * month, year = year−1), which also parallelizes as a plain
    * shuffle join instead of an ordered window. Both sides are the
    * same tiny month-grain aggregate (bounded by the calendar — the
    * A54 axis argument), revenue quantizes to integer cents once per
    * line, and the emitted comparison is delta (exact subtraction)
    * plus a POSITIVE-only ratio in basis points — `rev·10⁴ div prev`
    * — because a signed growth division would hit the Spark
    * truncate-vs-DuckDB-floor divide divergence on negatives.
    */
  def qYoy(s: SparkSession, dir: String): DataFrame = {
    val monthly = Tables.lineitem(s, dir)
      .groupBy(year(col("l_shipdate")).as("y"),
        month(col("l_shipdate")).as("m"))
      .agg(sum(round(disc * 100.0, 0).cast("long")).as("revenue_cents"))
    val prev = monthly.select((col("y") + 1).as("y"), col("m"),
      col("revenue_cents").as("prev_year_cents"))
    monthly.join(prev, Seq("y", "m"))
      .select(
        format_string("%04d-%02d", col("y"), col("m")).as("ym"),
        col("revenue_cents"), col("prev_year_cents"),
        (col("revenue_cents") - col("prev_year_cents")).as("delta_cents"),
        expr("revenue_cents * 10000 div prev_year_cents")
          .as("yoy_ratio_bps"))
      .orderBy(col("ym"))
  }

  val qYoySql: String = """
    WITH monthly AS (
      SELECT year(l_shipdate) AS y, month(l_shipdate) AS m,
             sum(round(l_extendedprice * (1.0 - l_discount) * 100.0,
               0)::BIGINT)::BIGINT AS revenue_cents
      FROM lineitem GROUP BY y, m)
    SELECT printf('%04d-%02d', a.y, a.m) AS ym,
           a.revenue_cents, b.revenue_cents AS prev_year_cents,
           a.revenue_cents - b.revenue_cents AS delta_cents,
           (a.revenue_cents * 10000 // b.revenue_cents)::BIGINT
             AS yoy_ratio_bps
    FROM monthly a JOIN monthly b ON a.y = b.y + 1 AND a.m = b.m
    ORDER BY ym"""

  /** A57: cumulative distinct users per day — "total unique users to
    * date", the growth-curve staple. The naive statement (COUNT
    * DISTINCT over an expanding window) re-scans every prior day per
    * day — O(days²) state and quadratic work, the reason most engines
    * refuse it. The re-expression: cumulative-distinct ≡ running sum
    * of FIRST APPEARANCES — one per-user min() aggregate (map-side
    * combinable, shuffles user ids once), a day-grain count, and a
    * prefix sum over the calendar-bounded axis (the A54 argument:
    * ~2.6k rows whether the stream is 60k or 60B events). Every day
    * in the span is emitted — a day with no new users still advances
    * the curve — via the A31 gap-fill axis.
    */
  def qCumulativeUsers(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val firsts = e.groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("d"))
      .groupBy(col("d")).agg(count(lit(1)).as("n_new"))
    val bounds = e.agg(min(to_date(col("ts"))).as("d0"),
      max(to_date(col("ts"))).as("d1")).head()
    val axis =
      if (bounds.isNullAt(0))
        s.range(0).select(lit(null).cast("date").as("d"))
      else s.range(1).select(explode(sequence(
        lit(bounds.getDate(0)), lit(bounds.getDate(1)))).as("d"))
    axis.join(firsts, Seq("d"), "left")
      .select(col("d"), coalesce(col("n_new"), lit(0L)).as("n_new"))
      .withColumn("cum_users",
        sum(col("n_new")).over(Window.orderBy(col("d"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy(col("d"))
  }

  val qCumulativeUsersSql: String = """
    WITH firsts AS (
      SELECT d, count(*) AS n_new FROM (
        SELECT user_id, min(ts::DATE) AS d FROM events GROUP BY user_id)
      GROUP BY d),
    bounds AS (SELECT min(ts::DATE) AS d0, max(ts::DATE) AS d1 FROM events),
    axis AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE
               AS d FROM bounds)
    SELECT d, coalesce(n_new, 0)::BIGINT AS n_new,
           sum(coalesce(n_new, 0)) OVER (ORDER BY d
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
             AS cum_users
    FROM axis LEFT JOIN firsts USING (d) ORDER BY d"""

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cumulative_users" -> (qCumulativeUsers _),
    "q_range_frame" -> (qRangeFrame _),
    "q_time_to_convert" -> (qTimeToConvert _),
    "q_basket_lift" -> (qBasketLift _),
    "q_json_extract" -> (qJsonExtract _),
    "q_unpivot" -> (qUnpivot _),
    "q_skew_diagnose" -> (qSkewDiagnose _),
    "q_funnel_windowed" -> (qFunnelWindowed _),
    "q_yoy" -> (qYoy _),
    "q_heavy_hitters" -> (qHeavyHitters _),
    "sketch_countmin" -> (qCountMin _),
    "sketch_hll" -> (sketchHll _),
    "q_ab_chisq" -> (qAbChisq _),
    "q_outliers_mad" -> (qOutliersMad _),
    "q_active_users" -> (qActiveUsers _),
    "q_attribution_u" -> (qAttributionU _),
    "q_trend_slope" -> (qTrendSlope _),
    "sketch_quantiles" -> (qSketchQuantiles _),
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q_scan_pushdown" -> (qScanPushdown _),
    "q3_shipping" -> (q3Shipping _),
    "q5_local_supplier" -> (q5LocalSupplier _),
    "q_semi_anti" -> (qSemiAnti _),
    "q_window_topn" -> (qWindowTopn _),
    "q_distinct" -> (qDistinct _),
    "q_topk_revenue" -> (qTopkRevenue _),
    "q_events_hourly" -> (qEventsMinutely _),
    "q_skew_join" -> (qSkewJoin _),
    "q7_volume_shipping" -> (q7VolumeShipping _),
    "q8_market_share" -> (q8MarketShare _),
    "q9_profit" -> (q9Profit _),
    "q2_min_cost_supplier" -> (q2MinCostSupplier _),
    "q20_excess_suppliers" -> (q20ExcessSuppliers _),
    "q_distribution_windows" -> (qDistributionWindows _),
    "q_transitions" -> (qTransitions _),
    "q11_important_parts" -> (q11ImportantParts _),
    "q16_part_suppliers" -> (q16PartSuppliers _),
    "q10_returned_items" -> (q10ReturnedItems _),
    "q12_ship_delay" -> (q12ShipDelay _),
    "q15_top_supplier" -> (q15TopSupplier _),
    "q21_late_suppliers" -> (q21LateSuppliers _),
    "q_moving_avg" -> (qMovingAvg _),
    "q_lag_delta" -> (qLagDelta _),
    "q_first_touch" -> (qFirstTouch _),
    "q_sessionize" -> (qSessionize _),
    "q_asof_join" -> (qAsofJoin _),
    "q_range_join" -> (qRangeJoin _),
    "q6_forecast" -> (q6Forecast _),
    "q14_promo" -> (q14Promo _),
    "q18_volume" -> (q18Volume _),
    "q_rollup" -> (qRollup _),
    "q4_order_priority" -> (q4OrderPriority _),
    "q13_custdist" -> (q13Custdist _),
    "q19_disjunctive" -> (q19Disjunctive _),
    "q17_small_qty" -> (q17SmallQty _),
    "q22_global" -> (q22Global _),
    "q_percentiles" -> (qPercentiles _),
    "q_pivot" -> (qPivot _),
    "q_setops" -> (qSetops _),
    "q_topk_per_group" -> (qTopkPerGroup _),
    "q_funnel" -> (qFunnel _),
    "q_cohort" -> (qCohort _),
    "q_stats" -> (qStats _),
    "q_histogram" -> (qHistogram _),
    "q_full_outer" -> (qFullOuter _),
    "q_gapfill" -> (qGapfill _),
    "q_locf" -> (qLocf _),
    "q_grouping_sets" -> (qGroupingSets _),
    "q_concurrency" -> (qConcurrency _),
    "q_lorenz" -> (qLorenz _))

  def oracles: Map[String, String] = Map(
    "q_cumulative_users" -> qCumulativeUsersSql,
    "q_range_frame" -> qRangeFrameSql,
    "q_time_to_convert" -> qTimeToConvertSql,
    "q_basket_lift" -> qBasketLiftSql,
    "q_json_extract" -> qJsonExtractSql,
    "q_unpivot" -> qUnpivotSql,
    "q_skew_diagnose" -> qSkewDiagnoseSql,
    "q_funnel_windowed" -> qFunnelWindowedSql,
    "q_yoy" -> qYoySql,
    "q_heavy_hitters" -> qHeavyHittersSql,
    "sketch_countmin" -> qCountMinSql,
    "sketch_hll" -> sketchHllSql,
    "q_ab_chisq" -> qAbChisqSql,
    "q_outliers_mad" -> qOutliersMadSql,
    "q_active_users" -> qActiveUsersSql,
    "q_attribution_u" -> qAttributionUSql,
    "q_trend_slope" -> qTrendSlopeSql,
    "sketch_quantiles" -> qSketchQuantilesSql,
    "q1_pricing_summary" -> q1PricingSummarySql,
    "q_scan_pushdown" -> qScanPushdownSql,
    "q3_shipping" -> q3ShippingSql,
    "q5_local_supplier" -> q5LocalSupplierSql,
    "q_semi_anti" -> qSemiAntiSql,
    "q_window_topn" -> qWindowTopnSql,
    "q_distinct" -> qDistinctSql,
    "q_topk_revenue" -> qTopkRevenueSql,
    "q_events_hourly" -> qEventsMinutelySql,
    "q_skew_join" -> qSkewJoinSql,
    "q7_volume_shipping" -> q7VolumeShippingSql,
    "q8_market_share" -> q8MarketShareSql,
    "q9_profit" -> q9ProfitSql,
    "q2_min_cost_supplier" -> q2MinCostSupplierSql,
    "q20_excess_suppliers" -> q20ExcessSuppliersSql,
    "q_distribution_windows" -> qDistributionWindowsSql,
    "q_transitions" -> qTransitionsSql,
    "q11_important_parts" -> q11ImportantPartsSql,
    "q16_part_suppliers" -> q16PartSuppliersSql,
    "q10_returned_items" -> q10ReturnedItemsSql,
    "q12_ship_delay" -> q12ShipDelaySql,
    "q15_top_supplier" -> q15TopSupplierSql,
    "q21_late_suppliers" -> q21LateSuppliersSql,
    "q_moving_avg" -> qMovingAvgSql,
    "q_lag_delta" -> qLagDeltaSql,
    "q_first_touch" -> qFirstTouchSql,
    "q_sessionize" -> qSessionizeSql,
    "q_asof_join" -> qAsofJoinSql,
    "q_range_join" -> qRangeJoinSql,
    "q6_forecast" -> q6ForecastSql,
    "q14_promo" -> q14PromoSql,
    "q18_volume" -> q18VolumeSql,
    "q_rollup" -> qRollupSql,
    "q4_order_priority" -> q4OrderPrioritySql,
    "q13_custdist" -> q13CustdistSql,
    "q19_disjunctive" -> q19DisjunctiveSql,
    "q17_small_qty" -> q17SmallQtySql,
    "q22_global" -> q22GlobalSql,
    "q_percentiles" -> qPercentilesSql,
    "q_pivot" -> qPivotSql,
    "q_setops" -> qSetopsSql,
    "q_topk_per_group" -> qTopkPerGroupSql,
    "q_funnel" -> qFunnelSql,
    "q_cohort" -> qCohortSql,
    "q_stats" -> qStatsSql,
    "q_histogram" -> qHistogramSql,
    "q_full_outer" -> qFullOuterSql,
    "q_gapfill" -> qGapfillSql,
    "q_locf" -> qLocfSql,
    "q_grouping_sets" -> qGroupingSetsSql,
    "q_concurrency" -> qConcurrencySql,
    "q_lorenz" -> qLorenzSql)
}
