package graft.analytics

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational analytics over the tape-archive test tables (SURVEY §2.2).
  *
  * Every query here is declarative DataFrame code — Catalyst gets a full
  * logical plan (filter/projection pushdown to parquet, broadcast joins
  * for dims, partial aggregation) with no RDD/closure black boxes.
  * Double-valued aggregates are rounded in BOTH engines so that
  * summation-order differences (Spark partial aggs vs DuckDB) cannot
  * flip the hash compare.
  */
object AnalyticsQueries {

  /** A2/TPC-H Q1 style pricing summary: hash agg with map-side combine. */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
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

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (q1PricingSummary _)
  )

  def oracles: Map[String, String] = Map(
    "q1_pricing_summary" -> q1PricingSummarySql
  )
}
