package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Aggregation queries: whole-table + grouped aggregation.
  *
  * Reference semantics: /root/reference/stupidb/api.py:450 `aggregate`,
  * :563 `group_by`, and the associative aggregates in
  * /root/reference/stupidb/functions/associative/__init__.py (Count, Sum,
  * Total, Mean, Min, Max, variance/covariance sample+population).
  *
  * Spark-first: `groupBy(...).agg(...)` compiles to a partial (map-side)
  * hash aggregate + final aggregate after a shuffle on the group keys —
  * the plan that scales to 100 TB. Sums over money-like doubles are
  * computed on DECIMAL(18,4) so the result is exact and order-independent,
  * making the DuckDB oracle comparison bit-stable.
  */
object Agg {
  private def dec(c: String) = col(c).cast("decimal(18,4)")

  /** TPC-H Q1-shaped pricing summary — the flagship query. */
  def qTpch1(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec("l_quantity")).cast("double").as("sum_qty"),
        sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
        sum((dec("l_extendedprice") * (lit(1).cast("decimal(18,4)") - dec("l_discount")))
          .cast("decimal(18,8)")).cast("double").as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val tpch1Oracle: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,8))) AS DOUBLE) AS sum_disc_price,
      |  ROUND(AVG(l_quantity), 4) AS avg_qty,
      |  ROUND(AVG(l_discount), 4) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tpch1" -> (qTpch1 _)
  )

  def oracles: Map[String, String] = Map(
    "q_tpch1" -> tpch1Oracle
  )
}
