package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** TPC-H-shaped headline queries — the bench workload (SURVEY.md §6).
  *
  * These exercise multi-way joins + aggregation the way a production
  * workload would. Scale posture: dimension tables (region, nation,
  * customer, supplier) carry explicit `broadcast()` hints — at 100 TB the
  * fact tables (lineitem, orders) shuffle on their join keys once and all
  * dim joins are map-side. Revenue sums are DECIMAL for oracle exactness.
  */
object Tpch {

  private def dec(c: String) = col(c).cast("decimal(18,4)")
  private def revenue: org.apache.spark.sql.Column =
    (dec("l_extendedprice") * (lit(1).cast("decimal(18,4)") - dec("l_discount")))
      .cast("decimal(18,8)")

  /** Q3: shipping priority — join customer⋈orders⋈lineitem, top revenue. */
  def qTpch3(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).where(col("l_shipdate") > to_timestamp(lit("1995-03-15")))
      .join(
        Tables.orders(s, d).where(col("o_orderdate") < to_timestamp(lit("1995-03-15"))),
        col("l_orderkey") === col("o_orderkey"))
      .join(
        broadcast(Tables.customer(s, d).where(col("c_mktsegment") === "BUILDING")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(revenue).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)

  /** Q5: local supplier volume — 6-way join, one fact shuffle, dims broadcast. */
  def qTpch5(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d)
        .where(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
               col("o_orderdate") < to_timestamp(lit("1997-01-01"))),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.customer(s, d)),
        col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d).where(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(revenue).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))

  /** Q6: forecast revenue — selective scan, filters must push to parquet. */
  def qTpch6(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .where(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
             col("l_shipdate") < to_timestamp(lit("1997-01-01")) &&
             col("l_discount") >= 0.04 && col("l_discount") <= 0.06 &&
             col("l_quantity") < 24.0)
      .agg(sum((dec("l_extendedprice") * dec("l_discount")).cast("decimal(18,8)"))
        .cast("double").as("revenue"))

  /** Q10: returned-item report — join + group + top 20 by lost revenue. */
  def qTpch10(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).where(col("l_returnflag") === "R")
      .join(Tables.orders(s, d)
        .where(col("o_orderdate") >= to_timestamp(lit("1995-10-01")) &&
               col("o_orderdate") < to_timestamp(lit("1996-01-01"))),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(sum(revenue).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  /** Q14: promotion effect — selective fact scan ⋈ broadcast part dim,
    * conditional aggregate ratio. */
  def qTpch14(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .where(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
             col("l_shipdate") < to_timestamp(lit("1996-07-01")))
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .agg(round(
        sum(when(col("p_type") === "PROMO", revenue)
          .otherwise(lit(0).cast("decimal(18,8)"))).cast("double") * 100.0 /
          sum(revenue).cast("double"), 6).as("promo_revenue"))

  /** Q18: large-volume customers — aggregate-then-join with a HAVING
    * threshold; the heavy groupBy runs on the fact before any join. */
  def qTpch18(s: SparkSession, d: String): DataFrame = {
    val bigOrders = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(dec("l_quantity")).cast("double").as("sum_qty"))
      .where(col("sum_qty") > 300.0)
    Tables.orders(s, d)
      .join(bigOrders, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
  }

  /** Q2-shaped: correlated SCALAR subquery against an aggregate —
    * "suppliers offering each small part at its corpus-minimum price"
    * (the testdata has no partsupp, so lineitem plays the
    * part-supplier cost relation). Declared as SQL so Catalyst's
    * RewriteCorrelatedScalarSubquery decorrelates it: the optimized
    * plan is a per-part min aggregate joined back to the fact —
    * exactly the plan you'd hand-write, one fact shuffle, no per-row
    * subquery execution anywhere. */
  def qTpch2(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    Tables.part(s, d).createOrReplaceTempView("part")
    Tables.supplier(s, d).createOrReplaceTempView("supplier")
    s.sql("""
      SELECT DISTINCT p_partkey, p_name, s_suppkey, s_name,
        l_extendedprice AS min_price
      FROM lineitem l
      JOIN part ON p_partkey = l.l_partkey
      JOIN supplier ON s_suppkey = l.l_suppkey
      WHERE p_size <= 5
        AND l_extendedprice = (SELECT MIN(l2.l_extendedprice)
                               FROM lineitem l2
                               WHERE l2.l_partkey = l.l_partkey)
      ORDER BY p_partkey, s_suppkey""")
  }

  /** Q21-shaped: EXISTS + NOT EXISTS correlated subqueries —
    * "suppliers who were the ONLY supplier with a returned line on a
    * multi-supplier finished order" (l_returnflag = 'R' stands in for
    * Q21's receipt-after-commit lateness; the testdata has no
    * receipt/commit dates). Catalyst decorrelates EXISTS into a
    * left-semi and NOT EXISTS into a left-anti join on l_orderkey —
    * both shuffle-on-key, no nested-loop anywhere. */
  def qTpch21(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    Tables.orders(s, d).createOrReplaceTempView("orders")
    Tables.supplier(s, d).createOrReplaceTempView("supplier")
    s.sql("""
      SELECT s_name, COUNT(*) AS numwait
      FROM lineitem l1
      JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
      JOIN supplier ON s_suppkey = l1.l_suppkey
      WHERE l1.l_returnflag = 'R'
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_returnflag = 'R')
      GROUP BY s_name
      ORDER BY numwait DESC, s_name""")
  }

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tpch2" -> (qTpch2 _),
    "q_tpch21" -> (qTpch21 _),
    "q_tpch3" -> (qTpch3 _),
    "q_tpch5" -> (qTpch5 _),
    "q_tpch6" -> (qTpch6 _),
    "q_tpch10" -> (qTpch10 _),
    "q_tpch14" -> (qTpch14 _),
    "q_tpch18" -> (qTpch18 _))

  private val revSql =
    "SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,8)))"

  def oracles: Map[String, String] = Map(
    "q_tpch2" ->
      """SELECT DISTINCT p_partkey, p_name, s_suppkey, s_name,
        |  l_extendedprice AS min_price
        |FROM lineitem l
        |JOIN part ON p_partkey = l.l_partkey
        |JOIN supplier ON s_suppkey = l.l_suppkey
        |WHERE p_size <= 5
        |  AND l_extendedprice = (SELECT MIN(l2.l_extendedprice)
        |                         FROM lineitem l2
        |                         WHERE l2.l_partkey = l.l_partkey)
        |ORDER BY p_partkey, s_suppkey""".stripMargin,
    "q_tpch21" ->
      """SELECT s_name, COUNT(*) AS numwait
        |FROM lineitem l1
        |JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
        |JOIN supplier ON s_suppkey = l1.l_suppkey
        |WHERE l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name""".stripMargin,
    "q_tpch3" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
         |  CAST($revSql AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE l_shipdate > TIMESTAMP '1995-03-15'
         |  AND o_orderdate < TIMESTAMP '1995-03-15'
         |  AND c_mktsegment = 'BUILDING'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q_tpch5" ->
      s"""SELECT n_name, CAST($revSql AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1997-01-01'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q_tpch6" ->
      """SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4)) AS DECIMAL(18,8))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.04 AND l_discount <= 0.06
        |  AND l_quantity < 24.0""".stripMargin,
    "q_tpch14" ->
      s"""SELECT ROUND(
         |  CAST(SUM(CASE WHEN p_type = 'PROMO'
         |    THEN CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,8))
         |    ELSE CAST(0 AS DECIMAL(18,8)) END) AS DOUBLE) * 100.0 /
         |  CAST($revSql AS DOUBLE), 6) AS promo_revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1996-07-01'""".stripMargin,
    "q_tpch18" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |  FROM lineitem GROUP BY 1 HAVING sum_qty > 300.0)
        |SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
        |FROM orders
        |JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin,
    "q_tpch10" ->
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         |  CAST($revSql AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1995-10-01'
         |  AND o_orderdate < TIMESTAMP '1996-01-01'
         |GROUP BY c_custkey, c_name, c_acctbal, n_name
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin)
}
