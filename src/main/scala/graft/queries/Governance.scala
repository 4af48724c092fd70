package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Data-governance operators — the compliance jobs a 100 TB lake runs
  * before publishing or purging data. The reference has no governance
  * layer (in-memory rows only); these are what its users' privacy and
  * legal teams would run on the same tables.
  */
object Governance {

  /** K-ANONYMITY AUDIT over customer's quasi-identifiers
    * (nation, market segment, account-balance band): the class-size
    * histogram — for each equivalence-class size s, how many classes
    * and how many ROWS sit in classes of that size. The table's
    * k-anonymity k is the first row's class_size; rows in small
    * classes are the re-identification risk a release gate reads off
    * this histogram. Two hash aggregates, both with map-side
    * partials; the second runs on |classes| rows. The balance band is
    * floor(acctbal/1000) — IEEE-identical in both engines. */
  def qKanonAudit(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .groupBy(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / lit(1000.0)).as("bal_band"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("n").as("class_size"))
      .agg(count(lit(1)).as("n_classes"),
        sum(col("n")).as("n_rows"))
      .orderBy(col("class_size"))

  /** GDPR-DELETION IMPACT — the "right to be forgotten" dry run: for
    * a forget-set of customers (custkey ≡ 7 mod 10, the deterministic
    * stand-in for an erasure request batch), how many rows each table
    * would lose, including the CASCADE through orders → lineitem
    * (lineitem has no customer key; its affected rows are exactly
    * those whose order belongs to a forgotten customer). One scan per
    * table; the lineitem pass is a single left join against the
    * affected-order keys with a conditional sum — at scale the
    * forget-set side is the small one and broadcasts. */
  def qGdprImpact(s: SparkSession, d: String): DataFrame = {
    val affOrd = Tables.orders(s, d)
      .where(pmod(col("o_custkey"), lit(10)) === 7)
      .select(col("o_orderkey"), lit(1L).as("aff"))
    val c = Tables.customer(s, d)
      .agg(sum(when(pmod(col("c_custkey"), lit(10)) === 7, 1L)
        .otherwise(0L)).as("n_affected"),
        count(lit(1)).as("n_total"))
      .select(lit("customer").as("table_name"),
        col("n_affected"), col("n_total"))
    val o = Tables.orders(s, d)
      .agg(sum(when(pmod(col("o_custkey"), lit(10)) === 7, 1L)
        .otherwise(0L)).as("n_affected"),
        count(lit(1)).as("n_total"))
      .select(lit("orders").as("table_name"),
        col("n_affected"), col("n_total"))
    val l = Tables.lineitem(s, d)
      .join(affOrd, col("l_orderkey") === col("o_orderkey"), "left")
      .agg(sum(coalesce(col("aff"), lit(0L))).as("n_affected"),
        count(lit(1)).as("n_total"))
      .select(lit("lineitem").as("table_name"),
        col("n_affected"), col("n_total"))
    c.unionByName(o).unionByName(l).orderBy(col("table_name"))
  }

  /** L-DIVERSITY AUDIT — k-anonymity's companion check (Machanavajjhala
    * et al. 2007): a class of identical quasi-identifiers is still
    * unsafe if everyone in it shares the same SENSITIVE value, however
    * large k is. Here the QI is (nation, balance band) and the
    * sensitive attribute is the market segment; per equivalence class
    * l = distinct sensitive values, reported as the l-histogram —
    * classes at l = 1 are the homogeneity-attack surface a release
    * gate must empty. Shape mirrors q_kanon_audit: the count-distinct
    * expands to (QI, segment) grouping first (segment domain is 5, so
    * the expansion is bounded), then two tiny rollups. */
  def qLdiversityAudit(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .groupBy(col("c_nationkey"),
        floor(col("c_acctbal") / lit(1000.0)).as("bal_band"))
      .agg(countDistinct(col("c_mktsegment")).as("l"),
        count(lit(1)).as("n"))
      .groupBy(col("l"))
      .agg(count(lit(1)).as("n_classes"), sum(col("n")).as("n_rows"))
      .orderBy(col("l"))

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_kanon_audit" -> (qKanonAudit _),
    "q_ldiversity_audit" -> (qLdiversityAudit _),
    "q_gdpr_impact" -> (qGdprImpact _))

  def oracles: Map[String, String] = Map(
    "q_kanon_audit" ->
      """WITH cls AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
        |    COUNT(*) AS n
        |  FROM customer GROUP BY 1, 2, 3)
        |SELECT n AS class_size, COUNT(*) AS n_classes,
        |  CAST(SUM(n) AS BIGINT) AS n_rows
        |FROM cls GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_ldiversity_audit" ->
      """WITH cls AS (
        |  SELECT c_nationkey,
        |    CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
        |    COUNT(DISTINCT c_mktsegment) AS l, COUNT(*) AS n
        |  FROM customer GROUP BY 1, 2)
        |SELECT l, COUNT(*) AS n_classes,
        |  CAST(SUM(n) AS BIGINT) AS n_rows
        |FROM cls GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_gdpr_impact" ->
      """WITH f AS (
        |  SELECT o_orderkey FROM orders WHERE o_custkey % 10 = 7)
        |SELECT 'customer' AS table_name,
        |  CAST(SUM(CASE WHEN c_custkey % 10 = 7 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_affected,
        |  COUNT(*) AS n_total FROM customer
        |UNION ALL
        |SELECT 'orders',
        |  CAST(SUM(CASE WHEN o_custkey % 10 = 7 THEN 1 ELSE 0 END)
        |    AS BIGINT), COUNT(*) FROM orders
        |UNION ALL
        |SELECT 'lineitem',
        |  CAST(SUM(CASE WHEN l_orderkey IN (SELECT o_orderkey FROM f)
        |    THEN 1 ELSE 0 END) AS BIGINT), COUNT(*) FROM lineitem
        |ORDER BY table_name""".stripMargin)
}
