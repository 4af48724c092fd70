package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.api.Rel

/** Core relational algebra queries (SURVEY.md §2, part 1).
  *
  * Each query exercises one verb of the reference engine
  * (/root/reference/stupidb/api.py) through graft's fluent `Rel` API and
  * has a DuckDB oracle twin. Every query ends in a total ORDER BY on both
  * sides so the driver's sorted compare is deterministic.
  */
object Relational {

  private def cust(s: SparkSession, d: String) = Rel(Tables.customer(s, d))
  private def ord(s: SparkSession, d: String) = Rel(Tables.orders(s, d))
  private def li(s: SparkSession, d: String) = Rel(Tables.lineitem(s, d))

  /** Projection with computed columns — api.py:316 `select`. */
  def qSelect(s: SparkSession, d: String): DataFrame =
    cust(s, d)
      .select(
        "c_custkey" -> col("c_custkey"),
        "name_upper" -> upper(col("c_name")),
        "bal_cents" -> round(col("c_acctbal") * 100, 0).cast("long"))
      .orderBy(col("c_custkey")).toDF

  /** Appended computed columns — api.py:362 `mutate`. */
  def qMutate(s: SparkSession, d: String): DataFrame =
    ord(s, d)
      .mutate(
        "order_year" -> year(col("o_orderdate")),
        "is_big" -> (col("o_totalprice") > 200000.0))
      .select(
        "o_orderkey" -> col("o_orderkey"),
        "o_totalprice" -> col("o_totalprice"),
        "order_year" -> col("order_year"),
        "is_big" -> col("is_big"))
      .orderBy(col("o_orderkey")).toDF

  /** Row filtering — api.py:402 `sift`. Predicate must push to the scan. */
  def qFilter(s: SparkSession, d: String): DataFrame =
    li(s, d)
      .sift(col("l_discount") > 0.05 && col("l_quantity") < 10.0)
      .select(
        "l_orderkey" -> col("l_orderkey"),
        "l_linenumber" -> col("l_linenumber"),
        "l_quantity" -> col("l_quantity"),
        "l_discount" -> col("l_discount"))
      .orderBy(col("l_orderkey"), col("l_linenumber")).toDF

  /** Multi-key ORDER BY + LIMIT/OFFSET — api.py:275/:720. */
  def qOrderLimit(s: SparkSession, d: String): DataFrame =
    ord(s, d)
      .select(
        "o_orderkey" -> col("o_orderkey"),
        "o_totalprice" -> col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(50, offset = 10).toDF

  /** NULLS FIRST / NULLS LAST placement — aggregation.py:43 `Nulls`.
    * The test tables are null-free, so nulls are minted with nullif. */
  def qOrderNulls(s: SparkSession, d: String): DataFrame =
    cust(s, d)
      .mutate("bal" -> when(col("c_acctbal") < 0, lit(null)
        .cast("double")).otherwise(col("c_acctbal")))
      .select("c_custkey" -> col("c_custkey"), "bal" -> col("bal"))
      .orderBy(col("bal").asc_nulls_first, col("c_custkey").asc)
      .limit(100).toDF

  /** Duplicate elimination. */
  def qDistinct(s: SparkSession, d: String): DataFrame =
    ord(s, d)
      .select(
        "o_orderstatus" -> col("o_orderstatus"),
        "o_orderpriority" -> col("o_orderpriority"))
      .distinct
      .orderBy(col("o_orderstatus"), col("o_orderpriority")).toDF

  /** Key equi-join — api.py:183 `inner_join`. customer is a broadcast dim. */
  def qInnerJoin(s: SparkSession, d: String): DataFrame =
    ord(s, d)
      .innerJoin(
        Rel(broadcast(Tables.customer(s, d))),
        col("o_custkey") === col("c_custkey"))
      .select(
        "o_orderkey" -> col("o_orderkey"),
        "c_name" -> col("c_name"),
        "o_totalprice" -> col("o_totalprice"))
      .orderBy(col("o_orderkey")).toDF

  /** Left outer join — api.py:225. Kept non-broadcast-ready shape:
    * customers with no orders must survive with NULL order columns. */
  def qLeftJoin(s: SparkSession, d: String): DataFrame =
    cust(s, d)
      .leftJoin(
        ord(s, d).sift(col("o_totalprice") > 300000.0),
        col("c_custkey") === col("o_custkey"))
      .select(
        "c_custkey" -> col("c_custkey"),
        "o_orderkey" -> col("o_orderkey"),
        "o_totalprice" -> col("o_totalprice"))
      .orderBy(col("c_custkey"), col("o_orderkey").asc_nulls_first).toDF

  /** Right outer join — api.py:244. */
  def qRightJoin(s: SparkSession, d: String): DataFrame =
    ord(s, d).sift(col("o_totalprice") > 300000.0)
      .rightJoin(cust(s, d), col("o_custkey") === col("c_custkey"))
      .select(
        "c_custkey" -> col("c_custkey"),
        "o_orderkey" -> col("o_orderkey"))
      .orderBy(col("c_custkey"), col("o_orderkey").asc_nulls_first).toDF

  /** Full outer join — completes api.py:263 (reference raises). Two
    * disjoint-ish aggregates joined on group key. */
  def qFullJoin(s: SparkSession, d: String): DataFrame = {
    val hi = ord(s, d).sift(col("o_totalprice") > 250000.0)
      .groupByAgg(Seq("k" -> col("o_custkey")), "n_hi" -> count(lit(1)))
    val lo = ord(s, d).sift(col("o_totalprice") < 50000.0)
      .groupByAgg(Seq("k2" -> col("o_custkey")), "n_lo" -> count(lit(1)))
    hi.fullJoin(lo, col("k") === col("k2"))
      .select(
        "custkey" -> coalesce(col("k"), col("k2")),
        "n_hi" -> col("n_hi"),
        "n_lo" -> col("n_lo"))
      .orderBy(col("custkey")).toDF
  }

  /** Cartesian product — api.py:136 `cross_join`, on the two tiny dims. */
  def qCrossJoin(s: SparkSession, d: String): DataFrame =
    Rel(Tables.region(s, d))
      .crossJoin(Rel(Tables.nation(s, d)))
      .select(
        "r_name" -> col("r_name"),
        "n_name" -> col("n_name"))
      .orderBy(col("r_name"), col("n_name")).toDF

  /** Distributed EXISTS (semi-join) — api.py:432 `exists` semantics. */
  def qSemiJoin(s: SparkSession, d: String): DataFrame =
    cust(s, d)
      .semiJoin(
        ord(s, d).sift(col("o_totalprice") > 300000.0),
        col("c_custkey") === col("o_custkey"))
      .select("c_custkey" -> col("c_custkey"), "c_name" -> col("c_name"))
      .orderBy(col("c_custkey")).toDF

  /** Distributed NOT EXISTS (anti-join). */
  def qAntiJoin(s: SparkSession, d: String): DataFrame =
    cust(s, d)
      .antiJoin(ord(s, d), col("c_custkey") === col("o_custkey"))
      .select("c_custkey" -> col("c_custkey"), "c_name" -> col("c_name"))
      .orderBy(col("c_custkey")).toDF

  /** Non-equi (theta) join — stupidb join predicates are arbitrary
    * lambdas (api.py:183); here a range predicate. Physical plan is a
    * broadcast nested-loop join with the small side broadcast. */
  def qThetaJoin(s: SparkSession, d: String): DataFrame =
    Rel(broadcast(Tables.supplier(s, d)))
      .innerJoin(
        Rel(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey") &&
          col("s_acctbal") > col("n_nationkey").cast("double") * 100.0)
      .select(
        "s_suppkey" -> col("s_suppkey"),
        "n_name" -> col("n_name"),
        "s_acctbal" -> col("s_acctbal"))
      .orderBy(col("s_suppkey"), col("n_name")).toDF

  // --- set operations (api.py:608-715) on aligned projections ---------

  private def segA(s: SparkSession, d: String): Rel =
    cust(s, d).sift(col("c_mktsegment") === "BUILDING")
      .select("nationkey" -> col("c_nationkey"))
  private def segB(s: SparkSession, d: String): Rel =
    cust(s, d).sift(col("c_mktsegment") === "AUTOMOBILE")
      .select("nationkey" -> col("c_nationkey"))

  def qUnion(s: SparkSession, d: String): DataFrame =
    segA(s, d).union(segB(s, d)).orderBy(col("nationkey")).toDF

  def qUnionAll(s: SparkSession, d: String): DataFrame =
    segA(s, d).unionAll(segB(s, d)).orderBy(col("nationkey")).toDF

  def qIntersect(s: SparkSession, d: String): DataFrame =
    segA(s, d).intersect(segB(s, d)).orderBy(col("nationkey")).toDF

  def qIntersectAll(s: SparkSession, d: String): DataFrame =
    segA(s, d).intersectAll(segB(s, d)).orderBy(col("nationkey")).toDF

  def qDifference(s: SparkSession, d: String): DataFrame =
    segA(s, d).difference(segB(s, d)).orderBy(col("nationkey")).toDF

  def qDifferenceAll(s: SparkSession, d: String): DataFrame =
    segA(s, d).differenceAll(segB(s, d)).orderBy(col("nationkey")).toDF

  /** Fuzzy self-join over the part-name vocabulary: distinct names
    * within 2 edits, blocked on the last token (operators.FuzzyJoin —
    * vocabulary-first + blocking + length-band prefilter, never a
    * cartesian). */
  def qFuzzyJoin(s: SparkSession, d: String): DataFrame =
    graft.operators.FuzzyJoin.fuzzyNamePairs(
      Tables.part(s, d), "p_name",
      graft.operators.FuzzyJoin.lastTokenBlock, maxDist = 2,
      blockOf2 = Some(graft.operators.FuzzyJoin.firstTokenBlock))
      .orderBy(col("name_a"), col("name_b"))

  /** Salted join as a first-class query (operators.SkewJoin): the
    * lineitem fact joins orders with the key spread over 4 salts —
    * each hot orderkey lands on 4 reducers instead of one straggler —
    * then rolls up revenue per order priority. The salt is invisible
    * in the result (row-identical to the unsalted join, which is
    * exactly what the plain-SQL oracle computes); sums are DECIMAL so
    * the rollup is order-independent. */
  def qSkewJoin(s: SparkSession, d: String): DataFrame =
    graft.operators.SkewJoin.saltedInnerJoin(
      Tables.lineitem(s, d).select(col("l_orderkey"), col("l_extendedprice")),
      Tables.orders(s, d).select(col("o_orderkey"), col("o_orderpriority")),
      "l_orderkey", "o_orderkey", saltFactor = 4)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast("decimal(18,2)"))
          .cast("double").as("sum_price"))
      .orderBy(col("o_orderpriority"))

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_fuzzy_join" -> (qFuzzyJoin _),
    "q_skew_join" -> (qSkewJoin _),
    "q_select" -> (qSelect _),
    "q_mutate" -> (qMutate _),
    "q_filter" -> (qFilter _),
    "q_order_limit" -> (qOrderLimit _),
    "q_order_nulls" -> (qOrderNulls _),
    "q_distinct" -> (qDistinct _),
    "q_inner_join" -> (qInnerJoin _),
    "q_left_join" -> (qLeftJoin _),
    "q_right_join" -> (qRightJoin _),
    "q_full_join" -> (qFullJoin _),
    "q_cross_join" -> (qCrossJoin _),
    "q_semi_join" -> (qSemiJoin _),
    "q_anti_join" -> (qAntiJoin _),
    "q_theta_join" -> (qThetaJoin _),
    "q_union" -> (qUnion _),
    "q_union_all" -> (qUnionAll _),
    "q_intersect" -> (qIntersect _),
    "q_intersect_all" -> (qIntersectAll _),
    "q_difference" -> (qDifference _),
    "q_difference_all" -> (qDifferenceAll _))

  private val segASql = "SELECT c_nationkey AS nationkey FROM customer WHERE c_mktsegment = 'BUILDING'"
  private val segBSql = "SELECT c_nationkey AS nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'"

  def oracles: Map[String, String] = Map(
    "q_skew_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_fuzzy_join" ->
      """WITH v AS (
        |  SELECT p_name AS name, COUNT(*) AS n FROM part GROUP BY 1),
        |p AS (SELECT name, n, string_split(name, ' ')[-1] AS b1,
        |             string_split(name, ' ')[1] AS b2 FROM v),
        |cand AS (
        |  SELECT a.name AS name_a, b.name AS name_b,
        |    a.n AS n_a, b.n AS n_b
        |  FROM p a JOIN p b ON a.b1 = b.b1 AND a.name < b.name
        |  WHERE ABS(LEN(a.name) - LEN(b.name)) <= 2
        |  UNION
        |  SELECT a.name, b.name, a.n, b.n
        |  FROM p a JOIN p b ON a.b2 = b.b2 AND a.name < b.name
        |  WHERE ABS(LEN(a.name) - LEN(b.name)) <= 2)
        |SELECT name_a, name_b, levenshtein(name_a, name_b) AS dist,
        |  n_a, n_b
        |FROM cand WHERE levenshtein(name_a, name_b) <= 2
        |ORDER BY name_a, name_b""".stripMargin,
    "q_select" ->
      """SELECT c_custkey, UPPER(c_name) AS name_upper,
        |  CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS bal_cents
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_mutate" ->
      """SELECT o_orderkey, o_totalprice,
        |  CAST(YEAR(o_orderdate) AS INT) AS order_year,
        |  o_totalprice > 200000.0 AS is_big
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        |FROM lineitem WHERE l_discount > 0.05 AND l_quantity < 10.0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_order_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50 OFFSET 10""".stripMargin,
    "q_order_nulls" ->
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
        |FROM customer ORDER BY bal ASC NULLS FIRST, c_custkey ASC
        |LIMIT 100""".stripMargin,
    "q_distinct" ->
      """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "q_inner_join" ->
      """SELECT o_orderkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "q_left_join" ->
      """SELECT c_custkey, o_orderkey, o_totalprice
        |FROM customer LEFT JOIN
        |  (SELECT * FROM orders WHERE o_totalprice > 300000.0) o
        |  ON c_custkey = o_custkey
        |ORDER BY c_custkey, o_orderkey ASC NULLS FIRST""".stripMargin,
    "q_right_join" ->
      """SELECT c_custkey, o_orderkey
        |FROM (SELECT * FROM orders WHERE o_totalprice > 300000.0) o
        |RIGHT JOIN customer ON o_custkey = c_custkey
        |ORDER BY c_custkey, o_orderkey ASC NULLS FIRST""".stripMargin,
    "q_full_join" ->
      """WITH hi AS (SELECT o_custkey AS k, COUNT(*) AS n_hi FROM orders
        |            WHERE o_totalprice > 250000.0 GROUP BY o_custkey),
        |     lo AS (SELECT o_custkey AS k2, COUNT(*) AS n_lo FROM orders
        |            WHERE o_totalprice < 50000.0 GROUP BY o_custkey)
        |SELECT COALESCE(k, k2) AS custkey, n_hi, n_lo
        |FROM hi FULL OUTER JOIN lo ON k = k2
        |ORDER BY custkey""".stripMargin,
    "q_cross_join" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_theta_join" ->
      """SELECT s_suppkey, n_name, s_acctbal
        |FROM supplier JOIN nation
        |  ON s_nationkey = n_nationkey
        |  AND s_acctbal > CAST(n_nationkey AS DOUBLE) * 100.0
        |ORDER BY s_suppkey, n_name""".stripMargin,
    "q_union" ->
      s"($segASql) UNION ($segBSql) ORDER BY nationkey",
    "q_union_all" ->
      s"($segASql) UNION ALL ($segBSql) ORDER BY nationkey",
    "q_intersect" ->
      s"($segASql) INTERSECT ($segBSql) ORDER BY nationkey",
    "q_intersect_all" ->
      s"($segASql) INTERSECT ALL ($segBSql) ORDER BY nationkey",
    "q_difference" ->
      s"($segASql) EXCEPT ($segBSql) ORDER BY nationkey",
    "q_difference_all" ->
      s"($segASql) EXCEPT ALL ($segBSql) ORDER BY nationkey")
}
