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

  /** DIFFERENTIALLY-PRIVATE HISTOGRAM RELEASE AUDIT — the calibration
    * harness for an ε = ln 2 discrete-Laplace release of the
    * (nation × market segment) customer histogram. Noise is the
    * difference of two Geometric(½) draws (Inoue/Kotz two-sided
    * geometric: P(z) ∝ 2^{-|z|}, the discrete Laplace mechanism of
    * Ghosh–Roughgarden–Sundararajan 2012; each customer lands in
    * exactly one cell, so histogram sensitivity is 1 and the release
    * is ln 2-DP). The geometric draws are EXACT INTEGER bit
    * arithmetic — u = 52 md5 bits per cell, g = trailing-zero count
    * via bit_count((u & -u) − 1) — so no float ever enters and both
    * engines sample the identical noise. Hash-seeded coins make this
    * run an AUDIT (reproducible, true count beside released count —
    * the E|noise| = 4/3 calibration check); a production release
    * keys the md5 with a secret salt and drops the true columns.
    * Scale: one map-side-partial hash aggregate to ≤|nations×segs|
    * cells; noise is per-cell projection work on that tiny table. */
  def qDpHistogram(s: SparkSession, d: String): DataFrame = {
    def draw(tag: String): org.apache.spark.sql.Column =
      conv(substring(md5(concat(lit(tag), col("c_nationkey"), lit(":"),
        col("c_mktsegment"))), 1, 13), 16, 10).cast("long")
    Tables.customer(s, d)
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_true"))
      .withColumn("u1", draw("dp1:"))
      .withColumn("u2", draw("dp2:"))
      .withColumn("noise",
        expr("CASE WHEN u1 = 0 THEN 52 ELSE bit_count((u1 & -u1) - 1) END") -
        expr("CASE WHEN u2 = 0 THEN 52 ELSE bit_count((u2 & -u2) - 1) END"))
      .select(col("c_nationkey"), col("c_mktsegment"), col("n_true"),
        col("noise").cast("long").as("noise"),
        (col("n_true") + col("noise")).cast("long").as("released"))
      .orderBy(col("c_nationkey"), col("c_mktsegment"))
  }

  /** Per-user contribution clip for q_dp_mean, in integer cents
    * ($100). The clip IS the sensitivity bound: one user can move the
    * released sum by at most this much. */
  val DpClipCents = 10000L

  /** USER-LEVEL DIFFERENTIALLY-PRIVATE MEAN — the sum/count release
    * beside q_dp_histogram's count release, with the harder privacy
    * unit: a USER (all their events), not a row. Per type, each
    * user's value total is CLIPPED to DpClipCents (bounding user
    * sensitivity — the step row-level DP skips and the one that
    * actually protects a whale account), then the clipped sum is
    * released with discrete-Laplace noise QUANTIZED to the clip
    * (noise = clip · (Geom(½) − Geom(½)): adjacent databases differ
    * by ≤ one clip, adjacent noise grid points differ by a 2× odds
    * ratio → ε = ln 2), and the user count with the same mechanism at
    * sensitivity 1. The DP mean is the client-side quotient of the
    * two releases (floor division to cents here so it stays integer).
    * Same md5-bit exact-integer coin arithmetic as q_dp_histogram —
    * no float, both engines sample identical noise; true columns ride
    * along because this run is the calibration AUDIT (a production
    * release salts the md5 and drops them).
    *
    * Scale: one (type, user) map-side-combined aggregate, a |types|
    * rollup, noise as projection work on the tiny release table. */
  def qDpMean(s: SparkSession, d: String): DataFrame = {
    def draw(tag: String): org.apache.spark.sql.Column =
      conv(substring(md5(concat(lit(tag), col("event_type"))), 1, 13),
        16, 10).cast("long")
    val perUser = Tables.events(s, d)
      .select(col("event_type"), col("user_id"),
        round(col("value") * 100).cast("long").as("val_c"))
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum(col("val_c")).as("s_u"))
      .select(col("event_type"),
        least(col("s_u"), lit(DpClipCents)).as("clip_c"))
    perUser.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users_true"),
        sum(col("clip_c")).as("sum_clip_true_c"))
      .withColumn("u1", draw("dpm1:"))
      .withColumn("u2", draw("dpm2:"))
      .withColumn("u3", draw("dpm3:"))
      .withColumn("u4", draw("dpm4:"))
      .withColumn("noise_sum",
        (expr("CASE WHEN u1 = 0 THEN 52" +
          " ELSE bit_count((u1 & -u1) - 1) END") -
          expr("CASE WHEN u2 = 0 THEN 52" +
            " ELSE bit_count((u2 & -u2) - 1) END")).cast("long")
          * lit(DpClipCents))
      .withColumn("noise_n",
        (expr("CASE WHEN u3 = 0 THEN 52" +
          " ELSE bit_count((u3 & -u3) - 1) END") -
          expr("CASE WHEN u4 = 0 THEN 52" +
            " ELSE bit_count((u4 & -u4) - 1) END")).cast("long"))
      .select(col("event_type"), col("n_users_true"),
        col("sum_clip_true_c"),
        (col("sum_clip_true_c") + col("noise_sum")).as("sum_released_c"),
        (col("n_users_true") + col("noise_n")).as("n_released"))
      // post-processing (DP-safe): values are nonnegative, so a
      // negative released sum carries no signal — floor at 0 keeps the
      // quotient in both engines' shared nonnegative floor-division
      // regime (DIV truncation == // floor only for nonnegatives)
      .withColumn("dp_mean_c",
        expr("CAST(GREATEST(sum_released_c, 0)" +
          " DIV GREATEST(n_released, 1) AS BIGINT)"))
      .orderBy(col("event_type"))
  }

  /** T-CLOSENESS AUDIT — the third rung of the release-gate ladder
    * (Li, Li & Venkatasubramanian 2007) after q_kanon_audit and
    * q_ldiversity_audit: a class can be large (k) and varied (l) yet
    * still leak if its sensitive-value DISTRIBUTION diverges from the
    * table's. For the categorical sensitive attribute (market
    * segment) the ground metric is uniform, so t is the total
    * variation distance ½·Σ_s |p_cell(s) − p_glob(s)|.
    *
    * Exactness: NO float ever enters. With class size n_c, global
    * size n, class-segment count n_cs and global-segment count n_s,
    *   Σ_s |n_cs·n − n_s·n_c|  (present segments)
    *     + (n·n_c − Σ_present n_s·n_c)  (absent segments, |0 − p|)
    * is an exact DECIMAL(38,0) numerator (safe past 10¹⁵ rows), and
    * t_ppm = 10⁶·num DIV (2·n_c·n) is integer floor division — both
    * engines compute the identical BIGINT.
    *
    * Scale: one (QI, segment) hash aggregate (bounded ×5 expansion of
    * the class table), the ≤5-row global segment table broadcasts,
    * the grand total is a 1-row broadcast scalar; everything after is
    * projection work on |classes| rows. */
  def qTclosenessAudit(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
    val dec = "decimal(38,0)"
    val segCells = cust
      .groupBy(col("c_nationkey"),
        floor(col("c_acctbal") / lit(1000.0)).as("bal_band"),
        col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cs"))
    val globSeg = cust.groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_s"))
    val glob = cust.agg(count(lit(1)).as("n"))
    // class size via a window on the SAME (QI) partitioning the final
    // rollup groups on — one exchange serves both
    val wCls = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c_nationkey"), col("bal_band"))
    segCells
      .join(broadcast(globSeg), "c_mktsegment")
      .crossJoin(broadcast(glob))
      .withColumn("n_c", sum(col("n_cs")).over(wCls))
      .groupBy(col("c_nationkey"), col("bal_band"))
      .agg(
        max(col("n_c")).as("n_c"),
        count(lit(1)).as("l"),
        max(col("n")).as("n"),
        sum(abs(col("n_cs").cast(dec) * col("n") -
          col("n_s").cast(dec) * col("n_c"))).as("num_present"),
        sum(col("n_s").cast(dec)).as("s_present"))
      .select(col("c_nationkey"), col("bal_band"), col("n_c"), col("l"),
        (col("num_present") +
          (col("n").cast(dec) * col("n_c") -
            col("s_present") * col("n_c"))).as("num"),
        col("n"))
      .select(col("c_nationkey"), col("bal_band"),
        col("n_c").cast("long").as("n_c"), col("l"),
        expr(s"CAST((CAST(1000000 AS $dec) * num) DIV " +
          s"(CAST(2 AS $dec) * n_c * n) AS BIGINT)").as("t_ppm"))
      .orderBy(col("c_nationkey"), col("bal_band"))
  }

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_kanon_audit" -> (qKanonAudit _),
    "q_ldiversity_audit" -> (qLdiversityAudit _),
    "q_dp_histogram" -> (qDpHistogram _),
    "q_dp_mean" -> (qDpMean _),
    "q_tcloseness_audit" -> (qTclosenessAudit _),
    "q_gdpr_impact" -> (qGdprImpact _))

  def oracles: Map[String, String] = Map(
    "q_dp_mean" ->
      // same clip, same md5-bit geometric coins, same clip-quantized
      // sum noise and unit count noise, same nonnegative floor close
      s"""WITH pu AS (
         |  SELECT event_type, user_id,
         |    SUM(CAST(ROUND(value * 100) AS BIGINT)) AS s_u
         |  FROM events GROUP BY 1, 2),
         |cl AS (
         |  SELECT event_type, LEAST(s_u, $DpClipCents) AS clip_c FROM pu),
         |agg AS (
         |  SELECT event_type, COUNT(*) AS n_users_true,
         |    CAST(SUM(clip_c) AS BIGINT) AS sum_clip_true_c
         |  FROM cl GROUP BY 1),
         |u AS (
         |  SELECT *,
         |    CAST(CONCAT('0x', SUBSTR(MD5('dpm1:' || event_type), 1, 13))
         |      AS BIGINT) AS u1,
         |    CAST(CONCAT('0x', SUBSTR(MD5('dpm2:' || event_type), 1, 13))
         |      AS BIGINT) AS u2,
         |    CAST(CONCAT('0x', SUBSTR(MD5('dpm3:' || event_type), 1, 13))
         |      AS BIGINT) AS u3,
         |    CAST(CONCAT('0x', SUBSTR(MD5('dpm4:' || event_type), 1, 13))
         |      AS BIGINT) AS u4
         |  FROM agg),
         |g AS (
         |  SELECT event_type, n_users_true, sum_clip_true_c,
         |    ((CASE WHEN u1 = 0 THEN 52
         |        ELSE bit_count((u1 & -u1) - 1) END) -
         |     (CASE WHEN u2 = 0 THEN 52
         |        ELSE bit_count((u2 & -u2) - 1) END)) * $DpClipCents
         |      AS noise_sum,
         |    (CASE WHEN u3 = 0 THEN 52
         |        ELSE bit_count((u3 & -u3) - 1) END) -
         |    (CASE WHEN u4 = 0 THEN 52
         |        ELSE bit_count((u4 & -u4) - 1) END) AS noise_n
         |  FROM u)
         |SELECT event_type, n_users_true, sum_clip_true_c,
         |  CAST(sum_clip_true_c + noise_sum AS BIGINT) AS sum_released_c,
         |  CAST(n_users_true + noise_n AS BIGINT) AS n_released,
         |  CAST(GREATEST(sum_clip_true_c + noise_sum, 0)
         |    // GREATEST(n_users_true + noise_n, 1) AS BIGINT) AS dp_mean_c
         |FROM g ORDER BY event_type""".stripMargin,
    "q_dp_histogram" ->
      """WITH h AS (
        |  SELECT c_nationkey, c_mktsegment, COUNT(*) AS n_true
        |  FROM customer GROUP BY 1, 2),
        |u AS (
        |  SELECT c_nationkey, c_mktsegment, n_true,
        |    CAST(CONCAT('0x', SUBSTR(MD5(
        |      'dp1:' || c_nationkey || ':' || c_mktsegment), 1, 13))
        |      AS BIGINT) AS u1,
        |    CAST(CONCAT('0x', SUBSTR(MD5(
        |      'dp2:' || c_nationkey || ':' || c_mktsegment), 1, 13))
        |      AS BIGINT) AS u2
        |  FROM h),
        |g AS (
        |  SELECT c_nationkey, c_mktsegment, n_true,
        |    (CASE WHEN u1 = 0 THEN 52
        |      ELSE bit_count((u1 & -u1) - 1) END) -
        |    (CASE WHEN u2 = 0 THEN 52
        |      ELSE bit_count((u2 & -u2) - 1) END) AS noise
        |  FROM u)
        |SELECT c_nationkey, c_mktsegment, n_true,
        |  CAST(noise AS BIGINT) AS noise,
        |  CAST(n_true + noise AS BIGINT) AS released
        |FROM g ORDER BY c_nationkey, c_mktsegment""".stripMargin,
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
    "q_tcloseness_audit" ->
      """WITH cells AS (
        |  SELECT c_nationkey,
        |    CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
        |    c_mktsegment, COUNT(*) AS n_cs
        |  FROM customer GROUP BY 1, 2, 3),
        |gs AS (SELECT c_mktsegment, COUNT(*) AS n_s
        |  FROM customer GROUP BY 1),
        |g AS (SELECT COUNT(*) AS n FROM customer),
        |cl AS (
        |  SELECT c_nationkey, bal_band, c_mktsegment, n_cs,
        |    SUM(n_cs) OVER (PARTITION BY c_nationkey, bal_band) AS n_c
        |  FROM cells),
        |agg AS (
        |  SELECT c_nationkey, bal_band,
        |    MAX(n_c) AS n_c, COUNT(*) AS l, MAX(n) AS n,
        |    SUM(ABS(CAST(n_cs AS HUGEINT) * n -
        |      CAST(n_s AS HUGEINT) * n_c)) AS num_present,
        |    SUM(CAST(n_s AS HUGEINT)) AS s_present
        |  FROM cl JOIN gs USING (c_mktsegment) CROSS JOIN g
        |  GROUP BY 1, 2)
        |SELECT c_nationkey, bal_band, CAST(n_c AS BIGINT) AS n_c, l,
        |  CAST((CAST(1000000 AS HUGEINT) *
        |    (num_present + (CAST(n AS HUGEINT) * n_c -
        |      s_present * n_c)))
        |    // (CAST(2 AS HUGEINT) * n_c * n) AS BIGINT) AS t_ppm
        |FROM agg ORDER BY c_nationkey, bal_band""".stripMargin,
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
