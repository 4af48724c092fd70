package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.graph.PageRank

/** Graph queries over the part↔supplier bipartite graph implied by
  * lineitem (SURVEY.md §2). Supplier nodes are offset by 10⁷ so the
  * two key spaces cannot collide.
  */
object Graph {

  /** Supplier-node key offset (shared with dev tools so profiling
    * always measures the same graph the query builds). */
  val SuppOffset = 10000000L

  /** PageRank importance of every part and supplier after a fixed
    * number of iterations — the corpus-curation quality signal, run on
    * the one real graph in the testdata. */
  def qGraphPagerank(s: SparkSession, d: String): DataFrame = {
    // no pre-distinct: pagerank dedups the symmetrized edge list in
    // its single distinct pass anyway. Single-file scan → one input
    // partition (SURVEY §3.5); spread the explode/dedup work (no-op at
    // real scale where the fact arrives in many splits).
    val edges = Tables.lineitem(s, d)
      .select(col("l_partkey").as("part"),
        (col("l_suppkey") + SuppOffset).as("supp"))
      .repartition(s.sparkContext.defaultParallelism)
    PageRank.pagerank(edges, "part", "supp")
      .orderBy(col("node"))
  }

  /** Single-job experimental shape (see PageRank.pagerankOneJob). */
  def qGraphPagerankOneJob(s: SparkSession, d: String): DataFrame = {
    val edges = Tables.lineitem(s, d)
      .select(col("l_partkey").as("part"),
        (col("l_suppkey") + SuppOffset).as("supp"))
      .repartition(s.sparkContext.defaultParallelism)
    PageRank.pagerankOneJob(edges, "part", "supp")
      .orderBy(col("node"))
  }

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_graph_pagerank" -> (qGraphPagerank _))

  /** DuckDB twin GENERATED from PageRank's constants: the same
    * damping, iteration count, and double-round-12 → DECIMAL(28,12)
    * quantization, unrolled once per iteration so the two engines run
    * literally the same arithmetic. */
  private def pagerankOracle: String = {
    val d = PageRank.Damping
    val iters = PageRank.DefaultIters
    def iterBlock(i: Int): String = {
      val prev = s"r${i - 1}"
      s"""c$i AS (
         |  SELECT e.dst AS node,
         |    SUM(CAST(ROUND(CAST(p.r AS DOUBLE) / p.deg, 12) AS DECIMAL(28,12))) AS s
         |  FROM e JOIN $prev p ON e.src = p.node GROUP BY 1),
         |r$i AS (
         |  SELECT deg.node, deg.deg, nn.n,
         |    CAST(ROUND(${1.0 - d} / nn.n + $d * CAST(c$i.s AS DOUBLE), 12)
         |      AS DECIMAL(28,12)) AS r
         |  FROM deg JOIN c$i ON deg.node = c$i.node CROSS JOIN nn),""".stripMargin
    }
    val blocks = (1 to iters).map(iterBlock).mkString("\n")
    s"""WITH e AS (
       |  SELECT DISTINCT l_partkey AS src, $SuppOffset + l_suppkey AS dst
       |  FROM lineitem
       |  UNION
       |  SELECT DISTINCT $SuppOffset + l_suppkey AS src, l_partkey AS dst
       |  FROM lineitem),
       |deg AS (
       |  SELECT src AS node, COUNT(*) AS deg FROM e GROUP BY 1),
       |nn AS (SELECT COUNT(*) AS n FROM deg),
       |r0 AS (
       |  SELECT node, deg, nn.n,
       |    CAST(ROUND(1.0 / nn.n, 12) AS DECIMAL(28,12)) AS r
       |  FROM deg CROSS JOIN nn),
       |$blocks
       |fin AS (SELECT node, deg, ROUND(CAST(r AS DOUBLE), 8) AS rank
       |        FROM r$iters)
       |SELECT node, deg, rank FROM fin ORDER BY node""".stripMargin
  }

  def oracles: Map[String, String] = Map(
    "q_graph_pagerank" -> pagerankOracle)
}
