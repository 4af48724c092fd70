package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair list — the final
  * step of every corpus dedup pipeline: candidate PAIRS (from MinHash /
  * SimHash / exact Jaccard) become duplicate CLUSTERS, and one
  * canonical document (the minimum id) survives per cluster.
  *
  * Algorithm: iterative min-label propagation. Each vertex starts
  * labeled with its own id; every round it takes the min of its label
  * and its neighbors' labels; fixpoint = components labeled by their
  * minimum member. Rounds needed = graph diameter, and dedup similarity
  * graphs are overwhelmingly tiny cliques (diameter 1-2), so this
  * converges in 2-3 rounds. Each round is one shuffle join + one
  * aggregation; `localCheckpoint` truncates the growing lineage so
  * round N's plan does not replay rounds 1..N−1 (the classic iterative-
  * algorithm trap on Spark). At extreme skew (a giant component), the
  * alternating large-star/small-star variant bounds per-round work;
  * the propagation loop and convergence check are identical.
  */
object Cluster {

  /** (id, cluster_id) for every vertex appearing in `pairs`, where
    * cluster_id = min id reachable through the pair graph.
    *
    * @param pairs undirected edges, one per row
    * @param maxIter safety bound on propagation rounds (diameter) */
  def connectedComponents(
      pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 20): DataFrame = {
    val spark = pairs.sparkSession
    // both directions once; reused by every round
    val rawEdges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .localCheckpoint()
    // loop shuffles stay at spark.sql.shuffle.partitions; AQE coalesces
    // the (usually tiny) per-round exchanges at runtime, so no explicit
    // repartition pass — an extra eager materialization measured slower
    // than letting AQE handle it.
    val edges = rawEdges

    // fused round 0: initialize each vertex straight to
    // min(id, min neighbor) — one aggregation instead of an identity
    // init plus a full propagation round (cliques converge immediately)
    var labels = edges.groupBy(col("dst").as("id"))
      .agg(min(col("src")).as("_m"))
      .select(col("id"), least(col("id"), col("_m")).as("label"))
      .localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // min label among each vertex's neighbors
      val nbrMin = edges
        .join(labels, edges("src") === labels("id"))
        .groupBy(col("dst").as("id2"))
        .agg(min(col("label")).as("nbr_label"))
      // the old label is already on the row — fold the convergence flag
      // into the same pass instead of a join-per-iteration change check
      val next = labels
        .join(nbrMin, labels("id") === nbrMin("id2"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_label"), col("label")))
            .as("label"),
          (coalesce(col("nbr_label"), col("label")) < col("label")).as("_chg"))
        .localCheckpoint()
      val changed = next.where(col("_chg")).limit(1).count()
      labels = next.drop("_chg")
      converged = changed == 0
      iter += 1
    }
    if (!converged)
      System.err.println(
        s"[graft] connectedComponents stopped at maxIter=$maxIter before " +
          "convergence — labels are an upper bound on the true components")
    labels.select(col("id"), col("label").as("cluster_id"))
  }

  /** Cluster assignment + canonical flag for a document table given its
    * near-dup pairs: docs not in any pair are their own singleton
    * cluster. */
  def dedupClusters(
      docs: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String, bCol: String): DataFrame = {
    val cc = connectedComponents(pairs, aCol, bCol)
      .withColumnRenamed("id", "_cc_id")
    docs.join(cc, docs(idCol) === cc("_cc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), docs(idCol)))
      .withColumn("is_canonical", docs(idCol) === col("cluster_id"))
      .drop("_cc_id")
  }
}
