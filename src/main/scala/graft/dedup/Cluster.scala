package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair list — the final
  * step of every corpus dedup pipeline: candidate PAIRS (from MinHash /
  * SimHash / exact Jaccard) become duplicate CLUSTERS, and one
  * canonical document (the minimum id) survives per cluster.
  *
  * Two interchangeable algorithms:
  *
  *   - `connectedComponents`: iterative min-label propagation. Rounds
  *     needed = graph diameter; dedup similarity graphs are
  *     overwhelmingly tiny cliques (diameter 1-2), so this converges in
  *     1-2 rounds and is the default. Convergence checks are FUSED:
  *     two propagation rounds run per driver action, so the common
  *     diameter-≤2 case pays one count() job instead of two.
  *
  *   - `connectedComponentsStar`: the alternating large-star/small-star
  *     algorithm (Kiveris et al., "Connected Components in MapReduce
  *     and Beyond", SOCC'14). Converges in O(log n) rounds regardless
  *     of diameter, and per-round work stays proportional to the
  *     (shrinking) edge set — the right choice when the near-dup graph
  *     has a skewed giant component (hub pages, boilerplate), where
  *     plain propagation re-shuffles the hot component's full frontier
  *     every round for diameter-many rounds.
  *
  * Both: each round is shuffle joins + aggregations; `localCheckpoint`
  * truncates the growing lineage so round N's plan does not replay
  * rounds 1..N−1 (the classic iterative-algorithm trap on Spark).
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
    // both directions once; reused by every round. Round 15 (guide
    // §2.4): ONE explode scans the pair plan once (the union-of-two-
    // projections form ran the full upstream pair pipeline twice when
    // the caller had not checkpointed it), the dedup rides the same
    // hash(src) exchange (subset rule — hash(src) clusters (src, dst)),
    // and the checkpoint CARRIES that partitioning so every round's
    // edge-side join needs no exchange and no sort (the r14 lpaLabels
    // pattern).
    val edges = pairs
      .select(explode(array(
        struct(col(aCol).as("src"), col(bCol).as("dst")),
        struct(col(bCol).as("src"), col(aCol).as("dst")))).as("ed"))
      .select(col("ed.src").as("src"), col("ed.dst").as("dst"))
      .repartition(col("src"))
      .dropDuplicates("src", "dst")
      .localCheckpoint()

    // one propagation round: each vertex takes min(label, neighbors')
    // and carries a change flag, so convergence folds into the pass.
    // The label side is the SHUFFLE_HASH build (|V| rows, bounded per
    // partition) so the edge side streams off its checkpointed layout;
    // nbrMin likewise builds against the streamed labels — no
    // sort-merge sorts anywhere in a round.
    def propagate(labels: DataFrame): DataFrame = {
      val nbrMin = edges
        .join(labels.hint("shuffle_hash"), edges("src") === labels("id"))
        .groupBy(col("dst").as("id2"))
        .agg(min(col("label")).as("nbr_label"))
      labels
        .join(nbrMin.hint("shuffle_hash"),
          labels("id") === nbrMin("id2"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_label"), col("label")))
            .as("label"),
          (coalesce(col("nbr_label"), col("label")) < col("label")).as("_chg"))
    }

    // fused round 0: initialize each vertex straight to
    // min(id, min neighbor) — one aggregation instead of an identity
    // init plus a full propagation round (cliques converge immediately).
    // Grouped by SRC (≡ by dst on the symmetric list), so the aggregate
    // reads the checkpointed hash(src) layout with no exchange at all.
    var labels = edges.groupBy(col("src").as("id"))
      .agg(min(col("dst")).as("_m"))
      .select(col("id"), least(col("id"), col("_m")).as("label"))
      .localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // TWO unconditional propagation rounds per driver action, then
      // one convergence check on the second round's flag: if round 2
      // changed nothing, round 1's output was already a fixpoint.
      // Dedup graphs are diameter-≤2 cliques (init already reaches
      // distance 1), so the common case is ONE count() job total —
      // half the per-round driver/job overhead of check-every-round.
      val next = propagate(propagate(labels).drop("_chg")).localCheckpoint()
      val changed = next.where(col("_chg")).limit(1).count()
      labels = next.drop("_chg")
      converged = changed == 0
      iter += 2
    }
    if (!converged)
      System.err.println(
        s"[graft] connectedComponents stopped at maxIter=$maxIter before " +
          "convergence — labels are an upper bound on the true components")
    labels.select(col("id"), col("label").as("cluster_id"))
  }

  /** INCREMENTAL label maintenance: fold a batch of new near-dup
    * pairs into an existing (id, cluster_id) labeling WITHOUT
    * re-running connected components over the corpus — the operation
    * a daily ingest needs at 100 TB, where the corpus labeling is a
    * persisted table and only batch-proportional work is affordable.
    *
    * Algebra: because every existing cluster_id is the MINIMUM member
    * id of its component (the connectedComponents contract), each
    * cluster can be collapsed to that single representative without
    * losing the min. New edges are remapped endpoint-by-endpoint to
    * representatives (ids unseen by `existing` represent themselves),
    * and components are computed over THIS collapsed graph only — its
    * size is bounded by the batch's edge count, never the corpus.
    * Members of touched clusters pick up their representative's new
    * label through one hash join on cluster_id; untouched clusters
    * keep their labels through the same join's null side. min(new
    * component) = min(touched reps ∪ new ids) = min over all member
    * ids, so the result is equal — row for row — to a full rebuild
    * over the union edge set (spec-asserted at every cutoff of a
    * planted edge timeline, the q_scd2_incremental discipline).
    *
    * Merges need no special case: a bridge edge between two existing
    * clusters collapses to a rep-rep edge and the sub-CC unifies them.
    *
    * @param existing (id, cluster_id) from a prior full or incremental
    *                 run; cluster_id MUST be the component minimum
    * @param newPairs undirected batch edges, one per row */
  def incrementalComponents(
      existing: DataFrame, newPairs: DataFrame,
      aCol: String, bCol: String, maxIter: Int = 20): DataFrame = {
    val rep = existing.select(col("id").as("_v"), col("cluster_id").as("_r"))
    val e = newPairs.select(col(aCol).as("_a"), col(bCol).as("_b"))
      .localCheckpoint() // feeds the collapse AND the new-vertex scan
    val collapsed = e
      .join(rep.select(col("_v").as("_a"), col("_r").as("_ra")),
        Seq("_a"), "left")
      .join(rep.select(col("_v").as("_b"), col("_r").as("_rb")),
        Seq("_b"), "left")
      .select(coalesce(col("_ra"), col("_a")).as("ca"),
        coalesce(col("_rb"), col("_b")).as("cb"))
    val subRep = connectedComponents(collapsed, "ca", "cb", maxIter)
      .select(col("id").as("_rep"), col("cluster_id").as("_nl"))
    val updatedExisting = existing
      .join(subRep, existing("cluster_id") === subRep("_rep"), "left")
      .select(existing("id"),
        coalesce(col("_nl"), existing("cluster_id")).as("cluster_id"))
    val newVerts = e.select(col("_a").as("id"))
      .union(e.select(col("_b").as("id"))).distinct()
      .join(existing.select(col("id")), Seq("id"), "left_anti")
    val updatedNew = newVerts
      .join(subRep, newVerts("id") === subRep("_rep"))
      .select(newVerts("id"), col("_nl").as("cluster_id"))
    updatedExisting.unionByName(updatedNew)
  }

  /** Alternating large-star/small-star connected components
    * (Kiveris et al., SOCC'14) — the skew-resistant variant.
    *
    * Each round rewires the edge set toward stars centered at
    * component minima:
    *   - LARGE-STAR (per center u over the undirected neighborhood):
    *     attach every strictly-larger neighbor to
    *     m = min(N(u) ∪ {u}). Detaches high-degree hubs' big
    *     neighbors from each other in one pass.
    *   - SMALL-STAR (per center u over edges oriented big→small):
    *     attach u and all its smaller neighbors to m = min(N(u) ∪ {u}).
    *
    * Both are groupBy-min + join (agg-then-join, not a window over the
    * edge list — the per-center min table is small and AQE broadcasts
    * it). Edge count is non-increasing after the first round and the
    * rounds needed are O(log n) independent of diameter; at fixpoint
    * the edges ARE the component assignment (v → component min).
    *
    * @param pairs undirected edges, one per row
    * @param maxIter safety bound on large+small rounds */
  def connectedComponentsStar(
      pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 30): DataFrame = {
    val vertices = pairs.select(col(aCol).as("id"))
      .union(pairs.select(col(bCol).as("id")))
      .distinct()
      .localCheckpoint()
    // oriented big→small, self-loops dropped
    var edges = pairs
      .select(greatest(col(aCol), col(bCol)).as("u"),
        least(col(aCol), col(bCol)).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    var edgeCount = edges.count()

    // m = min over the undirected neighborhood of each center (incl u)
    def centerMin(nbrs: DataFrame): DataFrame =
      nbrs.groupBy(col("u")).agg(min(col("v")).as("_mn"))
        .select(col("u"), least(col("_mn"), col("u")).as("m"))

    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // ---- large-star ----
      val nbrs = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      val ls = nbrs.join(centerMin(nbrs), "u")
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v")) // v > u ≥ m ⇒ oriented
        .distinct()
      // ---- small-star (input already oriented big→small) ----
      val ss0 = ls
      val sm = centerMin(ss0)
      val next = ss0.join(sm, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .union(ss0.select(col("u"), col("v")).join(sm, "u")
          .select(col("u"), col("m").as("v")))
        .where(col("u") =!= col("v"))
        .distinct()
        .localCheckpoint()
      // convergence: the edge multiset is stable (next ⊆ prev by
      // anti-join emptiness + equal counts ⇒ sets equal). Edge counts
      // are non-increasing, so the count also tracks the shrinkage.
      val nextCount = next.count()
      val grew = next.join(edges, Seq("u", "v"), "left_anti").limit(1).count()
      converged = nextCount == edgeCount && grew == 0
      edges = next
      edgeCount = nextCount
      iter += 1
    }
    if (!converged)
      System.err.println(
        s"[graft] connectedComponentsStar stopped at maxIter=$maxIter " +
          "before convergence — labels are an upper bound")
    // fixpoint edges are stars (v, componentMin); centers label themselves.
    // min() guards the not-fully-converged case where a vertex still
    // holds several pointers.
    val lbl = edges.groupBy(col("u").as("vid")).agg(min(col("v")).as("lbl"))
    vertices.join(lbl, vertices("id") === lbl("vid"), "left")
      .select(col("id"), coalesce(col("lbl"), col("id")).as("cluster_id"))
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
