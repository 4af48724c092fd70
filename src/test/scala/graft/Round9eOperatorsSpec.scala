package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Round-9 fifth-session additions: prototypicality pruning, 1-bit
  * sign-signature ANN, per-user behavioral entropy, incremental
  * aggregate maintenance, and size-derived k-core peeling. Planted
  * fixtures run the registered queries unmodified against
  * hand-computed answers. */
class Round9eOperatorsSpec extends SparkSpec {

  private def embDir(rows: Seq[(Long, Seq[Float], Int)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_r9e_emb").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def eventsDir(
      rows: Seq[(Long, String, Long, String, Double)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_r9e_ev").toString
    rows.toDF("event_id", "ts_str", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("ts_str")))
      .drop("ts_str")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def vec(xs: Double*): Seq[Float] = {
    val v = xs.map(_.toFloat)
    v ++ Seq.fill(64 - v.length)(0.0f)
  }

  test("prototype: the off-axis member of a tight label is pruned") {
    // label 0: three copies of e1 and one e2 — the e2 row sits at
    // cosine ~0.32 to the centroid (3,1,0,…)/4 while the e1 rows sit
    // at ~0.95; the label mean ≈ 0.79, so only the e2 row is below
    // mean − 0.05. label 1: two identical vectors — both score 1.0,
    // nobody pruned (margin keeps exact-mean members).
    val d = embDir(Seq(
      (0L, vec(1, 0), 0), (1L, vec(1, 0), 0), (2L, vec(1, 0), 0),
      (3L, vec(0, 1), 0),
      (4L, vec(0, 0, 1), 1), (5L, vec(0, 0, 1), 1)))
    val r = graft.queries.DedupSim.qEmbedPrototype(spark, d).collect()
      .map(x => x.getLong(0) -> (x.getDouble(2), x.getBoolean(4))).toMap
    assert(r.size == 6)
    // label-0 centroid = (0.75, 0.25): cos(e1) = .75/.790569 ≈ .948683
    assert(math.abs(r(0L)._1 - 0.948683) < 1e-6, s"e1 sim: $r")
    assert(math.abs(r(3L)._1 - 0.316228) < 1e-6, s"e2 sim: $r")
    assert(!r(0L)._2 && !r(1L)._2 && !r(2L)._2, s"e1 rows pruned: $r")
    assert(r(3L)._2, s"outlier not pruned: $r")
    assert(r(4L)._1 == 1.0 && !r(4L)._2 && !r(5L)._2,
      s"identical label untouched: $r")
  }

  test("bitsim: hamming counts exactly the flipped signs") {
    // query 0 = ++++ on dims 0–3; candidates flip 0..3 of those signs
    // (sign flips on dims ≥ 4 don't exist — zeros pack as 0 bits).
    // Flipping k signs among the 4 hot dims costs hamming k; vec 21
    // flips a dim-33 zero to positive instead (second word, +1).
    val d = embDir(Seq(
      (0L, vec(1, 1, 1, 1), 0),
      (20L, vec(1, 1, 1, 1), 0), // hamming 0
      (21L, vec(1, 1, 1, 1) .updated(33, 1.0f), 0), // hamming 1, word 2
      (22L, vec(-1, -1, 1, 1), 0), // hamming 2
      (23L, vec(-1, -1, -1, 1), 0), // hamming 3
      (24L, vec(-1, -1, -1, -1), 0))) // hamming 4
    val rows = graft.queries.DedupSim.qEmbedBitsim(spark, d).collect()
      .filter(_.getLong(0) == 0L)
      .map(r => (r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(rows.toSeq == Seq((20L, 0L, 1), (21L, 1L, 2), (22L, 2L, 3),
      (23L, 3L, 4), (24L, 4L, 5)), s"top-5 for query 0: ${rows.toSeq}")
  }

  test("entropy: one-type user scores 0 bits, uniform two-type 1 bit") {
    val d = eventsDir(Seq(
      (1L, "2024-03-01 10:00:00", 1L, "view", 0.0),
      (2L, "2024-03-01 11:00:00", 1L, "view", 0.0),
      (3L, "2024-03-01 12:00:00", 1L, "view", 0.0),
      (4L, "2024-03-01 10:00:00", 2L, "view", 0.0),
      (5L, "2024-03-01 11:00:00", 2L, "click", 0.0)))
    val r = graft.queries.Events.qEventsEntropy(spark, d).collect()
      .map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3), x.getDouble(4))).toMap
    assert(r(1L) == ((3L, 1L, 1.0, 0.0)), s"scripted user: $r")
    assert(r(2L) == ((2L, 2L, 0.5, 1.0)), s"uniform user: $r")
  }

  test("incremental agg: merge equals full rebuild for every cutoff") {
    import graft.queries.Maintain
    val ev = Tables.events(spark, sf)
    val full = Maintain.rollupMerge(
      Maintain.dailyRollup(ev), Maintain.dailyRollup(ev.limit(0)))
      .collect().toSeq
    for (cut <- Seq("2024-01-05", "2024-01-15", "2024-01-28")) {
      val c = expr(s"timestamp'$cut 00:00:00'")
      val merged = Maintain.rollupMerge(
        Maintain.dailyRollup(ev.where(col("ts") < c)),
        Maintain.dailyRollup(ev.where(col("ts") >= c)))
        .collect().toSeq
      assert(merged == full, s"cutoff $cut diverged from rebuild")
    }
  }

  test("incremental agg: three-way split re-merges associatively") {
    import graft.queries.Maintain
    val ev = Tables.events(spark, sf)
    val c1 = expr("timestamp'2024-01-10 00:00:00'")
    val c2 = expr("timestamp'2024-01-20 00:00:00'")
    val full = Maintain.rollupMerge(
      Maintain.dailyRollup(ev), Maintain.dailyRollup(ev.limit(0)))
      .collect().toSeq
    // (s1 ⊕ s2) ⊕ s3: the merged OUTPUT is not re-mergeable (sums are
    // cast to double at the edge), so re-merge the internal states
    val s12 = Maintain.dailyRollup(ev.where(col("ts") < c2))
    val s3 = Maintain.dailyRollup(ev.where(col("ts") >= c2))
    assert(Maintain.rollupMerge(s12, s3).collect().toSeq == full)
  }

  test("ivf stats: populations cover the table, imbalance ≥ 1") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val r = graft.queries.DedupSim
      .qAnnIvfStats(spark, "/root/testdata/sf0.01").collect()(0)
    assert(r.getLong(3) == emb.count(), s"every vector in a cell: $r")
    assert(r.getLong(1) >= 1 && r.getLong(1) <= r.getLong(2),
      s"min/max pop: $r")
    // imbalance = max/mean ≥ 1 by definition (ppm grid)
    assert(r.getLong(4) >= 1000000L, s"imbalance below 1: $r")
  }

  test("threshold sweep is monotone non-increasing") {
    val rows = graft.queries.DedupSim
      .qDedupThresholdSweep(spark, "/root/testdata/sf0.01").collect()
      .map(r => r.getDouble(0) -> r.getLong(1))
    assert(rows.map(_._1).toSeq == Seq(0.3, 0.5, 0.7, 0.9), s"$rows")
    assert(rows.sliding(2).forall(p => p(0)._2 >= p(1)._2),
      s"counts must not increase with threshold: ${rows.toSeq}")
    assert(rows.head._2 > 0, "0.3 tier should admit the sf0.01 pairs")
  }

  test("heatmap shares sum to ~one million ppm") {
    val rows = graft.queries.Events.qEventsHeatmap(spark, sf).collect()
    val total = rows.map(_.getLong(2)).sum
    val share = rows.map(_.getLong(4)).sum
    assert(total == Tables.events(spark, sf).count(), s"cells tile: $total")
    // half-up rounding wobbles each of the ≤168 cells by ≤ half a ppm
    assert(math.abs(share - 1000000L) <= rows.length,
      s"shares sum $share ppm across ${rows.length} cells")
  }

  test("session stats bucket the planted sessions exactly") {
    // user 1: three events inside 10-min gaps (one session, 120 s),
    // then a lone event hours later (singleton session, 0 s)
    val d = eventsDir(Seq(
      (1L, "2024-03-01 10:00:00", 1L, "a", 0.0),
      (2L, "2024-03-01 10:01:00", 1L, "a", 0.0),
      (3L, "2024-03-01 10:02:00", 1L, "a", 0.0),
      (4L, "2024-03-01 18:00:00", 1L, "a", 0.0)))
    val r = graft.queries.Events.qEventsSessionStats(spark, d).collect()
      .map(x => x.getInt(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    assert(r == Map(0 -> ((1L, 1L, 0L)), 1 -> ((1L, 3L, 120L))),
      s"buckets: $r")
  }

  test("wau: rolling windows count planted users exactly") {
    // u1 active Mar 1 only; u2 active Mar 1 and Mar 5. Output days are
    // clipped to actual activity days {1, 5}: on Mar 5, u1 is a
    // 4-day-old active (wau yes, dau no), u2 is fresh.
    val d = eventsDir(Seq(
      (1L, "2024-03-01 10:00:00", 1L, "a", 0.0),
      (2L, "2024-03-01 11:00:00", 2L, "a", 0.0),
      (3L, "2024-03-05 10:00:00", 2L, "a", 0.0)))
    val r = graft.queries.Events.qEventsWau(spark, d).collect()
      .map(x => x.getDate(0).toString ->
        (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    assert(r == Map(
      "2024-03-01" -> ((2L, 2L, 2L)),
      "2024-03-05" -> ((1L, 2L, 2L))), s"wau: $r")
  }

  test("minhash estimate: identical docs score 64/64 and jaccard 1.0") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_r9e_mhe").toString
    val a = (1 to 30).map(i => s"tok$i").mkString(" ")
    val b = (1 to 30).map(i => if (i <= 15) s"tok$i" else s"alt$i")
      .mkString(" ")
    Seq((0L, a, "en", "src1"), (1L, a, "en", "src1"),
      (2L, b, "en", "src1"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.queries.DedupSim.qMinhashEstimate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getInt(2), r.getDouble(3), r.getDouble(4))).toMap
    val ident = rows((0L, 1L))
    assert(ident == ((64, 1.0, 1.0)), s"identical pair: $rows")
    // every estimate is a multiple of 1/64 inside [0, 1], and the
    // half-overlapping doc (if banding surfaced it) reports the true
    // partial jaccard next to its estimate
    rows.values.foreach { case (n, est, jac) =>
      assert(n >= 0 && n <= 64 && est == n / 64.0 &&
        jac >= 0.0 && jac <= 1.0, s"row out of range: $rows")
    }
  }

  test("degree histogram buckets by exact bit length") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_r9e_dh").toString
    // clique {1,2,3} + pendant 3–4 → degrees 2,2,3,1:
    // bucket 0 = {deg 1}, bucket 1 = {deg 2,2,3}
    Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = graft.queries.Graph.qGraphDegreeHist(spark, dir).collect()
      .map(x => x.getInt(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    assert(r == Map(0 -> ((1L, 1L, 1L)), 1 -> ((3L, 2L, 3L))),
      s"histogram: $r")
  }

  test("kcore: pendant peels, clique survives, k is the derived 2") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_r9e_li").toString
    // order 1 = clique {1,2,3,4} (6 edges); order 2 = pendant 1–5.
    // |E|=7, |V|=5 → k = ⌊1.5·7/5⌋ = 2; round 1 peels node 5 (deg 1),
    // the clique (degrees ≥ 3) is then stable.
    (Seq((1L, 1L), (1L, 2L), (1L, 3L), (1L, 4L)) ++ Seq((2L, 1L), (2L, 5L)))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = graft.queries.Graph.qGraphKcore(spark, dir).collect()
      .map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getBoolean(3))).toMap
    assert(r(5L) == ((1L, 2L, false)), s"pendant: $r")
    assert(r(1L) == ((4L, 2L, true)), s"hub: $r")
    assert(Seq(2L, 3L, 4L).forall(n => r(n) == ((3L, 2L, true))),
      s"clique: $r")
  }

  test("keep-best: quality outranks the smaller doc_id in a cluster") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_r9e_docs").toString
    val base = "the quick brown fox jumps over the lazy dog and runs " +
      "through the quiet park in the morning light today"
    val longer = base + " and then the fox rests under a tall tree " +
      "while the sun climbs higher"
    val other = "completely unrelated content about databases treating " +
      "queries quite fast"
    Seq((0L, base, "en", "src1"), (1L, longer, "en", "src1"),
      (2L, other, "en", "src1"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.queries.DedupSim.qDedupKeepBest(spark, dir).collect()
      .map(x => x.getLong(0) ->
        (x.getLong(1), x.getDouble(2), x.getBoolean(3))).toMap
    // docs 0 and 1 are one cluster (labelled by the min id);
    // the LONGER doc 1 outscores doc 0 on length and is the keeper
    assert(r(0L)._1 == 0L && r(1L)._1 == 0L, s"cluster ids: $r")
    assert(r(1L)._2 > r(0L)._2, s"doc 1 must outscore doc 0: $r")
    assert(!r(0L)._3 && r(1L)._3, s"keeper must be doc 1: $r")
    // the singleton is its own cluster and keeps itself
    assert(r(2L) == ((2L, r(2L)._2, true)), s"singleton: $r")
  }

  test("regression: constant-rate series recovers the exact slope") {
    // user 1: value climbs 6.0 every 60 s → slope exactly 0.1/s once
    // the frame fills; the first row's single-point frame has den = 0
    // → NULL. user 2: two rows at the SAME timestamp → den = 0, NULL.
    val d = eventsDir(Seq(
      (1L, "2024-01-01 00:00:00", 1L, "a", 0.0),
      (2L, "2024-01-01 00:01:00", 1L, "a", 6.0),
      (3L, "2024-01-01 00:02:00", 1L, "a", 12.0),
      (4L, "2024-01-01 00:03:00", 1L, "a", 18.0),
      (5L, "2024-01-01 00:04:00", 1L, "a", 24.0),
      (6L, "2024-01-05 00:00:00", 2L, "b", 1.0),
      (7L, "2024-01-05 00:00:00", 2L, "b", 9.0)))
    val r = graft.queries.Windows.qWinRegression(spark, d).collect()
      .map(x => (x.getLong(0), x.getLong(1)) ->
        (if (x.isNullAt(4)) None else Some(x.getDouble(4)))).toMap
    assert(r((1L, 1L)).isEmpty, s"single-point frame: $r")
    (2L to 5L).foreach(e =>
      assert(r((1L, e)).contains(0.1), s"event $e slope: $r"))
    assert(r((2L, 6L)).isEmpty && r((2L, 7L)).isEmpty,
      s"zero time spread must be NULL: $r")
  }

  test("kcore: cascade — a chain below k empties completely") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_r9e_chain").toString
    // path 1–2–3–4: |E|=3, |V|=4 → k = ⌊1.125⌋ = 1 keeps everything;
    // make it a sparser star instead: edges (1,2),(1,3),(1,4),(1,5),
    // |E|=4, |V|=5 → k = ⌊1.2⌋ = 1 also keeps all. Use two disjoint
    // dense orders + isolated pairs to drive k to 2 and watch the
    // pairs cascade out: clique {1,2,3} + pairs (4,5), (6,7) —
    // |E|=5, |V|=7 → k = ⌊1.07⌋ = 1… degrees all ≥ 1, nothing peels.
    // So plant the measured-cascade shape directly: clique {1..5}
    // (10 edges) + chain 5–6, 6–7 → |E|=12, |V|=7, k = ⌊2.57⌋ = 2:
    // round 1 peels 7 (deg 1), round 2 peels 6 (deg now 1), clique
    // stays — the two-round cascade a fixpoint-free single pass
    // would miss.
    (Seq((1L, 1L), (1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)) ++
      Seq((2L, 5L), (2L, 6L)) ++ Seq((3L, 6L), (3L, 7L)))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = graft.queries.Graph.qGraphKcore(spark, dir).collect()
      .map(x => x.getLong(0) -> (x.getLong(2), x.getBoolean(3))).toMap
    assert(r(7L) == ((2L, false)), s"leaf: $r")
    assert(r(6L) == ((2L, false)), s"cascaded middle: $r")
    assert((1L to 5L).forall(n => r(n) == ((2L, true))), s"clique: $r")
  }
}
