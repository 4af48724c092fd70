package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Round-9 fourth-session additions: hourly autocorrelation, shingle
  * containment, common-neighbor link prediction, and the deterministic
  * shard assignment. Planted fixtures run the registered queries
  * unmodified against hand-computed answers. */
class Round9dOperatorsSpec extends SparkSpec {

  private def eventsDir(rows: Seq[(Long, String, Long, String, Double)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_r9d_ev").toString
    rows.toDF("event_id", "ts_str", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("ts_str")))
      .drop("ts_str")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("autocorr: alternating hourly series gives r = -1, +1, -1") {
    // one event in hours 0,2,4,6 → dense counts [1,0,1,0,1,0,1]
    val d = eventsDir(Seq(
      (1L, "2024-03-01 10:00:00", 1L, "a", 0.0),
      (2L, "2024-03-01 12:00:00", 1L, "a", 0.0),
      (3L, "2024-03-01 14:00:00", 1L, "a", 0.0),
      (4L, "2024-03-01 16:00:00", 1L, "a", 0.0)))
    val rows = graft.queries.Events.qEventsAutocorr(spark, d).collect()
    assert(rows.length == 3, s"expected 3 lags, got ${rows.toSeq}")
    val byLag = rows.map(r => r.getInt(1) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(byLag(1) == ((6L, -1.0)), s"lag1: $byLag")
    assert(byLag(2) == ((5L, 1.0)), s"lag2: $byLag")
    assert(byLag(3) == ((4L, -1.0)), s"lag3: $byLag")
  }

  test("autocorr: zero-variance series reports NULL, not a crash") {
    // one event every hour → constant series, undefined correlation
    val d = eventsDir((0 until 5).map(h =>
      (h.toLong, f"2024-03-01 $h%02d:00:00", 1L, "b", 0.0)))
    val rows = graft.queries.Events.qEventsAutocorr(spark, d).collect()
    assert(rows.length == 3)
    assert(rows.forall(_.isNullAt(3)), s"expected NULL r: ${rows.toSeq}")
  }

  test("containment catches a subset quote that jaccard misses") {
    // doc 1 is a contiguous 12-token slice of doc 0: containment 1.0,
    // while jaccard stays far below the 0.3 near-dup threshold
    val long = (1 to 60).map(i => s"w$i").mkString(" ")
    val quote = (20 to 31).map(i => s"w$i").mkString(" ")
    val docs = spark.createDataFrame(Seq(
      (0L, long), (1L, quote),
      (2L, "entirely different text about other things altogether")))
      .toDF("doc_id", "text")
    val cont = Dedup.ngramContainmentPairs(
      docs, "doc_id", "text", blockCols = Nil, n = 3, threshold = 0.5)
      .collect()
    assert(cont.length == 1, s"expected one pair: ${cont.toSeq}")
    assert(cont(0).getLong(0) == 0L && cont(0).getLong(1) == 1L)
    assert(cont(0).getDouble(3) == 1.0, s"containment: ${cont(0)}")
    val jac = Dedup.ngramJaccardPairs(
      docs, "doc_id", "text", blockCols = Nil, n = 3, threshold = 0.3)
      .collect()
    assert(jac.isEmpty, s"jaccard should miss the quote: ${jac.toSeq}")
  }

  test("common neighbors: path graph predicts exactly the 2-hop pairs") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_r9d_li").toString
    // orders {1,2}, {2,3}, {3,4} → path 1-2-3-4
    Seq((1L, 1L), (1L, 2L), (2L, 2L), (2L, 3L), (3L, 3L), (3L, 4L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows = graft.queries.Graph.qGraphCommonNeighbors(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3),
        r.getDouble(4)))
    // every 2-hop pair through a degree-2 center: cn=1, ra=0.5;
    // adjacent pairs and self-returns are excluded
    assert(rows.toSet == Set(
      (1L, 3L, 1L, 1, 0.5), (2L, 4L, 1L, 1, 0.5),
      (3L, 1L, 1L, 1, 0.5), (4L, 2L, 1L, 1, 0.5)), s"got ${rows.toSeq}")
  }

  test("shard assign: permutation is complete, dense, and offset-exact") {
    val out = graft.queries.Corpus.qShardAssign(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getLong(4)))
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    val nShards = graft.queries.Corpus.shardCountFor(nDocs)
    assert(out.length == nDocs, "every doc appears exactly once")
    assert(out.map(_._1).distinct.length == out.length, "no doc repeats")
    assert(out.forall(t => t._2 >= 0 && t._2 < nShards))
    out.groupBy(_._2).foreach { case (shard, rows) =>
      val sorted = rows.sortBy(_._3)
      assert(sorted.map(_._3).toSeq == (1 to rows.length),
        s"shard $shard ranks not dense")
      // tok_offset is the exact running token sum in shard order
      var acc = 0L
      sorted.foreach { t =>
        assert(t._5 == acc, s"shard $shard rank ${t._3}: offset ${t._5} != $acc")
        acc += t._4
      }
    }
  }

  test("transitions: counts, totals, and half-tie-safe probabilities") {
    // user 1 emits a,b,a,c → pairs (a,b) (b,a) (a,c); user 2 emits
    // a,c → one more (a,c). From 'a': b 1/3, c 2/3 — thirds exercise
    // the integer round-half-up (333333.3→333333, 666666.7→666667)
    val d = eventsDir(Seq(
      (1L, "2024-03-01 10:00:00", 1L, "a", 0.0),
      (2L, "2024-03-01 10:01:00", 1L, "b", 0.0),
      (3L, "2024-03-01 10:02:00", 1L, "a", 0.0),
      (4L, "2024-03-01 10:03:00", 1L, "c", 0.0),
      (5L, "2024-03-01 11:00:00", 2L, "a", 0.0),
      (6L, "2024-03-01 11:01:00", 2L, "c", 0.0)))
    val rows = graft.queries.Events.qEventsTransitions(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(rows(("a", "b")) == ((1L, 3L, 0.333333)), s"got $rows")
    assert(rows(("a", "c")) == ((2L, 3L, 0.666667)), s"got $rows")
    assert(rows(("b", "a")) == ((1L, 1L, 1.0)), s"got $rows")
    assert(rows.size == 3, s"unexpected transitions: $rows")
  }

  test("snapshot diff classifies added/removed/changed/unchanged") {
    import spark.implicits._
    val old = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "v")
    val neu = Seq((1L, "x"), (2L, "Y2"), (4L, "w")).toDF("k", "v")
    val out = graft.queries.Maintain.snapshotDiff(
        old, neu, "k", concat_ws("|", col("k"), col("v")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("added" -> 1L, "removed" -> 1L,
      "changed" -> 1L, "unchanged" -> 1L), s"got $out")
  }

  test("forecast: periodic load scores zero error, shifted load exactly") {
    // type a repeats day 1 exactly on day 2 → MAE = MAPE = 0;
    // type b grows 4→5 at hour 0 → sae=1 over n_eval=2 → mae 0.5,
    // one positive-actual hour with |err|/actual = 1/5 → mape 0.2
    val d = eventsDir(
      Seq((1L, "2024-03-01 00:10:00", 1L, "a", 0.0),
        (2L, "2024-03-01 00:20:00", 1L, "a", 0.0),
        (3L, "2024-03-01 01:00:00", 1L, "a", 0.0),
        (4L, "2024-03-02 00:10:00", 1L, "a", 0.0),
        (5L, "2024-03-02 00:20:00", 1L, "a", 0.0),
        (6L, "2024-03-02 01:00:00", 1L, "a", 0.0)) ++
      (1 to 4).map(i => (100L + i, "2024-03-01 00:30:00", 2L, "b", 0.0)) ++
      (1 to 5).map(i => (200L + i, "2024-03-02 00:30:00", 2L, "b", 0.0)))
    val rows = graft.queries.Events.qEventsForecast(spark, d).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(rows("a") == ((2L, 2L, 0.0, 0.0)), s"got $rows")
    assert(rows("b") == ((2L, 1L, 0.5, 0.2)), s"got $rows")
  }

  test("skew report: planted hot key yields exact straggler factor") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_r9d_skew").toString
    // orderkey [1,1,1,2]: n_keys=2, max=3 → straggler 3/(4/2)=1.5,
    // top1 3/4; partkey and suppkey perfectly uniform → 1.0
    Seq((1L, 10L, 100L), (1L, 11L, 101L), (1L, 12L, 102L), (2L, 13L, 103L))
      .toDF("l_orderkey", "l_partkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows = graft.queries.Maintain.qSkewReport(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          // selfjoin_rows closes to STRING (exact-wide-integer rule)
          r.getString(4).toLong,
          r.getDouble(5), r.getDouble(6)))).toMap
    // selfjoin_rows = Σc²: hot orderkey 3²+1²=10, uniform keys 4·1²=4
    assert(rows("l_orderkey") == ((2L, 4L, 3L, 10L, 1.5, 0.75)), s"got $rows")
    assert(rows("l_partkey") == ((4L, 4L, 1L, 4L, 1.0, 0.25)), s"got $rows")
    assert(rows("l_suppkey") == ((4L, 4L, 1L, 4L, 1.0, 0.25)), s"got $rows")
  }

  test("transitions: probabilities sum to 1 per source on real data") {
    val rows = graft.queries.Events.qEventsTransitions(spark, sf).collect()
    val bySrc = rows.groupBy(_.getString(0))
    assert(bySrc.nonEmpty)
    bySrc.foreach { case (src, rs) =>
      val total = rs.map(_.getDouble(4)).sum
      // each prob is half-up-rounded at 1e-6; ≤ |types| terms of
      // ≤ 0.5e-6 rounding each
      assert(math.abs(total - 1.0) <= 1e-5 * rs.length,
        s"$src probabilities sum to $total")
    }
  }

  test("autocorr: r stays within [-1, 1] on real data") {
    val rows = graft.queries.Events.qEventsAutocorr(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.filterNot(_.isNullAt(3)).foreach { r =>
      assert(math.abs(r.getDouble(3)) <= 1.0, s"out-of-range r: $r")
    }
  }

  test("dwell: per-(user,type) gaps with exact mean and discrete quantiles") {
    // user 1 type a at 0/60/180 s → gaps 60 s, 120 s; user 2 type a at
    // 0/300 s → gap 300 s. mean = 160 s; disc p50 = 120 s, p95 = 300 s.
    // user 1's type-b event must not bridge into the type-a stream.
    val d = eventsDir(Seq(
      (1L, "2024-03-01 10:00:00", 1L, "a", 0.0),
      (2L, "2024-03-01 10:01:00", 1L, "a", 0.0),
      (3L, "2024-03-01 10:03:00", 1L, "a", 0.0),
      (4L, "2024-03-01 10:00:30", 1L, "b", 0.0),
      (5L, "2024-03-01 11:00:00", 2L, "a", 0.0),
      (6L, "2024-03-01 11:05:00", 2L, "a", 0.0)))
    val rows = graft.queries.Events.qEventsDwell(spark, d).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4)))).toMap
    assert(rows("a") == ((3L, 160.0, 120000000L, 300000000L)), s"got $rows")
    assert(!rows.contains("b"), s"single event has no gap: $rows")
  }

  test("khop: BFS takes the shortest route and stops at the limit") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_r9d_khop").toString
    // path 1-30-31-32-33 plus shortcut 1-32: node 32 is 2 hops via
    // the path's tail... no — 1-32 direct = 1 hop; 33 = 2 hops via
    // the shortcut, NOT 4 via the path; 34 isolated beyond reach
    Seq((1L, 1L), (1L, 30L), (2L, 30L), (2L, 31L), (3L, 31L), (3L, 32L),
      (4L, 32L), (4L, 33L), (5L, 1L), (5L, 32L), (6L, 34L), (6L, 35L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows = graft.queries.Graph.qGraphKhop(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows == Map(1L -> 0, 30L -> 1, 32L -> 1, 31L -> 2, 33L -> 2),
      s"got $rows")
  }

  test("assortativity: star is -1, regular graph has no defined r") {
    import spark.implicits._
    // star K1,3: hub degree 3 vs leaf degree 1 on every edge end —
    // perfectly disassortative, r = −1 by hand arithmetic
    val star = Files.createTempDirectory("graft_r9d_star").toString
    Seq((1L, 100L), (1L, 1L), (2L, 100L), (2L, 2L), (3L, 100L), (3L, 3L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$star/lineitem.parquet")
    val rs = graft.queries.Graph.qGraphAssortativity(spark, star).collect()(0)
    assert(rs.getLong(0) == 6L && rs.getDouble(1) == -1.0, s"star: $rs")
    // triangle: every degree 2 → zero variance → NULL, not a crash
    val tri = Files.createTempDirectory("graft_r9d_tri").toString
    Seq((1L, 1L), (1L, 2L), (2L, 2L), (2L, 3L), (3L, 3L), (3L, 1L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$tri/lineitem.parquet")
    val rt = graft.queries.Graph.qGraphAssortativity(spark, tri).collect()(0)
    assert(rt.getLong(0) == 6L && rt.isNullAt(1), s"triangle: $rt")
  }

  test("drift: shifted distribution scores chi2 by hand, stable scores 0") {
    // type a: first half all 1.0 (bucket 0), second half all 9.0
    // (bucket 9) → per cell (4 vs 0): (4−2)²/2 + (0−2)²/2 = 4; two
    // cells → chi² = 8. type b: constant value, balanced halves → 0.
    val d = eventsDir(
      (1 to 4).map(i => (i.toLong, s"2024-03-01 10:0$i:00", 1L, "a", 1.0)) ++
      (1 to 4).map(i => (10L + i, s"2024-03-01 11:5$i:00", 1L, "a", 9.0)) ++
      Seq((21L, "2024-03-01 10:00:00", 2L, "b", 5.0),
        (22L, "2024-03-01 10:10:00", 2L, "b", 5.0),
        (23L, "2024-03-01 11:20:00", 2L, "b", 5.0),
        (24L, "2024-03-01 11:30:00", 2L, "b", 5.0)))
    val rows = graft.queries.Events.qEventsDrift(spark, d).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(rows("a") == ((4L, 4L, 2L, 8.0)), s"got $rows")
    assert(rows("b") == ((2L, 2L, 1L, 0.0)), s"got $rows")
  }

  test("shard count is size-derived with the MinShards floor") {
    import graft.queries.Corpus.shardCountFor
    // tiny corpus floors at 8; big corpora scale ⌈n/1000⌉ so the
    // per-shard window stays ≈ 1000 docs at any size
    assert(shardCountFor(1L) == 8 && shardCountFor(500L) == 8)
    assert(shardCountFor(8000L) == 8 && shardCountFor(8001L) == 9)
    assert(shardCountFor(100000L) == 100)
    assert(shardCountFor(100000000L) == 100000)
  }

  test("shard assign is reproducible run to run") {
    val a = graft.queries.Corpus.qShardAssign(spark, sf).collect()
    val b = graft.queries.Corpus.qShardAssign(spark, sf).collect()
    assert(a.sameElements(b), "same seed+epoch must give identical layout")
  }
}
