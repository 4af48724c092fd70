package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Round-9 third-session additions: sweep-line concurrency, per-user
  * EWMA smoothing, and the degree-oriented triangle census. Planted
  * fixtures are written as parquet into a temp table dir so the
  * registered queries run unmodified against known answers. */
class Round9cOperatorsSpec extends SparkSpec {

  private def eventsDir(rows: Seq[(Long, String, Long, String, Double)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_r9c_ev").toString
    rows.toDF("event_id", "ts_str", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("ts_str")))
      .drop("ts_str")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("concurrency: midnight-spanning intervals carry into the next day") {
    // three 60 s intervals (value=0) open across midnight; one more
    // starts the next day while all three are still open
    val d = eventsDir(Seq(
      (1L, "2024-03-01 23:59:30", 1L, "a", 0.0),
      (2L, "2024-03-01 23:59:40", 2L, "a", 0.0),
      (3L, "2024-03-01 23:59:50", 3L, "a", 0.0),
      (4L, "2024-03-02 00:00:10", 4L, "a", 0.0)))
    val rows = graft.queries.Events.qEventsConcurrency(spark, d).collect()
    assert(rows.length == 2)
    val day1 = rows(0); val day2 = rows(1)
    assert(day1.getLong(1) == 3L && day1.getLong(2) == 3L,
      s"day1 expected 3 starts / max 3, got $day1")
    // carried 3 + the new start = 4 concurrent on day 2
    assert(day2.getLong(1) == 1L && day2.getLong(2) == 4L,
      s"day2 expected 1 start / max 4 (carry), got $day2")
  }

  test("concurrency: touching intervals count as concurrent (tie rule)") {
    // second interval starts exactly when the first ends (60 s later):
    // starts sort before ends at the same instant, so max = 2
    val d = eventsDir(Seq(
      (1L, "2024-03-01 10:00:00", 1L, "a", 0.0),
      (2L, "2024-03-01 10:01:00", 2L, "a", 0.0)))
    val rows = graft.queries.Events.qEventsConcurrency(spark, d).collect()
    assert(rows.length == 1 && rows(0).getLong(2) == 2L,
      s"touching intervals should overlap, got ${rows.toSeq}")
  }

  test("ewma: truncated exponential kernel matches hand arithmetic") {
    val d = eventsDir(Seq(
      (1L, "2024-03-01 10:00:00", 7L, "a", 10.0),
      (2L, "2024-03-01 10:05:00", 7L, "a", 20.0),
      (3L, "2024-03-01 10:10:00", 7L, "a", 30.0),
      (4L, "2024-03-01 09:00:00", 8L, "a", 5.0)))
    val rows = graft.queries.Events.qEventsEwma(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // α=0.3: y1=3.0; y2=.3·20+.21·10=8.1; y3=.3·30+.21·20+.147·10=14.67
    assert(math.abs(rows((7L, 1L)) - 3.0) < 1e-9)
    assert(math.abs(rows((7L, 2L)) - 8.1) < 1e-9)
    assert(math.abs(rows((7L, 3L)) - 14.67) < 1e-9)
    // other users' history never leaks across the partition
    assert(math.abs(rows((8L, 4L)) - 1.5) < 1e-9)
  }

  test("robust anomaly: planted spike flagged, threshold immune to it") {
    // 20 inliers around 10 (jitter keeps MAD > 0) + one 1000 spike;
    // median/MAD ignore the spike entirely, so only it crosses 3.5
    val inliers = (0 until 20).map(i =>
      (i.toLong, f"2024-03-01 10:${i}%02d:00", i.toLong, "a", 10.0 + i * 0.1))
    val d = eventsDir(inliers :+
      ((99L, "2024-03-01 11:00:00", 99L, "a", 1000.0)))
    val rows = graft.queries.Events.qEventsAnomalyRobust(spark, d).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(99L),
      s"expected only the planted spike, got ${rows.toSeq}")
    assert(rows(0).getDouble(3) > 100.0, "spike score should dwarf 3.5")
  }

  test("changepoint: a planted level shift flags at its boundary") {
    // 30 hourly buckets at value 10, then 30 at 200: the true change
    // point (first high bucket) must carry the MAXIMUM shift
    val rows = (0 until 60).map { h =>
      val day = 1 + h / 24; val hh = h % 24
      (h.toLong, f"2024-03-$day%02d $hh%02d:30:00", h.toLong, "a",
        if (h < 30) 10.0 else 200.0)
    }
    val d = eventsDir(rows)
    val out = graft.queries.Events.qEventsChangepoint(spark, d).collect()
    assert(out.nonEmpty, "level shift not detected")
    // the max shift (|200−10| exactly) brackets the boundary: both the
    // last low bucket (29) and the first high one (30) see 12 clean
    // buckets on each side
    val tops = out.filter(_.getDouble(4) == 190.0).map { r =>
      val z = r.getTimestamp(1).toInstant.atZone(java.time.ZoneOffset.UTC)
      z.getHour + 24 * (z.getDayOfMonth - 1)
    }
    assert(tops.toSet == Set(29, 30),
      s"max shift should bracket the boundary, got ${tops.toSeq}: " +
        s"${out.toSeq}")
  }

  test("kmv overlap: inclusion-exclusion lands near the exact intersect") {
    val r = graft.queries.Agg.qApproxOverlap(spark, sf).collect()(0)
    val (estOv, nExact) = (r.getDouble(3), r.getLong(4))
    assert(nExact > 0, s"fixture should have overlapping audiences: $r")
    // k=64 KMV: exact below 64 distinct, ~12% std err above — 0.5 is
    // a loose sanity band, not the estimator's real accuracy
    assert(math.abs(estOv - nExact) <= math.max(0.5 * nExact, 1.0),
      s"overlap estimate implausibly far: $r")
  }

  test("triangles: planted census counts each triangle exactly once") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_r9c_li").toString
    // order 1 = triangle {1,2,3}; order 2 = pendant edge 3-4;
    // order 3 repeats edge 1-2 (must dedup, not double-count)
    Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 1L), (3L, 2L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = graft.queries.Graph.qGraphTriangles(spark, dir).collect()(0)
    assert(r.getLong(0) == 4L, s"n_nodes: $r")
    assert(r.getLong(1) == 4L, s"n_edges: $r")
    // deg = (2,2,3,1) → wedges = 1+1+3+0 = 5; one triangle; cc = 3/5
    assert(r.getLong(2) == 5L, s"n_wedges: $r")
    assert(r.getLong(3) == 1L, s"n_triangles: $r")
    assert(math.abs(r.getDouble(4) - 0.6) < 1e-9, s"clustering_coeff: $r")
    // local coefficients: every triangle corner is credited exactly
    // once — 1.0 for the degree-2 corners, 1/3 for the hub, 0 pendant
    val cc = graft.queries.Graph.qGraphClustering(spark, dir).collect()
      .map(c => c.getLong(0) -> (c.getLong(2), c.getDouble(3))).toMap
    assert(cc(1L) == ((1L, 1.0)) && cc(2L) == ((1L, 1.0)), s"cc: $cc")
    assert(cc(3L)._1 == 1L && math.abs(cc(3L)._2 - 0.333333) < 1e-9)
    assert(cc(4L) == ((0L, 0.0)), s"pendant node: $cc")
  }

  test("triangles: hub orientation sends no wedges out of the hub") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    // star K1,5 (hub 100): zero triangles, all edges point INTO the
    // hub under degree orientation, so the wedge join emits nothing
    val dir = Files.createTempDirectory("graft_r9c_star").toString
    (1L to 5L).map(i => (i, 100L)).flatMap(p => Seq((p._1, p._1), (p._1, 100L)))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val df = graft.queries.Graph.qGraphTriangles(spark, dir)
    val r = df.collect()(0)
    assert(r.getLong(1) == 5L && r.getLong(3) == 0L, s"star census: $r")
    assert(r.getLong(2) == 10L, s"star wedges (C(5,2)): $r")
    // plan discipline: equi-joins and aggregates only — no window
    val wins = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.isEmpty, "triangle census should not need a window")
  }
}
