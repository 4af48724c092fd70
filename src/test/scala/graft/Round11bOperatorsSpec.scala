package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-11 second-wave additions: point-in-time join boundary
  * semantics, FK-integrity audit, join-cardinality estimation,
  * session gap-timeout ladder, l-diversity, association rules. */
class Round11bOperatorsSpec extends SparkSpec {

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  /** (event_id, ts, user_id, event_type, value) in the events shape. */
  private def events(rows: (Long, Timestamp, Long, String, Double)*): DataFrame = {
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  test("pit join: boundary purchase takes the version opening on its own microsecond") {
    // u1: view@0, click@10, purchase@10 — the purchase's timestamp IS
    // a version boundary; valid_from <= ts must pick the NEW state
    val r = graft.queries.Maintain.pitJoin(events(
        (1L, ts(0), 1L, "view", 0.0),
        (2L, ts(10), 1L, "click", 0.0),
        (3L, ts(10), 1L, "purchase", 5.0)))
      .collect().map(x => x.getLong(0) ->
        ((Option(x.getString(3)), x.getDouble(5)))).toMap
    assert(r == Map(3L -> ((Some("click"), 5.0))), s"got $r")
  }

  test("pit join: cold purchase reports NULL state; later ones see prior browsing state only") {
    // u2: purchase@5 (no browsing state yet), view@6, purchase@7,
    // click@8, purchase@8 (same-instant state change applies)
    val r = graft.queries.Maintain.pitJoin(events(
        (1L, ts(5), 2L, "purchase", 1.0),
        (2L, ts(6), 2L, "view", 0.0),
        (3L, ts(7), 2L, "purchase", 2.0),
        (4L, ts(8), 2L, "click", 0.0),
        (5L, ts(8), 2L, "purchase", 3.0)))
      .collect().map(x => x.getLong(0) -> Option(x.getString(3))).toMap
    assert(r == Map(1L -> None, 3L -> Some("view"), 5L -> Some("click")),
      s"got $r")
  }

  test("pit join: zero-length version from two same-instant changes never matches") {
    // u3: view@0, then click@3 AND error@3 (event_id order) — the
    // click version is zero-length [3,3); a purchase@4 must see error
    val r = graft.queries.Maintain.pitJoin(events(
        (1L, ts(0), 3L, "view", 0.0),
        (2L, ts(3), 3L, "click", 0.0),
        (3L, ts(3), 3L, "error", 0.0),
        (4L, ts(4), 3L, "purchase", 9.0)))
      .collect().map(x => (Option(x.getString(3)), x.getLong(4)))
    assert(r.toSeq == Seq((Some("error"), 3000000L)), s"got ${r.toSeq}")
  }

  test("pit join equals the naive interval join on a planted timeline") {
    val ev = events(
      (1L, ts(0), 1L, "view", 0.0), (2L, ts(10), 1L, "click", 0.0),
      (3L, ts(11), 1L, "purchase", 1.0), (4L, ts(20), 1L, "view", 0.0),
      (5L, ts(25), 1L, "purchase", 2.0), (6L, ts(2), 2L, "purchase", 3.0),
      (7L, ts(3), 2L, "error", 0.0), (8L, ts(9), 2L, "purchase", 4.0))
    val merged = graft.queries.Maintain.pitJoin(ev)
      .select("event_id", "state_at", "state_since_us")
      .collect().map(r =>
        (r.getLong(0), Option(r.getString(1)), Option(r.get(2)))).toSet
    val evTs = ev.withColumn("ts_us", unix_micros(col("ts")))
    val hist = graft.queries.Maintain.scd2History(
      evTs.where(col("event_type") =!= "purchase"))
    val naive = evTs.where(col("event_type") === "purchase").as("p")
      .join(hist.as("h"),
        col("p.user_id") === col("h.user_id") &&
          col("h.valid_from_us") <= col("p.ts_us") &&
          (col("h.valid_to_us").isNull ||
            col("p.ts_us") < col("h.valid_to_us")), "left")
      .select(col("p.event_id"), col("h.event_type"),
        col("h.valid_from_us"))
      .collect().map(r =>
        (r.getLong(0), Option(r.getString(1)), Option(r.get(2)))).toSet
    assert(merged == naive, s"merge=$merged naive=$naive")
  }

  test("fk audit counts orphans and unreferenced parents on a planted edge") {
    import spark.implicits._
    val child = Seq(1L, 1L, 2L, 99L).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = graft.queries.Maintain
      .fkAudit(child, "fk", parent, "pk", "e").collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((4L, 1L, 3L, 1L)), s"got $r")
  }

  test("ref integrity on sf0.001: no orphans, child counts tile to table sizes") {
    val d = "/root/testdata/sf0.001"
    val rows = graft.queries.Maintain.qRefIntegrity(spark, d).collect()
    assert(rows.length == graft.queries.Maintain.FkEdges.length)
    assert(rows.forall(_.getLong(2) == 0L),
      s"synthetic star schema must have no orphans: ${rows.mkString(";")}")
    val nLineitem = Tables.lineitem(spark, d).count()
    val li = rows.filter(_.getString(0).startsWith("lineitem."))
    assert(li.forall(_.getLong(1) == nLineitem))
  }

  test("join-cardinality estimate: exact side equals the materialized self-join count") {
    val d = "/root/testdata/sf0.001"
    val rows = graft.queries.Maintain.qJoinCardEst(spark, d)
      .collect().map(r => r.getString(0) -> r).toMap
    val li = Tables.lineitem(spark, d).select(col("l_partkey"))
    val actual = li.as("a")
      .join(li.as("b"), col("a.l_partkey") === col("b.l_partkey"))
      .count()
    val row = rows("lineitem*lineitem@partkey")
    assert(row.getString(5).toLong == actual,
      s"exact_rows ${row.getString(5)} vs joined $actual")
    // uniformity estimate recomputed from the row's own side stats
    val est = (row.getLong(1) * row.getLong(2)) /
      math.max(row.getLong(3), row.getLong(4))
    assert(row.getLong(6) == est)
    assert(row.getLong(7) == 1000000L * est / actual)
  }

  test("session gap sweep: hand-computed ladder on a planted timeline") {
    // one user, events at 0s/100s/1000s/5000s: gaps 100, 900, 4000
    val ev = events(
      (1L, ts(0), 1L, "view", 0.0), (2L, ts(100), 1L, "view", 0.0),
      (3L, ts(1000), 1L, "view", 0.0), (4L, ts(5000), 1L, "view", 0.0))
    val dir = Files.createTempDirectory("graft_r11b_ev").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.queries.Events.qSessionGapSweep(spark, dir)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    // gap=300: sessions {0,100},{1000},{5000}; active 100s
    assert(r(300L) == ((3L, 1000000L * 4 / 3, 100L)), s"got ${r(300L)}")
    // gap=900: the 900s gap is <= timeout and bridges; 4000s cuts
    assert(r(900L) == ((2L, 2000000L, 1000L)), s"got ${r(900L)}")
    assert(r(1800L) == ((2L, 2000000L, 1000L)))
    assert(r(3600L) == ((2L, 2000000L, 1000L)))
  }

  test("session gap sweep: session count is monotone non-increasing in the timeout") {
    val rows = graft.queries.Events
      .qSessionGapSweep(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(4)))
    assert(rows.map(_._1).toSeq ==
      graft.queries.Events.SessionGapSeconds)
    assert(rows.sliding(2).forall { case Array(a, b) =>
      a._2 >= b._2 && a._3 <= b._3 },
      s"sessions must only merge as the timeout grows: ${rows.mkString(";")}")
  }

  test("l-diversity tiles the customer table and agrees with k-anonymity row totals") {
    val d = "/root/testdata/sf0.001"
    val ld = graft.queries.Governance.qLdiversityAudit(spark, d).collect()
    val n = Tables.customer(spark, d).count()
    assert(ld.map(_.getLong(2)).sum == n)
    assert(ld.forall(r => r.getLong(0) >= 1L && r.getLong(0) <= 5L))
    val ka = graft.queries.Governance.qKanonAudit(spark, d).collect()
    assert(ka.map(_.getLong(2)).sum == n)
  }

  test("association rules: directional confidence on a planted basket set") {
    import spark.implicits._
    // o1{A,B}, o2{A,B}, o3{A}: A→B conf 2/3, B→A conf 1, lift 1
    val dir = Files.createTempDirectory("graft_r11b_li").toString
    Seq((1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L), (3L, 10L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = graft.queries.Agg.qAssocRules(spark, dir).collect()
      .map(x => (x.getLong(0), x.getLong(1)) ->
        ((x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5),
          x.getLong(6)))).toMap
    assert(r((10L, 20L)) == ((2L, 3L, 2L, 666666L, 1000000L)),
      s"got ${r.get((10L, 20L))}")
    assert(r((20L, 10L)) == ((2L, 2L, 3L, 1000000L, 1000000L)),
      s"got ${r.get((20L, 10L))}")
    // B→A outranks A→B: output is confidence-ordered
    assert(r.size == 2)
  }
}
