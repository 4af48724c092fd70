package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import graft.queries.Maintain

/** Table-maintenance operators: MERGE/tombstone semantics and SCD2
  * interval invariants on a planted changelog. */
class MaintainSpec extends SparkSpec {

  private def ts(min: Int) = new Timestamp(min * 60000L)

  /** (event_id, ts, user_id, event_type, value) in the events shape. */
  private def changelog(rows: (Long, Timestamp, Long, String, Double)*): DataFrame = {
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  test("compactChangelog: last writer wins, tombstones delete") {
    val log = changelog(
      (1L, ts(1), 10L, "view", 1.0),
      (2L, ts(2), 10L, "purchase", 9.0), // latest for 10 → survives
      (3L, ts(1), 20L, "view", 2.0),
      (4L, ts(2), 20L, "error", 0.0),    // tombstone is latest → gone
      (5L, ts(3), 30L, "error", 0.0),
      (6L, ts(4), 30L, "signup", 3.0),   // resurrected after tombstone
      // same-timestamp tie: higher event_id wins
      (7L, ts(5), 40L, "view", 4.0),
      (8L, ts(5), 40L, "click", 5.0))
    val out = Maintain.compactChangelog(log).collect()
      .map(r => r.getLong(0) -> ((r.getString(2), r.getDouble(3)))).toMap
    assert(out == Map(
      10L -> (("purchase", 9.0)),
      30L -> (("signup", 3.0)),
      40L -> (("click", 5.0))), s"got $out")
  }

  test("scd2History: intervals chain, versions only at changes") {
    val log = changelog(
      (1L, ts(0), 10L, "view", 0.0),
      (2L, ts(1), 10L, "view", 0.0),     // no change → no version row
      (3L, ts(2), 10L, "purchase", 0.0),
      (4L, ts(3), 10L, "view", 0.0))
    val rows = Maintain.scd2History(log).collect()
      .map(r => (r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    val us = 60000000L
    assert(rows.toSeq == Seq(
      ("view", 0L, 2 * us),          // [t0, t2): the t1 re-view folds in
      ("purchase", 2 * us, 3 * us),
      ("view", 3 * us, -1L)),        // open current version
      s"got ${rows.toSeq}")
  }

  test("scd2Apply equals the full rebuild at EVERY cutoff") {
    import org.apache.spark.sql.functions._
    val log = changelog(
      (1L, ts(0), 10L, "view", 0.0),
      (2L, ts(1), 10L, "view", 0.0),     // continuation across cutoffs
      (3L, ts(2), 10L, "purchase", 0.0),
      (4L, ts(3), 10L, "view", 0.0),
      (5L, ts(1), 20L, "signup", 0.0),   // single-version user
      (6L, ts(4), 30L, "click", 0.0))    // batch-only new user
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    val full = canon(Maintain.scd2History(log))
    // every split point, including all-hist and all-batch
    for (cutMin <- 0 to 5) {
      val cut = ts(cutMin)
      val inc = Maintain.scd2Apply(
        Maintain.scd2History(log.where(col("ts") < lit(cut))),
        log.where(col("ts") >= lit(cut)))
      assert(canon(inc) == full, s"cutoff at minute $cutMin diverged")
    }
  }

  test("qualityAudit counts planted violations and FK orphans") {
    import spark.implicits._
    val li = Seq(
      (1L, 10.0, 0.05, 100.0),  // clean
      (1L, 99.0, 0.05, 100.0),  // quantity out of range
      (2L, 10.0, 0.50, 100.0),  // discount out of range
      (9L, 10.0, 0.05, -5.0))   // bad price AND orphan orderkey
      .toDF("l_orderkey", "l_quantity", "l_discount", "l_extendedprice")
    val orders = Seq(1L, 2L).toDF("o_orderkey")
    val out = Maintain.qualityAudit(li, orders).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(
      "quantity_range" -> ((4L, 1L)),
      "discount_range" -> ((4L, 1L)),
      "price_positive" -> ((4L, 1L)),
      "orderkey_resolves" -> ((4L, 1L))), s"got $out")
  }

  test("scd2 intervals on real data partition each user's timeline") {
    val hist = Maintain.qScd2History(spark, sf).collect()
    hist.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(2))
      // exactly one open (NULL valid_to) version per user, and it's last
      assert(sorted.count(_.isNullAt(3)) == 1)
      assert(sorted.last.isNullAt(3))
      // each version ends exactly where the next begins
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(3) == b.getLong(2))
        case _ =>
      }
    }
  }
}
