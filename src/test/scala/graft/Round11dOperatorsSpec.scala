package graft

import java.nio.file.Files
import java.security.MessageDigest
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-11 fourth-wave additions: out-of-fold target encoding,
  * higher-moment shape statistics, inter-arrival burstiness, and the
  * sliding-window rate-limiter audit. */
class Round11dOperatorsSpec extends SparkSpec {

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  private def events(rows: (Long, Timestamp, Long, String, Double)*): DataFrame = {
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  /** The query's entity→fold assignment, replicated bit for bit. */
  private def fold(custkey: Long): Int = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(custkey.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 6)
    math.floor(java.lang.Long.parseLong(hex, 16) / 16777216.0 * 5).toInt
  }

  test("target encoding: out-of-fold means are exact and leak-proof") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_te").toString
    // segment A customers 1..10 spend 100.00 each, B 11..20 spend 300.00
    (1L to 20L).map(k =>
        (k, if (k <= 10) "A" else "B"))
      .toDF("c_custkey", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    def writeOrders(bumped: Option[Long]): Unit =
      (1L to 20L).map(k =>
          (k * 100L, k,
            (if (k <= 10) 100.0 else 300.0) *
              (if (bumped.contains(k)) 2.0 else 1.0)))
        .toDF("o_orderkey", "o_custkey", "o_totalprice")
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    writeOrders(None)
    val r1 = graft.queries.Maintain.qTargetEncoding(spark, dir).collect()
    // constant per-segment spend → every populated cell's out-of-fold
    // mean is exactly the segment constant in cents
    r1.foreach { r =>
      val seg = r.getString(0)
      if (!r.isNullAt(3))
        assert(r.getLong(3) == (if (seg == "A") 10000L else 30000L),
          s"row $r")
    }
    // cells tile the orders: sum of (n_t - n_oof) over one segment's
    // folds... instead check each segment's fold populations add up
    val nA = r1.filter(_.getString(0) == "A").map(_.getLong(2)).distinct
    assert(r1.nonEmpty && nA.forall(n => n >= 0 && n <= 10))
    // leak-proofness: doubling a fold-f customer's spend must not move
    // its own fold's encoding (it only feeds the OTHER folds)
    val victim = 1L
    val f = fold(victim)
    val before = r1.filter(r => r.getString(0) == "A" &&
      r.getInt(1) == f).map(r => (r.getLong(2), r.getLong(3))).toSeq
    writeOrders(Some(victim))
    val r2 = graft.queries.Maintain.qTargetEncoding(spark, dir).collect()
    val after = r2.filter(r => r.getString(0) == "A" &&
      r.getInt(1) == f).map(r => (r.getLong(2), r.getLong(3))).toSeq
    assert(before == after,
      s"fold $f encoding moved with its own member's target: " +
        s"$before -> $after")
    // ...while some other fold's encoding does move
    val movedA = r2.filter(r => r.getString(0) == "A" &&
      r.getInt(1) != f && !r.isNullAt(3)).map(_.getLong(3))
    assert(movedA.exists(_ != 10000L), "no other fold saw the bump")
  }

  test("moments: hand-computed skewness and kurtosis on planted quantities") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_mom").toString
    ((1 to 5).map(q => ("A", q.toDouble)) ++
      Seq(("B", 1.0), ("B", 1.0), ("B", 1.0), ("B", 9.0)))
      .toDF("l_returnflag", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = graft.queries.Agg.qAggMoments(spark, dir).collect()
      .map(x => x.getString(0) ->
        ((x.getLong(1), x.getDouble(2), x.getDouble(3), x.getDouble(4),
          x.getDouble(5)))).toMap
    // A = {1..5}: mean 3, m2 2, symmetric → skew 0, kurt 6.8/4 - 3
    assert(r("A") == ((5L, 3.0, 2.0, 0.0, -1.3)), s"got ${r("A")}")
    // B = {1,1,1,9}: mean 3, m2 12, m3 48 → skew 2/sqrt(3), m4 336
    assert(r("B")._3 == 12.0 && r("B")._2 == 3.0)
    assert(r("B")._4 == 1.154701, s"got ${r("B")._4}")
    assert(r("B")._5 == -0.666667, s"got ${r("B")._5}")
  }

  test("burstiness: periodic is -1, planted mixed gaps close exactly") {
    val dir = Files.createTempDirectory("graft_burst").toString
    events(
      // user 1, type a: gaps 10, 10 → sigma 0 → B = -1
      (1L, ts(0), 1L, "a", 0.0), (2L, ts(10), 1L, "a", 0.0),
      (3L, ts(20), 1L, "a", 0.0),
      // user 2, type b: gaps 10, 30 → mu 20 sigma 10 → B = -1/3
      (4L, ts(0), 2L, "b", 0.0), (5L, ts(10), 2L, "b", 0.0),
      (6L, ts(40), 2L, "b", 0.0))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.queries.Events.qEventsBurstiness(spark, dir).collect()
      .map(x => x.getString(0) ->
        ((x.getLong(1), x.getDouble(2), x.getDouble(3), x.getDouble(4),
          x.getDouble(5)))).toMap
    assert(r("a") == ((2L, 10.0, 0.0, 0.0, -1.0)), s"got ${r("a")}")
    assert(r("b") == ((2L, 20.0, 10.0, 0.5, -0.333333)), s"got ${r("b")}")
  }

  test("rate limit: sliding 60s window verdicts on planted bursts") {
    val dir = Files.createTempDirectory("graft_rate").toString
    val burst = (0 to 6).map(i =>
      (i + 1L, ts(i.toLong), 1L, "a", 0.0))
    val sparse = Seq((10L, ts(1000), 2L, "a", 0.0),
      (11L, ts(2000), 2L, "a", 0.0))
    val boundary = Seq(
      // exactly 60s apart: the first falls OUT of the second's window
      (20L, ts(0), 3L, "c", 0.0), (21L, ts(60), 3L, "c", 0.0),
      // 59s apart: still inside
      (30L, ts(0), 4L, "d", 0.0), (31L, ts(59), 4L, "d", 0.0))
    events(burst ++ sparse ++ boundary: _*)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.queries.Events.qEventsRateLimit(spark, dir).collect()
      .map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4),
          x.getLong(5), x.getLong(6)))).toMap
    // type a: 9 events, c60 peaks at 7, events 6 and 7 throttled;
    // one of two users affected
    assert(r("a") == ((9L, 2L, 2000000L / 9, 7L, 2L, 1L)),
      s"got ${r("a")}")
    assert(r("c") == ((2L, 0L, 0L, 1L, 1L, 0L)), s"got ${r("c")}")
    assert(r("d") == ((2L, 0L, 0L, 2L, 1L, 0L)), s"got ${r("d")}")
  }
}
