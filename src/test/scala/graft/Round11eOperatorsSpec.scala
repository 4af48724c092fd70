package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** Round-11 fifth-wave additions: banded interval-overlap join,
  * t-closeness release audit, weight-of-evidence encoding. */
class Round11eOperatorsSpec extends SparkSpec {

  // 2024-01-01 00:00:00 UTC — divisible by 3600, so hour buckets align
  private val base = 1704067200L

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("interval join: planted episode spans midnight, every overlap counted once") {
    import spark.implicits._
    val h = 3600L
    var id = 0L
    def ev(sec: Long, user: Long): (Long, Timestamp, Long, String, Double) = {
      id += 1; (id, ts(sec), user, "view", 0.0)
    }
    // hour counts 1,2,3,4,5,6,9,10 over hours 17..23 of day 0 and hour
    // 0 of day 1 → percentile_disc(.75) = 6 (6th of 8), so the episode
    // is the consecutive qualifying pair {23h day0 (9), 0h day1 (10)}
    val rows = Seq(
      ev(base + 17 * h, 1L),
      ev(base + 18 * h, 2L), ev(base + 18 * h + 1200, 2L), // 20-min gap → 2 sessions
      ev(base + 19 * h, 3L), ev(base + 19 * h + 300, 3L), ev(base + 19 * h + 600, 3L)
    ) ++ Seq(4L, 5L, 6L, 7L).map(u => ev(base + 20 * h + u * 60, u)) ++
      Seq(8L, 9L, 10L, 11L, 12L).map(u => ev(base + 21 * h + u * 60, u)) ++
      Seq(13L, 14L, 15L, 16L, 17L, 18L).map(u => ev(base + 22 * h + u * 60, u)) ++
      // user 100's midnight-crossing session 23:30 → 00:30 (9-min gaps)
      Seq(0L, 9L, 18L, 27L, 36L, 45L, 54L, 60L).map(m =>
        ev(base + 23 * h + 1800 + m * 60, 100L)) ++
      // five singleton sessions inside hour 23 (counts: 4 + 5 = 9)
      Seq(19L, 20L, 21L, 22L, 23L).map(u => ev(base + 23 * h + u * 60, u)) ++
      // six singleton sessions inside hour 0 of day 1 (counts: 4 + 6 = 10)
      Seq(24L, 25L, 26L, 27L, 28L, 29L).map(u => ev(base + 24 * h + u * 60, u))
    val dir = Files.createTempDirectory("graft_ivj").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.queries.Events.qIntervalJoin(spark, dir).collect()
    assert(out.length == 1, s"one episode expected: ${out.mkString(";")}")
    val r = out.head
    val eStart = (base + 23 * h) * 1000000L
    assert(r.getLong(0) == eStart)
    assert(r.getLong(1) == (base + 25 * h) * 1000000L - 1)
    assert(r.getLong(2) == 2 && r.getLong(3) == 10L)
    // overlaps: user 100 (3600 s + 1 μs, counted ONCE despite touching
    // both day buckets) + 11 singleton sessions at 1 μs each
    assert(r.getLong(4) == 12, s"n_sessions: $r")
    assert(r.getLong(5) == 12, s"n_users: $r")
    assert(r.getLong(6) == 3600000001L + 11L, s"overlap_us: $r")
  }

  test("t-closeness: homogeneous and representative classes score by hand") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_tc").toString
    // global: 8 customers, segments A:5 B:1 C:1 D:1
    // class (1, band 0): AAAA (homogeneous-ish); class (2, band 0): ABCD
    val custs = Seq(
      (1L, 1, "A"), (2L, 1, "A"), (3L, 1, "A"), (4L, 1, "A"),
      (5L, 2, "A"), (6L, 2, "B"), (7L, 2, "C"), (8L, 2, "D"))
      .map { case (k, n, seg) => (k, s"c$k", n, 100.0, seg) }
    custs.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
      "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val out = graft.queries.Governance.qTclosenessAudit(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1)
    // TVD(class1) = ½(|1 − 5/8| + 3·(1/8)) = 3/8 → 375000 ppm
    // TVD(class2) = ½(|1/4 − 5/8| + 3·|1/4 − 1/8|) = 3/8 → 375000 ppm
    assert(out.toSeq == Seq((1, 4L, 1L, 375000L), (2, 4L, 4L, 375000L)),
      out.mkString(";"))
  }

  test("benford: planted digits count exactly; expected ppm literals attach") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_bf").toString
    // cents: 100, 1999, 250, 5, 3000 → digits 1,1,2,5,3
    Seq((1L, 1L, 1.00), (2L, 2L, 19.99), (3L, 3L, 2.50),
      (4L, 4L, 0.05), (5L, 5L, 30.00))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = graft.queries.Maintain.qBenfordAudit(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(out.keySet == Set("1", "2", "3", "5"))
    assert(out("1") == ((2L, 400000L, 301029L, 98971L)), out("1"))
    assert(out("2") == ((1L, 200000L, 176091L, 23909L)), out("2"))
    assert(out("5") == ((1L, 200000L, 79181L, 120819L)), out("5"))
  }

  test("session_window native: inclusive-end merge pins the strict-> boundary") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_sn").toString
    // gaps: 599 s, exactly 600 s (both MERGE — session_window's end is
    // inclusive, same as the lag query's strict-> rule), then 601 s
    // (splits under both)
    Seq((1L, ts(base), 7L, "view", 0.0),
      (2L, ts(base + 599), 7L, "view", 0.0),
      (3L, ts(base + 1199), 7L, "view", 0.0),
      (4L, ts(base + 1800), 7L, "view", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val native = graft.queries.Events.qSessionNative(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(native.toSeq == Seq(
      (base * 1000000L, (base + 1199) * 1000000L, 3L),
      ((base + 1800) * 1000000L, (base + 1800) * 1000000L, 1L)),
      native.mkString(";"))
    // the lag-based sessionizer agrees on both boundaries
    val lagBased = graft.queries.Events.qEventsSessionize(spark, dir)
      .select(col("session_id")).distinct().count()
    assert(lagBased == 2L)
  }

  test("bootstrap CI: constant segment collapses; mixed segment brackets the mean") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_bs").toString
    // segment A: every order exactly 100.00 → every replicate mean is
    // exactly 10000 cents, so the CI must collapse onto the point
    // estimate; segment B: half 100.00 / half 300.00
    (1L to 40L).map(k => (k, s"c$k", 0, 0.0, if (k <= 20) "A" else "B"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    (1L to 40L).map(k =>
        (k * 10L, k, if (k <= 20 || k % 2 == 0) 100.0 else 300.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = graft.queries.Agg.qBootstrapCi(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(_._1)
    val a = out(0); val b = out(1)
    assert(a._1 == "A" && a._2 == 20L && a._3 == 10000L)
    assert(a._4 == 10000L && a._5 == 10000L,
      s"constant segment must collapse: $a")
    assert(a._6 == 32L)
    // B's point estimate: 10 × 10000 + 10 × 30000 over 20 → 20000
    assert(b._1 == "B" && b._3 == 20000L)
    assert(b._4 <= b._3 && b._3 <= b._5, s"CI must bracket: $b")
    assert(b._4 >= 10000L && b._5 <= 30000L,
      s"replicate means live in the value hull: $b")
  }

  test("pareto: ten one-customer deciles tier up by hand") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_pareto").toString
    // customer k spends exactly k dollars → decile k holds customer k
    (1L to 10L).map(k => (k * 10L, k, k.toDouble))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = graft.queries.Agg.qPareto(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length == 10)
    (1 to 10).foreach { k =>
      val row = out(k - 1)
      val rev = (k to 10).map(_ * 100L).sum
      assert(row == ((k, 11L - k, rev, 1000000L * rev / 5500L)),
        s"tier $k: $row")
    }
  }

  test("woe encoding: planted binary target closes to hand-computed ln") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_woe").toString
    // seg A: 2 urgent / 2 normal; seg B: 0 urgent / 4 normal
    Seq((1L, "A"), (2L, "A"), (3L, "A"), (4L, "A"),
      (5L, "B"), (6L, "B"), (7L, "B"), (8L, "B"))
      .map { case (k, seg) => (k, s"c$k", 0, 0.0, seg) }
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val prio = Map(1L -> "1-URGENT", 2L -> "1-URGENT")
    (1L to 8L).map(k => (k * 10L, k, prio.getOrElse(k, "3-MEDIUM")))
      .toDF("o_orderkey", "o_custkey", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = graft.queries.Maintain.qWoeEncoding(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).sortBy(_._1)
    assert(out.map(t => (t._1, t._2, t._3)).toSeq ==
      Seq(("A", 2L, 2L), ("B", 0L, 4L)))
    // pos=2 neg=6 |C|=2: woe_A = ln((3/3)·(8/4)) = ln 2;
    // iv_A = (3/4 − 3/8)·ln 2; woe_B = ln((1/5)·2) = ln 0.4;
    // iv_B = (1/4 − 5/8)·ln 0.4
    def r8(x: Double) = math.rint(x * 1e8) / 1e8
    assert(math.abs(out(0)._4 - r8(math.log(2.0))) < 1e-12)
    assert(math.abs(out(0)._5 - r8(0.375 * r8(math.log(2.0)))) < 1e-12)
    assert(math.abs(out(1)._4 - r8(math.log(0.4))) < 1e-12)
    assert(math.abs(out(1)._5 - r8(-0.375 * r8(math.log(0.4)))) < 1e-12)
  }
}
