package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** Round-11 sixth-wave additions: survival life table, Matryoshka
  * truncation recall, DSIR importance weights, time-weighted average. */
class Round11fOperatorsSpec extends SparkSpec {

  // 2024-01-01 00:00:00 UTC
  private val base = 1704067200L
  private val day = 86400L

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("survival: planted lifetimes produce the hand-computed life table") {
    import spark.implicits._
    var id = 0L
    def ev(d: Long, user: Long): (Long, Timestamp, Long, String, Double) = {
      id += 1; (id, ts(base + d * day), user, "view", 1.0)
    }
    // corpus max day = 20
    // u1: day 0 only          -> t=0,  last=0,  20-0=20 >= 7 -> death
    // u2: days 0..5           -> t=5,  last=5,  15 >= 7      -> death
    // u3: days 0..5           -> t=5                          -> death
    // u4: days 2..18          -> t=16, last=18, 2 < 7         -> censored
    // u5: day 20 only         -> t=0,  last=20, 0 < 7         -> censored
    val rows = Seq(
      ev(0, 1L),
      ev(0, 2L), ev(3, 2L), ev(5, 2L),
      ev(0, 3L), ev(5, 3L),
      ev(2, 4L), ev(10, 4L), ev(18, 4L),
      ev(20, 5L))
    val dir = Files.createTempDirectory("graft_surv").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.queries.Events.qEventsSurvival(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // life table: t | n_risk | d | c | hazard_ppb | cum_hazard_ppb
    //   0 | 5 | 1 | 1 | 10^9/5 = 200000000 | 200000000
    //   5 | 3 | 2 | 0 | 2*10^9/3 = 666666666 | 866666666
    //  16 | 1 | 0 | 1 | 0 | 866666666
    assert(out.toSeq == Seq(
      (0L, 5L, 1L, 1L, 200000000L, 200000000L),
      (5L, 3L, 2L, 0L, 666666666L, 866666666L),
      (16L, 1L, 0L, 1L, 0L, 866666666L)), out.mkString(";"))
  }

  test("mrl: signal confined to the first 8 dims -> recall 1.0 at every depth") {
    import spark.implicits._
    // 30 vectors, 64 dims; all information lives in dims 0..7, the
    // rest are zero — every prefix truncation >= 8 is lossless, so
    // the truncated top-5 must equal the full-dimension truth exactly
    val vecs = (0 until 30).map { i =>
      val v = Array.tabulate(64) { j =>
        if (j < 8) (((i * 31 + j * 17) % 97 + 1).toFloat / 97f) else 0f
      }
      (i.toLong, v.toSeq, i % 3)
    }
    val dir = Files.createTempDirectory("graft_mrl").toString
    vecs.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = graft.queries.DedupSim.qEmbedMrl(spark, dir).collect()
    assert(out.length == graft.queries.DedupSim.MrlDims.length)
    out.foreach { r =>
      assert(r.getDouble(2) == 1.0,
        s"dim ${r.getInt(0)} recall ${r.getDouble(2)}")
    }
  }

  test("dsir: raw doc written in target vocabulary keeps, alien vocabulary drops") {
    import spark.implicits._
    // target LM: five en docs over vocabulary A; raw corpus: one doc
    // in vocabulary A (target-like -> logw > 0) and one in a disjoint
    // vocabulary B (raw-only mass -> logw < 0)
    val a = "alpha beta gamma delta"
    val docsRows = (1L to 5L).map(i => (i, a, "en", "src0", a.length.toLong)) ++
      Seq((100L, a, "de", "src1", a.length.toLong),
        (101L, "zulu yankee xray whiskey", "de", "src1", 24L))
    val dir = Files.createTempDirectory("graft_dsir").toString
    docsRows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.Corpus.qCorpusDsir(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3),
        r.getLong(4)))
    assert(out.length == 2, out.mkString(";"))
    val byId = out.map(t => t._1 -> t).toMap
    // doc 100: 4 tokens, every bucket ratio (5+1)(8+256)/((1+1)(20+256))
    assert(byId(100L)._2 == 4L && byId(100L)._3 > 0 && byId(100L)._4 == 1L,
      byId(100L).toString)
    // doc 101: 4 tokens, every bucket ratio (0+1)(8+256)/((1+1)(20+256))
    assert(byId(101L)._2 == 4L && byId(101L)._3 < 0 && byId(101L)._4 == 0L,
      byId(101L).toString)
  }

  test("twap: hold-to-next weighting, midnight cut, and same-instant ties by hand") {
    import spark.implicits._
    val h = 3600L
    val rows = Seq(
      // user 1, day 0: 1.00 held 6 h then 3.00 held 18 h ->
      //   TWAP = (100*6 + 300*18)/24 = 250 cents
      (1L, ts(base), 1L, "view", 1.0),
      (2L, ts(base + 6 * h), 1L, "view", 3.0),
      // user 2, day 1: single 2.00 at noon holds to midnight only
      (3L, ts(base + 24 * h + 12 * h), 2L, "view", 2.0),
      // user 3, day 2: two events at the SAME microsecond — the first
      // holds 0 us (lead = own ts), the second holds to midnight, so
      // the 9.00 contributes nothing and TWAP = 100 cents
      (4L, ts(base + 48 * h), 3L, "view", 9.0),
      (5L, ts(base + 48 * h), 3L, "view", 1.0))
    val dir = Files.createTempDirectory("graft_twap").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.queries.Events.qEventsTwap(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (2L, 86400000000L, 2500000L),   // day 0
      (1L, 43200000000L, 2000000L),   // day 1
      (2L, 86400000000L, 1000000L)),  // day 2
      out.mkString(";"))
  }

  test("sketch rollup: week estimate from day synopses equals direct raw sketch") {
    import org.apache.spark.sql.functions._
    // mergeability invariant: re-sketching the union of per-day k-min
    // synopses must give EXACTLY the estimate of sketching the raw
    // week — k smallest of a union of k-min sets is the k-min set of
    // the union
    val rolled = graft.queries.Agg.qSketchRollup(spark, sf)
      .select(col("week_idx"), col("est_distinct"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val kmv = graft.operators.KmvSketch.kmv(64)
    val direct = graft.Tables.events(spark, sf)
      .select(expr("unix_micros(ts) DIV 86400000000 DIV 7").as("week_idx"),
        graft.operators.Sampling.hashFraction(col("user_id")).as("f"))
      .groupBy(col("week_idx"))
      .agg(round(kmv(col("f")), 4).as("est"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rolled.nonEmpty && rolled == direct, s"$rolled vs $direct")
  }

  test("inventory balance: Lindley closed form equals the sequential clamped fold") {
    val out = graft.queries.Maintain.qInventoryBalance(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.nonEmpty)
    // replay max(0, prev + net) day by day per part and compare
    out.groupBy(_._1).foreach { case (part, rows) =>
      var bal = 0L
      rows.sortBy(_._2).foreach { case (_, day, net, balance, stockout) =>
        bal = math.max(0L, bal + net)
        assert(balance == bal, s"part $part day $day: $balance != $bal")
        assert(stockout == (if (bal == 0L) 1L else 0L))
      }
    }
    // the floor must actually engage somewhere on real data
    assert(out.exists(_._5 == 1L), "no stockout day — fixture too easy")
  }

  test("item cf: hand-computed cosine neighbor lists from planted baskets") {
    import spark.implicits._
    // baskets: {1,2,3} {1,2} {1,2} {3} {1,3}
    // n: item1=4, item2=3, item3=3; pairs: (1,2)=3, (1,3)=2, (2,3)=1 pruned
    val rows = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 2L),
      (4L, 3L),
      (5L, 1L), (5L, 3L))
    val dir = Files.createTempDirectory("graft_icf").toString
    rows.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = graft.queries.Agg.qItemCf(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    // cos(1,2) = 3/sqrt(4*3) = 0.866025; cos(1,3) = 2/sqrt(4*3) = 0.57735
    assert(out.toSeq == Seq(
      (1L, 1, 2L, 3L, 0.866025),
      (1L, 2, 3L, 2L, 0.57735),
      (2L, 1, 1L, 3L, 0.866025),
      (3L, 1, 1L, 2L, 0.57735)), out.mkString(";"))
  }

  test("markov attribution: hand-derived removal effects on a 3-journey chain") {
    import spark.implicits._
    // u1: click -> purchase; u2: view -> purchase; u3: view (no conv)
    // chain: START->{click 1/3, view 2/3}; click->CONV 1;
    //        view->{CONV 1/2, NULL 1/2}
    // P(conv) = round(333333*1.0 + 666667*0.5 ppm) = 666667
    // remove click: P = round(666667 * 0.5) = 333334 -> removal 500000
    // remove view:  P = 333333                        -> removal 500001
    // error/signup absent from the chain -> removal 0
    val rows = Seq(
      (1L, ts(base), 1L, "click", 0.0),
      (2L, ts(base + 60), 1L, "purchase", 5.0),
      (3L, ts(base), 2L, "view", 0.0),
      (4L, ts(base + 60), 2L, "purchase", 5.0),
      (5L, ts(base), 3L, "view", 0.0))
    val dir = Files.createTempDirectory("graft_mkv").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.queries.Events.qEventsAttributionMarkov(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      ("click", 666667L, 333334L, 500000L, 499999L),
      ("error", 666667L, 666667L, 0L, 0L),
      ("signup", 666667L, 666667L, 0L, 0L),
      ("view", 666667L, 333333L, 500001L, 500000L)), out.mkString(";"))
  }

  test("dp mean: whale clipped to the sensitivity bound, noise on the clip grid") {
    import spark.implicits._
    // user 1 is a whale: 30 x $500 -> raw 1,500,000 cents, clipped to
    // 10,000; user 2 contributes 200 cents unclipped
    val rows = (1 to 30).map(k =>
      (k.toLong, ts(base + k * 60), 1L, "view", 500.0)) ++
      Seq((100L, ts(base), 2L, "view", 1.0),
        (101L, ts(base + 60), 2L, "view", 1.0))
    val dir = Files.createTempDirectory("graft_dpm").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.queries.Governance.qDpMean(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    val (nTrue, sumTrue, sumRel, nRel, mean) =
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    assert(nTrue == 2L && sumTrue == 10200L, r.toString)
    // sum noise is quantized to whole clips and bounded by the coin
    // width; count noise is unit-grid
    val clip = graft.queries.Governance.DpClipCents
    assert((sumRel - sumTrue) % clip == 0L, r.toString)
    assert(math.abs(sumRel - sumTrue) / clip <= 52L, r.toString)
    assert(math.abs(nRel - nTrue) <= 52L, r.toString)
    assert(mean == math.max(sumRel, 0L) / math.max(nRel, 1L), r.toString)
  }

  test("funnel latency: discrete percentiles over planted stage delays") {
    import spark.implicits._
    var id = 0L
    def ev(uid: Long, off: Long, t: String) = {
      id += 1; (id, ts(base + off), uid, t, 1.0)
    }
    // four users convert view->click after 10/20/30/40 s; only user 1
    // continues click->purchase after 5 s
    val rows = Seq(
      ev(1, 0, "view"), ev(1, 10, "click"), ev(1, 15, "purchase"),
      ev(2, 0, "view"), ev(2, 20, "click"),
      ev(3, 0, "view"), ev(3, 30, "click"),
      ev(4, 0, "view"), ev(4, 40, "click"))
    val dir = Files.createTempDirectory("graft_flat").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.queries.Events.qEventsFunnelLatency(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7)))
    // {10,20,30,40}: p25=10 (cum 1 >= 1), p50=20, p75=30, p90=40
    assert(out.toSeq == Seq(
      ("1_view_to_click", 4L, 10L, 10L, 20L, 30L, 40L, 40L),
      ("2_click_to_purchase", 1L, 5L, 5L, 5L, 5L, 5L, 5L)),
      out.mkString(";"))
  }

  test("incremental topk: batch flips one podium, untouched type carries, equals rebuild") {
    import spark.implicits._
    // cutoff is 2024-01-24: type A pre-cutoff has u1=100.00 > u2=90.00;
    // the batch adds u2 +20.00 (A) flipping the podium; type B exists
    // ONLY pre-cutoff and must carry over untouched
    val pre = "2024-01-10 00:00:00"
    val post = "2024-02-10 00:00:00"
    val rows = Seq(
      (1L, Timestamp.valueOf(pre), 1L, "A", 100.0),
      (2L, Timestamp.valueOf(pre), 2L, "A", 90.0),
      (3L, Timestamp.valueOf(pre), 3L, "B", 50.0),
      (4L, Timestamp.valueOf(pre), 4L, "B", 40.0),
      (5L, Timestamp.valueOf(post), 2L, "A", 20.0))
    val dir = Files.createTempDirectory("graft_itk").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val inc = graft.queries.Maintain.qIncrementalTopk(spark, dir)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3)))
    assert(inc.toSeq == Seq(
      ("A", 1, 2L, 11000L), ("A", 2, 1L, 10000L),
      ("B", 1, 3L, 5000L), ("B", 2, 4L, 4000L)), inc.mkString(";"))
    // rebuild equivalence: the full leaderboard over everything
    val rebuild = graft.queries.Maintain.leaderboard(
      graft.queries.Maintain.userTotals(
        spark.read.parquet(s"$dir/events.parquet")))
      .orderBy(col("event_type"), col("rk"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3)))
    assert(inc.toSeq == rebuild.toSeq, s"${inc.toSeq} vs ${rebuild.toSeq}")
  }

  test("corpus kl: identical slice scores exactly zero, alien vocabulary positive") {
    import spark.implicits._
    val a = "alpha beta gamma delta"
    val z = "zulu yankee xray whiskey"
    // de repeats the en corpus verbatim -> every bucket ratio is
    // exactly 1 (same counts, same totals) -> KL = 0.0 bit-exactly;
    // fr uses a disjoint vocabulary -> KL > 0
    val docsRows = (1L to 5L).map(i => (i, a, "en", "s", a.length.toLong)) ++
      (11L to 15L).map(i => (i, a, "de", "s", a.length.toLong)) ++
      (21L to 25L).map(i => (i, z, "fr", "s", z.length.toLong))
    val dir = Files.createTempDirectory("graft_kl").toString
    docsRows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.Corpus.qCorpusKl(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(out("de") == ((20L, 0.0)), out.toString)
    assert(out("fr")._1 == 20L && out("fr")._2 > 0.0, out.toString)
  }

  test("power sweep: MDE matches the closed-form formula on planted moments") {
    import spark.implicits._
    // values {1.00, 3.00, 1.00, 3.00}: mean 200 c, sample var 40000/3
    val rows = Seq(1.0, 3.0, 1.0, 3.0).zipWithIndex.map { case (v, i) =>
      ((i + 1).toLong, ts(base + i * 60), 1L, "view", v)
    }
    val dir = Files.createTempDirectory("graft_pw").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.queries.Events.qEventsPower(spark, dir)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    val z = graft.queries.Events.PowerZSum
    val (mean, vr) = (800.0 / 4, (200000.0 - 800.0 * 800.0 / 4) / 3)
    graft.queries.Events.PowerNs.foreach { n =>
      val want = BigDecimal(z * math.sqrt(vr * 2.0 / n) / mean * 100.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(out(n) == want, s"n=$n: ${out(n)} != $want")
    }
  }
}
