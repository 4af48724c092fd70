package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Round-9 sixth-session additions: CUSUM drift detection via the
  * drawup identity, weighted median, Gini, the Gopher rule gate, PMI
  * collocations, the Zipf fit, behavioral paths, cross-correlation,
  * the time-bounded funnel, seasonal strength, daily and histogram
  * percentiles, the Markov stationary distribution, the A/B z-test,
  * cohort LTV, the langid confusion matrix, 2-hop neighborhood size,
  * cluster-size stats, and the cross-source duplication matrix.
  * Planted fixtures run the registered queries unmodified against
  * hand-computed answers. */
class Round9fOperatorsSpec extends SparkSpec {

  private def eventsDir(
      rows: Seq[(Long, String, Long, String, Double)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_r9f_ev").toString
    rows.toDF("event_id", "ts_str", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("ts_str")))
      .drop("ts_str")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def docsDir(rows: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_r9f_docs").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("cusum: drawup identity reproduces the recursive statistic") {
    // type "up": hourly sums 0,0,0,10,10,10 → n=6, T=30,
    // scaled devs 6·sv−30 = −30×3, +30×3; S = −30,−60,−90,−60,−30,0;
    // runmin bottoms at −90 → drawup peaks at 90 in the LAST bucket;
    // peak_cusum = 90/6 = 15. The recursive max(0, C+d) on the
    // unscaled devs (−5×3, +5×3) gives 0,0,0,5,10,15 — same answer.
    // type "flat": constant series → drawup 0 everywhere, tie on the
    // max resolves to the EARLIEST bucket.
    // type "hi": starts ABOVE its mean — hourly sums 10,0,5,5 → n=4,
    // T=20, scaled devs 4·sv−20 = +20,−20,0,0; S = 20,0,0,0. The S₀=0
    // empty-prefix term is load-bearing here: min_{0≤i} Sᵢ = 0 at the
    // FIRST bucket (min over i≥1 alone would be 20), so drawup =
    // 20,0,0,0 and the peak is C₁ = 20/4 = 5 in bucket 0 — matching
    // the recursion max(0, C+d) on devs +5,−5,0,0 → 5,0,0,0.
    val d = eventsDir(
      (0 until 6).map(h => (h.toLong, f"2024-01-01 0$h:00:00", 1L, "up",
        if (h < 3) 0.0 else 10.0)) ++
      (0 until 4).map(h => (10L + h, f"2024-01-01 0$h:00:00", 1L, "flat",
        7.0)) ++
      Seq(10.0, 0.0, 5.0, 5.0).zipWithIndex.map { case (v, h) =>
        (20L + h, f"2024-01-01 0$h:00:00", 1L, "hi", v) })
    val r = graft.queries.Events.qEventsCusum(spark, d).collect()
      .map(x => x.getString(0) ->
        (x.getLong(1), x.getDouble(2),
          x.getTimestamp(3).toInstant.toString, x.getLong(4))).toMap
    assert(r("up") == ((6L, 15.0, "2024-01-01T05:00:00Z", 0L)), s"up: $r")
    assert(r("flat") == ((4L, 0.0, "2024-01-01T00:00:00Z", 0L)),
      s"flat ties to earliest: $r")
    assert(r("hi") == ((4L, 5.0, "2024-01-01T00:00:00Z", 0L)),
      s"above-mean start anchors C1 via S0=0: $r")
  }

  test("weighted median: weight mass moves the median off the count median") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_r9f_li").toString
    // flag A: qty 1 (w 1), 2 (w 1), 3 (w 10) — count median is 2 but
    // 10/12 of the weight sits on 3; first qty with 2·cumw ≥ 12 is 3.
    // flag B: symmetric weights → exact half lands on qty 1
    // (2·cumw = total at the first row — the ≥ makes it inclusive).
    Seq(("A", 1.0, 1.0), ("A", 2.0, 1.0), ("A", 3.0, 10.0),
      ("B", 1.0, 5.0), ("B", 2.0, 5.0))
      .toDF("l_returnflag", "l_quantity", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = graft.queries.Agg.qAggWeightedMedian(spark, dir).collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r == Map("A" -> 3.0, "B" -> 1.0), s"got $r")
  }

  test("gopher: each rule fails on its own planted violation") {
    val sw = "the a an and of"
    // 56 tokens, 25% stopwords, mean word length 4.25 — passes all
    val good = Seq.fill(14)("the table scan merge").mkString(" ")
    val short = "tiny doc only"                       // wordcount fails
    val soup = (sw + " ") * 12 + sw                   // all stopwords
    val longw = good + " " + "x" * 25                 // maxword fails
    val noSw = Seq.fill(60)("table scan part").mkString(" ") // 0 stopwords
    val d = docsDir(Seq(
      (0L, good, "en", "s"), (1L, short, "en", "s"), (2L, soup, "en", "s"),
      (3L, longw, "en", "s"), (4L, noSw, "en", "s"),
      (5L, "  " + good + "  ", "en", "s"))) // padded twin of doc 0
    val out = graft.queries.Text.qTextGopher(spark, d).collect()
    val r = out.map(x => x.getLong(0) ->
        (x.getBoolean(2), x.getBoolean(3), x.getBoolean(4),
          x.getBoolean(5), x.getBoolean(6), x.getBoolean(7))).toMap
    assert(r(0L) == ((true, true, true, true, true, true)), s"good: $r")
    assert(!r(1L)._1 && !r(1L)._6, s"short fails wordcount: $r")
    assert(!r(2L)._5 && !r(2L)._6, s"soup fails swratio: $r")
    assert(!r(3L)._3 && !r(3L)._6, s"long word fails maxword: $r")
    assert(!r(4L)._4 && !r(4L)._6, s"no stopwords fails: $r")
    // leading/trailing whitespace must not mint phantom tokens: the
    // padded twin scores token-for-token like the clean doc
    val nTok = out.map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(nTok(5L) == nTok(0L), s"padded twin token count: $nTok")
    assert(r(5L) == r(0L), s"padded twin verdicts: $r")
  }

  test("pmi: an always-together bigram tops the free-mixing filler") {
    // "new york" appears 8 times and its words never occur apart;
    // filler words mix freely, so their bigram PMI sits near 0 while
    // the collocation's is ln(c_xy·M²/(N·c_x·c_y)) with c_x=c_y=c_xy.
    val filler = Seq("aa", "bb", "cc", "dd")
    val mix = (0 until 30).map(i => filler(i % 4)).mkString(" ")
    val d = docsDir(Seq(
      (0L, ("new york " * 8).trim, "en", "s"),
      (1L, mix, "en", "s"), (2L, mix, "en", "s"), (3L, mix, "en", "s")))
    val rows = graft.queries.Text.qTextPmi(spark, d).collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2),
        x.getLong(3), x.getLong(4), x.getDouble(5)))
    val top = rows.head
    assert(top._1 == "new" && top._2 == "york", s"top: ${rows.toSeq}")
    val m = 16.0 + 90.0 // tokens: 16 in doc0, 30×3 filler
    val nb = 15.0 + 87.0 // bigrams per doc: len−1
    val expected = math.log(top._3 * m * m / (nb * top._4 * top._5))
    assert(math.abs(top._6 - expected) < 1e-6, s"pmi value: $top")
    assert(rows.forall(r => r._3 >= 5), "support threshold respected")
    assert(top._6 > rows.last._6, "collocation beats free mixing")
  }

  test("neighborhood: path graph n1/n2 count exactly the ball members") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_r9f_li2").toString
    // orders {1,2}, {2,3}, {3,4} → path 1-2-3-4
    Seq((1L, 1L), (1L, 2L), (2L, 2L), (2L, 3L), (3L, 3L), (3L, 4L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = graft.queries.Graph.qGraphNeighborhood(spark, dir).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2),
        x.getDouble(3))).toMap
    assert(r == Map(
      1L -> ((1L, 2L, 2.0)),   // {2}, {2,3}
      2L -> ((2L, 3L, 1.5)),   // {1,3}, {1,3,4}
      3L -> ((2L, 3L, 1.5)),   // {2,4}, {1,2,4}
      4L -> ((1L, 2L, 2.0))),  // {3}, {2,3}
      s"got $r")
  }

  test("anf: exact balls match, estimates are valid FM points") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_r9f_li4").toString
    // path 1-2-3-4 again: exact ball2 (incl. self) is 3,4,4,3
    Seq((1L, 1L), (1L, 2L), (2L, 2L), (2L, 3L), (3L, 3L), (3L, 4L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows = graft.queries.Graph.qGraphAnf(spark, dir).collect()
      .map(x => x.getLong(0) ->
        (x.getLong(1), x.getDouble(2), x.getDouble(3))).toMap
    assert(rows.view.mapValues(_._1).toMap ==
      Map(1L -> 3L, 2L -> 4L, 3L -> 4L, 4L -> 3L), s"exact balls: $rows")
    rows.foreach { case (n, (ball2, est2, err)) =>
      // every estimate is 2^(s/8)/0.77351 for an integer register sum
      // s ≥ 0 — the geometric-mean grid of the 8-register estimator
      val k = math.log(est2 * 0.77351) / math.log(2.0) * 8.0
      assert(math.abs(k - math.round(k)) < 1e-4, s"node $n est grid: $est2")
      assert(math.abs(err - math.abs(est2 - ball2) / ball2) < 1e-6,
        s"node $n err consistency: $rows")
    }
    // deterministic: the portable hash makes reruns bit-identical
    val again = graft.queries.Graph.qGraphAnf(spark, dir).collect()
      .map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(again == rows.view.mapValues(_._2).toMap, "estimate not stable")
  }

  test("paths: trigrams follow event-time order, not insertion order") {
    // user 1 emits a→b→c→d (the c row is planted out of insertion
    // order); user 2 emits a→b→c — trigram (a,b,c) has n=2, n_users=2,
    // (b,c,d) has n=1.
    val d = eventsDir(Seq(
      (0L, "2024-01-01 10:00:00", 1L, "a", 0.0),
      (3L, "2024-01-01 10:03:00", 1L, "d", 0.0),
      (1L, "2024-01-01 10:01:00", 1L, "b", 0.0),
      (2L, "2024-01-01 10:02:00", 1L, "c", 0.0),
      (4L, "2024-01-01 11:00:00", 2L, "a", 0.0),
      (5L, "2024-01-01 11:01:00", 2L, "b", 0.0),
      (6L, "2024-01-01 11:02:00", 2L, "c", 0.0)))
    val r = graft.queries.Events.qEventsPaths(spark, d).collect()
      .map(x => (x.getString(0), x.getString(1), x.getString(2),
        x.getLong(3), x.getLong(4)))
    assert(r.toSeq == Seq(
      ("a", "b", "c", 2L, 2L), ("b", "c", "d", 1L, 1L)), s"got ${r.toSeq}")
  }

  test("xcorr: a shifted copy correlates perfectly at its lag") {
    // type b's hourly counts are exactly type a's one hour later
    // (a: 1,2,3 at hours 0-2; b: 1,2,3 at hours 1-3) → pairing a_t
    // with b_{t+1} gives (1,1),(2,2),(3,3): r = 1.0 at lag +1
    var id = 0L
    def burst(h: Int, typ: String, n: Int) = (0 until n).map { _ =>
      id += 1; (id, f"2024-01-01 0$h:00:00", 1L, typ, 0.0)
    }
    val d = eventsDir(
      burst(0, "a", 1) ++ burst(1, "a", 2) ++ burst(2, "a", 3) ++
      burst(1, "b", 1) ++ burst(2, "b", 2) ++ burst(3, "b", 3))
    val rows = graft.queries.Events.qEventsXcorr(spark, d).collect()
      .map(x => (x.getString(0), x.getString(1), x.getInt(2)) ->
        (x.getLong(3), if (x.isNullAt(4)) Double.NaN else x.getDouble(4)))
      .toMap
    assert(rows.size == 7, s"one type pair x 7 lags: $rows")
    assert(rows(("a", "b", 1)) == ((3L, 1.0)), s"shifted copy: $rows")
    assert(rows(("a", "b", 0))._2 < 1.0, s"lag 0 must not be perfect: $rows")
  }

  test("cluster stats: sizes roll up pairs, chains, and singletons") {
    val x = (1 to 30).map(i => s"tok$i").mkString(" ")
    val y = (1 to 30).map(i => s"alt$i").mkString(" ")
    val z = (1 to 30).map(i => s"zzz$i").mkString(" ")
    // cluster of 3 (identical x), cluster of 2 (identical y), one
    // singleton → sizes 1×1, 2×1, 3×1
    val d = docsDir(Seq(
      (0L, x, "en", "s"), (1L, x, "en", "s"), (2L, x, "en", "s"),
      (3L, y, "en", "s"), (4L, y, "en", "s"), (5L, z, "en", "s")))
    val r = graft.queries.DedupSim.qDedupClusterStats(spark, d).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq == Seq((1L, 1L, 1L), (2L, 1L, 2L), (3L, 1L, 3L)),
      s"got ${r.toSeq}")
  }

  test("funnel window: conversions outside the hour no longer count") {
    // u1: click inside 1 h of view, purchase 90 min after click (OUT);
    // u2: click 90 min after view (OUT); u3: full chain inside both
    // windows; u4: click with no view at all
    val d = eventsDir(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "view", 0.0),
      (2L, "2024-01-01 10:30:00", 1L, "click", 0.0),
      (3L, "2024-01-01 12:00:00", 1L, "purchase", 0.0),
      (4L, "2024-01-01 10:00:00", 2L, "view", 0.0),
      (5L, "2024-01-01 11:30:00", 2L, "click", 0.0),
      (6L, "2024-01-01 09:00:00", 3L, "view", 0.0),
      (7L, "2024-01-01 09:20:00", 3L, "click", 0.0),
      (8L, "2024-01-01 10:10:00", 3L, "purchase", 0.0),
      (9L, "2024-01-01 08:00:00", 4L, "click", 0.0)))
    val r = graft.queries.Events.qEventsFunnelWindow(spark, d).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((4L, 3L, 2L, 1L)), s"got $r")
    assert(math.abs(r.getDouble(4) - 2.0 / 3) < 1e-6, s"v->c: $r")
    assert(r.getDouble(5) == 0.5, s"c->p: $r")
  }

  test("seasonality: a pure hour-of-day spike explains all the variance") {
    // 48-hour span. "flat": one event every hour → zero TOTAL
    // variance, so the share is undefined (NULL by the guard) and the
    // peak ties to hour 0. "spike": events only at hour-of-day 5
    // (both days) → variance fully explained.
    val flat = (0 until 48).map { i =>
      (i.toLong, f"2024-01-${1 + i / 24}%02d ${i % 24}%02d:00:00",
        1L, "flat", 0.0)
    }
    val spike = Seq(
      (100L, "2024-01-01 05:00:00", 1L, "spike", 0.0),
      (101L, "2024-01-02 05:00:00", 1L, "spike", 0.0))
    val d = eventsDir(flat ++ spike)
    val r = graft.queries.Events.qEventsSeasonality(spark, d).collect()
      .map(x => x.getString(0) ->
        (x.getLong(1), if (x.isNullAt(2)) Double.NaN else x.getDouble(2),
          x.getInt(3), x.getDouble(4))).toMap
    assert(r("flat")._1 == 48L && r("flat")._2.isNaN &&
      r("flat")._3 == 0 && r("flat")._4 == 1.0, s"flat: $r")
    assert(math.abs(r("spike")._2 - 1.0) < 1e-4, s"spike strength: $r")
    assert(r("spike")._3 == 5 && r("spike")._4 == 1.0, s"spike peak: $r")
  }

  test("percentiles: linear-interpolation bands on a planted 1..100 day") {
    // values 1..100 in one (type, day): p = 0.95 lands at rank 95.05
    // → 95 + 0.05·(96−95); nulls must not count
    val d = eventsDir(
      (1 to 100).map(i =>
        (i.toLong, "2024-01-01 10:00:00", 1L, "a", i.toDouble)))
    val r = graft.queries.Events.qEventsPercentiles(spark, d).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(2) == 100L && row.getDouble(3) == 50.5 &&
      row.getDouble(4) == 95.05 && row.getDouble(5) == 99.01 &&
      row.getDouble(6) == 100.0, s"got $row")
  }

  test("hist quantiles: estimates stay within one bucket width of exact") {
    // uniform 1..500 — exact p50 = 250.5; the histogram estimate may
    // be off by at most the 20-unit bucket width (the documented
    // contract); an exactly bucket-aligned spike pins the estimate
    val d = eventsDir(
      (1 to 500).map(i =>
        (i.toLong, "2024-01-01 10:00:00", 1L, "u", i.toDouble)))
    val r = graft.queries.Events.qEventsHistQuantiles(spark, d).collect()
    val row = r.head
    assert(row.getLong(1) == 500L)
    assert(math.abs(row.getDouble(2) - 250.5) <= 20.0, s"p50: $row")
    assert(math.abs(row.getDouble(3) - 475.05) <= 20.0, s"p95: $row")
    assert(math.abs(row.getDouble(4) - 495.01) <= 20.0, s"p99: $row")
  }

  test("cohort ltv: offsets anchor to the first-order month and cumulate") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_r9f_ord").toString
    // both customers cohort to Jan; c1 returns in Feb → cell (0): 2
    // actives, $40, ltv 20; cell (1): 1 active, $20, cum 60 → ltv 30
    Seq((1L, 1L, "2024-01-05 00:00:00", 10.0),
      (2L, 1L, "2024-02-20 00:00:00", 20.0),
      (3L, 2L, "2024-01-25 00:00:00", 30.0))
      .toDF("o_orderkey", "o_custkey", "d", "o_totalprice")
      .withColumn("o_orderdate", to_timestamp(col("d"))).drop("d")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = graft.queries.Agg.qCohortLtv(spark, dir).collect()
      .map(x => (x.getTimestamp(0).toInstant.toString, x.getInt(1)) ->
        (x.getLong(2), x.getDouble(3), x.getDouble(4))).toMap
    assert(r == Map(
      ("2024-01-01T00:00:00Z", 0) -> ((2L, 40.0, 20.0)),
      ("2024-01-01T00:00:00Z", 1) -> ((1L, 20.0, 30.0))), s"got $r")
  }

  test("stationary: the chain converges to the hand-solved fixpoint") {
    // sequence (a,a,a,b)×6 → P(a→a)=2/3, P(a→b)=1/3, P(b→a)=1:
    // stationary π = (3/4, 1/4); the second eigenvalue is −1/3, so 8
    // rounds land within (1/3)^8 ≈ 1.5e-4 of it (+ ppm rounding)
    val seq = Seq.fill(6)(Seq("a", "a", "a", "b")).flatten
    val d = eventsDir(seq.zipWithIndex.map { case (t, i) =>
      (i.toLong, f"2024-01-01 10:${i}%02d:00", 1L, t, 0.0)
    })
    val r = graft.queries.Events.qEventsStationary(spark, d).collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(math.abs(r("a") - 0.75) < 0.01, s"pi(a): $r")
    assert(math.abs(r("b") - 0.25) < 0.01, s"pi(b): $r")
  }

  test("confusion matrix: shares split per actual language on the ppm grid") {
    // actual en: two docs full of en markers, one of es markers →
    // cells (en,en,2,2/3) and (en,es,1,1/3); actual es: one clean hit
    val d = docsDir(Seq(
      (0L, "the and of with the", "en", "s"),
      (1L, "the and of with and", "en", "s"),
      (2L, "el la los con el", "en", "s"),
      (3L, "el la los con la", "es", "s")))
    val r = graft.queries.Text.qLangidConfusion(spark, d).collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        (x.getLong(2), x.getDouble(3))).toMap
    assert(r == Map(
      ("en", "en") -> ((2L, 0.666667)),
      ("en", "es") -> ((1L, 0.333333)),
      ("es", "es") -> ((1L, 1.0))), s"got $r")
  }

  test("ab test: arms split by parity and the z-score matches the closed form") {
    // arm 0 (even users 2, 4): one of two converts; arm 1 (odd users
    // 1, 3): both convert → z = (0.5−1)/√(0.75·0.25·(0.5+0.5))
    val d = eventsDir(Seq(
      (0L, "2024-01-01 10:00:00", 2L, "purchase", 0.0),
      (1L, "2024-01-01 10:01:00", 4L, "view", 0.0),
      (2L, "2024-01-01 10:02:00", 1L, "purchase", 0.0),
      (3L, "2024-01-01 10:03:00", 3L, "purchase", 0.0)))
    val r = graft.queries.Events.qEventsAbTest(spark, d).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((2L, 1L, 2L, 2L)), s"counts: $r")
    assert(r.getDouble(4) == 0.5 && r.getDouble(5) == 1.0, s"rates: $r")
    val expected = (0.5 - 1.0) /
      math.sqrt(0.75 * 0.25 * (1.0 / 2 + 1.0 / 2))
    assert(math.abs(r.getDouble(6) - expected) < 1e-6, s"z: $r")
    // degenerate: everyone converts → z undefined, NULL not a crash
    val d2 = eventsDir(Seq(
      (0L, "2024-01-01 10:00:00", 1L, "purchase", 0.0),
      (1L, "2024-01-01 10:01:00", 2L, "purchase", 0.0)))
    val r2 = graft.queries.Events.qEventsAbTest(spark, d2).collect().head
    assert(r2.isNullAt(6), s"degenerate z must be NULL: $r2")
    // an arm with zero users: NULL rate for it, NULL z, no ANSI error
    val d3 = eventsDir(Seq(
      (0L, "2024-01-01 10:00:00", 1L, "purchase", 0.0),
      (1L, "2024-01-01 10:01:00", 3L, "view", 0.0)))
    val r3 = graft.queries.Events.qEventsAbTest(spark, d3).collect().head
    assert(r3.getLong(0) == 0L && r3.isNullAt(4) && !r3.isNullAt(5) &&
      r3.isNullAt(6), s"empty arm must yield NULLs: $r3")
  }

  test("gini: equal mass scores 0, a single holder scores (n-1)/n") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_r9f_li3").toString
    // flag A: four equal prices → perfect equality, G = 0 exactly;
    // flag B: all the money on one row of four → G = 3/4 exactly
    (Seq.fill(4)(("A", 10.0)) ++ Seq(("B", 0.0), ("B", 0.0),
      ("B", 0.0), ("B", 10.0)))
      .toDF("l_returnflag", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = graft.queries.Agg.qAggGini(spark, dir).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getDouble(2))).toMap
    assert(r == Map("A" -> ((4L, 0.0)), "B" -> ((4L, 0.75))), s"got $r")
  }

  test("zipf: the rank-frequency slope matches the closed-form fit") {
    // counts 4, 2, 1 at ranks 1, 2, 3
    val d = docsDir(Seq((0L, "a a a a b b c", "en", "s")))
    val row = graft.queries.Text.qTextZipf(spark, d).collect().head
    assert(row.getLong(0) == 3, s"vocab size: $row")
    val xs = Seq(1.0, 2.0, 3.0).map(math.log)
    val ys = Seq(4.0, 2.0, 1.0).map(math.log)
    val n = 3.0
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val intercept = (sy - slope * sx) / n
    assert(math.abs(row.getDouble(1) - slope) < 1e-6, s"slope: $row")
    assert(math.abs(row.getDouble(2) - intercept) < 1e-6, s"intercept: $row")
    assert(row.getDouble(1) < 0, "frequency must fall with rank")
  }

  test("source matrix: within- and cross-source dup pairs land in their cells") {
    val a = (1 to 30).map(i => s"tok$i").mkString(" ")
    val other = (1 to 30).map(i => s"zzz$i").mkString(" ")
    // identical text in srcA×2 and srcB×1 → pairs (0,1) A-A,
    // (0,2)+(1,2) A-B, all jaccard 1.0; doc 3 shares nothing.
    val d = docsDir(Seq(
      (0L, a, "en", "srcA"), (1L, a, "en", "srcA"), (2L, a, "en", "srcB"),
      (3L, other, "en", "srcB")))
    val r = graft.queries.DedupSim.qDedupSourceMatrix(spark, d).collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        (x.getLong(2), x.getDouble(3), x.getDouble(4))).toMap
    assert(r == Map(
      ("srcA", "srcA") -> ((1L, 1.0, 1.0)),
      ("srcA", "srcB") -> ((2L, 1.0, 1.0))), s"got $r")
  }
}
