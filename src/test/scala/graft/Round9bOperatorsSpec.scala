package graft

import org.apache.spark.sql.functions._

/** Late round-9 additions: RFM segmentation and temperature-scaled
  * mixture resampling. */
class Round9bOperatorsSpec extends SparkSpec {

  test("rfm: scores span 1..4, quartiles balance, cell composes digits") {
    val rows = graft.queries.Agg.qRfm(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (rs, fs, ms, cell) =
        (r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
      assert(rs >= 1 && rs <= 4 && fs >= 1 && fs <= 4 && ms >= 1 && ms <= 4)
      assert(cell == rs * 100 + fs * 10 + ms)
    }
    // quartile boundaries from exact percentiles: each monetary score
    // bucket holds between 5% and 60% of customers (ties can skew the
    // split, but a broken boundary would put ~everything in one bucket)
    val byM = rows.groupBy(_.getLong(6)).view.mapValues(_.length)
    assert(byM.keySet == Set(1L, 2L, 3L, 4L), s"m-score levels: ${byM.toMap}")
    byM.values.foreach { n =>
      val frac = n.toDouble / rows.length
      assert(frac > 0.05 && frac < 0.60, s"degenerate quartile: ${byM.toMap}")
    }
    // more recent customers never score lower than older ones
    val sorted = rows.sortBy(_.getLong(1))
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        if (a.getLong(1) < b.getLong(1))
          assert(a.getLong(4) >= b.getLong(4), "recency score not monotone")
      case _ =>
    }
  }

  test("basket pairs: ordered pairs, support floor, exact lift arithmetic") {
    val rows = graft.queries.Agg.qBasketPairs(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    val supports = rows.map(_.getLong(2))
    assert(supports.zip(supports.tail).forall { case (a, b) => a >= b },
      "not ordered by support")
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pair not canonically ordered")
      assert(r.getLong(2) >= 2, "support floor violated")
      assert(r.getDouble(5) > 0.0)
    }
    // recompute the head pair's support directly
    val (pa, pb) = (rows.head.getLong(0), rows.head.getLong(1))
    val items = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val direct = items.where(col("l_partkey") === pa)
      .select(col("l_orderkey"))
      .intersect(items.where(col("l_partkey") === pb)
        .select(col("l_orderkey"))).count()
    assert(rows.head.getLong(2) == direct, "head support drifted")
  }

  test("equi-depth histogram: ordered disjoint buckets of ~equal depth") {
    val rows = graft.queries.Agg.qHistogramEquidepth(spark, sf).collect()
      .sortBy(_.getLong(0))
    assert(rows.length == 10, s"expected 10 buckets, got ${rows.length}")
    val total = Tables.lineitem(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == total, "buckets must tile the table")
    rows.foreach { r =>
      assert(r.getDouble(2) <= r.getDouble(3), "lo > hi")
      assert(r.getDouble(4) >= r.getDouble(2) - 1e-6 &&
        r.getDouble(4) <= r.getDouble(3) + 1e-6, "mean outside bucket")
      val frac = r.getLong(1).toDouble / total
      assert(frac > 0.05 && frac < 0.15, s"depth drifted: $frac")
    }
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getDouble(3) <= b.getDouble(2) + 1e-6,
          "buckets overlap in value space")
      case _ =>
    }
  }

  test("profile: one row per column with consistent counts and bounds") {
    val rows = graft.queries.Maintain.qProfile(spark, sf).collect()
    assert(rows.length == graft.queries.Maintain.ProfileCols.length)
    val nRows = rows.head.getLong(1)
    rows.foreach { r =>
      assert(r.getLong(1) == nRows, "n_rows must be one global count")
      val (nn, nd) = (r.getLong(2), r.getLong(4))
      assert(nn >= 0 && nn <= nRows)
      assert(nd <= nRows - nn, s"${r.getString(0)}: distinct > non-null")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      if (nn < nRows)
        assert(r.getString(5) <= r.getString(6) ||
          // numeric strings compare numerically only within equal length;
          // just require both bounds present when non-null rows exist
          r.getString(5).nonEmpty && r.getString(6).nonEmpty)
    }
    val flag = rows.find(_.getString(0) == "l_returnflag").get
    assert(flag.getLong(4) == 3 && flag.getString(5) == "A" &&
      flag.getString(6) == "R", s"returnflag profile drifted: $flag")
  }

  test("streaks: islands match a brute-force recount per user") {
    val rows = graft.queries.Events.qEventsStreaks(spark, sf).collect()
    assert(rows.nonEmpty)
    val daysByUser = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).cast("string").as("d"))
      .distinct().collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(r => java.time.LocalDate.parse(r.getString(1)))
        .sortBy(_.toEpochDay))
    rows.foreach { r =>
      val days = daysByUser(r.getLong(0))
      // brute-force longest run of consecutive days
      var best = 1L; var cur = 1L
      days.sliding(2).foreach {
        case Array(a, b) =>
          cur = if (b.toEpochDay == a.toEpochDay + 1) cur + 1 else 1
          best = math.max(best, cur)
        case _ =>
      }
      assert(r.getLong(2) == best,
        s"user ${r.getLong(0)}: streak ${r.getLong(2)} != brute $best")
      assert(r.getLong(1) >= 1 && r.getLong(2) >= 1)
    }
  }

  test("cohort: full retention at offset zero, bounded elsewhere") {
    val rows = graft.queries.Events.qEventsCohort(spark, sf).collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getString(0))
    byCohort.foreach { case (c, rs) =>
      val zero = rs.find(_.getLong(1) == 0L)
      assert(zero.isDefined, s"cohort $c missing offset 0")
      // every user is active in their own first week by definition
      assert(zero.get.getLong(2) == zero.get.getLong(3))
      assert(math.abs(zero.get.getDouble(4) - 1.0) < 1e-9)
      rs.foreach { r =>
        assert(r.getLong(2) <= r.getLong(3), "active > cohort size")
        assert(r.getLong(1) >= 0)
      }
    }
    // cohort sizes tile the distinct-user population
    val totalUsers = Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(byCohort.values.map(_.head.getLong(3)).sum == totalUsers)
  }

  test("bigram perplexity: valid LM bounds, bigram counts tile docs") {
    val rows = graft.queries.Text.qTextPerplexityBigram(spark, sf).collect()
    assert(rows.nonEmpty)
    val nToks = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(split(lower(col("text")), "\\s+")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) == nToks(r.getLong(0)) - 1,
        s"doc ${r.getLong(0)}: bigram count != n_tokens - 1")
      // smoothed probabilities are strictly in (0, 1): negative mean
      // log-prob, perplexity above 1 and below the smoothed ceiling
      assert(r.getDouble(2) < 0.0, "a log-probability reached 0")
      assert(r.getDouble(3) > 1.0)
    }
    // every doc with >= 2 tokens has a model row; shorter docs none
    assert(rows.map(_.getLong(0)).toSet ==
      nToks.filter(_._2 >= 2).keySet)
  }

  test("corpus report: cards tile the corpus with in-range metrics") {
    val rows = graft.queries.Text.qCorpusReport(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == total, "cards must tile the corpus")
    val nLangs = Tables.documents(spark, sf)
      .select(col("lang")).distinct().count()
    rows.foreach { r =>
      assert(r.getLong(2) >= 1 && r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) < 1.0, "dup_frac range")
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0, "quality range")
      assert(r.getDouble(5) > 0.0, "mean tokens positive")
      val h = r.getDouble(6)
      assert(h >= -1e-6 &&
        h <= math.log(nLangs.toDouble) / math.log(2.0) + 1e-6,
        s"lang entropy $h outside [0, log2($nLangs)]")
    }
  }

  test("dedup nearest equals the argmax over the symmetrized pair list") {
    val out = graft.queries.DedupSim.qDedupNearest(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out.nonEmpty)
    val pairs = graft.dedup.Dedup.minhashDedup(
      Tables.documents(spark, sf), "doc_id", "text", n = 3, threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val want = (pairs.map(p => (p._1, p._2, p._3)) ++
      pairs.map(p => (p._2, p._1, p._3)))
      .groupBy(_._1).view.mapValues { cs =>
        val best = cs.minBy(c => (-c._3, c._2))
        (best._2, best._3)
      }.toMap
    assert(out == want, "nearest drifted from the brute-force argmax")
    // the best match's own best is at least as similar (argmax symmetry)
    out.foreach { case (_, (partner, j)) =>
      assert(out(partner)._2 >= j - 1e-9)
    }
  }

  test("temperature sampling flattens source proportions toward sqrt") {
    val docs = Tables.documents(spark, sf)
    val nBySource = docs.groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = graft.queries.Text.qSampleTemperature(spark, sf).collect()
    val rateBySource = kept.map(r => r.getString(1) -> r.getDouble(2)).toMap
    // coupled closed form: rate_s = C / sqrt(n_s), capped at 1.0 — the
    // smallest source demands the highest rate and caps the system
    val minSource = nBySource.minBy(_._2)._1
    assert(math.abs(rateBySource(minSource) - 1.0) < 1e-9,
      s"smallest source must keep everything: $rateBySource")
    val c = math.sqrt(nBySource(minSource).toDouble)
    nBySource.foreach { case (src, n) =>
      val want = math.min(1.0, c / math.sqrt(n.toDouble))
      assert(math.abs(rateBySource(src) - want) < 1e-5,
        s"$src: rate ${rateBySource(src)} != closed form $want")
    }
    // kept counts concentrate toward the closed-form expectation
    val keptBySource = kept.groupBy(_.getString(1)).view.mapValues(_.length)
    nBySource.foreach { case (src, n) =>
      val expect = n * rateBySource(src)
      assert(math.abs(keptBySource(src) - expect) <= 4 * math.sqrt(expect) + 8,
        s"$src kept ${keptBySource(src)} vs expected $expect")
    }
  }
}
