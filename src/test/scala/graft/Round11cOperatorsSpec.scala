package graft

import java.nio.file.Files
import java.security.MessageDigest
import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** Round-11 third-wave additions: in-engine Naive-Bayes language
  * classifier, ε = ln 2 discrete-Laplace DP histogram release,
  * hysteresis (two-threshold) alert episodes. */
class Round11cOperatorsSpec extends SparkSpec {

  test("nb langid: perfectly separable vocab classifies every test doc") {
    import spark.implicits._
    val langs = Seq("en", "es", "de", "fr", "zh")
    // every lang has a unique, heavily repeated marker word; a
    // doc-unique filler keeps fingerprints (and split hashes) distinct
    val docs = for {
      (l, li) <- langs.zipWithIndex
      i <- 0 until 40
    } yield (li * 40L + i, s"marker$l marker$l marker$l filler${li * 40 + i}", l)
    val dir = Files.createTempDirectory("graft_nb").toString
    docs.toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.queries.Text.qNbLangid(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getString(0) == r.getString(1)),
      s"separable corpus must sit on the diagonal: ${rows.mkString(";")}")
    // the matrix covers exactly the docs the split routes to 'test'
    val nTest = graft.queries.Text.qSplitTrainTest(spark, dir)
      .where(col("split") === "test").count()
    assert(rows.map(_.getLong(2)).sum == nTest)
  }

  test("nb langid on sf0.001: confusion tiles to the test split") {
    val d = "/root/testdata/sf0.001"
    val rows = graft.queries.Text.qNbLangid(spark, d).collect()
    val langs = Set("en", "es", "de", "fr", "zh")
    assert(rows.forall(r =>
      langs(r.getString(0)) && langs(r.getString(1))))
    val nTest = graft.queries.Text.qSplitTrainTest(spark, d)
      .where(col("split") === "test").count()
    assert(rows.map(_.getLong(2)).sum == nTest)
  }

  test("dp histogram: noise is the planted md5 trailing-zero geometric difference") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_dp").toString
    Seq((1L, 3L, "AUTOMOBILE"), (2L, 3L, "AUTOMOBILE"), (3L, 7L, "HOUSEHOLD"))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    def geom(tag: String, key: String): Long = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(s"$tag$key".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 13)
      val u = java.lang.Long.parseLong(hex, 16)
      if (u == 0L) 52L else java.lang.Long.numberOfTrailingZeros(u).toLong
    }
    val rows = graft.queries.Governance.qDpHistogram(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    for (((nat, seg), (nTrue, noise, released)) <- rows) {
      val expect = geom("dp1:", s"$nat:$seg") - geom("dp2:", s"$nat:$seg")
      assert(noise == expect, s"cell ($nat,$seg): $noise vs $expect")
      assert(released == nTrue + noise)
    }
    assert(rows((3L, "AUTOMOBILE"))._1 == 2L)
    assert(rows((7L, "HOUSEHOLD"))._1 == 1L)
  }

  test("dp histogram on sf0.001: cells tile to the table; noise is calibrated") {
    val d = "/root/testdata/sf0.001"
    val rows = graft.queries.Governance.qDpHistogram(spark, d).collect()
    assert(rows.map(_.getLong(2)).sum == Tables.customer(spark, d).count())
    assert(rows.forall(r => r.getLong(4) == r.getLong(2) + r.getLong(3)))
    // E|noise| = 4/3 for the p = ½ two-sided geometric; allow wide CI
    val meanAbs = rows.map(r => math.abs(r.getLong(3))).sum.toDouble /
      rows.length
    assert(meanAbs > 0.5 && meanAbs < 2.5, s"E|noise| off: $meanAbs")
  }

  test("hysteresis: planted spike series opens twice and closes below the median") {
    import spark.implicits._
    // 40 contiguous hours of one event type; counts: 3 everywhere,
    // 30@h36 (opens), 3@h37 (dead band, stays open), 1@h38 (closes),
    // 25@h39 (reopens, series ends open). percentile_disc: hi = lo = 3.
    val counts = Seq.fill(36)(3L) ++ Seq(30L, 3L, 1L, 25L)
    val rows = for {
      (c, h) <- counts.zipWithIndex
      i <- 0L until c
    } yield (h * 1000L + i, new Timestamp(h * 3600L * 1000L), 1L, "view", 0.0)
    val dir = Files.createTempDirectory("graft_hys").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.queries.Events.qEventsHysteresis(spark, dir).collect()
    assert(r.length == 1)
    val row = r.head
    assert((row.getLong(1), row.getLong(2)) == ((3L, 3L)), s"thr $row")
    assert(row.getLong(3) == 40L)
    assert(row.getLong(4) == 2L, s"episodes: $row")
    assert(row.getLong(5) == 3L, s"alert hours: $row")
    assert(row.getLong(6) == 2L, s"max episode: $row")
    assert(row.getLong(7) == 75000L)
  }

  test("hysteresis on sf0.001: episode accounting is internally consistent") {
    val rows = graft.queries.Events
      .qEventsHysteresis(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))        // lo <= hi
      assert(r.getLong(5) <= r.getLong(3))        // alert_hours <= n_hours
      assert(r.getLong(4) <= math.max(r.getLong(5), 1L))
      assert(r.getLong(6) <= r.getLong(5))
      assert(r.getLong(7) == 1000000L * r.getLong(5) / r.getLong(3))
    }
  }
}
