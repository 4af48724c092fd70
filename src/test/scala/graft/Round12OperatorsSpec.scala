package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** Round-12 additions: mergeable quantile-synopsis rollup, per-source
  * contribution cap, hive-partition pruning end-to-end. */
class Round12OperatorsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def writeEvents(rows: Seq[(Long, Timestamp, Long, String, Double)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_r12").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  // ---------------------------------------------------------------- rollup

  test("quantile rollup: planted two-week grid reproduces hand percentiles") {
    // grid is [0,500)/25 -> width 20. Week of Jan 1 2024 (Mon) and the
    // following week.
    var id = 0L
    def ev(t: String, v: Double) = { id += 1; (id, ts(t), 1L, "view", v) }
    val rows = Seq(
      // week 2024-01-01: buckets 0, 1, 12, 24, 24(clamped 600)
      ev("2024-01-01 10:00:00", 10.0),
      ev("2024-01-02 10:00:00", 30.0),
      ev("2024-01-03 10:00:00", 250.0),
      ev("2024-01-03 11:00:00", 490.0),
      ev("2024-01-04 10:00:00", 600.0),
      // week 2024-01-08: single value in bucket 5
      ev("2024-01-08 10:00:00", 100.0))
    val dir = writeEvents(rows)
    val out = graft.queries.Maintain.qQuantileRollup(spark, dir)
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    // week1 n=5: cum over buckets (0:1, 1:2, 12:3, 24:5)
    //   p50: first cum*100 >= 250 -> bucket 12 -> 240
    //   p95: first cum*100 >= 475 -> bucket 24 -> 480
    //   p99: 495 -> bucket 24 -> 480
    // week2 n=1: all percentiles -> bucket 5 -> 100
    assert(out.toSeq == Seq(
      ("view", "2024-01-01", 5L, 240L, 480L, 480L),
      ("view", "2024-01-08", 1L, 100L, 100L, 100L)), out.mkString(";"))
  }

  test("quantile rollup: daily-synopsis rollup equals direct weekly histogram") {
    // the monoid claim: summing the DAILY synopses per week gives
    // exactly the weekly histogram a direct one-pass build produces,
    // so the percentile read is identical — on the real sf0.001 corpus
    val ev = Tables.events(spark, sf).where(col("value").isNotNull)
    val viaDaily = graft.queries.Maintain.dailyValueHist(ev)
      .groupBy(col("event_type"),
        date_trunc("week", col("day")).cast("date").as("week"), col("bucket"))
      .agg(sum(col("n")).as("n"))
    val w = (graft.queries.Events.HistHi - graft.queries.Events.HistLo) /
      graft.queries.Events.HistBuckets
    val direct = ev.groupBy(col("event_type"),
        date_trunc("week", to_date(col("ts"))).cast("date").as("week"),
        least(greatest(
          floor((col("value") - lit(graft.queries.Events.HistLo)) / lit(w))
            .cast("long"), lit(0L)),
          lit(graft.queries.Events.HistBuckets - 1L)).as("bucket"))
      .agg(count(lit(1)).as("n"))
    assert(viaDaily.exceptAll(direct).isEmpty &&
      direct.exceptAll(viaDaily).isEmpty,
      "daily-rolled weekly histogram != direct weekly histogram")
  }

  // ------------------------------------------------------------ corpus cap

  test("corpus cap: over-cap source keeps exactly the quality top-N") {
    import spark.implicits._
    // src_a exceeds cap=2: qualities 0.9, 0.8(doc 2), 0.8(doc 3), 0.1
    //   -> keeps docs 1 (0.9) and 2 (0.8 tie, smaller doc_id)
    // src_b under cap: keeps its single doc
    val scored = Seq(
      (1L, "src_a", 0.9, 100L),
      (2L, "src_a", 0.8, 50L),
      (3L, "src_a", 0.8, 40L),
      (4L, "src_a", 0.1, 10L),
      (5L, "src_b", 0.2, 30L))
      .toDF("doc_id", "source", "quality", "n_toks")
    val out = graft.queries.Text.corpusCap(scored, cap = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    // totals: pre 230, post 180 (kept: 100+50 from a, 30 from b)
    // shares: a pre 200/230 -> 869565 ppm, post 150/180 -> 833333
    //         b pre  30/230 -> 130434,    post  30/180 -> 166666
    assert(out.toSeq == Seq(
      ("src_a", 4L, 2L, 2L, 200L, 150L, 869565L, 833333L),
      ("src_b", 1L, 1L, 0L, 30L, 30L, 130434L, 166666L)), out.mkString(";"))
  }

  test("corpus cap: under-cap corpus keeps everything, shares unchanged") {
    import spark.implicits._
    val scored = Seq(
      (1L, "s1", 0.5, 60L),
      (2L, "s2", 0.6, 40L))
      .toDF("doc_id", "source", "quality", "n_toks")
    val out = graft.queries.Text.corpusCap(scored, cap = 2)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3),
        r.getLong(6), r.getLong(7)))
    assert(out.toSeq == Seq(
      ("s1", 1L, 0L, 600000L, 600000L),
      ("s2", 1L, 0L, 400000L, 400000L)), out.mkString(";"))
  }

  // -------------------------------------------------------- partition prune

  test("partition prune: 2-of-4 days read, scan prunes at the file index") {
    var id = 0L
    def ev(t: String, v: Double) = { id += 1; (id, ts(t), 1L, "view", v) }
    val rows = Seq(
      ev("2024-01-23 10:00:00", 1.0), ev("2024-01-24 10:00:00", 2.0),
      ev("2024-01-25 10:00:00", 3.0), ev("2024-01-26 10:00:00", 4.0),
      ev("2024-01-26 11:00:00", 5.0))
    val dir = writeEvents(rows)
    val out = graft.queries.Maintain.qPartitionPrune(spark, dir)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      ("2024-01-25", 1L, 300L, 2L, 4L),
      ("2024-01-26", 2L, 900L, 2L, 4L)), out.mkString(";"))
    // the physical scan itself must carry the day predicate as a
    // partition filter and shrink the listing — metadata-level pruning,
    // zero tasks for the pruned days
    import org.apache.spark.sql.execution.FileSourceScanLike
    val scratch = graft.queries.Maintain.scratchDir("partition_prune", dir)
    val pruned = spark.read.parquet(scratch)
      .where(col("day") >= lit(graft.queries.Maintain.PruneCutoffDay)
        .cast("date"))
    val scan = pruned.queryExecution.sparkPlan.collectLeaves()
      .collectFirst { case f: FileSourceScanLike => f }.get
    assert(scan.partitionFilters.nonEmpty, "no partition filter pushed")
    assert(scan.selectedPartitions.partitionCount == 2,
      s"expected 2 partitions read, got ${scan.selectedPartitions.partitionCount}")
    assert(scan.relation.location.inputFiles.length == 4,
      "expected 4 files total (one per day)")
  }
}
