package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EMPIRICAL scaling gate: run the same plan at two data sizes and
  * machine-assert how its shuffle volume grows. Plan-shape lints
  * (PlanLintSpec) prove the absence of known-bad operators; this spec
  * proves the claimed complexity on real executions — a linear
  * operator's shuffle records must grow ≈ with the data, while a
  * deliberately quadratic control must blow up, proving the detector
  * actually distinguishes the two. */
class ScalingSpec extends SparkSpec {

  private val sfSmall = "/root/testdata/sf0.001"
  private val sfBig = "/root/testdata/sf0.01" // 10× the events rows

  /** Total shuffle records written while executing `df` through the
    * noop sink, via a task-end listener (polled until the counter
    * stabilizes — listener events trail the action). */
  private def shuffleRecordsOf(df: DataFrame): Long = {
    val acc = new AtomicLong
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          acc.addAndGet(t.taskMetrics.shuffleWriteMetrics.recordsWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      df.write.format("noop").mode("overwrite").save()
      var stable = 0
      var prev = -1L
      while (stable < 2) {
        Thread.sleep(250)
        if (acc.get == prev) stable += 1 else { stable = 0; prev = acc.get }
      }
      acc.get
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("sessionize shuffle grows linearly with the event volume") {
    val small = shuffleRecordsOf(
      graft.queries.Events.qEventsSessionize(spark, sfSmall))
    val big = shuffleRecordsOf(
      graft.queries.Events.qEventsSessionize(spark, sfBig))
    assert(small > 0, "listener captured nothing")
    val ratio = big.toDouble / small
    // 10× data → ≈10× shuffle for a linear operator; 25 leaves head-
    // room for fixed per-plan overhead without admitting quadratics
    assert(ratio < 25.0,
      s"sessionize shuffle grew ${ratio}x on 10x data ($small -> $big)")
  }

  test("minhash dedup shuffle grows linearly with the corpus") {
    // documents: 500 rows at sf0.01 → 5000 at sf0.1 (docs only scale
    // from sf0.01 up). The LSH claim IS linearity: signature pass,
    // band buckets, and bounded-bucket verification — never corpus²
    val small = shuffleRecordsOf(
      graft.queries.DedupSim.qDedupMinhash(spark, "/root/testdata/sf0.01"))
    val big = shuffleRecordsOf(
      graft.queries.DedupSim.qDedupMinhash(spark, "/root/testdata/sf0.1"))
    assert(small > 0, "listener captured nothing")
    val ratio = big.toDouble / small
    assert(ratio < 30.0,
      s"minhash shuffle grew ${ratio}x on 10x docs ($small -> $big)")
  }

  test("kcore peel shuffle grows linearly with the edge volume") {
    // each peel round is a degree aggregate + two semi-joins on the
    // (materialized) edge list — work ∝ |E| per round, never pairs
    val small = shuffleRecordsOf(
      graft.queries.Graph.qGraphKcore(spark, sfSmall))
    val big = shuffleRecordsOf(
      graft.queries.Graph.qGraphKcore(spark, sfBig))
    assert(small > 0, "listener captured nothing")
    val ratio = big.toDouble / small
    // co-purchase edges grow ~13× between these SFs (8.9k → 115.7k,
    // measured); 40 leaves the same headroom factor as the other
    // gates without admitting an |E|² shape (~169×)
    assert(ratio < 40.0,
      s"kcore shuffle grew ${ratio}x on ~13x edges ($small -> $big)")
  }

  test("triangle census shuffle grows linearly with the edge volume") {
    // degree-ordered orientation bounds every wedge center's fan-out;
    // the round-12 100x wall-time run hit the SINGLE BOX's free-disk
    // ceiling on this query's (linearly grown) spill volume — this
    // gate is the evidence that the growth is volume, not a quadratic:
    // shuffle records must track edges, never edge pairs
    val small = shuffleRecordsOf(
      graft.queries.Graph.qGraphTriangles(spark, sfSmall))
    val big = shuffleRecordsOf(
      graft.queries.Graph.qGraphTriangles(spark, sfBig))
    assert(small > 0, "listener captured nothing")
    val ratio = big.toDouble / small
    // same ~13x edge growth + headroom budget as the kcore gate; an
    // |E|^2 wedge explosion would be ~169x
    assert(ratio < 40.0,
      s"triangles shuffle grew ${ratio}x on ~13x edges ($small -> $big)")
  }

  test("paths trigram shuffle grows linearly with the event volume") {
    // one user-partitioned window over the fact plus a |types|³-
    // bounded count table — shuffle ∝ events, never sequences²
    val small = shuffleRecordsOf(
      graft.queries.Events.qEventsPaths(spark, sfSmall))
    val big = shuffleRecordsOf(
      graft.queries.Events.qEventsPaths(spark, sfBig))
    assert(small > 0, "listener captured nothing")
    val ratio = big.toDouble / small
    assert(ratio < 25.0,
      s"paths shuffle grew ${ratio}x on 10x data ($small -> $big)")
  }

  test("cusum shuffle is rollup-bounded: it grows with buckets, not events") {
    // past the first hash aggregate everything runs on the hourly
    // rollup — 10× the events over the SAME calendar span must leave
    // the downstream shuffle nearly flat, so total shuffle growth
    // stays well under the event growth (the days-dimension claim,
    // measured instead of asserted)
    val small = shuffleRecordsOf(
      graft.queries.Events.qEventsCusum(spark, sfSmall))
    val big = shuffleRecordsOf(
      graft.queries.Events.qEventsCusum(spark, sfBig))
    assert(small > 0, "listener captured nothing")
    val ratio = big.toDouble / small
    assert(ratio < 25.0,
      s"cusum shuffle grew ${ratio}x on 10x data ($small -> $big)")
  }

  test("the quadratic control blows up, so the detector discriminates") {
    def allPairs(d: String): DataFrame = {
      val users = Tables.events(spark, d).select(col("user_id")).distinct()
        .withColumn("k", lit(1))
      // constant-key self-join → |users|² pair rows forced through a
      // repartition on the pair key (AQE broadcasts the tiny side, so
      // the join itself shuffles nothing — the repartition makes the
      // quadratic row count hit the wire): the shape the lint + this
      // gate exist to keep out
      users.as("a")
        .join(users.select(col("user_id").as("ub"), col("k")), "k")
        .repartition(col("user_id"), col("ub"))
        .groupBy(col("user_id"), col("ub")).count()
    }
    val small = shuffleRecordsOf(allPairs(sfSmall))
    val big = shuffleRecordsOf(allPairs(sfBig))
    val ratio = big.toDouble / small
    // 10× the users → ≈100× the pair records
    assert(ratio > 50.0,
      s"quadratic control only grew ${ratio}x ($small -> $big) — " +
        "the scaling detector would miss real quadratics")
  }
}
