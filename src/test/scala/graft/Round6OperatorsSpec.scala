package graft

import org.apache.spark.sql.functions._

/** Round-6 operators: gap-fill/LOCF densification and fuzzy joins. */
class Round6OperatorsSpec extends SparkSpec {

  test("gapfill emits a dense grid, preserves totals, carries LOCF forward") {
    val out = graft.queries.Events.qEventsGapfill(spark, sf).cache()
    val nTypes = out.select("event_type").distinct().count()
    val nBuckets = out.select("bucket_start").distinct().count()
    assert(out.count() == nTypes * nBuckets, "grid is not dense")
    // densification must not invent or drop events
    val total = out.agg(sum(col("n_events"))).collect()(0).getLong(0)
    val expected = Tables.events(spark, sf).count()
    assert(total == expected, s"event total $total != $expected")
    // there are real gaps, and after the first observation every gap
    // bucket carries a non-null LOCF value
    val gaps = out.where(col("n_events") === 0)
    assert(gaps.count() > 0, "no gaps — grid too coarse to test LOCF")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type")).orderBy(col("bucket_start"))
    val afterFirst = out
      .withColumn("seen",
        sum(col("n_events")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .where(col("seen") > 0)
    assert(afterFirst.where(col("locf_value").isNull).count() == 0,
      "LOCF dropped a value after the first observation")
    out.unpersist()
  }

  test("fuzzy join pairs near-identical names within blocks only") {
    import spark.implicits._
    val rows = Seq(
      "red widget", "red widget", "rd widget", // typo in adjective → same block
      "blue bolt", "blue colt", // typo in the BLOCK token → escapes (documented)
      "green widget").toDF("name") // same block but 4 edits away from "red"
    val out = graft.operators.FuzzyJoin.fuzzyNamePairs(
      rows, "name", graft.operators.FuzzyJoin.lastTokenBlock, maxDist = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSet == Set(("rd widget", "red widget", 1, 1L, 2L)),
      s"unexpected pairs: ${out.toSeq}")
  }
}
