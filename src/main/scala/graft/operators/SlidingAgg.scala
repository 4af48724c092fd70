package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** O(n) sliding-window statistics via exact prefix sums.
  *
  * The reference engine aggregates sliding frames with a segment tree —
  * O(n log n) per partition (/root/reference/stupidb/associative/
  * segmenttree.py). Spark's WindowExec instead RECOMPUTES bounded
  * frames from scratch per row: O(n·w), which the sf0.1 bench exposed
  * (10s for a 50-row frame over 600k rows). The Spark-first fix is
  * better than both: sum/count/avg/variance are all derivable from
  * invertible prefix sums, so two cumulative windows (incremental, O(n))
  * plus a lag give every frame aggregate:
  *
  *   frame_sum(i)  = S(i) − S(i−w),   S = running Σx
  *   frame_sumsq(i)= Q(i) − Q(i−w),   Q = running Σx²
  *   var_samp      = (Σx² − (Σx)²/n) / (n−1)
  *
  * Prefix sums are computed on DECIMAL, so subtraction is EXACT — no
  * float cancellation drift as the window slides (the classic pitfall
  * of prefix-sum sliding aggregates), and results match a direct
  * per-frame computation bit-for-bit after the final rounding.
  *
  * Null handling matches SQL window aggregates: `n` is the count of
  * NON-NULL values in the frame (a third cumulative count prefix-sum),
  * and a frame with zero non-null values yields NULL stats.
  *
  * INPUT CONTRACT: values are snapped to DECIMAL(18,4) before the
  * prefix sums — inputs with more than 4 decimal places are rounded at
  * ingestion (that is the precision the oracle comparison runs at).
  */
object SlidingAgg {

  /** Append sliding count/avg/var_samp/stddev_samp columns for the
    * frame `ROWS (w-1) PRECEDING .. CURRENT ROW`.
    *
    * @param roundTo decimal places for the emitted statistics (the
    *   contract the DuckDB oracle is compared at)
    */
  def slidingStats(
      df: DataFrame,
      partitionBy: Seq[Column],
      orderBy: Seq[Column],
      valueCol: Column,
      w: Int,
      prefix: String = "sl_",
      roundTo: Int = 6): DataFrame = {
    val cum = Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val seq = Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
    val x = valueCol.cast("decimal(18,4)")
    val x2 = (x * x).cast("decimal(28,8)")

    val withPrefix = df
      .withColumn("_c", count(x).over(cum))
      .withColumn("_s", sum(x).over(cum))
      .withColumn("_q", sum(x2).over(cum))
    val n = (col("_c") - coalesce(lag(col("_c"), w).over(seq), lit(0L)))
      .cast("double")
    val fSum = (coalesce(col("_s"), lit(0).cast("decimal(18,4)")) -
      coalesce(lag(col("_s"), w).over(seq),
        lit(0).cast("decimal(18,4)"))).cast("double")
    val fSumSq = (coalesce(col("_q"), lit(0).cast("decimal(28,8)")) -
      coalesce(lag(col("_q"), w).over(seq),
        lit(0).cast("decimal(28,8)"))).cast("double")
    val varSamp = when(n > 1,
      greatest((fSumSq - fSum * fSum / n) / (n - 1), lit(0.0)))

    withPrefix
      .withColumn(s"${prefix}n", n.cast("long"))
      .withColumn(s"${prefix}avg", when(n > 0, round(fSum / n, roundTo)))
      .withColumn(s"${prefix}var_samp", round(varSamp, roundTo))
      .withColumn(s"${prefix}stddev_samp", round(sqrt(varSamp), roundTo))
      .drop("_c", "_s", "_q")
  }

  /** Append `<prefix>sum` / `<prefix>cnt` over the VALUE-based frame
    * `RANGE radius PRECEDING .. CURRENT ROW` (ordered by `orderVal`).
    *
    * The `lag(_, w)` trick above needs a fixed ROW width, so RANGE
    * frames can't use it — and Spark's native bounded-start RANGE
    * frame re-aggregates per row: O(n·w). This is the O(n log n)
    * union-sort formulation instead:
    *
    *   frame(i) = cum(vᵢ) − prefix(vᵢ − radius)
    *
    * where cum is the peer-inclusive running aggregate (an incremental
    * UNBOUNDED..CURRENT RANGE frame) and prefix(k) is the running
    * aggregate over values STRICTLY below k, read off by sorting a
    * probe row at key k into the data: probes carry tag 0 < data tag 1,
    * so at equal keys the probe sees exactly the strictly-smaller
    * rows — the boundary `v ≥ vᵢ − radius` lands in the frame, as
    * RANGE semantics require. Sums accumulate in DECIMAL so the
    * subtraction is exact (same rationale as `slidingStats`).
    *
    * Cost: two window passes + one join-back on `uniqueKey`, all
    * shuffled on the partition key — independent of frame width.
    *
    * INPUT CONTRACT: like `slidingStats`, values AND order keys are
    * snapped to DECIMAL(18,4) (order keys with more than 4 fractional
    * digits would round); a frame whose values are ALL NULL yields sum 0
    * (SQL would yield NULL) — pre-filter nulls if that distinction
    * matters.
    *
    * @param uniqueKey row-identity columns for the probe join-back */
  def slidingRangeSum(
      df: DataFrame,
      partitionCols: Seq[String],
      orderVal: Column,
      radius: Column,
      valueCol: Column,
      uniqueKey: Seq[String],
      prefix: String = "sr_"): DataFrame = {
    val p = partitionCols.map(col)
    val x = valueCol.cast("decimal(18,4)")
    val zero = lit(0).cast("decimal(18,4)")
    // the merge key _k is DECIMAL on BOTH sides so the inclusive RANGE
    // boundary is exact: a double-rounded probe key (v - radius) and a
    // double-rounded data key round at different ulp scales, which can
    // land a row whose value equals exactly v - radius on the wrong
    // side of the frame for decimal order keys
    val data = df.select(
      p ++ uniqueKey.map(col) :+
        orderVal.cast("decimal(18,4)").as("_k") :+
        lit(1).as("_tag") :+ x.as("_x"): _*)
    val probe = df.select(
      p ++ uniqueKey.map(col) :+
        (orderVal.cast("decimal(18,4)") - radius.cast("decimal(18,4)"))
          .cast("decimal(18,4)").as("_k") :+
        lit(0).as("_tag") :+ lit(null).cast("decimal(18,4)").as("_x"): _*)
    val run = Window.partitionBy(p: _*).orderBy(col("_k"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = data.unionByName(probe)
      .withColumn("_ps", sum(col("_x")).over(run))
      .withColumn("_pc",
        sum(when(col("_tag") === 1, 1L).otherwise(0L)).over(run))
      .where(col("_tag") === 0)
      .select(uniqueKey.map(c => col(c).as(s"_u_$c")) :+
        col("_ps").as("_pre_s") :+ col("_pc").as("_pre_c"): _*)
    // same DECIMAL key here: peers of the cumulative frame must be the
    // rows the probe merge considers equal, or the subtraction misaligns
    val cumW = Window.partitionBy(p: _*).orderBy(orderVal.cast("decimal(18,4)"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val backCond = uniqueKey.map(c => col(c) === col(s"_u_$c")).reduce(_ && _)
    df
      .withColumn("_cum_s", sum(x).over(cumW))
      .withColumn("_cum_c", count(lit(1)).over(cumW))
      .join(pre, backCond, "left_outer")
      .withColumn(s"${prefix}sum",
        coalesce(col("_cum_s"), zero) - coalesce(col("_pre_s"), zero))
      .withColumn(s"${prefix}cnt",
        col("_cum_c") - coalesce(col("_pre_c"), lit(0L)))
      .drop("_cum_s", "_cum_c", "_pre_s", "_pre_c")
      .drop(uniqueKey.map(c => s"_u_$c"): _*)
  }
}
