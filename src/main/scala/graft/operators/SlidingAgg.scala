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
}
