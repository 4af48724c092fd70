package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window aggregates with PER-ROW frame BOUNDS — reference parity.
  *
  * The reference evaluates `preceding`/`following` frame clauses as
  * callables against the current row
  * (/root/reference/stupidb/aggregation.py:225 `preceding(current_row)`,
  * :236 `following(current_row)`), e.g. "sum over the last `row.k`
  * rows". Spark frames require foldable bounds, so the variable form
  * is expressed relationally (the `VarNav` trick, widened from a point
  * lookup to a range): number the rows per partition, join each row's
  * frame interval [rn − preceding(row), rn + following(row)] back
  * against the row numbers, and aggregate the matches.
  *
  * Scale shape: one shuffle for the ranking window, then an equi-join
  * on the partition key with a band predicate on `rn` — the same
  * sort-merge-join-plus-filter plan Spark gives native range frames.
  * Everything is codegen'd; the pair work is bounded by the frame
  * sizes, not the partition sizes.
  */
object VarFrame {

  /** Append `<prefix>_sum`, `<prefix>_cnt`, `<prefix>_avg` of
    * `valueCol` over each row's variable frame
    * [rn − preceding(row), rn + following(row)] (row positions in the
    * (partitionCols, orderCols) ordering; bounds clamp at partition
    * edges like any frame). An empty frame (possible when `preceding`
    * is negative) yields cnt = 0 and NULL sum/avg. `cnt` counts ROWS in
    * the frame (COUNT(*) semantics) — not non-null values — and `avg`
    * is sum-of-non-null-values over that row count.
    *
    * The sum accumulates in DECIMAL(18,4) so results are
    * order-independent and engine-portable (SURVEY §3.6). */
  def varFrameAgg(
      df: DataFrame,
      partitionCols: Seq[String],
      orderCols: Seq[Column],
      valueCol: Column,
      preceding: Column,
      following: Column,
      prefix: String = "vf"): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(orderCols: _*)
    val withRn = df.withColumn("_rn", row_number().over(w))
    val vals = withRn.select(
      partitionCols.map(c => col(c).as(s"_r_$c")) :+
        col("_rn").as("_rn_r") :+
        valueCol.cast("decimal(18,4)").as("_v_r"): _*)
    // frame bounds are evaluated against the probe row BEFORE the
    // projection, so `preceding`/`following` may reference any input
    // column (stupidb's callables see the whole current row)
    val probe = withRn.select(
      partitionCols.map(col) :+ col("_rn") :+
        (col("_rn") - preceding.cast("int")).as("_lo") :+
        (col("_rn") + following.cast("int")).as("_hi"): _*)
    val joinCond = partitionCols
      .map(c => col(c) === col(s"_r_$c"))
      .foldLeft(col("_rn_r") >= col("_lo") && col("_rn_r") <= col("_hi"))(_ && _)
    // per-frame aggregates keyed by (partition, rn), joined back so
    // rows with empty frames survive
    val frameAgg = probe
      .join(vals, joinCond)
      .groupBy(partitionCols.map(col) :+ col("_rn"): _*)
      // count(1), not count(_v_r): the frame count is ROWS in frame
      // (COUNT(*) semantics, matching the q_win_frame_var oracle), not
      // non-null values — they diverge when valueCol has nulls in frame
      .agg(sum(col("_v_r")).as("_vf_sum"), count(lit(1)).as("_vf_cnt"))
      .select(
        partitionCols.map(c => col(c).as(s"_g_$c")) :+
          col("_rn").as("_g_rn") :+ col("_vf_sum") :+ col("_vf_cnt"): _*)
    val backCond = partitionCols
      .map(c => col(c) === col(s"_g_$c"))
      .foldLeft(col("_rn") === col("_g_rn"))(_ && _)
    withRn.join(frameAgg, backCond, "left_outer")
      .withColumn(s"${prefix}_sum", col("_vf_sum"))
      .withColumn(s"${prefix}_cnt", coalesce(col("_vf_cnt"), lit(0L)))
      .withColumn(s"${prefix}_avg",
        round(col("_vf_sum").cast("double") / col("_vf_cnt"), 6))
      .drop("_rn", "_g_rn", "_vf_sum", "_vf_cnt")
      .drop(partitionCols.map(c => s"_g_$c"): _*)
  }
}
