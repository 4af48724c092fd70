package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Fixed-bucket histogram quantiles — the STREAMABLE percentile path
  * (cf. Prometheus classic histograms): per group, maintain n
  * conditional bucket counts in ONE aggregate (mergeable integers —
  * exactly the state shape a streaming windowed aggregate can hold,
  * unlike a rank-based percentile), then close any quantile by linear
  * interpolation inside the bucket the cumulative count crosses.
  *
  * Error contract: an estimate is off by at most one bucket width
  * (the documented trade for O(n) fixed state at 100 TB / unbounded
  * streams). The arithmetic is a fixed IEEE sequence over exact
  * integer counts, so batch, streaming, and the DuckDB oracle all
  * produce bit-identical estimates for the same data.
  *
  * Used by queries.Events.qEventsHistQuantiles (batch, oracle-checked)
  * and streaming.EventsStream.histQuantileStream (windowed twin). */
object HistQuantile {

  /** Bucket index for `value` over n equal buckets on [lo, hi);
    * out-of-range values clamp into the edge buckets. */
  def bucket(value: Column, lo: Double, hi: Double, n: Int): Column =
    least(greatest(
      floor((value - lit(lo)) / lit((hi - lo) / n)).cast("int"),
      lit(0)), lit(n - 1))

  /** The n conditional-count aggregate columns c0..c(n-1) for one
    * group — map-side-partial friendly and streaming-legal (one
    * aggregate, no chaining). */
  def bucketCounts(
      value: Column, lo: Double, hi: Double, n: Int): Seq[Column] = {
    val bk = bucket(value, lo, hi, n)
    (0 until n).map(i => count(when(bk === i, lit(1))).as(s"c$i"))
  }

  /** Interpolated p-quantile from the n count columns: find the first
    * bucket whose cumulative count reaches p·total, interpolate by
    * the overshoot fraction.
    *
    * Built from array higher-order functions over ONE array literal —
    * NOT nested when-chains: the chain form expands to thousands of
    * expression nodes, and fused into the aggregate's output method
    * it blew janino's method-size limit, silently dropping the WHOLE
    * aggregate stage to interpreted execution (measured 3.4 s → the
    * HOF form runs the scan codegen'd and closes in a separate tiny
    * projection over |groups| rows). Integer arithmetic until the
    * final fixed IEEE interpolation — unchanged, so the oracle and
    * the streaming twin still match bit-for-bit. */
  def estimate(
      counts: Seq[Column], p: Double, lo: Double, hi: Double): Column = {
    val n = counts.size
    val width = (hi - lo) / n
    val arr = array(counts: _*)
    val cums = transform(sequence(lit(1), lit(n)),
      i => aggregate(slice(arr, lit(1), i), lit(0L), (a, x) => a + x))
    val t = lit(p) * element_at(cums, n)
    val idx = element_at(
      filter(sequence(lit(0), lit(n - 1)),
        i => element_at(cums, i + 1).cast("double") >= t), 1)
    val c = element_at(arr, idx + 1)
    val cumPrev = when(idx === 0, lit(0L)).otherwise(element_at(cums, idx))
    val frac = (t - cumPrev.cast("double")) / c.cast("double")
    lit(lo) + (idx.cast("double") + frac) * lit(width)
  }
}
