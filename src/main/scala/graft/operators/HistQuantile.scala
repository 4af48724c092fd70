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
    * the overshoot fraction. Pure when-chains over the fixed n — the
    * whole estimate is one codegen'd projection, no second shuffle. */
  def estimate(
      counts: Seq[Column], p: Double, lo: Double, hi: Double): Column = {
    val n = counts.size
    val width = (hi - lo) / n
    val total = counts.reduce(_ + _)
    val cums = (0 until n).map(i => counts.take(i + 1).reduce(_ + _))
    val t = lit(p) * total
    def pick(vals: Seq[Column]): Column =
      (0 until n).reverse.foldLeft(vals(n - 1)) { (acc, i) =>
        when(cums(i) >= t, vals(i)).otherwise(acc)
      }
    val idx = pick((0 until n).map(i => lit(i)))
    val c = pick(counts)
    val cumPrev = pick((0 until n).map(i => cums(i) - counts(i)))
    val frac = (t - cumPrev.cast("double")) / c.cast("double")
    lit(lo) + (idx.cast("double") + frac) * lit(width)
  }
}
