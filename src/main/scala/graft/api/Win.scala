package graft.api

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}

/** Window-frame construction mirroring the reference's
  * `Window.rows(...)` / `Window.range(...)` classmethods
  * (/root/reference/stupidb/aggregation.py:268 `Window`).
  *
  * Frame-boundary semantics match stupidb's FrameClause
  * (aggregation.py:135 `compute_window_frame`):
  *   - `preceding = None`  → UNBOUNDED PRECEDING
  *   - `following = None`  → CURRENT ROW when ordered, else the whole
  *     partition (Spark's own default does exactly this, so we only set
  *     an explicit frame when a bound is given)
  *
  * Where stupidb evaluates frames serially per partition with a segment
  * tree for O(n log n) associative aggregation, Spark's WindowExec gets
  * the same aggregates partition-parallel after one shuffle on the
  * PARTITION BY keys plus an intra-partition sort — the shape that holds
  * at 100 TB as long as partitions are bounded (SURVEY.md §4).
  */
object Win {

  /** ROWS-framed window — stupidb aggregation.py:311 `Window.rows`. */
  def rows(
      partitionBy: Seq[Column] = Nil,
      orderBy: Seq[Column] = Nil,
      preceding: Option[Long] = None,
      following: Option[Long] = None): WindowSpec = {
    val base = spec(partitionBy, orderBy)
    (preceding, following) match {
      case (None, None) if orderBy.isEmpty => base
      case _ =>
        base.rowsBetween(
          preceding.map(p => -p).getOrElse(Window.unboundedPreceding),
          following.getOrElse(Window.currentRow))
    }
  }

  /** RANGE-framed window over a numeric key — aggregation.py:330
    * `Window.range` (stupidb requires exactly one ORDER BY key for
    * range frames; Spark enforces the same). */
  def range(
      partitionBy: Seq[Column] = Nil,
      orderBy: Seq[Column] = Nil,
      preceding: Option[Long] = None,
      following: Option[Long] = None): WindowSpec = {
    val base = spec(partitionBy, orderBy)
    (preceding, following) match {
      case (None, None) if orderBy.isEmpty => base
      case _ =>
        base.rangeBetween(
          preceding.map(p => -p).getOrElse(Window.unboundedPreceding),
          following.getOrElse(Window.currentRow))
    }
  }

  private def spec(partitionBy: Seq[Column], orderBy: Seq[Column]): WindowSpec = {
    val p = if (partitionBy.nonEmpty) Window.partitionBy(partitionBy: _*)
            else Window.partitionBy()
    if (orderBy.nonEmpty) p.orderBy(orderBy: _*) else p
  }
}
