package graft.operators

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** One (value, id) candidate for a top-k heap. Ordering: value DESC,
  * id ASC on ties — a TOTAL order, so results are deterministic across
  * partitionings and engines. */
case class ScoredId(value: Double, id: Long)

/** Bounded-heap top-k aggregate — the SCALE shape for "top k rows per
  * group".
  *
  * The window form (`row_number() OVER (PARTITION BY g ORDER BY v)
  * <= k`, q_events_topn_user) shuffles and sorts EVERY detail row on
  * the group key. This aggregate is map-side combinable: each task
  * keeps at most k candidates per group, so only |groups|·k rows per
  * partition reach the shuffle — on a 100 TB fact with a handful of
  * groups, that is the difference between shuffling terabytes and
  * shuffling kilobytes. Physical plan is an ObjectHashAggregate
  * (object buffer, partial + final) — deliberately traded against
  * codegen because the bounded buffer eliminates the sort entirely;
  * cost per row is O(log k) against a k-element buffer.
  *
  * The buffer is kept as a sorted Seq (k is small by contract), so a
  * reduce is a position scan + splice — O(k) per admitted row, O(1)
  * compare-and-reject for the common below-threshold row; merge
  * concatenates and re-takes k. NULL-valued rows must be filtered by
  * the caller (an SQL window treats them per null-ordering; a heap has
  * no natural place for them).
  */
class TopKAggregator(k: Int)
    extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
  require(k > 0, s"top-k needs k > 0, got $k")

  private val ord: Ordering[ScoredId] =
    Ordering.by((s: ScoredId) => (-s.value, s.id))

  override def zero: Seq[ScoredId] = Nil

  override def reduce(b: Seq[ScoredId], a: ScoredId): Seq[ScoredId] =
    if (b.lengthCompare(k) < 0 || ord.lt(a, b.last)) {
      val i = b.indexWhere(ord.lt(a, _)) // b is sorted; splice in place
      val at = if (i < 0) b.length else i
      (b.take(at) :+ a) ++ b.drop(at).take(k - at - 1)
    } else b

  override def merge(x: Seq[ScoredId], y: Seq[ScoredId]): Seq[ScoredId] =
    (x ++ y).sorted(ord).take(k)

  override def finish(b: Seq[ScoredId]): Seq[ScoredId] = b

  override def bufferEncoder: Encoder[Seq[ScoredId]] =
    ExpressionEncoder[Seq[ScoredId]]()

  override def outputEncoder: Encoder[Seq[ScoredId]] =
    ExpressionEncoder[Seq[ScoredId]]()
}

object TopK {
  /** Column-level top-k aggregate: `topk(k)(col(v), col(id))` inside
    * any `agg(...)` — returns array<struct<value, id>> sorted by
    * (value DESC, id ASC), length ≤ k. */
  def topk(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(
      new TopKAggregator(k), Encoders.product[ScoredId])
}
