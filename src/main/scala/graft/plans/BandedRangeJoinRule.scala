package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: rewrite `|a.t − b.t| <= r` inner theta-joins into
  * the banded equi-join shape.
  *
  * Spark plans a join whose only usable predicate is a range band as
  * BroadcastNestedLoopJoin — O(|A|·|B|), hopeless at scale. But the
  * band IS an equi-join in disguise (graft.operators.RangeJoin): bucket
  * `t` into width-r bins, expand the left side to (bin−1, bin, bin+1),
  * and join on bin equality with the original predicate re-checked.
  * Any pair within `r` differs by at most one bin, so the rewrite is
  * exact; the physical plan becomes an ordinary shuffled hash/sort-
  * merge join.
  *
  * Fires only when: the join is INNER; a conjunct has the shape
  * `abs(l − r) <= lit` (or `<`, or flipped `>=`/`>`) with one side
  * referencing only the left plan and the other only the right; the
  * operands are integral (epoch micros / row numbers — exact bin
  * math); and no equi-conjunct already exists (if one does, the hash
  * join already has a key and expansion would only add work). The
  * rewritten join contains a bin equi-conjunct, so the rule does not
  * re-fire on its own output.
  *
  * Registered by [[GraftExtensions]] via `injectOptimizerRule`.
  */
object BandedRangeJoinRule extends Rule[LogicalPlan] {

  /** (leftTime, rightTime, radius) when `e` is a usable band conjunct. */
  private def asBand(
      e: Expression, left: LogicalPlan, right: LogicalPlan)
      : Option[(Expression, Expression, Long)] = {
    def integral(t: org.apache.spark.sql.types.DataType): Boolean = t match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType => true
      case _ => false
    }
    def split(a: Expression, b: Expression, r: Long) = {
      val (la, ra) = (a.references.subsetOf(left.outputSet),
        a.references.subsetOf(right.outputSet))
      val (lb, rb) = (b.references.subsetOf(left.outputSet),
        b.references.subsetOf(right.outputSet))
      if (la && rb && a.references.nonEmpty && b.references.nonEmpty)
        Some((a, b, r))
      else if (lb && ra && a.references.nonEmpty && b.references.nonEmpty)
        Some((b, a, r))
      else None
    }
    def fromAbs(abs: Expression, lim: Expression) = (abs, lim) match {
      case (Abs(Subtract(a, b, _), _), Literal(v: Long, LongType))
          if v > 0 && integral(a.dataType) && integral(b.dataType) =>
        split(a, b, v)
      case (Abs(Subtract(a, b, _), _),
            Literal(v: Int, org.apache.spark.sql.types.IntegerType))
          if v > 0 && integral(a.dataType) && integral(b.dataType) =>
        split(a, b, v.toLong)
      case _ => None
    }
    e match {
      case LessThanOrEqual(abs: Abs, lim) => fromAbs(abs, lim)
      case LessThan(abs: Abs, lim) => fromAbs(abs, lim)
      case GreaterThanOrEqual(lim, abs: Abs) => fromAbs(abs, lim)
      case GreaterThan(lim, abs: Abs) => fromAbs(abs, lim)
      case _ => None
    }
  }

  /** True when a conjunct is already a usable equi-join key. */
  private def isEquiKey(
      e: Expression, left: LogicalPlan, right: LogicalPlan): Boolean =
    e match {
      case EqualTo(a, b) =>
        (a.references.subsetOf(left.outputSet) &&
          b.references.subsetOf(right.outputSet)) ||
        (b.references.subsetOf(left.outputSet) &&
          a.references.subsetOf(right.outputSet))
      case _ => false
    }

  private def bin(t: Expression, r: Long): Expression =
    Cast(Floor(Divide(Cast(t, DoubleType), Literal(r.toDouble))), LongType)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val band = conjuncts.iterator
        .map(c => asBand(c, left, right)).collectFirst { case Some(b) => b }
      band match {
        case Some((lt, rt, r))
            if !conjuncts.exists(isEquiKey(_, left, right)) =>
          val binL = AttributeReference("_graft_bin_l", LongType)()
          val binR = AttributeReference("_graft_bin_r", LongType)()
          // left row visits its own bin and both neighbors: a match
          // within r sits at most one bin away
          val expandedLeft = Expand(
            Seq(-1L, 0L, 1L).map(d =>
              left.output :+ Add(bin(lt, r), Literal(d))),
            left.output :+ binL,
            left)
          val projectedRight = Project(
            right.output :+ Alias(bin(rt, r), "_graft_bin_r")(binR.exprId),
            right)
          val newJoin = Join(
            expandedLeft, projectedRight, Inner,
            Some((EqualTo(binL, binR) +: conjuncts).reduce(And)),
            hint)
          Project(j.output, newJoin)
        case _ => j
      }
  }

  private def splitConjunctivePredicates(e: Expression): Seq[Expression] =
    e match {
      case And(a, b) =>
        splitConjunctivePredicates(a) ++ splitConjunctivePredicates(b)
      case other => Seq(other)
    }
}
