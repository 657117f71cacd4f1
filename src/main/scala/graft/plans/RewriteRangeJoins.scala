package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Catalyst optimizer rule: rewrite a pure-inequality time-range join into
  * the bin-bucketed equi-join of [[graft.operators.TemporalJoin]] —
  * automatically, where Spark would otherwise plan a nested loop.
  *
  * Pattern: an Inner/Cross join whose condition bounds the difference of
  * two LONG columns from opposite sides both ways,
  *
  *   lo ≤ r.ts − l.ts < hi     (any mix of >/>=/</<= and
  *                              `r.ts cmp l.ts ± c` / `r.ts − l.ts cmp c`)
  *
  * and carries NO cross-side equality conjunct (with one, Spark already
  * has a shuffle key and plans a hash/merge join; without one it falls
  * back to BroadcastNestedLoopJoin — |L|·|R| comparisons). The rewrite
  * adds the missing equi key: left rows explode to the ≤2 time bins of
  * width W = hi−lo their window spans, right rows compute their single
  * bin, and the join gains `l_bin = r_bin` while keeping the original
  * range conjuncts as the exact filter. Each matching pair meets in
  * exactly one bin (the right row's), so no duplicates are introduced;
  * null timestamps never satisfy the range predicate, so dropping them at
  * the explode (sequence(null,…) → no row) is semantics-preserving for
  * inner joins. Outer joins are NOT rewritten (the bin fan-out would
  * duplicate null-padded rows).
  *
  * The rewritten join contains a cross-side equality (the bins), which is
  * also the guard that keeps the rule from re-firing on its own output.
  */
object RewriteRangeJoins extends Rule[LogicalPlan] with PredicateHelper {

  /** One side of a comparison as a linear form: ±attr ± attr + const.
    * Coefficients are ±1 only — enough for every `a`, `a ± c`, `a − b`
    * shape the pattern needs.
    */
  private def linear(e: Expression): Option[(Map[Attribute, Long], Long)] = e match {
    case a: AttributeReference if a.dataType == LongType => Some(Map(a -> 1L), 0L)
    case Literal(c: Long, LongType) => Some(Map.empty[Attribute, Long], c)
    case Add(x, y, _) => for {
      (mx, cx) <- linear(x); (my, cy) <- linear(y)
      m <- combine(mx, my, 1L)
    } yield (m, cx + cy)
    case Subtract(x, y, _) => for {
      (mx, cx) <- linear(x); (my, cy) <- linear(y)
      m <- combine(mx, my, -1L)
    } yield (m, cx - cy)
    case _ => None
  }

  private def combine(a: Map[Attribute, Long], b: Map[Attribute, Long], sign: Long): Option[Map[Attribute, Long]] = {
    val m = b.foldLeft(a) { case (acc, (k, v)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + sign * v)
    }.filter(_._2 != 0L)
    if (m.values.forall(v => v == 1L || v == -1L)) Some(m) else None
  }

  /** A conjunct as a one-sided bound on (rAttr − lAttr): lower (inclusive)
    * or upper (exclusive). */
  private case class Bound(l: Attribute, r: Attribute, isLower: Boolean, value: Long)

  private def bound(conjunct: Expression, leftOut: AttributeSet, rightOut: AttributeSet): Option[Bound] = {
    def diff(x: Expression, y: Expression): Option[(Attribute, Attribute, Long)] = for {
      (mx, cx) <- linear(x); (my, cy) <- linear(y)
      m <- combine(mx, my, -1L) // x − y
      if m.size == 2
      rAttr <- m.find { case (a, s) => s == 1L && rightOut.contains(a) }.map(_._1)
      lAttr <- m.find { case (a, s) => s == -1L && leftOut.contains(a) }.map(_._1)
    } yield (lAttr, rAttr, cy - cx) // x − y cmp 0  ⇔  (r − l) cmp (cy − cx)

    conjunct match {
      case GreaterThanOrEqual(x, y) =>
        diff(x, y).map { case (l, r, c) => Bound(l, r, isLower = true, c) }
          .orElse(diff(y, x).map { case (l, r, c) => Bound(l, r, isLower = false, c + 1) })
      case GreaterThan(x, y) =>
        diff(x, y).map { case (l, r, c) => Bound(l, r, isLower = true, c + 1) }
          .orElse(diff(y, x).map { case (l, r, c) => Bound(l, r, isLower = false, c) })
      case LessThanOrEqual(x, y) =>
        diff(x, y).map { case (l, r, c) => Bound(l, r, isLower = false, c + 1) }
          .orElse(diff(y, x).map { case (l, r, c) => Bound(l, r, isLower = true, c) })
      case LessThan(x, y) =>
        diff(x, y).map { case (l, r, c) => Bound(l, r, isLower = false, c) }
          .orElse(diff(y, x).map { case (l, r, c) => Bound(l, r, isLower = true, c + 1) })
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner | Cross, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val crossEquality = conjuncts.exists {
        case EqualTo(a: AttributeReference, b: AttributeReference) =>
          (left.outputSet.contains(a) && right.outputSet.contains(b)) ||
            (left.outputSet.contains(b) && right.outputSet.contains(a))
        case _ => false
      }
      val bounds = conjuncts.flatMap(bound(_, left.outputSet, right.outputSet))
      val window = bounds.groupBy(b => (b.l, b.r)).collectFirst {
        case ((lTs, rTs), bs)
            if bs.exists(_.isLower) && bs.exists(!_.isLower) =>
          val lo = bs.filter(_.isLower).map(_.value).max
          val hi = bs.filterNot(_.isLower).map(_.value).min
          (lTs, rTs, lo, hi)
      }
      window match {
        // hi − lo must be a valid positive LONG: a pathological window wider
        // than Long.MaxValue would wrap, and the rule must never turn a
        // (slow but working) nested loop into a crash
        case Some((lTs, rTs, lo, hi))
            if !crossEquality && hi > lo && hi - lo > 0 =>
          val w = Literal(hi - lo, LongType)
          def floorDiv(e: Expression): Expression =
            IntegralDivide(Subtract(e, Pmod(e, w)), w)
          val binAttr = AttributeReference("_graft_bin_l", LongType, nullable = false)()
          // Sequence is TimeZoneAwareExpression: without an explicit zone it
          // reports unresolved inside an optimizer rule even on LONGs
          val gen = Generate(
            Explode(new Sequence(
              floorDiv(Add(lTs, Literal(lo, LongType))),
              floorDiv(Add(lTs, Literal(hi - 1, LongType))),
              Some(Literal(1L, LongType))).withTimeZone(conf.sessionLocalTimeZone)),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(binAttr), child = left)
          val rBinAlias = Alias(floorDiv(rTs), "_graft_bin_r")()
          val proj = Project(right.output :+ rBinAlias, right)
          val newCond = (conjuncts :+ EqualTo(binAttr, rBinAlias.toAttribute))
            .reduce(And)
          Project(j.output, Join(gen, proj, Inner, Some(newCond), hint))
        case _ => j
      }
  }
}
