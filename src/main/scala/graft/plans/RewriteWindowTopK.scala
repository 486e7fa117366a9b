package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Alias, And, Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual,
  IntegerLiteral, LessThan, LessThanOrEqual, Literal, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: the ubiquitous per-group top-k idiom
  *
  *   Filter(rn <= k, Window([rn := row_number() OVER (PARTITION BY g ORDER BY o)], g, o, child))
  *
  * becomes the native [[TopKPerGroup]] operator — O(n log k) bounded heaps
  * instead of a full per-partition sort, same single shuffle. Fires only
  * when:
  *   - the Window computes exactly one expression, a row_number (rank and
  *     dense_rank differ under ties and must NOT take this path),
  *   - the partition spec is non-empty (the exec requires clustering),
  *   - the predicate bounds that row_number by an integer literal.
  * Other conjuncts in the filter are preserved on top of the rewrite. The
  * rewritten node reuses the row_number attribute's exprId, so upstream
  * projections resolve unchanged.
  */
object RewriteWindowTopK extends Rule[LogicalPlan] {

  /** rn <= k in any of its spellings → k (the max kept rank). */
  private def boundOf(e: Expression, rn: Attribute): Option[Int] = e match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k - 1)
    case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rn) => Some(k)
    case GreaterThan(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rn) => Some(k - 1)
    case EqualTo(a: Attribute, IntegerLiteral(1)) if a.semanticEquals(rn) => Some(1)
    case EqualTo(IntegerLiteral(1), a: Attribute) if a.semanticEquals(rn) => Some(1)
    case _ => None
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        w @ Window(Seq(a @ Alias(WindowExpression(_: RowNumber, _), _)), part, order, child, _))
        if part.nonEmpty && order.nonEmpty =>
      val rn = a.toAttribute
      val conjuncts = splitConjuncts(cond)
      val bounds = conjuncts.flatMap(c => boundOf(c, rn).map(c -> _))
      if (bounds.isEmpty) f
      else {
        val k = bounds.map(_._2).min
        if (k <= 0) f // degenerate; leave for the normal path
        else {
          val matched = bounds.map(_._1).toSet
          val rest = conjuncts.filterNot(matched)
          val topk = TopKPerGroup(k, part, order, child, rankAttr = rn)
          if (rest.isEmpty) topk else Filter(rest.reduce(And), topk)
        }
      }
  }
}
