package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Add, Alias, And, ArrayDistinct, AttributeReference, Cast, CreateArray,
  Divide, EqualTo, Explode, Expression, Floor, GreaterThanOrEqual, LessThanOrEqual,
  Literal, Subtract}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Optimizer rule: a pure band (interval) join
  *
  *   L ⋈ R ON l >= r - c1 AND l <= r + c2        (no equi conjunct)
  *
  * can only plan as a (broadcast-)nested-loop — O(|L|·|R|), and simply
  * impossible at 100 TB once neither side fits a broadcast. With bin width
  * W = c1 + c2, `floor(l / W)` hits at most the two consecutive bins
  * spanned by `[r − c1, r + c2]` (an interval of length exactly W), so the
  * band becomes an EQUI join on the bin key — hash-partitionable,
  * O(|L| + |R| + matches) — with the original band predicate kept as the
  * exact residual filter. This is the same rewrite the declared
  * `join_binned_band_acctbal` query performs by hand; the rule applies it
  * automatically to any qualifying join.
  *
  * Fires only when `spark.graft.bandJoin.rewrite` is true (default off so
  * the declared theta-join query keeps demonstrating the nested-loop
  * surface), the join is INNER with both band bounds present over one
  * numeric (probe, build) attribute pair, and no equality conjunct already
  * links the sides (that both guards the genuinely-theta case and makes
  * the rule idempotent — its own output contains a bin equality).
  */
object RewriteBandJoin extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.bandJoin.rewrite"

  private def litDouble(e: Expression): Option[Double] = e match {
    case l @ Literal(_, _: NumericType) => l.eval() match {
      case n: Number => Some(n.doubleValue())
      case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
      case _ => None
    }
    case _ => None
  }

  /** x >= y − c in its spellings → (x, y, c). */
  private def lowerBound(e: Expression): Option[(Expression, Expression, Double)] = e match {
    case GreaterThanOrEqual(x, Subtract(y, c, _)) => litDouble(c).map(v => (x, y, v))
    case LessThanOrEqual(Subtract(y, c, _), x) => litDouble(c).map(v => (x, y, v))
    case _ => None
  }

  /** x <= y + c in its spellings → (x, y, c). */
  private def upperBound(e: Expression): Option[(Expression, Expression, Double)] = e match {
    case LessThanOrEqual(x, Add(y, c, _)) => litDouble(c).map(v => (x, y, v))
    case GreaterThanOrEqual(Add(y, c, _), x) => litDouble(c).map(v => (x, y, v))
    case _ => None
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(ConfKey, "false").toBoolean) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) if j.resolved =>
        val conjuncts = splitConjuncts(cond)
        val spansSides = (e: Expression) =>
          e.references.intersect(left.outputSet).nonEmpty &&
            e.references.intersect(right.outputSet).nonEmpty
        val hasEqui = conjuncts.exists {
          case eq: EqualTo => spansSides(eq)
          case _ => false
        }
        val lowers = conjuncts.flatMap(lowerBound)
        val uppers = conjuncts.flatMap(upperBound)
        // one (probe, build) pair carrying both bounds, numeric on both ends
        val band = (for {
          (xl, yl, c1) <- lowers
          (xu, yu, c2) <- uppers
          if xl.semanticEquals(xu) && yl.semanticEquals(yu) && c1 + c2 > 0
          if xl.dataType.isInstanceOf[NumericType] && yl.dataType.isInstanceOf[NumericType]
        } yield (xl, yl, c1, c2)).headOption
        if (hasEqui || band.isEmpty) j
        else {
          val (x, y, c1, c2) = band.get
          val oriented =
            if (x.references.subsetOf(left.outputSet) &&
              y.references.subsetOf(right.outputSet)) Some(false)
            else if (x.references.subsetOf(right.outputSet) &&
              y.references.subsetOf(left.outputSet)) Some(true)
            else None
          oriented match {
            case None => j
            case Some(swapped) =>
              val (probeSide, buildSide) = if (swapped) (right, left) else (left, right)
              val w = Literal(c1 + c2, DoubleType)
              def dbl(e: Expression) = Cast(e, DoubleType)
              val probeBin = Alias(Floor(Divide(dbl(x), w)), "graft_band_bin")()
              val newProbe = Project(probeSide.output :+ probeBin, probeSide)
              val bins = ArrayDistinct(CreateArray(Seq(
                Floor(Divide(Subtract(dbl(y), Literal(c1, DoubleType)), w)),
                Floor(Divide(Add(dbl(y), Literal(c2, DoubleType)), w)))))
              val buildBin = AttributeReference("graft_band_bin_r", LongType)()
              val newBuild = Generate(Explode(bins), unrequiredChildIndex = Nil,
                outer = false, qualifier = None, generatorOutput = Seq(buildBin),
                child = buildSide)
              val (newLeft, newRight) =
                if (swapped) (newBuild, newProbe) else (newProbe, newBuild)
              val binEq = EqualTo(probeBin.toAttribute, buildBin)
              val rewritten = Join(newLeft, newRight, Inner,
                Some(And(binEq, cond)), hint)
              // strip the bin columns; original output attrs pass through
              Project(j.output, rewritten)
          }
        }
    }
  }
}
