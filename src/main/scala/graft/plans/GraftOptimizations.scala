package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.functions.VecL2Sq

/** Strength reduction for vector range predicates: a filter written as
  * `sqrt(vec_l2sq(a, b)) <= r` (the natural "L2 distance within r"
  * phrasing, e.g. [[graft.Queries.knnRange]]'s shape) evaluates a sqrt
  * per ROW; this rule rewrites it to a comparison on the squared
  * distance, which also keeps the filter a pure multiply-add loop
  * inside whole-stage codegen.
  *
  * The naive rewrite `x <= r*r` is WRONG at representable boundaries —
  * `r*r` rounds, so a value x with `sqrt(x)` rounding down to exactly r
  * can satisfy one form and not the other. Instead the rule computes
  * (once, at optimization time) the exact threshold
  *
  *   maxSqLe(r) = the largest double y with sqrt(y) <= r
  *
  * by local ulp search around r·r. Because IEEE sqrt is correctly
  * rounded (hence monotone), `sqrt(x) <= r  ⇔  x <= maxSqLe(r)` holds
  * for EVERY non-negative double x — the rewrite is exactly
  * output-preserving, not approximately (OptimizerSpec proves the
  * boundary cases where the naive form flips). Applies only to
  * [[VecL2Sq]] children (provably ≥ 0, so the negative-operand caveat
  * of the equivalence cannot arise) with foldable double thresholds.
  */
object VecRangeStrengthReduction extends Rule[LogicalPlan] {

  /** Largest double y with sqrt(y) <= r (r >= 0, finite). */
  private[graft] def maxSqLe(r: Double): Double = {
    var y = r * r
    while (y > 0 && math.sqrt(y) > r) y = math.nextDown(y)
    while (!math.sqrt(math.nextUp(y)).isNaN && math.sqrt(math.nextUp(y)) <= r &&
      !y.isInfinity) y = math.nextUp(y)
    y
  }

  /** Largest double y with sqrt(y) < r (r > 0, finite). */
  private[graft] def maxSqLt(r: Double): Double = {
    var y = r * r
    while (y > 0 && math.sqrt(y) >= r) y = math.nextDown(y)
    while (!math.sqrt(math.nextUp(y)).isNaN && math.sqrt(math.nextUp(y)) < r &&
      !y.isInfinity) y = math.nextUp(y)
    y
  }

  private def lit(d: Double): Literal = Literal(d, DoubleType)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // sqrt(x) <= r  ⇔  x <= maxSqLe(r)     (x = vec_l2sq ≥ 0)
    case LessThanOrEqual(Sqrt(x: VecL2Sq), Literal(r: Double, DoubleType))
        if r >= 0 && !r.isInfinity =>
      LessThanOrEqual(x, lit(maxSqLe(r)))
    // sqrt(x) < r   ⇔  x <= maxSqLt(r)
    case LessThan(Sqrt(x: VecL2Sq), Literal(r: Double, DoubleType))
        if r > 0 && !r.isInfinity =>
      LessThanOrEqual(x, lit(maxSqLt(r)))
    // sqrt(x) > r   ⇔  NOT(sqrt(x) <= r)  ⇔  x > maxSqLe(r)
    case GreaterThan(Sqrt(x: VecL2Sq), Literal(r: Double, DoubleType))
        if r >= 0 && !r.isInfinity =>
      GreaterThan(x, lit(maxSqLe(r)))
    // sqrt(x) >= r  ⇔  x > maxSqLt(r)
    case GreaterThanOrEqual(Sqrt(x: VecL2Sq), Literal(r: Double, DoubleType))
        if r > 0 && !r.isInfinity =>
      GreaterThan(x, lit(maxSqLt(r)))
    // mirrored literal-first forms
    case GreaterThanOrEqual(Literal(r: Double, DoubleType), Sqrt(x: VecL2Sq))
        if r >= 0 && !r.isInfinity =>
      LessThanOrEqual(x, lit(maxSqLe(r)))
    case GreaterThan(Literal(r: Double, DoubleType), Sqrt(x: VecL2Sq))
        if r > 0 && !r.isInfinity =>
      LessThanOrEqual(x, lit(maxSqLt(r)))
    case LessThanOrEqual(Literal(r: Double, DoubleType), Sqrt(x: VecL2Sq))
        if r > 0 && !r.isInfinity =>
      GreaterThan(x, lit(maxSqLt(r)))
    case LessThan(Literal(r: Double, DoubleType), Sqrt(x: VecL2Sq))
        if r >= 0 && !r.isInfinity =>
      GreaterThan(x, lit(maxSqLe(r)))
  }
}
