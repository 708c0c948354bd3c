package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  ArrayIntersect, Coalesce, Literal, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType, StringType}

import graft.functions.ArrayIntersectSize

/** Optimizer rule: `size(array_intersect(a, b))` → the fused
  * [[ArrayIntersectSize]] kernel — so a user writing PLAIN Spark gets
  * the engine's verify-path performance automatically (the
  * `array_intersect` form materializes the intersection array just to
  * count it; the kernel hashes the smaller side and counts membership,
  * measured ~2× on verify-shaped pairs). The deepest extension tier the
  * TVFs don't exercise: a `Rule[LogicalPlan]` registered through
  * `SparkSessionExtensions.injectOptimizerRule`.
  *
  * Semantics-preserving by construction, so the rewrite is gated:
  *   - both sides must be `array<string>` or both `array<long>` with
  *     `containsNull = false` — `array_intersect` KEEPS a null element
  *     present on both sides while the kernel ignores nulls, so
  *     nullable-element arrays are left untouched (tokenizer outputs
  *     are containsNull = false, where the verify path lives);
  *   - a NULL array input: the kernel is null-intolerant (returns
  *     null), matching `size`'s non-legacy behavior; under
  *     `spark.sql.legacy.sizeOfNull` the original returns −1, so the
  *     rewrite wraps in `coalesce(…, −1)` exactly when the plan's Size
  *     node carries the legacy flag.
  */
object IntersectSizeRewrite extends Rule[LogicalPlan] {

  private def fusable(t: org.apache.spark.sql.types.DataType): Boolean = t match {
    case ArrayType(StringType, false) => true
    case ArrayType(LongType, false)   => true
    case _                            => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Size(ArrayIntersect(a, b), legacySizeOfNull)
        if a.resolved && b.resolved &&
          fusable(a.dataType) && fusable(b.dataType) &&
          a.dataType == b.dataType =>
      val fused = ArrayIntersectSize(a, b)
      if (legacySizeOfNull) Coalesce(Seq(fused, Literal(-1))) else fused
  }
}
