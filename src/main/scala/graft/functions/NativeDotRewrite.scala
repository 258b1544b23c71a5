package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Cast, Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the interpreted higher-order dot-product idiom
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
  *               CAST(0 AS DOUBLE), (acc, v) -> acc + v) }}}
  *
  * into the whole-stage-codegen [[DotProductF32]] when both inputs are
  * `array<float>`. Users writing the portable HOF formulation silently get
  * the fused native loop — same left-to-right double accumulation, same
  * result bit-for-bit.
  *
  * Caveat (documented, matches this engine's data contracts): on arrays of
  * UNEQUAL length the HOF yields NULL (zip_with pads with nulls) while the
  * native loop dots the common prefix. Embedding columns are fixed-width,
  * so the cases never diverge here; a general-purpose version would guard
  * on equal `size()`.
  *
  * Injected via [[GraftExtensions]] (`injectOptimizerRule`) and
  * `spark.experimental.extraOptimizations` in [[GraftFunctions.register]].
  */
object NativeDotRewrite extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def isIdentity(lf: LambdaFunction): Boolean = lf match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(arg), _) => v.exprId == arg.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(l, r,
            LambdaFunction(Multiply(
              Cast(x: NamedLambdaVariable, DoubleType, _, _),
              Cast(y: NamedLambdaVariable, DoubleType, _, _), _), Seq(a1, a2), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(Add(acc: NamedLambdaVariable, v: NamedLambdaVariable, _),
            Seq(m1, m2), _),
          finish: LambdaFunction)
        if isFloatArray(l) && isFloatArray(r) &&
          x.exprId == a1.exprId && y.exprId == a2.exprId &&
          acc.exprId == m1.exprId && v.exprId == m2.exprId &&
          isIdentity(finish) =>
      DotProductF32(l, r)
  }
}
