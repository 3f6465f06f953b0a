package graft.functions

import org.apache.spark.sql.catalyst.expressions.{
  Add,
  ArrayAggregate,
  Cast,
  Expression,
  LambdaFunction,
  Literal,
  Multiply,
  NamedLambdaVariable,
  ZipWith,
}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the portable HOF dot-product pattern
  *
  *   aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0d, (s, v) -> s + v)
  *
  * into the native codegen [[DotProduct]] — users (and older query code)
  * writing the built-in-only formulation get the compiled kernel
  * automatically. The match is deliberately conservative: float-array
  * inputs, literal 0.0 seed, a pure `acc + v` merge, an identity finish,
  * and a multiply of the two (possibly double-cast) zip variables — any
  * deviation leaves the plan untouched. Both formulations fold
  * left-to-right over doubles, so the rewrite can never change a result
  * (DotProductSpec asserts bit-equality and the rewrite itself).
  *
  * Injected by [[GraftExtensions]] (`injectOptimizerRule`); also usable at
  * runtime via `spark.experimental.extraOptimizations`.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  /** x, possibly wrapped in a cast to double. */
  private def stripDoubleCast(e: Expression): Expression = e match {
    case c: Cast if c.dataType == DoubleType => c.child
    case other                               => other
  }

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case _                       => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          zip @ ZipWith(a, b, LambdaFunction(mul: Multiply, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(add: Add, Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
          LambdaFunction(fin, Seq(res: NamedLambdaVariable), _),
        )
        if isFloatArray(a) && isFloatArray(b) &&
          isVar(stripDoubleCast(mul.left), x) && isVar(stripDoubleCast(mul.right), y) &&
          isVar(add.left, acc) && isVar(add.right, v) &&
          isVar(fin, res) =>
      DotProduct(a, b)
  }
}
