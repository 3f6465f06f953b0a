package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two float-array columns, with whole-stage codegen.
  *
  * Semantics are EXACTLY the HOF formulation used since round 1
  * (`aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0d, +)`):
  * a left-to-right fold of double products in index order — so results are
  * bit-identical to both the HOF plan and DuckDB's sequential
  * `list_dot_product`, and swapping this in cannot move a declared query's
  * hash. What changes is the execution shape: the HOF allocates a zipped
  * intermediate array and evaluates a lambda per element through the
  * interpreted HigherOrderFunction path; this expression compiles to a tight
  * primitive loop inside the generated task code (no per-element closure, no
  * intermediate array, stays inside WholeStageCodegen) — the kernel under
  * every 100 TB similarity scan.
  *
  * Null semantics match the HOF formulation EXACTLY (the optimizer rewrite
  * depends on it): mismatched lengths return NULL (zip_with pads the shorter
  * side with nulls, null-poisoning the sum) and a null element returns NULL.
  * Fixed-width non-null embedding columns never hit either branch.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<float>, array<float>), got (${left.dataType.sql}, ${right.dataType.sql})"
        )
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  // Can return NULL on length mismatch / null element REGARDLESS of child
  // nullability — deriving nullability from children (the BinaryExpression
  // default) both lies to UnsafeProjection (latent wrong-answer if the null
  // bit is elided) and makes the generated `isNull = true` assignment a
  // non-lvalue when inputs are non-nullable (janino CompileException →
  // silent interpreter fallback, losing the kernel speedup).
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev, {
        // freshName everything: the block shares a scope with sibling
        // expressions' locals, and a bare `i`/`n` collides (janino rejects
        // the stage → silent interpreter fallback). Same rule as MinHashSig.
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        val i = ctx.freshName("i")
        (a, b) => s"""
          |int $n = $a.numElements();
          |if ($n != $b.numElements()) {
          |  ${ev.isNull} = true;
          |} else {
          |  double $acc = 0.0;
          |  for (int $i = 0; $i < $n; $i++) {
          |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
          |    $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
          |  }
          |  if (!${ev.isNull}) { ${ev.value} = $acc; }
          |}
        """.stripMargin
      },
    )

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
