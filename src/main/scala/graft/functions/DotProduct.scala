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
  * Mismatched lengths fold over the common prefix (zip_with would pad with
  * nulls and null-poison the sum; corpus vectors are fixed-width so the case
  * is degenerate — the choice only affects malformed input).
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

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => s"""
        |int n = Math.min($a.numElements(), $b.numElements());
        |double acc = 0.0;
        |for (int i = 0; i < n; i++) {
        |  acc += ((double) $a.getFloat(i)) * ((double) $b.getFloat(i));
        |}
        |${ev.value} = acc;
      """.stripMargin,
    )

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
