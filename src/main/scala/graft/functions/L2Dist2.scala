package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Squared L2 distance over two long-array columns, with whole-stage
  * codegen — the assignment kernel of the dynamic-K IVF cells
  * (ops/IvfAnn.gridCellsOf, behind `dedup_semantic_ivf`).
  *
  * The integer-grid k-means doctrine (IvfAnn.grid6) makes every distance an
  * exact int64 sum so training hash-checks cross-engine; the original
  * long-form formulation paid for that with an n·K·d-ROW join per
  * assignment (the r10 sf1 study measured it slower than the quadratic
  * LSH path it was meant to replace). This kernel keeps the identical
  * integer arithmetic — Σ (a_i − b_i)², left-to-right, exact in long for
  * |a_i|,|b_i| ≤ ~1e6 at any realistic dim — but evaluates it as a tight
  * primitive loop over array columns, so assignment is an n·K-row join
  * with 64 fused ops per row instead of an n·K·d-row shuffle.
  * DuckDB mirror: `list_sum(list_transform(range(1, len(a)+1),
  * i -> (a[i]-b[i])*(a[i]-b[i])))` — same order, same integers.
  *
  * Null semantics mirror [[DotProduct]]: mismatched lengths or a null
  * element return NULL; fixed-width non-null grids never hit either branch.
  * r10 ADVICE caveat: the documented DuckDB mirror diverges on exactly the
  * unreachable branches — `list_sum` over an EMPTY list returns NULL where
  * this kernel returns 0, and the mirror has no length-mismatch guard (it
  * indexes past the shorter list → NULL element → NULL sum, which happens
  * to coincide with the kernel's NULL, but by accident not contract). On
  * the fixed 64-dim embeddings grid neither branch is reachable; reusing
  * the mirror on variable-width frames requires wrapping it as
  * `CASE WHEN len(a) <> len(b) THEN NULL ELSE coalesce(list_sum(...), 0) END`.
  */
case class L2Dist2(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<bigint>, array<bigint>), got (${left.dataType.sql}, ${right.dataType.sql})"
        )
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_l2sq"

  // NULL is reachable regardless of child nullability (length mismatch) —
  // same rationale as DotProduct.nullable.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getLong(i) - y.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev, {
        // freshName everything (janino scope-collision rule, see DotProduct)
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        val d = ctx.freshName("d")
        val i = ctx.freshName("i")
        (a, b) => s"""
          |int $n = $a.numElements();
          |if ($n != $b.numElements()) {
          |  ${ev.isNull} = true;
          |} else {
          |  long $acc = 0L;
          |  for (int $i = 0; $i < $n; $i++) {
          |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
          |    long $d = $a.getLong($i) - $b.getLong($i);
          |    $acc += $d * $d;
          |  }
          |  if (!${ev.isNull}) { ${ev.value} = $acc; }
          |}
        """.stripMargin
      },
    )

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): L2Dist2 =
    copy(left = newLeft, right = newRight)
}
