package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature over a pre-hashed shingle array, with
  * whole-stage codegen: element i of the result is
  * `min over shingles sh of XXH64.hashLong(sh, i)` — the i-th member of a
  * seeded xxhash64 family, the same construction as the column-aggregate
  * formulation (`min(xxhash64(lit(i), sh))` per i) up to seed constants.
  *
  * Why an expression and not the 128-column aggregate: the aggregate path
  * needs the shingles EXPLODED to (doc_id, sh) rows and a groupBy(doc_id)
  * shuffle to reassemble each doc — the signature build is the only
  * consumer of that exchange. Per-row, the whole signature is computable
  * from the doc's own shingle array: this kernel turns the signature stage
  * into a map-side projection (no Generate, no Exchange) and compiles to a
  * two-level primitive loop (|shingles| × nHashes calls of the JIT-friendly
  * static XXH64.hashLong) instead of 128 separate janino-compiled min
  * aggregates. LSH recall depends only on the family being pairwise
  * uniform, not on which seed constants pick it — MinHashLshSpec's recall
  * floor pins that after the swap.
  *
  * Null semantics: null input → null; a null ELEMENT is skipped (the
  * aggregate's `min` ignores nulls the same way); an EMPTY array → null
  * (a doc with no shingles has no signature — the pipeline filters those
  * upstream, same as the aggregate path where such docs simply produce no
  * exploded rows).
  */
case class MinHashSig(child: Expression, nHashes: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got ${t.sql}"
      )
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  // Returns NULL on an empty shingle array regardless of child nullability —
  // the UnaryExpression default (nullable = child.nullable) would make the
  // generated `isNull = true` assignment a non-lvalue over non-nullable
  // inputs (janino CompileException → silent interpreter fallback) and lie
  // to UnsafeProjection. Same rule as DotProduct.
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(nHashes)(Long.MaxValue)
    var i = 0
    var any = false
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val sh = arr.getLong(i)
        var s = 0
        while (s < nHashes) {
          val h = XXH64.hashLong(sh, s.toLong)
          if (h < mins(s)) mins(s) = h
          s += 1
        }
      }
      i += 1
    }
    if (!any) null else new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev, {
        // every local MUST be freshName'd: nullSafeCodeGen splices this block
        // into a scope shared with sibling expressions' generated locals, and
        // a bare `i`/`n` redefines theirs — janino rejects the whole stage and
        // Spark silently falls back to the interpreter (the exact cost this
        // expression exists to remove)
        val n = ctx.freshName("n")
        val mins = ctx.freshName("mins")
        val any = ctx.freshName("any")
        val i = ctx.freshName("i")
        val sh = ctx.freshName("sh")
        val s = ctx.freshName("s")
        val h = ctx.freshName("h")
        a => s"""
          |int $n = $a.numElements();
          |long[] $mins = new long[$nHashes];
          |java.util.Arrays.fill($mins, Long.MAX_VALUE);
          |boolean $any = false;
          |for (int $i = 0; $i < $n; $i++) {
          |  if (!$a.isNullAt($i)) {
          |    $any = true;
          |    long $sh = $a.getLong($i);
          |    for (int $s = 0; $s < $nHashes; $s++) {
          |      long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong($sh, (long) $s);
          |      if ($h < $mins[$s]) $mins[$s] = $h;
          |    }
          |  }
          |}
          |if (!$any) {
          |  ${ev.isNull} = true;
          |} else {
          |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
          |}
        """.stripMargin
      },
    )

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
