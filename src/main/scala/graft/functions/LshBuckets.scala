package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** All sign-LSH bucket keys of a vector in ONE compact kernel:
  * `graft_lsh_buckets(vec, planes)` with planes an
  * array<array<array<float>>> literal (tables × bits × dim) returns
  * array<long> of length |tables|, where
  * bucket(t) = Σ_j (dot(vec, planes[t][j]) >= 0 ? 1L << j : 0).
  *
  * Semantics are exactly the pre-r13 column formulation
  * (`when(graft_dot(vec, plane_tj) >= 0, 1L << j).otherwise(0)` summed per
  * table): each dot is the same left-to-right double fold as [[DotProduct]],
  * and a null-poisoned dot (length mismatch / null element) contributes 0 —
  * bit-identical buckets on every input, including malformed ones. Two edge
  * cases that make that claim literal (r13 ADVICE): a NULL vector yields an
  * all-ZERO bucket array, not a NULL array — the old `when(...).otherwise(0)`
  * column produced bucket 0 per table and the row survived posexplode, so
  * the kernel must too (only a NULL planes literal, which never occurs,
  * nulls the result); and a NaN dot (NaN/Inf elements) SETS the bit, because
  * Spark's nan-safe `>=` orders NaN above every double — the kernel tests
  * `acc >= 0.0 || isNaN(acc)` to mirror it.
  *
  * Why an expression and not 64 dot columns: tables × bits independent
  * kernel calls land in one whole-stage-codegen method (Project and
  * Generate fuse), and the generated `processNext` blows the JVM's 8 KB
  * huge-method bytecode limit — HotSpot then NEVER JIT-compiles the stage
  * and the bucketize map stage runs interpreted (measured at sf1: 213
  * CPU-seconds for 20k vectors — ~160 µs per dot, ~1000× the kernel cost,
  * single-handedly dominating every LSH-path key). This expression is one
  * small triple loop — a few hundred bytes of bytecode — that stays
  * comfortably inside JIT territory no matter how many tables/bits the
  * plan requests, and it also removes the 64-branch analyzed tree the r10
  * typedlit fix was already working around.
  */
case class LshBuckets(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(ArrayType(ArrayType(FloatType, _), _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<float>, array<array<array<float>>>), " +
            s"got (${left.dataType.sql}, ${right.dataType.sql})"
        )
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lsh_buckets"

  // NULL vector → zero buckets (a VALUE), so only a null planes side —
  // which is always a literal in practice — can null the whole result.
  override def nullable: Boolean = right.nullable

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val b = right.eval(input)
    if (b == null) null
    else {
      val tbls = b.asInstanceOf[ArrayData]
      val a = left.eval(input)
      if (a == null) new GenericArrayData(new Array[Long](tbls.numElements()))
      else nullSafeEval(a, b)
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val vec = a.asInstanceOf[ArrayData]
    val tbls = b.asInstanceOf[ArrayData]
    val nv = vec.numElements()
    val out = new Array[Long](tbls.numElements())
    var t = 0
    while (t < out.length) {
      val tbl = tbls.getArray(t)
      var bucket = 0L
      var j = 0
      while (j < tbl.numElements()) {
        val plane = tbl.getArray(j)
        val n = plane.numElements()
        var dotNull = n != nv
        var acc = 0.0
        var d = 0
        while (!dotNull && d < n) {
          if (vec.isNullAt(d) || plane.isNullAt(d)) dotNull = true
          else {
            acc += vec.getFloat(d).toDouble * plane.getFloat(d).toDouble
            d += 1
          }
        }
        // NaN sets the bit: Spark's nan-safe >= orders NaN above 0
        if (!dotNull && (acc >= 0.0 || java.lang.Double.isNaN(acc))) bucket |= 1L << j
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Hand-rolled null plumbing (not nullSafeCodeGen): a NULL vector must
    // produce a zero-filled VALUE, mirroring eval() above.
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val ad = classOf[ArrayData].getName
    val gad = classOf[GenericArrayData].getName
    val vec = leftGen.value
    val tbls = rightGen.value
    val nv = ctx.freshName("nv")
    val out = ctx.freshName("out")
    val t = ctx.freshName("t")
    val tbl = ctx.freshName("tbl")
    val bucket = ctx.freshName("bucket")
    val j = ctx.freshName("j")
    val plane = ctx.freshName("plane")
    val n = ctx.freshName("n")
    val dotNull = ctx.freshName("dotNull")
    val acc = ctx.freshName("acc")
    val d = ctx.freshName("d")
    val kernel =
      s"""
        |long[] $out = new long[$tbls.numElements()];
        |if (!${leftGen.isNull}) {
        |  int $nv = $vec.numElements();
        |  for (int $t = 0; $t < $out.length; $t++) {
        |    $ad $tbl = $tbls.getArray($t);
        |    long $bucket = 0L;
        |    for (int $j = 0; $j < $tbl.numElements(); $j++) {
        |      $ad $plane = $tbl.getArray($j);
        |      int $n = $plane.numElements();
        |      boolean $dotNull = ($n != $nv);
        |      double $acc = 0.0;
        |      for (int $d = 0; !$dotNull && $d < $n; $d++) {
        |        if ($vec.isNullAt($d) || $plane.isNullAt($d)) { $dotNull = true; break; }
        |        $acc += ((double) $vec.getFloat($d)) * ((double) $plane.getFloat($d));
        |      }
        |      if (!$dotNull && ($acc >= 0.0 || Double.isNaN($acc))) { $bucket |= (1L << $j); }
        |    }
        |    $out[$t] = $bucket;
        |  }
        |}
        |${ev.value} = new $gad($out);
      """.stripMargin
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    if (nullable) {
      ev.copy(code =
        code"""
          ${rightGen.code}
          boolean ${ev.isNull} = ${rightGen.isNull};
          $ad ${ev.value} = null;
          if (!${ev.isNull}) {
            ${leftGen.code}
            $kernel
          }
        """)
    } else {
      ev.copy(
        code =
          code"""
            ${rightGen.code}
            ${leftGen.code}
            $ad ${ev.value} = null;
            $kernel
          """,
        isNull = FalseLiteral)
    }
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): LshBuckets =
    copy(left = newLeft, right = newRight)
}
