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
  * bit-identical buckets on every input, including malformed ones.
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
        if (!dotNull && acc >= 0.0) bucket |= 1L << j
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev, { (vec, tbls) =>
        val ad = classOf[ArrayData].getName
        val gad = classOf[GenericArrayData].getName
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
        s"""
          |int $nv = $vec.numElements();
          |long[] $out = new long[$tbls.numElements()];
          |for (int $t = 0; $t < $out.length; $t++) {
          |  $ad $tbl = $tbls.getArray($t);
          |  long $bucket = 0L;
          |  for (int $j = 0; $j < $tbl.numElements(); $j++) {
          |    $ad $plane = $tbl.getArray($j);
          |    int $n = $plane.numElements();
          |    boolean $dotNull = ($n != $nv);
          |    double $acc = 0.0;
          |    for (int $d = 0; !$dotNull && $d < $n; $d++) {
          |      if ($vec.isNullAt($d) || $plane.isNullAt($d)) { $dotNull = true; break; }
          |      $acc += ((double) $vec.getFloat($d)) * ((double) $plane.getFloat($d));
          |    }
          |    if (!$dotNull && $acc >= 0.0) { $bucket |= (1L << $j); }
          |  }
          |  $out[$t] = $bucket;
          |}
          |${ev.value} = new $gad($out);
        """.stripMargin
      },
    )

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): LshBuckets =
    copy(left = newLeft, right = newRight)
}
