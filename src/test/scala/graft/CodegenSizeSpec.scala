package graft

import graft.ops.{LshAnn, Vectors}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Regression gate for the JIT huge-method trap (r13 verdict #8).
  *
  * HotSpot never JIT-compiles a method whose bytecode exceeds the
  * -XX:HugeMethodLimit=8000-byte threshold, and Spark's own fallback conf
  * (`spark.sql.codegen.hugeMethodLimit`, default 65535) does NOT catch it —
  * so a whole-stage-codegen'd stage between 8 KB and 64 KB runs as
  * never-compiled interpreted bytecode with no warning anywhere. Measured
  * cost when r13 hit it: 213 CPU-seconds for 1.28M dot products (~1000× the
  * kernel cost), because 64 inlined `graft_dot` calls fused into one
  * Project+Generate method. The fix was the fused [[graft.functions.LshBuckets]]
  * kernel; THIS spec makes the trap class un-shippable: it (a) proves the
  * pathological shape still blows the limit (so the gate is measuring the
  * real thing, not vacuously passing), and (b) asserts every DECLARED plan's
  * generated methods stay under the JIT limit.
  *
  * Method sizes come from `debug.codegenStringSeq`, which generates and
  * janino-compiles each WholeStageCodegen subtree (including inside AQE
  * plans and subqueries) and reports per-class ByteCodeStats — the same
  * numbers the JIT sees.
  */
class CodegenSizeSpec extends SparkSpec {

  private val JitHugeMethodLimit = 8000

  private def maxMethodSize(df: DataFrame): Int = {
    import org.apache.spark.sql.execution.debug._
    val stats = codegenStringSeq(df.queryExecution.executedPlan)
    if (stats.isEmpty) 0 else stats.map(_._3.maxMethodCodeSize).max
  }

  test("the pre-r13 64-kernel Project shape DOES blow the JIT huge-method limit (trap reproducer)") {
    // Reconstruct the exact pathological shape LshBuckets replaced: tables ×
    // bits independent graft_dot trees summed per table, posexploded — all
    // fused by WholeStageCodegen into one generated method.
    graft.functions.GraftFunctions.register(spark)
    val planes = LshAnn.hyperplanes(nTables = 8, bits = 8, dim = 64)
    val planesLit = typedlit(planes.map(_.map(_.map(_.toFloat).toSeq).toSeq).toSeq)
    val bucketCols = planes.indices.map { t =>
      planes(t).indices
        .map { j =>
          when(
            Vectors.nativeDot(
              col("embedding"),
              element_at(element_at(planesLit, t + 1), j + 1),
            ) >= 0,
            lit(1L << j),
          ).otherwise(lit(0L))
        }
        .reduce(_ + _)
    }
    val pathological = Tables
      .embeddings(spark, sfDir)
      .select(col("vec_id"), posexplode(array(bucketCols: _*)).as(Seq("table", "bucket")))
    val sz = maxMethodSize(pathological)
    info(s"synthetic 64-kernel Project max generated method: $sz bytes")
    assert(
      sz > JitHugeMethodLimit,
      s"reproducer no longer exceeds the JIT limit ($sz <= $JitHugeMethodLimit) — " +
        "the gate below would be vacuous; rebuild the pathological shape",
    )
  }

  test("every declared plan keeps generated methods under the JIT huge-method limit") {
    val over = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      val sz =
        try maxMethodSize(fn(spark, sfDir))
        catch { case e: Throwable => fail(s"$name: codegen stats failed: ${e.getMessage}") }
      if (sz > JitHugeMethodLimit) Some(name -> sz) else None
    }
    assert(
      over.isEmpty,
      "declared plans with never-JIT-compilable generated methods (>" +
        s"$JitHugeMethodLimit bytes): " +
        over.map { case (n, s) => s"$n=$s" }.mkString(", "),
    )
  }
}
