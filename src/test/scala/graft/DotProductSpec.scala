package graft

import graft.functions.{DotProduct, GraftFunctions}
import graft.ops.Vectors
import org.apache.spark.sql.functions._

/** The native codegen dot product must be a drop-in for the HOF fold:
  * bit-identical values (same left-to-right double accumulation), null
  * behavior, and SQL-callable registration via both paths.
  */
class DotProductSpec extends SparkSpec {
  import spark.implicits._

  test("native dot is bit-identical to the HOF fold on real embeddings") {
    GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, sfDir)
    val pairs = e
      .select(col("vec_id").as("id_a"), col("embedding").as("va"))
      .crossJoin(e.select(col("vec_id").as("id_b"), col("embedding").as("vb")))
      .filter(col("id_a") < 40 && col("id_b") < 40)
    val diff = pairs
      .withColumn("hof", Vectors.dot(col("va"), col("vb")))
      .withColumn("native", Vectors.nativeDot(col("va"), col("vb")))
      .filter(col("hof") =!= col("native"))
      .count()
    assert(diff == 0, "native and HOF dot diverged — fold order changed")
  }

  test("registered in SQL, null-safe, self-dot of normalized vector is ~1") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(CAST(array(1.0, 2.0) AS ARRAY<FLOAT>), CAST(array(3.0, 4.0) AS ARRAY<FLOAT>)) AS d, " +
        "graft_dot(CAST(NULL AS ARRAY<FLOAT>), CAST(array(1.0) AS ARRAY<FLOAT>)) AS n"
    ).collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(r.isNullAt(1))
    val selfDot = Tables
      .embeddings(spark, sfDir)
      .select(Vectors.nativeDot(col("embedding"), col("embedding")).as("d"))
      .agg(min("d"), max("d"))
      .collect()(0)
    assert(math.abs(selfDot.getDouble(0) - 1.0) < 1e-3 && math.abs(selfDot.getDouble(1) - 1.0) < 1e-3)
  }

  test("expression supports codegen (does not fall back to interpreted-only)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val la = Literal.create(Array(1.0f, 2.0f), ArrayType(FloatType))
    val lb = Literal.create(Array(3.0f, 4.0f), ArrayType(FloatType))
    val expr = DotProduct(la, lb)
    // CodegenFallback expressions break whole-stage fusion; DotProduct must not be one
    assert(!expr.isInstanceOf[org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback])
    // and interpreted eval must produce the fold value
    assert(expr.eval(null) == 11.0)
  }

  test("generated code compiles over NON-nullable inputs (nullable must not derive from children)") {
    // Both kernels can return NULL regardless of child nullability (length
    // mismatch / empty array). Pre-fix they inherited nullable=false from
    // non-nullable children, so codegen emitted `false = true;` — janino
    // CompileException → silent interpreter fallback (observed 4× in the r4
    // test log via KnnSpec's non-nullable array frames). GenerateUnsafeProjection
    // compiles directly with NO fallback path, so a regression throws here.
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType, LongType}
    val fat = ArrayType(FloatType, containsNull = false)
    val dot = DotProduct(
      BoundReference(0, fat, nullable = false),
      BoundReference(1, fat, nullable = false),
    )
    assert(dot.nullable, "DotProduct can return NULL; nullable must be true")
    val dotProj = GenerateUnsafeProjection.generate(Seq(dot))
    val row = InternalRow(
      ArrayData.toArrayData(Array(1.0f, 2.0f)),
      ArrayData.toArrayData(Array(3.0f, 4.0f)),
    )
    assert(dotProj(row).getDouble(0) == 11.0)

    import graft.functions.MinHashSig
    val lat = ArrayType(LongType, containsNull = false)
    val sig = MinHashSig(BoundReference(0, lat, nullable = false), 4)
    assert(sig.nullable, "MinHashSig can return NULL (empty array); nullable must be true")
    val sigProj = GenerateUnsafeProjection.generate(Seq(sig))
    val sigRow = InternalRow(ArrayData.toArrayData(Array(7L, 9L)))
    assert(sigProj(sigRow).getArray(0).numElements() == 4)
  }

  test("null semantics match the HOF fold: length mismatch and null elements give NULL") {
    GraftFunctions.register(spark)
    val df = Seq(
      (1L, Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)),          // clean -> 11.0
      (2L, Seq(1.0f, 2.0f), Seq(3.0f)),                // length mismatch -> NULL
    ).toDF("id", "a", "b")
      .union(
        Seq((3L, Seq[java.lang.Float](1.0f, null), Seq[java.lang.Float](3.0f, 4.0f)))
          .toDF("id", "a", "b") // null element -> NULL
      )
    val out = df
      .withColumn("hof", Vectors.dot(col("a"), col("b")))
      .withColumn("native", Vectors.nativeDot(col("a"), col("b")))
      .orderBy("id")
      .collect()
    out.foreach { r =>
      assert(r.isNullAt(3) == r.isNullAt(4), s"row ${r.getLong(0)}: HOF/native nullness diverged")
      if (!r.isNullAt(3)) assert(r.getDouble(3) == r.getDouble(4))
    }
    assert(!out(0).isNullAt(4) && out(1).isNullAt(4) && out(2).isNullAt(4))
  }

  test("optimizer rule rewrites the HOF pattern to the native expression") {
    import graft.functions.DotProductRewrite
    spark.experimental.extraOptimizations = Seq(DotProductRewrite)
    try {
      val e = Tables.embeddings(spark, sfDir).limit(50)
      val hofPlan = e
        .select(Vectors.dot(col("embedding"), col("embedding")).as("d"))
      val optimized = hofPlan.queryExecution.optimizedPlan.toString
      assert(optimized.contains("graft_dot"), s"rewrite did not fire:\n$optimized")
      assert(!optimized.contains("aggregate("), s"HOF survived the rewrite:\n$optimized")
      // and the rewritten plan computes the same values as the un-rewritten one
      val rewritten = hofPlan.collect().map(_.getDouble(0))
      spark.experimental.extraOptimizations = Nil
      val plain = e.select(Vectors.dot(col("embedding"), col("embedding")).as("d"))
        .collect().map(_.getDouble(0))
      assert(rewritten.sameElements(plain))
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("rule leaves non-matching aggregates untouched") {
    import graft.functions.DotProductRewrite
    spark.experimental.extraOptimizations = Seq(DotProductRewrite)
    try {
      // a sum-of-squares fold (multiply of the SAME variable) must NOT match
      val df = Tables.embeddings(spark, sfDir).limit(5)
        .select(aggregate(
          zip_with(col("embedding"), col("embedding"), (x, _) => x.cast("double") * x.cast("double")),
          lit(0.0),
          (acc, v) => acc + v,
        ).as("sumsq"))
      assert(!df.queryExecution.optimizedPlan.toString.contains("graft_dot"))
      assert(df.collect().forall(_.getDouble(0) >= 0.0))
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("SparkSessionExtensions injection path builds the same expression") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val (_, _, builder) = GraftFunctions.functions.head
    val e = builder(Seq(
      Literal.create(Array(1.0f), ArrayType(FloatType)),
      Literal.create(Array(2.0f), ArrayType(FloatType)),
    ))
    assert(e.isInstanceOf[DotProduct])
  }
}
