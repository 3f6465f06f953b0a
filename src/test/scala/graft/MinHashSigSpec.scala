package graft

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.functions._

/** Bit-equality + law checks for the native MinHash signature kernel
  * (graft.functions.MinHashSig) — the DotProductSpec pattern: the generated
  * code must produce EXACTLY the value a plain-Scala reimplementation of
  * the definition does, per doc, per slot.
  */
class MinHashSigSpec extends SparkSpec {

  test("native signature == plain-Scala min over XXH64.hashLong(sh, seed), per doc per slot") {
    functions.GraftFunctions.register(spark)
    val n = 32
    val arrays = ops.Text
      .shingleHashArrays(Tables.documents(spark, sfDir))
      .withColumn("sig", call_function("graft_minhash_sig", col("shs"), lit(n)))
      .collect()
    assert(arrays.nonEmpty)
    arrays.foreach { r =>
      val shs = r.getSeq[Long](r.fieldIndex("shs"))
      val sig = r.getSeq[Long](r.fieldIndex("sig"))
      assert(sig.length == n)
      (0 until n).foreach { s =>
        val expected = shs.map(sh => XXH64.hashLong(sh, s.toLong)).min
        assert(sig(s) == expected, s"doc ${r.get(0)} slot $s")
      }
    }
  }

  test("null/empty laws: empty array -> null, null input -> null, null elements skipped") {
    functions.GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq[Option[Long]](Some(7L), None, Some(9L)))), // nulls skipped
      (2L, Some(Seq.empty[Option[Long]])), // empty -> null
      (3L, None), // null -> null
    ).toDF("id", "shs")
    val out = df
      .select(col("id"), call_function("graft_minhash_sig", col("shs"), lit(4)).as("sig"))
      .orderBy("id")
      .collect()
    val s1 = out(0).getSeq[Long](1)
    val expected = (0 until 4).map(s => Seq(7L, 9L).map(XXH64.hashLong(_, s.toLong)).min)
    assert(s1 == expected)
    assert(out(1).isNullAt(1))
    assert(out(2).isNullAt(1))
  }

  test("generated code actually compiles: CODEGEN_ONLY mode, no interpreter fallback") {
    // janino failures (e.g. a non-freshName'd local colliding with a sibling
    // expression's) normally degrade to a SILENT interpreter fallback —
    // correct results, hotspot cost back. Forcing the codegen factory turns
    // that into a hard failure here.
    functions.GraftFunctions.register(spark)
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val sigs = ops.MinHashDedup.signaturesNative(Tables.documents(spark, sfDir)).collect()
      assert(sigs.nonEmpty)
      val dot = Tables
        .embeddings(spark, sfDir)
        .select(call_function("graft_dot", col("embedding"), col("embedding")).as("d"))
        .collect()
      assert(dot.nonEmpty)
    } finally spark.conf.unset("spark.sql.codegen.factoryMode")
  }

  test("signaturesNative plans no Exchange and no Generate (map-side only)") {
    val plan = ops.MinHashDedup
      .signaturesNative(Tables.documents(spark, sfDir))
      .queryExecution
      .executedPlan
      .toString
    assert(!plan.contains("Exchange"), s"signature stage shuffles:\n$plan")
    assert(!plan.contains("Generate"), s"signature stage explodes:\n$plan")
  }
}
