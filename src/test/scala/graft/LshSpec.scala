package graft

import graft.ops.{LshAnn, MinHashDedup, Vectors}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The 100 TB scale paths: banded MinHash dedup and sign-bit ANN, validated
  * against their exact counterparts on sf0.001 (SURVEY.md §5.5).
  */
class LshSpec extends SparkSpec {

  test("graft_lsh_buckets kernel: matches the in-memory sign-dot reference on real embeddings") {
    // the r13 fused kernel replaced tables×bits inlined graft_dot trees
    // (JIT huge-method bailout) — pin bucket-for-bucket equality against a
    // from-scratch double-fold reference, covering every (vector, table)
    import graft.ops.LshAnn
    val planes = LshAnn.hyperplanes(nTables = 8, bits = 8, dim = 64) // = defaultPlanes
    val e = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val got = LshAnn
      .bucketize(e.withColumnRenamed("embedding", "v"), "vec_id", "v", planes)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    val vecs = e.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    assert(vecs.nonEmpty)
    var checked = 0
    for ((id, v) <- vecs; t <- planes.indices) {
      var bucket = 0L
      for (j <- planes(t).indices) {
        var acc = 0.0
        var d = 0
        while (d < v.length) { acc += v(d).toDouble * planes(t)(j)(d).toFloat.toDouble; d += 1 }
        if (acc >= 0.0) bucket |= 1L << j
      }
      assert(got((id, t)) == bucket, s"vec $id table $t: got ${got((id, t))} want $bucket")
      checked += 1
    }
    assert(checked == vecs.length * planes.length)
    // null-poisoned dot contributes bit 0 (the pre-r13 when/otherwise law)
    import spark.implicits._
    val short = Seq((0L, Array(1.0f))).toDF("vec_id", "v") // length mismatch vs 64-d planes
    val sb = LshAnn.bucketize(short, "vec_id", "v", planes).collect()
    assert(sb.length == planes.length && sb.forall(_.getLong(2) == 0L))
    // r13 ADVICE edge cases, both mirroring the pre-r13 column formulation:
    // (1) a NULL vector yields bucket 0 in EVERY table — the row must
    // survive bucketize (the old when/otherwise emitted 0, not NULL)
    val nullVec = Seq((1L, Option.empty[Array[Float]])).toDF("vec_id", "v")
    val nb = LshAnn.bucketize(nullVec, "vec_id", "v", planes).collect()
    assert(nb.length == planes.length, s"NULL vector dropped: ${nb.length} rows")
    assert(nb.forall(_.getLong(2) == 0L))
    // (2) a NaN element makes every dot NaN, and Spark's nan-safe >= orders
    // NaN above 0 — so every bit is SET (all-ones bucket per table)
    val nanVec = Seq((2L, Array.fill(64)(Float.NaN))).toDF("vec_id", "v")
    val xb = LshAnn.bucketize(nanVec, "vec_id", "v", planes).collect()
    val allBits = (1L << planes.head.length) - 1
    assert(xb.length == planes.length && xb.forall(_.getLong(2) == allBits),
      s"NaN dot must set bits (nan-safe >=): ${xb.map(_.getLong(2)).mkString(",")}")
  }

  test("MinHash LSH recall >= 0.95 vs exact Jaccard pairs, with a small candidate set") {
    val docs = Tables.documents(spark, sfDir)
    val sh = MinHashDedup.shingleSet(docs)
    val exact = MinHashDedup
      .verifyPairs(
        sh.select(col("doc_id").as("id_a")).distinct()
          .crossJoin(sh.select(col("doc_id").as("id_b")).distinct())
          .filter(col("id_a") < col("id_b")),
        sh,
      )
      // same round-then-filter as nearDupPairs, so the boundary can't diverge
      .filter(round(col("jaccard"), 4) >= 0.8)
      .select("id_a", "id_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(exact.nonEmpty, "test data must contain planted near-dups")

    val cands = MinHashDedup
      .candidatePairs(MinHashDedup.signatures(sh))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val recall = exact.count(cands.contains).toDouble / exact.size
    assert(recall >= 0.95, s"LSH recall $recall < 0.95 (|exact|=${exact.size}, |cands|=${cands.size})")

    val n = docs.count()
    assert(cands.size < n * n / 20, s"candidate set ${cands.size} is not sub-quadratic for n=$n")

    // end-to-end pairs match the exact pipeline at the same threshold (LSH
    // false positives are removed by exact verification; only recall differs)
    val lshPairs = MinHashDedup
      .nearDupPairs(docs)
      .select("id_a", "id_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(lshPairs.subsetOf(exact), "verified LSH pairs must be exact-correct (precision 1)")
    assert(lshPairs.size >= (exact.size * 0.95).toInt)
  }

  test("sign-bit ANN: exact re-rank precision, measurable recall, bounded candidates") {
    val e = Tables.embeddings(spark, sfDir)
    val probes = e.filter(col("vec_id") < 20).select(col("vec_id").as("probe_id"), col("embedding").as("pvec"))
    val corpus = e.select(col("vec_id").as("cand_id"), col("embedding").as("cvec"))

    // brute-force truth: top-10 per probe
    val w = Window.partitionBy(col("probe_id")).orderBy(col("sim").desc, col("cand_id"))
    val truth = corpus
      .crossJoin(probes)
      .filter(col("probe_id") =!= col("cand_id"))
      .withColumn("sim", round(Vectors.dot(col("pvec"), col("cvec")), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select("probe_id", "cand_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet

    val planes = LshAnn.hyperplanes(nTables = 8, bits = 4, dim = 64)
    val ann = LshAnn.annTopK(probes, corpus, 10, planes)
    val annPairs = ann.select("probe_id", "cand_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // every returned neighbor carries its EXACT score (re-ranked) — returned
    // pairs at rank <= 10 that are real top-10 members must dominate
    val recall = truth.count(annPairs.contains).toDouble / truth.size
    // sign-LSH on uniform vectors (nearest cos ~0.4): modest recall by
    // design at these parameters; the assertion pins the mechanism works and
    // regression-guards the parameter choice.
    assert(recall >= 0.25, s"ANN recall $recall collapsed (expected >= 0.25 at 8x4 tables)")

    // candidate work is bounded: per (table,bucket) join, not all-pairs
    val cands = LshAnn
      .bucketize(probes.select(col("probe_id"), col("pvec").as("v")), "probe_id", "v", planes)
      .join(
        LshAnn.bucketize(corpus.select(col("cand_id"), col("cvec").as("v")), "cand_id", "v", planes),
        Seq("table", "bucket"),
      )
      .select("probe_id", "cand_id").distinct().count()
    val allPairs = probes.count() * corpus.count()
    assert(cands < allPairs, s"ANN candidates $cands not smaller than brute force $allPairs")
  }
}
