package graft

import org.apache.spark.sql.functions._

/** Laws of the PQ family (ops/PqAnn): structural invariants of the
  * encoded corpus and the semantic quality of ADC retrieval against the
  * exact brute-force truth. Cross-engine agreement is the driver oracle's
  * job; these pin what the oracle cannot — that the compressed index
  * actually RETRIEVES well.
  */
class PqSpec extends SparkSpec {

  test("embed_pq_codes: every vector gets one code per subspace, codes within the codebook") {
    val codes = SparkEntry.queries("embed_pq_codes")(spark, sfDir)
    val n = Tables.embeddings(spark, sfDir).count()
    assert(codes.count() == n * 8, "exactly NSub codes per vector")
    assert(codes.filter(col("code") < 0 || col("code") >= 16).count() == 0)
    assert(codes.filter(col("sub") < 0 || col("sub") >= 8).count() == 0)
    assert(
      codes.groupBy("vec_id", "sub").count().filter(col("count") =!= 1).count() == 0,
      "one code per (vector, subspace)",
    )
    // the compression claim: the whole corpus re-expresses over <= 128
    // (sub, code) symbols — 4 bytes/vector at 4 bits/code
    assert(codes.select("sub", "code").distinct().count() <= 128L)
  }

  test("sim_ann_pq: recall@10 vs exact brute force holds the floor; exact scores") {
    val pq = SparkEntry.queries("sim_ann_pq")(spark, sfDir).collect()
    val exact = SparkEntry.queries("sim_topk_cosine")(spark, sfDir).collect()
    def toSets(rows: Array[org.apache.spark.sql.Row]) =
      rows
        .groupBy(_.getLong(0))
        .view
        .mapValues(_.map(r => r.getLong(1)).toSet)
        .toMap
    val pqTop = toSets(pq)
    val exTop = toSets(exact)
    val recalls = exTop.toSeq.map { case (p, truth) =>
      pqTop.getOrElse(p, Set.empty).count(truth).toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    info(s"PQ recall@10 over ${recalls.size} probes: mean = $mean, min = ${recalls.min}")
    // measured at sf0.001 (n=500): mean 0.816 with the 100-deep ADC
    // shortlist (0.64 at 50 — the knob trades re-rank work for recall,
    // constant per probe either way); returned SCORES are exact re-ranks
    // regardless of membership
    assert(mean >= 0.75, s"mean PQ recall@10 $mean below floor")
    assert(recalls.min >= 0.3, s"worst-probe recall ${recalls.min} collapsed")
    // scores exactness: every returned (probe, cand) sim equals the exact
    // rounded dot (sim_topk_cosine emits the same rounding) where the
    // pair appears in both
    val exSim = exact.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    pq.foreach { r =>
      exSim.get((r.getLong(0), r.getLong(1))).foreach { s =>
        assert(r.getDouble(2) == s, s"PQ re-rank sim diverged for ${(r.getLong(0), r.getLong(1))}")
      }
    }
  }
}
