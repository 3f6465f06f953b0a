package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the retrieval verbs (BM25 + reciprocal-rank
  * fusion) — an independent in-memory recompute of the full scoring math,
  * beyond the driver's hash gate.
  */
class RetrievalSpec extends SparkSpec {

  private def run(key: String) = SparkEntry.queries(key)(spark, sfDir)

  /** Mirror of the declared scoring: per-term round(·, 7) HALF_UP onto the
    * decimal grid, exact decimal sum, final double. Any drift between this
    * and the Spark plan (constants, idf shape, rounding point) fails loud.
    */
  private def bm25InMemory(): Map[Long, Double] = {
    val docs = Tables
      .documents(spark, sfDir)
      .select("doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1))
    val n = docs.length.toLong
    val avgdl = docs.map(_._2.length.toLong).sum.toDouble / n.toDouble
    val terms = ops.Retrieval.QueryTerms.toSet
    val df = docs
      .flatMap { case (_, w) => w.filter(terms).distinct }
      .groupBy(identity)
      .map { case (t, xs) => t -> xs.length.toLong }
    docs.flatMap { case (id, w) =>
      val dl = w.length.toLong
      val tf = w.filter(terms).groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
      if (tf.isEmpty) None
      else {
        val score = tf
          .map { case (t, f) =>
            val idf = math.log(1.0 + ((n - df(t)).toDouble + 0.5) / (df(t).toDouble + 0.5))
            val tfn = f.toDouble * 2.2 /
              (f.toDouble + 1.2 * (0.25 + 0.75 * (dl.toDouble / avgdl)))
            BigDecimal(idf * tfn).setScale(7, BigDecimal.RoundingMode.HALF_UP)
          }
          .sum
        Some(id -> score.toDouble)
      }
    }.toMap
  }

  test("text_bm25_topk: exact match vs in-memory BM25 recompute") {
    val expected = bm25InMemory()
    val top = expected.toSeq.sortBy { case (id, s) => (-s, id) }.take(20)
    val got = run("text_bm25_topk").collect()
    assert(got.length == math.min(20, expected.size))
    got.zip(top).foreach { case (r, (id, s)) =>
      assert(r.getAs[Long]("doc_id") == id, s"rank ${r.getAs[Long]("rnk")} doc")
      assert(r.getAs[Double]("score") == s, s"doc $id score")
    }
    // ranks are the contiguous prefix 1..k and scores are non-increasing
    assert(got.map(_.getAs[Long]("rnk")).toSeq == (1L to got.length).toSeq)
    val scores = got.map(_.getAs[Double]("score")).toSeq
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("retrieval_rrf: fusion arithmetic is exact and both legs contribute") {
    def contrib(r: Long): BigDecimal =
      if (r > 0) BigDecimal(1.0 / (60.0 + r.toDouble)).setScale(7, BigDecimal.RoundingMode.HALF_UP)
      else BigDecimal(0)
    val got = run("retrieval_rrf").collect()
    assert(got.length == 50)
    assert(got.map(_.getAs[Long]("rnk")).toSeq == (1L to 50L).toSeq)
    got.foreach { r =>
      val want = (contrib(r.getAs[Long]("bm25_rank")) + contrib(r.getAs[Long]("cos_rank"))).toDouble
      assert(r.getAs[Double]("rrf") == want, s"doc ${r.getAs[Long]("doc_id")} rrf")
    }
    // rrf is non-increasing in rank, and a doc present in BOTH top lists at
    // rank 1 would dominate — at minimum the fused list must draw from both
    // retrievers (they rank by different signals)
    val rrfs = got.map(_.getAs[Double]("rrf")).toSeq
    assert(rrfs.zip(rrfs.tail).forall { case (a, b) => a >= b })
    assert(got.exists(_.getAs[Long]("bm25_rank") > 0), "lexical leg absent from fusion")
    assert(got.exists(_.getAs[Long]("cos_rank") > 0), "vector leg absent from fusion")
    // ranks within each leg are distinct and ≤ K
    val bm = got.map(_.getAs[Long]("bm25_rank")).filter(_ > 0)
    assert(bm.distinct.length == bm.length && bm.forall(_ <= 100))
    val cr = got.map(_.getAs[Long]("cos_rank")).filter(_ > 0)
    assert(cr.distinct.length == cr.length && cr.forall(_ <= 100))
  }
}
