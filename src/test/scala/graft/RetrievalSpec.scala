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

  // ------------------------------------------------------------------
  // retrieval_mmr laws (r12)
  // ------------------------------------------------------------------

  /** In-memory greedy MMR over the same 1e-6 integer sim grid — the
    * reference the declared unrolled-relational selection must match
    * EXACTLY (integer arithmetic end to end, so no tolerance).
    */
  private def mmrInMemory(): Map[(Long, Long), (Long, Double)] = {
    val vecs = Tables
      .embeddings(spark, sfDir)
      .select("vec_id", "embedding")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    def sim6(a: Array[Float], b: Array[Float]): Long =
      BigDecimal(dot(a, b) * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val out = scala.collection.mutable.Map.empty[(Long, Long), (Long, Double)]
    for (p <- vecs.keys.toSeq.sorted if p < 100) {
      val pool = vecs.keys.toSeq
        .filter(_ != p)
        .map(c => c -> sim6(vecs(p), vecs(c)))
        .sortBy { case (c, s6) => (-s6, c) }
        .take(ops.Retrieval.MmrN)
      val selected = scala.collection.mutable.ArrayBuffer.empty[Long]
      for (r <- 1 to ops.Retrieval.MmrK) {
        val scored = pool
          .filter(c => !selected.contains(c._1))
          .map { case (c, s6) =>
            val mx = if (selected.isEmpty) 0L
            else selected.map(s => sim6(vecs(c), vecs(s))).max
            (c, 7 * s6 - (if (selected.isEmpty) 0L else 3 * mx))
          }
        val (pick, score10) = scored.minBy { case (c, sc) => (-sc, c) }
        selected += pick
        out((p, r.toLong)) = (pick, score10 / 1e7)
      }
    }
    out.toMap
  }

  test("retrieval_mmr: exact match vs in-memory greedy reference") {
    val got = run("retrieval_mmr")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val ref = mmrInMemory()
    assert(got.size == ref.size, s"${got.size} vs ${ref.size} selections")
    val diffs = ref.keys.filter(k => got.get(k) != ref.get(k)).toSeq.sorted.take(5)
    assert(diffs.isEmpty, s"diverged at $diffs: got ${diffs.map(got.get)} ref ${diffs.map(ref.get)}")
  }

  test("retrieval_mmr: rank 1 is the pure-relevance argmax and selection diversifies") {
    val vecs = Tables
      .embeddings(spark, sfDir)
      .select("vec_id", "embedding")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    val rows = run("retrieval_mmr").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byProbe = rows.groupBy(_._1)
    def maxPairSim(ids: Seq[Long]): Double =
      (for { a <- ids; b <- ids if a < b } yield dot(vecs(a), vecs(b))).max
    var mmrRedundancy = 0.0
    var topkRedundancy = 0.0
    byProbe.foreach { case (p, sel) =>
      // rank 1 = argmax sim (ties to lower id) — pure relevance
      val r1 = sel.find(_._2 == 1L).get._3
      val best = vecs.keys
        .filter(_ != p)
        .map(c => c -> dot(vecs(p), vecs(c)))
        .toSeq
        .sortBy { case (c, s) => (-s, c) }
        .head
        ._1
      assert(r1 == best, s"probe $p rank-1 $r1 != relevance argmax $best")
      val topK = vecs.keys
        .filter(_ != p)
        .map(c => c -> dot(vecs(p), vecs(c)))
        .toSeq
        .sortBy { case (c, s) => (-s, c) }
        .take(ops.Retrieval.MmrK)
        .map(_._1)
      mmrRedundancy += maxPairSim(sel.map(_._3).toSeq)
      topkRedundancy += maxPairSim(topK)
    }
    // the POINT of MMR: selected sets are less mutually redundant than
    // plain top-k on average (strict on this fixture's dup-heavy corpus)
    assert(
      mmrRedundancy < topkRedundancy,
      s"MMR redundancy $mmrRedundancy !< top-k $topkRedundancy",
    )
  }
}
