package graft

import org.apache.spark.sql.functions._

/** Efficacy proof for knn_classify (the langid precedent: the driver
  * fixture's labels are near-random in embedding space, so the DECLARED
  * query proves exact vote mechanics against the oracle, and THIS spec
  * proves the classifier classifies when label structure actually exists).
  */
class KnnSpec extends SparkSpec {

  /** Deterministic clustered fixture: label l lives on axis l of 8-d space;
    * per-vector noise comes from xxhash64 (seeded, engine-stable) scaled
    * well below the inter-centroid distance.
    */
  private def fixture = {
    import spark.implicits._
    val n = 200
    spark
      .range(n)
      .select(col("id").cast("int").as("vec_id"))
      .withColumn("label", (col("vec_id") % 5).cast("int"))
      .withColumn(
        "embedding",
        transform(
          sequence(lit(0), lit(7)),
          d =>
            when(d === col("label"), lit(1.0))
              .otherwise((pmod(xxhash64(col("vec_id"), d), lit(1000)) / 10000.0) - 0.05)
              .cast("float"),
        ),
      )
  }

  test("knn_classify: near-perfect accuracy on a discriminative fixture, chance on noise") {
    graft.functions.GraftFunctions.register(spark)
    val e = fixture
    val probes = e
      .filter(col("vec_id") < 50)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pvec"), col("label").as("true_label"))
    val corpus = e
      .filter(col("vec_id") >= 50)
      .select(col("vec_id").as("cand_id"), col("embedding").as("cvec"), col("label").as("cand_label"))
    val out = ops.Vectors.knnClassify(probes, corpus, k = 5).collect()
    assert(out.length == 50)
    val acc = out.count(_.getAs[Boolean]("correct")).toDouble / out.length
    assert(acc >= 0.95, s"kNN accuracy $acc on a cleanly clustered fixture")
    // every prediction carries at least a majority of the 5 votes
    assert(out.forall(_.getAs[Long]("votes") >= 3), "majority rule violated")
  }

  test("embed_knn_graph: degree/rank/ordering laws and map-side top-k pruning") {
    val out = SparkEntry.queries("embed_knn_graph")(spark, sfDir)
    val rows = out.collect()
    val nVec = Tables.embeddings(spark, sfDir).count()
    // every vector appears with exactly 5 neighbours (all label blocks
    // in the fixture have > 5 members), ranked 1..5
    assert(rows.length == nVec * 5)
    rows.groupBy(_.getAs[Long]("vec_id")).foreach { case (v, nb) =>
      assert(nb.map(_.getAs[Long]("rn")).sorted.toSeq == (1L to 5L), s"ranks at $v")
      assert(!nb.exists(_.getAs[Long]("nbr_id") == v), s"self edge at $v")
      // sim non-increasing in rank
      val byRank = nb.sortBy(_.getAs[Long]("rn")).map(_.getAs[Double]("sim"))
      assert(byRank.zip(byRank.tail).forall { case (x, y) => x >= y }, s"sim order at $v")
      // neighbours stay in the vector's label block
      assert(nb.map(_.getAs[Int]("label")).distinct.length == 1, s"block purity at $v")
    }
    // the rank<=5 filter must prune map-side ahead of the window exchange
    // (WindowGroupLimit — the knn_classify plan law)
    out.count()
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), p.take(1500))
  }

  test("knn_classify: declared query output is a total function of the probe set") {
    val out = SparkEntry.queries("knn_classify")(spark, sfDir).collect()
    val probes = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 100).count()
    assert(out.length == probes, "one prediction per probe, no drops on vote ties")
    assert(out.forall(r => r.getAs[Long]("votes") >= 1 && r.getAs[Long]("votes") <= 5))
  }
}
