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

  test("knn_classify: declared query output is a total function of the probe set") {
    val out = SparkEntry.queries("knn_classify")(spark, sfDir).collect()
    val probes = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 100).count()
    assert(out.length == probes, "one prediction per probe, no drops on vote ties")
    assert(out.forall(r => r.getAs[Long]("votes") >= 1 && r.getAs[Long]("votes") <= 5))
  }
}
