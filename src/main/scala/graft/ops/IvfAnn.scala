package graft.ops

import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** IVF (inverted-file) approximate nearest neighbors — the data-DEPENDENT
  * scale path, complementing the data-independent sign-bit LSH in LshAnn:
  * a coarse quantizer (k centroids, trained by distributed Lloyd
  * iterations) partitions the corpus into k inverted lists; a probe scores
  * only the `nprobe` lists whose centroids it is closest to. Candidate
  * work is ~(nprobe/k)·|corpus| per probe instead of |corpus|; recall
  * depends on list balance and nprobe and is measured in IvfSpec.
  *
  * Everything is DataFrame ops: assignment is a broadcast join of the k
  * centroids + per-vector arg-max (cosine ≡ dot on normalized inputs, via
  * the native codegen kernel); the Lloyd update is an elementwise mean —
  * posexplode to (cluster, dim) grain, avg, re-assemble, L2-normalize.
  * Centroid seeds are the first k corpus vectors (deterministic); the mean
  * is a float aggregation, so training is deterministic only up to
  * summation order — fine for an index (assignment changes of borderline
  * vectors shift recall marginally, never correctness of returned scores,
  * which are always exact re-ranks).
  */
object IvfAnn {

  /** Persisted centroid frames, one per (session, data dir) — see the
    * entries scaladoc. WEAKLY keyed on the SparkSession instance itself:
    * identity hash codes are reusable after GC (a new session could alias a
    * dead one's key and receive a DataFrame bound to a stopped
    * SparkContext), and a strong key would retain every session's persisted
    * plan for the JVM lifetime. The VALUE side holds the DataFrame only
    * through a WeakReference — a strong value would reach the session back
    * through Dataset.sparkSession and pin its own key forever (the classic
    * WeakHashMap self-reference trap). If the wrapper Dataset is collected
    * the entry rebuilds and re-persists: CacheManager compares CANONICALIZED
    * plans, so the rebuilt (structurally identical) plan reuses the live
    * cache entry instead of registering a second one. The whole
    * lookup-or-build runs under one lock — build here is lazy plan
    * construction plus persist() registration (no Spark job), so the
    * coarse lock is cheap and stops a race from double-registering.
    */
  private val centroidCache =
    new java.util.WeakHashMap[
      SparkSession,
      scala.collection.mutable.HashMap[String, java.lang.ref.WeakReference[DataFrame]],
    ]()

  private def cachedCentroids(s: SparkSession, dir: String)(build: => DataFrame): DataFrame =
    centroidCache.synchronized {
      val perDir = Option(centroidCache.get(s)).getOrElse {
        val m =
          scala.collection.mutable.HashMap.empty[String, java.lang.ref.WeakReference[DataFrame]]
        centroidCache.put(s, m)
        m
      }
      perDir.get(dir).flatMap(r => Option(r.get)) match {
        case Some(df) => df
        case None =>
          val df = build
          perDir.put(dir, new java.lang.ref.WeakReference(df))
          df
      }
    }

  /** Route each vector to its topN nearest centroids (ties to the lower
    * centroid id). ONE implementation for both assignment (topN = 1) and
    * probe routing (topN = nprobe) so tie-breaks can never diverge.
    * The topN = 1 path aggregates with max_by instead of a window: the k
    * scored rows collapse map-side (partial aggregation) before any
    * exchange — a k-fold shuffle reduction on the corpus-sized side.
    */
  def route(vecs: DataFrame, idCol: String, vecCol: String, centroids: DataFrame, topN: Int): DataFrame = {
    GraftFunctions.register(vecs.sparkSession)
    val scored = vecs
      .crossJoin(broadcast(centroids)) // k rows per vector
      .withColumn("__sim", Vectors.nativeDot(col(vecCol), col("cvec_c")))
    if (topN == 1)
      scored
        .groupBy(col(idCol), col(vecCol))
        .agg(max_by(col("cid"), struct(col("__sim"), -col("cid"))).as("cid"))
    else {
      val w = Window.partitionBy(col(idCol)).orderBy(col("__sim").desc, col("cid"))
      scored
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= topN)
        .select(col(idCol), col(vecCol), col("cid"))
    }
  }

  /** Nearest-centroid id per vector. */
  def assign(vecs: DataFrame, idCol: String, vecCol: String, centroids: DataFrame): DataFrame =
    route(vecs, idCol, vecCol, centroids, topN = 1)

  /** One distributed Lloyd step: elementwise mean of each cluster's members,
    * L2-normalized back onto the unit sphere (inputs are normalized, so
    * cosine stays ≡ dot).
    */
  def lloydStep(corpus: DataFrame, vecCol: String, centroids: DataFrame): DataFrame = {
    val assigned = assign(corpus, "cand_id", vecCol, centroids)
    val dims = assigned
      .select(col("cid"), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy("cid", "pos")
      .agg(avg(col("x")).as("m"))
    val means = dims
      .groupBy("cid")
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("cid"), expr("transform(pm, p -> p.m)").as("raw"))
    val updated = means
      .withColumn("norm", sqrt(aggregate(col("raw"), lit(0.0), (a, x) => a + x * x)))
      .select(
        col("cid"),
        expr("transform(raw, x -> cast(x / norm AS FLOAT))").as("cvec_new"),
      )
    // a centroid whose list went empty has no mean — keep its previous
    // position instead of silently dropping it (train must return k lists)
    centroids
      .join(updated, Seq("cid"), "left")
      .select(col("cid"), coalesce(col("cvec_new"), col("cvec_c")).as("cvec_c"))
  }

  /** Train a k-centroid coarse quantizer: seed with the first k corpus
    * vectors (deterministic), run `iters` Lloyd steps.
    */
  def train(corpus: DataFrame, k: Int, iters: Int = 2): DataFrame = {
    val seed = corpus
      .orderBy("cand_id")
      .limit(k)
      .select(monotonicallyStableCid(k), col("cvec").as("cvec_c"))
    (1 to iters).foldLeft(seed)((c, _) => lloydStep(corpus, "cvec", c))
  }

  // row_number over a 16-row frame; deterministic because cand_id is ordered
  private def monotonicallyStableCid(k: Int) = {
    val w = Window.orderBy(col("cand_id"))
    (row_number().over(w) - 1).as("cid")
  }

  /** Declared rows-only (like sim_ann_lsh): centroid training is a float
    * mean whose low bits depend on summation order, so no cross-engine hash
    * can be promised — but seeding is deterministic (first-k corpus vectors),
    * tie-breaks are pinned, returned scores are exact re-ranks, and the
    * recall floor vs brute force is asserted in IvfSpec.
    */
  val entries: Seq[graft.QueryDef] = Seq(
    graft.QueryDef(
      "sim_ann_ivf",
      (s, dir) => {
        val e = graft.Tables.embeddings(s, dir)
        val corpus = e.select(col("vec_id").as("cand_id"), col("embedding").as("cvec"))
        val probes = e
          .filter(col("vec_id") < 100)
          .select(col("vec_id").as("probe_id"), col("embedding").as("pvec"))
        // the lazy centroid plan is referenced twice (corpus assign + probe
        // routing) — persist the 16-row result so Lloyd training runs once.
        // Cached per (session, dir): re-invoking the query builder (specs,
        // interleaved bench passes, long-lived drivers) must not register a
        // fresh persisted plan each call and leak block-manager entries.
        val centroids = cachedCentroids(s, dir)(train(corpus, k = 16).persist())
        ivfTopK(probes, corpus, centroids, nprobe = 4, k = 10)
          .orderBy("probe_id", "rn")
      },
      None,
    )
  )

  /** IVF top-k: assign corpus once (the inverted lists), route each probe to
    * its nprobe nearest lists, exact re-rank within them.
    */
  def ivfTopK(
      probes: DataFrame, // (probe_id, pvec)
      corpus: DataFrame, // (cand_id, cvec)
      centroids: DataFrame, // (cid, cvec_c)
      nprobe: Int,
      k: Int,
  ): DataFrame = {
    GraftFunctions.register(probes.sparkSession)
    val lists = assign(corpus, "cand_id", "cvec", centroids)
    val routes = route(probes, "probe_id", "pvec", centroids, nprobe)
    val w = Window.partitionBy(col("probe_id")).orderBy(col("sim").desc, col("cand_id"))
    routes
      .join(lists, "cid")
      .filter(col("probe_id") =!= col("cand_id"))
      .withColumn("sim", round(Vectors.nativeDot(col("pvec"), col("cvec")), 4))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select("probe_id", "cand_id", "sim", "rn")
  }
}
