package graft.ops

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sign-bit (random-hyperplane) LSH for approximate nearest neighbors —
  * the 100 TB similarity-search path (SURVEY.md §2.10 `sim_ann_lsh`).
  *
  * Brute force (`sim_topk_cosine`) is O(|probes| · |corpus|) dots; fine for
  * 100 probes, impossible for corpus-sized probe sets. Sign LSH buckets
  * vectors by the sign pattern of dots against fixed random hyperplanes:
  * P(bit agrees) = 1 − θ/π for angle θ, so near vectors share buckets far
  * more often than random ones. `nTables` independent tables trade recall
  * for candidate count (recall ≈ 1 − (1 − p^bits)^tables); candidates are
  * then exactly re-ranked, so precision is always 1 — like the MinHash path,
  * the approximation only affects recall, never correctness of returned
  * scores. Recall at the default parameters is measured in AnnLshSpec.
  *
  * Hyperplanes are generated from a fixed seed on the driver and enter the
  * plan as literal arrays — deterministic across runs and executors, no RNG
  * in the plan.
  */
object LshAnn {

  /** Deterministic unit-free hyperplanes: nTables × bits × dim gaussians. */
  def hyperplanes(nTables: Int, bits: Int, dim: Int, seed: Long = 42L): Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nTables, bits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** dot(vec, plane) through the native codegen kernel: the plane enters as
    * a FLOAT literal array (DotProduct's input contract). The float cast
    * can flip the sign of a near-zero dot vs the double fold — harmless
    * for BUCKETING because both join sides evaluate the identical
    * expression, so assignment stays consistent and recall is statistically
    * unchanged (floor re-asserted in LshSpec). 32 interpreted HOF folds per
    * vector were the bucketize hotspot.
    */
  private def dotLit(vec: Column, plane: Array[Double]): Column =
    Vectors.nativeDot(vec, array(plane.map(p => lit(p.toFloat)): _*))

  /** (table, bucket) rows per vector: bucket = packed sign bits of the
    * vector against that table's hyperplanes. Output is exploded long-form so
    * the candidate join is a plain equi-join on (table, bucket).
    */
  def bucketize(vecs: DataFrame, idCol: String, vecCol: String, planes: Array[Array[Array[Double]]]): DataFrame = {
    GraftFunctions.register(vecs.sparkSession)
    val perTable: Seq[Column] = planes.zipWithIndex.map { case (table, t) =>
      val bucket = table.zipWithIndex
        .map { case (plane, j) => when(dotLit(col(vecCol), plane) >= 0, lit(1L << j)).otherwise(lit(0L)) }
        .reduce(_ + _)
      struct(lit(t).as("table"), bucket.as("bucket"))
    }
    vecs.select(col(idCol), explode(array(perTable: _*)).as("tb"))
      .select(col(idCol), col("tb.table").as("table"), col("tb.bucket").as("bucket"))
  }

  /** ANN top-k: bucket both sides, equi-join on (table, bucket) for
    * candidates, exact re-rank, top-k per probe. Same output contract as the
    * brute-force `sim_topk_cosine` (probe_id, cand_id, sim, rn).
    */
  def annTopK(
      probes: DataFrame, // (probe_id, pvec)
      corpus: DataFrame, // (cand_id, cvec)
      k: Int,
      planes: Array[Array[Array[Double]]],
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pb = bucketize(probes.select(col("probe_id"), col("pvec").as("v")), "probe_id", "v", planes)
    val cb = bucketize(corpus.select(col("cand_id"), col("cvec").as("v")), "cand_id", "v", planes)
    val cands = pb
      .join(cb, Seq("table", "bucket"))
      .filter(col("probe_id") =!= col("cand_id"))
      .select("probe_id", "cand_id")
      .distinct()
    GraftFunctions.register(probes.sparkSession)
    val w = Window.partitionBy(col("probe_id")).orderBy(col("sim").desc, col("cand_id"))
    cands
      .join(probes, "probe_id")
      .join(corpus, "cand_id")
      // exact re-rank with the native codegen kernel (bit-identical to the
      // HOF fold; this is the hot loop of the 100 TB path)
      .withColumn("sim", round(Vectors.nativeDot(col("pvec"), col("cvec")), 4))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select("probe_id", "cand_id", "sim", "rn")
  }

  private def simAnnLsh(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val e = graft.Tables.embeddings(s, dir)
    val probes = e
      .filter(col("vec_id") < 100)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pvec"))
    val corpus = e.select(col("vec_id").as("cand_id"), col("embedding").as("cvec"))
    annTopK(probes, corpus, k = 10, planes = hyperplanes(nTables = 8, bits = 4, dim = 64))
      .orderBy("probe_id", "rn")
  }

  /** Declared WITHOUT an oracle (None ⇒ the driver records a rows-only
    * check): ANN recall is a parameter trade-off, not an exact contract, so
    * no cross-engine hash can be promised — but the query is deterministic
    * (seeded literal hyperplanes, exact re-rank, pinned tiebreaks) and the
    * recall floor is asserted in LshSpec against the brute-force truth.
    */
  val entries: Seq[graft.QueryDef] = Seq(
    graft.QueryDef("sim_ann_lsh", simAnnLsh, None)
  )
}
