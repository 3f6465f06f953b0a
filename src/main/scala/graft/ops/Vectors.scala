package graft.ops

import graft.{QueryDef, Tables}
import graft.Qf._
import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the `embeddings` table (SURVEY.md §2.10).
  *
  * Embeddings are 64-d float, L2-normalized at generation, so dot product ≡
  * cosine. The dot is a higher-order-function fold — stays inside codegen, no
  * UDF, no MLlib Vector conversion. Both engines fold the 64 elements
  * left-to-right in index order over doubles, so the result is bit-identical
  * and round(4) is safely coarse.
  *
  * Scale shapes:
  *  - `sim_topk_cosine`: 100 probes broadcast against an arbitrarily large
  *    corpus — the corpus never shuffles, each task scores its partition and
  *    the per-probe top-k collapses in the final window. This is the exact
  *    brute-force baseline an ANN index (LshAnn, scalatest) is judged against.
  *  - `sim_threshold_pairs`: label-blocked self-join — candidate pairs are
  *    bounded by the largest block, not corpus².
  */
object Vectors {

  /** dot(a, b) as a fold over zipped arrays, in double — the pure-built-in
    * formulation (works on any session, no registration needed).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v,
    )

  /** Same fold as a native codegen expression (graft.functions.DotProduct):
    * bit-identical values, ~no per-element lambda/array overhead. Requires
    * GraftFunctions.register on the session — declared query builders do it.
    */
  def nativeDot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** For the 100 probe vectors (vec_id < 100): top-10 nearest corpus
    * neighbors by cosine (self excluded), rank on (rounded sim desc, cand_id).
    */
  private def simTopkCosine(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val e = Tables.embeddings(s, dir)
    val probes = e
      .filter(col("vec_id") < 100)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pvec"))
    val corpus = e.select(col("vec_id").as("cand_id"), col("embedding").as("cvec"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("sim").desc, col("cand_id"))
    corpus
      .crossJoin(broadcast(probes)) // corpus stays partitioned; probes ship
      .filter(col("probe_id") =!= col("cand_id"))
      .withColumn("sim", round(nativeDot(col("pvec"), col("cvec")), 4))
      .withColumn("rn", asLong(row_number().over(w)))
      .filter(col("rn") <= 10)
      .select("probe_id", "cand_id", "sim", "rn")
      .orderBy("probe_id", "rn")
  }

  /** All pairs with cosine >= 0.3 inside the same `label` block (a < b).
    *
    * The threshold gates on the RAW dot, not the rounded one: the fold is
    * bit-identical across engines (see object scaladoc), so `dot >= t`
    * can never diverge — whereas `round(dot, 4) >= t` would additionally
    * depend on both engines' decimal-rounding implementations agreeing at
    * the boundary ulp. The rounded `sim` column is display precision only.
    */
  private def simThresholdPairs(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val e = Tables.embeddings(s, dir)
    val a = e.select(col("vec_id").as("id_a"), col("label"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("id_b"), col("label").as("label_b"), col("embedding").as("vb"))
    a.join(b, col("label") === col("label_b") && col("id_a") < col("id_b"))
      .withColumn("__dot", nativeDot(col("va"), col("vb")))
      .filter(col("__dot") >= 0.3)
      .withColumn("sim", round(col("__dot"), 4))
      .select("label", "id_a", "id_b", "sim")
      .orderBy("label", "id_a", "id_b")
  }

  /** Embedding-cosine near-duplicate removal — the vector-space member of the
    * dedup family (exact / MinHash / SimHash / embedding). A vector is a
    * duplicate when some SMALLER-id vector in the same `label` block has
    * cosine >= the threshold; survivors are everything else. Blocking on
    * `label` bounds candidates by the largest block (at 100 TB swap the block
    * key for an LSH bucket — LshAnn.candidates has the exact same join shape,
    * so the plan scales unchanged). The dup-id set is distinct vec_ids only
    * (8 bytes a row), then a single left join marks survivors — embeddings
    * are scored once and never shuffled as join payload afterwards.
    *
    * Like sim_threshold_pairs, the kept/dropped decision gates on the RAW
    * dot — bit-identical across engines — so no rounding boundary can flip
    * row content between Spark and the oracle.
    */
  private def dedupEmbedding(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val e = Tables.embeddings(s, dir)
    val a = e.select(col("vec_id").as("id_a"), col("label"), col("embedding").as("va"))
    val b =
      e.select(col("vec_id").as("id_b"), col("label").as("label_b"), col("embedding").as("vb"))
    val dupIds = a
      .join(b, col("label") === col("label_b") && col("id_a") < col("id_b"))
      .filter(nativeDot(col("va"), col("vb")) >= 0.4)
      .select(col("id_b").as("vec_id"))
      .distinct()
      .withColumn("dup", lit(true))
    e.select(col("vec_id"), col("label"))
      .join(dupIds, Seq("vec_id"), "left")
      .select(col("vec_id"), col("label"), col("dup").isNull.as("kept"))
      .orderBy("vec_id")
  }

  /** documents ⟕ embeddings on doc_id = vec_id: the joined text+vector frame
    * every downstream embedding pipeline starts from. Left join because the
    * corpora diverge at sf0.1 (5000 docs vs 2000 vectors).
    */
  private def embedJoinDocs(s: SparkSession, dir: String): DataFrame =
    Tables
      .documents(s, dir)
      .join(Tables.embeddings(s, dir), col("doc_id") === col("vec_id"), "left")
      .select(
        col("doc_id"),
        col("lang"),
        col("n_chars"),
        col("label"),
        col("vec_id").isNotNull.as("has_vec"),
      )
      .orderBy("doc_id")

  // ------------------------------------------------------------- catalog

  val entries: Seq[QueryDef] = Seq(
    QueryDef(
      "sim_topk_cosine",
      simTopkCosine,
      Some(
        "WITH p AS (SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pv " +
          "FROM embeddings WHERE vec_id < 100), " +
          "c AS (SELECT vec_id AS cand_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings), " +
          "scored AS (SELECT probe_id, cand_id, round(list_dot_product(pv, cv), 4) AS sim " +
          "FROM p CROSS JOIN c WHERE probe_id <> cand_id) " +
          "SELECT probe_id, cand_id, sim, rn FROM (" +
          "SELECT probe_id, cand_id, sim, " +
          "row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, cand_id) AS rn " +
          "FROM scored) WHERE rn <= 10 ORDER BY probe_id, rn"
      ),
    ),
    QueryDef(
      "sim_threshold_pairs",
      simThresholdPairs,
      Some(
        "SELECT a.label AS label, a.vec_id AS id_a, b.vec_id AS id_b, " +
          "round(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 4) AS sim " +
          "FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id " +
          "WHERE list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.3 " +
          "ORDER BY label, id_a, id_b"
      ),
    ),
    QueryDef(
      "dedup_embedding",
      dedupEmbedding,
      Some(
        "WITH pairs AS (SELECT b.vec_id AS dup_id " +
          "FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id " +
          "WHERE list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.4) " +
          "SELECT vec_id, label, vec_id NOT IN (SELECT dup_id FROM pairs) AS kept " +
          "FROM embeddings ORDER BY vec_id"
      ),
    ),
    QueryDef(
      "embed_join_docs",
      embedJoinDocs,
      Some(
        "SELECT doc_id, lang, n_chars, label, vec_id IS NOT NULL AS has_vec " +
          "FROM documents LEFT JOIN embeddings ON doc_id = vec_id ORDER BY doc_id"
      ),
    ),
  )
}
