package graft.ops

import graft.{QueryDef, Tables}
import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — compressed-domain approximate nearest
  * neighbors, the third ANN family next to the data-independent sign-LSH
  * (LshAnn) and the coarse-quantizer IVF (IvfAnn). Public technique
  * (Jégou/Douze/Schmid 2011; the FAISS `PQx` index family): split the
  * 64-dim embedding into [[NSub]] = 8 contiguous 8-dim subspaces, train an
  * independent [[NCodes]] = 16-code codebook per subspace, and store each
  * corpus vector as 8 code ids — 8 × 4 bits = 4 BYTES per vector against
  * 256 bytes of float32, a 64× corpus compression. Probes score the
  * compressed corpus by ADC (asymmetric distance computation): one
  * 8 × 16 table of exact probe-to-centroid subspace distances per probe,
  * then approx_dist(probe, x) = Σ_sub table[sub][code_sub(x)] — a pure
  * lookup-sum that never touches the raw corpus vectors; only the
  * [[ShortList]]-deep ADC shortlist is exactly re-ranked (native dot),
  * so returned scores are exact (the LshAnn/IvfAnn contract).
  *
  * 100 TB shape: training and encoding are one broadcast-codebook pass
  * over the corpus (the codebook is 8 × 16 × 8 ints — kilobytes at any
  * corpus size); the ADC pass joins the n·8-row code table against the
  * broadcast probe tables and partial-aggregates the 8 subspace terms
  * map-side, so the only corpus-sized exchange carries one row per
  * (probe, candidate) sum — and the per-probe shortlist is
  * WindowGroupLimit-pruned map-side before the final rank. The corpus
  * READ for scoring is the 4-byte-code frame, not the embeddings: this
  * is the family that still works when the raw vectors no longer fit
  * the cluster's storage budget.
  *
  * Cross-engine exactness: everything runs on the 1e-6 integer grid of
  * the IvfAnn doctrine — subspace distances are exact int64 sums
  * (codegen'd graft_l2sq over 8-long arrays), Lloyd means are integer
  * divs, and every argmin/rank tie breaks on (value, code|cand_id) — so
  * TRAINING, ENCODING, the ADC TABLES, and the final re-rank all
  * hash-check against the DuckDB oracle, which re-derives the identical
  * codebooks from scratch.
  */
object PqAnn {

  private val NSub = 8
  private val SubDim = 8
  private val NCodes = 16
  private val PqIters = 2
  private val ShortList = 100
  private val PqTopK = 10

  /** (vec_id, xf): the full 64-long integer grid array. */
  private def xf(e: DataFrame): DataFrame =
    e.select(
      col("vec_id"),
      expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1e6, 0) AS BIGINT))").as("xf"),
    )

  /** (vec_id, sub, x6a): one 8-long subvector array per subspace. */
  private def sub6(e: DataFrame): DataFrame =
    xf(e)
      .select(col("vec_id"), explode(sequence(lit(0L), lit(NSub - 1L))).as("sub"), col("xf"))
      .select(
        col("vec_id"),
        col("sub"),
        expr(s"slice(xf, CAST(sub * $SubDim + 1 AS INT), $SubDim)").as("x6a"),
      )

  /** (vec_id, sub, ld, x6): the per-dimension grain for Lloyd means. */
  private def sgrid(e: DataFrame): DataFrame =
    xf(e)
      .select(col("vec_id"), posexplode(col("xf")).as(Seq("gd", "x6")))
      .select(
        col("vec_id"),
        expr(s"CAST(gd AS BIGINT) div $SubDim").as("sub"),
        expr(s"CAST(gd AS BIGINT) % $SubDim").as("ld"),
        col("x6"),
      )

  private[ops] def toArrays(cent: DataFrame): DataFrame =
    cent
      .groupBy("sub", "code")
      .agg(expr("transform(array_sort(collect_list(struct(ld, c6))), s -> s.c6)").as("c6a"))

  /** Nearest code per (vector, subspace) — kernel distances, ties to the
    * lower code.
    */
  private[ops] def encode(s6: DataFrame, centA: DataFrame): DataFrame =
    s6.join(broadcast(centA), "sub")
      .select(
        col("vec_id"),
        col("sub"),
        col("code"),
        call_function("graft_l2sq", col("x6a"), col("c6a")).as("dist2"),
      )
      .groupBy("vec_id", "sub")
      .agg(min_by(col("code"), struct(col("dist2"), col("code"))).as("code"))

  /** Train the 8 codebooks: seeds = subvectors of the [[NCodes]] smallest
    * vec_ids (code c = rank-c seed, same idiom as the IVF grid), then
    * [[PqIters]] integer Lloyd steps per subspace — all 8 subspaces train
    * in the SAME frames (sub is just a grouping column), so PQ training
    * costs one assignment join + one mean aggregate per step regardless
    * of m.
    */
  private def trainCodebooks(e: DataFrame): DataFrame =
    trainCodebooksFrom(sub6(e), sgrid(e), seedCodes(e))

  /** (vec_id, code): the [[NCodes]] smallest vec_ids in rank order — the
    * deterministic seed idiom shared with the IVF grid.
    */
  private[ops] def seedCodes(e: DataFrame): DataFrame = {
    val seedW = Window.orderBy("vec_id") // bounded: runs on the 16-row limit frame
    e.orderBy("vec_id")
      .limit(NCodes)
      .select(col("vec_id"), (row_number().over(seedW) - 1).cast("long").as("code"))
  }

  /** The subspace-codebook train loop over ARBITRARY subvector frames —
    * `s6` (vec_id, sub, x6a) for assignment, `g` (vec_id, sub, ld, x6) for
    * the per-dimension Lloyd means, `seedIds` (vec_id, code) for the
    * initial codebook. Exposed (r11) so [[IvfPq]] can train the same
    * codebooks on cell RESIDUALS instead of raw vectors.
    */
  private[ops] def trainCodebooksFrom(s6: DataFrame, g: DataFrame, seedIds: DataFrame): DataFrame = {
    val c0 = seedIds
      .join(g, "vec_id")
      .select(col("sub"), col("code"), col("ld"), col("x6").as("c6"))
    def step(cent: DataFrame): DataFrame = {
      val upd = encode(s6, toArrays(cent))
        .join(g, Seq("vec_id", "sub"))
        .groupBy("sub", "code", "ld")
        .agg(expr("sum(x6) div count(1)").as("c6n"))
      cent
        .join(upd, Seq("sub", "code", "ld"), "left")
        .select(col("sub"), col("code"), col("ld"), coalesce(col("c6n"), col("c6")).as("c6"))
    }
    (1 to PqIters)
      .foldLeft(c0)((c, _) => step(c))
      .transform(Checkpoints.stable(_))
  }

  /** Declared key: the encoded corpus — (vec_id, sub, code), the 4-byte
    * representation scoring reads instead of the embeddings.
    */
  private def embedPqCodes(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    encode(sub6(e), toArrays(trainCodebooks(e)))
      .select("vec_id", "sub", "code")
      .orderBy("vec_id", "sub")
  }

  /** Declared key: ADC top-k. Probes (vec_id < 100, the ANN-family
    * convention) build their 8×16 exact distance tables against the
    * trained codebooks; the compressed corpus is scored by lookup-sum;
    * the top-[[ShortList]] per probe by (adc, cand_id) is exactly
    * re-ranked with the native dot to the returned top-[[PqTopK]].
    */
  private def simAnnPq(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val centA = toArrays(trainCodebooks(e))
    val codes = encode(sub6(e), centA)
    val pt = sub6(e.filter(col("vec_id") < 100))
      .join(broadcast(centA), "sub")
      .select(
        col("vec_id").as("probe_id"),
        col("sub"),
        col("code"),
        call_function("graft_l2sq", col("x6a"), col("c6a")).as("d2"),
      )
    val adc = codes
      .join(broadcast(pt), Seq("sub", "code"))
      .filter(col("probe_id") =!= col("vec_id"))
      .groupBy(col("probe_id"), col("vec_id").as("cand_id"))
      .agg(sum("d2").as("adc"))
    val slW = Window.partitionBy("probe_id").orderBy(col("adc"), col("cand_id"))
    val shortlist = adc
      .withColumn("sr", row_number().over(slW))
      .filter(col("sr") <= ShortList)
      .select("probe_id", "cand_id")
    val pv = e.select(col("vec_id").as("probe_id"), col("embedding").as("pvec"))
    val cv = e.select(col("vec_id").as("cand_id"), col("embedding").as("cvec"))
    val rkW = Window.partitionBy("probe_id").orderBy(col("sim").desc, col("cand_id"))
    shortlist
      .join(pv, "probe_id")
      .join(cv, "cand_id")
      .withColumn("sim", round(Vectors.nativeDot(col("pvec"), col("cvec")), 4))
      .withColumn("rn", row_number().over(rkW).cast("long"))
      .filter(col("rn") <= PqTopK)
      .select("probe_id", "cand_id", "sim", "rn")
      .orderBy("probe_id", "rn")
  }

  /** Shared training CTE chain (xf → sub6 → g → seed → c0 → c1 → c2 →
    * ca_c2 → codes): DuckDB re-derives the identical codebooks and
    * encoded corpus — the L2 kernel's exact formulation on 8-long lists,
    * integer-div means, (dist2, code) ties.
    */
  private val pqTrainCte: String = {
    val dist2 = "CAST(list_sum(list_transform(range(1, 9), " +
      "i -> (e.x6a[i] - c.c6a[i]) * (e.x6a[i] - c.c6a[i]))) AS BIGINT)"
    def step(cIn: String, out: String): String =
      s"ca_$cIn AS (SELECT sub, code, list(c6 ORDER BY ld) AS c6a FROM $cIn GROUP BY 1, 2), " +
        s"d_$out AS (SELECT e.vec_id, e.sub, c.code, $dist2 AS dist2 " +
        s"FROM sub6 e JOIN ca_$cIn c ON c.sub = e.sub), " +
        s"a_$out AS (SELECT vec_id, sub, code FROM (SELECT vec_id, sub, code, " +
        s"row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist2, code) AS rn FROM d_$out) WHERE rn = 1), " +
        s"u_$out AS (SELECT a.sub, a.code, g.ld, sum(g.x6) // count(*) AS c6n " +
        s"FROM a_$out a JOIN g ON g.vec_id = a.vec_id AND g.sub = a.sub GROUP BY 1, 2, 3), " +
        s"$out AS (SELECT c.sub, c.code, c.ld, coalesce(u.c6n, c.c6) AS c6 " +
        s"FROM $cIn c LEFT JOIN u_$out u ON u.sub = c.sub AND u.code = c.code AND u.ld = c.ld)"
    "xf AS (SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]), " +
      "x -> CAST(round(x * 1e6, 0) AS BIGINT)) AS xf FROM embeddings), " +
      s"sub6 AS (SELECT vec_id, CAST(s.range AS BIGINT) AS sub, " +
      s"list_slice(xf, CAST(s.range * $SubDim + 1 AS INT), CAST(s.range * $SubDim + $SubDim AS INT)) AS x6a " +
      s"FROM xf, range($NSub) s), " +
      "g AS (SELECT vec_id, CAST(u.gd // 8 AS BIGINT) AS sub, CAST(u.gd % 8 AS BIGINT) AS ld, u.x6 " +
      "FROM (SELECT vec_id, unnest(list_transform(xf, (x, i) -> " +
      "{'gd': CAST(i - 1 AS BIGINT), 'x6': x})) AS u FROM xf)), " +
      s"seed AS (SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) AS BIGINT) - 1 AS code " +
      s"FROM embeddings ORDER BY vec_id LIMIT $NCodes), " +
      "c0 AS (SELECT g.sub, seed.code, g.ld, g.x6 AS c6 FROM seed JOIN g ON g.vec_id = seed.vec_id), " +
      step("c0", "c1") + ", " +
      step("c1", "c2") + ", " +
      "ca_c2 AS (SELECT sub, code, list(c6 ORDER BY ld) AS c6a FROM c2 GROUP BY 1, 2), " +
      s"d_fin AS (SELECT e.vec_id, e.sub, c.code, $dist2 AS dist2 " +
      "FROM sub6 e JOIN ca_c2 c ON c.sub = e.sub), " +
      "codes AS (SELECT vec_id, sub, code FROM (SELECT vec_id, sub, code, " +
      "row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist2, code) AS rn FROM d_fin) WHERE rn = 1)"
  }

  private val embedPqCodesSql =
    s"WITH $pqTrainCte SELECT vec_id, sub, code FROM codes ORDER BY vec_id, sub"

  private val simAnnPqSql =
    s"WITH $pqTrainCte, " +
      "pt AS (SELECT vec_id AS probe_id, sub, code, dist2 AS d2 FROM d_fin WHERE vec_id < 100), " +
      "adc AS (SELECT pt.probe_id, a.vec_id AS cand_id, CAST(sum(pt.d2) AS BIGINT) AS adc " +
      "FROM codes a JOIN pt ON pt.sub = a.sub AND pt.code = a.code " +
      "WHERE pt.probe_id <> a.vec_id GROUP BY 1, 2), " +
      s"sl AS (SELECT probe_id, cand_id FROM (SELECT probe_id, cand_id, " +
      s"row_number() OVER (PARTITION BY probe_id ORDER BY adc, cand_id) AS sr FROM adc) WHERE sr <= $ShortList), " +
      "ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
      "r AS (SELECT probe_id, cand_id, round(list_dot_product(pe.v, ce.v), 4) AS sim " +
      "FROM sl JOIN ev pe ON pe.vec_id = sl.probe_id JOIN ev ce ON ce.vec_id = sl.cand_id), " +
      "rk AS (SELECT probe_id, cand_id, sim, " +
      "CAST(row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, cand_id) AS BIGINT) AS rn FROM r) " +
      s"SELECT probe_id, cand_id, sim, rn FROM rk WHERE rn <= $PqTopK ORDER BY probe_id, rn"

  val entries: Seq[QueryDef] = Seq(
    QueryDef("embed_pq_codes", embedPqCodes, Some(embedPqCodesSql)),
    QueryDef("sim_ann_pq", simAnnPq, Some(simAnnPqSql)),
  )
}
