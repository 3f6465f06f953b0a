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
  * Hyperplanes are deterministic Rademacher (±1) vectors derived from md5
  * parity — the SimHash family of sign LSH. ±1 components buy two things
  * over seeded gaussians: (a) each dot term is ±(double)component, exact in
  * float AND double, so the sign pattern is bit-identical to DuckDB's
  * `list_dot_product` fold and the WHOLE query (bucketing + candidates +
  * exact re-rank) hash-checks against the oracle (r6 verdict item 3 — this
  * key was rows-only before); (b) the planes regenerate from the key string
  * alone on any engine — no RNG, no seed state, nothing shipped.
  */
object LshAnn {

  /** Deterministic Rademacher hyperplanes: component (t, j, d) is +1 when
    * the first hex digit of md5("lshp#t#j#d") is even, −1 otherwise —
    * reproducible in any engine with md5 (the hash52 seedless idiom,
    * boolean-valued). Mirrored literally in [[simAnnLshSql]].
    */
  def hyperplanes(nTables: Int, bits: Int, dim: Int): Array[Array[Array[Double]]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(nTables, bits) { (t, j) =>
      Array.tabulate(dim) { d =>
        val digest = md.digest(s"lshp#$t#$j#$d".getBytes("UTF-8"))
        if (((digest(0) >> 4) & 1) == 0) 1.0 else -1.0
      }
    }
  }

  /** dot(vec, plane) through the native codegen kernel: the plane enters as
    * a FLOAT literal array (DotProduct's input contract). The float cast
    * can flip the sign of a near-zero dot vs the double fold — harmless
    * for BUCKETING because both join sides evaluate the identical
    * expression, so assignment stays consistent and recall is statistically
    * unchanged (floor re-asserted in LshSpec). 32 interpreted HOF folds per
    * vector were the bucketize hotspot.
    */
  /** (table, bucket) rows per vector: bucket = packed sign bits of the
    * vector against that table's hyperplanes. Output is exploded long-form so
    * the candidate join is a plain equi-join on (table, bucket).
    *
    * r10 planning-cost fix: the planes used to enter as 32 independent
    * 64-float `array(lit…)` trees (~2k literal nodes, re-cloned into every
    * plan reference), and ANALYZING those trees — not executing them — was
    * the dominant cost of every LSH key at bench scale. All planes now
    * enter as ONE `typedlit` nested-array literal indexed by two
    * `element_at`s; constant folding collapses each extraction back to the
    * same per-plane float-array literal the codegen'd [[Vectors.nativeDot]]
    * kernel consumed before, so the EXECUTED plan is unchanged — only the
    * analyzed tree shrinks ~60×. Measured: semanticPairs 2.1 → see PERF.md.
    */
  def bucketize(vecs: DataFrame, idCol: String, vecCol: String, planes: Array[Array[Array[Double]]]): DataFrame = {
    GraftFunctions.register(vecs.sparkSession)
    val planesLit: Column =
      typedlit(planes.map(_.map(_.map(_.toFloat).toSeq).toSeq).toSeq)
    // r13 JIT fix: all tables×bits sign dots run inside ONE compact custom
    // kernel ([[graft.functions.LshBuckets]] — same fold order, identical
    // buckets) instead of tables×bits inlined graft_dot trees. The inlined
    // form fused Project+Generate into a single generated method past the
    // JVM's 8 KB huge-method limit, so the bucketize stage ran as
    // never-JIT-compiled bytecode — measured 213 CPU-seconds for 20k
    // vectors at sf1 (~1000× kernel cost), dominating every LSH-path key.
    // posexplode's pos IS the table index (same 0-based ints the old
    // lit(t) emitted), so the output contract is unchanged.
    vecs.select(
      col(idCol),
      posexplode(call_function("graft_lsh_buckets", col(vecCol), planesLit))
        .as(Seq("table", "bucket")),
    )
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
    // occupancy cap: per-cell corpus counts collapse map-side; overfull
    // cells leave candidate generation entirely (see BucketOccupancyCap)
    val ok = cb
      .groupBy("table", "bucket")
      .agg(count(lit(1)).as("occ"))
      .filter(col("occ") <= BucketOccupancyCap)
      .select("table", "bucket")
    val cands = pb
      .join(cb.join(ok, Seq("table", "bucket"), "left_semi"), Seq("table", "bucket"))
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

  private val NTables = 8
  private val Bits = 4
  private val Dim = 64

  /** The declared parameterization of sim_ann_lsh (probe-vs-corpus top-k:
    * candidate volume is |probes|-bounded, so fixed bits are fine there).
    */
  private[ops] def defaultPlanes: Array[Array[Array[Double]]] = hyperplanes(NTables, Bits, Dim)

  /** Per-table bucket occupancy target for CORPUS-WIDE pair generation
    * (dedup_semantic): bits must grow with the corpus or candidates grow
    * ∝ n²/2^bits (the r10 sf1 study measured the fixed-4-bit path at
    * 2097× shuffle on 10× rows). At n/2^bits ≈ [[LshBitsTarget]] the
    * same-bucket pair count is ≈ tables·n·target/2 — LINEAR in n.
    */
  private[ops] val LshBitsTarget = 128L

  /** Smallest bit count in [4, 24] with n ≤ target·2^bits — pure integer
    * comparison (no log2 double that the two engines could round apart),
    * mirrored verbatim in [[lshBucketsCteDynamicSql]]'s `nbits` CTE. The
    * fixture scales: n ≤ 2048 → 4 bits (sf ≤ 0.1 unchanged vs the fixed
    * parameterization), n = 20k (sf1) → 8 bits.
    */
  private[graft] def dynamicBits(n: Long): Int =
    (4 to 24).find(b => n <= (LshBitsTarget << b)).getOrElse(24)

  /** Dynamic-bits planes for corpus-wide pair generation ([[dynamicBits]]
    * tables the same [[hyperplanes]] Rademacher construction — a bits=4
    * corpus sees byte-identical planes to [[defaultPlanes]]).
    */
  private[graft] def dynamicPlanes(n: Long): Array[Array[Array[Double]]] =
    hyperplanes(NTables, dynamicBits(n), Dim)

  private def simAnnLsh(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val e = graft.Tables.embeddings(s, dir)
    val probes = e
      .filter(col("vec_id") < 100)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pvec"))
    val corpus = e.select(col("vec_id").as("cand_id"), col("embedding").as("cvec"))
    annTopK(probes, corpus, k = 10, planes = defaultPlanes)
      .orderBy("probe_id", "rn")
  }

  /** Full oracle for the ANN path: DuckDB regenerates the SAME Rademacher
    * planes from md5 parity, buckets every vector by the sign pattern of
    * ordered `list_dot_product` folds (bit-identical to the native
    * graft_dot kernel — ±1 components make every term exact in float and
    * double), joins (table, bucket) for candidates, and exactly re-ranks.
    * So bucketing, candidate generation, AND the re-rank all hash-check —
    * recall-vs-parameters stays a LshSpec concern, but the computed answer
    * is now a cross-engine contract.
    */
  /** Bucket-occupancy cap — the ANN family's hub cap (Modeling
    * .PairDegreeCap doc): a (table, bucket) cell holding more than this
    * many corpus vectors fans out occupancy² candidate work in one task
    * while contributing almost no signal (a cell that coarse ranks barely
    * above random), so overfull cells are dropped from candidate
    * generation on BOTH engines. Sign-LSH redundancy makes the recall cost
    * negligible: a true near pair agrees on most tables, so losing one
    * hot cell rarely loses the pair. Far above any fixture occupancy —
    * declared outputs unchanged; the binding case is the
    * planet-scale-corpus regime where `Bits` should also grow with
    * log(corpus) to keep cells informative.
    */
  private[ops] val BucketOccupancyCap = 100000L

  // component → plane → bucket → cap chain shared by the fixed-bits and
  // dynamic-bits mirrors (everything downstream of the comps CTE is
  // bits-agnostic)
  private def lshBucketsTailSql(cap: Long): String =
    "planes AS (SELECT tb, bit, list(w ORDER BY dim) AS plane FROM comps GROUP BY 1, 2), " +
      "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
      "dots AS (SELECT vec_id, tb, bit, list_dot_product(v, plane) AS dot FROM e CROSS JOIN planes), " +
      "b AS (SELECT vec_id, tb, CAST(sum(CASE WHEN dot >= 0 THEN 1 << bit ELSE 0 END) AS BIGINT) AS bucket " +
      "FROM dots GROUP BY 1, 2), " +
      s"okb AS (SELECT tb, bucket FROM b GROUP BY 1, 2 HAVING count(*) <= $cap)"

  private val compsSelect =
    "SELECT t.range AS tb, j.range AS bit, d.range AS dim, " +
      "CASE WHEN ('0x' || substr(md5('lshp#' || t.range || '#' || j.range || '#' || d.range), 1, 1))::INT % 2 = 0 " +
      "THEN 1.0 ELSE -1.0 END AS w "

  /** Shared CTE chain ending in `b(vec_id, tb, bucket)` plus
    * `okb(tb, bucket)` (the occupancy-capped cells) — the SQL mirror of
    * [[bucketize]] under [[hyperplanes]] at the fixed sim_ann_lsh
    * parameterization.
    */
  private[ops] val lshBucketsCteSql: String =
    s"comps AS ($compsSelect FROM range($NTables) t, range($Bits) j, range($Dim) d), " +
      lshBucketsTailSql(BucketOccupancyCap)

  /** Dynamic-bits mirror of the same chain for corpus-wide pair generation
    * (dedup_semantic): bit count = [[dynamicBits]] of the embeddings count,
    * computed by the `nbits` CTE with the identical integer comparison, and
    * a caller-chosen (tighter) occupancy cap. `range(24)` enumerates the
    * maximum bit budget; the `j.range < bits` filter selects the active
    * prefix — same planes, same packing as the Scala side. The coalesce
    * mirrors [[dynamicBits]]'s getOrElse(24) clamp: beyond
    * LshBitsTarget·2^24 rows no bit count satisfies the predicate and
    * min() would return NULL, silently emptying the comps CTE (r11 advice).
    */
  private[ops] def lshBucketsCteDynamicSql(cap: Long): String =
    s"nbits AS (SELECT coalesce(min(b.range), 24) AS bits FROM range(4, 25) b " +
      s"WHERE (SELECT count(*) FROM embeddings) <= $LshBitsTarget * (1 << b.range)), " +
      s"comps AS ($compsSelect FROM range($NTables) t, range(24) j, range($Dim) d " +
      "WHERE j.range < (SELECT bits FROM nbits)), " +
      lshBucketsTailSql(cap)

  private val simAnnLshSql =
    s"WITH $lshBucketsCteSql, " +
      "cand AS (SELECT DISTINCT pb.vec_id AS probe_id, cb.vec_id AS cand_id " +
      "FROM b pb JOIN b cb ON pb.tb = cb.tb AND pb.bucket = cb.bucket " +
      "JOIN okb ON okb.tb = cb.tb AND okb.bucket = cb.bucket " +
      "WHERE pb.vec_id < 100 AND pb.vec_id <> cb.vec_id), " +
      "r AS (SELECT probe_id, cand_id, round(list_dot_product(pe.v, ce.v), 4) AS sim " +
      "FROM cand JOIN e pe ON pe.vec_id = cand.probe_id JOIN e ce ON ce.vec_id = cand.cand_id), " +
      "rk AS (SELECT probe_id, cand_id, sim, " +
      "CAST(row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, cand_id) AS BIGINT) AS rn FROM r) " +
      "SELECT probe_id, cand_id, sim, rn FROM rk WHERE rn <= 10 ORDER BY probe_id, rn"

  val entries: Seq[graft.QueryDef] = Seq(
    graft.QueryDef("sim_ann_lsh", simAnnLsh, Some(simAnnLshSql))
  )
}
