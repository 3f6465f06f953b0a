package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Engine-side independent cross-check for the graph keys whose sf1 DuckDB
  * oracles exceed the single-node oracle engine's resources (r10 verdict
  * "What's missing" #1: kcore / pagerank / shortest_hops / triangle_count
  * die in DuckDB temp-spill >77 GB at sf1 while the Spark side runs them
  * in seconds).
  *
  * For each key this main computes the DECLARED query (via
  * [[SparkEntry.queries]] — the exact plan the driver gates) AND a second,
  * structurally independent Spark formulation of the same artifact, then
  * compares the two frames EXACTLY (symmetric exceptAll). The point is
  * that a bug in the declared plan's join/aggregate structure would have
  * to be mirrored by a formulation built from different primitives to go
  * unnoticed — the cross-engine oracle's trust model, applied engine-side
  * where the oracle engine cannot follow. All four artifacts are pure
  * integer arithmetic, so the second formulation must match bit-exactly
  * (sums of the same integers in any order; no FP rounding to diverge).
  *
  * Independent formulations:
  *   - graph_pagerank: DRIVER-SIDE dense iteration over the collected
  *     edge list — plain Scala HashMaps, no Spark joins or aggregates at
  *     all, so no structural bug in the distributed join/aggregate shape
  *     can be mirrored (r11 advice: the previous transposed-gather
  *     formulation reused the declared key's edges⋈deg⋈ranks join shape
  *     with renamed columns, making its independence claim near-vacuous).
  *     The integer picorank grid makes the two evaluation orders exactly
  *     equal; collecting the edge list is fine for a dev check main
  *     (~6M pairs at sf1, a few hundred MB of driver heap).
  *   - graph_triangle_count: ID-ORDERED edge orientation (lower vec id →
  *     higher) instead of the declared degree-ordered orientation; a
  *     triangle is counted by exactly one wedge under either total order,
  *     so per-vertex counts agree though every intermediate differs.
  *   - graph_kcore: peel rounds recomputed with window-count degrees and
  *     anti-join pruning (drop-set) instead of groupBy degrees and
  *     left-semi keeps.
  *   - graph_shortest_hops: frontier BFS (distinct frontier sets, visited
  *     anti-join) instead of the declared min-relaxation rounds; with
  *     unit weights and matched round counts the distance maps coincide.
  *   - dedup_semantic / dedup_semantic_ivf: full verified edge set +
  *     neighbor-min label relaxation instead of per-block spanning forests
  *     + pointer jumping (see the per-method docs; the ivf alt also
  *     retrains centroids instead of reading the session cache).
  *   - decontaminate_semantic: distinct-pairs + stock HOF dot verify +
  *     plain count instead of map-side duplicate dots + codegen kernel +
  *     countDistinct.
  *
  * Usage: graft.CrossCheck <sfDir> [key1,key2,...]
  * Prints one PASS/FAIL line per key; exit 1 on any FAIL.
  */
object CrossCheck {

  private def copurchasePairs(s: SparkSession, dir: String): DataFrame = {
    val os = Tables
      .lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
      .distinct()
    os.select(col("ok"), col("p").as("s1"))
      .join(os.select(col("ok"), col("p").as("s2")), "ok")
      .filter(col("s1") < col("s2"))
      .groupBy("s1", "s2")
      .agg(count(lit(1)).as("sup"))
      .filter(col("sup") >= 2)
      .select("s1", "s2")
  }

  /** Driver-side dense pagerank: collect the bipartite edge list, iterate
    * the same integer picorank recurrence in plain Scala HashMaps. All
    * operands are positive, so Scala's truncating Long division equals
    * Spark's `div` exactly, and the contribution sums are integer sums —
    * order-independent, so the map iteration order cannot diverge.
    */
  private def pagerankLocal(s: SparkSession, dir: String): DataFrame = {
    val SuppOffset = 1000000000000L
    import s.implicits._
    val e0: Array[(Long, Long)] = Tables
      .lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").cast("long").as("c"), (col("l_suppkey") + SuppOffset).as("sp"))
      .distinct()
      .as[(Long, Long)]
      .collect()
    val edges: Array[(Long, Long)] = e0 ++ e0.map { case (c, sp) => (sp, c) }
    val deg = new scala.collection.mutable.HashMap[Long, Long]()
    edges.foreach { case (src, _) => deg.update(src, deg.getOrElse(src, 0L) + 1L) }
    val nodes = deg.keySet.toArray
    val n = nodes.length.toLong
    var pico = scala.collection.mutable.HashMap(nodes.map(_ -> 1000000000000L / n): _*)
    for (_ <- 1 to 3) {
      val m = new scala.collection.mutable.HashMap[Long, Long]()
      edges.foreach { case (src, dst) =>
        m.update(dst, m.getOrElse(dst, 0L) + pico(src) / deg(src))
      }
      val base = 150000000000L / n
      pico = scala.collection.mutable.HashMap(
        nodes.map(nd => nd -> (base + (17L * m.getOrElse(nd, 0L)) / 20L)): _*)
    }
    nodes.toSeq
      .map { nd =>
        val p = pico(nd)
        (nd, if (nd >= SuppOffset) "supplier" else "customer", p, p / 1e12)
      }
      .toDF("node", "node_type", "rank_pico", "rank")
  }

  /** Id-ordered triangle enumeration: orient every support-2 edge from its
    * lower part id, wedges from out-edges, probe the closing edge.
    */
  private def trianglesIdOrder(s: SparkSession, dir: String): DataFrame = {
    val pairs = copurchasePairs(s, dir) // s1 < s2 already: the orientation
    val deg = pairs
      .select(col("s1").as("node"))
      .unionByName(pairs.select(col("s2").as("node")))
      .groupBy("node")
      .agg(count(lit(1)).as("deg"))
    val wedges = pairs
      .select(col("s1").as("src"), col("s2").as("x"))
      .join(pairs.select(col("s1").as("src"), col("s2").as("y")), "src")
      .filter(col("x") < col("y"))
    val tri = wedges
      .join(pairs.select(col("s1").as("x"), col("s2").as("y")), Seq("x", "y"))
      .select(col("src").as("n1"), col("x").as("n2"), col("y").as("n3"))
    val tn = tri
      .select(explode(array(col("n1"), col("n2"), col("n3"))).as("node"))
      .groupBy("node")
      .agg(count(lit(1)).as("n_tri"))
    deg
      .join(tn, Seq("node"), "left")
      .select(
        col("node").as("partkey"),
        col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        round(
          when(
            col("deg") >= 2,
            (coalesce(col("n_tri"), lit(0L)) * 2).cast("double") / (col("deg") * (col("deg") - 1)),
          ).otherwise(0.0),
          4,
        ).as("clustering"),
      )
  }

  /** Window-degree, anti-join-pruned 3-round peel of the same k=3 core. */
  private def kcoreAntiJoin(s: SparkSession, dir: String): DataFrame = {
    val pairs = copurchasePairs(s, dir)
    var e = pairs
      .select(col("s1").as("u"), col("s2").as("v"))
      .unionByName(pairs.select(col("s2").as("u"), col("s1").as("v")))
      .localCheckpoint(false)
    for (r <- 1 to 3) {
      val degW = Window.partitionBy("u")
      val drop = e
        .withColumn("deg", count(lit(1)).over(degW))
        .filter(col("deg") < 3)
        .select("u")
        .distinct()
      val pruned = e
        .join(drop, Seq("u"), "left_anti")
        .join(drop.select(col("u").as("v")), Seq("v"), "left_anti")
        .select("u", "v")
      e = if (r < 3) pruned.localCheckpoint(false) else pruned
    }
    e.groupBy("u").agg(count(lit(1)).as("deg")).select(col("u").as("node"), col("deg"))
  }

  /** Frontier BFS to 3 levels over the same graph/seed definition. */
  private def hopsFrontierBfs(s: SparkSession, dir: String): DataFrame = {
    val pairs = copurchasePairs(s, dir)
    val edges = pairs
      .select(col("s1").as("src"), col("s2").as("dst"))
      .unionByName(pairs.select(col("s2").as("src"), col("s1").as("dst")))
      .localCheckpoint(false)
    val nodes = edges.select(col("dst").as("node")).distinct()
    val seeds = Tables.part(s, dir).filter(col("p_size") === 1).select(col("p_partkey").as("node"))
    var frontier = nodes.join(seeds, Seq("node"), "left_semi").localCheckpoint(false)
    var visited = frontier.withColumn("dist", lit(0L)).localCheckpoint(false)
    for (level <- 1 to 3) {
      val next = edges
        .join(frontier.select(col("node").as("src")), Seq("src"), "left_semi")
        .select(col("dst").as("node"))
        .distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .localCheckpoint(false)
      visited = visited.unionByName(next.withColumn("dist", lit(level.toLong))).localCheckpoint(false)
      frontier = next
    }
    val dist = nodes
      .join(visited, Seq("node"), "left")
      .select(col("node"), coalesce(col("dist"), lit(99L)).as("dist"))
    dist
      .groupBy(col("dist").as("hops"))
      .agg(count(lit(1)).as("n_parts"), min("node").as("min_part"), max("node").as("max_part"))
  }

  /** Independent dedup_semantic manifest (r11): the declared plan builds
    * per-block spanning FORESTS inside flatMapGroups union-find and feeds
    * them to the checkpointed pointer-jumping label loop. This formulation
    * shares neither primitive: it materializes the FULL verified edge set
    * (hybridSemanticPairsOf — the window-join + exact-dot path, every
    * same-block pair dotted, no union-find), then converges components by
    * plain per-round neighbor-min label relaxation (no pointer jumping) —
    * diameter-bounded, fine for dup clusters (dense, diameter ≤ ~3). A
    * forest that dropped a connecting edge, or a jump that skipped a
    * label, would disagree here.
    */
  private def semanticFullEdgeLabels(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val e0 = ops.SemDedup.hybridSemanticPairsOf(e.select(col("vec_id"), col("embedding")))
    relaxToManifest(e.select(col("vec_id")), e0)
  }

  /** Per-round neighbor-min label relaxation over an explicit edge set →
    * the (vec_id, cluster_id, kept) manifest contract — the non-forest,
    * non-pointer-jumping clustering machinery shared by the semantic-family
    * alts (factored r14 when dedup_semantic_ivf joined the check set).
    */
  private def relaxToManifest(ids: DataFrame, e0: DataFrame): DataFrame = {
    val edges = e0
      .select(col("id_a").as("a"), col("id_b").as("b"))
      .unionByName(e0.select(col("id_b").as("a"), col("id_a").as("b")))
      .persist()
    var labels = ids.select(col("vec_id").as("node"), col("vec_id").as("lab"))
    var moved = 1L
    var rounds = 0
    while (moved > 0 && rounds < 30) {
      val nbrMin = edges
        .join(labels.select(col("node").as("b"), col("lab").as("nl")), "b")
        .groupBy(col("a").as("node"))
        .agg(min("nl").as("nbl"))
      val next = labels
        .join(nbrMin, Seq("node"), "left")
        .select(col("node"), least(col("lab"), coalesce(col("nbl"), col("lab"))).as("lab"))
        .transform(ops.Checkpoints.stable(_))
      moved = next
        .join(labels.select(col("node"), col("lab").as("old")), "node")
        .filter(col("lab") =!= col("old"))
        .count()
      labels = next
      rounds += 1
    }
    edges.unpersist()
    labels
      .select(
        col("node").as("vec_id"),
        col("lab").as("cluster_id"),
        (col("node") === col("lab")).as("kept"),
      )
      .orderBy("vec_id")
  }

  /** Independent dedup_semantic_ivf manifest (r14, r13 verdict #6): the
    * declared plan reduces each cell block to a SPANNING FOREST inside
    * flatMapGroups union-find (ivfForestPairsOf, session-cached centroids)
    * and clusters via checkpointed pointer jumping. This formulation keeps
    * the candidate CONTRACT (the multi-probe dynamic-K cell manifest) but
    * shares none of that machinery: the FULL verified edge set from the
    * relational cells self-join (ivfSemanticPairsOf — every same-cell pair
    * exact-dotted, no union-find, centroids RETRAINED rather than served
    * from the session cache, so the cache's identical-cold-or-warm claim is
    * exercised too), then plain neighbor-min relaxation.
    */
  private def semanticIvfFullEdgeLabels(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val e0 = ops.SemDedup.ivfSemanticPairsOf(e.select(col("vec_id"), col("embedding")))
    relaxToManifest(e.select(col("vec_id")), e0)
  }

  /** Independent decontaminate_semantic verify+aggregate (r14, r13 verdict
    * #6): consumes the declared plan's candidate stream (the contract —
    * corpus-trained cell routes ∪ capped LSH collisions) but swaps every
    * piece of machinery after it: candidates are DISTINCT'd first (the
    * declared plan dots duplicates map-side and counts distinct at the
    * aggregate), the exact dot is the stock zip_with/aggregate HOF fold
    * (no graft codegen kernel — same left-to-right double fold, so the
    * ≥ threshold test must agree bit-exactly), joins carry no broadcast
    * hints, and the aggregate is a plain count over the deduped pairs.
    * A kernel/HOF dot divergence, a broadcast-join row loss, or a
    * countDistinct-vs-distinct mismatch would all surface here.
    */
  private def deconHofVerify(s: SparkSession, dir: String): DataFrame = {
    val (corpus, evalSet, cand) = ops.SemDedup.decontaminateCandidates(s, dir)
    cand
      .distinct()
      .join(corpus.select(col("vec_id"), col("embedding").as("cvec")), "vec_id")
      .join(evalSet.select(col("vec_id").as("eval_id"), col("embedding").as("evec")), "eval_id")
      .withColumn(
        "dot",
        expr(
          "aggregate(zip_with(cvec, evec, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
            "0D, (acc, x) -> acc + x)"),
      )
      .filter(col("dot") >= ops.SemDedup.SemThreshold)
      .groupBy("vec_id")
      .agg(
        count(lit(1)).as("n_eval_matches"),
        round(max(col("dot")), 4).as("max_sim"),
      )
      .orderBy("vec_id")
  }

  private def frameDiff(a: DataFrame, b: DataFrame): (Long, Long, Long) = {
    val cols = a.columns.sorted.map(col)
    val an = a.select(cols: _*)
    val bn = b.select(cols: _*)
    (an.count(), an.exceptAll(bn).count(), bn.exceptAll(an).count())
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val only: Option[Set[String]] =
      if (args.length > 1) Some(args(1).split(',').toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // per-check nonempty-input probe (r14 ADVICE): the graph checks run on
    // the co-purchase edge stream, the semantic family on embeddings — a
    // vacuous both-empty agreement must be vouched for by ITS OWN input,
    // not by an unrelated table's row count.
    val graphProbe: (SparkSession, String) => Long =
      (sp, d) => copurchasePairs(sp, d).count()
    val embProbe: (SparkSession, String) => Long =
      (sp, d) => Tables.embeddings(sp, d).count()
    val checks: Seq[(String, (SparkSession, String) => DataFrame, (SparkSession, String) => Long)] = Seq(
      ("graph_pagerank", pagerankLocal _, graphProbe),
      ("graph_triangle_count", trianglesIdOrder _, graphProbe),
      ("graph_kcore", kcoreAntiJoin _, graphProbe),
      ("graph_shortest_hops", hopsFrontierBfs _, graphProbe),
      ("dedup_semantic", semanticFullEdgeLabels _, embProbe),
      ("dedup_semantic_ivf", semanticIvfFullEdgeLabels _, embProbe),
      ("decontaminate_semantic", deconHofVerify _, embProbe),
    )
    var failed = false
    checks
      .filter { case (name, _, _) => only.forall(_.contains(name)) }
      .foreach { case (name, alt, probe) =>
        val t0 = System.nanoTime()
        val declared = SparkEntry.queries(name)(spark, sfDir)
        val (n, aNotB, bNotA) = frameDiff(declared, alt(spark, sfDir))
        val secs = (System.nanoTime() - t0) / 1e9
        // An empty result both ways is a real agreement (graph_kcore's
        // 3-round k=3 core IS empty at sf1: support-2 co-purchase edges
        // thin out as parts² outgrows orders) — but only counts as
        // evidence if THIS check's input was nonempty, so the pipelines
        // demonstrably ran on real data rather than an empty scan.
        val inputEdges =
          if (n == 0) probe(spark, sfDir) else -1L
        val ok = aNotB == 0 && bNotA == 0 && (n > 0 || inputEdges > 0)
        if (!ok) failed = true
        val tag =
          if (n == 0 && ok) s"PASS (both empty; input edges=$inputEdges)"
          else if (ok) "PASS"
          else "FAIL"
        println(
          f"[crosscheck] $name%-22s $tag rows=$n declared-only=$aNotB alt-only=$bNotA (${secs}%.1f s)"
        )
      }
    spark.stop()
    if (failed) sys.exit(1)
  }
}
