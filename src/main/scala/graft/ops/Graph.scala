package graft.ops

import graft.{QueryDef, Tables}
import graft.Qf._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-4 graph verbs (SURVEY.md §2.16): damped PageRank over the
  * customer–supplier transaction graph — the canonical ITERATIVE
  * join-aggregate workload, complementing `dedup_clusters` (the other
  * fixpoint op in the catalog) with weighted-importance semantics.
  *
  * Scale doctrine: each iteration is one join of the edge list with the
  * |V|-row rank frame on `src` plus one aggregate on `dst` — contributions
  * partial-sum map-side, so the exchange carries at most |V| rows of
  * (node, decimal) per iteration no matter how many edges a node has. The
  * edge list is partitioned by `src` once and every iteration reuses that
  * partitioning. The declared query unrolls THREE iterations into one
  * static plan (lineage stays bounded); an open-ended fixpoint would add
  * `localCheckpoint` truncation per round exactly like
  * MinHashDedup.clusters.
  *
  * The unrolled plan references the edge subplan ~10×, but AQE's runtime
  * stage reuse collapses every duplicate: measured at sf0.01, the whole
  * 3-iteration query runs 9 stages and reads exactly |lineitem| + |orders|
  * input records — one scan each (pinned in GraphSpec).
  */
object Graph {

  /** Supplier node ids are offset into their own range so the two key
    * spaces cannot collide. 1e12: custkeys grow ~1.5e5 per SF unit, so a
    * collision would need SF ≈ 6.6M — safely past any conceivable corpus —
    * while supplier ids stay far inside BIGINT.
    */
  private val SuppOffset = 1000000000000L

  /** Cross-engine determinism: ranks live on an exact integer PICORANK grid
    * (1 pico = 1e-12 of total mass; initial mass = 1e12). The entire
    * iteration is integer arithmetic — contributions are `rank div deg`,
    * the damping factor 0.85 is `×17 div 20`, the teleport term is
    * `0.15e12 div n` — so there is NO floating point anywhere until the
    * display column, and no rounding tie for the engines to break
    * differently (the first formulation rounded doubles to a 12-decimal
    * grid and 0.85×grid lands exactly on half-grid ties ~1/20th of the
    * time). Floors shed ≤ deg units per node per round: bounded mass leak,
    * asserted in GraphSpec. 17·1e12 < 2^63, so the BIGINT path never
    * overflows.
    */
  private def pagerank(s: SparkSession, dir: String): DataFrame = {
    val e0 = Tables
      .lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), (col("l_suppkey") + SuppOffset).as("sp"))
      .distinct()
    val edges = e0
      .select(col("c").as("src"), col("sp").as("dst"))
      .unionByName(e0.select(col("sp").as("src"), col("c").as("dst")))
    val deg = edges.groupBy("src").agg(nrows.as("deg"))
    val nodes = edges.select(col("src").as("node")).distinct()
    val nn = nodes.agg(nrows.as("n"))
    var ranks = nodes
      .crossJoin(broadcast(nn))
      .select(col("node"), expr("1000000000000 div n").as("pico"), col("n"))
    for (_ <- 1 to 3) {
      val contrib = edges
        .join(deg, "src")
        .join(ranks.select(col("node").as("src"), col("pico")), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(expr("pico div deg")).as("m"))
      ranks = ranks
        .select("node", "n")
        .join(contrib, Seq("node"), "left")
        .select(
          col("node"),
          (expr("150000000000 div n") + expr("(17 * coalesce(m, 0)) div 20")).as("pico"),
          col("n"),
        )
    }
    ranks
      .select(
        col("node"),
        when(col("node") >= SuppOffset, "supplier").otherwise("customer").as("node_type"),
        col("pico").as("rank_pico"),
        (col("pico") / lit(1e12)).as("rank"),
      )
      .orderBy("node")
  }

  private val pagerankSql = {
    def iter(prev: String, out: String): String =
      s"c$out AS (SELECT e.dst AS node, sum(r.pico // d.deg) AS m " +
        s"FROM edges e JOIN $prev r ON e.src = r.node JOIN deg d ON e.src = d.src GROUP BY 1), " +
        s"$out AS (SELECT p.node, " +
        s"(150000000000 // p.n) + ((17 * coalesce(c$out.m, 0)) // 20) AS pico, p.n " +
        s"FROM $prev p LEFT JOIN c$out ON p.node = c$out.node)"
    "WITH e0 AS (SELECT DISTINCT o_custkey AS c, l_suppkey + 1000000000000 AS sp " +
      "FROM lineitem JOIN orders ON l_orderkey = o_orderkey), " +
      "edges AS (SELECT c AS src, sp AS dst FROM e0 UNION ALL SELECT sp, c FROM e0), " +
      "deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1), " +
      "nodes AS (SELECT DISTINCT src AS node FROM edges), " +
      "nn AS (SELECT count(*) AS n FROM nodes), " +
      "r0 AS (SELECT node, 1000000000000 // n AS pico, n FROM nodes, nn), " +
      iter("r0", "r1") + ", " + iter("r1", "r2") + ", " + iter("r2", "r3") + " " +
      "SELECT node, CASE WHEN node >= 1000000000000 THEN 'supplier' ELSE 'customer' END AS node_type, " +
      "CAST(pico AS BIGINT) AS rank_pico, CAST(pico AS DOUBLE) / 1e12 AS rank " +
      "FROM r3 ORDER BY node"
  }

  val entries: Seq[QueryDef] = Seq(
    QueryDef("graph_pagerank", pagerank, Some(pagerankSql))
  )
}
