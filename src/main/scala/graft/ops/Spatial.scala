package graft.ops

import graft.{QueryDef, Tables}
import graft.Qf._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-4 spatial verb (SURVEY.md §2.16): radius search via grid blocking —
  * the 2-D generalization of `join_range_binned`. A naive points-near-points
  * join is a cross product; the scalable shape snaps every point to an
  * r-sized grid cell, replicates each probe to its 3×3 cell neighborhood
  * (any point within radius r lies in one of those cells), equi-joins on the
  * cell id, and applies the exact distance residual. Join cost is
  * |probes|·9·(cell occupancy), never |probes|·|points|.
  *
  * The corpus has no coordinates [DATA], so points are synthesized from
  * md5(key) — the same seedless idiom as sample_hash_split — placing
  * customers and suppliers uniformly on a 1000×1000 plane. Determinism:
  * coordinates are identical doubles in both engines (52-bit hash fraction ×
  * constant), dist² = dx·dx + dy·dy is a FIXED-ORDER two-term sum, the
  * radius test compares identical doubles, and the reported distance rounds
  * to 4 decimals (hash-derived values sit on a rounding boundary with
  * probability ~0).
  */
object Spatial {

  private val Radius = 25.0

  private def coord(key: Column, seed: String): Column =
    hash52(seed, key).cast("double") / lit(Hash52Range) * 1000.0

  private def coordSql(keyExpr: String, seed: String): String =
    s"CAST(${hash52Sql(seed, keyExpr)} AS DOUBLE) / 4503599627370496.0 * 1000.0"

  /** Per supplier: how many customers lie within radius 25, and the nearest
    * such distance (NULL when the neighborhood is empty).
    */
  private def joinSpatialGrid(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables
      .customer(s, dir)
      .select(col("c_custkey"), coord(col("c_custkey"), "px#").as("cx"),
        coord(col("c_custkey"), "py#").as("cy"))
      .select(col("c_custkey"), col("cx"), col("cy"),
        floor(col("cx") / Radius).cast("long").as("gx"),
        floor(col("cy") / Radius).cast("long").as("gy"))
    val supp = Tables
      .supplier(s, dir)
      .select(col("s_suppkey"), coord(col("s_suppkey"), "qx#").as("sx"),
        coord(col("s_suppkey"), "qy#").as("sy"))
    val probes = supp
      .withColumn("dgx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("dgy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("s_suppkey"), col("sx"), col("sy"),
        (floor(col("sx") / Radius).cast("long") + col("dgx")).as("gx"),
        (floor(col("sy") / Radius).cast("long") + col("dgy")).as("gy"))
    val near = probes
      .join(cust, Seq("gx", "gy"))
      .withColumn(
        "d2",
        (col("sx") - col("cx")) * (col("sx") - col("cx")) +
          (col("sy") - col("cy")) * (col("sy") - col("cy")),
      )
      .filter(col("d2") <= Radius * Radius)
      .groupBy("s_suppkey")
      .agg(nrows.as("n_within"), min(round(sqrt(col("d2")), 4)).as("nearest_dist"))
    supp
      .join(near, Seq("s_suppkey"), "left")
      .select(
        col("s_suppkey"),
        coalesce(col("n_within"), lit(0L)).as("n_within"),
        col("nearest_dist"),
      )
      .orderBy("s_suppkey")
  }

  private val joinSpatialGridSql =
    "WITH cust AS (SELECT c_custkey, " +
      coordSql("c_custkey", "px#") + " AS cx, " + coordSql("c_custkey", "py#") + " AS cy " +
      "FROM customer), " +
      "custg AS (SELECT c_custkey, cx, cy, CAST(floor(cx / 25.0) AS BIGINT) AS gx, " +
      "CAST(floor(cy / 25.0) AS BIGINT) AS gy FROM cust), " +
      "supp AS (SELECT s_suppkey, " +
      coordSql("s_suppkey", "qx#") + " AS sx, " + coordSql("s_suppkey", "qy#") + " AS sy " +
      "FROM supplier), " +
      "probes AS (SELECT s_suppkey, sx, sy, CAST(floor(sx / 25.0) AS BIGINT) + dx.dx AS gx, " +
      "CAST(floor(sy / 25.0) AS BIGINT) + dy.dy AS gy " +
      "FROM supp, (VALUES (-1), (0), (1)) AS dx(dx), (VALUES (-1), (0), (1)) AS dy(dy)), " +
      "near AS (SELECT s_suppkey, count(*) AS n_within, min(round(sqrt(d2), 4)) AS nearest_dist " +
      "FROM (SELECT p.s_suppkey, (p.sx - c.cx) * (p.sx - c.cx) + (p.sy - c.cy) * (p.sy - c.cy) AS d2 " +
      "FROM probes p JOIN custg c USING (gx, gy)) q WHERE d2 <= 625.0 GROUP BY 1) " +
      "SELECT s.s_suppkey, coalesce(n.n_within, 0) AS n_within, n.nearest_dist " +
      "FROM supp s LEFT JOIN near n USING (s_suppkey) ORDER BY s_suppkey"

  val entries: Seq[QueryDef] = Seq(
    QueryDef("join_spatial_grid", joinSpatialGrid, Some(joinSpatialGridSql))
  )
}
