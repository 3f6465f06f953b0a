package graft.ops

import graft.{QueryDef, Tables}
import graft.Qf._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 batch 4 — warehouse-integrity & surface-completion verbs: the
  * referential-integrity audit every star schema needs, forecast-accuracy
  * evaluation (WAPE/MAE/bias) of the naive seasonal baseline, the
  * ratio-to-report window (share-of-total BI verb), null-safe join
  * semantics (<=> / IS NOT DISTINCT FROM), and the scalar bitwise pack.
  *
  * Scale doctrine, per op:
  *   - dq_referential_integrity: each FK check is one anti-join of the
  *     fact scan against the parent's key column (dimension-sized build
  *     side; at 100 TB the parent key set ships as a broadcast or bloom
  *     probe — the exact anti-join here IS Spark's runtime-filter shape).
  *     Output is |FKs| rows.
  *   - ts_forecast_eval_naive: span-bounded daily frames; lag + one
  *     |types|-row aggregate.
  *   - win_ratio_to_report: fact scan pre-aggregates to (type, brand)
  *     grain; the share window runs over |brands|-bounded partitions.
  *   - join_null_safe: side aggregates are |keys|-bounded before the
  *     null-safe full-outer join — the join never sees row grain.
  *   - fn_bitwise_pack: |nation|-row map-side projection.
  */
object Integrity {

  // ------------------------------------------------------------------
  // dq_referential_integrity — FK orphan audit across the star schema
  // ------------------------------------------------------------------

  /** Orphan audit of every foreign key in the star schema: per FK, total
    * child rows, orphans (child keys with no parent — the anti-join), and
    * null keys (which violate nothing but break joins silently). All exact
    * counts; the declared output is |FKs| = 4 rows, so the whole audit is
    * one pass over each fact scan regardless of scale.
    */
  private def dqReferentialIntegrity(s: SparkSession, dir: String): DataFrame = {
    def check(name: String, child: DataFrame, key: String, parent: DataFrame, pkey: String): DataFrame = {
      val total = child.agg(nrows.as("n_rows"), sum(col(key).isNull.cast("long")).as("n_null_keys"))
      val orphans = child
        .filter(col(key).isNotNull)
        .join(parent.select(col(pkey).as(key)), Seq(key), "left_anti")
        .agg(nrows.as("n_orphans"))
      total.crossJoin(orphans).select(lit(name).as("fk"), col("n_rows"), col("n_null_keys"), col("n_orphans"))
    }
    val o = Tables.orders(s, dir)
    val l = Tables.lineitem(s, dir)
    check("lineitem.l_orderkey->orders", l, "l_orderkey", o, "o_orderkey")
      .unionByName(check("lineitem.l_partkey->part", l, "l_partkey", Tables.part(s, dir), "p_partkey"))
      .unionByName(check("lineitem.l_suppkey->supplier", l, "l_suppkey", Tables.supplier(s, dir), "s_suppkey"))
      .unionByName(check("orders.o_custkey->customer", o, "o_custkey", Tables.customer(s, dir), "c_custkey"))
      .orderBy("fk")
  }

  private val dqReferentialIntegritySql = {
    def check(name: String, child: String, key: String, parent: String, pkey: String): String =
      s"SELECT '$name' AS fk, CAST(count(*) AS BIGINT) AS n_rows, " +
        s"CAST(sum(CASE WHEN $key IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_keys, " +
        s"CAST(sum(CASE WHEN $key IS NOT NULL AND $key NOT IN (SELECT $pkey FROM $parent) THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans " +
        s"FROM $child"
    check("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey") +
      " UNION ALL " + check("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey") +
      " UNION ALL " + check("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey") +
      " UNION ALL " + check("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey") +
      " ORDER BY fk"
  }

  // ------------------------------------------------------------------
  // ts_forecast_eval_naive — WAPE/MAE/bias of the naive seasonal forecast
  // ------------------------------------------------------------------

  /** Forecast-accuracy evaluation of the naive seasonal baseline
    * (prediction = the observation 7 steps earlier in the daily series) —
    * the yardstick every real forecaster must beat, and the standard
    * WAPE/MAE/bias reporting shape. Absolute-error sums are exact BIGINTs
    * (WAPE/MAE on the non-negative ppm grid via integer div); bias is
    * SIGNED, so it is reported as one rounded double division — signed
    * integer division diverges between Spark (truncates) and DuckDB
    * (floors).
    */
  private def tsForecastEvalNaive(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("day")
    Tables
      .events(s, dir)
      .groupBy(col("event_type"), to_date(col("etime")).as("day"))
      .agg(nrows.as("c"))
      .withColumn("pred", lag("c", 7).over(w))
      .filter(col("pred").isNotNull)
      .groupBy("event_type")
      .agg(
        nrows.as("n_days"),
        sum("c").as("actual_total"),
        sum(abs(col("c") - col("pred"))).as("abs_err"),
        sum(col("c") - col("pred")).as("err"),
      )
      .select(
        col("event_type"),
        col("n_days"),
        col("actual_total"),
        expr("abs_err * 1000000 div actual_total").as("wape_ppm"),
        expr("abs_err * 1000000 div n_days").as("mae_uday"),
        zround(round(col("err").cast("double") / col("actual_total").cast("double"), 6)).as("bias"),
      )
      .orderBy("event_type")
  }

  private val tsForecastEvalNaiveSql =
    "WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS c " +
      "FROM events GROUP BY 1, 2), " +
      "p AS (SELECT event_type, c, lag(c, 7) OVER (PARTITION BY event_type ORDER BY day) AS pred FROM daily), " +
      "m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days, CAST(sum(c) AS BIGINT) AS actual_total, " +
      "CAST(sum(abs(c - pred)) AS BIGINT) AS abs_err, CAST(sum(c - pred) AS BIGINT) AS err " +
      "FROM p WHERE pred IS NOT NULL GROUP BY 1) " +
      "SELECT event_type, n_days, actual_total, " +
      "CAST(abs_err * 1000000 // actual_total AS BIGINT) AS wape_ppm, " +
      "CAST(abs_err * 1000000 // n_days AS BIGINT) AS mae_uday, " +
      "CASE WHEN round(CAST(err AS DOUBLE) / CAST(actual_total AS DOUBLE), 6) = 0 THEN 0.0 " +
      "ELSE round(CAST(err AS DOUBLE) / CAST(actual_total AS DOUBLE), 6) END AS bias " +
      "FROM m ORDER BY event_type"

  // ------------------------------------------------------------------
  // win_ratio_to_report — share-of-total window (the BI staple)
  // ------------------------------------------------------------------

  /** Revenue share of each brand within its part type (the
    * ratio-to-report window function surface): revenue in exact cents,
    * share on the integer-ppm grid against the type window total.
    * The fact scan pre-aggregates to (type, brand) grain FIRST, so the
    * window runs over the |brands|-bounded frame, never row grain.
    * rev·10⁶ stays under int64 through ~sf10; past that the seam is one
    * DECIMAL(38) cast on the share numerator.
    */
  private def winRatioToReport(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("p_type")
    Tables
      .lineitem(s, dir)
      .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_type"), col("p_brand"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)")).as("rev_cents"))
      .withColumn("type_cents", sum("rev_cents").over(w))
      .select(
        col("p_type"),
        col("p_brand"),
        col("rev_cents"),
        expr("rev_cents * 1000000 div type_cents").as("share_ppm"),
      )
      .orderBy("p_type", "p_brand")
  }

  private val winRatioToReportSql =
    "WITH b AS (SELECT p_type, p_brand, " +
      "CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_cents " +
      "FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1, 2) " +
      "SELECT p_type, p_brand, rev_cents, " +
      "CAST(rev_cents * 1000000 // (sum(rev_cents) OVER (PARTITION BY p_type)) AS BIGINT) AS share_ppm " +
      "FROM b ORDER BY p_type, p_brand"

  // ------------------------------------------------------------------
  // join_null_safe — <=> / IS NOT DISTINCT FROM semantics
  // ------------------------------------------------------------------

  /** Null-safe join semantics surfaced as a declared op: both sides derive
    * a NULLABLE key (nation key masked to NULL for negative account
    * balances — deterministic), aggregate to |keys| grain, then full-outer
    * join with null-safe equality, so the NULL group MATCHES ITSELF
    * (Spark `<=>` ≡ DuckDB IS NOT DISTINCT FROM) instead of disappearing
    * as in plain equality. Pair counts are products of exact counts. The
    * join never sees row grain — both inputs are |keys|-bounded.
    */
  private def joinNullSafe(s: SparkSession, dir: String): DataFrame = {
    val ck = Tables
      .customer(s, dir)
      .select(when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_nationkey")).as("k"))
      .groupBy("k")
      .agg(nrows.as("n_cust"))
    val sk = Tables
      .supplier(s, dir)
      .select(when(col("s_acctbal") < 0, lit(null)).otherwise(col("s_nationkey")).as("k"))
      .groupBy("k")
      .agg(nrows.as("n_supp"))
    ck.join(sk.withColumnRenamed("k", "k2"), col("k") <=> col("k2"), "full_outer")
      .select(
        coalesce(col("k"), col("k2")).as("nation_key"),
        (col("k").isNull && col("k2").isNull).as("is_null_group"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"),
        (coalesce(col("n_cust"), lit(0L)) * coalesce(col("n_supp"), lit(0L))).as("n_pairs"),
      )
      .orderBy(col("nation_key").asc_nulls_first, col("is_null_group"))
  }

  private val joinNullSafeSql =
    "WITH ck AS (SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE c_nationkey END AS k, " +
      "CAST(count(*) AS BIGINT) AS n_cust FROM customer GROUP BY 1), " +
      "sk AS (SELECT CASE WHEN s_acctbal < 0 THEN NULL ELSE s_nationkey END AS k, " +
      "CAST(count(*) AS BIGINT) AS n_supp FROM supplier GROUP BY 1) " +
      "SELECT COALESCE(ck.k, sk.k) AS nation_key, " +
      "(ck.k IS NULL AND sk.k IS NULL) AS is_null_group, " +
      "COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp, " +
      "COALESCE(n_cust, 0) * COALESCE(n_supp, 0) AS n_pairs " +
      "FROM ck FULL OUTER JOIN sk ON ck.k IS NOT DISTINCT FROM sk.k " +
      "ORDER BY nation_key ASC NULLS FIRST, is_null_group"

  // ------------------------------------------------------------------
  // fn_bitwise_pack — scalar bitwise surface
  // ------------------------------------------------------------------

  /** The scalar bitwise-function pack (shift/pack/unpack/xor/and/or) over
    * the nation table: region and nation keys pack into one BIGINT via
    * shift-or, unpack via shift-and, and the xor/and/or samples pin the
    * operator semantics cross-engine. Pure map-side projection, 25 rows.
    */
  private def fnBitwisePack(s: SparkSession, dir: String): DataFrame =
    Tables
      .nation(s, dir)
      .select(
        col("n_nationkey"),
        expr("shiftleft(n_regionkey, 8) | n_nationkey").cast("long").as("packed"),
        expr("shiftright(shiftleft(n_regionkey, 8) | n_nationkey, 8)").cast("long").as("unpacked_region"),
        expr("(shiftleft(n_regionkey, 8) | n_nationkey) & 255").cast("long").as("unpacked_nation"),
        expr("n_nationkey ^ n_regionkey").cast("long").as("x_xor"),
        expr("n_nationkey & 3").cast("long").as("x_and"),
        expr("n_nationkey | 16").cast("long").as("x_or"),
      )
      .orderBy("n_nationkey")

  private val fnBitwisePackSql =
    "SELECT n_nationkey, " +
      "CAST((n_regionkey << 8) | n_nationkey AS BIGINT) AS packed, " +
      "CAST(((n_regionkey << 8) | n_nationkey) >> 8 AS BIGINT) AS unpacked_region, " +
      "CAST(((n_regionkey << 8) | n_nationkey) & 255 AS BIGINT) AS unpacked_nation, " +
      "CAST(xor(n_nationkey, n_regionkey) AS BIGINT) AS x_xor, " +
      "CAST(n_nationkey & 3 AS BIGINT) AS x_and, " +
      "CAST(n_nationkey | 16 AS BIGINT) AS x_or " +
      "FROM nation ORDER BY n_nationkey"

  val entries: Seq[QueryDef] = Seq(
    QueryDef("dq_referential_integrity", dqReferentialIntegrity, Some(dqReferentialIntegritySql)),
    QueryDef("ts_forecast_eval_naive", tsForecastEvalNaive, Some(tsForecastEvalNaiveSql)),
    QueryDef("win_ratio_to_report", winRatioToReport, Some(winRatioToReportSql)),
    QueryDef("join_null_safe", joinNullSafe, Some(joinNullSafeSql)),
    QueryDef("fn_bitwise_pack", fnBitwisePack, Some(fnBitwisePackSql)),
  )
}
