package graft.ops

import graft.{QueryDef, Tables}
import graft.Qf._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational core: scans, projection/filter, joins, aggregation, windows,
  * sort/limit/set ops (SURVEY.md §2.1–2.6 P0 rows).
  *
  * Determinism contract for every declared query (SURVEY.md §2.0): total
  * ordering on output, exact-decimal routing for double sums (Qf.dsum),
  * BIGINT for computed integers, no nondeterministic functions.
  *
  * Scale notes are given per query: the gate runs sf0.01 on local[32], but
  * each plan is written for the 100 TB / 1000-executor shape — broadcast the
  * dimension sides, let partial aggregation shrink shuffles, keep filters and
  * projections at the parquet scan.
  */
object Relational {

  // ---------------------------------------------------------------- scans

  /** Full scan of the smallest dim, stable order. Exercises schema-on-read. */
  private def scanParquet(s: SparkSession, dir: String): DataFrame =
    Tables.region(s, dir).orderBy("r_regionkey")

  /** Projection + selective filter; Catalyst pushes both into the parquet
    * scan (PushedFilters + 4-column ReadSchema), which at 100 TB is the
    * difference between reading 4 columns of some row groups and the table.
    */
  private def scanPushdown(s: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(s, dir)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .filter(col("l_quantity") > 45)
      .orderBy("l_orderkey", "l_linenumber")

  // ------------------------------------------------- projection / row ops

  /** Glue ApplyMapping/SelectFields/RenameField equivalent: choose, rename,
    * retype in one narrow projection (no shuffle).
    *
    * The retype is demonstrated via decimal(12,2) but the *declared* column is
    * cast back to double: the driver's hasher canonicalizes DECIMAL
    * differently from DuckDB's (round-1 red row was byte-identical values),
    * so DECIMAL stays out of declared output schemas — same discipline as
    * Qf.dsum (exact decimal inside, double out).
    */
  private def projSelectRenameCast(s: SparkSession, dir: String): DataFrame =
    Tables
      .customer(s, dir)
      .select(
        col("c_custkey").as("custkey"),
        col("c_name").as("name"),
        col("c_acctbal").cast("decimal(12,2)").cast("double").as("acctbal"),
        col("c_nationkey").cast("long").as("nationkey"),
      )
      .orderBy("custkey")

  /** Compound predicate: AND, IN, BETWEEN, NOT LIKE — all pushdown-eligible. */
  private def filterPred(s: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(s, dir)
      .filter(
        col("l_quantity") > 30 &&
          col("l_returnflag").isin("A", "R") &&
          col("l_shipdate").between("1994-01-01", "1996-12-31") &&
          !col("l_linestatus").like("O%")
      )
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_linestatus", "l_shipdate")
      .orderBy("l_orderkey", "l_linenumber")

  /** Null-safe filtering: inject nulls with nullif, filter IS NOT NULL, and
    * demonstrate null-safe equality (<=> / IS NOT DISTINCT FROM).
    */
  private def filterNulls(s: SparkSession, dir: String): DataFrame =
    Tables
      .orders(s, dir)
      .select(
        col("o_orderkey"),
        expr("nullif(o_orderstatus, 'O')").as("st"),
        col("o_totalprice"),
      )
      .filter(col("st").isNotNull)
      .withColumn("is_f", col("st") <=> lit("F"))
      .orderBy("o_orderkey")

  /** Full-row distinct of a projection (shuffle on all projected cols; at
    * scale this is a partial-dedup map side then one exchange).
    */
  private def distinctRows(s: SparkSession, dir: String): DataFrame =
    Tables
      .orders(s, dir)
      .select("o_orderstatus", "o_orderpriority")
      .distinct()
      .orderBy("o_orderstatus", "o_orderpriority")

  /** CASE WHEN / coalesce / nullif / least / greatest. Scalar FP is safe
    * cross-engine (same input doubles + same expression → identical IEEE
    * result); only aggregation order is not.
    */
  private def conditionalExpr(s: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(s, dir)
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        when(col("l_quantity") > 40, "high")
          .when(col("l_quantity") > 20, "mid")
          .otherwise("low")
          .as("qty_band"),
        coalesce(expr("nullif(l_returnflag, 'N')"), lit("none")).as("flag_or_none"),
        least(col("l_extendedprice"), col("l_quantity") * 1000).as("least_val"),
        greatest(col("l_tax"), col("l_discount")).as("greatest_rate"),
      )
      .orderBy("l_orderkey", "l_linenumber")

  // ---------------------------------------------------------------- joins

  /** Fact ⋈ dim. No broadcast() hint: customer SCALES with SF (unlike
    * nation/region), and a forced hint overrides AQE's size threshold
    * unconditionally — at 100 TB that's an executor OOM. AQE broadcasts it
    * anyway while it fits and falls back to shuffle join when it doesn't.
    */
  private def joinInnerBroadcast(s: SparkSession, dir: String): DataFrame =
    Tables
      .orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_name", "o_totalprice", "c_mktsegment")
      .orderBy("o_orderkey")

  /** TPC-H-Q5-shaped star join: fact chained through 4 dims, then a grouped
    * revenue rollup. Broadcast hints ONLY on the fixed-cardinality dims
    * (nation=25, region=5 at every SF); customer scales with SF so AQE
    * decides its strategy at runtime. Partial aggregation then shrinks the
    * final group-by exchange to |groups| rows per task.
    */
  private def joinMultiwayStar(s: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        nrows.as("n_rows"),
      )
      .orderBy("r_name", "n_name")

  /** Left outer join preserving customers with zero orders; count(o_orderkey)
    * counts only matches, sum of an empty group is NULL — both mirrored in SQL.
    */
  private def joinLeftOuter(s: SparkSession, dir: String): DataFrame =
    Tables
      .customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        dsum(col("o_totalprice"), 2).as("sum_spent"),
      )
      .orderBy("c_custkey")

  /** EXISTS via left-semi: no payload from the probe side ever shuffles. */
  private def joinSemi(s: SparkSession, dir: String): DataFrame =
    Tables
      .customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** NOT EXISTS via left-anti. */
  private def joinAnti(s: SparkSession, dir: String): DataFrame =
    Tables
      .customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  // --------------------------------------------------------- aggregations

  /** Table-wide aggregates in one pass (single partial→final exchange of one
    * row per task).
    */
  private def aggGlobal(s: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(s, dir)
      .agg(
        nrows.as("n_rows"),
        dsum(col("l_quantity"), 2).as("sum_qty"),
        (dsum(col("l_quantity"), 2) / nrows).as("avg_qty"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"),
        countDistinct(col("l_suppkey")).as("n_supp"),
      )

  /** TPC-H Q1: the flagship pricing summary. Filter reaches the scan; the
    * group-by has 4-ish groups so partial agg collapses the shuffle to a few
    * rows per task regardless of input scale.
    */
  private def aggGroupbyPricing(s: SparkSession, dir: String): DataFrame = {
    val disc  = lit(1.0) - col("l_discount")
    val chrg  = disc * (lit(1.0) + col("l_tax"))
    Tables
      .lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity"), 2).as("sum_qty"),
        dsum(col("l_extendedprice"), 2).as("sum_base_price"),
        // cents-rounded before the double cast (dsumCents scaladoc): at sf1
        // the scale-6 charge sum's unscaled value passes 2^53 and the
        // plain decimal→double cast came back 1 ULP apart across engines
        dsumCents(col("l_extendedprice") * disc).as("sum_disc_price"),
        // scale 6, not 4: the true value of price*(1-disc)*(1+tax) has six
        // decimal digits (2+2+2). A scale-4 cast would actually round, and
        // near-tie doubles round differently across engines; at scale >= the
        // true precision the cast is exact and so is the sum.
        dsumCents(col("l_extendedprice") * chrg, 6).as("sum_charge"),
        (dsum(col("l_quantity"), 2) / nrows).as("avg_qty"),
        (dsum(col("l_extendedprice"), 2) / nrows).as("avg_price"),
        (dsum(col("l_discount")) / nrows).as("avg_disc"),
        nrows.as("count_order"),
      )
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** count(DISTINCT x), count(DISTINCT y) and plain count in one aggregate
    * (Catalyst plans the Expand-based multi-distinct).
    */
  private def aggDistinctCount(s: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supp"),
        nrows.as("n_rows"),
      )
      .orderBy("l_returnflag")

  /** HAVING: filter on aggregate output. */
  private def aggHaving(s: SparkSession, dir: String): DataFrame =
    Tables
      .orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(nrows.as("n_orders"), dsum(col("o_totalprice"), 2).as("total_spent"))
      .filter(col("n_orders") >= 5)
      .orderBy("o_custkey")

  // ------------------------------------------- multi-level aggregations

  /** ROLLUP subtotal hierarchy. grouping() flags are part of the declared
    * output (cast long — Spark emits TINYINT, DuckDB BIGINT) and lead the
    * ordering so subtotal rows with NULL keys sort identically on both
    * engines (NULLS FIRST pinned explicitly).
    */
  private def aggRollup(s: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping(col("l_returnflag")).cast("long").as("g_flag"),
        grouping(col("l_linestatus")).cast("long").as("g_status"),
        dsum(col("l_quantity"), 2).as("sum_qty"),
        nrows.as("n_rows"),
      )
      .orderBy(
        col("g_flag"),
        col("g_status"),
        col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first,
      )

  /** CUBE: all subtotal combinations (adds the status-only slice ROLLUP lacks). */
  private def aggCube(s: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(s, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping(col("l_returnflag")).cast("long").as("g_flag"),
        grouping(col("l_linestatus")).cast("long").as("g_status"),
        dsum(col("l_quantity"), 2).as("sum_qty"),
        nrows.as("n_rows"),
      )
      .orderBy(
        col("g_flag"),
        col("g_status"),
        col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first,
      )

  /** Explicit GROUPING SETS incl. the grand total (Dataset.groupingSets, 4.x). */
  private def aggGroupingSets(s: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(s, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"),
        col("l_linestatus"),
      )
      .agg(
        grouping(col("l_returnflag")).cast("long").as("g_flag"),
        grouping(col("l_linestatus")).cast("long").as("g_status"),
        dsum(col("l_extendedprice"), 2).as("sum_price"),
        nrows.as("n_rows"),
      )
      .orderBy(
        col("g_flag"),
        col("g_status"),
        col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first,
      )

  /** Per-group ordered value list: collect_list is unordered by contract, so
    * sort_array inside the projection is what makes it declarable (§2.0
    * rule 4). Routes through ObjectHashAggregate. The declared output is the
    * comma-joined string — array columns crash the driver's pandas hasher
    * (§2.0 rule 7); the array form stays covered by scalatest.
    */
  private def aggCollectSorted(s: SparkSession, dir: String): DataFrame =
    Tables
      .orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(concat_ws(",", sort_array(collect_list(col("o_orderstatus")))).as("statuses"))
      .orderBy("o_custkey")

  /** Sample stats pack. These are merge-based aggregates whose low bits
    * depend on association order — round(4) absorbs the cross-engine ULP
    * noise (values here are O(1e2..1e5), 4 decimals is ~1e-9 relative).
    */
  private def aggStats(s: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(stddev_samp(col("l_extendedprice")), 4).as("sd_price"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        zround(round(corr(col("l_quantity"), col("l_extendedprice")), 4)).as("corr_qp"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("cov_qp"),
      )
      .orderBy("l_returnflag")

  /** Exact interpolating percentiles (Spark `percentile` ≡ DuckDB
    * `quantile_cont` — both linear-interpolate between adjacent ranks).
    */
  private def aggPercentileExact(s: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90"),
        nrows.as("n_rows"),
      )
      .orderBy("l_returnflag")

  // -------------------------------------------------------------- windows

  /** row_number / rank / dense_rank with a total tiebreak (SURVEY §2.5). */
  private def winRankDenseRow(s: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    Tables
      .lineitem(s, dir)
      .select(
        col("l_returnflag"),
        col("l_orderkey"),
        col("l_linenumber"),
        col("l_extendedprice"),
        asLong(row_number().over(w)).as("rn"),
        asLong(rank().over(w)).as("rk"),
        asLong(dense_rank().over(w)).as("drk"),
      )
      .orderBy("l_returnflag", "rn")
  }

  /** Top-3 orders per customer: the window shuffles once on the partition
    * key; the rank filter then drops ~all rows before any further exchange.
    */
  private def winTopkPerGroup(s: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables
      .orders(s, dir)
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        col("o_totalprice"),
        asLong(row_number().over(w)).as("rn"),
      )
      .filter(col("rn") <= 3)
      .orderBy("o_custkey", "rn")
  }

  /** Cumulative spend per customer over order date. The running sum goes
    * through exact decimal so frame-accumulation order (incremental vs
    * segment-tree across engines) cannot change the value.
    */
  private def winRunningSum(s: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables
      .orders(s, dir)
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        col("o_orderdate"),
        col("o_totalprice"),
        sum(col("o_totalprice").cast("decimal(28,2)")).over(w).cast("double").as("running_spent"),
      )
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  /** ntile / percent_rank / cume_dist per market segment. The rank ratios
    * are exact small-int divisions — bit-identical across engines, no
    * rounding needed. r7: computed through ScaleRank (range-split rank +
    * broadcast offsets) — a segment is |customers|/5 rows, so the per-
    * segment window task was the same single-task sort the win_pareto_share
    * fix removed. Under the strict (c_acctbal, c_custkey) order rank ≡
    * row_number, so percent_rank = (rn−1)/(n−1) (0 when n = 1, both
    * engines' convention) and cume_dist = rn/n, exactly the window
    * functions' values.
    */
  private def winNtilePct(s: SparkSession, dir: String): DataFrame = {
    val base = Tables
      .customer(s, dir)
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"))
    ScaleRank
      .rankedFrame(base, Seq("c_mktsegment"), Seq(col("c_acctbal"), col("c_custkey")), None)
      .select(
        col("c_mktsegment"),
        col("c_custkey"),
        col("c_acctbal"),
        ScaleRank.ntileOf(4).as("quartile"),
        when(col("__seg_n") === 1, lit(0.0))
          .otherwise((col("__rn") - 1).cast("double") / (col("__seg_n") - 1).cast("double"))
          .as("pct_rank"),
        (col("__rn").cast("double") / col("__seg_n").cast("double")).as("cume"),
      )
      .orderBy("c_mktsegment", "c_custkey")
  }

  /** first/last value over an explicit bounded frame (±1 row neighborhood). */
  private def winFirstLastFrame(s: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(-1, 1)
    Tables
      .orders(s, dir)
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        col("o_orderdate"),
        first(col("o_orderkey")).over(w).as("prev_key"),
        last(col("o_orderkey")).over(w).as("next_key"),
      )
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  // ------------------------------------------------------ remaining joins

  /** Full outer on deliberately-divergent subsets (high-balance customers vs
    * big-spender order groups) so both unmatched sides are non-empty;
    * coalesce(keys) gives the total-orderable output key.
    */
  private def joinFullOuter(s: SparkSession, dir: String): DataFrame = {
    val a = Tables
      .customer(s, dir)
      .filter(col("c_acctbal") > 5000)
      .select(col("c_custkey").as("a_key"), col("c_acctbal"))
    val b = Tables
      .orders(s, dir)
      .filter(col("o_totalprice") > 100000)
      .groupBy(col("o_custkey"))
      .agg(nrows.as("n_big_orders"))
    a.join(b, col("a_key") === col("o_custkey"), "full_outer")
      .select(
        coalesce(col("a_key"), col("o_custkey")).as("custkey"),
        col("c_acctbal"),
        col("n_big_orders"),
      )
      .orderBy("custkey")
  }

  /** Bounded cross join: 5×25 dim product (cardinality is static at every
    * SF — the one case where a cartesian is scale-safe).
    */
  private def joinCrossBounded(s: SparkSession, dir: String): DataFrame =
    Tables
      .region(s, dir)
      .crossJoin(Tables.nation(s, dir))
      .select("r_regionkey", "r_name", "n_nationkey", "n_name")
      .orderBy("r_regionkey", "n_nationkey")

  /** Equi-join + range residual (theta): ship date within 90 days of the
    * order date. The equi key drives the physical join; the interval
    * predicate evaluates as a post-join filter — no cartesian.
    */
  private def joinThetaRange(s: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(s, dir)
      .join(
        Tables.orders(s, dir),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate").between(col("o_orderdate"), col("o_orderdate") + expr("INTERVAL 90 DAYS")),
      )
      .groupBy(col("o_orderpriority"))
      .agg(nrows.as("n_rows"), dsum(col("l_extendedprice"), 2).as("sum_price"))
      .orderBy("o_orderpriority")

  // ------------------------------------------- sort / limit / top-k / set

  /** Multi-column sort with explicit NULLS FIRST/LAST (defaults differ
    * between Spark and DuckDB, so both sides pin placement).
    */
  private def sortMultiNulls(s: SparkSession, dir: String): DataFrame =
    Tables
      .customer(s, dir)
      .select(
        col("c_custkey"),
        expr("nullif(c_mktsegment, 'BUILDING')").as("seg"),
        col("c_acctbal"),
      )
      .orderBy(col("seg").desc_nulls_first, col("c_acctbal").asc_nulls_last, col("c_custkey"))

  /** Global top-100 by price: Catalyst fuses orderBy+limit into
    * TakeOrderedAndProject — per-partition top-k then a single driver merge,
    * no full sort at any scale.
    */
  private def topkGlobal(s: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(s, dir)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(100)

  /** UNION ALL of two tagged projections (no shuffle — pure concat). */
  private def setUnionAll(s: SparkSession, dir: String): DataFrame =
    Tables
      .customer(s, dir)
      .select(col("c_custkey").as("id"), lit("customer").as("src"))
      .unionByName(
        Tables.supplier(s, dir).select(col("s_suppkey").as("id"), lit("supplier").as("src"))
      )
      .orderBy("src", "id")

  /** UNION DISTINCT (concat + dedup exchange). */
  private def setUnionDistinct(s: SparkSession, dir: String): DataFrame =
    Tables
      .orders(s, dir)
      .select(col("o_custkey").as("key"))
      .union(Tables.customer(s, dir).select(col("c_custkey").as("key")))
      .distinct()
      .orderBy("key")

  /** INTERSECT (distinct semantics): custkeys with both a finished and an
    * open order.
    */
  private def setIntersect(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    o.filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("key"))
      .intersect(o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("key")))
      .orderBy("key")
  }

  /** EXCEPT (distinct semantics): finished-order customers with no open order. */
  private def setExcept(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    o.filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("key"))
      .except(o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("key")))
      .orderBy("key")
  }

  // ------------------------------------------------------------- catalog

  val entries: Seq[QueryDef] = Seq(
    QueryDef(
      "scan_parquet",
      scanParquet,
      Some("SELECT * FROM region ORDER BY r_regionkey"),
    ),
    QueryDef(
      "scan_parquet_pushdown",
      scanPushdown,
      Some(
        "SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem " +
          "WHERE l_quantity > 45 ORDER BY l_orderkey, l_linenumber"
      ),
    ),
    QueryDef(
      "proj_select_rename_cast",
      projSelectRenameCast,
      Some(
        "SELECT c_custkey AS custkey, c_name AS name, " +
          "CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS acctbal, " +
          "CAST(c_nationkey AS BIGINT) AS nationkey FROM customer ORDER BY custkey"
      ),
    ),
    QueryDef(
      "filter_pred",
      filterPred,
      Some(
        "SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_linestatus, l_shipdate " +
          "FROM lineitem WHERE l_quantity > 30 AND l_returnflag IN ('A','R') " +
          "AND l_shipdate BETWEEN TIMESTAMP '1994-01-01' AND TIMESTAMP '1996-12-31' " +
          "AND l_linestatus NOT LIKE 'O%' ORDER BY l_orderkey, l_linenumber"
      ),
    ),
    QueryDef(
      "filter_nulls",
      filterNulls,
      Some(
        "SELECT o_orderkey, nullif(o_orderstatus,'O') AS st, o_totalprice, " +
          "nullif(o_orderstatus,'O') IS NOT DISTINCT FROM 'F' AS is_f " +
          "FROM orders WHERE nullif(o_orderstatus,'O') IS NOT NULL ORDER BY o_orderkey"
      ),
    ),
    QueryDef(
      "distinct_rows",
      distinctRows,
      Some(
        "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders " +
          "ORDER BY o_orderstatus, o_orderpriority"
      ),
    ),
    QueryDef(
      "conditional_expr",
      conditionalExpr,
      Some(
        "SELECT l_orderkey, l_linenumber, " +
          "CASE WHEN l_quantity > 40 THEN 'high' WHEN l_quantity > 20 THEN 'mid' ELSE 'low' END AS qty_band, " +
          "coalesce(nullif(l_returnflag,'N'), 'none') AS flag_or_none, " +
          "least(l_extendedprice, l_quantity * 1000) AS least_val, " +
          "greatest(l_tax, l_discount) AS greatest_rate " +
          "FROM lineitem ORDER BY l_orderkey, l_linenumber"
      ),
    ),
    QueryDef(
      "join_inner_broadcast",
      joinInnerBroadcast,
      Some(
        "SELECT o_orderkey, c_name, o_totalprice, c_mktsegment FROM orders " +
          "JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey"
      ),
    ),
    QueryDef(
      "join_multiway_star",
      joinMultiwayStar,
      Some(
        "SELECT r_name, n_name, " +
          "CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue, " +
          "COUNT(*) AS n_rows " +
          "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
          "JOIN customer ON o_custkey = c_custkey " +
          "JOIN nation ON c_nationkey = n_nationkey " +
          "JOIN region ON n_regionkey = r_regionkey " +
          "GROUP BY r_name, n_name ORDER BY r_name, n_name"
      ),
    ),
    QueryDef(
      "join_left_outer",
      joinLeftOuter,
      Some(
        "SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders, " +
          "CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_spent " +
          "FROM customer LEFT JOIN orders ON c_custkey = o_custkey " +
          "GROUP BY c_custkey, c_name ORDER BY c_custkey"
      ),
    ),
    QueryDef(
      "join_semi",
      joinSemi,
      Some(
        "SELECT c_custkey, c_name FROM customer " +
          "WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) ORDER BY c_custkey"
      ),
    ),
    QueryDef(
      "join_anti",
      joinAnti,
      Some(
        "SELECT c_custkey, c_name FROM customer " +
          "WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) ORDER BY c_custkey"
      ),
    ),
    QueryDef(
      "agg_global",
      aggGlobal,
      Some(
        "SELECT COUNT(*) AS n_rows, " +
          "CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty, " +
          "CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*) AS avg_qty, " +
          "MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price, " +
          "COUNT(DISTINCT l_suppkey) AS n_supp FROM lineitem"
      ),
    ),
    QueryDef(
      "agg_groupby_pricing",
      aggGroupbyPricing,
      Some(
        "SELECT l_returnflag, l_linestatus, " +
          "CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty, " +
          "CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_base_price, " +
          "CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,4))), 2) AS DOUBLE) AS sum_disc_price, " +
          "CAST(ROUND(SUM(CAST(l_extendedprice * ((1.0 - l_discount) * (1.0 + l_tax)) AS DECIMAL(28,6))), 2) AS DOUBLE) AS sum_charge, " +
          "CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*) AS avg_qty, " +
          "CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*) AS avg_price, " +
          "CAST(SUM(CAST(l_discount AS DECIMAL(28,4))) AS DOUBLE) / COUNT(*) AS avg_disc, " +
          "COUNT(*) AS count_order " +
          "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' " +
          "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"
      ),
    ),
    QueryDef(
      "agg_distinct_count",
      aggDistinctCount,
      Some(
        "SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts, " +
          "COUNT(DISTINCT l_suppkey) AS n_supp, COUNT(*) AS n_rows " +
          "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
      ),
    ),
    QueryDef(
      "agg_having",
      aggHaving,
      Some(
        "SELECT o_custkey, COUNT(*) AS n_orders, " +
          "CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total_spent " +
          "FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 5 ORDER BY o_custkey"
      ),
    ),
    QueryDef(
      "win_rank_dense_row",
      winRankDenseRow,
      Some(
        "SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice, " +
          "row_number() OVER w AS rn, rank() OVER w AS rk, dense_rank() OVER w AS drk " +
          "FROM lineitem " +
          "WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) " +
          "ORDER BY l_returnflag, rn"
      ),
    ),
    QueryDef(
      "win_topk_per_group",
      winTopkPerGroup,
      Some(
        "SELECT * FROM (SELECT o_custkey, o_orderkey, o_totalprice, " +
          "row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn " +
          "FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn"
      ),
    ),
    QueryDef(
      "win_running_sum",
      winRunningSum,
      Some(
        "SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice, " +
          "CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) OVER " +
          "(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spent " +
          "FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey"
      ),
    ),
    QueryDef(
      "sort_multi_nulls",
      sortMultiNulls,
      Some(
        "SELECT c_custkey, nullif(c_mktsegment,'BUILDING') AS seg, c_acctbal FROM customer " +
          "ORDER BY seg DESC NULLS FIRST, c_acctbal ASC NULLS LAST, c_custkey"
      ),
    ),
    QueryDef(
      "topk_global",
      topkGlobal,
      Some(
        "SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem " +
          "ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100"
      ),
    ),
    QueryDef(
      "set_union_all",
      setUnionAll,
      Some(
        "SELECT * FROM (SELECT c_custkey AS id, 'customer' AS src FROM customer " +
          "UNION ALL SELECT s_suppkey AS id, 'supplier' AS src FROM supplier) ORDER BY src, id"
      ),
    ),
    QueryDef(
      "set_union_distinct",
      setUnionDistinct,
      Some(
        "SELECT DISTINCT o_custkey AS key FROM (SELECT o_custkey FROM orders " +
          "UNION ALL SELECT c_custkey FROM customer) t(o_custkey) ORDER BY key"
      ),
    ),
    QueryDef(
      "agg_rollup",
      aggRollup,
      Some(
        "SELECT l_returnflag, l_linestatus, " +
          "CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag, " +
          "CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status, " +
          "CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty, " +
          "COUNT(*) AS n_rows FROM lineitem " +
          "GROUP BY ROLLUP (l_returnflag, l_linestatus) " +
          "ORDER BY g_flag, g_status, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"
      ),
    ),
    QueryDef(
      "agg_cube",
      aggCube,
      Some(
        "SELECT l_returnflag, l_linestatus, " +
          "CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag, " +
          "CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status, " +
          "CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty, " +
          "COUNT(*) AS n_rows FROM lineitem " +
          "GROUP BY CUBE (l_returnflag, l_linestatus) " +
          "ORDER BY g_flag, g_status, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"
      ),
    ),
    QueryDef(
      "agg_grouping_sets",
      aggGroupingSets,
      Some(
        "SELECT l_returnflag, l_linestatus, " +
          "CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag, " +
          "CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status, " +
          "CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_price, " +
          "COUNT(*) AS n_rows FROM lineitem " +
          "GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ()) " +
          "ORDER BY g_flag, g_status, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"
      ),
    ),
    QueryDef(
      "agg_collect_sorted",
      aggCollectSorted,
      Some(
        "SELECT o_custkey, array_to_string(list(o_orderstatus ORDER BY o_orderstatus), ',') AS statuses " +
          "FROM orders GROUP BY o_custkey ORDER BY o_custkey"
      ),
    ),
    QueryDef(
      "agg_stats",
      aggStats,
      Some(
        "SELECT l_returnflag, " +
          "round(stddev_samp(l_extendedprice), 4) AS sd_price, " +
          "round(var_samp(l_quantity), 4) AS var_qty, " +
          "CASE WHEN round(corr(l_quantity, l_extendedprice), 4) = 0 THEN 0.0 " +
          "ELSE round(corr(l_quantity, l_extendedprice), 4) END AS corr_qp, " +
          "round(covar_samp(l_quantity, l_extendedprice), 4) AS cov_qp " +
          "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
      ),
    ),
    QueryDef(
      "agg_percentile_exact",
      aggPercentileExact,
      Some(
        "SELECT l_returnflag, " +
          "round(quantile_cont(l_extendedprice, 0.5), 4) AS p50, " +
          "round(quantile_cont(l_extendedprice, 0.9), 4) AS p90, " +
          "COUNT(*) AS n_rows " +
          "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
      ),
    ),
    QueryDef(
      "win_ntile_pct",
      winNtilePct,
      Some(
        "SELECT c_mktsegment, c_custkey, c_acctbal, " +
          "ntile(4) OVER w AS quartile, percent_rank() OVER w AS pct_rank, " +
          "cume_dist() OVER w AS cume FROM customer " +
          "WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) " +
          "ORDER BY c_mktsegment, c_custkey"
      ),
    ),
    QueryDef(
      "win_first_last_frame",
      winFirstLastFrame,
      Some(
        "SELECT o_custkey, o_orderkey, o_orderdate, " +
          "first_value(o_orderkey) OVER w AS prev_key, " +
          "last_value(o_orderkey) OVER w AS next_key FROM orders " +
          "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
          "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) " +
          "ORDER BY o_custkey, o_orderdate, o_orderkey"
      ),
    ),
    QueryDef(
      "join_full_outer",
      joinFullOuter,
      Some(
        "SELECT coalesce(a.c_custkey, b.o_custkey) AS custkey, a.c_acctbal, b.n_big_orders " +
          "FROM (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 5000) a " +
          "FULL JOIN (SELECT o_custkey, COUNT(*) AS n_big_orders FROM orders " +
          "WHERE o_totalprice > 100000 GROUP BY o_custkey) b " +
          "ON a.c_custkey = b.o_custkey ORDER BY custkey"
      ),
    ),
    QueryDef(
      "join_cross_bounded",
      joinCrossBounded,
      Some(
        "SELECT r_regionkey, r_name, n_nationkey, n_name FROM region CROSS JOIN nation " +
          "ORDER BY r_regionkey, n_nationkey"
      ),
    ),
    QueryDef(
      "join_theta_range",
      joinThetaRange,
      Some(
        "SELECT o_orderpriority, COUNT(*) AS n_rows, " +
          "CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_price " +
          "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
          "AND l_shipdate BETWEEN o_orderdate AND o_orderdate + INTERVAL 90 DAY " +
          "GROUP BY o_orderpriority ORDER BY o_orderpriority"
      ),
    ),
    QueryDef(
      "set_intersect",
      setIntersect,
      Some(
        "SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'F' " +
          "INTERSECT SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'O' " +
          "ORDER BY key"
      ),
    ),
    QueryDef(
      "set_except",
      setExcept,
      Some(
        "SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'F' " +
          "EXCEPT SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'O' " +
          "ORDER BY key"
      ),
    ),
  )
}
