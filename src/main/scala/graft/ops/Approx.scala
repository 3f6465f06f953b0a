package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate / sketch aggregations and the manual skew-salting pattern —
  * the 100 TB aggregation toolkit (SURVEY.md §2.4 approx rows + §2.3
  * `join_skew_salted`). Sketch outputs differ across engines by design, so
  * none of these are declared to the oracle gate; ApproxSpec asserts
  * tolerance vs exact and salted-vs-plain equivalence.
  */
object Approx {

  /** HLL distinct users per event type (rsd default 5%). */
  def approxDistinctUsers(events: DataFrame, rsd: Double = 0.05): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), rsd).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
      )

  /** Approximate percentiles (GK sketch) next to exact for tolerance checks. */
  def approxPercentiles(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("p50_approx"),
        expr("percentile(l_extendedprice, 0.5)").as("p50_exact"),
        percentile_approx(col("l_extendedprice"), lit(0.95), lit(10000)).as("p95_approx"),
        expr("percentile(l_extendedprice, 0.95)").as("p95_exact"),
      )

  /** The mergeable-sketch pattern: build partial HLL sketches per shard
    * (here: a synthetic shard key standing in for e.g. per-day partitions),
    * then merge with hll_union_agg — the shape that lets 100 TB distinct
    * counts be computed incrementally and re-aggregated without rescanning.
    */
  def hllMergeable(events: DataFrame): DataFrame = {
    val partials = events
      .withColumn("shard", pmod(col("user_id"), lit(16)))
      .groupBy(col("event_type"), col("shard"))
      .agg(hll_sketch_agg(col("user_id")).as("sketch"))
    partials
      .groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("approx_users"))
  }

  /** Declared rows-only (no oracle can exist: DuckDB has no matching HLL/GK
    * implementations, and sketch values are engine-specific). Both entries
    * are deterministic — HLL register merges are max-based and therefore
    * order-independent — and ApproxSpec separately asserts tolerance vs the
    * exact answers, which the approx_distinct output also carries inline.
    */
  val entries: Seq[graft.QueryDef] = Seq(
    graft.QueryDef(
      "agg_approx_distinct",
      (s, dir) => approxDistinctUsers(graft.Tables.events(s, dir)).orderBy("event_type"),
      None,
    ),
    // Companion key with a full oracle: the same scan/agg shape minus the
    // sketch column, so the grouping and exact-distinct legs of the approx
    // query ARE hash-gated even though the HLL estimate can't be.
    graft.QueryDef(
      "agg_approx_distinct_exact",
      (s, dir) =>
        graft.Tables
          .events(s, dir)
          .groupBy(col("event_type"))
          .agg(countDistinct(col("user_id")).as("exact_users"))
          .orderBy("event_type"),
      Some(
        "SELECT event_type, COUNT(DISTINCT user_id) AS exact_users " +
          "FROM events GROUP BY event_type ORDER BY event_type"
      ),
    ),
    graft.QueryDef(
      "agg_hll_mergeable",
      (s, dir) => hllMergeable(graft.Tables.events(s, dir)).orderBy("event_type"),
      None,
    ),
    // GK percentile sketches are merge-order-sensitive, so the VALUES can
    // shift with partitioning — but the row set (one per l_returnflag) is
    // stable, which is exactly what the rows-only check verifies; the
    // value tolerance lives in ApproxSpec (inline exact columns).
    graft.QueryDef(
      "agg_approx_percentile",
      (s, dir) => approxPercentiles(graft.Tables.lineitem(s, dir)).orderBy("l_returnflag"),
      None,
    ),
  )

  /** Manual skew salting: replicate the build side `salt` times, scatter the
    * probe side across salts, join on (key, salt). Produces the same rows as
    * the plain join (asserted in spec) while splitting a hot key's work
    * across `salt` tasks. AQE's skew-join handles most cases at runtime;
    * this is the explicit pattern for engines/paths AQE can't reach
    * (e.g. pre-partitioned bucketed writes).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salt: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt", pmod(xxhash64(col(key), monotonically_increasing_id()), lit(salt)))
    val saltedDim = dim.withColumn("__salt", explode(sequence(lit(0), lit(salt - 1)).cast("array<long>")))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }
}
