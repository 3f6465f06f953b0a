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

  /** EXACT distinct counting via bitmap words — the third point on the
    * distinct-count design spectrum next to `agg_approx_distinct` (HLL,
    * rows-only) and `agg_distinct_count` (Expand-based exact): when the id
    * domain is dense integers, a bitmap is both EXACT and MERGEABLE. Each
    * user sets bit (user_id mod 63) of word (user_id div 63); `bit_or`
    * partial-aggregates map-side, so the exchange carries at most
    * |domain|/63 words per group no matter the event count, and per-shard
    * bitmaps OR together losslessly (the law ApproxSpec pins). bit_count
    * over the words recovers the exact distinct count; bit_xor doubles as
    * an order-free bitmap fingerprint. Unlike the HLL sketch this is plain
    * integer arithmetic, so the whole path is oracle-checked.
    */
  private def aggBitmapDistinct(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    graft.Tables
      .events(s, dir)
      .select(
        col("event_type"),
        // 63-bit words: DuckDB range-checks a shift into the sign bit
        // (1::BIGINT << 63 errors), so bit positions stay in 0..62
        expr("user_id div 63").as("w_idx"),
        expr("shiftleft(cast(1 as bigint), cast(user_id % 63 as int))").as("bit"),
      )
      .groupBy("event_type", "w_idx")
      .agg(expr("bit_or(bit)").as("word"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_words"),
        sum(bit_count(col("word")).cast("long")).as("distinct_users"),
        expr("bit_xor(word)").as("bitmap_xor"),
      )
      .orderBy("event_type")

  private val aggBitmapDistinctSql =
    "WITH b AS (SELECT event_type, user_id // 63 AS w_idx, " +
      "(1::BIGINT << CAST(user_id % 63 AS INT)) AS bit FROM events), " +
      "w AS (SELECT event_type, w_idx, bit_or(bit) AS word FROM b GROUP BY 1, 2) " +
      "SELECT event_type, count(*) AS n_words, " +
      "CAST(sum(bit_count(word)) AS BIGINT) AS distinct_users, bit_xor(word) AS bitmap_xor " +
      "FROM w GROUP BY 1 ORDER BY event_type"

  /** Declared rows-only (no oracle can exist: DuckDB has no matching HLL/GK
    * implementations, and sketch values are engine-specific). Both entries
    * are deterministic — HLL register merges are max-based and therefore
    * order-independent — and ApproxSpec separately asserts tolerance vs the
    * exact answers, which the approx_distinct output also carries inline.
    * `agg_bitmap_distinct` is the exception: exact integer arithmetic end
    * to end, fully oracle-declared.
    */
  val entries: Seq[graft.QueryDef] = Seq(
    graft.QueryDef("agg_bitmap_distinct", aggBitmapDistinct, Some(aggBitmapDistinctSql)),
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
