package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Warehouse-pipeline verbs a production ETL runs around the query catalog:
  * SCD2 merge/upsert, deterministic hash-based dataset splitting, and the
  * typed Dataset[T] API surface (SURVEY.md §1.1 — everything else in the
  * catalog is DataFrame/Row-based; this file proves the case-class Encoder
  * path works identically).
  */
object Pipeline {

  /** SCD2 merge: apply an updates batch (per-customer order spend) to a
    * dimension snapshot, emitting versioned rows — unchanged keys keep their
    * v1 row current; changed keys get v1 closed plus a current v2 row.
    *
    * One left join on the natural key is the ONLY exchange; both output rows
    * of an updated key are produced in the same task by exploding a
    * conditional array (no second join, no union re-shuffle). At 100 TB the
    * updates side is the small delta — AQE broadcasts it when it fits, and
    * the dimension never shuffles twice.
    *
    * Balance arithmetic stays in exact DECIMAL until the final double cast,
    * so no round() is needed anywhere (SURVEY.md §2.0 determinism rules).
    */
  private def mergeScd2(s: SparkSession, dir: String): DataFrame = {
    val dim = Tables
      .customer(s, dir)
      .select(col("c_custkey"), col("c_acctbal").cast(DecimalType(28, 2)).as("bal0"))
    val upd = Tables
      .orders(s, dir)
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(sum(col("o_totalprice").cast(DecimalType(28, 2))).as("spend"))
    val one = struct(
      lit(1L).as("version"),
      col("bal0").cast("double").as("bal"),
      col("spend").isNull.as("is_current"),
    )
    val two = struct(
      lit(2L).as("version"),
      (col("bal0") + col("spend")).cast("double").as("bal"),
      lit(true).as("is_current"),
    )
    dim
      .join(upd, Seq("c_custkey"), "left")
      .select(
        col("c_custkey"),
        explode(when(col("spend").isNull, array(one)).otherwise(array(one, two))).as("r"),
      )
      .select(col("c_custkey"), col("r.version"), col("r.bal"), col("r.is_current"))
      .orderBy("c_custkey", "version")
  }

  private val mergeScd2Sql =
    "WITH upd AS (SELECT o_custkey AS c_custkey, " +
      "SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS spend FROM orders GROUP BY 1), " +
      "j AS (SELECT c.c_custkey, CAST(c.c_acctbal AS DECIMAL(28,2)) AS bal0, u.spend " +
      "FROM customer c LEFT JOIN upd u USING (c_custkey)) " +
      "SELECT c_custkey, CAST(1 AS BIGINT) AS version, CAST(bal0 AS DOUBLE) AS bal, " +
      "spend IS NULL AS is_current FROM j " +
      "UNION ALL " +
      "SELECT c_custkey, CAST(2 AS BIGINT) AS version, CAST(bal0 + spend AS DOUBLE) AS bal, " +
      "true AS is_current FROM j WHERE spend IS NOT NULL " +
      "ORDER BY c_custkey, version"

  /** Deterministic train/test split: bucket = first 16 bits of md5(doc_id)
    * mod 100, train = bucket < 90. Pure per-row arithmetic — no shuffle, no
    * seed state, reproducible on any engine and any partitioning, and a doc
    * keeps its split when the corpus grows (the property that matters for
    * 100 TB incremental pipelines, and that sample()/rand() does not have).
    */
  /** The one bucket formula shared by every hash-sampling query (Spark and
    * SQL sides MUST stay bit-identical — a drifted copy silently breaks the
    * split/stratified-sample consistency): first 16 bits of md5(doc_id),
    * mod 100.
    */
  def hashBucket: Column =
    conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10).cast("long") % 100

  val hashBucketSql: String =
    "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100"

  private def sampleHashSplit(s: SparkSession, dir: String): DataFrame = {
    val bucket = hashBucket
    Tables
      .documents(s, dir)
      .select(
        col("doc_id"),
        col("lang"),
        bucket.as("bucket"),
        when(bucket < 90, lit("train")).otherwise(lit("test")).as("split"),
      )
      .orderBy("doc_id")
  }

  private val sampleHashSplitSql =
    s"SELECT doc_id, lang, $hashBucketSql AS bucket, " +
      s"CASE WHEN $hashBucketSql < 90 THEN 'train' ELSE 'test' END AS split " +
      "FROM documents ORDER BY doc_id"

  /** The typed surface: case-class Encoder scan → typed filter/map lambdas →
    * groupByKey → typed aggregate columns. Lambdas cost Encoder
    * serialization vs Column expressions (they black-box Catalyst — no
    * pushdown through a typed map), which is why the REST of the catalog is
    * Column-based; this query pins that the typed path yields identical
    * results where ergonomics favor it. Sum/count are exact integers, and
    * the one double division is of identical operands on both engines.
    */
  final case class Doc(doc_id: Long, lang: String, text: String)

  private def typedDocStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ds: Dataset[Doc] = Tables.documents(s, dir).select("doc_id", "lang", "text").as[Doc]
    // split with limit -1 keeps trailing empty tokens — matching Spark SQL
    // split() and DuckDB string_split (Java's default split drops them)
    ds.filter(d => d.text.nonEmpty)
      .map(d => (d.lang, d.text.split(" ", -1).length.toLong))
      .groupByKey(_._1)
      .agg(
        count(lit(1)).as("n_docs").as[Long],
        sum(col("_2")).as("sum_tokens").as[Long],
      )
      .toDF("lang", "n_docs", "sum_tokens")
      .withColumn("avg_tokens", col("sum_tokens").cast("double") / col("n_docs"))
      .orderBy("lang")
  }

  private val typedDocStatsSql =
    "SELECT lang, count(*) AS n_docs, " +
      "CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens, " +
      "CAST(sum(len(string_split(text, ' '))) AS DOUBLE) / count(*) AS avg_tokens " +
      "FROM documents WHERE text <> '' GROUP BY lang ORDER BY lang"

  /** Table profiling (the crawler/profiler pass every lake pipeline runs
    * before processing): per-column row/null/distinct counts and min/max,
    * computed in ONE scan + ONE aggregate row, then unpivoted to a row per
    * column via explode of a struct array (no per-column rescans). min/max
    * are stringified so heterogeneous column types share one output schema.
    * Scale note: multiple exact COUNT(DISTINCT) in one agg plan through
    * Spark's Expand (rows × #distinct-columns before the exchange) — at
    * 100 TB swap exact distincts for approx_count_distinct and the Expand
    * disappears; the declared query keeps exact for the oracle.
    */
  /** Shared profiler body; `approxDistinct` selects the scale path (see
    * scaladoc above and the PropertySpec tolerance/plan assertions).
    */
  def profile(docs: DataFrame, cols: Seq[String], approxDistinct: Boolean): DataFrame = {
    val aggs = Seq(count(lit(1)).cast("long").as("n_rows")) ++ cols.flatMap { c =>
      val nd =
        if (approxDistinct) approx_count_distinct(col(c), 0.02)
        else countDistinct(col(c))
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
        nd.cast("long").as(s"${c}_distinct"),
        min(col(c)).cast("string").as(s"${c}_min"),
        max(col(c)).cast("string").as(s"${c}_max"),
      )
    }
    val structs = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("n_rows"),
        col(s"${c}_nulls").as("n_nulls"),
        col(s"${c}_distinct").as("n_distinct"),
        col(s"${c}_min").as("min_val"),
        col(s"${c}_max").as("max_val"),
      )
    }
    docs
      .agg(aggs.head, aggs.tail: _*)
      .select(explode(array(structs: _*)).as("p"))
      .select("p.*")
      .orderBy("col_name")
  }

  private def profileColumns(s: SparkSession, dir: String): DataFrame =
    profile(
      Tables.documents(s, dir),
      Seq("doc_id", "lang", "source", "n_chars"),
      approxDistinct = false,
    )

  private val profileColumnsSql =
    Seq("doc_id", "lang", "source", "n_chars")
      .map { c =>
        s"SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows, " +
          s"CAST(count(*) FILTER ($c IS NULL) AS BIGINT) AS n_nulls, " +
          s"CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct, " +
          s"CAST(min($c) AS VARCHAR) AS min_val, CAST(max($c) AS VARCHAR) AS max_val " +
          "FROM documents"
      }
      .mkString("", " UNION ALL ", " ORDER BY col_name")

  /** Fuzzy entity matching: for every part, its nearest same-(brand, size)
    * neighbor by name edit distance (<= 5) plus the fuzzy-neighbor count —
    * the blocked string-similarity join every entity-resolution pipeline
    * runs. Blocking on (brand, size) bounds candidate pairs by the largest
    * block (320 k pairs at sf0.1, never |parts|²); levenshtein is a
    * codegen'd built-in on both engines with identical standard semantics.
    * Tiebreak (dist asc, key asc) makes the best match deterministic.
    */
  private def joinFuzzyParts(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir).select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_size"))
    val a = p.select(col("p_partkey").as("a_key"), col("p_name").as("a_name"), col("p_brand"), col("p_size"))
    val b = p.select(
      col("p_partkey").as("b_key"),
      col("p_name").as("b_name"),
      col("p_brand").as("bb"),
      col("p_size").as("bs"),
    )
    val pairs = a
      .join(b, col("p_brand") === col("bb") && col("p_size") === col("bs") && col("a_key") =!= col("b_key"))
      .withColumn("dist", levenshtein(col("a_name"), col("b_name")))
      .filter(col("dist") <= 5)
    // best-match selection as a min_by AGGREGATE instead of the r6
    // rn=1-window: partial aggregation collapses a key's candidate list
    // map-side, so a hub key (huge fuzzy block) never owns one window task
    pairs
      .groupBy("a_key")
      .agg(
        count(lit(1)).as("n_fuzzy"),
        min_by(struct(col("b_key"), col("dist")), struct(col("dist"), col("b_key"))).as("best"),
      )
      .select(
        col("a_key"),
        col("n_fuzzy"),
        col("best.b_key").as("best_key"),
        col("best.dist").cast("long").as("best_dist"),
      )
      .orderBy("a_key")
  }

  private val joinFuzzySql =
    "WITH pairs AS (SELECT a.p_partkey AS a_key, b.p_partkey AS b_key, " +
      "levenshtein(a.p_name, b.p_name) AS dist " +
      "FROM part a JOIN part b ON a.p_brand = b.p_brand AND a.p_size = b.p_size " +
      "AND a.p_partkey <> b.p_partkey WHERE levenshtein(a.p_name, b.p_name) <= 5) " +
      "SELECT a_key, CAST(count(*) OVER (PARTITION BY a_key) AS BIGINT) AS n_fuzzy, " +
      "b_key AS best_key, CAST(dist AS BIGINT) AS best_dist " +
      "FROM pairs QUALIFY row_number() OVER (PARTITION BY a_key ORDER BY dist, b_key) = 1 " +
      "ORDER BY a_key"

  /** Stratified-sample balance report: the md5-bucket 20% sample per lang
    * stratum with exact kept fractions — shows the hash sample stays
    * stratified as the corpus grows (same zero-state argument as
    * sample_hash_split; one groupBy exchange).
    */
  private def sampleStratified(s: SparkSession, dir: String): DataFrame = {
    val bucket = hashBucket
    Tables
      .documents(s, dir)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(bucket < 20, 1L).otherwise(0L)).as("n_kept"),
      )
      .withColumn("kept_frac", round(col("n_kept").cast("double") / col("n_total"), 4))
      .orderBy("lang")
  }

  private val sampleStratifiedSql =
    "SELECT lang, CAST(count(*) AS BIGINT) AS n_total, " +
      s"CAST(count(*) FILTER ($hashBucketSql < 20) AS BIGINT) AS n_kept, " +
      s"round(CAST(count(*) FILTER ($hashBucketSql < 20) AS DOUBLE) / count(*), 4) AS kept_frac " +
      "FROM documents GROUP BY lang ORDER BY lang"

  /** Fixed-width histogram of doc lengths (the binning/feature-engineering
    * primitive): integer bin arithmetic, one groupBy exchange on the bin id.
    */
  private def featureHist(s: SparkSession, dir: String): DataFrame =
    Tables
      .documents(s, dir)
      .select((expr("n_chars div 200") * 200).as("bin_lo"))
      .groupBy("bin_lo")
      .agg(count(lit(1)).as("n"))
      .orderBy("bin_lo")

  private val featureHistSql =
    "SELECT (n_chars // 200) * 200 AS bin_lo, CAST(count(*) AS BIGINT) AS n " +
      "FROM documents GROUP BY 1 ORDER BY 1"

  val entries: Seq[QueryDef] = Seq(
    QueryDef("join_fuzzy", joinFuzzyParts, Some(joinFuzzySql)),
    QueryDef("sample_stratified", sampleStratified, Some(sampleStratifiedSql)),
    QueryDef("feature_hist", featureHist, Some(featureHistSql)),
    QueryDef("merge_scd2", mergeScd2, Some(mergeScd2Sql)),
    QueryDef("sample_hash_split", sampleHashSplit, Some(sampleHashSplitSql)),
    QueryDef("typed_doc_stats", typedDocStats, Some(typedDocStatsSql)),
    QueryDef("profile_columns", profileColumns, Some(profileColumnsSql)),
  )
}
