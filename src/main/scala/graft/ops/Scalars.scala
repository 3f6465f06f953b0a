package graft.ops

import graft.{QueryDef, Tables}
import graft.Qf._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar function packs (SURVEY.md §2.7): each key is one wide projection
  * exercising a function family, totally ordered by the table key.
  *
  * Cross-engine dialect notes (validated against DuckDB 1.0 this round):
  *  - DuckDB date-part extracts (year/month/day/dayofweek/date_diff) return
  *    BIGINT; every computed integer here is cast to long on the Spark side.
  *  - DuckDB `dayofweek` is 0=Sunday, Spark is 1=Sunday — oracle adds 1.
  *  - DuckDB `date_trunc('month', ts)` returns DATE, so the Spark side uses
  *    `trunc` (also DATE); `date_diff('day', a, b)` has flipped arg order vs
  *    Spark `datediff(end, start)`.
  *  - DuckDB `floor`/`ceil`/`sign` return non-double types on some inputs;
  *    both sides cast to BIGINT. `list_sum` returns HUGEINT — cast.
  *  - Transcendentals (ln/exp/sqrt) round(4): libm vs libstdc++ may differ in
  *    the last ULP; 4 decimals at these magnitudes is safely coarse.
  *
  * All functions are Catalyst built-ins (whole-stage codegen); the single
  * exception is `fn_udf_scala`, which deliberately demonstrates the Scala
  * UDF registration surface (a codegen barrier — kept out of hot paths).
  */
object Scalars {

  private def fnString(s: SparkSession, dir: String): DataFrame =
    Tables
      .part(s, dir)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("up"),
        lower(col("p_brand")).as("lo"),
        length(col("p_name")).cast("long").as("len"),
        substring(col("p_name"), 1, 8).as("sub8"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        lpad(col("p_size").cast("string"), 5, "0").as("size_pad"),
        regexp_replace(col("p_name"), " ", "_").as("underscored"),
        instr(col("p_name"), "a").cast("long").as("first_a"),
        size(split(col("p_name"), " ")).cast("long").as("n_tokens"),
        regexp_extract(col("p_name"), "([0-9]+)", 1).as("first_num"),
        trim(concat(lit("  "), col("p_brand"), lit("  "))).as("trimmed"),
      )
      .orderBy("p_partkey")

  private def fnDatetime(s: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(s, dir)
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        year(col("l_shipdate")).cast("long").as("yr"),
        month(col("l_shipdate")).cast("long").as("mo"),
        dayofmonth(col("l_shipdate")).cast("long").as("dy"),
        trunc(col("l_shipdate"), "month").as("mon_start"),
        last_day(col("l_shipdate")).as("mon_end"),
        datediff(col("l_shipdate"), lit("1995-01-01")).cast("long").as("days_since"),
        date_add(col("l_shipdate"), 5).as("ship_plus5"),
        dayofweek(col("l_shipdate")).cast("long").as("dow"),
        unix_timestamp(col("l_shipdate")).as("unix_s"),
        timestamp_seconds(unix_timestamp(col("l_shipdate"))).as("rt_ts"),
      )
      .orderBy("l_orderkey", "l_linenumber")

  private def fnMath(s: SparkSession, dir: String): DataFrame =
    Tables
      .part(s, dir)
      .select(
        col("p_partkey"),
        round(col("p_retailprice"), 2).as("r2"),
        floor(col("p_retailprice")).cast("long").as("fl"),
        ceil(col("p_retailprice")).cast("long").as("ce"),
        abs(col("p_retailprice") - 1000.0).as("ab"),
        pow(col("p_size"), 2).as("pw"),
        round(sqrt(col("p_retailprice")), 4).as("sq"),
        round(log(col("p_retailprice")), 4).as("lg"),
        round(exp(col("p_size").cast("double") / 100.0), 4).as("ex"),
        signum(col("p_retailprice") - 1000.0).cast("long").as("sg"),
        (col("p_size") % 7).cast("long").as("md"),
      )
      .orderBy("p_partkey")

  private def fnArray(s: SparkSession, dir: String): DataFrame = {
    val w = split(col("text"), " ")
    Tables
      .documents(s, dir)
      .select(
        col("doc_id"),
        size(w).cast("long").as("n_words"),
        array_contains(w, "data").as("has_data"),
        concat_ws(" ", slice(w, 1, 3)).as("first3"),
        size(array_distinct(w)).cast("long").as("n_uniq"),
        element_at(sort_array(w), 1).as("min_word"),
        arrays_overlap(w, array(lit("data"), lit("table"))).as("overlap"),
        size(filter(w, x => length(x) > 4)).cast("long").as("n_long"),
        aggregate(w, lit(0L), (acc, x) => acc + length(x)).as("total_len"),
        element_at(transform(w, x => upper(x)), 1).as("first_up"),
      )
      .orderBy("doc_id")
  }

  /** Generator surface: posexplode ≡ DuckDB unnest over an index range
    * (DuckDB 1.0 has no WITH ORDINALITY; pos is 0-based on both sides).
    * Bounded to doc_id < 20 — exploding every token of every doc is a row
    * blow-up with no extra coverage.
    */
  private def fnExplode(s: SparkSession, dir: String): DataFrame =
    Tables
      .documents(s, dir)
      .filter(col("doc_id") < 20)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("word"))
      .orderBy("doc_id", "pos")

  private def fnJson(s: SparkSession, dir: String): DataFrame =
    Tables
      .events(s, dir)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_val"),
        get_json_object(col("props"), "$.k").isNotNull.as("has_k"),
      )
      .orderBy("event_id")

  /** PII-masking pack: md5 / sha2-256 digests plus a length-preserving mask
    * keeping the last 4 chars (a stock Glue ETL task).
    */
  private def fnHashCrypto(s: SparkSession, dir: String): DataFrame =
    Tables
      .customer(s, dir)
      .select(
        col("c_custkey"),
        md5(col("c_name")).as("md5_name"),
        sha2(col("c_name"), 256).as("sha_name"),
        expr("concat(repeat('*', length(c_name) - 4), substring(c_name, length(c_name) - 3, 4))")
          .as("masked"),
      )
      .orderBy("c_custkey")

  /** Map functions pack: build a MapType column with str_to_map, read it
    * back with element_at / map_keys / map_contains_key. DuckDB's MAP↔parquet
    * interop is fragile (SURVEY §2.7), so the declared output projects map
    * lookups to SCALARS and the oracle reproduces the same values with
    * string ops — the contract is the values, the Spark side is what proves
    * the map surface.
    */
  private def fnMap(s: SparkSession, dir: String): DataFrame = {
    val m = expr("str_to_map(concat('brand:', p_brand, '|type:', p_type, '|size:', p_size), '\\\\|', ':')")
    Tables
      .part(s, dir)
      .select(
        col("p_partkey"),
        element_at(m, "brand").as("m_brand"),
        element_at(m, "type").as("m_type"),
        element_at(m, "size").cast("long").as("m_size"),
        size(map_keys(m)).cast("long").as("n_keys"),
        array_contains(map_keys(m), "size").as("has_size"),
        map_contains_key(m, "color").as("has_color"),
      )
      .orderBy("p_partkey")
  }

  /** Scala UDF demo (Glue `Map.apply` equivalent): text normalizer. Declared
    * because the same transform is expressible in DuckDB SQL. A UDF is a
    * codegen barrier + serialization boundary — the library norm is
    * Text.normText (pure Column ops); this key exists to prove the extension
    * surface, not as the recommended path.
    */
  private def fnUdfScala(s: SparkSession, dir: String): DataFrame = {
    val normalize = udf { s: String =>
      if (s == null) null else s.trim.replaceAll("\\s+", " ").toLowerCase
    }
    Tables
      .documents(s, dir)
      .select(col("doc_id"), normalize(col("text")).as("norm"))
      .orderBy("doc_id")
  }

  /** try_cast over synthesized dirty strings — the Glue ResolveChoice "cast"
    * policy as a DECLARED query (the scalatest GlueParity path covers the
    * make_cols/project policies). Patterns per key-mod branch: parseable and
    * garbage ints, real and impossible calendar dates, numeric and
    * non-numeric doubles. One deliberate dialect exclusion: decimal-string →
    * INT, where DuckDB TRY_CAST rounds ('3.7' → 4) but Spark is strict
    * (NULL) — the scaladoc'd rule is to cast via DOUBLE first. Aggregated
    * to one row of parse counts + exact sums so the declared output is
    * O(1).
    */
  private def fnTryCast(s: SparkSession, dir: String): DataFrame =
    Tables
      .orders(s, dir)
      .select(
        expr(
          "CASE CAST(o_orderkey % 4 AS INT) WHEN 0 THEN '123' WHEN 1 THEN 'x9' " +
            "WHEN 2 THEN '' ELSE '-45' END"
        ).as("s_int"),
        expr(
          "CASE CAST(o_orderkey % 3 AS INT) WHEN 0 THEN '2024-02-29' " +
            "WHEN 1 THEN '2024-13-01' ELSE '2024-06-15' END"
        ).as("s_date"),
        expr("CASE CAST(o_orderkey % 2 AS INT) WHEN 0 THEN '3.5' ELSE 'nope' END").as("s_dbl"),
      )
      .select(
        expr("try_cast(s_int AS INT)").as("i"),
        expr("try_cast(s_date AS DATE)").as("d"),
        expr("try_cast(s_dbl AS DOUBLE)").as("x"),
      )
      .agg(
        count(col("i")).as("n_int_ok"),
        sum(col("i")).cast("long").as("sum_int"),
        count(col("d")).as("n_date_ok"),
        count(col("x")).as("n_dbl_ok"),
        dsum(col("x"), 1).as("sum_dbl"),
        nrows.as("n_rows"),
      )

  private val fnTryCastSql =
    "WITH dirty AS (SELECT " +
      "CASE CAST(o_orderkey % 4 AS INT) WHEN 0 THEN '123' WHEN 1 THEN 'x9' WHEN 2 THEN '' ELSE '-45' END AS s_int, " +
      "CASE CAST(o_orderkey % 3 AS INT) WHEN 0 THEN '2024-02-29' WHEN 1 THEN '2024-13-01' ELSE '2024-06-15' END AS s_date, " +
      "CASE CAST(o_orderkey % 2 AS INT) WHEN 0 THEN '3.5' ELSE 'nope' END AS s_dbl " +
      "FROM orders), " +
      "p AS (SELECT TRY_CAST(s_int AS INT) AS i, TRY_CAST(s_date AS DATE) AS d, " +
      "TRY_CAST(s_dbl AS DOUBLE) AS x FROM dirty) " +
      "SELECT count(i) AS n_int_ok, CAST(sum(i) AS BIGINT) AS sum_int, " +
      "count(d) AS n_date_ok, count(x) AS n_dbl_ok, " +
      "CAST(sum(CAST(x AS DECIMAL(28,1))) AS DOUBLE) AS sum_dbl, count(*) AS n_rows FROM p"

  // ------------------------------------------------------------- catalog

  val entries: Seq[QueryDef] = Seq(
    QueryDef("fn_try_cast", fnTryCast, Some(fnTryCastSql)),
    QueryDef(
      "fn_string",
      fnString,
      Some(
        "SELECT p_partkey, upper(p_name) AS up, lower(p_brand) AS lo, " +
          "CAST(length(p_name) AS BIGINT) AS len, substring(p_name, 1, 8) AS sub8, " +
          "concat_ws('-', p_brand, p_type) AS brand_type, " +
          "lpad(CAST(p_size AS VARCHAR), 5, '0') AS size_pad, " +
          "replace(p_name, ' ', '_') AS underscored, " +
          "CAST(instr(p_name, 'a') AS BIGINT) AS first_a, " +
          "CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_tokens, " +
          "regexp_extract(p_name, '([0-9]+)', 1) AS first_num, " +
          "trim('  ' || p_brand || '  ') AS trimmed " +
          "FROM part ORDER BY p_partkey"
      ),
    ),
    QueryDef(
      "fn_datetime",
      fnDatetime,
      Some(
        "SELECT l_orderkey, l_linenumber, " +
          "year(l_shipdate) AS yr, month(l_shipdate) AS mo, day(l_shipdate) AS dy, " +
          "date_trunc('month', l_shipdate) AS mon_start, last_day(l_shipdate) AS mon_end, " +
          "date_diff('day', DATE '1995-01-01', l_shipdate) AS days_since, " +
          "CAST(l_shipdate AS DATE) + 5 AS ship_plus5, " +
          "dayofweek(l_shipdate) + 1 AS dow, " +
          "epoch_ms(l_shipdate) // 1000 AS unix_s, " +
          "make_timestamp(epoch_ms(l_shipdate) * 1000) AS rt_ts " +
          "FROM lineitem ORDER BY l_orderkey, l_linenumber"
      ),
    ),
    QueryDef(
      "fn_math",
      fnMath,
      Some(
        "SELECT p_partkey, round(p_retailprice, 2) AS r2, " +
          "CAST(floor(p_retailprice) AS BIGINT) AS fl, " +
          "CAST(ceil(p_retailprice) AS BIGINT) AS ce, " +
          "abs(p_retailprice - 1000.0) AS ab, " +
          "power(p_size, 2) AS pw, " +
          "round(sqrt(p_retailprice), 4) AS sq, " +
          "round(ln(p_retailprice), 4) AS lg, " +
          "round(exp(CAST(p_size AS DOUBLE) / 100.0), 4) AS ex, " +
          "CAST(sign(p_retailprice - 1000.0) AS BIGINT) AS sg, " +
          "CAST(p_size % 7 AS BIGINT) AS md " +
          "FROM part ORDER BY p_partkey"
      ),
    ),
    QueryDef(
      "fn_array",
      fnArray,
      Some(
        "SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words, " +
          "list_contains(w, 'data') AS has_data, " +
          "array_to_string(w[1:3], ' ') AS first3, " +
          "CAST(len(list_distinct(w)) AS BIGINT) AS n_uniq, " +
          "list_sort(w)[1] AS min_word, " +
          "list_has_any(w, ['data', 'table']) AS overlap, " +
          "CAST(len(list_filter(w, x -> length(x) > 4)) AS BIGINT) AS n_long, " +
          "CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT) AS total_len, " +
          "upper(w[1]) AS first_up " +
          "FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) ORDER BY doc_id"
      ),
    ),
    QueryDef(
      "fn_explode",
      fnExplode,
      Some(
        "WITH e AS (SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS i " +
          "FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE doc_id < 20)) " +
          "SELECT doc_id, i - 1 AS pos, w[i] AS word FROM e ORDER BY doc_id, pos"
      ),
    ),
    QueryDef(
      "fn_json",
      fnJson,
      Some(
        "SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val, " +
          "json_extract_string(props, '$.k') IS NOT NULL AS has_k " +
          "FROM events ORDER BY event_id"
      ),
    ),
    QueryDef(
      "fn_hash_crypto",
      fnHashCrypto,
      Some(
        "SELECT c_custkey, md5(c_name) AS md5_name, sha256(c_name) AS sha_name, " +
          "repeat('*', length(c_name) - 4) || substring(c_name, length(c_name) - 3, 4) AS masked " +
          "FROM customer ORDER BY c_custkey"
      ),
    ),
    QueryDef(
      "fn_map",
      fnMap,
      Some(
        "SELECT p_partkey, p_brand AS m_brand, p_type AS m_type, " +
          "CAST(p_size AS BIGINT) AS m_size, CAST(3 AS BIGINT) AS n_keys, " +
          "true AS has_size, false AS has_color " +
          "FROM part ORDER BY p_partkey"
      ),
    ),
    QueryDef(
      "fn_udf_scala",
      fnUdfScala,
      Some(
        "SELECT doc_id, lower(trim(regexp_replace(text, '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g'))) AS norm " +
          "FROM documents ORDER BY doc_id"
      ),
    ),
  )
}
