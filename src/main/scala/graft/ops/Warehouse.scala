package graft.ops

import graft.{QueryDef, Tables}
import graft.Qf._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-4 warehouse-maintenance verbs (SURVEY.md §2.16): CDC log apply,
  * snapshot diffing, and wide→long reshape. These are the table-maintenance
  * operations a lakehouse runs between the analytical queries — the same
  * family as `merge_scd2` (SCD2 versioning) but covering the other two
  * canonical shapes: last-writer-wins upsert WITH deletes, and
  * version-to-version drift audit.
  *
  * Scale doctrine, per op:
  *   - cdc_apply: latest-per-key via `max_by` (a partial-aggregable
  *     aggregate), NOT a row_number window — the map side reduces every
  *     (key, change-batch) run to one row before the single key exchange,
  *     where a window must first sort whole partitions. At 100 TB the
  *     snapshot is the dominant side and arrives bucketed by key; only the
  *     (much smaller) change log shuffles.
  *   - snapshot_diff: each side collapses to (key, 16-byte row signature)
  *     map-side BEFORE the full-outer join, so the exchange carries ~24 B/row
  *     regardless of row width — the diff of two 100 TB snapshots moves
  *     2×|keys|×24 B, not 200 TB. Changed-row payloads would be fetched by a
  *     later semi-join on the (tiny) changed-key set, same pattern as
  *     dedup_incremental.
  *   - reshape_unpivot: `Dataset.unpivot` plans a map-side Expand (k× row
  *     fan-out, zero exchanges); the following aggregate partial-combines the
  *     fan-out back down, so the one shuffle carries |groups|×|metrics| rows.
  */
object Warehouse {

  /** Offset for synthesized fresh keys (CDC inserts, diff adds). 1e15 keeps
    * the synthetic key space disjoint from real ones far past any gated
    * scale (o_orderkey grows ~6e6·SF, so collision would need SF ≈ 1.7e8;
    * doc_ids grow even slower) while staying well inside BIGINT.
    */
  private[graft] val SynthKeyOffset = 1000000000000000L

  // ------------------------------------------------------------ cdc_apply

  /** Deterministic change log synthesized from `orders` (the corpus has no
    * CDC feed [DATA]): version 0 = the snapshot itself; version 1 updates
    * every key ≡ 0 (mod 7) (price +100); version 2 deletes every key ≡ 0
    * (mod 13) and inserts a fresh key (+SynthKeyOffset) for every key ≡ 0
    * (mod 97). A key can appear in several versions (7·13 overlaps) — the
    * point of the exercise.
    */
  private def cdcLog(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val snap = o.select(
      col("o_orderkey").as("k"),
      lit(0L).as("version"),
      lit("I").as("op"),
      col("o_totalprice").as("price"),
      col("o_orderstatus").as("status"),
    )
    val upd = o
      .filter(col("o_orderkey") % 7 === 0)
      .select(
        col("o_orderkey").as("k"),
        lit(1L).as("version"),
        lit("U").as("op"),
        (col("o_totalprice") + 100d).as("price"),
        col("o_orderstatus").as("status"),
      )
    val del = o
      .filter(col("o_orderkey") % 13 === 0)
      .select(
        col("o_orderkey").as("k"),
        lit(2L).as("version"),
        lit("D").as("op"),
        col("o_totalprice").as("price"),
        col("o_orderstatus").as("status"),
      )
    // halve in exact integer cents: round(x*0.5, 2) puts every odd-cent price
    // exactly on a half-cent tie, where Spark (HALF_UP) and DuckDB break
    // differently — floor(cents/2)/100 has no tie to break
    val ins = o
      .filter(col("o_orderkey") % 97 === 0)
      .select(
        (col("o_orderkey") + SynthKeyOffset).as("k"),
        lit(2L).as("version"),
        lit("I").as("op"),
        (floor(round(col("o_totalprice") * 100, 0) / 2) / 100.0).as("price"),
        lit("N").as("status"),
      )
    snap.unionByName(upd).unionByName(del).unionByName(ins)
  }

  private val cdcLogSql =
    "SELECT o_orderkey AS k, CAST(0 AS BIGINT) AS version, 'I' AS op, " +
      "o_totalprice AS price, o_orderstatus AS status FROM orders " +
      "UNION ALL SELECT o_orderkey, 1, 'U', o_totalprice + 100, o_orderstatus " +
      "FROM orders WHERE o_orderkey % 7 = 0 " +
      "UNION ALL SELECT o_orderkey, 2, 'D', o_totalprice, o_orderstatus " +
      "FROM orders WHERE o_orderkey % 13 = 0 " +
      "UNION ALL SELECT o_orderkey + 1000000000000000, 2, 'I', " +
      "(CAST(round(o_totalprice * 100, 0) AS BIGINT) // 2) / 100.0, 'N' " +
      "FROM orders WHERE o_orderkey % 97 = 0"

  /** Apply the log: latest version wins per key, deletes drop the key.
    * `max_by(struct(...), version)` — versions are distinct per key by
    * construction, so the arg-max is unique and the result deterministic.
    */
  private def cdcApply(s: SparkSession, dir: String): DataFrame =
    cdcLog(s, dir)
      .groupBy("k")
      .agg(
        max_by(
          struct(col("version"), col("op"), col("price"), col("status")),
          col("version"),
        ).as("last")
      )
      .select(
        col("k").as("o_orderkey"),
        col("last.version").as("last_version"),
        col("last.op").as("last_op"),
        round(col("last.price"), 2).as("price"),
        col("last.status").as("o_orderstatus"),
      )
      .filter(col("last_op") =!= "D")
      .orderBy("o_orderkey")

  private val cdcApplySql =
    s"WITH log AS ($cdcLogSql), last AS (" +
      "SELECT k, version, op, price, status FROM log " +
      "QUALIFY row_number() OVER (PARTITION BY k ORDER BY version DESC) = 1) " +
      "SELECT k AS o_orderkey, version AS last_version, op AS last_op, " +
      "round(price, 2) AS price, status AS o_orderstatus " +
      "FROM last WHERE op <> 'D' ORDER BY o_orderkey"

  // --------------------------------------------------------- snapshot_diff

  /** Row signature for the diff: a 16-byte pair of seeded xxhash64s over
    * (key, text, lang, source). The signature is only ever compared
    * old-vs-new INSIDE one engine (the declared output carries statuses and
    * counts, never the hash), so an engine-specific hash is legitimate here.
    * The pair keeps the collision birthday bound at 128 bits (a lone 64-bit
    * hash starts colliding around 4 B rows — real at 100 TB). Note the
    * compression caveat measured in WarehouseSpec: hashes are incompressible,
    * so the signature only beats shuffling the raw row when the row is WIDE
    * (documents-class text/blob payloads) — for narrow relational rows the
    * LZ4'd raw shuffle is already small and a cdc_apply-style direct
    * formulation is the right tool.
    */
  private def rowSig(k: Column, text: Column): Column =
    struct(
      xxhash64(lit(1), k, text, col("lang"), col("source")),
      xxhash64(lit(2), k, text, col("lang"), col("source")),
    )

  /** DuckDB-side signature: md5 over the same logical tuple. The two engines
    * never compare signatures with each other — each only needs to detect
    * old≠new correctly on its own — so the functions need not match.
    */
  private def sigSql(kExpr: String, textExpr: String): String =
    s"md5(concat_ws('|', $kExpr, $textExpr, lang, source))"

  /** Version-to-version drift audit of the document corpus (the wide table —
    * exactly where signature diffing pays). v_new synthesized from
    * documents: doc_ids ≡ 0 (mod 11) dropped, a revision marker appended for
    * doc_ids ≡ 0 (mod 5), fresh doc_ids (+SynthKeyOffset) for doc_ids ≡ 0
    * (mod 31). Both sides reduce to (key, signature) map-side, so the ~1 KB
    * text column never reaches the full-outer join's exchange; the report is
    * one row per status, so the declared output is O(1).
    */
  private def snapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val vOld = d.select(col("doc_id").as("k"), rowSig(col("doc_id"), col("text")).as("sig_old"))
    val newText =
      when(col("doc_id") % 5 === 0, concat(col("text"), lit(" rev2"))).otherwise(col("text"))
    val vNew = d
      .filter(col("doc_id") % 11 =!= 0)
      .select(col("doc_id").as("k"), rowSig(col("doc_id"), newText).as("sig_new"))
      .unionByName(
        d.filter(col("doc_id") % 31 === 0)
          .select(
            (col("doc_id") + SynthKeyOffset).as("k"),
            rowSig(col("doc_id") + SynthKeyOffset, col("text")).as("sig_new"),
          )
      )
    vOld
      .join(vNew, Seq("k"), "full_outer")
      .withColumn(
        "status",
        when(col("sig_old").isNull, "added")
          .when(col("sig_new").isNull, "removed")
          .when(col("sig_old") =!= col("sig_new"), "changed")
          .otherwise("unchanged"),
      )
      .groupBy("status")
      .agg(nrows.as("n"), min(col("k")).as("min_key"), max(col("k")).as("max_key"))
      .orderBy("status")
  }

  private val snapshotDiffSql = {
    val sigOld = sigSql("doc_id", "text")
    val sigNewKept =
      sigSql("doc_id", "CASE WHEN doc_id % 5 = 0 THEN text || ' rev2' ELSE text END")
    "WITH v_old AS (SELECT doc_id AS k, " + sigOld + " AS sig_old FROM documents), " +
      "v_new AS (SELECT doc_id AS k, " + sigNewKept + " AS sig_new FROM documents " +
      "WHERE doc_id % 11 <> 0 " +
      "UNION ALL SELECT doc_id + 1000000000000000 AS k, " +
      sigSql("doc_id + 1000000000000000", "text") + " AS sig_new " +
      "FROM documents WHERE doc_id % 31 = 0) " +
      "SELECT CASE WHEN sig_old IS NULL THEN 'added' WHEN sig_new IS NULL THEN 'removed' " +
      "WHEN sig_old <> sig_new THEN 'changed' ELSE 'unchanged' END AS status, " +
      "count(*) AS n, min(k) AS min_key, max(k) AS max_key " +
      "FROM v_old FULL JOIN v_new USING (k) GROUP BY 1 ORDER BY status"
  }

  // -------------------------------------------------------- reshape_unpivot

  /** Wide→long reshape via `Dataset.unpivot` (the melt verb, Spark 3.4+),
    * then a per-(returnflag, metric) rollup — count and exact-decimal sum.
    * l_quantity/discount/tax are ≤ 2-decimal; extendedprice 2-decimal; scale
    * 4 covers all four through the shared value column.
    */
  private def reshapeUnpivot(s: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(s, dir)
      .select("l_returnflag", "l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
        "metric",
        "value",
      )
      .groupBy("l_returnflag", "metric")
      .agg(nrows.as("n"), round(dsum(col("value")), 4).as("total"))
      .orderBy("l_returnflag", "metric")

  private val reshapeUnpivotSql =
    "WITH long_f AS (" +
      "SELECT l_returnflag, 'l_quantity' AS metric, l_quantity AS value FROM lineitem " +
      "UNION ALL SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem " +
      "UNION ALL SELECT l_returnflag, 'l_discount', l_discount FROM lineitem " +
      "UNION ALL SELECT l_returnflag, 'l_tax', l_tax FROM lineitem) " +
      "SELECT l_returnflag, metric, count(*) AS n, " +
      "round(CAST(sum(CAST(value AS DECIMAL(28,4))) AS DOUBLE), 4) AS total " +
      "FROM long_f GROUP BY 1, 2 ORDER BY l_returnflag, metric"

  val entries: Seq[QueryDef] = Seq(
    QueryDef("cdc_apply", cdcApply, Some(cdcApplySql)),
    QueryDef("snapshot_diff", snapshotDiff, Some(snapshotDiffSql)),
    QueryDef("reshape_unpivot", reshapeUnpivot, Some(reshapeUnpivotSql)),
  )
}
