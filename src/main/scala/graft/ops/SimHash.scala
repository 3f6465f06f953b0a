package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SimHash near-duplicate detection — the third dedup family (after exact
  * normalization and MinHash/Jaccard): a single 60-bit fingerprint per
  * document whose Hamming distance tracks cosine similarity of the token
  * multiset. Entirely relational, and — unlike MinHash, whose xxhash64
  * family is Spark-specific — built on md5, so BOTH engines compute
  * bit-identical fingerprints and the whole pipeline is oracle-checkable
  * end to end.
  *
  * Pipeline: tokens of normalized text (duplicates kept — occurrence counts
  * are the weights) → 60-bit token hash (first 15 hex chars of md5, parsed
  * identically cross-engine) → per (doc, bit) signed sums (+1 when the bit
  * is set, −1 otherwise; exact integer arithmetic, fully deterministic;
  * ties resolve to 1 via >= 0) → fingerprint = Σ bit<<i → banded
  * candidates → Hamming filter.
  *
  * Scale: fingerprints are one shuffle (doc_id) after a token explode; the
  * pair search splits the fingerprint into 4 bands of 15 bits — by
  * pigeonhole, any pair at Hamming <= 3 agrees on at least one full band,
  * so the band equi-join finds ALL such pairs with no all-pairs scan
  * (same candidate-generation shape as MinHash banding, with a
  * completeness guarantee instead of a recall curve).
  */
object SimHash {

  /** 60-bit SimHash fingerprint per doc_id: ONE groupBy(doc_id) carrying 60
    * signed-sum aggregate columns (the MinHashDedup.signatures shape), then
    * a single projection packs the sign bits — versus exploding every token
    * ×60 and shuffling twice, this is 1/60th the rows and one exchange.
    */
  def fingerprints(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = docs.select(
      col("doc_id"),
      explode(split(Text.normText(col(textCol)), " ")).as("tok"),
    )
    val bitSums = (0 until 60).map(i => sum(expr(s"2 * (shiftright(h, $i) & 1) - 1")).as(s"s_$i"))
    val packed = (0 until 60)
      .map(i => when(col(s"s_$i") >= 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _) // 60 positive terms < 2^60 — no ANSI overflow possible
    toks
      .select(
        col("doc_id"),
        expr("cast(conv(substring(md5(tok), 1, 15), 16, 10) AS BIGINT)").as("h"),
      )
      .groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), packed.as("fp"))
  }

  /** All pairs (id_a < id_b) of a 60-bit fingerprint frame at Hamming
    * distance <= maxHamming, via 4×15-bit banded candidates (complete for
    * maxHamming <= 3 by pigeonhole) + exact bit_count. The banding engine
    * shared by the text (SimHash) and media (MediaPhash) near-dup
    * families — any 60-bit locality-preserving signature plugs in.
    */
  def bandedHammingPairs(fp: DataFrame, idCol: String, maxHamming: Int): DataFrame = {
    val bands = fp
      .select(col(idCol).as("__id"), col("fp"), explode(expr("sequence(0, 3)")).as("band"))
      .select(col("__id"), col("fp"), col("band"), expr("shiftright(fp, band * 15) & 32767").as("bkey"))
    bands
      .select(col("__id").as("id_a"), col("fp").as("fa"), col("band"), col("bkey"))
      .join(
        bands.select(col("__id").as("id_b"), col("fp").as("fb"), col("band"), col("bkey")),
        Seq("band", "bkey"),
      )
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "fa", "fb")
      .distinct()
      .withColumn("hamming", expr("cast(bit_count(fa ^ fb) AS BIGINT)"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** All pairs (a < b) at Hamming distance <= maxHamming over document
    * text fingerprints.
    */
  def nearDupPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame =
    bandedHammingPairs(fingerprints(docs), "doc_id", maxHamming)

  private def dedupSimhash(s: SparkSession, dir: String): DataFrame =
    nearDupPairs(Tables.documents(s, dir)).orderBy("id_a", "id_b")

  val entries: Seq[QueryDef] = Seq(
    QueryDef(
      "dedup_simhash",
      dedupSimhash,
      Some(
        "WITH toks AS (SELECT doc_id, " +
          "unnest(string_split(lower(trim(regexp_replace(text, '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g'))), ' ')) AS tok FROM documents), " +
          "h AS (SELECT doc_id, ('0x' || substring(md5(tok), 1, 15))::BIGINT AS h FROM toks), " +
          "bits AS (SELECT doc_id, i, CASE WHEN sum(2 * ((h >> i) & 1) - 1) >= 0 " +
          "THEN 1::BIGINT ELSE 0::BIGINT END AS b " +
          "FROM h, (SELECT unnest(range(0, 60)) AS i) g GROUP BY doc_id, i), " +
          "fp AS (SELECT doc_id, CAST(sum(b << i) AS BIGINT) AS fp FROM bits GROUP BY doc_id), " +
          "bands AS (SELECT doc_id, fp, band, (fp >> (band * 15)) & 32767 AS bkey " +
          "FROM fp, (SELECT unnest(range(0, 4)) AS band) t), " +
          "cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.fp AS fa, b.fp AS fb " +
          "FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id) " +
          "SELECT id_a, id_b, CAST(bit_count(xor(fa, fb)) AS BIGINT) AS hamming FROM cand " +
          "WHERE bit_count(xor(fa, fb)) <= 3 ORDER BY id_a, id_b"
      ),
    ),
  )
}
