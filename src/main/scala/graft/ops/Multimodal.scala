package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (binary payload) columns: bytes + typed metadata, with the
  * decode step STUBBED (SURVEY.md §2.10 `multimodal_binary`; no media codecs
  * ship in this environment). The Spark-side plumbing — schema, opaque
  * BinaryType payloads, per-partition batched decode shape, frame sampling,
  * partitioned write — is real and tested (MultimodalSpec).
  *
  * The Scala analog of a vectorized pandas decode UDF is
  * `Dataset.mapPartitions`: one iterator per partition = one "batch" per
  * task, the codec (the expensive native resource) initialized once per
  * partition, rows streamed through it. `decodeStub` marks exactly where a
  * real codec call goes.
  */
object Multimodal {

  /** A media row: opaque bytes + typed metadata struct. */
  final case class MediaRow(id: Long, payload: Array[Byte], mime: String, width: Int, height: Int)

  /** Decoded features per media item. */
  final case class Decoded(id: Long, mime: String, n_bytes: Int, feature: Array[Float])

  /** Per-mime stats over the opaque payload — pure Column ops, no decode. */
  def perMimeStats(df: DataFrame): DataFrame =
    df.groupBy(col("mime"))
      .agg(
        count(lit(1)).as("n_items"),
        min(length(col("payload"))).cast("long").as("min_bytes"),
        max(length(col("payload"))).cast("long").as("max_bytes"),
        sum(length(col("payload")).cast("long")).as("total_bytes"),
      )
      .orderBy("mime")

  /** Byte-size histogram with fixed-width buckets. */
  def sizeHistogram(df: DataFrame, bucketBytes: Int): DataFrame =
    df.select((floor(length(col("payload")) / bucketBytes) * bucketBytes).as("bucket_lo"))
      .groupBy("bucket_lo")
      .agg(count(lit(1)).as("n"))
      .orderBy("bucket_lo")

  /** Batched decode: mapPartitions so a real codec would initialize once per
    * partition and process the partition as one batch. The decode kernel
    * here is a STUB — a deterministic fake derived from the payload bytes —
    * standing in for e.g. an image decoder; everything around it (typed
    * input/output schemas, batch shape, laziness) is production-shaped.
    */
  def decodeFeatures(ds: Dataset[MediaRow], dim: Int): Dataset[Decoded] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { batch =>
      // >>> real implementation: initialize the native codec HERE, once <<<
      batch.map { m =>
        // >>> STUB decode: deterministic bytes->feature fake, NOT a codec <<<
        val feature = Array.tabulate(dim) { i =>
          val b = if (m.payload.isEmpty) 0 else m.payload(i % m.payload.length) & 0xff
          ((b + i) % 256) / 255.0f
        }
        Decoded(m.id, m.mime, m.payload.length, feature)
      }
    }
  }

  /** Frame sampling: every nth frame index up to nFrames — the explode shape
    * of video-frame extraction (frame payload decode would be stubbed as
    * above).
    */
  def sampleFrames(df: DataFrame, nFramesCol: String, every: Int): DataFrame =
    df.select(
      col("id"),
      explode(sequence(lit(0), col(nFramesCol) - 1, lit(every))).as("frame_idx"),
    )

  /** Partitioned-by-mime sink + re-read (the lake layout for mixed media). */
  def writeByMime(df: DataFrame, path: String): DataFrame = {
    df.write.mode("overwrite").partitionBy("mime").parquet(path)
    df.sparkSession.read.parquet(path)
  }

  /** Chunked binary processing with a REAL cross-engine oracle: the payload
    * is `encode(text)` (the corpus is pure ASCII at every SF — verified —
    * so DuckDB can mirror every byte op on the VARCHAR side), chunked into
    * fixed 64-byte frames. Per doc: chunk counts, md5 of the first and
    * middle chunk, and an every-4th-chunk "frame sample" whose md5s roll up
    * into one digest. The frame sample is `sequence` + `transform` — pure
    * per-row arithmetic, ZERO shuffles for the whole query bar the declared
    * sort: this is the shape a real frame extractor keeps at 100 TB (the
    * stub md5 kernel swaps for a codec call inside the same transform).
    */
  def chunkStats(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .withColumn("n_bytes", length(col("payload")).cast("long"))
      .withColumn("n_chunks", expr("(n_bytes + 63) div 64"))
      .withColumn(
        "smpl",
        // n_chunks = 0 (empty doc) must give an empty sample like the
        // oracle's range(0, 0, 4) — Spark's sequence(0, -1, 4) THROWS
        expr(
          "CASE WHEN n_chunks > 0 THEN " +
            "transform(sequence(cast(0 as bigint), n_chunks - 1, cast(4 as bigint)), " +
            "i -> md5(substring(payload, cast(i * 64 + 1 as int), 64))) " +
            "ELSE array() END"
        ),
      )
      .select(
        col("doc_id"),
        col("n_bytes"),
        col("n_chunks"),
        size(col("smpl")).cast("long").as("n_sampled"),
        md5(expr("substring(payload, 1, 64)")).as("first_md5"),
        md5(expr("substring(payload, cast(((n_bytes div 64) div 2) * 64 + 1 as int), 64)"))
          .as("mid_md5"),
        md5(concat_ws("", col("smpl"))).as("sampled_md5"),
      )
      .orderBy("doc_id")

  private val chunkStatsSql =
    "WITH b AS (SELECT doc_id, text, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes FROM documents), " +
      "c AS (SELECT doc_id, text, n_bytes, (n_bytes + 63) // 64 AS n_chunks FROM b) " +
      "SELECT doc_id, n_bytes, n_chunks, " +
      "CAST(len(range(0, n_chunks, 4)) AS BIGINT) AS n_sampled, " +
      "md5(substring(text, 1, 64)) AS first_md5, " +
      "md5(substring(text, ((n_bytes // 64) // 2) * 64 + 1, 64)) AS mid_md5, " +
      "md5(array_to_string(list_transform(range(0, n_chunks, 4), " +
      "i -> md5(substring(text, i * 64 + 1, 64))), '')) AS sampled_md5 " +
      "FROM c ORDER BY doc_id"

  /** `multimodal_binary` is now fully oracled: the synthetic media set is a
    * pure function of id (mime = id mod 3 pick, payload length
    * 16 + (id·37) mod 4081), so the per-mime byte stats — everything the
    * declared query emits — mirror in three lines of SQL over
    * `range(300)`. The payload BYTES stay Spark-only (BinaryType round-trip
    * + decode plumbing covered in MultimodalSourcesSpec);
    * `multimodal_chunk_stats` carries the family's byte-content oracle via
    * the pure-ASCII VARCHAR trick.
    */
  private val perMimeStatsSql =
    "WITH m AS (SELECT i AS id, " +
      "CASE CAST(i % 3 AS INT) WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/jpeg' " +
      "ELSE 'audio/wav' END AS mime, " +
      "16 + (i * 37) % 4081 AS n FROM range(300) t(i)) " +
      "SELECT mime, CAST(count(*) AS BIGINT) AS n_items, CAST(min(n) AS BIGINT) AS min_bytes, " +
      "CAST(max(n) AS BIGINT) AS max_bytes, CAST(sum(n) AS BIGINT) AS total_bytes " +
      "FROM m GROUP BY 1 ORDER BY mime"

  val entries: Seq[graft.QueryDef] = Seq(
    graft.QueryDef(
      "multimodal_binary",
      (s, dir) => perMimeStats(synth(s, 300).toDF()),
      Some(perMimeStatsSql),
    ),
    graft.QueryDef(
      "multimodal_chunk_stats",
      (s, dir) => chunkStats(graft.Tables.documents(s, dir)),
      Some(chunkStatsSql),
    ),
  )

  /** Deterministic synthetic corpus for specs (no binary table in the test
    * data): payload bytes are a pure function of id.
    */
  def synth(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark
      .range(n.toLong)
      .as[Long]
      .map { id =>
        val mime = Seq("image/png", "image/jpeg", "audio/wav")((id % 3).toInt)
        val len = 16 + ((id * 37) % 4081).toInt
        val payload = Array.tabulate(len)(i => ((id * 131 + i * 17) % 256).toByte)
        MediaRow(id, payload, mime, 64 + (id % 512).toInt, 64 + (id % 256).toInt)
      }
  }
}
