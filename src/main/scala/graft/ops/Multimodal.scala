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
        min(length(col("payload"))).as("min_bytes"),
        max(length(col("payload"))).as("max_bytes"),
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

  /** Declared rows-only: the corpus has no binary table, so the query runs
    * per-mime stats over the deterministic synthetic media set (payloads are
    * a pure function of id — identical on every run, so the driver's
    * rows-only check is stable; a byte-level DuckDB oracle would mean
    * re-implementing the generator in SQL for no added signal).
    */
  val entries: Seq[graft.QueryDef] = Seq(
    graft.QueryDef(
      "multimodal_binary",
      (s, dir) => perMimeStats(synth(s, 300).toDF()),
      None,
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
