package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Sources / sinks / catalog surface (SURVEY.md §2.1).
  *
  * `scan_parquet` / `scan_parquet_pushdown` live in Relational; this module
  * adds the catalog (temp-view + SQL text) entry point and the job-bookmark
  * incremental-read pattern as declared queries, and the CSV/JSON/partitioned
  * write round-trip helpers that SourcesSpec exercises (no corpus fixture
  * exists for those formats, so they are scalatest-covered per SURVEY §2.1).
  */
object Sources {

  /** Glue Data Catalog equivalent: register a table under a name and answer
    * SQL text against it — the spark.sql entry point, same plan as the
    * DataFrame API would build.
    */
  private def sinkCatalog(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("graft_orders_v")
    s.sql(
      "SELECT o_orderstatus, COUNT(*) AS n_orders, " +
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_price " +
        "FROM graft_orders_v GROUP BY o_orderstatus ORDER BY o_orderstatus"
    )
  }

  /** Job-bookmark equivalent: read only events after a checkpoint. The
    * checkpoint bound goes through [[Tables.eventsSince]], which applies it
    * to the RAW parquet column so it pushes into the scan under either ts
    * encoding (row-group skip on ts statistics) — at 100 TB the incremental
    * read touches only new row groups. Output includes the new
    * high-watermark a bookmark store would persist.
    * Checkpoint: 2024-03-01T00:00:00Z. DuckDB truncates sub-µs on its side,
    * so the bound uses `checkpoint_ns + 999` — both engines cut at exactly
    * the same µs and sub-µs residue can never flip a boundary event.
    */
  private def incrementalRead(s: SparkSession, dir: String): DataFrame =
    Tables
      .eventsSince(s, dir, 1709251200000000999L)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_new"),
        max(expr("ts div 1000")).as("new_watermark_us"),
      )
      .orderBy("event_type")

  // ------------------------------------------- scalatest-covered helpers

  /** CSV ingestion with header + explicit schema (Glue crawler-less path). */
  def readCsv(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).option("header", "true").csv(path)

  /** CSV ingestion with schema inference (Glue crawler path). */
  def readCsvInferred(s: SparkSession, path: String): DataFrame =
    s.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** JSON-lines ingestion, nested struct inference. */
  def readJson(s: SparkSession, path: String): DataFrame =
    s.read.json(path)

  /** Partitioned parquet sink (write_dynamic_frame partitionKeys equivalent).
    * Returns the re-read frame so tests can assert round-trip equality and
    * partition pruning.
    */
  def writePartitioned(df: DataFrame, path: String, partCols: Seq[String]): DataFrame = {
    df.write.mode("overwrite").partitionBy(partCols: _*).parquet(path)
    df.sparkSession.read.parquet(path)
  }

  /** ORC round trip (the other columnar lake format Spark bundles natively —
    * a reference user with ORC data switches formats with one word). ORC
    * supports the same predicate pushdown/column pruning path as parquet;
    * SourcesSpec asserts the round trip and the pushed filter.
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(s: SparkSession, path: String): DataFrame =
    s.read.orc(path)

  /** Schema-evolution read (Glue crawler / schema-registry equivalent):
    * union the schemas of parquet shards written at different pipeline
    * versions. Older shards surface the added columns as null; `reconcile`
    * is the explicit backfill projection a job applies on top. mergeSchema
    * reads every footer once (driver-side listing cost, not a data scan) —
    * at 100 TB you enable it per-evolution-boundary, not on every read,
    * which is why it is an opt-in helper and not baked into Tables.
    */
  def readMergedSchema(s: SparkSession, paths: Seq[String]): DataFrame =
    s.read.option("mergeSchema", "true").parquet(paths: _*)

  /** Backfill nulls introduced by schema evolution with explicit defaults:
    * the deterministic, auditable alternative to silently-null columns.
    */
  def reconcile(df: DataFrame, defaults: Map[String, Any]): DataFrame =
    defaults.foldLeft(df) { case (d, (c, v)) =>
      d.withColumn(c, coalesce(col(c), lit(v)))
    }

  /** Range-layout write: co-locate and order rows by `rangeCol` so every
    * output file covers a disjoint key range. Parquet then stores tight
    * min/max stats per row group, and any reader filtering on that column
    * skips whole files/row groups — the single cheapest scan-locality lever
    * at 100 TB (a poor man's clustering index; Z-order generalizes it to
    * multiple columns). `numFiles` sizes files independently of upstream
    * partitioning.
    */
  def writeRangeLayout(df: DataFrame, path: String, rangeCol: String, numFiles: Int): Unit =
    df.repartitionByRange(numFiles, col(rangeCol))
      .sortWithinPartitions(rangeCol)
      .write
      .mode("overwrite")
      .parquet(path)

  /** Z-order (Morton) key: interleave the top `bits` bits of two columns
    * already normalized to [0, 2^bits). Pure bitwise Column arithmetic —
    * stays in whole-stage codegen, no UDF. Range-partitioning on this key
    * gives BOTH dimensions file-level locality, where sorting on one column
    * leaves the other scattered across the full domain in every file.
    */
  def zorderKey(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits)
      .map { i =>
        val aBit = shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        val bBit = shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
        aBit.bitwiseOR(bBit)
      }
      .reduce(_ bitwiseOR _)

  /** Z-order layout write: normalize two numeric columns to 16-bit grids
    * (one tiny min/max agg — a scalar broadcast, not a shuffle of the data),
    * interleave, and range-partition on the interleaved key. Each output
    * file then covers a compact rectangle in (a, b) space, so parquet
    * min/max stats prune files for predicates on EITHER column — the
    * multi-dimensional generalization of writeRangeLayout.
    */
  def writeZOrder(df: DataFrame, path: String, colA: String, colB: String, numFiles: Int): Unit = {
    val bits = 16
    val grid = (1L << bits) - 1
    val stats = df
      .agg(
        min(col(colA)).cast("double").as("amin"),
        max(col(colA)).cast("double").as("amax"),
        min(col(colB)).cast("double").as("bmin"),
        max(col(colB)).cast("double").as("bmax"),
      )
      .first()
    def scaled(c: String, lo: Double, hi: Double): Column = {
      val span = if (hi > lo) hi - lo else 1.0
      least(lit(grid), floor((col(c).cast("double") - lit(lo)) / lit(span) * lit(grid.toDouble)))
        .cast("long")
    }
    df.withColumn(
      "__z",
      zorderKey(
        scaled(colA, stats.getDouble(0), stats.getDouble(1)),
        scaled(colB, stats.getDouble(2), stats.getDouble(3)),
        bits,
      ),
    ).repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write
      .mode("overwrite")
      .parquet(path)
  }

  /** Small-file compaction (the OPTIMIZE/compaction job every long-running
    * ingest needs): re-read a directory fragmented by many tiny writes and
    * rewrite it as ~`targetRecords`-row files. File count is derived from
    * the actual row count (a parquet metadata read — no data scan) and the
    * rows are ROUND-ROBIN repartitioned, so output files are size-balanced
    * regardless of how skewed the input fragments were. maxRecordsPerFile
    * is a per-task hard cap on top, for when upstream rebalance is
    * imperfect. At 100 TB the small-file problem is a scan-latency and
    * NameNode/listing killer; compaction cost is one read + one write of
    * the fragment set, embarrassingly parallel.
    */
  def compactFiles(s: SparkSession, inPath: String, outPath: String, targetRecords: Long): DataFrame = {
    val df = s.read.parquet(inPath)
    val nFiles = math.max(1L, (df.count() + targetRecords - 1) / targetRecords).toInt
    df.repartition(nFiles)
      .write
      .option("maxRecordsPerFile", targetRecords)
      .mode("overwrite")
      .parquet(outPath)
    s.read.parquet(outPath)
  }

  /** Opaque-binary ingestion via Spark's `binaryFile` source — the real
    * entry point for the multimodal path (Multimodal.scala synthesizes its
    * media set in-plan; this reads actual files on disk into the same
    * (path, length, content) shape, mime derived from the extension).
    * Each file must fit in one row (spark caps at
    * spark.sql.sources.binaryFile.maxLength = Int.MaxValue); at 100 TB the
    * parallelism unit is the file, so shard media into many objects and
    * let partition planning bin-pack them.
    */
  def readBinaryFiles(s: SparkSession, dir: String, glob: String = "*"): DataFrame =
    s.read
      .format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        col("path"),
        col("length"),
        lower(regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1)).as("ext"),
        col("content"),
      )

  // ------------------------------------------------------------- catalog

  val entries: Seq[QueryDef] = Seq(
    QueryDef(
      "sink_catalog",
      sinkCatalog,
      Some(
        "SELECT o_orderstatus, COUNT(*) AS n_orders, " +
          "CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_price " +
          "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"
      ),
    ),
    QueryDef(
      "incremental_read",
      incrementalRead,
      Some(
        "SELECT event_type, COUNT(*) AS n_new, max(epoch_ns(ts) // 1000) AS new_watermark_us " +
          "FROM events WHERE epoch_ns(ts) > 1709251200000000 * 1000 " +
          "GROUP BY event_type ORDER BY event_type"
      ),
    ),
  )
}
