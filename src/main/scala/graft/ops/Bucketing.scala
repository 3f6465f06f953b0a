package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed co-located joins (SURVEY.md §7.4 scale register): pre-shuffle
  * both sides of a recurring join ONCE at write time (`bucketBy` on the join
  * key with matching bucket counts), and every subsequent join on that key
  * plans a sort-merge join with NO exchange on either side — at 100 TB the
  * difference between re-shuffling the fact table per query and reading
  * co-located buckets. BucketingSpec asserts the exchange-free plan and
  * result equality vs the plain join.
  */
object Bucketing {

  /** Persist a frame as a bucketed managed table (sorted within buckets so
    * the SMJ's sort is also pre-done on read where the reader supports it).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on the bucket key. */
  def joinBucketed(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Persist a frame as a PARTITIONED managed catalog table — the
    * Glue-style metastore surface (partition directories + a catalog entry
    * recording the partition columns). This is the layout dynamic partition
    * pruning plans against: a runtime `dynamicpruning` subquery on the
    * fact scan's partition filters skips whole directories when a joined
    * dim's selective filter resolves (PartitionPruningSpec pins the DPP
    * subquery in-plan AND the file-skip, measured, against a table written
    * through this helper). At 100 TB a date-/source-partitioned fact in
    * the metastore is the norm; `overwrite` keeps re-registration
    * idempotent across sessions sharing a warehouse dir.
    */
  def writeCatalogTable(df: DataFrame, table: String, partCols: String*): Unit =
    df.write
      .mode("overwrite")
      .partitionBy(partCols: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Catalog read — the partition-pruning-capable path (`spark.table`, not
    * `spark.read.parquet(dir)`: only the catalog carries the partition-
    * column metadata a DPP filter needs).
    */
  def readCatalogTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** True when a physical plan contains no shuffle exchange of any kind
    * (hash, range, or single-partition) — the property bucketed co-location
    * buys. Walks the plan (unwrapping AQE) rather than string-matching, so
    * broadcast exchanges don't false-positive and no shuffle flavor escapes.
    */
  def hasNoShuffle(df: DataFrame): Boolean = {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other                    => other
    }
    plan.collect { case s: ShuffleExchangeLike => s }.isEmpty
  }
}
