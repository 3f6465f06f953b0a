package graft

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The operator catalog is assembled from the per-area modules under
  * graft.ops; each QueryDef pairs the Spark plan builder with its DuckDB
  * oracle SQL (None ⇒ scalatest-only, not declared to the hash gate).
  */
object SparkEntry {
  /** Raw (pre-ListMap) catalog, exposed so the CatalogSpec unique-key lint
    * can detect a duplicate name before ListMap silently last-wins it.
    */
  private[graft] def catalog: Seq[QueryDef] =
    ops.Relational.entries ++ ops.Sources.entries ++ ops.Scalars.entries ++
      ops.Udaf.entries ++ ops.Events.entries ++ ops.Text.entries ++
      ops.TextQuality.entries ++
      ops.SimHash.entries ++ ops.MinHashDedup.entries ++
      ops.Vectors.entries ++ ops.LshAnn.entries ++ ops.IvfAnn.entries ++
      ops.Approx.entries ++ ops.Multimodal.entries ++ ops.Pipeline.entries ++
      ops.Curation.entries ++ ops.Mixes.entries ++ ops.CorpusPrep.entries ++
      ops.Analytics.entries ++ ops.Warehouse.entries ++ ops.Graph.entries ++
      ops.Spatial.entries ++ ops.Retrieval.entries ++ ops.Mining.entries ++
      ops.Insights.entries ++ ops.Stats.entries ++ ops.Robust.entries ++
      ops.Modeling.entries ++ ops.Resampling.entries ++ ops.Evaluation.entries ++
      ops.Integrity.entries ++ ops.Decision.entries ++ ops.Governance.entries ++
      ops.Lexicon.entries ++ ops.Reach.entries ++ ops.Health.entries ++
      ops.PqAnn.entries ++ ops.IvfPq.entries ++
      ops.SemDedup.entries ++ ops.MediaPhash.entries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("agg_groupby_pricing")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ListMap(catalog.map(q => q.name -> q.fn): _*)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ListMap(catalog.collect { case QueryDef(n, _, Some(sql)) => n -> sql }: _*)
}
