package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** SURVEY §4 partition pruning, DYNAMIC half (the static half is exercised
  * by the sink_parquet_part re-read and scan_parquet_pushdown plan pins):
  * when a partitioned fact table joins a dimension whose selective filter
  * is only known at runtime, Spark plans a `dynamicpruning` subquery on the
  * fact scan's partition filters and reuses the dim's broadcast to skip
  * whole partition directories. At 100 TB a date- or source-partitioned
  * fact table is the norm and the dim filter ("this week", "these sources")
  * prunes most of it — without DPP the scan reads every partition and the
  * join throws the rows away after IO is already spent.
  *
  * Like RuntimeFilterSpec, the spec MEASURES the effect (files actually
  * read, via the scan node's own metrics) instead of trusting the plan
  * string alone, and pins answer equality with the feature off.
  */
class PartitionPruningSpec extends SparkSpec {

  private def withConfs[A](pairs: (String, String)*)(body: => A): A = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally prev.foreach { case (k, v) => v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  /** events written partitioned by event_type — 5 directories. */
  private lazy val factDir: String = {
    val d = tmpDir("dpp-fact")
    Tables
      .events(spark, sfDir)
      .write
      .mode("overwrite")
      .partitionBy("event_type")
      .parquet(d)
    d
  }

  /** The dim's selective predicate is on `tag`, NOT the join key, so no
    * static partition filter on the fact side is derivable at plan time —
    * only DPP can prune. One tag survives ⇒ one fact partition of five.
    * The dim must be a REAL scan (parquet, not a local relation): the
    * PartitionPruning rule looks for a selective Filter over a source, and
    * a literal Seq constant-folds into a pre-filtered LocalTableScan with
    * no Filter node left for the rule to see.
    */
  private lazy val dimDir: String = {
    import spark.implicits._
    val d = tmpDir("dpp-dim")
    Seq(
      ("click", "pick"),
      ("view", "skip"),
      ("purchase", "skip"),
      ("signup", "skip"),
      ("error", "skip"),
    ).toDF("event_type", "tag").write.mode("overwrite").parquet(d)
    d
  }

  private def dimFiltered: DataFrame =
    spark.read.parquet(dimDir).filter(col("tag") === "pick")

  private def dppJoin(): DataFrame =
    spark.read
      .parquet(factDir)
      .join(dimFiltered, "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"))

  /** events persisted as a partitioned MANAGED CATALOG table (r9 verdict
    * #4: the Glue-defining surface — partition metadata lives in the
    * metastore, not just the directory layout). Idempotent across JVMs
    * sharing the warehouse dir, like CboSpec's fixtures.
    */
  private lazy val catalogFact: Unit = {
    spark.sql("DROP TABLE IF EXISTS dpp_events")
    val loc = new java.io.File("spark-warehouse/dpp_events")
    if (loc.exists()) {
      java.nio.file.Files
        .walk(loc.toPath)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
    }
    ops.Bucketing.writeCatalogTable(Tables.events(spark, sfDir), "dpp_events", "event_type")
  }

  private def dppCatalogJoin(): DataFrame =
    ops.Bucketing
      .readCatalogTable(spark, "dpp_events")
      .join(dimFiltered, "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"))

  /** Files read by the partitioned fact scan, from the executed plan's own
    * scan metrics (AQE-aware: unwrap to the final physical plan first).
    */
  private def factFilesRead(df: DataFrame, marker: String = "dpp-fact"): Long = {
    // AQE wraps executed subtrees in QueryStageExec LEAVES — plain collect
    // stops there, so recurse through stage boundaries explicitly.
    def scans(p: SparkPlan): Seq[FileSourceScanExec] =
      p.collect {
        case f: FileSourceScanExec => Seq(f)
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
      }.flatten
    val fact = scans(df.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains(marker)))
    assert(fact.nonEmpty,
      "partitioned fact scan not found in plan:\n" + df.queryExecution.executedPlan)
    fact.map(_.metrics("numFiles").value).sum
  }

  test("dynamic partition pruning injects a runtime partition filter and skips files (measured)") {
    withConfs("spark.sql.optimizer.dynamicPartitionPruning.enabled" -> "true") {
      val df = dppJoin()
      df.collect()
      val planStr = df.queryExecution.executedPlan.toString
      assert(planStr.contains("dynamicpruning"), "no dynamicpruning filter in plan:\n" + planStr.take(3000))
      val pruned = factFilesRead(df)
      val total = withConfs("spark.sql.optimizer.dynamicPartitionPruning.enabled" -> "false") {
        val off = dppJoin()
        off.collect()
        factFilesRead(off)
      }
      assert(total >= 5, s"expected >=5 files across 5 partitions without DPP, read $total")
      assert(
        pruned < total,
        s"DPP did not reduce files read: $pruned with vs $total without",
      )
    }
  }

  test("DPP fires against a partitioned METASTORE table and skips partition files (measured)") {
    catalogFact
    withConfs("spark.sql.optimizer.dynamicPartitionPruning.enabled" -> "true") {
      val df = dppCatalogJoin()
      df.collect()
      val planStr = df.queryExecution.executedPlan.toString
      assert(
        planStr.contains("dynamicpruning"),
        "no dynamicpruning filter on the catalog scan:\n" + planStr.take(3000),
      )
      val pruned = factFilesRead(df, marker = "dpp_events")
      val total = withConfs("spark.sql.optimizer.dynamicPartitionPruning.enabled" -> "false") {
        val off = dppCatalogJoin()
        off.collect()
        factFilesRead(off, marker = "dpp_events")
      }
      assert(total >= 5, s"expected >=5 files across 5 partitions without DPP, read $total")
      assert(pruned < total, s"DPP did not reduce catalog-table files read: $pruned with vs $total without")
    }
  }

  test("catalog-table DPP answer matches the path-based answer") {
    catalogFact
    val viaCatalog = withConfs("spark.sql.optimizer.dynamicPartitionPruning.enabled" -> "true") {
      dppCatalogJoin().orderBy("event_type").collect().toSeq
    }
    val viaPath = dppJoin().orderBy("event_type").collect().toSeq
    assert(viaCatalog == viaPath, "catalog-table join diverged from path-based join")
    assert(viaCatalog.nonEmpty && viaCatalog.head.getAs[Long]("n") > 0, "join matched nothing — fixture broken")
  }

  test("results are identical with and without dynamic partition pruning") {
    val on = withConfs("spark.sql.optimizer.dynamicPartitionPruning.enabled" -> "true") {
      dppJoin().orderBy("event_type").collect().toSeq
    }
    val off = withConfs("spark.sql.optimizer.dynamicPartitionPruning.enabled" -> "false") {
      dppJoin().orderBy("event_type").collect().toSeq
    }
    assert(on == off, "DPP changed the answer")
    assert(on.nonEmpty && on.head.getAs[Long]("n") > 0, "join matched nothing — fixture broken")
  }
}
