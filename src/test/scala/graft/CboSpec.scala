package graft

import org.apache.spark.sql.functions._

/** SURVEY §4 join-reorder row: the ANALYZE → catalog-statistics → cost-based
  * optimizer path. AQE re-plans from runtime shuffle sizes; CBO plans from
  * collected stats BEFORE execution — at 100 TB that is the difference
  * between starting with the right join tree and fixing it mid-query.
  * This spec demonstrates the full path: saveAsTable, ANALYZE TABLE (table +
  * column stats), stats visible in the optimized plan, and the cost-based
  * join reorder actually changing a deliberately bad join order.
  */
class CboSpec extends SparkSpec {

  private def withCbo[A](body: => A): A = {
    val prev = Seq(
      "spark.sql.cbo.enabled" -> spark.conf.get("spark.sql.cbo.enabled"),
      "spark.sql.cbo.joinReorder.enabled" -> spark.conf.get("spark.sql.cbo.joinReorder.enabled"),
    )
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      body
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) } // shared session
  }

  /** saveAsTable + ANALYZE, idempotent across JVMs: the catalog is in-memory
    * per session but the warehouse directory persists, so a stale location
    * must be cleared before CREATE TABLE AS.
    */
  private lazy val analyzedTables: Unit = {
    def clean(t: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        java.nio.file.Files
          .walk(loc.toPath)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
    Seq("cbo_customer", "cbo_orders", "cbo_nation").foreach(clean)
    Tables.customer(spark, sfDir).write.saveAsTable("cbo_customer")
    Tables.orders(spark, sfDir).write.saveAsTable("cbo_orders")
    Tables.nation(spark, sfDir).write.saveAsTable("cbo_nation")
    Seq("cbo_customer", "cbo_orders", "cbo_nation").foreach { t =>
      spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS")
    }
  }

  test("ANALYZE TABLE propagates row and column stats into the optimized plan under CBO") {
    analyzedTables
    withCbo {
      val expected = Map(
        "cbo_customer" -> spark.table("cbo_customer").count(),
        "cbo_orders" -> spark.table("cbo_orders").count(),
        "cbo_nation" -> 25L,
      )
      expected.foreach { case (t, n) =>
        val stats = spark.table(t).queryExecution.optimizedPlan.stats
        assert(stats.rowCount.contains(BigInt(n)), s"$t rowCount stat: ${stats.rowCount}")
      }
      // column-level stats (distinctCount etc.) must reach the plan too —
      // they are what the join cost model prices with
      val joined = spark
        .table("cbo_orders")
        .join(spark.table("cbo_customer"), col("o_custkey") === col("c_custkey"))
      val attrStats = joined.queryExecution.optimizedPlan.stats.attributeStats
      assert(attrStats.nonEmpty, "no column stats propagated to the join plan")
      assert(
        attrStats.exists { case (a, s) => a.name == "o_custkey" && s.distinctCount.isDefined },
        s"o_custkey has no distinctCount among ${attrStats.keys.map(_.name)}",
      )
    }
  }

  test("cost-based join reorder rewrites a deliberately bad join order") {
    analyzedTables
    // written order: orders ⋈ customer (big ⋈ big) first, then the filtered
    // 25-row nation last. With stats + CBO the optimizer should NOT keep the
    // written tree verbatim.
    def plan(): String = {
      val o = spark.table("cbo_orders")
      val c = spark.table("cbo_customer")
      val n = spark.table("cbo_nation").filter(col("n_regionkey") === 0)
      o.join(c, col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n"))
        .queryExecution
        .optimizedPlan
        .toString
    }
    val baseline = plan()
    val reordered = withCbo(plan())
    // the reorder is observable as a different optimized join tree; both
    // trees must still produce identical results (checked at execution)
    assert(baseline.nonEmpty && reordered.nonEmpty)
    val resBase = {
      val o = spark.table("cbo_orders")
      val c = spark.table("cbo_customer")
      val n = spark.table("cbo_nation").filter(col("n_regionkey") === 0)
      o.join(c, col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n"))
        .orderBy("n_name")
        .collect()
        .toSeq
    }
    val resCbo = withCbo {
      val o = spark.table("cbo_orders")
      val c = spark.table("cbo_customer")
      val n = spark.table("cbo_nation").filter(col("n_regionkey") === 0)
      o.join(c, col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n"))
        .orderBy("n_name")
        .collect()
        .toSeq
    }
    assert(resBase == resCbo, "CBO changed the RESULT, not just the plan")
    // deterministic given the collected stats: the cost model must not keep
    // the written big ⋈ big tree once it can price the 25-row nation side
    assert(baseline != reordered, "CBO + stats left the deliberately bad join order unchanged")
  }
}
