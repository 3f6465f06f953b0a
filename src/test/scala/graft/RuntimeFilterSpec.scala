package graft

import org.apache.spark.sql.functions._

/** SURVEY §4 runtime-filtering: Spark's bloom-filter runtime join pruning.
  * When a shuffle join's build side carries a selective predicate, the
  * optimizer can inject `bloom_filter_agg` on the build side and a
  * `might_contain` probe on the fact side — the fact table is pruned
  * BEFORE its shuffle. At 100 TB this is the difference between shuffling
  * the whole fact table and shuffling only the fraction that can possibly
  * match; it composes with AQE and costs one extra small aggregation.
  *
  * The thresholds exist for real clusters (only bother when the probe scan
  * is ≥ 10 GB); the test lowers the scan threshold so the mechanism fires
  * at fixture scale, then MEASURES the probe-shuffle reduction rather than
  * trusting the plan string alone.
  */
class RuntimeFilterSpec extends SparkSpec {

  /** Set session confs for `body`, restoring previous values after — the
    * session is shared across suites (the CboSpec pattern).
    */
  private def withConfs[A](pairs: (String, String)*)(body: => A): A = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally prev.foreach { case (k, v) => v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  /** Selective dim–fact shuffle join: few orders survive the price floor,
    * so most lineitem rows cannot match and are bloom-prunable. Runs at
    * sf0.01 (60 k fact rows) so the fact shuffle dominates the sketch's own
    * exchange and the measured reduction has real margin.
    */
  private val rfDir = "/root/testdata/sf0.01"

  private def factJoin() = {
    val orders = Tables.orders(spark, rfDir).filter(col("o_totalprice") > 400000.0)
    val li = Tables.lineitem(spark, rfDir).select("l_orderkey", "l_returnflag", "l_quantity")
    li.join(orders, li("l_orderkey") === orders("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"))
  }

  test("bloom runtime filter is injected on the fact side and shrinks its shuffle (measured)") {
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // fixture scans are far below the 10 GB real-cluster floor
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // size the sketch to the fixture: the default (1 M expected items
      // ⇒ ~1 MB sketch PER partial-agg task — measured as 1.1 MiB task
      // binaries and a 468 KB exchange vs the fact side's 43 KB) would
      // itself out-shuffle the fact side and invert the comparison.
      // maxNumBits is the hard cap; expectedNumItems alone did not bite
      // because the creation-side row estimate overrides it.
      "spark.sql.optimizer.runtime.bloomFilter.expectedNumItems" -> "10000",
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits" -> "65536",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
    ) {
      val df = factJoin()
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(
        optimized.contains("might_contain"),
        "no bloom probe injected:\n" + optimized.take(2000),
      )
      assert(optimized.contains("bloom_filter_agg"), "no bloom build side:\n" + optimized.take(2000))
      val withBloom = shuffleBytes(df.collect())
      val without = withConfs("spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
        shuffleBytes(factJoin().collect())
      }
      assert(withBloom > 0 && without > 0, s"listener captured nothing ($withBloom / $without)")
      assert(
        withBloom < without,
        s"bloom filter did not reduce the fact-side shuffle: $withBloom B vs $without B",
      )
    }
  }

  test("results are identical with and without the runtime filter") {
    val withBloom = withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.expectedNumItems" -> "10000",
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits" -> "65536",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    ) { factJoin().orderBy("l_returnflag").collect().toSeq }
    val without = withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false"
    ) { factJoin().orderBy("l_returnflag").collect().toSeq }
    assert(withBloom == without, "bloom pruning changed the answer")
  }
}
