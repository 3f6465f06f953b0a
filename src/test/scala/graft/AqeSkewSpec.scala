package graft

import org.apache.spark.sql.functions._

/** Proves the runtime half of the skew story: AQE's OptimizeSkewedJoin
  * actually splits a skewed partition on this build (the salted join in
  * Approx is the explicit pattern for paths AQE can't reach — bucketed
  * pre-partitioned writes). Thresholds are lowered so a deliberately
  * 90%-one-key dataset trips skew handling at test scale; at 100 TB the
  * defaults (256 MB advisory size, 5× median factor) play the same role.
  */
class AqeSkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed sort-merge join partition (skew=true in the final plan)") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ so skew handling applies
    )
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 100k fact rows, 90% on key 0; dim has one row per key
      val fact = spark
        .range(100000L)
        .select(
          when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id") % 97).as("k"),
          concat(lit("payload-"), col("id")).as("payload"),
        )
      val dim = spark.range(97L).select(col("id").as("k"), (col("id") * 2).as("v"))
      // no aggregation downstream: a groupBy on the join key would REQUIRE
      // the join's hash partitioning and AQE then refuses to split the skewed
      // partition; a filter keeps the join output partitioning-free.
      val joined = fact
        .join(dim, "k")
        .select((col("v") + length(col("payload"))).as("x"))
        .filter(col("x") < 0)
      // collect() executes THIS DataFrame's queryExecution (count() would
      // plan a separate query and leave this one isFinalPlan=false)
      assert(joined.collect().isEmpty)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("SortMergeJoin"), finalPlan.take(800))
      assert(
        finalPlan.contains("skew=true"),
        s"AQE did not mark the skewed join; plan:\n${finalPlan.take(2000)}",
      )
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
  }
}
