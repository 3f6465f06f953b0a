package graft

import org.apache.spark.sql.SparkSession

/** Dev instrument: print a declared query's executed plan (after running
  * it, so AQE's FINAL plan is shown — reused exchanges, runtime join
  * strategy swaps, and coalesced stages are only visible post-execution).
  * Not part of the driver contract.
  *
  * Usage: runMain graft.PlanDump <key> [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val key = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(key)(spark, sfDir)
    df.collect()
    println(df.queryExecution.executedPlan.toString())
    spark.stop()
  }
}
