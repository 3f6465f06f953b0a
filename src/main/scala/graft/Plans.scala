package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit dump: `runMain graft.Plans <sfDir> [keys...]` prints the
  * formatted physical plan per declared query (all of them by default).
  * Used each round to re-check the scale invariants: filters/projections
  * reach the parquet scan (PushedFilters / ReadSchema), only
  * fixed-cardinality dims broadcast, orderBy+limit fuses to
  * TakeOrderedAndProject, no cartesian products outside the bounded cross
  * join, whole-stage codegen spans stay wide.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val keys = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    keys.foreach { k =>
      println(s"\n===== $k =====")
      println(SparkEntry.queries(k)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
