package graft

import org.apache.spark.sql.SparkSession

/** Perf gate: times every declared query at SPARK_GRAFT_SF_DIR and prints one
  * JSON line (driver contract).
  *
  * Each query is executed twice and the second (warm-JVM) time is reported:
  * at bench scale the first pass is dominated by one-off JIT compilation and
  * codegen class-loading, which says nothing about plan quality — the
  * steady-state pass is what corresponds to BASELINE.md's "warm session"
  * numbers. The reported total is the sum of the reported per-query times;
  * `"pass"` documents the policy.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      timeOnce(fn) // warm-up pass: JIT + codegen cache
      name -> timeOnce(fn)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","pass":"2nd-of-2 (warm)"}""")
    spark.stop()
  }
}
