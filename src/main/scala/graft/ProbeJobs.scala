package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev instrument: run one declared query and report driver-job / stage
  * counts and wall time — the fixed-overhead profile behind keys like
  * dedup_semantic whose sf0.1 cost is scheduling, not data. Not part of the
  * driver contract; used to verify the r10 job-count cut (r8 verdict #3).
  *
  * Usage: runMain graft.ProbeJobs <key> [sfDir] [reps]
  */
object ProbeJobs {
  def main(args: Array[String]): Unit = {
    val key = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicLong(0)
    val stages = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = { stages.incrementAndGet(); () }
    })
    val q = SparkEntry.queries(key)
    q(spark, sfDir).count() // warm-up (JIT + codegen), untimed
    (1 to reps).foreach { i =>
      Thread.sleep(200) // let async listener events drain between reps
      jobs.set(0); stages.set(0)
      val t0 = System.nanoTime()
      val n = q(spark, sfDir).count()
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(400)
      println(f"[probe] $key rep$i: rows=$n jobs=${jobs.get} stages=${stages.get} time=$secs%.3f s")
    }
    spark.stop()
  }
}
