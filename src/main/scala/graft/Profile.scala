package graft

import org.apache.spark.sql.SparkSession

/** Scratch stage profiler: `runMain graft.Profile <sfDir>` times the
  * dedup_minhash_lsh pipeline stage by stage (warm, 2nd of 2) to locate
  * the cost before optimizing.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import ops.MinHashDedup._
    val docs = Tables.documents(spark, sfDir)
    def time(name: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }
    time("shingleSet")(shingleSet(docs).count())
    val sh = shingleSet(docs)
    time("signatures")(signatures(sh).count())
    val sig = signatures(sh)
    time("candidatePairs")(candidatePairs(sig).count())
    val cands = candidatePairs(sig)
    time("verifyPairs")(verifyPairs(cands, sh).count())
    time("full nearDupPairs")(nearDupPairs(docs).count())
    spark.stop()
  }
}
