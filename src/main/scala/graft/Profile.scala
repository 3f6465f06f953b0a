package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler.
  *
  * `runMain graft.Profile <sfDir>` — times the dedup_minhash_lsh pipeline
  * stage by stage (warm, 2nd of 2) to locate the cost before optimizing.
  *
  * `runMain graft.Profile <sfDir> <key> [key...]` — times the named declared
  * queries with 3 INTERLEAVED passes each (q1 q2 q1 q2 ...): this VM has
  * multi-minute host-throttling windows, so consecutive same-query passes
  * alias throttling into the comparison; interleaving spreads it evenly.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    if (args.length > 1) { profileQueries(sfDir, args.drop(1).toSeq); return }
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
    time("signatures(agg)")(signatures(sh).count())
    time("signaturesNative")(signaturesNative(docs).count())
    time("candidates(agg)")(candidatePairs(signatures(sh)).count())
    time("candidates(native)")(candidatePairs(signaturesNative(docs)).count())
    val cands = candidatePairs(signaturesNative(docs))
    time("verifyPairs")(verifyPairs(cands, sh).count())
    time("full nearDupPairs")(nearDupPairs(docs).count())
    spark.stop()
  }

  private def profileQueries(sfDir: String, keys: Seq[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fns = keys.map(k => k -> SparkEntry.queries(k))
    fns.foreach { case (_, fn) => fn(spark, sfDir).count() } // warm-up pass
    val times = collection.mutable.Map[String, Vector[Double]]().withDefaultValue(Vector())
    (1 to 3).foreach { pass =>
      fns.foreach { case (k, fn) =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        times(k) :+= dt
        println(f"pass $pass  $k%-24s $dt%8.2f s")
      }
    }
    println("-" * 48)
    times.toSeq.sortBy(_._1).foreach { case (k, ts) =>
      println(f"$k%-24s min=${ts.min}%6.2f  med=${ts.sorted.apply(ts.size / 2)}%6.2f  max=${ts.max}%6.2f")
    }
    spark.stop()
  }
}
