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
    if (args.length > 1 && args(1) == "--decon") { profileDecon(sfDir); return }
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

  /** Stage-by-stage timing of decontaminate_semantic's pipeline (r13) —
    * warm (2nd of 2) per stage, cumulative plan per row, so the DELTA
    * between consecutive rows localizes the cost.
    */
  private def profileDecon(sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    import ops.{IvfAnn, LshAnn, SemDedup}
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    // per-stage wall clock: stageId -> (name, sec), drained per time() call
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Double)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val sec = (for {
          s <- i.submissionTime; c <- i.completionTime
        } yield (c - s) / 1e3).getOrElse(-1.0)
        val cpu = i.taskMetrics.executorCpuTime / 1e9
        stages.add((i.stageId, f"tasks=${i.numTasks}%4d cpu=$cpu%7.2f", sec))
      }
    })
    def time(name: String)(f: => Long): Unit = {
      f // warm
      stages.clear()
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
      if (sys.env.contains("GRAFT_PROFILE_STAGES")) {
        Thread.sleep(200)
        stages.toArray(Array.empty[(Int, String, Double)]).sortBy(-_._3).take(6).foreach {
          case (id, nm, sec) => println(f"    stage $id%5d $sec%7.2f s  $nm")
        }
      }
    }
    val vecBucket =
      conv(substring(md5(col("vec_id").cast("string")), 1, 4), 16, 10).cast("long") % 100
    val e = Tables
      .embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .repartition(spark.sparkContext.defaultParallelism, col("vec_id"))
    val corpus = e.filter(vecBucket < SemDedup.SemEvalBucketMin)
    val evalSet = e.filter(vecBucket >= SemDedup.SemEvalBucketMin)
    val centA = IvfAnn.gridCentroidArraysOf(corpus)
    time("train (uncached)")(centA.count())
    time("corpusCells route")(IvfAnn.routeToCells(corpus, centA, 1).count())
    val corpusCells = IvfAnn.routeToCells(corpus, centA, 1).select("vec_id", "cid")
    val evalRoutes = IvfAnn
      .routeToCells(evalSet, centA, SemDedup.IvfProbes)
      .select(col("vec_id").as("eval_id"), col("cid"))
    time("evalRoutes")(evalRoutes.count())
    val candCell = corpusCells.join(broadcast(evalRoutes), "cid").select("vec_id", "eval_id")
    time("candCell")(candCell.count())
    val planes = LshAnn.dynamicPlanes(e.count())
    val bk0 = LshAnn.bucketize(e.select(col("vec_id"), col("embedding").as("v")), "vec_id", "v", planes)
    time("bucketize")(bk0.count())
    val bk = bk0
      .withColumn("occ", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("table", "bucket")))
      .filter(col("occ") <= SemDedup.SemLshCap)
      .drop("occ")
    val corpusBk = bk.filter(vecBucket < SemDedup.SemEvalBucketMin)
    val evalBk = bk
      .filter(vecBucket >= SemDedup.SemEvalBucketMin)
      .select(col("vec_id").as("eval_id"), col("table"), col("bucket"))
    // micro: isolate the dot-kernel cost shapes
    val planesM = LshAnn.dynamicPlanes(e.count())
    val planesLit = typedlit(planesM.map(_.map(_.map(_.toFloat).toSeq).toSeq).toSeq)
    val dcs = for { t <- planesM.indices; j <- planesM(t).indices } yield
      ops.Vectors.nativeDot(col("embedding"), element_at(element_at(planesLit, t + 1), j + 1))
    time("micro dots64 literal")(
      e.select(dcs.map(sum): _*).count())
    time("micro self-dot x64")(
      e.select((1 to 64).map(_ => sum(ops.Vectors.nativeDot(col("embedding"), col("embedding")))): _*).count())
    time("bk (window)")(bk.count())
    time("corpusBk")(corpusBk.count())
    val candLsh = corpusBk.join(broadcast(evalBk), Seq("table", "bucket")).select("vec_id", "eval_id")
    time("candLsh")(candLsh.count())
    if (sys.env.contains("GRAFT_PROFILE_EXPLAIN")) candLsh.explain("formatted")
    val ev = evalSet.select(col("vec_id").as("eval_id"), col("embedding").as("evec"))
    val out = candCell
      .unionByName(candLsh)
      .join(corpus.select(col("vec_id"), col("embedding").as("cvec")), "vec_id")
      .join(broadcast(ev), "eval_id")
      .withColumn("dot", ops.Vectors.nativeDot(col("cvec"), col("evec")))
      .filter(col("dot") >= SemDedup.SemThreshold)
      .groupBy("vec_id")
      .agg(countDistinct(col("eval_id")).as("n_eval_matches"), round(max(col("dot")), 4).as("max_sim"))
    time("full verify+agg")(out.count())
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
    // GRAFT_PROFILE_STAGES: per-key top stages by wall time with task count,
    // total executor CPU, shuffle read/write and SPILL bytes — the
    // huge-method / single-task / under-partitioned-aggregate pathology
    // detector (see profileDecon; r13, spill columns r14)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Double)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val sec = (for { s <- i.submissionTime; c <- i.completionTime } yield (c - s) / 1e3)
          .getOrElse(-1.0)
        val m = i.taskMetrics
        val cpu = m.executorCpuTime / 1e9
        def mb(b: Long) = b / 1e6
        stages.add((
          i.stageId,
          f"tasks=${i.numTasks}%4d cpu=$cpu%7.2f shW=${mb(m.shuffleWriteMetrics.bytesWritten)}%8.0fMB " +
            f"shR=${mb(m.shuffleReadMetrics.totalBytesRead)}%8.0fMB " +
            f"spillMem=${mb(m.memoryBytesSpilled)}%8.0fMB spillDisk=${mb(m.diskBytesSpilled)}%7.0fMB",
          sec,
        ))
      }
    })
    def dumpStages(): Unit =
      if (sys.env.contains("GRAFT_PROFILE_STAGES")) {
        Thread.sleep(200)
        stages.toArray(Array.empty[(Int, String, Double)]).sortBy(-_._3).take(8).foreach {
          case (id, nm, sec) => println(f"    stage $id%5d $sec%7.2f s  $nm")
        }
        stages.clear()
      }
    val fns = keys.map(k => k -> SparkEntry.queries(k))
    fns.foreach { case (_, fn) => fn(spark, sfDir).count() } // warm-up pass
    stages.clear()
    val times = collection.mutable.Map[String, Vector[Double]]().withDefaultValue(Vector())
    // guarded parse (r14 ADVICE): a non-numeric value must not crash the
    // profiler, and 0/negative must not silently skip every timed pass
    val nPasses = math.max(
      1,
      sys.env
        .get("GRAFT_PROFILE_PASSES")
        .flatMap(v => scala.util.Try(v.trim.toInt).toOption)
        .getOrElse(3),
    )
    (1 to nPasses).foreach { pass =>
      fns.foreach { case (k, fn) =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        times(k) :+= dt
        println(f"pass $pass  $k%-24s $dt%8.2f s")
        dumpStages()
      }
    }
    println("-" * 48)
    times.toSeq.sortBy(_._1).foreach { case (k, ts) =>
      println(f"$k%-24s min=${ts.min}%6.2f  med=${ts.sorted.apply(ts.size / 2)}%6.2f  max=${ts.max}%6.2f")
    }
    spark.stop()
  }
}
