package graft

import org.apache.spark.sql.functions._

/** Laws for the §2.16 graph verb: the distributed 3-iteration PageRank must
  * equal a straight-line in-memory reimplementation EXACTLY (the integer
  * picorank design admits bit-equality, not tolerance), conserve mass up to
  * the documented floor leak, and concentrate rank on high-degree nodes.
  */
class GraphSpec extends SparkSpec {

  private def run() = SparkEntry.queries("graph_pagerank")(spark, sfDir)

  test("graph_pagerank: exact match vs in-memory reference, mass conservation, degree monotonicity") {
    val e0 = Tables
      .lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), (col("l_suppkey") + 1000000000000L).as("sp"))
      .distinct()
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))

    val edges = e0.map { case (c, s) => (c, s) } ++ e0.map { case (c, s) => (s, c) }
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val nodes = edges.map(_._1).distinct.sorted
    val n = nodes.length.toLong

    // reference: same integer arithmetic, scalar loop
    var rank = nodes.map(_ -> 1000000000000L / n).toMap
    for (_ <- 1 to 3) {
      val m = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      edges.foreach { case (src, dst) => m(dst) += rank(src) / deg(src) }
      rank = nodes.map(v => v -> (150000000000L / n + (17L * m(v)) / 20L)).toMap
    }

    val got = run().collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("rank_pico")).toMap
    assert(got.size == n)
    nodes.foreach { v =>
      assert(got(v) == rank(v), s"node $v: spark ${got(v)} != reference ${rank(v)}")
    }

    // mass conservation: floors shed at most (1 + 20 + deg) units per node
    // per round — total stays within a narrow band under the initial 1e12
    val total = got.values.sum
    val leakBound = 3L * (21L * n + edges.length.toLong)
    assert(total <= 1000000000000L, s"mass grew: $total")
    assert(total >= 1000000000000L - leakBound, s"mass leak beyond bound: $total")

    // degree monotonicity: suppliers aggregate orders from many customers,
    // so mean supplier rank must exceed mean customer rank
    val (supp, cust) = got.partition(_._1 >= 1000000000000L)
    val meanSupp = supp.values.sum.toDouble / supp.size
    val meanCust = cust.values.sum.toDouble / cust.size
    assert(meanSupp > meanCust, s"supplier mean $meanSupp <= customer mean $meanCust")
  }

  test("graph_pagerank reads each base table exactly once despite 3 unrolled iterations") {
    // the edge subplan is referenced ~10x across iterations; the plan string
    // shows dozens of scans, but AQE's runtime stage reuse must collapse
    // them to ONE lineitem + ONE orders read — the property that makes the
    // unrolled-iteration formulation viable at 100 TB. Pinned on measured
    // input records, not on plan text.
    val expected =
      Tables.lineitem(spark, sfDir).count() + Tables.orders(spark, sfDir).count()
    val acc = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        acc.addAndGet(sc.stageInfo.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      run().count()
      var prev = -1L
      var tries = 0
      while (acc.get != prev && tries < 50) { prev = acc.get; Thread.sleep(100); tries += 1 }
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(acc.get == expected, s"read ${acc.get} records, expected $expected (scan re-execution)")
  }
}
