package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the round-6 robust-stats / baseline-model /
  * k-core verbs, cross-checked against independent in-memory recomputes
  * (pure Scala integer arithmetic) so plan bugs and math bugs cannot
  * cancel.
  */
class RobustSpec extends SparkSpec {

  private def run(key: String) = SparkEntry.queries(key)(spark, sfDir)

  test("agg_winsorized_mean: wmean sits inside [p10, p90]; n covers the table") {
    val rows = run("agg_winsorized_mean").collect()
    assert(rows.nonEmpty)
    val pct = Tables
      .lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(
        expr("percentile(l_extendedprice, 0.1)").as("p10"),
        expr("percentile(l_extendedprice, 0.9)").as("p90"),
      )
      .collect()
      .map(r => r.getAs[String]("l_returnflag") -> (r.getAs[Double]("p10"), r.getAs[Double]("p90")))
      .toMap
    val total = Tables.lineitem(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    rows.foreach { r =>
      val (p10, p90) = pct(r.getAs[String]("l_returnflag"))
      val wm = r.getAs[Double]("wmean")
      assert(wm >= p10 - 1e-6 && wm <= p90 + 1e-6, s"winsorized mean escaped the clamp: $r")
    }
  }

  test("ts_decompose_seasonal: c*1e6 == trend + seasonal + resid exactly; residuals near-cancel per cell") {
    val rows = run("ts_decompose_seasonal").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getAs[Long]("c")
      val sum = r.getAs[Long]("trend_u") + r.getAs[Long]("seasonal_u") + r.getAs[Long]("resid_u")
      assert(c * 1000000L == sum, s"decomposition identity broken: $r")
    }
    // seasonal_u is the truncated mean of detr per (type, dow), so the
    // residual sum over each cell is the division remainder: |sum| < n_cell
    val ids = rows.groupBy { r =>
      val cal = java.time.LocalDate.parse(r.getAs[java.sql.Date]("day").toString)
      (r.getAs[String]("event_type"), cal.getDayOfWeek.getValue % 7)
    }
    ids.foreach { case ((t, dow), rs) =>
      val resid = rs.map(_.getAs[Long]("resid_u")).sum
      assert(math.abs(resid) < rs.size.toLong, s"resid sum $resid over ${rs.size} rows for ($t,$dow)")
    }
  }

  test("rec_bias_model: matches exact integer recompute of the damped two-stage fit") {
    val rows = run("rec_bias_model").collect()
    assert(rows.nonEmpty)
    val ratings = Tables
      .lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_partkey"), col("l_quantity"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1000000L)))
    val muU = ratings.map(_._3).sum / ratings.length
    val byItem = ratings.groupBy(_._2)
    val biU = byItem.map { case (i, rs) =>
      i -> (rs.map(_._3).sum - rs.length * muU) / (10L + rs.length)
    }
    val want = ratings
      .groupBy(_._1)
      .map { case (u, rs) =>
        val st = rs.map { case (_, i, ru) => ru - muU - biU(i) }.sum
        u -> (rs.length.toLong, st / (10L + rs.length))
      }
    assert(rows.length == want.size)
    rows.foreach { r =>
      val (n, bu) = want(r.getAs[Long]("custkey"))
      assert(r.getAs[Long]("n_ratings") == n && r.getAs[Long]("bu_u") == bu, r.toString)
    }
  }

  test("graph_kcore: matches exact in-memory 3-round peel of the support-2 co-purchase graph") {
    val rows = run("graph_kcore").collect()
    // in-memory graph
    val items = Tables
      .lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey")
      .distinct()
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSeq
    val pairs = items
      .groupBy(_._1)
      .values
      .flatMap { basket =>
        val ps = basket.map(_._2).distinct.sorted
        for (a <- ps; b <- ps if a < b) yield (a, b)
      }
      .groupBy(identity)
      // NB: .collect { case (p, os) if … => p } would build a MAP here (the
      // yielded element is a 2-tuple), silently deduplicating pairs by
      // their first component — filter + keySet keeps the full pair set
      .filter(_._2.size >= 2)
      .keySet
    var edges = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    (1 to 3).foreach { _ =>
      val deg = edges.groupBy(_._1).map { case (u, es) => u -> es.size }
      val keep = deg.collect { case (u, d) if d >= 3 => u }.toSet
      edges = edges.filter { case (u, v) => keep(u) && keep(v) }
    }
    val wantDeg = edges.groupBy(_._1).map { case (u, es) => u -> es.size.toLong }
    assert(rows.length == wantDeg.size, s"${rows.length} vs ${wantDeg.size}")
    rows.foreach { r =>
      assert(wantDeg(r.getAs[Long]("node")) == r.getAs[Long]("deg"), r.toString)
    }
  }
}
