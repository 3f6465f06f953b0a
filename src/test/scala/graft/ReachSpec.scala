package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the round-6 batch-9 verbs — each op is checked
  * against an independent exact in-memory recompute at sf0.001.
  */
class ReachSpec extends SparkSpec {

  private def run(key: String) = SparkEntry.queries(key)(spark, sfDir)

  test("graph_shortest_hops: histogram matches an in-memory BFS over the same graph") {
    val rows = run("graph_shortest_hops").collect()
    assert(rows.nonEmpty)
    // rebuild the support>=2 co-purchase graph exactly
    val op = Tables
      .lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"))
      .distinct()
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = op.groupBy(_._1).values.map(_.map(_._2).sorted)
    val support = scala.collection.mutable.Map.empty[(Long, Long), Int]
    byOrder.foreach { ps =>
      for (i <- ps.indices; j <- i + 1 until ps.length if ps(i) < ps(j))
        support((ps(i), ps(j))) = support.getOrElse((ps(i), ps(j)), 0) + 1
    }
    val edges = support.collect { case ((a, b), s) if s >= 2 => Seq((a, b), (b, a)) }.flatten.toSeq
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val nodes = edges.map(_._1).toSet
    val seeds = Tables
      .part(spark, sfDir)
      .filter(col("p_size") === 1)
      .select("p_partkey")
      .collect()
      .map(_.getLong(0))
      .toSet
    var dist = nodes.map(n => n -> (if (seeds(n)) 0L else 99L)).toMap
    for (_ <- 1 to 3)
      dist = dist.map { case (v, d) =>
        val reach = adj.getOrElse(v, Nil).map(u => dist(u) + 1) :+ d
        v -> reach.min
      }
    val exp = dist.values.groupBy(identity).map { case (h, xs) => h -> xs.size.toLong }
    assert(rows.map(_.getAs[Long]("hops")).toSet == exp.keySet)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_parts") == exp(r.getAs[Long]("hops")))
    }
    assert(rows.map(_.getAs[Long]("n_parts")).sum == nodes.size.toLong)
    // the seed class (hops=0) is exactly the in-graph seed set
    val h0 = rows.find(_.getAs[Long]("hops") == 0L)
    assert(h0.forall(_.getAs[Long]("n_parts") == nodes.count(seeds)))
  }

  test("event_audience_overlap: pair counts and ppm ratios reconcile exactly") {
    val rows = run("event_audience_overlap").collect()
    assert(rows.nonEmpty)
    val ut = Tables
      .events(spark, sfDir)
      .select(col("user_id"), col("event_type"))
      .distinct()
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byType = ut.groupBy(_._2).map { case (t, xs) => t -> xs.map(_._1).toSet }
    rows.foreach { r =>
      val a = byType(r.getAs[String]("type_a")); val b = byType(r.getAs[String]("type_b"))
      assert(r.getAs[String]("type_a") < r.getAs[String]("type_b"))
      val both = (a & b).size.toLong
      assert(r.getAs[Long]("n_a") == a.size.toLong && r.getAs[Long]("n_b") == b.size.toLong)
      assert(r.getAs[Long]("n_both") == both)
      assert(r.getAs[Long]("jaccard_ppm") == both * 1000000L / (a.size + b.size - both))
      assert(r.getAs[Long]("overlap_ppm") == both * 1000000L / math.min(a.size, b.size))
    }
  }

  test("ml_eval_pr_curve: the threshold sweep matches the exact cumulative recompute") {
    val rows = run("ml_eval_pr_curve").collect().sortBy(-_.getAs[Long]("threshold"))
    assert(rows.nonEmpty)
    val li = Tables
      .lineitem(spark, sfDir)
      .select(col("l_discount"), col("l_returnflag"))
      .collect()
      .map(r => (math.round(r.getDouble(0) * 100), if (r.getString(1) == "R") 1L else 0L))
    val p = li.map(_._2).sum
    var tp = 0L; var pp = 0L
    val bins = li.groupBy(_._1).map { case (s, xs) => s -> (xs.length.toLong, xs.map(_._2).sum) }
    rows.foreach { r =>
      val t = r.getAs[Long]("threshold")
      val (n, pos) = bins(t)
      tp += pos; pp += n
      assert(r.getAs[Long]("tp") == tp)
      assert(r.getAs[Long]("fp") == pp - tp)
      assert(r.getAs[Long]("fn") == p - tp)
      assert(r.getAs[Long]("precision_ppm") == tp * 1000000L / pp)
      assert(r.getAs[Long]("recall_ppm") == tp * 1000000L / p)
      // recall is monotone non-decreasing as the threshold drops
    }
    assert(rows.last.getAs[Long]("recall_ppm") == 1000000L)
  }

  test("stats_cramers_v: chi2 and V match the closed-form recompute; V in [0,1]") {
    val r = run("stats_cramers_v").collect().head
    val d = Tables
      .documents(spark, sfDir)
      .select(col("lang"), col("source"))
      .collect()
      .map(x => (x.getString(0), x.getString(1)))
    val n = d.length.toDouble
    val rt = d.groupBy(_._1).map { case (k, v) => k -> v.length.toDouble }
    val ct = d.groupBy(_._2).map { case (k, v) => k -> v.length.toDouble }
    val o = d.groupBy(identity).map { case (k, v) => k -> v.length.toDouble }
    // .toSeq: keys is a Set, and a Set-shaped yield would DEDUPLICATE equal terms
    val chi2 = (for (l <- rt.keys.toSeq; s <- ct.keys.toSeq) yield {
      val e = rt(l) * ct(s) / n
      val obs = o.getOrElse((l, s), 0.0)
      BigDecimal((obs - e) * (obs - e) / e).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }).sum.toDouble
    assert(math.abs(r.getAs[Double]("chi2") - chi2) < 1e-9)
    val v = math.sqrt(chi2 / (n * (math.min(rt.size, ct.size) - 1)))
    assert(math.abs(r.getAs[Double]("cramers_v") - v) < 1e-6)
    assert(r.getAs[Double]("cramers_v") >= 0.0 && r.getAs[Double]("cramers_v") <= 1.0)
    assert(r.getAs[Long]("n_cells") == rt.size.toLong * ct.size)
  }

  test("feature_rfm: segment cube reconciles with in-memory quintiles") {
    val rows = run("feature_rfm").collect()
    assert(rows.nonEmpty)
    val ords = Tables
      .orders(spark, sfDir)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"), col("o_totalprice"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, math.round(r.getDouble(2) * 100)))
    val cust = ords.groupBy(_._1).map { case (k, xs) =>
      (k, xs.map(_._2).max, xs.length.toLong, xs.map(_._3).sum)
    }.toSeq
    val maxDay = cust.map(_._2).max
    def ntile5[T](xs: Seq[(Long, T)])(implicit ord: Ordering[T]): Map[Long, Long] = {
      val sorted = xs.sortBy { case (k, v) => (v, k) }
      val nn = sorted.length
      sorted.zipWithIndex.map { case ((k, _), i) =>
        // SQL ntile: first (n mod 5) buckets get ceil(n/5) rows
        val big = nn % 5; val base = nn / 5
        val bucket =
          if (i < big * (base + 1)) i / (base + 1) + 1
          else (i - big * (base + 1)) / base + big + 1
        k -> bucket.toLong
      }.toMap
    }
    val rq = ntile5(cust.map(c => c._1 -> (java.time.temporal.ChronoUnit.DAYS.between(c._2, maxDay), c._1)))
    val fq = ntile5(cust.map(c => c._1 -> (-c._3, c._1)))
    val mq = ntile5(cust.map(c => c._1 -> (-c._4, c._1)))
    val exp = cust
      .groupBy(c => (rq(c._1), fq(c._1), mq(c._1)))
      .map { case (k, xs) => k -> (xs.size.toLong, xs.map(_._4).sum) }
    assert(rows.length == exp.size)
    rows.foreach { r =>
      val k = (r.getAs[Long]("r_q"), r.getAs[Long]("f_q"), r.getAs[Long]("m_q"))
      val (nc, tot) = exp(k)
      assert(r.getAs[Long]("n_cust") == nc)
      assert(r.getAs[Long]("total_cents") == tot)
      assert(r.getAs[Long]("avg_cents") == Math.floorDiv(tot, nc))
    }
    assert(rows.map(_.getAs[Long]("n_cust")).sum == cust.size.toLong)
  }
}
