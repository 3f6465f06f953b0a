package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the round-6 decision-science batch — each op is
  * checked against an independent exact in-memory recompute.
  */
class DecisionSpec extends SparkSpec {

  private def run(key: String) = SparkEntry.queries(key)(spark, sfDir)

  test("ml_eval_calibration: bins reconcile with an exact in-memory recompute") {
    val rows = run("ml_eval_calibration").collect()
    assert(rows.nonEmpty)
    val li = Tables
      .lineitem(spark, sfDir)
      .select(col("l_discount"), col("l_returnflag"))
      .collect()
      .map(r => (math.round(r.getDouble(0) * 100), if (r.getString(1) == "R") 1L else 0L))
    val exp = li.groupBy(_._1).map { case (s, xs) => s -> (xs.length.toLong, xs.map(_._2).sum) }
    assert(rows.length == exp.size)
    var totalN = 0L
    rows.foreach { r =>
      val s = r.getAs[Long]("score_pct")
      val (n, pos) = exp(s)
      totalN += n
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Long]("n_pos") == pos)
      assert(r.getAs[Long]("pred_ppm") == s * 100000L)
      assert(r.getAs[Long]("obs_ppm") == pos * 1000000L / n)
      assert(r.getAs[Long]("gap_ppm") == s * 100000L - pos * 1000000L / n)
    }
    assert(totalN == li.length.toLong)
  }

  test("stats_welch_ttest: matches the closed-form recompute from exact moments") {
    val r = run("stats_welch_ttest").collect().head
    val vs = Tables
      .events(spark, sfDir)
      .filter(col("event_type").isin("click", "error"))
      .select(col("event_type"), col("value"))
      .collect()
      .map(x => (x.getString(0) == "click", math.round(x.getDouble(1) * 100)))
    val a1 = vs.filter(_._1).map(_._2)
    val a2 = vs.filterNot(_._1).map(_._2)
    def mom(a: Array[Long]) = (a.length.toLong, a.sum, a.map(v => v * v).sum)
    val (n1, s1, q1) = mom(a1); val (n2, s2, q2) = mom(a2)
    assert(r.getAs[Long]("n1") == n1 && r.getAs[Long]("n2") == n2)
    def v(n: Long, s: Long, q: Long) =
      ((q.toDouble / n) - (s.toDouble / n) * (s.toDouble / n)) * n / (n - 1.0) / n
    val se2 = v(n1, s1, q1) + v(n2, s2, q2)
    val t = (s1.toDouble / n1 - s2.toDouble / n2) / math.sqrt(se2)
    val df = se2 * se2 / (v(n1, s1, q1) * v(n1, s1, q1) / (n1 - 1.0) + v(n2, s2, q2) * v(n2, s2, q2) / (n2 - 1.0))
    assert(math.abs(r.getAs[Double]("t_stat") - t) < 1e-3)
    assert(math.abs(r.getAs[Double]("df_welch") - df) < 0.5)
    assert(math.abs(r.getAs[Double]("mean1") - s1.toDouble / n1 / 100.0) < 1e-3)
    // Welch df lies between min(n1,n2)-1 and n1+n2-2
    assert(df >= math.min(n1, n2) - 1.0 && df <= n1 + n2 - 2.0)
  }

  test("agg_weighted_median: selection law — smallest price with 2*cum >= total") {
    val rows = run("agg_weighted_median").collect()
    assert(rows.nonEmpty)
    val parts = Tables
      .part(spark, sfDir)
      .select(col("p_type"), col("p_partkey"), col("p_retailprice"), col("p_size"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3).toLong))
    rows.foreach { r =>
      val t = r.getAs[String]("p_type")
      val g = parts.filter(_._1 == t).sortBy(x => (x._3, x._2))
      val tot = g.map(_._4).sum
      var cum = 0L
      val med = g.find { x => cum += x._4; cum * 2 >= tot }.get._3
      assert(r.getAs[Long]("n_parts") == g.length.toLong)
      assert(r.getAs[Long]("total_weight") == tot)
      assert(r.getAs[Double]("wmedian_price") == med)
      // at least half the weight sits at or below the weighted median
      val below = g.filter(_._3 <= med).map(_._4).sum
      assert(below * 2 >= tot)
    }
  }

  test("stats_theil_sen_trend: median of pairwise slopes matches in-memory recompute") {
    val rows = run("stats_theil_sen_trend").collect()
    assert(rows.length == 5)
    val daily = Tables
      .orders(spark, sfDir)
      .filter(col("o_orderdate") >= "1998-01-01" && col("o_orderdate") < "1999-01-01")
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, sfDir), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_regionkey"), datediff(to_date(col("o_orderdate")), lit("1998-01-01")).as("k"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    rows.foreach { r =>
      val rk = r.getAs[Long]("region_key").toInt
      val g = daily.filter(_._1 == rk).sortBy(_._2)
      val slopes = (for {
        i <- g.indices; j <- (i + 1) until g.length
      } yield (g(j)._3 - g(i)._3).toDouble / (g(j)._2 - g(i)._2).toDouble).sorted
      assert(r.getAs[Long]("n_pairs") == slopes.length.toLong)
      val m =
        if (slopes.length % 2 == 1) slopes(slopes.length / 2)
        else (slopes(slopes.length / 2 - 1) + slopes(slopes.length / 2)) / 2
      assert(math.abs(r.getAs[Double]("trend_per_day") - m) < 1e-3, s"region $rk: ${r} vs $m")
    }
  }

  test("funnel_time_to_convert: latencies and positional percentiles match recompute") {
    val rows = run("funnel_time_to_convert").collect()
    assert(rows.nonEmpty)
    val ev = Tables
      .events(spark, sfDir)
      .select(col("user_id"), col("event_type"), expr("ts div 1000").as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val conv = ev
      .groupBy(_._1)
      .flatMap { case (u, xs) =>
        val views = xs.filter(_._2 == "view").map(_._3)
        if (views.isEmpty) None
        else {
          val tv = views.min
          val ps = xs.filter(x => x._2 == "purchase" && x._3 > tv).map(_._3)
          if (ps.isEmpty) None
          else {
            val lat = (ps.min - tv) / 1000000L
            val dowUtc = java.time.Instant.ofEpochMilli(tv / 1000)
              .atZone(java.time.ZoneOffset.UTC).getDayOfWeek.getValue % 7 // ISO 1..7 -> 0=Sunday
            Some((dowUtc.toLong, u, lat))
          }
        }
      }
      .toArray
    assert(rows.map(_.getAs[Long]("n_converted")).sum == conv.length.toLong)
    rows.foreach { r =>
      val cohort = conv.filter(_._1 == r.getAs[Long]("cohort_dow")).sortBy(x => (x._3, x._2))
      val n = cohort.length
      assert(r.getAs[Long]("n_converted") == n.toLong)
      assert(r.getAs[Long]("p50_latency_s") == cohort(((n + 1) / 2 - 1).toInt)._3)
      assert(r.getAs[Long]("p90_latency_s") == cohort(((n * 9 + 9) / 10 - 1).toInt)._3)
    }
  }
}
