package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the round-6 resampling/anomaly/content batch,
  * cross-checked against independent in-memory recomputes (md5 arithmetic,
  * plain Scala string processing) so plan bugs and math bugs cannot cancel.
  */
class ResamplingSpec extends SparkSpec {

  private def run(key: String) = SparkEntry.queries(key)(spark, sfDir)

  test("stats_bootstrap_ci: exact recompute of point mean, replicate weights, and the CI order statistics") {
    val r = run("stats_bootstrap_ci").collect()
    assert(r.length == 1)
    val cents = Tables
      .orders(spark, sfDir)
      .select("o_orderkey", "o_totalprice")
      .collect()
      .map(row => row.getLong(0) -> math.round(row.getDouble(1) * 100))
    val n = cents.length.toLong
    val mean = BigDecimal(cents.map(_._2).sum.toDouble / 100.0 / n)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
    assert(r.head.getAs[Long]("n") == n)
    assert(math.abs(r.head.getAs[Double]("mean") - mean) < 1e-9)
    val thresholds = Seq(1656781714176974L, 3313563428353948L, 4141954285442435L,
      4418084571138597L, 4487117142562638L, 4500923656847446L, 4503224742561580L,
      4503553469092171L, 4503594559908495L)
    def w(u: Long): Long = { val i = thresholds.indexWhere(u < _); if (i < 0) 9L else i.toLong }
    // per-row replicate stream: u_b = h1 XOR (b*h2 mod 2^52), h1/h2 the
    // md5's two 52-bit halves (mirrors the query's derivation exactly)
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val seeds = cents.map { case (ok, c) =>
      val h = md5hex(s"bs#$ok")
      (c, java.lang.Long.parseLong(h.substring(0, 13), 16), java.lang.Long.parseLong(h.substring(13, 26), 16))
    }
    val means = (1 to 50).map { b =>
      var swc = 0L; var sw = 0L
      seeds.foreach { case (c, h1, h2) =>
        val u = h1 ^ ((b.toLong * h2) % 4503599627370496L)
        val wt = w(u); swc += wt * c; sw += wt
      }
      (swc.toDouble / (sw * 100L).toDouble, b)
    }.sorted
    val lo = BigDecimal(means(1)._1).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val hi = BigDecimal(means(48)._1).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.head.getAs[Double]("ci_lo") == lo, s"ci_lo ${r.head.getAs[Double]("ci_lo")} want $lo")
    assert(r.head.getAs[Double]("ci_hi") == hi, s"ci_hi ${r.head.getAs[Double]("ci_hi")} want $hi")
    assert(lo <= mean && mean <= hi, "point estimate escaped its own CI")
  }

  test("graph_jaccard_neighbors: matches exact set recompute; jaccard bounds hold") {
    val rows = run("graph_jaccard_neighbors").collect()
    assert(rows.nonEmpty)
    val sp = Tables
      .lineitem(spark, sfDir)
      .select("l_partkey", "l_suppkey")
      .distinct()
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val bySupp = sp.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val expect = bySupp.keys.toSeq.sorted
      .combinations(2)
      .map { case Seq(a, b) =>
        val inter = (bySupp(a) & bySupp(b)).size.toLong
        (a, b, inter, if (inter > 0) inter * 1000000L / (bySupp(a).size + bySupp(b).size - inter) else 0L)
      }
      .filter(_._3 > 0)
      .toSeq
      .sortBy { case (a, b, _, j) => (-j, a, b) }
      .take(rows.length)
    val got = rows.map(r =>
      (r.getAs[Long]("s1"), r.getAs[Long]("s2"), r.getAs[Long]("inter"), r.getAs[Long]("jac_ppm"))
    )
    assert(got.toSeq == expect, s"mismatch: got ${got.take(3).toSeq}, want ${expect.take(3)}")
  }

  test("ts_burst_detection: matches exact trailing-median island recompute") {
    val rows = run("ts_burst_detection").collect()
    val daily = Tables
      .events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("etime")).as("day"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getAs[java.sql.Date]("day").toLocalDate, r.getLong(2)))
    val bursts = collection.mutable.ArrayBuffer.empty[(String, java.time.LocalDate, java.time.LocalDate, Long, Long, Long)]
    daily.groupBy(_._1).foreach { case (t, ds) =>
      val series = ds.sortBy(_._2.toEpochDay).map(d => (d._2, d._3))
      val flagged = series.indices.collect {
        case i if i >= 7 && {
          val med = series.slice(i - 7, i).map(_._2).sorted.apply(3)
          val c = series(i)._2
          c > med && (c - med) * (c - med) > 4 * med
        } => series(i)
      }
      var run = collection.mutable.ArrayBuffer.empty[(java.time.LocalDate, Long)]
      def flush(): Unit = if (run.nonEmpty) {
        bursts += ((t, run.head._1, run.last._1, run.size.toLong, run.map(_._2).max, run.map(_._2).sum))
        run.clear()
      }
      flagged.foreach { case (d, c) =>
        if (run.nonEmpty && run.last._1.plusDays(1) != d) flush()
        run += ((d, c))
      }
      flush()
    }
    val expect = bursts.sortBy(b => (b._1, b._2.toEpochDay)).toSeq
    val got = rows.map(r =>
      (r.getAs[String]("event_type"), r.getAs[java.sql.Date]("start_day").toLocalDate,
        r.getAs[java.sql.Date]("end_day").toLocalDate, r.getAs[Long]("n_days"),
        r.getAs[Long]("peak"), r.getAs[Long]("total"))
    ).toSeq
    assert(got == expect, s"burst mismatch: got $got want $expect")
  }

  test("text_keyword_rake: matches exact in-memory RAKE recompute") {
    val rows = run("text_keyword_rake").collect()
    assert(rows.nonEmpty)
    val stops = Set("the", "a", "an", "and", "of", "to", "in", "is", "for", "on", "with",
      "as", "by", "at", "be", "this", "that", "it", "are", "was", "or", "from")
    val phrases = Tables
      .documents(spark, sfDir)
      .select("text")
      .collect()
      .toSeq
      .flatMap { r =>
        val norm = r.getString(0).replaceAll("\\s+", " ").trim.toLowerCase
        // phrase = maximal stopword-free word run (the doubled-space
        // delimiting in the query is just a regex-safe spelling of this)
        val runs = collection.mutable.ArrayBuffer.empty[List[String]]
        var cur = List.empty[String]
        norm.split(" ").foreach { w =>
          if (stops(w)) { if (cur.nonEmpty) runs += cur.reverse; cur = Nil }
          else cur = w :: cur
        }
        if (cur.nonEmpty) runs += cur.reverse
        runs.toSeq.filter(p => p.nonEmpty && p.size <= 3)
      }
    val wordStats = phrases
      .flatMap(p => p.map(w => (w, p.size.toLong)))
      .groupBy(_._1)
      .view
      .mapValues(ws => (ws.map(_._2).sum, ws.size.toLong))
      .toMap
    val wppm = wordStats.view.mapValues { case (deg, freq) => deg * 1000000L / freq }.toMap
    val expect = phrases
      .groupBy(p => p.mkString(" "))
      .map { case (ph, occ) => (ph, occ.size.toLong, occ.head.map(wppm).sum) }
      .toSeq
      .sortBy { case (ph, _, sc) => (-sc, ph) }
      .take(rows.length)
    val got = rows.map(r =>
      (r.getAs[String]("phrase"), r.getAs[Long]("n_occ"), r.getAs[Long]("score_ppm"))
    ).toSeq
    assert(got == expect, s"rake mismatch: got ${got.take(3)} want ${expect.take(3)}")
  }

  test("feature_scale_zscore: per-flag z-scores have mean ~0, std ~1, and cover the table") {
    val rows = run("feature_scale_zscore").collect()
    val total = Tables.lineitem(spark, sfDir).count()
    assert(rows.length.toLong == total)
    rows.groupBy(_.getAs[String]("flag")).foreach { case (flag, rs) =>
      val zs = rs.map(_.getAs[Double]("z"))
      val m = zs.sum / zs.length
      val v = zs.map(z => (z - m) * (z - m)).sum / zs.length
      assert(math.abs(m) < 1e-3, s"z mean off for $flag: $m")
      assert(math.abs(v - 1.0) < 1e-2, s"z var off for $flag: $v")
    }
  }

  test("ts_rate_limit_audit: matches exact per-minute recompute") {
    val rows = run("ts_rate_limit_audit").collect()
    val perMin = Tables
      .events(spark, sfDir)
      .select(col("user_id"), date_trunc("minute", col("etime")).as("m"))
      .collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Timestamp]("m")))
      .groupBy(identity)
      .view
      .mapValues(_.size.toLong)
      .toMap
    val expect = perMin
      .groupBy(_._1._1)
      .view
      .mapValues { ms =>
        val cs = ms.values
        (cs.max, cs.count(_ >= 2).toLong, cs.filter(_ >= 2).sum)
      }
      .toMap
      .filter(_._2._1 >= 2)
    val got = rows.map(r =>
      r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("peak_per_min"), r.getAs[Long]("n_hot_minutes"), r.getAs[Long]("n_hot_events")))
    ).toMap
    assert(got == expect, s"rate audit mismatch: ${got.size} vs ${expect.size} users")
  }
}
