package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the round-6 warehouse-integrity batch. */
class IntegritySpec extends SparkSpec {

  private def run(key: String) = SparkEntry.queries(key)(spark, sfDir)

  test("dq_referential_integrity: counts reconcile with direct anti-join recomputes") {
    val rows = run("dq_referential_integrity").collect()
    assert(rows.length == 4)
    val l = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val byFk = rows.map(r => r.getAs[String]("fk") -> r).toMap
    assert(byFk("lineitem.l_orderkey->orders").getAs[Long]("n_rows") == l.count())
    assert(byFk("orders.o_custkey->customer").getAs[Long]("n_rows") == o.count())
    val orphans = l
      .join(o.select(col("o_orderkey").as("l_orderkey")), Seq("l_orderkey"), "left_anti")
      .count()
    assert(byFk("lineitem.l_orderkey->orders").getAs[Long]("n_orphans") == orphans)
    rows.foreach(r => assert(r.getAs[Long]("n_null_keys") == 0L, s"synthetic FKs carry no nulls: $r"))
  }

  test("ts_forecast_eval_naive: matches exact lag-7 recompute") {
    val rows = run("ts_forecast_eval_naive").collect()
    assert(rows.nonEmpty)
    val daily = Tables
      .events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("etime")).as("day"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getAs[java.sql.Date]("day").toLocalDate.toEpochDay, r.getLong(2)))
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val series = daily.filter(_._1 == t).sortBy(_._2).map(_._3)
      val pairs = series.drop(7).zip(series.dropRight(7))
      val absErr = pairs.map { case (c, p) => math.abs(c - p) }.sum
      val err = pairs.map { case (c, p) => c - p }.sum
      val total = pairs.map(_._1).sum
      assert(r.getAs[Long]("n_days") == pairs.length.toLong)
      assert(r.getAs[Long]("actual_total") == total)
      assert(r.getAs[Long]("wape_ppm") == absErr * 1000000L / total)
      assert(r.getAs[Long]("mae_uday") == absErr * 1000000L / pairs.length)
      val bias = BigDecimal(err.toDouble / total.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("bias") - bias) < 1e-9)
    }
  }

  test("win_ratio_to_report: shares sum to ~1e6 per type and match brand revenue recompute") {
    val rows = run("win_ratio_to_report").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("p_type")).foreach { case (t, rs) =>
      val total = rs.map(_.getAs[Long]("share_ppm")).sum
      // integer div truncation loses < |brands| ppm per type
      assert(total <= 1000000L && total > 1000000L - rs.length, s"shares off for $t: $total")
      val revs = rs.map(_.getAs[Long]("rev_cents"))
      val typeTotal = revs.sum
      rs.foreach { r =>
        assert(r.getAs[Long]("share_ppm") == r.getAs[Long]("rev_cents") * 1000000L / typeTotal)
      }
    }
  }

  test("join_null_safe: null group matches itself; pair counts are products; totals cover both tables") {
    val rows = run("join_null_safe").collect()
    val nullRows = rows.filter(_.getAs[Boolean]("is_null_group"))
    val nCustNeg = Tables.customer(spark, sfDir).filter(col("c_acctbal") < 0).count()
    val nSuppNeg = Tables.supplier(spark, sfDir).filter(col("s_acctbal") < 0).count()
    if (nCustNeg + nSuppNeg > 0) {
      assert(nullRows.length == 1, "null-safe join must produce exactly ONE matched null group")
      assert(nullRows.head.getAs[Long]("n_cust") == nCustNeg)
      assert(nullRows.head.getAs[Long]("n_supp") == nSuppNeg)
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("n_pairs") == r.getAs[Long]("n_cust") * r.getAs[Long]("n_supp"))
    }
    assert(rows.map(_.getAs[Long]("n_cust")).sum == Tables.customer(spark, sfDir).count())
    assert(rows.map(_.getAs[Long]("n_supp")).sum == Tables.supplier(spark, sfDir).count())
  }

  test("agg_hdr_histogram: buckets are true log2 magnitudes; cum covers; exactly one bucket per SLO marker") {
    val rows = run("agg_hdr_histogram").collect()
    assert(rows.nonEmpty)
    val total = Tables.events(spark, sfDir).filter(col("value") > 0).count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    assert(rows.last.getAs[Long]("cum") == total)
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket").toInt
      assert(r.getAs[Long]("lo_cents") == (1L << (b - 1)))
      assert(r.getAs[Long]("hi_cents") == (1L << b) - 1)
    }
    Seq("is_p50", "is_p95", "is_p99").foreach { m =>
      assert(rows.count(_.getAs[Boolean](m)) == 1, s"exactly one $m bucket expected")
    }
    // the p99 marker sits at or after the p50 marker
    val b50 = rows.find(_.getAs[Boolean]("is_p50")).get.getAs[Long]("bucket")
    val b99 = rows.find(_.getAs[Boolean]("is_p99")).get.getAs[Long]("bucket")
    assert(b99 >= b50)
    // cross-check one marker against the exact percentile
    val cents = Tables
      .events(spark, sfDir)
      .filter(col("value") > 0)
      .select(expr("CAST(round(value * 100, 0) AS BIGINT)"))
      .collect()
      .map(_.getLong(0))
      .sorted
    val exactP99 = cents((math.ceil(0.99 * cents.length) - 1).toInt)
    val p99row = rows.find(_.getAs[Boolean]("is_p99")).get
    assert(
      exactP99 >= p99row.getAs[Long]("lo_cents") && exactP99 <= p99row.getAs[Long]("hi_cents"),
      s"exact p99 $exactP99 outside marked bucket $p99row",
    )
  }

  test("event_attribution_linear: credit conserves per purchase; reconciles with last-touch purchase count") {
    val rows = run("event_attribution_linear").collect()
    assert(rows.nonEmpty)
    // independent recompute of the candidate structure
    val evs = Tables
      .events(spark, sfDir)
      .select("event_id", "user_id", "event_type", "value", "ts")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3), r.getLong(4) / 1000))
    val purchases = evs.filter(_._3 == "purchase")
    val touches = evs.filter(e => e._3 == "view" || e._3 == "click").groupBy(_._2)
    val win = 604800000000L
    val agg = collection.mutable.Map.empty[String, (Long, Long, Long)]
    purchases.foreach { case (_, uid, _, v, pus) =>
      val ts = touches.getOrElse(uid, Array.empty).filter(t => t._5 <= pus && t._5 > pus - win)
      val pcents = math.round(v * 100)
      if (ts.isEmpty) {
        val (n, c, a) = agg.getOrElse("direct", (0L, 0L, 0L))
        agg("direct") = (n + 1, c + 1000000L, a + pcents)
      } else {
        val k = ts.length.toLong
        ts.foreach { t =>
          val (n, c, a) = agg.getOrElse(t._3, (0L, 0L, 0L))
          agg(t._3) = (n + 1, c + 1000000L / k, a + pcents / k)
        }
      }
    }
    val got = rows.map(r =>
      r.getAs[String]("channel") ->
        ((r.getAs[Long]("n_touches"), r.getAs[Long]("credit_ppm_sum"), r.getAs[Long]("attributed_cents")))
    ).toMap
    assert(got == agg.toMap, s"linear attribution mismatch: $got vs $agg")
  }

  test("fn_bitwise_pack: pack/unpack is the identity; operator semantics hold") {
    val rows = run("fn_bitwise_pack").collect()
    assert(rows.nonEmpty)
    val regions = Tables
      .nation(spark, sfDir)
      .collect()
      .map(r =>
        r.getAs[Number]("n_nationkey").longValue() -> r.getAs[Number]("n_regionkey").longValue()
      )
      .toMap
    rows.foreach { r =>
      val nk = r.getAs[Number]("n_nationkey").longValue()
      val rk = regions(nk)
      assert(r.getAs[Long]("packed") == (rk << 8 | nk))
      assert(r.getAs[Long]("unpacked_region") == rk)
      assert(r.getAs[Long]("unpacked_nation") == (nk & 255))
      assert(r.getAs[Long]("x_xor") == (nk ^ rk))
      assert(r.getAs[Long]("x_and") == (nk & 3))
      assert(r.getAs[Long]("x_or") == (nk | 16))
    }
  }
}
