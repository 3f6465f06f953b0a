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
