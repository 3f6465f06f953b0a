package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the round-6 governance batch. */
class GovernanceSpec extends SparkSpec {

  private def run(key: String) = SparkEntry.queries(key)(spark, sfDir)

  test("dq_uniqueness: every audit row reconciles with a direct recompute") {
    val rows = run("dq_uniqueness").collect()
    assert(rows.length == 5)
    val byKey = rows.map(r => r.getAs[String]("key_name") -> r).toMap
    def recompute(df: org.apache.spark.sql.DataFrame, keys: Seq[String]) = {
      val counts = df.groupBy(keys.map(col): _*).count().collect().map(_.getAs[Long]("count"))
      (counts.sum, counts.length.toLong, counts.filter(_ > 1).sum, counts.max)
    }
    val audits = Seq(
      "documents.doc_id" -> (Tables.documents(spark, sfDir), Seq("doc_id")),
      "events.event_id" -> (Tables.events(spark, sfDir), Seq("event_id")),
      "lineitem.l_orderkey" -> (Tables.lineitem(spark, sfDir), Seq("l_orderkey")),
      "lineitem.l_orderkey+l_linenumber" ->
        (Tables.lineitem(spark, sfDir), Seq("l_orderkey", "l_linenumber")),
      "orders.o_orderkey" -> (Tables.orders(spark, sfDir), Seq("o_orderkey")),
    )
    audits.foreach { case (name, (df, keys)) =>
      val r = byKey(name)
      val (n, k, dup, mx) = recompute(df, keys)
      assert(r.getAs[Long]("n_rows") == n, name)
      assert(r.getAs[Long]("n_keys") == k, name)
      assert(r.getAs[Long]("n_dup_rows") == dup, name)
      assert(r.getAs[Long]("max_mult") == mx, name)
    }
    // the point of the audit: it EXPOSES non-uniqueness rather than assuming
    // it — both id columns are unique, both lineitem grains fan out (this
    // corpus draws l_linenumber randomly, so even the composite collides)
    assert(byKey("orders.o_orderkey").getAs[Long]("max_mult") == 1L)
    assert(byKey("events.event_id").getAs[Long]("max_mult") == 1L)
    assert(byKey("lineitem.l_orderkey").getAs[Long]("max_mult") > 1L)
  }

  test("corpus_mix_report: shares sum to ~1e6, cumulative is monotone and ends at ~1e6") {
    val rows = run("corpus_mix_report").collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n_tokens")).sum
    var prevCum = 0L
    var prevTok = Long.MaxValue
    rows.sortBy(_.getAs[Long]("rnk")).foreach { r =>
      assert(r.getAs[Long]("n_tokens") <= prevTok, "rank order is token-descending")
      prevTok = r.getAs[Long]("n_tokens")
      assert(r.getAs[Long]("share_ppm") == r.getAs[Long]("n_tokens") * 1000000L / total)
      assert(r.getAs[Long]("cum_ppm") >= prevCum)
      prevCum = r.getAs[Long]("cum_ppm")
    }
    // last cumulative cell covers the whole corpus: total*1e6 div total
    assert(prevCum == 1000000L)
  }

  test("sample_balanced_class: exact k per class, k = min class count, subset of corpus") {
    val rows = run("sample_balanced_class").collect()
    val byClass = rows.groupBy(_.getAs[String]("l_returnflag")).view.mapValues(_.length.toLong).toMap
    val counts = Tables
      .lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .count()
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val k = counts.values.min
    assert(byClass.keySet == counts.keySet)
    byClass.values.foreach(n => assert(n == k, s"every class keeps exactly k=$k"))
    // selected rows exist in the corpus (spot-check via join)
    val sel = run("sample_balanced_class")
    val missing = sel
      .join(
        Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber")),
        Seq("l_orderkey", "l_linenumber"),
        "left_anti",
      )
      .count()
    assert(missing == 0L)
  }

  test("fn_url_parse: components reassemble into the original url") {
    val rows = run("fn_url_parse").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val url = r.getAs[String]("url")
      val port = Option(r.getAs[Any]("port")).map(p => ":" + p).getOrElse("")
      val query = Option(r.getAs[String]("query")).map("?" + _).getOrElse("")
      val frag = Option(r.getAs[String]("fragment")).map("#" + _).getOrElse("")
      val rebuilt = r.getAs[String]("scheme") + "://" + r.getAs[String]("host") + port +
        r.getAs[String]("path") + query + frag
      assert(rebuilt == url, s"parse round-trip failed: $rebuilt vs $url")
    }
  }

  test("privacy_l_diversity: l-levels bounded by priority cardinality, rows conserve") {
    val rows = run("privacy_l_diversity").collect()
    assert(rows.nonEmpty)
    val nPrio = Tables.orders(spark, sfDir).select("o_orderpriority").distinct().count()
    val totalOrders = Tables
      .orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .count()
    rows.foreach { r =>
      val l = r.getAs[Long]("l")
      assert(l >= 1L && l <= nPrio)
      assert(r.getAs[Boolean]("homogeneous_risk") == (l < 3L))
    }
    assert(rows.map(_.getAs[Long]("n_orders")).sum == totalOrders)
  }

  test("privacy_dp_counts: true counts exact; noise is the Laplace inverse-CDF of the md5 seed") {
    val rows = run("privacy_dp_counts").collect()
    val truth = Tables
      .documents(spark, sfDir)
      .groupBy("lang", "source")
      .count()
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(rows.length == truth.size)
    var absSum = 0.0
    rows.foreach { r =>
      val (lang, source) = (r.getAs[String]("lang"), r.getAs[String]("source"))
      val n = r.getAs[Long]("n")
      assert(n == truth((lang, source)), s"count mismatch for ($lang,$source)")
      // recompute the noise from scratch: md5 → 52-bit uniform → Laplace
      val hex = java.security.MessageDigest
        .getInstance("MD5")
        .digest(s"dp#$lang|$source".getBytes("UTF-8"))
        .map("%02x".format(_))
        .mkString
        .take(13)
      val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / 4503599627370496.0
      val lap = if (u < 0.5) math.log(2 * u) else -math.log(2 * (1 - u))
      val noise6 = BigDecimal(lap).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      val expected = (BigDecimal(n) + noise6).toDouble
      assert(r.getAs[Double]("n_dp6") == expected, s"noise mismatch for ($lang,$source)")
      absSum += noise6.abs.toDouble
    }
    // mechanism sanity: E|Laplace(b=1)| = 1; the seedless draws must look like it
    val meanAbs = absSum / rows.length
    assert(meanAbs > 0.4 && meanAbs < 2.5, s"mean |noise| implausible for b=1: $meanAbs")
    info(f"privacy_dp_counts: ${rows.length} cells, mean |noise| = $meanAbs%.3f (E=1)")
  }

  test("privacy_t_closeness: TVD deciles reconcile with the exact in-memory recompute") {
    import org.apache.spark.sql.functions.{col, floor}
    val out = SparkEntry.queries("privacy_t_closeness")(spark, sfDir).collect()
    val oc = Tables
      .orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .select(
        col("c_nationkey"),
        col("c_mktsegment"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("bal_band"),
        col("o_orderpriority"),
      )
      .collect()
      .map(r => ((r.get(0), r.getString(1), r.getLong(2)), r.getString(3)))
    val nAll = oc.length.toLong
    val pGlobal = oc.groupBy(_._2).map { case (v, xs) => v -> xs.length.toLong * 1000000L / nAll }
    val tOf = oc.groupBy(_._1).map { case (g, xs) =>
      val nG = xs.length.toLong
      val byV = xs.groupBy(_._2).map { case (v, ys) => v -> ys.length.toLong }
      val dev = pGlobal.map { case (v, p) => math.abs(byV.getOrElse(v, 0L) * 1000000L / nG - p) }.sum
      g -> (nG, dev / 2)
    }
    val expected = tOf.values
      .groupBy(_._2 / 100000L)
      .map { case (band, xs) =>
        band -> (xs.size.toLong, xs.map(_._1).sum, xs.map(_._2).max)
      }
    assert(out.length == expected.size)
    out.foreach { r =>
      val band = r.getAs[Long]("t_decile")
      val (nGroups, nOrders, maxT) = expected(band)
      assert(r.getAs[Long]("n_groups") == nGroups, s"band $band group count")
      assert(r.getAs[Long]("n_orders") == nOrders, s"band $band order count")
      assert(r.getAs[Long]("max_t_ppm") == maxT, s"band $band max t")
      assert(r.getAs[Boolean]("breach_03") == (maxT > 300000L))
      assert(maxT >= 0L && maxT <= 1000000L, "TVD is a [0,1] distance")
    }
    // all QI groups are accounted for exactly once
    assert(out.map(_.getAs[Long]("n_groups")).sum == tOf.size.toLong)
    assert(out.map(_.getAs[Long]("n_orders")).sum == nAll)
  }
}
