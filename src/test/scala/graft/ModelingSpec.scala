package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the round-6 experiment-analysis verbs, each
  * cross-checked against an independent in-memory recompute (plain Scala
  * collections + integer arithmetic) so a plan bug and a math bug cannot
  * cancel.
  */
class ModelingSpec extends SparkSpec {

  private def run(key: String) = SparkEntry.queries(key)(spark, sfDir)

  /** (cents, isBuilding) for every BUILDING/MACHINERY order — the shared
    * input of the KS and Mann-Whitney recomputes.
    */
  private lazy val segTotals: Seq[(Long, Boolean)] = {
    val c = Tables
      .customer(spark, sfDir)
      .select("c_custkey", "c_mktsegment")
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    Tables
      .orders(spark, sfDir)
      .select("o_custkey", "o_totalprice")
      .collect()
      .toSeq
      .flatMap { r =>
        c.get(r.getLong(0)) match {
          case Some("BUILDING")  => Some(math.round(r.getDouble(1) * 100) -> true)
          case Some("MACHINERY") => Some(math.round(r.getDouble(1) * 100) -> false)
          case _                 => None
        }
      }
  }

  test("stats_ks_test: top d_ppm equals the exact binned-KS recompute") {
    val rows = run("stats_ks_test").collect()
    assert(rows.length == 5)
    val byBin = segTotals
      .groupBy { case (cents, _) => cents / 100000 }
      .view
      .mapValues(vs => (vs.count(_._2).toLong, vs.count(!_._2).toLong))
      .toMap
    val t1 = byBin.values.map(_._1).sum
    val t2 = byBin.values.map(_._2).sum
    var c1 = 0L; var c2 = 0L
    val dmax = byBin.keys.toSeq.sorted.map { b =>
      val (n1, n2) = byBin(b); c1 += n1; c2 += n2
      math.abs(c1 * t2 - c2 * t1)
    }.max
    assert(rows.head.getAs[Long]("d_ppm") == dmax * 1000000L / (t1 * t2))
    rows.foreach { r =>
      val d = r.getAs[Long]("d_ppm")
      assert(d >= 0 && d <= 1000000L, s"d_ppm out of range: $r")
    }
  }

  test("stats_mannwhitney_auc: u2x matches the exact midrank recompute; U1+U2 = n1*n2") {
    val r = run("stats_mannwhitney_auc").collect()
    assert(r.length == 1)
    val n1 = r.head.getAs[Long]("n1")
    val n2 = r.head.getAs[Long]("n2")
    val u2x = r.head.getAs[Long]("u2x")
    assert(n1 == segTotals.count(_._2) && n2 == segTotals.count(!_._2))
    // exact 2·R1 via per-value midranks
    val byV = segTotals.groupBy(_._1).view.mapValues(vs => (vs.size.toLong, vs.count(_._2).toLong)).toMap
    var cum = 0L; var r1x2 = 0L
    byV.keys.toSeq.sorted.foreach { v =>
      val (n, g1) = byV(v)
      r1x2 += g1 * (2 * cum + n + 1)
      cum += n
    }
    assert(u2x == r1x2 - n1 * (n1 + 1), s"u2x ${u2x} vs recompute ${r1x2 - n1 * (n1 + 1)}")
    assert(u2x >= 0 && u2x <= 2 * n1 * n2, "U out of [0, n1*n2]")
    assert(r.head.getAs[Long]("auc_ppm") == u2x * 1000000L / (2 * n1 * n2))
  }

  test("graph_adamic_adar: top pair matches exact recompute; ordering is total") {
    val rows = run("graph_adamic_adar").collect()
    assert(rows.nonEmpty)
    val sp = Tables
      .lineitem(spark, sfDir)
      .select("l_partkey", "l_suppkey")
      .distinct()
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSeq
    val byPart = sp.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val scores = collection.mutable.Map.empty[(Long, Long), (Long, Long)]
    byPart.values.foreach { ss =>
      if (ss.size >= 2) {
        val w = math.round(1000000.0 / math.log(ss.size.toDouble))
        for (i <- ss.indices; j <- i + 1 until ss.size) {
          val k = (ss(i), ss(j))
          val (n, a) = scores.getOrElse(k, (0L, 0L))
          scores(k) = (n + 1, a + w)
        }
      }
    }
    val expect = scores.toSeq
      .map { case ((s1, s2), (n, aa)) => (s1, s2, n, aa) }
      .sortBy { case (s1, s2, _, aa) => (-aa, s1, s2) }
      .take(rows.length)
    val got = rows.map(r =>
      (r.getAs[Long]("s1"), r.getAs[Long]("s2"), r.getAs[Long]("n_common"), r.getAs[Long]("aa_ppm"))
    )
    assert(got.toSeq == expect, s"top-${rows.length} mismatch; first got ${got.head}, want ${expect.head}")
    rows.foreach(r => assert(r.getAs[Long]("s1") < r.getAs[Long]("s2")))
  }

  test("sample_kfold_assign: exact ±1 balance per stratum, full coverage, 5 folds") {
    val rows = run("sample_kfold_assign").collect()
    val total = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      assert(rs.map(_.getAs[Long]("fold")).toSet.subsetOf((0L until 5L).toSet))
      val sizes = rs.map(_.getAs[Long]("n_docs"))
      assert(sizes.max - sizes.min <= 1, s"fold imbalance in $lang: ${sizes.toSeq}")
    }
  }

  test("event_type_trigrams: matches exact per-user sequence recompute") {
    val rows = run("event_type_trigrams").collect()
    assert(rows.nonEmpty)
    val evs = Tables
      .events(spark, sfDir)
      .select("user_id", "ts", "event_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    val tri = collection.mutable.Map.empty[String, (Long, collection.mutable.Set[Long])]
    evs.groupBy(_._1).foreach { case (uid, es) =>
      val types = es.sortBy(e => (e._2, e._3)).map(_._4)
      types.sliding(3).filter(_.size == 3).foreach { t =>
        val k = t.mkString(">")
        val (n, us) = tri.getOrElseUpdate(k, (0L, collection.mutable.Set.empty[Long]))
        tri(k) = (n + 1, us += uid)
      }
    }
    val expect = tri.toSeq
      .map { case (k, (n, us)) => (k, n, us.size.toLong) }
      .sortBy { case (k, n, _) => (-n, k) }
      .take(rows.length)
    val got = rows.map(r => (r.getAs[String]("trigram"), r.getAs[Long]("n"), r.getAs[Long]("n_users"))).toSeq
    assert(got == expect, s"trigram top-${rows.length} mismatch: got ${got.take(3)}, want ${expect.take(3)}")
  }

  test("feature_woe_encode: woe matches ln of the exact odds ratio; pos sums to urgent total") {
    val rows = run("feature_woe_encode").collect()
    assert(rows.length == 5)
    val urgent = Tables.orders(spark, sfDir).filter(col("o_orderpriority") === "1-URGENT").count()
    assert(rows.map(_.getAs[Long]("pos")).sum == urgent)
    val tpos = rows.map(_.getAs[Long]("pos")).sum
    val tneg = rows.map(r => r.getAs[Long]("n_orders") - r.getAs[Long]("pos")).sum
    rows.foreach { r =>
      val pos = r.getAs[Long]("pos")
      val neg = r.getAs[Long]("n_orders") - pos
      val want = BigDecimal(math.log((pos * tneg).toDouble / (neg * tpos).toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
      assert(math.abs(r.getAs[Double]("woe") - want) < 1e-9, s"woe mismatch: $r want $want")
    }
  }
}
