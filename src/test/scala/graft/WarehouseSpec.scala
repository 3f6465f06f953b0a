package graft

import org.apache.spark.sql.functions._

/** Semantic laws for the §2.16 warehouse-maintenance verbs — the invariants
  * that hold on ANY snapshot, beyond the driver's hash gate.
  */
class WarehouseSpec extends SparkSpec {

  private def run(key: String) = SparkEntry.queries(key)(spark, sfDir)

  test("cdc_apply: deletes drop, updates win, inserts land, counts reconcile") {
    val orders = Tables.orders(spark, sfDir).cache()
    val nOrders = orders.count()
    val nDel = orders.filter(col("o_orderkey") % 13 === 0).count()
    val nIns = orders.filter(col("o_orderkey") % 97 === 0).count()

    val out = run("cdc_apply").cache()
    try {
      // cardinality: snapshot − deletes + inserts (inserted keys are fresh)
      assert(out.count() == nOrders - nDel + nIns)
      // no deleted key survives
      assert(out.filter(col("o_orderkey") % 13 === 0 && col("o_orderkey") < ops.Warehouse.SynthKeyOffset).count() == 0)
      // every surviving %7 key carries the v1 update (price = orig + 100)
      val upd = out
        .filter(col("o_orderkey") % 7 === 0 && col("o_orderkey") < ops.Warehouse.SynthKeyOffset)
        .join(orders, "o_orderkey")
      assert(upd.count() > 0, "fixture must exercise the update branch")
      assert(upd.filter(col("last_version") =!= 1L || col("last_op") =!= "U").count() == 0)
      assert(
        upd.filter(abs(col("price") - round(col("o_totalprice") + 100d, 2)) > 1e-9).count() == 0
      )
      // inserted keys all present with the fresh-status marker
      assert(out.filter(col("o_orderkey") >= ops.Warehouse.SynthKeyOffset).count() == nIns)
      assert(out.filter(col("o_orderkey") >= ops.Warehouse.SynthKeyOffset && col("o_orderstatus") =!= "N").count() == 0)
    } finally { out.unpersist(); orders.unpersist() }
  }

  test("snapshot_diff: statuses partition the key universe with the synthesized churn counts") {
    val docs = Tables.documents(spark, sfDir).cache()
    val nDocs = docs.count()
    val nRemoved = docs.filter(col("doc_id") % 11 === 0).count()
    val nAdded = docs.filter(col("doc_id") % 31 === 0).count()
    val nChanged = docs.filter(col("doc_id") % 5 === 0 && col("doc_id") % 11 =!= 0).count()
    docs.unpersist()

    val rows = run("snapshot_diff").collect().map(r => r.getAs[String]("status") -> r).toMap
    assert(rows("added").getAs[Long]("n") == nAdded)
    assert(rows("removed").getAs[Long]("n") == nRemoved)
    assert(rows("changed").getAs[Long]("n") == nChanged)
    assert(rows("unchanged").getAs[Long]("n") == nDocs - nRemoved - nChanged)
    // added keys live in the synthesized key range
    assert(rows("added").getAs[Long]("min_key") >= ops.Warehouse.SynthKeyOffset)
    assert(rows("removed").getAs[Long]("max_key") < ops.Warehouse.SynthKeyOffset)
  }

  test("snapshot_diff shuffles signatures, not text: no exchange carries the text column") {
    // The design claim is a WIDTH claim: each side reduces to (key, 16-byte
    // hash pair) map-side, so the ~1 KB text column never reaches the
    // full-outer join's exchange. A byte-count A/B can't show this on the
    // synthetic corpus (its tiny-vocabulary text LZ4-compresses ~100×, below
    // even the incompressible hash signature — on natural text the ratio is
    // 2-3× and the signature wins outright), so the invariant is pinned on
    // the plan itself: every shuffle's output is hash-signature-narrow.
    val p = SparkEntry.queries("snapshot_diff")(spark, sfDir).queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case other                                                            => other
    }
    val exchanges = p.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.nonEmpty, "the diff join must shuffle (nothing broadcasts at snapshot scale)")
    exchanges.foreach { e =>
      val names = e.output.map(_.name)
      assert(!names.contains("text"), s"text column leaked into an exchange: $names")
    }
  }

  test("reshape_unpivot: melt fans out 4x and per-metric totals reconcile with direct sums") {
    val li = Tables.lineitem(spark, sfDir)
    val out = run("reshape_unpivot").collect()
    assert(out.map(_.getAs[Long]("n")).sum == 4 * li.count())
    val direct = li
      .groupBy("l_returnflag")
      .agg(round(Qf.dsum(col("l_quantity")), 4).as("q"))
      .collect()
      .map(r => r.getAs[String]("l_returnflag") -> r.getAs[Double]("q"))
      .toMap
    out.filter(_.getAs[String]("metric") == "l_quantity").foreach { r =>
      assert(r.getAs[Double]("total") == direct(r.getAs[String]("l_returnflag")))
    }
  }
}
