package graft

import org.apache.spark.sql.functions._

/** Self-consistency over the whole declared catalog (SURVEY.md §5.2): the
  * invariants that catch nondeterminism BEFORE the driver's hash gate does.
  */
class CatalogSpec extends SparkSpec {

  test("keys invariant: oracles cover all declared queries except the known rows-only set") {
    // oracle-less queries get only the driver's weaker rows-only check —
    // adding one must be a deliberate decision, recorded here.
    val rowsOnly = Set(
      "sim_ann_lsh", "sim_ann_ivf", "agg_approx_distinct", "agg_approx_percentile",
      "agg_hll_mergeable", "multimodal_binary",
    )
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet == rowsOnly)
    assert(SparkEntry.queries.nonEmpty)
  }

  test("entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("all declared queries run at sf0.001 and are idempotent (plan-level determinism)") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val a = fn(spark, sfDir).collect()
      val b = fn(spark, sfDir).collect()
      assert(a.sameElements(b), s"$name: two runs differ — nondeterministic query")
    }
  }

  test("plan lint: no DECIMAL/complex outputs, no nondeterministic expressions in declared queries") {
    // DECIMAL in a declared schema fails the driver's hasher even for
    // byte-identical values (round-1 lesson); array/struct/map columns CRASH
    // the driver's pandas comparator outright (round-2 lesson — unhashable
    // numpy.ndarray in sort_values); nondeterministic expressions fail it
    // eventually. Guard all three statically for every declared query:
    // complex results must be flattened (concat_ws) before declaration.
    import org.apache.spark.sql.types.{ArrayType, DecimalType, MapType, StructType}
    val banned = Set(
      "Rand", "Randn", "Uuid", "Shuffle", "CurrentTimestamp", "Now",
      "CurrentDate", "MonotonicallyIncreasingID", "SparkPartitionID", "InputFileName",
    )
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      df.schema.foreach { f =>
        assert(
          !f.dataType.isInstanceOf[DecimalType],
          s"$name declares DECIMAL output column ${f.name}",
        )
        assert(
          !(f.dataType.isInstanceOf[ArrayType] || f.dataType.isInstanceOf[StructType] ||
            f.dataType.isInstanceOf[MapType]),
          s"$name declares complex-typed output column ${f.name} (${f.dataType.simpleString}) — " +
            "the driver checker cannot hash it; flatten with concat_ws (§2.0 rule 7)",
        )
      }
      df.queryExecution.analyzed.foreach { node =>
        node.expressions.foreach(_.foreach { e =>
          assert(
            !banned.contains(e.getClass.getSimpleName),
            s"$name contains nondeterministic expression ${e.getClass.getSimpleName}",
          )
        })
      }
    }
  }

  test("group-sum reconciliation: pricing summary totals vs global aggregate") {
    val global = SparkEntry.queries("agg_global")(spark, sfDir).collect()(0)
    val pricing = SparkEntry
      .queries("agg_groupby_pricing")(spark, sfDir)
      .agg(sum(col("sum_qty")), sum(col("count_order")))
      .collect()(0)
    // pricing filters l_shipdate <= cutoff, so totals must be <= global
    assert(pricing.getDouble(0) <= global.getAs[Double]("sum_qty"))
    assert(pricing.getLong(1) <= global.getAs[Long]("n_rows"))
  }

  test("union-all count additivity") {
    val n = SparkEntry.queries("set_union_all")(spark, sfDir).count()
    val c = Tables.customer(spark, sfDir).count()
    val s = Tables.supplier(spark, sfDir).count()
    assert(n == c + s)
  }

  test("semi + anti partition customers") {
    val semi = SparkEntry.queries("join_semi")(spark, sfDir).count()
    val anti = SparkEntry.queries("join_anti")(spark, sfDir).count()
    assert(semi + anti == Tables.customer(spark, sfDir).count())
  }

  test("topk_global is the true global top-100") {
    val topk = SparkEntry.queries("topk_global")(spark, sfDir).collect()
    assert(topk.length == 100)
    val minTop = topk.map(_.getAs[Double]("l_extendedprice")).min
    val above = Tables
      .lineitem(spark, sfDir)
      .filter(col("l_extendedprice") > minTop)
      .count()
    assert(above <= 100)
  }

  test("rollup grand-total row equals table count") {
    val total = SparkEntry
      .queries("agg_rollup")(spark, sfDir)
      .filter(col("g_flag") === 1 && col("g_status") === 1)
      .collect()
    assert(total.length == 1)
    assert(total(0).getAs[Long]("n_rows") == Tables.lineitem(spark, sfDir).count())
  }
}
