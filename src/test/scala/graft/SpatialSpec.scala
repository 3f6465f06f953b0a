package graft

import org.apache.spark.sql.functions._

/** Laws for the grid-blocked radius join: the blocking must be LOSSLESS
  * (exact equality with a brute-force all-pairs recompute — a point within
  * radius r always falls in the probe's 3×3 cell neighborhood when cells
  * are r-sized), and the plan must contain no cross product.
  */
class SpatialSpec extends SparkSpec {

  test("join_spatial_grid equals the brute-force all-pairs answer exactly") {
    def coords(keys: Array[Long], sx: String, sy: String): Map[Long, (Double, Double)] = {
      val df = spark
        .createDataFrame(keys.map(Tuple1(_)).toSeq)
        .toDF("k")
        .select(
          col("k"),
          conv(substring(md5(concat(lit(sx), col("k").cast("string"))), 1, 13), 16, 10)
            .cast("double") / lit(4503599627370496.0) * 1000.0,
          conv(substring(md5(concat(lit(sy), col("k").cast("string"))), 1, 13), 16, 10)
            .cast("double") / lit(4503599627370496.0) * 1000.0,
        )
      df.collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    }
    val custKeys = Tables.customer(spark, sfDir).select("c_custkey").collect().map(_.getLong(0))
    val suppKeys = Tables.supplier(spark, sfDir).select("s_suppkey").collect().map(_.getLong(0))
    val cs = coords(custKeys, "px#", "py#")
    val ss = coords(suppKeys, "qx#", "qy#")
    val want = suppKeys.map { sk =>
      val (sx, sy) = ss(sk)
      val d2s = cs.values.toSeq
        .map { case (cx, cy) => (sx - cx) * (sx - cx) + (sy - cy) * (sy - cy) }
        .filter(_ <= 625.0)
      sk -> ((d2s.length.toLong,
        if (d2s.isEmpty) None
        else Some(d2s.map(d => BigDecimal(math.sqrt(d)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble).min)))
    }.toMap
    val got = SparkEntry
      .queries("join_spatial_grid")(spark, sfDir)
      .collect()
      .map { r =>
        r.getAs[Long]("s_suppkey") -> ((r.getAs[Long]("n_within"),
          Option(r.getAs[java.lang.Double]("nearest_dist")).map(_.doubleValue)))
      }
      .toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (k, (n, d)) =>
      assert(got(k)._1 == n, s"supplier $k count: ${got(k)._1} != $n")
      (got(k)._2, d) match {
        case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-9, s"supplier $k nearest")
        case (a, b)             => assert(a == b, s"supplier $k nearest presence")
      }
    }
    assert(want.values.exists(_._1 > 0), "fixture must produce at least one non-empty neighborhood")
  }

  test("join_spatial_grid plans an equi join on the cell id, no cross product") {
    val p = SparkEntry.queries("join_spatial_grid")(spark, sfDir).queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "grid blocking must equi-join on cells")
  }
}
