package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Custom typed aggregation surface (SURVEY.md §2.4 `agg_custom_geomean`,
  * §2.11): an `Aggregator[IN, BUF, OUT]` registered through `functions.udaf`
  * — the Spark-native replacement for Glue/PySpark GROUPED_AGG UDAFs.
  *
  * Geometric mean accumulates Σ ln(x) + n (never Π x, which under/overflows
  * at any real scale) and merges buffers associatively — the mergeable-state
  * shape every distributed aggregate needs (same contract partial/final hash
  * aggregation gives built-ins). Declared: the oracle identity is
  * exp(avg(ln(x))), with round(4) absorbing summation-order ULP noise.
  */
object Udaf {

  /** Buffer: (sum of logs, count). */
  final case class GeoBuf(logSum: Double, n: Long)

  val geomean: Aggregator[Double, GeoBuf, Double] = new Aggregator[Double, GeoBuf, Double] {
    def zero: GeoBuf = GeoBuf(0.0, 0L)
    def reduce(b: GeoBuf, x: Double): GeoBuf =
      if (x > 0) GeoBuf(b.logSum + math.log(x), b.n + 1) else b
    def merge(a: GeoBuf, b: GeoBuf): GeoBuf = GeoBuf(a.logSum + b.logSum, a.n + b.n)
    def finish(b: GeoBuf): Double = if (b.n == 0) Double.NaN else math.exp(b.logSum / b.n)
    def bufferEncoder: Encoder[GeoBuf] = Encoders.product[GeoBuf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  private def aggCustomGeomean(s: SparkSession, dir: String): DataFrame = {
    val geo = udaf(geomean)
    Tables
      .orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(round(geo(col("o_totalprice")), 4).as("geomean_price"), count(lit(1)).as("n_orders"))
      .orderBy("o_orderstatus")
  }

  val entries: Seq[QueryDef] = Seq(
    QueryDef(
      "agg_custom_geomean",
      aggCustomGeomean,
      Some(
        "SELECT o_orderstatus, round(exp(avg(ln(o_totalprice))), 4) AS geomean_price, " +
          "COUNT(*) AS n_orders FROM orders WHERE o_totalprice > 0 " +
          "GROUP BY o_orderstatus ORDER BY o_orderstatus"
      ),
    ),
  )
}
