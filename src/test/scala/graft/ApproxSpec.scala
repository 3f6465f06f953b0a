package graft

import graft.ops.Approx
import org.apache.spark.sql.functions._

/** Sketch tolerance + salted-join equivalence (SURVEY.md §5.5, §2.3). */
class ApproxSpec extends SparkSpec {

  test("approx_count_distinct within 3*rsd of exact") {
    val rows = Approx.approxDistinctUsers(Tables.events(spark, sfDir), rsd = 0.05).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(approx - exact) <= 3 * 0.05 * exact + 1,
        s"${r.getString(0)}: approx=$approx exact=$exact out of tolerance")
    }
  }

  test("percentile_approx close to exact at high accuracy") {
    val rows = Approx.approxPercentiles(Tables.lineitem(spark, sfDir)).collect()
    rows.foreach { r =>
      val relErr50 = math.abs(r.getAs[Double]("p50_approx") - r.getAs[Double]("p50_exact")) /
        r.getAs[Double]("p50_exact")
      assert(relErr50 < 0.02, s"p50 rel err $relErr50")
    }
  }

  test("mergeable HLL sketches: shard+union estimate within 5% of exact") {
    val est = Approx.hllMergeable(Tables.events(spark, sfDir)).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("approx_users")).toMap
    val exact = Tables.events(spark, sfDir).groupBy("event_type")
      .agg(countDistinct("user_id").as("n")).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    exact.foreach { case (k, ex) =>
      assert(math.abs(est(k).toDouble - ex) <= 0.05 * ex + 1, s"$k: hll=${est(k)} exact=$ex")
    }
  }

  test("salted join returns exactly the plain join's rows") {
    val fact = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
    val dim = Tables.customer(spark, sfDir).select("c_custkey", "c_name")
      .withColumnRenamed("c_custkey", "o_custkey")
    val joined = fact.join(dim, "o_custkey")
    val plain = joined.orderBy("o_orderkey").collect()
    val salted = Approx.saltedJoin(fact, dim, "o_custkey", salt = 8)
      .select(joined.columns.map(col).toSeq: _*)
      .orderBy("o_orderkey").collect()
    assert(salted.sameElements(plain))
  }

  test("bitmap distinct is exact and bitmaps merge losslessly across shards") {
    val events = Tables.events(spark, sfDir)
    val exact = events
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("n"))
      .collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n"))
      .toMap
    val got = SparkEntry
      .queries("agg_bitmap_distinct")(spark, sfDir)
      .collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("distinct_users"))
      .toMap
    assert(got == exact, "bitmap count must equal exact countDistinct")

    // merge law: per-shard word frames OR together into the whole answer
    def words(df: org.apache.spark.sql.DataFrame) = df
      .select(
        col("event_type"),
        expr("user_id div 63").as("w_idx"),
        expr("shiftleft(cast(1 as bigint), cast(user_id % 63 as int))").as("bit"),
      )
      .groupBy("event_type", "w_idx")
      .agg(expr("bit_or(bit)").as("word"))
    val merged = words(events.filter(col("event_id") % 2 === 0))
      .unionByName(words(events.filter(col("event_id") % 2 =!= 0)))
      .groupBy("event_type", "w_idx")
      .agg(expr("bit_or(word)").as("word"))
      .groupBy("event_type")
      .agg(sum(bit_count(col("word")).cast("long")).as("n"))
      .collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n"))
      .toMap
    assert(merged == exact, "sharded bitmaps must OR into the exact whole-corpus answer")
  }
}
