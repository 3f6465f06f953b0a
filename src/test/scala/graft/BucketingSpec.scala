package graft

import graft.ops.Bucketing
import org.apache.spark.sql.functions._

/** Bucketed co-located join: same rows as the plain join, zero shuffle
  * exchanges in the physical plan.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed join is exchange-free and result-identical to plain join") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the SMJ path
    try {
      val orders = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey", "o_totalprice")
      val customer = Tables.customer(spark, sfDir)
        .select(col("c_custkey").as("o_custkey"), col("c_name"))

      Bucketing.writeBucketed(orders, "orders_b", "o_custkey", 8)
      Bucketing.writeBucketed(customer, "customer_b", "o_custkey", 8)

      val bucketed = Bucketing.joinBucketed(spark, "orders_b", "customer_b", "o_custkey")
      bucketed.count() // materialize so executedPlan is final (AQE)
      assert(Bucketing.hasNoShuffle(bucketed), "bucketed join must not re-shuffle either side:\n" +
        bucketed.queryExecution.executedPlan.toString.take(2000))

      val plain = orders.join(customer, "o_custkey")
      assert(
        bucketed.orderBy("o_orderkey").collect().sameElements(plain.orderBy("o_orderkey").collect())
      )
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
