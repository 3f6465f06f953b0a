package graft

import org.apache.spark.sql.functions._

/** The typed Dataset[T] surface (SURVEY.md §1.1): case-class Encoders over
  * the corpus tables, typed filter/map/groupByKey agreeing with the
  * untyped DataFrame plans — the API a library user reaches for when
  * compile-time row types matter more than dynamic schemas.
  */
object TypedApiSpec {
  // top-level so Spark can synthesize Encoders (inner classes can't)
  case class Doc(doc_id: Long, text: String, lang: String, source: String, n_chars: Long)
  case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String, o_totalprice: Double)
}

class TypedApiSpec extends SparkSpec {
  import TypedApiSpec._
  import spark.implicits._

  test("Dataset[Doc]: typed filter/map equals the DataFrame plan") {
    val ds = Tables.documents(spark, sfDir).as[Doc]
    val typed = ds
      .filter(_.lang == "en")
      // split limit -1 keeps trailing empties, matching Spark's split()
      .map(d => (d.doc_id, d.text.split(" ", -1).length))
      .toDF("doc_id", "n_tokens")
    val untyped = Tables
      .documents(spark, sfDir)
      .filter(col("lang") === "en")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tokens"))
    assert(
      typed.orderBy("doc_id").collect().toSeq == untyped.orderBy("doc_id").collect().toSeq
    )
  }

  test("groupByKey + typed agg equals groupBy") {
    val ds = Tables
      .orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .as[Order]
    val typed = ds
      .groupByKey(_.o_orderstatus)
      .count()
      .collect()
      .map { case (k, n) => k -> n }
      .toMap
    val untyped = Tables
      .orders(spark, sfDir)
      .groupBy("o_orderstatus")
      .count()
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(typed == untyped)
  }

  test("typed semantics survive a round trip through the untyped plan") {
    val ds = Tables.documents(spark, sfDir).as[Doc]
    val back = ds.toDF().as[Doc]
    assert(back.filter(_.n_chars > 300).count() ==
      Tables.documents(spark, sfDir).filter(col("n_chars") > 300).count())
  }

  test("cogroup: per-key imperative merge of two Datasets equals the join formulation") {
    // cogroup is the typed escape hatch when a per-key merge needs BOTH
    // sides' full iterators at once (reconciliation, ordered zips) — logic a
    // join can't express without windows. Here the merge (order count +
    // which orders have > 3 line items) is join-expressible on purpose, so
    // the cogroup result can be verified against the declarative plan.
    val orders = Tables
      .orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"))
      .as[(Long, Long)]
      .groupByKey(_._1)
    val items = Tables
      .lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_quantity"))
      .as[(Long, Double)]
      .groupByKey(_._1)
    val merged = orders
      .cogroup(items) { (key, os, ls) =>
        val o = os.toSeq
        if (o.isEmpty) Iterator.empty // line items without an order row
        else {
          val qtys = ls.map(_._2).toSeq
          Iterator.single((key, qtys.length.toLong, qtys.length > 3))
        }
      }
      .toDF("o_orderkey", "n_items", "big")
    val joined = Tables
      .orders(spark, sfDir)
      .select("o_orderkey")
      .join(
        Tables.lineitem(spark, sfDir).groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("n_items")),
        col("o_orderkey") === col("l_orderkey"),
        "left",
      )
      .select(
        col("o_orderkey"),
        coalesce(col("n_items"), lit(0L)).as("n_items"),
        (coalesce(col("n_items"), lit(0L)) > 3).as("big"),
      )
    assert(
      merged.orderBy("o_orderkey").collect().toSeq ==
        joined.orderBy("o_orderkey").collect().toSeq
    )
  }
}
