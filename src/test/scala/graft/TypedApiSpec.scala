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
}
