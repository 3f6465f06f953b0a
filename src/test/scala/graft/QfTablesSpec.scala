package graft

import org.apache.spark.sql.functions._

/** Unit tests for the determinism helpers and the table loaders. */
class QfTablesSpec extends SparkSpec {
  import spark.implicits._

  test("dsum is partitioning-invariant (the property plain double sum lacks)") {
    val xs = (1 to 10000).map(i => i * 0.01 + 0.001)
    val df1 = xs.toDF("x").repartition(1)
    val df7 = xs.toDF("x").repartition(7)
    val a = df1.agg(Qf.dsum(col("x"), 4)).collect()(0).getDouble(0)
    val b = df7.agg(Qf.dsum(col("x"), 4)).collect()(0).getDouble(0)
    assert(a == b, "dsum must be bit-identical across partitionings")
  }

  test("davg = exact sum / count") {
    val df = Seq(1.0, 2.0, 4.0).toDF("x")
    assert(df.agg(Qf.davg(col("x"), 2)).collect()(0).getDouble(0) == 7.0 / 3)
  }

  test("events loader: etime is the microsecond truncation of ts") {
    val e = Tables
      .events(spark, sfDir)
      .select(col("ts"), col("etime"), unix_micros(col("etime")).as("us"))
      .collect()
    assert(e.nonEmpty)
    e.foreach { r =>
      assert(r.getAs[Long]("us") == r.getAs[Long]("ts") / 1000L, "etime must equal ts div 1000 µs")
    }
  }

  test("star tables load with expected key columns") {
    assert(Tables.region(spark, sfDir).columns.contains("r_regionkey"))
    assert(Tables.lineitem(spark, sfDir).columns.contains("l_orderkey"))
    assert(Tables.documents(spark, sfDir).columns.sorted.sameElements(
      Array("doc_id", "lang", "n_chars", "source", "text")))
    assert(Tables.embeddings(spark, sfDir).columns.contains("embedding"))
  }
}
