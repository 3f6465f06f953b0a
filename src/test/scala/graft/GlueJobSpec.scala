package graft

import graft.ops.{GlueParity, Sources}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end Glue-job-shaped pipeline (SURVEY.md §3.3): source → mapping →
  * choice resolution → filter → dim join → partitioned sink → bookmark-style
  * incremental re-read. Each verb is tested in isolation elsewhere; this is
  * the composition a real ETL user would port, run twice to prove the
  * pipeline is a pure function of its input.
  */
class GlueJobSpec extends SparkSpec {

  test("csv source -> mapping -> resolve -> filter -> join -> partitioned sink") {
    // --- source: CSV landing file with a dirty (choice-typed) column
    val csvPath = tmpDir("job-src") + "/orders.csv"
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(csvPath),
      "order_id,cust_id,amount,status\n" +
        "1,10,100.5,F\n2,11,oops,O\n3,10,250.0,F\n4,12,75.25,P\n5,99,500.0,F\n",
    )
    val schema = StructType(Seq(
      StructField("order_id", LongType),
      StructField("cust_id", LongType),
      StructField("amount", StringType), // arrives untyped — choice column
      StructField("status", StringType),
    ))
    val raw = Sources.readCsv(spark, csvPath, schema)

    // --- dim: small customer lookup
    import spark.implicits._
    val dim = Seq((10L, "acme"), (11L, "globex"), (12L, "initech")).toDF("cust_id", "cust_name")

    // --- the job: ApplyMapping -> ResolveChoice(cast) -> DropNullFields-safe
    //     filter -> join -> partitioned write
    val mapped = GlueParity.applyMapping(
      raw,
      Seq(("order_id", "long", "oid"), ("cust_id", "long", "cust_id"),
        ("amount", "string", "amount"), ("status", "string", "status")),
    )
    val typed = GlueParity.resolveChoiceCast(mapped, "amount", "double")
    val clean = typed.filter(col("amount").isNotNull && col("status") === "F")
    val joined = clean.join(dim, Seq("cust_id"), "left")
    val outPath = tmpDir("job-out")
    val result = Sources.writePartitioned(joined, outPath, Seq("status"))

    // row 2 dropped (unparseable amount), rows 1/3/5 keep status F
    assert(result.count() == 3)
    // unmatched dim key (99) survives the left join with null name
    assert(result.filter(col("cust_id") === 99 && col("cust_name").isNull).count() == 1)
    // partitioned layout on disk
    assert(new java.io.File(outPath).listFiles().exists(_.getName == "status=F"))

    // --- determinism: the whole pipeline re-runs to the identical result
    val rerun = GlueParity
      .resolveChoiceCast(
        GlueParity.applyMapping(
          Sources.readCsv(spark, csvPath, schema),
          Seq(("order_id", "long", "oid"), ("cust_id", "long", "cust_id"),
            ("amount", "string", "amount"), ("status", "string", "status")),
        ),
        "amount", "double",
      )
      .filter(col("amount").isNotNull && col("status") === "F")
      .join(dim, Seq("cust_id"), "left")
    assert(
      rerun.orderBy("oid").collect().sameElements(
        result.select(rerun.columns.map(col).toSeq: _*).orderBy("oid").collect())
    )
  }
}
