package graft

import graft.ops.GlueParity
import org.apache.spark.sql.functions._

/** One test per Glue verb (SURVEY.md §2.9 checklist). */
class GlueParitySpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, "10", "a", 1.5),
    (2L, "x", "b", 2.5), // "x" unparseable as int -> choice column
    (3L, "30", null, 3.5),
  ).toDF("id", "amount", "tag", "score")

  test("ApplyMapping: select + cast + rename") {
    val out = GlueParity.applyMapping(df, Seq(("id", "long", "pk"), ("score", "string", "score_s")))
    assert(out.columns.toSeq == Seq("pk", "score_s"))
    assert(out.schema("score_s").dataType.typeName == "string")
  }

  test("SelectFields / DropFields / RenameField") {
    assert(GlueParity.selectFields(df, Seq("id", "tag")).columns.toSeq == Seq("id", "tag"))
    assert(!GlueParity.dropFields(df, Seq("tag")).columns.contains("tag"))
    assert(GlueParity.renameField(df, "tag", "label").columns.contains("label"))
  }

  test("ResolveChoice cast: unparseable becomes NULL") {
    val out = GlueParity.resolveChoiceCast(df, "amount", "int")
    assert(out.filter(col("amount").isNull).count() == 1)
    assert(out.schema("amount").dataType.typeName == "integer")
  }

  test("ResolveChoice make_cols: raw and typed coexist") {
    val out = GlueParity.resolveChoiceMakeCols(df, "amount", "int")
    assert(out.columns.contains("amount_string") && out.columns.contains("amount_int"))
    assert(out.filter(col("amount_int").isNull && col("amount_string").isNotNull).count() == 1)
  }

  test("ResolveChoice project: only parseable rows survive") {
    val out = GlueParity.resolveChoiceProject(df, "amount", "int")
    assert(out.count() == 2)
  }

  test("UnnestFrame flattens nested structs recursively") {
    val nested = Seq((1, ("x", (2.0, true)))).toDF("id", "s")
      .select(col("id"), col("s._1").as("a"), struct(col("s._2._1").as("v"), col("s._2._2").as("f")).as("inner"))
      .select(col("id"), struct(col("a"), col("inner")).as("payload"))
    val out = GlueParity.unnestFrame(nested)
    assert(out.columns.sorted.toSeq == Seq("id", "payload_a", "payload_inner_f", "payload_inner_v"))
  }

  test("Relationalize: root + child frame per array, keyed by (id, idx)") {
    val nested = Seq(
      (1L, "a", Seq(10, 20)),
      (2L, "b", Seq.empty[Int]),
    ).toDF("id", "name", "items")
    val frames = GlueParity.relationalize(nested, "id")
    assert(frames.keySet == Set("root", "items"))
    assert(frames("root").columns.toSeq == Seq("id", "name"))
    val items = frames("items").collect()
    // posexplode_outer keeps the empty-array row with NULL idx/val
    assert(items.length == 3)
    assert(frames("items").filter(col("id") === 1L && col("idx") === 1 && col("val") === 20).count() == 1)
  }

  test("SplitFields / SplitRows are disjoint-complete") {
    val (a, b) = GlueParity.splitFields(df, Seq("id", "score"))
    assert((a.columns ++ b.columns).sorted.toSeq == df.columns.sorted.toSeq)
    val (hit, miss) = GlueParity.splitRows(df, col("tag").isNotNull)
    assert(hit.count() + miss.count() == df.count())
    assert(miss.filter(col("id") === 3).count() == 1) // NULL predicate -> fallback frame
  }

  test("DropNullFields drops only all-null columns") {
    val withNullCol = df.withColumn("dead", lit(null).cast("string"))
    val out = GlueParity.dropNullFields(withNullCol)
    assert(!out.columns.contains("dead"))
    assert(out.columns.contains("tag")) // partially-null survives
  }

  test("Unbox parses JSON-in-string to a typed struct") {
    val boxed = Seq((1, """{"k": 7, "s": "hi"}""")).toDF("id", "payload")
    val out = GlueParity.unbox(boxed, "payload", "k INT, s STRING")
    assert(out.select(col("payload.k")).collect()(0).getInt(0) == 7)
  }

  test("Spigot taps a deterministic sample and passes data through") {
    val path = tmpDir("spigot")
    val out = GlueParity.spigot(df, path, 2, "id")
    assert(out.count() == df.count())
    assert(spark.read.json(path).count() == 2)
  }
}
