package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructType}

/** Glue DynamicFrame verb equivalence layer (SURVEY.md §2.9) — the verbs a
  * Glue ETL user calls, each expressed as plain DataFrame ops. No
  * DynamicFrame clone, no choice types: the capabilities, not the wrapper.
  * Exercised verb-by-verb in GlueParitySpec.
  */
object GlueParity {

  /** ApplyMapping: (from, toType, toName) triples — select+cast+rename. */
  def applyMapping(df: DataFrame, mapping: Seq[(String, String, String)]): DataFrame =
    df.select(mapping.map { case (f, t, n) => col(f).cast(t).as(n) }: _*)

  /** SelectFields / DropFields. */
  def selectFields(df: DataFrame, fields: Seq[String]): DataFrame = df.select(fields.map(col): _*)
  def dropFields(df: DataFrame, fields: Seq[String]): DataFrame = df.drop(fields: _*)

  /** RenameField. */
  def renameField(df: DataFrame, from: String, to: String): DataFrame = df.withColumnRenamed(from, to)

  /** ResolveChoice policies over a string column with mixed parseability
    * (Glue's `choice` type resolution):
    *  - cast:      try_cast — unparseable becomes NULL
    *  - make_cols: keep raw AND typed as separate columns
    *  - project:   keep only rows that parse, typed
    */
  def resolveChoiceCast(df: DataFrame, c: String, t: String): DataFrame =
    df.withColumn(c, expr(s"try_cast($c AS $t)"))

  def resolveChoiceMakeCols(df: DataFrame, c: String, t: String): DataFrame =
    df.withColumn(s"${c}_string", col(c).cast("string"))
      .withColumn(s"${c}_$t", expr(s"try_cast($c AS $t)"))
      .drop(c)

  def resolveChoiceProject(df: DataFrame, c: String, t: String): DataFrame =
    df.filter(expr(s"try_cast($c AS $t)").isNotNull)
      .withColumn(c, expr(s"try_cast($c AS $t)"))

  /** UnnestFrame: recursively flatten struct columns to dotted names
    * (arrays left as-is — that's Relationalize's job).
    */
  def unnestFrame(df: DataFrame): DataFrame = {
    def flatten(schema: StructType, prefix: String): Seq[Column] =
      schema.fields.flatMap { f =>
        val path = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
        f.dataType match {
          case s: StructType => flatten(s, path)
          case _             => Seq(col(path).as(path.replace(".", "_")))
        }
      }
    val cols = flatten(df.schema, "")
    val out = df.select(cols: _*)
    if (out.schema.fields.exists(_.dataType.isInstanceOf[StructType])) unnestFrame(out) else out
  }

  /** Relationalize: flatten the root (structs → dotted columns) and split
    * every array column into a child frame keyed by (root id, array index).
    * Returns root + one frame per array path, Glue-style.
    */
  def relationalize(df: DataFrame, idCol: String): Map[String, DataFrame] = {
    val flat = unnestFrame(df)
    val arrayCols = flat.schema.fields.collect { case f if f.dataType.isInstanceOf[ArrayType] => f.name }
    val root = flat.drop(arrayCols: _*)
    val children = arrayCols.map { ac =>
      val child = flat
        .select(col(idCol), posexplode_outer(col(ac)).as(Seq("idx", "val")))
      val flatChild =
        if (child.schema("val").dataType.isInstanceOf[StructType]) unnestFrame(child) else child
      ac -> flatChild
    }.toMap
    children + ("root" -> root)
  }

  /** SplitFields: two frames — the named fields and the rest. */
  def splitFields(df: DataFrame, fields: Seq[String]): (DataFrame, DataFrame) = {
    val rest = df.columns.filterNot(fields.contains)
    (df.select(fields.map(col): _*), df.select(rest.map(col): _*))
  }

  /** SplitRows: (matching, non-matching) — disjoint and complete. NULL
    * predicate results land in the second frame (Glue routes non-true rows
    * to the fallback frame).
    */
  def splitRows(df: DataFrame, pred: Column): (DataFrame, DataFrame) =
    (df.filter(pred), df.filter(!coalesce(pred, lit(false))))

  /** DropNullFields (column form): drop columns that are entirely NULL.
    * One aggregate pass over counts; the collect is schema-sized (one row),
    * not data-sized.
    */
  def dropNullFields(df: DataFrame): DataFrame = {
    val counts = df
      .agg(count(lit(1)).as("__n"), df.columns.map(c => count(col(c)).as(c)).toSeq: _*)
      .head()
    val allNull = df.columns.filter(c => counts.getAs[Long](c) == 0L)
    df.drop(allNull: _*)
  }

  /** Unbox: JSON-in-string column → typed struct. */
  def unbox(df: DataFrame, c: String, ddlSchema: String): DataFrame =
    df.withColumn(c, from_json(col(c), StructType.fromDDL(ddlSchema)))

  /** Spigot: side-channel sample tap (first n rows by a total order, so the
    * tap is deterministic), passes the input through unchanged.
    */
  def spigot(df: DataFrame, path: String, n: Int, orderCol: String): DataFrame = {
    df.orderBy(col(orderCol)).limit(n).write.mode("overwrite").json(path)
    df
  }
}
