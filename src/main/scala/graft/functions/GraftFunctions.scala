package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registration for graft's native expressions.
  *
  * Two paths, same function:
  *  - `GraftExtensions` for `spark.sql.extensions=graft.functions.GraftExtensions`
  *    (the SparkSessionExtensions injection point — cluster-config style);
  *  - `GraftFunctions.register(spark)` for imperative registration on an
  *    existing session (idempotent; query builders call it so the functions
  *    exist no matter who built the session — driver smoke included).
  */
object GraftFunctions {

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) =>
        children match {
          case Seq(a, b) => DotProduct(a, b)
          case _ =>
            throw new IllegalArgumentException(
              s"graft_dot expects 2 arguments, got ${children.length}")
        },
    ),
    (
      FunctionIdentifier("graft_l2sq"),
      new ExpressionInfo(classOf[L2Dist2].getName, "graft_l2sq"),
      (children: Seq[Expression]) =>
        children match {
          case Seq(a, b) => L2Dist2(a, b)
          case _ =>
            throw new IllegalArgumentException(
              s"graft_l2sq expects 2 arguments, got ${children.length}")
        },
    ),
    (
      FunctionIdentifier("graft_lsh_buckets"),
      new ExpressionInfo(classOf[LshBuckets].getName, "graft_lsh_buckets"),
      (children: Seq[Expression]) =>
        children match {
          case Seq(a, b) => LshBuckets(a, b)
          case _ =>
            throw new IllegalArgumentException(
              s"graft_lsh_buckets expects 2 arguments, got ${children.length}")
        },
    ),
    (
      FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash_sig"),
      // optional second arg (nHashes) must be a foldable int; defaults to 128
      (children: Seq[Expression]) =>
        MinHashSig(
          children(0),
          children.lift(1).map(_.eval().asInstanceOf[Number].intValue()).getOrElse(128),
        ),
    ),
    // Spark's OWN runtime-filter expressions, which the optimizer injects
    // but the public registry doesn't expose: surfacing them lets plans
    // build explicit semi-join bloom prunes (Text.pairableShinglesBloom)
    // with the exact sketch the engine trusts for its runtime filters —
    // no custom bloom implementation to get wrong.
    (
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg",
      ),
      // 1-3 args like the engine's own injection sites: (child),
      // (child, estimatedItems), (child, estimatedItems, numBits) —
      // explicit arity dispatch so a wrong call count is an analysis
      // error, not an IndexOutOfBoundsException from the builder
      (children: Seq[Expression]) =>
        children match {
          case Seq(c) =>
            new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c)
          case Seq(c, n) =>
            new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c, n)
          case Seq(c, n, b) =>
            new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c, n, b)
          case _ =>
            throw new IllegalArgumentException(
              s"graft_bloom_agg expects 1 to 3 arguments, got ${children.length}")
        },
    ),
    (
      FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_might_contain",
      ),
      (children: Seq[Expression]) =>
        children match {
          case Seq(bf, v) =>
            org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(bf, v)
          case _ =>
            throw new IllegalArgumentException(
              s"graft_might_contain expects 2 arguments, got ${children.length}")
        },
    ),
  )

  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}

/** `spark.sql.extensions` entry point: SQL functions + the HOF→native
  * dot-product optimizer rewrite.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => DotProductRewrite)
  }
}
