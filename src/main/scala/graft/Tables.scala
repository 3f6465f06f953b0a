package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One loader per test table (SURVEY.md §7.1).
  *
  * All reads go through here so scale-relevant read behavior (schema
  * expectations, the nanosecond-timestamp workaround for `events`) lives in
  * exactly one place. Loaders return plain lazy DataFrames — no caching, no
  * actions — so each query plan owns its scan and Catalyst can push
  * filters/projections into the Parquet scan per query.
  */
object Tables {
  private def p(dir: String, name: String): String = s"$dir/$name.parquet"

  def region(s: SparkSession, dir: String): DataFrame   = s.read.parquet(p(dir, "region"))
  def nation(s: SparkSession, dir: String): DataFrame   = s.read.parquet(p(dir, "nation"))
  def customer(s: SparkSession, dir: String): DataFrame = s.read.parquet(p(dir, "customer"))
  def supplier(s: SparkSession, dir: String): DataFrame = s.read.parquet(p(dir, "supplier"))
  def part(s: SparkSession, dir: String): DataFrame     = s.read.parquet(p(dir, "part"))
  def orders(s: SparkSession, dir: String): DataFrame   = s.read.parquet(p(dir, "orders"))
  def lineitem(s: SparkSession, dir: String): DataFrame = s.read.parquet(p(dir, "lineitem"))
  def documents(s: SparkSession, dir: String): DataFrame  = s.read.parquet(p(dir, "documents"))
  def embeddings(s: SparkSession, dir: String): DataFrame = s.read.parquet(p(dir, "embeddings"))

  /** `events.ts` is Parquet INT64 TIMESTAMP(NANOS), which Spark's vectorized
    * parquet reader rejects (SURVEY.md §1.3). We read it as a nanosecond LONG
    * (runtime-settable legacy conf — keeps vectorization) and derive `etime`,
    * a TimestampType truncated to microseconds via *integer* division
    * (`ts div 1000`). Integer div matters: `(ts / 1000).cast("long")` would
    * round-trip ~1.7e18 through double and lose the low bits, shifting
    * microsecond boundaries. DuckDB's TIMESTAMP_NS scan truncates to µs the
    * same way, so `etime` here ≡ `ts` in oracle SQL.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read
      .parquet(p(dir, "events"))
      .withColumn("etime", expr("timestamp_micros(ts div 1000)"))
  }
}
