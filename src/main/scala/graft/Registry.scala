package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** One declared operator: the Spark plan builder plus (optionally) the
  * equivalent DuckDB SQL the driver uses as the correctness oracle.
  * `oracle = None` means the op is covered by scalatest only and is not
  * declared to the driver's hash-compare gate (SURVEY.md §2.0).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
)

/** Cross-engine determinism helpers (SURVEY.md §2.0 rules).
  *
  * The driver hash-compares our parquet output against DuckDB's answer, so
  * every declared aggregate must be *bit-identical* across engines. Plain
  * double sums are not: partial/final aggregation associates additions in a
  * nondeterministic order. Fix: route sums through exact DECIMAL arithmetic
  * (deterministic regardless of order), then cast the final value back to
  * DOUBLE so both engines emit the same 8-byte value with no decimal
  * scale/precision mismatch in the output schema.
  */
object Qf {
  /** Exact sum of a double expression: cast each value to DECIMAL(28,scale)
    * (scalar cast of identical doubles → identical decimals in both engines),
    * sum exactly, cast the one final value to double.
    * DuckDB mirror: `CAST(SUM(CAST(x AS DECIMAL(28,s))) AS DOUBLE)`.
    *
    * RULE: scale must be >= the true decimal precision of the expression
    * (e.g. 2-decimal money → 2; product of two 2-decimal values → 4; of
    * three → 6). Then the cast never actually rounds and is engine-agnostic;
    * a smaller scale puts ~1% of values at a rounding tie where Spark and
    * DuckDB disagree.
    */
  def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(28, scale))).cast(DoubleType)

  /** Money-grain exact sum: exact decimal accumulation at `scale` (still
    * >= the term's true decimal precision, per the dsum RULE), then ROUNDED
    * TO CENTS before the double cast. The r10 sf1 scale-stress proved the
    * unrounded cast is only cross-engine-identical while the sum's
    * UNSCALED value fits in 2^53: DuckDB converts decimal→double as
    * int128 → double → /10^scale (two roundings), so a scale-6 sum at 1e10
    * magnitude (unscaled 2.8e16) came back 1 ULP off Spark's correctly
    * rounded BigDecimal.doubleValue. Rounding to cents first keeps the
    * unscaled value < 2^53 up to ~9e13 dollars — far beyond any corpus —
    * and cents are the semantic grain of a money total anyway.
    * DuckDB mirror: `CAST(ROUND(SUM(CAST(x AS DECIMAL(28,s))), 2) AS DOUBLE)`
    * (positive money: HALF_UP ≡ DuckDB's half-away-from-zero).
    */
  def dsumCents(c: Column, scale: Int = 4): Column =
    round(sum(c.cast(DecimalType(28, scale))), 2).cast(DoubleType)

  /** Deterministic mean: exact decimal sum divided (in double) by the count.
    * DuckDB mirror: `CAST(SUM(CAST(x AS DECIMAL(28,s))) AS DOUBLE) / COUNT(x)`.
    */
  def davg(c: Column, scale: Int = 4): Column =
    dsum(c, scale) / count(c)

  /** Row count as BIGINT (matches DuckDB COUNT(*)). */
  def nrows: Column = count(lit(1))

  /** Window/rank functions return INT in Spark but BIGINT in DuckDB; always
    * declare ranks as long.
    */
  def asLong(c: Column): Column = c.cast("long")

  /** The seedless-uniform idiom, defined once: the first 13 hex digits of
    * md5(seed || key) as a 52-bit non-negative integer — exactly
    * representable in a double, so `hash52(...)/Hash52Range` is an identical
    * uniform in [0, 1) in both engines. Used for sampling priorities
    * (sample_weighted, sample_reservoir_group) and coordinate synthesis
    * (join_spatial_grid); DuckDB mirror: [[hash52Sql]].
    */
  def hash52(seed: String, key: Column): Column =
    conv(substring(md5(concat(lit(seed), key.cast("string"))), 1, 13), 16, 10).cast("long")

  def hash52Sql(seed: String, keyExpr: String): String =
    s"('0x' || substr(md5('$seed' || $keyExpr), 1, 13))::BIGINT"

  /** 16^13 = 2^52 — the denominator that turns hash52 into a uniform. */
  val Hash52Range = 4503599627370496.0

  /** −0.0 normalization for SIGNED rounded doubles (SURVEY §2.0 rule 8):
    * a value rounding to zero from below is −0.0 in DuckDB but 0.0 in
    * Spark (Round routes through BigDecimal — no signed zero); numerically
    * equal, repr-distinct, hash-mismatch. Apply AFTER the round; mirror in
    * SQL with `CASE WHEN x = 0 THEN 0.0 ELSE x END`. The CASE form
    * survives optimizers (an `x + 0.0` could legally be folded away).
    */
  def zround(c: Column): Column = when(c === lit(0.0), lit(0.0)).otherwise(c)
}
