package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed replacement for the single-task global rank / ntile /
  * running-sum window (SURVEY.md §7.4 scale register; the r6 verdict's
  * "WindowExec: No Partition Defined" class).
  *
  * `Window.orderBy(...)` with no partition spec plans an
  * `Exchange SinglePartition` + one-task sort — correct at sf0.1, a hard
  * cap on corpus size at 100 TB (billions of user/customer/vocab rows
  * through one task). The classic fix is two-stage: range-split the frame
  * by the sort key, rank/cumulate LOCALLY inside each split, then lift the
  * local values to global ones by adding per-split offsets (the count and
  * sum of every split strictly before this one). The offsets frame is
  * tiny — one row per shuffle partition — so the lift is a broadcast join,
  * and no task ever sees more than its own range slice.
  *
  * Concretely ([[rankedFrame]]):
  *   1. `repartitionByRange` on (seg ++ order) — Spark's sampled range
  *      partitioner keeps the total order ACROSS partitions, so partition
  *      id is itself sorted: every row in split i precedes every row in
  *      split j > i (order must be strict — include a unique tiebreak key).
  *   2. a window partitioned by (seg, partition id) computes the LOCAL
  *      row_number and running sum — bounded per task by the range split,
  *      never by the frame.
  *   3. a (seg, pid)-grain count/sum aggregate (≤ one row per partition,
  *      and it reuses the step-1 exchange — ReuseExchange dedups the
  *      identical subtree) self-joins broadcast-wise to turn per-split
  *      totals into strictly-before prefix offsets — a ≤ P² triangular
  *      join on a P-row frame, NOT a window, so no unpartitioned WindowExec
  *      survives anywhere in the plan.
  *   4. global rank = local rank + prefix count; global running sum =
  *      local running sum + prefix sum. Bucket boundaries affect BALANCE
  *      only — any split of a total order yields the same global values —
  *      so the result is bit-identical to the single-task window.
  *
  * ntile lifts through the same machinery in closed form ([[ntileOf]]):
  * SQL-standard ntile(b) over n rows gives the first (n mod b) buckets
  * ceil(n/b) rows and the rest floor(n/b), which is a pure integer
  * function of (row number, n) — identical in Spark and DuckDB.
  */
object ScaleRank {

  private val RnCol = "__rn"
  private val CumCol = "__cum"
  private val NCol = "__seg_n"
  private val SumCol = "__seg_sum"

  /** Attach distributed rank/cumsum columns to `df`:
    *   - `__rn`     — 1-based row_number over `order` within `seg`
    *   - `__seg_n`  — row count of the segment (whole frame if seg empty)
    *   - `__cum`    — running sum of `sumCol` incl. current row (if given)
    *   - `__seg_sum`— segment total of `sumCol` (if given)
    *
    * `order` must be a strict total order within each segment (append a
    * unique key as the final tiebreak), matching the determinism rule every
    * declared rank already follows (SURVEY.md §2.0).
    */
  def rankedFrame(
      df: DataFrame,
      seg: Seq[String],
      order: Seq[Column],
      sumCol: Option[String] = None,
  ): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val sortCols = seg.map(col) ++ order
    // localCheckpoint FREEZES the sampled range split before both consumers
    // read it. Without it the local-window branch and the stats branch are
    // optimized into DIFFERENT subtrees (column pruning rewrites the stats
    // side), each re-executing the range exchange with its own sampled
    // boundaries — spark_partition_id() then disagrees across branches and
    // the lifted ranks drift (caught by the DuckDB oracle on
    // stats_mannwhitney_auc). The checkpoint also truncates lineage, so the
    // pre-aggregated frame materializes exactly once (the graph_kcore
    // pattern); Checkpoints.stable config-switches to a reliable checkpoint
    // dir on a real cluster to survive executor loss. Cleanup of the
    // per-invocation blocks rides Spark's ContextCleaner — the RDD becomes
    // unreachable after the query's terminal action and the cleaner
    // unpersists it on GC; CheckpointSpec pins that repeated builds do not
    // accumulate persistent RDDs.
    // eager = false: the checkpoint materializes inside the query's own
    // first job instead of a separate build-time job per invocation — both
    // consumers still read ONE frozen copy (the RDD object is shared, so
    // the range shuffle and its sampled boundaries are computed once per
    // execution regardless)
    val parted = df
      .repartitionByRange(parts, sortCols: _*)
      .withColumn("__pid", spark_partition_id().cast("long"))
      .transform(Checkpoints.stable(_, eager = false))
    val segPid = (seg :+ "__pid").map(col)

    // local rank/cumsum — each task ranks only its own range split
    val wLoc = Window.partitionBy(segPid: _*).orderBy(order: _*)
    val withRn = parted.withColumn("__lrn", row_number().over(wLoc).cast("long"))
    val local = sumCol.fold(withRn) { c =>
      withRn.withColumn(
        "__lcum",
        sum(col(c)).over(wLoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
      )
    }

    // per-split totals: ≤ one row per shuffle partition; the subtree below
    // is the SAME range exchange as `local`'s, so ReuseExchange reads it once
    val statAggs = count(lit(1)).as("__cnt") +: sumCol.map(c => sum(col(c)).as("__psum")).toSeq
    val stats = parted.groupBy(segPid: _*).agg(statAggs.head, statAggs.tail: _*)

    // prefix offsets via a triangular self-join on the P-row stats frame —
    // a broadcast join, deliberately NOT a window (keeps the catalog free of
    // unpartitioned WindowExec nodes, which PlanInvariantsSpec now forbids)
    val peerCols = seg.map(col) ++
      (col("__pid").as("__ppid") +: col("__cnt").as("__pcnt") +:
        sumCol.map(_ => col("__psum").as("__ppsum")).toSeq)
    val peers = stats.select(peerCols: _*)
    val paired =
      if (seg.isEmpty) stats.crossJoin(broadcast(peers))
      else stats.join(broadcast(peers), seg)
    val offAggs =
      Seq(
        sum(when(col("__ppid") < col("__pid"), col("__pcnt")).otherwise(lit(0L))).as("__rn_off"),
        sum(col("__pcnt")).as(NCol),
      ) ++ (if (sumCol.isDefined)
              Seq(
                sum(when(col("__ppid") < col("__pid"), col("__ppsum")).otherwise(lit(0L)))
                  .as("__cum_off"),
                sum(col("__ppsum")).as(SumCol),
              )
            else Nil)
    val off = paired.groupBy(segPid: _*).agg(offAggs.head, offAggs.tail: _*)

    // lift local → global
    val lifted = local
      .join(broadcast(off), seg :+ "__pid")
      .withColumn(RnCol, col("__lrn") + col("__rn_off"))
    val out =
      if (sumCol.isDefined) lifted.withColumn(CumCol, col("__lcum") + col("__cum_off"))
      else lifted
    out.drop("__pid", "__lrn", "__lcum", "__rn_off", "__cum_off")
  }

  /** SQL-standard ntile(b) as a closed-form integer expression over the
    * [[rankedFrame]] columns `__rn` / `__seg_n`: with q = n div b and
    * r = n mod b, the first r·(q+1) rows land in buckets of size q+1, the
    * rest in buckets of size q. Bit-identical to `ntile(b) OVER (ORDER BY
    * ...)` in both Spark and DuckDB (both implement the standard's
    * remainder-first sizing). The q = 0 (n < b) case stays in the first
    * branch — each row its own bucket — so the ELSE's `div q` never sees
    * zero (CASE evaluates lazily).
    */
  def ntileOf(b: Int): Column =
    expr(
      s"CASE WHEN $RnCol <= ($NCol % $b) * (($NCol div $b) + 1) " +
        s"THEN ($RnCol + ($NCol div $b)) div (($NCol div $b) + 1) " +
        s"ELSE ($NCol % $b) + " +
        s"($RnCol - ($NCol % $b) * (($NCol div $b) + 1) + ($NCol div $b) - 1) div ($NCol div $b) END"
    )

  /** One-call global ntile: rank `df` by `order` (a strict total order) and
    * emit bucket 1..b in `out`, dropping the rank plumbing.
    */
  def withNtile(df: DataFrame, b: Int, order: Seq[Column], out: String): DataFrame =
    rankedFrame(df, Nil, order, None)
      .withColumn(out, ntileOf(b))
      .drop(RnCol, NCol)
}
