package graft.ops

import org.apache.spark.sql.DataFrame

/** Central switch for the lineage-truncation checkpoints used by the
  * iterative / multi-consumer plans (ScaleRank range splits, the
  * dedup_clusters / graph_kcore fixpoint loops, IVF centroid training).
  *
  * `localCheckpoint` stores blocks on executor local storage — fast, no
  * configuration, but it dies with the executor, so on a real cluster a
  * lost node un-recoverably kills every query whose lineage was truncated
  * through it. The cluster-safe variant is `checkpoint` into a reliable
  * (HDFS/object-store) directory: blocks survive executor loss and tasks
  * recompute from the checkpoint files.
  *
  * This object makes the choice a runtime config instead of a code edit:
  * set `spark.graft.reliableCheckpoints=true` AND a
  * `SparkContext.setCheckpointDir` location, and every stable() site in the
  * library switches to reliable checkpoints with identical query results
  * (CheckpointSpec pins one ScaleRank key and one fixpoint key under both
  * modes against the same rows). Local benches and the sf0.01 oracle gate
  * keep the zero-config localCheckpoint default.
  *
  * Cleanup doctrine: non-eager checkpointed RDDs are released by Spark's
  * ContextCleaner once the DataFrame object becomes unreachable (the RDD
  * holds no external references after the query's terminal action), so
  * repeated builds across a bench sweep do not accumulate blocks
  * indefinitely — LEAKCHECK tracks this reliance explicitly.
  */
object Checkpoints {

  /** Runtime conf key: "true" + a set checkpoint dir → reliable checkpoints. */
  val ConfKey = "spark.graft.reliableCheckpoints"

  /** Truncate `df`'s lineage with the configured checkpoint flavor. */
  def stable(df: DataFrame, eager: Boolean = true): DataFrame = {
    val s = df.sparkSession
    // tolerant parse: anything other than exactly "true" (case-insensitive)
    // falls back to localCheckpoint instead of throwing at query time
    val reliable = s.conf.getOption(ConfKey).exists(_.equalsIgnoreCase("true")) &&
      s.sparkContext.getCheckpointDir.isDefined
    if (reliable) df.checkpoint(eager) else df.localCheckpoint(eager)
  }
}
