package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** Turns the scale-doctrine CLAIMS ("text never shuffles", "hashed and
  * dropped map-side") into MEASURED assertions: a SparkListener sums actual
  * shuffle-write bytes for a query and compares it against the naive
  * formulation that ships the payload through the exchange. Comparative
  * (ours < naive) rather than absolute thresholds, so the laws are immune
  * to shuffle compression ratios and serialization overhead drift.
  */
class ShuffleBudgetSpec extends SparkSpec {

  /** Total shuffle-write bytes across all stages of `action`. Listener
    * delivery is async, so poll until the sum stabilizes.
    */
  private def shuffleBytes(action: => Unit): Long = {
    val acc = new AtomicLong(0)
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        acc.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      action
      var prev = -1L
      var tries = 0
      while (acc.get != prev && tries < 50) { prev = acc.get; Thread.sleep(100); tries += 1 }
    } finally spark.sparkContext.removeSparkListener(listener)
    acc.get
  }

  test("dedup_exact_norm shuffles hashes, not text: measured bytes beat the text-key groupBy") {
    val docs = Tables.documents(spark, sfDir)
    val ours = shuffleBytes {
      SparkEntry.queries("dedup_exact_norm")(spark, sfDir).collect()
    }
    // naive formulation: group directly on the normalized text — the whole
    // payload crosses the exchange
    val naive = shuffleBytes {
      docs
        .groupBy(ops.Text.normText(col("text")).as("k"))
        .agg(count(lit(1)).as("n_dups"), min("doc_id").as("keep_id"))
        .orderBy("k") // same trailing sort exchange as the declared query
        .collect()
    }
    assert(ours > 0 && naive > 0, s"listener captured nothing (ours=$ours naive=$naive)")
    assert(
      ours < naive,
      s"md5-key dedup shuffled $ours B but the text-key baseline only $naive B — " +
        "the text-stays-map-side claim no longer holds",
    )
  }

  test("dedup_incremental drops text before its shuffles: measured bytes beat a text-carrying variant") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val ours = shuffleBytes {
      SparkEntry.queries("dedup_incremental")(spark, sfDir).collect()
    }
    // naive variant: same batch/manifest logic but the text column rides
    // through the join and the first-wins window
    val naive = shuffleBytes {
      val seen = docs
        .filter(col("doc_id") < 250)
        .select(md5(ops.Text.normText(col("text"))).as("k"))
        .distinct()
        .withColumn("seen_dup", lit(true))
      val batch = docs
        .filter(col("doc_id") >= 250)
        .select(col("doc_id").as("batch_id"), col("text"))
        .unionByName(
          docs.filter(col("doc_id") < 50).select((col("doc_id") + 1000).as("batch_id"), col("text"))
        )
        .select(col("batch_id"), col("text"), md5(ops.Text.normText(col("text"))).as("k"))
      batch
        .join(seen, Seq("k"), "left")
        .withColumn("rn", row_number().over(Window.partitionBy("k").orderBy("batch_id")))
        .select(col("batch_id"), col("text"), col("rn"))
        .orderBy("batch_id") // same trailing sort exchange as the declared query
        .collect()
    }
    assert(ours > 0 && naive > 0, s"listener captured nothing (ours=$ours naive=$naive)")
    assert(
      ours < naive,
      s"incremental dedup shuffled $ours B vs text-carrying variant's $naive B — " +
        "the hash-and-drop claim no longer holds",
    )
  }
}
