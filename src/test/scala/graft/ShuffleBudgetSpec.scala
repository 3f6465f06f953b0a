package graft

import org.apache.spark.sql.functions._

/** Turns the scale-doctrine CLAIMS ("text never shuffles", "hashed and
  * dropped map-side") into MEASURED assertions: a SparkListener sums actual
  * shuffle-write bytes for a query and compares it against the naive
  * formulation that ships the payload through the exchange. Comparative
  * (ours < naive) rather than absolute thresholds, so the laws are immune
  * to shuffle compression ratios and serialization overhead drift.
  */
class ShuffleBudgetSpec extends SparkSpec {
  // shuffleBytes (the measured backbone) lives in SparkSpec — shared with
  // RuntimeFilterSpec.

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

  test("dedup_lines shuffles line hashes, not line text") {
    import org.apache.spark.sql.expressions.Window
    val ours = shuffleBytes {
      SparkEntry.queries("dedup_lines")(spark, sfDir).collect()
    }
    // naive variant: the reconstructed LINE STRING rides the first-wins
    // window and the per-doc regroup instead of its 32 B md5
    val naive = shuffleBytes {
      val lines = Tables
        .documents(spark, sfDir)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("idx", "tok")))
        .groupBy(col("doc_id"), floor(col("idx") / ops.CorpusPrep.LineTokens).as("line_no"))
        .agg(
          array_join(
            transform(
              array_sort(collect_list(struct(col("idx"), col("tok")))),
              x => x.getField("tok"),
            ),
            " ",
          ).as("line")
        )
      val firstWins = Window.partitionBy("line").orderBy("doc_id", "line_no")
      lines
        .withColumn("kept", row_number().over(firstWins) === 1)
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_lines"),
          sum(when(col("kept"), lit(1L)).otherwise(lit(0L))).as("n_kept"),
          md5(
            concat_ws(
              ",",
              transform(
                array_sort(collect_list(when(col("kept"), struct(col("line_no"), col("line"))))),
                x => md5(x.getField("line")),
              ),
            )
          ).as("kept_sig"),
        )
        .orderBy("doc_id")
        .collect()
    }
    assert(ours > 0 && naive > 0, s"listener captured nothing (ours=$ours naive=$naive)")
    assert(
      ours < naive,
      s"line dedup shuffled $ours B vs the text-carrying variant's $naive B — " +
        "line text is crossing an exchange",
    )
  }

  test("sim_topk_cosine: column pruning drops embeddings below the rank exchange (measured)") {
    import org.apache.spark.sql.expressions.Window
    functions.GraftFunctions.register(spark)
    val ours = shuffleBytes {
      SparkEntry.queries("sim_topk_cosine")(spark, sfDir).collect()
    }
    // naive variant: reference cvec AFTER the window so the 128-float
    // vectors are forced through the probe_id exchange that ranks neighbors
    val naive = shuffleBytes {
      val e = Tables.embeddings(spark, sfDir)
      val probes = e
        .filter(col("vec_id") < 100)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pvec"))
      val corpus = e.select(col("vec_id").as("cand_id"), col("embedding").as("cvec"))
      val w = Window.partitionBy(col("probe_id")).orderBy(col("sim").desc, col("cand_id"))
      corpus
        .crossJoin(broadcast(probes))
        .filter(col("probe_id") =!= col("cand_id"))
        .withColumn("sim", round(ops.Vectors.nativeDot(col("pvec"), col("cvec")), 4))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 10)
        // post-window reference ⇒ ColumnPruning cannot drop cvec pre-exchange
        .withColumn("cv0", element_at(col("cvec"), 1))
        .select("probe_id", "cand_id", "sim", "rn", "cv0")
        .orderBy("probe_id", "rn")
        .collect()
    }
    assert(ours > 0 && naive > 0, s"listener captured nothing (ours=$ours naive=$naive)")
    assert(
      ours < naive,
      s"sim_topk shuffled $ours B vs the vector-carrying variant's $naive B — " +
        "embeddings are crossing the rank exchange",
    )
  }
}
