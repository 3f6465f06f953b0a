package graft

import org.apache.spark.sql.functions._

/** Property laws for the §2.12 curation verbs in ops/Curation.scala — the
  * oracle gate proves cross-engine value equality; these prove the
  * SEMANTIC contracts (coverage, contiguity, quantile counts) that a
  * matching-but-wrong pair of implementations could still violate.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, sfDir)

  test("decontaminate returns only train-side docs, each sharing >= 1 gram") {
    val out = SparkEntry.queries("decontaminate")(spark, sfDir)
    val rows = out.collect()
    assert(rows.forall(_.getLong(1) >= 1))
    val evalIds = docs
      .select(col("doc_id"), ops.Pipeline.hashBucket.as("b"))
      .filter(col("b") >= 98)
      .select("doc_id")
      .as[Long]
      .collect()
      .toSet
    assert(rows.map(_.getLong(0)).toSet.intersect(evalIds).isEmpty,
      "eval docs must never appear in the contaminated set")
  }

  test("chunk_text: chunk count and token-coverage laws per doc") {
    val chunks = SparkEntry.queries("chunk_text")(spark, sfDir)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"), sum("n_chunk_tokens").as("tok_sum"))
    val n = size(split(ops.Text.normText(col("text")), " ")).cast("long")
    val joined = docs
      .select(col("doc_id"), n.as("n"))
      .join(chunks, "doc_id")
      .select("doc_id", "n", "n_chunks", "tok_sum")
      .as[(Long, Long, Long, Long)]
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { case (id, nTok, nChunks, tokSum) =>
      val expectChunks = if (nTok > 32) 1 + (nTok - 9) / 24 else 1L
      assert(nChunks == expectChunks, s"doc $id: $nChunks chunks for $nTok tokens")
      // every non-last chunk is full, consecutive chunks overlap exactly 8
      // tokens => total chunk tokens = n + 8 * (n_chunks - 1)
      assert(tokSum == nTok + 8 * (nChunks - 1), s"doc $id: coverage law broken")
    }
  }

  test("pack_sequences: offsets are contiguous per shard and bins match div") {
    val out = SparkEntry.queries("pack_sequences")(spark, sfDir)
      .select("doc_id", "lang", "shard", "n_tokens", "start_offset", "seq_id")
      .as[(Long, String, Long, Long, Long, Long)]
      .collect()
    assert(out.forall { case (_, _, _, _, off, seq) => seq == off / 256 })
    out.groupBy(r => (r._2, r._3)).foreach { case ((lang, shard), rs) =>
      val sorted = rs.sortBy(_._1)
      assert(sorted.head._5 == 0L, s"($lang,$shard) stream must start at offset 0")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._5 == a._5 + a._4, s"($lang,$shard): gap between doc ${a._1} and ${b._1}")
        case _ => ()
      }
    }
  }

  test("filter_quality_quantile keeps exactly ceil(n/2) per lang, floor holds") {
    val kept = SparkEntry.queries("filter_quality_quantile")(spark, sfDir)
    val keptPerLang = kept.groupBy("lang").count().as[(String, Long)].collect().toMap
    val totalPerLang = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    totalPerLang.foreach { case (lang, n) =>
      // percent_rank of a single-row partition is 0 (< 0.5) on both engines
      val expected = if (n == 1) 0L else (n + 1) / 2
      assert(keptPerLang.getOrElse(lang, 0L) == expected,
        s"$lang: expected $expected of $n kept")
    }
    // boundary: the worst kept doc is no better-scored than the best dropped
    val scored = docs.select(col("doc_id"), col("lang"), ops.TextQuality.qualityCol.as("q"))
    val dropped = scored.join(kept.select("doc_id"), Seq("doc_id"), "left_anti")
    val maxDropped = dropped.groupBy("lang").agg(max("q").as("mq")).as[(String, Double)].collect().toMap
    val minKept = kept.groupBy("lang").agg(min("quality").as("mq")).as[(String, Double)].collect().toMap
    maxDropped.foreach { case (lang, dq) =>
      assert(minKept(lang) >= dq, s"$lang: kept floor ${minKept(lang)} below dropped max $dq")
    }
  }
}
