package graft

import graft.ops.{CorpusPrep, IvfAnn, SemDedup, Text, Vectors}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Batch ↔ streaming parity for the INCREMENTAL-DEDUP manifest flow (r11
  * verdict #7): the dedup_incremental* keys model continuous ingest but the
  * declared keys replay the whole synthetic batch at once. Here the same
  * shard rows arrive as a MemoryStream in multiple micro-batches (ascending
  * batch_id — the arrival order the batch keys' min-id first-wins encodes),
  * each micro-batch is deduped through a foreachBatch loop against the
  * running manifest state, and the accumulated statuses must equal the
  * declared batch key's manifest EXACTLY.
  *
  * State carried across micro-batches is precisely the deployment object
  * each key's scaladoc names: the content-hash manifest (exact), the
  * shingle-set manifest standing in for the signature+bucket store
  * (minhash), and the FIXED seen-corpus IVF index (semantic). The semantic
  * key's within-batch half deliberately stays batch-scoped — it trains
  * dynamic-K cells on the whole shard by design — so its streamed law
  * covers the cross-manifest (dup_of_seen) half, the part whose state
  * persists between shards.
  */
object IncrementalDedupStreamSpec {
  /** Top-level (not spec-inner) so the Dataset encoder codegens — an inner
    * case class needs the outer pointer and falls back to interpreter mode.
    */
  final case class DocShard(batch_id: Long, text: String)
  final case class FpShard(batch_id: Long, fp: Long)
}

class IncrementalDedupStreamSpec extends SparkSpec {
  import IncrementalDedupStreamSpec.DocShard
  import spark.implicits._

  /** The keys' synthetic shard: new docs ∪ replays of seen ∪ within-batch
    * replays (the CorpusPrep leg definitions verbatim).
    */
  private def shardRows: Seq[(Long, String)] = {
    val docs = Tables
      .documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
    docs.filter(_._1 >= 250).map { case (id, t) => (id, t) } ++
      docs.filter(_._1 < 50).map { case (id, t) => (id + CorpusPrep.ReplaySeenOffset, t) } ++
      docs.filter(p => p._1 >= 250 && p._1 < 260).map { case (id, t) =>
        (id + CorpusPrep.ReplayBatchOffset, t)
      }
  }.toSeq.sortBy(_._1)

  /** Drive rows through a foreachBatch query in `nShards` ascending-id
    * micro-batches; `handle` consumes each micro-batch DataFrame.
    */
  private def streamShards(rows: Seq[(Long, String)], nShards: Int)(
      handle: DataFrame => Unit): Unit = {
    val input = MemoryStream[DocShard](spark)
    val q = input
      .toDF()
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", tmpDir("inc-dedup-ckpt"))
      .foreachBatch((df: DataFrame, _: Long) => handle(df))
      .start()
    rows.grouped(math.max(1, rows.size / nShards + 1)).foreach { shard =>
      input.addData(shard.map { case (id, t) => DocShard(id, t) })
      q.processAllAvailable()
    }
    q.stop()
  }

  private def declaredStatuses(key: String): Map[Long, String] =
    SparkEntry
      .queries(key)(spark, sfDir)
      .select(col("batch_id"), col("status"))
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap

  /** The keys with a streamed-shard parity test in THIS suite. */
  private val StreamedParityCovered = Set(
    "dedup_incremental",
    "dedup_incremental_minhash",
    "dedup_media_incremental",
    "dedup_incremental_semantic",
  )

  test("mechanical enumeration: every incremental-manifest key has a streamed-shard parity law") {
    // r12 verdict #8: the ingest-order parity law enumerates its event keys
    // from the catalog; do the same here so a future incremental family
    // cannot ship without a streamed-shard law. The manifest contract is
    // structural — an incremental key emits (batch_id, status) — so the
    // enumeration is schema-driven, not name-driven: any declared key whose
    // output carries both columns is an incremental-manifest key and MUST
    // appear in [[StreamedParityCovered]] (adding one without a parity test
    // fails here; removing one without pruning the set also fails).
    val manifestKeys = SparkEntry.queries.keys.toSeq.sorted.filter { name =>
      val fields = SparkEntry.queries(name)(spark, sfDir).schema.fieldNames.toSet
      Set("batch_id", "status").subsetOf(fields)
    }.toSet
    assert(
      manifestKeys == StreamedParityCovered,
      s"incremental-manifest keys without a streamed parity law: ${manifestKeys -- StreamedParityCovered}; " +
        s"stale coverage entries: ${StreamedParityCovered -- manifestKeys}",
    )
  }

  test("dedup_incremental: streamed shards against the hash manifest equal the batch manifest") {
    // state = the content-hash manifest, exactly what the key's scaladoc
    // says a deployment persists: origin 'seen' rows never overwritten
    // (seen wins over in-batch at any arrival time)
    val state = scala.collection.mutable.Map.empty[String, String]
    Tables
      .documents(spark, sfDir)
      .filter(col("doc_id") < 250)
      .select(md5(Text.normText(col("text"))).as("k"))
      .distinct()
      .collect()
      .foreach(r => state(r.getString(0)) = "seen")
    val results = scala.collection.mutable.Map.empty[Long, String]
    streamShards(shardRows, nShards = 4) { micro =>
      val rows = micro
        .select(col("batch_id"), md5(Text.normText(col("text"))).as("k"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1)))
        .sortBy(_._1)
      rows.foreach { case (bid, k) =>
        state.get(k) match {
          case Some("seen") => results(bid) = "dup_of_seen"
          case Some(_)      => results(bid) = "dup_in_batch"
          case None         => results(bid) = "unique"; state(k) = "batch"
        }
      }
    }
    val batch = declaredStatuses("dedup_incremental")
    val diff = (batch.keySet ++ results.keySet)
      .filter(k => batch.get(k) != results.get(k))
      .toSeq
      .sorted
      .map(k => s"$k: batch=${batch.get(k)} stream=${results.get(k)}")
    assert(diff.isEmpty, s"streamed manifest diverged (${diff.size}): ${diff.take(8).mkString("; ")}")
    assert(batch.values.exists(_ == "dup_of_seen") && batch.values.exists(_ == "dup_in_batch"))
  }

  test("dedup_incremental_minhash: streamed shards against the shingle manifest equal the batch manifest") {
    // reference similarity = full-pair Jaccard over distinct word-3-gram
    // shingles — the semantics the key's DuckDB oracle pins (its banded
    // candidates are lossless on this fixture, or the hash gate would
    // already have failed)
    def shingles(text: String): Set[String] = {
      val w = text.replaceAll("\\s+", " ").trim.toLowerCase.split(" ")
      if (w.length < 3) Set.empty
      else w.sliding(3).map(_.mkString(" ")).toSet
    }
    def near(a: Set[String], b: Set[String]): Boolean = {
      if (a.isEmpty || b.isEmpty) return false
      val inter = a.intersect(b).size
      val j = inter.toDouble / (a.size + b.size - inter)
      BigDecimal(j).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble >= 0.8
    }
    val seen = Tables
      .documents(spark, sfDir)
      .filter(col("doc_id") < 250)
      .select(col("text"))
      .collect()
      .map(r => shingles(r.getString(0)))
    val processed = scala.collection.mutable.ArrayBuffer.empty[Set[String]]
    val results = scala.collection.mutable.Map.empty[Long, String]
    streamShards(shardRows, nShards = 4) { micro =>
      val rows = micro
        .select(col("batch_id"), col("text"))
        .collect()
        .map(r => (r.getLong(0), shingles(r.getString(1))))
        .sortBy(_._1)
      rows.foreach { case (bid, sh) =>
        val st =
          if (seen.exists(near(sh, _))) "dup_of_seen"
          else if (processed.exists(near(sh, _))) "dup_in_batch"
          else "unique"
        results(bid) = st
        processed += sh // every batch member joins the manifest (pair-grain
        // first-wins: LATER matches of it are dup_in_batch)
      }
    }
    val batch = declaredStatuses("dedup_incremental_minhash")
    assert(results.toMap == batch, "streamed minhash manifest diverged from the batch key")
  }

  test("dedup_media_incremental: streamed shards against the fingerprint manifest equal the batch manifest") {
    import IncrementalDedupStreamSpec.FpShard
    import graft.ops.MediaPhash
    // state = the 8-byte-per-item fingerprint manifest; banding is
    // complete at the radius, so the streamed replay must match EXACTLY
    def near(a: Long, b: Long): Boolean =
      java.lang.Long.bitCount(a ^ b) <= MediaPhash.MaxHamming
    val fps = MediaPhash
      .phash60(MediaPhash.synthNearDup(spark).toDF())
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val seen = scala.collection.mutable.ArrayBuffer(
      fps.filter(p => p._1 < 160 && p._1 % MediaPhash.NGroups < MediaPhash.SeenGroups)
        .values.toSeq: _*)
    val batchRows: Seq[(Long, Long)] = (
      fps.filter(_._1 >= 160).toSeq ++
        fps.filter(_._1 < 20).map { case (id, f) => (id + 10000000L, f) } ++
        fps.filter(p => p._1 >= 160 && p._1 < 170).map { case (id, f) => (id + 20000000L, f) }
    ).sortBy(_._1)
    val processed = scala.collection.mutable.ArrayBuffer.empty[Long]
    val results = scala.collection.mutable.Map.empty[Long, String]
    val input = MemoryStream[FpShard](spark)
    val q = input
      .toDF()
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", tmpDir("media-inc-ckpt"))
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).foreach { case (bid, f) =>
          results(bid) =
            if (seen.exists(near(f, _))) "dup_of_seen"
            else if (processed.exists(near(f, _))) "dup_in_batch"
            else "unique"
          processed += f
        }
      }
      .start()
    batchRows.grouped(batchRows.size / 3 + 1).foreach { shard =>
      input.addData(shard.map { case (id, f) => FpShard(id, f) })
      q.processAllAvailable()
    }
    q.stop()
    val batch = declaredStatuses("dedup_media_incremental")
    assert(results.toMap == batch, "streamed media manifest diverged from the batch key")
  }

  test("dedup_incremental_semantic: streamed shards against the FIXED seen index reproduce the dup_of_seen calls") {
    // the cross-manifest half is per-row against the persisted seen-corpus
    // IVF index, so ANY sharding must reproduce it; statuses' precedence
    // puts dup_of_seen first, so the sets compare directly
    val e = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val seen = e.filter(col("vec_id") < 250)
    val centA = IvfAnn.gridCentroidArraysOf(seen)
    val seenLists = IvfAnn
      .routeToCells(seen, centA, probes = 1)
      .select(col("vec_id").as("seen_id"), col("cid"))
    val sv = seen.select(col("vec_id").as("seen_id"), col("embedding").as("svec"))
    val shard = e
      .filter(col("vec_id") >= 250)
      .select(CorpusPrep.guardedDocId(col("vec_id")).as("batch_id"), col("embedding"))
      .unionByName(
        e.filter(col("vec_id") < 50)
          .select((col("vec_id") + CorpusPrep.ReplaySeenOffset).as("batch_id"), col("embedding")))
      .unionByName(
        e.filter(col("vec_id") >= 250 && col("vec_id") < 260)
          .select((col("vec_id") + CorpusPrep.ReplayBatchOffset).as("batch_id"), col("embedding")))
      .orderBy("batch_id")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val streamedDups = scala.collection.mutable.Set.empty[Long]
    // 3 micro-batches, each routed through the SAME fixed index
    shard.grouped(shard.length / 3 + 1).foreach { micro =>
      val mdf = micro.toSeq.toDF("batch_id", "embedding")
      val routed = IvfAnn
        .routeToCells(
          mdf.select(col("batch_id").as("vec_id"), col("embedding")),
          centA,
          SemDedup.IvfProbes)
        .select(col("vec_id").as("batch_id"), col("cid"))
      routed
        .join(seenLists, "cid")
        .select("batch_id", "seen_id")
        .distinct()
        .join(mdf.select(col("batch_id"), col("embedding").as("bvec")), "batch_id")
        .join(sv, "seen_id")
        .filter(Vectors.nativeDot(col("bvec"), col("svec")) >= SemDedup.SemThreshold)
        .select("batch_id")
        .distinct()
        .collect()
        .foreach(r => streamedDups += r.getLong(0))
    }
    val batch = declaredStatuses("dedup_incremental_semantic")
    val batchDups = batch.collect { case (id, "dup_of_seen") => id }.toSet
    assert(streamedDups.toSet == batchDups, "streamed dup_of_seen set diverged from the batch key")
    assert(batchDups.nonEmpty)
  }
}
