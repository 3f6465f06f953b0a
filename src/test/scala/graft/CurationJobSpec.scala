package graft

import org.apache.spark.sql.functions._

/** End-to-end LLM-curation job (the §2.12 story composed as one pipeline,
  * like GlueJobSpec is for the ETL verbs): documents → near-dup cluster
  * representatives → quality + language filter → deterministic train/test
  * split → partitioned lake write → re-read and audit. Asserts the composed
  * flow, not just each stage: every intermediate invariant a production
  * job would alarm on.
  */
class CurationJobSpec extends SparkSpec {

  test("curation job: cluster-dedup, filter, split, partitioned write, audit") {
    val docs = Tables.documents(spark, sfDir)
    val total = docs.count()

    // 1. near-dup clusters -> keep only cluster representatives
    val clusters = SparkEntry.queries("dedup_clusters")(spark, sfDir)
    val reps = clusters.filter(col("doc_id") === col("cluster_id")).select("doc_id")
    val nReps = reps.count()
    assert(nReps <= total && nReps > 0)

    // 2. quality floor + language agreement on the survivors
    val scored = SparkEntry
      .queries("curation_pipeline")(spark, sfDir)
      .join(reps, "doc_id")
    // NOTE: not a strict superset — for sub-shingle-length exact dupes the
    // cluster rep can be a doc that curation's md5 dedup dropped (both pick
    // canonical survivors but by different keys); the audit below checks the
    // JOINED set's invariants, not stage-wise retention.
    // 3. deterministic split
    val split = SparkEntry
      .queries("sample_hash_split")(spark, sfDir)
      .select("doc_id", "split")
    val curated = scored.join(split, "doc_id")

    // 4. partitioned write by split, re-read, audit
    val path = tmpDir("curation-job")
    curated.write.mode("overwrite").partitionBy("split").parquet(path)
    val back = spark.read.parquet(path)
    assert(back.count() == curated.count())
    assert(back.select("doc_id").distinct().count() == back.count(), "no doc twice")
    // split columns survive the round trip and cover only train/test
    val splits = back.select("split").distinct().collect().map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "test")))
    // partition pruning: a split-filtered read touches one partition dir
    val train = spark.read.parquet(path).filter(col("split") === "train")
    assert(train.count() == curated.filter(col("split") === "train").count())
    // the audit a production job logs: retention at each stage is sane
    assert(back.count() <= nReps, "curated set cannot exceed representatives")
    // quality floor held through the whole pipeline
    assert(back.filter(col("quality") < ops.TextQuality.CurationMinQuality).count() == 0)
  }
}
