package graft

import org.apache.spark.sql.functions._

/** Laws of the synthetic-data generator's r11 vocabulary-open mode: the
  * closed 31-word default saturates the shingle space and drives the
  * pair keys into their Σdf² worst case (the r10 growth study's measured
  * regime); the open mode draws words Zipf(s≈1) from an sf-scaled
  * vocabulary so per-shingle df grows sublinearly — the regime real crawl
  * corpora live in. These tests pin that the mode actually produces that
  * regime and that the dup-injection structure the dedup family depends
  * on survives it.
  */
class GenDataSpec extends SparkSpec {

  test("closed mode (default) stays on the 31-word vocabulary with OOV near-dup marker") {
    val words = GenData
      .documents(spark, 500)
      .select(explode(split(col("text"), " ")).as("w"))
      .distinct()
      .collect()
      .map(_.getString(0))
      .toSet
    assert(words.subsetOf(GenData.vocab.toSet + "zzgraftzz"), s"unexpected words: ${words -- GenData.vocab.toSet - "zzgraftzz"}")
  }

  test("open mode: Zipf-ranked vocabulary, head-heavy, vocabulary grows with V") {
    def stats(v: Long): (Long, Long, Long) = {
      val wf = GenData
        .documents(spark, 2000, vocabSize = v)
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "zzgraftzz")
        .groupBy("w")
        .agg(count(lit(1)).as("n"))
      val distinctWords = wf.count()
      val top = wf.orderBy(col("n").desc).limit(1).collect()(0)
      val topN = top.getLong(1)
      assert(top.getString(0).matches("w\\d+"), s"open-mode word shape: ${top.getString(0)}")
      val medianN = wf.select(expr("percentile_approx(n, 0.5)")).collect()(0).getLong(0)
      (distinctWords, topN, medianN)
    }
    val (d200, top200, med200) = stats(200)
    val (d2000, top2000, _) = stats(2000)
    // vocabulary opens with V: 10x ranks must yield materially more
    // distinct words on the same corpus (sublinear-df regime exists)
    assert(d2000 > d200 * 3, s"vocab failed to open: $d200 -> $d2000 distinct words")
    assert(d2000 <= 2000 && d200 <= 200, "ranks must stay within V")
    // Zipf head: the top word carries far more mass than the median word
    assert(top200 > med200 * 10, s"head not Zipf-heavy: top=$top200 median=$med200")
    assert(top2000 < top200, "a larger vocabulary must dilute the head")
  }

  test("open mode keeps the dup-injection structure (exact copies of the predecessor)") {
    val d = GenData.documents(spark, 5000, vocabSize = 1000).select("doc_id", "text")
    val withPrev = d
      .withColumn("prev_id", col("doc_id") - 1)
      .join(
        d.select(col("doc_id").as("prev_id"), col("text").as("prev_text")),
        "prev_id",
      )
    val exact = withPrev.filter(col("text") === col("prev_text")).count()
    val near = withPrev
      .filter(col("text") === concat(col("prev_text"), lit(" zzgraftzz")))
      .count()
    // injection rates: ~0.2% exact, ~3% near (diluted ~3.2% by the
    // predecessor-clean suppression) — require presence, not exact rates
    assert(exact >= 3, s"exact dups missing from open mode: $exact")
    assert(near >= 50, s"near dups missing from open mode: $near")
  }
}
