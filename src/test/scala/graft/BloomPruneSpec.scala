package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The bloom-filter map-side prune for the shared-shingle pair joins —
  * the 100 TB extension path promised in `Text.pairableShingles`'s
  * scaladoc. The window prune computes df on the join key AFTER the
  * stream crosses the hash(sh) exchange, so it cuts pair-explosion
  * compute but not shuffle BYTES; on natural text, where hapax (df=1)
  * shingles dominate the stream, the byte cut needs the prune to happen
  * BEFORE the exchange. Two designs are exercised here:
  *
  *  - `pairableShinglesBloomExact`: exact df>=2 keys → bloom → map-side
  *    probe. Correct, but the exact df aggregation shuffles every
  *    distinct key — the "exact bloom ≈ window" byte measurement below
  *    documents why exactness doesn't pay.
  *  - `pairableShinglesBloom` (shipped scale path): TwoBloomDf's
  *    constant-shuffle (seen, dup) sketch pass — only fixed-size blooms
  *    cross tasks — probed as a constant. The "sketch < window" byte
  *    measurement is the 100 TB claim, made on a fixture whose df
  *    distribution matches natural text.
  *
  * Both variants can only err toward admitting pairless keys, so the
  * PAIR output is exactly the window prune's — asserted first.
  *
  * The fixture is hapax-heavy on purpose (each doc = a shared 8-token
  * core + a long unique tail): the corpus fixture's hapax tail is 0.08%,
  * the opposite of the natural-text regime this path exists for.
  */
class BloomPruneSpec extends SparkSpec {

  import spark.implicits._

  /** ~200 docs: every doc shares an 8-token core with its group of 4 (so
    * cross-doc pairs exist), then carries a 60-token tail unique to the
    * doc — those tail shingles are df=1 noise a byte-frugal plan must not
    * ship to the pair join.
    */
  private lazy val hapaxDocs: DataFrame = {
    val rows = (0 until 200).map { i =>
      val core = (0 until 8).map(j => s"core${i / 4}tok$j").mkString(" ")
      val tail = (0 until 60).map(j => s"doc${i}u$j").mkString(" ")
      (i.toLong, s"$core $tail")
    }
    rows.toDF("doc_id", "text")
  }

  private def stream(): DataFrame = {
    val arr = ops.Text.shingleHashArrays(hapaxDocs)
    arr.select(
      col("doc_id"),
      size(col("shs")).cast("long").as("n_sh"),
      explode(col("shs")).as("sh"),
    )
  }

  private def pairs(pruned: DataFrame): DataFrame =
    pruned
      .select(col("doc_id").as("id_a"), col("n_sh").as("na"), col("sh"))
      .join(pruned.select(col("doc_id").as("id_b"), col("n_sh").as("nb"), col("sh")), "sh")
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_inter"), min("na").as("n_a"), min("nb").as("n_b"))

  test("both bloom prunes return exactly the window prune's pairs (no false negatives)") {
    val viaWindow = pairs(ops.Text.pairableShingles(stream())).collect().toSet
    val viaExact = pairs(ops.Text.pairableShinglesBloomExact(stream())).collect().toSet
    val viaSketch = pairs(ops.Text.pairableShinglesBloom(stream())).collect().toSet
    assert(viaExact == viaWindow)
    assert(viaSketch == viaWindow)
    assert(viaWindow.nonEmpty, "fixture must actually produce pairs")
  }

  test("two-bloom sketch catches every cross-partition duplicate and drops the hapax tail") {
    // spread each duplicate pair across partitions so `merge`'s AND (not
    // `reduce`'s local promotion) is the mechanism under test
    val dup = (0 until 512).flatMap(i => Seq(i.toLong, i.toLong + (1L << 40)))
    val uniq = (0 until 4096).map(i => 1000000L + i)
    val keys = (dup.indices.map(i => dup(i)) ++ uniq).toDF("k")
      .repartition(8, col("k")) // same key lands in one partition...
    val spread = dup.toDF("k").repartition(7) // ...and these are scattered
    // duplicates = every key of `dup` (each appears twice via union)
    val all = keys.union(spread).select(col("k").as("sh"))
    val bytes = ops.Text.df2BloomSketch(all, 1L << 20)
    val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    val missed = dup.distinct.count(k => !bf.mightContainLong(k))
    assert(missed == 0, s"$missed true duplicates missing from the dup sketch")
    // ...while the vast majority of the unique tail is absent (FP rate
    // bounded — with 1M bits and ~1k inserted keys it should be ~0)
    val admitted = uniq.count(bf.mightContainLong)
    assert(admitted < uniq.size / 10, s"$admitted of ${uniq.size} unique keys admitted")
  }

  test("sketch prune cuts pair-join shuffle bytes on a hapax corpus; exact-keys prune cannot") {
    // the prune itself must remove (almost) all df=1 rows before the join:
    // 200 docs × 58 tail shingles are prunable; the shared cores are not
    val full = stream().count()
    val kept = ops.Text.pairableShinglesBloom(stream()).count()
    assert(kept < full / 4, s"bloom kept $kept of $full — hapax tail not pruned")
    // Forcing shuffle joins models the 100 TB regime where nothing
    // broadcasts. The windowed plan ships the FULL stream through its
    // hash(sh) exchange; the sketch prune ships only the df>=2 minority
    // (its own pass moves fixed-size blooms, not rows). The exact-keys
    // variant is measured too, to document WHY it isn't the scale path:
    // its df aggregation shuffles every distinct key, which at this row
    // width costs about what the stream exchange costs.
    val prev = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val windowBytes = shuffleBytes(pairs(ops.Text.pairableShingles(stream())).collect())
      val sketchBytes = shuffleBytes(pairs(ops.Text.pairableShinglesBloom(stream())).collect())
      val exactBytes = shuffleBytes(pairs(ops.Text.pairableShinglesBloomExact(stream())).collect())
      info(s"pair-join shuffle bytes — window: $windowBytes, sketch: $sketchBytes, exact: $exactBytes")
      assert(windowBytes > 0 && sketchBytes > 0, s"listener captured nothing ($windowBytes / $sketchBytes)")
      assert(
        sketchBytes * 2 < windowBytes,
        s"sketch prune should cut pair-join shuffle >=2x on a hapax-heavy corpus: " +
          s"$sketchBytes B vs window's $windowBytes B",
      )
      assert(
        exactBytes * 2 > windowBytes,
        s"if the exact-keys prune ever becomes byte-cheap ($exactBytes B vs window " +
          s"$windowBytes B), the scaladoc's rationale for the sketch path needs revisiting",
      )
    } finally prev.fold(spark.conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", _))
  }

  test("pair results are run-to-run deterministic under the sketch prune") {
    // the sketch's FP SET varies with merge-tree shape, but pairs cannot:
    // FP admissions are pairless by construction
    val a = pairs(ops.Text.pairableShinglesBloom(stream())).collect().toSet
    val b = pairs(ops.Text.pairableShinglesBloom(stream())).collect().toSet
    assert(a == b)
  }
}
