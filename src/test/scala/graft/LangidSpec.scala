package graft

import org.apache.spark.sql.functions._

import graft.ops.TextQuality

/** The declared `text_langid` query runs on the driver's documents table,
  * whose lang labels all share one vocabulary — it proves the MECHANISM
  * cross-engine but says nothing about discrimination. This spec is the
  * efficacy check: a synthetic corpus where each language actually uses its
  * own function words (plus cross-language noise) must classify > 0.9.
  */
class LangidSpec extends SparkSpec {

  test("langid accuracy > 0.9 on a corpus with real per-language signal") {
    import spark.implicits._
    val profiles = TextQuality.Profiles.toMap
    val langs = profiles.keys.toSeq.sorted
    // shared content vocabulary, disjoint from every profile
    val content = Seq("alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel")
    val rnd = new scala.util.Random(7) // fixed seed — deterministic fixture
    val docs = langs.flatMap { l =>
      val own = profiles(l)
      val other = (profiles - l).values.flatten.toSeq
      (0 until 40).map { i =>
        val tokens = Seq.fill(30) {
          val r = rnd.nextDouble()
          if (r < 0.30) own(rnd.nextInt(own.length)) // ~30% own function words
          else if (r < 0.35) other(rnd.nextInt(other.length)) // ~5% cross-language noise
          else content(rnd.nextInt(content.length))
        }
        (s"$l-$i", l, tokens.mkString(" "))
      }
    }
    val out = TextQuality.langid(docs.toDF("doc_id", "lang", "text"))
    val acc = out.agg(avg(col("label_match").cast("double"))).collect()(0).getDouble(0)
    assert(acc > 0.9, s"langid accuracy $acc on discriminative fixture (200 docs, 5 langs)")
    // and every language must be predicted somewhere (no collapsed argmax)
    val predicted = out.select("pred_lang").distinct().as[String].collect().toSet
    assert(predicted == langs.toSet, s"collapsed predictions: $predicted")
  }
}
