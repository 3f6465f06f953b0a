package graft

import graft.ops.{Events, GlueParity, Text}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Algebraic laws on generated frames (SURVEY.md §5.4) — properties that
  * must hold for EVERY input, not just the fixture corpus. Driven by raw
  * scalacheck inside scalatest (scalatestplus bridge isn't a dependency);
  * generators are small (a Spark job per case) but adversarial: empty
  * strings, repeated rows, single-element groups.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(name: String, p: Prop, n: Int = 10): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n).withMaxSize(30), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val word = Gen.oneOf("data", "table", "scan", "row", "agg", "fast", "slow", "x", "")
  private val doc = Gen.listOfN(8, word).map(_.mkString(" "))

  test("exact dedup is idempotent: dedup(dedup(x)) == dedup(x)") {
    check(
      "dedup-idempotent",
      Prop.forAll(Gen.nonEmptyListOf(doc)) { texts =>
        val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
        val once = df.groupBy(Text.normText(col("text")).as("norm")).agg(min("doc_id").as("keep_id"))
        val twice = once.groupBy(col("norm")).agg(min("keep_id").as("keep_id"))
        once.count() == twice.count() && once.except(twice.select("norm", "keep_id")).count() == 0
      },
    )
  }

  test("union-all count additivity; union-distinct equals set union") {
    check(
      "union-laws",
      Prop.forAll(Gen.listOf(Gen.chooseNum(0L, 20L)), Gen.listOf(Gen.chooseNum(0L, 20L))) { (a, b) =>
        val da = a.toDF("k")
        val db = b.toDF("k")
        da.unionAll(db).count() == a.size + b.size &&
        da.union(db).distinct().count() == (a ++ b).distinct.size
      },
    )
  }

  test("session windows partition the event set and never overlap per user") {
    val evGen = Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(1L, 3L), Gen.chooseNum(0L, 100L)))
    check(
      "session-partition",
      Prop.forAll(evGen) { evs =>
        val df = evs.zipWithIndex.map { case ((u, minute), i) =>
          (i.toLong, new java.sql.Timestamp(minute * 60000L), u, "e", 1.0)
        }.toDF("event_id", "etime", "user_id", "event_type", "value")
        val sessions = Events.session5m(df)
        val total = sessions.agg(sum("n_events")).collect()(0).getLong(0) == evs.size.toLong
        val rows = sessions.orderBy("user_id", "sess_start").collect()
        val noOverlap = rows.groupBy(_.getAs[Long]("user_id")).values.forall { ss =>
          ss.sliding(2).forall {
            case Array(x, y) =>
              !y.getAs[java.sql.Timestamp]("sess_start").before(x.getAs[java.sql.Timestamp]("sess_end"))
            case _ => true
          }
        }
        total && noOverlap
      },
      n = 8,
    )
  }

  test("profiler scale path: approx distincts within 5%, and the Expand disappears from the plan") {
    val docs = Tables.documents(spark, sfDir)
    val cols = Seq("doc_id", "lang", "source", "n_chars")
    val exact = ops.Pipeline.profile(docs, cols, approxDistinct = false)
    val approx = ops.Pipeline.profile(docs, cols, approxDistinct = true)
    // multi-column exact COUNT(DISTINCT) plans through Expand (input rows ×
    // #distinct columns before the exchange) — the approx swap removes it
    assert(exact.queryExecution.executedPlan.toString.contains("Expand"))
    assert(!approx.queryExecution.executedPlan.toString.contains("Expand"))
    val e = exact.collect().map(r => r.getString(0) -> r.getAs[Long]("n_distinct")).toMap
    approx.collect().foreach { r =>
      val (c, a) = (r.getString(0), r.getAs[Long]("n_distinct"))
      val x = e(c)
      assert(math.abs(a - x) <= math.max(2L, (0.05 * x).toLong), s"$c: approx $a vs exact $x")
    }
  }

  test("lag-based sessionization agrees with the session_window rollup per user") {
    val ev = Tables.events(spark, sfDir)
    val nLag = ops.Events
      .sessionizeLag(ev)
      .groupBy("user_id")
      .agg(max("session_idx").as("n_lag"))
    val nSw = ops.Events
      .session5m(ev)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sw"))
    val disagree = nLag
      .join(nSw, Seq("user_id"), "full")
      .filter(col("n_lag").isNull || col("n_sw").isNull || col("n_lag") =!= col("n_sw"))
      .count()
    assert(disagree == 0L, s"$disagree users with lag-session count != session_window count")
  }

  test("splitRows is a partition: disjoint and complete for any predicate") {
    check(
      "splitrows-partition",
      Prop.forAll(Gen.nonEmptyListOf(Gen.chooseNum(-50, 50)), Gen.chooseNum(-50, 50)) { (xs, cut) =>
        val df = xs.toDF("x")
        val (hit, miss) = GlueParity.splitRows(df, col("x") > cut)
        hit.count() + miss.count() == xs.size.toLong &&
        hit.collect().forall(_.getInt(0) > cut) &&
        miss.collect().forall(_.getInt(0) <= cut)
      },
    )
  }

  test("dsum equals BigDecimal ground truth for 2-decimal inputs") {
    val money = Gen.chooseNum(0, 1000000).map(_ / 100.0)
    check(
      "dsum-exact",
      Prop.forAll(Gen.nonEmptyListOf(money)) { xs =>
        val got = xs.toDF("x").agg(Qf.dsum(col("x"), 2)).collect()(0).getDouble(0)
        val truth = xs.map(BigDecimal(_).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
        got == truth
      },
    )
  }

  test("kernel identity: graft_l2sq(a,b) == dot(a,a) + dot(b,b) - 2*dot(a,b) on integer grids") {
    // ties the two codegen kernels (L2Dist2, DotProduct) to each other
    // through the polarization identity — a bug in either kernel's fold
    // (ordering, widening, null branch) breaks the exact equality
    graft.functions.GraftFunctions.register(spark)
    val grid = Gen.listOfN(8, Gen.chooseNum(-1000000L, 1000000L))
    check(
      "l2sq-polarization",
      Prop.forAll(grid, grid) { (a, b) =>
        val df = Seq((a, b)).toDF("a", "b")
        val row = df
          .select(
            call_function("graft_l2sq", col("a"), col("b")).as("l2"),
            // |a_i| <= 1e6 < 2^24 is exact in FLOAT; products <= 1e12 and
            // 8-dim sums <= 8e12 are exact in the kernel's double fold
            call_function("graft_dot", col("a").cast("array<float>"), col("a").cast("array<float>")).as("aa"),
            call_function("graft_dot", col("b").cast("array<float>"), col("b").cast("array<float>")).as("bb"),
            call_function("graft_dot", col("a").cast("array<float>"), col("b").cast("array<float>")).as("ab"),
          )
          .collect()(0)
        row.getLong(0).toDouble == row.getDouble(1) + row.getDouble(2) - 2 * row.getDouble(3)
      },
      n = 20,
    )
  }

  test("simhash fingerprint is token-order invariant (signed sums commute)") {
    check(
      "simhash-order-invariant",
      Prop.forAll(Gen.nonEmptyListOf(doc)) { texts =>
        val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
        val shuffled = texts.zipWithIndex.map { case (t, i) =>
          (i.toLong, t.split(" ", -1).reverse.mkString(" "))
        }.toDF("doc_id", "text")
        val a = graft.ops.SimHash.fingerprints(docs).orderBy("doc_id").collect().map(_.getLong(1))
        val b = graft.ops.SimHash.fingerprints(shuffled).orderBy("doc_id").collect().map(_.getLong(1))
        a.sameElements(b)
      },
      n = 8,
    )
  }

  test("minhash signatures are identical for identical shingle sets") {
    val texts = Seq("data table scan row agg fast", "slow fast table data x row scan")
    val base = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val copy = texts.zipWithIndex.map { case (t, i) => (i.toLong + 100, t) }.toDF("doc_id", "text")
    val sigA = graft.ops.MinHashDedup
      .signatures(graft.ops.MinHashDedup.shingleSet(base))
      .orderBy("doc_id").collect().map(_.getSeq[Long](1))
    val sigB = graft.ops.MinHashDedup
      .signatures(graft.ops.MinHashDedup.shingleSet(copy))
      .orderBy("doc_id").collect().map(_.getSeq[Long](1))
    assert(sigA.zip(sigB).forall { case (x, y) => x == y },
      "same text must produce the same MinHash signature regardless of doc_id")
  }

  test("ts_max_concurrency: exact match vs in-memory minute-grid recompute") {
    val sessions = Events
      .sessionizeLag(Tables.events(spark, sfDir))
      .groupBy("user_id", "session_idx")
      .agg(min("etime").as("t0"), max("etime").as("t1"))
      .collect()
      .map(r => (r.getAs[java.sql.Timestamp]("t0").getTime, r.getAs[java.sql.Timestamp]("t1").getTime))
    val perMinute = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    sessions.foreach { case (t0, t1) =>
      ((t0 / 60000L) to (t1 / 60000L)).foreach(m => perMinute(m) += 1)
    }
    // Day bucketing must follow the SESSION timezone (the query's date_trunc /
    // date_format do) — hardcoding UTC would silently miscount days if the
    // harness ever unpinned spark.sql.session.timeZone (r4 ADVICE).
    val sessionZone = java.time.ZoneId.of(spark.conf.get("spark.sql.session.timeZone"))
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd").withZone(sessionZone)
    val expected = perMinute.toSeq
      .groupBy { case (m, _) => fmt.format(java.time.Instant.ofEpochMilli(m * 60000L)) }
      .map { case (day, ms) => day -> ((ms.map(_._2).max, ms.length.toLong)) }
    val got = SparkEntry
      .queries("ts_max_concurrency")(spark, sfDir)
      .collect()
      .map(r => r.getAs[String]("day") -> ((r.getAs[Long]("max_concurrent"), r.getAs[Long]("n_active_minutes"))))
      .toMap
    assert(got == expected)
  }

  test("ts_downsample_ohlc: exact match vs in-memory bucket recompute") {
    // order at MICROSECOND grain (etime's real precision — ms-grain getTime
    // could swap two events inside the same millisecond)
    val raw = Tables
      .events(spark, sfDir)
      .select(col("event_id"), expr("ts div 1000").as("tus"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    // Hour bucketing must follow the session timezone like date_trunc does
    val zone = java.time.ZoneId.of(spark.conf.get("spark.sql.session.timeZone"))
    def hour(us: Long): Long =
      java.time.Instant
        .ofEpochMilli(us / 1000L)
        .atZone(zone)
        .truncatedTo(java.time.temporal.ChronoUnit.HOURS)
        .toInstant
        .toEpochMilli
    val expected = raw
      .groupBy(e => (e._3, hour(e._2)))
      .map { case (k, evs) =>
        val ord = evs.sortBy(e => (e._2, e._1))
        k -> ((ord.length.toLong, ord.head._4, evs.map(_._4).max, evs.map(_._4).min, ord.last._4))
      }
    val got = SparkEntry
      .queries("ts_downsample_ohlc")(spark, sfDir)
      .collect()
      .map { r =>
        (r.getAs[String]("event_type"), r.getAs[java.sql.Timestamp]("hr").getTime) ->
          ((r.getAs[Long]("n_events"), r.getAs[Double]("open"), r.getAs[Double]("high"),
            r.getAs[Double]("low"), r.getAs[Double]("close")))
      }
      .toMap
    assert(got == expected)
    // every bucket respects the OHLC envelope
    got.values.foreach { case (_, o, h, l, c) =>
      assert(l <= o && o <= h && l <= c && c <= h)
    }
  }

  test("ts_forward_fill: filled value is the latest non-null at-or-before, per user") {
    val out = SparkEntry.queries("ts_forward_fill")(spark, sfDir).collect()
    // independent in-memory recompute from the raw table
    val raw = Tables
      .events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("etime"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[java.sql.Timestamp](2).getTime, r.getDouble(3)))
    val expected = raw
      .groupBy(_._2)
      .iterator
      .flatMap { case (_, evs) =>
        var carry: Option[Double] = None
        evs.sortBy(e => (e._3, e._1)).iterator.map { case (id, _, _, v) =>
          val gap = id % 5 == 0
          if (!gap) carry = Some(v)
          id -> ((carry, gap))
        }
      }
      .toMap
    assert(out.length == raw.length)
    out.foreach { r =>
      val id = r.getAs[Long]("event_id")
      val (want, gap) = expected(id)
      val got = if (r.isNullAt(r.fieldIndex("value_filled"))) None
      else Some(r.getAs[Double]("value_filled"))
      assert(got == want, s"event $id: filled $got want $want")
      assert(r.getAs[Boolean]("was_gap") == gap)
    }
    // the fixture must actually exercise both repair and leading-gap cases
    assert(out.exists(r => r.getAs[Boolean]("was_gap") && !r.isNullAt(r.fieldIndex("value_filled"))))
  }

  test("text_char_entropy: bounded by log2(alphabet), zero for constant docs, exact on uniform") {
    import spark.implicits._
    val out = SparkEntry.queries("text_char_entropy")(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val h = r.getAs[Double]("entropy_bits")
      val k = r.getAs[Long]("n_distinct_chars")
      // rounding each term to 7 decimals can overshoot the bound by at most
      // 5e-8 per distinct char
      assert(h >= 0.0 && h <= math.log(k.toDouble) / math.log(2.0) + k * 5e-8,
        s"doc ${r.getAs[Long]("doc_id")}: H=$h outside [0, log2($k)]")
    }
    // closed-form checks on synthetic docs through the SAME query body via a
    // temp view is not possible (query reads the table), so recompute the
    // formula directly for one fixture doc against the declared output
    val doc = Tables.documents(spark, sfDir).select("doc_id", "text").head()
    val text = doc.getString(1)
    val n = text.length.toDouble
    val expected = text
      .groupBy(identity)
      .values
      .map { g =>
        val p = g.length / n
        BigDecimal(-p * (math.log(p) / math.log(2.0)))
          .setScale(7, BigDecimal.RoundingMode.HALF_UP)
      }
      .sum
      .toDouble
    val got = out.find(_.getAs[Long]("doc_id") == doc.getLong(0)).get.getAs[Double]("entropy_bits")
    assert(math.abs(got - expected) < 1e-9, s"recompute $expected vs declared $got")
  }

  test("text_novelty: first doc fully novel, novel counts partition the shingle universe") {
    val out = SparkEntry.queries("text_novelty")(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val nov = r.getAs[Double]("novelty")
      assert(nov >= 0.0 && nov <= 1.0)
      assert(r.getAs[Long]("n_novel") <= r.getAs[Long]("n_grams"))
    }
    // the lowest-id doc can have seen nothing before it
    val first = out.minBy(_.getAs[Long]("doc_id"))
    assert(first.getAs[Double]("novelty") == 1.0, "lowest-id doc must be 100% novel")
    // every distinct shingle has exactly one first-seer, so novel counts
    // sum to the size of the distinct shingle universe
    val universe = ops.Text
      .shingleHashArrays(Tables.documents(spark, sfDir))
      .select(explode(col("shs")).as("sh"))
      .distinct()
      .count()
    assert(out.map(_.getAs[Long]("n_novel")).sum == universe)
  }

  test("attribution_last_touch: buckets partition purchases; recompute matches exactly") {
    val evs = Tables
      .events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        unix_micros(col("etime")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3), r.getLong(4)))
    val purchases = evs.filter(_._3 == "purchase")
    val touches = evs.filter(e => e._3 == "view" || e._3 == "click")
    val window7d = 7L * 86400L * 1000000L
    val byChannel = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    purchases.foreach { case (pid, uid, _, _, pus) =>
      val cands = touches.filter(t => t._2 == uid && t._5 <= pus && t._5 > pus - window7d)
      val ch = if (cands.isEmpty) "direct"
      else cands.maxBy(t => (t._5, t._1))._3
      byChannel(ch) += 1
    }
    val got = SparkEntry
      .queries("attribution_last_touch")(spark, sfDir)
      .collect()
      .map(r => r.getAs[String]("channel") -> r.getAs[Long]("n_purchases"))
      .toMap
    assert(got == byChannel.toMap, s"got $got want $byChannel")
    assert(got.values.sum == purchases.length.toLong, "buckets must partition purchases")
  }

  test("containment dedup catches excerpts that jaccard misses") {
    val out = SparkEntry.queries("dedup_containment")(TestSession.spark, TestSession.sfDir).collect()
    val pairs = out.map(r => (r.getAs[Long]("id_sub"), r.getAs[Long]("id_super"))).toSet
    def shingles(t: String): Set[String] =
      t.split(" ").filter(_.nonEmpty).sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    val docs = Tables
      .documents(TestSession.spark, TestSession.sfDir)
      .filter(org.apache.spark.sql.functions.col("doc_id") % 20 === 0)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    assert(docs.nonEmpty)
    docs.foreach { case (id, text) =>
      // every synthesized excerpt must be reported as contained in its source
      assert(pairs.contains((id + 1000000000000L, id)), s"excerpt pair for doc $id missing")
      // and jaccard genuinely misses it: prefix-half excerpt has containment
      // 1.0 but jaccard well under the 0.8 near-dup bar
      val w = text.toLowerCase.trim.split("\\s+").toSeq
      val ex = w.take(math.max(w.length / 2, 3)).mkString(" ")
      val (sDoc, sEx) = (shingles(w.mkString(" ")), shingles(ex))
      assert(sEx.subsetOf(sDoc), s"doc $id: excerpt shingles not a subset")
      val jac = sEx.intersect(sDoc).size.toDouble / sEx.union(sDoc).size
      assert(jac < 0.8, s"doc $id: excerpt jaccard $jac would be caught by the dup bar anyway")
    }
    // containment >= jaccard for every reported pair (pure arithmetic law:
    // dividing by min(|A|,|B|) instead of |A∪B| can only grow the ratio)
    out.foreach { r =>
      assert(r.getAs[Double]("containment") >= 0.9 && r.getAs[Double]("containment") <= 1.0)
    }
  }

  test("dedup_substring_spans: exact match vs plain-Scala span recompute") {
    val K = 8
    val out = SparkEntry
      .queries("dedup_substring_spans")(TestSession.spark, TestSession.sfDir)
      .collect()
      .map(r =>
        (
          r.getAs[Long]("doc_id"),
          r.getAs[Long]("span_start"),
          r.getAs[Long]("span_len"),
          r.getAs[Long]("n_windows"),
        ))
      .toSet
    // independent recompute: corpus-wide k-gram occurrence counts, then
    // per-doc maximal runs of positions whose gram occurs >= 2 times
    val docs = Tables
      .documents(TestSession.spark, TestSession.sfDir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").toLowerCase.trim.split("\\s+").toSeq)
    val grams = docs.flatMap { case (id, w) =>
      if (w.length < K) Seq.empty
      else w.sliding(K).zipWithIndex.map { case (g, i) => (id, i.toLong, g.mkString(" ")) }.toSeq
    }
    val df = grams.groupBy(_._3).map { case (g, occ) => g -> occ.length }
    val want = grams
      .filter(t => df(t._3) >= 2)
      .groupBy(_._1)
      .flatMap { case (id, ws) =>
        val runs = ws.map(_._2).sorted.foldLeft(List.empty[List[Long]]) {
          case (acc @ (run :: rest), p) if p == run.head + 1 => (p :: run) :: rest
          case (acc, p)                                      => List(p) :: acc
        }
        runs.map { run =>
          val (lo, hi) = (run.min, run.max)
          (id, lo, hi - lo + K, run.length.toLong)
        }
      }
      .toSet
    assert(out == want, s"spans differ: extra=${out -- want} missing=${want -- out}")
    assert(out.nonEmpty, "fixture corpus must contain duplicated spans")
    // span arithmetic law: span_len = n_windows + K - 1 exactly on every row
    out.foreach { case (_, _, len, n) => assert(len == n + K - 1) }
  }

  test("jaccard over shingle sets is symmetric and in [0, 1] (pure law)") {
    def shingles(t: String): Set[String] =
      t.split(" ").filter(_.nonEmpty).sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    check(
      "jaccard-laws",
      Prop.forAll(doc, doc) { (t1, t2) =>
        val (s1, s2) = (shingles(t1), shingles(t2))
        s1.isEmpty || s2.isEmpty || {
          val j12 = s1.intersect(s2).size.toDouble / s1.union(s2).size
          val j21 = s2.intersect(s1).size.toDouble / s2.union(s1).size
          j12 == j21 && j12 >= 0.0 && j12 <= 1.0
        }
      },
      n = 50,
    )
  }
}
