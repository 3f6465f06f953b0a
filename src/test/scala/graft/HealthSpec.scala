package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the round-6 batch-10 health verbs — exact
  * in-memory recomputes at sf0.001.
  */
class HealthSpec extends SparkSpec {

  private def run(key: String) = SparkEntry.queries(key)(spark, sfDir)

  private def normTokens(text: String): Array[String] =
    text.toLowerCase.trim.replaceAll("\\s+", " ").split(" ")

  test("tokenizer_oov_rate: per-lang OOV shares reconcile with an in-memory vocab") {
    val rows = run("tokenizer_oov_rate").collect()
    assert(rows.nonEmpty)
    val docs = Tables
      .documents(spark, sfDir)
      .select(col("lang"), col("text"))
      .collect()
      .map(r => (r.getString(0), normTokens(r.getString(1))))
    val global = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach(_._2.foreach(t => global(t) = global.getOrElse(t, 0L) + 1))
    val vocab = global.toSeq.sortBy { case (t, n) => (-n, t) }.take(1000).map(_._1).toSet
    val byLang = docs.groupBy(_._1)
    rows.foreach { r =>
      val lang = r.getAs[String]("lang")
      val toks = byLang(lang).flatMap(_._2)
      val types = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val nTok = toks.length.toLong
      val nOov = types.collect { case (t, n) if !vocab(t) => n }.sum
      val nOovTypes = types.keys.count(!vocab(_)).toLong
      assert(r.getAs[Long]("n_tokens") == nTok)
      assert(r.getAs[Long]("n_oov_tokens") == nOov)
      assert(r.getAs[Long]("oov_token_ppm") == nOov * 1000000L / nTok)
      assert(r.getAs[Long]("n_types") == types.size.toLong)
      assert(r.getAs[Long]("n_oov_types") == nOovTypes)
    }
  }

  test("embed_dim_stats: moments match the exact integer-grid recompute; variance >= 0") {
    val rows = run("embed_dim_stats").collect()
    assert(rows.length == 64)
    val vecs = Tables
      .embeddings(spark, sfDir)
      .select(col("embedding"))
      .collect()
      .map(_.getSeq[Float](0).toArray)
    val dims = vecs.head.length
    val byDim = (0 until dims).map { d =>
      vecs.map(v => math.round(v(d).toDouble * 1e6))
    }
    rows.foreach { r =>
      val d = r.getAs[Long]("dim").toInt
      val xs = byDim(d)
      val n = xs.length.toLong
      val s6 = xs.sum
      val q12 = xs.map(x => x * x).sum
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Double]("mean") == s6.toDouble / n / 1e6)
      val expVar = (q12.toDouble / n - (s6.toDouble / n) * (s6.toDouble / n)) / 1e12
      assert(r.getAs[Double]("variance") == expVar)
      assert(r.getAs[Double]("variance") >= 0.0)
      assert(r.getAs[Long]("min6") == xs.min && r.getAs[Long]("max6") == xs.max)
      assert(r.getAs[Long]("zero_ppm") == xs.count(_ == 0L) * 1000000L / n)
    }
  }

  test("ml_eval_ndcg: NDCG laws — in (0,1], monotone DCG, rank-1 ndcg is rel-ratio") {
    val rows = run("ml_eval_ndcg").collect().sortBy(_.getAs[Long]("rnk"))
    assert(rows.length == 10)
    var prevDcg = 0.0
    rows.foreach { r =>
      val ndcg = r.getAs[Double]("ndcg")
      assert(ndcg > 0.0 && ndcg <= 1.0 + 1e-9)
      assert(r.getAs[Double]("dcg") >= prevDcg)
      assert(r.getAs[Double]("dcg") <= r.getAs[Double]("idcg") + 1e-9)
      prevDcg = r.getAs[Double]("dcg")
    }
    // the ideal list's max relevance bounds every system rel
    val maxRel = rows.map(_.getAs[Long]("rel")).max
    assert(maxRel <= ops.Retrieval.QueryTerms.length.toLong)
    // rank-1: dcg = rel(sys1), idcg = max rel over corpus, both /log2(2)=1
    val r1 = rows.head
    assert(math.abs(r1.getAs[Double]("ndcg") - r1.getAs[Double]("dcg") / r1.getAs[Double]("idcg")) < 1e-9)
  }

  test("event_transition_entropy: entropy reconciles with transition probs; bounded by log2(n_dest)") {
    val rows = run("event_transition_entropy").collect()
    assert(rows.nonEmpty)
    val probs = SparkEntry
      .queries("event_transition_probs")(spark, sfDir)
      .collect()
      .groupBy(_.getAs[String]("from_type"))
    rows.foreach { r =>
      val from = r.getAs[String]("from_type")
      val cells = probs(from)
      val nFrom = cells.head.getAs[Long]("n_from")
      assert(r.getAs[Long]("n_from") == nFrom)
      assert(r.getAs[Long]("n_dest") == cells.length.toLong)
      val exp = cells.map { c =>
        val p = c.getAs[Long]("n").toDouble / nFrom
        BigDecimal(-p * math.log(p) / math.log(2.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble
      assert(math.abs(r.getAs[Double]("entropy_bits") - exp) < 1e-9)
      assert(r.getAs[Double]("entropy_bits") <= math.log(cells.length.toDouble) / math.log(2.0) + 1e-6)
      assert(r.getAs[Long]("top_share_ppm") == cells.map(_.getAs[Long]("p_ppm")).max)
    }
  }

  test("dq_table_checksum: signature is order-free and detects a single-row mutation") {
    val rows = run("dq_table_checksum").collect()
    assert(rows.map(_.getAs[String]("table_name")).toSet == Set("orders", "lineitem", "customer"))
    val nOrders = Tables.orders(spark, sfDir).count()
    assert(rows.find(_.getAs[String]("table_name") == "orders").get.getAs[Long]("n_rows") == nOrders)
    // recompute the customer signature independently (XOR in any order)
    val cust = Tables
      .customer(spark, sfDir)
      .select(
        concat_ws(
          "|",
          col("c_custkey"),
          col("c_name"),
          col("c_nationkey"),
          round(col("c_acctbal") * 100, 0).cast("long"),
          col("c_mktsegment"),
        ).as("s")
      )
      .collect()
      .map(_.getString(0))
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    }
    val hs = cust.map(h60)
    val expXor = scala.util.Random.shuffle(hs.toList).foldLeft(0L)(_ ^ _) // order-free
    val row = rows.find(_.getAs[String]("table_name") == "customer").get
    assert(row.getAs[Long]("xor_sig") == expXor)
    assert(row.getAs[Long]("min_h") == hs.min && row.getAs[Long]("max_h") == hs.max)
    // sensitivity: flipping one row flips the signature
    assert((expXor ^ h60(cust.head + "x")) != expXor)
  }

  test("dq_table_checksum: NULL sentinel matches the DuckDB mirror and stays collision-free") {
    import spark.implicits._
    // the exact cases ADVICE flagged: a genuine NULL field, a literal
    // "NULL" string value, an empty string, and two rows differing only
    // in WHICH field is NULL — all must canonicalize distinctly, and the
    // Spark-side sentinel must equal the oracle's chr(1) || 'NULL'.
    val df = Seq(
      (Option.empty[String], Option("b")),   // (NULL, b)
      (Option("NULL"), Option("b")),         // literal string "NULL"
      (Option(""), Option("b")),             // empty string
      (Option("a"), Option.empty[String]),   // (a, NULL)
      (Option.empty[String], Option("a")),   // (NULL, a) — field swap of above
    ).toDF("x", "y")
    val canon = df
      .select(concat_ws("|", ops.Health.checksumField(col("x")), ops.Health.checksumField(col("y"))).as("c"))
      .collect()
      .map(_.getString(0))
    // all five rows canonicalize to distinct strings (no sentinel collisions)
    assert(canon.distinct.length == canon.length)
    // the sentinel is byte-identical to the DuckDB mirror: chr(1) || 'NULL'
    val sentinel = "\u0001NULL"
    assert(canon(0) == s"$sentinel|b")
    assert(canon(1) == "NULL|b") // a real "NULL" value keeps no prefix
    assert(canon(3) == s"a|$sentinel")
    assert(canon(4) == s"$sentinel|a")
  }
}
