package graft

import org.apache.spark.sql.execution.SparkPlan

/** Pins the physical-plan shapes PERF.md documents, so a refactor that
  * silently loses pushdown, re-shuffles a broadcast star join, or degrades
  * top-k into a global sort fails CI instead of the 100 TB run.
  */
class PlanInvariantsSpec extends SparkSpec {

  private def plan(name: String): SparkPlan = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.count() // finalize AQE
    df.queryExecution.executedPlan
  }

  private def planString(name: String): String = plan(name).toString

  test("scan_parquet_pushdown: filter and projection reach the parquet scan") {
    val p = planString("scan_parquet_pushdown")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]"), p.take(1500))
    assert(p.contains("ReadSchema") && !p.contains("l_shipdate"), "projection must prune unused columns")
  }

  test("filter_pred: compound predicate fully pushed") {
    // plan toString truncates long filter lists — read the scan metadata
    // (unwrap AQE: collectLeaves treats AdaptiveSparkPlanExec as a leaf)
    val finalPlan = plan("filter_pred") match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case other                                                            => other
    }
    val pushed = finalPlan
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f.metadata("PushedFilters") }
      .mkString
    assert(pushed.contains("GreaterThan(l_quantity,30.0)") && pushed.contains("In(l_returnflag"), pushed)
  }

  test("incremental_read: checkpoint bound pushed onto the ts column") {
    // the literal's rendering depends on the testdata generation's ts
    // encoding (ns long vs µs timestamp) — what matters is that a plain
    // GreaterThan on the RAW ts column reached PushedFilters at all
    val p = planString("incremental_read")
    assert(p.contains("PushedFilters: [IsNotNull(ts), GreaterThan(ts,"), p.take(1500))
  }

  test("join_multiway_star: broadcast joins only, fact side never exchanges pre-agg") {
    val p = planString("join_multiway_star")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin"), "star dims must broadcast at gate scale")
  }

  test("topk_global plans TakeOrderedAndProject, not a global sort") {
    val p = planString("topk_global")
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
  }

  test("sim_topk_cosine: probes broadcast, corpus streams; native dot in the plan") {
    val p = planString("sim_topk_cosine")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(1500))
    assert(p.contains("graft_dot"), "native DotProduct must be in the executed plan")
  }

  test("join_interval: equi join on user_id, range condition stays residual") {
    val p = planString("join_interval")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p.take(1500))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "interval join must key on user_id, not build a time cross-product")
    assert(p.contains("EqualTo(event_type,view)") && p.contains("EqualTo(event_type,click)"),
      "side filters must reach the scans")
  }

  test("sample_hash_split: pure per-row projection, zero exchanges") {
    val finalPlan = plan("sample_hash_split") match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case other                                                            => other
    }
    // the declared orderBy is the only allowed exchange (driver sorts anyway)
    val exchanges = finalPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.size <= 1, s"hash split must not shuffle beyond the final sort: $finalPlan")
  }

  test("merge_scd2: exactly one join, no union re-shuffle") {
    val p = planString("merge_scd2")
    assert(p.contains("Generate"), "versioned rows must come from the conditional explode")
    assert(!p.contains("Union"), "both versions must be produced in one pass, not a self-union")
  }

  test("decontaminate: eval grams broadcast, corpus side never self-joins") {
    val p = planString("decontaminate")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin"), "eval-gram set must broadcast, not sort-merge")
  }

  test("chunk_text: per-row chunking, zero exchanges beyond the declared sort") {
    val finalPlan = plan("chunk_text") match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case other                                                            => other
    }
    val exchanges = finalPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.size <= 1, s"chunking must not shuffle beyond the final sort: $finalPlan")
  }

  test("minhash candidate generation: ONE corpus scan, no banded self-join, native kernel") {
    // the signature stage is map-side (no Exchange under it), so a bucket
    // self-join would recompute the whole signature pipeline per side with
    // NO ReuseExchange to save it (the r4 regression). The groupBy(bucket)
    // formulation must read the corpus exactly once.
    val docs = Tables.documents(spark, sfDir)
    val p = ops.MinHashDedup
      .candidatePairs(ops.MinHashDedup.signaturesNative(docs))
      .queryExecution
      .executedPlan
      .toString
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"candidate generation re-reads the corpus (scans=$scans):\n${p.take(1200)}")
    assert(p.contains("graft_minhash_sig"), "native signature kernel missing from the plan")
    assert(!p.contains("Join"), "candidate generation must group, not self-join")
  }

  test("knn_classify: probes broadcast, top-k pruned map-side before the shuffle") {
    val p = planString("knn_classify")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(1500))
    assert(p.contains("graft_dot"), "native DotProduct must score the candidates")
    // WindowGroupLimit ahead of the exchange = each task forwards at most
    // k rows per probe; losing it would shuffle the full scored cross set
    val exchangeIdx = p.indexOf("Exchange hashpartitioning(probe_id")
    val limitIdx    = p.indexOf("WindowGroupLimit")
    assert(limitIdx >= 0 && exchangeIdx >= 0, p.take(1500))
    assert(
      p.lastIndexOf("WindowGroupLimit") > exchangeIdx,
      "no partial WindowGroupLimit below the probe_id exchange",
    )
  }

  test("join_range_binned: equi-join on the bin, no nested loop — and ≡ the naive range join") {
    val p = planString("join_range_binned")
    assert(
      !p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "binned range join degenerated to a nested loop:\n" + p.take(1500),
    )
    // the contrast: the textbook pure-range predicate has no equi-conjunct,
    // so Spark can only nested-loop it — that is the O(intervals × events)
    // plan the binning exists to avoid
    val naive = ops.Events.rangeBinnedBody(spark, sfDir, naive = true)
    naive.count()
    assert(
      naive.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"),
      "naive body no longer nested-loops — the contrast law lost its baseline",
    )
    // same answer, bit for bit
    val binned = SparkEntry.queries("join_range_binned")(spark, sfDir)
    assert(binned.collect().toSeq == naive.collect().toSeq, "binned ≠ naive range join")
  }

  test("no cartesian products outside the bounded cross join") {
    SparkEntry.queries.keys.filterNot(_ == "join_cross_bounded").foreach { name =>
      val p = planString(name)
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian product")
    }
  }

  test("dedup_substring_spans: df via aggregate + semi-join, never a pair join or hot window") {
    val finalPlan = plan("dedup_substring_spans") match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case other                                                            => other
    }
    val s = finalPlan.toString
    // duplication is decided by groupBy(h) df + ONE LeftSemi membership
    // probe: partial aggregation collapses a hot gram map-side, where the
    // r6 count-window formulation put its whole df in one WindowExec task.
    // A non-semi join means the design regressed to pair-land; a Window
    // partitioned by h means the hot-key seam came back.
    assert(s.contains("LeftSemi"), s.take(1500))
    assert(!s.contains("windowspecdefinition(h"), "df must not come from a per-gram window\n" + s.take(1500))
    val joins = finalPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.size == 1, s"expected exactly the one semi probe, got ${joins.size}\n$s")
    // exchanges: hash(h) for the df agg, hash(h) probe side of the semi
    // join, hash(doc_id) for the island window (the groupBy(doc_id, isl)
    // rides that same partitioning), final range sort
    val exchanges = finalPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.length <= 4, s"${exchanges.length} exchanges\n$finalPlan")
  }

  test("ts_interpolate_linear: all four neighbour lookups share one user partitioning") {
    val finalPlan = plan("ts_interpolate_linear") match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case other                                                            => other
    }
    val exchanges = finalPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    // hash(user_id) for the windows + the final ORDER BY event_id range
    // exchange; a third means the backward/forward frames split the sort
    assert(exchanges.length <= 2, s"${exchanges.length} exchanges\n$finalPlan")
  }

  test("sample_mix_exact: the |langs| quota frame broadcasts, never shuffles the corpus side") {
    val p = planString("sample_mix_exact")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin"), "quota join must broadcast")
  }

  test("ts_forward_fill / win_ewma: one partitioned window pass, scans prune to used columns") {
    // both are single-window-pass designs: exactly ONE exchange (by
    // user_id) feeding the window; a second exchange means the fill/lag
    // chain split into extra shuffles
    Seq("ts_forward_fill", "win_ewma").foreach { name =>
      val finalPlan = plan(name) match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
        case other                                                            => other
      }
      val exchanges = finalPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      // the final global ORDER BY event_id plans a range exchange; the
      // window's hash(user_id) exchange must be the only other one
      assert(exchanges.length <= 2, s"$name: ${exchanges.length} exchanges\n$finalPlan")
      val read = finalPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f.metadata("ReadSchema")
      }.mkString
      assert(!read.contains("props"), s"$name reads the unused props column")
    }
  }

  test("ts_outlier_mad: stats frames broadcast back to the stream, no stream shuffle") {
    val p = planString("ts_outlier_mad")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin"),
      "per-type med/mad frames are |event_type| rows and must broadcast")
  }

  test("text_novelty: first-seer via collapsed aggregates, no per-shingle window") {
    val p = planString("text_novelty")
    // r7: firsts come from groupBy(sh).min (map-side combine bounds a hot
    // shingle) + doc-grain join — a Window in this plan means the hot-key
    // seam came back
    assert(!p.contains("Window"), "novelty must not plan a per-shingle window\n" + p.take(1500))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p.take(1500))
  }

  test("text_bm25_topk: top-k prunes map-side; df and stats broadcast, never sort-merge") {
    val p = planString("text_bm25_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
    assert(!p.contains("SortMergeJoin"), "df/stats frames must broadcast")
  }

  test("retrieval_rrf: both legs end in top-k prunes and the fusion joins only bounded frames") {
    val finalPlan = plan("retrieval_rrf") match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case other                                                            => other
    }
    assert(finalPlan.toString.contains("graft_dot"), "vector leg must use the native dot kernel")
    // The FULL OUTER fusion join cannot broadcast (unsupported for BHJ), so
    // it may sort-merge \u2014 but each input must already be a top-K frame:
    // a TakeOrderedAndProject with NO exchange between it and the join.
    def boundedPrefix(pl: SparkPlan): Boolean = pl match {
      case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => true
      case x if x.getClass.getSimpleName.contains("Exchange") ||
        x.getClass.getSimpleName.contains("QueryStage") => false
      case x if x.children.size == 1 => boundedPrefix(x.children.head)
      case _ => false
    }
    val joins = finalPlan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    assert(joins.nonEmpty, "fusion join expected in the plan")
    joins.foreach { j =>
      j.children.foreach { side =>
        assert(boundedPrefix(side), s"fusion join input is not a pruned top-K frame:\n$side")
      }
    }
  }

  test("filter_site_quality: the keep-set joins back as a broadcast, corpus never shuffles") {
    val p = planString("filter_site_quality")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin"), "site rollup must broadcast back onto the scored stream")
  }

  test("stats_bootstrap_ci: fan-out stays map-side — one md5, no join wider than the 1-row CI attach") {
    val p = planString("stats_bootstrap_ci")
    // one md5 per ROW (the 8.6s -> 1.3s fix): a per-replicate hash would
    // put the md5 above the Generate; cheapest stable proxy is that the
    // hash seeds project BELOW the explode, i.e. Generate's input already
    // carries h1/h2
    assert("md5".r.findAllIn(p).size == 1, "exactly one md5 evaluation site expected")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p.take(1500))
    val exchanges = "ShuffleExchange|Exchange hashpartitioning|Exchange SinglePartition".r.findAllIn(p).size
    assert(exchanges <= 4, s"replicate agg should keep exchanges tiny, saw $exchanges:\n${p.take(1500)}")
  }

  test("graph_adamic_adar / graph_jaccard_neighbors: pair stage is an equi-join, never a product") {
    Seq("graph_adamic_adar", "graph_jaccard_neighbors").foreach { k =>
      val p = planString(k)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$k pair stage degraded to a product:\n${p.take(1500)}")
    }
  }

  test("graph_kcore: peeling rounds read the checkpointed edge frame, not the pair subtree") {
    val p = planString("graph_kcore")
    assert(p.contains("ExistingRDD"), "expected the final round to scan the checkpointed edges")
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("embed_dim_truncation_eval: probes broadcast; both rank filters prune map-side") {
    val p = planString("embed_dim_truncation_eval")
    // the corpus is scored in place against broadcast probes — a sort-merge
    // here would shuffle the whole corpus twice (truth + truncated passes)
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin"), "corpus must never shuffle as scoring input")
    // rank<=k on both the (dim, probe) and truth windows must compile to
    // WindowGroupLimit so only ~k rows per group reach each exchange
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2, s"expected both top-k prunes:\n${p.take(1500)}")
  }

  test("graph_label_propagation: rank-1 label vote prunes map-side every round; no products") {
    val p = planString("graph_label_propagation")
    assert("WindowGroupLimit".r.findAllIn(p).size >= 3, s"one prune per sync round expected:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p.take(1500))
  }

  test("text_keyword_rake: no product joins; score join stays vocabulary-grain") {
    val p = planString("text_keyword_rake")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p.take(1500))
  }
  test("stats_theil_sen_trend: the 1998 window predicate reaches the orders scan") {
    val p = planString("stats_theil_sen_trend")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate,"), p.take(2000))
  }

  test("stats_welch_ttest: the two-arm filter reaches the events scan; one moment row") {
    val p = planString("stats_welch_ttest")
    assert(p.contains("In(event_type, [click,error])"), p.take(2000))
  }

  test("catalog-wide: no unpartitioned WindowExec outside the provably-bounded allowlist") {
    import org.apache.spark.sql.execution.window.WindowExec
    // An unpartitioned window is an Exchange SinglePartition + one-task
    // sort — the 100 TB scale-killer class the r6 verdict flagged. After
    // the ScaleRank rework the declared catalog must not plan one EXCEPT
    // where the window's input frame is bounded by construction (a
    // constant-cardinality rollup, never data-sized). Each allowlist entry
    // states its bound; growing this list requires the same proof.
    // A window whose input subtree passes through a limit is k-bounded
    // regardless of corpus size (orderBy+limit plans TakeOrderedAndProject;
    // the ndcg/rrf re-rank windows run on ≤100-row top-k frames). This is a
    // contains-check, not a per-path proof — the named allowlist carries the
    // cases boundedness comes from a value grid / taxonomy instead.
    def limitBounded(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      p.collectFirst {
        case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => ()
        case _: org.apache.spark.sql.execution.GlobalLimitExec           => ()
        case _: org.apache.spark.sql.execution.CollectLimitExec          => ()
      }.isDefined
    val allow: Map[String, String] = Map(
      "agg_hdr_histogram"     -> "≤64 log2 magnitude buckets (len(bin(cents)))",
      "agg_quantile_binned"   -> "fixed $100 price bins — |price domain|/100 rows at any sf",
      // filter_surprisal_band left this list in r8: its ~4e5-row surprisal-
      // grid cumsum (the loosest entry) now runs through ScaleRank
      "corpus_mix_report"     -> "|sources|×|langs| mix cells (taxonomy-bounded)",
      "ml_eval_pr_curve"      -> "11-value discount threshold grid",
      "sample_mix_exact"      -> "|langs| quota frame",
      "sample_temperature"    -> "|langs| share frame",
      "stats_bootstrap_ci"    -> "B = const bootstrap replicates",
      "stats_ks_test"         -> "fixed $1,000 price grid — ≤ ~600 bins",
      "win_rank_movers"       -> "|brands| frame (25 on TPC-H)",
    )
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(allow.contains)
      .flatMap { name =>
        // sparkPlan (pre-AQE physical plan) carries the full operator tree
        // without executing the QUERY itself. A few builders do run real
        // jobs at BUILD time (sim_ann_ivf's eager k-means checkpoint, the
        // dedup_clusters/dedup_semantic count loops), so the sweep costs
        // roughly those builds at sf0.001 — accepted: the invariant is
        // worth it, and the frames involved are hundreds of rows here.
        val p = SparkEntry.queries(name)(spark, sfDir).queryExecution.sparkPlan
        val n = p.collect {
          case w: WindowExec if w.partitionSpec.isEmpty && !limitBounded(w.child) => w
        }.size
        if (n > 0) Some(s"$name ($n)") else None
      }
    assert(
      offenders.isEmpty,
      s"unpartitioned WindowExec in: ${offenders.mkString(", ")} — " +
        "use ScaleRank.rankedFrame/withNtile or prove the frame bounded and allowlist it",
    )
  }

  test("sample_token_budget: budgets broadcast; the only row-grain exchange is the range split") {
    val p = planString("sample_token_budget")
    // the |langs|-row budget frame must broadcast onto the ranked stream
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    // the doc stream reaches ScaleRank through ONE range repartition; a
    // SortMergeJoin would mean the budget frame lost its broadcast
    assert(!p.contains("SortMergeJoin"), "budget join degraded to sort-merge")
    assert(p.contains("rangepartitioning"), "ScaleRank range split missing")
  }

  test("corpus_cluster_mix: centroids broadcast onto the grid; corpus never sort-merges") {
    val p = planString("corpus_cluster_mix")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    // cached centroids arrive as a materialized RDD scan, not a retrain
    assert(p.contains("Scan ExistingRDD"), "probe must consume the cached index")
  }

  test("tokenizer_bpe_merge_round: the winning merge joins as a broadcast, never a shuffle") {
    val p = planString("tokenizer_bpe_merge_round")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), "the 1-row merge frame must broadcast")
  }
}
