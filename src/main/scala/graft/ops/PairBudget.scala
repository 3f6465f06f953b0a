package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pair-volume budgeting for every pair-generating self-join in the catalog
  * (the supplier-pair graph keys, the basket-pair mining keys, and the exact
  * shingle-pair dedup verifiers).
  *
  * A key shared by d rows fans out d·(d−1)/2 pairs, so the TOTAL work of a
  * pair self-join is Σ over keys of that combinatorial term — a quantity
  * one column-pruned COUNT aggregate computes up front for a vanishing
  * fraction of the join's own cost. r14 measured both failure modes this
  * number governs:
  *
  *   - UNDER-PARTITIONED AGGREGATE (fixable): at a fixed dev-session
  *     shuffle-partition count, a ~10⁹-row pair stream thrashes the
  *     aggregate's spill path (93 GB memory-spill measured on
  *     graph_jaccard_neighbors at sf10/32 partitions; zero after sizing
  *     the aggregate to ⌈pairs / [[RowsPerTask]]⌉ tasks). Map-side combine
  *     cannot save it — pair keys are mostly unique per partition.
  *   - BUDGET EXCEEDED (not fixable by partitioning): on a saturated
  *     vocabulary the exact shingle-pair stream goes quadratic in corpus
  *     size (measured 117.5 M pairs at sf1 → 11.76 B at sf10 ≈ 350 GB of
  *     shuffle against 77 GB of free disk — the run died in spill after
  *     minutes). No partition count survives an n² ROW count; the only
  *     honest answers are "refuse fast, name the banded scale path"
  *     (dedup_minhash_lsh: same candidate universe, recall ≥ 0.95 law,
  *     linear growth) or an explicit user override.
  *
  * Everything here is gated on INPUT BYTES (a driver-side FS listing, no
  * Spark job): below [[ByteGateDefault]] the answer is None and callers
  * keep their exact small-scale plan — dev/gate-scale bench rows, plan
  * invariants, and the ScalingLawSpec shuffle models are untouched, and
  * plan CONSTRUCTION launches zero jobs. Results are partitioning-invariant
  * either way (SURVEY §2.0), so oracle hashes never move.
  *
  * At 1000-executor scale the partition sizing is what a tuned
  * `spark.sql.shuffle.partitions` would have given each job — but a
  * library cannot assume its host session is tuned per operator, so the
  * scale path sizes itself; and the refusal is what a resource manager
  * would do AFTER burning the cluster for hours, moved to second zero.
  */
private[graft] object PairBudget {

  /** Per-task row budget for a pair aggregate's hash state: ~2M (k1, k2,
    * counts) entries ≈ 100–200 MB — comfortably inside an executor task's
    * share of unified memory, so the aggregate never touches the spill
    * path (r14 measurement: 450 tasks at sf10 → zero spill bytes).
    */
  private[graft] val RowsPerTask = 2000000L

  /** Per-task row budget for a LINEAR key exchange — the distinct() /
    * per-key aggregate over raw fact rows that FEEDS a pair join, one key
    * per input row. r15 measurement (PERF.md): the (l_orderkey, l_partkey)
    * distinct at sf10 (~60 M rows) memory-spills ~1.1 GB across 32 tasks
    * (1.9 M two-long hash-state entries each), so the linear budget sits
    * at half the pair budget: 1 M rows keeps a task's state well inside
    * its unified-memory share with the usual 32-concurrent-task split.
    */
  private[graft] val RowsPerLinearTask = 1000000L

  /** Input-bytes gate below which the SIZING helpers are a no-op: sf0.1 and
    * sf1 lineitem are ~12 MB / ~120 MB, sf10 ~1.2 GB — the measured spill
    * regime starts in the second decade, and lineitem (numeric fact
    * columns) compresses only mildly, so on-disk bytes track row count.
    * Override (mainly for tests) with [[ByteGateConf]].
    */
  private[graft] val ByteGateDefault = 256L * 1024 * 1024
  private[graft] val ByteGateConf = "spark.graft.pairAgg.byteGate"

  /** Input-bytes gate for the EXACT-pair pre-flight — deliberately ~16×
    * lower than [[ByteGateDefault]], because compressed TEXT bytes
    * under-represent shingle volume in exactly the adversarial direction:
    * a saturated (closed) vocabulary is both the quadratic-pair regime AND
    * the best-compressing corpus (measured: the closed-vocab sf10 corpus
    * whose 11.76 B-pair stream kills the operator is 55 MB on disk — a
    * 256 MB gate never arms there, r15 refusal test). Over-triggering is
    * harmless — the estimate is one memoized aggregate costing ~a second
    * at this gate's scale, against an operator that costs many — while
    * under-triggering is the ungoverned spill death the pre-flight exists
    * to prevent. Driver scales stay untouched (sf0.1 documents = 0.6 MB).
    */
  private[graft] val ExactPairByteGateDefault = 16L * 1024 * 1024
  private[graft] val ExactPairByteGateConf = "spark.graft.exactPair.byteGate"

  /** Hard ceiling on an EXACT pair operator's estimated pair volume, in
    * pairs. Explicit override via [[MaxPairsConf]]; the default derives
    * from free disk on the shuffle-local dirs at [[BytesPerPair]] per pair
    * row and [[DiskSafetyFraction]] headroom — the r14 kill happened at
    * ~30 B/pair of shuffle+spill against a 77 GB disk, so the default
    * refuses exactly the runs that measurement says cannot finish
    * (11.76 B pairs → needs ~350 GB) while admitting the ones it says can
    * (0.9 B graph pairs → ~27 GB; 98.5 M open-vocab shingle pairs → ~3 GB).
    */
  private[graft] val MaxPairsConf = "spark.graft.exactPair.maxPairs"
  private[graft] val BytesPerPair = 32L
  private[graft] val DiskSafetyFraction = 0.5

  /** Partition-count cap — far above any measured need (sf10 sized to 450);
    * a runaway estimate should not schedule a million shuffle files. */
  private[graft] val MaxPartitions = 4096

  /** Thrown at PLAN CONSTRUCTION time when an exact pair operator's
    * estimated volume exceeds the budget — seconds into the query, before
    * any pair join is scheduled, with the scale path named in the message.
    */
  final class PairBudgetExceeded(msg: String) extends IllegalStateException(msg)

  private def byteGate(s: SparkSession): Long =
    s.conf.getOption(ByteGateConf).map(_.toLong).getOrElse(ByteGateDefault)

  private def exactPairByteGate(s: SparkSession): Long =
    s.conf.getOption(ExactPairByteGateConf).map(_.toLong).getOrElse(ExactPairByteGateDefault)

  private[graft] def maxPairs(s: SparkSession): Double =
    s.conf.getOption(MaxPairsConf).map(_.toDouble).getOrElse {
      val dirs = s.sparkContext.getConf
        .get("spark.local.dir", System.getProperty("java.io.tmpdir", "/tmp"))
        .split(",").map(_.trim).filter(_.nonEmpty)
      val usable = dirs.map(d => new java.io.File(d).getUsableSpace).sum
      usable * DiskSafetyFraction / BytesPerPair
    }

  /** Σ c·(c−1)/2 over the group sizes of `keyCol` — the exact row count of
    * the a<b pair stream the self-join on `keyCol` will emit (df=1 keys
    * contribute zero, so no support filter is needed; an uncapped estimate
    * upper-bounds any hub-capped pair stream). One column-pruned job.
    */
  private[graft] def sumPairs(df: DataFrame, keyCol: String): Double = {
    val est = df
      .groupBy(keyCol)
      .agg(count(lit(1)).as("c"))
      .agg(sum(col("c") * (col("c") - lit(1)) / lit(2)).as("pairs"))
      .collect()(0)
    Option(est.getAs[Any]("pairs")).map(_.asInstanceOf[Number].doubleValue()).getOrElse(0.0)
  }

  /** Memoized pair-volume estimates, keyed per session (weakly, so a
    * stopped session's entries vanish) and per caller-declared string —
    * the estimate is a deterministic pure function of the input directory,
    * and callers like graph_adamic_adar / graph_jaccard_neighbors build
    * plans repeatedly (every bench pass), so recomputing it per plan
    * construction is pure waste (r14 ADVICE). Same regenerate-in-place
    * caveat as IvfAnn.cachedCentroids: keys carry the data DIR, not a
    * content fingerprint — [[invalidateSessionEstimates]] is the dev hook
    * (GenData calls it after in-place rewrites).
    */
  private val estimateCache =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.HashMap[String, Double]]()

  private[graft] def invalidateSessionEstimates(s: SparkSession): Unit =
    estimateCache.synchronized { estimateCache.remove(s); () }

  private[graft] def cachedEstimate(s: SparkSession, key: String)(compute: => Double): Double =
    estimateCache.synchronized {
      val perKey = Option(estimateCache.get(s)).getOrElse {
        val m = scala.collection.mutable.HashMap.empty[String, Double]
        estimateCache.put(s, m)
        m
      }
      perKey.getOrElseUpdate(key, compute)
    }

  /** Work-proportional partition count for a pair aggregate, or None when
    * the session's own parallelism already covers it. The baseline is
    * max(defaultParallelism, spark.sql.shuffle.partitions) — a host session
    * tuned ABOVE core count must never be repartitioned DOWN, and a plan
    * that fits the session's shuffle width needs no extra exchange at all
    * (r14 ADVICE).
    */
  private[graft] def partitionsFor(
      s: SparkSession,
      pairs: Double,
      perTask: Long = RowsPerTask): Option[Int] = {
    val base = math.max(s.sparkContext.defaultParallelism, s.sessionState.conf.numShufflePartitions)
    val n = math.ceil(pairs / perTask).toInt
    if (n <= base) None else Some(math.min(n, MaxPartitions))
  }

  /** Byte-gated, memoized estimate of a pair stream's volume. None below
    * the gate (small-scale plans stay byte-identical and plan construction
    * runs zero jobs); `stream` is by-name so the estimate subtree is not
    * even built below the gate.
    */
  private def gatedEstimate(
      s: SparkSession,
      dir: String,
      gateTable: String,
      gateBytes: Long,
      cacheKey: String)(stream: => DataFrame, keyCol: String): Option[Double] =
    if (Tables.inputBytes(s, dir, gateTable) < gateBytes) None
    else Some(cachedEstimate(s, cacheKey)(sumPairs(stream, keyCol)))

  /** Work-proportional partition count for the LINEAR distinct/aggregate
    * exchanges that feed the pair joins (r15 — the one spilling stage the
    * basket-pair sizing left behind: the raw (orderkey, partkey) distinct,
    * 1.1 GB memory-spill at sf10/32 tasks). Row count is a column-pruned
    * Spark count job (cheap — it reads no column data, only row-group
    * batch counts — but it IS a job; true footer-only count pushdown needs
    * spark.sql.parquet.aggregatePushdown), memoized like every other
    * estimate; below the byte gate the count never runs and callers keep
    * their exact plan.
    */
  private[graft] def linearAggPartitions(
      s: SparkSession,
      dir: String,
      gateTable: String,
      cacheKey: String)(rowCount: => Double): Option[Int] =
    if (Tables.inputBytes(s, dir, gateTable) < byteGate(s)) None
    else partitionsFor(s, cachedEstimate(s, cacheKey)(rowCount), RowsPerLinearTask)

  /** The sizing half only — for pair aggregates whose volume is linear-ish
    * by construction (hub-capped graph keys, basket-bounded mining keys):
    * above the byte gate, hash-repartition the pair stream to the work.
    */
  private[graft] def sizedPartitions(
      s: SparkSession,
      dir: String,
      gateTable: String,
      cacheKey: String)(stream: => DataFrame, keyCol: String): Option[Int] =
    gatedEstimate(s, dir, gateTable, byteGate(s), cacheKey)(stream, keyCol)
      .flatMap(partitionsFor(s, _))

  /** The full pre-flight for EXACT pair operators (dedup_near_jaccard /
    * dedup_containment), whose volume is quadratic on adversarial input by
    * contract: above the byte gate, estimate; above the budget, refuse
    * fast with the scale path named; within budget, size the aggregate.
    */
  private[graft] def exactPairPreflight(
      s: SparkSession,
      dir: String,
      op: String,
      cacheKey: String,
      scalePath: String)(stream: => DataFrame, keyCol: String): Option[Int] =
    gatedEstimate(s, dir, "documents", exactPairByteGate(s), cacheKey)(stream, keyCol).flatMap { pairs =>
      val ceiling = maxPairs(s)
      if (pairs > ceiling)
        throw new PairBudgetExceeded(
          f"$op: estimated exact pair volume ${pairs}%1.3g pairs exceeds the budget ${ceiling}%1.3g " +
            f"(~${pairs * BytesPerPair / 1e9}%.0f GB of shuffle at $BytesPerPair B/pair). " +
            s"This operator computes exact similarity over every co-occurring pair BY CONTRACT; " +
            s"past this volume it dies in shuffle spill, not in this check. " +
            s"Use $scalePath (banded candidates + exact verify, recall >= 0.95) as the scale path, " +
            s"or raise $MaxPairsConf explicitly if the disk budget is known to cover it."
        )
      partitionsFor(s, pairs)
    }
}
