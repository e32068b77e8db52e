package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded-iteration graph analytics on edge lists. Companion to the
  * near-dup connected components (graft.llm.Dedup.nearDupComponents):
  * the same iterate-persist-join discipline, applied to entity-importance
  * ranking.
  */
object Graph {

  /** PageRank with a FIXED iteration count — deterministic by
    * construction, so the SQL oracle unrolls the identical iterations.
    *
    * Numeric discipline: each iteration's incoming-contribution sum is a
    * cross-row double SUM, whose accumulation order differs between
    * engines/partitionings — so contributions are quantized to
    * fixed-point (floor(x·10^12) as LONG) and summed as integers,
    * exactly the quantizedCentroids trick: order-independent, overflow-
    * safe (values ≤ 1 ⇒ ≤ 10^12 per edge), bit-reproducible. The damping
    * constants are interpolated from the SAME Scala doubles the plan
    * uses, so the oracle parses identical literals (1.0 − 0.85 is NOT
    * the double "0.15").
    *
    * Scale posture: the classic iterative join pipeline — edges join the
    * rank vector on src, aggregate on dst, outer-join back to the node
    * set. Disciplines that keep it one-shuffle-per-iteration:
    *  - the WHOLE recurrence materializes in the consuming action — one
    *    Spark job, not one `count()` job per iteration (an earlier
    *    revision paid 39 jobs for 3 iterations: per-iteration
    *    materialization plus a broadcast-exchange job for every tiny
    *    join side). Rank layers are NOT persisted: each is referenced
    *    exactly once, so the linear chain computes once either way and
    *    caching it would pin iters·|V| storage for zero reuse;
    *  - out-degree is FUSED onto the edge set once — (src, dst, od)
    *    cached clustered by src — so each iteration joins one table,
    *    not two, and the cached layout already satisfies the join's
    *    distribution: the edges never re-shuffle inside the loop. At
    *    lake scale paying the edge shuffle once instead of per-iteration
    *    is the difference between O(E) and O(iters·E) network;
    *  - the execution REGIME is size-adaptive: |V| is already counted
    *    driver-side, so when the graph is small
    *    (summed input-leaf bytes ≤ `smallGraphThreshold`) the edge and
    *    node frames collapse to ONE checkpointed partition and the
    *    entire recurrence runs exchange-free in single-task stages
    *    (SinglePartition satisfies every clustering requirement) —
    *    per-task/per-job scheduling, not data, dominates a small
    *    graph. Above the threshold both joins keep cluster
    *    partitioning with a `shuffle_hash` hint: a |V|-row rank vector
    *    must NOT broadcast at 1e9 nodes (each broadcast is also a
    *    blocking driver job per round), and both sides arrive
    *    hash-clustered on the join key, so the SHJ plans with zero
    *    exchanges. The threshold is a parameter so tests pin BOTH
    *    branches; the default (256 MB of input — an edge list one task
    *    handles comfortably) marks where single-partition execution
    *    stops being a win;
    *  - |V| is collected ONCE driver-side (one count job) — it is
    *    broadcast-scalar state like the k-means centroids, and folding
    *    `1/N` into plan literals deletes a per-iteration broadcast of a
    *    1-row aggregate. The division happens in the same IEEE double
    *    ops the oracle's `x / n.nn` performs, so values stay bit-equal.
    * Dangling nodes (no out-edges) simply don't contribute — the simple
    * PageRank variant; document, don't redistribute.
    *
    * The two genuinely multiply-referenced frames (the degree-fused
    * edge set — once per iteration — and the node set) are registered
    * with [[graft.core.Caches]]; the harness's releaseCaches() hook
    * frees them after the consuming action.
    *
    * Deep recurrences: every iteration appends two joins + an aggregate
    * to one linear plan, so analysis/optimizer time grows superlinearly
    * with `iters`. `checkpointEvery` > 0 truncates lineage every that
    * many rounds via an eager `localCheckpoint` (executor-local blocks,
    * no HDFS round-trip) — values are unchanged (the recurrence is
    * deterministic), only the plan is cut. 0 disables (right for the
    * usual 3-10 rounds).
    *
    * Returns (node, pr) for every node in the edge list. */
  def pageRank(edges: DataFrame, src: Column, dst: Column, iters: Int,
               damping: Double = 0.85,
               smallGraphThreshold: Long = 268435456L,
               checkpointEvery: Int = 0): DataFrame = {
    import graft.core.Caches
    val Scale = 1000000000000.0 // 10^12 fixed-point
    val e0 = edges.select(src.cast("long").as("src"), dst.cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
    // (src, dst, od) in ONE map-combined shuffle: groupBy(src) with a
    // partial collect_set dedups edges map-side AND yields the
    // out-degree as size(set) — replacing the earlier distinct()
    // (shuffle on (src,dst)) + count-window (second shuffle on src +
    // sort). One exchange instead of two, no sort, and the output is
    // already src-clustered for the iteration joins (measured 2× on the
    // sf0.1 prep). Any od computation must co-locate a node's
    // out-edges; the residual hazard here is the per-key set buffer on
    // a hot src (ObjectHashAggregate falls back to sort-based on
    // pressure), matching the window form's per-group frame buffer.
    val ePlan = e0.groupBy(col("src"))
      .agg(collect_set(col("dst")).as("ds"))
      .select(col("src"), size(col("ds")).cast("long").as("od"),
        explode(col("ds")).as("dst"))
    // the regime decision reads the summed INPUT LEAF sizes of the
    // edge expression at PLAN TIME — zero jobs: file sources report
    // exact on-disk bytes, LocalRelations exact row bytes. Leaf sums
    // are deliberately used instead of the edge plan's own estimate,
    // which a join inflates to size(L)·size(R). A small input can in
    // principle join-explode into a large edge set (then the small
    // path is slow-but-correct single-task); a large input never
    // misclassifies as small.
    val inputBytes = edges.queryExecution.optimizedPlan.collectLeaves()
      .map(_.stats.sizeInBytes).sum
    // SMALL-GRAPH REGIME, chosen ONCE (values are identical in both
    // regimes — the contribution sums are order-independent fixed-point
    // integers): below the threshold the whole recurrence runs on ONE
    // partition — per-task/per-job scheduling, not data, dominates a
    // small graph, and 32 shuffle partitions × stages × iterations of
    // near-empty tasks cost more than the compute (measured: the sf0.1
    // 1600-node graph spent ~2 s scheduling ~300 tasks). Above the
    // threshold: cluster-scale partitioning and shuffle_hash — a
    // |V|-row build side must never broadcast at 1e9 nodes.
    val small = inputBytes <= BigInt(smallGraphThreshold)
    // Single-partition exact-stats LEAVES ([[org.apache.spark.sql.graft
    // .bridge.localCheckpointWithStats]]) compose with the shuffle_hash
    // hint into the best small-graph plan possible: SinglePartition
    // satisfies every clustering requirement, so the iteration joins
    // and aggregates run exchange-free as single-task stages. Leaves —
    // not cached views — because (a) the analyzer's relation dedup can
    // miss the cache lookup on one side of the self-referencing outer
    // join and silently re-plan the whole subtree with its 32-partition
    // exchanges, and (b) EnsureRequirements force-re-shuffles any
    // SinglePartition child whose ESTIMATED logical size exceeds
    // spark.sql.maxSinglePartitionBytes (SPARK-41986) — stock stats
    // here are estimate-inflated (explode over collect_set, join size
    // products), so only measured-stats leaves keep the guard honest
    // AND the plan single-partition. The node set derives from the
    // edge leaf in one task (union→coalesce→distinct, no exchange) and
    // |V| rides the checkpoint materialization — the 32-partition
    // node cache is never built in this regime. Checkpoint block
    // cleanup rides the ContextCleaner when the frames are dropped.
    val vHint = "shuffle_hash"
    // The small branch plans its internal actions with the SPARK-41986
    // guard lifted: `spark.sql.maxSinglePartitionBytes` re-shuffles any
    // single-partition child whose ESTIMATED size exceeds it, and
    // size-only join estimation (size(L)·size(R) without column stats)
    // makes every post-join subtree look like tens of GB for a
    // MB-sized graph. The guard's job — "don't serialize big data
    // through one task" — is already done here by the driver-side
    // input-bytes check above, so lifting it inside this scope is the
    // guard's own contract, not a bypass. Session-conf mutation is
    // scoped by try/finally; like [[graft.core.Caches]], concurrent
    // multi-tenant sessions would need a session-isolated wrapper.
    def withGuardLifted[T](f: => T): T = {
      val spark = edges.sparkSession
      val key = "spark.sql.maxSinglePartitionBytes"
      val old = spark.conf.getOption(key)
      spark.conf.set(key, Long.MaxValue)
      try f
      finally old match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
    val (eJ, nodesJ, nL) =
      if (small) withGuardLifted {
        val (eS, _) = org.apache.spark.sql.graft.bridge
          .localCheckpointWithStats(ePlan.coalesce(1))
        val (nS, nCnt) = org.apache.spark.sql.graft.bridge
          .localCheckpointWithStats(
            eS.select(col("src").as("node"))
              .union(eS.select(col("dst").as("node")))
              .coalesce(1).distinct())
        (eS, nS, nCnt)
      } else {
        val e = Caches.track(ePlan)
        val nodes = Caches.track(e.select(col("src").as("node"))
          .union(e.select(col("dst").as("node"))).distinct())
        (e, nodes, nodes.count())
      }
    val n = nL.toDouble
    var pr = nodesJ.select(col("node"), lit(1.0 / n).as("pr"))
    var i = 0
    while (i < iters) {
      // each rank layer is referenced exactly ONCE (by the next
      // iteration's join), so the recurrence is a linear plan computed
      // once by the consuming action — no persist needed (unlike label
      // propagation, whose label vector is referenced twice per round).
      val contrib = eJ.join(pr.hint(vHint), eJ("src") === pr("node"))
        .select(col("dst"),
          floor((col("pr") / col("od").cast("double")) * lit(Scale)).as("q"))
      val sums0 = contrib.groupBy(col("dst").as("node")).agg(sum(col("q")).as("sq"))
      // small branch: re-assert SinglePartition on the aggregate (the
      // SHJ underneath reports a composite PartitioningCollection that
      // fails the outer join's co-partitioning check) — narrow no-op
      val sums = if (small) sums0.coalesce(1) else sums0
      pr = nodesJ.join(sums.hint(vHint), Seq("node"), "left")
        .select(col("node"),
          (lit((1.0 - damping) / n) + lit(damping) *
            (coalesce(col("sq"), lit(0L)).cast("double") / lit(Scale))).as("pr"))
      i += 1
      if (small) {
        // checkpoint EVERY layer, last included: (a) a rank layer
        // nesting an outer-join subtree on the next round's build side
        // defeats the planner's co-partitioning analysis even with
        // accurate stats (exchanges cascade back in); (b) the caller's
        // consuming action plans OUTSIDE the lifted-guard scope, so a
        // lazy last layer would re-shuffle there. Each checkpoint is a
        // ~ms single-task job; the returned frame is a ready
        // single-partition leaf.
        pr = withGuardLifted {
          org.apache.spark.sql.graft.bridge.localCheckpointWithStats(pr)._1 }
      } else if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < iters)
        pr = pr.localCheckpoint()
    }
    pr
  }
}
