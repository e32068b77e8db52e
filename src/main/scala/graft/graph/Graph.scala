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
    * rank vector on src (one key shuffle), aggregate on dst (second
    * shuffle), outer-join back to the node set. Each iteration's result
    * is PERSISTED and the previous one released: without it the
    * recurrence is referenced twice per step and the lazy plan doubles
    * every iteration (the label-propagation lesson, SURVEY §8). Dangling
    * nodes (no out-edges) simply don't contribute — the simple PageRank
    * variant; document, don't redistribute.
    *
    * The edge/node working sets are unpersisted before returning; the
    * final rank vector stays cached (it is the result) but is registered
    * with [[graft.core.Caches]], so the harness's releaseCaches() hook
    * frees it after the consuming action.
    *
    * Returns (node, pr) for every node in the edge list. */
  def pageRank(edges: DataFrame, src: Column, dst: Column, iters: Int,
               damping: Double = 0.85): DataFrame = {
    val Scale = 1000000000000.0 // 10^12 fixed-point
    val e = edges.select(src.cast("long").as("src"), dst.cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct().persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("od"))
    // lazy 1-row N — broadcast, never a driver-side count()
    val nRow = nodes.agg(count(lit(1)).cast("double").as("n_nodes"))
    var pr = nodes.crossJoin(broadcast(nRow))
      .select(col("node"), (lit(1.0) / col("n_nodes")).as("pr")).persist()
    var i = 0
    while (i < iters) {
      val contrib = e.join(pr, e("src") === pr("node"))
        .join(outdeg, "src")
        .select(col("dst"),
          floor((col("pr") / col("od").cast("double")) * lit(Scale)).as("q"))
      val sums = contrib.groupBy(col("dst").as("node")).agg(sum(col("q")).as("sq"))
      val next = nodes.join(sums, Seq("node"), "left")
        .crossJoin(broadcast(nRow))
        .select(col("node"),
          (lit(1.0 - damping) / col("n_nodes") + lit(damping) *
            (coalesce(col("sq"), lit(0L)).cast("double") / lit(Scale))).as("pr"))
        .persist()
      next.count() // materialize before releasing the previous vector
      pr.unpersist(blocking = false)
      pr = next
      i += 1
    }
    e.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    graft.core.Caches.adopt(pr)
  }
}
