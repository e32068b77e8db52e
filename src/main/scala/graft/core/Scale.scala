package graft.core

import org.apache.spark.sql.SparkSession

/** Scale-adaptive session tuning (guide §2.6): one place for the two
  * input-size-derived knobs every runner shares, so Bench, JudgeProbe
  * and PlanDump measure the same policy the engine would run with.
  *
  * - AQE is a runtime trade: stage-wise execution + re-planning costs a
  *   measured ~0.3 s of barrier latency per shuffle query and pays for
  *   itself (skew split, runtime coalesce) only when stages process
  *   enough data to dwarf that. Enabled when the largest input table
  *   crosses [[AqeRowThreshold]]; plan SHAPES are identical either way
  *   (PlanSpec asserts them with AQE on).
  * - Below that threshold AQE cannot coalesce, so a fixed
  *   shuffle-partition count equal to the core count over-partitions
  *   tiny shuffles: the r16 driver scaling block showed 11 queries
  *   FASTER at 8 cores than 32 (worst q_item_cf 0.21x) purely from
  *   32-way task/partition overhead on sub-MB shuffles. Derive the
  *   partition count from the input size instead — rows/[[
  *   RowsPerPartition]] clamped to [[MinPartitions]]..cores — so the
  *   setting scales with the data rather than the machine. At lake
  *   scale the AQE branch governs and this one never fires; on a real
  *   cluster the starting partition count stays the core count and
  *   AQE's advisory size does the coalescing.
  */
object Scale {
  val AqeRowThreshold = 5000000L
  /** Target rows per post-shuffle partition below the AQE threshold —
    * small enough that a skew-free aggregate stays parallel, large
    * enough that per-task scheduling overhead stops dominating. */
  val RowsPerPartition = 50000L
  val MinPartitions = 8

  /** Largest table row count under sfDir — the same probe Bench has
    * always used to pick the AQE mode. */
  def maxInputRows(spark: SparkSession, sfDir: String): Long = {
    var maxRows = 0L
    graft.sources.Tables.names.foreach { n =>
      try maxRows = math.max(maxRows,
        graft.sources.Tables.table(spark, sfDir, n).count())
      catch { case _: Throwable => () }
    }
    maxRows
  }

  /** Apply the scale-adaptive settings for an input of `maxRows`. */
  def configure(spark: SparkSession, maxRows: Long, cores: Int): Unit = {
    val aqe = maxRows > AqeRowThreshold
    spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
    if (!aqe) {
      val parts = math.max(MinPartitions.toLong,
        math.min(cores.toLong, (maxRows + RowsPerPartition - 1) / RowsPerPartition))
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    }
    // ObjectHashAggregate (TypedImperativeAggregate partials: GramMatrixQ,
    // TopKScoreIds, collect_set) falls back to SORT-based aggregation
    // after 128 distinct keys per task by default — which re-sorts the
    // very relation the bounded-buffer aggregates exist to avoid sorting
    // (TopKScoreIds over a |queries|-group panel would sort the 100 M-pair
    // relation again). The engine's object-agg buffers are all bounded
    // (dim² longs, k ids, ≤maxDeg sets), so 64k in-memory group buffers
    // is a few MB per task — far under executor memory at any scale.
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
      "65536")
  }
}
