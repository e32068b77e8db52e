package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.LogicalRDD

/** Column ⇄ Catalyst Expression bridge.
  *
  * Spark 4 made `Column` a connect-compatible facade; the classic
  * conversions live behind `private[sql]` (`org.apache.spark.sql.classic.
  * ExpressionUtils`). This object sits inside the `org.apache.spark.sql`
  * package solely to re-export those two conversions to graft's custom
  * expressions — the standard extension-library technique.
  */
object bridge {
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)

  /** `Dataset.localCheckpoint` with EXACT statistics: materializes the
    * frame eagerly into an executor-local RDD leaf (lineage truncated,
    * partitioning preserved) and stamps the leaf with the measured row
    * count and a row-width-derived size, returning the leaf and the
    * count.
    *
    * Why the stock API is not enough: `Dataset.localCheckpoint` carries
    * the SOURCE plan's ESTIMATED stats onto the leaf, and
    * estimate-inflating operators upstream (explode over collect_set —
    * defaultSize of an array column) can claim gigabytes for a
    * megabyte-sized frame. Spark's EnsureRequirements keeps a
    * SinglePartition child un-shuffled only while
    * `logicalLink.stats.sizeInBytes <= spark.sql.maxSinglePartitionBytes`
    * (the SPARK-41986 parallelism guard), so a small single-partition
    * frame with inflated inherited stats gets force-re-shuffled to the
    * session shuffle partitions — exactly what the small-graph regime
    * of [[graft.graph.Graph.pageRank]] must avoid. Stamping the true
    * size keeps the guard functional (a frame that really is huge still
    * triggers it) while letting genuinely small frames keep their
    * single-partition plans. */
  def localCheckpointWithStats(df: DataFrame): (DataFrame, Long) = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val qe = df.queryExecution
    // mirror Dataset.checkpoint: copy the reused unsafe rows before
    // they leave the operator pipeline, then pin executor-local blocks
    val rdd = qe.executedPlan.execute().map(_.copy()).localCheckpoint()
    val cnt = rdd.count()
    val rowWidth = 8L + df.schema.fields.map(_.dataType.defaultSize.toLong + 8L).sum
    val stats = Statistics(sizeInBytes = BigInt(cnt) * rowWidth,
      rowCount = Some(BigInt(cnt)))
    val plan = LogicalRDD(qe.analyzed.output, rdd,
      qe.executedPlan.outputPartitioning, qe.executedPlan.outputOrdering,
      isStreaming = false, None)(spark, Some(stats), None)
    (org.apache.spark.sql.classic.Dataset.ofRows(spark, plan), cnt)
  }
}
