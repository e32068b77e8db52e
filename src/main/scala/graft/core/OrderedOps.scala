package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Order-sensitive transducer twins (SURVEY.md §2.2, §7.1 step 4).
  *
  * In the reference these operators (`dedupe`, `take`, `drop`,
  * `take-while`, `partition-by`, `map-indexed`) get their meaning from
  * Kafka's per-partition offset order — record-at-a-time processing
  * (reference: src/kafka_streams_clojure/api.clj:20-25). Spark does not
  * preserve intra-batch row order, so every operator here takes EXPLICIT
  * ordering columns (SURVEY.md §1.3.5) — the analogue of
  * `(partition, offset)` — and is implemented with window functions so the
  * work stays distributed (one shuffle on the partition key, no driver
  * loops).
  *
  * Scale posture: all windows are partitioned (`partitionBy(keys)`), never
  * global, except the explicitly-global `mapIndexed`/`take`/`drop` forms
  * whose single-partition sort is documented as the price of a global
  * order (use the per-key forms at 100 TB).
  */
object OrderedOps {

  private def w(partition: Seq[Column], order: Seq[Column]) =
    if (partition.isEmpty) Window.orderBy(order: _*)
    else Window.partitionBy(partition: _*).orderBy(order: _*)

  /** `dedupe` twin: drop CONSECUTIVE duplicates of `valueCol` within each
    * partition, consecutive in `order`. (`distinct` is global; this is the
    * run-length form.) */
  def dedupe(df: DataFrame, valueCol: Column, partition: Seq[Column], order: Seq[Column]): DataFrame = {
    val prev = lag(valueCol, 1).over(w(partition, order))
    df.withColumn("__prev", prev)
      .filter(col("__prev").isNull || col("__prev") =!= valueCol)
      .drop("__prev")
  }

  /** `map-indexed` twin: attach a 1-based position in `order` (optionally
    * per partition). */
  def mapIndexed(df: DataFrame, partition: Seq[Column], order: Seq[Column], as: String = "idx"): DataFrame =
    df.withColumn(as, row_number().over(w(partition, order)))

  /** `take n` twin over an explicit order (per partition if keys given). */
  def takeOrdered(df: DataFrame, n: Int, partition: Seq[Column], order: Seq[Column]): DataFrame =
    mapIndexed(df, partition, order, "__rn").filter(col("__rn") <= n).drop("__rn")

  /** `drop n` twin. */
  def dropOrdered(df: DataFrame, n: Int, partition: Seq[Column], order: Seq[Column]): DataFrame =
    mapIndexed(df, partition, order, "__rn").filter(col("__rn") > n).drop("__rn")

  /** `take-while pred` twin: the maximal prefix (in `order`) where `pred`
    * holds — i.e., rows strictly before the first failing row. */
  def takeWhile(df: DataFrame, pred: Column, partition: Seq[Column], order: Seq[Column]): DataFrame = {
    val ww = w(partition, order)
    df.withColumn("__fail", when(!coalesce(pred, lit(false)), lit(1)).otherwise(lit(0)))
      .withColumn("__fails", sum(col("__fail")).over(ww.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("__fails") === 0)
      .drop("__fail", "__fails")
  }

  /** `drop-while pred` twin: everything from the first failing row on. */
  def dropWhile(df: DataFrame, pred: Column, partition: Seq[Column], order: Seq[Column]): DataFrame = {
    val ww = w(partition, order)
    df.withColumn("__fail", when(!coalesce(pred, lit(false)), lit(1)).otherwise(lit(0)))
      .withColumn("__fails", sum(col("__fail")).over(ww.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("__fails") > 0)
      .drop("__fail", "__fails")
  }

  /** `partition-by f` twin: assign a run id that increments whenever
    * `runCol` changes (consecutive in `order`, within `partition`).
    * Downstream can `groupBy(partition :+ runId)` to aggregate runs —
    * the distributed form of collecting runs into vectors. */
  def partitionByRuns(df: DataFrame, runCol: Column, partition: Seq[Column], order: Seq[Column],
                      as: String = "run_id"): DataFrame = {
    val ww = w(partition, order)
    val changed = when(lag(runCol, 1).over(ww).isNull ||
      lag(runCol, 1).over(ww) =!= runCol, lit(1)).otherwise(lit(0))
    df.withColumn("__chg", changed)
      .withColumn(as, sum(col("__chg")).over(ww.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__chg")
  }

  /** `partition-all n` twin: fixed-size chunk id in `order`. */
  def partitionAll(df: DataFrame, n: Int, partition: Seq[Column], order: Seq[Column],
                   as: String = "chunk_id"): DataFrame =
    mapIndexed(df, partition, order, "__rn")
      .withColumn(as, floor((col("__rn") - 1) / n).cast("long"))
      .drop("__rn")

  /** `interpose` twin: flag rows after which a separator would go — niche;
    * expressed as lead-existence so it stays declarative. */
  def interposeFlag(df: DataFrame, partition: Seq[Column], order: Seq[Column],
                    as: String = "has_next"): DataFrame =
    df.withColumn(as, lead(lit(1), 1).over(w(partition, order)).isNotNull)
}
