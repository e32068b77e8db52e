package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grouped + windowed aggregation (SURVEY.md §2.3).
  *
  * The reference declares (roadmap) but does not implement windowed
  * aggregates and KTable changelog views (reference: README.md:30-34, 69);
  * its store protocol implies a materializing topology
  * (reference: api.clj:102-152). Here they are first-class:
  * hash-aggregate with map-side partial aggregation (Spark's default — one
  * shuffle on the group keys, partials combined before the exchange, which
  * is what makes these plans hold at 100 TB).
  */
object Aggregates {

  /** Re-key + grouped aggregation — the `key-value-mapper` → `groupByKey`
    * → aggregate path (reference: api.clj:96-100). The shuffle on `keys`
    * is the analogue of Kafka Streams' repartition topic. */
  def grouped(df: DataFrame, keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)

  /** Tumbling event-time window aggregation (batch twin of
    * `groupBy(window(...))`; streaming twin in [[graft.streaming]]). */
  def tumbling(df: DataFrame, ts: Column, size: String, keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(window(ts, size) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")

  /** Hopping (sliding) window aggregation. */
  def hopping(df: DataFrame, ts: Column, size: String, slide: String,
              keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(window(ts, size, slide) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")

  /** Session window aggregation (gap-based). */
  def session(df: DataFrame, ts: Column, gap: String, keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(session_window(ts, gap) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("session_start", col("session_window.start"))
      .withColumn("session_end", col("session_window.end"))
      .drop("session_window")

  /** KTable/changelog view: latest value per key by event time
    * (reference roadmap: README.md:33-34, 69). `max_by` over the
    * (ts, tieBreak...) struct — a hash-aggregate with map-side combine,
    * NOT a window: no per-partition sort, partial top-1s merge before the
    * single shuffle, and skewed keys reduce map-side first. The struct
    * order makes the pick total, so ties are deterministic (largest
    * tieBreak wins, matching ORDER BY ts DESC, tieBreak DESC LIMIT 1). */
  def latestByKey(df: DataFrame, keys: Seq[Column], ts: Column, tieBreak: Seq[Column]): DataFrame =
    df.groupBy(keys: _*)
      .agg(max_by(struct(df.columns.toIndexedSeq.map(col): _*), struct(ts +: tieBreak: _*)).as("__latest"))
      .select(col("__latest.*"))

  /** Grouping-sets family — free in Spark, absent in the reference
    * (SURVEY.md §2.4). */
  def rollupAgg(df: DataFrame, keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.rollup(keys: _*).agg(aggs.head, aggs.tail: _*)

  def cubeAgg(df: DataFrame, keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.cube(keys: _*).agg(aggs.head, aggs.tail: _*)

  /** Top-k per group — agg-side alternative to a global sort. */
  def topKPerGroup(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k).drop("__rn")
  }
}
