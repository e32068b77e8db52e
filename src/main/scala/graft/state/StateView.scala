package graft.state

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interactive state queries (SURVEY.md §2.5).
  *
  * The reference exposes continuously-updated topology state through three
  * verbs — point `get`, full `all`, sorted `range`
  * (reference: src/kafka_streams_clojure/api.clj:102-152), served from live
  * RocksDB stores. Spark has no always-on store server; `StateView` serves
  * the same verbs as SQL over a registered table:
  *
  *  - memory-sink backend (streaming): a stateful query writes
  *    `OutputMode.Update/Complete` to `format("memory").queryName(name)`;
  *    freshness = trigger interval.
  *  - batch backend: any aggregated DataFrame registered as a temp view.
  *  - checkpoint backend: Spark 4's `format("statestore")` reader over a
  *    checkpoint dir — exact keyed state of a (stopped or running) query.
  *
  * The iterator-close obligation of the reference
  * (api.clj:106-111, 131-139) disappears: scans are DataFrames.
  */
final class StateView(spark: SparkSession, tableName: String, keyCol: String) {

  private def t: DataFrame = spark.table(tableName)

  /** Point lookup (reference: api.clj:113-116). */
  def get(key: Any): DataFrame = t.filter(col(keyCol) === lit(key))

  /** Full scan (reference: api.clj:118-122). */
  def all(): DataFrame = t

  /** Sorted inclusive key-range scan (reference: api.clj:124-129). */
  def range(from: Any, to: Any): DataFrame =
    t.filter(col(keyCol).between(lit(from), lit(to))).orderBy(col(keyCol))
}

object StateView {

  /** Register a batch DataFrame as a queryable state table. */
  def ofBatch(spark: SparkSession, df: DataFrame, name: String, keyCol: String): StateView = {
    df.createOrReplaceTempView(name)
    new StateView(spark, name, keyCol)
  }

  /** View over a streaming query's state checkpoint (batch, offline). */
  def ofCheckpoint(spark: SparkSession, checkpointDir: String, keyCol: String,
                   name: String): StateView = {
    spark.read.format("statestore").option("path", checkpointDir).load()
      .createOrReplaceTempView(name)
    new StateView(spark, name, keyCol)
  }
}
