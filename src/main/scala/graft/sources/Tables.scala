package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch sources over the driver-provided parquet tables (TESTDATA.md).
  *
  * The reference's only source is Kafka topics
  * (reference: src/kafka_streams_clojure/api.clj:57-60); the engine adds
  * file sources as first-class batch twins. Streaming sources live in
  * [[graft.streaming]].
  *
  * Scale posture: `spark.read.parquet` gives vectorized scans, predicate
  * pushdown and partition pruning for free; callers select/filter early so
  * Catalyst prunes columns at the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one table from a scale-factor directory. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` has shipped as parquet TIMESTAMP(NANOS),
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) and TIMESTAMP(MICROS, UTC)
    * across driver data generations, so adapt to the loaded schema instead
    * of assuming one physical type. The contract: callers always see a
    * native `TimestampType` `ts` whose epoch micros equal what DuckDB
    * reads from the same file.
    *
    * TIMESTAMP(NANOS) is unreadable as a timestamp by Spark 4: with the
    * legacy conf it arrives as a raw nanosecond LongType, which we truncate
    * to micros with integer division (`div` — a double division would lose
    * precision above 2^53 ns). DuckDB performs the same ns→us truncation,
    * so the two engines see identical timestamps.
    *
    * TIMESTAMP(MICROS) with isAdjustedToUTC=false arrives as
    * TIMESTAMP_NTZ, which event-time functions (`unix_micros`,
    * `window`-adjacent arithmetic) reject with DATATYPE_MISMATCH. Under
    * the UTC session timezone every entrypoint sets, casting NTZ →
    * TimestampType is a bit-identical reinterpretation of the stored
    * micros — and DuckDB's naive read of the same column yields the same
    * values, so oracle parity is exact. (Round 10 shipped the NANOS
    * branch only; the NTZ passthrough crashed q_resample/q_resample_lerp
    * on every dataset.)
    *
    * TIMESTAMP(MICROS/MILLIS, UTC) already arrives as a native
    * TimestampType and passes through unchanged. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Multi-source union — the analogue of the reference's varargs topic
    * source merged into one stream (reference: api.clj:57-60). */
  def unionAll(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_ unionByName _)
}
