package graft.agg

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Time-series resampling: dense grid, carry-forward semantics, argmax
  * tie-breaks, null hygiene. */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600000000L // one hour in micros

  private def ts(hour: Int, minute: Int = 0): java.sql.Timestamp =
    new java.sql.Timestamp((hour * 3600L + minute * 60L) * 1000L)

  test("fills gaps per key with the last observation and flags observed buckets") {
    val df = Seq(
      (1L, ts(0), Some(10.0)),   // bucket 0
      (1L, ts(3), Some(40.0)),   // bucket 3 — buckets 1, 2 must fill with 10.0
      (2L, ts(1), Some(7.0)))    // key 2 spans a single bucket
      .toDF("k", "t", "v")
    val out = TimeSeries.resampleForwardFill(df, col("k"), col("t"), col("v"), H)
      .orderBy("k", "bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 0L, 10.0, 1L), (1L, 1L, 10.0, 0L), (1L, 2L, 10.0, 0L),
      (1L, 3L, 40.0, 1L), (2L, 1L, 7.0, 1L)))
  }

  test("within a bucket the LATEST observation wins; ts ties break to the larger value") {
    val df = Seq(
      (1L, ts(0, 10), 1.0), (1L, ts(0, 50), 5.0), // later minute wins
      (2L, ts(0, 20), 3.0), (2L, ts(0, 20), 9.0)) // exact tie → larger value
      .toDF("k", "t", "v")
    val out = TimeSeries.resampleForwardFill(df, col("k"), col("t"), col("v"), H)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
    assert(out == Set((1L, 5.0), (2L, 9.0)))
  }

  test("interpolation lerps interior gaps and keeps observed values exact") {
    val df = Seq(
      (1L, ts(0), 10.0),
      (1L, ts(3), 40.0)) // buckets 1, 2 lerp to 20.0, 30.0
      .toDF("k", "t", "v")
    val out = TimeSeries.resampleInterpolate(df, col("k"), col("t"), col("v"), H)
      .orderBy("bucket")
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(out.toSeq == Seq((0L, 10.0, 1L), (1L, 20.0, 0L), (2L, 30.0, 0L), (3L, 40.0, 1L)))
  }

  test("pre-1970 timestamps bucket by FLOOR division (negative epochs land one bucket lower)") {
    // -30 min = epoch micros -1.8e9 → hourly bucket -1 under floor
    // division; truncation toward zero would (wrongly) give bucket 0 and
    // merge it with the 0..1h bucket — the oracle mirrors the floor form
    val df = Seq(
      (1L, new java.sql.Timestamp(-1800L * 1000), 5.0), // 1969-12-31 23:30
      (1L, ts(0, 30), 7.0))
      .toDF("k", "t", "v")
    val out = TimeSeries.resampleForwardFill(df, col("k"), col("t"), col("v"), H)
      .orderBy("bucket")
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(out.toSeq == Seq((-1L, 5.0, 1L), (0L, 7.0, 1L)))
  }

  test("null values, keys, and timestamps are not observations") {
    val df = Seq(
      (Some(1L), Some(ts(0)), Some(2.0)),
      (Some(1L), Some(ts(1)), None),         // null value → bucket 1 filled, not observed
      (None, Some(ts(0)), Some(9.0)),        // null key dropped
      (Some(3L), None, Some(9.0)))           // null ts dropped
      .toDF("k", "t", "v")
    val out = TimeSeries.resampleForwardFill(df, col("k"), col("t"), col("v"), H)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 0L, 2.0, 1L)))
  }

  test("observations past b0 + maxBuckets - 1 are discarded — junk ts can't explode the grid") {
    // obs at buckets 0, 5 and 1,000,000 (a junk timestamp ~114 years
    // out): unclamped, the grid would be 1,000,001 rows for this key;
    // clamped, the junk observation is dropped and the grid still ends
    // at an OBSERVED bucket (no trailing synthetic stretch)
    val df = Seq(
      (1L, ts(0), 2.0),
      (1L, ts(5), 4.0),
      (1L, new java.sql.Timestamp(1000000L * 3600 * 1000), 9.0))
      .toDF("k", "t", "v")
    val out = TimeSeries.resampleForwardFill(df, col("k"), col("t"), col("v"), H,
      maxBuckets = 10L)
      .orderBy("bucket")
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(out.length == 6, "grid must end at the last kept observation")
    assert(out.head == ((0L, 2.0, 1L)) && out.last == ((5L, 4.0, 1L)))
    // lerp stays total: every grid bucket has both neighbors
    val lerp = TimeSeries.resampleInterpolate(df, col("k"), col("t"), col("v"), H,
      maxBuckets = 10L)
      .orderBy("bucket").collect().map(r => r.getDouble(2))
    assert(lerp.toSeq == Seq(2.0, 2.4, 2.8, 3.2, 3.6, 4.0))
  }
}
