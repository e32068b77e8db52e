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

  test("cusum finds the level-shift boundary with exact integer drift") {
    // 0,0,0,10,10,10 — the max |C_i·n − i·S| lands on the last
    // pre-shift point (i = 3); drift mass = 3·3/6·Δ = 15.0
    val df = (0 until 6).map(h => (1L, ts(h), if (h < 3) 0.0 else 10.0))
      .toDF("k", "t", "v")
    val r = TimeSeries.cusumChangepoint(df, col("k"), col("t"),
      monotonically_increasing_id(), col("v")).collect().head
    assert(r.getLong(1) == 6L)                  // n
    assert(r.getLong(2) == 2L * 3600000000L)    // cp_t = third point
    assert(r.getLong(3) == 3L)                  // cp_index
    assert(r.getDouble(4) == 15.0)              // max_drift
    assert(r.getDouble(5) == 0.0)               // mean_left
    assert(r.getDouble(6) == 10.0)              // mean_right
  }

  test("cusum: null value/ts rows are not observations; a 1-point series has NULL mean_right") {
    val df = Seq(
      (1L, Some(ts(0)), Some(5.0)),
      (1L, Some(ts(1)), None),      // null value dropped
      (1L, None, Some(7.0)))        // null ts dropped
      .toDF("k", "t", "v")
    val r = TimeSeries.cusumChangepoint(df, col("k"), col("t"),
      monotonically_increasing_id(), col("v")).collect().head
    assert(r.getLong(1) == 1L && r.getLong(3) == 1L)
    assert(r.getDouble(4) == 0.0 && r.getDouble(5) == 5.0)
    assert(r.isNullAt(6)) // i = n — no right segment
  }

  test("cusum argmax ties break to the earliest (ts, id)") {
    // symmetric series: drift numerator ties at i=1 and i=3 — the
    // earlier timestamp must win deterministically
    val df = Seq((1L, ts(0), 0.0), (1L, ts(1), 10.0), (1L, ts(2), 0.0),
      (1L, ts(3), 10.0)).toDF("k", "t", "v")
    val r = TimeSeries.cusumChangepoint(df, col("k"), col("t"),
      monotonically_increasing_id(), col("v")).collect().head
    assert(r.getLong(3) == 1L, "tie must break to the earliest point")
  }

  test("ewma: sequential dyadic fold in (ts, id) order; single point = itself") {
    // 1, 2, 3 in cents: 100 -> 125 -> 168.75 -> 1.6875
    val df = Seq((1L, ts(0), 1.0), (1L, ts(1), 2.0), (1L, ts(2), 3.0),
      (2L, ts(0), 7.0)).toDF("k", "t", "v")
    val out = TimeSeries.ewma(df, col("k"), col("t"),
      monotonically_increasing_id(), col("v"))
      .orderBy("k").collect()
    assert(out(0).getLong(1) == 3L)
    assert(out(0).getDouble(2) == 3.0)      // last_value
    assert(out(0).getDouble(3) == 1.6875)   // exact dyadic fold
    assert(out(1).getDouble(3) == 7.0)      // seed = sole observation
  }

  test("theilSen: exact median of pairwise daily-count slopes; 1-day keys drop") {
    // key 1: days 0/1/2 with 1/3/5 events — all slopes = 2.0
    // key 2: a single active day — no pair, no row
    val rows =
      Seq.fill(1)((1L, ts(0))) ++ Seq.fill(3)((1L, ts(24))) ++
      Seq.fill(5)((1L, ts(48))) ++ Seq.fill(4)((2L, ts(0)))
    val out = TimeSeries.theilSen(rows.toDF("k", "t"), col("k"), col("t"))
      .collect()
    assert(out.length == 1 && out.head.getLong(0) == 1L)
    assert(out.head.getLong(1) == 3L)         // pairs
    assert(out.head.getDouble(2) == 2.0)
    // even pair count averages the two middles: days 0/1/2/3 with
    // counts 1/3/5/100 -> sorted slopes [2,2,2,33,48.5,95] -> 17.5
    val rows2 = rows.filter(_._1 == 1L) ++ Seq.fill(100)((1L, ts(72)))
    val o2 = TimeSeries.theilSen(rows2.toDF("k", "t"), col("k"), col("t"))
      .head()
    assert(o2.getLong(1) == 6L && o2.getDouble(2) == 17.5)
  }

  test("markovTransitions: per-user lag pairs, exact row-conditional probabilities") {
    // user 1: A B A B -> A->B x2, B->A x1; user 2: B B -> B->B x1;
    // first events transition from nothing and are excluded
    val df = Seq((1L, ts(0), "A"), (1L, ts(1), "B"), (1L, ts(2), "A"),
      (1L, ts(3), "B"), (2L, ts(0), "B"), (2L, ts(1), "B"))
      .toDF("u", "t", "typ")
    val out = TimeSeries.markovTransitions(df, col("u"), col("t"),
        monotonically_increasing_id(), col("typ"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out.size == 3)
    assert(out(("A", "B")) == ((2L, 2L, 1.0)))
    assert(out(("B", "A")) == ((1L, 2L, 0.5)))
    assert(out(("B", "B")) == ((1L, 2L, 0.5)))
  }

  test("pettitt locates the rank-shift point with exact U; all-tied series gives U = 0") {
    // 0,0,0,10,10,10: s = rank_asc − rank_desc = −3 for the zeros,
    // +3 for the tens → U = −3,−6,−9,−6,−3 over t = 1..5 (U₆ ≡ 0
    // excluded); argmax |U| = 9 at i = 3, the last pre-shift point
    val df = (0 until 6).map(h => (1L, ts(h), if (h < 3) 0.0 else 10.0))
      .toDF("k", "t", "v")
    val r = TimeSeries.pettitt(df, col("k"), col("t"),
      monotonically_increasing_id(), col("v")).collect().head
    assert(r.getLong(1) == 6L)               // n
    assert(r.getLong(2) == 2L * 3600000000L) // cp_t = third point
    assert(r.getLong(3) == 3L)               // cp_index
    assert(r.getLong(4) == 9L)               // u_stat
    assert(math.abs(r.getDouble(5) - 6.0 * 81.0 / (216.0 + 36.0)) < 1e-12)
    // constant series: every sgn term is 0, argmax ties to t = 1
    val c = (0 until 4).map(h => (1L, ts(h), 5.0)).toDF("k", "t", "v")
    val rc = TimeSeries.pettitt(c, col("k"), col("t"),
      monotonically_increasing_id(), col("v")).collect().head
    assert(rc.getLong(4) == 0L && rc.getLong(3) == 1L)
  }
}
