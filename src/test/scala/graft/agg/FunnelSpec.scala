package graft.agg

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Funnel semantics the window-min rewrite must preserve: strict
  * causality between steps, NULL-key users completing step 1 but never
  * advancing, and re-ordered events not counting. */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): java.sql.Timestamp =
    new java.sql.Timestamp(minute * 60000L)

  private def run(rows: Seq[(Option[Long], java.sql.Timestamp, String)]) =
    Funnel.funnel(rows.toDF("user_id", "ts", "event_type"),
        col("user_id"), col("ts"), col("event_type"),
        Seq("view", "click", "purchase"))
      .collect()
      .map(r => (Option(r.get(0)).map(_.asInstanceOf[Long]),
        (1 to 3).map(i => Option(r.get(i)).map(_.toString)).toList,
        r.getInt(4)))
      .toSet

  test("each step must STRICTLY follow its predecessor (re-orderings do not count)") {
    val out = run(Seq(
      // user 1: click BEFORE the first view — stage stops at 1
      (Some(1L), ts(5), "click"), (Some(1L), ts(10), "view"),
      // user 2: full ordered funnel, with an early purchase that must
      // not count (it precedes the click)
      (Some(2L), ts(0), "view"), (Some(2L), ts(1), "purchase"),
      (Some(2L), ts(2), "click"), (Some(2L), ts(3), "purchase"),
      // user 3: never views — absent from the output entirely
      (Some(3L), ts(0), "click"), (Some(3L), ts(1), "purchase")))
    assert(out.map(t => (t._1, t._3)) == Set(
      (Some(1L), 1), (Some(2L), 3)))
    // user 2's purchase time is the LATER one (strictly after the click)
    val u2 = out.find(_._1 == Some(2L)).get._2
    assert(u2(2).get.contains("00:03"), s"t3 must be the post-click purchase: $u2")
  }

  test("a step ties with its predecessor's timestamp -> strict > rejects it") {
    val out = run(Seq(
      (Some(1L), ts(0), "view"), (Some(1L), ts(0), "click"),
      (Some(1L), ts(1), "click")))
    // the t=0 click is NOT after the view; the t=1 click is
    val u1 = out.find(_._1 == Some(1L)).get
    assert(u1._3 == 2 && u1._2(1).get.contains("00:01"), s"$u1")
  }

  test("NULL-key users complete step 1 but never advance (the equi-join discipline)") {
    val out = run(Seq(
      (None, ts(0), "view"), (None, ts(1), "click"), (None, ts(2), "purchase")))
    assert(out == Set((None, List(Some(ts(0).toString), None, None), 1)))
  }

  test("earliest qualifying time per step, regardless of event order in the data") {
    val out = run(Seq(
      (Some(1L), ts(9), "click"), (Some(1L), ts(2), "view"),
      (Some(1L), ts(4), "click"), (Some(1L), ts(1), "view")))
    val u1 = out.find(_._1 == Some(1L)).get
    // t1 = min view (t=1); t2 = earliest click after t=1 (t=4, not t=9)
    assert(u1._2(0).get.contains("00:01") && u1._2(1).get.contains("00:04")
      && u1._3 == 2, s"$u1")
  }

  test("retention: cohort by first period, distinct users per offset, multi-event weeks dedup") {
    // period = 100 minutes (6e9 µs). user 1 active p0, p1, p1, p3;
    // user 2 active p0, p1; user 3 joins at p1, active p1 only
    val p = 6000000000L
    def at(period: Int, min: Int) = ts(period * 100 + min)
    val ev = Seq(
      (1L, at(0, 1)), (1L, at(1, 2)), (1L, at(1, 50)), (1L, at(3, 0)),
      (2L, at(0, 5)), (2L, at(1, 9)),
      (3L, at(1, 7))).toDF("user_id", "ts")
    val out = Funnel.retention(ev, col("user_id"), col("ts"), periodMicros = p)
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set(
      (0L, 0L, 2L),  // cohort p0: users 1,2 at offset 0
      (0L, 1L, 2L),  // both return in p1 (user 1's two p1 events count once)
      (0L, 3L, 1L),  // only user 1 reaches offset 3
      (1L, 0L, 1L))) // user 3's cohort starts at p1
  }
}
