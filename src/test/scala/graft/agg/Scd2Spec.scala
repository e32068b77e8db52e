package graft.agg

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SCD2 changelog-compaction semantics: run detection, interval close,
  * open current row, null-safe attribute runs, tie-break determinism.
  */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def hist(rows: Seq[(String, Long, String, Long)]) =
    Aggregates.scd2(rows.toDF("k", "ts", "a", "tb"),
        col("k"), col("ts"), col("a"), col("tb"))
      .as[(String, Long, String, Long, Option[Long], Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq

  test("runs collapse to intervals; last interval open; versions dense") {
    val out = hist(Seq(
      ("u", 1L, "view", 1L), ("u", 2L, "view", 2L), ("u", 3L, "click", 3L),
      ("u", 5L, "view", 4L), ("v", 9L, "buy", 5L)))
    assert(out == Seq(
      ("u", 1L, "view", 1L, Some(3L), 2L),   // 2 events, closed by click@3
      ("u", 2L, "click", 3L, Some(5L), 1L),
      ("u", 3L, "view", 5L, None, 1L),       // re-entering a prior state is a NEW version
      ("v", 1L, "buy", 9L, None, 1L)))
  }

  test("null attribute forms its own run (null-safe change detection)") {
    val out = hist(Seq(
      ("u", 1L, null, 1L), ("u", 2L, null, 2L), ("u", 3L, "x", 3L)))
    assert(out.map(r => (r._2, Option(r._3), r._6)) ==
      Seq((1L, None, 2L), (2L, Some("x"), 1L)))
  }

  test("equal timestamps ordered by tie-break — run split is deterministic") {
    val out = hist(Seq(("u", 7L, "a", 2L), ("u", 7L, "b", 1L)))
    // tb=1 ("b") sorts first, so history is b then a
    assert(out.map(_._3) == Seq("b", "a"))
  }
}
