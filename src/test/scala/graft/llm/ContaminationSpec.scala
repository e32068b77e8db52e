package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contamination detection: cross-corpus n-gram overlap + the drop-list
  * decision step. */
class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  private val bench = Seq(
    (100L, "the quick brown fox jumps"), // 3 distinct 3-grams
    (200L, "entirely disjoint benchmark text here"))
    .toDF("doc_id", "text")

  test("ngramOverlap finds verbatim spans, counts distinct n-grams once, scales frac by the bench side") {
    val train = Seq(
      // shares "the quick brown" + "quick brown fox" with bench 100 —
      // and repeats the span, which must NOT double-count (per-doc
      // distinct n-grams on both sides)
      (1L, "a b the quick brown fox c the quick brown fox"),
      // SAME doc_id split over a second row re-sharing "the quick
      // brown": with multiRowTrainDocs dedup is per (doc, n-gram)
      // ACROSS rows — n_shared must stay 2, not 3 (the oracle's
      // SELECT DISTINCT semantics)
      (1L, "z z the quick brown z"),
      (2L, "the quick brown only"), // 1 shared 3-gram — below minShared=2
      (3L, "nothing in common at all"))
      .toDF("doc_id", "text")
    val out = Contamination.ngramOverlap(train, col("doc_id"), col("text"),
        bench, col("doc_id"), col("text"), w = 3, minShared = 2,
        multiRowTrainDocs = true)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(r.fieldIndex("train_id")) == 1L)
    assert(r.getLong(r.fieldIndex("bench_id")) == 100L)
    assert(r.getLong(r.fieldIndex("n_shared")) == 2L)
    // bench 100 has 3 distinct 3-grams; 2 leak
    assert(r.getDouble(r.fieldIndex("frac")) == 2.0 / 3.0)
  }

  test("contaminatedIds keeps the worst leak per training doc") {
    val train = Seq(
      (1L, "the quick brown fox jumps high"), // 3/3 vs bench 100
      (1L, "x"), // extra benign row for same id is fine upstream
      (4L, "entirely disjoint benchmark text here too")) // 4/4 vs bench 200
      .toDF("doc_id", "text")
    val ov = Contamination.ngramOverlap(train, col("doc_id"), col("text"),
      bench, col("doc_id"), col("text"), w = 3, minShared = 2)
    val ids = Contamination.contaminatedIds(ov)
      .orderBy(col("train_id")).collect()
    assert(ids.map(_.getLong(0)).toSeq == Seq(1L, 4L))
    val worst = ids.map(r => r.getDouble(r.fieldIndex("worst_frac")))
    assert(worst(0) == 1.0 && worst(1) == 1.0)
    assert(ids.forall(r => r.getLong(r.fieldIndex("n_bench_hit")) == 1L))
  }

  test("streamingFlags equals ngramOverlap's pair set on the same data, stateless") {
    val train = Seq(
      (1L, "a b the quick brown fox c the quick brown fox"),
      (2L, "the quick brown only"),
      (3L, "nothing in common at all"))
      .toDF("doc_id", "text")
    val ng = Contamination.benchNgrams(bench, col("doc_id"), col("text"), w = 3)
    val flags = Contamination.streamingFlags(train, col("doc_id"), col("text"),
        ng, w = 3, minShared = 2)
      .select("train_id", "bench_id", "n_shared").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = Contamination.ngramOverlap(train, col("doc_id"), col("text"),
        bench, col("doc_id"), col("text"), w = 3, minShared = 2)
      .select("train_id", "bench_id", "n_shared").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(flags == batch && flags == Set((1L, 100L, 2L)))
  }

  test("streamingFlags runs over a MemoryStream micro-batch (append, no state)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val ng = Contamination.benchNgrams(bench, col("doc_id"), col("text"), w = 3)
    val out = Contamination.streamingFlags(ms.toDF().toDF("doc_id", "text"),
      col("doc_id"), col("text"), ng, w = 3, minShared = 2)
    val q = out.writeStream.format("memory").queryName("contam_flags")
      .outputMode("append").start()
    ms.addData((7L, "x the quick brown fox y"), (8L, "clean document"))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("contam_flags")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows == Set((7L, 100L)), s"got $rows")
  }

  test("no pairs at or below threshold and short docs yield empty output") {
    val train = Seq((1L, "ab"), (2L, "")).toDF("doc_id", "text")
    val out = Contamination.ngramOverlap(train, col("doc_id"), col("text"),
      bench, col("doc_id"), col("text"), w = 3, minShared = 1)
    assert(out.count() == 0)
  }
}
