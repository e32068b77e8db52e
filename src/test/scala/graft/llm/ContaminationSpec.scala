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

  test("benchNgrams dedups across rows of one bench id — multi-row bench docs flag once") {
    // bench doc 100 split over TWO rows, both re-sharing "the quick
    // brown": benchNgrams must union the rows into one (bench_id, bsg)
    // row, so streamingFlags emits ONE pair with the full count instead
    // of duplicate pairs with partial counts (round-6 ADVICE)
    val multiRowBench = Seq(
      (100L, "the quick brown fox jumps"),
      (100L, "the quick brown cat sits"))
      .toDF("doc_id", "text")
    val ng = Contamination.benchNgrams(multiRowBench, col("doc_id"), col("text"), w = 3)
    assert(ng.count() == 1, "one row per bench id")
    val train = Seq((1L, "x the quick brown fox jumps y the quick brown cat"))
      .toDF("doc_id", "text")
    val flags = Contamination.streamingFlags(train, col("doc_id"), col("text"),
        ng, w = 3, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = Contamination.ngramOverlap(train, col("doc_id"), col("text"),
        multiRowBench, col("doc_id"), col("text"), w = 3, minShared = 1)
      .select("train_id", "bench_id", "n_shared")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(flags == batch, s"flags=$flags batch=$batch")
    // shared grams: "the quick brown", "quick brown fox",
    // "brown fox jumps", "quick brown cat" — one pair, FULL count
    assert(flags == Set((1L, 100L, 4L)), s"full cross-row count: $flags")
  }

  test("postings gate inside foreachBatch: micro-batch verdicts equal the batch run") {
    // the documented deployment shape (Contamination.streamingFlagsPostings
    // scaladoc): the aggregate makes the postings form batch-shaped, so a
    // stream runs it per micro-batch from foreachBatch. Per-batch pair
    // verdicts over a multi-batch stream must union to exactly the
    // single-batch result — the per-doc aggregation never crosses docs,
    // so batch boundaries cannot change any verdict.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Seq(
      (1L, "a b the quick brown fox c the quick brown fox"),
      (2L, "the quick brown only"),
      (3L, "nothing in common at all"),
      (4L, "entirely disjoint benchmark text here and more"))
    val ng = Contamination.benchNgrams(bench, col("doc_id"), col("text"), w = 3)
    val seen = scala.collection.mutable.Set[(Long, Long, Long)]()
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = ms.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized {
          seen ++= Contamination.streamingFlagsPostings(batch,
              col("doc_id"), col("text"), ng, w = 3, minShared = 1)
            .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        }
        ()
      }
      .start()
    // two separate micro-batches (processAllAvailable between addData
    // calls forces the boundary), emulating a rate-limited source
    ms.addData(docs.take(2)); q.processAllAvailable()
    ms.addData(docs.drop(2)); q.processAllAvailable()
    q.stop()
    val batchSide = Contamination.streamingFlagsPostings(
        docs.toDF("doc_id", "text"), col("doc_id"), col("text"),
        ng, w = 3, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(seen.toSet == batchSide, s"stream=$seen batch=$batchSide")
    assert(seen.nonEmpty, "planted overlap must flag at least one pair")
  }

  test("streamingFlagsPostings equals streamingFlags on random corpora (property)") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    def doc(): String = Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    for (trial <- 0 until 5) {
      val benchR = (0 until 4).map(i => (100L + i, doc())).toDF("doc_id", "text")
      val train = (0 until 20).map(i => (i.toLong, doc())).toDF("doc_id", "text")
      val ng = Contamination.benchNgrams(benchR, col("doc_id"), col("text"), w = 2)
      def pairs(df: org.apache.spark.sql.DataFrame) = df
        .select("train_id", "bench_id", "n_shared")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val a = pairs(Contamination.streamingFlags(train, col("doc_id"),
        col("text"), ng, w = 2, minShared = 1))
      val b = pairs(Contamination.streamingFlagsPostings(train, col("doc_id"),
        col("text"), ng, w = 2, minShared = 1))
      assert(a == b, s"trial $trial: intersect=$a postings=$b")
    }
  }

  test("production-width w=8 finds a planted verbatim span and nothing else") {
    val benchW = Seq(
      (100L, "what is the capital of france the answer is paris exactly"))
      .toDF("doc_id", "text")
    val train = Seq(
      // embeds a verbatim 11-token span → 4 shared 8-grams
      (1L, "intro text what is the capital of france the answer is paris exactly outro"),
      // paraphrase — shares many tokens, zero 8-gram spans
      (2L, "the capital city of france is called paris as everyone knows"),
      (3L, "completely unrelated document about distributed join strategies"))
      .toDF("doc_id", "text")
    val out = Contamination.ngramOverlap(train, col("doc_id"), col("text"),
        benchW, col("doc_id"), col("text"), w = 8, minShared = 1)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(r.fieldIndex("train_id")) == 1L)
    assert(r.getLong(r.fieldIndex("n_shared")) == 4L)
    // bench doc has 11 tokens → 4 distinct 8-grams, all leaked
    assert(r.getDouble(r.fieldIndex("frac")) == 1.0)
  }

  test("sharedSpans reports the longest shared token span via diagonal runs") {
    val benchW = Seq(
      (100L, "what is the capital of france the answer is paris exactly"))
      .toDF("doc_id", "text")
    val train = Seq(
      // full 11-token span verbatim → 4 consecutive 8-grams, one diagonal
      (1L, "intro text what is the capital of france the answer is paris exactly outro"),
      // paraphrase: many shared tokens, zero shared 8-grams → absent
      (2L, "the capital city of france is called paris as everyone knows"),
      // 8-token prefix of the span, then broken → exactly one 8-gram run
      (3L, "what is the capital of france the answer junk is paris exactly and filler"))
      .toDF("doc_id", "text")
    val out = Contamination.sharedSpans(train, col("doc_id"), col("text"),
        benchW, col("doc_id"), col("text"), w = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // span LENGTHS, not n-gram counts: 11 for the verbatim quote, 8 for
    // the prefix-only doc, nothing for the paraphrase
    assert(out == Set((1L, 100L, 11L), (3L, 100L, 8L)))
  }

  test("selfDupSpans pairs partial copies within one corpus; df cap drops boilerplate") {
    val span = "one two three four five six seven eight nine ten"
    val boiler = "b1 b2 b3 b4 b5 b6 b7 b8" // an 8-gram in EVERY doc
    val docs = Seq(
      (1L, s"$boiler article starts $span and then diverges"),
      (2L, s"totally different intro $span closing words $boiler"),
      (3L, s"$boiler no copied content whatsoever in this one"),
      (4L, s"unrelated filler text about query planners $boiler"))
      .toDF("doc_id", "text")
    val out = Contamination.selfDupSpans(docs, col("doc_id"), col("text"),
        w = 8, maxDf = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // the 10-token copied span pairs docs 1-2 ONLY; the boilerplate
    // 8-gram sits in 4 docs > maxDf=3, so it generates no pairs at all
    assert(out == Set((1L, 2L, 10L)), s"got $out")
    // raising the cap lets the boilerplate pair everything — the cap is
    // what separates plagiarism detection from boilerplate noise
    val uncapped = Contamination.selfDupSpans(docs, col("doc_id"), col("text"),
        w = 8, maxDf = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
  }
}
