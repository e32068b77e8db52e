package graft.join

import graft.SparkSpec
import graft.agg.Inference
import graft.graph.Graph
import graft.llm.{Dedup, Selection, Similarity}
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the linkage/dominance wave (the sf0.01
  * oracle gate covers engine parity; these pin the MATH and the
  * candidate-completeness rules). */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  test("adamicAdar scores shared rare neighbors and excludes hubs") {
    // parts: p1 bought by {1,2} (deg 2), p2 by {1,2,3} (deg 3),
    // hub by {1,2,3,4} — excluded at maxDeg 3
    val e = Seq((1L, "p1"), (2L, "p1"), (1L, "p2"), (2L, "p2"), (3L, "p2"),
      (1L, "hub"), (2L, "hub"), (3L, "hub"), (4L, "hub"))
      .toDF("cust", "part")
    val r = Graph.adamicAdar(e, col("cust"), col("part"), 10, 3L)
      .collect().map(x => (x.getLong(0), x.getLong(1)) ->
        ((x.getAs[Long]("n_common"), x.getAs[Double]("aa_score")))).toMap
    val w2 = math.floor(1.0 / math.log(2.0) * 1e9) / 1e9
    val w3 = math.floor(1.0 / math.log(3.0) * 1e9) / 1e9
    assert(r((1L, 2L)) == ((2L, w2 + w3))) // shares p1 and p2
    assert(r((1L, 3L)) == ((1L, w3)))      // shares p2 only
    assert(!r.contains((1L, 4L)))          // only the excluded hub
  }

  test("intervalOverlapJoin matches the theta-join with no duplicates") {
    val left = Seq((1L, 0L, 100L), (2L, 250L, 260L), (3L, 0L, 999L))
      .toDF("lid", "ls", "le")
    val right = Seq((10L, 50L, 300L), (20L, 400L, 500L))
      .toDF("rid", "rs", "re")
    // grid 100 µs: intervals span multiple cells; the keep-rule must
    // emit each overlapping pair exactly once
    val got = Joins.intervalOverlapJoin(left, "ls", "le", right, "rs", "re",
        100L)
      .select("lid", "rid", "overlap_us").as[(Long, Long, Long)]
      .collect().toSet
    assert(got == Set((1L, 10L, 50L), (2L, 10L, 10L), (3L, 10L, 250L),
      (3L, 20L, 100L)))
  }

  test("snmPairs pairs each record with its next-w sort neighbors only") {
    val docs = Seq(
      (1L, "en", "alpha beta gamma"),
      (2L, "en", "alpha beta gamm"),  // dist 1 from doc 1
      (3L, "en", "alpha beta gamma delta extra"), // within window of 1,2
      (4L, "en", "zzz totally different content here"),
      (5L, "de", "alpha beta gamma")  // other lang block — never paired
    ).toDF("doc_id", "lang", "text")
    val got = Dedup.snmPairs(docs, col("doc_id"), col("lang"), col("text"),
        window = 2, keyPrefix = 40, distPrefix = 64, maxDist = 12)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    // sort order (en): 2 < 1 < 3 (by folded prefix), 4 far away
    assert(got.contains((1L, 2L)))
    assert(got.contains((1L, 3L)) || got.contains((2L, 3L)))
    assert(!got.exists(p => p._1 == 5L || p._2 == 5L))
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("snmPairs distance is UTF-8-byte Levenshtein (the oracle-engine convention)") {
    // σ is 2 UTF-8 bytes: substituting it for 'x' costs 2 byte edits
    // (1 sub + 1 ins) where codepoint distance would say 1
    val docs = Seq((1L, "en", "abcdefgh x"), (2L, "en", "abcdefgh σ"))
      .toDF("doc_id", "lang", "text")
    val got = Dedup.snmPairs(docs, col("doc_id"), col("lang"), col("text"),
        window = 2, keyPrefix = 40, distPrefix = 64, maxDist = 8)
      .select("id1", "id2", "dist").as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 2L, 2)))
    graft.core.Caches.release()
  }

  test("pairSetRecall FULL form: recall/precision against the complete truth set") {
    // the driver's q_blocking_recall ships the PROBE-SLICE variant;
    // the unsliced definition stays pinned here (r14 VERDICT item 5).
    // SNM window 1 misses the (1,3) pair that sits 2 apart in sort
    // order but within edit distance — recall 2/3, precision 1
    val docs = Seq(
      (1L, "en", "alpha beta gamma", 16L),
      (2L, "en", "alpha beta gamm", 15L),   // dist 1 from 1, adjacent
      (3L, "en", "alpha beta gamzz", 16L),  // dist 2 from 1, 2 away in sort
      (4L, "en", "zzz unrelated content", 21L)
    ).toDF("doc_id", "lang", "text", "n_chars")
    val cand = Dedup.snmPairs(docs, col("doc_id"), col("lang"), col("text"),
      window = 1, keyPrefix = 40, distPrefix = 64, maxDist = 4)
    val truth = Dedup.editDistancePairs(docs, col("doc_id"), col("lang"),
      col("text"), col("n_chars"), bucketWidth = 64, maxDist = 4)
    val r = Dedup.pairSetRecall(cand, truth).head()
    assert(r.getAs[Long]("n_truth") == 3L) // (1,2) (1,3) (2,3)
    assert(r.getAs[Long]("n_shared") == r.getAs[Long]("n_cand"))
    assert(r.getAs[Double]("recall") < 1.0)
    assert(r.getAs[Double]("precision") == 1.0)
    graft.core.Caches.release()
  }

  test("bootstrapCI brackets the mean and uses exact rank selection") {
    val df = (1L to 400L).map(i => (i, i % 100)).toDF("id", "x")
    val r = Inference.bootstrapCI(df, col("id"), col("x")).head()
    assert(r.getAs[Long]("n") == 400L)
    assert(r.getAs[Long]("n_reps") == 64L)
    val lo = r.getAs[Double]("ci_lo"); val hi = r.getAs[Double]("ci_hi")
    val m = r.getAs[Double]("mean_full")
    assert(lo <= m && m <= hi && lo < hi)
    assert(math.abs(m - 49.5) < 1e-9)
  }

  test("marginScores renormalizes by both endpoints' kNN level") {
    // 8 panel vectors (ids 0,4,..28): two tight clusters
    val vecs = (0 until 8).map { i =>
      val base = if (i < 4) Array(1.0f, 0.0f, 0.1f * i) else Array(0.0f, 1.0f, 0.1f * i)
      (i.toLong * 4, base)
    }.toDF("vec_id", "embedding")
    val r = Similarity.marginScores(vecs, col("vec_id"), col("embedding"),
      k = 2, queryMod = 4L, topK = 8)
    val rows = r.collect()
    assert(rows.length == 8)
    assert(rows.map(_.getAs[Long]("rank")).toSeq == (1L to 8L))
    // margins finite and positive; rank 1 has the max margin
    val margins = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("margin"))
    assert(margins.forall(_ > 0))
    assert(margins.zip(margins.tail).forall { case (a, b) => a >= b })
  }

  test("skyline2d keeps exactly the non-dominated points incl. ties") {
    val pts = Seq(
      (1L, 10L, 1L),  // frontier (max x)
      (2L, 8L, 5L),   // frontier
      (3L, 8L, 5L),   // duplicate of frontier point — also kept
      (4L, 9L, 1L),   // dominated by (10,1)
      (5L, 8L, 4L),   // dominated by (8,5)
      (6L, 1L, 9L)    // frontier (max y)
    ).toDF("id", "x", "y")
    val got = Selection.skyline2d(pts, col("id"), col("x"), col("y"))
      .select("id", "rank").as[(Long, Long)].collect().toMap
    assert(got.keySet == Set(1L, 2L, 3L, 6L))
    assert(got(1L) == 1L && got(2L) == 2L && got(3L) == 2L && got(6L) == 3L)
  }
}
