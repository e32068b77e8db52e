package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics pins for the release-audit wave: k-anonymity accounting,
  * KMV sketch Jaccard invariants, and perceptual dHash recall (the
  * sf0.01 oracle gate covers engine parity; these pin the MATH). */
class AuditSpec extends SparkSpec {
  import spark.implicits._

  test("kAnonymity counts classes, verdicts and suppression exactly") {
    // classes: (s1,en)×5 → k-anon; (s1,de)×2 → suppressed; (s2,en)×1 →
    // suppressed. Sensitive diversity: the five s1/en rows carry 3
    // distinct lengths → l-diverse at l=3; NULL sensitive is not counted.
    val df = Seq(
      ("s1", "en", 10L), ("s1", "en", 10L), ("s1", "en", 20L),
      ("s1", "en", 30L), ("s1", "en", 30L),
      ("s1", "de", 10L), ("s1", "de", 10L),
      ("s2", "en", 40L)).toDF("src", "lang", "len")
    val r = Privacy.kAnonymity(df,
      Seq("src" -> col("src"), "lang" -> col("lang")), col("len"),
      k = 5, l = 3).orderBy("src", "lang").collect()
    assert(r.length == 3)
    val byKey = r.map(x => (x.getAs[String]("src"), x.getAs[String]("lang")) ->
      x).toMap
    val big = byKey(("s1", "en"))
    assert(big.getAs[Long]("class_size") == 5L &&
      big.getAs[Boolean]("k_anonymous") &&
      big.getAs[Long]("l_distinct") == 3L && big.getAs[Boolean]("l_diverse"))
    val small = byKey(("s1", "de"))
    assert(!small.getAs[Boolean]("k_anonymous") &&
      small.getAs[Long]("l_distinct") == 1L)
    assert(r.forall(_.getAs[Long]("n_total") == 8L))
    assert(r.forall(_.getAs[Long]("n_suppressed") == 3L))
    assert(r.forall(x =>
      math.abs(x.getAs[Double]("suppression_rate") - 3.0 / 8.0) < 1e-15))
  }

  test("kAnonymity NULL quasi-identifier forms its own class") {
    val df = Seq((Some("s1"), 1L), (None, 2L), (None, 3L))
      .toDF("src", "len")
    val r = Privacy.kAnonymity(df, Seq("src" -> col("src")), col("len"),
      k = 2, l = 1).collect()
    assert(r.length == 2)
    val nullClass = r.find(_.isNullAt(0)).get
    assert(nullClass.getAs[Long]("class_size") == 2L &&
      nullClass.getAs[Boolean]("k_anonymous"))
  }

  test("dedupYieldCurve is monotone and counts the keep-lowest victims") {
    // 1≈2 near-dup (high J), 3 = unrelated, 4 = exact dup of 1
    val t1 = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq((1L, t1), (2L, t1 + " extra"), (3L,
      "an entirely different body of text with nothing shared at all"),
      (4L, t1))
    val r = Dedup.dedupYieldCurve(docs.toDF("doc_id", "text"),
      col("doc_id"), col("text"), Seq(0.4, 0.9))
      .orderBy("threshold").collect()
    val (loose, tight) = (r(0), r(1))
    assert(loose.getAs[Long]("n_pairs") >= tight.getAs[Long]("n_pairs"),
      "pair counts must be monotone non-increasing in the threshold")
    assert(tight.getAs[Long]("n_pairs") >= 1L, "exact dup survives 0.9")
    assert(loose.getAs[Long]("n_docs_dropped") >=
      tight.getAs[Long]("n_docs_dropped"))
  }

  test("tCloseness matches the hand-computed total variation") {
    // global lang mix: en 4/6, de 2/6. Class s1 = {en, en} → p = (1, 0):
    // TV = ½(|1 − 4/6| + |0 − 2/6|) = 1/3. Class s2 = {en, en, de, de}
    // → p = (1/2, 1/2): TV = ½(|1/2 − 2/3| + |1/2 − 1/3|) = 1/6
    val df = Seq(
      ("s1", "en"), ("s1", "en"),
      ("s2", "en"), ("s2", "en"), ("s2", "de"), ("s2", "de"))
      .toDF("src", "lang")
    val r = Privacy.tCloseness(df, Seq("src" -> col("src")), col("lang"),
      t = 0.2).orderBy("src").collect()
    assert(math.abs(r(0).getAs[Double]("tv_dist") - 1.0 / 3.0) < 1e-12)
    assert(!r(0).getAs[Boolean]("t_close"))
    assert(math.abs(r(1).getAs[Double]("tv_dist") - 1.0 / 6.0) < 1e-12)
    assert(r(1).getAs[Boolean]("t_close"))
    // absent-value mass: s1 has no 'de' row, yet its TV counts the
    // global de share via the complement identity
    assert(r(0).getAs[Long]("n_sens_present") == 1L)
  }

  test("kmvSourceJaccard is exact when k covers the sets") {
    // identical sources → Ĵ = 1; disjoint → Ĵ = 0 (pool ∩ A ∩ B empty)
    val df = Seq(
      ("a", "x"), ("a", "y"), ("a", "z"),
      ("b", "x"), ("b", "y"), ("b", "z"),
      ("c", "p"), ("c", "q"), ("c", "r")).toDF("src", "text")
    val r = Dedup.kmvSourceJaccard(df, col("src"), col("text"), k = 64)
      .orderBy("src_a", "src_b").collect()
    assert(r.length == 3)
    val ab = r.find(x => x.getString(0) == "a" && x.getString(1) == "b").get
    assert(ab.getAs[Long]("k_used") == 3L &&
      ab.getAs[Long]("n_match") == 3L &&
      ab.getAs[Double]("jaccard_kmv") == 1.0)
    val ac = r.find(x => x.getString(0) == "a" && x.getString(1) == "c").get
    assert(ac.getAs[Long]("k_used") == 3L &&
      ac.getAs[Double]("jaccard_kmv") == 0.0)
  }

  test("kmvSourceJaccard truncates to the sketch size k") {
    // 10 distinct docs per source, k = 4 → k_used = 4 and the pool is
    // the 4 smallest union hashes — a real sketch, not the full set
    val rows = (0 until 10).flatMap(i =>
      Seq(("a", s"doc$i"), ("b", s"doc$i")))
    val r = Dedup.kmvSourceJaccard(rows.toDF("src", "text"),
      col("src"), col("text"), k = 4).head()
    assert(r.getAs[Long]("k_used") == 4L &&
      r.getAs[Long]("n_match") == 4L &&
      r.getAs[Double]("jaccard_kmv") == 1.0 &&
      r.getAs[Double]("union_est") > 0.0)
  }

  test("dHash is invariant under constant brightness shift (+1 bytes)") {
    // gradient SIGNS are what dHash keeps: adding 1 to every byte (no
    // wraparound in the fixture) preserves every g(a) > g(b) compare,
    // so the shifted payload collides at hamming 0 — the re-encode
    // robustness exact/CDC dedup lacks (see Multimodal.dHash scaladoc)
    val base = Array.tabulate[Byte](200)(i => ((i * 37 + 11) % 200).toByte)
    val shifted = base.map(b => (b + 1).toByte)
    val media = Seq((1L, base), (2L, shifted), (3L, base.reverse))
      .toDF("media_id", "payload")
    val sig = Multimodal.dHash(media).orderBy("media_id").collect()
    assert(sig.length == 3)
    assert(sig(0).getAs[String]("phash") == sig(1).getAs[String]("phash"))
    assert(sig(0).getAs[String]("phash").length == 16)
    val pairs = Multimodal.dHashPairs(media, maxDist = 3).collect()
    assert(pairs.exists(p => p.getAs[Long]("id1") == 1L &&
      p.getAs[Long]("id2") == 2L && p.getAs[Long]("hamming") == 0L))
  }

  test("bpeTrain learns merges in frequency order and reuses earlier merges") {
    // "abab" ×3, "ab" ×2: round 1 pair counts — (a,b) 3·2+2 = 8,
    // (b,a) 3 → merge (a,b). Round 2: "abab" → [ab, ab] so (ab, ab)
    // count 3 → merge (ab, ab) — a merge built FROM a merge
    val df = Seq.fill(3)("abab") ++ Seq.fill(2)("ab")
    val r = TextAnalysis.bpeTrain(df.toDF("text"), col("text"), rounds = 2)
      .orderBy("rank").collect()
    assert(r.length == 2)
    assert((r(0).getString(1), r(0).getString(2), r(0).getLong(3)) ==
      ("a", "b", 8L))
    assert((r(1).getString(1), r(1).getString(2), r(1).getLong(3)) ==
      ("ab", "ab", 3L))
  }

  test("gateParity flags the 80%-rule failures exactly") {
    // a: 4/4 pass; b: 1/4 → overall 5/8; ratio_b = .25/.625 = 0.4
    val df = (Seq.fill(4)(("a", Some(true))) ++
      Seq(("b", Some(true))) ++ Seq.fill(3)(("b", Some(false))) :+
      ("c", None: Option[Boolean])).toDF("src", "pass")
    val r = Privacy.gateParity(df, col("src"), col("pass"))
      .orderBy("g").collect()
    assert(r.length == 2, "NULL gate verdicts drop")
    val a = r(0); val b = r(1)
    assert(a.getAs[Double]("pass_rate") == 1.0 &&
      a.getAs[Boolean]("meets_four_fifths"))
    assert(b.getAs[Double]("pass_rate") == 0.25 &&
      math.abs(b.getAs[Double]("parity_ratio") - 0.4) < 1e-15 &&
      !b.getAs[Boolean]("meets_four_fifths"))
    assert(a.getAs[Double]("overall_rate") == 0.625)
  }

  test("datasetCard folds the release summary from one aggregate") {
    val df = Seq(
      (Some("a b"), Some("en"), Some("web"), Some(3L)),
      (Some("a b"), Some("en"), Some("pdf"), Some(3L)), // exact dup text
      (Some("c"), Some("de"), Some("web"), Some(1L)),
      (None: Option[String], None: Option[String], Some("web"),
        None: Option[Long]))
      .toDF("text", "lang", "source", "n_chars")
    val r = TextAnalysis.datasetCard(df, col("text"), col("lang"),
      col("source"), col("n_chars")).head()
    assert(r.getAs[Long]("n_docs") == 4L &&
      r.getAs[Long]("n_text_docs") == 3L)
    assert(r.getAs[Long]("n_chars") == 7L && r.getAs[Long]("n_words") == 5L)
    assert(r.getAs[Long]("n_langs") == 2L &&
      r.getAs[Long]("n_sources") == 2L)
    assert(r.getAs[Long]("n_distinct_texts") == 2L)
    assert(math.abs(r.getAs[Double]("dup_rate") - 1.0 / 3.0) < 1e-15)
    assert(math.abs(r.getAs[Double]("en_share") - 2.0 / 3.0) < 1e-15)
  }

  test("bpeApply tokenizes with the learned merges and reports compression") {
    // corpus "abab" ×3 + "ab" ×2, 2 rounds (see bpeTrain test): final
    // symbols — "abab" → [abab] after (a,b) then (ab,ab); "ab" → [ab].
    // doc 1 = "abab ab": 2 words, 1 + 1 = 2 tokens, 6 chars → 3.0
    val docs = (Seq.fill(2)("abab") :+ "abab ab" :+ "ab")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val r = TextAnalysis.bpeApply(docs.toDF("doc_id", "text"),
      col("doc_id"), col("text"), rounds = 2)
      .orderBy("doc_id").collect()
    val d2 = r(2)
    assert(d2.getAs[Long]("n_words") == 2L &&
      d2.getAs[Long]("n_bpe_tokens") == 2L &&
      d2.getAs[Long]("n_word_chars") == 6L &&
      d2.getAs[Double]("chars_per_token") == 3.0)
    // 1-char words pass through as single symbols
    val one = TextAnalysis.bpeApply(Seq((9L, "x")).toDF("doc_id", "text"),
      col("doc_id"), col("text"), rounds = 2).head()
    assert(one.getAs[Long]("n_bpe_tokens") == 1L)
  }

  test("bpeTrain stops early when no pairs remain") {
    // single 2-char word: round 1 merges it fully, round 2 has nothing
    val r = TextAnalysis.bpeTrain(Seq("ab").toDF("text"), col("text"),
      rounds = 4).collect()
    assert(r.length == 1)
  }

  test("BpeMerge collapses leftmost non-overlapping runs") {
    import graft.functions.BpeMerge
    val df = Seq(Seq("a", "a", "a"), Seq("a", "a", "a", "a"),
      Seq("x", "a", "b", "y")).toDF("s")
    val out = df.select(BpeMerge(col("s"), "a", "a").as("m")).collect()
      .map(_.getSeq[String](0).toList).toList
    assert(out == List(List("aa", "a"), List("aa", "aa"),
      List("x", "a", "b", "y")))
    val ab = df.select(BpeMerge(col("s"), "a", "b").as("m")).collect()
      .map(_.getSeq[String](0).toList).toList
    assert(ab(2) == List("x", "ab", "y"))
  }

  test("labelNoise: agreeing scorer yields zero noise, flipped labels full noise") {
    // scores ±0.5; labels agree with sign → every example confidently
    // lands on its own label's side
    val agree = Seq((0.5, true), (0.6, true), (-0.5, false), (-0.6, false))
      .toDF("score", "label")
    val a = Selection.labelNoise(agree, col("score"), col("label"))
      .select(max(col("noise_est"))).head().getDouble(0)
    assert(a == 0.0)
    val flipped = Seq((0.5, false), (0.6, false), (-0.5, true), (-0.6, true))
      .toDF("score", "label")
    val f = Selection.labelNoise(flipped, col("score"), col("label"))
      .select(max(col("noise_est"))).head().getDouble(0)
    assert(f == 1.0)
  }

  test("matryoshkaOverlap: identical prefixes give full overlap") {
    // vectors whose first 2 dims carry ALL the signal → prefix ranking
    // equals the full ranking
    val rows = (0L to 5L).map(i =>
      (i, Array(i.toFloat, 1.0f, 0.0f, 0.0f)))
    val r = Similarity.matryoshkaOverlap(rows.toDF("vec_id", "embedding"),
      col("vec_id"), col("embedding"), queryId = 0L, k = 3, prefixDim = 2)
      .head()
    assert(r.getAs[Long]("n_overlap") == 3L &&
      r.getAs[Double]("overlap_frac") == 1.0)
  }

  test("dHash bands decompose the 64 gradient bits") {
    // strictly decreasing byte ramp: every adjacent-cell compare is
    // g(c) > g(c+1) within a row → all 64 bits set → bands 0xffff
    val ramp = Array.tabulate[Byte](72)(i => (200 - i).toByte)
    val sig = Multimodal.dHash(Seq((1L, ramp)).toDF("media_id", "payload"))
      .head()
    assert(Seq("b0", "b1", "b2", "b3")
      .forall(b => sig.getAs[Long](b) == 0xFFFFL))
    assert(sig.getAs[String]("phash") == "ffffffffffffffff")
  }
}
