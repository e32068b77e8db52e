package graft.llm

import graft.SparkSpec
import graft.functions.GraftFunctions.{md5Long, tokens}
import org.apache.spark.sql.functions._

/** Semantics pins for the data-selection family (llm/Selection.scala,
  * llm/Bloom.scala): classifier margin parity with an explode-based
  * recomputation, DSIR sign behavior and reshard invariance, and the
  * Bloom gate's no-false-negative guarantee plus a forced-saturation
  * false-positive case proving the ledger distinguishes the two. */
class SelectionSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "alpha beta gamma delta epsilon", "en"),
    (1L, "zeta eta theta iota kappa", "en"),
    (2L, "", "en"),                       // zero tokens
    (3L, "alpha beta gamma delta epsilon", "de"), // exact dup of 0
    (4L, "unter anders zwischen wegen", "de"),
    (5L, "solo una frase corta aqui", "es"),
    (6L, "alpha alpha alpha alpha", "en") // repeated single token
  ).toDF("doc_id", "text", "lang")

  // ---------------------------------------------------------------- classifier

  test("qualityClassifier: margin matches an explode-based recomputation") {
    val got = Selection.qualityClassifier(docs, col("doc_id"), col("text"))
      .select("doc_id", "q_margin").as[(Long, Long)].collect().toMap
    // independent computation: explode tokens, weight each, sum per doc
    val expected = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
      .select(col("doc_id"),
        ((md5Long(col("t")) % 64) * lit(2654435761L) % 2001L - 1000L).as("w"))
      .groupBy("doc_id").agg(sum("w").as("m"))
      .as[(Long, Long)].collect().toMap
    expected.foreach { case (id, m) => assert(got(id) == m, s"doc $id") }
  }

  test("qualityClassifier: empty doc scores 0 and is not kept; keep = margin>0") {
    val rows = Selection.qualityClassifier(docs, col("doc_id"), col("text"))
      .select("doc_id", "n_toks", "q_margin", "q_score", "keep")
      .as[(Long, Long, Long, Double, Boolean)].collect()
    val byId = rows.map(r => r._1 -> r).toMap
    assert(byId(2L)._2 == 0L && byId(2L)._3 == 0L && byId(2L)._4 == 0.0 &&
      !byId(2L)._5, "empty doc must score 0 / keep=false")
    rows.foreach { case (id, n, m, s, keep) =>
      assert(keep == (n > 0 && m > 0), s"keep rule broken for doc $id")
      if (n > 0)
        assert(math.abs(s - m.toDouble / (n * 1000.0)) < 1e-15,
          s"score normalization broken for doc $id")
    }
    // identical text => identical margin regardless of other columns
    assert(byId(0L)._3 == byId(3L)._3)
  }

  test("wordBlocklist: case-insensitive token hits; empty and clean docs keep") {
    val in = Seq(
      (0L, "this text is clean"),
      (1L, "SPAM and more Spam here"),     // 2 case-folded hits
      (2L, ""),                            // empty → keep
      (3L, "spamlike but not exact"),      // substring must NOT match
      (4L, "casino")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.wordBlocklist(in, col("doc_id"), col("text"),
      Seq("spam", "casino")).as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(0L) == (0L, true))
    assert(out(1L) == (2L, false), "case-folded exact tokens must count")
    assert(out(2L) == (0L, true), "empty doc has nothing blocked")
    assert(out(3L) == (0L, true), "substring containment must not match")
    assert(out(4L) == (1L, false))
  }

  // ---------------------------------------------------------------- DSIR

  /** DSIR corpus where counts dominate the Laplace smoothing: with only
    * a handful of tokens against D=256 buckets, the +1 priors swamp the
    * ratio and every weight collapses toward ln(raw_tot/tgt_tot) — so
    * each doc repeats its vocabulary 30×, putting per-bucket counts on
    * the same order as D. */
  private val dsirDocs = {
    def rep(s: String) = Array.fill(30)(s).mkString(" ")
    Seq(
      (0L, rep("alpha beta gamma delta"), "en"),
      (1L, rep("epsilon zeta eta theta"), "en"),
      (2L, "", "en"),                                  // zero tokens
      (3L, rep("alpha beta gamma delta"), "en"),       // dup of 0
      (4L, rep("unter anders zwischen wegen"), "de"),
      (5L, rep("solo una frase corta"), "es")
    ).toDF("doc_id", "text", "lang")
  }

  test("dsirScore: target-vocabulary docs score positive, disjoint raw vocab negative") {
    // target slice speaks vocab A; the raw-only slice speaks vocab B.
    // A doc of pure A-tokens must be more target-like (positive log
    // weight), pure B-tokens less (negative); zero-token docs emit no row.
    val out = Selection.dsirScore(dsirDocs, col("doc_id"), col("text"),
      col("lang") === "en").collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3))).toMap
    assert(!out.contains(2L), "zero-token doc must emit no row")
    assert(out(0L)._1 > 0 && out(0L)._2, "pure target vocab must select")
    assert(out(1L)._1 > 0 && out(1L)._2, "pure target vocab must select")
    assert(out(4L)._1 < 0 && !out(4L)._2, "raw-only vocab must not select")
    assert(out(5L)._1 < 0 && !out(5L)._2, "raw-only vocab must not select")
    // doc 3 duplicates doc 0's text: identical weight
    assert(math.abs(out(3L)._1 - out(0L)._1) < 1e-12)
  }

  test("dsirScore: selected set is invariant under resharding") {
    val base = Selection.dsirScore(dsirDocs, col("doc_id"), col("text"),
      col("lang") === "en")
      .select("doc_id", "selected").as[(Long, Boolean)].collect().toSet
    val reshard = Selection.dsirScore(dsirDocs.repartition(7, col("lang")),
      col("doc_id"), col("text"), col("lang") === "en")
      .select("doc_id", "selected").as[(Long, Boolean)].collect().toSet
    assert(base == reshard)
  }

  // ------------------------------------------------------- prioritySample

  test("prioritySample: weight-proportional, exact k, reshard-stable, w<=0 excluded") {
    val rows = (0L until 1000L).map { i =>
      (i, if (i >= 900) 100L else 1L) // 10% of rows carry 100x weight
    } :+ (2000L, 0L) :+ (2001L, -5L)
    val df = rows.toDF("doc_id", "w")
    val out = Selection.prioritySample(df, col("doc_id"), col("w"), k = 50)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out.length == 50)
    // zero/negative-weight rows carry no sampling mass
    assert(!out.exists(r => r._1 >= 2000L))
    // the heavy 10% of rows (~92% of total mass) must dominate the
    // sample — deterministic given the md5 uniforms
    val heavy = out.count(_._2 == 100L)
    assert(heavy > 35, s"heavy rows under-sampled: $heavy/50")
    // priority = u div w exactly, u = md5Long(id)+1 — recomputed with
    // driver-side Long division (floor for positives), not Spark's div
    val uw = df.filter(col("w") > 0)
      .select(col("doc_id"), col("w"),
        md5Long(col("doc_id").cast("string")) + lit(1L))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    out.foreach { case (id, _, p) =>
      val (w, u) = uw(id); assert(p == u / w)
    }
    // reshard invariance: the sample is a pure function of content
    val reshard = Selection.prioritySample(df.repartition(13, col("w")),
      col("doc_id"), col("w"), k = 50)
      .as[(Long, Long, Long)].collect().toSeq
    assert(reshard == out)
  }

  test("prioritySamplePerGroup: exact k per group, same priorities as the global form") {
    val df = (0L until 300L).map(i => (s"g${i % 3}", i, (i % 9) + 1L))
      .toDF("g", "doc_id", "w")
    val out = Selection.prioritySamplePerGroup(df, col("g"), col("doc_id"),
      col("w"), k = 10).as[(String, Long, Long, Long)].collect().toSeq
    assert(out.groupBy(_._1).view.mapValues(_.size).toMap ==
      Map("g0" -> 10, "g1" -> 10, "g2" -> 10))
    // group membership never changes a row's priority: the per-group
    // sample of a single-group frame equals the global k-smallest
    val solo = Selection.prioritySamplePerGroup(
      df.filter(col("g") === "g1"), col("g"), col("doc_id"), col("w"), k = 10)
      .select(col("doc_id"), col("priority")).as[(Long, Long)].collect().toSet
    val global = Selection.prioritySample(
      df.filter(col("g") === "g1"), col("doc_id"), col("w"), k = 10)
      .select(col("doc_id"), col("priority")).as[(Long, Long)].collect().toSet
    assert(solo == global)
  }

  // ---------------------------------------------------------------- Bloom

  test("bloom gate: zero false negatives — every exact dup is flagged maybe_dup") {
    val ref = docs.filter(col("doc_id") <= 3)
    val probe = docs.filter(col("doc_id") > 3)
      .union(Seq((7L, "alpha beta gamma delta epsilon", "en")).toDF(
        "doc_id", "text", "lang")) // planted exact dup of ref doc 0
    val out = Bloom.gate(ref, probe, col("doc_id"), col("text"), bits = 4096)
      .as[(Long, Boolean, Boolean)].collect()
    assert(out.length == 4)
    out.foreach { case (id, maybe, isDup) =>
      assert(!isDup || maybe, s"false negative on doc $id")
    }
    assert(out.find(_._1 == 7L).exists(r => r._2 && r._3),
      "planted dup must be caught by both the filter and the exact check")
  }

  test("bloom gate: a saturated filter produces false positives the ledger exposes") {
    // 64-bit filter + 40 keys * 4 positions => essentially every bit set:
    // non-member probes pass the filter (maybe_dup) but fail the exact
    // check (is_dup=false) — the accounting distinguishes the two.
    val ref = (0 until 40).map(i => (i.toLong, s"ref document number $i"))
      .toDF("doc_id", "text")
    val probe = (100 until 110).map(i => (i.toLong, s"novel probe text $i"))
      .toDF("doc_id", "text")
    val out = Bloom.gate(ref, probe, col("doc_id"), col("text"), bits = 64)
      .as[(Long, Boolean, Boolean)].collect()
    assert(out.forall(!_._3), "no probe text is actually in ref")
    assert(out.exists(_._2), "saturated filter must show false positives")
  }

  test("bloom buildBits: bounded population, deterministic across builds") {
    val keys = docs.select(md5(col("text")).as("h")).distinct()
    val a = Bloom.buildBits(keys, col("h"), bits = 4096)
    val b = Bloom.buildBits(keys, col("h"), bits = 4096)
    assert(a.toSeq == b.toSeq, "filter must be deterministic")
    assert(a.length == 4096 / 32)
    val popcount = a.map(java.lang.Long.bitCount).sum
    val nKeys = keys.count()
    assert(popcount > 0 && popcount <= 4 * nKeys,
      s"at most k bits per key may be set (got $popcount for $nKeys keys)")
    // 32-bit packing: no bit above 31 is ever set (the DuckDB-parity cap)
    assert(a.forall(w => (w >>> 32) == 0L), "words must pack only 32 low bits")
  }

  // ---------------------------------------------------------- wilson ranking

  /** Reference Wilson lower bound in the same operation order as
    * Selection.wilsonLbSql. */
  private def wilsonRef(nPass: Long, nDocs: Long): Double = {
    val n = nDocs.toDouble
    val p = nPass.toDouble / n
    (p + (1.96 * 1.96) / (2.0 * n) -
      1.96 * math.sqrt((p * (1.0 - p) + (1.96 * 1.96) / (4.0 * n)) / n)) /
      (1.0 + (1.96 * 1.96) / n)
  }

  test("wilsonSourceRank: big consistent source outranks tiny perfect one; bounds match reference") {
    // tiny: 3/3 pass (raw fraction 1.0); big: 95/100 pass (raw 0.95)
    val rows = (1 to 3).map(i => (s"d$i", "tiny", true)) ++
      (1 to 100).map(i => (s"b$i", "big", i <= 95))
    val df = rows.toDF("doc_id", "source", "pass")
    val got = Selection.wilsonSourceRank(df, col("source"), col("pass"))
      .select("source", "n_docs", "n_pass", "wilson_lb", "rnk")
      .as[(String, Long, Long, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("tiny")._2 == 3L && got("tiny")._3 == 3L)
    assert(got("big")._2 == 100L && got("big")._3 == 95L)
    assert(got("big")._4 == wilsonRef(95, 100))
    assert(got("tiny")._4 == wilsonRef(3, 3))
    // the whole point: uncertainty-penalized ordering
    assert(got("big")._4 > got("tiny")._4)
    assert(got("big")._5 == 1L && got("tiny")._5 == 2L)
  }

  test("wilsonSourceRank: zero passes bound to exactly 0; ties rank by source name") {
    val df = (
      (1 to 4).map(i => (s"z$i", "none", false)) ++
      (1 to 5).map(i => (s"x$i", "beta", i <= 2)) ++
      (1 to 5).map(i => (s"y$i", "alpha", i <= 2))).toDF("doc_id", "source", "pass")
    val got = Selection.wilsonSourceRank(df, col("source"), col("pass"))
      .select("source", "wilson_lb", "rnk")
      .as[(String, Double, Long)].collect().map(r => r._1 -> r).toMap
    // at p=0 the margin z·sqrt(z²/(4n²)) equals the center z²/(2n) only
    // algebraically — the computed forms differ by ~1 ulp of residue
    assert(math.abs(got("none")._2) < 1e-15, "0/n must bound to ~0")
    // alpha and beta are identical (2/5): same bound, name breaks the tie
    assert(got("alpha")._2 == got("beta")._2)
    assert(got("alpha")._3 == 1L && got("beta")._3 == 2L && got("none")._3 == 3L)
  }

  // ------------------------------------------------------------------ kappa

  test("agreementKappa: known contingency table, po/pe/kappa textbook values") {
    // n=8: n11=3, n10=1, n01=2, n00=2
    val rows = Seq.fill(3)((true, true)) ++ Seq.fill(1)((true, false)) ++
      Seq.fill(2)((false, true)) ++ Seq.fill(2)((false, false))
    val got = Selection.agreementKappa(rows.toDF("a", "b"), col("a"), col("b"))
      .as[(Long, Long, Long, Long, Long, Double, Double, Double)]
      .collect().head
    assert(got._1 == 8L && got._2 == 3L && got._3 == 1L &&
      got._4 == 2L && got._5 == 2L)
    assert(math.abs(got._6 - 0.625) < 1e-12)  // (3+2)/8
    assert(math.abs(got._7 - 0.5) < 1e-12)    // 0.5*0.625 + 0.5*0.375
    assert(math.abs(got._8 - 0.25) < 1e-12)   // (0.625-0.5)/(1-0.5)
  }

  test("agreementKappa: pe=1 (both raters constant, same direction) yields NULL kappa, no crash") {
    // all four docs are (true, true): po = 1, pe = 1 — kappa undefined;
    // Spark 4 ANSI would raise DIVIDE_BY_ZERO without the CASE guard
    val rows = Seq.fill(4)((true, true)).toDF("a", "b")
    val got = Selection.agreementKappa(rows, col("a"), col("b"))
      .select("po", "pe", "kappa")
      .as[(Option[Double], Option[Double], Option[Double])].collect().head
    assert(got._1.contains(1.0) && got._2.contains(1.0))
    assert(got._3.isEmpty, s"kappa must be NULL at pe=1, got ${got._3}")
  }

  test("agreementKappa: perfect agreement gives kappa 1; clfKeep matches qualityClassifier") {
    val rows = Seq((true, true), (false, false), (true, true), (false, false),
      (true, true))
    val k = Selection.agreementKappa(rows.toDF("a", "b"), col("a"), col("b"))
      .select("kappa").as[Double].collect().head
    assert(math.abs(k - 1.0) < 1e-12)
    val viaCol = docs.select(col("doc_id"),
      Selection.clfKeep(col("text")).as("k")).as[(Long, Boolean)].collect().toMap
    val viaDf = Selection.qualityClassifier(docs, col("doc_id"), col("text"))
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(viaCol == viaDf, "clfKeep column must equal the classifier's keep")
  }

  test("quantileNormalize maps both groups onto the SAME global quantile values") {
    val df = Seq(("A", 1L, 1L), ("A", 2L, 2L), ("A", 3L, 3L),
      ("B", 4L, 10L), ("B", 5L, 20L), ("B", 6L, 30L)).toDF("g", "id", "x")
    val out = Selection.quantileNormalize(df, col("g"), col("id"), col("x"))
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    // global sorted [1,2,3,10,20,30]; midpoint indices per rank 1..3 of
    // a 3-group: ((2r-1)·6+3) div 6 = 1, 3, 5 → values 1, 3, 20
    val aNorms = out.filter(_._1 == "A").sortBy(_._2).map(_._3).toSeq
    val bNorms = out.filter(_._1 == "B").sortBy(_._2).map(_._3).toSeq
    assert(aNorms == Seq(1L, 3L, 20L))
    assert(bNorms == aNorms, "normalized distributions must coincide")
  }

  test("neymanAllocation: exact largest-remainder split, zero-variance strata get zero weight, caps at stratum size") {
    val rows = Seq.fill(1)(("A", 0L)) ++ Seq(("A", 200L)) ++
      (0 until 8).map(i => ("B", if (i % 2 == 0) 0L else 100L)) ++
      Seq.fill(5)(("C", 42L)) // constant → σ = 0
    val df = rows.toDF("g", "x")
    val out = Selection.neymanAllocation(df, col("g"), col("x"), budget = 6L)
      .collect().map(r => r.getString(0) -> r).toMap
    // w_A = 2·100 = 200, w_B = 8·50 = 400, w_C = 0 → alloc 2/4/0
    assert(out("A").getLong(4) == 2L && out("A").getLong(5) == 2L)
    assert(out("B").getLong(4) == 4L && out("B").getLong(5) == 4L)
    assert(out("C").getDouble(3) == 0.0 && out("C").getLong(5) == 0L)
    assert(out.values.map(_.getLong(5)).sum == 6L, "allocations sum to budget")
    // cap: budget 30 gives A an uncapped 10 but only 2 docs exist
    val capped = Selection.neymanAllocation(df, col("g"), col("x"), budget = 30L)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(capped("A").getLong(4) == 10L && capped("A").getLong(5) == 2L)
  }

  test("neymanAllocation degenerates to NULL on an all-constant corpus (W = 0)") {
    val df = (Seq.fill(3)(("A", 7L)) ++ Seq.fill(4)(("B", 9L))).toDF("g", "x")
    val out = Selection.neymanAllocation(df, col("g"), col("x"), budget = 5L)
      .collect()
    assert(out.forall(r => r.isNullAt(4) && r.isNullAt(5)),
      "zero total weight must yield NULL allocations, not a silent split")
  }

  test("sourceAblation: complement means reconstruct the totals; single source gives NULL") {
    val docs = Seq(("A", "good text here"), ("A", "more words"),
      ("B", ""), ("B", "casino spam spam"), ("C", "x y z"))
      .toDF("src", "text")
    // per-source margin sums recomputed independently from the
    // classifier output (explode-free cross-check of the operator)
    val withId = docs.withColumn("id", monotonically_increasing_id())
    val perSrc = Selection.qualityClassifier(withId, col("id"), col("text"))
      .join(withId.select(col("id").as("doc_id"), col("src")), Seq("doc_id"))
      .groupBy("src").agg(sum("q_margin").as("sm"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val smt = perSrc.values.map(_._1).sum.toDouble
    val out = Selection.sourceAblation(docs, col("src"), col("text"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.size == 3)
    out.foreach { case (g, r) =>
      val (smg, n) = perSrc(g)
      assert(r.getLong(1) == n, s"$g n_docs")
      assert(math.abs(r.getDouble(2) - smt / 5.0) < 1e-9, "overall mean")
      assert(math.abs(r.getDouble(3) - (smt - smg) / (5.0 - n)) < 1e-9,
        s"$g mean without")
      assert(math.abs(r.getDouble(4) -
        (r.getDouble(3) - r.getDouble(2))) < 1e-12, "delta identity")
    }
    val solo = Selection.sourceAblation(
      Seq(("A", "only one")).toDF("src", "text"), col("src"), col("text"))
      .collect().head
    assert(solo.isNullAt(3) && solo.isNullAt(4),
      "removing the only source leaves no corpus — NULL, not 0/0")
  }
}
