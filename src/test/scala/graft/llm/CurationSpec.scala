package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics pins for the round-14 curation wave: Fellegi–Sunter
  * weights and ordering, DP-release determinism and noise bounds,
  * DoReMi reweighting laws, script-profile counts, domain-cap
  * discipline and LSH S-curve shape (the sf0.01 oracle gate covers
  * engine parity; these pin the MATH). */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("fellegiSunter: hand-computed u rates, weights and ranking") {
    // one block of 4 records → 6 pairs; field f1 agrees on exactly the
    // (1,2) pair → u1 = 1/6; field f2 agrees on (1,2),(3,4) → u2 = 2/6
    val df = Seq(
      (1L, "b", "x", "p"), (2L, "b", "x", "p"),
      (3L, "b", "y", "q"), (4L, "b", "z", "q"))
      .toDF("rid", "blk", "f1", "f2")
    val r = Linkage.fellegiSunter(df, col("rid"),
      Seq("blk" -> col("blk")),
      Seq("f1" -> col("f1"), "f2" -> col("f2")), m = 0.9, topK = 10)
      .collect()
    assert(r.length == 6)
    val top = r.head
    assert(top.getAs[Long]("id1") == 1L && top.getAs[Long]("id2") == 2L)
    assert(top.getAs[Boolean]("agree_f1") && top.getAs[Boolean]("agree_f2"))
    assert(top.getAs[Long]("n_agree") == 2L)
    // expected score: floor(log2(0.9/(1/6))·1e6) + floor(log2(0.9/(2/6))·1e6)
    def lg2(x: Double) = math.log(x) / math.log(2.0)
    val u1 = 1.0 / 6.0; val u2 = 2.0 / 6.0
    val want = (math.floor(lg2(0.9 / u1) * 1e6) +
      math.floor(lg2(0.9 / u2) * 1e6)) / 1e6
    assert(math.abs(top.getAs[Double]("score") - want) < 1e-9,
      s"${top.getAs[Double]("score")} vs $want")
    // the (3,4) pair agrees only on f2: one agree + one disagree weight
    val p34 = r.find(x => x.getAs[Long]("id1") == 3L &&
      x.getAs[Long]("id2") == 4L).get
    val want34 = (math.floor(lg2((1.0 - 0.9) / (1.0 - u1)) * 1e6) +
      math.floor(lg2(0.9 / u2) * 1e6)) / 1e6
    assert(math.abs(p34.getAs[Double]("score") - want34) < 1e-9)
    // deterministic total order: ties broken by (id1, id2)
    val scores = r.map(_.getAs[Double]("score"))
    assert(scores.sameElements(scores.sorted.reverse))
    graft.core.Caches.release()
  }

  test("fellegiSunter: blocks never cross; NULL fields null-safe agree") {
    val df = Seq((1L, "a", Option("x")), (2L, "a", None),
      (3L, "b", None), (4L, "b", None)).toDF("rid", "blk", "f")
    val r = Linkage.fellegiSunter(df, col("rid"), Seq("blk" -> col("blk")),
      Seq("f" -> col("f")), m = 0.9, topK = 10).collect()
    // pairs: (1,2) in a — NULL vs x disagrees; (3,4) in b — NULL≡NULL agrees
    assert(r.length == 2)
    val m12 = r.find(_.getAs[Long]("id1") == 1L).get
    val m34 = r.find(_.getAs[Long]("id1") == 3L).get
    assert(!m12.getAs[Boolean]("agree_f") && m34.getAs[Boolean]("agree_f"))
    graft.core.Caches.release()
  }

  test("dpRelease: deterministic, clamped at zero, noise within the hash-CDF bound") {
    val df = (0 until 200).map(i => (i.toLong, s"s${i % 4}")).toDF("id", "g")
    val eps = 0.5
    val a = Privacy.dpRelease(df, col("g"), eps, salt = 3)
      .orderBy("g").collect()
    val b = Privacy.dpRelease(df, col("g"), eps, salt = 3)
      .orderBy("g").collect()
    assert(a.map(_.toString).sameElements(b.map(_.toString)),
      "release must be deterministic per salt")
    // p ∈ [0.5e-6, 1−0.5e-6] → |noise| ≤ ln(1e-6)/ε ≈ 27.6 at ε=0.5
    val bound = -math.log(1e-6) / eps + 1.0
    a.foreach { r =>
      val n = r.getAs[Long]("n_released")
      assert(n >= 0L)
      assert(math.abs(n - 50.0) <= bound, s"noise out of bound: $r")
      assert(r.getAs[Double]("epsilon") == eps)
    }
    // a different salt draws different noise for at least one group
    val c = Privacy.dpRelease(df, col("g"), eps, salt = 4)
      .orderBy("g").collect()
    assert(!a.map(_.toString).sameElements(c.map(_.toString)))
  }

  test("domainReweight: weights normalize; high-loss domains gain share") {
    // domain a: loss 0 per doc; domain b: loss 2000 per doc (2.0 units)
    val df = (0 until 40).map(i =>
      (if (i % 2 == 0) "a" else "b", if (i % 2 == 0) 0L else 2000L))
      .toDF("g", "lq")
    val r = Selection.domainReweight(df, col("g"), col("lq"), eta = 1.0)
      .collect().map(x => x.getAs[String]("g") -> x).toMap
    val wa = r("a").getAs[Double]("weight")
    val wb = r("b").getAs[Double]("weight")
    assert(math.abs(wa + wb - 1.0) < 1e-9, "weights must sum to 1")
    // excess: mean_all = 1.0 → a: −1, b: +1 → b's share grows from 0.5
    assert(math.abs(r("b").getAs[Double]("excess_loss") - 1.0) < 1e-9)
    assert(wb > 0.7 && wa < 0.3, s"high-loss domain must gain: $wa/$wb")
    // shares: exp(±1)/(exp(1)+exp(−1)) — the softmax of the excesses
    val want = math.exp(1.0) / (math.exp(1.0) + math.exp(-1.0))
    assert(math.abs(wb - want) < 1e-5)
    graft.core.Caches.release()
  }

  test("scriptProfile: per-class codepoint counts and fractions") {
    val df = Seq(("g1", "Abc 12 Σσ"), ("g1", "Привет x"),
      ("g2", null.asInstanceOf[String])).toDF("g", "t")
    val r = TextAnalysis.scriptProfile(df, col("g"), col("t"))
      .collect().map(x => x.getAs[String]("g") -> x).toMap
    val g1 = r("g1")
    // "Abc 12 Σσ": latin 3, digit 2, greek 2, space 2 (9 chars)
    // "Привет x": cyrillic 6, latin 1, space 1 (8 chars)
    assert(g1.getAs[Long]("n_chars") == 17L)
    assert(g1.getAs[Long]("n_latin") == 4L)
    assert(g1.getAs[Long]("n_digit") == 2L)
    assert(g1.getAs[Long]("n_greek") == 2L)
    assert(g1.getAs[Long]("n_cyrillic") == 6L)
    assert(g1.getAs[Long]("n_space") == 3L)
    assert(math.abs(g1.getAs[Double]("frac_cyrillic") - 6.0 / 17.0) < 1e-12)
    // NULL text contributes nothing: the group row exists with NULL sums
    assert(r("g2").isNullAt(r("g2").fieldIndex("n_chars")))
  }

  test("domainCap: cap respected, deterministic, NULL content ranks last") {
    val docs = (0L until 12L).map(i => (i, s"https://www.example.com/p/$i",
      if (i == 3L) null else s"text $i")).toDF("doc_id", "url", "text")
    val r = Urls.domainCap(docs, col("doc_id"), col("url"), col("text"),
      cap = 5, salt = 7).collect()
    assert(r.length == 5)
    assert(r.map(_.getAs[Long]("domain_rank")).sorted.sameElements(1L to 5L))
    assert(r.forall(_.getAs[String]("reg_domain") == "example.com"))
    // 12 docs, cap 5: the NULL-content doc must never be kept
    assert(!r.exists(_.getAs[Long]("doc_id") == 3L))
    val again = Urls.domainCap(docs, col("doc_id"), col("url"), col("text"),
      cap = 5, salt = 7).collect().map(_.toString).sorted
    assert(r.map(_.toString).sorted.sameElements(again))
  }

  test("passAtK: hand-computed estimates, short-circuits and the k > n NULL") {
    // task 0: n=5, c=2 → pass@1 = 1 − 3/5 = 0.4; pass@5 = 1 (n−c < 5);
    // task 1: n=3, c=0 → pass@1 = 0, pass@5/@10 NULL (k > n)
    val df = (Seq.fill(2)(("t0", true)) ++ Seq.fill(3)(("t0", false)) ++
      Seq.fill(3)(("t1", false))).toDF("task", "ok")
    val r = Preference.passAtK(df, col("task"), col("ok"), Seq(1, 5, 10))
      .collect().map(x => (x.getAs[String]("task"), x.getAs[Long]("k")) -> x)
      .toMap
    def pr(t: String, k: Long): Option[Double] = {
      val row = r((t, k))
      if (row.isNullAt(row.fieldIndex("pass_rate"))) None
      else Some(row.getAs[Double]("pass_rate"))
    }
    assert(math.abs(pr("t0", 1L).get - 0.4) < 1e-15)
    assert(pr("t0", 5L).contains(1.0))
    assert(pr("t0", 10L).isEmpty)
    assert(pr("t1", 1L).contains(0.0))
    assert(pr("t1", 5L).isEmpty && pr("t1", 10L).isEmpty)
    // exact product check: n=5, c=1, k=3 → 1 − (4/5)(3/4)(2/3) = 0.6
    val df2 = (Seq.fill(1)(("t", true)) ++ Seq.fill(4)(("t", false)))
      .toDF("task", "ok")
    val p3 = Preference.passAtK(df2, col("task"), col("ok"), Seq(3))
      .collect().head.getAs[Double]("pass_rate")
    assert(math.abs(p3 - 0.6) < 1e-15, s"$p3")
  }

  test("duels/winMatrix: blocked pairs, tie and same-item skip, counts") {
    // block b1: (en, 10), (de, 5), (de, 10) → duels: en>de(5);
    // en-vs-de(10) is a score TIE → skipped; de-vs-de same item → skipped
    // block b2: (fr, 1), (en, 2) → en beats fr
    def jl(x: Long): java.lang.Long = java.lang.Long.valueOf(x)
    val df = Seq((1L, "b1", "en", jl(10L)), (2L, "b1", "de", jl(5L)),
      (3L, "b1", "de", jl(10L)), (4L, "b2", "fr", jl(1L)),
      (5L, "b2", "en", jl(2L)),
      (6L, "b2", "es", null.asInstanceOf[java.lang.Long]))
      .toDF("uid", "blk", "lang", "sc")
    val d = Preference.duels(df, Seq("blk" -> col("blk")), col("lang"),
      col("sc"), col("uid"))
    val rows = d.collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.sorted.toList == List(("en", "de"), ("en", "fr")), rows.toList)
    val m = Preference.winMatrix(d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val de = m(("de", "en"))
    assert(de.getAs[Long]("n_duels") == 1L && de.getAs[Long]("wins_a") == 0L)
    assert(de.getAs[Double]("win_rate_a") == 0.0)
  }

  test("bradleyTerry: converged 2-item fixture and rating laws") {
    // a beats b 3x, b beats a 1x → MM fixed point w = (1.5, 0.5)
    val d = (Seq.fill(3)(("a", "b")) ++ Seq.fill(1)(("b", "a")))
      .toDF("win", "lose")
    val r = Preference.bradleyTerry(d, rounds = 4).collect()
      .map(x => x.getAs[String]("item") -> x).toMap
    assert(math.abs(r("a").getAs[Double]("rating") - 1.5) < 1e-6)
    assert(math.abs(r("b").getAs[Double]("rating") - 0.5) < 1e-6)
    assert(r("a").getAs[Long]("n_wins") == 3L &&
      r("a").getAs[Long]("n_duels") == 4L)
    // 3-item transitive chain: a>b (4), b>c (4), a>c (2) — ratings
    // must order a > b > c and sum to |items| after normalization
    val d3 = (Seq.fill(4)(("a", "b")) ++ Seq.fill(4)(("b", "c")) ++
      Seq.fill(2)(("a", "c"))).toDF("win", "lose")
    val r3 = Preference.bradleyTerry(d3, rounds = 8).collect()
      .map(x => x.getAs[String]("item") -> x.getAs[Double]("rating")).toMap
    assert(r3("a") > r3("b") && r3("b") > r3("c"), r3)
    assert(math.abs(r3.values.sum - 3.0) < 1e-6)
  }

  test("unimaxAlloc: waterfill caps low-resource langs, conserves the budget") {
    // tokens: a=10, b=100, c=100; maxEpochs 2 → caps 20/200/200.
    // budget 120: a capped (20·3+0 ≤ 120), b/c waterfill λ=(120−20)/2=50
    val df = Seq(("a", 10L), ("b", 100L), ("c", 100L)).toDF("g", "tq")
    val r = Selection.unimaxAlloc(df, col("g"), col("tq"),
      budget = 120L, maxEpochs = 2L)
      .collect().map(x => x.getAs[String]("g") -> x).toMap
    assert(r("a").getAs[Double]("allocated") == 20.0)
    assert(r("b").getAs[Double]("allocated") == 50.0)
    assert(r("c").getAs[Double]("allocated") == 50.0)
    assert(math.abs(r.values.map(_.getAs[Double]("allocated")).sum - 120.0)
      < 1e-9, "allocation must conserve the budget")
    assert(math.abs(r("a").getAs[Double]("epochs") - 2.0) < 1e-12)
    assert(math.abs(r("b").getAs[Double]("epochs") - 0.5) < 1e-12)
    // budget above Σcap → everyone capped at maxEpochs
    val r2 = Selection.unimaxAlloc(df, col("g"), col("tq"),
      budget = 10000L, maxEpochs = 2L)
      .collect().map(x => x.getAs[String]("g") -> x).toMap
    assert(r2.values.forall(x =>
      x.getAs[Double]("allocated") == x.getAs[Long]("cap").toDouble))
    graft.core.Caches.release()
  }

  test("rule ablation: four rules, unique kills bounded by total kills") {
    val r = graft.SparkEntry.queries("q_rule_ablation")(spark,
      "/root/testdata/sf0.001").collect()
    assert(r.map(_.getAs[String]("rule")).sorted.toList ==
      List("blocklist", "lang_mismatch", "low_margin", "too_short"))
    r.foreach { x =>
      val (nf, nu, nd) = (x.getAs[Long]("n_fail"),
        x.getAs[Long]("n_unique_fail"), x.getAs[Long]("n_docs"))
      assert(nu <= nf && nf <= nd, x.toString)
      assert(math.abs(x.getAs[Double]("fail_rate") -
        nf.toDouble / nd.toDouble) < 1e-15)
    }
    // same denominator on every row (one corpus, one scan)
    assert(r.map(_.getAs[Long]("n_docs")).distinct.length == 1)
  }

  test("canaryScan: exact substring hits only, NULL text skipped") {
    val df = Seq((1L, "clean document"), (2L, "leaked CANARY-A here"),
      (3L, "both CANARY-A and CANARY-B"), (4L, "canary-a lowercase miss"),
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val r = Contamination.canaryScan(df, col("doc_id"), col("text"),
      Seq("CANARY-A", "CANARY-B")).collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("canary_id")))
    assert(r.sorted.toList == List((2L, 0L), (3L, 0L), (3L, 1L)),
      r.toList.toString)
  }

  test("contrastiveMine: positive is nearest same-label, negatives ranked, NULL labels drop") {
    def jl(x: Long): java.lang.Long = java.lang.Long.valueOf(x)
    // anchor 0 (label 0): same-label 8 (identical → cos 1) beats 12;
    // different-label 4 and 2 rank by cosine; label-NULL 6 invisible
    val vecs = Seq(
      (0L, Array(1f, 0f), jl(0L)), (8L, Array(1f, 0f), jl(0L)),
      (12L, Array(0f, 1f), jl(0L)), (4L, Array(0.9f, 0.1f), jl(1L)),
      (2L, Array(-1f, 0f), jl(1L)),
      (6L, Array(1f, 0f), null.asInstanceOf[java.lang.Long]))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.contrastiveMine(vecs, col("vec_id"),
      col("embedding"), col("label"), col("vec_id") % 4 === 0L, kNeg = 2)
      .collect()
    val anchor0 = r.filter(_.getAs[Long]("anchor_id") == 0L)
    val pos = anchor0.filter(_.getAs[String]("role") == "positive")
    assert(pos.length == 1 && pos.head.getAs[Long]("vec_id") == 8L)
    val negs = anchor0.filter(_.getAs[String]("role") == "hard_negative")
      .sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("vec_id"))
    assert(negs.toList == List(4L, 2L), negs.toList.toString)
    assert(!r.exists(_.getAs[Long]("vec_id") == 6L), "NULL label leaked in")
    // anchors are exactly the %4 == 0 panel
    assert(r.map(_.getAs[Long]("anchor_id")).toSet == Set(0L, 8L, 12L, 4L))
  }

  test("lshPlan: S-curve monotone in s, probabilities valid, threshold exact") {
    val r = Dedup.lshPlan(spark, Seq((8, 4), (16, 2)), gridN = 19).collect()
    assert(r.length == 2 * 19)
    r.foreach { x =>
      val p = x.getAs[Double]("p_collision")
      assert(p >= 0.0 && p <= 1.0)
      val b = x.getAs[Long]("b"); val rr = x.getAs[Long]("r")
      assert(math.abs(x.getAs[Double]("threshold") -
        math.pow(1.0 / b, 1.0 / rr)) < 1e-12)
    }
    val curve = r.filter(_.getAs[Long]("b") == 8L)
      .sortBy(_.getAs[Double]("s")).map(_.getAs[Double]("p_collision"))
    assert(curve.zip(curve.tail).forall { case (a, b) => a <= b },
      "collision probability must be monotone in s")
  }
}
