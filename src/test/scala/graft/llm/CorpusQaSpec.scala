package graft.llm

import graft.SparkSpec
import graft.agg.RobustStats
import graft.graph.Graph
import org.apache.spark.sql.functions._

/** Round-13 corpus/embedding QA wave: per-dimension embedding stats,
  * kNN hubness, duplication inflation, templated pages, PSI drift,
  * Jensen–Shannon pairs, windowed co-occurrence, k-core peeling. */
class CorpusQaSpec extends SparkSpec {
  import spark.implicits._

  test("dimStats: exact per-dimension moments; collapsed flags a constant dim") {
    // dim 0 varies, dim 1 constant (collapsed), dim 2 symmetric around 0
    val df = Seq(
      (1L, Array(1.0f, 0.5f, -2.0f)),
      (2L, Array(3.0f, 0.5f, 2.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.dimStats(df, col("embedding"))
      .orderBy("dim").collect()
    assert(out.length == 3)
    val d0 = out(0); val d1 = out(1); val d2 = out(2)
    assert(d0.getAs[Double]("mean_v") == 2.0 &&
      d0.getAs[Double]("var_v") == 1.0 && !d0.getAs[Boolean]("collapsed"))
    assert(d1.getAs[Double]("var_v") == 0.0 && d1.getAs[Boolean]("collapsed"))
    assert(d2.getAs[Double]("mean_v") == 0.0 &&
      d2.getAs[Double]("min_v") == -2.0 && d2.getAs[Double]("max_v") == 2.0)
  }

  test("hubness: dense zero rows; hub/antihub flags from k-occurrence") {
    // a and b point the same way; c is orthogonal. k=1: a's top-1 is b,
    // b's top-1 is a, c's top-1 is a (tie on cos 0 broken by id).
    val df = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(2.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.hubness(df, col("vec_id"), col("embedding"), k = 1)
      .orderBy("vec_id").collect()
    assert(out.map(_.getAs[Long]("n_hits")).toSeq == Seq(2L, 1L, 0L))
    assert(out.map(_.getAs[Boolean]("hub")).toSeq ==
      Seq(true, false, false)) // 2 >= 2k with k=1
    assert(out.map(_.getAs[Boolean]("antihub")).toSeq ==
      Seq(false, false, true))
  }

  test("dupInflation: global cluster sizes discount each copy's mass") {
    // "xx" appears 3x across two sources; "yyyy" unique
    val df = Seq(
      (1L, "xx", "s1"), (2L, "xx", "s1"), (3L, "xx", "s2"),
      (4L, "yyyy", "s2")
    ).toDF("doc_id", "text", "source")
    val out = Dedup.dupInflation(df, col("doc_id"), col("text"),
      col("source")).orderBy("source").collect()
    val s1 = out(0); val s2 = out(1)
    // s1: two copies of a size-3 cluster -> effective 2*(2/3)
    assert(s1.getAs[Long]("n_chars_total") == 4L)
    assert(math.abs(s1.getAs[Double]("effective_chars") - 4.0 / 3.0) < 1e-8)
    assert(math.abs(s1.getAs[Double]("inflation") - 3.0) < 1e-8)
    assert(s1.getAs[Long]("n_unique") == 0L)
    // s2: one copy (2/3 of 2 chars) + unique 4 chars
    assert(s2.getAs[Long]("n_chars_total") == 6L)
    assert(math.abs(s2.getAs[Double]("effective_chars") -
      (2.0 / 3.0 + 4.0)) < 1e-8)
    assert(s2.getAs[Long]("n_unique") == 1L)
  }

  test("templateDocs: boilerplate-majority pages flagged by exact integer compare") {
    val nav = "home\nabout\ncontact"
    val df = Seq(
      (1L, nav),                      // 3/3 boilerplate
      (2L, nav + "\nunique two"),     // 3/4 boilerplate
      (3L, nav + "\na\nb\nc\nd"),     // 3/7 boilerplate -> not templated
      (4L, nav)                       // lines shared by docs 1,2,3,4 (> 2)
    ).toDF("doc_id", "text")
    val out = Dedup.templateDocs(df, col("doc_id"), col("text"),
        maxDocs = 2L)
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("n_boiler")).toSeq == Seq(3L, 3L, 3L, 3L))
    assert(out.map(_.getAs[Boolean]("templated")).toSeq ==
      Seq(true, true, false, true))
  }

  test("psi: identical slices give ~0; disjoint slices give a large index") {
    val same = (1 to 100).flatMap(i => Seq((i.toLong, true), (i.toLong, false)))
      .toDF("x", "r")
    val psiSame = RobustStats.psi(same, col("x"), col("r"))
      .select(col("psi")).head().getDouble(0)
    assert(math.abs(psiSame) < 1e-6)
    // reference in 1..100, current in 1001..1100: total reallocation
    val shifted = ((1 to 100).map(i => (i.toLong, true)) ++
      (1001 to 1100).map(i => (i.toLong, false))).toDF("x", "r")
    val outS = RobustStats.psi(shifted, col("x"), col("r")).collect()
    assert(outS.length == 10)
    val psiS = outS.head.getAs[Double]("psi")
    assert(psiS > 0.25) // the "shifted" alarm band
    // per-bucket terms fold to the window total (exact long sum / 1e9;
    // round, not floor — the /1e9 round-trip is only ulp-exact)
    val folded = outS.map(r => math.round(r.getAs[Double]("psi_term") * 1e9))
      .sum
    assert(math.abs(folded.toDouble / 1e9 - psiS) < 1e-9)
  }

  test("mannWhitney: tie midranks exact, tie-corrected z, all-tied input -> NULL z") {
    // sample1 = {1,2}, sample2 = {2,3}: ranks 1, 2.5 | 2.5, 4
    // R1 = 3.5 (r1x2 = 7), U1 = 0.5, tie T = 6, var = 1.5
    val df = Seq((1L, true), (2L, true), (2L, false), (3L, false))
      .toDF("x", "f")
    val r = RobustStats.mannWhitney(df, col("x"), col("f")).head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 7L)                        // 2×R1
    assert(r.getDouble(3) == 0.5)                     // U1
    assert(math.abs(r.getDouble(4) - (-1.5 / math.sqrt(1.5))) < 1e-12)
    // every observation the same value: variance 0 -> NULL z
    val tied = Seq((5L, true), (5L, false), (5L, false)).toDF("x", "f")
    val rt = RobustStats.mannWhitney(tied, col("x"), col("f")).head()
    assert(rt.getDouble(3) == 1.0 && rt.isNullAt(4))  // U1 = 2 - 1
  }

  test("chi2Independence: zero cells enter via the spine; perfect association gives V = 1") {
    // 10×(A,X) + 10×(B,Y): the two EMPTY cells (A,Y)/(B,X) each
    // contribute their full expected count 5 -> chi2 = 20, V = 1
    val df = (Seq.fill(10)(("A", "X")) ++ Seq.fill(10)(("B", "Y")))
      .toDF("s", "l")
    val out = RobustStats.chi2Independence(df, col("s"), col("l")).collect()
    assert(out.length == 4) // full 2×2 spine, not just 2 observed cells
    val byCell = out.map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(byCell(("A", "Y")).getAs[Long]("n_obs") == 0L)
    assert(byCell(("A", "Y")).getAs[Double]("chi2_term") == 5.0)
    assert(out.forall(_.getAs[Double]("chi2") == 20.0))
    assert(out.forall(_.getAs[Double]("cramers_v") == 1.0))
    // one distinct column value -> dof 0 -> NULL V
    val deg = Seq(("A", "X"), ("B", "X")).toDF("s", "l")
    val dout = RobustStats.chi2Independence(deg, col("s"), col("l")).collect()
    assert(dout.forall(_.isNullAt(dout.head.fieldIndex("cramers_v"))))
  }

  test("jsSourcePairs: symmetric in input order, 0 for identical sources, <= ln 2") {
    val df = Seq(
      (1L, "a a b c", "s1"), (2L, "a a b c", "s2"),
      (3L, "x y z w q r", "s3")
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.jsSourcePairs(df, col("text"), col("source"))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getAs[Double]("jsd"))).sortBy(p => (p._1, p._2))
    assert(out.map(p => (p._1, p._2)).toSeq ==
      Seq(("s1", "s2"), ("s1", "s3"), ("s2", "s3")))
    val m = out.map(p => (p._1, p._2) -> p._3).toMap
    assert(math.abs(m(("s1", "s2"))) < 1e-6) // identical distributions
    assert(m(("s1", "s3")) > m(("s1", "s2")))
    assert(out.forall(_._3 <= math.log(2.0) + 1e-9))
    // s1 vs s3 == s2 vs s3: same distribution on the left
    assert(math.abs(m(("s1", "s3")) - m(("s2", "s3"))) < 1e-9)
  }

  test("cooccurWindow: counts unordered pairs within the window, not beyond") {
    val df = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val out = TextAnalysis.cooccurWindow(df, col("doc_id"), col("text"),
        window = 2, topK = 100)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        r.getAs[Long]("n"))).toMap
    // adjacent and distance-2 pairs only
    assert(out(("a", "b")) == 1L && out(("a", "c")) == 1L)
    assert(!out.contains(("a", "d"))) // distance 3 > window
    assert(out.size == 5 + 4) // 5 adjacent + 4 distance-2 pairs
  }

  test("cooccurWindow: repeated token yields a canonical self/cross pair count") {
    val df = Seq((1L, "a a b a")).toDF("doc_id", "text")
    val out = TextAnalysis.cooccurWindow(df, col("doc_id"), col("text"),
        window = 1, topK = 10)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        r.getAs[Long]("n"))).toMap
    assert(out(("a", "a")) == 1L) // positions (0,1)
    assert(out(("a", "b")) == 2L) // (1,2) and (2,3), both canonical (a,b)
  }

  test("kCore: peels below-k nodes and cascades; both regimes agree") {
    // triangle {1,2,3} plus a pendant chain 3-4-5: k=2 peels 5, then 4.
    // Duplicate and reversed edges must dedup to one canonical edge.
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (1L, 3L), (3L, 4L),
      (4L, 5L), (3L, 4L)).toDF("s", "t")
    val small = Graph.kCore(edges, col("s"), col("t"), k = 2, rounds = 3)
      .orderBy("node").collect()
    assert(small.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(small.map(_.getAs[Long]("deg")).toSeq == Seq(2L, 2L, 2L))
    // cluster regime (threshold 0 forces it) computes the same rows
    val big = Graph.kCore(edges, col("s"), col("t"), k = 2, rounds = 3,
        smallGraphThreshold = 0L)
      .orderBy("node").collect()
    assert(big.map(_.toSeq).toSeq == small.map(_.toSeq).toSeq)
    // one round is NOT enough: the chain peels one hop per round
    val r1 = Graph.kCore(edges, col("s"), col("t"), k = 2, rounds = 1)
      .orderBy("node").collect()
    assert(r1.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("robustMean: integer trim cut, winsorize clamps tails to kept boundaries") {
    // 1,2..8,20,1000 (dollars), alpha = 1/10 -> cut = 1: drop/clamp the
    // single lowest (1) and highest (1000) observations
    val vals = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 20.0, 1000.0)
    val df = vals.zipWithIndex.map { case (v, i) => (1L, i.toLong, v) }
      .toDF("g", "id", "v")
    val r = RobustStats.robustMean(df, col("g"), col("id"), col("v"),
      alphaNum = 1, alphaDen = 10).head()
    assert(r.getLong(1) == 10L && r.getLong(2) == 1L)
    assert(r.getDouble(3) == 6.875) // (2+..+8+20)/8
    assert(r.getDouble(4) == 7.7)   // (2 + 55 + 20)/10
    // alpha = 1/2 on two rows empties the kept range -> NULL means
    val deg = Seq((1L, 0L, 1.0), (1L, 1L, 9.0)).toDF("g", "id", "v")
    val rd = RobustStats.robustMean(deg, col("g"), col("id"), col("v"),
      alphaNum = 1, alphaDen = 2).head()
    assert(rd.isNullAt(3) && rd.isNullAt(4))
  }

  test("lofOutliers: density-relative flags; duplicate-only neighborhoods go NULL") {
    def v(a: Double) = Array(math.cos(math.toRadians(a)).toFloat,
      math.sin(math.toRadians(a)).toFloat)
    // tight fan at 0..20 degrees + one point at 90: the far point's
    // local density is orders below its neighbors' -> LOF >> 1.5;
    // in-cluster points sit near 1
    // outlierAt = 3: the fan ENDS legitimately sit near LOF 1.75 at
    // k=2 (their second neighbor is two steps out) — LOF's boundary
    // effect, not a defect — while the far point lands near 74
    val df = Seq((0L, v(0)), (1L, v(5)), (2L, v(10)), (3L, v(15)),
      (4L, v(20)), (5L, v(90))).toDF("vec_id", "embedding")
    val out = graft.llm.Similarity.lofOutliers(df, col("vec_id"),
        col("embedding"), k = 2, panel = lit(true), outlierAt = 3.0)
      .orderBy("vec_id").collect()
    assert(out.length == 6)
    val lofs = out.map(r => r.getLong(0) -> r.getAs[Double]("lof")).toMap
    assert(lofs(5L) > 10.0 && out(5).getAs[Boolean]("outlier"))
    assert((0L to 4L).forall(i => lofs(i) < 2.0 && !out(i.toInt)
      .getAs[Boolean]("outlier")))
    // three exact copies, k=2: every neighborhood is duplicates only,
    // reach sums are 0 -> NULL lrd, NULL lof (infinite-density guard)
    val dup = Seq((0L, v(0)), (1L, v(0)), (2L, v(0)))
      .toDF("vec_id", "embedding")
    val od = graft.llm.Similarity.lofOutliers(dup, col("vec_id"),
      col("embedding"), k = 2, panel = lit(true)).collect()
    assert(od.forall(r => r.isNullAt(r.fieldIndex("lrd")) &&
      r.isNullAt(r.fieldIndex("lof"))))
  }

  test("lpaCommunities: bridged triangles split into two dense communities") {
    // triangles {1,2,3} and {4,5,6} joined by bridge 3-4 form ONE
    // component, but three synchronous rounds (ties -> min label)
    // settle on two communities — hand-traced: after r3 the labels
    // are 1,1,1 | 3,3,3. Reversed/duplicate edges must dedup.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 6L),
      (6L, 4L), (3L, 4L), (4L, 3L), (1L, 2L)).toDF("s", "t")
    val out = Graph.lpaCommunities(edges, col("s"), col("t"), rounds = 3)
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).toSeq == (1L to 6L).toSeq)
    assert(out.map(_._2).toSeq == Seq(1L, 1L, 1L, 3L, 3L, 3L))
    assert(out.forall(_._3 == 3L))
    // cluster regime (threshold 0 forces it) computes the same rows
    val big = Graph.lpaCommunities(edges, col("s"), col("t"), rounds = 3,
        smallGraphThreshold = 0L)
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(big.toSeq == out.toSeq)
  }

  test("normProfile: exact rank quartiles over quantized norms, zero-norm count") {
    // norms 0, 1, 2, 3 → nq 0, 1000, 2000, 3000; lower-quartile ranks:
    // p25 = 1st (0.0), p50 = 2nd (1.0), p75 = 3rd (2.0), max 3.0
    val df = Seq(
      (0L, Array(0f, 0f)), (1L, Array(1f, 0f)),
      (2L, Array(0f, 2f)), (3L, Array(3f, 0f))
    ).toDF("vec_id", "embedding")
    val r = graft.llm.Similarity.normProfile(df, col("embedding")).head()
    assert(r.getAs[Long]("n_vecs") == 4L)
    assert(r.getAs[Long]("n_zero") == 1L)
    assert(r.getAs[Double]("p25_norm") == 0.0)
    assert(r.getAs[Double]("p50_norm") == 1.0)
    assert(r.getAs[Double]("p75_norm") == 2.0)
    assert(r.getAs[Double]("max_norm") == 3.0)
  }

  test("encodingScan: flags U+FFFD and C0 controls, exempts tab/LF/CR") {
    val df = Seq(
      ("web", "clean text with\ttab and\nnewline and\rCR"),
      ("web", "damaged � replacement"),
      ("pdf", "binary \u0001\u0002 spill"),
      ("pdf", null.asInstanceOf[String])
    ).toDF("source", "text")
    val out = TextAnalysis.encodingScan(df, col("source"), col("text"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_replacement"), r.getAs[Long]("n_ctrl")))
    assert(out.toSeq == Seq(("pdf", 1L, 0L, 1L), ("web", 2L, 1L, 0L)))
  }
}
