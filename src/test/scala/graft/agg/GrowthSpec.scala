package graft.agg

import graft.SparkSpec
import graft.llm.{Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the product/eval analytics wave. */
class GrowthSpec extends SparkSpec {
  import spark.implicits._

  private def wk(w: Long, off: Long = 0L) = w * 604800000000L + off

  test("churn decomposes actives into new/retained and counts churners") {
    // wk0: {1,2,3}; wk1: {2,3,4}; wk2: {4}
    val rows = Seq((1L, wk(0)), (2L, wk(0)), (3L, wk(0)),
      (2L, wk(1)), (3L, wk(1)), (4L, wk(1)), (4L, wk(2)))
    val df = rows.toDF("u", "t")
      .select(col("u"), timestamp_micros(col("t")).as("ts"))
    val m = Funnel.churn(df, col("u"), col("ts"))
      .collect().map(r => r.getAs[Long]("wk") -> r).toMap
    assert(m(0L).getAs[Long]("n_active") == 3L &&
      m(0L).getAs[Long]("n_new") == 3L)
    val w1 = m(1L)
    assert(w1.getAs[Long]("n_active") == 3L)
    assert(w1.getAs[Long]("n_new") == 1L)        // user 4
    assert(w1.getAs[Long]("n_retained") == 2L)   // users 2,3
    assert(w1.getAs[Long]("n_churned") == 1L)    // user 1
    assert(math.abs(w1.getAs[Double]("churn_rate") - 1.0 / 3) < 1e-12)
    val w2 = m(2L)
    assert(w2.getAs[Long]("n_churned") == 2L)    // users 2,3
    assert(!m.contains(3L)) // no phantom week past the last observed one
    graft.core.Caches.release()
  }

  test("lastTouchAttribution credits the latest strictly-earlier click") {
    val rows = Seq(
      (1L, 10L, 1L, "click"), (1L, 20L, 2L, "click"),
      (1L, 50L, 3L, "purchase"),                    // lat 30
      (2L, 5L, 4L, "purchase"),                     // unattributed
      (2L, 7L, 5L, "click"))
    val df = rows.toDF("u", "t", "id", "typ")
      .select(col("u"), timestamp_micros(col("t")).as("ts"), col("id"),
        col("typ"))
    val r = Funnel.lastTouchAttribution(df, col("u"), col("ts"), col("id"),
      col("typ"), "click", "purchase").head()
    assert(r.getAs[Long]("n_conversions") == 2L)
    assert(r.getAs[Long]("n_attributed") == 1L)
    assert(math.abs(r.getAs[Double]("frac_attributed") - 0.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("mean_latency_us") - 30.0) < 1e-12)
  }

  test("transitionLatency reports exact gap stats per step pair") {
    val rows = Seq(
      (1L, 0L, 1L, "a"), (1L, 10L, 2L, "b"),   // a->b 10
      (1L, 40L, 3L, "b"),                       // b->b 30
      (2L, 0L, 4L, "a"), (2L, 30L, 5L, "b"))    // a->b 30
    val df = rows.toDF("u", "t", "id", "typ")
      .select(col("u"), timestamp_micros(col("t")).as("ts"), col("id"),
        col("typ"))
    val m = TimeSeries.transitionLatency(df, col("u"), col("ts"),
        col("id"), col("typ"))
      .collect().map(r => (r.getAs[String]("from_type"),
        r.getAs[String]("to_type")) -> r).toMap
    val ab = m(("a", "b"))
    assert(ab.getAs[Long]("n") == 2L)
    assert(math.abs(ab.getAs[Double]("mean_gap_us") - 20.0) < 1e-12)
    assert(ab.getAs[Long]("median_gap_us") == 10L) // lower median
    assert(ab.getAs[Long]("max_gap_us") == 30L)
  }

  test("vocabCoverage masses are exact prefix sums of the rank order") {
    // freqs: x:3, y:2, z:1 → top-1 covers 3/6, top-2 covers 5/6
    val docs = Seq("x x x y", "y z").toDF("text")
    val m = TextAnalysis.vocabCoverage(docs, col("text"), Seq(1L, 2L, 10L))
      .collect().map(r => r.getAs[Long]("k") ->
        ((r.getAs[Long]("n_types"), r.getAs[Long]("mass"),
          r.getAs[Double]("frac_mass")))).toMap
    assert(m(1L) == ((1L, 3L, 0.5)))
    assert(m(2L) == ((2L, 5L, 5.0 / 6.0)))
    assert(m(10L) == ((3L, 6L, 1.0))) // cutoff clamps to |V|
  }

  test("calibration bins a perfect scorer to ECE 0 and a wrong one high") {
    // scores equal the true rate within each bin
    val perfect = (Seq.fill(8)((0.95, true)) ++ Seq.fill(2)((0.05, false)))
      .toDF("s", "l")
    val p = Inference.calibration(perfect, col("s"), col("l"), 10)
      .select(max(col("ece"))).head().getDouble(0)
    assert(p < 0.06) // |1.0 - 0.95|·0.8 + |0.0 - 0.05|·0.2 = 0.05
    val wrong = (Seq.fill(5)((0.9, false)) ++ Seq.fill(5)((0.1, true)))
      .toDF("s", "l")
    val w = Inference.calibration(wrong, col("s"), col("l"), 10)
      .select(max(col("ece"))).head().getDouble(0)
    assert(w > 0.8)
  }

  test("churn growth accounting separates new from resurrected arrivals") {
    // user 1: wk0 only; user 2: wk0 and wk2 (resurrects at wk2)
    val rows = Seq((1L, wk(0)), (2L, wk(0)), (2L, wk(2)))
    val df = rows.toDF("u", "t")
      .select(col("u"), timestamp_micros(col("t")).as("ts"))
    val m = Funnel.churn(df, col("u"), col("ts"))
      .collect().map(r => r.getAs[Long]("wk") -> r).toMap
    val w2 = m(2L)
    assert(w2.getAs[Long]("n_new") == 0L)
    assert(w2.getAs[Long]("n_resurrected") == 1L)
    // wk1 has no activity → not an observed week, no row
    assert(!m.contains(1L))
    graft.core.Caches.release()
  }

  test("mannKendall detects a strict monotone trend with z > 0") {
    // counts 1,2,..,8 over 8 days — S = C(8,2) = 28, no ties
    val rows = (0L until 8L).flatMap(d =>
      (1L to (d + 1L)).map(i => ("k", d * 86400000000L + i)))
    val df = rows.toDF("k", "t")
      .select(col("k"), timestamp_micros(col("t")).as("ts"))
    val r = TimeSeries.mannKendall(df, col("k"), col("ts")).head()
    assert(r.getAs[Long]("s_stat") == 28L)
    assert(r.getAs[Long]("var_num18") == 8L * 7L * 21L) // no ties
    val z = (28.0 - 1.0) / math.sqrt(8.0 * 7 * 21 / 18.0)
    assert(math.abs(r.getAs[Double]("z") - z) < 1e-12)
    graft.core.Caches.release()
  }

  test("kaplanMeier matches the hand-computed product-limit curve") {
    // 4 signups at t=0; purchases: u1 day1, u2 day2; u3,u4 censored at
    // horizon day 4 (the last purchase fixes maxT? no — maxT = last
    // event overall: add a day-4 click to pin the horizon)
    val rows = Seq(
      (1L, 0L, "signup"), (2L, 0L, "signup"), (3L, 0L, "signup"),
      (4L, 0L, "signup"),
      (1L, 1L * 86400000000L, "purchase"),
      (2L, 2L * 86400000000L, "purchase"),
      (9L, 4L * 86400000000L, "click"))
    val df = rows.toDF("u", "t", "typ")
      .select(col("u"), timestamp_micros(col("t")).as("ts"), col("typ"))
    val m = TimeSeries.kaplanMeier(df, col("u"), col("ts"), col("typ"),
        "signup", "purchase")
      .collect().map(r => r.getAs[Long]("t_day") -> r).toMap
    // day 1: risk 4, 1 event → S = 3/4 ; day 2: risk 3, 1 event → 1/2
    assert(m(1L).getAs[Long]("n_risk") == 4L)
    assert(math.abs(m(1L).getAs[Double]("survival") - 0.75) < 1e-12)
    assert(m(2L).getAs[Long]("n_risk") == 3L)
    assert(math.abs(m(2L).getAs[Double]("survival") - 0.5) < 1e-12)
    assert(m.size == 2) // censored-only days carry no curve point
  }

  test("lorenz interpolates exactly within tied value groups") {
    // masses: four 1s and one 6 → total 10; bottom 40% (2 rows) hold 2
    val df = Seq(1L, 1L, 1L, 1L, 6L).toDF("x")
    val m = RobustStats.lorenz(df, col("x"), points = 5)
      .collect().map(r => r.getAs[Long]("p") ->
        ((r.getAs[Double]("frac_pop"), r.getAs[Double]("frac_mass"))))
      .toMap
    assert(m(2L) == ((0.4, 0.2)))
    assert(m(4L) == ((0.8, 0.4)))
    assert(m(5L) == ((1.0, 1.0)))
  }

  test("cohortValue accumulates per-cohort value and normalizes by size") {
    // cohort wk0 = {1,2}; u1 spends 1.00 at wk0 and 2.00 at wk1
    val rows = Seq((1L, wk(0), 1.0), (2L, wk(0, 5L), 3.0),
      (1L, wk(1), 2.0))
    val df = rows.toDF("u", "t", "v")
      .select(col("u"), timestamp_micros(col("t")).as("ts"), col("v"))
    val m = Funnel.cohortValue(df, col("u"), col("ts"), col("v"))
      .collect().map(r => (r.getAs[Long]("cohort"),
        r.getAs[Long]("offset")) -> r).toMap
    val c00 = m((0L, 0L))
    assert(c00.getAs[Long]("n_cohort") == 2L)
    assert(c00.getAs[Long]("value_c") == 400L)
    val c01 = m((0L, 1L))
    assert(c01.getAs[Long]("cum_value_c") == 600L)
    assert(math.abs(c01.getAs[Double]("cum_value_per_user") - 3.0) < 1e-12)
  }

  test("labelSeparation: orthogonal tight clusters read separated and cohesive") {
    val vecs = Seq(
      (1L, 0L, Array(1.0f, 0.0f)), (2L, 0L, Array(1.0f, 0.0f)),
      (3L, 1L, Array(0.0f, 1.0f)), (4L, 1L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "label", "embedding")
    val r = Similarity.labelSeparation(vecs, col("vec_id"), col("label"),
      col("embedding")).head()
    assert(r.getAs[Long]("label_a") == 0L && r.getAs[Long]("label_b") == 1L)
    assert(math.abs(r.getAs[Double]("centroid_cos")) < 1e-6)
    assert(r.getAs[Double]("coh_a") > 0.999 && r.getAs[Double]("coh_b") > 0.999)
    graft.core.Caches.release()
  }
}
