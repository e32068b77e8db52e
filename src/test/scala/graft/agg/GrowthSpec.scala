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
