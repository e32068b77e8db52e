package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Finite-input contract of the raw-double native expressions (r16
  * VERDICT item 10, carried to r17): QDotStats9 / GramMatrixQ /
  * CosineSimilarity / SumSquares quantize with floor(x·scale)→LONG,
  * where a NaN term silently becomes 0 and ±Inf saturates to
  * Long.Max/MinValue — so their input contract is the FiniteVector-
  * guarded embedding relation ([[graft.sources.Tables.embeddings]]).
  * This spec pins BOTH halves: (1) the guard composes — a planted
  * non-finite/non-dense vector never reaches the expression; (2) the
  * unguarded NaN behavior is the documented one, so a future seam that
  * forgets the guard fails loudly here instead of drifting. */
class FiniteContractSpec extends SparkSpec {
  import spark.implicits._

  private val good = Seq(1.0f, 2.0f, -0.5f)
  private val nan  = Seq(1.0f, Float.NaN, 0.5f)
  private val inf  = Seq(Float.PositiveInfinity, 0.25f, 0.25f)

  private def guarded(rows: Seq[Seq[Float]]) =
    rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "embedding")
      .filter(FiniteVector(col("embedding")))

  test("FiniteVector guard drops NaN/Inf vectors before every quantized expression") {
    val df = guarded(Seq(good, nan, inf))
    assert(df.count() == 1L)
    // QDotStats9 over the guarded relation sees only the finite row
    val q = df.select(QDotStats9(col("embedding"),
      array(lit(1.0), lit(1.0), lit(1.0))).as("s"))
      .select(col("s.dq")).as[Long].collect()
    assert(q.toSeq == Seq(
      math.floor(1.0 * 1e9).toLong + math.floor(2.0 * 1e9).toLong +
        math.floor(-0.5 * 1e9).toLong))
    // GramMatrixQ: one finite row → G[0][0] = floor(1*1000+0.5)^2
    val g = df.select(GramMatrixQ(col("embedding"), 3).as("g"))
      .select(element_at(col("g"), 1)).as[Long].head()
    assert(g == 1000L * 1000L)
  }

  test("unguarded NaN/Inf behavior is the documented quantization (pins the contract)") {
    val df = Seq((0L, nan), (1L, inf)).toDF("id", "embedding")
    val q = df.orderBy("id").select(QDotStats9(col("embedding"),
      array(lit(1.0), lit(1.0), lit(1.0))).as("s"))
      .select(col("s.dq")).as[Long].collect()
    // NaN term → floor(NaN)=NaN → toLong 0; +Inf term saturates MaxValue
    // and the later finite terms overflow-wrap — GARBAGE BY DESIGN,
    // which is why the FiniteVector seam must stay upstream.
    assert(q(0) == math.floor(1.0 * 1e9).toLong + 0L +
      math.floor(0.5 * 1e9).toLong)
    assert(q(1) == Long.MaxValue + math.floor(0.25 * 1e9).toLong * 2)
  }

  test("CosineSimilarity and SumSquares on the guarded relation stay finite") {
    val df = guarded(Seq(good, nan, inf))
    val c = df.crossJoin(df.select(col("embedding").as("e2")))
      .select(CosineSimilarity(col("embedding"), col("e2")).as("c"))
      .as[Double].collect()
    assert(c.forall(v => !v.isNaN && !v.isInfinite))
    val s = df.select(SumSquares(col("embedding")).as("s"))
      .as[Double].head()
    assert(!s.isNaN && !s.isInfinite)
  }
}
