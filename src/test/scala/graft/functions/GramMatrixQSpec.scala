package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[GramMatrixQ]] — the one-pass quantized Gram aggregate behind the
  * r16 pcaPower fold. Pins: exact equality with the driver-side outer
  * product it replaces, short-vector prefix semantics, NULL rows
  * contributing nothing, and merge correctness across partitions. */
class GramMatrixQSpec extends SparkSpec {
  import spark.implicits._

  private def xq(x: Float): Long = math.floor(x * 1000.0 + 0.5).toLong

  test("matches the driver-side quantized outer-product sum exactly") {
    val dim = 4
    val rows = Seq(
      Seq(0.25f, -0.5f, 0.125f, 1.0f),
      Seq(-1.0f, 0.0f, 0.75f, -0.25f),
      Seq(0.1f, 0.2f, 0.3f, 0.4f))
    val expected = new Array[Long](dim * dim)
    rows.foreach { v =>
      val q = v.map(xq)
      for (a <- 0 until dim; b <- 0 until dim)
        expected(a * dim + b) += q(a) * q(b)
    }
    val got = rows.toDF("v")
      .select(col("v").cast("array<float>").as("v"))
      .agg(GramMatrixQ(col("v"), dim).as("g"))
      .as[Seq[Long]].head()
    assert(got == expected.toSeq)
  }

  test("short vectors contribute their prefix; NULL vectors contribute nothing") {
    val dim = 3
    val df = Seq(Some(Seq(1.0f, 2.0f)), None, Some(Seq(0.5f, 0.5f, 0.5f, 9.0f)))
      .toDF("v").select(col("v").cast("array<float>").as("v"))
    val got = df.agg(GramMatrixQ(col("v"), dim).as("g")).as[Seq[Long]].head()
    // row 1: prefix (1000, 2000); row 3: first 3 of (500,500,500,9000)
    val expected = Array.ofDim[Long](9)
    val r1 = Seq(1000L, 2000L)
    for (a <- 0 until 2; b <- 0 until 2) expected(a * dim + b) += r1(a) * r1(b)
    for (a <- 0 until 3; b <- 0 until 3) expected(a * dim + b) += 500L * 500L
    assert(got == expected.toSeq)
  }

  test("partial-merge parity: repartitioned input gives the identical matrix") {
    val dim = 8
    val vecs = (0 until 200).map(i =>
      (0 until dim).map(j => ((i * 31 + j * 17) % 13 - 6) / 7.0f))
    val one = vecs.toDF("v").coalesce(1)
      .select(col("v").cast("array<float>").as("v"))
      .agg(GramMatrixQ(col("v"), dim)).as[Seq[Long]].head()
    val many = vecs.toDF("v").repartition(7)
      .select(col("v").cast("array<float>").as("v"))
      .agg(GramMatrixQ(col("v"), dim)).as[Seq[Long]].head()
    assert(one == many)
  }
}
