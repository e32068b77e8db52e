package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Transducer-law properties (SURVEY.md §5): composition via andThen
  * equals step-by-step application; safeFlatMap reproduces the
  * reference's error-swallowing skip (api.clj:21-24).
  */
class XformSpec extends SparkSpec {
  import spark.implicits._

  test("composition law: (f andThen g)(df) == g(f(df))") {
    val df = Seq(1, 2, 3, 4, 5).toDF("n")
    val f = Xform.xfilter(col("n") > 1)
    val g = Xform.xmap((col("n") * 2).as("n"))
    val composed = (f andThen g)(df).as[Int].collect().sorted.toSeq
    val stepwise = g(f(df)).as[Int].collect().sorted.toSeq
    assert(composed == stepwise && composed == Seq(4, 6, 8, 10))
  }

  test("xkeep = map + drop nulls; xmapcat explodes") {
    val df = Seq(("a", 1), ("b", 2)).toDF("s", "n")
    val kept = Xform.xkeep(when(col("n") > 1, col("s")), "v")(df).as[String].collect().toSeq
    assert(kept == Seq("b"))
    val cat = Xform.xmapcat(array(col("n"), col("n") + 10), "v")(df).as[Int].collect().sorted.toSeq
    assert(cat == Seq(1, 2, 11, 12))
  }

  test("safeFlatMap drops poison records and counts them") {
    val ds = Seq("1", "2", "boom", "4").toDS()
    val pipe = Xform.safeFlatMap[String, Int](spark, "test_poison") { s =>
      Iterator.single(s.toInt)
    }
    val out = pipe(ds).collect().sorted.toSeq
    assert(out == Seq(1, 2, 4)) // "boom" swallowed, job alive
  }
}
