package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** First-match branch laws (reference: api.clj:62-88; Kafka 1.0 branch
  * contract): every row lands in AT MOST one branch; it lands in the
  * FIRST predicate that accepts it; non-matching rows are dropped.
  */
class BranchSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(1, 2, 3, 4, 5, 6, 7, 8, 9, 10).toDF("n")
  private val preds = Seq(
    col("n") % 2 === 0,     // evens
    col("n") > 5,           // late odds (7, 9 — NOT 6, 8, 10: first-match)
    col("n") === 11)        // never

  test("branches are disjoint and first-match") {
    val Seq(b0, b1, b2) = Branch.branch(df, preds)
    assert(b0.as[Int].collect().sorted.toSeq == Seq(2, 4, 6, 8, 10))
    assert(b1.as[Int].collect().sorted.toSeq == Seq(7, 9))
    assert(b2.count() == 0)
  }

  test("non-matching rows are dropped (union < input)") {
    val outs = Branch.branch(df, preds)
    val total = outs.map(_.count()).sum
    assert(total == 7) // 1, 3, 5 dropped
  }

  test("branchMap keys follow the ordered Seq") {
    val m = Branch.branchMap(df, Seq("ev" -> preds(0), "hi" -> preds(1)))
    assert(m.keySet == Set("ev", "hi"))
    assert(m("hi").as[Int].collect().sorted.toSeq == Seq(7, 9))
  }

  test("branchTagged agrees with multi-pass branch") {
    val tagged = Branch.branchTagged(df, Seq("ev" -> preds(0), "hi" -> preds(1)))
    val byTag = tagged.filter(col("branch") === "ev").select("n").as[Int].collect().sorted.toSeq
    assert(byTag == Seq(2, 4, 6, 8, 10))
    assert(tagged.filter(col("branch").isNull).select("n").as[Int].collect().sorted.toSeq == Seq(1, 3, 5))
  }
}
