package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Order-sensitive transducer twins over an explicit (key, seq) order
  * (SURVEY.md §2.2): dedupe drops CONSECUTIVE duplicates only;
  * take/drop/while respect the per-key prefix semantics.
  */
class OrderedOpsSpec extends SparkSpec {
  import spark.implicits._

  // (key, seq, v): key a = [1,1,2,1,1], key b = [5,5,5]
  private def df = Seq(
    ("a", 1, 1), ("a", 2, 1), ("a", 3, 2), ("a", 4, 1), ("a", 5, 1),
    ("b", 1, 5), ("b", 2, 5), ("b", 3, 5)).toDF("k", "seq", "v")

  private val part = Seq(col("k")); private val ord = Seq(col("seq"))

  test("dedupe keeps run heads only") {
    val out = OrderedOps.dedupe(df, col("v"), part, ord)
      .select("k", "seq").as[(String, Int)].collect().toSet
    assert(out == Set(("a", 1), ("a", 3), ("a", 4), ("b", 1)))
  }

  test("takeOrdered / dropOrdered split the per-key prefix") {
    val take = OrderedOps.takeOrdered(df, 2, part, ord).select("k", "seq").as[(String, Int)].collect().toSet
    val drop = OrderedOps.dropOrdered(df, 2, part, ord).select("k", "seq").as[(String, Int)].collect().toSet
    assert(take == Set(("a", 1), ("a", 2), ("b", 1), ("b", 2)))
    assert(drop == Set(("a", 3), ("a", 4), ("a", 5), ("b", 3)))
    assert((take ++ drop).size == 8)
  }

  test("takeWhile stops at first failure; dropWhile is its complement") {
    val tw = OrderedOps.takeWhile(df, col("v") === 1, part, ord)
      .select("k", "seq").as[(String, Int)].collect().toSet
    assert(tw == Set(("a", 1), ("a", 2))) // a fails at seq=3; b fails immediately
    val dw = OrderedOps.dropWhile(df, col("v") === 1, part, ord)
      .select("k", "seq").as[(String, Int)].collect().toSet
    assert(dw.size == 6 && !dw.contains(("a", 1)))
  }

  test("partitionByRuns assigns increasing run ids per value run") {
    val runs = OrderedOps.partitionByRuns(df, col("v"), part, ord)
      .filter(col("k") === "a").orderBy("seq")
      .select(col("run_id").cast("int")).as[Int].collect().toSeq
    assert(runs == Seq(1, 1, 2, 3, 3))
  }

  test("partitionAll chunks in order") {
    val chunks = OrderedOps.partitionAll(df, 2, part, ord)
      .filter(col("k") === "a").orderBy("seq")
      .select(col("chunk_id").cast("int")).as[Int].collect().toSeq
    assert(chunks == Seq(0, 0, 1, 1, 2))
  }
}
