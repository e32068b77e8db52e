package graft.core

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The reference's end-to-end golden test, twice (SURVEY.md §5 level 3,
  * §7.2): pipeline `filter(v non-null) → map(swap k/v) → filter(v="foo")`
  * over inputs {foo→bar, baz→quux} must emit exactly [("bar","foo")]
  * (reference: test/kafka_streams_clojure/api_test.clj:49-67). Batch and
  * streaming share the SAME Pipe — Spark's unified API is the point.
  */
class GoldenPipelineSpec extends SparkSpec {

  private val pipe: Pipe.TPipe =
    Xform.xfilter(col("value").isNotNull) andThen
      Xform.xmap(col("value").as("key"), col("key").as("value")) andThen
      Xform.xfilter(col("value") === "foo")

  test("golden pipeline, batch") {
    import spark.implicits._
    val in = Seq(("foo", "bar"), ("baz", "quux")).toDF("key", "value")
    val out = pipe(in).as[(String, String)].collect().toSeq
    assert(out == Seq(("bar", "foo")))
  }

  test("golden pipeline, streaming (MemoryStream → memory sink)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(String, String)]
    ms.addData(("foo", "bar"), ("baz", "quux"))
    val q = pipe(ms.toDF().toDF("key", "value"))
      .writeStream.format("memory").queryName("golden_out").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val out = spark.table("golden_out").as[(String, String)].collect().toSeq
    assert(out == Seq(("bar", "foo")))
  }
}
