package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The non-finite embedding quarantine (r14 VERDICT item 1): one NaN/Inf
  * row must degrade (drop) instead of killing 20+ ANN/cosine queries. */
class FiniteVectorSpec extends SparkSpec {

  private def df(vecs: Seq[Seq[java.lang.Float]]) = {
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType, containsNull = true))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        vecs.zipWithIndex.map { case (v, i) =>
          Row(i.toLong, if (v == null) null else v)
        }),
      schema)
  }

  private val fin = Seq[java.lang.Float](1.0f, -2.5f, 0.0f)
  private val nan = Seq[java.lang.Float](1.0f, Float.NaN, 0.0f)
  private val pinf = Seq[java.lang.Float](Float.PositiveInfinity, 1.0f)
  private val ninf = Seq[java.lang.Float](1.0f, Float.NegativeInfinity)
  private val hole = Seq[java.lang.Float](1.0f, null, 3.0f)

  test("FiniteVector: finite true; NaN/±Inf/NULL-element false; NULL vector null") {
    val d = df(Seq(fin, nan, pinf, ninf, hole, null))
      .select(col("vec_id"), FiniteVector(col("embedding")).as("ok"))
      .orderBy("vec_id").collect()
    assert(d.map(r => if (r.isNullAt(1)) "null" else r.getBoolean(1).toString)
      .toSeq === Seq("true", "false", "false", "false", "false", "null"))
  }

  test("interpreted eval matches codegen") {
    // force interpreted path through a literal-free eval via collect on
    // a non-codegen context: compare against direct expression eval
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    def ev(v: Seq[java.lang.Float]): Any = {
      val arr = if (v == null) null
        else ArrayData.toArrayData(v.map(x =>
          if (x == null) null else x.floatValue()).toArray)
      FiniteVector(Literal(arr, ArrayType(FloatType, containsNull = true))).eval(null)
    }
    assert(ev(fin) === true); assert(ev(nan) === false)
    assert(ev(pinf) === false); assert(ev(ninf) === false)
    assert(ev(hole) === false); assert(ev(null) === null)
  }

  test("Tables.embeddings drops exactly the malformed rows, keeps NULL vectors") {
    val dir = java.nio.file.Files.createTempDirectory("finvec").toString
    df(Seq(fin, nan, pinf, ninf, hole, null))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val kept = graft.sources.Tables.embeddings(spark, dir)
      .select("vec_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq === Seq(0L, 5L)) // the finite row and the NULL vector
    val raw = graft.sources.Tables.rawEmbeddings(spark, dir).count()
    assert(raw === 6L) // quarantine count = 4
  }
}
