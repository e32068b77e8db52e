package graft.agg

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed Aggregator (SURVEY.md §7.3): MinHash-union across rows.
  *
  * The element-wise minimum of per-row MinHash signatures IS the MinHash
  * signature of the union of the rows' shingle sets — so grouping by any
  * key and folding with this aggregator yields a group-level sketch
  * (e.g. one signature per source/corpus shard) whose pairwise similarity
  * estimates the Jaccard similarity between whole groups. Sketch size is
  * constant, the merge is associative+commutative → map-side partial
  * aggregation applies, which is what makes a 100 TB group-sketch one
  * cheap shuffle of k longs per group.
  *
  * Inputs are signatures from [[graft.functions.MinHashSignature]]
  * (non-null elements; documents shorter than the shingle width produce
  * null elements and must be filtered out before aggregating).
  */
class MinHashUnion(k: Int) extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
    var i = 0
    val n = math.min(k, sig.length)
    while (i < n) { if (sig(i) < buf(i)) buf(i) = sig(i); i += 1 }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoders.longArray
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoders.longSeq
}

private object ExpressionEncoders {
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  val longArray: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  val longSeq: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

object MinHashUnion {
  /** Column-API form: `df.groupBy(key).agg(MinHashUnion.agg(16)(col("sig")))`. */
  def agg(k: Int): Column => Column = {
    val fn = udaf(new MinHashUnion(k), ExpressionEncoders.longSeq)
    (c: Column) => fn(c)
  }
}
