package graft.agg

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** HyperLogLog distinct-count sketch as a TypedImperativeAggregate —
  * the custom-aggregate API tier below [[MinHashUnion]]'s typed
  * `Aggregator` (SURVEY.md §7.3): the buffer is a raw register array
  * serialized by the engine between partial and final aggregation, so
  * map-side combine ships exactly 2^p bytes per group regardless of
  * input cardinality. That constant-size mergeable sketch is what makes
  * a 100 TB distinct count one cheap shuffle: registers max-merge, which
  * is associative, commutative and idempotent — the result is therefore
  * INDEPENDENT of partitioning (asserted in AggregatesSpec), unlike a
  * double sum.
  *
  * Hashing uses the md5-derived 64-bit value of the input's string form
  * (same basis as [[graft.functions.GraftFunctions.md5Long]]), so the
  * estimate is a pure function of the input VALUE SET — reproducible
  * across runs, partitionings and engines. Standard HLL estimator with
  * linear-counting small-range correction (Flajolet et al., 2007).
  *
  * Spark's own `approx_count_distinct` is the production choice; this
  * exists to keep the whole sketch pipeline (register layout, merge,
  * correction) inside the engine where the reference's "any function"
  * surface (reference: src/kafka_streams_clojure/api.clj:157-159) would
  * have put user code.
  */
case class HllSketchAgg(
    child: Expression,
    p: Int = 11,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 4 && p <= 16, s"hll precision p must be in [4,16], got $p")

  private val m = 1 << p

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  @transient private lazy val md = graft.functions.Md5Base.newDigest()

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) return buf
    val h = graft.functions.Md5Base.be64(md, v.toString.getBytes("UTF-8"))
    val idx = (h >>> (64 - p)).toInt
    // rank: leading zeros of the remaining (64-p) bits, capped, + 1
    val rest = h << p
    val rank = (java.lang.Long.numberOfLeadingZeros(rest | (1L << (p - 1))) + 1).toByte
    if (rank > buf(idx)) buf(idx) = rank
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      sum += math.pow(2.0, -buf(i).toDouble)
      if (buf(i) == 0) zeros += 1
      i += 1
    }
    val e = alpha * m * m / sum
    val corrected =
      if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else e
    math.round(corrected)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child) // any input type: hashed via its string form

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def prettyName: String = "hll_sketch"
}

object HllSketchAgg {

  /** Column API: `df.groupBy(k).agg(HllSketchAgg.agg(col("x")))`. */
  def agg(c: Column, p: Int = 11): Column =
    bridge.toColumn(HllSketchAgg(bridge.toExpression(c), p).toAggregateExpression())
}
