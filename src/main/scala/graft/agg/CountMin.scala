package graft.agg

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-Min sketch (Cormode & Muthukrishnan, 2005) as a
  * TypedImperativeAggregate — the frequency-estimation member of the
  * sketch family beside [[HllSketchAgg]] (distinct counts) and the
  * built-in quantile sketch: point-queryable counts of a key stream in
  * d·w fixed space, the structure behind heavy-hitter tracking, skew
  * detection and approximate joins at corpus scale.
  *
  * Layout: d rows × w counters; occurrence of v increments, for each
  * row r ∈ [1,d], counter (r−1)·w + (h_r(v) mod w) where h_r is the
  * engine's standard salted 60-bit md5 hash
  * ([[graft.functions.GraftFunctions.md5Long]] with salt r — the
  * IDENTICAL value `conv(substring(md5('r|'||v),1,15),16,10)` computes
  * in SQL, so probes and the DuckDB oracle replay the exact cells).
  * Merge is elementwise long addition — associative AND commutative,
  * so the sketch is a pure function of the input multiset, independent
  * of partitioning or merge order (unlike a double sum): the full
  * counter array is hash-comparable across engines, which upgrades the
  * usual "within ε·N with probability 1−δ" contract to a bit-exact
  * oracle row. The classic one-sided guarantee still holds by
  * construction: estimate = min_r counter ≥ true count, always.
  *
  * eval() returns the raw d·w counter array (a ~2–8 KB artifact per
  * group); estimates stay declarative — `element_at(cm, (r−1)·w +
  * (md5Long(k, r) % w) + 1)` with `least(...)` across rows — so the
  * probe side runs as a codegen projection against the broadcast
  * 1-row sketch. 100 TB posture: map-side combine ships exactly d·w
  * longs per group per task regardless of input size; no token ever
  * shuffles.
  */
case class CountMinAgg(
    child: Expression,
    depth: Int = 4,
    width: Int = 256,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= 16, s"cm depth must be in [1,16], got $depth")
  require(width >= 2 && width <= (1 << 20), s"cm width must be in [2,2^20], got $width")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  @transient private lazy val md = graft.functions.Md5Base.newDigest()

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val s = v.toString
    var r = 1
    while (r <= depth) {
      // 60-bit salted md5: first 15 hex digits of md5("r|" + v), the
      // md5Long(v, r) value — be64 is the first 16 digits, >>> 4 drops
      // the last one. Non-negative, so % width is already in [0, w).
      val h = graft.functions.Md5Base.be64(md, (r.toString + "|" + s).getBytes("UTF-8")) >>> 4
      buf((r - 1) * width + (h % width).toInt) += 1L
      r += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child) // any input type: hashed via its string form

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def prettyName: String = "count_min_sketch"
}

object CountMinAgg {
  import org.apache.spark.sql.functions._
  import graft.functions.GraftFunctions.md5Long

  /** Column API: `df.agg(CountMinAgg.agg(col("k")))`. */
  def agg(c: Column, depth: Int = 4, width: Int = 256): Column =
    bridge.toColumn(CountMinAgg(bridge.toExpression(c), depth, width).toAggregateExpression())

  /** Declarative point estimate against a sketch column produced by
    * [[agg]]: min over the d rows of the probed cell — must use the
    * same (depth, width) the sketch was built with. */
  def estimate(cm: Column, key: Column, depth: Int = 4, width: Int = 256): Column = {
    val cells = (1 to depth).map { r =>
      element_at(cm,
        ((md5Long(key, r) % width) + (r - 1) * width + 1).cast("int"))
    }
    if (cells.sizeIs == 1) cells.head else least(cells: _*)
  }
}
