package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word w-shingles as a single native expression: overlapping windows of
  * `w` tokens joined by a single space; empty array when the document has
  * fewer than `w` tokens. Identical values to the HOF composition
  * (`transform(sequence(...), i -> array_join(slice(tokens, i+1, w)))`)
  * but one native pass instead of per-shingle lambda-chain evaluation —
  * the shingle build dominated the minhash pipeline once the signature
  * itself went native. Null tokens are skipped inside a window (the
  * `array_join` of the HOF form drops null elements and their separator).
  */
case class Shingles(child: Expression, w: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingles expects array<string>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - w + 1)
    val space = UTF8String.fromString(" ")
    var i = 0
    while (i <= n - w) {
      val buf = new scala.collection.mutable.ArrayBuffer[UTF8String](2 * w - 1)
      var j = 0
      while (j < w) {
        val t = toks.getUTF8String(i + j)
        if (t != null) {
          if (buf.nonEmpty) buf += space
          buf += t
        }
        j += 1
      }
      out(i) = UTF8String.concat(buf.toSeq: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "shingles"
}

object Shingles {
  def apply(tokens: Column, w: Int): Column =
    bridge.toColumn(Shingles(bridge.toExpression(tokens), w))
}
