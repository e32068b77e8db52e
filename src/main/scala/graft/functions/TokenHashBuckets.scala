package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-token hash buckets in one native pass: the whitespace tokens of
  * `child`, each mapped to `md5Long(token, salt) % mod` — i.e.
  * value-identical to `transform(tokens(text), t => md5Long(t, salt)
  * % mod)` under the engine-wide md5Long convention (top 60 digest
  * bits of `salt + "|" + token`, or of the bare token when salt = 0).
  *
  * Why native: the hashed-unigram family (KL/JS drift, DSIR) explodes
  * a corpus-sized token stream and buckets each token; the composed
  * md5Long routes every token through hex-string materialization
  * (md5 → substring → conv) and, where a lambda wraps it, interpreted
  * eval. Here each token's digest reads its byte range straight out of
  * the document's backing array, the salt prefix is a pre-encoded byte
  * block, and the hex roundtrip disappears. The exploded stream also
  * carries 8-byte longs instead of token strings. Measured isolated
  * at sf0.1: q_dsir 1.1 s → 0.5 s, q_js_sources 1.5 s → 1.3 s;
  * FunctionsSpec pins value parity against the composed form.
  *
  * Tokenization matches [[Tokens]] with fold = false (split on every
  * single 0x20 byte, drop empties).
  */
case class TokenHashBuckets(child: Expression, salt: Int, mod: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"token_hash_buckets expects string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    TokenHashBuckets.build(input.asInstanceOf[UTF8String], salt, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.TokenHashBuckets.build($t, $salt, ${mod}L);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = s"token_hash_buckets($salt, $mod)"
}

object TokenHashBuckets {

  def apply(text: Column, salt: Int, mod: Long): Column =
    bridge.toColumn(TokenHashBuckets(bridge.toExpression(text), salt, mod))

  /** Shared eval body: interpreted `nullSafeEval` and the generated
    * code both call this. */
  def build(text: UTF8String, salt: Int, mod: Long): ArrayData = {
    val prefix: Array[Byte] =
      if (salt == 0) Array.emptyByteArray
      else (salt.toString + "|").getBytes("UTF-8")
    val b = text.getBytes
    val n = b.length
    val md = Md5Base.newDigest()
    val out = new scala.collection.mutable.ArrayBuffer[Any](8)
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || b(i) == 0x20) {
        if (i > start) {
          md.reset()
          if (prefix.nonEmpty) md.update(prefix)
          md.update(b, start, i - start)
          val d = md.digest()
          var be = 0L
          var j = 0
          while (j < 8) { be = (be << 8) | (d(j) & 0xFFL); j += 1 }
          out += java.lang.Long.valueOf((be >>> 4) % mod)
        }
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
