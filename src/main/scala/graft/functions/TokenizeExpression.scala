package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass word tokenizer: maximal runs of [A-Za-z0-9] in the ORIGINAL
  * text, each ASCII-lowercased — bit-identical to
  * `filter(split(lower(regexp_replace(text, '[^A-Za-z0-9]+', ' ')), ' '), len > 0)`.
  * (The regex runs before `lower`, so the token-character class is tested
  * on the original text; token content is then pure ASCII, where Spark's
  * `lower` is a plain A-Z→a-z map. ASCII bytes never occur inside UTF-8
  * multibyte sequences, so the byte scan is Unicode-safe.)
  * The regex chain measured ~0.7 ms/row interpreted; this is a single
  * codegen'd scan.
  */
object Tokenize {
  private def isTokenByte(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') || (b >= '0' && b <= '9')

  def wordTokens(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val out = new ArrayBuffer[UTF8String](16)
    var i = 0
    val n = bytes.length
    while (i < n) {
      if (isTokenByte(bytes(i))) {
        var j = i + 1
        while (j < n && isTokenByte(bytes(j))) j += 1
        val tok = new Array[Byte](j - i)
        var k = 0
        while (k < j - i) {
          val b = bytes(i + k)
          tok(k) = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
          k += 1
        }
        out += UTF8String.fromBytes(tok)
        i = j
      } else i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }
}

case class TokenizeWords(child: Expression) extends UnaryExpression {
  override def prettyName: String = "tokenize_words"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    Tokenize.wordTokens(v.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Tokenize.wordTokens($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
