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

/** Per-language stopword votes in ONE pass over the token array:
  * result[i] = #tokens contained in sets(i). The per-language
  * `size(filter(toks, isin(...)))` chain walks the array once per
  * language with interpreted lambdas; this is a single codegen'd scan
  * against hash sets carried as a reference object.
  */
case class StopwordVotes(child: Expression, sets: Array[Array[String]])
    extends UnaryExpression {
  @transient private lazy val lookup: Array[java.util.HashSet[String]] =
    sets.map { s => val h = new java.util.HashSet[String](); s.foreach(h.add); h }

  override def prettyName: String = "stopword_votes"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    StopwordVotes.count(v.asInstanceOf[ArrayData], lookup)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val sets = ctx.addReferenceObj("lookup", lookup, "java.util.HashSet[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.StopwordVotes.count($a, $sets);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StopwordVotes {
  def count(arr: ArrayData, lookup: Array[java.util.HashSet[String]]): ArrayData = {
    val votes = new Array[Int](lookup.length)
    var i = 0
    while (i < arr.numElements()) {
      val t = arr.getUTF8String(i).toString
      var j = 0
      while (j < lookup.length) {
        if (lookup(j).contains(t)) votes(j) += 1
        j += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(votes)
  }
}

/** Space-joined word n-shingles of a token array in ONE pass —
  * bit-identical to the built-in chain
  * `transform(sequence(1, size(toks) - (n-1)), i -> concat_ws(' ',
  * element_at(toks, i) … element_at(toks, i+n-1)))` (with the short-
  * input empty guard), which re-evaluates an interpreted lambda with n
  * element_at calls per shingle — the linear cousin of the nested-HOF
  * trap. Feeds the bigram family (LM table, LM scoring, TextRank).
  */
case class WordShingleStrings(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1)
  override def prettyName: String = "word_shingle_strings"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    WordShingleStrings.join(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.WordShingleStrings.join($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingleStrings {
  private val Sep = UTF8String.fromString(" ")

  def join(arr: ArrayData, n: Int): ArrayData = {
    val cnt = arr.numElements() - n + 1
    if (cnt <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](cnt)
    var i = 0
    while (i < cnt) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(Sep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
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
