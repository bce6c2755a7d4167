package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling-hash fingerprint (base 31 mod 1e9+7) over the
  * code-point stream — one codegen pass, bit-identical to the built-in
  * chain `aggregate(transform(sequence(1, length(t)), i ->
  * ascii(substring(t, i, 1))), 0, (acc, c) -> (acc*31 + c) % 1000000007)`
  * (Spark's `ascii` is codePointAt(0); `substring` counts code points),
  * which re-evaluates interpreted lambdas per CHARACTER — the same
  * nested-HOF trap the tokenizer kernels fixed, just smaller per step.
  * Empty input fingerprints to 0 (the chain needs an explicit guard
  * because sequence(1, 0) counts down; the loop gets it for free).
  */
case class RollingFingerprint(child: Expression) extends UnaryExpression {
  override def prettyName: String = "rolling_fingerprint"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    RollingFingerprint.hash(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.RollingFingerprint.hash($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingFingerprint {
  private val Mod = 1000000007L

  def hash(s: UTF8String): Long = {
    val t = s.toString
    var acc = 0L
    var i = 0
    val n = t.length
    while (i < n) {
      val cp = t.codePointAt(i)
      acc = (acc * 31L + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }
}

/** Σ length(element) over an ARRAY<STRING> in one pass (lengths in code
  * points, matching `length(t)`), replacing the interpreted
  * `aggregate(transform(toks, t -> length(t)), ...)` chain in the
  * quality score's mean-token-length.
  */
case class SumStrLen(child: Expression) extends UnaryExpression {
  override def prettyName: String = "sum_str_len"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    SumStrLen.sum(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SumStrLen.sum($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SumStrLen {
  def sum(arr: ArrayData): Long = {
    var acc = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      acc += arr.getUTF8String(i).numChars()
      i += 1
    }
    acc
  }
}
