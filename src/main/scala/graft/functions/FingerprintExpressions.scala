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

/** Winnowing fingerprint selection (Schleimer, Wilkerson, Aiken,
  * SIGMOD 2003 — the MOSS algorithm): hash every char k-gram with the
  * base-31 mod-1e9+7 polynomial (the [[RollingFingerprint]] math applied
  * per gram), slide a w-gram window and keep each window's minimum;
  * the result is the SORTED DISTINCT selected hashes. Guarantee: two
  * documents sharing a substring of ≥ w + k − 1 chars share ≥ 1
  * fingerprint — while storing ~2/(w+1) of the grams. Strings shorter
  * than k select nothing; with fewer than w grams the single window is
  * the whole gram list. One codegen pass, O(n·k) work, bounded memory.
  */
case class WinnowHashes(child: Expression, k: Int, w: Int) extends UnaryExpression {
  require(k >= 2 && w >= 1)
  override def prettyName: String = "winnow_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    ArrayData.toArrayData(WinnowHashes.select(v.asInstanceOf[UTF8String], k, w))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
         |  graft.functions.WinnowHashes.select($a, $k, $w));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowHashes {
  private val Mod = 1000000007L

  def select(s: UTF8String, k: Int, w: Int): Array[Long] = {
    // code points, matching RollingFingerprint / the oracle's substr walk
    val t = s.toString
    val cps = t.codePoints().toArray
    val n = cps.length
    if (n < k) return Array.emptyLongArray
    val nGrams = n - k + 1
    val grams = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      var acc = 0L
      var j = 0
      while (j < k) { acc = (acc * 31L + cps(i + j)) % Mod; j += 1 }
      grams(i) = acc
      i += 1
    }
    val nWin = math.max(1, nGrams - w + 1)
    val selected = new java.util.TreeSet[java.lang.Long]()
    var jw = 0
    while (jw < nWin) {
      var mn = Long.MaxValue
      var j = jw
      val end = math.min(jw + w, nGrams)
      while (j < end) { if (grams(j) < mn) mn = grams(j); j += 1 }
      selected.add(mn)
      jw += 1
    }
    val out = new Array[Long](selected.size())
    val it = selected.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    out
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
