package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shingle-hash kernels. One pass, tight loops, no per-element expression
  * interpretation — the nested higher-order-function formulation
  * (`transform(wordShingles(...), tokenHash60)`) measured ~40× slower at
  * sf0.1 because Catalyst evaluates nested lambdas interpretively per
  * element.
  *
  * Hash semantics are EXACTLY `conv(substr(md5(s), 1, 15), 16, 10)` —
  * the first 60 bits of the md5 of the UTF-8 bytes — so the DuckDB
  * oracles reproduce them with portable SQL.
  */
object Hash60 {
  private val SPACE = UTF8String.fromString(" ")

  /** First 15 hex digits (60 bits) of md5(bytes) as a long. */
  def md5_60(bytes: Array[Byte]): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    var acc = 0L
    var i = 0
    while (i < 15) {
      val b = d(i / 2) & 0xff
      val nib = if (i % 2 == 0) b >>> 4 else b & 0xf
      acc = acc * 16 + nib
      i += 1
    }
    acc
  }

  /** Hashes of word n-gram shingles (space-joined) over a string array.
    * Empty result (fewer than n tokens) is an empty array — [[MinHashSig]]
    * maps that to null, [[SimHash60]] to 0, matching the built-in chain.
    */
  def wordShingleHashes(arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements() - n + 1
    if (m <= 0) return UnsafeArrayData.fromPrimitiveArray(new Array[Long](0))
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      if (n == 1) {
        out(i) = md5_60(arr.getUTF8String(i).getBytes)
      } else {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
        out(i) = md5_60(UTF8String.concatWs(SPACE, parts: _*).getBytes)
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Hashes of character n-gram shingles of a string. */
  def charShingleHashes(s: UTF8String, n: Int): ArrayData = {
    val m = s.numChars() - n + 1
    if (m <= 0) return UnsafeArrayData.fromPrimitiveArray(new Array[Long](0))
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      out(i) = md5_60(s.substringSQL(i + 1, n).getBytes)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  private val PolyMod = 1000000007L

  /** Base-31 mod-1e9+7 polynomial hashes of every char n-shingle over
    * the CODE POINTS (matching RollingFingerprint / the oracle's
    * ascii(substr) walk). O(n) work per gram with zero allocation.
    */
  def charShinglePolys(s: UTF8String, n: Int): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val m = cps.length - n + 1
    if (m <= 0) return UnsafeArrayData.fromPrimitiveArray(new Array[Long](0))
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      var acc = 0L
      var j = 0
      while (j < n) { acc = (acc * 31L + cps(i + j)) % PolyMod; j += 1 }
      out(i) = acc
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** |A ∩ B| for two ASCENDING-sorted long arrays via a single merge scan —
  * no hash sets, no allocation. Callers produce inputs with
  * `sort_array(array_distinct(...))`; Jaccard then follows from
  * |A∪B| = |A| + |B| − |A∩B|. ~40× cheaper than `array_intersect` +
  * `array_union` on the near-dup pair loop.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String = "sorted_intersect_size"
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j"); val c = ctx.freshName("c")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $na = $a.numElements(); int $nb = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $na && $j < $nb) {
         |  long $x = $a.getLong($i); long $y = $b.getLong($j);
         |  if ($x == $y) { $c++; $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** tokenHash60 over every word n-shingle of a token array, in one pass. */
case class WordShingleHash60(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1)
  override def prettyName: String = "word_shingle_hash60"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    Hash60.wordShingleHashes(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Hash60.wordShingleHashes($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Base-31 mod-1e9+7 polynomial hash of every char n-shingle, in one
  * pass over the code points — the same cross-engine-proven polynomial
  * as [[RollingFingerprint]]/[[WinnowHashes]] (the DuckDB twin is a
  * `list_reduce` over `ascii(substr(...))`). ~1000× cheaper per gram
  * than [[CharShingleHash60]]'s md5 (no digest, no per-gram
  * allocation); the 1e9+7 hash space means rare corpus-wide collisions,
  * identical on both engines (the winnowing trade, accepted there too).
  */
case class CharShinglePoly(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1)
  override def prettyName: String = "char_shingle_poly"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    Hash60.charShinglePolys(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Hash60.charShinglePolys($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** tokenHash60 over every char n-shingle of a string, in one pass. */
case class CharShingleHash60(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1)
  override def prettyName: String = "char_shingle_hash60"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    Hash60.charShingleHashes(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Hash60.charShingleHashes($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
