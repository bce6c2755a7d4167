package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** ANN-index expressions: cluster/bucket assignment over `ARRAY<FLOAT>`.
  *
  * These are the Spark re-expression of the reference's ANN index *build*
  * (reference: src/core/index/hnsw_index.rs, usearch_index.rs — graph
  * inserts): on Spark an index is a derived *layout column* (cluster id /
  * LSH bucket), computed in one codegen'd map-side pass, that later
  * queries prune on. The centroid/plane matrices ride along as reference
  * objects in generated code — no boxing, no UDF serialization.
  */

/** Index (0-based) of the nearest centroid by squared L2; ties break to
  * the lowest index. The IVF "coarse quantizer".
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Float]])
    extends UnaryExpression {
  override def prettyName: String = "nearest_centroid"
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      val n = math.min(a.numElements(), cent.length)
      var acc = 0.0; var i = 0
      while (i < n) {
        val d = a.getFloat(i).toDouble - cent(i).toDouble
        acc += d * d; i += 1
      }
      if (acc < bestD) { bestD = acc; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cents = ctx.addReferenceObj("centroids", centroids, "float[][]")
      val c = ctx.freshName("c"); val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val cent = ctx.freshName("cent")
      s"""
         |int $best = 0; double $bestD = Double.MAX_VALUE;
         |for (int $c = 0; $c < $cents.length; $c++) {
         |  float[] $cent = $cents[$c];
         |  int $n = java.lang.Math.min($a.numElements(), $cent.length);
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = (double) $a.getFloat($i) - (double) $cent[$i];
         |    $acc += $d * $d;
         |  }
         |  if ($acc < $bestD) { $bestD = $acc; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The `nprobe` nearest centroid indices by squared L2, ascending
  * (distance, index) — the multi-probe coarse quantization used by the
  * batch IVF join (each query row explodes to its probe clusters).
  */
case class NearestCentroids(child: Expression, centroids: Array[Array[Float]], nprobe: Int)
    extends UnaryExpression {
  require(nprobe >= 1)
  override def prettyName: String = "nearest_centroids"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    UnsafeArrayData.fromPrimitiveArray(NearestCentroids.probe(a, centroids, nprobe))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cents = ctx.addReferenceObj("centroids", centroids, "float[][]")
      s"""${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
         |  graft.functions.NearestCentroids.probe($a, $cents, $nprobe));""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Nearest centroid among a ROW-CARRIED candidate set — the fine leg of
  * the two-level (coarse→fine) quantizer: `cands` is an
  * `ARRAY<STRUCT<cluster INT, cv ARRAY<FLOAT>>>` column (one coarse
  * cell's fine centroids, attached by an equi-join on the coarse id),
  * and the result is the `cluster` of the squared-L2 argmin, ties to
  * the FIRST minimal candidate in array order (callers sort the array
  * by cluster id ascending, so ties break to the lowest cluster —
  * matching the oracle's `ORDER BY d2, cluster`). Unlike
  * [[NearestCentroid]] the centroids are DATA, not a codegen literal:
  * the fine table scales with the corpus (K = n/targetClusterSize) and
  * a K-proportional plan literal is exactly what this exists to avoid.
  */
case class NearestCentroidIn(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "nearest_centroid_in"
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  // an EMPTY candidate array yields null, not a wrong-but-plausible
  // cluster id: current callers guarantee non-empty cells (the
  // fallback seeds), but a future caller joining an incomplete fine
  // table must have its row DROP from downstream equi-joins instead of
  // matching a phantom cluster -1
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any, cs: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val cands = cs.asInstanceOf[ArrayData]
    if (cands.numElements() == 0) return null
    var best = -1; var bestD = Double.MaxValue
    var c = 0
    while (c < cands.numElements()) {
      val r = cands.getStruct(c, 2)
      val cv = r.getArray(1)
      val n = math.min(a.numElements(), cv.numElements())
      var acc = 0.0; var i = 0
      while (i < n) {
        val d = a.getFloat(i).toDouble - cv.getFloat(i).toDouble
        acc += d * d; i += 1
      }
      if (acc < bestD) { bestD = acc; best = r.getInt(0) }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, cands) => {
      val c = ctx.freshName("c"); val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val r = ctx.freshName("r"); val cv = ctx.freshName("cv")
      s"""
         |if ($cands.numElements() == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $best = -1; double $bestD = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $cands.numElements(); $c++) {
         |    org.apache.spark.sql.catalyst.InternalRow $r = $cands.getStruct($c, 2);
         |    org.apache.spark.sql.catalyst.util.ArrayData $cv = $r.getArray(1);
         |    int $n = java.lang.Math.min($a.numElements(), $cv.numElements());
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      double $d = (double) $a.getFloat($i) - (double) $cv.getFloat($i);
         |      $acc += $d * $d;
         |    }
         |    if ($acc < $bestD) { $bestD = $acc; $best = $r.getInt(0); }
         |  }
         |  ${ev.value} = $best;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object NearestCentroids {
  /** Selection of the nprobe nearest centroids: O(K · (dim + nprobe)). */
  def probe(a: ArrayData, centroids: Array[Array[Float]], nprobe: Int): Array[Int] = {
    val k = math.min(nprobe, centroids.length)
    val bestD = Array.fill(k)(Double.MaxValue)
    val bestI = Array.fill(k)(-1)
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      val n = math.min(a.numElements(), cent.length)
      var acc = 0.0; var i = 0
      while (i < n) {
        val d = a.getFloat(i).toDouble - cent(i).toDouble
        acc += d * d; i += 1
      }
      if (acc < bestD(k - 1)) {
        var p = k - 1
        while (p > 0 && bestD(p - 1) > acc) {
          bestD(p) = bestD(p - 1); bestI(p) = bestI(p - 1); p -= 1
        }
        bestD(p) = acc; bestI(p) = c
      }
      c += 1
    }
    bestI.filter(_ >= 0)
  }
}

/** Z-order (Morton) bit interleave of two non-negative longs: bit i of
  * `left` lands at result bit 2i, bit i of `right` at 2i+1, `nBits`
  * bits each (≤ 31). Rows sorted by this value cluster in BOTH
  * dimensions at once — the multi-dimensional data-skipping layout
  * (Delta/Iceberg Z-ORDER): min/max stats of a z-sorted file admit
  * pruning on either column, where a single-column sort only prunes
  * its own.
  */
case class InterleaveBits(left: Expression, right: Expression, nBits: Int)
    extends BinaryExpression {
  require(nBits >= 1 && nBits <= 31)
  override def prettyName: String = "interleave_bits"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    InterleaveBits.zip(a.asInstanceOf[Long], b.asInstanceOf[Long], nBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.InterleaveBits.zip($a, $b, $nBits);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object InterleaveBits {
  def zip(a: Long, b: Long, nBits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < nBits) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }
}

/** Sign-bit packing for the binary (hamming) index: bit j of the result
  * is set iff vec[offset + j] > 0 — `width` ≤ 63 bits per word, so a
  * 64-dim float vector compresses to two 32-bit words (8 bytes, 32×).
  * The binary-quantization analog of faiss's IndexBinaryFlat family:
  * candidate ranking is bit_count(xor) on these words, which stays in
  * whole-stage codegen via the built-in bitwise ops.
  */
case class SignBits(child: Expression, offset: Int, width: Int)
    extends UnaryExpression {
  require(offset >= 0 && width >= 1 && width <= 63)
  override def prettyName: String = "sign_bits"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    var word = 0L
    var j = 0
    val n = math.min(width, a.numElements() - offset)
    while (j < n) {
      if (a.getFloat(offset + j) > 0.0f) word |= (1L << j)
      j += 1
    }
    word
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val j = ctx.freshName("j"); val n = ctx.freshName("n")
      val word = ctx.freshName("word")
      s"""
         |long $word = 0L;
         |int $n = java.lang.Math.min($width, $a.numElements() - $offset);
         |for (int $j = 0; $j < $n; $j++) {
         |  if ($a.getFloat($offset + $j) > 0.0f) $word |= (1L << $j);
         |}
         |${ev.value} = $word;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Random-hyperplane LSH bucket: bit i set iff dot(vec, plane_i) > 0.
  * With b planes the bucket is in [0, 2^b).
  */
case class LshBucket(child: Expression, planes: Array[Array[Float]])
    extends UnaryExpression {
  override def prettyName: String = "lsh_bucket"
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    var bucket = 0
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      val n = math.min(a.numElements(), plane.length)
      var acc = 0.0; var i = 0
      while (i < n) { acc += a.getFloat(i).toDouble * plane(i).toDouble; i += 1 }
      if (acc > 0.0) bucket |= (1 << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val pls = ctx.addReferenceObj("planes", planes, "float[][]")
      val p = ctx.freshName("p"); val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc"); val bucket = ctx.freshName("bucket")
      val plane = ctx.freshName("plane")
      s"""
         |int $bucket = 0;
         |for (int $p = 0; $p < $pls.length; $p++) {
         |  float[] $plane = $pls[$p];
         |  int $n = java.lang.Math.min($a.numElements(), $plane.length);
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (double) $a.getFloat($i) * (double) $plane[$i];
         |  }
         |  if ($acc > 0.0) $bucket |= (1 << $p);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
