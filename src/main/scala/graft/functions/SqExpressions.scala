package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Squared L2 distance between `query` and the SQ8
  * (scalar-quantization, faiss "SQ8" analog) RECONSTRUCTION of the
  * input vector: per dimension the float is quantized to the byte
  * code = clamp(⌊(x−mn)/(mx−mn)·255 + 0.5⌋, 0, 255) and reconstructed
  * as mn + code/255·(mx−mn) before the distance accumulates. One
  * codegen pass — quantize, reconstruct and score without ever
  * materializing the codes (the engine's SQ8 contract is "rank as if
  * the table were stored at 1 byte/dim"); `mins`/`maxs` are the
  * per-dimension training bounds, `query` the probe. All arithmetic is
  * exactly-rounded IEEE double in fixed dimension order, so the DuckDB
  * oracle reproduces it bit-for-bit from the same bounds.
  */
case class Sq8ReconstructL2Sq(child: Expression,
                              mins: Array[Double], maxs: Array[Double],
                              query: Array[Float]) extends UnaryExpression {
  override def prettyName: String = "sq8_reconstruct_l2sq"
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    Sq8ReconstructL2Sq.score(v.asInstanceOf[ArrayData], mins, maxs, query)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mn = ctx.addReferenceObj("mins", mins, "double[]")
    val mx = ctx.addReferenceObj("maxs", maxs, "double[]")
    val q = ctx.addReferenceObj("query", query, "float[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Sq8ReconstructL2Sq.score($a, $mn, $mx, $q);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Sq8ReconstructL2Sq {
  def score(arr: ArrayData, mins: Array[Double], maxs: Array[Double],
            query: Array[Float]): Double = {
    val n = math.min(arr.numElements(), math.min(mins.length, query.length))
    var acc = 0.0
    var i = 0
    while (i < n) {
      val mn = mins(i); val mx = maxs(i)
      val r =
        if (mx > mn) {
          val x = arr.getFloat(i).toDouble
          val code = math.min(255.0, math.max(0.0, math.floor((x - mn) / (mx - mn) * 255.0 + 0.5)))
          mn + code / 255.0 * (mx - mn)
        } else mn
      val d = query(i).toDouble - r
      acc += d * d
      i += 1
    }
    acc
  }
}
