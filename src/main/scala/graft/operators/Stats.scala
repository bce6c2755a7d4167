package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact-integer statistical operators. Parallel double summation is
  * order-nondeterministic (IEEE addition does not associate), so
  * anything built on Σx / Σx² naively cannot hash-match an oracle —
  * instead values are fixed to integers at a declared scale and the
  * moment sums run in DECIMAL(38) (exact in any aggregation order,
  * like DuckDB's int128 sums), making the decision boundary itself
  * exact: no epsilon, no flaky boundary rows at any cluster size.
  */
object Stats {

  /** Per-key k-sigma outliers with a fully integer decision rule.
    * With n rows per key, integer values x (the input scaled by
    * 10^scale and rounded), S = Σx, Q = Σx²:
    *
    *   |x − μ| > k·σ  ⇔  (n·x − S)² > k²·(n·Q − S²)
    *
    * — both sides exact integers, so membership is reproducible
    * bit-for-bit. One partial aggregation per key + one broadcast join
    * of the tiny per-key moment table back onto the stream; returns the
    * outlier rows.
    */
  def sigmaOutliers(df: DataFrame, keyCol: String, valueCol: String,
                    k: Int = 3, scale: Int = 4): DataFrame = {
    require(k >= 1 && scale >= 0 && scale <= 9)
    val p = math.pow(10, scale)
    // floor of the binary value — identical in every IEEE engine (the
    // decimal-string rounding of round() is not; see Oracles notes)
    val x = floor(col(valueCol) * p + lit(0.5)).cast("decimal(38,0)")
    val scaled = df.withColumn("x", x)
    val moments = scaled.groupBy(col(keyCol).as("mk"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("x")).as("s"),
        sum(col("x") * col("x")).as("q"))
    scaled.join(broadcast(moments), col(keyCol) === col("mk"))
      .where({
        val lhs = (col("n") * col("x") - col("s"))
        val rhs = (col("n") * col("q") - col("s") * col("s"))
        lhs * lhs > lit(k * k) * rhs
      })
      .drop("mk", "x", "n", "s", "q")
  }
}
