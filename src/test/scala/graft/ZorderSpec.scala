package graft

import org.apache.spark.sql.functions._

import graft.functions.InterleaveBits
import graft.sources.Tables

/** Z-order: the interleave must be exactly invertible (even bits = a,
  * odd bits = b), and sorting by z must cluster BOTH dimensions at
  * once — the property that lets min/max file stats skip data on
  * either column, which a single-column sort only provides for itself.
  */
class ZorderSpec extends SparkSpec {

  test("interleave is exactly invertible") {
    val rnd = new scala.util.Random(7)
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L)) ++
      Seq.fill(50)((rnd.nextLong(65536), rnd.nextLong(65536)))
    for ((a, b) <- cases) {
      val z = InterleaveBits.zip(a, b, 16)
      var ra = 0L; var rb = 0L
      for (i <- 0 until 16) {
        ra |= ((z >> (2 * i)) & 1L) << i
        rb |= ((z >> (2 * i + 1)) & 1L) << i
      }
      assert(ra === a && rb === b, s"($a, $b) -> $z")
    }
  }

  test("z-sorted blocks cluster both dimensions; single-column sort does not") {
    val rows = Queries.layoutZorder(spark, sf001)
      .select("user_id", "day_num", "z")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length > 500)
    val userSpanAll = rows.map(_._1).max - rows.map(_._1).min
    val daySpanAll = rows.map(_._2).max - rows.map(_._2).min

    def avgSpans(sorted: Seq[(Long, Long)]): (Double, Double) = {
      val blocks = sorted.grouped(64).filter(_.size == 64).toSeq
      (blocks.map(b => (b.map(_._1).max - b.map(_._1).min).toDouble).sum / blocks.size,
       blocks.map(b => (b.map(_._2).max - b.map(_._2).min).toDouble).sum / blocks.size)
    }
    // the data-skipping figure of merit is the WORST normalized span: a
    // block prunes on a predicate only if the filtered dimension's span
    // is small. z order bounds both; a single-column sort leaves the
    // other dimension at ~the global range.
    def worst(u: Double, d: Double): Double =
      math.max(u / userSpanAll, d / daySpanAll)
    val (zU, zD) = avgSpans(rows.sortBy(r => (r._3, r._1)).map(r => (r._1, r._2)))
    val (uU, uD) = avgSpans(rows.sortBy(r => (r._1, r._2)).map(r => (r._1, r._2)))
    val (dU, dD) = avgSpans(rows.sortBy(r => (r._2, r._1)).map(r => (r._1, r._2)))
    assert(worst(zU, zD) < 0.75, s"z blocks: user $zU/$userSpanAll day $zD/$daySpanAll")
    assert(worst(uU, uD) > 0.9, s"user sort leaves days unclustered (got ${worst(uU, uD)})")
    assert(worst(dU, dD) > 0.9, s"day sort leaves users unclustered (got ${worst(dU, dD)})")
    assert(worst(zU, zD) < 0.8 * math.min(worst(uU, uD), worst(dU, dD)),
      "z order must beat both single-column sorts on the worst dimension")
  }
}
