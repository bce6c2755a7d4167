package graft

import org.apache.spark.sql.functions._

import graft.functions._

case class Vecs(id: Long, a: Array[Float], b: Array[Float])

class VectorExpressionsSpec extends SparkSpec {
  import scala.util.Random

  private def naiveDot(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0; var i = 0
    while (i < math.min(a.length, b.length)) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  private lazy val rows: Seq[Vecs] = {
    val rnd = new Random(11)
    (0 until 200).map(i => Vecs(i.toLong,
      Array.fill(64)(rnd.nextGaussian().toFloat),
      Array.fill(64)(rnd.nextGaussian().toFloat)))
  }

  test("vecDot / vecL2Sq / vecCosine / vecNorm match naive double loops") {
    val s = spark; import s.implicits._
    val got = rows.toDF()
      .select(col("id"), vecDot(col("a"), col("b")).as("dot"),
        vecL2Sq(col("a"), col("b")).as("l2sq"),
        vecCosine(col("a"), col("b")).as("cos"),
        vecNorm(col("a")).as("nrm"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap

    rows.foreach { v =>
      val (dot, l2sq, cos, nrm) = got(v.id)
      assert(dot === naiveDot(v.a, v.b))
      val el2 = v.a.zip(v.b).foldLeft(0.0) { case (acc, (x, y)) =>
        acc + (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble) }
      assert(l2sq === el2)
      val na = math.sqrt(naiveDot(v.a, v.a)); val nb = math.sqrt(naiveDot(v.b, v.b))
      assert(cos === naiveDot(v.a, v.b) / (na * nb))
      assert(nrm === na)
    }
  }

  test("simHash60 is deterministic, 60-bit, and 0 for empty token arrays") {
    val s = spark; import s.implicits._
    val df = Seq(("a b c a b", 1L), ("", 2L), ("a b c a b", 3L)).toDF("text", "id")
    val sigs = df.select(col("id"),
        simHash60(transform(wordTokens(col("text")), t => tokenHash60(t))).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) === sigs(3L))
    assert(sigs(2L) === 0L)
    assert(sigs(1L) >= 0L && sigs(1L) < (1L << 60))
  }

  test("tokenize kernel matches the built-in regex chain") {
    val s = spark; import s.implicits._
    val df = Seq("Hello, World! 42x", "  a--b__c  ", "", "ÜBER straße 1; ok", "ab\ncd\tef")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val a = df.select(col("id"), wordTokens(col("text")).as("t")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val b = df.select(col("id"), wordTokensBuiltin(col("text")).as("t")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(a === b)
  }

  test("charShinglePoly matches a naive per-gram polynomial (incl. edge cases)") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions._
    def naive(t: String, n: Int): Seq[Long] = {
      val cps = t.codePoints().toArray
      (0 to cps.length - n).map { i =>
        cps.slice(i, i + n).foldLeft(0L)((a, c) => (a * 31L + c) % 1000000007L)
      }
    }
    val texts = Seq("", "ab", "abc", "hello world spark", "aaaaaaaa", "héllo wörld ☃ snow")
    val got = texts.toDF("t")
      .select(graft.functions.charShinglePoly(col("t"), 3).as("g"))
      .collect().map(_.getSeq[Long](0).toSeq)
    assert(got.toSeq === texts.map(naive(_, 3)))
    val got8 = texts.toDF("t")
      .select(graft.functions.charShinglePoly(col("t"), 8).as("g"))
      .collect().map(_.getSeq[Long](0).toSeq)
    assert(got8.toSeq === texts.map(naive(_, 8)))
  }

  test("wordShingleHash60 / charShingleHash60 match the built-in transform chain") {
    val s = spark; import s.implicits._
    val df = Seq("the quick brown fox jumps", "ab", "", "one two three")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val toks = wordTokensBuiltin(col("text"))
    val viaBuiltins = df.select(col("id"),
        transform(wordShingles(toks, 3), sh => tokenHash60(sh)).as("w"),
        transform(charShingles(col("text"), 3), g => tokenHash60(g)).as("c"))
      .collect().map(r => r.getLong(0) -> (r.getSeq[Long](1), r.getSeq[Long](2))).toMap
    val viaKernel = df.select(col("id"),
        wordShingleHash60(wordTokens(col("text")), 3).as("w"),
        charShingleHash60(col("text"), 3).as("c"))
      .collect().map(r => r.getLong(0) -> (r.getSeq[Long](1), r.getSeq[Long](2))).toMap
    viaBuiltins.foreach { case (id, (w, c)) =>
      assert(viaKernel(id)._1 === w, s"word shingles differ for id $id")
      assert(viaKernel(id)._2 === c, s"char shingles differ for id $id")
    }
  }

  test("minHashSig: identical shingle sets give identical signatures; empty is null") {
    val s = spark; import s.implicits._
    val df = Seq(("one two three four five", 1L), ("one two three four five", 2L), ("x", 3L))
      .toDF("text", "id")
    val sig = minHashSig(
      transform(wordShingles(wordTokens(col("text")), 3), sh => tokenHash60(sh)), 32)
    val out = df.select(col("id"), sig.as("sig")).collect()
      .map(r => r.getLong(0) -> Option(r.getSeq[Long](1))).toMap
    assert(out(1L).get === out(2L).get)
    assert(out(1L).get.length === 32)
    assert(out(3L).isEmpty) // < 3 tokens -> no shingles -> null signature
  }
}
