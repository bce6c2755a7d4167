package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.functions._

/** Randomized equivalence fuzz: the codegen kernels must match the
  * built-in expression chains bit-for-bit on arbitrary input, including
  * the Unicode traps (chars whose lowercase enters ASCII, combining
  * marks, surrogates).
  */
class FuzzSpec extends SparkSpec {

  private val tricky = Array(
    "K",  // Kelvin sign, lowercases to ascii 'k'
    "İ",  // Latin capital I with dot, lowercases to "i̇"
    "ß", "ﬁ", "É", "中", "文", "🙂", "\u0000", "\t", "\n", "  ", "-", "_",
    "a", "Z", "9", "0", ".", ",", "€")

  private def randomText(rnd: Random): String = {
    val n = rnd.nextInt(60)
    (0 until n).map { _ =>
      rnd.nextInt(4) match {
        case 0 => tricky(rnd.nextInt(tricky.length))
        case 1 => ('a' + rnd.nextInt(26)).toChar.toString
        case 2 => ('A' + rnd.nextInt(26)).toChar.toString
        case _ => if (rnd.nextBoolean()) " " else ('0' + rnd.nextInt(10)).toChar.toString
      }
    }.mkString
  }

  test("tokenizer and shingle kernels == builtin chains on 500 fuzzed strings") {
    val s = spark; import s.implicits._
    val rnd = new Random(2024)
    val df = (0 until 500).map(i => (i.toLong, randomText(rnd))).toDF("id", "text").cache()

    val kernel = df.select(col("id"),
        wordTokens(col("text")).as("t"),
        wordShingleHash60(wordTokens(col("text")), 2).as("w"),
        charShingleHash60(col("text"), 3).as("c"))
      .collect().map(r => r.getLong(0) -> (r.getSeq[String](1), r.getSeq[Long](2), r.getSeq[Long](3))).toMap

    val builtin = df.select(col("id"),
        wordTokensBuiltin(col("text")).as("t"),
        transform(wordShingles(wordTokensBuiltin(col("text")), 2), sh => tokenHash60(sh)).as("w"),
        transform(charShingles(col("text"), 3), g => tokenHash60(g)).as("c"))
      .collect().map(r => r.getLong(0) -> (r.getSeq[String](1), r.getSeq[Long](2), r.getSeq[Long](3))).toMap

    builtin.foreach { case (id, (t, w, c)) =>
      assert(kernel(id)._1 === t, s"tokens diverge for id $id: ${df.where(col("id") === id).collect().head}")
      assert(kernel(id)._2 === w, s"word shingle hashes diverge for id $id")
      assert(kernel(id)._3 === c, s"char shingle hashes diverge for id $id")
    }
    df.unpersist()
  }

  test("fingerprint and sumStrLen kernels == builtin chains on 500 fuzzed strings") {
    val s = spark; import s.implicits._
    val rnd = new Random(99)
    val df = (0 until 500).map(i => (i.toLong, randomText(rnd))).toDF("id", "text").cache()

    val got = df.select(col("id"),
        rollingFingerprint(col("text")).as("fp"),
        sumStrLen(wordTokens(col("text"))).as("sl"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    // builtin fingerprint chain needs the empty guard (sequence(1,0) counts down)
    val want = df.select(col("id"),
        when(length(col("text")) === 0, 0L)
          .otherwise(rollingFingerprintBuiltin(col("text"))).as("fp"),
        aggregate(transform(wordTokensBuiltin(col("text")), t => length(t).cast("long")),
          lit(0L), (acc, x) => acc + x).as("sl"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    want.foreach { case (id, (fp, sl)) =>
      assert(got(id)._1 === fp, s"fingerprint diverges for id $id")
      assert(got(id)._2 === sl, s"sum of token lengths diverges for id $id")
    }
    df.unpersist()
  }

  test("sortedIntersectSize == size(array_intersect) on fuzzed sorted distinct arrays") {
    val s = spark; import s.implicits._
    val rnd = new Random(7)
    val rows = (0 until 300).map { i =>
      val a = (0 until rnd.nextInt(40)).map(_ => rnd.nextInt(50).toLong).distinct.sorted.toArray
      val b = (0 until rnd.nextInt(40)).map(_ => rnd.nextInt(50).toLong).distinct.sorted.toArray
      (i.toLong, a, b)
    }
    val got = rows.toDF("id", "a", "b")
      .select(col("id"), sortedIntersectSize(col("a"), col("b")).as("n"),
        size(array_intersect(col("a"), col("b"))).as("m"))
      .collect()
    got.foreach(r => assert(r.getInt(1) === r.getInt(2), s"row ${r.getLong(0)}"))
  }

  test("phrase + near search == brute-force token scans on 200 fuzzed small docs") {
    val s = spark; import s.implicits._
    val rnd = new Random(777)
    val vocab = Array("a", "b", "c", "dd")
    def doc(): Array[String] =
      Array.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.length)))
    val docs = (0 until 200).map(i => (i.toLong, doc()))
    val df = docs.map { case (id, ws) => (id, ws.mkString(" ")) }.toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-fuzz-pos").toString
    graft.operators.Retrieval.buildPostings(df, "doc_id", "text").write.parquet(s"$dir/p")
    val p = spark.read.parquet(s"$dir/p")

    def brutePhrase(phrase: Seq[String]): Map[Long, Int] =
      docs.map { case (id, ws) =>
        id -> ws.indices.count(i =>
          i + phrase.size <= ws.length && phrase.indices.forall(j => ws(i + j) == phrase(j)))
      }.filter(_._2 > 0).toMap
    def bruteNear(a: String, b: String, w: Int): Map[Long, Int] =
      docs.map { case (id, ws) =>
        id -> (for {
          i <- ws.indices if ws(i) == a
          j <- ws.indices if ws(j) == b && j > i && j - i <= w
        } yield 1).size
      }.filter(_._2 > 0).toMap

    for (len <- Seq(2, 3); trial <- 0 until 4) {
      val phrase = Seq.fill(len)(vocab(rnd.nextInt(vocab.length)))
      val got = graft.operators.Retrieval.phraseSearchFromIndex(p, phrase, k = 1000)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("phrase_tf")).toMap
      assert(got === brutePhrase(phrase), s"phrase $phrase (trial $trial)")
    }
    for (trial <- 0 until 6) {
      val a = vocab(rnd.nextInt(vocab.length)); val b = vocab(rnd.nextInt(vocab.length))
      val w = 1 + rnd.nextInt(4)
      val got = graft.operators.Retrieval.nearSearchFromIndex(p, a, b, w, k = 1000)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n_pairs")).toMap
      assert(got === bruteNear(a, b, w), s"near($a, $b, $w) trial $trial")
    }

    // n-clause SpanNear: ordered chains with every consecutive gap in
    // (0, w], against a brute recursion over raw token positions
    def bruteChains(terms: Seq[String], w: Int): Map[Long, Int] =
      docs.map { case (id, ws) =>
        def count(from: Int, rest: Seq[String]): Int = rest match {
          case Seq() => 1
          case t +: more =>
            (from + 1 to math.min(from + w, ws.length - 1))
              .filter(j => ws(j) == t).map(j => count(j, more)).sum
        }
        id -> ws.indices.filter(i => ws(i) == terms.head)
          .map(i => count(i, terms.tail)).sum
      }.filter(_._2 > 0).toMap
    for (len <- Seq(3, 4); trial <- 0 until 4) {
      val terms = Seq.fill(len)(vocab(rnd.nextInt(vocab.length)))
      val w = 1 + rnd.nextInt(4)
      val got = graft.operators.Retrieval.nearSearchFromIndex(p, terms, w, k = 1000)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n_pairs")).toMap
      assert(got === bruteChains(terms, w), s"near($terms, $w) trial $trial")
    }
    // the 2-term overload is exactly the n = 2 chain
    val two = graft.operators.Retrieval.nearSearchFromIndex(p, "a", "b", 3, k = 1000)
      .collect().map(_.toSeq).toSeq
    val asChain = graft.operators.Retrieval.nearSearchFromIndex(p, Seq("a", "b"), 3, k = 1000)
      .collect().map(_.toSeq).toSeq
    assert(two === asChain)
  }
}
