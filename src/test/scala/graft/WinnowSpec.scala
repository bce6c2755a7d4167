package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.WinnowHashes
import graft.operators.Dedup

/** Winnowing: kernel equals a naive reference implementation, and the
  * SIGMOD-2003 guarantee holds — documents sharing a substring of
  * ≥ w + k − 1 chars share at least one selected fingerprint.
  */
class WinnowSpec extends SparkSpec {

  private val Mod = 1000000007L

  /** Transparent reference implementation (collection-style). */
  private def naive(s: String, k: Int, w: Int): Seq[Long] = {
    if (s.length < k) return Seq.empty
    val grams = s.sliding(k).map(_.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % Mod)).toVector
    val windows =
      if (grams.size < w) Seq(grams)
      else grams.sliding(w).toSeq
    windows.map(_.min).distinct.sorted
  }

  test("kernel equals naive reference on random ASCII strings") {
    val rnd = new Random(5)
    val alphabet = "abc 01"
    for (len <- Seq(0, 3, 7, 8, 9, 11, 12, 40, 300); trial <- 1 to 20) {
      val s = Seq.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString
      val got = WinnowHashes.select(UTF8String.fromString(s), 8, 4).toSeq
      assert(got === naive(s, 8, 4), s"len=$len s='$s'")
    }
  }

  test("guarantee: shared substring of ≥ k+w-1 chars ⇒ ≥ 1 shared fingerprint") {
    val rnd = new Random(9)
    def randStr(n: Int) = Seq.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
    for (trial <- 1 to 50) {
      val shared = randStr(11) // k + w - 1 = 8 + 4 - 1
      val a = randStr(30) + shared + randStr(30)
      val b = randStr(25) + shared + randStr(35)
      val fa = WinnowHashes.select(UTF8String.fromString(a), 8, 4).toSet
      val fb = WinnowHashes.select(UTF8String.fromString(b), 8, 4).toSet
      assert(fa.intersect(fb).nonEmpty, s"trial $trial: no shared fingerprint")
    }
  }

  test("winnowPairs surfaces a planted partial-plagiarism pair, exact dups rank top") {
    val s = spark; import s.implicits._
    val rnd = new Random(17)
    def randText(n: Int) = Seq.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
    val quote = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, randText(200) + " " + quote + " " + randText(200)),
      (2L, randText(180) + " " + quote + " " + randText(220)),
      (3L, randText(400)),
      (4L, randText(400))
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(docs, "doc_id", "text", maxDf = 50, minShared = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(pairs.contains((1L, 2L)), "planted shared quotation must be detected")
    assert(!pairs.contains((3L, 4L)), "independent random docs must not pair")
  }
}
