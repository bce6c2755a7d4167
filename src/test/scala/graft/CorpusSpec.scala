package graft

import org.apache.spark.sql.functions._

import graft.operators.Corpus
import graft.sources.Tables

/** Behavioral properties of the corpus-preparation operators over the
  * real documents table (the oracle gate checks exact values; these
  * check the invariants a pipeline relies on).
  */
class CorpusSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf001)

  test("split: deterministic, total, and roughly proportioned") {
    val a = Corpus.split(docs, "doc_id").collect()
    val b = Corpus.split(docs, "doc_id").collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq) // stable across runs
    assert(a.length === docs.count())
    val byodSplit = a.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    assert(byodSplit.keySet === Set("train", "val", "test"))
    // 80/10/10 with 500 docs: train must dominate, slices must be nonempty
    assert(byodSplit("train") > byodSplit("val") && byodSplit("train") > byodSplit("test"))
  }

  test("vocab: ranks are contiguous, counts non-increasing, df <= tf") {
    val v = Corpus.vocab(docs, "doc_id", "text", k = 20).collect()
    assert(v.map(_.getInt(0)).toSeq === (1 to v.length))
    val counts = v.map(_.getLong(2)).toSeq
    assert(counts === counts.sorted.reverse)
    v.foreach(r => assert(r.getLong(3) <= r.getLong(2))) // n_docs <= n
  }

  test("clean: survivors are english, scored, and canonical") {
    val kept = Corpus.clean(docs, "doc_id", "text").collect()
    assert(kept.nonEmpty)
    assert(kept.forall(_.getString(1) == "en"))
    assert(kept.forall(_.getDouble(2) >= 0.5))
    // no two survivors share identical text (canonical = min id per text)
    val ids = kept.map(_.getLong(0)).toSet
    val texts = docs.where(col("doc_id").isin(ids.toSeq: _*))
      .select("text").collect().map(_.getString(0))
    assert(texts.length === texts.distinct.length)
  }

  test("packSequences: bins are contiguous per group and respect the budget") {
    val packed = Corpus.packSequences(docs, "doc_id", "text", "source", budget = 512)
      .collect().groupBy(_.getString(1))
    packed.foreach { case (_, rows) =>
      val bins = rows.map(_.getLong(3)).toSeq
      assert(bins === bins.sorted)                 // non-decreasing in doc order
      assert(bins.head === 0L)                     // first doc opens bin 0
      // exclusive cumsum semantics: a doc lands in bin b iff the tokens
      // BEFORE it fit in b budgets
      var cum = 0L
      rows.foreach { r =>
        assert(r.getLong(3) === cum / 512)
        cum += r.getInt(2)
      }
    }
  }

  test("wordShingleStrings kernel equals the built-in wordShingles chain (incl. edge cases)") {
    val s = spark; import s.implicits._
    val real = docs.select(col("text"))
    val edge = Seq("", "one", "one two", "  punct!! only?? ", "ünïcodé mixé tokens here",
      "a b c d e f g").toDF("text")
    for (df <- Seq(real, edge); n <- Seq(2, 3)) {
      val cmp = df.select(
        graft.functions.wordShingleStrings(graft.functions.wordTokens(col("text")), n).as("fast"),
        graft.functions.wordShingles(graft.functions.wordTokens(col("text")), n).as("ref"))
        .where(not(col("fast") === col("ref")))
      assert(cmp.count() === 0L, s"n=$n mismatch")
    }
  }

  test("textrank: partition-invariant, ranks contiguous, hub words rank high") {
    val a = Corpus.textrank(docs, "text", iters = 3, k = 20).collect()
    val b = Corpus.textrank(docs.repartition(7), "text", iters = 3, k = 20).collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq, "exact integer PR must not depend on partitioning")
    assert(a.map(_.getInt(0)).toSeq === (1 to 20))
    val prs = a.map(_.getLong(2)).toSeq
    assert(prs === prs.sortBy(-_), "rank order must follow pr desc")
    // a high-frequency function word must appear among the keywords of
    // any natural-language corpus (hubs of the co-occurrence graph)
    val words = a.map(_.getString(1)).toSet
    assert(words.exists(Set("the", "of", "and", "a", "to").contains), s"got $words")
  }

  test("lmScore: corpus-fluent docs outscore injected gibberish; identical docs tie") {
    val s = spark; import s.implicits._
    val fluent = (1L to 20L).map(i => (i, "the quick brown fox jumps over the lazy dog"))
    val junk = Seq((99L, "zxqv gkjh wqpo mnbv asdf qwer tyui"))
    val scores = Corpus.lmScore((fluent ++ junk).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(99L) < scores(1L), "gibberish must score below fluent text")
    fluent.foreach { case (i, _) => assert(scores(i) === scores(1L)) }
  }

  test("chunk: full coverage, stride offsets, bounded sizes, short tail only at the end") {
    val tokCounts = docs.select(col("doc_id"),
        size(graft.functions.wordTokens(col("text"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val chunks = Corpus.chunk(docs, "doc_id", "text", chunkTokens = 64, strideTokens = 48)
      .collect().groupBy(_.getLong(0))
    tokCounts.filter(_._2 > 0).foreach { case (id, n) =>
      val rows = chunks(id).sortBy(_.getInt(1))
      // offsets are exactly 0, 48, 96 … < n
      assert(rows.map(_.getInt(2)).toSeq === (0 until n by 48).toSeq, s"doc $id")
      // every chunk spans [start, min(start+64, n)) — so tokens are covered
      rows.foreach { r =>
        val (start, len) = (r.getInt(2), r.getInt(3))
        assert(len === math.min(64, n - start), s"doc $id chunk at $start")
      }
    }
    // docs with zero tokens produce no chunks
    assert(chunks.keySet === tokCounts.filter(_._2 > 0).keySet)
  }
}
