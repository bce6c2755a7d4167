package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Artifacts, Dedup}

case class ADoc(doc_id: Long, text: String)

/** Lifecycle of the written-once artifact registry: content-fingerprint
  * invalidation (a rewritten corpus rebuilds instead of serving stale
  * rows), superseded-version + orphan GC, restart adoption, build-once
  * under racing first callers, and the dedup index's append-staleness
  * guard.
  */
class ArtifactsSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toFile.getPath

  private def listDirs(parent: String): Seq[String] = {
    val f = new java.io.File(parent)
    if (!f.exists()) Seq.empty
    else f.listFiles().filter(_.isDirectory).map(_.getName).toSeq
  }

  test("rewritten corpus invalidates the artifact: rebuild + GC of the superseded version") {
    val s = spark; import s.implicits._
    val corpus = tmp("graft-art-corpus")
    val name = s"arttest_${System.nanoTime()}"
    Seq((1L, 10L), (2L, 20L)).toDF("id", "v").write.mode("overwrite").parquet(corpus)

    def serve(): (String, Long) = {
      val fp = Artifacts.fingerprint(spark, Seq(corpus))
      val path = Artifacts.resolve(spark, name, Artifacts.corpusKey(corpus), fp) { t =>
        spark.read.parquet(corpus).agg(sum("v").as("s")).write.parquet(t)
      }
      (path, spark.read.parquet(path).head.getLong(0))
    }

    val (p1, v1) = serve()
    assert(v1 === 30L)
    // same content → same artifact, no rebuild (the committed dir is adopted)
    assert(serve() === ((p1, 30L)))

    // REWRITE the corpus: the old registry would serve the stale 30
    Seq((1L, 100L), (2L, 200L), (3L, 300L)).toDF("id", "v")
      .write.mode("overwrite").parquet(corpus)
    val (p2, v2) = serve()
    assert(v2 === 600L, "a rewritten corpus must invalidate the artifact")
    assert(p2 !== p1)
    // superseded version GC'd: exactly one committed fingerprint remains
    val parent = new java.io.File(p2).getParent
    assert(listDirs(parent) === Seq(new java.io.File(p2).getName),
      "the stale artifact version must be garbage-collected")
  }

  test("restart adoption: a committed on-disk artifact is reused without rebuilding") {
    val s = spark; import s.implicits._
    val corpus = tmp("graft-art-restart")
    val name = s"artrestart_${System.nanoTime()}"
    Seq((1L, 5L)).toDF("id", "v").write.mode("overwrite").parquet(corpus)
    val fp = Artifacts.fingerprint(spark, Seq(corpus))
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    def serve(): String =
      Artifacts.resolve(spark, name, Artifacts.corpusKey(corpus), fp) { t =>
        builds.incrementAndGet()
        spark.read.parquet(corpus).write.parquet(t)
      }
    val p1 = serve()
    Artifacts.forgetCommitted() // simulate a fresh JVM
    val p2 = serve()
    assert(p1 === p2)
    assert(builds.get() === 1, "the restart must adopt the manifest, not rebuild")
  }

  test("racing first callers share ONE build; orphaned scratch dirs are swept") {
    val s = spark; import s.implicits._
    val corpus = tmp("graft-art-race")
    val name = s"artrace_${System.nanoTime()}"
    Seq((1L, 7L)).toDF("id", "v").write.mode("overwrite").parquet(corpus)
    val fp = Artifacts.fingerprint(spark, Seq(corpus))
    val key = Artifacts.corpusKey(corpus)

    // plant a crashed build's leftover scratch dir under the key
    val parent = s"${Artifacts.root}/$name/c$key"
    new java.io.File(s"$parent/tmp_crashed-leftover").mkdirs()

    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    def serve(): String =
      Artifacts.resolve(spark, name, key, fp) { t =>
        builds.incrementAndGet()
        Thread.sleep(50) // widen the race window
        spark.read.parquet(corpus).write.parquet(t)
      }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    val futures = (1 to 3).map(_ => pool.submit(
      new java.util.concurrent.Callable[String] { def call(): String = serve() }))
    val results = futures.map(_.get()).toSet
    pool.shutdown()
    assert(results.size === 1)
    assert(builds.get() === 1, "concurrent first callers must share one build")
    assert(listDirs(parent) === Seq(new java.io.File(results.head).getName),
      "orphaned scratch dirs must be swept on commit")
  }

  test("a build-recipe spec bump invalidates the on-disk artifact (schema-change safety)") {
    val s = spark; import s.implicits._
    val corpus = tmp("graft-art-spec")
    val name = s"artspec_${System.nanoTime()}"
    Seq((1L, 2L)).toDF("id", "v").write.mode("overwrite").parquet(corpus)
    val key = Artifacts.corpusKey(corpus)
    def serve(spec: String, out: Long): (String, Long) = {
      val fp = Artifacts.fingerprint(spark, Seq(corpus), spec)
      val p = Artifacts.resolve(spark, name, key, fp) { t =>
        spark.read.parquet(corpus).select((col("v") * out).as("v")).write.parquet(t)
      }
      (p, spark.read.parquet(p).head.getLong(0))
    }
    val (p1, v1) = serve("v1", 1L)
    assert(v1 === 2L)
    // same corpus, NEW recipe: the v1 artifact must not be adopted —
    // and being superseded under the same key, it is GC'd
    val (p2, v2) = serve("v2", 100L)
    assert(p2 !== p1)
    assert(v2 === 200L, "a spec bump must rebuild with the new recipe")
    assert(listDirs(new java.io.File(p2).getParent) ===
      Seq(new java.io.File(p2).getName))
  }

  test("cross-process commit race: the losing racer adopts the winner, never nests into it") {
    val s = spark; import s.implicits._
    val corpus = tmp("graft-art-xrace")
    val name = s"artxrace_${System.nanoTime()}"
    Seq((1L, 7L), (2L, 8L)).toDF("id", "v").write.mode("overwrite").parquet(corpus)
    val fp = Artifacts.fingerprint(spark, Seq(corpus))
    val key = Artifacts.corpusKey(corpus)
    val path = Artifacts.resolve(spark, name, key, fp) { t =>
      spark.read.parquet(corpus).agg(sum("v").as("s")).write.parquet(t)
    }
    assert(spark.read.parquet(path).head.getLong(0) === 15L)

    // simulate the LOSING cross-process racer: its finished scratch
    // (data + manifest) tries to commit AFTER the winner already did.
    // Hadoop rename(src, existingDir) would move the scratch INSIDE the
    // winner's dir and return true — commitScratch must adopt instead.
    val parent = new java.io.File(path).getParent
    val scratch = s"$parent/tmp_losing-racer"
    spark.read.parquet(corpus).agg(sum("v").as("s")).write.parquet(scratch)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(scratch, "_graft_manifest.json"),
      s"""{"artifact": "$name", "corpus": "$key", "fingerprint": "$fp"}"""
        .getBytes("UTF-8"))
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Artifacts.commitScratch(fs, scratch, path, fp)

    assert(!new java.io.File(scratch).exists(), "the loser must drop its scratch")
    assert(new java.io.File(path).listFiles().forall(f => !f.getName.startsWith("tmp_")),
      "no scratch copy may nest inside the committed artifact")
    assert(spark.read.parquet(path).count() === 1,
      "the winner's artifact must survive the race intact (no duplicate rows)")
    assert(spark.read.parquet(path).head.getLong(0) === 15L)
  }

  test("invalidate drops the committed version so the next resolve rebuilds") {
    val s = spark; import s.implicits._
    val corpus = tmp("graft-art-inval")
    val name = s"artinval_${System.nanoTime()}"
    Seq((1L, 3L)).toDF("id", "v").write.mode("overwrite").parquet(corpus)
    val fp = Artifacts.fingerprint(spark, Seq(corpus))
    val key = Artifacts.corpusKey(corpus)
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    def serve(): String =
      Artifacts.resolve(spark, name, key, fp) { t =>
        builds.incrementAndGet()
        spark.read.parquet(corpus).write.parquet(t)
      }
    val p1 = serve()
    assert(builds.get() === 1)
    Artifacts.invalidate(spark, name, key)
    assert(!new java.io.File(p1).exists(), "invalidate must drop the on-disk version")
    val p2 = serve()
    assert(builds.get() === 2, "resolve after invalidate must rebuild")
    assert(p2 === p1)
  }

  test("interrupted postings compaction recovers a complete copy at the index path") {
    val s = spark; import s.implicits._
    import graft.operators.Retrieval

    val base = tmp("graft-art-compact") + "/idx"
    val docs = Seq(
      (1L, "alpha beta gamma"), (2L, "beta gamma delta"), (3L, "gamma delta epsilon"))
      .toDF("doc_id", "text")
    val idx = graft.api.TextIndex.build(docs, "doc_id", "text", base)
    idx.append(Seq((10L, "beta zeta")).toDF("doc_id", "text"), "doc_id", "text")
    val postingsPath = s"$base/postings"
    // compare through the accessor: generational appends stamp a `gen`
    // column the build's files lack, so a PLAIN read's inferred schema
    // is file-order dependent — the accessor (and the compactor) read
    // generation-aware
    val before = idx.postings.collect().map(_.toSeq).toSet

    // crash window A: the compacted copy is COMPLETE at _compact_new but
    // the live table already renamed aside → load adopts the new copy
    val fs = new org.apache.hadoop.fs.Path(postingsPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.operators.Tombstones.readWithGen(spark, postingsPath)
      .orderBy("term", "doc_id")
      .write.mode("overwrite").parquet(s"${postingsPath}_compact_new")
    assert(fs.rename(new org.apache.hadoop.fs.Path(postingsPath),
      new org.apache.hadoop.fs.Path(s"${postingsPath}_compact_old")))
    val recovered = graft.api.TextIndex.load(spark, base)
    assert(recovered.postings.collect().map(_.toSeq).toSet === before,
      "load must adopt the complete compacted copy")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"${postingsPath}_compact_new")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"${postingsPath}_compact_old")))

    // crash window B: the compacted copy is INCOMPLETE (no _SUCCESS) and
    // the live table renamed aside → load restores the previous copy
    assert(fs.rename(new org.apache.hadoop.fs.Path(postingsPath),
      new org.apache.hadoop.fs.Path(s"${postingsPath}_compact_old")))
    new java.io.File(s"${postingsPath}_compact_new").mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"${postingsPath}_compact_new", "part-junk.parquet"),
      Array[Byte](1, 2, 3))
    val restored = graft.api.TextIndex.load(spark, base)
    assert(restored.postings.collect().map(_.toSeq).toSet === before,
      "load must restore the aside-renamed previous copy when the new one is incomplete")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"${postingsPath}_compact_new")))

    // and a normal compact still answers identically (accessor view —
    // the physical rewrite is schema-uniform with the gen column)
    idx.compact()
    assert(idx.postings.collect().map(_.toSeq).toSet === before)
  }

  test("dedup index rebuild=true is the programmatic un-staleness path") {
    val s = spark; import s.implicits._
    val corpus = tmp("graft-art-dedup-rb")
    Seq(
      ADoc(1L, "the quick brown fox jumps over the lazy dog again and again today"),
      ADoc(2L, "the quick brown fox jumps over the lazy dog again and again today"),
      ADoc(3L, "completely unrelated text about gardening tomatoes and fresh summer herbs"))
      .toDF().write.mode("overwrite").parquet(corpus)
    val docs = spark.read.parquet(corpus)
    val idx = Dedup.index(docs, "doc_id", "text")
    idx.append(
      Seq(ADoc(4L, "the quick brown fox jumps over the lazy dog again and again today")).toDF(),
      "doc_id", "text")
    // the corpus fingerprint is UNCHANGED by the append: a plain resolve
    // re-adopts the stale artifact forever...
    intercept[IllegalStateException](idx.minhashPairs(0.5).collect())
    val readopted = Dedup.index(spark.read.parquet(corpus), "doc_id", "text")
    assert(readopted.base === idx.base)
    // ...rebuild = true is the programmatic way out
    val rebuilt = Dedup.index(spark.read.parquet(corpus), "doc_id", "text", rebuild = true)
    assert(rebuilt.minhashPairs(0.5).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      === Seq((1L, 2L)), "the rebuilt index covers the raw corpus and its guards clear")
  }

  test("dedup index: append serves signature reads, derived tables fail loudly, rewrite rebuilds") {
    val s = spark; import s.implicits._
    val corpus = tmp("graft-art-dedup")
    val standing = Seq(
      ADoc(1L, "the quick brown fox jumps over the lazy dog again and again today"),
      ADoc(2L, "the quick brown fox jumps over the lazy dog again and again today"),
      ADoc(3L, "completely unrelated text about gardening tomatoes and fresh summer herbs"))
    standing.toDF().write.mode("overwrite").parquet(corpus)

    val docs = spark.read.parquet(corpus)
    val idx = Dedup.index(docs, "doc_id", "text")
    assert(idx.minhashPairs(0.5).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      === Seq((1L, 2L)))
    // re-resolving the same corpus adopts the same artifact
    assert(Dedup.index(spark.read.parquet(corpus), "doc_id", "text").base === idx.base)

    // streaming append: the signature table is maintained...
    val incoming = Seq(
      ADoc(4L, "the quick brown fox jumps over the lazy dog again and again today")).toDF()
    idx.append(incoming, "doc_id", "text")
    val served = Dedup.minhashPairsFromSignatures(idx.sig, minEst = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(served === Set((1L, 2L), (1L, 4L), (2L, 4L)),
      "signature-served pairs must include the ingested doc")
    // ...but the build-time derived tables are stale and must SAY so
    val e = intercept[IllegalStateException](idx.minhashPairs(0.5).collect())
    assert(e.getMessage.contains("stale"))
    intercept[IllegalStateException](idx.simhashPairs(3).collect())
    intercept[IllegalStateException](idx.clustersOrdered.collect())

    // rewriting the corpus (standing + ingested) re-keys the fingerprint:
    // the rebuild covers everything and the guards clear
    (standing :+ ADoc(4L, "the quick brown fox jumps over the lazy dog again and again today"))
      .toDF().write.mode("overwrite").parquet(corpus)
    val idx2 = Dedup.index(spark.read.parquet(corpus), "doc_id", "text")
    assert(idx2.base !== idx.base)
    assert(idx2.minhashPairs(0.5).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      === Set((1L, 2L), (1L, 4L), (2L, 4L)))
  }

  test("single-writer lease: a second writer fails loudly, the artifact is uncorrupted, breakLease frees a crashed holder") {
    val s = spark; import s.implicits._
    import graft.api.TextIndex
    val docs = graft.sources.Tables.documents(spark, sf001)
      .select("doc_id", "text").where(col("doc_id") < 50)
    val path = tmp("graft-lease") + "/tidx"
    val idx = TextIndex.build(docs, "doc_id", "text", path)
    val before = idx.count
    val batch = Seq((7001L, "fresh lease probe document")).toDF("doc_id", "text")

    // writer A holds the lease (simulating a maintenance verb mid-run in
    // ANOTHER process — same-process appends queue on the JVM lock, so
    // the contention is staged through withLease directly)
    Artifacts.withLease(spark, path, "writerA") {
      val e = intercept[IllegalStateException](idx.delete(Seq(0L).toDF("id")))
      assert(e.getMessage.contains("writerA") && e.getMessage.contains("breakLease"),
        e.getMessage)
      val e2 = intercept[IllegalStateException](idx.compact())
      assert(e2.getMessage.contains("single-writer"), e2.getMessage)
      // the loser ran nothing: no tombstones, same served rows
      assert(!graft.operators.Tombstones.present(spark, path))
      assert(idx.count === before)
    }
    // release frees the next writer
    idx.append(batch, "doc_id", "text")
    assert(idx.count === before + 1)

    // a crashed writer's orphaned lease blocks loudly until the manual
    // operator action clears it — library code never self-steals
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val leaseFile = new org.apache.hadoop.fs.Path(s"$path/_graft_lease")
    val out = fs.create(leaseFile, false)
    out.write("""{"token": "dead-process", "verb": "crashed"}""".getBytes("UTF-8"))
    out.close()
    val e3 = intercept[IllegalStateException](
      idx.append(Seq((7002L, "blocked")).toDF("doc_id", "text"), "doc_id", "text"))
    assert(e3.getMessage.contains("dead-process"), e3.getMessage)
    Artifacts.breakLease(spark, path)
    idx.append(Seq((7002L, "unblocked now")).toDF("doc_id", "text"), "doc_id", "text")
    assert(idx.count === before + 2)

    // two literal racers through the raw primitive: at most one wins;
    // the loser's failure names the lease and the artifact stays whole
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val results = Await.result(
      Future.sequence((1 to 2).map { i =>
        Future(scala.util.Try(Artifacts.withLease(spark, path, s"racer$i") {
          Thread.sleep(200); i
        }))
      }), 60.seconds).toList
    assert(results.count(_.isSuccess) >= 1,
      "at least one racer must acquire the lease")
    results.filter(_.isFailure).foreach { f =>
      assert(f.failed.get.getMessage.contains("lease"), f.failed.get.getMessage)
    }
    assert(!fs.exists(leaseFile), "every outcome releases or never created the lease")
    assert(idx.count === before + 2)
  }

  test("lease observability: stats surfaces held/orphaned leases (holder + acquisition time) and frees after release") {
    val s = spark; import s.implicits._
    import graft.api.TextIndex
    val docs = graft.sources.Tables.documents(spark, sf001)
      .select("doc_id", "text").where(col("doc_id") < 30)
    val path = tmp("graft-lease-obs") + "/tidx"
    val idx = TextIndex.build(docs, "doc_id", "text", path)

    // free: no lease row noise
    val free = idx.stats.collect().head
    assert(!free.getAs[Boolean]("lease_held"))
    assert(free.getAs[String]("lease_holder") == null)

    // held: the stats row names the holder verb, pid and acquisition
    // time — visible BEFORE any maintenance verb fails on it
    Artifacts.withLease(spark, path, "obsVerb") {
      val held = idx.stats.collect().head
      assert(held.getAs[Boolean]("lease_held"))
      val h = held.getAs[String]("lease_holder")
      assert(h.contains("obsVerb") && h.contains("acquired_at_ms")
        && h.contains("pid"), h)
      assert(Artifacts.leaseInfo(spark, path).exists(_.contains("obsVerb")))
    }
    assert(!idx.stats.collect().head.getAs[Boolean]("lease_held"))
    assert(Artifacts.leaseInfo(spark, path).isEmpty)

    // the acquire window / crashed-pre-payload case reads as its own
    // marker, not as a phantom holder
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(s"$path/_graft_lease"), false).close()
    val orphan = idx.stats.collect().head
    assert(orphan.getAs[Boolean]("lease_held"))
    assert(orphan.getAs[String]("lease_holder").contains("acquisition in progress"),
      orphan.getAs[String]("lease_holder"))
    val blocked = intercept[IllegalStateException](idx.compact())
    assert(blocked.getMessage.contains("acquisition in progress")
      || blocked.getMessage.contains("breakLease"), blocked.getMessage)
    Artifacts.breakLease(spark, path)
    assert(!idx.stats.collect().head.getAs[Boolean]("lease_held"))

    // a missing artifact dir is its own loud failure, not a phantom
    // "<unreadable>" holder
    val missing = intercept[IllegalStateException](
      Artifacts.withLease(spark, tmp("graft-lease-obs") + "/no-such-artifact", "v") {})
    assert(missing.getMessage.contains("does not exist"), missing.getMessage)
  }
}
