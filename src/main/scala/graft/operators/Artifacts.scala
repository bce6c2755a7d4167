package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lifecycle for the written-once parquet artifacts the engine serves
  * from (dedup signature chains, the inverted index, the k-NN graph,
  * DSIR/LM score tables): every artifact is keyed on a CONTENT
  * FINGERPRINT of its input corpus, committed under a manifest, and
  * superseded versions are garbage-collected — the restart story of the
  * reference's scalar_storage.rs done honestly for MUTABLE inputs.
  *
  * Layout: `target/graft-persist/<name>/c<corpusKey>/f<fingerprint>`.
  *
  *  - `corpusKey` identifies WHICH corpus (e.g. a hash of the input
  *    dir path) so artifacts of different corpora never GC each other.
  *  - `fingerprint` identifies the corpus CONTENT (file listing +
  *    length + mtime of every input file, plus a build-recipe spec
  *    tag): rewriting any input file changes the fingerprint, so the
  *    next [[resolve]] rebuilds instead of serving stale rows — and
  *    deletes the superseded version. A reader still holding a lazy
  *    plan over the superseded path fails LOUDLY (file not found) on
  *    its next action; nothing ever silently serves stale data.
  *  - The build lands in a `tmp_*` scratch dir and is committed by an
  *    atomic rename AFTER `_graft_manifest.json` is written inside it,
  *    so a crashed build can never be adopted; leftover scratch dirs
  *    are swept by the next successful resolve of the same key.
  *  - A per-(name, corpusKey) JVM lock serializes concurrent first
  *    callers so the corpus-scale build runs ONCE; a cross-process
  *    racer is handled by [[commitScratch]]: the loser detects the
  *    winner's committed copy (before the rename, or as its own scratch
  *    nested under the winner after it), deletes its copy and adopts
  *    the winner's committed artifact.
  *
  * The manifest is a leading-underscore file, invisible to Spark's
  * parquet reader (like `_SUCCESS`), so `spark.read.parquet(path)`
  * works unchanged on committed artifacts.
  */
object Artifacts {

  private[graft] val root = "target/graft-persist"
  private val manifestName = "_graft_manifest.json"
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  // fast path: last committed (fp, path) per key — skips the manifest
  // read (NOT the fingerprint computation) on repeat calls
  private val committed = new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** Stable identifier for a corpus LOCATION (not its content). */
  def corpusKey(parts: String*): String = md5(parts.mkString("|")).take(12)

  /** Content fingerprint of input paths: md5 over the sorted
    * (file, length, mtime) listing of every file under them, plus a
    * build-recipe `spec` tag so a changed artifact schema/recipe never
    * adopts an old on-disk version. One driver-side recursive listing
    * per call — metadata-only, the unavoidable (and at 100 TB, the
    * cheapest possible) staleness check.
    *
    * Granularity caveat: a rewrite that preserves every file's name,
    * length AND mtime (sub-timestamp-resolution replace on a local FS)
    * is indistinguishable — the same envelope every mtime-based build
    * system accepts. Object stores and real table formats version
    * writes, so the envelope tightens where it matters.
    */
  def fingerprint(spark: SparkSession, paths: Seq[String], spec: String = ""): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val entries = scala.collection.mutable.ArrayBuffer[String]()
    paths.foreach { p =>
      val hp = new Path(p)
      val fs = hp.getFileSystem(conf)
      if (fs.exists(hp)) {
        // paths RELATIVE to the listed root (keeping the root's own
        // name), so a fingerprint stored inside an artifact survives
        // the scratch→committed rename of the artifact's parent
        val rootPath = fs.makeQualified(hp).toUri.getPath
        val it = fs.listFiles(hp, true)
        while (it.hasNext) {
          val st = it.next()
          // skip metadata files (_SUCCESS, manifests, .crc shadows):
          // only DATA files carry content
          if (!st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith(".")) {
            val rel = hp.getName + st.getPath.toUri.getPath.stripPrefix(rootPath)
            entries += s"$rel|${st.getLen}|${st.getModificationTime}"
          }
        }
      } else entries += s"$p|missing"
    }
    md5(spec + "||" + entries.sorted.mkString("\n")).take(16)
  }

  /** Fingerprint of a DataFrame's file inputs (falls back to the
    * analyzed plan's semantic hash for non-file-backed frames, which
    * cannot be staleness-checked and says so in the fingerprint).
    */
  def fingerprintInput(df: DataFrame, spec: String = ""): String = {
    val files = df.inputFiles.toSeq.sorted
    if (files.nonEmpty) fingerprint(df.sparkSession, files, spec)
    else md5(spec + "||plan:" + df.queryExecution.analyzed.semanticHash()).take(16)
  }

  /** Resolve-or-build. Returns the committed artifact directory; the
    * `build` callback writes the artifact's table(s) INTO the scratch
    * path it is given (single parquet table or subdirectories — the
    * commit renames the whole dir).
    */
  def resolve(spark: SparkSession, name: String, corpus: String, fp: String)
             (build: String => Unit): String = {
    val key = s"$name/c$corpus"
    val parent = s"$root/$key"
    val path = s"$parent/f$fp"
    val lock = locks.computeIfAbsent(key, _ => new Object)
    lock.synchronized {
      val cached = Option(committed.get(key)).collect { case (`fp`, p) => p }
      cached.getOrElse {
        val conf = spark.sparkContext.hadoopConfiguration
        val fs = new Path(parent).getFileSystem(conf)
        if (!isCommitted(fs, path, fp)) {
          val tmp = s"$parent/tmp_${java.util.UUID.randomUUID()}"
          build(tmp)
          writeManifest(fs, tmp, name, corpus, fp)
          commitScratch(fs, tmp, path, fp)
        }
        gc(fs, parent, keep = s"f$fp")
        committed.put(key, (fp, path))
        path
      }
    }
  }

  /** Commit a finished scratch build to its versioned path,
    * cross-process-race-safe. Hadoop `FileSystem.rename(src, dst)` with
    * an EXISTING dst directory moves src INTO dst and returns true (both
    * HDFS and RawLocalFileSystem), so a bare rename cannot double as the
    * existence check: a losing racer would nest its whole scratch copy
    * (data files + a second manifest) inside the winner's committed
    * artifact. Instead: re-check for a committed racer copy immediately
    * before the rename and adopt it (drop our scratch); after the
    * rename, if the racer slipped in BETWEEN the check and the rename,
    * our scratch is now nested under the winner — delete the nested dir
    * (restoring the winner's artifact exactly) and adopt.
    */
  private[graft] def commitScratch(fs: FileSystem, tmp: String, path: String, fp: String): Unit = {
    val tmpPath = new Path(tmp)
    val target = new Path(path)
    if (isCommitted(fs, path, fp)) {
      fs.delete(tmpPath, true)
      return
    }
    val renamed = fs.rename(tmpPath, target)
    val nested = new Path(target, tmpPath.getName)
    if (fs.exists(nested)) fs.delete(nested, true)
    require(isCommitted(fs, path, fp),
      s"artifact commit failed and no valid racer copy exists: $path (renamed=$renamed)")
  }

  /** True iff `path` holds a finished build of fingerprint `fp` — the
    * manifest is written last, so its presence IS the commit marker
    * (a crashed or in-flight build can never validate).
    */
  private def isCommitted(fs: FileSystem, path: String, fp: String): Boolean = {
    val m = new Path(path, manifestName)
    fs.exists(m) && {
      val in = fs.open(m)
      val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      body.contains(s""""fingerprint": "$fp"""")
    }
  }

  private def writeManifest(fs: FileSystem, dir: String, name: String,
                            corpus: String, fp: String): Unit = {
    val out = fs.create(new Path(dir, manifestName), true)
    try out.write(
      s"""{"artifact": "$name", "corpus": "$corpus", "fingerprint": "$fp"}"""
        .getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Delete every sibling version except the current one: superseded
    * fingerprints (the corpus was rewritten) and orphaned scratch dirs
    * (a crashed or racing build). Runs under the key lock.
    */
  private def gc(fs: FileSystem, parent: String, keep: String): Unit = {
    val p = new Path(parent)
    if (fs.exists(p)) fs.listStatus(p).foreach { st =>
      if (st.isDirectory && st.getPath.getName != keep)
        fs.delete(st.getPath, true)
    }
  }

  /** Force-rebuild entry point: drop every committed version of
    * (name, corpus) — on disk and in the JVM fast path — so the next
    * [[resolve]] rebuilds from scratch. This is the programmatic escape
    * hatch for artifacts whose DERIVED state went stale without the
    * input fingerprint changing (e.g. a [[Dedup.DedupIndex]] whose
    * signature table was appended to: the corpus files are unchanged,
    * so resolve would re-adopt the appended-to artifact forever).
    */
  def invalidate(spark: SparkSession, name: String, corpus: String): Unit = {
    val key = s"$name/c$corpus"
    val lock = locks.computeIfAbsent(key, _ => new Object)
    lock.synchronized {
      committed.remove(key)
      val parent = new Path(s"$root/$key")
      val fs = parent.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(parent)) fs.delete(parent, true)
    }
  }

  /** Test/maintenance hook: forget the in-JVM fast path so the next
    * resolve re-reads the on-disk manifest (simulates a fresh JVM).
    */
  private[graft] def forgetCommitted(): Unit = committed.clear()

  // ---- single-writer lease --------------------------------------------

  private val leaseName = "_graft_lease"

  /** Run `body` holding the artifact's single-writer lease — the
    * cross-process enforcement of the contract the maintenance verbs
    * (append / delete / compact) document: their check-then-append and
    * rewrite-and-swap sequences are only safe under one writer at a
    * time. The lease is a `_graft_lease` file INSIDE the artifact dir
    * (underscore-prefixed: invisible to parquet reads, versioned and
    * GC'd with the artifact). Ownership is decided by an ATOMIC
    * create-if-absent: `File.createNewFile` (POSIX O_EXCL) on a local
    * filesystem — Hadoop's LocalFileSystem `create(overwrite = false)`
    * is only check-then-create, and two racers through it interleave
    * their stream writes into one corrupt file — and Hadoop's
    * `create(overwrite = false)` elsewhere, which IS atomic on HDFS
    * (and conditional-put object stores). Only the owner ever writes
    * the payload, so the file is never torn; the loser fails LOUDLY,
    * never runs `body`, and never deletes the winner's lease.
    *
    * Contention is a loud failure, not a wait: a maintenance verb
    * racing another writer is an orchestration bug the caller must
    * see, not a queue to park in. A lease orphaned by a crashed writer
    * blocks every later writer (also loudly, naming the holder and
    * its acquisition time) until an operator runs [[breakLease]] — the
    * deliberate manual step, because the only process that can know a
    * writer is dead rather than slow is the one that killed it.
    */
  def withLease[T](spark: SparkSession, dir: String, verb: String)(body: => T): T = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a missing artifact dir must surface as ITS OWN failure: createNewFile
    // on a nonexistent parent throws IOException, which the acquire loop
    // below would misreport as a phantom "held by <unreadable>" holder
    if (!fs.exists(new Path(dir)))
      throw new IllegalStateException(
        s"$verb on $dir: the artifact directory does not exist — nothing to " +
          "lease (build or save the artifact first)")
    val p = new Path(dir, leaseName)
    val token = java.util.UUID.randomUUID().toString
    val payload =
      s"""{"token": "$token", "verb": "$verb", "pid": "${ProcessHandle.current().pid()}", "acquired_at_ms": ${System.currentTimeMillis()}}"""
    def holder: String = readHolder(fs, p)
    val acquired =
      if ("file" == Option(fs.getUri.getScheme).getOrElse("file")) {
        val f = new java.io.File(fs.makeQualified(p).toUri.getPath)
        try f.createNewFile() catch { case _: java.io.IOException => false }
      } else {
        try { fs.create(p, false).close(); true }
        catch { case _: java.io.IOException => false }
      }
    if (!acquired)
      throw new IllegalStateException(
        s"$verb on $dir requires the single-writer lease, held by: " +
          s"${scala.util.Try(holder).getOrElse("<unreadable>")} — the artifact's " +
          "maintenance verbs are single-writer across processes; wait for the " +
          "holder, or if it crashed, break the lease with Artifacts.breakLease")
    // we own the file (the atomic create admitted exactly one writer) —
    // record who we are for the failure message other writers read
    val out = fs.create(p, true)
    try out.write(payload.getBytes(StandardCharsets.UTF_8)) finally out.close()
    try body
    finally {
      // release ONLY our own lease: if an operator broke it and a new
      // writer acquired, deleting here would free two writers at once
      if (scala.util.Try(holder).toOption.exists(_.contains(token)))
        fs.delete(p, false)
    }
  }

  /** Manually clear an orphaned lease (a crashed writer's). The loud
    * operator action [[withLease]]'s failure message points at — never
    * called by library code.
    */
  def breakLease(spark: SparkSession, dir: String): Unit = {
    val p = new Path(dir, leaseName)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, false)
  }

  /** The lease file's payload, distinguishing the acquire window: the
    * owner writes `{token, verb, pid, acquired_at_ms}` in a second step
    * AFTER the atomic create, so an empty (or unreadable) file means
    * acquisition in progress — or a holder that crashed before writing
    * its payload, the [[breakLease]] candidate an operator looks for.
    */
  private def readHolder(fs: org.apache.hadoop.fs.FileSystem, p: Path): String = {
    val in = fs.open(p)
    val raw = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    if (raw.trim.isEmpty)
      "<no payload yet: acquisition in progress, or the holder crashed " +
        "before recording itself — if it persists, breakLease>"
    else raw
  }

  /** Observability probe for the single-writer lease: None when the
    * artifact is free, Some(payload) when a lease file exists — the
    * holder's `{token, verb, pid, acquired_at_ms}` JSON, or the
    * in-progress marker for an empty file. Surfaced by the facade
    * `stats` frames beside the tombstone lifecycle numbers, so a held
    * or orphaned lease is visible BEFORE a maintenance verb fails on
    * it (the crashed-holder runbook lives in README).
    */
  def leaseInfo(spark: SparkSession, dir: String): Option[String] = {
    val p = new Path(dir, leaseName)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else Some(scala.util.Try(readHolder(fs, p)).getOrElse("<unreadable>"))
  }
}
