package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Optimization-round profiling harness (guide §1: measure first).
  *
  * Runs named queries (or all) exactly the way Bench does — one untimed
  * warm-up, clearCache, then a timed pass — and prints, per query, the
  * wall time beside scheduler-level counters from a SparkListener
  * (jobs / stages / tasks / summed task runtime / shuffle bytes), which
  * separates "driver + scheduling overhead" (wall >> task time) from
  * "executor compute" (wall ~ task time / cores). With `-plans <dir>`
  * it also writes each query's `.explain("formatted")` to
  * `<dir>/<name>.txt`.
  *
  * Not part of the driver contract; tooling only.
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val plansDir = {
      val i = args.indexOf("-plans")
      if (i >= 0 && i + 1 < args.length) Some(args(i + 1)) else None
    }
    val suffix = {
      val i = args.indexOf("-suffix")
      if (i >= 0 && i + 1 < args.length) args(i + 1) else ""
    }
    val names0 = args.filterNot(_.startsWith("-"))
      .filterNot(a => plansDir.contains(a) || (suffix.nonEmpty && a == suffix)).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sel: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] =
      if (names0.isEmpty) SparkEntry.queries.toSeq
      else names0.map(n => n -> SparkEntry.queries(n))

    // warm-up: index builds + JIT, exactly like Bench
    sel.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    spark.catalog.clearCache()

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    val taskTimeMs = new java.util.concurrent.atomic.AtomicLong(0L)
    val shufReadB = new java.util.concurrent.atomic.AtomicLong(0L)
    val shufWriteB = new java.util.concurrent.atomic.AtomicLong(0L)
    val showStages = args.contains("-stages")
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        if (showStages) {
          val si = s.stageInfo
          val m = si.taskMetrics
          if (m != null && m.executorRunTime > 300)
            println(f"    stage ${si.stageId}%4d ${m.executorRunTime / 1000.0}%7.2fs tasks=${si.numTasks}%4d ${si.name.take(90)}")
        }
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks += 1
        val m = t.taskMetrics
        if (m != null) {
          taskTimeMs.addAndGet(m.executorRunTime)
          shufReadB.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufWriteB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    println(f"${"query"}%-36s ${"wall_s"}%8s ${"jobs"}%5s ${"stages"}%6s ${"tasks"}%6s ${"task_s"}%8s ${"shR_MB"}%7s ${"shW_MB"}%7s")
    sel.foreach { case (name, fn) =>
      jobs = 0; stages = 0; tasks = 0
      taskTimeMs.set(0); shufReadB.set(0); shufWriteB.set(0)
      val t0 = System.nanoTime()
      val r = try { fn(spark, sfDir).count(); "ok" }
              catch { case e: Throwable => "ERR " + e.getClass.getSimpleName }
      val wall = (System.nanoTime() - t0) / 1e9
      // let straggler listener events drain
      Thread.sleep(200)
      println(f"$name%-36s $wall%8.3f $jobs%5d $stages%6d $tasks%6d ${taskTimeMs.get / 1000.0}%8.2f ${shufReadB.get / 1e6}%7.1f ${shufWriteB.get / 1e6}%7.1f  $r")
      plansDir.foreach { d =>
        try {
          val p = java.nio.file.Paths.get(d)
          java.nio.file.Files.createDirectories(p)
          val txt = try fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          catch { case e: Throwable => "explain failed: " + e }
          java.nio.file.Files.write(p.resolve(s"$name$suffix.txt"), txt.getBytes("UTF-8"))
        } catch { case _: Throwable => () }
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
