package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev tool (r5 optimization round): isolated steady-state timing +
  * plan capture + scheduler profile for named queries, under the exact
  * Bench session conf.
  *
  * Usage: runMain graft.OptProbe <sfDir> <outDir|-> <runs> <name...>
  *   (no names = all registered queries). For each query: runs it
  *   `runs` times (timing each run like Bench does — `.count()` with a
  *   catalog cache clear between runs), prints every run's seconds
  *   plus the LAST run's scheduler profile (jobs / stages / tasks /
  *   summed task time — wall far above task time = scheduling or
  *   driver overhead, not compute), and when outDir != "-" writes
  *   `<outDir>/<name>.txt` with the `.explain("formatted")` output
  *   (batch queries only; staged streaming queries return their sink
  *   table, whose plan is just a memory-table scan, so those write a
  *   note instead).
  */
object OptProbe {

  private class Prof extends SparkListener {
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskNanos = 0L
    def reset(): Unit = { jobs = 0; stages = 0; tasks = 0; taskNanos = 0L }
    override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages += 1
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      tasks += 1
      if (t.taskMetrics != null) taskNanos += t.taskMetrics.executorRunTime * 1000000L
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("-")
    val runs = args.lift(2).map(_.toInt).getOrElse(3)
    val names = if (args.length > 3) args.drop(3).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    // A/B conf experiments: GRAFT_OPT_CONFS="k=v;k=v"
    val spark = sys.env.getOrElse("GRAFT_OPT_CONFS", "").split(';').filter(_.contains("="))
      .foldLeft(b0) { (b, kv) =>
        val Array(k, v) = kv.split("=", 2); b.config(k, v)
      }.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Warmup.run(spark, sfDir, streaming = names.exists(_.matches("ev\\d+s_.*")))
    val prof = new Prof
    spark.sparkContext.addSparkListener(prof)
    if (outDir != "-") java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    // GRAFT_OPT_ALTCONF="k=v": set k=v on EVEN runs (0-based odd index),
    // default on odd — interleaved A/B immune to host-load waves.
    val altConf = sys.env.get("GRAFT_OPT_ALTCONF").filter(_.contains("="))
      .map { kv => val Array(k, v) = kv.split("=", 2); (k, v) }
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val times = (1 to runs).map { i =>
        altConf.foreach { case (k, v) =>
          if (i % 2 == 0) spark.conf.set(k, v) else spark.conf.unset(k)
        }
        if (i == runs) { Thread.sleep(150); prof.reset() }
        val t0 = System.nanoTime()
        // r6 (advice): a crashing query must not masquerade as a fast
        // timing — print the failure and poison the sample.
        val failed = try { fn(spark, sfDir).count(); false } catch {
          case e: Throwable =>
            println(s"[opt] $n run $i FAILED: $e"); true
        }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        if (failed) Double.NaN else dt
      }
      Thread.sleep(150) // let the async listener bus drain
      println(f"[opt] $n%-32s ${times.map(t => f"$t%7.2f").mkString(" ")}" +
        f"  jobs=${prof.jobs}%3d stages=${prof.stages}%3d tasks=${prof.tasks}%5d taskSec=${prof.taskNanos / 1e9}%7.2f")
      if (outDir != "-") {
        val planText =
          if (n.matches("ev\\d+s_.*")) s"(streaming query $n: staged micro-batch run; plan is per-batch, see code)"
          else {
            val df = fn(spark, sfDir)
            val qe = df.queryExecution
            try qe.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
            catch { case e: Throwable => s"(explain failed: $e)" }
          }
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"$n.txt"), planText)
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
