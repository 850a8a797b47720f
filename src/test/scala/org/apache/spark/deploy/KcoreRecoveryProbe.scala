package org.apache.spark.deploy

import java.nio.file.{Files, Paths}

import org.apache.spark.SparkConf
import org.apache.spark.scheduler.{SparkListener, SparkListenerExecutorRemoved}
import org.apache.spark.sql.SparkSession

/** Subprocess main for WorkerKillRecoverySpec: runs the iterative
  * q_graph_kcore on a standalone two-worker mini-cluster with a
  * RELIABLE checkpoint dir set, and kills one executor the moment the
  * first round checkpoint lands on disk — mid-loop, with cached input
  * blocks and possibly running tasks on the victim. The spec asserts
  * the query still completes with the oracle-matched result: this is
  * the recovery property `Scoped.materializeRound`'s reliable branch
  * exists for (a direct `localCheckpoint` would tie round state to the
  * killed executor and abort the loop with truncated lineage).
  *
  * Lives in `org.apache.spark.deploy` for the `private[spark]`
  * executor-kill client (`getExecutorIds`/`killAndReplaceExecutor`) —
  * the same cluster-manager path dynamic allocation and preemption
  * take in a real deployment.
  */
object KcoreRecoveryProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, ckptDir) = args
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
    sc.setCheckpointDir(ckptDir)
    val removed = new java.util.concurrent.atomic.AtomicInteger(0)
    sc.addSparkListener(new SparkListener {
      override def onExecutorRemoved(e: SparkListenerExecutorRemoved): Unit = {
        removed.incrementAndGet(); ()
      }
    })
    @volatile var queryDone = false
    @volatile var killRequestedMidQuery = false
    val killer = new Thread(() => {
      val ckpt = Paths.get(ckptDir)
      def ckptFiles(): Long = {
        val s = Files.walk(ckpt)
        try s.filter(p => Files.isRegularFile(p)).count() finally s.close()
      }
      // the first reliable round checkpoint on disk == the loop is
      // mid-flight with rounds still to run
      while (!queryDone && ckptFiles() == 0) Thread.sleep(10)
      if (!queryDone) {
        var ids = sc.getExecutorIds()
        while (!queryDone && ids.isEmpty) { Thread.sleep(10); ids = sc.getExecutorIds() }
        if (ids.nonEmpty && !queryDone) {
          sc.killAndReplaceExecutor(ids.head)
          killRequestedMidQuery = !queryDone
        }
      }
    })
    killer.setDaemon(true)
    killer.start()
    val rows = graft.SparkEntry.queries("q_graph_kcore")(spark, sfDir).collect()
    queryDone = true
    killer.join(10000)
    // the removal event can trail the collect — wait for it briefly
    val deadline = System.nanoTime() + 15000000000L
    while (removed.get == 0 && System.nanoTime() < deadline) Thread.sleep(50)
    rows.foreach(r => println(s"ROW=${r.get(0)},${r.get(1)},${r.get(2)}"))
    println(s"REMOVED=${removed.get}")
    println(s"MIDQUERY=$killRequestedMidQuery")
    spark.stop()
    MiniClusterProbe.stop(clusterEnvs)
    sys.exit(0) // non-daemon cluster threads otherwise keep the JVM up
  }
}
