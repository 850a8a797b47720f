package org.apache.spark.deploy

import org.apache.spark.SparkConf
import org.apache.spark.rpc.RpcEnv

/** Test-only standalone mini-cluster whose two workers register under
  * DIFFERENT host strings (`localhost` / `127.0.0.1`). Speculative
  * task clones only dequeue onto a host with no attempt of that task,
  * so `local-cluster[...]` — whose workers all share one hostname —
  * can never launch one; this can. Used by SpeculationProbe.
  */
object MiniClusterProbe {
  def start(conf: SparkConf, coresPerWorker: Int, memMbPerWorker: Int)
      : (String, Seq[RpcEnv]) = {
    val (menv, _, _) =
      master.Master.startRpcEnvAndEndpoint("localhost", 0, 0, conf)
    val url = s"spark://localhost:${menv.address.port}"
    val w1 = worker.Worker.startRpcEnvAndEndpoint("localhost", 0, 0,
      coresPerWorker, memMbPerWorker, Array(url), null, Some(1), conf, None)
    val w2 = worker.Worker.startRpcEnvAndEndpoint("127.0.0.1", 0, 0,
      coresPerWorker, memMbPerWorker, Array(url), null, Some(2), conf, None)
    (url, Seq(menv, w1, w2))
  }

  def stop(envs: Seq[RpcEnv]): Unit = envs.reverse.foreach { e =>
    e.shutdown(); e.awaitTermination()
  }
}
