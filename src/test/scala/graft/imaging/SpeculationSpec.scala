package graft.imaging

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._
import scala.sys.process._

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionTestWrapper
import graft.core.JobSettings

/** Speculative-execution safety (round-11 verdict item 7): the full
  * conversion job runs e2e with `spark.speculation=true` tuned to
  * re-launch every task (on a `local-cluster` master in a subprocess —
  * local mode never starts the speculation thread), and the resulting
  * store must be byte-identical to the non-speculative run. Duplicate
  * attempts race on the deterministic-path tmp+rename branches in the
  * chunk and shard writers (`SmartSpimPipeline.atomicPut` /
  * `writeLevelBy`), which this is the first test to actually drive.
  */
class SpeculationSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionTestWrapper.spark

  // big enough that decode/rechunk/write tasks outlast the speculation
  // check interval (tiny tasks all finish before a clone can launch)
  private val NZ = 16; private val NY = 1200; private val NX = 1500

  private def voxel(z: Int, y: Int, x: Int): Int = (z * 7919 + y * 113 + x) % 65536

  private lazy val root: Path = {
    val r = Files.createTempDirectory("graft-spec-exec")
    val stack = r.resolve("SmartSPIM/Ex_561_Em_600/430000/430000_480000")
    Files.createDirectories(stack)
    for (z <- 0 until NZ) {
      val px = new Array[Byte](NY * NX * 2)
      for (y <- 0 until NY; x <- 0 until NX) {
        val v = voxel(z, y, x); val i = y * NX + x
        px(2 * i) = (v & 0xFF).toByte
        px(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      }
      Files.write(stack.resolve(f"$z%06d.png"), ImageCodec.encodePng16(NX, NY, px))
    }
    r
  }
  private def stack = root.resolve("SmartSPIM/Ex_561_Em_600/430000/430000_480000")

  /** relpath → md5 of every store object (tmp and checksum sidecars
    * excluded — sidecars are a local-FS artifact, not store content). */
  private def digest(out: Path): Map[String, String] =
    Files.walk(out).iterator().asScala
      .filter(p => Files.isRegularFile(p) &&
        !p.getFileName.toString.endsWith(".crc") &&
        !p.getFileName.toString.contains(".tmp-"))
      .map { p =>
        val md = java.security.MessageDigest.getInstance("MD5")
        out.relativize(p).toString ->
          md.digest(Files.readAllBytes(p)).map("%02x".format(_)).mkString
      }.toMap

  test("speculative re-execution leaves the v3 sharded store byte-identical") {
    // reference store: plain in-process run, no speculation
    val plain = Files.createTempDirectory("graft-spec-plain")
    SmartSpimJob.convertStacks(spark, Seq(stack),
      JobSettings(inputSource = root.toString, outputDirectory = plain.toString,
        chunkSize = Seq(64, 64, 64), downsampleLevels = 3,
        zarrFormat = 3, shardGrid = Some(Seq(2, 2, 2))),
      Seq(2.0, 1.8, 1.8))
    val expected = digest(plain)
    assert(expected.nonEmpty)

    val specOut = Files.createTempDirectory("graft-spec-spec")
    val out = new StringBuilder
    val cmd = Seq("java") ++
      Seq("java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
        "java.net", "java.nio", "java.util", "java.util.concurrent",
        "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
        "sun.security.action", "sun.util.calendar")
        .flatMap(p => Seq("--add-opens", s"java.base/$p=ALL-UNNAMED")) ++
      Seq("-Xmx2g", "-cp", sys.props("java.class.path"),
        "graft.imaging.SpeculationProbe",
        stack.toString, root.toString, specOut.toString, "3")
    // SPARK_SCALA_VERSION: the standalone worker's executor launcher
    // cannot infer it outside a spark-submit context
    val code = Process(cmd, None,
      "SPARK_HOME" -> "/opt/spark", "SPARK_SCALA_VERSION" -> "2.13") !
      ProcessLogger(
      l => { out.append(l).append('\n'); () },
      l => { out.append(l).append('\n'); () })
    assert(code == 0, s"probe failed:\n${out.toString.takeRight(4000)}")
    val spec = "SPECULATIVE=(\\d+)".r.findFirstMatchIn(out.toString)
      .map(_.group(1).toInt)
    assert(spec.isDefined, "probe did not report a speculative count")
    assert(spec.get > 0,
      "speculation never fired — the run proves nothing; tighten the knobs")
    assert(digest(specOut) == expected,
      "speculative run produced different store bytes")
  }
}
