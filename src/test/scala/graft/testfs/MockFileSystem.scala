package graft.testfs

import java.net.URI
import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** A second Hadoop FileSystem scheme (`mock://`) backed by the local
  * disk, registered via src/test/resources/core-site.xml. Exists to pin
  * that every output path in the job goes through the Hadoop
  * `FileSystem` API — never `java.nio` — so `s3a://` stores work by
  * construction (reference S9/S10, smartspim_job.py:169-195, replaced
  * by direct Hadoop-FS writes per SURVEY.md §2.1). Counts every file
  * created through the scheme so tests can assert it was exercised.
  */
class MockFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "mock"
  override def getUri: URI = URI.create("mock:///")

  override def create(f: Path, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream = {
    MockFileSystem.created.incrementAndGet()
    super.create(f, overwrite, bufferSize, replication, blockSize, progress)
  }
}

object MockFileSystem {
  val created = new java.util.concurrent.atomic.AtomicInteger(0)
}
