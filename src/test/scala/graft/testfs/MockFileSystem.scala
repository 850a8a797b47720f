package graft.testfs

import java.net.URI
import org.apache.hadoop.fs.{FSDataInputStream, Path, PositionedReadable, RawLocalFileSystem, Seekable}

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

  /** Reads are wrapped with a byte counter so tests can assert READ
    * VOLUME — e.g. that a one-chunk lookup in a large v3 shard seeks
    * via the footer index instead of buffering the whole object. */
  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val inner = super.open(f, bufferSize)
    new FSDataInputStream(new MockFileSystem.CountingStream(inner))
  }
}

object MockFileSystem {
  val created = new java.util.concurrent.atomic.AtomicInteger(0)
  val bytesRead = new java.util.concurrent.atomic.AtomicLong(0L)

  final class CountingStream(inner: FSDataInputStream)
      extends java.io.InputStream with Seekable with PositionedReadable {
    override def read(): Int = {
      val b = inner.read(); if (b >= 0) bytesRead.incrementAndGet(); b
    }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      val n = inner.read(b, off, len); if (n > 0) bytesRead.addAndGet(n); n
    }
    override def read(position: Long, buffer: Array[Byte],
        offset: Int, length: Int): Int = {
      val n = inner.read(position, buffer, offset, length)
      if (n > 0) bytesRead.addAndGet(n); n
    }
    override def readFully(position: Long, buffer: Array[Byte],
        offset: Int, length: Int): Unit = {
      inner.readFully(position, buffer, offset, length)
      bytesRead.addAndGet(length); ()
    }
    override def readFully(position: Long, buffer: Array[Byte]): Unit = {
      inner.readFully(position, buffer)
      bytesRead.addAndGet(buffer.length); ()
    }
    override def seek(pos: Long): Unit = inner.seek(pos)
    override def getPos: Long = inner.getPos
    override def seekToNewSource(targetPos: Long): Boolean =
      inner.seekToNewSource(targetPos)
    override def close(): Unit = inner.close()
  }
}
