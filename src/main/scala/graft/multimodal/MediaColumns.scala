package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.imaging.ImageCodec

/** Multimodal columns: media as opaque `binary` payloads plus a typed
  * metadata struct (SURVEY.md §1.4). Decode runs as a per-partition
  * batch transform — the Scala analogue of a Pandas-UDF-over-
  * mapInPandas stage: the executor amortizes codec setup across a
  * partition and never materializes more than one batch.
  *
  * Image decode is REAL (16-bit PNG/TIFF via graft.imaging.ImageCodec);
  * audio/video feature extraction is a deterministic stub (`fakeAudio`)
  * because no codec library ships in this environment — the schema,
  * partitioning and batch shape are the production ones.
  */
object MediaColumns {

  final case class MediaRow(id: Long, mime: String, bytes: Array[Byte])
  final case class ImageFeatures(id: Long, width: Int, height: Int,
      meanIntensity: Double, maxIntensity: Int, nBytes: Int)
  final case class AudioFeatures(id: Long, nSamples: Int, rms: Double)

  /** Decode a binary image column to typed features, one partition at
    * a time. */
  def decodeImages(media: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val d = ImageCodec.decode(m.bytes)
        var sum = 0L; var max = 0
        var i = 0
        val n = d.width * d.height
        while (i < n) {
          val v = ((d.data(2 * i + 1) & 0xFF) << 8) | (d.data(2 * i) & 0xFF)
          sum += v; if (v > max) max = v
          i += 1
        }
        ImageFeatures(m.id, d.width, d.height, sum.toDouble / n, max, m.bytes.length)
      }
    }
  }

  /** STUB audio "decode": interprets bytes as 8-bit samples. Stands in
    * for a real codec with identical plumbing (batched mapPartitions,
    * typed output). Deterministic. */
  def fakeAudioFeatures(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        var sumSq = 0.0
        m.bytes.foreach { b => val v = (b & 0xFF) - 128; sumSq += v.toDouble * v }
        AudioFeatures(m.id, m.bytes.length,
          if (m.bytes.isEmpty) 0.0 else math.sqrt(sumSq / m.bytes.length))
      }
    }
  }

  /** Wrap raw binary rows with metadata columns (content digest,
    * length) — the ingestion step of a media lakehouse table. */
  def withMediaMeta(df: DataFrame, bytesCol: String): DataFrame =
    df.withColumn("media_digest", md5(col(bytesCol)))
      .withColumn("media_bytes", length(col(bytesCol)))
}
