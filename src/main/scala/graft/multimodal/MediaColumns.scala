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
  * Image decode is REAL (16-bit PNG/TIFF via graft.imaging.ImageCodec),
  * and so is audio for RIFF/WAVE PCM16 (`decodeWavFeatures` — WAV needs
  * no codec library, just the RIFF chunk walk). Compressed audio and
  * video remain deterministic stubs (`fakeAudioFeatures`,
  * `sampleFrames`) because no codec library ships in this environment —
  * their schema, partitioning and batch shape are the production ones.
  */
object MediaColumns {

  final case class MediaRow(id: Long, mime: String, bytes: Array[Byte])
  final case class ImageFeatures(id: Long, width: Int, height: Int,
      meanIntensity: Double, maxIntensity: Int, nBytes: Int)
  final case class AudioFeatures(id: Long, nSamples: Int, rms: Double)
  /** Resized image: raw uint16 little-endian pixels. */
  final case class ImageRow(id: Long, width: Int, height: Int, bytes: Array[Byte])
  /** One sampled frame; `frameIdx` is the index in the source clip. */
  final case class FrameRow(id: Long, frameIdx: Int, bytes: Array[Byte])

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

  final case class ImageHash(id: Long, ph: Long)

  /** Average-hash (aHash) perceptual fingerprint: decode, then one bit
    * per pixel — set iff v·n > Σv (strict integer comparison, so the
    * threshold is exact with no mean rounding). Packs into a long, so
    * inputs must arrive at ≤ 63 pixels (enforced below): callers hash
    * thumbnails, pre-reducing larger images to the fingerprint grid
    * with [[resizeImages]] as the classic aHash recipe does — the
    * reduction is deliberately NOT fused in here, because the hash
    * must stay a pure pixels→bits function for cross-engine replay.
    * Integer-exact end to end — the bit pattern is reproducible by any
    * engine from the pixel values alone. */
  def perceptualHashes(media: Dataset[MediaRow]): Dataset[ImageHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val d = ImageCodec.decode(m.bytes)
        val n = d.width * d.height
        require(n <= 63, s"aHash packs one bit per pixel into a long (got $n px)")
        val vals = new Array[Int](n)
        var sum = 0L
        var i = 0
        while (i < n) {
          vals(i) = ((d.data(2 * i + 1) & 0xFF) << 8) | (d.data(2 * i) & 0xFF)
          sum += vals(i)
          i += 1
        }
        var h = 0L
        i = 0
        while (i < n) {
          if (vals(i).toLong * n > sum) h |= 1L << i
          i += 1
        }
        ImageHash(m.id, h)
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

  final case class WavFeatures(id: Long, sampleRate: Int, channels: Int,
      nSamples: Int, durationMs: Double, rms: Double)

  /** Minimal canonical RIFF/WAVE PCM16 mono encoder (44-byte header) —
    * fixture/test side of the real decoder below. */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16) // block align, bits
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** REAL audio decode for RIFF/WAVE PCM16: walks the chunk list
    * (fmt / data; unknown chunks skipped with RIFF even-padding),
    * validates PCM 16-bit, and extracts rate/duration/RMS — per
    * partition, like every decoder here. */
  /** Parse a 16-bit PCM RIFF/WAVE payload into (sampleRate, channels,
    * interleaved samples). The RIFF chunk walk skips LIST/INFO etc. */
  private def parsePcm16(b: Array[Byte]): (Int, Int, Array[Short]) = {
    def le32(o: Int): Int =
      (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
      ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)
    def le16(o: Int): Int = (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
    def tag(o: Int): String = new String(b, o, 4, "US-ASCII")
    require(b.length >= 12 && tag(0) == "RIFF" && tag(8) == "WAVE",
      "not a RIFF/WAVE payload")
    var off = 12
    var rate = -1; var channels = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    while (off + 8 <= b.length) {
      val id = tag(off); val len = le32(off + 4)
      require(len >= 0 && off + 8 + len <= b.length, s"truncated $id chunk")
      id match {
        case "fmt " =>
          require(le16(off + 8) == 1, "only PCM wav supported")
          channels = le16(off + 10); rate = le32(off + 12); bits = le16(off + 22)
        case "data" => dataOff = off + 8; dataLen = len
        case _ => () // LIST/INFO/etc: skip
      }
      off += 8 + len + (len & 1) // chunks are even-padded
    }
    require(rate > 0 && channels > 0 && dataOff >= 0, "missing fmt /data chunk")
    require(bits == 16, s"only 16-bit PCM supported, got $bits")
    val n = dataLen / 2
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) {
      samples(i) = ((b(dataOff + 2 * i + 1) << 8) | (b(dataOff + 2 * i) & 0xFF)).toShort
      i += 1
    }
    (rate, channels, samples)
  }

  def decodeWavFeatures(media: Dataset[MediaRow]): Dataset[WavFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val (rate, channels, s) = parsePcm16(m.bytes)
        val n = s.length / channels
        var sumSq = 0.0
        var i = 0
        while (i < s.length) { sumSq += s(i).toDouble * s(i); i += 1 }
        WavFeatures(m.id, rate, channels, n, n * 1000.0 / rate,
          if (n == 0) 0.0 else math.sqrt(sumSq / s.length))
      }
    }
  }

  final case class FrameEnergy(id: Long, frameIdx: Int, energy: Long)

  /** Per-frame exact integer energies of a PCM16 clip: frames of
    * `frameLen` samples (trailing partial frame kept), energy =
    * Σ s² as a long — the front half of every energy-based audio
    * operator (fingerprinting keeps it fused below; VAD consumes the
    * frame stream relationally). Envelope: |s| ≤ 2¹⁵ so a frame term
    * ≤ 2³⁰; a long holds 2³³ frames' worth. */
  def audioFrameEnergies(media: Dataset[MediaRow], frameLen: Int): Dataset[FrameEnergy] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      val (_, _, s) = parsePcm16(m.bytes)
      val nf = (s.length + frameLen - 1) / frameLen
      (0 until nf).map { f =>
        var e = 0L
        var i = f * frameLen
        val end = math.min(s.length, i + frameLen)
        while (i < end) { e += s(i).toLong * s(i); i += 1 }
        FrameEnergy(m.id, f, e)
      }
    }
  }

  final case class AudioFingerprint(id: Long, afp: Long)

  /** Shazam-style time-domain audio fingerprint: successive 2-sample
    * frame energies E_f = s²+s' ² (exact longs), bit f set iff
    * E_{f+1} > E_f (strict) — the sign-of-energy-delta rule the
    * spectral original applies per band, applied in the time domain
    * because no FFT library ships here. 32 frames over the 64-sample
    * fixtures → a 31-bit fingerprint; integer-exact end to end, so any
    * engine reproduces the bits from the samples alone. */
  def audioFingerprints(media: Dataset[MediaRow]): Dataset[AudioFingerprint] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val (_, _, s) = parsePcm16(m.bytes)
        val nf = s.length / 2
        val e = Array.tabulate(nf) { f =>
          val a = s(2 * f).toLong; val b = s(2 * f + 1).toLong
          a * a + b * b
        }
        var h = 0L
        var f = 0
        while (f < nf - 1) {
          if (e(f + 1) > e(f)) h |= 1L << f
          f += 1
        }
        AudioFingerprint(m.id, h)
      }
    }
  }

  /** REAL box-mean downscale by an integer factor on decoded 16-bit
    * images (PNG/TIFF in, raw uint16 LE out). Mean is floor-truncated,
    * matching the pyramid's dtype-preserving windowed mean; partial
    * edge windows average over the pixels present. Per-partition batch
    * transform like decodeImages. */
  def resizeImages(media: Dataset[MediaRow], factor: Int): Dataset[ImageRow] = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val d = ImageCodec.decode(m.bytes)
        val ow = (d.width + factor - 1) / factor
        val oh = (d.height + factor - 1) / factor
        val out = new Array[Byte](ow * oh * 2)
        var y = 0
        while (y < oh) {
          val y1 = math.min((y + 1) * factor, d.height)
          var x = 0
          while (x < ow) {
            val x1 = math.min((x + 1) * factor, d.width)
            var sum = 0L; var n = 0
            var iy = y * factor
            while (iy < y1) {
              var ix = x * factor
              while (ix < x1) {
                val off = (iy * d.width + ix) * 2
                sum += ((d.data(off + 1) & 0xFF) << 8) | (d.data(off) & 0xFF)
                n += 1; ix += 1
              }
              iy += 1
            }
            val v = (sum / n).toInt
            val off = (y * ow + x) * 2
            out(off) = (v & 0xFF).toByte
            out(off + 1) = ((v >> 8) & 0xFF).toByte
            x += 1
          }
          y += 1
        }
        ImageRow(m.id, ow, oh, out)
      }
    }
  }

  final case class AviFrame(id: Long, frameIdx: Int, width: Int, height: Int,
      bytes: Array[Byte])

  /** BI_RLE8 compression id in a BITMAPINFOHEADER (public Windows
    * bitmap spec); 0 = BI_RGB (uncompressed). */
  val BI_RGB = 0
  val BI_RLE8 = 1

  /** BMP RLE8 encoder (public Windows bitmap spec — the first
    * compressed frame format here that is codec-library-free): maximal
    * pixel runs become encoded-mode pairs (count, value); stretches of
    * short runs ≥ 3 literals become absolute mode (00, n, bytes,
    * word-padded); rows are encoded bottom-up, each terminated by EOL
    * (00 00) and the bitmap by EOB (00 01). Input is top-down
    * row-major, as produced by every decoder in this file. */
  def encodeRle8(width: Int, height: Int, topDown: Array[Byte]): Array[Byte] = {
    require(topDown.length == width * height, "pixel buffer size mismatch")
    val out = new java.io.ByteArrayOutputStream()
    var row = height - 1 // bottom-up: last top-down row is encoded first
    while (row >= 0) {
      val base = row * width
      // segment the row into maximal runs (value, length ≤ 255)
      val runs = scala.collection.mutable.ArrayBuffer.empty[(Byte, Int)]
      var x = 0
      while (x < width) {
        val v = topDown(base + x)
        var n = 1
        while (x + n < width && topDown(base + x + n) == v && n < 255) n += 1
        runs += ((v, n))
        x += n
      }
      var i = 0
      while (i < runs.length) {
        if (runs(i)._2 >= 3) { out.write(runs(i)._2); out.write(runs(i)._1); i += 1 }
        else {
          // gather consecutive short runs into one literal stretch
          var j = i; var lit = 0
          while (j < runs.length && runs(j)._2 < 3 && lit + runs(j)._2 <= 255) {
            lit += runs(j)._2; j += 1
          }
          if (lit >= 3) { // absolute mode, word-aligned
            out.write(0); out.write(lit)
            (i until j).foreach { k =>
              (0 until runs(k)._2).foreach(_ => out.write(runs(k)._1))
            }
            if ((lit & 1) == 1) out.write(0)
          } else { // too short for absolute mode: encoded pairs
            (i until j).foreach { k => out.write(runs(k)._2); out.write(runs(k)._1) }
          }
          i = j
        }
      }
      out.write(0); out.write(if (row == 0) 1 else 0) // EOL; EOB after the last row
      row -= 1
    }
    out.toByteArray
  }

  /** BMP RLE8 decoder — the FULL escape set (EOL, EOB, delta dx/dy,
    * absolute mode with word padding), not just what [[encodeRle8]]
    * emits. Returns top-down row-major pixels; positions skipped by
    * delta jumps stay 0, per the spec. */
  def decodeRle8(width: Int, height: Int, data: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](width * height)
    var x = 0; var y = 0 // y = 0 is the BOTTOM row (BMP convention)
    var p = 0
    var done = false
    def put(v: Byte): Unit = {
      require(x < width && y < height, "RLE8 output overflow")
      out((height - 1 - y) * width + x) = v
      x += 1
    }
    while (!done && p + 1 < data.length) {
      val b0 = data(p) & 0xFF; val b1 = data(p + 1) & 0xFF
      p += 2
      if (b0 > 0) (0 until b0).foreach(_ => put(b1.toByte))
      else b1 match {
        case 0 => x = 0; y += 1 // end of line
        case 1 => done = true // end of bitmap
        case 2 => // delta: move right dx, up dy
          require(p + 1 < data.length, "truncated RLE8 delta")
          x += data(p) & 0xFF; y += data(p + 1) & 0xFF; p += 2
        case n => // absolute mode: n literal bytes, word-padded
          require(p + n <= data.length, "truncated RLE8 absolute run")
          (0 until n).foreach(k => put(data(p + k)))
          p += n + (n & 1)
      }
    }
    require(done, "RLE8 stream missing end-of-bitmap")
    out
  }

  /** Minimal RIFF/AVI encoder: hdrl LIST with a 56-byte avih header
    * plus a strl LIST (strh 'vids' + strf BITMAPINFOHEADER declaring
    * the compression, as real AVIs do), movi LIST with one even-padded
    * chunk per frame — the fixture/test side of the real container
    * walker below. With `compression = BI_RLE8` each frame (top-down
    * raw pixels) is RLE8-compressed into a '00dc' chunk; with BI_RGB
    * frames are stored raw as '00db'. */
  def encodeAvi(width: Int, height: Int, frames: Seq[Array[Byte]],
      microSecPerFrame: Int = 40000, compression: Int = BI_RGB,
      withAudioStream: Boolean = false): Array[Byte] = {
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val pad = payload.length & 1
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(id.getBytes("US-ASCII")).putInt(payload.length).put(payload)
      bb.array()
    }
    def list(listType: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + payload.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("LIST".getBytes("US-ASCII")).putInt(4 + payload.length)
        .put(listType.getBytes("US-ASCII")).put(payload)
      bb.array()
    }
    val avih = java.nio.ByteBuffer.allocate(56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(microSecPerFrame).putInt(0).putInt(0).putInt(0)
      .putInt(frames.length).putInt(0).putInt(1).putInt(0)
      .putInt(width).putInt(height)
      .array() // 4 reserved ints stay zero
    // strh: 'vids' stream header (56 bytes; only fccType matters to the
    // walker, the rest is well-formed padding)
    val strh = java.nio.ByteBuffer.allocate(56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("vids".getBytes("US-ASCII")).putInt(0) // fccHandler
      .array()
    // strf: BITMAPINFOHEADER — biCompression at offset 16 is what the
    // walker reads to pick the frame decode path
    val strf = java.nio.ByteBuffer.allocate(40)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(40).putInt(width).putInt(height)
      .putShort(1).putShort(8) // planes, 8 bpp
      .putInt(compression).putInt(width * height)
      .array()
    val strl = list("strl", chunk("strh", strh) ++ chunk("strf", strf))
    // Optional second stream, as real muxed AVIs have: an 'auds' strl
    // whose strf is a 40-byte WAVEFORMATEXTENSIBLE-sized blob. Bytes at
    // offset 16 are deliberately NOT a bitmap compression id — a walker
    // that reads biCompression from any strf would be poisoned by it.
    val audioStrl = if (!withAudioStream) Array.emptyByteArray else {
      val strhA = java.nio.ByteBuffer.allocate(56)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .put("auds".getBytes("US-ASCII")).putInt(0)
        .array()
      val strfA = java.nio.ByteBuffer.allocate(40)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putShort(0xFFFE.toShort).putShort(2) // wFormatTag, nChannels
        .putInt(48000).putInt(192000) // sample rate, byte rate
        .putShort(4).putShort(16) // block align, bits/sample
        .putInt(0xDEADBEEF) // offset 16: garbage if read as biCompression
        .array()
      list("strl", chunk("strh", strhA) ++ chunk("strf", strfA))
    }
    val hdrl = list("hdrl", chunk("avih", avih) ++ strl ++ audioStrl)
    val movi = list("movi", frames.toArray.flatMap { f =>
      if (compression == BI_RLE8) chunk("00dc", encodeRle8(width, height, f))
      else chunk("00db", f)
    })
    val body = hdrl ++ movi
    val bb = java.nio.ByteBuffer.allocate(12 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + body.length)
      .put("AVI ".getBytes("US-ASCII")).put(body)
    bb.array()
  }

  /** REAL video-container frame sampler for RIFF/AVI: walks the chunk
    * tree (hdrl → avih for dimensions, strl → strf BITMAPINFOHEADER for
    * the compression id, movi → '00db'/'00dc' frame chunks, unknown
    * chunks/lists skipped with even-padding) and emits every `everyN`th
    * frame with its source index. Uncompressed frames pass through;
    * BI_RLE8 '00dc' frames are decoded to raw top-down pixels by the
    * full-spec [[decodeRle8]] — the first compressed frame path with no
    * codec library needed. Per-partition batch transform. */
  def sampleFramesAvi(media: Dataset[MediaRow], everyN: Int): Dataset[AviFrame] = {
    require(everyN > 0)
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      val b = m.bytes
      def le32(o: Int): Int =
        (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
        ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)
      def tag(o: Int): String = new String(b, o, 4, "US-ASCII")
      require(b.length >= 12 && tag(0) == "RIFF" && tag(8) == "AVI ",
        "not a RIFF/AVI payload")
      var width = -1; var height = -1
      var compression = BI_RGB
      var videoStrfSeen = false
      // Stream type ('vids'/'auds'/...) of the strl list currently being
      // walked, set by its strh. biCompression may only be read from the
      // strf of the FIRST video stream: in a multi-stream AVI the audio
      // strf (WAVEFORMATEX(TENSIBLE), often 40 bytes) would otherwise be
      // parsed last and clobber `compression` with bytes from offset 16.
      var curStreamType = ""
      // (wasCompressed, payload); decode deferred until the walk ends so
      // chunk order (strf before/after movi) can't change the result
      val frames = scala.collection.mutable.ArrayBuffer.empty[(Boolean, Array[Byte])]
      def walk(from: Int, to: Int, inMovi: Boolean, inHdrl: Boolean,
          inStrl: Boolean): Unit = {
        var off = from
        while (off + 8 <= to) {
          val id = tag(off); val len = le32(off + 4)
          require(len >= 0 && off + 8 + len <= to, s"truncated $id chunk")
          id match {
            case "LIST" =>
              val lt = tag(off + 8)
              if (lt == "strl") curStreamType = "" // unknown until its strh
              walk(off + 12, off + 8 + len, lt == "movi", lt == "hdrl",
                lt == "strl")
            case "avih" if inHdrl =>
              width = le32(off + 8 + 32); height = le32(off + 8 + 36)
            case "strh" if inStrl && len >= 4 =>
              curStreamType = tag(off + 8) // fccType
            case "strf" if inStrl && curStreamType == "vids" && !videoStrfSeen &&
                len >= 20 => // BITMAPINFOHEADER: biCompression at +16
              compression = le32(off + 8 + 16); videoStrfSeen = true
            case "00db" if inMovi =>
              frames += ((false, java.util.Arrays.copyOfRange(b, off + 8, off + 8 + len)))
            case "00dc" if inMovi =>
              frames += ((true, java.util.Arrays.copyOfRange(b, off + 8, off + 8 + len)))
            case _ => () // idx1, JUNK, non-video strf, ...
          }
          off += 8 + len + (len & 1)
        }
      }
      walk(12, b.length, inMovi = false, inHdrl = false, inStrl = false)
      require(width >= 0, "missing avih header")
      (0 until frames.length by everyN).map { i =>
        val (wasCompressed, payload) = frames(i)
        val px =
          if (wasCompressed && compression == BI_RLE8)
            decodeRle8(width, height, payload)
          else payload
        AviFrame(m.id, i, width, height, px)
      }
    }
  }

  /** STUB video frame sampler: the payload is treated as a container of
    * fixed-size frames laid end to end (retained for codec-bearing
    * formats this environment cannot decode — the real container path
    * is [[sampleFramesAvi]]). Emits every `everyN`th complete frame
    * with its source index. */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int,
      everyN: Int): Dataset[FrameRow] = {
    require(frameBytes > 0 && everyN > 0)
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      val nFrames = m.bytes.length / frameBytes
      (0 until nFrames by everyN).map { i =>
        FrameRow(m.id, i,
          java.util.Arrays.copyOfRange(m.bytes, i * frameBytes, (i + 1) * frameBytes))
      }
    }
  }

  /** Wrap raw binary rows with metadata columns (content digest,
    * length) — the ingestion step of a media lakehouse table. */
  def withMediaMeta(df: DataFrame, bytesCol: String): DataFrame =
    df.withColumn("media_digest", md5(col(bytesCol)))
      .withColumn("media_bytes", length(col(bytesCol)))
}
