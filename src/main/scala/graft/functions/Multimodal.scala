package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines.
  *
  * Media (image/audio/video) travels as an opaque `binary` column plus a
  * typed metadata struct; decode / feature-extraction runs per partition so
  * a real decoder would amortize native-library initialization across a
  * batch (the Scala analog of `mapInPandas` batch processing). Decode sits
  * behind the [[MediaCodec]] seam: the JDK-native [[JvmCodec]] really
  * decodes PNG/JPEG pixels, WAV/PCM samples, and multi-frame video in both
  * GIF and MJPEG-AVI containers with zero native dependencies;
  * [[FakeCodec]] is the deterministic fallback for undecodable payloads
  * and the stand-in a production stack would replace with JNI codecs for
  * the genuinely-unknown containers (MP4/H.264, FLAC, …).
  *
  * Scale notes: media bytes are the widest column by far — always project
  * them away before any shuffle (`select` metadata + features first), keep
  * `spark.sql.files.maxPartitionBytes` small enough that a partition of
  * blobs fits in executor memory, and never collect blobs to the driver.
  */
object Multimodal {

  /** Typed media row: the reference's file-registry pattern
    * (`INTERFACE_FILE_MASTER` dir routing + `FILE_CONTROL` status,
    * `KafkaDemo.sh:236-295`) generalized to binary payload + metadata.
    */
  final case class MediaItem(
      media_id: Long,
      kind: String, // image | audio | video
      bytes: Array[Byte],
      width: Int,
      height: Int,
      sample_rate: Int,
      duration_ms: Int)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      feature: Array[Float])

  /** Decoder seam. Production wires a real codec (JNI image/audio libs);
    * this environment has none, so [[FakeCodec]] produces a deterministic
    * stand-in with the right shape.
    */
  trait MediaCodec extends Serializable {
    /** Decode + embed one payload into a fixed-size feature vector. */
    def extract(kind: String, bytes: Array[Byte], dim: Int): Array[Float]
  }

  /** STUB: deterministic fake decode — hashes the payload into a unit-norm
    * pseudo-embedding. Matches a real extractor's contract (fixed dim,
    * deterministic per payload) without any codec dependency.
    */
  object FakeCodec extends MediaCodec {
    override def extract(kind: String, bytes: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 1125899906842597L ^ kind.hashCode.toLong
      var i = 0
      while (i < bytes.length) { h = h * 31 + bytes(i); i += 1 }
      var d = 0
      var norm = 0.0
      while (d < dim) {
        h ^= h << 13; h ^= h >>> 7; h ^= h << 17 // xorshift
        out(d) = (h.toDouble / Long.MaxValue.toDouble).toFloat
        norm += out(d) * out(d)
        d += 1
      }
      val n = math.sqrt(norm).toFloat
      d = 0
      while (d < dim) { out(d) /= (if (n == 0f) 1f else n); d += 1 }
      out
    }
  }

  /** Real image decode via the JDK's ImageIO (PNG/JPEG/GIF/BMP — pure JVM,
    * no native libraries): per-channel mean and stddev in the first 6 slots,
    * a normalized luminance histogram over the remaining `dim - 6`. Audio
    * and video still route through [[FakeCodec]] (the JDK ships no codec
    * for them), as do undecodable image bytes — a corrupt blob degrades to
    * the deterministic fallback instead of failing its whole partition.
    * Decoder state is per-call here because ImageIO readers are cheap; a
    * native codec would hoist its handle to the `mapPartitions` scope in
    * [[extractFeatures]].
    */
  object ImageIoCodec extends MediaCodec {
    override def extract(kind: String, bytes: Array[Byte], dim: Int): Array[Float] = {
      if (kind != "image" || dim < 6) return FakeCodec.extract(kind, bytes, dim)
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: java.io.IOException => null }
      if (img == null) return FakeCodec.extract(kind, bytes, dim)
      val w = img.getWidth
      val h = img.getHeight
      val n = (w.toLong * h).toDouble
      val sum = new Array[Double](3)
      val sumSq = new Array[Double](3)
      val histBins = dim - 6
      val hist = new Array[Double](math.max(histBins, 1))
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = ((rgb >> 16) & 0xff) / 255.0
          val g = ((rgb >> 8) & 0xff) / 255.0
          val b = (rgb & 0xff) / 255.0
          sum(0) += r; sum(1) += g; sum(2) += b
          sumSq(0) += r * r; sumSq(1) += g * g; sumSq(2) += b * b
          if (histBins > 0) {
            val lum = 0.299 * r + 0.587 * g + 0.114 * b
            hist(math.min((lum * histBins).toInt, histBins - 1)) += 1.0
          }
          x += 1
        }
        y += 1
      }
      val out = new Array[Float](dim)
      var c = 0
      while (c < 3) {
        val mean = sum(c) / n
        out(c) = mean.toFloat
        out(c + 3) = math.sqrt(math.max(sumSq(c) / n - mean * mean, 0.0)).toFloat
        c += 1
      }
      var i = 0
      while (i < histBins) { out(6 + i) = (hist(i) / n).toFloat; i += 1 }
      out
    }
  }

  /** Real audio decode via the JDK's javax.sound.sampled (WAV/PCM — pure
    * JVM): RMS, peak, zero-crossing rate, mean absolute amplitude, duration
    * seconds, and channel count in the first 6 slots, a normalized
    * |amplitude| histogram over the remaining `dim - 6`. Non-audio kinds
    * and undecodable bytes fall back to [[FakeCodec]], like
    * [[ImageIoCodec]] does for images.
    */
  object WavPcmCodec extends MediaCodec {
    override def extract(kind: String, bytes: Array[Byte], dim: Int): Array[Float] = {
      if (kind != "audio" || dim < 6) return FakeCodec.extract(kind, bytes, dim)
      val samples =
        try decodePcm(bytes)
        catch { case _: Exception => null }
      if (samples == null || samples._1.length == 0) return FakeCodec.extract(kind, bytes, dim)
      val (s, sampleRate, channels) = samples
      val n = s.length
      var sumSq = 0.0; var sumAbs = 0.0; var peak = 0.0; var zc = 0
      val histBins = dim - 6
      val hist = new Array[Double](math.max(histBins, 1))
      var i = 0
      while (i < n) {
        val v = s(i)
        sumSq += v * v
        val a = math.abs(v)
        sumAbs += a
        if (a > peak) peak = a
        if (i > 0 && ((s(i - 1) >= 0) != (v >= 0))) zc += 1
        if (histBins > 0) hist(math.min((a * histBins).toInt, histBins - 1)) += 1.0
        i += 1
      }
      val out = new Array[Float](dim)
      out(0) = math.sqrt(sumSq / n).toFloat // rms
      out(1) = peak.toFloat
      out(2) = (zc.toDouble / n).toFloat // zero-crossing rate
      out(3) = (sumAbs / n).toFloat
      out(4) = (n.toDouble / (sampleRate * channels)).toFloat // seconds
      out(5) = channels.toFloat
      var b = 0
      while (b < histBins) { out(6 + b) = (hist(b) / n).toFloat; b += 1 }
      out
    }

    /** Decode WAV bytes to normalized samples in [-1, 1] (interleaved if
      * multi-channel), returning (samples, sampleRate, channels). Only
      * 8/16-bit PCM — the formats the JDK writes without plugins.
      */
    private def decodePcm(bytes: Array[Byte]): (Array[Double], Double, Int) = {
      val ais = javax.sound.sampled.AudioSystem
        .getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        val bits = fmt.getSampleSizeInBits
        require(bits == 8 || bits == 16, s"unsupported sample size $bits")
        val raw = ais.readAllBytes()
        val out =
          if (bits == 8) {
            // WAV 8-bit is unsigned, centered at 128
            raw.map(b => ((b & 0xff) - 128) / 128.0)
          } else {
            val n = raw.length / 2
            val arr = new Array[Double](n)
            val le = !fmt.isBigEndian
            var i = 0
            while (i < n) {
              val lo = raw(2 * i) & 0xff
              val hi = raw(2 * i + 1) & 0xff
              val v = if (le) (hi << 8) | lo else (lo << 8) | hi
              arr(i) = v.toShort / 32768.0
              i += 1
            }
            arr
          }
        (out, fmt.getSampleRate.toDouble, fmt.getChannels)
      } finally ais.close()
    }
  }

  /** Real video decode via the JDK's multi-frame GIF reader (the one
    * frame-sequence container ImageIO handles without plugins): frame
    * count, mean/stddev/motion of the per-frame luminance track, and
    * logical-screen dimensions in the first 6 slots; the remaining
    * `dim - 6` slots carry an evenly frame-sampled luminance track (the
    * "sample every k-th frame" primitive). Delta-coded GIFs (frames that
    * are sub-rectangle patches) are composited onto the logical screen at
    * their metadata offsets before luminance is measured, so features are
    * defined for real-world inputs, not just full-frame writers.
    * Non-video kinds and undecodable bytes fall back to [[FakeCodec]],
    * like the image and audio codecs do.
    *
    * Adversarial-input bounds: at most [[MaxFrames]] frames are decoded
    * (one composited canvas at a time — never the whole sequence in
    * memory), and a logical screen above [[MaxPixels]] falls back to the
    * stub instead of allocating an executor-threatening canvas.
    */
  object GifVideoCodec extends MediaCodec {
    /** Frame-count cap: 256 frames ≈ 10s of video at 25fps, far past the
      * point where the sampled track is saturated. */
    val MaxFrames = 256
    /** Logical-screen pixel cap (4M ≈ 2048×2048 RGB canvas = 16 MB). */
    val MaxPixels = 1 << 22

    override def extract(kind: String, bytes: Array[Byte], dim: Int): Array[Float] = {
      if (kind != "video" || dim < 6) return FakeCodec.extract(kind, bytes, dim)
      val track =
        try luminanceTrack(bytes)
        catch { case _: Exception => null }
      if (track == null) return FakeCodec.extract(kind, bytes, dim)
      val (lums, w, h) = track
      videoFeatures(lums, w, h, dim)
    }

    /** Streaming decode: composite each frame onto a single logical-screen
      * canvas (GIF delta frames carry `imageLeftPosition`/`imageTopPosition`
      * offsets in their `ImageDescriptor`), measure its mean luminance, and
      * move on — memory is one canvas regardless of frame count. Returns
      * (per-frame luminance, screen width, screen height), or null when the
      * payload isn't decodable within bounds.
      */
    private def luminanceTrack(bytes: Array[Byte]): (Array[Double], Int, Int) = {
      val iis = javax.imageio.ImageIO
        .createImageInputStream(new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return null
        val reader = readers.next()
        try {
          reader.setInput(iis, false)
          val total = reader.getNumImages(true)
          if (total <= 0) return null
          val (sw, sh) = logicalScreen(reader)
          if (sw <= 0 || sh <= 0 || sw.toLong * sh > MaxPixels) return null
          val canvas = new java.awt.image.BufferedImage(
            sw, sh, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = canvas.createGraphics()
          try {
            val n = math.min(total, MaxFrames)
            val lums = new Array[Double](n)
            var i = 0
            while (i < n) {
              val frame = reader.read(i)
              val (ox, oy) = frameOffset(reader, i)
              g.drawImage(frame, ox, oy, null)
              lums(i) = meanLuminance(canvas)
              i += 1
            }
            (lums, sw, sh)
          } finally g.dispose()
        } finally reader.dispose()
      } finally iis.close()
    }

    /** Logical screen size from the GIF stream metadata; falls back to
      * frame 0's dimensions for containers without one. */
    private def logicalScreen(reader: javax.imageio.ImageReader): (Int, Int) = {
      val fromMeta =
        try {
          val md = reader.getStreamMetadata
          if (md == null) None
          else {
            val tree = md.getAsTree("javax_imageio_gif_stream_1.0")
              .asInstanceOf[org.w3c.dom.Element]
            val lsd = tree.getElementsByTagName("LogicalScreenDescriptor")
            if (lsd.getLength == 0) None
            else {
              val e = lsd.item(0).asInstanceOf[org.w3c.dom.Element]
              Some((e.getAttribute("logicalScreenWidth").toInt,
                e.getAttribute("logicalScreenHeight").toInt))
            }
          }
        } catch { case _: Exception => None }
      fromMeta.getOrElse((reader.getWidth(0), reader.getHeight(0)))
    }

    /** Per-frame placement from the ImageDescriptor; (0,0) when absent. */
    private def frameOffset(reader: javax.imageio.ImageReader, i: Int): (Int, Int) =
      try {
        val tree = reader.getImageMetadata(i)
          .getAsTree("javax_imageio_gif_image_1.0")
          .asInstanceOf[org.w3c.dom.Element]
        val desc = tree.getElementsByTagName("ImageDescriptor")
        if (desc.getLength == 0) (0, 0)
        else {
          val e = desc.item(0).asInstanceOf[org.w3c.dom.Element]
          (e.getAttribute("imageLeftPosition").toInt,
            e.getAttribute("imageTopPosition").toInt)
        }
      } catch { case _: Exception => (0, 0) }
  }

  /** The shared video feature vector: frame count, mean/stddev/motion of
    * the per-frame luminance track, and frame dimensions in the first 6
    * slots; an evenly frame-sampled luminance track (the "sample every
    * k-th frame" primitive) in the rest. Both video containers (GIF and
    * MJPEG-AVI) reduce to a luminance track and meet here.
    */
  private def videoFeatures(lums: Array[Double], w: Int, h: Int,
                            dim: Int): Array[Float] = {
    val n = lums.length
    val mean = lums.sum / n
    val variance = lums.map(l => (l - mean) * (l - mean)).sum / n
    val motion =
      if (n > 1) lums.sliding(2).map(p => math.abs(p(1) - p(0))).sum / (n - 1)
      else 0.0
    val out = new Array[Float](dim)
    out(0) = n.toFloat
    out(1) = mean.toFloat
    out(2) = math.sqrt(variance).toFloat
    out(3) = motion.toFloat // temporal activity: mean |Δ luminance|
    out(4) = w.toFloat
    out(5) = h.toFloat
    val slots = dim - 6
    var i = 0
    while (i < slots) { out(6 + i) = lums((i.toLong * n / slots).toInt).toFloat; i += 1 }
    out
  }

  private def meanLuminance(img: java.awt.image.BufferedImage): Double = {
    val w = img.getWidth; val h = img.getHeight
    var s = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        s += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
          0.114 * (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    s / (255.0 * w * h)
  }

  /** Real video decode for MJPEG-in-AVI — the classic RIFF container with
    * per-frame JPEG payloads, parsed pure-JVM: walk the RIFF chunk tree to
    * the `movi` LIST, decode each `##dc`/`##db` frame chunk with ImageIO's
    * JPEG reader, and reduce to the same luminance-track features as
    * [[GifVideoCodec]] (reference surface: the conform layer's
    * file-type routing, `Kafka_ArrivalToConform.sh:536-540`, generalized to
    * media containers). Frame dimensions come from the `avih` main header
    * when present, else from the first decoded frame. Non-video kinds,
    * non-AVI bytes, and undecodable frames fall back to [[FakeCodec]];
    * [[GifVideoCodec.MaxFrames]]/[[GifVideoCodec.MaxPixels]] bound
    * adversarial inputs the same way the GIF path does (one decoded frame
    * in memory at a time — never the whole sequence).
    */
  object AviMjpegCodec extends MediaCodec {
    override def extract(kind: String, bytes: Array[Byte], dim: Int): Array[Float] = {
      if (kind != "video" || dim < 6) return FakeCodec.extract(kind, bytes, dim)
      val track =
        try luminanceTrack(bytes)
        catch { case _: Exception => null }
      if (track == null) return FakeCodec.extract(kind, bytes, dim)
      val (lums, w, h) = track
      videoFeatures(lums, w, h, dim)
    }

    private def le32(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

    private def fourcc(b: Array[Byte], off: Int): String =
      new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** Streaming parse: one decoded frame at a time, luminance measured and
      * the frame dropped. Returns null when the payload is not a decodable
      * AVI within bounds.
      */
    private def luminanceTrack(bytes: Array[Byte]): (Array[Double], Int, Int) = {
      if (bytes.length < 12 || fourcc(bytes, 0) != "RIFF" ||
        fourcc(bytes, 8) != "AVI ") return null
      val end = math.min(bytes.length.toLong, 8L + le32(bytes, 4)).toInt
      var aviW = 0; var aviH = 0
      val lums = scala.collection.mutable.ArrayBuffer.empty[Double]
      // Walk a chunk run [off, limit); recurse into LIST chunks. `avih`
      // carries dwWidth/dwHeight at data offsets 32/36; frame chunks are
      // `##dc`/`##db` (compressed/uncompressed video data for stream ##).
      def walk(start: Int, limit: Int): Unit = {
        var off = start
        while (off + 8 <= limit && lums.length < GifVideoCodec.MaxFrames) {
          val id = fourcc(bytes, off)
          val size = le32(bytes, off + 4)
          if (size < 0 || off + 8 + size > limit) return
          if (id == "LIST" && size >= 4) {
            walk(off + 12, off + 8 + size)
          } else if (id == "avih" && size >= 40) {
            aviW = le32(bytes, off + 8 + 32)
            aviH = le32(bytes, off + 8 + 36)
            if (aviW < 0 || aviH < 0 ||
              (aviW > 0 && aviH > 0 &&
                aviW.toLong * aviH > GifVideoCodec.MaxPixels))
              throw new java.io.IOException(s"canvas ${aviW}x$aviH over cap")
          } else if (size > 0 && id.length == 4 &&
            id(0).isDigit && id(1).isDigit &&
            (id.endsWith("dc") || id.endsWith("db"))) {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes, off + 8, size))
            if (img == null) throw new java.io.IOException("undecodable frame")
            if (img.getWidth.toLong * img.getHeight > GifVideoCodec.MaxPixels)
              throw new java.io.IOException("frame over pixel cap")
            if (aviW == 0) { aviW = img.getWidth; aviH = img.getHeight }
            lums += meanLuminance(img)
          }
          off += 8 + size + (size & 1) // chunks are word-aligned
        }
      }
      walk(12, end)
      if (lums.isEmpty) null else (lums.toArray, aviW, aviH)
    }
  }

  /** JDK-native media codec: real decodes for images ([[ImageIoCodec]]),
    * WAV audio ([[WavPcmCodec]]), and video — container-sniffed to
    * MJPEG-AVI ([[AviMjpegCodec]]) or GIF ([[GifVideoCodec]]); only
    * genuinely unknown containers and undecodable payloads hit the
    * deterministic stub.
    */
  object JvmCodec extends MediaCodec {
    private def isAvi(b: Array[Byte]): Boolean =
      b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' '

    override def extract(kind: String, bytes: Array[Byte], dim: Int): Array[Float] =
      kind match {
        case "image" => ImageIoCodec.extract(kind, bytes, dim)
        case "audio" => WavPcmCodec.extract(kind, bytes, dim)
        case "video" if isAvi(bytes) => AviMjpegCodec.extract(kind, bytes, dim)
        case "video" => GifVideoCodec.extract(kind, bytes, dim)
        case _ => FakeCodec.extract(kind, bytes, dim)
      }
  }

  /** Deterministic tiny PNG — real bytes a real decoder accepts (a per-id
    * color gradient), so the image path of the pipeline exercises an actual
    * decode, not just byte plumbing. Encoded executor-side, per row.
    */
  private def pngBytes(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((id * 37 + x * 3) % 256).toInt
        val g = ((id * 59 + y * 5) % 256).toInt
        val b = ((id + x + y) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Deterministic tiny animated GIF — real multi-frame container bytes the
    * JDK reader accepts (per-frame shifted gradient, so the luminance track
    * moves frame-over-frame). Encoded executor-side, per row.
    */
  private def gifBytes(id: Long, w: Int, h: Int, nFrames: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            // Brightness ramps with the frame index (no mod-256 wrap, which
            // would leave every frame's MEAN identical) → nonzero motion.
            val v = (f * 25 + ((id * 17 + x * 2 + y) % 64)).toInt
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    out.toByteArray
  }

  /** Deterministic tiny MJPEG-AVI — a real RIFF/AVI container (proper
    * `hdrl` headers + `movi` frame list, word-aligned chunks) whose frames
    * are ImageIO-encoded JPEGs of the same moving gradient as [[gifBytes]].
    * Encoded executor-side, per row.
    */
  private def aviBytes(id: Long, w: Int, h: Int, nFrames: Int): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    def chunk(cid: String, data: Array[Byte]): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + data.length + (data.length & 1))
        .order(ByteOrder.LITTLE_ENDIAN)
      bb.put(cid.getBytes(ascii)); bb.putInt(data.length); bb.put(data)
      bb.array() // trailing pad byte (odd sizes) is the zero from allocate
    }
    def list(typ: String, payload: Array[Byte]): Array[Byte] =
      chunk("LIST", typ.getBytes(ascii) ++ payload)
    val frames = (0 until nFrames).map { f =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = (f * 25 + ((id * 17 + x * 2 + y) % 64)).toInt
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
          x += 1
        }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      out.toByteArray
    }
    val avih = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
    avih.putInt(100000) // dwMicroSecPerFrame: 10 fps
    avih.putInt(0).putInt(0).putInt(0) // maxBytesPerSec, padding, flags
    avih.putInt(nFrames).putInt(0).putInt(1).putInt(0) // totalFrames, initial, streams, sugBuf
    avih.putInt(w).putInt(h) // dwWidth, dwHeight (+16 reserved zero bytes)
    val strh = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
    strh.put("vids".getBytes(ascii)).put("MJPG".getBytes(ascii))
    strh.putInt(0).putInt(0).putInt(0) // flags, prio+lang, initialFrames
    strh.putInt(1).putInt(10) // dwScale/dwRate = 10 fps
    strh.putInt(0).putInt(nFrames).putInt(0).putInt(-1).putInt(0) // start, len, sugBuf, quality, sampleSize
    strh.putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort) // rcFrame
    val strf = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
    strf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24) // BITMAPINFOHEADER
    strf.put("MJPG".getBytes(ascii)).putInt(w * h * 3) // biCompression, biSizeImage
    val hdrl = list("hdrl", chunk("avih", avih.array()) ++
      list("strl", chunk("strh", strh.array()) ++ chunk("strf", strf.array())))
    val movi = list("movi", frames.flatMap(fb => chunk("00dc", fb)).toArray)
    chunk("RIFF", "AVI ".getBytes(ascii) ++ hdrl ++ movi)
  }

  /** Deterministic tiny WAV — a per-id sine tone as real 16-bit PCM bytes
    * the JDK decoder accepts. Encoded executor-side, per row.
    */
  private def wavBytes(id: Long, sampleRate: Int, durationMs: Int): Array[Byte] = {
    val n = sampleRate * durationMs / 1000
    val freq = 110.0 * (1 + (id % 8))
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = (math.sin(2 * math.Pi * freq * i / sampleRate) * 0.5 * 32767).toInt.toShort
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Deterministic synthetic media table (no media files ship with the test
    * data): images are real PNGs ([[pngBytes]]), audio rows real WAVs
    * ([[wavBytes]]), and video rows alternate between real animated GIFs
    * ([[gifBytes]]) and real MJPEG-AVIs ([[aviBytes]]), so [[JvmCodec]]
    * decodes genuine pixels, samples, and frames from BOTH video
    * containers end-to-end. Used by specs and q42 to exercise the pipeline.
    */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaItem] = {
    import spark.implicits._
    spark.range(n.toLong).map { id =>
      val kind = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val width = if (kind == "image" || kind == "video") 64 + (id % 4).toInt * 32 else 0
      val height = if (kind == "image" || kind == "video") 64 else 0
      val durationMs = if (kind != "image") 1000 + (id % 10).toInt * 500 else 0
      val bytes = kind match {
        case "image" => pngBytes(id, width, height)
        case "audio" => wavBytes(id, 16000, durationMs)
        case _ if (id / 3) % 2 == 0 => gifBytes(id, width, height, nFrames = 2 + (id % 5).toInt)
        case _ => aviBytes(id, width, height, nFrames = 2 + (id % 5).toInt)
      }
      MediaItem(id, kind, bytes, width, height,
        sample_rate = if (kind == "audio") 16000 else 0,
        duration_ms = durationMs)
    }
  }

  /** Partition-batched decode + feature extraction: one codec handle per
    * partition (the Scala `mapPartitions` analog of `mapInPandas` batches),
    * media bytes dropped from the output so downstream shuffles stay narrow.
    */
  def extractFeatures(media: Dataset[MediaItem], codec: MediaCodec,
                      dim: Int): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // Real codecs initialize native state here, once per partition.
      rows.map { m =>
        MediaFeatures(m.media_id, m.kind, m.bytes.length,
          codec.extract(m.kind, m.bytes, dim))
      }
    }
  }

  /** Metadata-only resize plan: compute target dimensions preserving aspect
    * ratio (the pure-relational part of an image resize — the pixel work
    * happens inside the codec seam at execution time).
    */
  def resizePlan(media: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(
      lit(maxSide).cast("double") / col("width"),
      lit(maxSide).cast("double") / col("height"),
      lit(1.0))
    media
      .filter(col("kind").isin("image", "video") && col("width") > 0)
      .withColumn("target_width", ceil(col("width") * scale).cast("int"))
      .withColumn("target_height", ceil(col("height") * scale).cast("int"))
  }

  /** Frame-sampling plan for video: one row per sampled frame timestamp
    * (every `everyMs`). Pure relational explode — the decode of each frame
    * happens behind the codec seam.
    */
  def frameSamplePlan(media: DataFrame, everyMs: Int): DataFrame =
    media
      .filter(col("kind") === "video" && col("duration_ms") > 0)
      .withColumn("frame_ms",
        explode(sequence(lit(0), col("duration_ms") - 1, lit(everyMs))))
}
