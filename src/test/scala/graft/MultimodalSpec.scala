package graft

import graft.functions.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("syntheticMedia has the binary+metadata schema") {
    val m = Multimodal.syntheticMedia(spark, 30)
    val sch = m.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(sch("bytes") == "binary")
    assert(sch("media_id") == "long")
    assert(m.count() == 30)
    assert(m.toDF().select(col("kind")).distinct().count() == 3)
  }

  test("extractFeatures is deterministic, fixed-dim, unit-norm, drops bytes") {
    val m = Multimodal.syntheticMedia(spark, 12)
    val f1 = Multimodal.extractFeatures(m, Multimodal.FakeCodec, dim = 16)
    assert(!f1.columns.contains("bytes")) // blobs never cross the shuffle
    val rows = f1.collect().sortBy(_.media_id)
    assert(rows.forall(_.feature.length == 16))
    val norm = math.sqrt(rows.head.feature.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    val f2 = Multimodal.extractFeatures(m, Multimodal.FakeCodec, dim = 16)
      .collect().sortBy(_.media_id)
    assert(rows.zip(f2).forall { case (a, b) => a.feature.sameElements(b.feature) })
  }

  private def png(w: Int, h: Int)(color: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, color(x, y))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("ImageIoCodec decodes real PNG bytes into pixel statistics") {
    import spark.implicits._
    val red = png(8, 8)((_, _) => 0xff0000)
    // left half black, right half white → luminance mass at both ends
    val halves = png(8, 8)((x, _) => if (x < 4) 0x000000 else 0xffffff)
    val media = Seq(
      Multimodal.MediaItem(0L, "image", red, 8, 8, 0, 0),
      Multimodal.MediaItem(1L, "image", halves, 8, 8, 0, 0),
      Multimodal.MediaItem(2L, "audio", Array[Byte](1, 2, 3), 0, 0, 16000, 1000),
      Multimodal.MediaItem(3L, "image", Array[Byte](9, 9, 9), 8, 8, 0, 0) // corrupt
    ).toDS()
    val feats = Multimodal.extractFeatures(media, Multimodal.ImageIoCodec, dim = 16)
      .collect().map(f => f.media_id -> f.feature).toMap
    val r = feats(0L)
    assert(math.abs(r(0) - 1.0f) < 1e-3 && r(1) < 1e-3 && r(2) < 1e-3) // means
    assert(r(3) < 1e-3 && r(4) < 1e-3 && r(5) < 1e-3) // solid color → zero stddev
    val hv = feats(1L)
    assert(math.abs(hv(0) - 0.5f) < 1e-3 && math.abs(hv(1) - 0.5f) < 1e-3 &&
      math.abs(hv(2) - 0.5f) < 1e-3) // half black + half white per channel
    val hist = hv.drop(6)
    assert(math.abs(hist.head - 0.5f) < 1e-3) // black pixels in the bottom bin
    assert(math.abs(hist.last - 0.5f) < 1e-3) // white pixels in the top bin
    // non-image and undecodable bytes fall back to the deterministic fake
    assert(feats(2L).sameElements(
      Multimodal.FakeCodec.extract("audio", Array[Byte](1, 2, 3), 16)))
    assert(feats(3L).sameElements(
      Multimodal.FakeCodec.extract("image", Array[Byte](9, 9, 9), 16)))
  }

  test("resizePlan preserves aspect ratio and caps the long side") {
    val m = Multimodal.syntheticMedia(spark, 30).toDF()
    val plan = Multimodal.resizePlan(m, maxSide = 32).collect()
    assert(plan.nonEmpty)
    plan.foreach { r =>
      val (tw, th) = (r.getAs[Int]("target_width"), r.getAs[Int]("target_height"))
      assert(tw <= 32 + 1 && th <= 32 + 1) // ceil rounding
      assert(tw > 0 && th > 0)
    }
  }

  test("frameSamplePlan yields one row per sampled frame for videos only") {
    val m = Multimodal.syntheticMedia(spark, 30).toDF()
    val frames = Multimodal.frameSamplePlan(m, everyMs = 500)
    assert(frames.select(col("kind")).distinct().collect().map(_.getString(0)).toSeq == Seq("video"))
    val one = frames.filter(col("media_id") === 2L)
    val dur = m.filter(col("media_id") === 2L).select(col("duration_ms")).head().getInt(0)
    assert(one.count() == (dur + 499) / 500)
  }
  test("GifVideoCodec decodes real animated-GIF frames into a motion track") {
    import spark.implicits._
    val media = Multimodal.syntheticMedia(spark, 12).filter(col("kind") === "video")
    val items = media.collect()
    val feats = Multimodal.extractFeatures(media, Multimodal.JvmCodec, dim = 16)
      .collect().map(f => f.media_id -> f.feature).toMap
    assert(feats.nonEmpty)
    items.foreach { m =>
      val f = feats(m.media_id)
      val expectedFrames = 2 + (m.media_id % 5).toInt
      assert(f(0) == expectedFrames.toFloat, s"id=${m.media_id} n_frames=${f(0)}")
      assert(f(1) > 0.05f && f(1) < 0.95f, s"mean lum=${f(1)}")
      assert(f(3) > 0f, s"sliding gradient must register motion, got ${f(3)}")
      assert(f(4) == m.width.toFloat && f(5) == m.height.toFloat)
      // sampled luminance track: all entries are valid luminances
      assert(f.drop(6).forall(l => l >= 0f && l <= 1f))
    }
    // corrupt video bytes degrade to the fake, not a partition failure
    val corrupt = Seq(Multimodal.MediaItem(99L, "video", Array[Byte](1, 2, 3),
      64, 64, 0, 1000)).toDS()
    val cf = Multimodal.extractFeatures(corrupt, Multimodal.JvmCodec, dim = 16).head()
    assert(cf.feature.sameElements(
      Multimodal.FakeCodec.extract("video", Array[Byte](1, 2, 3), 16)))
  }

  test("WavPcmCodec decodes a real sine-wave WAV into sample statistics") {
    import spark.implicits._
    val media = Multimodal.syntheticMedia(spark, 12).filter(col("kind") === "audio")
    val feats = Multimodal.extractFeatures(media, Multimodal.JvmCodec, dim = 16)
      .collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      val Array(rms, peak, zcr, meanAbs, seconds, channels) = f.feature.take(6)
      // 0.5-amplitude sine: rms = 0.5/sqrt(2), peak ~= 0.5
      assert(math.abs(rms - 0.5 / math.sqrt(2)) < 0.01, s"rms=$rms")
      assert(math.abs(peak - 0.5) < 0.01, s"peak=$peak")
      assert(zcr > 0.001 && zcr < 0.5, s"zcr=$zcr")
      assert(meanAbs > 0.2 && meanAbs < 0.4, s"meanAbs=$meanAbs")
      assert(seconds >= 0.9f && seconds <= 6.0f, s"seconds=$seconds")
      assert(channels == 1.0f)
      // histogram over |amplitude| is a distribution
      assert(math.abs(f.feature.drop(6).sum - 1.0) < 1e-3)
    }
    // zero-crossing rate tracks the per-id tone frequency: 2f/sr
    val byId = feats.map(f => f.media_id -> f.feature(2)).toMap
    byId.foreach { case (id, zcr) =>
      val freq = 110.0 * (1 + (id % 8))
      assert(math.abs(zcr - 2 * freq / 16000.0) < 0.005, s"id=$id zcr=$zcr")
    }
  }

  /** A real delta-coded GIF: frame 0 is a full-size gray screen, frame 1 a
    * quarter-size bright patch placed at (w/2, h/2) via its ImageDescriptor
    * offsets — the shape a naive per-frame reader gets wrong.
    */
  private def deltaGif(w: Int, h: Int): Array[Byte] = {
    import javax.imageio.{IIOImage, ImageIO, ImageTypeSpecifier}
    import javax.imageio.metadata.IIOMetadataNode
    val out = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    def gray(v: Int, gw: Int, gh: Int) = {
      val img = new java.awt.image.BufferedImage(gw, gh,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(v, v, v)); g.fillRect(0, 0, gw, gh); g.dispose()
      img
    }
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      writer.writeToSequence(new IIOImage(gray(40, w, h), null, null), null)
      val patch = gray(240, w / 4, h / 4)
      val md = writer.getDefaultImageMetadata(new ImageTypeSpecifier(patch), null)
      val fmt = "javax_imageio_gif_image_1.0"
      val tree = md.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
      val desc = tree.getElementsByTagName("ImageDescriptor").item(0)
        .asInstanceOf[IIOMetadataNode]
      desc.setAttribute("imageLeftPosition", (w / 2).toString)
      desc.setAttribute("imageTopPosition", (h / 2).toString)
      md.setFromTree(fmt, tree)
      writer.writeToSequence(new IIOImage(patch, null, md), null)
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  test("GifVideoCodec composites delta-coded frames onto the logical screen") {
    val w = 64; val h = 64
    val f = Multimodal.GifVideoCodec.extract("video", deltaGif(w, h), 16)
    // dimensions are the LOGICAL SCREEN, not the last frame's patch size
    assert(f(4) == w.toFloat && f(5) == h.toFloat, s"dims=${f(4)}x${f(5)}")
    assert(f(0) == 2f)
    // composited frame 1 = gray-40 screen with a bright patch over 1/16 of
    // it; a patch-only reading would be ~0.94, the composite ~0.206
    val lum0 = 40 / 255.0
    val lum1 = (40 * 15.0 / 16 + 240 / 16.0) / 255.0
    val track = f.drop(6)
    assert(math.abs(track.head - lum0) < 0.02, s"frame0 lum=${track.head}")
    assert(math.abs(track.last - lum1) < 0.02,
      s"frame1 lum=${track.last}: patch not composited at its offset")
    assert(math.abs(f(1) - (lum0 + lum1) / 2) < 0.02, s"mean=${f(1)}")
  }

  test("GifVideoCodec bounds frame count and canvas size") {
    import javax.imageio.{IIOImage, ImageIO}
    // 300 tiny frames → track capped at MaxFrames, streamed one canvas at
    // a time (no all-frames materialization)
    val out = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      val img = new java.awt.image.BufferedImage(4, 4,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until Multimodal.GifVideoCodec.MaxFrames + 44)
        .foreach(_ => writer.writeToSequence(new IIOImage(img, null, null), null))
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    val many = Multimodal.GifVideoCodec.extract("video", out.toByteArray, 8)
    assert(many(0) == Multimodal.GifVideoCodec.MaxFrames.toFloat)
    // a logical screen over MaxPixels degrades to the deterministic stub
    // instead of allocating the canvas
    val big = deltaGif(2100, 2100) // 4.41M px > 4M cap
    val bf = Multimodal.GifVideoCodec.extract("video", big, 8)
    assert(bf.sameElements(Multimodal.FakeCodec.extract("video", big, 8)))
  }
}
