package graft.operators

import graft.SparkSpecBase
import graft.core.Lake

class MultimodalSpec extends SparkSpecBase {

  private lazy val media =
    Multimodal.mediaFromDocuments(spark, Lake.table(spark, sf0001, "documents"))

  test("decode produces shape-correct, deterministic pixel buffers") {
    val a = Multimodal.decodeImages(media).collect().sortBy(_.media_id)
    val b = Multimodal.decodeImages(media).collect().sortBy(_.media_id)
    assert(a.length == 500)
    assert(a.forall(d => d.pixels.length == d.width * d.height * d.channels))
    assert(a.zip(b).forall { case (x, y) => x.pixels.sameElements(y.pixels) })
  }

  test("decode is content-dependent (different payloads → different pixels)") {
    val two = Multimodal.decodeImages(media)
      .filter(_.media_id < 2).collect().sortBy(_.media_id)
    assert(!two(0).pixels.sameElements(two(1).pixels.take(two(0).pixels.length)))
  }

  test("resize: nearest-neighbour on a crafted 2x2 → 4x4 duplicates pixels") {
    val px = Array[Byte](1, 2, 3, 4) // 2x2, 1 channel
    val out = Multimodal.resizeBuffer(px, 2, 2, 1, 4, 4)
    assert(out.toSeq == Seq[Byte](1, 1, 2, 2, 1, 1, 2, 2, 3, 3, 4, 4, 3, 3, 4, 4))
  }

  test("resize dataset changes declared and actual shape") {
    val out = Multimodal.resize(Multimodal.decodeImages(media), 8, 8).head()
    assert(out.width == 8 && out.height == 8 && out.pixels.length == 8 * 8 * 3)
  }

  test("histogram16 is a distribution and content-sensitive") {
    val h = Multimodal.histogram16(Array.tabulate(256)(_.toByte))
    assert(math.abs(h.sum - 1.0f) < 1e-5)
    assert(h.forall(v => math.abs(v - 1 / 16f) < 1e-5)) // uniform bytes → uniform bins
    val skew = Multimodal.histogram16(Array.fill(100)(0x00.toByte))
    assert(skew(0) == 1.0f && skew.drop(1).forall(_ == 0f))
  }

  test("extractFeatures yields 16-d vectors for every record") {
    val f = Multimodal.extractFeatures(Multimodal.decodeImages(media)).collect()
    assert(f.length == 500)
    assert(f.forall(_.features.length == 16))
  }

  test("Md5Codec block expansion matches an independent md5 computation") {
    val meta = MediaMeta("image", 4, 4, 1, 1, "fake") // 16 bytes = one block
    val px = Md5Codec.decode("abc".getBytes("UTF-8"), meta)
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest("abc:0".getBytes("UTF-8"))
    assert(px.sameElements(expect))
    val meta2 = meta.copy(width = 5) // 20 bytes: block 0 + 4 bytes of block 1
    val px2 = Md5Codec.decode("abc".getBytes("UTF-8"), meta2)
    val b1 = java.security.MessageDigest.getInstance("MD5")
      .digest("abc:1".getBytes("UTF-8"))
    assert(px2.take(16).sameElements(expect) && px2.drop(16).sameElements(b1.take(4)))
  }

  test("ImageIoCodec decodes a real PNG through the distributed decode path") {
    import spark.implicits._
    val (w, h) = (8, 6)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (x * 30 << 16) | (y * 40 << 8) | (x + y))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val rec = MediaRecord(1L, baos.toByteArray, MediaMeta("image", w, h, 3, 1, "png"))
    val out = Multimodal.decodeImages(Seq(rec).toDS(), ImageIoCodec).collect()(0)
    assert(out.pixels.length == w * h * 3)
    // PNG is lossless: the decoded buffer is the painted gradient, exactly.
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      assert((out.pixels(i) & 0xff) == x * 30)
      assert((out.pixels(i + 1) & 0xff) == y * 40)
      assert((out.pixels(i + 2) & 0xff) == x + y)
    }
    // and its features flow through the same extractor as any other codec
    val f = Multimodal.extractFeatures(
      Multimodal.decodeImages(Seq(rec).toDS(), ImageIoCodec)).head()
    assert(f.features.length == 16 && math.abs(f.features.sum - 1.0f) < 1e-5)
  }

  test("pngFixture round-trips to exactly the fixturePixel buffer") {
    // The l6b gate's pinned oracle digests are only valid if PNG encode →
    // decode reproduces the integer-math pixels bit-for-bit on this JVM.
    for (id <- Seq(0L, 3L, 7L)) {
      val meta = MediaMeta("image", (id % 4 * 8 + 16).toInt,
        (id % 3 * 8 + 16).toInt, 3, 1, "png")
      val px = ImageIoCodec.decode(Multimodal.pngFixture(id), meta)
      assert(px.length == meta.width * meta.height * 3)
      for (y <- 0 until meta.height; x <- 0 until meta.width) {
        val (r, g, b) = Multimodal.fixturePixel(id, x, y)
        val i = (y * meta.width + x) * 3
        assert((px(i) & 0xff) == r && (px(i + 1) & 0xff) == g &&
          (px(i + 2) & 0xff) == b, s"mismatch at id=$id ($x,$y)")
      }
    }
  }

  test("ImageIoCodec rejects junk payloads and mismatched declared shape") {
    intercept[IllegalArgumentException] {
      ImageIoCodec.decode("not an image".getBytes, MediaMeta("image", 4, 4, 3, 1, "png"))
    }
    val img = new java.awt.image.BufferedImage(
      2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    intercept[IllegalArgumentException] {
      ImageIoCodec.decode(baos.toByteArray, MediaMeta("image", 4, 4, 3, 1, "png"))
    }
  }

  test("WavCodec round-trips the fixture PCM through a real RIFF container") {
    for (id <- 0L to 7L) {
      val (frames, ch) = Multimodal.wavShape(id)
      val decoded = WavCodec.decode(Multimodal.wavFixture(id),
        MediaMeta("audio", frames, 1, ch, frames, "wav"))
      assert(decoded.length == frames * ch * 2)
      // spot-check the little-endian int16 encoding of the recurrence
      for (i <- Seq(0, frames / 2, frames - 1); c <- 0 until ch) {
        val k = (i * ch + c) * 2
        val s = ((decoded(k + 1) << 8) | (decoded(k) & 0xff)).toShort
        assert(s == Multimodal.fixtureSample(id, i, c),
          s"id=$id frame=$i ch=$c")
      }
    }
  }

  test("WavCodec rejects junk payloads and mismatched declared channels") {
    intercept[Exception] {
      WavCodec.decode("not a wav".getBytes, MediaMeta("audio", 4, 1, 1, 4, "wav"))
    }
    intercept[IllegalArgumentException] {
      WavCodec.decode(Multimodal.wavFixture(1L), // stereo fixture
        MediaMeta("audio", 384, 1, 1, 384, "wav")) // declared mono
    }
  }

  test("sampleFrames keeps ceil(frameCount/n) frames of the right size") {
    import spark.implicits._
    val vid = Seq(MediaRecord(7L, "somepayload".getBytes,
      MediaMeta("video", 4, 4, 3, 10, "fake"))).toDS()
    val frames = Multimodal.sampleFrames(vid, 3).collect()
    assert(frames.length == 4) // frames 0,3,6,9
    assert(frames.forall(_.pixels.length == 4 * 4 * 3))
    assert(frames.map(_.media_id).toSeq.sorted == Seq(7000L, 7003L, 7006L, 7009L))
  }
}
