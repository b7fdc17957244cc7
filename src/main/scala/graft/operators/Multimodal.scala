package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed metadata travelling with an opaque media payload. */
case class MediaMeta(
    kind: String,      // "image" | "audio" | "video"
    width: Int,
    height: Int,
    channels: Int,
    frameCount: Int,
    format: String)

/** One record of the raw media table: id + opaque bytes + typed meta. */
case class MediaRecord(media_id: Long, payload: Array[Byte], meta: MediaMeta)

/** A decoded image: fixed-shape pixel buffer (h × w × channels bytes). */
case class DecodedImage(media_id: Long, width: Int, height: Int,
    channels: Int, pixels: Array[Byte])

/** Per-media feature vector (e.g. for the similarity ops downstream). */
case class MediaFeatures(media_id: Long, features: Array[Float])

/** The codec seam: payload bytes + declared metadata → decoded pixel
  * buffer of `height·width·channels` bytes. Implementations must be
  * Serializable (they ship to executors inside the decode closure).
  */
trait MediaCodec extends Serializable {
  def decode(payload: Array[Byte], meta: MediaMeta): Array[Byte]
}

/** Deterministic md5-expansion codec — the ORACLE-REPRODUCIBLE stand-in
  * for formats this container has no native library for (audio/video).
  * Pixel block `i` is the digest of `payload ++ ":" ++ i`, so output is
  * reproducible, shape-correct, content-dependent AND replayable in plain
  * SQL (the l6 gate's DuckDB oracle recomputes the same md5 blocks) —
  * the same trick that made the MinHash and sign-LSH gates hash-exact.
  */
object Md5Codec extends MediaCodec {
  def decode(payload: Array[Byte], meta: MediaMeta): Array[Byte] = {
    val n = meta.width * meta.height * meta.channels
    val out = new Array[Byte](n)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    var block = 0
    while (i < n) {
      md.reset()
      md.update(payload)
      md.update((":" + block).getBytes("UTF-8"))
      val d = md.digest()
      var j = 0
      while (j < 16 && i < n) { out(i) = d(j); j += 1; i += 1 }
      block += 1
    }
    out
  }
}

/** REAL image decode via the JDK's `javax.imageio` (PNG/BMP/GIF/JPEG —
  * no external dependency). Emits row-major RGB triples; declared
  * metadata is validated against the actual decoded dimensions so bad
  * catalog entries fail loudly instead of mis-shaping buffers.
  */
object ImageIoCodec extends MediaCodec {
  def decode(payload: Array[Byte], meta: MediaMeta): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, s"payload for ${meta.format} is not a decodable image")
    require(img.getWidth == meta.width && img.getHeight == meta.height,
      s"decoded ${img.getWidth}x${img.getHeight} != declared ${meta.width}x${meta.height}")
    val out = new Array[Byte](meta.width * meta.height * 3)
    var y = 0
    var i = 0
    while (y < meta.height) {
      var x = 0
      while (x < meta.width) {
        val rgb = img.getRGB(x, y)
        out(i) = ((rgb >> 16) & 0xff).toByte
        out(i + 1) = ((rgb >> 8) & 0xff).toByte
        out(i + 2) = (rgb & 0xff).toByte
        i += 3
        x += 1
      }
      y += 1
    }
    out
  }
}

/** REAL audio decode via the JDK's `javax.sound.sampled` (WAV/RIFF —
  * no external dependency). Parses the container, strips the header and
  * returns the raw PCM frame bytes; declared metadata (channel count,
  * frame count, 16-bit depth) is validated against the actual decoded
  * format so bad catalog entries fail loudly instead of mis-shaping
  * buffers — the audio twin of [[ImageIoCodec]].
  */
object WavCodec extends MediaCodec {
  def decode(payload: Array[Byte], meta: MediaMeta): Array[Byte] = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val fmt = in.getFormat
      require(fmt.getChannels == meta.channels,
        s"decoded ${fmt.getChannels}ch != declared ${meta.channels}ch")
      require(fmt.getSampleSizeInBits == 16,
        s"expected 16-bit PCM, got ${fmt.getSampleSizeInBits}")
      val pcm = in.readAllBytes()
      require(pcm.length == meta.frameCount * meta.channels * 2,
        s"decoded ${pcm.length} bytes != declared " +
          s"${meta.frameCount}×${meta.channels}×2")
      pcm
    } finally in.close()
  }
}

/** Multimodal column handling (SURVEY.md §2.7 L6 + builder mandate):
  * image/audio/video as opaque `binary` columns with typed metadata.
  *
  * The Spark-side plumbing is REAL and tested — schema (binary + struct
  * metadata), partition-parallel batched decode via
  * `Dataset.mapPartitions` (the Scala-native equivalent of mapInPandas:
  * one iterator per partition, amortized per-batch setup), resize /
  * feature-extraction / frame-sampling math that operates on any pixel
  * buffer. The codec is pluggable ([[MediaCodec]]): [[ImageIoCodec]] is a
  * real JDK image decoder (spec-tested against generated PNGs);
  * [[Md5Codec]] is the deterministic oracle-reproducible stand-in used by
  * the l6 gate and for formats with no in-container library.
  *
  * Scale design: decode is embarrassingly parallel — co-partition by
  * media_id, never collect payloads; features (small) flow to joins/ANN,
  * pixels stay inside the partition unless explicitly materialized.
  */
object Multimodal {

  /** Default codec for fixture/gate paths (see [[Md5Codec]]). */
  private[operators] def decodePayload(payload: Array[Byte], meta: MediaMeta): Array[Byte] =
    Md5Codec.decode(payload, meta)

  /** Build a media table from the documents corpus: payload = utf-8 text
    * bytes (a stand-in for real files), metadata derived from doc_id so
    * shapes vary deterministically.
    */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        col("text").cast("binary").as("payload"),
        struct(
          lit("image").as("kind"),
          (col("doc_id") % 4 * 8 + 16).cast("int").as("width"),
          (col("doc_id") % 3 * 8 + 16).cast("int").as("height"),
          lit(3).as("channels"),
          lit(1).as("frameCount"),
          lit("fake").as("format")).as("meta"))
      .as[MediaRecord]
  }

  /** Deterministic RGB value of pixel (x, y) for fixture id — pure
    * integer math so an external oracle can recompute the decoded buffer
    * without any image library. Kept package-visible for the spec.
    */
  private[operators] def fixturePixel(id: Long, x: Int, y: Int): (Int, Int, Int) = (
    ((id * 31 + x * 7 + y * 13) % 256).toInt,
    ((id * 17 + x * 11 + y * 3) % 256).toInt,
    ((id * 5 + x * 13 + y * 29) % 256).toInt)

  /** Encode the deterministic fixture image for `id` as real PNG bytes
    * via the JDK encoder. Shapes follow [[mediaFromDocuments]]'s id→dims
    * rule. PNG is lossless, so `ImageIoCodec.decode` returns exactly the
    * generated RGB triples — which is what makes a constant-pinned oracle
    * over the decoded pixels valid on any host.
    */
  private[operators] def pngFixture(id: Long): Array[Byte] = {
    val w = (id % 4 * 8 + 16).toInt
    val h = (id % 3 * 8 + 16).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = fixturePixel(id, x, y)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** A media table of REAL PNG payloads — encoded on the executors, one
    * per doc_id below `limit` — for driving [[ImageIoCodec]] through the
    * full distributed decode path with an externally checkable result.
    */
  def syntheticPngMedia(spark: SparkSession, docs: DataFrame,
      limit: Int = 8): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id")).filter(col("doc_id") < limit).distinct()
      .as[Long]
      .map { id =>
        MediaRecord(id, pngFixture(id),
          MediaMeta("image", (id % 4 * 8 + 16).toInt, (id % 3 * 8 + 16).toInt,
            3, 1, "png"))
      }
  }

  /** Partition-parallel batched decode (mapPartitions = one setup per
    * partition, streaming through records — the batch shape a real codec
    * wants). Pass [[ImageIoCodec]] for real image payloads.
    */
  def decodeImages(media: Dataset[MediaRecord],
      codec: MediaCodec = Md5Codec): Dataset[DecodedImage] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition setup for a heavier codec would go here (open
      // context, pin buffers); these codecs need none.
      it.map { r =>
        DecodedImage(r.media_id, r.meta.width, r.meta.height, r.meta.channels,
          codec.decode(r.payload, r.meta))
      }
    }
  }

  /** Audio rides the same partition-parallel decode seam; the decoded
    * buffer is the raw PCM frames (width = frames, height = 1).
    */
  def decodeAudio(media: Dataset[MediaRecord],
      codec: MediaCodec = WavCodec): Dataset[DecodedImage] =
    decodeImages(media, codec)

  /** Nearest-neighbour resize — real pixel math, codec-independent. */
  private[operators] def resizeBuffer(
      px: Array[Byte], w: Int, h: Int, c: Int, w2: Int, h2: Int): Array[Byte] = {
    val out = new Array[Byte](w2 * h2 * c)
    var y = 0
    while (y < h2) {
      val sy = math.min(h - 1, y * h / h2)
      var x = 0
      while (x < w2) {
        val sx = math.min(w - 1, x * w / w2)
        var ch = 0
        while (ch < c) {
          out((y * w2 + x) * c + ch) = px((sy * w + sx) * c + ch)
          ch += 1
        }
        x += 1
      }
      y += 1
    }
    out
  }

  def resize(decoded: Dataset[DecodedImage], w2: Int, h2: Int): Dataset[DecodedImage] = {
    import decoded.sparkSession.implicits._
    decoded.map(d => DecodedImage(d.media_id, w2, h2, d.channels,
      resizeBuffer(d.pixels, d.width, d.height, d.channels, w2, h2)))
  }

  /** 16-bin normalized byte histogram — a real, deterministic feature
    * extractor over any pixel buffer.
    */
  private[operators] def histogram16(px: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](16)
    var i = 0
    while (i < px.length) { bins((px(i) & 0xff) >>> 4) += 1f; i += 1 }
    if (px.length > 0) { var b = 0; while (b < 16) { bins(b) /= px.length; b += 1 } }
    bins
  }

  def extractFeatures(decoded: Dataset[DecodedImage]): Dataset[MediaFeatures] = {
    import decoded.sparkSession.implicits._
    decoded.mapPartitions(_.map(d => MediaFeatures(d.media_id, histogram16(d.pixels))))
  }

  /** Deterministic signed 16-bit PCM sample for fixture id at frame `i`,
    * channel `ch` — pure integer math so an external oracle can
    * recompute the decoded buffer without any audio library (the audio
    * twin of [[fixturePixel]]).
    */
  private[operators] def fixtureSample(id: Long, i: Int, ch: Int): Short =
    (((id * 37 + i.toLong * 17 + ch.toLong * 101) % 65536) - 32768).toShort

  /** Audio fixture shapes by id: (frames, channels). */
  private[operators] def wavShape(id: Long): (Int, Int) =
    ((id % 5 * 128 + 256).toInt, (id % 2 + 1).toInt)

  /** Encode the deterministic fixture samples for `id` as real RIFF/WAV
    * bytes via the JDK encoder (16-bit little-endian PCM, 8 kHz). WAV is
    * lossless, so [[WavCodec.decode]] returns exactly the generated PCM
    * frames — which is what makes a constant-pinned oracle over the
    * decoded bytes valid on any host (the l6e twin of [[pngFixture]]).
    */
  private[operators] def wavFixture(id: Long): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val (frames, ch) = wavShape(id)
    val pcm = new Array[Byte](frames * ch * 2)
    var i = 0
    while (i < frames) {
      var c = 0
      while (c < ch) {
        val s = fixtureSample(id, i, c)
        val k = (i * ch + c) * 2
        pcm(k) = (s & 0xff).toByte
        pcm(k + 1) = ((s >> 8) & 0xff).toByte
        c += 1
      }
      i += 1
    }
    val fmt = new AudioFormat(8000f, 16, ch, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** A media table of REAL WAV payloads — encoded on the executors, one
    * per doc_id below `limit` — for driving [[WavCodec]] through the
    * full distributed decode path with an externally checkable result.
    */
  def syntheticWavMedia(spark: SparkSession, docs: DataFrame,
      limit: Int = 8): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id")).filter(col("doc_id") < limit).distinct()
      .as[Long]
      .map { id =>
        val (frames, ch) = wavShape(id)
        MediaRecord(id, wavFixture(id),
          MediaMeta("audio", frames, 1, ch, frames, "wav"))
      }
  }

  /** A "video" media table over documents: fixed 8×6×3 frames, frameCount
    * varying 2–6 by id — small shapes so the frame-sample gate's SQL
    * oracle can replay every byte.
    */
  def videoFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        col("text").cast("binary").as("payload"),
        struct(
          lit("video").as("kind"),
          lit(8).as("width"),
          lit(6).as("height"),
          lit(3).as("channels"),
          (col("doc_id") % 5 + 2).cast("int").as("frameCount"),
          lit("fake").as("format")).as("meta"))
      .as[MediaRecord]
  }

  /** Order-dependent polynomial fingerprint of a pixel buffer —
    * (a·31 + byte) mod 1e9+7, the l4_fingerprint recurrence — exact
    * integer math, replayable in SQL via list_reduce.
    */
  private[graft] def polyFingerprint(bytes: Array[Byte]): Long = {
    var a = 0L
    var i = 0
    while (i < bytes.length) { a = (a * 31 + (bytes(i) & 0xff)) % 1000000007L; i += 1 }
    a
  }

  /** Frame sampling for "video" payloads: treat the decoded buffer as
    * frameCount frames of w×h×c and keep every nth — real chunking logic.
    */
  def sampleFrames(media: Dataset[MediaRecord], everyNth: Int): Dataset[DecodedImage] = {
    import media.sparkSession.implicits._
    require(everyNth >= 1)
    media.flatMap { r =>
      val frameBytes = r.meta.width * r.meta.height * r.meta.channels
      val all = decodePayload(r.payload,
        r.meta.copy(width = r.meta.width * r.meta.frameCount))
      (0 until r.meta.frameCount by everyNth).map { f =>
        DecodedImage(r.media_id * 1000 + f, r.meta.width, r.meta.height,
          r.meta.channels,
          java.util.Arrays.copyOfRange(all, f * frameBytes, (f + 1) * frameBytes))
      }
    }
  }
}
