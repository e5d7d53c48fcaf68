package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque `binary` columns + typed metadata, with decode/feature/resize/
  * frame-sample stages as `mapPartitions` stages over batched rows.
  *
  * The decode step is REAL for every format the JDK itself can read —
  * ImageIO (PNG, JPEG, BMP, GIF incl. frame counts, TIFF, WBMP) and
  * javax.sound.sampled (WAV/AIFF/AU PCM) — inside mapPartitions, the
  * batch shape that amortizes codec init per partition. Payloads no
  * JDK codec can read (MP4, MP3, WebP, raw text...) fall back to the
  * deterministic hash-derived pseudo-decode, so pipelines over
  * arbitrary binary stay total and testable; swap in a JNI/JavaCV
  * decoder for those formats without touching callers.
  *
  * Image features are the classic perceptual embedding: bilinear
  * downscale to a g×g luminance grid (g = ⌈√dim⌉), giving near-dup
  * detection for free ([[imagePhash]] thresholds the 8×8 grid at its
  * mean — aHash — and [[imageNearDup]] banding-joins the 64-bit hashes
  * the same pigeonhole way SimHash text dedup does). Audio features
  * are a dim-bin RMS envelope over the decoded PCM samples.
  *
  * Schema convention: (id long, media binary, meta struct<format string,
  * width int, height int, n_frames int>).
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("media", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType))))))

  /** Wrap a (id, payload) relation as a media relation with fake
    * metadata derived deterministically from the payload bytes. */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String, format: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("id"),
      col(payloadCol).cast("binary").as("media"),
      struct(
        lit(format).as("format"),
        (pmod(xxhash64(col(payloadCol)), lit(1024L)) + 64).cast("int").as("width"),
        (pmod(xxhash64(col(payloadCol), lit(1)), lit(768L)) + 64).cast("int").as("height"),
        (pmod(xxhash64(col(payloadCol), lit(2)), lit(240L)) + 1).cast("int").as("n_frames")).as("meta"))

  // ——————————————————— real JDK decode layer ———————————————————

  /** ImageIO decode: (image, frameCount, formatName). None when no JDK
    * reader claims the bytes. */
  private def readImage(bytes: Array[Byte])
      : Option[(java.awt.image.BufferedImage, Int, String)] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          r.setInput(iis)
          val fmt = r.getFormatName.toLowerCase
          val img = r.read(0)
          val n = try math.max(r.getNumImages(true), 1)
                  catch { case _: Throwable => 1 }
          r.dispose()
          Option(img).map(i => (i, n, fmt))
        }
      } finally iis.close()
    } catch { case _: Throwable => None }

  /** javax.sound decode to 16-bit PCM: (channels, frameCount,
    * frameRate, samples as Float in [-1,1], mixed to mono). */
  private def readAudio(bytes: Array[Byte])
      : Option[(Int, Long, Float, Array[Float])] =
    try {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      val in = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val src = in.getFormat
        val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          src.getSampleRate, 16, src.getChannels,
          src.getChannels * 2, src.getSampleRate, false)
        val pcm = AudioSystem.getAudioInputStream(target, in)
        try {
          val raw = pcm.readAllBytes()
          val ch = target.getChannels
          val nFrames = raw.length / (2 * ch)
          val mono = new Array[Float](nFrames)
          var f = 0
          while (f < nFrames) {
            var acc = 0.0f
            var c = 0
            while (c < ch) {
              val o = (f * ch + c) * 2
              val s = ((raw(o + 1) << 8) | (raw(o) & 0xFF)).toShort
              acc += s / 32768.0f
              c += 1
            }
            mono(f) = acc / ch
            f += 1
          }
          Some((ch, in.getFrameLength, src.getFrameRate, mono))
        } finally pcm.close()
      } finally in.close()
    } catch { case _: Throwable => None }

  /** Bilinear downscale to a g×g luminance grid in [0,1]. */
  private def grayGrid(img: java.awt.image.BufferedImage, g: Int): Array[Float] = {
    import java.awt.RenderingHints
    val scaled = new java.awt.image.BufferedImage(
      g, g, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val gr = scaled.createGraphics()
    gr.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
      RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    gr.drawImage(img, 0, 0, g, g, null)
    gr.dispose()
    val raster = scaled.getRaster
    val out = new Array[Float](g * g)
    var i = 0
    while (i < g * g) {
      out(i) = raster.getSample(i % g, i / g, 0) / 255.0f
      i += 1
    }
    out
  }

  /** dim-length perceptual image feature: ⌈√dim⌉-grid luminance,
    * truncated to dim. */
  private def imageFeature(img: java.awt.image.BufferedImage, dim: Int): Array[Float] = {
    val g = math.ceil(math.sqrt(dim.toDouble)).toInt
    grayGrid(img, g).take(dim)
  }

  /** dim-bin RMS envelope of mono samples. */
  private def audioFeature(samples: Array[Float], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (samples.isEmpty) return out
    val per = math.max(samples.length / dim, 1)
    var b = 0
    while (b < dim) {
      val from = b * per
      val to = math.min(from + per, samples.length)
      var acc = 0.0
      var i = from
      while (i < to) { acc += samples(i).toDouble * samples(i); i += 1 }
      out(b) = if (to > from) math.sqrt(acc / (to - from)).toFloat else 0.0f
      b += 1
    }
    out
  }

  /** Deterministic pseudo-decode for payloads no JDK codec reads (the
    * swap-in point for JNI/JavaCV decoders of MP4/MP3/WebP...). One
    * pass, no driver collection, partition-preserving. */
  private def fakeFeature(media: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < media.length) { h = h ^ ((h << 5) + (h >>> 2) + media(i)); i += 1 }
    var j = 0
    while (j < dim) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(j) = ((h >>> 33).toInt % 1000) / 1000.0f
      j += 1
    }
    out
  }

  /** Decode + feature-extract: (id, embedding array<float>, n_bytes).
    * mapPartitions so decoder init amortizes per partition (the
    * standard batch shape for expensive per-row codec calls). Images →
    * perceptual luminance grid; audio → RMS envelope; anything the JDK
    * can't decode → the deterministic hash fallback (pipelines over
    * mixed/opaque binary stay total). */
  def extractFeatures(media: DataFrame, dim: Int = 64): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("n_bytes", LongType)))
    val enc = RowEncoder.encoderFor(schema)
    media.select("id", "media").mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val feat = readImage(bytes).map { case (img, _, _) => imageFeature(img, dim) }
          .orElse(readAudio(bytes).map { case (_, _, _, mono) => audioFeature(mono, dim) })
          .getOrElse(fakeFeature(bytes, dim))
        Row(r.getLong(0), feat.toSeq, bytes.length.toLong)
      }
    }(enc).toDF()
  }

  /** REAL metadata from the bytes: (id, format, width, height,
    * n_frames, decoded). Images report pixel dimensions and (for GIF)
    * true frame counts; audio maps width = channels, height =
    * sample rate (Hz), n_frames = PCM frame count. Undecodable rows
    * return the declared meta with decoded = false. */
  def decodeMeta(media: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("decoded", BooleanType)))
    val enc = RowEncoder.encoderFor(schema)
    media.select(col("id"), col("media"), col("meta")).mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        readImage(bytes) match {
          case Some((img, n, fmt)) =>
            Row(r.getLong(0), fmt, img.getWidth, img.getHeight, n, true)
          case None => readAudio(bytes) match {
            case Some((ch, frames, rate, _)) =>
              Row(r.getLong(0), "pcm", ch, rate.toInt,
                math.min(frames, Int.MaxValue).toInt, true)
            case None =>
              val m = r.getStruct(2)
              Row(r.getLong(0), m.getString(0), m.getInt(1), m.getInt(2),
                m.getInt(3), false)
          }
        }
      }
    }(enc).toDF()
  }

  /** 64-bit perceptual image hash (aHash): 8×8 luminance grid
    * thresholded at its own mean. (id, phash, decoded) — undecodable
    * payloads hash their bytes instead, flagged false. */
  def imagePhash(media: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("phash", LongType),
      StructField("decoded", BooleanType)))
    val enc = RowEncoder.encoderFor(schema)
    media.select("id", "media").mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        readImage(bytes) match {
          case Some((img, _, _)) =>
            val g = grayGrid(img, 8)
            val mean = g.sum / 64.0f
            var h = 0L
            var i = 0
            while (i < 64) { if (g(i) >= mean) h |= (1L << i); i += 1 }
            Row(r.getLong(0), h, true)
          case None =>
            var h = 1125899906842597L
            var i = 0
            while (i < bytes.length) {
              h = h ^ ((h << 5) + (h >>> 2) + bytes(i)); i += 1
            }
            Row(r.getLong(0), h, false)
        }
      }
    }(enc).toDF()
  }

  /** Perceptual image near-dups: phash pairs within `maxHamming` bits.
    * Same pigeonhole banding as SimHash text dedup — four 16-bit
    * blocks, hamming ≤ 3 ⇒ at least one block equal — so candidates
    * come from an equi-join, verified by exact bit_count(xor). */
  def imageNearDup(media: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-block banding is sound only for hamming <= 3")
    val fp = imagePhash(media).select(col("id"), col("phash"))
    val banded = fp.select(col("id"), col("phash"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("block"),
          shiftright(col("phash"), b * 16).bitwiseAND(lit(0xFFFFL)).as("key"))
      }: _*)).as("bk"))
      .select(col("id"), col("phash"), col("bk.block"), col("bk.key"))
    banded.select(col("id").as("id_a"), col("phash").as("ph_a"), col("block"), col("key"))
      .join(banded.select(col("id").as("id_b"), col("phash").as("ph_b"),
        col("block"), col("key")), Seq("block", "key"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("ph_a").bitwiseXOR(col("ph_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** REAL resize: decode, bilinear-scale to w×h, re-encode as PNG.
    * Undecodable rows pass through with only the declared meta
    * rewritten (the previous metadata-only behavior). */
  def resizeDecoded(media: DataFrame, w: Int, h: Int): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    media.select("id", "media", "meta").mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        readImage(bytes) match {
          case Some((img, _, _)) =>
            import java.awt.RenderingHints
            val scaled = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val gr = scaled.createGraphics()
            gr.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
              RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            gr.drawImage(img, 0, 0, w, h, null)
            gr.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(scaled, "png", bos)
            Row(r.getLong(0), bos.toByteArray, Row("png", w, h, 1))
          case None =>
            val m = r.getStruct(2)
            Row(r.getLong(0), bytes, Row(m.getString(0), w, h, m.getInt(3)))
        }
      }
    }(enc).toDF()
  }

  /** Deterministic synthetic PNGs (test/driver-gate aid): renders a
    * 32×24 RGB pattern keyed by `id % groupMod`, so ids congruent mod
    * groupMod produce byte-identical images — planted twins for the
    * perceptual-dedup path. Pure JDK encode, one pass, no driver
    * collection. */
  def synthesizeImages(df: DataFrame, idCol: String, groupMod: Int = 30): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    df.select(col(idCol).cast("long").as("id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val seed = (id % groupMod).toInt
        val img = new java.awt.image.BufferedImage(
          32, 24, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < 24) {
          var x = 0
          while (x < 32) {
            // per-(group, x, y) hash noise: groups are mutually
            // uncorrelated images (a per-group OFFSET on one gradient
            // would alias to one shared perceptual hash)
            var v = seed * 1000003L + x * 7919L + y * 104729L
            v = (v ^ (v >>> 30)) * 0xBF58476D1CE4E5B9L
            v = (v ^ (v >>> 27)) * 0x94D049BB133111EBL
            img.setRGB(x, y, ((v ^ (v >>> 31)) & 0xFFFFFF).toInt)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        Row(id, bos.toByteArray, Row("png", 32, 24, 1))
      }
    }(enc).toDF()
  }

  /** Resize stage stub: metadata-only transform (a real implementation
    * rewrites `media`; the plumbing — column pass-through, struct
    * rewrite — is what scales). */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("meta",
      struct(col("meta.format"), lit(w).as("width"), lit(h).as("height"), col("meta.n_frames")))

  /** Frame sampling for video-ish media: emit every `stride`-th frame
    * index up to n_frames as (id, frame_idx) — the explode shape that a
    * real frame decoder feeds. */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media.select(col("id"),
      explode(sequence(lit(0), col("meta.n_frames") - 1, lit(stride))).as("frame_idx"))
}
