package graft.multimodal

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

/** Real JDK decode layer: ImageIO (PNG/BMP/GIF incl. frame counts) and
  * javax.sound (WAV PCM) round-trips, perceptual features/phash dedup,
  * real resize, and the hash fallback for undecodable payloads. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  private def png(w: Int, h: Int, seed: Int): Array[Byte] =
    encode(w, h, seed, "png")
  private def encode(w: Int, h: Int, seed: Int, fmt: String): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      var v = seed * 1000003L + x * 7919L + y * 104729L
      v = (v ^ (v >>> 30)) * 0xBF58476D1CE4E5B9L
      img.setRGB(x, y, ((v ^ (v >>> 27)) & 0xFFFFFF).toInt)
    }
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  private def wav(seconds: Double, hz: Double): Array[Byte] = {
    import javax.sound.sampled._
    val rate = 8000f
    val n = (seconds * rate).toInt
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s = (math.sin(2 * math.Pi * hz * i / rate) * 12000).toShort
      pcm(2 * i) = (s & 0xFF).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
    }
    val fmtA = new AudioFormat(rate, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmtA, n.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def mediaDf(rows: Seq[(Long, Array[Byte])]) = {
    import spark.implicits._
    Multimodal.asMedia(rows.toDF("id", "payload"), "id", "payload", "bin")
  }

  test("decodeMeta: true dimensions and formats for png/bmp/gif, wav pcm, fallback flagged") {
    val media = mediaDf(Seq(
      1L -> encode(20, 10, 1, "png"),
      2L -> encode(7, 5, 2, "bmp"),
      3L -> encode(9, 9, 3, "gif"),
      4L -> wav(0.25, 440),
      5L -> "not an image at all".getBytes("UTF-8")))
    val m = Multimodal.decodeMeta(media).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getBoolean(5)))).toMap
    assert(m(1L) == (("png", 20, 10, 1, true)))
    assert(m(2L)._1 == "bmp" && m(2L)._2 == 7 && m(2L)._3 == 5 && m(2L)._5)
    assert(m(3L)._1 == "gif" && m(3L)._2 == 9 && m(3L)._5)
    // wav: width = channels, height = sample rate, n_frames = 0.25s * 8000
    assert(m(4L) == (("pcm", 1, 8000, 2000, true)))
    assert(!m(5L)._5 && m(5L)._1 == "bin")
  }

  test("extractFeatures: real image features separate twin groups; wav RMS tracks amplitude") {
    // two identical pairs + one loner, as pngs
    val media = mediaDf(Seq(
      1L -> png(32, 24, 7), 2L -> png(32, 24, 7),
      3L -> png(32, 24, 8), 4L -> png(32, 24, 8),
      5L -> png(32, 24, 9)))
    val f = Multimodal.extractFeatures(media, dim = 16).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    assert(f(1L).sameElements(f(2L)))
    assert(f(3L).sameElements(f(4L)))
    assert(!f(1L).sameElements(f(3L)))
    assert(cos(f(1L), f(2L)) > cos(f(1L), f(5L)))
    // audio: louder sine -> proportionally larger RMS in every bin
    val loud = wav(0.5, 220)
    val a = Multimodal.extractFeatures(mediaDf(Seq(10L -> loud)), dim = 8)
      .collect().head.getSeq[Float](1)
    assert(a.forall(_ > 0.0f))
  }

  test("imagePhash + imageNearDup: exact twins pair up, distinct groups do not") {
    val media = mediaDf((0L until 20L).map(i => i -> png(32, 24, (i % 10).toInt)))
    val ph = Multimodal.imagePhash(media).collect()
    assert(ph.forall(_.getBoolean(2)), "all pngs must decode")
    val pairs = Multimodal.imageNearDup(media, maxHamming = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0L until 10L).map(i => (i, i + 10L)).toSet
    assert(pairs == expected, s"got $pairs")
  }

  test("resizeDecoded re-encodes to the target size; undecodable rows pass through") {
    val media = mediaDf(Seq(1L -> png(32, 24, 5),
      2L -> "plain bytes".getBytes("UTF-8")))
    val resized = Multimodal.resizeDecoded(media, 8, 6)
    val m = Multimodal.decodeMeta(resized).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3),
        r.getBoolean(5)))).toMap
    assert(m(1L) == (("png", 8, 6, true)))
    assert(!m(2L)._4) // still undecodable, passed through
    // the resized image is a real decodable PNG whose bytes differ
    val origBytes = media.filter(col("id") === 1).select("media").collect().head.getAs[Array[Byte]](0)
    val newBytes = resized.filter(col("id") === 1).select("media").collect().head.getAs[Array[Byte]](0)
    assert(!java.util.Arrays.equals(origBytes, newBytes))
  }

  test("synthesizeImages: deterministic, twins byte-identical across groupMod") {
    import spark.implicits._
    val ids = (0L until 12L).toDF("doc_id")
    val a = Multimodal.synthesizeImages(ids, "doc_id", groupMod = 6).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    for (i <- 0L until 6L)
      assert(java.util.Arrays.equals(a(i), a(i + 6L)), s"ids $i and ${i + 6}")
    assert(!java.util.Arrays.equals(a(0L), a(1L)))
    val meta = Multimodal.decodeMeta(
      Multimodal.synthesizeImages(ids, "doc_id", 6)).collect()
    assert(meta.forall(r => r.getBoolean(5) && r.getInt(2) == 32 && r.getInt(3) == 24))
  }
}
