package graft.multimodal

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** Fuzz of the real-codec multimodal path: random-dimension,
  * random-content PNG/BMP images must decode to their TRUE dimensions
  * through the mapPartitions batch plumbing; identical pixel content
  * must phash identically regardless of byte-level encoder run
  * differences; near-dup finds exactly the planted identical-content
  * groups and nothing across visually-opposite groups.
  */
class MultimodalFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def png(img: BufferedImage, fmt: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  private def randImage(rnd: scala.util.Random, w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, rnd.nextInt(0xFFFFFF))
    img
  }

  test("random-dimension png/bmp decode to true dims through the batch plumbing (30 images)") {
    val rnd = new scala.util.Random(20260814L)
    val rows = (0 until 30).map { i =>
      val (w, h) = (1 + rnd.nextInt(40), 1 + rnd.nextInt(40))
      val fmt = if (i % 2 == 0) "png" else "bmp"
      (i.toLong, png(randImage(rnd, w, h), fmt), fmt, w, h)
    }
    val media = Multimodal.asMedia(
      rows.map(r => (r._1, r._2)).toDF("id", "payload"), "id", "payload", "bin")
    val got = Multimodal.decodeMeta(media)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[String]("format"), r.getAs[Int]("width"), r.getAs[Int]("height")))).toMap
    for ((id, _, fmt, w, h) <- rows) {
      val (gf, gw, gh) = got(id)
      assert(gf == fmt && gw == w && gh == h, s"image $id: got ($gf,$gw,$gh) want ($fmt,$w,$h)")
    }
  }

  test("identical pixel content pairs under near-dup across encodings; opposite images never pair (8 seeds)") {
    for (seed <- 0 until 8) {
      val rnd = new scala.util.Random(seed * 9257 + 3)
      val w = 16 + rnd.nextInt(16); val h = 16 + rnd.nextInt(16)
      val a = randImage(rnd, w, h)
      // structurally opposite image: inverted pixels
      val b = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) b.setRGB(x, y, ~a.getRGB(x, y) & 0xFFFFFF)
      val rows = Seq(
        (1L, png(a, "png")), (2L, png(a, "png")), // twins
        (3L, png(b, "png")))
      val media = Multimodal.asMedia(rows.toDF("id", "payload"), "id", "payload", "bin")
      val pairs = Multimodal.imageNearDup(media, maxHamming = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((1L, 2L)), s"seed $seed: twins not paired")
      assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
        s"seed $seed: inverted image paired: $pairs")
    }
  }
}
