package graft.multimodal

import java.awt.image.BufferedImage

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.multimodal.Multimodal._

/** The REAL javax.imageio codec against fixtures with known ground truth:
  * the fixture generator computes width/height/mean/histogram in plain
  * Scala, the Spark-side operator must reproduce them from decoded pixels.
  */
class JdkImageCodecSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("grayscale PNG roundtrips pixels exactly") {
    val pixels = Array.tabulate(32 * 8)(i => i % 256)
    val png = JdkImageCodec.grayPng(pixels, 32, 8)
    // PNG magic
    assert((png(0) & 0xff) === 0x89 && png(1) === 'P'.toByte)
    assert(JdkImageCodec.decode(png, 32, 8) === pixels)
  }

  test("RGB image decodes through integer Rec.601 luma") {
    val img = new BufferedImage(3, 1, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000) // pure red
    img.setRGB(1, 0, 0x00ff00) // pure green
    img.setRGB(2, 0, 0x0000ff) // pure blue
    val png = JdkImageCodec.encodePng(img)
    val luma = JdkImageCodec.decode(png, 3, 1)
    assert(luma === Array(299 * 255 / 1000, 587 * 255 / 1000, 114 * 255 / 1000))
  }

  test("extractFeatures over real decoded pixels matches fixture ground truth") {
    import spark.implicits._
    // fixture: per-record pixel arrays with hand-computable stats
    val fixtures = Seq(
      (1L, Array(0, 32, 64, 96)),       // mean 48, buckets 0,1,2,3
      (2L, Array(255, 255, 255, 255)),  // mean 255, bucket 7 ×4
      (3L, Array(10, 20, 30, 200)))     // mean 65, bucket0 ×3 bucket6 ×1
    val media = fixtures.map { case (id, px) =>
      MediaRecord(id, JdkImageCodec.grayPng(px, px.length, 1), "png",
        px.length, 1)
    }.toDS()
    val feats = extractFeatures(media, JdkImageCodec)
      .collect().sortBy(_.media_id)
    assert(feats.map(_.mean_intensity).toSeq === Seq(48.0, 255.0, 65.0))
    assert(feats(0).histogram.toSeq === Seq(1L, 1L, 1L, 1L, 0L, 0L, 0L, 0L))
    assert(feats(1).histogram.toSeq === Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 4L))
    assert(feats(2).histogram.toSeq === Seq(3L, 0L, 0L, 0L, 0L, 0L, 1L, 0L))
    // n_bytes is the ENCODED payload size, not the pixel count
    assert(feats.forall(f => f.n_bytes > 0))
  }

  test("pngMediaTable: real PNGs whose decode is exactly the text bytes") {
    import spark.implicits._
    val df = Seq((0L, "abc"), (1L, "Hello, world!"), (2L, ""))
      .toDF("doc_id", "text")
    val media = pngMediaTable(spark, df, "doc_id", "text")
      .collect().sortBy(_.media_id)
    assert(media(0).width === 3 && media(0).height === 1)
    assert(JdkImageCodec.decode(media(0).payload, 3, 1)
      === "abc".getBytes("UTF-8").map(_ & 0xff))
    assert(JdkImageCodec.decode(media(1).payload, 13, 1)
      === "Hello, world!".getBytes("UTF-8").map(_ & 0xff))
    // empty text → empty payload, decode stays empty instead of throwing
    assert(media(2).payload.isEmpty)
    assert(JdkImageCodec.decode(media(2).payload, 0, 0).isEmpty)
  }

  test("bilinear resize through the real codec preserves constant images") {
    import spark.implicits._
    val px = Array.fill(8 * 8)(200)
    val media = Seq(
      MediaRecord(1L, JdkImageCodec.grayPng(px, 8, 8), "png", 8, 8)).toDS()
    val out = resizeAll(media, 4, 2, JdkImageCodec).collect().head
    assert(out.width === 4 && out.height === 2)
    // bilinear interpolation of a constant field is the same constant
    assert(JdkImageCodec.decode(out.payload, 4, 2) === Array.fill(4 * 2)(200))
  }

  test("undecodable payload raises instead of silently passing garbage") {
    val junk = Array.fill[Byte](16)(42)
    intercept[IllegalArgumentException] {
      JdkImageCodec.decode(junk, 4, 4)
    }
  }
}
