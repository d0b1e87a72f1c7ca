package graft

import graft.functions.ImageCodec
import java.awt.image.BufferedImage
import org.scalatest.funsuite.AnyFunSuite

/** r14: `argbOf` (bulk raster access) replaced per-pixel getRGB in
  * phash64 / features / lumBytes. It must reproduce getRGB bit-for-bit
  * on every layout the pipeline produces: synthetic TYPE_INT_RGB,
  * ImageIO-decoded TYPE_3BYTE_BGR (PNG and JPEG), plus the fallback path
  * for anything else (ARGB, nonzero-translate subimages).
  */
class PixelAccessSpec extends AnyFunSuite {

  private def ref(img: BufferedImage): Array[Int] = {
    val w = img.getWidth; val h = img.getHeight
    val out = new Array[Int](w * h)
    for (y <- 0 until h; x <- 0 until w) out(y * w + x) = img.getRGB(x, y)
    out
  }

  test("TYPE_INT_RGB synthetic images") {
    for (id <- Seq(0L, 7L, 767L);
         wh <- Seq((32, 32), (48, 32), (64, 32), (33, 17))) {
      val img = ImageCodec.syntheticImage(id, wh._1, wh._2)
      assert(ImageCodec.argbOf(img).sameElements(ref(img)),
        s"INT_RGB mismatch id=$id size=$wh")
    }
  }

  test("TYPE_3BYTE_BGR decoded PNG and JPEG") {
    for (id <- Seq(1L, 99L)) {
      val img0 = ImageCodec.syntheticImage(id, 48, 32)
      val png = ImageCodec.decode(ImageCodec.toPng(img0))
      assert(ImageCodec.argbOf(png).sameElements(ref(png)), s"png id=$id")
      val jpg = ImageCodec.decode(ImageCodec.toJpeg(img0))
      assert(ImageCodec.argbOf(jpg).sameElements(ref(jpg)), s"jpeg id=$id")
    }
  }

  test("fallback: TYPE_INT_ARGB goes through bulk getRGB") {
    val img = new BufferedImage(20, 10, BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until 10; x <- 0 until 20)
      img.setRGB(x, y, (x * 31 + y * 77) | 0xCC000000)
    assert(ImageCodec.argbOf(img).sameElements(ref(img)))
  }

  test("fallback: nonzero-translate subimage") {
    val sub = ImageCodec.syntheticImage(5L, 64, 32).getSubimage(8, 4, 40, 20)
    assert(ImageCodec.argbOf(sub).sameElements(ref(sub)))
  }
}
