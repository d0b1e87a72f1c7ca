package graft

import java.awt.image.BufferedImage
import java.io.File
import java.nio.{ByteBuffer, ByteOrder}
import javax.imageio.{ImageIO, ImageWriteParam}

import graft.sources.GeoTiff
import org.scalatest.funsuite.AnyFunSuite

/** The TIFF 6.0 LZW codec (GeoTiff.lzwEncode/lzwDecode) — round-trip,
  * plus cross-validation BOTH directions against the JDK's independent
  * ImageIO TIFF plugin (a libtiff-convention implementation): my decoder
  * must read JDK-compressed strips, and the JDK reader must decode my
  * encoder's output. That pins the early code-width change and table
  * reset conventions to what GDAL/libtiff files actually use.
  */
class LzwSpec extends AnyFunSuite {

  // byte patterns: runs (compressible), then pseudo-random (fills the
  // code table past every width boundary and forces a Clear/reset)
  private def pattern(n: Int): Array[Byte] =
    Array.tabulate(n) { i =>
      if (i % 1000 < 200) (i / 37 % 7).toByte
      else ((i * 131 + (i * i) % 251) % 256).toByte
    }

  test("round trip: empty, tiny, runs, random, table-reset-sized") {
    val cases = Seq(
      Array.emptyByteArray,
      Array[Byte](7),
      Array[Byte](1, 1, 1, 1, 1, 1, 1, 1),
      "TOBEORNOTTOBEORTOBEORNOT".getBytes,
      pattern(300),
      pattern(40000), // > 4093 table entries -> encoder Clear/reset
      Array.tabulate(70000)(i => (i % 251).toByte))
    cases.foreach { c =>
      val enc = GeoTiff.lzwEncode(c)
      val dec = GeoTiff.lzwDecode(enc, c.length)
      assert(java.util.Arrays.equals(dec, c), s"round trip failed n=${c.length}")
    }
    // compressible data actually compresses
    assert(GeoTiff.lzwEncode(Array.fill[Byte](10000)(3)).length < 2000)
  }

  /** minimal IFD walk of an 8-bit gray TIFF (test-only; either order) */
  private def grayStrips(f: File): (Int, Int, Int, Int, Seq[Array[Byte]]) = {
    val all = java.nio.file.Files.readAllBytes(f.toPath)
    val order = if (all(0) == 'I') ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
    val bb = ByteBuffer.wrap(all).order(order)
    val ifd = bb.getInt(4)
    val n = bb.getShort(ifd) & 0xFFFF
    var w = 0; var h = 0; var rps = Int.MaxValue; var comp = 0; var pred = 1
    var soT = 0; var soN = 0; var soV = 0L
    var scT = 0; var scN = 0; var scV = 0L
    (0 until n).foreach { e =>
      val p = ifd + 2 + e * 12
      val tag = bb.getShort(p) & 0xFFFF
      val typ = bb.getShort(p + 2) & 0xFFFF
      val cnt = bb.getInt(p + 4)
      val v: Long = if (typ == 3) bb.getShort(p + 8) & 0xFFFFL
        else bb.getInt(p + 8) & 0xFFFFFFFFL
      tag match {
        case 256 => w = v.toInt
        case 257 => h = v.toInt
        case 259 => comp = v.toInt
        case 278 => rps = v.toInt
        case 317 => pred = v.toInt
        case 273 => soT = typ; soN = cnt; soV = v
        case 279 => scT = typ; scN = cnt; scV = v
        case _ =>
      }
    }
    def arr(t: Int, c: Int, v: Long): Seq[Long] =
      if (c == 1) Seq(v)
      else (0 until c).map(i => if (t == 3) bb.getShort(v.toInt + i * 2) & 0xFFFFL
        else bb.getInt(v.toInt + i * 4) & 0xFFFFFFFFL)
    val offs = arr(soT, soN, soV); val cnts = arr(scT, scN, scV)
    val strips = offs.zip(cnts).map { case (o, c) =>
      java.util.Arrays.copyOfRange(all, o.toInt, (o + c).toInt)
    }
    assert(pred == 1, s"JDK wrote predictor $pred; extend the spec")
    (w, h, math.min(rps, h), comp, strips)
  }

  test("my decoder reads JDK-ImageIO-compressed LZW strips") {
    val w = 257; val h = 173
    val px = pattern(w * h)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, w, h, px)
    val f = File.createTempFile("jdklzw", ".tif")
    val wr = ImageIO.getImageWritersByFormatName("tiff").next()
    val param = wr.getDefaultWriteParam
    param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionType("LZW")
    val ios = ImageIO.createImageOutputStream(f)
    wr.setOutput(ios)
    wr.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close(); wr.dispose()

    val (gw, gh, rps, comp, strips) = grayStrips(f)
    assert(gw == w && gh == h && comp == 5, s"w=$gw h=$gh comp=$comp")
    val decoded = strips.zipWithIndex.flatMap { case (s, i) =>
      val rows = math.min(rps, h - i * rps)
      GeoTiff.lzwDecode(s, rows * w)
    }.toArray
    assert(java.util.Arrays.equals(decoded, px),
      "JDK-compressed strips decode differently")
  }

  test("JDK ImageIO decodes my encoder's LZW stream") {
    val w = 311; val h = 149
    val px = pattern(w * h)
    val comp = GeoTiff.lzwEncode(px)
    // hand-rolled single-strip 8-bit gray LZW TIFF around my stream
    val ifdOff = 8 + comp.length
    val bb = ByteBuffer.allocate(ifdOff + 2 + 9 * 12 + 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifdOff)
    bb.put(comp)
    bb.putShort(9)
    def e(tag: Int, typ: Int, cnt: Int, v: Int): Unit = {
      bb.putShort(tag.toShort).putShort(typ.toShort).putInt(cnt)
      if (typ == 3) { bb.putShort(v.toShort); bb.putShort(0) } else bb.putInt(v)
    }
    e(256, 4, 1, w); e(257, 4, 1, h); e(258, 3, 1, 8); e(259, 3, 1, 5)
    e(262, 3, 1, 1); e(273, 4, 1, 8); e(277, 3, 1, 1); e(278, 4, 1, h)
    e(279, 4, 1, comp.length)
    bb.putInt(0)
    val f = File.createTempFile("mylzw", ".tif")
    java.nio.file.Files.write(f.toPath,
      java.util.Arrays.copyOf(bb.array(), bb.position()))
    val img = ImageIO.read(f)
    assert(img != null, "JDK reader rejected the file")
    assert(img.getWidth == w && img.getHeight == h)
    val got = new Array[Byte](w * h)
    img.getRaster.getDataElements(0, 0, w, h, got)
    assert(java.util.Arrays.equals(got, px),
      "JDK decoded my LZW stream differently")
  }
}
