package graft

import graft.functions.ImageCodec

/** The JPEG camera-frame path (r12): real in-JDK baseline JPEG encode at
  * pinned quality, magic-byte format dispatch, the marker-segment
  * container walk (mm_jpeg_meta), pHash stability across the lossy
  * re-encode (mm_jpeg_robustness), and shot segmentation over decoded
  * frames (mm_jpeg_scenes).
  */
class JpegOpsSpec extends SparkSpecBase {

  private def img(id: Long) =
    ImageCodec.syntheticImage(id, 32 + (id % 3).toInt * 16, 32)

  test("jpegMeta walks a real encoder output exactly") {
    val jpg = ImageCodec.toJpeg(img(7))
    val i = ImageCodec.jpegMeta(jpg)
    assert(i.markerOk, "walk must consume every byte and end at EOI")
    assert(i.width == 48 && i.height == 32)
    assert(i.precision == 8 && i.nComponents == 3)
    assert(i.hasJfif, "JDK writer emits an APP0/JFIF segment")
    assert(i.nSegments >= 7, "SOI, APP0, DQTs, SOF0, DHTs, SOS, EOI")
    assert(i.entropyBytes > 0 && i.entropyBytes < jpg.length)
  }

  test("jpegMeta rejects truncation and corruption with markerOk=false") {
    val jpg = ImageCodec.toJpeg(img(3))
    assert(!ImageCodec.jpegMeta(jpg.dropRight(1)).markerOk, "truncated")
    assert(!ImageCodec.jpegMeta(jpg.take(2)).markerOk, "SOI only")
    val corrupt = jpg.clone(); corrupt(2) = 0x00 // APP0's FF prefix gone
    assert(!ImageCodec.jpegMeta(corrupt).markerOk, "corrupted marker")
    assert(!ImageCodec.jpegMeta(Array[Byte](1, 2, 3)).markerOk, "not a JPEG")
  }

  test("sniffFormat dispatches on magic bytes, not metadata") {
    assert(ImageCodec.sniffFormat(ImageCodec.toPng(img(1))) == "png")
    assert(ImageCodec.sniffFormat(ImageCodec.toJpeg(img(1))) == "jpeg")
    assert(ImageCodec.sniffFormat(Array[Byte](0, 1, 2, 3)) == "unknown")
    assert(ImageCodec.sniffFormat(Array.emptyByteArray) == "unknown")
  }

  test("JPEG decode is real and lossy; pHash survives the re-encode") {
    val im = img(42)
    val png = ImageCodec.decode(ImageCodec.toPng(im))
    val jpg = ImageCodec.decode(ImageCodec.toJpeg(im))
    assert(jpg != null && jpg.getWidth == im.getWidth)
    // lossy: at least one pixel moved (else the codec path is fake)
    val moved = (0 until im.getHeight).exists(y => (0 until im.getWidth)
      .exists(x => png.getRGB(x, y) != jpg.getRGB(x, y)))
    assert(moved, "JPEG at q=0.85 must not be bit-lossless on this pattern")
    // robust: pHash within the mm_phash_pairs near-dup threshold
    val ham = java.lang.Long.bitCount(
      ImageCodec.phash64(png) ^ ImageCodec.phash64(jpg))
    assert(ham <= 8, s"pHash moved $ham bits across the re-encode")
  }

  test("mm_jpeg_scenes yields multi-frame shots on the gate corpus") {
    val rows = run("mm_jpeg_scenes").collect()
    assert(rows.nonEmpty)
    val frames = rows.map(_.getAs[Long]("n_frames"))
    assert(frames.max <= 8L, "a shot is at most the 8-frame key window")
    assert(frames.count(_ >= 2L) * 2 > frames.length,
      "most shots must span multiple frames — single-frame-only output " +
        "means the shot key degenerated (the r12 doc_id-div-8 bug)")
    // frame accounting: segments tile each source's frame stream exactly
    val total = frames.sum
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(total == nDocs)
  }

  test("mm_codec_dispatch sees both formats and decodes both") {
    val rows = run("mm_codec_dispatch").collect()
    val byFmt = rows.groupBy(_.getAs[String]("format")).view.mapValues(_.length)
    assert(byFmt.getOrElse("png", 0) > 0 && byFmt.getOrElse("jpeg", 0) > 0)
    assert(rows.forall(_.getAs[Boolean]("decoded")))
    // JPEG payloads are smaller than PNG on this pattern at q=0.85
    val jBytes = rows.filter(_.getAs[String]("format") == "jpeg")
      .map(_.getAs[Int]("n_bytes").toLong)
    assert(jBytes.forall(_ > 0))
  }
}
