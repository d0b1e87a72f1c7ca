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

  /** Independent mini-walk: collect the non-entropy marker codes of the
    * head (up to the first SOS) — used to assert a fixture genuinely
    * carries the frame type under test without trusting jpegMeta.
    */
  private def headMarkers(b: Array[Byte]): Seq[Int] = {
    def u8(o: Int) = b(o) & 0xFF
    def u16(o: Int) = (u8(o) << 8) | u8(o + 1)
    var off = 2
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var done = false
    while (!done && off + 4 <= b.length) {
      while (u8(off) == 0xFF && u8(off + 1) == 0xFF) off += 1
      assert(u8(off) == 0xFF, s"lost sync at $off")
      val m = u8(off + 1)
      out += m
      if (m == 0xDA) done = true
      else off += 2 + u16(off + 2)
    }
    out.toSeq
  }

  test("progressive (SOF2) frames: marker walk and decode agree") {
    val im = img(7)
    val prog = ImageCodec.toJpegProgressive(im)
    // genuinely progressive: a SOF2 frame header, no baseline SOF0
    val heads = headMarkers(prog)
    assert(heads.contains(0xC2) && !heads.contains(0xC0),
      s"fixture not progressive: markers ${heads.map(_.toHexString)}")
    val info = ImageCodec.jpegMeta(prog)
    assert(info.markerOk, "walk must consume a multi-scan file exactly")
    assert(info.width == im.getWidth && info.height == im.getHeight
      && info.precision == 8 && info.nComponents == 3)
    // multi-scan: progressive files carry more segments than baseline
    val base = ImageCodec.toJpeg(im)
    assert(info.nSegments > ImageCodec.jpegMeta(base).nSegments)
    val dec = ImageCodec.decode(prog)
    assert(dec != null && dec.getWidth == im.getWidth
      && dec.getHeight == im.getHeight)
    // and the progressive re-encode stays pHash-close to the baseline one
    val ham = java.lang.Long.bitCount(
      ImageCodec.phash64(dec) ^ ImageCodec.phash64(ImageCodec.decode(base)))
    assert(ham <= 8, s"pHash moved $ham bits baseline vs progressive")
  }

  test("spec-legal 0xFF fill bytes before a marker walk cleanly") {
    val bytes = ImageCodec.toJpeg(img(9))
    // insert two fill bytes before the first post-SOI marker (B.1.1.2:
    // fill bytes may pad in front of any marker)
    val padded = bytes.take(2) ++ Array(0xFF.toByte, 0xFF.toByte) ++ bytes.drop(2)
    val info = ImageCodec.jpegMeta(padded)
    val orig = ImageCodec.jpegMeta(bytes)
    assert(info.markerOk, "fill bytes must not break the walk")
    assert(info.width == orig.width && info.height == orig.height
      && info.nSegments == orig.nSegments)
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
