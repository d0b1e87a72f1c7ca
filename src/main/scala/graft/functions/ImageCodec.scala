package graft.functions

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Real in-JDK image codec for the multimodal path — no external codec
  * libraries needed: `javax.imageio` ships PNG both ways. Mirrors the
  * decode step odin_image / odin_onnx perform before feature extraction
  * and inference (odin_onnx/src/lib.rs preprocessing).
  *
  * Everything here is deterministic: synthetic pixels are integer
  * functions of (doc_id, x, y), PNG is lossless, and the features are
  * exact integer/rational reductions over the decoded pixels — so the
  * decode→featurize round trip produces identical values on every
  * executor and run, even though the encoded byte stream itself may vary
  * across JDK encoder versions.
  */
object ImageCodec {

  /** Deterministic synthetic RGB image for a document id: a structured
    * gradient+stripe pattern (not noise, so channel stats are nontrivial).
    */
  def syntheticImage(docId: Long, w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((docId * 31 + x * 7 + y * 13) % 256).toInt & 0xFF
        val g = ((docId * 17 + x * 3) % 256).toInt & 0xFF
        val b = ((docId * 5 + y * 11) % 256).toInt & 0xFF
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Encode to PNG bytes (lossless). */
  def toPng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Real decode: PNG/JPEG bytes → BufferedImage (null-safe: returns
    * null for undecodable payloads, callers surface that as a flag).
    */
  def decode(bytes: Array[Byte]): BufferedImage =
    try ImageIO.read(new ByteArrayInputStream(bytes))
    catch { case _: Exception => null }

  /** Stub inference model: a fixed deterministic linear layer over the
    * decoded features (no model weights ship in this container). Single
    * shared site so the executor batch loop and the driver-side oracle
    * LUT produce bit-identical logits.
    */
  def stubLogits(f: Array[Double]): Array[Double] =
    Array.tabulate(4) { k =>
      var acc = 0.0
      var j = 0
      while (j < 8) { acc += f(j) * (((k * 8 + j) % 5) - 2) / 510.0; j += 1 }
      acc
    }

  /** Per-channel statistics over decoded pixels — the 8-dim feature
    * vector the inference stage consumes: mean R/G/B, luminance
    * mean/min/max, luminance stddev, horizontal edge energy. Exact
    * integer sums before the final divisions.
    */
  def features(img: BufferedImage): Array[Double] = {
    val w = img.getWidth
    val h = img.getHeight
    val n = w.toLong * h
    var sr = 0L; var sg = 0L; var sb = 0L
    var slum = 0L; var slum2 = 0L
    var minLum = 255L; var maxLum = 0L
    var edge = 0L
    var y = 0
    while (y < h) {
      var prevLum = -1L
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        val r = (p >> 16) & 0xFF; val g = (p >> 8) & 0xFF; val b = p & 0xFF
        sr += r; sg += g; sb += b
        // integer luminance (ITU-R 601 weights scaled by 1000)
        val lum = (299L * r + 587L * g + 114L * b) / 1000L
        slum += lum; slum2 += lum * lum
        if (lum < minLum) minLum = lum
        if (lum > maxLum) maxLum = lum
        if (prevLum >= 0) edge += math.abs(lum - prevLum)
        prevLum = lum
        x += 1
      }
      y += 1
    }
    val meanLum = slum.toDouble / n
    val varLum = slum2.toDouble / n - meanLum * meanLum
    Array(
      sr.toDouble / n, sg.toDouble / n, sb.toDouble / n,
      meanLum, math.sqrt(math.max(0.0, varLum)),
      minLum.toDouble, maxLum.toDouble,
      edge.toDouble / math.max(1, n - h)) // h rows × (w-1) diffs; max guards w<=1 (ADVICE r3)
  }
}
