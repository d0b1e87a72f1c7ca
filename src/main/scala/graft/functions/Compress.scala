package graft.functions

import java.util.zip.Deflater

/** In-JDK DEFLATE compressor used as a complexity/entropy measure.
  *
  * Mirrors odin_image/src/lib.rs:648 `compressed_size` (PNG-encode into a
  * counting null writer) and :680 `get_tiled_comp` (per-tile compressed
  * size as the texture feature the smoke classifier consumes), and the
  * compression-based fractal-dimension estimate of lib.rs:580
  * `fractal_dim` (Del-Pozo-Velázquez et al., DSP 166, 2025): compressed
  * size at multiple scales, log-log regression slope.
  *
  * Fixed level + strategy + nowrap make the output length a pure function
  * of the input bytes for a given zlib, and the sizes feed ONLY rows-only
  * checks and in-JVM specs — never a cross-engine hash oracle.
  */
object Compress {

  /** DEFLATE-compressed length of `bytes` (raw stream, BEST_COMPRESSION). */
  def deflateLen(bytes: Array[Byte]): Int = {
    val d = new Deflater(Deflater.BEST_COMPRESSION, /*nowrap=*/ true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var n = 0
      while (!d.finished()) n += d.deflate(buf)
      n
    } finally d.end()
  }

  /** Bresenham-style decimation of `bytes` to `k`/10 of its length —
    * the byte-stream analog of the multi-scale resize in fractal_dim
    * (keep byte i iff the scaled index advances at i). Deterministic,
    * order-preserving, no interpolation.
    */
  def decimate(bytes: Array[Byte], k: Int): Array[Byte] = {
    require(k >= 1 && k <= 10, s"scale k out of range: $k")
    if (k == 10) bytes
    else {
      val out = new java.io.ByteArrayOutputStream(bytes.length * k / 10 + 1)
      var acc = 0
      var i = 0
      while (i < bytes.length) {
        acc += k
        if (acc >= 10) { acc -= 10; out.write(bytes(i)) }
        i += 1
      }
      out.toByteArray
    }
  }

  /** Least-squares slope of (x, y) points — the log-log regression of
    * fractal_dim (lib.rs:611 linear_regression). Exact IEEE arithmetic
    * over a handful of points; callers round before emitting.
    */
  def slope(xs: Array[Double], ys: Array[Double]): Double = {
    val n = xs.length.toDouble
    var sx = 0.0; var sy = 0.0; var sxx = 0.0; var sxy = 0.0
    var i = 0
    while (i < xs.length) {
      sx += xs(i); sy += ys(i); sxx += xs(i) * xs(i); sxy += xs(i) * ys(i)
      i += 1
    }
    (n * sxy - sx * sy) / (n * sxx - sx * sx)
  }
}
