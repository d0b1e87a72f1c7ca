package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Fixed-point Gram-matrix accumulator: folds d-dim float vectors into a
  * d·d BIGINT outer-product sum (floor(xᵢ·xⱼ·2^26) per element). This is
  * the covariance/Gram pass PCA whitening and OPQ rotation training run
  * over an embedding corpus before index build.
  *
  * Why a typed Aggregator and not an explode: expressing Σ x xᵀ
  * declaratively means exploding d² rows per vector (4096× shuffle blowup
  * at d=64) — at 100 TB that explode IS the job. The aggregator keeps the
  * entire reduction map-side: each partition folds its vectors into one
  * d²-long buffer, partials merge element-wise, and the shuffle carries
  * exactly one buffer per partition. Same pattern as [[TopK]]: shuffle
  * volume O(partitions·d²), not O(rows·d²).
  *
  * Integer fixed point keeps the fold order-free (exact associativity),
  * so map-side combining cannot change the result — the property every
  * oracle-checked aggregation in this engine relies on.
  */
case class GramMatrix(d: Int) extends Aggregator[Seq[Float], Array[Long], Seq[Long]] {

  private val scale = 67108864.0 // 2^26: |x|<=1 floats; d·n terms fit BIGINT

  override def zero: Array[Long] = new Array[Long](d * d)

  override def reduce(buf: Array[Long], v: Seq[Float]): Array[Long] = {
    val arr = v.toArray
    var i = 0
    while (i < d) {
      val xi = arr(i).toDouble
      var j = 0
      while (j < d) {
        buf(i * d + j) += math.floor(xi * arr(j).toDouble * scale).toLong
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var k = 0
    while (k < a.length) { a(k) += b(k); k += 1 }
    a
  }

  override def finish(r: Array[Long]): Seq[Long] = r.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}
