package graft.similarity

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` computing the elementwise mean of float vectors —
  * the per-cell centroid update of distributed k-means (IVF index
  * build). Buffer is (double sums, count); merge is associative, so the
  * aggregation runs map-side partial like any built-in.
  */
object CentroidAggregator
    extends Aggregator[Array[Float], CentroidBuf, Array[Float]] {

  override def zero: CentroidBuf = CentroidBuf(Array.empty[Double], 0L)

  override def reduce(b: CentroidBuf, a: Array[Float]): CentroidBuf = {
    val sums = if (b.sums.isEmpty) new Array[Double](a.length) else b.sums
    var i = 0
    while (i < a.length && i < sums.length) { sums(i) += a(i); i += 1 }
    CentroidBuf(sums, b.n + 1)
  }

  override def merge(x: CentroidBuf, y: CentroidBuf): CentroidBuf = {
    if (x.sums.isEmpty) y
    else if (y.sums.isEmpty) x
    else {
      val sums = x.sums.clone()
      var i = 0
      while (i < sums.length && i < y.sums.length) { sums(i) += y.sums(i); i += 1 }
      CentroidBuf(sums, x.n + y.n)
    }
  }

  override def finish(b: CentroidBuf): Array[Float] =
    if (b.n == 0) Array.empty[Float]
    else b.sums.map(s => (s / b.n).toFloat)

  override def bufferEncoder: Encoder[CentroidBuf] = Encoders.product[CentroidBuf]
  override def outputEncoder: Encoder[Array[Float]] = ExpressionEncoder[Array[Float]]()
}

final case class CentroidBuf(sums: Array[Double], n: Long)
