package graft.functions

import org.apache.spark.sql.{Encoder, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Dataset` aggregation surface (SURVEY §2.C C10): the one place the
  * engine exposes `Aggregator[IN, BUF, OUT]` — for callers who work in
  * `Dataset[T]` with case-class rows and want compile-time checked
  * aggregation instead of column expressions. The relational mean-pooling
  * form (SparkEntry q65) stays the oracled reference; `CentroidAgg` is the
  * typed equivalent for the `KeyValueGroupedDataset.agg` API, spec-pinned
  * to produce the same vectors.
  *
  * Scale shape: the buffer is one running (sum[], count) per group —
  * merge-associative partial aggregation, the same map-side-combine plan
  * the untyped path gets. Element-wise sums fold in array-index order on
  * every path, so results are deterministic for a given partition merge
  * tree; the q65 oracle pins the fold-order-free DECIMAL variant where
  * bit-exactness across engines is required.
  */
object TypedAggs {

  /** Exact element-wise centroid of embedding vectors. Empty input → empty
    * vector (no NaN sentinel); ragged input throws — a silent truncate-to-
    * shortest would corrupt every dimension past the shortest row. */
  final class CentroidAgg extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Double]] {
    override def zero: (Array[Double], Long) = (Array.emptyDoubleArray, 0L)

    // initialization is keyed on the COUNT, not on the accumulator being
    // empty: a zero-length input vector must not read as "uninitialized"
    // (that made [empty, v] dilute the centroid while [v, empty] threw —
    // same group, partition-order-dependent results)
    override def reduce(b: (Array[Double], Long), a: Seq[Float]): (Array[Double], Long) =
      if (b._2 == 0L) {
        val out = new Array[Double](a.length)
        var i = 0; while (i < a.length) { out(i) = a(i).toDouble; i += 1 }
        (out, 1L)
      } else {
        require(b._1.length == a.length,
          s"ragged embedding dimensions: ${b._1.length} vs ${a.length}")
        val acc = b._1
        var i = 0; while (i < acc.length) { acc(i) += a(i).toDouble; i += 1 }
        (acc, b._2 + 1L)
      }

    override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) =
      if (x._2 == 0L) y
      else if (y._2 == 0L) x
      else {
        require(x._1.length == y._1.length,
          s"ragged embedding dimensions: ${x._1.length} vs ${y._1.length}")
        val out = x._1.clone()
        var i = 0; while (i < out.length) { out(i) += y._1(i); i += 1 }
        (out, x._2 + y._2)
      }

    override def finish(r: (Array[Double], Long)): Seq[Double] =
      if (r._2 == 0L) Seq.empty
      else r._1.map(_ / r._2).toSeq

    override def bufferEncoder: Encoder[(Array[Double], Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** The [[CentroidAgg]] as a `TypedColumn` for `Dataset.groupByKey(...).agg`. */
  def centroid: TypedColumn[Seq[Float], Seq[Double]] = new CentroidAgg().toColumn
}
