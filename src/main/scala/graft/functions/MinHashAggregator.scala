package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import graft.queries.Sketches

/** Distributive MinHash set sketch (SURVEY.md §4.3's optional custom
  * `Aggregator`): aggregates the component-wise minimum of per-document
  * signatures, yielding the MinHash signature of the *union* of all
  * shingle sets in the group. min is associative/commutative, so the
  * aggregation combines map-side — one shuffle of NumPerms longs per
  * group regardless of group size. Registered via `functions.udaf`.
  *
  * Use: per-source (or per-shard) corpus sketches whose pairwise
  * est-Jaccard approximates content overlap between whole groups.
  */
object MinHashSetAggregator
    extends Aggregator[Seq[Long], Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(Sketches.NumPerms)(Long.MaxValue)

  override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length && i < sig.length) {
      if (sig(i) < buf(i)) buf(i) = sig(i)
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
