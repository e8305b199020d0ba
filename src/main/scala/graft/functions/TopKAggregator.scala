package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass bounded top-k aggregation (SURVEY.md §7.4 stretch): keeps the
  * k best (score desc, id asc) pairs in a bounded buffer per partition and
  * merges buffers — top-k over 100 TB without any sort of the full corpus.
  * Spark's `TakeOrderedAndProject` already does this for `orderBy+limit`
  * plans; the Aggregator form composes inside `groupBy().agg(...)` (e.g.
  * per-query top-k without a window) and under streaming aggregation.
  *
  * Buffer is a k-bounded ascending-sorted Vector — O(log k) lookup +
  * O(k) insert per row, k ≪ corpus.
  *
  * The output encoder defaults to kryo (fine for driver-side `.head()` use);
  * pass an ExpressionEncoder-backed `Encoder[Seq[(Long, Double)]]` (e.g. from
  * `spark.implicits`) when the result must stay distributed — kryo output is
  * an opaque binary column that `posexplode` can't open.
  */
class TopKAggregator(
    k: Int,
    outEnc: Encoder[Seq[(Long, Double)]] = Encoders.kryo[Seq[(Long, Double)]])
    extends Aggregator[(Long, Double), Vector[(Double, Long)], Seq[(Long, Double)]] {

  require(k > 0)

  // ordering: better = higher score, then lower id; buffer kept WORST-first
  private def worseThan(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 > b._2)

  override def zero: Vector[(Double, Long)] = Vector.empty

  override def reduce(buf: Vector[(Double, Long)], row: (Long, Double)): Vector[(Double, Long)] =
    insert(buf, (row._2, row._1))

  private def insert(buf: Vector[(Double, Long)], e: (Double, Long)): Vector[(Double, Long)] = {
    if (buf.size >= k && worseThan(e, buf.head)) buf // worse than current worst
    else {
      val idx = buf.indexWhere(b => !worseThan(b, e)) // first not-worse-than-e
      val inserted = if (idx < 0) buf :+ e else (buf.take(idx) :+ e) ++ buf.drop(idx)
      if (inserted.size > k) inserted.tail else inserted
    }
  }

  override def merge(b1: Vector[(Double, Long)], b2: Vector[(Double, Long)]): Vector[(Double, Long)] =
    b2.foldLeft(b1)(insert)

  /** best-first output: (id, score) by score desc, id asc. */
  override def finish(buf: Vector[(Double, Long)]): Seq[(Long, Double)] =
    buf.reverse.map { case (s, id) => (id, s) }

  override def bufferEncoder: Encoder[Vector[(Double, Long)]] =
    Encoders.kryo[Vector[(Double, Long)]]

  override def outputEncoder: Encoder[Seq[(Long, Double)]] = outEnc
}
