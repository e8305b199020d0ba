package graft.functions

import scala.reflect.ClassTag

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass bounded top-k aggregation (SURVEY.md §7.4 stretch): keeps the
  * k best (score desc, id asc) pairs in a bounded buffer per partition and
  * merges buffers — top-k over 100 TB without any sort of the full corpus.
  * Spark's `TakeOrderedAndProject` already does this for `orderBy+limit`
  * plans; the Aggregator form composes inside `groupBy().agg(...)` (e.g.
  * per-query top-k without a window) and under streaming aggregation.
  *
  * Generic over the id type `I` (Long for surrogate/TPC-H keys, String for
  * the engine's own md5 chunk ids) with the tiebreak ordering supplied as an
  * implicit — pass [[TopKAggregator.utf8Ordering]] for strings when the
  * result must agree with Spark/DuckDB binary (UTF-8) string comparison.
  *
  * Buffer is a k-bounded ascending-sorted Vector — O(log k) lookup +
  * O(k) insert per row, k ≪ corpus.
  *
  * The output encoder defaults to kryo (fine for driver-side `.head()` use);
  * pass an ExpressionEncoder-backed `Encoder[Seq[(I, Double)]]` (e.g. from
  * `spark.implicits`) when the result must stay distributed — kryo output is
  * an opaque binary column that `posexplode` can't open.
  */
class TopKAggregator[I: Ordering: ClassTag](
    k: Int,
    outEnc: Encoder[Seq[(I, Double)]] = Encoders.kryo[Seq[(I, Double)]])
    extends Aggregator[(I, Double), Vector[(Double, I)], Seq[(I, Double)]] {

  require(k > 0)

  private val idOrd = implicitly[Ordering[I]]

  // ordering: better = higher score, then lower id; buffer kept WORST-first
  private def worseThan(a: (Double, I), b: (Double, I)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && idOrd.gt(a._2, b._2))

  override def zero: Vector[(Double, I)] = Vector.empty

  override def reduce(buf: Vector[(Double, I)], row: (I, Double)): Vector[(Double, I)] =
    insert(buf, (row._2, row._1))

  private def insert(buf: Vector[(Double, I)], e: (Double, I)): Vector[(Double, I)] = {
    if (buf.size >= k && worseThan(e, buf.head)) buf // worse than current worst
    else {
      val idx = buf.indexWhere(b => !worseThan(b, e)) // first not-worse-than-e
      val inserted = if (idx < 0) buf :+ e else (buf.take(idx) :+ e) ++ buf.drop(idx)
      if (inserted.size > k) inserted.tail else inserted
    }
  }

  override def merge(b1: Vector[(Double, I)], b2: Vector[(Double, I)]): Vector[(Double, I)] =
    b2.foldLeft(b1)(insert)

  /** best-first output: (id, score) by score desc, id asc. */
  override def finish(buf: Vector[(Double, I)]): Seq[(I, Double)] =
    buf.reverse.map { case (s, id) => (id, s) }

  override def bufferEncoder: Encoder[Vector[(Double, I)]] =
    Encoders.kryo[Vector[(Double, I)]]

  override def outputEncoder: Encoder[Seq[(I, Double)]] = outEnc
}

object TopKAggregator {

  /** String-id tiebreak that agrees with Spark/DuckDB binary string sorts —
    * see [[Orderings.utf8]]. */
  val utf8Ordering: Ordering[String] = Orderings.utf8
}
