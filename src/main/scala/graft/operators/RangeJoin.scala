package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-containment join: points joined to every interval [start, end]
  * that contains them — "which incident window / maintenance period /
  * labeling campaign was this event inside".
  *
  * Spark has no native range join: `p.ts BETWEEN i.start AND i.end` with no
  * equality conjunct plans as BroadcastNestedLoopJoin (fine only while the
  * interval side broadcasts) or a CartesianProduct (never fine). The
  * scale-safe encoding is BINNING: quantize time into fixed-width bins,
  * explode each interval to the bins it covers, bin each point once, and
  * equi-join on the bin — the range predicate becomes a shuffle-hash-join
  * key plus a residual filter, distributing over any interval count.
  *
  * Exactness: a point in bin b matches interval i iff i covers b and the
  * residual containment filter passes; an interval covers each of its bins
  * exactly once, so there are no duplicates and no misses.
  *
  * Cost: |points| + Σ(interval_len/binWidth) rows through one exchange.
  * Pick binWidth near the median interval length — much smaller explodes
  * the interval side; much larger packs unrelated intervals into hot bins
  * (bin skew; AQE skew-join splits them if it happens). Timestamps must be
  * non-negative epochs (micros here; floor-div binning).
  */
object RangeJoin {

  /** Points joined to all containing intervals (inclusive bounds). Output:
    * point columns ++ interval columns. Column names must not collide. */
  def intervalJoin(points: DataFrame, tsCol: String,
                   intervals: DataFrame, startCol: String, endCol: String,
                   binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val w = lit(binWidth)
    // exact integral floor-div: (c - c mod w) / w — the numerator is an
    // exact multiple of w, so the double division is exact. floor(c/w) on
    // raw double division is NOT safe at epoch-micros magnitudes (a
    // quotient within half-ulp of the next integer rounds up).
    def bin(c: org.apache.spark.sql.Column) =
      ((c.cast("long") - pmod(c.cast("long"), w)) / w).cast("long")
    val binnedIntervals = intervals.withColumn("__bin",
      explode(sequence(bin(col(startCol)), bin(col(endCol)))))
    val binnedPoints = points.withColumn("__bin", bin(col(tsCol)))
    binnedPoints.join(binnedIntervals, "__bin")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__bin")
  }
}
