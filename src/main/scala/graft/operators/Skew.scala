package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (100 TB design note: a single viral
  * document id or degenerate hash bucket can pin one reducer; AQE's skew-join
  * splitting handles sort-merge cases automatically, salting handles the
  * rest explicitly).
  *
  * `saltedJoin` spreads each hot key of the LARGE side over `saltBuckets`
  * synthetic sub-keys and replicates the SMALL side once per bucket — the
  * classic replicate-broadcast trade: small side grows ×saltBuckets, the
  * large side's hot partitions shrink ÷saltBuckets. Join results are
  * identical to the unsalted equi-join.
  */
object Skew {

  /** Equi-join `large ⋈ small` on `key`, salting the large side's rows into
    * `saltBuckets` sub-partitions. Inner/left joins supported. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 saltBuckets: Int, joinType: String = "inner"): DataFrame = {
    require(saltBuckets > 0)
    // right/full-outer would emit each unmatched small-side row once per
    // replica — not equivalent to the unsalted join
    require(Set("inner", "left", "left_outer", "leftouter").contains(joinType),
      s"saltedJoin supports inner/left joins, got $joinType")
    // deterministic per-row spread: row identity → bucket (not rand(), so
    // retried tasks salt identically)
    val salted = large.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets.toLong)))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Top-N heaviest keys of a DataFrame — the diagnosis step before salting
    * (run on a sample at scale). */
  def keyHistogram(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n_rows"))
      .orderBy(col("n_rows").desc, col(key).asc)
      .limit(topN)
}
