package graft

import org.apache.spark.sql.SparkSession

/** Shared shuffle-sizing defaults for the runnable surfaces (Bench, Verify,
  * Smoke, ScaleCurve): size shuffle partitions to the DATA, not the core
  * count. The r7 partition sweep measured 100M-event sessionization at
  * 49.8 s with core-count partitions vs 29.2 s at 256 (≈ tens of MB per
  * partition); a manual `SPARK_GRAFT_SHUFFLE` override found that point —
  * AQE should own it. Shuffles start wide (`initialPartitionNum`) and AQE
  * coalesces down to the advisory byte size; `parallelismFirst=false` makes
  * the advisory size, not core count, the coalescing target. On a cluster
  * the same knobs govern spill behavior at every scale factor — these
  * defaults are the "would this survive 100×" posture, applied where the
  * driver actually measures.
  *
  * Env overrides (harness sweeps): `SPARK_GRAFT_AQE=false` → static-plan
  * control runs; `SPARK_GRAFT_ADVISORY` → advisory partition bytes.
  */
object GraftSession {

  /** Apply the data-sized shuffle defaults to a session builder.
    * `shuffle` is the static fallback partition count (used verbatim when
    * AQE is disabled; otherwise the floor under `initialPartitionNum`). */
  def dataSizedShuffle(b: SparkSession.Builder, shuffle: Int): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", shuffle.toString)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY", "32m"))
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        math.max(1024, shuffle).toString)
}
