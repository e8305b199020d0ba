package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** RESTART-SAFE arrival counts for the ingest loops' domain-mixture drift
  * advisory ([[Sampling.mixtureDrift]]). The in-memory counters the loop
  * otherwise keeps are per-process telemetry: a restart resets them and a
  * replayed batch counts twice. This log makes the same signal durable by
  * the span-log discipline — one tiny `batch=<id>` parquet part per
  * micro-batch (domain-shaped: one row per arriving domain value), landed
  * by OVERWRITING the batch's own partition so checkpoint replay converges
  * instead of double-counting, folded generationally on the maintenance
  * cadence so the file count stays bounded. Raw (domain, n) rows are
  * stored — not weighted shares — so the target weights can change without
  * invalidating the history.
  *
  * Same resume caveat as the span count log: restarting the stream with a
  * FRESH checkpoint restarts batch ids at 0 and progressively overwrites
  * the old history; resume from the existing checkpoint (the deployment
  * norm) or fold first. */
object MixtureLog {

  /** Land one micro-batch's per-domain arrival counts (replay-idempotent:
    * the batch overwrites its own part). `batch` is micro-batch-scale by
    * the loop contract; the count result is domain-shaped, so one output
    * file suffices. A null domain is stored as a null row and reported as
    * unweighted. */
  def append(batch: DataFrame, domainCol: String, dir: String,
             batchId: Long): Unit =
    batch.groupBy(col(domainCol).cast("string").as("domain"))
      .agg(count(lit(1)).as("n"))
      .coalesce(1)
      .write.mode("overwrite")
      .parquet(s"${SpanDedupIngest.partsDir(batch.sparkSession, dir)}/batch=$batchId")

  /** Cumulative (weighted-domain counts, unweighted-arrival total) over
    * the log — ONE domain-shaped aggregation + bounded collect, empty log
    * = zero counts. */
  def counts(spark: SparkSession, dir: String,
             weights: Map[String, Double]): (Map[String, Long], Long) = {
    val parts = SpanDedupIngest.partsDir(spark, dir)
    val p = new org.apache.hadoop.fs.Path(parts)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasParts = fs.exists(p) && fs.listStatus(p)
      .exists(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
    if (!hasParts) return (Map.empty, 0L)
    val rows = spark.read.option("basePath", parts).parquet(parts)
      .groupBy(col("domain")).agg(sum(col("n")).as("n"))
      .collect()
    val (weighted, other) = rows.partition(r =>
      !r.isNullAt(0) && weights.contains(r.getString(0)))
    (weighted.map(r => r.getString(0) -> r.getLong(1)).toMap,
      other.map(_.getLong(1)).sum)
  }

  /** The drift advisory computed from the DURABLE counts — what the loops
    * surface on the maintenance cadence when a log dir is configured. */
  def drift(spark: SparkSession, dir: String,
            weights: Map[String, Double]): Sampling.MixtureAdvice = {
    val (weighted, other) = counts(spark, dir, weights)
    Sampling.mixtureDrift(weighted, weights, other)
  }

  /** Generational in-place fold of the log's parts (domain-sum) — the
    * same maintenance move as [[SpanDedupIngest.foldLogInLoop]], at the
    * same call discipline (start of batch `belowBatch`). */
  def foldInLoop(spark: SparkSession, dir: String,
                 belowBatch: Long = Long.MaxValue): Boolean =
    SpanDedupIngest.foldPartsInLoop(spark, dir, belowBatch,
      (df, _) => df.groupBy(col("domain")).agg(sum(col("n")).as("n")))
}
