package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Dedup

/** Substring-dedup as a RUNNING ingest loop (the deployment shape of N47,
  * mirroring how N32/N44 deploy the embedding near-dup flag): documents
  * arrive as a stream; each micro-batch is flagged for duplicated spans
  * against the accumulated gram-count log and then contributes its own
  * counts, so ingest cost stays ∝ batch while the corpus grows without
  * bound.
  *
  * The log is PLAIN APPEND-ONLY PARQUET, one `batch=<id>` partition
  * directory per micro-batch — deliberately not the leased catalog-table
  * machinery: nothing here ever rewrites, so there is no overwrite race to
  * fence. Idempotence under checkpoint replay is structural instead:
  *
  *  - the counts land by OVERWRITING the batch's own `batch=<id>` dir — a
  *    replayed batch replaces its own part, never doubles it;
  *  - the probe EXCLUDES the current batch id (partition-pruned), so a
  *    replay that crashed after its counts landed still sees exactly the
  *    pre-batch store and reproduces the same flags;
  *  - the flags sink uses the same per-batch overwrite.
  *
  * [[foldLog]] is OFFLINE maintenance (stream stopped, or output swapped in
  * by the caller): it writes the digest-summed log to a fresh directory —
  * flag results against the folded store are identical by
  * [[Dedup.duplicateSpansIncremental]]'s summed-threshold contract
  * (spec-pinned). */
object SpanDedupIngest {

  private def emptyCounts(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("h", StringType), StructField("occ", LongType))))
  }

  /** The accumulated gram-count log, minus `excludeBatch`'s own partition
    * (replay safety: a batch must never probe its own counts). The default
    * excludes nothing — the sentinel is MinValue, NOT -1, because -1 is
    * the folded-history partition [[foldLog]] writes and a default that
    * excluded it would silently hide the whole pre-fold corpus. */
  def readLog(spark: SparkSession, logDir: String,
              excludeBatch: Long = Long.MinValue): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(logDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a dir with no batch= parts yet (first batch, or a pre-created empty
    // dir) has no schema to infer — it IS the empty log
    val hasParts = fs.exists(p) &&
      fs.listStatus(p).exists(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
    if (!hasParts) emptyCounts(spark)
    else spark.read.option("basePath", logDir).parquet(logDir)
      .filter(col("batch") =!= excludeBatch)
      .select(col("h"), col("occ"))
  }

  /** One micro-batch through the loop: flag against the pre-batch store
    * (own partition excluded), then land this batch's counts by overwriting
    * its own `batch=<id>` dir. The flags are MATERIALIZED before the
    * append (localCheckpoint, the ingest-loop lineage discipline) — the
    * lazy plan must never observe the store with its own counts already
    * in it. Returns the flags (idCol, span_start, span_end). */
  def ingestBatch(batch: DataFrame, logDir: String, batchId: Long,
                  k: Int = 5, minOcc: Int = 2,
                  idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = batch.sparkSession
    // materialize the batch before fanning out: a foreachBatch frame
    // re-reads its source per action, and this method takes several (gram
    // evaluation and the counts write) — micro-batch-scale by contract, so
    // the checkpoint is cheap. [[startSpanDedup]] checkpoints BEFORE its
    // emptiness guard and hands the materialized frame here, so the
    // source scans once per batch; for an already-checkpointed input this
    // second checkpoint is one in-memory copy of a micro-batch.
    val src = batch.localCheckpoint(true)
    val store = readLog(spark, logDir, excludeBatch = batchId)
    val flags = Dedup.duplicateSpansIncremental(src, store, k, minOcc,
      idCol, textCol).localCheckpoint(true)
    Dedup.spanGramCounts(src, k, idCol, textCol)
      .write.mode("overwrite").parquet(s"$logDir/batch=$batchId")
    flags
  }

  /** The running loop: `docs` (a streaming frame with idCol + textCol) →
    * per-batch flags appended under `flagsDir/batch=<id>`, counts log under
    * `logDir`. Both sinks are per-batch-overwrite, so a replayed batch
    * converges to the identical state. */
  def startSpanDedup(docs: DataFrame, logDir: String, flagsDir: String,
                     checkpoint: String, k: Int = 5, minOcc: Int = 2,
                     idCol: String = "doc_id",
                     textCol: String = "text"): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        // materialize ONCE, before the emptiness guard — isEmpty on the
        // raw foreachBatch frame would itself be a (partial) source scan
        val src = b.localCheckpoint(true)
        // empty micro-batches (trigger fired, nothing arrived) must not
        // leave schema-less partition dirs in either sink
        if (!src.isEmpty) {
          val flags = ingestBatch(src, logDir, id, k, minOcc, idCol, textCol)
          flags.write.mode("overwrite").parquet(s"$flagsDir/batch=$id")
        }
        ()
      }
      .start()

  /** All flags the loop has emitted so far; empty (with the loop's output
    * schema) before the first non-empty batch commits — same guard as
    * [[readLog]], a just-started stream must not throw on its own sink.
    * `idType` must match the source's id column (the span family supports
    * string ids too — a hardcoded LongType here would hand a string-id
    * pipeline an un-unionable empty frame before its first commit). */
  def readFlags(spark: SparkSession, flagsDir: String,
                idCol: String = "doc_id",
                idType: org.apache.spark.sql.types.DataType =
                  org.apache.spark.sql.types.LongType): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(flagsDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasParts = fs.exists(p) &&
      fs.listStatus(p).exists(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
    if (!hasParts) {
      import org.apache.spark.sql.types._
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField(idCol, idType),
          StructField("span_start", LongType), StructField("span_end", LongType))))
    } else
      spark.read.option("basePath", flagsDir).parquet(flagsDir).drop("batch")
  }

  /** Offline fold: the log's parts summed per digest into `outDir` as one
    * `batch=-1` partition — NEGATIVE on purpose: streaming batch ids start
    * at 0 again when a folded log is resumed with a FRESH checkpoint, so a
    * folded part named `batch=0` would be (a) excluded from batch 0's own
    * probe (the replay-exclusion filter would hide the whole history) and
    * then (b) destroyed by batch 0's own-partition overwrite. No real
    * batch id is ever negative, so the folded part is always probed and
    * never overwritten. Must fold to a FRESH directory (rejected
    * otherwise): folding in place would sum the parts it is lazily
    * reading while leaving the originals beside the result — every count
    * doubled. Run with the stream stopped, or swap the loop's logDir to
    * the folded dir; flag results are identical either way because the
    * incremental kernel sums matched store rows per digest. */
  def foldLog(spark: SparkSession, logDir: String, outDir: String): Unit = {
    val src = new org.apache.hadoop.fs.Path(logDir)
    val dst = new org.apache.hadoop.fs.Path(outDir)
    val fs = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (srcQ, dstQ) = (fs.makeQualified(src).toString, fs.makeQualified(dst).toString)
    // reject identity AND nesting either way: a fold landing INSIDE the
    // live log (or enclosing it) corrupts the log's partition discovery
    // for every subsequent reader, not just double-counts
    require(srcQ != dstQ && !dstQ.startsWith(srcQ + "/") && !srcQ.startsWith(dstQ + "/"),
      s"foldLog must write to a fresh directory disjoint from the log — " +
        s"got log '$logDir' and out '$outDir' (in-place or nested folds " +
        "leave unsummed parts beside or inside the folded result)")
    readLog(spark, logDir)
      .groupBy(col("h")).agg(sum(col("occ")).as("occ"))
      .write.mode("overwrite").parquet(s"$outDir/batch=-1")
  }
}
