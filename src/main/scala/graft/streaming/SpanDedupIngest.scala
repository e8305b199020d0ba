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
  * Maintenance: without it the log grows one part per micro-batch forever
  * and probe cost degrades with file count — the exact failure mode table
  * compaction exists for. [[foldLogInLoop]] closes it for a RUNNING loop
  * (generation-swap, crash-safe, called by the loops on their maintenance
  * cadence); [[foldLog]] is the offline form (stream stopped, fresh output
  * directory). Flag results against a folded store are identical by
  * [[Dedup.duplicateSpansIncremental]]'s summed-threshold contract
  * (spec-pinned). */
object SpanDedupIngest {

  private def emptyCounts(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("h", BinaryType), StructField("occ", LongType))))
  }

  // ------------------------------------------------ generational layout
  //
  // The in-loop fold ([[foldLogInLoop]]) needs a crash-safe swap: the log
  // lives in GENERATION subdirectories `logDir/g<N>/batch=*`, and the
  // current generation is RESOLVED FROM DISK — the highest g<N> whose
  // `batch=-1` folded part committed (`_SUCCESS`) — never from a pointer
  // file a crash could leave stale. A log that has never folded in-loop
  // keeps the legacy flat layout (parts directly under logDir), so every
  // pre-existing log, spec fixture, and [[foldLog]] output reads
  // unchanged; the first in-loop fold migrates it. A crash mid-fold
  // leaves either an unreadable half-written g<N+1> (ignored: no
  // committed batch=-1) or a complete one beside the stale g<N>
  // (resolution picks the newer, the stale dir is swept by the next
  // fold) — at no point is the log's total count wrong.

  private def hadoopFs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Fail FAST on deployments where parquet job commits are invisible to
    * generation resolution (success markers disabled): the in-place folds
    * already refuse to sweep when the folded part's `_SUCCESS` never
    * appears, but from inside a running stream that surfaces as a
    * recurring mid-cadence crash AFTER each fold's work is done — every
    * restart re-hits it. Streams that enable fold maintenance call this
    * at START so the incompatibility surfaces once, immediately, before
    * any ingest work. */
  def requireVisibleCommits(spark: SparkSession, context: String): Unit =
    require(spark.sessionState.newHadoopConf().getBoolean(
        "mapreduce.fileoutputcommitter.marksuccessfuljobs", true),
      s"$context resolves fold generations from _SUCCESS markers, but " +
        "mapreduce.fileoutputcommitter.marksuccessfuljobs=false on this " +
        "deployment — in-place fold maintenance cannot run here (re-enable " +
        "success markers or disable the fold cadence)")

  /** (generation number, parts directory) for the log's CURRENT
    * generation; generation -1 = the legacy flat layout (logDir itself). */
  private def currentGen(spark: SparkSession, logDir: String): (Int, String) = {
    val fs = hadoopFs(spark, logDir)
    val root = new org.apache.hadoop.fs.Path(logDir)
    if (!fs.exists(root)) return (-1, logDir)
    val gens = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.matches("g\\d+"))
      .map(_.getPath.getName.drop(1).toInt)
      // a generation is LIVE only once its folded history committed — a
      // half-written fold output must never be mistaken for the log
      .filter(g => fs.exists(new org.apache.hadoop.fs.Path(
        s"$logDir/g$g/batch=-1/_SUCCESS")))
    if (gens.isEmpty) (-1, logDir) else {
      val g = gens.max; (g, s"$logDir/g$g")
    }
  }

  /** The directory the log's `batch=*` parts live in right now. */
  def partsDir(spark: SparkSession, logDir: String): String =
    currentGen(spark, logDir)._2

  /** The accumulated gram-count log, minus `excludeBatch`'s own partition
    * (replay safety: a batch must never probe its own counts). The default
    * excludes nothing — the sentinel is MinValue, NOT -1, because -1 is
    * the folded-history partition [[foldLog]]/[[foldLogInLoop]] write and
    * a default that excluded it would silently hide the whole pre-fold
    * corpus. */
  def readLog(spark: SparkSession, logDir: String,
              excludeBatch: Long = Long.MinValue): DataFrame = {
    val dir = partsDir(spark, logDir)
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = hadoopFs(spark, dir)
    // a dir with no batch= parts yet (first batch, or a pre-created empty
    // dir) has no schema to infer — it IS the empty log
    val hasParts = fs.exists(p) &&
      fs.listStatus(p).exists(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
    if (!hasParts) emptyCounts(spark)
    else spark.read.option("basePath", dir).parquet(dir)
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
      .write.mode("overwrite").parquet(s"${partsDir(spark, logDir)}/batch=$batchId")
    flags
  }

  /** The running loop: `docs` (a streaming frame with idCol + textCol) →
    * per-batch flags appended under `flagsDir/batch=<id>`, counts log under
    * `logDir`. Both sinks are per-batch-overwrite, so a replayed batch
    * converges to the identical state. `foldEvery = N` makes the loop
    * self-maintaining: after every N non-empty batches the count log is
    * folded in place ([[foldLogInLoop]], at the START of the next batch —
    * the only point where every foldable part is checkpoint-committed), so
    * probe cost stays one-part-plus-recent instead of one part per
    * micro-batch forever. The FLAGS store folds on the same cadence
    * ([[foldFlagsInLoop]] — pure part compaction, readFlags-identical),
    * so its dir/file count stays bounded too. */
  def startSpanDedup(docs: DataFrame, logDir: String, flagsDir: String,
                     checkpoint: String, k: Int = 5, minOcc: Int = 2,
                     idCol: String = "doc_id",
                     textCol: String = "text",
                     foldEvery: Int = 0): StreamingQuery = {
    // surfaced HERE, not at the first fold cadence: on a deployment with
    // success markers disabled the fold's sweep guard would otherwise
    // kill the stream mid-run, after the fold work, on every restart
    if (foldEvery > 0)
      requireVisibleCommits(docs.sparkSession, "startSpanDedup's fold cadence")
    var sinceFold = 0
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        // materialize ONCE, before the emptiness guard — isEmpty on the
        // raw foreachBatch frame would itself be a (partial) source scan
        val src = b.localCheckpoint(true)
        // empty micro-batches (trigger fired, nothing arrived) must not
        // leave schema-less partition dirs in either sink
        if (!src.isEmpty) {
          if (foldEvery > 0 && sinceFold >= foldEvery) {
            foldLogInLoop(src.sparkSession, logDir, belowBatch = id)
            // the flags store fragments at the same one-dir-per-batch rate
            foldFlagsInLoop(src.sparkSession, flagsDir, belowBatch = id)
            sinceFold = 0
          }
          val flags = ingestBatch(src, logDir, id, k, minOcc, idCol, textCol)
          flags.write.mode("overwrite")
            .parquet(s"${partsDir(src.sparkSession, flagsDir)}/batch=$id")
          sinceFold += 1
        }
        ()
      }
      .start()
  }

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
    val dir = partsDir(spark, flagsDir) // the flags store folds generationally too
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasParts = fs.exists(p) &&
      fs.listStatus(p).exists(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
    if (!hasParts) {
      import org.apache.spark.sql.types._
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField(idCol, idType),
          StructField("span_start", LongType), StructField("span_end", LongType))))
    } else
      spark.read.option("basePath", dir).parquet(dir).drop("batch")
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

  /** Fold the log IN PLACE, crash-safely — the RUNNING loop's maintenance
    * form of [[foldLog]] (which requires a stopped stream and a fresh
    * directory). Every part with batch id below `belowBatch` (plus any
    * previous `batch=-1` history) is digest-summed into one part in a
    * fresh generation directory (`logDir/g<N+1>/batch=-1`); once that
    * write COMMITS, generation resolution flips to it and the superseded
    * generation is swept. Flag results are identical before and after by
    * the summed-threshold contract, and probe cost drops back to one part
    * instead of one-per-micro-batch — the exact growth mode table
    * compaction exists for, closed for the span log.
    *
    * MUST run at the START of processing batch `belowBatch`, before that
    * batch's own counts land (the doc/span loops call it there): every
    * part below that id belongs to a checkpoint-COMMITTED batch, so
    * folding it can never race a replay, and a partial part left by a
    * crashed attempt of the current batch is deliberately dropped — the
    * probe excludes the current batch id anyway and its replay rewrites
    * the part in the new generation. Crash anywhere inside this method
    * and the log stays correct: a half-written fold output has no
    * committed `batch=-1` and is invisible to resolution (swept later); a
    * completed one beside a stale generation resolves by recency.
    *
    * Offline callers (stream stopped) may omit `belowBatch` to fold
    * everything in place. Returns true when a fold ran (false = nothing
    * worth folding: the history is already one part). */
  def foldLogInLoop(spark: SparkSession, logDir: String,
                    belowBatch: Long = Long.MaxValue): Boolean =
    foldPartsInLoop(spark, logDir, belowBatch,
      (df, _) => df.groupBy(col("h")).agg(sum(col("occ")).as("occ")))

  /** [[foldLogInLoop]] for the FLAGS side of the loop: the per-batch span
    * flags are emissions, not counts — folding them is pure part
    * compaction (union the committed parts into one bounded-file part, no
    * aggregation), closing the same one-dir-per-micro-batch-forever
    * growth mode for the flags store that [[foldLogInLoop]] closes for
    * the count log ([[readFlags]] output is identical before and after;
    * SpanIngestSpec pins it). Same generational crash-safety and same
    * call discipline: at the START of processing batch `belowBatch`.
    * Output file count is sized by BYTES — `ceil(input bytes /
    * targetFileBytes)`, the [[graft.Compaction.compactTable]] bin-pack
    * rule — not a fixed count: flags are span-shaped at every measured
    * scale, but a corpus-decade store under a fixed count would pack
    * into ever-fatter files. */
  def foldFlagsInLoop(spark: SparkSession, flagsDir: String,
                      belowBatch: Long = Long.MaxValue,
                      targetFileBytes: Long = 128L << 20): Boolean = {
    require(targetFileBytes > 0, s"targetFileBytes must be positive: $targetFileBytes")
    foldPartsInLoop(spark, flagsDir, belowBatch, (df, bytes) =>
      df.coalesce(math.max(1L,
        (bytes + targetFileBytes - 1) / targetFileBytes).toInt))
  }

  /** The shared generational in-place fold: every committed `batch=<id>`
    * part below `belowBatch` in `dir`'s current generation is read,
    * passed through `fold` (which also receives the foldable parts' total
    * data bytes, so a compaction-shaped fold can bin-pack its output file
    * count), and written as `g<N+1>/batch=-1`; once that commit is
    * VISIBLE to generation resolution the superseded layout is swept.
    * Used by the span count log (digest-sum fold), the span flags store
    * (byte-sized part compaction), and the mixture arrival log
    * (domain-sum fold). */
  private[streaming] def foldPartsInLoop(spark: SparkSession, dir: String,
                                         belowBatch: Long,
                                         fold: (DataFrame, Long) => DataFrame): Boolean = {
    import org.apache.hadoop.fs.Path
    requireVisibleCommits(spark, s"in-place fold of '$dir'")
    val fs = hadoopFs(spark, dir)
    val (g, cur) = currentGen(spark, dir)
    val curPath = new Path(cur)
    if (!fs.exists(curPath)) return false
    val parts = fs.listStatus(curPath).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .map(s => (s.getPath.getName.stripPrefix("batch=").toLong, s.getPath))
    val foldable = parts.filter(_._1 < belowBatch)
    if (foldable.size <= 1) return false
    val foldableBytes = foldable
      .map(p => fs.getContentSummary(p._2).getLength).sum
    val next = g + 1 // legacy flat layout (-1) migrates to g0
    fold(spark.read.parquet(foldable.map(_._2.toString): _*), foldableBytes)
      .write.mode("overwrite").parquet(s"$dir/g$next/batch=-1")
    // the sweep below deletes the layout the fold SUPERSEDED — it must
    // only run once resolution actually reads g<next>. A deployment with
    // _SUCCESS markers disabled (mapreduce.fileoutputcommitter
    // .marksuccessfuljobs=false) commits invisibly to currentGen; sweeping
    // there would delete the LIVE log while readers still resolve the old
    // generation. Fail loudly instead — the folded data is all still
    // present (old layout intact, new one ignored), only the maintenance
    // move is refused.
    val gNow = currentGen(spark, dir)._1
    require(gNow == next,
      s"in-place fold of '$dir' wrote g$next but generation resolution " +
        s"still reads g$gNow — the folded part's _SUCCESS marker is not " +
        "visible (committer success markers disabled?); refusing to sweep " +
        "the live layout")
    // sweep everything g<next> superseded — stale generations, legacy
    // flat parts, and any crashed-attempt part of the current batch (its
    // replay rewrites it in the new generation). Best-effort: a dir that
    // survives a failed delete is ignored by resolution and retried by
    // the next fold.
    fs.listStatus(new Path(dir)).foreach { s =>
      val n = s.getPath.getName
      if (s.isDirectory &&
          (n.startsWith("batch=") || (n.matches("g\\d+") && n != s"g$next")))
        try fs.delete(s.getPath, true) catch { case _: java.io.IOException => () }
    }
    true
  }
}
