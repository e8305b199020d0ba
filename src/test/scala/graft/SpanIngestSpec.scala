package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup
import graft.streaming.SpanDedupIngest

/** The substring-dedup ingest loop (SpanDedupIngest) driven through a real
  * streaming query: per-arrival flags equal the full-corpus spans
  * restricted to each batch at its arrival time, replayed batches converge
  * to identical state, and the offline fold preserves flag results. */
class SpanIngestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def collectSpans(df: org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    df.select("doc_id", "span_start", "span_end")
      .as[(Long, Long, Long)].collect().toSet
  }

  private val b1 = Seq(
    1L -> "one two three four five six alpha",
    2L -> "b1 b2 b3 b4 b5 filler",            // batch-internal dup with 3
    3L -> "pre b1 b2 b3 b4 b5")
  private val b2 = Seq(
    10L -> "zero one two three four five six beta", // dup vs batch-1 doc 1
    11L -> "u1 u2 u3 u4 u5 u6")                     // unique everywhere
  private val b3 = Seq(
    20L -> "one two three four five six gamma")     // dup vs the store

  /** Arrival-time expectation: spans of the union of batches 1..N,
    * restricted to batch N's documents. */
  private def expectedAt(batches: Seq[(Long, String)]*) = {
    val all = docs(batches.flatten: _*)
    val lastIds = batches.last.map(_._1).toSet
    collectSpans(Dedup.duplicateSpans(all)).filter(s => lastIds(s._1))
  }

  test("a three-batch stream flags each arrival against the store so far") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (logDir, flagsDir, ckpt) =
      (tmp("spanlog"), tmp("spanflags"), tmp("spanckpt"))
    val source = MemoryStream[(Long, String)]
    val q = SpanDedupIngest.startSpanDedup(
      source.toDF().toDF("doc_id", "text"), logDir, flagsDir, ckpt)
    try {
      source.addData(b1: _*); q.processAllAvailable()
      source.addData(b2: _*); q.processAllAvailable()
      source.addData(b3: _*); q.processAllAvailable()
    } finally q.stop()

    val got = collectSpans(SpanDedupIngest.readFlags(spark, flagsDir))
    val want = expectedAt(b1) ++ expectedAt(b1, b2) ++ expectedAt(b1, b2, b3)
    assert(got === want)
    // the loop's store now carries every batch's counts, one part each
    val log = spark.read.option("basePath", logDir).parquet(logDir)
    assert(log.select("batch").distinct().as[Long].collect().toSet === Set(0L, 1L, 2L))
  }

  test("a replayed batch converges: identical flags, no doubled counts") {
    import spark.implicits._
    val logDir = tmp("spanlog_rp")
    SpanDedupIngest.ingestBatch(docs(b1: _*), logDir, batchId = 0L)
    val first = collectSpans(
      SpanDedupIngest.ingestBatch(docs(b2: _*), logDir, batchId = 1L))
    val logAfterFirst = spark.read.option("basePath", logDir).parquet(logDir)
      .select(org.apache.spark.sql.functions.hex($"h"), $"occ", $"batch")
      .as[(String, Long, Long)].collect().toSet
    // crash-replay of batch 1: its counts are ALREADY in the log, yet the
    // probe excludes its own partition, so the flags reproduce exactly and
    // the overwrite leaves the log semantically unchanged
    val replay = collectSpans(
      SpanDedupIngest.ingestBatch(docs(b2: _*), logDir, batchId = 1L))
    val logAfterReplay = spark.read.option("basePath", logDir).parquet(logDir)
      .select(org.apache.spark.sql.functions.hex($"h"), $"occ", $"batch")
      .as[(String, Long, Long)].collect().toSet
    assert(replay === first)
    assert(logAfterReplay === logAfterFirst)
    assert(first === expectedAt(b1, b2))
  }

  test("offline fold preserves flag results and yields a resumable log") {
    import spark.implicits._
    val raw = tmp("spanlog_raw")
    SpanDedupIngest.ingestBatch(docs(b1: _*), raw, batchId = 0L)
    SpanDedupIngest.ingestBatch(docs(b2: _*), raw, batchId = 1L)
    val folded = tmp("spanlog_folded")
    SpanDedupIngest.foldLog(spark, raw, folded)
    // folded log: one part, digest-summed, same totals
    assert(spark.read.option("basePath", folded).parquet(folded)
      .groupBy().sum("occ").as[Long].head() ===
      spark.read.option("basePath", raw).parquet(raw)
        .groupBy().sum("occ").as[Long].head())
    // the next batch flags identically against raw and folded stores —
    // and the folded leg uses batchId = 0, the FRESH-CHECKPOINT resume
    // case: streaming ids restart at 0, so the folded part must be neither
    // excluded by batch 0's own-id probe filter nor overwritten by its
    // own-partition write (it lives at batch=-1)
    val viaRaw = collectSpans(
      SpanDedupIngest.ingestBatch(docs(b3: _*), raw, batchId = 7L))
    val viaFolded = collectSpans(
      SpanDedupIngest.ingestBatch(docs(b3: _*), folded, batchId = 0L))
    assert(viaFolded === viaRaw)
    assert(viaRaw === expectedAt(b1, b2, b3))
    // the folded history survived batch 0's own-partition overwrite
    assert(spark.read.option("basePath", folded).parquet(folded)
      .filter($"batch" === -1L).count() > 0)
  }

  test("foldLog refuses in-place and nested folds") {
    val raw = tmp("spanlog_inplace")
    SpanDedupIngest.ingestBatch(docs(b1: _*), raw, batchId = 0L)
    intercept[IllegalArgumentException](
      SpanDedupIngest.foldLog(spark, raw, raw))
    // nested either way corrupts partition discovery, not just counts
    intercept[IllegalArgumentException](
      SpanDedupIngest.foldLog(spark, raw, s"$raw/compacted"))
    intercept[IllegalArgumentException](
      SpanDedupIngest.foldLog(spark, raw, new java.io.File(raw).getParent))
  }

  test("foldLogInLoop folds committed parts in place: totals, flags, layout") {
    import spark.implicits._
    val logDir = tmp("spanlog_inloop")
    SpanDedupIngest.ingestBatch(docs(b1: _*), logDir, batchId = 0L)
    SpanDedupIngest.ingestBatch(docs(b2: _*), logDir, batchId = 1L)
    val totalBefore = SpanDedupIngest.readLog(spark, logDir)
      .groupBy().sum("occ").as[Long].head()
    // fold at the start of batch 2: both committed parts collapse into the
    // first generation's folded-history part
    assert(SpanDedupIngest.foldLogInLoop(spark, logDir, belowBatch = 2L))
    assert(SpanDedupIngest.partsDir(spark, logDir) === s"$logDir/g0")
    assert(spark.read.option("basePath", s"$logDir/g0").parquet(s"$logDir/g0")
      .select("batch").distinct().as[Long].collect().toSet === Set(-1L))
    assert(SpanDedupIngest.readLog(spark, logDir)
      .groupBy().sum("occ").as[Long].head() === totalBefore)
    // superseded flat parts are swept
    assert(!new java.io.File(s"$logDir/batch=0").exists())
    // the next batch probes the folded history identically; its part lands
    // in the live generation
    val flags = collectSpans(
      SpanDedupIngest.ingestBatch(docs(b3: _*), logDir, batchId = 2L))
    assert(flags === expectedAt(b1, b2, b3))
    assert(new java.io.File(s"$logDir/g0/batch=2").exists())
    // a second fold advances the generation and sweeps the previous one
    val totalAll = SpanDedupIngest.readLog(spark, logDir)
      .groupBy().sum("occ").as[Long].head()
    assert(SpanDedupIngest.foldLogInLoop(spark, logDir, belowBatch = 3L))
    assert(SpanDedupIngest.partsDir(spark, logDir) === s"$logDir/g1")
    assert(!new java.io.File(s"$logDir/g0").exists())
    assert(SpanDedupIngest.readLog(spark, logDir)
      .groupBy().sum("occ").as[Long].head() === totalAll)
  }

  test("foldLogInLoop drops an uncommitted attempt's part; the replay converges") {
    import spark.implicits._
    val logDir = tmp("spanlog_crashfold")
    SpanDedupIngest.ingestBatch(docs(b1: _*), logDir, batchId = 0L)
    // a single committed part is already as folded as it gets
    assert(!SpanDedupIngest.foldLogInLoop(spark, logDir, belowBatch = 1L))
    SpanDedupIngest.ingestBatch(docs(b2: _*), logDir, batchId = 1L)
    // batch 2 lands its counts, then CRASHES before its checkpoint commits
    SpanDedupIngest.ingestBatch(docs(b3: _*), logDir, batchId = 2L)
    // restart: the fold at the start of batch 2's REPLAY folds only the
    // committed parts (0, 1) and drops the crashed attempt's part
    assert(SpanDedupIngest.foldLogInLoop(spark, logDir, belowBatch = 2L))
    val committed = SpanDedupIngest.readLog(spark, logDir)
      .groupBy().sum("occ").as[Long].head()
    assert(committed ===
      graft.operators.Dedup.spanGramCounts(docs(b1 ++ b2: _*))
        .groupBy().sum("occ").as[Long].head())
    // the replay reproduces batch 2's flags exactly and lands its part once
    val replay = collectSpans(
      SpanDedupIngest.ingestBatch(docs(b3: _*), logDir, batchId = 2L))
    assert(replay === expectedAt(b1, b2, b3))
    assert(SpanDedupIngest.readLog(spark, logDir)
      .groupBy().sum("occ").as[Long].head() ===
      graft.operators.Dedup.spanGramCounts(docs(b1 ++ b2 ++ b3: _*))
        .groupBy().sum("occ").as[Long].head())
  }

  test("streamed loop with foldEvery folds mid-stream and flags unchanged") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (logDir, flagsDir, ckpt) =
      (tmp("spanlog_fe"), tmp("spanflags_fe"), tmp("spanckpt_fe"))
    val source = MemoryStream[(Long, String)]
    val q = SpanDedupIngest.startSpanDedup(
      source.toDF().toDF("doc_id", "text"), logDir, flagsDir, ckpt,
      foldEvery = 2)
    try {
      source.addData(b1: _*); q.processAllAvailable()
      source.addData(b2: _*); q.processAllAvailable()
      source.addData(b3: _*); q.processAllAvailable() // fold fires first here
    } finally q.stop()
    val got = collectSpans(SpanDedupIngest.readFlags(spark, flagsDir))
    assert(got === expectedAt(b1) ++ expectedAt(b1, b2) ++ expectedAt(b1, b2, b3))
    // batches 0+1 folded into g0/batch=-1; batch 2 landed beside it
    assert(SpanDedupIngest.partsDir(spark, logDir) === s"$logDir/g0")
    assert(spark.read.option("basePath", s"$logDir/g0").parquet(s"$logDir/g0")
      .select("batch").distinct().as[Long].collect().toSet === Set(-1L, 2L))
    // the FLAGS store folded on the same cadence: same generational
    // layout, and `got` above already proved readFlags is unchanged by it
    assert(SpanDedupIngest.partsDir(spark, flagsDir) === s"$flagsDir/g0")
    assert(spark.read.option("basePath", s"$flagsDir/g0").parquet(s"$flagsDir/g0")
      .select("batch").distinct().as[Long].collect().toSet === Set(-1L, 2L))
  }

  test("foldFlagsInLoop is pure compaction: readFlags identical, parts bounded") {
    val (logDir, flagsDir) = (tmp("spanlog_ffl"), tmp("spanflags_ffl"))
    def land(batch: Seq[(Long, String)], id: Long): Unit =
      SpanDedupIngest.ingestBatch(docs(batch: _*), logDir, id)
        .write.mode("overwrite")
        .parquet(s"${SpanDedupIngest.partsDir(spark, flagsDir)}/batch=$id")
    land(b1, 0L); land(b2, 1L)
    val before = collectSpans(SpanDedupIngest.readFlags(spark, flagsDir))
    assert(SpanDedupIngest.foldFlagsInLoop(spark, flagsDir, belowBatch = 2L))
    assert(SpanDedupIngest.partsDir(spark, flagsDir) === s"$flagsDir/g0")
    assert(collectSpans(SpanDedupIngest.readFlags(spark, flagsDir)) === before)
    assert(!new java.io.File(s"$flagsDir/batch=0").exists()) // swept
    // a post-fold batch lands in the live generation and unions in
    land(b3, 2L)
    assert(collectSpans(SpanDedupIngest.readFlags(spark, flagsDir)) ===
      before ++ expectedAt(b1, b2, b3))
    // folded part + one new part: nothing foldable below the same bound
    assert(!SpanDedupIngest.foldFlagsInLoop(spark, flagsDir, belowBatch = 2L))
  }

  test("foldFlagsInLoop sizes its output files by BYTES, not a fixed count") {
    val (logDir, flagsDir) = (tmp("spanlog_fsz"), tmp("spanflags_fsz"))
    def land(batch: Seq[(Long, String)], id: Long): Unit =
      SpanDedupIngest.ingestBatch(docs(batch: _*), logDir, id)
        .write.mode("overwrite")
        .parquet(s"${SpanDedupIngest.partsDir(spark, flagsDir)}/batch=$id")
    land(b1, 0L); land(b2, 1L)
    def dataFiles(dir: String): Seq[java.io.File] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isFile) Seq(f)
        else Option(f.listFiles()).map(_.toSeq.flatMap(walk)).getOrElse(Nil)
      walk(new java.io.File(dir)).filter(_.getName.endsWith(".parquet"))
    }
    val inputBytes = dataFiles(flagsDir).map(_.length()).sum
    // span-shaped volume, generous target -> exactly one output file
    assert(SpanDedupIngest.foldFlagsInLoop(spark, flagsDir, belowBatch = 2L))
    assert(dataFiles(s"$flagsDir/g0/batch=-1").size === 1)
    // a decade-fat store under the same rule bin-packs: force it by
    // setting the target BELOW the input volume -> more than one file
    land(b3, 2L)
    val target = math.max(1L, inputBytes / 3)
    assert(SpanDedupIngest.foldFlagsInLoop(spark, flagsDir,
      belowBatch = 3L, targetFileBytes = target))
    val outFiles = dataFiles(s"$flagsDir/g1/batch=-1")
    assert(outFiles.size > 1,
      s"expected bin-packing at target=$target bytes, got ${outFiles.size} file(s)")
    // degenerate target rejected
    intercept[IllegalArgumentException](
      SpanDedupIngest.foldFlagsInLoop(spark, flagsDir, targetFileBytes = 0L))
  }

  test("readFlags on a not-yet-written sink returns empty, not a throw") {
    val flagsDir = tmp("spanflags_empty")
    assert(SpanDedupIngest.readFlags(spark, flagsDir).count() === 0L)
    assert(SpanDedupIngest.readFlags(spark, s"$flagsDir/never_created").count() === 0L)
  }
}
