package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Per-batch latency of the DOCUMENT ingest loop
  * ([[streaming.StreamingIngest.startDocs]]) against the stored chunk index
  * at scale — the flagship's actual ingest path (feature pipeline → pruned
  * identity dedup → near-dup flag → cell append), which the vector-loop
  * numbers ([[IngestStreamBench]]) do not price: a document batch pays
  * chunking + embedding up front and fans out ~chunks-per-doc rows into the
  * store. Batches are half REPLAYED corpus documents (the identity-dedup
  * drop path — a re-crawl/redelivery) and half fresh re-keyed documents
  * with deterministically prefixed text (the append path), so every batch
  * pays both halves of the production loop.
  *
  * Usage: `sbt "runMain graft.DocIngestBench [dir [nlist [batchDocs [nBatches [mode [flag [firstBatch]]]]]]]"`
  * — defaults to the ×10 ScaleGen corpus, √n-chunks cells, 200 docs/batch,
  * 4 batches, seeded centroids (`mode` = `seeded` | `trained`; `flag` =
  * `flag` | `noflag` isolates the near-dup kernel's share of the batch).
  * The loop
  * runs `compactEvery = 2`, so the printed file counts show the
  * self-maintaining steady state, not unbounded fragmentation.
  * `SPARK_GRAFT_PQ=1` adds the IVFADC leg: the code table is built before
  * the loop and every batch also appends PQ codes (`pqM = 48`), pricing the
  * full compressed-serving maintenance path. `SPARK_GRAFT_DOCCELLS=1`
  * derives the doc→cells secondary index before the loop, so every batch
  * ALSO appends its (doc, cell) pairs and the cadence rebuilds the index —
  * the full lifecycle-capable deployment (arrivals loop + editable store).
  */
object DocIngestBench {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/graft_sf1")
    val batchDocs = args.lift(2).map(_.toInt).getOrElse(200)
    val nBatches = args.lift(3).map(_.toInt).getOrElse(4)
    val trained = args.lift(4).map(_.trim.toLowerCase).getOrElse("seeded") match {
      case "trained" => true
      case "seeded"  => false
      case other     => sys.error(s"unknown centroid mode '$other' (seeded|trained)")
    }
    val flagNearDups = args.lift(5).map(_.trim.toLowerCase).getOrElse("flag") match {
      case "flag"   => true
      case "noflag" => false
      case other    => sys.error(s"unknown flag mode '$other' (flag|noflag)")
    }
    // firstBatch offsets the batch slices + fresh-id keys, so a second leg
    // can reuse the (expensive) store builds without its batches colliding
    // with rows a previous leg already appended
    val firstBatch = args.lift(6).map(_.toInt).getOrElse(0)
    val pq = sys.env.get("SPARK_GRAFT_PQ").exists(v => v == "1" || v.equalsIgnoreCase("true"))
    val (pqM, pqKsub) = (48, 32)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.dataSizedShuffle(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
        .config("spark.ui.enabled", "false"), cpus.toInt, dir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def timed[A](what: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[docingest] $what: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val nChunks = timed("chunk table (bucketed feature-pipeline output, ONCE per corpus)") {
      ChunkCatalog.flatChunks(spark, dir).count()
    }
    val nlist = args.lift(1).map(_.toInt).filter(_ > 0).getOrElse( // 0 = auto
      math.max(16, math.sqrt(nChunks.toDouble).toInt))
    val mode = if (trained) "trained" else "seeded"
    println(s"[docingest] corpus $dir: $nChunks chunks, nlist=$nlist, " +
      s"batch=${batchDocs}+${batchDocs} docs × $nBatches, centroids=$mode, " +
      s"flag=$flagNearDups, pq=$pq")

    timed(s"chunk store build ($mode centroids + assign + partitioned write, ONCE)") {
      IvfCatalog.assignedChunks(spark, dir, nlist, trained).count()
    }
    if (pq) timed(s"IVFADC code table build (m=$pqM, ksub=$pqKsub, ONCE)") {
      IvfPqCatalog.encodedChunks(spark, dir, nlist, pqM, pqKsub, trained).count()
    }
    val docCells = sys.env.get("SPARK_GRAFT_DOCCELLS").exists(v =>
      v == "1" || v.equalsIgnoreCase("true"))
    if (docCells) timed("doc→cells secondary index derivation (ONCE)") {
      DocLifecycle.docCells(spark, dir, nlist, trained).count()
    }

    // batch b: `batchDocs` corpus docs with doc_id ≡ b (mod M) replayed
    // verbatim (identity dedup drops every chunk), plus the same docs
    // re-keyed and text-prefixed (every chunk id fresh → the append path)
    val docs = Tables.documents(spark, dir)
    val nDocs = docs.count()
    // the modulus must cover the HIGHEST batch index a firstBatch-offset
    // leg uses, or those batches silently select zero documents
    val mod = math.max((firstBatch + nBatches).toLong, nDocs / math.max(batchDocs, 1))
    val batches: Seq[Seq[(Long, String)]] = (firstBatch until firstBatch + nBatches).map { b =>
      val slice = docs.filter(pmod($"doc_id", lit(mod)) === b)
        .orderBy($"doc_id".asc).limit(batchDocs)
        .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
      slice ++ slice.map { case (id, text) =>
        (id + 900000000L * (b + 1), s"fresh$b $text")
      }
    }

    // SPARK_GRAFT_SPAN=1 runs the INTEGRATED dual-granularity loop (r17):
    // the same arrival stream also maintains the span gram-count log and
    // emits document-level span flags, with the log folded in place on the
    // compactEvery cadence — pricing what the second granularity adds to
    // the per-batch latency above the chunk path alone.
    val span = sys.env.get("SPARK_GRAFT_SPAN").exists(v =>
      v == "1" || v.equalsIgnoreCase("true"))
    val (spanLog, spanFlags) =
      if (!span) ("", "")
      else (java.nio.file.Files.createTempDirectory("graft_docingest_spanlog").toString,
            java.nio.file.Files.createTempDirectory("graft_docingest_spanflags").toString)

    // SPARK_GRAFT_MIX=1 adds the DURABLE mixture-drift advisory to the
    // same loop (r18: MixtureLog — per-batch domain counts landed
    // replay-idempotently, folded on the cadence, advisory computed from
    // disk). The batch docs carry no `source` column in this bench, so
    // the domain is derived from the id — the point here is pricing the
    // log writes + the cadence read in the running loop, not the weights.
    val mix = sys.env.get("SPARK_GRAFT_MIX").exists(v =>
      v == "1" || v.equalsIgnoreCase("true"))
    val mixLog =
      if (!mix) ""
      else java.nio.file.Files.createTempDirectory("graft_docingest_mixlog").toString

    val source = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_docingest_ckpt").toString
    val arrivals0 =
      source.toDF().toDF("doc_id", "text")
    val arrivals =
      if (mix) arrivals0.withColumn("source",
        concat(lit("src"), pmod($"doc_id", lit(3L)).cast("string")))
      else arrivals0
    val q = streaming.StreamingIngest.startDocs(
      arrivals, dir, ckpt, nlist,
      trained = trained, compactEvery = 2, flagNearDups = flagNearDups,
      pqM = if (pq) pqM else 0, pqKsub = pqKsub,
      spanLogDir = spanLog, spanFlagsDir = spanFlags,
      mixtureWeights = if (mix) Map("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.3)
                       else Map.empty,
      mixtureLogDir = mixLog,
      onMixtureAdvice = a => println(s"[docingest] mixture advice: $a"),
      onBatch = r => println(f"[docingest] batch ${r.batchId}: docs=${r.arrived} " +
        f"chunksDropped=${r.dropped} chunksAppended=${r.appended} latency=${r.seconds}%.2f s"))
    batches.foreach { b => source.addData(b: _*); q.processAllAvailable() }
    q.stop()

    if (span) {
      val flags = streaming.SpanDedupIngest.readFlags(spark, spanFlags)
      println(s"[docingest] span flags emitted: rows=${flags.count()} " +
        s"docs=${flags.select("doc_id").distinct().count()}")
      val partsName = streaming.SpanDedupIngest.partsDir(spark, spanLog)
        .stripPrefix(spanLog).stripPrefix("/")
      println(s"[docingest] span log parts dir after cadence folds: " +
        (if (partsName.isEmpty) "legacy (no fold ran)"
         else s"$partsName (folded in place)"))
      // r18: the FLAGS store folds on the same cadence now
      val flagsParts = streaming.SpanDedupIngest.partsDir(spark, spanFlags)
        .stripPrefix(spanFlags).stripPrefix("/")
      println(s"[docingest] span FLAGS parts dir after cadence folds: " +
        (if (flagsParts.isEmpty) "legacy (no fold ran)"
         else s"$flagsParts (folded in place)"))
    }
    if (mix) {
      val (w, other) = streaming.MixtureLog.counts(spark, mixLog,
        Map("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.3))
      println(s"[docingest] durable mixture log totals: $w other=$other " +
        s"(parts dir ${streaming.SpanDedupIngest.partsDir(spark, mixLog)
          .stripPrefix(mixLog).stripPrefix("/")})")
    }

    println(s"[docingest] store rows after $nBatches batches: " +
      IvfCatalog.assignedChunks(spark, dir, nlist, trained).count())
    val store = IvfCatalog.chunkStoreName(dir, nlist, trained)
    val frag = Compaction.partitionStats(spark, store)
    println(s"[docingest] store files (compactEvery=2 steady state): " +
      s"total=${frag.map(_.files).sum} max/cell=${frag.map(_.files).max} cells=${frag.size}")
    val rep = Compaction.compactTable(spark, store, idCol = "chunk_id")
    println(f"[docingest] final compaction: ${rep.compacted.size} cells rewritten, " +
      f"files ${rep.filesBefore} -> ${rep.filesAfter}, ${rep.seconds}%.1f s")
    if (pq) {
      val codes = IvfPqCatalog.chunkCodesTableName(spark, dir, nlist, pqM, pqKsub, trained)
      val cfrag = Compaction.partitionStats(spark, codes)
      println(s"[docingest] code-table files: total=${cfrag.map(_.files).sum}, rows=" +
        IvfPqCatalog.encodedChunks(spark, dir, nlist, pqM, pqKsub, trained).count())
    }
    if (docCells) {
      // the cadence's staged swap ran in the foreachBatch-cloned session;
      // this session's cached relation is stale — re-resolve first (the
      // documented reader contract, TableStore.getOrBuild's refresh)
      val idxName = DocLifecycle.docCellsName(dir, nlist, trained)
      spark.catalog.refreshTable(idxName)
      val idx = spark.table(idxName)
      val live = spark.table(store).select("document_id", "centroid_id").distinct().count()
      println(s"[docingest] doc→cells index after cadence: rows=${idx.count()} " +
        s"(live pairs=$live), distinct=${idx.distinct().count()}")
    }
    spark.stop()
  }
}
