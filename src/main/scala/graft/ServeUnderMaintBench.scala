package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe-latency distribution WHILE the maintenance cadence runs — the
  * serving-side price of the writer story (SCALE.md): the reader contract
  * (fail loudly on a resolved-then-rewritten listing, clean on
  * refresh-retry, [[TableStore.retryingStale]]) is spec-proven for
  * correctness; this measures what it costs in tail latency. A baseline
  * pass probes the quiet store; the contended pass runs the same probes
  * while a background writer loops ingest batches, document edits, store
  * compaction, and the doc→cells rebuild — the full cadence. Prints
  * p50/p95/p99/max per pass and the stale-listing retry count (each retry
  * is one refresh + one re-run, the documented recovery). After each
  * serial pass the BATCHED serving tier answers the same queue
  * ([[graft.pipelines.Pipelines.flagshipIvfBatch]] in batches of 8) under
  * the same conditions — amortized per-query cost and whole-batch retry
  * behavior under churn.
  *
  * Usage: `tools/run_main.sh graft.ServeUnderMaintBench [dir [nlist [nProbes]]]`
  * — defaults to the ×1000 ScaleGen corpus at the √n nlist, 40 probes per
  * pass. */
object ServeUnderMaintBench {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/graft_sf100")
    val nProbes = args.lift(2).map(_.toInt).getOrElse(40)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.dataSizedShuffle(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
        .config("spark.ui.enabled", "false"), cpus.toInt, dir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[A](what: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[serve] $what: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val nChunks = timed("chunk table (ONCE per corpus)") {
      ChunkCatalog.flatChunks(spark, dir).count()
    }
    val nlist = args.lift(1).map(_.toInt).filter(_ > 0).getOrElse(
      math.max(16, math.sqrt(nChunks.toDouble).toInt))
    val nprobe = math.max(4, nlist / 64)
    println(s"[serve] corpus $dir: $nChunks chunks, nlist=$nlist, nprobe=$nprobe, $nProbes probes/pass")
    timed("chunk store build (ONCE)") {
      IvfCatalog.assignedChunks(spark, dir, nlist).count()
    }
    timed("docCells derivation (ONCE)") {
      DocLifecycle.docCells(spark, dir, nlist).count()
    }
    val storeName = IvfCatalog.chunkStoreName(dir, nlist)

    val queries = Seq("spark join vector query", "partitioned parquet scan",
      "streaming ingest loop", "document quality score", "token budget packing",
      "near duplicate detection", "embedding cosine search", "checkpoint replay")
    @volatile var retries = 0
    def probe(i: Int): Double = {
      val t0 = System.nanoTime()
      def run() = pipelines.Pipelines.flagshipIvf(spark, dir,
        queryText = queries(math.floorMod(i, queries.size)) + s" pass $i",
        nlist = nlist, nprobe = nprobe).count()
      try run() catch {
        case e: Throwable if TableStore.isStaleListing(e) =>
          retries += 1
          spark.catalog.refreshTable(storeName)
          run() // the documented refresh-retry recovery
      }
      (System.nanoTime() - t0) / 1e9
    }
    def stats(what: String, xs: Seq[Double]): Unit = {
      val s = xs.sorted
      def pct(p: Double) = s(math.min(s.size - 1, (p * s.size).toInt))
      println(f"[serve] $what: p50=${pct(0.50)}%.2f s  p95=${pct(0.95)}%.2f s  " +
        f"p99=${pct(0.99)}%.2f s  max=${s.last}%.2f s  (n=${s.size}, retries=$retries)")
    }

    // the BATCHED tier answering the same queue: nProbes queries in
    // batches of `batchSize` flagshipIvfBatch calls — the serving shape
    // whose amortized per-query cost SCALE.md's BatchProbeBench measures
    // quiet; here it runs under the same maintenance churn as the serial
    // passes (same retry contract, whole batch re-runs on a stale listing)
    val batchSize = 8
    def batchedPass(tag: String): Unit = {
      val t0 = System.nanoTime()
      var batchRetries = 0
      (0 until nProbes).grouped(batchSize).foreach { g =>
        val texts = g.map(i => queries(math.floorMod(i, queries.size)) + s" pass $i")
        def run() = pipelines.Pipelines.flagshipIvfBatch(spark, dir, texts,
          nlist = nlist, nprobe = nprobe).count()
        try run() catch {
          case e: Throwable if TableStore.isStaleListing(e) =>
            batchRetries += 1
            spark.catalog.refreshTable(storeName)
            run()
        }
      }
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[serve] $tag (batch=$batchSize): ${wall}%.1f s total, " +
        f"${wall / nProbes}%.3f s/query amortized (batch retries=$batchRetries)")
    }

    probe(-1) // warm the session (plans, code gen), not measured
    stats("QUIET baseline", (0 until nProbes).map(probe))
    batchedPass("QUIET BATCHED")

    // the full maintenance cadence in the background: ingest arrivals,
    // edit (upsert) waves, store compaction, doc→cells rebuild
    def mkDocs(tag: String, from: Long, n: Int): Seq[(Long, String)] =
      (0 until n).map { i =>
        (from + i, (1 to 6).map(s => s"Arrival $tag ${from + i} sentence $s " +
          s"lands under serving load on topic ${(i * 11 + s) % 19} with a stable " +
          "vocabulary and enough words for genuine chunks.").mkString(" "))
      }
    @volatile var stop = false
    @volatile var cadences = 0
    val writer = new Thread(() => {
      var wave = 0
      while (!stop) {
        try {
          graft.streaming.StreamingIngest.ingestDocBatch(
            mkDocs("w", 95000001L + wave * 1000L, 100).toDF("doc_id", "text"),
            dir, nlist, flagNearDups = false)
          DocLifecycle.upsertDocChunks(spark, dir,
            mkDocs("e", 95000001L + wave * 1000L, 10).toDF("doc_id", "text"),
            nlist, flagNearDups = false)
          Compaction.compactTable(spark, storeName, idCol = "chunk_id")
          DocLifecycle.compactDocCells(spark, dir, nlist)
          cadences += 1
        } catch { case e: Throwable =>
          println(s"[serve] writer error (continuing): ${e.getMessage.take(200)}")
        }
        wave += 1
      }
    }, "maint-writer")
    retries = 0
    writer.start()
    try {
      stats("UNDER MAINTENANCE", (0 until nProbes).map(probe))
      batchedPass("UNDER-MAINT BATCHED")
    } finally { stop = true; writer.join() }
    println(s"[serve] maintenance cadences completed during the pass: $cadences")
    spark.stop()
  }
}
