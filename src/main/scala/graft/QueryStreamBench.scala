package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The deployed serving shape priced end to end (SCALE.md): queries as a
  * STREAM ([[graft.streaming.StreamingIngest.startQueries]]) while the
  * full maintenance cadence churns the store underneath — per-micro-batch
  * enqueue→answered wall, quiet and contended. This is the composition of
  * the round's serving pieces: each micro-batch is one `flagshipIvfBatch`
  * probe riding the retryingStale reader contract; the writer loops
  * ingest waves, upserts, compaction, and the doc→cells rebuild exactly
  * as ServeUnderMaintBench's cadence does.
  *
  * Usage: `tools/run_main.sh graft.QueryStreamBench [dir [nlist [nBatches [batchSize]]]]`
  * — defaults: the ×1000 ScaleGen corpus, √n nlist, 5 micro-batches of 8.
  * `SPARK_GRAFT_PQ=1` serves the COMPRESSED stack — `startQueries` routes
  * every micro-batch through `flagshipIvfPqBatch` (the measured-cheapest
  * ×1000 probe) and the maintenance cadence co-maintains the code table —
  * the full ADC deployment shape end to end. */
object QueryStreamBench {
  def main(args: Array[String]): Unit = {
    val dir: String = args.lift(0).getOrElse("/tmp/graft_sf100")
    val nBatches: Int = args.lift(2).map(_.toInt).getOrElse(5)
    val batchSize: Int = args.lift(3).map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.dataSizedShuffle(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
        .config("spark.ui.enabled", "false"), cpus.toInt, dir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def timed[A](what: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[qstream] $what: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val nChunks = timed("chunk table (ONCE per corpus)") {
      ChunkCatalog.flatChunks(spark, dir).count()
    }
    val nlist = args.lift(1).map(_.toInt).filter(_ > 0).getOrElse(
      math.max(16, math.sqrt(nChunks.toDouble).toInt))
    val nprobe = math.max(4, nlist / 64)
    println(s"[qstream] corpus $dir: $nChunks chunks, nlist=$nlist, nprobe=$nprobe, " +
      s"$nBatches batches × $batchSize queries")
    timed("chunk store build (ONCE)") {
      IvfCatalog.assignedChunks(spark, dir, nlist).count()
    }
    timed("docCells derivation (ONCE)") {
      DocLifecycle.docCells(spark, dir, nlist).count()
    }
    val pq = sys.env.get("SPARK_GRAFT_PQ").exists(v => v == "1" || v.equalsIgnoreCase("true"))
    val (pqM, pqKsub) = (if (pq) 48 else 0, 32)
    if (pq) timed(s"IVFADC code table build m=$pqM (ONCE)") {
      IvfPqCatalog.encodedChunks(spark, dir, nlist, pqM, pqKsub).count()
    }
    val storeName = IvfCatalog.chunkStoreName(dir, nlist)

    val texts = Seq("spark join vector query", "partitioned parquet scan",
      "streaming ingest loop", "document quality score", "token budget packing",
      "near duplicate detection", "embedding cosine search", "checkpoint replay")

    @volatile var answered = 0L
    def runPass(tag: String, idBase: Long): Seq[Double] = {
      val source = MemoryStream[(Long, String)]
      val ckpt = s"/tmp/graft_qstream_ckpt_${System.nanoTime()}"
      val q = graft.streaming.StreamingIngest.startQueries(
        source.toDF().toDF("query_id", "query_text"), dir, ckpt,
        nlist = nlist, nprobe = nprobe, pqM = pqM, pqKsub = pqKsub,
        onAnswers = (_, df) => answered += df.count())
      val walls = (0 until nBatches).map { b =>
        val queries = (0 until batchSize).map { i =>
          (idBase + b * 100L + i,
            texts((b * batchSize + i) % texts.size) + s" $tag wave $b slot $i")
        }
        val t0 = System.nanoTime()
        source.addData(queries: _*)
        q.processAllAvailable() // enqueue → every answer delivered
        (System.nanoTime() - t0) / 1e9
      }
      q.stop()
      walls
    }
    def stats(tag: String, walls: Seq[Double]): Unit = {
      val s = walls.sorted
      println(f"[qstream] $tag: per-batch p50=${s(s.size / 2)}%.2f s  " +
        f"max=${s.last}%.2f s  per-query ${walls.sum / (walls.size * batchSize)}%.3f s " +
        f"(${walls.size} batches × $batchSize)")
    }

    stats("QUIET", runPass("quiet", 80000000L))

    def mkDocs(tag: String, from: Long, n: Int): Seq[(Long, String)] =
      (0 until n).map { i =>
        (from + i, (1 to 6).map(s => s"Arrival $tag ${from + i} sentence $s " +
          s"lands under streamed serving on topic ${(i * 13 + s) % 17} with a " +
          "stable vocabulary and enough words for genuine chunks.").mkString(" "))
      }
    @volatile var stop = false
    @volatile var cadences = 0
    val writer = new Thread(() => {
      var wave = 0
      while (!stop) {
        try {
          graft.streaming.StreamingIngest.ingestDocBatch(
            mkDocs("w", 96000001L + wave * 1000L, 100).toDF("doc_id", "text"),
            dir, nlist, flagNearDups = false, pqM = pqM, pqKsub = pqKsub)
          DocLifecycle.upsertDocChunks(spark, dir,
            mkDocs("e", 96000001L + wave * 1000L, 10).toDF("doc_id", "text"),
            nlist, flagNearDups = false, pqM = pqM, pqKsub = pqKsub)
          Compaction.compactTable(spark, storeName, idCol = "chunk_id")
          if (pq) Compaction.compactTable(spark,
            IvfPqCatalog.chunkCodesTableName(spark, dir, nlist, pqM, pqKsub),
            idCol = "chunk_id", leaseScope = storeName)
          DocLifecycle.compactDocCells(spark, dir, nlist)
          cadences += 1
        } catch { case e: Throwable =>
          println(s"[qstream] writer error (continuing): ${e.getMessage.take(200)}")
        }
        wave += 1
      }
    }, "maint-writer")
    writer.start()
    try stats("UNDER MAINTENANCE", runPass("maint", 81000000L))
    finally { stop = true; writer.join() }
    println(s"[qstream] cadences completed during the contended pass: $cadences; " +
      s"total answer rows delivered: $answered")
    spark.stop()
  }
}
