package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Serving THROUGHPUT of the batch probe vs a serial probe loop
  * (SCALE.md): a serving tier draining a queue of Q queries can answer
  * them one [[graft.operators.Similarity.ivfSearchPruned]] call at a time
  * — Q × (centroid job + listing + pruned scan + top-k) — or hand the
  * whole queue to [[graft.operators.Similarity.ivfSearchPrunedBatch]],
  * which pays ONE centroid job and ONE union-of-probed-cells scan. The
  * cosine arithmetic is identical either way; what the batch collapses is
  * per-query job/listing/scan-setup overhead, which at ×1000 is most of
  * the 2.5 s single-probe wall (ServeUnderMaintBench's quiet p50). Prints
  * both walls, the per-query amortized cost, and verifies the batch's
  * top-k equals each serial probe's row-for-row before timing anything.
  *
  * Usage: `tools/run_main.sh graft.BatchProbeBench [dir [nlist [nQueries]]]`
  * — defaults: the ×1000 ScaleGen corpus, √n nlist, 32 queries. */
object BatchProbeBench {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/graft_sf100")
    val nQueries = args.lift(2).map(_.toInt).getOrElse(32)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.dataSizedShuffle(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
        .config("spark.ui.enabled", "false"), cpus.toInt, dir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[A](what: String)(body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[batch] $what: $s%.1f s")
      (r, s)
    }
    val (nChunks, _) = timed("chunk table (ONCE per corpus)") {
      ChunkCatalog.flatChunks(spark, dir).count()
    }
    val nlist = args.lift(1).map(_.toInt).filter(_ > 0).getOrElse(
      math.max(16, math.sqrt(nChunks.toDouble).toInt))
    val nprobe = math.max(4, nlist / 64)
    println(s"[batch] corpus $dir: $nChunks chunks, nlist=$nlist, nprobe=$nprobe, " +
      s"$nQueries queries")
    timed("chunk store build (ONCE)") {
      IvfCatalog.assignedChunks(spark, dir, nlist).count()
    }
    val store = IvfCatalog.assignedChunks(spark, dir, nlist)
    val cents = IvfCatalog.chunkCentroidsStored(spark, dir, nlist)

    val texts = Seq("spark join vector query", "partitioned parquet scan",
      "streaming ingest loop", "document quality score", "token budget packing",
      "near duplicate detection", "embedding cosine search", "checkpoint replay")
    val qvecs = (0 until nQueries).map { i =>
      (i.toLong, operators.Embedder.embedText(texts(i % texts.size) + s" pass $i").toSeq)
    }
    val queries = qvecs.toDF("qid", "qvec")
    val k = 10

    // correctness first: the batch's per-query top-k must equal each
    // serial probe's (same expression, same ties) — verified untimed
    val batchRows = operators.Similarity
      .ivfSearchPrunedBatch(store, cents, queries, k = k, nprobe = nprobe,
        idCol = "chunk_id")
      .select($"qid", $"chunk_id", $"rank")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val serialRows = qvecs.map { case (qid, qv) =>
      (qid, operators.Similarity
        .ivfSearchPruned(store, cents, qv.toArray, k = k, nprobe = nprobe,
          idCol = "chunk_id")
        .select($"chunk_id").as[String].collect())
    }
    val serialSet = serialRows.flatMap { case (qid, ids) =>
      ids.zipWithIndex.map { case (id, i) => (qid, id, i + 1) } }.toSet
    println(s"[batch] batch ≡ serial: ${batchRows == serialSet} " +
      s"(${batchRows.size} vs ${serialSet.size} rows)")

    // timed passes (stores warm, plans warm from the verification pass)
    val (_, serialWall) = timed(s"SERIAL: $nQueries × ivfSearchPruned") {
      qvecs.foreach { case (_, qv) =>
        operators.Similarity.ivfSearchPruned(store, cents, qv.toArray,
          k = k, nprobe = nprobe, idCol = "chunk_id").count()
      }
    }
    val (_, batchWall) = timed(s"BATCH: 1 × ivfSearchPrunedBatch($nQueries)") {
      operators.Similarity.ivfSearchPrunedBatch(store, cents, queries,
        k = k, nprobe = nprobe, idCol = "chunk_id").count()
    }
    println(f"[batch] per-query: serial ${serialWall / nQueries}%.2f s, " +
      f"batch ${batchWall / nQueries}%.3f s — ${serialWall / batchWall}%.1fx throughput")

    // the SERVING-TIER comparison: full flagship per query (table
    // re-resolution, attribution join, ordering — what a deployed probe
    // pays, the ServeUnderMaintBench shape) vs the batched flagship
    val qTexts = (0 until nQueries).map(i => texts(i % texts.size) + s" pass $i")
    val (_, serialFlag) = timed(s"SERIAL FLAGSHIP: $nQueries × flagshipIvf") {
      qTexts.foreach(t => pipelines.Pipelines.flagshipIvf(spark, dir,
        queryText = t, nlist = nlist, nprobe = nprobe).count())
    }
    val (_, batchFlag) = timed(s"BATCH FLAGSHIP: 1 × flagshipIvfBatch($nQueries)") {
      pipelines.Pipelines.flagshipIvfBatch(spark, dir, qTexts,
        nlist = nlist, nprobe = nprobe).count()
    }
    println(f"[batch] flagship per-query: serial ${serialFlag / nQueries}%.2f s, " +
      f"batch ${batchFlag / nQueries}%.3f s — ${serialFlag / batchFlag}%.1fx throughput")

    // SPARK_GRAFT_PQ=1: the compressed twin — serial ivfPqSearchPruned loop
    // vs one ivfPqSearchPrunedBatch over the same queries (codes scanned in
    // the probed cells, exact rerank; equality verified before timing)
    if (sys.env.get("SPARK_GRAFT_PQ").contains("1")) {
      val (m, ksub) = (48, 32)
      val cb = timed("PQ codebook (ONCE)")(
        IvfPqCatalog.chunkCodebookStored(spark, dir, m, ksub))._1
      timed("code table build (ONCE)") {
        IvfPqCatalog.encodedChunks(spark, dir, nlist, m, ksub).count()
      }
      val codes = IvfPqCatalog.encodedChunks(spark, dir, nlist, m, ksub)
      val adcBatch = operators.Similarity
        .ivfPqSearchPrunedBatch(codes, store, cents, cb, queries,
          k = k, nprobe = nprobe, idCol = "chunk_id")
        .select($"qid", $"chunk_id", $"rank")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
      val adcSerialRows = qvecs.map { case (qid, qv) =>
        (qid, operators.Similarity
          .ivfPqSearchPruned(codes, store, cents, cb, qv.toArray,
            k = k, nprobe = nprobe, idCol = "chunk_id")
          .select($"chunk_id").as[String].collect())
      }
      val adcSerialSet = adcSerialRows.flatMap { case (qid, ids) =>
        ids.zipWithIndex.map { case (id, i) => (qid, id, i + 1) } }.toSet
      println(s"[batch] ADC batch ≡ serial: ${adcBatch == adcSerialSet} " +
        s"(${adcBatch.size} vs ${adcSerialSet.size} rows)")
      val (_, adcSerial) = timed(s"SERIAL ADC: $nQueries × ivfPqSearchPruned") {
        qvecs.foreach { case (_, qv) =>
          operators.Similarity.ivfPqSearchPruned(codes, store, cents, cb,
            qv.toArray, k = k, nprobe = nprobe, idCol = "chunk_id").count()
        }
      }
      val (_, adcBatchW) = timed(s"BATCH ADC: 1 × ivfPqSearchPrunedBatch($nQueries)") {
        operators.Similarity.ivfPqSearchPrunedBatch(codes, store, cents, cb,
          queries, k = k, nprobe = nprobe, idCol = "chunk_id").count()
      }
      println(f"[batch] ADC per-query: serial ${adcSerial / nQueries}%.2f s, " +
        f"batch ${adcBatchW / nQueries}%.3f s — ${adcSerial / adcBatchW}%.1fx throughput")
    }
    spark.stop()
  }
}
