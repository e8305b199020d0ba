package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Similarity, VectorSearch}

/** nprobe × rerank tuning grid for the COMPRESSED chunk probe (SCALE.md):
  * recall@10 against brute-force exact AND per-query latency of
  * [[Similarity.ivfPqSearchPruned]] over the stored IVFADC chunk index, so
  * the ADC approximation's two knobs are picked from a measured table
  * instead of defaults. The grid prices the real trade: more probed cells
  * (nprobe) buys candidate COVERAGE at linear scan cost; a deeper exact
  * re-rank (rerankFactor) buys back ADC quantization error at the cost of
  * raw-vector reads inside the already-probed cells — at 100 TB the second
  * knob is nearly free relative to the first, which the table shows.
  *
  * Queries are a deterministic hash-sample of stored chunk embeddings (the
  * distribution a self-serving retrieval index actually sees); ground truth
  * is the exact cosine top-10 over the full store.
  *
  * Usage: `sbt "runMain graft.AdcGridBench [dir [nQueries [nlist]]]"` —
  * defaults to the ×1000 ScaleGen corpus, 8 queries, √n-chunks cells,
  * m=48 / ksub=256 codebook (the serving shape FlagshipBench prices).
  */
object AdcGridBench {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/graft_sf100")
    val nQueries = args.lift(1).map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.dataSizedShuffle(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
        .config("spark.ui.enabled", "false"), cpus.toInt, dir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](what: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[adcgrid] $what: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val nChunks = timed("chunk table (ONCE per corpus)") {
      ChunkCatalog.flatChunks(spark, dir).count()
    }
    val nlist = args.lift(2).map(_.toInt).getOrElse(
      math.max(16, math.sqrt(nChunks.toDouble).toInt))
    val (m, ksub) = (48, sys.env.get("SPARK_GRAFT_PQ_KSUB").map(_.toInt).getOrElse(256))
    // SPARK_GRAFT_TRAINED=1 runs the grid over the PRODUCTION index shape:
    // bounded-sample k-means centroids (and a k-means codebook) — the
    // coverage-ceiling lift the flagship rows measure, priced per knob
    val trained = sys.env.get("SPARK_GRAFT_TRAINED").exists(v =>
      v == "1" || v.equalsIgnoreCase("true"))
    println(s"[adcgrid] corpus $dir: $nChunks chunks, nlist=$nlist, pq m=$m ksub=$ksub trained=$trained")
    timed("IVF chunk index build (ONCE)") {
      IvfCatalog.assignedChunks(spark, dir, nlist, trained).count()
    }
    timed("IVFADC code table build (ONCE)") {
      IvfPqCatalog.encodedChunks(spark, dir, nlist, m, ksub, trained).count()
    }
    val store = IvfCatalog.assignedChunks(spark, dir, nlist, trained)
    val cents = IvfCatalog.chunkCentroidsStored(spark, dir, nlist, trained)
    val codes = IvfPqCatalog.encodedChunks(spark, dir, nlist, m, ksub, trained)
    val cb = IvfPqCatalog.chunkCodebookStored(spark, dir, m, ksub, trained)

    // deterministic query sample spread across the stored id space
    val qs = store
      .filter(pmod(xxhash64(col("chunk_id")), lit(997L)) === 3L)
      .orderBy(col("chunk_id").asc).limit(nQueries)
      .select("chunk_id", "embedding").collect()
      .map(r => r.getString(0) -> r.getSeq[Float](1).toArray)
    require(qs.nonEmpty,
      s"no query vectors sampled from $dir (hash stride too sparse for this " +
        "corpus) — rerun with a larger nQueries or a bigger corpus; failing " +
        "now rather than printing NaN recall after the index builds")
    println(s"[adcgrid] ${qs.length} query vectors sampled")

    val exact: Map[String, Set[String]] = timed("exact brute-force ground truth") {
      qs.map { case (qid, qv) =>
        qid -> VectorSearch.knn(store, VectorSearch.SearchRequest(qv, limit = 10),
            idCol = "chunk_id")
          .select("chunk_id").collect().map(_.getString(0)).toSet
      }.toMap
    }

    val nprobes = sys.env.get("SPARK_GRAFT_GRID_NPROBE")
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(2, 4, 8, 16))
    val reranks = sys.env.get("SPARK_GRAFT_GRID_RERANK")
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(2, 4, 8, 16))
    for (nprobe <- nprobes) {
      // the raw-IVF probe at this nprobe is the COVERAGE ceiling: every hit
      // ADC can return lives in the probed cells, so (ceiling − adc recall)
      // is pure quantization error and (1 − ceiling) is cell miss — the
      // column that says which knob to turn
      val t0c = System.nanoTime()
      val ceil = qs.map { case (qid, qv) =>
        Similarity.ivfSearchPruned(store, cents, qv, k = 10, nprobe = nprobe,
            idCol = "chunk_id")
          .select("chunk_id").collect().map(_.getString(0)).toSet
          .intersect(exact(qid)).size / 10.0
      }
      val perQueryC = (System.nanoTime() - t0c) / 1e9 / qs.length
      println(f"[adcgrid] nprobe=$nprobe%2d RAW ceiling   " +
        f"recall@10=${ceil.sum / ceil.length}%.3f  s/query=$perQueryC%.2f")
      for (rerank <- reranks) {
        val t0 = System.nanoTime()
        val recalls = qs.map { case (qid, qv) =>
          val hits = Similarity.ivfPqSearchPruned(codes, store, cents, cb, qv,
              k = 10, nprobe = nprobe, rerankFactor = rerank, idCol = "chunk_id")
            .select("chunk_id").collect().map(_.getString(0)).toSet
          hits.intersect(exact(qid)).size / 10.0
        }
        val perQuery = (System.nanoTime() - t0) / 1e9 / qs.length
        println(f"[adcgrid] nprobe=$nprobe%2d rerank=$rerank%2d  " +
          f"recall@10=${recalls.sum / recalls.length}%.3f  s/query=$perQuery%.2f")
      }
    }
    spark.stop()
  }
}
