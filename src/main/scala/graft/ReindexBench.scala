package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Online blue/green reindex priced at scale (SCALE.md): the claim under
  * test is that outgrowing a frozen centroid set costs ONE assignment pass
  * over the stored embeddings (never a pipeline re-run), that deltas
  * landing mid-rebuild replay at batch cost, and that the cutover — the
  * only part that needs quiesced writers — is seconds of leased reconcile
  * plus metadata renames, not a rebuild-sized outage.
  *
  * Shape: build the chunk index at an UNDERSIZED old nlist (the decade-
  * stale state — the corpus grew under a frozen centroid set sized for a
  * tenth of it), then [[Reindex.rebuildChunkIndex]] to the √n-law nlist
  * while injecting an ingest batch between the staged build and the
  * reconcile rounds and an edit wave just before the cutover (the phase
  * seams — the deployment's racing writers, made deterministic). Prints
  * the [[Reindex.Report]] decomposition and a post-cutover probe against
  * the new generation including the mid-rebuild arrivals.
  *
  * Usage: `tools/run_main.sh graft.ReindexBench [dir [oldNlist [newNlist [nDelta]]]]`
  * — defaults: the ×1000 ScaleGen corpus, old = √n/3 (stale by a decade
  * under the √n law), new = √n, 200 delta docs per injected wave.
  * `SPARK_GRAFT_PQ=1` carries the IVFADC code table (m=48) through the
  * rebuild — the compressed-serving deployment shape. `SPARK_GRAFT_TRAINED=1`
  * builds and rebuilds the TRAINED (k-means) generation — with PQ on, that
  * is the full production serving shape end-to-end: trained centroids +
  * codes re-celled by the staged assignment (one payload join, no
  * re-encoding — the codes wall is printed separately). */
object ReindexBench {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/graft_sf100")
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
      println(f"[reindex] $what: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val nChunks = timed("chunk table (ONCE per corpus)") {
      ChunkCatalog.flatChunks(spark, dir).count()
    }
    val sqrtN = math.max(16, math.sqrt(nChunks.toDouble).toInt)
    val oldNlist = args.lift(1).map(_.toInt).filter(_ > 0).getOrElse(math.max(16, sqrtN / 3))
    val newNlist = args.lift(2).map(_.toInt).filter(_ > 0).getOrElse(sqrtN)
    val nDelta = args.lift(3).map(_.toInt).getOrElse(200)
    val pq = sys.env.get("SPARK_GRAFT_PQ").exists(v => v == "1" || v.equalsIgnoreCase("true"))
    val trained = sys.env.get("SPARK_GRAFT_TRAINED").exists(v => v == "1" || v.equalsIgnoreCase("true"))
    val (pqM, pqKsub) = (if (pq) 48 else 0, 32)
    println(s"[reindex] corpus $dir: $nChunks chunks — rebuilding nlist $oldNlist → $newNlist" +
      (if (pq) s", IVFADC m=$pqM along" else "") +
      (if (trained) ", TRAINED (k-means) mode" else "") +
      s", $nDelta docs per injected wave")

    timed(s"OLD generation build at stale nlist=$oldNlist (ONCE)") {
      IvfCatalog.assignedChunks(spark, dir, oldNlist, trained).count()
    }
    timed("docCells derivation (ONCE)") {
      DocLifecycle.docCells(spark, dir, oldNlist, trained).count()
    }
    if (pq) timed(s"OLD IVFADC code table build m=$pqM (ONCE)") {
      IvfPqCatalog.encodedChunks(spark, dir, oldNlist, pqM, pqKsub, trained).count()
    }

    def mkDocs(tag: String, from: Long): Seq[(Long, String)] =
      (0 until nDelta).map { i =>
        (from + i, (1 to 6).map(s => s"Arrival $tag ${from + i} sentence $s lands " +
          s"mid-rebuild on topic ${(i * 7 + s) % 23} with a stable vocabulary and " +
          "enough words for genuine chunks in the serving store.").mkString(" "))
      }

    val rep = Reindex.rebuildChunkIndex(spark, dir, oldNlist, newNlist,
      trained = trained, pqM = pqM, pqKsub = pqKsub,
      beforeRounds = () => timed(s"injected wave 1: $nDelta-doc ingest batch (old gen keeps serving)") {
        graft.streaming.StreamingIngest.ingestDocBatch(
          mkDocs("w1", 90000001L).toDF("doc_id", "text"), dir, oldNlist,
          trained = trained, flagNearDups = false, pqM = pqM, pqKsub = pqKsub)
      },
      beforeCutover = () => timed(s"injected wave 2: $nDelta-doc ingest + 3-doc edit (pre-lease)") {
        graft.streaming.StreamingIngest.ingestDocBatch(
          mkDocs("w2", 90100001L).toDF("doc_id", "text"), dir, oldNlist,
          trained = trained, flagNearDups = false, pqM = pqM, pqKsub = pqKsub)
        DocLifecycle.upsertDocChunks(spark, dir,
          mkDocs("w2edit", 90000001L).take(3).toDF("doc_id", "text"), oldNlist,
          trained = trained, flagNearDups = false, pqM = pqM, pqKsub = pqKsub)
      })
    println(f"[reindex] REPORT nlist ${rep.oldNlist}→${rep.newNlist}: " +
      f"base=${rep.baseRows} rows, delta=${rep.deltaRows} rows replayed, " +
      f"rounds=${rep.rounds} (+${rep.cutoverRounds} leased)")
    println(f"[reindex]   centroids=${rep.centroidSeconds}%.1f s  " +
      f"staged build=${rep.buildSeconds}%.1f s  rounds=${rep.roundsSeconds}%.1f s  " +
      f"codes=${rep.codesSeconds}%.1f s")
    println(f"[reindex]   CUTOVER (lease window — the only quiesce): ${rep.cutoverSeconds}%.1f s")

    // the new generation serves, including a mid-rebuild arrival, and the
    // probe prunes at the new nlist
    val probeText = mkDocs("w2", 90100001L).head._2
    val t0 = System.nanoTime()
    val top = pipelines.Pipelines.flagshipIvf(spark, dir,
        queryText = probeText, nlist = newNlist, trained = trained,
        nprobe = math.max(4, newNlist / 64))
      .select($"document_id").as[Long].collect()
    println(f"[reindex] probe on NEW generation: ${(System.nanoTime() - t0) / 1e9}%.1f s, " +
      s"top=${top.headOption.getOrElse(-1L)} (expect 90100001 — the wave-2 arrival)")
    spark.stop()
  }
}
