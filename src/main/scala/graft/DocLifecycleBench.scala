package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Document upsert/delete against the stored chunk index, timed at scale
  * (SCALE.md, N35): the claim under test is that "replace this document's
  * chunks" is BATCH-sized — a doc→cells index lookup plus a rewrite of only
  * the document's own cells — and never corpus-sized. Prints the one-time
  * costs (store build, docCells derivation), the per-call upsert/delete
  * latency over a handful of edited documents, and the corpus-scan
  * strawman (what finding a document's rows costs WITHOUT the secondary
  * index: a full-store filter on a non-partition column).
  *
  * Usage: `sbt "runMain graft.DocLifecycleBench [dir [nlist [nDocs [nBulk]]]]"`
  * — defaults to the ×100 ScaleGen corpus, √n-chunks cells, 3 documents
  * upserted then deleted one call each. `nBulk > 0` adds the BULK leg: one
  * upsert + one delete of nBulk documents through the join-pruned,
  * byte-batched form (bulkThreshold forced low), the 100k-re-crawl shape —
  * near-dup flagging off so the row prices the edit machinery itself (flag
  * cost is DocIngestBench's row). `SPARK_GRAFT_PQ=1` runs every leg against
  * the compressed-serving deployment: the IVFADC code table is built once
  * and each upsert/delete co-maintains it (codes-first append, scoped
  * dead-code purge) — the one path combination the other benches don't
  * price.
  */
object DocLifecycleBench {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/graft_sf10")
    val nDocs = args.lift(2).map(_.toInt).getOrElse(3)
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
      println(f"[doclife] $what: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val nChunks = timed("chunk table (ONCE per corpus)") {
      ChunkCatalog.flatChunks(spark, dir).count()
    }
    val nlist = args.lift(1).map(_.toInt).filter(_ > 0).getOrElse(
      math.max(16, math.sqrt(nChunks.toDouble).toInt))
    println(s"[doclife] corpus $dir: $nChunks chunks, nlist=$nlist, $nDocs docs per op")
    timed("chunk store build (ONCE)") {
      IvfCatalog.assignedChunks(spark, dir, nlist).count()
    }
    timed("docCells secondary index derivation (ONCE — then append-maintained)") {
      DocLifecycle.docCells(spark, dir, nlist).count()
    }
    val pq = sys.env.get("SPARK_GRAFT_PQ").exists(v => v == "1" || v.equalsIgnoreCase("true"))
    val (pqM, pqKsub) = (if (pq) 48 else 0, 32)
    if (pq) timed("IVFADC code table build (m=48, ONCE)") {
      IvfPqCatalog.encodedChunks(spark, dir, nlist, pqM, pqKsub).count()
    }

    val docs = Tables.documents(spark, dir)
    val victims = docs.orderBy($"doc_id".desc).limit(nDocs)
      .select($"doc_id", $"text").as[(Long, String)].collect()

    // the strawman: locating a document's rows WITHOUT the index is a
    // full-store scan on a non-partition column
    val ids = victims.map(_._1)
    timed(s"strawman: full-store scan for $nDocs docs' rows (no index)") {
      IvfCatalog.assignedChunks(spark, dir, nlist)
        .filter($"document_id".isin(ids: _*)).count()
    }

    victims.zipWithIndex.foreach { case ((id, text), i) =>
      val (rm, add) = timed(s"upsert doc $id (edit ${i + 1}/$nDocs)") {
        DocLifecycle.upsertDocChunks(spark, dir,
          Seq((id, s"edited pass$i $text")).toDF("doc_id", "text"), nlist,
          pqM = pqM, pqKsub = pqKsub)
      }
      println(s"[doclife]   removed=$rm added=$add")
    }
    victims.foreach { case (id, _) =>
      val rm = timed(s"delete doc $id") {
        DocLifecycle.deleteDocChunks(spark, dir, Seq(id), nlist,
          pqM = pqM, pqKsub = pqKsub)
      }
      println(s"[doclife]   removed=$rm")
    }
    println(s"[doclife] store rows after lifecycle: " +
      IvfCatalog.assignedChunks(spark, dir, nlist).count())

    // the streaming edits channel end to end: per-batch latency of the
    // production foreachBatch loop (last-revision reduce → delete route →
    // upsert route), an upsert batch then a delete batch of nDocs each
    {
      implicit val sqlCtx = spark.sqlContext
      val fresh = docs.orderBy($"doc_id".desc).limit(nDocs * 3)
        .select($"doc_id", $"text").as[(Long, String)].collect().drop(nDocs)
      val editBatches: Seq[Seq[(Long, String, String, Int)]] = Seq(
        fresh.take(nDocs).map { case (id, t) => (id, s"stream edited $t", "upsert", 1) }.toSeq,
        fresh.take(nDocs).map { case (id, _) => (id, "", "delete", 1) }.toSeq)
      val source = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String, String, Int)]
      val ckpt = java.nio.file.Files.createTempDirectory("graft_editbench_ckpt").toString
      val q = streaming.StreamingIngest.startDocEdits(
        source.toDF().toDF("doc_id", "text", "op", "seq"), dir, ckpt, nlist,
        pqM = pqM, pqKsub = pqKsub,
        onBatch = r => println(f"[doclife] edit-stream batch ${r.batchId}: " +
          f"edits=${r.edits} upserted=${r.upsertedDocs} deleted=${r.deletedDocs} " +
          f"removed=${r.removedChunks} added=${r.addedChunks} ${r.seconds}%.1f s"))
      editBatches.foreach { b => source.addData(b: _*); q.processAllAvailable() }
      q.stop()
    }

    val nBulk = args.lift(3).map(_.toInt).getOrElse(0)
    if (nBulk > 0) {
      val bulkDocs = docs.orderBy($"doc_id".asc).limit(nBulk)
        .select($"doc_id", concat(lit("bulk edited "), $"text").as("text"))
      val (brm, badd) = timed(s"BULK upsert of $nBulk docs (join pruning, byte-batched)") {
        DocLifecycle.upsertDocChunks(spark, dir, bulkDocs, nlist,
          flagNearDups = false, bulkThreshold = 1000, pqM = pqM, pqKsub = pqKsub)
      }
      println(s"[doclife]   bulk removed=$brm added=$badd")
      val bulkIds = docs.orderBy($"doc_id".asc).limit(nBulk)
        .select($"doc_id").as[Long].collect().toSeq
      val bdel = timed(s"BULK delete of $nBulk docs") {
        DocLifecycle.deleteDocChunks(spark, dir, bulkIds, nlist,
          bulkThreshold = 1000, pqM = pqM, pqKsub = pqKsub)
      }
      println(s"[doclife]   bulk removed=$bdel")
      println(s"[doclife] store rows after bulk leg: " +
        IvfCatalog.assignedChunks(spark, dir, nlist).count())
    }
    spark.stop()
  }
}
