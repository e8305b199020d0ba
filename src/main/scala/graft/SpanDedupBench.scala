package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Sampling}

/** Scale evidence for the substring-dedup family (N47) and the mixture
  * resample (N48) at ScaleGen corpora: the batch pass (full-corpus
  * duplicated spans), the stored-counts build (the ingest path's one-time
  * corpus-shaped cost, written to parquet so the incremental leg measures
  * the REAL scan), the per-batch incremental flag (the recurring ingest
  * cost — one narrow broadcast-probed scan of the lean store, zero
  * shuffle), and the mixture resample (count pass + filtered scan).
  *
  * Usage: SpanDedupBench [corpusDir] [batchDocs]
  */
object SpanDedupBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val batchN = if (args.length > 1) args(1).toInt else 500
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.dataSizedShuffle(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
        .config("spark.ui.enabled", "false"), cpus.toInt, dir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[spanbench] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = Tables.documents(spark, dir)
    val nDocs = docs.count()
    println(s"[spanbench] corpus $dir: $nDocs docs, batch=$batchN")

    // adopt a completed store build from disk (the DecadeBench resume
    // discipline) so the incremental leg can be re-measured cheaply. The
    // path encodes batchN: the store is built DISJOINT from the batch ids,
    // so a store built for one batchN must never be reused for another —
    // ids inside the new batch range would sit in the stale store and
    // every their window would trivially reach minOcc (the degenerate
    // max-flag workload the disjointness exists to avoid)
    val storePath =
      s"/tmp/graft_span_store_${new java.io.File(dir).getName}_b$batchN"
    val reuse = sys.env.get("SPARK_GRAFT_SPAN_REUSE").contains("1") &&
      new java.io.File(s"$storePath/_SUCCESS").exists()

    // the batch docs and the store/train corpus are DISJOINT — a store
    // that contained the batch's own windows would flag every batch window
    // trivially (occ_s >= 1 for all of them) and the leg would measure a
    // degenerate max-flag workload, not the deployment semantics (the
    // ingest loop excludes the batch's own counts for exactly this reason)
    val corpus = docs.filter(col("doc_id") >= batchN)

    if (!reuse) {
      // 1. batch pass: full-corpus duplicated spans
      val nSpans = timed("full duplicateSpans")(
        Dedup.duplicateSpans(docs).count())
      println(s"[spanbench] spans=$nSpans")

      // 2. stored-counts build (one-time): written to parquet so the
      // incremental leg below scans real files, not a recomputed plan
      timed("spanGramCounts build+write")(
        Dedup.spanGramCounts(corpus).write.mode("overwrite").parquet(storePath))
    }
    val store = spark.read.parquet(storePath)
    println(s"[spanbench] store rows=${store.count()}")

    // 3. the recurring ingest cost: one micro-batch flagged against the
    // stored counts (broadcast batch digests, narrow store scan, no shuffle
    // of anything corpus-shaped). The batch is MATERIALIZED first — a real
    // ingest micro-batch arrives as its own frame; filtering it out of the
    // 3 GB corpus would bill a corpus scan to the kernel.
    val batchPath = s"$storePath.batch"
    docs.filter(col("doc_id") < batchN).write.mode("overwrite").parquet(batchPath)
    val batch = spark.read.parquet(batchPath)
    val nInc = timed(s"incremental flag ($batchN docs)")(
      Dedup.duplicateSpansIncremental(batch, store).count())
    println(s"[spanbench] incremental spans=$nInc")

    // 4. span-level decontamination: the batch docs as a benchmark-sized
    // eval set against the DISJOINT corpus — eval digests broadcast, train
    // streams gram → semi-join → merge with NO corpus-wide aggregation, so
    // this prices cheaper than the full dedup pass (self-matches excluded:
    // an eval set inside the train side would flag itself wall-to-wall)
    val nCon = timed("contaminatedSpans (batch as eval set)")(
      Dedup.contaminatedSpans(corpus, batch, k = 8).count())
    println(s"[spanbench] contaminated spans=$nCon")

    // 5. mixture resample: count pass + filtered scan
    val kept = timed("mixtureResample")(
      Sampling.mixtureResample(docs, "doc_id", "source",
        Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2)).count())
    println(s"[spanbench] mixture kept=$kept")

    spark.stop()
  }
}
