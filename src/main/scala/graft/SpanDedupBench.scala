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
  * Round 17 adds (a) a docs-only upsample leg so the ×10000 decade corpus
  * can be generated in place (the DecadeBench corpus is text-LEAN by its
  * disk-budget rewrite, useless for substring dedup), and (b) the FOLD
  * legs: the incremental flag measured against a fragmented multi-part
  * count log, the in-place generational fold ([[streaming.SpanDedupIngest
  * .foldLogInLoop]]), and the same flag against the folded log — the
  * degradation-and-repair cycle the in-loop fold cadence exists for.
  *
  * Usage: SpanDedupBench [corpusDir] [batchDocs] [factor] [srcDir]
  *   factor > 0: if corpusDir/documents.parquet is missing, build the
  *   docs-only ×factor upsample from srcDir (default sf0.1) first.
  */
object SpanDedupBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val batchN = if (args.length > 1) args(1).toInt else 500
    val factor = if (args.length > 2) args(2).toInt else 0
    val srcDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
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

    // SPARK_GRAFT_SPAN_DUPFRAC=<0..1> switches the docs-only upsample to
    // ScaleGen's SURVIVOR-MODE mutation (partial duplication): dupFrac of
    // replicas carry a scrubbable contiguous region, the rest are clean —
    // the knob the curation leg's nonzero-survivor requirement tracks.
    // Unset = the original all-near-copy fixture (comparable to prior
    // rounds' numbers).
    val dupFrac = sys.env.get("SPARK_GRAFT_SPAN_DUPFRAC").map(_.toDouble)
    val keepFrac = sys.env.get("SPARK_GRAFT_SPAN_KEEPFRAC")
      .map(_.toDouble).getOrElse(0.7)
    dupFrac.foreach(f => require(f >= 0.0 && f <= 1.0, s"dupFrac out of range: $f"))

    // docs-only upsample on demand (ScaleGen's exact mutation kernel —
    // the DecadeBench corpus block, minus the events/embeddings nobody
    // here reads and minus the text-lean rewrite that would empty it)
    val docsPath = s"$dir/documents.parquet"
    val dfs = new org.apache.hadoop.fs.Path(docsPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (factor > 0 && !dfs.exists(new org.apache.hadoop.fs.Path(docsPath))) {
      timed(s"docs-only upsample x$factor ($srcDir -> $docsPath)") {
        val src = Tables.documents(spark, srcDir)
        val docStride = src.agg(max(col("doc_id"))).head.getLong(0) + 1
        val vocab = src
          .select(explode(operators.TextSearch.tokens(col("text"))).as("w"))
          .groupBy(col("w")).count()
          .orderBy(col("count").desc, col("w").asc).limit(20000)
          .collect().map(_.getString(0))
        val vocabB = spark.sparkContext.broadcast(vocab)
        val dupFracLocal = dupFrac
        val keepFracLocal = keepFrac
        val mutateUdf = udf { (text: String, docId: Long, rep: Int) =>
          if (rep == 0) text
          else if (ScaleGen.plantedDoc(docId, rep))
            ScaleGen.mutateText(text, docId, rep, 0.02, vocabB.value)
          else dupFracLocal match {
            case Some(f) =>
              ScaleGen.mutateTextSurvivor(text, docId, rep, f, keepFracLocal)
            case None =>
              ScaleGen.mutateText(text, docId, rep, 0.35, vocabB.value)
          }
        }
        val reps = spark.range(factor).repartition(cpus.toInt * 8)
          .select(col("id").cast("int").as("rep"))
        reps.crossJoin(broadcast(src))
          .withColumn("text", mutateUdf(col("text"), col("doc_id"), col("rep")))
          .select((col("doc_id") + col("rep").cast("long") * docStride).as("doc_id"),
            col("text"), col("lang"), col("source"),
            length(col("text")).cast("long").as("n_chars"))
          .write.mode("overwrite").parquet(docsPath)
      }
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

    // The batch is MATERIALIZED first — a real ingest micro-batch arrives
    // as its own frame; filtering it out of the 3 GB corpus would bill a
    // corpus scan to the kernel. (Outside the store legs: the decon and
    // curation legs read it too.)
    val batchPath = s"$storePath.batch"
    docs.filter(col("doc_id") < batchN).write.mode("overwrite").parquet(batchPath)
    val batch = spark.read.parquet(batchPath)

    // SPARK_GRAFT_SPAN_STORE=0 skips the stored-counts legs (1-3b): on a
    // REALISTIC-duplication corpus (the survivor fixture) the gram-count
    // store is corpus-shaped — ~1.6B DISTINCT digests at ×10000 where the
    // all-near-copy fixture collapses to 28.6M — and its build shuffle is
    // exactly the monolithic footprint the sliced pass exists to avoid.
    // The incremental-flag decade numbers stand on the near-copy fixture
    // (SCALE.md round-18); a production store at this shape is the
    // append-only LOG the ingest loop maintains incrementally, never a
    // one-shot groupBy of the whole corpus.
    if (!sys.env.get("SPARK_GRAFT_SPAN_STORE").contains("0")) {
      if (!reuse) {
        // 1. stored-counts build (one-time): written to parquet so the
        // incremental leg below scans real files, not a recomputed plan.
        // Runs FIRST (r17 reorder): the batch-shaped legs are the scale
        // claim under test, and the full corpus pass — the most
        // shuffle-hungry leg — must not be able to take them down with an
        // out-of-disk at the decade; it runs last, skippable.
        timed("spanGramCounts build+write")(
          Dedup.spanGramCounts(corpus).write.mode("overwrite").parquet(storePath))
      }
      val store = spark.read.parquet(storePath)
      println(s"[spanbench] store rows=${store.count()}")

      // 3. the recurring ingest cost: one micro-batch flagged against the
      // stored counts (broadcast batch digests, narrow store scan, no
      // shuffle of anything corpus-shaped).
      val nInc = timed(s"incremental flag ($batchN docs)")(
        Dedup.duplicateSpansIncremental(batch, store).count())
      println(s"[spanbench] incremental spans=$nInc")

      // 3b. the ingest-log LIFECYCLE: the same counts as a fragmented
      // append-only log (digests hash-split into 24 `batch=` parts — the
      // state a running loop reaches between folds), the per-batch flag
      // against it, the in-place generational fold
      // (SpanDedupIngest.foldLogInLoop — the r17 maintenance move), and the
      // flag again. Prices the degradation the fold cadence repairs and the
      // fold itself, at this corpus's log size; flag results must be
      // identical in all three shapes (summed-threshold contract).
      val logDir = s"$storePath.log"
      val logFs = new org.apache.hadoop.fs.Path(logDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      logFs.delete(new org.apache.hadoop.fs.Path(logDir), true)
      timed("fragmented log write (24 parts)")(
        store.withColumn("batch", pmod(xxhash64(col("h")), lit(24L)))
          .write.mode("overwrite").partitionBy("batch").parquet(logDir))
      import graft.streaming.SpanDedupIngest
      val nFrag = timed("incremental flag vs 24-part log")(
        Dedup.duplicateSpansIncremental(batch,
          SpanDedupIngest.readLog(spark, logDir)).count())
      timed("foldLogInLoop (in-place generational fold)")(
        SpanDedupIngest.foldLogInLoop(spark, logDir))
      val nFold = timed("incremental flag vs folded log")(
        Dedup.duplicateSpansIncremental(batch,
          SpanDedupIngest.readLog(spark, logDir)).count())
      require(nFrag == nInc && nFold == nInc,
        s"flag parity across log shapes broke: $nInc/$nFrag/$nFold")
      logFs.delete(new org.apache.hadoop.fs.Path(logDir), true) // disk back
    }

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

    // 5b. encoding A/B for the DECON leg, paired and interleaved
    // (SPARK_GRAFT_SPAN_AB=N runs N binary/hex pairs): round 17 measured
    // ×10000 contaminatedSpans at 314 s on hex digests but 436 s on
    // binary in UNPAIRED runs and blamed page cache without evidence.
    // Both legs here are the same code — gram kernel → broadcast distinct
    // eval digests → left-semi flagged-window count — differing ONLY in
    // the digest encoding, run back-to-back on the same cache state, so
    // the pair differences measure the encoding and nothing else. (The
    // per-doc merge is excluded: it runs on flag-sized data and is
    // encoding-independent.) The hex twin exists only here, as the
    // measurement control — the engine stores binary.
    val abPairs = sys.env.get("SPARK_GRAFT_SPAN_AB").map(_.toInt).getOrElse(0)
    if (abPairs > 0) {
      val binUdf = udf((t: String) => Dedup.spanDigestsScala(t, 8))
      val hexUdf = udf((t: String) => { // HexFormat is not Serializable
        val f = java.util.HexFormat.of()
        Dedup.spanDigestsScala(t, 8).map(f.formatHex)
      })
      def grams(df: org.apache.spark.sql.DataFrame, hex: Boolean) = {
        val d = if (hex) hexUdf else binUdf
        df.select(col("doc_id"), posexplode(d(col("text"))).as(Seq("pos0", "h")))
      }
      def leg(hex: Boolean): Long =
        grams(corpus, hex)
          .join(broadcast(grams(batch, hex).select(col("h")).distinct()),
            Seq("h"), "left_semi")
          .count()
      (1 to abPairs).foreach { i =>
        val nB = timed(s"decon A/B pair $i: binary")(leg(hex = false))
        val nH = timed(s"decon A/B pair $i: hex")(leg(hex = true))
        require(nB == nH, s"encoding changed the flag set: $nB vs $nH")
      }
    }

    // background disk monitor for the corpus-shaped legs: samples the
    // filesystem the corpus lives on and reports the LOW-water mark of
    // free bytes — the number the disk-budget claims are graded on
    def withDiskLowWater[T](f: => T): (T, Double) =
      GraftSession.withDiskLowWater(dir)(f)

    // 6. full-corpus pass (see the build-order note above): two shuffles
    // of the lean (id, pos, digest) table — corpus-shaped by nature, like
    // the suffix array it replaces. SPARK_GRAFT_SPAN_FULL=0 skips it when
    // the sandbox disk cannot hold the decade's monolithic shuffle.
    var nSpansFull = -1L
    if (!sys.env.get("SPARK_GRAFT_SPAN_FULL").contains("0")) {
      val (n, low) = withDiskLowWater(timed("full duplicateSpans")(
        Dedup.duplicateSpans(docs).count()))
      nSpansFull = n
      println(f"[spanbench] spans=$nSpansFull (disk low-water $low%.1f GB free)")
    }

    // 6b. the SLICED full pass (SPARK_GRAFT_SPAN_SLICES=S, or `auto` to
    // let the engine size S from the measured disk budget): the bounded-
    // disk form — S sequential passes each shuffling 1/S of the gram
    // table (Dedup.duplicateSpansSliced). Runs LAST of all: it is the
    // most expensive leg even though its footprint is bounded. Span-count
    // parity against the monolithic pass is asserted when both legs ran.
    val slices = sys.env.get("SPARK_GRAFT_SPAN_SLICES") match {
      case Some("auto") =>
        val nWin = timed("spanWindowCount (sizing scan)")(
          Dedup.spanWindowCount(docs))
        val gramBytes = Dedup.estimatedSpanGramBytes(nWin)
        val usable = new java.io.File(dir).getUsableSpace
        val s = Dedup.recommendedSpanSlices(gramBytes, usable)
        println(f"[spanbench] auto slices: $nWin windows ~ " +
          f"${gramBytes / 1e9}%.1f GB gram shuffle, " +
          f"${usable / 1e9}%.1f GB usable -> S=$s")
        s
      case Some(v) => v.toInt
      case None => 0
    }
    if (slices > 0) {
      val scratch = s"$storePath.slices"
      var spansDf: org.apache.spark.sql.DataFrame = null
      val (nSliced, low) = withDiskLowWater(
        timed(s"sliced duplicateSpans (S=$slices)") {
          spansDf = Dedup.duplicateSpansSliced(docs, scratch, slices)
          spansDf.count()
        })
      println(f"[spanbench] sliced spans=$nSliced (disk low-water $low%.1f GB free)")
      if (nSpansFull >= 0)
        require(nSliced == nSpansFull,
          s"sliced pass diverged from monolithic: $nSliced vs $nSpansFull")

      // 6c. the FULL curation chain at scale (SPARK_GRAFT_SPAN_CURATION=1):
      // pipe_curation_full's dataflow composed with the SLICED span pass —
      // span scrub → exact-survivor dedup on the scrubbed text → quality
      // gate → span decon vs the held-out batch (k=8) → source-mixture
      // resample → 80/10/10 split → 2048-token packing on REAL frozen-BPE
      // counts. The oracle-checked sf-scale flagship pins semantics; this
      // leg prices the composition where it matters, with the one-time
      // pass in its bounded form. (Exact dedup stands in for the stored
      // cluster catalog — no embedding index exists at this corpus, and
      // the catalog join it replaces is cheaper than this stage.)
      if (sys.env.get("SPARK_GRAFT_SPAN_CURATION").contains("1")) {
        import graft.functions.TextFunctions.qualityScore
        val spans = spansDf.localCheckpoint(true) // merge once, spans are flag-sized
        val scrubbedGated = timed("curation: scrub + exact survivors + quality gate") {
          val scrubbed = Dedup.scrubSpans(docs, spans)
          val base = docs.join(scrubbed, Seq("doc_id"), "left")
            .select(col("doc_id"), col("source"), col("lang"),
              coalesce(col("scrubbed_text"), col("text")).as("text"))
          val g = Dedup.dropExactDuplicates(base)
            .filter(qualityScore(col("text"), lit(null).cast("string"),
              lit(null).cast("string")) >= 0.25)
            .localCheckpoint(true) // scanned by decon, mixture count AND filter
          println(s"[spanbench] curation survivors=${g.count()}")
          g
        }
        // sanity tie to the mutation knob: under the survivor fixture the
        // CLEAN half's survivor count is EXACTLY predictable — a clean
        // replica scores exactly like its base under the gate (the
        // survivor-mode mutation preserves every count the score reads),
        // is never span-flagged (max unchanged run = 3 < k) and never an
        // exact duplicate (replica-unique filler) — so expected clean
        // survivors = Σ over gate-passing bases of their clean replica
        // count. Scrubbed survivors (the partial-scrub regime this
        // fixture exists to exercise) come ON TOP and are reported.
        dupFrac.foreach { f =>
          val nSurv = scrubbedGated.count()
          require(nSurv > 0,
            s"survivor fixture (dupFrac=$f keepFrac=$keepFrac) still " +
              "annihilated under the scrub — the knob is not doing its job")
          val stride = Tables.documents(spark, srcDir)
            .agg(max(col("doc_id"))).head.getLong(0) + 1
          val reps = (nDocs / stride).toInt
          val passBases = Tables.documents(spark, srcDir)
            .filter(qualityScore(col("text"), lit(null).cast("string"),
              lit(null).cast("string")) >= 0.25)
            .select(col("doc_id")).collect().map(_.getLong(0))
          val expectedClean = passBases.iterator.map { base =>
            (1 until reps).count(r =>
              !ScaleGen.plantedDoc(base, r) && !ScaleGen.dupReplica(base, r, f)).toLong
          }.sum
          val isClean = udf((id: Long) => {
            val rep = (id / stride).toInt; val base = id % stride
            rep > 0 && !ScaleGen.plantedDoc(base, rep) &&
              !ScaleGen.dupReplica(base, rep, f)
          })
          val nClean = scrubbedGated.filter(isClean(col("doc_id"))).count()
          println(s"[spanbench] curation survivor split: clean=$nClean " +
            s"(expected $expectedClean from ${passBases.length} passing " +
            s"bases x clean-replica count), partial-scrub=${nSurv - nClean}")
          require(nClean == expectedClean,
            s"clean survivors $nClean != expected $expectedClean — the " +
              "survivor fixture's gate-equivalence invariant broke")
        }
        // the DEFAULT ×N upsample makes every doc a near-copy, so the
        // Lee-et-al scrub CORRECTLY annihilates that fixture (wall-to-wall
        // spans → empty texts → quality-gated out). That is the right
        // answer for such a corpus, but it starves the downstream stages —
        // price them on the unscrubbed corpus instead so the
        // decon/mixture/pack costs are measured at full width, and say so.
        // (Unreachable under the survivor knob, which requires nonzero
        // survivors above.)
        val gated =
          if (!scrubbedGated.isEmpty) scrubbedGated
          else {
            println("[spanbench] curation: scrub annihilated the upsampled " +
              "fixture (every doc is a rep) — pricing the remaining stages " +
              "on the unscrubbed corpus")
            docs.select(col("doc_id"), col("source"), col("lang"), col("text"))
          }
        val packed = timed("curation: decon + mixture + split + BPE pack") {
          val dirty = Dedup.contaminatedSpans(
              gated.select(col("doc_id"), col("text")), batch, k = 8)
            .select(col("doc_id")).distinct().localCheckpoint(true)
          val clean = gated.join(dirty, Seq("doc_id"), "left_anti")
          val mixed = Sampling.mixtureResample(clean, "doc_id", "source",
              Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2))
            .withColumn("split", Sampling.splitColumn(col("doc_id"),
              Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)))
            .select(col("doc_id"), col("source"), col("lang"), col("split"),
              operators.Bpe.tokenCount(col("text"), operators.Bpe.frozen)
                .as("n_tokens"))
            .withColumn("shard", concat_ws("#", col("split"), col("source"),
              pmod(Sampling.hashBucket(col("doc_id"), "pack"), lit(32L))
                .cast("string")))
          Sampling.packSequences(mixed, col("n_tokens"), budget = 2048,
            shardCol = "shard", idCol = "doc_id").count()
        }
        println(s"[spanbench] curation manifest rows=$packed")
      }

      // 6d. scrub-in-place (SPARK_GRAFT_SPAN_SCRUB_STORE=1): the N47→S9
      // composition priced at scale — build the stored chunk index for
      // THIS corpus, then remediate every flagged document through
      // DocLifecycle.scrubSpansInStore (the bulk-capable upsert route,
      // rebuild-equivalence spec-pinned in DocLifecycleSpec). Reuses the
      // sliced pass's span table — exactly how a decade deployment would
      // compose the two. The store build is a one-time cost, printed
      // separately from the remediation edit it exists to price.
      if (sys.env.get("SPARK_GRAFT_SPAN_SCRUB_STORE").contains("1")) {
        val nChunks = timed("scrub-store: chunk table (one-time)")(
          ChunkCatalog.flatChunks(spark, dir).count())
        val nlist = sys.env.get("SPARK_GRAFT_SPAN_NLIST").map(_.toInt)
          .getOrElse(math.max(16, math.sqrt(nChunks.toDouble).toInt))
        timed(s"scrub-store: chunk index build (one-time, nlist=$nlist)")(
          IvfCatalog.assignedChunks(spark, dir, nlist).count())
        timed("scrub-store: docCells index (one-time)")(
          DocLifecycle.docCells(spark, dir, nlist).count())
        val spans = spansDf.localCheckpoint(true) // flag-sized
        val ((nScrubbed, removed, added), low) =
          GraftSession.withDiskLowWater(dir)(
            timed("scrub-store: scrubSpansInStore (flag-sized bulk edit)")(
              DocLifecycle.scrubSpansInStore(spark, dir, docs, spans, nlist)))
        println(f"[spanbench] scrub-store: docs=$nScrubbed removed=$removed " +
          f"added=$added chunks (disk low-water $low%.1f GB free)")
      }
      new org.apache.hadoop.fs.Path(scratch)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(scratch), true) // disk back
    }

    spark.stop()
  }
}
