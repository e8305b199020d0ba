package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Online blue/green rebuild of the chunk serving index — store + IVFADC
  * code table + doc→cells — at a NEW nlist / centroid set, while the
  * ingest and edit loops keep writing the old generation.
  *
  * Why it exists: the stored IVF index freezes its centroids at build time
  * (the assignment is only meaningful against the exact centroids that
  * made it, [[IvfCatalog.chunkCentroidsStored]]), and the nlist law
  * (SCALE.md round-7: nlist ≈ max(√n, n/cell_cap)) scales with corpus
  * size. A corpus that grows a decade under continuous ingest therefore
  * outgrows its frozen centroid set — cells fatten toward corpus-shaped
  * and probe cost degrades with cell size instead of nprobe/nlist. Every
  * other maintenance operation here is batch-shaped; this is the one that
  * ages by corpus decade, and doing it as "drop + rebuild from source"
  * would take the index offline for the full build AND re-run the chunk /
  * embed pipeline the store already paid for.
  *
  * Shape (the staged-sibling / delta-replay / metadata-swap pattern of
  * [[Compaction.compactBucketed]] and [[DocLifecycle.compactDocCells]],
  * scaled up to a four-table generation):
  *
  *  1. '''Stage centroids''': derive the new-generation centroid table
  *     from the CURRENT old store's embeddings (k-means in trained mode,
  *     the hash-seeded sample otherwise) into a `__rstage`-suffixed
  *     sibling. Sampling drift from writes landing mid-derivation is
  *     harmless — assignment uses the frozen result, same contract as any
  *     build.
  *  2. '''Stage the store''': fingerprint-snapshot the old store's
  *     partition files ([[Compaction.fileFingerprint]] — the append log IS
  *     the store, so the snapshot doubles as the replay cursor), read
  *     exactly those files by path (immune to stale cached listings),
  *     re-assign every row to the new centroids, and clusterWrite the
  *     staged store `partitionBy(centroid_id)`. No re-chunking, no
  *     re-embedding — the rebuild reuses the stored embeddings, which is
  *     why it costs an assignment pass, not a pipeline run.
  *  3. '''Delta rounds''' (unleased — loops keep writing): re-fingerprint,
  *     and for every changed old cell reconcile the staged store: remove
  *     staged rows whose OLD-centroid assignment falls in a changed cell
  *     (recomputed from the embedding — assignment is deterministic, so
  *     this identifies exactly the rows that came from those cells,
  *     catching deletes and edits, not just appends), then add the cells'
  *     CURRENT rows re-assigned to the new centroids. Repeat until a round
  *     sees no change (or `maxRounds`). The staged cells each round
  *     touches are found through a doc-level old↔new cell map (see
  *     "removal soundness" below) — bounded by nlist, never corpus-shaped.
  *  4. '''Stage codes + doc→cells''': the IVFADC code table re-cells by a
  *     plain join of the CURRENT old code table with the staged store's
  *     (chunk_id → new centroid_id) — codes are cell-independent payload,
  *     the codebook ([[IvfPqCatalog.chunkCodebookStored]]) is
  *     nlist-independent and carried over, so no re-encoding either. The
  *     doc→cells index derives from the staged store
  *     ([[DocLifecycle.rebuildDocCells]]'s one shape).
  *  5. '''Cutover''' (holding the OLD store's [[MaintenanceLease]], so
  *     edits and compaction are excluded by mechanism): run final
  *     reconcile rounds — now also patching the staged code table and
  *     appending doc→cells pairs — until a diff comes back empty, then
  *     swap each staged table to its natural new-generation name. The
  *     swap is rename-ASIDE then rename-IN (all metadata ops): a live
  *     natural table is first renamed to a `__retired`-suffixed sibling,
  *     the staged table renamed into the natural name, and the retired
  *     copies dropped only after EVERY member of the generation landed —
  *     so at no instant is the staged table the only copy of anything,
  *     and a kill between any two renames leaves both the old data
  *     (under `__retired`) and the new (under `__rstage`/natural). A diff
  *     that will not quiesce fails loudly: ingest APPENDS do not take the
  *     lease (ingest never blocks on maintenance), so the operator pauses
  *     the append loop for the seconds the cutover needs, exactly the
  *     quiesce the compaction commit window asks for.
  *
  * '''Removal soundness.''' Step 3's removal must find which STAGED cells
  * can hold rows that came from a changed old cell, without scanning the
  * staged corpus. The live doc→cells index cannot answer this on its own:
  * its cadence rebuild reclaims pairs of deleted rows, which could drop
  * the very (doc, old cell) edge a later round needs. The rebuild
  * therefore keeps a PRIVATE append-only pair log: a frozen copy of the
  * old index taken at snapshot time (covers every phase-2 row, superset
  * contract) extended each round with the reconciled rows' (doc, old
  * cell) pairs (covers every row a round adds). Staged-side pairs
  * accumulate in the staged doc→cells the same way. Joining the two on
  * document_id maps changed old cells → candidate staged cells; false
  * positives cost a pruned read, a miss is impossible by construction.
  *
  * '''Generations and retargeting.''' With `newNlist != oldNlist` the new
  * generation lives under its own natural names: the old generation keeps
  * serving until the cutover completes, probes/loops retarget by passing
  * `newNlist` (the serving configuration is (dir, nlist, trained) — that
  * pair IS the blue/green switch), and [[dropChunkGeneration]] reclaims
  * the old tables once nothing reads them. With `newNlist == oldNlist`
  * (a same-shape re-centroid, e.g. seeded→retrained drift repair) the
  * swap REPLACES the live generation in place: readers must be quiet for
  * the four renames — metadata-width, but a probe interleaving them could
  * pair new centroids with the old store and prune wrong cells, which no
  * fail-loud contract catches.
  *
  * '''Crash recovery.''' All staged tables carry `__rstage` in their
  * names: a JVM kill mid-rebuild leaves them for
  * [[TableStore.sweepOrphans]]' age-gated sweep, and the old generation
  * is untouched (nothing mutates it before the cutover's renames). A LIVE
  * rebuild's staging is protected from the cadence sweep by a per-nonce
  * heartbeat ([[TableStore.touchHeartbeat]], touched every phase and
  * reconcile round) — a base pass outliving the sweep horizon must not
  * lose its write-once staged centroid table. A kill mid-CUTOVER leaves
  * natural names absent with the old copy under `__retired` (and the new
  * under `__rstage` or already landed): the sweep refuses any marked
  * table whose natural sibling is missing, whatever its age, and
  * re-running the rebuild heals first ([[healInterruptedSwap]] — restores
  * the complete retired generation, dropping any partial new-generation
  * pieces, which are re-stageable by construction) before staging afresh.
  */
object Reindex {

  /** What the rebuild did: `baseRows` re-assigned at the snapshot,
    * `deltaRows` replayed across all reconcile rounds, and the wall-clock
    * split — `cutoverSeconds` is the part that needs quiesced writers
    * (the lease window: final diffs + reconcile + four renames). */
  case class Report(oldNlist: Int, newNlist: Int,
                    baseRows: Long, deltaRows: Long,
                    rounds: Int, cutoverRounds: Int,
                    centroidSeconds: Double, buildSeconds: Double,
                    roundsSeconds: Double, codesSeconds: Double,
                    cutoverSeconds: Double)

  private type Fp = Map[String, Set[(String, Long)]]

  private def tableRoot(spark: SparkSession, name: String) = {
    val meta = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(name))
    new org.apache.hadoop.fs.Path(meta.location)
  }

  /** Current fingerprint of EVERY partition of `name` — the diff unit.
    * Unlike a fixed-spec fingerprint, re-lists the partition dirs first, so
    * cells appended into existence (and dirs dropped by emptied-cell
    * partition drops) show up as changes. */
  private def fingerprintAll(spark: SparkSession, name: String): Fp = {
    val root = tableRoot(spark, name)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val specs = Compaction.partitionStats(spark, name).map(_.spec)
    Compaction.fileFingerprint(fs, root, specs)
  }

  /** Old cells whose files changed between two fingerprints (either
    * direction — appended, rewritten, emptied, or newly created). */
  private def changedCells(prev: Fp, cur: Fp): Seq[Long] =
    (prev.keySet ++ cur.keySet).toSeq
      .filter(s => prev.getOrElse(s, Set.empty) != cur.getOrElse(s, Set.empty))
      .map(_.split("=", 2)(1).toLong).sorted

  /** The CURRENT rows of `cells` in the old store, read from exactly the
    * fingerprint's files by path (the spill discipline of
    * [[Compaction.compactTable]]): the rows this fingerprint state vouches
    * for, immune to the session's cached listing. */
  private def readCells(spark: SparkSession, name: String, fp: Fp,
                        cells: Seq[Long]): DataFrame = {
    val root = tableRoot(spark, name)
    val schema = spark.table(name).schema
    val files = cells.flatMap { c =>
      val spec = s"centroid_id=$c"
      fp.getOrElse(spec, Set.empty).map { case (fname, _) =>
        new org.apache.hadoop.fs.Path(
          new org.apache.hadoop.fs.Path(root, spec), fname).toString }
    }
    if (files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else {
      val dataSchema = org.apache.spark.sql.types.StructType(
        schema.fields.filterNot(_.name == "centroid_id"))
      spark.read.schema(dataSchema)
        .option("basePath", root.toString)
        .parquet(files: _*)
        .withColumn("centroid_id",
          col("centroid_id").cast(schema("centroid_id").dataType))
    }
  }

  /** Append `pairs` (document_id, centroid_id) into a bucketed pair table —
    * [[DocLifecycle.appendDocCells]]'s write shape, on a private staged
    * table (no lock needed: nothing else writes it). */
  private def appendPairs(spark: SparkSession, table: String, pairs: DataFrame): Unit =
    pairs.select(col("document_id"), col("centroid_id")).distinct()
      .repartition(32, col("document_id"))
      .write.mode("append")
      .bucketBy(32, "document_id").sortBy("document_id")
      .format("parquet").saveAsTable(table)

  /** Restore generations whose cutover crashed between renames. A
    * `<natural>__retired<nonce>` table with its natural name ABSENT is the
    * signature: the swap renamed the live table aside and died before the
    * staged one landed. Healing restores the COMPLETE retired generation
    * of that nonce — including members whose natural slot a partial swap
    * already filled with new-generation data (a mixed generation would
    * pair new centroids with an old store and prune wrong cells), which
    * are dropped; they are re-stageable by construction. A nonce whose
    * every natural survived (crash after the last rename, before
    * reclaim) has redundant copies — those are dropped. Nonces heal in
    * order, newest last, so the most recent serving generation wins.
    * No-op when nothing is broken. */
  private[graft] def healInterruptedSwap(spark: SparkSession,
                                         naturals: Seq[String],
                                         partitioned: Set[String]): Unit = {
    val lcNaturals = naturals.map(_.toLowerCase(java.util.Locale.ROOT))
    val lcPartitioned = partitioned.map(_.toLowerCase(java.util.Locale.ROOT))
    val retired = spark.sessionState.catalog.listTables("default")
      .map(_.table).flatMap { t =>
        val i = t.indexOf("__retired")
        if (i <= 0) None
        else {
          val natural = t.substring(0, i)
          if (lcNaturals.contains(natural)) Some((t.substring(i + 9), natural, t))
          else None
        }
      }
    retired.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (_, group) =>
      val broken = group.exists { case (_, natural, _) =>
        !spark.catalog.tableExists(natural) }
      group.foreach { case (_, natural, aside) =>
        if (broken) {
          if (spark.catalog.tableExists(natural))
            spark.sql(s"DROP TABLE IF EXISTS $natural") // partial new-gen piece
          spark.sql(s"ALTER TABLE $aside RENAME TO $natural")
          if (lcPartitioned.contains(natural))
            spark.sql(s"ALTER TABLE $natural RECOVER PARTITIONS")
          spark.catalog.refreshTable(natural)
        } else spark.sql(s"DROP TABLE IF EXISTS $aside") // swap completed — redundant
      }
    }
  }

  /** Rebuild the chunk serving index for `dir` from `oldNlist` (and its
    * frozen centroids) to `newNlist` with freshly derived centroids, blue/
    * green. `pqM > 0` carries the IVFADC code table into the new
    * generation (the codebook is nlist-independent and reused). Returns a
    * [[Report]]; the new generation is live under its natural
    * (dir, newNlist, trained) names when this returns.
    *
    * `beforeRounds` / `beforeCutover` / `beforeSwap` are the race spec's
    * injection seams: after the staged build (before the first reconcile
    * round), after codes+pairs staging (before the lease), and INSIDE the
    * lease after the final diff converges (before the renames — note it
    * runs on the rebuild's own thread, where the lease is reentrant; a
    * concurrent writer belongs on another thread). `duringSwap(natural)`
    * is the crash spec's seam: invoked per table AFTER its live copy is
    * renamed aside and BEFORE the staged one renames in — a throw there
    * is the mid-cutover kill. */
  def rebuildChunkIndex(spark: SparkSession, dir: String,
                        oldNlist: Int, newNlist: Int,
                        trained: Boolean = false,
                        pqM: Int = 0, pqKsub: Int = 32,
                        maxRounds: Int = 8,
                        maxBatchBytes: Long = 4L << 30,
                        beforeRounds: () => Unit = () => (),
                        beforeCutover: () => Unit = () => (),
                        beforeSwap: () => Unit = () => (),
                        duringSwap: String => Unit = _ => ()): Report = {
    val oldStore = IvfCatalog.chunkStoreName(dir, oldNlist, trained)
    val oldCents = IvfCatalog.chunkCentroidsName(dir, oldNlist, trained)
    val oldDc = DocLifecycle.docCellsName(dir, oldNlist, trained)
    val newStore = IvfCatalog.chunkStoreName(dir, newNlist, trained)
    val newCents = IvfCatalog.chunkCentroidsName(dir, newNlist, trained)
    val newDc = DocLifecycle.docCellsName(dir, newNlist, trained)
    val nonce = System.nanoTime()
    val stStore = s"${newStore}__rstage$nonce"
    val stCents = s"${newCents}__rstage$nonce"
    val stDc = s"${newDc}__rstage$nonce"
    val stOldPairs = s"${oldDc}__rstage${nonce}_oldpairs"
    val cb = if (pqM > 0) Some(IvfPqCatalog.chunkCodebookStored(spark, dir, pqM, pqKsub, trained))
             else None
    val oldCodes = cb.map(IvfPqCatalog.chunkCodesName(dir, oldNlist, pqM, pqKsub, trained, _))
    val newCodes = cb.map(IvfPqCatalog.chunkCodesName(dir, newNlist, pqM, pqKsub, trained, _))
    val stCodes = newCodes.map(n => s"${n}__rstage$nonce")
    // a previously interrupted cutover (kill between renames) left natural
    // names absent with the generation's copies under __retired: restore
    // the old generation FIRST, so the require below sees a serving index
    // and the fresh staging starts from consistent state
    healInterruptedSwap(spark,
      (Seq(oldStore, oldCents, oldDc, newStore, newCents, newDc) ++
        oldCodes.toSeq ++ newCodes.toSeq).distinct,
      Set(oldStore, newStore) ++ oldCodes.toSeq ++ newCodes.toSeq)
    require(spark.catalog.tableExists(oldStore),
      s"stored chunk IVF index for '$dir' at nlist=$oldNlist not built — nothing to rebuild")
    oldCodes.foreach(n => require(spark.catalog.tableExists(n),
      s"pqM=$pqM but the old generation has no code table $n — build encodedChunks first"))

    val schema = spark.table(oldStore).schema
    val storeCols = schema.fieldNames.toIndexedSeq
    var deltaRows = 0L
    var renamed = false

    // liveness heartbeat for the sweep: the staged centroid table is
    // written ONCE in phase 1 and never touched again, so a base pass
    // outliving the sweep horizon would age it past deletion while still
    // referenced — the per-nonce heartbeat stays young for the rebuild's
    // whole life, whatever any single phase costs (a daemon toucher, not
    // per-round touches, so a multi-hour assignment pass is covered too)
    TableStore.touchHeartbeat(spark, nonce)
    val hbThread = new Thread(() => {
      try {
        while (!Thread.currentThread().isInterrupted) {
          Thread.sleep(60 * 1000L)
          TableStore.touchHeartbeat(spark, nonce)
        }
      } catch { case _: InterruptedException => () }
    })
    hbThread.setDaemon(true)
    hbThread.setName(s"graft-reindex-hb-$nonce")
    hbThread.start()

    // reconcile the staged store (and, once staged, the code table) to the
    // current state of `cells` in the old generation: remove staged rows
    // that CAME from those cells (identified by re-deriving their
    // old-centroid assignment — deterministic, so exact), add the cells'
    // current rows under the new assignment, log both pair sides
    def reconcile(fp: Fp, cells: Seq[Long], withCodes: Boolean): Unit = {
      if (cells.isEmpty) return
      val oldCentTbl = IvfCatalog.chunkCentroidsStored(spark, dir, oldNlist, trained)
      val newCentTbl = spark.table(stCents)
      // current rows of the changed old cells, re-assigned to new centroids
      val incoming = Similarity.ivfAssign(
          readCells(spark, oldStore, fp, cells).withColumnRenamed("centroid_id", "__old_cid"),
          newCentTbl, idCol = "chunk_id")
        .localCheckpoint(true) // pinned: reads old-store files a racing edit may rewrite
      deltaRows += incoming.count()
      // pair logs FIRST (never-miss ordering, same as every append path)
      appendPairs(spark, stOldPairs,
        incoming.select(col("document_id"), col("__old_cid").as("centroid_id")))
      appendPairs(spark, stDc, incoming.select(col("document_id"), col("centroid_id")))
      // candidate staged cells: every new cell any doc that EVER had rows in
      // a changed old cell maps to (private pair log join — superset, see
      // object scaladoc) ∪ the incoming rows' own new cells. isInCollection
      // (InSet past the conversion threshold) keeps the filters codegen'd
      // and pushable — a closure UDF would block both
      val inCells = col("centroid_id").isInCollection(cells)
      val mappedCells = spark.table(stOldPairs)
        .filter(inCells).select("document_id").distinct()
        .join(spark.table(stDc), "document_id")
        .select("centroid_id").distinct()
        .collect().map(_.getLong(0))
      val incomingCells = incoming.select("centroid_id").distinct()
        .collect().map(_.getLong(0))
      val touched = (mappedCells ++ incomingCells).distinct.sorted.toSeq
      val newRows = incoming.select(storeCols.map(col): _*)
      // bounded rewrite of the touched staged cells (byte-batched like the
      // lifecycle rewrites; the staged table is private, so the fingerprint
      // defense inside never fires — it is reused, not needed)
      DocLifecycle.cellBatches(spark, stStore, touched, maxBatchBytes).foreach { cbatch =>
        DocLifecycle.overwriteCellsRetrying(spark, stStore, cbatch, { base =>
          val kept = Similarity.ivfAssign(
              base.withColumnRenamed("centroid_id", "__new_cid"),
              oldCentTbl, idCol = "chunk_id")
            .filter(!col("centroid_id").isInCollection(cells)) // from an unchanged old cell
            .drop("centroid_id").withColumnRenamed("__new_cid", "centroid_id")
          kept.select(storeCols.map(col): _*)
            .unionByName(newRows.filter(col("centroid_id").isInCollection(cbatch)))
        })
        if (withCodes) stCodes.foreach { sc =>
          // same cells on the code side: drop codes of removed/changed
          // chunks, add the incoming chunks' codes (read from the OLD code
          // table's matching cells — the assignment is identical, so the
          // pruned read finds them; a code-less chunk stays code-less, the
          // same crash-orphan state the old generation serves)
          val incomingCodes = spark.table(oldCodes.get)
            .filter(inCells)
            .drop("centroid_id")
            .join(newRows.filter(col("centroid_id").isInCollection(cbatch))
                .select(col("chunk_id"), col("centroid_id")), "chunk_id")
            .localCheckpoint(true)
          val removedIds = spark.table(stStore) // post-rewrite live ids of the batch
            .filter(col("centroid_id").isInCollection(cbatch))
            .select("chunk_id")
          DocLifecycle.overwriteCellsRetrying(spark, sc, cbatch, { base =>
            val codeCols = base.columns.toIndexedSeq
            base.join(incomingCodes.select("chunk_id"), Seq("chunk_id"), "left_anti")
              .join(removedIds, Seq("chunk_id"), "left_semi") // keep only still-live
              .select(codeCols.map(col): _*)
              .unionByName(incomingCodes.select(codeCols.map(col): _*))
          })
        }
      }
    }

    try {
      // ---- 1. stage the new-generation centroids (from the current store)
      val t0 = System.nanoTime()
      val live = spark.table(oldStore).filter(col("embedding").isNotNull)
      (if (trained) Similarity.kmeansCentroids(live, newNlist)
       else Similarity.hashSeededCentroids(live, newNlist,
         idCol = "chunk_id", embCol = "embedding"))
        .write.mode("overwrite").format("parquet").saveAsTable(stCents)
      val tCent = (System.nanoTime() - t0) / 1e9

      // ---- 2. snapshot + stage the store (assignment pass, no re-embed)
      val t1 = System.nanoTime()
      var fp = fingerprintAll(spark, oldStore)
      val allCells = fp.keySet.map(_.split("=", 2)(1).toLong).toSeq.sorted
      val base = Similarity.ivfAssign(
        readCells(spark, oldStore, fp, allCells).drop("centroid_id"),
        spark.table(stCents), idCol = "chunk_id")
      base.select(storeCols.map(col): _*)
        .repartition(col("centroid_id")) // clusterWrite: one file per cell
        .write.mode("overwrite").partitionBy("centroid_id")
        .format("parquet").saveAsTable(stStore)
      val baseRows = spark.table(stStore).count()
      // private pair logs: frozen old-index copy + staged-side index
      DocLifecycle.docCells(spark, dir, oldNlist, trained)
        .select("document_id", "centroid_id").distinct()
        .repartition(32, col("document_id"))
        .write.mode("overwrite")
        .bucketBy(32, "document_id").sortBy("document_id")
        .format("parquet").saveAsTable(stOldPairs)
      DocLifecycle.rebuildDocCells(spark, stStore, stDc)
      val tBuild = (System.nanoTime() - t1) / 1e9

      // ---- 3. unleased delta rounds until quiet (loops keep writing)
      beforeRounds()
      val t2 = System.nanoTime()
      var rounds = 0
      var quiet = false
      while (!quiet && rounds < maxRounds) {
        val cur = fingerprintAll(spark, oldStore)
        val changed = changedCells(fp, cur)
        if (changed.isEmpty) quiet = true
        else {
          // a racing EDIT can delete the very files this round's diff
          // vouched for mid-read — re-diff and redo rather than dying
          // (reconcile is idempotent: cells stay flagged until fp advances)
          try { reconcile(cur, changed, withCodes = false); fp = cur }
          catch { case e: Throwable if TableStore.isStaleListing(e) => () }
          rounds += 1
        }
      }
      val tRounds = (System.nanoTime() - t2) / 1e9

      // ---- 4. stage the code table: re-cell current codes by the staged
      // assignment (payload join — no re-encoding; the codebook carries over)
      val t3 = System.nanoTime()
      stCodes.foreach { sc =>
        spark.catalog.refreshTable(oldCodes.get)
        val codeCols = spark.table(oldCodes.get).schema.fieldNames.toIndexedSeq
        spark.table(oldCodes.get).drop("centroid_id")
          .join(spark.table(stStore).select("chunk_id", "centroid_id"), "chunk_id")
          .select(codeCols.map(col): _*) // old schema order, centroid_id last
          .repartition(col("centroid_id"))
          .write.mode("overwrite").partitionBy("centroid_id")
          .format("parquet").saveAsTable(sc)
      }
      val tCodes = (System.nanoTime() - t3) / 1e9

      // ---- 5. cutover under the old generation's lease: edits/compaction
      // excluded by mechanism; ingest appends must quiesce or the diff
      // below fails loudly rather than cutting over a moving target
      beforeCutover()
      val t4 = System.nanoTime()
      var cutRounds = 0
      MaintenanceLease.withLease(spark, oldStore) {
        var cur = fingerprintAll(spark, oldStore)
        var changed = changedCells(fp, cur)
        while (changed.nonEmpty && cutRounds < 3) {
          reconcile(cur, changed, withCodes = pqM > 0)
          fp = cur; cutRounds += 1
          cur = fingerprintAll(spark, oldStore)
          changed = changedCells(fp, cur)
        }
        if (changed.nonEmpty) throw new IllegalStateException(
          s"old store $oldStore still changing after $cutRounds leased reconcile rounds — " +
            "pause the ingest append loop for the cutover (edits are excluded by the lease; " +
            "appends never block on maintenance by design)")
        beforeSwap()
        // the swap: metadata renames, one table at a time, rename-ASIDE
        // then rename-IN — at no instant is the staged table the only copy
        // of anything (a kill between renames leaves the old data under
        // __retired and the new under __rstage/natural; healInterruptedSwap
        // restores). Same-nlist swaps replace the live generation — readers
        // quiesce for these renames.
        MaintenanceLock(newDc) {
          val swaps = Seq(stCents -> newCents, stStore -> newStore) ++
            stCodes.zip(newCodes).map { case (s, n) => s -> n } ++ Seq(stDc -> newDc)
          // any natural-name mutation makes the staging non-disposable:
          // from here the catch block must never drop staged tables
          renamed = true
          val retired = Seq.newBuilder[String]
          swaps.foreach { case (stage, natural) =>
            if (spark.catalog.tableExists(natural)) {
              val aside = s"${natural}__retired$nonce"
              spark.sql(s"ALTER TABLE $natural RENAME TO $aside")
              // re-point the aside table's per-partition locations at its
              // moved directory (a partitioned rename does not rewrite
              // them): a reclaim DROP — or a heal's rename-back — must
              // only ever touch its OWN files
              if (natural == newStore || newCodes.contains(natural))
                spark.sql(s"ALTER TABLE $aside RECOVER PARTITIONS")
              retired += aside
            } else {
              // a previous JVM's table files can survive the in-memory
              // catalog (TableStore.getOrBuild clears the same leftovers):
              // the managed-table RENAME moves the staged dir to the
              // natural location and refuses if a stale one squats there
              val loc = new org.apache.hadoop.fs.Path(
                spark.conf.get("spark.sql.warehouse.dir"),
                natural.toLowerCase(java.util.Locale.ROOT))
              val lfs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
              if (lfs.exists(loc)) lfs.delete(loc, true)
            }
            duringSwap(natural) // crash seam: between aside and rename-in
            spark.sql(s"ALTER TABLE $stage RENAME TO $natural")
            // a partitioned table's catalog entries keep PER-PARTITION
            // locations, which the rename does not rewrite — re-discover
            // them from the moved directory (metadata listing, nlist-scale)
            if (natural == newStore || newCodes.contains(natural))
              spark.sql(s"ALTER TABLE $natural RECOVER PARTITIONS")
            spark.catalog.refreshTable(natural)
          }
          // every member landed: the retired generation is redundant — reclaim
          retired.result().foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
        }
      }
      val tCut = (System.nanoTime() - t4) / 1e9
      Report(oldNlist, newNlist, baseRows, deltaRows, rounds, cutRounds,
        tCent, tBuild, tRounds, tCodes, tCut)
    } catch {
      case e: Throwable =>
        // no rename happened: the old generation is intact and the staging
        // is disposable. After the first rename, KEEP everything — dropping
        // staged tables would destroy not-yet-renamed generation pieces;
        // re-running the rebuild (or sweepOrphans, age-gated) recovers.
        if (!renamed)
          (Seq(stStore, stCents, stDc, stOldPairs) ++ stCodes.toSeq).foreach { t =>
            spark.sql(s"DROP TABLE IF EXISTS $t") }
        throw e
    } finally {
      hbThread.interrupt()
      try {
        val hb = TableStore.heartbeatPath(spark, nonce)
        hb.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hb, false)
      } catch { case _: Throwable => () }
      if (renamed) spark.sql(s"DROP TABLE IF EXISTS $stOldPairs")
    }
  }

  /** One hot-cell split's outcome: `cell` was over `bytes`, its rows moved
    * to `children` (the two local 2-means replacements) and `migrated`
    * other cells (boundary rows whose globally-nearest centroid was never
    * the parent's children); `parentRetired` is false when a late append
    * raced the rewrite in — the parent stays a live centroid holding
    * exactly those rows, and the next cadence pass re-examines it. */
  case class SplitReport(cell: Long, bytes: Long, children: Seq[Long],
                         migrated: Seq[Long], movedRows: Long,
                         parentRetired: Boolean, seconds: Double)

  /** Split the chunk store's oversized cells — the maintenance pass for
    * SKEWED GEOMETRY under frozen centroids: ingest drift can fatten one
    * cell far past every byte bound sized for the √n law, after which (a)
    * every probe of that cell scans corpus-shaped bytes and (b)
    * [[DocLifecycle.cellBatches]]' byte-batched rewrites degenerate to one
    * oversized job (the cap bounds multi-cell batches; it cannot shrink a
    * single cell). Run on the maintenance cadence off a
    * [[Compaction.partitionStats]] trigger: any cell over `maxCellBytes`
    * is split, largest first, at most `maxSplits` per pass (each split is
    * a bounded job; a pathological store heals over a few cadences).
    *
    * Per cell: derive TWO replacement centroids by seeded 2-means over the
    * cell's own rows, register them in the frozen centroid table FIRST
    * (probe-safe — a child with no rows is an empty pruned scan), then
    * re-assign the cell's rows against the FULL new centroid set (children
    * and existing cells alike — restricting targets to the children would
    * strand boundary rows whose nearest centroid is elsewhere): every
    * MOVED row lands in its globally-nearest cell. Rows of OTHER cells are
    * untouched, and a new child can become globally nearer for a few of
    * their boundary rows — those cost at most one extra probe (the child
    * outranks the row's own cell in the probe list) until the next
    * blue/green rebuild restores the exact invariant corpus-wide; the
    * probe-bounded recall trade every online IVF modification carries,
    * pinned at nprobe=2 by ReindexSpec. Then append the moved
    * (doc → cell) pairs to the
    * doc→cells index (never-miss ordering; the parent's stale pairs are
    * superset false positives the cadence reclaims), and rewrite the
    * touched cells through [[DocLifecycle.overwriteCellsRetrying]]'s
    * fingerprint defense. The move is keyed by a SNAPSHOT id→target map,
    * so a concurrent append racing the rewrite retries in and its rows
    * STAY in the parent — the parent centroid is then kept, not retired
    * (a removed centroid whose cell still holds rows would hide them from
    * every probe forever). When `pqM > 0` the code table's rows relabel
    * through the same map. The parent centroid is removed last, only once
    * its cell verifiably emptied.
    *
    * Deployment contract: the pass holds the store's [[MaintenanceLease]]
    * per split (excludes edits/compaction); run it serial with the ingest
    * loop like every maintenance writer — the fingerprint defense covers a
    * straggler append, and the one unfenced instant is the rename-only
    * commit window. Returns one report per split cell. */
  def splitHotCells(spark: SparkSession, dir: String, nlist: Int,
                    trained: Boolean = false,
                    pqM: Int = 0, pqKsub: Int = 32,
                    maxCellBytes: Long = 4L << 30,
                    maxSplits: Int = 4,
                    beforeRewrite: () => Unit = () => ()): Seq[SplitReport] = {
    val store = IvfCatalog.chunkStoreName(dir, nlist, trained)
    if (!spark.catalog.tableExists(store)) return Nil
    val hot = Compaction.partitionStats(spark, store)
      .filter(_.bytes > maxCellBytes).sortBy(-_.bytes).take(maxSplits)
    hot.map { p =>
      val cell = p.spec.split("=", 2)(1).toLong
      splitCell(spark, dir, nlist, trained, pqM, pqKsub, cell, p.bytes, beforeRewrite)
    }
  }

  private def splitCell(spark: SparkSession, dir: String, nlist: Int,
                        trained: Boolean, pqM: Int, pqKsub: Int,
                        cell: Long, bytes: Long,
                        beforeRewrite: () => Unit): SplitReport =
    MaintenanceLease.withLease(spark, IvfCatalog.chunkStoreName(dir, nlist, trained)) {
    val t0 = System.nanoTime()
    val store = IvfCatalog.chunkStoreName(dir, nlist, trained)
    val centsName = IvfCatalog.chunkCentroidsName(dir, nlist, trained)
    spark.catalog.refreshTable(store)
    val rows = spark.table(store)
      .filter(col("centroid_id") === cell && col("embedding").isNotNull)
    if (rows.limit(2).count() < 2) // nothing to bisect (a single giant row)
      return SplitReport(cell, bytes, Nil, Nil, 0L,
        parentRetired = false, (System.nanoTime() - t0) / 1e9)
    // index metadata: tiny by construction (one row per cell)
    val existing = spark.table(centsName)
      .select(col("centroid_id").cast("long"), col("centroid_vec"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toMap
    val nextId = existing.keys.max + 1
    val kids = Similarity.kmeansCentroids(rows, 2)
      .select((col("centroid_id") + lit(nextId)).as("centroid_id"), col("centroid_vec"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    // 1. register the children (idempotent: rewrite the tiny table deduped
    //    by id, so a crashed-then-replayed split can't double-register)
    import spark.implicits._
    def writeCents(entries: Seq[(Long, Seq[Float])]): Unit =
      entries.sortBy(_._1).toDF("centroid_id", "centroid_vec")
        .select(col("centroid_id"), col("centroid_vec").cast("array<float>").as("centroid_vec"))
        .write.mode("overwrite").format("parquet").saveAsTable(centsName)
    writeCents(((existing -- kids.map(_._1)) ++ kids).toSeq)
    spark.catalog.refreshTable(centsName)
    // 2. snapshot id→target map: global re-assignment of the cell's rows
    val moved = Similarity.ivfAssign(
        rows.drop("centroid_id"),
        spark.table(centsName).filter(col("centroid_id") =!= cell),
        idCol = "chunk_id")
      .localCheckpoint(true) // pinned before the rewrite invalidates its lineage
    val movedRows = moved.count()
    val targets = moved.select("centroid_id").distinct()
      .collect().map(_.getLong(0)).toSeq.sorted
    // 3. pairs BEFORE rows (the index must never miss a cell)
    if (spark.catalog.tableExists(DocLifecycle.docCellsName(dir, nlist, trained)))
      DocLifecycle.appendDocCells(spark, dir, nlist, trained,
        moved.select(col("document_id"), col("centroid_id")))
    // 4. the store rewrite: moved ids land at their targets; anything ELSE
    //    in the parent (a raced-in append, retried through the fingerprint
    //    defense) stays put, keeping the parent alive. `beforeRewrite` is
    //    the race spec's injection seam (post-snapshot, pre-rewrite).
    beforeRewrite()
    val storeCols = spark.table(store).schema.fieldNames.toIndexedSeq
    val movedIds = moved.select("chunk_id")
    DocLifecycle.overwriteCellsRetrying(spark, store, (cell +: targets).distinct, { base =>
      base.join(movedIds, Seq("chunk_id"), "left_anti")
        .select(storeCols.map(col): _*)
        .unionByName(moved.select(storeCols.map(col): _*))
    })
    // 5. the code table relabels through the same map
    if (pqM > 0) {
      val codes = IvfPqCatalog.chunkCodesTableName(spark, dir, nlist, pqM, pqKsub, trained)
      if (spark.catalog.tableExists(codes)) {
        val codeCols = spark.table(codes).schema.fieldNames.toIndexedSeq
        val map = moved.select(col("chunk_id"), col("centroid_id").as("__target"))
        DocLifecycle.overwriteCellsRetrying(spark, codes, (cell +: targets).distinct, { base =>
          base.join(map, Seq("chunk_id"), "left")
            .withColumn("centroid_id", coalesce(col("__target"), col("centroid_id")))
            .select(codeCols.map(col): _*)
        })
      }
    }
    // 6. retire the parent centroid — only if its cell verifiably emptied
    spark.catalog.refreshTable(store)
    val parentLive = spark.table(store).filter(col("centroid_id") === cell)
      .limit(1).count() > 0
    if (!parentLive) {
      writeCents((existing -- Seq(cell) -- kids.map(_._1) ++ kids).toSeq)
      spark.catalog.refreshTable(centsName)
    }
    SplitReport(cell, bytes, kids.map(_._1).toSeq,
      targets.filterNot(kids.map(_._1).contains), movedRows,
      parentRetired = !parentLive, (System.nanoTime() - t0) / 1e9)
    }

  /** Geometry-drift advice: the generation at `nlist` has outgrown the
    * nlist law for its CURRENT corpus size and is due a blue/green
    * rebuild ([[rebuildChunkIndex]]). `recommendedNlist` is the law's
    * answer today; `driftFactor` = recommended / current. */
  case class Advice(store: String, nlist: Int, corpusRows: Long,
                    recommendedNlist: Int, driftFactor: Double)

  /** Detect when the frozen-centroid chunk generation is due a rebuild.
    *
    * The nlist law (SCALE.md round-7, three decades of sweep evidence):
    * `nlist_law(n) = max(√n, n / cellCapRows)` — √n is the compute
    * optimum; the n/cellCapRows lower bound keeps one cell's rows inside
    * a task's memory, the hard constraint at 100 TB. A store built at
    * yesterday's n and grown under the ingest loop drifts off the law:
    * cells fatten linearly with corpus growth and probe cost follows cell
    * size instead of nprobe/nlist. [[splitHotCells]] repairs the skewed
    * TAIL at cell cost; this detects the UNIFORM drift only a new
    * centroid set fixes, firing once `recommendedNlist ≥ triggerFactor ×
    * nlist` (the default 2.0 ≈ 4× corpus growth under the √n regime —
    * early enough that the rebuild runs while probes still serve, late
    * enough that rebuilds stay decade-rare events, and any skew spike in
    * between remains the split pass's job).
    *
    * Cost: one COUNT over the store — with no data columns referenced the
    * scan reads parquet footer row counts, not pages; cheap enough for
    * the maintenance cadence it rides (the loops' `compactEvery` blocks
    * call this and hand any advice to `onAdvice`). Returns None when the
    * generation doesn't exist or the law is still satisfied within
    * `triggerFactor`. Acting on it stays a deployment decision: the
    * rebuild takes a lease-held cutover, so the loops' own cadence never
    * triggers it implicitly. */
  def reindexAdvice(spark: SparkSession, dir: String, nlist: Int,
                    trained: Boolean = false,
                    cellCapRows: Long = 1L << 20,
                    triggerFactor: Double = 2.0): Option[Advice] = {
    require(triggerFactor >= 1.0, s"triggerFactor must be ≥ 1, got $triggerFactor")
    require(cellCapRows > 0, s"cellCapRows must be positive, got $cellCapRows")
    val store = IvfCatalog.chunkStoreName(dir, nlist, trained)
    if (!spark.catalog.tableExists(store)) return None
    val n = TableStore.retryingStale(spark, store) {
      spark.table(store).count()
    }
    val law = math.max(math.sqrt(n.toDouble), n.toDouble / cellCapRows)
    val recommended = math.max(16, math.ceil(law).toInt)
    val drift = recommended.toDouble / nlist
    if (drift >= triggerFactor) Some(Advice(store, nlist, n, recommended, drift))
    else None
  }

  /** Reclaim a retired chunk-index generation — store, centroids,
    * doc→cells, and (when `pqM > 0`) the code table for (dir, nlist,
    * trained). Call once nothing probes or writes the generation; the
    * blue/green flow is rebuild → retarget readers/loops → drop. */
  def dropChunkGeneration(spark: SparkSession, dir: String, nlist: Int,
                          trained: Boolean = false,
                          pqM: Int = 0, pqKsub: Int = 32): Unit = {
    val codes =
      if (pqM > 0) Some(IvfPqCatalog.chunkCodesTableName(spark, dir, nlist, pqM, pqKsub, trained))
      else None
    (Seq(IvfCatalog.chunkStoreName(dir, nlist, trained),
      IvfCatalog.chunkCentroidsName(dir, nlist, trained),
      DocLifecycle.docCellsName(dir, nlist, trained)) ++ codes.toSeq)
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
