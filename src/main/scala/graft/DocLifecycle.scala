package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.pipelines.Pipelines

/** Document UPSERT and DELETE against the stored chunk index — the two
  * lifecycle operations the append-only ingest loop deliberately excludes
  * (reference: an edited page re-runs the S9 update path,
  * mongodb_pipelines.py-style `replace_one`, and a removed page cascades
  * its chunk deletes, S10). On a partitioned 100 TB store "replace this
  * document's chunks" must NOT be a corpus scan: the store is partitioned
  * by `centroid_id`, not by document, and an edited document's OLD chunks
  * sit in cells only their (gone) embeddings knew.
  *
  * The missing piece is a secondary index: [[docCells]] materializes
  * (document_id → centroid_id) pairs, bucketed by document_id, maintained
  * by the store build and every [[IvfCatalog.appendChunks]]. Lookups
  * bucket-prune to one file per bucket; the answer is a SUPERSET contract —
  * the index may list cells a document no longer occupies (upserts append
  * the new pairs and leave the old — false positives cost one extra pruned
  * cell read, never correctness, and [[compactDocCells]] rewrites the index
  * down to the store's live pairs on the same cadence as file compaction),
  * but it can never MISS a cell holding a document's rows: build and every
  * append insert their pairs in the same job as the rows themselves.
  *
  * Both operations then touch only the union of the document's old cells
  * (from the index) and its new chunks' cells (from assignment): a
  * partition-pruned read, minus the document's rows, plus the replacement
  * rows, dynamic-partition-overwritten back — [[Compaction]]'s bounded
  * rewrite shape, batch-sized, never corpus-sized. A cell emptied entirely
  * is dropped via `ALTER TABLE … DROP PARTITION` (dynamic overwrite only
  * replaces partitions present in the OUTPUT, so an emptied cell would
  * otherwise keep its stale files). Readers get Compaction's contract:
  * fail-loud on a raced listing, clean on refresh-retry
  * ([[TableStore.retryingStale]]). Writers get Compaction's contract too:
  * these are maintenance-class rewrites — run them serially with the
  * ingest loop's appends (the loop itself is serial by construction; an
  * external upsert job quiesces ingest for its cells or accepts the
  * late-append hazard compactTable documents).
  *
  * The IVFADC code table (when the store is also served compressed) is
  * maintained in the same call when `pqM > 0`: dead ids' codes are dropped
  * from the touched cells and replacement chunks are encoded with the
  * frozen codebook — without this, deleted ids linger as ADC candidates
  * and burn rerank slots. */
object DocLifecycle {

  /** Catalog table name of the doc→cells index for (dir, nlist, mode). */
  def docCellsName(dir: String, nlist: Int, trained: Boolean = false): String =
    TableStore.tableName(
      if (trained) s"ivfdoccellsk$nlist" else s"ivfdoccells$nlist", dir)

  /** The (document_id, centroid_id) secondary index for the chunk store,
    * bucketed by document_id. First use derives it from the LIVE store (a
    * one-time scan — complete by construction); from then on
    * [[IvfCatalog.appendChunks]] appends each batch's pairs. Superset
    * semantics: see object scaladoc. */
  def docCells(spark: SparkSession, dir: String, nlist: Int,
               trained: Boolean = false): DataFrame = {
    val name = docCellsName(dir, nlist, trained)
    val store = IvfCatalog.chunkStoreName(dir, nlist, trained)
    require(spark.catalog.tableExists(store),
      s"stored chunk IVF index for '$dir' not built — assignedChunks first")
    TableStore.getOrBuild(spark, name) {
      spark.table(store)
        .select(col("document_id"), col("centroid_id")).distinct()
        .repartition(32, col("document_id")) // clusterWrite: one file per bucket
        .write.mode("overwrite")
        .bucketBy(32, "document_id").sortBy("document_id")
        .format("parquet").saveAsTable(name)
    }
  }

  /** Append one batch's (document_id, centroid_id) pairs — called by
    * [[IvfCatalog.appendChunks]] when the index exists, in the same
    * micro-batch as the row append (the index must never miss a cell). */
  private[graft] def appendDocCells(spark: SparkSession, dir: String, nlist: Int,
                                    trained: Boolean, assigned: DataFrame): Unit = {
    val name = docCellsName(dir, nlist, trained)
    if (spark.catalog.tableExists(name)) {
      assigned.select(col("document_id"), col("centroid_id")).distinct()
        .repartition(32, col("document_id"))
        .write.mode("append")
        .bucketBy(32, "document_id").sortBy("document_id")
        .format("parquet").saveAsTable(name)
      spark.catalog.refreshTable(name)
    }
  }

  /** Rewrite the index down to the store's LIVE pairs — reclaims upsert
    * false positives and delete leftovers; cadence with file compaction. */
  def compactDocCells(spark: SparkSession, dir: String, nlist: Int,
                      trained: Boolean = false): Unit = {
    val name = docCellsName(dir, nlist, trained)
    if (spark.catalog.tableExists(name)) {
      spark.sql(s"DROP TABLE $name")
      docCells(spark, dir, nlist, trained)
    }
  }

  /** The cells the index lists for `ids` — a bucket-pruned read; ≤ nlist
    * values by construction. */
  private def cellsOf(spark: SparkSession, dir: String, nlist: Int,
                      trained: Boolean, ids: Seq[Long]): Seq[Long] =
    docCells(spark, dir, nlist, trained)
      .filter(col("document_id").isin(ids: _*))
      .select("centroid_id").distinct()
      .collect().map(_.getLong(0)).toSeq

  /** Dynamic-partition-overwrite `cells` of `name` with `content` (their
    * complete replacement rows); cells absent from the output are emptied —
    * dropped as partitions. Compaction's temp-hop shape: spill first (a
    * plan reading the table can't overwrite it), nonce-suffixed, deleted in
    * the finally. */
  private def overwriteCells(spark: SparkSession, name: String,
                             cells: Seq[Long], content: DataFrame): Unit = {
    if (cells.isEmpty) return
    val schema = spark.table(name).schema
    val tmp = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      s"__upsert_tmp_${name}_${System.nanoTime()}")
    val fs = tmp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prevMode = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      content.select(schema.fieldNames.map(col).toIndexedSeq: _*)
        .write.mode("overwrite").parquet(tmp.toString)
      val staged = spark.read.parquet(tmp.toString)
      val present = staged.select("centroid_id").distinct()
        .collect().map(_.getLong(0)).toSet
      if (present.nonEmpty)
        staged.repartition(col("centroid_id")) // one file per rewritten cell
          .select(schema.fieldNames.map(col).toIndexedSeq: _*)
          .write.mode("overwrite").insertInto(name)
      cells.filterNot(present).foreach { c =>
        spark.sql(s"ALTER TABLE $name DROP IF EXISTS PARTITION (centroid_id=$c)")
      }
      spark.catalog.refreshTable(name)
    } finally {
      fs.delete(tmp, true)
      prevMode match {
        case Some(m) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", m)
        case None    => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }

  private def inIds(ids: Seq[Long]): Column = col("document_id").isin(ids: _*)

  /** Replace `docs`' chunks in the stored index with their re-run feature
    * pipeline — the edited-document path. Returns (chunks removed, chunks
    * added). A document absent from the store is simply added (upsert), one
    * whose edit produces no chunks (fails the quality gate) is effectively
    * deleted; replayed unchanged documents round-trip to identical rows (the
    * md5 ids are content-derived). `pqM > 0` maintains the IVFADC code
    * table in the same call.
    *
    * Replacement chunks carry the same materialized `near_dup_of` signal
    * the ingest loop stamps ([[graft.streaming.StreamingIngest.ingestDocBatch]])
    * — flagged against the store MINUS the document's own outgoing rows (an
    * edited chunk near-dupping its predecessor must not point at a removed
    * id) plus its batch-mates; `flagNearDups = false` skips the kernel. */
  def upsertDocChunks(spark: SparkSession, dir: String, docs: DataFrame,
                      nlist: Int, qualityThreshold: Double = 0.0,
                      idCol: String = "doc_id", textCol: String = "text",
                      trained: Boolean = false,
                      flagNearDups: Boolean = true,
                      flagMinCosine: Double = 0.9, flagNprobe: Int = 2,
                      pqM: Int = 0, pqKsub: Int = 32): (Long, Long) = {
    val store = IvfCatalog.chunkStoreName(dir, nlist, trained)
    require(spark.catalog.tableExists(store),
      s"stored chunk IVF index for '$dir' not built — assignedChunks first")
    val ids = docs.select(col(idCol).cast("long")).distinct()
      .collect().map(_.getLong(0)).toSeq // batch-sized by construction
    val chunks = Pipelines.featurePipeline(docs, qualityThreshold, idCol, textCol)
      .select(col("chunk_id"), col("document_id"), col("word_count"), col("embedding"))
    val assigned = Similarity.ivfAssign(chunks,
      IvfCatalog.chunkCentroidsStored(spark, dir, nlist, trained), idCol = "chunk_id").cache()
    val newCells = assigned.select("centroid_id").distinct()
      .collect().map(_.getLong(0)).toSeq
    val touched = (newCells ++ cellsOf(spark, dir, nlist, trained, ids)).distinct
    spark.catalog.refreshTable(store)
    val pruned = spark.table(store).filter(col("centroid_id").isin(touched: _*))
    // localCheckpoint, not cache: the store rewrite below refreshes the
    // table, which would invalidate a cached plan reading it — a recompute
    // against the REWRITTEN store would see no removed rows at all
    val removedIds = pruned.filter(inIds(ids)).select("chunk_id").localCheckpoint(true)
    val nRemoved = removedIds.count()
    val nAdded = assigned.count()
    val flagged =
      if (!flagNearDups) assigned.withColumn("near_dup_of", lit(null).cast("string"))
      else {
        // same semantics as the ingest loop's flag: counterparts are stored
        // chunks or batch-mates, smallest id wins — but the store side
        // excludes the document's own OUTGOING rows, so a flag can never
        // point at an id this very call removes
        val pairs = graft.operators.Dedup.embeddingPairsCelledIncrementalById(
          assigned.select(col("chunk_id"), col("embedding")),
          spark.table(store).filter(!inIds(ids)),
          IvfCatalog.chunkCentroidsStored(spark, dir, nlist, trained),
          flagMinCosine, flagNprobe)
        val bIds = assigned.select(col("chunk_id"))
        val flags = pairs.select(col("left_id").as("chunk_id"), col("right_id").as("__other"))
          .unionByName(pairs.select(col("right_id").as("chunk_id"), col("left_id").as("__other")))
          .join(broadcast(bIds), Seq("chunk_id"), "left_semi")
          .groupBy("chunk_id").agg(min(col("__other")).as("near_dup_of"))
        assigned.join(broadcast(flags), Seq("chunk_id"), "left")
      }
    val storeSchema = spark.table(store).schema
    val newRows = flagged.select(storeSchema.fieldNames.map { f =>
      if (flagged.columns.contains(f)) col(f).cast(storeSchema(f).dataType).as(f)
      else lit(null).cast(storeSchema(f).dataType).as(f)
    }.toIndexedSeq: _*)
    overwriteCells(spark, store, touched,
      pruned.filter(!inIds(ids)).unionByName(newRows))
    appendDocCells(spark, dir, nlist, trained, assigned)

    if (pqM > 0) {
      val codes = IvfPqCatalog.chunkCodesTableName(spark, dir, nlist, pqM, pqKsub, trained)
      if (spark.catalog.tableExists(codes)) {
        spark.catalog.refreshTable(codes)
        val kept = spark.table(codes)
          .filter(col("centroid_id").isin(touched: _*))
          .join(broadcast(removedIds), Seq("chunk_id"), "left_anti")
        overwriteCells(spark, codes, touched, kept)
        IvfPqCatalog.appendChunkCodes(spark, dir,
          assigned.select(col("chunk_id"), col("embedding")), nlist, pqM, pqKsub, trained)
      }
    }
    assigned.unpersist()
    (nRemoved, nAdded)
  }

  /** Cascading delete of `ids`' chunks from the stored index — S10 at the
    * serving-index level. Returns the number of chunks removed. */
  def deleteDocChunks(spark: SparkSession, dir: String, ids: Seq[Long],
                      nlist: Int, trained: Boolean = false,
                      pqM: Int = 0, pqKsub: Int = 32): Long = {
    val store = IvfCatalog.chunkStoreName(dir, nlist, trained)
    require(spark.catalog.tableExists(store),
      s"stored chunk IVF index for '$dir' not built — assignedChunks first")
    val touched = cellsOf(spark, dir, nlist, trained, ids)
    if (touched.isEmpty) return 0L
    spark.catalog.refreshTable(store)
    val pruned = spark.table(store).filter(col("centroid_id").isin(touched: _*))
    val removedIds = pruned.filter(inIds(ids)).select("chunk_id").localCheckpoint(true)
    val nRemoved = removedIds.count()
    overwriteCells(spark, store, touched, pruned.filter(!inIds(ids)))
    if (pqM > 0) {
      val codes = IvfPqCatalog.chunkCodesTableName(spark, dir, nlist, pqM, pqKsub, trained)
      if (spark.catalog.tableExists(codes)) {
        spark.catalog.refreshTable(codes)
        val kept = spark.table(codes)
          .filter(col("centroid_id").isin(touched: _*))
          .join(broadcast(removedIds), Seq("chunk_id"), "left_anti")
        overwriteCells(spark, codes, touched, kept)
      }
    }
    nRemoved
  }
}
