package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils

/** Bin-packing compaction for the partitioned store catalogs — the
  * maintenance half of the continuous-ingest story.
  *
  * Every [[IvfCatalog.appendBatch]]/[[IvfCatalog.appendChunks]] lands one
  * parquet file per (task × touched cell), so a store that ingests N
  * micro-batches grows toward N files per cell regardless of row volume —
  * the classic streaming small-file problem. Probe cost then degrades not
  * with data size but with FILE COUNT: every extra file is a footer read, an
  * open, and a short column scan, and at 100 TB a cell with 10k 50-row files
  * is slower to probe than one with 3 right-sized files holding the same
  * rows. Compaction rewrites only the fragmented partitions, bin-packed to a
  * target file size, and leaves every healthy partition byte-identical.
  *
  * Shape (all driver work is FS listings and per-partition arithmetic;
  * nothing row-scaled leaves the executors):
  *
  *  1. list the table's partition directories — every level of a
  *     multi-column partitioning — and count data files and bytes;
  *  2. select partitions with more files than their bin-packed count
  *     `ceil(bytes / targetBytes)` (and at least `minFiles` — singletons are
  *     never rewritten);
  *  3. per batch of selected partitions (bounded by `maxBatchBytes`, so the
  *     rewrite's working set is capped no matter how fragmented the store
  *     got): partition-pruned read of just those directories, spilled to a
  *     temp dir IN THE TABLE'S OWN PARTITIONED LAYOUT, repartitioned by
  *     (partition columns, bucket) where `bucket = pmod(xxhash64(id),
  *     filesTarget)` — ≤ filesTarget files per partition, each ≈
  *     `targetBytes`; the commit is then [[renameCommit]]'s metadata-only
  *     swap (delete old data files, move staged files in), never a second
  *     write job.
  *
  * Row content is untouched — same rows, same partition values, fewer
  * files — so digests over (id, partition) pin the rewrite exactly
  * (CompactionSpec).
  *
  * == Concurrency contract (what a raced reader/writer actually observes) ==
  *
  * '''Readers.''' The rewrite never produces silent wrong answers: at no
  * point can a reader observe a compacted row twice (the overwrite swaps a
  * partition's files, it never appends alongside them). A reader whose
  * session RESOLVED the table's file listing before a pass and scans during
  * or after it fails LOUDLY — `FileNotFoundException` on a rewritten file —
  * and succeeds after re-resolving; [[TableStore.retryingStale]] packages
  * exactly that retry, and [[TableStore.getOrBuild]]'s reader-side refresh
  * re-resolves before every read, so consumers going through the store only
  * race a pass that commits mid-scan. The residual window is the overwrite
  * job's COMMIT (delete-old + rename-staged per touched partition — file
  * metadata ops, not the data rewrite): a listing taken exactly then can
  * transiently miss a touched partition's rows. CompactionSpec provokes the
  * stale-listing race and pins fail-loud-then-retry; cadence passes to
  * read-quiet windows to avoid even the transient retries.
  *
  * '''Writers.''' Appends racing a pass are detected, not lost: each batch
  * re-lists its partitions' files immediately before the overwrite and
  * ABORTS the batch if anything changed since its stats snapshot (the
  * appended rows stay in place; the next cadence compacts them). The
  * detection closes the long window — the spill read/write of up to
  * `maxBatchBytes` — leaving only the instant between the re-list and the
  * overwrite job's first commit action. A truly concurrent high-rate writer
  * should still quiesce (single maintenance writer is the deployment shape;
  * [[streaming.StreamingIngest]]'s in-loop `compactEvery` runs serially with
  * its own appends, which satisfies it by construction).
  *
  * On a cluster the identical code runs as a scheduled maintenance job
  * (the pattern behind Delta/Iceberg OPTIMIZE, re-expressed on plain
  * partitioned parquet); `maxBatchBytes` keeps each rewrite a small bounded
  * job that never blocks ingest for long.
  */
object Compaction {

  /** One partition directory's health: `spec` is the directory path
    * relative to the table root (`centroid_id=17`, or `a=1/b=2` for
    * multi-column partitioning), `files` its data-file count, `bytes` their
    * sum. */
  case class PartitionStats(spec: String, files: Int, bytes: Long) {
    /** Bin-packed file count at `target` bytes — what compaction rewrites
      * this partition down to. */
    def packedFiles(target: Long): Int =
      math.max(1, math.ceil(bytes.toDouble / target).toInt)
  }

  /** `aborted`: partition specs whose rewrite batch was skipped because a
    * concurrent append changed their files between the stats snapshot and
    * the overwrite — nothing was rewritten there; the next pass picks them
    * up. `commitWindowSeconds` is the measured residual race window: the
    * longest span (across batches) from the late-append re-list to the
    * completed [[renameCommit]] — an append landing inside it is neither
    * detected nor preserved. Since the commit became rename-only (it was
    * a full `insertInto` write job, 3.92 s at ×1000) the span is file-
    * metadata ops — milliseconds — which is what "quiesce high-rate
    * writers" now buys. */
  case class Report(scanned: Int, compacted: Seq[PartitionStats],
                    filesBefore: Int, filesAfter: Int, seconds: Double,
                    aborted: Seq[String] = Nil,
                    commitWindowSeconds: Double = 0.0)

  private[graft] def dataFiles(fs: org.apache.hadoop.fs.FileSystem,
                               dir: org.apache.hadoop.fs.Path) =
    fs.listStatus(dir).toSeq.filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }

  private def tableMeta(spark: SparkSession, name: String) =
    spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(name))

  /** Leaf partition directories at exactly `depth` levels below `root`,
    * keyed by their root-relative spec path. */
  private def leafDirs(fs: org.apache.hadoop.fs.FileSystem,
                       root: org.apache.hadoop.fs.Path,
                       depth: Int): Seq[(String, org.apache.hadoop.fs.Path)] =
    if (depth == 0) Seq(("", root))
    else fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.contains("="))
      .flatMap { st =>
        leafDirs(fs, st.getPath, depth - 1).map { case (spec, p) =>
          (if (spec.isEmpty) st.getPath.getName
           else st.getPath.getName + "/" + spec, p)
        }
      }

  /** FS listing of every (leaf) partition directory of catalog table
    * `name`, at every level of its partitioning. */
  def partitionStats(spark: SparkSession, name: String): Seq[PartitionStats] = {
    val meta = tableMeta(spark, name)
    val root = new org.apache.hadoop.fs.Path(meta.location)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    leafDirs(fs, root, meta.partitionColumnNames.size).map { case (spec, p) =>
      val files = dataFiles(fs, p)
      PartitionStats(spec, files.size, files.map(_.getLen).sum)
    }.sortBy(_.spec)
  }

  /** Rename-only commit of a staged partitioned spill into `name`'s
    * partition directories: per partition, delete the old data files and
    * MOVE the staged files in — pure file-metadata ops, no second write
    * job, so the unfenced interval between the late-append re-list and the
    * committed swap shrinks from a full `insertInto` write (3.92 s measured
    * at ×1000) to milliseconds. `tmp` must hold the transformed output
    * written `partitionBy(partition cols)` — dir-per-value, data files
    * without the partition columns, exactly the table's own layout — so a
    * staged file IS a final file and the commit is renames. On HDFS/local
    * FS a rename is a metadata op; an object store without rename (S3)
    * pays a copy per file, still far below a rewrite.
    *
    * Readers racing the per-partition delete+move keep Compaction's
    * contract (fail loudly on a resolved-then-rewritten listing, clean on
    * refresh-retry), with the exposure now metadata-width. An exception
    * mid-commit leaves `tmp` IN PLACE as the recovery copy (the caller's
    * cleanup must skip deletion when this throws) — re-running the move is
    * manual recovery; a JVM kill mid-commit likewise leaves `tmp`, which
    * is why [[TableStore.sweepOrphans]] is age-gated. Returns the staged
    * specs (partitions present in `tmp`); `touched` partitions absent from
    * the staging are left EMPTIED of data files (the caller drops them). */
  private[graft] val ManifestFile = "_graft_commit_manifest"

  /** Write the commit's replay manifest INTO the staging dir — the full
    * (stale-to-delete, staged-to-move) plan per partition, plus the table,
    * its lease scope and its root. From the instant this file exists, a
    * crash at ANY point of the commit is recoverable by [[resumeCommit]]'s
    * idempotent replay: deletes and moves are file-presence-driven, so a
    * half-executed spec (some stale gone, some staged already in place)
    * replays to exactly the committed state — the manifest is what lets a
    * resume distinguish an already-moved staged file from a stale one.
    * Published ATOMICALLY (temp write + rename): a crash mid-write must
    * not leave a truncated manifest at the real name, which a resume
    * would otherwise have to parse — with the rename, either the full
    * manifest exists (replayable) or none does (and no-manifest provably
    * means no mutation ran, so the staging is disposable debris). */
  private def writeManifest(fs: org.apache.hadoop.fs.FileSystem,
                            tmp: org.apache.hadoop.fs.Path,
                            table: String, leaseScope: String,
                            root: org.apache.hadoop.fs.Path,
                            plan: Seq[(String, Seq[String], Seq[String])]): Unit = {
    val sb = new StringBuilder
    sb.append(s"T\t$table\n").append(s"L\t$leaseScope\n").append(s"R\t$root\n")
    plan.foreach { case (spec, stale, moves) =>
      sb.append(s"P\t$spec\n")
      stale.foreach(f => sb.append(s"D\t$f\n"))
      moves.foreach(f => sb.append(s"M\t$f\n"))
    }
    val mf = new org.apache.hadoop.fs.Path(tmp, ManifestFile)
    val mfTmp = new org.apache.hadoop.fs.Path(
      tmp, ManifestFile + s".w${System.nanoTime()}")
    val out = fs.create(mfTmp, true)
    try out.write(sb.toString.getBytes("UTF-8")) finally out.close()
    if (!fs.rename(mfTmp, mf)) {
      fs.delete(mfTmp, false)
      throw new IllegalStateException(
        s"could not publish commit manifest at $mf — refusing to start an " +
          "unrecoverable commit")
    }
  }

  /** Manifest read ([[parseManifest]]) that treats an UNPARSEABLE manifest as NO manifest.
    * With the atomic publish above a malformed manifest should be
    * impossible, but a pre-upgrade truncated file (or FS corruption) must
    * degrade to "manifest-less staging → age-gated sweep", not wedge every
    * later maintenance pass at entry with a MatchError.
    *
    * CRITICAL distinction: a parse failure proves the publish never
    * completed (⇒ no mutation ran ⇒ the staging is disposable), but a READ
    * failure (IOException — S3 throttle, HDFS failover) proves nothing:
    * the staging may hold the only copy of rewritten partitions. IO errors
    * therefore PROPAGATE — callers skip the staging for this pass and
    * leave it for the next cadence, never delete on them. */
  private[graft] def tryReadManifest(fs: org.apache.hadoop.fs.FileSystem,
                                     mf: org.apache.hadoop.fs.Path)
      : Option[(String, String, String, Seq[(String, Seq[String], Seq[String])])] = {
    val text = { // any failure HERE is a transient read problem — rethrow
      val in = fs.open(mf)
      try new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8") finally in.close()
    }
    try {
      val parsed @ (table, _, root, _) = parseManifest(text)
      if (table.isEmpty || root.isEmpty) None else Some(parsed)
    } catch { case scala.util.control.NonFatal(_) => None } // unparseable
  }

  private def parseManifest(text: String)
      : (String, String, String, Seq[(String, Seq[String], Seq[String])]) = {
    var (table, lease, root) = ("", "", "")
    val entries = Seq.newBuilder[(String, Seq[String], Seq[String])]
    var spec: String = null
    var stale = List.empty[String]
    var moves = List.empty[String]
    def flush(): Unit = if (spec != null) {
      entries += ((spec, stale.reverse, moves.reverse)); stale = Nil; moves = Nil
    }
    text.split("\n").filter(_.nonEmpty).foreach { line =>
      val Array(tag, v) = line.split("\t", 2)
      tag match {
        case "T" => table = v
        case "L" => lease = v
        case "R" => root = v
        case "P" => flush(); spec = v
        case "D" => stale ::= v
        case "M" => moves ::= v
      }
    }
    flush()
    (table, lease, root, entries.result())
  }

  /** The lease scope an interrupted commit's manifest records, or None
    * when the manifest is absent/unparseable (→ the staging is
    * manifest-less debris for the age-gated sweep, never a replay). */
  private[graft] def manifestLeaseScope(fs: org.apache.hadoop.fs.FileSystem,
                                        mf: org.apache.hadoop.fs.Path): Option[String] =
    tryReadManifest(fs, mf).map(_._2)

  /** Replay an interrupted rename-commit from its kept staging — the
    * automated form of what used to be manual recovery. Idempotent: every
    * delete/move is file-presence-guarded, so any number of crashes and
    * replays converge on the committed state; a staging whose table root
    * vanished (the generation was reclaimed) is simply discarded. The
    * caller must hold the table's maintenance lease (the manifest records
    * the scope) so no live pass commits concurrently. Returns true when
    * the staging carried a manifest and was completed+removed. */
  private[graft] def resumeCommit(spark: SparkSession,
                                  tmp: org.apache.hadoop.fs.Path,
                                  preParsed: Option[(String, String, String,
                                    Seq[(String, Seq[String], Seq[String])])] = None)
      : Boolean = {
    val fs = tmp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mf = new org.apache.hadoop.fs.Path(tmp, ManifestFile)
    if (!fs.exists(mf)) return false
    // an unparseable manifest ⇒ the atomic publish never completed ⇒ no
    // mutation ran; the staging duplicates live data and falls back to the
    // age-gated sweep rather than wedging the caller with a parse error.
    // (A transient READ error propagates — the caller skips this pass.)
    val (table, _, rootStr, entries) =
      preParsed.orElse(tryReadManifest(fs, mf)).getOrElse(return false)
    val root = new org.apache.hadoop.fs.Path(rootStr)
    if (fs.exists(root)) entries.foreach { case (spec, stale, moves) =>
      val dir = new org.apache.hadoop.fs.Path(root, spec)
      stale.foreach { f =>
        val p = new org.apache.hadoop.fs.Path(dir, f)
        if (fs.exists(p) && !fs.delete(p, false)) throw new IllegalStateException(
          s"commit resume could not delete stale $p — staging kept at $tmp")
      }
      moves.foreach { f =>
        val from = new org.apache.hadoop.fs.Path(
          new org.apache.hadoop.fs.Path(tmp, spec), f)
        if (fs.exists(from)) {
          if (!fs.exists(dir)) fs.mkdirs(dir)
          if (!fs.rename(from, new org.apache.hadoop.fs.Path(dir, f)))
            throw new IllegalStateException(
              s"commit resume could not move $from into $dir — staging kept at $tmp")
        }
      }
    }
    fs.delete(tmp, true)
    if (table.nonEmpty && spark.catalog.tableExists(table))
      spark.catalog.refreshTable(table)
    true
  }

  /** Complete any interrupted rename-commit staging left for `name` by a
    * crashed previous pass — run at [[compactTable]] entry (under the
    * lease), so the very next maintenance pass heals a crash without a
    * human in the path. Returns how many stagings were completed. */
  private[graft] def resumeInterruptedCommits(spark: SparkSession,
                                              name: String): Int = {
    val wh = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(wh)) return 0
    fs.listStatus(wh).count { st =>
      // the name prefix is only a cheap pre-filter: `__compact_tmp_<name>_`
      // also matches stagings of any table whose name EXTENDS `name`
      // (`store` vs `store__gen<nonce>`), and replaying those under THIS
      // table's lease would race the other table's live writer. The
      // manifest's recorded table is authoritative — replay only an exact
      // match; everything else belongs to its own table's entry resume or
      // to sweepOrphans (which takes the manifest's recorded lease scope).
      // A transiently UNREADABLE manifest skips the staging this pass
      // (never a delete, never a wedge); parsed once, reused by the replay.
      st.isDirectory && st.getPath.getName.startsWith(s"__compact_tmp_${name}_") && {
        val mfp = new org.apache.hadoop.fs.Path(st.getPath, ManifestFile)
        val parsed =
          try { if (fs.exists(mfp)) tryReadManifest(fs, mfp) else None }
          catch { case _: java.io.IOException => None }
        parsed.exists(_._1 == name) && resumeCommit(spark, st.getPath, parsed)
      }
    }
  }

  private[graft] def renameCommit(spark: SparkSession, name: String,
                                  root: org.apache.hadoop.fs.Path,
                                  tmp: org.apache.hadoop.fs.Path,
                                  depth: Int, touched: Seq[String],
                                  leaseScope: String = "",
                                  duringCommit: String => Unit = _ => ()): Set[String] = {
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staged = leafDirs(fs, tmp, depth)
    val stagedMap = staged.toMap
    // the full plan, listed up front and persisted as the staging's replay
    // manifest BEFORE the first mutation: a crash between any two file ops
    // below is completed automatically by the next pass's
    // [[resumeInterruptedCommits]] (or the cadence sweep), not by a human
    val plan = (touched ++ staged.map(_._1)).distinct.map { spec =>
      val dir = new org.apache.hadoop.fs.Path(root, spec)
      val stale = if (fs.exists(dir)) dataFiles(fs, dir).map(_.getPath.getName)
                  else Seq.empty[String]
      val moves = stagedMap.get(spec)
        .map(from => dataFiles(fs, from).map(_.getPath.getName))
        .getOrElse(Seq.empty[String])
      (spec, stale, moves)
    }
    writeManifest(fs, tmp, name,
      if (leaseScope.isEmpty) name else leaseScope, root, plan)
    plan.foreach { case (spec, stale, moves) =>
      val dir = new org.apache.hadoop.fs.Path(root, spec)
      stale.foreach { f =>
        val p = new org.apache.hadoop.fs.Path(dir, f)
        if (fs.exists(p) && !fs.delete(p, false)) throw new IllegalStateException(
          s"rename-commit could not delete stale $p — staging kept at $tmp")
      }
      duringCommit(spec) // crash seam: stale gone, staged not yet moved
      if (moves.nonEmpty && !fs.exists(dir)) fs.mkdirs(dir)
      moves.foreach { f =>
        if (!fs.rename(new org.apache.hadoop.fs.Path(
              new org.apache.hadoop.fs.Path(tmp, spec), f),
            new org.apache.hadoop.fs.Path(dir, f)))
          throw new IllegalStateException(
            s"rename-commit could not move staged $f into $dir — staging kept at $tmp")
      }
    }
    staged.map(_._1).toSet
  }

  /** The file fingerprint (name, length) of each of `specs`' directories —
    * the late-append detector's snapshot unit. A spec whose directory does
    * not exist yet (a rewrite targeting a brand-new cell) fingerprints as
    * empty — creation of the directory then reads as a change. Shared with
    * [[DocLifecycle]]'s cell rewrites, which carry the same hazard. */
  private[graft] def fileFingerprint(fs: org.apache.hadoop.fs.FileSystem,
                                     root: org.apache.hadoop.fs.Path,
                                     specs: Seq[String]): Map[String, Set[(String, Long)]] =
    specs.map { spec =>
      val dir = new org.apache.hadoop.fs.Path(root, spec)
      spec -> (if (fs.exists(dir))
                 dataFiles(fs, dir).map(st => (st.getPath.getName, st.getLen)).toSet
               else Set.empty[(String, Long)])
    }.toMap

  /** Compact the fragmented partitions of catalog table `name`.
    *
    * @param targetBytes  bin-pack target per output file (default 128 MB —
    *                     parquet's happy medium: large enough for column
    *                     compression + scan throughput, small enough to
    *                     split across a cluster's cores)
    * @param minFiles     never rewrite partitions with fewer files
    * @param maxBatchBytes cap on bytes rewritten per pass, so one call is a
    *                     sequence of small bounded jobs
    * @param idCol        column hashed into the output-file bucket; if the
    *                     table lacks it (e.g. the chunk store keys on
    *                     `chunk_id`), the first non-partition column is
    *                     hashed instead — the bucket only needs spread, not
    *                     any particular key
    * @param beforeOverwrite coordination hook invoked after each batch's
    *                     spill and immediately before its late-append check
    *                     + overwrite — the seam a deployment uses to fence
    *                     external writers (and the race spec uses to inject
    *                     one)
    * @param leaseScope   [[MaintenanceLease]] scope; defaults to the table
    *                     itself. Callers maintaining one index's table
    *                     GROUP (raw store + code table + doc→cells) pass
    *                     the store's name for all of them, so the group's
    *                     maintenance excludes the lifecycle rewrites that
    *                     touch the same cells
    */
  def compactTable(spark: SparkSession, name: String,
                   targetBytes: Long = 128L << 20,
                   minFiles: Int = 2,
                   maxBatchBytes: Long = 4L << 30,
                   idCol: String = "vec_id",
                   beforeOverwrite: () => Unit = () => (),
                   leaseScope: String = "",
                   duringCommit: String => Unit = _ => ()): Report =
    MaintenanceLease.withLease(spark,
        if (leaseScope.isEmpty) name else leaseScope) {
    val t0 = System.nanoTime()
    // a previous pass that crashed mid-commit left a manifest-bearing
    // staging: complete it now (idempotent replay), so the table this pass
    // reads is whole and crash recovery needs no human
    resumeInterruptedCommits(spark, name)
    val all = partitionStats(spark, name)
    val need = all.filter(p => p.files >= minFiles && p.files > p.packedFiles(targetBytes))
    if (need.isEmpty)
      Report(all.size, Nil, all.map(_.files).sum, all.map(_.files).sum, 0.0)
    else {
    val meta = tableMeta(spark, name)
    val root = new org.apache.hadoop.fs.Path(meta.location)
    val schema = spark.table(name).schema
    val partCols = meta.partitionColumnNames

    // batch the rewrites so the working set stays bounded
    val batches = need.foldLeft(List(List.empty[PartitionStats])) { (acc, p) =>
      if (acc.head.map(_.bytes).sum + p.bytes > maxBatchBytes && acc.head.nonEmpty)
        List(p) :: acc
      else (p :: acc.head) :: acc.tail
    }.map(_.reverse).reverse.filter(_.nonEmpty)

    val compacted = Seq.newBuilder[PartitionStats]
    val aborted = Seq.newBuilder[String]
    var commitWindow = 0.0
    locally {
      batches.foreach { batch =>
        val specs = batch.map(_.spec)
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        // snapshot the batch's files BEFORE reading, so an append racing the
        // spill is caught by the re-list below (the spill may even have read
        // it — it is discarded either way)
        val snapshot = fileFingerprint(fs, root, specs)
        // per-partition output-file target as a BROADCAST-JOINED frame, not
        // a folded when-chain: a chain nests one level per partition, and a
        // ×1000 pass whose single byte-bounded batch holds ~1400 fragmented
        // cells overflows the stack converting the Column tree (found at
        // scale by MaintenanceWindowBench). The tiny (spec → packedFiles)
        // frame keeps plan depth constant at any batch size.
        val nfRows = batch.map { p =>
          val values = p.spec.split("/").map { kv =>
            val raw = kv.split("=", 2)(1)
            if (raw == "__HIVE_DEFAULT_PARTITION__") null
            else ExternalCatalogUtils.unescapePathName(raw)
          }
          org.apache.spark.sql.Row.fromSeq(
            values.toSeq :+ Integer.valueOf(p.packedFiles(targetBytes)))
        }
        val nfSchema = org.apache.spark.sql.types.StructType(
          partCols.map(c => org.apache.spark.sql.types.StructField(
            s"__pv_$c", org.apache.spark.sql.types.StringType)) :+
            org.apache.spark.sql.types.StructField("__nf",
              org.apache.spark.sql.types.IntegerType))
        val nfDf = partCols.foldLeft(
            spark.createDataFrame(
              spark.sparkContext.parallelize(nfRows, 1), nfSchema)) {
          (df, c) => df.withColumn(s"__pv_$c", col(s"__pv_$c").cast(schema(c).dataType))
        }
        val bucketKey =
          if (schema.fieldNames.contains(idCol)) idCol
          else schema.fieldNames.filterNot(partCols.contains).head
        // the spill reads EXACTLY the snapshot's files by path (basePath
        // recovers the partition columns) — never the session's resolved
        // table relation, whose cached file listing can be STALE: an
        // external-session append landing after this session last resolved
        // the table would be inside the FS fingerprint (so the commit
        // re-list detects no change) yet missing from a cached-listing
        // scan, and the overwrite would silently delete it. Reading the
        // snapshot's own files makes spill == fingerprint by construction;
        // anything newer than both still aborts at the re-list.
        val snapFiles = specs.flatMap { spec =>
          snapshot(spec).map { case (fname, _) =>
            new org.apache.hadoop.fs.Path(
              new org.apache.hadoop.fs.Path(root, spec), fname).toString }
        }
        // explicit DATA schema (table schema minus partition columns): the
        // footer-inferred schema comes from one arbitrary file, and a file
        // written without a nullable column would drop it for the whole
        // batch; with the declared schema such files null-fill instead,
        // exactly like a table scan
        val dataSchema = org.apache.spark.sql.types.StructType(
          schema.fields.filterNot(f => partCols.contains(f.name)))
        val raw = spark.read
          .schema(dataSchema)
          .option("basePath", meta.location.toString)
          .parquet(snapFiles: _*)
        // path-inferred partition columns come back in their narrowest type
        // (centroid_id=10 → int); align to the table's declared types
        val typed = partCols.foldLeft(raw) { (df, c) =>
          df.withColumn(c, col(c).cast(schema(c).dataType))
        }
        val selected = typed
          .join(broadcast(nfDf),
            partCols.map(c => typed(c) <=> nfDf(s"__pv_$c")).reduce(_ && _), "left")
          .withColumn("__bucket",
            pmod(xxhash64(col(bucketKey)), coalesce(col("__nf"), lit(1))))
          .drop("__nf").drop(partCols.map(c => s"__pv_$c").toSeq: _*)
        // temp hop, written in the TABLE'S OWN LAYOUT (partitionBy — dir
        // per value, data files without the partition columns) so the
        // commit below is rename-only. Nonce-suffixed (concurrent passes
        // never clobber each other's staging); deleted on every exit
        // EXCEPT an exception mid-commit, where it is the recovery copy.
        val tmp = new org.apache.hadoop.fs.Path(
          spark.conf.get("spark.sql.warehouse.dir"),
          s"__compact_tmp_${name}_${System.nanoTime()}")
        var keepTmp = false
        try {
          val nBuckets = batch.map(_.packedFiles(targetBytes)).sum
          selected
            .repartition(math.max(nBuckets * 2, 1),
              (partCols.map(col) :+ col("__bucket")): _*)
            .select(schema.fieldNames.map(col).toIndexedSeq: _*)
            .write.mode("overwrite").partitionBy(partCols: _*).parquet(tmp.toString)
          beforeOverwrite()
          // late-append detection: if any selected partition's files changed
          // since the snapshot, a concurrent writer appended — abort this
          // batch (the overwrite would delete those rows) and let the next
          // cadence compact the partition
          if (fileFingerprint(fs, root, specs) != snapshot) {
            aborted ++= specs
          } else {
            val tRelist = System.nanoTime() // residual window opens here
            keepTmp = true // an exception mid-commit must keep the staging
            renameCommit(spark, name, root, tmp, partCols.size, specs,
              leaseScope = if (leaseScope.isEmpty) name else leaseScope,
              duringCommit = duringCommit)
            keepTmp = false
            commitWindow = math.max(commitWindow, (System.nanoTime() - tRelist) / 1e9)
            compacted ++= batch
          }
        } finally {
          if (!keepTmp) fs.delete(tmp, true)
        }
      }
      spark.catalog.refreshTable(name)
    }

    val after = partitionStats(spark, name)
    Report(all.size, compacted.result(),
      all.map(_.files).sum, after.map(_.files).sum,
      (System.nanoTime() - t0) / 1e9,
      aborted.result(), commitWindow)
    }
    }

  /** Data-file count of a NON-partitioned table (files live at the root). */
  def tableFiles(spark: SparkSession, name: String): Int = {
    val root = new org.apache.hadoop.fs.Path(tableMeta(spark, name).location)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    dataFiles(fs, root).size
  }

  /** Compact a BUCKETED table (BandCatalog's shingle/band stores) back to
    * one file per bucket. Bucketed tables have no partition directories to
    * rewrite selectively — every append lands one file per touched bucket,
    * and reclaiming them means rewriting the table under its own bucket
    * spec (read from catalog metadata, so the spec — and with it the
    * exchange-free probe joins — survives byte-for-byte).
    *
    * Crash safety: the rewrite lands in a STAGING table first (a sibling
    * catalog table, so no self-overwrite and no window in which the data
    * exists only as an unregistered spill); the swap is then two metadata
    * ops — `DROP` the original, `RENAME` the staging into its name. A crash
    * before the drop leaves the original untouched; a crash between the two
    * leaves the COMPLETE staging table, and recovery is `ALTER TABLE
    * <name>__cstage<nonce> RENAME TO <name>` — never a rebuild from the
    * base corpus. (Under the in-memory catalog a dead JVM forgets tables
    * anyway and [[TableStore.getOrBuild]] rebuilds by design; the staging
    * discipline is for persistent metastores, where the un-staged form of
    * this rewrite could drop every appended increment on a mid-write
    * crash.) Readers racing the swap fail loudly and retry, same contract
    * as [[compactTable]].
    *
    * Cost is a full-table pass; cadence it accordingly — for an index that
    * ingests daily increments, weekly is plenty, and the cost scales with
    * the INDEX, which bucketing already sized to be scanned. Returns
    * (files before, files after, seconds). */
  def compactBucketed(spark: SparkSession, name: String): (Int, Int, Double) =
    MaintenanceLease.withLease(spark, name) {
    val t0 = System.nanoTime()
    val meta = tableMeta(spark, name)
    val bucketSpec = meta.bucketSpec.getOrElse(
      sys.error(s"$name is not bucketed — use compactTable for partitioned stores"))
    val filesBefore = tableFiles(spark, name)
    val stage = s"${name}__cstage${System.nanoTime()}"
    val cols = bucketSpec.bucketColumnNames.map(col)
    val prevBucketedRead = spark.conf.get("spark.sql.sources.bucketing.enabled")
    try {
      // read the source UN-bucketed for this one pass: a bucketed scan
      // already satisfies the writer's distribution, so the clusterWrite
      // repartition would be elided and every scan task would write its own
      // per-bucket files — the exact fragmentation being reclaimed
      spark.conf.set("spark.sql.sources.bucketing.enabled", "false")
      val staged = spark.table(name)
        .repartition(bucketSpec.numBuckets, cols: _*) // clusterWrite: one file per bucket
      val writer = staged.write.mode("overwrite")
        .bucketBy(bucketSpec.numBuckets,
          bucketSpec.bucketColumnNames.head, bucketSpec.bucketColumnNames.tail: _*)
      (if (bucketSpec.sortColumnNames.nonEmpty)
         writer.sortBy(bucketSpec.sortColumnNames.head, bucketSpec.sortColumnNames.tail: _*)
       else writer)
        .format("parquet").saveAsTable(stage)
      // the swap: two metadata ops — the only window, and it loses nothing
      // (recovery from a crash in between is renaming the staging table)
      spark.sql(s"DROP TABLE $name")
      spark.sql(s"ALTER TABLE $stage RENAME TO $name")
    } catch {
      case e: Throwable =>
        // failed before the swap: the original is intact; drop the staging
        if (spark.catalog.tableExists(name) && spark.catalog.tableExists(stage))
          spark.sql(s"DROP TABLE IF EXISTS $stage")
        throw e
    } finally {
      spark.conf.set("spark.sql.sources.bucketing.enabled", prevBucketedRead)
    }
    spark.catalog.refreshTable(name)
    (filesBefore, tableFiles(spark, name), (System.nanoTime() - t0) / 1e9)
    }
}
