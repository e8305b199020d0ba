package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
  *  1. list the table's partition directories, count data files and bytes;
  *  2. select partitions with more files than their bin-packed count
  *     `ceil(bytes / targetBytes)` (and at least `minFiles` — singletons are
  *     never rewritten);
  *  3. per batch of selected partitions (bounded by `maxBatchBytes`, so the
  *     rewrite's working set is capped no matter how fragmented the store
  *     got): partition-pruned read of just those directories, spill to a
  *     temp parquet dir (Spark refuses to overwrite a table from a plan
  *     that reads it — the temp hop breaks the cycle durably, not via
  *     driver/executor memory), then a dynamic-partition-overwrite
  *     `insertInto` repartitioned by (partition column, bucket) where
  *     `bucket = pmod(xxhash64(id), filesTarget)` — ≤ filesTarget files per
  *     partition, each ≈ `targetBytes`.
  *
  * Row content is untouched — same rows, same partition values, fewer
  * files — so digests over (id, partition) pin the rewrite exactly
  * (CompactionSpec). Readers in other sessions observe the compacted
  * layout through [[TableStore.getOrBuild]]'s reader-side refresh, same
  * visibility contract as appends.
  *
  * On a cluster the identical code runs as a scheduled maintenance job
  * (the pattern behind Delta/Iceberg OPTIMIZE, re-expressed on plain
  * partitioned parquet); `maxBatchBytes` keeps each rewrite a small bounded
  * job that never blocks ingest for long.
  */
object Compaction {

  /** One partition directory's health: `spec` is the directory name
    * (`centroid_id=17`), `files` its data-file count, `bytes` their sum. */
  case class PartitionStats(spec: String, files: Int, bytes: Long) {
    /** Bin-packed file count at `target` bytes — what compaction rewrites
      * this partition down to. */
    def packedFiles(target: Long): Int =
      math.max(1, math.ceil(bytes.toDouble / target).toInt)
  }

  case class Report(scanned: Int, compacted: Seq[PartitionStats],
                    filesBefore: Int, filesAfter: Int, seconds: Double)

  private def dataFiles(fs: org.apache.hadoop.fs.FileSystem,
                        dir: org.apache.hadoop.fs.Path) =
    fs.listStatus(dir).toSeq.filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }

  private def tableMeta(spark: SparkSession, name: String) =
    spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(name))

  /** FS listing of every partition directory of catalog table `name`. */
  def partitionStats(spark: SparkSession, name: String): Seq[PartitionStats] = {
    val meta = tableMeta(spark, name)
    val root = new org.apache.hadoop.fs.Path(meta.location)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.contains("="))
      .map { st =>
        val files = dataFiles(fs, st.getPath)
        PartitionStats(st.getPath.getName, files.size, files.map(_.getLen).sum)
      }
      .sortBy(_.spec)
  }

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
    */
  def compactTable(spark: SparkSession, name: String,
                   targetBytes: Long = 128L << 20,
                   minFiles: Int = 2,
                   maxBatchBytes: Long = 4L << 30,
                   idCol: String = "vec_id"): Report = {
    val t0 = System.nanoTime()
    val all = partitionStats(spark, name)
    // null-partition dirs (__HIVE_DEFAULT_PARTITION__) can't round-trip
    // through a typed literal filter; leave them to a manual pass
    val need = all.filter(p => p.files >= minFiles && p.files > p.packedFiles(targetBytes) &&
      !p.spec.endsWith("__HIVE_DEFAULT_PARTITION__"))
    if (need.isEmpty)
      return Report(all.size, Nil, all.map(_.files).sum, all.map(_.files).sum, 0.0)

    val meta = tableMeta(spark, name)
    val partCols = meta.partitionColumnNames
    require(partCols.size == 1,
      s"compactTable handles single-column partitioning; $name has $partCols")
    val partCol = partCols.head
    val partType = spark.table(name).schema(partCol).dataType

    // batch the rewrites so the working set stays bounded
    val batches = need.foldLeft(List(List.empty[PartitionStats])) { (acc, p) =>
      if (acc.head.map(_.bytes).sum + p.bytes > maxBatchBytes && acc.head.nonEmpty)
        List(p) :: acc
      else (p :: acc.head) :: acc.tail
    }.map(_.reverse).reverse.filter(_.nonEmpty)

    val prevMode = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      batches.foreach { batch =>
        val values = batch.map(_.spec.split("=", 2)(1))
        val typedVals = values.map(v => lit(v).cast(partType))
        // per-partition output-file target, joined in as a broadcast map
        val packed = typedVals.zip(batch.map(p => lit(p.packedFiles(targetBytes))))
        val nfCol = packed.foldLeft(lit(1)) { case (acc, (v, nf)) =>
          when(col(partCol) === v, nf).otherwise(acc)
        }
        val bucketKey =
          if (spark.table(name).columns.contains(idCol)) idCol
          else spark.table(name).columns.filterNot(_ == partCol).head
        val selected = spark.table(name)
          .filter(col(partCol).isin(typedVals: _*))
          .withColumn("__bucket", pmod(xxhash64(col(bucketKey)), nfCol))
        // temp hop: can't overwrite a table from a plan that reads it
        val tmp = new org.apache.hadoop.fs.Path(
          spark.conf.get("spark.sql.warehouse.dir"), s"__compact_tmp_$name")
        val fs = tmp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        selected.write.mode("overwrite").parquet(tmp.toString)
        val nBuckets = batch.map(_.packedFiles(targetBytes)).sum
        val staged = spark.read.parquet(tmp.toString)
        val cols = spark.table(name).columns
        staged
          .repartition(math.max(nBuckets * 2, 1), col(partCol), col("__bucket"))
          .select(cols.map(col).toIndexedSeq: _*)
          .write.mode("overwrite").insertInto(name)
        fs.delete(tmp, true)
      }
      spark.catalog.refreshTable(name)
    } finally {
      prevMode match {
        case Some(m) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", m)
        case None    => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }

    val after = partitionStats(spark, name)
    Report(all.size, need,
      all.map(_.files).sum, after.map(_.files).sum,
      (System.nanoTime() - t0) / 1e9)
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
    * exchange-free probe joins — survives byte-for-byte). The rewrite
    * stages through a temp parquet dir (same self-overwrite rule as the
    * partitioned path) and costs a full-table pass; cadence it accordingly
    * — for an index that ingests daily increments, weekly is plenty, and
    * the cost scales with the INDEX, which bucketing already sized to be
    * scanned. Returns (files before, files after, seconds). */
  def compactBucketed(spark: SparkSession, name: String): (Int, Int, Double) = {
    val t0 = System.nanoTime()
    val meta = tableMeta(spark, name)
    val bucketSpec = meta.bucketSpec.getOrElse(
      sys.error(s"$name is not bucketed — use compactTable for partitioned stores"))
    val filesBefore = tableFiles(spark, name)
    val tmp = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), s"__compact_tmp_$name")
    val fs = tmp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.table(name).write.mode("overwrite").parquet(tmp.toString)
    val cols = bucketSpec.bucketColumnNames.map(col)
    val staged = spark.read.parquet(tmp.toString)
      .repartition(bucketSpec.numBuckets, cols: _*) // clusterWrite: one file per bucket
    val writer = staged.write.mode("overwrite")
      .bucketBy(bucketSpec.numBuckets,
        bucketSpec.bucketColumnNames.head, bucketSpec.bucketColumnNames.tail: _*)
    (if (bucketSpec.sortColumnNames.nonEmpty)
       writer.sortBy(bucketSpec.sortColumnNames.head, bucketSpec.sortColumnNames.tail: _*)
     else writer)
      .format("parquet").saveAsTable(name)
    fs.delete(tmp, true)
    spark.catalog.refreshTable(name)
    (filesBefore, tableFiles(spark, name), (System.nanoTime() - t0) / 1e9)
  }
}
