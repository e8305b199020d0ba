package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Per-batch latency of the streaming ingest loop
  * ([[streaming.StreamingIngest]]) against a stored IVF index at scale —
  * the SCALE.md row behind "per-batch cost ∝ batch × its probed cells".
  * Batches are deterministic corpus slices re-tagged as fresh ids, fed
  * through a MemoryStream so the measured path is exactly the production
  * `foreachBatch` loop (flag against the store's pruned partitions, append
  * survivors into the cell layout).
  *
  * Usage: `sbt "runMain graft.IngestStreamBench [dir [nlist [batchPct [nBatches]]]]"`
  * — defaults to the ×10 ScaleGen corpus, seeded centroids (the mode whose
  * store the fixture suite also builds), 0.5% batches, 4 batches.
  */
object IngestStreamBench {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/graft_sf1")
    val batchPct = args.lift(2).map(_.toDouble).getOrElse(0.5)
    val nBatches = args.lift(3).map(_.toInt).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.dataSizedShuffle(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
        .config("spark.ui.enabled", "false"), cpus.toInt, dir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val emb = Tables.embeddings(spark, dir)
    val n = emb.count()
    val nlist = args.lift(1).map(_.toInt).getOrElse(math.max(16, math.sqrt(n.toDouble).toInt))
    println(s"[ingeststream] corpus $dir: $n vectors, nlist=$nlist, " +
      s"batch=$batchPct% × $nBatches")
    val t0 = System.nanoTime()
    IvfCatalog.assignedEmbeddings(spark, dir, nlist, 31L).count()
    println(f"[ingeststream] store ready in ${(System.nanoTime() - t0) / 1e9}%.1f s (build-once)")

    // batch b = corpus rows with id ≡ b (mod 100/batchPct), re-tagged fresh.
    // Even ids keep the stored vector verbatim (guaranteed near-dup of the
    // store → exercises the drop path); odd ids are negated (cosine −1 to
    // their original → survive and exercise the append path). Each batch
    // therefore pays both halves of the production loop.
    val mod = math.max(nBatches.toLong, (100.0 / batchPct).toLong)
    val batches = (0 until nBatches).map { b =>
      emb.filter(pmod($"vec_id", lit(mod)) === b)
        .select(($"vec_id" + 200000000L).as("vec_id"),
          when(pmod($"vec_id", lit(2)) === 0, $"embedding")
            .otherwise(transform($"embedding", x => -x)).as("embedding"))
        .as[(Long, Seq[Float])].collect().toSeq
    }

    val source = MemoryStream[(Long, Seq[Float])]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ingestbench_ckpt").toString
    val q = streaming.StreamingIngest.start(
      source.toDF().toDF("vec_id", "embedding"), dir, ckpt, nlist, 31L,
      onBatch = r => println(f"[ingeststream] batch ${r.batchId}: arrived=${r.arrived} " +
        f"dropped=${r.dropped} appended=${r.appended} latency=${r.seconds}%.2f s"))
    batches.foreach { b => source.addData(b: _*); q.processAllAvailable() }
    q.stop()
    println(s"[ingeststream] store rows after ${nBatches} batches: " +
      IvfCatalog.assignedEmbeddings(spark, dir, nlist, 31L).count())

    // maintenance half: every append leaves one file per (task × cell), so
    // the store fragments with batch count — compact the touched cells back
    // to their bin-packed size and show the probe-visible file count drop
    val store = TableStore.tableName(s"ivf${nlist}_31", dir)
    val frag = Compaction.partitionStats(spark, store)
    println(s"[ingeststream] store files before compaction: total=${frag.map(_.files).sum} " +
      s"max/cell=${frag.map(_.files).max} cells=${frag.size}")
    val rep = Compaction.compactTable(spark, store)
    println(f"[ingeststream] compaction: ${rep.compacted.size} cells rewritten, " +
      f"files ${rep.filesBefore} -> ${rep.filesAfter}, ${rep.seconds}%.1f s")
    spark.stop()
  }
}
