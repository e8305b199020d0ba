package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures [[Compaction.compactTable]]'s residual race window at scale
  * (SCALE.md): the span from the late-append fingerprint re-list to the
  * overwrite job's completed commit, per rewrite batch — the one interval
  * the fingerprint defense cannot see into, and therefore the number that
  * says what "quiesce high-rate writers during maintenance" actually costs
  * in exposure. Builds the vector store, fragments a slice of its cells
  * with appended batches (the ingest loop's write shape), then compacts and
  * prints the Report including `commitWindowSeconds`.
  *
  * Usage: `sbt "runMain graft.MaintenanceWindowBench [dir [nlist [nBatches]]]"`
  * — defaults to the ×1000 ScaleGen corpus, √n cells, 6 appended batches.
  */
object MaintenanceWindowBench {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/graft_sf100")
    val nBatches = args.lift(2).map(_.toInt).getOrElse(6)
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
      println(f"[maintwindow] $what: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val emb = Tables.embeddings(spark, dir)
    val n = emb.count()
    val nlist = args.lift(1).map(_.toInt).getOrElse(
      math.max(16, math.sqrt(n.toDouble).toInt))
    println(s"[maintwindow] corpus $dir: $n vectors, nlist=$nlist, $nBatches appended batches")
    timed("vector store build (ONCE)") {
      IvfCatalog.assignedEmbeddings(spark, dir, nlist, 31L).count()
    }

    // fragment: nBatches appends of 0.2% corpus slices re-tagged fresh —
    // each lands one file per touched cell, the ingest loop's write shape
    (0 until nBatches).foreach { b =>
      val batch = emb.filter(pmod($"vec_id", lit(500L)) === b)
        .select(($"vec_id" + 300000000L + b * 10000000L).as("vec_id"), $"embedding")
      timed(s"appendBatch ${b + 1}/$nBatches") {
        IvfCatalog.appendBatch(spark, dir, batch, nlist, 31L)
      }
    }

    val name = IvfCatalog.vectorStoreName(dir, nlist, 31L)
    val report = timed("compactTable") {
      Compaction.compactTable(spark, name)
    }
    println(f"[maintwindow] partitions scanned=${report.scanned} " +
      f"rewritten=${report.compacted.size} files ${report.filesBefore}→${report.filesAfter} " +
      f"aborted=${report.aborted.size}")
    println(f"[maintwindow] COMMIT WINDOW (re-list → commit done, max over batches): " +
      f"${report.commitWindowSeconds}%.2f s of ${report.seconds}%.1f s total — " +
      "the only unfenced interval; everything earlier is fingerprint-detected")
    spark.stop()
  }
}
