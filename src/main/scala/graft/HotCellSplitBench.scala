package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Hot-cell split priced at scale (SCALE.md): the claim under test is that
  * [[Reindex.splitHotCells]] repairs skewed geometry at CELL cost — each
  * split reads and rewrites the hot cell plus the handful of target cells
  * its rows re-home to, never the corpus — and that serving stays correct
  * across the pass (the probe finds the same neighbors through the child
  * cells).
  *
  * Shape: build the chunk store at a deliberately COARSE nlist (the
  * decade-stale state in which cells fatten — the same premise as
  * [[ReindexBench]], but here we repair the worst cells in place instead
  * of rebuilding the generation), snapshot the cell-size distribution,
  * split the fattest cells largest-first, and print one row per split
  * (bytes, rows moved, targets touched, wall) plus a before/after probe.
  * The per-split wall tracking cell bytes — with the corpus three decades
  * larger than any cell — is the cell-bounded evidence.
  *
  * Usage: `tools/run_main.sh graft.HotCellSplitBench [dir [nlist [maxSplits]]]`
  * — defaults: the ×1000 ScaleGen corpus, nlist = √n/8 (fat-cell shape),
  * 4 splits per pass (the cadence bound). */
object HotCellSplitBench {
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
      println(f"[split] $what: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val nChunks = timed("chunk table (ONCE per corpus)") {
      ChunkCatalog.flatChunks(spark, dir).count()
    }
    val sqrtN = math.max(16, math.sqrt(nChunks.toDouble).toInt)
    val nlist = args.lift(1).map(_.toInt).filter(_ > 0).getOrElse(math.max(16, sqrtN / 8))
    val maxSplits = args.lift(2).map(_.toInt).getOrElse(4)
    println(s"[split] corpus $dir: $nChunks chunks at fat-cell nlist=$nlist " +
      s"(√n=$sqrtN), up to $maxSplits splits this pass")

    timed(s"chunk store build at nlist=$nlist (ONCE)") {
      IvfCatalog.assignedChunks(spark, dir, nlist).count()
    }
    timed("docCells derivation (ONCE)") {
      DocLifecycle.docCells(spark, dir, nlist).count()
    }
    val store = IvfCatalog.chunkStoreName(dir, nlist)

    val stats = Compaction.partitionStats(spark, store).sortBy(-_.bytes)
    val median = stats(stats.size / 2).bytes
    println(f"[split] cell bytes: max=${stats.head.bytes / 1e6}%.1f MB  " +
      f"p90=${stats((stats.size * 0.1).toInt).bytes / 1e6}%.1f MB  " +
      f"median=${median / 1e6}%.1f MB  (${stats.size} cells)")

    // a probe that must survive the splits: nearest chunks to a real
    // document's embedding, captured before any geometry changes
    val probeText = "spark streaming vector search under maintenance"
    val nprobe = math.max(4, nlist / 16)
    def probeIds(): Seq[Long] = pipelines.Pipelines.flagshipIvf(spark, dir,
        queryText = probeText, nlist = nlist, nprobe = nprobe)
      .select($"document_id").as[Long].collect().toSeq
    val before = timed("probe BEFORE (fat cells)")(probeIds())

    // trigger on the skewed tail: everything fatter than 1.5× the median
    // is "hot" at this shape (the production default is an absolute byte
    // bound; the ratio form makes the bench corpus-independent)
    val threshold = (median * 1.5).toLong
    val reports = timed(f"splitHotCells pass (threshold=${threshold / 1e6}%.1f MB)") {
      Reindex.splitHotCells(spark, dir, nlist,
        maxCellBytes = threshold, maxSplits = maxSplits)
    }
    reports.foreach { r =>
      println(f"[split]   cell=${r.cell} ${r.bytes / 1e6}%.1f MB → " +
        f"kids=${r.children.mkString("/")} +${r.migrated.size} other targets, " +
        f"moved=${r.movedRows} rows, parentRetired=${r.parentRetired}, " +
        f"${r.seconds}%.1f s")
    }

    val after = timed("probe AFTER (split geometry)")(probeIds())
    val overlap = before.toSet.intersect(after.toSet).size
    println(s"[split] probe overlap after splits: $overlap/${before.size} " +
      s"(boundary rows may cost one extra probe until the next rebuild)")

    val statsAfter = Compaction.partitionStats(spark, store).sortBy(-_.bytes)
    println(f"[split] cell bytes after: max=${statsAfter.head.bytes / 1e6}%.1f MB " +
      f"(${statsAfter.size} cells; was ${stats.head.bytes / 1e6}%.1f MB over ${stats.size})")
    spark.stop()
  }
}
