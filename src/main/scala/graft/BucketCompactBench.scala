package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The cost side of the bucketed-catalog maintenance cadence (SCALE.md):
  * [[Compaction.compactBucketed]] is a FULL-TABLE rewrite (bucketed tables
  * have no partition directories to rewrite selectively), so its cadence
  * must be priced against the append rate — this harness measures the
  * rewrite at scale so "weekly is plenty" is a number, not an adjective.
  * Builds the stored dedup index (shingle + band tables) for `dir`, appends
  * `nBatches` increments of `batchPct`% fresh re-keyed documents (each
  * append adds one file per bucket per table), then times the bucketed
  * rewrite of both tables and reports file counts and bytes either side.
  *
  * Usage: `sbt "runMain graft.BucketCompactBench [dir [batchPct [nBatches]]]"`
  * — defaults to the ×10 ScaleGen corpus, 0.5% batches, 4 batches.
  */
object BucketCompactBench {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/graft_sf1")
    val batchPct = args.lift(1).map(_.toDouble).getOrElse(0.5)
    val nBatches = args.lift(2).map(_.toInt).getOrElse(4)
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
      println(f"[bcompact] $what: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val docs = Tables.documents(spark, dir)
    val nDocs = docs.count()
    println(s"[bcompact] corpus $dir: $nDocs documents, batch=$batchPct% × $nBatches")

    val shName = TableStore.tableName("dedup_sh", dir)
    val bandName = TableStore.tableName("dedup_bands", dir)
    Seq(shName, bandName).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    timed("stored dedup index build (shingles + bands, ONCE per corpus)") {
      BandCatalog.corpusBands(spark, dir).count()
    }

    val mod = math.max(nBatches.toLong, (100.0 / batchPct).toLong)
    (0 until nBatches).foreach { b =>
      val batch = docs.filter(pmod($"doc_id", lit(mod)) === b)
        .select(($"doc_id" + 900000000L * (b + 1)).as("doc_id"),
          concat(lit(s"fresh$b "), $"text").as("text"))
      timed(s"append batch $b (${batch.count()} docs into both bucketed tables)") {
        BandCatalog.appendBatch(spark, dir, batch)
      }
    }

    Seq(shName, bandName).foreach { t =>
      val rows = spark.table(t).count()
      val (files, c, s) = timed(s"compactBucketed $t ($rows rows)") {
        Compaction.compactBucketed(spark, t)
      }
      println(s"[bcompact] $t: files $files -> $c, ${s}s rewrite")
    }
    spark.stop()
  }
}
