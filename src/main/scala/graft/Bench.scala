package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: pay session init + parquet reader + codegen/JIT once, untimed
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // N timed passes (default 5), min per query — the min of repeated runs is
    // the stable estimator on a co-tenant-noisy VM (noise only ever ADDS
    // time); one pass was not enough to tell a regression from a noisy
    // neighbour. A failed pass yields None (not its time-to-throw, which
    // would read as a spuriously fast result).
    def timeAll(): Map[String, Option[Double]] = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
      // operators persist() intermediates; drop them so cached blocks from
      // one query can't skew the next query's timing (release() also empties
      // the tracked-cache registry, so plan objects don't accumulate)
      Caches.release()
      spark.sqlContext.clearCache()
      name -> (if (ok) Some((System.nanoTime() - t0) / 1e9) else None)
    }
    val allPasses = Seq.fill(passes)(timeAll())
    // min over the SUCCESSFUL passes; a query that failed every pass is
    // reported as -1, excluded from the total, and listed in "failed" (so a
    // broken query can never read as a total-time improvement)
    val results = SparkEntry.queries.keys.map { name =>
      name -> allPasses.flatMap(_(name)).minOption
    }.toMap
    // Keep the line inside the harness's 2000-char stdout tail capture: full
    // nanosecond doubles made it ~1.5x that, cutting the head of the
    // per-query map in every round's record. Centisecond precision (noise on
    // this VM is >>10ms), trailing zeros stripped, entries fastest-first so
    // any residual truncation eats the cheap entries — the slow tails the
    // perf audit reads land at the end of the line.
    def fmt(v: Double): String = {
      val s = f"$v%.2f"
      if (s.contains('.')) s.reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse else s
    }
    val qs = results.toSeq.sortBy(_._2.getOrElse(-1.0))
      .map { case (k, v) => s"\"" + k + "\":" + fmt(v.getOrElse(-1.0)) }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, None) => k }.toSeq.sorted
    if (failed.nonEmpty) System.err.println(s"[bench] FAILED queries: ${failed.mkString(",")}")
    val failedJson =
      if (failed.isEmpty) "" else failed.map("\"" + _ + "\"").mkString(""","failed":[""", ",", "]")
    val total = results.values.flatten.sum
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"${new java.io.File(sfDir).getName}"$failedJson}"""
    // belt and braces: the complete line also lands in the repo, so the full
    // per-query record survives any stdout truncation
    try java.nio.file.Files.write(java.nio.file.Paths.get("/root/repo/BENCH_LOCAL.json"),
      (line + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    println(line)
    spark.stop()
  }
}
