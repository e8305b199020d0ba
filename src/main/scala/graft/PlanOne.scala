package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev tool (optimization rounds): dump the formatted physical plan of the
  * named registered queries to `plans/<tag>/<name>_<suffix>.txt` — the
  * before/after plan evidence the optimization deliverables require.
  *
  * Usage: PlanOne <tag> <suffix> <name> [name ...]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1 — plans are dumped at the bench's
  * own scale so scan/exchange shapes match what the bench times),
  * SPARK_GRAFT_CPUS (default 4).
  */
object PlanOne {
  def main(args: Array[String]): Unit = {
    val (tag, suffix) = (args(0), args(1))
    val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.dataSizedShuffle(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
        .config("spark.ui.enabled", "false"), cpus.toInt, sfDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(s"plans/$tag"))
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      Files.writeString(Paths.get(s"plans/$tag/${name}_$suffix.txt"),
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      Caches.release(); spark.sqlContext.clearCache()
      println(s"[planone] wrote plans/$tag/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
