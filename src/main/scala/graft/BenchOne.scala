package graft
import org.apache.spark.sql.SparkSession

/** Focused timing of a few registered queries (args: names...), three passes
  * each after a warmup — for isolating a bench tail from VM noise without
  * paying for the full Bench sweep. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    for (name <- args; fn = SparkEntry.queries(name)) {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        spark.sqlContext.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[benchone] $name%-28s min=${times.min}%6.2f  runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
