package graft
import org.apache.spark.sql.SparkSession
object Bench {
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
    // warmup: pay session init + parquet reader + codegen/JIT once, untimed
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // two timed passes, min per query — damps co-tenant noise without
    // changing what is measured. A failed pass yields None (not its
    // time-to-throw, which would read as a spuriously fast result).
    def timeAll(): Map[String, Option[Double]] = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
      // operators persist() intermediates; drop them so cached blocks from
      // one query can't skew the next query's timing
      spark.sqlContext.clearCache()
      name -> (if (ok) Some((System.nanoTime() - t0) / 1e9) else None)
    }
    val (pass1, pass2) = (timeAll(), timeAll())
    // min over the SUCCESSFUL passes; a query that failed both passes is
    // reported as -1 and excluded from the total
    val results = pass1.map { case (name, t1) =>
      name -> (t1.toSeq ++ pass2(name).toSeq).minOption
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v.getOrElse(-1.0) }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, None) => k }
    if (failed.nonEmpty) System.err.println(s"[bench] FAILED queries: ${failed.mkString(",")}")
    val total = results.values.flatten.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
