package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    val sh = docs.select(col("doc_id"), graft.operators.Dedup.shingles(col("text"), 3).as("sh"))
    val stats = sh.select(avg(size(col("sh"))).as("avg_sh"), max(size(col("sh"))).as("max_sh")).head
    println(s"[probe] docs=${docs.count()} avg_shingles=${stats.getDouble(0)} max=${stats.getInt(1)}")
    val t0 = System.nanoTime()
    val n = graft.operators.Dedup.jaccardPairs(docs).count()
    println(s"[probe] verified pairs=$n in ${(System.nanoTime()-t0)/1e9}s")
    spark.stop()
  }
}
