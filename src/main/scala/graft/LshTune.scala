package graft
import org.apache.spark.sql.SparkSession
import graft.operators.{Dedup, Similarity, VectorSearch}

/** One-off tuning probe for the LSH pair join: per bucketLength, time /
  * emitted pairs / recall vs the exact pair set. */
object LshTune {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, sfDir)
    val exact = VectorSearch.similarityJoin(emb, 0.45, idCol = "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"[lshtune] exact pairs: ${exact.size}")
    for (bl <- args.map(_.toDouble)) {
      val t0 = System.nanoTime()
      val pairs = Similarity.lshJoin(emb, 0.45, bucketLength = bl)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val secs = (System.nanoTime() - t0) / 1e9
      val recall = if (exact.isEmpty) 1.0 else exact.intersect(pairs).size.toDouble / exact.size
      println(f"[lshtune] bl=$bl%4.2f  time=$secs%5.2f s  pairs=${pairs.size}%4d  recall=$recall%.3f")
      spark.sqlContext.clearCache()
    }
    spark.stop()
  }
}
