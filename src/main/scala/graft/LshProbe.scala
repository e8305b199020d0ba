package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object LshProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, sfDir)
    val dim = emb.select(size(col("embedding")).as("d")).head.getInt(0)
    val rng = new scala.util.Random(42L)
    val projections = Array.fill(8) {
      val v = Array.fill(dim)(rng.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val bucketsUdf = udf((a: Seq[Float]) => {
      var norm = 0.0; a.foreach(x => norm += x.toDouble * x)
      val inv = 1.0 / math.sqrt(norm)
      Array.tabulate(8) { t =>
        val p = projections(t); var dot = 0.0; var i = 0
        while (i < math.min(a.length, dim)) { dot += a(i) * inv * p(i); i += 1 }
        math.floor(dot / 0.25).toLong
      }
    })
    val hashed = emb.select(col("vec_id"), posexplode(bucketsUdf(col("embedding"))).as(Seq("tbl","bucket")))
    val cand = hashed.select(col("tbl"), col("bucket"), col("vec_id").as("a"))
      .join(hashed.select(col("tbl"), col("bucket"), col("vec_id").as("b")), Seq("tbl","bucket"))
      .filter(col("a") < col("b")).select("a","b")
    println(s"[lshprobe] pre-distinct=${cand.count()} distinct=${cand.distinct().count()}")
    spark.stop()
  }
}
