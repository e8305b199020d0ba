package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Similarity, VectorSearch}

/** Measured ANN training quality (SCALE.md): recall@10 of seeded vs
  * k-means-trained IVF centroids and PQ codebooks over a fixture
  * directory's embeddings, against brute-force exact top-10 — the number
  * behind "swap in k-means for production quality". Same nlist / nprobe /
  * m / ksub / rerank for both trainings; only the training differs, so the
  * delta is the trained codebook's contribution.
  *
  * Usage: `sbt "runMain graft.RecallCurve [dir nQueries]"` — defaults to
  * the ScaleGen ×10 corpus with 20 deterministic query vectors.
  */
object RecallCurve {

  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/graft_sf1")
    val nQueries = args.lift(1).map(_.toInt).getOrElse(20)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val emb = Tables.embeddings(spark, dir).filter($"embedding".isNotNull).cache()
    val n = emb.count()

    // deterministic query sample spread across the id space
    val queries = emb.filter($"vec_id" % 97 === 3).orderBy($"vec_id".asc).limit(nQueries)
      .select($"vec_id".as("qid"), $"embedding".as("qvec")).cache()
    val qs = queries.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)

    val exact = VectorSearch.knnBatch(emb, queries, k = 10, idCol = "vec_id")
      .select($"qid", $"vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap

    def recall(hits: Map[Long, Set[Long]]): Double =
      qs.map { case (qid, _) => hits(qid).intersect(exact(qid)).size / 10.0 }.sum / qs.length

    def ivfRecall(cents: org.apache.spark.sql.DataFrame, nprobe: Int): Double = {
      val c = cents.cache(); c.count()
      recall(qs.map { case (qid, qv) =>
        qid -> Similarity.ivfSearch(emb, c, qv, k = 10, nprobe = nprobe)
          .select("vec_id").collect().map(_.getLong(0)).toSet
      }.toMap)
    }

    def pqRecall(cb: Similarity.PqCodebook): Double = {
      val codes = Similarity.pqEncode(emb, cb).cache(); codes.count()
      val r = recall(qs.map { case (qid, qv) =>
        qid -> Similarity.pqSearch(codes, emb, cb, qv, k = 10)
          .select("vec_id").collect().map(_.getLong(0)).toSet
      }.toMap)
      codes.unpersist()
      r
    }

    // the STORED catalog path: partition-pruned probes over the
    // centroid_id-partitioned table, both build modes — the number that
    // says the production (trained) catalog build keeps the live-search
    // recall win when probes read the store instead of re-assigning
    def storeRecall(trained: Boolean): Double = {
      val store = IvfCatalog.assignedEmbeddings(spark, dir, 64, 31L, trained)
      val c = IvfCatalog.centroidsFor(spark, dir, 64, 31L, trained).cache(); c.count()
      recall(qs.map { case (qid, qv) =>
        qid -> Similarity.ivfSearchPruned(store, c, qv, k = 10, nprobe = 8)
          .select("vec_id").collect().map(_.getLong(0)).toSet
      }.toMap)
    }

    val ivfSeeded = ivfRecall(Similarity.seededCentroids(emb, 64, 31L), nprobe = 8)
    val ivfTrained = ivfRecall(Similarity.kmeansCentroids(emb, 64), nprobe = 8)
    val pqSeeded = pqRecall(Similarity.pqTrainSeeded(emb, m = 8, ksub = 16, step = 31L))
    val pqTrained = pqRecall(Similarity.pqTrainKmeans(emb, m = 8, ksub = 16))
    val storeSeeded = storeRecall(trained = false)
    val storeTrained = storeRecall(trained = true)

    println(f"[recall] dir=$dir vectors=$n queries=${qs.length}")
    println(f"[recall] ivf nlist=64 nprobe=8: seeded=$ivfSeeded%.3f kmeans=$ivfTrained%.3f")
    println(f"[recall] pq m=8 ksub=16 rerank=8x: seeded=$pqSeeded%.3f kmeans=$pqTrained%.3f")
    println(f"[recall] stored catalog (pruned probes): seeded=$storeSeeded%.3f kmeans=$storeTrained%.3f")
    spark.stop()
  }
}
