package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity
import graft.functions.VectorFunctions.cosineArrays

/** The two-level coarse IVF assignment ([[Similarity.ivfAssign]] past
  * `graft.ivf.coarseAssign.threshold`): the build-cost fix for √n-scaled
  * nlist (brute-force assign is O(n^1.5·d) under the law — the ×10000
  * build bottleneck). Approximate by design; this spec pins HOW
  * approximate on the fixture: agreement with the exact argmax, a bound
  * on the cosine a disagreeing row gives up, determinism, the null-row
  * manifest contract, and probe-recall parity over a coarse-assigned
  * store. */
class CoarseAssignSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.warehouse.dir", "/tmp/graft_test_warehouse")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def withCoarse[A](threshold: Int, refine: Int = 4)(body: => A): A = {
    spark.conf.set("graft.ivf.coarseAssign.threshold", threshold.toString)
    spark.conf.set("graft.ivf.coarseAssign.refine", refine.toString)
    try body
    finally {
      spark.conf.unset("graft.ivf.coarseAssign.threshold")
      spark.conf.unset("graft.ivf.coarseAssign.refine")
    }
  }

  test("coarse assignment agrees with the exact argmax on most rows and never gives up much cosine") {
    val emb = Tables.embeddings(spark, dir)
    val cents = Similarity.hashSeededCentroids(emb, 64).localCheckpoint(true)
    val exact = Similarity.ivfAssign(emb, cents)
      .select("vec_id", "centroid_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val coarse = withCoarse(threshold = 1) {
      Similarity.ivfAssign(emb, cents)
        .select("vec_id", "centroid_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    }
    assert(coarse.keySet === exact.keySet, "every row assigned in both modes")
    val n = exact.size
    val agree = exact.count { case (id, cid) => coarse(id) == cid }
    // measured 93–97% on the fixture at refine=4; pin a conservative floor
    assert(agree.toDouble / n >= 0.85,
      s"coarse/exact agreement ${agree.toDouble / n} fell below 0.85 ($agree/$n)")
    // disagreeing rows: the chosen cell's cosine is close behind the best —
    // the row sits in a near-nearest cell, the drift the probe absorbs.
    // Per-row tail bounded loosely (fixture vectors are near-random, so
    // individual cosines are small and gaps noisy); the MEAN give-up over
    // ALL rows is the quantity the probe budget actually pays, pinned tight.
    val cvecs = cents.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
    val vecs = emb.select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
    var giveSum = 0.0
    exact.foreach { case (id, bestCid) =>
      val got = coarse(id)
      if (got != bestCid) {
        val v = vecs(id)
        val give = cosineArrays(v, cvecs(bestCid)) - cosineArrays(v, cvecs(got))
        assert(give >= -1e-9 && give <= 0.25,
          s"row $id gave up $give cosine (exact cell $bestCid vs coarse $got)")
        giveSum += give
      }
    }
    info(f"mean cosine given up across ALL rows: ${giveSum / n}%.4f")
    assert(giveSum / n <= 0.02,
      f"mean cosine give-up ${giveSum / n}%.4f exceeded 0.02")
    // determinism: a second pass is bit-identical
    val again = withCoarse(threshold = 1) {
      Similarity.ivfAssign(emb, cents)
        .select("vec_id", "centroid_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    }
    assert(again === coarse)
  }

  test("null embeddings keep the complete-manifest contract (smallest centroid id) under coarse") {
    import spark.implicits._
    val cents = Seq((3L, Seq(1f, 0f)), (7L, Seq(0f, 1f)), (9L, Seq(0.7f, 0.7f)))
      .toDF("centroid_id", "centroid_vec")
      .select(col("centroid_id"), col("centroid_vec").cast("array<float>").as("centroid_vec"))
    val rows = Seq((1L, Seq(0.9f, 0.1f)), (2L, null.asInstanceOf[Seq[Float]]))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val got = withCoarse(threshold = 1, refine = 1) {
      Similarity.ivfAssign(rows, cents)
        .select("vec_id", "centroid_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    }
    assert(got(2L) === 3L, "a null embedding lands in the smallest centroid id")
    assert(got(1L) === 3L, "(1,0)-ish row belongs with the (1,0) centroid")
  }

  test("probe recall over a coarse-assigned store matches the exact-assigned store within the probe budget") {
    val emb = Tables.embeddings(spark, dir).filter(col("embedding").isNotNull)
    val cents = Similarity.hashSeededCentroids(emb, 64).localCheckpoint(true)
    val exactStore = Similarity.ivfAssign(emb, cents).localCheckpoint(true)
    val coarseStore = withCoarse(threshold = 1) {
      Similarity.ivfAssign(emb, cents).localCheckpoint(true)
    }
    val queries = emb.orderBy(col("vec_id")).limit(8)
      .select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def recall(store: org.apache.spark.sql.DataFrame, qv: Array[Float],
               truth: Set[Long]): Double = {
      val got = Similarity.ivfSearchPruned(store, cents, qv, k = 10, nprobe = 8)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      got.intersect(truth).size.toDouble / truth.size
    }
    var exactSum = 0.0
    var coarseSum = 0.0
    queries.foreach { case (_, qv) =>
      val qvLit = array(qv.map(x => lit(x)): _*)
      val truth = emb
        .withColumn("__cos",
          graft.functions.VectorFunctions.cosineSimilarity(col("embedding"), qvLit))
        .orderBy(col("__cos").desc, col("vec_id").asc).limit(10)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      exactSum += recall(exactStore, qv, truth)
      coarseSum += recall(coarseStore, qv, truth)
    }
    val (exactR, coarseR) = (exactSum / queries.length, coarseSum / queries.length)
    info(f"recall@10 nprobe=8/64: exact-assigned $exactR%.3f coarse-assigned $coarseR%.3f")
    assert(coarseR >= exactR - 0.1,
      f"coarse-assigned store recall $coarseR%.3f fell more than 0.1 below exact $exactR%.3f")
  }
}
