package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Randomized exactness properties for the dedup pair generators: on seeded
  * random corpora (tiny vocabulary → heavy cross-document shingle sharing,
  * plus planted mutated near-copies), the distributed SSJoin prefix-filter
  * path must emit EXACTLY the naive all-pairs verified set — the prefix
  * filter is a pruning optimization, never an approximation. */
class DedupPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val vocab = Array("alpha", "beta", "gamma", "delta", "eps")

  private def corpus(seed: Int): Seq[(Long, String)] = {
    val rng = new scala.util.Random(seed)
    val base = (0L until 16L).map { id =>
      id -> Array.fill(8 + rng.nextInt(10))(vocab(rng.nextInt(vocab.length))).mkString(" ")
    }
    // planted near-copies: append one word to a random base doc
    val copies = (0 until 4).map { i =>
      val (srcId, text) = base(rng.nextInt(base.length))
      (100L + i) -> (text + " " + vocab(rng.nextInt(vocab.length)))
    }
    base ++ copies
  }

  private def naivePairs(docs: Seq[(Long, String)], t: Double): Set[(Long, Long, Double)] =
    (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      sa = Dedup.shinglesScala(ta, 3).toSet
      sb = Dedup.shinglesScala(tb, 3).toSet
      common = (sa intersect sb).size.toDouble
      j = common / (sa.size + sb.size - common)
      if j >= t
    } yield (ia, ib, j)).toSet

  test("SSJoin prefix filtering is exact on random shared-vocabulary corpora") {
    import spark.implicits._
    for (seed <- 1 to 5) {
      val docs = corpus(seed)
      val got = Dedup.jaccardPairs(docs.toDF("doc_id", "text"), threshold = 0.8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val want = naivePairs(docs, 0.8)
      assert(got === want, s"seed=$seed")
      spark.sqlContext.clearCache()
    }
  }

  test("minHash verified pairs are a subset of ground truth with full recall on strong pairs") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val docs = corpus(seed)
      val truth = naivePairs(docs, 0.8).map(p => (p._1, p._2))
      val mh = Dedup.minHashPairs(docs.toDF("doc_id", "text"), threshold = 0.8)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // verification makes precision exact; banding recall on >=0.9-jaccard
      // pairs is near-certain (miss prob < 1e-5 per pair)
      assert(mh.subsetOf(truth), s"seed=$seed false positives")
      val strong = naivePairs(docs, 0.9).map(p => (p._1, p._2))
      assert(strong.subsetOf(mh), s"seed=$seed missed strong pairs")
      spark.sqlContext.clearCache()
    }
  }

  test("hot-bucket cap bounds candidate volume quadratically and keeps the smallest-id representatives pairable") {
    import spark.implicits._
    // one boilerplate cluster: 40 identical docs — every band bucket holds
    // all 40, the D²/2 pathology in miniature
    val boiler = (0L until 40L).map(id => (id, "the same cookie banner text repeated across the whole crawl"))
    val df = boiler.toDF("doc_id", "text")
    val capped = Dedup.minHashPairs(df, maxBucket = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exactly the C(8,2) pairs among ids 0..7 — deterministic representatives
    val want = (for { a <- 0L until 8L; b <- (a + 1) until 8L } yield (a, b)).toSet
    assert(capped === want,
      "cap keeps the 8 smallest ids per bucket; all and only their pairs survive")
    // uncapped: the full quadratic set, confirming the guard is what bounded it
    val uncapped = Dedup.minHashPairs(df, maxBucket = 0).count()
    assert(uncapped === 40L * 39 / 2)
    // connected components over the capped pairs still collapse the cluster
    // representatives into ONE group — the dedup outcome survives the cap
    val comps = graft.operators.Clusters.connectedComponents(
      capped.toSeq.toDF("id_a", "id_b"))
    assert(comps.select("cluster_id").distinct().count() === 1L)
    spark.sqlContext.clearCache()
  }

  test("embedding LSH hot-bucket cap: identical vectors collapse to capped representatives, distinct vectors unaffected") {
    import spark.implicits._
    val hot = (0L until 30L).map(id => (id, Array.fill(8)(0.5f)))
    val cold = Seq((100L, Array.tabulate(8)(i => if (i == 0) 1.0f else 0.0f)),
                   (101L, Array.tabulate(8)(i => if (i == 1) 1.0f else 0.0f)))
    val df = (hot ++ cold).toDF("vec_id", "embedding")
    val cands = graft.operators.Similarity.lshCandidates(
      df, minCosine = 0.9, maxBucket = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands === (for { a <- 0L until 5L; b <- (a + 1) until 5L } yield (a, b)).toSet,
      "every bucket truncates to ids 0..4; the orthogonal vectors pair with nothing")
    val uncapped = graft.operators.Similarity.lshCandidates(
      df, minCosine = 0.9, maxBucket = 0).count()
    // at least the hot cluster's full quadratic set (stray projection
    // collisions with the cold vectors may add a few more)
    assert(uncapped >= 30L * 29 / 2)
    spark.sqlContext.clearCache()
  }
}
