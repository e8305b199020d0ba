package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Randomized exactness properties for the substring-span family: on seeded
  * random corpora over a tiny vocabulary (at most 5³ distinct 3-gram
  * windows → massive cross-document window sharing, far denser than any
  * fixture), the distributed operators must emit EXACTLY what a naive
  * single-machine reference computes — the digest/semi-join/window dataflow
  * is an execution strategy, never an approximation. */
class SpanPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val vocab = Array("alpha", "beta", "gamma", "delta", "eps")

  private def corpus(seed: Int, n: Int = 20): Seq[(Long, String)] = {
    val rng = new scala.util.Random(seed)
    (0L until n.toLong).map { id =>
      id -> Array.fill(4 + rng.nextInt(12))(vocab(rng.nextInt(vocab.length))).mkString(" ")
    }
  }

  /** Naive reference: positional k-grams, global occurrence counts,
    * per-doc interval merge with abutting-coverage union. */
  private def naiveSpans(docs: Seq[(Long, String)], k: Int,
                         minOcc: Int): Set[(Long, Long, Long)] = {
    val grams = docs.flatMap { case (id, t) =>
      val w = Dedup.wordsScala(t)
      if (w.length < k) Seq.empty
      else (0 to w.length - k).map(i => (id, i + 1, w.slice(i, i + k).mkString(" ")))
    }
    val counts = grams.groupBy(_._3).view.mapValues(_.size).toMap
    mergeNaive(grams.filter(g => counts(g._3) >= minOcc).map(g => (g._1, g._2)), k)
  }

  private def mergeNaive(flagged: Seq[(Long, Int)], k: Int): Set[(Long, Long, Long)] =
    flagged.groupBy(_._1).flatMap { case (id, fs) =>
      val spans = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      for (p <- fs.map(_._2).sorted) {
        val e = (p + k - 1).toLong
        if (spans.nonEmpty && p <= spans.last._2 + 1)
          spans(spans.length - 1) = (spans.last._1, math.max(spans.last._2, e))
        else spans += ((p.toLong, e))
      }
      spans.map { case (s, e) => (id, s, e) }
    }.toSet

  private def run(df: org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    df.as[(Long, Long, Long)].collect().toSet
  }

  test("duplicateSpans equals the naive reference on dense random corpora") {
    import spark.implicits._
    for (seed <- 1 to 5; minOcc <- Seq(2, 3)) {
      val docs = corpus(seed)
      val got = run(Dedup.duplicateSpans(docs.toDF("doc_id", "text"), k = 3,
        minOcc = minOcc))
      assert(got === naiveSpans(docs, 3, minOcc), s"seed=$seed minOcc=$minOcc")
      spark.sqlContext.clearCache()
    }
  }

  test("incremental flags equal the full-union spans restricted to the " +
       "batch, for any random batch/store split") {
    import spark.implicits._
    for (seed <- 1 to 5) {
      val docs = corpus(seed)
      val rng = new scala.util.Random(seed * 31)
      val (batch, stored) = docs.partition(_ => rng.nextBoolean())
      if (batch.nonEmpty) {
        val store = Dedup.spanGramCounts(stored.toDF("doc_id", "text"), k = 3)
        val got = run(Dedup.duplicateSpansIncremental(
          batch.toDF("doc_id", "text"), store, k = 3))
        val batchIds = batch.map(_._1).toSet
        assert(got === naiveSpans(docs, 3, 2).filter(s => batchIds(s._1)),
          s"seed=$seed")
      }
      spark.sqlContext.clearCache()
    }
  }

  test("contaminatedSpans equals the naive eval-membership reference") {
    import spark.implicits._
    for (seed <- 1 to 5) {
      val all = corpus(seed, n = 24)
      val (evalSet, train) = all.splitAt(4)
      val evalGrams = evalSet.flatMap { case (_, t) =>
        val w = Dedup.wordsScala(t)
        if (w.length < 3) Seq.empty
        else (0 to w.length - 3).map(i => w.slice(i, i + 3).mkString(" "))
      }.toSet
      val trainGrams = train.flatMap { case (id, t) =>
        val w = Dedup.wordsScala(t)
        if (w.length < 3) Seq.empty
        else (0 to w.length - 3).map(i => (id, i + 1, w.slice(i, i + 3).mkString(" ")))
      }
      val want = mergeNaive(
        trainGrams.filter(g => evalGrams(g._3)).map(g => (g._1, g._2)), 3)
      val got = run(Dedup.contaminatedSpans(train.toDF("doc_id", "text"),
        evalSet.toDF("doc_id", "text"), k = 3))
      assert(got === want, s"seed=$seed")
      spark.sqlContext.clearCache()
    }
  }

  test("scrubDuplicateSpans equals the naive span cut-out") {
    import spark.implicits._
    for (seed <- 6 to 8) {
      val docs = corpus(seed)
      val spans = naiveSpans(docs, 3, 2)
      val want = docs.flatMap { case (id, t) =>
        val inSpan = spans.collect { case (sid, s, e) if sid == id => (s, e) }
        if (inSpan.isEmpty) None
        else Some(id -> Dedup.wordsScala(t).zipWithIndex.collect {
          case (tok, i) if !inSpan.exists(se => i + 1 >= se._1 && i + 1 <= se._2) => tok
        }.mkString(" "))
      }.toMap
      val got = Dedup.scrubDuplicateSpans(docs.toDF("doc_id", "text"), k = 3)
        .as[(Long, String)].collect().toMap
      assert(got === want, s"seed=$seed")
      spark.sqlContext.clearCache()
    }
  }
}
