package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Duplicated-substring span dedup (Lee et al. 2022 re-expressed as
  * positional k-gram matching) on hand-built corpora where the maximal
  * spans are known exactly: cross-doc shared runs, within-doc repeats,
  * non-adjacent regions, the k boundary, and the scrub surface's
  * empty-string contract. */
class SpanDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def spans(df: org.apache.spark.sql.DataFrame, k: Int = 5,
                    minOcc: Int = 2): Set[(Long, Long, Long)] = {
    import spark.implicits._
    Dedup.duplicateSpans(df, k, minOcc)
      .as[(Long, Long, Long)].collect().toSet
  }

  test("a 6-token run shared by two docs merges its two 5-gram windows") {
    val got = spans(docs(
      1L -> "one two three four five six alpha",
      2L -> "zero one two three four five six beta"))
    assert(got === Set((1L, 1L, 6L), (2L, 2L, 7L)))
  }

  test("a within-doc repeat counts toward minOcc (suffix-array semantics)") {
    // duplicated windows at 1,2 (first copy) and 7,8 (second copy) cover
    // positions {1..6} ∪ {7..12} — contiguous, so ONE maximal span: the
    // whole doc is duplicated material (each half repeats the other)
    val got = spans(docs(3L -> "p1 q1 r1 s1 t1 u1 p1 q1 r1 s1 t1 u1"))
    assert(got === Set((3L, 1L, 12L)))
  }

  test("non-adjacent duplicated regions stay separate spans") {
    val got = spans(docs(
      4L -> "a1 b1 c1 d1 e1 gap1 gap2 gap3 a2 b2 c2 d2 e2",
      5L -> "a1 b1 c1 d1 e1 xx yy zz a2 b2 c2 d2 e2"))
    assert(got === Set(
      (4L, 1L, 5L), (4L, 9L, 13L),
      (5L, 1L, 5L), (5L, 9L, 13L)))
  }

  test("abutting duplicated regions merge across the 1-token seam") {
    // the two duplicated 5-runs are adjacent (positions 1-5 and 6-10):
    // intervals [1,5] and [6,10] touch, so one merged span comes out
    val got = spans(docs(
      6L -> "a1 b1 c1 d1 e1 f1 g1 h1 i1 j1",
      7L -> "a1 b1 c1 d1 e1 q9 q8 q7 q6 q5",
      8L -> "z9 z8 z7 z6 z5 f1 g1 h1 i1 j1"))
    assert(got.filter(_._1 == 6L) === Set((6L, 1L, 10L)))
  }

  test("a doc shorter than k tokens is never flagged; unique docs absent") {
    val got = spans(docs(
      9L -> "dup1 dup2 dup3 dup4",   // < k, even though repeated below
      10L -> "dup1 dup2 dup3 dup4",
      11L -> "lone1 lone2 lone3 lone4 lone5 lone6"))
    assert(got === Set.empty)
  }

  test("minOcc above the actual occurrence count suppresses the flag") {
    val d = docs(
      1L -> "one two three four five six alpha",
      2L -> "zero one two three four five six beta")
    assert(spans(d, minOcc = 3) === Set.empty)
    assert(spans(d, minOcc = 2).nonEmpty)
  }

  test("stats: duplicated-token accounting is exact and spans-only") {
    import spark.implicits._
    val got = Dedup.duplicateSpanStats(docs(
        1L -> "one two three four five six alpha",
        2L -> "zero one two three four five six beta",
        11L -> "lone1 lone2 lone3 lone4 lone5 lone6"))
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got === Set(
      (1L, 7L, 6L, 0.857143),
      (2L, 8L, 6L, 0.75)))
  }

  test("scrub removes span tokens, keeps the rest, and a wall-to-wall " +
       "duplicate scrubs to an explicit empty string") {
    import spark.implicits._
    val got = Dedup.scrubDuplicateSpans(docs(
        1L -> "one two three four five six alpha",
        2L -> "zero one two three four five six beta",
        3L -> "p1 q1 r1 s1 t1 u1 p1 q1 r1 s1 t1 u1",
        11L -> "lone1 lone2 lone3 lone4 lone5 lone6"))
      .as[(Long, String)].collect().toMap
    assert(got === Map(
      1L -> "alpha",
      2L -> "zero beta",
      3L -> ""))
  }

  test("incremental: batch flags against stored counts equal the full-run " +
       "spans restricted to the batch (store hit, batch-internal dup, " +
       "store-only dup invisible)") {
    import spark.implicits._
    val store = docs(
      100L -> "one two three four five six alpha",
      101L -> "s1 s2 s3 s4 s5 s6",           // duplicated only inside store
      102L -> "s1 s2 s3 s4 s5 s6")
    val batch = docs(
      1L -> "zero one two three four five six beta", // dup vs store
      2L -> "b1 b2 b3 b4 b5 filler",                 // dup within batch
      3L -> "pre b1 b2 b3 b4 b5",
      4L -> "u1 u2 u3 u4 u5 u6 u7")                  // unique everywhere
    val inc = Dedup.duplicateSpansIncremental(batch, Dedup.spanGramCounts(store))
      .as[(Long, Long, Long)].collect().toSet
    val full = Dedup.duplicateSpans(batch.unionByName(store))
      .as[(Long, Long, Long)].collect().toSet
    assert(inc === full.filter(_._1 < 100L))
    assert(inc === Set((1L, 2L, 7L), (2L, 1L, 5L), (3L, 2L, 6L)))
  }

  test("incremental: counts compose — a window seen once in store and " +
       "once in batch reaches minOcc 2, and minOcc 3 needs a third") {
    import spark.implicits._
    val store = docs(100L -> "c1 c2 c3 c4 c5 tail1")
    val batch = docs(1L -> "head1 c1 c2 c3 c4 c5")
    def inc(minOcc: Int) = Dedup.duplicateSpansIncremental(
        batch, Dedup.spanGramCounts(store), minOcc = minOcc)
      .as[(Long, Long, Long)].collect().toSet
    assert(inc(2) === Set((1L, 2L, 6L)))
    assert(inc(3) === Set.empty)
    // a second stored copy pushes the total to 3
    val store2 = store.unionByName(docs(101L -> "c1 c2 c3 c4 c5 tail2"))
    val got = Dedup.duplicateSpansIncremental(
        batch, Dedup.spanGramCounts(store2), minOcc = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 2L, 6L)))
  }

  test("incremental: an append-only count log (several parts per digest) " +
       "thresholds on the true summed total") {
    import spark.implicits._
    val batch = docs(1L -> "head1 c1 c2 c3 c4 c5")
    // the same stored doc ingested as two separate log parts: the digest
    // for "c1..c5" appears as two rows of occ=1 — a per-row threshold test
    // would see 1+1 < 3 twice and miss the flag; the true total is 3
    val partA = Dedup.spanGramCounts(docs(100L -> "c1 c2 c3 c4 c5 tail1"))
    val partB = Dedup.spanGramCounts(docs(101L -> "c1 c2 c3 c4 c5 tail2"))
    val log = partA.unionByName(partB)
    val got = Dedup.duplicateSpansIncremental(batch, log, minOcc = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 2L, 6L)))
    // and the folded (compacted) store gives the identical answer
    val folded = log.groupBy("h")
      .agg(org.apache.spark.sql.functions.sum("occ").as("occ"))
    val got2 = Dedup.duplicateSpansIncremental(batch, folded, minOcc = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(got2 === got)
  }

  test("contaminated spans: one eval occurrence flags (no count " +
       "threshold), train-internal duplication does not") {
    import spark.implicits._
    val evalSet = docs(
      900L -> "e1 e2 e3 e4 e5 endq",
      901L -> "tiny eval")                          // < k: contributes nothing
    val train = docs(
      1L -> "pre e1 e2 e3 e4 e5 post",              // shares the eval run
      2L -> "t1 t2 t3 t4 t5 filler",                // duplicated in TRAIN only
      3L -> "t1 t2 t3 t4 t5 other",
      4L -> "tiny eval")                            // shares only a <k string
    val got = Dedup.contaminatedSpans(train, evalSet, k = 5)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 2L, 6L)))
  }

  test("scrubSpans with an external span table: the contaminated run is " +
       "cut out, equivalent machinery to scrubDuplicateSpans") {
    import spark.implicits._
    val evalSet = docs(900L -> "e1 e2 e3 e4 e5 endq")
    val train = docs(1L -> "pre e1 e2 e3 e4 e5 post")
    val spans = Dedup.contaminatedSpans(train, evalSet, k = 5)
    val got = Dedup.scrubSpans(train, spans)
      .as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "pre post"))
    // and the duplicate-scrub surface is the same code path
    val viaDup = Dedup.scrubDuplicateSpans(docs(
      5L -> "one two three four five six alpha",
      6L -> "zero one two three four five six beta"))
      .as[(Long, String)].collect().toMap
    assert(viaDup === Map(5L -> "alpha", 6L -> "zero beta"))
  }

  test("guards: k < 2 and minOcc < 2 fail loudly") {
    val d = docs(1L -> "a b c")
    intercept[IllegalArgumentException](Dedup.duplicateSpans(d, k = 1))
    intercept[IllegalArgumentException](Dedup.duplicateSpans(d, minOcc = 1))
  }

  test("sliced full pass ≡ monolithic: digest-range slicing loses nothing " +
       "at slices = 1, 3, 8") {
    import spark.implicits._
    // every structural case above in one corpus: cross-doc share, within-
    // doc repeat, non-adjacent regions, a 3-way shared prefix, uniques
    val corpus = docs(
      1L -> "one two three four five six alpha",
      2L -> "zero one two three four five six beta",
      3L -> "p1 q1 r1 s1 t1 u1 p1 q1 r1 s1 t1 u1",
      4L -> "a1 b1 c1 d1 e1 gap1 gap2 gap3 a2 b2 c2 d2 e2",
      5L -> "a1 b1 c1 d1 e1 xx yy zz a2 b2 c2 d2 e2",
      6L -> "entirely unique tokens u3 u4 u5 u6",
      7L -> "one two three four five staggered tail words here")
    val mono = spans(corpus)
    assert(mono.nonEmpty) // the fixture must actually exercise the merge
    val tmp = java.nio.file.Files.createTempDirectory("graft_sliced").toString
    for (s <- Seq(1, 3, 8)) {
      val got = Dedup.duplicateSpansSliced(corpus, s"$tmp/s$s", slices = s)
        .as[(Long, Long, Long)].collect().toSet
      assert(got === mono, s"slices=$s diverged from the monolithic pass")
    }
    // custom column names (string id) ride the same scratch round-trip
    val renamed = corpus.select($"doc_id".cast("string").as("uri"),
      $"text".as("body"))
    val gotCustom = Dedup.duplicateSpansSliced(renamed, s"$tmp/custom",
        slices = 3, idCol = "uri", textCol = "body")
      .as[(String, Long, Long)].collect().toSet
    assert(gotCustom === mono.map { case (id, a, b) => (id.toString, a, b) })
  }

  test("spanWindowCount: one window per k-token position, short docs zero") {
    val corpus = docs(
      1L -> "one two three four five six",    // 6 tokens -> 2 windows at k=5
      2L -> "a b c",                          // < k -> 0
      3L -> "w1 w2 w3 w4 w5")                 // exactly k -> 1
    assert(Dedup.spanWindowCount(corpus) === 3L)
    assert(Dedup.spanWindowCount(corpus, k = 3) === 4L + 1L + 3L)
    assert(Dedup.spanWindowCount(docs()) === 0L)
  }

  test("recommendedSpanSlices reproduces the measured decade anchors and " +
       "rejects an unfittable budget loudly") {
    val usable60 = 60000000000L // the sandbox's ~60 GB (decimal, as reported)
    // x1000: 260M windows fit the monolithic pass (SCALE.md round-18
    // measured ~6.5 GB held, 58.6 GB low-water) -> S=1
    assert(Dedup.recommendedSpanSlices(
      Dedup.estimatedSpanGramBytes(260000000L), usable60) === 1)
    // x10000: 2.6B windows ENOSPC'd monolithic; S=8 completed at a
    // 27.9 GB low-water -> the estimator must pick 8 at ~60 GB usable
    assert(Dedup.recommendedSpanSlices(
      Dedup.estimatedSpanGramBytes(2600000000L), usable60) === 8)
    // loud reject: a corpus no slice count can bound to the budget must
    // throw, not silently return the cap and reintroduce the ENOSPC
    val e = intercept[IllegalArgumentException](
      Dedup.recommendedSpanSlices(
        Dedup.estimatedSpanGramBytes(2600000000L), 1L << 30))
    assert(e.getMessage.contains("64 slices cannot"))
    // degenerate inputs fail, never divide by zero
    intercept[IllegalArgumentException](
      Dedup.recommendedSpanSlices(100L, 0L))
    // empty corpus -> one pass
    assert(Dedup.recommendedSpanSlices(0L, usable60) === 1)
  }
}
