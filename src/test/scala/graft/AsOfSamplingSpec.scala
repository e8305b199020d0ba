package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{AsOf, Sampling}

/** Edge-case specs for the as-of join (tie semantics the fixture data can't
  * pin down) and deterministic sampling (reproducibility across
  * partitionings — the property that distinguishes it from sample()). */
class AsOfSamplingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import AsOf.asOfJoin

  private def left(rows: (Long, Long, String)*) = {
    import spark.implicits._
    rows.toDF("k", "ts", "payload")
  }
  private def right(rows: (Long, Long, String)*) = {
    import spark.implicits._
    rows.toDF("k", "ts", "rv")
  }

  test("as-of picks the latest right row at-or-before each left ts, inclusive") {
    import spark.implicits._
    val got = asOfJoin(
      left((1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "c")),
      right((1L, 10L, "r10"), (1L, 15L, "r15"), (1L, 3L, "r3")),
      Seq("k"), "ts", Seq("rv"))
      .select($"payload", $"asof_ts", $"asof_rv").as[(String, Long, String)]
      .collect().toSet
    // ts=10 matches the equal-ts right row (inclusive); ts=20 the newest
    // prior (15); ts=5 reaches back to 3
    assert(got === Set(("a", 10L, "r10"), ("b", 15L, "r15"), ("c", 3L, "r3")))
  }

  test("inner drops unmatched left rows; outer keeps them with null payload") {
    import spark.implicits._
    val l = left((1L, 1L, "early"), (2L, 50L, "other-key"))
    val r = right((1L, 5L, "late"))
    assert(asOfJoin(l, r, Seq("k"), "ts", Seq("rv")).count() === 0)
    val outer = asOfJoin(l, r, Seq("k"), "ts", Seq("rv"), inner = false)
      .select($"payload", $"asof_rv").as[(String, Option[String])].collect().toSet
    assert(outer === Set(("early", None), ("other-key", None)))
  }

  test("keys never see each other's right rows") {
    import spark.implicits._
    val got = asOfJoin(
      left((1L, 10L, "a"), (2L, 10L, "b")),
      right((1L, 5L, "k1"), (2L, 8L, "k2")),
      Seq("k"), "ts", Seq("rv"))
      .select($"payload", $"asof_rv").as[(String, String)].collect().toSet
    assert(got === Set(("a", "k1"), ("b", "k2")))
  }

  test("hash sampling is invariant under repartitioning (sample() is not)") {
    import spark.implicits._
    val df = (1L to 2000L).toDF("id").withColumn("lang", lit("en"))
    def ids(parts: Int) =
      Sampling.stratifiedSample(df.repartition(parts), "id", "lang",
        rates = Map("en" -> 0.3), default = 0.5)
        .select($"id").as[Long].collect().toSet
    val a = ids(2)
    assert(a === ids(7))
    // rate lands near 30% (hash uniformity, 2000 draws)
    assert(math.abs(a.size / 2000.0 - 0.3) < 0.05)
  }

  test("thousands of strata sample in one plan without blowing plan depth") {
    import spark.implicits._
    // regression (the compaction plan-depth bug's class): the rate table
    // used to fold into a when-chain nesting one level per stratum — a
    // (lang × domain) curation job with thousands of strata overflowed
    // the stack converting the Column tree. Now a single map literal.
    val df = (1L to 6000L).toDF("id")
      .withColumn("stratum", concat(lit("s"), ($"id" % 3000).cast("string")))
    val rates = (0 until 3000).map(i => s"s$i" -> (if (i % 2 == 0) 1.0 else 0.0)).toMap
    val kept = Sampling.stratifiedSample(df, "id", "stratum", rates, default = 0.5)
      .select($"id").as[Long].collect()
    // rate 1.0 strata keep both rows, rate 0.0 strata keep none
    assert(kept.length === 3000)
    assert(kept.forall(_ % 2 == 0))
  }

  test("non-string strata: mis-keyed rates fail fast; absent strata fall to default") {
    import spark.implicits._
    val df = (1L to 2000L).toDF("id")
      .withColumn("score", (($"id" % 2) + lit(0.0)).cast("double")) // 0.0 / 1.0
    // "1" is not the canonical string form of double 1.0 — it could never
    // match a row, so the stratum would silently sample at default; the
    // guard must reject it at plan time
    val ex = intercept[IllegalArgumentException] {
      Sampling.stratifiedSample(df, "id", "score", Map("1" -> 0.0), default = 1.0)
    }
    assert(ex.getMessage.contains("canonical"))
    // canonically-keyed doubles route per-stratum; the 0.0 stratum (absent
    // from a NON-EMPTY rates map) falls through to default — try_element_at
    // keeps that NULL-on-missing fallback under any ANSI mode
    val kept = Sampling.stratifiedSample(df, "id", "score",
        Map("1.0" -> 0.0), default = 1.0)
      .select($"score").as[Double].collect()
    assert(kept.length === 1000 && kept.forall(_ == 0.0))
  }

  test("split fractions partition every row exactly once, deterministically") {
    import spark.implicits._
    val df = (1L to 3000L).toDF("id")
      .withColumn("split", Sampling.splitColumn(col("id"),
        Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)))
    val counts = df.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum === 3000L)
    assert(math.abs(counts("train") / 3000.0 - 0.8) < 0.05)
    assert(math.abs(counts("valid") / 3000.0 - 0.1) < 0.03)
    assert(math.abs(counts("test") / 3000.0 - 0.1) < 0.03)
    // same ids, same fates on a second evaluation
    assert(df.select("id", "split").except(df.select("id", "split")).count() === 0)
  }

  test("invalid rates and fractions fail fast") {
    import spark.implicits._
    val df = Seq((1L, "en")).toDF("id", "lang")
    assertThrows[IllegalArgumentException] {
      Sampling.stratifiedSample(df, "id", "lang", Map("en" -> 1.5), 0.5)
    }
    assertThrows[IllegalArgumentException] {
      Sampling.splitColumn(col("id"), Seq("train" -> 0.8, "test" -> 0.1))
    }
    assertThrows[IllegalArgumentException] {
      Sampling.packSequences(df, lit(1), budget = 0, shardCol = "lang", idCol = "id")
    }
    // empty vocabulary fails fast with the precondition, not an NPE mid-agg
    import spark.implicits._
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assertThrows[IllegalArgumentException] {
      graft.operators.TextAnalysis.lmScores(noDocs,
        graft.operators.TextAnalysis.unigramVocab(noDocs))
    }
  }

  test("sequence packing invariants hold on seeded random corpora") {
    import spark.implicits._
    for (seed <- Seq(7, 21, 42)) {
      val rng = new scala.util.Random(seed)
      val budget = 16 + rng.nextInt(64)
      val rows = (0L until 200L).map { id =>
        (id, s"s${rng.nextInt(4)}", rng.nextInt(3 * budget)) } // docs longer than packs included
      val got = Sampling.packSequences(rows.toDF("id", "shard", "n"), col("n"),
          budget = budget, shardCol = "shard", idCol = "id")
        .select("id", "shard", "n", "pack_start", "pack_end", "start_offset")
        .as[(Long, String, Int, Long, Long, Long)].collect()
      assert(got.length === rows.length)
      // invariants: offset inside the pack, end >= start, spans cover the
      // doc's token count exactly (end pack = pack of the doc's last token,
      // or the start pack for empty docs)
      got.foreach { case (id, _, n, ps, pe, off) =>
        assert(off >= 0 && off < budget, s"doc $id offset $off outside [0,$budget)")
        assert(pe >= ps, s"doc $id pack_end $pe < pack_start $ps")
        val expectedEnd = if (n == 0) ps else (ps * budget + off + n - 1) / budget
        assert(pe === expectedEnd, s"doc $id span mismatch")
      }
      // per shard: docs tile the stream with no gaps or overlaps in id order
      got.groupBy(_._2).foreach { case (_, docs) =>
        var cursor = 0L
        docs.sortBy(_._1).foreach { case (id, _, n, ps, _, off) =>
          assert(ps * budget + off === cursor, s"doc $id not contiguous at $cursor")
          cursor += n
        }
      }
    }
  }

  test("sequence packing: concat-and-cut spans, per-shard streams, hand-computed") {
    import spark.implicits._
    // shard A stream (budget 10): doc1=4 [0,4) p0; doc2=8 [4,12) p0->p1
    // spills the cut; doc3=0 empty at 12 p1; doc4=25 [12,37) p1->p3 spans a
    // whole middle pack; shard B independent: doc5=10 [0,10) exactly fills p0
    val df = Seq(
      (1L, "A", 4), (2L, "A", 8), (3L, "A", 0), (4L, "A", 25), (5L, "B", 10)
    ).toDF("id", "shard", "n")
    val got = Sampling.packSequences(df, col("n"), budget = 10,
        shardCol = "shard", idCol = "id")
      .select("id", "pack_start", "pack_end", "start_offset")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, 0L, 0L, 0L),   // fits pack 0 at offset 0
      (2L, 0L, 1L, 4L),   // starts pack 0 offset 4, spills into pack 1
      (3L, 1L, 1L, 2L),   // empty doc sits at its stream position
      (4L, 1L, 3L, 2L),   // spans packs 1..3
      (5L, 0L, 0L, 0L)))  // shard B packs from zero, independently
  }
}
