package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** The survivor-mode fixture kernel (ScaleGen.mutateTextSurvivor): the
  * round-19 knob that makes ×N upsample duplication PARTIAL so the
  * curation chain can be priced on a corpus the span scrub does not
  * annihilate. Pins the four invariants the at-scale sanity tie hangs
  * off: determinism, clean replicas are never span-flagged, dup replicas
  * flag exactly their kept contiguous run (and scrub down to the filler
  * remnant), and the quality gate reads a clean replica exactly like its
  * base. */
class ScaleGenSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val base = (1 to 20).map(i => s"tok$i").mkString(" ")

  test("deterministic: same (doc, rep, knobs) -> same text; filler tokens " +
       "are lowercase-alnum (survive the dedup tokenization verbatim)") {
    val a = ScaleGen.mutateTextSurvivor(base, 7L, 3, 0.5)
    assert(a === ScaleGen.mutateTextSurvivor(base, 7L, 3, 0.5))
    assert(a !== ScaleGen.mutateTextSurvivor(base, 7L, 4, 0.5))
    assert(a.split(" ").forall(_.matches("[a-z0-9]+")))
  }

  test("a clean replica shares no 5-token window with its base (stride-4 " +
       "filler caps unchanged runs at 3) and none is ever flagged") {
    import spark.implicits._
    val clean = ScaleGen.mutateTextSurvivor(base, 1L, 2, dupFrac = 0.0)
    val baseW = base.split(" "); val cleanW = clean.split(" ")
    assert(cleanW.length === baseW.length)
    // max run of unchanged tokens is 3 (every 4th replaced, from 0)
    val runs = baseW.zip(cleanW).map { case (b, c) => b == c }
    assert(runs.zipWithIndex.forall { case (same, i) => same == (i % 4 != 0) })
    val spans = Dedup.duplicateSpans(
      Seq((1L, base), (2L, clean)).toDF("doc_id", "text"))
    assert(spans.count() === 0L)
  }

  test("a dup replica keeps one contiguous keepFrac run; against its base " +
       "exactly that run flags, and the scrub leaves the filler remnant") {
    import spark.implicits._
    val dup = ScaleGen.mutateTextSurvivor(base, 5L, 9, dupFrac = 1.0)
    val baseW = base.split(" "); val dupW = dup.split(" ")
    val kept = baseW.zip(dupW).map { case (b, d) => b == d }
    val keep = kept.count(identity)
    assert(keep === (20 * 0.7).toInt) // 14 of 20
    // contiguity: exactly one TRUE run
    assert(kept.zip(false +: kept.init).count { case (c, p) => c && !p } === 1)
    val off = kept.indexOf(true) // 0-based start of the kept run
    val corpus = Seq((1L, base), (2L, dup)).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(corpus)
      .as[(Long, Long, Long)].collect().toSet
    // both docs flag the kept run (1-based inclusive token positions)
    assert(spans === Set(
      (1L, off + 1L, off + keep.toLong), (2L, off + 1L, off + keep.toLong)))
    // the scrub remnant is exactly the replica-unique filler
    val remnant = Dedup.scrubDuplicateSpans(corpus)
      .filter($"doc_id" === 2L).select($"scrubbed_text").head.getString(0)
    assert(remnant.split(" ").filter(_.nonEmpty).toSeq ===
      dupW.zipWithIndex.collect { case (w, i) if !kept(i) => w }.toSeq)
  }

  test("the quality gate scores a clean replica exactly like its base " +
       "(the curation bench's exact-expectation invariant)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    import graft.functions.TextFunctions.qualityScore
    // several shapes, incl. one in the gate's readability pass band
    val bases = Seq(
      (1 to 17).map(i => s"w$i").mkString(" "),
      (1 to 60).map(i => s"w$i").mkString(" "),
      base)
    val rows = bases.zipWithIndex.flatMap { case (b, i) =>
      Seq((i.toLong, "base", b),
        (i.toLong, "clean", ScaleGen.mutateTextSurvivor(b, i.toLong, 1, 0.0)))
    }
    val scored = rows.toDF("id", "kind", "text")
      .withColumn("q", qualityScore(col("text"),
        lit(null).cast("string"), lit(null).cast("string")))
      .select($"id", $"kind", $"q").as[(Long, String, Double)]
      .collect().groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap)
    scored.foreach { case (id, m) =>
      assert(m("base") === m("clean"), s"gate score diverged for base $id")
    }
  }

  test("dupReplica tracks the knob over many (doc, rep) draws") {
    val n = 20000
    def frac(f: Double): Double =
      (0 until n).count(i => ScaleGen.dupReplica(i.toLong % 500, 1 + i / 500, f))
        .toDouble / n
    assert(math.abs(frac(0.5) - 0.5) < 0.02)
    assert(math.abs(frac(0.1) - 0.1) < 0.02)
    assert(frac(0.0) === 0.0 && frac(1.0) === 1.0)
  }
}
