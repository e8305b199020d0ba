package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sampling

/** Domain-mixture resampling on synthetic corpora with known per-domain
  * counts: threshold arithmetic, achieved proportions, determinism,
  * drop-unlisted semantics, and the fail-loud guards. */
class MixtureSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** 1000 rows each of domains a/b/c plus 500 of unlisted d. */
  private def corpus = {
    import spark.implicits._
    (0 until 3500).map { i =>
      val d = if (i < 1000) "a" else if (i < 2000) "b" else if (i < 3000) "c" else "d"
      (i.toLong, d)
    }.toDF("doc_id", "domain")
  }

  private val weights = Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2)

  test("thresholds realize T = min(count/weight) without upsampling") {
    val ppm = Sampling.mixturePpm(corpus, "domain", weights)
    // limiting domain: a (1000/0.5 = 2000 is the min) — kept whole, and
    // its arithmetic is exact in doubles, so exactly 1e6
    assert(ppm("a") === 1000000L)
    // the others reproduce the documented IEEE sequence bit-for-bit
    val t = List(1000L / 0.5, 1000L / 0.3, 1000L / 0.2).min
    assert(ppm("b") === math.floor(1e6 * t * 0.3 / 1000L).toLong)
    assert(ppm("c") === math.floor(1e6 * t * 0.2 / 1000L).toLong)
    assert(ppm("b") >= 599999L && ppm("b") <= 600000L)
    assert(ppm("c") >= 399999L && ppm("c") <= 400000L)
  }

  test("membership: limiting domain kept whole, others hash-thinned to " +
       "the target proportions, unlisted domains dropped") {
    import spark.implicits._
    val kept = Sampling.mixtureResample(corpus, "doc_id", "domain", weights)
      .as[(Long, String)].collect()
    val by = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(by("a") === 1000)            // limiting domain: every row kept
    assert(!by.contains("d"))           // unlisted: dropped entirely
    // hash-uniformity tolerance: keep-prob .6/.4 over 1000 rows, sd ~15
    assert(math.abs(by("b") - 600) <= 60, s"b kept ${by("b")}, want ~600")
    assert(math.abs(by("c") - 400) <= 60, s"c kept ${by("c")}, want ~400")
  }

  test("membership is a pure function of the id (deterministic reruns)") {
    import spark.implicits._
    def run() = Sampling.mixtureResample(corpus, "doc_id", "domain", weights)
      .as[(Long, String)].collect().toSet
    assert(run() === run())
  }

  test("mixtureDrift: shares over weighted arrivals, vanished domain is loudest") {
    val w = Map("a" -> 0.5, "b" -> 0.5)
    val even = Sampling.mixtureDrift(Map("a" -> 10L, "b" -> 10L), w, otherArrivals = 3L)
    assert(even.maxDrift === 0.0 && even.weightedArrivals === 20L && even.otherArrivals === 3L)
    val skew = Sampling.mixtureDrift(Map("a" -> 30L, "b" -> 10L), w)
    assert(skew.observed("a") === 0.75 && skew.maxDrift === 0.25)
    // a target domain with zero arrivals observes 0 and drives the drift
    val gone = Sampling.mixtureDrift(Map("a" -> 10L), w)
    assert(gone.observed("b") === 0.0 && gone.maxDrift === 0.5)
    // no weighted arrivals at all: shares 0, drift = the largest weight
    val none = Sampling.mixtureDrift(Map.empty, w, otherArrivals = 7L)
    assert(none.weightedArrivals === 0L && none.maxDrift === 0.5)
  }

  test("report carries counts, weights, and thresholds, domain-shaped") {
    import spark.implicits._
    val rep = Sampling.mixtureReport(corpus, "domain", weights)
      .as[(String, Long, Double, Long)].collect().toSet
    val ppm = Sampling.mixturePpm(corpus, "domain", weights)
    assert(rep === Set(
      ("a", 1000L, 0.5, ppm("a")),
      ("b", 1000L, 0.3, ppm("b")),
      ("c", 1000L, 0.2, ppm("c"))))
  }

  test("epochs: the cap-limited domain repeats exactly epochsCap times, " +
       "others get floor(r)+hash-fraction copies at the target mixture") {
    import spark.implicits._
    val got = Sampling.mixtureResampleEpochs(corpus, "doc_id", "domain",
        weights, epochsCap = 4.0)
      .select($"doc_id", $"domain", $"epoch")
      .as[(Long, String, Long)].collect()
    val byRow = got.groupBy(r => (r._1, r._2)).view.mapValues(_.length).toMap
    // T = min(1000·4/0.5, 1000·4/0.3, 1000·4/0.2) = 8000:
    // r_a = 4.0 exactly — every a row appears exactly 4 times, epochs 1..4
    assert(byRow.filter(_._1._2 == "a").values.toSet === Set(4))
    assert(got.filter(_._2 == "a").map(_._3).toSet === Set(1L, 2L, 3L, 4L))
    // r_b = 2.4, r_c = 1.6: per-row copies are floor/ceil of r only
    assert(byRow.filter(_._1._2 == "b").values.toSet.subsetOf(Set(2, 3)))
    assert(byRow.filter(_._1._2 == "c").values.toSet.subsetOf(Set(1, 2)))
    // achieved totals near T·w: 4000 / 2400 / 1600 (hash noise on the frac)
    val byDom = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byDom("a") === 4000)
    assert(math.abs(byDom("b") - 2400) <= 100, s"b got ${byDom("b")}")
    assert(math.abs(byDom("c") - 1600) <= 100, s"c got ${byDom("c")}")
    assert(!byDom.contains("d"))
  }

  test("epochs: cap 1 degenerates to the no-upsample membership, epoch = 1") {
    import spark.implicits._
    val plain = Sampling.mixtureResample(corpus, "doc_id", "domain", weights)
      .as[(Long, String)].collect().toSet
    val eps = Sampling.mixtureResampleEpochs(corpus, "doc_id", "domain",
        weights, epochsCap = 1.0)
      .select($"doc_id", $"domain", $"epoch")
      .as[(Long, String, Long)].collect()
    assert(eps.map(_._3).toSet === Set(1L))
    assert(eps.map(r => (r._1, r._2)).toSet === plain)
  }

  test("epochs guards: cap below 1 and a reserved epoch column fail loudly") {
    intercept[IllegalArgumentException](
      Sampling.mixtureResampleEpochs(corpus, "doc_id", "domain", weights,
        epochsCap = 0.5))
    val withEpoch = corpus.withColumn("epoch",
      org.apache.spark.sql.functions.lit(1L))
    intercept[IllegalArgumentException](
      Sampling.mixtureResampleEpochs(withEpoch, "doc_id", "domain", weights))
  }

  test("guards: weights must sum to 1, be positive, name non-empty " +
       "domains, and the domain column must be string-typed") {
    import spark.implicits._
    intercept[IllegalArgumentException](
      Sampling.mixturePpm(corpus, "domain", Map("a" -> 0.5, "b" -> 0.3)))
    intercept[IllegalArgumentException](
      Sampling.mixturePpm(corpus, "domain", Map("a" -> 1.5, "b" -> -0.5)))
    intercept[IllegalArgumentException](
      Sampling.mixturePpm(corpus, "domain", Map.empty))
    // a weighted domain with zero rows: unachievable without upsampling
    intercept[IllegalArgumentException](
      Sampling.mixturePpm(corpus, "domain",
        Map("a" -> 0.5, "nope" -> 0.5)))
    // non-string domain column rejected at plan time
    val intDomain = corpus.withColumn("domain",
      org.apache.spark.sql.functions.lit(1))
    intercept[IllegalArgumentException](
      Sampling.mixturePpm(intDomain, "domain", Map("1" -> 1.0)))
  }
}
