package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RangeJoin

/** Bin-boundary edge cases for the interval-containment join — exactness
  * claims (no dupes, no misses, inclusive bounds) checked at the seams the
  * fixture's hour-aligned windows never hit. */
class RangeJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def join(points: Seq[(Long, Long)], intervals: Seq[(Long, Long, String)],
                   w: Long): Set[(Long, String)] = {
    import spark.implicits._
    RangeJoin.intervalJoin(
        points.toDF("pid", "ts"), "ts",
        intervals.toDF("start", "end", "name"), "start", "end", w)
      .select($"pid", $"name").as[(Long, String)].collect().toSet
  }

  test("inclusive bounds at both ends; outside misses") {
    val got = join(
      points = Seq((1L, 100L), (2L, 200L), (3L, 99L), (4L, 201L)),
      intervals = Seq((100L, 200L, "i")), w = 30L)
    assert(got === Set((1L, "i"), (2L, "i")))
  }

  test("interval spanning many bins matches once per point, never per bin") {
    import spark.implicits._
    val df = RangeJoin.intervalJoin(
      Seq((1L, 500L)).toDF("pid", "ts"), "ts",
      Seq((0L, 1000L, "wide")).toDF("start", "end", "name"), "start", "end", 10L)
    assert(df.count() === 1)
  }

  test("overlapping intervals each match; bin-boundary points land correctly") {
    val got = join(
      // 60 sits exactly on a bin edge (w=30); 89/90 straddle the next
      points = Seq((1L, 60L), (2L, 89L), (3L, 90L)),
      intervals = Seq((0L, 89L, "a"), (60L, 120L, "b")), w = 30L)
    assert(got === Set((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"), (3L, "b")))
  }

  test("zero-length interval matches exactly its instant") {
    val got = join(
      points = Seq((1L, 42L), (2L, 43L)),
      intervals = Seq((42L, 42L, "instant")), w = 1000L)
    assert(got === Set((1L, "instant")))
  }
}
