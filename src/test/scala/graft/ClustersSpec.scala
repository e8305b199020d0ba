package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Clusters

/** Connected-components specs on adversarial synthetic graphs — the fixture
  * near-dup components are near-cliques, so the multi-round propagation
  * paths need shapes the fixture never produces. */
class ClustersSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def components(edges: (Long, Long)*): Map[Long, Long] = {
    import spark.implicits._
    Clusters.connectedComponents(edges.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap
  }

  test("a long chain converges to the minimum endpoint (multi-round propagation)") {
    // 10→9→...→1: worst case for min-propagation, needs several rounds
    val got = components((1L to 9L).map(i => (i + 1, i)): _*)
    assert(got === (1L to 10L).map(_ -> 1L).toMap)
  }

  test("disjoint components stay disjoint") {
    val got = components((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("a cycle resolves to its minimum member") {
    val got = components((5L, 6L), (6L, 7L), (7L, 5L))
    assert(got === Map(5L -> 5L, 6L -> 5L, 7L -> 5L))
  }

  test("two chains merged by a late bridge collapse into one component") {
    // bridge (4,14) merges {1..4} and {11..14}
    val got = components((1L, 2L), (2L, 3L), (3L, 4L),
      (11L, 12L), (12L, 13L), (13L, 14L), (4L, 14L))
    assert(got.values.toSet === Set(1L))
    assert(got.keySet === Set(1L, 2L, 3L, 4L, 11L, 12L, 13L, 14L))
  }

  test("maxIter too small for the diameter fails loudly instead of mislabeling") {
    import spark.implicits._
    val chain = (1L to 30L).map(i => (i + 1, i)).toDF("id_a", "id_b")
    assertThrows[IllegalArgumentException] {
      Clusters.connectedComponents(chain, maxIter = 2)
    }
  }
}
