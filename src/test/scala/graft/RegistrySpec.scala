package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the query/oracle registry itself — failure modes that
  * would otherwise surface only as a broken driver round:
  *
  *  - an oracleSql key with no matching queries entry makes the driver's
  *    DuckDB compare fail with "no spark result" for that name;
  *  - a duplicate query name across the per-family modules is silently
  *    resolved by Map ++ (last module wins) and DROPS a query from the
  *    registry without any error;
  *  - a name unsafe as a filesystem path breaks Verify's parquet dump.
  */
class RegistrySpec extends AnyFunSuite {

  private val modules: Seq[(String, Map[String, _])] = {
    import graft.queries._
    Seq(
      "RelationalQueries" -> RelationalQueries.queries,
      "DocQueries" -> DocQueries.queries,
      "EventQueries" -> EventQueries.queries,
      "VectorQueries" -> VectorQueries.queries,
      "TextQueries" -> TextQueries.queries,
      "FusionQueries" -> FusionQueries.queries,
      "DedupQueries" -> DedupQueries.queries,
      "AnalysisQueries" -> AnalysisQueries.queries,
      "SamplingQueries" -> SamplingQueries.queries,
      "PipelineQueries" -> PipelineQueries.queries)
  }

  test("every oracleSql key has a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: ${orphans.toSeq.sorted}")
  }

  test("no query name collides across family modules") {
    val perModule = modules.flatMap { case (m, qs) => qs.keys.map(_ -> m) }
    val collisions = perModule.groupBy(_._1).filter(_._2.size > 1)
      .map { case (name, ms) => s"$name in ${ms.map(_._2).mkString("+")}" }
    assert(collisions.isEmpty, s"duplicate query names: ${collisions.toSeq.sorted}")
    assert(SparkEntry.queries.size === perModule.size)
  }

  test("query names are snake_case path-safe identifiers") {
    val bad = SparkEntry.queries.keys.filterNot(_.matches("[a-z0-9_]+"))
    assert(bad.isEmpty, s"unsafe query names: ${bad.toSeq.sorted}")
  }

  test("SparkEntry.queries is the union of the family modules") {
    val union = modules.flatMap(_._2.keys).toSet
    assert(SparkEntry.queries.keySet === union)
  }
}
