package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** Guards the bench-record line against the stdout-tail truncation that left
  * `parsed: null` in BENCH_r01..r04: the harness keeps only the last ~2000
  * chars of stdout, so the emitted line (plus sbt's `[success]` suffix) must
  * fit inside that window or the `{"metric"` head is cut off and the round's
  * perf record is lost. */
class BenchLineSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  // realistic registry shape: 81 queries with the repo's long snake_case names
  private def fakeResults(n: Int): Map[String, Option[Double]] =
    (1 to n).map { i =>
      f"rel_supplier_running_rev_$i%03d" -> Some(0.05 * (i % 40) + 0.1)
    }.toMap

  test("stdout line fits the harness tail window with 81 long-named queries") {
    val line = Bench.renderLine(fakeResults(81), "sf0.1", Bench.StdoutBudget)
    assert(line.length <= Bench.StdoutBudget,
      s"line is ${line.length} chars, over the ${Bench.StdoutBudget} budget")
    // the harness greps the line head — it must be present, i.e. the whole
    // line must survive a 2000-char tail with ~125 chars of sbt suffix
    assert(line.startsWith("""{"metric":"total""""))
  }

  test("budgeted line is valid JSON and reconciles kept + omitted with total") {
    val results = fakeResults(81)
    val line = Bench.renderLine(results, "sf0.1", Bench.StdoutBudget)
    val node = mapper.readTree(line)
    assert(node.get("metric").asText() === "total")
    assert(node.get("unit").asText() === "sec")
    assert(node.get("sf").asText() === "sf0.1")
    val queries = node.get("queries")
    // iterator, not properties().asScala: mapping over a Set would dedup
    // repeated timing values before the sum
    val keptSum = queries.iterator().asScala.map(_.asDouble()).sum
    val omitted = Option(node.get("omitted")).map(_.get("sum").asDouble()).getOrElse(0.0)
    val total = node.get("value").asDouble()
    assert(math.abs(keptSum + omitted - total) < 0.02 * results.size,
      s"kept $keptSum + omitted $omitted should reconcile with total $total")
    // slowest queries are the audit surface — they must be in the kept map
    val slowest = results.toSeq.maxBy(_._2.get)._1
    assert(queries.has(slowest))
  }

  test("unbudgeted line keeps every query (BENCH_LOCAL.json completeness)") {
    val results = fakeResults(81)
    val node = mapper.readTree(Bench.renderLine(results, "sf0.1", Int.MaxValue))
    assert(node.get("queries").size() === 81)
    assert(node.get("omitted") === null)
  }

  test("failed queries render as -1, stay out of the total, and are always listed") {
    val results: Map[String, Option[Double]] =
      Map("ok_query" -> Some(1.5), "broken_query" -> None)
    val node = mapper.readTree(Bench.renderLine(results, "sf0.01", Bench.StdoutBudget))
    assert(node.get("value").asDouble() === 1.5)
    assert(node.get("queries").get("broken_query").asDouble() === -1.0)
    val failed = node.get("failed")
    assert(failed !== null)
    assert(failed.get(0).asText() === "broken_query")
  }
}
