package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Golden-output pins for the rows-only registered queries (the ones the
  * DuckDB gate can't hash because their chunker/embedder kernels aren't
  * SQL-expressible). The gate only checks row COUNTS for these; a kernel
  * regression that preserves counts would ship silently. Here each result on
  * the sf0.01 fixture is pinned as (row count, md5 of the sorted rows with
  * doubles rounded to 6), so any value drift fails the build.
  *
  * Every kernel involved is deterministic by construction (hashing embedder,
  * recursive splitter, md5 ids, synthetic media bytes), so these digests are
  * stable across JVMs and Spark re-plans; they change exactly when chunk/
  * embed/fusion SEMANTICS change — which is the event that should force a
  * human to look.
  */
class GoldenSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir", "/tmp/graft_test_warehouse")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.01"

  private def gold(name: String, expectedRows: Long, expectedMd5: String): Unit =
    test(s"$name matches its pinned sf0.01 golden output") {
      val (rows, md5) = GoldenDigest.digest(SparkEntry.queries(name)(spark, dir))
      assert(rows === expectedRows, s"$name row count drifted")
      assert(md5 === expectedMd5,
        s"$name values drifted (rows=$rows, md5=$md5) — if the kernel change " +
          "is intentional, re-pin this digest")
    }

  gold("pipe_flagship",      10L, "1a8a1eba31a8357b9ec4a04a87c08f5e")
  gold("pipe_flagship_ivf",  10L, "7a15f14edc92395847f7910a61d26181")
  // same digest as pipe_flagship_ivf: the exact rerank recovers the
  // identical top-10 — quantization cost nothing at this scale/params
  gold("pipe_flagship_ivfpq", 10L, "7a15f14edc92395847f7910a61d26181")
  gold("pipe_flagship_pqbatch", 30L, "2b61992398dafdc016a90e37e20aa535")
  gold("pipe_orchestrator",   6L, "21b70c797f26321a1619c3b73e41e0de")
  gold("pipe_chunk_stats",  498L, "1e4a68e669db73b26441b34437fc5437")
  gold("pipe_doc_chunks",     1L, "2a033e027d28a99769bd7614d6cdc0e2")
  gold("pipe_hierarchy_rel", 500L, "828b389a808eab4a7c08fa8bded50f2f")
  gold("mm_feature_stats",  500L, "84bb00dfb4b550a7d0b02d8c447ee25e")
  gold("pipe_sql_chunks",   498L, "f6242c4e6111fab982486d6b42c10b1e")
  gold("txt_bm25_stemmed",   10L, "df1474859dda5fa099fa87d0d070989f")
}
