package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}
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

  /** (rows, md5 of sorted "|"-joined rows): doubles rounded to 6, array
    * columns dropped (embeddings — float textual form is not the contract),
    * columns in name order. */
  private def digest(df: DataFrame): (Long, String) = {
    val cols = df.schema.fields
      .filterNot(_.dataType.isInstanceOf[ArrayType])
      .sortBy(_.name)
      .map { f =>
        val c = col(f.name)
        val s = f.dataType match {
          case DoubleType => format_number(round(c, 6), 6)
          case _          => c.cast("string")
        }
        coalesce(s, lit("NULL"))
      }
    val rows = df.select(concat_ws("|", cols.toIndexedSeq: _*).as("r"))
      .collect().map(_.getString(0)).sorted
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(rows.mkString("\n").getBytes("UTF-8"))
    (rows.length.toLong, md.map("%02x".format(_)).mkString)
  }

  private def gold(name: String, expectedRows: Long, expectedMd5: String): Unit =
    test(s"$name matches its pinned sf0.01 golden output") {
      val (rows, md5) = digest(SparkEntry.queries(name)(spark, dir))
      assert(rows === expectedRows, s"$name row count drifted")
      assert(md5 === expectedMd5,
        s"$name values drifted (rows=$rows, md5=$md5) — if the kernel change " +
          "is intentional, re-pin this digest")
    }

  gold("pipe_flagship",      10L, "PENDING")
  gold("pipe_orchestrator",   6L, "PENDING")
  gold("pipe_chunk_stats",  498L, "PENDING")
  gold("pipe_doc_chunks",     1L, "PENDING")
  gold("pipe_hierarchy_rel", 500L, "PENDING")
  gold("mm_feature_stats",  500L, "PENDING")
}
