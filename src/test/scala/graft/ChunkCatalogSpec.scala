package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Stored-chunk catalog behaviour: build-once reuse, bucketed layout, and
  * recovery from a stale warehouse location left by a previous JVM. */
class ChunkCatalogSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.warehouse.dir", "/tmp/graft_test_warehouse")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("flatChunks builds once per session and is reused afterwards") {
    val first = ChunkCatalog.flatChunks(spark, dir)
    val n = first.count()
    assert(n > 0)
    val t0 = System.nanoTime()
    val again = ChunkCatalog.flatChunks(spark, dir)
    assert(again.count() === n)
    // reuse is a table read, not a re-chunk+re-embed of the corpus
    assert((System.nanoTime() - t0) / 1e9 < 10.0)
    assert(spark.catalog.tableExists("graft_chunks__root_testdata_sf0_001"))
  }

  test("a stale warehouse location from a dead JVM is cleared, not fatal") {
    val name = "graft_hier__root_testdata_sf0_001"
    // suites share one JVM session — the warehouse this builder CONFIGURES
    // may not be the one in effect; always resolve the live setting
    val warehouse = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    val loc = Paths.get(warehouse, name)
    if (!spark.catalog.tableExists(name)) {
      // simulate a previous JVM's leftovers: files exist, catalog entry doesn't
      Files.createDirectories(loc)
      Files.writeString(loc.resolve("junk.txt"), "stale")
    }
    val hier = ChunkCatalog.hierarchyChunks(spark, dir)
    assert(hier.count() > 0)
    assert(spark.catalog.tableExists(name))
    assert(!Files.exists(loc.resolve("junk.txt")))
  }

  test("childChunks carries embeddings for child rows only") {
    import org.apache.spark.sql.functions._
    val children = ChunkCatalog.childChunks(spark, dir)
    assert(children.filter(col("chunk_type") =!= "child").count() === 0)
    assert(children.filter(size(col("embedding")) <= 0).count() === 0)
  }
}
