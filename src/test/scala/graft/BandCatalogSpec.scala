package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Stored dedup-index catalog: build-once reuse, bucketed layout, and the
  * stored-vs-derived equivalence contract of incremental dedup. */
class BandCatalogSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.warehouse.dir", "/tmp/graft_test_warehouse")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("band and shingle tables build once, then read from the catalog") {
    val bands = BandCatalog.corpusBands(spark, dir)
    val nBands = bands.count()
    // 4 band rows per document
    assert(nBands === Tables.documents(spark, dir).count() * 4)
    val t0 = System.nanoTime()
    assert(BandCatalog.corpusBands(spark, dir).count() === nBands)
    assert((System.nanoTime() - t0) / 1e9 < 10.0,
      "second access must be a table read, not a corpus re-hash")
    assert(spark.catalog.tableExists(TableStore.tableName("dedup_bands", dir)))
    assert(BandCatalog.corpusShingles(spark, dir).count() ===
      Tables.documents(spark, dir).count())
  }

  test("stored-index incremental pairs equal the derive-everything form") {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
    val batch = docs.filter($"doc_id" < 20)
      .select(($"doc_id" + 100000).as("doc_id"), $"text")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select($"id_a", $"id_b", round($"jaccard", 6))
        .as[(Long, Long, Double)].collect().toSet
    val derived = pairSet(Dedup.minHashPairsIncremental(batch, docs))
    val stored = pairSet(Dedup.minHashPairsIncrementalStored(batch,
      BandCatalog.corpusShingles(spark, dir), BandCatalog.corpusBands(spark, dir)))
    assert(derived.nonEmpty, "re-tagged copies must pair with their originals")
    assert(stored === derived)
  }

  test("appendBatch: a second increment sees the first's documents, no corpus rebuild") {
    import spark.implicits._
    // private fixture dir so appends never pollute the shared catalog tables
    val tdir = "/tmp/graft_append_fixture"
    Seq((1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(tdir + "/documents.parquet")
    Seq("dedup_sh", "dedup_bands").foreach { k =>
      spark.sql(s"DROP TABLE IF EXISTS ${TableStore.tableName(k, tdir)}") }
    assert(BandCatalog.corpusBands(spark, tdir).count() === 2 * 4)

    // increment 1: a new document, duplicate of nothing — flag, then append
    val batch1 = Seq((100L, "spark catalyst tungsten codegen shuffle exchange broadcast"))
      .toDF("doc_id", "text")
    assert(Dedup.minHashPairsIncrementalStored(batch1,
      BandCatalog.corpusShingles(spark, tdir), BandCatalog.corpusBands(spark, tdir))
      .count() === 0)
    BandCatalog.appendBatch(spark, tdir, batch1)
    assert(BandCatalog.corpusBands(spark, tdir).count() === 3 * 4)
    assert(BandCatalog.corpusShingles(spark, tdir).count() === 3)

    // increment 2 duplicates increment 1's document: only the stored index
    // can flag it — the original corpus parquet was never touched, and
    // nothing was rebuilt (the catalog tables only grew by the batch)
    val batch2 = Seq((200L, "spark catalyst tungsten codegen shuffle exchange broadcast"))
      .toDF("doc_id", "text")
    val flagged = Dedup.minHashPairsIncrementalStored(batch2,
        BandCatalog.corpusShingles(spark, tdir), BandCatalog.corpusBands(spark, tdir))
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(flagged === Set((100L, 200L)))
  }
}
