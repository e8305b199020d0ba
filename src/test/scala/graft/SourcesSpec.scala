package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skew
import graft.sources.Sources

class SourcesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("documents round-trip through orc, json, and csv") {
    val docs = Tables.documents(spark, dir)
    val out = Files.createTempDirectory("graft_src").toString
    val sorted = docs.orderBy("doc_id").collect().map(_.toSeq).toSeq

    Sources.writeOrc(docs, s"$out/orc")
    assert(Sources.readOrc(spark, s"$out/orc")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq === sorted)

    Sources.writeJson(docs, s"$out/json")
    assert(Sources.readJson(spark, s"$out/json", docs.schema)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq === sorted)

    Sources.writeCsv(docs, s"$out/csv")
    assert(Sources.readCsv(spark, s"$out/csv", docs.schema)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq === sorted)
  }

  test("writeJsonBackup stamps backed_up_at in ISO-8601 seconds form (F10)") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_backup").toString
    graft.pipelines.Pipelines.writeJsonBackup(
      Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text"), s"$out/backup")
    val back = spark.read.json(s"$out/backup")
    assert(back.count() === 2)
    val stamps = back.select("backed_up_at").collect().map(_.getString(0))
    val iso = "\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}".r
    stamps.foreach(s => assert(iso.matches(s), s"not ISO-8601 seconds: $s"))
  }

  test("upsertDocuments: \\$set on matched, untouched otherwise, update-only drops strangers") {
    import spark.implicits._
    val target = Seq((1L, "a", "en"), (2L, "b", "de"), (3L, "c", "fr"))
      .toDF("doc_id", "text", "lang")
    val updates = Seq((2L, "B2"), (9L, "ghost")).toDF("doc_id", "text")
    val merged = graft.pipelines.Pipelines
      .upsertDocuments(target, updates, stamp = to_timestamp(lit("2026-01-01 00:00:00")))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.get(3) != null))
    // update_one (no upsert): id 9 matches nothing and inserts nothing
    assert(merged.toSeq === Seq(
      (1L, "a", "en", false), (2L, "B2", "de", true), (3L, "c", "fr", false)))
  }

  test("salted join equals plain join, with the small side replicated") {
    val orders = Tables.orders(spark, dir)
    val customer = Tables.customer(spark, dir)
    val plain = orders.join(customer, orders("o_custkey") === customer("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(
        orders.withColumnRenamed("o_custkey", "k"),
        customer.withColumnRenamed("c_custkey", "k"), "k", saltBuckets = 8)
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }

  test("salted left join preserves unmatched rows") {
    import spark.implicits._
    val large = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val small = Seq((1L, "X")).toDF("k", "w")
    val out = Skew.saltedJoin(large, small, "k", saltBuckets = 4, joinType = "left")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(out.toSeq === Seq((1L, "a", "X"), (2L, "b", null), (3L, "c", null)))
  }

  test("key histogram surfaces the heaviest join keys") {
    val hist = Skew.keyHistogram(Tables.lineitem(spark, dir), "l_suppkey", topN = 3).collect()
    assert(hist.length === 3)
    assert(hist.map(_.getLong(1)).toSeq === hist.map(_.getLong(1)).toSeq.sortBy(-_))
  }
}
