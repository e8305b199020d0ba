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

  test("NotionJson: block dump round-trips to the kernel's markdown (S1-S3)") {
    import graft.sources.{NotionJson, NotionMarkdown, NotionBlock, NotionRichText, NotionTableRow}
    val out = Files.createTempDirectory("graft_notion").toString
    // a Notion /blocks/{id}/children dump in the API's own JSON shape
    // (notion_collector.py:145-205), page_id/block_idx stamped, table
    // children inlined
    val dump = Seq(
      """{"page_id":"pA","block_idx":0,"type":"heading_1","heading_1":{"rich_text":[{"type":"text","text":{"content":"Title"}}]}}""",
      """{"page_id":"pA","block_idx":1,"type":"paragraph","paragraph":{"rich_text":[{"type":"text","text":{"content":"see "},"href":null},{"type":"text","text":{"content":"docs"},"href":"https://x.io"},{"type":"mention","text":{"content":"skipped"}}]}}""",
      """{"page_id":"pA","block_idx":2,"type":"to_do","to_do":{"rich_text":[{"type":"text","text":{"content":"ship"}}],"checked":true}}""",
      """{"page_id":"pA","block_idx":3,"type":"code","code":{"rich_text":[{"type":"text","text":{"content":"x=1"}}],"language":"python"}}""",
      """{"page_id":"pB","block_idx":0,"type":"table","table":{},"children":[{"table_row":{"cells":[[{"type":"text","text":{"content":"h1"}}],[{"type":"text","text":{"content":"h2"}}]]}},{"table_row":{"cells":[[{"type":"text","text":{"content":"v1"}}],[{"type":"text","text":{"content":"v2"}}]]}}]}""",
      """{"page_id":"pB","block_idx":1,"type":"divider","divider":{}}""")
    Files.write(java.nio.file.Paths.get(out, "blocks.json"),
      dump.mkString("\n").getBytes("UTF-8"))

    val blocks = NotionJson.readBlocks(spark, s"$out/blocks.json").collect().toSeq
    assert(blocks.size === 6)
    val got = NotionJson.readPages(spark, s"$out/blocks.json")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // expected via the spec'd kernel over hand-built typed blocks
    val rtx = (s: String, h: Option[String]) => Seq(NotionRichText("text", s, h))
    val expectedA = NotionMarkdown.pageToMarkdown(None, Seq(
      NotionBlock("pA", 0, "heading_1", rtx("Title", None), None, None, Nil),
      NotionBlock("pA", 1, "paragraph",
        rtx("see ", None) ++ rtx("docs", Some("https://x.io")), None, None, Nil),
      NotionBlock("pA", 2, "to_do", rtx("ship", None), Some(true), None, Nil),
      NotionBlock("pA", 3, "code", rtx("x=1", None), None, Some("python"), Nil)))
    val expectedB = NotionMarkdown.pageToMarkdown(None, Seq(
      NotionBlock("pB", 0, "table", Nil, None, None,
        Seq(NotionTableRow(Seq(rtx("h1", None), rtx("h2", None))),
            NotionTableRow(Seq(rtx("v1", None), rtx("v2", None))))),
      NotionBlock("pB", 1, "divider", Nil, None, None, Nil)))
    assert(got === Map("pA" -> expectedA, "pB" -> expectedB))
    assert(got("pA").startsWith("# Title\n\nsee [docs](https://x.io)"))
    assert(got("pA").contains("- [x] ship"))
    assert(got("pB").contains("| h1 | h2 |\n|---|---|"))
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
