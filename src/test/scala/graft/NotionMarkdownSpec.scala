package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.sources._

/** S3 decode semantics vs hand-computed markdown
  * (reference notion_collector.py:207-325). */
class NotionMarkdownSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def rt(s: String, href: Option[String] = None) =
    Seq(NotionRichText("text", s, href))

  private def block(idx: Int, tpe: String,
                    text: Seq[NotionRichText] = Nil,
                    checked: Option[Boolean] = None,
                    language: Option[String] = None,
                    rows: Seq[NotionTableRow] = Nil) =
    NotionBlock("p1", idx, tpe, text, checked, language, rows)

  import NotionMarkdown._

  test("rich text: text items concatenate, links wrap, non-text items skip") {
    val items = Seq(
      NotionRichText("text", "see ", None),
      NotionRichText("text", "docs", Some("https://example.com")),
      NotionRichText("mention", "IGNORED", None),
      NotionRichText("text", " now", None))
    assert(richTextToString(items) === "see [docs](https://example.com) now")
    assert(richTextToString(null) === "")
    assert(richTextToString(Nil) === "")
  }

  test("headings, paragraph, lists, quote, divider, code, to_do") {
    assert(blockToMarkdown(block(0, "heading_1", rt("Title"))) === "# Title\n\n")
    assert(blockToMarkdown(block(0, "heading_2", rt("Sub"))) === "## Sub\n\n")
    assert(blockToMarkdown(block(0, "heading_3", rt("Deep"))) === "### Deep\n\n")
    assert(blockToMarkdown(block(0, "paragraph", rt("Body text."))) === "Body text.\n\n")
    assert(blockToMarkdown(block(0, "bulleted_list_item", rt("point"))) === "- point\n")
    assert(blockToMarkdown(block(0, "numbered_list_item", rt("first"))) === "1. first\n")
    assert(blockToMarkdown(block(0, "quote", rt("wise words"))) === "> wise words\n\n")
    assert(blockToMarkdown(block(0, "divider")) === "---\n\n")
    assert(blockToMarkdown(block(0, "code", rt("val x = 1"), language = Some("scala")))
      === "```scala\nval x = 1\n```\n\n")
    assert(blockToMarkdown(block(0, "code", rt("print(1)"))) === "```\nprint(1)\n```\n\n")
    assert(blockToMarkdown(block(0, "to_do", rt("ship it"), checked = Some(true)))
      === "- [x] ship it\n")
    assert(blockToMarkdown(block(0, "to_do", rt("later"), checked = Some(false)))
      === "- [ ] later\n")
    assert(blockToMarkdown(block(0, "to_do", rt("default"))) === "- [ ] default\n")
  }

  test("unsupported block types fall back to bare text or empty") {
    assert(blockToMarkdown(block(0, "callout", rt("note"))) === "note\n")
    assert(blockToMarkdown(block(0, "embed")) === "")
  }

  test("table renders header separator sized to the rendered header columns") {
    val rows = Seq(
      NotionTableRow(Seq(rt("Name"), rt("Age"))),
      NotionTableRow(Seq(rt("Ada"), rt("36"))),
      NotionTableRow(Seq(rt("Alan"), rt("41"))))
    assert(blockToMarkdown(block(0, "table", rows = rows)) ===
      "| Name | Age |\n|---|---|\n| Ada | 36 |\n| Alan | 41 |\n\n")
    assert(blockToMarkdown(block(0, "table")) === "\n\n")
  }

  test("page assembly: title header, block order, python strip") {
    val blocks = Seq(
      block(1, "paragraph", rt("Intro.")),
      block(0, "heading_1", rt("H")),
      block(2, "bulleted_list_item", rt("a")),
      block(3, "bulleted_list_item", rt("b")))
    assert(pageToMarkdown(Some("Page"), blocks) ===
      "# Page\n\n# H\n\nIntro.\n\n- a\n- b")
    assert(pageToMarkdown(None, Seq(block(0, "paragraph", rt("x")))) === "x")
  }

  test("distributed decode matches the kernel page for page") {
    import spark.implicits._
    val blocks = Seq(
      NotionBlock("pA", 0, "heading_1", rt("A"), None, None, Nil),
      NotionBlock("pA", 1, "paragraph", rt("alpha ", None) ++ rt("link", Some("u")),
        None, None, Nil),
      NotionBlock("pA", 2, "table", Nil, None, None,
        Seq(NotionTableRow(Seq(rt("h1"), rt("h2"))), NotionTableRow(Seq(rt("v1"), rt("v2"))))),
      NotionBlock("pB", 0, "to_do", rt("task"), Some(true), None, Nil),
      NotionBlock("pB", 1, "code", rt("x=1"), None, Some("python"), Nil))
    val titles = Seq(("pA", "Alpha"), ("pB", "")).toDF("page_id", "title")
    val got = NotionMarkdown.pagesToMarkdown(blocks.toDS(), Some(titles))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val expected = Map(
      "pA" -> pageToMarkdown(Some("Alpha"), blocks.filter(_.page_id == "pA")),
      "pB" -> pageToMarkdown(None, blocks.filter(_.page_id == "pB")))
    assert(got === expected)
    assert(got("pA") ===
      "# Alpha\n\n# A\n\nalpha [link](u)\n\n| h1 | h2 |\n|---|---|\n| v1 | v2 |")
  }

  test("kernel and distributed paths agree on pages with duplicate block_idx") {
    import spark.implicits._
    // two paragraphs share idx 1 — both paths must tiebreak identically
    // (by rendered markdown), independent of input order
    val blocks = Seq(
      NotionBlock("pD", 1, "paragraph", rt("zeta"), None, None, Nil),
      NotionBlock("pD", 1, "paragraph", rt("alpha"), None, None, Nil),
      NotionBlock("pD", 0, "heading_1", rt("H"), None, None, Nil))
    val kernel = pageToMarkdown(None, blocks)
    val kernelReordered = pageToMarkdown(None, blocks.reverse)
    assert(kernel === kernelReordered)
    assert(kernel === "# H\n\nalpha\n\nzeta")
    val distributed = NotionMarkdown.pagesToMarkdown(blocks.toDS())
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(distributed("pD") === kernel)
  }

  test("duplicate-idx tiebreak agrees across paths on emoji vs U+E000-FFFF text") {
    import spark.implicits._
    // "..." (3-byte UTF-8, E0 lead) vs "😀" = U+1F600 (4-byte UTF-8,
    // F0 lead): UTF-16 compareTo puts the surrogate pair (D83D DE00) BELOW
    // E000, UTF-8 binary puts it ABOVE — the kernel must use the UTF-8 order
    // Spark's array_sort applies, or the two paths render different pages.
    val blocks = Seq(
      NotionBlock("pE", 1, "paragraph", rt("\uE000 private"), None, None, Nil),
      NotionBlock("pE", 1, "paragraph", rt("😀 emoji"), None, None, Nil))
    val kernel = pageToMarkdown(None, blocks)
    assert(kernel === pageToMarkdown(None, blocks.reverse))
    val distributed = NotionMarkdown.pagesToMarkdown(blocks.toDS())
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(distributed("pE") === kernel)
    // and the order itself is the UTF-8 one: E000 before the emoji
    assert(kernel.indexOf("private") < kernel.indexOf("emoji"))
  }
}
