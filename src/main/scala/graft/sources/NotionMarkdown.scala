package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One Notion rich-text item (the subset the reference reads:
  * notion_collector.py:168-183 — only `type == "text"` items contribute,
  * links wrap the content as `[text](href)`). */
case class NotionRichText(rt_type: String, content: String, href: Option[String])

/** One table row: cells, each a rich-text run (notion_collector.py:231-242). */
case class NotionTableRow(cells: Seq[Seq[NotionRichText]])

/** One Notion block row. `block_idx` preserves API result order within a
  * page; type-specific payloads are nullable and only read for their type
  * (mirrors `block[block_type]` access, notion_collector.py:217-218). */
case class NotionBlock(
    page_id: String,
    block_idx: Int,
    block_type: String,
    rich_text: Seq[NotionRichText],
    checked: Option[Boolean],
    language: Option[String],
    table_rows: Seq[NotionTableRow])

/** S3: Notion block → markdown decode (notion_collector.py:207-325),
  * re-expressed as a distributed ingestion operator. The reference walks the
  * Notion API block tree per page over HTTP; here the already-fetched block
  * rows are a DataFrame (one row per block, table rows denormalized onto
  * their table block) and the decode is a narrow typed `map` — a pure map
  * stage at 100 TB. Page assembly is one shuffle on page_id.
  *
  * Kernels are plain Scala functions (string building is not profitably
  * expressible as Column trees) and unit-tested against hand-computed
  * markdown in NotionMarkdownSpec.
  */
object NotionMarkdown {

  /** Plain text from a rich-text run (notion_collector.py:168-183): only
    * `text`-typed items, href wraps as a markdown link, parts concatenated. */
  def richTextToString(items: Seq[NotionRichText]): String = {
    if (items == null) return ""
    items.iterator
      .filter(i => i != null && i.rt_type == "text")
      .map { i =>
        val text = Option(i.content).getOrElse("")
        i.href match {
          case Some(h) if h != null && h.nonEmpty => s"[$text]($h)"
          case _                                  => text
        }
      }
      .mkString
  }

  /** Markdown table from denormalized rows (notion_collector.py:223-252):
    * `| c1 | c2 |` lines with a `|---|---|` separator inserted after the
    * header; column count comes from splitting the RENDERED header line on
    * '|' and dropping the outer empties, exactly as the reference does. */
  def tableToMarkdown(rows: Seq[NotionTableRow]): String = {
    if (rows == null || rows.isEmpty) return "\n\n"
    val lines = rows.map { row =>
      val cells =
        if (row == null || row.cells == null) Seq.empty
        else row.cells.map(richTextToString)
      "| " + cells.mkString(" | ") + " |"
    }
    val header = lines.head
    // split with limit -1 keeps trailing empties (Python str.split parity)
    val nCols = header.split("\\|", -1).drop(1).dropRight(1).length
    val separator = "|" + Seq.fill(nCols)("---").mkString("|") + "|"
    (lines.head +: separator +: lines.tail).mkString("\n") + "\n\n"
  }

  /** One block to markdown (notion_collector.py:207-300). Unsupported types
    * fall back to their rich text + "\n" when non-empty, else "". */
  def blockToMarkdown(b: NotionBlock): String = {
    val text = richTextToString(b.rich_text)
    b.block_type match {
      case "table"              => tableToMarkdown(b.table_rows)
      case "paragraph"          => s"$text\n\n"
      case "heading_1"          => s"# $text\n\n"
      case "heading_2"          => s"## $text\n\n"
      case "heading_3"          => s"### $text\n\n"
      case "bulleted_list_item" => s"- $text\n"
      case "numbered_list_item" => s"1. $text\n"
      case "to_do" =>
        val checked = if (b.checked.contains(true)) "x" else " "
        s"- [$checked] $text\n"
      case "code" =>
        val language = b.language.getOrElse("")
        s"```$language\n$text\n```\n\n"
      case "quote"   => s"> $text\n\n"
      case "divider" => "---\n\n"
      case _         => if (text.nonEmpty) s"$text\n" else ""
    }
  }

  /** Whole page (notion_collector.py:302-325): optional `# title` header,
    * blocks in order, Python-strip of the result. Blocks sort by
    * (block_idx, rendered markdown) — the same total order the distributed
    * [[pagesToMarkdown]] struct sort applies — so duplicate block_idx values
    * tiebreak identically on both paths instead of depending on input order
    * (which a shuffle does not preserve anyway). The markdown tiebreak
    * compares UTF-8 bytes ([[graft.functions.Orderings.utf8]]), matching
    * Spark's `array_sort` UTF8String binary order; `String.compareTo` would
    * diverge when emoji mix with U+E000–U+FFFF characters. */
  def pageToMarkdown(title: Option[String], blocks: Seq[NotionBlock]): String = {
    val head = title.filter(_.nonEmpty).map(t => s"# $t\n\n").getOrElse("")
    val body = blocks.map(b => (b.block_idx, blockToMarkdown(b)))
      .sorted(Ordering.by[(Int, String), Int](_._1)
        .orElseBy(_._2)(graft.functions.Orderings.utf8))
      .iterator.map(_._2).mkString
    pyStrip(head + body)
  }

  /** Python str.strip(): all leading/trailing whitespace, not just spaces. */
  def pyStrip(s: String): String =
    s.replaceAll("^\\s+", "").replaceAll("\\s+$", "")

  /** Per-block decode: adds a `markdown` column. Narrow typed map — no
    * shuffle, scales with input splits. */
  def decodeBlocks(blocks: Dataset[NotionBlock]): DataFrame = {
    val spark = blocks.sparkSession
    import spark.implicits._
    blocks
      .map(b => (b.page_id, b.block_idx, b.block_type, blockToMarkdown(b)))
      .toDF("page_id", "block_idx", "block_type", "markdown")
  }

  /** Page assembly: one shuffle on page_id; blocks concatenated in
    * block_idx order (struct sort keys the index first, rendered markdown
    * second — the same tiebreak [[pageToMarkdown]] uses, so the two paths
    * agree even on pages with repeated indices), titles joined in when
    * provided (page_id, title). */
  def pagesToMarkdown(blocks: Dataset[NotionBlock],
                      titles: Option[DataFrame] = None): DataFrame = {
    val perBlock = decodeBlocks(blocks)
    val assembled = perBlock
      .groupBy(col("page_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("block_idx"), col("markdown")))),
        x => x.getField("markdown")), "").as("__body"))
    val withTitle = titles match {
      case Some(t) =>
        assembled.join(broadcast(t), Seq("page_id"), "left")
          .withColumn("__head",
            when(col("title").isNotNull && length(col("title")) > 0,
              concat(lit("# "), col("title"), lit("\n\n"))).otherwise(lit("")))
          .drop("title")
      case None => assembled.withColumn("__head", lit(""))
    }
    withTitle
      .select(col("page_id"),
        regexp_replace(regexp_replace(concat(col("__head"), col("__body")),
          "^\\s+", ""), "\\s+$", "").as("markdown"))
  }
}
