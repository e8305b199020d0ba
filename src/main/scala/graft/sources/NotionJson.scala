package graft.sources

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions.col

/** S1/S2 ingestion without connectors: read a Notion export dump (JSON
  * lines, one block per line in the Notion API's own block shape —
  * notion_collector.py:145-205 `/blocks/{id}/children` results, with
  * `page_id`/`block_idx` stamped by the exporter and table children
  * inlined) into `Dataset[NotionBlock]` feeding [[NotionMarkdown]].
  *
  * The reference fetches these objects page-by-page over HTTP and decodes
  * them in-process; the fetch loop is out of engine scope (SURVEY.md §2.1),
  * but everything AFTER the bytes land is not — this reader turns the dump
  * into the typed block Dataset so `pagesToMarkdown` covers S1-S3 end to
  * end. Reading is schema-first (`spark.read.schema(...).json`): no
  * inference pass, malformed lines are dropped (see [[readBlocks]]), scales
  * as a plain distributed JSON scan.
  */
object NotionJson {

  // Raw mirrors of the Notion API JSON (only the subset the reference
  // reads: notion_collector.py:168-183 rich text, 207-300 block payloads).
  case class RawText(content: Option[String])
  case class RawRichText(`type`: Option[String], text: Option[RawText],
                         href: Option[String])
  case class RawPayload(rich_text: Option[Seq[RawRichText]],
                        checked: Option[Boolean],
                        language: Option[String])
  case class RawCells(cells: Option[Seq[Seq[RawRichText]]])
  case class RawTableRow(table_row: Option[RawCells])
  case class RawBlock(
      page_id: String,
      block_idx: Option[Int], // Option: a malformed line must not kill the scan
      `type`: String,
      paragraph: Option[RawPayload],
      heading_1: Option[RawPayload],
      heading_2: Option[RawPayload],
      heading_3: Option[RawPayload],
      bulleted_list_item: Option[RawPayload],
      numbered_list_item: Option[RawPayload],
      to_do: Option[RawPayload],
      code: Option[RawPayload],
      quote: Option[RawPayload],
      children: Option[Seq[RawTableRow]])

  private def toRichText(items: Option[Seq[RawRichText]]): Seq[NotionRichText] =
    items.getOrElse(Nil).map { i =>
      NotionRichText(
        i.`type`.orNull,
        i.text.flatMap(_.content).getOrElse(""),
        i.href)
    }

  /** RawBlock → NotionBlock: payload comes from the field named by `type`
    * (the reference's `block[block_type]` access, notion_collector.py:218). */
  def toBlock(b: RawBlock): NotionBlock = {
    val payload: Option[RawPayload] = b.`type` match {
      case "paragraph"          => b.paragraph
      case "heading_1"          => b.heading_1
      case "heading_2"          => b.heading_2
      case "heading_3"          => b.heading_3
      case "bulleted_list_item" => b.bulleted_list_item
      case "numbered_list_item" => b.numbered_list_item
      case "to_do"              => b.to_do
      case "code"               => b.code
      case "quote"              => b.quote
      case _                    => None
    }
    val tableRows = b.children.getOrElse(Nil).flatMap(_.table_row).map { cells =>
      NotionTableRow(cells.cells.getOrElse(Nil).map(c => toRichText(Some(c))))
    }
    NotionBlock(
      page_id = b.page_id,
      block_idx = b.block_idx.getOrElse(0),
      block_type = b.`type`,
      rich_text = toRichText(payload.flatMap(_.rich_text)),
      checked = payload.flatMap(_.checked),
      language = payload.flatMap(_.language),
      table_rows = tableRows)
  }

  /** Read a block dump (JSON lines) into the typed block Dataset. Malformed
    * lines degrade, never throw: a line Jackson can't parse nulls every
    * field (schema-first read), one missing a required key nulls that field
    * — rows without a page_id, block_idx, or type are dropped so one bad
    * line can't fail the whole scan. */
  def readBlocks(spark: SparkSession, path: String): Dataset[NotionBlock] = {
    import spark.implicits._
    spark.read
      .schema(Encoders.product[RawBlock].schema)
      .json(path)
      .filter(col("page_id").isNotNull && col("block_idx").isNotNull &&
        col("type").isNotNull)
      .as[RawBlock]
      .map(toBlock)
  }

  /** Dump → one markdown document per page (the full S1→S3 ingestion). */
  def readPages(spark: SparkSession, path: String,
                titles: Option[org.apache.spark.sql.DataFrame] = None) =
    NotionMarkdown.pagesToMarkdown(readBlocks(spark, path), titles)
}
