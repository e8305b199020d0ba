package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A flat chunk row (reference `DocumentChunk`, schemas.py:65-88, produced by
  * document_processor.py:83-123). `chunk_index` keeps the reference's gap
  * semantics: it enumerates ALL split chunks, including the <50-char ones
  * that are dropped. */
case class FlatChunk(
    chunk_id: String,
    document_id: Long,
    content: String,
    chunk_index: Int,
    word_count: Int,
    start_char: Int,
    end_char: Int)

/** A parent/child hierarchy chunk (parent_child_chunker.py:61-136). Parent
  * rows have null parent_content/child_index; children denormalize the full
  * parent text so parent-context retrieval needs no join at query time. */
case class HierChunk(
    chunk_id: String,
    document_id: Long,
    content: String,
    chunk_index: Int,
    word_count: Int,
    chunk_type: String,
    parent_id: String,
    parent_content: Option[String],
    child_index: Option[Int],
    child_count: Int)

/** Chunking as a distributed table-generating operator (SURVEY.md §2.9): one
  * document row → N chunk rows via typed `flatMap`. Narrow transformation —
  * no shuffle, scales with input splits; at 100 TB this is a pure map stage.
  */
object ChunkOps {

  val FlatChunkSize = 1000
  val FlatOverlap   = 200
  val ParentSize    = 2000
  val ParentOverlap = 400
  val ChildSize     = 400
  val ChildOverlap  = 100
  val MinChunkChars = 50

  private val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private val HexChars = "0123456789abcdef".toCharArray

  def md5Bytes(s: String): Array[Byte] = {
    val md = mdLocal.get()
    md.reset()
    md.digest(s.getBytes("UTF-8"))
  }

  def md5Hex(s: String): String = {
    val bytes = md5Bytes(s)
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** C1: flat chunking of one document (document_processor.py:96-120):
    * split at 1000/200, drop stripped-<50-char chunks, md5 ids from the
    * UNstripped chunk text, stored content stripped. */
  def chunkDocument(docId: Long, text: String,
                    chunkSize: Int = FlatChunkSize,
                    overlap: Int = FlatOverlap): Seq[FlatChunk] = {
    if (text == null || text.isEmpty) return Nil
    RecursiveSplitter.splitText(text, chunkSize, overlap).zipWithIndex.flatMap {
      case (chunkText, idx) =>
        if (chunkText.trim.length < MinChunkChars) None
        else Some(FlatChunk(
          chunk_id = md5Hex(s"${docId}_${idx}_${chunkText.take(100)}"),
          document_id = docId,
          content = chunkText.trim,
          chunk_index = idx,
          word_count = RecursiveSplitter.pyWordCount(chunkText),
          start_char = 0,
          end_char = chunkText.length))
    }
  }

  /** C2: parent-child hierarchy for one document
    * (parent_child_chunker.py:61-136): parents at 2000/400, children at
    * 400/100, one global running chunk_index, parent text denormalized onto
    * every child. */
  def chunkParentChild(docId: Long, text: String): Seq[HierChunk] = {
    if (text == null || text.isEmpty) return Nil
    val out = scala.collection.mutable.ListBuffer.empty[HierChunk]
    var chunkIndex = 0
    val parents = RecursiveSplitter.splitText(text, ParentSize, ParentOverlap)
    for ((parentText, parentIdx) <- parents.zipWithIndex) {
      val parentId = s"${docId}_parent_${parentIdx}"
      val parentPos = chunkIndex
      chunkIndex += 1
      val children = RecursiveSplitter.splitText(parentText, ChildSize, ChildOverlap)
      val childRows = children.zipWithIndex.map { case (childText, childIdx) =>
        val row = HierChunk(
          chunk_id = s"${parentId}_child_${childIdx}",
          document_id = docId,
          content = childText,
          chunk_index = chunkIndex,
          word_count = RecursiveSplitter.pyWordCount(childText),
          chunk_type = "child",
          parent_id = parentId,
          parent_content = Some(parentText),
          child_index = Some(childIdx),
          child_count = 0)
        chunkIndex += 1
        row
      }
      out += HierChunk(
        chunk_id = parentId,
        document_id = docId,
        content = parentText,
        chunk_index = parentPos,
        word_count = RecursiveSplitter.pyWordCount(parentText),
        chunk_type = "parent",
        parent_id = parentId,
        parent_content = None,
        child_index = None,
        child_count = childRows.length)
      out ++= childRows
    }
    out.toList
  }

  /** Distributed C1 over a documents DataFrame (doc_id, text, ...). */
  def chunkFlat(docs: DataFrame,
                idCol: String = "doc_id", textCol: String = "text",
                chunkSize: Int = FlatChunkSize, overlap: Int = FlatOverlap): Dataset[FlatChunk] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .flatMap { case (id, text) => chunkDocument(id, text, chunkSize, overlap) }
  }

  /** Distributed C2 over a documents DataFrame. */
  def chunkHierarchy(docs: DataFrame,
                     idCol: String = "doc_id", textCol: String = "text"): Dataset[HierChunk] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .flatMap { case (id, text) => chunkParentChild(id, text) }
  }

  /** C3: parent→children relationship map (parent_child_chunker.py:138-186),
    * as a DataFrame aggregation instead of per-row helpers. `child_ids` is a
    * sorted comma-joined string (not an array) so downstream comparisons and
    * the correctness gate can hash it — same convention as
    * Dedup.exactDuplicateGroups' dup_ids. */
  def parentChildRelationships(chunks: DataFrame): DataFrame =
    chunks.filter(col("chunk_type") === "child")
      .groupBy(col("parent_id"))
      .agg(array_join(sort_array(collect_list(col("chunk_id"))), ",").as("child_ids"),
           count(lit(1)).cast("int").as("n_children"))
}
