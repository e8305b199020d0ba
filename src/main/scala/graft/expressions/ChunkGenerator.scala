package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.ChunkOps

/** SQL-callable chunker (SURVEY.md §7.4): a Catalyst table generator so a
  * user who lives in `spark.sql` can chunk without the Scala API —
  *
  * {{{
  * SELECT d.doc_id, c.* FROM docs d
  * LATERAL VIEW graft_chunk(d.doc_id, d.text, 1000, 200) c
  * }}}
  *
  * Row-for-row identical to `ChunkOps.chunkFlat` (same kernel:
  * document_processor.py:96-120 semantics — recursive 1000/200 split,
  * <50-char stripped chunks dropped, md5 ids over the unstripped text);
  * chunk size/overlap default to the reference's 1000/200 when the 2-arg
  * form is used. One input row → N chunk rows inside `Generate`, a narrow
  * stage — the same 100 TB shape as the typed flatMap.
  */
case class ChunkGenerator(children: Seq[Expression])
    extends Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_id", StringType, nullable = false),
    StructField("content", StringType, nullable = false),
    StructField("chunk_index", IntegerType, nullable = false),
    StructField("word_count", IntegerType, nullable = false),
    StructField("start_char", IntegerType, nullable = false),
    StructField("end_char", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.length != 2 && children.length != 4)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName takes (doc_id, text) or (doc_id, text, chunk_size, overlap), " +
          s"got ${children.length} arguments")
    val idOk = children.head.dataType match {
      case LongType | IntegerType | ShortType => true
      case _                                  => false
    }
    val textOk = children(1).dataType == StringType
    val sizesOk = children.drop(2).forall(c => c.dataType == IntegerType && c.foldable)
    if (!(idOk && textOk && sizesOk))
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (integral doc_id, string text[, int literal chunk_size, " +
          s"int literal overlap]), got ${children.map(_.dataType.catalogString).mkString(", ")}")
    // value-level checks mirroring the reference splitter's contract
    // (document_processor.py: overlap must leave forward progress): a null
    // or non-positive chunk_size, negative overlap, or overlap >= chunk_size
    // would otherwise silently degrade to per-char splits / empty output.
    if (children.length == 4) {
      val sizeRaw = children(2).eval(null)
      val overlapRaw = children(3).eval(null)
      if (sizeRaw == null || overlapRaw == null)
        return TypeCheckResult.TypeCheckFailure(
          s"$prettyName chunk_size and overlap must be non-null literals")
      val size = sizeRaw.asInstanceOf[Int]
      val ov = overlapRaw.asInstanceOf[Int]
      if (size <= 0)
        return TypeCheckResult.TypeCheckFailure(
          s"$prettyName chunk_size must be > 0, got $size")
      if (ov < 0 || ov >= size)
        return TypeCheckResult.TypeCheckFailure(
          s"$prettyName overlap must be in [0, chunk_size), got overlap=$ov " +
            s"chunk_size=$size")
    }
    TypeCheckResult.TypeCheckSuccess
  }

  private lazy val chunkSize: Int =
    if (children.length > 2) children(2).eval(null).asInstanceOf[Int] else ChunkOps.FlatChunkSize
  private lazy val overlap: Int =
    if (children.length > 3) children(3).eval(null).asInstanceOf[Int] else ChunkOps.FlatOverlap

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val idRaw = children.head.eval(input)
    val textRaw = children(1).eval(input)
    if (idRaw == null || textRaw == null) return Nil
    val docId = idRaw match {
      case l: java.lang.Long    => l.longValue()
      case i: java.lang.Integer => i.longValue()
      case s: java.lang.Short   => s.longValue()
    }
    ChunkOps.chunkDocument(docId, textRaw.toString, chunkSize, overlap).map { c =>
      InternalRow(
        UTF8String.fromString(c.chunk_id), UTF8String.fromString(c.content),
        c.chunk_index, c.word_count, c.start_char, c.end_char)
    }
  }

  override def prettyName: String = "graft_chunk"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}
