package graft.operators

import scala.collection.mutable.ListBuffer

/** Recursive-character text splitting (SURVEY.md §2.9 C1/C2).
  *
  * Reimplements the public LangChain `RecursiveCharacterTextSplitter`
  * semantics the reference relies on (separator hierarchy
  * ["\n\n","\n"," ",""], keep-separator merge, overlap backtracking) as pure
  * Scala, so chunking can run as a typed `flatMap` inside an executor with no
  * Python interop. Reference usage: /root/reference/src/feature_pipeline/
  * document_processor.py:83-123 (flat, 1000/200) and
  * parent_child_chunker.py:14-136 (2000/400 parents → 400/100 children).
  *
  * Oracle: graft.queries.DuckSql.chunkCtes replays this kernel in pure
  * DuckDB SQL (the separator recursion unrolls into four level blocks, the
  * merge loop runs as a recursive CTE over prefix sums), so every chunk
  * registry row is compared against an independent engine bit for bit —
  * fixing semantics here means fixing BOTH places.
  */
object RecursiveSplitter {

  val DefaultSeparators: List[String] = List("\n\n", "\n", " ", "")

  /** Split `text` into chunks of at most `chunkSize` chars with
    * `chunkOverlap` chars of carried-over context. */
  def splitText(text: String, chunkSize: Int, chunkOverlap: Int,
                separators: List[String] = DefaultSeparators): List[String] =
    if (text == null || text.isEmpty) Nil
    else splitRec(text, separators, chunkSize, chunkOverlap)

  private def splitRec(text: String, separators: List[String],
                       chunkSize: Int, chunkOverlap: Int): List[String] = {
    // choose the first separator present in the text; "" always matches
    var separator = separators.last
    var newSeparators: List[String] = Nil
    var i = 0
    var found = false
    while (i < separators.length && !found) {
      val s = separators(i)
      if (s.isEmpty) { separator = s; found = true }
      else if (text.contains(s)) {
        separator = s
        newSeparators = separators.drop(i + 1)
        found = true
      }
      i += 1
    }

    val splits = splitKeepSeparator(text, separator).filter(_.nonEmpty)
    // keep_separator=true → pieces already carry their separator, merge with ""
    val mergeSep = ""
    val finalChunks = ListBuffer.empty[String]
    val good = ListBuffer.empty[String]
    for (s <- splits) {
      if (s.length < chunkSize) good += s
      else {
        if (good.nonEmpty) {
          finalChunks ++= mergeSplits(good.toList, mergeSep, chunkSize, chunkOverlap)
          good.clear()
        }
        if (newSeparators.isEmpty) finalChunks += s
        else finalChunks ++= splitRec(s, newSeparators, chunkSize, chunkOverlap)
      }
    }
    if (good.nonEmpty)
      finalChunks ++= mergeSplits(good.toList, mergeSep, chunkSize, chunkOverlap)
    finalChunks.toList
  }

  /** Split on a literal separator, attaching each separator occurrence to the
    * START of the following piece (keep_separator semantics). Empty separator
    * explodes into single characters. */
  private[operators] def splitKeepSeparator(text: String, sep: String): List[String] = {
    if (sep.isEmpty) return text.map(_.toString).toList
    val first = text.indexOf(sep)
    if (first < 0) return List(text)
    val buf = ListBuffer.empty[String]
    buf += text.substring(0, first)
    var cur = first
    while (cur >= 0) {
      val next = text.indexOf(sep, cur + sep.length)
      if (next < 0) { buf += text.substring(cur); cur = -1 }
      else { buf += text.substring(cur, next); cur = next }
    }
    buf.toList
  }

  /** Greedy merge of small splits into ≤chunkSize chunks, backtracking the
    * running window to keep ≤chunkOverlap chars of trailing context. */
  private[operators] def mergeSplits(splits: List[String], sep: String,
                                     chunkSize: Int, chunkOverlap: Int): List[String] = {
    val sepLen = sep.length
    val docs = ListBuffer.empty[String]
    var current = Vector.empty[String]
    var total = 0
    def sepIf(cond: Boolean): Int = if (cond) sepLen else 0
    for (d <- splits) {
      val len = d.length
      if (total + len + sepIf(current.nonEmpty) > chunkSize && current.nonEmpty) {
        joinDocs(current, sep).foreach(docs += _)
        while (total > chunkOverlap ||
               (total + len + sepIf(current.nonEmpty) > chunkSize && total > 0)) {
          total -= current.head.length + sepIf(current.length > 1)
          current = current.tail
        }
      }
      current = current :+ d
      total += len + sepIf(current.length > 1)
    }
    joinDocs(current, sep).foreach(docs += _)
    docs.toList
  }

  private def joinDocs(docs: Seq[String], sep: String): Option[String] = {
    val text = docs.mkString(sep).trim
    if (text.isEmpty) None else Some(text)
  }

  /** Python-`str.split()` word count. */
  def pyWordCount(s: String): Int = {
    val t = s.trim
    if (t.isEmpty) 0 else t.split("\\s+").length
  }
}
