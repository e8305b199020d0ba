package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{ChunkOps, RecursiveSplitter}

/** Unit vectors + invariants for the recursive-character splitter
  * (LangChain semantics the reference relies on: separator hierarchy,
  * keep-separator merge, overlap backtracking — FIXTURES.md §2). */
class ChunkerSpec extends AnyFunSuite {

  test("merges word splits up to chunk size, overlap carries back") {
    assert(RecursiveSplitter.splitText("aaaa bbbb cccc", 10, 3) ===
      List("aaaa bbbb", "cccc"))
  }

  test("overlap retains trailing context") {
    assert(RecursiveSplitter.splitText("aa bb cc dd ee", 10, 5) ===
      List("aa bb cc", "cc dd ee"))
  }

  test("oversized single run falls through to char split") {
    assert(RecursiveSplitter.splitText("abcdefghij", 5, 0) ===
      List("abcde", "fghij"))
  }

  test("paragraph separator preferred when present and fits") {
    assert(RecursiveSplitter.splitText("hello\n\nworld", 20, 0) ===
      List("hello\n\nworld"))
  }

  test("paragraph split when too large for one chunk") {
    val text = "a" * 30 + "\n\n" + "b" * 30
    assert(RecursiveSplitter.splitText(text, 40, 0) ===
      List("a" * 30, "b" * 30))
  }

  test("empty and null text yield no chunks") {
    assert(RecursiveSplitter.splitText("", 100, 10).isEmpty)
    assert(ChunkOps.chunkDocument(1L, null).isEmpty)
  }

  test("chunkDocument drops <50-char chunks but keeps their index gap") {
    val text = "A" * 55 + "\n\n" + "B" * 10 + "\n\n" + "C" * 55
    val chunks = ChunkOps.chunkDocument(7L, text, chunkSize = 60, overlap = 0)
    assert(chunks.map(_.chunk_index) === Seq(0, 2))
    assert(chunks.map(_.content) === Seq("A" * 55, "C" * 55))
    assert(chunks.head.chunk_id === ChunkOps.md5Hex(s"7_0_${"A" * 55}"))
    assert(chunks.head.word_count === 1)
  }

  test("parent-child hierarchy: global index, denormalized parent content") {
    val text = ("para one word " * 40).trim + "\n\n" + ("para two word " * 40).trim
    val rows = ChunkOps.chunkParentChild(3L, text)
    val parents = rows.filter(_.chunk_type == "parent")
    val children = rows.filter(_.chunk_type == "child")
    assert(parents.nonEmpty && children.nonEmpty)
    // chunk_index is a dense global enumeration in emission order
    assert(rows.sortBy(_.chunk_index).map(_.chunk_index) === rows.indices)
    // every child's parent_id resolves and carries that parent's full text
    val byId = parents.map(p => p.chunk_id -> p).toMap
    children.foreach { c =>
      assert(byId.contains(c.parent_id))
      assert(c.parent_content.contains(byId(c.parent_id).content))
      assert(byId(c.parent_id).content.contains(c.content.take(20)))
    }
    // parent child_count matches
    parents.foreach { p =>
      assert(p.child_count === children.count(_.parent_id == p.chunk_id))
    }
    // ids follow the reference format
    assert(parents.head.chunk_id === "3_parent_0")
    assert(children.head.chunk_id === "3_parent_0_child_0")
  }

  test("invariants: chunks bounded, ordered, non-empty, cover the input") {
    val rnd = new scala.util.Random(42)
    val words = Array("alpha", "beta", "gamma", "delta", "ep")
    val seps  = Array(" ", " ", " ", " ", " ", " ", "\n", "\n", "\n\n")
    val texts = (0 until 200).map { _ =>
      val n = rnd.nextInt(120)
      (0 until n).map(_ => words(rnd.nextInt(words.length)) + seps(rnd.nextInt(seps.length))).mkString
    }
    texts.foreach { text =>
      val chunks = RecursiveSplitter.splitText(text, 40, 10)
      chunks.foreach { c =>
        assert(c.nonEmpty)
        // a chunk may exceed the bound only if it is a single unsplittable run
        assert(c.length <= 40 || !c.exists(ch => ch == ' ' || ch == '\n'))
      }
      // concatenation of chunks covers the trimmed input text modulo
      // whitespace (overlap duplicates words, never invents or loses them)
      val inputWords = text.split("\\s+").filter(_.nonEmpty)
      val chunkWords = chunks.flatMap(_.split("\\s+").filter(_.nonEmpty))
      assert(inputWords.toSet.subsetOf(chunkWords.toSet ++ Set("")))
    }
  }
}

