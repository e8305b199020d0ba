package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{OnnxMiniLmEmbedder, WordPieceTokenizer}

/** The ONNX MiniLM seam, tested to the exact boundary the sandbox allows:
  * the WordPiece tokenizer, the [CLS]/[SEP] framing, and the pooling math
  * run for real; the session-backed end-to-end test cancels HONESTLY
  * (scalatest assume) when the model artifacts are absent, and runs when
  * a deployment provides them. */
class OnnxEmbedderSpec extends AnyFunSuite {

  private val vocab = Map(
    "[PAD]" -> 0, "[UNK]" -> 1, "[CLS]" -> 2, "[SEP]" -> 3,
    "spark" -> 4, "join" -> 5, "##s" -> 6, "un" -> 7, "##join" -> 8,
    "." -> 9, "a" -> 10)
  private val tk = new WordPieceTokenizer(vocab)

  test("basic tokenization lowercases, strips accents, splits punctuation") {
    assert(tk.basicTokenize("Spark JOINS.").toSeq === Seq("spark", "joins", "."))
    assert(tk.basicTokenize("  a\tspark ").toSeq === Seq("a", "spark"))
    assert(tk.basicTokenize("spärk").toSeq === Seq("spark")) // NFD accent strip
    assert(tk.basicTokenize("").isEmpty && tk.basicTokenize(null).isEmpty)
  }

  test("wordpiece is greedy longest-match with ## continuations and [UNK]") {
    assert(tk.wordpiece("joins").toSeq === Seq("join", "##s"))
    assert(tk.wordpiece("unjoin").toSeq === Seq("un", "##join"))
    assert(tk.wordpiece("zzz").toSeq === Seq("[UNK]")) // no piece covers it
    assert(tk.tokenize("Spark unjoins.").toSeq ===
      Seq("spark", "un", "##join", "##s", "."))
  }

  test("encode frames with [CLS]/[SEP] and truncates to the sequence budget") {
    val vocabFile = java.nio.file.Files.createTempFile("graft_vocab", ".txt")
    java.nio.file.Files.write(vocabFile,
      vocab.toSeq.sortBy(_._2).map(_._1).mkString("\n").getBytes("UTF-8"))
    val e = new OnnxMiniLmEmbedder("/nonexistent/model.onnx",
      vocabFile.toString, maxSeqLen = 6)
    val (ids, mask) = e.encode("spark joins a spark join") // 6 pieces > budget 4
    assert(ids.length === 6 && mask.forall(_ == 1L))
    assert(ids.head === 2L && ids.last === 3L) // [CLS] ... [SEP]
    assert(ids.toSeq === Seq(2L, 4L, 5L, 6L, 10L, 3L))
    val (empty, _) = e.encode(null)
    assert(empty.toSeq === Seq(2L, 3L))
  }

  test("mean pooling honors the attention mask and l2-normalizes") {
    val hidden = Array(Array(
      Array(1f, 0f, 0f), Array(0f, 1f, 0f), Array(100f, 100f, 100f)))
    val mask = Array(Array(1L, 1L, 0L)) // the 100s are padding
    val Array(v) = OnnxMiniLmEmbedder.meanPoolNormalize(hidden, mask, 3)
    val exp = 0.5 / math.sqrt(0.5) // mean (.5,.5,0) normalized
    assert(math.abs(v(0) - exp) < 1e-6 && math.abs(v(1) - exp) < 1e-6 &&
      v(2) === 0f)
    // an all-padding row (empty text) embeds to the zero vector
    val Array(z) = OnnxMiniLmEmbedder.meanPoolNormalize(
      Array(Array(Array(9f, 9f, 9f))), Array(Array(0L)), 3)
    assert(z.toSeq === Seq(0f, 0f, 0f))
  }

  test("the availability gate is false without artifacts or runtime") {
    assert(!OnnxMiniLmEmbedder.available("/nonexistent/model.onnx",
      "/nonexistent/vocab.txt"))
    assert(OnnxMiniLmEmbedder.ifAvailable("/nonexistent/model.onnx",
      "/nonexistent/vocab.txt").isEmpty)
  }

  test("CJK ideographs split per character; control chars are dropped " +
       "(BERT _tokenize_chinese_chars / _clean_text)") {
    assert(tk.basicTokenize("深度学习 spark").toSeq ===
      Seq("深", "度", "学", "习", "spark"))
    // an ideograph glued to latin text still splits out
    assert(tk.basicTokenize("spark学join").toSeq === Seq("spark", "学", "join"))
    // NUL, BEL (Cc), zero-width joiner (Cf), U+FFFD all vanish; \t\n stay
    // word separators
    assert(tk.basicTokenize("a\u0000b\u0007c\u200Dd\uFFFDe").toSeq === Seq("abcde"))
    assert(tk.basicTokenize("a\tb\nc").toSeq === Seq("a", "b", "c"))
  }

  test("misdeployment drill: half-deployed artifacts fail loudly instead " +
       "of silently falling back to hash embeddings") {
    val dir = java.nio.file.Files.createTempDirectory("graft_onnx_drill")
    val model = dir.resolve("model.onnx")
    val vocabF = dir.resolve("vocab.txt")
    def write(p: java.nio.file.Path, s: String) =
      java.nio.file.Files.write(p, s.getBytes("UTF-8"))
    def gate() = OnnxMiniLmEmbedder.ifAvailable(model.toString, vocabF.toString)

    // both absent: the clean offline default — None, no throw
    assert(gate().isEmpty)
    // vocab without model (and vice versa): misdeployment, loud
    write(vocabF, Seq("[PAD]", "[UNK]", "[CLS]", "[SEP]", "spark").mkString("\n"))
    val e1 = intercept[IllegalStateException](gate())
    assert(e1.getMessage.contains("model file missing"))
    write(model, "") // model now present but EMPTY — a truncated copy
    val e2 = intercept[IllegalStateException](gate())
    assert(e2.getMessage.contains("empty"))
    write(model, "not really onnx but non-empty")
    // vocab missing [CLS]: the framing would silently encode [UNK] [UNK]
    write(vocabF, Seq("[PAD]", "[UNK]", "spark").mkString("\n"))
    val e3 = intercept[IllegalStateException](gate())
    assert(e3.getMessage.contains("[CLS]"))
    // vocab missing [UNK] ITSELF: the check must not route through the
    // tokenizer's id() fallback (which throws a bare key-not-found) — the
    // gate's misdeployment diagnostic must survive this branch too
    write(vocabF, Seq("[PAD]", "[CLS]", "[SEP]", "spark").mkString("\n"))
    val e3b = intercept[IllegalStateException](gate())
    assert(e3b.getMessage.contains("[UNK]") &&
      e3b.getMessage.contains("misdeployed"))
    // full artifacts but no onnxruntime on this classpath (always true in
    // this sandbox): STILL loud — the jar was forgotten, not the model
    write(vocabF, Seq("[PAD]", "[UNK]", "[CLS]", "[SEP]", "spark").mkString("\n"))
    val e4 = intercept[IllegalStateException](gate())
    assert(e4.getMessage.contains("onnxruntime"))
  }

  test("end-to-end MiniLM embedding (cancels honestly without the model)") {
    val modelPath = sys.env.getOrElse("GRAFT_MINILM_ONNX",
      "/models/all-MiniLM-L6-v2/model.onnx")
    val vocabPath = sys.env.getOrElse("GRAFT_MINILM_VOCAB",
      "/models/all-MiniLM-L6-v2/vocab.txt")
    assume(OnnxMiniLmEmbedder.available(modelPath, vocabPath),
      "MiniLM ONNX artifacts absent in this environment — the session leg " +
        "only runs on a deployment that ships them")
    val e = new OnnxMiniLmEmbedder(modelPath, vocabPath)
    val out = e.embedBatch(Iterator("a spark join", "completely different")).toArray
    assert(out.length === 2 && out.forall(_.length === e.dim))
    out.foreach { v =>
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-3, "embeddings must be l2-normalized")
    }
  }
}
