package graft.operators

/** BERT-style WordPiece tokenizer (Devlin et al. 2018; the public
  * algorithm sentence-transformers' all-MiniLM-L6-v2 uses, uncased):
  * basic tokenization (lowercase, accent-strip, punctuation split) then
  * greedy longest-match against the vocab with `##` continuation pieces;
  * unmatched words become `[UNK]`. Pure Scala, no model runtime — fully
  * testable offline with a synthetic vocab, which is exactly what keeps
  * the ONNX seam below honest: everything EXCEPT the session call is
  * exercised by specs in this sandbox. */
final class WordPieceTokenizer(vocab: Map[String, Int],
                               val unkToken: String = "[UNK]",
                               maxCharsPerWord: Int = 100) extends Serializable {
  require(vocab.contains(unkToken), s"vocab must contain $unkToken")

  def id(token: String): Int = vocab.getOrElse(token, vocab(unkToken))

  /** Raw membership — no [UNK] fallback, so deployment gates can tell a
    * missing token from one that maps to [UNK]. */
  def contains(token: String): Boolean = vocab.contains(token)

  /** Lowercase, strip combining accents, split on whitespace and around
    * punctuation — BERT's uncased BasicTokenizer, including its
    * `_clean_text` (control/format chars dropped, \t\n\r already covered
    * by the whitespace split) and `_tokenize_chinese_chars` (every CJK
    * ideograph is its own token) steps, so tokenization of CJK or
    * control-laden text matches the real BertTokenizer instead of
    * silently gluing ideographs into unsplittable [UNK] words. */
  def basicTokenize(text: String): Array[String] = {
    if (text == null || text.isEmpty) return Array.empty
    val norm = java.text.Normalizer.normalize(
      text.toLowerCase(java.util.Locale.ROOT), java.text.Normalizer.Form.NFD)
      .filterNot(c => Character.getType(c) == Character.NON_SPACING_MARK)
    val out = Array.newBuilder[String]
    val cur = new java.lang.StringBuilder
    def flush(): Unit = if (cur.length > 0) { out += cur.toString; cur.setLength(0) }
    var i = 0
    while (i < norm.length) {
      val cp = norm.codePointAt(i)
      val t = Character.getType(cp)
      if (cp == 0 || cp == 0xFFFD ||
          ((t == Character.CONTROL || t == Character.FORMAT) &&
            !Character.isWhitespace(cp))) {
        () // _clean_text: drop NUL, replacement char, Cc/Cf
      } else if (Character.isWhitespace(cp)) flush()
      else if (WordPieceTokenizer.isCjk(cp)) {
        flush(); out += new String(Character.toChars(cp))
      } else if (!Character.isLetterOrDigit(cp)) {
        flush(); out += new String(Character.toChars(cp))
      } else cur.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    flush()
    out.result()
  }

  /** Greedy longest-match sub-word split of one basic token. */
  def wordpiece(word: String): Array[String] = {
    if (word.length > maxCharsPerWord) return Array(unkToken)
    val pieces = Array.newBuilder[String]
    var start = 0
    while (start < word.length) {
      var end = word.length
      var found: String = null
      while (end > start && found == null) {
        val sub = (if (start > 0) "##" else "") + word.substring(start, end)
        if (vocab.contains(sub)) found = sub else end -= 1
      }
      if (found == null) return Array(unkToken)
      pieces += found
      start = end
    }
    pieces.result()
  }

  def tokenize(text: String): Array[String] =
    basicTokenize(text).flatMap(wordpiece)
}

object WordPieceTokenizer {
  /** Load a BERT vocab.txt (one token per line, line number = id). */
  def fromFile(path: String): WordPieceTokenizer =
    new WordPieceTokenizer(loadVocab(path))

  /** The raw token→id map, separated from the constructor so the
    * deployment gate can inspect membership BEFORE the class invariant
    * (vocab must contain [UNK]) gets a chance to throw its own,
    * less diagnostic error. */
  def loadVocab(path: String): Map[String, Int] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try src.getLines().zipWithIndex.map { case (t, i) => (t, i) }.toMap
    finally src.close()
  }

  /** BERT's `_is_chinese_char` CJK blocks (the basic tokenizer splits
    * these into single-character tokens). */
  private[operators] def isCjk(cp: Int): Boolean =
    (cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3400 && cp <= 0x4DBF) ||
    (cp >= 0x20000 && cp <= 0x2A6DF) || (cp >= 0x2A700 && cp <= 0x2B73F) ||
    (cp >= 0x2B740 && cp <= 0x2B81F) || (cp >= 0x2B820 && cp <= 0x2CEAF) ||
    (cp >= 0xF900 && cp <= 0xFAFF) || (cp >= 0x2F800 && cp <= 0x2FA1F)
}

/** The PRODUCTION half of the V1 seam: sentence-transformers
  * all-MiniLM-L6-v2 served through ONNX Runtime — the reference's
  * embedding model (document_processor.py:125-150, rag_config.py:63-69)
  * — written code-complete and gated on artifacts this sandbox cannot
  * hold: the exported model file, its vocab.txt, and the onnxruntime jar
  * (no new libraryDependencies may be added here, so the session is
  * reached REFLECTIVELY — the class compiles and loads without the jar,
  * and binds to it when deployed with one).
  *
  * Everything around the session is real and spec-covered offline: the
  * WordPiece tokenizer above, [CLS]/[SEP] framing + truncation, and
  * attention-masked mean pooling + l2 normalization
  * ([[OnnxMiniLmEmbedder.meanPoolNormalize]] — MiniLM's documented
  * pooling). The lifecycle follows the seam's contract: construction is
  * cheap and Serializable; the expensive state (tokenizer + ONNX session)
  * lives in `@transient lazy val`s that materialize once per executor.
  *
  * Use [[OnnxMiniLmEmbedder.ifAvailable]] to fall back to the offline
  * default when the artifacts are absent:
  * {{{
  * val embedder = OnnxMiniLmEmbedder.ifAvailable(modelPath, vocabPath)
  *   .getOrElse(HashingEmbedder)
  * }}} */
final class OnnxMiniLmEmbedder(modelPath: String, vocabPath: String,
                               maxSeqLen: Int = 256,
                               val dim: Int = 384) extends TextEmbedder {

  val name: String = "all-MiniLM-L6-v2-onnx"

  @transient private lazy val tokenizer = WordPieceTokenizer.fromFile(vocabPath)

  // (OrtEnvironment, OrtSession), resolved reflectively — see class doc
  @transient private lazy val session: (AnyRef, AnyRef) = {
    val envCls = Class.forName("ai.onnxruntime.OrtEnvironment")
    val env = envCls.getMethod("getEnvironment").invoke(null)
    val sess = envCls.getMethod("createSession", classOf[String])
      .invoke(env, modelPath)
    (env, sess)
  }

  /** [CLS] ids(text) [SEP], truncated to maxSeqLen; (ids, attention). */
  private[graft] def encode(text: String): (Array[Long], Array[Long]) = {
    val tk = tokenizer
    val body = tk.tokenize(if (text == null) "" else text)
      .take(maxSeqLen - 2)
    val ids = (tk.id("[CLS]") +: body.map(tk.id).toSeq :+ tk.id("[SEP]"))
      .map(_.toLong).toArray
    (ids, Array.fill(ids.length)(1L))
  }

  def embedBatch(texts: Iterator[String]): Iterator[Array[Float]] = {
    val batch = texts.toArray
    if (batch.isEmpty) return Iterator.empty
    val encoded = batch.map(encode)
    val maxLen = encoded.map(_._1.length).max
    val ids = encoded.map { case (i, _) => i ++ Array.fill(maxLen - i.length)(0L) }
    val mask = encoded.map { case (_, m) => m ++ Array.fill(maxLen - m.length)(0L) }
    val hidden = run(ids, mask)
    OnnxMiniLmEmbedder.meanPoolNormalize(hidden, mask, dim).iterator
  }

  /** One ONNX forward pass, reflective: last_hidden_state
    * [batch, seq, dim]. */
  private def run(ids: Array[Array[Long]],
                  mask: Array[Array[Long]]): Array[Array[Array[Float]]] = {
    val (env, sess) = session
    val tensorCls = Class.forName("ai.onnxruntime.OnnxTensor")
    val create = tensorCls.getMethods
      .find(m => m.getName == "createTensor" && m.getParameterCount == 2 &&
        m.getParameterTypes()(1) == classOf[Object])
      .getOrElse(throw new IllegalStateException("OnnxTensor.createTensor not found"))
    def tensor(a: Array[Array[Long]]): AnyRef = create.invoke(null, env, a)
    val inputs = new java.util.HashMap[String, AnyRef]()
    inputs.put("input_ids", tensor(ids))
    inputs.put("attention_mask", tensor(mask))
    // MiniLM exports carry token_type_ids; a single segment is all zeros
    inputs.put("token_type_ids", tensor(ids.map(r => Array.fill(r.length)(0L))))
    val runM = sess.getClass.getMethods
      .find(m => m.getName == "run" && m.getParameterCount == 1 &&
        classOf[java.util.Map[_, _]].isAssignableFrom(m.getParameterTypes()(0)))
      .getOrElse(throw new IllegalStateException("OrtSession.run(Map) not found"))
    val result = runM.invoke(sess, inputs)
    try {
      val getM = result.getClass.getMethods
        .find(m => m.getName == "get" && m.getParameterCount == 1 &&
          m.getParameterTypes()(0) == classOf[Int])
        .getOrElse(throw new IllegalStateException("Result.get(int) not found"))
      val value = getM.invoke(result, Integer.valueOf(0))
      value.getClass.getMethod("getValue").invoke(value)
        .asInstanceOf[Array[Array[Array[Float]]]]
    } finally result.getClass.getMethod("close").invoke(result)
  }
}

object OnnxMiniLmEmbedder {

  /** True when the deployment artifacts exist AND onnxruntime is on the
    * classpath — the file-existence gate the specs and callers share. */
  def available(modelPath: String, vocabPath: String): Boolean =
    new java.io.File(modelPath).isFile && new java.io.File(vocabPath).isFile &&
      (try { Class.forName("ai.onnxruntime.OrtEnvironment"); true }
       catch { case _: ClassNotFoundException => false })

  /** The gated constructor callers compose with `.getOrElse(HashingEmbedder)`.
    *
    * The gate distinguishes CLEAN ABSENCE from MISDEPLOYMENT: None only
    * when NO artifact is present (the offline sandbox, by design). Any
    * half-deployed state — artifacts without the onnxruntime jar, one
    * file of the pair, an empty model file, a vocab missing the special
    * tokens — throws instead of returning None, because the
    * `.getOrElse(HashingEmbedder)` composition would otherwise silently
    * serve hash embeddings where the deployer installed MiniLM (the
    * quietest possible retrieval-quality failure). OnnxEmbedderSpec
    * drills every branch offline. */
  def ifAvailable(modelPath: String, vocabPath: String,
                  maxSeqLen: Int = 256): Option[OnnxMiniLmEmbedder] = {
    val model = new java.io.File(modelPath)
    val vocab = new java.io.File(vocabPath)
    if (!model.isFile && !vocab.isFile) return None
    def fail(why: String) = throw new IllegalStateException(
      s"MiniLM artifacts misdeployed ($why) — refusing the silent " +
        s"HashingEmbedder fallback; fix the deployment or remove BOTH " +
        s"artifacts to opt into the offline default (model=$modelPath, " +
        s"vocab=$vocabPath)")
    if (!model.isFile) fail("vocab present but model file missing")
    if (!vocab.isFile) fail("model present but vocab file missing")
    if (model.length() == 0L) fail("model file is empty")
    // raw membership, NOT WordPieceTokenizer.id: id() falls back to
    // vocab("[UNK]") internally, so a vocab missing [UNK] itself would
    // throw a bare key-not-found instead of this gate's diagnostic
    val rawVocab = WordPieceTokenizer.loadVocab(vocabPath)
    Seq("[UNK]", "[CLS]", "[SEP]").foreach { t =>
      if (!rawVocab.contains(t)) fail(s"vocab has no $t token")
    }
    if (try { Class.forName("ai.onnxruntime.OrtEnvironment"); false }
        catch { case _: ClassNotFoundException => true })
      fail("artifacts present but onnxruntime is not on the classpath")
    Some(new OnnxMiniLmEmbedder(modelPath, vocabPath, maxSeqLen))
  }

  /** Attention-masked mean pooling over the last hidden state + l2
    * normalization — MiniLM's documented sentence-embedding pooling,
    * separated out so the math is spec-checkable without a model. An
    * all-padding row (empty text) embeds to the zero vector, the
    * HashingEmbedder convention. */
  def meanPoolNormalize(hidden: Array[Array[Array[Float]]],
                        mask: Array[Array[Long]],
                        dim: Int): Array[Array[Float]] =
    hidden.zip(mask).map { case (seq, m) =>
      val v = new Array[Float](dim)
      var n = 0L
      var t = 0
      while (t < seq.length) {
        if (t < m.length && m(t) == 1L) {
          n += 1
          var d = 0
          while (d < dim) { v(d) += seq(t)(d); d += 1 }
        }
        t += 1
      }
      if (n > 0) {
        var norm = 0.0
        var d = 0
        while (d < dim) { v(d) /= n; norm += v(d).toDouble * v(d); d += 1 }
        if (norm > 0) {
          val inv = 1.0 / math.sqrt(norm)
          d = 0
          while (d < dim) { v(d) = (v(d) * inv).toFloat; d += 1 }
        }
      }
      v
    }
}
