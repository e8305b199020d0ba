package graft.operators

/** Pluggable embedding model (the V1 seam): the reference encodes with
  * sentence-transformers all-MiniLM-L6-v2 (document_processor.py:125-150);
  * this environment is offline, so the shipped default is the deterministic
  * [[HashingEmbedder]]. A production MiniLM drops in as another
  * implementation — hold the model session in a `@transient lazy val` so it
  * initializes once per executor, deserialization stays cheap, and
  * `embedBatch` feeds it whole batches (Embedder.embedPartitions already
  * delivers fixed-size batches) — without touching any operator.
  */
trait TextEmbedder extends Serializable {

  /** Model tag stamped into the `embedding_model` column. */
  def name: String

  /** Output dimensionality (every vector embedBatch returns). */
  def dim: Int

  /** Encode one batch of texts, order-preserving, one l2-normalized
    * `dim`-sized vector per input. */
  def embedBatch(texts: Iterator[String]): Iterator[Array[Float]]
}

/** Deterministic offline default: signed feature-hashing projection of word
  * unigrams + char trigrams (Embedder.embedText), 384-dim like MiniLM. */
object HashingEmbedder extends TextEmbedder {
  val name: String = Embedder.ModelName
  val dim: Int = Embedder.Dim
  def embedBatch(texts: Iterator[String]): Iterator[Array[Float]] =
    texts.map(t => Embedder.embedText(t, dim))
}
