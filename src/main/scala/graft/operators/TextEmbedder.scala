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

/** Second [[TextEmbedder]] implementation — a Johnson–Lindenstrauss random
  * projection of hashed token features — built to exercise the seam with a
  * production model's exact lifecycle shape:
  *
  *  - construction is cheap and Serializable (the instance ships to
  *    executors in the task closure);
  *  - the expensive part (here the `features × dim` projection matrix; in
  *    production the ONNX Runtime session) lives in a `@transient lazy val`
  *    that materializes once per executor after deserialization and never
  *    crosses the wire;
  *  - `embedBatch` consumes whole batches, the tensor-at-a-time call a real
  *    model needs.
  *
  * Deterministic across JVMs (matrix cells are pure functions of their
  * index via MurmurHash3), so specs can pin driver-vs-distributed parity.
  * Null/empty text embeds to the zero vector, like [[HashingEmbedder]]. */
final class RandomProjectionEmbedder(val dim: Int = 64,
                                     features: Int = 2048,
                                     seed: Int = 0x5eed) extends TextEmbedder {
  import scala.util.hashing.MurmurHash3

  val name: String = s"random-projection-$dim"

  // the "session": stateless-seeded so equal instances rebuild the identical
  // matrix on every executor with no broadcast
  @transient private lazy val projection: Array[Array[Float]] =
    Array.tabulate(features, dim) { (f, d) =>
      (MurmurHash3.productHash((f, d, seed)) / 2147483648.0).toFloat // [-1, 1)
    }

  def embedBatch(texts: Iterator[String]): Iterator[Array[Float]] = {
    val proj = projection
    texts.map { t =>
      val v = new Array[Float](dim)
      if (t != null && t.nonEmpty) {
        val tokens = t.toLowerCase(java.util.Locale.ROOT)
          .split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty)
        tokens.foreach { tok =>
          val row = proj(java.lang.Math.floorMod(MurmurHash3.stringHash(tok, seed), features))
          var d = 0
          while (d < dim) { v(d) += row(d); d += 1 }
        }
        var n = 0.0
        var i = 0
        while (i < dim) { n += v(i).toDouble * v(i); i += 1 }
        if (n > 0) {
          val inv = 1.0 / math.sqrt(n)
          i = 0
          while (i < dim) { v(i) = (v(i) * inv).toFloat; i += 1 }
        }
      }
      v
    }
  }
}
