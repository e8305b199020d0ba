package graft.operators

import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** V1 embedding generation (SURVEY.md §2.6).
  *
  * The reference encodes chunk text with sentence-transformers
  * all-MiniLM-L6-v2 into 384-dim normalized vectors
  * (/root/reference/src/feature_pipeline/document_processor.py:125-150,
  * src/config/settings.py:40,44). This environment is offline (no model
  * download), so the operator keeps the exact shape — `embed(content) ->
  * 384-dim l2-normalized Array[Float]` with a model tag — but computes a
  * deterministic signed feature-hashing projection of word unigrams + char
  * trigrams (MurmurHash3, fixed seeds, stable across JVMs). Swappable for an
  * ONNX MiniLM without touching any caller: `embedPartitions` keeps the
  * mapPartitions shape a real model needs (per-partition init, batched
  * encode, batch 32 per rag_config.py:68); `embed` is the cheap per-row
  * Column form for the hashing featurizer.
  */
object Embedder {

  val Dim = 384
  val ModelName = "hashing-ngram-v1"
  // shared with the SQL replay (DuckSql.embedCtes) so the seeds cannot drift
  private[graft] val TokenSeed = 0x7a11
  private[graft] val TrigramSeed = 0x9e37

  /** Deterministic hashing featurizer: lowercase, word unigrams + char
    * trigrams of '#'-padded tokens, signed bucket accumulation, l2 norm. */
  def embedText(text: String, dim: Int = Dim): Array[Float] = {
    val v = new Array[Float](dim)
    if (text == null || text.isEmpty) return v
    val tokens = text.toLowerCase(java.util.Locale.ROOT)
      .split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty)
    var ti = 0
    while (ti < tokens.length) {
      val tok = tokens(ti)
      accumulate(v, MurmurHash3.stringHash(tok, TokenSeed), dim)
      val padded = "#" + tok + "#"
      var i = 0
      while (i + 3 <= padded.length) {
        accumulate(v, MurmurHash3.stringHash(padded.substring(i, i + 3), TrigramSeed), dim)
        i += 1
      }
      ti += 1
    }
    var norm = 0.0
    var i = 0
    while (i < dim) { norm += v(i).toDouble * v(i); i += 1 }
    if (norm > 0) {
      val inv = (1.0 / math.sqrt(norm))
      i = 0
      while (i < dim) { v(i) = (v(i) * inv).toFloat; i += 1 }
    }
    v
  }

  @inline private def accumulate(v: Array[Float], h: Int, dim: Int): Unit = {
    val idx = java.lang.Math.floorMod(h, dim)
    v(idx) += (if (h >= 0) 1f else -1f)
  }

  private val embedUdfImpl = udf((s: String) => embedText(s))

  /** Column form of the embedder (per-row UDF — fine for the hashing
    * featurizer, which has no init cost). */
  def embed(c: Column): Column = embedUdfImpl(c)

  /** Attach embedding + model tag columns (the reference's generate() step,
    * document_processor.py:138-150). Narrow map stage — no shuffle. */
  def withEmbeddings(df: DataFrame, textCol: String = "content",
                     outCol: String = "embedding"): DataFrame =
    df.withColumn(outCol, embed(col(textCol)))
      .withColumn("embedding_model", lit(ModelName))

  /** mapPartitions form: per-partition iteration + fixed-size batches — the
    * physical shape a real model (ONNX MiniLM) needs (batch 32 per
    * rag_config.py:68). The model is the [[TextEmbedder]] seam; the default
    * is the deterministic hashing featurizer, a MiniLM drops in without
    * touching this operator. Emits (idCol, embedding) keyed rows to join
    * back, keeping the operator schema-agnostic. */
  def embedPartitions(df: DataFrame, idCol: String, textCol: String,
                      batchSize: Int = BatchSize,
                      model: TextEmbedder = HashingEmbedder): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("string"), col(textCol))
      .as[(String, String)]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // one inference call per batch (a real model's session lives in a
          // @transient lazy val on the TextEmbedder — once per executor)
          val vecs = model.embedBatch(batch.iterator.map(_._2))
          batch.iterator.zip(vecs).map { case ((id, _), v) => (id, v) }
        }
      }
      .toDF(idCol, "embedding")
  }

  /** Model-pluggable form of [[withEmbeddings]]: same output schema (adds
    * `outCol` + `embedding_model`) for ANY [[TextEmbedder]], as ONE narrow
    * mapPartitions stage carrying the full row — no shuffle and no
    * join-back, the 100 TB shape (a real model's session initializes once
    * per executor inside the TextEmbedder, see [[RandomProjectionEmbedder]]).
    * The default [[HashingEmbedder]] keeps the codegen Column path, so
    * existing plans are untouched. */
  def withEmbeddingsModel(df: DataFrame, model: TextEmbedder,
                          textCol: String = "content",
                          outCol: String = "embedding",
                          batchSize: Int = BatchSize): DataFrame =
    if (model eq HashingEmbedder) withEmbeddings(df, textCol, outCol)
    else {
      import org.apache.spark.sql.{Encoders, Row}
      import org.apache.spark.sql.types._
      val outSchema = df.schema
        .add(StructField(outCol, ArrayType(FloatType, containsNull = false)))
        .add(StructField("embedding_model", StringType, nullable = false))
      val ti = df.schema.fieldIndex(textCol)
      val tag = model.name
      df.mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          val vecs = model.embedBatch(batch.iterator.map(_.getString(ti)))
          batch.iterator.zip(vecs).map { case (r, v) =>
            Row.fromSeq(r.toSeq :+ v.toSeq :+ tag)
          }
        }
      }(Encoders.row(outSchema))
    }

  val BatchSize = 32
}
