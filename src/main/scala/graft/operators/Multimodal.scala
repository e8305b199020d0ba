package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (builder north star): image/audio/video as
  * opaque `binary` columns with typed metadata, plus decode / feature-extract
  * / resize / frame-sample operators.
  *
  * The Spark-side plumbing is real and tested: schema, per-partition batched
  * processing (the shape a GPU/codec library needs — amortized init, batch
  * inference), frame-sampling as a generator, partition sizing by media
  * bytes. The codec itself is a clearly-marked STUB — this container has no
  * image/audio libraries — implemented as a deterministic byte-derived fake
  * so every downstream operator is testable and reproducible. Swapping in a
  * real decoder changes ONLY `decodeStub`.
  */
object Multimodal {

  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("sample_rate", IntegerType)))

  /** Deterministic synthetic media: expand a seed string into `nBytes` of
    * payload via chained md5 (fixture generator for tests/benchmarks). */
  def syntheticBytes(seed: String, nBytes: Int): Array[Byte] = {
    val out = new Array[Byte](nBytes)
    var block = seed.getBytes("UTF-8")
    var off = 0
    val md = MessageDigest.getInstance("MD5")
    while (off < nBytes) {
      block = md.digest(block)
      val n = math.min(16, nBytes - off)
      System.arraycopy(block, 0, out, off, n)
      off += n
    }
    out
  }

  /** Attach a synthetic media column + typed metadata to any keyed
    * DataFrame: (…, media: binary, media_meta: struct). */
  def withSyntheticMedia(df: DataFrame, idCol: String, nBytes: Int = 4096,
                         mediaType: String = "image/png"): DataFrame = {
    val gen = udf((id: String) => syntheticBytes(id, nBytes))
    df.withColumn("media", gen(col(idCol).cast("string")))
      .withColumn("media_meta", struct(
        lit(mediaType).as("media_type"),
        lit(64).as("width"), lit(64).as("height"),
        lit(16).as("n_frames"), lit(16000).as("sample_rate")))
  }

  /** STUB DECODER — deterministic fake standing in for a real image/audio
    * codec. Real impl: JNI/FFI into a codec; same signature, same batch
    * shape. Features: `dim` floats folded from the payload bytes. */
  def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    val v = new Array[Float](dim)
    if (bytes == null || bytes.isEmpty) return v
    var i = 0
    while (i < bytes.length) {
      v(i % dim) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    v
  }

  /** Batched per-partition feature extraction over the binary column — the
    * mapPartitions shape that amortizes model/codec init per partition and
    * feeds fixed-size batches (mirrors the embed batch-size-32 pattern). */
  def extractFeatures(df: DataFrame, idCol: String, dim: Int = 64,
                      batchSize: Int = 32): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val out = df.select(col(idCol).cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition init happens HERE in a real codec
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) => (id, decodeStub(bytes, dim)) }
        }
      }
    out.toDF(idCol, "features")
  }

  /** Frame sampling: one row per sampled frame index (generator shape,
    * 1 row → n_frames/stride rows), media payload NOT duplicated — frame
    * decode happens downstream against (id, frame_idx). */
  def sampleFrames(df: DataFrame, idCol: String, stride: Int = 4): DataFrame =
    df.select(col(idCol), col("media_meta"),
        explode(sequence(lit(0), col("media_meta.n_frames") - 1, lit(stride)))
          .as("frame_idx"))
      .select(col(idCol), col("frame_idx"))

  /** Spill-aware partition sizing for binary media: row counts are the
    * wrong capacity unit when one column holds multi-MB payloads (the
    * `maxPartitionBytes` analog for in-flight media), so repartition to
    * ceil(total payload bytes / target). One cheap aggregation, then a
    * round-robin exchange — at 100 TB this is what keeps a decode stage's
    * partitions inside executor memory regardless of per-row skew. */
  def repartitionByMediaBytes(df: DataFrame, targetBytesPerPartition: Long = 128L << 20,
                              mediaCol: String = "media"): DataFrame = {
    val total = df.agg(sum(length(col(mediaCol)).cast("long"))).head.getLong(0)
    val parts = math.max(1, math.ceil(total.toDouble / targetBytesPerPartition).toInt)
    df.repartition(parts)
  }

  /** "Resize": metadata-level transform (real impl rewrites payload through
    * the codec; the metadata contract is what downstream operators read). */
  def resizeMeta(df: DataFrame, width: Int, height: Int): DataFrame =
    df.withColumn("media_meta", struct(
      col("media_meta.media_type").as("media_type"),
      lit(width).as("width"), lit(height).as("height"),
      col("media_meta.n_frames").as("n_frames"),
      col("media_meta.sample_rate").as("sample_rate")))
}
