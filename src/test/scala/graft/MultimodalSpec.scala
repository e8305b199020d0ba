package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("synthetic media bytes are deterministic and sized") {
    val a = Multimodal.syntheticBytes("doc-1", 4096)
    val b = Multimodal.syntheticBytes("doc-1", 4096)
    val c = Multimodal.syntheticBytes("doc-2", 4096)
    assert(a.length === 4096)
    assert(a.toSeq === b.toSeq)
    assert(a.toSeq !== c.toSeq)
  }

  test("decode stub folds bytes into fixed-dim features") {
    val f = Multimodal.decodeStub(Multimodal.syntheticBytes("x", 256), 64)
    assert(f.length === 64)
    assert(f.exists(_ > 0f))
    assert(Multimodal.decodeStub(Array.empty, 64).forall(_ == 0f))
  }

  test("feature extraction pipeline: schema, batching, determinism") {
    import spark.implicits._
    val df = (0L until 100L).toDF("id")
    val media = Multimodal.withSyntheticMedia(df, "id", nBytes = 512)
    assert(media.schema("media").dataType.typeName === "binary")
    assert(media.schema("media_meta").dataType.typeName === "struct")
    val features = Multimodal.extractFeatures(media, "id", dim = 32, batchSize = 8)
    val rows = features.collect()
    assert(rows.length === 100)
    assert(rows.forall(_.getSeq[Float](1).length === 32))
    // deterministic across runs
    val again = Multimodal.extractFeatures(media, "id", dim = 32, batchSize = 8)
      .filter($"id" === 7L).head.getSeq[Float](1)
    val first = features.filter($"id" === 7L).head.getSeq[Float](1)
    assert(first === again)
  }

  test("frame sampling explodes the stride grid without duplicating payload") {
    import spark.implicits._
    val media = Multimodal.withSyntheticMedia((0L until 3L).toDF("id"), "id")
    val frames = Multimodal.sampleFrames(media, "id", stride = 4).collect()
    assert(frames.length === 12) // 3 docs × frames 0,4,8,12
    assert(frames.map(_.getInt(1)).toSet === Set(0, 4, 8, 12))
  }

  test("repartitionByMediaBytes sizes partitions by payload, not row count") {
    import spark.implicits._
    // 100 rows x 4096 B = 400 KiB; 64 KiB target => ceil(409600/65536) = 7
    val media = Multimodal.withSyntheticMedia((0L until 100L).toDF("id"), "id")
    val sized = Multimodal.repartitionByMediaBytes(media, targetBytesPerPartition = 64L << 10)
    assert(sized.rdd.getNumPartitions === 7)
    assert(sized.count() === 100)
    // a tiny corpus collapses to one partition regardless of row count
    val tiny = Multimodal.withSyntheticMedia((0L until 100L).toDF("id"), "id", nBytes = 8)
    assert(Multimodal.repartitionByMediaBytes(tiny).rdd.getNumPartitions === 1)
  }

  test("resize rewrites metadata contract") {
    import spark.implicits._
    val media = Multimodal.withSyntheticMedia((0L until 2L).toDF("id"), "id")
    val resized = Multimodal.resizeMeta(media, 32, 24)
    val m = resized.select($"media_meta.width", $"media_meta.height", $"media_meta.n_frames").head
    assert((m.getInt(0), m.getInt(1), m.getInt(2)) === ((32, 24, 16)))
  }
}
