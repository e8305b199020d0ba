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

  // ---- REAL codecs (JDK javax.imageio / javax.sound.sampled) -------------

  test("PNG round-trip is pixel-exact: encode → decode recovers every value") {
    val px = (x: Int, y: Int) => (11 * x + 29 * y + 5) % 256
    val bytes = Multimodal.encodeGrayPng(23, 17, px)
    val Some((w, h, got)) = Multimodal.decodeImage(bytes)
    assert((w, h) === ((23, 17)))
    for (y <- 0 until 17; x <- 0 until 23)
      assert(got(y * 23 + x) === px(x, y), s"pixel ($x,$y)")
  }

  test("JPEG decode: real lossy codec recovers dimensions and approximate content") {
    // encode a flat-gray JPEG through the JDK's own writer, decode it back:
    // dims exact, values within JPEG's loss on a flat field
    val img = new java.awt.image.BufferedImage(32, 24,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 24; x <- 0 until 32) img.getRaster.setSample(x, y, 0, 128)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val Some((w, h, got)) = Multimodal.decodeImage(bos.toByteArray)
    assert((w, h) === ((32, 24)))
    assert(got.forall(v => math.abs(v - 128) <= 4),
      "a flat 128 field must decode within JPEG tolerance")
  }

  test("animated GIF round-trip is frame- and pixel-exact") {
    val px = (f: Int, x: Int, y: Int) => (13 * f + 11 * x + 29 * y + 5) % 256
    val bytes = Multimodal.encodeGrayGif(9, 7, 5, px)
    val Some(frames) = Multimodal.decodeGifFrames(bytes)
    assert(frames.length === 5, "every frame must decode, in order")
    frames.zipWithIndex.foreach { case ((w, h, got), f) =>
      assert((w, h) === ((9, 7)))
      for (y <- 0 until 7; x <- 0 until 9)
        assert(got(y * 9 + x) === px(f, x, y), s"frame $f pixel ($x,$y)")
    }
    // a single-frame GIF decodes as one frame; PNG bytes are decodeImage's
    // job and junk is None — never a fake decode
    assert(Multimodal.decodeGifFrames(Multimodal.encodeGrayGif(4, 4, 1, (_, _, _) => 7))
      .exists(fs => fs.length == 1 && fs.head._3.forall(_ == 7)))
    assert(Multimodal.decodeGifFrames(Multimodal.encodeGrayPng(4, 4, (_, _) => 7)).isEmpty)
    assert(Multimodal.decodeGifFrames(Multimodal.syntheticBytes("junk", 512)).isEmpty)
    assert(Multimodal.decodeGifFrames(Array.empty).isEmpty)
    assert(Multimodal.decodeGifFrames(null).isEmpty)
  }

  test("undecodable bytes yield None, never a crash or a fake decode") {
    assert(Multimodal.decodeImage(Multimodal.syntheticBytes("junk", 512)).isEmpty)
    assert(Multimodal.decodeImage(Array.empty).isEmpty)
    assert(Multimodal.decodeImage(null).isEmpty)
    assert(Multimodal.decodeWav(Multimodal.syntheticBytes("junk", 512)).isEmpty)
    assert(Multimodal.decodeWav(Array.empty).isEmpty)
  }

  test("resizeImage: real payload rewrite — output is a decodable PNG at target dims, nearest-neighbor exact") {
    val px = (x: Int, y: Int) => (x * 16 + y) % 256
    val src = Multimodal.encodeGrayPng(16, 16, px)
    val Some(out) = Multimodal.resizeImage(src, 8, 8)
    val Some((w, h, got)) = Multimodal.decodeImage(out)
    assert((w, h) === ((8, 8)))
    // nearest-neighbor: output pixel (x,y) = source pixel (x*16/8, y*16/8)
    for (y <- 0 until 8; x <- 0 until 8)
      assert(got(y * 8 + x) === px(x * 2, y * 2), s"resized pixel ($x,$y)")
    assert(Multimodal.resizeImage(Array[Byte](1, 2, 3), 8, 8).isEmpty)
  }

  test("WAV round-trip is sample-exact: encode 16-bit PCM → decode recovers rate and every sample") {
    val samples = Array.tabulate(300)(i => ((i * 977) % 4096 - 2048).toShort)
    val wav = Multimodal.encodeWavPcm16(16000, samples)
    val Some((rate, got)) = Multimodal.decodeWav(wav)
    assert(rate === 16000)
    assert(got.toSeq === samples.toSeq)
  }

  test("real image feature extraction: decoded flag honest, features content-sensitive and deterministic") {
    import spark.implicits._
    val rows = (0L until 20L).map { id =>
      val bytes =
        if (id % 5 == 4) Multimodal.syntheticBytes(s"junk$id", 256) // undecodable
        else Multimodal.encodeGrayPng(16, 16, (x, y) => ((id * 37 + x * 3 + y) % 256).toInt)
      (id, bytes)
    }
    val df = rows.toDF("id", "media")
    val byId = Multimodal.extractImageFeatures(df, "id", dim = 16, batchSize = 4)
      .collect().map(r => r.getLong(0) -> ((r.getSeq[Float](1), r.getBoolean(2)))).toMap
    assert((0L until 20L).forall(id => byId(id)._1.length === 16))
    assert((0L until 20L).forall(id => byId(id)._2 === (id % 5 != 4)),
      "decoded flag must track exactly which payloads are real images")
    // content sensitivity: different images → different features
    assert(byId(0L)._1 !== byId(1L)._1)
    // determinism
    val again = Multimodal.extractImageFeatures(df, "id", dim = 16, batchSize = 4)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toMap
    assert((0L until 20L).forall(id => again(id) === byId(id)._1))
  }
}
