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
  * bytes.
  *
  * CODECS: image (PNG/JPEG/BMP/GIF via `javax.imageio`) and audio (WAV/PCM
  * via `javax.sound.sampled`) are REAL — both ship inside the JDK, no
  * external library — so [[decodeImage]]/[[decodeWav]]/[[resizeImage]] do
  * genuine byte-level decode/re-encode, oracle-checked end to end by the
  * `mm_image_roundtrip`/`mm_audio_roundtrip` queries (DuckDB recomputes the
  * synthesized pixel/sample sums in closed form; PNG and PCM are lossless,
  * so the sums match exactly). VIDEO frame decode is real too via the JDK's
  * multi-frame GIF reader ([[encodeGrayGif]]/[[decodeGifFrames]], the
  * `mm_video_frames` oracle row); true container formats (mp4/webm) have
  * no JDK codec and keep the labeled [[decodeStub]], kept also for the
  * batch plumbing and as the undecodable-payload fallback, always
  * flagged. */
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

  // ------------------------------------------------------------------ image
  // Real image codec: the JDK's javax.imageio (PNG/JPEG/BMP/GIF readers and
  // PNG/JPEG/BMP writers are part of java.desktop — zero external deps).

  /** Encode a grayscale PNG from a pixel function — the deterministic
    * fixture/test generator AND the write half of [[resizeImage]]. PNG is
    * lossless: every pixel round-trips exactly through [[decodeImage]]. */
  def encodeGrayPng(width: Int, height: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { raster.setSample(x, y, 0, pixel(x, y) & 0xff); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL image decode: (width, height, grayscale pixels 0..255, row-major).
    * Grayscale payloads read their single raster band exactly (lossless for
    * PNG/BMP); color payloads reduce via integer luminance (r+g+b)/3. None
    * for bytes no ImageIO reader accepts — callers flag, never crash. */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] =
    try {
      if (bytes == null || bytes.isEmpty) return None
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) return None
      val (w, h) = (img.getWidth, img.getHeight)
      val px = new Array[Int](w * h)
      if (img.getRaster.getNumBands == 1) {
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { px(y * w + x) = raster.getSample(x, y, 0); x += 1 }
          y += 1
        }
      } else {
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            px(y * w + x) = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
            x += 1
          }
          y += 1
        }
      }
      Some((w, h, px))
    } catch { case scala.util.control.NonFatal(_) => None }

  // ------------------------------------------------------------------ video
  // Real multi-frame decode via the JDK's GIF reader/writer (javax.imageio
  // reads every frame of an animated GIF) — the same zero-dep move that made
  // image/audio real. True container formats (mp4/webm) still have no JDK
  // codec and keep the labeled [[decodeStub]].

  /** Encode an animated grayscale GIF from a per-frame pixel function —
    * the fixture generator and write half of the video round-trip. Each
    * frame is written as a FULL image (no inter-frame disposal deltas), and
    * a 256-level gray palette is exact for 8-bit gray pixels, so every
    * frame round-trips losslessly through [[decodeGifFrames]]. */
  def encodeGrayGif(width: Int, height: Int, nFrames: Int,
                    pixel: (Int, Int, Int) => Int): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val out = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(out)
      writer.prepareWriteSequence(null)
      // interlace OFF: the JDK writer interlaces by default and its
      // interlace row accounting drops the last row at heights ≤ 4
      // (observed: a 4-row frame decodes rows 0-2 + a zero row 3, same
      // bytes from the still-image path) — progressive mode is the
      // interlace switch on the GIF write param
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
      // an EXPLICIT full 256-entry gray palette: handing the writer a
      // TYPE_BYTE_GRAY image lets it derive a minimal palette, and its LZW
      // path corrupts tiny constant-color frames (observed: stray 0 pixels
      // in a 4×4 all-7 frame); with the indexed model every 8-bit gray is
      // a palette identity and every frame round-trips exactly
      val grays = Array.tabulate(256)(_.toByte)
      val palette = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
      var f = 0
      while (f < nFrames) {
        val img = new java.awt.image.BufferedImage(
          width, height, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, palette)
        val raster = img.getRaster
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) { raster.setSample(x, y, 0, pixel(f, x, y) & 0xff); x += 1 }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), param)
        f += 1
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); out.close() }
    bos.toByteArray
  }

  /** REAL multi-frame decode: every frame of a GIF payload as
    * (width, height, grayscale pixels), in frame order — the video half of
    * the codec surface. Same luminance reduction as [[decodeImage]] for
    * palette/color frames. None for bytes the GIF reader rejects (including
    * other image formats — a single-frame PNG is [[decodeImage]]'s job);
    * never a fake decode. */
  def decodeGifFrames(bytes: Array[Byte]): Option[Seq[(Int, Int, Array[Int])]] =
    try {
      if (bytes == null || bytes.isEmpty) return None
      // the stream must be closed on EVERY path, including the non-GIF
      // dispatch returns below — ImageIO's default cache backs the stream
      // with a temp file + open fd, and the non-GIF path is the normal
      // route for a mixed media sweep (one leaked fd per PNG/JPEG row
      // would exhaust an executor's descriptors)
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      var reader: javax.imageio.ImageReader = null
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext) return None
        reader = readers.next()
        if (!reader.getFormatName.equalsIgnoreCase("gif")) return None
        reader.setInput(in, false, false)
        val n = reader.getNumImages(true)
        if (n <= 0) return None
        Some((0 until n).map { f =>
          val img = reader.read(f)
          val (w, h) = (img.getWidth, img.getHeight)
          val px = new Array[Int](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              px(y * w + x) = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
              x += 1
            }
            y += 1
          }
          (w, h, px)
        })
      } finally {
        if (reader != null) reader.dispose()
        in.close()
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** REAL payload resize: decode → nearest-neighbor rescale (deterministic
    * integer pixel selection, no resampling arithmetic to drift across
    * JVMs) → re-encode as grayscale PNG. None when the payload doesn't
    * decode. [[resizeMeta]] remains the metadata half. */
  def resizeImage(bytes: Array[Byte], width: Int, height: Int): Option[Array[Byte]] =
    decodeImage(bytes).map { case (w, h, px) =>
      encodeGrayPng(width, height, (x, y) => {
        val sx = math.min(w - 1, x.toLong * w / width).toInt
        val sy = math.min(h - 1, y.toLong * h / height).toInt
        px(sy * w + sx)
      })
    }

  /** REAL image features: decode, area-average onto a √dim×√dim grid of
    * mean intensities, normalize to [0,1] — the classic aHash-style
    * fingerprint, and the honest swap-in for [[decodeStub]] wherever the
    * payload is a real image. None when undecodable. */
  def imageFeatures(bytes: Array[Byte], dim: Int): Option[Array[Float]] =
    decodeImage(bytes).map { case (w, h, px) =>
      val g = math.max(1, math.sqrt(dim.toDouble).toInt)
      // a non-square dim would leave dim - g*g trailing slots silently 0.0
      // — dead dimensions that distort cosine against other feature
      // sources — so the grid must fill the vector exactly
      require(g * g == dim,
        s"imageFeatures dim must be a perfect square (got $dim); default 64 = 8x8 grid")
      val out = new Array[Float](dim)
      var gy = 0
      while (gy < g) {
        var gx = 0
        while (gx < g) {
          val (x0, x1) = (gx * w / g, math.max(gx * w / g + 1, (gx + 1) * w / g))
          val (y0, y1) = (gy * h / g, math.max(gy * h / g + 1, (gy + 1) * h / g))
          var sum = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) { sum += px(y * w + x); x += 1 }
            y += 1
          }
          out(gy * g + gx) = (sum.toDouble / ((x1 - x0).toLong * (y1 - y0)) / 255.0).toFloat
          gx += 1
        }
        gy += 1
      }
      out
    }

  // ------------------------------------------------------------------ audio
  // Real audio codec: the JDK's javax.sound.sampled reads/writes WAV (PCM).

  /** Encode 16-bit mono PCM samples as a WAV payload (lossless). */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val data = java.nio.ByteBuffer.allocate(samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    samples.foreach(data.putShort)
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data.array()), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL audio decode: (sampleRate, 16-bit mono samples). None for bytes
    * the JDK's WAV reader rejects or non-16-bit payloads. */
  def decodeWav(bytes: Array[Byte]): Option[(Int, Array[Short])] =
    try {
      if (bytes == null || bytes.isEmpty) return None
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      // encoding must be checked too: 16-bit mono PCM_UNSIGNED (or an
      // A-law/mu-law stream expanded to 16 bits) would pass the size and
      // channel guards and decode MISINTERPRETED samples — the contract is
      // None, never a fake decode
      if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
          fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) return None
      val raw = ais.readAllBytes()
      val buf = java.nio.ByteBuffer.wrap(raw).order(
        if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
        else java.nio.ByteOrder.LITTLE_ENDIAN)
      val out = new Array[Short](raw.length / 2)
      var i = 0
      while (i < out.length) { out(i) = buf.getShort(); i += 1 }
      Some((fmt.getSampleRate.toInt, out))
    } catch { case scala.util.control.NonFatal(_) => None }

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

  /** [[extractFeatures]] with the REAL image codec: same per-partition
    * batch shape, features from [[imageFeatures]] when the payload decodes,
    * [[decodeStub]] otherwise — with an honest `decoded` flag so an
    * undecodable payload can never masquerade as a decoded one. */
  def extractImageFeatures(df: DataFrame, idCol: String, dim: Int = 64,
                           batchSize: Int = 32): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val out = df.select(col(idCol).cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            imageFeatures(bytes, dim) match {
              case Some(f) => (id, f, true)
              case None    => (id, decodeStub(bytes, dim), false)
            }
          }
        }
      }
    out.toDF(idCol, "features", "decoded")
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
