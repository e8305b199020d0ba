package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deterministic fixture upsampler for the measured scale curve (SCALE.md):
  * derives an N×-sized corpus from an existing fixture directory so the
  * bucketed dedup/ANN/text paths can be timed at 10× data without touching
  * the read-only driver fixtures.
  *
  * Shape-preserving by construction: replica 0 is the source rows verbatim;
  * replicas 1..N-1 re-key every id (per-table stride) and mutate content
  * deterministically (splitmix64 keyed by (id, replica, position) — no RNG
  * state, so any row is reproducible in isolation):
  *
  *  - documents: ~2% of replicas are PLANTED near-duplicates (2% of words
  *    replaced → 3-gram Jaccard ≈ 0.89, above the 0.8 production bar); the
  *    rest replace 35% of words (Jaccard ≈ 0.15, genuinely distinct), with
  *    replacements drawn from the corpus' own 20k most frequent tokens so
  *    the vocabulary/df distribution the LSH + BM25 paths key on survives.
  *  - embeddings: planted 2% get low-noise perturbation (cos ≈ 0.999 to
  *    the original), the rest high-noise (cos ≈ 0.84, below the 0.9 ANN
  *    bar; two high-noise replicas of the same base sit near 0.70).
  *  - events: ids/users re-keyed per replica (same per-user session
  *    structure, N× users); ts written back as INT64 nanos, the fixture's
  *    own storage shape, so `Tables.events` reads both dirs identically.
  *
  * Usage: `sbt "runMain graft.ScaleGen [srcDir outDir factor]"` — defaults
  * sf0.1 → /tmp/graft_sf1 ×10.
  */
object ScaleGen {

  /** splitmix64 finalizer — the whole determinism story hangs off this. */
  def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  def mix3(a: Long, b: Long, c: Long): Long = mix(mix(mix(a) ^ b) ^ c)

  /** Uniform in [0,1) from a hash. */
  private def unit(h: Long): Double =
    java.lang.Long.remainderUnsigned(h, 1L << 40).toDouble / (1L << 40).toDouble

  /** Hex token unique to (doc, replica, position) — the survivor-mode
    * filler: a k-gram window containing one can never repeat across
    * replicas (64-bit keyed hash; a full 5-token window collision needs
    * 5 consecutive matches), so filler regions are never span-flagged. */
  def fillerTok(docId: Long, rep: Int, i: Int): String =
    java.lang.Long.toHexString(
      mix3(docId, rep.toLong << 32 | (i & 0xffffffffL), 0xF177E4L))

  /** Survivor-mode replica classifier: a `dupFrac` fraction of mutated
    * replicas carry a duplicated region (scrub fodder); the rest are
    * clean. Pure hash of (doc, replica) — reproducible anywhere, which
    * is what lets the curation bench compute its survivor expectation
    * exactly. */
  def dupReplica(docId: Long, rep: Int, dupFrac: Double): Boolean =
    unit(mix3(docId, rep, 0xD0BL)) < dupFrac

  val PlantedPct = 2 // % of mutated replicas that are near-duplicates

  def plantedDoc(docId: Long, rep: Int): Boolean =
    java.lang.Long.remainderUnsigned(mix3(docId, rep, 0xD0C), 100) < PlantedPct

  def plantedVec(vecId: Long, rep: Int): Boolean =
    java.lang.Long.remainderUnsigned(mix3(vecId, rep, 0xEC7), 100) < PlantedPct

  /** Word-level deterministic mutation; rate = fraction replaced. */
  def mutateText(text: String, docId: Long, rep: Int, rate: Double,
                 vocab: Array[String]): String = {
    val parts = text.split(" ", -1)
    var i = 0
    while (i < parts.length) {
      val h = mix3(docId, rep.toLong << 32 | (i & 0xffffffffL), 0x7E57)
      if (unit(h) < rate)
        parts(i) = vocab(java.lang.Long.remainderUnsigned(mix(h), vocab.length).toInt)
      i += 1
    }
    parts.mkString(" ")
  }

  /** SURVIVOR-MODE mutation (the round-19 fixture knob): the default ×N
    * upsample makes every replica a near-copy of its base, so a span
    * scrub over the upsampled corpus CORRECTLY annihilates it — every
    * document wall-to-wall duplicated, zero curation survivors, and the
    * chain's most interesting regime (PARTIAL scrub survival) untestable
    * at scale. This mode makes duplication partial and knob-tracked:
    *
    *  - a `dupFrac` fraction of replicas ([[dupReplica]]) keep one
    *    CONTIGUOUS `keepFrac` run of their source tokens — those windows
    *    duplicate the base (verbatim in the corpus as replica 0) and get
    *    flagged and scrubbed — and replace everything outside the run
    *    with replica-unique filler ([[fillerTok]], never flagged): the
    *    scrub leaves a partial remnant of ~(1−keepFrac)·n tokens;
    *  - the rest replace every 4th token with filler: the fixture corpus
    *    is one-token-per-part (no punctuation), so no 5-token window
    *    survives intact (max unchanged run = 3 < k) and none shares an
    *    8-gram with a decontamination eval side — never flagged, and the
    *    text scores EXACTLY like its base under the quality gate (every
    *    count the score reads — word count, structure matches, sentence
    *    split — is preserved by in-place single-token substitution).
    *
    * Deterministic like everything here: any row reproducible from
    * (docId, rep) alone. */
  def mutateTextSurvivor(text: String, docId: Long, rep: Int,
                         dupFrac: Double, keepFrac: Double = 0.7): String = {
    val parts = text.split(" ", -1)
    val n = parts.length
    if (dupReplica(docId, rep, dupFrac)) {
      val keep = math.max(1, (n * keepFrac).toInt)
      val off =
        if (n - keep <= 0) 0
        else java.lang.Long.remainderUnsigned(
          mix3(docId, rep, 0x0FF5E7L), (n - keep + 1).toLong).toInt
      var i = 0
      while (i < n) {
        if (i < off || i >= off + keep) parts(i) = fillerTok(docId, rep, i)
        i += 1
      }
    } else {
      var i = 0
      while (i < n) { parts(i) = fillerTok(docId, rep, i); i += 4 }
    }
    parts.mkString(" ")
  }

  /** Per-dim triangular noise (≈ gaussian, sd ≈ 0.41·eps·rms(v), so the
    * noise VECTOR norm ≈ 0.41·eps·‖v‖): planted replicas stay within
    * cos ≈ 0.999 of the base, the rest land ≈ 0.84 — below the 0.9 ANN bar,
    * with two high-noise replicas of the same base near 0.70. */
  def perturbVec(vec: Array[Float], vecId: Long, rep: Int, eps: Double): Array[Float] = {
    val n = vec.length
    var norm2 = 0.0
    var i = 0
    while (i < n) { norm2 += vec(i).toDouble * vec(i); i += 1 }
    val scale = eps * math.sqrt(norm2 / math.max(n, 1))
    val out = new Array[Float](n)
    i = 0
    while (i < n) {
      val u1 = unit(mix3(vecId, rep.toLong << 32 | (i & 0xffffffffL), 0xA1)) - 0.5
      val u2 = unit(mix3(vecId, rep.toLong << 32 | (i & 0xffffffffL), 0xA2)) - 0.5
      out(i) = (vec(i) + scale * (u1 + u2)).toFloat
      i += 1
    }
    out
  }

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft_sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val reps = spark.range(factor).select($"id".cast("int").as("rep"))

    // ------------------------------------------------------------ documents
    val docs = Tables.documents(spark, src)
    val docStride = docs.agg(max($"doc_id")).head.getLong(0) + 1
    val vocab = docs
      .select(explode(operators.TextSearch.tokens($"text")).as("w"))
      .groupBy($"w").count()
      .orderBy($"count".desc, $"w".asc).limit(20000)
      .collect().map(_.getString(0))
    val vocabB = spark.sparkContext.broadcast(vocab)
    val mutateUdf = udf { (text: String, docId: Long, rep: Int) =>
      if (rep == 0) text
      else {
        val rate = if (plantedDoc(docId, rep)) 0.02 else 0.35
        mutateText(text, docId, rep, rate, vocabB.value)
      }
    }
    docs.crossJoin(reps)
      .withColumn("text", mutateUdf($"text", $"doc_id", $"rep"))
      .select(($"doc_id" + $"rep".cast("long") * docStride).as("doc_id"),
        $"text", $"lang", $"source", length($"text").cast("long").as("n_chars"))
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    // ----------------------------------------------------------- embeddings
    val emb = Tables.embeddings(spark, src)
    val vecStride = emb.agg(max($"vec_id")).head.getLong(0) + 1
    val perturbUdf = udf { (vec: Seq[Float], vecId: Long, rep: Int) =>
      if (rep == 0) vec
      else {
        val eps = if (plantedVec(vecId, rep)) 0.1 else 1.6
        perturbVec(vec.toArray, vecId, rep, eps).toSeq
      }
    }
    emb.crossJoin(reps)
      .select(($"vec_id" + $"rep".cast("long") * vecStride).as("vec_id"),
        perturbUdf($"embedding", $"vec_id", $"rep").as("embedding"), $"label")
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    // --------------------------------------------------------------- events
    val ev = Tables.events(spark, src)
    val evStride = ev.agg(max($"event_id")).head.getLong(0) + 1
    val userStride = ev.agg(max($"user_id")).head.getLong(0) + 1
    ev.crossJoin(reps)
      .select(($"event_id" + $"rep".cast("long") * evStride).as("event_id"),
        (unix_micros($"ts") * 1000L).as("ts"), // INT64 nanos — fixture shape
        ($"user_id" + $"rep".cast("long") * userStride).as("user_id"),
        $"event_type", $"value", $"props")
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$out/events.parquet")

    val nd = spark.read.parquet(s"$out/documents.parquet").count()
    val nv = spark.read.parquet(s"$out/embeddings.parquet").count()
    val ne = spark.read.parquet(s"$out/events.parquet").count()
    println(s"[scalegen] $out: documents=$nd embeddings=$nv events=$ne (×$factor of $src)")
    spark.stop()
  }
}
