package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{ChunkOps, Orchestrator}
import graft.pipelines.Pipelines

class PipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("feature pipeline produces embedded chunks with stable schema") {
    val chunks = Pipelines.featurePipeline(Tables.documents(spark, dir), qualityThreshold = 0.0)
    val row = chunks.head
    assert(chunks.columns.toSet.contains("embedding"))
    assert(row.getAs[Seq[Float]]("embedding").length === 384)
    assert(chunks.filter(col("word_count") <= 0).count() === 0)
  }

  test("flagshipIvf reads the stored IVF index and tracks the brute-force flagship") {
    val brute = Pipelines.flagship(spark, dir).collect()
    val ivf = Pipelines.flagshipIvf(spark, dir).collect()
    assert(ivf.length === brute.length)
    // scores for chunks both paths return must be IDENTICAL — IVF only
    // restricts the candidate set, it never rescores
    val bruteScores = brute.map(r => r.getString(0) -> r.getDouble(2)).toMap
    val shared = ivf.filter(r => bruteScores.contains(r.getString(0)))
    shared.foreach(r => assert(r.getDouble(2) === bruteScores(r.getString(0)),
      s"shared hit ${r.getString(0)} rescored"))
    // probe-bounded recall: nprobe=4 of nlist=16 cells must still recover
    // most of the true top-10 on the fixture
    assert(shared.length >= 6,
      s"IVF top-10 overlaps brute-force top-10 on only ${shared.length}/10")
  }

  test("flagshipIvfPq probes PQ codes in the same cells and tracks the brute-force flagship") {
    val brute = Pipelines.flagship(spark, dir).collect()
    val ivfpq = Pipelines.flagshipIvfPq(spark, dir).collect()
    assert(ivfpq.length === brute.length)
    // the exact rerank means any chunk both paths return carries an
    // IDENTICAL score — quantization can only move the candidate boundary
    val bruteScores = brute.map(r => r.getString(0) -> r.getDouble(2)).toMap
    val shared = ivfpq.filter(r => bruteScores.contains(r.getString(0)))
    shared.foreach(r => assert(r.getDouble(2) === bruteScores(r.getString(0)),
      s"shared hit ${r.getString(0)} rescored"))
    assert(shared.length >= 9,
      s"IVFADC top-10 overlaps brute-force top-10 on only ${shared.length}/10")
    // and the ADC stage changes nothing the plain IVF probe wouldn't return
    // beyond its candidate bound: IVFADC hits are a subset of the probed
    // cells' chunks, so every hit must also score identically in flagshipIvf
    val ivf = Pipelines.flagshipIvf(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    ivfpq.filter(r => ivf.contains(r.getString(0))).foreach(r =>
      assert(r.getDouble(2) === ivf(r.getString(0))))
  }

  test("writeChunks round-trips partitioned+sorted parquet") {
    val out = Files.createTempDirectory("graft_chunks").toString
    val chunks = Pipelines.featurePipeline(Tables.documents(spark, dir), qualityThreshold = 0.0)
    Pipelines.writeChunks(chunks, s"$out/chunks", numPartitions = 4)
    val back = spark.read.parquet(s"$out/chunks")
    assert(back.count() === chunks.count())
    assert(back.columns.sorted === chunks.columns.sorted)
  }

  test("writeJsonBackup writes readable json with backup timestamp") {
    val out = Files.createTempDirectory("graft_json").toString
    Pipelines.writeJsonBackup(Tables.documents(spark, dir).limit(20), s"$out/backup")
    val back = spark.read.json(s"$out/backup")
    assert(back.count() === 20)
    assert(back.columns.contains("backed_up_at"))
  }

  test("remapForeignKeys rewrites mapped ids and keeps unmapped ones") {
    import spark.implicits._
    val chunks = Seq(("c1", 10L), ("c2", 11L), ("c3", 12L)).toDF("chunk_id", "document_id")
    val idMap  = Seq((10L, 100L), (11L, 110L)).toDF("old_id", "new_id")
    val out = Pipelines.remapForeignKeys(chunks, idMap)
      .orderBy("chunk_id").collect().map(_.getLong(1)).toSeq
    assert(out === Seq(100L, 110L, 12L))
  }

  test("documentWithChunks restores chunk order for one document") {
    val docs = Tables.documents(spark, dir)
    val chunks = ChunkOps.chunkFlat(docs).toDF()
    val got = Pipelines.documentWithChunks(docs.select(col("doc_id")), chunks, docId = 1L)
    val indexes = got.select("chunk_index").collect().map(_.getInt(0)).toSeq
    assert(indexes === indexes.sorted)
    assert(got.count() > 0)
  }

  test("upsertDocuments rejects duplicate update ids up front") {
    import spark.implicits._
    val target = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "source")
    val dupUpdates = Seq((1L, "x"), (1L, "y")).toDF("doc_id", "source")
    val e = intercept[IllegalArgumentException] {
      Pipelines.upsertDocuments(target, dupUpdates)
    }
    assert(e.getMessage.contains("duplicate"))
    // unique ids still work
    val ok = Pipelines.upsertDocuments(target,
      Seq((1L, "x")).toDF("doc_id", "source"),
      stamp = to_timestamp(lit("2026-01-01 00:00:00")))
    assert(ok.filter(col("doc_id") === 1L).head.getAs[String]("source") === "x")
  }

  test("upsertDocuments: both paths broadcast the small side, never sort-merge") {
    import spark.implicits._
    val target = Seq((1L, "a", "en"), (2L, "b", "de")).toDF("doc_id", "text", "lang")
    val updates = Seq((2L, "B2"), (9L, "new")).toDF("doc_id", "text")
    for (insertMissing <- Seq(false, true)) {
      val plan = Pipelines.upsertDocuments(target, updates,
          stamp = to_timestamp(lit("2026-01-01 00:00:00")), insertMissing = insertMissing)
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"insertMissing=$insertMissing must broadcast the updates side:\n$plan")
      assert(!plan.contains("SortMergeJoin"),
        s"insertMissing=$insertMissing fell back to a corpus shuffle:\n$plan")
    }
  }

  test("upsertDocuments insertMissing appends unmatched update rows (Mongo upsert=True)") {
    import spark.implicits._
    val target = Seq((1L, "a", "en"), (2L, "b", "de")).toDF("doc_id", "text", "lang")
    val updates = Seq((2L, "B2"), (9L, "new")).toDF("doc_id", "text")
    val rows = Pipelines.upsertDocuments(target, updates,
        stamp = to_timestamp(lit("2026-01-01 00:00:00")), insertMissing = true)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.get(3) != null)).toSeq
    // matched row $set + stamped; unmatched target untouched; the ghost id
    // inserted with null for the target-only lang column and the stamp
    assert(rows === Seq(
      (1L, "a", "en", false), (2L, "B2", "de", true), (9L, "new", null, true)))
  }

  test("bucketed chunk table joins without a shuffle exchange") {
    val chunks = Pipelines.featurePipeline(Tables.documents(spark, dir), qualityThreshold = 0.0)
      .select("chunk_id", "document_id", "chunk_index", "word_count")
    Pipelines.writeBucketedChunks(chunks, "graft_chunks_bucketed", buckets = 4)
    val t = spark.table("graft_chunks_bucketed")
    val joined = t.as("a").join(t.as("b"), "document_id")
      .groupBy(col("document_id")).count()
    val plan = joined.queryExecution.executedPlan.toString
    // both sides read co-located buckets: no ShuffleExchange below the join
    assert(!plan.contains("Exchange hashpartitioning(document_id"))
    assert(joined.count() > 0)
    spark.sql("DROP TABLE graft_chunks_bucketed")
  }

  test("batched bucketize ≡ monolithic bucketed write (rows, layout, no-shuffle join)") {
    import spark.implicits._
    val chunks = Pipelines.featurePipeline(Tables.documents(spark, dir), qualityThreshold = 0.0)
      .select("chunk_id", "document_id", "chunk_index", "word_count")
    Pipelines.writeBucketedChunks(chunks, "graft_cb_mono", buckets = 4)
    Pipelines.writeBucketedChunksBatched(chunks, "graft_cb_sliced", buckets = 4, slices = 2)
    def snap(t: String) = spark.table(t)
      .select($"chunk_id", $"document_id", $"chunk_index")
      .collect().map(_.toSeq).toSet
    assert(snap("graft_cb_sliced") === snap("graft_cb_mono"))
    // layout: same bucket count, one file per non-empty bucket — a bucket is
    // never split across passes (slices divides buckets ⇒ whole-bucket slices)
    def files(t: String) = {
      val loc = spark.sql(s"DESCRIBE TABLE EXTENDED $t").filter($"col_name" === "Location")
        .select("data_type").head.getString(0).stripPrefix("file:")
      new java.io.File(loc).listFiles().filter(_.getName.endsWith(".parquet"))
        .map(_.getName).sorted.toSeq
    }
    assert(files("graft_cb_sliced").size === files("graft_cb_mono").size,
      "sliced build must land the same one-file-per-bucket layout")
    // the bucketed-join guarantee survives the sliced build
    val t = spark.table("graft_cb_sliced")
    val joined = t.as("a").join(t.as("b"), "document_id").groupBy(col("document_id")).count()
    assert(!joined.queryExecution.executedPlan.toString
      .contains("Exchange hashpartitioning(document_id"))
    assert(joined.count() > 0)
    // a slice count that would split buckets is rejected loudly
    val err = intercept[IllegalArgumentException] {
      Pipelines.writeBucketedChunksBatched(chunks, "graft_cb_bad", buckets = 4, slices = 3)
    }
    assert(err.getMessage.contains("divide"))
    spark.sql("DROP TABLE graft_cb_mono"); spark.sql("DROP TABLE graft_cb_sliced")
  }

  test("orchestrator selects strategies by intent") {
    assert(Orchestrator.queryIntent("how to implement the api") === "technical")
    assert(Orchestrator.selectStrategies("technical").map(_.name) ===
      Seq("similarity", "parent_child"))
    assert(Orchestrator.selectStrategies("problem-solving").map(_.name) ===
      Seq("similarity"))
    assert(Orchestrator.selectStrategies("general", parentChildEnabled = false).map(_.name) ===
      Seq("similarity"))
  }

  test("orchestrated search returns fused, diverse, ranked results") {
    import graft.operators.Embedder
    val docs = Tables.documents(spark, dir)
    val flat = Pipelines.featurePipeline(docs, qualityThreshold = 0.0)
    val children = Embedder.withEmbeddings(
      ChunkOps.chunkHierarchy(docs).toDF().filter(col("chunk_type") === "child"),
      "content", "embedding")
    val out = Orchestrator.search(spark, flat, children, "explain the concept of a sort merge join")
    val rows = out.collect()
    assert(rows.nonEmpty && rows.length <= 10)
    // scores descending
    val scores = rows.map(_.getAs[Double]("score")).toSeq
    assert(scores === scores.sortBy(-_))
    // parent_child strategy engaged for a conceptual query
    assert(rows.exists(_.getAs[String]("strategies").contains("similarity")))
  }

  test("orchestrated search with hybrid enabled engages the hybrid strategy") {
    import graft.operators.Embedder
    val docs = Tables.documents(spark, dir)
    val flat = Pipelines.featurePipeline(docs, qualityThreshold = 0.0)
    val children = Embedder.withEmbeddings(
      ChunkOps.chunkHierarchy(docs).toDF().filter(col("chunk_type") === "child"),
      "content", "embedding")
    val out = Orchestrator.search(spark, flat, children, "spark join vector",
      hybridEnabled = true)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.exists(_.getAs[String]("strategies").contains("hybrid")))
  }

  test("flagshipIvfBatch answers a query queue row-for-row like serial flagshipIvf") {
    val texts = Seq("spark join vector query", "document quality score",
      "token budget packing")
    def key(r: org.apache.spark.sql.Row, from: Int) =
      (r.getString(from), r.getLong(from + 1), r.getDouble(from + 2),
        r.getString(from + 3), r.getString(from + 4), r.getInt(from + 5))
    val batch = Pipelines.flagshipIvfBatch(spark, dir, texts)
      .collect().groupBy(_.getString(0))
    assert(batch.keySet === texts.toSet)
    texts.foreach { t =>
      val serial = Pipelines.flagshipIvf(spark, dir, queryText = t)
        .collect().map(key(_, 0)).toSeq
      val got = batch(t).map(key(_, 1)).toSeq
      assert(got === serial, s"batch rows for '$t' must equal the serial flagship")
    }
    // duplicate texts would collapse result keys — rejected up front
    intercept[IllegalArgumentException](
      Pipelines.flagshipIvfBatch(spark, dir, Seq("a", "a")))
  }

  test("flagshipIvfPqBatch answers a query queue row-for-row like serial flagshipIvfPq") {
    val texts = Seq("spark join vector query", "document quality score",
      "token budget packing")
    def key(r: org.apache.spark.sql.Row, from: Int) =
      (r.getString(from), r.getLong(from + 1), r.getDouble(from + 2),
        r.getString(from + 3), r.getString(from + 4), r.getInt(from + 5))
    val batch = Pipelines.flagshipIvfPqBatch(spark, dir, texts)
      .collect().groupBy(_.getString(0))
    assert(batch.keySet === texts.toSet)
    texts.foreach { t =>
      val serial = Pipelines.flagshipIvfPq(spark, dir, queryText = t)
        .collect().map(key(_, 0)).toSeq
      val got = batch(t).map(key(_, 1)).toSeq
      assert(got === serial, s"ADC batch rows for '$t' must equal the serial flagshipIvfPq")
    }
    intercept[IllegalArgumentException](
      Pipelines.flagshipIvfPqBatch(spark, dir, Seq("a", "a")))
  }

  test("curation-aware serving: an ingest-flagged near-duplicate is excluded by preFilter, not a rewrite") {
    import spark.implicits._
    val nlist = 21 // isolated store/centroid tables
    Seq(TableStore.tableName(s"ivfchunks$nlist", dir),
        TableStore.tableName(s"ivfchunkcent$nlist", dir),
        graft.DocLifecycle.docCellsName(dir, nlist))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    IvfCatalog.assignedChunks(spark, dir, nlist).count()
    def mk(word: String): String =
      (1 to 4).map(i => s"The $word curator loop serves micro batch $i through the " +
        "pruned cells and reads survivors from the partitioned store.").mkString(" ")
    // docY is a near-copy of docX: admitted (identity dedup only), its
    // chunk stamped near_dup_of by the ingest loop
    graft.streaming.StreamingIngest.ingestDocBatch(
      Seq((920001L, mk("aurora"))).toDF("doc_id", "text"), dir, nlist)
    graft.streaming.StreamingIngest.ingestDocBatch(
      Seq((920002L, mk("aurins"))).toDF("doc_id", "text"), dir, nlist)
    val dupIds = IvfCatalog.assignedChunks(spark, dir, nlist)
      .filter(col("near_dup_of").isNotNull)
      .select("chunk_id").collect().map(_.getString(0)).toSet
    assert(dupIds.nonEmpty, "the near-copy's chunk must carry near_dup_of")

    val q = mk("aurins") // the flagged chunk is the nearest hit by construction
    val unfiltered = Pipelines.flagshipIvf(spark, dir, q, nlist = nlist, nprobe = nlist)
      .select("chunk_id").collect().map(_.getString(0)).toSet
    assert(dupIds.exists(unfiltered.contains),
      "without the filter the flagged chunk serves — the flag is advisory")
    val filtered = Pipelines.flagshipIvf(spark, dir, q, nlist = nlist, nprobe = nlist,
        preFilter = Some(col("near_dup_of").isNull))
      .select("chunk_id").collect().map(_.getString(0)).toSet
    assert(filtered.nonEmpty && dupIds.forall(!filtered.contains(_)),
      "near_dup_of IS NULL keeps flagged chunks out of answers, no store rewrite")
    // the queue form filters the same shared scan
    val fb = Pipelines.flagshipIvfBatch(spark, dir, Seq(q), nlist = nlist, nprobe = nlist,
        preFilter = Some(col("near_dup_of").isNull))
      .select("chunk_id").collect().map(_.getString(0)).toSet
    assert(fb === filtered, "batch filtered flagship ≡ serial filtered flagship")
  }
}
