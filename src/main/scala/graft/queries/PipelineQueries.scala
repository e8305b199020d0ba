package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Multimodal
import graft.pipelines.Pipelines

/** End-to-end pipeline + multimodal plumbing queries. Oracle-checked since
  * round 19: the chunk family (DuckSql.chunkCtes replays the recursive
  * splitter — pipe_sql_chunks / pipe_chunk_stats / pipe_doc_chunks /
  * pipe_hierarchy_rel), the embedding layer (DuckSql.embedCtes —
  * MurmurHash3 replayed in SQL; float32 is EXACT here because bucket
  * accumulation is ±1 integer counts and the only rounding is the final
  * normalize cast, replayed verbatim), and the brute-force flagship
  * composed from both. Still rows-only, each for a stated reason:
  * pipe_flagship_ivf/ivfpq/pqbatch (recall is probe- and
  * candidate-bounded by the STORED index — GoldenSpec digests +
  * PipelineSpec overlap-vs-brute pins), mm_feature_stats (the codec
  * stub's float32 accumulates fractional byte/255 terms — genuinely
  * order-rounded — and DuckDB 1.0 has no md5(BLOB) to replay the
  * synthetic payload chain anyway), and pipe_orchestrator (driver-side
  * sequential MMR). */
object PipelineQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ETL pipeline status/wordcount rollup (oracle-checked).
    "pipe_etl_status" -> ((s, dir) => {
      import s.implicits._
      Pipelines.etlPipeline(Tables.documents(s, dir))
        .groupBy($"processing_status")
        .agg(count(lit(1)).as("n_docs"),
             sum($"word_count".cast("long")).as("total_words"),
             round(sum(round($"quality_score", 6).cast("decimal(38,6)")).cast("double"), 6)
               .as("total_quality"))
    }),

    // Feature pipeline output shape: chunks per document (oracle-checked —
    // the chunkCtes replay over the cleaned text; splitter semantics also
    // covered by ChunkerSpec). Reads the stored chunk table (ChunkCatalog)
    // — the reference's chunks collection.
    "pipe_chunk_stats" -> ((s, dir) => {
      import s.implicits._
      graft.ChunkCatalog.flatChunks(s, dir)
        .groupBy($"document_id")
        .agg(count(lit(1)).as("n_chunks"),
             sum($"word_count".cast("long")).as("total_words"),
             max(size($"embedding")).as("embedding_dim"))
    }),

    // §7.3 flagship slice as a registered query. Oracle-checked since
    // round 19: the DuckDB replay recomputes the WHOLE pipeline — clean →
    // chunk (chunkCtes) → hashing embeddings (embedCtes: MurmurHash3 in
    // SQL, integer bucket counts, the float32 normalize rounding replayed
    // verbatim) → Atlas-scored cosine top-10 with the raw-score/id
    // tie-break → attribution join.
    "pipe_flagship" -> ((s, dir) => Pipelines.flagship(s, dir)),

    // The embedding layer pinned directly: every nonzero component of the
    // stored chunk embeddings for a fixture subset, compared bit-for-bit
    // against the SQL replay (float32 is exact here: ±1 integer bucket
    // sums, then ONE rounding at the final normalize cast — see
    // DuckSql.embedCtes).
    "emb_vectors" -> ((s, dir) => {
      import s.implicits._
      graft.ChunkCatalog.flatChunks(s, dir)
        .filter($"document_id" % 25 === 0)
        .select($"chunk_id", posexplode($"embedding"))
        .toDF("chunk_id", "dim", "val")
        .filter($"val" =!= 0.0f)
    }),

    // The flagship with retrieval through the stored IVF chunk index
    // (IvfCatalog.assignedChunks): partition-pruned probe instead of a
    // brute-force scan of the chunk store — the reference's own headline
    // query (vector_search.py:61-95) running against the index the engine
    // builds. Rows-only in the driver gate (IVF recall is probe-dependent);
    // GoldenSpec pins the digest, PipelineSpec pins overlap vs brute force,
    // PlanSpec asserts the partition pruning.
    "pipe_flagship_ivf" -> ((s, dir) => Pipelines.flagshipIvf(s, dir)),

    // The flagship through the stored IVFADC index (IvfPqCatalog): same
    // partition pruning as pipe_flagship_ivf, but the probed cells scan as
    // m-byte PQ codes (32× fewer bytes) with an exact rerank over a pruned
    // raw read — the 100 TB serving form. Rows-only in the driver gate
    // (recall is probe- and candidate-bounded); GoldenSpec pins the digest,
    // PipelineSpec pins overlap vs the brute flagship.
    "pipe_flagship_ivfpq" -> ((s, dir) => Pipelines.flagshipIvfPq(s, dir)),

    // The deployed serving shape: the SAME compressed flagship for a QUEUE
    // of queries — one shared pruned code scan, one candidate-bounded
    // rerank read, one attribution join for all of them (what
    // startQueries serves per micro-batch at pqM > 0). Rows-only in the
    // driver gate; GoldenSpec pins the digest, PipelineSpec pins per-query
    // rows ≡ serial flagshipIvfPq, PlanSpec pins the Q-invariant
    // three-shared-scan plan.
    "pipe_flagship_pqbatch" -> ((s, dir) => Pipelines.flagshipIvfPqBatch(s, dir,
      Seq("spark join vector query", "partitioned parquet scan",
        "document quality score"))),

    // §7.4 SQL surface end-to-end: the chunker as a Catalyst Generator via
    // LATERAL VIEW — a user who never leaves spark.sql chunks the corpus
    // with the SAME kernel as the typed path (oracle-checked against the
    // chunkCtes replay over the raw text; GoldenSpec pins the values,
    // ExpressionSpec pins row-for-row parity with ChunkOps.chunkFlat).
    // chunk_id is the md5 over the chunk's unstripped text, so the oracle
    // and digest cover content bytes without hauling the content column.
    "pipe_sql_chunks" -> ((s, dir) => {
      graft.expressions.GraftExtensions.register(s)
      Tables.documents(s, dir).createOrReplaceTempView("graft_sql_docs")
      s.sql("""SELECT d.doc_id, c.chunk_id, c.chunk_index, c.word_count,
                      c.start_char, c.end_char
               FROM graft_sql_docs d
               LATERAL VIEW graft_chunk(d.doc_id, d.text) c""")
    }),

    // S6/J2/T3: a document with its chunks in index order (oracle-checked).
    // Bucketed chunk table ⋈ documents — shuffle-free on the chunk side.
    "pipe_doc_chunks" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val chunks = graft.ChunkCatalog.flatChunks(s, dir)
      Pipelines.documentWithChunks(docs.select($"doc_id", $"lang"), chunks, docId = 22L)
        .select($"document_id", $"chunk_id", $"chunk_index", $"word_count", $"lang")
    }),

    // C3: parent→children relationship map over the hierarchy
    // (oracle-checked — both hierarchy levels replayed by chunkCtes).
    "pipe_hierarchy_rel" -> ((s, dir) => {
      import graft.operators.ChunkOps
      ChunkOps.parentChildRelationships(graft.ChunkCatalog.hierarchyChunks(s, dir))
    }),

    // §3.1 orchestrated multi-strategy search over the STORED chunk tables
    // (rows-only) — retrieval reads the chunk store, it does not re-run the
    // feature pipeline per query (rag_pipeline.py:190-236).
    "pipe_orchestrator" -> ((s, dir) => {
      import graft.operators.Orchestrator
      Orchestrator.search(s,
        graft.ChunkCatalog.flatChunks(s, dir),
        graft.ChunkCatalog.childChunks(s, dir),
        "explain how to merge sort a table")
    }),

    // J4/S12: FK remap after canonical ids are assigned (vector_store.py:
    // 133-151) — chunk rows re-pointed through a broadcast old→new id map.
    "pipe_fk_remap" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val chunks = docs.select(concat(lit("c_"), $"doc_id").as("chunk_id"),
        $"doc_id".as("document_id"))
      val idMap = docs.filter($"doc_id" % 7 === 0)
        .select($"doc_id".as("old_id"), ($"doc_id" + 100000L).as("new_id"))
      Pipelines.remapForeignKeys(chunks, idMap)
    }),

    // S9: join-based upsert — $set semantics with updated_at restamping
    // (document_repository.py:176-208) plus Mongo upsert=True inserts.
    // Updates: re-crawled source tag for doc_id%10==3, five brand-new docs.
    "pipe_upsert" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val updates = docs.filter($"doc_id" % 10 === 3)
        .select($"doc_id", lit("recrawl").as("source"))
        .unionByName(docs.filter($"doc_id" < 5)
          .select(($"doc_id" + 100000L).as("doc_id"), lit("new").as("source")))
      Pipelines.upsertDocuments(docs, updates,
          stamp = to_timestamp(lit("2026-01-01 00:00:00")), insertMissing = true)
        // ISO-serialized (F10) — also keeps NULL comparable in the gate
        .select($"doc_id", $"source", $"lang", $"n_chars",
          date_format($"updated_at", "yyyy-MM-dd'T'HH:mm:ss").as("updated_at"))
    }),

    // A7: rolling performance metrics (rag_engine.py:415-459) — the
    // reference keeps the last N query timings in a deque and reports
    // averages; the batch twin ranks events per type by recency and
    // aggregates the most recent 100 alongside the all-time count.
    "pipe_query_metrics" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"event_type").orderBy($"ts".desc, $"event_id".desc)
      val wAll = Window.partitionBy($"event_type")
      Tables.events(s, dir)
        .withColumn("rn", row_number().over(w))
        .withColumn("n_total", count(lit(1)).over(wAll))
        .filter($"rn" <= 100)
        .groupBy($"event_type")
        .agg(max($"n_total").as("total_queries"),
             count(lit(1)).as("n_recent"),
             round(sum(round($"value", 6).cast("decimal(38,6)")).cast("double") /
               count(lit(1)), 6).as("avg_recent_value"),
             max(round($"value", 6)).as("max_recent_value"))
    }),

    // Multimodal: batched feature extraction over binary media (rows-only).
    "mm_feature_stats" -> ((s, dir) => {
      import s.implicits._
      val media = Multimodal.withSyntheticMedia(Tables.documents(s, dir), "doc_id")
      Multimodal.extractFeatures(media, "doc_id", dim = 64)
        .select($"doc_id", size($"features").as("n_dims"),
          round(aggregate($"features", lit(0.0d), (acc, x) => acc + x), 4).as("feat_sum"))
    }),

    // Multimodal: frame sampling generator (oracle-checked — the sampling
    // grid is pure arithmetic).
    "mm_frame_samples" -> ((s, dir) => {
      import s.implicits._
      val media = Multimodal.withSyntheticMedia(Tables.documents(s, dir), "doc_id")
      Multimodal.sampleFrames(media, "doc_id", stride = 4)
    }),

    // Multimodal: the REAL image codec round-trip, oracle-checked — per
    // document a 16×16 grayscale PNG is ENCODED with pixel(x,y) =
    // (doc_id + 3x + 7y) mod 256, then DECODED through javax.imageio, and
    // the recovered (width, height, Σpixels) are emitted. PNG is lossless,
    // so DuckDB recomputing the pixel sum in closed form must match
    // exactly — a real byte-level codec under the hash gate, not a stub.
    "mm_image_roundtrip" -> ((s, dir) => {
      import s.implicits._
      val encodeDecode = udf { (docId: Long) =>
        val png = Multimodal.encodeGrayPng(16, 16,
          (x, y) => ((docId + 3L * x + 7L * y) % 256L).toInt)
        Multimodal.decodeImage(png) match {
          case Some((w, h, px)) => (w, h, px.map(_.toLong).sum)
          case None             => (-1, -1, -1L)
        }
      }
      // deterministic 10% subset: the codec is real CPU work (~4 ms per
      // encode+decode) and the row should price the OPERATOR, not scale
      // the bench with corpus size — the oracle replays the same filter
      Tables.documents(s, dir).filter($"doc_id" % 10 === 3)
        .select($"doc_id", encodeDecode($"doc_id").as("dec"))
        .select($"doc_id", $"dec._1".as("width"), $"dec._2".as("height"),
          $"dec._3".as("pixel_sum"))
    }),

    // Multimodal: the REAL audio codec round-trip, oracle-checked — per
    // document 256 16-bit PCM samples s(i) = ((doc_id·31 + 7i) mod 4096) −
    // 2048 are ENCODED as a WAV via javax.sound.sampled, DECODED back, and
    // (sample_rate, n_samples, Σsamples) emitted; PCM is lossless, DuckDB
    // recomputes Σ in closed form.
    "mm_audio_roundtrip" -> ((s, dir) => {
      import s.implicits._
      val encodeDecode = udf { (docId: Long) =>
        val samples = Array.tabulate(256)(i =>
          (((docId * 31L + 7L * i) % 4096L) - 2048L).toShort)
        val wav = Multimodal.encodeWavPcm16(8000, samples)
        Multimodal.decodeWav(wav) match {
          case Some((rate, got)) => (rate, got.length, got.map(_.toLong).sum)
          case None              => (-1, -1, -1L)
        }
      }
      Tables.documents(s, dir).filter($"doc_id" % 10 === 3) // same 10% subset as the image row
        .select($"doc_id", encodeDecode($"doc_id").as("dec"))
        .select($"doc_id", $"dec._1".as("sample_rate"), $"dec._2".as("n_samples"),
          $"dec._3".as("sample_sum"))
    }),

    // Multimodal: REAL multi-frame VIDEO decode, oracle-checked — per
    // document an 8×8 4-frame animated GIF is ENCODED with pixel(f,x,y) =
    // (doc_id + 5f + 3x + 7y) mod 256, every frame DECODED back through
    // javax.imageio's GIF reader, one row per frame (the generator shape
    // frame-sampling hands downstream). A 256-level gray palette is exact
    // for 8-bit gray, so DuckDB recomputes each frame's pixel sum in
    // closed form — the r15 video stub made real, same discipline as the
    // image/audio rows; decodeStub remains only for true container formats.
    "mm_video_frames" -> ((s, dir) => {
      import s.implicits._
      val decodeFrames = udf { (docId: Long) =>
        val gif = Multimodal.encodeGrayGif(8, 8, 4,
          (f, x, y) => ((docId + 5L * f + 3L * x + 7L * y) % 256L).toInt)
        Multimodal.decodeGifFrames(gif) match {
          case Some(frames) => frames.zipWithIndex.map { case ((w, h, px), i) =>
            (i, w, h, px.map(_.toLong).sum) }
          case None => Seq((-1, -1, -1, -1L))
        }
      }
      Tables.documents(s, dir).filter($"doc_id" % 10 === 3) // same 10% subset as the image row
        .select($"doc_id", explode(decodeFrames($"doc_id")).as("fr"))
        .select($"doc_id", $"fr._1".as("frame_idx"), $"fr._2".as("width"),
          $"fr._3".as("height"), $"fr._4".as("pixel_sum"))
    }),

    // The end-to-end training-data curation pass as ONE query: transitive
    // near-dup removal (keep each cluster's min-id representative) →
    // quality gate → deterministic train/valid/test split, counted per
    // (lang, split). Every stage is an oracle-checked operator; this row
    // checks their COMPOSITION.
    // The FULL pretraining-curation flagship: every corpus-curation family
    // composed into one dataflow over `documents` —
    //   span scrub (N47, Lee et al. substring dedup remediation)
    //   → transitive near-dup removal (N2/N6, cluster representative)
    //   → quality gate on what remains
    //   → span decontamination vs the held-out eval set (N50, k=8;
    //     docs < 50 play the benchmark, so only doc_id ≥ 50 may train)
    //   → domain-mixture resample over lang at 50/25/25 (N48; es/zh are
    //     unweighted and drop — the fine-grained source domain empties
    //     out at sf0.01 after the upstream gates)
    //   → deterministic 80/10/10 split (N13)
    //   → 2048-token sequence packing per (split, lang, sub-shard) (N26).
    // Output: one row per surviving document with its split and pack
    // assignment — the manifest a training-shard writer consumes. Every
    // stage is an oracle-checked operator on its own; this row pins the
    // COMPOSITION end-to-end against a DuckDB replay of the whole chain.
    // Scale shape: the only corpus-wide shuffles are the span-dedup
    // digest aggregation and the per-doc/per-shard windows; dedup is a
    // precomputed catalog join, decon broadcasts benchmark-sized digests,
    // the mixture is a count-pass + codegen filter, split/pack are
    // narrow + one bounded window per sub-shard.
    "pipe_curation_full" -> ((s, dir) => {
      import s.implicits._
      import graft.functions.TextFunctions.qualityScore
      import graft.operators.{Dedup, Sampling}
      val docs = Tables.documents(s, dir)
      // 1. substring-span scrub over the full corpus; unflagged docs keep
      // their text (scrubDuplicateSpans returns flagged docs only)
      val base = docs
        .join(Dedup.scrubDuplicateSpans(docs), Seq("doc_id"), "left")
        .select($"doc_id", $"source", $"lang",
          coalesce($"scrubbed_text", $"text").as("text"))
      // 2. near-dup cluster representatives (the stored cluster catalog,
      // min-id per transitive component — same stage as pipe_curation)
      val rep = base.join(graft.ClusterCatalog.clusterIds(s, dir), Seq("doc_id"))
        .filter($"cluster_id" === $"doc_id").drop("cluster_id")
      // 3. quality gate evaluates the SCRUBBED text — a wall-to-wall
      // duplicate scrubs to '' and gates out here with no special case.
      // Persisted: the gated frame feeds BOTH the decontamination gram
      // side and the surviving-rows join below — without it the whole
      // scrub → representative → gate chain (the expensive half of the
      // composition) evaluates twice.
      val gated = graft.Caches.persistTracked(
        rep.filter(qualityScore($"text", lit(null).cast("string"),
          lit(null).cast("string")) >= 0.25))
      // 4. span decontamination: any surviving train doc sharing a
      // verbatim 8-token run with the eval set (original text) drops
      val train0 = gated.filter($"doc_id" >= 50)
      val dirty = Dedup.contaminatedSpans(
          train0.select($"doc_id", $"text"),
          docs.filter($"doc_id" < 50).select($"doc_id", $"text"), k = 8)
        .select($"doc_id").distinct()
      // materialized once: the mixture below resolves its thresholds with
      // an eager count pass over this frame, then filters it again
      val clean = train0.join(dirty, Seq("doc_id"), "left_anti")
        .localCheckpoint(true)
      // 5–7. mixture resample (over lang — see curationMixWeights) →
      // split → pack. The packing budget counts REAL subword tokens under
      // the frozen corpus-trained BPE merges (operators.Bpe — the same
      // trained tokenizer ana_token_counts_bpe / samp_pack_bpe pin), not
      // the whitespace approximation: a training-shard manifest packs
      // what the model will actually see. The oracle replays the frozen
      // merge table over the scrubbed text word-for-word.
      val mixed = Sampling.mixtureResample(clean, "doc_id", "lang",
          SamplingQueries.curationMixWeights)
        .withColumn("split", Sampling.splitColumn($"doc_id",
          Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)))
        .select($"doc_id", $"source", $"lang", $"split",
          graft.operators.Bpe.tokenCount($"text",
            graft.operators.Bpe.frozen).as("n_tokens"))
        .withColumn("shard", concat_ws("#", $"split", $"lang",
          pmod(Sampling.hashBucket($"doc_id", "pack"), lit(8L)).cast("string")))
      Sampling.packSequences(mixed, $"n_tokens", budget = 2048,
          shardCol = "shard", idCol = "doc_id")
        .select($"doc_id", $"source", $"lang", $"split", $"n_tokens",
          $"pack_start", $"pack_end", $"start_offset")
    }),

    "pipe_curation" -> ((s, dir) => {
      import s.implicits._
      import graft.functions.TextFunctions.qualityScore
      import graft.operators.Sampling
      val docs = Tables.documents(s, dir)
      docs.join(graft.ClusterCatalog.clusterIds(s, dir), Seq("doc_id"))
        .filter($"cluster_id" === $"doc_id")
        .filter(qualityScore($"text", lit(null).cast("string"),
          lit(null).cast("string")) >= 0.25)
        .withColumn("split", Sampling.splitColumn($"doc_id",
          Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)))
        .groupBy($"lang", $"split")
        .agg(count(lit(1)).as("n_docs"))
    }))

  val oracle: Map[String, String] = Map(
    // The chunker replay (DuckSql.chunkCtes) oracles the whole C1 chunk
    // family — golden-only before round 19. pipe_sql_chunks chunks the RAW
    // text (the graft_chunk generator's contract); pipe_chunk_stats /
    // pipe_doc_chunks chunk the CLEANED text (featurePipeline's contract,
    // via the shared DuckSql.clean fragment); the min-50-stripped-chars
    // drop and the md5-over-unstripped-take(100) id derivation are
    // replayed verbatim.
    "pipe_sql_chunks" ->
      s"""WITH RECURSIVE src AS (
            SELECT CAST(doc_id AS VARCHAR) AS gid, text AS txt FROM documents),
          ${DuckSql.chunkCtes("ck", "src", 1000, 200)}
          SELECT CAST(gid AS BIGINT) AS doc_id,
                 md5(gid || '_' || CAST(seq AS VARCHAR) || '_' || substr(chunk, 1, 100)) AS chunk_id,
                 seq AS chunk_index,
                 CAST(${DuckSql.wc("chunk")} AS INTEGER) AS word_count,
                 0 AS start_char,
                 CAST(length(chunk) AS INTEGER) AS end_char
          FROM ck_chunks
          WHERE length(${DuckSql.jtrim("chunk")}) >= 50""",
    "pipe_chunk_stats" ->
      s"""WITH RECURSIVE src AS (
            SELECT CAST(doc_id AS VARCHAR) AS gid, ${DuckSql.clean("text")} AS txt
            FROM documents),
          ${DuckSql.chunkCtes("ck", "src", 1000, 200)}
          SELECT CAST(gid AS BIGINT) AS document_id,
                 COUNT(*) AS n_chunks,
                 CAST(SUM(CAST(${DuckSql.wc("chunk")} AS BIGINT)) AS BIGINT) AS total_words,
                 384 AS embedding_dim
          FROM ck_chunks
          WHERE length(${DuckSql.jtrim("chunk")}) >= 50
          GROUP BY gid""",
    "pipe_doc_chunks" ->
      s"""WITH RECURSIVE src AS (
            SELECT CAST(doc_id AS VARCHAR) AS gid, ${DuckSql.clean("text")} AS txt
            FROM documents WHERE doc_id = 22),
          ${DuckSql.chunkCtes("ck", "src", 1000, 200)}
          SELECT CAST(gid AS BIGINT) AS document_id,
                 md5(gid || '_' || CAST(seq AS VARCHAR) || '_' || substr(chunk, 1, 100)) AS chunk_id,
                 seq AS chunk_index,
                 CAST(${DuckSql.wc("chunk")} AS INTEGER) AS word_count,
                 (SELECT lang FROM documents WHERE doc_id = 22) AS lang
          FROM ck_chunks
          WHERE length(${DuckSql.jtrim("chunk")}) >= 50""",
    // The embedding layer word for word: chunk replay → embedCtes, nonzero
    // components only (a bucket that nets to zero is 0.0f on the Spark
    // side and absent here — both sides filter it).
    "emb_vectors" ->
      s"""WITH RECURSIVE src AS (
            SELECT CAST(doc_id AS VARCHAR) AS gid, ${DuckSql.clean("text")} AS txt
            FROM documents WHERE doc_id % 25 = 0),
          ${DuckSql.chunkCtes("ck", "src", 1000, 200)},
          fc AS (SELECT md5(gid || '_' || CAST(seq AS VARCHAR) || '_' || substr(chunk, 1, 100)) AS cid,
                        ${DuckSql.jtrim("chunk")} AS content
                 FROM ck_chunks WHERE length(${DuckSql.jtrim("chunk")}) >= 50),
          esrc AS (SELECT cid AS gid, content AS txt FROM fc),
          ${DuckSql.embedCtes("esrc")}
          SELECT gid AS chunk_id, dim, val FROM emb""",
    // The flagship, end to end in SQL: chunk replay over cleaned text →
    // embeddings for every chunk AND the query text (one extra source row)
    // → Atlas score (1+cos)/2 over double casts of the float32 components
    // → top-10 on the RAW score with the id tie-break (knn's contract;
    // rounding is output-only) → documents attribution join.
    "pipe_flagship" ->
      s"""WITH RECURSIVE src AS (
            SELECT CAST(doc_id AS VARCHAR) AS gid, ${DuckSql.clean("text")} AS txt
            FROM documents),
          ${DuckSql.chunkCtes("ck", "src", 1000, 200)},
          fc AS (SELECT CAST(gid AS BIGINT) AS document_id,
                        md5(gid || '_' || CAST(seq AS VARCHAR) || '_' || substr(chunk, 1, 100)) AS cid,
                        ${DuckSql.jtrim("chunk")} AS content,
                        CAST(${DuckSql.wc("chunk")} AS INTEGER) AS word_count
                 FROM ck_chunks WHERE length(${DuckSql.jtrim("chunk")}) >= 50),
          esrc AS (SELECT cid AS gid, content AS txt FROM fc
                   UNION ALL SELECT '##query##', 'spark join vector query'),
          ${DuckSql.embedCtes("esrc")},
          qv AS (SELECT dim, CAST(val AS DOUBLE) AS q FROM emb WHERE gid = '##query##'),
          cv AS (SELECT gid, dim, CAST(val AS DOUBLE) AS c FROM emb WHERE gid <> '##query##'),
          qn AS (SELECT sqrt(SUM(q * q)) AS qn FROM qv),
          cn AS (SELECT gid, sqrt(SUM(c * c)) AS cn FROM cv GROUP BY gid),
          dots AS (SELECT cv.gid, SUM(cv.c * qv.q) AS dot
                   FROM cv JOIN qv USING (dim) GROUP BY cv.gid),
          scored AS (SELECT fc.cid AS chunk_id, fc.document_id, fc.word_count,
                            (dots.dot / (cn.cn * (SELECT qn FROM qn)) + 1.0e0) / 2.0e0 AS raw
                     FROM dots JOIN cn USING (gid) JOIN fc ON fc.cid = dots.gid),
          topk AS (SELECT * FROM scored ORDER BY raw DESC, chunk_id ASC LIMIT 10)
          SELECT t.chunk_id, t.document_id, round(t.raw, 6) AS score,
                 d.lang, d.source, t.word_count
          FROM topk t LEFT JOIN documents d ON t.document_id = d.doc_id""",
    // C2/C3: the parent-child hierarchy is the SAME splitText kernel
    // instantiated twice — parents at 2000/400 over the raw text, children
    // at 400/100 over each parent's text; ids are positional
    // ({doc}_parent_{p}_child_{c}), so the relationship map is a pure
    // group-by over the second instantiation.
    "pipe_hierarchy_rel" ->
      s"""WITH RECURSIVE dsrc AS (
            SELECT CAST(doc_id AS VARCHAR) AS gid, text AS txt FROM documents),
          ${DuckSql.chunkCtes("par", "dsrc", 2000, 400)},
          csrc AS (SELECT gid || '_parent_' || CAST(seq AS VARCHAR) AS gid, chunk AS txt
                   FROM par_chunks),
          ${DuckSql.chunkCtes("chi", "csrc", 400, 100)}
          SELECT gid AS parent_id,
                 array_to_string(list_sort(list(gid || '_child_' || CAST(seq AS VARCHAR))), ',') AS child_ids,
                 CAST(COUNT(*) AS INTEGER) AS n_children
          FROM chi_chunks
          GROUP BY gid""",
    "pipe_etl_status" ->
      s"""SELECT CASE WHEN length(text) = 0 THEN 'failed' ELSE 'completed' END AS processing_status,
            COUNT(*) AS n_docs,
            CAST(SUM(${DuckSql.wc("text")}) AS BIGINT) AS total_words,
            round(CAST(SUM(CAST(round(${DuckSql.quality}, 6) AS DECIMAL(38,6))) AS DOUBLE), 6) AS total_quality
          FROM documents
          GROUP BY CASE WHEN length(text) = 0 THEN 'failed' ELSE 'completed' END""",
    "mm_frame_samples" ->
      """SELECT doc_id, CAST(unnest(generate_series(0, 15, 4)) AS INT) AS frame_idx
         FROM documents""",
    "mm_image_roundtrip" ->
      """SELECT d.doc_id,
                CAST(16 AS INT) AS width,
                CAST(16 AS INT) AS height,
                CAST((SELECT SUM((d.doc_id + 3*x.i + 7*y.i) % 256)
                      FROM range(16) x(i), range(16) y(i)) AS BIGINT) AS pixel_sum
         FROM documents d WHERE d.doc_id % 10 = 3""",
    "mm_audio_roundtrip" ->
      """SELECT d.doc_id,
                CAST(8000 AS INT) AS sample_rate,
                CAST(256 AS INT) AS n_samples,
                CAST((SELECT SUM(((d.doc_id*31 + 7*t.i) % 4096) - 2048)
                      FROM range(256) t(i)) AS BIGINT) AS sample_sum
         FROM documents d WHERE d.doc_id % 10 = 3""",
    "mm_video_frames" ->
      """SELECT d.doc_id,
                CAST(f.i AS INT) AS frame_idx,
                CAST(8 AS INT) AS width,
                CAST(8 AS INT) AS height,
                CAST((SELECT SUM((d.doc_id + 5*f.i + 3*x.i + 7*y.i) % 256)
                      FROM range(8) x(i), range(8) y(i)) AS BIGINT) AS pixel_sum
         FROM documents d, range(4) f(i) WHERE d.doc_id % 10 = 3""",
    "pipe_upsert" ->
      """WITH updates AS (
           SELECT doc_id, 'recrawl' AS source FROM documents WHERE doc_id % 10 = 3
           UNION ALL
           SELECT doc_id + 100000 AS doc_id, 'new' AS source FROM documents WHERE doc_id < 5)
         SELECT coalesce(t.doc_id, u.doc_id) AS doc_id,
                CASE WHEN u.doc_id IS NOT NULL THEN u.source ELSE t.source END AS source,
                t.lang AS lang,
                t.n_chars AS n_chars,
                CASE WHEN u.doc_id IS NOT NULL THEN '2026-01-01T00:00:00'
                     ELSE CAST(NULL AS VARCHAR) END AS updated_at
         FROM documents t FULL OUTER JOIN updates u ON t.doc_id = u.doc_id""",
    "pipe_fk_remap" ->
      """SELECT concat('c_', doc_id) AS chunk_id,
            CASE WHEN doc_id % 7 = 0 THEN doc_id + 100000 ELSE doc_id END AS document_id
          FROM documents""",
    "pipe_query_metrics" ->
      """WITH ranked AS (
           SELECT event_type, value,
                  ROW_NUMBER() OVER (PARTITION BY event_type
                    ORDER BY date_trunc('microseconds', ts) DESC, event_id DESC) AS rn,
                  COUNT(*) OVER (PARTITION BY event_type) AS n_total
           FROM events)
         SELECT event_type,
                CAST(MAX(n_total) AS BIGINT) AS total_queries,
                CAST(COUNT(*) AS BIGINT) AS n_recent,
                round(CAST(SUM(CAST(round(value, 6) AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 6) AS avg_recent_value,
                MAX(round(value, 6)) AS max_recent_value
         FROM ranked WHERE rn <= 100 GROUP BY event_type""",
    // the full curation chain, replayed stage by stage from the shared
    // per-stage fragments: span scrub (DedupQueries.duckSpanFragment +
    // duckScrubTail), components (duckComponentCtes), quality (DuckSql),
    // decon 8-grams, mixture (SamplingQueries.mixCtesOver), split bucket
    // and pack arithmetic (SamplingQueries twins)
    "pipe_curation_full" ->
      s"""WITH RECURSIVE ${DedupQueries.duckComponentCtes},
          ${DedupQueries.duckSpanFragment},
          ${DedupQueries.duckScrubTail},
          base AS (
            SELECT d.doc_id, d.source, d.lang,
                   COALESCE(s.scrubbed_text, d.text) AS text
            FROM documents d LEFT JOIN scrubbed s USING (doc_id)),
          keep1 AS (
            SELECT b.doc_id, b.source, b.lang, b.text
            FROM base b LEFT JOIN comp c ON b.doc_id = c.id
            WHERE COALESCE(c.cluster_id, b.doc_id) = b.doc_id),
          keep2 AS (SELECT * FROM keep1 WHERE ${DuckSql.quality} >= 0.25e0),
          ew AS (SELECT ${DuckSql.words("text")} AS w FROM documents WHERE doc_id < 50),
          eg8 AS (SELECT DISTINCT md5(array_to_string(w[p : p + 7], ' ')) AS h
                  FROM (SELECT w, unnest(generate_series(1, len(w) - 7)) AS p
                        FROM ew WHERE len(w) >= 8)),
          tw8 AS (SELECT doc_id, ${DuckSql.words("text")} AS w
                  FROM keep2 WHERE doc_id >= 50),
          tg8 AS (SELECT DISTINCT t8.doc_id AS doc_id
                  FROM (SELECT doc_id, md5(array_to_string(w[p : p + 7], ' ')) AS h
                        FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 7)) AS p
                              FROM tw8 WHERE len(w) >= 8)) t8
                  JOIN eg8 USING (h)),
          clean AS (
            SELECT k.doc_id, k.source, k.lang, k.text
            FROM keep2 k LEFT JOIN tg8 ON k.doc_id = tg8.doc_id
            WHERE k.doc_id >= 50 AND tg8.doc_id IS NULL),
          ${SamplingQueries.mixCtesOver("clean", "lang", SamplingQueries.curationMixWeights)},
          mixed AS (
            SELECT c2.doc_id, c2.source, c2.lang, c2.text
            FROM clean c2 JOIN rates r USING (lang)
            WHERE ${SamplingQueries.duckBucket("mix", "CAST(c2.doc_id AS VARCHAR)")} < r.keep_ppm),
          ${DuckSql.bpeWordTokenCtes(graft.operators.Bpe.frozen, srcRel = "mixed")},
          dtok AS (SELECT doc_id, unnest(${DuckSql.words("text")}) AS w FROM mixed),
          bagg AS (SELECT doc_id, CAST(SUM(n) AS BIGINT) AS nb
                   FROM dtok JOIN wtok USING (w) GROUP BY doc_id),
          t AS (
            SELECT doc_id, source, lang,
              CASE WHEN b < 800000 THEN 'train'
                   WHEN b < 900000 THEN 'valid'
                   ELSE 'test' END AS split,
              CAST(COALESCE(nb, 0) AS BIGINT) AS n_tokens
            FROM (SELECT mx.*, bg.nb,
                    ${SamplingQueries.duckBucket("split", "CAST(mx.doc_id AS VARCHAR)")} AS b
                  FROM mixed mx LEFT JOIN bagg bg USING (doc_id))),
          t2 AS (
            SELECT *, concat_ws('#', split, lang,
              CAST((${SamplingQueries.duckBucket("pack", "CAST(doc_id AS VARCHAR)")}) % 8 AS VARCHAR)) AS shard
            FROM t),
          cw AS (
            SELECT *, CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
            FROM t2)
          SELECT doc_id, source, lang, split, n_tokens,
            CAST((cum - n_tokens) // 2048 AS BIGINT) AS pack_start,
            CAST(GREATEST((GREATEST(cum, 1) - 1) // 2048,
                          (cum - n_tokens) // 2048) AS BIGINT) AS pack_end,
            CAST((cum - n_tokens) % 2048 AS BIGINT) AS start_offset
          FROM cw""",

    // composed from the per-stage oracles: comp CTEs from DedupQueries,
    // quality from DuckSql, split bucket from SamplingQueries
    "pipe_curation" ->
      s"""WITH RECURSIVE ${DedupQueries.duckComponentCtes},
          keep AS (
            SELECT d.doc_id, d.lang, d.text
            FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
            WHERE COALESCE(c.cluster_id, d.doc_id) = d.doc_id),
          gated AS (
            SELECT doc_id, lang,
              ${SamplingQueries.duckBucket("split", "CAST(doc_id AS VARCHAR)")} AS b
            FROM keep WHERE ${graft.queries.DuckSql.quality} >= 0.25e0)
          SELECT lang,
            CASE WHEN b < 800000 THEN 'train'
                 WHEN b < 900000 THEN 'valid'
                 ELSE 'test' END AS split,
            CAST(COUNT(*) AS BIGINT) AS n_docs
          FROM gated GROUP BY 1, 2""")
}
