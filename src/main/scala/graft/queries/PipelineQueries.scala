package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Multimodal
import graft.pipelines.Pipelines

/** End-to-end pipeline + multimodal plumbing queries. The chunker/embedder
  * internals are not SQL-expressible, so pipe_chunk_stats / pipe_flagship /
  * mm_feature_stats are registered WITHOUT oracle SQL (driver records the
  * weaker rows-only check) and get their correctness from ChunkerSpec /
  * EmbedderSpec / PipelineSpec instead; the rest are oracle-checked. */
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

    // Feature pipeline output shape: chunks per document (rows-only check;
    // splitter semantics covered by ChunkerSpec).
    "pipe_chunk_stats" -> ((s, dir) => {
      import s.implicits._
      Pipelines.featurePipeline(Tables.documents(s, dir), qualityThreshold = 0.0)
        .groupBy($"document_id")
        .agg(count(lit(1)).as("n_chunks"),
             sum($"word_count".cast("long")).as("total_words"),
             max(size($"embedding")).as("embedding_dim"))
    }),

    // §7.3 flagship slice as a registered query (rows-only check).
    "pipe_flagship" -> ((s, dir) => Pipelines.flagship(s, dir)),

    // S6/J2/T3: a document with its chunks in index order (rows-only).
    "pipe_doc_chunks" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val chunks = Pipelines.featurePipeline(docs, qualityThreshold = 0.0)
      Pipelines.documentWithChunks(docs.select($"doc_id", $"lang"), chunks, docId = 22L)
        .select($"document_id", $"chunk_id", $"chunk_index", $"word_count", $"lang")
    }),

    // C3: parent→children relationship map over the hierarchy (rows-only).
    "pipe_hierarchy_rel" -> ((s, dir) => {
      import graft.operators.ChunkOps
      val chunks = ChunkOps.chunkHierarchy(Tables.documents(s, dir)).toDF()
      ChunkOps.parentChildRelationships(chunks)
    }),

    // §3.1 orchestrated multi-strategy search, end to end (rows-only).
    "pipe_orchestrator" -> ((s, dir) => {
      import graft.operators.{Embedder, Orchestrator, ChunkOps}
      import org.apache.spark.sql.functions.col
      val docs = Tables.documents(s, dir)
      val flat = Pipelines.featurePipeline(docs, qualityThreshold = 0.0)
      val children = Embedder.withEmbeddings(
        ChunkOps.chunkHierarchy(docs).toDF().filter(col("chunk_type") === "child"),
        "content", "embedding")
      Orchestrator.search(s, flat, children, "explain how to merge sort a table")
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
    }))

  val oracle: Map[String, String] = Map(
    "pipe_etl_status" ->
      s"""SELECT CASE WHEN length(text) = 0 THEN 'failed' ELSE 'completed' END AS processing_status,
            COUNT(*) AS n_docs,
            CAST(SUM(${DuckSql.wc("text")}) AS BIGINT) AS total_words,
            round(CAST(SUM(CAST(round(${DuckSql.quality}, 6) AS DECIMAL(38,6))) AS DOUBLE), 6) AS total_quality
          FROM documents
          GROUP BY CASE WHEN length(text) = 0 THEN 'failed' ELSE 'completed' END""",
    "mm_frame_samples" ->
      """SELECT doc_id, CAST(unnest(generate_series(0, 15, 4)) AS INT) AS frame_idx
         FROM documents""")
}
