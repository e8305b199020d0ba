package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{ChunkOps, Embedder}
import graft.pipelines.Pipelines

/** Stored-chunks catalog — the reference's deployment model
  * (rag_pipeline.py:190-236): the feature pipeline materializes chunks +
  * embeddings ONCE into the chunk store; every retrieval query reads the
  * store instead of re-chunking and re-embedding the corpus per query.
  *
  * Tables are bucketed by document_id (Pipelines.writeBucketedChunks), so
  * doc⋈chunk equi-joins read co-located buckets shuffle-free. Built lazily
  * per (session, fixture dir) on first use via the session catalog — a fresh
  * JVM rebuilds from source, so results are always derived from the current
  * pipeline code, never a stale file.
  */
object ChunkCatalog {

  private def tableName(kind: String, dir: String): String =
    TableStore.tableName(kind, dir)

  private def getOrBuild(spark: SparkSession, name: String)(build: => DataFrame): DataFrame =
    TableStore.getOrBuild(spark, name) {
      Pipelines.writeBucketedChunks(build, name)
    }

  /** Flat chunks + embeddings (featurePipeline output), stored bucketed. */
  def flatChunks(spark: SparkSession, dir: String): DataFrame =
    getOrBuild(spark, tableName("chunks", dir)) {
      Pipelines.featurePipeline(Tables.documents(spark, dir), qualityThreshold = 0.0)
    }

  /** Parent/child hierarchy rows (no embeddings — relationship queries). */
  def hierarchyChunks(spark: SparkSession, dir: String): DataFrame =
    getOrBuild(spark, tableName("hier", dir)) {
      ChunkOps.chunkHierarchy(Tables.documents(spark, dir)).toDF()
    }

  /** Child chunks with embeddings (the parent-child retrieval corpus). */
  def childChunks(spark: SparkSession, dir: String): DataFrame =
    getOrBuild(spark, tableName("children", dir)) {
      Embedder.withEmbeddings(
        hierarchyChunks(spark, dir).filter(col("chunk_type") === "child"),
        "content", "embedding")
    }
}
