package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Clusters, Dedup}

/** Stored near-dup cluster labels — like ChunkCatalog for chunks and
  * BandCatalog for the dedup index: connected components over the verified
  * near-dup pair graph are a corpus-build artifact, computed once when the
  * corpus changes, read by every downstream consumer (dedup survivors,
  * curation, analytics). Re-running the propagation loop per query is the
  * anti-pattern this store removes.
  *
  * Bucketed by doc_id so curation-style doc⋈cluster equi-joins can read
  * the cluster side shuffle-free.
  */
object ClusterCatalog {

  /** (doc_id, cluster_id) for EVERY document — the min doc id of its
    * verified near-dup component, its own id when unpaired. */
  def clusterIds(spark: SparkSession, dir: String): DataFrame = {
    val name = TableStore.tableName("clusters", dir)
    TableStore.getOrBuild(spark, name) {
      // the build persists corpus-scale intermediates (shingle/band tables,
      // the edge list) that nothing can read again once the table exists;
      // releaseAfter drops exactly those — never a cache the caller holds
      Caches.releaseAfter {
        val docs = Tables.documents(spark, dir)
        val comp = Clusters
          .connectedComponents(Dedup.minHashPairsFast(docs.select(col("doc_id"), col("text"))))
          .withColumnRenamed("id", "doc_id")
        docs.select(col("doc_id")).join(comp, Seq("doc_id"), "left")
          .select(col("doc_id"), coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
          // clusterWrite (the BandCatalog/Pipelines discipline, missing only
          // here): repartition on the bucket column with numPartitions ==
          // buckets so each task holds exactly one bucket and writes ONE
          // file — without it the writer emits one file per (input
          // partition × bucket), and a broadcast-joined build fans the
          // stored table into ~400 tiny files whose open cost then taxes
          // every read (measured: dedup_cluster_ids 0.17 → 0.64 s warm)
          .repartition(32, col("doc_id"))
          .write.mode("overwrite")
          .bucketBy(32, "doc_id").sortBy("doc_id")
          .format("parquet").saveAsTable(name)
      }
    }
  }
}
