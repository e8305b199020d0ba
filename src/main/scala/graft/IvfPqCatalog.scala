package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Similarity

/** Materialized IVFADC index (SCALE.md): PQ codes + exact norms with the
  * nearest-centroid assignment, WRITTEN `partitionBy(centroid_id)` — the
  * storage form [[graft.operators.Similarity.ivfPqSearch]]'s scaladoc
  * promises. A probe prunes whole partition directories at the scan AND
  * reads 8-byte codes instead of float32 vectors inside the surviving
  * cells: nprobe/nlist of the files × 1/32 of the bytes, computed once per
  * corpus at index-build time, not per query.
  */
object IvfPqCatalog {

  /** PQ-encoded embeddings with centroid_id, stored partitioned by
    * centroid_id. Built once per (session, dir); later calls are a
    * pruned-scan-able read of the code table. */
  def encodedEmbeddings(spark: SparkSession, dir: String, cb: Similarity.PqCodebook,
                        centroids: Int, step: Long): DataFrame = {
    // the trained codebook's CONTENT is part of the identity (not just its
    // shape): a differently-trained codebook must never reuse a stale table
    val name = TableStore.tableName(
      s"ivfpq${centroids}_${step}_m${cb.m}k${cb.ksub}_${cb.fingerprint}", dir)
    TableStore.getOrBuild(spark, name) {
      val emb = Tables.embeddings(spark, dir)
      val cents = Similarity.seededCentroids(emb, centroids, step)
      Similarity.pqEncode(emb, cb)
        .join(Similarity.ivfAssign(emb, cents).select("vec_id", "centroid_id"), "vec_id")
        .repartition(org.apache.spark.sql.functions.col("centroid_id")) // one file per cell (IvfCatalog clusterWrite note)
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .format("parquet")
        .saveAsTable(name)
    }
  }
}
