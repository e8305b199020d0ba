package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Similarity

/** Materialized IVF index (SCALE.md / Similarity scaladoc): the corpus with
  * its nearest-centroid assignment, WRITTEN `partitionBy(centroid_id)` so a
  * probe prunes whole partition directories at the scan — the assignment is
  * a write-time partition key, computed once per corpus, not a per-query
  * corpus pass. At 100 TB this is the difference between a probe reading
  * nprobe/nlist of the files and a probe re-scoring everything.
  */
object IvfCatalog {

  /** Embeddings fixture with centroid_id, stored partitioned by centroid_id.
    * Built once per (session, dir); later calls are a pruned-scan-able read. */
  def assignedEmbeddings(spark: SparkSession, dir: String,
                         centroids: Int, step: Long): DataFrame = {
    val name = TableStore.tableName(s"ivf${centroids}_$step", dir)
    TableStore.getOrBuild(spark, name) {
      val emb = Tables.embeddings(spark, dir)
      val cents = Similarity.seededCentroids(emb, centroids, step)
      Similarity.ivfAssign(emb, cents)
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .format("parquet")
        .saveAsTable(name)
    }
  }
}
