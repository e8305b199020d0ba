package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** Stored BPE merges — the corpus-specific retraining form of the frozen
  * deployment table ([[graft.operators.Bpe.frozen]]): like the other
  * build-once catalogs (clusters, bands, IVF), the merge table is a
  * corpus-build artifact — trained once when the corpus changes, read by
  * every consumer (token accounting, packing) — never retrained per
  * query. One row per merge, ordered by rank. */
object BpeCatalog {

  /** Train-or-load the merge table for `dir`'s documents. The ordered
    * merges come back as the in-memory Vector every Bpe entry point
    * takes — rank order IS the tokenizer, so the read re-sorts. */
  def merges(spark: SparkSession, dir: String, nMerges: Int = 200,
             maxVocab: Int = 20000): Vector[(String, String)] = {
    val name = TableStore.tableName(s"bpe$nMerges", dir)
    TableStore.getOrBuild(spark, name) {
      val trained = Bpe.train(Tables.documents(spark, dir), "text", nMerges, maxVocab)
      import spark.implicits._
      trained.zipWithIndex
        .map { case ((l, r), i) => (i + 1, l, r) }
        .toDF("rank", "left", "right")
        .coalesce(1)
        .write.mode("overwrite").format("parquet").saveAsTable(name)
    }
    spark.table(name).orderBy(col("rank").asc)
      .collect().map(r => (r.getString(1), r.getString(2))).toVector
  }
}
