package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions._

/** Vector similarity operators (SURVEY.md §2.6 V2-V6) over the `embeddings`
  * fixture. The brute-force paths broadcast the (tiny) query vector and scan
  * once — a single narrow pass plus a TakeOrderedAndProject top-k, which is
  * exactly the plan that survives a 100× scale-up (no shuffle except the
  * final k-row collect). DuckDB oracle via list_cosine_similarity on
  * DOUBLE[] casts; both sides fold in double precision, differences are
  * ~1e-15 and vanish under round(..., 6).
  */
object VectorQueries {

  /** V2 cosine KNN: query vector = embedding of vec_id 0, top-10 by score,
    * self excluded (P6), deterministic tie-break on vec_id. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "vec_knn_top10" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables.embeddings(s, dir)
      val query = emb.filter($"vec_id" === 0L).select($"embedding".as("query_vec"))
      emb.crossJoin(broadcast(query))
        .filter($"vec_id" =!= 0L)
        .withColumn("cos", cosineSimilarity($"embedding", $"query_vec"))
        .orderBy($"cos".desc, $"vec_id".asc)
        .limit(10)
        .select($"vec_id", round($"cos", 6).as("score"))
    }),

    // V4 score-thresholded KNN: Atlas score (1+cos)/2 >= threshold, then
    // capped — the reference's threshold-then-limit path. Threshold 0.6 ≈
    // the fixture's p99 (the reference's 0.7 is calibrated to MiniLM scores).
    "vec_knn_threshold" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables.embeddings(s, dir)
      val query = emb.filter($"vec_id" === 1L).select($"embedding".as("query_vec"))
      emb.crossJoin(broadcast(query))
        .filter($"vec_id" =!= 1L)
        .withColumn("cos", cosineSimilarity($"embedding", $"query_vec"))
        .filter(($"cos" + 1.0) / 2.0 >= 0.6)
        .orderBy($"cos".desc, $"vec_id".asc)
        .limit(100)
        .select($"vec_id", round((($"cos" + 1.0) / 2.0), 6).as("score"))
    }),

    // Per-label centroid norms: array aggregation exercise (element-wise mean
    // via explode + posexplode-free aggregation).
    "vec_label_counts" -> ((s, dir) => {
      import s.implicits._
      Tables.embeddings(s, dir)
        .groupBy($"label")
        .agg(count(lit(1)).as("n_vectors"),
             round(sum(l2Norm($"embedding").cast("decimal(38,12)")).cast("double")
               / count(lit(1)), 6).as("avg_norm"))
    }))

  private def duckCos(a: String, b: String) =
    s"list_cosine_similarity(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[]))"

  val oracle: Map[String, String] = Map(
    "vec_knn_top10" ->
      s"""SELECT e.vec_id, round(${duckCos("e.embedding", "q.embedding")}, 6) AS score
          FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
          WHERE e.vec_id <> 0
          ORDER BY ${duckCos("e.embedding", "q.embedding")} DESC, e.vec_id ASC
          LIMIT 10""",
    "vec_knn_threshold" ->
      s"""SELECT e.vec_id, round((${duckCos("e.embedding", "q.embedding")} + 1.0e0) / 2.0e0, 6) AS score
          FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 1) q
          WHERE e.vec_id <> 1
            AND (${duckCos("e.embedding", "q.embedding")} + 1.0e0) / 2.0e0 >= 0.6e0
          ORDER BY ${duckCos("e.embedding", "q.embedding")} DESC, e.vec_id ASC
          LIMIT 100""",
    "vec_label_counts" ->
      """SELECT label, COUNT(*) AS n_vectors,
         round(CAST(SUM(CAST(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*), 6) AS avg_norm
         FROM embeddings GROUP BY label""")
}
