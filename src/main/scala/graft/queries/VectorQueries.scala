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

    // SQL surface: the same KNN expressed as SQL text over a temp view,
    // planning the native graft_cosine expression registered via
    // GraftExtensions (query vector = vec 2).
    "vec_knn_sql" -> ((s, dir) => {
      graft.expressions.GraftExtensions.register(s)
      Tables.embeddings(s, dir).createOrReplaceTempView("graft_embeddings")
      s.sql("""
        SELECT vec_id, round(score, 6) AS score FROM (
          SELECT e.vec_id,
                 (graft_cosine(e.embedding, q.embedding) + 1.0d) / 2.0d AS score
          FROM graft_embeddings e,
               (SELECT embedding FROM graft_embeddings WHERE vec_id = 2) q
          WHERE e.vec_id <> 2)
        ORDER BY score DESC, vec_id ASC LIMIT 10""")
    }),

    // Batch KNN (V2 at fleet scale): 5 query vectors against the corpus in
    // one pass — broadcast queries, window top-k per query id.
    "vec_knn_batch" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables.embeddings(s, dir)
      val queries = emb.filter($"vec_id" < 5L)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      graft.operators.VectorSearch
        .knnBatch(emb, queries, k = 5, embCol = "embedding", idCol = "vec_id")
        .select($"qid", $"vec_id", $"rank", round($"score", 6).as("score"))
    }),

    // V3/J5+P6: nearest neighbours of vec 5 outside its own label group
    // (the similar-chunks-excluding-own-document shape).
    "vec_similar_diff_label" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter($"vec_id" === 5L)
        .select($"embedding".as("qvec"), $"label".as("qlabel"))
      emb.crossJoin(broadcast(q))
        .filter($"vec_id" =!= 5L && $"label" =!= $"qlabel")
        .withColumn("score", (cosineSimilarity($"embedding", $"qvec") + 1.0) / 2.0)
        .orderBy($"score".desc, $"vec_id".asc)
        .limit(10)
        .select($"vec_id", $"label", round($"score", 6).as("score"))
    }),

    // J6 doc-level: groups most similar to vec 7's neighbors rolled up one
    // row per group, best chunk score wins (label stands in for document_id
    // — the fixture's embeddings are one-per-doc, so labels give the rollup
    // a real many-chunks-per-group shape).
    "vec_similar_docs" -> ((s, dir) => {
      import s.implicits._
      graft.operators.VectorSearch
        .similarDocuments(Tables.embeddings(s, dir), targetId = 7L, k = 5,
          docCol = "label", idCol = "vec_id")
        .select($"label", round($"best_score", 6).as("best_score"), $"n_chunks")
    }),

    // Single-pass bounded-heap top-k via the typed Aggregator (no sort of
    // the scored corpus; finalization of the 10-row result is driver-side).
    "vec_topk_singlepass" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter($"vec_id" === 4L).select($"embedding".as("qvec"))
      val scored = emb.crossJoin(broadcast(q))
        .select($"vec_id",
          round((cosineSimilarity($"embedding", $"qvec") + 1.0) / 2.0, 6).as("score"))
        .as[(Long, Double)]
      val top = scored.select(new graft.functions.TopKAggregator[Long](10).toColumn).head()
      top.zipWithIndex
        .map { case ((id, score), i) => (i + 1, id, score) }
        .toDF("rank", "vec_id", "score")
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

  private def duckCos(a: String, b: String) = DuckSql.cos(a, b)

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
    "vec_knn_sql" ->
      s"""SELECT vec_id, round(score, 6) AS score FROM (
            SELECT e.vec_id, (${duckCos("e.embedding", "q.embedding")} + 1.0e0) / 2.0e0 AS score
            FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 2) q
            WHERE e.vec_id <> 2)
          ORDER BY score DESC, vec_id ASC LIMIT 10""",
    "vec_knn_batch" ->
      s"""SELECT qid, vec_id, CAST(rank AS INT) AS rank, round(score, 6) AS score FROM (
            SELECT q.vec_id AS qid, e.vec_id AS vec_id,
                   (${duckCos("e.embedding", "q.embedding")} + 1.0e0) / 2.0e0 AS score,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id
                     ORDER BY (${duckCos("e.embedding", "q.embedding")} + 1.0e0) / 2.0e0 DESC,
                              e.vec_id ASC) AS rank
            FROM embeddings e, (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5) q)
          WHERE rank <= 5""",
    "vec_similar_diff_label" ->
      s"""SELECT e.vec_id, e.label,
            round((${duckCos("e.embedding", "q.embedding")} + 1.0e0) / 2.0e0, 6) AS score
          FROM embeddings e,
               (SELECT embedding, label FROM embeddings WHERE vec_id = 5) q
          WHERE e.vec_id <> 5 AND e.label <> q.label
          ORDER BY (${duckCos("e.embedding", "q.embedding")} + 1.0e0) / 2.0e0 DESC, e.vec_id ASC
          LIMIT 10""",
    "vec_similar_docs" ->
      s"""SELECT e.label,
            round(MAX((${duckCos("e.embedding", "q.embedding")} + 1.0e0) / 2.0e0), 6) AS best_score,
            COUNT(*) AS n_chunks
          FROM embeddings e,
               (SELECT embedding, label FROM embeddings WHERE vec_id = 7) q
          WHERE e.vec_id <> 7 AND e.label <> q.label
          GROUP BY e.label
          ORDER BY MAX((${duckCos("e.embedding", "q.embedding")} + 1.0e0) / 2.0e0) DESC, e.label ASC
          LIMIT 5""",
    "vec_topk_singlepass" ->
      s"""SELECT CAST(ROW_NUMBER() OVER (ORDER BY score DESC, vec_id ASC) AS INT) AS rank,
                 vec_id, score
          FROM (
            SELECT e.vec_id,
                   round((${duckCos("e.embedding", "q.embedding")} + 1.0e0) / 2.0e0, 6) AS score
            FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 4) q)
          ORDER BY score DESC, vec_id ASC LIMIT 10""",
    "vec_label_counts" ->
      """SELECT label, COUNT(*) AS n_vectors,
         round(CAST(SUM(CAST(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*), 6) AS avg_norm
         FROM embeddings GROUP BY label""")
}
