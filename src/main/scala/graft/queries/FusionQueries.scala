package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions._
import graft.operators.{Attribution, Fusion}

/** Hybrid fusion / attribution / confidence / packing queries (SURVEY.md
  * §2.3 J1/J3, §2.4 A1-A5, §2.2 P8). Corpus for the hybrid paths =
  * documents ⋈ embeddings on doc_id=vec_id (the fixtures are 1:1 aligned),
  * standing in for the reference's chunks-with-embeddings collection.
  */
object FusionQueries {

  private def corpus(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).join(
      Tables.embeddings(s, dir),
      col("doc_id") === col("vec_id"))

  private def queryVec(s: SparkSession, dir: String, vecId: Long): Array[Float] =
    Tables.embeddings(s, dir).filter(col("vec_id") === vecId)
      .select("embedding").head.getSeq[Float](0).toArray

  private def knnScored(s: SparkSession, dir: String, vecId: Long): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    val q = emb.filter($"vec_id" === vecId).select($"embedding".as("qvec"))
    emb.crossJoin(broadcast(q))
      .withColumn("score", (cosineSimilarity($"embedding", $"qvec") + 1.0) / 2.0)
      .select($"vec_id", $"score")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // J3/A1/A2: hybrid union-merge with 0.7/0.3 blend.
    "fus_hybrid_top10" -> ((s, dir) => {
      import s.implicits._
      Fusion.hybridSearch(corpus(s, dir), queryVec(s, dir, 0L), "spark join vector",
          limit = 10, idCol = "doc_id", textCol = "text", embCol = "embedding")
        .select($"doc_id", round($"vector_score", 6).as("vector_score"),
          round($"text_score", 6).as("text_score"), round($"score", 6).as("score"))
    }),

    // A3: two-strategy weighted-average fusion (0.6 similarity / 0.4
    // parent_child shape, thresholds 0.55/0.5 on the fixture score scale).
    "fus_strategies" -> ((s, dir) => {
      import s.implicits._
      val simA = knnScored(s, dir, 0L).filter($"score" >= 0.55)
        .orderBy($"score".desc, $"vec_id".asc).limit(15)
      val simB = knnScored(s, dir, 1L).filter($"score" >= 0.5)
        .orderBy($"score".desc, $"vec_id".asc).limit(8)
      Fusion.fuseStrategies(
          Seq(Fusion.Strategy("similarity", 0.6, simA),
              Fusion.Strategy("parent_child", 0.4, simB)),
          maxResults = 15, idCol = "vec_id")
        .select($"vec_id", round($"score", 6).as("score"), $"strategies")
    }),

    // A4: confidence over an attributed result set.
    "fus_confidence" -> ((s, dir) => {
      import s.implicits._
      val top = knnScored(s, dir, 0L)
        .orderBy($"score".desc, $"vec_id".asc).limit(10)
      val attributed = Attribution.attachSources(
        top, Tables.documents(s, dir), "vec_id", "doc_id", Seq("lang", "source"))
      Fusion.confidence(attributed, "score", "source")
        .select(round($"confidence", 6).as("confidence"),
          round($"top_score", 6).as("top_score"), $"n_results", $"n_source_types")
    }),

    // J1: broadcast attribution join of KNN hits to their documents.
    "att_knn_sources" -> ((s, dir) => {
      import s.implicits._
      val top = knnScored(s, dir, 0L)
        .orderBy($"score".desc, $"vec_id".asc).limit(10)
      Attribution.attachSources(top, Tables.documents(s, dir),
          "vec_id", "doc_id", Seq("lang", "source"))
        .select($"vec_id", round($"score", 6).as("score"), $"lang", $"source")
    }),

    // A5: unique sources, first-wins by score within each source.
    "att_source_dedup" -> ((s, dir) => {
      import s.implicits._
      val top = knnScored(s, dir, 0L)
        .orderBy($"score".desc, $"vec_id".asc).limit(50)
      val attributed = Attribution.attachSources(
        top, Tables.documents(s, dir), "vec_id", "doc_id", Seq("source"))
      Attribution.dedupSources(attributed, "source", "score", "vec_id")
        .select($"source", $"vec_id", round($"score", 6).as("score"))
    }),

    // P8 window form: token-budget packing over quality-ranked documents.
    "pack_token_budget" -> ((s, dir) => {
      import s.implicits._
      import graft.functions.TextFunctions._
      val scored = Tables.documents(s, dir)
        .withColumn("score",
          qualityScore($"text", lit(null).cast("string"), lit(null).cast("string")))
      Attribution.packContextWindow(scored, maxTotalTokens = 2000, maxTokensPerDoc = 100,
          idCol = "doc_id", contentCol = "text", scoreCol = "score")
        .select($"doc_id", $"doc_tokens", $"cum_tokens")
    }))

  private def duckCos(a: String, b: String) = DuckSql.cos(a, b)

  private def duckKnnScored(vecId: Long) =
    s"""SELECT e.vec_id, (${duckCos("e.embedding", "q.embedding")} + 1.0e0) / 2.0e0 AS score
        FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = $vecId) q"""

  // BM25 over documents (corpus is 1:1 with embeddings, so document-table
  // stats equal joined-corpus stats)
  private val duckBm25 = DuckSql.bm25

  private val duckQuality: String = DuckSql.quality

  val oracle: Map[String, String] = Map(
    "fus_hybrid_top10" ->
      s"""WITH vec AS (
            SELECT vec_id AS doc_id, score AS vector_score, NULL::DOUBLE AS text_score
            FROM (${duckKnnScored(0)}) ORDER BY score DESC, vec_id ASC LIMIT 20),
          txt AS (
            SELECT doc_id, NULL::DOUBLE AS vector_score, text_score
            FROM ($duckBm25) ORDER BY text_score DESC, doc_id ASC LIMIT 20),
          merged AS (
            SELECT doc_id, MAX(vector_score) AS vector_score, MAX(text_score) AS text_score
            FROM (SELECT * FROM vec UNION ALL SELECT * FROM txt) GROUP BY doc_id)
          SELECT doc_id, round(vector_score, 6) AS vector_score,
                 round(text_score, 6) AS text_score,
                 round(COALESCE(vector_score, 0.0e0) * 0.7e0 + COALESCE(text_score, 0.0e0) * 0.3e0, 6) AS score
          FROM merged
          ORDER BY COALESCE(vector_score, 0.0e0) * 0.7e0 + COALESCE(text_score, 0.0e0) * 0.3e0 DESC,
                   doc_id ASC
          LIMIT 10""",
    "fus_strategies" ->
      s"""WITH simA AS (
            SELECT vec_id, score FROM (${duckKnnScored(0)})
            WHERE score >= 0.55e0 ORDER BY score DESC, vec_id ASC LIMIT 15),
          simB AS (
            SELECT vec_id, score FROM (${duckKnnScored(1)})
            WHERE score >= 0.5e0 ORDER BY score DESC, vec_id ASC LIMIT 8),
          tagged AS (
            SELECT vec_id, score, 'similarity' AS strategy, 0.6e0 AS weight FROM simA
            UNION ALL
            SELECT vec_id, score, 'parent_child' AS strategy, 0.4e0 AS weight FROM simB)
          SELECT vec_id,
            round(CAST(SUM(CAST(score * weight AS DECIMAL(38,12))) AS DOUBLE) /
                  CAST(SUM(CAST(weight AS DECIMAL(38,12))) AS DOUBLE), 6) AS score,
            array_to_string(list_sort(list(DISTINCT strategy)), ',') AS strategies
          FROM tagged GROUP BY vec_id
          ORDER BY CAST(SUM(CAST(score * weight AS DECIMAL(38,12))) AS DOUBLE) /
                   CAST(SUM(CAST(weight AS DECIMAL(38,12))) AS DOUBLE) DESC, vec_id ASC
          LIMIT 15""",
    "fus_confidence" ->
      s"""WITH top AS (
            SELECT vec_id, score FROM (${duckKnnScored(0)})
            ORDER BY score DESC, vec_id ASC LIMIT 10),
          att AS (SELECT t.vec_id, t.score, d.source FROM top t
                  LEFT JOIN documents d ON t.vec_id = d.doc_id)
          SELECT round(LEAST(1.0e0,
                       COALESCE(MAX(score), 0.0e0) * 0.6e0 +
                       LEAST(COUNT(*) / 3.0e0, 1.0e0) * 0.2e0 +
                       LEAST(COUNT(DISTINCT source) / 2.0e0, 1.0e0) * 0.2e0), 6) AS confidence,
                 round(MAX(score), 6) AS top_score,
                 COUNT(*) AS n_results,
                 COUNT(DISTINCT source) AS n_source_types
          FROM att""",
    "att_knn_sources" ->
      s"""SELECT t.vec_id, round(t.score, 6) AS score, d.lang, d.source
          FROM (SELECT vec_id, score FROM (${duckKnnScored(0)})
                ORDER BY score DESC, vec_id ASC LIMIT 10) t
          LEFT JOIN documents d ON t.vec_id = d.doc_id""",
    "att_source_dedup" ->
      s"""SELECT source, vec_id, round(score, 6) AS score FROM (
            SELECT d.source, t.vec_id, t.score,
                   ROW_NUMBER() OVER (PARTITION BY d.source ORDER BY t.score DESC, t.vec_id ASC) AS rn
            FROM (SELECT vec_id, score FROM (${duckKnnScored(0)})
                  ORDER BY score DESC, vec_id ASC LIMIT 50) t
            LEFT JOIN documents d ON t.vec_id = d.doc_id)
          WHERE rn = 1""",
    "pack_token_budget" ->
      s"""SELECT doc_id, doc_tokens, cum_tokens FROM (
            SELECT doc_id,
                   CAST(LEAST(length(text) // 4, 100) AS BIGINT) AS doc_tokens,
                   CAST(SUM(LEAST(length(text) // 4, 100)) OVER (
                     ORDER BY $duckQuality DESC, doc_id ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
            FROM documents)
          WHERE cum_tokens <= 2000""")
}
