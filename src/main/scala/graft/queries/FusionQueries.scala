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

  private def duckCos(a: String, b: String) =
    s"list_cosine_similarity(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[]))"

  private def duckKnnScored(vecId: Long) =
    s"""SELECT e.vec_id, (${duckCos("e.embedding", "q.embedding")} + 1.0e0) / 2.0e0 AS score
        FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = $vecId) q"""

  // BM25 over documents (identical to TextQueries.duckBm25 — corpus is 1:1)
  private val duckTokens =
    """SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
         t -> length(t) > 0)) AS term FROM documents"""

  private val duckBm25 =
    s"""WITH tokens AS ($duckTokens),
        doclen AS (SELECT doc_id, COUNT(*) AS dl FROM tokens GROUP BY doc_id),
        stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                         CAST(SUM(CAST(dl AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avgdl
                  FROM doclen),
        tf AS (SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf FROM tokens
               WHERE term IN ('spark', 'join', 'vector') GROUP BY doc_id, term),
        dfreq AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term)
        SELECT tf.doc_id AS doc_id,
          round(CAST(SUM(CAST(
            ln((n_docs - df + 0.5e0) / (df + 0.5e0) + 1.0e0)
              * (tf * (1.2e0 + 1.0e0))
              / (tf + 1.2e0 * (1.0e0 - 0.75e0 + 0.75e0 * dl / avgdl))
            AS DECIMAL(38,12))) AS DOUBLE), 6) AS text_score
        FROM tf JOIN dfreq USING(term) JOIN doclen USING(doc_id) CROSS JOIN stats
        GROUP BY tf.doc_id"""

  private val duckQuality: String = {
    def strip(e: String): String = "regexp_replace(" + e + ", '^\\s+|\\s+$', '', 'g')"
    def wc(e: String): String =
      "CASE WHEN " + strip(e) + " = '' THEN 0 ELSE len(string_split_regex(" + strip(e) + ", '\\s+')) END"
    s"""LEAST(1.0e0, GREATEST(0.0e0,
        (CASE WHEN ${wc("text")} > 100 THEN 0.2e0 * LEAST(1.0e0, ${wc("text")} / 1000.0e0) ELSE 0.0e0 END)
        + 0.15e0 * LEAST(1.0e0,
            (CASE WHEN len(regexp_extract_all(text, '(?m)^#{1,6}\\s+.+')) > 0 THEN 0.4e0 ELSE 0.0e0 END)
          + (CASE WHEN len(regexp_extract_all(text, '(?m)^\\s*[-*+]\\s+.+')) > 0 THEN 0.3e0 ELSE 0.0e0 END))
        + 0.25e0 * LEAST(1.0e0,
            len(regexp_extract_all(text, '(?m)^#{1,6}\\s+.+|^\\s*[-*+]\\s+.+|^\\s*\\d+\\.\\s+.+')) / 10.0e0)
        + 0.2e0 * GREATEST(0.0e0, 1.0e0 - ABS(
            (list_sum(list_transform(string_split_regex(text, '[.!?]+'),
               s -> ${wc("s")}))
             * 1.0e0 / len(string_split_regex(text, '[.!?]+'))) - 17.0e0) / 17.0e0)
        + 0.2e0 * 0.5e0))"""
  }

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
          SELECT round(COALESCE(MAX(score), 0.0e0) * 0.6e0 +
                       LEAST(COUNT(*) / 3.0e0, 1.0e0) * 0.2e0 +
                       LEAST(COUNT(DISTINCT source) / 2.0e0, 1.0e0) * 0.2e0, 6) AS confidence,
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
