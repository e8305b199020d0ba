package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.TextSearch

/** Full-text search operator queries (SURVEY.md §2.7 X1): native BM25 over
  * the documents fixture, oracle-checked against an equivalent DuckDB CTE
  * program. Fixed query: "spark join vector" (all three terms are in the
  * fixture vocabulary). */
object TextQueries {

  private val QueryTerms = Seq("spark", "join", "vector")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Full BM25 score table for the query terms.
    "txt_bm25_scores" -> ((s, dir) =>
      TextSearch.bm25(Tables.documents(s, dir), QueryTerms)),

    // X1 search surface: top-10 by relevance, deterministic tie-break.
    "txt_bm25_top10" -> ((s, dir) =>
      TextSearch.search(Tables.documents(s, dir), "spark join vector", 10)),

    // X1 with the Porter-stemmed analyzer: same BM25 math, morphology
    // folded ("joins"/"joined"/"joining" all hit "join"). No oracle —
    // DuckDB has no stemmer — so the row is golden-pinned; TextSearchSpec
    // additionally asserts stemmed recall ⊇ standard recall on the fixture
    // query and top-10 overlap.
    "txt_bm25_stemmed" -> ((s, dir) =>
      TextSearch.bm25(Tables.documents(s, dir),
          TextSearch.stemQueryTerms("spark join vector"),
          analyzer = TextSearch.stemmedTokens)
        .orderBy(col("text_score").desc, col("doc_id").asc)
        .limit(10)),

    // Term-level corpus stats: document frequency of each query term.
    "txt_term_docfreq" -> ((s, dir) => {
      import s.implicits._
      TextSearch.termTable(Tables.documents(s, dir), "doc_id", "text")
        .filter($"term".isin(QueryTerms: _*))
        .groupBy($"term")
        .agg(countDistinct($"doc_id").as("doc_freq"),
             count(lit(1)).as("total_occurrences"))
    }))

  val oracle: Map[String, String] = Map(
    "txt_bm25_scores" -> DuckSql.bm25,
    "txt_bm25_top10" ->
      s"""SELECT doc_id, text_score FROM (${DuckSql.bm25})
          ORDER BY text_score DESC, doc_id ASC LIMIT 10""",
    "txt_term_docfreq" ->
      s"""SELECT term, COUNT(DISTINCT doc_id) AS doc_freq, COUNT(*) AS total_occurrences
          FROM (SELECT doc_id, unnest(${DuckSql.words("text")}) AS term FROM documents)
          WHERE term IN ('spark', 'join', 'vector') GROUP BY term""")
}
