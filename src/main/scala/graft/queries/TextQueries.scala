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

    // Term-level corpus stats: document frequency of each query term.
    "txt_term_docfreq" -> ((s, dir) => {
      import s.implicits._
      TextSearch.termTable(Tables.documents(s, dir), "doc_id", "text")
        .filter($"term".isin(QueryTerms: _*))
        .groupBy($"term")
        .agg(countDistinct($"doc_id").as("doc_freq"),
             count(lit(1)).as("total_occurrences"))
    }))

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

  val oracle: Map[String, String] = Map(
    "txt_bm25_scores" -> duckBm25,
    "txt_bm25_top10" ->
      s"""SELECT doc_id, text_score FROM ($duckBm25)
          ORDER BY text_score DESC, doc_id ASC LIMIT 10""",
    "txt_term_docfreq" ->
      s"""SELECT term, COUNT(DISTINCT doc_id) AS doc_freq, COUNT(*) AS total_occurrences
          FROM ($duckTokens) WHERE term IN ('spark', 'join', 'vector') GROUP BY term""")
}
