package graft.queries

/** Shared DuckDB-oracle SQL fragments. Every fragment here has exactly one
  * Spark twin (named in the comment); fixing semantics means fixing BOTH
  * places — keeping each fragment single-sourced is what makes that a
  * 2-file change instead of a hunt. */
object DuckSql {

  /** Python-str.strip() (Spark twin: TextFunctions.pyStrip). */
  def strip(e: String): String =
    "regexp_replace(" + e + ", '^\\s+|\\s+$', '', 'g')"

  /** Python-str.split() word count (Spark twin: TextFunctions.wordCount). */
  def wc(e: String): String =
    "CASE WHEN " + strip(e) + " = '' THEN 0 ELSE len(string_split_regex(" +
      strip(e) + ", '\\s+')) END"

  /** Cosine over DOUBLE[] casts (Spark twin: VectorFunctions.cosineSimilarity). */
  def cos(a: String, b: String): String =
    s"list_cosine_similarity(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[]))"

  /** lucene-ish tokens (Spark twin: TextSearch.tokens). */
  def words(e: String): String =
    s"list_filter(string_split_regex(lower($e), '[^a-z0-9]+'), t -> length(t) > 0)"

  /** Quality score with null title/url branches (Spark twin:
    * TextFunctions.qualityScore). */
  val quality: String =
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

  /** BM25 of ('spark','join','vector') over `documents` (Spark twin:
    * TextSearch.bm25). Doc length / N / avgdl come from ALL documents —
    * including zero-token ones — matching Lucene docCount semantics. */
  val bm25: String =
    s"""WITH doclen AS (SELECT doc_id, len(${words("text")}) AS dl FROM documents),
        stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                         CAST(SUM(CAST(dl AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avgdl
                  FROM doclen),
        tokens AS (SELECT doc_id, unnest(${words("text")}) AS term FROM documents),
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
}
