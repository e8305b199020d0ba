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

  /** Recursive-CTE replay of the BPE encoder under a fixed merge table
    * (Spark twin: operators.Bpe.tokensScala): WITH-less fragment — prepend
    * WITH RECURSIVE — defining `m` (rank, ' l r ', ' lr '), `dw` (distinct
    * corpus words), `st` (one leftmost-occurrence splice per step, lowest
    * applicable rank first — provably the kernel's merge-all order, see
    * Bpe's scaladoc), `enc` (fixpoint state per word) and
    * `wtok(w, n)` — per-word BPE token counts. Symbols are [a-z0-9]+ by
    * the words() tokenization, so embedding them as SQL literals is safe.
    * Encoding runs once per DISTINCT word — vocabulary-shaped, exactly
    * like the kernel's memo. */
  def bpeWordTokenCtes(merges: Seq[(String, String)],
                       srcRel: String = "documents"): String = {
    val values = merges.zipWithIndex
      .map { case ((l, r), i) => s"(${i + 1}, ' $l $r ', ' $l$r ')" }
      .mkString(", ")
    // `srcRel` must be the SAME relation the per-doc counts are later
    // taken over: an inner join against a word set built from a different
    // text (e.g. unscrubbed documents under a scrubbed count) would
    // silently DROP any word the transform introduced, undercounting
    // instead of failing parity
    s"""m(rank, pat, rep) AS (VALUES $values),
        dw AS (SELECT DISTINCT unnest(${words("text")}) AS w FROM $srcRel),
        st AS (
          SELECT w, ' ' || array_to_string(
              list_transform(range(1, length(w) + 1), i -> w[i]), ' ') || ' ' AS s,
            0 AS it
          FROM dw
          UNION ALL
          SELECT st.w,
            substr(st.s, 1, b.p - 1) || b.rep || substr(st.s, b.p + length(b.pat)),
            st.it + 1
          FROM st, LATERAL (
            SELECT m.pat AS pat, m.rep AS rep, position(m.pat IN st.s) AS p
            FROM m WHERE position(m.pat IN st.s) > 0
            ORDER BY m.rank LIMIT 1) b),
        enc AS (SELECT w, s FROM (
          SELECT w, s, it, row_number() OVER (PARTITION BY w ORDER BY it DESC) AS rn
          FROM st) WHERE rn = 1),
        wtok AS (SELECT w, len(string_split_regex(trim(s), '\\s+')) AS n FROM enc)"""
  }

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
