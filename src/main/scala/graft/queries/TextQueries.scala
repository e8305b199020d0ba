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

  /** Suffix battery for the stemmer rule-coverage matrix: appended to every
    * fixture word (both sides build the same cross product), it exercises
    * every Porter rule family — plurals, ed/ing with the double-consonant
    * and cvc+e rewrites, the full step-2/3/4 suffix tables, and the step-5
    * e/ll finals. Shared between the Spark query and the oracle SQL so the
    * matrix cannot drift. */
  private[graft] val StemSuffixes: Seq[String] = Seq(
    "", "s", "es", "ies", "sses", "ss", "eed", "ed", "ing", "y",
    "ational", "tional", "enci", "anci", "izer", "abli", "alli", "entli",
    "eli", "ousli", "ization", "ation", "ator", "alism", "iveness",
    "fulness", "ousness", "aliti", "iviti", "biliti",
    "icate", "ative", "alize", "iciti", "ical", "ful", "ness",
    "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent",
    "ion", "ions", "ism", "ate", "iti", "ous", "ive", "ize", "ou",
    "al", "er", "ers", "ic", "ll", "e", "ality", "ally", "icity", "ility")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Full BM25 score table for the query terms.
    "txt_bm25_scores" -> ((s, dir) =>
      TextSearch.bm25(Tables.documents(s, dir), QueryTerms)),

    // X1 search surface: top-10 by relevance, deterministic tie-break.
    "txt_bm25_top10" -> ((s, dir) =>
      TextSearch.search(Tables.documents(s, dir), "spark join vector", 10)),

    // X1 with the Porter-stemmed analyzer: same BM25 math, morphology
    // folded ("joins"/"joined"/"joining" all hit "join"). Oracle-checked:
    // DuckSql.porterStemCtes replays the stemmer cascade in pure SQL, so
    // the whole stemmed pipeline — analyzer included — is compared against
    // DuckDB bit for bit (it was golden-only before round 19).
    // TextSearchSpec additionally asserts stemmed recall ⊇ standard recall
    // on the fixture query and top-10 overlap.
    "txt_bm25_stemmed" -> ((s, dir) =>
      TextSearch.bm25(Tables.documents(s, dir),
          TextSearch.stemQueryTerms("spark join vector"),
          analyzer = TextSearch.stemmedTokens)
        .orderBy(col("text_score").desc, col("doc_id").asc)
        .limit(10)),

    // Stemmer rule-coverage matrix: every fixture word × the suffix
    // battery, stemmed by the Scala kernel (Spark side) and the pure-SQL
    // replay (oracle side) — pins the two implementations word for word on
    // ~1.9k forms covering every rule family, every round. The matrix is
    // derived from the shared parquet (fixture vocabulary) so the driver's
    // same-tables contract holds.
    "txt_porter_stems" -> ((s, dir) => {
      import s.implicits._
      val stemUdf = udf((w: String) => graft.functions.PorterStemmer.stem(w))
      val base = Tables.documents(s, dir)
        .select(explode(TextSearch.tokens($"text")).as("w")).distinct()
      val sufs = StemSuffixes.toDF("suf")
      base.crossJoin(broadcast(sufs))
        .select(concat($"w", $"suf").as("word")).distinct()
        .withColumn("stem", stemUdf($"word"))
    }),

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
    "txt_bm25_stemmed" ->
      s"""SELECT doc_id, text_score
          FROM (${DuckSql.bm25Stemmed(TextSearch.stemQueryTerms("spark join vector"))})
          ORDER BY text_score DESC, doc_id ASC LIMIT 10""",
    "txt_porter_stems" -> {
      val sufVals = StemSuffixes.map(s => s"('$s')").mkString(", ")
      s"""WITH base AS (SELECT DISTINCT unnest(${DuckSql.words("text")}) AS w FROM documents),
          sufs(suf) AS (VALUES $sufVals),
          pw AS (SELECT DISTINCT b.w || sufs.suf AS w FROM base b CROSS JOIN sufs),
          ${DuckSql.porterStemCtes("pw")}
          SELECT w AS word, stem FROM stems"""
    },
    "txt_term_docfreq" ->
      s"""SELECT term, COUNT(DISTINCT doc_id) AS doc_freq, COUNT(*) AS total_occurrences
          FROM (SELECT doc_id, unnest(${DuckSql.words("text")}) AS term FROM documents)
          WHERE term IN ('spark', 'join', 'vector') GROUP BY term""")
}
