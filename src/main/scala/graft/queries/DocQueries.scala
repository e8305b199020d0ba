package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Document-pipeline scalar operators (SURVEY.md §2.2 P5/P7/P9, §2.7 X2/X4,
  * §2.8 F1-F10) registered as oracle-checked queries over the `documents`
  * fixture. All are single-pass narrow transformations — no shuffle, fully
  * codegen'd, scale linearly with input splits.
  */
object DocQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // F1 content cleaning.
    "doc_clean" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select($"doc_id", cleanContent($"text").as("clean_text"))
    }),

    // F3 word count + F5 token estimate.
    "doc_word_tokens" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select($"doc_id",
          wordCount($"text").as("word_count"),
          tokenEstimate($"text").as("token_estimate"))
    }),

    // F2 quality score (title/url absent in the fixture schema → null branches).
    "doc_quality_scores" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select($"doc_id",
          round(qualityScore($"text", lit(null).cast("string"), lit(null).cast("string")), 6)
            .as("quality_score"))
    }),

    // P5 quality filter (rag_pipeline.py:46-68; threshold is a parameter,
    // reference default 0.5 — 0.25 here so the fixture, whose plain-prose
    // docs top out near 0.35, yields a non-trivial survivor set).
    "doc_quality_filter" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .withColumn("q", qualityScore($"text", lit(null).cast("string"), lit(null).cast("string")))
        .filter($"q".isNull || $"q" >= 0.25)
        .select($"doc_id", $"lang", $"source")
    }),

    // P7/P9 min-length + non-empty guard (python-strip semantics).
    "doc_minlen_filter" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .filter(length(pyStrip($"text")) >= 50)
        .select($"doc_id", $"n_chars")
    }),

    // F4 md5 chunk-id derivation (idx 0 — the id of a document's first chunk).
    "doc_chunk_ids" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select($"doc_id", chunkId($"doc_id", lit(0), $"text").as("chunk_id"))
    }),

    // X2 intent classification applied to document text (X4 normalization is
    // a no-op on the single-spaced fixture; exercised in unit tests instead).
    "doc_intent" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select($"doc_id", queryIntent($"text").as("intent"))
    }),

    // F6 URL extraction: the fixture prose has no URLs, so each doc gets a
    // synthetic markdown link + bare URL appended IN the query — extraction,
    // punctuation-stripping, and dedup then run on real non-empty input.
    "doc_url_extract" -> ((s, dir) => {
      import s.implicits._
      val withUrls = Tables.documents(s, dir).select($"doc_id",
        concat($"text",
          lit(" see [ref](https://docs.example.org/d"), ($"doc_id" % 7).cast("string"),
          lit(") or https://mirror"), ($"doc_id" % 3).cast("string"),
          lit(".example.com/x.")).as("text"))
      withUrls.select($"doc_id", explode(extractUrls($"text")).as("url"))
    }),

    // F8 markdown→Slack rewrite: the fixture prose has no markdown, so each
    // doc gets a deterministic preamble (mention token, ATX header, bold,
    // markdown link, bare parenthesized URL) built IN the query — the
    // reference's four rewrite rules plus the inbound mention strip then all
    // fire on real input (slack_bot.py:170-188).
    "doc_slack_format" -> ((s, dir) => {
      import s.implicits._
      val md = concat(
        lit("<@U"), (($"doc_id" % 90) + 10).cast("string"), lit("AB> # Doc "),
        $"doc_id".cast("string"),
        lit("\n**"), $"source", lit("** see [spec](https://spec.example.org/p"),
        ($"doc_id" % 7).cast("string"),
        lit(") and raw (https://raw.example.net/r"), ($"doc_id" % 5).cast("string"),
        lit(")\n"), substring($"text", 1, 60))
      Tables.documents(s, dir)
        .select($"doc_id", markdownToSlack(stripMention(md)).as("slack_text"))
    }),

    // S4 decode half: HTML → plain text. Each doc is wrapped IN the query in
    // a deterministic page shell (head/title/style, comment, header, script,
    // list, entities) so every strip rule fires on real input; the engine
    // half of web crawling minus the network fetch (web_crawler.py:100-101).
    "doc_html_text" -> ((s, dir) => {
      import s.implicits._
      val html = concat(
        lit("<html><head><title>skip</title><style>p{color:red}</style></head>" +
          "<body><!-- note "), ($"doc_id" % 11).cast("string"),
        lit(" --><h1>Doc "), $"doc_id".cast("string"),
        lit("</h1><p>"), substring($"text", 1, 80),
        lit(" &amp; more &lt;tag&gt; &quot;q&quot;&nbsp;end</p>" +
          "<script>var x = 1;</script><ul><li>item a</li><li>item b</li></ul>" +
          "</body></html>"))
      Tables.documents(s, dir)
        .select($"doc_id", htmlToText(html).as("plain_text"))
    }),

    // A6 collection stats: per-source doc counts + word totals.
    "doc_source_stats" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
             sum(wordCount($"text").cast("long")).as("total_words"),
             sum($"n_chars").as("total_chars"))
    }),

    // A6 variant: per-language distribution.
    "doc_lang_stats" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"),
             max($"n_chars").as("max_chars"),
             min($"n_chars").as("min_chars"))
    }))

  /** Python-str.strip() in DuckDB SQL: DuckDB's trim() only strips spaces. */
  private def strip(e: String): String = DuckSql.strip(e)

  /** DuckDB needs the 'g' flag to replace all matches (Spark/Python replace
    * all by default) and e0-suffixed literals to force double arithmetic.
    * The clean fragment moved to DuckSql.clean — it is shared with the
    * chunk-replay oracles (featurePipeline chunks the CLEANED text).
    * NOTE: tags and entities are two reference rewrites; combined with |
    * there — equivalent because the replacement is deletion for both. */
  private val duckClean = DuckSql.clean("text")

  private def duckWcOf(expr: String) = DuckSql.wc(expr)

  private val duckWc = duckWcOf("text")

  /** Quality score in DuckDB SQL, mirroring TextFunctions.qualityScore with
    * null title/url (→ structure title term 0, credibility 0.5). */
  private val duckQuality = DuckSql.quality

  private val duckIntent =
    """CASE
       WHEN lower(text) LIKE '%api%' OR lower(text) LIKE '%code%' OR lower(text) LIKE '%function%'
            OR lower(text) LIKE '%class%' OR lower(text) LIKE '%implement%' THEN 'technical'
       WHEN lower(text) LIKE '%how to%' OR lower(text) LIKE '%how do%' OR lower(text) LIKE '%steps%'
            OR lower(text) LIKE '%tutorial%' THEN 'how-to'
       WHEN lower(text) LIKE '%error%' OR lower(text) LIKE '%problem%' OR lower(text) LIKE '%issue%'
            OR lower(text) LIKE '%fix%' OR lower(text) LIKE '%debug%' THEN 'problem-solving'
       WHEN lower(text) LIKE '%what is%' OR lower(text) LIKE '%explain%' OR lower(text) LIKE '%concept%'
            OR lower(text) LIKE '%theory%' THEN 'conceptual'
       ELSE 'general' END"""

  val oracle: Map[String, String] = Map(
    "doc_clean" ->
      s"SELECT doc_id, $duckClean AS clean_text FROM documents",
    "doc_word_tokens" ->
      s"SELECT doc_id, CAST($duckWc AS INTEGER) AS word_count, CAST(length(text) // 4 AS BIGINT) AS token_estimate FROM documents",
    "doc_quality_scores" ->
      s"SELECT doc_id, round($duckQuality, 6) AS quality_score FROM documents",
    "doc_quality_filter" ->
      s"SELECT doc_id, lang, source FROM documents WHERE $duckQuality >= 0.25e0",
    "doc_minlen_filter" ->
      ("SELECT doc_id, n_chars FROM documents WHERE length(" + strip("text") + ") >= 50"),
    "doc_url_extract" ->
      """WITH t AS (
           SELECT doc_id,
             text || ' see [ref](https://docs.example.org/d' || (doc_id % 7)
                  || ') or https://mirror' || (doc_id % 3) || '.example.com/x.' AS text
           FROM documents)
         SELECT DISTINCT doc_id, url FROM (
           SELECT doc_id,
             regexp_replace(unnest(
               regexp_extract_all(text, '\[[^\]]+\]\(([^)]+)\)', 1)
               || regexp_extract_all(text, 'https?://[^\s\)\]]+')), '[.,;:!?]+$', '') AS url
           FROM t)
         WHERE url NOT LIKE '%notion.so%'""",
    "doc_slack_format" ->
      ("""WITH t AS (
           SELECT doc_id,
             '<@U' || (doc_id % 90 + 10) || 'AB> # Doc ' || doc_id || chr(10)
             || '**' || source || '** see [spec](https://spec.example.org/p' || (doc_id % 7)
             || ') and raw (https://raw.example.net/r' || (doc_id % 5) || ')' || chr(10)
             || substring(text, 1, 60) AS md
           FROM documents),
         m AS (SELECT doc_id, """ + strip("regexp_replace(md, '<@[A-Z0-9]+>', '', 'g')") + """ AS md FROM t)
         SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(md, '\[([^\]]+)\]\(([^)]+)\)', '<\2|\1>', 'g'),
                 '\*\*([^*]+)\*\*', '*\1*', 'g'),
               '(?m)^#{1,6}\s*(.+)$', '*\1*', 'g'),
             '\((https?://[^)]+)\)', '<\1>', 'g') AS slack_text
         FROM m"""),
    "doc_html_text" ->
      ("""WITH t AS (
           SELECT doc_id,
             '<html><head><title>skip</title><style>p{color:red}</style></head>'
             || '<body><!-- note ' || (doc_id % 11) || ' --><h1>Doc ' || doc_id
             || '</h1><p>' || substring(text, 1, 80)
             || ' &amp; more &lt;tag&gt; &quot;q&quot;&nbsp;end</p>'
             || '<script>var x = 1;</script><ul><li>item a</li><li>item b</li></ul>'
             || '</body></html>' AS html
           FROM documents),
         stripped AS (
           SELECT doc_id,
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(html, '(?is)<head[^>]*>.*?</head>', '', 'g'),
                       '(?is)<script[^>]*>.*?</script>', '', 'g'),
                     '(?is)<style[^>]*>.*?</style>', '', 'g'),
                   '(?s)<!--.*?-->', '', 'g'),
                 '(?i)<(?:br\s*/?|/p|/div|/li|/h[1-6]|/tr|/table|/ul|/ol)[^>]*>', chr(10), 'g'),
               '<[^>]+>', '', 'g') AS s
           FROM t),
         decoded AS (
           SELECT doc_id,
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(s, '&lt;', '<', 'g'),
                       '&gt;', '>', 'g'),
                     '&quot;', '"', 'g'),
                   '&#39;', '''', 'g'),
                 '&nbsp;', ' ', 'g'),
               '&amp;', '&', 'g') AS s
           FROM stripped)
         SELECT doc_id, """ + strip(
           """regexp_replace(
                regexp_replace(
                  regexp_replace(s, '[ \t]+', ' ', 'g'),
                  ' ?\n ?', chr(10), 'g'),
                '\n{3,}', chr(10)||chr(10), 'g')""") + """ AS plain_text
         FROM decoded"""),
    "doc_chunk_ids" ->
      "SELECT doc_id, md5(concat_ws('_', doc_id, 0, substring(text, 1, 100))) AS chunk_id FROM documents",
    "doc_intent" ->
      s"SELECT doc_id, $duckIntent AS intent FROM documents",
    "doc_source_stats" ->
      s"""SELECT source, COUNT(*) AS n_docs,
          CAST(SUM($duckWc) AS BIGINT) AS total_words,
          CAST(SUM(n_chars) AS BIGINT) AS total_chars
          FROM documents GROUP BY source""",
    "doc_lang_stats" ->
      """SELECT lang, COUNT(*) AS n_docs, MAX(n_chars) AS max_chars, MIN(n_chars) AS min_chars
         FROM documents GROUP BY lang""")
}
