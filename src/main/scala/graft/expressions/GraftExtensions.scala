package graft.expressions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.Bridge

/** SQL surface for the engine's native expressions.
  *
  * Two registration paths:
  *  - `SparkSession.builder().withExtensions(new GraftExtensions)` (or
  *    `spark.sql.extensions=graft.expressions.GraftExtensions`) injects the
  *    functions at session build time;
  *  - `GraftExtensions.register(spark)` adds them to a live session.
  *
  * After either, `spark.sql("SELECT graft_cosine(a, b) ...")` plans the
  * codegen CosineSimilarityExpr directly — no UDF indirection.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
}

object GraftExtensions {

  private def f(name: String, usage: String, builder: Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo("graft.expressions", name, usage),
      builder)

  /** Column-tree function: the SQL name plans the same catalyst tree the
    * Scala API builds (functions.* nodes — codegen'd, no UDF boundary),
    * bridged child-Expressions → Columns → result-Expression. */
  private def colFn(name: String, usage: String, arity: Int,
                    build: Seq[Column] => Column) =
    f(name, usage, exprs => {
      if (exprs.length != arity)
        throw new IllegalArgumentException(
          s"$name takes $arity argument(s), got ${exprs.length}")
      Bridge.convertedExpression(build(exprs.map(Bridge.column)))
    })

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    f("graft_cosine", "graft_cosine(a, b) - cosine similarity of two float arrays",
      exprs => CosineSimilarityExpr(exprs(0), exprs(1))),
    f("graft_chunk",
      "graft_chunk(doc_id, text[, chunk_size, overlap]) - LATERAL VIEW table " +
        "generator emitting (chunk_id, content, chunk_index, word_count, " +
        "start_char, end_char) chunk rows; defaults 1000/200",
      exprs => ChunkGenerator(exprs)),
    // text-analysis surface: the full north-star scalar kernel set is
    // callable from pure spark.sql, same trees as the Scala API
    colFn("graft_word_count", "graft_word_count(text) - whitespace token count", 1,
      cols => graft.functions.TextFunctions.wordCount(cols(0))),
    colFn("graft_token_estimate",
      "graft_token_estimate(text) - ~len/4 LLM token estimate", 1,
      cols => graft.functions.TextFunctions.tokenEstimate(cols(0))),
    colFn("graft_bpe_tokens",
      "graft_bpe_tokens(text) - GPT-style pre-tokenizer regex token count", 1,
      cols => graft.operators.TextAnalysis.bpeIshTokens(cols(0))),
    colFn("graft_lang",
      "graft_lang(text) - stopword-vote language ID, returns struct(lang, votes)", 1,
      cols => graft.operators.TextAnalysis.detectLanguage(cols(0))),
    colFn("graft_fingerprint",
      "graft_fingerprint(text) - bottom-4 rolling 8-char-shingle document fingerprint", 1,
      cols => graft.operators.TextAnalysis.fingerprint(cols(0))),
    colFn("graft_clean",
      "graft_clean(text) - reference content cleaning (tags, entities, boilerplate)", 1,
      cols => graft.functions.TextFunctions.cleanContent(cols(0))),
    colFn("graft_quality",
      "graft_quality(content, title, url) - reference 5-part quality score", 3,
      cols => graft.functions.TextFunctions.qualityScore(cols(0), cols(1), cols(2))),
    colFn("graft_intent",
      "graft_intent(query) - reference query intent classification", 1,
      cols => graft.functions.TextFunctions.queryIntent(cols(0))),
    colFn("graft_repetition",
      "graft_repetition(text) - Gopher repetition signals, returns " +
        "struct(dup_word_frac, dup_3gram_frac)", 1,
      cols => graft.operators.TextAnalysis.repetitionScores(cols(0))),
    colFn("graft_pii",
      "graft_pii(text) - PII screen, returns struct(n_emails, n_ips, n_phones)", 1,
      cols => graft.operators.TextAnalysis.piiCounts(cols(0))),
    colFn("graft_redact_pii",
      "graft_redact_pii(text) - mask emails/IPv4s/phones as [EMAIL]/[IP]/[PHONE]", 1,
      cols => graft.operators.TextAnalysis.redactPii(cols(0))),
    colFn("graft_slack",
      "graft_slack(markdown) - reference markdown-to-Slack-mrkdwn rewrite", 1,
      cols => graft.functions.TextFunctions.markdownToSlack(cols(0))),
    colFn("graft_html_text",
      "graft_html_text(html) - HTML to LLM-friendly plain text (boilerplate strip)", 1,
      cols => graft.functions.TextFunctions.htmlToText(cols(0))))

  /** Register on an existing session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
