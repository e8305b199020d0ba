package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines (builder north star): language
  * identification, token counting, rolling-hash fingerprinting, and
  * length/punct/stopword quality ratios. All pure Column expression trees —
  * codegen'd, shuffle-free, linear in input splits.
  */
object TextAnalysis {

  /** Function-word profiles for the stopword-voting language heuristic.
    * Deliberately tiny: language ID at corpus scale is a frequency vote, and
    * ties must break deterministically (profile order below). */
  val LanguageProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "no"),
    "de" -> Seq("der", "die", "und", "das", "nicht", "von", "sie", "ist", "ein", "zu"),
    "fr" -> Seq("le", "les", "des", "et", "une", "du", "dans", "est", "pour", "au"),
    "zh" -> Seq("de0", "shi0", "bu0", "le0", "zai0")) // romanized placeholders

  private def langScore(wordsCol: Column, profile: Seq[String]): Column =
    size(filter(wordsCol, w => w.isInCollection(profile)))

  /** public, not private: codegen reads the struct via accessor methods and
    * silently falls back to the interpreted path when it can't reach them */
  case class LangVote(lang: String, votes: Int)

  /** Compiled vote kernel: one pass over the token array with hash-set
    * profile lookups. The Column-tree form ran `filter(w, isInCollection)`
    * once per profile — five INTERPRETED higher-order passes per row (HOFs
    * don't codegen), the dominant cost of the lang queries at bench scale.
    * Same contract as the tree form bit for bit: occurrence counts, max
    * wins, ties break in profile order, zero matches → "und". */
  private val voteUdf = {
    val profiles = LanguageProfiles.map { case (lang, ws) => (lang, ws.toSet) }
    udf { (w: Seq[String]) =>
      if (w == null) null // null text → null struct, as the tree form had it
      else {
      var bestLang = "und"
      var bestVotes = 0
      for ((lang, prof) <- profiles) {
        var votes = 0
        val it = w.iterator
        while (it.hasNext) if (prof.contains(it.next())) votes += 1
        if (votes > bestVotes) { bestLang = lang; bestVotes = votes }
      }
      LangVote(bestLang, bestVotes)
      }
    }
  }

  /** Language-ID by stopword vote: most-matching profile wins, ties break in
    * profile order, zero matches → "und". Returns struct(lang, votes). */
  def detectLanguage(textCol: Column): Column =
    voteUdf(TextSearch.tokens(textCol))

  /** Whitespace token count (= word count). */
  def whitespaceTokens(c: Column): Column = graft.functions.TextFunctions.wordCount(c)

  /** BPE-ish token count: a GPT-style pre-tokenizer regex, RE2-compatible
    * (no lookahead — usable in SQL oracles): optional leading space + letter
    * run | digit run | other-symbol run. */
  val BpeIshPattern = " ?[a-zA-Z]+| ?[0-9]+| ?[^ a-zA-Z0-9]+"

  def bpeIshTokens(c: Column): Column =
    size(regexp_extract_all(c, lit(BpeIshPattern), lit(0)))

  /** Char-level rolling-shingle fingerprint: bottom-`k` sketch of the 60-bit
    * hashes of all `width`-char shingles — a winnowing-style document
    * signature usable for containment/near-dup at corpus scale. */
  def fingerprint(c: Column, width: Int = 8, k: Int = 4): Column = {
    val shingleHashes = transform(
      sequence(lit(1), greatest(length(c) - (width - 1), lit(1))),
      i => Dedup.md5Hash60(c.substr(i, lit(width)), lit(0)))
    array_join(transform(slice(array_sort(shingleHashes), 1, k),
      x => x.cast("string")), ",")
  }

  /** Quality ratios: stopword ratio (en profile), punctuation ratio, alpha
    * ratio, mean word length — the cheap corpus-quality screens. */
  def qualityRatios(c: Column): Column = {
    val w = TextSearch.tokens(c)
    val nWords = size(w)
    val nStop = langScore(w, LanguageProfiles.head._2)
    val nPunct = size(regexp_extract_all(c, lit("[^a-zA-Z0-9\\s]"), lit(0)))
    val nAlpha = size(regexp_extract_all(c, lit("[a-zA-Z]"), lit(0)))
    // mean TOKEN length — numeric tokens included (alpha-char count would
    // understate digit-bearing text)
    val tokenChars = aggregate(transform(w, t => length(t)), lit(0), (acc, x) => acc + x)
    struct(
      when(nWords === 0, lit(0.0)).otherwise(nStop.cast("double") / nWords).as("stopword_ratio"),
      when(length(c) === 0, lit(0.0)).otherwise(nPunct.cast("double") / length(c)).as("punct_ratio"),
      when(length(c) === 0, lit(0.0)).otherwise(nAlpha.cast("double") / length(c)).as("alpha_ratio"),
      when(nWords === 0, lit(0.0))
        .otherwise(tokenChars.cast("double") / nWords).as("mean_word_len"))
  }

  /** Gopher-style repetition signals: the fraction of duplicated words and
    * duplicated word 3-grams in a document — the boilerplate/loop detector
    * (Rae et al., Gopher appendix A; RefinedWeb applies the same family).
    * Pure codegen Column tree, shuffle-free. A doc under 3 words has one
    * whole-string "3-gram", so its 3-gram fraction is 0 by construction. */
  def repetitionScores(c: Column): Column = {
    val w = TextSearch.tokens(c)
    val nWords = size(w)
    val n3 = greatest(nWords - 2, lit(1))
    struct(
      when(nWords === 0, lit(0.0))
        .otherwise(lit(1.0) - size(array_distinct(w)).cast("double") / nWords)
        .as("dup_word_frac"),
      when(nWords === 0, lit(0.0))
        .otherwise(lit(1.0) - size(Dedup.shingles(c, 3)).cast("double") / n3)
        .as("dup_3gram_frac"))
  }
}
