package graft.functions

/** Porter stemmer — the classic 1980 suffix-stripping algorithm (Porter,
  * "An algorithm for suffix stripping", Program 14(3); the de-facto English
  * stemmer behind Lucene's PorterStemFilter). Implemented from the published
  * algorithm: words are measured in VC (vowel-consonant) runs, and five
  * ordered rule steps strip or rewrite suffixes gated on that measure.
  * Deterministic and pure — safe inside a distributed analyzer.
  *
  * This backs [[graft.operators.TextSearch.stemmedTokens]], the third
  * pluggable BM25 analyzer (alongside the standard regex analyzer and any
  * caller-supplied one): "searching"/"searched"/"searches" all land on
  * "search", closing the stemming half of the documented Lucene divergence
  * (TextSearch.tokens note) for callers that opt in.
  *
  * SQL-expressible after all: [[graft.queries.DuckSql.porterStemCtes]]
  * replays the whole cascade in pure DuckDB SQL (CV pattern via three
  * regexp_replace passes — prefix-stable, so every measure/condition on a
  * candidate stem is a prefix read of one per-stage pattern column), built
  * from the SAME rule tables below. `txt_porter_stems` oracle-checks the
  * two implementations word for word over a rule-coverage matrix, and
  * `txt_bm25_stemmed` oracle-checks the stemmed BM25 pipeline end to end.
  */
object PorterStemmer {

  /** Stem one lowercase token. Tokens of length ≤ 2 are returned as-is
    * (the algorithm's own guard: nothing shorter has a strippable suffix). */
  def stem(word: String): String = {
    if (word == null || word.length <= 2) return word
    step5(step4(step3(step2(step1c(step1b(step1a(word)))))))
  }

  private def isVowel(s: String, i: Int): Boolean = s.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => true
    case 'y' => i > 0 && !isVowel(s, i - 1) // y is vocalic after a consonant
    case _ => false
  }

  /** The measure m: number of VC sequences in `s`. */
  private def m(s: String): Int = {
    val len = s.length
    var i = 0
    var n = 0
    while (i < len && !isVowel(s, i)) i += 1
    while (i < len) {
      while (i < len && isVowel(s, i)) i += 1
      if (i < len) {
        n += 1
        while (i < len && !isVowel(s, i)) i += 1
      }
    }
    n
  }

  private def hasVowel(s: String): Boolean = s.indices.exists(isVowel(s, _))

  private def endsDoubleC(s: String): Boolean =
    s.length >= 2 && s.charAt(s.length - 1) == s.charAt(s.length - 2) &&
      !isVowel(s, s.length - 1)

  /** *o: stem ends consonant-vowel-consonant, final consonant not w/x/y. */
  private def cvc(s: String): Boolean =
    s.length >= 3 && !isVowel(s, s.length - 3) && isVowel(s, s.length - 2) &&
      !isVowel(s, s.length - 1) && !"wxy".contains(s.charAt(s.length - 1))

  /** Replace `suffix` with `repl` if the remaining stem satisfies `cond`. */
  private def replace(s: String, suffix: String, repl: String,
                      cond: String => Boolean): Option[String] =
    if (s.endsWith(suffix)) {
      val stem = s.substring(0, s.length - suffix.length)
      if (cond(stem)) Some(stem + repl) else Some(s) // suffix matched: rule consumed either way
    } else None

  /** First Some wins — the algorithm's "longest matching suffix" contract,
    * encoded by listing longer suffixes first. */
  private def firstOf(s: String, rules: Seq[(String, String, String => Boolean)]): String =
    rules.iterator.flatMap { case (suf, rep, cond) => replace(s, suf, rep, cond) }
      .nextOption().getOrElse(s)

  private val always: String => Boolean = _ => true

  private def step1a(s: String): String = firstOf(s, Seq(
    ("sses", "ss", always), ("ies", "i", always), ("ss", "ss", always), ("s", "", always)))

  private def step1b(s: String): String = {
    replace(s, "eed", "ee", stem => m(stem) > 0) match {
      case Some(r) => r
      case None =>
        val stripped =
          if (s.endsWith("ed") && hasVowel(s.dropRight(2))) Some(s.dropRight(2))
          else if (s.endsWith("ing") && hasVowel(s.dropRight(3))) Some(s.dropRight(3))
          else None
        stripped match {
          case None => s
          case Some(t) =>
            if (t.endsWith("at") || t.endsWith("bl") || t.endsWith("iz")) t + "e"
            else if (endsDoubleC(t) && !"lsz".contains(t.last)) t.dropRight(1)
            else if (m(t) == 1 && cvc(t)) t + "e"
            else t
        }
    }
  }

  private def step1c(s: String): String =
    if (s.endsWith("y") && hasVowel(s.dropRight(1))) s.dropRight(1) + "i" else s

  private def mGt0(stem: String): Boolean = m(stem) > 0

  /** Step-2/3/4 (suffix, replacement) tables in the algorithm's published
    * rule order (first match consumes). Shared with the SQL replay
    * (DuckSql.porterStemCtes) so the two implementations cannot drift. */
  private[graft] val Step2Rules: Seq[(String, String)] = Seq(
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"), ("abli", "able"),
    ("alli", "al"), ("entli", "ent"), ("eli", "e"),
    ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
    ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
    ("iviti", "ive"), ("biliti", "ble"))

  private[graft] val Step3Rules: Seq[(String, String)] = Seq(
    ("icate", "ic"), ("ative", ""), ("alize", "al"),
    ("iciti", "ic"), ("ical", "ic"), ("ful", ""), ("ness", ""))

  /** Step 4: all m>1, except "ion" which additionally requires the stem to
    * end in s/t (encoded in the SQL replay with the same special case). */
  private[graft] val Step4Rules: Seq[(String, String)] = Seq(
    ("ement", ""), ("ance", ""), ("ence", ""), ("able", ""), ("ible", ""),
    ("ment", ""), ("ant", ""), ("ent", ""), ("ion", ""), ("ism", ""),
    ("ate", ""), ("iti", ""), ("ous", ""), ("ive", ""), ("ize", ""),
    ("ou", ""), ("al", ""), ("er", ""), ("ic", ""))

  private def step2(s: String): String =
    firstOf(s, Step2Rules.map { case (suf, rep) => (suf, rep, mGt0) })

  private def step3(s: String): String =
    firstOf(s, Step3Rules.map { case (suf, rep) => (suf, rep, mGt0) })

  private def step4(s: String): String = {
    val mGt1: String => Boolean = stem => m(stem) > 1
    firstOf(s, Step4Rules.map {
      case ("ion", rep) =>
        ("ion", rep, (stem: String) =>
          m(stem) > 1 && stem.nonEmpty && "st".contains(stem.last))
      case (suf, rep) => (suf, rep, mGt1)
    })
  }

  private def step5(s: String): String = {
    // 5a: drop final e when the measure licenses it
    val a =
      if (s.endsWith("e")) {
        val stem = s.dropRight(1)
        val mm = m(stem)
        if (mm > 1 || (mm == 1 && !cvc(stem))) stem else s
      } else s
    // 5b: ...ll → ...l when m > 1 (measured on the whole word, as in the
    // reference C implementation)
    if (m(a) > 1 && a.endsWith("ll")) a.dropRight(1) else a
  }
}
