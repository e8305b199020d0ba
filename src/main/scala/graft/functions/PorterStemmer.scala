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
  * (TextSearch.tokens note) for callers that opt in. Not SQL-expressible,
  * so stemmed rows are golden-pinned rather than oracle-checked.
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

  private def step2(s: String): String = firstOf(s, Seq(
    ("ational", "ate", mGt0), ("tional", "tion", mGt0), ("enci", "ence", mGt0),
    ("anci", "ance", mGt0), ("izer", "ize", mGt0), ("abli", "able", mGt0),
    ("alli", "al", mGt0), ("entli", "ent", mGt0), ("eli", "e", mGt0),
    ("ousli", "ous", mGt0), ("ization", "ize", mGt0), ("ation", "ate", mGt0),
    ("ator", "ate", mGt0), ("alism", "al", mGt0), ("iveness", "ive", mGt0),
    ("fulness", "ful", mGt0), ("ousness", "ous", mGt0), ("aliti", "al", mGt0),
    ("iviti", "ive", mGt0), ("biliti", "ble", mGt0)))

  private def step3(s: String): String = firstOf(s, Seq(
    ("icate", "ic", mGt0), ("ative", "", mGt0), ("alize", "al", mGt0),
    ("iciti", "ic", mGt0), ("ical", "ic", mGt0), ("ful", "", mGt0),
    ("ness", "", mGt0)))

  private def step4(s: String): String = {
    val mGt1: String => Boolean = stem => m(stem) > 1
    firstOf(s, Seq(
      ("ement", "", mGt1), ("ance", "", mGt1), ("ence", "", mGt1),
      ("able", "", mGt1), ("ible", "", mGt1), ("ment", "", mGt1),
      ("ant", "", mGt1), ("ent", "", mGt1),
      ("ion", "", stem => m(stem) > 1 && stem.nonEmpty && "st".contains(stem.last)),
      ("ism", "", mGt1), ("ate", "", mGt1), ("iti", "", mGt1),
      ("ous", "", mGt1), ("ive", "", mGt1), ("ize", "", mGt1),
      ("ou", "", mGt1), ("al", "", mGt1), ("er", "", mGt1), ("ic", "", mGt1)))
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
