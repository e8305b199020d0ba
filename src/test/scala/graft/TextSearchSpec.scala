package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PorterStemmer
import graft.operators.TextSearch

/** Validates the Porter-stemmed BM25 analyzer path (`txt_bm25_stemmed`):
  *
  *  1. [[PorterStemmer.stem]] against full-word vectors hand-derived from
  *     the published algorithm (Porter 1980, "An algorithm for suffix
  *     stripping") — each word traced through steps 1a..5b, covering every
  *     rule family including the interactions the per-step paper examples
  *     don't show (e.g. step-1b's AT→ATE restore feeding step-5a's e-drop:
  *     conflated→conflat; step-2's ATIONAL→ATE feeding step-5a:
  *     relational→relat).
  *  2. Analyzer recall on an inline corpus with inflected forms: stemmed
  *     BM25 matches the documents the standard analyzer matches PLUS the
  *     morphological variants, never fewer.
  *  3. The sf0.01 fixture: the fixture vocabulary has no inflected variants
  *     of the query terms, so stemmed and standard BM25 must agree on the
  *     match set and the top-10 — pinned here as overlap assertions (the
  *     exact values are pinned by GoldenSpec's txt_bm25_stemmed digest).
  */
class TextSearchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir", "/tmp/graft_test_warehouse")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.01"

  // (word, expected stem) — full-word outputs of the published algorithm.
  private val porterVectors = Seq(
    // step 1a: plural stripping
    "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
    "flies" -> "fli", "caress" -> "caress", "cats" -> "cat",
    // step 1b: EED / ED / ING, with the m-gate and cleanup rules
    "feed" -> "feed",           // EED with m=0 stem: unchanged
    "agreed" -> "agre",         // EED→EE, then step-5a drops the e
    "plastered" -> "plaster", "bled" -> "bled", "motoring" -> "motor",
    "sing" -> "sing",
    "conflated" -> "conflat",   // AT→ATE restore, then step-5a e-drop
    "troubled" -> "troubl",     // BL→BLE restore, then step-5a e-drop
    "sized" -> "size",          // IZ→IZE restore, kept by 5a (m=1, cvc)
    "hopping" -> "hop", "tanned" -> "tan",          // double-consonant undouble
    "falling" -> "fall", "hissing" -> "hiss", "fizzed" -> "fizz", // l/s/z kept
    "failing" -> "fail",
    "filing" -> "file",         // cvc → restore e
    // step 1c: y→i after a vowel-bearing stem
    "happy" -> "happi", "sky" -> "sky",
    // step 2 (via 1c where the word ends -y)
    "relational" -> "relat", "conditional" -> "condit", "rational" -> "ration",
    "valency" -> "valenc", "digitizer" -> "digit", "differently" -> "differ",
    "operator" -> "oper", "feudalism" -> "feudal", "hopefulness" -> "hope",
    "callousness" -> "callous", "formality" -> "formal", "sensitivity" -> "sensit",
    "radically" -> "radic",
    // step 3
    "triplicate" -> "triplic", "formative" -> "form", "formalize" -> "formal",
    "electricity" -> "electr", "goodness" -> "good",
    // step 4 (m>1 strips)
    "revival" -> "reviv", "allowance" -> "allow", "inference" -> "infer",
    "airliner" -> "airlin", "adjustable" -> "adjust", "defensible" -> "defens",
    "irritant" -> "irrit", "replacement" -> "replac", "adjustment" -> "adjust",
    "dependent" -> "depend", "adoption" -> "adopt", "communism" -> "commun",
    "activate" -> "activ", "angularity" -> "angular", "homologous" -> "homolog",
    "effective" -> "effect", "bowdlerize" -> "bowdler",
    "agreement" -> "agreement", // EMENT gated on m>1: m("agre")=1 → kept
    // step 5
    "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
    "controlling" -> "control", "roll" -> "roll",
    // guard: length ≤ 2 untouched
    "as" -> "as", "is" -> "is", "a" -> "a")

  test("PorterStemmer matches the published algorithm on full-word vectors") {
    val bad = porterVectors.collect {
      case (w, want) if PorterStemmer.stem(w) != want =>
        s"$w: got ${PorterStemmer.stem(w)}, want $want"
    }
    assert(bad.isEmpty, s"\n${bad.mkString("\n")}")
    assert(PorterStemmer.stem(null) == null)
  }

  test("stemQueryTerms folds morphology and dedups") {
    assert(TextSearch.stemQueryTerms("searching searched searches") === Seq("search"))
    assert(TextSearch.stemQueryTerms("Joining the JOINS") === Seq("join", "the"))
    assert(TextSearch.stemQueryTerms("spark join vector") === Seq("spark", "join", "vector"))
  }

  test("stemmed BM25 recall is a superset of standard recall on inflected forms") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark joins vectors quickly"),   // standard matches via 'spark' only
      (2L, "joining and joined tables"),     // only morphological variants
      (3L, "nothing relevant here"),
      (4L, "spark join vector")              // exact terms
    ).toDF("doc_id", "text")
    val q = "spark join vector"
    val std = TextSearch.bm25(docs, Seq("spark", "join", "vector"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val stm = TextSearch.bm25(docs, TextSearch.stemQueryTerms(q),
        analyzer = TextSearch.stemmedTokens)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(std === Set(1L, 4L))
    assert(stm === Set(1L, 2L, 4L))
    assert(std.subsetOf(stm))
  }

  test("fixture: stemmed and standard analyzers agree where no morphology differs") {
    val docs = Tables.documents(spark, dir)
    val std = TextSearch.bm25(docs, Seq("spark", "join", "vector"))
    val stm = TextSearch.bm25(docs, TextSearch.stemQueryTerms("spark join vector"),
      analyzer = TextSearch.stemmedTokens)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val stdIds = ids(std); val stmIds = ids(stm)
    // the sf0.01 vocabulary carries no inflected variants of the query
    // terms, so recall must be EQUAL (superset with nothing extra to gain)
    assert(stdIds === stmIds)
    assert(stdIds.nonEmpty)
    // top-10 overlap (the registered txt_bm25_stemmed surface vs standard)
    def top10(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("text_score").desc, col("doc_id").asc).limit(10)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val overlap = top10(std).intersect(top10(stm)).size
    assert(overlap >= 6, s"top-10 overlap $overlap < 6")
    graft.Caches.release()
  }

  test("bm25 scores are identical across every caching branch (tokens _, " +
       "cacheTokens overrides) — the dispatch is a cost choice, never a result one") {
    // `TextSearch.tokens _` eta-expands to a FRESH function object the
    // reference-identity default cannot recognize as the standard analyzer
    // (ADVICE r19): it takes the cache-the-arrays branch. Both branches and
    // both explicit overrides must score identically.
    val docs = Tables.documents(spark, dir)
    val terms = Seq("spark", "join", "vector")
    def scores(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaDefault = scores(TextSearch.bm25(docs, terms))
    val viaEta     = scores(TextSearch.bm25(docs, terms, analyzer = TextSearch.tokens _))
    val viaForceOn  = scores(TextSearch.bm25(docs, terms, cacheTokens = Some(true)))
    val viaForceOff = scores(TextSearch.bm25(docs, terms,
      analyzer = TextSearch.tokens _, cacheTokens = Some(false)))
    assert(viaDefault.nonEmpty)
    assert(viaEta === viaDefault)
    assert(viaForceOn === viaDefault)
    assert(viaForceOff === viaDefault)
    graft.Caches.release()
  }
}
