package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._

class TextFunctionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def evalStr(input: String, f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): String = {
    import spark.implicits._
    Seq(input).toDF("c").select(f($"c")).collect()(0).getString(0)
  }

  test("cleanContent strips html, entities, boilerplate; collapses whitespace") {
    assert(evalStr("<b>Hello</b> &amp; world", cleanContent) === "Hello  world")
    assert(evalStr("keep Cookie Policy this", cleanContent) === "keep  this")
    assert(evalStr("a\n\n\n\nb", cleanContent) === "a\n\nb")
    assert(evalStr("x    y", cleanContent) === "x y")
    assert(evalStr("intro Subscribe to our awesome newsletter outro", cleanContent) === "intro  outro")
    assert(evalStr("before Follow us on twitter and more", cleanContent) === "before")
  }

  test("wordCount matches python str.split() semantics") {
    import spark.implicits._
    val rows = Seq("a b c", "  a   b ", "", "   ", "one").toDF("c")
      .select(wordCount($"c")).collect().map(_.getInt(0))
    assert(rows.toSeq === Seq(3, 2, 0, 0, 1))
  }

  test("quality score: hand-computed vector") {
    import spark.implicits._
    // 150 wc-ish text with headers and lists
    val content = (1 to 150).map(i => s"w$i").mkString(" ") +
      "\n# Header\n- item one\n- item two\n1. numbered\n"
    val got = Seq(content).toDF("c")
      .select(qualityScore($"c", lit("A meaningful title"), lit("https://example.google.com/x")))
      .collect()(0).getDouble(0)
    // length: wc=156 > 100 → 0.2*min(1,156/1000)=0.2*0.156
    // structure: title(0.3)+headers(0.4)+lists(0.3)=1.0 → 0.15
    // richness: 4 elements (#,-,-,1.) → 0.25*0.4
    // readability: 1 sentence split "." in "1. numbered" splits... compute loosely below
    // credibility: google → 0.8 → 0.16
    val wc = content.trim.split("\\s+").length.toDouble
    val lengthTerm = if (wc > 100) 0.2 * math.min(1.0, wc / 1000.0) else 0.0
    val structureTerm = 0.15
    val richnessTerm = 0.25 * 0.4
    val credTerm = 0.16
    // sentences: content split on [.!?]+ → 2 pieces ("...1", " numbered\n")
    val sentences = content.split("[.!?]+", -1)
    val avg = sentences.map(s => if (s.trim.isEmpty) 0 else s.trim.split("\\s+").length).sum.toDouble / sentences.length
    val readTerm = 0.2 * math.max(0.0, 1 - math.abs(avg - 17) / 17)
    val expected = math.min(1.0, lengthTerm + structureTerm + richnessTerm + readTerm + credTerm)
    assert(math.abs(got - expected) < 1e-9)
  }

  test("quality score: empty content is 0, null url credibility 0.5") {
    import spark.implicits._
    val zero = Seq("").toDF("c")
      .select(qualityScore($"c", lit(null).cast("string"), lit(null).cast("string")))
      .collect()(0).getDouble(0)
    assert(zero === 0.0)
  }

  test("intent classification buckets") {
    import spark.implicits._
    val rows = Seq(
      "how to implement the api",    // technical wins (first match)
      "how to bake bread",           // how-to
      "debug this problem",          // problem-solving
      "what is a monad", "explain monads please",
      "hello world").toDF("c").select(queryIntent($"c")).collect().map(_.getString(0))
    assert(rows.toSeq === Seq("technical", "how-to", "problem-solving",
      "conceptual", "conceptual", "general"))
  }

  test("url extraction: markdown + bare, punctuation stripped, deduped, notion excluded") {
    import spark.implicits._
    val text = "see [docs](https://spark.apache.org/docs) and https://example.com/x. " +
      "again https://example.com/x plus [own](https://notion.so/page)"
    val urls = Seq(text).toDF("c").select(extractUrls($"c")).collect()(0).getSeq[String](0)
    assert(urls.toSet === Set("https://spark.apache.org/docs", "https://example.com/x"))
  }

  test("quality score credibility tiers") {
    import spark.implicits._
    def score(url: Option[String]): Double =
      Seq("plain words only").toDF("c")
        .select(qualityScore($"c", lit(null).cast("string"),
          url.map(lit(_)).getOrElse(lit(null).cast("string"))))
        .collect()(0).getDouble(0)
    val base = score(None) // credibility 0.5
    assert(math.abs(score(Some("https://nvidia.ai/x")) - base - 0.2 * 0.3) < 1e-9)   // 0.8 tier
    assert(math.abs(score(Some("https://foo.com/x")) - base - 0.2 * 0.1) < 1e-9)     // 0.6 tier
    assert(math.abs(score(Some("ftp://weird.xyz")) - base - 0.2 * (-0.1)) < 1e-9)    // 0.4 tier
  }

  test("token estimate and truncation") {
    import spark.implicits._
    val df = Seq("a" * 100).toDF("c")
    assert(df.select(tokenEstimate($"c")).collect()(0).getLong(0) === 25L)
    val truncated = df.select(truncateTokens($"c", 10)).collect()(0).getString(0)
    assert(truncated === "a" * 40 + "...")
  }

  test("markdownToSlack applies the reference's four rules in order") {
    // slack_bot.py:174-188: links, bold, headers, bare parenthesized URLs
    assert(evalStr("[docs](https://d.example/x)", markdownToSlack)
      === "<https://d.example/x|docs>")
    assert(evalStr("so **very bold** text", markdownToSlack) === "so *very bold* text")
    assert(evalStr("## Title\nbody", markdownToSlack) === "*Title*\nbody")
    assert(evalStr("see (https://bare.example/y) now", markdownToSlack)
      === "see <https://bare.example/y> now")
    // a markdown link's parens are consumed by rule 1 before rule 4 runs
    assert(evalStr("# H\n**b** [t](https://u.example) (https://v.example)", markdownToSlack)
      === "*H*\n*b* <https://u.example|t> <https://v.example>")
  }

  test("stripMention removes bot mentions and python-strips") {
    assert(evalStr("<@U12AB3CD> hello", stripMention) === "hello")
    assert(evalStr("  <@U9>  x  ", stripMention) === "x")
    assert(evalStr("no mention", stripMention) === "no mention")
  }

  test("htmlToText drops head/script/style/comments, keeps block structure, decodes entities") {
    val html = "<html><head><title>skip</title><style>p{}</style></head>" +
      "<body><!-- hidden --><h1>Title</h1><p>one &amp; two &lt;x&gt;</p>" +
      "<script>var a=1;</script><ul><li>a</li><li>b</li></ul></body></html>"
    assert(evalStr(html, htmlToText) === "Title\none & two <x>\na\nb")
    // &amp; decodes last: double-encoded stays escaped once
    assert(evalStr("<p>x &amp;lt; y</p>", htmlToText) === "x &lt; y")
    assert(evalStr("a<br>b<br/>c", htmlToText) === "a\nb\nc")
  }

  test("PII counts and redaction: emails, IPv4, phones; redaction order keeps patterns disjoint") {
    import graft.operators.TextAnalysis
    val txt = "mail a.b+c@sub.example.org or x@y.io, host 192.168.0.1, call +1 212 555-0134 done"
    import spark.implicits._
    val row = Seq(txt).toDF("c")
      .select(TextAnalysis.piiCounts($"c").as("p"), TextAnalysis.redactPii($"c").as("r"))
      .selectExpr("p.n_emails", "p.n_ips", "p.n_phones", "r")
      .collect()(0)
    assert((row.getInt(0), row.getInt(1), row.getInt(2)) === ((2, 1, 1)))
    assert(row.getString(3) ===
      "mail [EMAIL] or [EMAIL], host [IP], call [PHONE] done")
    // an IP alone is never double-counted as a phone (phones counted post-mask)
    val ipOnly = Seq("ips 10.0.0.1 and 255.255.255.255 only").toDF("c")
      .select(TextAnalysis.piiCounts($"c").as("p")).selectExpr("p.n_phones")
      .collect()(0).getInt(0)
    assert(ipOnly === 0)
    // plain 10-digit forms (no country code) are phones too — the common case
    val tenDigit = Seq("call 212-555-0134 or (212) 555-0134 or 212 555 0134 ok")
      .toDF("c")
      .select(TextAnalysis.piiCounts($"c").as("p"), TextAnalysis.redactPii($"c").as("r"))
      .selectExpr("p.n_phones", "r").collect()(0)
    assert(tenDigit.getInt(0) === 3)
    assert(tenDigit.getString(1) === "call [PHONE] or [PHONE] or [PHONE] ok")
    // a masked email span flanked by digit groups must NOT fuse into a
    // phone match: the mask char ('~') is printable, non-digit, and outside
    // PhonePattern's separator class [ .-] — identical in the DuckDB oracle
    val flanked = Seq("(212)a@b.co5550134").toDF("c")
      .select(TextAnalysis.piiCounts($"c").as("p"))
      .selectExpr("p.n_emails", "p.n_phones").collect()(0)
    assert((flanked.getInt(0), flanked.getInt(1)) === ((1, 0)))
  }

  test("cosine similarity and jaccard") {
    import spark.implicits._
    val df = Seq((Array(1f, 0f), Array(0f, 1f)), (Array(1f, 2f), Array(1f, 2f)))
      .toDF("a", "b")
    val cos = df.select(cosineSimilarity($"a", $"b")).collect().map(_.getDouble(0))
    assert(math.abs(cos(0)) < 1e-12)
    assert(math.abs(cos(1) - 1.0) < 1e-12)
    val jac = Seq(("a b c", "b c d"), ("", ""), ("a", ""))
      .toDF("x", "y").select(jaccardWords($"x", $"y")).collect().map(_.getDouble(0))
    assert(math.abs(jac(0) - 0.5) < 1e-12)
    assert(jac(1) === 1.0)
    assert(jac(2) === 0.0)
  }

  test("approx token percentiles track the exact query within the sketch bound") {
    val dir = "/root/testdata/sf0.001"
    // rows are (lang, n_docs, p25, p50, p75, p90, p99) = indices 0-6
    def byLang(name: String): Map[String, (Long, Seq[Double])] =
      SparkEntry.queries(name)(spark, dir).collect().map { r =>
        r.getString(0) -> ((r.getLong(1), Seq(2, 3, 4, 5, 6).map(i => r.getDouble(i))))
      }.toMap
    val exact = byLang("ana_token_percentiles")
    val approx = byLang("ana_token_percentiles_approx")
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (lang, (nDocs, _)) =>
      assert(approx(lang)._1 === nDocs, s"$lang n_docs mismatch")
    }
    // accuracy 10000 on a few-hundred-value group is near-exact; allow the
    // discreteness slack of one token count either way
    exact.foreach { case (lang, (_, ps)) =>
      ps.zip(approx(lang)._2).zipWithIndex.foreach { case ((e, a), i) =>
        assert(math.abs(e - a) <= math.max(1.0, e * 0.02),
          s"$lang percentile #$i: approx $a drifted from exact $e")
      }
    }
  }
}
