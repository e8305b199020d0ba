package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expressions.GraftExtensions
import graft.functions.VectorFunctions

class ExpressionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("codegen cosine expression matches the scala/expr forms bit-for-bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val data = (0 until 200).map { _ =>
      (Array.fill(64)(rnd.nextFloat() - 0.5f), Array.fill(64)(rnd.nextFloat() - 0.5f))
    }
    val df = data.toDF("a", "b")
    val viaExpr = df.select(VectorFunctions.cosineSimilarity($"a", $"b")).collect().map(_.getDouble(0))
    val viaHof  = df.select(VectorFunctions.cosineSimilarityExpr($"a", $"b")).collect().map(_.getDouble(0))
    val viaScala = data.map { case (a, b) => VectorFunctions.cosineScala(a, b) }
    viaExpr.zip(viaHof).foreach { case (x, y) => assert(x === y) }
    viaExpr.zip(viaScala).foreach { case (x, y) => assert(x === y) }
  }

  test("cosine expression null/zero semantics") {
    import spark.implicits._
    val df = Seq(
      (Some(Array(1f, 0f)), None: Option[Array[Float]]),
      (Some(Array(0f, 0f)), Some(Array(1f, 1f)))).toDF("a", "b")
    val out = df.select(VectorFunctions.cosineSimilarity($"a", $"b")).collect().map(_.getDouble(0))
    assert(out.toSeq === Seq(0.0, 0.0))
  }

  test("graft_cosine is SQL-callable after registration") {
    import spark.implicits._
    GraftExtensions.register(spark)
    Seq((Array(1f, 2f, 3f), Array(1f, 2f, 3f))).toDF("a", "b").createOrReplaceTempView("vecs")
    val got = spark.sql("SELECT graft_cosine(a, b) AS c FROM vecs").head.getDouble(0)
    assert(math.abs(got - 1.0) < 1e-12)
  }

  test("graft_chunk LATERAL VIEW matches ChunkOps.chunkFlat row for row") {
    GraftExtensions.register(spark)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    docs.createOrReplaceTempView("graft_chunk_docs")
    val viaSql = spark.sql("""
        SELECT d.doc_id AS document_id, c.chunk_id, c.content, c.chunk_index,
               c.word_count, c.start_char, c.end_char
        FROM graft_chunk_docs d
        LATERAL VIEW graft_chunk(d.doc_id, d.text, 1000, 200) c""")
      .orderBy("document_id", "chunk_index")
      .collect().map(_.toSeq).toSeq
    val viaApi = graft.operators.ChunkOps.chunkFlat(docs).toDF()
      .select("document_id", "chunk_id", "content", "chunk_index",
        "word_count", "start_char", "end_char")
      .orderBy("document_id", "chunk_index")
      .collect().map(_.toSeq).toSeq
    assert(viaSql.nonEmpty)
    assert(viaSql === viaApi)
  }

  test("graft_chunk 2-arg form defaults to the reference's 1000/200") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val text = ("alpha beta gamma delta. " * 200).trim // ~4.8k chars -> several chunks
    Seq((7L, text)).toDF("doc_id", "text").createOrReplaceTempView("graft_chunk_one")
    val twoArg = spark.sql(
      "SELECT c.* FROM graft_chunk_one LATERAL VIEW graft_chunk(doc_id, text) c")
      .collect().map(_.toSeq).toSeq
    val fourArg = spark.sql(
      "SELECT c.* FROM graft_chunk_one LATERAL VIEW graft_chunk(doc_id, text, 1000, 200) c")
      .collect().map(_.toSeq).toSeq
    assert(twoArg.size > 1)
    assert(twoArg === fourArg)
  }

  test("graft_chunk rejects degenerate size/overlap literals at analysis time") {
    import spark.implicits._
    GraftExtensions.register(spark)
    // text must clear the kernel's 50-char stripped-chunk minimum so the
    // boundary case below actually emits rows
    Seq((1L, "some text " * 12)).toDF("doc_id", "text")
      .createOrReplaceTempView("graft_chunk_bad")
    def analyze(sizeOverlap: String): String = {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("SELECT c.* FROM graft_chunk_bad LATERAL VIEW " +
          s"graft_chunk(doc_id, text, $sizeOverlap) c").queryExecution.analyzed
      }
      e.getMessage
    }
    assert(analyze("0, 0").contains("chunk_size must be > 0"))
    assert(analyze("-5, 0").contains("chunk_size must be > 0"))
    assert(analyze("100, -1").contains("overlap must be in [0, chunk_size)"))
    assert(analyze("100, 100").contains("overlap must be in [0, chunk_size)"))
    assert(analyze("100, 200").contains("overlap must be in [0, chunk_size)"))
    assert(analyze("cast(null as int), 0").contains("non-null literals"))
    // the boundary that must still work: overlap = chunk_size - 1
    val ok = spark.sql("SELECT c.* FROM graft_chunk_bad LATERAL VIEW " +
      "graft_chunk(doc_id, text, 100, 99) c")
    assert(ok.count() > 0)
  }

  test("SQL text functions plan the same trees as the Column API") {
    import spark.implicits._
    import graft.functions.TextFunctions
    import graft.operators.TextAnalysis
    GraftExtensions.register(spark)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(50)
    docs.createOrReplaceTempView("graft_sqlfn_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_clean(text) AS cleaned,
                graft_quality(text, source, NULL) AS quality,
                graft_intent(text) AS intent,
                graft_bpe_tokens(text) AS bpe,
                graft_repetition(text) AS rep,
                graft_pii(text) AS pii,
                graft_redact_pii(text) AS redacted,
                graft_slack(text) AS slack,
                graft_html_text(text) AS plain
         FROM graft_sqlfn_docs""").collect().map(_.toSeq).sortBy(_.toString)
    val viaCols = docs.select($"doc_id",
        TextFunctions.cleanContent($"text").as("cleaned"),
        TextFunctions.qualityScore($"text", $"source", lit(null).cast("string")).as("quality"),
        TextFunctions.queryIntent($"text").as("intent"),
        TextAnalysis.bpeIshTokens($"text").as("bpe"),
        TextAnalysis.repetitionScores($"text").as("rep"),
        TextAnalysis.piiCounts($"text").as("pii"),
        TextAnalysis.redactPii($"text").as("redacted"),
        TextFunctions.markdownToSlack($"text").as("slack"),
        TextFunctions.htmlToText($"text").as("plain"))
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(viaSql.nonEmpty)
    assert(viaSql === viaCols)
    // wrong arity fails at analysis, not mid-job
    intercept[Exception] {
      spark.sql("SELECT graft_quality(text) FROM graft_sqlfn_docs").queryExecution.analyzed
    }
  }

  test("SQL text functions stay inside whole-stage codegen (no opaque leaves)") {
    GraftExtensions.register(spark)
    import spark.implicits._
    spark.range(50).select(concat(lit("some text nr "), col("id")).as("text"))
      .createOrReplaceTempView("graft_sqlfn_codegen")
    val df = spark.sql(
      """SELECT graft_word_count(text) AS wc, graft_token_estimate(text) AS est,
                graft_intent(text) AS intent
         FROM graft_sqlfn_codegen""")
    val plan = df.queryExecution.executedPlan.toString
    // an unconverted Column bridge would leave a ColumnNodeExpression leaf,
    // which is Unevaluable and kills the whole plan at codegen
    assert(!plan.toLowerCase.contains("columnnode"))
    assert(plan.contains("*(1)"), s"SQL function project fell out of codegen:\n$plan")
    assert(df.count() === 50)
  }

  test("whole-stage codegen survives (no fallback) for the cosine plan") {
    import spark.implicits._
    // non-literal input so the optimizer cannot constant-fold the expression
    val df = spark.range(100)
      .select(
        array((1 to 8).map(i => (col("id") + i).cast("float")): _*).as("a"),
        array((1 to 8).map(i => (col("id") * i).cast("float")): _*).as("b"))
      .select(VectorFunctions.cosineSimilarity($"a", $"b").as("c"))
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_cosine"))
    assert(df.count() === 100)
  }
}
