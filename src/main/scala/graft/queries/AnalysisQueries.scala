package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Similarity, TextAnalysis}

/** Text-analysis + ANN similarity queries (north-star LLM-pipeline surface):
  * language ID, token counting, rolling-hash fingerprints, quality ratios,
  * IVF approximate nearest neighbours. */
object AnalysisQueries {

  private val IvfCentroids = 16
  private val IvfStep      = 31L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Stopword-vote language ID per document.
    "ana_lang_id" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .withColumn("det", TextAnalysis.detectLanguage($"text"))
        .select($"doc_id", $"det.lang".as("detected_lang"), $"det.votes".as("votes"))
    }),

    // Detected vs labeled language confusion counts.
    "ana_lang_confusion" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .withColumn("det", TextAnalysis.detectLanguage($"text"))
        .groupBy($"lang", $"det.lang".as("detected_lang"))
        .agg(count(lit(1)).as("n_docs"))
    }),

    // Whitespace vs BPE-ish vs len/4 token counts.
    "ana_token_counts" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select($"doc_id",
          TextAnalysis.whitespaceTokens($"text").as("ws_tokens"),
          TextAnalysis.bpeIshTokens($"text").as("bpe_tokens"),
          graft.functions.TextFunctions.tokenEstimate($"text").as("est_tokens"))
    }),

    // REAL subword counts under the frozen corpus-trained BPE merges
    // (Sennrich et al.; operators.Bpe) — the trained-tokenizer upgrade of
    // ana_token_counts' regex approximation. The oracle replays the exact
    // encoder: a recursive CTE applying the same frozen merge table in
    // rank order, one leftmost occurrence per step (provably equal to the
    // kernel's merge-all-per-rank — a pair involving a merged symbol is
    // always learned later, so it can never outrank the pair that created
    // it). Encoding dedups to DISTINCT words first in both engines — at
    // 100 TB the encode cost is vocabulary-shaped, not corpus-shaped, and
    // the kernel memoizes per word for the same reason.
    "ana_token_counts_bpe" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.Bpe
      Tables.documents(s, dir)
        .select($"doc_id",
          size(graft.operators.Dedup.words($"text")).cast("long").as("n_words"),
          Bpe.tokenCount($"text", Bpe.frozen).as("n_bpe_tokens"))
    }),

    // Exact token-length percentiles per language — the distribution view
    // that sets truncation budgets and flags outlier strata. Single
    // percentile(array) aggregate: one sort buffer per group, not one per
    // quantile. At 100 TB swap in approx_percentile (t-digest, mergeable,
    // no per-group sort buffer); the exact form is the oracle-checkable
    // fixture variant of the same plan shape.
    "ana_token_percentiles" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select($"lang", TextAnalysis.whitespaceTokens($"text").as("ws"))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"),
             expr("percentile(ws, array(0.25D, 0.5D, 0.75D, 0.9D, 0.99D))").as("ps"))
        .select($"lang", $"n_docs",
          round($"ps"(0), 6).as("p25"), round($"ps"(1), 6).as("p50"),
          round($"ps"(2), 6).as("p75"), round($"ps"(3), 6).as("p90"),
          round($"ps"(4), 6).as("p99"))
    }),

    // N12's scale form, built: approx_percentile replaces exact percentile
    // for the 100 TB job — a fixed-size sketch per group with map-side
    // combine (the exact form buffers every value per group). Rows-only in
    // the driver gate (the sketch is engine-specific, so no cross-engine
    // hash oracle EXISTS — that is the point of the swap-in); AnalysisSpec
    // pins the approximation against the exact query within the sketch's
    // accuracy bound on the fixture.
    "ana_token_percentiles_approx" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select($"lang", TextAnalysis.whitespaceTokens($"text").as("ws"))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"),
             expr("approx_percentile(ws, array(0.25D, 0.5D, 0.75D, 0.9D, 0.99D), 10000)").as("ps"))
        .select($"lang", $"n_docs",
          $"ps"(0).cast("double").as("p25"), $"ps"(1).cast("double").as("p50"),
          $"ps"(2).cast("double").as("p75"), $"ps"(3).cast("double").as("p90"),
          $"ps"(4).cast("double").as("p99"))
    }),

    // PII screen + redaction (north-star: corpus hygiene before training).
    // The fixture prose is PII-free, so each doc gets a deterministic planted
    // email / phone / IPv4 IN the query — counting and masking then run on
    // real matches, same convention as doc_url_extract's planted URLs.
    "ana_pii_redact" -> ((s, dir) => {
      import s.implicits._
      val planted = concat(
        substring($"text", 1, 60),
        lit(" contact user"), ($"doc_id" % 97).cast("string"), lit("@mail.example.com"),
        lit(" call +1 "), (($"doc_id" % 700) + 200).cast("string"), lit(" 555-"),
        lpad(($"doc_id" % 10000).cast("string"), 4, "0"),
        lit(" from 10."), ($"doc_id" % 200).cast("string"), lit(".0."),
        (($"doc_id" % 250) + 1).cast("string"))
      Tables.documents(s, dir)
        .withColumn("pt", planted)
        .withColumn("pii", TextAnalysis.piiCounts($"pt"))
        .select($"doc_id",
          $"pii.n_emails".as("n_emails"),
          $"pii.n_ips".as("n_ips"),
          $"pii.n_phones".as("n_phones"),
          TextAnalysis.redactPii($"pt").as("redacted"))
    }),

    // Unigram LM vocabulary: top-20 corpus tokens, deterministic tie-break.
    "ana_lm_vocab" -> ((s, dir) => {
      import s.implicits._
      TextAnalysis.unigramVocab(Tables.documents(s, dir), k = 20)
    }),

    // Unigram LM scoring against a deliberately small (top-25 of the
    // fixture's 31 distinct tokens) vocabulary so the OOV path is exercised
    // — the CCNet-style distance-from-corpus-distribution quality screen.
    "ana_lm_scores" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      TextAnalysis.lmScores(docs, TextAnalysis.unigramVocab(docs, k = 25))
    }),

    // Gopher-style repetition fractions (boilerplate/loop detector).
    "ana_repetition" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .withColumn("r", TextAnalysis.repetitionScores($"text"))
        .select($"doc_id",
          round($"r.dup_word_frac", 6).as("dup_word_frac"),
          round($"r.dup_3gram_frac", 6).as("dup_3gram_frac"))
    }),

    // Bottom-4 rolling-shingle fingerprints.
    "ana_fingerprints" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select($"doc_id", TextAnalysis.fingerprint($"text").as("fingerprint"))
    }),

    // Length/punct/stopword quality screens.
    "ana_quality_ratios" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .withColumn("q", TextAnalysis.qualityRatios($"text"))
        .select($"doc_id",
          round($"q.stopword_ratio", 6).as("stopword_ratio"),
          round($"q.punct_ratio", 6).as("punct_ratio"),
          round($"q.alpha_ratio", 6).as("alpha_ratio"),
          round($"q.mean_word_len", 6).as("mean_word_len"))
    }),

    // IVF cell occupancy (the partition-pruning key at scale).
    "ann_ivf_cells" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables.embeddings(s, dir)
      val cents = Similarity.seededCentroids(emb, IvfCentroids, IvfStep)
      Similarity.ivfAssign(emb, cents)
        .groupBy($"centroid_id").agg(count(lit(1)).as("n_vectors"))
    }),

    // IVF probe search: query = vec 7, k=10, nprobe=4.
    "ann_ivf_top10" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables.embeddings(s, dir)
      val cents = Similarity.seededCentroids(emb, IvfCentroids, IvfStep)
      val qv = emb.filter($"vec_id" === 7L).select("embedding").head.getSeq[Float](0).toArray
      Similarity.ivfSearch(emb, cents, qv, k = 10, nprobe = 4)
        .select($"vec_id", $"centroid_id", round($"score", 6).as("score"))
    }),

    // IVF probe over the MATERIALIZED partitioned index (graft.IvfCatalog):
    // same semantics as ann_ivf_top10, but the corpus assignment is a
    // write-time partition key and the probe prunes partitions at the scan
    // (PartitionFilters — asserted by PlanSpec) instead of re-assigning the
    // corpus per query.
    "ann_ivf_pruned" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables.embeddings(s, dir)
      val cents = Similarity.seededCentroids(emb, IvfCentroids, IvfStep)
      val store = graft.IvfCatalog.assignedEmbeddings(s, dir, IvfCentroids, IvfStep)
      val qv = emb.filter($"vec_id" === 7L).select("embedding").head.getSeq[Float](0).toArray
      Similarity.ivfSearchPruned(store, cents, qv, k = 10, nprobe = 4)
        .select($"vec_id", $"centroid_id".cast("long").as("centroid_id"),
          round($"score", 6).as("score"))
    }),

    // FILTERED ANN over the materialized index: a metadata predicate
    // (label = 3) composes with the partition prune into the SAME scan —
    // PushedFilters next to PartitionFilters (PlanSpec asserts both), so a
    // selective filter reads fewer bytes, never more. Semantics are
    // filter-within-probed-cells (the standard filtered-IVF trade: the
    // recall bound is the probe's; a selective filter wants a higher
    // nprobe) — post-filtering a top-k would instead under-deliver k.
    "ann_ivf_filtered" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables.embeddings(s, dir)
      val cents = Similarity.seededCentroids(emb, IvfCentroids, IvfStep)
      val store = graft.IvfCatalog.assignedEmbeddings(s, dir, IvfCentroids, IvfStep)
      val qv = emb.filter($"vec_id" === 7L).select("embedding").head.getSeq[Float](0).toArray
      Similarity.ivfSearchPruned(store, cents, qv, k = 10, nprobe = 4,
          preFilter = Some($"label" === 3))
        .select($"vec_id", $"label", $"centroid_id".cast("long").as("centroid_id"),
          round($"score", 6).as("score"))
    }),

    // N43 filtered-ANN AUTO-SWITCH, brute leg (the measured crossover from
    // SCALE.md's recall sweep as an operator): this filter keeps 10 of 500
    // rows, so expected survivors in the probed cells (10 x 4/16 = 2.5)
    // fall far under the 10*k viability bar and the operator switches to
    // an EXACT brute scan of the filtered subset — the probe at nprobe=4
    // would open 1/4 of the cells and return ~2 of the true top-10. The
    // oracle is therefore the plain exact filtered top-k (recall 1.0 by
    // construction — the strongest possible check).
    "ann_ivf_filtered_auto" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables.embeddings(s, dir)
      val cents = Similarity.seededCentroids(emb, IvfCentroids, IvfStep)
      val store = graft.IvfCatalog.assignedEmbeddings(s, dir, IvfCentroids, IvfStep)
      val qv = emb.filter($"vec_id" === 7L).select("embedding").head.getSeq[Float](0).toArray
      Similarity.ivfSearchFilteredAuto(store, cents, qv, k = 10, nprobe = 4,
          preFilter = $"vec_id" % 50 === 7)
        .select($"vec_id", $"label", round($"score", 6).as("score"))
    }),

    // N43 probe leg: a broad filter (label < 8, ~78% of rows) stays past
    // the viability bar at k=2, so the auto-switch runs the normal
    // filter-within-probed-cells probe — the oracle reproduces the probe
    // exactly as ann_ivf_filtered's does.
    "ann_ivf_filtered_probe" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables.embeddings(s, dir)
      val cents = Similarity.seededCentroids(emb, IvfCentroids, IvfStep)
      val store = graft.IvfCatalog.assignedEmbeddings(s, dir, IvfCentroids, IvfStep)
      val qv = emb.filter($"vec_id" === 7L).select("embedding").head.getSeq[Float](0).toArray
      Similarity.ivfSearchFilteredAuto(store, cents, qv, k = 2, nprobe = 4,
          preFilter = $"label" < 8)
        .select($"vec_id", $"label", $"centroid_id".cast("long").as("centroid_id"),
          round($"score", 6).as("score"))
    }),

    // N43 on the batch surface, brute leg: a 3-query queue sharing the
    // selective filter switches ONCE to an exact brute scan of the
    // filtered subset with per-query bounded-heap top-k — the oracle is
    // the exact per-query filtered top-5 (a DuckDB window).
    "ann_ivf_filtered_auto_batch" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables.embeddings(s, dir)
      val cents = Similarity.seededCentroids(emb, IvfCentroids, IvfStep)
      val store = graft.IvfCatalog.assignedEmbeddings(s, dir, IvfCentroids, IvfStep)
      val queries = emb.filter($"vec_id".isin(3L, 7L, 11L))
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      Similarity.ivfSearchFilteredAutoBatch(store, cents, queries, k = 5, nprobe = 4,
          preFilter = $"vec_id" % 50 === 7)
        .select($"qid", $"vec_id", $"rank", round($"score", 6).as("score"))
    }),

    // Batch IVF probe over the materialized index: 4 query vectors share
    // ONE partition-pruned scan of the union of their probed cells — the
    // serving-throughput form (per-row scoring restricted to the queries
    // that probed that row's cell; per-query top-k via the bounded heap).
    "ann_ivf_batch" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables.embeddings(s, dir)
      val cents = Similarity.seededCentroids(emb, IvfCentroids, IvfStep)
      val store = graft.IvfCatalog.assignedEmbeddings(s, dir, IvfCentroids, IvfStep)
      val queries = emb.filter($"vec_id".isin(3L, 7L, 11L, 19L))
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      Similarity.ivfSearchPrunedBatch(store, cents, queries, k = 10, nprobe = 4)
        .select($"qid", $"vec_id", $"rank", round($"score", 6).as("score"))
    }),

    // Int8-quantized KNN: integer-dot candidate scan over 4x-smaller codes,
    // exact re-rank of k*4 candidates — emitted scores are bit-identical to
    // brute force (oracle = exact top-10), quantization only moves the
    // candidate boundary.
    "ann_int8_top10" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables.embeddings(s, dir)
      val qv = emb.filter($"vec_id" === 7L).select("embedding").head.getSeq[Float](0).toArray
      Similarity.int8Search(Similarity.quantizeInt8(emb), emb, qv, k = 10)
        .select($"vec_id", round($"score", 6).as("score"))
    }),

    // PQ encode: the corpus as 8-byte codes + exact norm. The per-subspace
    // argmin assignment is oracle-replayed in SQL (same seeded codebook,
    // same element-order double arithmetic) — the ADC index's guts are
    // hash-checked, not just its final top-k.
    "ann_pq_codes" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables.embeddings(s, dir)
      val cb = Similarity.pqTrainSeeded(emb, m = 8, ksub = IvfCentroids, step = IvfStep)
      Similarity.pqEncode(emb, cb)
        .select($"vec_id",
          Similarity.pqCodeString($"code").as("code"),
          round($"norm", 6).as("norm"))
    }),

    // PQ+ADC search: query = vec 7, k=10; codes scanned, LUT-scored, top
    // k*8 candidates exact-reranked. Unlike int8 (whose oracle is exact KNN
    // because 0.5% dot error + rerank always recovers it), a 16-cell/8-dim
    // seeded codebook legitimately loses recall@k — so the oracle replays
    // the FULL ADC pipeline in SQL (codebook, assignment, LUT, approx
    // ordering, exact rerank) and checks the engine's PQ semantics
    // bit-for-bit; recall vs exact is pinned separately in OperatorSpec.
    "ann_pq_top10" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables.embeddings(s, dir)
      val qv = emb.filter($"vec_id" === 7L).select("embedding").head.getSeq[Float](0).toArray
      val cb = Similarity.pqTrainSeeded(emb, m = 8, ksub = IvfCentroids, step = IvfStep)
      Similarity.pqSearch(Similarity.pqEncode(emb, cb), emb, cb, qv, k = 10)
        .select($"vec_id", round($"score", 6).as("score"))
    }),

    // Batch ADC: three query vectors against the code table in one pass —
    // driver LUTs, per-query bounded-heap candidates before the exchange,
    // exact rerank. Oracle replays the whole per-query pipeline in SQL.
    "ann_pq_batch" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables.embeddings(s, dir)
      val cb = Similarity.pqTrainSeeded(emb, m = 8, ksub = IvfCentroids, step = IvfStep)
      val queries = emb.filter($"vec_id".isin(3L, 7L, 11L))
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      Similarity.pqSearchBatch(Similarity.pqEncode(emb, cb), emb, cb, queries, k = 10)
        .select($"qid", $"vec_id", $"rank", round($"score", 6).as("score"))
    }),

    // IVFADC end-to-end: IVF cells prune, PQ codes shrink, exact rerank.
    // Same seeded vectors serve as IVF centroids and PQ codebook (step 31);
    // the oracle composes the assignment and ADC pipelines in SQL.
    "ann_ivfpq_top10" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables.embeddings(s, dir)
      val qv = emb.filter($"vec_id" === 7L).select("embedding").head.getSeq[Float](0).toArray
      val cents = Similarity.seededCentroids(emb, IvfCentroids, IvfStep)
      val cb = Similarity.pqTrainSeeded(emb, m = 8, ksub = IvfCentroids, step = IvfStep)
      val codesAssigned = Similarity.pqEncode(emb, cb)
        .join(Similarity.ivfAssign(emb, cents).select($"vec_id", $"centroid_id"), "vec_id")
      Similarity.ivfPqSearch(codesAssigned, emb, cents, cb, qv, k = 10, nprobe = 4)
        .select($"vec_id", round($"score", 6).as("score"))
    }),

    // IVFADC over the MATERIALIZED index (graft.IvfPqCatalog): the code
    // table was written partitionBy(centroid_id) at build time, so the
    // probe's IN filter prunes partition directories (PartitionFilters in
    // PlanSpec) and the surviving cells scan 8-byte codes. Same semantics
    // and oracle as ann_ivfpq_top10 — only the storage plan differs.
    "ann_ivfpq_pruned" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables.embeddings(s, dir)
      val qv = emb.filter($"vec_id" === 7L).select("embedding").head.getSeq[Float](0).toArray
      val cents = Similarity.seededCentroids(emb, IvfCentroids, IvfStep)
      val cb = Similarity.pqTrainSeeded(emb, m = 8, ksub = IvfCentroids, step = IvfStep)
      val store = graft.IvfPqCatalog.encodedEmbeddings(s, dir, cb, IvfCentroids, IvfStep)
      Similarity.ivfPqSearch(store, emb, cents, cb, qv, k = 10, nprobe = 4)
        .select($"vec_id", round($"score", 6).as("score"))
    }),

    // The SQL function surface end-to-end: the same analysis kernels called
    // through spark.sql via GraftExtensions (a user who never leaves SQL),
    // oracle-checked against the same DuckDB fragments as the Column forms.
    "ana_sql_functions" -> ((s, dir) => {
      graft.expressions.GraftExtensions.register(s)
      Tables.documents(s, dir).createOrReplaceTempView("graft_documents_sql")
      s.sql("""SELECT doc_id,
                      graft_word_count(text) AS ws_tokens,
                      graft_token_estimate(text) AS est_tokens,
                      graft_lang(text).lang AS detected_lang,
                      graft_fingerprint(text) AS fingerprint
               FROM graft_documents_sql""")
    }),

    // Distributed embedding near-dup pairs: LSH-bucketed candidates, exact
    // re-score — the 100 TB twin of dedup_embedding_pairs (no driver collect).
    // Oracle = the exact pair set: recall is 1.0 on the fixture (verified by
    // SimilaritySpec), and precision is exactly 1 by construction.
    "ann_lsh_pairs" -> ((s, dir) => {
      import s.implicits._
      graft.operators.Dedup
        .embeddingPairsDistributed(Tables.embeddings(s, dir), minCosine = 0.45)
        .select($"left_id", $"right_id", round($"cosine", 6).as("cosine"))
    }))

  // ------------------------------------------------------------- oracle SQL

  private def duckWords(e: String) = DuckSql.words(e)

  private def prof(words: Seq[String]) = words.map(w => s"'$w'").mkString("[", ", ", "]")

  private val duckLang: String = {
    val scores = TextAnalysis.LanguageProfiles.map { case (lang, words) =>
      s"s_$lang" -> s"len(list_filter(w, x -> list_contains(${prof(words)}, x))) AS s_$lang"
    }
    val mx = scores.map(_._1).mkString("GREATEST(", ", ", ")")
    val chain = TextAnalysis.LanguageProfiles
      .map { case (lang, _) => s"WHEN s_$lang = mx THEN '$lang'" }.mkString(" ")
    s"""SELECT doc_id, lang, CASE WHEN mx = 0 THEN 'und' $chain END AS detected_lang,
          CAST(mx AS INT) AS votes
        FROM (SELECT doc_id, lang, ${scores.map(_._2).mkString(", ")}, $mx AS mx
              FROM (SELECT doc_id, lang, ${duckWords("text")} AS w FROM documents))"""
  }

  private val duckCos = (a: String, b: String) => DuckSql.cos(a, b)

  private val duckIvf =
    s"""cents AS (SELECT vec_id AS centroid_id, embedding AS cvec FROM embeddings
                  WHERE vec_id % $IvfStep = 0 ORDER BY vec_id ASC LIMIT $IvfCentroids),
        assign AS (
          SELECT vec_id, centroid_id FROM (
            SELECT e.vec_id, c.centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                     ORDER BY ${duckCos("e.embedding", "c.cvec")} DESC, c.centroid_id ASC) AS rn
            FROM embeddings e, cents c)
          WHERE rn = 1)"""

  /** Full IVFADC pipeline in DuckDB SQL (Spark twin: Similarity.ivfPqSearch
    * with the seeded codebook/centroids): codebook → per-subspace argmin
    * assignment → probe → LUT → approx ordering → exact rerank. Shared by
    * ann_ivfpq_top10 (inline assignment) and ann_ivfpq_pruned (materialized
    * IvfPqCatalog) — identical semantics, different storage plan. */
  private lazy val duckIvfPq =
    s"""WITH cents AS (
          SELECT ROW_NUMBER() OVER (ORDER BY vec_id ASC) - 1 AS cid,
                 vec_id AS centroid_vec_id,
                 CAST(embedding AS DOUBLE[]) AS cvec
          FROM embeddings WHERE vec_id % $IvfStep = 0 ORDER BY vec_id ASC LIMIT $IvfCentroids),
        subidx AS (SELECT unnest(generate_series(0, 7)) AS j),
        q AS (SELECT CAST(embedding AS DOUBLE[]) AS qvec,
                     sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS qnorm
              FROM embeddings WHERE vec_id = 7),
        probed AS (
          SELECT centroid_vec_id FROM cents, q
          ORDER BY list_cosine_similarity(cvec, qvec) DESC, centroid_vec_id ASC
          LIMIT 4),
        assign AS (
          SELECT vec_id, centroid_vec_id FROM (
            SELECT e.vec_id, c.centroid_vec_id,
              ROW_NUMBER() OVER (PARTITION BY e.vec_id
                ORDER BY ${duckCos("e.embedding", "c.cvec")} DESC, c.centroid_vec_id ASC) AS rn
            FROM embeddings e, cents c)
          WHERE rn = 1),
        lut AS (
          SELECT s.j, c.cid,
            list_sum(list_transform(generate_series(1, 8),
              t -> q.qvec[s.j * 8 + t] * c.cvec[s.j * 8 + t])) AS ip
          FROM cents c CROSS JOIN subidx s CROSS JOIN q),
        dists AS (
          SELECT e.vec_id, s.j, c.cid,
            list_sum(list_transform(generate_series(1, 8),
              t -> (CAST(e.embedding AS DOUBLE[])[s.j * 8 + t] - c.cvec[s.j * 8 + t])
                 * (CAST(e.embedding AS DOUBLE[])[s.j * 8 + t] - c.cvec[s.j * 8 + t]))) AS d2
          FROM embeddings e CROSS JOIN subidx s CROSS JOIN cents c),
        best AS (
          SELECT vec_id, j, cid,
            ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d2 ASC, cid ASC) AS rn
          FROM dists),
        adc AS (
          SELECT b.vec_id, list_sum(list(l.ip ORDER BY b.j)) AS adot
          FROM best b JOIN lut l ON b.j = l.j AND b.cid = l.cid
          WHERE b.rn = 1 GROUP BY b.vec_id),
        norms AS (
          SELECT vec_id,
            sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS nrm
          FROM embeddings),
        cand AS (
          SELECT a.vec_id
          FROM adc a
          JOIN assign s USING (vec_id)
          JOIN probed p USING (centroid_vec_id)
          JOIN norms n USING (vec_id)
          CROSS JOIN q
          ORDER BY (CASE WHEN n.nrm = 0 OR q.qnorm = 0 THEN -2.0e0
                         ELSE a.adot / (n.nrm * q.qnorm) END) DESC, a.vec_id ASC
          LIMIT 80)
        SELECT e.vec_id, round((${duckCos("e.embedding", "q.qvec")} + 1.0e0) / 2.0e0, 6) AS score
        FROM embeddings e JOIN cand USING (vec_id) CROSS JOIN q
        ORDER BY (${duckCos("e.embedding", "q.qvec")} + 1.0e0) / 2.0e0 DESC, e.vec_id ASC
        LIMIT 10"""

  private val duckWsTokens =
    s"""CAST(CASE WHEN regexp_replace(text, '^\\s+|\\s+$$', '', 'g') = '' THEN 0
         ELSE len(string_split_regex(regexp_replace(text, '^\\s+|\\s+$$', '', 'g'), '\\s+')) END AS INT)"""

  private val duckFingerprint =
    """array_to_string(list_sort(list_transform(
         generate_series(1, GREATEST(length(text) - 7, 1)),
         i -> CAST(concat('0x', substr(md5(concat_ws('_', 0, substr(text, i, 8))), 1, 15)) AS BIGINT)))[1:4],
         ',')"""

  val oracle: Map[String, String] = Map(
    "ana_lang_id" ->
      s"SELECT doc_id, detected_lang, votes FROM ($duckLang)",
    "ana_lang_confusion" ->
      s"SELECT lang, detected_lang, COUNT(*) AS n_docs FROM ($duckLang) GROUP BY lang, detected_lang",
    "ana_token_counts" ->
      s"""SELECT doc_id,
          $duckWsTokens AS ws_tokens,
          CAST(len(regexp_extract_all(text, ' ?[a-zA-Z]+| ?[0-9]+| ?[^ a-zA-Z0-9]+')) AS INT) AS bpe_tokens,
          CAST(length(text) // 4 AS BIGINT) AS est_tokens
          FROM documents""",
    "ana_token_counts_bpe" ->
      s"""WITH RECURSIVE ${DuckSql.bpeWordTokenCtes(graft.operators.Bpe.frozen)},
          dtok AS (SELECT doc_id, unnest(${duckWords("text")}) AS w FROM documents),
          agg AS (SELECT doc_id, CAST(SUM(n) AS BIGINT) AS nb
                  FROM dtok JOIN wtok USING (w) GROUP BY doc_id)
          SELECT d.doc_id,
            CAST(len(${duckWords("text")}) AS BIGINT) AS n_words,
            CAST(COALESCE(a.nb, 0) AS BIGINT) AS n_bpe_tokens
          FROM documents d LEFT JOIN agg a USING (doc_id)""",
    "ana_pii_redact" ->
      """WITH t AS (
           SELECT doc_id,
             substring(text, 1, 60)
             || ' contact user' || (doc_id % 97) || '@mail.example.com'
             || ' call +1 ' || (doc_id % 700 + 200) || ' 555-'
             || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
             || ' from 10.' || (doc_id % 200) || '.0.' || (doc_id % 250 + 1) AS pt
           FROM documents)
         SELECT doc_id,
           CAST(len(regexp_extract_all(pt, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_emails,
           CAST(len(regexp_extract_all(pt, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INTEGER) AS n_ips,
           CAST(len(regexp_extract_all(
             regexp_replace(
               regexp_replace(pt, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '~', 'g'),
               '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '~', 'g'),
             '(\+?\d{1,2}[ .-]?)?\(?\d{3}\)?[ .-]?\d{3}[ .-]?\d{4}')) AS INTEGER) AS n_phones,
           regexp_replace(
             regexp_replace(
               regexp_replace(pt, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
               '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
             '(\+?\d{1,2}[ .-]?)?\(?\d{3}\)?[ .-]?\d{3}[ .-]?\d{4}', '[PHONE]', 'g') AS redacted
         FROM t""",

    "ana_lm_vocab" ->
      s"""SELECT token, CAST(COUNT(*) AS BIGINT) AS n
          FROM (SELECT unnest(${duckWords("text")}) AS token FROM documents)
          GROUP BY token ORDER BY n DESC, token ASC LIMIT 20""",
    "ana_lm_scores" ->
      s"""WITH toks AS (
            SELECT doc_id, unnest(${duckWords("text")}) AS token FROM documents),
          counts AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY token),
          vocab AS (SELECT token, n FROM counts ORDER BY n DESC, token ASC LIMIT 25),
          stats AS (SELECT CAST(SUM(n) AS BIGINT) AS big_n, CAST(COUNT(*) AS BIGINT) AS v
                    FROM vocab),
          lp AS (SELECT token, round(ln((n + 1) / (big_n + v + 1.0)), 9) AS lp
                 FROM vocab CROSS JOIN stats)
          SELECT t.doc_id,
            CAST(COUNT(*) AS BIGINT) AS n_tokens,
            CAST(SUM(CASE WHEN lp.lp IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
            round(CAST(SUM(CAST(coalesce(lp.lp,
                round(ln(1.0 / (stats.big_n + stats.v + 1.0)), 9))
              AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*), 6) AS avg_logprob
          FROM toks t LEFT JOIN lp ON t.token = lp.token CROSS JOIN stats
          GROUP BY t.doc_id""",
    "ana_repetition" ->
      s"""SELECT doc_id,
            round(CASE WHEN len(w) = 0 THEN 0.0e0
                  ELSE 1.0e0 - len(list_distinct(w)) * 1.0e0 / len(w) END, 6) AS dup_word_frac,
            round(CASE WHEN len(w) = 0 THEN 0.0e0
                  ELSE 1.0e0 - len(list_distinct(
                    CASE WHEN len(w) >= 3
                      THEN list_transform(generate_series(1, len(w) - 2),
                             i -> concat_ws(' ', w[i], w[i+1], w[i+2]))
                      ELSE [array_to_string(w, ' ')] END)) * 1.0e0
                    / greatest(len(w) - 2, 1) END, 6) AS dup_3gram_frac
          FROM (SELECT doc_id, ${duckWords("text")} AS w FROM documents)""",
    // quantile_cont = Spark percentile: both linearly interpolate at rank
    // q*(n-1) over the exact sorted values.
    "ana_token_percentiles" ->
      s"""SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
            round(quantile_cont(ws, 0.25e0), 6) AS p25,
            round(quantile_cont(ws, 0.5e0), 6) AS p50,
            round(quantile_cont(ws, 0.75e0), 6) AS p75,
            round(quantile_cont(ws, 0.9e0), 6) AS p90,
            round(quantile_cont(ws, 0.99e0), 6) AS p99
          FROM (SELECT lang, $duckWsTokens AS ws FROM documents)
          GROUP BY lang""",
    "ana_fingerprints" ->
      s"""SELECT doc_id, $duckFingerprint AS fingerprint
          FROM documents""",
    "ana_sql_functions" ->
      s"""SELECT d.doc_id,
          $duckWsTokens AS ws_tokens,
          CAST(length(text) // 4 AS BIGINT) AS est_tokens,
          l.detected_lang,
          $duckFingerprint AS fingerprint
          FROM documents d JOIN ($duckLang) l ON d.doc_id = l.doc_id""",
    "ana_quality_ratios" ->
      s"""SELECT doc_id,
          round(CASE WHEN len(w) = 0 THEN 0.0e0
                ELSE len(list_filter(w, x -> list_contains(${prof(TextAnalysis.LanguageProfiles.head._2)}, x))) * 1.0e0 / len(w) END, 6) AS stopword_ratio,
          round(CASE WHEN length(text) = 0 THEN 0.0e0
                ELSE len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) * 1.0e0 / length(text) END, 6) AS punct_ratio,
          round(CASE WHEN length(text) = 0 THEN 0.0e0
                ELSE len(regexp_extract_all(text, '[a-zA-Z]')) * 1.0e0 / length(text) END, 6) AS alpha_ratio,
          round(CASE WHEN len(w) = 0 THEN 0.0e0
                ELSE list_sum(list_transform(w, t -> length(t))) * 1.0e0 / len(w) END, 6) AS mean_word_len
          FROM (SELECT doc_id, text, ${duckWords("text")} AS w FROM documents)""",
    "ann_int8_top10" ->
      s"""WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 7)
          SELECT e.vec_id, round((${duckCos("e.embedding", "q.qvec")} + 1.0e0) / 2.0e0, 6) AS score
          FROM embeddings e CROSS JOIN q
          ORDER BY (${duckCos("e.embedding", "q.qvec")} + 1.0e0) / 2.0e0 DESC, e.vec_id ASC
          LIMIT 10""",
    "ann_pq_codes" ->
      s"""WITH cents AS (
            SELECT ROW_NUMBER() OVER (ORDER BY vec_id ASC) - 1 AS cid,
                   CAST(embedding AS DOUBLE[]) AS cvec
            FROM embeddings WHERE vec_id % $IvfStep = 0 ORDER BY vec_id ASC LIMIT $IvfCentroids),
          dists AS (
            SELECT e.vec_id, j.j, c.cid,
              list_sum(list_transform(generate_series(1, 8),
                t -> (CAST(e.embedding AS DOUBLE[])[j.j * 8 + t] - c.cvec[j.j * 8 + t])
                   * (CAST(e.embedding AS DOUBLE[])[j.j * 8 + t] - c.cvec[j.j * 8 + t]))) AS d2
            FROM embeddings e
            CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS j) j
            CROSS JOIN cents c),
          best AS (
            SELECT vec_id, j, cid,
              ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d2 ASC, cid ASC) AS rn
            FROM dists)
          SELECT b.vec_id,
            string_agg(CAST(b.cid AS VARCHAR), ',' ORDER BY b.j) AS code,
            any_value(round(sqrt(list_sum(list_transform(
              CAST(e.embedding AS DOUBLE[]), x -> x * x))), 6)) AS norm
          FROM best b JOIN embeddings e ON b.vec_id = e.vec_id
          WHERE b.rn = 1
          GROUP BY b.vec_id""",
    "ann_pq_top10" ->
      s"""WITH cents AS (
            SELECT ROW_NUMBER() OVER (ORDER BY vec_id ASC) - 1 AS cid,
                   CAST(embedding AS DOUBLE[]) AS cvec
            FROM embeddings WHERE vec_id % $IvfStep = 0 ORDER BY vec_id ASC LIMIT $IvfCentroids),
          subidx AS (SELECT unnest(generate_series(0, 7)) AS j),
          q AS (SELECT CAST(embedding AS DOUBLE[]) AS qvec,
                       sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS qnorm
                FROM embeddings WHERE vec_id = 7),
          lut AS (
            SELECT s.j, c.cid,
              list_sum(list_transform(generate_series(1, 8),
                t -> q.qvec[s.j * 8 + t] * c.cvec[s.j * 8 + t])) AS ip
            FROM cents c CROSS JOIN subidx s CROSS JOIN q),
          dists AS (
            SELECT e.vec_id, s.j, c.cid,
              list_sum(list_transform(generate_series(1, 8),
                t -> (CAST(e.embedding AS DOUBLE[])[s.j * 8 + t] - c.cvec[s.j * 8 + t])
                   * (CAST(e.embedding AS DOUBLE[])[s.j * 8 + t] - c.cvec[s.j * 8 + t]))) AS d2
            FROM embeddings e CROSS JOIN subidx s CROSS JOIN cents c),
          best AS (
            SELECT vec_id, j, cid,
              ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d2 ASC, cid ASC) AS rn
            FROM dists),
          adc AS (
            SELECT b.vec_id, list_sum(list(l.ip ORDER BY b.j)) AS adot
            FROM best b JOIN lut l ON b.j = l.j AND b.cid = l.cid
            WHERE b.rn = 1 GROUP BY b.vec_id),
          norms AS (
            SELECT vec_id,
              sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS nrm
            FROM embeddings),
          cand AS (
            SELECT a.vec_id
            FROM adc a JOIN norms n USING (vec_id) CROSS JOIN q
            ORDER BY (CASE WHEN n.nrm = 0 OR q.qnorm = 0 THEN -2.0e0
                           ELSE a.adot / (n.nrm * q.qnorm) END) DESC, a.vec_id ASC
            LIMIT 80)
          SELECT e.vec_id, round((${duckCos("e.embedding", "q.qvec")} + 1.0e0) / 2.0e0, 6) AS score
          FROM embeddings e JOIN cand USING (vec_id) CROSS JOIN q
          ORDER BY (${duckCos("e.embedding", "q.qvec")} + 1.0e0) / 2.0e0 DESC, e.vec_id ASC
          LIMIT 10""",
    "ann_pq_batch" ->
      s"""WITH cents AS (
            SELECT ROW_NUMBER() OVER (ORDER BY vec_id ASC) - 1 AS cid,
                   CAST(embedding AS DOUBLE[]) AS cvec
            FROM embeddings WHERE vec_id % $IvfStep = 0 ORDER BY vec_id ASC LIMIT $IvfCentroids),
          subidx AS (SELECT unnest(generate_series(0, 7)) AS j),
          q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qvec,
                       sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS qnorm
                FROM embeddings WHERE vec_id IN (3, 7, 11)),
          lut AS (
            SELECT q.qid, s.j, c.cid,
              list_sum(list_transform(generate_series(1, 8),
                t -> q.qvec[s.j * 8 + t] * c.cvec[s.j * 8 + t])) AS ip
            FROM cents c CROSS JOIN subidx s CROSS JOIN q),
          dists AS (
            SELECT e.vec_id, s.j, c.cid,
              list_sum(list_transform(generate_series(1, 8),
                t -> (CAST(e.embedding AS DOUBLE[])[s.j * 8 + t] - c.cvec[s.j * 8 + t])
                   * (CAST(e.embedding AS DOUBLE[])[s.j * 8 + t] - c.cvec[s.j * 8 + t]))) AS d2
            FROM embeddings e CROSS JOIN subidx s CROSS JOIN cents c),
          best AS (
            SELECT vec_id, j, cid,
              ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d2 ASC, cid ASC) AS rn
            FROM dists),
          adc AS (
            SELECT l.qid, b.vec_id, list_sum(list(l.ip ORDER BY b.j)) AS adot
            FROM best b JOIN lut l ON b.j = l.j AND b.cid = l.cid
            WHERE b.rn = 1 GROUP BY l.qid, b.vec_id),
          norms AS (
            SELECT vec_id,
              sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS nrm
            FROM embeddings),
          cand AS (
            SELECT qid, vec_id FROM (
              SELECT a.qid, a.vec_id,
                ROW_NUMBER() OVER (PARTITION BY a.qid
                  ORDER BY (CASE WHEN n.nrm = 0 OR q.qnorm = 0 THEN -2.0e0
                                 ELSE a.adot / (n.nrm * q.qnorm) END) DESC, a.vec_id ASC) AS crn
              FROM adc a JOIN norms n USING (vec_id) JOIN q ON a.qid = q.qid)
            WHERE crn <= 80)
          SELECT qid, vec_id, CAST(rrn AS INT) AS rank, score FROM (
            SELECT c.qid, c.vec_id,
              ROW_NUMBER() OVER (PARTITION BY c.qid
                ORDER BY ${duckCos("e.embedding", "q.qvec")} DESC, c.vec_id ASC) AS rrn,
              round((${duckCos("e.embedding", "q.qvec")} + 1.0e0) / 2.0e0, 6) AS score
            FROM cand c JOIN embeddings e ON c.vec_id = e.vec_id JOIN q ON c.qid = q.qid)
          WHERE rrn <= 10""",
    // shared by ann_ivfpq_top10 (inline assignment) and ann_ivfpq_pruned
    // (materialized IvfPqCatalog): identical semantics, different storage plan
    "ann_ivfpq_top10" -> duckIvfPq,
    "ann_ivfpq_pruned" -> duckIvfPq,
    "ann_ivf_cells" ->
      s"""WITH $duckIvf
          SELECT centroid_id, COUNT(*) AS n_vectors FROM assign GROUP BY centroid_id""",
    "ann_ivf_top10" ->
      s"""WITH $duckIvf,
          q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 7),
          probed AS (
            SELECT centroid_id FROM cents, q
            ORDER BY ${duckCos("cvec", "qvec")} DESC, centroid_id ASC LIMIT 4)
          SELECT a.vec_id, a.centroid_id,
                 round((${duckCos("e.embedding", "q.qvec")} + 1.0e0) / 2.0e0, 6) AS score
          FROM assign a
          JOIN probed USING (centroid_id)
          JOIN embeddings e ON a.vec_id = e.vec_id
          CROSS JOIN q
          ORDER BY (${duckCos("e.embedding", "q.qvec")} + 1.0e0) / 2.0e0 DESC, a.vec_id ASC
          LIMIT 10""",
    "ann_ivf_pruned" ->
      s"""WITH $duckIvf,
          q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 7),
          probed AS (
            SELECT centroid_id FROM cents, q
            ORDER BY ${duckCos("cvec", "qvec")} DESC, centroid_id ASC LIMIT 4)
          SELECT a.vec_id, a.centroid_id,
                 round((${duckCos("e.embedding", "q.qvec")} + 1.0e0) / 2.0e0, 6) AS score
          FROM assign a
          JOIN probed USING (centroid_id)
          JOIN embeddings e ON a.vec_id = e.vec_id
          CROSS JOIN q
          ORDER BY (${duckCos("e.embedding", "q.qvec")} + 1.0e0) / 2.0e0 DESC, a.vec_id ASC
          LIMIT 10""",
    "ann_ivf_filtered" ->
      s"""WITH $duckIvf,
          q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 7),
          probed AS (
            SELECT centroid_id FROM cents, q
            ORDER BY ${duckCos("cvec", "qvec")} DESC, centroid_id ASC LIMIT 4)
          SELECT a.vec_id, e.label, a.centroid_id,
                 round((${duckCos("e.embedding", "q.qvec")} + 1.0e0) / 2.0e0, 6) AS score
          FROM assign a
          JOIN probed USING (centroid_id)
          JOIN embeddings e ON a.vec_id = e.vec_id
          CROSS JOIN q
          WHERE e.label = 3
          ORDER BY (${duckCos("e.embedding", "q.qvec")} + 1.0e0) / 2.0e0 DESC, a.vec_id ASC
          LIMIT 10""",
    "ann_ivf_filtered_auto" ->
      s"""WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 7)
          SELECT e.vec_id, e.label,
                 round((${duckCos("e.embedding", "q.qvec")} + 1.0e0) / 2.0e0, 6) AS score
          FROM embeddings e CROSS JOIN q
          WHERE e.vec_id % 50 = 7
          ORDER BY (${duckCos("e.embedding", "q.qvec")} + 1.0e0) / 2.0e0 DESC, e.vec_id ASC
          LIMIT 10""",
    "ann_ivf_filtered_probe" ->
      s"""WITH $duckIvf,
          q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 7),
          probed AS (
            SELECT centroid_id FROM cents, q
            ORDER BY ${duckCos("cvec", "qvec")} DESC, centroid_id ASC LIMIT 4)
          SELECT a.vec_id, e.label, a.centroid_id,
                 round((${duckCos("e.embedding", "q.qvec")} + 1.0e0) / 2.0e0, 6) AS score
          FROM assign a
          JOIN probed USING (centroid_id)
          JOIN embeddings e ON a.vec_id = e.vec_id
          CROSS JOIN q
          WHERE e.label < 8
          ORDER BY (${duckCos("e.embedding", "q.qvec")} + 1.0e0) / 2.0e0 DESC, a.vec_id ASC
          LIMIT 2""",
    "ann_ivf_filtered_auto_batch" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings
                     WHERE vec_id IN (3, 7, 11)),
          scored AS (
            SELECT q.qid, e.vec_id,
                   (${duckCos("e.embedding", "q.qvec")} + 1.0e0) / 2.0e0 AS s,
                   ROW_NUMBER() OVER (PARTITION BY q.qid
                     ORDER BY (${duckCos("e.embedding", "q.qvec")} + 1.0e0) / 2.0e0 DESC,
                              e.vec_id ASC) AS rn
            FROM embeddings e CROSS JOIN q
            WHERE e.vec_id % 50 = 7)
          SELECT qid, vec_id, CAST(rn AS INT) AS rank, round(s, 6) AS score
          FROM scored WHERE rn <= 5""",
    "ann_ivf_batch" ->
      s"""WITH $duckIvf,
          q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings
                WHERE vec_id IN (3, 7, 11, 19)),
          probed AS (
            SELECT qid, centroid_id FROM (
              SELECT q.qid, c.centroid_id,
                     ROW_NUMBER() OVER (PARTITION BY q.qid
                       ORDER BY ${duckCos("c.cvec", "q.qvec")} DESC, c.centroid_id ASC) AS rn
              FROM cents c, q)
            WHERE rn <= 4),
          hits AS (
            SELECT p.qid, a.vec_id,
                   (${duckCos("e.embedding", "q.qvec")} + 1.0e0) / 2.0e0 AS s
            FROM assign a
            JOIN probed p USING (centroid_id)
            JOIN embeddings e ON a.vec_id = e.vec_id
            JOIN q ON q.qid = p.qid)
          SELECT qid, vec_id, CAST(rrn AS INT) AS rank, round(s, 6) AS score FROM (
            SELECT qid, vec_id, s,
                   ROW_NUMBER() OVER (PARTITION BY qid ORDER BY s DESC, vec_id ASC) AS rrn
            FROM hits)
          WHERE rrn <= 10""",
    "ann_lsh_pairs" ->
      """SELECT a.vec_id AS left_id, b.vec_id AS right_id,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS cosine
         FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.45e0""")
}
