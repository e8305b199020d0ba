package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Sampling

/** Deterministic sampling queries (north-star LLM-pipeline surface):
  * hash-membership sampling is a pure function of the row id, so the kept
  * set is reproducible across runs, engines, and corpus growth — unlike
  * `DataFrame.sample`, whose RNG draw changes with partitioning and
  * retries. The md5-60-bit hash family is bit-identical in Spark and
  * DuckDB, so the oracle checks the exact membership, not just counts. */
object SamplingQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-language keep rates: downsample dominant en hard, keep the rest
    // at higher rates — the "rebalance the language mix" curation move.
    "samp_stratified" -> ((s, dir) => {
      import s.implicits._
      Sampling.stratifiedSample(Tables.documents(s, dir), "doc_id", "lang",
          rates = Map("en" -> 0.1, "de" -> 0.25), default = 0.5)
        .select($"doc_id", $"lang")
    }),

    // Quality-weighted soft sampling (FineWeb/CCNet style): keep probability
    // proportional to the document's quality score, decided by the same
    // deterministic hash — a reproducible soft filter instead of a hard
    // threshold cliff.
    "samp_quality_weighted" -> ((s, dir) => {
      import s.implicits._
      import graft.functions.TextFunctions.qualityScore
      Tables.documents(s, dir)
        .withColumn("q",
          qualityScore($"text", lit(null).cast("string"), lit(null).cast("string")))
        // floor before the long cast: Spark's double->long cast truncates
        // while DuckDB's rounds, so the boundary must be fixed by floor()
        // on both engines
        .filter(Sampling.hashBucket($"doc_id", "qw") <
          floor(round($"q", 6) * lit(1000000.0)).cast("long"))
        .select($"doc_id", $"lang", round($"q", 6).as("quality_score"))
    }),

    // Sequence packing (GPT-style concat-and-cut at a 2048-token budget):
    // the corpus token stream laid out in deterministic (shard, doc_id)
    // order, each doc mapped to its start/end pack and offset. The shard
    // key is COMPOSITE — lang × a deterministic hash sub-shard — because a
    // real corpus is mostly one language: sharding by lang alone would put
    // ~all of a 100 TB stream into one window task. Sub-sharding bounds
    // every window partition to ~1/(n_lang × n_sub) of the corpus while
    // keeping the same (shard, local pack number) id convention; shards
    // still pack independently and in parallel, the 1000-executor shape
    // (at corpus scale set n_sub ≈ executors / n_lang).
    "samp_pack_sequences" -> ((s, dir) => {
      import s.implicits._
      packed(s, dir)
        .select($"doc_id", $"lang", $"shard", $"n_tokens",
          $"pack_start", $"pack_end", $"start_offset")
    }),

    // Companion of samp_pack_sequences: pins the one stateful quantity (the
    // per-shard window prefix sum) against the same oracle CTEs. The other
    // four per-column debug companions (shard/start/end/offset) served their
    // round-7 localization purpose — everything went green — and were
    // retired; the derived columns are pure arithmetic over cum, fully
    // covered by samp_pack_sequences itself.
    "samp_pack_cum" -> ((s, dir) => {
      import s.implicits._
      packed(s, dir).select($"doc_id", $"shard", $"cum")
    }),

    // samp_pack_sequences under REAL token counts: the same packing layout
    // with the frozen corpus-trained BPE tokenizer supplying n_tokens —
    // the budget a trained model actually consumes, not the whitespace
    // proxy. Same shard key family, same oracle pack arithmetic; the BPE
    // counts replay through the recursive-CTE encoder.
    "samp_pack_bpe" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.Bpe
      val in = Tables.documents(s, dir).select($"doc_id", $"lang",
          Bpe.tokenCount($"text", Bpe.frozen).as("n_tokens"))
        .withColumn("shard", concat_ws("#", $"lang",
          pmod(Sampling.hashBucket($"doc_id", "pack"), lit(8L)).cast("string")))
      Sampling.packSequences(in, $"n_tokens", budget = 2048,
          shardCol = "shard", idCol = "doc_id")
        .select($"doc_id", $"lang", $"shard", $"n_tokens",
          $"pack_start", $"pack_end", $"start_offset")
    }),

    // Domain-mixture resampling (DoReMi/Llama-style static target weights):
    // keep the largest corpus achievable at exactly 50/30/20 over three
    // sources without upsampling any of them; every other source drops.
    // Membership is the deterministic hash, so the oracle pins the exact
    // kept set — which pins T = min_d(count_d/w_d) and every per-domain
    // rate transitively.
    "samp_domain_mixture" -> ((s, dir) => {
      import s.implicits._
      Sampling.mixtureResample(Tables.documents(s, dir), "doc_id", "source",
          weights = mixWeights)
        .select($"doc_id", $"source")
    }),

    // The upsampling form (epoch-weighted mixture, "rare domain ×4"):
    // same 50/30/20 target, but the rarest-vs-weight domain may repeat up
    // to 4 epochs; each row carries its 1-based replica index. The oracle
    // replays the millionths-of-copies arithmetic and the per-row
    // generate_series replication exactly.
    "samp_mixture_epochs" -> ((s, dir) => {
      import s.implicits._
      Sampling.mixtureResampleEpochs(Tables.documents(s, dir), "doc_id",
          "source", weights = mixWeights, epochsCap = 4.0)
        .select($"doc_id", $"source", $"epoch")
    }),

    // The resample's observability half: per-domain counts, target weights,
    // and keep thresholds — the report a curation run logs before
    // committing. Pins the threshold arithmetic explicitly (the membership
    // query above pins it implicitly).
    "samp_mixture_report" -> ((s, dir) =>
      Sampling.mixtureReport(Tables.documents(s, dir), "source", mixWeights)),

    // Deterministic 80/10/10 train/valid/test split, counted per language —
    // same doc lands in the same split on every run at every scale.
    "samp_split_counts" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .withColumn("split", Sampling.splitColumn($"doc_id",
          Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)))
        .groupBy($"lang", $"split")
        .agg(count(lit(1)).as("n_docs"))
    }))

  /** Mirrors Sampling.hashBucket: seeded 60-bit md5, mod 1e6. */
  private[queries] def duckBucket(seed: String, e: String) =
    s"""CAST(concat('0x', substr(md5(concat_ws('_', '$seed', $e)), 1, 15)) AS BIGINT) % 1000000"""

  /** The registered target mixture (Spark twin of the VALUES table in
    * `mixCtes` — same literals, same domains). Shared with the composed
    * curation pipeline. */
  private[queries] val mixWeights = Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2)

  /** The composed curation pipeline's target mixture — over `lang`, the
    * domain every corpus scale keeps populated through the upstream
    * scrub/dedup/quality/decon stages (source is too fine-grained at
    * sf0.01: several sources empty out and the no-upsampling mixture
    * would be unachievable). es/zh are deliberately unweighted — the
    * dropped-domain path is part of the operator. */
  private[queries] val curationMixWeights =
    Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.25)

  /** Mirrors Sampling.mixturePpm over an arbitrary relation and domain
    * column: counts as DOUBLE, T = MIN(c/w), threshold =
    * FLOOR(1e6 * t * w / c) in the SAME association order — the IEEE
    * double sequence is identical in both engines, so membership is
    * bit-reproducible. WITH-less fragment so the composed curation oracle
    * can resample its own survivor CTE. */
  private[queries] def mixCtesOver(rel: String, domainCol: String = "source",
                                   weights: Map[String, Double] = mixWeights): String = {
    val values = weights.toSeq.sortBy(_._1)
      .map { case (d, w) => s"('$d', ${w}e0)" }.mkString(", ")
    s"""w($domainCol, wt) AS (VALUES $values),
          cnt AS (SELECT $domainCol, CAST(COUNT(*) AS DOUBLE) AS c
                  FROM $rel JOIN w USING ($domainCol) GROUP BY $domainCol),
          tot AS (SELECT MIN(c / wt) AS t FROM cnt JOIN w USING ($domainCol)),
          rates AS (SELECT $domainCol, CAST(c AS BIGINT) AS n_docs, wt AS target_weight,
                      CAST(FLOOR(1000000e0 * t * wt / c) AS BIGINT) AS keep_ppm
                    FROM cnt JOIN w USING ($domainCol) CROSS JOIN tot)"""
  }

  private val mixCtes = s"WITH ${mixCtesOver("documents")}"

  /** Shared Spark side of the packing family: documents with the composite
    * shard key and a BIGINT token count (BIGINT in BOTH engines so every
    * column the gate hashes is uniformly int64). */
  private def packInput(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select($"doc_id", $"lang",
      graft.operators.TextAnalysis.whitespaceTokens($"text").cast("long").as("n_tokens"))
      .withColumn("shard", concat_ws("#", $"lang",
        pmod(Sampling.hashBucket($"doc_id", "pack"), lit(8L)).cast("string")))
  }

  private def packed(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Sampling.packSequences(packInput(s, dir), $"n_tokens", budget = 2048,
      shardCol = "shard", idCol = "doc_id")
  }

  /** Shared oracle CTEs for the packing family. Version-proof by
    * construction: the window SUM is cast straight back to BIGINT (DuckDB's
    * SUM over integers yields a HUGEINT/int128, whose downstream arithmetic
    * and client-side rendering are the one engine-version-sensitive spot in
    * this query), every `//` and `%` operand is provably non-negative
    * (`GREATEST(cum,1)-1`, never `cum-1`), and every output column is an
    * explicit BIGINT. */
  private def packCtes: String =
    s"""WITH t AS (
            SELECT doc_id, lang,
              concat_ws('#', lang,
                CAST((${duckBucket("pack", "CAST(doc_id AS VARCHAR)")}) % 8 AS VARCHAR)) AS shard,
              CAST(${DuckSql.wc("text")} AS BIGINT) AS n_tokens
            FROM documents),
          c AS (
            SELECT doc_id, lang, shard, n_tokens,
              CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
            FROM t)"""

  val oracle: Map[String, String] = Map(
    "samp_stratified" ->
      s"""SELECT doc_id, lang FROM documents
          WHERE ${duckBucket("samp", "CAST(doc_id AS VARCHAR)")} <
            CASE lang WHEN 'en' THEN 100000 WHEN 'de' THEN 250000 ELSE 500000 END""",
    "samp_quality_weighted" ->
      s"""SELECT doc_id, lang, round(${DuckSql.quality}, 6) AS quality_score
          FROM documents
          WHERE ${duckBucket("qw", "CAST(doc_id AS VARCHAR)")} <
            CAST(FLOOR(round(${DuckSql.quality}, 6) * 1000000e0) AS BIGINT)""",
    "samp_pack_sequences" ->
      s"""$packCtes
          SELECT doc_id, lang, shard, n_tokens,
            CAST((cum - n_tokens) // 2048 AS BIGINT) AS pack_start,
            CAST(GREATEST((GREATEST(cum, 1) - 1) // 2048,
                          (cum - n_tokens) // 2048) AS BIGINT) AS pack_end,
            CAST((cum - n_tokens) % 2048 AS BIGINT) AS start_offset
          FROM c""",
    "samp_pack_cum" ->
      s"""$packCtes SELECT doc_id, shard, cum FROM c""",
    "samp_pack_bpe" ->
      s"""WITH RECURSIVE ${DuckSql.bpeWordTokenCtes(graft.operators.Bpe.frozen)},
          dtok AS (SELECT doc_id, unnest(${DuckSql.words("text")}) AS w FROM documents),
          bt AS (SELECT d.doc_id, d.lang, CAST(COALESCE(a.nb, 0) AS BIGINT) AS n_tokens
                 FROM documents d LEFT JOIN
                   (SELECT doc_id, SUM(n) AS nb FROM dtok JOIN wtok USING (w)
                    GROUP BY doc_id) a USING (doc_id)),
          t AS (
            SELECT doc_id, lang,
              concat_ws('#', lang,
                CAST((${duckBucket("pack", "CAST(doc_id AS VARCHAR)")}) % 8 AS VARCHAR)) AS shard,
              n_tokens
            FROM bt),
          c AS (
            SELECT doc_id, lang, shard, n_tokens,
              CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
            FROM t)
          SELECT doc_id, lang, shard, n_tokens,
            CAST((cum - n_tokens) // 2048 AS BIGINT) AS pack_start,
            CAST(GREATEST((GREATEST(cum, 1) - 1) // 2048,
                          (cum - n_tokens) // 2048) AS BIGINT) AS pack_end,
            CAST((cum - n_tokens) % 2048 AS BIGINT) AS start_offset
          FROM c""",
    "samp_domain_mixture" ->
      s"""$mixCtes
          SELECT d.doc_id, d.source
          FROM documents d JOIN rates r USING (source)
          WHERE ${duckBucket("mix", "CAST(d.doc_id AS VARCHAR)")} < r.keep_ppm""",
    "samp_mixture_report" ->
      s"""$mixCtes
          SELECT source, n_docs, target_weight, keep_ppm FROM rates""",
    "samp_mixture_epochs" ->
      s"""WITH w(source, wt) AS (VALUES ('src0', 0.5e0), ('src1', 0.3e0), ('src2', 0.2e0)),
          cnt AS (SELECT source, CAST(COUNT(*) AS DOUBLE) AS c
                  FROM documents JOIN w USING (source) GROUP BY source),
          tot AS (SELECT MIN(c * 4.0e0 / wt) AS t FROM cnt JOIN w USING (source)),
          rates AS (SELECT source,
                      CAST(FLOOR(1000000e0 * t * wt / c) AS BIGINT) AS ppm_total
                    FROM cnt JOIN w USING (source) CROSS JOIN tot),
          base AS (SELECT d.doc_id, d.source,
                     r.ppm_total // 1000000
                       + CASE WHEN ${duckBucket("mix", "CAST(d.doc_id AS VARCHAR)")}
                                   < r.ppm_total % 1000000 THEN 1 ELSE 0 END AS n
                   FROM documents d JOIN rates r USING (source))
          SELECT doc_id, source, unnest(generate_series(1, n)) AS epoch
          FROM base WHERE n >= 1""",
    "samp_split_counts" ->
      s"""SELECT lang,
            CASE WHEN b < 800000 THEN 'train'
                 WHEN b < 900000 THEN 'valid'
                 ELSE 'test' END AS split,
            CAST(COUNT(*) AS BIGINT) AS n_docs
          FROM (SELECT lang, ${duckBucket("split", "CAST(doc_id AS VARCHAR)")} AS b
                FROM documents)
          GROUP BY 1, 2""")
}
