package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling — the reproducible alternative to
  * `DataFrame.sample` for corpus curation. `sample` draws from a per-task
  * RNG: the kept set changes with partitioning, retries, and scale-factor,
  * so a 10% sample taken today and the "same" sample taken after a backfill
  * share nothing. Hashing a stable id instead makes membership a pure
  * function of the row: the decision is reproducible across runs, engines
  * (the md5-60-bit family is bit-identical in Spark, DuckDB, and the Scala
  * kernels — see Dedup.md5Hash60), cluster sizes, and time, and a row keeps
  * its fate when the corpus grows around it. Fully codegen'd column
  * expressions, shuffle-free: the filter evaluates inside the scan stage
  * and composes with predicate pushdown on other columns.
  *
  * Stratified form: per-stratum keep-rates (e.g. downsample the dominant
  * language, keep the rare ones) as a literal CASE chain — no join, no
  * shuffle, rates resolved at plan time.
  */
object Sampling {

  /** Uniform hash bucket in [0, 1e6): seeded 60-bit md5 of the id, mod 1e6.
    * Separate seeds give independent samples from the same corpus. */
  def hashBucket(idCol: Column, seed: String): Column =
    pmod(Dedup.md5Hash60(idCol.cast("string"), lit(seed)), lit(1000000L))

  /** Keep each row iff its hash bucket falls under its stratum's rate.
    * `rates` maps stratum value → keep fraction; `default` covers strata
    * not listed. Expected kept fraction per stratum is exact to 1e-6.
    * The rate table is a single map literal, not a per-stratum
    * when-chain: a curation job stratifying on (lang × domain) can carry
    * thousands of strata, and a chain nesting one plan level per stratum
    * overflows the stack converting the Column tree (the compaction
    * plan-depth bug's class — found at ×1000, fixed everywhere).
    * Keys match the COLUMN'S CANONICAL STRING FORM (`strataCol` is cast to
    * string for the lookup): for a non-string strata column, write keys the
    * way Spark renders the value — `"1.0"` for a double 1.0, not `"1"`.
    * A key that cannot round-trip through the column's type is rejected at
    * plan time (it could never match any row, so the stratum would silently
    * sample at `default` — the fail-loud guard converts that to an error);
    * a stratum VALUE absent from the map still falls through to `default`
    * by design. The lookup is `try_element_at`, so a missing key is an
    * explicit NULL → `default` under any ANSI mode, version-proof. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       rates: Map[String, Double], default: Double,
                       seed: String = "samp"): DataFrame = {
    def ppm(f: Double): Long = {
      require(f >= 0.0 && f <= 1.0, s"rate $f outside [0,1]")
      math.round(f * 1e6)
    }
    val dt = df.schema(strataCol).dataType
    if (dt != org.apache.spark.sql.types.StringType) {
      import org.apache.spark.sql.catalyst.expressions.{Cast, EvalMode, Literal}
      rates.keys.foreach { k =>
        val parsed = Cast(Literal(k), dt, Some("UTC"), EvalMode.TRY).eval()
        val back = Option(parsed).map(p =>
          Cast(Literal.create(p, dt), org.apache.spark.sql.types.StringType,
            Some("UTC"), EvalMode.TRY).eval().toString).orNull
        require(back == k,
          s"rate key '$k' is not the canonical string form of a $dt value " +
            s"(round-trips to '$back') — it can never match $strataCol and the " +
            "stratum would silently sample at the default rate")
      }
    }
    val threshold =
      if (rates.isEmpty) lit(ppm(default))
      else coalesce(
        try_element_at(typedLit(rates.map { case (k, v) => k -> ppm(v) }),
          col(strataCol).cast("string")),
        lit(ppm(default)))
    df.filter(hashBucket(col(idCol), seed) < threshold)
  }

  /** Sequence packing for training batches (GPT-style concat-and-cut): lay
    * the corpus' token stream out in deterministic (shardCol, idCol) order
    * and cut it every `budget` tokens. Each document's span is
    * [cum − n_tokens, cum) in its shard's stream; the output says which
    * pack the document starts in, which it ends in (a doc longer than the
    * remaining budget spills across the cut — the standard pretraining
    * packing, no padding, docs split at pack boundaries), and its offset
    * inside the start pack.
    *
    * Scale shape: ONE ranking window partitioned by `shardCol` — packing is
    * per-shard by construction (exactly how a 1000-executor packing job
    * shards: state per partition is one shard's running sum, shards pack
    * independently and in parallel). No global order exists, and none is
    * needed: pack ids are (shard, local pack number) pairs. Prefix sums are
    * exact LONG arithmetic — bit-stable across engines, asserted by the
    * DuckDB oracle.
    *
    * Output keeps the raw running sum as `cum` alongside the three derived
    * columns: the prefix sum is the one stateful quantity in the operator,
    * and exposing it lets a caller (or a cross-engine correctness gate)
    * check the window independently of the derived arithmetic.
    *
    * Every `div`/`%` operand here is provably non-negative (`cum ≥ 0`,
    * `cum − tokens ≥ 0`, and the "last token index" is written
    * `greatest(cum,1) − 1`, never the possibly-negative `cum − 1`), so
    * truncating and flooring division agree and the arithmetic is
    * bit-identical across engines and engine versions. */
  def packSequences(df: DataFrame, tokensCol: Column, budget: Int,
                    shardCol: String, idCol: String): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    // `cum` is a documented output column; a caller-supplied column of the
    // same name would be silently overwritten by the withColumn below
    require(!df.columns.contains("cum"),
      "input already has a column named 'cum' — packSequences reserves that name for its running-sum output")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(shardCol)).orderBy(col(idCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val b = lit(budget.toLong)
    // ONE window node: materialize the prefix sum once, derive the three
    // pack columns from it in plain (window-free) projections.
    val withCum = df.withColumn("cum", sum(tokensCol.cast("long")).over(w))
    val docStart = col("cum") - tokensCol.cast("long")
    // exact integral division (SQL `div`), NOT double `/`-then-cast: a
    // shard's running sum past 2^53 would round under double division and
    // silently break parity with the oracle's `//` and the streaming twin
    def floorDiv(x: Column): Column = call_function("div", x, b)
    withCum
      .withColumn("pack_start", floorDiv(docStart))
      .withColumn("pack_end",
        greatest(floorDiv(greatest(col("cum"), lit(1L)) - lit(1L)), floorDiv(docStart)))
      .withColumn("start_offset", pmod(docStart, b))
  }

  /** Deterministic train/validation/test split: fractions in order, e.g.
    * Seq("train" -> 0.9, "valid" -> 0.05, "test" -> 0.05). Returns the input
    * plus a `split` column; same id → same split, forever. */
  def splitColumn(idCol: Column, fractions: Seq[(String, Double)],
                  seed: String = "split"): Column = {
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    val bucket = hashBucket(idCol, seed)
    val cuts = fractions.scanLeft(0L) { case (acc, (_, f)) => acc + math.round(f * 1e6) }
    fractions.zip(cuts.tail).init.foldRight(lit(fractions.last._1)) {
      case (((name, _), cut), acc) => when(bucket < lit(cut), lit(name)).otherwise(acc)
    }
  }

  /** Per-domain row counts for the weighted domains — ONE column-pruned
    * count aggregation whose result is domain-shaped (a dimension, never
    * corpus-shaped; the bounded-collect pattern of the LM-vocab operator).
    * Fails loudly on a malformed mixture: weights must be positive and sum
    * to 1, the domain column must be string-typed, and every weighted
    * domain must actually have rows (an empty weighted domain makes the
    * target unachievable without upsampling — T would be 0 and the
    * "resampled corpus" silently empty). */
  private def mixtureCounts(df: DataFrame, domainCol: String,
                            weights: Map[String, Double]): Map[String, Long] = {
    require(weights.nonEmpty, "empty target mixture")
    weights.foreach { case (d, w) =>
      require(w > 0.0, s"target weight for '$d' must be positive, got $w")
    }
    require(math.abs(weights.values.sum - 1.0) < 1e-9,
      s"target mixture weights must sum to 1, got ${weights.values.sum}")
    require(df.schema(domainCol).dataType == org.apache.spark.sql.types.StringType,
      s"$domainCol must be a string domain column, got ${df.schema(domainCol).dataType}")
    val counts = df
      .filter(col(domainCol).isin(weights.keys.toSeq: _*))
      .groupBy(col(domainCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    weights.keys.foreach { d =>
      require(counts.contains(d),
        s"weighted domain '$d' has no rows — the target mixture is " +
          "unachievable without upsampling (T = min_d count_d/w_d would be 0)")
    }
    counts
  }

  /** Keep thresholds (ppm of the hash space) realizing the target mixture:
    * T = min_d(count_d / w_d) is the largest total corpus achievable
    * without upsampling any domain, and domain d keeps T·w_d/count_d of
    * its rows. All arithmetic is IEEE double in ONE fixed association
    * order — `1e6 * t * w / count` — so a DuckDB oracle recomputing the
    * thresholds from the same counts reproduces the exact membership
    * bit-for-bit. The floor may shave the limiting domain to 999999 ppm
    * (~1 row per million); deterministic and engine-identical. */
  def mixturePpm(df: DataFrame, domainCol: String,
                 weights: Map[String, Double]): Map[String, Long] =
    ppmFromCounts(mixtureCounts(df, domainCol, weights), weights)

  private def ppmFromCounts(counts: Map[String, Long],
                            weights: Map[String, Double]): Map[String, Long] = {
    val t = weights.map { case (d, w) => counts(d) / w }.min
    weights.map { case (d, w) =>
      d -> math.floor(1e6 * t * w / counts(d)).toLong
    }
  }

  /** Resample the corpus to a TARGET DOMAIN MIXTURE — the pretraining
    * data-mixture rebalancing move ("50% web, 30% code, 20% books";
    * DoReMi / Llama-style static mixture weights,
    * reference north star: curating `documents` by `source`). Keeps the
    * largest corpus achievable at exactly the target proportions WITHOUT
    * upsampling any domain; domains absent from `weights` are dropped.
    * Membership is the same deterministic hash as [[stratifiedSample]]:
    * a pure function of the row id, reproducible across runs, engines,
    * and corpus growth.
    *
    * Scale shape: one column-pruned count aggregation (domain-shaped
    * result, bounded collect) to resolve the thresholds at plan time, then
    * one shuffle-free codegen'd filter that composes with scan pushdown —
    * at 100 TB the whole operator is a count pass plus a narrow filtered
    * scan, no shuffle of the corpus ever. */
  def mixtureResample(df: DataFrame, idCol: String, domainCol: String,
                      weights: Map[String, Double],
                      seed: String = "mix"): DataFrame = {
    val ppm = mixturePpm(df, domainCol, weights)
    df.filter(hashBucket(col(idCol), seed) <
      coalesce(try_element_at(typedLit(ppm), col(domainCol)), lit(0L)))
  }

  /** [[mixtureResample]] with bounded UPSAMPLING — the epoch-weighted
    * mixture every real pretraining run uses (rare high-quality domains
    * repeat for a few epochs, e.g. "Wikipedia ×4"; Llama/GPT-3 style).
    * T = min_d(count_d · epochsCap / w_d) is the largest total where no
    * domain repeats more than `epochsCap` times; domain d's rows each
    * appear floor(r_d) times plus once more for the deterministic
    * hash-fraction of rows, r_d = T·w_d/count_d. Output rows carry an
    * `epoch` column (1-based replica index) — row identity is (id, epoch),
    * ready for a training-shard writer. `epochsCap = 1` degenerates to
    * [[mixtureResample]]'s membership with epoch ≡ 1.
    *
    * The threshold math floors ONCE — ppmTotal_d = floor(1e6·T·w_d/count_d),
    * millionths-of-copies — and splits full copies / fractional remainder
    * by exact integer div/mod, so engines agree bit-for-bit. Scale shape:
    * the replication is a codegen'd explode of a ≤ ⌈epochsCap⌉-element
    * sequence — narrow, no shuffle, output ∝ T. */
  def mixtureResampleEpochs(df: DataFrame, idCol: String, domainCol: String,
                            weights: Map[String, Double],
                            epochsCap: Double = 4.0,
                            seed: String = "mix"): DataFrame = {
    require(epochsCap >= 1.0, s"epochsCap must be at least 1, got $epochsCap")
    require(!df.columns.contains("epoch"),
      "input already has a column named 'epoch' — mixtureResampleEpochs " +
        "reserves that name for its replica index")
    val counts = mixtureCounts(df, domainCol, weights)
    val t = weights.map { case (d, w) => counts(d) * epochsCap / w }.min
    val ppmTotal = weights.map { case (d, w) =>
      d -> math.floor(1e6 * t * w / counts(d)).toLong
    }
    val tot = coalesce(try_element_at(typedLit(ppmTotal), col(domainCol)), lit(0L))
    val full = call_function("div", tot, lit(1000000L))
    val frac = pmod(tot, lit(1000000L))
    val nCopies = full +
      when(hashBucket(col(idCol), seed) < frac, lit(1L)).otherwise(lit(0L))
    // sequence(1, n) must never see n < 1: Spark infers step -1 when
    // start > stop and would generate DESCENDING epochs, not an empty list
    df.withColumn("epoch",
        explode(when(nCopies >= 1L, sequence(lit(1L), nCopies))
          .otherwise(array().cast("array<long>"))))
  }

  /** The ingest loops' "arriving corpus has drifted from the target
    * mixture" signal — the curation twin of the reindex nlist-drift
    * advice (surface on the maintenance cadence, never act: rebalancing
    * is a curation decision, not something a cadence should trigger
    * implicitly). `observed` is each weighted domain's share of the
    * weighted arrivals; `maxDrift` the worst |observed − target|;
    * `otherArrivals` counts rows from domains the mixture doesn't weight
    * (their growth is its own drift mode — a corpus silently filling
    * with unweighted junk never moves `maxDrift`). */
  case class MixtureAdvice(counts: Map[String, Long],
                           target: Map[String, Double],
                           observed: Map[String, Double],
                           maxDrift: Double,
                           weightedArrivals: Long,
                           otherArrivals: Long) {
    override def toString: String = {
      val per = target.keys.toSeq.sorted.map { d =>
        f"$d: ${observed.getOrElse(d, 0.0)}%.3f vs ${target(d)}%.3f"
      }.mkString(", ")
      f"mixture drift ${maxDrift}%.3f over $weightedArrivals weighted " +
        s"arrivals ($per; $otherArrivals unweighted)"
    }
  }

  /** Drift of observed per-domain arrival counts against a target mixture
    * — pure arithmetic over driver-side counts (the loops accumulate them
    * one domain-shaped aggregation per micro-batch). Domains with zero
    * arrivals observe share 0 and still count toward the drift (a target
    * domain that stopped arriving is the loudest drift there is). */
  def mixtureDrift(counts: Map[String, Long], weights: Map[String, Double],
                   otherArrivals: Long = 0L): MixtureAdvice = {
    require(weights.nonEmpty, "empty target mixture")
    val weighted = weights.keys.map(d => d -> counts.getOrElse(d, 0L)).toMap
    val total = weighted.values.sum
    val observed =
      if (total == 0L) weights.keys.map(_ -> 0.0).toMap
      else weighted.map { case (d, c) => d -> c.toDouble / total }
    val maxDrift = weights.map { case (d, w) =>
      math.abs(observed(d) - w) }.max
    MixtureAdvice(weighted, weights, observed, maxDrift, total, otherArrivals)
  }

  /** Observability companion of [[mixtureResample]]: one row per weighted
    * domain — its row count, target weight, and keep threshold — the
    * "what will this resample do" report a curation run logs before
    * committing. Domain-shaped (built from the same bounded counts). */
  def mixtureReport(df: DataFrame, domainCol: String,
                    weights: Map[String, Double]): DataFrame = {
    val counts = mixtureCounts(df, domainCol, weights)
    val ppm = ppmFromCounts(counts, weights)
    val spark = df.sparkSession
    import spark.implicits._
    weights.keys.toSeq.sorted
      .map(d => (d, counts(d), weights(d), ppm(d)))
      .toDF(domainCol, "n_docs", "target_weight", "keep_ppm")
  }
}
