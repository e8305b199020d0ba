package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units" — the public algorithm
  * GPT-style tokenizers derive from), deterministic and engine-replayable.
  * Reference north star: real token accounting over `documents` — the
  * reference's len/4 estimate (F5, `document_processor.py` token budget)
  * and the whitespace counts underpinning packing (N26) and percentiles
  * (N12) become actual subword counts.
  *
  * TRAINING runs on the corpus' word-frequency table: ONE bounded
  * aggregation (top `maxVocab` words by (count desc, word asc) — the
  * LM-vocab operator's bounded-collect shape), then the classic merge
  * loop driver-side over that table: repeatedly merge the most frequent
  * adjacent symbol pair, ties broken lexicographically — training is a
  * pure function of the word counts, reproducible anywhere.
  *
  * ENCODING applies the merges in rank order per word: find the
  * minimum-rank applicable pair, merge every occurrence left-to-right,
  * repeat. A pair involving a merged symbol can only be LEARNED after the
  * merge that created the symbol, so its rank is strictly higher — which
  * makes this equal to the one-at-a-time leftmost-occurrence form the
  * DuckDB oracle replays (a recursive CTE splicing one occurrence per
  * step, ordered by rank). Words are the dedup family's tokenization
  * (lowercased, [a-z0-9]+ — `TextSearch.tokens`), so every symbol is a
  * plain alnum string: safely embeddable as a SQL literal, no end-of-word
  * marker needed for parity, and the frozen merges file is plain TSV.
  *
  * The FROZEN merges table (`frozen`) is the deployment artifact — real
  * tokenizers are trained once and shipped, not retrained per corpus; it
  * was produced by [[graft.BpeTrain]] on the sf0.01 fixture and lives as
  * a classpath resource so the registered rows and their oracles replay
  * the identical table at every scale. [[graft.BpeCatalog]] is the
  * stored-catalog form for corpus-specific retraining.
  *
  * Scale shape: training is one column-pruned word-count aggregation with
  * a vocab-bounded collect; encoding is a compiled per-row kernel (the
  * measured pattern for hot per-word loops — spanDigestsScala,
  * minHashShingleTable) with a per-JVM word→tokens memo, zero shuffles.
  */
object Bpe {

  /** Driver-side BPE merge loop over a word-frequency table. Stops early
    * when no adjacent pair occurs at least twice (weighted by word
    * frequency) — merging a once-seen pair memorizes noise. */
  def trainFromCounts(wordCounts: Seq[(String, Long)],
                      nMerges: Int): Vector[(String, String)] = {
    require(nMerges > 0, s"nMerges must be positive, got $nMerges")
    // symbol sequences with frequencies; identical words merge their counts
    var vocab: Map[Vector[String], Long] = wordCounts
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      .map { case (w, c) => w.map(_.toString).toVector -> c }
    val out = Vector.newBuilder[(String, String)]
    var step = 0
    var done = false
    while (step < nMerges && !done) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + c
          i += 1
        }
      }
      if (pairCounts.isEmpty || pairCounts.values.max < 2L) done = true
      else {
        // deterministic: max count, then lexicographically smallest pair
        val best = pairCounts.toSeq
          .minBy { case ((l, r), c) => (-c, l, r) }._1
        out += best
        vocab = vocab.map { case (syms, c) => (mergePair(syms, best), c) }
        step += 1
      }
    }
    out.result()
  }

  /** Merge every occurrence of `pair` in `syms`, left-to-right,
    * non-overlapping. */
  private def mergePair(syms: Vector[String],
                        pair: (String, String)): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        b += (pair._1 + pair._2); i += 2
      } else { b += syms(i); i += 1 }
    }
    b.result()
  }

  /** Train on a corpus text column: one bounded word-count aggregation
    * (top `maxVocab` by (count desc, word asc)), then [[trainFromCounts]]. */
  def train(df: org.apache.spark.sql.DataFrame, textCol: String = "text",
            nMerges: Int = 200, maxVocab: Int = 20000): Vector[(String, String)] = {
    val wc = df.select(explode(Dedup.words(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc).limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    trainFromCounts(wc, nMerges)
  }

  /** The frozen deployment merges (classpath resource, produced by
    * [[graft.BpeTrain]] — see the object doc). */
  lazy val frozen: Vector[(String, String)] = {
    val in = getClass.getResourceAsStream("/graft/bpe_merges.tsv")
    require(in != null, "frozen BPE merges resource missing from classpath")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().filter(_.nonEmpty).zipWithIndex.map { case (line, i) =>
      // a corrupted deployment artifact must name itself, not MatchError
      line.split("\t", 3) match {
        case Array(_, l, r) => (l, r)
        case parts => throw new IllegalStateException(
          s"frozen BPE merges resource /graft/bpe_merges.tsv is corrupt: " +
            s"line ${i + 1} has ${parts.length} tab-separated fields, " +
            "expected 3 (rank, left, right)")
      }
    }.toVector
    finally src.close()
  }

  // per-JVM encode state: rank table + word→tokens memo per merges table.
  // The memo is distinct-word-bounded; the size guard only trips on a
  // pathological corpus (every word unique at huge scale) and resets
  // rather than grows without bound.
  private final class WordEncoder(merges: Vector[(String, String)]) {
    val ranks = new java.util.HashMap[String, Int]()
    merges.zipWithIndex.foreach { case ((l, r), i) => ranks.put(l + " " + r, i) }
    val memo = new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()

    def encode(word: String): Array[String] = {
      val hit = memo.get(word)
      if (hit != null) return hit
      var syms = {
        val a = new Array[String](word.length)
        var i = 0
        while (i < word.length) { a(i) = String.valueOf(word.charAt(i)); i += 1 }
        a
      }
      var continue = syms.length >= 2
      while (continue) {
        // minimum-rank applicable pair
        var bestRank = Int.MaxValue
        var i = 0
        while (i < syms.length - 1) {
          val r = ranks.getOrDefault(syms(i) + " " + syms(i + 1), Int.MaxValue)
          if (r < bestRank) bestRank = r
          i += 1
        }
        if (bestRank == Int.MaxValue) continue = false
        else {
          val (l, r) = merges(bestRank)
          val b = Array.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
              b += (l + r); j += 2
            } else { b += syms(j); j += 1 }
          }
          syms = b.result()
          continue = syms.length >= 2
        }
      }
      if (memo.size > (1 << 20)) memo.clear()
      memo.put(word, syms)
      syms
    }
  }

  private val encoders =
    new java.util.concurrent.ConcurrentHashMap[Vector[(String, String)], WordEncoder]()

  private def encoderFor(merges: Vector[(String, String)]): WordEncoder =
    encoders.computeIfAbsent(merges, m => new WordEncoder(m))

  /** Compiled per-row kernel: text → flat BPE token array. */
  private[graft] def tokensScala(text: String,
                                 merges: Vector[(String, String)]): Array[String] = {
    val enc = encoderFor(merges)
    Dedup.wordsScala(text).flatMap(enc.encode)
  }

  /** text → array<string> of BPE tokens under `merges`. */
  def tokens(textCol: Column, merges: Vector[(String, String)]): Column =
    udf((text: String) => tokensScala(text, merges)).apply(textCol)

  /** text → BPE token count (long) under `merges` — counts without
    * materializing the token array per row. */
  def tokenCount(textCol: Column, merges: Vector[(String, String)]): Column =
    udf((text: String) => tokensScala(text, merges).length.toLong).apply(textCol)
}
