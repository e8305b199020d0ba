package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Source attribution + context assembly (SURVEY.md §2.3 J1-J2, §2.4 A5,
  * §2.2 P8).
  *
  * The reference attributes each search hit to its parent document via N
  * point lookups with a hand-rolled cache
  * (/root/reference/src/feature_pipeline/source_attribution.py:23-129) — in
  * Spark that is a single broadcast hash join against the (small projected)
  * documents dimension: build side shipped once per executor, no shuffle of
  * the results stream at any corpus size.
  */
object Attribution {

  /** J1: join document payload onto results. `docCols` are the projected
    * attribution columns (title/url/source/type equivalents).
    *
    * SIZE-AWARE (the ×10000 decade's finding): broadcasting the documents
    * dimension is right while it is dimension-SIZED — shipped once per
    * executor, no shuffle — but `broadcast(dims)` does not survive a 100×
    * corpus: at 50M documents the driver collects and re-ships ~n rows PER
    * QUERY (measured: the broadcast dominated every ×10000 probe at
    * 30–45 s of a 48 s wall; at 100 TB it is a driver OOM). Past
    * `dimsBroadcastMaxBytes` (file-stat sizing from the optimized plan —
    * free, no job) the join flips to the serving shape: the TOP-K result
    * keys broadcast INTO one pruned scan of the dimension (left-semi), and
    * the ≤ k surviving dim rows broadcast back onto the results — LEFT
    * semantics preserved exactly (a hit whose document is gone — e.g. an
    * ingested chunk whose doc never entered the fixture table — keeps its
    * null attribution). `localCheckpoint(lazy)` pins the results subtree
    * so the probe is not recomputed for the key side. */
  def attachSources(results: DataFrame, documents: DataFrame,
                    resultKey: String, docKey: String,
                    docCols: Seq[String],
                    dimsBroadcastMaxBytes: Long = 64L << 20): DataFrame = {
    val dims = documents.select((docKey +: docCols).map(col): _*)
    // size the PROJECTED plan, not the full relation: column pruning is
    // reflected in the optimizer's estimate, so a wide dimension with a
    // narrow payload still takes the straight broadcast path
    val dimsBytes =
      try dims.queryExecution.optimizedPlan.stats.sizeInBytes
      catch { case scala.util.control.NonFatal(_) => BigInt(Long.MaxValue) }
    if (dimsBytes <= dimsBroadcastMaxBytes) {
      results.join(broadcast(dims), results(resultKey) === dims(docKey), "left")
        .drop(dims(docKey))
    } else {
      val hits = results.localCheckpoint(false)
      val keys = hits.select(col(resultKey).as("__hit_key")).distinct()
      val dimsNeeded = dims.join(broadcast(keys),
        dims(docKey) === col("__hit_key"), "left_semi")
      hits.join(broadcast(dimsNeeded), hits(resultKey) === dimsNeeded(docKey), "left")
        .drop(dimsNeeded(docKey))
    }
  }

  /** A5: unique sources, first-wins by score within a source key
    * (source_attribution.py:131-173): rank rows per source, keep the top one,
    * order by score. */
  def dedupSources(sources: DataFrame, sourceKey: String = "source",
                   scoreCol: String = "score", idCol: String = "id"): DataFrame = {
    val w = Window.partitionBy(col(sourceKey))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    sources.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** P8 exact form (rag_engine.py:230-258): sequential greedy packing —
    * skip any result that would overflow `maxTotalTokens` (using its
    * UNtruncated size, like the reference), truncate any single result above
    * `maxTokensPerDoc`, accumulate. Inherently sequential; run over the
    * collected top-N results (the reference operates on ≤ 15 rows). */
  def packContextExact(results: Seq[(String, String, Double)],
                       maxTotalTokens: Int = 128000,
                       maxTokensPerDoc: Int = 10000): Seq[(String, String, Double)] = {
    var total = 0L
    val kept = scala.collection.mutable.ArrayBuffer.empty[(String, String, Double)]
    for ((id, content, score) <- results) {
      val tokens = content.length / 4
      if (total + tokens <= maxTotalTokens) {
        val (outContent, outTokens) =
          if (tokens > maxTokensPerDoc)
            (content.substring(0, maxTokensPerDoc * 4) + "...", maxTokensPerDoc.toLong)
          else (content, tokens.toLong)
        kept += ((id, outContent, score))
        total += outTokens
      }
    }
    kept.toSeq
  }

  /** P8 window form: prefix-sum packing — truncate each result to
    * `maxTokensPerDoc`, keep the maximal score-ordered prefix whose
    * cumulative (truncated) token count fits `maxTotalTokens`. Deviation
    * from the reference's skip-and-continue greedy (which cannot be a
    * prefix-sum at scale) is intentional and documented: a skipped row never
    * readmits later rows here.
    *
    * NOTE: the window funnels input through one task by design — context
    * packing consumes a top-N result set (≤ thousands of rows), never a
    * corpus. Feed it `limit(...)` output. The constant partition key below
    * states that single-partition contract explicitly in the plan (instead
    * of tripping Spark's "No Partition Defined for Window" warning, which
    * reads like an unreviewed scale bug); corpus-scale packing is
    * [[Sampling.packSequences]], which shards. */
  def packContextWindow(results: DataFrame, maxTotalTokens: Long, maxTokensPerDoc: Long,
                        idCol: String = "id", contentCol: String = "content",
                        scoreCol: String = "score"): DataFrame = {
    // constant-valued but non-foldable (Spark's EliminateWindowPartitions
    // drops a literal key and re-warns): every row keys to 0, one partition.
    // coalesce OUTSIDE the multiply makes the key null-proof — bare
    // length(NULL)*0 is NULL, which would put null-content rows in their
    // OWN window partition with an independent running sum (admitted
    // against the budget a second time) — while keeping it non-foldable:
    // coalesce(length(c),0)*0 has a non-nullable left operand, which
    // constant-folds to literal 0 and the key is dropped again
    val onePart = coalesce(length(col(contentCol)) * 0, lit(0))
    val w = Window.partitionBy(onePart)
      .orderBy(col(scoreCol).desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    results
      .withColumn("doc_tokens",
        least(floor(length(col(contentCol)) / 4), lit(maxTokensPerDoc)).cast("long"))
      .withColumn("cum_tokens", sum(col("doc_tokens")).over(w))
      .filter(col("cum_tokens") <= maxTotalTokens)
      .withColumn(contentCol,
        when(floor(length(col(contentCol)) / 4) > maxTokensPerDoc,
          concat(substring(col(contentCol), 1, (maxTokensPerDoc * 4).toInt), lit("...")))
          .otherwise(col(contentCol)))
  }
}
