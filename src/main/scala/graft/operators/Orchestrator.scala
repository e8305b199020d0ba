package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Advanced-search orchestration (SURVEY.md §2.7 X2-X3, §3.1): the
  * driver-side control flow that mirrors the reference's
  * AdvancedSearchOrchestrator (/root/reference/src/feature_pipeline/
  * advanced_search.py:68-226) — normalize the query, classify intent, pick
  * strategies, execute each as a DataFrame plan, threshold-filter, fuse,
  * diversity-filter.
  *
  * Strategy selection is plan construction, not data flow: it decides WHICH
  * sub-plans get composed, then Catalyst optimizes the composed plan as one.
  */
object Orchestrator {

  /** Per-strategy configuration (advanced_search.py:53-66). */
  case class StrategyConfig(name: String, weight: Double, maxResults: Int, threshold: Double)

  val SimilarityConfig  = StrategyConfig("similarity", 0.6, 15, 0.7)
  val ParentChildConfig = StrategyConfig("parent_child", 0.4, 8, 0.65)

  /** X4 + X2 driver-side: normalize then classify intent (same buckets as
    * TextFunctions.queryIntent, for plan-construction use). */
  def queryIntent(query: String): String = {
    val q = query.trim.replaceAll("\\s+", " ").toLowerCase(java.util.Locale.ROOT)
    if (Seq("api", "code", "function", "class", "implement").exists(q.contains)) "technical"
    else if (Seq("how to", "how do", "steps", "tutorial").exists(q.contains)) "how-to"
    else if (Seq("error", "problem", "issue", "fix", "debug").exists(q.contains)) "problem-solving"
    else if (Seq("what is", "explain", "concept", "theory").exists(q.contains)) "conceptual"
    else "general"
  }

  val HybridConfig = StrategyConfig("hybrid", 0.5, 10, 0.0)

  /** X3: which strategies run for an intent (advanced_search.py:172-206):
    * similarity always; parent_child for conceptual/general/technical/how-to;
    * hybrid behind its feature flag. (The reference enumerates a HYBRID
    * strategy but ships no config for it, so its hybrid path silently
    * returns [] — here it is a first-class strategy backed by
    * Fusion.hybridSearch.) */
  def selectStrategies(intent: String, parentChildEnabled: Boolean = true,
                       hybridEnabled: Boolean = false): Seq[StrategyConfig] = {
    val parentChildIntents = Set("conceptual", "general", "technical", "how-to")
    Seq(Some(SimilarityConfig),
        if (parentChildEnabled && parentChildIntents.contains(intent)) Some(ParentChildConfig)
        else None,
        if (hybridEnabled) Some(HybridConfig) else None).flatten
  }

  /** §3.1 end-to-end: embed query → run selected strategies over flat and
    * parent-child chunk corpora → threshold per strategy → weighted fusion →
    * driver-side diversity filter over the collected top-N. Returns the final
    * ranked results re-parallelized as a DataFrame. */
  def search(spark: SparkSession, flatChunks: DataFrame, childChunks: DataFrame,
             queryText: String, maxResults: Int = 10,
             idCol: String = "chunk_id", embCol: String = "embedding",
             contentCol: String = "content", hybridEnabled: Boolean = false): DataFrame = {
    import spark.implicits._
    val intent = queryIntent(queryText)
    val qv = Embedder.embedText(queryText)
    val corpusFor = Map("similarity" -> flatChunks, "parent_child" -> childChunks,
      "hybrid" -> flatChunks)

    val strategies = selectStrategies(intent, hybridEnabled = hybridEnabled).map { cfg =>
      val scored = cfg.name match {
        case "hybrid" =>
          Fusion.hybridSearch(corpusFor(cfg.name), qv, queryText, cfg.maxResults,
            idCol, contentCol, embCol)
        case _ =>
          VectorSearch.knn(
            corpusFor(cfg.name),
            VectorSearch.SearchRequest(qv, limit = cfg.maxResults, minScore = Some(cfg.threshold)),
            embCol, idCol)
      }
      Fusion.Strategy(cfg.name, cfg.weight, scored.select(col(idCol), col("score")))
    }

    val fused = Fusion.fuseStrategies(strategies, maxResults, idCol)
    // payload join for diversity filtering (content needed for Jaccard).
    // The fused side is ≤ maxResults rows by construction — broadcast it
    // into the payload scan, so the corpora are scanned (column-pruned to
    // id+content) but never shuffled; a dropDuplicates BEFORE the join
    // would instead shuffle the full corpus content payload to serve ~10
    // rows. Dedup after the join is id-disjoint-safe and operates on the
    // joined handful.
    // the post-join select rebuilds column order from fused.columns and
    // appends contentCol from the payload side — a fused frame that ever
    // grew its own contentCol would make that select ambiguous at runtime;
    // fail loudly at construction instead (ADVICE r19)
    require(!fused.columns.contains(contentCol),
      s"fused strategies must not carry the payload column '$contentCol'")
    val payload = flatChunks.select(col(idCol), col(contentCol))
      .unionByName(childChunks.select(col(idCol), col(contentCol)))
    val collected = payload.join(broadcast(fused), idCol)
      .dropDuplicates(idCol)
      .select((col(idCol) +: fused.columns.filterNot(_ == idCol).map(col)
        :+ col(contentCol)).toIndexedSeq: _*)
      .orderBy(col("score").desc, col(idCol).asc)
      .collect().toSeq // ≤ maxResults rows — the reference's driver-side step
    val diverse = Fusion.diversityFilter[org.apache.spark.sql.Row](
      collected, r => r.getAs[String](contentCol))
    val rows = diverse.map(r => (r.getAs[String](idCol), r.getAs[Double]("score"),
      r.getAs[String]("strategies"), r.getAs[String](contentCol)))
    rows.toDF(idCol, "score", "strategies", contentCol)
  }
}
