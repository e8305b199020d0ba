package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry is assembled from per-family modules under graft.queries;
  * each family pairs its Spark plans with DuckDB oracle SQL over the same
  * parquet tables.
  */
object SparkEntry {

  /** Flagship (SURVEY.md §7.3 minimum slice): documents → clean (F1) →
    * quality score (F2) → quality filter (P5) → top-10 by score — scan,
    * projection, codegen'd scalar tree, filter, TakeOrderedAndProject.
    * Grows to the full chunk→embed→KNN→attribution slice as slabs land. */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("clean_text", cleanContent($"text"))
      .withColumn("quality_score",
        qualityScore($"clean_text", lit(null).cast("string"), lit(null).cast("string")))
      .filter($"quality_score" >= 0.3)
      .orderBy($"quality_score".desc, $"doc_id".asc)
      .limit(10)
      .select($"doc_id", $"lang", $"source", round($"quality_score", 6).as("quality_score"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++
    DocQueries.queries ++
    EventQueries.queries ++
    VectorQueries.queries ++
    TextQueries.queries ++
    FusionQueries.queries ++
    DedupQueries.queries ++
    AnalysisQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++
    DocQueries.oracle ++
    EventQueries.oracle ++
    VectorQueries.oracle ++
    TextQueries.oracle ++
    FusionQueries.oracle ++
    DedupQueries.oracle ++
    AnalysisQueries.oracle
}
