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

  /** Flagship (SURVEY.md §7.3 minimum slice): documents → quality filter →
    * clean → chunk → embed → cosine KNN for an embedded text query →
    * broadcast attribution join → ranked hits. One operator from every major
    * family, end to end. */
  def entry(spark: SparkSession): DataFrame =
    graft.pipelines.Pipelines.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++
    DocQueries.queries ++
    EventQueries.queries ++
    VectorQueries.queries ++
    TextQueries.queries ++
    FusionQueries.queries ++
    DedupQueries.queries ++
    AnalysisQueries.queries ++
    SamplingQueries.queries ++
    PipelineQueries.queries

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
    AnalysisQueries.oracle ++
    SamplingQueries.oracle ++
    PipelineQueries.oracle
}
