package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the shared fixture directory (TESTDATA.md).
  *
  * Every registered query receives an `sfDir` and reads through here, so the
  * scan always goes through the vectorized parquet reader with Catalyst
  * handling column pruning / filter pushdown. At cluster scale the same calls
  * work unchanged against a directory of many part-files.
  */
object Tables {
  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(path(dir, name))

  // RAG-domain tables (reference data model, SURVEY.md §1)
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
  /** Fixture generations disagree on the events `ts` physical type: older
    * driver fixtures (and [[ScaleGen]] output) store TIMESTAMP(NANOS), which
    * Spark's reader only accepts as long via `nanosAsLong` — truncate those
    * to microseconds with integral `div` (not `/`; double division loses
    * precision above 2^53). Newer fixtures store TIMESTAMP(MICROS) directly
    * (read as TIMESTAMP_NTZ). Normalize both to session-TZ TimestampType so
    * every downstream window/as-of/streaming consumer sees one type. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  }

  // TPC-H-ish star schema (relational operator coverage)
  def region(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
}
