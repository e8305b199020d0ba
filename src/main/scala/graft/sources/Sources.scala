package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** File-format sources/sinks (SURVEY.md §2.1). The reference's collectors
  * (Notion REST, web crawl) are external connectors out of engine scope;
  * what the engine owns is the storage-format surface: parquet is primary
  * (columnar, predicate-pushdown, split-friendly), ORC is the columnar
  * alternate, JSON covers the reference's backup dumps (S11), CSV covers
  * tabular interchange. All readers take an explicit schema — at 100 TB,
  * schema inference is a full extra pass over the data.
  */
object Sources {

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true): DataFrame =
    spark.read.schema(schema).option("header", header.toString)
      .option("quote", "\"").option("escape", "\"").csv(path)

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite").option("header", header.toString)
      .option("quote", "\"").option("escape", "\"").csv(path)
}
