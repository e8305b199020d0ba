package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Digest kernel shared by [[GoldenSpec]] and the [[GoldenPin]] re-pin tool:
  * (row count, md5 of sorted "|"-joined rows) with doubles rounded to 6,
  * array columns dropped (embeddings — float textual form is not the
  * contract), columns in name order. */
object GoldenDigest {

  def digest(df: DataFrame): (Long, String) = {
    val cols = df.schema.fields
      .filterNot(_.dataType.isInstanceOf[ArrayType])
      .sortBy(_.name)
      .map { f =>
        val c = col(f.name)
        val s = f.dataType match {
          case DoubleType => format_number(round(c, 6), 6)
          case _          => c.cast("string")
        }
        coalesce(s, lit("NULL"))
      }
    val rows = df.select(concat_ws("|", cols.toIndexedSeq: _*).as("r"))
      .collect().map(_.getString(0)).sorted
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(rows.mkString("\n").getBytes("UTF-8"))
    (rows.length.toLong, md.map("%02x".format(_)).mkString)
  }
}

/** Re-pin helper: prints the current sf0.01 digest for every golden query so
  * an intentional kernel change can update [[GoldenSpec]]'s pins in one run:
  * `sbt "Test/runMain graft.GoldenPin"`. */
object GoldenPin {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/tmp/graft_test_warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = Seq("pipe_flagship", "pipe_flagship_ivf", "pipe_orchestrator",
      "pipe_chunk_stats", "pipe_doc_chunks", "pipe_hierarchy_rel",
      "mm_feature_stats", "pipe_sql_chunks", "txt_bm25_stemmed")
    val pins = names.map { n =>
      val (rows, md5) = GoldenDigest.digest(SparkEntry.queries(n)(spark, dir))
      s"""  gold("$n", ${rows}L, "$md5")"""
    }
    println("GOLDEN_PINS_BEGIN")
    pins.foreach(println)
    println("GOLDEN_PINS_END")
    spark.stop()
  }
}
