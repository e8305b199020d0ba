package graft

import org.apache.spark.sql.SparkSession

/** Provenance tool for the FROZEN deployment merges
  * (`src/main/resources/graft/bpe_merges.tsv`, read back by
  * [[graft.operators.Bpe.frozen]]): trains on a fixture directory and
  * prints the TSV (rank, left, right). Training is a pure function of
  * the corpus word counts (deterministic tie-breaks), so re-running on
  * the same fixture reproduces the file byte-for-byte.
  *
  * Usage: `runMain graft.BpeTrain [dir [nMerges [maxVocab]]]` — the
  * committed resource came from sf0.01 at the defaults. */
object BpeTrain {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val nMerges = args.lift(1).map(_.toInt).getOrElse(200)
    val maxVocab = args.lift(2).map(_.toInt).getOrElse(20000)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val merges = graft.operators.Bpe.train(
      Tables.documents(spark, dir), "text", nMerges, maxVocab)
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      println(s"${i + 1}\t$l\t$r")
    }
    spark.stop()
  }
}
