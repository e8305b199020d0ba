package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** A/B evidence for the hot-bucket guard ([[Dedup.capBuckets]]): plant one
  * boilerplate cluster of `copies` identical documents into the sf-dir
  * corpus — the cookie-banner/templated-page pathology near-dup LSH is
  * actually run against at web scale — then measure the MinHash band
  * join's CANDIDATE volume and wall time uncapped vs capped. The
  * candidate stage (band self-join + distinct) is the explosion site;
  * verification cost is proportional to candidates, so the candidate A/B
  * is the honest unit. Also prints the hotBucketStats view of the same
  * banding — the observability half a curation cadence runs.
  *
  * Usage: HotBucketBench [sfDir] [copies] [cap1,cap2,...]
  * (caps list always benches 0 = uncapped first.)
  */
object HotBucketBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val copies = if (args.length > 1) args(1).toInt else 10000
    val caps = (if (args.length > 2) args(2).split(",").toSeq.map(_.toInt)
                else Seq(Dedup.HotBucketCap, 256))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val boiler = docs.filter(col("doc_id") === 0)
      .crossJoin(spark.range(copies).select(col("id").as("i")))
      .select((lit(3000000L) + col("i")).as("doc_id"), col("text"))
    val corpus = docs.unionByName(boiler)

    // shingle + band once (persisted) — the A/B isolates the join stage
    val sh = Caches.persistTracked(Dedup.minHashShingleTable(corpus))
    val banded = Caches.persistTracked(Dedup.minHashBandTable(sh))
    banded.count() // materialize outside the timed legs

    val stats = Dedup.hotBucketStats(banded, Seq("band_idx", "band_key"))
      .limit(3).collect()
    stats.foreach(r => println(
      s"[hotbucket] bucket band=${r.get(0)} n=${r.get(2)} truncated@${Dedup.HotBucketCap}=${r.get(3)}"))

    def leg(cap: Int): (Long, Double) = {
      val capped = Dedup.capBuckets(banded, Seq("band_idx", "band_key"), "doc_id", cap)
      val left = capped.select(col("band_idx"), col("band_key"), col("doc_id").as("id_a"))
      val right = capped.select(col("band_idx"), col("band_key"), col("doc_id").as("id_b"))
      val t0 = System.nanoTime()
      val n = left.join(right, Seq("band_idx", "band_key"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct().count()
      (n, (System.nanoTime() - t0) / 1e9)
    }

    // SPARK_GRAFT_SKIP_UNCAPPED=1 drops the uncapped leg — at large `copies`
    // it is quadratic by construction and exists only to be measured once
    val withRaw = if (sys.env.get("SPARK_GRAFT_SKIP_UNCAPPED").contains("1"))
      caps.filter(_ > 0) else 0 +: caps.filter(_ > 0)
    val legs = withRaw.map { cap =>
      val (n, secs) = leg(cap)
      val nm = if (cap == 0) "uncapped" else s"cap$cap"
      println(f"[hotbucket] $nm%-9s candidates=$n%12d  time=$secs%8.2f s")
      nm -> (n, secs)
    }
    val legJson = legs.map { case (nm, (n, s)) =>
      f""""$nm":{"candidates":$n,"sec":$s%.2f}""" }.mkString(",")
    println(s"""{"metric":"hot_bucket_bench","copies":$copies,"legs":{$legJson}}""")
    spark.stop()
  }
}
