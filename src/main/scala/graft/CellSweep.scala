package graft

import org.apache.spark.sql.SparkSession
import graft.operators.Dedup

/** nlist sweep for the celled near-dup path (SCALE.md): times
  * `Dedup.embeddingPairsCelled` on ONE corpus across a range of cell
  * counts, printing wall, found pairs, and the resulting mean cell size.
  * This is the partition-count shape test behind the deployment rule
  * "nlist ∝ corpus": per-cell pairwise work is O((n/nlist)²·nlist) =
  * O(n²/nlist), so on a fixed corpus the wall should FALL roughly
  * hyperbolically as nlist grows (until probe/shuffle overhead floors it)
  * while recall — pairs found — holds, because near-identical vectors keep
  * sharing a top cell regardless of how finely the space is cut.
  *
  * Usage: `sbt "runMain graft.CellSweep [dir [nlist,nlist,...]]"` —
  * defaults to the ×100 ScaleGen corpus and a 64→4096 doubling sweep.
  */
object CellSweep {

  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/graft_sf10")
    val nlists = args.lift(1)
      .map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(64, 128, 256, 512, 1024, 2048, 4096))
    // optional 3rd arg: coarse fan-out w for the two-level probe
    // (Dedup.embeddingPairsCelled coarseProbes) — 0/absent = exact scan
    val coarse = args.lift(2).map(_.toInt).filter(_ > 0)
    val passes = sys.env.getOrElse("SPARK_GRAFT_CURVE_PASSES", "2").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = Tables.embeddings(spark, dir)
    val n = emb.count()
    println(s"[sweep] corpus $dir: $n vectors, ${passes} passes/point" +
      coarse.map(w => s", two-level probe w=$w").getOrElse(""))
    println("| nlist | ~vectors/cell | pairs (cos≥0.9) | wall |")
    println("|---|---|---|---|")
    nlists.foreach { nlist =>
      val runs = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        val pairs = Dedup.embeddingPairsCelled(emb, minCosine = 0.9,
          nlist = nlist, nprobe = 2, coarseProbes = coarse).count()
        val dt = (System.nanoTime() - t0) / 1e9
        Caches.release(); spark.sqlContext.clearCache()
        (dt, pairs)
      }
      val (best, pairs) = (runs.map(_._1).min, runs.head._2)
      println(f"| $nlist | ${n / nlist}%d | $pairs%d | $best%.2f s |")
    }
    spark.stop()
  }
}
