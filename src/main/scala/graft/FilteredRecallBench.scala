package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** The filtered-ANN trade, MEASURED (SCALE.md): `ivfSearchPruned` with a
  * `preFilter` keeps the probe's recall bound — the predicate filters
  * WITHIN the probed cells, so a selective filter thins each cell's
  * candidates and the true filtered top-10 increasingly lives in cells the
  * probe never opened. The round-14 verdict noted this trade was asserted,
  * not measured; this harness sweeps filter selectivity × nprobe and
  * reports recall@10 against the filtered BRUTE-FORCE truth, the evidence
  * for the serving guidance "scale nprobe with filter selectivity" and for
  * where that stops being enough (sub-1% filters want a dedicated index or
  * a post-probe fallback, not a bigger probe).
  *
  * Selectivity is synthesized by deterministic modular predicates on
  * `vec_id` (uniform, uncorrelated with the embedding geometry — the
  * neutral case; a geometry-correlated filter can only do better, since
  * its survivors concentrate in fewer cells).
  *
  * Usage: `tools/run_main.sh graft.FilteredRecallBench [dir [nQueries]]` —
  * defaults to the ScaleGen ×10 corpus, 20 deterministic queries. */
object FilteredRecallBench {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/graft_sf1")
    val nQueries = args.lift(1).map(_.toInt).getOrElse(20)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val emb = Tables.embeddings(spark, dir).filter($"embedding".isNotNull).cache()
    val n = emb.count()
    val nlist = math.max(16, math.sqrt(n.toDouble).toInt)
    println(s"[filtrecall] corpus $dir: $n vectors, nlist=$nlist")
    val cents = Similarity.hashSeededCentroids(emb, nlist).localCheckpoint(true)
    val store = Similarity.ivfAssign(emb, cents).localCheckpoint(true)

    val queries = emb.filter($"vec_id" % 97 === 3).orderBy($"vec_id".asc).limit(nQueries)
      .select($"vec_id", $"embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

    // (name, selectivity, predicate) — modular on vec_id: uniform survivors
    val filters = Seq(
      ("none", 1.0, lit(true)),
      ("50%", 0.50, pmod($"vec_id", lit(2L)) === 0L),
      ("10%", 0.10, pmod($"vec_id", lit(10L)) === 0L),
      ("1%", 0.01, pmod($"vec_id", lit(100L)) === 0L),
      ("0.1%", 0.001, pmod($"vec_id", lit(1000L)) === 0L))
    val nprobes = Seq(2, 4, 8, 16, 32, 64)

    println(f"[filtrecall] recall@10 vs filtered brute force (rows = filter, cols = nprobe of $nlist):")
    println("| filter | " + nprobes.map(np => s"nprobe=$np").mkString(" | ") + " |")
    println("|---|" + nprobes.map(_ => "---").mkString("|") + "|")
    filters.foreach { case (fname, _, pred) =>
      // filtered brute-force truth per query
      val truths = queries.map { case (qid, qv) =>
        val qvLit = array(qv.map(x => lit(x)): _*)
        qid -> emb.filter(pred)
          .withColumn("__cos",
            graft.functions.VectorFunctions.cosineSimilarity($"embedding", qvLit))
          .orderBy($"__cos".desc, $"vec_id".asc).limit(10)
          .select("vec_id").collect().map(_.getLong(0)).toSet
      }.toMap
      val cells = nprobes.map { np =>
        val rec = queries.map { case (qid, qv) =>
          val got = Similarity.ivfSearchPruned(store, cents, qv, k = 10, nprobe = np,
              preFilter = Some(pred))
            .select("vec_id").collect().map(_.getLong(0)).toSet
          val truth = truths(qid)
          if (truth.isEmpty) 1.0 else got.intersect(truth).size.toDouble / truth.size
        }
        f"${rec.sum / rec.length}%.3f"
      }
      println(s"| $fname | " + cells.mkString(" | ") + " |")
    }
    spark.stop()
  }
}
