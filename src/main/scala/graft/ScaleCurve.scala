package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Dedup, Similarity}

/** Measured scale curve (SCALE.md): times the production-shaped bucketed
  * paths on two fixture directories — normally sf0.1 and the ScaleGen ×10
  * derivative — and prints wall-time growth per path. "Scale-safe by
  * design" becomes a number: a bucketed path on 10× data should grow
  * ≈ linearly (≲ ~12×, allowing for shuffle overhead), never quadratically.
  *
  * Registered queries are reused where they already run production
  * parameters (dedup 0.8 bar, BM25, sessionization); the embedding paths run
  * the operators directly at the production 0.9 cosine bar — the registered
  * `ann_lsh_pairs` fixture threshold of 0.45 sits inside the bulk of the
  * random-pair cosine distribution by design (oracle-checkable there), which
  * would measure the all-pairs regime, not the scale path.
  *
  * Usage: `sbt "runMain graft.ScaleCurve [dirA dirB [paths]]"` — `paths` an
  * optional comma-separated subset (e.g. the dedup/ANN headliners for the
  * ×100 decade); min of SPARK_GRAFT_CURVE_PASSES (default 3) timed passes
  * per (path, dir), with caches dropped between passes.
  */
object ScaleCurve {

  private val paths: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "dedup_exact_survivors" -> SparkEntry.queries("dedup_exact_survivors"),
    "dedup_minhash_fast"    -> SparkEntry.queries("dedup_minhash_fast"),
    "dedup_simhash_pairs"   -> SparkEntry.queries("dedup_simhash_pairs"),
    "lsh_embedding_t090"    -> ((s, d) =>
      Dedup.embeddingPairsDistributed(Tables.embeddings(s, d), minCosine = 0.9)),
    // the ×100 decade runs the embedding near-dup at 0.95: the ScaleGen
    // derivative's non-planted replicas sit at cos ≈ 0.84 with ~100
    // same-base replicas each, so a 0.9 bar is ~0.06 above the bulk —
    // banding admits most same-base pairs as candidates (~25M; measured
    // >70 GB of single-node re-score spill before this row was split out).
    // 0.95 separates the planted 0.999 pairs from that bulk, which is the
    // regime LSH pruning is FOR; the 0.9-bar behavior is recorded in
    // SCALE.md as the honest density limit of banded pruning.
    "lsh_embedding_t095"    -> ((s, d) =>
      Dedup.embeddingPairsDistributed(Tables.embeddings(s, d), minCosine = 0.95)),
    // the dense-regime answer (round 6): celled near-dup never materializes
    // a candidate join — one corpus pass keyed by cell, pairs scored inside
    // the per-cell kernel — so it runs the regime above at bounded disk
    "celled_embedding_t090" -> ((s, d) =>
      Dedup.embeddingPairsCelled(Tables.embeddings(s, d), minCosine = 0.9,
        nlist = 256, nprobe = 2)),
    // the deployment rule measured: nlist ∝ corpus (constant ~312-vector
    // cells) keeps per-cell pairwise work constant, so total compute grows
    // linearly instead of the fixed-nlist form's O(n²/nlist)
    "celled_embedding_prop" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val nlist = math.max(16, (e.count() / 312).toInt)
      Dedup.embeddingPairsCelled(e, minCosine = 0.9, nlist = nlist, nprobe = 2)
    }),
    // aggregate over the assignment so ColumnPruning can't delete the
    // argmax under a bare .count() (same trap as seq_packing below)
    "ivf_assign_c64"        -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val emb = Tables.embeddings(s, d)
      Similarity.ivfAssign(emb, Similarity.seededCentroids(emb, 64, 7))
        .agg(sum("centroid_id"), count(lit(1)))
    }),
    "txt_bm25_scores"       -> SparkEntry.queries("txt_bm25_scores"),
    "feature_pipeline"      -> ((s, d) =>
      pipelines.Pipelines.featurePipeline(Tables.documents(s, d), qualityThreshold = 0.0)),
    "evt_sessions"          -> SparkEntry.queries("evt_sessions"),
    // round-5 additions: clustering, incremental ingest, as-of, interval
    // join, deterministic sampling
    "cc_clusters"           -> ((s, d) =>
      graft.operators.Clusters.connectedComponents(
        Dedup.minHashPairsFast(Tables.documents(s, d)))),
    "incremental_2pct"      -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val batch = docs.filter(pmod(col("doc_id"), lit(50)) === 0)
        .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
      Dedup.minHashPairsIncremental(batch, docs)
    }),
    "asof_join"             -> SparkEntry.queries("evt_asof_click"),
    "decon_8gram"           -> SparkEntry.queries("decon_flags"),
    "interval_join"         -> SparkEntry.queries("evt_incident_join"),
    "stratified_sample"     -> SparkEntry.queries("samp_stratified"),
    // round-5b: compressed-scan ANN (encode pass + ADC search) and the
    // PII/HTML scalar screens
    "pq_encode"             -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.pqEncode(emb, Similarity.pqTrainSeeded(emb, m = 8, ksub = 16, step = 31L))
    }),
    "pq_adc_search"         -> SparkEntry.queries("ann_pq_top10"),
    "pii_redact"            -> SparkEntry.queries("ana_pii_redact"),
    "html_to_text"          -> SparkEntry.queries("doc_html_text"),
    // .count() alone would let ColumnPruning DELETE the unused Window (the
    // whole operator!) and time a bare scan — aggregate over the derived
    // pack columns so the prefix sum is actually computed
    "seq_packing"           -> ((s, d) => {
      import org.apache.spark.sql.functions._
      SparkEntry.queries("samp_pack_sequences")(s, d)
        .agg(max("pack_end"), sum("start_offset"), count(lit(1)))
    }),
    "lm_scores"             -> SparkEntry.queries("ana_lm_scores"),
    // round-7: the reference's own headline query end-to-end — retrieval
    // over the stored chunk table (KNN + broadcast attribution). The
    // chunk+embed build half is the feature_pipeline row; TableStore makes
    // the build once per (session, dir), so min-of-passes times the
    // retrieval path a deployed flagship actually serves.
    "flagship_rag"          -> SparkEntry.queries("pipe_flagship"))

  def main(args: Array[String]): Unit = {
    val dirA = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dirB = args.lift(1).getOrElse("/tmp/graft_sf1")
    val selected = args.lift(2).map(_.split(",").map(_.trim).toSet) match {
      case Some(want) =>
        val unknown = want -- paths.map(_._1).toSet
        require(unknown.isEmpty, s"unknown curve paths: ${unknown.mkString(", ")}")
        paths.filter(p => want(p._1))
      case None => paths
    }
    val passes = sys.env.getOrElse("SPARK_GRAFT_CURVE_PASSES", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // spill-awareness knob: at 100M+ rows, 32 shuffle partitions put ~3M
    // rows in one sort — size partitions to the DATA when measuring the
    // decade, exactly as a cluster job would
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    // data-sized partitions by default — see GraftSession.dataSizedShuffle
    // (this sweep's SPARK_GRAFT_SHUFFLE override is what found the setting)
    val spark = GraftSession.dataSizedShuffle(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
        .config("spark.ui.enabled", "false"), shuffle.toInt, dirB)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(fn: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = fn
      ((System.nanoTime() - t0) / 1e9, rows)
    }

    println(f"[curve] ${"path"}%-22s ${"rows A"}%9s ${"rows B"}%9s ${"t(A)"}%7s ${"t(B)"}%7s  growth")
    val lines = selected.map { case (name, fn) =>
      def run(dir: String): (Double, Long) = {
        val runs = (1 to passes).map { _ =>
          val r = time(fn(spark, dir).count())
          Caches.release()
          spark.sqlContext.clearCache()
          r
        }
        (runs.map(_._1).min, runs.head._2)
      }
      val (ta, rowsA) = run(dirA)
      val (tb, rowsB) = run(dirB)
      val line = f"| $name%-22s | $rowsA%9d | $rowsB%9d | $ta%6.2f s | $tb%6.2f s | ${tb / ta}%5.1f× |"
      println(f"[curve] $name%-22s $rowsA%9d $rowsB%9d $ta%6.2f  $tb%6.2f  ${tb / ta}%5.1f×")
      line
    }
    println("[curve] markdown:")
    println("| path | rows @A | rows @B | t @A | t @B | growth |")
    println("|---|---|---|---|---|---|")
    lines.foreach(println)
    spark.stop()
  }
}
