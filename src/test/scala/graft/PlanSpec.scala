package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Plan-regression specs: the scale properties PLANS.md documents in prose,
  * asserted from the live physical plans so an accidental `.repartition`,
  * lost pushdown, or un-broadcast join fails the build instead of shipping.
  * All assertions run on the sf0.001 fixture — plan SHAPE is scale-invariant
  * even though the data isn't.
  */
class PlanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir", "/tmp/graft_test_warehouse")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  /** Formatted physical plan (pre-execution AQE initial plan — static
    * properties like pushdown, broadcast sides and partial aggregation are
    * all decided here). */
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))

  /** PushedFilters lists of every scan in the plan. */
  private def pushedFilters(p: String): Seq[String] =
    "PushedFilters: \\[([^\\]]*)\\]".r.findAllMatchIn(p).map(_.group(1)).toSeq

  // --- predicate pushdown reaches the parquet scans -------------------------

  test("rel_pricing_summary pushes the shipdate filter into the scan") {
    val filters = pushedFilters(plan("rel_pricing_summary"))
    assert(filters.exists(_.contains("l_shipdate")),
      s"expected a l_shipdate PushedFilter, got: $filters")
  }

  test("rel_order_lookup pushes the key equality into the scan") {
    val filters = pushedFilters(plan("rel_order_lookup"))
    assert(filters.exists(_.contains("EqualTo(o_orderkey")),
      s"expected EqualTo(o_orderkey,...) pushed, got: $filters")
  }

  // --- bucketed chunk store joins without shuffling the chunk side ----------

  test("pipe_doc_chunks: no hash exchange, docs side broadcast, filter pushed to chunk scan") {
    val p = plan("pipe_doc_chunks")
    assert(!p.contains("hashpartitioning"),
      "chunk-side join must not hash-shuffle (bucketed store + broadcast doc side)")
    assert(p.contains("BroadcastHashJoin"), "doc side must broadcast")
    assert(pushedFilters(p).exists(_.contains("EqualTo(document_id")),
      "document_id point filter must reach the chunk-store scan")
  }

  // --- top-k plans use TakeOrderedAndProject, never a full sort -------------

  test("vec_knn_top10 and rel_top_orders plan as TakeOrderedAndProject") {
    for (name <- Seq("vec_knn_top10", "rel_top_orders")) {
      val p = plan(name)
      assert(p.contains("TakeOrderedAndProject"), s"$name must TakeOrderedAndProject")
      assert(!p.contains("rangepartitioning"), s"$name must not globally sort")
    }
  }

  // --- attribution joins broadcast the small side ---------------------------

  test("att_knn_sources joins via BroadcastHashJoin") {
    assert(plan("att_knn_sources").contains("BroadcastHashJoin"))
  }

  // --- IVF probe prunes partitions of the materialized index ----------------

  test("ann_ivf_pruned scans only the probed centroid partitions") {
    val p = plan("ann_ivf_pruned")
    val partFilters = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(partFilters.exists(f => f.contains("centroid_id") && f.nonEmpty),
      s"probe must prune on the centroid_id partition key, got: $partFilters")
    assert(!p.contains("Window"), "pruned IVF must not re-assign the corpus per query")
  }

  test("ann_ivf_batch prunes ONE union-of-cells scan for all queries") {
    val p = plan("ann_ivf_batch")
    val partFilters = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    val pruned = partFilters.filter(f => f.contains("centroid_id") && f.nonEmpty)
    assert(pruned.size === 1,
      s"exactly one pruned store scan shared by every query, got: $partFilters")
    assert(p.contains("BroadcastHashJoin"),
      "the ≤ Q·nprobe (cell → query) map must broadcast into the scan")
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      "per-query top-k must aggregate through the bounded heap, not sort the scan")
  }

  test("ann_ivf_filtered: the metadata predicate is pushed into the SAME pruned scan") {
    val p = plan("ann_ivf_filtered")
    val partFilters = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(partFilters.exists(f => f.contains("centroid_id") && f.nonEmpty),
      s"the filtered probe must still prune partitions, got: $partFilters")
    assert(pushedFilters(p).exists(_.contains("EqualTo(label")),
      s"the label predicate must reach the pruned scan as a PushedFilter " +
        s"(filtered ANN reads FEWER bytes, never more), got: ${pushedFilters(p)}")
  }

  test("pipe_flagship_ivf probes the stored chunk index with partition pruning") {
    val p = plan("pipe_flagship_ivf")
    val partFilters = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(partFilters.exists(f => f.contains("centroid_id") && f.nonEmpty),
      s"flagship probe must prune on the centroid_id partition key, got: $partFilters")
    assert(p.contains("BroadcastHashJoin"),
      "attribution must broadcast the k-row hit set into the docs join")
    assert(p.contains("TakeOrderedAndProject"),
      "top-k over the probed cells must be a bounded heap, not a global sort")
  }

  test("pipe_flagship_ivfpq: the rerank scan prunes to the CANDIDATES' cells") {
    // r16: the ADC candidate cut runs as its own collect job (codes scan,
    // pruned to the probed cells — not visible in the returned plan), and
    // the returned plan's raw rerank scan prunes to the cells the
    // candidates actually live in, a SUBSET of the probed set: the rerank
    // no longer pays the full probed-cell raw read
    val p = plan("pipe_flagship_ivfpq")
    val partFilters = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    val pruned = partFilters.filter(f => f.contains("centroid_id") && f.nonEmpty)
    assert(pruned.nonEmpty,
      s"the rerank corpus scan must prune on centroid_id, got: $partFilters")
    assert(p.contains("BroadcastHashJoin"),
      "the candidate id set must broadcast into the rerank join")
  }

  test("flagshipIvfPqBatch: the rerank and payload scans prune to the candidates' cell union") {
    // r16: the per-query ADC candidate cut runs in its own collect jobs
    // (codes scan pruned to the probed-cell union, the bounded-heap
    // partial_topkaggregator reducing map-side — not visible in the
    // returned plan); the RETURNED plan's scans are the raw rerank and the
    // payload attach, both pruned to the cells the candidates live in —
    // one shared cell set, a subset of the probed union, never per-query
    val df = graft.pipelines.Pipelines.flagshipIvfPqBatch(spark, dir,
      Seq("spark join vector query", "partitioned parquet scan", "streaming watermark state"))
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    val partFilters = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    val pruned = partFilters.filter(f => f.contains(" IN ") && f.contains("centroid_id"))
    assert(pruned.size === 2,
      s"the queue must share exactly two pruned scans (rerank, payload), got: $partFilters")
    val cellSets = pruned.flatMap(f =>
      "centroid_id#\\d+L? IN \\(([^)]*)\\)".r.findFirstMatchIn(f).map(_.group(1)))
    assert(cellSets.distinct.size === 1,
      s"rerank and payload must prune to the SAME candidate-cell set, got: $cellSets")
    assert(cellSets.head.trim.nonEmpty, "the candidate-cell set must be non-empty")
    // (semantic containment — candidate cells ⊆ probed, answers row-equal
    // to serial probes — is IvfCatalogSpec's batch-≡-serial pin)
    assert(p.contains("BroadcastHashJoin"),
      "the rerank set and attribution must broadcast")
  }

  // --- batch KNN: partial top-k BEFORE the exchange -------------------------

  test("vec_knn_batch reduces to k rows per query per partition before the shuffle") {
    val p = plan("vec_knn_batch")
    assert(!p.contains("Window"), "batch KNN must not window over the scored cross product")
    // tree prints top-down: final agg above the exchange above the partial agg
    val shape = "(?s)ObjectHashAggregate.*?Exchange.*?ObjectHashAggregate".r
    assert(shape.findFirstIn(p).isDefined,
      "expected ObjectHashAggregate(final) <- Exchange <- ObjectHashAggregate(partial)")
    assert(p.contains("partial_topkaggregator"),
      "partial aggregation must run map-side, before the exchange")
  }

  // --- int8 ANN: bounded candidate heap, broadcast re-rank ------------------

  test("ann_int8_top10 takes candidates via TakeOrderedAndProject and broadcasts the re-rank set") {
    val p = plan("ann_int8_top10")
    assert(p.contains("TakeOrderedAndProject"),
      "candidate selection must be a bounded per-partition heap, not a global sort")
    assert(!p.contains("Exchange rangepartitioning"),
      "a range-partitioned sort of the scored corpus defeats the quantized scan")
    assert(p.contains("BroadcastHashJoin"),
      "the k*rerank candidate set must broadcast into the re-rank join")
  }

  test("ann_ivfpq_pruned scans only probed partitions of the stored code table") {
    val p = plan("ann_ivfpq_pruned")
    val partFilters = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(partFilters.exists(f => f.contains("centroid_id") && f.nonEmpty),
      s"probe must prune on the centroid_id partition key, got: $partFilters")
    assert(p.contains("TakeOrderedAndProject") && p.contains("BroadcastHashJoin"),
      "ADC candidates via bounded heap, broadcast re-rank")
  }

  test("ann_pq_batch: per-query ADC candidates reduce map-side before the exchange") {
    val p = plan("ann_pq_batch")
    // the candidate stage must be partial topk agg, never a window over the
    // scored codes × queries product; the one Window in the plan is the
    // bounded rerank (k*rerank rows per query) and the tiny query indexer
    val shape = "(?s)ObjectHashAggregate.*?Exchange.*?ObjectHashAggregate".r
    assert(shape.findFirstIn(p).isDefined,
      "expected ObjectHashAggregate(final) <- Exchange <- ObjectHashAggregate(partial)")
    assert(p.contains("partial_topkaggregator"),
      "partial candidate aggregation must run map-side, before the exchange")
    assert(p.contains("BroadcastHashJoin"),
      "candidates and the query index must broadcast into the re-rank join")
  }

  test("ann_pq_top10: ADC candidates via bounded heap, broadcast re-rank, no wide shuffle") {
    val p = plan("ann_pq_top10")
    assert(p.contains("TakeOrderedAndProject"),
      "ADC candidate selection must be a bounded per-partition heap")
    assert(!p.contains("Exchange rangepartitioning"),
      "a range-partitioned sort of the ADC-scored corpus defeats the code scan")
    assert(p.contains("BroadcastHashJoin"),
      "the k*rerank candidate set must broadcast into the re-rank join")
    assert(!p.contains("SortMergeJoin"),
      "no sort-merge join anywhere in the PQ search plan")
  }

  // --- as-of join: one window exchange, filters pushed, partial dedup agg ---

  test("evt_asof_click: pushed type filters, partial click-dedup agg, exactly two exchanges") {
    val p = plan("evt_asof_click")
    val filters = pushedFilters(p)
    assert(filters.exists(_.contains("purchase")) && filters.exists(_.contains("click")),
      "event_type equality must be pushed into both parquet scans")
    // click pre-dedup combines map-side before its exchange
    val dedupShape = "(?s)HashAggregate.*?Exchange.*?HashAggregate".r
    assert(dedupShape.findFirstIn(p).isDefined,
      "click (user, ts) dedup must partial-aggregate before the exchange")
    // formatted mode prints each node twice (tree + detail); count the
    // detail headers only
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(exchanges === 2,
      s"as-of should cost exactly two exchanges (click dedup + window key), saw $exchanges")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "as-of must never plan as a range join product")
  }

  // --- interval join: equi-join on the bin, never a nested-loop product ----

  test("evt_incident_join plans as an equi-join on the time bin") {
    val p = plan("evt_incident_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the range predicate must become a bin equi-join, not a product")
    assert(p.contains("__bin"), "join must key on the quantized time bin")
  }

  // --- stored incremental dedup: corpus band table read bucketed ------------

  test("dedup_incremental_stored probes the corpus band table as a bucketed scan") {
    val p = plan("dedup_incremental_stored")
    assert(p.contains("Bucketed: true"),
      "the stored corpus band table must be read with its bucketing " +
        "(corpus side of the candidate join shuffles nothing)")
  }

  // --- hash sampling: shuffle-free codegen filter on a pruned scan ----------

  test("samp_stratified filters inside the scan stage with no shuffle") {
    val p = plan("samp_stratified")
    // the only Exchange allowed is Tables.load's small-input round-robin
    // spread (RoundRobinPartitioning; scale-gated off above 64 MB) — the
    // operator itself must never key-shuffle the corpus
    assert(!p.contains("hashpartitioning") && !p.contains("rangepartitioning"),
      "hash-membership sampling must not key-shuffle")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,lang:string>"),
      "scan must prune to the two output columns")
    // the hash filter must sit DIRECTLY on the scan — i.e. below the spread
    // exchange, in the scan stage (the plan is AQE-wrapped now, so the
    // formatted initial plan no longer prints codegen stars; adjacency in
    // the tree is the invariant)
    assert("Filter \\(\\d+\\)\\s*\\n\\s*\\+- Scan parquet".r.findFirstIn(p).isDefined,
      s"the hash filter must run in the scan stage, below any exchange:\n$p")
  }

  // --- incremental celled near-dup: store scan pruned to probed cells -------

  test("dedup_celled_incremental prunes the stored index to the batch's cells") {
    val p = plan("dedup_celled_incremental")
    val partFilters = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(partFilters.exists(f => f.contains("centroid_id") && f.nonEmpty),
      s"the store scan must prune on the centroid_id partition key, got: $partFilters")
  }

  // --- sequence packing: window partitioned by the composite shard key ------

  test("samp_pack_sequences partitions its running-sum window by the composite shard") {
    val p = plan("samp_pack_sequences")
    assert(p.contains("hashpartitioning(shard"),
      "the prefix-sum window must partition by the composite shard key — " +
        "an unpartitioned (or lang-only) window serializes the corpus stream")
    assert(!p.contains("SinglePartition"),
      "packing must never move the corpus to one partition")
    // ONE window node: the prefix sum is computed once and the three pack
    // columns are derived in window-free projections — three sibling Window
    // nodes would mean three linear passes over every shard's stream
    val windows = "(?m)^\\s*(?:[+:][- ]*)*\\*?\\(?\\d*\\)?\\s*Window ".r
      .findAllIn(p).size.max("Window \\[".r.findAllIn(p).size)
    assert(windows == 1,
      s"expected exactly one Window node in the packing plan, found $windows:\n$p")
  }

  // --- context packing: single partition is explicit, not a missing key -----

  test("pack_token_budget states its single-partition contract in the plan") {
    val p = plan("pack_token_budget")
    // the constant-valued key survives as a projected window key (if
    // Spark's EliminateWindowPartitions ever folds it away, the
    // unpartitioned-window warning comes back — this is the tripwire)
    assert(p.contains("hashpartitioning(_w"),
      s"expected the explicit constant partition key in the Exchange:\n$p")
  }

  // --- span decontamination: eval digests broadcast, train side streams ----

  test("contaminatedSpans broadcasts the eval digests; the train grams " +
       "stream into the semi join with no shuffle (the curation chain's decon stage)") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    val docs = graft.Tables.documents(spark, dir)
    val sp = graft.operators.Dedup.contaminatedSpans(
        docs.filter(col("doc_id") >= 50), docs.filter(col("doc_id") < 50), k = 8)
      .queryExecution.sparkPlan
    val semi = sp.collect {
      case j: BroadcastHashJoinExec if j.joinType == LeftSemi => j }
    assert(semi.nonEmpty, s"eval digests must broadcast into a LeftSemi:\n$sp")
    // Tables.load's small-input round-robin spread (scale-gated off above
    // 64 MB) is the one permitted exchange below the join; the operator
    // itself must never KEY-shuffle anything corpus-shaped there
    val shuffles = semi.head.left.collect { case e: ShuffleExchangeExec
      if !e.outputPartitioning.isInstanceOf[
        org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning] => e }
    assert(shuffles.isEmpty,
      s"nothing corpus-shaped may key-shuffle below the decon semi join, found $shuffles:\n$sp")
  }

  // --- span-dedup ingest path: the stored count table never shuffles --------

  test("duplicateSpansIncremental probes the store scan-in-place: a " +
       "broadcast LeftSemi with NO shuffle anywhere on the store side") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    // the registered query's store is a derived frame; build the REAL shape
    // (a parquet-backed count table) so the plan matches deployment
    val docs = graft.Tables.documents(spark, dir)
    // per-run temp dir (concurrent suites on one machine must not race)
    val storeDir = java.nio.file.Files
      .createTempDirectory("graft_span_store_plan").toString
    graft.operators.Dedup.spanGramCounts(docs.filter(col("doc_id") >= 50))
      .write.mode("overwrite").parquet(storeDir)
    val plan = graft.operators.Dedup.duplicateSpansIncremental(
        docs.filter(col("doc_id") < 50), spark.read.parquet(storeDir))
      .queryExecution.sparkPlan
    // the N44-analog claim: per-batch cost is one narrow store scan IN
    // PLACE — the store streams into a broadcast semi join (batch digests
    // are the build side) and no ShuffleExchange sits between the store
    // files and that join; the only digest-keyed exchanges in the plan
    // carry batch-sized data (the batch's own counts, the semi-shrunk sum)
    def containsStoreScan(p: org.apache.spark.sql.execution.SparkPlan) =
      p.collect { case s: FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains(
            "graft_span_store_plan")) => s }.nonEmpty
    val storeSemi = plan.collect {
      case j: BroadcastHashJoinExec
        if j.joinType == LeftSemi && containsStoreScan(j.left) => j
    }
    assert(storeSemi.nonEmpty,
      s"expected the store probed by a broadcast LeftSemi:\n$plan")
    val shuffles = storeSemi.head.left.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.isEmpty,
      s"no shuffle may sit between the store scan and its semi join, " +
        s"found: $shuffles\n$plan")
  }
}
