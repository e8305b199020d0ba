package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity
import graft.pipelines.Pipelines

/** Online blue/green reindex ([[Reindex.rebuildChunkIndex]]): a quiet
  * rebuild lands exactly the from-scratch index at the new nlist; writes
  * racing the rebuild (ingest appends, upserts, deletes — injected through
  * the phase seams) are reconciled so the cutover converges to the
  * re-assign-the-current-store oracle; the code table and doc→cells follow;
  * the cutover lease excludes a concurrent edit by mechanism; the same-nlist
  * form swaps the live generation in place. */
class ReindexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.warehouse.dir", "/tmp/graft_test_warehouse")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def snapshot(df: DataFrame): Set[(String, Long, Long)] =
    df.select("chunk_id", "centroid_id", "document_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  // generation-resolved physical names (the pointer moves on every flip)
  private def genOf(nlist: Int): Long =
    TableStore.currentGen(spark, IvfCatalog.chunkGroup(dir, nlist))
  private def physStore(nlist: Int): String =
    TableStore.physGen(IvfCatalog.chunkStoreName(dir, nlist), genOf(nlist))
  private def physCents(nlist: Int): String =
    TableStore.physGen(IvfCatalog.chunkCentroidsName(dir, nlist), genOf(nlist))
  private def physDc(nlist: Int): String =
    TableStore.physGen(DocLifecycle.docCellsName(dir, nlist), genOf(nlist))
  private def physCodes(nlist: Int, m: Int, ksub: Int): String =
    TableStore.physGen(IvfPqCatalog.chunkCodesTableName(spark, dir, nlist, m, ksub), genOf(nlist))

  private def dropGen(nlist: Int, pqM: Int = 0, pqKsub: Int = 16): Unit = {
    val g = genOf(nlist)
    if (pqM > 0 && spark.catalog.tableExists(
        TableStore.tableName(s"ivfpqcb_m${pqM}k$pqKsub", dir)))
      spark.sql(s"DROP TABLE IF EXISTS ${TableStore.physGen(
        IvfPqCatalog.chunkCodesTableName(spark, dir, nlist, pqM, pqKsub), g)}")
    Seq(IvfCatalog.chunkStoreName(dir, nlist),
      IvfCatalog.chunkCentroidsName(dir, nlist),
      DocLifecycle.docCellsName(dir, nlist)).foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS ${TableStore.physGen(t, g)}")
      spark.sql(s"DROP TABLE IF EXISTS $t")
    }
    val ptr = TableStore.genPointerPath(spark, IvfCatalog.chunkGroup(dir, nlist))
    try ptr.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(ptr, false)
    catch { case _: Throwable => () }
  }

  test("quiet rebuild to a new nlist equals the from-scratch build") {
    val (a, b) = (23, 53)
    dropGen(a); dropGen(b)
    IvfCatalog.assignedChunks(spark, dir, a).count()
    DocLifecycle.docCells(spark, dir, a).count()
    val before = snapshot(spark.table(IvfCatalog.chunkStoreName(dir, a)))

    val rep = Reindex.rebuildChunkIndex(spark, dir, a, b)
    assert(rep.baseRows === before.size.toLong && rep.deltaRows === 0L)
    assert(rep.rounds === 0 && rep.cutoverRounds === 0)

    // from-scratch oracle at b, computed WITHOUT touching the catalog: same
    // seeded sample over the same (chunk_id, embedding) set → identical
    // centroids, identical assignment
    val chunks = ChunkCatalog.flatChunks(spark, dir)
      .select(col("chunk_id"), col("document_id"), col("word_count"), col("embedding"))
    val oracleCents = Similarity.hashSeededCentroids(chunks, b,
      idCol = "chunk_id", embCol = "embedding")
    val oracleRows = Similarity.ivfAssign(chunks, oracleCents, idCol = "chunk_id")
      .select("chunk_id", "centroid_id", "document_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val rebuilt = snapshot(spark.table(physStore(b)))
    assert(rebuilt === oracleRows, "rebuilt store must equal the from-scratch assignment")
    assert(rebuilt.map(t => (t._1, t._3)) === before.map(t => (t._1, t._3)),
      "same rows, new cells")
    // the new generation's centroid table equals the from-scratch derivation
    val gotCents = spark.table(physCents(b))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSet
    val wantCents = oracleCents.collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSet
    assert(gotCents === wantCents)
    // doc→cells covers every live pair; probe serves end to end at b
    val live = rebuilt.map(t => (t._3, t._2))
    val idx = spark.table(physDc(b))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(live.subsetOf(idx))
    assert(Pipelines.flagshipIvf(spark, dir, nlist = b, nprobe = 4).count() === 10L)
    // no staging leaks: the rebuild-private pair log is gone, and the only
    // gen-tagged tables are the new generation's own (pointer-referenced)
    assert(!spark.catalog.listTables().collect().exists(_.name.contains("_oldpairs")))
    val liveGen = genOf(b)
    assert(spark.catalog.listTables().collect().map(_.name)
      .filter(_.contains("__gen")).forall(_.endsWith(s"__gen$liveGen")))
    // blue/green completion: retire the old generation
    Reindex.dropChunkGeneration(spark, dir, a)
    assert(!spark.catalog.tableExists(IvfCatalog.chunkStoreName(dir, a)))
    dropGen(b)
  }

  test("writes racing the rebuild reconcile in; codes and pairs follow; the delta is probe-visible") {
    import spark.implicits._
    val (a, b, m, ksub) = (29, 47, 24, 16)
    dropGen(a, m, ksub); dropGen(b, m, ksub)
    IvfCatalog.assignedChunks(spark, dir, a).count()
    IvfPqCatalog.encodedChunks(spark, dir, a, m, ksub).count()
    DocLifecycle.docCells(spark, dir, a).count()
    val storeA = IvfCatalog.chunkStoreName(dir, a)

    def mk(word: String): String =
      (1 to 4).map(i => s"The $word beacon catalogs sector $i with manifests and " +
        "routes the surviving chunks into the partitioned serving store.").mkString(" ")
    val editedId = snapshot(spark.table(storeA)).groupBy(_._3).maxBy(_._2.size)._1
    val deletedId = (snapshot(spark.table(storeA)).map(_._3) - editedId).head

    val rep = Reindex.rebuildChunkIndex(spark, dir, a, b, pqM = m, pqKsub = ksub,
      beforeRounds = () => {
        // arrivals + an edit + a delete land while the staged build is done
        // but the rounds have not run — all three mutate the old generation
        graft.streaming.StreamingIngest.ingestDocBatch(
          Seq((940001L, mk("aurora"))).toDF("doc_id", "text"), dir, a,
          pqM = m, pqKsub = ksub)
        DocLifecycle.upsertDocChunks(spark, dir,
          Seq((editedId, mk("meridian"))).toDF("doc_id", "text"), a,
          pqM = m, pqKsub = ksub)
        DocLifecycle.deleteDocChunks(spark, dir, Seq(deletedId), a,
          pqM = m, pqKsub = ksub)
      },
      beforeCutover = () => {
        // another arrival after the rounds went quiet — only the leased
        // final reconcile can catch it
        graft.streaming.StreamingIngest.ingestDocBatch(
          Seq((940002L, mk("zephyr"))).toDF("doc_id", "text"), dir, a,
          pqM = m, pqKsub = ksub)
      })
    assert(rep.deltaRows > 0L, "the racing writes must have been reconciled")
    assert(rep.cutoverRounds >= 1, "the post-rounds arrival lands in the leased reconcile")

    // oracle: the old generation's FINAL rows, re-assigned to the new cents
    spark.catalog.refreshTable(storeA)
    val finalOld = spark.table(storeA)
    val want = Similarity.ivfAssign(finalOld.drop("centroid_id"),
        spark.table(physCents(b)), idCol = "chunk_id")
      .select("chunk_id", "centroid_id", "document_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val got = snapshot(spark.table(physStore(b)))
    assert(got === want, "new generation must equal the re-assigned final old store")
    assert(got.exists(_._3 == 940001L) && got.exists(_._3 == 940002L))
    assert(!got.exists(_._3 == deletedId))
    assert(got.filter(_._3 == editedId).map(_._1) ===
      snapshot(finalOld).filter(_._3 == editedId).map(_._1))

    // the code table mirrors the new store exactly (no dead, no missing)
    val codesB = spark.table(physCodes(b, m, ksub))
    val storeB = spark.table(physStore(b))
    assert(codesB.count() === storeB.count())
    assert(codesB.join(storeB, Seq("chunk_id"), "left_anti").count() === 0L)
    assert(storeB.join(codesB, Seq("chunk_id"), "left_anti").count() === 0L)
    assert(codesB.select("chunk_id", "centroid_id").except(
      storeB.select("chunk_id", "centroid_id")).count() === 0L,
      "codes must sit in the same cells as their rows")
    // doc→cells superset over the new generation
    val idx = spark.table(physDc(b))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.map(t => (t._3, t._2)).subsetOf(idx))
    // the mid-rebuild arrival is PROBE-visible through the compressed path
    val hits = Pipelines.flagshipIvfPq(spark, dir, queryText = mk("zephyr"),
      nlist = b, nprobe = 4, m = m, ksub = ksub)
    assert(hits.select("document_id").as[Long].collect().headOption.contains(940002L),
      "the doc ingested mid-rebuild must be the top hit for its own text")
    dropGen(a, m, ksub); dropGen(b, m, ksub)
  }

  test("hot-cell split: content preserved, nearest-cell invariant restored, probes self-recall at nprobe=1") {
    val (nl, m, ksub) = (7, 24, 16)
    dropGen(nl, m, ksub)
    IvfCatalog.assignedChunks(spark, dir, nl).count()
    IvfPqCatalog.encodedChunks(spark, dir, nl, m, ksub).count()
    DocLifecycle.docCells(spark, dir, nl).count()
    val storeName = IvfCatalog.chunkStoreName(dir, nl)
    val centsName = IvfCatalog.chunkCentroidsName(dir, nl)
    val before = snapshot(spark.table(storeName))
    val hot = Compaction.partitionStats(spark, storeName).maxBy(_.bytes)
    val hotCell = hot.spec.split("=", 2)(1).toLong
    val hotRows = before.count(_._2 == hotCell)

    val reps = Reindex.splitHotCells(spark, dir, nl, pqM = m, pqKsub = ksub,
      maxCellBytes = hot.bytes - 1, maxSplits = 1)
    assert(reps.size === 1)
    val rep = reps.head
    assert(rep.cell === hotCell && rep.children.size === 2 && rep.parentRetired)
    assert(rep.movedRows === hotRows.toLong)

    spark.catalog.refreshTable(storeName)
    val after = snapshot(spark.table(storeName))
    assert(after.map(t => (t._1, t._3)) === before.map(t => (t._1, t._3)),
      "every row survives the split")
    assert(!after.exists(_._2 == hotCell), "the parent cell must be empty")
    assert(rep.children.forall(c => after.exists(_._2 == c)))
    val cents = spark.table(centsName).select("centroid_id")
      .collect().map(_.getLong(0)).toSet
    assert(!cents.contains(hotCell) && rep.children.forall(cents.contains),
      "parent centroid retired, children registered")
    // every MOVED row sits in its globally-nearest cell: the split
    // re-assigned against the full new centroid set, so boundary rows
    // migrated to other cells instead of being strapped to a child.
    // (Rows of OTHER cells are untouched — a child can steal "nearest"
    // from a few of their boundary rows, the documented one-extra-probe
    // trade bounded below.)
    val reassigned = Similarity.ivfAssign(
        spark.table(storeName).drop("centroid_id"),
        spark.table(centsName), idCol = "chunk_id")
      .select("chunk_id", "centroid_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val movedNow = after.filter(t => before.find(_._1 == t._1).exists(_._2 == hotCell))
    assert(movedNow.forall(t => reassigned(t._1) == t._2),
      "every moved row must sit in its globally-nearest cell")
    // codes follow: same ids, same cells
    val codes = spark.table(IvfPqCatalog.chunkCodesTableName(spark, dir, nl, m, ksub))
    assert(codes.select("chunk_id", "centroid_id")
      .except(spark.table(storeName).select("chunk_id", "centroid_id")).count() === 0L)
    assert(codes.count() === after.size.toLong)
    // doc→cells covers every live pair; self-recall at nprobe=1 for rows of
    // the split cell (the invariant's payoff: the probe finds each row in
    // the single cell its own embedding points at)
    val idx = spark.table(DocLifecycle.docCellsName(dir, nl))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after.map(t => (t._3, t._2)).subsetOf(idx))
    // probe-reachability, asserted on the probe ORDER itself (immune to the
    // fixture's exact-duplicate embeddings): rank of a row's own cell among
    // centroid cosines to the row's embedding. Moved rows sit at rank 1
    // (re-assigned to the global nearest); unmoved rows degrade by at most
    // the two new entrants — rank ≤ 3, i.e. nprobe=3 still scans their cell
    val centsVecs = spark.table(centsName)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def cellRank(vec: Array[Float], cellOf: Long): Int = {
      import graft.functions.VectorFunctions.cosineArrays
      val ranked = centsVecs.map { case (cid2, cv) => (cid2, cosineArrays(vec, cv)) }
        .sortBy { case (cid2, c) => (-c, cid2) }.map(_._1)
      ranked.indexOf(cellOf) + 1
    }
    def vecOf(cid: String): Array[Float] =
      spark.table(storeName).filter(col("chunk_id") === cid)
        .select("embedding").head.getSeq[Float](0).toArray
    val afterCells = after.map(t => t._1 -> t._2).toMap
    before.filter(_._2 == hotCell).take(3).foreach { case (cid, _, _) =>
      assert(cellRank(vecOf(cid), afterCells(cid)) === 1,
        s"moved row $cid must sit in the rank-1 cell of its own embedding")
    }
    before.filterNot(_._2 == hotCell).take(5).foreach { case (cid, _, _) =>
      assert(cellRank(vecOf(cid), afterCells(cid)) <= 3,
        s"unmoved row $cid must stay reachable within nprobe=3")
    }
    // and the probe path itself serves k rows end to end at the new layout
    assert(Similarity.ivfSearchPruned(spark.table(storeName),
      spark.table(centsName), vecOf(movedNow.head._1), k = 5, nprobe = 2,
      idCol = "chunk_id").count() === 5L)
    dropGen(nl, m, ksub)
  }

  test("a late append racing the split stays in the parent, which survives as a live centroid") {
    import spark.implicits._
    val nl = 11
    dropGen(nl)
    IvfCatalog.assignedChunks(spark, dir, nl).count()
    DocLifecycle.docCells(spark, dir, nl).count()
    val storeName = IvfCatalog.chunkStoreName(dir, nl)
    val centsName = IvfCatalog.chunkCentroidsName(dir, nl)
    val hot = Compaction.partitionStats(spark, storeName).maxBy(_.bytes)
    val hotCell = hot.spec.split("=", 2)(1).toLong
    // a vector IDENTICAL to the parent's centroid: cosine 1.0 beats both
    // children (and the id tie-break keeps the parent on an exact tie), so
    // the injected append lands in the parent cell mid-split
    val parentVec = spark.table(centsName)
      .filter(col("centroid_id") === hotCell)
      .select("centroid_vec").head.getSeq[Float](0)

    val reps = Reindex.splitHotCells(spark, dir, nl,
      maxCellBytes = hot.bytes - 1, maxSplits = 1,
      beforeRewrite = () => {
        IvfCatalog.appendChunks(spark, dir,
          Seq(("zzsplitrace", 970001L, 5, parentVec))
            .toDF("chunk_id", "document_id", "word_count", "embedding")
            .select(col("chunk_id"), col("document_id"), col("word_count"),
              col("embedding").cast("array<float>").as("embedding")),
          nl)
      })
    val rep = reps.head
    assert(!rep.parentRetired, "a parent holding a raced-in row must not retire")
    spark.catalog.refreshTable(storeName)
    val raced = spark.table(storeName).filter(col("chunk_id") === "zzsplitrace")
      .select("centroid_id").collect().map(_.getLong(0))
    assert(raced.toSeq === Seq(hotCell), "the raced-in row stays in the parent cell")
    val cents = spark.table(centsName).select("centroid_id")
      .collect().map(_.getLong(0)).toSet
    assert(cents.contains(hotCell),
      "the parent centroid must survive — retiring it would hide the raced-in row from every probe")
    // and the probe still finds it, in exactly that cell
    val top = Similarity.ivfSearchPruned(spark.table(storeName),
        spark.table(centsName), parentVec.toArray, k = 1, nprobe = 1, idCol = "chunk_id")
      .select("chunk_id").head.getString(0)
    assert(top === "zzsplitrace")
    dropGen(nl)
  }

  test("IVFADC: an in-flight ingest (store + code appends) racing the split keeps code↔store cell parity at every checkpoint") {
    import spark.implicits._
    val (nl, m, ksub) = (13, 24, 16)
    dropGen(nl, m, ksub)
    IvfCatalog.assignedChunks(spark, dir, nl).count()
    IvfPqCatalog.encodedChunks(spark, dir, nl, m, ksub).count()
    DocLifecycle.docCells(spark, dir, nl).count()
    val storeName = physStore(nl)
    val centsName = physCents(nl)
    val codesName = physCodes(nl, m, ksub)
    val cb = IvfPqCatalog.chunkCodebookStored(spark, dir, m, ksub)

    def parity(when: String): Unit = {
      spark.catalog.refreshTable(storeName); spark.catalog.refreshTable(codesName)
      val s = spark.table(storeName).select("chunk_id", "centroid_id")
      val c = spark.table(codesName).select("chunk_id", "centroid_id")
      assert(c.except(s).count() === 0L && s.except(c).count() === 0L,
        s"$when: code table and store must agree on every (chunk_id, centroid_id)")
      assert(c.count() === s.count(), s"$when: same row count in both tables")
    }
    parity("before the split")

    val hot = Compaction.partitionStats(spark, storeName).maxBy(_.bytes)
    val hotCell = hot.spec.split("=", 2)(1).toLong
    // identical to the parent's centroid: cosine 1.0 and the id tie-break
    // land the raced ingest in the parent cell, in BOTH tables
    val parentVec = spark.table(centsName)
      .filter(col("centroid_id") === hotCell)
      .select("centroid_vec").head.getSeq[Float](0)
    val racedBatch = Seq(("zzadcrace", 980001L, 5, parentVec))
      .toDF("chunk_id", "document_id", "word_count", "embedding")
      .select(col("chunk_id"), col("document_id"), col("word_count"),
        col("embedding").cast("array<float>").as("embedding"))

    val reps = Reindex.splitHotCells(spark, dir, nl, pqM = m, pqKsub = ksub,
      maxCellBytes = hot.bytes - 1, maxSplits = 1,
      beforeRewrite = () => {
        // the in-flight ingest, post-snapshot/pre-rewrite: the store row
        // retries in through the fingerprint defense, the code row lands
        // in the parent cell's partition before the code-table relabel
        IvfCatalog.appendChunks(spark, dir, racedBatch, nl)
        IvfPqCatalog.appendChunkCodes(spark, dir,
          racedBatch.select("chunk_id", "embedding"), nl, m, ksub)
      })
    val rep = reps.head
    assert(!rep.parentRetired, "a parent holding a raced-in row must not retire")
    parity("after the split")
    // the raced row sits in the parent cell in BOTH tables
    val inStore = spark.table(storeName).filter(col("chunk_id") === "zzadcrace")
      .select("centroid_id").collect().map(_.getLong(0)).toSeq
    val inCodes = spark.table(codesName).filter(col("chunk_id") === "zzadcrace")
      .select("centroid_id").collect().map(_.getLong(0)).toSeq
    assert(inStore === Seq(hotCell) && inCodes === Seq(hotCell),
      "the raced ingest stays in the parent cell in the store AND the code table")
    // every MOVED row relabeled identically in the code table (parity above
    // already implies it; assert the movement explicitly: no code row left
    // in a child-claimed cell disagrees with the store)
    val cents = spark.table(centsName).select("centroid_id")
      .collect().map(_.getLong(0)).toSet
    assert(cents.contains(hotCell), "the parent centroid must survive the raced-in row")
    assert(rep.children.forall(cents.contains), "children registered")
    // and the COMPRESSED probe serves the raced row from exactly that cell
    val top = Similarity.ivfPqSearchPruned(spark.table(codesName),
        spark.table(storeName), spark.table(centsName), cb,
        parentVec.toArray, k = 1, nprobe = 1, idCol = "chunk_id")
      .select("chunk_id").head.getString(0)
    assert(top === "zzadcrace",
      "the ADC probe at nprobe=1 must find the raced ingest in the surviving parent cell")
    dropGen(nl, m, ksub)
  }

  test("cutover lease excludes a concurrent edit; same-nlist swap replaces the live generation") {
    import spark.implicits._
    val a = 31
    dropGen(a)
    IvfCatalog.assignedChunks(spark, dir, a).count()
    DocLifecycle.docCells(spark, dir, a).count()
    def mk(word: String): String =
      (1 to 3).map(i => s"The $word ledger records page $i and appends the " +
        "surviving chunks into the partitioned serving store.").mkString(" ")
    // grow the corpus first so the re-derived centroids actually differ
    graft.streaming.StreamingIngest.ingestDocBatch(
      Seq((950001L, mk("obsidian"))).toDF("doc_id", "text"), dir, a)
    spark.catalog.refreshTable(IvfCatalog.chunkStoreName(dir, a))
    val beforeRows = spark.table(IvfCatalog.chunkStoreName(dir, a))
      .select("chunk_id", "document_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet

    @volatile var leaseError: Option[Throwable] = None
    val rep = Reindex.rebuildChunkIndex(spark, dir, a, a,
      beforeSwap = () => {
        // a concurrent edit from ANOTHER thread while the cutover holds the
        // lease: fails fast naming the holder (reentrancy is per-thread)
        val t = new Thread(() => {
          try DocLifecycle.upsertDocChunks(spark, dir,
            Seq((950001L, mk("basalt"))).toDF("doc_id", "text"), a)
          catch { case e: Throwable => leaseError = Some(e) }
        })
        t.start(); t.join()
      })
    assert(leaseError.exists(_.getMessage.contains("maintenance lease")),
      s"the in-cutover edit must fail on the lease, got: $leaseError")
    assert(rep.oldNlist === a && rep.newNlist === a)
    // the pointer now names the re-derived generation — same rows, and the
    // pre-flip natural tables are reclaimed
    assert(genOf(a) !== 0L, "a same-nlist rebuild must flip the generation pointer")
    assert(!spark.catalog.tableExists(IvfCatalog.chunkStoreName(dir, a)),
      "the replaced generation's tables must be reclaimed after the flip")
    val after = spark.table(physStore(a))
      .select("chunk_id", "document_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(after === beforeRows, "same-nlist swap keeps every row")
    val want = Similarity.ivfAssign(
        spark.table(physStore(a)).drop("centroid_id"),
        spark.table(physCents(a)), idCol = "chunk_id")
      .select("chunk_id", "centroid_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val gotCells = spark.table(physStore(a))
      .select("chunk_id", "centroid_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(gotCells === want, "stored assignment must match the new centroid table")
    assert(Pipelines.flagshipIvf(spark, dir, nlist = a, nprobe = 4).count() === 10L)
    dropGen(a)
  }

  test("a crash at any cutover instant leaves a serving index; the sweep refuses live generations") {
    val a = 29
    dropGen(a)
    IvfCatalog.assignedChunks(spark, dir, a).count()
    DocLifecycle.docCells(spark, dir, a).count()
    val storeL = IvfCatalog.chunkStoreName(dir, a)
    val group = IvfCatalog.chunkGroup(dir, a)
    val beforeRows = spark.table(physStore(a)).select("chunk_id", "document_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet

    // crash 1: INSIDE the closed gate, just before the pointer flip. The
    // pointer never moved — the old generation never stopped serving; the
    // run's own catch disposes the unreferenced staging
    val boom1 = intercept[RuntimeException] {
      Reindex.rebuildChunkIndex(spark, dir, a, a,
        beforeSwap = () => throw new RuntimeException("kill -9 pre-flip"))
    }
    assert(boom1.getMessage === "kill -9 pre-flip")
    assert(genOf(a) === 0L, "a pre-flip crash must not move the pointer")
    assert(spark.catalog.tableExists(storeL))
    assert(Pipelines.flagshipIvf(spark, dir, nlist = a, nprobe = 4).count() === 10L)

    // crash 2: right AFTER the flip, before the replaced generation drops —
    // the HARD-kill shape that used to strand the index. The new generation
    // serves immediately; the old tables are debris with an owner
    val boom2 = intercept[RuntimeException] {
      Reindex.rebuildChunkIndex(spark, dir, a, a,
        afterFlip = () => throw new RuntimeException("kill -9 post-flip"))
    }
    assert(boom2.getMessage === "kill -9 post-flip")
    val gFlipped = genOf(a)
    assert(gFlipped !== 0L, "the flip landed before the crash")
    assert(spark.catalog.tableExists(storeL),
      "the replaced generation's tables survive a post-flip crash (debris, not loss)")
    spark.catalog.refreshTable(physStore(a))
    val served = spark.table(physStore(a)).select("chunk_id", "document_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(served === beforeRows, "the new generation serves every row")
    assert(Pipelines.flagshipIvf(spark, dir, nlist = a, nprobe = 4).count() === 10L)

    // the cadence sweep must refuse the SERVING generation whatever its
    // age (its nonce is pointer-referenced) — and may reclaim the debris
    val swept = TableStore.sweepOrphans(spark, olderThanMs = 0L)
    assert(!swept.exists(_.contains(s"__gen$gFlipped")),
      s"sweep deleted a pointer-referenced generation member: $swept")
    assert(spark.catalog.tableExists(physStore(a)))

    // a re-run completes the interrupted story: entry reclaim owns the
    // debris, the rebuild lands a fresh generation, nothing is lost
    val rep = Reindex.rebuildChunkIndex(spark, dir, a, a)
    assert(rep.oldNlist === a && rep.newNlist === a)
    assert(!spark.catalog.tableExists(storeL),
      "the re-run's reclaim must drop the crashed run's natural-name debris")
    val after = spark.table(physStore(a)).select("chunk_id", "document_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(after === beforeRows, "recovery must lose no rows")
    val wantCells = Similarity.ivfAssign(
        spark.table(physStore(a)).drop("centroid_id"),
        spark.table(physCents(a)), idCol = "chunk_id")
      .select("chunk_id", "centroid_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val gotCells = spark.table(physStore(a)).select("chunk_id", "centroid_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(gotCells === wantCells, "the served store must match its centroid table")
    assert(Pipelines.flagshipIvf(spark, dir, nlist = a, nprobe = 4).count() === 10L)

    // sweep liveness rules on planted debris: an unreferenced aged __gen
    // table sweeps; a young heartbeat protects a live rebuild's staging
    import spark.implicits._
    val wh = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val aged = s"${storeL}__gen111"
    val alive = s"${storeL}__gen222"
    Seq(aged, alive).foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS `$t`")
      Seq((1L, "x")).toDF("id", "v").write.format("parquet").saveAsTable(t)
      val d = new org.apache.hadoop.fs.Path(wh, t)
      val old = System.currentTimeMillis() - 24 * 3600 * 1000L
      fs.listStatus(d).foreach(st => fs.setTimes(st.getPath, old, -1))
      fs.setTimes(d, old, -1)
    }
    TableStore.touchHeartbeat(spark, 222L)
    val swept2 = TableStore.sweepOrphans(spark)
    assert(swept2.contains(aged), "aged unreferenced staging must sweep")
    assert(!swept2.contains(alive) && spark.catalog.tableExists(alive),
      "a young heartbeat must protect a live rebuild's staging, whatever its table age")
    spark.sql(s"DROP TABLE IF EXISTS `$alive`")
    val hb = TableStore.heartbeatPath(spark, 222L)
    hb.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hb, false)
    dropGen(a)
  }

  test("same-nlist rebuild is a pointer flip: a racing probe loop sees zero wrong answers, no quiesce") {
    import spark.implicits._
    val a = 37
    dropGen(a)
    IvfCatalog.assignedChunks(spark, dir, a).count()
    DocLifecycle.docCells(spark, dir, a).count()
    def mk(word: String): String =
      (1 to 3).map(i => s"The $word ledger records page $i and appends the " +
        "surviving chunks into the partitioned serving store.").mkString(" ")
    // grow the corpus so the re-derived centroids differ from the build's
    graft.streaming.StreamingIngest.ingestDocBatch(
      Seq((960001L, mk("garnet"))).toDF("doc_id", "text"), dir, a)
    def probeOnce(): Seq[(String, Double)] =
      TableStore.retryingStale(spark, IvfCatalog.chunkStoreName(dir, a)) {
        Pipelines.flagshipIvf(spark, dir, nlist = a, nprobe = 2)
          .select("chunk_id", "score")
          .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      }
    val oldAnswer = probeOnce()

    val results = new java.util.concurrent.ConcurrentLinkedQueue[Seq[(String, Double)]]()
    @volatile var probeError: Option[Throwable] = None
    @volatile var stop = false
    val prober = new Thread(() => {
      try while (!stop) results.add(probeOnce())
      catch { case e: Throwable => probeError = Some(e) }
    })
    prober.start()
    try Reindex.rebuildChunkIndex(spark, dir, a, a)
    finally { stop = true; prober.join(60000) }
    val newAnswer = probeOnce()

    assert(probeError.isEmpty,
      s"the probe loop must never fail across the flip: $probeError")
    assert(results.size() > 0, "the loop must have probed during the rebuild")
    val legal = Set(oldAnswer, newAnswer)
    results.forEach { r =>
      assert(legal.contains(r),
        s"a probe served a MIXED generation: got ${r.take(3)}..., " +
          s"legal old=${oldAnswer.take(3)}... new=${newAnswer.take(3)}...")
    }
    dropGen(a)
  }

  test("derived tables of a rebuilt generation self-heal from the generation's own store") {
    val (a, b, m, ksub) = (43, 61, 24, 16)
    dropGen(a, m, ksub); dropGen(b, m, ksub)
    IvfCatalog.assignedChunks(spark, dir, a).count()
    IvfPqCatalog.encodedChunks(spark, dir, a, m, ksub).count()
    DocLifecycle.docCells(spark, dir, a).count()
    Reindex.rebuildChunkIndex(spark, dir, a, b, pqM = m, pqKsub = ksub)
    assert(genOf(b) !== 0L, "the rebuild must land under a versioned generation")
    // losing a derived table at a versioned generation — a doc→cells swap
    // crash, or codes never built because the rebuild ran with pqM = 0 —
    // must not brick the index: both derive from the generation's own
    // stored assignment (never fresh source centroids), so next use
    // rebuilds them, same self-heal the natural-name path has
    val wantCells = spark.table(physDc(b)).count()
    val wantCodes = spark.table(physCodes(b, m, ksub)).count()
    spark.sql(s"DROP TABLE ${physDc(b)}")
    spark.sql(s"DROP TABLE ${physCodes(b, m, ksub)}")
    assert(DocLifecycle.docCells(spark, dir, b).count() === wantCells)
    assert(IvfPqCatalog.encodedChunks(spark, dir, b, m, ksub).count() === wantCodes)
    // but the from-SOURCE store must still refuse: fresh centroids would
    // not match the stored assignments
    spark.sql(s"DROP TABLE ${physStore(b)}")
    val e = intercept[IllegalStateException] {
      IvfCatalog.assignedChunks(spark, dir, b).count()
    }
    assert(e.getMessage.contains("refusing to rebuild from source"))
    dropGen(a, m, ksub); dropGen(b, m, ksub)
  }

  test("cutover completes under a LIVE append loop; post-cutover appends land in the new generation") {
    import spark.implicits._
    val a = 41
    dropGen(a)
    IvfCatalog.assignedChunks(spark, dir, a).count()
    DocLifecycle.docCells(spark, dir, a).count()
    val baseRows = spark.table(physStore(a)).count()
    def mk(i: Int): String =
      (1 to 3).map(j => s"Continuous arrival $i page $j streams manifests and " +
        "routes surviving chunks into the partitioned serving store.").mkString(" ")

    @volatile var appendError: Option[Throwable] = None
    @volatile var stop = false
    @volatile var appended = 0
    val appender = new Thread(() => {
      try {
        var i = 0
        while (!stop) {
          graft.streaming.StreamingIngest.ingestDocBatch(
            Seq((980100L + i, mk(i))).toDF("doc_id", "text"), dir, a)
          appended += 1; i += 1
        }
      } catch { case e: Throwable => appendError = Some(e) }
    })
    appender.start()
    // the rebuild must complete WITHOUT a manual pause of the append loop:
    // the closed gate parks in-flight appends for the flip's critical
    // section and the leased+gated reconciles converge the rest
    val rep = try Reindex.rebuildChunkIndex(spark, dir, a, a)
      finally { /* keep appending a moment so post-flip arrivals exist */
        Thread.sleep(500); stop = true; appender.join(60000) }
    assert(appendError.isEmpty, s"no append may fail across the cutover: $appendError")
    assert(appended > 0, "the loop must have appended during the rebuild")
    assert(genOf(a) !== 0L, "the cutover flipped")

    // zero loss: every appended doc's chunks are in the SERVING generation
    // (pre-flip arrivals reconciled in, parked/post-flip arrivals landed in
    // the new generation), and the assignment matches the new centroids
    spark.catalog.refreshTable(physStore(a))
    val store = spark.table(physStore(a))
    val servedDocs = store.select("document_id").distinct()
      .collect().map(_.getLong(0)).toSet
    (0 until appended).foreach { i =>
      assert(servedDocs.contains(980100L + i),
        s"doc ${980100L + i} (append #$i of $appended, cutover round ${rep.cutoverRounds}) " +
          "must be in the serving generation")
    }
    val wantCells = Similarity.ivfAssign(store.drop("centroid_id"),
        spark.table(physCents(a)), idCol = "chunk_id")
      .select("chunk_id", "centroid_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val gotCells = store.select("chunk_id", "centroid_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(gotCells === wantCells, "every row — including raced-in appends — " +
      "sits where the new centroids put it")
    assert(store.count() >= baseRows)
    assert(Pipelines.flagshipIvf(spark, dir, nlist = a, nprobe = 4).count() === 10L)
    dropGen(a)
  }

  test("reindexAdvice fires on the nlist law, in both regimes, and quiets at the law") {
    val nlist = 7 // deliberately decade-stale for this corpus
    dropGen(nlist)
    IvfCatalog.assignedChunks(spark, dir, nlist).count()
    val n = spark.table(IvfCatalog.chunkStoreName(dir, nlist)).count()
    val sqrtN = math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt)

    // compute regime: default cellCapRows ≫ n, so the law is √n
    val adv = Reindex.reindexAdvice(spark, dir, nlist).get
    assert(adv.corpusRows === n)
    assert(adv.recommendedNlist === sqrtN)
    assert(adv.driftFactor === sqrtN.toDouble / nlist)
    assert(adv.store === IvfCatalog.chunkStoreName(dir, nlist))

    // quiet when the trigger sits above the measured drift
    assert(Reindex.reindexAdvice(spark, dir, nlist,
      triggerFactor = adv.driftFactor + 0.1).isEmpty)

    // memory regime: a cell cap small enough that n/cap dominates √n
    val cap = math.max(1L, n / (sqrtN * 4L))
    val byCap = Reindex.reindexAdvice(spark, dir, nlist, cellCapRows = cap).get
    assert(byCap.recommendedNlist === math.ceil(n.toDouble / cap).toInt)
    assert(byCap.recommendedNlist > adv.recommendedNlist,
      "the memory bound must override the √n optimum when cells would overflow")

    // absent generation → no advice; nonsense knobs → loud
    assert(Reindex.reindexAdvice(spark, dir, 9999).isEmpty)
    intercept[IllegalArgumentException](
      Reindex.reindexAdvice(spark, dir, nlist, triggerFactor = 0.5))
    intercept[IllegalArgumentException](
      Reindex.reindexAdvice(spark, dir, nlist, cellCapRows = 0L))

    // self-quieting: a generation AT the recommended nlist satisfies the
    // law (drift 1.0 < the 2.0 default trigger)
    dropGen(sqrtN)
    IvfCatalog.assignedChunks(spark, dir, sqrtN).count()
    assert(Reindex.reindexAdvice(spark, dir, sqrtN).isEmpty,
      "a freshly law-sized generation must not re-advise")
    dropGen(sqrtN); dropGen(nlist)
  }
}
