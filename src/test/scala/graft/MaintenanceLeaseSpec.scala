package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The single-maintenance-writer contract as MECHANISM
  * ([[MaintenanceLease]] / [[MaintenanceLock]]): a second concurrent
  * maintenance writer fails fast naming the holder, short overlaps wait
  * and proceed, dead writers' leases break by TTL — and the doc→cells
  * swap preserves pairs appended after its rebuild snapshot (the
  * late-pair merge), the race the lease/lock pair exists to close. */
class MaintenanceLeaseSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.warehouse.dir", "/tmp/graft_test_warehouse")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("a second concurrent writer fails fast, naming the holder") {
    spark.sparkContext.setLogLevel("WARN")
    val gate = new java.util.concurrent.CountDownLatch(1)
    val entered = new java.util.concurrent.CountDownLatch(1)
    val t = new Thread(() =>
      MaintenanceLease.withLease(spark, "spec_scope_a") { entered.countDown(); gate.await() })
    t.start(); entered.await()
    val ex = intercept[IllegalStateException] {
      // a different thread: the ThreadLocal reentrancy must not apply
      MaintenanceLease.withLease(spark, "spec_scope_a", waitMs = 300) { fail("must not enter") }
    }
    assert(ex.getMessage.contains("held by") && ex.getMessage.contains("pid"))
    gate.countDown(); t.join()
    // released: acquirable again
    MaintenanceLease.withLease(spark, "spec_scope_a", waitMs = 300) { () }
  }

  test("short overlaps wait and proceed; reentrant in-thread; released on exception") {
    val gate = new java.util.concurrent.CountDownLatch(1)
    val entered = new java.util.concurrent.CountDownLatch(1)
    val t = new Thread(() => MaintenanceLease.withLease(spark, "spec_scope_b") {
      entered.countDown(); gate.await()
    })
    t.start(); entered.await()
    // release the holder shortly; the waiter (waitMs = 5 s) must proceed
    new Thread(() => { Thread.sleep(300); gate.countDown() }).start()
    var ran = false
    MaintenanceLease.withLease(spark, "spec_scope_b", waitMs = 5000) {
      // nested re-acquire of the same scope in the same thread is a no-op
      MaintenanceLease.withLease(spark, "spec_scope_b", waitMs = 0) { ran = true }
    }
    assert(ran)
    t.join()
    // an exception in the body still releases the lease
    intercept[RuntimeException] {
      MaintenanceLease.withLease(spark, "spec_scope_b") { throw new RuntimeException("boom") }
    }
    MaintenanceLease.withLease(spark, "spec_scope_b", waitMs = 0) { () }
  }

  test("same-JVM thread storm: never two writers inside one scope at once") {
    // the deployment shape runs every loop on one driver JVM, where the
    // local FS's exists-then-create is NOT atomic — exclusion must come
    // from the per-scope JVM lock, and a storm of simultaneous acquirers
    // must serialize without ever double-entering
    val inside = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxInside = new java.util.concurrent.atomic.AtomicInteger(0)
    val entries = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 8).map { _ =>
      new Thread(() =>
        MaintenanceLease.withLease(spark, "spec_scope_storm", waitMs = 30000) {
          val now = inside.incrementAndGet()
          maxInside.getAndUpdate(m => math.max(m, now))
          entries.incrementAndGet()
          Thread.sleep(30)
          inside.decrementAndGet()
        })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(entries.get === 8, "every contender must eventually acquire")
    assert(maxInside.get === 1, "two writers were inside the scope simultaneously")
  }

  test("a dead writer's lease (older than ttl) is broken, not waited on") {
    val path = MaintenanceLease.leasePath(spark, "spec_scope_c")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    out.write("deadhost:pid0:crashed:0".getBytes("UTF-8")); out.close()
    fs.setTimes(path, System.currentTimeMillis() - 60 * 60 * 1000L, -1)
    var ran = false
    MaintenanceLease.withLease(spark, "spec_scope_c", ttlMs = 1000, waitMs = 0) { ran = true }
    assert(ran)
    assert(!fs.exists(path), "the broken-and-reacquired lease must be released after the body")
  }

  test("a LIVE holder's lease never ages past ttl — the keepalive refreshes it for the job's whole life") {
    val path = MaintenanceLease.leasePath(spark, "spec_scope_ka")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    MaintenanceLease.withLease(spark, "spec_scope_ka", ttlMs = 600, waitMs = 0) {
      // hold for >4× the ttl — a corpus-scale rewrite outliving any fixed
      // TTL is the deployment case; without refresh a waiter would break
      // this LIVE lease and run concurrently
      Thread.sleep(2500)
      val age = System.currentTimeMillis() -
        fs.getFileStatus(path).getModificationTime
      assert(age < 600,
        s"held lease aged $age ms past its last refresh — a waiter would TTL-break a live writer")
    }
    assert(!fs.exists(path), "released on exit despite the refreshes")
  }

  test("doc-cells swap preserves pairs appended after its rebuild snapshot and reclaims false positives") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val tdir = "/tmp/graft_leaserace_fixture"
    val nlist = 19
    def mkDoc(id: Long, rev: Int): String =
      (1 to 6).map(i => s"Document $id revision $rev sentence $i keeps the lease race " +
        s"fixture on subject ${(id * 5 + rev * 3 + i) % 11} with enough words for " +
        "genuine chunks in every revision.").mkString(" ")
    (1L to 6L).map(id => id -> mkDoc(id, 0)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tdir/documents.parquet")
    val toDrop = Seq(TableStore.tableName("chunks", tdir),
      TableStore.tableName(s"ivfchunks$nlist", tdir),
      TableStore.tableName(s"ivfchunkcent$nlist", tdir),
      DocLifecycle.docCellsName(tdir, nlist))
    toDrop.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    spark.catalog.clearCache()
    IvfCatalog.assignedChunks(spark, tdir, nlist).count()
    DocLifecycle.docCells(spark, tdir, nlist).count()

    // seed FALSE POSITIVES: an edit leaves the doc's old cells listed
    DocLifecycle.upsertDocChunks(spark, tdir,
      Seq((2L, mkDoc(2, 1))).toDF("doc_id", "text"), nlist)

    // the race the merge closes: an ingest append lands AFTER the swap's
    // rebuild snapshot (injected through the beforeSwap seam) — its pairs
    // are in the live index but not the staged rebuild, and the old code
    // erased them, leaving live rows in never-listed cells forever
    DocLifecycle.compactDocCells(spark, tdir, nlist, beforeSwap = () =>
      graft.streaming.StreamingIngest.ingestDocBatch(
        Seq((30L, mkDoc(30, 0))).toDF("doc_id", "text"), tdir, nlist))

    val livePairs = IvfCatalog.assignedChunks(spark, tdir, nlist)
      .select("document_id", "centroid_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val indexed = DocLifecycle.docCells(spark, tdir, nlist)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(livePairs.exists(_._1 == 30L), "the injected append must be in the store")
    // exact equality: late pairs preserved (never-miss) AND the upsert's
    // false positives reclaimed (the rebuild's purpose) in one swap
    assert(indexed === livePairs,
      "post-swap index must equal the store's live pairs exactly")
    toDrop.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("lifecycle ops and the doc-cells swap serialize on the store's lease across threads") {
    import spark.implicits._
    val tdir = "/tmp/graft_leaserace_fixture" // built by the previous test's fixture
    val nlist = 23
    def mkDoc(id: Long, rev: Int): String =
      (1 to 6).map(i => s"Document $id revision $rev sentence $i keeps the serialization " +
        s"fixture on subject ${(id * 5 + rev * 3 + i) % 11} with enough words for " +
        "genuine chunks in every revision.").mkString(" ")
    (1L to 4L).map(id => id -> mkDoc(id, 0)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tdir/documents.parquet")
    val toDrop = Seq(TableStore.tableName("chunks", tdir),
      TableStore.tableName(s"ivfchunks$nlist", tdir),
      TableStore.tableName(s"ivfchunkcent$nlist", tdir),
      DocLifecycle.docCellsName(tdir, nlist))
    toDrop.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    spark.catalog.clearCache()
    IvfCatalog.assignedChunks(spark, tdir, nlist).count()
    DocLifecycle.docCells(spark, tdir, nlist).count()

    // an upsert stalled mid-rewrite (beforeOverwrite latch) holds the
    // store's lease; a compactDocCells from another thread must NOT
    // interleave its swap into the upsert's pairs-then-rewrite window —
    // it waits for the lease and runs after
    val inRewrite = new java.util.concurrent.CountDownLatch(1)
    val stall = new java.util.concurrent.CountDownLatch(1)
    val upsert = new Thread(() =>
      DocLifecycle.upsertDocChunks(spark, tdir,
        Seq((2L, mkDoc(2, 7))).toDF("doc_id", "text"), nlist,
        beforeOverwrite = () => { inRewrite.countDown(); stall.await() }))
    upsert.start(); inRewrite.await()
    val compactor = new Thread(() => DocLifecycle.compactDocCells(spark, tdir, nlist))
    compactor.start()
    compactor.join(1500)
    assert(compactor.isAlive, "compactDocCells must be blocked on the upsert's lease")
    stall.countDown()
    upsert.join(); compactor.join()
    val livePairs = IvfCatalog.assignedChunks(spark, tdir, nlist)
      .select("document_id", "centroid_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val indexed = DocLifecycle.docCells(spark, tdir, nlist)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(indexed === livePairs, "serialized swap must land on the post-upsert store")
    toDrop.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("closedAll parks appends on EVERY named group and releases all gates — the diff-nlist cutover's dual-family quiesce") {
    val inBody = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val cutover = new Thread(() =>
      // deliberately unsorted input: closedAll orders internally
      CutoverGate.closedAll(Seq("cg_spec_b", "cg_spec_a")) {
        inBody.countDown(); release.await()
      })
    cutover.start(); inBody.await()
    val aDone = new java.util.concurrent.atomic.AtomicBoolean(false)
    val bDone = new java.util.concurrent.atomic.AtomicBoolean(false)
    val ta = new Thread(() => CutoverGate.entered("cg_spec_a") { aDone.set(true) })
    val tb = new Thread(() => CutoverGate.entered("cg_spec_b") { bDone.set(true) })
    ta.start(); tb.start(); Thread.sleep(300)
    assert(!aDone.get && !bDone.get,
      "appends to BOTH families must park while the dual gate is closed")
    release.countDown()
    ta.join(5000); tb.join(5000); cutover.join(5000)
    assert(aDone.get && bDone.get, "both appends proceed once the gates reopen")
  }

  test("two concurrent dual-gate cutovers with reversed group orders never deadlock (sorted acquisition)") {
    val rounds = 50
    val done = new java.util.concurrent.CountDownLatch(2)
    def looper(groups: Seq[String]) = new Thread(() => {
      (1 to rounds).foreach { _ =>
        CutoverGate.closedAll(groups, maxWaitMs = 10000L) { () }
      }
      done.countDown()
    })
    looper(Seq("cg_dl_x", "cg_dl_y")).start()
    looper(Seq("cg_dl_y", "cg_dl_x")).start()
    assert(done.await(30, java.util.concurrent.TimeUnit.SECONDS),
      "reversed-order dual closes must both finish — lock order is sorted, not caller order")
  }

  test("breakStale: an aged capture is discarded, a FRESH lease is captured-then-restored intact — the sweep's reclamation primitive") {
    val wh = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stale = new org.apache.hadoop.fs.Path(wh, "__graft_lease_spec_bs_stale")
    val o1 = fs.create(stale, true); o1.write("dead:pid0".getBytes("UTF-8")); o1.close()
    fs.setTimes(stale, System.currentTimeMillis() - 60 * 60 * 1000L, -1)
    assert(MaintenanceLease.breakStale(fs, stale, ttlMs = 30 * 60 * 1000L),
      "a lease past the TTL is broken")
    assert(!fs.exists(stale))
    // the TOCTOU the sweep used to have: by break time the file is a fresh
    // writer's LIVE lease — the mtime re-verify must put it back unharmed
    val live = new org.apache.hadoop.fs.Path(wh, "__graft_lease_spec_bs_live")
    val o2 = fs.create(live, true); o2.write("alive:pid1".getBytes("UTF-8")); o2.close()
    assert(!MaintenanceLease.breakStale(fs, live, ttlMs = 30 * 60 * 1000L),
      "a young capture is restored, never discarded")
    assert(fs.exists(live), "the live lease survives the attempted break")
    val in = fs.open(live)
    val txt = try new String(
      org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8") finally in.close()
    assert(txt === "alive:pid1", "restored byte-for-byte")
    fs.delete(live, false)
  }
}
