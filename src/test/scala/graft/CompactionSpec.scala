package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bin-packing compaction of the partitioned store catalogs: fragmented
  * cells get fewer, right-sized files; rows, partition values, and probe
  * results are byte-for-byte unchanged; healthy partitions are untouched. */
class CompactionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.warehouse.dir", "/tmp/graft_test_warehouse")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  /** Digest of the full store content (id, cell), order-free. */
  private def digest(name: String): (Long, String) = {
    val df = spark.table(name)
      .select(concat_ws(":", col("vec_id"), col("centroid_id")).as("row"))
    (df.count(),
     df.agg(md5(concat_ws("|", sort_array(collect_list("row")))).as("d"))
       .head.getString(0))
  }

  test("compactTable: fragmented cells packed to their bin count, content and probes unchanged") {
    import spark.implicits._
    // private fixture dir + store, fragmented by a stream of tiny appends
    val tdir = "/tmp/graft_compact_fixture"
    val name = TableStore.tableName("ivf8_31", tdir)
    Tables.embeddings(spark, dir).filter($"vec_id" < 100)
      .write.mode("overwrite").parquet(tdir + "/embeddings.parquet")
    spark.sql(s"DROP TABLE IF EXISTS $name")
    IvfCatalog.assignedEmbeddings(spark, tdir, 8, 31L).count()
    (1 to 4).foreach { i =>
      IvfCatalog.appendBatch(spark, tdir,
        Tables.embeddings(spark, tdir).filter($"vec_id" < 20)
          .select(($"vec_id" + i * 1000L).as("vec_id"), $"embedding"),
        8, 31L)
    }

    val before = Compaction.partitionStats(spark, name)
    assert(before.exists(_.files >= 3),
      s"fixture failed to fragment the store: $before")
    val (n0, d0) = digest(name)
    val cents = IvfCatalog.centroidsFor(spark, tdir, 8, 31L)
    val qv = Tables.embeddings(spark, tdir).filter($"vec_id" === 2L)
      .select("embedding").head.getSeq[Float](0).toArray
    def probe(): Seq[(Long, Double)] =
      operators.Similarity.ivfSearchPruned(spark.table(name), cents, qv,
          k = 10, nprobe = 4)
        .select(col("vec_id"), round(col("score"), 9).as("score"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val hits0 = probe()

    // huge target → every fragmented cell packs to exactly one file
    val report = Compaction.compactTable(spark, name, targetBytes = 1L << 30)
    assert(report.compacted.nonEmpty)
    assert(report.filesAfter < report.filesBefore)
    val after = Compaction.partitionStats(spark, name).map(p => p.spec -> p).toMap
    report.compacted.foreach { p =>
      assert(after(p.spec).files === 1,
        s"${p.spec}: expected 1 packed file, got ${after(p.spec)}")
      assert(after(p.spec).bytes > 0)
    }
    // healthy partitions were not rewritten
    before.filterNot(p => report.compacted.exists(_.spec == p.spec)).foreach { p =>
      assert(after(p.spec).files === p.files, s"untouched partition ${p.spec} changed")
    }
    // same rows, same cells, same probe answer
    assert(digest(name) === ((n0, d0)))
    assert(probe() === hits0)

    // idempotent: a second pass finds nothing to do
    val again = Compaction.compactTable(spark, name, targetBytes = 1L << 30)
    assert(again.compacted.isEmpty)
    assert(again.filesAfter === report.filesAfter)

    spark.sql(s"DROP TABLE IF EXISTS $name")
  }

  test("compactTable packs the chunk store (string id via the bucket-key fallback)") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val nlist = 29 // isolated store/centroid tables (23 is StreamingSpec doc-ingest's)
    val name = TableStore.tableName(s"ivfchunks$nlist", dir)
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"DROP TABLE IF EXISTS ${TableStore.tableName(s"ivfchunkcent$nlist", dir)}")
    val store0 = IvfCatalog.assignedChunks(spark, dir, nlist)
    val n0 = store0.count()
    // fragment: re-append the same chunk rows under fresh ids, three times
    val base = store0.select("chunk_id", "document_id", "word_count", "embedding")
      .orderBy(col("chunk_id").asc).limit(10).collect()
    (1 to 3).foreach { i =>
      val inc = base.toSeq.map(r =>
        (s"copy${i}_${r.getString(0)}", r.getLong(1), r.getInt(2), r.getSeq[Float](3)))
        .toDF("chunk_id", "document_id", "word_count", "embedding")
      IvfCatalog.appendChunks(spark, dir, inc, nlist)
    }
    val before = Compaction.partitionStats(spark, name)
    assert(before.exists(_.files >= 2), s"appends failed to fragment: $before")
    val rows0 = spark.table(name).count()
    assert(rows0 === n0 + 30)

    // default idCol (vec_id) is absent → falls back to the first data column
    val report = Compaction.compactTable(spark, name, targetBytes = 1L << 30)
    assert(report.compacted.nonEmpty)
    val after = Compaction.partitionStats(spark, name).map(p => p.spec -> p).toMap
    report.compacted.foreach(p => assert(after(p.spec).files === 1))
    assert(spark.table(name).count() === rows0)

    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"DROP TABLE IF EXISTS ${TableStore.tableName(s"ivfchunkcent$nlist", dir)}")
  }

  test("streaming ingest with compactEvery keeps the store packed without changing the loop's outcome") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val tdir = "/tmp/graft_compact_stream"
    val name = TableStore.tableName("ivf8_31", tdir)
    Tables.embeddings(spark, dir).filter($"vec_id" < 100)
      .write.mode("overwrite").parquet(tdir + "/embeddings.parquet")
    spark.sql(s"DROP TABLE IF EXISTS $name")
    IvfCatalog.assignedEmbeddings(spark, tdir, 8, 31L).count()

    // 4 batches of fresh (negated) vectors — every batch appends, and the
    // loop compacts after batches 2 and 4
    val source = MemoryStream[(Long, Seq[Float])]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_compact_ckpt").toString
    val q = streaming.StreamingIngest.start(
      source.toDF().toDF("vec_id", "embedding"), tdir, ckpt, 8, 31L,
      compactEvery = 2)
    (0 until 4).foreach { i =>
      val batch = Tables.embeddings(spark, tdir)
        .filter($"vec_id" >= i * 5L && $"vec_id" < i * 5L + 5)
        .select(($"vec_id" + 1000L).as("vec_id"),
          transform($"embedding", x => -x).as("embedding"))
        .as[(Long, Seq[Float])].collect().toSeq
      source.addData(batch: _*); q.processAllAvailable()
    }
    q.stop()

    // outcome identical to an uncompacted loop: all 20 fresh ids appended
    val store = IvfCatalog.assignedEmbeddings(spark, tdir, 8, 31L)
    assert(store.filter($"vec_id" >= 1000L).count() === 20)
    assert(store.count() === 120)
    // the final compaction (after batch 4) left every cell at its packed
    // count — nothing appended since, so a fresh pass finds nothing to do
    val again = Compaction.compactTable(spark, name, targetBytes = 1L << 30)
    assert(again.compacted.isEmpty,
      s"store not packed after the in-loop compaction: ${Compaction.partitionStats(spark, name)}")
    spark.sql(s"DROP TABLE IF EXISTS $name")
  }

  test("compactBucketed packs the band store to one file per bucket, bucket spec and probes intact") {
    import spark.implicits._
    val tdir = "/tmp/graft_compact_bucketed"
    val bandName = TableStore.tableName("dedup_bands", tdir)
    val shName = TableStore.tableName("dedup_sh", tdir)
    Seq((1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(tdir + "/documents.parquet")
    Seq(shName, bandName).foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))
    BandCatalog.corpusBands(spark, tdir).count()
    val filesBuilt = Compaction.tableFiles(spark, bandName)
    // fragment: three appends, each adding one file per touched bucket
    (1 to 3).foreach { i =>
      BandCatalog.appendBatch(spark, tdir,
        Seq((100L * i, s"increment $i spark catalyst tungsten codegen shuffle $i"))
          .toDF("doc_id", "text"))
    }
    val bandsBefore = spark.table(bandName).count()
    assert(Compaction.tableFiles(spark, bandName) > filesBuilt,
      "appends failed to fragment the band store")
    // the flag probe BEFORE compaction: a dup of increment 1 is found
    def flag(): Set[(Long, Long)] =
      operators.Dedup.minHashPairsIncrementalStored(
          Seq((999L, "increment 1 spark catalyst tungsten codegen shuffle 1"))
            .toDF("doc_id", "text"),
          BandCatalog.corpusShingles(spark, tdir), BandCatalog.corpusBands(spark, tdir))
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val hits0 = flag()
    assert(hits0 === Set((100L, 999L)))

    val (before, after, _) = Compaction.compactBucketed(spark, bandName)
    assert(before > after)
    assert(after <= 32, s"expected ≤1 file per bucket, got $after")
    // bucket spec survived the rewrite (the exchange-free probe relies on it)
    val spec = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(bandName)).bucketSpec
    assert(spec.exists(b => b.numBuckets == 32 &&
      b.bucketColumnNames == Seq("band_idx", "band_key")))
    assert(spark.table(bandName).count() === bandsBefore)
    assert(flag() === hits0)
    // the staging table was swapped in, not left behind
    assert(!spark.catalog.listTables().collect().exists(_.name.contains("cstage")),
      "compactBucketed leaked a staging table")
    Seq(shName, bandName).foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))
  }

  test("reader racing a compaction fails loudly and recovers via retryingStale — never silently wrong") {
    import spark.implicits._
    val tdir = "/tmp/graft_compact_race"
    val name = TableStore.tableName("ivf8_31", tdir)
    Tables.embeddings(spark, dir).filter($"vec_id" < 100)
      .write.mode("overwrite").parquet(tdir + "/embeddings.parquet")
    IvfCatalog.dropVectorStore(spark, tdir, 8, 31L)
    IvfCatalog.assignedEmbeddings(spark, tdir, 8, 31L).count()
    (1 to 3).foreach { i =>
      IvfCatalog.appendBatch(spark, tdir,
        Tables.embeddings(spark, tdir).filter($"vec_id" < 20)
          .select(($"vec_id" + i * 1000L).as("vec_id"), $"embedding"), 8, 31L)
    }
    val expected = spark.table(name).count()

    // the reader is ANOTHER session (the cross-session shape TableStore
    // supports): it resolves + caches the store's file listing, then the
    // maintenance session compacts — the reader's listing now names files
    // the rewrite deleted
    val reader = spark.newSession()
    val rdf = reader.table(name)
    assert(rdf.count() === expected)
    val report = Compaction.compactTable(spark, name, targetBytes = 1L << 30)
    assert(report.compacted.nonEmpty, "race fixture failed to compact anything")

    val raced =
      try Right(rdf.count())
      catch { case e: Throwable => Left(e) }
    raced match {
      case Left(e) =>
        // the documented loud failure: a FileNotFound in the cause chain,
        // never a silently short count
        def hasFnf(t: Throwable): Boolean =
          t != null && (t.isInstanceOf[java.io.FileNotFoundException] ||
            (t.getCause != t && hasFnf(t.getCause)))
        assert(hasFnf(e), s"raced reader failed with a non-listing error: $e")
      case Right(n) =>
        // listing survived (cache timing) — then the answer must be right
        assert(n === expected, "a raced reader must never return a silently wrong count")
    }
    // the packaged recovery always lands the correct result
    assert(TableStore.retryingStale(reader, name)(reader.table(name).count()) === expected)
    spark.sql(s"DROP TABLE IF EXISTS $name")
  }

  test("late-append detection: a write racing the pass aborts the batch, nothing is lost") {
    import spark.implicits._
    val tdir = "/tmp/graft_compact_lateappend"
    val name = TableStore.tableName("ivf8_31", tdir)
    Tables.embeddings(spark, dir).filter($"vec_id" < 100)
      .write.mode("overwrite").parquet(tdir + "/embeddings.parquet")
    IvfCatalog.dropVectorStore(spark, tdir, 8, 31L)
    IvfCatalog.assignedEmbeddings(spark, tdir, 8, 31L).count()
    (1 to 3).foreach { i =>
      IvfCatalog.appendBatch(spark, tdir,
        Tables.embeddings(spark, tdir).filter($"vec_id" < 10)
          .select(($"vec_id" + i * 1000L).as("vec_id"), $"embedding"), 8, 31L)
    }
    val before = spark.table(name).count()
    val lateRow = Tables.embeddings(spark, tdir).filter($"vec_id" === 2L)
      .select(($"vec_id" + 9000L).as("vec_id"), $"embedding")

    // a concurrent writer appends between the spill and the overwrite — the
    // exact window where the un-detected rewrite would delete its rows
    val report = Compaction.compactTable(spark, name, targetBytes = 1L << 30,
      beforeOverwrite = () => IvfCatalog.appendBatch(spark, tdir, lateRow, 8, 31L))
    assert(report.aborted.nonEmpty, "late append went undetected")
    assert(report.compacted.isEmpty, "an aborted batch must rewrite nothing")
    // nothing lost: every original row AND the racing append are present
    assert(spark.table(name).count() === before + 1)
    assert(spark.table(name).filter($"vec_id" === 9002L).count() === 1)

    // the next quiet cadence compacts what the aborted pass skipped
    val retry = Compaction.compactTable(spark, name, targetBytes = 1L << 30)
    assert(retry.aborted.isEmpty)
    assert(retry.compacted.nonEmpty)
    assert(spark.table(name).count() === before + 1)
    spark.sql(s"DROP TABLE IF EXISTS $name")
  }

  test("multi-column partitioning: nested partition dirs compact correctly") {
    import spark.implicits._
    val name = "graft_compact_multilevel_test"
    spark.sql(s"DROP TABLE IF EXISTS $name")
    def rows(tag: Int) = (0 until 40).map(i =>
      (tag * 1000L + i, s"payload_${tag}_$i" * 5, i % 2, s"g${i % 3}"))
      .toDF("id", "payload", "a", "b")
    rows(0).repartition(2).write.partitionBy("a", "b")
      .format("parquet").saveAsTable(name)
    (1 to 3).foreach(t => rows(t).repartition(2).write.mode("append").insertInto(name))
    val before = Compaction.partitionStats(spark, name)
    assert(before.forall(_.spec.matches("a=\\d/b=g\\d")),
      s"nested specs expected, got ${before.map(_.spec)}")
    assert(before.exists(_.files >= 3), s"fixture failed to fragment: $before")
    def digest(): (Long, String) = {
      val df = spark.table(name)
        .select(concat_ws(":", col("id"), col("a"), col("b")).as("row"))
      (df.count(),
       df.agg(md5(concat_ws("|", sort_array(collect_list("row")))).as("d")).head.getString(0))
    }
    val d0 = digest()
    val report = Compaction.compactTable(spark, name, targetBytes = 1L << 30, idCol = "id")
    assert(report.compacted.nonEmpty)
    val after = Compaction.partitionStats(spark, name).map(p => p.spec -> p).toMap
    report.compacted.foreach(p => assert(after(p.spec).files === 1))
    assert(digest() === d0)
    spark.sql(s"DROP TABLE IF EXISTS $name")
  }

  test("null-partition dirs (__HIVE_DEFAULT_PARTITION__) compact like any other cell") {
    import spark.implicits._
    val name = "graft_compact_nullpart_test"
    spark.sql(s"DROP TABLE IF EXISTS $name")
    def rows(tag: Int) = (0 until 30).map { i =>
      val p: java.lang.Long = if (i % 3 == 0) null else (i % 3).toLong
      (tag * 1000L + i, s"payload_${tag}_$i" * 5, p)
    }.toDF("id", "payload", "p")
    rows(0).repartition(2).write.partitionBy("p").format("parquet").saveAsTable(name)
    (1 to 3).foreach(t => rows(t).repartition(2).write.mode("append").insertInto(name))
    val before = Compaction.partitionStats(spark, name).map(p => p.spec -> p).toMap
    val nullSpec = "p=__HIVE_DEFAULT_PARTITION__"
    assert(before.contains(nullSpec))
    assert(before(nullSpec).files >= 3, s"null cell failed to fragment: $before")
    def digest(): (Long, String) = {
      val df = spark.table(name)
        .select(concat_ws(":", col("id"), coalesce(col("p").cast("string"), lit("∅"))).as("row"))
      (df.count(),
       df.agg(md5(concat_ws("|", sort_array(collect_list("row")))).as("d")).head.getString(0))
    }
    val d0 = digest()
    val report = Compaction.compactTable(spark, name, targetBytes = 1L << 30, idCol = "id")
    assert(report.compacted.exists(_.spec == nullSpec),
      s"null partition skipped: ${report.compacted.map(_.spec)}")
    val after = Compaction.partitionStats(spark, name).map(p => p.spec -> p).toMap
    assert(after(nullSpec).files === 1)
    assert(digest() === d0)
    spark.sql(s"DROP TABLE IF EXISTS $name")
  }

  test("compactTable honors minFiles and leaves sub-threshold partitions alone") {
    import spark.implicits._
    val tdir = "/tmp/graft_compact_minfiles"
    val name = TableStore.tableName("ivf8_31", tdir)
    Tables.embeddings(spark, dir).filter($"vec_id" < 50)
      .write.mode("overwrite").parquet(tdir + "/embeddings.parquet")
    spark.sql(s"DROP TABLE IF EXISTS $name")
    IvfCatalog.assignedEmbeddings(spark, tdir, 8, 31L).count()
    IvfCatalog.appendBatch(spark, tdir,
      Tables.embeddings(spark, tdir).filter($"vec_id" < 10)
        .select(($"vec_id" + 1000L).as("vec_id"), $"embedding"), 8, 31L)

    val maxFiles = Compaction.partitionStats(spark, name).map(_.files).max
    val report = Compaction.compactTable(spark, name,
      targetBytes = 1L << 30, minFiles = maxFiles + 1)
    assert(report.compacted.isEmpty, "minFiles above every partition must be a no-op")
    spark.sql(s"DROP TABLE IF EXISTS $name")
  }

  test("an external append invisible to the session's cached listing survives compaction") {
    import spark.implicits._
    // the hazard: session resolves (and caches) the table's file listing;
    // an EXTERNAL writer lands a file directly in a partition directory;
    // compaction's FS snapshot includes that file (so the commit re-list
    // detects no change) while the spill would read the stale cached
    // listing that excludes it — the overwrite would silently delete it.
    // compactTable refreshes the relation before snapshotting; all rows
    // must survive.
    val tdir = "/tmp/graft_compact_ext_fixture"
    val name = TableStore.tableName("ivf8_31", tdir)
    Tables.embeddings(spark, dir).filter($"vec_id" < 100)
      .write.mode("overwrite").parquet(tdir + "/embeddings.parquet")
    spark.sql(s"DROP TABLE IF EXISTS $name")
    IvfCatalog.assignedEmbeddings(spark, tdir, 8, 31L).count()
    IvfCatalog.appendBatch(spark, tdir,
      Tables.embeddings(spark, tdir).filter($"vec_id" < 20)
        .select(($"vec_id" + 5000L).as("vec_id"), $"embedding"), 8, 31L)
    val n0 = spark.table(name).count() // resolve + cache the listing NOW

    val frag = Compaction.partitionStats(spark, name).maxBy(_.files)
    assert(frag.files >= 2)
    val loc = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(name)).location
    val cellPath = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(loc), frag.spec).toString
    // the external writer: data files straight into the partition dir,
    // bypassing this session's catalog entirely — and WITHOUT the nullable
    // label column, so the rewrite must also tolerate a file narrower than
    // the table's data schema (null-filled, like a table scan would)
    Tables.embeddings(spark, tdir).filter($"vec_id" < 4)
      .select(($"vec_id" + 9000L).as("vec_id"), $"embedding")
      .coalesce(1).write.mode("append").parquet(cellPath)

    val rep = Compaction.compactTable(spark, name)
    assert(rep.compacted.nonEmpty, s"fixture failed to trigger a rewrite: $rep")
    spark.catalog.refreshTable(name)
    assert(spark.table(name).count() === n0 + 4,
      "externally appended rows were lost by the rewrite")
    assert(spark.table(name).filter($"vec_id" >= 9000L).count() === 4)
    spark.sql(s"DROP TABLE IF EXISTS $name")
  }

  test("a single batch holding ~1500 fragmented partitions compacts without blowing plan depth") {
    import spark.implicits._
    // regression, found at ×1000 by MaintenanceWindowBench: the
    // per-partition file-target used to fold into a when().otherwise()
    // chain nested one level per partition, and a byte-bounded batch
    // holding every cell of a 1414-cell store overflowed the stack
    // converting the Column tree. The target is now a broadcast-joined
    // frame — constant plan depth at any batch width.
    val name = "graft_compact_manycells"
    spark.sql(s"DROP TABLE IF EXISTS $name")
    // a crashed earlier run may have left the managed location behind (the
    // in-memory catalog forgets the table across JVMs, DROP won't clean it)
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), name)
    wh.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(wh, true)
    // 1500 cells × 2 tiny files each: two single-task writes, each landing
    // one file in every cell dir
    val rows = spark.range(1500).select($"id".as("centroid_id"), $"id".as("vec_id"))
    rows.coalesce(1)
      .write.partitionBy("centroid_id").format("parquet").saveAsTable(name)
    rows.select($"centroid_id", ($"vec_id" + 1500).as("vec_id")).coalesce(1)
      .write.mode("append").partitionBy("centroid_id").format("parquet").saveAsTable(name)
    val before = Compaction.partitionStats(spark, name)
    assert(before.size === 1500)
    assert(before.forall(_.files >= 2), "fixture failed to fragment every cell")
    val sum0 = spark.table(name).agg(sum($"vec_id")).head.getLong(0)

    val rep = Compaction.compactTable(spark, name, targetBytes = 1L << 30)
    assert(rep.compacted.size === 1500, s"expected all 1500 cells rewritten: $rep")
    assert(Compaction.partitionStats(spark, name).forall(_.files === 1))
    assert(spark.table(name).count() === 3000)
    assert(spark.table(name).agg(sum($"vec_id")).head.getLong(0) === sum0)
    spark.sql(s"DROP TABLE IF EXISTS $name")
  }

  test("a crash mid rename-commit auto-resumes from the manifest — no human in the recovery path") {
    import spark.implicits._
    val tdir = "/tmp/graft_commit_resume_fixture"
    val name = TableStore.tableName("ivf8_31", tdir)
    Tables.embeddings(spark, dir).filter($"vec_id" < 100)
      .write.mode("overwrite").parquet(tdir + "/embeddings.parquet")
    spark.sql(s"DROP TABLE IF EXISTS $name")
    IvfCatalog.assignedEmbeddings(spark, tdir, 8, 31L).count()
    def fragment(tag: Int): Unit = (1 to 3).foreach { i =>
      IvfCatalog.appendBatch(spark, tdir,
        Tables.embeddings(spark, tdir).filter($"vec_id" < 20)
          .select(($"vec_id" + (tag * 10 + i) * 1000L).as("vec_id"), $"embedding"),
        8, 31L)
    }
    fragment(1)
    val wantDigest = digest(name)
    val wh = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def stagings(): Seq[String] = fs.listStatus(wh).toSeq.map(_.getPath.getName)
      .filter(_.startsWith(s"__compact_tmp_${name}_"))

    // crash at the WORST instant: the first partition's stale files are
    // deleted, its staged replacements not yet moved — that partition's
    // content exists only in the staging
    val boom = intercept[RuntimeException] {
      Compaction.compactTable(spark, name, targetBytes = 1L << 30,
        duringCommit = _ => throw new RuntimeException("kill -9 mid-commit"))
    }
    assert(boom.getMessage === "kill -9 mid-commit")
    assert(stagings().size === 1, "the staging must be kept as the recovery copy")
    assert(Compaction.partitionStats(spark, name).exists(_.files === 0),
      "the crash must have left a partition with its data only in staging")

    // the NEXT maintenance pass heals automatically before compacting
    Compaction.compactTable(spark, name, targetBytes = 1L << 30)
    assert(digest(name) === wantDigest, "auto-resume must restore every row")
    assert(stagings().isEmpty, "the completed staging is removed")
    assert(!Compaction.partitionStats(spark, name).exists(_.files === 0))

    // the cadence sweep is the other healer: crash again (fresh fragments),
    // then sweep — an aged manifest-bearing staging is COMPLETED, never
    // discarded
    fragment(2)
    val wantDigest2 = digest(name)
    intercept[RuntimeException] {
      Compaction.compactTable(spark, name, targetBytes = 1L << 30,
        duringCommit = _ => throw new RuntimeException("kill -9 again"))
    }
    assert(stagings().size === 1)
    val swept = TableStore.sweepOrphans(spark, olderThanMs = 0L)
    assert(swept.exists(_.startsWith(s"__compact_tmp_${name}_")),
      s"the sweep must complete-and-remove the interrupted commit, got $swept")
    assert(stagings().isEmpty)
    assert(digest(name) === wantDigest2,
      "the sweep's resume must land the committed content, not discard it")
    spark.sql(s"DROP TABLE IF EXISTS $name")
  }

  test("sweepOrphans removes aged crash leftovers, keeps young staging and live tables") {
    import spark.implicits._
    val wh = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def plantDir(name: String, old: Boolean): org.apache.hadoop.fs.Path = {
      val p = new org.apache.hadoop.fs.Path(wh, name)
      fs.mkdirs(p)
      val f = new org.apache.hadoop.fs.Path(p, "part-0.parquet")
      val out = fs.create(f, true); out.write(Array[Byte](1, 2, 3)); out.close()
      if (old) { val t = System.currentTimeMillis() - 60 * 60 * 1000L
                 fs.setTimes(f, t, -1); fs.setTimes(p, t, -1) }
      p
    }
    // aged orphans of every class a JVM kill can leak
    val oldUpsert = plantDir("__upsert_tmp_graft_sweep_x_123", old = true)
    val oldCompact = plantDir("__compact_tmp_graft_sweep_y_456", old = true)
    val leaseP = new org.apache.hadoop.fs.Path(wh, "__graft_lease_graft_sweep_z")
    val lo = fs.create(leaseP, true); lo.write("dead:pid0:t:0".getBytes("UTF-8")); lo.close()
    fs.setTimes(leaseP, System.currentTimeMillis() - 60 * 60 * 1000L, -1)
    // an aged REGISTERED staging table (a persistent-metastore crash shape)
    // whose natural table still lives — the REDUNDANT leftover, sweepable
    val naturalLive = "graft_sweep_live"
    spark.sql(s"DROP TABLE IF EXISTS $naturalLive")
    Seq((1L, "n")).toDF("id", "v").write.format("parquet").saveAsTable(naturalLive)
    val stage = "graft_sweep_live__cstage777"
    spark.sql(s"DROP TABLE IF EXISTS $stage")
    Seq((1L, "a")).toDF("id", "v").write.format("parquet").saveAsTable(stage)
    val stageDir = new org.apache.hadoop.fs.Path(wh, stage)
    val t = System.currentTimeMillis() - 60 * 60 * 1000L
    fs.listStatus(stageDir).foreach(st => fs.setTimes(st.getPath, t, -1))
    fs.setTimes(stageDir, t, -1)
    // an aged staging whose natural name is ABSENT — a crashed swap's only
    // copy: refused whatever its age (the horizon must never be a
    // destruction timer on a recovery copy)
    val orphanStage = plantDir("graft_sweep_gone__cstage888", old = true)
    // a YOUNG spill (an in-flight job's) and a live table must survive
    val young = plantDir("__compact_tmp_graft_sweep_young_789", old = false)
    val live = "graft_sweep_live_table"
    spark.sql(s"DROP TABLE IF EXISTS $live")
    Seq((1L, "keep")).toDF("id", "v").write.format("parquet").saveAsTable(live)

    val removed = TableStore.sweepOrphans(spark, olderThanMs = 30 * 60 * 1000L)
    assert(removed.toSet === Set(oldUpsert.getName, oldCompact.getName,
      leaseP.getName, stage))
    assert(!fs.exists(oldUpsert) && !fs.exists(oldCompact) && !fs.exists(leaseP))
    assert(!fs.exists(stageDir) && !spark.catalog.tableExists(stage),
      "the aged staging table must be dropped from catalog AND disk")
    assert(fs.exists(orphanStage),
      "a staging whose natural sibling is absent is a recovery copy — refused")
    assert(fs.exists(young), "a young in-flight spill must be kept")
    assert(spark.catalog.tableExists(live) && spark.table(live).count() === 1L)
    fs.delete(young, true); fs.delete(orphanStage, true)
    Seq(live, naturalLive).foreach(tb => spark.sql(s"DROP TABLE IF EXISTS $tb"))
  }

  test("retryingStale retries more than once under repeated churn, re-evaluates its refresh list, and stays bounded") {
    // the ×1000 lesson: a long probe's RE-RUN can race the NEXT
    // maintenance pass — one retry is not a contract, bounded retries are
    var calls = 0
    var namesEvals = 0
    val out = TableStore.retryingStaleBy(spark) { namesEvals += 1; Seq.empty[String] } {
      calls += 1
      if (calls < 3) throw new java.io.FileNotFoundException(s"stale listing $calls")
      "served"
    }
    assert(out === "served")
    assert(calls === 3, "two consecutive stale listings must both be retried")
    assert(namesEvals === 2, "the refresh list re-evaluates before each retry " +
      "(a flip can change which physical tables the re-run scans)")
    // persistent failure still surfaces — never an unbounded loop
    var always = 0
    intercept[java.io.FileNotFoundException] {
      TableStore.retryingStaleBy(spark)(Seq.empty[String]) {
        always += 1; throw new java.io.FileNotFoundException("permanent")
      }
    }
    assert(always === 3)
  }

  test("sweepOrphans: replaced-generation staging and crashed pointer tmp are debris; live-generation recovery copies and the pointer itself are not") {
    val wh = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val oldT = System.currentTimeMillis() - 60 * 60 * 1000L
    def plantDir(name: String): org.apache.hadoop.fs.Path = {
      val p = new org.apache.hadoop.fs.Path(wh, name)
      fs.mkdirs(p)
      val f = new org.apache.hadoop.fs.Path(p, "part-0.parquet")
      val out = fs.create(f, true); out.write(Array[Byte](1, 2, 3)); out.close()
      fs.setTimes(f, oldT, -1); fs.setTimes(p, oldT, -1)
      p
    }
    def plantFile(name: String, content: String,
                  old: Boolean): org.apache.hadoop.fs.Path = {
      val p = new org.apache.hadoop.fs.Path(wh, name)
      val out = fs.create(p, true); out.write(content.getBytes("UTF-8")); out.close()
      if (old) fs.setTimes(p, oldT, -1)
      p
    }
    // a live pointer referencing generation 9100042 — never swept
    val pointer = plantFile("__graft_gen_graft_swp_grp", "9100042", old = true)
    // a crashed compactDocCells staging of a RETIRED generation (9100041,
    // unreferenced): its natural is legitimately gone after the flip — aged
    // debris, swept (pre-fix it was refused as a "recovery copy" forever)
    val retiredStage = plantDir("graft_swp_cells__gen9100041__cstage31")
    // the same crash shape at the LIVE generation: natural absent with the
    // generation still referenced IS a crashed swap — refused whatever age
    val liveStage = plantDir("graft_swp_cells__gen9100042__cstage32")
    // a flipGen tmp file orphaned between create and rename — swept
    val ptrTmp = plantFile("__graft_gen_graft_swp_grp.tmp9100041", "9100041", old = true)

    val removed = TableStore.sweepOrphans(spark, olderThanMs = 30 * 60 * 1000L)
    assert(removed.contains(retiredStage.getName),
      "a staging whose natural is a replaced generation is aged debris")
    assert(removed.contains(ptrTmp.getName), "crashed pointer tmp is debris")
    assert(!removed.contains(liveStage.getName) && fs.exists(liveStage),
      "a live-generation crashed swap's staging is a recovery copy — refused")
    assert(fs.exists(pointer), "the live generation pointer must survive")
    assert(!fs.exists(retiredStage) && !fs.exists(ptrTmp))
    fs.delete(liveStage, true); fs.delete(pointer, false)
  }

  /** Hand-plant a staging dir carrying a replay manifest in the on-disk
    * format [[Compaction]] writes (T/L/R header, P/D/M plan lines). */
  private def plantStaging(fs: org.apache.hadoop.fs.FileSystem,
                           wh: org.apache.hadoop.fs.Path,
                           stagingName: String, manifest: String,
                           staged: Seq[(String, String)] = Nil)
      : org.apache.hadoop.fs.Path = {
    val tmp = new org.apache.hadoop.fs.Path(wh, stagingName)
    fs.delete(tmp, true); fs.mkdirs(tmp)
    staged.foreach { case (spec, f) =>
      val d = new org.apache.hadoop.fs.Path(tmp, spec); fs.mkdirs(d)
      val out = fs.create(new org.apache.hadoop.fs.Path(d, f), true)
      try out.write("staged".getBytes("UTF-8")) finally out.close()
    }
    val out = fs.create(new org.apache.hadoop.fs.Path(tmp, Compaction.ManifestFile), true)
    try out.write(manifest.getBytes("UTF-8")) finally out.close()
    tmp
  }

  test("entry resume replays only stagings whose MANIFEST records the table — a name-extending sibling's staging is never replayed under the wrong lease") {
    val wh = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val name = "graft_scopecheck"
    // the victim: a root whose prefix-colliding sibling's manifest orders a
    // delete — if the scope check is missing, resuming under `name` would
    // destroy this file while the sibling's own writer may be live
    val otherRoot = new org.apache.hadoop.fs.Path(wh, s"${name}_gen7_root")
    val victimDir = new org.apache.hadoop.fs.Path(otherRoot, "cell=1")
    fs.mkdirs(victimDir)
    val victim = new org.apache.hadoop.fs.Path(victimDir, "live.parquet")
    val vo = fs.create(victim, true); vo.write("live".getBytes("UTF-8")); vo.close()
    val evil = plantStaging(fs, wh, s"__compact_tmp_${name}_gen7_99",
      s"T\t${name}_gen7\nL\t${name}_gen7\nR\t$otherRoot\nP\tcell=1\nD\tlive.parquet\n")
    // a legitimate staging of THIS table: one stale delete + one staged move
    val myRoot = new org.apache.hadoop.fs.Path(wh, s"${name}_root")
    val myDir = new org.apache.hadoop.fs.Path(myRoot, "cell=2")
    fs.mkdirs(myDir)
    val stale = new org.apache.hadoop.fs.Path(myDir, "old.parquet")
    val so = fs.create(stale, true); so.write("old".getBytes("UTF-8")); so.close()
    val mine = plantStaging(fs, wh, s"__compact_tmp_${name}_55",
      s"T\t$name\nL\t$name\nR\t$myRoot\nP\tcell=2\nD\told.parquet\nM\tnew.parquet\n",
      staged = Seq(("cell=2", "new.parquet")))

    val resumed = Compaction.resumeInterruptedCommits(spark, name)
    assert(resumed === 1, "exactly the exact-match staging replays")
    assert(!fs.exists(mine), "the matching staging completes and is removed")
    assert(!fs.exists(stale) &&
      fs.exists(new org.apache.hadoop.fs.Path(myDir, "new.parquet")),
      "the matching staging's plan (delete stale, move staged) must land")
    assert(fs.exists(evil) && fs.exists(victim),
      "the name-extending sibling's staging and its table are untouched")
    fs.delete(evil, true); fs.delete(otherRoot, true); fs.delete(myRoot, true)
  }

  test("a truncated manifest never wedges resume — unparseable means manifest-less, and the sweep clears the staging as plain debris") {
    val wh = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a tab-less partial line — the shape a crash mid-write used to leave
    // before the atomic temp+rename publish; resume must treat it as NO
    // manifest (provably pre-mutation) instead of throwing at entry
    val trunc = plantStaging(fs, wh, "__compact_tmp_graft_truncmf_1",
      "T\tgraft_truncmf\nLgraft_trunc")
    assert(!Compaction.resumeCommit(spark, trunc),
      "an unparseable manifest is not replayable")
    assert(Compaction.resumeInterruptedCommits(spark, "graft_truncmf") === 0,
      "entry resume skips it without throwing — the cadence stays alive")
    assert(fs.exists(trunc), "resume never deletes what it cannot parse")
    val t = System.currentTimeMillis() - 60 * 60 * 1000L
    fs.listStatus(trunc).foreach(st => fs.setTimes(st.getPath, t, -1))
    fs.setTimes(trunc, t, -1)
    val removed = TableStore.sweepOrphans(spark, olderThanMs = 30 * 60 * 1000L)
    assert(removed.contains(trunc.getName) && !fs.exists(trunc),
      "aged manifest-less staging is debris for the sweep")
  }

  test("an UNREADABLE manifest is skipped, never deleted on — a transient read error proves nothing about the staging") {
    val wh = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a manifest that EXISTS but cannot be opened as a file (a directory at
    // the manifest name — fs.open throws IOException, the same failure
    // class as an S3 throttle or HDFS failover mid-read). The staging may
    // hold the only copy of rewritten partitions, so every recovery path
    // must leave it alone this pass.
    val tmp = new org.apache.hadoop.fs.Path(wh, "__compact_tmp_graft_unreadmf_1")
    fs.delete(tmp, true)
    fs.mkdirs(new org.apache.hadoop.fs.Path(tmp, Compaction.ManifestFile))
    assert(Compaction.resumeInterruptedCommits(spark, "graft_unreadmf") === 0,
      "entry resume skips an unreadable manifest without throwing")
    assert(fs.exists(tmp), "entry resume never deletes what it cannot read")
    val t = System.currentTimeMillis() - 60 * 60 * 1000L
    fs.listStatus(tmp).foreach(st => fs.setTimes(st.getPath, t, -1))
    fs.setTimes(tmp, t, -1)
    val removed = TableStore.sweepOrphans(spark, olderThanMs = 30 * 60 * 1000L)
    assert(!removed.contains(tmp.getName) && fs.exists(tmp),
      "the sweep must skip (not debris-delete) an aged staging whose manifest is unreadable")
    fs.delete(tmp, true)
  }
}
