package graft

import org.apache.spark.sql.SparkSession

/** Mechanical enforcement of the single-maintenance-writer deployment
  * contract (Compaction scaladoc): every maintenance/edit writer — cell
  * rewrites ([[DocLifecycle.upsertDocChunks]]/[[DocLifecycle.deleteDocChunks]]),
  * compaction passes ([[Compaction.compactTable]]/[[Compaction.compactBucketed]]),
  * and the doc→cells swap ([[DocLifecycle.compactDocCells]]) — acquires a
  * per-scope LEASE before mutating, so a mis-deployed second writer fails
  * immediately and loudly, naming the holder, instead of degrading into
  * fingerprint-retry churn (or, for two racing REWRITERS, a lost update the
  * fingerprint defense cannot see — it detects appends, not a twin
  * overwriter that passed its own re-list).
  *
  * The lease is a create-if-absent marker file in the warehouse directory
  * (atomic create on HDFS and the local FS; an object store without atomic
  * create — S3 — needs a real lock service instead, same as every
  * file-lease scheme). Scope is the index being maintained — callers pass
  * the primary store's table name, so everything that rewrites one index's
  * table group (raw store, code table, doc→cells) excludes everything else
  * that does. A short bounded wait (default 10 s) absorbs a cadence pass
  * running momentarily long next to an edit batch; sustained contention
  * fails loudly. A lease older than `ttlMs` belongs to a dead writer (a
  * crashed JVM cannot release) and is broken. Reentrant per thread: an op
  * that already holds a scope can nest calls that re-acquire it (an edit
  * batch's delete + upsert, a spec's injection seam).
  *
  * INGEST appends ([[IvfCatalog.appendBatch]]/[[IvfCatalog.appendChunks]])
  * deliberately do NOT take the lease — ingest must never block on
  * maintenance; append-vs-rewrite races remain covered by the fingerprint
  * detection, and append-vs-swap on the doc→cells index by
  * [[MaintenanceLock]] (same-JVM, the deployment shape: all of one
  * pipeline's writer loops run on one Spark driver). */
object MaintenanceLease {

  private val held = new ThreadLocal[scala.collection.mutable.Set[String]] {
    override def initialValue() = scala.collection.mutable.Set.empty[String]
  }

  private[graft] def leasePath(spark: SparkSession, scope: String) =
    new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      "__graft_lease_" + scope.replaceAll("[^a-zA-Z0-9_]", "_"))

  private def readHolder(fs: org.apache.hadoop.fs.FileSystem,
                         path: org.apache.hadoop.fs.Path): String =
    try {
      val in = fs.open(path)
      try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
      finally in.close()
    } catch { case _: Throwable => "<unreadable>" }

  /** Run `body` holding the maintenance lease for `scope`. Waits up to
    * `waitMs` for a contended lease, breaks one older than `ttlMs` (dead
    * writer), then fails loudly naming the holder. */
  def withLease[A](spark: SparkSession, scope: String,
                   ttlMs: Long = 30 * 60 * 1000L,
                   waitMs: Long = 10 * 1000L)(body: => A): A = {
    if (held.get.contains(scope)) return body // reentrant within a thread
    val path = leasePath(spark, scope)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val holder = java.net.InetAddress.getLocalHost.getHostName +
      s":pid${ProcessHandle.current().pid()}:${Thread.currentThread().getName}" +
      s":${System.nanoTime()}"
    val deadline = System.currentTimeMillis() + waitMs
    var acquired = false
    while (!acquired) {
      val created =
        try {
          val out = fs.create(path, false) // atomic create-if-absent
          try out.write(holder.getBytes("UTF-8")) finally out.close()
          true
        } catch { case _: java.io.IOException => false }
      if (created) acquired = true
      else {
        val st = try Some(fs.getFileStatus(path))
                 catch { case _: java.io.FileNotFoundException => None }
        st match {
          case Some(s)
              if System.currentTimeMillis() - s.getModificationTime > ttlMs =>
            fs.delete(path, false) // dead writer's lease — break and retry
          case Some(_) if System.currentTimeMillis() >= deadline =>
            throw new IllegalStateException(
              s"maintenance lease for '$scope' is held by ${readHolder(fs, path)} — " +
                "one maintenance writer per index is the deployment contract " +
                s"(waited $waitMs ms); quiesce the other writer or raise waitMs")
          case Some(_) => Thread.sleep(100)
          case None    => () // released between create and stat — retry create
        }
      }
    }
    held.get += scope
    try body
    finally {
      held.get -= scope
      // delete only OUR lease: a broken-then-reacquired lease (we stalled
      // past ttl and another writer took over) must not be stolen back
      try if (readHolder(fs, path) == holder) fs.delete(path, false)
      catch { case _: Throwable => () }
    }
  }
}

/** JVM-local striped lock keyed by table name — serializes the doc→cells
  * index's append path against its metadata swap WITHIN one driver JVM
  * (the deployment shape: a pipeline's ingest loop, edits channel, and
  * maintenance cadence all run on one Spark driver, whichever cloned
  * session each executes in). [[DocLifecycle.appendDocCells]] holds it
  * across the pairs append, [[IvfCatalog.appendChunks]] widens it across
  * pairs + rows (so the swap can never observe pairs whose rows are still
  * in flight), and [[DocLifecycle.compactDocCells]] holds it across the
  * late-pair merge + DROP/RENAME swap. Cross-JVM writers are outside its
  * reach — that is what [[MaintenanceLease]] and the deployment contract
  * cover. Reentrant (object monitor). */
object MaintenanceLock {
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  def apply[A](key: String)(body: => A): A =
    locks.computeIfAbsent(key, _ => new Object).synchronized(body)
}
