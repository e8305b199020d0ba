package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Build-once session-catalog tables (shared by ChunkCatalog / IvfCatalog):
  * materialize a derived table on first use, read it from the warehouse on
  * every later use. A fresh JVM rebuilds from source — results always derive
  * from current code, never a stale file.
  *
  * Visibility contract: Spark caches a catalog table's resolved relation
  * (including its file listing) PER SESSION, so rows appended by another
  * session — a streaming `foreachBatch` runs in a CLONE of the session that
  * started the query — are invisible to a reader that cached the relation
  * earlier. [[getOrBuild]] therefore `refreshTable`s an already-existing
  * table before returning it: every read through the store observes all
  * appends, whichever session wrote them. The cost is re-resolving the
  * relation per read — file listing stays lazy and partition-pruned, so a
  * probe still lists only the partitions it scans.
  */
object TableStore {

  def tableName(kind: String, dir: String): String =
    s"graft_${kind}_" + dir.replaceAll("[^a-zA-Z0-9]", "_").toLowerCase(java.util.Locale.ROOT)

  /** The read-side half of [[Compaction]]'s concurrency contract: a reader
    * whose session resolved a store's file listing BEFORE a compaction pass
    * and scans after it fails loudly (`FileNotFoundException` on a
    * rewritten file) — never silently wrong. This wrapper packages the
    * documented recovery: refresh the named tables' cached relations and
    * run the action once more. Use around long-running reads that may
    * overlap a maintenance pass; reads that resolve through [[getOrBuild]]
    * immediately before scanning only need it if a pass can commit
    * mid-scan. */
  def retryingStale[A](spark: SparkSession, names: String*)(action: => A): A =
    try action catch {
      case e: Throwable if isStaleListing(e) =>
        names.foreach(spark.catalog.refreshTable)
        action
    }

  private[graft] def isStaleListing(e: Throwable): Boolean = {
    var t: Throwable = e
    while (t != null) {
      if (t.isInstanceOf[java.io.FileNotFoundException]) return true
      t = if (t.getCause eq t) null else t.getCause
    }
    false
  }

  /** Heartbeat marker for a LIVE rebuild's staging (nonce = the rebuild's
    * staged-name suffix): [[Reindex.rebuildChunkIndex]] touches it at every
    * phase boundary and reconcile round, and [[sweepOrphans]] skips
    * `__rstage` entries whose nonce heartbeat is younger than the horizon —
    * a base assignment pass outliving the sweep horizon (plausible at the
    * 100 TB corpus scale the rebuild targets) must not lose its write-once
    * staged centroid table to a cadence sweep. The marker itself is
    * orphan-shaped and ages out with its rebuild. */
  private[graft] def heartbeatPath(spark: SparkSession, nonce: Long) =
    new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), s"__graft_hb_$nonce")

  private[graft] def touchHeartbeat(spark: SparkSession, nonce: Long): Unit = {
    val p = heartbeatPath(spark, nonce)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(System.currentTimeMillis().toString.getBytes("UTF-8"))
    finally out.close()
  }

  private val StageNonce = "__rstage(\\d+)".r
  private val Marked = "__(rstage|retired|cstage)(\\d+)".r

  /** Sweep crash orphans out of the warehouse directory: a hard JVM kill
    * mid-maintenance leaks the nonce-suffixed spill dirs
    * ([[DocLifecycle]]'s `__upsert_tmp_*`, [[Compaction]]'s
    * `__compact_tmp_*`), staged swap tables (`*__cstage*`, `*__rstage*`),
    * retired-generation tables (`*__retired*` — [[Reindex]]'s
    * rename-aside cutover copies), heartbeat markers (`__graft_hb_*`) and
    * the dead writer's lease file (`__graft_lease_*`)
    * — a live process deletes all of these in its own `finally`/catch
    * paths, so anything old enough to be past `olderThanMs` belongs to a
    * writer that is gone. Age is the NEWEST of the entry's own mtime and
    * its direct children's (an in-flight spill keeps writing files, so an
    * active job's dir always reads young); the default horizon is sized
    * above the longest measured maintenance job (the ×1000 trained build,
    * ~15 min) with a wide margin. Everything else in the warehouse — every
    * live table — is untouched by construction (prefix/suffix match, never
    * a catch-all). A `__compact_tmp`/`__upsert_tmp` orphan younger than a
    * crash-then-restart gap can be a mid-commit rewrite's staged content
    * (the rename-commit's recovery copy) — the horizon is what makes the
    * sweep safe to run on a cadence.
    *
    * Two classes are refused REGARDLESS of age — deleting them could
    * destroy the only surviving copy of an index:
    *  - every staged/retired table (`__rstage`/`__retired`/`__cstage`) of
    *    a nonce GROUP in which ANY member's natural sibling is absent:
    *    that is the signature of a crash between a cutover's renames,
    *    where the marked tables ARE the recovery copies. The protection is
    *    group-wide, not per-entry, because a partial swap leaves some
    *    members' naturals present (already holding new-generation data)
    *    while [[Reindex.healInterruptedSwap]] still needs THEIR retired
    *    copies to restore a consistent old generation. Healing (or
    *    completing the rename) makes every natural reappear, after which
    *    the leftovers age out normally.
    *  - an `__rstage` entry whose rebuild nonce has a YOUNG heartbeat
    *    ([[touchHeartbeat]]): the rebuild is alive, however long its base
    *    pass has been running.
    * Returns the removed entry names. Run at startup and/or on the
    * maintenance cadence (the streaming loops fold it into
    * `compactEvery`). */
  def sweepOrphans(spark: SparkSession,
                   olderThanMs: Long = 6 * 3600 * 1000L): Seq[String] = {
    val wh = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(wh)) return Nil
    val horizon = System.currentTimeMillis() - olderThanMs
    val entries = fs.listStatus(wh).toSeq
    // first pass: nonce groups with any member whose natural name is
    // absent are a crashed swap's recovery copies — refuse the WHOLE group
    def naturalAbsent(n: String): Boolean =
      Seq("__rstage", "__retired", "__cstage").find(n.contains).exists { m =>
        val natural = n.substring(0, n.indexOf(m))
        natural.nonEmpty &&
          !fs.exists(new org.apache.hadoop.fs.Path(wh, natural)) &&
          !spark.catalog.tableExists(natural)
      }
    val brokenNonces = entries.map(_.getPath.getName).flatMap { n =>
      Marked.findFirstMatchIn(n).filter(_ => naturalAbsent(n)).map(_.group(2))
    }.toSet
    val removed = Seq.newBuilder[String]
    entries.foreach { st =>
      val n = st.getPath.getName
      val orphanShaped =
        n.startsWith("__upsert_tmp_") || n.startsWith("__compact_tmp_") ||
          n.contains("__cstage") || n.contains("__rstage") ||
          n.contains("__retired") ||
          n.startsWith("__graft_lease_") || n.startsWith("__graft_hb_")
      if (orphanShaped) {
        val age =
          if (!st.isDirectory) st.getModificationTime
          else (st.getModificationTime +:
            fs.listStatus(st.getPath).toSeq.map(_.getModificationTime)).max
        val recoveryCopy = Marked.findFirstMatchIn(n)
          .exists(mt => brokenNonces.contains(mt.group(2)))
        val hbYoung = StageNonce.findFirstMatchIn(n).exists { mt =>
          val hb = heartbeatPath(spark, mt.group(1).toLong)
          fs.exists(hb) && fs.getFileStatus(hb).getModificationTime >= horizon
        }
        if (age < horizon && !recoveryCopy && !hbYoung) {
          // a staging table may still be registered under a persistent
          // metastore — drop the catalog entry with its files
          if ((n.contains("__cstage") || n.contains("__rstage") ||
               n.contains("__retired")) && spark.catalog.tableExists(n))
            spark.sql(s"DROP TABLE IF EXISTS `$n`")
          if (fs.exists(st.getPath)) fs.delete(st.getPath, true)
          removed += n
        }
      }
    }
    removed.result()
  }

  /** Get `name` from the session catalog, running `write` (which must
    * saveAsTable(name)) on first use. Clears a stale warehouse location left
    * behind by a previous JVM (the in-memory catalog forgets tables across
    * JVMs but their files survive). */
  def getOrBuild(spark: SparkSession, name: String)(write: => Unit): DataFrame =
    synchronized {
      if (!spark.catalog.tableExists(name)) {
        val loc = new org.apache.hadoop.fs.Path(
          spark.conf.get("spark.sql.warehouse.dir"), name.toLowerCase(java.util.Locale.ROOT))
        val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(loc)) fs.delete(loc, true)
        write
      } else {
        // drop this session's cached relation/file listing — another session
        // (e.g. a streaming clone's appendBatch) may have appended since
        spark.catalog.refreshTable(name)
      }
      spark.table(name)
    }
}
