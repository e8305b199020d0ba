package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Build-once session-catalog tables (shared by ChunkCatalog / IvfCatalog):
  * materialize a derived table on first use, read it from the warehouse on
  * every later use. A fresh JVM rebuilds from source — results always derive
  * from current code, never a stale file.
  */
object TableStore {

  def tableName(kind: String, dir: String): String =
    s"graft_${kind}_" + dir.replaceAll("[^a-zA-Z0-9]", "_").toLowerCase(java.util.Locale.ROOT)

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
      }
      spark.table(name)
    }
}
