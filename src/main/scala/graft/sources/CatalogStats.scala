package graft.sources

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession

/** Statistics-backed catalog registration — the cluster-grade answer
  * to size-based broadcast guesswork (the q03 transition note in
  * SURVEY §4).
  *
  * Path-based parquet reads estimate a relation at its on-disk
  * (compressed) byte size and propagate that estimate through
  * filters UNCHANGED, so a selective dimension filter still looks
  * "too big to broadcast" and the planner falls back to a shuffled
  * join; AQE can only repair that at runtime, after the shuffle is
  * already wired into the stage graph. Registering the tables in the
  * session catalog and running `ANALYZE TABLE ... COMPUTE STATISTICS
  * FOR ALL COLUMNS` gives the optimizer row counts, NDVs, and
  * min/max per column; with `spark.sql.cbo.enabled` the filter's
  * output estimate shrinks by its real selectivity and the broadcast
  * decision is made from ROW COUNTS at PLAN time — before any
  * shuffle exists to un-wire. Join reordering
  * (`spark.sql.cbo.joinReorder.enabled`) rides the same stats.
  *
  * Registration is idempotent per (session, dir, TABLE): a caller
  * that registers a subset (e.g. a spec touching only
  * customer+orders) never blocks a later caller from registering the
  * rest, and repeated bench runs still pay ANALYZE once per table.
  * Table names are DIR-SCOPED (`graft_<dirhash>_<name>` pointing at
  * `<dir>/<name>.parquet`), so registering a second data directory in
  * the same session cannot silently repoint the first directory's
  * names at different data; nothing is copied.
  */
object CatalogStats {
  val tables: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  private val done = TrieMap.empty[(Int, String, String), Boolean]

  private def dirTag(dir: String): String = {
    // stable, short, catalog-safe tag for the directory; identical
    // dirs (same string) share tables, distinct dirs never collide
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8"))
    h.take(4).map(b => f"${b & 0xff}%02x").mkString
  }

  /** Qualified name of a table registered for `dir`. */
  def name(dir: String, table: String): String =
    s"graft_${dirTag(dir)}_$table"

  /** Register + ANALYZE every table under `dir` (once per
    * session/dir/table). */
  def register(spark: SparkSession, dir: String,
               which: Seq[String] = tables): Unit = {
    val sid = System.identityHashCode(spark)
    val todo = which.filterNot(t => done.contains((sid, dir, t)))
    if (todo.nonEmpty) synchronized {
      which.foreach { t =>
        val key = (sid, dir, t)
        if (!done.contains(key)) {
          val n = name(dir, t)
          spark.sql(s"DROP TABLE IF EXISTS $n")
          spark.sql(
            s"CREATE TABLE $n USING parquet LOCATION '$dir/$t.parquet'")
          spark.sql(s"ANALYZE TABLE $n COMPUTE STATISTICS")
          spark.sql(s"ANALYZE TABLE $n COMPUTE STATISTICS FOR ALL COLUMNS")
          done.put(key, true)
          ()
        }
      }
    }
  }

  /** Enable the cost-based optimizer paths that consume the stats.
    * Session-scoped, cheap to call repeatedly. */
  def enableCbo(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
  }
}
