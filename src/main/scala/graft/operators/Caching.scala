package graft.operators

import org.apache.spark.sql.DataFrame

/** Persist-scope discipline for operators that cache an intermediate
  * for multi-branch reuse (LSH band tables, shingle tables, signature
  * frames). A bare `persist()` with no matching `unpersist()` leaks
  * the block into the caller's session: Bench/Verify clear the cache
  * between queries, but a long-lived user session would accumulate
  * orphaned cache entries.
  *
  * [[sealOver]] eagerly materializes `result` with `localCheckpoint`
  * — which also CUTS THE LINEAGE, so the returned plan no longer
  * references the persisted intermediates — then unpersists them.
  * The checkpoint blocks are owned by the returned DataFrame and are
  * reclaimed by Spark's ContextCleaner once it is unreferenced;
  * nothing stays behind in the cache with no owner. Results sealed
  * this way are the SMALL end of their operators (verified pair
  * sets, candidate lists), so materializing them eagerly is cheap
  * relative to the self-joins they conclude.
  */
private[graft] object Caching {
  def sealOver(result: DataFrame, cached: DataFrame*): DataFrame =
    try result.localCheckpoint(eager = true)
    finally cached.foreach { df => df.unpersist(); () }
}
