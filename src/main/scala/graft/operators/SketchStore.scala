package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{CountMinAgg, KmvAgg}

/** Mergeable sketch STORE — incremental corpus statistics for the
  * append workflow at 100 TB: each ingest run aggregates its own
  * batch into tiny mergeable summaries (KMV bottom-k for distincts,
  * Count-Min grids for frequencies), persists them (~KB per source),
  * and a later run folds stores together with pure column arithmetic.
  * The merged estimates are IDENTICAL to a one-shot pass over the
  * union — KMV because bottom-k of a union equals bottom-k of the
  * runs' bottom-k's, CMS because counter update is element-wise
  * addition — so corpus-wide stats never re-scan history. The d25
  * signature store is this pattern for dedup; this is the stats side
  * (q30's KMV distinct, t20's CMS frequency). The d26 oracle computes
  * the ONE-SHOT whole-corpus sketch, so its hash match IS the
  * driver-verified mergeability proof.
  *
  * Both merges are row-local Column ops over |sources|-sized store
  * frames — no corpus access, no shuffle beyond the store join.
  */
object SketchStore {

  /** Merge two KMV bottom-k sketches: the bottom-k of the union.
    * Sketches are ascending distinct arrays (the [[KmvAgg]] eval
    * layout); the merge re-sorts the distinct union and keeps k. */
  def kmvMerge(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_distinct(concat(a, b))), 1, k)

  /** Merge two Count-Min grids of identical (depth, width): counters
    * fold by element-wise addition. */
  def cmsMerge(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x + y)

  /** One run's KMV store: the per-source bottom-k sketch of `item`
    * (pass portable md5 hashes so stores merge across engines and
    * runs). Output: (source, kmv). */
  def kmvStore(df: DataFrame, sourceCol: String, item: Column,
               k: Int): DataFrame =
    df.groupBy(col(sourceCol)).agg(KmvAgg.sketch(item, k).as("kmv"))

  /** Fold a second run's store into a first: full-outer by source — a
    * source seen by only one run keeps that run's sketch unchanged
    * (the empty-array identity). */
  def kmvStoreMerge(a: DataFrame, b: DataFrame, sourceCol: String,
                    k: Int): DataFrame = {
    val empty = array().cast("array<string>")
    a.withColumnRenamed("kmv", "_ka")
      .join(b.withColumnRenamed("kmv", "_kb"), Seq(sourceCol), "full_outer")
      .select(col(sourceCol),
        kmvMerge(coalesce(col("_ka"), empty), coalesce(col("_kb"), empty), k)
          .as("kmv"))
  }

  /** STREAMING twin of [[kmvStore]]: the same per-source KMV
    * aggregate over an unbounded stream in Complete mode — the
    * TypedImperativeAggregate's bottom-k state lives in the streaming
    * state store between micro-batches (serialize/merge/deserialize
    * is the SAME merge path the batch partial-aggregation uses), so
    * after any batch the emitted store equals [[kmvStore]] over
    * everything ingested so far, bit for bit (parity spec-pinned).
    * ~k strings of state per source at any stream length. */
  def kmvStoreStream(stream: DataFrame, sourceCol: String, item: Column,
                     k: Int): DataFrame =
    stream.groupBy(col(sourceCol)).agg(KmvAgg.sketch(item, k).as("kmv"))

  /** STREAMING twin of [[cmsStore]]: the d×w grid as Complete-mode
    * streaming state — 32 KB per source at any stream length, grid
    * equal to the batch build over everything ingested (spec). */
  def cmsStoreStream(stream: DataFrame, sourceCol: String, item: Column,
                     weight: Column, width: Int, depth: Int): DataFrame =
    stream.groupBy(col(sourceCol))
      .agg(CountMinAgg.sketchWeighted(item, weight, width, depth).as("cms"))

  /** One run's CMS store: the per-source d×w grid over the (item,
    * count) histogram (the t20 weighted-update shape). Output:
    * (source, cms). */
  def cmsStore(df: DataFrame, sourceCol: String, item: Column,
               weight: Column, width: Int, depth: Int): DataFrame =
    df.groupBy(col(sourceCol))
      .agg(CountMinAgg.sketchWeighted(item, weight, width, depth).as("cms"))

  /** Fold a second run's CMS store into a first (full-outer by
    * source; absent side contributes the zero grid). */
  def cmsStoreMerge(a: DataFrame, b: DataFrame, sourceCol: String,
                    width: Int, depth: Int): DataFrame = {
    val zero = array_repeat(lit(0L), width * depth)
    a.withColumnRenamed("cms", "_ca")
      .join(b.withColumnRenamed("cms", "_cb"), Seq(sourceCol), "full_outer")
      .select(col(sourceCol),
        cmsMerge(coalesce(col("_ca"), zero), coalesce(col("_cb"), zero))
          .as("cms"))
  }
}
