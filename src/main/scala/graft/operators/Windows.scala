package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tumbling/sliding window helpers — the reference's window stage
  * (squeryer.go:178-210) on Spark's built-in `window()` expression.
  *
  * Batch form: rows are assigned to their window(s) map-side (a
  * sliding row is replicated size/slide ways), then the aggregation
  * shuffles once on (window, keys) — the minimal shuffle for the
  * semantics. Streaming form lives in graft.streaming.TailStream with
  * watermarks bounding state.
  */
object Windows {

  /** Assign tumbling windows of `sizeSec` seconds on `ts`. Adds
    * `window_start`/`window_end` as epoch seconds (bigint) so results
    * are engine- and timezone-neutral.
    */
  def tumbling(df: DataFrame, ts: String, sizeSec: Long): DataFrame =
    df.withColumn("_w", window(col(ts), s"$sizeSec seconds"))
      .withColumn("window_start", unix_timestamp(col("_w.start")))
      .withColumn("window_end", unix_timestamp(col("_w.end")))
      .drop("_w")

  /** Assign sliding windows (size, slide). Each row lands in
    * size/slide windows.
    */
  def sliding(df: DataFrame, ts: String, sizeSec: Long, slideSec: Long): DataFrame =
    df.withColumn("_w", window(col(ts), s"$sizeSec seconds", s"$slideSec seconds"))
      .withColumn("window_start", unix_timestamp(col("_w.start")))
      .withColumn("window_end", unix_timestamp(col("_w.end")))
      .drop("_w")

  /** Windowed aggregation in one call: tumbling when slide == size. */
  def aggregate(df: DataFrame, ts: String, sizeSec: Long, slideSec: Long,
                keys: Seq[String], aggs: Seq[Column]): DataFrame = {
    val windowed =
      if (slideSec == sizeSec) tumbling(df, ts, sizeSec)
      else sliding(df, ts, sizeSec, slideSec)
    windowed
      .groupBy((Seq("window_start", "window_end") ++ keys).map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
