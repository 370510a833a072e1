package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** The crawl-intake report as ONE transform over the WARC record
  * frame, shared VERBATIM by the batch query (`r44_crawl_intake`)
  * and the dir-watch streaming form over `Warc.stream` — batch and
  * tail cannot drift (the Jsonl.follow precedent; the reference's
  * soul is tailing — squeryer.go:370-430 runs the same pipeline per
  * window that a one-shot query runs once).
  *
  * Input: `Warc.read`/`Warc.stream`'s record schema with HTTP-framed
  * payloads (`application/http; msgtype=response`). Chain: host off
  * the WARC-Target-URI → explicit payload decode → httpBody framing
  * split (r45) → htmlToText (t50) → per-host n_pages / n_tokens /
  * n_chars. A pure groupBy-agg, so the streaming form runs it in
  * complete output mode with map-side partial aggregation — state is
  * |hosts| rows, not |records|.
  */
object CrawlIntake {
  def report(records: DataFrame): DataFrame =
    records
      .withColumn("_host",
        regexp_extract(col("target_uri"), "^http://([^/]+)/", 1))
      .withColumn("_t", TextFunctions.htmlToText(
        TextFunctions.httpBody(decode(col("content"), "UTF-8"))))
      .groupBy(col("_host").as("host"))
      .agg(count(lit(1)).as("n_pages"),
        sum(size(filter(split(col("_t"), " "), t => length(t) > 0))
          .cast("long")).as("n_tokens"),
        sum(length(col("_t")).cast("long")).as("n_chars"))
}
