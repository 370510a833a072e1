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

  /** Page records → WET `conversion` records (uri, date, id, payload
    * = the extracted text): the transform both the batch r48 fixture
    * and the streaming sink run, so export and tail cannot drift. */
  def wetRecords(records: DataFrame): DataFrame =
    records.select(col("target_uri"),
      lit("2024-01-02T00:00:00Z").as("wd"),
      concat(lit("<urn:graft:wet:"),
        regexp_extract(col("target_uri"), "/doc/([0-9]+)$", 1),
        lit(">")).as("rid"),
      encode(TextFunctions.htmlToText(
        TextFunctions.httpBody(decode(col("content"), "UTF-8"))),
        "UTF-8").as("payload"))

  /** Dir-watch WET EXPORT (r18 — the tail workflow for the OUTPUT
    * side): archives landing in a crawl dir stream through the
    * extraction and each micro-batch commits its own
    * `batch-<id>-<pid>.warc.gz` conversion shards via the
    * executor-side writer. Batch-id-prefixed names make a replayed
    * batch (restart recovery) rewrite ITS OWN shards idempotently
    * instead of clobbering a neighbor's — at-least-once delivery
    * converges to exactly the batch contents per shard name.
    */
  def wetSink(records: DataFrame, outDir: String,
              checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    wetRecords(records).writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sources.Warc.write(batch, outDir,
          "target_uri", "wd", "rid", "payload",
          contentType = "text/plain", warcType = "conversion",
          filePrefix = f"batch-$id%05d")
      }
      .start()
}
