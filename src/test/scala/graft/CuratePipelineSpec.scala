package graft

/** The composed-product gate (round-11 item #1): CurateApp's
  * annotate→gate→scrub→dedup→decontaminate→sample→write chain, run
  * end-to-end with the resource meter on, must not shuffle more than
  * its operators own. The composition's glue is narrow (filters,
  * column pruning, broadcast scrub/decontaminate sides); every wide
  * op belongs to a named stage:
  *
  *   boilerplate strip (line freq + reassembly)            2 shuffles
  *   paragraph dedup (para hash min-claim + reassembly)    ~3
  *   unigram-LM floor (vocab agg + doc mean)               ~3
  *   dup-substring ceiling (k-gram freq + span merge)      ~4
  *   exact dedup (text-hash groupBy + seal)                ~3
  *   MinHash LSH (band self-join + verify + components)    ~6
  *   decontaminate (shingle join + seal)                   ~3
  *   quota (per-source window)                             ~2
  *   write (partitionBy exchange)                          ~1
  *   sketch store (token explode + per-source KMV agg)     ~1
  *
  * Separate ACTIONS (the sealOver barriers inside exact/LSH/
  * decontaminate, plus the final write) re-plan their DataFrames
  * into fresh RDDs, so an upstream shuffle consumed by two actions
  * would execute twice. CurateApp persists `scored` precisely to cap
  * that: the two reassembly shuffles above it run ONCE, and the
  * composed total measures 35 executed shuffle stages at sf0.001,
  * counts off — down from 45 before the persist (33) plus the
  * stage-9 signature-store write (+2: the sig aggregate over the
  * persisted capped frame) plus the stage-10 sketch store (+1: one
  * per-source KMV aggregate). The pinned bound (39) leaves AQE
  * jitter room only. Glue regressions
  * that re-shuffle the corpus — a lost broadcast, a join that
  * stopped pruning, a DROPPED persist that silently returns every
  * consumer to recompute-with-exchange — show up as +2 or more.
  * WITHIN one action, reused exchanges surface as skipped stages and
  * add nothing, so sharing a shuffle across consumers in the same
  * job keeps the count down — the design being protected.
  */
class CuratePipelineSpec extends SparkSpec {

  test("composed pipeline runs one pass with only its operators' shuffles") {
    val out = java.nio.file.Files.createTempDirectory("graft-curate").toFile
    val meter = Metrics.start(spark.sparkContext)
    CurateApp.run(spark, "/root/testdata/sf0.001", out.getAbsolutePath,
      benchMod = 97, doCounts = false)
    val m = meter.stop()
    info(s"shuffle stages=${m.shuffleStages} " +
      s"write=${m.shuffleWriteBytes / 1024}KiB " +
      s"peakTask=${m.maxTaskPeakExecMem / 1024}KiB")
    val curated = spark.read.parquet(out.getAbsolutePath)
    assert(curated.count() > 0, "pipeline produced an empty corpus")
    assert(curated.columns.contains("lang_pred"), "missing partition column")
    // the corpus-append handoff: a text-free signature store covering
    // every curated doc, ready for the next batch's sigStoreDedup
    val sigs = spark.read.parquet(out.getAbsolutePath + "_sigstore")
    assert(sigs.columns.sorted.toSeq == Seq("i", "id", "sig"))
    assert(sigs.select("id").distinct().count() == curated.count(),
      "signature store must cover exactly the curated corpus")
    assert(m.shuffleStages > 0, "meter saw no stages — not attached?")
    assert(m.shuffleStages <= 39,
      s"composed pipeline now executes ${m.shuffleStages} shuffle stages " +
        "— the composition grew a corpus shuffle beyond its operators' own")
    // stage 10: the stats handoff — a per-source KMV store covering
    // exactly the curated corpus's sources, mergeable into the next
    // run's store without touching this corpus again
    val sket = spark.read.parquet(out.getAbsolutePath + "_sketchstore")
    assert(sket.columns.sorted.toSeq == Seq("kmv", "source"))
    val curSources = curated.select("source").distinct().count()
    assert(sket.count() == curSources,
      s"sketch store has ${sket.count()} sources, corpus has $curSources")

    // the append workflow, end to end: a re-sent batch of the curated
    // docs (new ids, same text) must be caught — every doc, at 8/8
    // components — by dedup against the store THIS run just wrote,
    // with the curated text nowhere in the incoming-side plan
    val resent = curated.select(
      (org.apache.spark.sql.functions.col("doc_id") + 1000000L).as("doc_id"),
      org.apache.spark.sql.functions.col("text"))
    val caught = graft.operators.Dedup.sigStoreDedup(
        spark.read.parquet(out.getAbsolutePath + "_sigstore"), resent,
        "doc_id", "text", minMatches = 8)
      .select("doc_id").distinct().count()
    assert(caught == curated.count(),
      s"store caught $caught of ${curated.count()} re-sent docs")
  }
}
