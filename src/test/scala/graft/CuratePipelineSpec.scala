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

    // the TRAINING handoff, end to end: the curated corpus flows
    // through length-bucketed batch assembly AND sequence packing
    // unchanged — every curated doc lands in exactly one batch slot
    // and one packed span, with padding/packing accounting consistent
    val toks = curated.select(
      org.apache.spark.sql.functions.col("doc_id"),
      graft.functions.TextFunctions.tokenCountWs(
        org.apache.spark.sql.functions.col("text")).as("n_toks"))
    val batches = graft.operators.Training.lengthBatches(
      toks, "doc_id", "n_toks", caps = Seq(64L, 256L, 1024L, 4096L),
      batchSize = 8)
    assert(batches.count() == curated.count(),
      "every curated doc gets exactly one batch slot")
    assert(batches.filter(
      org.apache.spark.sql.functions.col("pad_tokens") < 0).count() == 0L)
    val packed = graft.operators.Training.packSequences(
      toks, "doc_id", "n_toks", seqLen = 2048L)
    assert(packed.count() == curated.count(),
      "every curated doc lands in the packed stream")
  }

  test("corpus-append trilogy: run 2 through the stores equals the one-shot build") {
    // d25 sig store → d26 sketch stores → d27 label store, COMPOSED:
    // run 1 builds all three; run 2's batch flows match → fold →
    // label-merge; every merged artifact must equal the one-shot
    // build over everything ingested — the proof the stores
    // interoperate, not just work in isolation.
    import org.apache.spark.sql.functions._
    import graft.operators.{Dedup, SketchStore}
    val s = spark
    import s.implicits._
    def words(tag: String, n: Int): String =
      (1 to n).map(i => s"${tag}w$i").mkString(" ")
    val base1 = words("a", 40); val base5 = words("c", 40)
    val runA = Seq(
      (1L, "web", base1), (2L, "web", base1.replace("aw7", "edited")),
      (3L, "web", words("t3", 30)), (4L, "wiki", words("t4", 30)),
      (5L, "wiki", base5), (6L, "wiki", base5.replace("cw9", "edited")),
      (7L, "web", words("t7", 30)), (8L, "wiki", words("t8", 30)))
      .toDF("doc_id", "source", "text")
    val n102 = words("n", 40)
    val runB = Seq(
      (101L, "web", base1.replace("aw12", "blah")),   // joins {1,2}
      (102L, "forum", n102),
      (103L, "forum", n102.replace("nw5", "x")),       // new pair {102,103}
      (104L, "wiki", base5.replace("cw20", "zz")),     // joins {5,6}
      (105L, "forum", words("t105", 30)), (106L, "web", words("t106", 30)),
      (3L, "web", words("t3", 30)))                    // re-sent doc
      .toDF("doc_id", "source", "text")

    def toks(df: org.apache.spark.sql.DataFrame) = df
      .select(col("source"), explode(split(lower(col("text")), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
    def tokHist(df: org.apache.spark.sql.DataFrame) =
      toks(df).groupBy("source", "tok").agg(count(lit(1)).as("c"))
    def selfPairs(store: org.apache.spark.sql.DataFrame,
                  docs: org.apache.spark.sql.DataFrame) =
      Dedup.sigStoreDedup(store, docs, "doc_id", "text")
        .filter(col("doc_id") =!= col("matched_id"))
        .select(col("doc_id").as("id1"), col("matched_id").as("id2"))

    // ---- run 1: build the three stores
    val sigA = Dedup.portableSignatureStore(runA, "doc_id", "text").persist()
    val labelsA = Dedup.incrementalComponents(
      Seq.empty[(Long, Long)].toDF("id", "component"),
      runA.select("doc_id"), "doc_id", selfPairs(sigA, runA))
    val kmvA = SketchStore.kmvStore(toks(runA), "source", md5(col("tok")), 64)
    val cmsA = SketchStore.cmsStore(tokHist(runA), "source", col("tok"),
      col("c"), 256, 4)

    // ---- run 2: match (d25) → fold (d26) → label-merge (d27)
    val sigB = Dedup.portableSignatureStore(runB, "doc_id", "text").persist()
    val crossPairs = Dedup.sigStoreDedup(sigA, runB, "doc_id", "text")
      .filter(col("doc_id") =!= col("matched_id"))
      .select(col("doc_id").as("id1"), col("matched_id").as("id2"))
    val newPairs = crossPairs.unionByName(selfPairs(sigB, runB))
    val labels2 = Dedup.incrementalComponents(
      labelsA, runB.select("doc_id"), "doc_id", newPairs)
    val sigStore2 = sigA.unionByName(
      sigB.join(sigA.select("id").distinct(), Seq("id"), "left_anti"))
    val kmv2 = SketchStore.kmvStoreMerge(kmvA,
      SketchStore.kmvStore(toks(runB), "source", md5(col("tok")), 64),
      "source", 64)
    val cms2 = SketchStore.cmsStoreMerge(cmsA,
      SketchStore.cmsStore(tokHist(runB), "source", col("tok"),
        col("c"), 256, 4),
      "source", 256, 4)

    // ---- one-shot builds over everything ingested
    val allBag = runA.unionByName(runB)
    val allDocs = runA.unionByName(
      runB.join(runA.select("doc_id"), Seq("doc_id"), "left_anti"))
    val sigOne = Dedup.portableSignatureStore(allDocs, "doc_id", "text").persist()
    val labelsOne = Dedup.components(allDocs.select("doc_id"), "doc_id",
        selfPairs(sigOne, allDocs))
      .select(col("doc_id").as("id"), col("component"))

    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.toString).toSet
    assert(rows(labels2) == rows(labelsOne), "label store != one-shot CC")
    def hexed(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id"), col("i"), hex(col("sig")))
    assert(rows(hexed(sigStore2)) == rows(hexed(sigOne)),
      "sig store != one-shot signatures")
    assert(rows(kmv2) ==
      rows(SketchStore.kmvStore(toks(allBag), "source", md5(col("tok")), 64)),
      "merged KMV != one-shot KMV")
    assert(rows(cms2) ==
      rows(SketchStore.cmsStore(tokHist(allBag), "source", col("tok"),
        col("c"), 256, 4)),
      "merged CMS != one-shot CMS")

    // the run-2 decisions themselves: new docs joined the right
    // clusters, the re-sent doc kept one label, nothing leaked
    val comp = labels2.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels2.count() == 14 && comp.size == 14, "dup or missing labels")
    assert(comp(101L) == comp(1L) && comp(1L) == comp(2L))
    assert(comp(104L) == comp(5L) && comp(5L) == comp(6L))
    assert(comp(102L) == comp(103L) && comp(102L) != comp(1L))
    assert(Seq(3L, 4L, 7L, 8L, 105L, 106L).forall(i => comp(i) == i))
    sigA.unpersist(); sigB.unpersist(); sigOne.unpersist()
  }
}
