package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TrainingSpec extends SparkSpec {
  import spark.implicits._

  test("packSequences: spans are contiguous, exhaustive, and partition-count-independent") {
    // 1000 docs with varying token counts; L=100
    val docs = (1L to 1000L).map(i => (i, (i % 37) + 1)).toDF("id", "n")
    val packed = Training.packSequences(docs, "id", "n", seqLen = 100L)
      .orderBy("id").collect()
    // offsets reconstruct the exact global cumsum: doc i starts where
    // doc i-1 ended
    var cum = 0L
    packed.foreach { r =>
      val (n, s0, s1, off) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(s0 == cum / 100 && off == cum % 100, s"doc ${r.getLong(0)}")
      assert(s1 == (cum + n - 1) / 100)
      cum += n
    }
    // the distributed prefix sum must not depend on the partition
    // layout of the input
    val repart = Training.packSequences(docs.repartition(7), "id", "n", 100L)
      .orderBy("id").collect()
    assert(packed.map(_.toSeq).toSeq == repart.map(_.toSeq).toSeq)
  }

  test("packSequences: zero-token docs occupy no space and are dropped") {
    val docs = Seq((1L, 5L), (2L, 0L), (3L, 7L)).toDF("id", "n")
    val out = Training.packSequences(docs, "id", "n", 10L).orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L))
    // doc 3 starts at offset 5: the empty doc contributed nothing
    assert(out(1).getLong(4) == 5L)
  }

  test("packSequences: duplicate order keys are rejected, not silently overlapped") {
    // the cumsum window's RANGE frame sums PEERS together — two docs
    // sharing an order key would claim overlapping spans. The guard
    // rides the cumsum window (no extra job), so it fires at first
    // action, wrapped in Spark's execution exception.
    val docs = Seq((1L, 5L), (1L, 7L), (2L, 3L)).toDF("id", "n")
    val ex = intercept[Exception](
      Training.packSequences(docs, "id", "n", 10L).collect())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("must be unique")), ex.toString)
  }

  test("tokenBudget: null ids neither surface nor charge the budget") {
    val docs = Seq((Some(1L), 5L), (None, 400L), (Some(2L), 6L), (Some(3L), 7L))
      .toDF("doc_id", "n")
    // budget covers all three real docs ONLY if the null row's 400
    // tokens don't offset the prefix sum
    val kept = Training.tokenBudget(docs, "doc_id", "n", budget = 18L)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L), kept.toString)
  }

  test("mixtureSample: per-source keep counts track the requested rates, deterministically") {
    val docs = (1L to 4000L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "source")
    val w = when(col("source") === "a", lit(0.75)).otherwise(lit(0.25))
    val kept = Training.mixtureSample(docs, "source", "doc_id", w, targetFrac = 0.5)
    val counts = kept.groupBy("source").count().as[(String, Long)].collect().toMap
    // rate_a = 0.75*2000/2000 = 0.75, rate_b = 0.25*2000/2000 = 0.25
    assert(math.abs(counts("a") - 1500L) < 150, counts.toString)
    assert(math.abs(counts("b") - 500L) < 100, counts.toString)
    // md5-keyed: the same draw twice
    val again = Training.mixtureSample(docs, "source", "doc_id", w, 0.5)
    assert(kept.orderBy("doc_id").collect().toSeq ==
      again.orderBy("doc_id").collect().toSeq)
  }

  test("mixtureSample: rate caps at 1.0 (a source below its target keeps everything but 1/2^20)") {
    val docs = ((1L to 100L).map(i => (i, "rare")) ++
      (101L to 2000L).map(i => (i, "common"))).toDF("doc_id", "source")
    val w = when(col("source") === "rare", lit(0.9)).otherwise(lit(0.1))
    // rare target = 0.9 * 1000 = 900 >> 100 present -> rate 1.0
    val kept = Training.mixtureSample(docs, "source", "doc_id", w, 0.5)
      .filter(col("source") === "rare").count()
    assert(kept == 100L, s"rare kept $kept")
  }

  test("mixtureSample: a weight that varies WITHIN a source fails loudly, not silently") {
    val docs = (1L to 100L).map(i => (i, "a")).toDF("doc_id", "source")
    // weight depends on the row, not the source — violates the
    // documented contract; first() would silently pick one row's value
    val badW = when(col("doc_id") % 2 === 0, lit(0.9)).otherwise(lit(0.1))
    val ex = intercept[Exception] {
      Training.mixtureSample(docs, "source", "doc_id", badW, 0.5).count()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + "|" + messages(t.getCause)
    assert(messages(ex).contains("not constant within source"), messages(ex))
  }

  test("mixtureSample: a NULL weight fails with a NULL message, not 'not constant'") {
    val docs = (1L to 100L).map(i => (i, "a")).toDF("doc_id", "source")
    // a lookup `when` with no branch for this source yields NULL for
    // every row; min === max is NULL === NULL which must not be read
    // as "varies" — the real problem is the missing weight
    val nullW = when(col("source") === "other", lit(0.9))
    val ex = intercept[Exception] {
      Training.mixtureSample(docs, "source", "doc_id", nullW, 0.5).count()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + "|" + messages(t.getCause)
    assert(messages(ex).contains("weightExpr is NULL for source"), messages(ex))
  }

  test("assignSplit: fractions track, assignments are growth-stable and engine-deterministic") {
    val docs = (1L to 4000L).toDF("doc_id")
    val split = Training.assignSplit(docs, "doc_id", 0.1, 0.1)
    val counts = split.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(math.abs(counts("val") - 400L) < 80, counts.toString)
    assert(math.abs(counts("test") - 400L) < 80, counts.toString)
    assert(counts("train") > 3000L, counts.toString)
    // growth stability: the first 1000 docs' splits are unchanged when
    // 3000 more arrive — md5 is per-doc, not corpus-relative
    val small = Training.assignSplit((1L to 1000L).toDF("doc_id"), "doc_id", 0.1, 0.1)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val big = split.filter(col("doc_id") <= 1000)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(small == big)
    // fraction 1.0 clamps to 'fffff' (the mixtureSample cap) instead
    // of formatting the 6-char '100000', which would compare BELOW
    // most hex prefixes and silently misroute nearly all docs to train
    val extreme = Training.assignSplit(docs, "doc_id", 0.5, 0.5)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(extreme.getOrElse("train", 0L) <= 4L, extreme.toString)
    assert(math.abs(extreme("val") - 2000L) < 150, extreme.toString)
    assert(math.abs(extreme("test") - 2000L) < 150, extreme.toString)
  }

  test("tokenBudget: whole docs in md5 order up to the budget, partition-independent") {
    val docs = (1L to 500L).map(i => (i, (i % 13) + 1)).toDF("doc_id", "n")
    val kept = Training.tokenBudget(docs, "doc_id", "n", budget = 700L)
      .select("doc_id").as[Long].collect().toSet
    // reference: single-window cumulative sum in (md5, id) order
    import org.apache.spark.sql.expressions.Window
    val ref = docs.withColumn("_c", sum(col("n")).over(
        Window.orderBy(md5(col("doc_id").cast("string")), col("doc_id"))))
      .filter(col("_c") <= 700L)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == ref, s"missing=${ref -- kept} extra=${kept -- ref}")
    // the kept token mass stays within budget and the next doc in hash
    // order would cross it
    val total = docs.filter(col("doc_id").isin(kept.toSeq: _*))
      .agg(sum("n")).as[Long].head()
    assert(total <= 700L && total > 700L - 14L, total.toString)
    val repart = Training.tokenBudget(docs.repartition(17), "doc_id", "n", 700L)
      .select("doc_id").as[Long].collect().toSet
    assert(repart == kept)
  }

  test("shardAssign: every doc lands in one shard, positions are dense ranks, order is reproducible") {
    val docs = (1L to 1000L).toDF("doc_id")
    val a = Training.shardAssign(docs, "doc_id").orderBy("doc_id").collect()
    assert(a.length == 1000)
    assert(a.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 16))
    // positions within each shard are 1..n_shard with no gaps
    val byShard = a.groupBy(_.getLong(1)).values
    byShard.foreach { rows =>
      assert(rows.map(_.getLong(2)).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // all 16 shards hit and roughly balanced on 1000 ids
    assert(byShard.size == 16)
    assert(byShard.map(_.length).max < 130)
    val b = Training.shardAssign(docs, "doc_id").orderBy("doc_id").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("temperatureSample: exact integer quotas, md5-first selection, small-source cap") {
    // heavy skew: alpha=0.5 flattens A's dominance; C is boosted past
    // its size and must cap at n_C
    val docs = ((1L to 10000L).map(i => (i, "A")) ++
      (10001L to 10100L).map(i => (i, "B")) ++
      (10101L to 10104L).map(i => (i, "C"))).toDF("doc_id", "source")
    val out = Training.temperatureSample(docs, "source", "doc_id",
      targetNum = 1L, targetDen = 2L)
    val kept = out.select("doc_id", "source").as[(Long, String)].collect()
    val bySrc = kept.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    // driver math: T=5052, R=(1e8, 1e7, 2e6), S=1.12e8
    // k_A = 5052*100/112 = 4510; B and C are boosted past their size
    // (451 and 90) and cap at n_s — kept whole
    assert(bySrc("A").size == 4510, bySrc("A").size.toString)
    assert(bySrc("B").size == 100)
    assert(bySrc("C").size == 4)
    // selection is the md5-first prefix of each source, not arbitrary
    def md5First(ids: Seq[Long], k: Int): Set[Long] = {
      val d = java.security.MessageDigest.getInstance("MD5")
      ids.sortBy { i =>
        d.reset()
        d.digest(i.toString.getBytes).map("%02x".format(_)).mkString
      }.take(k).toSet
    }
    assert(bySrc("A") == md5First(1L to 10000L, 4510))
    // partition layout must not change the answer
    val repart = Training.temperatureSample(docs.repartition(13), "source",
      "doc_id", 1L, 2L).select("doc_id").as[Long].collect().toSet
    assert(repart == kept.map(_._1).toSet)
  }

  test("temperatureSample: alpha=1 recovers proportional sampling; bad params rejected") {
    val docs = ((1L to 900L).map(i => (i, "big")) ++
      (901L to 1000L).map(i => (i, "small"))).toDF("doc_id", "source")
    // alpha=1: shares stay proportional — each source halves
    val out = Training.temperatureSample(docs, "source", "doc_id",
        1L, 2L, alpha = 1.0)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(out("big") == 450 && out("small") == 50, out.toString)
    intercept[IllegalArgumentException] {
      Training.temperatureSample(docs, "source", "doc_id", 3L, 2L)
    }
    intercept[IllegalArgumentException] {
      Training.temperatureSample(docs, "source", "doc_id", 1L, 2L, alpha = 0.0)
    }
  }

  test("curriculumStages: distinct scores split evenly, best score = stage 1") {
    // 12 docs, scores 12..1 — 4 stages of 3
    val docs = (1L to 12L).map(i => (i, 13.0 - i)).toDF("doc_id", "s")
    val out = Training.curriculumStages(docs, "doc_id", col("s"), nStages = 4)
      .as[(Long, Double, Long)].collect().sortBy(_._1)
    assert(out.map(_._3).toSeq == Seq(1L, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4, 4))
    assert(out.head._1 == 1L && out.head._3 == 1L) // doc 1 has the top score
  }

  test("curriculumStages: value ties share a stage (never split by rank)") {
    // 6 docs of one score, 2 of a worse one, nStages=4: the big tie
    // group lands entirely in stage 1, the tail in stage 4
    val docs = ((1L to 6L).map(i => (i, 0.9)) ++
      (7L to 8L).map(i => (i, 0.1))).toDF("doc_id", "s")
    val out = Training.curriculumStages(docs, "doc_id", col("s"), nStages = 4)
      .as[(Long, Double, Long)].collect()
    assert(out.filter(_._2 == 0.9).map(_._3).toSet == Set(1L))
    assert(out.filter(_._2 == 0.1).map(_._3).toSet == Set(4L)) // 6*4/8+1
  }

  test("curriculumStages: stage is monotone in score and covers 1..n on spread data") {
    val docs = (1L to 100L).map(i => (i, (i % 37).toDouble)).toDF("doc_id", "s")
    val out = Training.curriculumStages(docs, "doc_id", col("s"), nStages = 5)
      .as[(Long, Double, Long)].collect()
    assert(out.map(_._3).toSet == Set(1L, 2, 3, 4, 5))
    // higher score never lands in a later-numbered (worse) stage
    val byStage = out.groupBy(_._3).view.mapValues(v => (v.map(_._2).min, v.map(_._2).max))
    for (s <- 1L to 4L)
      assert(byStage(s)._1 >= byStage(s + 1)._2,
        s"stage $s scores ${byStage(s)} overlap stage ${s + 1} ${byStage(s + 1)}")
  }
  test("chunkWindows: offsets, overlap, short tail, empty-doc drop") {
    val docs = Seq(
      (1L, "a b c d e f g h"),   // 8 toks: starts 0,3,6 at stride 3
      (2L, "x y"),               // shorter than maxLen: one chunk
      (3L, "   ")).toDF("doc_id", "text")
    val out = Training.chunkWindows(docs, "doc_id", "text",
        maxLen = 4, stride = 3)
      .as[(Long, Long, String, Long)].collect().sortBy(r => (r._1, r._2))
    assert(out.map(_._1).toSet == Set(1L, 2L))
    val d1 = out.filter(_._1 == 1L)
    assert(d1.map(r => (r._2, r._3, r._4)).toSeq == Seq(
      (0L, "a b c d", 4L), (1L, "d e f g", 4L), (2L, "g h", 2L)))
    assert(out.filter(_._1 == 2L).map(r => (r._2, r._3, r._4)).toSeq ==
      Seq((0L, "x y", 2L)))
  }

  test("chunkWindows: stride == maxLen tiles without overlap and covers every token") {
    val docs = Seq((1L, (1 to 10).map("t" + _).mkString(" "))).toDF("doc_id", "text")
    val out = Training.chunkWindows(docs, "doc_id", "text", maxLen = 4, stride = 4)
      .as[(Long, Long, String, Long)].collect().sortBy(_._2)
    assert(out.map(_._4).sum == 10L)
    assert(out.flatMap(_._3.split(" ")).toSeq == (1 to 10).map("t" + _))
  }

  test("chunkWindows: zero shuffles (row-local explode)") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val p = Training.chunkWindows(docs, "doc_id", "text", 4, 2)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert(!p.contains("Exchange"), p)
  }
}

