package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Token-budget waterfill (p16): max-min fair allocation across
  * sources in tokens, integer-exact level solve.
  */
class TokenWaterfillSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, Long)*) =
    rows.toDF("doc_id", "source", "n_toks")

  test("budget above the corpus keeps every document") {
    val df = docs((1L, "a", 10L), (2L, "b", 20L), (3L, "a", 5L))
    val kept = Training.tokenWaterfill(df, "doc_id", "source", "n_toks", 1000L)
    assert(kept.count() == 3)
  }

  test("level solve matches the hand waterfill; caps are respected") {
    // totals a=10, b=30, c=60; budget 50 -> after a fits fully,
    // level = (50-10)/2 = 20: b and c each keep <= 20 tokens
    val df = docs(
      (1L, "a", 10L),
      (2L, "b", 12L), (3L, "b", 11L), (4L, "b", 7L),
      (5L, "c", 20L), (6L, "c", 20L), (7L, "c", 20L))
    val kept = Training.tokenWaterfill(df, "doc_id", "source", "n_toks", 50L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySrc = kept.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    assert(bySrc("a") == 10L, s"under-cap source must keep all: $bySrc")
    assert(bySrc.getOrElse("b", 0L) <= 20L && bySrc.getOrElse("c", 0L) <= 20L, s"$bySrc")
    assert(kept.map(_._3).sum <= 50L)
    // docs are atomic: c's 20-token docs fit exactly once under L=20
    assert(bySrc("c") == 20L, s"$bySrc")
  }

  test("a doc larger than the level drops whole (atomicity)") {
    // totals a=10, big=100; budget 40 -> level = (40-10)/1 = 30 < 100:
    // big's single 100-token doc cannot fit and the source empties
    val df = docs((1L, "a", 10L), (2L, "big", 100L))
    val kept = Training.tokenWaterfill(df, "doc_id", "source", "n_toks", 40L)
      .collect().map(r => (r.getLong(0)))
    assert(kept.toSet == Set(1L))
  }

  test("a negative token count fails loudly instead of deflating its source") {
    val df = docs((1L, "a", 10L), (2L, "a", -5L))
    val e = intercept[Exception] {
      Training.tokenWaterfill(df, "doc_id", "source", "n_toks", 100L).collect()
    }
    assert(e.getMessage.contains("n_tokens must be >= 0"), e.getMessage)
  }

  test("null id or source is excluded and charges nothing") {
    val df = Seq(
      (Some(1L), Some("a"), 10L),
      (None, Some("a"), 999L),
      (Some(3L), None, 999L)).toDF("doc_id", "source", "n_toks")
    val kept = Training.tokenWaterfill(df, "doc_id", "source", "n_toks", 15L)
      .collect()
    assert(kept.map(_.getLong(0)).toSet == Set(1L))
  }
}

/** Filtered vector search strategy pair (s17/s18): pre-filter is
  * exact at any selectivity; post-filter trades recall for a
  * predicate-agnostic index, recovered by over-fetch.
  */
class FilteredAnnSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def results(q: String): Map[Long, Seq[Long]] =
    graft.SparkEntry.queries(q)(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap

  test("post-filter returns a strict subset; over-fetch recovers recall") {
    val pre = results("s17_filtered_ann")
    val post = results("s18_postfiltered_ann")
    // everything post-filter returns is correct (a prefix of truth)...
    post.foreach { case (q, ids) =>
      assert(ids.toSet.subsetOf(pre(q).toSet), s"query $q: $ids not in truth") }
    // ...but at overFetch=2 over a ~10%-selective label the recall
    // loss is drastic — the regime the operator doc warns about
    val truth = pre.values.map(_.size).sum
    val got = post.values.map(_.size).sum
    info(s"post-filter recall at overFetch=2: $got/$truth")
    assert(got < truth / 2, s"expected drastic loss, got $got/$truth")
    // raising the over-fetch factor recovers it
    val s = spark
    import org.apache.spark.sql.functions._
    val emb = graft.GraftSession.table(s, dir, "embeddings")
    val q5 = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val wide = Similarity.filteredTopKPost(emb, "vec_id", "embedding",
        col("label") === 1, q5, "qid", "qvec", k = 10, overFetch = 40)
      .count()
    assert(wide >= truth * 0.9, s"overFetch=40 recovered only $wide/$truth")
  }
}

/** Data-constrained effective-token accounting (p17, Muennighoff
  * 2023): exponential repeat decay via the engine-exact Horner exp.
  */
class EffectiveTokensSpec extends SparkSpec {
  import spark.implicits._

  test("the Horner e^-x matches libm within 1e-7 on the working range") {
    for (x <- Seq(0.0, 0.1, 0.5, 1.0, 2.0, 3.0, 4.0)) {
      val horner = Training.ExpCoefs.foldRight(0.0)((c, acc) => c + x * acc)
      assert(math.abs(horner - math.exp(-x)) < 1e-7,
        s"x=$x horner=$horner exp=${math.exp(-x)}")
    }
  }

  test("one epoch counts in full; repetition value saturates at U*(1+R*)") {
    val df = Seq(
      (1L, "a", 1000L),   // alloc 1000 => exactly 1 epoch, R=0
      (2L, "b", 50L))     // alloc 1000 => 20 epochs, deep saturation
      .toDF("doc_id", "source", "n_toks")
    val out = Training.effectiveTokens(df, "source", "n_toks",
        allocPerSource = 1000.0)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val (ep1, eff1) = out("a")
    assert(ep1 == 1.0 && eff1 == 1000.0, out("a")) // R=0: e^0=1, D'=U
    val (ep2, eff2) = out("b")
    assert(ep2 == 20.0, out("b"))
    // D' in (U, U*(1+R*)): repetition helps but saturates
    assert(eff2 > 50.0 && eff2 < 50.0 * 6.3, out("b"))
    // at R=19, R*=5.3: decay nearly complete — within 3% of the cap
    assert(eff2 > 50.0 * 6.3 * 0.97, out("b"))
  }

  test("tiny sources (x >> 4) clamp instead of diverging") {
    // a 30-token source under a 2000-token allocation puts
    // x = (2000/30 - 1)/5.3 ~ 12.4 — far past the Taylor chain's
    // accurate range. Unclamped, the degree-20 polynomial is off by
    // orders of magnitude (hugely negative effective tokens); clamped
    // it saturates at the x=4 value.
    val df = Seq(
      (1L, "tiny", 30L),     // x ~ 12.4
      (2L, "tinier", 5L),    // x ~ 75 — catastrophic unclamped
      (3L, "ok", 2000L))     // x = 0 control
      .toDF("doc_id", "source", "n_toks")
    val out = Training.effectiveTokens(df, "source", "n_toks",
        allocPerSource = 2000.0)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    for (s <- Seq("tiny", "tinier")) {
      val u = if (s == "tiny") 30.0 else 5.0
      val eff = out(s)
      // finite, monotone, inside (U, U*(1+R*)]
      assert(eff > u && eff <= u * 6.3 + 1e-6, s"$s -> $eff")
      // saturated at the x=4 value (epsilon covers the Horner chain's
      // ~1e-7 error at x=4 scaled by U*R*, plus the 6-decimal round)
      assert(eff > u * (1.0 + 5.3 * (1.0 - math.exp(-4.0))) - u * 5.3 * 2e-7 - 1e-6,
        s"$s -> $eff not saturated")
    }
    assert(out("ok") == 2000.0, out("ok"))
    // the generated oracle SQL carries the same clamp
    assert(Training.expNegHornerSql("x").contains("least((x), 4.0)"))
  }
}

/** MMR diverse re-ranking (s19, Carbonell & Goldstein 1998). */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  test("a near-dup of the top hit is demoted below a diverse result") {
    // q=[1,0]; A=[.95,.31] rel .951, A'=[.94,.34] rel .940 but
    // sim(A,A') ~ .9995, B=[.9,-.436] rel .900 but sim(A,B) ~ .720.
    // Plain top-3 = A, A', B. MMR round 2 at lambda .7:
    //   A' scores .7*.940 - .3*.9995 = .358
    //   B  scores .7*.900 - .3*.720  = .414  -> B wins, A' demoted
    val corpus = Seq(
      (1L, Array(0.95f, 0.31f)),
      (2L, Array(0.94f, 0.34f)),
      (3L, Array(0.9f, -0.436f))).toDF("vec_id", "embedding")
    val q = Seq((0L, Array(1.0f, 0.0f))).toDF("qid", "qvec")
    val got = Similarity.mmrTopK(corpus, "vec_id", "embedding",
        q, "qid", "qvec", k = 3, prefetch = 3, lam = 0.7)
      .orderBy("mmr_rank")
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 1L), (3L, 2L), (2L, 3L)), got.toSeq)
  }

  test("lambda 1.0 degenerates to plain relevance order") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.999f, 0.045f)),
      (3L, Array(0.6f, 0.8f))).toDF("vec_id", "embedding")
    val q = Seq((0L, Array(1.0f, 0.0f))).toDF("qid", "qvec")
    val got = Similarity.mmrTopK(corpus, "vec_id", "embedding",
        q, "qid", "qvec", k = 3, prefetch = 3, lam = 1.0)
      .orderBy("mmr_rank")
      .collect().map(_.getLong(1))
    assert(got.toSeq == Seq(1L, 2L, 3L), got.toSeq)
  }
}

/** Rare template transitions (r24): the new-failure-path detector. */
class RareTransitionsSpec extends SparkSpec {
  import spark.implicits._

  test("an out-of-character exit flags; the dominant path does not") {
    // user streams: login -> query (x30 across users), one login -> crash
    val rows = (0 until 30).flatMap { u =>
      Seq((u.toLong, 1L, u * 10L + 1, s"login user=$u"),
        (u.toLong, 2L, u * 10L + 2, s"query user=$u rows=42"))
    } :+ ((99L, 1L, 991L, "login user=99")) :+ ((99L, 2L, 992L, "crash user=99"))
    val df = rows.toDF("user_id", "ts", "event_id", "line")
    val got = LogMining.rareTransitions(df, "user_id", "ts", "event_id", "line",
        minShare = 0.05, maxN = 2L)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getBoolean(4)))).toMap
    val loginT = "login user=<N>"
    assert(got((loginT, "query user=<N> rows=<N>")) == ((30L, false)), got)
    assert(got((loginT, "crash user=<N>")) == ((1L, true)), got)
  }
}

/** BPE tokenizer training + application (t34/t35, Sennrich 2016). */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("merge table replays the textbook hand trace") {
    // words: aaab x3, ab x1
    //   round 1: (a,a) freq 6 -> "aa"     [aaab contributes 2 per copy]
    //   round 2: (a,b) freq 4 -> "ab"     [3 from "aa a b", 1 from "a b"]
    //   round 3: (aa,ab) freq 3
    val docs = Seq((1L, "aaab aaab"), (2L, "aaab ab")).toDF("doc_id", "text")
    val mt = TextStats.bpeTrain(docs, "text", merges = 3)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(mt.toSeq == Seq((1L, "a a", 6L), (2L, "a b", 4L), (3L, "aa ab", 3L)))
  }

  test("merge application is greedy left-to-right, never overlapping") {
    // "aaa": after merging (a,a) the word must segment as [aa, a]
    // (left-to-right non-overlap), i.e. 2 BPE tokens, not 1 or 3
    val docs = Seq((1L, "aaa")).toDF("doc_id", "text")
    val counts = TextStats.bpeTokenCounts(docs, "doc_id", "text", Seq("a a"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(counts.toSeq == Seq((1L, 2L)))
  }

  test("training stops early when the vocabulary runs dry") {
    // single 2-char word: exactly one mergeable pair exists
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val mt = TextStats.bpeTrain(docs, "text", merges = 8).collect()
    assert(mt.length == 1 && mt(0).getString(1) == "a b")
  }

  test("empty and single-char docs count correctly") {
    val docs = Seq((1L, ""), (2L, "a"), (3L, "ab ab")).toDF("doc_id", "text")
    val counts = TextStats.bpeTokenCounts(docs, "doc_id", "text", Seq("a b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(counts == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }
}

/** Signature-store dedup (d25): near-dedup new docs against a
  * persisted k=8 portable MinHash store, no old text in the plan.
  */
class SigStoreDedupSpec extends SparkSpec {
  import spark.implicits._

  private val oldDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "completely different content about distributed query engines at scale"))
    .toDF("doc_id", "text")

  test("an identical new doc matches its stored twin at 8/8; unrelated docs stay silent") {
    val newDocs = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again today"),
      (11L, "nothing in common with anything stored before this moment arrived"))
      .toDF("doc_id", "text")
    val store = Dedup.portableSignatureStore(oldDocs, "doc_id", "text")
    val got = Dedup.sigStoreDedup(store, newDocs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((10L, 1L, 8L, 1.0)))
  }

  test("the store survives a parquet round-trip (the artifact is the contract)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sigstore").toFile
    Dedup.portableSignatureStore(oldDocs, "doc_id", "text")
      .write.mode("overwrite").parquet(dir.getAbsolutePath)
    val reloaded = spark.read.parquet(dir.getAbsolutePath)
    val newDocs = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again today"))
      .toDF("doc_id", "text")
    val got = Dedup.sigStoreDedup(reloaded, newDocs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((10L, 1L, 8L)))
    // and the store really is text-free: ~3 narrow columns
    assert(reloaded.columns.sorted.toSeq == Seq("i", "id", "sig"))
  }

  test("estimated jaccard tracks the true jaccard on real docs") {
    // the k=8 estimator is unbiased (E[matches/k] = J) but coarse;
    // this gate pins its realized quality on the sf0.01 corpus so a
    // hash-family or banding regression that decorrelates the
    // estimate fails loudly. Deterministic — exact regression values.
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .filter(col("doc_id") < 500)
    val store = Dedup.portableSignatureStore(
      docs.filter(col("doc_id") < 250), "doc_id", "text")
    val est = Dedup.sigStoreDedup(store, docs.filter(col("doc_id") >= 250),
        "doc_id", "text")
      .select(col("doc_id"), col("matched_id"), col("est_jaccard"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(est.nonEmpty, "no pairs — gate is vacuous")
    // true jaccard over the same 3-gram shingle sets, text-side
    val ids = est.keySet.flatMap(p => Seq(p._1, p._2))
    val sh = Dedup.shingles(docs.filter(col("doc_id").isin(ids.toSeq: _*)),
        "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val errs = est.map { case ((a, b), e) =>
      val (sa, sb) = (sh(a), sh(b))
      val j = (sa intersect sb).size.toDouble / (sa union sb).size
      math.abs(e - j)
    }
    val mae = errs.sum / errs.size
    info(f"pairs=${est.size} MAE=$mae%.3f max=${errs.max}%.3f")
    // measured 0.040 / 0.114 (deterministic) — gates within a small
    // slack of measured, the round-11 gate discipline
    assert(mae <= 0.06, f"estimator MAE regressed: $mae%.3f (measured 0.040)")
    assert(errs.max <= 0.16, f"estimator worst error regressed: ${errs.max}%.3f (measured 0.114)")
  }

  test("stored-vs-stored pairs never surface") {
    // two identical OLD docs: a self-dedup would pair them; the store
    // contract only reports incoming-vs-stored
    val dupOld = Seq(
      (1L, "same text here for both of the stored documents in this case"),
      (2L, "same text here for both of the stored documents in this case"))
      .toDF("doc_id", "text")
    val store = Dedup.portableSignatureStore(dupOld, "doc_id", "text")
    val newDocs = Seq((10L, "fresh unrelated arrival with its own words"))
      .toDF("doc_id", "text")
    val got = Dedup.sigStoreDedup(store, newDocs, "doc_id", "text").collect()
    assert(got.isEmpty)
  }
}
