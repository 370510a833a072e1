package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class WindowsSpec extends SparkSpec {
  import spark.implicits._

  private val events = Seq(
    (1L, "2024-01-01 00:00:10", "a"), (2L, "2024-01-01 00:04:59", "a"),
    (3L, "2024-01-01 00:05:00", "b"), (4L, "2024-01-01 00:09:30", "a"))
    .toDF("id", "ts_s", "k").withColumn("ts", to_timestamp(col("ts_s")))

  test("tumbling assigns epoch-aligned windows") {
    val out = Windows.tumbling(events, "ts", 300).select("id", "window_start")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val base = 1704067200L // 2024-01-01 00:00:00 UTC
    assert(out.toSeq == Seq((1L, base), (2L, base), (3L, base + 300), (4L, base + 300)))
  }

  test("sliding replicates each row size/slide times") {
    val out = Windows.sliding(events, "ts", 600, 300)
    assert(out.count() == events.count() * 2)
  }

  test("aggregate groups on (window, keys)") {
    val out = Windows.aggregate(events, "ts", 300, 300, Seq("k"),
        Seq(count(lit(1)).as("n")))
      .orderBy("window_start", "k").collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3)))
    val base = 1704067200L
    assert(out.toSeq == Seq((base, "a", 2L), (base + 300, "a", 1L), (base + 300, "b", 1L)))
  }
}

class ThrottleSpec extends SparkSpec {
  import spark.implicits._

  test("keeps first N per period by time, discards overflow") {
    val df = (0 until 10).map(i => (i.toLong, s"2024-01-01 00:00:${i * 5}%02d".format(i * 5)))
      .map { case (i, _) => (i, f"2024-01-01 00:00:${i * 5}%02d") }
      .toDF("id", "ts_s").withColumn("ts", to_timestamp(col("ts_s")))
    // period 60s: ids 0..11*5<60 → ids 0-9 all in minute 0; keep first 3
    val out = Throttle.firstNPerPeriod(df, "ts", 60, 3, Seq("id"))
      .select("id").as[Long].collect().sorted
    assert(out.toSeq == Seq(0L, 1L, 2L))
  }

  test("streaming throttle counts admissions across micro-batches") {
    val s = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
    val df = input.toDF().toDF("id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val q = Throttle.streaming(df, "ts", periodSec = 60, n = 2, delay = "0 seconds")
      .writeStream.format("memory").queryName("throttle_stream")
      .outputMode("append").start()
    try {
      // batch 1: two rows of minute 0 -> both admitted
      input.addData((1L, 10L), (2L, 20L))
      q.processAllAvailable()
      // batch 2: two MORE rows of minute 0 (over budget, must be
      // discarded even though they arrive in a fresh batch — the
      // semantics maxFilesPerTrigger cannot give) + one row of minute 5
      input.addData((3L, 30L), (4L, 40L), (5L, 300L))
      q.processAllAvailable()
      val ids = spark.table("throttle_stream").select("id")
        .collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 5L), ids.toSeq.toString)
    } finally q.stop()
  }
}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy cat"),   // near dup of 0
    (3L, "completely different words appear here nothing shared at all"),
    (4L, "spark engines shuffle data between executors during wide operations"))
    .toDF("doc_id", "text")

  test("exact dedup keeps lowest id and counts dups") {
    val out = Dedup.exact(docs, "doc_id", "text")
      .select("keep_id", "n_dups").orderBy("keep_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((0L, 2L), (2L, 1L), (3L, 1L), (4L, 1L)))
  }

  test("shingles builds distinct word n-grams") {
    val sh = Dedup.shingles(Seq((1L, "a b a b c")).toDF("id", "t"), "id", "t", 2)
    val got = sh.select("shingle").as[String].collect().sorted
    assert(got.toSeq == Seq("a b", "b a", "b c"))
  }

  test("minHashLsh finds the near-dup pair with exact jaccard") {
    val out = Dedup.minHashLsh(docs, "doc_id", "text",
      shingleN = 2, numHashes = 32, bands = 16, threshold = 0.4)
      .orderBy("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // docs 0/1 identical (J=1); 0/2 and 1/2 share 7 of 9 bigrams (J=7/9)
    assert(out.map(t => (t._1, t._2)).toSeq == Seq((0L, 1L), (0L, 2L), (1L, 2L)))
    assert(out(0)._3 == 1.0)
    assert(math.abs(out(1)._3 - 7.0 / 9.0) < 1e-6)
  }

  test("simhash of identical docs is identical; near docs are close") {
    val sig = Dedup.simHash(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(0L) == sig(1L))
    val d02 = java.lang.Long.bitCount(sig(0L) ^ sig(2L))
    val d03 = java.lang.Long.bitCount(sig(0L) ^ sig(3L))
    assert(d02 < d03, s"near-dup distance $d02 should beat unrelated $d03")
  }

  test("simHashPairs finds pairs within hamming distance") {
    val pairs = Dedup.simHashPairs(Dedup.simHash(docs, "doc_id", "text"), maxDist = 3)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((0L, 1L)))
  }

  test("jaccardPairs computes exact jaccard") {
    val sh = Dedup.shingles(docs, "doc_id", "text", 2)
    val out = Dedup.jaccardPairs(sh, 0.5).orderBy("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(t => (t._1, t._2)).toSeq == Seq((0L, 1L), (0L, 2L), (1L, 2L)))
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.0f, 1.0f, 0.0f)),
    (2L, Array(1.0f, 1.0f, 0.0f)),
    (3L, Array(2.0f, 0.0f, 0.0f)))
    .toDF("vec_id", "embedding")

  test("VecDot matches a hand dot product, float and double") {
    import graft.functions.VecDot
    val d = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
      .select(VecDot.dot(col("a"), col("b"))).head().getDouble(0)
    assert(d == 32.0)
    val f = Seq((Array(1.0f, 2.0f), Array(0.5f, 0.25f))).toDF("a", "b")
      .select(VecDot.dot(col("a"), col("b"))).head().getDouble(0)
    assert(f == 1.0)
  }

  test("cosinePairs finds parallel vectors") {
    val out = Similarity.cosinePairs(vecs, "vec_id", "embedding", 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((0L, 3L)))
  }

  test("bruteTopK ranks by cosine with id tiebreak") {
    val q = vecs.filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val out = Similarity.bruteTopK(vecs, "vec_id", "embedding", q, "qid", "qvec", 3)
      .orderBy("rank").collect().map(r => r.getLong(1))
    // cos with [1,0,0]: id0=1, id3=1, id2=0.707, id1=0 → (0,3 tie→id), 2
    assert(out.toSeq == Seq(0L, 3L, 2L))
  }

  test("lshTopK returns self as top hit when queries come from corpus") {
    val q = vecs.filter(col("vec_id") === 2)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val out = Similarity.lshTopK(vecs, "vec_id", "embedding", q, "qid", "qvec", 2, 4)
      .filter(col("rank") === 1).collect()
    assert(out.length == 1 && out(0).getLong(1) == 2L)
  }
}

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join result") {
    val big = (0 until 1000).map(i => (if (i % 3 == 0) "hot" else s"k$i", i))
      .toDF("key", "v")
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("key", "label")
    val plain = big.join(dim, "key").select("key", "v", "label")
    val salted = Skew.saltedJoin(big, dim, "key", factor = 4)
      .select("key", "v", "label")
    assert(plain.count() == salted.count())
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("fakeDecode derives deterministic byte stats") {
    val (n, head, mean, feat) = Multimodal.fakeDecode("abc".getBytes("UTF-8"), 2)
    assert(n == 3L && head == 'a'.toInt)
    assert(math.abs(mean - (97 + 98 + 99) / 3.0) < 1e-12)
    assert(feat.toSeq == Seq(97.0 + 99.0, 98.0))
  }

  test("sampleFrames explodes a blob into n per-frame feature rows") {
    val df = Seq((1L, "abcdefghij")).toDF("doc_id", "text") // 10 bytes
    val out = Multimodal.sampleFrames(
      Multimodal.withBlob(df, "text"), "doc_id", "blob", n = 5, dim = 2)
      .orderBy("frame_idx").collect()
    assert(out.length == 5)
    assert(out.map(_.getAs[Long]("frame_bytes")).forall(_ == 2L)) // 10/5
    assert(out.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 1, 2, 3, 4))
  }

  test("decodeFeatures carries schema and per-row stats") {
    val df = Seq((1L, "hello"), (2L, "")).toDF("doc_id", "text")
    val out = Multimodal.decodeFeatures(
      Multimodal.withBlob(df, "text"), "doc_id", "blob", dim = 4)
    val rows = out.orderBy("id").collect()
    assert(rows(0).getAs[Long]("n_bytes") == 5L)
    assert(rows(0).getAs[Int]("head_byte") == 'h'.toInt)
    assert(rows(1).getAs[Long]("n_bytes") == 0L)
    assert(out.schema("feature").dataType.typeName == "array")
  }
}

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("asof join attaches latest right row at-or-before each left ts") {
    val left = Seq((1L, 10L, "2024-01-01 00:00:05"),
                   (2L, 10L, "2024-01-01 00:00:20"),
                   (3L, 20L, "2024-01-01 00:00:10"))
      .toDF("eid", "uid", "ts_s").withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val right = Seq((100L, 10L, "2024-01-01 00:00:05"),  // ties eid=1's ts: match
                    (101L, 10L, "2024-01-01 00:00:15"),
                    (102L, 30L, "2024-01-01 00:00:01"))  // other key: never matches
      .toDF("rid", "uid", "ts_s").withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = AsOf.join(left, right, Seq("uid"), "ts", "rid", Seq("rid" -> "match_id"))
      .select("eid", "match_id").orderBy("eid").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(out.toSeq == Seq((1L, 100L), (2L, 101L), (3L, -1L)))
  }

  test("equal-ts right rows resolve to the max tie column") {
    val left = Seq((1L, 10L, "2024-01-01 00:00:10"))
      .toDF("eid", "uid", "ts_s").withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val right = Seq((100L, 10L, "2024-01-01 00:00:10"), (105L, 10L, "2024-01-01 00:00:10"))
      .toDF("rid", "uid", "ts_s").withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = AsOf.join(left, right, Seq("uid"), "ts", "rid", Seq("rid" -> "match_id"))
      .select("match_id").collect()
    assert(out.head.getLong(0) == 105L)
  }
}

class LshBucketCapSpec extends SparkSpec {
  import spark.implicits._

  test("maxBucket drops degenerate buckets before the self-join") {
    // 4 docs in one bucket (6 pairs), 2 docs in another (1 pair).
    val bands = Seq(
      (1L, 0, 100L), (2L, 0, 100L), (3L, 0, 100L), (4L, 0, 100L),
      (5L, 0, 200L), (6L, 0, 200L))
      .toDF("id", "band", "band_hash")
    assert(graft.operators.Dedup.lshCandidates(bands, None).count() == 7)
    assert(graft.operators.Dedup.lshCandidates(bands, Some(3)).count() == 1)
  }
}

class SimHashBandingSpec extends SparkSpec {
  import spark.implicits._

  test("generalized banding finds pairs at any maxDist by pigeonhole") {
    // two signatures differing in exactly 5 bits
    val a = 0L
    val b = (1L << 0) | (1L << 13) | (1L << 27) | (1L << 45) | (1L << 63)
    val sig = Seq((1L, a), (2L, b)).toDF("id", "simhash")
    // maxDist=4 (< 5 differing bits): verify step rejects the pair
    assert(graft.operators.Dedup.simHashPairs(sig, maxDist = 4).count() == 0)
    // maxDist=7 -> 8 bands of 8 bits; 5 diffs must leave a band intact
    val out = graft.operators.Dedup.simHashPairs(sig, maxDist = 7).collect()
    assert(out.length == 1 && out.head.getAs[Int]("dist") == 5)
  }
}

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("min-label propagation resolves chains and keeps singletons") {
    // chain 1-2-3, pair 10-11; node 99 appears in no pair
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id1", "id2")
    val comp = graft.operators.Dedup.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c"), (10L, "d"), (11L, "e"), (99L, "f"))
      .toDF("doc_id", "text")
    val kept = graft.operators.Dedup.resolveKeepers(docs, "doc_id", pairs)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 10L, 99L))
  }
}

class DistributedCCSpec extends SparkSpec {
  import spark.implicits._

  test("the distributed star path agrees with union-find") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L))
      .toDF("id1", "id2")
    val viaStars = graft.operators.Dedup
      .connectedComponents(pairs, driverThreshold = 0) // force distributed path
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val viaUf = graft.operators.Dedup.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaStars == viaUf)
    assert(viaStars(4L) == 1L && viaStars(12L) == 10L)
  }

  test("star rounds resolve a high-diameter chain in far fewer than diameter rounds") {
    // a 60-link chain has diameter 60: min-label propagation would need
    // 60 rounds (well past maxIter=8); large-star/small-star must close
    // it in O(log n) — this is the shape that matters when near-dup
    // clusters chain at corpus scale
    val chain = (0L until 60L).map(i => (i, i + 1)).toDF("id1", "id2")
    val comp = graft.operators.Dedup
      .connectedComponents(chain, maxIter = 8, driverThreshold = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(comp.size == 61 && comp.values.forall(_ == 0L), comp.toString)
  }
}

class DirtyInputSpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.TextFunctions

  test("null, empty, and whitespace-only texts flow through without errors") {
    // real corpora always contain dirty rows; every operator must give
    // a defined (if degenerate) answer, never throw
    val docs = Seq((1L, "normal text here with words"),
      (2L, null.asInstanceOf[String]), (3L, ""), (4L, "   ")).toDF("doc_id", "text")

    val lang = docs.select(TextFunctions.langId(col("text"))).as[String].collect()
    assert(lang.toSeq == Seq("und", "und", "und", "und"))

    // null propagates as null quality — a `quality >= x` gate drops it
    val q = docs.select(TextFunctions.qualityScore(col("text"))).collect()
    assert(q(1).isNullAt(0))
    assert(docs.filter(TextFunctions.qualityScore(col("text")) >= 0.0).count() == 3)

    // no-shingle docs (null/empty/whitespace) are excluded from banding
    assert(Dedup.minHashLsh(docs, "doc_id", "text", 3, 16, 4, 0.5).count() == 0)

    // null texts form ONE dedup group (documented GROUP-BY-null semantics)
    val withTwoNulls = docs.unionAll(Seq((5L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val nullGroup = Dedup.exact(withTwoNulls, "doc_id", "text")
      .filter(col("n_dups") === 2).collect()
    assert(nullGroup.length == 1 && nullGroup.head.getAs[Long]("keep_id") == 2L)
  }
}

class BigDocSpec extends SparkSpec {
  import spark.implicits._

  test("200k-token documents flow through shingle, minhash, and repetition paths") {
    // guards the no-silent-cap property end to end: nothing truncates,
    // nothing goes quadratic in document length
    val big1 = (0 until 200000).map(i => s"tok${i % 50000}").mkString(" ")
    val big2 = big1.replace("tok49999", "tokX")  // near-dup of big1
    val small = "just a few short words here"
    val docs = Seq((1L, big1), (2L, big2), (3L, small)).toDF("doc_id", "text")

    val rep = TextStats.repetition(docs, "doc_id", "text")
      .filter(col("id") === 1).head()
    assert(rep.getLong(1) == 200000L, "token count must not cap")

    val pairs = Dedup.minHashLsh(docs, "doc_id", "text",
        shingleN = 3, numHashes = 32, bands = 8, threshold = 0.5)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), pairs.toString)
  }
}

class BlocklistSpec extends SparkSpec {
  import spark.implicits._

  test("bloom prune + exact verify removes exactly the blocked keys") {
    val corpus = (0L until 1000L).map(i => (i, s"user$i")).toDF("id", "user")
    val blocked = Seq("user3", "user500", "user999", "ghost").toDF("bad_user")
    val out = Blocklist.filterOut(corpus, blocked, "user", "bad_user")
      .select("id").as[Long].collect().sorted
    assert(out.length == 997)
    assert(!out.contains(3L) && !out.contains(500L) && !out.contains(999L))
    // schema survives the split-and-union
    assert(Blocklist.filterOut(corpus, blocked, "user", "bad_user")
      .columns.toSeq == Seq("id", "user"))
  }

  test("bloom-negative rows bypass the join entirely") {
    // with an empty blocklist every row is bloom-negative: the result
    // must equal the corpus (and the clean path must not lose rows)
    val corpus = (0L until 100L).map(i => (i, s"u$i")).toDF("id", "user")
    val none = Seq.empty[String].toDF("bad_user")
    assert(Blocklist.filterOut(corpus, none, "user", "bad_user").count() == 100L)
  }
}

class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  test("repetition metrics expose boilerplate that length filters miss") {
    val docs = Seq(
      (1L, "click here click here click here"),    // 3/6 tokens are "click"
      (2L, "a fresh take on six distinct words"),  // all distinct
      (3L, "one")                                  // no bigrams
    ).toDF("doc_id", "text")
    val out = TextStats.repetition(docs, "doc_id", "text")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out(0) == ((1L, 6L, 0.5, 0.6)))    // top bigram "click here" 3/5
    assert(out(1)._3 < 0.2 && out(1)._4 < 0.2)
    assert(out(2) == ((3L, 1L, 1.0, 0.0)))    // single token, bigram frac 0
  }
}

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  test("flags train docs sharing enough shingles with a benchmark doc") {
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "prefix words the quick brown fox jumps over the lazy dog suffix"), // contaminated
      (2L, "the quick brown cat sits calmly"),                                 // 1 shared shingle
      (3L, "entirely unrelated content here")
    ).toDF("doc_id", "text")
    val out = Decontaminate.flag(train, bench, "doc_id", "text",
        shingleN = 3, minOverlap = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 1L, 7L)), out.toSeq.toString)
  }
}

class KeepBestSpec extends SparkSpec {
  import spark.implicits._

  test("resolveKeepBest keeps the highest-scoring doc per component") {
    val docs = Seq(
      (1L, 0.2), (2L, 0.9), (3L, 0.9), // one cluster: 2 wins (score tie -> min id)
      (7L, 0.5)                         // singleton keeps itself
    ).toDF("doc_id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id1", "id2")
    val kept = graft.operators.Dedup.resolveKeepBest(docs, "doc_id", "score", pairs)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(2L, 7L), kept.toSeq.toString)
  }

  test("softDedupWeights: clusters sum to unit mass, singletons keep weight 1") {
    val docs = Seq(1L, 2L, 3L, 7L, 8L, 9L).toDF("doc_id")
    // {1,2,3} via chain, {7,8} direct, {9} singleton
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id1", "id2")
    val out = graft.operators.Dedup.softDedupWeights(docs, "doc_id", pairs)
      .select("doc_id", "component", "cluster_size", "weight")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out.keySet == docs.as[Long].collect().toSet)
    assert(out(1L) == ((1L, 3L, 0.333333)) && out(2L)._1 == 1L && out(3L)._1 == 1L)
    assert(out(7L) == ((7L, 2L, 0.5)) && out(8L)._1 == 7L)
    assert(out(9L) == ((9L, 1L, 1.0)))
    // total mass = number of distinct components (up to round-6)
    val mass = out.values.map(_._3).sum
    assert(math.abs(mass - 3.0) < 1e-4, mass.toString)
  }
}

class MinHashRecallSpec extends SparkSpec {

  test("minHashLsh finds EXACTLY the exhaustive jaccard>=0.5 pairs on real docs") {
    // deterministic end-to-end quality gate: on sf0.001 documents the
    // banded+verified pipeline equals exhaustive pairwise jaccard —
    // perfect recall (banding misses nothing at this threshold) and
    // perfect precision (the verify step removes every false candidate)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 500)
    val exact = Dedup.jaccardPairs(Dedup.shingles(docs, "doc_id", "text", 3), 0.5)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minHashLsh(docs, "doc_id", "text", shingleN = 3,
        numHashes = 32, bands = 8, threshold = 0.5)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "test corpus must contain near-dups")
    assert(lsh == exact, s"missed=${exact -- lsh} extra=${lsh -- exact}")
  }
}

class SimHashCompletenessSpec extends SparkSpec {

  test("banded simhash pairs equal exhaustive hamming<=3 pairs on real docs") {
    // pigeonhole banding is COMPLETE for dist <= maxDist, so on any
    // corpus the banded+verified output must equal the all-pairs scan
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 500)
    val sig = Dedup.simHash(docs, "doc_id", "text").persist()
    val banded = Dedup.simHashPairs(sig, maxDist = 3)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exhaustive = sig.as("a").join(sig.as("b"), col("a.id") < col("b.id"))
      .filter(bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))) <= 3)
      .select(col("a.id"), col("b.id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    sig.unpersist()
    assert(exhaustive.nonEmpty, "test corpus must contain simhash near-dups")
    assert(banded == exhaustive,
      s"missed=${exhaustive -- banded} extra=${banded -- exhaustive}")
  }
}
