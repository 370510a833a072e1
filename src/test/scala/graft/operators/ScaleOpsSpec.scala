package graft.operators

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class IvfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = {
    // 3 well-separated clusters around axes, 30 points each
    val rnd = new scala.util.Random(7)
    (0 until 90).map { i =>
      val axis = i % 3
      val base = Array.fill(8)(0.05f * rnd.nextFloat())
      base(axis) = 1.0f + 0.05f * rnd.nextFloat()
      (i.toLong, base)
    }.toDF("vec_id", "embedding")
  }

  test("ivfTopK returns self as top-1 and stays within the probed lists") {
    val q = corpus.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val out = Similarity.ivfTopK(corpus, "vec_id", "embedding", q, "qid", "qvec",
      k = 5, nlist = 9, nprobe = 3)
    val top1 = out.filter(col("rank") === 1).orderBy("query_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(top1.toSeq == Seq((0L, 0L), (1L, 1L), (2L, 2L)))
    // neighbors of an axis-0 query should come from the axis-0 cluster
    val n0 = out.filter(col("query_id") === 0).collect().map(_.getLong(1))
    assert(n0.forall(_ % 3 == 0), n0.toSeq.toString)
  }

  test("ivf recall matches brute force on clustered data") {
    val q = corpus.filter(col("vec_id") === 30) // axis-0 cluster member
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val brute = Similarity.bruteTopK(corpus, "vec_id", "embedding", q, "qid", "qvec", 5)
      .collect().map(_.getLong(1)).toSet
    val ivf = Similarity.ivfTopK(corpus, "vec_id", "embedding", q, "qid", "qvec",
      5, nlist = 9, nprobe = 9) // probe all lists => exact
    assert(ivf.collect().map(_.getLong(1)).toSet == brute)
  }
}

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("int8 codes stay in range and reconstruct within one scale step") {
    val vecs = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 1.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)),      // all-zero -> scale 0, codes 0
      (3L, Array(-0.001f, 127.5f, 3.25f, -9.75f))
    ).toDF("vec_id", "embedding")
    val q = Similarity.quantizeInt8(vecs, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(q.forall { case (_, _, code, _) => code >= -127L && code <= 127L })
    assert(q.filter(_._1 == 2L).forall { case (_, _, code, s) => code == 0L && s == 0.0 })
    // floor quantization: x - code*scale in [0, scale)
    val orig = vecs.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
    q.filter(_._4 > 0).foreach { case (id, pos, code, s) =>
      val err = orig(id)(pos.toInt).toDouble - code * s
      assert(err >= 0 && err < s + 1e-12, s"id=$id pos=$pos err=$err scale=$s")
    }
  }
}

class StreamingDedupSpec extends SparkSpec {

  test("streaming exact dedup drops within-watermark duplicates") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[(Long, String)]
    val df = input.toDF().toDF("sec", "text")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val q = Dedup.streamingExact(df, "ts", "text", "1 minute")
      .writeStream.format("memory").queryName("sdedup").outputMode("append").start()
    try {
      input.addData((10L, "aaa"), (11L, "bbb"), (12L, "aaa"))
      q.processAllAvailable()
      input.addData((20L, "aaa"), (21L, "ccc"))
      q.processAllAvailable()
      val got = spark.table("sdedup").select("text").as[String].collect().sorted
      assert(got.toSeq == Seq("aaa", "bbb", "ccc"), got.toSeq.toString)
    } finally q.stop()
  }
}

class BucketingSpec extends SparkSpec {
  import graft.sources.Bucketing

  test("same-key bucketed tables join without a shuffle") {
    val s = spark
    import s.implicits._
    for (t <- Seq("graft_b_facts", "graft_b_dims")) {
      s.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(loc)
      }
    }
    val facts = (0 until 1000).map(i => (i.toLong % 100, i.toLong)).toDF("k", "v")
    val dims = (0 until 100).map(i => (i.toLong, s"d$i")).toDF("k", "name")
    Bucketing.writeBucketed(facts, "graft_b_facts", "k", 8)
    Bucketing.writeBucketed(dims, "graft_b_dims", "k", 8)
    // hint on the INPUT forces SMJ, so bucketing (not broadcast) carries it
    val joined = Bucketing.table(s, "graft_b_facts").hint("merge")
      .join(Bucketing.table(s, "graft_b_dims"), "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(plan.contains("Bucketed: true"), plan)
    assert(joined.count() == 1000)
  }

  test("dynamic overwrite replaces only the re-curated partition") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dpo").toFile
    val full = Seq(
      (1L, "keep-a", "en"), (2L, "keep-b", "en"),
      (3L, "old-c", "de"), (4L, "old-d", "de"),
      (5L, "keep-e", "fr")).toDF("id", "payload", "lang")
    Bucketing.writePartitioned(full, dir.getAbsolutePath, "lang")
    // record the untouched partitions' physical files
    def files(lang: String) = Option(new java.io.File(dir, s"lang=$lang")
      .listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    val enBefore = files("en"); val frBefore = files("fr")
    assert(enBefore.nonEmpty && files("de").nonEmpty)
    // re-curate ONLY de: the incoming frame holds that partition alone
    val recurated = Seq((30L, "new-c", "de")).toDF("id", "payload", "lang")
    Bucketing.overwritePartitions(recurated, dir.getAbsolutePath, "lang")
    val after = s.read.parquet(dir.getAbsolutePath)
    assert(after.filter($"lang" === "de").select("payload")
      .as[String].collect().toSet == Set("new-c"))
    // other partitions: same rows AND the same untouched files
    assert(after.filter($"lang" === "en").count() == 2)
    assert(after.filter($"lang" === "fr").count() == 1)
    assert(files("en") == enBefore && files("fr") == frBefore,
      "untouched partitions must not be rewritten")
  }

  test("range-clustered files own disjoint key ranges (min/max skippable)") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-rc").toFile
    val df = new scala.util.Random(11).shuffle((0 until 10000).toList)
      .map(i => (i.toLong, s"p$i")).toDF("k", "payload")
    Bucketing.writeRangeClustered(df, dir.getAbsolutePath, "k", numFiles = 8)
    val parts = Option(dir.listFiles()).get
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(parts.length >= 4, s"expected multiple files, got ${parts.length}")
    // per-file [min,max] must not overlap: a filter k=x can then skip
    // every file but one on footer stats alone
    val ranges = parts.map { f =>
      val r = s.read.parquet(f.getAbsolutePath)
        .agg(org.apache.spark.sql.functions.min("k"),
          org.apache.spark.sql.functions.max("k")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi < lo2, ranges.mkString(","))
      case _ =>
    }
    // and the whole corpus survives the rewrite
    assert(s.read.parquet(dir.getAbsolutePath).count() == 10000L)
  }

  test("z-order accepts reserved-word and spaced column names") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-zoq").toFile
    // `order` is a SQL reserved word; `a b` has a space — both die in
    // unquoted SQL interpolation and must survive via backtick quoting
    val df = (0 until 200).map(i => (i.toLong, (i * 7 % 200).toLong))
      .toDF("order", "a b")
    graft.sources.Bucketing.writeZOrdered(df, dir.getAbsolutePath,
      "order", "a b", numFiles = 2, bits = 4)
    val back = s.read.parquet(dir.getAbsolutePath)
    assert(back.count() == 200L)
    assert(back.columns.sorted.toSeq == Seq("a b", "order"))
  }

  test("z-ordered files bound BOTH columns' spans (two-dimensional skipping)") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-zo").toFile
    // two independent uniform columns: a linear sort on either would
    // leave the OTHER column's per-file span at ~the global span
    val rnd = new scala.util.Random(7)
    val df = (0 until 20000).map(_ => (rnd.nextInt(10000).toLong,
      rnd.nextInt(10000).toLong)).toDF("a", "b")
    graft.sources.Bucketing.writeZOrdered(df, dir.getAbsolutePath, "a", "b",
      numFiles = 16, bits = 8)
    val parts = Option(dir.listFiles()).get
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(parts.length >= 8, s"expected multiple files, got ${parts.length}")
    def meanSpan(c: String): Double = {
      val spans = parts.map { f =>
        val r = s.read.parquet(f.getAbsolutePath)
          .agg(org.apache.spark.sql.functions.min(c),
            org.apache.spark.sql.functions.max(c)).head()
        (r.getLong(1) - r.getLong(0)).toDouble
      }
      spans.sum / spans.length
    }
    // the z-curve trades the single-column guarantee for a bound on
    // BOTH: each file's span on each column must sit well under the
    // ~10000 global span (a linear layout pins one near 10000)
    assert(meanSpan("a") < 6500.0, s"a span ${meanSpan("a")}")
    assert(meanSpan("b") < 6500.0, s"b span ${meanSpan("b")}")
    assert(s.read.parquet(dir.getAbsolutePath).count() == 20000L)
  }
}

/** ANN quality gate: approximate methods must recover a meaningful
  * fraction of the true top-k (deterministic — no RNG anywhere, so
  * these are exact regression values, not flaky bounds).
  */
class AnnRecallSpec extends graft.SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def neighbors(q: String): Map[Long, Set[Long]] =
    toSets(graft.SparkEntry.queries(q)(spark, dir))

  private def toSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select(col("query_id").cast("long"), col("neighbor_id").cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  // the seeded-ANN query keys now emit driver-provable gate REPORTS
  // (r17), so this spec pins the underlying rankings via
  // SparkEntry.AnnRankings — the ONE parameter block the shipped
  // gates use, so spec and driver gate cannot measure different
  // configurations — at tighter margins than the driver's pooled
  // gates
  private def R = graft.SparkEntry.AnnRankings
  private def emb = R.emb(spark, dir)
  private def embN = R.embNorm(spark, dir)

  test("multi-table LSH and IVF recall vs brute force") {
    val brute = neighbors("s01_ann_brute")
    def recall(m: Map[Long, Set[Long]]): Double = {
      val per = brute.keys.toSeq.map(q =>
        (m.getOrElse(q, Set.empty) intersect brute(q)).size.toDouble / brute(q).size)
      per.sum / per.size
    }
    val lsh = recall(toSets(R.lsh(emb)))
    val ivf = recall(toSets(R.ivf(emb)))
    info(f"LSH recall = $lsh%.3f, IVF recall = $ivf%.3f")
    // multi-probe LSH measures 0.940 here (0.88-1.00 across scales);
    // IVF with 4 Lloyd passes + spill=2 assignment replication
    // measures 1.000 here, 0.96 at sf0.01/sf0.1. Both runs are
    // deterministic (seeded hash families, no RNG), so the gates sit
    // within 0.05 of measured: any real regression — losing the
    // multi-probe expansion, the Lloyd refinement, or the spill —
    // trips them
    assert(lsh >= 0.89, s"LSH recall regressed: $lsh (measured 0.940)")
    assert(ivf >= 0.95, s"IVF recall regressed: $ivf (measured 1.000)")
  }

  test("portable LSH twin clears a recall gate of its own") {
    // s33 is hash-exact vs its oracle (the strong gate); this pins the
    // SEARCH QUALITY of the md5-plane family so a sign-convention or
    // probe regression that still hash-matches its own oracle cannot
    // silently gut recall. Deterministic: md5 planes, no RNG.
    val brute = neighbors("s01_ann_brute")
    val port = neighbors("s33_lsh_portable")
    val per = brute.keys.toSeq.map(q =>
      (port.getOrElse(q, Set.empty) intersect brute(q)).size.toDouble / brute(q).size)
    val recall = per.sum / per.size
    info(f"portable LSH (4 tables, r=2) recall = $recall%.3f")
    assert(recall >= 0.89, s"portable LSH recall regressed: $recall (measured 0.940)")
  }

  test("probe masks are the pinned deterministic sequence") {
    // popcount-major then numeric: exact bucket, single flips, pairs.
    // Pinned literally — a change to the sequence changes which
    // buckets every production query probes, so it must be deliberate.
    assert(graft.operators.Similarity.probeMasks(6, 0) == Seq(0L))
    assert(graft.operators.Similarity.probeMasks(6, 1) ==
      Seq(0L, 1L, 2L, 4L, 8L, 16L, 32L))
    assert(graft.operators.Similarity.probeMasks(4, 2) ==
      Seq(0L, 1L, 2L, 4L, 8L, 3L, 5L, 6L, 9L, 10L, 12L))
    // radius r probes sum_{i<=r} C(planes, i) buckets
    assert(graft.operators.Similarity.probeMasks(6, 2).size == 1 + 6 + 15)
    assert(graft.operators.Similarity.probeMasks(6, 2).distinct.size == 22)
    intercept[IllegalArgumentException](
      graft.operators.Similarity.lshTopK(null, "a", "b", null, "c", "d",
        k = 1, numPlanes = 4, probeRadius = 5))
  }

  test("probeRadius=2 buys back the recall that halving the tables loses") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 5)
      .select(org.apache.spark.sql.functions.col("vec_id").as("qid"),
        org.apache.spark.sql.functions.col("embedding").as("qvec"))
    val brute = neighbors("s01_ann_brute")
    def recallOf(tables: Int, radius: Int): Double = {
      val m = graft.operators.Similarity.lshTopK(emb, "vec_id", "embedding",
          q, "qid", "qvec", k = 10, numPlanes = 6, numTables = tables,
          probeRadius = radius)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val per = brute.keys.toSeq.map(qq =>
        (m.getOrElse(qq, Set.empty) intersect brute(qq)).size.toDouble / brute(qq).size)
      per.sum / per.size
    }
    val half1 = recallOf(tables = 4, radius = 1)
    val half2 = recallOf(tables = 4, radius = 2)
    info(f"4 tables: r=1 recall $half1%.3f, r=2 recall $half2%.3f")
    // deterministic (seeded hash planes): r=2 candidates are a strict
    // SUPERSET of r=1's, so recall is monotone; the gate checks the
    // radius actually recovers the 8-table bar at half the tables
    assert(half2 >= half1, s"r=2 must dominate r=1: $half2 < $half1")
    assert(half2 >= 0.89, s"4-table r=2 recall below the s02 gate: $half2")
  }

  test("IVF-PQ recall@10 vs brute force clears the gate") {
    val brute = neighbors("s01_ann_brute")
    val eN = embN
    val ivfpq = toSets(R.ivfPq(eN, R.codebook(eN)))
    val per = brute.keys.toSeq.map { q =>
      (ivfpq.getOrElse(q, Set.empty) intersect brute(q)).size.toDouble / brute(q).size
    }
    val recall = per.sum / per.size
    // compounded loss: coarse-probe coverage (s03's lever) × ADC
    // shortlist quality (trained 256-codeword × m=16 subspace
    // codebooks) — then the refine=3 exact re-rank recovers most of
    // the quantizer's loss (0.74 unrefined → 0.98 measured). The gate
    // pins the refined level with headroom for codebook tweaks, not
    // for losing the refine step or the trained codebooks.
    info(f"IVF-PQ recall@10 = $recall%.2f")
    assert(recall >= 0.93, s"IVF-PQ recall@10 regressed: $recall (measured 0.98)")
  }

  test("residual IVF-PQ compressed-domain recall@10 clears the gate") {
    val brute = neighbors("s01_ann_brute")
    val res = toSets(R.ivfPqResidual(embN))
    val per = brute.keys.toSeq.map(q =>
      (res.getOrElse(q, Set.empty) intersect brute(q)).size.toDouble / brute(q).size)
    val recall = per.sum / per.size
    // s13 runs refine=1 deliberately: this measures RESIDUAL coding's
    // compressed-domain rank quality alone. Measured 0.68 here —
    // probing ALL lists gives the same number, so coverage is not the
    // limit; on this near-uniform synthetic corpus residuals carry as
    // much energy as raw vectors and coding quality matches raw-PQ
    // (0.74) rather than beating it. Residual's win needs real
    // cluster structure; the gate pins today's level so a coding
    // regression (e.g. reintroducing the dropped-|q−c|² cross-list
    // bias this spec's history caught) fails loudly.
    info(f"residual IVF-PQ compressed recall@10 = $recall%.2f")
    assert(recall >= 0.63, s"residual IVF-PQ recall@10 regressed: $recall (measured 0.68)")
  }
}

/** The round-9 known-limit closure: residual coding's win over raw-PQ
  * needs real cluster structure, which the near-uniform synthetic
  * embeddings cannot show (s13's gate sits at 0.60 there, level with
  * raw PQ). This spec builds a deterministic CLUSTERED corpus — the
  * shape a deduplicated web-embedding space actually has — and pins
  * the claim from Jégou 2011 §IV-A directly: with energy concentrated
  * in coarse centroids, the same m × ksub budget quantizes residuals
  * finer than raw vectors, so compressed-domain recall must be both
  * high in absolute terms and strictly above the raw-PQ rank.
  */
class ClusteredResidualRecallSpec extends graft.SparkSpec {
  import graft.operators.Similarity
  import org.apache.spark.sql.functions._

  private val dim = 64
  private val nClusters = 16
  private val perCluster = 50

  /** Seeded directional clusters on the unit sphere: centroid
    * directions ~N(0,1)^64, members = centroid + N(0, 0.3²) noise,
    * L2-normalized (the FAISS cosine recipe the s12/s13 entries use).
    * Deterministic — same corpus every run, so the gates are exact.
    * The 0.3 noise scale sits in residual coding's regime: tighter
    * and BOTH coders hit the near-tie rank floor (top-10 gaps below
    * quantization precision), looser and the clusters dissolve into
    * the near-uniform case where s13 already showed parity.
    */
  private lazy val corpus = {
    import spark.implicits._
    val rnd = new scala.util.Random(421)
    val cents = Array.fill(nClusters, dim)(rnd.nextGaussian())
    (0 until nClusters * perCluster).map { i =>
      val c = cents(i % nClusters)
      val v = Array.tabulate(dim)(j => c(j) + rnd.nextGaussian() * 0.3)
      val n = math.sqrt(v.map(x => x * x).sum)
      (i.toLong, v.map(_ / n).toSeq)
    }.toDF("vec_id", "embedding")
  }

  private def neighbors(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  private def recallOf(got: Map[Long, Set[Long]],
                       brute: Map[Long, Set[Long]]): Double = {
    val per = brute.keys.toSeq.map(q =>
      (got.getOrElse(q, Set.empty) intersect brute(q)).size.toDouble / brute(q).size)
    per.sum / per.size
  }

  test("residual IVF-PQ beats raw-PQ compressed-domain recall on clustered data") {
    val c = corpus.persist()
    try {
      val q = c.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val brute = neighbors(
        Similarity.bruteTopK(c, "vec_id", "embedding", q, "qid", "qvec", k = 10))
      // raw-vector PQ through the same IVF frame, refine=1: the
      // compressed-domain rank quality of coding v directly
      val cb = Similarity.trainPqCodebook(c, "vec_id", "embedding",
        m = 16, ksub = 256, iters = 2)
      val raw = recallOf(neighbors(Similarity.ivfPqTopK(
        c, "vec_id", "embedding", q, "qid", "qvec", cb, "code", "codeword",
        m = 16, k = 10, nlist = 16, nprobe = 12, refineIters = 4)), brute)
      // residual coding, same m/ksub/nlist/nprobe budget, refine=1
      val res = recallOf(neighbors(Similarity.ivfPqResidualTopK(
        c, "vec_id", "embedding", q, "qid", "qvec",
        m = 16, k = 10, ksub = 256, nlist = 16, nprobe = 12,
        refineIters = 4, pqIters = 4)), brute)
      info(f"clustered corpus: raw-PQ recall@10 = $raw%.2f, residual = $res%.2f")
      // measured (deterministic): raw-PQ 0.66, residual 0.80 —
      // residual coding's win appears exactly where Jégou 2011
      // predicts, and probing all 16 lists does not move it (verified
      // during calibration), so the gap is coding precision, not
      // coverage. The gates pin the WIN (margin) and the LEVEL with
      // small headroom for k-means/seed tweaks — losing the residual
      // encode collapses res to raw's level and fails both.
      assert(res >= raw + 0.08,
        f"residual ($res%.2f) no longer clearly beats raw-PQ ($raw%.2f)")
      assert(res >= 0.75, f"residual recall@10 regressed on clustered data: $res%.2f")
    } finally { c.unpersist(); () }
  }
}

class CosinePairsLshSpec extends SparkSpec {
  import spark.implicits._

  test("LSH-bucketed cosine pairs find all true near-dups in clusters") {
    // 20 base vectors, each with a tiny-perturbation twin: 20 true
    // near-dup pairs (cos ~ 0.999), plus 40 unrelated dimensions of
    // noise. The operator's regime is high-cosine near-dup detection;
    // there p^planes is ~1 and multi-table recall is ~certain.
    val rnd = new scala.util.Random(11)
    val rows = (0 until 20).flatMap { i =>
      val v = Array.fill(16)(rnd.nextFloat() - 0.5f)
      val twin = v.map(x => x + 0.001f * rnd.nextFloat())
      Seq((i.toLong * 2, v), (i.toLong * 2 + 1, twin))
    }
    val df = rows.toDF("vec_id", "embedding")
    val got = Similarity.cosinePairsLsh(df, "vec_id", "embedding", 0.99)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (0 until 20).map(i => (i.toLong * 2, i.toLong * 2 + 1)).toSet
    assert(got == want, s"missed=${want -- got} extra=${got -- want}")
  }

  test("the portable twin finds the same true near-dups as the seeded form") {
    // same cluster corpus: the md5-plane family must not lose the
    // high-cosine regime the seeded family covers (the oracle already
    // gates EXACTNESS of the portable candidate set; this gates its
    // QUALITY against the seeded production config)
    val rnd = new scala.util.Random(11)
    val rows = (0 until 20).flatMap { i =>
      val v = Array.fill(16)(rnd.nextFloat() - 0.5f)
      val twin = v.map(x => x + 0.001f * rnd.nextFloat())
      Seq((i.toLong * 2, v), (i.toLong * 2 + 1, twin))
    }
    val df = rows.toDF("vec_id", "embedding")
    val got = Similarity.cosinePairsPortable(df, "vec_id", "embedding",
        threshold = 0.99, dims = 16)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (0 until 20).map(i => (i.toLong * 2, i.toLong * 2 + 1)).toSet
    assert(got == want, s"missed=${want -- got} extra=${got -- want}")
  }

  test("maxBucket prunes a degenerate bucket before the self-join") {
    val rnd = new scala.util.Random(7)
    // 50 IDENTICAL vectors: every table puts them in one bucket of 50
    // (1225 candidate pairs of pure boilerplate) — plus one genuine
    // near-dup twin pair on a different direction
    val boiler = Array.fill(16)(1.0f)
    val v = Array.fill(16)(rnd.nextFloat() - 0.5f)
    val twin = v.map(x => x + 0.001f * rnd.nextFloat())
    val rows = (0 until 50).map(i => (100L + i, boiler)) ++
      Seq((0L, v), (1L, twin))
    val df = rows.toDF("vec_id", "embedding")
    val capped = Similarity.cosinePairsLsh(df, "vec_id", "embedding", 0.99,
        maxBucket = Some(10))
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the degenerate bucket is gone, the honest pair survives
    assert(capped == Set((0L, 1L)), capped.toString)
    // uncapped control: the boilerplate pairs are all there
    val uncapped = Similarity.cosinePairsLsh(df, "vec_id", "embedding", 0.99).count()
    assert(uncapped == 1225L + 1L, uncapped.toString)
  }
}

class ProductQuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("each subvector codes to its nearest codeword") {
    // 4 dims, m=2: subspace 0 = first two dims, subspace 1 = last two.
    // codeword 0 = (1,0 | 0,1), codeword 1 = (0,1 | 1,0)
    val cb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 1.0f)),
      (1L, Array(0.0f, 1.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val vecs = Seq(
      (10L, Array(0.9f, 0.1f, 0.9f, 0.1f)),  // sub0 -> 0, sub1 -> 1
      (11L, Array(0.1f, 0.9f, 0.1f, 0.9f))   // sub0 -> 1, sub1 -> 0
    ).toDF("vec_id", "embedding")
    val got = Similarity.productQuantize(vecs, "vec_id", "embedding",
        cb, "vec_id", "embedding", m = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((10L, 0L, 0L), (10L, 1L, 1L),
      (11L, 0L, 1L), (11L, 1L, 0L)), got.toString)
  }

  test("ties break on the lower code id") {
    val cb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 0.0f)), // identical codewords
      (2L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val vecs = Seq((10L, Array(0.9f, 0.2f))).toDF("vec_id", "embedding")
    val got = Similarity.productQuantize(vecs, "vec_id", "embedding",
        cb, "vec_id", "embedding", m = 1)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((0L, 0L)), got.toString)
  }

  test("a ragged codebook is rejected, not silently misaligned") {
    val cb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val vecs = Seq((10L, Array(0.9f, 0.1f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val ex = intercept[IllegalArgumentException] {
      Similarity.productQuantize(vecs, "vec_id", "embedding",
        cb, "vec_id", "embedding", m = 2)
    }
    assert(ex.getMessage.contains("ragged codebook"), ex.getMessage)
  }

  test("a short dirty vector codes from its own elements only (no buffer over-read)") {
    val cb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    // 2 elements where the codebook expects 4: missing dims read as 0
    val vecs = Seq((10L, Array(0.9f, 0.1f))).toDF("vec_id", "embedding")
    val got = Similarity.productQuantize(vecs, "vec_id", "embedding",
        cb, "vec_id", "embedding", m = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    // sub0 sees (0.9, 0.1) -> codeword 0's (1,0); sub1 reads nothing
    // (dot 0 for both) so the smaller-|c|^2 codeword 0 wins
    assert(got == Set((0L, 0L), (1L, 0L)), got.toString)
  }

  test("coding is one narrow pass: no join, no window, no aggregate") {
    import org.apache.spark.sql.execution.ExplainMode
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val df = Similarity.productQuantize(emb, "vec_id", "embedding",
      emb.filter(col("vec_id") < 16), "vec_id", "embedding", 8)
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("Join") && !p.contains("Window") &&
      !p.contains("HashAggregate"), p)
    assert(!p.contains("Exchange"), p)
  }
}

class PqAdcSpec extends SparkSpec {
  import spark.implicits._

  test("when corpus vectors ARE codewords, ADC distance is exact L2 rank") {
    // corpus = the codebook itself: quantization is lossless, so ADC
    // top-k must equal the true nearest-codeword order
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 1.0f, 1.0f))).toDF("vec_id", "embedding")
    val q = Seq((100L, Array(0.9f, 0.1f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = Similarity.pqAdcTopK(vecs, "vec_id", "embedding",
        q, "vec_id", "embedding", vecs, "vec_id", "embedding", m = 2, k = 3)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(got == Seq(0L, 1L, 2L), got.toString)
  }

  test("recall@10 vs brute force clears the gate on the real corpus") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val brute = Similarity.bruteTopK(emb, "vec_id", "embedding",
        q, "qid", "qvec", 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val adc = Similarity.pqAdcTopK(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < 5), "vec_id", "embedding",
        emb.filter(col("vec_id") < 16), "vec_id", "embedding", m = 8, k = 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & adc).size.toDouble / brute.size
    // 16 codewords over 64 dims is a deliberately crude quantizer;
    // the gate pins "clearly better than chance", refined-codebook
    // accuracy is the caller's lever (bigger K, trained codebooks)
    assert(recall >= 0.30, f"ADC recall@10 = $recall%.2f")
  }
}

class IvfPqSpec extends SparkSpec {
  private val emb = () =>
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "neighbor_id", "adc_dist", "rank")
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet

  test("probing every list reproduces the full ADC scan exactly") {
    val e = emb()
    val q = e.filter(col("vec_id") < 5)
    val cb = e.filter(col("vec_id") < 16)
    val full = rows(Similarity.pqAdcTopK(e, "vec_id", "embedding",
      q, "vec_id", "embedding", cb, "vec_id", "embedding", m = 8, k = 10))
    val ivfpq = rows(Similarity.ivfPqTopK(e, "vec_id", "embedding",
      q, "vec_id", "embedding", cb, "vec_id", "embedding",
      m = 8, k = 10, nlist = 4, nprobe = 4))
    // nprobe = nlist: every candidate survives the coarse filter, so
    // the compressed-domain rank must agree bit-for-bit with s11's
    assert(ivfpq == full,
      s"missing=${(full -- ivfpq).take(5)} extra=${(ivfpq -- full).take(5)}")
  }

  test("probe-all + corpus-sized refine shortlist degenerates to exact brute force") {
    val e = emb()
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val brute = Similarity.bruteTopK(e, "vec_id", "embedding", q, "qid", "qvec", 10)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    // nprobe = nlist covers every candidate; refine = 50 makes the ADC
    // shortlist corpus-sized (500); the exact re-rank then IS brute
    // force — same cosines, same ranks, same tie-breaks
    val refined = Similarity.ivfPqTopK(e, "vec_id", "embedding",
        e.filter(col("vec_id") < 5), "vec_id", "embedding",
        e.filter(col("vec_id") < 16), "vec_id", "embedding",
        m = 8, k = 10, nlist = 4, nprobe = 4, refine = 50)
      .select("query_id", "neighbor_id", "cos", "rank")
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(refined == brute,
      s"missing=${(brute -- refined).take(5)} extra=${(refined -- brute).take(5)}")
  }

  test("residual variant: probe-all + corpus-sized refine shortlist is brute force too") {
    val e = emb()
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val brute = Similarity.bruteTopK(e, "vec_id", "embedding", q, "qid", "qvec", 10)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val refined = Similarity.ivfPqResidualTopK(e, "vec_id", "embedding",
        e.filter(col("vec_id") < 5), "vec_id", "embedding",
        m = 8, k = 10, ksub = 64, nlist = 4, nprobe = 4, refine = 50)
      .select("query_id", "neighbor_id", "cos", "rank")
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(refined == brute,
      s"missing=${(brute -- refined).take(5)} extra=${(refined -- brute).take(5)}")
  }

  test("residual candidates stay within the probed lists (nprobe=1 on clustered data)") {
    // 3 well-separated axis clusters; with nprobe=1 a query's
    // candidates can only come from its own cluster — this also pins
    // the driver-side probe against the distributed assignment (a
    // probe-parity bug would let foreign-cluster neighbors through)
    val rnd = new scala.util.Random(7)
    val corpus = (0 until 90).map { i =>
      val axis = i % 3
      val base = Array.fill(8)(0.05f * rnd.nextFloat())
      base(axis) = 1.0f + 0.05f * rnd.nextFloat()
      (i.toLong, base)
    }
    val s = spark
    import s.implicits._
    val df = corpus.toDF("vec_id", "embedding")
    val out = Similarity.ivfPqResidualTopK(df, "vec_id", "embedding",
        df.filter(col("vec_id") < 3), "vec_id", "embedding",
        m = 4, k = 5, ksub = 32, nlist = 3, nprobe = 1, refineIters = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.nonEmpty)
    out.foreach { case (qid, nid) =>
      assert(nid % 3 == qid % 3, s"query $qid got foreign-cluster neighbor $nid")
    }
  }

  test("spilled replication never double-counts a candidate's ADC sum") {
    val e = emb()
    val q = e.filter(col("vec_id") < 5)
    val cb = e.filter(col("vec_id") < 16)
    val full = rows(Similarity.pqAdcTopK(e, "vec_id", "embedding",
      q, "vec_id", "embedding", cb, "vec_id", "embedding", m = 8, k = 10))
    // spill = 3 of 4 lists: most pairs meet in several lists — any
    // duplicate candidate row would triple its codes into the sum and
    // push adc_dist off the full-scan value
    val spilled = rows(Similarity.ivfPqTopK(e, "vec_id", "embedding",
      q, "vec_id", "embedding", cb, "vec_id", "embedding",
      m = 8, k = 10, nlist = 4, nprobe = 4, spill = 3))
    assert(spilled == full,
      s"missing=${(full -- spilled).take(5)} extra=${(spilled -- full).take(5)}")
  }
}

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated directions (axes 0 and 1) with near-dup twins
  // around each, plus one lone vector near axis 0 but below threshold
  private def corpus() = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),   // centroid A
    (1L, Array(0.0f, 1.0f, 0.0f, 0.0f)),   // centroid B
    (10L, Array(0.99f, 0.01f, 0.0f, 0.0f)), // dup of 0 in cluster A
    (11L, Array(0.98f, 0.02f, 0.0f, 0.0f)), // dup of 0/10 in cluster A
    (20L, Array(0.02f, 0.99f, 0.0f, 0.0f)), // dup of 1 in cluster B
    (30L, Array(0.6f, 0.0f, 0.8f, 0.0f))    // cluster A, cos 0.6 to axis: kept
  ).toDF("vec_id", "embedding")

  test("one representative per semantic ball survives, per cluster") {
    val cents = corpus().filter(col("vec_id") < 2)
    val kept = Similarity.semDedup(corpus(), "vec_id", "embedding",
        cents, "vec_id", "embedding", threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // balls: {0,10,11} -> keep 0; {1,20} -> keep 1; 30 alone -> kept
    assert(kept == Set((0L, 0L), (1L, 1L), (30L, 0L)), kept.toString)
  }

  test("the pair scan never crosses clusters") {
    // 10 and 20 have cos ~0 so they'd never pair anyway; instead plant
    // two near-identical vectors that land in DIFFERENT clusters: the
    // cluster bound (SemDeDup's approximation) must keep both
    val df = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (40L, Array(0.71f, 0.70f, 0.0f, 0.0f)),  // barely cluster A
      (41L, Array(0.70f, 0.71f, 0.0f, 0.0f))   // barely cluster B
    ).toDF("vec_id", "embedding")
    val kept = Similarity.semDedup(df, "vec_id", "embedding",
        df.filter(col("vec_id") < 2), "vec_id", "embedding", threshold = 0.9)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 1L, 40L, 41L), kept.toString)
  }

  test("assignment is one narrow pass: no exchange before the cluster shuffle") {
    import org.apache.spark.sql.execution.ExplainMode
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val df = Similarity.semDedup(emb, "vec_id", "embedding",
      emb.filter(col("vec_id") < 8), "vec_id", "embedding", 0.35)
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    // centroids ride as literals: no join or window in the assignment,
    // so the plan's joins are exactly the pair join + the anti join
    assert(!p.contains("Window"), p)
  }

  test("the broadcast fallback (K > 128) assigns the same clusters as the literal math") {
    // 130 centroids forces the broadcast + per-id argmin path; verify
    // its assignments against a driver-side replica of the contract
    // (round-6 cosine argmax, lowest-centroid-id tie-break)
    val rnd = new scala.util.Random(3)
    def vec() = Array.fill(8)(rnd.nextFloat() - 0.5f)
    val cents = (0L until 130L).map(i => (i, vec()))
    val corpus = (1000L until 1100L).map(i => (i, vec()))
    val centsDf = cents.toDF("vec_id", "embedding")
    val corpusDf = corpus.toDF("vec_id", "embedding")
    val got = Similarity.semDedup(corpusDf, "vec_id", "embedding",
        centsDf, "vec_id", "embedding", threshold = 2.0) // no dups: pure assignment
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    def l2(v: Array[Double]) = math.sqrt(v.map(x => x * x).sum)
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val want = corpus.map { case (id, v) =>
      val vd = v.map(_.toDouble)
      id -> cents.map { case (cid, cw) =>
        val cd = cw.map(_.toDouble)
        val cos = vd.zip(cd).map { case (a, b) => a * b }.sum / (l2(vd) * l2(cd))
        (-r6(cos), cid)
      }.min._2
    }.toMap
    assert(got == want,
      (got.toSet -- want.toSet).take(5).toString + " vs " +
        (want.toSet -- got.toSet).take(5).toString)

    // a duplicated id stays two rows (grouping is per ROW, not per id
    // — merging them would argmin over both vectors' cosines)
    val dupDf = (corpus :+ (1050L, vec())).toDF("vec_id", "embedding")
    val n = Similarity.semDedup(dupDf, "vec_id", "embedding",
      centsDf, "vec_id", "embedding", threshold = 2.0).count()
    assert(n == 101L, n.toString)
  }
}

/** r17 driver-visible gate surface for the seeded-ANN keys: each
  * query now emits oracle-expressible counts plus a pinned-true gate
  * boolean (the q22/q25 pattern). This pins the SHAPE and the gate
  * values at sf0.001 so a drift shows up here before the driver run;
  * the underlying ranking quality keeps its tighter gates in
  * AnnRecallSpec.
  */
class AnnDriverGateSpec extends graft.SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def run(q: String) = graft.SparkEntry.queries(q)(spark, dir)

  test("s02/s03/s12/s13 emit 5 per-query rows with true recall gates") {
    for ((key, gate) <- Seq(
        ("s02_ann_lsh", "recall_ge_080"), ("s03_ann_ivf", "recall_ge_090"),
        ("s12_ivf_pq", "recall_ge_080"),
        ("s13_ivf_pq_residual", "recall_ge_050"))) {
      val rows = run(key).collect()
      assert(rows.length == 5, s"$key: ${rows.length} rows")
      assert(rows.forall(_.getAs[Long]("n_exact") == 10L), s"$key n_exact")
      assert(rows.forall(_.getAs[Boolean](gate)), s"$key $gate tripped")
    }
  }

  test("s26 store-served equals end-to-end per query") {
    val rows = run("s26_ann_index").collect()
    assert(rows.length == 5, rows.length.toString)
    assert(rows.forall(_.getAs[Long]("n_served") == 10L), "n_served")
    assert(rows.forall(_.getAs[Boolean]("store_equals_e2e")), "equality gate")
  }

  test("s06 coverage report: one row, gate true, nonempty slice truth") {
    val rows = run("s06_cosine_pairs_lsh").collect()
    assert(rows.length == 1, rows.length.toString)
    assert(rows.head.getAs[Long]("n_exact_slice") > 0L, "empty exact slice")
    assert(rows.head.getAs[Boolean]("coverage_ge_040"), "coverage gate tripped")
  }
}
