package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

/** Round-7 curation operators: boilerplate line removal, unigram-LM
  * quality scoring, URL canonicalization, cross-corpus near-dedup.
  */
class StripRepeatedLinesSpec extends SparkSpec {
  import spark.implicits._

  test("lines in >= minDocs docs are stripped; unique lines survive in order") {
    val docs = (1L to 10L).map(i =>
      (i, s"shared banner\nbody of doc $i\nunique tail $i")).toDF("id", "text")
    val out = TextStats.stripRepeatedLines(docs, "id", "text", minDocs = 5L)
      .orderBy("id").collect()
    assert(out.length == 10)
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) == s"body of doc $id\nunique tail $id")
      assert(r.getLong(2) == 2L && r.getLong(3) == 1L) // kept 2, dropped 1
    }
  }

  test("a doc that is ALL boilerplate drops out entirely") {
    val docs = ((1L to 6L).map(i => (i, s"same line\nown $i")) :+ (7L, "same line"))
      .toDF("id", "text")
    val out = TextStats.stripRepeatedLines(docs, "id", "text", minDocs = 6L)
    assert(out.filter(col("id") === 7L).count() == 0)
    assert(out.count() == 6)
  }

  test("threshold is DISTINCT docs, not occurrences") {
    // one doc repeats a line 10 times; that is 1 distinct doc, not 10
    val docs = Seq((1L, Seq.fill(10)("echo echo").mkString("\n") + "\nkeep 1"),
      (2L, "other\nkeep 2")).toDF("id", "text")
    val out = TextStats.stripRepeatedLines(docs, "id", "text", minDocs = 2L)
      .orderBy("id").collect()
    assert(out(0).getString(1).linesIterator.count(_ == "echo echo") == 10)
  }
}

class CollapseRepeatRunsSpec extends SparkSpec {
  import spark.implicits._

  test("runs collapse to one line each, order preserved; non-adjacent repeats stay") {
    val docs = Seq(
      (1L, "loading...\nloading...\nloading...\nbody\nbody\ndone"),
      (2L, "a\nb\na"), // non-adjacent repeat is NOT a run — untouched
      (3L, "only line")).toDF("id", "text")
    val out = TextStats.collapseRepeatRuns(docs, "id", "text")
      .orderBy("id").collect()
    assert(out(0).getString(1) == "loading...\nbody\ndone")
    assert(out(0).getLong(2) == 3L && out(0).getLong(3) == 3L)
    assert(out(1).getString(1) == "a\nb\na")
    assert(out(1).getLong(3) == 0L)
    assert(out(2).getString(1) == "only line")
  }

  test("the whole collapse rides ONE id shuffle (window + reassembly co-partitioned)") {
    import org.apache.spark.sql.execution.ExplainMode
    val docs = Seq((1L, "x\nx\ny")).toDF("id", "text")
    val p = TextStats.collapseRepeatRuns(docs, "id", "text")
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(p.split("Exchange hashpartitioning").length - 1 == 1, p)
  }
}

class UnigramLogProbSpec extends SparkSpec {
  import spark.implicits._

  test("scores equal hand-computed unigram log-probs, rare tokens score lower") {
    // corpus: "a" x3, "b" x2, "z" x1 -> total 6
    val docs = Seq((1L, "a a a"), (2L, "b b z")).toDF("id", "text")
    val out = TextStats.unigramLogProb(docs, "id", "text")
      .orderBy("id").collect()
    def lp(n: Int) = BigDecimal(math.log(n / 6.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val exp1 = ((lp(3) * 3) / 3).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val exp2 = ((lp(2) * 2 + lp(1)) / 3).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    assert(out(0).getLong(1) == 3L && out(1).getLong(1) == 3L)
    assert(math.abs(out(0).getDouble(2) - exp1.toDouble) < 1e-9, out(0).toString)
    assert(math.abs(out(1).getDouble(2) - exp2.toDouble) < 1e-9, out(1).toString)
    assert(out(1).getDouble(2) < out(0).getDouble(2)) // rare tokens -> lower score
  }

  test("deterministic under repartitioning (decimal-summed mean)") {
    val docs = (1L to 50L).map(i => (i, s"tok$i common common word$i"))
      .toDF("id", "text")
    val a = TextStats.unigramLogProb(docs.repartition(1), "id", "text")
      .orderBy("id").collect().toSeq
    val b = TextStats.unigramLogProb(docs.repartition(17), "id", "text")
      .orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("head/residual join split leaves every score unchanged") {
    // "common" is the Zipf head; tok$i/word$i are the singleton tail.
    // headVocab=1 puts ONLY "common" on the broadcast path and forces
    // every other token through the residual shuffle join — the split
    // is pure plumbing, so scores must be bit-identical to the default
    // (all-head) path
    val docs = (1L to 50L).map(i => (i, s"tok$i common common word$i"))
      .toDF("id", "text")
    val full = TextStats.unigramLogProb(docs, "id", "text")
      .orderBy("id").collect().toSeq
    val split = TextStats.unigramLogProb(docs, "id", "text", headVocab = 1)
      .orderBy("id").collect().toSeq
    assert(split == full)
    // plan gate: the head path must be a broadcast join (the exploded
    // token stream never shuffles for the Zipf head)
    val plan = TextStats.unigramLogProb(docs, "id", "text", headVocab = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}

class BigramLogProbSpec extends SparkSpec {
  import spark.implicits._

  test("scores equal hand-computed conditional log-probs; word salad scores lower") {
    // doc 1 "a b a b" -> pairs (a,b),(b,a),(a,b); doc 2 "b b a" ->
    // pairs (b,b),(b,a). Corpus counts: c(a,b)=2, c(b,a)=2, c(b,b)=1;
    // prefixes c(a·)=2, c(b·)=3.
    val docs = Seq((1L, "a b a b"), (2L, "b b a")).toDF("id", "text")
    val out = TextStats.bigramLogProb(docs, "id", "text")
      .orderBy("id").collect()
    def lp(nb: Int, np: Int) = BigDecimal(math.log(nb.toDouble / np))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    // c(a,b)=2 c(b,a)=2 c(b,b)=1; c(a·)=2 c(b·)=3
    val exp1 = ((lp(2, 2) * 2 + lp(2, 3)) / 3).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val exp2 = ((lp(1, 3) + lp(2, 3)) / 2).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    assert(out(0).getLong(1) == 3L && out(1).getLong(1) == 2L)
    assert(math.abs(out(0).getDouble(2) - exp1.toDouble) < 1e-9, out(0).toString)
    assert(math.abs(out(1).getDouble(2) - exp2.toDouble) < 1e-9, out(1).toString)
    // the rarer-transition doc scores lower
    assert(out(1).getDouble(2) < out(0).getDouble(2))
  }

  test("single-token and empty docs drop out (no bigram evidence); split path identical") {
    // prefixes: "common" (the Zipf head, 2 pairs per doc) AND the
    // singleton "mid$i" prefixes — with headVocab=1 the mid$i-prefixed
    // pairs MUST take the residual join, so a bug there moves scores
    // (a corpus whose every prefix is the head would test nothing)
    val docs = ((1L to 20L).map(i => (i, s"common mid$i common end")) ++
      Seq((21L, "solo"), (22L, " "))).toDF("id", "text")
    val full = TextStats.bigramLogProb(docs, "id", "text")
      .orderBy("id").collect().toSeq
    assert(full.map(_.getLong(0)) == (1L to 20L))
    val split = TextStats.bigramLogProb(docs, "id", "text", headVocab = 1)
      .orderBy("id").collect().toSeq
    assert(split == full)
  }
}

class TokenEntropySpec extends SparkSpec {
  import spark.implicits._

  test("uniform tokens give ln(k); repetition lowers entropy; top-frac blind spot caught") {
    val docs = Seq(
      (1L, "a b c d"),          // 4 distinct, uniform -> ln(4)
      (2L, "a a a a"),          // one token -> 0
      (3L, "a b a b a b a b"),  // even 2-cycle: top_frac = 0.5 (passes
                                // a 0.5 gate) but entropy = ln(2)
      (4L, "a a a b"))          // skewed -> between 0 and ln(2)
      .toDF("id", "text")
    val out = TextStats.tokenEntropy(docs, "id", "text")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out(0)._2 == 4L && math.abs(out(0)._3 - math.log(4)) < 1e-5, out(0).toString)
    assert(out(1)._3 == 0.0)
    assert(math.abs(out(2)._3 - math.log(2)) < 1e-5)
    assert(out(3)._3 > 0.0 && out(3)._3 < math.log(2) + 1e-9)
  }

  test("deterministic under repartitioning (decimal-summed terms)") {
    val docs = (1L to 60L).map(i => (i, s"x y z tok$i tok$i")).toDF("id", "text")
    val a = TextStats.tokenEntropy(docs.repartition(1), "id", "text")
      .orderBy("id").collect().toSeq
    val b = TextStats.tokenEntropy(docs.repartition(19), "id", "text")
      .orderBy("id").collect().toSeq
    assert(a == b)
  }
}

class CanonicalizeUrlSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toSeq.toDF("url")
      .select(TextFunctions.canonicalizeUrl(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq

  test("case, www, default port, trailing slash, tracking params, fragment") {
    assert(canon(
      "HTTP://WWW.Example.COM:80/A/B/?utm_source=x&q=1#frag",
      "http://example.com/A/B?q=1",
      "HTTPS://example.com:443/",
      "https://example.com",
      "https://Example.com:8443/p/?fbclid=abc&gclid&x=2"
    ) == Seq(
      "http://example.com/A/B?q=1",
      "http://example.com/A/B?q=1",
      "https://example.com",
      "https://example.com",
      "https://example.com:8443/p?x=2" // non-default port kept
    ))
  }

  test("params other than tracking keep their original order") {
    assert(canon("http://h/p?b=2&utm_campaign=c&a=1") == Seq("http://h/p?b=2&a=1"))
  }

  test("a '?' inside the fragment is not a query string") {
    // SPA-style fragment routes: everything after '#' is discarded,
    // and must NOT be mistaken for (or collapsed with) a real query
    assert(canon(
      "http://example.com/page#frag?x=1",
      "http://example.com/page",
      "http://example.com/page?x=1"
    ) == Seq(
      "http://example.com/page",
      "http://example.com/page",
      "http://example.com/page?x=1"
    ))
  }
}

class SourceQuotaSpec extends SparkSpec {
  import spark.implicits._

  test("caps each source at maxPerSource, md5-ordered, reproducible") {
    val docs = ((1L to 100L).map(i => (i, "big")) ++ (101L to 110L).map(i => (i, "small")))
      .toDF("doc_id", "source")
    val kept = Training.sourceQuota(docs, "source", "doc_id", 25L)
    val counts = kept.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(counts == Map("big" -> 25L, "small" -> 10L)) // under-cap source untouched
    // the SAME 25 every run: md5 order, not arrival/partition order
    val a = kept.select("doc_id").as[Long].collect().toSet
    val b = Training.sourceQuota(docs.repartition(13), "source", "doc_id", 25L)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
  }

  test("a mega-source's global rank window ingests <= saltBuckets*cap rows, result unchanged") {
    import org.apache.spark.sql.expressions.Window
    // one 20k-row mega source next to a 10-row one: the skew case the
    // two-phase salted top-K exists for
    val docs = ((1L to 20000L).map(i => (i, "mega")) ++
      (90001L to 90010L).map(i => (i, "small"))).toDF("doc_id", "source")
    val cap = 7L
    val buckets = 8
    val kept = Training.sourceQuota(docs, "source", "doc_id", cap, buckets)
    // exactness: bit-identical to the one-window definition
    val ref = docs.withColumn("_r", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))))
      .filter(col("_r") <= cap).drop("_r")
    assert(kept.select("doc_id").as[Long].collect().toSet ==
      ref.select("doc_id").as[Long].collect().toSet)
    assert(kept.groupBy("source").count().as[(String, Long)].collect().toMap ==
      Map("mega" -> cap, "small" -> cap))
    // what phase 2 ingests — phase 1's survivors — is bounded by
    // saltBuckets × cap per source no matter how big the source is
    val phase1 = docs.withColumn("_qr1", row_number().over(
        Window.partitionBy(col("source"), pmod(xxhash64(col("doc_id")), lit(buckets)))
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))))
      .filter(col("_qr1") <= cap)
    val survivors = phase1.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(survivors("mega") <= buckets * cap, survivors.toString)
    // plan gate: two window stages; phase 1's exchange partitions on
    // (source, salt) — TWO keys — so a mega-source spreads over
    // saltBuckets tasks (the salt expression itself constant-folds
    // into the scan for local relations, so match the exchange keys,
    // not the pmod text). Bonus pinned here: Spark inserts partial
    // WindowGroupLimit before BOTH exchanges — map-side top-cap.
    val plan = kept.queryExecution.executedPlan.toString
    assert(plan.split("\\bWindow\\b").length - 1 == 2, plan)
    assert("hashpartitioning\\(source#\\d+, _w0#\\d+L".r
      .findFirstIn(plan).isDefined, plan)
    assert(plan.contains("WindowGroupLimit"), plan)
  }
}

class ParaDedupSpec extends SparkSpec {
  import spark.implicits._

  test("each distinct paragraph survives once, in its (id,pos)-first doc; docs can empty out") {
    val docs = Seq(
      (1L, "shared\n\nbody one\n\nshared"), // intra-doc repeat: later copy dropped
      (2L, "shared\n\nbody two"),           // loses "shared" to doc 1
      (3L, "shared")                        // every para seen earlier -> doc drops out
    ).toDF("id", "text")
    val out = Dedup.paraDedup(docs, "id", "text").orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L), out.mkString(";"))
    assert(out(0).getString(1) == "shared\n\nbody one"
      && out(0).getLong(2) == 2L && out(0).getLong(3) == 1L, out(0).toString)
    assert(out(1).getString(1) == "body two"
      && out(1).getLong(2) == 1L && out(1).getLong(3) == 1L, out(1).toString)
  }

  test("winner choice is (id, pos)-deterministic under repartitioning") {
    val docs = (1L to 60L).map(i =>
      (i, s"boilerplate header\n\nbody $i\n\n${if (i % 3 == 0) "promo" else "note"} block"))
      .toDF("id", "text")
    val a = Dedup.paraDedup(docs.repartition(1), "id", "text")
      .orderBy("id").collect().map(_.toSeq).toSeq
    val b = Dedup.paraDedup(docs.repartition(13), "id", "text")
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(a == b)
    // the shared header lives exactly once, in doc 1
    val kept = a.map(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[String]))
    assert(kept.count(_._2.contains("boilerplate header")) == 1)
    assert(kept.head._1 == 1L && kept.head._2.startsWith("boilerplate header"))
  }
}

class DupSubstringSpansSpec extends SparkSpec {
  import spark.implicits._

  test("spans cover exactly the tokens inside corpus-repeated k-grams, merged") {
    // docs 1/2 share a 5-token prefix: with k=4, grams at starts 0 and
    // 1 repeat -> merged span covers tokens 0..4 (5 tokens) in each.
    // doc 3 is clean. doc 4 repeats its own 4-token phrase twice
    // (intra-doc dup): both occurrences' spans count.
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon one two"),
      (2L, "alpha beta gamma delta epsilon three four"),
      (3L, "nothing here repeats at all ever"),
      (4L, "p q r s filler filler2 p q r s")
    ).toDF("id", "text")
    val out = Dedup.dupSubstringSpans(docs, "id", "text", k = 4)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out(0) == ((1L, 7L, 5L, 0.714286)), out(0).toString)
    assert(out(1) == ((2L, 7L, 5L, 0.714286)), out(1).toString)
    assert(out(2) == ((3L, 6L, 0L, 0.0)), out(2).toString)
    assert(out(3) == ((4L, 10L, 8L, 0.8)), out(3).toString)
  }

  test("docs shorter than k produce no grams and report zero dup") {
    val docs = Seq((1L, "too short"), (2L, "too short")).toDF("id", "text")
    val out = Dedup.dupSubstringSpans(docs, "id", "text", k = 4)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 2L, 0L), (2L, 2L, 0L)), out.mkString(";"))
  }

  test("leading whitespace neither shifts gram windows nor inflates n_toks") {
    // doc 2 = doc 1 with leading newline/spaces: identical token
    // stream, so the whole 4-token doc is one duplicated span in both
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "\n  alpha beta gamma delta")).toDF("id", "text")
    val out = Dedup.dupSubstringSpans(docs, "id", "text", k = 4)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq((1L, 4L, 4L, 1.0), (2L, 4L, 4L, 1.0)),
      out.mkString(";"))
  }
}

class RandomProjectionSpec extends SparkSpec {
  import spark.implicits._

  test("projects to outDims signed sums; deterministic under repartitioning") {
    val vecs = (1L to 40L).map(i =>
      (i, Array.tabulate(8)(d => (i * 31 + d).toFloat / 100f))).toDF("vec_id", "embedding")
    val out = Similarity.randomProjection(vecs, "vec_id", "embedding", 4)
    assert(out.count() == 40 * 4)
    val a = out.orderBy("id", "j").collect().toSeq
    val b = Similarity.randomProjection(vecs.repartition(7), "vec_id", "embedding", 4)
      .orderBy("id", "j").collect().toSeq
    assert(a == b)
  }

  test("matches a hand-computed projection for one vector") {
    val v = Array(1.0f, 2.0f, 4.0f)
    val out = Similarity.randomProjection(
        Seq((1L, v)).toDF("vec_id", "embedding"), "vec_id", "embedding", 2)
      .orderBy("j").collect().map(_.getDouble(2))
    def sgn(i: Int, j: Int): Int = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i:$j".getBytes("UTF-8"))
      val digit = Integer.parseInt(f"${(h(0) >> 4) & 0xf}%x", 16)
      if (digit % 2 == 0) 1 else -1
    }
    val exp = (0 until 2).map(j =>
      (0 until 3).map(i => v(i).toDouble * sgn(i, j)).sum)
    assert(out.zip(exp).forall { case (g, e) => math.abs(g - e) < 1e-6 },
      out.toSeq + " vs " + exp)
  }

  test("SRP preserves cosine structure approximately (near pair stays nearer)") {
    val base = Array.tabulate(32)(d => math.sin(d + 1).toFloat)
    val near = base.clone(); near(0) = near(0) + 0.01f
    val far = Array.tabulate(32)(d => math.cos(3 * d + 2).toFloat)
    val vecs = Seq((1L, base), (2L, near), (3L, far)).toDF("vec_id", "embedding")
    val proj = Similarity.randomProjection(vecs, "vec_id", "embedding", 16)
      .orderBy("id", "j").collect()
      .groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(_.getDouble(2)) }
    def cos(a: Array[Double], b: Array[Double]) = {
      val d = a.zip(b).map(p => p._1 * p._2).sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    assert(cos(proj(1L), proj(2L)) > cos(proj(1L), proj(3L)))
  }
}

class CrossNearDupSpec extends SparkSpec {
  import spark.implicits._

  test("flags incoming docs near an existing doc; never existing-vs-existing") {
    val mk = (extra: String) => s"alpha beta gamma delta epsilon zeta eta theta $extra"
    val existing = Seq((100L, mk("one")), (101L, "totally different words here " +
      "nothing shared with others at all")).toDF("doc_id", "text")
    val incoming = Seq(
      (1L, mk("two")),          // near dup of 100
      (2L, mk("one")),          // exact text of 100's shape
      (3L, "unrelated corpus entry with its own vocabulary set entirely"))
      .toDF("doc_id", "text")
    val out = Dedup.crossNearDupPortable(incoming, existing, "doc_id", "text",
        shingleN = 3, minJaccard = 0.5)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L, 2L), out.mkString(","))
    assert(out.forall(_.getLong(1) == 100L))
    // jaccard of the exact-shape twin is higher than the near dup's
    val j = out.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(j(2L) > j(1L))
  }
}
