package graft
import org.apache.spark.sql.functions._

/** Dev tool: measure ANN recall (LSH/IVF vs brute force) and MinHash
  * LSH dedup parity (banded+verified pairs vs exhaustive jaccard) at
  * the given scale-factor dirs — the quality gates of the unit specs,
  * re-run at whatever scale the data allows. Usage:
  * runMain graft.RecallProbe [sfDir ...]
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    val s = GraftSession.get(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    for (sf <- dirs) {
      def res(df: org.apache.spark.sql.DataFrame) = df
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      // the s02/s03 query keys emit gate reports since r17; the probe
      // measures the underlying rankings via SparkEntry.AnnRankings —
      // the same parameter block the shipped gates use
      val emb = SparkEntry.AnnRankings.emb(s, sf)
      val brute = res(SparkEntry.AnnRankings.brute(emb))
      val lsh = res(SparkEntry.AnnRankings.lsh(emb))
      val ivf = res(SparkEntry.AnnRankings.ivf(emb))
      def recall(m: Map[Long, Set[Long]]) = {
        val per = brute.keys.toSeq.map(q => (m.getOrElse(q, Set.empty) intersect brute(q)).size.toDouble / brute(q).size)
        per.sum / per.size
      }
      println(f"RECALL sf=$sf lsh=${recall(lsh)}%.3f ivf=${recall(ivf)}%.3f nvec=${s.read.parquet(s"$sf/embeddings.parquet").count()}")

      // minhash dedup parity: the banded pipeline must find EXACTLY the
      // exhaustive jaccard>=0.5 pairs (recall via banding, precision via
      // the verify step) — the same gate as MinHashRecallSpec, full corpus
      import graft.operators.Dedup
      val docs = s.read.parquet(s"$sf/documents.parquet")
      def pairSet(df: org.apache.spark.sql.DataFrame) =
        df.select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = pairSet(Dedup.jaccardPairs(Dedup.shingles(docs, "doc_id", "text", 3), 0.5))
      val banded = pairSet(Dedup.minHashLsh(docs, "doc_id", "text",
        shingleN = 3, numHashes = 32, bands = 8, threshold = 0.5))
      println(s"MINHASH sf=$sf exhaustive=${exact.size} lsh=${banded.size} " +
        s"missed=${(exact -- banded).size} spurious=${(banded -- exact).size} " +
        s"parity=${exact == banded}")

      // simhash completeness: pigeonhole banding must equal the
      // exhaustive hamming<=3 pair set (SimHashCompletenessSpec's gate,
      // full corpus). The exhaustive side is O(n^2/2) popcounts — past
      // 10k docs the check runs on a deterministic ~4k-doc sample. A
      // sampled pass is a SPOT CHECK (a violation between a kept and a
      // dropped doc is invisible), not a full-corpus proof; the
      // structural guarantee is the pigeonhole argument itself, proved
      // full-corpus by the spec at <=10k docs.
      val nDocs = docs.count()
      val (simDocs, simTag) =
        if (nDocs <= 10000) (docs, "full")
        else {
          val keep1In = math.max(1L, nDocs / 4000L)
          (docs.filter(pmod(xxhash64(col("doc_id")), lit(keep1In)) === 0),
            s"sampled-1/$keep1In")
        }
      val sig = Dedup.simHash(simDocs, "doc_id", "text").persist()
      val viaBands = pairSet(Dedup.simHashPairs(sig, maxDist = 3))
      val a = sig.select(col("id").as("id1"), col("simhash").as("s1"))
      val b = sig.select(col("id").as("id2"), col("simhash").as("s2"))
      val exhaustive = pairSet(a.join(b, col("id1") < col("id2"))
        .filter(bit_count(col("s1").bitwiseXOR(col("s2"))) <= 3))
      sig.unpersist()
      println(s"SIMHASH sf=$sf ($simTag) exhaustive=${exhaustive.size} " +
        s"banded=${viaBands.size} parity=${exhaustive == viaBands}" +
        (if (simTag != "full") " (sampled spot-check, not a full-corpus proof)" else ""))
    }
    s.stop()
  }
}
