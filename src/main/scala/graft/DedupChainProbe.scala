package graft
import org.apache.spark.sql.functions._

/** END-TO-END dedup chain scale probe (r16 verdict task 2 — the
  * headline 100 TB claim): shingle → minhash banding → candidates →
  * jaccard verify → connected components → keeper resolve, timed per
  * stage at each given dir, with the star-alternation rounds LOGGED
  * via the connectedComponents onRound hook.
  *
  * Two corpora decompose the claim (the r15 Gen10x lesson — dup mode
  * conflates output mass with scan cost):
  *  - unique-mode copies=100: pair mass grows ~linearly with docs, so
  *    the per-DOC cost of the signature/banding scan path is the
  *    reading;
  *  - dup-mode copies=100: every doc gains 99 exact duplicates →
  *    ~C(100,2)·clusters candidate pairs (>2^20 REAL pairs), forcing
  *    the distributed large-star/small-star CC path at real mass —
  *    wall here is pair-mass-dominated BY CONSTRUCTION; the gates are
  *    convergence in O(log n) logged rounds and per-PAIR cost.
  *
  * Usage: runMain graft.DedupChainProbe <dir> [dir ...]
  * (run Gen10x first to build the stretched corpora)
  */
object DedupChainProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: DedupChainProbe <dir> [dir ...]")
    val spark = GraftSession.get(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup
    for (dir <- args) {
      println(s"[chain] === $dir ===")
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text")).persist()
      val nDocs = docs.count()
      def t[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"[chain] $label%-18s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
        r
      }
      val total0 = System.nanoTime()
      // stage 1-3: signatures -> banding -> candidate verify (the d02
      // production parameters)
      val pairs = Dedup.minHashLsh(docs, "doc_id", "text",
        shingleN = 3, numHashes = 32, bands = 8, threshold = 0.5)
      val nPairs = t("pairs_verify")(pairs.count())
      // stage 4: connected components; >2^20 pairs takes the
      // distributed star path, rounds logged
      val comp = Dedup.connectedComponents(pairs,
        onRound = (i, edges) => println(f"[chain]   star round $i: $edges%d edges"))
      val nNodes = t("connected_comp")(comp.count())
      // stage 5: keeper resolve — min id per component survives
      val survivors = t("resolve") {
        val keep = comp.groupBy(col("component")).agg(min(col("id")).as("_k"))
          .select(col("_k").as("doc_id"))
        val dupIds = comp.select(col("id").as("doc_id"))
          .join(keep, Seq("doc_id"), "left_anti")
        docs.join(dupIds, Seq("doc_id"), "left_anti").count()
      }
      val wall = (System.nanoTime() - total0) / 1e9
      println(f"[chain] TOTAL $wall%.2fs docs=$nDocs pairs=$nPairs " +
        f"nodes_in_pairs=$nNodes survivors=$survivors " +
        f"per_doc_ms=${wall * 1000 / nDocs}%.3f" +
        (if (nPairs > 0) f" per_pair_us=${wall * 1e6 / nPairs}%.1f" else ""))
      comp.unpersist(); docs.unpersist()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
    }
    spark.stop()
  }
}
