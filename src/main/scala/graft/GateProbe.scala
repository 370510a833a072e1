package graft
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft.operators.Similarity

/** Dev tool: measure the quantities behind the r17 driver-visible
  * accuracy gates (the q22 pattern applied to the seeded-ANN keys) at
  * each SF dir — the measurements the pinned thresholds were chosen
  * from, re-runnable whenever the operators or the data change.
  * Runs the underlying OPERATORS at the query keys' exact parameters
  * (the keys themselves emit the gate reports since r17). Prints,
  * per SF:
  *   - s02/s03/s12/s13 micro (pooled) and min per-query recall@10 vs
  *     the brute-force exact ranking on the same preprocessed vectors
  *   - s06 coverage of the exact cosine>=0.45 pair set on the
  *     bounded audit slice (vec_id < 1000, d05's slice)
  *   - s26 store-served == end-to-end ivfPqTopK equality
  * Usage: runMain graft.GateProbe [sfDir ...]
  */
object GateProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val s = GraftSession.get(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    def sets(df: DataFrame): Map[Long, Set[Long]] =
      df.select(col("query_id").cast("long"), col("neighbor_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    for (sf <- dirs) {
      val emb = s.read.parquet(s"$sf/embeddings.parquet")
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val brute = sets(Similarity.bruteTopK(emb, "vec_id", "embedding",
        q, "qid", "qvec", k = 10))
      val embN = emb.withColumn("embedding", transform(col("embedding"),
        x => x.cast("double") / Similarity.norm(col("embedding"))))
      val qN = embN.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val bruteN = sets(Similarity.bruteTopK(embN, "vec_id", "embedding",
        qN, "qid", "qvec", k = 10))
      def rep(name: String, ap: Map[Long, Set[Long]],
              ex: Map[Long, Set[Long]]): String = {
        val per = ex.keys.toSeq.sorted.map(k =>
          (ap.getOrElse(k, Set.empty) intersect ex(k)).size.toDouble / ex(k).size)
        val micro = ex.keys.toSeq.map(k =>
          (ap.getOrElse(k, Set.empty) intersect ex(k)).size).sum.toDouble /
          ex.values.map(_.size).sum
        f"$name micro=$micro%.3f min=${per.min}%.2f per=${per.map(p => f"$p%.1f").mkString(",")}"
      }
      val cb = Similarity.trainPqCodebook(embN, "vec_id", "embedding",
        m = 16, ksub = 256, iters = 2)
      println(s"GATES sf=$sf " + rep("s02_ann_lsh",
        sets(Similarity.lshTopK(emb, "vec_id", "embedding", q, "qid", "qvec",
          k = 10, numPlanes = 6, numTables = 8)), brute))
      println(s"GATES sf=$sf " + rep("s03_ann_ivf",
        sets(Similarity.ivfTopK(emb, "vec_id", "embedding", q, "qid", "qvec",
          k = 10, nlist = 16, nprobe = 8, refineIters = 4, spill = 2)), brute))
      println(s"GATES sf=$sf " + rep("s12_ivf_pq",
        sets(Similarity.ivfPqTopK(embN, "vec_id", "embedding",
          embN.filter(col("vec_id") < 5), "vec_id", "embedding",
          cb, "code", "codeword", m = 16, k = 10, nlist = 16, nprobe = 8,
          refineIters = 4, spill = 2, refine = 3)), bruteN))
      println(s"GATES sf=$sf " + rep("s13_ivf_pq_residual",
        sets(Similarity.ivfPqResidualTopK(embN, "vec_id", "embedding",
          embN.filter(col("vec_id") < 5), "vec_id", "embedding",
          m = 16, k = 10, ksub = 256, nlist = 16, nprobe = 12,
          refineIters = 4, pqIters = 4)), bruteN))

      // s26 equality vs end-to-end ivfPqTopK (same codebook, refine=1)
      val (cents, postings) = Similarity.buildAnnIndex(embN, "vec_id",
        "embedding", cb, "code", "codeword",
        m = 16, nlist = 16, refineIters = 4, spill = 2)
      val e2e = Similarity.ivfPqTopK(embN, "vec_id", "embedding",
        embN.filter(col("vec_id") < 5), "vec_id", "embedding",
        cb, "code", "codeword",
        m = 16, k = 10, nlist = 16, nprobe = 8, refineIters = 4, spill = 2,
        refine = 1)
      def rows(df: DataFrame) = df
        .select(col("query_id").cast("long"), col("neighbor_id").cast("long"),
          col("rank").cast("long"), col("adc_dist"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
      val served = rows(Similarity.annIndexTopK(cents, postings,
        embN.filter(col("vec_id") < 5), "vec_id", "embedding",
        cb, "code", "codeword", m = 16, k = 10, nprobe = 8))
      val e2eRows = rows(e2e)
      println(s"GATES sf=$sf s26 store==e2e: ${served == e2eRows} " +
        s"(served=${served.size} e2e=${e2eRows.size}) recall_vs_bruteN=" +
        f"${served.groupBy(_._1).map { case (k, v) => (v.map(_._2) intersect bruteN(k)).size }.sum / 50.0}%.3f")

      // s06 coverage on the d05 audit slice
      val slice = emb.filter(col("vec_id") < 1000)
      val exact = Similarity.cosinePairs(slice, "vec_id", "embedding", 0.45)
        .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val lsh = Similarity.cosinePairsLsh(emb, "vec_id", "embedding",
          threshold = 0.45, numPlanes = 6, numTables = 8,
          maxBucket = Some(10000))
        .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val cov = if (exact.isEmpty) 1.0
        else (exact intersect lsh).size.toDouble / exact.size
      println(f"GATES sf=$sf s06 slice_exact=${exact.size} lsh_total=${lsh.size} coverage=$cov%.3f")
    }
    s.stop()
  }
}
