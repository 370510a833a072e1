package graft.operators

import graft.SparkSpec

/** Distributed Lloyd k-means (s29): blob recovery, exact-integer
  * partition invariance, distance ties, and the bounded contracts.
  */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  test("two separated blobs resolve into two clusters with tight distances") {
    // blob A around (0, 0), blob B around (10, 10) — any 2-seed Lloyd
    // run separates them in one update
    val rows = Seq(
      (1L, Array(0.0f, 0.1f)), (2L, Array(0.1f, 0.0f)), (3L, Array(0.05f, 0.05f)),
      (4L, Array(10.0f, 10.1f)), (5L, Array(10.1f, 10.0f)), (6L, Array(10.05f, 9.95f)))
    val out = Similarity.kmeansTrain(rows.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 2, iters = 3, dims = 2)
      .orderBy("id").collect()
    val byCluster = out.groupBy(_.getLong(1)).view.mapValues(_.map(_.getLong(0)).toSet)
    assert(byCluster.values.toSet == Set(Set(1L, 2L, 3L), Set(4L, 5L, 6L)),
      out.mkString)
    // within-blob distance to the converged centroid is tiny:
    // micro^2 units, blob spread ~0.1 => dist_sq < (0.15e6)^2 * 2
    assert(out.forall(_.getLong(2) < 2L * 150000L * 150000L), out.mkString)
  }

  test("assignment is bit-identical under different partitionings") {
    val rows = (0 until 60).map(i =>
      (i.toLong, Array((i % 7).toFloat / 3f, (i % 5).toFloat / 2f, (i % 3).toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    def run(parts: Int) =
      Similarity.kmeansTrain(df.repartition(parts), "vec_id", "embedding",
          k = 4, iters = 3, dims = 3)
        .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(run(7) == run(3))
  }

  test("an exact distance tie takes the smaller cluster id") {
    // v sits exactly between the two seeds after 1 iter of singleton
    // clusters: seeds are the two blob points themselves
    val rows = Seq(
      (1L, Array(0.0f)), (2L, Array(2.0f)), (3L, Array(1.0f)))
    val out = Similarity.kmeansTrain(rows.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 2, iters = 1, dims = 1)
      .orderBy("id").collect()
    val mid = out.find(_.getLong(0) == 3L).get
    val ends = out.filter(_.getLong(0) != 3L)
    // whichever cluster ids the md5 seed handed out, the midpoint's
    // id equals the SMALLER of the two (the tie rule) unless the
    // means moved it off-tie — with iters=1 the midpoint joins one
    // seed first, shifting that mean toward it
    assert(out.length == 3 && ends.map(_.getLong(1)).distinct.length == 2,
      out.mkString)
    assert(Set(0L, 1L).contains(mid.getLong(1)), mid.toString)
  }

  test("trained clusters feed prototypicality pruning (SSL prototypes)") {
    import org.apache.spark.sql.functions._
    // two far blobs; ids 6 and 4 sort first under md5 (the seed
    // order), so placing them dead-center in opposite blobs makes
    // the seeds split the blobs on iteration 1 — each blob's center
    // is its most prototypical member and the 1/3 cut prunes it
    val rows = Seq(
      (6L, Array(1.0f, 1.0f)), (1L, Array(1.2f, 0.8f)), (2L, Array(0.8f, 1.2f)),
      (4L, Array(10.0f, -10.0f)), (3L, Array(12.0f, -8.0f)), (5L, Array(8.0f, -12.0f)))
    val df = rows.toDF("vec_id", "embedding")
    val asg = Similarity.kmeansTrain(df, "vec_id", "embedding", 2, 3, 2)
      .select(col("id").as("vec_id"), col("cluster"))
    val out = Similarity.protoPrune(df.join(asg, "vec_id"), "vec_id",
        "cluster", "embedding", 1, 3)
      .collect()
    val byCluster = out.groupBy(_.getLong(1)).view
      .mapValues(_.map(_.getLong(0)).toSet)
    assert(byCluster.values.toSet == Set(Set(6L, 1L, 2L), Set(4L, 3L, 5L)),
      out.mkString)
    val pruned = out.filter(!_.getBoolean(5)).map(_.getLong(0)).toSet
    assert(pruned == Set(6L, 4L), out.mkString)
  }

  test("IVF with nprobe = kClusters reproduces brute force exactly") {
    import org.apache.spark.sql.functions._
    val rows = (0 until 40).map(i => (i.toLong,
      Array((i % 7).toFloat / 3f + 0.1f, (i % 5).toFloat / 2f + 0.1f,
        (i % 3).toFloat + 0.1f)))
    val df = rows.toDF("vec_id", "embedding")
    val q = df.filter(col("vec_id") < 3)
    val ivf = Similarity.ivfExactTopK(df, "vec_id", "embedding",
        q, "vec_id", "embedding", k = 5, nprobe = 4, kClusters = 4,
        iters = 2, dims = 3)
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val brute = Similarity.bruteTopK(df, "vec_id", "embedding",
        q.select(col("vec_id").as("qid"), col("embedding").as("qvec")),
        "qid", "qvec", k = 5)
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(ivf == brute, s"\nivf:   $ivf\nbrute: $brute")
  }

  test("IVF partial probe returns at most k per query from probed lists only") {
    import org.apache.spark.sql.functions._
    val rows = (0 until 60).map(i => (i.toLong,
      Array((i % 11).toFloat, (i % 13).toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    val out = Similarity.ivfExactTopK(df, "vec_id", "embedding",
        df.filter(col("vec_id") < 2), "vec_id", "embedding",
        k = 8, nprobe = 1, kClusters = 6, iters = 2, dims = 2)
      .collect()
    val perQ = out.groupBy(_.getLong(0)).view.mapValues(_.length)
    assert(perQ.values.forall(_ <= 8), perQ.toMap.toString)
    intercept[IllegalArgumentException] {
      Similarity.ivfExactTopK(df, "vec_id", "embedding", df, "vec_id",
        "embedding", k = 1, nprobe = 9, kClusters = 6, iters = 1, dims = 2)
    }
  }

  test("contracts fail loudly") {
    val df = Seq((1L, Array(0.0f, 0.0f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Similarity.kmeansTrain(df, "vec_id", "embedding", k = 200, iters = 1,
        dims = 128) // 200*128 > 16384
    }
    intercept[IllegalArgumentException] {
      Similarity.kmeansTrain(df, "vec_id", "embedding", k = 2, iters = 1,
        dims = 2) // only 1 vector, need k=2
    }
  }
}
