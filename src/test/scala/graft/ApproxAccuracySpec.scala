package graft

import org.apache.spark.sql.functions._

/** The rows-only gate queries (r04 sampling, q22 HLL, q25 sketch
  * percentiles) escape the hash-match oracle by nature; these specs
  * pin their ACCURACY instead, so "rows-only" never silently decays
  * into "unchecked".
  */
class ApproxAccuracySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private def T(name: String) = spark.read.parquet(s"$dir/$name.parquet")

  test("randfilter sampling rate lands near the requested rate") {
    val n = T("events").count().toDouble
    val sampled = SparkEntry.queries("r04_sample")(spark, dir).count().toDouble
    val rate = sampled / n
    assert(rate > 0.07 && rate < 0.13, s"rate=$rate for requested 0.1")
  }

  test("approx_count_distinct stays within HLL++ error of the exact count") {
    // r16: the 5% gate rides IN the query output (within_5pct, pinned
    // to literal true by the oracle) and the exact count is a query
    // column — assert both, plus the exact column against a fresh
    // independent aggregate
    val out = SparkEntry.queries("q22_approx_distinct")(spark, dir)
      .select("l_returnflag", "exact_parts", "within_5pct").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getBoolean(2), s"${r.get(0)}: HLL estimate outside 5%")
    }
    val exact = T("lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("exact"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(r.getLong(1) == exact(r.getString(0)), r.toString)
    }
  }

  test("KMV distinct estimate stays within 4 sigma of the exact count") {
    val exact = T("lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("exact"))
    val est = SparkEntry.queries("q30_distinct_kmv")(spark, dir)
    val joined = exact.join(est, "l_returnflag").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (e, a) = (r.getAs[Long]("exact").toDouble, r.getAs[Double]("distinct_est"))
      // KMV relative std is ~1/sqrt(k-2) ~= 6.3% at k=256; gate at 4x
      assert(math.abs(a - e) / e < 0.25, s"${r.get(0)}: est $a vs exact $e")
    }
  }

  test("percentile_approx stays near the exact percentile") {
    // r16: the rank-tolerance gates ride IN the query output as
    // booleans (accuracy=1000 bounds rank error at 0.001, 20x inside
    // the +-0.02-rank bracket) — assert them, plus the exact p50
    // column against a fresh independent aggregate
    val out = SparkEntry.queries("q25_percentile_approx")(spark, dir)
      .select("l_returnflag", "p50_exact", "p50_in_rank_tol", "p90_in_rank_tol")
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getBoolean(2) && r.getBoolean(3),
        s"${r.get(0)}: sketch outside the rank bracket")
    }
    val exact = T("lineitem")
      .groupBy("l_returnflag")
      .agg(round(expr("percentile(l_quantity, 0.5)"), 6).as("p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    out.foreach { r =>
      assert(r.getDouble(1) == exact(r.getString(0)), r.toString)
    }
  }
}
