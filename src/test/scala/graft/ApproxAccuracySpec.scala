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
    val exact = T("lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("exact"))
    val approx = SparkEntry.queries("q22_approx_distinct")(spark, dir)
      .select("l_returnflag", "approx_parts")
    val joined = exact.join(approx, "l_returnflag").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (e, a) = (r.getAs[Long]("exact").toDouble, r.getAs[Long]("approx_parts").toDouble)
      assert(math.abs(a - e) / e < 0.05, s"${r.get(0)}: approx $a vs exact $e")
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
    val exact = T("lineitem")
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_quantity, 0.5)").as("p50_exact"))
    val approx = SparkEntry.queries("q25_percentile_approx")(spark, dir)
      .select("l_returnflag", "p50_approx")
    exact.join(approx, "l_returnflag").collect().foreach { r =>
      val (e, a) = (r.getDouble(1), r.getDouble(2))
      // quantity is 1..50 integers: the sketch may land one step off
      assert(math.abs(a - e) <= 1.0, s"${r.get(0)}: approx $a vs exact $e")
    }
  }
}
