package graft

import org.apache.spark.sql.functions._

import graft.sources.CatalogStats

/** The q03-class broadcast decision, made from ROW COUNTS at plan
  * time (round-11 item #2, SURVEY §4's own recommendation).
  *
  * The scenario that separates the two regimes (measured estimates
  * at sf0.1): customer.parquet is 316 KB on disk; after column
  * pruning the path-based estimate of the (c_custkey, c_nationkey)
  * scan is 92.9 KB — and it stays 92.9 KB through a `c_nationkey=1`
  * filter, because file-size stats pass through filters unchanged.
  * The ANALYZE'd catalog table carries rowCount + per-column NDV, so
  * with CBO on the same filtered scan is estimated at 11.5 KB (15000
  * rows / NDV 25 x 19-byte width). A 48 KB broadcast threshold sits
  * between the two: the stats-backed plan broadcasts the filtered
  * dim at PLAN time, the path-based plan wires a sort-merge join.
  * Both assertions inspect the STATIC plan
  * (queryExecution.sparkPlan, pre-AQE): AQE's runtime-size fallback
  * repairs the path-based case eventually, but only after planning a
  * shuffle — the cluster-grade answer is to never plan it.
  */
class CboPlanSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.1"

  private def joinPlan(useStats: Boolean): String = {
    val cust =
      if (useStats) spark.table(CatalogStats.name(dir, "customer"))
      else spark.read.parquet(s"$dir/customer.parquet")
    val ord =
      if (useStats) spark.table(CatalogStats.name(dir, "orders"))
      else spark.read.parquet(s"$dir/orders.parquet")
    cust.filter(col("c_nationkey") === 1)
      .join(ord, col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey").agg(count(lit(1)).as("n"))
      .queryExecution.sparkPlan.toString
  }

  test("ANALYZE'd stats flip the filtered-dim join to broadcast at plan time") {
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val cbo = spark.conf.get("spark.sql.cbo.enabled")
    val reorder = spark.conf.get("spark.sql.cbo.joinReorder.enabled")
    try {
      CatalogStats.register(spark, dir, Seq("customer", "orders"))
      CatalogStats.enableCbo(spark)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 48 * 1024)

      // row-count path: filter selectivity (NDV 25 on c_nationkey)
      // shrinks the estimate under the threshold -> static broadcast
      val withStats = joinPlan(useStats = true)
      assert(withStats.contains("BroadcastHashJoin"),
        s"stats-backed plan did not broadcast the filtered dim:\n$withStats")

      // file-size path: the pruned 92.9 KB estimate > 48 KB passes
      // through the filter unchanged -> the static plan wires a
      // shuffled join
      val pathBased = joinPlan(useStats = false)
      assert(pathBased.contains("SortMergeJoin"),
        s"path-based plan unexpectedly broadcast a 92.9KB-estimated scan " +
          s"under a 48KB threshold — the negative control is broken:\n$pathBased")
      assert(!pathBased.contains("BroadcastHashJoin"), pathBased)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
      spark.conf.set("spark.sql.cbo.enabled", cbo)
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", reorder)
    }
  }
}
