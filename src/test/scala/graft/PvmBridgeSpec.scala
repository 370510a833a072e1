package graft

import org.apache.spark.sql.functions._

/** q71 price-volume-mix bridge: the all-integer microdollar contract
  * (r15's one red CORRECTNESS row — the old render divided micro
  * totals as IEEE doubles and finished with round(value, 6), the
  * known cross-engine boundary class). The bridge now never leaves
  * integer space, so the spec can demand EXACT properties:
  *
  *  - the waterfall identity holds in integers, by construction:
  *    revenue_b = revenue_a + volume + price + new + lost + residual
  *    (lost is emitted already negated);
  *  - the endpoints equal independent exact decimal aggregates of the
  *    same split, ×10⁶;
  *  - no component is null (a decimal→long overflow in non-ANSI mode
  *    nulls out — the loud failure shape this spec pins).
  */
class PvmBridgeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("integer identity, exact endpoints, no nulls at sf0.001") {
    val rows = SparkEntry.queries("q71_pvm_bridge")(spark, dir).collect()
    assert(rows.length == 7)
    val byC = rows.map(r => (r.getString(0), r.get(1))).toMap
    assert(byC.values.forall(_ != null), s"null component in ${byC}")
    val v = rows.map(r => (r.getString(0), r.getLong(1))).toMap
    assert(v("7_revenue_b") ==
      v("1_revenue_a") + v("2_volume_effect") + v("3_price_effect") +
        v("4_new_parts") + v("5_lost_parts") + v("6_residual"),
      s"waterfall identity broken: $v")

    // independent endpoint check: same midpoint split, plain decimal
    // sums ×10⁶ (micros) — no shared code with the query's effect math
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(expr("unix_micros(l_shipdate) div 604800000000").as("wk"),
        col("l_extendedprice").cast("decimal(18,2)").as("r"))
    val mid = li.agg(expr("(min(wk) + max(wk) + 1) div 2")).head.getLong(0)
    val Array(ra, rb) = li
      .agg(sum(when(col("wk") < mid, col("r"))),
        sum(when(col("wk") >= mid, col("r"))))
      .head.toSeq.map(x =>
        (BigDecimal(x.asInstanceOf[java.math.BigDecimal]) * 1000000)
          .toLongExact).toArray
    assert(v("1_revenue_a") == ra && v("7_revenue_b") == rb,
      s"endpoints: got ${v("1_revenue_a")}/${v("7_revenue_b")} want $ra/$rb")
  }
}
