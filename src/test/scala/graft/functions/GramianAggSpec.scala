package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The fused Gramian pass (s21/s22's moment aggregate): exactness vs
  * the DECIMAL(38,0) exploded formulation it replaced, partition-
  * layout invariance (the merge path), 128-bit carry behavior past
  * Long range, and the serialize round-trip.
  */
class GramianAggSpec extends SparkSpec {
  import spark.implicits._

  private def micro(c: String) = transform(col(c),
    x => round(round(x.cast("double"), 6) * lit(1e6), 0).cast("long"))

  private def decimalMoments(df: org.apache.spark.sql.DataFrame)
      : (Long, Map[Int, BigDecimal], Map[(Int, Int), BigDecimal]) = {
    val withC = df.select(micro("v").as("_v"))
    val s = withC
      .select(posexplode(col("_v")).as(Seq("i", "_xi")), col("_v"))
      .select(col("i"), col("_xi"), posexplode(col("_v")).as(Seq("j", "_xj")))
      .groupBy("i", "j")
      .agg(sum((col("_xi") * col("_xj")).cast("decimal(38,0)")).as("s6"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> BigDecimal(r.getDecimal(2))).toMap
    val m = withC.select(posexplode(col("_v")).as(Seq("i", "_xi")))
      .groupBy("i").agg(sum(col("_xi").cast("decimal(38,0)")).as("m6"))
      .collect()
      .map(r => r.getInt(0) -> BigDecimal(r.getDecimal(1))).toMap
    (df.count(), m, s)
  }

  private def gramianMoments(df: org.apache.spark.sql.DataFrame)
      : (Long, Map[Int, BigDecimal], Map[(Int, Int), BigDecimal]) = {
    val bytes = df.select(GramianAgg.gramian(micro("v")).as("g"))
      .head().getAs[Array[Byte]](0)
    val (n, d, mBig, sBig) = GramianAgg.parse(bytes)
    val m = (0 until d).map(i => i -> BigDecimal(mBig(i))).toMap
    var k = -1
    val s = (for (i <- 0 until d; j <- i until d) yield {
      k += 1
      Seq((i, j) -> BigDecimal(sBig(k)), (j, i) -> BigDecimal(sBig(k)))
    }).flatten.toMap
    (n, m, s)
  }

  test("bit-identical to the DECIMAL(38,0) exploded moment pass") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("embedding").as("v"))
    assert(gramianMoments(df) == decimalMoments(df))
  }

  test("partition-layout invariant: 1 vs 32 partitions merge to the same sums") {
    val rows = (0 until 500).map { k =>
      Array.tabulate(8)(i => ((k * 31 + i * 17) % 2001 - 1000) / 997.0f)
    }
    val df1 = rows.toDF("v").repartition(1)
    val df32 = rows.toDF("v").repartition(32)
    assert(gramianMoments(df1) == gramianMoments(df32))
    assert(gramianMoments(df32) == decimalMoments(df32))
  }

  test("128-bit accumulation: sums past Long.MaxValue stay exact") {
    // x6 = 1e6 · 3000 = 3e9 per coordinate → each product 9e18, two
    // rows overflow a signed long; 1000 rows ≈ 9e21
    val df = (1 to 1000).map(_ => Array(3000.0f, -3000.0f)).toDF("v")
    val (n, m, s) = gramianMoments(df)
    assert(n == 1000L)
    assert(m(0) == BigDecimal("3000000000000"))
    assert(s((0, 0)) == BigDecimal("9000000000000000000000"))
    assert(s((0, 1)) == BigDecimal("-9000000000000000000000"))
    assert(gramianMoments(df) == decimalMoments(df))
  }

  test("empty input and all-null input yield the empty sketch") {
    val empty = Seq.empty[Array[Float]].toDF("v")
    assert(GramianAgg.parse(
      empty.select(GramianAgg.gramian(micro("v"))).head().getAs[Array[Byte]](0))._1 == 0L)
    val nulls = Seq[Option[Array[Float]]](None, None).toDF("v")
    assert(GramianAgg.parse(
      nulls.select(GramianAgg.gramian(micro("v"))).head().getAs[Array[Byte]](0))._1 == 0L)
  }

  test("ragged widths fail loudly") {
    val df = Seq(Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f)).toDF("v")
      .repartition(1)
    val e = intercept[Exception] {
      df.select(GramianAgg.gramian(micro("v"))).collect()
    }
    assert(e.getMessage.contains("ragged"), e.getMessage)
  }

  test("serialize/deserialize round-trips the buffer") {
    val agg = GramianAgg(org.apache.spark.sql.graft.ColumnShim.expression(lit(0)))
    val buf = new GramianBuf(-1)
    buf.init(3)
    buf.n = 7
    buf.mLo(0) = -1L; buf.mHi(0) = 5L; buf.mLo(2) = 42L
    buf.sLo(1) = Long.MinValue; buf.sHi(1) = -3L; buf.sLo(5) = 99L
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.d == 3 && back.n == 7)
    assert(back.mLo.toSeq == buf.mLo.toSeq && back.mHi.toSeq == buf.mHi.toSeq)
    assert(back.sLo.toSeq == buf.sLo.toSeq && back.sHi.toSeq == buf.sHi.toSeq)
  }
}
