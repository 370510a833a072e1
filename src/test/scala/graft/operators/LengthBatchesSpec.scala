package graft.operators

import graft.SparkSpec

/** Length-bucketed batching (p23): cap assignment, batch cuts, the
  * distributed rank's partition invariance, and padding accounting.
  */
class LengthBatchesSpec extends SparkSpec {
  import spark.implicits._

  private val caps = Seq(8L, 16L, 32L)

  test("docs land in the smallest holding cap; overflow truncates to the top") {
    val rows = Seq((1L, 5L), (2L, 8L), (3L, 9L), (4L, 30L), (5L, 99L))
    val full = Training.lengthBatches(rows.toDF("doc_id", "n"),
        "doc_id", "n", caps, batchSize = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(5)))).toMap
    assert(full(1L) == ((8L, 3L)) && full(2L) == ((8L, 0L)), full)
    assert(full(3L) == ((16L, 7L)), full)
    assert(full(4L) == ((32L, 2L)), full)
    assert(full(5L) == ((32L, 0L)), full) // truncated: pad 0, cap semantics
  }

  test("ranks are dense per bucket and batches cut every batchSize") {
    val rows = (1L to 20L).map(i => (i, 10L)) // all in cap 16
    val out = Training.lengthBatches(rows.toDF("doc_id", "n"),
        "doc_id", "n", caps, batchSize = 4)
      .collect()
    assert(out.map(_.getLong(3)).sorted.toSeq == (1L to 20L), out.mkString)
    out.foreach { r =>
      assert(r.getLong(4) == (r.getLong(3) - 1) / 4, r)
    }
  }

  test("the distributed rank is partition-invariant") {
    val rows = (1L to 50L).map(i => (i, (i % 37) + 1))
    val df = rows.toDF("doc_id", "n")
    def run(parts: Int) =
      Training.lengthBatches(df.repartition(parts), "doc_id", "n", caps, 4)
        .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
        .sortBy(_._1).toSeq
    assert(run(7) == run(2))
  }

  test("bad params fail loudly") {
    val df = Seq((1L, 1L)).toDF("doc_id", "n")
    intercept[IllegalArgumentException] {
      Training.lengthBatches(df, "doc_id", "n", Seq(16L, 8L), 2)
    }
    intercept[IllegalArgumentException] {
      Training.lengthBatches(df, "doc_id", "n", caps, 0)
    }
  }
}
