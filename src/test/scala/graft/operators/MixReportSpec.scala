package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Mixture QA report (p25): shares reconcile with the underlying
  * sample, zero-kept sources surface, errors are signed.
  */
class MixReportSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (0L until 400L)
    .map(i => (i, if (i < 300) "big" else "small")).toDF("doc_id", "source")
  private val w = when(col("source") === "big", lit(0.5)).otherwise(lit(0.5))

  test("achieved shares reconcile exactly with mixtureSample's counts") {
    val rep = Training.mixtureReport(docs, "source", "doc_id", w, 0.5)
      .collect()
    val kept = Training.mixtureSample(docs, "source", "doc_id", w, 0.5)
      .groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val tot = kept.values.sum.toDouble
    assert(rep.map(_.getString(0)).toSeq == Seq("big", "small"))
    rep.foreach { r =>
      assert(r.getLong(2) == kept(r.getString(0)))
      assert(r.getDouble(4) ==
        BigDecimal(kept(r.getString(0)) / tot)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(r.getDouble(3) == 0.5)
    }
    assert(rep.map(_.getLong(1)).toSeq == Seq(300L, 400L - 300L))
  }

  test("a source sampled to zero keeps its row with rel_error -1") {
    // weight ~0 drives the keep threshold to the '00000' floor: the
    // md5 prefix is never < '00000', so nothing survives
    val w0 = when(col("source") === "small", lit(1e-9)).otherwise(lit(1.0))
    val rep = Training.mixtureReport(docs, "source", "doc_id", w0, 0.5)
      .collect()
    val small = rep.find(_.getString(0) == "small").get
    assert(small.getLong(2) == 0L && small.getDouble(5) == -1.0,
      small.toString)
  }
}
