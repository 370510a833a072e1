package graft.operators

import graft.SparkSpec

/** Snapshot diff between corpus versions (d31). */
class CorpusDiffSpec extends SparkSpec {
  import spark.implicits._

  test("every status classifies and rolls up per source") {
    val old = Seq(
      (1L, "alpha", "a"), // unchanged
      (2L, "beta", "a"),  // changed in new
      (3L, "gamma", "b"), // removed
      (4L, "delta", "b")  // unchanged
    ).toDF("doc_id", "text", "source")
    val neu = Seq(
      (1L, "alpha", "a"),
      (2L, "BETA", "a"),
      (4L, "delta", "b"),
      (5L, "epsilon", "b") // added
    ).toDF("doc_id", "text", "source")
    val got = Dedup.corpusDiff(old, neu, "doc_id", "text", "source")
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == Seq(
      ("a", 0L, 0L, 1L, 1L, 0.5),
      ("b", 1L, 1L, 0L, 1L, round6(2.0 / 3))))
  }

  test("a moved doc attributes to its NEW source (renames follow the live corpus)") {
    val old = Seq((1L, "t", "old-src")).toDF("doc_id", "text", "source")
    val neu = Seq((1L, "t", "new-src")).toDF("doc_id", "text", "source")
    val got = Dedup.corpusDiff(old, neu, "doc_id", "text", "source")
      .collect().map(r => (r.getString(0), r.getLong(4)))
    // same content, different source label: counted unchanged, under
    // the new source — the diff tracks CONTENT churn, not metadata
    assert(got.toSeq == Seq(("new-src", 1L)))
  }

  test("NULL text classifies by side presence, not digest nullability") {
    // id 1: null text on BOTH sides -> unchanged (null-safe digest);
    // id 2: null -> text -> changed; id 3: text -> null -> changed;
    // id 4: null text, old side only -> removed (not 'added')
    val old = Seq(
      (1L, null.asInstanceOf[String], "s"),
      (2L, null.asInstanceOf[String], "s"),
      (3L, "t", "s"),
      (4L, null.asInstanceOf[String], "s")
    ).toDF("doc_id", "text", "source")
    val neu = Seq(
      (1L, null.asInstanceOf[String], "s"),
      (2L, "t", "s"),
      (3L, null.asInstanceOf[String], "s")
    ).toDF("doc_id", "text", "source")
    val r = Dedup.corpusDiff(old, neu, "doc_id", "text", "source").collect().head
    // (added, removed, changed, unchanged) = (0, 1, 2, 1)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((0L, 1L, 2L, 1L)))
  }

  test("disjoint snapshots are pure adds + removes at churn 1.0") {
    val old = Seq((1L, "x", "s")).toDF("doc_id", "text", "source")
    val neu = Seq((2L, "y", "s")).toDF("doc_id", "text", "source")
    val r = Dedup.corpusDiff(old, neu, "doc_id", "text", "source").collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) == ((1L, 1L, 0L, 0L)))
    assert(r.getDouble(5) == 1.0)
  }

  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
