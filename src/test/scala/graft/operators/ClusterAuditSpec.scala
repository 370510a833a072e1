package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Transitive-drift cluster audit (d39): a CHAINED cluster (A~B~C
  * with A and C dissimilar) must show pair_coverage < 1 and a weak
  * min link, while a genuine duplicate set shows coverage 1.0 —
  * exercised through the same jaccardPairs/components machinery the
  * query composes.
  */
class ClusterAuditSpec extends SparkSpec {
  import spark.implicits._

  private def audit(docs: Seq[(Long, String)]) = {
    val df = docs.toDF("doc_id", "text")
    val pairs = Dedup.jaccardPairs(Dedup.shingles(df, "doc_id", "text", 3), 0.5)
    val comp = Dedup.components(df.select(col("doc_id")), "doc_id", pairs)
    val sizes = comp.groupBy(col("component"))
      .agg(count(lit(1)).as("n_docs")).filter(col("n_docs") >= 2)
    pairs.join(comp.withColumnRenamed("doc_id", "id1")
        .select(col("id1"), col("component")), "id1")
      .groupBy(col("component"))
      .agg(count(lit(1)).as("n_pairs"), min(col("jaccard")).as("min_j"))
      .join(sizes, "component")
      .collect()
      .map(r => (r.getLong(0), (r.getLong(3), r.getLong(1), r.getDouble(2))))
      .toMap
  }

  test("a contained bridge doc chains two dissimilar docs: coverage 2/3") {
    // the size-asymmetry chain: B's 4 shingles sit inside both A and
    // C (jaccard 0.5 each), while A and C meet only through B's
    // shingles (4/12 = 0.33 < tau) — a component with a MISSING pair
    val out = audit(Seq(
      (1L, "b1 b2 b3 b4 b5 b6 a1 a2 a3 a4"),
      (2L, "b1 b2 b3 b4 b5 b6"),
      (3L, "b1 b2 b3 b4 b5 b6 c1 c2 c3 c4")))
    val (nDocs, nPairs, minJ) = out(1L)
    assert(nDocs == 3L && nPairs == 2L, out.toString) // coverage 2/3
    assert(minJ == 0.5, s"the weak links are exactly at tau: $minJ")
  }

  test("a genuine duplicate set covers every pair at jaccard 1") {
    val out = audit(Seq(
      (1L, "a b c d e"), (2L, "a b c d e"), (3L, "a b c d e"),
      (9L, "totally different words here")))
    val (nDocs, nPairs, minJ) = out(1L)
    assert(nDocs == 3L && nPairs == 3L && minJ == 1.0, out.toString)
    assert(!out.contains(9L)) // the singleton never appears
  }
}
