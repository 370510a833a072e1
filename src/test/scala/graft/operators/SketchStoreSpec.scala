package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{CountMinAgg, KmvAgg}

/** Mergeable sketch-store semantics (d26): merged run sketches are
  * bit-identical to one-shot whole-corpus sketches (KMV and CMS),
  * sources present in only one run survive the full-outer fold, and
  * the store round-trips through parquet.
  */
class SketchStoreSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def toks(df: org.apache.spark.sql.DataFrame) = df
    .select(col("source"), explode(split(lower(col("text")), "\\s+")).as("tok"))
    .filter(length(col("tok")) > 0)

  test("KMV: merge of two runs' stores == one-shot sketch, bit for bit") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val a = SketchStore.kmvStore(
      toks(docs.filter(col("doc_id") % 2 === 0)), "source", md5(col("tok")), 16)
    val b = SketchStore.kmvStore(
      toks(docs.filter(col("doc_id") % 2 === 1)), "source", md5(col("tok")), 16)
    val merged = SketchStore.kmvStoreMerge(a, b, "source", 16)
    val oneShot = SketchStore.kmvStore(toks(docs), "source", md5(col("tok")), 16)
    assert(merged.exceptAll(oneShot).isEmpty && oneShot.exceptAll(merged).isEmpty)
  }

  test("CMS: merged grids == one-shot grid, and estimates agree") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val hist = toks(docs).groupBy("source", "tok").agg(count(lit(1)).as("c"))
    val a = SketchStore.cmsStore(hist.filter(md5(col("tok")) < "8"),
      "source", col("tok"), col("c"), 128, 4)
    val b = SketchStore.cmsStore(hist.filter(md5(col("tok")) >= "8"),
      "source", col("tok"), col("c"), 128, 4)
    val merged = SketchStore.cmsStoreMerge(a, b, "source", 128, 4)
    val oneShot = SketchStore.cmsStore(hist, "source", col("tok"), col("c"), 128, 4)
    assert(merged.exceptAll(oneShot).isEmpty && oneShot.exceptAll(merged).isEmpty)
    val est = merged.withColumn("e",
      CountMinAgg.estimate(col("cms"), lit("the"), 128, 4)).select("source", "e")
    val est1 = oneShot.withColumn("e",
      CountMinAgg.estimate(col("cms"), lit("the"), 128, 4)).select("source", "e")
    assert(est.exceptAll(est1).isEmpty)
  }

  test("a source seen by only one run survives the fold unchanged") {
    val a = Seq(("only_a", Seq("01", "02"))).toDF("source", "kmv")
    val b = Seq(("only_b", Seq("03"))).toDF("source", "kmv")
    val m = SketchStore.kmvStoreMerge(a, b, "source", 4)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(m("only_a") == Seq("01", "02"))
    assert(m("only_b") == Seq("03"))
  }

  test("the KMV store round-trips through parquet and keeps merging") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val a = SketchStore.kmvStore(
      toks(docs.filter(col("doc_id") < 20)), "source", md5(col("tok")), 8)
    val path = "/tmp/graft_test_kmv_store"
    a.write.mode("overwrite").parquet(path)
    val reloaded = spark.read.parquet(path)
    val b = SketchStore.kmvStore(
      toks(docs.filter(col("doc_id") >= 20)), "source", md5(col("tok")), 8)
    val m1 = SketchStore.kmvStoreMerge(reloaded, b, "source", 8)
    val m2 = SketchStore.kmvStoreMerge(a, b, "source", 8)
    assert(m1.exceptAll(m2).isEmpty && m2.exceptAll(m1).isEmpty)
  }
}
