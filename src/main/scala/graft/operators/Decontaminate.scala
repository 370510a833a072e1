package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents sharing at least
  * `minOverlap` distinct word n-grams with any document of a benchmark
  * set — the standard eval-contamination sweep run before training.
  *
  * Shape at scale: both sides reduce to distinct (id, shingle) pairs;
  * the join shuffles on the shingle hash, so cost is driven by shared
  * vocabulary, never |train| x |bench|. The benchmark side is tiny in
  * practice, so its shingle table broadcasts and the sweep is one
  * narrow pass over the training corpus's shingles.
  */
object Decontaminate {

  /** Per contaminated training doc: how many benchmark docs it
    * overlaps (`n_bench_hits`) and the largest shared-shingle count
    * (`max_overlap`). Clean docs are absent from the output.
    */
  def flag(train: DataFrame, bench: DataFrame, idCol: String, textCol: String,
           shingleN: Int = 3, minOverlap: Int = 5): DataFrame = {
    val ts = Dedup.shingles(train, idCol, textCol, shingleN)
    val bs = Dedup.shingles(bench, idCol, textCol, shingleN)
      .withColumnRenamed("id", "bench_id")
    ts.join(bs, "shingle")
      .groupBy(col("id"), col("bench_id"))
      .agg(count(lit(1)).as("overlap"))
      .filter(col("overlap") >= minOverlap)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bench_hits"), max(col("overlap")).as("max_overlap"))
  }
}
