package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-statistics operators for training-data curation that need
  * DataFrame shape (explode + re-aggregate), unlike the pure
  * per-row expression trees in [[graft.functions.TextFunctions]].
  */
object TextStats {

  /** Gopher-style repetition metrics per document: the fraction of all
    * tokens taken by the single most frequent token, and likewise for
    * bigrams — high values mark boilerplate/spam ("click here click
    * here ...") that length or alpha-ratio filters miss.
    *
    * Shape at scale: explode to (doc, gram) then two hash aggregations
    * keyed on (doc, gram) and doc — map-side partial aggregation does
    * the heavy lifting because repeated grams collapse locally; no
    * document-sized rows ever shuffle. Output: (id, n_toks,
    * top_tok_frac, top_bigram_frac), fractions rounded to 6.
    */
  def repetition(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    def topFrac(n: Int, frac: String, total: Option[String]) = {
      val counts = Dedup.shinglesRaw(df, idCol, textCol, n)
        .groupBy(col("id"), col("shingle")).agg(count(lit(1)).as("c"))
        .groupBy(col("id"))
        .agg((max(col("c")).cast("double") / sum(col("c")).cast("double")).as(frac),
          sum(col("c")).cast("long").as(total.getOrElse("_n")))
      if (total.isDefined) counts else counts.drop("_n")
    }
    topFrac(1, "top_tok_frac", Some("n_toks"))
      .join(topFrac(2, "top_bigram_frac", None), Seq("id"), "left")
      .select(col("id"), col("n_toks"),
        round(col("top_tok_frac"), 6).as("top_tok_frac"),
        round(coalesce(col("top_bigram_frac"), lit(0.0)), 6).as("top_bigram_frac"))
  }
}
