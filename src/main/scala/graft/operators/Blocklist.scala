package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnShim

/** Blocklist filtering at corpus scale: remove every row whose key
  * appears in a (much smaller) blocklist — takedown lists, known-spam
  * domains, opted-out users — WITHOUT anti-joining the whole corpus.
  *
  * Shape: the blocklist folds into a Bloom filter (one small
  * aggregation), which ships to every task as a literal; the bloom
  * probe itself is a narrow codegen filter. Bloom-NEGATIVE rows are
  * definitively clean (no false negatives) and never shuffle.
  * Bloom-POSITIVE rows — truly blocked rows plus ~fpp of the clean
  * corpus — verify against the real blocklist with a broadcast anti
  * join, so the join input is a sliver of the corpus, not the corpus.
  *
  * The result unions two filters over `corpus`, so the corpus LINEAGE
  * is evaluated twice per downstream action (plus once for the bloom
  * build). For a parquet scan that is cheap re-reads; if `corpus` is
  * an expensive derived frame, persist it before calling.
  *
  * Uses Spark's own BloomFilterAggregate / BloomFilterMightContain
  * expressions (the machinery behind runtime join filters), so both
  * the build and the probe are codegen.
  */
object Blocklist {

  /** Corpus rows whose `corpusCol` is NOT in `blocklist.blockCol`. */
  def filterOut(corpus: DataFrame, blocklist: DataFrame,
                corpusCol: String, blockCol: String,
                expectedItems: Long = 1L << 20,
                numBits: Long = 1L << 23): DataFrame = {
    val bfBytes = blocklist
      .select(ColumnShim.column(new BloomFilterAggregate(
        ColumnShim.expression(xxhash64(col(blockCol))),
        ColumnShim.expression(lit(expectedItems)),
        ColumnShim.expression(lit(numBits))).toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
    // an empty blocklist aggregates to a null filter: nothing to remove
    if (bfBytes == null) return corpus
    val mightHit = ColumnShim.column(BloomFilterMightContain(
      ColumnShim.expression(lit(bfBytes)),
      ColumnShim.expression(xxhash64(col(corpusCol)))))
    val clean = corpus.filter(!mightHit)
    // collision-safe verify-side alias: a corpus that already has a
    // "_blocked" column would make the join condition ambiguous
    val bcol = Iterator.from(0).map(i => s"_blocked$i")
      .find(n => !corpus.columns.contains(n)).get
    val verified = corpus.filter(mightHit)
      .join(broadcast(blocklist.select(col(blockCol).as(bcol)).distinct()),
        col(corpusCol) === col(bcol), "left_anti")
    clean.unionByName(verified)
  }
}
