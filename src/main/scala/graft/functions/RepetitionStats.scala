package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graft.ColumnShim

/** Per-document n-gram repetition statistics in ONE compiled row-local
  * pass — the engine of [[graft.operators.TextStats.gopherRepetition]].
  *
  * Gopher's A2 signals are all WITHIN-document aggregates, so
  * computing them by exploding nine gram streams into a corpus-wide
  * (id, n, gram) shuffle moves ~9x the token volume as raw gram
  * strings for no cross-row information at all — measured 6.2s of a
  * 59s bench at sf0.1, and pure shuffle poison at 100 TB. This
  * expression walks the token array once per n with an open-address
  * count map and returns:
  *
  *  - `topc`: occurrences x char-length of the most frequent n-gram,
  *    ties to the binary-lexicographically smallest gram (the same
  *    order `min(struct(-count, gram))` and the oracle's
  *    `ORDER BY c DESC, g` produce);
  *  - `dupc`: sum of occurrences x char-length over grams occurring
  *    >= 2 times (the occurrence-sum duplicate convention).
  *
  * Both are 0 when the doc has no n-grams. Gram strings are built
  * with the same null-skipping [[UTF8String.concatWs]] as
  * [[ShingleStrings]], so counts are byte-identical to the exploded
  * formulation.
  */
case class RepetitionStats(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "gram size must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats expects an array<string> arg, got $t")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("topc", LongType, nullable = false),
    StructField("dupc", LongType, nullable = false)))
  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(v: Any): Any =
    RepetitionStats.compute(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.RepetitionStats.compute($a, $n)")

  override protected def withNewChildInternal(c: Expression): RepetitionStats =
    copy(child = c)
}

object RepetitionStats {

  def of(tokens: Column, n: Int): Column =
    ColumnShim.column(RepetitionStats(ColumnShim.expression(tokens), n))

  private val Space = UTF8String.fromString(" ")

  def compute(a: ArrayData, n: Int): InternalRow = {
    val len = a.numElements()
    val out = len - n + 1
    if (out <= 0) return new GenericInternalRow(Array[Any](0L, 0L))
    val counts = new java.util.HashMap[UTF8String, Int](out * 2)
    val window = new Array[UTF8String](n)
    var i = 0
    while (i < out) {
      var j = 0
      while (j < n) {
        window(j) = if (a.isNullAt(i + j)) null else a.getUTF8String(i + j)
        j += 1
      }
      val g = UTF8String.concatWs(Space, window: _*)
      counts.put(g, counts.getOrDefault(g, 0) + 1)
      i += 1
    }
    var topCnt = 0
    var topGram: UTF8String = null
    var dupc = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue
      val g = e.getKey
      if (c > topCnt || (c == topCnt && g.compareTo(topGram) < 0)) {
        topCnt = c; topGram = g
      }
      if (c >= 2) dupc += c.toLong * g.numChars()
    }
    new GenericInternalRow(Array[Any](topCnt.toLong * topGram.numChars(), dupc))
  }
}
