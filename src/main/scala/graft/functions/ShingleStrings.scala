package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graft.ColumnShim

/** All word n-gram shingle STRINGS of a token array, in one compiled
  * pass — the string-typed sibling of [[ShingleHashes]] for the
  * operators whose shingles must stay oracle-portable (md5 of the
  * gram text, not an engine-local 64-bit hash).
  *
  * The Column-combinator formulation (`transform(sequence, i =>
  * concat_ws(" ", slice(toks, i, n)))`) runs INTERPRETED — Spark does
  * not codegen higher-order functions, so every gram walks an
  * interpreted expression tree. This is one generated call emitting a
  * tight loop over [[UTF8String.concatWs]] (the same null-skipping
  * join `concat_ws` lowers to, so gram strings are byte-identical to
  * the combinator form). Output element i is the gram starting at
  * token i — positions survive posexplode unchanged.
  */
case class ShingleStrings(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_strings expects an array<string> arg, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_strings"

  override def nullSafeEval(v: Any): Any =
    ShingleStrings.compute(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.ShingleStrings.compute($a, $n)")

  override protected def withNewChildInternal(c: Expression): ShingleStrings =
    copy(child = c)
}

object ShingleStrings {

  def of(tokens: Column, n: Int): Column =
    ColumnShim.column(ShingleStrings(ColumnShim.expression(tokens), n))

  private val Space = UTF8String.fromString(" ")

  def compute(a: ArrayData, n: Int): ArrayData = {
    val len = a.numElements()
    val out = len - n + 1
    if (out <= 0) return new GenericArrayData(Array.empty[Any])
    val res = new Array[Any](out)
    val window = new Array[UTF8String](n)
    var i = 0
    while (i < out) {
      var j = 0
      while (j < n) {
        window(j) = if (a.isNullAt(i + j)) null else a.getUTF8String(i + j)
        j += 1
      }
      // concatWs skips nulls exactly like the SQL concat_ws
      res(i) = UTF8String.concatWs(Space, window: _*)
      i += 1
    }
    new GenericArrayData(res)
  }
}
