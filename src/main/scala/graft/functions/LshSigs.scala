package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}
import org.apache.spark.sql.graft.ColumnShim

/** All random-hyperplane LSH signatures of a vector in ONE pass.
  *
  * The Column-combinator formulation (aggregate ∘ zip_with per plane)
  * is interpreted and walks the array once per plane — 48 passes with
  * 8 tables x 6 planes. This expression walks the vector once,
  * accumulating every plane's dot product in a flat array, then folds
  * sign bits into one long signature per table. Hyperplane components
  * are a deterministic splitmix64 hash of (plane, dim) folded to
  * [-0.5, 0.5) — identical on every executor, nothing to broadcast.
  *
  * Output: array<long> of length `numTables`; bit p of element t is
  * sign(v . h_{t*numPlanes+p}).
  */
case class LshSigs(child: Expression, numPlanes: Int, numTables: Int)
  extends UnaryExpression {

  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_sigs"

  override def nullSafeEval(v: Any): Any =
    LshSigs.compute(v.asInstanceOf[ArrayData], isFloat, numPlanes, numTables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.LshSigs.compute($a, $isFloat, $numPlanes, $numTables)")

  override protected def withNewChildInternal(c: Expression): LshSigs =
    copy(child = c)
}

object LshSigs {

  def sigs(vec: Column, numPlanes: Int, numTables: Int): Column =
    ColumnShim.column(LshSigs(ColumnShim.expression(vec), numPlanes, numTables))

  /** Deterministic hyperplane component for (plane, dim) in [-0.5, 0.5). */
  @inline def component(plane: Int, dim: Int): Double =
    ((Mix64.mix((plane.toLong << 32) | (dim.toLong & 0xffffffffL)) >>> 11)
      * (1.0 / (1L << 53))) - 0.5

  /** One pass over the vector, planes*tables accumulators. Called from
    * both interpreted eval and generated code.
    */
  def compute(a: ArrayData, isFloat: Boolean, planes: Int, tables: Int): ArrayData = {
    val total = planes * tables
    val acc = new Array[Double](total)
    val n = a.numElements()
    var i = 0
    while (i < n) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      var p = 0
      while (p < total) { acc(p) += x * component(p, i); p += 1 }
      i += 1
    }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var s = 0L
      var b = 0
      while (b < planes) {
        if (acc(t * planes + b) >= 0) s |= (1L << b)
        b += 1
      }
      out(t) = s
      t += 1
    }
    new GenericArrayData(out)
  }
}
