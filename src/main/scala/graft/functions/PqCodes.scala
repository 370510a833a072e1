package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}
import org.apache.spark.sql.graft.ColumnShim

/** All product-quantization codes of a vector in ONE pass.
  *
  * The Column formulation (m × K literal `vec_dot` calls + struct
  * sort) generates a doConsume past janino's 64 KB method limit —
  * Spark then falls back to interpreted eval AND re-attempts the
  * failed compile on every execution. This expression is one compact
  * generated call: the codebook rides along as a reference object
  * (not inlined code), and the nested (subspace × codeword × dim)
  * loop lives in a static method shared by interpreted and codegen
  * paths.
  *
  * Determinism contract (what lets a SQL oracle reproduce the codes
  * bit-for-bit): the |x|² term is dropped (constant per row and
  * subspace — cannot move the argmin); dist = c2 − 2·(x·c) rounds
  * HALF_UP to 6dp before comparison (same as `round(x, 6)` in Spark
  * and DuckDB); codewords are scanned in ascending code order, and
  * only a strictly smaller distance displaces the incumbent — so
  * ties keep the LOWEST code id.
  *
  * Output: array<long> of length m; element j is subspace j's code.
  */
case class PqCodes(child: Expression, m: Int, d: Int,
                   codes: Seq[Long], codebook: Seq[Double], c2: Seq[Double])
  extends UnaryExpression {

  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_codes expects an array<float|double> arg, got $t")
  }

  @transient private lazy val codesArr = codes.toArray
  @transient private lazy val cbArr = codebook.toArray
  @transient private lazy val c2Arr = c2.toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_codes"

  // the codebook is K*d doubles — keep it out of plan strings
  override def toString: String =
    s"pq_codes($child, m=$m, d=$d, k=${codes.length})"
  override def sql: String = s"pq_codes(${child.sql}, $m, $d, k=${codes.length})"

  override def nullSafeEval(v: Any): Any =
    PqCodes.compute(v.asInstanceOf[ArrayData], isFloat, m, d,
      codesArr, cbArr, c2Arr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cd = ctx.addReferenceObj("pqCodeIds", codesArr, "long[]")
    val cb = ctx.addReferenceObj("pqCodebook", cbArr, "double[]")
    val cc = ctx.addReferenceObj("pqC2", c2Arr, "double[]")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.PqCodes.compute($a, $isFloat, $m, $d, $cd, $cb, $cc)")
  }

  override protected def withNewChildInternal(c: Expression): PqCodes =
    copy(child = c)
}

object PqCodes {

  /** `codebook` is row-major K×d (rows in ascending `codes` order);
    * `c2` is the per-(codeword, subspace) squared norm, laid out
    * c*m + j, summed left-to-right like the oracle's list sum.
    */
  def codes(vec: Column, m: Int, d: Int, codeIds: Seq[Long],
            codebook: Seq[Double], c2: Seq[Double]): Column =
    ColumnShim.column(PqCodes(ColumnShim.expression(vec), m, d,
      codeIds, codebook, c2))

  /** Matches `round(x, 6)` in both Spark and DuckDB (HALF_UP). */
  @inline private[graft] def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  def compute(a: ArrayData, isFloat: Boolean, m: Int, d: Int,
              codeIds: Array[Long], cb: Array[Double],
              c2: Array[Double]): ArrayData = {
    val sub = d / m
    val k = codeIds.length
    // dirty-input guard: a vector shorter than the codebook dim is
    // read only up to its own length (missing dims contribute 0 to
    // the dot, like vec_dot's min-length truncation) — never past the
    // end of the backing buffer
    val n = a.numElements()
    val out = new Array[Long](m)
    val dists = new Array[Double](k)
    var j = 0
    while (j < m) {
      val voff = j * sub
      val lim = math.max(0, math.min(sub, n - voff))
      var rawMin = Double.PositiveInfinity
      var c = 0
      while (c < k) {
        var dot = 0.0
        val off = c * d + voff
        var i = 0
        while (i < lim) {
          val x = if (isFloat) a.getFloat(voff + i).toDouble
                  else a.getDouble(voff + i)
          dot += x * cb(off + i)
          i += 1
        }
        val dist = c2(c * m + j) - 2.0 * dot
        dists(c) = dist
        if (dist < rawMin) rawMin = dist
        c += 1
      }
      // Round ONLY the contenders: round6 goes through BigDecimal
      // (Double.toString inside), and calling it K times per subspace
      // made coding 70x slower than the arithmetic. HALF_UP to 6dp
      // moves a value by at most 5e-7 PLUS the representation error of
      // landing on the nearest double (ulp/2 — which DOMINATES once
      // |dist| is large enough that ulp > 1e-6, e.g. unscaled
      // embeddings with |x| ~ 1e5), so a raw distance beyond
      // 1e-6 + ulp slack of the raw minimum cannot reach the rounded
      // minimum even as a tie. Contenders are re-scanned in ascending
      // code order with the original strictly-smaller displacement
      // rule, so the argmin and the lowest-code-id tie-break are
      // bit-identical to rounding everything.
      var bestDist = Double.PositiveInfinity
      var bestCode = Long.MaxValue
      c = 0
      while (c < k) {
        val dc = dists(c)
        val cut = rawMin + 1.000001e-6 +
          2.0 * Math.ulp(math.max(math.abs(dc), math.abs(rawMin)))
        if (dc <= cut) {
          val r = round6(dc)
          if (r < bestDist) { bestDist = r; bestCode = codeIds(c) }
        }
        c += 1
      }
      out(j) = bestCode
      j += 1
    }
    new GenericArrayData(out)
  }
}
