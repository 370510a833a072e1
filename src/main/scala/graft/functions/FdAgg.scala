package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graft.ColumnShim

/** Mutable Frequent-Directions buffer: up to 2ℓ retained rows of
  * width d, plus the exact count and Frobenius mass of everything
  * ever folded (the error-bound denominators — exact, not sketched).
  */
final class FdBuf(val ell: Int) {
  var d: Int = -1
  var n: Long = 0L
  var fro2: Double = 0.0
  val rows: ArrayBuffer[Array[Double]] = ArrayBuffer.empty
}

/** FREQUENT DIRECTIONS (Liberty 2013, KDD; Ghashami et al. 2016
  * SIAM) as a mergeable TypedImperativeAggregate — the deterministic
  * matrix sketch with the covariance guarantee
  *
  *   0 ⪯ AᵀA − BᵀB ⪯ (‖A‖_F² / ℓ) · I
  *
  * for an ℓ×d sketch B built from any row stream A. This is the
  * scale path PAST the exact Gramian pass's d² ≤ 16384 driver-matrix
  * contract ([[GramianAgg]]): at d = 768 the full moment matrix is
  * 4.7 MB of driver state per partial and d² = 590k fold slots per
  * row, while the FD sketch holds ℓ·d doubles (ℓ = 64: 393 KB) with
  * an O(ℓ·d) amortized update — the top principal directions survive
  * with provable error, the long tail is deliberately forgotten.
  *
  * Shrink step: when the 2ℓ buffer fills, one reduced SVD rotates the
  * buffer to its right-singular basis and soft-thresholds every
  * direction by the ℓ-th singular value — σ'ᵢ = √max(σᵢ²−σ_ℓ², 0) —
  * halving the retained rows. Merge = append + shrink (the standard
  * mergeability result). Spark ships Breeze, so the SVD costs no new
  * dependency.
  *
  * NOT oracle-expressible (SVD) and not merge-order-invariant (the
  * approximation — not the guarantee — depends on fold order), so
  * consumers register rows-only with FdSketchSpec's accuracy and
  * error-bound gates, like the seeded-LSH family.
  */
case class FdAgg(
    child: Expression,
    ell: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FdBuf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "fd_sketch"

  override def createAggregationBuffer(): FdBuf = new FdBuf(ell)

  override def update(buf: FdBuf, input: InternalRow): FdBuf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val d = arr.numElements()
      if (buf.d < 0) buf.d = d
      require(d == buf.d,
        s"fd_sketch: ragged vector width $d vs ${buf.d}")
      val row = new Array[Double](d)
      var i = 0
      var f = 0.0
      while (i < d) { val x = arr.getDouble(i); row(i) = x; f += x * x; i += 1 }
      buf.rows += row
      buf.n += 1L
      buf.fro2 += f
      if (buf.rows.length >= 2 * ell) FdAgg.shrink(buf)
    }
    buf
  }

  override def merge(a: FdBuf, b: FdBuf): FdBuf = {
    if (b.d < 0) return a
    if (a.d < 0) { a.d = b.d }
    require(a.d == b.d, s"fd_sketch: merge width ${a.d} vs ${b.d}")
    b.rows.foreach { r =>
      a.rows += r
      if (a.rows.length >= 2 * ell) FdAgg.shrink(a)
    }
    a.n += b.n
    a.fro2 += b.fro2
    a
  }

  override def eval(buf: FdBuf): Any = serialize(buf)

  override def serialize(buf: FdBuf): Array[Byte] = {
    // a buffer mid-fill serializes as-is; the receiver keeps folding
    val k = buf.rows.length
    val bb = java.nio.ByteBuffer.allocate(4 + 4 + 8 + 8 + 8 * k * math.max(buf.d, 0))
    bb.putInt(buf.d); bb.putInt(k); bb.putLong(buf.n); bb.putDouble(buf.fro2)
    buf.rows.foreach { r => var i = 0; while (i < r.length) { bb.putDouble(r(i)); i += 1 } }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): FdBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new FdBuf(ell)
    buf.d = bb.getInt
    val k = bb.getInt
    buf.n = bb.getLong
    buf.fro2 = bb.getDouble
    var r = 0
    while (r < k) {
      val row = new Array[Double](buf.d)
      var i = 0
      while (i < buf.d) { row(i) = bb.getDouble; i += 1 }
      buf.rows += row
      r += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): FdAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FdAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): FdAgg =
    copy(child = c.head)
}

object FdAgg {
  /** The FD shrink: SVD-rotate the buffer, soft-threshold by the ℓ-th
    * singular value, keep the ≤ℓ surviving directions. */
  private[functions] def shrink(buf: FdBuf): Unit = {
    import breeze.linalg.{svd, DenseMatrix}
    val k = buf.rows.length
    val d = buf.d
    if (k <= buf.ell) return
    val flat = new Array[Double](k * d) // column-major
    var i = 0
    while (i < k) {
      val r = buf.rows(i)
      var j = 0
      while (j < d) { flat(j * k + i) = r(j); j += 1 }
      i += 1
    }
    val res = svd.reduced(new DenseMatrix(k, d, flat))
    val s = res.singularValues
    val vt = res.rightVectors // min(k,d) x d
    val nKeep = math.min(buf.ell, s.length)
    val delta = if (s.length > buf.ell - 1) {
      val sl = s(buf.ell - 1); sl * sl
    } else 0.0
    buf.rows.clear()
    var r = 0
    while (r < nKeep) {
      val s2 = s(r) * s(r) - delta
      if (s2 > 0.0) {
        val w = math.sqrt(s2)
        val row = new Array[Double](d)
        var j = 0
        while (j < d) { row(j) = w * vt(r, j); j += 1 }
        buf.rows += row
      }
      r += 1
    }
  }

  /** Column form over an array<double>-coercible vector column. */
  def sketch(vec: Column, ell: Int): Column = {
    require(ell >= 2, s"fd_sketch: ell $ell must be >= 2")
    ColumnShim.column(FdAgg(ColumnShim.expression(vec), ell).toAggregateExpression())
  }

  /** Driver-side fold of parsed bucket sketches (the tree-merge's
    * last level, the GramianAgg.foldParsed counterpart): append +
    * shrink — the FD mergeability construction, guarantee preserved. */
  def fold(parts: Seq[(Int, Long, Double, Array[Array[Double]])],
           ell: Int): (Int, Long, Double, Array[Array[Double]]) = {
    val buf = new FdBuf(ell)
    parts.filter(_._1 >= 0).foreach { case (d, n, f, rows) =>
      if (buf.d < 0) buf.d = d
      require(buf.d == d, s"fd fold: inconsistent widths ${buf.d} vs $d")
      rows.foreach { r =>
        buf.rows += r
        if (buf.rows.length >= 2 * ell) shrink(buf)
      }
      buf.n += n
      buf.fro2 += f
    }
    (buf.d, buf.n, buf.fro2, buf.rows.toArray)
  }

  /** Driver-side parse: (d, n, ‖A‖_F², retained rows). */
  def parse(bytes: Array[Byte])
      : (Int, Long, Double, Array[Array[Double]]) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val d = bb.getInt; val k = bb.getInt
    val n = bb.getLong; val fro2 = bb.getDouble
    val rows = Array.fill(k) {
      val row = new Array[Double](math.max(d, 0))
      var i = 0
      while (i < row.length) { row(i) = bb.getDouble; i += 1 }
      row
    }
    (d, n, fro2, rows)
  }
}
