package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graft.ColumnShim

/** Mutable Gramian buffer: count, d mean sums, and the UPPER TRIANGLE
  * of the d×d second-moment matrix, each cell a signed 128-bit integer
  * (hi/lo long pair) so the exact-integer discipline of the micro-
  * coordinate moment pass survives any corpus size — Σ xi6·xj6 over
  * 10¹² rows of |x6| ≤ 10⁶ coordinates peaks near 10²⁴, past a long
  * but nowhere near 2¹²⁷.
  */
final class GramianBuf(var d: Int) {
  var n: Long = 0L
  var mHi: Array[Long] = null
  var mLo: Array[Long] = null
  var sHi: Array[Long] = null
  var sLo: Array[Long] = null

  def init(dim: Int): Unit = {
    d = dim
    val tri = dim * (dim + 1) / 2
    mHi = new Array[Long](dim); mLo = new Array[Long](dim)
    sHi = new Array[Long](tri); sLo = new Array[Long](tri)
  }
}

/** Fused Gramian pass for [[graft.operators.Similarity.topPcPower]]:
  * folds each micro-integer vector's count, coordinate sums, and
  * pairwise products IN PLACE — one buffer probe per row instead of
  * the d² = 16,384 exploded rows per vector the previous
  * posexplode×posexplode plan pushed through the hash aggregate (the
  * constant-factor CPU tax VERDICT r12 flagged). The shuffle was
  * already bounded (d² keys); this bounds the map side too: per-row
  * work is the d(d+1)/2 multiply-accumulates and nothing else.
  *
  * Exactness: every product xi6·xj6 is an exact long (|x6| < 2³¹·√2
  * required by the micro contract), accumulated into a signed 128-bit
  * limb pair — associative and commutative, so the sums are identical
  * bit-for-bit to the DECIMAL(38,0) SUM the oracle replays, under any
  * partitioning and merge tree. Only the upper triangle folds; the
  * mirror is exact because S_ij = S_ji as integers.
  *
  * eval returns the serialized buffer (BinaryType): the one consumer
  * is topPcPower's bounded driver collect, which parses it with
  * [[GramianAgg.parse]] — no Catalyst Decimal plumbing in the hot
  * path.
  */
case class GramianAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramianBuf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "gramian_sketch"

  override def createAggregationBuffer(): GramianBuf = new GramianBuf(-1)

  // 128-bit signed accumulate: lo is an unsigned limb; carry detection
  // is the classic sign-bit formula for unsigned 64-bit overflow.
  @inline private def add128(hi: Array[Long], lo: Array[Long], k: Int, p: Long): Unit = {
    val old = lo(k); val nl = old + p
    lo(k) = nl
    hi(k) += (p >> 63) + (if (((old & p) | ((old | p) & ~nl)) < 0L) 1L else 0L)
  }

  override def update(buf: GramianBuf, input: InternalRow): GramianBuf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val d = arr.numElements()
      if (buf.d < 0) buf.init(d)
      require(d == buf.d,
        s"gramian: ragged vector width $d vs ${buf.d} — embeddings must share a dimension")
      buf.n += 1
      var i = 0; var k = 0
      while (i < d) {
        val xi = arr.getLong(i)
        add128(buf.mHi, buf.mLo, i, xi)
        var j = i
        while (j < d) {
          add128(buf.sHi, buf.sLo, k, xi * arr.getLong(j))
          k += 1; j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: GramianBuf, b: GramianBuf): GramianBuf = {
    if (b.d < 0) return a
    if (a.d < 0) return b
    require(a.d == b.d, s"gramian: merge width ${a.d} vs ${b.d}")
    a.n += b.n
    var i = 0
    while (i < a.d) { add128(a.mHi, a.mLo, i, b.mLo(i)); a.mHi(i) += b.mHi(i) - (b.mLo(i) >> 63); i += 1 }
    val tri = a.sLo.length
    var k = 0
    while (k < tri) { add128(a.sHi, a.sLo, k, b.sLo(k)); a.sHi(k) += b.sHi(k) - (b.sLo(k) >> 63); k += 1 }
    a
  }

  override def eval(buf: GramianBuf): Any = serialize(buf)

  override def serialize(buf: GramianBuf): Array[Byte] = {
    if (buf.d < 0) return GramianAgg.emptyBytes
    val tri = buf.sLo.length
    val bb = java.nio.ByteBuffer.allocate(4 + 8 + 16 * (buf.d + tri))
    bb.putInt(buf.d); bb.putLong(buf.n)
    var i = 0
    while (i < buf.d) { bb.putLong(buf.mHi(i)); bb.putLong(buf.mLo(i)); i += 1 }
    var k = 0
    while (k < tri) { bb.putLong(buf.sHi(k)); bb.putLong(buf.sLo(k)); k += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): GramianBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val d = bb.getInt
    val buf = new GramianBuf(-1)
    if (d < 0) return buf
    buf.init(d)
    buf.n = bb.getLong
    var i = 0
    while (i < d) { buf.mHi(i) = bb.getLong; buf.mLo(i) = bb.getLong; i += 1 }
    val tri = buf.sLo.length
    var k = 0
    while (k < tri) { buf.sHi(k) = bb.getLong; buf.sLo(k) = bb.getLong; k += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): GramianAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GramianAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): GramianAgg =
    copy(child = c.head)
}

object GramianAgg {
  private[functions] val emptyBytes: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8)
    bb.putInt(-1); bb.putLong(0L); bb.array()
  }

  /** Column form over a micro-integer array<long> column. */
  def gramian(vec: Column): Column =
    ColumnShim.column(GramianAgg(ColumnShim.expression(vec)).toAggregateExpression())

  private def toBig(hi: Long, lo: Long): java.math.BigInteger =
    java.math.BigInteger.valueOf(hi).shiftLeft(64)
      .add(new java.math.BigInteger(java.lang.Long.toUnsignedString(lo)))

  /** Driver-side fold of parsed bucket sketches (the ≤1024-way tree
    * merge's last level): exact BigInteger adds, so the fold equals
    * the one-shot aggregate bit for bit under any bucketing. */
  def foldParsed(parts: Seq[(Long, Int, Array[java.math.BigInteger], Array[java.math.BigInteger])])
      : (Long, Int, Array[java.math.BigInteger], Array[java.math.BigInteger]) = {
    if (parts.isEmpty) return (0L, 0, Array.empty, Array.empty)
    val d = parts.head._2
    require(parts.forall(_._2 == d),
      s"gramian fold: inconsistent widths ${parts.map(_._2).distinct.mkString(",")}")
    val n = parts.map(_._1).sum
    val m = Array.tabulate(d)(i =>
      parts.map(_._3(i)).reduce(_.add(_)))
    val s = Array.tabulate(d * (d + 1) / 2)(k =>
      parts.map(_._4(k)).reduce(_.add(_)))
    (n, d, m, s)
  }

  /** Driver-side parse of an eval'd sketch: (n, d, mean sums, upper-
    * triangle moment sums in (i,j≥i) row order) as exact integers. */
  def parse(bytes: Array[Byte])
      : (Long, Int, Array[java.math.BigInteger], Array[java.math.BigInteger]) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val d = bb.getInt
    val n = bb.getLong
    if (d < 0) return (0L, 0, Array.empty, Array.empty)
    val m = Array.fill(d)(toBig(bb.getLong, bb.getLong))
    val s = Array.fill(d * (d + 1) / 2)(toBig(bb.getLong, bb.getLong))
    (n, d, m, s)
  }
}
