package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graft.ColumnShim

/** Count-Min sketch (Cormode & Muthukrishnan 2005): point-query
  * frequency estimates over a stream in O(d·w) memory — the
  * complement of [[HeavyHittersAgg]] (Misra-Gries finds WHICH items
  * are frequent; CMS answers "how often did THIS item occur" for any
  * item, including ones never retained). est(x) = min over d rows of
  * counter[row][h_row(x)], always an OVERcount (one-sided error
  * ≤ εN with w = ⌈e/ε⌉ at confidence 1 − e^−d).
  *
  * State is a fixed d×w long grid (32 KB at 4×1024) regardless of
  * stream size; merge is element-wise addition, so map-side combine
  * works and the shuffle carries one grid per mapper — the mergeable-
  * summaries property every aggregate in this family exists for.
  *
  * The row hashes are PORTABLE: h_r(x) = (first 4 md5 hex digits of
  * "r:x") mod w — reproducible in any engine with an md5, which is
  * what lets the t20 oracle rebuild the exact same sketch in SQL and
  * hash-check the estimates bit-for-bit (the classic seeded
  * pairwise-independent family would be opaque to the oracle).
  */
case class CountMinAgg(
    child: Expression,
    width: Int,
    depth: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(width > 0 && depth > 0 && width <= 65536,
    s"count_min: width=$width (<= 65536, the 4-hex-digit hash range), depth=$depth")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "count_min"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  private def bucket(r: Int, item: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s"$r:$item".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 4 hex digits = first two bytes, big-endian
    (((h(0) & 0xff) << 8) | (h(1) & 0xff)) % width
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.toString
      var r = 0
      while (r < depth) { buf(r * width + bucket(r, item)) += 1L; r += 1 }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): CountMinAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CountMinAgg =
    copy(child = c.head)
}

object CountMinAgg {
  /** Column form: the d×w counter grid as array<long>, row-major. */
  def sketch(item: Column, width: Int, depth: Int): Column =
    ColumnShim.column(
      CountMinAgg(ColumnShim.expression(item), width, depth).toAggregateExpression())

  /** Point-query estimate against a sketch column: min over rows of
    * the counter at the item's portable md5 bucket — the SAME hash
    * the aggregate used, expressed as catalyst columns so estimates
    * run distributed against a broadcast sketch.
    */
  def estimate(sketchCol: Column, item: Column, width: Int, depth: Int): Column = {
    import org.apache.spark.sql.functions._
    least((0 until depth).map { r =>
      val bkt = conv(substring(md5(concat(lit(s"$r:"), item)), 1, 4), 16, 10)
        .cast("long") % width
      element_at(sketchCol, (lit(r.toLong * width) + bkt + 1L).cast("int"))
    }: _*)
  }
}
