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
    weight: Expression,
    width: Int,
    depth: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(width > 0 && depth > 0 && width <= 65536,
    s"count_min: width=$width (<= 65536, the 4-hex-digit hash range), depth=$depth")

  override def children: Seq[Expression] = Seq(child, weight)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "count_min"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  // One digest instance per deserialized aggregate (= per task, which
  // is single-threaded); digest() resets it for the next item. The
  // original per-(row, depth) MessageDigest.getInstance dominated the
  // t20 profile — provider lookup is far costlier than the md5 itself.
  @transient private lazy val md = java.security.MessageDigest.getInstance("MD5")
  @transient private lazy val rowPrefix: Array[Array[Byte]] =
    Array.tabulate(depth)(r =>
      s"$r:".getBytes(java.nio.charset.StandardCharsets.UTF_8))

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val wv = weight.eval(input)
      val w = wv match {
        case null => 0L
        case n: java.lang.Number => n.longValue()
      }
      if (w != 0L) {
        val item = v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        var r = 0
        while (r < depth) {
          md.update(rowPrefix(r)); md.update(item)
          val h = md.digest()
          // first 4 hex digits = first two bytes, big-endian
          buf(r * width + (((h(0) & 0xff) << 8) | (h(1) & 0xff)) % width) += w
          r += 1
        }
      }
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
    copy(child = c(0), weight = c(1))
}

object CountMinAgg {
  import org.apache.spark.sql.functions.lit

  /** Column form: the d×w counter grid as array<long>, row-major. */
  def sketch(item: Column, width: Int, depth: Int): Column =
    sketchWeighted(item, lit(1L), width, depth)

  /** Weighted form: each row adds `weight` to its buckets instead of 1.
    * Feeding the (item, count) HISTOGRAM with weight = count yields the
    * grid bit-identical to streaming every occurrence — counter update
    * is addition, so occurrences of one item fold associatively — while
    * hashing each distinct item once. Under a Zipfian corpus
    * |vocab| ≪ |tokens|, so this is the sketch-build shape for the
    * 100 TB token stream (the histogram groupBy map-side combines).
    */
  def sketchWeighted(item: Column, weight: Column, width: Int, depth: Int): Column =
    ColumnShim.column(
      CountMinAgg(ColumnShim.expression(item),
        ColumnShim.expression(weight.cast("long")), width, depth)
        .toAggregateExpression())

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
