package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graft.ColumnShim

/** Misra-Gries heavy hitters: approximate top items by frequency in
  * bounded memory — THE way to ask "what are the most common tokens /
  * URLs / fingerprints" over 100 TB without a full groupBy: state is
  * at most k (item, count) pairs per partial aggregate, the shuffle
  * carries k pairs per mapper instead of one row per distinct item.
  *
  * Guarantees: any item with true frequency > N/(k+1) survives, and
  * reported counts undercount by at most N/(k+1). With k larger than
  * the number of distinct items the counts are EXACT (which is what
  * lets the oracle hash-check this aggregate on a low-cardinality
  * column).
  *
  * Merge = add counts, then if over capacity subtract the (k+1)-th
  * largest count from all and drop the non-positive — the standard
  * mergeable-summaries construction, so map-side combine works.
  * Buffers are allowed to grow to 2k before compacting back to <= k,
  * so the per-row cost is amortized O(1) instead of an O(k log k)
  * sort on every new distinct item once the buffer fills.
  */
case class HeavyHittersAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "heavy_hitters"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  private def shrink(buf: mutable.HashMap[String, Long], cap: Int): Unit =
    if (buf.size > cap) {
      val m = buf.values.toArray.sorted(Ordering[Long].reverse)(k)
      val dead = buf.iterator.collect { case (i, c) if c - m <= 0 => i }.toList
      dead.foreach(buf.remove)
      buf.mapValuesInPlace((_, c) => c - m)
    }

  override def update(buf: mutable.HashMap[String, Long], input: InternalRow)
      : mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.toString
      buf.updateWith(item) {
        case Some(c) => Some(c + 1)
        case None    => Some(1L)
      }
      shrink(buf, 2 * k)
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long], b: mutable.HashMap[String, Long])
      : mutable.HashMap[String, Long] = {
    b.foreach { case (i, c) => a.updateWith(i) {
      case Some(c0) => Some(c0 + c)
      case None     => Some(c)
    } }
    // final merge result is what eval sees: compact to <= k here
    shrink(a, k)
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    // single-partition plans skip merge(), so the update-path 2k
    // headroom must be compacted here too — callers see <= k items
    shrink(buf, k)
    new GenericArrayData(buf.toSeq.sortBy { case (i, c) => (-c, i) }.map {
      case (i, c) => InternalRow(UTF8String.fromString(i), c)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    // length-prefixed bytes, NOT writeUTF: writeUTF throws on items
    // whose UTF-8 encoding exceeds 64 KiB (long tokens/URLs are
    // exactly what this aggregate gets pointed at)
    buf.foreach { case (i, c) =>
      val b = i.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.put(new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HeavyHittersAgg =
    copy(child = c.head)
}

object HeavyHittersAgg {
  /** Column form: array<struct<item,cnt>> of (approximate) top items. */
  def top(item: Column, k: Int): Column =
    ColumnShim.column(HeavyHittersAgg(ColumnShim.expression(item), k).toAggregateExpression())
}
