package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graft.ColumnShim

/** PORTABLE Bloom filter (Bloom 1970) as a mergeable aggregate: an
  * m-bit membership summary with no false negatives and a bounded
  * false-positive rate (~(1−e^{−kn/m})^k), built map-side and merged
  * by bitwise OR — the broadcastable "is this n-gram anywhere in the
  * benchmark set" prefilter a 100 TB decontamination sweep starts
  * with when the benchmark side is too large to broadcast-verify row
  * by row.
  *
  * Spark ships its own BloomFilterAggregate (used by
  * [[graft.operators.Blocklist]], where a verify join erases false
  * positives anyway). This variant exists for the sweeps that DON'T
  * verify: its k bit positions are PORTABLE — position_r(x) = (first
  * 5 md5 hex digits of "r:x") mod m — so any engine with an md5 can
  * rebuild the identical bitmap, reproduce the exact same false
  * positives, and hash-check a bloom-only sweep end to end (the d19
  * oracle does exactly that in DuckDB; xxhash64-seeded filters are
  * opaque to it).
  *
  * State is m/64 longs (128 KB at m = 2^20) regardless of input size;
  * OR-merge means map-side combine ships one bitmap per mapper.
  */
case class BloomAgg(
    child: Expression,
    bits: Int,
    hashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(bits > 0 && bits <= (1 << 20) && Integer.bitCount(bits) == 1,
    s"bloom: bits=$bits must be a power of two <= 2^20 (5-hex-digit hash range)")
  require(hashes > 0, s"bloom: hashes=$hashes")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bloom_build"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long]((bits + 63) / 64)

  private def position(r: Int, item: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s"$r:$item".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 5 hex digits = first 20 bits, digit order = nibble order
    val v = ((h(0) & 0xff) << 12) | ((h(1) & 0xff) << 4) | ((h(2) & 0xf0) >>> 4)
    v % bits
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.toString
      var r = 0
      while (r < hashes) {
        val p = position(r, item)
        buf(p >>> 6) |= 1L << (p & 63)
        r += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
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

  override def withNewMutableAggBufferOffset(o: Int): BloomAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BloomAgg =
    copy(child = c.head)
}

object BloomAgg {
  /** Column form: the m-bit bitmap as array<long>, word-major. */
  def build(item: Column, bits: Int, hashes: Int): Column =
    ColumnShim.column(
      BloomAgg(ColumnShim.expression(item), bits, hashes).toAggregateExpression())

  /** Membership probe against a bitmap column: all k portable bit
    * positions set. Pure codegen column arithmetic (md5 → word index
    * → variable shift), so the probe runs distributed against a
    * broadcast bitmap with no shuffle.
    */
  def mightContain(bloomCol: Column, item: Column, bits: Int, hashes: Int): Column = {
    import org.apache.spark.sql.functions._
    require(bits > 0 && Integer.bitCount(bits) == 1, s"bits=$bits must be a power of two")
    (0 until hashes).map { r =>
      val pos = conv(substring(md5(concat(lit(s"$r:"), item)), 1, 5), 16, 10)
        .cast("long") % bits
      val word = element_at(bloomCol, (shiftright(pos, 6) + 1L).cast("int"))
      // arithmetic >> sign-extends when bit 63 of the word is set, so
      // mask with & 1 — a % 2 here reads -1 for those bits and drops them
      call_function("shiftright", word, (pos % 64).cast("int"))
        .bitwiseAND(lit(1L)) === 1L
    }.reduce(_ && _)
  }
}
