package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.graft.ColumnShim

/** MinHash signature as ONE custom aggregate: state is the k-long
  * signature array, update folds each row's base hash through k
  * splitmix64-style permutations and keeps element-wise minima, and
  * merge is element-wise min — fully mergeable, so map-side partial
  * aggregation does almost all the work before the shuffle (the
  * property that matters at 100 TB: the shuffle carries one k-array
  * per (doc, mapper), never per shingle).
  *
  * Compared to k separate `min(hash(i, col))` columns this keeps the
  * permutation loop in one tight JVM kernel and the group state in
  * one array instead of k boxed columns.
  *
  * Input: a 64-bit base hash per element (e.g. `xxhash64(shingle)`).
  */
case class MinHashAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  /** splitmix64 finalizer over (base hash ^ per-permutation constant):
    * a well-mixed 64-bit permutation family with no per-row allocation.
    */
  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  override def update(buf: Array[Long], input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < k) {
        val p = mix(h ^ (i.toLong * 0xD1B54A32D192ED03L))
        if (p < buf(i)) buf(i) = p
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * k)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MinHashAgg =
    copy(child = c.head)
}

object MinHashAgg {
  /** Column form: minhash signature (array<long> of length k) of the
    * base-hash column within each group.
    */
  def sig(baseHash: Column, k: Int): Column =
    ColumnShim.column(MinHashAgg(ColumnShim.expression(baseHash), k).toAggregateExpression())
}
