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

  override def update(buf: Array[Long], input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < k) {
        // splitmix64 permutation family, shared with MinHashRow so batch
        // and streaming signatures are interchangeable
        val p = Mix64.mix(h ^ (i.toLong * 0xD1B54A32D192ED03L))
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

  /** Row-local form: signature of an array of base hashes in one fused
    * pass — the streaming path, where a document arrives whole in one
    * row and there is nothing to aggregate across rows. Same
    * permutation family as the aggregate, so batch and streaming
    * signatures are interchangeable.
    */
  def compute(hashes: org.apache.spark.sql.catalyst.util.ArrayData, k: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val sig = Array.fill(k)(Long.MaxValue)
    val n = hashes.numElements()
    var j = 0
    while (j < n) {
      val h = hashes.getLong(j)
      var i = 0
      while (i < k) {
        val p = Mix64.mix(h ^ (i.toLong * 0xD1B54A32D192ED03L))
        if (p < sig(i)) sig(i) = p
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }
}

/** Row-local MinHash signature expression over array<long> base hashes. */
case class MinHashRow(child: Expression, k: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_row"
  override def nullSafeEval(v: Any): Any =
    MinHashAgg.compute(v.asInstanceOf[ArrayData], k)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.MinHashAgg.compute($a, $k)")
  override protected def withNewChildInternal(c: Expression): MinHashRow =
    copy(child = c)
}

object MinHashRow {
  def sig(baseHashes: Column, k: Int): Column =
    ColumnShim.column(MinHashRow(ColumnShim.expression(baseHashes), k))
}
