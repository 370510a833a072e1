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

/** K-Minimum-Values sketch (Beyer et al. 2007): the k smallest
  * DISTINCT values of a string column — pointed at a uniform hash
  * (md5), the mergeable summary behind bottom-k Jaccard estimation
  * (d22) and KMV distinct-count estimation.
  *
  * Why an aggregate and not a rank window: state is at most k strings
  * per partial, partials combine map-side, and merge = union-then-trim
  * — so a per-group sketch costs one narrow hash aggregate with
  * k-sized shuffle rows, no distinct pass, no per-group window, and no
  * skew handling at all (a mega-group's rows fold into its mappers'
  * k-string partials). The window formulation this replaces shuffled
  * every distinct (group, hash) pair.
  *
  * Determinism: the result is a pure set property of the input (the
  * k smallest distinct values), independent of row order, partition
  * layout, and merge tree — which is what lets the d22 oracle rebuild
  * it with a rank in SQL and hash-match.
  */
case class KmvAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[String]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "kmv_sketch"

  override def createAggregationBuffer(): mutable.TreeSet[String] =
    mutable.TreeSet.empty

  private def add(buf: mutable.TreeSet[String], v: String): Unit =
    if (buf.size < k) buf.add(v)
    else if (v < buf.last && buf.add(v)) buf.remove(buf.last)

  override def update(buf: mutable.TreeSet[String], input: InternalRow)
      : mutable.TreeSet[String] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.toString)
    buf
  }

  override def merge(a: mutable.TreeSet[String], b: mutable.TreeSet[String])
      : mutable.TreeSet[String] = {
    b.foreach(add(a, _))
    a
  }

  override def eval(buf: mutable.TreeSet[String]): Any =
    new GenericArrayData(
      buf.iterator.map(UTF8String.fromString).toArray[Any])

  override def serialize(buf: mutable.TreeSet[String]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { s =>
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[String] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.TreeSet.empty[String]
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.add(new String(b, java.nio.charset.StandardCharsets.UTF_8))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvAgg =
    copy(child = c.head)
}

object KmvAgg {
  /** Column form: ascending array<string> of the k smallest distinct
    * values (the whole distinct set when it fits under k). */
  def sketch(value: Column, k: Int): Column =
    ColumnShim.column(KmvAgg(ColumnShim.expression(value), k).toAggregateExpression())

  /** KMV distinct-count estimate off a [[sketch]] over md5 hashes:
    * EXACT (= sketch size) under k, else the Beyer et al. estimator
    * (k-1)/U(k) with U(k) = the k-th smallest hash read as a 60-bit
    * fraction of the hash space. Every step is engine-portable —
    * 15-hex-digit parse, one exactly-representable 2^60 literal, one
    * IEEE division — so unlike HLL (q22, rows-only by design) this
    * estimate hash-matches an oracle that replays the same bottom-k.
    */
  def distinctEst(sketchCol: Column, k: Int): Column = {
    import org.apache.spark.sql.functions._
    val vk = conv(substring(element_at(sketchCol, -1), 1, 15), 16, 10)
      .cast("long").cast("double")
    when(size(sketchCol) < k, size(sketchCol).cast("double"))
      .otherwise(round(
        lit((k - 1).toDouble) * lit(1152921504606846976.0) / vk, 4))
  }
}
