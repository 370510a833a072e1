package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graft.ColumnShim

/** 64-bit hashes of all word n-gram shingles of a text, in ONE fused
  * pass: lowercase-tokenize on whitespace, hash each token (FNV-1a
  * over chars + splitmix finisher), combine each n-token window
  * order-sensitively. No shingle strings are ever materialized — the
  * Column-combinator formulation (split → sequence → slice →
  * concat_ws → xxhash) allocates two strings per shingle and runs
  * interpreted; this is a tight JVM loop emitting longs.
  *
  * MinHash/LSH only ever consume shingle HASHES, so this is the whole
  * shingling cost for near-dedup at 100 TB: a narrow map, linear in
  * text size, nothing shuffled.
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(v: Any): Any =
    ShingleHashes.compute(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.ShingleHashes.compute($a, $n)")

  override protected def withNewChildInternal(c: Expression): ShingleHashes =
    copy(child = c)
}

object ShingleHashes {

  def of(text: Column, n: Int): Column =
    ColumnShim.column(ShingleHashes(ColumnShim.expression(text), n))

  /** Called from interpreted eval AND generated code. */
  def compute(text: UTF8String, n: Int): GenericArrayData = {
    val s = text.toString
    val len = s.length
    // pass 1: token hashes (FNV-1a over lowercased chars, mixed)
    val tokenHashes = new java.util.ArrayList[java.lang.Long]()
    var i = 0
    while (i < len) {
      while (i < len && Character.isWhitespace(s.charAt(i))) i += 1
      if (i < len) {
        var h = 0xcbf29ce484222325L
        while (i < len && !Character.isWhitespace(s.charAt(i))) {
          h = (h ^ Character.toLowerCase(s.charAt(i))) * 0x100000001b3L
          i += 1
        }
        tokenHashes.add(Mix64.mix(h))
      }
    }
    val t = tokenHashes.size()
    val m = t - n + 1
    if (m <= 0) return new GenericArrayData(new Array[Long](0))
    // pass 2: order-sensitive combine of each n-token window
    val out = new Array[Long](m)
    var w = 0
    while (w < m) {
      var acc = 0x2545F4914F6CDD1DL
      var j = 0
      while (j < n) {
        acc = Mix64.mix(acc * 0xD1B54A32D192ED03L + tokenHashes.get(w + j))
        j += 1
      }
      out(w) = acc
      w += 1
    }
    new GenericArrayData(out)
  }
}
