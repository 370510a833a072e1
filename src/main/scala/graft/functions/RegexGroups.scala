package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass multi-group regex extraction: matches `pattern` once per
  * input line and returns all capture groups as a struct
  * (`g1..gN` as string), or NULL for non-matching lines.
  *
  * This is the log-parse hot path (reference: sql/lparser.go:96-130,
  * one Go regexp FindStringSubmatch per line). The naive Spark
  * formulation — `rlike` to drop non-matches plus one
  * `regexp_extract` per field — runs the automaton fields+1 times per
  * line; at 100 TB of logs that multiplier dominates the scan. Here
  * the automaton runs once, inside whole-stage codegen.
  */
case class RegexGroups(child: Expression, pattern: String, numGroups: Int)
    extends UnaryExpression {

  @transient private lazy val compiled: Pattern = Pattern.compile(pattern)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"regex_groups expects a string argument, got ${child.dataType}")

  override def dataType: DataType =
    StructType((1 to numGroups).map(i => StructField(s"g$i", StringType, nullable = true)))

  override def nullable: Boolean = true
  override def prettyName: String = "regex_groups"

  override def nullSafeEval(input: Any): Any = {
    val m = compiled.matcher(input.asInstanceOf[UTF8String].toString)
    if (!m.find()) null
    else {
      val arr = new Array[Any](numGroups)
      var i = 0
      while (i < numGroups) {
        val g = m.group(i + 1)
        arr(i) = if (g == null) null else UTF8String.fromString(g)
        i += 1
      }
      new GenericInternalRow(arr)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patRef = ctx.addReferenceObj("pattern", compiled, classOf[Pattern].getName)
    val childGen = child.genCode(ctx)
    val m = ctx.freshName("matcher")
    val arr = ctx.freshName("groups")
    val i = ctx.freshName("i")
    val g = ctx.freshName("g")
    val code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        InternalRow ${ev.value} = null;
        if (!${childGen.isNull}) {
          java.util.regex.Matcher $m = $patRef.matcher(${childGen.value}.toString());
          if ($m.find()) {
            Object[] $arr = new Object[$numGroups];
            for (int $i = 0; $i < $numGroups; $i++) {
              String $g = $m.group($i + 1);
              $arr[$i] = $g == null ? null : UTF8String.fromString($g);
            }
            ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow($arr);
            ${ev.isNull} = false;
          }
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression): RegexGroups =
    copy(child = newChild)
}

object RegexGroups {
  def apply(c: Column, pattern: String, numGroups: Int): Column =
    ColumnShim.column(RegexGroups(ColumnShim.expression(c), pattern, numGroups))
}
