package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL (one JSON object per line) ingestion — the format raw crawl
  * dumps actually arrive in ahead of everything else this library
  * does. Parsing is `from_json` with an EXPLICIT caller schema
  * (schema inference over 100 TB is a full extra pass and a
  * correctness trap — a field that is long in one shard and string in
  * another infers differently per shard), PERMISSIVE mode, and LOUD
  * corrupt-record accounting: a line that fails to parse keeps its
  * raw text in `_corrupt` instead of vanishing — silent row loss at
  * ingestion is unrecoverable downstream, so the caller decides
  * whether to quarantine or fail.
  *
  * Shape at scale: one narrow row-local pass (from_json is a codegen
  * expression), no shuffle; corrupt accounting is a column, not a
  * filter, so healthy and corrupt rows ride the same scan.
  *
  * The r41 query pins the round-trip identity: to_json(row) parsed
  * back equals the row, bit for bit, through JSON string escaping —
  * the same format(parse(x)) == x oracle relation the regex line
  * parser (r01) uses.
  */
object Jsonl {

  /** Format rows as JSONL lines (the write half; embedded newlines
    * escape to \n so one row is always one line). */
  def toJsonl(df: DataFrame, cols: Column*): DataFrame =
    df.select(to_json(struct(cols: _*)).as("value"))

  /** Parse JSONL lines under an explicit schema. Output columns: the
    * schema's fields plus `_corrupt` (the raw line when the object
    * failed to parse, null otherwise). A type-mismatched FIELD inside
    * valid JSON nulls that field (PERMISSIVE semantics); only
    * malformed JSON marks the row corrupt.
    */
  def parse(lines: DataFrame, schema: StructType,
            lineCol: String = "value"): DataFrame = {
    require(!schema.fieldNames.contains("_corrupt"),
      "Jsonl.parse: _corrupt is reserved for the corrupt-record column")
    // PERMISSIVE from_json yields an all-null struct for malformed
    // input (not a null struct), so corrupt detection needs the
    // dedicated corrupt-record column in the parse schema
    val full = schema.add("_corrupt", org.apache.spark.sql.types.StringType)
    val parsed = lines.select(
      from_json(col(lineCol), full,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> "_corrupt")).as("_j"))
    parsed.select(
      (schema.fieldNames.toSeq :+ "_corrupt")
        .map(f => col("_j").getField(f).as(f)): _*)
  }
}
