package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** JSONL ingestion (r41): malformed lines surface in _corrupt instead
  * of vanishing, a type-mismatched FIELD nulls the field (not the
  * row), and the write→read round trip is exact through JSON string
  * escaping — including embedded newlines, which must stay one line.
  */
class JsonlSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("text", StringType)))

  test("malformed JSON lands in _corrupt with the raw line; valid rows parse") {
    val out = Jsonl.parse(Seq(
        """{"id": 1, "text": "ok"}""",
        """{broken""").toDF("value"), schema)
      .collect()
    assert(out.length == 2)
    val good = out.find(!_.isNullAt(0)).get
    assert(good.getLong(0) == 1L && good.getString(1) == "ok"
      && good.isNullAt(2))
    val bad = out.find(_.isNullAt(0)).get
    assert(bad.getString(2) == "{broken", bad.toString)
  }

  test("a type-mismatched field nulls the FIELD, not the row") {
    val out = Jsonl.parse(
      Seq("""{"id": "oops", "text": "kept"}""").toDF("value"), schema)
      .collect().head
    assert(out.isNullAt(0) && out.getString(1) == "kept")
  }

  test("round trip is exact, embedded newline stays one JSONL line") {
    val df = Seq((7L, "line one\nline two\ttab \"quoted\"")).toDF("id", "text")
    val lines = Jsonl.toJsonl(df, col("id"), col("text"))
    assert(lines.count() == 1)
    assert(!lines.head.getString(0).contains("\n"))
    val back = Jsonl.parse(lines, schema).collect().head
    assert(back.getLong(0) == 7L
      && back.getString(1) == "line one\nline two\ttab \"quoted\"")
  }

  test("the reserved _corrupt name in the caller schema is rejected") {
    intercept[IllegalArgumentException] {
      Jsonl.parse(Seq("{}").toDF("value"),
        StructType(Seq(StructField("_corrupt", StringType))))
    }
  }
}
