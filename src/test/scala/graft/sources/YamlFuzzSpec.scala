package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Property-style differential hardening for [[YamlLite]] (the r14
  * verdict's task 7): the subset reader's quoted-scalar / escape /
  * comment / indentation semantics were pinned only by hand-picked
  * cases. Here a seeded generator builds a model AST first, renders
  * it to YAML text through RANDOMIZED formatting choices that yaml.v3
  * treats as equivalent (quote style, indent width, inline and
  * full-line comments, blank lines, optional `---`, inline vs block
  * sequence items), parses the text back, and requires the exact
  * model — so any divergence from the yaml.v3 semantics of those
  * constructs fails the round trip. A second generated set covers
  * what the subset EXCLUDES (flow collections, anchors, aliases,
  * tags, block scalars, inline nested mappings, tab indentation,
  * broken indents) and requires a LOUD rejection on every one —
  * never a silent wrong parse.
  */
class YamlFuzzSpec extends AnyFunSuite {
  import YamlLite.{Mapping, Node, Scalar, Sequence}

  // ---------------------------------------------------------- generator

  private val keyPool = Vector("files", "path", "regex", "filter", "window",
    "size_seconds", "sliding_interval_seconds", "idx_of_ts_field", "sink",
    "to", "formatter", "log", "level", "db_engine", "throttle",
    "buffer_size", "max_elements_in_period", "period_seconds", "do_not_tail")

  private def scalarPool(rnd: Random): String = rnd.nextInt(14) match {
    case 0 => ""                                  // empty value (`key:`)
    case 1 => rnd.nextInt(100000).toString        // ints
    case 2 => if (rnd.nextBoolean()) "true" else "false"
    case 3 => "stdout"
    case 4 => "hello world with spaces"
    case 5 => "a#b-no-space-hash"                 // '#' w/o space: NOT a comment
    case 6 => "(?P<ts__date>\\S+) (?P<level__string>\\w+)" // regex w/ backslashes
    case 7 => "it's got an apostrophe"
    case 8 => "tab\tand\nnewline"                 // forces double quotes
    case 9 => "status == 'active'"                // quotes inside
    case 10 => "key: value lookalike"             // ': ' forces quoting
    case 11 => "trailing-colon:"                  // ':' at end forces quoting
    case 12 => " leading and trailing "           // spaces force quoting
    case 13 => "# looks like a comment"           // '#' head forces quoting
  }

  /** Can this string render as a BARE scalar and round-trip? Mirrors
    * what a real YAML emitter checks before leaving a string unquoted.
    */
  private def bareSafe(s: String): Boolean =
    s.nonEmpty && s.trim == s &&
      !"[{&*|>!\"'-#".contains(s.head) &&
      !s.contains(": ") && !s.endsWith(":") &&
      !s.contains(" #") && !s.exists(c => c == '\n' || c == '\t') &&
      s != "---"

  private def renderScalar(v: String, rnd: Random): String = {
    val style = rnd.nextInt(3) // 0 bare (if safe), 1 double, 2 single
    if (style == 0 && bareSafe(v)) v
    else if (style == 2 && !v.exists(c => c == '\n' || c == '\t') &&
      !v.contains('\\'))
      "'" + v.replace("'", "''") + "'"
    else
      "\"" + v.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n").replace("\t", "\\t") + "\""
  }

  private def genNode(rnd: Random, depth: Int): Node =
    if (depth >= 2) Scalar(scalarPool(rnd))
    else rnd.nextInt(6) match {
      case 0 | 1 | 2 => Scalar(scalarPool(rnd))
      case 3 => genMapping(rnd, depth + 1)
      case 4 => // sequence of mappings (the files: shape)
        Sequence(Vector.fill(1 + rnd.nextInt(3))(genMapping(rnd, depth + 1)))
      case 5 => // sequence of scalars
        Sequence(Vector.fill(1 + rnd.nextInt(3))(Scalar(scalarPool(rnd))))
    }

  private def genMapping(rnd: Random, depth: Int): Mapping = {
    val keys = rnd.shuffle(keyPool).take(1 + rnd.nextInt(4)).toVector
    Mapping(keys.map(k => k -> genNode(rnd, depth)))
  }

  // ---------------------------------------------------------- renderer

  private def render(m: Mapping, rnd: Random): String = {
    val step = 2 + rnd.nextInt(3) // indent width 2..4, fixed per doc
    val out = Vector.newBuilder[String]
    def maybeComment(line: String): String =
      if (rnd.nextInt(5) == 0) line + "  # trailing comment" else line
    def emitNoise(indent: Int): Unit = {
      if (rnd.nextInt(6) == 0) out += ""
      if (rnd.nextInt(6) == 0) out += (" " * indent) + "# full-line comment"
    }
    def emitMapping(m: Mapping, indent: Int): Unit =
      m.fields.foreach { case (k, v) =>
        emitNoise(indent)
        val pad = " " * indent
        v match {
          case Scalar(s) =>
            // empty scalars alternate between the bare `key:` form and
            // an explicitly quoted empty string — both mean Scalar("")
            val r = if (s.isEmpty && rnd.nextBoolean()) ""
                    else renderScalar(s, rnd)
            out += maybeComment(if (r.isEmpty) s"$pad$k:" else s"$pad$k: $r")
          case child: Mapping =>
            out += maybeComment(s"$pad$k:")
            emitMapping(child, indent + step)
          case Sequence(items) =>
            out += maybeComment(s"$pad$k:")
            items.foreach {
              case s: Scalar =>
                out += s"$pad${" " * step}- ${renderScalar(s.value, rnd)}"
              case im: Mapping =>
                if (rnd.nextBoolean()) { // inline first key
                  val (k0, v0) = im.fields.head
                  v0 match {
                    case Scalar(s0) =>
                      val r0 = renderScalar(s0, rnd)
                      out += (s"$pad${" " * step}- " +
                        (if (r0.isEmpty) s"$k0:" else s"$k0: $r0"))
                      emitMapping(Mapping(im.fields.tail),
                        indent + step + 2)
                    case _ => // non-scalar first value: use block form
                      out += s"$pad${" " * step}-"
                      emitMapping(im, indent + 2 * step)
                  }
                } else { // bare '-' with the item as a block below
                  out += s"$pad${" " * step}-"
                  emitMapping(im, indent + 2 * step)
                }
              case sq: Sequence =>
                fail(s"generator emitted nested sequence $sq")
            }
        }
      }
    if (rnd.nextInt(4) == 0) out += "---"
    emitMapping(m, 0)
    out.result().mkString("\n") + (if (rnd.nextBoolean()) "\n" else "")
  }

  /** Inline-rendered seq-of-mapping items with a single field take the
    * `- k: v` line only; an item with further fields at the
    * continuation indent must round-trip too. Both shapes are
    * exercised because emitMapping(tail) emits nothing for one-field
    * items and the continuation block otherwise.
    */

  // ------------------------------------------------------- the property

  test("300 generated config.yaml variants round-trip exactly (quotes, comments, indents, escapes)") {
    val rnd = new Random(20260815L)
    var checked = 0
    while (checked < 300) {
      val model = genMapping(rnd, 0)
      val text = render(model, rnd)
      val got =
        try YamlLite.parse(text)
        catch {
          case e: RuntimeException =>
            fail(s"doc #$checked failed to parse: ${e.getMessage}\n---\n$text")
        }
      assert(got == model, s"doc #$checked diverged\n---\n$text")
      checked += 1
    }
  }

  test("generated unsupported-syntax docs all reject loudly, never parse wrong") {
    val rnd = new Random(42L)
    val bads: Vector[() => String] = Vector(
      () => s"key: [a, b, ${rnd.nextInt(9)}]",          // flow sequence
      () => s"key: {a: ${rnd.nextInt(9)}}",             // flow mapping
      () => s"key: &anchor${rnd.nextInt(9)} value",     // anchor
      () => s"key: *alias${rnd.nextInt(9)}",            // alias
      () => "key: |\n  block scalar",                   // literal block
      () => "key: >\n  folded scalar",                  // folded block
      () => s"key: !!int ${rnd.nextInt(9)}",            // tag
      () => s"key: a${rnd.nextInt(9)}: b",              // inline nested mapping
      () => s"key: \"unterminated v${rnd.nextInt(9)}",  // malformed leading quote
      () => "\tkey: value",                             // tab indentation
      () => s"a: 1\n      b: ${rnd.nextInt(9)}\n  c: 3",// broken indent ladder
      () => s"just a scalar ${rnd.nextInt(9)}",         // top-level scalar
      () => "seq:\n  -",                                // bare '-' with no item
      () => s"- a${rnd.nextInt(9)}\n- b"                // top-level sequence
    )
    var i = 0
    while (i < 100) {
      val mk = bads(i % bads.length)
      val doc = mk()
      val e = intercept[RuntimeException](YamlLite.parse(doc))
      assert(e.getMessage != null && e.getMessage.nonEmpty, doc)
      i += 1
    }
  }

  test("the quote-syntax edge the subset accepts bare: quotes strictly inside a value") {
    // 'status == "error"' style values are bare-legal in YAML and in
    // the subset; only a LEADING quote (malformed or flow-ish) is loud
    val m = YamlLite.parse("""filter: status == "error" or level == 'warn'""")
    assert(m.scalar("filter").contains("""status == "error" or level == 'warn'"""))
    intercept[RuntimeException](YamlLite.parse("""filter: "status == error"""" + " tail"))
  }
}
