package graft.sources

/** A minimal YAML-subset reader — just enough of the grammar to load
  * the reference's `config.yaml` verbatim (reference config/config.go:14-50
  * drives it through gopkg.in/yaml.v3): block mappings, block
  * sequences of mappings (`- key: value`), scalar values (bare,
  * single- or double-quoted, ints, bools), `#` comments, and blank
  * lines. Zero dependencies by design — the build adds no YAML
  * library, and this schema needs none of anchors/aliases/flow
  * collections/multi-line scalars, all of which fail loudly here
  * rather than parse wrong.
  */
object YamlLite {

  sealed trait Node
  final case class Scalar(value: String) extends Node
  final case class Mapping(fields: Vector[(String, Node)]) extends Node {
    def get(key: String): Option[Node] = fields.collectFirst { case (`key`, n) => n }
    def scalar(key: String): Option[String] = get(key).map {
      case Scalar(s) => s
      case other => sys.error(s"yaml: '$key' is a ${kind(other)}, expected a scalar")
    }
  }
  final case class Sequence(items: Vector[Node]) extends Node

  private def kind(n: Node): String = n match {
    case _: Scalar => "scalar"
    case _: Mapping => "mapping"
    case _: Sequence => "sequence"
  }

  private final case class Line(indent: Int, text: String, num: Int)

  /** Parse a document into its top-level mapping. */
  def parse(doc: String): Mapping = {
    val lines = doc.linesIterator.zipWithIndex.flatMap { case (raw, i) =>
      val noComment = stripComment(raw)
      val text = noComment.trim
      if (text.isEmpty) None
      else {
        require(!noComment.startsWith("\t"),
          s"yaml line ${i + 1}: tabs are not indentation in YAML")
        Some(Line(noComment.takeWhile(_ == ' ').length, text, i + 1))
      }
    }.toVector
    require(lines.headOption.forall(_.text != "---") || lines.size > 1,
      "yaml: empty document")
    val body = lines.dropWhile(_.text == "---")
    val (node, rest) = parseBlock(body, body.headOption.map(_.indent).getOrElse(0))
    require(rest.isEmpty, s"yaml line ${rest.head.num}: trailing content '${rest.head.text}'")
    node match {
      case m: Mapping => m
      case other => sys.error(s"yaml: top level is a ${kind(other)}, expected a mapping")
    }
  }

  /** Strip a `#` comment that is not inside quotes: `#` at start of
    * content or preceded by whitespace opens a comment. A quote char
    * only OPENS a string when it can start one in YAML — at content
    * start or after whitespace — so an apostrophe inside a bare
    * scalar (`it's ok  # comment`) does not swallow the comment
    * (found by YamlFuzzSpec's yaml.v3 round-trip property). */
  private[graft] def stripComment(line: String): String = {
    var i = 0
    var quote: Char = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (quote != 0) {
        if (c == quote) quote = 0
      } else if ((c == '"' || c == '\'') &&
          (i == 0 || line.charAt(i - 1).isWhitespace)) quote = c
      else if (c == '#' && (i == 0 || line.charAt(i - 1).isWhitespace))
        return line.substring(0, i)
      i += 1
    }
    line
  }

  /** Parse one block (mapping or sequence) whose entries sit at
    * exactly `indent`; returns the node and the unconsumed lines. */
  private def parseBlock(lines: Vector[Line], indent: Int): (Node, Vector[Line]) = {
    require(lines.nonEmpty, "yaml: empty block")
    if (lines.head.text.startsWith("- ") || lines.head.text == "-")
      parseSeq(lines, indent)
    else parseMap(lines, indent)
  }

  private def parseMap(lines0: Vector[Line], indent: Int): (Node, Vector[Line]) = {
    var lines = lines0
    val fields = Vector.newBuilder[(String, Node)]
    while (lines.nonEmpty && lines.head.indent == indent &&
        !lines.head.text.startsWith("- ") && lines.head.text != "-") {
      val Line(_, text, num) = lines.head
      val colon = keyColon(text)
      require(colon > 0, s"yaml line $num: expected 'key: value', got '$text'")
      val key = unquote(text.substring(0, colon).trim)
      val rest = text.substring(colon + 1).trim
      lines = lines.tail
      if (rest.nonEmpty) fields += key -> scalarNode(rest, num)
      else if (lines.nonEmpty && lines.head.indent > indent) {
        val (child, more) = parseBlock(lines, lines.head.indent)
        fields += key -> child
        lines = more
      } else fields += key -> Scalar("") // `key:` with no body = empty
    }
    require(lines.isEmpty || lines.head.indent <= indent,
      s"yaml line ${lines.head.num}: bad indentation")
    (Mapping(fields.result()), lines)
  }

  private def parseSeq(lines0: Vector[Line], indent: Int): (Node, Vector[Line]) = {
    var lines = lines0
    val items = Vector.newBuilder[Node]
    while (lines.nonEmpty && lines.head.indent == indent &&
        (lines.head.text.startsWith("- ") || lines.head.text == "-")) {
      val Line(_, text, num) = lines.head
      val inline = text.drop(1).trim
      if (inline.isEmpty) { // `-` alone: item is the indented block below
        lines = lines.tail
        require(lines.nonEmpty && lines.head.indent > indent,
          s"yaml line $num: bare '-' with no item")
        val (child, more) = parseBlock(lines, lines.head.indent)
        items += child
        lines = more
      } else if (keyColon(inline) > 0) {
        // `- key: value`: the item is a mapping whose keys sit at the
        // item's inline column (indent + "- ".length)
        val itemIndent = indent + (text.length - inline.length)
        val synthetic = Line(itemIndent, inline, num) +: lines.tail
        val (child, more) = parseMap(synthetic, itemIndent)
        items += child
        lines = more
      } else { // `- scalar`
        items += scalarNode(inline, num)
        lines = lines.tail
      }
    }
    (Sequence(items.result()), lines)
  }

  /** Index of the key/value `:` — the first colon outside quotes that
    * ends the key (followed by space or end-of-text). */
  private def keyColon(text: String): Int = {
    var i = 0
    var quote: Char = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == ':' && (i + 1 == text.length || text.charAt(i + 1) == ' '))
        return i
      i += 1
    }
    -1
  }

  /** A scalar VALUE position: cleanly quoted strings unquote; bare
    * scalars must not smuggle YAML syntax this subset does not
    * implement — flow collections, anchors, aliases, tags, block
    * scalars, and inline nested mappings would all parse as a plain
    * string here while yaml.v3 gives them structure (or an error), so
    * they fail LOUDLY instead of parsing wrong (the subset contract).
    */
  private def scalarNode(raw: String, num: Int): Scalar = {
    val quoted = raw.length >= 2 &&
      ((raw.head == '"' && raw.last == '"') ||
        (raw.head == '\'' && raw.last == '\''))
    if (quoted) Scalar(unquote(raw))
    else {
      require(!"[{&*|>!\"'".contains(raw.head),
        s"yaml line $num: bare value '$raw' starts YAML syntax this " +
          "subset does not implement (flow collection, anchor, alias, " +
          "tag, block scalar, or a malformed quote) — quote the value " +
          "if it is a literal string")
      require(!raw.contains(": ") && !raw.endsWith(":"),
        s"yaml line $num: bare value '$raw' contains a nested 'key:' — " +
          "not valid YAML in a value position; quote the value if it " +
          "is a literal string")
      Scalar(raw)
    }
  }

  private def unquote(s: String): String =
    if (s.length >= 2 && s.head == '"' && s.last == '"') {
      // the double-quoted escapes this schema can contain: \\ \" \n \t
      // (regex values like "(?P<ts__date>\\S+)" hit \\ constantly) — a
      // single left-to-right scan, no placeholder tricks
      val in = s.substring(1, s.length - 1)
      val out = new StringBuilder(in.length)
      var i = 0
      while (i < in.length) {
        val c = in.charAt(i)
        if (c == '\\' && i + 1 < in.length) {
          in.charAt(i + 1) match {
            case '\\' => out.append('\\')
            case '"' => out.append('"')
            case 'n' => out.append('\n')
            case 't' => out.append('\t')
            case other => out.append('\\').append(other) // pass through
          }
          i += 2
        } else { out.append(c); i += 1 }
      }
      out.toString
    } else if (s.length >= 2 && s.head == '\'' && s.last == '\'')
      s.substring(1, s.length - 1).replace("''", "'")
    else s
}
