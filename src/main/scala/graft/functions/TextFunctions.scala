package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for LLM-data pipelines, as pure Catalyst
  * expression trees (whole-stage codegen, no UDFs — a narrow map at
  * 100 TB).
  *
  * Every function here is deliberately expressible in ANSI SQL too,
  * so the DuckDB oracle can verify it bit-for-bit.
  */
object TextFunctions {

  /** Whitespace token count. Empty/blank text counts 0. */
  def tokenCountWs(text: Column): Column =
    when(length(trim(text)) === 0, lit(0L))
      .otherwise(size(split(trim(text), "\\s+")).cast("long"))

  /** BPE-ish subword count: runs of letters, runs of digits, runs of
    * other non-space chars, each optionally preceded by one space —
    * the GPT-2 pre-tokenizer shape, minus lookaheads so the same
    * pattern runs on Java regex and RE2 (DuckDB).
    */
  val BpeishPattern = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"

  def tokenCountBpeish(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeishPattern), lit(0))).cast("long")

  /** Tiny per-language stopword marker sets for the heuristic
    * language ID. Real pipelines would use char n-gram models; the
    * mechanism (score per language over a token set, argmax) is the
    * same and this variant is oracle-verifiable.
    */
  val StopwordSets: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "los"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有")
  )

  /** Languages written without word separators: token-set intersection
    * can never match them (a whole sentence is one "token"), so their
    * markers are matched by substring on the raw text instead.
    */
  val UnsegmentedLangs: Set[String] = Set("zh")

  /** Number of distinct marker words of `lang` present in the text. */
  def langScore(tokens: Column, words: Seq[String]): Column =
    size(array_intersect(tokens, array(words.map(lit): _*))).cast("long")

  /** Marker score for unsegmented scripts: count of markers occurring
    * anywhere in the raw text (substring containment, codegen instr).
    */
  def langScoreUnsegmented(text: Column, words: Seq[String]): Column =
    words.map(w => (instr(text, w) > 0).cast("long")).reduce(_ + _)

  /** Row-local top-token fraction: the share of all tokens taken by
    * the single most frequent token — the same number as
    * [[graft.operators.TextStats.repetition]]'s `top_tok_frac`, but as
    * a pure expression (sorted token array, longest equal run via a
    * higher-order aggregate), so it works per-row in streaming gates
    * where an explode + re-aggregate would need its own shuffle/state.
    * Empty/null text scores 0.0.
    */
  def topTokenFraction(text: Column): Column = {
    val toks = sort_array(split(lower(text), "\\s+"))
    val best = aggregate(toks,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (a, t) => {
        val run = when(t === a.getField("prev"), a.getField("run") + lit(1L))
          .otherwise(lit(1L))
        struct(t.as("prev"), run.as("run"),
          greatest(a.getField("best"), run).as("best"))
      },
      a => a.getField("best"))
    // split("", "\\s+") yields [""], which would score whitespace-only
    // text 1.0 — guard so empty text takes the documented 0.0 path and
    // the curation gate drops it for low quality, not "repetition".
    when(length(trim(text)) > 0,
      best.cast("double") / size(toks).cast("double")).otherwise(lit(0.0))
  }

  /** PII scrub for training corpora: emails and long digit runs
    * replaced by typed placeholder tokens. Pure regexp_replace chain —
    * codegen, narrow, linear; the pattern set is deliberately
    * conservative so the DuckDB oracle (same regex dialect subset)
    * produces byte-identical output.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val LongNumRe = "[0-9]{9,}"
  def redact(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"), LongNumRe, "<NUM>")

  /** Heuristic language ID: argmax of marker-word hit counts, 'und'
    * when nothing matches. Ties break in StopwordSets order (en
    * first), matching the oracle SQL's CASE evaluation order.
    */
  def langId(text: Column): Column = {
    val lowered = lower(text)
    val toks = split(lowered, "\\s+")
    val scores = StopwordSets.map { case (l, ws) =>
      l -> (if (UnsegmentedLangs(l)) langScoreUnsegmented(lowered, ws)
            else langScore(toks, ws))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val firstBest = scores.foldRight(lit("und")) { case ((l, s), acc) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    }
    // foldRight gives later langs as the fallback of earlier ones, so
    // the first (en) wins ties — mirror of a CASE WHEN chain.
    firstBest
  }

  /** Quality score in [0,1]: weighted mix of length band, alpha
    * ratio, and mean word length band — the usual cheap pre-filter
    * before expensive model-based scoring. Integer/bool arithmetic
    * only, so the oracle reproduces it exactly.
    */
  def qualityScore(text: Column): Column = {
    val nChars = length(text)
    val nTokens = tokenCountWs(text)
    val alpha = length(regexp_replace(text, "[^A-Za-z]", ""))
    val alphaRatio = alpha.cast("double") / greatest(nChars, lit(1)).cast("double")
    val meanWordLen = nChars.cast("double") / greatest(nTokens, lit(1)).cast("double")
    val lenOk = (nChars >= 100 && nChars <= 20000).cast("int")
    val wordLenOk = (meanWordLen >= 3.0 && meanWordLen <= 12.0).cast("int")
    round(
      lenOk * 0.3 + wordLenOk * 0.3 + alphaRatio * 0.4,
      4
    )
  }

  /** URL canonicalization for crawl dedup — the normalization CommonCrawl
    * pipelines apply before "same page, different link" dedup:
    *
    *  - scheme and host lowercased; a leading `www.` dropped;
    *  - default ports stripped (`:80` for http, `:443` for https);
    *  - trailing slashes removed from the path;
    *  - tracking parameters (`utm_*`, `fbclid`, `gclid`) dropped from
    *    the query string, remaining params kept in original order;
    *  - the fragment discarded.
    *
    * Pure regexp/array expression chain — codegen'd, narrow, and
    * reproducible verbatim in the oracle's SQL dialect.
    */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rawHost = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val noWww = regexp_replace(rawHost, "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(noWww, ":80$", ""))
      .when(scheme === "https", regexp_replace(noWww, ":443$", ""))
      .otherwise(noWww)
    val path = regexp_replace(
      regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1),
      "/+$", "")
    // anchored before any '#': a '?' inside the fragment (SPA-style
    // "#/route?x=1") is fragment text, not a query string
    val rawQuery = regexp_extract(url, "^[^#]*?\\?([^#]*)", 1)
    val keptParams = filter(split(rawQuery, "&"), p =>
      (p =!= lit("")) && !p.rlike("^(utm_[^=]*|fbclid|gclid)(=|$)"))
    val query = when(size(keptParams) > 0,
      concat(lit("?"), array_join(keptParams, "&"))).otherwise(lit(""))
    concat(scheme, lit("://"), host, path, query)
  }

  /** HTML → text extraction (the first step of every crawl pipeline —
    * WARC response payloads ARE HTML): drop `<script>`/`<style>`
    * blocks (their CONTENT is code, not prose — tag-stripping alone
    * would leak it into the corpus) and comments, strip the remaining
    * tags, decode the core entities (`&amp;` LAST, per the HTML
    * double-escape rule: `&amp;lt;` must surface as the literal text
    * `&lt;`, never `<`), and collapse whitespace.
    *
    * Pure regexp/replace CHAIN — codegen'd, no UDF — with explicit
    * `[ \t\n\r]` classes (never `\s`, whose definition differs
    * across engines) and no backreferences, so the whole extraction
    * replays verbatim in DuckDB's RE2. Tolerance contract:
    * regex-grade bulk extraction — malformed nesting degrades to
    * plain tag-stripping, never an error; a DOM parser is the
    * precision path a 100 TB scan intentionally skips. Entity
    * decoding covers the named forms that dominate crawl text
    * (amp/lt/gt/quot/apos/#39/nbsp); rarer numeric refs pass through
    * as visible literals rather than silently mangling bytes.
    */
  def htmlToText(html: Column): Column = {
    val noScript =
      regexp_replace(html, "(?is)<script\\b[^>]*>.*?</script>", " ")
    val noStyle =
      regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]*>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ",
      "&amp;" -> "&" // last — see the scaladoc
    ).foldLeft(noTags) { case (c, (k, v)) => replace(c, lit(k), lit(v)) }
    trim(regexp_replace(decoded, "[ \\t\\n\\r]+", " "))
  }

  /** HTTP message framing (r18): real WARC `response` records carry
    * `application/http; msgtype=response` payloads — an RFC 9112
    * message (status line + header lines + CRLFCRLF + body), not bare
    * HTML — so the intake chain needs one more split between r43's
    * record decode and t50's extraction. Splitting at the FIRST
    * CRLFCRLF is the whole framing contract: archives store the
    * final captured bytes (chunked/Content-Length re-assembly already
    * happened at crawl time), so everything after the separator is
    * the body verbatim. A message with no CRLFCRLF yields NULL —
    * loud, not a silent identity (the r41/r42 corrupt-accounting
    * discipline at the payload layer). Pure codegen'd
    * instr/substr/regexp — no UDFs in the hot path.
    */
  def httpBody(msg: Column): Column = {
    val p = instr(msg, "\r\n\r\n")
    when(p > 0, msg.substr(p + lit(4), length(msg)))
  }

  /** Status code off the RFC 9112 status line; NULL when the payload
    * does not start with one (not an HTTP response). */
  def httpStatus(msg: Column): Column =
    nullif(regexp_extract(msg, "^HTTP/[0-9.]+ ([0-9]{3})", 1), lit(""))
      .cast("int")

  /** First value of header `name` in the message head, matched
    * case-insensitively (RFC 9110 field names are); NULL when the
    * message has no head (no CRLFCRLF terminator) or no such field.
    * Only the head is searched — a header-shaped line INSIDE the body
    * must never leak out as metadata. */
  def httpHeader(msg: Column, name: String): Column = {
    val p = instr(msg, "\r\n\r\n")
    val head = when(p > 0, msg.substr(lit(1), p - lit(1)))
    nullif(regexp_extract(head,
      "(?im)^" + java.util.regex.Pattern.quote(name) +
        "[ \\t]*:[ \\t]*([^\\r\\n]*)", 1), lit(""))
  }
}
