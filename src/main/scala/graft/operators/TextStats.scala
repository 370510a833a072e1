package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-statistics operators for training-data curation that need
  * DataFrame shape (explode + re-aggregate), unlike the pure
  * per-row expression trees in [[graft.functions.TextFunctions]].
  */
object TextStats {

  /** Gopher-style repetition metrics per document: the fraction of all
    * tokens taken by the single most frequent token, and likewise for
    * bigrams — high values mark boilerplate/spam ("click here click
    * here ...") that length or alpha-ratio filters miss.
    *
    * Shape at scale: explode to (doc, gram) then two hash aggregations
    * keyed on (doc, gram) and doc — map-side partial aggregation does
    * the heavy lifting because repeated grams collapse locally; no
    * document-sized rows ever shuffle. Output: (id, n_toks,
    * top_tok_frac, top_bigram_frac), fractions rounded to 6.
    */
  def repetition(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    def topFrac(n: Int, frac: String, total: Option[String]) = {
      val counts = Dedup.shinglesRaw(df, idCol, textCol, n)
        .groupBy(col("id"), col("shingle")).agg(count(lit(1)).as("c"))
        .groupBy(col("id"))
        .agg((max(col("c")).cast("double") / sum(col("c")).cast("double")).as(frac),
          sum(col("c")).cast("long").as(total.getOrElse("_n")))
      if (total.isDefined) counts else counts.drop("_n")
    }
    topFrac(1, "top_tok_frac", Some("n_toks"))
      .join(topFrac(2, "top_bigram_frac", None), Seq("id"), "left")
      .select(col("id"), col("n_toks"),
        round(col("top_tok_frac"), 6).as("top_tok_frac"),
        round(coalesce(col("top_bigram_frac"), lit(0.0)), 6).as("top_bigram_frac"))
  }

  /** C4-style boilerplate removal: drop every LINE that occurs in at
    * least `minDocs` distinct documents (nav menus, cookie banners,
    * copyright footers — the text that repeats across a crawl), then
    * reassemble each document from its surviving lines in order.
    *
    * Shape at scale: explode to (doc, pos, line), count distinct docs
    * per line (two-phase aggregate — map-side partials collapse the
    * repeats that make a line boilerplate in the first place), then an
    * anti-join against the frequent-line set. That set is bounded by
    * total_lines / minDocs — usually broadcast-sized, but the bound
    * grows LINEARLY with the corpus, so the broadcast decision is left
    * to the planner (AQE): a typical run broadcasts, a pathological
    * one (trillions of lines, low minDocs) degrades to a shuffled
    * anti-join instead of collecting an unbounded set on the driver.
    * Reassembly is one doc-id
    * shuffle (array_sort over (pos, line) structs, then join).
    * Output: (id, text_clean, n_kept, n_dropped); documents whose
    * every line was boilerplate drop out entirely (nothing remains).
    */
  def stripRepeatedLines(df: DataFrame, idCol: String, textCol: String,
                         minDocs: Long): DataFrame = {
    val lines = df.select(col(idCol).as("id"),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    // empty lines are STRUCTURE (paragraph breaks), not boilerplate:
    // any corpus where >= minDocs docs contain a blank line would
    // otherwise strip every "\n\n" separator and silently break the
    // downstream paragraph-level pass (Dedup.paraDedup)
    val frequent = lines.groupBy(col("line"))
      .agg(countDistinct(col("id")).as("_nd"))
      .filter(col("_nd") >= minDocs && length(col("line")) > 0)
      .select(col("line"))
    val totals = lines.groupBy(col("id")).agg(count(lit(1)).as("_n_tot"))
    lines.join(frequent, Seq("line"), "left_anti")
      .groupBy(col("id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("line")))),
          s => s("line")), "\n").as("text_clean"),
        count(lit(1)).as("_n_kept"))
      .join(totals, "id")
      .select(col("id"), col("text_clean"),
        col("_n_kept").cast("long").as("n_kept"),
        (col("_n_tot") - col("_n_kept")).cast("long").as("n_dropped"))
  }

  /** C4 line-level cleaning (Raffel et al. 2020, "Exploring the
    * Limits of Transfer Learning", §2.2 — the heuristics that built
    * the C4 corpus). Per LINE, keep only lines that end in a terminal
    * punctuation mark (`.` `!` `?` `"`), carry at least 3 whitespace
    * words, and mention neither "javascript" nor a boilerplate policy
    * phrase ("privacy policy" / "terms of use" / "cookie policy" /
    * "uses cookies" / "use of cookies" / "use cookies" — the full
    * cookie-variant set C4's published implementation matches).
    * Per PAGE, drop the whole document if it
    * contains "lorem ipsum" or a curly brace (template/code debris),
    * or if fewer than `minKeptLines` lines survive (the paper's
    * "fewer than 5 sentences" page floor, expressed in kept lines).
    * Survivors are reassembled from their kept lines in order.
    *
    * The cross-document complement is [[stripRepeatedLines]] (t12):
    * C4's rules are all WITHIN one row, so unlike t12 this needs no
    * corpus-wide line frequency — the whole operator is one narrow
    * row-local filter + projection, ZERO shuffles, embarrassingly
    * parallel at any corpus size. (The line predicates run in an
    * interpreted higher-order filter; regex CPU dominates that
    * overhead and nothing here ever leaves its input partition.)
    * Output: (id, text_clean, n_kept, n_dropped).
    */
  /** The C4 per-line keep predicate and page rule as bare Column
    * expressions, so the batch operator ([[c4LineFilter]]) and the
    * streaming gate ([[graft.streaming.CurateStream.c4Gate]]) share
    * ONE tree and agree line-for-line by construction. */
  def c4KeepLine(l: Column): Column = {
    val t = trim(l)
    val lt = lower(t)
    t.rlike("[.!?\"]$") &&
      size(split(t, "\\s+")) >= 3 &&
      !lt.contains("javascript") &&
      !lt.contains("privacy policy") && !lt.contains("terms of use") &&
      !lt.contains("cookie policy") && !lt.contains("uses cookies") &&
      !lt.contains("use of cookies") && !lt.contains("use cookies")
  }

  def c4PageOk(text: Column): Column =
    !lower(text).contains("lorem ipsum") && !text.contains("{")

  /** Line split shared by the batch operator and the streaming gate:
    * `\r?\n` so CRLF crawl pages neither smuggle a trailing \r into
    * kept lines nor diverge from the RE2 oracle (Java's `$` matches
    * before a final \r, RE2's does not — splitting the \r away makes
    * the question moot on both engines). */
  def c4Lines(text: Column): Column = split(text, "\r?\n")

  def c4LineFilter(df: DataFrame, idCol: String, textCol: String,
                   minKeptLines: Int = 3): DataFrame =
    df.select(col(idCol).as("id"), col(textCol).as("_text"))
      .filter(c4PageOk(col("_text")))
      .select(col("id"), c4Lines(col("_text")).as("_ls"))
      .withColumn("_kept", filter(col("_ls"), c4KeepLine _))
      .filter(size(col("_kept")) >= minKeptLines)
      .select(col("id"),
        array_join(col("_kept"), "\n").as("text_clean"),
        size(col("_kept")).cast("long").as("n_kept"),
        (size(col("_ls")) - size(col("_kept"))).cast("long").as("n_dropped"))

  /** Flesch–Kincaid grade level (Kincaid et al. 1975), the classic
    * readability score quality filters threshold on:
    * 0.39·(words/sentences) + 11.8·(syllables/word) − 15.59.
    * Sentences use the same lookbehind-free RE2-safe segmentation as
    * [[graft.operators.Dedup.spanDedup]] (an oracle replays it
    * exactly); syllables are the standard vowel-group approximation
    * ([aeiouy]+ runs, floor 1 per word — consonant-only tokens count
    * one syllable, as every FK implementation does).
    *
    * Shape at scale: ONE narrow row-local projection, zero shuffles —
    * every signal is a within-document count (the per-word syllable
    * pass is an interpreted higher-order transform; regex CPU
    * dominates that overhead and nothing leaves its partition). Docs
    * with no words carry no evidence and drop out (the t-family
    * convention). The grade is computed in one fixed double
    * expression over exact integer counts, rounded to 6 — identical
    * in any engine. Output: (id, n_sents, n_words, n_syllables,
    * fk_grade).
    */
  def readability(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sents = filter(
      transform(
        regexp_extract_all(col(textCol),
          lit("[^.!?]+[.!?]+|[^.!?]+"), lit(0)),
        s => trim(s)),
      s => length(s) > 0)
    val words = filter(split(lower(col(textCol)), "\\s+"),
      t => length(t) > 0)
    val syllables = aggregate(
      transform(words, w => greatest(lit(1),
        size(regexp_extract_all(w, lit("[aeiouy]+"), lit(0))))),
      lit(0L), (acc, s) => acc + s)
    df.select(col(idCol).as("id"),
        size(sents).cast("long").as("n_sents"),
        size(words).cast("long").as("n_words"),
        syllables.as("n_syllables"))
      // both counts must be positive: a punctuation-only doc ("...")
      // splits to one "word" but ZERO sentences (no non-terminator
      // char for the segmentation to anchor on) and would divide by
      // zero — no-evidence docs drop, never score
      .filter(col("n_words") > 0 && col("n_sents") > 0)
      .withColumn("fk_grade", round(
        lit(0.39) * (col("n_words").cast("double") / col("n_sents").cast("double")) +
        lit(11.8) * (col("n_syllables").cast("double") / col("n_words").cast("double")) -
        lit(15.59), 6))
  }

  /** Collapse RUNS of consecutive identical lines within a document
    * to a single occurrence — terminal spam ("loading..." floods,
    * progress bars), copy-paste stutters, repeated paragraphs. The
    * intra-doc twin of [[stripRepeatedLines]] (which scrubs CROSS-doc
    * boilerplate); non-adjacent repeats are [[repetition]]'s metric
    * territory and stay untouched here.
    *
    * Shape at scale: lines explode narrow; run detection is one lag()
    * window on (id ORDER BY pos) and the reassembly groupBy rides the
    * SAME id partitioning — one shuffle end to end.
    * Output: (id, text_clean, n_kept, n_dropped).
    */
  def collapseRepeatRuns(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
    df.select(col(idCol).as("id"),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .withColumn("_prev", lag(col("line"), 1).over(w))
      .withColumn("_keep", col("_prev").isNull || col("_prev") =!= col("line"))
      .groupBy(col("id"))
      .agg(
        array_join(transform(array_sort(collect_list(
            when(col("_keep"), struct(col("pos"), col("line"))))),
          s => s("line")), "\n").as("text_clean"),
        count(when(col("_keep"), lit(1))).cast("long").as("n_kept"),
        (count(lit(1)) - count(when(col("_keep"), lit(1))))
          .cast("long").as("n_dropped"))
  }

  /** Within-document token entropy: H = -sum_t p_t ln p_t over the
    * doc's own token distribution. Low entropy marks repetitive /
    * template text (the "click here click here" failure mode) from a
    * different angle than [[repetition]]'s top-fraction metrics — a
    * doc cycling five tokens evenly fools top-frac but not entropy.
    *
    * Shape at scale: one (doc, token) count aggregate; the per-doc
    * total rides a window over the SAME doc key (no extra exchange),
    * and the final per-doc sum reuses that partitioning. Per-term
    * contributions are rounded then DECIMAL-summed — deterministic
    * under any partitioning, exact against the oracle.
    * Output: (id, n_toks, token_entropy).
    */
  /** VOCABULARY COVERAGE CURVE (the tokenizer-budget planning number:
    * what share of the corpus's token MASS does a top-k vocabulary
    * cover — the curve that decides vocab size before a BPE train,
    * complementing t33's type-growth and t24's rank-frequency fit):
    * terms rank by (count desc, term asc) — a total order — and each
    * requested cut k reports the exact covered mass at rank ≤ k.
    *
    * Shape at scale: one (term) aggregate with map-side combine; the
    * global rank is a window over the VOCABULARY (term-grain, not the
    * corpus — the t09 stated-bound contract); cuts are a broadcast
    * axis. Exact long counts; ONE pinned division per cut.
    * Output: (vocab_k, n_terms, covered_tokens, total_tokens,
    * coverage), ordered by vocab_k.
    */
  def vocabCoverage(df: DataFrame, textCol: String,
                    cuts: Seq[Long]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(cuts.nonEmpty && cuts.forall(_ >= 1), "vocabCoverage: cuts must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    // sealed: the term-grain ranked vocabulary computes ONCE and both
    // consumers (total + the cut join) read the materialized frame
    val counts = Caching.sealOver(
      df.select(explode(split(lower(col(textCol)), "\\s+")).as("tok"))
        .filter(length(col("tok")) > 0)
        .groupBy(col("tok")).agg(count(lit(1)).as("_c"))
        .withColumn("_rk", row_number()
          .over(Window.orderBy(col("_c").desc, col("tok"))).cast("long")))
    val total = counts.agg(sum(col("_c")).cast("long").as("_tot"))
    val ks = broadcast(cuts.distinct.sorted.toDF("vocab_k"))
    counts.crossJoin(ks)
      .filter(col("_rk") <= col("vocab_k"))
      .groupBy(col("vocab_k"))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("_c")).cast("long").as("covered_tokens"))
      .crossJoin(broadcast(total))
      .select(col("vocab_k"), col("n_terms"), col("covered_tokens"),
        col("_tot").as("total_tokens"),
        round(col("covered_tokens").cast("double")
          / col("_tot").cast("double"), 6).as("coverage"))
      .orderBy("vocab_k")
  }

  def tokenEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.select(col(idCol).as("id"),
        explode(split(lower(col(textCol)), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("id"), col("tok")).agg(count(lit(1)).as("_c"))
    val withN = counts.withColumn("_n",
      sum(col("_c")).over(Window.partitionBy(col("id"))))
    val p = col("_c").cast("double") / col("_n").cast("double")
    withN
      .withColumn("_term", round(p * log(p), 6).cast("decimal(24,8)"))
      .groupBy(col("id"))
      .agg(max(col("_n")).cast("long").as("n_toks"),
        round(-sum(col("_term")).cast("double"), 6).as("token_entropy"))
  }

  /** Unigram language-model quality score: mean log-probability of a
    * document's tokens under the corpus's own unigram distribution —
    * the cheap stand-in for a KenLM perplexity filter. Gibberish and
    * rare-token spam score low; fluent text built from common tokens
    * scores high.
    *
    * Shape at scale: one token explode feeds both the vocabulary count
    * and the scoring join. A plain shuffle join on `tok` would
    * concentrate the Zipf head ("the", "a") onto a handful of tasks,
    * so the scoring join is SPLIT: the top-`headVocab` tokens by count
    * — which carry almost all token OCCURRENCES — join as a broadcast
    * (no shuffle of the exploded stream at all), and only the
    * unmatched residual, the Zipf tail where every token is rare and
    * the key distribution is flat, takes the shuffle join. Per-token
    * log-probs are rounded then DECIMAL-summed so the per-doc mean is
    * order-independent — bit-identical under any partitioning, and
    * against the oracle. Output: (id, n_toks, mean_logprob).
    */
  def unigramLogProb(df: DataFrame, idCol: String, textCol: String,
                     headVocab: Int = 65536): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
        explode(split(lower(col(textCol)), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("_n"))
    val total = vocab.agg(sum(col("_n")).as("_total"))
    joinHeadResidual(toks, vocab, "tok", "_n", headVocab)
      .crossJoin(broadcast(total))
      .withColumn("_lp",
        round(log(col("_n").cast("double") / col("_total").cast("double")), 6)
          .cast("decimal(24,8)"))
      .groupBy(col("id"))
      .agg(count(lit(1)).cast("long").as("n_toks"),
        round(sum(col("_lp")).cast("double") / count(lit(1)), 6).as("mean_logprob"))
  }

  /** Gopher quality rules (Rae et al. 2021, Appendix A1): the
    * published per-document heuristic filter bundle, each signal
    * surfaced alongside the composite pass/fail so a pipeline can
    * audit WHY a document was dropped (t02's qualityScore is a soft
    * score; this is the named hard-filter standard):
    *
    *  - word count in [50, 100000]
    *  - mean word length in [3, 10]
    *  - symbol-to-word ratio ('#' or '...') <= 0.1
    *  - < 90% of lines start with a bullet, < 30% end with ellipsis
    *  - >= 80% of words contain an alphabetic character
    *  - >= 2 occurrences of common English stop words
    *
    * Pure per-row projection — zero shuffles, scales as a narrow
    * map at any corpus size. The token-level predicates run as
    * higher-order filters over the doc's own token array (bounded by
    * document length; interpreted, but per-row — nothing here feeds
    * a hot million-iteration inner loop the way the shingle family
    * does). Thresholds compare the ROUNDED ratios, so the pass flag
    * is bit-portable. Output: (id, n_words, mean_word_len,
    * symbol_ratio, bullet_frac, ellipsis_frac, alpha_frac, n_stop,
    * pass).
    */
  /** The seven Gopher signals as named expression columns over one
    * text column — the single source of truth shared by the batch
    * report ([[gopherRules]]) and the streaming gate
    * (`CurateStream.gopherGate` filters on [[gopherPass]] built from
    * these), so the two can never drift.
    */
  private def gopherSignals(text: Column): Seq[(String, Column)] = {
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val toks = filter(split(text, "\\s+"), t => length(t) > 0)
    val lines = split(text, "\n")
    val nWords = size(toks).cast("long")
    val nWordsSafe = greatest(nWords, lit(1L)).cast("double")
    val charsInToks = length(regexp_replace(text, "\\s", ""))
    val nHash = length(text) - length(regexp_replace(text, "#", ""))
    val nEllipsis = (length(text) -
      length(regexp_replace(text, "\\.\\.\\.", ""))) / 3
    val nLines = greatest(size(lines), lit(1)).cast("double")
    val bulletLines = size(filter(lines, l =>
      ltrim(l).startsWith("-") || ltrim(l).startsWith("*") ||
        ltrim(l).startsWith("•")))
    val ellipsisLines = size(filter(lines, l => rtrim(l).endsWith("...")))
    val alphaWords = size(filter(toks, t => t.rlike("[A-Za-z]")))
    val stopHits = size(filter(toks, t => lower(t).isin(stops: _*)))
    Seq(
      "n_words" -> nWords,
      "mean_word_len" -> round(charsInToks.cast("double") / nWordsSafe, 6),
      "symbol_ratio" -> round((nHash + nEllipsis).cast("double") / nWordsSafe, 6),
      "bullet_frac" -> round(bulletLines.cast("double") / nLines, 6),
      "ellipsis_frac" -> round(ellipsisLines.cast("double") / nLines, 6),
      "alpha_frac" -> round(alphaWords.cast("double") / nWordsSafe, 6),
      "n_stop" -> stopHits.cast("long"))
  }

  /** The composite Gopher verdict as ONE boolean expression —
    * thresholds compare the ROUNDED ratios, so the flag is
    * bit-portable and identical between the batch report and the
    * streaming gate. Pure projection: usable as a streaming filter
    * with no state and no shuffle.
    */
  def gopherPass(text: Column): Column = {
    val s = gopherSignals(text).toMap
    s("n_words") >= 50L && s("n_words") <= 100000L &&
      s("mean_word_len") >= 3.0 && s("mean_word_len") <= 10.0 &&
      s("symbol_ratio") <= 0.1 &&
      s("bullet_frac") < 0.9 && s("ellipsis_frac") < 0.3 &&
      s("alpha_frac") >= 0.8 && s("n_stop") >= 2L
  }

  def gopherRules(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id") +:
      gopherSignals(col(textCol)).map { case (n, c) => c.as(n) } :+
      TextStats.gopherPass(col(textCol)).as("pass"): _*)

  /** Gopher repetition rules (Rae et al. 2021 Table A1, the A2
    * half — [[gopherRules]] is the A1 quality half): per document,
    *
    *  - `dup_line_frac`: line occurrences beyond a line's first
    *    appearance / total lines; `dup_line_char_frac`: the same in
    *    line characters (both <= their thresholds for repetitive
    *    boilerplate docs)
    *  - `top_{2,3,4}gram_char_frac`: characters claimed by the most
    *    frequent word n-gram (count x gram length, ties to the
    *    lexicographically first gram) / document characters
    *  - `dup_{5..10}gram_char_frac`: characters claimed by ALL
    *    duplicated n-grams (sum of count x length over grams with
    *    count >= 2) / document characters — the occurrence-sum
    *    convention (overlaps counted, so > 1 is possible on
    *    degenerate docs), deterministic and engine-portable
    *  - `pass`: the paper's thresholds over the ROUNDED fractions
    *    (0.30/0.20 lines, 0.20/0.18/0.16 top, 0.15..0.10 dup)
    *
    * Shape at scale: ONE narrow row-local projection, zero shuffles —
    * every A2 signal is a within-document aggregate, so the gram
    * counting runs inside [[graft.functions.RepetitionStats]] (a
    * compiled expression: one count-map pass per n over the doc's own
    * token array) instead of exploding nine corpus-wide gram streams
    * into an (id, n, gram) shuffle that carries no cross-row
    * information. Docs with fewer than 2 tokens have no gram
    * evidence and drop out (matching the t-family convention).
    */
  private val dupGramThresholds =
    Map(5 -> 0.15, 6 -> 0.14, 7 -> 0.13, 8 -> 0.12, 9 -> 0.11, 10 -> 0.10)

  /** The eleven A2 fractions as named expression columns over one
    * text column — the shared tree of the batch report
    * ([[gopherRepetition]]) and the streaming gate
    * (`CurateStream.repetitionGate` filters on [[repetitionPass]]).
    */
  private def repetitionFracs(text: Column): Seq[(String, Column)] = {
    val lines = split(text, "\n")
    val nLines = size(lines).cast("double")
    val dLines = size(array_distinct(lines)).cast("double")
    val lineChars = aggregate(transform(lines, l => length(l).cast("long")),
      lit(0L), (acc, x) => acc + x).cast("double")
    val dLineChars = aggregate(transform(array_distinct(lines), l => length(l).cast("long")),
      lit(0L), (acc, x) => acc + x).cast("double")
    val toksArr = filter(split(lower(text), "\\s+"), t => length(t) > 0)
    val tc = greatest(length(text), lit(1)).cast("double")
    Seq(
      "dup_line_frac" -> round((nLines - dLines) / greatest(nLines, lit(1.0)), 6),
      "dup_line_char_frac" ->
        round((lineChars - dLineChars) / greatest(lineChars, lit(1.0)), 6)) ++
    Seq(2, 3, 4).map(n => s"top_${n}gram_char_frac" ->
      round(graft.functions.RepetitionStats.of(toksArr, n).getField("topc")
        .cast("double") / tc, 6)) ++
    (5 to 10).map(n => s"dup_${n}gram_char_frac" ->
      round(graft.functions.RepetitionStats.of(toksArr, n).getField("dupc")
        .cast("double") / tc, 6))
  }

  /** The composite A2 verdict as ONE boolean expression over the
    * ROUNDED fractions — stateless and shuffle-free, so it gates a
    * stream identically to the batch report's `pass` column. Docs
    * with no n-grams score 0 on every gram fraction and pass those
    * rules vacuously (no repetition evidence keeps the doc, the
    * dirty-input rule — where the batch REPORT simply omits docs
    * with < 2 tokens).
    */
  def repetitionPass(text: Column): Column = {
    val f = repetitionFracs(text).toMap
    f("dup_line_frac") <= 0.30 && f("dup_line_char_frac") <= 0.20 &&
      f("top_2gram_char_frac") <= 0.20 && f("top_3gram_char_frac") <= 0.18 &&
      f("top_4gram_char_frac") <= 0.16 &&
      (5 to 10).map(n => f(s"dup_${n}gram_char_frac") <= dupGramThresholds(n))
        .reduce(_ && _)
  }

  def gopherRepetition(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val text = col(textCol)
    val toksArr = filter(split(lower(text), "\\s+"), t => length(t) > 0)
    df.filter(size(toksArr) >= 2)
      .select(col(idCol).as("id") +:
        repetitionFracs(text).map { case (n, c) => c.as(n) } :+
        repetitionPass(text).as("pass"): _*)
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): score
    * every document with the unigram-LM quality score
    * ([[unigramLogProb]] — the KenLM stand-in), then cut each
    * language's score distribution into head / middle / tail terciles
    * — the buckets CCNet samples from to bias a corpus toward
    * Wikipedia-like text without hard-dropping the tail.
    *
    * Buckets are assigned BY SCORE VALUE, not per-row rank: a doc is
    * `head` when strictly-better-scoring docs of its language make up
    * < 1/3 of that language, `middle` below 2/3, else `tail` — docs
    * with equal scores land in the same bucket (deterministic, and
    * portable: no rank tie-break needed).
    *
    * Shape at scale: the corpus itself never windows. The tercile cut
    * runs on the per-(lang, score) HISTOGRAM — bounded by distinct
    * rounded scores per language, orders of magnitude smaller than
    * the corpus — and the strictly-greater cumulative count is a
    * window over that small frame; assignment joins the bucket of
    * each (lang, score) back to the scored docs on the same key the
    * histogram grouped on. (CCNet itself estimates the cutoffs on a
    * sample; the histogram form is exact at the same shuffle cost,
    * and the q25 sketch family is the approximation lever if even
    * the histogram is too wide.)
    * Output: (id, lang, mean_logprob, bucket).
    */
  def pplBuckets(df: DataFrame, idCol: String, textCol: String,
                 langCol: String): DataFrame =
    bucketByLangTercile(
      unigramLogProb(df, idCol, textCol)
        .join(df.select(col(idCol).as("id"), col(langCol).as("lang")), "id")
        .select(col("id"), col("lang"), col("mean_logprob")))

  /** CCNet bucketing under the CROSS-SLICE backoff LM — the
    * composition Wenzek et al. 2020 actually describe: the LM trains
    * on a clean reference slice (their Wikipedia KenLM; here
    * [[stupidBackoff]]'s `lmPred` rows) and the whole corpus buckets
    * per language by its score under THAT model. t18 is the
    * self-scored stand-in (the corpus trains on itself, so backoff
    * never fires); this is the deployable form — out-of-domain text
    * falls to the backed-off unigram floor, landing in the tail of
    * its own language's distribution instead of borrowing in-domain
    * bigram mass. Same histogram tercile cut, shared code
    * ([[bucketByLangTercile]] — the two bucketers cannot drift).
    * Docs with fewer than two tokens have no bigram evidence and
    * drop (the t30 rule). Output: (id, lang, mean_logprob, bucket).
    */
  def backoffPplBuckets(df: DataFrame, idCol: String, textCol: String,
                        langCol: String, lmPred: Column,
                        alpha: Double = 0.4): DataFrame =
    bucketByLangTercile(
      stupidBackoff(df, idCol, textCol, lmPred, alpha)
        .join(df.select(col(idCol).as("id"), col(langCol).as("lang")), "id")
        .select(col("id"), col("lang"), col("mean_logprob")))

  /** The shared CCNet tercile assignment over a scored (id, lang,
    * mean_logprob) frame: cut each language's score distribution into
    * head/middle/tail BY VALUE on the (lang, score) histogram — the
    * corpus never windows; see [[pplBuckets]] for the full contract.
    */
  private def bucketByLangTercile(scored0: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // persisted: the scored frame (the expensive full-corpus LM pass)
    // feeds BOTH the histogram and the final assignment join; the
    // narrow per-doc result seals over it below
    val scored = scored0.persist()
    val hist = scored.groupBy(col("lang"), col("mean_logprob"))
      .agg(count(lit(1)).as("_c"))
    val wl = Window.partitionBy(col("lang")).orderBy(col("mean_logprob").desc)
    val cut = hist
      .withColumn("_before", coalesce(sum(col("_c")).over(
        wl.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("_n", sum(col("_c")).over(Window.partitionBy(col("lang"))))
      .withColumn("_frac", col("_before").cast("double") / col("_n").cast("double"))
      .select(col("lang"), col("mean_logprob"),
        when(col("_frac") < lit(1.0) / 3.0, "head")
          .when(col("_frac") < lit(2.0) / 3.0, "middle")
          .otherwise("tail").as("bucket"))
    Caching.sealOver(
      scored.join(cut, Seq("lang", "mean_logprob"))
        .select(col("id"), col("lang"), col("mean_logprob"), col("bucket")),
      scored)
  }

  /** Broadcast-head / shuffled-residual count join shared by the LM
    * scorers: attach `counts`' `countCol` to `stream` on `key`,
    * routing the top-`headVocab` keys by count through a BROADCAST
    * join (the Zipf mass — the exploded stream never shuffles for
    * them) and only the flat-keyed residual tail through the shuffle
    * join. The head is a distributed top-K (TakeOrdered, key
    * tie-break: deterministic); 64K (key, count) pairs broadcast in
    * single MBs.
    */
  private def joinHeadResidual(stream: DataFrame, counts: DataFrame,
                               key: String, countCol: String,
                               headVocab: Int,
                               residualJoin: String = "inner"): DataFrame = {
    val head = counts.orderBy(col(countCol).desc, col(key)).limit(headVocab)
    val tagged = stream.join(broadcast(head), Seq(key), "left")
    val headHits = tagged.filter(col(countCol).isNotNull)
    val residual = tagged.filter(col(countCol).isNull).drop(countCol)
      .join(counts.join(broadcast(head.select(col(key))), Seq(key), "left_anti"),
        Seq(key), residualJoin)
    headHits.unionByName(residual)
  }

  /** Multi-column variant of [[joinHeadResidual]]: the stats frame
    * carries several columns per key (ordered into the broadcast head
    * by `orderCol`). Same Zipf-head split — broadcast the top keys,
    * shuffle-join only the residual tail.
    */
  private def joinHeadResidualCols(stream: DataFrame, stats: DataFrame,
                                   key: String, orderCol: String,
                                   headVocab: Int): DataFrame = {
    val statCols = stats.columns.filter(_ != key)
    val head = stats.orderBy(col(orderCol).desc, col(key)).limit(headVocab)
    val tagged = stream.join(broadcast(head), Seq(key), "left")
    val headHits = tagged.filter(col(orderCol).isNotNull)
    val residual = statCols.foldLeft(tagged.filter(col(orderCol).isNull))(_ drop _)
      .join(stats.join(broadcast(head.select(col(key))), Seq(key), "left_anti"),
        Seq(key))
    headHits.unionByName(residual)
  }

  /** LEFT-residual variant of [[joinHeadResidual]]: rows whose key
    * the counts frame never saw come back with `countCol` NULL
    * instead of dropping — the backoff scorer needs to SEE unseen
    * keys. Same skew split, one implementation (the residual join
    * type is the only difference).
    */
  private def leftJoinHeadResidual(stream: DataFrame, counts: DataFrame,
                                   key: String, countCol: String,
                                   headVocab: Int): DataFrame =
    joinHeadResidual(stream, counts, key, countCol, headVocab, "left")

  /** PMI collocation mining (Church & Hanks 1990, the standard
    * association measure): the top-k adjacent token pairs by
    * pointwise mutual information ln(p(a,b) / (p(a)·p(b))) — the
    * pairs that co-occur far above chance ("new york", "machine
    * learning"), with a minimum pair-count floor (PMI's known bias
    * toward hapax pairs — a pair seen once between two rare tokens
    * maxes the score on no evidence; the floor is the published
    * remedy).
    *
    * Shape at scale: one corpus pair aggregate (map-side partials)
    * collapses the stream to the pair histogram; the count floor
    * then shrinks it to the collocation candidates, which join the
    * vocab counts BROADCAST (candidates are the small side by
    * construction); the final top-k is TakeOrderedAndProject. The
    * per-pair double arithmetic is a fixed expression over exact
    * integer counts, rounded to 6 — oracle-exact.
    * Output: (w1, w2, n_pair, pmi).
    */
  def pmiTopK(df: DataFrame, textCol: String, minCount: Long,
              k: Int): DataFrame = {
    require(minCount >= 1 && k >= 1,
      s"pmiTopK: minCount $minCount and k $k must be positive")
    val toksArr = filter(split(lower(col(textCol)), "\\s+"),
      t => length(t) > 0)
    val pairs = df.select(toksArr.as("_t"))
      .filter(size(col("_t")) >= 2)
      .select(explode(graft.functions.ShingleStrings.of(col("_t"), 2)).as("_g"))
      .select(substring_index(col("_g"), " ", 1).as("w1"),
        substring_index(col("_g"), " ", -1).as("w2"))
    // the caches sit on the VOCAB side of the aggregates, not on the
    // corpus-scale pair stream: bc feeds the bigram total + the
    // candidates, uni feeds both join sides + the token total — each
    // a bounded histogram, orders of magnitude under the raw pairs
    val bc = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_pair"))
      .persist()
    val m = bc.agg(sum(col("n_pair")).as("_m"))
    val uni = df.select(explode(toksArr).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("_c"))
      .persist()
    val n = uni.agg(sum(col("_c")).as("_n"))
    val cand = bc.filter(col("n_pair") >= minCount)
    Caching.sealOver(
      cand
        .join(uni.select(col("w").as("w1"), col("_c").as("_ca")), "w1")
        .join(uni.select(col("w").as("w2"), col("_c").as("_cb")), "w2")
        .crossJoin(broadcast(m)).crossJoin(broadcast(n))
        .withColumn("pmi", round(log(
          (col("n_pair").cast("double") / col("_m").cast("double")) /
            ((col("_ca").cast("double") / col("_n").cast("double")) *
              (col("_cb").cast("double") / col("_n").cast("double")))), 6))
        .select(col("w1"), col("w2"), col("n_pair"), col("pmi"))
        .orderBy(col("pmi").desc, col("w1"), col("w2"))
        .limit(k),
      bc, uni)
  }

  /** N-gram novelty score (the copying/memorization diagnostic of
    * McCoy et al. 2023 "How much do language models copy" / the Lee
    * et al. 2021 duplication family, pointed at DOCUMENTS: what
    * fraction of a doc's distinct k-grams appears nowhere else in
    * the corpus). Templated and boilerplate-heavy docs score low —
    * most of their grams recur elsewhere — while original text
    * scores near 1; the d16/d18 substring family REPORTS and CUTS
    * duplicated spans, this scores each document by them.
    *
    * Shape at scale: the distinct (doc, gram-digest) stream feeds
    * the gram document-frequency aggregate and the scoring join
    * (persisted, two consumers, sealed over by the per-doc result —
    * the dupGrams rule); the join key is the gram digest, whose
    * heaviest keys are exactly the boilerplate a pipeline strips
    * with t12/d23 first (AQE skew-join handles what remains, the
    * d16 contract). Docs with fewer than k tokens have no grams and
    * drop (the t16 no-evidence rule).
    * Output: (id, n_grams, n_novel, novelty).
    */
  def ngramNovelty(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 3): DataFrame = {
    require(k >= 1, s"ngramNovelty: k $k must be >= 1")
    val grams = Dedup.shingles(df, idCol, textCol, k)
      .select(col("id"), unhex(md5(col("shingle"))).as("_h"))
      .persist()
    val dfreq = grams.groupBy(col("_h")).agg(count(lit(1)).as("_df"))
    Caching.sealOver(
      grams.join(dfreq, "_h")
        .groupBy(col("id"))
        .agg(count(lit(1)).cast("long").as("n_grams"),
          sum(when(col("_df") === 1L, 1L).otherwise(0L)).cast("long").as("n_novel"))
        .withColumn("novelty", round(
          col("n_novel").cast("double") / col("n_grams").cast("double"), 6)),
      grams)
  }

  /** Stupid Backoff LM score (Brants et al. 2007 §3, "Large Language
    * Models in Machine Translation"): score every document's adjacent
    * token pairs under a REFERENCE SLICE's bigram model —
    *
    *   S(w2|w1) = c(w1,w2) / c(w1·)          if the slice saw the pair
    *            = α · (c(w2)+1) / (N+V)      otherwise (α = 0.4)
    *
    * — the paper's non-normalized backoff with its published α; the
    * unigram floor is add-1 smoothed (the t23/p07 smoothing rule) so
    * tokens the slice never saw score finitely instead of −∞. Unlike
    * t13/t16, where the corpus scores itself and every bigram is seen
    * at least once by construction (backoff could never fire), the
    * model here trains on `lmPred` rows ONLY and scores everything:
    * the cross-slice fluency filter — in-domain text rides bigram
    * mass, out-of-domain text falls to backed-off unigrams. Documents
    * with fewer than two tokens drop (the t16 no-evidence rule).
    *
    * Shape at scale: ONE pair explode (tagged with the slice flag)
    * feeds the bigram counts, the prefix counts, and the scoring
    * stream; the slice's token stream feeds the unigram floor. The
    * scoring left-join runs on the near-flat (w1,w2) key first, then
    * splits on the hit flag: hits attach prefix counts via the t13
    * broadcast-head/residual device (the Zipf skew lives on the
    * prefix key), misses attach unigram counts via its LEFT variant
    * (unseen tokens must score, not drop). Per-pair logs round then
    * DECIMAL-sum — order-independent, oracle-exact.
    * Output: (id, n_bigrams, mean_logprob).
    */
  def stupidBackoff(df: DataFrame, idCol: String, textCol: String,
                    lmPred: Column, alpha: Double = 0.4,
                    headVocab: Int = 65536): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"stupidBackoff: alpha $alpha not in (0,1]")
    val toksArr = filter(split(lower(col(textCol)), "\\s+"),
      t => length(t) > 0)
    // persisted: the pair stream feeds three consumers (bigram
    // counts, prefix counts, scoring); sealed over by the per-doc
    // result, the t16 rule
    val pairs = df.select(col(idCol).as("id"), lmPred.as("_lm"), toksArr.as("_t"))
      .filter(size(col("_t")) >= 2)
      .select(col("id"), col("_lm"),
        explode(graft.functions.ShingleStrings.of(col("_t"), 2)).as("_g"))
      .select(col("id"), col("_lm"),
        substring_index(col("_g"), " ", 1).as("w1"),
        substring_index(col("_g"), " ", -1).as("w2"))
      .persist()
    val bigramCounts = pairs.filter(col("_lm")).groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("_nb"))
    val prefixCounts = pairs.filter(col("_lm")).groupBy(col("w1"))
      .agg(count(lit(1)).as("_np"))
    // persisted: the vocab-sized unigram frame feeds FOUR consumers
    // (head limit twice via broadcast, the anti-joined residual side,
    // and the totals aggregate) — unpersisted, each would re-run the
    // slice's full tokenize+explode+groupBy
    val uniCounts = df.filter(lmPred)
      .select(explode(toksArr).as("w2"))
      .groupBy(col("w2")).agg(count(lit(1)).as("_nu"))
      .persist()
    // an empty reference slice leaves the model undefined — fail
    // loudly (the mixtureSample contract), not NULL-score everything
    val uniTot = uniCounts.agg(sum(col("_nu")).as("_n"), count(lit(1)).as("_v"))
      .withColumn("_n", when(col("_n").isNull,
        raise_error(lit("stupidBackoff: lmPred selects no rows — no model to back off to")))
        .otherwise(col("_n")))
    val tagged = pairs.join(bigramCounts, Seq("w1", "w2"), "left")
    val hits = joinHeadResidual(tagged.filter(col("_nb").isNotNull),
        prefixCounts, "w1", "_np", headVocab)
      .withColumn("_lp",
        round(log(col("_nb").cast("double") / col("_np").cast("double")), 6)
          .cast("decimal(24,8)"))
      .select(col("id"), col("_lp"))
    val misses = leftJoinHeadResidual(tagged.filter(col("_nb").isNull),
        uniCounts, "w2", "_nu", headVocab)
      .crossJoin(broadcast(uniTot))
      .withColumn("_lp",
        round(log(lit(alpha) *
          ((coalesce(col("_nu"), lit(0L)) + lit(1L)).cast("double") /
            (col("_n") + col("_v")).cast("double"))), 6)
          .cast("decimal(24,8)"))
      .select(col("id"), col("_lp"))
    Caching.sealOver(
      hits.unionByName(misses)
        .groupBy(col("id"))
        .agg(count(lit(1)).cast("long").as("n_bigrams"),
          round(sum(col("_lp")).cast("double") / count(lit(1)), 6).as("mean_logprob")),
      pairs, uniCounts)
  }

  /** Interpolated Kneser-Ney bigram score (Kneser & Ney 1995; the
    * formulation of Chen & Goodman 1999 §2.7 — the smoothing KenLM
    * ships and every serious LM-data quality filter ultimately runs):
    *
    *   P(w2|w1) = max(c(w1,w2) − D, 0)/c(w1·)
    *            + D·N1+(w1·)/c(w1·) · N1+(·w2)/|bigram types|
    *
    * The continuation term is KN's insight over plain absolute
    * discounting: a word's backoff mass follows how many DISTINCT
    * contexts it completes, not its raw frequency — "francisco" is
    * frequent but only ever follows "san", so it gets almost no
    * backoff mass and word salad containing it scores honestly low
    * where t30's unigram floor would reward it. Self-scored on the
    * corpus (the t16 regime: every scored pair was seen, so the
    * discounted term is positive by construction and the
    * interpolation never needs a zero branch).
    *
    * Shape at scale: ONE pair explode; the bigram histogram persists
    * and derives ALL model stats — prefix totals + continuation
    * fan-in are aggregates of the (much smaller) bigram-type frame,
    * the type count is one scalar broadcast. Scoring joins the
    * near-flat bigram key first, then prefix stats and continuation
    * counts via the broadcast-head/residual device (the Zipf skew
    * lives on BOTH unigram keys: every "the …" shares prefix "the",
    * every "… the" shares continuation "the"). Per-pair doubles are
    * a fixed expression over exact longs; each logprob rounds to 6
    * decimals and converts to EXACT integer micros, and the per-doc
    * mean is an integer half-away-from-zero division of the micro
    * sum — the t16 family's final round(double-sum / n) can flip on
    * a half-tie when the two engines' round primitives disagree at
    * the boundary (hit once at sf0.1 here); the all-integer mean
    * cannot.
    * Output: (id, n_bigrams, mean_logprob).
    */
  def kneserNey(df: DataFrame, idCol: String, textCol: String,
                discount: Double = 0.75, headVocab: Int = 65536): DataFrame = {
    require(discount > 0 && discount < 1,
      s"kneserNey: discount $discount must be in (0,1)")
    val toksArr = filter(split(lower(col(textCol)), "\\s+"),
      t => length(t) > 0)
    val pairs = df.select(col(idCol).as("id"), toksArr.as("_t"))
      .filter(size(col("_t")) >= 2)
      .select(col("id"),
        explode(graft.functions.ShingleStrings.of(col("_t"), 2)).as("_g"))
      .select(col("id"),
        substring_index(col("_g"), " ", 1).as("w1"),
        substring_index(col("_g"), " ", -1).as("w2"))
      .persist()
    // persisted: the bigram-TYPE frame feeds four consumers (prefix
    // stats, continuation fan-in, the type-count scalar, scoring)
    val bigramCounts = pairs.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("_nb")).persist()
    val prefixStats = bigramCounts.groupBy(col("w1"))
      .agg(sum(col("_nb")).as("_np"), count(lit(1)).as("_t1"))
    val contCounts = bigramCounts.groupBy(col("w2"))
      .agg(count(lit(1)).as("_cont"))
    val bb = bigramCounts.agg(count(lit(1)).as("_bb"))
    val scored = pairs.join(bigramCounts, Seq("w1", "w2"))
    val p = (col("_nb").cast("double") - lit(discount)) / col("_np").cast("double") +
      lit(discount) * col("_t1").cast("double") / col("_np").cast("double") *
        (col("_cont").cast("double") / col("_bb").cast("double"))
    Caching.sealOver(
      joinHeadResidual(
          joinHeadResidualCols(scored, prefixStats, "w1", "_np", headVocab),
          contCounts, "w2", "_cont", headVocab)
        .crossJoin(broadcast(bb))
        // decimal cast of the rounded double is exact (shortest-
        // string), so the micros are the 6-decimal logprob bit-for-bit
        .withColumn("_lpm",
          (round(log(p), 6).cast("decimal(24,6)") * lit(1000000L)).cast("long"))
        .groupBy(col("id"))
        .agg(count(lit(1)).cast("long").as("n_bigrams"),
          sum(col("_lpm")).as("_s"))
        // p <= 1 termwise, so every _lpm <= 0: half-away-from-zero
        // mean via positive-operand integer division (floor == trunc)
        .withColumn("mean_logprob",
          (-expr("((-_s) * 2 + n_bigrams) div (2 * n_bigrams)"))
            .cast("double") / lit(1000000.0))
        .select(col("id"), col("n_bigrams"), col("mean_logprob")),
      pairs, bigramCounts)
  }

  /** CCNet bucketing under the KNESER-NEY score — the tercile cut
    * ([[bucketByLangTercile]], shared with t18/t36 so the three
    * bucketers cannot drift) over [[kneserNey]]'s per-doc scores:
    * the closest self-contained stand-in for CCNet's actual
    * KenLM-perplexity terciles, since interpolated KN IS KenLM's
    * smoothing. Docs with fewer than two tokens drop (no bigram
    * evidence). Output: (id, lang, mean_logprob, bucket).
    */
  def knBuckets(df: DataFrame, idCol: String, textCol: String,
                langCol: String, discount: Double = 0.75): DataFrame =
    bucketByLangTercile(
      kneserNey(df, idCol, textCol, discount)
        .join(df.select(col(idCol).as("id"), col(langCol).as("lang")), "id")
        .select(col("id"), col("lang"), col("mean_logprob")))

  /** Bigram language-model quality score: mean CONDITIONAL
    * log-probability log(c(w1,w2) / c(w1·)) of a document's adjacent
    * token pairs under the corpus's own bigram counts — one Markov
    * order up from [[unigramLogProb]] on the way to a KenLM-style
    * filter: catches fluent-token word salad (common tokens in
    * impossible orders) that any unigram score misses by
    * construction. Documents with fewer than two tokens have no
    * bigram evidence and drop out (the caller's no-evidence rule
    * applies, as with the LM floor).
    *
    * Shape at scale: one exploded (id, w1, w2) pair stream feeds the
    * bigram counts, the prefix counts c(w1·) ride the SAME stream
    * grouped by w1, and scoring joins both back. The bigram-key join
    * runs first — its key space is near-flat (the heaviest bigram is
    * far rarer than the heaviest token). The Zipf-head skew lives on
    * the PREFIX key (every "the …" pair shares prefix "the"), so that
    * join takes the same broadcast-top-K-head + residual-tail split
    * as [[unigramLogProb]]. Per-pair log-probs round then
    * DECIMAL-sum: order-independent, oracle-exact.
    * Output: (id, n_bigrams, mean_logprob).
    */
  def bigramLogProb(df: DataFrame, idCol: String, textCol: String,
                    headVocab: Int = 65536): DataFrame = {
    val toksArr = filter(split(lower(col(textCol)), "\\s+"),
      t => length(t) > 0)
    // persisted: the pair build feeds THREE consumers (bigram counts,
    // prefix counts, scoring); the small per-doc result seals over it.
    // Pairs come from the COMPILED shingle_strings pass at n=2 (the
    // transform+struct+element_at combinator runs interpreted — HOFs
    // don't codegen) split on the single gram space: tokens are
    // whitespace runs, so they contain no space and the split is
    // byte-exact (pinned by the unchanged t16 oracle hash).
    val pairs = df.select(col(idCol).as("id"), toksArr.as("_t"))
      .filter(size(col("_t")) >= 2)
      .select(col("id"),
        explode(graft.functions.ShingleStrings.of(col("_t"), 2)).as("_g"))
      .select(col("id"),
        substring_index(col("_g"), " ", 1).as("w1"),
        substring_index(col("_g"), " ", -1).as("w2"))
      .persist()
    val bigramCounts = pairs.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("_nb"))
    val prefixCounts = pairs.groupBy(col("w1")).agg(count(lit(1)).as("_np"))
    val scored = pairs.join(bigramCounts, Seq("w1", "w2"))
    Caching.sealOver(
      joinHeadResidual(scored, prefixCounts, "w1", "_np", headVocab)
        .withColumn("_lp",
          round(log(col("_nb").cast("double") / col("_np").cast("double")), 6)
            .cast("decimal(24,8)"))
        .groupBy(col("id"))
        .agg(count(lit(1)).cast("long").as("n_bigrams"),
          round(sum(col("_lp")).cast("double") / count(lit(1)), 6).as("mean_logprob")),
      pairs)
  }

  /** Corpus divergence report: for each group (source/domain/shard),
    * KL(P_g || Q) and cross-entropy H(P_g, Q) of the group's add-1
    * smoothed unigram distribution against the whole corpus's — the
    * data-mixture diagnostic that says WHICH slice drifts from the
    * blend and by how many nats (DSIR's target/raw contrast, scored
    * per source instead of per document).
    *
    * Both sums nominally run over the FULL joint vocabulary — every
    * group × every token, including tokens the group never uses. The
    * absent terms would be |V| × groups blowup at corpus scale, but
    * under add-1 smoothing an absent token's p is the constant
    * p0_g = 1/(N_g+|V|), so their contribution factors exactly:
    *   Σ_{t∉g} p0 ln(p0/q_t) = p0·(|V|−V_g)·ln p0 − p0·(lnQ − lnQ_g)
    * with lnQ = Σ_V ln q_t and lnQ_g its present-token slice. The op
    * therefore touches only nnz = Σ_g V_g (group, token) pairs plus
    * one |V|-sized aggregate — no cross join anywhere.
    *
    * Determinism: per-term doubles are identical in both engines
    * (ratios of exact integers, one ln), rounded to 6 and
    * DECIMAL-summed; the factored correction combines those exact
    * decimals and exact BIGINT counts in a fixed expression shape —
    * oracle-exact. The (group, token) join key carries no Zipf skew:
    * the nnz frame holds DISTINCT pairs, so a token appears at most
    * #groups times. Output: (group, n_toks, n_types, kl, ce).
    */
  def corpusDivergence(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val (res, counts) = corpusDivergenceRaw(df, groupCol, textCol)
    Caching.sealOver(res, counts)
  }

  /** Unsealed internals: (result, persisted nnz counts frame). The
    * plan specs assert on the result's shape BEFORE sealOver hides it
    * behind a checkpoint scan; callers use [[corpusDivergence]].
    */
  private[graft] def corpusDivergenceRaw(
      df: DataFrame, groupCol: String, textCol: String): (DataFrame, DataFrame) = {
    val counts = df.select(col(groupCol).as("grp"),
        explode(split(lower(col(textCol)), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("grp"), col("tok")).agg(count(lit(1)).as("_c"))
      .persist()
    val vocab = counts.groupBy(col("tok")).agg(sum(col("_c")).as("_ct"))
    val tot = vocab.agg(count(lit(1)).as("_v"), sum(col("_ct")).as("_n"))
    // ln q_t rounded once, reused by every consumer — the decimal is
    // the cross-engine contract
    val lnq = vocab.crossJoin(broadcast(tot))
      .withColumn("_lnq", round(log((col("_ct") + 1L).cast("double") /
        (col("_n") + col("_v")).cast("double")), 6).cast("decimal(24,8)"))
      .select(col("tok"), col("_lnq"))
    val lnQAll = lnq.agg(sum(col("_lnq")).as("_lnq_all"))
    val grpTot = counts.groupBy(col("grp"))
      .agg(sum(col("_c")).as("_ng"), count(lit(1)).as("_vg"))
    // present-token terms: p and q from exact integers via the
    // broadcast totals; the join key (tok) is skew-free on this
    // distinct-pair frame
    val joined = counts.join(lnq, Seq("tok"))
      .join(broadcast(grpTot), Seq("grp"))
      .crossJoin(broadcast(tot))
    val p = (col("_c") + 1L).cast("double") /
      (col("_ng") + col("_v")).cast("double")
    val perGrp = joined
      .withColumn("_kl_t",
        round(p * (log(p) - col("_lnq").cast("double")), 6).cast("decimal(24,8)"))
      .withColumn("_ce_t", round(-p * col("_lnq").cast("double"), 6)
        .cast("decimal(24,8)"))
      .groupBy(col("grp"))
      .agg(sum(col("_kl_t")).as("_s_kl"), sum(col("_ce_t")).as("_s_ce"),
        sum(col("_lnq")).as("_lnq_g"))
    val res = perGrp.join(broadcast(grpTot), Seq("grp"))
      .crossJoin(broadcast(tot)).crossJoin(broadcast(lnQAll))
    // absent-token correction, identical expression shape both engines
    val p0 = lit(1.0) / (col("_ng") + col("_v")).cast("double")
    val absent = (col("_v") - col("_vg")).cast("double")
    val lnqGap = (col("_lnq_all") - col("_lnq_g")).cast("double")
    (res.select(col("grp").as(groupCol),
      col("_ng").cast("long").as("n_toks"),
      col("_vg").cast("long").as("n_types"),
      round(col("_s_kl").cast("double") +
        p0 * (absent * log(p0) - lnqGap), 6).as("kl"),
      round(col("_s_ce").cast("double") - p0 * lnqGap, 6).as("ce")),
      counts)
  }

  /** Zipf's-law fit: least-squares slope of ln(freq) on ln(rank) over
    * the corpus's top-`topR` tokens — natural text sits near
    * alpha ≈ 1; machine-generated or templated corpora drift, so the
    * exponent (with its r² goodness) is a one-number corpus health
    * check (Zipf 1949; the diagnostic CCNet §4 eyeballs as a
    * frequency plot).
    *
    * Shape at scale: the vocabulary aggregate collapses the corpus to
    * distinct tokens; top-R is a TakeOrdered (no global sort), and
    * everything after runs on R ≤ a few thousand rows — the
    * unpartitioned rank window scans R rows, never the corpus. The
    * closed form needs only the five rounded-then-DECIMAL-summed
    * moment sums (Σx, Σy, Σxy, Σx², Σy²), so the result is
    * deterministic under any partitioning and oracle-exact.
    * Output: one row (n_ranks, alpha, intercept, r2).
    */
  /** Lexical diversity per document: type-token ratio and its
    * length-corrected forms — root TTR (Guiraud's index) and
    * Herdan's C = ln V / ln N. Plain TTR shrinks with length by
    * Heaps' law, so the corrected forms are what a quality filter
    * thresholds on: templated/spammy text repeats its vocabulary and
    * scores low at any length (the same signal family as t14's token
    * entropy, but the standard named indices).
    *
    * Everything is row-local — tokenize, distinct, count inside one
    * projection — ZERO shuffles; undefined indices (empty docs; a
    * one-token doc for Herdan's ln N = 0) are null, not guessed.
    * Output: (id, n_tokens, n_types, ttr, root_ttr, herdan_c).
    */
  def lexicalDiversity(df: DataFrame, idCol: String,
                       textCol: String): DataFrame = {
    val toks = filter(split(lower(col(textCol)), "\\s+"), t => length(t) > 0)
    val nTok = size(toks).cast("long")
    val nTyp = size(array_distinct(toks)).cast("long")
    val nT = col("n_tokens").cast("double")
    val nV = col("n_types").cast("double")
    df.select(col(idCol).as("id"), nTok.as("n_tokens"), nTyp.as("n_types"))
      .withColumn("ttr",
        when(col("n_tokens") > 0, round(nV / nT, 6)))
      .withColumn("root_ttr",
        when(col("n_tokens") > 0, round(nV / sqrt(nT), 6)))
      .withColumn("herdan_c",
        when(col("n_tokens") > 1, round(log(nV) / log(nT), 6)))
  }

  /** BPE merge-candidate statistics (Sennrich et al. 2016 §3.2, the
    * first training iteration): adjacent character-pair frequencies
    * over the corpus, the argmax being the tokenizer's first merge.
    * Counting runs the way the reference algorithm trains — on the
    * token HISTOGRAM, not the token stream: the corpus collapses to
    * (distinct word, count) first, and the pair explode touches only
    * vocabulary rows (≪ corpus by Heaps' law), each pair weighted by
    * its word's frequency. Every pair POSITION counts ("aaaa"
    * contributes three "aa"), matching the reference count.
    *
    * Shape at scale: one corpus-wide token aggregate (partial agg
    * collapses repeats map-side), then all remaining work is
    * vocab-sized; the final top-K is a TakeOrdered, no global sort.
    * Output: (pair, n) — the top `topK` merge candidates.
    */
  def bpePairStats(df: DataFrame, textCol: String, topK: Int = 30): DataFrame = {
    val words = df.select(explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")) > 1) // a 1-char word holds no pair
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
    words
      // sequence end is >= 1 because of the length filter, so the
      // descending-sequence trap (sequence(1,0) = [1,0]) can't fire
      .select(col("wc"), explode(expr(
        "transform(sequence(1, char_length(w) - 1), i -> substr(w, i, 2))"))
        .as("pair"))
      .groupBy(col("pair")).agg(sum(col("wc")).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(topK)
  }

  /** Heaps'-law fit (Heaps 1978 / Herdan's law): V(N) ≈ K·N^β — the
    * vocabulary-growth companion of [[zipfFit]], the second of the
    * two classic corpus laws and the other one-number drift check:
    * natural English sits near β ≈ 0.4–0.6, templated/machine text
    * drifts LOW (vocabulary saturates), OCR-noise/spam drifts HIGH
    * (every page mints new "words").
    *
    * Growth points are doc-id-ordered corpus prefixes at `points`
    * equal cutoffs of the id range — computed WITHOUT a scan per
    * point: prefix token totals are conditional sums over the token
    * stream, and prefix vocabularies fall out of each token's FIRST
    * document (one vocab-sized min aggregate; a token is in prefix c
    * iff its first doc is). The ln V on ln N least-squares fit then
    * runs the t24 moment discipline (rounded-6 decimals) over the
    * `points` rows. Cutoffs are exact integer arithmetic on
    * max(id)+1, collected driver-side (one bounded scalar, the
    * trainCoarse rule). Degenerate corpora (all docs in one band)
    * give zero x-variance and surface NULL fit fields rather than a
    * made-up slope. Output: (n_points, beta, ln_k, r2).
    */
  def heapsFit(df: DataFrame, idCol: String, textCol: String,
               points: Int = 8): DataFrame = {
    require(points >= 2, s"heapsFit: points $points must be >= 2")
    val mm = df.agg(min(col(idCol).cast("long")), max(col(idCol).cast("long"))).head()
    require(!mm.isNullAt(1), "heapsFit: corpus has no non-null ids")
    // negative ids would make the cutoff arithmetic diverge between
    // Scala's truncating and SQL's flooring division (the packGreedy
    // rule — there it raises per row; here the bounded min/max scan
    // already exists, so the guard rides it)
    require(mm.getLong(0) >= 0,
      s"heapsFit: negative id ${mm.getLong(0)} — prefix cutoffs shard non-portably")
    val span = mm.getLong(1) + 1L
    require(span <= Long.MaxValue / points,
      s"heapsFit: id range $span overflows the cutoff arithmetic")
    val cuts = (1 to points).map(k => span * k / points)
    val toks = df.select(col(idCol).cast("long").as("id"),
        explode(split(lower(col(textCol)), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0 && col("id").isNotNull)
      .persist() // two consumers: prefix totals + first-doc vocab
    val nCols = cuts.zipWithIndex.map { case (c, i) =>
      sum(when(col("id") < c, 1L).otherwise(0L)).as(s"_n$i") }
    val nAgg = toks.agg(nCols.head, nCols.tail: _*)
    val vCols = cuts.zipWithIndex.map { case (c, i) =>
      sum(when(col("_mid") < c, 1L).otherwise(0L)).as(s"_v$i") }
    val vAgg = toks.groupBy(col("tok")).agg(min(col("id")).as("_mid"))
      .agg(vCols.head, vCols.tail: _*)
    val pts = nAgg.crossJoin(vAgg)
      .select(explode(array(cuts.indices.map(i =>
        struct(col(s"_n$i").as("nn"), col(s"_v$i").as("vv"))): _*)).as("_p"))
      .select(col("_p.nn").as("_nn"), col("_p.vv").as("_vv"))
      .filter(col("_nn") > 0 && col("_vv") > 0)
    val x = log(col("_nn").cast("double"))
    val y = log(col("_vv").cast("double"))
    def dec(c: Column) = round(c, 6).cast("decimal(24,8)")
    val sums = pts.select(dec(x).as("_x"), dec(y).as("_y"),
        dec(x * y).as("_xy"), dec(x * x).as("_xx"), dec(y * y).as("_yy"))
      .agg(count(lit(1)).as("_n"), sum(col("_x")).as("_sx"),
        sum(col("_y")).as("_sy"), sum(col("_xy")).as("_sxy"),
        sum(col("_xx")).as("_sxx"), sum(col("_yy")).as("_syy"))
    val n = col("_n").cast("double")
    def d(name: String) = col(name).cast("double")
    val covN = n * d("_sxy") - d("_sx") * d("_sy")
    val varN = n * d("_sxx") - d("_sx") * d("_sx")
    val varYN = n * d("_syy") - d("_sy") * d("_sy")
    Caching.sealOver(
      sums.select(col("_n").cast("long").as("n_points"),
        round(covN / varN, 6).as("beta"),
        round((d("_sy") - (covN / varN) * d("_sx")) / n, 6).as("ln_k"),
        round((covN * covN) / (varN * varYN), 6).as("r2")),
      toks)
  }

  def zipfFit(df: DataFrame, textCol: String, topR: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val top = df.select(explode(split(lower(col(textCol)), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("tok")).agg(count(lit(1)).as("_c"))
      .orderBy(col("_c").desc, col("tok")).limit(topR)
    // R rows post-limit: the global window is O(topR) by construction
    val ranked = top.withColumn("_r",
      row_number().over(Window.orderBy(col("_c").desc, col("tok"))))
    val x = log(col("_r").cast("double"))
    val y = log(col("_c").cast("double"))
    def dec(c: Column) = round(c, 6).cast("decimal(24,8)")
    val sums = ranked.select(dec(x).as("_x"), dec(y).as("_y"),
        dec(x * y).as("_xy"), dec(x * x).as("_xx"), dec(y * y).as("_yy"))
      .agg(count(lit(1)).as("_n"), sum(col("_x")).as("_sx"),
        sum(col("_y")).as("_sy"), sum(col("_xy")).as("_sxy"),
        sum(col("_xx")).as("_sxx"), sum(col("_yy")).as("_syy"))
    val n = col("_n").cast("double")
    def d(name: String) = col(name).cast("double")
    val covN = n * d("_sxy") - d("_sx") * d("_sy")
    val varN = n * d("_sxx") - d("_sx") * d("_sx")
    val varYN = n * d("_syy") - d("_sy") * d("_sy")
    sums.select(col("_n").cast("long").as("n_ranks"),
      round(-(covN / varN), 6).as("alpha"),
      round((d("_sy") - (covN / varN) * d("_sx")) / n, 6).as("intercept"),
      round((covN * covN) / (varN * varYN), 6).as("r2"))
  }

  /** Byte-pair-encoding tokenizer TRAINING (Sennrich et al. 2016
    * §3.2, the word-internal variant without the end-of-word marker):
    * learn `merges` merge rules over the corpus vocabulary — each
    * round merges the most frequent adjacent symbol pair (ties to the
    * lexicographically smallest pair, so the table is deterministic
    * across engines) in every vocabulary word at once.
    *
    * Shape at scale: ONE corpus aggregate collapses the token stream
    * to the (word, count) VOCABULARY — the classic BPE trick: merges
    * iterate over distinct words weighted by count, never the corpus.
    * The vocab frame persists; each round is a pair-explode aggregate
    * over it plus a one-ROW collect (the argmax — bounded by
    * contract) whose winning pair applies as a left-to-right
    * non-overlapping padded string replace (replace()'s documented
    * scan order IS the BPE merge order). Symbols live space-joined
    * with sentinel padding, so a pair can never match across symbol
    * boundaries; pairs flow through lit()/columns, never interpolated
    * SQL, so quote-bearing symbols are safe.
    *
    * Returns (rank, pair, freq) — the merge table, `rank` ascending
    * in learn order; fewer than `merges` rows when the vocabulary
    * runs out of adjacent pairs.
    */
  def bpeTrain(df: DataFrame, textCol: String, merges: Int): DataFrame = {
    require(merges >= 1 && merges <= 64, s"bpeTrain: merges $merges not in [1,64]")
    val spark = df.sparkSession
    val words = df
      .select(explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .withColumn("syms",
        concat(lit(" "), concat_ws(" ", split(col("w"), "")), lit(" ")))
      .select(col("syms"), col("cnt"))
      .persist()
    var vocab = words
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
    var exhausted = false
    for (r <- 1 to merges if !exhausted) {
      val top = vocab
        .select(col("cnt"), split(trim(col("syms")), " ").as("_l"))
        // single-symbol words have no adjacent pair; without the
        // guard, sequence(1, 0) DESCENDS ([1,0]) and element_at
        // faults instead of yielding nothing
        .filter(size(col("_l")) >= 2)
        .select(col("cnt"), explode(expr(
          "transform(sequence(1, size(_l) - 1), i -> concat(element_at(_l, i), ' ', element_at(_l, i + 1)))"))
          .as("pair"))
        .groupBy(col("pair")).agg(sum(col("cnt")).as("f"))
        .orderBy(col("f").desc, col("pair")).limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val pair = top(0).getString(0)
        learned += ((r.toLong, pair, top(0).getLong(1)))
        vocab = vocab.withColumn("syms", call_function("replace", col("syms"),
          lit(" " + pair + " "), lit(" " + pair.replace(" ", "") + " ")))
      }
    }
    words.unpersist()
    import spark.implicits._
    learned.toSeq.toDF("rank", "pair", "freq")
  }

  /** Apply a learned BPE merge table to the corpus and count each
    * document's BPE tokens — [[bpeTrain]]'s consumer, and the honest
    * upgrade over whitespace token counts for budget math (p06/p16).
    * Merges apply in rank order as the same padded replaces the
    * trainer used, so segmentation is bit-faithful to training.
    *
    * Shape: one word explode, a row-local replace chain (broadcast
    * literals, no shuffle), one per-doc sum — no vocabulary join.
    * Empty docs keep a 0 row (LEFT join back to ids).
    */
  /** CODE-SWITCHING detector — per-document language consistency
    * (mixed-language documents dilute monolingual training slices and
    * break per-language quality models; the doc-level t01 label
    * hides them by construction): every sentence (the d23 RE2-safe
    * segmentation, oracle-replayable) labels with the t01 langId,
    * and the doc reports sentence count, distinct languages, the
    * dominant language (ties to the lexicographically smallest) and
    * its share, plus a mixed flag (more than one language and the
    * dominant under 90%).
    *
    * Shape at scale: one sentence explode + the row-local langId
    * expression, collapsed to the (doc, lang) histogram; the
    * dominant pick and shares are windows over that ≤|langs|-per-doc
    * frame, never the sentence stream. Output: (id, n_sents,
    * n_langs, dominant_lang, dominant_share, is_mixed).
    */
  def codeSwitch(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sents = df.select(col(idCol).as("id"),
        explode(regexp_extract_all(col(textCol),
          lit("[^.!?]+[.!?]+|[^.!?]+"), lit(0))).as("_s"))
      .select(col("id"), trim(col("_s")).as("_s"))
      .filter(col("_s") =!= "")
    val hist = sents
      .select(col("id"), graft.functions.TextFunctions.langId(col("_s"))
        .as("lang_pred"))
      .groupBy(col("id"), col("lang_pred")).agg(count(lit(1)).as("_c"))
    val byDoc = Window.partitionBy(col("id"))
    val rank = Window.partitionBy(col("id"))
      .orderBy(col("_c").desc, col("lang_pred"))
    hist
      .withColumn("_rn", row_number().over(rank))
      .withColumn("_tot", sum(col("_c")).over(byDoc))
      .withColumn("_nl", count(lit(1)).over(byDoc))
      .filter(col("_rn") === 1)
      .select(col("id"), col("_tot").cast("long").as("n_sents"),
        col("_nl").cast("long").as("n_langs"),
        col("lang_pred").as("dominant_lang"),
        round(col("_c").cast("double") / col("_tot").cast("double"), 6)
          .as("dominant_share"))
      .withColumn("is_mixed",
        col("n_langs") > 1 && col("dominant_share") < 0.9)
  }

  /** Tokenizer FERTILITY per language (the standard tokenizer-quality
    * audit: how many subword tokens a word costs, and how many
    * characters a token carries — a language whose fertility is 2×
    * another's pays 2× the context budget for the same text, the
    * classic multilingual-tokenizer inequity finding): the learned
    * merge table ([[bpeTrain]]) applies through the SAME padded
    * replace chain as [[bpeTokenCounts]], aggregated per language
    * instead of per doc. One word explode + row-local chain + one
    * |langs|-group aggregate; rates are IEEE divisions of exact
    * longs, rounded 6. Output: (lang, n_words, n_chars, n_bpe,
    * fertility, chars_per_token).
    */
  def bpeFertility(df: DataFrame, langCol: String, textCol: String,
                   mergePairs: Seq[String]): DataFrame = {
    val segmented = mergePairs.foldLeft(
      concat(lit(" "), concat_ws(" ", split(col("w"), "")), lit(" ")): Column) {
      (c, p) => call_function("replace", c, lit(" " + p + " "),
        lit(" " + p.replace(" ", "") + " "))
    }
    df.select(col(langCol).as("lang"),
        explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(col("lang").isNotNull && length(col("w")) > 0)
      .select(col("lang"), length(col("w")).cast("long").as("_ch"),
        size(split(trim(segmented), " ")).cast("long").as("_n"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).cast("long").as("n_words"),
        sum(col("_ch")).as("n_chars"), sum(col("_n")).as("n_bpe"))
      .withColumn("fertility", round(
        col("n_bpe").cast("double") / col("n_words").cast("double"), 6))
      .withColumn("chars_per_token", round(
        col("n_chars").cast("double") / col("n_bpe").cast("double"), 6))
  }

  def bpeTokenCounts(df: DataFrame, idCol: String, textCol: String,
                     mergePairs: Seq[String]): DataFrame = {
    val ids = df.select(col(idCol).as("id")).filter(col("id").isNotNull).distinct()
    val segmented = mergePairs.foldLeft(
      concat(lit(" "), concat_ws(" ", split(col("w"), "")), lit(" ")): Column) {
      (c, p) => call_function("replace", c, lit(" " + p + " "),
        lit(" " + p.replace(" ", "") + " "))
    }
    val perDoc = df
      .select(col(idCol).as("id"),
        explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(col("id").isNotNull && length(col("w")) > 0)
      .select(col("id"), size(split(trim(segmented), " ")).as("_n"))
      .groupBy(col("id")).agg(sum(col("_n")).as("n_bpe"))
    ids.join(perDoc, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_bpe"), lit(0L)).as("n_bpe"))
  }

  /** TEXTRANK keyword extraction (Mihalcea & Tarau 2004: PageRank
    * over the word co-occurrence graph — the corpus-level "what is
    * this corpus about" beside t38's per-doc TF-IDF terms): adjacent
    * token pairs (window 1) between top-`vocab` tokens form a
    * symmetrized weighted graph, [[Graph.pageRank]] scores it with
    * the q38 DECIMAL-exact iteration arithmetic, and the top-`topK`
    * tokens by rank are the keywords.
    *
    * The vocabulary cap bounds the GRAPH (≤vocab nodes, ≤vocab²
    * edges), not the scan: pair extraction is row-local (the token
    * array zipped with its own tail — no explode-then-self-join, no
    * per-doc window), the vocab maps broadcast onto the pair stream,
    * and the iterations run on the tiny graph. Ties are total-ordered
    * everywhere (freq DESC then token for vocab ids; rank DESC then
    * token for the final cut), so the keyword list is engine-neutral.
    */
  def textrank(df: DataFrame, textCol: String, vocab: Int = 500,
               topK: Int = 20, damping: Double = 0.85,
               iters: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = filter(split(lower(col(textCol)), "\\s+"), t => length(t) > 0)
    val pairs = df.select(toks.as("_t")).filter(size(col("_t")) >= 2)
      .select(explode(zip_with(
        slice(col("_t"), lit(1), size(col("_t")) - 1),
        slice(col("_t"), lit(2), size(col("_t")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("_p"))
      .select(col("_p.w1").as("_w1"), col("_p.w2").as("_w2"))
    val vocabDf = df.select(explode(toks).as("_tok"))
      .groupBy(col("_tok")).agg(count(lit(1)).as("_f"))
      .orderBy(col("_f").desc, col("_tok")).limit(vocab)
      .withColumn("_nid", row_number()
        .over(Window.orderBy(col("_f").desc, col("_tok"))).cast("long") - 1L)
    val e0 = pairs
      .join(broadcast(vocabDf.select(col("_tok").as("_w1"),
        col("_nid").as("_src"))), Seq("_w1"))
      .join(broadcast(vocabDf.select(col("_tok").as("_w2"),
        col("_nid").as("_dst"))), Seq("_w2"))
      .filter(col("_src") =!= col("_dst"))
      .select(col("_src"), col("_dst"))
    val sym = e0.unionByName(
        e0.select(col("_dst").as("_src"), col("_src").as("_dst")))
      .groupBy(col("_src"), col("_dst")).agg(count(lit(1)).as("_w"))
    Graph.pageRank(sym, "_src", "_dst", "_w", damping, iters)
      .join(broadcast(vocabDf.select(col("_nid").as("id"), col("_tok"))),
        Seq("id"))
      .withColumn("pos", row_number()
        .over(Window.orderBy(col("rank").desc, col("_tok"))).cast("long"))
      .filter(col("pos") <= topK)
      .select(col("pos"), col("_tok").as("token"), col("rank").as("score"))
      .orderBy("pos")
  }
}
