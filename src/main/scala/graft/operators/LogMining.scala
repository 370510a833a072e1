package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Log-template mining: collapse raw log lines into their constant
  * skeletons by masking the variable fields (the heuristic front of
  * Drain, He et al. 2017 — reference: tailsql's users grep these
  * streams by hand; the reference parser at lparser.go extracts typed
  * fields from ONE known pattern, this op discovers the pattern
  * population). "Error fetching user 4711 from 10.0.3.7" and
  * "Error fetching user 93 from 10.2.0.4" are the same event type;
  * template mining is what turns a 100 TB log corpus into the few
  * hundred distinct things it actually says.
  */
object LogMining {

  /** Masking regexes are intentionally in the RE2-compatible subset
    * shared by Java regex and DuckDB, so the op is oracle-checkable
    * verbatim. Order matters: UUID before HEX before IP before NUM —
    * each later class would otherwise eat pieces of the earlier ones
    * (a UUID is four hex runs; an IP is four digit runs).
    */
  private val Uuid =
    "[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}"
  private val Hex = "0x[0-9a-fA-F]+"
  private val Ip = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  private val Num = "-?[0-9]+(\\.[0-9]+)?([Ee][+-]?[0-9]+)?"

  /** The template of one line: variable fields masked to typed
    * placeholders. Numbers cover ints, floats, and exponent forms in
    * ONE token, so the same double prints to the same placeholder
    * regardless of the engine's float-to-string digits.
    */
  def template(line: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(line,
      Uuid, "<UUID>"), Hex, "<HEX>"), Ip, "<IP>"), Num, "<N>")

  /** Mine the template population: one row per distinct skeleton with
    * its frequency and a deterministic example line. Shape at scale:
    * a narrow codegen'd projection into one count aggregate —
    * map-side partials collapse each task's lines to its distinct
    * templates, so a template dominating the corpus (the health-check
    * ping) never concentrates rows on one task.
    *
    * The example is anchored by min(xxhash64(line)), NOT min(line):
    * a raw-string MIN buffer is not hash-aggregable and demotes the
    * whole corpus pass to sort-based aggregation (Spark's
    * HashAggregate needs fixed-size mutable buffers), while the long
    * hash keeps it a HashAggregate. The anchor line is then fetched
    * by a second narrow scan broadcast-joined against the (small —
    * that's the premise of template mining) template frame; hash
    * ties are identical lines, broken by a string min over the
    * one-row-per-template remnant. Example semantics: the
    * deterministic min-hash representative, not the lexicographic
    * min.
    */
  /** Per-template metric percentiles: group lines by their mined
    * skeleton and report exact p50/p95/max of a numeric column the
    * caller extracted from each line (latency, payload size — the
    * "which event type is slow" monitoring question asked of a log
    * corpus whose patterns are unknown up front). One narrow
    * projection into one template-key aggregate; the template
    * population is small (that's the premise of template mining), so
    * the shuffle is tiny regardless of corpus size.
    *
    * Exact percentiles buffer each group's values; the template
    * count is bounded but a single template's row count is not — at
    * 100 TB swap in the mergeable quantile sketch
    * (`approx_percentile`, the q25 device) for fixed executor
    * memory, the same stated fallback as t18's histogram.
    */
  def templateQuantiles(df: DataFrame, lineCol: String,
                        valueCol: String): DataFrame =
    df.select(template(col(lineCol)).as("template"), col(valueCol).as("_v"))
      .groupBy(col("template"))
      .agg(count(lit(1)).as("n"),
        round(expr("percentile(_v, 0.5)"), 6).as("p50"),
        round(expr("percentile(_v, 0.95)"), 6).as("p95"),
        round(max(col("_v")), 6).as("max_v"))

  /** Top-k session paths: the ordered head (first `maxLen` events)
    * of every gap-split session as one "a>b>c" path string, counted
    * over the corpus — the DISCOVERY complement of the q29 fixed
    * funnel ("which sequences do users actually take" vs "how many
    * took this given one"), and the behavioral twin of template
    * mining: templates collapse a log corpus to what it says, paths
    * collapse a clickstream to what users do.
    *
    * Truncating to the session head is what bounds the path-string
    * domain (≤ |event types|^maxLen, in practice a few hundred) —
    * an unbounded concat over a 100 TB clickstream would grow rows
    * without limit.
    *
    * Shape at scale: sessionization (the r12 lag + running-sum
    * rule), the in-session row_number AND the per-session path fold
    * all ride ONE shuffle on the user key — HashPartitioning(user)
    * satisfies every (user, session)-clustered step, so no second
    * exchange until the path histogram, whose key count is the
    * bounded path domain; the final top-k is TakeOrderedAndProject.
    * In-session order is pinned by (ts, id): a bare collect_list
    * would be partitioning-dependent, so the fold sorts (rn, type)
    * structs before joining.
    */
  def sessionPaths(df: DataFrame, userCol: String, tsUsCol: String,
                   idCol: String, typeCol: String, gapUs: Long,
                   maxLen: Int, k: Int): DataFrame = {
    require(k > 0, s"sessionPaths: k $k must be positive")
    sessionPathStrings(df, userCol, tsUsCol, idCol, typeCol, gapUs, maxLen)
      .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(k)
  }

  /** The per-session path frame under [[sessionPaths]]'s histogram:
    * one row (user, session index, "a>b>c" path head) per gap-split
    * session. Exposed so the STREAMING twin's parity spec can compare
    * the path multiset session for session, not just the top-k.
    */
  def sessionPathStrings(df: DataFrame, userCol: String, tsUsCol: String,
                         idCol: String, typeCol: String, gapUs: Long,
                         maxLen: Int): DataFrame = {
    require(maxLen > 0, s"sessionPaths: maxLen $maxLen must be positive")
    val W = org.apache.spark.sql.expressions.Window
    val byUser = W.partitionBy(col(userCol)).orderBy(col(tsUsCol), col(idCol))
    val inSess = W.partitionBy(col(userCol), col("_session"))
      .orderBy(col(tsUsCol), col(idCol))
    df
      .withColumn("_brk",
        when(col(tsUsCol) - lag(col(tsUsCol), 1).over(byUser) > gapUs
          || lag(col(tsUsCol), 1).over(byUser).isNull, 1).otherwise(0))
      .withColumn("_session", sum(col("_brk")).over(
        byUser.rowsBetween(W.unboundedPreceding, W.currentRow)))
      .withColumn("_rn", row_number().over(inSess))
      .filter(col("_rn") <= maxLen)
      .groupBy(col(userCol), col("_session"))
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("_rn").as("rn"),
          col(typeCol).as("t")))), x => x("t")), ">").as("path"))
  }

  def templates(df: DataFrame, lineCol: String): DataFrame = {
    val (result, counts) = templatesRaw(df, lineCol)
    Caching.sealOver(result, counts)
  }

  /** Template DRIFT — "what changed between then and now": per
    * masked skeleton, counts in the earlier vs later half of the
    * stream's time range and the add-1-smoothed log rate ratio, with
    * the top movers surfaced. NEW templates (a failure path that
    * didn't exist before) and VANISHED ones (a message that stopped
    * — often the more alarming signal) flag explicitly; both score
    * finite ratios through the add-1 floor (the t23/p07 smoothing
    * rule), so "new" competes with "30× growth" on one scale.
    *
    * Shape at scale: the boundary is one (min, max) aggregate
    * broadcast back as a scalar; ONE masking pass collapses the
    * corpus to per-(template) conditional counts (map-side partials
    * — the r18 premise that the template population is tiny); the
    * ratio math is row-local on that frame and the top-k is a
    * TakeOrdered, never a sort. Output: (template, n_before,
    * n_after, log_ratio, status), the k largest |log_ratio| (ties to
    * template asc).
    */
  def templateDrift(df: DataFrame, tsCol: String, lineCol: String,
                    k: Int): DataFrame = {
    require(k > 0, s"templateDrift: k $k must be positive")
    val us = unix_micros(col(tsCol))
    val bounds = df.agg(min(us).as("_mn"), max(us).as("_mx"))
      .select(expr("_mn + ((_mx - _mn) div 2)").as("_bnd")) // BIGINT, no float midpoint
    val counts = df
      .select(template(col(lineCol)).as("template"), us.as("_us"))
      .crossJoin(broadcast(bounds))
      .groupBy(col("template"))
      .agg(sum(when(col("_us") < col("_bnd"), 1L).otherwise(0L)).as("n_before"),
        sum(when(col("_us") >= col("_bnd"), 1L).otherwise(0L)).as("n_after"))
    counts
      .withColumn("log_ratio", round(log(
        (col("n_after") + lit(1L)).cast("double") /
          (col("n_before") + lit(1L)).cast("double")), 6))
      .withColumn("status",
        when(col("n_before") === 0, "new")
          .when(col("n_after") === 0, "vanished")
          .otherwise("shifted"))
      .orderBy(abs(col("log_ratio")).desc, col("template"))
      .limit(k)
  }

  /** Unsealed internals of [[templates]] (the spanDedupRaw rule: the
    * seal cuts lineage, so shape gates must read the plan BEFORE it).
    * Returns (result, persisted counts frame); callers other than the
    * plan spec go through [[templates]], which seals and unpersists.
    */
  private[graft] def templatesRaw(df: DataFrame,
                                  lineCol: String): (DataFrame, DataFrame) = {
    // persisted: the template frame is consumed twice (anchors
    // broadcast + final join), and each consumer would otherwise
    // re-run the whole-corpus masking pass — the frame itself is the
    // template population, tiny by premise (the dupGrams rule:
    // persist the small derived stream, never the corpus)
    val counts = df
      .select(template(col(lineCol)).as("template"),
        xxhash64(col(lineCol)).as("_h"))
      .groupBy(col("template"))
      .agg(count(lit(1)).as("n"), min(col("_h")).as("_hmin"))
      .persist()
    // The example fetch used to re-run the 4-regex masking over the
    // WHOLE corpus a second time just to find each template's anchor
    // line — the bench's single largest regex-CPU sink. The second
    // pass now computes only xxhash64: lines whose hash equals ANY
    // template's anchor survive a broadcast semi-join (one line per
    // template plus rare cross-template hash collisions), and the
    // masking re-runs on that remnant only. The template-keyed join +
    // h == hmin filter after it is unchanged, so a collision line
    // that sneaked through the semi-join still drops unless it IS its
    // own template's anchor — semantics identical, regex work halved.
    val anchors = counts.select(col("template"), col("_hmin"))
    val ex = df.select(col(lineCol).as("_l"))
      .join(broadcast(anchors.select(col("_hmin"))),
        xxhash64(col("_l")) === col("_hmin"), "leftsemi")
      .withColumn("template", template(col("_l")))
      .join(broadcast(anchors), Seq("template"))
      .filter(xxhash64(col("_l")) === col("_hmin"))
      .groupBy(col("template"))
      .agg(min(col("_l")).as("example"))
    (counts.drop("_hmin").join(ex, Seq("template")), counts)
  }

  /** Rare template TRANSITIONS: the "new failure path" detector over
    * a pattern-unknown stream. Each key's lines mask to their r18
    * skeleton, adjacent (by time, id tie-break) templates form a
    * transition, and a transition is flagged when it is absolutely
    * infrequent (n <= maxN) or an out-of-character exit from its
    * source (share of the source's outgoing transitions < minShare).
    * A service that always goes login -> query -> logout shows a
    * flagged row the first times it goes login -> crash.
    *
    * Shape at scale: ONE key shuffle (the lag window, the r12/r15
    * device), then a (src, dst) count aggregate whose cardinality is
    * templates² at most — tiny, that's the premise of template
    * mining — so the share window partitions on a bounded key.
    * Output: (src_template, dst_template, n, share, rare).
    */
  def rareTransitions(df: DataFrame, keyCol: String, tsCol: String,
                      idCol: String, lineCol: String,
                      minShare: Double = 0.05, maxN: Long = 2L): DataFrame = {
    val Window = org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val trans = df
      .select(col(keyCol), col(tsCol), col(idCol),
        template(col(lineCol)).as("_tpl"))
      .withColumn("_prev", lag(col("_tpl"), 1).over(w))
      .filter(col("_prev").isNotNull)
      .groupBy(col("_prev").as("src_template"), col("_tpl").as("dst_template"))
      .agg(count(lit(1)).as("n"))
    val wSrc = Window.partitionBy(col("src_template"))
    trans
      .withColumn("share",
        round(col("n").cast("double") /
          sum(col("n")).over(wSrc).cast("double"), 6))
      .withColumn("rare", col("n") <= maxN || col("share") < minShare)
  }
}
