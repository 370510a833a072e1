package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.{RollingHash, TextFunctions}
import graft.operators.{AsOf, Decontaminate, Dedup, Multimodal, Similarity, TextStats, Throttle, Training, Windows}
import graft.sources.LogSource

/** Driver contract: every SURVEY.md §2 capability gets a `queries`
  * entry, and (where ANSI-SQL-expressible) a DuckDB `oracleSql` twin
  * with IDENTICAL output column names, types (bigint/double/string),
  * and ORDER BY.
  *
  * Float discipline (SURVEY §5): every SUM over doubles goes through
  * DECIMAL so both engines do exact arithmetic, then casts back to
  * DOUBLE — identical IEEE64 bits on both sides regardless of
  * accumulation order. Averages divide those exact doubles.
  */
object SparkEntry {

  // ---------------------------------------------------------------- helpers

  /** Table loader. `events.ts` is parquet TIMESTAMP(NANOS), which
    * Spark only reads as long via the nanosAsLong legacy flag — so it
    * arrives as nanos and is floored to a microsecond timestamp here
    * (`div`, not `/`: ns-since-2024 overflows double precision).
    * DuckDB's µs-precision TIMESTAMP floors the same way.
    */
  private def T(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = s.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Exact money sum: cast to decimal, sum, back to double. */
  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  /** Memoized BPE merge table per (session, dir, merges) — the
    * train-once / apply-everywhere workflow the t34/t35/t37 trio
    * models, mirrored in the registry itself (CatalogStats' per-key
    * memo, applied to training): bpeTrain costs `merges` sequential
    * 1-row argmax driver round-trips, so one bench run pays them once
    * per data directory instead of three times. Rows are (rank, pair,
    * freq), ascending rank.
    */
  private val bpeMemo = scala.collection.concurrent.TrieMap
    .empty[(Int, String, Int), Seq[(Long, String, Long)]]
  private def bpeTable(s: SparkSession, dir: String,
                       merges: Int): Seq[(Long, String, Long)] =
    bpeMemo.getOrElseUpdate((System.identityHashCode(s), dir, merges),
      TextStats.bpeTrain(T(s, dir, "documents"), "text", merges)
        .orderBy("rank").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq)

  /** Memoized k-means quantizer per (session, dir, k, iters, dims) —
    * the bpeMemo rule applied to the s29/s30/s32 trio: training costs
    * iters collect round-trips plus (iters+1) corpus scans, so one
    * bench run pays them once per data directory instead of three
    * times. Only the k·d driver LONGS are memoized (never a frame —
    * Bench unpersists all RDDs between queries, so a cached plan
    * would dangle); each consumer re-runs its own zero-shuffle
    * assignment pass, and identical params give identical centroids,
    * so results are unchanged.
    */
  private val kmeansMemo = scala.collection.concurrent.TrieMap
    .empty[(Int, String, Int, Int, Int), Array[Array[Long]]]
  private def kmeansQuantizer(s: SparkSession, dir: String, k: Int,
                              iters: Int, dims: Int): Array[Array[Long]] =
    kmeansMemo.getOrElseUpdate(
      (System.identityHashCode(s), dir, k, iters, dims),
      operators.Similarity.kmeansCentroids(T(s, dir, "embeddings"),
        "vec_id", "embedding", k, iters, dims))

  private def cnt: Column = count(lit(1))

  /** The synthetic "log file": events rows formatted as text lines.
    * Both the Spark queries and the DuckDB oracle derive from the same
    * parquet, so parse(format(row)) == row is the oracle relation.
    */
  private val EventPattern =
    """id=(?P<event_id__int>\d+) ts=(?P<ts__date>[0-9:\- ]+) user=(?P<user_id__int>\d+) type=(?P<etype__str>\S+) value=(?P<value__float>\S+)"""

  private def eventLines(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "events").select(concat(
      lit("id="), col("event_id"),
      lit(" ts="), date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"),
      lit(" user="), col("user_id"),
      lit(" type="), col("event_type"),
      lit(" value="), col("value").cast("string")).as("value"))

  private def parsedEvents(s: SparkSession, dir: String): DataFrame =
    LogSource.parse(eventLines(s, dir), EventPattern)

  private val CustomerPattern =
    """user=(?P<user__int>\d+) name=(?P<name__str>\S+) segment=(?P<segment__str>\S+)"""

  private def customerLines(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "customer").select(concat(
      lit("user="), col("c_custkey"),
      lit(" name="), col("c_name"),
      lit(" segment="), col("c_mktsegment")).as("value"))

  /** Seed queries for the BM25 retrieval op (t17): shared between the
    * Spark query and the DuckDB oracle's VALUES list. */
  private val bm25Queries: Seq[(String, String)] = Seq(
    "q1" -> "hash", "q1" -> "join", "q1" -> "merge",
    "q2" -> "window", "q2" -> "stream", "q2" -> "batch",
    "q3" -> "spark", "q3" -> "vector", "q3" -> "scan")

  // ---------------------------------------------------------------- entry

  /** Flagship: 5-table star join with broadcast dims (q03) at sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    q03(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- queries

  private def q03(s: SparkSession, dir: String): DataFrame =
    q03Over(t => T(s, dir, t))

  /** q03 with the table source abstracted: `q03_multijoin` feeds it
    * path-based parquet reads; `q03b_multijoin_cbo` feeds it the
    * ANALYZE'd catalog tables (sources/CatalogStats), so the same
    * logical query is driver-verified under BOTH planning regimes —
    * file-size estimates + AQE, and row-count/NDV statistics + CBO.
    */
  private def q03Over(tbl: String => DataFrame): DataFrame = {
    // EAGER AGGREGATION below the join (the classic partial-agg
    // pushdown a CBO would derive): revenue and line counts fold to
    // one row per l_orderkey BEFORE lineitem meets the dim chain —
    // decimal sums re-sum associatively, so (r_name, n_name) totals
    // are bit-identical. The shuffle carries (orderkey, decimal,
    // long) with map-side combine instead of the full line stream,
    // and the join input shrinks by the lines-per-order factor at ANY
    // scale. Without this, the planner's stats-free size estimate
    // picked LINEITEM's 3-column scan as the broadcast build side —
    // the biggest table shipped whole to every task (the known-limit
    // q03 note; ANALYZE-grade stats are the other fix). The join
    // itself stays declarative: broadcast at bench SFs, free to be a
    // sort-merge on orderkey at cluster scale.
    val lagg = tbl("lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)")).as("_rev"),
        cnt.as("_nl"))
    tbl("region")
      .join(tbl("nation"), col("n_regionkey") === col("r_regionkey"))
      .join(tbl("customer"), col("c_nationkey") === col("n_nationkey"))
      .join(tbl("orders"), col("o_custkey") === col("c_custkey"))
      .join(lagg, col("l_orderkey") === col("o_orderkey"))
      .groupBy("r_name", "n_name")
      .agg(sum(col("_rev")).cast("double").as("revenue"),
        sum(col("_nl")).as("n"))
      .orderBy("r_name", "n_name")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---------------- reference surface (tailsql core) ----------------
    "r01_regex_parse" -> ((s, dir) =>
      parsedEvents(s, dir)
        .select(col("event_id"), unix_timestamp(col("ts")).as("ts_s"),
          col("user_id"), col("etype"), col("value"))
        .orderBy("event_id")),

    "r02_date_parse" -> ((s, dir) => {
      // nine-way format mix round-tripped through parseAnyDate: the
      // oracle is the original timestamp truncated to each format's
      // own resolution (second for most, minute for RFC822Z, day for
      // yyyyMMdd), so every branch must be recognized AND parsed to
      // the same instant
      val m = pmod(col("event_id"), lit(9))
      val raw = T(s, dir, "events").select(col("event_id"),
        when(m === 0, date_format(col("ts"), "yyyy/MM/dd HH:mm:ss"))
          .when(m === 1, date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss"))
          .when(m === 2, date_format(col("ts"), "MM/dd/yyyy HH:mm:ss"))
          .when(m === 3, expr("CAST(unix_micros(ts) div 1000 AS STRING)")) // epoch ms
          .when(m === 4, date_format(col("ts"), "EEE, dd MMM yyyy HH:mm:ss Z")) // RFC1123
          .when(m === 5, date_format(col("ts"), "dd MMM yy HH:mm Z")) // RFC822Z
          .when(m === 6, date_format(col("ts"), "MMM d, yyyy HH:mm:ss")) // US long
          .when(m === 7, date_format(col("ts"), "yyyyMMdd"))
          .otherwise(date_format(col("ts"), "dd MMM yyyy HH:mm:ss")).as("raw"))
      raw.select(col("event_id"),
          unix_timestamp(LogSource.parseAnyDate(col("raw"))).as("ts_s"))
        .orderBy("event_id")
    }),

    "r03_filter" -> ((s, dir) =>
      parsedEvents(s, dir)
        .filter(expr("etype = 'error' AND value > 50.0"))
        .select(col("event_id"), col("etype"), col("value"))
        .orderBy("event_id")),

    "r04_sample" -> ((s, dir) =>
      LogSource.randFilter(parsedEvents(s, dir), 0.1)
        .select(col("event_id")).orderBy("event_id")),

    "r05_throttle" -> ((s, dir) =>
      Throttle.firstNPerPeriod(
          T(s, dir, "events"), "ts", periodSec = 60L, n = 5, tieCols = Seq("event_id"))
        .select(col("event_id")).orderBy("event_id")),

    "r06_window_tumbling" -> ((s, dir) =>
      Windows.aggregate(T(s, dir, "events"), "ts", 300L, 300L, Seq("event_type"),
          Seq(cnt.as("n_events"), dsum(col("value")).as("sum_value")))
        .select("window_start", "event_type", "n_events", "sum_value")
        .orderBy("window_start", "event_type")),

    "r07_window_sliding" -> ((s, dir) =>
      Windows.aggregate(T(s, dir, "events"), "ts", 600L, 300L, Seq("event_type"),
          Seq(cnt.as("n_events"), dsum(col("value")).as("sum_value")))
        .select("window_start", "event_type", "n_events", "sum_value")
        .orderBy("window_start", "event_type")),

    "r08_multitable_join" -> ((s, dir) => {
      val t0 = parsedEvents(s, dir)
      val t1 = LogSource.parse(customerLines(s, dir), CustomerPattern)
      t0.join(t1, t0("user_id") === t1("user"))
        .groupBy(col("segment"))
        .agg(cnt.as("n"), dsum(col("value")).as("sum_value"))
        .orderBy("segment")
    }),

    "r09_sql_per_window" -> ((s, dir) => {
      Windows.tumbling(parsedEvents(s, dir), "ts", 3600L)
        .createOrReplaceTempView("graft_r09")
      s.sql("""SELECT window_start, etype, count(*) AS n, max(value) AS max_v
               FROM graft_r09 GROUP BY window_start, etype
               ORDER BY window_start, etype""")
    }),

    "r10_bool_parse" -> ((s, dir) => {
      // completes the parser's type matrix: bool fields (str/int/float/
      // date are exercised by r01/r02)
      val lines = T(s, dir, "events").select(concat(
        lit("id="), col("event_id"),
        lit(" big="), (col("value") > 50.0).cast("string")).as("value"))
      LogSource.parse(lines, """id=(?P<event_id__int>\d+) big=(?P<big__bool>\S+)""")
        .groupBy("big").agg(cnt.as("n"))
        .orderBy("big")
    }),

    "q24_setops" -> ((s, dir) => {
      val ev = T(s, dir, "events").select(col("user_id").as("id"))
      val cust = T(s, dir, "customer").select(col("c_custkey").cast("long").as("id"))
      val both = ev.intersect(cust).withColumn("src", lit("both"))
      val onlyCust = cust.except(ev).withColumn("src", lit("cust_only"))
      both.unionAll(onlyCust).orderBy("src", "id")
    }),

    // ---------------- batch SQL engine capability ----------------
    "q01_agg" -> ((s, dir) =>
      T(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("sum_disc_price"),
          (dsum(col("l_quantity")) / cnt.cast("double")).as("avg_qty"),
          cnt.as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    "q02_join_agg" -> ((s, dir) =>
      T(s, dir, "customer")
        .join(T(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(cnt.as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
        .orderBy("c_mktsegment")),

    "q03_multijoin" -> ((s, dir) => q03(s, dir)),

    "q03b_multijoin_cbo" -> ((s, dir) => {
      // the same star join planned from ANALYZE'd statistics: register
      // the five tables (idempotent per session/dir), enable CBO, and
      // read through the catalog so broadcast selection and join
      // reordering see row counts + NDVs instead of file sizes. Same
      // oracle as q03 — the planning regime must not change a bit of
      // the answer.
      graft.sources.CatalogStats.register(s, dir,
        Seq("region", "nation", "customer", "orders", "lineitem"))
      graft.sources.CatalogStats.enableCbo(s)
      q03Over(t => s.table(graft.sources.CatalogStats.name(dir, t)))
    }),

    "q04_topk_group" -> ((s, dir) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      T(s, dir, "orders")
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rnk")
        .orderBy("o_orderpriority", "rnk")
    }),

    "q05_distinct" -> ((s, dir) =>
      T(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          cnt.as("n"))
        .orderBy("l_returnflag")),

    "q06_anti_join" -> ((s, dir) =>
      T(s, dir, "customer")
        .join(T(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")),

    "q07_rollup" -> ((s, dir) =>
      T(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(dsum(col("l_quantity")).as("sum_qty"), cnt.as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("sum_qty"), col("n"))
        .orderBy("returnflag", "linestatus")),

    "q08_case_agg" -> ((s, dir) =>
      T(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
          sum(when(col("o_orderstatus") === "F", col("o_totalprice").cast("decimal(18,2)"))
            .otherwise(lit(0).cast("decimal(18,2)"))).cast("double").as("f_total"),
          count(when(col("o_orderstatus") === "O", lit(1))).as("n_open"),
          cnt.as("n"))
        .orderBy("o_orderpriority")),

    "q09_strings" -> ((s, dir) =>
      T(s, dir, "part").select(
          col("p_partkey"),
          upper(substring(col("p_name"), 1, 8)).as("pfx"),
          concat(col("p_brand"), lit("-"), col("p_type")).as("brand_type"),
          length(col("p_name")).cast("long").as("name_len"),
          when(col("p_name").like("%a%"), lit(1L)).otherwise(lit(0L)).as("has_a"),
          regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"))
        .orderBy("p_partkey")),

    "q10_time_extract" -> ((s, dir) =>
      T(s, dir, "events")
        .groupBy(unix_timestamp(date_trunc("DAY", col("ts"))).as("d"),
          hour(col("ts")).cast("long").as("hr"))
        .agg(cnt.as("n"), dsum(col("value")).as("sum_value"))
        .orderBy("d", "hr")),

    "q11_percentile" -> ((s, dir) =>
      T(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(round(expr("percentile(l_quantity, 0.5)"), 6).as("p50"),
          round(expr("percentile(l_quantity, 0.9)"), 6).as("p90"))
        .orderBy("l_returnflag")),

    "q12_having" -> ((s, dir) => {
      val orders = T(s, dir, "orders")
      val per = orders.groupBy("o_custkey")
        .agg(dsum(col("o_totalprice")).as("total"), cnt.as("n"))
      val thr = orders.agg(
        (dsum(col("o_totalprice")) / cnt.cast("double")).as("avg_total"))
      per.crossJoin(broadcast(thr))
        .filter(col("total") > col("avg_total") * 2.0)
        .select("o_custkey", "total", "n")
        .orderBy("o_custkey")
    }),

    "q13_union" -> ((s, dir) => {
      val a = T(s, dir, "events").select(col("user_id").as("id")).distinct()
      val b = T(s, dir, "customer").select(col("c_custkey").cast("long").as("id")).distinct()
      a.unionAll(b).groupBy("id").agg(cnt.as("n_sources")).orderBy("id")
    }),

    "q15_window_funcs" -> ((s, dir) => {
      val wOrd = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      T(s, dir, "orders")
        .filter(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_totalprice"),
          lag(col("o_totalprice"), 1).over(wOrd).as("prev_price"),
          lead(col("o_totalprice"), 1).over(wOrd).as("next_price"),
          sum(col("o_totalprice").cast("decimal(18,2)")).over(
            wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double").as("running_total"),
          row_number().over(wOrd).cast("long").as("order_seq"))
        .orderBy("o_custkey", "order_seq")
    }),

    "q16_semi_join" -> ((s, dir) =>
      T(s, dir, "customer")
        .join(T(s, dir, "orders").filter(col("o_totalprice") > 100000.0),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")),

    "q14_json" -> ((s, dir) =>
      T(s, dir, "events")
        .groupBy(get_json_object(col("props"), "$.k").cast("long").as("k"))
        .agg(cnt.as("n"), dsum(col("value")).as("sum_value"))
        .orderBy("k")),

    "q17_cube" -> ((s, dir) =>
      T(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(dsum(col("o_totalprice")).as("total"), cnt.as("n"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("total"), col("n"))
        .orderBy("status", "priority")),

    "q18_corr_subquery" -> ((s, dir) => {
      val wType = Window.partitionBy("p_type")
      T(s, dir, "part")
        .withColumn("avg_price",
          sum(col("p_retailprice").cast("decimal(18,2)")).over(wType).cast("double")
            / cnt.over(wType).cast("double"))
        .filter(col("p_retailprice") > col("avg_price"))
        .select("p_partkey", "p_type", "p_retailprice")
        .orderBy("p_partkey")
    }),

    "q19_pivot" -> ((s, dir) =>
      T(s, dir, "events")
        .groupBy(unix_timestamp(date_trunc("DAY", col("ts"))).as("d"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(dsum(col("value")))
        .orderBy("d")),

    "q33_interval_coverage" -> ((s, dir) =>
      // interval-union active time per user: each event opens a
      // 30-minute activity interval, overlaps count once — endpoint
      // sweep line (row-local expand, one (key,pos) shuffle, per-key
      // windows over the endpoint frame), exact epoch micros
      operators.Windows.intervalCoverage(
          T(s, dir, "events"), "ts", "user_id", durSec = 1800L)
        .withColumnRenamed("key", "user_id")
        .orderBy("user_id")),

    "q32_unpivot" -> ((s, dir) => {
      // the q19 complement: wide per-flag measures melted back to
      // (flag, measure, total) long form — Dataset.unpivot, the
      // declarative melt (one agg shuffle; the melt itself is a
      // row-local expand, no shuffle)
      val wide = T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(dsum(col("l_quantity")).as("qty"),
          dsum(col("l_extendedprice")).as("price"),
          dsum(col("l_discount"), 4).as("disc"),
          dsum(col("l_tax"), 4).as("tax"))
      wide.unpivot(Array(col("l_returnflag")),
          Array(col("qty"), col("price"), col("disc"), col("tax")),
          "measure", "total")
        .orderBy("l_returnflag", "measure")
    }),

    "q20_asof_join" -> ((s, dir) => {
      val ev = T(s, dir, "events")
      val errors = ev.filter(col("event_type") === "error")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .select("user_id", "ts", "event_id")
      AsOf.join(errors, clicks, Seq("user_id"), "ts", "event_id",
          Seq("event_id" -> "click_id", "ts" -> "click_ts"))
        .select(col("event_id"), col("user_id"), col("click_id"),
          unix_timestamp(col("click_ts")).as("click_ts_s"))
        .orderBy("event_id")
    }),

    "q21_range_join" -> ((s, dir) => {
      val buckets = s.range(50).select(col("id").as("bucket"),
        (col("id") * 10.0).as("lo"), ((col("id") + 1) * 10.0).as("hi"))
      T(s, dir, "events")
        .join(broadcast(buckets),
          col("value") >= col("lo") && col("value") < col("hi"))
        .groupBy("bucket")
        .agg(cnt.as("n"), dsum(col("value")).as("sum_value"))
        .orderBy("bucket")
    }),

    // ---------------- LLM-data-pipeline extensions ----------------
    "d01_dedup_exact" -> ((s, dir) =>
      Dedup.exact(T(s, dir, "documents"), "doc_id", "text")
        .select("keep_id", "n_dups").orderBy("keep_id")),

    "d29_normalized_dedup" -> ((s, dir) =>
      // normalize-then-hash dedup (the C4/CCNet rung between d01's
      // byte-exact and d02's fuzzy): casing/punctuation/whitespace
      // variants collapse at d01's one-shuffle cost
      Dedup.normalizedExact(T(s, dir, "documents"), "doc_id", "text")
        .select("keep_id", "n_dups").orderBy("keep_id")),

    "d02_dedup_minhash" -> ((s, dir) =>
      Dedup.minHashLsh(T(s, dir, "documents"), "doc_id", "text",
          shingleN = 3, numHashes = 32, bands = 8, threshold = 0.5)
        .orderBy("id1", "id2")),

    "d03_dedup_simhash" -> ((s, dir) =>
      Dedup.simHashPairs(
          Dedup.simHash(T(s, dir, "documents"), "doc_id", "text"), maxDist = 3)
        .orderBy("id1", "id2")),

    "d04_ngram_jaccard" -> ((s, dir) =>
      Dedup.jaccardPairs(
          Dedup.shingles(T(s, dir, "documents").filter(col("doc_id") < 500),
            "doc_id", "text", 3), 0.5)
        .orderBy("id1", "id2")),

    "d24_allpairs_exact" -> ((s, dir) =>
      // exact all-pairs Jaccard >= 0.5 on word-token sets via prefix
      // filtering (SSJoin/AllPairs): recall-1.0 similarity join whose
      // candidate keys are each doc's RAREST tokens — the oracle is a
      // full quadratic brute force, so the hash-match proves the
      // prefix filter dropped nothing. Guarded at 256x docs: on this
      // 500-doc corpus the word-set output mass is ~74% of quadratic
      // by design so the cap cannot trip here, but on a larger corpus
      // it fails loudly BEFORE the verify join goes quadratic instead
      // of in stage 40 of a 100 TB run.
      Dedup.allPairsJaccard(
          T(s, dir, "documents").filter(col("doc_id") < 500),
          "doc_id", "text", tau = 0.5,
          maxCandidateFactor = Some(256.0))
        .orderBy("id1", "id2")),

    "d24b_allpairs_3gram" -> ((s, dir) =>
      // the discriminative production configuration of d24: 3-gram
      // shingle sets at dedup-grade tau=0.8, where the rare-gram
      // prefixes keep candidates near the true pair count (vs the
      // word-set form whose output mass is the cost). Guarded: fail
      // loudly if candidates exceed 64x docs rather than letting a
      // degenerate corpus go quadratic in the verify join. Same
      // brute-force quadratic oracle shape as d24 proves recall 1.0.
      Dedup.allPairsJaccard(
          T(s, dir, "documents").filter(col("doc_id") < 500),
          "doc_id", "text", tau = 0.8, shingleN = 3,
          maxCandidateFactor = Some(64.0))
        .orderBy("id1", "id2")),

    "d12_simhash_portable" -> ((s, dir) =>
      // SimHash on the portable md5 family (Dedup.simHashPortablePairs)
      // so banding + popcount verify hash-match the DuckDB twin — the
      // last dedup algorithm family to get an oracle-exact variant
      Dedup.simHashPortablePairs(
          T(s, dir, "documents").filter(col("doc_id") < 500), "doc_id", "text")
        .orderBy("id1", "id2")),

    "d30_edit_verify" -> ((s, dir) =>
      // fuzzy dedup for short docs: d11's LSH candidates verified by
      // Levenshtein similarity over the first 256 chars — the edit
      // RATIO catches one-typo twins shingle Jaccard undercounts
      Dedup.editVerifiedPairs(
          T(s, dir, "documents").filter(col("doc_id") < 500),
          "doc_id", "text", shingleN = 3, minSim = 0.5, clipChars = 256)
        .orderBy("id1", "id2")),

    "d11_minhash_portable" -> ((s, dir) => {
      // the d02 MinHash+LSH pipeline re-run on an md5 hash family that
      // DuckDB can evaluate too, so the ENTIRE chain — signatures →
      // banding → candidate pairs → exact-jaccard verify — is
      // oracle-exact, not just rows-only. k=8 signatures, 4 bands of
      // r=2; min over hex strings is a valid minhash (uniform order).
      // Same shuffle shape as the fast variant: one shingle explode,
      // one (id, i) aggregate, one band self-join, intersections
      // computed ONLY for candidate pairs.
      //
      // INTERNAL stages run on 16-byte unhex'd digests, not 32-char
      // hex strings — Spark's BinaryType min is unsigned-byte-ordered
      // and lowercase hex is order-isomorphic to it, so
      // min(unhex(x)) == unhex(min(x)) and every stage's DECISIONS
      // (min sigs, band-bucket equality, shingle-intersection counts)
      // are bitwise the oracle's while the shuffles carry half the
      // bytes. Nothing binary surfaces: the output is (id1, id2,
      // jaccard), identical to the hex chain DuckDB runs.
      val sh = Dedup.shingles(T(s, dir, "documents").filter(col("doc_id") < 500),
        "doc_id", "text", 3)
      val sigs = sh
        .select(col("id"), explode(sequence(lit(0), lit(7))).as("i"), col("shingle"))
        .groupBy("id", "i")
        .agg(min(unhex(md5(concat(col("i"), lit(":"), col("shingle"))))).as("sig"))
      val bands = sigs.groupBy(col("id"), expr("i div 2").as("band"))
        .agg(unhex(md5(concat(
          min(when(col("i") % 2 === 0, col("sig"))),
          min(when(col("i") % 2 === 1, col("sig")))))).as("bkey"))
      val cand = bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
            col("a.id") < col("b.id"))
        .select(col("a.id").as("id1"), col("b.id").as("id2")).distinct()
      val sz = sh.groupBy(col("id")).agg(cnt.as("sz"))
      // the verify join keys on the shingle DIGEST too: candidate
      // docs' shingle sets meet on 16 bytes a row instead of the
      // (longer) shingle text; counts agree with the oracle's
      // text-keyed join absent an md5 collision, which the signature
      // stages already presuppose
      val inter = cand
        .join(sh.select(col("id").as("id1"), unhex(md5(col("shingle"))).as("s1")), "id1")
        .join(sh.select(col("id").as("id2"), unhex(md5(col("shingle"))).as("s2")), "id2")
        .filter(col("s1") === col("s2"))
        .groupBy("id1", "id2").agg(cnt.as("n"))
      inter
        .join(sz.select(col("id").as("id1"), col("sz").as("sz1")), "id1")
        .join(sz.select(col("id").as("id2"), col("sz").as("sz2")), "id2")
        .withColumn("jaccard",
          col("n").cast("double") / (col("sz1") + col("sz2") - col("n")).cast("double"))
        .filter(col("jaccard") >= 0.5)
        .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("id1", "id2")
    }),

    "d06_dedup_resolve" -> ((s, dir) => {
      val docs = T(s, dir, "documents").filter(col("doc_id") < 500)
      val pairs = Dedup.jaccardPairs(
        Dedup.shingles(docs, "doc_id", "text", 3), 0.5)
      Dedup.components(docs.select(col("doc_id")), "doc_id", pairs)
        .orderBy("doc_id")
    }),

    "d20_soft_dedup" -> ((s, dir) => {
      // SoftDeDup: downweight near-dup clusters to unit total mass
      // instead of dropping members — weight = 1/|component|
      val docs = T(s, dir, "documents").filter(col("doc_id") < 500)
      val pairs = Dedup.jaccardPairs(
        Dedup.shingles(docs, "doc_id", "text", 3), 0.5)
      Dedup.softDedupWeights(docs.select(col("doc_id")), "doc_id", pairs)
        .select(col("doc_id"), col("component"), col("cluster_size"), col("weight"))
        .orderBy("doc_id")
    }),

    "d07_keep_best" -> ((s, dir) => {
      // near-dup resolution a curation pipeline wants: among near
      // duplicates keep the highest-QUALITY copy, not the smallest id
      val docs = T(s, dir, "documents").filter(col("doc_id") < 500)
        .withColumn("quality", TextFunctions.qualityScore(col("text")))
      val pairs = Dedup.jaccardPairs(
        Dedup.shingles(docs, "doc_id", "text", 3), 0.5)
      Dedup.resolveKeepBest(docs, "doc_id", "quality", pairs)
        .select("doc_id", "component", "quality")
        .orderBy("doc_id")
    }),

    "d08_decontaminate" -> ((s, dir) => {
      // eval-contamination sweep: every 50th doc plays the benchmark set
      val docs = T(s, dir, "documents")
      Decontaminate.flag(
          docs.filter(col("doc_id") % 50 =!= 0),
          docs.filter(col("doc_id") % 50 === 0),
          "doc_id", "text", shingleN = 3, minOverlap = 5)
        .select(col("id").as("doc_id"), col("n_bench_hits"), col("max_overlap"))
        .orderBy("doc_id")
    }),

    "d21_semantic_decontaminate" -> ((s, dir) => {
      // paraphrase-contamination sweep: the 20 lowest-id embeddings
      // play the eval set; corpus rows within cosine 0.35 of any of
      // them flag, with the nearest eval item named. Eval vectors ride
      // as literals — zero shuffles, no join
      val emb = T(s, dir, "embeddings")
      Decontaminate.semanticFlag(
          emb.filter(col("vec_id") >= 20), "vec_id", "embedding",
          emb.filter(col("vec_id") < 20), "vec_id", "embedding",
          threshold = 0.35)
        .select(col("id").as("vec_id"), col("eval_id"), col("cos"))
        .orderBy("vec_id")
    }),

    "d22_source_overlap" -> ((s, dir) =>
      // cross-source overlap audit: pairwise shingle-Jaccard estimates
      // from per-source KMV bottom-128 sketches — the "how much does
      // crawl A repeat crawl B" report, corpus touched exactly once
      Dedup.sourceOverlapKmv(T(s, dir, "documents"), "source", "text",
          k = 128)
        .orderBy("s1", "s2")),

    "d09_blocklist" -> ((s, dir) => {
      // bloom-prune + exact-verify blocklist scrub: result is exactly
      // the anti join, but only bloom-positive rows reach the join
      val docs = T(s, dir, "documents")
      val blocked = docs.filter(col("doc_id") % 97 === 0)
        .select(col("text").as("blocked_text"))
      operators.Blocklist.filterOut(docs, blocked, "text", "blocked_text")
        .select("doc_id", "source")
        .orderBy("doc_id")
    }),

    "d10_containment" -> ((s, dir) =>
      // asymmetric near-dup: short doc quoted inside a longer one has
      // low jaccard but high containment from the short side
      Dedup.containmentPairs(
          Dedup.shingles(T(s, dir, "documents").filter(col("doc_id") < 500),
            "doc_id", "text", 3), 0.8)
        .orderBy("id1", "id2")),

    "t10_heavy_hitters_by_key" -> ((s, dir) =>
      // the Misra-Gries aggregate is mergeable AND group-able: per-user-
      // segment top event types in k-bounded memory per group
      T(s, dir, "events")
        .withColumn("seg", (col("user_id") % 10).cast("long"))
        .groupBy("seg")
        .agg(graft.functions.HeavyHittersAgg.top(col("event_type"), 16).as("hh"))
        .select(col("seg"), explode(col("hh")).as("h"))
        .select(col("seg"), col("h.item").as("item"), col("h.cnt").as("cnt"))
        .orderBy(col("seg"), col("cnt").desc, col("item"))),

    "d05_dedup_embedding" -> ((s, dir) =>
      // exact-cosine ORACLE baseline, bounded to a fixed id slice: the
      // all-pairs join is quadratic, so it runs only on this slice (the
      // whole table at sf0.01); s06 is the unbounded-scale LSH path
      Similarity.cosinePairs(
          T(s, dir, "embeddings").filter(col("vec_id") < 1000),
          "vec_id", "embedding", 0.45)
        .orderBy("id1", "id2")),

    "s01_ann_brute" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.bruteTopK(emb, "vec_id", "embedding", q, "qid", "qvec", k = 10)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("query_id", "rank")
    }),

    "s17_filtered_ann" -> ((s, dir) => {
      // metadata-filtered vector search (pre-filter strategy): top-10
      // cosine among label=1 vectors only; the predicate reaches the
      // parquet scan, the ranking is exact within survivors
      val emb = T(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.filteredTopK(emb, "vec_id", "embedding",
          col("label") === 1, q, "qid", "qvec", k = 10)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("query_id", "rank")
    }),

    "s18_postfiltered_ann" -> ((s, dir) => {
      // the POST-FILTER strategy on the same task as s17: top-20 on
      // the unfiltered corpus, then label=1 + re-rank to 10. Short
      // result lists (a predicate-sparse neighborhood survives with
      // < 10 rows) are the measurable recall loss the over-fetch
      // factor trades against; exact arithmetic end to end
      val emb = T(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.filteredTopKPost(emb, "vec_id", "embedding",
          col("label") === 1, q, "qid", "qvec", k = 10, overFetch = 2)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("query_id", "rank")
    }),

    "s19_mmr_rerank" -> ((s, dir) => {
      // MMR diverse re-ranking (Carbonell & Goldstein 1998): 5 greedy
      // rounds of argmax(0.7*rel - 0.3*maxSimToSelected) over the
      // exact top-20 prefetch — declarative round unrolling, no UDF;
      // the oracle replays the identical rounds as chained CTEs
      val emb = T(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.mmrTopK(emb, "vec_id", "embedding", q, "qid", "qvec",
          k = 5, prefetch = 20, lam = 0.7)
        .orderBy("query_id", "mmr_rank")
    }),

    "s02_ann_lsh" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.lshTopK(emb, "vec_id", "embedding", q, "qid", "qvec",
          k = 10, numPlanes = 6, numTables = 8)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("query_id", "rank")
    }),

    "s03_ann_ivf" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.ivfTopK(emb, "vec_id", "embedding", q, "qid", "qvec",
          k = 10, nlist = 16, nprobe = 8, refineIters = 4, spill = 2)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("query_id", "rank")
    }),

    "s06_cosine_pairs_lsh" -> ((s, dir) =>
      // the embedding near-dup SCALE path: O(bucket^2) LSH candidates
      // instead of the O(n^2) exhaustive d05; rows-only check (xxhash
      // bucketing isn't DuckDB-expressible), quality gated by
      // CosinePairsLshSpec + the d05 overlap at this threshold
      // maxBucket caps a degenerate hyperplane bucket pre-self-join
      // (no-op at these SFs — buckets run ~100x smaller than the cap)
      Similarity.cosinePairsLsh(T(s, dir, "embeddings"), "vec_id", "embedding",
          threshold = 0.45, numPlanes = 6, numTables = 8,
          maxBucket = Some(10000))
        .orderBy("id1", "id2")),

    "s07_quantize_int8" -> ((s, dir) =>
      Similarity.quantizeInt8(T(s, dir, "embeddings"), "vec_id", "embedding")
        .select(col("id").as("vec_id"), col("pos"), col("code"), col("scale"))
        .orderBy("vec_id", "pos")),

    "s21_top_pc" -> ((s, dir) =>
      // top principal component by power iteration: the PCA-rotation
      // prerequisite and the embedding anisotropy/drift diagnostic;
      // one corpus moment pass + a driver-side iteration over the
      // d x d matrix, hash-exact via the round6/decimal discipline
      Similarity.topPcPower(T(s, dir, "embeddings"), "vec_id", "embedding")
        .orderBy("pos")),

    "s22_pc_project" -> ((s, dir) =>
      // the PCA APPLY step: every vector's signed coordinate along
      // the corpus top PC (s21's training pass), centered by the same
      // corpus mean; loadings+means embed as literals in one
      // zero-shuffle narrow pass, engine-exact via round6/decimal
      Similarity.pcProject(T(s, dir, "embeddings"), "vec_id", "embedding")
        .select(col("id").as("vec_id"), col("pc_score"))
        .orderBy("vec_id")),

    "s27_top_pc_fd" -> ((s, dir) =>
      // Frequent-Directions top direction: the scale path past s21's
      // d^2 <= 16384 exact-Gramian contract — an ell x d mergeable
      // sketch with the Liberty covariance guarantee. Rows-only
      // (SVD not oracle-expressible); FdSketchSpec gates accuracy,
      // the error bound, and d=768 recovery.
      Similarity.topPcFd(T(s, dir, "embeddings"), "vec_id", "embedding",
          ell = 32)
        .orderBy("pos")),

    "s24_pca_topk" -> ((s, dir) =>
      // top-3 principal components by power iteration + Hotelling
      // deflation: ONE Gramian corpus pass trains all components
      // (deflation is a d^2 driver update); the k-axis anisotropy
      // view and the OPQ-style rotation trainer
      Similarity.topKPcPower(T(s, dir, "embeddings"), "vec_id",
          "embedding", k = 3)
        .orderBy("component", "pos")),

    "s25_pc_whiten" -> ((s, dir) =>
      // PCA whitening: every vector's centered coordinate along each
      // top-3 component plus the sqrt(eigenvalue)-normalized whitened
      // coordinate — k*d loadings + d means as literals, one
      // zero-shuffle narrow pass, k rows per vector
      Similarity.pcWhiten(T(s, dir, "embeddings"), "vec_id",
          "embedding", k = 3)
        .select(col("id").as("vec_id"), col("component"),
          col("score"), col("white"))
        .orderBy("vec_id", "component")),

    "s20_int8_ann" -> ((s, dir) => {
      // symmetric int8 quantized search (FAISS SQ8 shape): scales
      // cancel out of the cosine, so ranking runs entirely on BIGINT
      // code arithmetic — 8x less scan bandwidth than float64 and
      // zero float-reassociation hazard; oracle-EXACT
      val emb = T(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.int8TopK(emb, "vec_id", "embedding", q, "qid", "qvec", k = 10)
        .orderBy("query_id", "rank")
    }),

    "s08_random_projection" -> ((s, dir) =>
      // deterministic SRP 64 -> 16 dims (md5-parity signs, decimal
      // sums): the dimensionality-reduction front of an embedding
      // pipeline, bit-identical across engines
      Similarity.randomProjection(T(s, dir, "embeddings"), "vec_id", "embedding", 16)
        .select(col("id").as("vec_id"), col("j"), col("proj"))
        .orderBy("vec_id", "j")),

    "p04_source_quota" -> ((s, dir) =>
      // cap any one source's contribution (md5-ordered keep, not
      // arrival-ordered): no giant domain dominates the corpus
      Training.sourceQuota(T(s, dir, "documents"), "source", "doc_id", 30L)
        .select(col("doc_id"), col("source"))
        .orderBy("doc_id")),

    "p22_fim_split" -> ((s, dir) =>
      // fill-in-the-middle span assignment at the published 0.5 rate:
      // hash-gated selection, two uniform md5-channel cut points,
      // PSM/SPM by a further channel — row-local, reproducible,
      // composes in front of the packing family unchanged
      Training.fimSplit(T(s, dir, "documents"), "doc_id", "text",
          fimRate = 0.5)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    "p05_split" -> ((s, dir) =>
      // deterministic 10/10/80 val/test/train split by md5 hash range:
      // a doc's split never changes as the corpus grows
      Training.assignSplit(T(s, dir, "documents"), "doc_id",
          valFrac = 0.1, testFrac = 0.1)
        .select(col("doc_id"), col("split"))
        .orderBy("doc_id")),

    "p19_interleave" -> ((s, dir) =>
      // stratified interleaved training order: round r holds the
      // r-th md5-ranked doc of every source — consecutive training
      // positions rotate across sources instead of chancing long
      // same-source runs; one source-key shuffle, no global window
      Training.interleaveOrder(T(s, dir, "documents"), "doc_id", "source")
        .select(col("doc_id"), col("source"), col("round"), col("ord"))
        .orderBy("round", "ord")),

    "p18_leakage_split" -> ((s, dir) => {
      // cluster-aware train/val/test split: near-dup components (the
      // d06 machinery on the same 3-gram tau=0.5 pairs) draw ONE hash
      // bucket per component, so a duplicate can never land in train
      // while its twin lands in test
      val docs = T(s, dir, "documents").filter(col("doc_id") < 500)
      val pairs = Dedup.jaccardPairs(
        Dedup.shingles(docs, "doc_id", "text", 3), 0.5)
      Training.leakageSafeSplit(docs.select(col("doc_id")), "doc_id",
          pairs, valFrac = 0.2, testFrac = 0.2)
        .select(col("doc_id"), col("component"), col("split"))
        .orderBy("doc_id")
    }),

    "p06_token_budget" -> ((s, dir) =>
      // reproducible ~N-token corpus cut: whole docs in md5 order
      // until the budget; distributed prefix sum, no global window
      Training.tokenBudget(
          T(s, dir, "documents").withColumn("n_toks",
            graft.functions.TextFunctions.tokenCountWs(col("text")).cast("long")),
          "doc_id", "n_toks", budget = 20000L)
        .select(col("doc_id"), col("n_toks"))
        .orderBy("doc_id")),

    "p06b_token_budget_bpe" -> ((s, dir) => {
      // the honest-token budget cut the t34/t35 trio advertises:
      // p06's distributed prefix-sum budget device fed by the
      // corpus-trained BPE token counts (shared memoized table)
      // instead of whitespace counts — budget math over the tokens
      // the model actually pays for
      val merges = bpeTable(s, dir, 8).map(_._2)
      val counted = TextStats.bpeTokenCounts(
          T(s, dir, "documents"), "doc_id", "text", merges)
        .withColumnRenamed("id", "doc_id")
      Training.tokenBudget(counted, "doc_id", "n_bpe", budget = 80000L)
        .select(col("doc_id"), col("n_bpe"))
        .orderBy("doc_id")
    }),

    "p10_chunk_windows" -> ((s, dir) =>
      // context-window chunking: 32-token windows every 24 tokens
      // (8-token overlap); the tail chunk runs short, empty docs drop
      Training.chunkWindows(T(s, dir, "documents"), "doc_id", "text",
          maxLen = 32, stride = 24)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "chunk_idx")),

    "p07_dsir" -> ((s, dir) =>
      // DSIR importance resampling (Xie et al. 2023): hashed
      // unigram+bigram bucket LM ratio of the en-language target
      // slice vs the raw corpus; deterministic top-100 by log weight
      Training.dsirWeights(T(s, dir, "documents"), "doc_id", "text",
          targetPred = col("lang") === "en")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    "p08_temperature" -> ((s, dir) =>
      // Pile/mT5-style temperature mixture: halve the corpus with
      // per-source shares ∝ sqrt(n_s); exact integer quota math,
      // salted two-phase md5-order selection
      Training.temperatureSample(T(s, dir, "documents"), "source",
          "doc_id", targetNum = 1L, targetDen = 2L)
        .select(col("doc_id"), col("source"))
        .orderBy("doc_id")),

    "p09_curriculum" -> ((s, dir) =>
      // curriculum staging: 4 quality bands cut BY VALUE on the score
      // histogram (stage 1 = cleanest; equal scores share a stage) —
      // the corpus itself never windows
      Training.curriculumStages(T(s, dir, "documents"), "doc_id",
          functions.TextFunctions.qualityScore(col("text")), nStages = 4)
        .select(col("id").as("doc_id"), col("score").as("quality"),
          col("stage"))
        .orderBy("doc_id")),

    "p11_diverse_sample" -> ((s, dir) => {
      // cluster-balanced coreset sampling: nearest of 8 fixed
      // centroids (lowest-id embeddings — the s09 oracle-replayable
      // k-means stand-in), then at most 50 md5-ordered picks per
      // cluster: dense modes clip at the quota, rare modes keep all
      val emb = T(s, dir, "embeddings")
      Similarity.diverseSample(emb, "vec_id", "embedding",
          emb.filter(col("vec_id") < 8), "vec_id", "embedding", quota = 50)
        .orderBy("vec_id")
    }),

    "p12_pack_greedy" -> ((s, dir) =>
      // no-split greedy (next-fit) packing: 512-token packs that never
      // cross a 128-doc id shard — the bounded sequential unit that
      // makes greedy packing distribute
      Training.packGreedy(
          T(s, dir, "documents").withColumn("n_toks",
            graft.functions.TextFunctions.tokenCountWs(col("text")).cast("long")),
          "doc_id", "n_toks", seqLen = 512L, shardSize = 128L)
        .orderBy("doc_id")),

    "p20_pack_efficiency" -> ((s, dir) => {
      // the packing-quality report (the metric Krell et al. optimize):
      // padding vs capacity over p12's packs — an oversized lone doc
      // contributes its own fill as capacity, padding nothing
      val docs = T(s, dir, "documents").withColumn("n_toks",
        graft.functions.TextFunctions.tokenCountWs(col("text")).cast("long"))
      val packed = Training.packGreedy(docs, "doc_id", "n_toks",
        seqLen = 512L, shardSize = 128L)
      packed.join(docs.select(col("doc_id"), col("n_toks")), "doc_id")
        .groupBy(col("shard"), col("pack"))
        .agg(sum(col("n_toks")).as("fl"))
        .agg(cnt.as("n_packs"),
          sum(col("fl")).cast("long").as("n_tokens"),
          sum(when(col("fl") > 512, 1L).otherwise(0L)).cast("long")
            .as("n_oversized"),
          round(sum(greatest(lit(0L), lit(512L) - col("fl"))).cast("double")
            / sum(greatest(lit(512L), col("fl"))).cast("double"), 6)
            .as("waste_frac"),
          round(expr("percentile(fl, 0.5)"), 6).as("p50_fill"))
    }),

    "p21_seq_profile" -> ((s, dir) =>
      // per-source sequence-length profile: the distribution maxLen /
      // packing / chunking choices are made FROM — exact percentiles
      // per |sources| group, one shuffle
      T(s, dir, "documents")
        .select(col("source"),
          TextFunctions.tokenCountWs(col("text")).cast("long").as("n_toks"))
        .groupBy(col("source"))
        .agg(cnt.as("n_docs"),
          round(expr("percentile(n_toks, 0.5)"), 6).as("p50_toks"),
          round(expr("percentile(n_toks, 0.95)"), 6).as("p95_toks"),
          max(col("n_toks")).as("max_toks"),
          sum(col("n_toks")).cast("long").as("total_toks"))
        .orderBy("source")),

    "p15_pack_bestfit" -> ((s, dir) =>
      // best-fit-decreasing packing (Krell et al.'s main algorithm;
      // p12 is its next-fit baseline): longest-first placement into
      // the fullest open pack that fits, per 128-doc shard
      Training.packBestFit(
          T(s, dir, "documents").withColumn("n_toks",
            graft.functions.TextFunctions.tokenCountWs(col("text")).cast("long")),
          "doc_id", "n_toks", seqLen = 512L, shardSize = 128L)
        .orderBy("doc_id")),

    "p16_token_waterfill" -> ((s, dir) =>
      // max-min fair token allocation across sources: one water level
      // L with sum_s min(T_s, L) <= budget maximal; under-cap sources
      // keep everything, over-cap sources keep md5-first docs to L
      // tokens. BIGINT-exact level solve over the |sources|-row
      // totals frame; oracle replays the identical windows
      Training.tokenWaterfill(
          T(s, dir, "documents").withColumn("n_toks",
            graft.functions.TextFunctions.tokenCountWs(col("text")).cast("long")),
          "doc_id", "source", "n_toks", budget = 26000L)
        .select(col("doc_id"), col("source"), col("n_toks"))
        .orderBy("doc_id")),

    "p17_effective_tokens" -> ((s, dir) =>
      // Muennighoff 2023 data-constrained accounting: per-source
      // effective tokens under a 2000-token/source allocation —
      // repetition value decays as e^(-R/5.3), evaluated as an
      // engine-exact Horner chain so the oracle hash-matches
      Training.effectiveTokens(
          T(s, dir, "documents").withColumn("n_toks",
            graft.functions.TextFunctions.tokenCountWs(col("text")).cast("long")),
          "source", "n_toks", allocPerSource = 2000.0)
        .orderBy("source")),

    "d25_sig_store_dedup" -> ((s, dir) => {
      // signature-store dedup: the old half's text never enters the
      // plan after its one-time signature build — candidates from
      // band buckets, similarity ESTIMATED as matching components/8
      // (the MinHash unbiased estimator), the realistic corpus-append
      // shape where yesterday's petabytes are cold
      val docs = T(s, dir, "documents").filter(col("doc_id") < 500)
      val store = Dedup.portableSignatureStore(
        docs.filter(col("doc_id") < 250), "doc_id", "text")
      Dedup.sigStoreDedup(store, docs.filter(col("doc_id") >= 250),
          "doc_id", "text", minMatches = 4)
        .select(col("doc_id"), col("matched_id"), col("matches"),
          col("est_jaccard"))
        .orderBy("doc_id", "matched_id")
    }),

    "d28_dedup_report" -> ((s, dir) => {
      // per-source duplication report card: how much of each source
      // is duplicated text, how many clusters, the largest cluster —
      // the between-stage drift view (mirror/SEO-farm jumps, giant
      // boilerplate clusters) on the same 3-gram tau=0.5 components
      val docs = T(s, dir, "documents").filter(col("doc_id") < 500)
      val pairs = Dedup.jaccardPairs(
        Dedup.shingles(docs, "doc_id", "text", 3), 0.5)
      Dedup.dedupReport(docs.select(col("doc_id"), col("source")),
          "doc_id", "source", pairs)
        .orderBy("source")
    }),

    "d27_incremental_cc" -> ((s, dir) => {
      // append-mode component resolution: yesterday's store (old half
      // + its own pairs) folds in today's batch via edge CONTRACTION
      // — CC runs on a graph proportional to the NEW pairs, never
      // history — and must equal one-shot CC over everything (the
      // oracle computes exactly that)
      val docs = T(s, dir, "documents").filter(col("doc_id") < 500)
      val oldDocs = docs.filter(col("doc_id") < 250)
      val newDocs = docs.filter(col("doc_id") >= 250)
      val store = Dedup.components(oldDocs.select(col("doc_id")), "doc_id",
          Dedup.jaccardPairs(Dedup.shingles(oldDocs, "doc_id", "text", 3), 0.5))
        .select(col("doc_id").as("id"), col("component"))
      // in production these arrive from d25's sig-store matches; here
      // the same tau=0.5 pairs touching at least one new doc
      val newPairs = Dedup.jaccardPairs(
          Dedup.shingles(docs, "doc_id", "text", 3), 0.5)
        .filter(col("id1") >= 250 || col("id2") >= 250)
      Dedup.incrementalComponents(store, newDocs.select(col("doc_id")),
          "doc_id", newPairs)
        .select(col("id").as("doc_id"), col("component"))
        .orderBy("doc_id")
    }),

    "d26_kmv_store_merge" -> ((s, dir) => {
      // incremental corpus stats: two ingest runs each sketch their
      // own half's per-source distinct tokens (KMV bottom-64 over
      // portable md5); the stores merge with pure column arithmetic
      // and the merged estimates HASH-MATCH the oracle's one-shot
      // whole-corpus pass — the driver-verified mergeability proof
      // behind never re-scanning cold history
      val docs = T(s, dir, "documents")
      def toks(df: org.apache.spark.sql.DataFrame) = df
        .select(col("source"),
          explode(split(lower(col("text")), "\\s+")).as("tok"))
        .filter(length(col("tok")) > 0)
      val runA = graft.operators.SketchStore.kmvStore(
        toks(docs.filter(col("doc_id") < 500)), "source", md5(col("tok")), 64)
      val runB = graft.operators.SketchStore.kmvStore(
        toks(docs.filter(col("doc_id") >= 500)), "source", md5(col("tok")), 64)
      graft.operators.SketchStore.kmvStoreMerge(runA, runB, "source", 64)
        .select(col("source"), size(col("kmv")).cast("long").as("n_sketch"),
          graft.functions.KmvAgg.distinctEst(col("kmv"), 64)
            .as("distinct_tokens_est"))
        .orderBy("source")
    }),

    "p13_epoch_repeat" -> ((s, dir) =>
      // fractional epoch mixing (GPT-3 Table 2.2 style): the head
      // sources train 2.45 epochs, the tail 0.7 — every doc repeats
      // floor(ep) times plus an md5-drawn extra for the fraction
      Training.epochRepeat(T(s, dir, "documents"), "doc_id",
          when(col("source").isin("src0", "src1", "src2", "src3", "src4"),
            lit(2.45)).otherwise(lit(0.7)))
        .orderBy("doc_id", "epoch")),

    "p14_weighted_sample" -> ((s, dir) =>
      // Efraimidis–Spirakis A-ES weighted sample: 100 docs drawn
      // without replacement, inclusion odds ∝ token count; u from the
      // doc's own md5 so the draw reproduces in any engine. Empty
      // docs are excluded EXPLICITLY (weight 0 can never be drawn —
      // passing one fails loudly by contract)
      Training.weightedSample(
          T(s, dir, "documents").withColumn("n_toks",
            graft.functions.TextFunctions.tokenCountWs(col("text")).cast("long"))
            .filter(col("n_toks") > 0),
          "doc_id", col("n_toks"), k = 100)
        .select(col("doc_id"), col("n_toks"), col("_wkey").as("wkey"))
        .orderBy("doc_id")),

    "s10_pq" -> ((s, dir) => {
      // product quantization m=8 over 64 dims — 8 codes per vector,
      // the IVF-PQ storage layout; codebook = the 16 lowest-id
      // vectors' subvectors (deterministic k-means stand-in)
      val emb = T(s, dir, "embeddings")
      Similarity.productQuantize(emb, "vec_id", "embedding",
          emb.filter(col("vec_id") < 16), "vec_id", "embedding", m = 8)
        .select(col("id").as("vec_id"), col("sub"), col("code"))
        .orderBy("vec_id", "sub")
    }),

    "s11_pq_adc" -> ((s, dir) => {
      // PQ asymmetric-distance top-k: the IVF-PQ query path — corpus
      // seen only through its 8 codes, per-query distance tables
      // broadcast, decimal-summed lookups (deterministic vs oracle)
      val emb = T(s, dir, "embeddings")
      Similarity.pqAdcTopK(emb, "vec_id", "embedding",
          emb.filter(col("vec_id") < 5), "vec_id", "embedding",
          emb.filter(col("vec_id") < 16), "vec_id", "embedding",
          m = 8, k = 10)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("query_id", "rank")
    }),

    "s12_ivf_pq" -> ((s, dir) => {
      // IVF-PQ end-to-end (FAISS IVFPQ composition): coarse-probe
      // nprobe of 16 lists, ADC-rank candidates through their 8 PQ
      // codes — the billion-scale query path assembled from s03's
      // lists + s10's codes + s11's ADC scan. Vectors are
      // L2-NORMALIZED first (the FAISS cosine recipe: on unit vectors
      // L2² = 2 − 2·cos, so the ADC L2 rank IS the cosine rank —
      // unnormalized, the two orderings diverge and recall@10 vs the
      // cosine brute force drops 0.42-level). Codebook = TRAINED
      // per-subspace k-means (trainPqCodebook — raw corpus rows as
      // codewords, s11's stand-in, quantize near-random embeddings too
      // coarsely to rank neighbors). Rows-only check (xxhash seeding
      // not DuckDB-expressible); recall@10 gated in AnnRecallSpec.
      val emb = T(s, dir, "embeddings").withColumn("embedding",
        transform(col("embedding"),
          x => x.cast("double") / Similarity.norm(col("embedding"))))
      val cb = Similarity.trainPqCodebook(emb, "vec_id", "embedding",
        m = 16, ksub = 256, iters = 2)
      // refine=3: ADC shortlists 3k, exact cosine re-ranks ONLY those
      // (FAISS IndexRefineFlat) — 30 raw-vector reads per query at any
      // corpus size, recall 0.74 -> 0.98
      Similarity.ivfPqTopK(emb, "vec_id", "embedding",
          emb.filter(col("vec_id") < 5), "vec_id", "embedding",
          cb, "code", "codeword",
          m = 16, k = 10, nlist = 16, nprobe = 8, refineIters = 4, spill = 2,
          refine = 3)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("query_id", "rank")
    }),

    "s26_ann_index" -> ((s, dir) => {
      // the persistent ANN index workflow (build once, serve many —
      // the d25 store split applied to ANN): buildAnnIndex trains the
      // coarse quantizer and encodes the corpus into posting lists
      // with inline PQ codes; annIndexTopK then serves a query batch
      // against the STORE alone, never touching raw corpus vectors.
      // Rows-only (xxhash seeding, as s12); AnnIndexSpec pins
      // store-served == end-to-end ivfPqTopK bit-for-bit including a
      // parquet round-trip of both store relations.
      val emb = T(s, dir, "embeddings").withColumn("embedding",
        transform(col("embedding"),
          x => x.cast("double") / Similarity.norm(col("embedding"))))
      val cb = Similarity.trainPqCodebook(emb, "vec_id", "embedding",
        m = 16, ksub = 256, iters = 2)
      val (cents, postings) = Similarity.buildAnnIndex(emb, "vec_id",
        "embedding", cb, "code", "codeword",
        m = 16, nlist = 16, refineIters = 4, spill = 2)
      Similarity.annIndexTopK(cents, postings,
          emb.filter(col("vec_id") < 5), "vec_id", "embedding",
          cb, "code", "codeword", m = 16, k = 10, nprobe = 8)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("query_id", "rank")
    }),

    "s13_ivf_pq_residual" -> ((s, dir) => {
      // RESIDUAL-encoded IVF-PQ (the actual FAISS layout): corpus
      // vectors PQ-encode v − centroid with residual-trained subspace
      // codebooks; each query builds one ADC table per probed list
      // from its own residual. refine=1 on purpose: this entry shows
      // the COMPRESSED-domain rank quality residual coding buys
      // (recall gate in AnnRecallSpec); s12 shows the refined path.
      val emb = T(s, dir, "embeddings").withColumn("embedding",
        transform(col("embedding"),
          x => x.cast("double") / Similarity.norm(col("embedding"))))
      Similarity.ivfPqResidualTopK(emb, "vec_id", "embedding",
          emb.filter(col("vec_id") < 5), "vec_id", "embedding",
          m = 16, k = 10, ksub = 256, nlist = 16, nprobe = 12,
          refineIters = 4, pqIters = 4)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("query_id", "rank")
    }),

    "s14_hamming_topk" -> ((s, dir) => {
      // binary-sketch ANN (Charikar simhash-for-cosine): 16-bit
      // portable SRP sign codes, XOR+popcount shortlist, exact-cosine
      // rerank — the whole path md5-deterministic, so unlike the
      // seeded LSH family it is oracle-exact end to end
      val emb = T(s, dir, "embeddings")
      Similarity.hammingTopK(emb, "vec_id", "embedding",
          emb.filter(col("vec_id") < 10), "vec_id", "embedding", k = 10)
        .orderBy("query_id", "rank")
    }),

    "s15_matryoshka" -> ((s, dir) => {
      // Matryoshka prefix-dim ANN (Kusupati et al. 2022): 16-of-64-dim
      // prefix cosine shortlist (the scan reads 1/4 of the vector
      // bytes), exact full-dim rerank of the top-50 — plain arithmetic
      // end to end, so oracle-exact
      val emb = T(s, dir, "embeddings")
      Similarity.matryoshkaTopK(emb, "vec_id", "embedding",
          emb.filter(col("vec_id") < 10), "vec_id", "embedding",
          k = 10, prefixDims = 16, shortlist = 50)
        .orderBy("query_id", "rank")
    }),

    "s09_semdedup" -> ((s, dir) => {
      // SemDeDup: centroid clusters bound the quadratic cosine scan;
      // within each cluster the lowest-id member of every >=0.35 ball
      // survives. Centroids here = the 8 lowest-id embeddings (a
      // deterministic stand-in for the k-means step, which the oracle
      // cannot replay)
      val emb = T(s, dir, "embeddings")
      Similarity.semDedup(emb, "vec_id", "embedding",
          emb.filter(col("vec_id") < 8), "vec_id", "embedding",
          threshold = 0.35)
        .select(col("id").as("vec_id"), col("cluster"))
        .orderBy("vec_id")
    }),

    "s04_centroids" -> ((s, dir) =>
      Similarity.centroids(T(s, dir, "embeddings"), "label", "embedding")
        .select(col("label"), col("pos"), round(col("c"), 6).as("c"))
        .orderBy("label", "pos")),

    "s23_centroid_sim" -> ((s, dir) =>
      // inter-slice redundancy audit: pairwise cosine between the
      // per-label centroids — near-1 pairs are candidate merges or
      // leakage; one corpus centroid pass, everything after runs on
      // the |labels| x d frame
      Similarity.centroidSimilarity(T(s, dir, "embeddings"),
          "label", "embedding")
        .orderBy("label1", "label2")),

    "s32_ivf_exact" -> ((s, dir) => {
      // ORACLE-EXACT IVF: trained coarse quantizer (s29's exact
      // trajectory), exact-integer probe of 2 nearest lists, s01
      // cosine over the probed candidates — the whole search replays
      // in SQL, making IVF's recall/cost trade auditable hash-exactly
      val emb = T(s, dir, "embeddings")
      Similarity.ivfExactTopK(emb, "vec_id", "embedding",
          emb.filter(col("vec_id") < 5), "vec_id", "embedding",
          k = 10, nprobe = 2, kClusters = 8, iters = 3, dims = 64,
          trained = Some(kmeansQuantizer(s, dir, 8, 3, 64)))
        .orderBy("query_id", "rank")
    }),

    "s31_centroid_drift" -> ((s, dir) => {
      // snapshot drift monitor: even vec_ids stand in for the old
      // crawl, odd for the new — per label, did its region of
      // embedding space move?
      val emb = T(s, dir, "embeddings")
      Similarity.centroidDrift(
          emb.filter(col("vec_id") % 2 === 0),
          emb.filter(col("vec_id") % 2 === 1),
          "label", "embedding")
        .orderBy("label")
    }),

    "s30_kmeans_prune" -> ((s, dir) => {
      // unsupervised SSL prototypes (Sorscher et al. 2022, the
      // headline composition): k-means in embedding space, then
      // prototypicality pruning within each TRAINED cluster — s29's
      // assignment feeds s28's ranker unchanged
      val emb = T(s, dir, "embeddings")
      val asg = Similarity.kmeansAssign(emb, "vec_id", "embedding",
          kmeansQuantizer(s, dir, 8, 3, 64), dims = 64)
        .select(col("id").as("vec_id"), col("cluster"))
      Similarity.protoPrune(emb.join(asg, "vec_id"), "vec_id", "cluster",
          "embedding", pruneNum = 3, pruneDen = 10)
        .withColumnRenamed("label", "cluster")
        .withColumnRenamed("rank_in_label", "rank_in_cluster")
        .withColumnRenamed("n_label", "n_cluster")
        .orderBy("cluster", "rank_in_cluster")
    }),

    "s29_kmeans_train" -> ((s, dir) =>
      // distributed Lloyd: 3 exact-integer-micro updates from the
      // md5-deterministic seed, then the final assignment — one
      // (cluster,pos) shuffle + one bounded k*d collect per iteration,
      // zero-shuffle literal-codegen assignment passes
      Similarity.kmeansAssign(T(s, dir, "embeddings"), "vec_id",
          "embedding", kmeansQuantizer(s, dir, 8, 3, 64), dims = 64)
        .withColumnRenamed("id", "vec_id")
        .orderBy("vec_id")),

    "s28_proto_prune" -> ((s, dir) =>
      // prototypicality pruning (Sorscher et al. 2022): score every
      // vector against its own label centroid, prune the top-30% most
      // prototypical per label — one centroid pass, broadcast joins,
      // window ranked within the pruning cluster
      Similarity.protoPrune(T(s, dir, "embeddings"), "vec_id", "label",
          "embedding", pruneNum = 3, pruneDen = 10)
        .orderBy("label", "rank_in_label")),

    "s05_vec_norm" -> ((s, dir) =>
      T(s, dir, "embeddings")
        .select(col("vec_id"), round(Similarity.norm(col("embedding")), 6).as("l2"))
        .orderBy("vec_id")),

    "q26_full_outer" -> ((s, dir) => {
      // full outer join: users seen in events vs customers — either
      // side may be absent; shuffle on the key, AQE handles skew
      val ev = T(s, dir, "events")
        .groupBy(col("user_id")).agg(cnt.as("n_events"))
      val cust = T(s, dir, "customer")
        .select(col("c_custkey").cast("long").as("cust_id"), col("c_mktsegment"))
      ev.join(cust, ev("user_id") === cust("cust_id"), "full_outer")
        .select(coalesce(col("user_id"), col("cust_id")).as("id"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          coalesce(col("c_mktsegment"), lit("NONE")).as("segment"))
        .orderBy("id")
    }),

    "q27_rolling_window" -> ((s, dir) => {
      // TIME-range frame, not row frame: each event's trailing-1h sum
      // per user — ties in ts all join the frame, so the result is
      // order-independent; one shuffle on user_id
      val w = Window.partitionBy("user_id").orderBy("ts_us")
        .rangeBetween(-3600000000L, Window.currentRow)
      T(s, dir, "events")
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"), col("value"))
        .withColumn("rolling_sum",
          sum(col("value").cast("decimal(18,2)")).over(w).cast("double"))
        .drop("value")
        .orderBy("user_id", "ts_us", "event_id")
    }),

    "q28_rank_funcs" -> ((s, dir) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      T(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"),
          dense_rank().over(w).cast("long").as("drnk"),
          round(percent_rank().over(w), 6).as("prnk"),
          ntile(4).over(w).cast("long").as("quartile"))
        .orderBy("o_orderpriority", "drnk", "o_orderkey")
    }),

    "q23_grouping_sets" -> ((s, dir) => {
      T(s, dir, "orders").createOrReplaceTempView("graft_q23_orders")
      s.sql("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
                      coalesce(o_orderpriority, 'ALL') AS priority,
                      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
                      CAST(count(*) AS BIGINT) AS n
               FROM graft_q23_orders
               GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                       (o_orderstatus, o_orderpriority))
               ORDER BY 1, 2""")
    }),

    "q25_percentile_approx" -> ((s, dir) =>
      // mergeable quantile sketch — the 100 TB path where exact
      // percentile's full sort-per-group is too expensive
      T(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(expr("percentile_approx(l_quantity, 0.5, 1000)").as("p50_approx"),
          expr("percentile_approx(l_quantity, 0.9, 1000)").as("p90_approx"))
        .orderBy("l_returnflag")),

    "q22_approx_distinct" -> ((s, dir) =>
      T(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
          cnt.as("n"))
        .orderBy("l_returnflag")),

    "q30_distinct_kmv" -> ((s, dir) =>
      // q22's portable twin: KMV distinct estimate off the mergeable
      // bottom-256 md5 sketch — deterministic, so unlike HLL the
      // ESTIMATE itself hash-matches the oracle
      T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(functions.KmvAgg.sketch(
          md5(col("l_partkey").cast("string")), 256).as("_sk"))
        .select(col("l_returnflag"),
          size(col("_sk")).cast("long").as("n_sketch"),
          functions.KmvAgg.distinctEst(col("_sk"), 256).as("distinct_est"))
        .orderBy("l_returnflag")),

    "t40_code_switch" -> ((s, dir) =>
      // per-doc language consistency: sentence-level langId labels
      // collapsed to a (doc, lang) histogram — mixed-language docs
      // the doc-level t01 label hides by construction
      TextStats.codeSwitch(T(s, dir, "documents"), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    "t01_lang_id" -> ((s, dir) =>
      T(s, dir, "documents")
        .select(col("doc_id"), TextFunctions.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id")),

    "t02_quality" -> ((s, dir) =>
      T(s, dir, "documents")
        .select(col("doc_id"), TextFunctions.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")),

    "t03_tokens" -> ((s, dir) =>
      T(s, dir, "documents")
        .select(col("doc_id"),
          TextFunctions.tokenCountWs(col("text")).as("n_ws"),
          TextFunctions.tokenCountBpeish(col("text")).as("n_bpe"))
        .orderBy("doc_id")),

    "t07_redact" -> ((s, dir) =>
      T(s, dir, "documents")
        .select(col("doc_id"),
          TextFunctions.redact(col("text")).as("redacted"))
        .orderBy("doc_id")),

    "t06_heavy_hitters" -> ((s, dir) =>
      // k=16 > 5 distinct event types, so Misra-Gries counts are exact
      // here and the oracle can hash-check the custom aggregate; at
      // real cardinalities the same aggregate answers approximately in
      // k-bounded memory
      T(s, dir, "events")
        .agg(graft.functions.HeavyHittersAgg.top(col("event_type"), 16).as("hh"))
        .select(explode(col("hh")).as("h"))
        .select(col("h.item").as("item"), col("h.cnt").as("cnt"))
        .orderBy(col("cnt").desc, col("item"))),

    "t05_lang_eval" -> ((s, dir) =>
      T(s, dir, "documents")
        .select(col("lang"), TextFunctions.langId(col("text")).as("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(cnt.as("n"))
        .orderBy("lang", "lang_pred")),

    "t08_repetition" -> ((s, dir) =>
      TextStats.repetition(T(s, dir, "documents"), "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_toks"),
          col("top_tok_frac"), col("top_bigram_frac"))
        .orderBy("doc_id")),

    "r11_hash_sample" -> ((s, dir) =>
      // DETERMINISTIC sampling for data mixing: keep rows whose md5
      // bucket falls under the rate (26/256 ~ 10.2%) — reproducible
      // across runs/engines, unlike randfilter (r04), and exactly
      // oracle-checkable
      T(s, dir, "events")
        .filter(substring(md5(col("event_id").cast("string")), 1, 2) < "1a")
        .select(col("event_id"), col("event_type").as("etype"), col("value"))
        .orderBy("event_id")),

    "r12_sessionize" -> ((s, dir) => {
      // batch twin of streaming/Sessionize: split each user's events
      // into sessions on >30min gaps — lag to mark breaks, running sum
      // to number sessions, one shuffle on user_id for all three steps
      val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val sess = T(s, dir, "events")
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("value"))
        .withColumn("_brk",
          when(col("ts_us") - lag(col("ts_us"), 1).over(byUser) > 1800000000L
            || lag(col("ts_us"), 1).over(byUser).isNull, 1).otherwise(0))
        .withColumn("session", sum(col("_brk")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      sess.groupBy("user_id", "session")
        .agg(min(col("ts_us")).as("start_us"), max(col("ts_us")).as("end_us"),
          cnt.as("n_events"), dsum(col("value")).as("sum_value"))
        .orderBy("user_id", "session")
    }),

    "r13_stratified" -> ((s, dir) =>
      // stratified deterministic sampling for data mixing: per-source
      // md5-bucket rates (src0 ~25%, rest ~10%) — reproducible, and a
      // pure narrow filter at any scale
      T(s, dir, "documents")
        .filter(substring(md5(col("doc_id").cast("string")), 1, 2) <
          when(col("source") === "src0", "40").otherwise("1a"))
        .select(col("doc_id"), col("source"))
        .orderBy("doc_id")),

    "r14_rate_alert" -> ((s, dir) =>
      // the reference's monitoring use case as a batch op: hourly
      // tumbling windows, alert where the error share exceeds 25%.
      // One shuffle on window_start; the rate is an IEEE division of
      // the same two longs in both engines, so the filter is exact.
      Windows.aggregate(T(s, dir, "events"), "ts", 3600L, 3600L, Nil,
          Seq(cnt.as("n_events"),
            sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_errors")))
        .filter(col("n_errors").cast("double") / col("n_events").cast("double") > 0.25)
        .select(col("window_start"), col("n_events"), col("n_errors"),
          (col("n_errors").cast("double") / col("n_events").cast("double")).as("error_rate"))
        .orderBy("window_start")),

    "r27_seasonal_baseline" -> ((s, dir) =>
      // seasonal-naive weekly baseline: per (event_type, hour-of-
      // week), the historical mean vs the last full week — Tuesday
      // 9am compares to Tuesday 9ams, not a flat trailing mean that
      // pages every Monday morning; calendar slots counted by exact
      // integer arithmetic so zero-event hours deflate the mean
      Windows.seasonalBaseline(T(s, dir, "events"), "ts", "event_type")
        .withColumnRenamed("key", "event_type")
        .orderBy("event_type", "how")),

    "r28_incidents" -> ((s, dir) =>
      // incidents + MTTR: fire edges pair with their key's next
      // resolve (one lead over the tiny edge frame); open incidents
      // surface as n_open, MTTR averages closed durations only
      Windows.incidents(T(s, dir, "events"), "ts", "event_type")
        .withColumnRenamed("key", "event_type")
        .orderBy("event_type")),

    "r33_spike_attribution" -> ((s, dir) =>
      // "the total rate is anomalous — which segment drives it": the
      // r16 chain on the GLOBAL rate, then per-event-type share lift
      // and two-proportion z between anomalous and normal hours
      Windows.spikeAttribution(T(s, dir, "events"), "ts", "event_type")
        .withColumnRenamed("key", "event_type")
        .orderBy("event_type")),

    "r32_canary_compare" -> ((s, dir) =>
      // before/after deploy comparison: last week vs the 3 weeks
      // before it, per event_type — volume rates, mix shares, and the
      // two-proportion z on the share shift
      Windows.canaryCompare(T(s, dir, "events"), "ts", "event_type",
          beforeHours = 504, afterHours = 168)
        .withColumnRenamed("key", "event_type")
        .orderBy("event_type")),

    "r31_budget_status" -> ((s, dir) =>
      // the SLO review dashboard row above r26: budget consumed this
      // trailing period (time-linear model), trailing-week burn, and
      // projected hours to exhaustion at the recent pace — one
      // hourly-histogram shuffle, conditional aggregates only
      Windows.budgetStatus(T(s, dir, "events"), "ts",
        col("event_type") === "error", slo = 0.995,
        periodHours = 720, recentHours = 168)),

    "r26_burn_rate" -> ((s, dir) =>
      // the SRE multiwindow burn-rate frame: error budget consumption
      // as a multiple of a 99.5% SLO over trailing 1h/6h/24h/72h
      // windows ending at the stream's last hour — one hourly
      // histogram shuffle, windows aggregated over the histogram
      Windows.burnRate(T(s, dir, "events"), "ts",
          col("event_type") === "error", slo = 0.995,
          windowsHours = Seq(1, 6, 24, 72))
        .orderBy("window_hours")),

    "r16_rate_anomaly" -> ((s, dir) =>
      // statistical upgrade of r14: per-event-type hourly counts
      // scored against the trailing-24h mean/stddev; the rolling
      // window runs over the hourly frame, never the event stream
      Windows.rateAnomaly(T(s, dir, "events"), "ts", "event_type")
        .withColumnRenamed("key", "event_type")
        .orderBy("event_type", "hr_start")),

    "r20_ewma_forecast" -> ((s, dir) =>
      // recency-weighted upgrade of r16: trailing EWMA forecast with
      // dyadic (α=1/2) weights — exact integer sums, one IEEE
      // division — and 3× spike/drop flags against the forecast
      Windows.ewmaForecast(T(s, dir, "events"), "ts", "event_type")
        .withColumnRenamed("key", "event_type")
        .orderBy("event_type", "hr_start")),

    "r24_rare_transitions" -> ((s, dir) =>
      // rare template-transition mining: per-user event lines mask to
      // r18 skeletons, adjacent skeletons form transitions, and a
      // transition flags when absolutely infrequent (n <= 2) or an
      // out-of-character exit (< 5% of its source's outgoing edges) —
      // the "service never used to go login -> crash" detector
      operators.LogMining.rareTransitions(
          T(s, dir, "events").select(col("user_id"), col("ts"), col("event_id"),
            concat(
              lit("id="), col("event_id"),
              lit(" ts="), date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"),
              lit(" user="), col("user_id"),
              lit(" type="), col("event_type"),
              lit(" value="), col("value").cast("string")).as("line")),
          "user_id", "ts", "event_id", "line")
        .orderBy("src_template", "dst_template")),

    "r23_alert_edges" -> ((s, dir) =>
      // alert-flap suppression (the PagerDuty/Alertmanager rule: page
      // on STATE CHANGES, not on every anomalous hour): r16's hourly
      // anomaly verdicts collapse to rising/falling edges via one lag
      // over the per-key hourly frame — a 6-hour incident pages once,
      // not six times. The scored-hours-only caveat is inherited:
      // unscored cold-start hours are absent, so the first SCORED
      // anomalous hour is a rising edge by definition
      Windows.rateAnomaly(T(s, dir, "events"), "ts", "event_type")
        .withColumn("_prev", lag(col("is_anomaly"), 1).over(
          Window.partitionBy("key").orderBy("hr_start")))
        .filter(col("is_anomaly") =!= coalesce(col("_prev"), lit(false)))
        .select(col("key").as("event_type"), col("hr_start"),
          col("n_events"), col("z_score"),
          when(col("is_anomaly"), lit("fire")).otherwise(lit("resolve")).as("edge"))
        .orderBy("event_type", "hr_start")),

    "r30_cusum" -> ((s, dir) =>
      // Page's CUSUM chart per event type: 24 warmup hours set the
      // baseline, later hours accumulate deviations above a 1.25×
      // allowance, signal at 5× baseline — the sustained-drift
      // detector; exact integer micros, closed-form (cumsum +
      // running-min) windows over the hourly frame only
      Windows.cusumChangepoint(T(s, dir, "events"), "ts", "event_type")
        .withColumnRenamed("key", "event_type")
        .orderBy("event_type", "hr_start")),

    "r29_alert_storms" -> ((s, dir) =>
      // incident grouping above r23: maximal runs of fire edges (any
      // key) at most 2h apart collapse to one storm row — the
      // shared-root-cause view (n_keys >> 1 in a tight span); the
      // global-order window runs over the tiny edge frame only
      Windows.alertStorms(T(s, dir, "events"), "ts", "event_type",
          gapHours = 2)
        .orderBy("storm_start")),

    "r25_template_drift" -> ((s, dir) =>
      // what changed between then and now: per-template counts in
      // the earlier vs later half of the time range, add-1 log rate
      // ratio, new/vanished/shifted status — one masking pass into a
      // template-keyed conditional agg, top-k movers via TakeOrdered
      operators.LogMining.templateDrift(
        T(s, dir, "events").select(col("ts"), concat(
          lit("user="), col("user_id"),
          lit(" type="), col("event_type"),
          lit(" value="), col("value").cast("string")).as("line")),
        "ts", "line", k = 20)
        .orderBy(abs(col("log_ratio")).desc, col("template"))),

    "r22_template_anomaly" -> ((s, dir) =>
      // which MESSAGE TYPE misbehaves: r18's masking keys the raw
      // line stream (no schema knowledge needed), r16's trailing
      // z-score scores each template's hourly rate — the
      // burst/new-template detector a monitoring pipeline deploys,
      // composed from the two existing operators with zero new
      // arithmetic; the corpus collapses to (template, hour) counts
      // before any window
      Windows.rateAnomaly(
          T(s, dir, "events").select(col("ts"), concat(
            lit("id="), col("event_id"),
            lit(" ts="), date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"),
            lit(" user="), col("user_id"),
            lit(" type="), col("event_type"),
            lit(" value="), col("value").cast("string")).as("value"))
            .withColumn("_tmpl", operators.LogMining.template(col("value"))),
          "ts", "_tmpl")
        .withColumnRenamed("key", "template")
        .orderBy("template", "hr_start")),

    "r17_parse_rate" -> ((s, dir) => {
      // monitor the reference parser's silent failure mode: lines the
      // regex rejects just vanish (lparser.go drops non-matching
      // lines). Every 13th event line is corrupted, the REAL parse
      // path (RegexGroups) runs over the mix, and per-hour parse
      // rates alert below 95%. The oracle knows the drop set
      // analytically, so this also gates that the parser never drops
      // a well-formed line.
      val lines = T(s, dir, "events").select(concat(
        when(col("event_id") % 13 === 0, lit("corrupt ")).otherwise(lit("id=")),
        col("event_id"),
        lit(" ts="), date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"),
        lit(" user="), col("user_id"),
        lit(" type="), col("event_type"),
        lit(" value="), col("value").cast("string")).as("value"))
      // ONE corpus scan: the hour of EVERY line comes from the still-
      // intact ts= field (the denominator a real monitor needs), and
      // the numerator is the parse path's own survival predicate
      // (LogSource.parses = the same compiled RegexGroups pass that
      // parse() drops on) evaluated in the same projection — the old
      // two-sided join read and regexed every line twice
      lines
        .select(to_timestamp(
            regexp_extract(col("value"), " ts=([0-9: -]+) user", 1)).as("_ts_raw"),
          LogSource.parses(col("value"), EventPattern).as("_ok"))
        .groupBy(expr("unix_timestamp(_ts_raw) div 3600").as("_hr"))
        .agg(cnt.as("n_lines"),
          sum(when(col("_ok"), 1L).otherwise(0L)).as("n_parsed"))
        .select((col("_hr") * 3600L).as("hr_start"),
          col("n_lines"), col("n_parsed"),
          (col("n_parsed").cast("double")
            / col("n_lines").cast("double")).as("parse_rate"))
        .withColumn("alert", col("parse_rate") < 0.95)
        .orderBy("hr_start")
    }),

    "r18_log_templates" -> ((s, dir) =>
      // Drain-style template mining over a two-pattern line corpus:
      // variable fields (numbers incl. engine-specific float digits)
      // mask to placeholders, constants survive — the population of
      // distinct things the stream says, with frequencies
      operators.LogMining.templates(
          eventLines(s, dir).unionByName(customerLines(s, dir)), "value")
        .select(col("template"), col("n"))
        .orderBy("template")),

    "r19_template_latency" -> ((s, dir) =>
      // per-template metric percentiles: the r18 skeletons with exact
      // p50/p95/max of the value field extracted back off each line —
      // "which event type is slow" over a pattern-unknown stream
      operators.LogMining.templateQuantiles(
          eventLines(s, dir).withColumn("_lat",
            regexp_extract(col("value"), " value=(.+)$", 1).cast("double")),
          "value", "_lat")
        .orderBy("template")),

    "q31_retention" -> ((s, dir) => {
      // weekly cohort retention: users grouped by first-seen week,
      // n distinct users active at each week offset — the classic
      // product-analytics matrix. Three bounded shuffles: the
      // (user, week) distinct, the per-user min, the tiny
      // (cohort, offset) histogram. Week = floor-div of epoch µs
      // (ts >= epoch here; Spark div truncates toward zero, SQL //
      // floors — equal on non-negatives, the packGreedy rule)
      val wk = expr("unix_micros(ts) div 604800000000").as("wk")
      val uw = T(s, dir, "events").select(col("user_id"), wk).distinct()
      val fw = uw.groupBy("user_id").agg(min(col("wk")).as("cohort"))
      uw.join(fw, "user_id")
        .groupBy(col("cohort").as("cohort_week"),
          (col("wk") - col("cohort")).as("week_offset"))
        .agg(cnt.as("n_users"))
        .orderBy("cohort_week", "week_offset")
    }),

    "r21_session_paths" -> ((s, dir) =>
      // top-20 session paths: r12's gap-split sessions, each session's
      // first-8 event types joined into one "a>b>c" string, counted —
      // the discovery complement of q29's fixed funnel. One user-key
      // shuffle end-to-end until the bounded path histogram
      operators.LogMining.sessionPaths(
          T(s, dir, "events")
            .select(col("event_id"), col("user_id"),
              unix_micros(col("ts")).as("ts_us"), col("event_type")),
          "user_id", "ts_us", "event_id", "event_type",
          gapUs = 1800000000L, maxLen = 8, k = 20)
        .orderBy(col("n_sessions").desc, col("path"))),

    "q36_listagg" -> ((s, dir) =>
      // grouped string aggregation (LISTAGG/string_agg — the report
      // column every BI export wants): nations per region, sorted so
      // the aggregate is deterministic under any partitioning
      T(s, dir, "nation")
        .join(T(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(cnt.as("n_nations"),
          array_join(sort_array(collect_list(col("n_name"))), ",")
            .as("nations"))
        .orderBy("r_name")),

    "q35_pareto" -> ((s, dir) => {
      // revenue concentration (the 80/20 audit): per-customer revenue
      // share and cumulative share in descending order; the global
      // window runs over the already-aggregated DIMENSION-sized frame
      // (|customers| rows), never the fact table — at extreme
      // dimension cardinality the packSequences distributed prefix
      // sum is the stated fallback
      import org.apache.spark.sql.expressions.Window
      val rev = T(s, dir, "orders").groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("_rev"))
      val tot = rev.agg(sum(col("_rev")).as("_tot"))
      val w = Window.orderBy(col("_rev").desc, col("o_custkey"))
      rev.crossJoin(broadcast(tot))
        .withColumn("rank", row_number().over(w).cast("long"))
        .withColumn("revenue", col("_rev").cast("double"))
        .withColumn("share",
          round(col("_rev").cast("double") / col("_tot").cast("double"), 6))
        .withColumn("cum_share", round(
          sum(col("_rev")).over(w.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)).cast("double") / col("_tot").cast("double"), 6))
        .select(col("o_custkey"), col("rank"), col("revenue"),
          col("share"), col("cum_share"))
        .orderBy("rank")
    }),

    "q34_scd2" -> ((s, dir) => {
      // SCD Type-2 dimension build from a change stream — the
      // warehouse versioning pattern: per user, consecutive duplicate
      // states collapse, each surviving change opens a versioned row
      // [effective_from, effective_to), the last open-ended and
      // flagged current; one user_id shuffle feeds both windows
      operators.Windows.scd2(
          T(s, dir, "events")
            .select(col("user_id"), col("event_type"),
              unix_micros(col("ts")).as("_us"), col("event_id")),
          "user_id", "event_type", "_us", "event_id")
        .withColumnRenamed("key", "user_id")
        .orderBy("user_id", "version")
    }),

    "q29_funnel" -> ((s, dir) => {
      // ordered-step conversion funnel: first view, then first click
      // within 24h of it, then first purchase within 24h of that. Each
      // step is one user_id shuffle (agg) + a join against the prior
      // step's survivors — a set that only shrinks, so at corpus scale
      // later steps broadcast.
      val ev = T(s, dir, "events")
      def first(df: DataFrame): DataFrame =
        df.groupBy("user_id").agg(min(col("ts")).as("t"))
      def step(prev: DataFrame, etype: String): DataFrame =
        first(ev.filter(col("event_type") === etype)
          .join(prev.select(col("user_id"), col("t").as("t0")), "user_id")
          .filter(col("ts") > col("t0") &&
            col("ts") <= col("t0") + expr("INTERVAL 24 HOURS")))
      val v = first(ev.filter(col("event_type") === "view"))
      val c = step(v, "click")
      val p = step(c, "purchase")
      v.agg(cnt.as("users")).select(lit("1_view").as("step"), col("users"))
        .unionAll(c.agg(cnt.as("users")).select(lit("2_click").as("step"), col("users")))
        .unionAll(p.agg(cnt.as("users")).select(lit("3_purchase").as("step"), col("users")))
        .orderBy("step")
    }),

    "r15_multiline" -> ((s, dir) => {
      // multiline log-record assembly (stack-trace style): header lines
      // start a record, continuation lines attach to the preceding
      // header. The synthetic "file" is each user's event stream; error
      // events carry one continuation line. Record numbering is a
      // running count of headers per user — one user_id shuffle that
      // the (user_id, rec_no) aggregate reuses (subset partitioning
      // satisfies the clustered distribution), so assembly scales as a
      // single-shuffle op however long the traces get.
      val ev = T(s, dir, "events")
      val headers = ev.select(col("user_id"),
        (col("event_id") * 2).as("line_no"),
        concat(lit("id="), col("event_id"), lit(" type="), col("event_type")).as("line"),
        lit(1L).as("is_header"))
      val conts = ev.filter(col("event_type") === "error").select(col("user_id"),
        (col("event_id") * 2 + 1).as("line_no"),
        concat(lit("  at trace#"), col("event_id")).as("line"),
        lit(0L).as("is_header"))
      headers.unionAll(conts)
        .withColumn("rec_no", sum(col("is_header"))
          .over(Window.partitionBy("user_id").orderBy("line_no")))
        .groupBy(col("user_id"), col("rec_no"))
        .agg(cnt.as("n_lines"),
          concat_ws(" | ", transform(
            array_sort(collect_list(struct(col("line_no"), col("line")))),
            x => x.getField("line"))).as("record"))
        .orderBy("user_id", "rec_no")
    }),

    "t09_top_ngrams" -> ((s, dir) =>
      // corpus-level vocabulary report: global top-20 trigrams; partial
      // agg collapses repeats map-side, TakeOrdered keeps the top k —
      // no global sort of the full gram table
      Dedup.shinglesRaw(T(s, dir, "documents"), "doc_id", "text", 3)
        .groupBy("shingle").agg(cnt.as("n"))
        .orderBy(col("n").desc, col("shingle"))
        .limit(20)),

    "t04_fingerprint" -> ((s, dir) => {
      RollingHash.register(s)
      T(s, dir, "documents")
        .groupBy(expr("rolling_hash(text)").as("fp"))
        .agg(min(col("doc_id")).as("keep_id"), cnt.as("n"))
        .select("keep_id", "n")
        .orderBy("keep_id")
    }),

    "m01_multimodal" -> ((s, dir) => {
      val blobs = Multimodal.withBlob(T(s, dir, "documents"), "text")
      Multimodal.decodeFeatures(blobs, "doc_id", "blob")
        .select(col("id").as("doc_id"), col("n_bytes"), col("head_byte"),
          round(col("byte_mean"), 6).as("byte_mean"),
          size(col("feature")).cast("long").as("feat_dim"))
        .orderBy("doc_id")
    }),

    "m02_frames" -> ((s, dir) => {
      val blobs = Multimodal.withBlob(T(s, dir, "documents"), "text")
      Multimodal.sampleFrames(blobs, "doc_id", "blob", n = 4)
        .select(col("id").as("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
          col("frame_bytes"))
        .orderBy("doc_id", "frame_idx")
    }),

    "m09_keyframes" -> ((s, dir) => {
      // keyframe per scene: m08's boundaries split frames into
      // scenes (running boundary count), keyframe = max-energy frame
      // per scene, ties to the earliest — all windows over the tiny
      // frame stream, exact BIGINT energy
      val blobs = Multimodal.withBlob(T(s, dir, "documents"), "text")
      Multimodal.keyframes(blobs, "doc_id", "blob", n = 4,
          tau2 = 150000L)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "scene")
    }),

    "m08_scene_changes" -> ((s, dir) => {
      // shot-boundary detection over the sampled frame stream:
      // adjacent frame features differ by exact-integer squared L2,
      // boundaries above tau2 — one id-keyed lag window
      val blobs = Multimodal.withBlob(T(s, dir, "documents"), "text")
      Multimodal.sceneChanges(blobs, "doc_id", "blob", n = 4,
          tau2 = 150000L)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "frame_idx")
    }),

    "m07_audio_overlap" -> ((s, dir) => {
      // audio segment dedup: files pairing on shared 100-byte chunk
      // contents at any block-aligned offset — the "same jingle in
      // two recordings" screen; md5 keys keep audio off the shuffle
      val blobs = Multimodal.withBlob(
        T(s, dir, "documents").filter(col("doc_id") < 500), "text")
      Multimodal.audioChunkOverlap(blobs, "doc_id", "blob", chunkBytes = 100)
        .orderBy("id1", "id2")
    }),

    "m11_silence_segments" -> ((s, dir) => {
      // VAD-shaped segmentation: runs of chunks above 3/4 of the
      // file's mean byte-energy become active segments — exact
      // integer cross-multiplication, islands cumsum at chunk grain
      val blobs = Multimodal.withBlob(T(s, dir, "documents"), "text")
      Multimodal.silenceSegments(blobs, "doc_id", "blob", chunkBytes = 100)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "seg_idx")
    }),

    "m04_audio_chunks" -> ((s, dir) => {
      val blobs = Multimodal.withBlob(T(s, dir, "documents"), "text")
      Multimodal.chunkAudio(blobs, "doc_id", "blob", chunkBytes = 100)
        .select(col("id").as("doc_id"), col("chunk_idx"), col("offset"),
          col("n_bytes"), round(col("byte_mean"), 6).as("byte_mean"))
        .orderBy("doc_id", "chunk_idx")
    }),

    "m03_resize" -> ((s, dir) => {
      val blobs = Multimodal.withBlob(T(s, dir, "documents"), "text")
      Multimodal.resizeStub(blobs, "doc_id", "blob", w = 32, h = 32)
        .select(col("id").as("doc_id"), col("width"), col("height"),
          col("in_bytes"), col("out_bytes"))
        .orderBy("doc_id")
    }),

    "m06_alignment" -> ((s, dir) => {
      // CLIP-score-style text-image alignment filtering plumbing:
      // stub image tower (partition-batched byte-fold features) vs
      // the doc's embedding through the portable s08 projection head;
      // vec_id doubles as doc_id in the testdata pairing
      val blobs = Multimodal.withBlob(
        T(s, dir, "documents").filter(col("doc_id") < 500), "text")
      Multimodal.textImageAlignment(blobs, "doc_id", "blob",
          T(s, dir, "embeddings"), "vec_id", "embedding",
          tau = 0.0, embDims = 64)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    "m10_phash_resolve" -> ((s, dir) => {
      // image near-dup RESOLUTION: m05's pigeonhole pHash pairs feed
      // d06's component machinery; each cluster keeps its min-id
      // member as the canonical image (no quality column on blobs)
      val docs = T(s, dir, "documents").filter(col("doc_id") < 500)
      val blobs = Multimodal.withBlob(docs, "text")
      val pairs = Dedup.chunkedHammingPairs(
          Multimodal.imagePhash(blobs, "doc_id", "blob"))
        .select(col("id1"), col("id2"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("component"))
      Dedup.components(docs.select(col("doc_id")), "doc_id", pairs)
        .withColumn("n_members", count(lit(1)).over(w))
        .withColumn("is_canonical", col("doc_id") === col("component"))
        .orderBy("doc_id")
    }),

    "m05_phash_pairs" -> ((s, dir) => {
      // image near-dup detection: 64-bit perceptual hash from the
      // partition-batched decode stub, pairs at hamming <= 3 via the
      // d12 pigeonhole machinery; the oracle brute-forces ALL pairs,
      // so the hash-match also proves banding completeness on images
      val blobs = Multimodal.withBlob(
        T(s, dir, "documents").filter(col("doc_id") < 500), "text")
      Dedup.chunkedHammingPairs(
          Multimodal.imagePhash(blobs, "doc_id", "blob"))
        .orderBy("id1", "id2")
    }),

    "p23_length_batches" -> ((s, dir) =>
      // pad-efficiency dynamic batching: docs bucket to the smallest
      // power-of-two cap holding them, md5-shuffled within the
      // bucket, runs of 16 form batches; per-doc padding reported
      Training.lengthBatches(
          T(s, dir, "documents")
            .select(col("doc_id"), TextFunctions.tokenCountWs(col("text")).as("n_toks")),
          "doc_id", "n_toks",
          caps = Seq(64L, 128L, 256L, 512L, 1024L, 2048L), batchSize = 16)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    "p01_pack" -> ((s, dir) =>
      // sequence packing for training: docs in doc_id order become one
      // virtual token stream cut into 2048-token sequences; each doc
      // reports the sequence span it lands in (distributed prefix sum,
      // no global single-partition window — see Training.packSequences)
      Training.packSequences(
        T(s, dir, "documents")
          .select(col("doc_id"), TextFunctions.tokenCountWs(col("text")).as("n_toks")),
        "doc_id", "n_toks", seqLen = 2048L)
        .orderBy("doc_id")),

    "p02_mixture" -> ((s, dir) =>
      // mixture sampling: resample the corpus to ~50% with srcs 0-4
      // upweighted (8% each) and the other 15 sharing the rest — the
      // domain-mixing step of a training-data pipeline, md5-keyed so
      // the draw is reproducible and oracle-exact
      Training.mixtureSample(
        T(s, dir, "documents"), "source", "doc_id",
        when(col("source").isin("src0", "src1", "src2", "src3", "src4"), lit(0.08))
          .otherwise(lit(0.6) / 15.0),
        targetFrac = 0.5)
        .groupBy("source")
        .agg(cnt.as("n_kept"))
        .orderBy("source")),

    "p03_shard" -> ((s, dir) =>
      // shard assignment + deterministic pseudo-random training order:
      // md5 digit 1 picks the shard, the remaining digits order within
      // it — a reproducible global shuffle
      Training.shardAssign(T(s, dir, "documents"), "doc_id")
        .select(col("doc_id"), col("shard"), col("pos"))
        .orderBy("doc_id")),

    "t11_normalize" -> ((s, dir) => {
      // text normalization pre-tokenizer: control chars to spaces, runs
      // of whitespace collapsed, ends trimmed. Pure codegen'd regex
      // map — a narrow pass at any scale.
      val norm = trim(regexp_replace(
        regexp_replace(col("text"), "[\\x00-\\x1F\\x7F]", " "), "\\s+", " "))
      T(s, dir, "documents")
        .select(col("doc_id"),
          length(col("text")).cast("long").as("n_raw"),
          length(norm).cast("long").as("n_norm"),
          (norm =!= col("text")).cast("long").as("changed"),
          norm.as("norm_text"))
        .orderBy("doc_id")
    }),

    "t12_boilerplate" -> ((s, dir) => {
      // C4-style repeated-line scrub. The corpus has single-line docs,
      // so the fixture FRAMES each one the way a crawl page arrives:
      // a banner every page shares, the body, a footer shared by half
      // the corpus, and a per-doc line. The operator must strip
      // exactly the first two classes (>= minDocs docs) and keep the
      // body and unique footer, reassembled in order.
      val framed = T(s, dir, "documents").select(col("doc_id"), concat(
        lit("subscribe to our newsletter\n"),
        col("text"), lit("\n"),
        when(col("doc_id") % 2 === 0, lit("all rights reserved"))
          .otherwise(lit("thanks for reading")),
        lit("\nref "), col("doc_id")).as("text"))
      TextStats.stripRepeatedLines(framed, "doc_id", "text", minDocs = 100L)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    "t15_collapse_runs" -> ((s, dir) => {
      // intra-doc consecutive-duplicate-line collapse. The corpus has
      // single-line docs, so the fixture builds the failure mode: a
      // "loading..." flood (1-2 lines), the body stuttered twice, a
      // closing line — the operator must keep one of each run, in order
      val framed = T(s, dir, "documents").select(col("doc_id"), concat(
        when(col("doc_id") % 2 === 0, lit("loading...\n")).otherwise(lit("")),
        lit("loading...\n"),
        col("text"), lit("\n"), col("text"),
        lit("\ndone")).as("text"))
      TextStats.collapseRepeatRuns(framed, "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    "t27_c4_line_filter" -> ((s, dir) => {
      // C4 line-level cleaning (Raffel et al. 2020 §2.2). The corpus
      // has single-line docs, so the fixture frames each one as a
      // crawled page exercising every rule: a nav line (no terminal
      // punctuation), two well-formed sentences, the body (terminated;
      // short bodies fail the 3-word floor and can sink the page below
      // minKeptLines), a javascript plea, a policy line, and — on a
      // sparse modulus — the two page-level killers (lorem ipsum /
      // curly brace).
      val framed = T(s, dir, "documents").select(col("doc_id"), concat(
        lit("home | about | contact\n"),
        lit("this page is archived for reference.\n"),
        col("text"), lit(".\n"),
        lit("comments are closed on this article.\n"),
        lit("please enable javascript to continue.\n"),
        lit("read our privacy policy."),
        when(col("doc_id") % 97 === 0, lit("\nlorem ipsum dolor sit amet."))
          .otherwise(lit("")),
        when(col("doc_id") % 89 === 0, lit("\nfunction() { return; }"))
          .otherwise(lit(""))).as("text"))
      TextStats.c4LineFilter(framed, "doc_id", "text", minKeptLines = 3)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    "t28_readability" -> ((s, dir) => {
      // Flesch-Kincaid grade level; the fixture frames each one-line
      // doc with an opening and closing sentence so the words-per-
      // sentence term varies with body length
      val framed = T(s, dir, "documents").select(col("doc_id"), concat(
        lit("a short opening line. "), col("text"),
        lit(". the closing line ends here.")).as("text"))
      TextStats.readability(framed, "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    "t29_corpus_card" -> ((s, dir) => {
      // the corpus report card: docs, token mass, empty share, mean
      // quality per (source, lang) with ROLLUP subtotals — the
      // one-page drift view a curation run gates between stages. One
      // narrow pass + one rollup aggregate; per-doc metrics are the
      // t02/t03 expressions verbatim so the card cannot drift from
      // the operators it summarizes
      val d = T(s, dir, "documents")
        .withColumn("_nt",
          graft.functions.TextFunctions.tokenCountWs(col("text")).cast("long"))
        .withColumn("_q", graft.functions.TextFunctions.qualityScore(col("text")))
      // subtotal rows are labeled via grouping(), NOT a bare coalesce:
      // a natural NULL source/lang group would otherwise collide with
      // its own subtotal's 'ALL' and leave two identical keys in a
      // nondeterministic relative order
      d.rollup("source", "lang")
        .agg(cnt.as("n_docs"),
          sum(col("_nt")).as("n_tokens"),
          sum(when(col("_nt") === 0L, 1L).otherwise(0L)).as("n_empty"),
          round(sum(col("_q").cast("decimal(18,4)")).cast("double")
            / count(lit(1)).cast("double"), 6).as("mean_quality"),
          grouping(col("source")).as("_gs"), grouping(col("lang")).as("_gl"))
        .select(
          when(col("_gs") === 1, lit("ALL"))
            .otherwise(coalesce(col("source"), lit("(null)"))).as("source"),
          when(col("_gl") === 1, lit("ALL"))
            .otherwise(coalesce(col("lang"), lit("(null)"))).as("lang"),
          col("n_docs"), col("n_tokens"), col("n_empty"), col("mean_quality"))
        .orderBy("source", "lang")
    }),

    "t13_unigram_logprob" -> ((s, dir) =>
      // unigram-LM quality score (KenLM-perplexity stand-in): mean
      // log-prob of each doc's tokens under the corpus's own unigram
      // distribution; per-token log-probs rounded then decimal-summed
      // so the mean is partitioning-independent and oracle-exact
      TextStats.unigramLogProb(T(s, dir, "documents"), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    "t16_bigram_logprob" -> ((s, dir) =>
      // bigram-LM quality score: mean CONDITIONAL log-prob of each
      // doc's adjacent token pairs — one Markov order up from t13,
      // catches fluent-token word salad unigram scores miss
      TextStats.bigramLogProb(T(s, dir, "documents"), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    "t41_kneser_ney" -> ((s, dir) =>
      // interpolated Kneser-Ney bigram score (the KenLM smoothing):
      // absolute discount + continuation-diversity backoff mass —
      // "francisco" is frequent but only ever follows "san", so it
      // earns almost no backoff mass; the honest fluency score
      TextStats.kneserNey(T(s, dir, "documents"), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    "t33_heaps" -> ((s, dir) =>
      // Heaps'-law vocabulary-growth fit over 8 doc-id-ordered
      // corpus prefixes — the t24 Zipf fit's companion corpus law
      TextStats.heapsFit(T(s, dir, "documents"), "doc_id", "text",
        points = 8)),

    "t34_bpe_train" -> ((s, dir) => {
      // BPE tokenizer training (Sennrich 2016): 8 merge rounds over
      // the corpus VOCABULARY (one corpus agg collapses to (word,
      // count); merges never touch the corpus again); ties to the
      // smallest pair make the table engine-deterministic. Trained
      // ONCE per (session, dir) and shared with t35/t37 via bpeTable.
      import s.implicits._
      bpeTable(s, dir, 8).toDF("rank", "pair", "freq").orderBy("rank")
    }),

    "t37_bpe_fertility" -> ((s, dir) => {
      // tokenizer fertility audit per language: subword tokens per
      // word and chars per token under the corpus-trained BPE table
      // — the multilingual context-budget inequity view
      val merges = bpeTable(s, dir, 8).map(_._2)
      TextStats.bpeFertility(T(s, dir, "documents"), "lang", "text", merges)
        .orderBy("lang")
    }),

    "t35_bpe_tokens" -> ((s, dir) => {
      // the trained tokenizer applied back to the corpus: per-doc BPE
      // token counts — the honest upgrade over whitespace counts for
      // budget math. The 8-row merge table comes from the shared
      // memoized training run; application is a row-local replace
      // chain.
      val merges = bpeTable(s, dir, 8).map(_._2)
      TextStats.bpeTokenCounts(T(s, dir, "documents"), "doc_id", "text", merges)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    "t32_pmi" -> ((s, dir) =>
      // PMI collocation mining: top-30 adjacent token pairs by
      // pointwise mutual information with the >= 20 count floor
      // (PMI's hapax bias remedy)
      TextStats.pmiTopK(T(s, dir, "documents"), "text", minCount = 20L, k = 30)
        .orderBy(col("pmi").desc, col("w1"), col("w2"))),

    "t31_novelty" -> ((s, dir) =>
      // n-gram novelty: the fraction of each doc's distinct 3-grams
      // appearing nowhere else in the corpus — the per-document
      // memorization/templating score over the d16 gram machinery
      TextStats.ngramNovelty(T(s, dir, "documents"), "doc_id", "text", k = 3)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    "t30_stupid_backoff" -> ((s, dir) =>
      // Stupid Backoff cross-slice fluency score: the en-language
      // slice trains the bigram model (the DSIR-style target), every
      // doc scores under it — out-of-slice docs fall to the α=0.4
      // backed-off add-1 unigram floor
      TextStats.stupidBackoff(T(s, dir, "documents"), "doc_id", "text",
          lmPred = col("lang") === "en")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    "t39_sentence_stats" -> ((s, dir) =>
      // sentence-profile quality signal (the Gopher-family rung at
      // SENTENCE grain): sentences split on terminal punctuation
      // runs, per doc the count, mean and max words per sentence —
      // wall-of-text and fragment-spam docs sit at the two tails
      T(s, dir, "documents")
        .select(col("doc_id"),
          explode(split(col("text"), "[.!?]+")).as("_sent"))
        .select(col("doc_id"), trim(col("_sent")).as("_sent"))
        .filter(length(col("_sent")) > 0)
        .select(col("doc_id"),
          size(split(col("_sent"), "\\s+")).cast("long").as("_w"))
        .groupBy(col("doc_id"))
        .agg(cnt.as("n_sentences"),
          round(sum(col("_w")).cast("double") / count(lit(1)).cast("double"), 6)
            .as("mean_words"),
          max(col("_w")).as("max_words"))
        .orderBy("doc_id")),

    "t38_tfidf_terms" -> ((s, dir) =>
      // per-doc TF-IDF top-3 keywords: the "what is this doc about"
      // signal for topic tagging and mixture labeling; stopwords die
      // by idf, no list needed
      operators.Retrieval.tfidfTerms(T(s, dir, "documents"),
          "doc_id", "text", k = 3)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "rank")),

    "t17_bm25" -> ((s, dir) => {
      // BM25 top-10 per query over the corpus: the sparse-retrieval
      // side of data mining (rank corpus docs against seed queries).
      // Token stream filtered to the broadcast query vocabulary before
      // anything shuffles; per-term contributions rounded then
      // decimal-summed; rank window runs as WindowGroupLimit.
      import s.implicits._
      val qt = bm25Queries.toDF("qid", "term")
      operators.Retrieval.bm25TopK(
          T(s, dir, "documents"), "doc_id", "text", qt, "qid", "term", k = 10)
        .withColumnRenamed("id", "doc_id")
        .orderBy("qid", "rank")
    }),

    "t42_kn_buckets" -> ((s, dir) =>
      // CCNet terciles under the Kneser-Ney score — KN IS KenLM's
      // smoothing, so this is the closest self-contained stand-in
      // for the published composition; tercile cut shared with
      // t18/t36 (the bucketers cannot drift)
      TextStats.knBuckets(T(s, dir, "documents"), "doc_id", "text", "lang")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    "t18_ppl_buckets" -> ((s, dir) =>
      // CCNet head/middle/tail terciles of the per-language unigram-LM
      // score distribution — cut on the (lang, score) histogram, the
      // corpus never windows
      TextStats.pplBuckets(T(s, dir, "documents"), "doc_id", "text", "lang")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    "t36_backoff_buckets" -> ((s, dir) =>
      // the DEPLOYABLE CCNet composition: the en slice trains the
      // backoff LM (t30), every doc scores under it, and each
      // language buckets by tercile on ITS OWN score distribution —
      // out-of-domain text falls to the unigram floor and the tail
      TextStats.backoffPplBuckets(T(s, dir, "documents"), "doc_id", "text",
          "lang", lmPred = col("lang") === "en")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    "t14_token_entropy" -> ((s, dir) =>
      // within-doc token entropy: the low-entropy detector that
      // catches even-cycling template text top-fraction metrics miss
      TextStats.tokenEntropy(T(s, dir, "documents"), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    "d13_url_canon" -> ((s, dir) => {
      // URL canonicalization + dedup, the crawl-side twin of d01: two
      // surface forms per target (scheme/host case, default port, www,
      // trailing slash) plus tracking params and fragments, collapsed
      // to one canonical URL; keep-first, count variants
      val urls = T(s, dir, "documents").select(col("doc_id"), concat(
        when(col("doc_id") % 3 === 0,
            concat(lit("HTTP://WWW.Example.COM:80/articles/item-"),
              col("doc_id") % 100, lit("/")))
          .otherwise(concat(lit("http://example.com/articles/item-"),
            col("doc_id") % 100)),
        when(col("doc_id") % 2 === 0, lit("?utm_source=feed&ref=home"))
          .otherwise(lit("?ref=home")),
        when(col("doc_id") % 5 === 0, lit("#section-2")).otherwise(lit("")))
        .as("url"))
      urls
        .withColumn("canon_url", TextFunctions.canonicalizeUrl(col("url")))
        .groupBy("canon_url")
        .agg(min(col("doc_id")).as("keep_id"), cnt.as("n_variants"))
        .orderBy("canon_url")
    }),

    "d14_cross_dedup" -> ((s, dir) => {
      // dedupe the NEW crawl against the EXISTING training set: every
      // 10th doc plays the existing corpus; incoming docs near any of
      // them (banded md5 MinHash -> exact-jaccard verify) are flagged.
      // Unlike d02/d11's self-join this is an incoming x existing band
      // join — existing-vs-existing pairs never form.
      val docs = T(s, dir, "documents").filter(col("doc_id") < 500)
      Dedup.crossNearDupPortable(
          docs.filter(col("doc_id") % 10 =!= 0),
          docs.filter(col("doc_id") % 10 === 0),
          "doc_id", "text", shingleN = 3, minJaccard = 0.5)
        .orderBy("doc_id", "matched_id")
    }),

    "d15_para_dedup" -> ((s, dir) => {
      // paragraph-level exact cross-corpus dedup (RefinedWeb/CCNet
      // step): each distinct paragraph survives once, in its
      // (id, pos)-first document. The corpus has single-paragraph
      // docs, so the fixture frames each one the way a crawl page
      // arrives: a site-wide "about us" para (first doc wins it), the
      // body, a half-shared footer para, and a per-doc unique para.
      val framed = T(s, dir, "documents").select(col("doc_id"), concat(
        lit("about us\n\n"), col("text"),
        when(col("doc_id") % 2 === 0, lit("\n\ncontact us at example.com"))
          .otherwise(lit("\n\nfollow us on social media")),
        lit("\n\npara "), col("doc_id")).as("text"))
      Dedup.paraDedup(framed, "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    "d16_dup_substrings" -> ((s, dir) => {
      // exact duplicated-substring spans (Lee et al. 2021). Fixture:
      // every doc opens with a shared 8-token slogan (cross-doc dup
      // span), every 7th doc repeats its own body (intra-doc dup) —
      // the operator reports tokens covered by any k-gram occurring
      // more than once in the corpus.
      val framed = T(s, dir, "documents").select(col("doc_id"), concat(
        lit("subscribe to our newsletter today for free updates "),
        col("text"),
        when(col("doc_id") % 7 === 0, concat(lit(" "), col("text")))
          .otherwise(lit(""))).as("text"))
      Dedup.dupSubstringSpans(framed, "doc_id", "text", k = 4)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    "d17_winnowing" -> ((s, dir) =>
      // winnowing fingerprints (Schleimer et al. 2003, MOSS): min-hash
      // of each w-gram window of k-gram hashes, rightmost min on ties;
      // docs sharing >= 2 fingerprint hashes pair up. Exact variant
      // (no bucket cap) on the oracle slice.
      Dedup.winnowingPairs(
          T(s, dir, "documents").filter(col("doc_id") < 500),
          "doc_id", "text", k = 4, w = 4, minShared = 2)
        .orderBy("id1", "id2")),

    "d19_bloom_decontaminate" -> ((s, dir) => {
      // d08's sweep in its bloom-only 100 TB-prefilter shape: the
      // benchmark shingles fold into one portable 2^20-bit bitmap
      // (128 KB broadcast), the corpus side is a narrow codegen probe
      // with NO shingle join; the oracle rebuilds the identical
      // bitmap in SQL, so even false positives hash-match
      val docs = T(s, dir, "documents")
      Decontaminate.bloomFlag(
          docs.filter(col("doc_id") % 50 =!= 0),
          docs.filter(col("doc_id") % 50 === 0),
          "doc_id", "text", shingleN = 3, minHits = 5)
        .select(col("id").as("doc_id"), col("bloom_hits"))
        .orderBy("doc_id")
    }),

    "d18_dup_substring_cut" -> ((s, dir) => {
      // the CUT step of Lee et al. exact-substring dedup, on the d16
      // fixture (shared slogan + every-7th-doc self-repeat): remove
      // every token covered by a corpus-duplicated k-gram
      val framed = T(s, dir, "documents").select(col("doc_id"), concat(
        lit("subscribe to our newsletter today for free updates "),
        col("text"),
        when(col("doc_id") % 7 === 0, concat(lit(" "), col("text")))
          .otherwise(lit(""))).as("text"))
      Dedup.cutDupSubstrings(framed, "doc_id", "text", k = 4)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    "d23_span_dedup" -> ((s, dir) => {
      // C4's three-sentence-span dedup (Raffel et al. 2020 §2.2). The
      // fixture frames each single-sentence doc as a page: a
      // 3-sentence intro every page shares (one corpus-duplicated
      // span — only the corpus-first doc keeps it), the body as its
      // own sentence, and a closer shared by even docs (a second
      // duplicated span) or unique per odd doc.
      val framed = T(s, dir, "documents").select(col("doc_id"), concat(
        lit("welcome to the archive. this copy is mirrored nightly. " +
          "enjoy your stay. "),
        col("text"), lit("."),
        when(col("doc_id") % 2 === 0,
          lit(" thanks for visiting. see you next time. goodbye."))
          .otherwise(concat(lit(" closing note "), col("doc_id"), lit("."))))
        .as("text"))
      Dedup.spanDedup(framed, "doc_id", "text", spanLen = 3)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    "t19_gopher_rules" -> ((s, dir) =>
      // the Gopher hard-filter bundle (Rae et al. 2021 A1): every
      // signal surfaced next to the composite pass flag; zero shuffles
      TextStats.gopherRules(T(s, dir, "documents"), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    "t22_gopher_repetition" -> ((s, dir) => {
      // Gopher A2 repetition rules on a d18-style framed fixture
      // (the raw corpus has no line structure or injected repeats):
      // a shared slogan line plus an every-7th-doc full self-repeat
      // as a second line — those docs must fail the line AND
      // dup-n-gram rules, the rest only their natural repetition
      // the testdata file is ONE parquet row group = one input split,
      // which would serialize the gram-counting projection onto a
      // single core; a real corpus arrives in thousands of splits, so
      // spread the tiny frame first (0.6 MB shuffle, then 32-way CPU)
      val framed = T(s, dir, "documents").repartition(32, col("doc_id"))
        .select(col("doc_id"), concat(
          lit("subscribe to our newsletter today for free updates"), lit("\n"),
          col("text"),
          when(col("doc_id") % 7 === 0, concat(lit("\n"), col("text")))
            .otherwise(lit(""))).as("text"))
      TextStats.gopherRepetition(framed, "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    "t23_divergence" -> ((s, dir) =>
      // per-source KL / cross-entropy vs the corpus unigram blend:
      // which slice drifts, in nats; absent-token mass folded in
      // exactly via the factored add-1 correction (O(nnz), no V×G)
      TextStats.corpusDivergence(T(s, dir, "documents"), "source", "text")
        .orderBy("source")),

    "t24_zipf" -> ((s, dir) =>
      // power-law exponent of the top-500 vocabulary: one-number
      // corpus health check; everything after the TakeOrdered runs
      // on 500 rows
      TextStats.zipfFit(T(s, dir, "documents"), "text", topR = 500)),

    "s16_knn_graph" -> ((s, dir) =>
      // exact directed 5-NN graph of a bounded node slice (the input
      // to kNN clustering / label propagation); the LSH family is the
      // corpus-scale candidate path, as with d05 vs s06
      Similarity.knnGraph(
          T(s, dir, "embeddings").filter(col("vec_id") < 200),
          "vec_id", "embedding", k = 5)
        .orderBy("src", "rank")),

    "t26_lexical_diversity" -> ((s, dir) =>
      // named lexical-diversity indices (TTR, Guiraud, Herdan) —
      // row-local, zero shuffles
      TextStats.lexicalDiversity(T(s, dir, "documents"), "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_tokens"), col("n_types"),
          col("ttr"), col("root_ttr"), col("herdan_c"))
        .orderBy("doc_id")),

    "t25_bpe_pairs" -> ((s, dir) =>
      // BPE tokenizer training, first iteration (Sennrich 2016):
      // adjacent char-pair counts over the word HISTOGRAM — the pair
      // explode runs on the vocabulary, never the corpus
      TextStats.bpePairStats(T(s, dir, "documents"), "text", topK = 30)),

    "t21_quality_classifier" -> ((s, dir) =>
      // GPT-3-style quality filter: every-50th doc plays the curated
      // seed set (same split as d08/d19); naive-Bayes log-odds over
      // hashed n-gram buckets score the whole corpus, keep = score>0
      Training.qualityClassifier(T(s, dir, "documents"), "doc_id", "text",
          posPred = col("doc_id") % 50 === 0)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    "t20_cms" -> ((s, dir) => {
      // Count-Min sketch frequency estimates: the mergeable d=4×w=1024
      // grid aggregates map-side; probes (incl. an absent term) read
      // the broadcast sketch via the SAME portable md5 buckets; the
      // exact counts ride along to exhibit the one-sided error.
      // The sketch builds from the (tok, count) HISTOGRAM via the
      // weighted update (bit-identical grid, |vocab| md5 calls instead
      // of |tokens|), and the histogram serves the exact side too —
      // filtered to the 5 probe terms, not a full-vocab left join.
      import s.implicits._
      val probeTerms = Seq("hash", "join", "batch", "the", "nosuchtoken")
      val probes = probeTerms.toDF("term")
      val tokCounts = T(s, dir, "documents")
        .select(explode(split(lower(col("text")), "\\s+")).as("tok"))
        .filter(length(col("tok")) > 0)
        .groupBy("tok").agg(cnt.as("c"))
        .persist() // two consumers: sketch build + probe-filtered exact
      val sk = tokCounts.agg(graft.functions.CountMinAgg.sketchWeighted(
        col("tok"), col("c"), 1024, 4).as("sk"))
      val exact = tokCounts.filter(col("tok").isin(probeTerms: _*))
        .select(col("tok").as("term"), col("c").as("_ex"))
      val res = probes.crossJoin(broadcast(sk))
        .withColumn("est", graft.functions.CountMinAgg.estimate(
          col("sk"), col("term"), 1024, 4))
        .join(exact, Seq("term"), "left")
        .select(col("term"), col("est").cast("long").as("est"),
          coalesce(col("_ex"), lit(0L)).cast("long").as("exact"))
        .orderBy("term")
      graft.operators.Caching.sealOver(res, tokCounts)
    })
  )

  // ---------------------------------------------------------------- oracle

  /** DuckDB twin of TextFunctions.langId, generated from the same
    * stopword table so the two can never drift. */
  /** The langId CASE chain over any relation exposing (keyCols...,
    * txt, toks) — generated from the same stopword table as
    * TextFunctions.langId, shared by the t01 oracle and t40's
    * per-sentence labeling so the twins can never drift. */
  private def langIdOver(rel: String, keyCols: String): String = {
    val scoreCols = TextFunctions.StopwordSets.map { case (l, ws) =>
      val arr = ws.map(w => s"'$w'").mkString("[", ", ", "]")
      if (TextFunctions.UnsegmentedLangs(l))
        // unsegmented scripts: substring containment on the raw text,
        // mirroring TextFunctions.langScoreUnsegmented
        s"len(list_filter($arr, m -> contains(txt, m))) AS s_$l"
      else
        s"len(list_intersect(toks, $arr)) AS s_$l"
    }.mkString(", ")
    val best = TextFunctions.StopwordSets.map { case (l, _) => s"s_$l" }
      .mkString("greatest(", ", ", ")")
    val cases = TextFunctions.StopwordSets.map { case (l, _) =>
      s"WHEN best > 0 AND s_$l = best THEN '$l'"
    }.mkString(" ")
    s"""SELECT $keyCols, CASE $cases ELSE 'und' END AS lang_pred FROM (
          SELECT $keyCols, $best AS best, s_${TextFunctions.StopwordSets.map(_._1).mkString(", s_")} FROM (
            SELECT $keyCols, $scoreCols FROM $rel))"""
  }

  private val langIdOracle: String =
    langIdOver(
      """(SELECT doc_id, lower(text) AS txt,
                 string_split_regex(lower(text), '\s+') AS toks
          FROM documents)""", "doc_id") + " ORDER BY doc_id"

  /** Chained-CTE replay of [[graft.operators.TextStats.bpeTrain]]'s 8
    * merge rounds: v0 = the space-joined char symbolization of the
    * vocabulary; round k picks argmax pair (freq desc, pair asc) from
    * v(k-1) and rewrites v(k-1) with the same padded replace. Built
    * programmatically — the rounds are mechanical.
    */
  private def bpeCtes(nMerges: Int): String = {
    val head =
      """WITH words AS (SELECT w, count(*) AS cnt FROM (
              SELECT unnest(string_split_regex(lower(text), '\s+')) AS w
              FROM documents) WHERE w <> '' GROUP BY 1),
            v0 AS (SELECT ' ' || array_to_string(string_split(w, ''), ' ') || ' ' AS syms, cnt
                   FROM words)"""
    val rounds = (1 to nMerges).map { k =>
      s""",
            p$k AS (SELECT l[i] || ' ' || l[i+1] AS pair, sum(cnt) AS f
                    FROM (SELECT l, cnt, unnest(range(1, len(l))) AS i
                          FROM (SELECT string_split(trim(syms), ' ') AS l, cnt
                                FROM v${k - 1}))
                    GROUP BY 1),
            m$k AS (SELECT pair, f FROM p$k ORDER BY f DESC, pair LIMIT 1),
            v$k AS (SELECT replace(syms, ' ' || pair || ' ',
                             ' ' || replace(pair, ' ', '') || ' ') AS syms, cnt
                    FROM v${k - 1}, m$k)"""
    }.mkString
    head + rounds
  }

  /** Chained-CTE replay of [[graft.operators.Similarity.mmrTopK]]'s
    * greedy rounds: round i scores every unselected candidate as
    * λ·rel − (1−λ)·max(sim to a1..a(i−1)) and takes the window-rank-1
    * row. λ and 1−λ interpolate as the Scala-computed doubles so both
    * engines fold the SAME IEEE constants over the SAME rounded-6
    * rel/sim inputs.
    */
  private def mmrOracle(k: Int, prefetch: Int, lam: Double): String = {
    val l = lam.toString
    val oml = (1.0 - lam).toString
    val head =
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
              c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings),
              u AS (SELECT qid, cid, CAST(unnest(ce) AS DOUBLE) AS x,
                           CAST(unnest(qe) AS DOUBLE) AS y
                    FROM (SELECT qid, cid, qe, ce FROM q, c)),
              s AS (SELECT qid, cid,
                           sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))) AS cos
                    FROM u GROUP BY 1, 2),
              r AS (SELECT qid, cid, cos, row_number() OVER (
                      PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
                    FROM s),
              cand AS (SELECT qid, cid, round(cos, 6) AS rel FROM r WHERE rnk <= $prefetch),
              su AS (SELECT a.qid, a.cid AS c1, b.cid AS c2,
                            CAST(unnest(ea.embedding) AS DOUBLE) AS x,
                            CAST(unnest(eb.embedding) AS DOUBLE) AS y
                     FROM cand a JOIN cand b ON a.qid = b.qid
                     JOIN embeddings ea ON ea.vec_id = a.cid
                     JOIN embeddings eb ON eb.vec_id = b.cid),
              sims AS (SELECT qid, c1, c2,
                              round(sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))), 6) AS sim
                       FROM su GROUP BY 1, 2, 3),
              a1 AS (SELECT qid, cid, 1 AS mmr_rank FROM (
                       SELECT qid, cid, row_number() OVER (
                         PARTITION BY qid ORDER BY rel DESC, cid) AS rk FROM cand)
                     WHERE rk = 1)"""
    val rounds = (2 to k).map { i =>
      s""",
              a$i AS (SELECT qid, cid, $i AS mmr_rank FROM (
                        SELECT c.qid, c.cid, row_number() OVER (
                          PARTITION BY c.qid
                          ORDER BY $l * c.rel - $oml * ms.m DESC, c.cid) AS rk
                        FROM cand c
                        JOIN (SELECT s2.qid, s2.c1 AS cid, max(s2.sim) AS m
                              FROM sims s2
                              JOIN (${(1 until i).map(j => s"SELECT qid, cid FROM a$j").mkString(" UNION ALL ")}) p
                                ON p.qid = s2.qid AND p.cid = s2.c2
                              GROUP BY 1, 2) ms
                          ON ms.qid = c.qid AND ms.cid = c.cid
                        WHERE NOT EXISTS (
                          SELECT 1 FROM (${(1 until i).map(j => s"SELECT qid, cid FROM a$j").mkString(" UNION ALL ")}) p2
                          WHERE p2.qid = c.qid AND p2.cid = c.cid))
                      WHERE rk = 1)"""
    }.mkString
    val all = (1 to k).map(j => s"SELECT qid, cid, mmr_rank FROM a$j")
      .mkString(" UNION ALL ")
    head + rounds +
      s"""
         SELECT f.qid AS query_id, f.cid AS neighbor_id, cand.rel AS rel,
                CAST(f.mmr_rank AS BIGINT) AS mmr_rank
         FROM ($all) f JOIN cand ON cand.qid = f.qid AND cand.cid = f.cid
         ORDER BY query_id, mmr_rank"""
  }

  private val ngramShingleCte =
    // shingle start positions unnest per row from range(1, len(toks)-1)
    // (1-based, stop-exclusive => i+2 <= len), so the bound derives
    // from each document's own token count — no silent cap on long docs
    """WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
                  FROM documents WHERE doc_id < 500),
            sh AS (SELECT DISTINCT doc_id,
                     toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
                   FROM (SELECT doc_id, toks,
                           unnest(range(1, len(toks) - 1)) AS i FROM t)),
            sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
            inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS n
                      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                      GROUP BY 1, 2)"""

  /** DuckDB twin of TextFunctions.qualityScore over documents —
    * shared by t02 and d07 so the two oracles cannot drift. */
  private val qualitySubSql =
    """SELECT doc_id, round(
           (CASE WHEN length(text) >= 100 AND length(text) <= 20000 THEN 1 ELSE 0 END) * 0.3
           + (CASE WHEN mwl >= 3.0 AND mwl <= 12.0 THEN 1 ELSE 0 END) * 0.3
           + ar * 0.4, 4) AS quality
         FROM (
           SELECT doc_id, text,
                  CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
                    / CAST(greatest(length(text), 1) AS DOUBLE) AS ar,
                  CAST(length(text) AS DOUBLE) / CAST(greatest(
                    CASE WHEN length(trim(text)) = 0 THEN 0
                         ELSE len(string_split_regex(trim(text), '\s+')) END, 1) AS DOUBLE) AS mwl
           FROM documents)"""

  /** d12's DuckDB twin, generated: the 64 per-bit conditional sums
    * mirror the Spark aggregate column for column (same instr-based hex
    * digit parse, same floor-div bit extraction), so both engines
    * evaluate the identical hash family and banding.
    */
  /** BM25 oracle: identical arithmetic association as
    * Retrieval.bm25TopK — idf * ((tf*(k1+1)) / (tf + k1*((1-b) + (b*dl)/avgdl)))
    * with per-term contributions rounded to 6 then DECIMAL-summed, so
    * both engines produce identical IEEE64 scores and therefore
    * identical ranks (ties broken by doc_id).
    */
  /** s29 oracle: the FULL Lloyd trajectory replayed in SQL — micro
    * vectors, md5-seeded init, per-iteration exact-integer argmin +
    * sign-split HALF_UP micro means with the empty-cluster COALESCE,
    * then the final assignment. Exact integers end-to-end make the
    * whole trajectory engine-independent.
    */
  private def s29Oracle(k: Int, iters: Int, dims: Int): String =
    s"""WITH ${lloydCtes(k, iters, dims)}
       SELECT id AS vec_id, CAST(j AS BIGINT) AS cluster,
              CAST(dist AS BIGINT) AS dist_sq
       FROM asg ORDER BY vec_id"""

  /** The shared Lloyd-trajectory CTE chain (ends at `asg`:
    * (id, j, dist) — the final assignment under the final centroids).
    * s29 selects it directly; s30 stacks the prototypicality chain on
    * top, so the two oracles cannot drift.
    */
  private def lloydCtes(k: Int, iters: Int, dims: Int): String = {
    val iterCtes = (1 to iters).map { t =>
      s"""d$t AS (SELECT e.id, c.j, sum((e.x6 - c.c6) * (e.x6 - c.c6)) AS dist
               FROM ex e JOIN c${t - 1} c USING (pos) GROUP BY 1, 2),
          a$t AS (SELECT id, j FROM (
                    SELECT id, j, row_number() OVER (PARTITION BY id
                      ORDER BY dist, j) AS rk FROM d$t) WHERE rk = 1),
          m$t AS (SELECT a.j, e.pos,
                    CASE WHEN sum(e.x6) >= 0
                         THEN (2 * sum(e.x6) + count(*)) // (2 * count(*))
                         ELSE -((2 * -sum(e.x6) + count(*)) // (2 * count(*)))
                    END AS c6
                  FROM ex e JOIN a$t a USING (id) GROUP BY a.j, e.pos),
          c$t AS (SELECT p.j, p.pos, CAST(COALESCE(m.c6, p.c6) AS BIGINT) AS c6
                  FROM c${t - 1} p LEFT JOIN m$t m ON m.j = p.j AND m.pos = p.pos)"""
    }.mkString(",\n")
    s"""ex AS (SELECT vec_id AS id, CAST(pos AS BIGINT) AS pos,
                CAST(round(round(CAST(x AS DOUBLE), 6) * 1000000, 0) AS BIGINT) AS x6
              FROM (SELECT vec_id, unnest(embedding) AS x,
                           unnest(range(len(embedding))) AS pos
                    FROM embeddings WHERE len(embedding) = $dims)),
         sd AS (SELECT vec_id,
                  row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
                    - 1 AS j
                FROM embeddings WHERE len(embedding) = $dims
                ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $k),
         c0 AS (SELECT sd.j, ex.pos, ex.x6 AS c6 FROM sd JOIN ex ON ex.id = sd.vec_id),
         $iterCtes,
         fin AS (SELECT e.id, c.j, sum((e.x6 - c.c6) * (e.x6 - c.c6)) AS dist
                 FROM ex e JOIN c$iters c USING (pos) GROUP BY 1, 2),
         asg AS (SELECT id, j, dist FROM (
                   SELECT id, j, dist, row_number() OVER (PARTITION BY id
                     ORDER BY dist, j) AS rk FROM fin) WHERE rk = 1)"""
  }

  /** s32 oracle: the Lloyd chain trains the quantizer, queries probe
    * their `nprobe` nearest final centroids by the same exact-integer
    * metric, candidates are the probed clusters' members, the s01
    * cosine chain ranks them.
    */
  private def s32Oracle(k: Int, iters: Int, dims: Int, nprobe: Int,
                        topK: Int, queryMax: Long): String =
    s"""WITH ${lloydCtes(k, iters, dims)},
         qd AS (SELECT q.id AS qid, c.j,
                  sum((q.x6 - c.c6) * (q.x6 - c.c6)) AS dist
                FROM (SELECT id, pos, x6 FROM ex WHERE id < $queryMax) q
                JOIN c$iters c USING (pos) GROUP BY 1, 2),
         pr AS (SELECT qid, j FROM (
                  SELECT qid, j, row_number() OVER (PARTITION BY qid
                    ORDER BY dist, j) AS rk FROM qd) WHERE rk <= $nprobe),
         cand AS (SELECT pr.qid, a.id AS cid FROM pr JOIN asg a ON a.j = pr.j),
         u AS (SELECT qid, cid, CAST(unnest(ce) AS DOUBLE) AS x,
                      CAST(unnest(qe) AS DOUBLE) AS y
               FROM (SELECT cand.qid, cand.cid, ce.embedding AS ce,
                            qe.embedding AS qe
                     FROM cand JOIN embeddings ce ON ce.vec_id = cand.cid
                               JOIN embeddings qe ON qe.vec_id = cand.qid)),
         sc AS (SELECT qid, cid,
                  sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))) AS cos
                FROM u GROUP BY 1, 2
                HAVING sum(x*x) > 0 AND sum(y*y) > 0),
         rr AS (SELECT qid, cid, cos, CAST(row_number() OVER (
                  PARTITION BY qid ORDER BY cos DESC, cid) AS BIGINT) AS rnk
                FROM sc)
       SELECT qid AS query_id, cid AS neighbor_id, round(cos, 6) AS cos,
              rnk AS rank
       FROM rr WHERE rnk <= $topK ORDER BY query_id, rank"""

  /** s30 oracle: the Lloyd chain's `asg` assignment becomes the label
    * for the s28 prototypicality chain — unsupervised SSL prototypes
    * (Sorscher et al. 2022), both halves shared verbatim with their
    * standalone oracles.
    */
  private def s30Oracle(k: Int, iters: Int, dims: Int,
                        pruneNum: Int, pruneDen: Int): String =
    s"""WITH ${lloydCtes(k, iters, dims)},
         ex2 AS (SELECT e.vec_id, a.j AS cluster, unnest(e.embedding) AS x,
                        unnest(range(len(e.embedding))) AS pos
                 FROM embeddings e JOIN asg a ON a.id = e.vec_id),
         ce AS (SELECT cluster, CAST(pos AS BIGINT) AS pos,
                  round(CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(28,12))) AS DOUBLE)
                        / CAST(count(*) AS DOUBLE), 6) AS c
                FROM ex2 GROUP BY 1, 2),
         cn AS (SELECT cluster,
                  CAST(sum(CAST(round(c * c, 6) AS DECIMAL(24,8))) AS DOUBLE) AS cn2
                FROM ce GROUP BY 1),
         nv AS (SELECT vec_id, sqrt(list_aggregate(
                  list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                  'sum')) AS vn
                FROM embeddings),
         dt AS (SELECT e.vec_id, e.cluster,
                  CAST(sum(CAST(round(ce.c * CAST(e.x AS DOUBLE), 6)
                    AS DECIMAL(24,8))) AS DOUBLE) AS dot
                FROM ex2 e JOIN ce ON ce.cluster = e.cluster
                  AND ce.pos = e.pos
                GROUP BY 1, 2),
         sc AS (SELECT dt.vec_id, CAST(dt.cluster AS BIGINT) AS cluster,
                  round(dot / (sqrt(cn.cn2) * nv.vn), 6) AS proto_score
                FROM dt JOIN cn ON cn.cluster = dt.cluster AND cn.cn2 > 0
                        JOIN nv ON nv.vec_id = dt.vec_id AND nv.vn > 0),
         rk AS (SELECT *,
                  CAST(row_number() OVER (PARTITION BY cluster
                    ORDER BY proto_score DESC, vec_id) AS BIGINT) AS rank_in_cluster,
                  CAST(count(*) OVER (PARTITION BY cluster) AS BIGINT) AS n_cluster
                FROM sc)
       SELECT vec_id, cluster, proto_score, rank_in_cluster, n_cluster,
              rank_in_cluster > n_cluster * $pruneNum // $pruneDen AS kept
       FROM rk ORDER BY cluster, rank_in_cluster"""

  private lazy val t17Oracle: String = {
    val values = bm25Queries.map { case (q, t) => s"('$q', '$t')" }.mkString(", ")
    s"""WITH tk AS (SELECT doc_id, tok AS term FROM (
                SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok
                FROM documents) WHERE len(tok) > 0),
            dl AS (SELECT doc_id, count(*) AS dl FROM tk GROUP BY 1),
            st AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
            q(qid, term) AS (VALUES $values),
            tf AS (SELECT doc_id, term, count(*) AS tf FROM tk
                   JOIN (SELECT DISTINCT term FROM q) USING (term) GROUP BY 1, 2),
            dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
            ct AS (SELECT qid, doc_id,
                     round(ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                                    / (CAST(df AS DOUBLE) + 0.5))
                           * (CAST(tf AS DOUBLE) * (1.2 + 1.0)
                              / (CAST(tf AS DOUBLE) + 1.2 * ((1.0 - 0.75)
                                 + (0.75 * CAST(dl AS DOUBLE))
                                   / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))), 6) AS c
                   FROM tf JOIN q USING (term) JOIN dfq USING (term)
                   JOIN dl USING (doc_id) CROSS JOIN st),
            sc AS (SELECT qid, doc_id,
                     round(CAST(sum(CAST(c AS DECIMAL(24,8))) AS DOUBLE), 6) AS bm25
                   FROM ct GROUP BY 1, 2)
         SELECT qid, doc_id, bm25, CAST(rk AS BIGINT) AS rank FROM (
           SELECT qid, doc_id, bm25,
                  row_number() OVER (PARTITION BY qid
                    ORDER BY bm25 DESC, doc_id) AS rk FROM sc)
         WHERE rk <= 10 ORDER BY qid, rk"""
  }

  /** DSIR oracle: identical feature stream (unigrams + space-joined
    * adjacent bigrams), identical 3-hex-digit md5 bucketing, identical
    * smoothed-ratio association ((ct+1)/(nt+B)) / ((cr+1)/(nr+B)),
    * rounded to 6 then DECIMAL-summed per doc.
    */
  private lazy val p07Oracle: String = {
    def dg(p: Int) = s"(instr('0123456789abcdef', substr(h, $p, 1)) - 1)"
    val bucket = s"((${dg(1)} * 16 + ${dg(2)}) * 16 + ${dg(3)})"
    s"""WITH tk AS (SELECT doc_id, (lang = 'en') AS tgt, list_filter(
                string_split_regex(lower(text), '\\s+'),
                t -> len(t) > 0) AS toks FROM documents),
            uni AS (SELECT doc_id, tgt, unnest(toks) AS f FROM tk),
            bi AS (SELECT doc_id, tgt, toks[i] || ' ' || toks[i+1] AS f
                   FROM (SELECT doc_id, tgt, toks,
                           unnest(range(1, len(toks))) AS i FROM tk)
                   WHERE len(toks) >= 2),
            feats AS (SELECT doc_id, tgt, $bucket AS b
                      FROM (SELECT doc_id, tgt, md5(f) AS h
                            FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi))),
            counts AS (SELECT b, count(*) AS cr,
                              count(CASE WHEN tgt THEN 1 END) AS ct
                       FROM feats GROUP BY 1),
            tot AS (SELECT sum(cr) AS nr, sum(ct) AS nt FROM counts),
            lr AS (SELECT b, round(ln(
                     (CAST(ct + 1 AS DOUBLE) / CAST(nt + 4096 AS DOUBLE))
                     / (CAST(cr + 1 AS DOUBLE) / CAST(nr + 4096 AS DOUBLE))), 6) AS lr
                   FROM counts CROSS JOIN tot),
            sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feats,
                     round(CAST(sum(CAST(lr AS DECIMAL(24,8))) AS DOUBLE), 6) AS log_weight
                   FROM feats JOIN lr USING (b) GROUP BY 1)
         SELECT doc_id, n_feats, log_weight FROM (
           SELECT *, row_number() OVER (ORDER BY log_weight DESC, doc_id) AS rk
           FROM sc)
         WHERE rk <= 100 ORDER BY doc_id"""
  }

  /** A-ES weighted-sample oracle: identical 8-hex-digit md5 uniform
    * (instr-based hex parse → the same integer h, u = (h+1)/2^32 one
    * exact IEEE division), identical ln(u)/w key rounded to 6 before
    * ranking, same top-100 with id tiebreak. Token count is the
    * tokenCountWs twin (the p12 expression).
    */
  private lazy val p14Oracle: String = {
    def dg(p: Int) = s"(instr('0123456789abcdef', substr(h, $p, 1)) - 1)"
    val hex8 = (1 to 8).map(dg).reduce((a, b) => s"($a * 16 + $b)")
    s"""WITH n AS (SELECT doc_id,
               CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS n_toks
             FROM documents),
          hx AS (SELECT doc_id, n_toks, md5(CAST(doc_id AS VARCHAR)) AS h
                 FROM n WHERE n_toks > 0 AND doc_id IS NOT NULL),
          ky AS (SELECT doc_id, n_toks,
                   round(ln((CAST($hex8 AS DOUBLE) + 1) / 4294967296.0)
                         / CAST(n_toks AS DOUBLE), 6) AS wkey
                 FROM hx)
       SELECT doc_id, n_toks, wkey FROM (
         SELECT *, row_number() OVER (ORDER BY wkey DESC, doc_id) AS rk FROM ky)
       WHERE rk <= 100 ORDER BY doc_id"""
  }

  /** Stupid Backoff oracle: identical pair/token streams, identical
    * branch arithmetic — seen bigrams score ln(nb/np), unseen ones
    * ln(0.4 · (nu+1)/(N+V)) with the same multiplication association —
    * each rounded to 6 then DECIMAL-summed per doc.
    */
  /** The p12 next-fit fold as a per-shard recursive CTE (depth ≤
    * shardSize=128), shared by the p12 gate and the p20 efficiency
    * report so the packs they describe cannot drift. */
  private lazy val p12PackCte: String =
    """WITH RECURSIVE n AS (SELECT doc_id,
               CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_toks
             FROM documents),
           r AS (SELECT doc_id, doc_id // 128 AS shard, n_toks,
                   row_number() OVER (PARTITION BY doc_id // 128
                     ORDER BY doc_id) AS rn
                 FROM n WHERE n_toks > 0 AND doc_id IS NOT NULL),
           g AS (
             SELECT shard, rn, doc_id, n_toks,
                    CAST(0 AS BIGINT) AS pack, n_toks AS fill
             FROM r WHERE rn = 1
             UNION ALL
             SELECT r.shard, r.rn, r.doc_id, r.n_toks,
               CASE WHEN g.fill + r.n_toks > 512 THEN g.pack + 1 ELSE g.pack END,
               CASE WHEN g.fill + r.n_toks > 512 THEN r.n_toks
                    ELSE g.fill + r.n_toks END
             FROM g JOIN r ON r.shard = g.shard AND r.rn = g.rn + 1)"""

  /** s21 oracle: the identical moment pass and the identical 12
    * power-iteration rounds as chained CTEs — every sum a round-6 →
    * DECIMAL(24,8) fold, every round's normalize re-rounded, so the
    * loadings/eigenvalue/explained fraction replay Spark's driver
    * loop bit-for-bit. */
  /** One component's 12 power-iteration rounds as chained CTEs —
    * every iteration MATERIALIZED (inlined, v_t references w_t twice,
    * directly and via n_t, so the plan re-expands exponentially in
    * the iteration count). `covName` is the matrix the component
    * iterates on; `p` prefixes the CTE names so s24's deflation chain
    * can stack k of these ("" reproduces s21's historical names).
    */
  private def pcIterCtes(covName: String, p: String, iters: Int): String =
    (1 to iters).map { t =>
      val pv = if (t == 1) "v0" else s"${p}v${t - 1}"
      s"""${p}w$t AS MATERIALIZED (SELECT c.i, CAST(sum(CAST(round(c.c * p.v, 6) AS DECIMAL(24,8))) AS DOUBLE) AS w
                  FROM $covName c JOIN $pv p ON p.i = c.j GROUP BY 1),
          ${p}n$t AS MATERIALIZED (SELECT sqrt(CAST(sum(CAST(round(w * w, 6) AS DECIMAL(24,8))) AS DOUBLE)) AS nm FROM ${p}w$t),
          ${p}v$t AS MATERIALIZED (SELECT i, round(w / nm, 6) AS v FROM ${p}w$t, ${p}n$t)"""
    }.mkString(",\n")

  private lazy val s21Cte: String = {
    val iterCtes = pcIterCtes("cov", "", 12)
    s"""WITH x AS MATERIALIZED (SELECT vec_id, list_transform(embedding,
                 t -> CAST(round(round(CAST(t AS DOUBLE), 6) * 1000000.0, 0) AS BIGINT)) AS v
               FROM embeddings WHERE embedding IS NOT NULL),
          nn AS (SELECT count(*) AS n FROM x),
          e1 AS (SELECT vec_id, unnest(v) AS xi, unnest(range(len(v))) AS i, v FROM x),
          pp AS (SELECT i, xi, unnest(v) AS xj, unnest(range(len(v))) AS j FROM e1),
          s AS (SELECT i, j, sum(xi * xj) AS s6 FROM pp GROUP BY 1, 2),
          mu AS (SELECT i, sum(xi) AS m6 FROM e1 GROUP BY 1),
          cov AS MATERIALIZED (SELECT s.i, s.j,
                  ((CAST(s.s6 AS DOUBLE) / 1.0e12) / nn.n)
                  - (((CAST(m1.m6 AS DOUBLE) / 1000000.0) / nn.n)
                     * ((CAST(m2.m6 AS DOUBLE) / 1000000.0) / nn.n)) AS c
                  FROM s JOIN mu m1 ON m1.i = s.i JOIN mu m2 ON m2.i = s.j CROSS JOIN nn),
          dd AS (SELECT count(*) AS d FROM mu),
          v0 AS (SELECT i, round(1.0 / sqrt(CAST(d AS DOUBLE)), 6) AS v FROM mu, dd),
          $iterCtes"""
  }

  private lazy val s21Oracle: String = s21Cte +
    """,
          tr AS (SELECT CAST(sum(CAST(round(c, 6) AS DECIMAL(24,8))) AS DOUBLE) AS tr
                 FROM cov WHERE i = j)
       SELECT i AS pos, v AS loading, round(nm, 6) AS eigenvalue,
              round(round(nm, 6) / tr, 6) AS explained_frac
       FROM v12, n12, tr ORDER BY pos"""

  /** s22: the s21 chain's v12 loadings applied back to every vector —
    * centered by the same mu/n mean, per-term round-6 products
    * DECIMAL-summed per row, the identical arithmetic the Spark side
    * embeds as literals. */
  private lazy val s22Oracle: String = s21Cte +
    """,
          mm AS (SELECT mu.i, (CAST(mu.m6 AS DOUBLE) / 1000000.0) / nn.n AS m
                 FROM mu CROSS JOIN nn),
          pt AS (SELECT e.vec_id,
                   CAST(sum(CAST(round(round(CAST(e.xi AS DOUBLE) / 1000000.0 - m.m, 6) * v.v, 6)
                     AS DECIMAL(24,8))) AS DOUBLE) AS sc
                 FROM e1 e JOIN mm m ON m.i = e.i JOIN v12 v ON v.i = e.i
                 GROUP BY 1)
       SELECT vec_id, round(sc, 6) AS pc_score FROM pt ORDER BY vec_id"""

  /** s24/s25 shared chain: the s21 moment/covariance head, then k
    * components of 12 power-iteration rounds with Hotelling deflation
    * between them — cov_{c+1} = cov_c − (λ·v_i)·v_j, the association
    * written verbatim as the Spark driver computes it. */
  private def sPcKCte(k: Int): String = {
    def covName(c: Int) = if (c == 1) "cov" else s"cov$c"
    val compCtes = (1 to k).map { c =>
      val iters = pcIterCtes(covName(c), s"k$c", 12)
      val lam = s"k${c}lam AS (SELECT round(nm, 6) AS lam FROM k${c}n12)"
      val deflate =
        if (c == k) ""
        else s""",
          ${covName(c + 1)} AS MATERIALIZED (SELECT c.i, c.j,
                  c.c - (l.lam * a.v) * b.v AS c
                  FROM ${covName(c)} c
                  JOIN k${c}v12 a ON a.i = c.i
                  JOIN k${c}v12 b ON b.i = c.j
                  CROSS JOIN k${c}lam l)"""
      s"$iters,\n          $lam$deflate"
    }.mkString(",\n")
    s21Cte.replace(s"\n          ${pcIterCtes("cov", "", 12)}",
      s"\n          $compCtes") match {
      case same if same == s21Cte =>
        sys.error("sPcKCte: iteration-chain splice failed")
      case ok => ok
    }
  }

  /** s24: the k-component chain's loadings/eigenvalues, explained
    * against the ORIGINAL trace. */
  private lazy val s24Oracle: String = sPcKCte(3) +
    s""",
          tr AS (SELECT CAST(sum(CAST(round(c, 6) AS DECIMAL(24,8))) AS DOUBLE) AS tr
                 FROM cov WHERE i = j)
       ${(1 to 3).map(c =>
        s"""SELECT CAST($c AS BIGINT) AS component, i AS pos, v AS loading,
               l.lam AS eigenvalue, round(l.lam / tr, 6) AS explained_frac
             FROM k${c}v12, k${c}lam l, tr""").mkString("\nUNION ALL\n")}
       ORDER BY component, pos"""

  /** s25: each component's centered projection + the √λ-normalized
    * whitened coordinate — the s21 integer-micro discipline end to
    * end: coordinate/mean/loading as ×10⁶ BIGINTs, exact pico term
    * sums, HALF_UP at the pico→micro boundary by integer division
    * (sum(BIGINT) is HUGEINT in DuckDB — exact — cast back down). */
  private lazy val s25Oracle: String = sPcKCte(3) +
    s""",
          mm AS (SELECT mu.i,
                   CAST(round(round((CAST(mu.m6 AS DOUBLE) / 1000000.0) / nn.n, 6)
                     * 1000000.0, 0) AS BIGINT) AS m6
                 FROM mu CROSS JOIN nn)
       ${(1 to 3).map(c =>
        s"""SELECT vec_id, CAST($c AS BIGINT) AS component,
               CAST(micro AS DOUBLE) / 1000000.0 AS score,
               round((CAST(micro AS DOUBLE) / 1000000.0) / sqrt(l.lam), 6) AS white
             FROM (SELECT vec_id,
                     CASE WHEN pico >= 0 THEN (pico + 500000) // 1000000
                          ELSE -((-pico + 500000) // 1000000) END AS micro
                   FROM (SELECT e.vec_id,
                           CAST(sum((e.xi - m.m6)
                             * CAST(round(v.v * 1000000.0, 0) AS BIGINT)) AS BIGINT) AS pico
                         FROM e1 e JOIN mm m ON m.i = e.i JOIN k${c}v12 v ON v.i = e.i
                         GROUP BY 1)), k${c}lam l""").mkString("\nUNION ALL\n")}
       ORDER BY vec_id, component"""

  private lazy val t30Oracle: String = t30ScoreCte +
    """
       SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
              round(CAST(sum(CAST(lp AS DECIMAL(24,8))) AS DOUBLE) / count(*), 6)
                AS mean_logprob
       FROM sc GROUP BY 1 ORDER BY 1"""

  /** t36: t30's per-doc backoff scores fed through the t18 tercile
    * cut — per-language head/middle/tail on the cross-slice LM. */
  private lazy val t36Oracle: String = t30ScoreCte +
    """,
          pd AS (SELECT doc_id,
                   round(CAST(sum(CAST(lp AS DECIMAL(24,8))) AS DOUBLE)
                         / count(*), 6) AS mean_logprob
                 FROM sc GROUP BY 1),
          sl AS (SELECT d.doc_id, d.lang, p.mean_logprob
                 FROM pd p JOIN documents d ON d.doc_id = p.doc_id),
          hist AS (SELECT lang, mean_logprob, count(*) AS c
                   FROM sl GROUP BY 1, 2),
          cut AS (SELECT lang, mean_logprob,
                    CASE WHEN CAST(coalesce(sum(c) OVER (PARTITION BY lang
                             ORDER BY mean_logprob DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
                           / CAST(sum(c) OVER (PARTITION BY lang) AS DOUBLE)
                           < (1.0 / 3.0) THEN 'head'
                         WHEN CAST(coalesce(sum(c) OVER (PARTITION BY lang
                             ORDER BY mean_logprob DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
                           / CAST(sum(c) OVER (PARTITION BY lang) AS DOUBLE)
                           < (2.0 / 3.0) THEN 'middle'
                         ELSE 'tail' END AS bucket
                  FROM hist)
       SELECT doc_id, lang, mean_logprob, bucket
       FROM sl JOIN cut USING (lang, mean_logprob)
       ORDER BY doc_id"""

  private lazy val t30ScoreCte: String =
    """WITH tk AS (SELECT doc_id, lang = 'en' AS lm,
               list_filter(string_split_regex(lower(text), '\s+'),
                 t -> len(t) > 0) AS toks FROM documents),
          pr AS (SELECT doc_id, lm, toks[i] AS w1, toks[i+1] AS w2
                 FROM (SELECT doc_id, lm, toks,
                         unnest(range(1, len(toks))) AS i FROM tk)
                 WHERE len(toks) >= 2),
          bc AS (SELECT w1, w2, count(*) AS nb FROM pr WHERE lm GROUP BY 1, 2),
          pc AS (SELECT w1, count(*) AS np FROM pr WHERE lm GROUP BY 1),
          un AS (SELECT w2, count(*) AS nu FROM (
                   SELECT unnest(toks) AS w2 FROM tk WHERE lm) GROUP BY 1),
          tot AS (SELECT sum(nu) AS n, count(*) AS v FROM un),
          sc AS (SELECT p.doc_id,
                   CASE WHEN b.nb IS NOT NULL
                     THEN round(ln(CAST(b.nb AS DOUBLE) / CAST(c.np AS DOUBLE)), 6)
                     ELSE round(ln(0.4 *
                       (CAST(coalesce(u.nu, 0) + 1 AS DOUBLE)
                        / CAST(t.n + t.v AS DOUBLE))), 6) END AS lp
                 FROM pr p
                 LEFT JOIN bc b ON b.w1 = p.w1 AND b.w2 = p.w2
                 LEFT JOIN pc c ON c.w1 = p.w1
                 LEFT JOIN un u ON u.w2 = p.w2
                 CROSS JOIN tot t)"""

  /** CMS oracle: rebuilds the Count-Min grid in SQL with the same
    * portable row hashes ((first 4 md5 hex digits of "r:item") mod w)
    * and takes the same min-over-rows estimate — bit-for-bit against
    * the JVM aggregate.
    */
  private lazy val t20Oracle: String = {
    def dg(p: Int) = s"(instr('0123456789abcdef', substr(h, $p, 1)) - 1)"
    val hex4 = (1 to 4).map(dg).reduce((a, b) => s"($a * 16 + $b)")
    s"""WITH tk AS (SELECT tok FROM (
                SELECT unnest(string_split_regex(lower(text), '\\s+')) AS tok
                FROM documents) WHERE len(tok) > 0),
            rb AS (SELECT r, $hex4 % 1024 AS bkt FROM (
                     SELECT r, md5(CAST(r AS VARCHAR) || ':' || tok) AS h
                     FROM tk CROSS JOIN (SELECT unnest(range(4)) AS r))),
            bc AS (SELECT r, bkt, count(*) AS c FROM rb GROUP BY 1, 2),
            probe(term) AS (VALUES ('hash'), ('join'), ('batch'), ('the'),
                                   ('nosuchtoken')),
            pb AS (SELECT term, r, $hex4 % 1024 AS bkt FROM (
                     SELECT term, r, md5(CAST(r AS VARCHAR) || ':' || term) AS h
                     FROM probe CROSS JOIN (SELECT unnest(range(4)) AS r))),
            est AS (SELECT term, min(coalesce(c, 0)) AS est
                    FROM pb LEFT JOIN bc USING (r, bkt) GROUP BY 1),
            ex AS (SELECT tok AS term, count(*) AS exact FROM tk GROUP BY 1)
         SELECT term, CAST(est AS BIGINT) AS est,
                CAST(coalesce(exact, 0) AS BIGINT) AS exact
         FROM est LEFT JOIN ex USING (term) ORDER BY term"""
  }

  /** Quality-classifier oracle: the p07 feature/bucket SQL with a
    * seed-vs-rest contrast — per-bucket naive-Bayes log-odds, doc
    * prior, DECIMAL-summed per-doc scores, keep = score > 0.
    */
  private lazy val t21Oracle: String = {
    def dg(p: Int) = s"(instr('0123456789abcdef', substr(h, $p, 1)) - 1)"
    val bucket = s"((${dg(1)} * 16 + ${dg(2)}) * 16 + ${dg(3)})"
    s"""WITH tk AS (SELECT doc_id, (doc_id % 50 = 0) AS pos, list_filter(
                string_split_regex(lower(text), '\\s+'),
                t -> len(t) > 0) AS toks FROM documents),
            uni AS (SELECT doc_id, pos, unnest(toks) AS f FROM tk),
            bi AS (SELECT doc_id, pos, toks[i] || ' ' || toks[i+1] AS f
                   FROM (SELECT doc_id, pos, toks,
                           unnest(range(1, len(toks))) AS i FROM tk)
                   WHERE len(toks) >= 2),
            feats AS (SELECT doc_id, pos, $bucket AS b
                      FROM (SELECT doc_id, pos, md5(f) AS h
                            FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi))),
            counts AS (SELECT b, count(CASE WHEN pos THEN 1 END) AS cp,
                              count(CASE WHEN NOT pos THEN 1 END) AS cn
                       FROM feats GROUP BY 1),
            tot AS (SELECT sum(cp) AS np, sum(cn) AS nn FROM counts),
            w AS (SELECT b, round(ln(
                     (CAST(cp + 1 AS DOUBLE) / CAST(np + 4096 AS DOUBLE))
                     / (CAST(cn + 1 AS DOUBLE) / CAST(nn + 4096 AS DOUBLE))), 6) AS w
                  FROM counts CROSS JOIN tot),
            prior AS (SELECT round(ln(
                     CAST(count(CASE WHEN pos THEN 1 END) + 1 AS DOUBLE)
                     / CAST(count(CASE WHEN NOT pos THEN 1 END) + 1 AS DOUBLE)), 6) AS pw
                  FROM tk),
            sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feats,
                     round(CAST(sum(CAST(w AS DECIMAL(24,8)))
                                + CAST(pw AS DECIMAL(24,8)) AS DOUBLE), 6) AS score
                   FROM feats JOIN w USING (b) CROSS JOIN prior
                   GROUP BY doc_id, pw)
         SELECT doc_id, n_feats, score, score > 0 AS keep
         FROM sc ORDER BY doc_id"""
  }

  /** Gopher-repetition oracle: same framing, same line/char/n-gram
    * conventions (occurrence-sum duplicates, top ties to the
    * lexicographically first gram), same rounded thresholds.
    */
  private lazy val t22Oracle: String = {
    val topFracs = Seq(2, 3, 4).map(n =>
      s"round(CAST(coalesce(t$n, 0) AS DOUBLE) / tc, 6) AS top_${n}gram_char_frac")
    val dupFracs = (5 to 10).map(n =>
      s"round(CAST(coalesce(d$n, 0) AS DOUBLE) / tc, 6) AS dup_${n}gram_char_frac")
    val pivTop = Seq(2, 3, 4).map(n => s"max(CASE WHEN n = $n THEN topc END) AS t$n")
    val pivDup = (5 to 10).map(n => s"max(CASE WHEN n = $n THEN dupc END) AS d$n")
    val dupThr = Map(5 -> 0.15, 6 -> 0.14, 7 -> 0.13, 8 -> 0.12, 9 -> 0.11, 10 -> 0.10)
    val passDup = (5 to 10).map(n =>
      s"round(CAST(coalesce(d$n, 0) AS DOUBLE) / tc, 6) <= ${dupThr(n)}").mkString(" AND ")
    s"""WITH framed AS (SELECT doc_id,
               'subscribe to our newsletter today for free updates' || chr(10) ||
               text ||
               CASE WHEN doc_id % 7 = 0 THEN chr(10) || text ELSE '' END AS text
             FROM documents),
            ln AS (SELECT doc_id, string_split(text, chr(10)) AS lines,
                     CAST(greatest(len(text), 1) AS DOUBLE) AS tc,
                     list_filter(string_split_regex(lower(text), '\\s+'),
                       t -> len(t) > 0) AS toks
                   FROM framed),
            lstat AS (SELECT doc_id, tc, toks,
                     round(CAST(len(lines) - len(list_distinct(lines)) AS DOUBLE)
                       / greatest(len(lines), 1), 6) AS dlf,
                     round(CAST(list_aggregate(list_transform(lines, l -> len(l)), 'sum')
                         - list_aggregate(list_transform(list_distinct(lines), l -> len(l)), 'sum')
                         AS DOUBLE)
                       / greatest(list_aggregate(list_transform(lines, l -> len(l)), 'sum'), 1),
                       6) AS dlcf
                   FROM ln),
            grams AS (SELECT doc_id, n,
                     array_to_string(toks[i:i+n-1], ' ') AS g
                   FROM (SELECT doc_id, toks, n, unnest(range(1, len(toks) - n + 2)) AS i
                         FROM lstat CROSS JOIN (SELECT unnest(range(2, 11)) AS n)
                         WHERE len(toks) >= n)),
            cnt AS (SELECT doc_id, n, g, count(*) AS c FROM grams GROUP BY 1, 2, 3),
            ranked AS (SELECT doc_id, n, c * len(g) AS topc,
                     row_number() OVER (PARTITION BY doc_id, n ORDER BY c DESC, g) AS rn
                   FROM cnt),
            dup AS (SELECT doc_id, n,
                     sum(CASE WHEN c >= 2 THEN c * len(g) END) AS dupc
                   FROM cnt GROUP BY 1, 2),
            pern AS (SELECT r.doc_id, r.n, r.topc, d.dupc
                   FROM ranked r JOIN dup d USING (doc_id, n) WHERE r.rn = 1),
            piv AS (SELECT doc_id, ${(pivTop ++ pivDup).mkString(", ")}
                   FROM pern GROUP BY 1)
         SELECT doc_id, dlf AS dup_line_frac, dlcf AS dup_line_char_frac,
                ${(topFracs ++ dupFracs).mkString(", ")},
                (dlf <= 0.30 AND dlcf <= 0.20
                 AND round(CAST(coalesce(t2, 0) AS DOUBLE) / tc, 6) <= 0.20
                 AND round(CAST(coalesce(t3, 0) AS DOUBLE) / tc, 6) <= 0.18
                 AND round(CAST(coalesce(t4, 0) AS DOUBLE) / tc, 6) <= 0.16
                 AND $passDup) AS pass
         FROM lstat JOIN piv USING (doc_id) ORDER BY doc_id"""
  }

  /** Bloom-decontamination oracle: rebuilds the IDENTICAL portable
    * bitmap — the same 3 bit positions per shingle (first 5 md5 hex
    * digits of "r:shingle" = 20 bits, the full 2^20 range) — as a
    * distinct (r, pos) set, then declares a training shingle
    * bloom-positive iff all 3 of its positions are in the set. False
    * positives reproduce exactly, so the sweep hash-matches.
    */
  private lazy val d19Oracle: String = {
    def dg(p: Int) = s"(instr('0123456789abcdef', substr(h, $p, 1)) - 1)"
    val hex5 = (1 to 5).map(dg).reduce((a, b) => s"($a * 16 + $b)")
    s"""WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
                   FROM documents),
            sh AS (SELECT DISTINCT doc_id,
                     toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
                   FROM (SELECT doc_id, toks,
                           unnest(range(1, len(toks) - 1)) AS i FROM t)),
            bits AS (SELECT DISTINCT r, $hex5 AS pos FROM (
                       SELECT r, md5(CAST(r AS VARCHAR) || ':' || shingle) AS h
                       FROM (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0)
                       CROSS JOIN (SELECT unnest(range(3)) AS r))),
            pr AS (SELECT doc_id, shingle, r, $hex5 AS pos FROM (
                     SELECT doc_id, shingle, r,
                            md5(CAST(r AS VARCHAR) || ':' || shingle) AS h
                     FROM sh CROSS JOIN (SELECT unnest(range(3)) AS r)
                     WHERE doc_id % 50 <> 0)),
            hitsh AS (SELECT doc_id, shingle FROM pr JOIN bits USING (r, pos)
                      GROUP BY 1, 2 HAVING count(*) = 3)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS bloom_hits
         FROM hitsh GROUP BY 1 HAVING count(*) >= 5 ORDER BY 1"""
  }

  /** Winnowing oracle: identical 32-bit md5-prefix gram hash, the
    * same h·2³¹ + (2³¹−1−pos) pack (so MIN = min hash, rightmost
    * position), a w-row window frame, and the same distinct-hash
    * pair count.
    */
  private lazy val d17Oracle: String = {
    def dg(p: Int) = s"(instr('0123456789abcdef', substr(h, $p, 1)) - 1)"
    val h32 = (1 to 8).map(dg).reduce((a, b) => s"($a * 16 + $b)")
    s"""WITH t AS (SELECT doc_id, list_filter(
                string_split_regex(lower(text), '\\s+'),
                t -> len(t) > 0) AS toks
              FROM documents WHERE doc_id < 500),
            g AS (SELECT doc_id, i - 1 AS start,
                         md5(toks[i] || ' ' || toks[i+1] || ' ' ||
                             toks[i+2] || ' ' || toks[i+3]) AS h
                  FROM (SELECT doc_id, toks,
                          unnest(range(1, len(toks) - 2)) AS i FROM t)
                  WHERE len(toks) >= 4),
            e AS (SELECT doc_id, start,
                         $h32 * 2147483648 + (2147483647 - start) AS enc
                  FROM g),
            win AS (SELECT doc_id,
                      min(enc) OVER (PARTITION BY doc_id ORDER BY start
                        ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin,
                      count(*) OVER (PARTITION BY doc_id ORDER BY start
                        ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wn
                    FROM e),
            fp AS (SELECT DISTINCT doc_id, wmin // 2147483648 AS fh
                   FROM win WHERE wn = 4)
         SELECT a.doc_id AS id1, b.doc_id AS id2,
                CAST(count(*) AS BIGINT) AS n_shared
         FROM fp a JOIN fp b ON a.fh = b.fh AND a.doc_id < b.doc_id
         GROUP BY 1, 2 HAVING count(*) >= 2
         ORDER BY id1, id2"""
  }

  private lazy val d12Oracle: String = {
    def dg(p: Int) = s"(instr('0123456789abcdef', substr(h, $p, 1)) - 1)"
    def chunk(k: Int) =
      s"((((${dg(4 * k + 1)}) * 16 + ${dg(4 * k + 2)}) * 16 + ${dg(4 * k + 3)}) * 16 + ${dg(4 * k + 4)})"
    val sumCols = (for (k <- 0 to 3; j <- 0 to 15) yield
      s"sum(cnt * ((CAST(floor(c$k / ${1 << (15 - j)}) AS INT) % 2) * 2 - 1)) AS s${k}_$j")
      .mkString(", ")
    val fCols = (0 to 3).map { k =>
      (0 to 15).map(j => s"CASE WHEN s${k}_$j > 0 THEN ${1 << (15 - j)} ELSE 0 END")
        .mkString("(", " + ", s") AS f$k")
    }.mkString(", ")
    val ham = "bit_count(xor(a0, b0)) + bit_count(xor(a1, b1)) " +
      "+ bit_count(xor(a2, b2)) + bit_count(xor(a3, b3))"
    raw"""WITH toks AS (SELECT doc_id, tok, count(*) AS cnt
                    FROM (SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
                          FROM documents WHERE doc_id < 500)
                    GROUP BY 1, 2),
         hx AS (SELECT doc_id, cnt, md5(tok) AS h FROM toks),
         ch AS (SELECT doc_id, cnt, ${chunk(0)} AS c0, ${chunk(1)} AS c1,
                       ${chunk(2)} AS c2, ${chunk(3)} AS c3 FROM hx),
         sums AS (SELECT doc_id, $sumCols FROM ch GROUP BY doc_id),
         fps AS (SELECT doc_id, $fCols FROM sums),
         bands AS (SELECT doc_id, f0, f1, f2, f3, k,
                          CASE k WHEN 0 THEN f0 WHEN 1 THEN f1 WHEN 2 THEN f2 ELSE f3 END AS bh
                   FROM fps CROSS JOIN (SELECT unnest(range(4)) AS k)),
         cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
                         a.f0 AS a0, a.f1 AS a1, a.f2 AS a2, a.f3 AS a3,
                         b.f0 AS b0, b.f1 AS b1, b.f2 AS b2, b.f3 AS b3
                  FROM bands a JOIN bands b
                    ON a.k = b.k AND a.bh = b.bh AND a.doc_id < b.doc_id)
     SELECT id1, id2, CAST($ham AS BIGINT) AS hamming
     FROM cand WHERE $ham <= 3
     ORDER BY id1, id2"""
  }

  def oracleSql: Map[String, String] = Map(
    "d12_simhash_portable" -> d12Oracle,
    "d07_keep_best" -> (ngramShingleCte.replaceFirst("WITH", "WITH RECURSIVE") +
      s""",
         pairs AS (SELECT id1, id2 FROM inter
                   JOIN sz s1 ON s1.doc_id = id1 JOIN sz s2 ON s2.doc_id = id2
                   WHERE CAST(n AS DOUBLE) / CAST(s1.sz + s2.sz - n AS DOUBLE) >= 0.5),
         edges AS (SELECT id1 AS a, id2 AS b FROM pairs
                   UNION SELECT id2, id1 FROM pairs),
         reach(a, b) AS (SELECT a, b FROM edges
                         UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         comp AS (SELECT a AS id, least(a, min(b)) AS component FROM reach GROUP BY a),
         q AS ($qualitySubSql),
         lab AS (SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component, q.quality
                 FROM (SELECT doc_id FROM documents WHERE doc_id < 500) d
                 LEFT JOIN comp c ON c.id = d.doc_id
                 JOIN q ON q.doc_id = d.doc_id)
         SELECT doc_id, component, quality FROM (
           SELECT doc_id, component, quality,
                  row_number() OVER (PARTITION BY component
                    ORDER BY quality DESC, doc_id) AS rk
           FROM lab) WHERE rk = 1
         ORDER BY doc_id"""),

    "d21_semantic_decontaminate" ->
      """WITH q AS (SELECT vec_id AS eid, embedding AS qe FROM embeddings
                    WHERE vec_id < 20),
            c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings
                  WHERE vec_id >= 20),
            u AS (SELECT cid, eid, CAST(unnest(ce) AS DOUBLE) AS x,
                         CAST(unnest(qe) AS DOUBLE) AS y
                  FROM (SELECT cid, eid, ce, qe FROM c, q)),
            s AS (SELECT cid, eid,
                         round(sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))), 6)
                           AS cos
                  FROM u GROUP BY 1, 2),
            best AS (SELECT cid, eid, cos FROM (
                       SELECT cid, eid, cos, row_number() OVER (
                         PARTITION BY cid ORDER BY cos DESC, eid) AS rn FROM s)
                     WHERE rn = 1)
         SELECT cid AS vec_id, eid AS eval_id, cos FROM best
         WHERE cos >= 0.35 ORDER BY vec_id""",

    "d08_decontaminate" ->
      """WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
                    FROM documents),
            sh AS (SELECT DISTINCT doc_id,
                     toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
                   FROM (SELECT doc_id, toks,
                           unnest(range(1, len(toks) - 1)) AS i FROM t)),
            hit AS (SELECT a.doc_id AS tid, b.doc_id AS bid, count(*) AS ov
                    FROM sh a JOIN sh b ON a.shingle = b.shingle
                    WHERE a.doc_id % 50 <> 0 AND b.doc_id % 50 = 0
                    GROUP BY 1, 2 HAVING count(*) >= 5)
         SELECT tid AS doc_id, CAST(count(*) AS BIGINT) AS n_bench_hits,
                CAST(max(ov) AS BIGINT) AS max_overlap
         FROM hit GROUP BY 1 ORDER BY 1""",

    "d22_source_overlap" ->
      """WITH t AS (SELECT source, string_split_regex(lower(text), '\s+') AS toks
                    FROM documents),
            sh AS (SELECT DISTINCT source,
                     md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS h
                   FROM (SELECT source, toks,
                           unnest(range(1, len(toks) - 1)) AS i FROM t)),
            bk AS (SELECT source, h FROM (
                     SELECT source, h,
                            row_number() OVER (PARTITION BY source ORDER BY h) AS r
                     FROM sh) WHERE r <= 128),
            srcs AS (SELECT DISTINCT source FROM bk),
            m AS (SELECT least(bk.source, s.source) AS s1,
                         greatest(bk.source, s.source) AS s2, bk.h,
                         max(bk.source < s.source) AS in1,
                         max(bk.source > s.source) AS in2
                  FROM bk, srcs s WHERE bk.source <> s.source
                  GROUP BY 1, 2, 3),
            rk AS (SELECT s1, s2, in1, in2,
                          row_number() OVER (PARTITION BY s1, s2 ORDER BY h) AS r
                   FROM m)
         SELECT s1, s2, CAST(count(*) AS BIGINT) AS k_eff,
                CAST(sum(CASE WHEN in1 AND in2 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_common,
                round(sum(CASE WHEN in1 AND in2 THEN 1 ELSE 0 END)::DOUBLE
                      / count(*), 6) AS jaccard_est
         FROM rk WHERE r <= 128 GROUP BY 1, 2 ORDER BY 1, 2""",

    "t08_repetition" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
                       FROM documents),
            u AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
            us AS (SELECT doc_id,
                          CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS tf,
                          CAST(sum(c) AS BIGINT) AS n_toks
                   FROM u GROUP BY 1),
            tl AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS t
                   FROM documents),
            bg AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS big
                   FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM tl)),
            b AS (SELECT doc_id, big, count(*) AS c FROM bg GROUP BY 1, 2),
            bs AS (SELECT doc_id, CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS bf
                   FROM b GROUP BY 1)
         SELECT us.doc_id, n_toks, round(tf, 6) AS top_tok_frac,
                round(coalesce(bs.bf, 0.0), 6) AS top_bigram_frac
         FROM us LEFT JOIN bs ON us.doc_id = bs.doc_id
         ORDER BY us.doc_id""",

    "r11_hash_sample" ->
      """SELECT event_id, event_type AS etype, value FROM events
         WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 2) < '1a'
         ORDER BY event_id""",

    "r12_sessionize" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
                    FROM events),
            g AS (SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
                              OR ts_us - lag(ts_us) OVER w > 1800000000
                            THEN 1 ELSE 0 END AS brk
                  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
            s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
                    ORDER BY ts_us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session
                  FROM g)
         SELECT user_id, CAST(session AS BIGINT) AS session,
                min(ts_us) AS start_us, max(ts_us) AS end_us,
                CAST(count(*) AS BIGINT) AS n_events,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM s GROUP BY 1, 2 ORDER BY 1, 2""",

    "q31_retention" ->
      """WITH uw AS (SELECT DISTINCT user_id,
                       epoch_us(ts) // 604800000000 AS wk FROM events),
            fw AS (SELECT user_id, min(wk) AS cohort FROM uw GROUP BY 1)
         SELECT CAST(f.cohort AS BIGINT) AS cohort_week,
                CAST(u.wk - f.cohort AS BIGINT) AS week_offset,
                CAST(count(*) AS BIGINT) AS n_users
         FROM uw u JOIN fw f USING (user_id)
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "r21_session_paths" ->
      // r12's session CTE + ordered string_agg of each session's
      // first-8 event types; same (count desc, path) top-20
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type
                    FROM events),
            g AS (SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
                              OR ts_us - lag(ts_us) OVER w > 1800000000
                            THEN 1 ELSE 0 END AS brk
                  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
            s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
                    ORDER BY ts_us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session
                  FROM g),
            x AS (SELECT *, row_number() OVER (PARTITION BY user_id, session
                    ORDER BY ts_us, event_id) AS rn FROM s),
            p AS (SELECT user_id, session,
                    string_agg(event_type, '>' ORDER BY rn) AS path
                  FROM x WHERE rn <= 8 GROUP BY 1, 2),
            c AS (SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
                  FROM p GROUP BY 1)
         SELECT path, n_sessions FROM (
           SELECT *, row_number() OVER (ORDER BY n_sessions DESC, path) AS rk
           FROM c)
         WHERE rk <= 20 ORDER BY n_sessions DESC, path""",

    "d09_blocklist" ->
      """SELECT doc_id, source FROM documents
         WHERE text NOT IN (SELECT text FROM documents WHERE doc_id % 97 = 0)
         ORDER BY doc_id""",

    "r13_stratified" ->
      """SELECT doc_id, source FROM documents
         WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
               CASE WHEN source = 'src0' THEN '40' ELSE '1a' END
         ORDER BY doc_id""",

    "r27_seasonal_baseline" ->
      """WITH h AS (SELECT event_type AS key, epoch_us(ts) // 3600000000 AS hr,
                           CAST(count(*) AS BIGINT) AS c
                    FROM events GROUP BY 1, 2),
            b AS (SELECT min(hr) AS h0,
                         greatest(min(hr), max(hr) - 167) AS hb FROM h),
            hi AS (SELECT key, hr % 168 AS how, CAST(sum(c) AS BIGINT) AS n_hist
                   FROM h, b WHERE hr < hb GROUP BY 1, 2),
            la AS (SELECT key, hr % 168 AS how, CAST(sum(c) AS BIGINT) AS n_last
                   FROM h, b WHERE hr >= hb GROUP BY 1, 2),
            j AS (SELECT coalesce(hi.key, la.key) AS key,
                         coalesce(hi.how, la.how) AS how,
                         coalesce(n_hist, 0) AS n_hist,
                         coalesce(n_last, 0) AS n_last
                  FROM hi FULL OUTER JOIN la
                    ON la.key = hi.key AND la.how = hi.how),
            sl AS (SELECT j.*, ((b.hb - b.h0) // 168) +
                     (CASE WHEN ((j.how - (b.h0 % 168) + 168) % 168)
                                < ((b.hb - b.h0) % 168)
                           THEN 1 ELSE 0 END) AS slots_hist
                   FROM j, b)
         SELECT key AS event_type, how, n_hist, CAST(slots_hist AS BIGINT) AS slots_hist,
                CASE WHEN slots_hist > 0
                     THEN round(CAST(n_hist AS DOUBLE) / CAST(slots_hist AS DOUBLE), 6)
                END AS baseline_mean,
                n_last,
                CASE WHEN slots_hist > 0
                     THEN round((CAST(n_last AS DOUBLE) + 1.0) /
                            (round(CAST(n_hist AS DOUBLE) / CAST(slots_hist AS DOUBLE), 6)
                             + 1.0), 6)
                END AS ratio
         FROM sl ORDER BY event_type, how""",

    "r26_burn_rate" ->
      """WITH h AS (SELECT epoch_us(ts) // 3600000000 AS hr,
                           CAST(count(*) AS BIGINT) AS n,
                           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS e
                    FROM events GROUP BY 1),
            mx AS (SELECT max(hr) AS mx FROM h),
            w(window_hours) AS (VALUES (1), (6), (24), (72)),
            a AS (SELECT w.window_hours,
                         CAST(sum(h.n) AS BIGINT) AS n_total,
                         CAST(sum(h.e) AS BIGINT) AS n_errors
                  FROM h CROSS JOIN mx CROSS JOIN w
                  WHERE h.hr > mx.mx - w.window_hours
                  GROUP BY 1)
         SELECT CAST(window_hours AS INTEGER) AS window_hours, n_total, n_errors,
                round(CAST(n_errors AS DOUBLE) / CAST(n_total AS DOUBLE), 6) AS err_rate,
                round((CAST(n_errors AS DOUBLE) / CAST(n_total AS DOUBLE))
                      / 0.0050000000000000044, 6) AS burn_rate,
                round((CAST(n_errors AS DOUBLE) / CAST(n_total AS DOUBLE))
                      / 0.0050000000000000044, 6) >= 14.4 AS page
         FROM a ORDER BY window_hours""",

    "r14_rate_alert" ->
      """SELECT * FROM (
           SELECT (epoch_us(ts) // 3600000000) * 3600 AS window_start,
                  CAST(count(*) AS BIGINT) AS n_events,
                  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
                  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE)
                    / CAST(count(*) AS DOUBLE) AS error_rate
           FROM events GROUP BY 1)
         WHERE CAST(n_errors AS DOUBLE) / CAST(n_events AS DOUBLE) > 0.25
         ORDER BY window_start""",

    "r33_spike_attribution" ->
      // the r16 chain verbatim on the constant-key global rate, then
      // the r32 share/z formulas between the two hour classes
      """WITH h AS (SELECT epoch_us(ts) // 3600000000 AS hr, count(*) AS c
                    FROM events GROUP BY 1),
            r AS (SELECT hr, c, count(*) OVER w AS tn,
                    sum(c) OVER w AS tsum,
                    sum(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))) OVER w AS tss
                  FROM h
                  WINDOW w AS (ORDER BY hr
                               RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING)),
            sc AS (SELECT hr, c,
                     CAST(tsum AS DOUBLE) / CAST(tn AS DOUBLE) AS m,
                     CAST(tss AS DOUBLE) / CAST(tn AS DOUBLE)
                       - (CAST(tsum AS DOUBLE) / CAST(tn AS DOUBLE))
                         * (CAST(tsum AS DOUBLE) / CAST(tn AS DOUBLE)) AS v
                   FROM r WHERE tn >= 12),
            z AS (SELECT hr,
                    CASE WHEN v > 0.0 THEN (CAST(c AS DOUBLE) - m) / sqrt(v)
                         WHEN CAST(c AS DOUBLE) = m THEN 0.0 END AS zs
                  FROM sc),
            vd AS (SELECT hr, (coalesce(abs(zs) >= 3.0, false)
                               OR zs IS NULL) AS an FROM z),
            kh AS (SELECT event_type AS key, epoch_us(ts) // 3600000000 AS hr,
                     CAST(count(*) AS BIGINT) AS c
                   FROM events GROUP BY 1, 2),
            k AS (SELECT kh.key,
                    CAST(sum(CASE WHEN vd.an THEN kh.c ELSE 0 END) AS BIGINT)
                      AS n_anom,
                    CAST(sum(CASE WHEN NOT vd.an THEN kh.c ELSE 0 END) AS BIGINT)
                      AS n_norm
                  FROM kh JOIN vd USING (hr) GROUP BY 1),
            t AS (SELECT CAST(sum(n_anom) AS BIGINT) AS ta,
                         CAST(sum(n_norm) AS BIGINT) AS tn2 FROM k),
            x AS (SELECT k.*, t.ta, t.tn2,
                    CAST(n_anom AS DOUBLE) / CAST(ta AS DOUBLE) AS sa,
                    CAST(n_norm AS DOUBLE) / CAST(tn2 AS DOUBLE) AS sn,
                    CAST(n_anom + n_norm AS DOUBLE)
                      / CAST(ta + tn2 AS DOUBLE) AS p
                  FROM k CROSS JOIN t WHERE t.ta > 0)
         SELECT key AS event_type, n_anom, n_norm,
                round(sa, 6) AS share_anom, round(sn, 6) AS share_norm,
                CASE WHEN n_norm = 0 THEN NULL
                     ELSE round(sa / sn, 6) END AS lift,
                round(CAST(n_anom AS DOUBLE) - CAST(ta AS DOUBLE) * sn, 6)
                  AS excess,
                CASE WHEN tn2 = 0 OR p = 0.0 OR p = 1.0 THEN NULL
                     ELSE round((sa - sn) / sqrt(p * (1.0 - p)
                       * (1.0 / CAST(ta AS DOUBLE) + 1.0 / CAST(tn2 AS DOUBLE))), 6)
                END AS z_score
         FROM x ORDER BY event_type""",

    "r32_canary_compare" ->
      // the same (key, hour) histogram + conditional window sums;
      // every division replayed in the identical association order
      """WITH h AS (SELECT event_type AS key,
                           epoch_us(ts) // 3600000000 AS hr,
                           CAST(count(*) AS BIGINT) AS n
                    FROM events GROUP BY 1, 2),
            a AS (SELECT max(hr) AS mx FROM h),
            k AS (SELECT h.key,
                    CAST(sum(CASE WHEN h.hr <= a.mx - 168 THEN h.n ELSE 0 END)
                      AS BIGINT) AS n_before,
                    CAST(sum(CASE WHEN h.hr > a.mx - 168 THEN h.n ELSE 0 END)
                      AS BIGINT) AS n_after
                  FROM h CROSS JOIN a WHERE h.hr > a.mx - 672
                  GROUP BY 1),
            t AS (SELECT CAST(sum(n_before) AS BIGINT) AS tb,
                         CAST(sum(n_after) AS BIGINT) AS ta FROM k),
            x AS (SELECT k.*, t.tb, t.ta,
                    CAST(n_before AS DOUBLE) / CAST(tb AS DOUBLE) AS pb,
                    CAST(n_after AS DOUBLE) / CAST(ta AS DOUBLE) AS pa,
                    CAST(n_before + n_after AS DOUBLE)
                      / CAST(tb + ta AS DOUBLE) AS p
                  FROM k CROSS JOIN t)
         SELECT key AS event_type, n_before, n_after,
                round(CAST(n_before AS DOUBLE) / 504.0, 6) AS rate_before,
                round(CAST(n_after AS DOUBLE) / 168.0, 6) AS rate_after,
                CASE WHEN n_before = 0 THEN NULL
                     ELSE round((CAST(n_after AS DOUBLE) / 168.0)
                                / (CAST(n_before AS DOUBLE) / 504.0), 6)
                END AS rate_ratio,
                round(pb, 6) AS share_before,
                round(pa, 6) AS share_after,
                CASE WHEN tb = 0 OR ta = 0 OR p = 0.0 OR p = 1.0 THEN NULL
                     ELSE round((pa - pb) / sqrt(p * (1.0 - p)
                       * (1.0 / CAST(tb AS DOUBLE) + 1.0 / CAST(ta AS DOUBLE))), 6)
                END AS z_score
         FROM x ORDER BY event_type""",

    "r31_budget_status" ->
      // same histogram + conditional aggregates; rate expressions in
      // the identical association order, budget literal bit-shared
      """WITH h AS (SELECT epoch_us(ts) // 3600000000 AS hr,
                           CAST(count(*) AS BIGINT) AS n,
                           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                             AS BIGINT) AS e
                    FROM events GROUP BY 1),
            a AS (SELECT max(hr) AS mx, min(hr) AS mn FROM h),
            g AS (SELECT a.mx, a.mn,
                    CAST(sum(h.n) AS BIGINT) AS n_total,
                    CAST(sum(h.e) AS BIGINT) AS n_errors,
                    CAST(sum(CASE WHEN h.hr > a.mx - 168 THEN h.n ELSE 0 END)
                      AS BIGINT) AS rn,
                    CAST(sum(CASE WHEN h.hr > a.mx - 168 THEN h.e ELSE 0 END)
                      AS BIGINT) AS re
                  FROM h CROSS JOIN a WHERE h.hr > a.mx - 720
                  GROUP BY 1, 2),
            x AS (SELECT *, least(mx - mn + 1, 720) AS elapsed,
                    CAST(n_errors AS DOUBLE) / CAST(n_total AS DOUBLE) AS rate,
                    CAST(re AS DOUBLE) / CAST(rn AS DOUBLE)
                      / 0.0050000000000000044 AS rb
                  FROM g),
            y AS (SELECT *, rate / 0.0050000000000000044
                    * CAST(elapsed AS DOUBLE) / 720.0 AS used
                  FROM x)
         SELECT CAST(720 AS BIGINT) AS period_hours,
                CAST(elapsed AS BIGINT) AS elapsed_hours,
                n_total, n_errors, round(rate, 6) AS err_rate,
                round(used, 6) AS budget_used_frac,
                round(rb, 6) AS recent_burn,
                CASE WHEN re = 0 THEN NULL
                     ELSE round(greatest((1.0 - used) * 720.0 / rb, 0.0), 6)
                END AS hours_to_exhaustion,
                used >= 1.0 AS exhausted
         FROM y""",

    "r30_cusum" ->
      // same closed-form chart: baseline integer micros over the
      // first 24 present hours, prefix sums of (count - allowance),
      // running min, S = P - min(0, Pmin); all-integer until output
      """WITH h AS (SELECT event_type AS key, epoch_us(ts) // 3600000000 AS hr,
                           CAST(count(*) AS BIGINT) AS c
                    FROM events GROUP BY 1, 2),
            b AS (SELECT key, hr, c, min(hr) OVER (PARTITION BY key) AS h0 FROM h),
            b2 AS (SELECT key, hr, c, h0,
                     sum(CASE WHEN hr < h0 + 24 THEN 1 ELSE 0 END)
                       OVER (PARTITION BY key) AS nb,
                     sum(CASE WHEN hr < h0 + 24 THEN c ELSE 0 END)
                       OVER (PARTITION BY key) AS bs
                   FROM b),
            s AS (SELECT key, hr, c, (bs * 1000000) // nb AS bm
                  FROM b2 WHERE hr >= h0 + 24),
            p AS (SELECT key, hr, c, bm,
                    sum(c * 1000000 - (bm + bm // 4)) OVER (
                      PARTITION BY key ORDER BY hr ROWS UNBOUNDED PRECEDING) AS pp
                  FROM s),
            q AS (SELECT key, hr, c, bm, pp,
                    min(pp) OVER (PARTITION BY key ORDER BY hr
                      ROWS UNBOUNDED PRECEDING) AS pmin
                  FROM p)
         SELECT key AS event_type, hr * 3600 AS hr_start,
                c AS n_events, CAST(bm AS BIGINT) AS baseline_micros,
                CAST(pp - least(pmin, 0) AS BIGINT) AS cusum_micros,
                (pp - least(pmin, 0)) > bm * 5 AS is_change
         FROM q ORDER BY event_type, hr_start""",

    "r16_rate_anomaly" ->
      """WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr, count(*) AS c
                FROM events GROUP BY 1, 2),
            r AS (SELECT event_type, hr, c,
                    count(*) OVER w AS tn,
                    sum(c) OVER w AS tsum,
                    sum(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))) OVER w AS tss
                  FROM h
                  WINDOW w AS (PARTITION BY event_type ORDER BY hr
                               RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING)),
            sc AS (SELECT event_type, hr * 3600 AS hr_start, c,
                     CAST(tsum AS DOUBLE) / CAST(tn AS DOUBLE) AS m,
                     CAST(tss AS DOUBLE) / CAST(tn AS DOUBLE)
                       - (CAST(tsum AS DOUBLE) / CAST(tn AS DOUBLE))
                         * (CAST(tsum AS DOUBLE) / CAST(tn AS DOUBLE)) AS v
                   FROM r WHERE tn >= 12),
            z AS (SELECT event_type, hr_start, c, m,
                    CASE WHEN v > 0.0 THEN (CAST(c AS DOUBLE) - m) / sqrt(v)
                         WHEN CAST(c AS DOUBLE) = m THEN 0.0 END AS zs
                  FROM sc)
         SELECT event_type, hr_start, CAST(c AS BIGINT) AS n_events,
                round(m, 6) AS mean_trailing,
                round(zs, 6) AS z_score,
                (coalesce(abs(zs) >= 3.0, false) OR zs IS NULL) AS is_anomaly
         FROM z ORDER BY event_type, hr_start""",

    "r24_rare_transitions" ->
      // per-user lag over the identically-masked lines, transition
      // counts, share of the source's outgoing edges, the same flag
      """WITH lines AS (
           SELECT user_id, ts, event_id,
                  'id=' || event_id || ' ts=' || strftime(ts, '%Y-%m-%d %H:%M:%S')
               || ' user=' || user_id || ' type=' || event_type
               || ' value=' || CAST(value AS VARCHAR) AS l
           FROM events),
           t AS (SELECT user_id, ts, event_id,
                   regexp_replace(regexp_replace(regexp_replace(regexp_replace(l,
                     '[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}',
                     '<UUID>', 'g'),
                     '0x[0-9a-fA-F]+', '<HEX>', 'g'),
                     '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g'),
                     '-?[0-9]+(\.[0-9]+)?([Ee][+-]?[0-9]+)?', '<N>', 'g') AS tpl
                 FROM lines),
           tr AS (SELECT prev AS src_template, tpl AS dst_template,
                         CAST(count(*) AS BIGINT) AS n
                  FROM (SELECT tpl, lag(tpl) OVER (
                          PARTITION BY user_id ORDER BY ts, event_id) AS prev
                        FROM t)
                  WHERE prev IS NOT NULL GROUP BY 1, 2),
           sh AS (SELECT src_template, dst_template, n,
                         round(CAST(n AS DOUBLE) / CAST(sum(n) OVER (
                           PARTITION BY src_template) AS DOUBLE), 6) AS share
                  FROM tr)
         SELECT src_template, dst_template, n, share,
                (n <= 2 OR share < 0.05) AS rare
         FROM sh ORDER BY src_template, dst_template""",

    "r28_incidents" ->
      // the r23 edge chain + one lead pairing fires with their next
      // resolve; per-key MTTR over closed incidents only
      """WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr, count(*) AS c
                FROM events GROUP BY 1, 2),
            r AS (SELECT event_type, hr, c,
                    count(*) OVER w AS tn,
                    sum(c) OVER w AS tsum,
                    sum(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))) OVER w AS tss
                  FROM h
                  WINDOW w AS (PARTITION BY event_type ORDER BY hr
                               RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING)),
            sc AS (SELECT event_type, hr * 3600 AS hr_start, c,
                     CAST(tsum AS DOUBLE) / CAST(tn AS DOUBLE) AS m,
                     CAST(tss AS DOUBLE) / CAST(tn AS DOUBLE)
                       - (CAST(tsum AS DOUBLE) / CAST(tn AS DOUBLE))
                         * (CAST(tsum AS DOUBLE) / CAST(tn AS DOUBLE)) AS v
                   FROM r WHERE tn >= 12),
            z AS (SELECT event_type, hr_start, c, m,
                    CASE WHEN v > 0.0 THEN (CAST(c AS DOUBLE) - m) / sqrt(v)
                         WHEN CAST(c AS DOUBLE) = m THEN 0.0 END AS zs
                  FROM sc),
            a AS (SELECT event_type, hr_start,
                    (coalesce(abs(zs) >= 3.0, false) OR zs IS NULL) AS an
                  FROM z),
            e AS (SELECT *, lag(an) OVER (PARTITION BY event_type
                    ORDER BY hr_start) AS prev FROM a),
            ed AS (SELECT event_type, hr_start, an FROM e
                   WHERE an <> coalesce(prev, false)),
            fr AS (SELECT event_type, hr_start, an,
                     lead(hr_start) OVER (PARTITION BY event_type
                       ORDER BY hr_start) AS nxt
                   FROM ed),
            fi AS (SELECT event_type, (nxt - hr_start) // 3600 AS dur, nxt
                   FROM fr WHERE an)
         SELECT event_type, CAST(count(*) AS BIGINT) AS n_incidents,
                CAST(sum(CASE WHEN nxt IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
                round(avg(CAST(dur AS DOUBLE)), 6) AS mttr_hours,
                CAST(max(dur) AS BIGINT) AS max_hours
         FROM fi GROUP BY 1 ORDER BY event_type""",

    "r23_alert_edges" ->
      // the r16 CTE + one lag over the scored hourly frame; same
      // rising/falling edge rule
      """WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr, count(*) AS c
                FROM events GROUP BY 1, 2),
            r AS (SELECT event_type, hr, c,
                    count(*) OVER w AS tn,
                    sum(c) OVER w AS tsum,
                    sum(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))) OVER w AS tss
                  FROM h
                  WINDOW w AS (PARTITION BY event_type ORDER BY hr
                               RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING)),
            sc AS (SELECT event_type, hr * 3600 AS hr_start, c,
                     CAST(tsum AS DOUBLE) / CAST(tn AS DOUBLE) AS m,
                     CAST(tss AS DOUBLE) / CAST(tn AS DOUBLE)
                       - (CAST(tsum AS DOUBLE) / CAST(tn AS DOUBLE))
                         * (CAST(tsum AS DOUBLE) / CAST(tn AS DOUBLE)) AS v
                   FROM r WHERE tn >= 12),
            z AS (SELECT event_type, hr_start, c, m,
                    CASE WHEN v > 0.0 THEN (CAST(c AS DOUBLE) - m) / sqrt(v)
                         WHEN CAST(c AS DOUBLE) = m THEN 0.0 END AS zs
                  FROM sc),
            a AS (SELECT event_type, hr_start, c, zs,
                    (coalesce(abs(zs) >= 3.0, false) OR zs IS NULL) AS an
                  FROM z),
            e AS (SELECT *, lag(an) OVER (PARTITION BY event_type
                    ORDER BY hr_start) AS prev FROM a)
         SELECT event_type, hr_start, CAST(c AS BIGINT) AS n_events,
                round(zs, 6) AS z_score,
                CASE WHEN an THEN 'fire' ELSE 'resolve' END AS edge
         FROM e WHERE an <> coalesce(prev, false)
         ORDER BY event_type, hr_start""",

    "r29_alert_storms" ->
      // the r23 chain's fire edges, gap-split in global (hr, key)
      // order, grouped per storm — identical cumsum storm ids
      """WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr, count(*) AS c
                FROM events GROUP BY 1, 2),
            r AS (SELECT event_type, hr, c,
                    count(*) OVER w AS tn,
                    sum(c) OVER w AS tsum,
                    sum(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))) OVER w AS tss
                  FROM h
                  WINDOW w AS (PARTITION BY event_type ORDER BY hr
                               RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING)),
            sc AS (SELECT event_type, hr * 3600 AS hr_start, c,
                     CAST(tsum AS DOUBLE) / CAST(tn AS DOUBLE) AS m,
                     CAST(tss AS DOUBLE) / CAST(tn AS DOUBLE)
                       - (CAST(tsum AS DOUBLE) / CAST(tn AS DOUBLE))
                         * (CAST(tsum AS DOUBLE) / CAST(tn AS DOUBLE)) AS v
                   FROM r WHERE tn >= 12),
            z AS (SELECT event_type, hr_start, c,
                    CASE WHEN v > 0.0 THEN (CAST(c AS DOUBLE) - m) / sqrt(v)
                         WHEN CAST(c AS DOUBLE) = m THEN 0.0 END AS zs
                  FROM sc),
            a AS (SELECT event_type, hr_start,
                    (coalesce(abs(zs) >= 3.0, false) OR zs IS NULL) AS an
                  FROM z),
            e AS (SELECT *, lag(an) OVER (PARTITION BY event_type
                    ORDER BY hr_start) AS prev FROM a),
            f AS (SELECT event_type AS key, hr_start FROM e
                  WHERE an <> coalesce(prev, false) AND an),
            g AS (SELECT key, hr_start,
                    CASE WHEN lag(hr_start) OVER o IS NULL
                           OR hr_start - lag(hr_start) OVER o > 7200 THEN 1
                         ELSE 0 END AS ns
                  FROM f WINDOW o AS (ORDER BY hr_start, key)),
            st AS (SELECT key, hr_start, sum(ns) OVER (
                     ORDER BY hr_start, key ROWS UNBOUNDED PRECEDING) AS sid
                   FROM g)
         SELECT CAST(min(hr_start) AS BIGINT) AS storm_start,
                CAST(max(hr_start) AS BIGINT) AS storm_end,
                CAST(count(*) AS BIGINT) AS n_fires,
                CAST(count(DISTINCT key) AS BIGINT) AS n_keys,
                CAST((max(hr_start) - min(hr_start)) // 3600 AS BIGINT) AS span_hours,
                string_agg(DISTINCT key, ',' ORDER BY key) AS keys
         FROM st GROUP BY sid ORDER BY storm_start""",

    "r25_template_drift" ->
      """WITH lines AS (SELECT ts, 'user=' || user_id || ' type=' || event_type
                || ' value=' || CAST(value AS VARCHAR) AS l FROM events),
            t AS (SELECT epoch_us(ts) AS us,
                    regexp_replace(regexp_replace(regexp_replace(regexp_replace(l,
                      '[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}',
                      '<UUID>', 'g'),
                      '0x[0-9a-fA-F]+', '<HEX>', 'g'),
                      '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g'),
                      '-?[0-9]+(\.[0-9]+)?([Ee][+-]?[0-9]+)?', '<N>', 'g') AS template
                  FROM lines),
            b AS (SELECT min(us) + ((max(us) - min(us)) // 2) AS bnd FROM t),
            c AS (SELECT template,
                    CAST(sum(CASE WHEN us < bnd THEN 1 ELSE 0 END) AS BIGINT) AS n_before,
                    CAST(sum(CASE WHEN us >= bnd THEN 1 ELSE 0 END) AS BIGINT) AS n_after
                  FROM t, b GROUP BY 1),
            sc AS (SELECT template, n_before, n_after,
                     round(ln(CAST(n_after + 1 AS DOUBLE)
                              / CAST(n_before + 1 AS DOUBLE)), 6) AS log_ratio,
                     CASE WHEN n_before = 0 THEN 'new'
                          WHEN n_after = 0 THEN 'vanished'
                          ELSE 'shifted' END AS status
                   FROM c)
         SELECT template, n_before, n_after, log_ratio, status FROM (
           SELECT *, row_number() OVER (
             ORDER BY abs(log_ratio) DESC, template) AS rk FROM sc)
         WHERE rk <= 20 ORDER BY abs(log_ratio) DESC, template""",

    "r22_template_anomaly" ->
      // the r18 masking CTE keys the r16 anomaly CTE — same regexes,
      // same trailing-24 z-score arithmetic, template-keyed
      """WITH lines AS (
           SELECT ts, 'id=' || event_id || ' ts=' || strftime(ts, '%Y-%m-%d %H:%M:%S')
               || ' user=' || user_id || ' type=' || event_type
               || ' value=' || CAST(value AS VARCHAR) AS l
           FROM events),
           t AS (SELECT ts, regexp_replace(regexp_replace(regexp_replace(regexp_replace(l,
                 '[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}',
                 '<UUID>', 'g'),
                 '0x[0-9a-fA-F]+', '<HEX>', 'g'),
                 '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g'),
                 '-?[0-9]+(\.[0-9]+)?([Ee][+-]?[0-9]+)?', '<N>', 'g') AS template
              FROM lines),
           h AS (SELECT template, epoch_us(ts) // 3600000000 AS hr, count(*) AS c
                 FROM t GROUP BY 1, 2),
           r AS (SELECT template, hr, c,
                   count(*) OVER w AS tn,
                   sum(c) OVER w AS tsum,
                   sum(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))) OVER w AS tss
                 FROM h
                 WINDOW w AS (PARTITION BY template ORDER BY hr
                              RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING)),
           sc AS (SELECT template, hr * 3600 AS hr_start, c,
                    CAST(tsum AS DOUBLE) / CAST(tn AS DOUBLE) AS m,
                    CAST(tss AS DOUBLE) / CAST(tn AS DOUBLE)
                      - (CAST(tsum AS DOUBLE) / CAST(tn AS DOUBLE))
                        * (CAST(tsum AS DOUBLE) / CAST(tn AS DOUBLE)) AS v
                  FROM r WHERE tn >= 12),
           z AS (SELECT template, hr_start, c, m,
                   CASE WHEN v > 0.0 THEN (CAST(c AS DOUBLE) - m) / sqrt(v)
                        WHEN CAST(c AS DOUBLE) = m THEN 0.0 END AS zs
                 FROM sc)
         SELECT template, hr_start, CAST(c AS BIGINT) AS n_events,
                round(m, 6) AS mean_trailing,
                round(zs, 6) AS z_score,
                (coalesce(abs(zs) >= 3.0, false) OR zs IS NULL) AS is_anomaly
         FROM z ORDER BY template, hr_start""",

    "r20_ewma_forecast" ->
      // dyadic weights: both engines sum c·2^(24−d) and 2^(24−d) as
      // exact integers, then perform the SAME single IEEE division
      """WITH h AS (SELECT event_type AS key, epoch_us(ts) // 3600000000 AS hr,
                           count(*) AS c
                    FROM events GROUP BY 1, 2),
              j AS (SELECT a.key, a.hr, a.c,
                      CAST(sum(b.c * (CAST(1 AS BIGINT)
                        << CAST(24 - (a.hr - b.hr) AS INTEGER))) AS BIGINT) AS num,
                      CAST(sum(CAST(1 AS BIGINT)
                        << CAST(24 - (a.hr - b.hr) AS INTEGER)) AS BIGINT) AS den,
                      count(*) AS tn
                    FROM h a JOIN h b
                      ON b.key = a.key AND b.hr BETWEEN a.hr - 24 AND a.hr - 1
                    GROUP BY 1, 2, 3),
              f AS (SELECT key, hr, c, CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS fc
                    FROM j WHERE tn >= 12)
         SELECT key AS event_type, hr * 3600 AS hr_start,
                CAST(c AS BIGINT) AS n_events,
                round(fc, 6) AS ewma_forecast,
                (CAST(c AS DOUBLE) >= 3.0 * fc) AS is_spike,
                (CAST(c AS DOUBLE) <= fc / 3.0) AS is_drop
         FROM f ORDER BY event_type, hr_start""",

    "r17_parse_rate" ->
      """WITH h AS (SELECT epoch_us(ts) // 3600000000 AS hr,
                count(*) AS n_lines,
                sum(CASE WHEN event_id % 13 <> 0 THEN 1 ELSE 0 END) AS n_parsed
             FROM events GROUP BY 1)
         SELECT hr * 3600 AS hr_start, CAST(n_lines AS BIGINT) AS n_lines,
                CAST(n_parsed AS BIGINT) AS n_parsed,
                CAST(n_parsed AS DOUBLE) / CAST(n_lines AS DOUBLE) AS parse_rate,
                (CAST(n_parsed AS DOUBLE) / CAST(n_lines AS DOUBLE) < 0.95) AS alert
         FROM h ORDER BY hr_start""",

    "r18_log_templates" ->
      """WITH lines AS (
           SELECT 'id=' || event_id || ' ts=' || strftime(ts, '%Y-%m-%d %H:%M:%S')
               || ' user=' || user_id || ' type=' || event_type
               || ' value=' || CAST(value AS VARCHAR) AS l
           FROM events
           UNION ALL
           SELECT 'user=' || c_custkey || ' name=' || c_name
               || ' segment=' || c_mktsegment FROM customer),
           t AS (SELECT regexp_replace(regexp_replace(regexp_replace(regexp_replace(l,
                 '[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}',
                 '<UUID>', 'g'),
                 '0x[0-9a-fA-F]+', '<HEX>', 'g'),
                 '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g'),
                 '-?[0-9]+(\.[0-9]+)?([Ee][+-]?[0-9]+)?', '<N>', 'g') AS template
              FROM lines)
         SELECT template, CAST(count(*) AS BIGINT) AS n
         FROM t GROUP BY 1 ORDER BY template""",

    "r19_template_latency" ->
      """WITH lines AS (
           SELECT 'id=' || event_id || ' ts=' || strftime(ts, '%Y-%m-%d %H:%M:%S')
               || ' user=' || user_id || ' type=' || event_type
               || ' value=' || CAST(value AS VARCHAR) AS l
           FROM events),
           t AS (SELECT regexp_replace(regexp_replace(regexp_replace(regexp_replace(l,
                 '[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}',
                 '<UUID>', 'g'),
                 '0x[0-9a-fA-F]+', '<HEX>', 'g'),
                 '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g'),
                 '-?[0-9]+(\.[0-9]+)?([Ee][+-]?[0-9]+)?', '<N>', 'g') AS template,
                 CAST(regexp_extract(l, ' value=(.+)$', 1) AS DOUBLE) AS v
              FROM lines)
         SELECT template, CAST(count(*) AS BIGINT) AS n,
                round(quantile_cont(v, 0.5), 6) AS p50,
                round(quantile_cont(v, 0.95), 6) AS p95,
                round(max(v), 6) AS max_v
         FROM t GROUP BY 1 ORDER BY template""",

    "q36_listagg" ->
      """SELECT r_name, CAST(count(*) AS BIGINT) AS n_nations,
                string_agg(n_name, ',' ORDER BY n_name) AS nations
         FROM nation JOIN region ON n_regionkey = r_regionkey
         GROUP BY 1 ORDER BY 1""",

    "q35_pareto" ->
      // same decimal revenue sums; rank/cumsum windows with the
      // (rev desc, custkey) tiebreak
      """WITH r AS (SELECT o_custkey,
                      sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
                    FROM orders GROUP BY 1),
            t AS (SELECT sum(rev) AS tot FROM r)
         SELECT o_custkey,
                CAST(row_number() OVER (ORDER BY rev DESC, o_custkey) AS BIGINT)
                  AS rank,
                CAST(rev AS DOUBLE) AS revenue,
                round(CAST(rev AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS share,
                round(CAST(sum(rev) OVER (ORDER BY rev DESC, o_custkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                  / CAST(tot AS DOUBLE), 6) AS cum_share
         FROM r CROSS JOIN t ORDER BY rank""",

    "q34_scd2" ->
      // identical lag-collapse then lead/row_number over the change
      // rows; (us, event_id) tiebreak makes both windows deterministic
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id
                    FROM events),
            ch AS (SELECT user_id, event_type, us, event_id FROM (
                     SELECT *, lag(event_type) OVER (PARTITION BY user_id
                       ORDER BY us, event_id) AS prev FROM e)
                   WHERE prev IS NULL OR prev <> event_type),
            v AS (SELECT user_id, event_type AS state, us AS effective_from,
                    lead(us) OVER (PARTITION BY user_id
                      ORDER BY us, event_id) AS effective_to,
                    CAST(row_number() OVER (PARTITION BY user_id
                      ORDER BY us, event_id) AS BIGINT) AS version
                  FROM ch)
         SELECT user_id, state, effective_from, effective_to, version,
                effective_to IS NULL AS is_current
         FROM v ORDER BY user_id, version""",

    "q29_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS t FROM events
                    WHERE event_type = 'view' GROUP BY 1),
            c AS (SELECT e.user_id, min(e.ts) AS t FROM events e
                  JOIN v ON e.user_id = v.user_id AND e.ts > v.t
                        AND e.ts <= v.t + INTERVAL 24 HOUR
                  WHERE e.event_type = 'click' GROUP BY 1),
            p AS (SELECT e.user_id, min(e.ts) AS t FROM events e
                  JOIN c ON e.user_id = c.user_id AND e.ts > c.t
                        AND e.ts <= c.t + INTERVAL 24 HOUR
                  WHERE e.event_type = 'purchase' GROUP BY 1)
         SELECT '1_view' AS step, CAST((SELECT count(*) FROM v) AS BIGINT) AS users
         UNION ALL
         SELECT '2_click', CAST((SELECT count(*) FROM c) AS BIGINT)
         UNION ALL
         SELECT '3_purchase', CAST((SELECT count(*) FROM p) AS BIGINT)
         ORDER BY step""",

    "r15_multiline" ->
      """WITH lines AS (
           SELECT user_id, event_id * 2 AS line_no,
                  'id=' || event_id || ' type=' || event_type AS line,
                  1 AS is_header
           FROM events
           UNION ALL
           SELECT user_id, event_id * 2 + 1, '  at trace#' || event_id, 0
           FROM events WHERE event_type = 'error'),
            r AS (
           SELECT user_id, line_no, line,
                  CAST(sum(is_header) OVER (PARTITION BY user_id ORDER BY line_no) AS BIGINT) AS rec_no
           FROM lines)
         SELECT user_id, rec_no, CAST(count(*) AS BIGINT) AS n_lines,
                string_agg(line, ' | ' ORDER BY line_no) AS record
         FROM r GROUP BY 1, 2 ORDER BY 1, 2""",

    "t09_top_ngrams" ->
      """WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
                    FROM documents),
            sh AS (SELECT toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
                   FROM (SELECT doc_id, toks,
                           unnest(range(1, len(toks) - 1)) AS i FROM t))
         SELECT shingle, CAST(count(*) AS BIGINT) AS n
         FROM sh GROUP BY 1 ORDER BY n DESC, shingle LIMIT 20""",

    "r01_regex_parse" ->
      """SELECT event_id, epoch_us(date_trunc('second', ts)) // 1000000 AS ts_s,
                user_id, event_type AS etype, value
         FROM events ORDER BY event_id""",

    "r02_date_parse" ->
      """SELECT event_id, CASE
           WHEN event_id % 9 = 5 THEN epoch_us(date_trunc('minute', ts)) // 1000000
           WHEN event_id % 9 = 7 THEN epoch_us(date_trunc('day', ts)) // 1000000
           ELSE epoch_us(date_trunc('second', ts)) // 1000000
         END AS ts_s
         FROM events ORDER BY event_id""",

    "r03_filter" ->
      """SELECT event_id, event_type AS etype, value FROM events
         WHERE event_type = 'error' AND value > 50.0 ORDER BY event_id""",

    "r05_throttle" ->
      """SELECT event_id FROM (
           SELECT event_id, row_number() OVER (
             PARTITION BY epoch_us(ts) // 60000000
             ORDER BY epoch_us(ts), event_id) AS rn
           FROM events) WHERE rn <= 5 ORDER BY event_id""",

    "r06_window_tumbling" ->
      """SELECT (epoch_us(ts) // 300000000) * 300 AS window_start, event_type,
                CAST(count(*) AS BIGINT) AS n_events,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",

    "r07_window_sliding" ->
      """SELECT ws AS window_start, event_type,
                CAST(count(*) AS BIGINT) AS n_events,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM (SELECT unnest([(epoch_us(ts) // 300000000) * 300 - 300,
                              (epoch_us(ts) // 300000000) * 300]) AS ws,
                      event_type, value
               FROM events)
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "r08_multitable_join" ->
      """SELECT c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS n,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events JOIN customer ON user_id = c_custkey
         GROUP BY 1 ORDER BY 1""",

    "r09_sql_per_window" ->
      """SELECT (epoch_us(ts) // 3600000000) * 3600 AS window_start,
                event_type AS etype, CAST(count(*) AS BIGINT) AS n, max(value) AS max_v
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",

    "r10_bool_parse" ->
      """SELECT value > 50.0 AS big, CAST(count(*) AS BIGINT) AS n
         FROM events GROUP BY 1 ORDER BY 1""",

    "q24_setops" ->
      """SELECT id, src FROM (
           SELECT id, 'both' AS src FROM (
             SELECT DISTINCT user_id AS id FROM events
             INTERSECT
             SELECT DISTINCT CAST(c_custkey AS BIGINT) AS id FROM customer)
           UNION ALL
           SELECT id, 'cust_only' AS src FROM (
             SELECT DISTINCT CAST(c_custkey AS BIGINT) AS id FROM customer
             EXCEPT
             SELECT DISTINCT user_id AS id FROM events))
         ORDER BY src, id""",

    "q01_agg" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_qty,
                CAST(count(*) AS BIGINT) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "q02_join_agg" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM customer JOIN orders ON c_custkey = o_custkey
         GROUP BY 1 ORDER BY 1""",

    "q03_multijoin" ->
      """SELECT r_name, n_name,
                CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
                CAST(count(*) AS BIGINT) AS n
         FROM region
           JOIN nation ON n_regionkey = r_regionkey
           JOIN customer ON c_nationkey = n_nationkey
           JOIN orders ON o_custkey = c_custkey
           JOIN lineitem ON l_orderkey = o_orderkey
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "q03b_multijoin_cbo" ->
      // identical spec to q03: the CBO/statistics planning regime is a
      // performance choice and must be answer-invariant
      """SELECT r_name, n_name,
                CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
                CAST(count(*) AS BIGINT) AS n
         FROM region
           JOIN nation ON n_regionkey = r_regionkey
           JOIN customer ON c_nationkey = n_nationkey
           JOIN orders ON o_custkey = c_custkey
           JOIN lineitem ON l_orderkey = o_orderkey
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "q04_topk_group" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, rnk FROM (
           SELECT o_orderpriority, o_orderkey, o_totalprice,
                  CAST(row_number() OVER (PARTITION BY o_orderpriority
                    ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk
           FROM orders) WHERE rnk <= 3
         ORDER BY o_orderpriority, rnk""",

    "q05_distinct" ->
      """SELECT l_returnflag,
                CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
                CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
                CAST(count(*) AS BIGINT) AS n
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    "q06_anti_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
         ORDER BY c_custkey""",

    "q07_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
                coalesce(l_linestatus, 'ALL') AS linestatus,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                CAST(count(*) AS BIGINT) AS n
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         ORDER BY 1, 2""",

    "q08_case_agg" ->
      """SELECT o_orderpriority,
                CAST(SUM(CASE WHEN o_orderstatus = 'F'
                         THEN CAST(o_totalprice AS DECIMAL(18,2))
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS f_total,
                CAST(count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS n_open,
                CAST(count(*) AS BIGINT) AS n
         FROM orders GROUP BY 1 ORDER BY 1""",

    "q09_strings" ->
      """SELECT p_partkey, upper(substr(p_name, 1, 8)) AS pfx,
                p_brand || '-' || p_type AS brand_type,
                CAST(length(p_name) AS BIGINT) AS name_len,
                CAST(CASE WHEN p_name LIKE '%a%' THEN 1 ELSE 0 END AS BIGINT) AS has_a,
                regexp_extract(p_name, '([a-z]+)', 1) AS first_word
         FROM part ORDER BY p_partkey""",

    "q10_time_extract" ->
      """SELECT epoch_us(date_trunc('day', ts)) // 1000000 AS d,
                CAST(hour(ts) AS BIGINT) AS hr,
                CAST(count(*) AS BIGINT) AS n,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",

    "q11_percentile" ->
      """SELECT l_returnflag,
                round(quantile_cont(l_quantity, 0.5), 6) AS p50,
                round(quantile_cont(l_quantity, 0.9), 6) AS p90
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    "q12_having" ->
      """SELECT o_custkey,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
                CAST(count(*) AS BIGINT) AS n
         FROM orders GROUP BY o_custkey
         HAVING CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) >
           (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) * 2.0 FROM orders)
         ORDER BY o_custkey""",

    "q13_union" ->
      """SELECT id, CAST(count(*) AS BIGINT) AS n_sources FROM (
           SELECT DISTINCT user_id AS id FROM events
           UNION ALL
           SELECT DISTINCT CAST(c_custkey AS BIGINT) AS id FROM customer)
         GROUP BY id ORDER BY id""",

    "q14_json" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
                CAST(count(*) AS BIGINT) AS n,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1 ORDER BY 1""",

    "q15_window_funcs" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
                lag(o_totalprice, 1) OVER w AS prev_price,
                lead(o_totalprice, 1) OVER w AS next_price,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                  AS running_total,
                CAST(row_number() OVER w AS BIGINT) AS order_seq
         FROM orders WHERE o_custkey < 100
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         ORDER BY o_custkey, order_seq""",

    "q16_semi_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000.0)
         ORDER BY c_custkey""",

    "q17_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
                coalesce(o_orderpriority, 'ALL') AS priority,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
                CAST(count(*) AS BIGINT) AS n
         FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
         ORDER BY 1, 2""",

    "q33_interval_coverage" ->
      // identical sweep: endpoint deltas, per-position net, per-key
      // cumulative active count, gaps where active > 0; all-integer
      // epoch micros until the final rounded ratio
      """WITH iv AS (SELECT user_id, epoch_us(ts) AS s,
                            epoch_us(ts) + 1800000000 AS e
                     FROM events),
            pts AS (SELECT user_id, s AS pos, 1 AS d FROM iv
                    UNION ALL
                    SELECT user_id, e AS pos, -1 AS d FROM iv),
            g AS (SELECT user_id, pos, CAST(sum(d) AS BIGINT) AS d
                  FROM pts GROUP BY 1, 2),
            c AS (SELECT user_id, pos,
                    sum(d) OVER (PARTITION BY user_id ORDER BY pos
                      ROWS UNBOUNDED PRECEDING) AS act,
                    lead(pos) OVER (PARTITION BY user_id ORDER BY pos) AS nxt
                  FROM g),
            cov AS (SELECT user_id,
                      CAST(sum(CASE WHEN act > 0 THEN nxt - pos ELSE 0 END)
                        AS BIGINT) AS covered_micros
                    FROM c GROUP BY 1),
            sp AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals,
                          min(s) AS s0, max(e) AS e1
                   FROM iv GROUP BY 1)
         SELECT sp.user_id, n_intervals, covered_micros,
                (e1 - s0) AS span_micros,
                round(CAST(covered_micros AS DOUBLE)
                      / CAST(e1 - s0 AS DOUBLE), 6) AS utilization
         FROM sp JOIN cov ON sp.user_id = cov.user_id
         ORDER BY sp.user_id""",

    "q18_corr_subquery" ->
      """SELECT p_partkey, p_type, p_retailprice FROM (
           SELECT p_partkey, p_type, p_retailprice,
                  CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2)))
                       OVER (PARTITION BY p_type) AS DOUBLE)
                    / CAST(count(*) OVER (PARTITION BY p_type) AS DOUBLE) AS avg_price
           FROM part)
         WHERE p_retailprice > avg_price ORDER BY p_partkey""",

    "q32_unpivot" ->
      """WITH w AS (SELECT l_returnflag,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS price,
               CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS disc,
               CAST(SUM(CAST(l_tax AS DECIMAL(18,4))) AS DOUBLE) AS tax
             FROM lineitem GROUP BY 1)
         SELECT l_returnflag, 'qty' AS measure, qty AS total FROM w
         UNION ALL SELECT l_returnflag, 'price', price FROM w
         UNION ALL SELECT l_returnflag, 'disc', disc FROM w
         UNION ALL SELECT l_returnflag, 'tax', tax FROM w
         ORDER BY l_returnflag, measure""",

    "q19_pivot" ->
      """SELECT epoch_us(date_trunc('day', ts)) // 1000000 AS d,
                CAST(SUM(CASE WHEN event_type = 'click'
                  THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS click,
                CAST(SUM(CASE WHEN event_type = 'error'
                  THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS error,
                CAST(SUM(CASE WHEN event_type = 'purchase'
                  THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase,
                CAST(SUM(CASE WHEN event_type = 'signup'
                  THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS signup,
                CAST(SUM(CASE WHEN event_type = 'view'
                  THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS view
         FROM events GROUP BY 1 ORDER BY 1""",

    "q20_asof_join" ->
      """WITH c AS (SELECT user_id, ts, max(event_id) AS click_id
                    FROM events WHERE event_type = 'click' GROUP BY 1, 2)
         SELECT e.event_id, e.user_id, c.click_id,
                epoch_us(date_trunc('second', c.ts)) // 1000000 AS click_ts_s
         FROM events e ASOF LEFT JOIN c
           ON e.user_id = c.user_id AND c.ts <= e.ts
         WHERE e.event_type = 'error' ORDER BY e.event_id""",

    "q21_range_join" ->
      """SELECT i AS bucket, CAST(count(*) AS BIGINT) AS n,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events e JOIN (SELECT unnest(range(50)) AS i) b
           ON e.value >= i * 10.0 AND e.value < (i + 1) * 10.0
         GROUP BY 1 ORDER BY 1""",

    "d01_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_dups
         FROM documents GROUP BY text ORDER BY keep_id""",

    "d29_normalized_dedup" ->
      """SELECT min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_dups
         FROM documents
         GROUP BY trim(regexp_replace(regexp_replace(
           lower(text), '[^\p{L}\p{N}\s]', '', 'g'), '\s+', ' ', 'g'))
         ORDER BY keep_id""",

    "d30_edit_verify" ->
      // the d11 candidate chain verbatim; verify = levenshtein over
      // substr(text, 1, 256) with the max(len, 1) guard
      """WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
                    FROM documents WHERE doc_id < 500),
            sh AS (SELECT DISTINCT doc_id,
                     toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
                   FROM (SELECT doc_id, toks,
                           unnest(range(1, len(toks) - 1)) AS i FROM t)),
            sigs AS (SELECT doc_id, i,
                            min(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS sig
                     FROM sh CROSS JOIN (SELECT unnest(range(8)) AS i) GROUP BY 1, 2),
            bands AS (SELECT doc_id, i // 2 AS band,
                             md5(min(CASE WHEN i % 2 = 0 THEN sig END)
                                 || min(CASE WHEN i % 2 = 1 THEN sig END)) AS bkey
                      FROM sigs GROUP BY 1, 2),
            cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
                     FROM bands a JOIN bands b
                       ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
            cl AS (SELECT doc_id, substr(text, 1, 256) AS t FROM documents
                   WHERE doc_id < 500),
            v AS (SELECT c.id1, c.id2,
                    CAST(levenshtein(a.t, b.t) AS BIGINT) AS lev,
                    round(1.0 - CAST(levenshtein(a.t, b.t) AS DOUBLE)
                      / CAST(greatest(length(a.t), length(b.t), 1) AS DOUBLE), 6)
                      AS edit_sim
                  FROM cand c JOIN cl a ON a.doc_id = c.id1
                              JOIN cl b ON b.doc_id = c.id2)
         SELECT id1, id2, lev, edit_sim FROM v
         WHERE edit_sim >= 0.5 ORDER BY id1, id2""",

    "d11_minhash_portable" ->
      """WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
                    FROM documents WHERE doc_id < 500),
            sh AS (SELECT DISTINCT doc_id,
                     toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
                   FROM (SELECT doc_id, toks,
                           unnest(range(1, len(toks) - 1)) AS i FROM t)),
            sigs AS (SELECT doc_id, i,
                            min(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS sig
                     FROM sh CROSS JOIN (SELECT unnest(range(8)) AS i) GROUP BY 1, 2),
            bands AS (SELECT doc_id, i // 2 AS band,
                             md5(min(CASE WHEN i % 2 = 0 THEN sig END)
                                 || min(CASE WHEN i % 2 = 1 THEN sig END)) AS bkey
                      FROM sigs GROUP BY 1, 2),
            cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
                     FROM bands a JOIN bands b
                       ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
            sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
            inter AS (SELECT c.id1, c.id2, count(*) AS n
                      FROM cand c
                      JOIN sh a ON a.doc_id = c.id1
                      JOIN sh b ON b.doc_id = c.id2 AND b.shingle = a.shingle
                      GROUP BY 1, 2)
         SELECT id1, id2,
                round(CAST(n AS DOUBLE) / CAST(s1.sz + s2.sz - n AS DOUBLE), 6) AS jaccard
         FROM inter JOIN sz s1 ON s1.doc_id = id1 JOIN sz s2 ON s2.doc_id = id2
         WHERE CAST(n AS DOUBLE) / CAST(s1.sz + s2.sz - n AS DOUBLE) >= 0.5
         ORDER BY id1, id2""",

    "d24_allpairs_exact" ->
      // brute-force quadratic oracle: every doc pair sharing >= 1
      // word token, exact jaccard on distinct-token sets — the
      // algorithm-free spec the prefix-filtered join must reproduce
      """WITH t AS (SELECT DISTINCT doc_id, tok FROM (
                SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
                FROM documents WHERE doc_id < 500)),
            sz AS (SELECT doc_id, count(*) AS sz FROM t GROUP BY 1),
            inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS n
                      FROM t a JOIN t b ON a.tok = b.tok AND a.doc_id < b.doc_id
                      GROUP BY 1, 2)
         SELECT id1, id2,
                round(CAST(n AS DOUBLE) / CAST(s1.sz + s2.sz - n AS DOUBLE), 6) AS jaccard
         FROM inter JOIN sz s1 ON s1.doc_id = id1 JOIN sz s2 ON s2.doc_id = id2
         WHERE CAST(n AS DOUBLE) / CAST(s1.sz + s2.sz - n AS DOUBLE) >= 0.5
         ORDER BY id1, id2""",

    "d04_ngram_jaccard" -> (ngramShingleCte +
      """
         SELECT id1, id2,
                round(CAST(n AS DOUBLE) / CAST(s1.sz + s2.sz - n AS DOUBLE), 6) AS jaccard
         FROM inter JOIN sz s1 ON s1.doc_id = id1 JOIN sz s2 ON s2.doc_id = id2
         WHERE CAST(n AS DOUBLE) / CAST(s1.sz + s2.sz - n AS DOUBLE) >= 0.5
         ORDER BY id1, id2"""),

    "p16_token_waterfill" ->
      // the identical integer waterfill: totals -> boundary row
      // T_{i-1} <= lvl < T_i with lvl = (B - P_{i-1}) // (n-i+1) ->
      // per-source md5-ordered cumsum <= lvl. All BIGINT arithmetic.
      """WITH n AS (SELECT doc_id, source,
               CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_toks
             FROM documents WHERE doc_id IS NOT NULL AND source IS NOT NULL),
            tot AS (SELECT source, sum(n_toks) AS t FROM n GROUP BY 1),
            lvc AS (SELECT * FROM (
                      SELECT source, t,
                             (26000 - (p - t)) // (ns - i + 1) AS lvl,
                             coalesce(lag(t) OVER (ORDER BY t, source), 0) AS prevt
                      FROM (SELECT source, t,
                              row_number() OVER (ORDER BY t, source) AS i,
                              sum(t) OVER (ORDER BY t, source) AS p,
                              count(*) OVER () AS ns
                            FROM tot))
                    WHERE prevt <= lvl AND lvl < t),
            lv AS (SELECT coalesce(min(lvl), 9223372036854775807) AS lvl FROM lvc),
            c AS (SELECT doc_id, source, n_toks,
                    sum(n_toks) OVER (PARTITION BY source
                      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS cum
                  FROM n)
         SELECT doc_id, source, n_toks FROM c, lv WHERE cum <= lvl
         ORDER BY doc_id""",

    "p17_effective_tokens" -> {
      // the identical arithmetic, Horner chain generated from the
      // same coefficient table (operators.Training.expNegHornerSql)
      val x = "greatest(0.0, (2000.0 / CAST(unique_tokens AS DOUBLE)) - 1.0) / 5.3"
      val horner = graft.operators.Training.expNegHornerSql(x)
      s"""WITH n AS (SELECT source,
               CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS n_toks
             FROM documents WHERE source IS NOT NULL),
            tot AS (SELECT source, CAST(sum(n_toks) AS BIGINT) AS unique_tokens
                    FROM n GROUP BY 1)
         SELECT source, unique_tokens,
                round(2000.0 / CAST(unique_tokens AS DOUBLE), 6) AS epochs,
                round(CAST(unique_tokens AS DOUBLE)
                      + (CAST(unique_tokens AS DOUBLE) * 5.3)
                        * (1.0 - $horner), 6) AS effective_tokens
         FROM tot ORDER BY source"""
    },

    "d28_dedup_report" -> (ngramShingleCte.replaceFirst("WITH", "WITH RECURSIVE") +
      """,
         pairs AS (SELECT id1, id2 FROM inter
                   JOIN sz s1 ON s1.doc_id = id1 JOIN sz s2 ON s2.doc_id = id2
                   WHERE CAST(n AS DOUBLE) / CAST(s1.sz + s2.sz - n AS DOUBLE) >= 0.5),
         edges AS (SELECT id1 AS a, id2 AS b FROM pairs
                   UNION SELECT id2, id1 FROM pairs),
         reach(a, b) AS (SELECT a, b FROM edges
                         UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         comp AS (SELECT a AS id, least(a, min(b)) AS component FROM reach GROUP BY a),
         allc AS (SELECT d.doc_id, d.source,
                         coalesce(c.component, d.doc_id) AS component
                  FROM (SELECT doc_id, source FROM documents WHERE doc_id < 500) d
                  LEFT JOIN comp c ON c.id = d.doc_id),
         csz AS (SELECT component, count(*) AS csz FROM allc GROUP BY 1)
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(CASE WHEN csz > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
                round(CAST(sum(CASE WHEN csz > 1 THEN 1 ELSE 0 END) AS DOUBLE)
                      / CAST(count(*) AS DOUBLE), 6) AS dup_rate,
                CAST(count(DISTINCT CASE WHEN csz > 1 THEN component END) AS BIGINT)
                  AS n_clusters,
                CAST(max(csz) AS BIGINT) AS max_cluster
         FROM allc JOIN csz USING (component)
         GROUP BY 1 ORDER BY source"""),

    "d27_incremental_cc" -> (ngramShingleCte.replaceFirst("WITH", "WITH RECURSIVE") +
      // the ONE-SHOT d06 components over ALL docs and ALL pairs: the
      // hash match proves the contracted incremental fold exact
      """,
         pairs AS (SELECT id1, id2 FROM inter
                   JOIN sz s1 ON s1.doc_id = id1 JOIN sz s2 ON s2.doc_id = id2
                   WHERE CAST(n AS DOUBLE) / CAST(s1.sz + s2.sz - n AS DOUBLE) >= 0.5),
         edges AS (SELECT id1 AS a, id2 AS b FROM pairs
                   UNION SELECT id2, id1 FROM pairs),
         reach(a, b) AS (SELECT a, b FROM edges
                         UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         comp AS (SELECT a AS id, least(a, min(b)) AS component FROM reach GROUP BY a)
         SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
         FROM (SELECT doc_id FROM documents WHERE doc_id < 500) d
         LEFT JOIN comp c ON c.id = d.doc_id
         ORDER BY d.doc_id"""),

    "d26_kmv_store_merge" ->
      // the ONE-SHOT whole-corpus bottom-64 per source: matching the
      // Spark side's two-run merge proves store mergeability exactly
      """WITH tk AS (SELECT source, md5(tok) AS h FROM (
                SELECT source, unnest(string_split_regex(lower(text), '\s+')) AS tok
                FROM documents) WHERE len(tok) > 0 GROUP BY 1, 2),
            rk AS (SELECT source, h, row_number() OVER (
                     PARTITION BY source ORDER BY h) AS r FROM tk),
            sk AS (SELECT source, count(*) AS n_sketch, max(h) AS hk
                   FROM rk WHERE r <= 64 GROUP BY 1)
         SELECT source, CAST(n_sketch AS BIGINT) AS n_sketch,
                CASE WHEN n_sketch < 64 THEN CAST(n_sketch AS DOUBLE)
                     ELSE round(63.0 * 1152921504606846976.0 /
                            CAST(CAST(('0x' || substr(hk, 1, 15)) AS BIGINT)
                                 AS DOUBLE), 4)
                END AS distinct_tokens_est
         FROM sk ORDER BY source""",

    "d25_sig_store_dedup" ->
      // the d11 portable chain split at doc_id 250: signatures + bands
      // for both halves, candidates only where a bucket holds one NEW
      // and one STORED doc, then component-match counting — no old
      // text below the sig CTE, mirroring the store contract
      """WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
                    FROM documents WHERE doc_id < 500),
            sh AS (SELECT DISTINCT doc_id,
                     toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
                   FROM (SELECT doc_id, toks,
                           unnest(range(1, len(toks) - 1)) AS i FROM t)),
            sigs AS (SELECT doc_id, i,
                            min(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS sig
                     FROM sh CROSS JOIN (SELECT unnest(range(8)) AS i) GROUP BY 1, 2),
            bands AS (SELECT doc_id, i // 2 AS band,
                             md5(min(CASE WHEN i % 2 = 0 THEN sig END)
                                 || min(CASE WHEN i % 2 = 1 THEN sig END)) AS bkey
                      FROM sigs GROUP BY 1, 2),
            cand AS (SELECT DISTINCT a.doc_id AS doc_id, b.doc_id AS matched_id
                     FROM bands a JOIN bands b
                       ON a.band = b.band AND a.bkey = b.bkey
                     WHERE a.doc_id >= 250 AND b.doc_id < 250),
            m AS (SELECT c.doc_id, c.matched_id,
                         sum(CASE WHEN sa.sig = sb.sig THEN 1 ELSE 0 END) AS matches
                  FROM cand c
                  JOIN sigs sa ON sa.doc_id = c.doc_id
                  JOIN sigs sb ON sb.doc_id = c.matched_id AND sb.i = sa.i
                  GROUP BY 1, 2)
         SELECT doc_id, matched_id, CAST(matches AS BIGINT) AS matches,
                round(CAST(matches AS DOUBLE) / 8.0, 6) AS est_jaccard
         FROM m WHERE matches >= 4 ORDER BY doc_id, matched_id""",

    "d24b_allpairs_3gram" -> (ngramShingleCte +
      // brute-force quadratic 3-gram oracle at tau=0.8: every shared-
      // shingle pair, exact jaccard — algorithm-free, so the prefix
      // filter's hash-match proves it dropped nothing at this tau
      """
         SELECT id1, id2,
                round(CAST(n AS DOUBLE) / CAST(s1.sz + s2.sz - n AS DOUBLE), 6) AS jaccard
         FROM inter JOIN sz s1 ON s1.doc_id = id1 JOIN sz s2 ON s2.doc_id = id2
         WHERE CAST(n AS DOUBLE) / CAST(s1.sz + s2.sz - n AS DOUBLE) >= 0.8
         ORDER BY id1, id2"""),

    "d06_dedup_resolve" -> (ngramShingleCte.replaceFirst("WITH", "WITH RECURSIVE") +
      """,
         pairs AS (SELECT id1, id2 FROM inter
                   JOIN sz s1 ON s1.doc_id = id1 JOIN sz s2 ON s2.doc_id = id2
                   WHERE CAST(n AS DOUBLE) / CAST(s1.sz + s2.sz - n AS DOUBLE) >= 0.5),
         edges AS (SELECT id1 AS a, id2 AS b FROM pairs
                   UNION SELECT id2, id1 FROM pairs),
         reach(a, b) AS (SELECT a, b FROM edges
                         UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         comp AS (SELECT a AS id, least(a, min(b)) AS component FROM reach GROUP BY a)
         SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
         FROM (SELECT doc_id FROM documents WHERE doc_id < 500) d
         LEFT JOIN comp c ON c.id = d.doc_id
         ORDER BY d.doc_id"""),

    "p19_interleave" ->
      """SELECT doc_id, source,
                CAST(row_number() OVER (PARTITION BY source
                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS round,
                md5('o:' || CAST(doc_id AS VARCHAR)) AS ord
         FROM documents ORDER BY round, ord""",

    "p18_leakage_split" -> (ngramShingleCte.replaceFirst("WITH", "WITH RECURSIVE") +
      // d06's component resolution, then the p05 hash-range CASE on
      // the COMPONENT key: thr(0.2) = 0x33333, thr(0.4) = 0x66666
      """,
         pairs AS (SELECT id1, id2 FROM inter
                   JOIN sz s1 ON s1.doc_id = id1 JOIN sz s2 ON s2.doc_id = id2
                   WHERE CAST(n AS DOUBLE) / CAST(s1.sz + s2.sz - n AS DOUBLE) >= 0.5),
         edges AS (SELECT id1 AS a, id2 AS b FROM pairs
                   UNION SELECT id2, id1 FROM pairs),
         reach(a, b) AS (SELECT a, b FROM edges
                         UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         comp AS (SELECT a AS id, least(a, min(b)) AS component FROM reach GROUP BY a),
         allc AS (SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
                  FROM (SELECT doc_id FROM documents WHERE doc_id < 500) d
                  LEFT JOIN comp c ON c.id = d.doc_id)
         SELECT doc_id, component, CASE
           WHEN substring(md5(CAST(component AS VARCHAR)), 1, 5) < '33333' THEN 'val'
           WHEN substring(md5(CAST(component AS VARCHAR)), 1, 5) < '66666' THEN 'test'
           ELSE 'train' END AS split
         FROM allc ORDER BY doc_id"""),

    "d20_soft_dedup" -> (ngramShingleCte.replaceFirst("WITH", "WITH RECURSIVE") +
      """,
         pairs AS (SELECT id1, id2 FROM inter
                   JOIN sz s1 ON s1.doc_id = id1 JOIN sz s2 ON s2.doc_id = id2
                   WHERE CAST(n AS DOUBLE) / CAST(s1.sz + s2.sz - n AS DOUBLE) >= 0.5),
         edges AS (SELECT id1 AS a, id2 AS b FROM pairs
                   UNION SELECT id2, id1 FROM pairs),
         reach(a, b) AS (SELECT a, b FROM edges
                         UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         comp AS (SELECT a AS id, least(a, min(b)) AS component FROM reach GROUP BY a),
         allc AS (SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
                  FROM (SELECT doc_id FROM documents WHERE doc_id < 500) d
                  LEFT JOIN comp c ON c.id = d.doc_id),
         csz AS (SELECT component, CAST(count(*) AS BIGINT) AS cluster_size
                 FROM allc GROUP BY 1)
         SELECT f.doc_id, f.component, s.cluster_size,
                round(CAST(1 AS DOUBLE) / CAST(s.cluster_size AS DOUBLE), 6) AS weight
         FROM allc f JOIN csz s USING (component)
         ORDER BY f.doc_id"""),

    "d10_containment" -> (ngramShingleCte +
      """
         SELECT id1, id2,
                round(greatest(CAST(n AS DOUBLE) / CAST(s1.sz AS DOUBLE),
                               CAST(n AS DOUBLE) / CAST(s2.sz AS DOUBLE)), 6) AS containment
         FROM inter JOIN sz s1 ON s1.doc_id = id1 JOIN sz s2 ON s2.doc_id = id2
         WHERE greatest(CAST(n AS DOUBLE) / CAST(s1.sz AS DOUBLE),
                        CAST(n AS DOUBLE) / CAST(s2.sz AS DOUBLE)) >= 0.8
         ORDER BY id1, id2"""),

    "t10_heavy_hitters_by_key" ->
      """SELECT user_id % 10 AS seg, event_type AS item,
                CAST(count(*) AS BIGINT) AS cnt
         FROM events GROUP BY 1, 2 ORDER BY seg, cnt DESC, item""",

    "d05_dedup_embedding" ->
      """WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 1000),
              p AS (SELECT a.vec_id AS id1, b.vec_id AS id2,
                           a.embedding AS ea, b.embedding AS eb
                    FROM e a JOIN e b ON a.vec_id < b.vec_id),
              u AS (SELECT id1, id2, CAST(unnest(ea) AS DOUBLE) AS x,
                           CAST(unnest(eb) AS DOUBLE) AS y FROM p),
              s AS (SELECT id1, id2, sum(x*y) AS dot,
                           sqrt(sum(x*x)) AS na, sqrt(sum(y*y)) AS nb
                    FROM u GROUP BY 1, 2)
         SELECT id1, id2, round(dot / (na * nb), 6) AS cos
         FROM s WHERE dot / (na * nb) >= 0.45 ORDER BY id1, id2""",

    "s01_ann_brute" ->
      """WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
              c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings),
              u AS (SELECT qid, cid, CAST(unnest(ce) AS DOUBLE) AS x,
                           CAST(unnest(qe) AS DOUBLE) AS y
                    FROM (SELECT qid, cid, qe, ce FROM q, c)),
              s AS (SELECT qid, cid,
                           sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))) AS cos
                    FROM u GROUP BY 1, 2),
              r AS (SELECT qid, cid, cos, CAST(row_number() OVER (
                      PARTITION BY qid ORDER BY cos DESC, cid) AS BIGINT) AS rnk
                    FROM s)
         SELECT qid AS query_id, cid AS neighbor_id, round(cos, 6) AS cos, rnk AS rank
         FROM r WHERE rnk <= 10 ORDER BY query_id, rank""",

    "s19_mmr_rerank" -> mmrOracle(k = 5, prefetch = 20, lam = 0.7),

    "s18_postfiltered_ann" ->
      // unfiltered top-20, label=1 survivors re-ranked to 10 — the
      // post-filter strategy's exact answer, short lists included
      """WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
              c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings),
              u AS (SELECT qid, cid, CAST(unnest(ce) AS DOUBLE) AS x,
                           CAST(unnest(qe) AS DOUBLE) AS y
                    FROM (SELECT qid, cid, qe, ce FROM q, c)),
              s AS (SELECT qid, cid,
                           sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))) AS cos
                    FROM u GROUP BY 1, 2),
              r AS (SELECT qid, cid, cos, row_number() OVER (
                      PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
                    FROM s),
              f AS (SELECT qid, cid, cos, CAST(row_number() OVER (
                      PARTITION BY qid ORDER BY rnk) AS BIGINT) AS rnk2
                    FROM r
                    JOIN (SELECT vec_id FROM embeddings WHERE label = 1) lf
                      ON lf.vec_id = r.cid
                    WHERE rnk <= 20)
         SELECT qid AS query_id, cid AS neighbor_id, round(cos, 6) AS cos,
                rnk2 AS rank
         FROM f WHERE rnk2 <= 10 ORDER BY query_id, rank""",

    "s17_filtered_ann" ->
      // s01's brute spec restricted to the label=1 survivors — the
      // pre-filter strategy's exact answer
      """WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
              c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE label = 1),
              u AS (SELECT qid, cid, CAST(unnest(ce) AS DOUBLE) AS x,
                           CAST(unnest(qe) AS DOUBLE) AS y
                    FROM (SELECT qid, cid, qe, ce FROM q, c)),
              s AS (SELECT qid, cid,
                           sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))) AS cos
                    FROM u GROUP BY 1, 2),
              r AS (SELECT qid, cid, cos, CAST(row_number() OVER (
                      PARTITION BY qid ORDER BY cos DESC, cid) AS BIGINT) AS rnk
                    FROM s)
         SELECT qid AS query_id, cid AS neighbor_id, round(cos, 6) AS cos, rnk AS rank
         FROM r WHERE rnk <= 10 ORDER BY query_id, rank""",

    "q27_rolling_window" ->
      """SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
                  PARTITION BY user_id ORDER BY epoch_us(ts)
                  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
                  AS DOUBLE) AS rolling_sum
         FROM events ORDER BY user_id, ts_us, event_id""",

    "q28_rank_funcs" ->
      """SELECT o_orderpriority, o_orderkey,
                CAST(dense_rank() OVER w AS BIGINT) AS drnk,
                round(percent_rank() OVER w, 6) AS prnk,
                CAST(ntile(4) OVER w AS BIGINT) AS quartile
         FROM orders
         WINDOW w AS (PARTITION BY o_orderpriority
                      ORDER BY o_totalprice DESC, o_orderkey)
         ORDER BY o_orderpriority, drnk, o_orderkey""",

    "q26_full_outer" ->
      """SELECT coalesce(e.user_id, c.cust_id) AS id,
                coalesce(e.n_events, 0) AS n_events,
                coalesce(c.c_mktsegment, 'NONE') AS segment
         FROM (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
               FROM events GROUP BY 1) e
         FULL OUTER JOIN (SELECT CAST(c_custkey AS BIGINT) AS cust_id, c_mktsegment
                          FROM customer) c
           ON e.user_id = c.cust_id
         ORDER BY id""",

    "q23_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
                coalesce(o_orderpriority, 'ALL') AS priority,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
                CAST(count(*) AS BIGINT) AS n
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                 (o_orderstatus, o_orderpriority))
         ORDER BY 1, 2""",

    "q30_distinct_kmv" ->
      """WITH d AS (SELECT l_returnflag, md5(CAST(l_partkey AS VARCHAR)) AS h
                    FROM lineitem GROUP BY 1, 2),
            rk AS (SELECT l_returnflag, h,
                          row_number() OVER (PARTITION BY l_returnflag
                                             ORDER BY h) AS r
                   FROM d),
            sk AS (SELECT l_returnflag, count(*) AS n_sketch, max(h) AS hk
                   FROM rk WHERE r <= 256 GROUP BY 1)
         SELECT l_returnflag, CAST(n_sketch AS BIGINT) AS n_sketch,
                CASE WHEN n_sketch < 256 THEN CAST(n_sketch AS DOUBLE)
                     ELSE round(255.0 * 1152921504606846976.0 /
                            CAST(CAST(('0x' || substr(hk, 1, 15)) AS BIGINT)
                                 AS DOUBLE), 4)
                END AS distinct_est
         FROM sk ORDER BY l_returnflag""",

    "s21_top_pc" -> s21Oracle,

    "s22_pc_project" -> s22Oracle,

    "s24_pca_topk" -> s24Oracle,

    "s25_pc_whiten" -> s25Oracle,

    "s20_int8_ann" ->
      // both sides re-quantized with s07's floor codes; the three
      // sums are exact integer arithmetic (order-insensitive), so the
      // quantized cosine reproduces Spark's bit-for-bit
      """WITH e AS (SELECT vec_id, embedding,
                      list_max(list_transform(embedding,
                        x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
                    FROM embeddings),
            cd AS (SELECT vec_id AS id,
                     CASE WHEN scale = 0
                          THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
                          ELSE list_transform(embedding,
                            x -> CAST(floor(CAST(x AS DOUBLE) / scale) AS BIGINT))
                     END AS codes
                   FROM e),
            u AS (SELECT q.id AS qid, c.id AS cid,
                         unnest(q.codes) AS qx, unnest(c.codes) AS cx
                  FROM cd c, (SELECT * FROM cd WHERE id < 5) q),
            s AS (SELECT qid, cid,
                         CAST(sum(qx*cx) AS BIGINT) AS dot,
                         CAST(sum(cx*cx) AS BIGINT) AS cn2,
                         CAST(sum(qx*qx) AS BIGINT) AS qn2
                  FROM u GROUP BY 1, 2),
            r AS (SELECT qid, cid,
                         round(CAST(dot AS DOUBLE) /
                           (sqrt(CAST(cn2 AS DOUBLE)) * sqrt(CAST(qn2 AS DOUBLE))), 6)
                           AS qcos
                  FROM s WHERE cn2 > 0 AND qn2 > 0),
            k AS (SELECT qid, cid, qcos, CAST(row_number() OVER (
                    PARTITION BY qid ORDER BY qcos DESC, cid) AS BIGINT) AS rnk
                  FROM r)
         SELECT qid AS query_id, cid AS neighbor_id, qcos, rnk AS rank
         FROM k WHERE rnk <= 10 ORDER BY query_id, rank""",

    "s07_quantize_int8" ->
      """WITH e AS (SELECT vec_id, embedding,
                      list_max(list_transform(embedding,
                        x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
                    FROM embeddings),
              u AS (SELECT vec_id, scale, unnest(embedding) AS x,
                           unnest(range(len(embedding))) AS pos FROM e)
         SELECT vec_id, CAST(pos AS BIGINT) AS pos,
                CASE WHEN scale = 0 THEN 0
                     ELSE CAST(floor(CAST(x AS DOUBLE) / scale) AS BIGINT) END AS code,
                scale
         FROM u ORDER BY vec_id, pos""",

    "s04_centroids" ->
      """SELECT label, CAST(pos AS BIGINT) AS pos,
                round(CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(28,12))) AS DOUBLE)
                      / CAST(count(*) AS DOUBLE), 6) AS c
         FROM (SELECT label, unnest(embedding) AS x,
                      unnest(range(len(embedding))) AS pos
               FROM embeddings)
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "s23_centroid_sim" ->
      """WITH ce AS (SELECT label, pos,
               round(CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(28,12))) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE), 6) AS c
             FROM (SELECT label, unnest(embedding) AS x,
                          unnest(range(len(embedding))) AS pos
                   FROM embeddings)
             GROUP BY 1, 2),
            nm AS (SELECT label,
                     CAST(sum(CAST(round(c * c, 6) AS DECIMAL(24,8))) AS DOUBLE) AS n2
                   FROM ce GROUP BY 1),
            dt AS (SELECT a.label AS label1, b.label AS label2,
                     CAST(sum(CAST(round(a.c * b.c, 6) AS DECIMAL(24,8))) AS DOUBLE) AS dot
                   FROM ce a JOIN ce b ON b.pos = a.pos AND a.label < b.label
                   GROUP BY 1, 2)
         SELECT label1, label2,
                round(dot / (sqrt(na.n2) * sqrt(nb.n2)), 6) AS cos
         FROM dt JOIN nm na ON na.label = dt.label1
                 JOIN nm nb ON nb.label = dt.label2
         WHERE na.n2 > 0 AND nb.n2 > 0
         ORDER BY label1, label2""",

    "s29_kmeans_train" -> s29Oracle(k = 8, iters = 3, dims = 64),

    "s30_kmeans_prune" ->
      s30Oracle(k = 8, iters = 3, dims = 64, pruneNum = 3, pruneDen = 10),

    "s32_ivf_exact" ->
      s32Oracle(k = 8, iters = 3, dims = 64, nprobe = 2, topK = 10,
        queryMax = 5L),

    "s31_centroid_drift" ->
      // two s04 centroid chains (even/odd snapshot split), the s23
      // round-6/DECIMAL dot, counts per side
      """WITH eo AS (SELECT label, unnest(embedding) AS x,
                       unnest(range(len(embedding))) AS pos
                     FROM embeddings WHERE vec_id % 2 = 0),
            en AS (SELECT label, unnest(embedding) AS x,
                       unnest(range(len(embedding))) AS pos
                   FROM embeddings WHERE vec_id % 2 = 1),
            co AS (SELECT label, pos,
                     round(CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(28,12))) AS DOUBLE)
                           / CAST(count(*) AS DOUBLE), 6) AS c
                   FROM eo GROUP BY 1, 2),
            cn AS (SELECT label, pos,
                     round(CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(28,12))) AS DOUBLE)
                           / CAST(count(*) AS DOUBLE), 6) AS c
                   FROM en GROUP BY 1, 2),
            n2o AS (SELECT label,
                      CAST(sum(CAST(round(c * c, 6) AS DECIMAL(24,8))) AS DOUBLE) AS n2
                    FROM co GROUP BY 1 HAVING n2 > 0),
            n2n AS (SELECT label,
                      CAST(sum(CAST(round(c * c, 6) AS DECIMAL(24,8))) AS DOUBLE) AS n2
                    FROM cn GROUP BY 1 HAVING n2 > 0),
            no AS (SELECT label, CAST(count(*) AS BIGINT) AS n_old
                   FROM embeddings WHERE vec_id % 2 = 0 GROUP BY 1),
            nn AS (SELECT label, CAST(count(*) AS BIGINT) AS n_new
                   FROM embeddings WHERE vec_id % 2 = 1 GROUP BY 1),
            dt AS (SELECT co.label,
                     CAST(sum(CAST(round(co.c * cn.c, 6) AS DECIMAL(24,8))) AS DOUBLE)
                       AS dot
                   FROM co JOIN cn ON cn.label = co.label AND cn.pos = co.pos
                   GROUP BY 1)
         SELECT dt.label, no.n_old, nn.n_new,
                round(dot / (sqrt(n2o.n2) * sqrt(n2n.n2)), 6) AS cos_drift,
                round(sqrt(n2n.n2) / sqrt(n2o.n2), 6) AS norm_ratio
         FROM dt JOIN n2o ON n2o.label = dt.label
                 JOIN n2n ON n2n.label = dt.label
                 JOIN no ON no.label = dt.label
                 JOIN nn ON nn.label = dt.label
         ORDER BY dt.label""",

    "s28_proto_prune" ->
      // the s04 centroid chain rounded 6, per-term round-6 products
      // DECIMAL-folded (the s23 discipline), rank/count windows, and
      // the exact-integer prune cut n*3//10
      """WITH ce AS (SELECT label, CAST(pos AS BIGINT) AS pos,
               round(CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(28,12))) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE), 6) AS c
             FROM (SELECT label, unnest(embedding) AS x,
                          unnest(range(len(embedding))) AS pos
                   FROM embeddings)
             GROUP BY 1, 2),
            cn AS (SELECT label,
                     CAST(sum(CAST(round(c * c, 6) AS DECIMAL(24,8))) AS DOUBLE) AS cn2
                   FROM ce GROUP BY 1),
            nv AS (SELECT vec_id, sqrt(list_aggregate(
                     list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                     'sum')) AS vn
                   FROM embeddings),
            dt AS (SELECT e.vec_id, e.label,
                     CAST(sum(CAST(round(ce.c * CAST(e.x AS DOUBLE), 6)
                       AS DECIMAL(24,8))) AS DOUBLE) AS dot
                   FROM (SELECT vec_id, label, unnest(embedding) AS x,
                                unnest(range(len(embedding))) AS pos
                         FROM embeddings) e
                   JOIN ce ON ce.label = e.label AND ce.pos = e.pos
                   GROUP BY 1, 2),
            sc AS (SELECT dt.vec_id, dt.label,
                     round(dot / (sqrt(cn.cn2) * nv.vn), 6) AS proto_score
                   FROM dt JOIN cn ON cn.label = dt.label AND cn.cn2 > 0
                           JOIN nv ON nv.vec_id = dt.vec_id AND nv.vn > 0),
            rk AS (SELECT *,
                     CAST(row_number() OVER (PARTITION BY label
                       ORDER BY proto_score DESC, vec_id) AS BIGINT) AS rank_in_label,
                     CAST(count(*) OVER (PARTITION BY label) AS BIGINT) AS n_label
                   FROM sc)
         SELECT vec_id, label, proto_score, rank_in_label, n_label,
                rank_in_label > n_label * 3 // 10 AS kept
         FROM rk ORDER BY label, rank_in_label""",

    "s05_vec_norm" ->
      """SELECT vec_id, round(sqrt(list_aggregate(
                list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                'sum')), 6) AS l2
         FROM embeddings ORDER BY vec_id""",

    "s14_hamming_topk" ->
      """WITH pj AS (SELECT vec_id, j,
                round(list_aggregate(list_transform(range(len(embedding)),
                  i -> CAST(embedding[i + 1] AS DOUBLE) *
                       (CASE WHEN (strpos('0123456789abcdef',
                           substr(md5(CAST(i AS VARCHAR) || ':' ||
                             CAST(j AS VARCHAR)), 1, 1)) - 1) % 2 = 0
                         THEN 1 ELSE -1 END)), 'sum'), 6) AS proj
              FROM embeddings CROSS JOIN (SELECT unnest(range(16)) AS j)),
            code AS (SELECT vec_id,
                       sum(CASE WHEN proj > 0
                           THEN CAST(power(2, 15 - j) AS BIGINT) ELSE 0 END) AS code
                     FROM pj GROUP BY 1),
            qc AS (SELECT vec_id AS qid, code AS qcode FROM code WHERE vec_id < 10),
            hm AS (SELECT qid, c.vec_id AS cid, bit_count(xor(c.code, qcode)) AS ham
                   FROM code c CROSS JOIN qc),
            sl AS (SELECT qid, cid, ham FROM (
                     SELECT qid, cid, ham, row_number() OVER (
                       PARTITION BY qid ORDER BY ham, cid) AS srnk FROM hm)
                   WHERE srnk <= 50),
            u AS (SELECT qid, cid, ham, CAST(unnest(ce.embedding) AS DOUBLE) AS x,
                         CAST(unnest(qe.embedding) AS DOUBLE) AS y
                  FROM sl JOIN embeddings ce ON ce.vec_id = sl.cid
                          JOIN embeddings qe ON qe.vec_id = sl.qid),
            s AS (SELECT qid, cid, ham,
                         sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))) AS cos
                  FROM u GROUP BY 1, 2, 3),
            r AS (SELECT qid, cid, ham, cos, CAST(row_number() OVER (
                    PARTITION BY qid ORDER BY cos DESC, cid) AS BIGINT) AS rnk
                  FROM s)
         SELECT qid AS query_id, cid AS neighbor_id, CAST(ham AS BIGINT) AS hamming,
                round(cos, 6) AS cos, rnk AS rank
         FROM r WHERE rnk <= 10 ORDER BY query_id, rank""",

    "s15_matryoshka" ->
      """WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
                    WHERE vec_id < 10),
            c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings),
            pu AS (SELECT qid, cid, CAST(unnest(ce[1:16]) AS DOUBLE) AS x,
                          CAST(unnest(qe[1:16]) AS DOUBLE) AS y
                   FROM (SELECT qid, cid, qe, ce FROM q, c)),
            ps AS (SELECT qid, cid,
                          round(sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))), 6)
                            AS pcos
                   FROM pu GROUP BY 1, 2),
            sl AS (SELECT qid, cid, pcos FROM (
                     SELECT qid, cid, pcos, row_number() OVER (
                       PARTITION BY qid ORDER BY pcos DESC, cid) AS srnk FROM ps)
                   WHERE srnk <= 50),
            fu AS (SELECT qid, cid, pcos, CAST(unnest(ce.embedding) AS DOUBLE) AS x,
                          CAST(unnest(qe.embedding) AS DOUBLE) AS y
                   FROM sl JOIN embeddings ce ON ce.vec_id = sl.cid
                           JOIN embeddings qe ON qe.vec_id = sl.qid),
            fs AS (SELECT qid, cid, pcos,
                          round(sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))), 6)
                            AS cos
                   FROM fu GROUP BY 1, 2, 3),
            r AS (SELECT qid, cid, pcos, cos, CAST(row_number() OVER (
                    PARTITION BY qid ORDER BY cos DESC, cid) AS BIGINT) AS rnk
                  FROM fs)
         SELECT qid AS query_id, cid AS neighbor_id, pcos AS prefix_cos,
                cos, rnk AS rank
         FROM r WHERE rnk <= 10 ORDER BY query_id, rank""",

    "s08_random_projection" ->
      """WITH sj AS (SELECT vec_id, j, embedding FROM embeddings
                     CROSS JOIN (SELECT unnest(range(16)) AS j))
         SELECT vec_id, CAST(j AS BIGINT) AS j,
                round(list_aggregate(list_transform(range(len(embedding)),
                  i -> CAST(embedding[i + 1] AS DOUBLE) *
                       (CASE WHEN (strpos('0123456789abcdef',
                           substr(md5(CAST(i AS VARCHAR) || ':' ||
                             CAST(j AS VARCHAR)), 1, 1)) - 1) % 2 = 0
                         THEN 1 ELSE -1 END)), 'sum'), 6) AS proj
         FROM sj ORDER BY vec_id, j""",

    "p04_source_quota" ->
      """WITH r AS (SELECT doc_id, source,
               row_number() OVER (PARTITION BY source
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS qr
             FROM documents)
         SELECT doc_id, source FROM r WHERE qr <= 30 ORDER BY doc_id""",

    "p22_fim_split" ->
      // same md5 channels: gate on the 5-hex prefix, cuts from two
      // 15-hex channels mod n+1 (order-normalized), PSM/SPM on a bit
      """WITH n AS (SELECT doc_id,
                      CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                           ELSE len(string_split_regex(trim(text), '\s+')) END
                        AS BIGINT) AS n_toks,
                      substring(md5(CAST(doc_id AS VARCHAR)), 1, 5) < '80000' AS is_fim,
                      CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':c1'), 1, 15))
                        AS BIGINT) AS h1,
                      CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':c2'), 1, 15))
                        AS BIGINT) AS h2,
                      substr(md5(CAST(doc_id AS VARCHAR) || ':o'), 1, 1) < '8' AS psm
                    FROM documents),
            c AS (SELECT doc_id, n_toks, is_fim, psm,
                    least(h1 % (n_toks + 1), h2 % (n_toks + 1)) AS lo,
                    greatest(h1 % (n_toks + 1), h2 % (n_toks + 1)) AS hi
                  FROM n)
         SELECT doc_id, n_toks, is_fim,
                CASE WHEN is_fim THEN lo ELSE n_toks END AS n_prefix,
                CASE WHEN is_fim THEN hi - lo ELSE 0 END AS n_middle,
                CASE WHEN is_fim THEN n_toks - hi ELSE 0 END AS n_suffix,
                CASE WHEN NOT is_fim THEN 'none'
                     WHEN psm THEN 'psm' ELSE 'spm' END AS fim_order
         FROM c ORDER BY doc_id""",

    "p05_split" ->
      """SELECT doc_id, CASE
           WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 5) < '19999' THEN 'val'
           WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 5) < '33333' THEN 'test'
           ELSE 'train' END AS split
         FROM documents ORDER BY doc_id""",

    "p06_token_budget" ->
      """WITH n AS (SELECT doc_id,
               CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_toks
             FROM documents),
            c AS (SELECT doc_id, n_toks,
                    sum(n_toks) OVER (
                      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS cum
                  FROM n)
         SELECT doc_id, n_toks FROM c WHERE cum <= 20000 ORDER BY doc_id""",

    "p10_chunk_windows" ->
      """WITH tk AS (SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'),
                           t -> len(t) > 0) AS toks
             FROM documents),
            nz AS (SELECT doc_id, toks, len(toks) AS n FROM tk WHERE len(toks) > 0),
            st AS (SELECT doc_id, toks, n, s FROM
                     (SELECT doc_id, toks, n, unnest(range(0, n, 24)) AS s FROM nz)
                   WHERE s = 0 OR s - 24 + 32 < n)
         SELECT doc_id,
                CAST(s // 24 AS BIGINT) AS chunk_idx,
                array_to_string(list_slice(toks, s + 1, s + 32), ' ') AS chunk_text,
                CAST(least(32, n - s) AS BIGINT) AS n_toks
         FROM st ORDER BY doc_id, chunk_idx""",

    "p07_dsir" -> p07Oracle,

    "p08_temperature" ->
      """WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
              r AS (SELECT source, n,
                      CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000000.0) AS HUGEINT) AS rs
                    FROM c),
              tot AS (SELECT CAST(sum(n) AS HUGEINT) AS total, sum(rs) AS s FROM r),
              k AS (SELECT source,
                      least(CAST(n AS HUGEINT),
                            ((SELECT total FROM tot) * 1 // 2) * rs // (SELECT s FROM tot))
                        AS cap
                    FROM r),
              ranked AS (SELECT doc_id, source,
                           row_number() OVER (PARTITION BY source
                             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
                         FROM documents)
         SELECT doc_id, source FROM ranked JOIN k USING (source)
         WHERE rn <= cap ORDER BY doc_id""",

    "t29_corpus_card" -> (
      // per-doc metrics = the t02 quality twin + the p12 token-count
      // twin, joined on doc_id; same decimal-sum mean, same ROLLUP
      s"""WITH q AS ($qualitySubSql),
             d AS (SELECT doc_id, source, lang,
                     CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS nt
                   FROM documents),
             j AS (SELECT d.source, d.lang, d.nt, q.quality
                   FROM d JOIN q USING (doc_id))
         SELECT CASE WHEN GROUPING(source) = 1 THEN 'ALL'
                     ELSE coalesce(source, '(null)') END AS source,
                CASE WHEN GROUPING(lang) = 1 THEN 'ALL'
                     ELSE coalesce(lang, '(null)') END AS lang,
                CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(nt) AS BIGINT) AS n_tokens,
                CAST(sum(CASE WHEN nt = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_empty,
                round(CAST(sum(CAST(quality AS DECIMAL(18,4))) AS DOUBLE)
                      / CAST(count(*) AS DOUBLE), 6) AS mean_quality
         FROM j GROUP BY ROLLUP(source, lang) ORDER BY 1, 2"""),

    "p09_curriculum" -> (
      s"""WITH q AS ($qualitySubSql),
             h AS (SELECT quality, count(*) AS c FROM q GROUP BY 1),
             b AS (SELECT quality,
                     coalesce(sum(c) OVER (ORDER BY quality DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS bef,
                     sum(c) OVER () AS n
                   FROM h),
             st AS (SELECT quality,
                      CAST((bef * 4) // n + 1 AS BIGINT) AS stage FROM b)
         SELECT q.doc_id, q.quality, st.stage
         FROM q JOIN st USING (quality) ORDER BY q.doc_id"""),

    "p11_diverse_sample" ->
      // assignment = the s09 CTE (rounded cosine, lowest-cid tie);
      // selection = md5-order row_number per cluster, quota 50
      """WITH c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < 8),
              e AS (SELECT vec_id, embedding AS ev FROM embeddings),
              u AS (SELECT vec_id, cid, sum(x*y) AS dot,
                           sqrt(sum(x*x)) AS ne, sqrt(sum(y*y)) AS nc
                    FROM (SELECT vec_id, cid, CAST(unnest(ev) AS DOUBLE) AS x,
                                 CAST(unnest(ce) AS DOUBLE) AS y FROM e, c)
                    GROUP BY 1, 2),
              a AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
                      ORDER BY round(dot/(ne*nc), 6) DESC, cid) AS rn FROM u),
              asg AS (SELECT vec_id, cid AS cluster FROM a WHERE rn = 1),
              r AS (SELECT vec_id, cluster, row_number() OVER (PARTITION BY cluster
                      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS pick FROM asg)
         SELECT vec_id, cluster, CAST(pick AS BIGINT) AS pick
         FROM r WHERE pick <= 50 ORDER BY vec_id""",

    "p12_pack_greedy" -> (p12PackCte +
      """
         SELECT doc_id, shard, pack FROM g ORDER BY doc_id"""),

    "p20_pack_efficiency" -> (p12PackCte +
      // the Krell efficiency report over the same packs: padding vs
      // capacity, with an oversized pack contributing its own fill as
      // capacity (a lone over-cap doc pads nothing)
      """,
           pk AS (SELECT shard, pack, CAST(sum(n_toks) AS BIGINT) AS fl
                  FROM g GROUP BY 1, 2)
         SELECT CAST(count(*) AS BIGINT) AS n_packs,
                CAST(sum(fl) AS BIGINT) AS n_tokens,
                CAST(sum(CASE WHEN fl > 512 THEN 1 ELSE 0 END) AS BIGINT) AS n_oversized,
                round(CAST(sum(greatest(0, 512 - fl)) AS DOUBLE)
                      / CAST(sum(greatest(512, fl)) AS DOUBLE), 6) AS waste_frac,
                round(quantile_cont(fl, 0.5), 6) AS p50_fill
         FROM pk"""),

    "p21_seq_profile" ->
      """WITH n AS (SELECT source,
               CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_toks
             FROM documents)
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                round(quantile_cont(n_toks, 0.5), 6) AS p50_toks,
                round(quantile_cont(n_toks, 0.95), 6) AS p95_toks,
                CAST(max(n_toks) AS BIGINT) AS max_toks,
                CAST(sum(n_toks) AS BIGINT) AS total_toks
         FROM n GROUP BY 1 ORDER BY source""",

    "p13_epoch_repeat" ->
      // identical IEEE64 fraction math on both sides; the extra-copy
      // draw is the mixtureSample 5-hex-digit md5 prefix compare
      """WITH w AS (SELECT doc_id,
               CASE WHEN source IN ('src0','src1','src2','src3','src4')
                    THEN CAST(2.45 AS DOUBLE) ELSE CAST(0.7 AS DOUBLE) END AS ep
             FROM documents),
           c AS (SELECT doc_id, CAST(floor(ep) AS BIGINT)
                   + CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 5) <
                       printf('%05x', CAST(least(floor((ep - floor(ep)) * 1048576.0),
                                                 1048575.0) AS BIGINT))
                     THEN 1 ELSE 0 END AS copies
                 FROM w)
         SELECT doc_id, CAST(unnest(range(0, copies)) AS BIGINT) AS epoch
         FROM c WHERE copies > 0 ORDER BY doc_id, epoch""",

    "p14_weighted_sample" -> p14Oracle,

    "p15_pack_bestfit" ->
      // the BFD fold replayed per shard: LIST-of-fills state in the
      // recursive CTE, best fit = first position of the max feasible
      // fill (equal fills are interchangeable, so this IS the
      // lowest-index best fit — the operator's identical rule)
      """WITH RECURSIVE n AS (SELECT doc_id,
               CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_toks
             FROM documents),
           r AS (SELECT doc_id, doc_id // 128 AS shard, n_toks,
                   row_number() OVER (PARTITION BY doc_id // 128
                     ORDER BY n_toks DESC, doc_id) AS rn
                 FROM n WHERE n_toks > 0 AND doc_id IS NOT NULL),
           g AS (
             SELECT shard, rn, doc_id, n_toks,
                    CAST(0 AS BIGINT) AS pack, [n_toks] AS fills
             FROM r WHERE rn = 1
             UNION ALL
             SELECT r.shard, r.rn, r.doc_id, r.n_toks,
               CAST(CASE WHEN list_max(list_filter(g.fills, f -> f + r.n_toks <= 512)) IS NULL
                    THEN len(g.fills)
                    ELSE list_position(g.fills, list_max(list_filter(g.fills,
                           f -> f + r.n_toks <= 512))) - 1 END AS BIGINT),
               CASE WHEN list_max(list_filter(g.fills, f -> f + r.n_toks <= 512)) IS NULL
                    THEN list_append(g.fills, r.n_toks)
                    ELSE list_transform(range(1, len(g.fills) + 1), i ->
                      CASE WHEN i = list_position(g.fills, list_max(list_filter(g.fills,
                             f -> f + r.n_toks <= 512)))
                           THEN g.fills[i] + r.n_toks ELSE g.fills[i] END) END
             FROM g JOIN r ON r.shard = g.shard AND r.rn = g.rn + 1)
         SELECT doc_id, shard, pack FROM g ORDER BY doc_id""",

    "t30_stupid_backoff" -> t30Oracle,

    "t36_backoff_buckets" -> t36Oracle,

    "t33_heaps" ->
      // same prefix construction (first-doc vocab trick), same moment
      // discipline as the t24 oracle, beta un-negated
      """WITH mx AS (SELECT max(doc_id) + 1 AS span FROM documents),
            tk AS (SELECT doc_id, tok FROM (
                     SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
                     FROM documents WHERE doc_id IS NOT NULL)
                   WHERE len(tok) > 0),
            fi AS (SELECT tok, min(doc_id) AS mid FROM tk GROUP BY 1),
            ks AS (SELECT unnest(range(1, 9)) AS k),
            np AS (SELECT k, count(*) AS nn FROM ks, tk, mx
                   WHERE doc_id < (span * k) // 8 GROUP BY k),
            vp AS (SELECT k, count(*) AS vv FROM ks, fi, mx
                   WHERE mid < (span * k) // 8 GROUP BY k),
            pts AS (SELECT nn, vv FROM np JOIN vp USING (k)
                    WHERE nn > 0 AND vv > 0),
            t AS (SELECT
                CAST(round(ln(CAST(nn AS DOUBLE)), 6) AS DECIMAL(24,8)) AS x,
                CAST(round(ln(CAST(vv AS DOUBLE)), 6) AS DECIMAL(24,8)) AS y,
                CAST(round(ln(CAST(nn AS DOUBLE)) * ln(CAST(vv AS DOUBLE)), 6)
                  AS DECIMAL(24,8)) AS xy,
                CAST(round(ln(CAST(nn AS DOUBLE)) * ln(CAST(nn AS DOUBLE)), 6)
                  AS DECIMAL(24,8)) AS xx,
                CAST(round(ln(CAST(vv AS DOUBLE)) * ln(CAST(vv AS DOUBLE)), 6)
                  AS DECIMAL(24,8)) AS yy
              FROM pts),
            s AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx,
                         sum(y) AS sy, sum(xy) AS sxy, sum(xx) AS sxx,
                         sum(yy) AS syy FROM t)
         SELECT n AS n_points,
                round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS beta,
                round((CAST(sy AS DOUBLE)
                       - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                          / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                         * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS ln_k,
                round(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                       * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
                      / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                         * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r2
         FROM s""",

    "t34_bpe_train" -> (bpeCtes(8) + "\n" +
      (1 to 8).map(k =>
          s"SELECT CAST($k AS BIGINT) AS rank, pair, CAST(f AS BIGINT) AS freq FROM m$k")
        .mkString("", "\nUNION ALL ", "\nORDER BY rank")),

    "t37_bpe_fertility" -> (bpeCtes(8) +
      s""",
            tk AS (SELECT lang,
                     unnest(string_split_regex(lower(text), '\\s+')) AS w
                   FROM documents WHERE lang IS NOT NULL),
            seg AS (SELECT lang, len(w) AS ch,
                      ${(1 to 8).foldLeft("s0")((e, k) =>
                        s"replace($e, ' ' || m$k.pair || ' ', ' ' || replace(m$k.pair, ' ', '') || ' ')")} AS s
                    FROM (SELECT lang, w,
                            ' ' || array_to_string(string_split(w, ''), ' ') || ' ' AS s0
                          FROM tk WHERE w <> '') ${(1 to 8).map(k => s", m$k").mkString}),
            agg AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_words,
                           CAST(sum(ch) AS BIGINT) AS n_chars,
                           CAST(sum(len(string_split(trim(s), ' '))) AS BIGINT) AS n_bpe
                    FROM seg GROUP BY 1)
         SELECT lang, n_words, n_chars, n_bpe,
                round(CAST(n_bpe AS DOUBLE) / CAST(n_words AS DOUBLE), 6) AS fertility,
                round(CAST(n_chars AS DOUBLE) / CAST(n_bpe AS DOUBLE), 6) AS chars_per_token
         FROM agg ORDER BY lang"""),

    "t35_bpe_tokens" -> (bpeCtes(8) +
      // apply the learned table in rank order: the same padded
      // replaces, chained m1..m8 (cross joins of the 1-row argmax
      // CTEs; 8 merges always exist on these corpora — a vocabulary
      // too small to yield them would empty the chain in BOTH engines
      // asymmetrically, so keep merges <= the guaranteed supply)
      s""",
            tk AS (SELECT doc_id,
                     unnest(string_split_regex(lower(text), '\\s+')) AS w
                   FROM documents WHERE doc_id IS NOT NULL),
            seg AS (SELECT doc_id,
                      ${(1 to 8).foldLeft("s0")((e, k) =>
                        s"replace($e, ' ' || m$k.pair || ' ', ' ' || replace(m$k.pair, ' ', '') || ' ')")} AS s
                    FROM (SELECT doc_id,
                            ' ' || array_to_string(string_split(w, ''), ' ') || ' ' AS s0
                          FROM tk WHERE w <> '') ${(1 to 8).map(k => s", m$k").mkString}),
            perdoc AS (SELECT doc_id, sum(len(string_split(trim(s), ' '))) AS n
                       FROM seg GROUP BY 1)
         SELECT d.doc_id, CAST(coalesce(p.n, 0) AS BIGINT) AS n_bpe
         FROM (SELECT DISTINCT doc_id FROM documents WHERE doc_id IS NOT NULL) d
         LEFT JOIN perdoc p ON p.doc_id = d.doc_id
         ORDER BY d.doc_id"""),

    // t35's per-doc BPE counts flowing through p06's md5-order
    // cumulative-sum budget: identical training CTEs, identical
    // count chain, then the p06 window
    "p06b_token_budget_bpe" -> (bpeCtes(8) +
      s""",
            tk AS (SELECT doc_id,
                     unnest(string_split_regex(lower(text), '\\s+')) AS w
                   FROM documents WHERE doc_id IS NOT NULL),
            seg AS (SELECT doc_id,
                      ${(1 to 8).foldLeft("s0")((e, k) =>
                        s"replace($e, ' ' || m$k.pair || ' ', ' ' || replace(m$k.pair, ' ', '') || ' ')")} AS s
                    FROM (SELECT doc_id,
                            ' ' || array_to_string(string_split(w, ''), ' ') || ' ' AS s0
                          FROM tk WHERE w <> '') ${(1 to 8).map(k => s", m$k").mkString}),
            perdoc AS (SELECT doc_id, sum(len(string_split(trim(s), ' '))) AS n
                       FROM seg GROUP BY 1),
            nn AS (SELECT d.doc_id, CAST(coalesce(p.n, 0) AS BIGINT) AS n_bpe
                   FROM (SELECT DISTINCT doc_id FROM documents WHERE doc_id IS NOT NULL) d
                   LEFT JOIN perdoc p ON p.doc_id = d.doc_id),
            cc AS (SELECT doc_id, n_bpe,
                     sum(n_bpe) OVER (
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS cum
                   FROM nn)
         SELECT doc_id, n_bpe FROM cc WHERE cum <= 80000 ORDER BY doc_id"""),

    "t32_pmi" ->
      // identical pair/token streams and the identical
      // division-association in the PMI expression, rounded to 6
      """WITH tk AS (SELECT list_filter(string_split_regex(lower(text), '\s+'),
                       t -> len(t) > 0) AS toks FROM documents),
            pr AS (SELECT toks[i] AS w1, toks[i+1] AS w2
                   FROM (SELECT toks, unnest(range(1, len(toks))) AS i FROM tk)
                   WHERE len(toks) >= 2),
            bc AS (SELECT w1, w2, count(*) AS n_pair FROM pr GROUP BY 1, 2),
            m AS (SELECT sum(n_pair) AS m FROM bc),
            un AS (SELECT w, count(*) AS c FROM (
                     SELECT unnest(toks) AS w FROM tk) GROUP BY 1),
            n AS (SELECT sum(c) AS n FROM un),
            sc AS (SELECT b.w1, b.w2, b.n_pair,
                     round(ln((CAST(b.n_pair AS DOUBLE) / CAST(m.m AS DOUBLE)) /
                       ((CAST(ua.c AS DOUBLE) / CAST(n.n AS DOUBLE)) *
                        (CAST(ub.c AS DOUBLE) / CAST(n.n AS DOUBLE)))), 6) AS pmi
                   FROM bc b JOIN un ua ON ua.w = b.w1
                             JOIN un ub ON ub.w = b.w2
                   CROSS JOIN m CROSS JOIN n
                   WHERE b.n_pair >= 20)
         SELECT w1, w2, CAST(n_pair AS BIGINT) AS n_pair, pmi FROM (
           SELECT *, row_number() OVER (ORDER BY pmi DESC, w1, w2) AS rk FROM sc)
         WHERE rk <= 30 ORDER BY pmi DESC, w1, w2""",

    "t31_novelty" ->
      // identical tokenization/shingle unit as the d04 CTE, full
      // corpus (the df join is linear, unlike the pair joins)
      """WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
                    FROM documents),
            sh AS (SELECT DISTINCT doc_id,
                     toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS g
                   FROM (SELECT doc_id, toks,
                           unnest(range(1, len(toks) - 1)) AS i FROM t)),
            dfq AS (SELECT g, count(*) AS dfc FROM sh GROUP BY 1)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
                CAST(sum(CASE WHEN dfc = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
                round(CAST(sum(CASE WHEN dfc = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                      / count(*), 6) AS novelty
         FROM sh JOIN dfq USING (g) GROUP BY 1 ORDER BY doc_id""",

    "s10_pq" ->
      """WITH cb AS (SELECT vec_id AS code, embedding AS cv FROM embeddings WHERE vec_id < 16),
              e AS (SELECT vec_id, embedding AS ev FROM embeddings),
              sj AS (SELECT vec_id, ev, code, cv, j FROM e
                     CROSS JOIN cb CROSS JOIN (SELECT unnest(range(8)) AS j)),
              d AS (SELECT vec_id, j, code,
                      round(list_aggregate(list_transform(range(8), i ->
                          CAST(cv[j*8 + i + 1] AS DOUBLE) * CAST(cv[j*8 + i + 1] AS DOUBLE)), 'sum')
                        - 2 * list_aggregate(list_transform(range(8), i ->
                          CAST(ev[j*8 + i + 1] AS DOUBLE) * CAST(cv[j*8 + i + 1] AS DOUBLE)), 'sum'),
                        6) AS dist
                    FROM sj),
              r AS (SELECT vec_id, j, code, row_number() OVER (
                      PARTITION BY vec_id, j ORDER BY dist, code) AS rn FROM d)
         SELECT vec_id, CAST(j AS BIGINT) AS sub, code
         FROM r WHERE rn = 1 ORDER BY vec_id, sub""",

    "s11_pq_adc" ->
      """WITH cb AS (SELECT vec_id AS code, embedding AS cv FROM embeddings WHERE vec_id < 16),
              e AS (SELECT vec_id, embedding AS ev FROM embeddings),
              sj AS (SELECT vec_id, ev, code, cv, j FROM e
                     CROSS JOIN cb CROSS JOIN (SELECT unnest(range(8)) AS j)),
              dmat AS (SELECT vec_id, j, code,
                         round(list_aggregate(list_transform(range(8), i ->
                             CAST(cv[j*8 + i + 1] AS DOUBLE) * CAST(cv[j*8 + i + 1] AS DOUBLE)), 'sum')
                           - 2 * list_aggregate(list_transform(range(8), i ->
                             CAST(ev[j*8 + i + 1] AS DOUBLE) * CAST(cv[j*8 + i + 1] AS DOUBLE)), 'sum'),
                           6) AS dist
                       FROM sj),
              codes AS (SELECT vec_id, j, code FROM (
                          SELECT vec_id, j, code, row_number() OVER (
                            PARTITION BY vec_id, j ORDER BY dist, code) AS rn FROM dmat)
                        WHERE rn = 1),
              q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
              dt AS (SELECT qid, j, code,
                       round(list_aggregate(list_transform(range(8), i ->
                           CAST(cv[j*8 + i + 1] AS DOUBLE) * CAST(cv[j*8 + i + 1] AS DOUBLE)), 'sum')
                         - 2 * list_aggregate(list_transform(range(8), i ->
                           CAST(qv[j*8 + i + 1] AS DOUBLE) * CAST(cv[j*8 + i + 1] AS DOUBLE)), 'sum'),
                         6) AS dist
                     FROM q CROSS JOIN cb CROSS JOIN (SELECT unnest(range(8)) AS j)),
              s AS (SELECT dt.qid, c.vec_id AS nid,
                           round(CAST(sum(CAST(dt.dist AS DECIMAL(24,8))) AS DOUBLE), 6) AS adc_dist
                    FROM codes c JOIN dt ON dt.j = c.j AND dt.code = c.code
                    GROUP BY 1, 2),
              r2 AS (SELECT qid, nid, adc_dist, CAST(row_number() OVER (
                       PARTITION BY qid ORDER BY adc_dist, nid) AS BIGINT) AS rank FROM s)
         SELECT qid AS query_id, nid AS neighbor_id, adc_dist, rank
         FROM r2 WHERE rank <= 10 ORDER BY query_id, rank""",

    "s09_semdedup" ->
      """WITH c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < 8),
              e AS (SELECT vec_id, embedding AS ev FROM embeddings),
              u AS (SELECT vec_id, cid, sum(x*y) AS dot,
                           sqrt(sum(x*x)) AS ne, sqrt(sum(y*y)) AS nc
                    FROM (SELECT vec_id, cid, CAST(unnest(ev) AS DOUBLE) AS x,
                                 CAST(unnest(ce) AS DOUBLE) AS y FROM e, c)
                    GROUP BY 1, 2),
              a AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
                      ORDER BY round(dot/(ne*nc), 6) DESC, cid) AS rn FROM u),
              asg AS (SELECT vec_id, cid AS cluster FROM a WHERE rn = 1),
              pe AS (SELECT a1.vec_id AS id1, a2.vec_id AS id2, e1.ev AS v1, e2.ev AS v2
                     FROM asg a1 JOIN asg a2
                       ON a1.cluster = a2.cluster AND a1.vec_id < a2.vec_id
                     JOIN e e1 ON e1.vec_id = a1.vec_id
                     JOIN e e2 ON e2.vec_id = a2.vec_id),
              pu AS (SELECT id1, id2, sum(x*y) AS dot,
                            sqrt(sum(x*x)) AS n1, sqrt(sum(y*y)) AS n2
                     FROM (SELECT id1, id2, CAST(unnest(v1) AS DOUBLE) AS x,
                                  CAST(unnest(v2) AS DOUBLE) AS y FROM pe)
                     GROUP BY 1, 2),
              dups AS (SELECT DISTINCT id2 FROM pu WHERE dot/(n1*n2) >= 0.35)
         SELECT asg.vec_id, asg.cluster FROM asg
         LEFT JOIN dups ON asg.vec_id = dups.id2
         WHERE dups.id2 IS NULL ORDER BY vec_id""",

    "t07_redact" ->
      """SELECT doc_id,
                regexp_replace(
                  regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                                 '<EMAIL>', 'g'),
                  '[0-9]{9,}', '<NUM>', 'g') AS redacted
         FROM documents ORDER BY doc_id""",

    "t06_heavy_hitters" ->
      """SELECT event_type AS item, CAST(count(*) AS BIGINT) AS cnt
         FROM events GROUP BY 1 ORDER BY cnt DESC, item""",

    "t01_lang_id" -> langIdOracle,

    "t40_code_switch" -> {
      // sentence explode (the d23 segmentation) -> the shared langId
      // chain -> per-doc histogram + dominant pick with the same
      // (count desc, lang asc) tie-break
      val perSentence = langIdOver(
        """(SELECT doc_id, lower(sent) AS txt,
                   string_split_regex(lower(sent), '\s+') AS toks
            FROM (SELECT doc_id, trim(s) AS sent FROM (
                    SELECT doc_id, unnest(regexp_extract_all(text,
                      '[^.!?]+[.!?]+|[^.!?]+')) AS s
                    FROM documents))
            WHERE sent <> '')""", "doc_id")
      s"""WITH lp AS ($perSentence),
            lc AS (SELECT doc_id, lang_pred, CAST(count(*) AS BIGINT) AS c
                   FROM lp GROUP BY 1, 2),
            rk AS (SELECT doc_id, lang_pred, c,
                     row_number() OVER (PARTITION BY doc_id
                       ORDER BY c DESC, lang_pred) AS rn,
                     sum(c) OVER (PARTITION BY doc_id) AS tot,
                     count(*) OVER (PARTITION BY doc_id) AS nl
                   FROM lc)
         SELECT doc_id, CAST(tot AS BIGINT) AS n_sents,
                CAST(nl AS BIGINT) AS n_langs,
                lang_pred AS dominant_lang,
                round(CAST(c AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS dominant_share,
                (nl > 1 AND round(CAST(c AS DOUBLE) / CAST(tot AS DOUBLE), 6) < 0.9)
                  AS is_mixed
         FROM rk WHERE rn = 1 ORDER BY doc_id"""
    },

    "t05_lang_eval" ->
      s"""WITH pred AS ($langIdOracle)
          SELECT d.lang, p.lang_pred, CAST(count(*) AS BIGINT) AS n
          FROM documents d JOIN pred p ON d.doc_id = p.doc_id
          GROUP BY 1, 2 ORDER BY 1, 2""",

    "t02_quality" -> (s"SELECT doc_id, quality FROM ($qualitySubSql)" +
      " ORDER BY doc_id"),

    "t03_tokens" ->
      """SELECT doc_id,
                CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                     ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_ws,
                CAST(len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+')) AS BIGINT) AS n_bpe
         FROM documents ORDER BY doc_id""",

    "t04_fingerprint" ->
      """SELECT min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n
         FROM documents GROUP BY text ORDER BY keep_id""",

    "m01_multimodal" ->
      // byte-level, not codepoint-level: hex(encode(text)) is the UTF-8
      // byte sequence, each byte decoded from its two hex digits — so
      // the equivalence with fakeDecode's byte stats is structural and
      // holds for multi-byte text, not just ASCII
      """WITH h AS (SELECT doc_id, hex(encode(text)) AS hx, strlen(text) AS n
                    FROM documents),
              b AS (SELECT doc_id, n,
                      list_transform(range(1, n + 1),
                        i -> (strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1)) - 1) * 16
                             + (strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1)) AS bytes
                    FROM h)
         SELECT doc_id, CAST(n AS BIGINT) AS n_bytes,
                CAST(coalesce(bytes[1], 0) AS INT) AS head_byte,
                round(CASE WHEN n = 0 THEN 0.0
                      ELSE CAST(list_aggregate(bytes, 'sum') AS DOUBLE)
                           / CAST(n AS DOUBLE) END, 6) AS byte_mean,
                CAST(8 AS BIGINT) AS feat_dim
         FROM b ORDER BY doc_id""",

    "m06_alignment" ->
      // image tower = the m01 byte-fold replay (8 cells); text tower
      // = the s08 projection expr at 8 dims; same cosine + keep CASE
      """WITH h AS (SELECT doc_id, hex(encode(text)) AS hx, strlen(text) AS n
                    FROM documents WHERE doc_id < 500),
            pos AS (SELECT doc_id, hx, unnest(range(1, n + 1)) AS i FROM h),
            byt AS (SELECT doc_id, (i - 1) % 8 AS k,
                      (strpos('0123456789ABCDEF', substr(hx, 2*i - 1, 1)) - 1) * 16
                      + (strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1) AS v
                    FROM pos),
            f0 AS (SELECT doc_id, k, sum(v) AS fv FROM byt GROUP BY 1, 2),
            grid AS (SELECT doc_id, unnest(range(0, 8)) AS k FROM h),
            feat AS (SELECT g.doc_id, g.k, CAST(coalesce(f0.fv, 0) AS DOUBLE) AS f
                     FROM grid g LEFT JOIN f0
                       ON f0.doc_id = g.doc_id AND f0.k = g.k),
            tp AS (SELECT vec_id, j,
                     round(list_aggregate(list_transform(range(len(embedding)),
                       i -> CAST(embedding[i + 1] AS DOUBLE) *
                            (CASE WHEN (strpos('0123456789abcdef',
                                substr(md5(CAST(i AS VARCHAR) || ':' ||
                                  CAST(j AS VARCHAR)), 1, 1)) - 1) % 2 = 0
                              THEN 1 ELSE -1 END)), 'sum'), 6) AS p
                   FROM embeddings CROSS JOIN (SELECT unnest(range(8)) AS j)),
            d AS (SELECT f.doc_id,
                    sum(f.f * t.p) AS dot,
                    sqrt(sum(f.f * f.f)) AS nf,
                    sqrt(sum(t.p * t.p)) AS nt
                  FROM feat f JOIN tp t ON t.vec_id = f.doc_id AND t.j = f.k
                  GROUP BY 1)
         SELECT doc_id,
                CASE WHEN nf > 0 AND nt > 0 THEN round(dot / (nf * nt), 6) END AS align_cos,
                CASE WHEN nf > 0 AND nt > 0 THEN round(dot / (nf * nt), 6) >= 0.0 END AS keep
         FROM d ORDER BY doc_id""",

    "m10_phash_resolve" ->
      // the m05 pHash pair chain verbatim, then the d06 recursive-CTE
      // component resolution with min-id canonicals
      """WITH RECURSIVE h AS (SELECT doc_id, hex(encode(text)) AS hx, strlen(text) AS n
                    FROM documents WHERE doc_id < 500),
            pos AS (SELECT doc_id, hx, unnest(range(1, n + 1)) AS i FROM h),
            byt AS (SELECT doc_id, (i - 1) % 64 AS j,
                      (strpos('0123456789ABCDEF', substr(hx, 2*i - 1, 1)) - 1) * 16
                      + (strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1) AS v
                    FROM pos),
            cellv AS (SELECT doc_id, j, sum(v) AS cv FROM byt GROUP BY 1, 2),
            grid AS (SELECT doc_id, unnest(range(0, 64)) AS j FROM h),
            cells AS (SELECT g.doc_id, g.j, coalesce(c.cv, 0) AS cv
                      FROM grid g LEFT JOIN cellv c
                        ON c.doc_id = g.doc_id AND c.j = g.j),
            bits AS (SELECT a.doc_id, a.j,
                       CASE WHEN a.cv > b.cv THEN 1 ELSE 0 END AS bit
                     FROM cells a JOIN cells b
                       ON b.doc_id = a.doc_id AND b.j = (a.j + 1) % 64),
            chunks AS (SELECT doc_id,
                         CAST(sum(CASE WHEN j // 16 = 0 THEN bit * (1 << (15 - j % 16)) ELSE 0 END) AS BIGINT) AS f0,
                         CAST(sum(CASE WHEN j // 16 = 1 THEN bit * (1 << (15 - j % 16)) ELSE 0 END) AS BIGINT) AS f1,
                         CAST(sum(CASE WHEN j // 16 = 2 THEN bit * (1 << (15 - j % 16)) ELSE 0 END) AS BIGINT) AS f2,
                         CAST(sum(CASE WHEN j // 16 = 3 THEN bit * (1 << (15 - j % 16)) ELSE 0 END) AS BIGINT) AS f3
                       FROM bits GROUP BY 1),
            prs AS (SELECT id1, id2 FROM (
                      SELECT a.doc_id AS id1, b.doc_id AS id2,
                             bit_count(xor(a.f0, b.f0)) + bit_count(xor(a.f1, b.f1))
                           + bit_count(xor(a.f2, b.f2)) + bit_count(xor(a.f3, b.f3)) AS hm
                      FROM chunks a JOIN chunks b ON a.doc_id < b.doc_id)
                    WHERE hm <= 3),
            edges AS (SELECT id1 AS a, id2 AS b FROM prs
                      UNION SELECT id2, id1 FROM prs),
            reach(a, b) AS (SELECT a, b FROM edges
                            UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
            comp AS (SELECT a AS id, least(a, min(b)) AS component FROM reach GROUP BY a),
            allc AS (SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
                     FROM (SELECT doc_id FROM documents WHERE doc_id < 500) d
                     LEFT JOIN comp c ON c.id = d.doc_id)
         SELECT doc_id, component,
                CAST(count(*) OVER (PARTITION BY component) AS BIGINT) AS n_members,
                doc_id = component AS is_canonical
         FROM allc ORDER BY doc_id""",

    "m05_phash_pairs" ->
      // byte-level dHash replay (the m01 hex-parse rule): cell[j] =
      // sum of bytes at positions ≡ j (mod 64), bit j compares
      // neighbor cells, chunks pack 16 bits each; pairs are the FULL
      // quadratic cross join at hamming <= 3 — banding completeness
      // is part of what the hash-match proves
      """WITH h AS (SELECT doc_id, hex(encode(text)) AS hx, strlen(text) AS n
                    FROM documents WHERE doc_id < 500),
            pos AS (SELECT doc_id, hx, unnest(range(1, n + 1)) AS i FROM h),
            byt AS (SELECT doc_id, (i - 1) % 64 AS j,
                      (strpos('0123456789ABCDEF', substr(hx, 2*i - 1, 1)) - 1) * 16
                      + (strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1) AS v
                    FROM pos),
            cellv AS (SELECT doc_id, j, sum(v) AS cv FROM byt GROUP BY 1, 2),
            grid AS (SELECT doc_id, unnest(range(0, 64)) AS j FROM h),
            cells AS (SELECT g.doc_id, g.j, coalesce(c.cv, 0) AS cv
                      FROM grid g LEFT JOIN cellv c
                        ON c.doc_id = g.doc_id AND c.j = g.j),
            bits AS (SELECT a.doc_id, a.j,
                       CASE WHEN a.cv > b.cv THEN 1 ELSE 0 END AS bit
                     FROM cells a JOIN cells b
                       ON b.doc_id = a.doc_id AND b.j = (a.j + 1) % 64),
            chunks AS (SELECT doc_id,
                         CAST(sum(CASE WHEN j // 16 = 0 THEN bit * (1 << (15 - j % 16)) ELSE 0 END) AS BIGINT) AS f0,
                         CAST(sum(CASE WHEN j // 16 = 1 THEN bit * (1 << (15 - j % 16)) ELSE 0 END) AS BIGINT) AS f1,
                         CAST(sum(CASE WHEN j // 16 = 2 THEN bit * (1 << (15 - j % 16)) ELSE 0 END) AS BIGINT) AS f2,
                         CAST(sum(CASE WHEN j // 16 = 3 THEN bit * (1 << (15 - j % 16)) ELSE 0 END) AS BIGINT) AS f3
                       FROM bits GROUP BY 1)
         SELECT id1, id2, hamming FROM (
           SELECT a.doc_id AS id1, b.doc_id AS id2,
                  CAST(bit_count(xor(a.f0, b.f0)) + bit_count(xor(a.f1, b.f1))
                     + bit_count(xor(a.f2, b.f2)) + bit_count(xor(a.f3, b.f3)) AS BIGINT) AS hamming
           FROM chunks a JOIN chunks b ON a.doc_id < b.doc_id)
         WHERE hamming <= 3 ORDER BY id1, id2""",

    "m07_audio_overlap" ->
      // chunk contents joined RAW (hex-slice equality) — md5 is only
      // Spark's shuffle-key compression, so byte equality is the same
      // relation and the pair counts hash-match
      """WITH h AS (SELECT doc_id, hex(encode(text)) AS hx, strlen(text) AS n
                    FROM documents WHERE doc_id < 500 AND strlen(text) > 0),
            c AS (SELECT doc_id, substr(hx, 2 * chunk_idx * 100 + 1, 200) AS ck
                  FROM (SELECT doc_id, hx,
                          unnest(range(0, (n + 99) // 100)) AS chunk_idx
                        FROM h)),
            d AS (SELECT DISTINCT doc_id, ck FROM c),
            p AS (SELECT a.doc_id AS id1, b.doc_id AS id2,
                         CAST(count(*) AS BIGINT) AS n_shared
                  FROM d a JOIN d b ON a.ck = b.ck AND a.doc_id < b.doc_id
                  GROUP BY 1, 2)
         SELECT id1, id2, n_shared FROM p ORDER BY id1, id2""",

    "m11_silence_segments" ->
      // the m04 hex chunk grid with exact byte SUMS, the integer
      // threshold cross-multiplication, then row_number islands
      """WITH h AS (SELECT doc_id, hex(encode(text)) AS hx, strlen(text) AS n
                    FROM documents),
            c AS (SELECT doc_id, hx, n,
                    unnest(range(0, greatest((n + 99) // 100, 1))) AS chunk_idx
                  FROM h),
            s AS (SELECT doc_id, chunk_idx, chunk_idx * 100 AS off,
                         least(n, chunk_idx * 100 + 100) - chunk_idx * 100 AS nb, hx
                  FROM c),
            e AS (SELECT doc_id, chunk_idx,
                    CASE WHEN nb = 0 THEN 0 ELSE
                      CAST(list_aggregate(list_transform(range(1, nb + 1),
                        i -> (strpos('0123456789ABCDEF', substr(hx, 2*(off + i) - 1, 1)) - 1) * 16
                             + (strpos('0123456789ABCDEF', substr(hx, 2*(off + i), 1)) - 1)),
                        'sum') AS BIGINT) END AS e
                  FROM s),
            t AS (SELECT doc_id, CAST(sum(e) AS BIGINT) AS tot,
                         CAST(count(*) AS BIGINT) AS nc
                  FROM e GROUP BY 1),
            a AS (SELECT e.doc_id, e.chunk_idx FROM e JOIN t USING (doc_id)
                  WHERE e.e * 4 * t.nc > 3 * t.tot),
            i AS (SELECT doc_id, chunk_idx,
                    chunk_idx - row_number() OVER (PARTITION BY doc_id
                      ORDER BY chunk_idx) AS isl
                  FROM a),
            g AS (SELECT doc_id, isl,
                    CAST(min(chunk_idx) AS BIGINT) AS start_chunk,
                    CAST(max(chunk_idx) AS BIGINT) AS end_chunk,
                    CAST(count(*) AS BIGINT) AS n_chunks
                  FROM i GROUP BY 1, 2)
         SELECT doc_id,
                CAST(row_number() OVER (PARTITION BY doc_id
                  ORDER BY start_chunk) AS BIGINT) AS seg_idx,
                start_chunk, end_chunk, n_chunks
         FROM g ORDER BY doc_id, seg_idx""",

    "m04_audio_chunks" ->
      """WITH h AS (SELECT doc_id, hex(encode(text)) AS hx, strlen(text) AS n
                    FROM documents),
            c AS (SELECT doc_id, hx, n,
                    unnest(range(0, greatest((n + 99) // 100, 1))) AS chunk_idx
                  FROM h),
            s AS (SELECT doc_id, chunk_idx, chunk_idx * 100 AS off,
                         least(n, chunk_idx * 100 + 100) - chunk_idx * 100 AS nb, hx
                  FROM c),
            b AS (SELECT doc_id, chunk_idx, off, nb,
                    CASE WHEN nb = 0 THEN 0.0 ELSE
                      CAST(list_aggregate(list_transform(range(1, nb + 1),
                        i -> (strpos('0123456789ABCDEF', substr(hx, 2*(off + i) - 1, 1)) - 1) * 16
                             + (strpos('0123456789ABCDEF', substr(hx, 2*(off + i), 1)) - 1)),
                        'sum') AS DOUBLE) / nb END AS bm
                  FROM s)
         SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
                CAST(off AS BIGINT) AS offset, CAST(nb AS BIGINT) AS n_bytes,
                round(bm, 6) AS byte_mean
         FROM b ORDER BY doc_id, chunk_idx""",

    "m02_frames" ->
      """WITH d AS (SELECT doc_id, strlen(text) AS len FROM documents),
              f AS (SELECT doc_id, len, greatest(1, len // 4) AS step,
                           unnest(range(least(4, greatest(1, len)))) AS frame_idx
                    FROM d)
         SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
                CAST(least(len, frame_idx * step + step) - frame_idx * step AS BIGINT)
                  AS frame_bytes
         FROM f ORDER BY doc_id, frame_idx""",

    "m08_scene_changes" ->
      // the m02 frame grid + the m04 hex byte parse: per-frame 8-bin
      // byte folds are exact integers, so dist2 is pure BIGINT math
      """WITH h AS (SELECT doc_id, hex(encode(text)) AS hx, strlen(text) AS len
                    FROM documents),
            f AS (SELECT doc_id, hx, len, greatest(1, len // 4) AS step,
                         unnest(range(least(4, greatest(1, len)))) AS fi
                  FROM h),
            w AS (SELECT doc_id, fi, hx, fi * step AS frm,
                         least(len, fi * step + step) AS til
                  FROM f),
            b AS (SELECT doc_id, fi, (i - frm) % 8 AS j,
                    (strpos('0123456789ABCDEF', substr(hx, 2*i + 1, 1)) - 1) * 16
                    + (strpos('0123456789ABCDEF', substr(hx, 2*i + 2, 1)) - 1) AS byte
                  FROM (SELECT doc_id, fi, hx, frm, til,
                          unnest(range(frm, til)) AS i FROM w)),
            ft AS (SELECT doc_id, fi, j, CAST(sum(byte) AS BIGINT) AS v
                   FROM b GROUP BY 1, 2, 3),
            grid AS (SELECT doc_id, fi, unnest(range(8)) AS j
                     FROM (SELECT DISTINCT doc_id, fi FROM f)),
            fv AS (SELECT g.doc_id, g.fi, g.j, coalesce(ft.v, 0) AS v
                   FROM grid g LEFT JOIN ft
                     ON ft.doc_id = g.doc_id AND ft.fi = g.fi AND ft.j = g.j),
            d2 AS (SELECT a.doc_id, a.fi,
                     CAST(sum((a.v - b.v) * (a.v - b.v)) AS BIGINT) AS dist2
                   FROM fv a JOIN fv b
                     ON b.doc_id = a.doc_id AND b.fi = a.fi - 1 AND b.j = a.j
                   GROUP BY 1, 2)
         SELECT doc_id, CAST(fi AS BIGINT) AS frame_idx, dist2,
                dist2 > 150000 AS is_boundary
         FROM d2 ORDER BY doc_id, frame_idx""",

    "m09_keyframes" ->
      // m08's feature chain + per-frame energy, boundary-count scene
      // ids, and a (energy DESC, fi) row_number argmax per scene
      """WITH h AS (SELECT doc_id, hex(encode(text)) AS hx, strlen(text) AS len
                    FROM documents),
            f AS (SELECT doc_id, hx, len, greatest(1, len // 4) AS step,
                         unnest(range(least(4, greatest(1, len)))) AS fi
                  FROM h),
            w AS (SELECT doc_id, fi, hx, fi * step AS frm,
                         least(len, fi * step + step) AS til
                  FROM f),
            b AS (SELECT doc_id, fi, (i - frm) % 8 AS j,
                    (strpos('0123456789ABCDEF', substr(hx, 2*i + 1, 1)) - 1) * 16
                    + (strpos('0123456789ABCDEF', substr(hx, 2*i + 2, 1)) - 1) AS byte
                  FROM (SELECT doc_id, fi, hx, frm, til,
                          unnest(range(frm, til)) AS i FROM w)),
            ft AS (SELECT doc_id, fi, j, CAST(sum(byte) AS BIGINT) AS v
                   FROM b GROUP BY 1, 2, 3),
            grid AS (SELECT doc_id, fi, unnest(range(8)) AS j
                     FROM (SELECT DISTINCT doc_id, fi FROM f)),
            fv AS (SELECT g.doc_id, g.fi, g.j, coalesce(ft.v, 0) AS v
                   FROM grid g LEFT JOIN ft
                     ON ft.doc_id = g.doc_id AND ft.fi = g.fi AND ft.j = g.j),
            en AS (SELECT doc_id, fi, CAST(sum(v * v) AS BIGINT) AS energy
                   FROM fv GROUP BY 1, 2),
            d2 AS (SELECT a.doc_id, a.fi,
                     CAST(sum((a.v - b.v) * (a.v - b.v)) AS BIGINT) AS dist2
                   FROM fv a JOIN fv b
                     ON b.doc_id = a.doc_id AND b.fi = a.fi - 1 AND b.j = a.j
                   GROUP BY 1, 2),
            sc AS (SELECT en.doc_id, en.fi, en.energy,
                     sum(CASE WHEN d2.dist2 > 150000 THEN 1 ELSE 0 END) OVER (
                       PARTITION BY en.doc_id ORDER BY en.fi
                       ROWS UNBOUNDED PRECEDING) AS scene
                   FROM en LEFT JOIN d2
                     ON d2.doc_id = en.doc_id AND d2.fi = en.fi),
            r AS (SELECT doc_id, scene, fi, energy,
                    row_number() OVER (PARTITION BY doc_id, scene
                      ORDER BY energy DESC, fi) AS rn,
                    count(*) OVER (PARTITION BY doc_id, scene) AS nf
                  FROM sc)
         SELECT doc_id, CAST(scene AS BIGINT) AS scene,
                CAST(nf AS BIGINT) AS n_frames,
                CAST(fi AS BIGINT) AS keyframe_idx, energy
         FROM r WHERE rn = 1 ORDER BY doc_id, scene""",

    "m03_resize" ->
      """SELECT doc_id, CAST(32 AS BIGINT) AS width, CAST(32 AS BIGINT) AS height,
                CAST(strlen(text) AS BIGINT) AS in_bytes,
                CAST(least(strlen(text), 1024) AS BIGINT) AS out_bytes
         FROM documents ORDER BY doc_id""",

    "p23_length_batches" ->
      // plain per-bucket rank window single-node; the Spark side is
      // the distributed prefix count
      """WITH tk AS (SELECT doc_id,
                       CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE len(string_split_regex(trim(text), '\s+')) END
                         AS BIGINT) AS n
                     FROM documents),
            b AS (SELECT doc_id, n,
                    CAST(CASE WHEN n <= 64 THEN 64 WHEN n <= 128 THEN 128
                         WHEN n <= 256 THEN 256 WHEN n <= 512 THEN 512
                         WHEN n <= 1024 THEN 1024 ELSE 2048 END AS BIGINT) AS cap,
                    md5('b:' || CAST(doc_id AS VARCHAR)) AS h
                  FROM tk),
            r AS (SELECT *, CAST(row_number() OVER (PARTITION BY cap
                    ORDER BY h, doc_id) AS BIGINT) AS rank_in_bucket FROM b)
         SELECT doc_id, n AS n_toks, cap AS bucket_cap, rank_in_bucket,
                (rank_in_bucket - 1) // 16 AS batch_idx,
                cap - least(n, cap) AS pad_tokens
         FROM r ORDER BY doc_id""",

    "p01_pack" ->
      // the oracle computes the same packing with a plain global
      // cumsum — fine single-node; the Spark side is the distributed
      // prefix sum
      """WITH tk AS (SELECT doc_id,
                       CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE len(string_split_regex(trim(text), '\s+')) END
                         AS BIGINT) AS n_toks
                     FROM documents),
              c AS (SELECT doc_id, n_toks,
                       coalesce(sum(n_toks) OVER (ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
                    FROM tk)
         SELECT doc_id, n_toks,
                CAST(cb // 2048 AS BIGINT) AS seq_start,
                CAST((cb + n_toks - 1) // 2048 AS BIGINT) AS seq_end,
                CAST(cb % 2048 AS BIGINT) AS seq_off
         FROM c WHERE n_toks > 0 ORDER BY doc_id""",

    "p02_mixture" ->
      // identical IEEE64 rate math on both sides: w * (total*0.5) / n,
      // floored once into a 5-hex-digit md5 prefix threshold
      """WITH w AS (SELECT doc_id, source,
                      CASE WHEN source IN ('src0','src1','src2','src3','src4')
                           THEN CAST(0.08 AS DOUBLE)
                           ELSE CAST(0.6 AS DOUBLE) / CAST(15.0 AS DOUBLE) END AS w
                    FROM documents),
            cs AS (SELECT source, CAST(count(*) AS BIGINT) AS n, min(w) AS w
                   FROM w GROUP BY 1),
            tt AS (SELECT sum(n) AS total FROM cs),
           thr AS (SELECT source,
                      printf('%05x', CAST(least(floor(least(
                        w * (CAST(total AS DOUBLE) * 0.5) / CAST(n AS DOUBLE),
                        1.0) * 1048576.0), 1048575.0) AS BIGINT)) AS t
                   FROM cs CROSS JOIN tt)
         SELECT d.source, CAST(count(*) AS BIGINT) AS n_kept
         FROM documents d JOIN thr ON d.source = thr.source
         WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 5) < thr.t
         GROUP BY 1 ORDER BY 1""",

    "p03_shard" ->
      """WITH h AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h
                    FROM documents)
         SELECT doc_id,
                CAST(strpos('0123456789abcdef', substr(h, 1, 1)) - 1 AS BIGINT)
                  AS shard,
                CAST(row_number() OVER (
                  PARTITION BY strpos('0123456789abcdef', substr(h, 1, 1))
                  ORDER BY substr(h, 2), doc_id) AS BIGINT) AS pos
         FROM h ORDER BY doc_id""",

    "t11_normalize" ->
      """WITH n AS (SELECT doc_id, text,
                      trim(regexp_replace(regexp_replace(text,
                        '[\x00-\x1f\x7f]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
                    FROM documents)
         SELECT doc_id, CAST(length(text) AS BIGINT) AS n_raw,
                CAST(length(norm) AS BIGINT) AS n_norm,
                CAST(CASE WHEN norm <> text THEN 1 ELSE 0 END AS BIGINT) AS changed,
                norm AS norm_text
         FROM n ORDER BY doc_id""",

    "t12_boilerplate" ->
      """WITH framed AS (SELECT doc_id,
               'subscribe to our newsletter' || chr(10) || text || chr(10) ||
               CASE WHEN doc_id % 2 = 0 THEN 'all rights reserved'
                    ELSE 'thanks for reading' END ||
               chr(10) || 'ref ' || doc_id AS text
             FROM documents),
            ls AS (SELECT doc_id, string_split(text, chr(10)) AS a FROM framed),
            lines AS (SELECT doc_id, a[i] AS line, i
                      FROM (SELECT doc_id, a, unnest(range(1, len(a) + 1)) AS i
                            FROM ls)),
            freq AS (SELECT line FROM (
                       SELECT line, count(DISTINCT doc_id) AS nd
                       FROM lines GROUP BY 1)
                     WHERE nd >= 100 AND len(line) > 0),
            tot AS (SELECT doc_id, count(*) AS n_tot FROM lines GROUP BY 1),
            kept AS (SELECT doc_id, line, i FROM lines
                     WHERE line NOT IN (SELECT line FROM freq))
         SELECT k.doc_id,
                string_agg(k.line, chr(10) ORDER BY k.i) AS text_clean,
                CAST(count(*) AS BIGINT) AS n_kept,
                CAST(any_value(t.n_tot) - count(*) AS BIGINT) AS n_dropped
         FROM kept k JOIN tot t ON k.doc_id = t.doc_id
         GROUP BY k.doc_id ORDER BY k.doc_id""",

    "t15_collapse_runs" ->
      """WITH framed AS (SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN 'loading...' || chr(10) ELSE '' END ||
               'loading...' || chr(10) || text || chr(10) || text || chr(10) || 'done' AS text
             FROM documents),
            ls AS (SELECT doc_id, string_split(text, chr(10)) AS a FROM framed),
            lines AS (SELECT doc_id, a[i] AS line, i
                      FROM (SELECT doc_id, a, unnest(range(1, len(a) + 1)) AS i
                            FROM ls)),
            marked AS (SELECT doc_id, line, i,
                         lag(line) OVER (PARTITION BY doc_id ORDER BY i) AS prev
                       FROM lines),
            kept AS (SELECT doc_id, line, i FROM marked
                     WHERE prev IS NULL OR prev <> line),
            tot AS (SELECT doc_id, count(*) AS n_tot FROM lines GROUP BY 1)
         SELECT k.doc_id,
                string_agg(k.line, chr(10) ORDER BY k.i) AS text_clean,
                CAST(count(*) AS BIGINT) AS n_kept,
                CAST(any_value(t.n_tot) - count(*) AS BIGINT) AS n_dropped
         FROM kept k JOIN tot t ON k.doc_id = t.doc_id
         GROUP BY k.doc_id ORDER BY k.doc_id""",

    "t27_c4_line_filter" ->
      """WITH framed AS (SELECT doc_id,
               'home | about | contact' || chr(10) ||
               'this page is archived for reference.' || chr(10) ||
               text || '.' || chr(10) ||
               'comments are closed on this article.' || chr(10) ||
               'please enable javascript to continue.' || chr(10) ||
               'read our privacy policy.' ||
               CASE WHEN doc_id % 97 = 0
                    THEN chr(10) || 'lorem ipsum dolor sit amet.' ELSE '' END ||
               CASE WHEN doc_id % 89 = 0
                    THEN chr(10) || 'function() { return; }' ELSE '' END AS text
             FROM documents),
            pages AS (SELECT doc_id, text FROM framed
                      WHERE NOT contains(lower(text), 'lorem ipsum')
                        AND NOT contains(text, '{')),
            ls AS (SELECT doc_id, string_split_regex(text, '\r?\n') AS a FROM pages),
            lines AS (SELECT doc_id, a[i] AS line, i
                      FROM (SELECT doc_id, a, unnest(range(1, len(a) + 1)) AS i
                            FROM ls)),
            kept AS (SELECT doc_id, line, i FROM lines
                     WHERE regexp_matches(trim(line), '[.!?"]$')
                       AND len(string_split_regex(trim(line), '\s+')) >= 3
                       AND NOT contains(lower(trim(line)), 'javascript')
                       AND NOT contains(lower(trim(line)), 'privacy policy')
                       AND NOT contains(lower(trim(line)), 'terms of use')
                       AND NOT contains(lower(trim(line)), 'cookie policy')
                       AND NOT contains(lower(trim(line)), 'uses cookies')
                       AND NOT contains(lower(trim(line)), 'use of cookies')
                       AND NOT contains(lower(trim(line)), 'use cookies')),
            tot AS (SELECT doc_id, count(*) AS n_tot FROM lines GROUP BY 1)
         SELECT k.doc_id,
                string_agg(k.line, chr(10) ORDER BY k.i) AS text_clean,
                CAST(count(*) AS BIGINT) AS n_kept,
                CAST(any_value(t.n_tot) - count(*) AS BIGINT) AS n_dropped
         FROM kept k JOIN tot t ON k.doc_id = t.doc_id
         GROUP BY k.doc_id HAVING count(*) >= 3 ORDER BY k.doc_id""",

    "t28_readability" ->
      """WITH framed AS (SELECT doc_id,
               'a short opening line. ' || text || '. the closing line ends here.' AS text
             FROM documents),
            s0 AS (SELECT doc_id,
                     len(list_filter(list_transform(
                       regexp_extract_all(text, '[^.!?]+[.!?]+|[^.!?]+'),
                       x -> trim(x)), x -> len(x) > 0)) AS n_sents,
                     list_filter(string_split_regex(lower(text), '\s+'),
                       t -> len(t) > 0) AS ws
                   FROM framed),
            s1 AS (SELECT doc_id, n_sents, len(ws) AS n_words,
                     list_sum(list_transform(ws,
                       w -> greatest(1, len(regexp_extract_all(w, '[aeiouy]+'))))) AS n_syllables
                   FROM s0)
         SELECT doc_id,
                CAST(n_sents AS BIGINT) AS n_sents,
                CAST(n_words AS BIGINT) AS n_words,
                CAST(n_syllables AS BIGINT) AS n_syllables,
                round(0.39 * (CAST(n_words AS DOUBLE) / CAST(n_sents AS DOUBLE)) +
                      11.8 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)) -
                      15.59, 6) AS fk_grade
         FROM s1 WHERE n_words > 0 AND n_sents > 0 ORDER BY doc_id""",

    "t17_bm25" -> t17Oracle,

    "t39_sentence_stats" ->
      // same terminal-punctuation split, trim, empty drop, word count
      """WITH s AS (SELECT doc_id, trim(x) AS sent FROM (
                SELECT doc_id, unnest(string_split_regex(text, '[.!?]+')) AS x
                FROM documents)
              WHERE length(trim(x)) > 0),
            w AS (SELECT doc_id,
                    CAST(len(string_split_regex(sent, '\s+')) AS BIGINT) AS w
                  FROM s)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sentences,
                round(CAST(sum(w) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
                  AS mean_words,
                CAST(max(w) AS BIGINT) AS max_words
         FROM w GROUP BY 1 ORDER BY 1""",

    "t38_tfidf_terms" ->
      // the t17 token chain verbatim; (tf/dl)*ln(N/df) in pinned
      // order; post-round ties rank by term
      """WITH tk AS (SELECT doc_id, tok AS term FROM (
                SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
                FROM documents) WHERE len(tok) > 0),
            tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
                   FROM tk GROUP BY 1, 2),
            dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
            dft AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
            n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM dl),
            sc AS (SELECT doc_id, term,
                     round((CAST(tf AS DOUBLE) / CAST(dl AS DOUBLE))
                           * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)), 6)
                       AS tfidf
                   FROM tf JOIN dl USING (doc_id) JOIN dft USING (term)
                   CROSS JOIN n)
         SELECT doc_id, term, tfidf, CAST(rk AS BIGINT) AS rank FROM (
           SELECT doc_id, term, tfidf,
                  row_number() OVER (PARTITION BY doc_id
                    ORDER BY tfidf DESC, term) AS rk FROM sc)
         WHERE rk <= 3 ORDER BY doc_id, rank""",

    "t18_ppl_buckets" ->
      """WITH tk AS (SELECT doc_id, tok FROM (
                SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
                FROM documents) WHERE len(tok) > 0),
            vocab AS (SELECT tok, count(*) AS n FROM tk GROUP BY 1),
            tt AS (SELECT sum(n) AS total FROM vocab),
            sc AS (SELECT doc_id,
                     round(CAST(sum(CAST(round(ln(CAST(n AS DOUBLE) / CAST(total AS DOUBLE)), 6)
                             AS DECIMAL(24,8))) AS DOUBLE) / count(*), 6) AS mean_logprob
                   FROM tk JOIN vocab USING (tok) CROSS JOIN tt
                   GROUP BY doc_id),
            sl AS (SELECT sc.doc_id, d.lang, sc.mean_logprob
                   FROM sc JOIN documents d USING (doc_id)),
            hist AS (SELECT lang, mean_logprob, count(*) AS c
                     FROM sl GROUP BY 1, 2),
            cut AS (SELECT lang, mean_logprob,
                      CASE WHEN CAST(coalesce(sum(c) OVER (PARTITION BY lang
                               ORDER BY mean_logprob DESC
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
                             / CAST(sum(c) OVER (PARTITION BY lang) AS DOUBLE)
                             < (1.0 / 3.0) THEN 'head'
                           WHEN CAST(coalesce(sum(c) OVER (PARTITION BY lang
                               ORDER BY mean_logprob DESC
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
                             / CAST(sum(c) OVER (PARTITION BY lang) AS DOUBLE)
                             < (2.0 / 3.0) THEN 'middle'
                           ELSE 'tail' END AS bucket
                    FROM hist)
         SELECT doc_id, lang, mean_logprob, bucket
         FROM sl JOIN cut USING (lang, mean_logprob)
         ORDER BY doc_id""",

    "t42_kn_buckets" ->
      // t41's KN chain verbatim feeding t18's tercile CTE verbatim
      """WITH tk AS (SELECT doc_id, list_filter(
                string_split_regex(lower(text), '\s+'),
                t -> len(t) > 0) AS toks FROM documents),
            pairs AS (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
                      FROM (SELECT doc_id, toks,
                              unnest(range(1, len(toks))) AS i FROM tk)
                      WHERE len(toks) >= 2),
            bg AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS nb
                   FROM pairs GROUP BY 1, 2),
            pf AS (SELECT w1, CAST(sum(nb) AS BIGINT) AS np,
                          CAST(count(*) AS BIGINT) AS t1
                   FROM bg GROUP BY 1),
            ct AS (SELECT w2, CAST(count(*) AS BIGINT) AS cont
                   FROM bg GROUP BY 1),
            bbt AS (SELECT CAST(count(*) AS BIGINT) AS bb FROM bg),
            lp AS (SELECT doc_id,
                     CAST(CAST(round(ln(
                         (CAST(nb AS DOUBLE) - 0.75) / CAST(np AS DOUBLE)
                         + 0.75 * CAST(t1 AS DOUBLE) / CAST(np AS DOUBLE)
                           * (CAST(cont AS DOUBLE) / CAST(bb AS DOUBLE))), 6)
                       AS DECIMAL(24,6)) * 1000000 AS BIGINT) AS lpm
                   FROM pairs JOIN bg USING (w1, w2) JOIN pf USING (w1)
                        JOIN ct USING (w2) CROSS JOIN bbt),
            agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
                           CAST(sum(lpm) AS BIGINT) AS s
                    FROM lp GROUP BY doc_id),
            sl AS (SELECT a.doc_id, d.lang,
                          CAST(-(((-s) * 2 + n) // (2 * n)) AS DOUBLE)
                            / 1000000.0 AS mean_logprob
                   FROM agg a JOIN documents d USING (doc_id)),
            hist AS (SELECT lang, mean_logprob, count(*) AS c
                     FROM sl GROUP BY 1, 2),
            cut AS (SELECT lang, mean_logprob,
                      CASE WHEN CAST(coalesce(sum(c) OVER (PARTITION BY lang
                               ORDER BY mean_logprob DESC
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
                             / CAST(sum(c) OVER (PARTITION BY lang) AS DOUBLE)
                             < (1.0 / 3.0) THEN 'head'
                           WHEN CAST(coalesce(sum(c) OVER (PARTITION BY lang
                               ORDER BY mean_logprob DESC
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
                             / CAST(sum(c) OVER (PARTITION BY lang) AS DOUBLE)
                             < (2.0 / 3.0) THEN 'middle'
                           ELSE 'tail' END AS bucket
                    FROM hist)
         SELECT doc_id, lang, mean_logprob, bucket
         FROM sl JOIN cut USING (lang, mean_logprob)
         ORDER BY doc_id""",

    "t41_kneser_ney" ->
      // identical KN chain: bigram types derive prefix totals +
      // continuation fan-in + the type-count scalar; the per-pair
      // double expression is written in the same association order
      """WITH tk AS (SELECT doc_id, list_filter(
                string_split_regex(lower(text), '\s+'),
                t -> len(t) > 0) AS toks FROM documents),
            pairs AS (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
                      FROM (SELECT doc_id, toks,
                              unnest(range(1, len(toks))) AS i FROM tk)
                      WHERE len(toks) >= 2),
            bg AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS nb
                   FROM pairs GROUP BY 1, 2),
            pf AS (SELECT w1, CAST(sum(nb) AS BIGINT) AS np,
                          CAST(count(*) AS BIGINT) AS t1
                   FROM bg GROUP BY 1),
            ct AS (SELECT w2, CAST(count(*) AS BIGINT) AS cont
                   FROM bg GROUP BY 1),
            bbt AS (SELECT CAST(count(*) AS BIGINT) AS bb FROM bg),
            lp AS (SELECT doc_id,
                     CAST(CAST(round(ln(
                         (CAST(nb AS DOUBLE) - 0.75) / CAST(np AS DOUBLE)
                         + 0.75 * CAST(t1 AS DOUBLE) / CAST(np AS DOUBLE)
                           * (CAST(cont AS DOUBLE) / CAST(bb AS DOUBLE))), 6)
                       AS DECIMAL(24,6)) * 1000000 AS BIGINT) AS lpm
                   FROM pairs JOIN bg USING (w1, w2) JOIN pf USING (w1)
                        JOIN ct USING (w2) CROSS JOIN bbt),
            agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                           CAST(sum(lpm) AS BIGINT) AS s
                    FROM lp GROUP BY doc_id)
         SELECT doc_id, n_bigrams,
                CAST(-(((-s) * 2 + n_bigrams) // (2 * n_bigrams)) AS DOUBLE)
                  / 1000000.0 AS mean_logprob
         FROM agg ORDER BY doc_id""",

    "t16_bigram_logprob" ->
      """WITH tk AS (SELECT doc_id, list_filter(
                string_split_regex(lower(text), '\s+'),
                t -> len(t) > 0) AS toks FROM documents),
            pairs AS (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
                      FROM (SELECT doc_id, toks,
                              unnest(range(1, len(toks))) AS i FROM tk)
                      WHERE len(toks) >= 2),
            bg AS (SELECT w1, w2, count(*) AS nb FROM pairs GROUP BY 1, 2),
            pf AS (SELECT w1, count(*) AS np FROM pairs GROUP BY 1)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                round(CAST(sum(CAST(round(ln(CAST(nb AS DOUBLE) / CAST(np AS DOUBLE)), 6)
                        AS DECIMAL(24,8))) AS DOUBLE) / count(*), 6) AS mean_logprob
         FROM pairs JOIN bg USING (w1, w2) JOIN pf USING (w1)
         GROUP BY doc_id ORDER BY doc_id""",

    "t13_unigram_logprob" ->
      """WITH tk AS (SELECT doc_id, tok FROM (
                SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
                FROM documents) WHERE len(tok) > 0),
            vocab AS (SELECT tok, count(*) AS n FROM tk GROUP BY 1),
            tt AS (SELECT sum(n) AS total FROM vocab)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
                round(CAST(sum(CAST(round(ln(CAST(n AS DOUBLE) / CAST(total AS DOUBLE)), 6)
                        AS DECIMAL(24,8))) AS DOUBLE) / count(*), 6) AS mean_logprob
         FROM tk JOIN vocab USING (tok) CROSS JOIN tt
         GROUP BY doc_id ORDER BY doc_id""",

    "t14_token_entropy" ->
      """WITH tk AS (SELECT doc_id, tok FROM (
                SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
                FROM documents) WHERE len(tok) > 0),
            c AS (SELECT doc_id, tok, count(*) AS c FROM tk GROUP BY 1, 2),
            n AS (SELECT doc_id, sum(c) AS n FROM c GROUP BY 1)
         SELECT c.doc_id, CAST(any_value(n.n) AS BIGINT) AS n_toks,
                round(CAST(-sum(CAST(round(
                    (CAST(c AS DOUBLE) / CAST(n.n AS DOUBLE)) *
                    ln(CAST(c AS DOUBLE) / CAST(n.n AS DOUBLE)), 6)
                  AS DECIMAL(24,8))) AS DOUBLE), 6) AS token_entropy
         FROM c JOIN n ON c.doc_id = n.doc_id
         GROUP BY c.doc_id ORDER BY c.doc_id""",

    "d13_url_canon" ->
      """WITH u AS (SELECT doc_id,
               CASE WHEN doc_id % 3 = 0
                    THEN 'HTTP://WWW.Example.COM:80/articles/item-' || (doc_id % 100) || '/'
                    ELSE 'http://example.com/articles/item-' || (doc_id % 100) END ||
               CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&ref=home'
                    ELSE '?ref=home' END ||
               CASE WHEN doc_id % 5 = 0 THEN '#section-2' ELSE '' END AS url
             FROM documents),
            c AS (SELECT doc_id,
               lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
               lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS rawhost,
               regexp_replace(regexp_extract(url,
                 '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1), '/+$', '') AS path,
               regexp_extract(url, '^[^#]*?\?([^#]*)', 1) AS q
             FROM u),
            c2 AS (SELECT doc_id, scheme,
               CASE WHEN scheme = 'http'
                    THEN regexp_replace(regexp_replace(rawhost, '^www\.', ''), ':80$', '')
                    WHEN scheme = 'https'
                    THEN regexp_replace(regexp_replace(rawhost, '^www\.', ''), ':443$', '')
                    ELSE regexp_replace(rawhost, '^www\.', '') END AS host,
               path,
               array_to_string(list_filter(string_split(q, '&'),
                 p -> p <> '' AND NOT regexp_matches(p,
                   '^(utm_[^=]*|fbclid|gclid)(=|$)')), '&') AS qs
             FROM c)
         SELECT scheme || '://' || host || path ||
                CASE WHEN qs <> '' THEN '?' || qs ELSE '' END AS canon_url,
                min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_variants
         FROM c2 GROUP BY 1 ORDER BY 1""",

    "d14_cross_dedup" ->
      """WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
                    FROM documents WHERE doc_id < 500),
            sh AS (SELECT DISTINCT doc_id,
                     toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
                   FROM (SELECT doc_id, toks,
                           unnest(range(1, len(toks) - 1)) AS i FROM t)),
            sigs AS (SELECT doc_id, i,
                            min(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS sig
                     FROM sh CROSS JOIN (SELECT unnest(range(8)) AS i) GROUP BY 1, 2),
            bands AS (SELECT doc_id, i // 2 AS band,
                             md5(min(CASE WHEN i % 2 = 0 THEN sig END)
                                 || min(CASE WHEN i % 2 = 1 THEN sig END)) AS bkey
                      FROM sigs GROUP BY 1, 2),
            cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
                     FROM bands a JOIN bands b
                       ON a.band = b.band AND a.bkey = b.bkey
                     WHERE a.doc_id % 10 <> 0 AND b.doc_id % 10 = 0),
            sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
            inter AS (SELECT c.id1, c.id2, count(*) AS n
                      FROM cand c
                      JOIN sh a ON a.doc_id = c.id1
                      JOIN sh b ON b.doc_id = c.id2 AND b.shingle = a.shingle
                      GROUP BY 1, 2)
         SELECT id1 AS doc_id, id2 AS matched_id,
                round(CAST(n AS DOUBLE) / CAST(s1.sz + s2.sz - n AS DOUBLE), 6) AS jaccard
         FROM inter JOIN sz s1 ON s1.doc_id = id1 JOIN sz s2 ON s2.doc_id = id2
         WHERE CAST(n AS DOUBLE) / CAST(s1.sz + s2.sz - n AS DOUBLE) >= 0.5
         ORDER BY doc_id, matched_id""",

    "d15_para_dedup" ->
      """WITH framed AS (SELECT doc_id,
               'about us' || chr(10) || chr(10) || text || chr(10) || chr(10) ||
               CASE WHEN doc_id % 2 = 0 THEN 'contact us at example.com'
                    ELSE 'follow us on social media' END ||
               chr(10) || chr(10) || 'para ' || doc_id AS text
             FROM documents),
            ps AS (SELECT doc_id, string_split(text, chr(10) || chr(10)) AS a
                   FROM framed),
            paras AS (SELECT doc_id, a[i] AS para, i
                      FROM (SELECT doc_id, a, unnest(range(1, len(a) + 1)) AS i
                            FROM ps)),
            kept AS (SELECT doc_id, para, i FROM (
                       SELECT doc_id, para, i, row_number() OVER (
                         PARTITION BY md5(para) ORDER BY doc_id, i) AS rn
                       FROM paras) WHERE rn = 1),
            tot AS (SELECT doc_id, count(*) AS n_tot FROM paras GROUP BY 1)
         SELECT k.doc_id,
                string_agg(k.para, chr(10) || chr(10) ORDER BY k.i) AS text_clean,
                CAST(count(*) AS BIGINT) AS n_kept,
                CAST(any_value(t.n_tot) - count(*) AS BIGINT) AS n_dropped
         FROM kept k JOIN tot t ON k.doc_id = t.doc_id
         GROUP BY k.doc_id ORDER BY k.doc_id""",

    "d16_dup_substrings" ->
      """WITH framed AS (SELECT doc_id,
               'subscribe to our newsletter today for free updates ' || text ||
               CASE WHEN doc_id % 7 = 0 THEN ' ' || text ELSE '' END AS text
             FROM documents),
            t AS (SELECT doc_id, list_filter(
                    string_split_regex(lower(text), '\s+'),
                    t -> len(t) > 0) AS toks
                  FROM framed),
            grams AS (SELECT doc_id, i - 1 AS start,
                             md5(toks[i] || ' ' || toks[i+1] || ' ' ||
                                 toks[i+2] || ' ' || toks[i+3]) AS h
                      FROM (SELECT doc_id, toks,
                              unnest(range(1, len(toks) - 2)) AS i FROM t)),
            dup AS (SELECT h FROM (
                      SELECT h, count(*) AS c FROM grams GROUP BY 1) WHERE c > 1),
            m AS (SELECT g.doc_id, g.start FROM grams g JOIN dup USING (h)),
            cov AS (SELECT doc_id, count(DISTINCT start + j) AS nd
                    FROM m CROSS JOIN (SELECT unnest(range(4)) AS j) GROUP BY 1),
            tot AS (SELECT doc_id, len(toks) AS n FROM t)
         SELECT t.doc_id, CAST(n AS BIGINT) AS n_toks,
                CAST(coalesce(nd, 0) AS BIGINT) AS n_dup_toks,
                round(CAST(coalesce(nd, 0) AS DOUBLE) / CAST(n AS DOUBLE), 6) AS dup_frac
         FROM tot t LEFT JOIN cov USING (doc_id) ORDER BY doc_id""",

    "d17_winnowing" -> d17Oracle,

    "t20_cms" -> t20Oracle,

    "t21_quality_classifier" -> t21Oracle,

    "t22_gopher_repetition" -> t22Oracle,

    "t23_divergence" ->
      """WITH tk AS (SELECT source, tok FROM (
                SELECT source, unnest(string_split_regex(lower(text), '\s+')) AS tok
                FROM documents) WHERE len(tok) > 0),
            c AS (SELECT source, tok, count(*) AS c FROM tk GROUP BY 1, 2),
            vocab AS (SELECT tok, sum(c) AS ct FROM c GROUP BY 1),
            tot AS (SELECT CAST(count(*) AS BIGINT) AS v,
                           CAST(sum(ct) AS BIGINT) AS n FROM vocab),
            lnq AS (SELECT tok, CAST(round(ln(
                      CAST(ct + 1 AS DOUBLE) /
                      CAST((SELECT n FROM tot) + (SELECT v FROM tot) AS DOUBLE)), 6)
                    AS DECIMAL(24,8)) AS lnq FROM vocab),
            lnqall AS (SELECT sum(lnq) AS lnq_all FROM lnq),
            g AS (SELECT source, CAST(sum(c) AS BIGINT) AS ng,
                         CAST(count(*) AS BIGINT) AS vg FROM c GROUP BY 1),
            terms AS (SELECT c.source,
                CAST(round((CAST(c.c + 1 AS DOUBLE) /
                      CAST(g.ng + (SELECT v FROM tot) AS DOUBLE)) *
                    (ln(CAST(c.c + 1 AS DOUBLE) /
                      CAST(g.ng + (SELECT v FROM tot) AS DOUBLE))
                     - CAST(l.lnq AS DOUBLE)), 6) AS DECIMAL(24,8)) AS kl_t,
                CAST(round(-(CAST(c.c + 1 AS DOUBLE) /
                      CAST(g.ng + (SELECT v FROM tot) AS DOUBLE)) *
                    CAST(l.lnq AS DOUBLE), 6) AS DECIMAL(24,8)) AS ce_t,
                l.lnq AS lnq
              FROM c JOIN lnq l USING (tok) JOIN g USING (source)),
            s AS (SELECT source, sum(kl_t) AS s_kl, sum(ce_t) AS s_ce,
                         sum(lnq) AS lnq_g FROM terms GROUP BY 1)
         SELECT s.source, g.ng AS n_toks, g.vg AS n_types,
                round(CAST(s_kl AS DOUBLE) +
                  (CAST(1 AS DOUBLE) / CAST(g.ng + (SELECT v FROM tot) AS DOUBLE)) *
                  (CAST((SELECT v FROM tot) - g.vg AS DOUBLE) *
                     ln(CAST(1 AS DOUBLE) / CAST(g.ng + (SELECT v FROM tot) AS DOUBLE))
                   - CAST(lnq_all - lnq_g AS DOUBLE)), 6) AS kl,
                round(CAST(s_ce AS DOUBLE) -
                  (CAST(1 AS DOUBLE) / CAST(g.ng + (SELECT v FROM tot) AS DOUBLE)) *
                  CAST(lnq_all - lnq_g AS DOUBLE), 6) AS ce
         FROM s JOIN g USING (source) CROSS JOIN lnqall
         ORDER BY source""",

    "s16_knn_graph" ->
      """WITH v AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200),
            u AS (SELECT src, dst, CAST(unnest(se) AS DOUBLE) AS x,
                         CAST(unnest(de) AS DOUBLE) AS y
                  FROM (SELECT a.vec_id AS src, b.vec_id AS dst,
                               a.embedding AS se, b.embedding AS de
                        FROM v a, v b WHERE a.vec_id <> b.vec_id)),
            s AS (SELECT src, dst,
                         round(sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))), 6)
                           AS cos
                  FROM u GROUP BY 1, 2),
            r AS (SELECT src, dst, cos, CAST(row_number() OVER (
                    PARTITION BY src ORDER BY cos DESC, dst) AS BIGINT) AS rank
                  FROM s)
         SELECT src, dst, cos, rank FROM r WHERE rank <= 5
         ORDER BY src, rank""",

    "t26_lexical_diversity" ->
      """WITH t AS (SELECT doc_id,
                list_filter(string_split_regex(lower(text), '\s+'),
                            x -> len(x) > 0) AS toks
              FROM documents),
            c AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
                         CAST(len(list_distinct(toks)) AS BIGINT) AS n_types
                  FROM t)
         SELECT doc_id, n_tokens, n_types,
                CASE WHEN n_tokens > 0 THEN round(
                  CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) END AS ttr,
                CASE WHEN n_tokens > 0 THEN round(
                  CAST(n_types AS DOUBLE) / sqrt(CAST(n_tokens AS DOUBLE)), 6)
                  END AS root_ttr,
                CASE WHEN n_tokens > 1 THEN round(
                  ln(CAST(n_types AS DOUBLE)) / ln(CAST(n_tokens AS DOUBLE)), 6)
                  END AS herdan_c
         FROM c ORDER BY doc_id""",

    "t25_bpe_pairs" ->
      """WITH toks AS (SELECT unnest(string_split_regex(lower(text), '\s+')) AS w
                       FROM documents),
            words AS (SELECT w, count(*) AS wc FROM toks
                      WHERE length(w) > 1 GROUP BY 1),
            pairs AS (SELECT substr(w, CAST(i AS INTEGER), 2) AS pair, wc
                      FROM (SELECT w, wc, unnest(range(1, length(w))) AS i
                            FROM words)),
            agg AS (SELECT pair, CAST(sum(wc) AS BIGINT) AS n
                    FROM pairs GROUP BY 1)
         SELECT pair, n FROM agg ORDER BY n DESC, pair LIMIT 30""",

    "t24_zipf" ->
      """WITH tk AS (SELECT tok FROM (
                SELECT unnest(string_split_regex(lower(text), '\s+')) AS tok
                FROM documents) WHERE len(tok) > 0),
            top AS (SELECT tok, count(*) AS c FROM tk GROUP BY 1
                    ORDER BY c DESC, tok LIMIT 500),
            ranked AS (SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS r
                       FROM top),
            t AS (SELECT
                CAST(round(ln(CAST(r AS DOUBLE)), 6) AS DECIMAL(24,8)) AS x,
                CAST(round(ln(CAST(c AS DOUBLE)), 6) AS DECIMAL(24,8)) AS y,
                CAST(round(ln(CAST(r AS DOUBLE)) * ln(CAST(c AS DOUBLE)), 6)
                  AS DECIMAL(24,8)) AS xy,
                CAST(round(ln(CAST(r AS DOUBLE)) * ln(CAST(r AS DOUBLE)), 6)
                  AS DECIMAL(24,8)) AS xx,
                CAST(round(ln(CAST(c AS DOUBLE)) * ln(CAST(c AS DOUBLE)), 6)
                  AS DECIMAL(24,8)) AS yy
              FROM ranked),
            s AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx,
                         sum(y) AS sy, sum(xy) AS sxy, sum(xx) AS sxx,
                         sum(yy) AS syy FROM t)
         SELECT n AS n_ranks,
                round(-((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))), 6) AS alpha,
                round((CAST(sy AS DOUBLE)
                       - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                          / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                         * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS intercept,
                round(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                       * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
                      / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                         * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r2
         FROM s""",

    "d19_bloom_decontaminate" -> d19Oracle,

    "d23_span_dedup" ->
      """WITH framed AS (SELECT doc_id,
               'welcome to the archive. this copy is mirrored nightly. enjoy your stay. ' ||
               text || '.' ||
               CASE WHEN doc_id % 2 = 0
                    THEN ' thanks for visiting. see you next time. goodbye.'
                    ELSE ' closing note ' || CAST(doc_id AS VARCHAR) || '.' END AS text
             FROM documents),
            s0 AS (SELECT doc_id, list_filter(list_transform(
                     regexp_extract_all(text, '[^.!?]+[.!?]+|[^.!?]+'),
                     x -> trim(x)), x -> len(x) > 0) AS sents FROM framed),
            base AS (SELECT doc_id, sents, len(sents) AS n FROM s0),
            spans AS (SELECT doc_id, s AS start,
                        md5(array_to_string(list_slice(sents, s + 1, s + 3), chr(1))) AS h
                      FROM (SELECT doc_id, sents, n, unnest(range(0, n - 2)) AS s
                            FROM base WHERE n >= 3)),
            winners AS (SELECT h, doc_id, start FROM (
                          SELECT h, doc_id, start,
                            row_number() OVER (PARTITION BY h
                              ORDER BY doc_id, start) AS rn
                          FROM spans) WHERE rn = 1),
            removals AS (SELECT DISTINCT sp.doc_id, sp.start + d.d AS pos
                         FROM spans sp
                         LEFT JOIN winners w ON sp.h = w.h
                           AND sp.doc_id = w.doc_id AND sp.start = w.start
                         CROSS JOIN (SELECT unnest(range(0, 3)) AS d) d
                         WHERE w.h IS NULL),
            sent AS (SELECT doc_id, i - 1 AS pos, sents[i] AS sent
                     FROM (SELECT doc_id, sents, unnest(range(1, n + 1)) AS i
                           FROM base)),
            kept AS (SELECT s.doc_id, s.pos, s.sent FROM sent s
                     LEFT JOIN removals r ON s.doc_id = r.doc_id AND s.pos = r.pos
                     WHERE r.doc_id IS NULL),
            agg AS (SELECT doc_id, string_agg(sent, ' ' ORDER BY pos) AS text_clean,
                      count(*) AS n_kept FROM kept GROUP BY 1)
         SELECT b.doc_id,
                coalesce(a.text_clean, '') AS text_clean,
                CAST(b.n AS BIGINT) AS n_sents,
                CAST(b.n - coalesce(a.n_kept, 0) AS BIGINT) AS n_dropped
         FROM base b LEFT JOIN agg a USING (doc_id) ORDER BY b.doc_id""",

    "d18_dup_substring_cut" ->
      """WITH framed AS (SELECT doc_id,
               'subscribe to our newsletter today for free updates ' || text ||
               CASE WHEN doc_id % 7 = 0 THEN ' ' || text ELSE '' END AS text
             FROM documents),
            t AS (SELECT doc_id, list_filter(
                    string_split_regex(lower(text), '\s+'),
                    t -> len(t) > 0) AS toks
                  FROM framed),
            grams AS (SELECT doc_id, i - 1 AS start,
                             md5(toks[i] || ' ' || toks[i+1] || ' ' ||
                                 toks[i+2] || ' ' || toks[i+3]) AS h
                      FROM (SELECT doc_id, toks,
                              unnest(range(1, len(toks) - 2)) AS i FROM t)),
            dup AS (SELECT h FROM (
                      SELECT h, count(*) AS c FROM grams GROUP BY 1) WHERE c > 1),
            m AS (SELECT g.doc_id, g.start FROM grams g JOIN dup USING (h)),
            cov AS (SELECT DISTINCT doc_id, start + j AS pos
                    FROM m CROSS JOIN (SELECT unnest(range(4)) AS j)),
            tk AS (SELECT doc_id, i - 1 AS pos, toks[i] AS tok
                   FROM (SELECT doc_id, toks,
                           unnest(range(1, len(toks) + 1)) AS i FROM t)),
            kept AS (SELECT k.doc_id,
                       string_agg(k.tok, ' ' ORDER BY k.pos) AS clean,
                       count(*) AS nk
                     FROM tk k LEFT JOIN cov c
                       ON c.doc_id = k.doc_id AND c.pos = k.pos
                     WHERE c.pos IS NULL GROUP BY 1),
            tot AS (SELECT doc_id, len(toks) AS n FROM t)
         SELECT t.doc_id, coalesce(clean, '') AS text_clean,
                CAST(n AS BIGINT) AS n_toks,
                CAST(n - coalesce(nk, 0) AS BIGINT) AS n_dup_toks
         FROM tot t LEFT JOIN kept USING (doc_id) ORDER BY doc_id""",

    "t19_gopher_rules" ->
      """WITH b AS (SELECT doc_id, text,
               list_filter(string_split_regex(text, '\s+'), t -> len(t) > 0) AS toks,
               string_split(text, chr(10)) AS lines
             FROM documents),
            sig AS (SELECT doc_id,
              CAST(len(toks) AS BIGINT) AS n_words,
              CAST(greatest(len(toks), 1) AS DOUBLE) AS nws,
              len(regexp_replace(text, '\s', '', 'g')) AS chars_in,
              len(text) - len(replace(text, '#', '')) AS nhash,
              (len(text) - len(replace(text, '...', ''))) / 3 AS nell,
              CAST(greatest(len(lines), 1) AS DOUBLE) AS nlines,
              len(list_filter(lines, l -> starts_with(ltrim(l), '-')
                  OR starts_with(ltrim(l), '*')
                  OR starts_with(ltrim(l), '•'))) AS bl,
              len(list_filter(lines, l -> ends_with(rtrim(l), '...'))) AS el,
              len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]'))) AS aw,
              CAST(len(list_filter(toks, t -> list_contains(
                ['the','be','to','of','and','that','have','with'], lower(t))))
                AS BIGINT) AS n_stop
            FROM b),
            o AS (SELECT doc_id, n_words,
              round(CAST(chars_in AS DOUBLE) / nws, 6) AS mean_word_len,
              round(CAST(nhash + nell AS DOUBLE) / nws, 6) AS symbol_ratio,
              round(CAST(bl AS DOUBLE) / nlines, 6) AS bullet_frac,
              round(CAST(el AS DOUBLE) / nlines, 6) AS ellipsis_frac,
              round(CAST(aw AS DOUBLE) / nws, 6) AS alpha_frac,
              n_stop FROM sig)
         SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_frac,
                ellipsis_frac, alpha_frac, n_stop,
                (n_words >= 50 AND n_words <= 100000
                 AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
                 AND symbol_ratio <= 0.1
                 AND bullet_frac < 0.9 AND ellipsis_frac < 0.3
                 AND alpha_frac >= 0.8 AND n_stop >= 2) AS pass
         FROM o ORDER BY doc_id"""
  )
}
