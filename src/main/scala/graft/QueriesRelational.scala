package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.catalog.{Collection, CollectionCatalog}
import graft.functions.{Distances, TextAnalysis}
import graft.operators.{Ann, Assemble, ChromaFilter, Dedup, Events, HashingEmbedder, Knn, Lm, Mixture, Multimodal, Retrieval, Sketches, Skew, TfIdfSrpEmbedder}

/** SURVEY §2.D query family: the relational core — aggregations, joins
  * (salted/bucketed), set ops, rollup/cube/pivot, windows, event-time
  * bucketing, and the sketch family.
  *
  * Pure code motion from the pre-r15 single-file SparkEntry (the 164/164
  * CORRECTNESS sweep is the refactoring harness — hashes unchanged);
  * [[SparkEntry]] composes the families back into the driver-contract
  * `queries`/`oracleSql` maps. Shared fixtures/helpers live in
  * [[EntryKit]].
  */
private[graft] trait QueriesRelational extends EntryKit {

  private[graft] def relationalQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // C4 hash aggregation
    "q19_agg_by_lang" -> ((s, dir) =>
      t(s, dir, "documents").groupBy("lang")
        .agg(count(lit(1)).as("cnt"), roundz(avg("n_chars"), 4).as("avg_chars"))
        .orderBy("lang")),
    // C4 TPC-H Q1-ish aggregate scan. Money math is DECIMAL internally
    // (exact, fold-order-free) but the OUTPUT is cast to DOUBLE: the
    // driver's hash canonicalizes by value string, and DECIMAL('x.8100')
    // vs DuckDB-fetched float 'x.81' mismatch whenever the 4th decimal is
    // zero. decimal->double is deterministic on both engines (scaled
    // int < 2^53 converts exactly, one correctly-rounded divide).
    "q20_tpch_q1" -> ((s, dir) =>
      t(s, dir, "lineitem").groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast(DecimalType(18, 4))).cast(DecimalType(18, 4))
            .cast("double").as("revenue"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus")),
    // C4/C5 join + top-k per group
    "q21_topk_per_nation" -> ((s, dir) => {
      val tot = t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name", "c_custkey")
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 4)))
          .cast(DecimalType(18, 4)).as("total"))
      tot.withColumn("rnk", row_number().over(
          Window.partitionBy("n_name").orderBy(col("total").desc, col("c_custkey"))))
        .filter(col("rnk") <= 3)
        // rank on the exact decimal; ship the output as double (hash parity)
        .select(col("n_name"), col("rnk"), col("c_custkey"),
          col("total").cast("double").as("total"))
        .orderBy("n_name", "rnk")
    }),
    // C6/C7 time bucketing + JSON scalar (integer µs arithmetic).
    // FLOOR division, not `div` (truncation): they differ for pre-epoch
    // timestamps, and the DuckDB oracle's `//` floors. (us - pmod) div d
    // is exact integer floor-division.
    "q22_events_hourly_json" -> ((s, dir) =>
      events(s, dir)
        .groupBy(expr("(us - pmod(us, 3600000000)) div 3600000000").as("hr"),
          col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          sum(get_json_object(col("props"), "$.k").cast("int")).cast("long").as("sum_k"))
        .orderBy("hr", "event_type")),
    // C5 sessionization (lag + cumulative sum)
    "q23_sessionize" -> ((s, dir) => {
      val ev = events(s, dir)
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      ev.withColumn("new_s",
          when(lag(col("us"), 1).over(w).isNull
            || col("us") - lag(col("us"), 1).over(w) > 1800000000L, 1).otherwise(0))
        .withColumn("session_idx", sum(col("new_s")).over(w).cast("long"))
        .groupBy("user_id", "session_idx").agg(count(lit(1)).as("n_events"))
        .orderBy("user_id", "session_idx")
    }),
    // KMV distinct-token estimate per lang: the oracled sketch path for
    // 100 TB cardinality — distinct (lang, hash) partial-aggregates,
    // rank ≤ k prunes map-side (WindowGroupLimit), the final exchange
    // carries ≤ k rows per group. k=16 < the fixture vocab so the
    // estimator branch (not the exact fallback) is what's pinned.
    "q103_kmv_distinct" -> ((s, dir) => {
      val tok = t(s, dir, "documents")
        .select(col("lang"), explode(split(col("text"), " ")).as("tk"))
      Sketches.kmvDistinct(tok, "lang", col("tk"), k = 16).orderBy("lang")
    }),
    // Count-min sketch heavy-hitter estimates: the corpus token stream
    // collapses to a d×w integer table (map-side-combinable groupBy,
    // final exchange ≤ d·w rows), then point estimates for a probe list
    // read min-over-rows from the finished sketch — the 100 TB
    // frequency-question shape where an exact vocabulary groupBy would
    // shuffle vocabulary-sized state. Every hash is the portable
    // strHash→clamp→spread chain, so build AND estimates replay
    // integer-exact in the oracle (est is an upper bound on exact_cnt —
    // both columns emitted, so the CMS guarantee itself is under test).
    "q135_cms_heavyhitters" -> ((s, dir) => {
      val toks = t(s, dir, "documents").select(
        explode(filter(split(lower(col("text")), "\\s+"),
          x => x =!= lit(""))).as("tok"))
      val sketch = Sketches.countMinSketch(toks, col("tok"), d = 4, w = 256)
      val probes = Seq("the", "vector", "table", "spark", "zzz-never-seen")
      val est = Sketches.countMinEstimate(sketch, probes, d = 4, w = 256)
      val exact = toks.groupBy(col("tok").as("token"))
        .agg(count(lit(1)).as("exact_cnt"))
      est.join(exact, Seq("token"), "left")
        .na.fill(0L, Seq("exact_cnt"))
        .select(col("token"), col("est"), col("exact_cnt"))
        .orderBy("token")
    }),
    // KMV pairwise overlap: per-lang k-min sketches → per-pair union /
    // Jaccard / intersection estimates — cross-source coverage at 100 TB
    // without any exact pairwise distinct-count. Same spread hash and
    // estimator constant as q103, so the whole chain replays.
    "q107_kmv_overlap" -> ((s, dir) => {
      val tok = t(s, dir, "documents")
        .select(col("lang"), explode(split(col("text"), " ")).as("tk"))
      Sketches.kmvPairwiseOverlap(tok, "lang", col("tk"), k = 16)
        .select(col("g_a").as("lang_a"), col("g_b").as("lang_b"),
          col("n_union_sketch"), col("j"), col("union_est"), col("inter_est"))
        .orderBy("lang_a", "lang_b")
    }),
    // Retention triangle over the event log: cohort = first-activity
    // day; the only corpus-sized exchange is the distinct (user, day)
    // collapse — bounded by users × days, not events.
    "q108_retention" -> ((s, dir) =>
      Events.retentionCohorts(events(s, dir), "user_id", "us")
        .orderBy("cohort_day", "day_offset")),
    // Corpus length-distribution report: exact per-lang percentiles over
    // the VALUE HISTOGRAM — the exchange carries distinct lengths, not
    // rows (Spark's own percentile agg buffers every row's value in its
    // aggregation state); one interpolation at the end, oracle-replayed.
    "q89_length_percentiles" -> ((s, dir) =>
      TextAnalysis.percentileProfile(t(s, dir, "documents"), "lang", "n_chars")
        .select(col("lang"), col("n"),
          roundz(col("p25"), 4).as("p25"), roundz(col("p50"), 4).as("p50"),
          roundz(col("p75"), 4).as("p75"), roundz(col("p95"), 4).as("p95"))
        .orderBy("lang")),
    // Grouped mean-pooling: ONE embedding per label (the doc-from-chunks /
    // class-centroid primitive every training pipeline needs). posexplode →
    // one shuffle on (label,pos) whose partial sums combine map-side (the
    // shuffle carries groups, not rows). Exact decimal sums + ONE double
    // division: fold-order-free. Oracled in LONG form (label,pos,m) — the
    // driver's compare sorts rows value-wise, which an array column can't
    // support; the array reassembly of the same numbers is spec-pinned
    // (AnnSpec "label centroid: long form reassembles").
    "q65_label_centroid" -> ((s, dir) =>
      t(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "e")))
        .groupBy("label", "pos")
        .agg((sum(col("e").cast(DecimalType(18, 6))).cast("double")
          / count(lit(1))).as("m"))
        .select(col("label"), col("pos"), roundz(col("m"), 4).as("m"))
        .orderBy("label", "pos")),
    // Corpus quantiles from a bottom-k hash sample (KMV on rows): the k=64
    // smallest-key-hash rows are a uniform sample; nearest-rank quantiles
    // over them estimate corpus quantiles with no global sort — the
    // exchange carries <= k rows (WindowGroupLimit map-side prune). The
    // sample membership is the portable spread hash, so the estimates
    // replay value-for-value in the oracle.
    "q138_bottomk_quantiles" -> ((s, dir) =>
      Sketches.bottomKQuantiles(t(s, dir, "documents"),
          col("doc_id"), col("n_chars"), k = 64,
          qs = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99))
        .orderBy("q")),
    // C6 tumbling window via window() (DECIMAL sums: fold-order-free)
    "q35_tumbling_window" -> ((s, dir) =>
      events(s, dir)
        .groupBy(window(timestamp_micros(col("us")), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("value").cast(DecimalType(18, 4))).cast(DecimalType(18, 4))
            .cast("double").as("sum_value"))
        .select(unix_micros(col("w.start")).as("ws"), col("event_type"),
          col("cnt"), col("sum_value"))
        .orderBy("ws", "event_type")),
    // C4 TPC-H Q5-ish with the selective-dim-first plan: region→nation→
    // customer broadcasts reduce orders to the ASIA slice (~1/5), and that
    // slice is itself broadcast to the lineitem scan — the fact table
    // (the 100 TB side) is NEVER shuffled; every join on it is broadcast.
    "q36_region_revenue" -> ((s, dir) => {
      val asiaNations = t(s, dir, "nation")
        .join(broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
      val asiaCust = t(s, dir, "customer")
        .join(broadcast(asiaNations.select("n_nationkey", "n_name")),
          col("c_nationkey") === col("n_nationkey"))
      val asiaOrders = t(s, dir, "orders")
        .join(broadcast(asiaCust.select("c_custkey", "n_name")),
          col("o_custkey") === col("c_custkey"))
      t(s, dir, "lineitem")
        .join(broadcast(asiaOrders.select("o_orderkey", "n_name")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .groupBy("n_name")
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast(DecimalType(18, 4))).cast(DecimalType(18, 4))
            .cast("double").as("revenue"),
          count(lit(1)).as("cnt"))
        .orderBy("n_name")
    }),
    // Fact⋈fact via BUCKETED tables (Bucketing.scala in anger): both sides
    // are written bucketed+sorted by the join key, so the join itself plans
    // with ZERO Exchange — the shuffle is paid once at ingestion, the shape
    // that makes a repeated 100 TB fact⋈fact join affordable. PlanShapeSpec
    // pins the exchange-free join; the oracle pins the result.
    "q62_bucketed_join_revenue" -> ((s, dir) => {
      import graft.sources.Bucketing
      val tag = (dir.hashCode.toLong & 0xffffffffL).toString
      val (ot, lt) = (s"b_orders_$tag", s"b_lineitem_$tag")
      // ensure, not rewrite: the fixtures are immutable and the table names
      // carry the source identity (dir hash), so repeat runs in one session
      // reuse the ingested layout — the bucketing contract ("shuffle paid
      // once at ingestion") is exactly what the steady-state run measures
      Bucketing.ensureBucketed(s, t(s, dir, "orders"), ot, "o_orderkey", 8)
      Bucketing.ensureBucketed(s,
        t(s, dir, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey"),
        lt, "o_orderkey", 8)
      Bucketing.colocatedJoin(s, ot, lt, "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast(DecimalType(18, 4))).cast(DecimalType(18, 4))
            .cast("double").as("revenue"),
          count(lit(1)).as("cnt"))
        .orderBy("o_orderpriority")
    }),
    // Skew mitigation: salted join must be result-identical to the plain join
    "q37_salted_join_agg" -> ((s, dir) => {
      val cust = t(s, dir, "customer").withColumnRenamed("c_custkey", "o_custkey")
      Skew.saltedJoin(t(s, dir, "orders"), cust, "o_custkey", numSalts = 8)
        .groupBy("c_mktsegment")
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 4)))
            .cast(DecimalType(18, 4)).cast("double").as("total"),
          count(lit(1)).as("cnt"))
        .orderBy("c_mktsegment")
    }),
    // C4 fact⋈dim with the part table: revenue + avg list price per brand
    "q43_brand_revenue" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast(DecimalType(18, 4))).cast(DecimalType(18, 4))
            .cast("double").as("revenue"),
          // exact decimal sum + ONE double division: avg(double) would be
          // partial-agg fold-order dependent and could flip the 4th decimal
          roundz(sum(col("p_retailprice").cast(DecimalType(18, 4))).cast("double")
            / count(lit(1)), 4).as("avg_retail"),
          count(lit(1)).as("cnt"))
        .orderBy("p_brand")),
    // Corpus statistics: exact interpolated percentiles + distinct counts
    "q45_corpus_stats" -> ((s, dir) =>
      t(s, dir, "documents").groupBy("lang")
        .agg(expr("percentile(n_chars, array(0.5D, 0.9D))").as("pct"),
          countDistinct(col("source")).as("n_sources"))
        .select(col("lang"),
          roundz(element_at(col("pct"), 1), 4).as("median_chars"),
          roundz(element_at(col("pct"), 2), 4).as("p90_chars"),
          col("n_sources"))
        .orderBy("lang")),
    // C4 full outer join: unmatched sides surface as nulls
    "q46_full_outer" -> ((s, dir) => {
      val cust = t(s, dir, "customer").groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_cust"))
      t(s, dir, "nation")
        .join(cust, col("n_nationkey") === col("c_nationkey"), "full_outer")
        .select(coalesce(col("n_name"), lit("<none>")).as("nation"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"))
        .orderBy("nation")
    }),
    // C4 rollup subtotals (grand total included; NULL markers coalesced so
    // cross-engine NULL ordering differences cannot bite)
    "q47_rollup" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_quantity").cast(DecimalType(18, 4)))
            .cast(DecimalType(18, 4)).cast("double").as("qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("cnt"), col("qty"))
        .orderBy("rf", "ls")),
    // C4 pivot: lang x source count matrix via Spark pivot
    "q48_pivot" -> ((s, dir) => {
      val srcs = Seq("src0", "src1", "src2", "src3")
      t(s, dir, "documents").groupBy("lang").pivot("source", srcs).count()
        .select(col("lang") +: srcs.map(sc => coalesce(col(sc), lit(0L)).as(sc)): _*)
        .orderBy("lang")
    }),
    // C4 set operations: EXCEPT / INTERSECT (distinct semantics)
    "q38_set_ops" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val en = docs.filter(col("lang") === "en").select("doc_id")
      val src0 = docs.filter(col("source") === "src0").select("doc_id")
      en.except(src0).agg(count(lit(1)).as("n_except")).crossJoin(
        en.intersect(src0).agg(count(lit(1)).as("n_intersect")))
    }),
    // C6/C9 sliding window (1 h length, 30 min slide): every event lands
    // in exactly two windows
    "q51_sliding_window" -> ((s, dir) =>
      events(s, dir)
        .groupBy(window(timestamp_micros(col("us")), "1 hour", "30 minutes").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(unix_micros(col("w.start")).as("ws"), col("event_type"), col("cnt"))
        .orderBy("ws", "event_type")),
    // C5 quantile binning per stratum (ntile) — curriculum/quality buckets
    "q53_ntile_bins" -> ((s, dir) => {
      val w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
      t(s, dir, "documents").withColumn("bin", ntile(4).over(w))
        .groupBy("lang", "bin")
        .agg(count(lit(1)).as("cnt"), max("n_chars").as("max_chars"))
        .orderBy("lang", "bin")
    }),
    // C4 cube: all grouping-set combinations over (lang, source).
    // GROUPING() flags (not COALESCE alone) distinguish a genuine NULL
    // group from the subtotal row and restore a unique total-order key —
    // COALESCE-only output has duplicate sort keys if the data ever
    // carries NULLs, which breaks the determinism contract.
    "q55_cube" -> ((s, dir) =>
      t(s, dir, "documents").cube("lang", "source")
        .agg(count(lit(1)).as("cnt"),
          grouping(col("lang")).cast("int").as("g_lang"),
          grouping(col("source")).cast("int").as("g_source"))
        .select(
          when(col("g_lang") === 1, lit("ALL"))
            .otherwise(coalesce(col("lang"), lit("<null>"))).as("lang"),
          when(col("g_source") === 1, lit("ALL"))
            .otherwise(coalesce(col("source"), lit("<null>"))).as("source"),
          col("g_lang"), col("g_source"), col("cnt"))
        .orderBy("g_lang", "g_source", "lang", "source")),
    // As-of (temporal) join via window, no join at all: for every click,
    // the most recent strictly-earlier view by the same user — the
    // last(ignoreNulls) over an unbounded-preceding frame is one sort per
    // user partition, where a range-join formulation would be O(n²) per
    // user at corpus scale
    "q57_asof_prev_view" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      events(s, dir)
        .withColumn("prev_view_us",
          last(when(col("event_type") === "view", col("us")), ignoreNulls = true).over(w))
        .filter(col("event_type") === "click")
        .select("event_id", "user_id", "us", "prev_view_us")
        .orderBy("event_id")
    }),
    // Interval (range) join via time-axis binning: purchase→click
    // attribution within a 1-hour lookback, equi-join on (user, bin) —
    // never the per-user cross product a theta-join would plan
    "q78_interval_join" -> ((s, dir) => {
      val ev = events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"), col("us").as("p_us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("user_id"), col("us").as("c_us"))
      Events.intervalJoin(purchases, clicks, Seq("user_id"),
          "p_us", "c_us", 0L, 3600000000L)
        .select(col("p_id"), col("c_id"), col("user_id"),
          expr("(p_us - c_us) div 1000000").as("lag_s"))
        .orderBy("p_id", "c_id")
    }),
  )

  private[graft] def relationalOracles: Map[String, String] = Map(
    "q19_agg_by_lang" ->
      """SELECT lang, COUNT(*) AS cnt, ROUND(AVG(n_chars), 4) AS avg_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q20_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
        |COUNT(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q21_topk_per_nation" ->
      """WITH tot AS (
        |  SELECT n_name, c_custkey,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS total
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |              JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name, c_custkey),
        |r AS (SELECT n_name, CAST(row_number() OVER
        |        (PARTITION BY n_name ORDER BY total DESC, c_custkey) AS INTEGER) AS rnk,
        |        c_custkey, total FROM tot)
        |SELECT n_name, rnk, c_custkey, CAST(total AS DOUBLE) AS total
        |FROM r WHERE rnk <= 3 ORDER BY n_name, rnk""".stripMargin,
    "q22_events_hourly_json" ->
      """SELECT epoch_us(ts) // 3600000000 AS hr, event_type, COUNT(*) AS cnt,
        |CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k
        |FROM events GROUP BY 1, 2 ORDER BY hr, event_type""".stripMargin,
    "q23_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |g AS (SELECT user_id, us, event_id,
        |        CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
        |             THEN 1 ELSE 0 END AS new_s
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |s AS (SELECT user_id, CAST(SUM(new_s) OVER
        |        (PARTITION BY user_id ORDER BY us, event_id) AS BIGINT) AS session_idx FROM g)
        |SELECT user_id, session_idx, COUNT(*) AS n_events FROM s
        |GROUP BY user_id, session_idx ORDER BY user_id, session_idx""".stripMargin,
    // q103: same spread hash, same rank-≤k minimum set, and the estimator
    // constant (k−1)·M interpolates from the SAME Scala double so both
    // engines divide bit-identical values
    "q103_kmv_distinct" ->
      s"""WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS tk
         |             FROM documents),
         |dh AS (SELECT DISTINCT lang, ${sqlSpreadHash("tk")} AS h FROM tok),
         |rn AS (SELECT lang, h, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h) AS r
         |       FROM dh),
         |kk AS (SELECT lang, h FROM rn WHERE r <= 16),
         |a AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_kept,
         |        CAST(MAX(h) AS BIGINT) AS h_k
         |      FROM kk GROUP BY lang)
         |SELECT lang, n_kept, h_k,
         |  CASE WHEN n_kept < 16 THEN CAST(n_kept AS DOUBLE)
         |       ELSE ROUND(${15.0 * 1000000007.0} / CAST(h_k AS DOUBLE), 6) END AS est
         |FROM a ORDER BY lang""".stripMargin,
    // q135: the count-min build AND its point estimates replayed
    // integer-exact — same strHash→31-bit-clamp→spread chain as the
    // mixture/embedding oracles, folded per CMS row multiplicatively
    // (the TfIdf sign construction) before mod-w. MIN over a LEFT-joined
    // cell count (COALESCE 0) mirrors the engine's missing-cell rule.
    "q135_cms_heavyhitters" -> {
      def cell(h: String, r: String) =
        s"(((($h * ($r + 1) + $r) % 2147483647) * 2654435761) % 1000000007) % 256"
      val th = sqlStrHash("tm")
      val ph = sqlStrHash("p.token")
      s"""WITH tk AS (SELECT tm FROM
         |        (SELECT unnest(string_split_regex(lower(text), '\\s+')) AS tm
         |         FROM documents) WHERE length(tm) > 0),
         |rows_ AS (SELECT unnest(range(4)) AS r),
         |cells AS (SELECT r.r AS r, ${cell(th, "r.r")} AS cell, COUNT(*) AS cnt
         |          FROM tk CROSS JOIN rows_ r GROUP BY 1, 2),
         |probes(token) AS (VALUES ('the'), ('vector'), ('table'), ('spark'),
         |                         ('zzz-never-seen')),
         |pc AS (SELECT p.token, r.r AS r, ${cell(ph, "r.r")} AS cell
         |       FROM probes p CROSS JOIN rows_ r),
         |est AS (SELECT pc.token, MIN(COALESCE(c.cnt, 0)) AS est
         |        FROM pc LEFT JOIN cells c ON c.r = pc.r AND c.cell = pc.cell
         |        GROUP BY pc.token),
         |ex AS (SELECT tm AS token, COUNT(*) AS exact_cnt FROM tk GROUP BY tm)
         |SELECT e.token, CAST(e.est AS BIGINT) AS est,
         |       CAST(COALESCE(x.exact_cnt, 0) AS BIGINT) AS exact_cnt
         |FROM est e LEFT JOIN ex x ON x.token = e.token
         |ORDER BY e.token""".stripMargin
    },
    // q107: q103's k-min sets per lang, then per-pair merged sketch,
    // KMV Jaccard and the same (k−1)·M estimator on the union's k-th min
    "q107_kmv_overlap" ->
      s"""WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS tk
         |             FROM documents),
         |dh AS (SELECT DISTINCT lang, CAST(${sqlSpreadHash("tk")} AS BIGINT) AS h
         |       FROM tok),
         |rn AS (SELECT lang, h, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h) AS r
         |       FROM dh),
         |mins AS (SELECT lang, list(h ORDER BY h) AS hs FROM rn WHERE r <= 16
         |         GROUP BY lang),
         |pr AS (SELECT a.lang AS lang_a, b.lang AS lang_b,
         |         list_sort(list_distinct(a.hs || b.hs))[1:16] AS u,
         |         a.hs AS ha, b.hs AS hb
         |       FROM mins a JOIN mins b ON a.lang < b.lang),
         |e AS (SELECT lang_a, lang_b, CAST(len(u) AS BIGINT) AS n_union_sketch,
         |        ROUND(CAST(len(list_intersect(list_intersect(u, ha), hb)) AS DOUBLE)
         |              / CAST(len(u) AS DOUBLE), 6) AS j,
         |        CASE WHEN len(u) < 16 THEN CAST(len(u) AS DOUBLE)
         |             ELSE ROUND(${15.0 * 1000000007.0} / CAST(u[len(u)] AS DOUBLE), 6)
         |        END AS union_est
         |      FROM pr)
         |SELECT lang_a, lang_b, n_union_sketch, j, union_est,
         |       ROUND(j * union_est, 6) AS inter_est
         |FROM e ORDER BY lang_a, lang_b""".stripMargin,
    // q108: distinct (user, day) first, per-user min day = cohort, then
    // cohort sizes and per-offset activity — `//` on positive epoch
    // micros matches Spark's `div` exactly
    "q108_retention" ->
      """WITH ud AS (SELECT DISTINCT user_id AS u,
        |              epoch_us(ts) // 86400000000 AS d FROM events),
        |f AS (SELECT u, MIN(d) AS cohort_day FROM ud GROUP BY u),
        |sz AS (SELECT cohort_day, CAST(COUNT(*) AS BIGINT) AS cohort_n
        |       FROM f GROUP BY cohort_day),
        |a AS (SELECT f.cohort_day, ud.d - f.cohort_day AS day_offset,
        |        CAST(COUNT(*) AS BIGINT) AS n_active
        |      FROM ud JOIN f USING (u) GROUP BY 1, 2)
        |SELECT a.cohort_day, a.day_offset, sz.cohort_n, a.n_active,
        |       ROUND(CAST(a.n_active AS DOUBLE) / CAST(sz.cohort_n AS DOUBLE), 6)
        |         AS retention
        |FROM a JOIN sz USING (cohort_day) ORDER BY cohort_day, day_offset""".stripMargin,
    // q89: the histogram-percentile chain replayed — per-lang cumulative
    // counts over distinct lengths, bracketing values per fraction, one
    // p·(n−1) interpolation (identical arithmetic to the Spark side)
    "q89_length_percentiles" -> {
      val ps = Seq("25" -> 0.25, "50" -> 0.5, "75" -> 0.75, "95" -> 0.95)
      val brackets = ps.map { case (nm, p) =>
        s"""MIN(CASE WHEN cum >= FLOOR($p*(n-1))+1 THEN v END) AS lo$nm,
           |        MIN(CASE WHEN cum >= CEIL($p*(n-1))+1 THEN v END) AS hi$nm""".stripMargin
      }.mkString(",\n        ")
      val outs = ps.map { case (nm, p) =>
        s"ROUND(lo$nm + ($p*(n-1) - FLOOR($p*(n-1))) * (hi$nm - lo$nm), 4) AS p$nm"
      }.mkString(",\n       ")
      s"""WITH h AS (SELECT lang, CAST(n_chars AS DOUBLE) AS v, COUNT(*) AS c
         |           FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2),
         |cum AS (SELECT lang, v, c,
         |          SUM(c) OVER (PARTITION BY lang ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
         |          SUM(c) OVER (PARTITION BY lang) AS n FROM h),
         |a AS (SELECT lang, CAST(MAX(n) AS BIGINT) AS n,
         |        $brackets
         |      FROM cum GROUP BY lang)
         |SELECT lang, n,
         |       $outs
         |FROM a ORDER BY lang""".stripMargin
    },
    // q138: the bottom-k sample replayed — same spread hash of the key,
    // same (hash, value) sample order, same nearest-rank selection
    "q138_bottomk_quantiles" ->
      s"""WITH s AS (SELECT ${sqlSpreadHash("CAST(doc_id AS VARCHAR)")} AS h,
         |                  CAST(n_chars AS DOUBLE) AS v FROM documents),
         |samp AS (SELECT v FROM (SELECT v, row_number() OVER (ORDER BY h, v) AS rn
         |                        FROM s) WHERE rn <= 64),
         |ranked AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM samp),
         |n AS (SELECT COUNT(*) AS n_sample FROM samp),
         |qq AS (SELECT CAST(unnest([0.1, 0.25, 0.5, 0.75, 0.9, 0.99]) AS DOUBLE) AS q)
         |SELECT q, n_sample, v AS est
         |FROM qq CROSS JOIN n
         |JOIN ranked ON ranked.rn = GREATEST(1, CAST(CEIL(q * n_sample) AS BIGINT))
         |ORDER BY q""".stripMargin,
    "q65_label_centroid" ->
      """SELECT label, i AS pos,
        |  -- + 0.0 normalizes IEEE -0.0 (Spark's BigDecimal round drops
        |  -- the sign of rounded-to-zero negatives; DuckDB keeps it)
        |  ROUND(CAST(SUM(CAST(embedding[CAST(i+1 AS INTEGER)] AS DECIMAL(18,6))) AS DOUBLE)
        |    / COUNT(*), 4) + 0.0 AS m
        |FROM embeddings, range(64) t(i)
        |GROUP BY label, i ORDER BY label, pos""".stripMargin,
    "q35_tumbling_window" ->
      """SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS ws, event_type,
        |COUNT(*) AS cnt,
        |CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin,
    "q36_region_revenue" ->
      """SELECT n_name,
        |CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
        |COUNT(*) AS cnt
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q37_salted_join_agg" ->
      """SELECT c_mktsegment,
        |CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS total,
        |COUNT(*) AS cnt
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q62_bucketed_join_revenue" ->
      """SELECT o_orderpriority,
        |CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
        |COUNT(*) AS cnt
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q46_full_outer" ->
      """SELECT COALESCE(n_name, '<none>') AS nation, COALESCE(n_cust, 0) AS n_cust
        |FROM nation FULL OUTER JOIN
        |  (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey) c
        |  ON n_nationkey = c_nationkey
        |ORDER BY nation""".stripMargin,
    "q47_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls,
        |COUNT(*) AS cnt,
        |CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,
    "q48_pivot" ->
      """SELECT lang,
        |COUNT(CASE WHEN source = 'src0' THEN 1 END) AS src0,
        |COUNT(CASE WHEN source = 'src1' THEN 1 END) AS src1,
        |COUNT(CASE WHEN source = 'src2' THEN 1 END) AS src2,
        |COUNT(CASE WHEN source = 'src3' THEN 1 END) AS src3
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q45_corpus_stats" ->
      """SELECT lang, ROUND(quantile_cont(n_chars, 0.5), 4) AS median_chars,
        |ROUND(quantile_cont(n_chars, 0.9), 4) AS p90_chars,
        |COUNT(DISTINCT source) AS n_sources
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q43_brand_revenue" ->
      """SELECT p_brand,
        |CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
        |ROUND(CAST(SUM(CAST(p_retailprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 4) AS avg_retail,
        |COUNT(*) AS cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q38_set_ops" ->
      """SELECT
        |(SELECT COUNT(*) FROM (SELECT doc_id FROM documents WHERE lang = 'en'
        |  EXCEPT SELECT doc_id FROM documents WHERE source = 'src0')) AS n_except,
        |(SELECT COUNT(*) FROM (SELECT doc_id FROM documents WHERE lang = 'en'
        |  INTERSECT SELECT doc_id FROM documents WHERE source = 'src0')) AS n_intersect""".stripMargin,
    // sliding window starts are the two 30-min-aligned marks covering the
    // event (epoch-aligned, matching Spark's window() origin)
    "q51_sliding_window" ->
      """WITH e AS (SELECT epoch_us(ts) AS us, event_type FROM events),
        |x AS (SELECT event_type, unnest([
        |        (us // 1800000000) * 1800000000 - 1800000000,
        |        (us // 1800000000) * 1800000000]) AS ws FROM e)
        |SELECT ws, event_type, COUNT(*) AS cnt FROM x
        |GROUP BY ws, event_type ORDER BY ws, event_type""".stripMargin,
    "q53_ntile_bins" ->
      """WITH b AS (SELECT lang, n_chars,
        |  CAST(ntile(4) OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS INTEGER) AS bin
        |  FROM documents)
        |SELECT lang, bin, COUNT(*) AS cnt, MAX(n_chars) AS max_chars
        |FROM b GROUP BY lang, bin ORDER BY lang, bin""".stripMargin,
    "q57_asof_prev_view" ->
      """SELECT event_id, user_id, epoch_us(ts) AS us,
        |last_value(CASE WHEN event_type = 'view' THEN epoch_us(ts) END IGNORE NULLS)
        |  OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_view_us
        |FROM events QUALIFY event_type = 'click' ORDER BY event_id""".stripMargin,
    "q55_cube" ->
      """SELECT
        |CASE WHEN GROUPING(lang) = 1 THEN 'ALL' ELSE COALESCE(lang, '<null>') END AS lang,
        |CASE WHEN GROUPING(source) = 1 THEN 'ALL' ELSE COALESCE(source, '<null>') END AS source,
        |CAST(GROUPING(lang) AS INTEGER) AS g_lang,
        |CAST(GROUPING(source) AS INTEGER) AS g_source,
        |COUNT(*) AS cnt FROM documents GROUP BY CUBE(lang, source)
        |ORDER BY g_lang, g_source, lang, source""".stripMargin,
    // q78: the oracle can afford the direct inequality join (small data);
    // the Spark side's binning must produce EXACTLY these pairs
    "q78_interval_join" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us, event_type FROM events),
        |p AS (SELECT event_id AS p_id, user_id, us AS p_us FROM e WHERE event_type = 'purchase'),
        |c AS (SELECT event_id AS c_id, user_id, us AS c_us FROM e WHERE event_type = 'click')
        |SELECT p_id, c_id, user_id, (p_us - c_us) // 1000000 AS lag_s
        |FROM p JOIN c USING (user_id)
        |WHERE p_us - c_us BETWEEN 0 AND 3600000000
        |ORDER BY p_id, c_id""".stripMargin,
  )
}
