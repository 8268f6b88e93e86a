package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed cardinality sketches with engine-portable, IEEE-exact
  * arithmetic — the oracled alternative to HLL-style estimators whose
  * log/harmonic-mean math cannot be replayed bit-identically on an
  * independent engine.
  */
object Sketches {

  /** KMV (k-minimum-values) distinct-count estimate per group
    * (Bar-Yossef et al. 2002; Beyer et al. SIGMOD 2007): hash every
    * value, keep each group's k smallest DISTINCT hashes, and estimate
    * |distinct| ≈ (k−1)·M / h_k where h_k is the k-th minimum and M the
    * hash-space size. Groups with fewer than k distinct hashes report
    * their exact count (the estimator is undefined there — and unneeded).
    *
    * Scale shape: the only heavy state is the distinct (group, hash) set,
    * which partial-aggregates map-side; the rank ≤ k then prunes via
    * WindowGroupLimit (a PARTIAL top-k under the exchange, same pushdown
    * as the q17/q75 pins), so the final exchange carries at most k rows
    * per group. Nothing vocabulary-sized ever reaches the driver, unlike
    * an exact countDistinct whose final aggregate must see every value.
    *
    * Estimator arithmetic is one multiply and one divide on doubles —
    * exact in IEEE, so the whole sketch oracles. `hash` defaults to the
    * engine-portable spread hash (range M = 1e9+7); pass xxhash64 (and
    * its M = 2⁶⁴) for production avalanche quality.
    *
    * Output: (groupCol, n_kept, h_k, est) — est rounded to 6.
    */
  def kmvDistinct(df: DataFrame, groupCol: String, valueCol: Column, k: Int,
      hash: Column => Column = Mixture.spreadHash,
      hashSpace: Double = 1000000007.0): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val dh = df.select(col(groupCol), hash(valueCol).as("__h")).distinct()
    val ranked = dh.withColumn("__rn",
        row_number().over(Window.partitionBy(groupCol).orderBy("__h")))
      .filter(col("__rn") <= k)
    val scale = (k - 1).toDouble * hashSpace
    ranked.groupBy(groupCol)
      .agg(count(lit(1)).as("n_kept"), max(col("__h")).as("h_k"))
      .withColumn("est",
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(round(lit(scale) / col("h_k").cast("double"), 6)))
  }

  /** Pairwise distinct-set overlap between groups from KMV sketches
    * (Beyer et al. SIGMOD 2007 §4): for every group pair (a < b),
    * estimate |A ∪ B| from the MERGED sketch (the k smallest distinct
    * hashes of the union — computable from the two k-min lists alone) and
    * Jaccard as the fraction of merged-sketch members present in BOTH
    * input sketches; |A ∩ B| ≈ J · |A ∪ B|. The 100 TB use: "how much of
    * source A's vocabulary/url-space/doc-hash-space does source B
    * already cover?" across N sources WITHOUT any exact pairwise
    * distinct-count over corpus-sized sets.
    *
    * Scale shape: identical to [[kmvDistinct]] up to the per-group k-min
    * lists (distinct partial-aggregates map-side, WindowGroupLimit prunes
    * to ≤ k rows per group under the exchange); the pair stage then
    * operates on ONE k-length array per group — G·(G−1)/2 pairs of
    * k-element list merges, group-count-sized, never corpus-sized. When a
    * merged sketch has fewer than k values both inputs were exhaustive,
    * so union/intersection sizes are EXACT (the estimator branch is
    * bypassed, same contract as [[kmvDistinct]]).
    *
    * Estimator arithmetic: integer ranks and intersections, one divide
    * for J, one for the union estimate, one multiply — all IEEE-exact, so
    * the whole surface oracles. Output per pair (g_a < g_b):
    * (g_a, g_b, n_union_sketch, j, union_est, inter_est), j/ests rounded
    * to 6.
    */
  def kmvPairwiseOverlap(df: DataFrame, groupCol: String, valueCol: Column,
      k: Int, hash: Column => Column = Mixture.spreadHash,
      hashSpace: Double = 1000000007.0): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val dh = df.select(col(groupCol).as("g"), hash(valueCol).as("__h")).distinct()
    val mins = dh.withColumn("__rn",
        row_number().over(Window.partitionBy("g").orderBy("__h")))
      .filter(col("__rn") <= k)
    val sketches = mins.groupBy("g")
      .agg(sort_array(collect_list(col("__h"))).as("hs"))
    val scale = (k - 1).toDouble * hashSpace
    val merged = array_sort(array_distinct(concat(col("a.hs"), col("b.hs"))))
    sketches.as("a").join(sketches.as("b"), col("a.g") < col("b.g"))
      .select(col("a.g").as("g_a"), col("b.g").as("g_b"),
        slice(merged, 1, k).as("__u"),
        col("a.hs").as("__ha"), col("b.hs").as("__hb"))
      .select(col("g_a"), col("g_b"),
        size(col("__u")).cast("long").as("n_union_sketch"),
        round(size(array_intersect(array_intersect(col("__u"), col("__ha")),
            col("__hb"))).cast("double")
          / size(col("__u")).cast("double"), 6).as("j"),
        when(size(col("__u")) < k, size(col("__u")).cast("double"))
          .otherwise(round(lit(scale)
            / element_at(col("__u"), size(col("__u"))).cast("double"), 6))
          .as("union_est"))
      .withColumn("inter_est", round(col("j") * col("union_est"), 6))
  }

  /** Row-decorrelated cell of token `t` in CMS row `r` of width `w`:
    * the [[graft.expressions.TfIdfModel.signOf]] construction (fold the
    * row in MULTIPLICATIVELY before the nonlinear spread — per-row
    * hashes of one token must not be linearly related), reduced mod the
    * row width. All inputs non-negative, every intermediate < 2⁶³, so
    * the arithmetic replays exactly in plain SQL on any engine. */
  private def cmsCell(t: Column, r: Int, w: Int): Column =
    pmod(pmod(pmod(graft.expressions.GraftExtensions.strHash(t)
          * lit((r + 1).toLong) + lit(r.toLong),
        lit(2147483647L)) * lit(2654435761L), lit(1000000007L)),
      lit(w.toLong)).cast("int")

  /** Count-min sketch build (Cormode & Muthukrishnan 2005) over a token
    * column: `d` independent hash rows × `w` cells, each cell the count
    * of tokens hashing into it. THE frequency structure for heavy-hitter
    * / stopword / rare-token questions over a 100 TB token stream: the
    * corpus collapses into d·w integers regardless of size (the groupBy
    * partial-aggregates map-side, the final exchange carries ≤ d·w
    * rows), and the finished sketch ships anywhere — estimates never
    * touch the corpus again. Point estimates ([[countMinEstimate]]) are
    * upper bounds (collisions only ADD), within εN of truth with the
    * usual (d, w) guarantees.
    *
    * Integer-exact end to end (portable string hash → 31-bit clamp →
    * multiplicative spread → mod w), so the whole sketch — build AND
    * estimates — replays in the DuckDB oracle, unlike library CMS
    * implementations whose murmur seeds cannot be reproduced in SQL. */
  def countMinSketch(tokens: DataFrame, tokenCol: Column, d: Int, w: Int): DataFrame = {
    require(d >= 1 && d <= 8, s"CMS depth must be in 1..8, got $d")
    require(w >= 2, s"CMS width must be >= 2, got $w")
    tokens.select(explode(array((0 until d).map(r =>
        struct(lit(r).as("r"), cmsCell(tokenCol, r, w).as("cell"))): _*)).as("rc"))
      .select(col("rc.r").as("r"), col("rc.cell").as("cell"))
      .groupBy("r", "cell").agg(count(lit(1)).as("cnt"))
  }

  /** Quantile estimates from a bottom-k hash sample (the KMV idea turned
    * on rows: the k rows with the smallest key hashes are a uniform
    * random sample, fixed-size regardless of corpus size — Cohen &
    * Kaplan's bottom-k sketches, PODC 2007). Nearest-rank quantiles over
    * that sample estimate the corpus quantiles with the usual ±O(1/√k)
    * rank error; the 100 TB question shape is "median/p99 document
    * length across the corpus" without any global sort.
    *
    * Scale shape: the rank ≤ k prunes map-side (WindowGroupLimit — each
    * input partition forwards at most k rows, the same pushdown as
    * [[kmvDistinct]]); every later stage operates on ≤ k rows. Nothing
    * corpus-sized shuffles, nothing reaches the driver.
    *
    * Determinism: the sample membership is the portable spread hash of
    * the KEY (not the value), so the same rows are sampled on any engine;
    * rank selection is `max(1, ceil(q·n))` — integer-exact both sides.
    * Output: (q, n_sample, est), one row per requested quantile.
    */
  def bottomKQuantiles(df: DataFrame, keyCol: Column, valueCol: Column,
      k: Int, qs: Seq[Double],
      hash: Column => Column = Mixture.spreadHash): DataFrame = {
    require(k >= 2, s"bottom-k sampling needs k >= 2, got $k")
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      s"quantiles must be in (0, 1], got $qs")
    val spark = df.sparkSession
    import spark.implicits._
    // NULL values are excluded BEFORE sampling (standard quantile
    // semantics) — Spark's ASC sort puts NULLS FIRST, so a sampled NULL
    // would otherwise occupy rank 1 and null out the low quantiles
    val sampled = df
      .select(hash(keyCol.cast("string")).as("__h"), valueCol.cast("double").as("v"))
      .filter(col("v").isNotNull)
      .withColumn("__rn", row_number().over(Window.orderBy(col("__h"), col("v"))))
      .filter(col("__rn") <= k)
    // rank WITHIN the sample by value (ties share a value, so any order
    // among them yields the same estimate); ≤ k rows from here on —
    // n_sample derives from `ranked` itself (max rank), so the corpus-wide
    // bottom-k window subtree appears once and its exchange is reused
    val ranked = sampled
      .withColumn("rn", row_number().over(Window.orderBy(col("v"))))
      .select(col("rn"), col("v"))
    val n = ranked.agg(coalesce(max(col("rn")).cast("long"), lit(0L)).as("n_sample"))
    qs.toDF("q")
      .crossJoin(broadcast(n))
      .withColumn("r", greatest(lit(1L), ceil(col("q") * col("n_sample"))))
      .join(broadcast(ranked), col("r") === col("rn"))
      .select(col("q"), col("n_sample"), col("v").as("est"))
  }

  /** CMS point estimates for `probes`: min over the d probed cells, a
    * missing cell reading 0 (absent tokens estimate 0 unless every row
    * collides). The probe side is a handful of literals — broadcast onto
    * the d·w-row sketch, nothing corpus-sized anywhere. */
  def countMinEstimate(sketch: DataFrame, probes: Seq[String],
      d: Int, w: Int): DataFrame = {
    require(probes.nonEmpty, "countMinEstimate needs at least one probe token")
    val spark = sketch.sparkSession
    import spark.implicits._
    probes.toDF("token")
      .select(col("token"), explode(array((0 until d).map(r =>
          struct(lit(r).as("r"), cmsCell(col("token"), r, w).as("cell"))): _*)).as("rc"))
      .select(col("token"), col("rc.r").as("r"), col("rc.cell").as("cell"))
      .join(sketch, Seq("r", "cell"), "left")
      .na.fill(0L, Seq("cnt"))
      .groupBy("token").agg(min("cnt").as("est"))
  }
}
