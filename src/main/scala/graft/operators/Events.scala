package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time interval operators. The reference has no event surface at
  * all (its step ships one static table, sas:126-193); these cover the
  * temporal joins an event-log corpus needs at scale.
  */
object Events {

  /** Interval (range) join: every (left, right) pair sharing `keys` with
    * `left.tsUs − right.tsUs ∈ [minDeltaUs, maxDeltaUs]`.
    *
    * A direct theta-join on the inequality plans as a per-key CROSS
    * product — O(n²) per key, the classic range-join wall. Binning the
    * time axis at the window span turns it into an EQUI-join: the right
    * side keys on `(keys, bin)`, the left side probes the (at most two)
    * bins its window can overlap, and the exact predicate prunes
    * bin-mates outside the interval. Cost: one equi-shuffle per side on
    * `(keys, bin)` + a doubled left side — never a per-key cross product.
    * This is the bucketized range join streaming and batch engines use
    * for exactly this shape.
    *
    * `leftTsUs`/`rightTsUs` must be simple LONG microsecond columns
    * (positive epoch domain: bin arithmetic uses `div`, whose truncation
    * equals floor for non-negative operands on every engine).
    */
  def intervalJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTsUs: String, rightTsUs: String,
      minDeltaUs: Long, maxDeltaUs: Long): DataFrame = {
    require(maxDeltaUs >= minDeltaUs,
      s"empty interval: [$minDeltaUs, $maxDeltaUs]")
    // the post-join filter references both ts columns by name — any
    // cross-side collision (Spark's default resolver is case-INSENSITIVE)
    // would be AMBIGUOUS_REFERENCE at analysis time; fail with an
    // actionable message instead
    require(!leftTsUs.equalsIgnoreCase(rightTsUs),
      s"left and right timestamp columns are both named '$leftTsUs' — rename one side before joining")
    require(!right.columns.exists(_.equalsIgnoreCase(leftTsUs)) &&
        !left.columns.exists(_.equalsIgnoreCase(rightTsUs)),
      s"'$leftTsUs'/'$rightTsUs' must each exist on ONE side only — rename the colliding column before joining")
    require(!(left.columns ++ right.columns).exists(_.equalsIgnoreCase("__bin")),
      "inputs must not carry a '__bin' column — it is reserved for the internal bin key")
    val span = math.max(maxDeltaUs - minDeltaUs, 1L)
    // the bin key is built in expr() SQL for exact integer `div`; quote
    // the ts identifiers so names needing backticks (dots, spaces,
    // hyphens) parse — a raw splice would fail at analysis despite
    // passing the guards above
    def q(name: String): String = "`" + name.replace("`", "``") + "`"
    val rb = right.withColumn("__bin", expr(s"${q(rightTsUs)} div ${span}L"))
    // the left window [ts−max, ts−min] spans ≤ span µs, so it overlaps at
    // most two right bins; array_distinct folds them when they coincide
    val lb = left
      .withColumn("__bin", explode(array_distinct(array(
        expr(s"(${q(leftTsUs)} - ${maxDeltaUs}L) div ${span}L"),
        expr(s"(${q(leftTsUs)} - ${minDeltaUs}L) div ${span}L")))))
    lb.join(rb, keys :+ "__bin")
      .filter((col(q(leftTsUs)) - col(q(rightTsUs))) >= minDeltaUs &&
        (col(q(leftTsUs)) - col(q(rightTsUs))) <= maxDeltaUs)
      .drop("__bin")
  }

  /** Cohort retention: group users by first-activity day (their cohort),
    * then for every (cohort, day offset) report how many of the cohort's
    * users were active that day and the retained fraction — the standard
    * product-analytics retention triangle, over an event log.
    *
    * `usCol` must be a LONG microseconds column (positive epoch domain:
    * `div` truncation = floor). Day = us div 86 400 000 000.
    *
    * 100 TB shape: the event stream collapses to DISTINCT (user, day)
    * FIRST — that aggregate partial-combines map-side, so the only
    * corpus-sized exchange carries (long, long) pairs, bounded by
    * users × active-days, not by events. Everything after (per-user min,
    * cohort sizes, activity counts) operates on that table, joined on the
    * user key it is already partitioned by. Retention is one IEEE
    * division per output row, rounded to 6 — replayable.
    *
    * Output: (cohort_day, day_offset, cohort_n, n_active, retention),
    * one row per (cohort, offset) with n_active ≥ 1; day_offset 0 rows
    * carry retention 1.0 by construction (every cohort member is active
    * on their first day).
    */
  def retentionCohorts(events: DataFrame, userCol: String,
      usCol: String): DataFrame = {
    val ud = events.select(col(userCol).as("__u"),
        expr(s"`$usCol` div 86400000000").as("__d"))
      .distinct()
    val first = ud.groupBy("__u").agg(min(col("__d")).as("cohort_day"))
    val sizes = first.groupBy("cohort_day").agg(count(lit(1)).as("cohort_n"))
    val act = ud.join(first, "__u")
      .groupBy(col("cohort_day"), (col("__d") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
    act.join(sizes, "cohort_day")
      .select(col("cohort_day"), col("day_offset"), col("cohort_n"),
        col("n_active"),
        round(col("n_active").cast("double") / col("cohort_n").cast("double"), 6)
          .as("retention"))
  }
}
