package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins and aggregations at 100 TB.
  *
  * First line of defense is AQE (`spark.sql.adaptive.skewJoin.enabled`,
  * on by default) which splits oversized shuffle partitions at runtime.
  * Salting is for the cases AQE can't fix: a single join KEY so hot that
  * one task still owns it after splitting (AQE splits partitions, not
  * keys), or a `groupBy` whose per-key state is the bottleneck.
  *
  * `saltedJoin`: fact side gets a random salt in [0, n); the (small-ish)
  * build side is exploded n× with every salt value; the join key becomes
  * (key, salt), spreading each hot key over n tasks. Exact same rows as
  * the unsalted join — verified by spec.
  *
  * `twoPhaseAgg`: salt → partial agg per (key, salt) → final agg per key.
  * Only valid for decomposable aggregates (sum/count/min/max) — the same
  * trick Spark's own partial aggregation does, pushed one level further
  * for the case where ONE key floods even the partial agg.
  */
object Skew {

  /** The salt for one fact row: mixes row identity with the key so a hot
    * key spreads over all n salts. Exposed so tests exercise the SAME
    * expression the join uses (a re-derived copy could silently drift).
    *
    * `monotonically_increasing_id` is nondeterministic under task retries —
    * a re-run task may salt the same row differently. That only moves the
    * row to another salt partition; since the right side is replicated to
    * EVERY salt, the join result is identical either way (SkewSpec pins
    * result-equality with the unsalted join). Do not reuse this expression
    * anywhere the salt value itself lands in the output. */
  def saltExpr(key: String, numSalts: Int): Column =
    pmod(hash(monotonically_increasing_id(), col(key)), lit(numSalts))

  /** Inner equi-join with the left (fact) side salted n ways.
    * `right` is replicated n× — keep it the smaller side. */
  def saltedJoin(
      left: DataFrame, right: DataFrame, key: String, numSalts: Int): DataFrame = {
    val salted = left.withColumn("__salt", saltExpr(key, numSalts))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(numSalts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Decomposable aggregate with per-key salting: sum/count columns survive
    * the two-phase split exactly. `aggs` maps output name -> (valueCol, "sum"|"count"|"min"|"max"). */
  def twoPhaseAgg(
      df: DataFrame, key: String, numSalts: Int,
      aggs: Map[String, (Column, String)]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(numSalts)))
    val partialCols = aggs.toSeq.map { case (name, (c, kind)) =>
      (kind match {
        case "sum" => sum(c); case "count" => count(c)
        case "min" => min(c); case "max" => max(c)
        case k => throw new IllegalArgumentException(s"non-decomposable agg '$k'")
      }).as(s"__p_$name")
    }
    val partial = salted.groupBy(col(key), col("__salt")).agg(partialCols.head, partialCols.tail: _*)
    val finalCols = aggs.toSeq.map { case (name, (_, kind)) =>
      (kind match {
        case "sum" | "count" => sum(col(s"__p_$name"))
        case "min" => min(col(s"__p_$name")); case "max" => max(col(s"__p_$name"))
      }).as(name)
    }
    partial.groupBy(col(key)).agg(finalCols.head, finalCols.tail: _*)
  }
}
