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
}
