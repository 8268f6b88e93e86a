package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Keyword retrieval + hybrid fusion — the companion surface to the
  * collection's vector search (README.md:5 names "similarity search,
  * recommendation engines" as the hydrated artifact's workloads; real
  * retrieval stacks pair that kNN with keyword scoring and fuse ranks).
  *
  * 100 TB shape: ONE explode pass over the corpus feeds two partial-agg'd
  * aggregations (per-doc length; per-doc tf restricted to the query's
  * terms). Document frequencies and corpus stats are tiny frames that
  * BROADCAST back onto the scored stream — the corpus itself shuffles only
  * on `id` for the per-doc score fold. Nothing here collects to the driver.
  *
  * Determinism: scoring uses only IEEE-exact operations (+ − × ÷), which
  * round identically on every engine, and the per-term partial scores are
  * rounded then summed as DECIMAL, so the per-doc fold is order-free. The
  * idf is therefore the LOG-FREE variant `(N − df + ½)/(df + ½)` — same
  * monotonicity as Robertson idf (log of it), bit-replayable anywhere; the
  * classic log form would hash-diverge across libm implementations.
  */
object Retrieval {

  /** Per-document BM25-style keyword score for `queryTerms` (lowercased
    * whitespace tokens). Returns (id, score) for every document matching
    * at least one term. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    val toks = docs.select(col(idCol).as("id"),
      explode(split(lower(col(textCol)), "\\s+")).as("term"))
    // full-stream agg: per-doc token length (the BM25 length norm)
    val dl = toks.groupBy("id").agg(count(lit(1)).as("dl"))
    // corpus stats ride the plan — no driver-side collect
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot_dl"))
    // filtered agg: tf only for the query's terms (predicate pushes into
    // the exploded stream; the full vocabulary is never aggregated)
    val tf = toks.filter(col("term").isin(queryTerms: _*))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(dft), "term")
      .join(dl, "id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        (col("n_docs").cast("double") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
      .withColumn("s",
        (col("idf") * (col("tf") * lit(k1 + 1)))
          / (col("tf") + lit(k1) * (lit(1 - b)
            + (lit(b) * col("dl").cast("double") * col("n_docs")) / col("tot_dl").cast("double"))))
    // round → exact decimal sum: the per-doc fold over terms is order-free
    scored.groupBy("id")
      .agg(sum(round(col("s"), 6).cast(DecimalType(18, 6)))
        .cast(DecimalType(18, 6)).cast("double").as("score"))
  }

  /** Top-n keyword hits: (id, rnk, score), rank ties broken by id.
    *
    * Shaped as orderBy+limit (TakeOrderedAndProject: per-partition top-n
    * heaps, n·P rows merged on one reducer) rather than a global
    * row_number window, which would sort the ENTIRE match stream through
    * a single partition. The rank window that remains runs over the ≤ n
    * survivors of the limit — bounded, never corpus-sized. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], n: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val top = bm25(docs, idCol, textCol, queryTerms, k1, b)
      .orderBy(col("score").desc, col("id"))
      .limit(n)
    top.withColumn("rnk", row_number().over(
      org.apache.spark.sql.expressions.Window.orderBy(col("score").desc, col("id"))))
      .select(col("id"), col("rnk"), col("score"))
  }

  /** Reciprocal-rank fusion of independently ranked lists (the standard
    * hybrid-retrieval combiner): score(id) = Σ_lists 1/(k + rnk). Missing
    * ids contribute 0 from that list. Rank arithmetic only — 1/(k+r) is a
    * single IEEE division, so fused scores replay exactly on any engine.
    * Each input must carry (`idCol`, `rankCol`); lists are outer-merged so
    * an id ranked by EITHER side is fused. */
  def rrf(ranked: Seq[DataFrame], idCol: String, rankCol: String,
          k: Int = 60): DataFrame = {
    require(ranked.size >= 2, "rrf fuses at least two ranked lists")
    val contribs = ranked.zipWithIndex.map { case (df, i) =>
      df.select(col(idCol).as("id"),
        (lit(1.0) / (lit(k.toDouble) + col(rankCol))).as(s"c$i"))
    }
    val merged = contribs.reduce((a, b) => a.join(b, Seq("id"), "full_outer"))
    val total: Column = contribs.indices
      .map(i => coalesce(col(s"c$i"), lit(0.0)))
      .reduce(_ + _)
    merged.select(col("id"), round(total, 6).as("rrf"))
  }
}
