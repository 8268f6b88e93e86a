package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.GraftExtensions

/** Corpus-curation operators that sit between "filtered documents" and
  * "training shards" in a large-scale training-data pipeline: weighted
  * source mixing to a token budget, deterministic global shuffling into
  * shards, and cluster-balanced diversity sampling.
  *
  * All three key their sampling decisions off the engine-portable
  * [[graft.expressions.StrHash]] of the row id, so the output is
  * reproducible across runs, partition layouts and engines — re-running
  * the pipeline yields identical shards (the property that makes training
  * runs repeatable) — and every decision replays in a plain-SQL oracle.
  *
  * Reference context: the hydration step this engine generalizes
  * (sas:126-193) bulk-loads one already-curated table; these operators
  * produce that curated table from a raw corpus at scale.
  */
object Mixture {

  /** Thresholdable id hash. The raw [[graft.expressions.StrHash]] is a
    * positional polynomial whose MAGNITUDE tracks string length — a short
    * id ("42") can never exceed ~25k, so comparing it against a rate
    * threshold over 10^6 residues would keep everything. One multiplicative
    * mix (Knuth constant, mod the 1e9+7 prime) decorrelates the residue
    * from the id's length/prefix. The raw hash is clamped into 31 bits
    * FIRST: long or non-BMP-heavy ids can push the polynomial past 2^31,
    * and the unclamped product would then overflow a signed 64-bit —
    * silently wrapping in Spark while the SQL oracle errors. Clamped, the
    * product stays < 2^62.4 — exact on any engine. */
  private def idHash(idCol: String) =
    pmod(pmod(GraftExtensions.strHash(col(idCol).cast("string")),
        lit(2147483647L)) * lit(2654435761L),
      lit(1000000007L))

  /** Weighted mixture sampling: downsample each source so its kept cost
    * (tokens, chars, bytes — whatever `costCol` measures) approaches
    * `weights(source) × budget`. Per-source totals come from ONE tiny
    * aggregate that broadcasts back onto the corpus scan — the corpus
    * itself never shuffles, and the keep decision is a pure function of
    * the row id (hash-threshold), so the sample is deterministic under
    * task retries and repartitioning. A source whose total is below its
    * target keeps every row (rate caps at 1): mixture weights are
    * desiderata, not quotas. Sources absent from `weights` get rate 0.
    *
    * Output = kept rows plus their source's sampling `rate` column.
    */
  def sampleToBudget(
      df: DataFrame, idCol: String, srcCol: String, costCol: String,
      weights: Map[String, Double], budget: Long): DataFrame = {
    require(weights.nonEmpty && weights.valuesIterator.forall(_ >= 0.0),
      "mixture weights must be non-empty and non-negative")
    require(budget > 0, s"budget must be positive, got $budget")
    val wlit = map(weights.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    val rates = df.groupBy(col(srcCol))
      .agg(sum(col(costCol)).cast("double").as("__tot"))
      .withColumn("__w", coalesce(element_at(wlit, col(srcCol)), lit(0.0)))
      // w=0 must pin rate to 0 BEFORE the division: with __tot also 0 the
      // quotient is 0/0 = NaN, and least() would pick 1.0 (NaN sorts
      // greatest) — an unweighted zero-cost source would keep every row.
      // With __tot=0 but w>0 the quotient is +Inf and least caps at 1
      // (zero-cost source is trivially under target), which is intended.
      .withColumn("rate",
        when(col("__w") === 0.0, lit(0.0))
          .otherwise(least(lit(1.0), lit(budget.toDouble) * col("__w") / col("__tot"))))
      .select(col(srcCol), col("rate"))
    // hash-threshold keep: uniform over the 10^6 hash residues, strictly
    // below so rate 0 keeps nothing and rate 1 keeps everything
    df.join(broadcast(rates), Seq(srcCol))
      .filter(pmod(idHash(idCol), lit(1000000L)) < col("rate") * 1e6)
  }

  /** Deterministic corpus shuffle + shard assignment: global order = the
    * portable id hash (ties broken by id), `shard` = hash mod `nShards`,
    * `pos` = the row's position within its shard. ONE shuffle (the
    * per-shard sort); at 100 TB this is `repartition($"shard")` +
    * `sortWithinPartitions` + a partitioned write — randomized,
    * evenly-sized, reproducible training shards with no driver-side
    * state and no `orderBy` over the full corpus.
    */
  def reshard(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    df.withColumn("__h", idHash(idCol))
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("__h"), col(idCol))))
      .drop("__h")
  }

  /** Token-budget sequence packing: assign documents to fixed-budget
    * training sequences with concat-then-chunk semantics — documents are
    * laid out in the [[reshard]] order (portable hash, ties by id) and a
    * document belongs to the sequence its FIRST token lands in; a
    * document longer than the remaining room straddles the boundary
    * (standard causal-LM packing, where attention masks handle the seam).
    * A document longer than `budget` spans whole sequences — the
    * assignment skips the fully-covered sequence ids, by construction.
    *
    * Output: one row per non-empty (shard, seq): `n_docs`, `seq_tokens`
    * (sum of member token counts — can exceed `budget` via the straddle).
    *
    * 100 TB shape: ONE shuffle (the per-shard window, identical to
    * [[reshard]]'s — pack and reshard share a sort when composed);
    * per-shard cumulative sums run in parallel across shards, and all
    * arithmetic is integral (`div`), so the assignment replays exactly
    * in any SQL engine. Sequence ids stay exact past 2^53 where a
    * double-division would drift. NULL token counts pack as zero-width
    * docs (they take a position, consume no budget) rather than
    * poisoning the running sum with NULL.
    */
  def packSequences(df: DataFrame, idCol: String, nTokensCol: String,
                    budget: Int, nShards: Int): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val w = Window.partitionBy(col("shard")).orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__h", idHash(idCol))
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)).cast("int"))
      .withColumn("__nt", coalesce(col(nTokensCol).cast("long"), lit(0L)))
      .withColumn("__cum", sum(col("__nt")).over(w))
      // start offset of this doc in its shard's token stream → integral
      // division (internal fixed names spliced, never caller names)
      .withColumn("seq", expr(s"(__cum - __nt) div ${budget.toLong}"))
      .groupBy(col("shard"), col("seq"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__nt")).as("seq_tokens"))
  }

  /** Cluster-balanced ("diversity") sampling: keep at most `perCell` rows
    * from each IVF cell, chosen by the portable id hash. A uniform sample
    * over-represents the corpus's dense embedding-space modes; capping per
    * cluster keeps every region represented — the standard cheap
    * de-biasing step before training-set assembly. Input is
    * [[Ann.assignCells]] output, so the map-only pass that builds the
    * index also feeds the sample; the only shuffle is the per-cell
    * window, which plans as a partial group-limit (rank ≤ k pushes into
    * the map side), never a full per-cell sort spill.
    */
  def cellBalancedSample(assigned: DataFrame, idCol: String, perCell: Int): DataFrame = {
    require(perCell > 0, s"perCell must be positive, got $perCell")
    assigned
      .withColumn("__h", idHash(idCol))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("cell")).orderBy(col("__h"), col(idCol))))
      .filter(col("__rn") <= perCell)
      .drop("__h", "__rn")
  }
}
