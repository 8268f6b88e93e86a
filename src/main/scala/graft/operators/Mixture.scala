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
  private def idHash(idCol: String): org.apache.spark.sql.Column = idHash(col(idCol))

  private def idHash(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(pmod(GraftExtensions.strHash(id.cast("string")),
        lit(2147483647L)) * lit(2654435761L),
      lit(1000000007L))

  /** The same length-decorrelated hash, shared with the other curation
    * operators (feature bucketing, blocklist selection) so every
    * hash-keyed decision in the pipeline replays with ONE oracle form. */
  private[graft] def spreadHash(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    idHash(id)

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

  /** Temperature-scaled mixture sampling: like [[sampleToBudget]], but the
    * per-source weights are DERIVED from the source totals instead of
    * hand-specified — weight ∝ total^alpha, normalized. alpha = 1
    * reproduces natural proportions, alpha = 0 gives every source equal
    * budget share, and the usual 0 < alpha < 1 band (0.3–0.7 in the
    * multilingual-sampling literature) upweights small sources without
    * letting any single giant source dominate the mixture.
    *
    * Everything stays relational: totals, weights and rates are computed
    * in-engine from two tiny aggregates (≈|sources| rows) that broadcast
    * back onto the corpus scan — the corpus itself never shuffles, and
    * the keep decision is the same deterministic hash-threshold as
    * [[sampleToBudget]]. For alpha ∈ {0, 0.5, 1} the weight arithmetic is
    * IEEE-exact on any engine (identity / sqrt / constant), so those
    * settings — sqrt being the common default — replay in a SQL oracle
    * (q90); other alphas go through pow(), whose last ulp is libm-specific.
    *
    * Output = kept rows plus their source's sampling `rate`.
    */
  def sampleTemperature(
      df: DataFrame, idCol: String, srcCol: String, costCol: String,
      alpha: Double, budget: Long): DataFrame = {
    require(alpha >= 0.0, s"alpha must be non-negative, got $alpha")
    require(budget > 0, s"budget must be positive, got $budget")
    val totals = df.groupBy(col(srcCol))
      .agg(sum(col(costCol)).cast("double").as("__tot"))
      // exact-replay forms first; pow() only for the exotic alphas
      .withColumn("__w", alpha match {
        case 0.0 => lit(1.0)
        case 0.5 => sqrt(col("__tot"))
        case 1.0 => col("__tot")
        case a   => pow(col("__tot"), lit(a))
      })
    // normalizer: one scalar row, joined back onto the |sources|-row
    // table. The sum goes through an exact decimal so it is independent
    // of aggregation order (a double fold's last ulp varies with
    // partition order, and the rate threshold comparison must not)
    val wsum = totals.agg(
      sum(col("__w").cast(org.apache.spark.sql.types.DecimalType(38, 18)))
        .cast("double").as("__wsum"))
    val rates = totals.crossJoin(broadcast(wsum))
      // same NaN discipline as sampleToBudget: a zero-weight source (or a
      // degenerate all-zero corpus, where __wsum is 0) must rate 0, not
      // ride a 0/0 = NaN through least()
      .withColumn("rate",
        when(col("__w") === 0.0 || col("__wsum") === 0.0, lit(0.0))
          .otherwise(least(lit(1.0),
            lit(budget.toDouble) * (col("__w") / col("__wsum")) / col("__tot"))))
      .select(col(srcCol), col("rate"))
    df.join(broadcast(rates), Seq(srcCol))
      .filter(pmod(idHash(idCol), lit(1000000L)) < col("rate") * 1e6)
  }

  /** Leakage-safe split assignment: every row of a GROUP (source, host,
    * document family — whatever `grpCol` names) lands in the same split,
    * decided by the portable hash of the group key against cumulative
    * fraction thresholds. Splitting rows i.i.d. leaks near-duplicate
    * content from one origin across train/validation — group-keyed
    * hashing is the standard fix, and the hash makes it deterministic
    * across runs, partition layouts and engines.
    *
    * Map-only (the hash is a pure function of the group column — no
    * shuffle, no group table); fractions must sum to 1 and every group
    * lands in exactly one split by construction of the cumulative
    * thresholds over the 10^6 hash residues. Exact-fraction caveat: the
    * split SIZES track the fractions only in expectation over many
    * groups — with few groups the rounding is coarse; that is inherent
    * to group-atomic splitting, not the hash.
    */
  def groupSplit(df: DataFrame, grpCol: String,
                 fractions: Seq[(String, Double)]): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 > 0.0),
      s"split fractions must be non-empty and positive, got $fractions")
    require(fractions.map(_._1).distinct.size == fractions.size,
      s"duplicate split names: $fractions")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${fractions.map(_._2).sum}")
    val cums = fractions.scanLeft(0.0)(_ + _._2).tail
    val h = pmod(idHash(col(grpCol)), lit(1000000L))
    // the last bucket takes everything below 10^6 outright: the cumulative
    // threshold is 1.0·10^6 only up to float rounding, and a residue
    // falling in that crack would otherwise get a NULL split
    val split = fractions.init.zip(cums.init)
      .foldLeft(org.apache.spark.sql.functions.when(lit(false), lit(""))) {
        case (acc, ((name, _), cum)) => acc.when(h < cum * 1e6, lit(name))
      }.otherwise(lit(fractions.last._1))
    df.withColumn("split", split)
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
