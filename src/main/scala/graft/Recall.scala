package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Ann, Dedup, Knn}

/** Measured recall of every approximate query in the suite against its
  * exact counterpart — the trust signal the oracle alone cannot give: the
  * DuckDB compare pins that each approximate pipeline computes what it
  * SAYS (bucket assignment, probe choice, pruned top-k replay exactly),
  * not that what it says is CLOSE to the exact answer. Without this,
  * every nprobe/nBits choice is a guess.
  *
  * Top-k paths (q32 / q60 / q69): recall@10 = |approx ∩ exact| / 10
  * against the full-scan [[Knn.topK]] on the same query vector, via
  * [[Ann.recallAtK]]. The approx side IS the benched query closure, so
  * the number describes exactly what the bench timed.
  *
  * Pair paths (q61 / q64): pair recall = |approx ∩ exact| / |exact| over
  * (id_a, id_b) pairs, the exact side being the all-pairs cosine join at
  * the same minSim. All-pairs is O(n²), so BOTH sides are bounded to
  * vec_id < `pairCap`: at the graded sf0.1 that is the whole table; at
  * larger scales it is an honest fixed-cost estimate over a
  * deterministic subset (the cap is reported alongside the numbers).
  */
object Recall {

  /** (query name, recall in [0,1]) for each approximate suite entry. */
  def measure(spark: SparkSession, dir: String, pairCap: Int = PairCap): Seq[(String, Double)] = {
    val emb = SparkEntry.t(spark, dir, "embeddings")
    val q0 = SparkEntry.headVec(emb, 0)
    // q32/q69 exclude the query row; q60 does not (the collection query
    // surface has no exclude) — each approx path compares against the
    // exact scan with MATCHING exclusion semantics
    val exactExcl = Knn.topK(emb, "vec_id", "embedding", q0, 10, "cosine",
      excludeIds = Seq(0L)).select("vec_id")
    val exactAll = Knn.topK(emb, "vec_id", "embedding", q0, 10, "cosine")
      .select("vec_id")
    def run(name: String): DataFrame = SparkEntry.queries(name)(spark, dir)
    def one(df: DataFrame): Double = df.select("recall").head().getDouble(0)

    val topk = Seq(
      "q32_ivf_knn" ->
        one(Ann.recallAtK(run("q32_ivf_knn"), exactExcl, "vec_id")),
      "q69_quantized_knn" ->
        one(Ann.recallAtK(run("q69_quantized_knn"), exactExcl, "vec_id")),
      "q60_collection_ivf_knn" ->
        one(Ann.recallAtK(run("q60_collection_ivf_knn").select(col("id")),
          exactAll.select(col("vec_id").cast("string").as("id")), "id")))

    val bounded = emb.filter(col("vec_id") < pairCap)
    // the exact all-pairs join is the expensive side — cache the pair keys
    // so the three SRP configurations don't each recompute it
    val exactPairs = pairKey(
      Dedup.embeddingNearDup(bounded, "vec_id", "embedding", minSim = 0.2)).cache()
    val pairs = Seq(
      ("q61_embedding_neardup_lsh", 1, 1),
      ("q64_neardup_multiprobe", 2, 1),
      ("q82_neardup_multitable", 1, 4))
      .map { case (name, probes, tables) =>
        // same parameters as the suite entries, over the bounded set
        val approx = pairKey(Dedup.embeddingNearDupLsh(bounded, "vec_id", "embedding",
          minSim = 0.2, dim = 64, nBits = 8, probes = probes, tables = tables))
        name -> one(Ann.recallAtK(approx, exactPairs, "pair"))
      }
    exactPairs.unpersist()
    topk ++ pairs
  }

  private def pairKey(df: DataFrame): DataFrame =
    df.select(concat_ws("_", col("id_a"), col("id_b")).as("pair"))

  /** The pair-recall bound: both sides of the q61/q64/q82 recall
    * measurement restrict to vec_id < this, keeping the exact all-pairs
    * side at fixed cost across scales. Reported in the bench JSON so the
    * subset basis is never silent. */
  val PairCap: Int = 5000

  /** Excluded-mass audits for the suite's LSH configurations at the bench
    * scale — the no-silent-caps numbers the bench JSON reports alongside
    * recall, one per configuration (q61/q64 share the single-table
    * histogram; q82's four tables have their own). Uses the exact audit
    * job, not the observation, so an all-excluded run still reports its
    * loss (see [[Dedup.lshExcludedRows]]). */
  def lshExcluded(spark: SparkSession, dir: String): Seq[(String, Long)] = {
    val emb = SparkEntry.t(spark, dir, "embeddings")
    Seq(
      "lsh_excluded_rows" -> Dedup.lshExcludedRows(emb, "vec_id", "embedding",
        dim = 64, nBits = 8, maxBucketSize = 1000),
      "lsh_excluded_rows_t4" -> Dedup.lshExcludedRows(emb, "vec_id", "embedding",
        dim = 64, nBits = 8, maxBucketSize = 1000, tables = 4))
  }
}
