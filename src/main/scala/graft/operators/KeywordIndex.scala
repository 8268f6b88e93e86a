package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted keyword-statistics (BM25) sidecar — the scale path for the
  * keyword leg of hybrid retrieval.
  *
  * [[Retrieval.bm25]] is the correct baseline, but its per-query cost is
  * O(corpus): every call re-explodes the whole document column to derive
  * per-doc lengths, term frequencies, document frequencies, and corpus
  * totals (reference context: README.md:5 names similarity-search/RAG
  * workloads — hybrid stacks fire this once per user query). This sidecar
  * re-expresses the classic inverted-file idea (Lucene's postings +
  * norms; the same altitude DocIndex takes for `$contains`) in Spark
  * layout terms:
  *
  *   postings = one row per DISTINCT (doc, term): (term, id, tf, dl),
  *     written parquet, PARTITIONED by `tp = pmod(xxhash64(term), TpCount)`
  *     — `dl` (the doc's TOTAL token count, the BM25 length norm) rides
  *     denormalized on every posting row so a query never joins a
  *     corpus-sized lengths table;
  *   stats   = one row per id-bucket: (n_docs, tot_dl), parked in the
  *     RESERVED partition `tp = TpCount` (pmod yields 0..TpCount-1, so
  *     the value can never collide with a real term's partition) — a
  *     query aggregates ≤ numBuckets rows to recover the corpus totals.
  *
  * A query for terms T then reads ONLY the `tp` partitions T hashes into
  * (partition pruning at file listing; `term IN` prunes rowgroups below
  * that): per-term `df` is a count over the pruned read itself, and the
  * score arithmetic is [[Retrieval.bm25ScoreFold]] — the literal same
  * expression tree the scan path folds — over the SAME LONG-typed inputs,
  * so index answers are bit-identical to the scan path by construction
  * (the DocIndex rule: an index confines IO, never changes semantics).
  *
  * 100 TB shape: the build is one explode + one (pb,id,term) count (the
  * only corpus shuffle) + a per-doc window sum + a partitioned write; the
  * postings table is ~(avg distinct terms per doc) × corpus rows of
  * fixed-width rows — the normal inverted-index price. A query touches
  * |T| partitions of it: per-query cost is O(matching postings), not
  * O(corpus), and nothing collects to the driver.
  *
  * Tokenization is EXACTLY the scan path's — the shared
  * [[Retrieval.termsCol]] written form of the collection's analyzer
  * setting: the two paths must agree token-for-token or the equivalence
  * contract breaks. Which analyzer a build used is stamped into the
  * build dir ([[AnalyzerStamp]]); readers and refreshes honor the stamp.
  */
object KeywordIndex {

  /** Term-hash partition count. 64 keeps per-partition listing cheap at
    * small scale; at 100 TB raise it with the corpus (it only changes
    * write layout, queries always prune by hash). */
  val TpCount = 64

  /** The reserved stats partition: per-id-bucket (n_docs, tot_dl) rows
    * ride the SAME parquet table (uniform schema, uniform carry/refresh
    * handling) with `term`/`id` null and the counts in `tf`/`dl`. */
  val StatsTp: Int = TpCount

  /** The analyzer stamp a build dir carries (one-line file, the analyzer
    * name the postings were tokenized with): readers serve a build ONLY
    * when its stamp equals the collection's current analyzer setting, and
    * an incremental refresh never carries slices across a stamp change —
    * otherwise the index ≡ scan contract would silently break the moment
    * a collection's analyzer is modified. Absent = "whitespace" (builds
    * predate the setting; that was the only rule then). */
  val AnalyzerStamp = "_graft_analyzer"

  private def tp(term: Column) =
    pmod(xxhash64(term), lit(TpCount)).cast("int")

  /** The scan path's exact tokenization (see class doc) — the shared
    * [[Retrieval.termsCol]] written form of the given analyzer. */
  private def toks(docs: DataFrame, idCol: String, docCol: String,
                   pbCol: Column, analyzer: String): DataFrame =
    docs.select(col(idCol).as("id"), pbCol.cast("int").as("pb"),
      explode(Retrieval.termsCol(col(docCol), analyzer)).as("term"))

  /** Build the postings + stats frame: (tp, pb, term, id, tf, dl).
    * `pbCol` is the caller's id-bucket — the refresh axis: a mutation
    * touches a known set of id buckets, and the `tp=<t>/pb=<b>` layout
    * lets a refresh rebuild ONLY the touched `pb` slices while carrying
    * every other slice from the previous build (the DocIndex pattern).
    * Queries never mention `pb`. */
  def postingsWithPb(docs: DataFrame, idCol: String, docCol: String,
                     pbCol: Column,
                     analyzer: String = Retrieval.DefaultAnalyzer): DataFrame = {
    val tf = toks(docs, idCol, docCol, pbCol, analyzer)
      .groupBy("pb", "id", "term").agg(count(lit(1)).as("tf"))
    // dl = the doc's TOTAL token count = Σ tf over its terms — a window
    // sum over the tf stream. This second exchange carries POSTINGS rows
    // (distinct terms per doc — typically 5-10x smaller than the token
    // stream the first shuffle combined), and replaces the aggregate +
    // corpus-sized self-join a separate lengths table would need
    val rows = tf
      .withColumn("dl", sum(col("tf")).over(Window.partitionBy("pb", "id")))
      .select(tp(col("term")).as("tp"), col("pb"), col("term"), col("id"),
        col("tf"), col("dl"))
    // per-bucket corpus stats: n_docs = docs with >= 1 token — under
    // "whitespace" split always yields >= 1 token so that is all docs;
    // under "simple" an all-punctuation doc yields 0 tokens and drops
    // out of the census on BOTH sides (the scan path's dl aggregate runs
    // over the same exploded stream) — parity holds either way;
    // tot_dl = Σ tf = total tokens in the bucket
    val idType = docs.schema(idCol).dataType
    val stats = tf.groupBy("pb")
      .agg(countDistinct(col("id")).as("__n"), sum(col("tf")).as("__tot"))
      .select(lit(StatsTp).as("tp"), col("pb"),
        lit(null).cast("string").as("term"), lit(null).cast(idType).as("id"),
        col("__n").as("tf"), col("__tot").as("dl"))
    rows.unionByName(stats)
  }

  /** Write tp/pb-sliced postings: `tp=<t>/pb=<b>/...parquet`. */
  def writeWithPb(docs: DataFrame, idCol: String, docCol: String,
                  pbCol: Column, path: String,
                  maxRowsPerFile: Long = 4000000L,
                  analyzer: String = Retrieval.DefaultAnalyzer): Unit =
    postingsWithPb(docs, idCol, docCol, pbCol, analyzer)
      // one shuffle BY tp at build time, same rationale as the DocIndex
      // pack: without it every task writes a file into every partition
      .repartition(col("tp"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRowsPerFile)
      .partitionBy("tp", "pb").parquet(path)

  /** BM25 top-n served from a postings layout: (id, rnk, score), the
    * same shape — and by the shared-fold contract the same VALUES — as
    * [[Retrieval.bm25TopK]] over the indexed corpus.
    *
    * Plan shape: the postings scan prunes to the query terms' `tp`
    * partitions (literal IN, computed driver-side with the writer's own
    * hash — lands as a PartitionFilter) plus the one stats partition;
    * `df` is a tiny per-term count over the pruned read and BROADCASTS
    * back onto it, the ≤ numBuckets stats rows fold to one broadcast
    * row, and the only exchange carries (id, score) pairs for MATCHING
    * docs — the corpus itself is never read. */
  def bm25TopK(postings: DataFrame, queryTerms: Seq[String], n: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame =
    Retrieval.rankTopN(bm25Scores(postings, queryTerms, k1, b), n)

  /** The PRE-RANK (id, score) frame of [[bm25TopK]] — exposed so a caller
    * can confine eligibility (e.g. a metadata `where` filter) between the
    * score fold and the top-n rank without touching the scores: BM25
    * statistics stay corpus-global by contract (the Lucene filter-query
    * rule), so this is the ONLY correct insertion point for a filter. */
  def bm25Scores(postings: DataFrame, queryTerms: Seq[String],
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    Retrieval.bm25ScoreFold(perTerm(postings, queryTerms), k1, b)
  }

  /** The index-side per-(doc, term) frame both [[bm25TopK]] and
    * [[bm25TopKBatch]] fold — ONE written form of the pruned read (tp
    * partition pruning, term rowgroup pruning, GLOBAL df over the pruned
    * hits, the stats-partition census), so the single and batch paths
    * cannot silently diverge. */
  private def perTerm(postings: DataFrame, terms: Seq[String]): DataFrame = {
    val tps = terms.map(tpOf).distinct
    val hits = postings
      .filter(col("tp").isin(tps: _*))
      .filter(col("term").isin(terms: _*))
      .select(col("id"), col("term"), col("tf"), col("dl"))
    val dft = hits.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = postings.filter(col("tp") === lit(StatsTp))
      .agg(sum(col("tf")).as("n_docs"), sum(col("dl")).as("tot_dl"))
    hits
      .join(broadcast(dft), "term")
      .crossJoin(broadcast(stats))
  }

  /** The BATCH form of [[bm25TopK]]: ONE pruned postings read (the union
    * of every query's `tp` partitions + the stats partition) serves the
    * whole batch — per-query index reads would re-list and re-open the
    * same files once per query. A tiny broadcast (qid, term) frame fans
    * matching postings out to the queries that asked for each term; `df`
    * stays GLOBAL per term, so each qid's scores are exactly its
    * single-query [[bm25TopK]] scores (and, by the shared-fold contract,
    * exactly the scan path's). Returns (qid, id, rnk, score). */
  def bm25TopKBatch(postings: DataFrame, queries: Seq[Seq[String]], n: Int,
                    k1: Double = 1.2, b: Double = 0.75): DataFrame =
    Retrieval.rankTopNBatch(bm25ScoresBatch(postings, queries, k1, b), n)

  /** The PRE-RANK (qid, id, score) frame of [[bm25TopKBatch]] — the batch
    * twin of [[bm25Scores]], same eligibility-confinement contract. */
  def bm25ScoresBatch(postings: DataFrame, queries: Seq[Seq[String]],
                      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qt = Retrieval.queryTermsFrame(postings, queries)
    Retrieval.bm25ScoreFold(
      perTerm(postings, queries.flatten.distinct)
        .join(broadcast(qt), "term"), k1, b, Seq("qid", "id"))
  }

  /** The writer's partition key for one term, computed driver-side with
    * the same function the plan uses (`xxhash64` = XXH64 seed 42 over
    * the UTF-8 bytes — the DocIndex.gpOf contract). */
  def tpOf(term: String): Int = {
    val u = org.apache.spark.unsafe.types.UTF8String.fromString(term)
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      u, org.apache.spark.sql.types.StringType, 42L)
    math.floorMod(h, TpCount.toLong).toInt
  }
}
