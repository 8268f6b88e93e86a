package graft.operators

import scala.jdk.CollectionConverters._

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

  // ---- analyzers: ONE written tokenization rule per name -------------
  //
  // The analyzer is the contract that keeps keyword retrieval's three
  // sides — the corpus scan ([[bm25PerTerm]]), the persisted sidecar
  // build ([[KeywordIndex]]) and the query text ([[queryTerms]]) —
  // producing the same tokens. Each name below has exactly TWO written
  // forms (a Column form and a bit-identical driver-side String form);
  // every caller goes through them, so index ≡ scan ≡ query holds by
  // construction, never by parallel maintenance.
  //
  //   "whitespace" (default): lowercase, split on \s+ — the original
  //     rule, kept verbatim for compatibility (including its quirk of
  //     counting a leading-whitespace empty token into dl).
  //   "simple": lowercase, split on \s+, then strip LEADING/TRAILING
  //     characters outside Unicode letters/digits from each token and
  //     drop tokens that strip to empty — the rule a natural-language
  //     RAG query needs ("joins." must match the stored token "joins";
  //     the reference's declared workload is exactly such queries,
  //     README.md:5). Interior punctuation survives ("o'brien",
  //     "3.14") — this is Lucene-SimpleAnalyzer altitude, not stemming.
  //   "english": "simple" + drop English stopwords (the
  //     [[graft.functions.TextAnalysis.stopwordList]] single source of
  //     truth, so oracle SQL replays from the same list) — stopwords
  //     leave the dl length norm too, Lucene-StandardAnalyzer-with-
  //     stops altitude. Stemming stays out: it is corpus-destructive
  //     and language-model-specific; a stack that wants it should
  //     pre-normalize the document column.

  val DefaultAnalyzer = "whitespace"
  val Analyzers: Set[String] = Set("whitespace", "simple", "english")

  private val EnglishStops: Seq[String] =
    graft.functions.TextAnalysis.stopwordList("en")
  private val EnglishStopSet: Set[String] = EnglishStops.toSet

  /** LOUD on unknown analyzer names — shared by every entry point, so a
    * typo'd collection setting fails at first use, not as silent
    * whitespace behavior. */
  def requireAnalyzer(analyzer: String): Unit =
    require(Analyzers.contains(analyzer),
      s"unknown analyzer '$analyzer' — supported: ${Analyzers.toSeq.sorted.mkString(", ")}")

  // Java and RE2 both support these Unicode property classes, so the
  // Spark plan, the driver-side twin and a DuckDB oracle replay agree.
  private val StripLead = "^[^\\p{L}\\p{N}]+"
  private val StripTrail = "[^\\p{L}\\p{N}]+$"

  /** The Column form of one analyzer: text → array<string> of terms.
    * This is the ONLY place corpus-side tokenization is written. */
  def termsCol(text: Column, analyzer: String): Column = {
    requireAnalyzer(analyzer)
    analyzer match {
      case "whitespace" => split(lower(text), "\\s+")
      case _ =>
        val stripped = transform(split(lower(text), "\\s+"),
          t => regexp_replace(regexp_replace(t, StripLead, ""), StripTrail, ""))
        if (analyzer == "simple") filter(stripped, t => length(t) > 0)
        else {
          // array_contains over a literal array (the stopwordHits shape)
          val sw = array(EnglishStops.map(lit): _*)
          filter(stripped, t => length(t) > 0 && !array_contains(sw, t))
        }
    }
  }

  /** The driver-side twin of [[termsCol]] for ONE already-split token:
    * lowercase through UTF8String (the exact routine Spark's lower()
    * applies corpus-side — a JVM default-locale toLowerCase is NOT
    * bit-identical, e.g. tr-TR dotted/dotless I) + the same strip
    * regexes via java.util.regex (which Spark's regexp_replace also
    * compiles to). May return "" under "simple" — callers drop those. */
  def normalizeTerm(term: String, analyzer: String): String = {
    requireAnalyzer(analyzer)
    val low = org.apache.spark.unsafe.types.UTF8String.fromString(term)
      .toLowerCase.toString
    analyzer match {
      case "whitespace" => low
      case _ =>
        val stripped = low.replaceAll(StripLead, "").replaceAll(StripTrail, "")
        if (analyzer == "english" && EnglishStopSet.contains(stripped)) ""
        else stripped
    }
  }

  /** A query TEXT under one analyzer: the exact corpus rule, duplicates
    * collapsed (BM25 scores a term once per DISTINCT query term). */
  def queryTerms(text: String, analyzer: String = DefaultAnalyzer): Seq[String] = {
    requireAnalyzer(analyzer)
    org.apache.spark.unsafe.types.UTF8String.fromString(text)
      .toLowerCase.toString.split("\\s+").toSeq
      .map(t => normalizeTerm(t, analyzer)) // idempotent re-lowercase
      .filter(_.nonEmpty).distinct
  }

  /** Per-document BM25-style keyword score for `queryTerms` (tokens in
    * the ANALYZER's written form — pre-analyzed by the caller, e.g. via
    * [[queryTerms]]). Returns (id, score) for every document matching
    * at least one term. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
           analyzer: String = DefaultAnalyzer): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    bm25ScoreFold(bm25PerTerm(docs, idCol, textCol, queryTerms, analyzer), k1, b)
  }

  /** The scan-side per-(doc, term) frame both [[bm25]] and [[bm25Batch]]
    * fold — ONE written form of the derivation (tokenization, per-doc
    * length, corpus stats, tf over the given terms, GLOBAL df), so the
    * single and batch paths cannot silently diverge. */
  private def bm25PerTerm(docs: DataFrame, idCol: String, textCol: String,
                          terms: Seq[String], analyzer: String): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      explode(termsCol(col(textCol), analyzer)).as("term"))
    // full-stream agg: per-doc token length (the BM25 length norm)
    val dl = toks.groupBy("id").agg(count(lit(1)).as("dl"))
    // corpus stats ride the plan — no driver-side collect
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot_dl"))
    // filtered agg: tf only for the given terms (predicate pushes into
    // the exploded stream; the full vocabulary is never aggregated)
    val tf = toks.filter(col("term").isin(terms: _*))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dft), "term")
      .join(dl, "id")
      .crossJoin(broadcast(stats))
  }

  /** The (qid, term) fan-out frame for a query batch (per-query DISTINCT
    * terms — BM25 scores a term once per distinct query term). */
  private[graft] def queryTermsFrame(docs: DataFrame,
                                     queries: Seq[Seq[String]]): DataFrame = {
    require(queries.nonEmpty, "a query batch needs at least one query")
    queries.zipWithIndex.foreach { case (q, i) =>
      require(q.nonEmpty, s"query $i has no terms") }
    val spark = docs.sparkSession
    import spark.implicits._
    queries.zipWithIndex
      .flatMap { case (ts, qi) => ts.distinct.map(t => (qi, t)) }
      .toDF("qid", "term")
  }

  /** The BATCH form of [[bm25]] — one corpus pass scores EVERY query in
    * the batch (the RAG serving shape: per-query corpus passes would
    * multiply the dominant cost by the batch size). The token stream,
    * per-doc lengths, corpus stats, tf over the UNION of query terms and
    * the per-term df are all computed once; a tiny broadcast (qid, term)
    * frame then fans matching postings out to the queries that asked for
    * each term, and the one shared fold scores per (qid, id). df stays
    * GLOBAL per term (document frequency is query-independent), so each
    * qid's scores are EXACTLY its single-query [[bm25]] scores. */
  def bm25Batch(docs: DataFrame, idCol: String, textCol: String,
                queries: Seq[Seq[String]],
                k1: Double = 1.2, b: Double = 0.75,
                analyzer: String = DefaultAnalyzer): DataFrame = {
    val qt = queryTermsFrame(docs, queries)
    bm25ScoreFold(
      bm25PerTerm(docs, idCol, textCol, queries.flatten.distinct, analyzer)
        .join(broadcast(qt), "term"), k1, b, Seq("qid", "id"))
  }

  /** Batch top-n: (qid, id, rnk, score), rank ties by id — per-query
    * rank windows over the fold's output. The `rnk <= n` filter directly
    * over the per-qid row_number is Spark's WindowGroupLimit shape: each
    * input partition forwards at most n rows per qid before the exchange,
    * so the window never sorts the full match stream. */
  private[graft] def rankTopNBatch(scores: DataFrame, n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("score").desc, col("id"))
    scores.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= n)
      .select(col("qid"), col("id"), col("rnk"), col("score"))
  }

  def bm25TopKBatch(docs: DataFrame, idCol: String, textCol: String,
                    queries: Seq[Seq[String]], n: Int,
                    k1: Double = 1.2, b: Double = 0.75,
                    analyzer: String = DefaultAnalyzer): DataFrame =
    rankTopNBatch(bm25Batch(docs, idCol, textCol, queries, k1, b, analyzer), n)

  /** The BM25 arithmetic + per-doc fold shared by the scan path above and
    * the persisted [[KeywordIndex]] read path: `perTerm` carries one row
    * per (matching doc, query term) with LONG columns `tf`, `df`, `dl`,
    * `n_docs`, `tot_dl` beside `id` — the scan derives them inline, the
    * index reads them from the sidecar — and the output is (id, score).
    * ONE written form of the formula serves both, so index ≡ scan holds
    * by construction (the DocIndex rule), not by parallel maintenance. */
  private[graft] def bm25ScoreFold(perTerm: DataFrame, k1: Double, b: Double,
                                   groupCols: Seq[String] = Seq("id")): DataFrame = {
    val scored = perTerm
      .withColumn("idf",
        (col("n_docs").cast("double") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
      .withColumn("s",
        (col("idf") * (col("tf") * lit(k1 + 1)))
          / (col("tf") + lit(k1) * (lit(1 - b)
            + (lit(b) * col("dl").cast("double") * col("n_docs")) / col("tot_dl").cast("double"))))
    // round → exact decimal sum: the per-doc fold over terms is order-free.
    // groupCols = Seq("qid","id") is the batch form — the per-row
    // arithmetic is IDENTICAL, only the fold key widens
    scored.groupBy(groupCols.map(col): _*)
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
               k1: Double = 1.2, b: Double = 0.75,
               analyzer: String = DefaultAnalyzer): DataFrame =
    rankTopN(bm25(docs, idCol, textCol, queryTerms, k1, b, analyzer), n)

  /** Top-n of an (id, score) frame as (id, rnk, score) — the shared tail
    * of the scan and [[KeywordIndex]] BM25 paths (see [[bm25TopK]]'s
    * scale note: TakeOrdered heaps, then a window over ≤ n survivors). */
  private[graft] def rankTopN(scores: DataFrame, n: Int): DataFrame = {
    val top = scores
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
          k: Int = 60): DataFrame =
    rrfKeyed(ranked.map(df => df.select(col(idCol).as("id"), col(rankCol))),
      Seq("id"), rankCol, k)

  /** [[rrf]] over composite keys — the batch form: lists carry
    * (keyCols..., rankCol) and fuse per key tuple (e.g. (qid, id)), so
    * one call fuses every query in a batch. Same arithmetic, same
    * outer-merge semantics. */
  def rrfKeyed(ranked: Seq[DataFrame], keyCols: Seq[String],
               rankCol: String, k: Int = 60): DataFrame = {
    require(ranked.size >= 2, "rrf fuses at least two ranked lists")
    val contribs = ranked.zipWithIndex.map { case (df, i) =>
      df.select(keyCols.map(col) :+
        (lit(1.0) / (lit(k.toDouble) + col(rankCol))).as(s"c$i"): _*)
    }
    val merged = contribs.reduce((a, b) => a.join(b, keyCols, "full_outer"))
    val total: Column = contribs.indices
      .map(i => coalesce(col(s"c$i"), lit(0.0)))
      .reduce(_ + _)
    merged.select(keyCols.map(col) :+ round(total, 6).as("rrf"): _*)
  }

  /** Min-max-normalized weighted score fusion — the score-aware hybrid
    * combiner (Weaviate's "relative score fusion"; the main published
    * alternative to rank-only [[rrf]], which discards score magnitudes):
    * each list's scores normalize to [0,1] over THAT list via
    * (s − min)/(max − min) — a constant-score list normalizes to 1
    * (presence is full signal, and the 0/0 would otherwise NaN-poison the
    * fusion) — then fused(id) = Σ_i wᵢ·normᵢ(id), absent ids contributing
    * 0 from that list.
    *
    * 100 TB shape: per-list min/max are single-row aggregates that ride
    * the plan and BROADCAST back onto their own list (never corpus-wide
    * state); the outer merge joins the ≤topN ranked lists, not corpora.
    * Arithmetic is subtract/divide/multiply — IEEE-exact — and the final
    * Σ is a fixed-order written expression, so fused scores replay in
    * SQL. Every input carries (idCol, scoreCol), higher = better. */
  def fuseMinMax(ranked: Seq[(DataFrame, Double)], idCol: String,
                 scoreCol: String): DataFrame = {
    require(ranked.size >= 2, "fuseMinMax fuses at least two scored lists")
    require(ranked.forall(_._2 >= 0), "fusion weights must be non-negative")
    val contribs = ranked.zipWithIndex.map { case ((df, w), i) =>
      // per-list min/max as a GLOBAL WINDOW over the list, not a separate
      // aggregate subtree: inputs are bounded ranked lists (top-N) by
      // contract, so the single-partition window is ≤ N rows — and the
      // list's (possibly expensive) upstream plan appears exactly ONCE,
      // where a crossJoin(agg(df)) form would embed and re-execute it twice
      val W = org.apache.spark.sql.expressions.Window
      val all = W.partitionBy().rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
      df.select(col(idCol).as("id"), col(scoreCol).as("__s"))
        .select(col("id"), col("__s"),
          min(col("__s")).over(all).as("__mn"), max(col("__s")).over(all).as("__mx"))
        .select(col("id"),
          (lit(w) * when(col("__mx") === col("__mn"), lit(1.0))
            .otherwise((col("__s") - col("__mn")) / (col("__mx") - col("__mn"))))
            .as(s"c$i"))
    }
    val merged = contribs.reduce((a, b) => a.join(b, Seq("id"), "full_outer"))
    val total: Column = contribs.indices
      .map(i => coalesce(col(s"c$i"), lit(0.0)))
      .reduce(_ + _)
    merged.select(col("id"), round(total, 6).as("fused"))
  }

  /** Maximal Marginal Relevance re-rank (Carbonell & Goldstein 1998) — the
    * diversity-aware top-k every RAG stack layers over plain kNN (e.g.
    * LangChain's `max_marginal_relevance_search` on its Chroma wrapper):
    * greedily select k of the `fetchN` most query-similar candidates,
    * each pick maximizing
    *
    *   λ·sim(q, d) − (1−λ)·max_{s ∈ selected} sim(d, s)
    *
    * over cosine similarity, ties broken by id ascending; the first pick
    * (empty selected set) is pure relevance with a redundancy term of 0.
    *
    * 100 TB shape: the DISTRIBUTED part is the candidate fetch — one
    * corpus scan computing sim(q, ·) into a TakeOrdered top-fetchN (heap
    * per partition, fetchN·P rows to one reducer, never a global sort).
    * The greedy phase is a DECLARED BOUNDED driver-side primitive over
    * exactly fetchN rows (fetchN·dim floats — KBs): MMR's selection is
    * inherently sequential in k, and k·fetchN ≪ any distribution
    * overhead. Corpus size never reaches the driver.
    *
    * Determinism: sims and scores use only IEEE-exact ops folded in
    * element order (the same sequential fold as the codegen'd distance
    * expressions), so the whole greedy trace replays in SQL — q116
    * hash-pins selection order AND scores against an unrolled oracle.
    */
  /** LOUD upper bound on the driver-side candidate set: the greedy phase
    * collects exactly ≤ fetchN rows BY CONTRACT, and this cap makes that
    * contract enforced rather than advisory — fetchN=10⁷ throws instead
    * of collecting 10⁷ rows to the driver (same pattern as
    * [[DocIndex.MaxGramSets]]). 2¹⁶ candidates × a 1k-float embedding is
    * ~256 MB transient driver heap, the sane ceiling; MMR's O(k·fetchN)
    * greedy phase is itself unusable far below it. */
  val MaxFetchN = 65536

  def mmr(df: DataFrame, idCol: String, embCol: String, queryVec: Seq[Float],
          k: Int, fetchN: Int, lambda: Double = 0.5): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(fetchN >= k, s"fetchN ($fetchN) must be >= k ($k)")
    require(fetchN <= MaxFetchN,
      s"fetchN ($fetchN) exceeds MaxFetchN ($MaxFetchN) — the greedy re-rank " +
        "is a bounded DRIVER-side primitive; re-rank that many candidates distributed " +
        "(query + a smaller fetchN) instead of collecting them")
    require(lambda >= 0 && lambda <= 1, s"lambda must be in [0,1], got $lambda")
    // LOUD on a degenerate QUERY vector: the try_divide + null/NaN filter
    // below exists to drop garbage CANDIDATES, but with a zero/non-finite
    // query every candidate's __simq is null and the operator would return
    // silently empty. Collection.queryMmr/queryMmrText already gate this;
    // direct operator callers get the same contract.
    require(queryVec.exists(_ != 0f),
      "mmr query vector is all zeros — cosine similarity is undefined for it")
    require(queryVec.forall(v => !v.isNaN && !v.isInfinite),
      "mmr query vector carries NaN/Inf values — cosine similarity is undefined for it")
    val spark = df.sparkSession
    val q = typedLit(queryVec)
    // a zero vector (plain add() does not gate them) has no defined
    // cosine: under ANSI the raw divide would THROW on it, non-ANSI
    // yields NaN — which Spark's desc ordering ranks ABOVE every real
    // number, so the garbage row would be picked at rank 1 and its NaN
    // score would keep winning every later comparison. (Plain query is
    // shielded: NaN dist sorts LAST under asc.) try_divide turns the
    // zero-norm case into NULL, and the filter drops it along with
    // null/ragged embeddings; !isnan covers NaN payload values.
    import graft.functions.Distances.{dot, normSq}
    val simCol = try_divide(dot(col(embCol), q),
      sqrt(normSq(col(embCol))) * sqrt(normSq(q)))
    val cands = df
      .select(col(idCol), col(embCol), simCol.as("__simq"))
      .filter(col("__simq").isNotNull && !isnan(col("__simq")))
      .orderBy(col("__simq").desc, col(idCol))
      .limit(fetchN)
      .collect() // bounded: exactly ≤ fetchN rows by construction
    val n = cands.length
    val ids = cands.map(_.get(0))
    val embs = cands.map(_.getSeq[Float](1).toArray)
    val simq = cands.map(_.getDouble(2))
    // incremental max-redundancy: after each pick p, red(c) ← max(red(c),
    // sim(c, p)) — the O(k·n) form of the arg-max over the selected set.
    // Initialized to −∞, NOT 0: cosine similarity is signed, and a 0 floor
    // would silently clamp the redundancy of anti-correlated candidates
    // (exactly the ones MMR should favor). Rank 1's empty-set term is 0 by
    // the MMR convention, handled explicitly.
    val red = Array.fill(n)(Double.NegativeInfinity)
    val taken = Array.fill(n)(false)
    val out = Seq.newBuilder[(Int, Any, Double)]
    for (rank <- 1 to math.min(k, n)) {
      var best = -1
      var bestSc = 0.0
      for (c <- 0 until n if !taken(c)) {
        val sc = lambda * simq(c) - (1 - lambda) * (if (rank == 1) 0.0 else red(c))
        // candidate array order is (simq desc, id) — NOT id order — so an
        // exact score tie must compare ids explicitly (oracle: sc DESC, id)
        if (best < 0 || sc > bestSc || (sc == bestSc && idLt(ids(c), ids(best))))
        { best = c; bestSc = sc }
      }
      taken(best) = true
      out += ((rank, ids(best), bestSc))
      for (c <- 0 until n if !taken(c)) {
        val s = cosSimArrays(embs(c), embs(best))
        if (s > red(c)) red(c) = s
      }
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("rnk",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      df.schema(idCol).copy(name = idCol),
      org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.DoubleType, nullable = false)))
    spark.createDataFrame(
      out.result().map { case (r, id, sc) =>
        org.apache.spark.sql.Row(r, id, sc) }.asJava, schema)
  }

  /** Late-interaction retrieval (ColBERT MaxSim, Khattab & Zaharia 2020):
    * score(doc) = Σ over query-token vectors of max over the doc's CHUNK
    * vectors of cosine similarity — the modern reranking rung between
    * BM25 and a cross-encoder, over the chunk→embed artifacts the
    * chunking operator (q70) produces.
    *
    * 100 TB shape: the query side is a handful of token vectors →
    * broadcast; the corpus-sized chunk table is scanned ONCE, each chunk
    * row expanding to |qtokens| (chunk, token) similarities map-side.
    * Both folds are partial-aggregation friendly: max per (doc, qtok)
    * combines map-side before the one shuffle on the doc id, and the
    * per-doc sum rides the same exchange (two aggs, one partitioning).
    * Top-k is a TakeOrdered over (score desc, id) — no global sort.
    *
    * Determinism: cosine reuses the compiled [[graft.functions
    * .Distances]] fold; `max` is order-free; the per-doc sum adds ≤
    * |qtokens| doubles, rounded AT THE CALLER after the fold (the
    * oracle replays the same max-then-sum in DOUBLE, exact because max
    * picks identical values and the tiny sum is over identically-valued
    * terms in qtok order via the decimal trick — callers round scores
    * to 6 before hashing, the q158 discipline).
    *
    * @param chunks frame of (idCol, embCol) — one row per chunk; extra
    *               columns are dropped from the output
    * @param queryVecs one vector PER QUERY TOKEN (ColBERT's per-token
    *               query encoding), all of the chunk dimension
    */
  def maxSimTopK(chunks: DataFrame, idCol: String, embCol: String,
                 queryVecs: Seq[Seq[Float]], k: Int): DataFrame = {
    require(queryVecs.nonEmpty, "maxSimTopK needs at least one query token vector")
    require(queryVecs.map(_.length).distinct.size == 1,
      s"query token vectors must share one dimension, got ${queryVecs.map(_.length).distinct}")
    require(k > 0, s"k must be positive, got $k")
    // the queryText zero-vector gate, per token: a zero query token makes
    // every similarity NaN and both engines' max() treats NaN as largest —
    // the whole ranking would be NaN-poisoned silently
    queryVecs.zipWithIndex.foreach { case (v, i) => require(v.exists(_ != 0f),
      s"query token vector $i is all-zero — cosine similarity is undefined") }
    val spark = chunks.sparkSession
    import spark.implicits._
    val q = queryVecs.zipWithIndex.map { case (v, i) => (i, v) }
      .toDF("__qtok", "__qvec")
    // per-token MAX similarity folds per (doc, token) — the decimal cast
    // AFTER rounding makes the later per-doc sum order-free (q105's rule).
    // Zero CHUNK vectors (an empty/hash-cancelled chunk) are dropped, not
    // NaN-scored: cosine is undefined on them, and a doc whose every
    // chunk is zero has no late-interaction evidence at all.
    val perTok = chunks
      .select(col(idCol), col(embCol).as("__cvec"))
      .filter(exists(col("__cvec"), x => x =!= lit(0f)))
      .join(broadcast(q))
      .withColumn("__sim",
        lit(1.0) - graft.functions.Distances.bySpace("cosine")(
          col("__cvec"), col("__qvec")))
      .groupBy(col(idCol), col("__qtok"))
      .agg(max(col("__sim")).as("__ms"))
    perTok
      .withColumn("__msr", round(col("__ms"), 6).cast(DecimalType(18, 6)))
      .groupBy(col(idCol))
      .agg(sum(col("__msr")).cast("double").as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Id ascending for the mmr tie-break — typed, LOUD on an id type the
    * comparison doesn't cover (a silent toString order would diverge from
    * the oracle's numeric order exactly when it matters). */
  private def idLt(a: Any, b: Any): Boolean = (a, b) match {
    case (x: Long, y: Long) => x < y
    case (x: Int, y: Int) => x < y
    case (x: String, y: String) => x.compareTo(y) < 0
    case _ => throw new IllegalArgumentException(
      s"unsupported mmr id type: ${a.getClass.getName}")
  }

  /** Driver-side cosine similarity with the SAME element-order sequential
    * double fold as the codegen'd distance expressions / `list_sum` — the
    * bit-parity contract the mmr oracle depends on. */
  private[graft] def cosSimArrays(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}
