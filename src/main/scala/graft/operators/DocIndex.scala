package graft.operators

import org.apache.spark.sql.{DataFrame, GraftColumnShim, SparkSession}
import org.apache.spark.sql.functions._

import graft.expressions.CharGrams

/** Persisted substring (trigram-postings) index for the Chroma
  * `where_document` surface — the scale path for `$contains`.
  *
  * Chroma backs `where_document` with SQLite FTS
  * (reference context: README.md:5 names similarity-search/RAG workloads
  * where document-text prefilters are standard); the engine's baseline is
  * a correct linear scan ([[ChromaFilter.Contains]] → `col.contains`). At
  * 100 TB a linear substring scan per `get()` is a full corpus read, so
  * this index re-expresses the pg_trgm idea in Spark layout terms:
  *
  *   postings = DISTINCT (gram, id) pairs over char-3-grams of `document`,
  *   written parquet, PARTITIONED by `gp = pmod(xxhash64(gram), gpCount)`.
  *
  * A query string s with |s| >= 3 must — in ANY document that contains it
  * — co-occur with EVERY one of its own trigrams, so
  *
  *   candidates(s) = ids holding all grams of s   (index-confined:
  *     partition pruning on `gp`, rowgroup pushdown on `gram`, then a
  *     count-distinct-equals fold per id)
  *
  * is a strict SUPERSET of the true result; the caller re-applies the
  * verbatim `contains` predicate on the candidates, so index answers are
  * bit-identical to the scan path by construction (the index can never
  * change semantics, only confine IO). Strings shorter than 3 chars and
  * `$not_contains`-only predicates are not confinable — those fall back
  * to the linear scan.
  *
  * 100 TB shape: the build is one compiled map pass (CharGrams) + one
  * explode + one distinct (the only shuffle) + a partitioned write; the
  * postings table is ~(avg distinct grams per doc) × corpus rows of
  * fixed-width pairs — the normal secondary-index price (pg_trgm's GIN is
  * the same order). Queries read only the handful of `gp` partitions the
  * query grams hash into, never the corpus.
  */
object DocIndex {

  /** Gram size. Fixed: the index layout and every query must agree. */
  val N = 3

  /** Postings partition count. 64 keeps per-partition listing cheap at
    * small scale; at 100 TB raise it with the corpus (it only changes
    * write layout, queries always prune by hash). */
  val GpCount = 64

  private def gp(gram: org.apache.spark.sql.Column) =
    pmod(xxhash64(gram), lit(GpCount)).cast("int")

  /** Build the postings frame: DISTINCT (gp, pb, gram, id). `pbCol` is
    * the caller's id-bucket — the SECOND partition axis and the
    * incremental-maintenance lever: a mutation touches a known set of id
    * buckets, and a `gp=<g>/pb=<b>` layout lets a refresh rebuild ONLY
    * the touched `pb` slices while hard-linking every other slice from
    * the previous build (the same trick the COW store's
    * [[graft.catalog.Collection]] merge uses for untouched data
    * buckets). Queries are unaffected: they prune on `gp` and never
    * mention `pb`. */
  def postingsWithPb(docs: DataFrame, idCol: String, docCol: String,
                     pbCol: org.apache.spark.sql.Column): DataFrame =
    docs.select(col(idCol).as("id"), pbCol.cast("int").as("pb"),
        explode(GraftColumnShim.column(
          CharGrams(GraftColumnShim.expression(col(docCol)), N))).as("gram"))
      .distinct() // pb is a function of id, so this is a per-(id,gram) distinct
      .select(gp(col("gram")).as("gp"), col("pb"), col("gram"), col("id"))

  /** Write pb-sliced postings: `gp=<g>/pb=<b>/...parquet`. */
  def writeWithPb(docs: DataFrame, idCol: String, docCol: String,
                  pbCol: org.apache.spark.sql.Column, path: String,
                  maxRowsPerFile: Long = 4000000L): Unit =
    postingsWithPb(docs, idCol, docCol, pbCol)
      // one shuffle BY gp at build time, same rationale as the IVF cell
      // pack: without it every task writes a file into every partition
      .repartition(col("gp"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRowsPerFile)
      .partitionBy("gp", "pb").parquet(path)

  /** The gram sets that CONFINE a `where_document` predicate, in
    * OR-of-AND normal form: a document can match the predicate only if,
    * for AT LEAST ONE returned set, it contains EVERY gram in that set.
    * None = the predicate is not confinable (fall back to the scan).
    *
    *  - Contains(s), |s| >= 3  → that string's grams
    *  - NotContains            → contributes nothing (only an AND sibling
    *                             can confine; alone → None)
    *  - AndDoc                 → any confining child confines the AND;
    *                             multiple confining children intersect
    *                             candidates (cross-product of their OR
    *                             forms, capped — see below)
    *  - OrDoc                  → confinable only if EVERY branch is
    *                             (one open branch admits anything)
    *
    * The AND cross-product is capped at [[MaxGramSets]]: past that the
    * AND keeps only its single most selective child (still sound — any
    * child of an AND is a superset filter).
    */
  val MaxGramSets = 32

  def gramSets(wd: ChromaFilter.WhereDocument): Option[Seq[Seq[String]]] = wd match {
    case ChromaFilter.Contains(s) =>
      val g = CharGrams.gramsOf(s, N)
      if (g.isEmpty) None else Some(Seq(g))
    case ChromaFilter.NotContains(_) => None
    // $regex confines through its REQUIRED literal runs: every match
    // must contain each extracted literal, so the union of their grams
    // is one AND-set — a strict superset filter, like Contains. A
    // pattern with no extractable >=N-char literal (or any construct
    // the conservative extractor refuses) returns None → linear scan.
    case ChromaFilter.MatchesRegex(p) =>
      requiredLiterals(p).map(_.flatMap(CharGrams.gramsOf(_, N)).distinct)
        .filter(_.nonEmpty).map(g => Seq(g))
    case ChromaFilter.NotMatchesRegex(_) => None
    case ChromaFilter.AndDoc(cs) =>
      val confining = cs.flatMap(gramSets)
      if (confining.isEmpty) None
      else Some(confining.reduce { (x, y) =>
        if (x.size.toLong * y.size > MaxGramSets)
          // keep the child whose sets carry more grams (more selective)
          if (x.map(_.size).sum >= y.map(_.size).sum) x else y
        else for { a <- x; b <- y } yield (a ++ b).distinct
      })
    case ChromaFilter.OrDoc(cs) =>
      val branches = cs.map(gramSets)
      if (branches.exists(_.isEmpty)) None
      else {
        val all = branches.flatMap(_.get)
        if (all.size > MaxGramSets) None else Some(all)
      }
  }

  /** The literal strings REQUIRED by a regex — substrings every matching
    * document must contain — extracted conservatively for trigram
    * confinement. Sound by construction: a literal run counts only when
    * it sits at nesting depth 0 (group contents may be under alternation
    * or `?`, so nothing inside parens is required), a quantifier that can
    * make its atom vanish (`*`, `?`, `{`) retracts the run's last char,
    * and any construct the scanner can't prove requiredness through —
    * top-level alternation, `\Q`, an unclosed class — returns None
    * (→ scan fallback, loudly logged by the caller). Class shorthands
    * (`\d` etc.), anchors, `.` and `[...]` classes just break the run.
    * None ⇔ no >=1-char required literal survives. */
  def requiredLiterals(pattern: String): Option[Seq[String]] = {
    val out = Seq.newBuilder[String]
    val run = new StringBuilder
    var depth = 0
    var i = 0
    def flush(): Unit = { if (run.nonEmpty) { out += run.toString; run.clear() } }
    def retract(): Unit = if (run.nonEmpty) run.setLength(run.length - 1)
    while (i < pattern.length) {
      pattern(i) match {
        case '\\' =>
          if (i + 1 >= pattern.length) return None // dangling escape
          pattern(i + 1) match {
            case c @ ('\\' | '.' | '*' | '+' | '?' | '(' | ')' | '[' | ']' |
                      '{' | '}' | '|' | '^' | '$' | '-' | '/') =>
              // escaped metachar = literal — but only a depth-0 literal
              // counts, and a following vanishing quantifier retracts it
              if (depth == 0 && (i + 2 >= pattern.length ||
                  !"*?{".contains(pattern(i + 2)))) run.append(c)
              else flush()
            // exactly-one-letter constructs the scanner fully understands:
            // class shorthands and zero-width anchors — they match
            // something (or nothing), never a literal; just break the run
            case c if "dDwWsSbBGRhHvVAzZntrfae".contains(c) => flush()
            // EVERYTHING else is a multi-char or semantic escape the
            // scanner cannot size (\uXXXX \xNN \0nnn \cX \p{..} \N{..}
            // \k<name> \Q..\E, backreferences): consuming two chars would
            // extract the TAIL as a fake required literal (vector →
            // "0076ector", matching nothing) — the unsound-miss class.
            // Bail to the scan.
            case _ => return None
          }
          i += 2
        case '[' =>
          flush()
          // skip the class: first char (or after ^) may be an unescaped ]
          var j = i + 1
          if (j < pattern.length && pattern(j) == '^') j += 1
          if (j < pattern.length && pattern(j) == ']') j += 1
          while (j < pattern.length && pattern(j) != ']') {
            if (pattern(j) == '\\') j += 1
            j += 1
          }
          if (j >= pattern.length) return None // unclosed class
          i = j + 1
        case '(' =>
          // `(?` opens a SPECIAL group — inline flags `(?i)` change the
          // matching semantics of every literal after them (case folding
          // breaks requiredness of the extracted bytes), lookarounds and
          // named groups have their own grammars. None of them are worth
          // modeling in a confinement heuristic: bail to the scan.
          if (i + 1 < pattern.length && pattern(i + 1) == '?') return None
          flush(); depth += 1; i += 1
        case ')' =>
          if (depth == 0) return None // unbalanced
          depth -= 1; i += 1
        case '|' =>
          if (depth == 0) return None // top-level alternation: nothing required
          i += 1
        case '*' | '?' => retract(); flush(); i += 1
        case '{' =>
          // {m,n}: conservatively treat as possibly-zero → retract
          retract(); flush()
          val j = pattern.indexOf('}', i)
          if (j < 0) return None
          i = j + 1
        case '+' => flush(); i += 1 // one-or-more keeps the atom required
        case '.' | '^' | '$' => flush(); i += 1
        case c =>
          // a literal followed by a vanishing quantifier is optional
          if (depth == 0 && (i + 1 >= pattern.length ||
              !"*?{".contains(pattern(i + 1)))) run.append(c)
          else flush()
          i += 1
      }
    }
    if (depth != 0) return None
    flush()
    val ls = out.result().filter(_.nonEmpty)
    if (ls.isEmpty) None else Some(ls)
  }

  /** Candidate ids from a postings layout at `path` for `sets` (the
    * OR-of-AND form from [[gramSets]]): ids holding every gram of at
    * least one set. Returns a 1-column frame (`id`).
    *
    * One index read serves all sets: the (gram → sets needing it) table
    * is query-sized and BROADCASTS onto the pruned postings scan; the
    * only exchange is the (id, set) count fold, bounded by candidates ×
    * sets, never corpus-sized.
    */
  def candidates(spark: SparkSession, path: String, sets: Seq[Seq[String]]): DataFrame =
    candidates(spark.read.parquet(path), sets)

  /** [[candidates]] over an already-resolved postings frame — the entry
    * point for carry-manifest builds (`Collection.readIndexBuild`), where
    * the physical slice layout spans more than one build dir. */
  def candidates(postings: DataFrame, sets: Seq[Seq[String]]): DataFrame = {
    require(sets.nonEmpty && sets.forall(_.nonEmpty), "need at least one non-empty gram set")
    val spark = postings.sparkSession
    import spark.implicits._
    val need = sets.zipWithIndex
      .flatMap { case (g, i) => g.distinct.map(gram => (gram, i, g.distinct.size)) }
      .toDF("gram", "set_idx", "set_size")
    val grams = sets.flatten.distinct
    // literal IN on gp (computed driver-side with the writer's own hash)
    // prunes partitions at file listing; gram IN prunes parquet rowgroups
    postings
      .filter(col("gp").isin(grams.map(gpOf).distinct: _*))
      .filter(col("gram").isin(grams: _*))
      .join(broadcast(need), "gram")
      .groupBy("id", "set_idx", "set_size")
      .agg(countDistinct(col("gram")).as("got"))
      .filter(col("got") === col("set_size"))
      .select("id").distinct()
  }

  /** The writer's partition key for one gram, computed driver-side with
    * the same function the plan uses (`xxhash64` = XXH64 seed 42 over the
    * UTF-8 bytes). */
  def gpOf(gram: String): Int = {
    val u = org.apache.spark.unsafe.types.UTF8String.fromString(gram)
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      u, org.apache.spark.sql.types.StringType, 42L)
    math.floorMod(h, GpCount.toLong).toInt
  }
}
