package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis scalars for training-data pipelines: token counting,
  * language-ID (stopword n-gram heuristic), quality scoring, document
  * fingerprinting. All pure `org.apache.spark.sql.functions` compositions —
  * codegen'd, no UDFs, narrow (no shuffle).
  *
  * These extend the hydration pipeline of the reference (which only carries
  * the raw text column through, extras/...sas:179) with the cleaning stack a
  * 100 TB corpus needs before embedding.
  */
object TextAnalysis {

  /** Whitespace token count (single-space split, deterministic). */
  def tokenCount(text: Column): Column = size(split(text, " "))

  /** BPE-ish subword token estimate: counts maximal alphanumeric runs plus
    * single non-space punctuation marks — a cheap proxy for a byte-pair
    * tokenizer's token count. RE2-safe pattern (no lookarounds), so the same
    * regex runs identically in any oracle engine.
    */
  def tokenCountBpeish(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9 ]"), lit(0)))

  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for", "with", "was"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del", "las", "por"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "en", "un", "du", "une"),
    "de" -> Seq("der", "die", "und", "den", "von", "das", "mit", "dem", "des", "ein"))

  /** Language codes, ascending (the deterministic tie-break order). */
  val languages: Seq[String] = stopwords.keys.toSeq.sorted

  /** The stopword list for a language (exposed so oracle SQL is generated
    * from the SAME lists — single source of truth, no drift). */
  def stopwordList(lang: String): Seq[String] = stopwords(lang)

  /** Stopword hits for one language over a token array. */
  def stopwordHits(tokens: Column, lang: String): Column = {
    val sw = array(stopwords(lang).map(lit): _*)
    size(filter(tokens, t => array_contains(sw, lower(t))))
  }

  /** Language-ID heuristic: argmax over per-language stopword hit counts;
    * 'und' (undetermined) when no stopword matches at all. Deterministic
    * tie-break: language-code ascending (array_sort on (−hits, lang)).
    */
  def langId(text: Column): Column = {
    val tokens = split(text, " ")
    val scored = array(stopwords.keys.toSeq.sorted.map { l =>
      struct((-stopwordHits(tokens, l)).as("neg"), lit(l).as("lang"))
    }: _*)
    val best = element_at(array_sort(scored), 1)
    // guard null text explicitly: null hit-counts sort FIRST in struct
    // ordering and `neg === 0` is null, so without the guard every null
    // document would be confidently labeled with the first language code
    when(text.isNull, lit(null).cast("string"))
      .when(best.getField("neg") === 0, lit("und"))
      .otherwise(best.getField("lang"))
  }

  /** Bulk language-ID, relational form: explode tokens once, take one
    * conditional count per language (codegen'd, map-side combinable), then
    * the same argmax/tie-break/und logic as [[langId]] — identical labels
    * (spec cross-checked), no interpreted lambdas, one combine shuffle.
    *
    * @return (idCol, lang_pred)
    */
  def langIds(df: org.apache.spark.sql.DataFrame,
              idCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    val langs = languages
    val tokens = df.select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
    val hitCols = langs.map { l =>
      count(when(lower(col("tok")).isin(stopwords(l): _*), 1)).as(s"h_$l")
    }
    val hits = tokens.groupBy(idCol).agg(hitCols.head, hitCols.tail: _*)
    val g = greatest(langs.map(l => col(s"h_$l")): _*)
    val pred = langs.init.foldLeft(
        when(col(textCol).isNull, lit(null).cast("string")).when(g === 0, lit("und"))) {
      (acc, l) => acc.when(col(s"h_$l") === g, lit(l))
    }.otherwise(lit(langs.last))
    // left join keeps rows whose text is null (explode drops them upstream)
    df.select(col(idCol), col(textCol)).join(hits, Seq(idCol), "left")
      .select(col(idCol), pred.as("lang_pred"))
  }

  /** Quality signals: char length, token count, mean token length,
    * punctuation ratio, uppercase ratio, stopword ratio (en). */
  def qualityStruct(text: Column): Column = {
    // ONE compiled scan per row (TextStats) + Catalyst arithmetic on the
    // counts. The HOF form below is the cross-check reference: its token
    // filter is CodegenFallback, which evicts the whole projection from
    // codegen and re-evaluates split() per output column interpreted —
    // the sf1 scale point measured that shape ballooning superlinearly.
    import org.apache.spark.sql.GraftColumnShim
    val st = GraftColumnShim.column(graft.expressions.TextStats(
      GraftColumnShim.expression(text), stopwordList("en")))
    val nChars = st.getField("n_chars").cast("double")
    val nTok = st.getField("n_tokens").cast("double")
    struct(
      st.getField("n_chars").as("n_chars"),
      st.getField("n_tokens").as("n_tokens"),
      round(nChars / nTok, 4).as("mean_tok_len"),
      round(st.getField("n_punct").cast("double") / nChars, 4).as("punct_ratio"),
      round(st.getField("n_upper").cast("double") / nChars, 4).as("upper_ratio"),
      round(st.getField("n_stopwords").cast("double") / nTok, 4).as("stopword_ratio"))
  }

  /** Expression-tree form of [[qualityStruct]], kept as the cross-check
    * reference for the compiled [[graft.expressions.TextStats]] path. */
  def qualityStructHof(text: Column): Column = {
    val tokens = split(text, " ")
    val nChars = length(text).cast("double")
    val nTok = size(tokens).cast("double")
    struct(
      length(text).as("n_chars"),
      size(tokens).as("n_tokens"),
      round(nChars / nTok, 4).as("mean_tok_len"),
      round(length(regexp_replace(text, "[^.!?,;:]", "")).cast("double") / nChars, 4).as("punct_ratio"),
      round(length(regexp_replace(text, "[^A-Z]", "")).cast("double") / nChars, 4).as("upper_ratio"),
      round(stopwordHits(tokens, "en").cast("double") / nTok, 4).as("stopword_ratio"))
  }

  /** Composite quality score in [0,1]: penalize too-short/too-long docs,
    * reward natural punctuation and stopword density. Deterministic. */
  def qualityScore(text: Column): Column = {
    val q = qualityStruct(text)
    val lenScore = least(q.getField("n_tokens").cast("double") / 20.0, lit(1.0))
    val swScore = least(q.getField("stopword_ratio") * 5.0, lit(1.0))
    val punctOk = when(q.getField("punct_ratio") <= 0.2, 1.0).otherwise(0.5)
    round((lenScore + swScore + punctOk) / 3.0, 4)
  }

  /** C4-style rule-based corpus filter (the cleaning-heuristic stack of
    * Raffel et al. 2020, relationalized): each rule evaluates on the
    * one-pass [[qualityStruct]] signals; returns a struct of
    * (keep BOOLEAN, reasons ARRAY<STRING>). `keep` = no rule fired;
    * `reasons` names every fired rule, because the drop-reason histogram
    * is the first thing a corpus-curation report shows — a bare boolean
    * filter cannot explain where the mass went. One compiled scan per
    * row, no shuffle; thresholds are parameters with C4-ish defaults.
    */
  def qualityFilter(
      text: Column,
      minTokens: Int = 5, maxTokens: Int = 100000,
      minMeanTokLen: Double = 2.0, maxMeanTokLen: Double = 12.0,
      maxPunctRatio: Double = 0.3, maxUpperRatio: Double = 0.3): Column = {
    // The signals are re-derived here with try_divide instead of reusing
    // qualityStruct: the ratios must be UNCONDITIONALLY evaluable (null on
    // a zero-length text rather than an ANSI divide-by-zero), because
    // hiding them behind a CaseWhen empty-guard would also hide the shared
    // TextStats scan from whole-stage-codegen subexpression elimination —
    // each rule would then rescan the text (measured 4x on the sf1 point).
    // Values are rounded exactly like qualityStruct, so the rule
    // thresholds fire identically.
    import org.apache.spark.sql.GraftColumnShim
    val st = GraftColumnShim.column(graft.expressions.TextStats(
      GraftColumnShim.expression(text), stopwordList("en")))
    val nChars = st.getField("n_chars").cast("double")
    val nTok = st.getField("n_tokens")
    val mtl = round(try_divide(nChars, nTok.cast("double")), 4)
    val pr = round(try_divide(st.getField("n_punct").cast("double"), nChars), 4)
    val ur = round(try_divide(st.getField("n_upper").cast("double"), nChars), 4)
    val rules: Seq[(String, Column)] = Seq(
      "too_few_tokens" -> (nTok < minTokens),
      "too_many_tokens" -> (nTok > maxTokens),
      "short_tokens" -> (mtl < minMeanTokLen),
      "long_tokens" -> (mtl > maxMeanTokLen),
      "punct_heavy" -> (pr > maxPunctRatio),
      "upper_heavy" -> (ur > maxUpperRatio))
    // reasons = concat of one-or-zero-element arrays per rule, NOT
    // array_compact over nullable slots: array_compact desugars to a
    // filter() LAMBDA, which is CodegenFallback — it would evict this
    // whole projection from codegen and defeat the subexpression
    // elimination that collapses the shared TextStats scan (measured 8x
    // at the sf1 point, the same failure mode the q25 pin guards).
    // null/empty text never reaches the rules (null comparisons cannot
    // fire) — it maps to keep=false + 'empty_text' below, the one kind
    // of garbage a quality filter must never wave through.
    val none = array().cast("array<string>")
    val reasons = concat(rules.map { case (n, c) =>
      when(c, array(lit(n))).otherwise(none) }: _*)
    val empty = text.isNull || length(text) === 0
    struct(
      (!empty && size(reasons) === 0).as("keep"),
      when(empty, array(lit("empty_text"))).otherwise(reasons).as("reasons"))
  }

  /** Gopher repetition gate (Rae et al. 2021 table A1 cutoffs as the
    * defaults): drop documents whose top-bigram / top-trigram /
    * duplicate-5-gram character fractions ([[repetitionSignals]]
    * semantics exactly) exceed the thresholds. Output mirrors
    * [[qualityFilter]]: `struct(keep, reasons)`, with null/empty text
    * mapped to keep=false + "empty_text".
    *
    * One compiled [[graft.expressions.RepetitionStats]] scan feeds all
    * three rules (whole-stage codegen CSE collapses the repeated
    * references), `try_divide` keeps the fractions unconditionally
    * evaluable, and reason assembly is lambda-free — the same three
    * codegen rules qualityFilter documents. Zero shuffle.
    *
    * Published-cutoff caveat: the Gopher numbers assume real prose of
    * typical web-document length; very short texts have inherently high
    * fractions (a 2-word doc's top bigram IS the doc). Gate length with
    * [[qualityFilter]]'s token rules first, or loosen these cutoffs.
    */
  def repetitionFilter(text: Column, maxTop2: Double = 0.20,
      maxTop3: Double = 0.18, maxDup5: Double = 0.15): Column = {
    import org.apache.spark.sql.GraftColumnShim
    val t = coalesce(text, lit(""))
    val st = GraftColumnShim.column(graft.expressions.RepetitionStats(
      GraftColumnShim.expression(t), Seq(2, 3), Seq(5)))
    val nc = length(t).cast("double")
    def frac(f: String) = try_divide(st.getField(f).cast("double"), nc)
    val rules: Seq[(String, Column)] = Seq(
      "top2_repetitive" -> (frac("top2_chars") > maxTop2),
      "top3_repetitive" -> (frac("top3_chars") > maxTop3),
      "dup5_repetitive" -> (frac("dup5_chars") > maxDup5))
    val none = array().cast("array<string>")
    val reasons = concat(rules.map { case (n, c) =>
      when(c, array(lit(n))).otherwise(none) }: _*)
    val empty = text.isNull || length(text) === 0
    struct(
      (!empty && size(reasons) === 0).as("keep"),
      when(empty, array(lit("empty_text"))).otherwise(reasons).as("reasons"))
  }

  /** Canonical text normalization for dedup/training: lowercase, strip
    * non-alphanumerics, collapse runs of spaces, trim. RE2-safe patterns. */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  /** Pattern masking for PII-style scrubbing (digit runs, emails, …).
    * RE2-safe patterns only, so the same regex runs in any oracle engine. */
  def maskPattern(text: Column, pattern: String, replacement: String): Column =
    regexp_replace(text, pattern, replacement)

  // ---- S-stemmer (Harman 1991, "How effective is suffixing?") ------------
  // The documented pre-normalization route for stemmed keyword retrieval:
  // the analyzer family deliberately excludes stemming (corpus-destructive,
  // language-specific — Retrieval.scala's adjudication), so a stack that
  // wants plural-folding applies THIS to the document column before
  // hydration and to its query text via [[sStemTerm]] — one written rule,
  // both sides. Harman's three ordered rules, FIRST match wins, each with
  // a minimum-stem guard (>= 1 char before the guarded char) so the
  // two-letter function words ("is", "as", "us") pass through:
  //   ies→y  unless preceded by a|e   (studies→study; "ties" falls through
  //                                    to the es rule → "tie")
  //   es→e   unless preceded by a|e|o (indexes→indexe per the paper —
  //                                    "tables"/"nodes" keep their e)
  //   s→''   unless preceded by u|s   (joins→join; focus/class untouched)
  // Patterns are RE2-safe and shared verbatim with the oracle; only the
  // group-reference SYNTAX differs per engine (Java "$1", RE2 "\1").

  private val SStemRules: Seq[(String, String)] = Seq(
    ("^([a-z]+[^ae])ies$", "$1y"),
    ("^([a-z]+[^aeo])es$", "$1e"),
    ("^([a-z]+[^us])s$", "$1"))

  /** Stem ONE lowercase token (Column form): a CASE chain — the literal
    * shape a SQL oracle replays — testing each rule's pattern in order
    * and rewriting with the first that matches. */
  private def sStemToken(t: Column): Column =
    SStemRules.foldLeft(Option.empty[Column]) { case (acc, (p, r)) =>
      val arm = regexp_replace(t, p, r)
      Some(acc.fold(when(t.rlike(p), arm))(_.when(t.rlike(p), arm)))
    }.get.otherwise(t)

  /** S-stem every whitespace token of `text` (lowercasing first — the
    * rules are written over [a-z]), re-joined single-spaced: the
    * pre-normalized document column for stem-folded retrieval. */
  def sStemText(text: Column): Column =
    array_join(transform(split(lower(text), "\\s+"), t => sStemToken(t)), " ")

  /** The driver-side twin of [[sStemText]] for one token — apply to the
    * query terms a stem-normalized corpus is searched with (UTF8String
    * lowercase: the exact routine Spark's lower() applies corpus-side). */
  def sStemTerm(term: String): String = {
    val low = org.apache.spark.unsafe.types.UTF8String.fromString(term)
      .toLowerCase.toString
    SStemRules.collectFirst {
      case (p, r) if low.matches(p) => low.replaceAll(p, r)
    }.getOrElse(low)
  }

  // ---- PII detection / redaction -----------------------------------------
  // The canonical pre-training scrub: emails, phone-shaped digit runs and
  // IPv4 literals replaced by typed placeholder tokens. Patterns are
  // RE2-safe (no lookaround, no backrefs) so the identical regex text runs
  // under Java (Spark) and RE2 (DuckDB/Go) engines.

  /** RFC-casual email shape — local part then a dotted domain with a ≥2
    * letter TLD. Deliberately no anchors: emails sit mid-sentence. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** NANP-style short dial fragment `NNN-NNNN` on word boundaries. */
  val PhoneRe = "\\b\\d{3}-\\d{4}\\b"
  /** Dotted-quad IPv4 literal on word boundaries. */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Per-document PII hit counts (struct n_emails / n_phones / n_ips) —
    * the audit signal a scrub run reports before committing. Counts, not
    * booleans, so downstream thresholds ("drop if >5 emails") compose.
    * Map-only, codegen'd `RegExpCount`; no shuffle. */
  def piiStats(text: Column): Column = struct(
    regexp_count(text, lit(EmailRe)).as("n_emails"),
    regexp_count(text, lit(PhoneRe)).as("n_phones"),
    regexp_count(text, lit(Ipv4Re)).as("n_ips"))

  /** Redact all three PII shapes with typed placeholders. Email first
    * (its domain tail would otherwise survive as a dotted token), then
    * IPv4, then phones — the order is part of the contract and the oracle
    * replays it verbatim. */
  def piiScrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  // ---- URL / domain filtering --------------------------------------------

  /** Authority (host[:port]) of a URL — the key domain-level curation
    * decisions hang off. Empty string when the value isn't URL-shaped
    * (regexp_extract's no-match convention), never null. */
  def urlDomain(url: Column): Column =
    regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)

  /** Drop every row whose URL's domain appears in `blocked` (single
    * `domain` column — a UT1-style blocklist). The blocklist is small by
    * construction (domains, not URLs) and BROADCASTS; the corpus never
    * shuffles — at 100 TB this is a map-side anti probe, the only shape
    * that survives. Output keeps the extracted `domain` column for audit.
    */
  def blockByDomain(df: org.apache.spark.sql.DataFrame, urlCol: String,
                    blocked: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    require(blocked.columns.contains("domain"),
      s"blocklist needs a 'domain' column, got ${blocked.columns.mkString(", ")}")
    val withDom = df.withColumn("__domain", urlDomain(col(urlCol)))
    withDom.join(broadcast(blocked.select(col("domain").as("__blocked"))),
        withDom("__domain") === col("__blocked"), "left_anti")
      .withColumnRenamed("__domain", "domain")
  }

  // ---- C4-style line filtering -------------------------------------------

  /** C4 line rules (Raffel et al. 2020 §2.2) in one compiled scan: keep
    * lines with no blocklisted word, ≥ `minWords` words, and a terminal-
    * punctuation ending. Returns struct(cleaned, n_lines, n_kept,
    * n_blocked, n_short, n_nopunct) — cleaned is the kept lines re-joined
    * with newlines, and the drop counts always sum to n_lines − n_kept
    * (fixed precedence blocked → short → no-punct).
    *
    * One [[graft.expressions.LineFilterStats]] scan per row: zero
    * shuffle — the relational explode/re-aggregate form would ship every
    * line string through a doc-keyed exchange (the q83 lesson). */
  def c4LineFilter(text: Column, minWords: Int = 3,
      blocked: Seq[String] = Seq.empty): Column = {
    import org.apache.spark.sql.GraftColumnShim
    GraftColumnShim.column(graft.expressions.LineFilterStats(
      GraftColumnShim.expression(text), minWords, blocked))
  }

  /** Winnowing fingerprint sketch (Schleimer et al. 2003 — MOSS): sorted
    * distinct selected k-gram hashes; any shared substring of length
    * ≥ k + w − 1 between two documents yields at least one common entry.
    * One compiled [[graft.expressions.WinnowFingerprints]] scan, zero
    * shuffle; overlap candidates then explode + join on the fingerprint
    * (bucket-confined pairs, the same shape as the LSH paths). */
  def winnowFingerprints(text: Column, k: Int = 12, w: Int = 4): Column = {
    import org.apache.spark.sql.GraftColumnShim
    GraftColumnShim.column(graft.expressions.WinnowFingerprints(
      GraftColumnShim.expression(text), k, w))
  }

  /** Canonicalize a URL for dedup/blocklist keying: strip the fragment,
    * drop tracking parameters (`utm_*`, `fbclid`, `gclid`) with separator
    * repair, lowercase the scheme+authority, remove default ports
    * (`:80` http / `:443` https) and a bare trailing slash. Values that
    * are not URL-shaped pass through unchanged. Pure codegen'd regexp
    * chain — map-only, engine-portable (RE2-safe: no lookaround), so the
    * full canonicalize→dedup pipeline oracles.
    *
    * Deliberately conservative: path case, param ORDER and percent-
    * encoding are preserved (normalizing those changes identity for some
    * sites; the standard crawl-dedup tradeoff). */
  def canonicalizeUrl(url: Column): Column = {
    val isUrl = url.rlike("^[A-Za-z][A-Za-z0-9+.-]*://")
    // fragment, then tracking params (+ separator repair), then case/ports
    val noFrag = regexp_replace(url, "#.*", "")
    val noTrack = regexp_replace(regexp_replace(regexp_replace(
        noFrag, "([?&])(?:utm_[A-Za-z0-9_]+|fbclid|gclid)=[^&#]*", "$1"),
      "([?&])&+", "$1"), "[?&]$", "")
    val lowered = concat(
      lower(regexp_extract(noTrack, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)),
      regexp_extract(noTrack, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)", 1))
    val noPort = regexp_replace(regexp_replace(
        lowered, "^(https://[^/:?#]+):443([/?#].*)?$", "$1$2"),
      "^(http://[^/:?#]+):80([/?#].*)?$", "$1$2")
    val noSlash = regexp_replace(noPort, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]+)/$", "$1")
    when(isUrl, noSlash).otherwise(url)
  }

  /** Cumulative curation funnel: for each named stage, how many rows —
    * and how much of `metric` (tokens, bytes) — survive ALL stages up to
    * and including it. The audit table every curation run should emit
    * before committing a drop decision ("no silent caps"): a stage that
    * unexpectedly halves the corpus is visible here, not discovered in
    * training.
    *
    * One corpus scan: every stage's (count, metric) pair partial-
    * aggregates map-side into a single row, which then explodes into the
    * per-stage rows — the corpus is never shuffled and never re-scanned
    * per stage. Output: (stage_idx from 1, stage, n_rows, metric_sum).
    */
  def curationFunnel(df: org.apache.spark.sql.DataFrame,
      stages: Seq[(String, Column)], metric: Column): org.apache.spark.sql.DataFrame = {
    require(stages.nonEmpty, "need at least one stage")
    require(stages.map(_._1).distinct.size == stages.size,
      s"duplicate stage names: ${stages.map(_._1).mkString(", ")}")
    val conds = stages.map(_._2).scanLeft(lit(true))(_ && _).tail
    val aggs = conds.zipWithIndex.flatMap { case (c, i) => Seq(
      sum(when(c, 1L).otherwise(0L)).as(s"__n_$i"),
      sum(when(c, metric.cast("long")).otherwise(0L)).as(s"__m_$i")) }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val arr = array(stages.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(i + 1).as("stage_idx"), lit(name).as("stage"),
        coalesce(col(s"__n_$i"), lit(0L)).as("n_rows"),
        coalesce(col(s"__m_$i"), lit(0L)).as("metric_sum")) }: _*)
    row.select(explode(arr).as("__s"))
      .select(col("__s.stage_idx").as("stage_idx"), col("__s.stage").as("stage"),
        col("__s.n_rows").as("n_rows"), col("__s.metric_sum").as("metric_sum"))
  }

  /** Repetition signal: distinct-token ratio in (0, 1]. Heavily repeated
    * boilerplate scores low — a standard filter for generated/spam text. */
  def distinctTokenRatio(text: Column): Column = {
    val tokens = split(text, " ")
    round(size(array_distinct(tokens)).cast("double") / size(tokens), 4)
  }

  /** Rolling-hash document fingerprint: position-weighted byte sum
    * Σᵢ ascii(cᵢ)·((i mod 7)+1) — order-sensitive (detects permuted text),
    * overflow-free for any realistic document length, and expressible
    * identically in any ANSI-SQL oracle engine.
    */
  def fingerprint(text: Column): Column =
    // sequence(1, 0) would count DOWN in Spark — guard the empty-text case.
    when(length(text) === 0, lit(0L)).otherwise(
      aggregate(
        transform(sequence(lit(1), length(text)),
          i => ascii(text.substr(i, lit(1))).cast("long") * ((i - 1) % 7 + 1).cast("long")),
        lit(0L), (s, x) => s + x))

  /** Bulk fingerprinting, relational form: explode characters to rows,
    * weight by position, one map-side-combinable sum agg — identical values
    * to [[fingerprint]] but fully inside whole-stage codegen (the lambda
    * form is interpreted per character: ~7× slower on a large corpus).
    *
    * @return (idCol, fp BIGINT)
    */
  def fingerprints(df: org.apache.spark.sql.DataFrame,
                   idCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    val chars = df.select(col(idCol), posexplode_outer(split(col(textCol), "")))
    chars.groupBy(idCol)
      .agg(coalesce(sum(ascii(col("col")).cast("long")
        * (pmod(col("pos"), lit(7)) + 1)), lit(0L)).as("fp"))
  }

  /** Split documents into overlapping token-window chunks — the chunk →
    * embed → hydrate precursor every RAG / vector-collection pipeline
    * runs before the embedding stage. One narrow pass (tokenize, per-row
    * chunk count, explode) — a map-only width change, no shuffle.
    *
    * Chunk `i` covers tokens `[i·step, i·step + chunkTokens)` with
    * `step = chunkTokens − overlap`; every document yields at least one
    * chunk (short, empty, and NULL docs become a single chunk — null text
    * is coalesced to "" so its chunk reports n_tokens = 1, the [""] split
    * artifact, never a phantom full-width count).
    * Output: (idCol, chunk_id INT, chunk_text STRING, n_tokens INT).
    *
    * Tokenizer note: splits on `\s+` — the same tokenizer as the shingle /
    * retrieval stack (Dedup.wordShingles, Retrieval.bm25), NOT
    * [[tokenCount]]'s literal-single-space split; on multi-space text the
    * two counts differ by design. */
  def chunk(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
            chunkTokens: Int, overlap: Int): org.apache.spark.sql.DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      s"need 0 <= overlap < chunkTokens, got overlap=$overlap chunkTokens=$chunkTokens")
    val step = chunkTokens - overlap
    val toks = split(coalesce(col(textCol), lit("")), "\\s+")
    val nChunks = greatest(
      ceil((size(toks) - lit(overlap)).cast("double") / step).cast("int"), lit(1))
    df.select(col(idCol), toks.as("__toks"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        array_join(slice(col("__toks"), col("chunk_id") * step + 1,
          lit(chunkTokens)), " ").as("chunk_text"),
        least(lit(chunkTokens),
          size(col("__toks")) - col("chunk_id") * step).as("n_tokens"))
  }

  /** Gopher-style within-document repetition signals (Rae et al. 2021,
    * "Scaling Language Models", table A1): per document,
    *
    *  - `top{n}_frac` for each n in `topNs`: characters covered by ALL
    *    occurrences of the single MOST FREQUENT word n-gram, divided by
    *    `length(text)`. Ties on count resolve to the longest gram, so
    *    the result is deterministic without ever naming the gram.
    *  - `dup{n}_frac` for each n in `dupNs`: characters covered by every
    *    occurrence of every word n-gram that occurs ≥ 2 times, divided by
    *    `length(text)`. (The occurrence-sum form — overlapping duplicate
    *    grams are counted per occurrence, the standard relational
    *    approximation of Gopher's coverage measure; it can exceed 1 on
    *    pathologically repetitive text, which is exactly what the filter
    *    is for.)
    *
    * High `top2_frac`/`top3_frac` flags boilerplate headers; high
    * `dup5_frac`+ flags templated or machine-looped text. Typical Gopher
    * cutoffs: top2 ≤ 0.20, top3 ≤ 0.18, dup5 ≤ 0.15 (words, not our
    * synthetic fixture's distribution).
    *
    * Tokenizer: literal single-space split (the q24/q25 convention).
    * NULL/empty text yields all-zero fractions. Docs too short to form an
    * n-gram get 0.0 for that n.
    *
    * 100 TB shape: repetition is intrinsically PER-DOCUMENT, so each
    * doc's grams are counted in ONE compiled scan
    * ([[graft.expressions.RepetitionStats]]) with per-row bounded
    * memory — zero shuffle, embarrassingly parallel, linear at any
    * corpus size. The first cut was the idiomatic explode → count →
    * rollup (kept below as [[repetitionSignalsExploded]], the
    * cross-check reference): correct, but its counting exchange carries
    * ~every gram as a STRING (diverse text defeats partial aggregation),
    * and the sf10 scale point measured ×34 wall for the sf1→sf10 step,
    * all of it gram-shuffle spill. Same lesson as TextStats/StrShingles:
    * per-document text work belongs in a compiled expression, not a
    * shuffle. All char arithmetic stays integral until one final
    * division, so the double output is fold-order-free.
    */
  def repetitionSignals(df: org.apache.spark.sql.DataFrame,
                        idCol: String, textCol: String,
                        topNs: Seq[Int] = Seq(2, 3),
                        dupNs: Seq[Int] = Seq(5)): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.GraftColumnShim
    val text = coalesce(col(textCol), lit(""))
    val st = GraftColumnShim.column(graft.expressions.RepetitionStats(
      GraftColumnShim.expression(text), topNs, dupNs))
    val nc = length(text).cast("long")
    val fracs = (topNs.map(n => s"top$n") ++ dupNs.map(n => s"dup$n")).map { p =>
      when(nc === 0L, 0.0)
        .otherwise(st.getField(s"${p}_chars").cast("double") / nc)
        .as(s"${p}_frac")
    }
    df.select(col(idCol) +: fracs: _*)
  }

  /** Relational (explode → count → rollup) form of [[repetitionSignals]],
    * kept as the cross-check reference for the compiled
    * [[graft.expressions.RepetitionStats]] path — and as the shape you'd
    * use if the gram COUNTS themselves (not per-doc fractions) were the
    * product. Two shuffles; the counting exchange carries gram strings. */
  def repetitionSignalsExploded(df: org.apache.spark.sql.DataFrame,
                        idCol: String, textCol: String,
                        topNs: Seq[Int] = Seq(2, 3),
                        dupNs: Seq[Int] = Seq(5)): org.apache.spark.sql.DataFrame = {
    require(topNs.nonEmpty || dupNs.nonEmpty, "need at least one n")
    require((topNs ++ dupNs).forall(_ >= 2), s"n-grams need n >= 2, got ${topNs ++ dupNs}")
    val allNs = (topNs ++ dupNs).distinct.sorted
    val text = coalesce(col(textCol), lit(""))
    // raw gram stream for one n: (id, n, gram) — map-only
    def gramRows(n: Int) = {
      val m = greatest(size(col("__w")) - lit(n - 1), lit(0))
      val zipped = arrays_zip((1 to n).map(i => slice(col("__w"), lit(i), m)): _*)
      df.select(col(idCol), split(text, " ").as("__w"))
        .select(col(idCol), lit(n).as("__n"), explode(zipped).as("__g"))
        .select(col(idCol), col("__n"),
          concat_ws(" ", (0 until n).map(i => col(s"__g.$i")): _*).as("__gram"))
    }
    val counts = allNs.map(gramRows).reduce(_ unionByName _)
      .groupBy(col(idCol), col("__n"), col("__gram"))
      .agg(count(lit(1)).as("__cnt"))
      .select(col(idCol), col("__n"), col("__cnt"),
        length(col("__gram")).cast("long").as("__glen"))
      .withColumn("__chars", col("__cnt") * col("__glen"))
    // top = argmax by (count, length): struct max is lexicographic, so
    // the most frequent gram wins and ties resolve to the longest —
    // matching RepetitionStats, never max(count×length)
    val aggs =
      topNs.map(n => max(when(col("__n") === n,
        struct(col("__cnt"), col("__glen")))).as(s"top${n}_sel")) ++
      dupNs.map(n => sum(when(col("__n") === n && col("__cnt") >= 2, col("__chars"))
        .otherwise(0L)).as(s"dup${n}_chars"))
    val perDoc = counts.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
    val fracs =
      topNs.map(n =>
        when(col("__nc") === 0L, 0.0)
          .otherwise(coalesce(
            col(s"top${n}_sel.__cnt") * col(s"top${n}_sel.__glen"), lit(0L))
            .cast("double") / col("__nc"))
          .as(s"top${n}_frac")) ++
      dupNs.map(n =>
        when(col("__nc") === 0L, 0.0)
          .otherwise(coalesce(col(s"dup${n}_chars"), lit(0L)).cast("double") / col("__nc"))
          .as(s"dup${n}_frac"))
    df.select(col(idCol), length(text).cast("long").as("__nc"))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol) +: fracs: _*)
  }

  /** Source-level quality gate: keep documents whose SOURCE (domain, host,
    * crawl bucket — whatever `srcCol` groups) has mean [[qualityScore]] ≥
    * `minMeanScore`. Per-document filters miss systematically-bad origins
    * whose individual pages squeak past the row rules; aggregating to the
    * origin and gating the whole group is the standard counterpart (the
    * C4/Gopher pipelines apply both). Output = surviving rows plus their
    * source's `src_score`, so the caller can report what the gate kept.
    *
    * 100 TB shape: the per-source aggregate is a hash agg on a LOW-
    * cardinality key (domains, not documents) — partial aggregation
    * collapses each task's rows to one row per source, so the exchange
    * carries ~|sources| rows; the surviving-source table then BROADCASTS
    * back onto a second corpus scan (corpus rows never shuffle). Mean is
    * an exact decimal sum with ONE final double division — fold-order-free
    * on any engine, so the gate decision replays in the SQL oracle (q87).
    */
  def sourceQualityGate(df: org.apache.spark.sql.DataFrame,
                        idCol: String, textCol: String, srcCol: String,
                        minMeanScore: Double): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val means = df
      .select(col(srcCol), qualityScore(col(textCol)).as("__score"))
      .groupBy(col(srcCol))
      .agg((sum(col("__score").cast(DecimalType(18, 6))).cast("double")
        / count(lit(1))).as("src_score"))
      .filter(col("src_score") >= minMeanScore)
    df.join(broadcast(means), Seq(srcCol))
  }

  /** Per-document out-of-vocabulary rate against the corpus's own top-k
    * vocabulary — the coverage signal tokenizer and curation work read
    * before training (a doc full of tokens the vocabulary lacks is
    * usually boilerplate, another language, or binary junk).
    *
    * Two-phase, both scale-shaped: (1) the vocabulary is a token count
    * (partial agg collapses the exchange to distinct tokens) topped by a
    * TakeOrdered heap — k rows, ties at the boundary broken by token
    * ascending so the vocabulary is deterministic; (2) the token stream
    * probes the BROADCAST vocabulary map-side, then the per-doc
    * aggregate — keyed by doc id alone, so map-side combine collapses
    * each task to one row per doc — carries ~|docs| rows to its
    * exchange, never tokens (the q83 rule: a per-doc exchange must not
    * carry per-token strings; here the per-token work all happens before
    * the combine).
    *
    * Tokenizer: literal single-space split (the q24/q25 convention).
    * NULL text → zero tokens → NULL oov_rate. Output: (idCol, n_tokens,
    * oov_rate).
    */
  def oovRate(df: org.apache.spark.sql.DataFrame,
              idCol: String, textCol: String,
              vocabSize: Int = 1000): org.apache.spark.sql.DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    val tok = df.select(col(idCol).as("__id"),
      explode(split(col(textCol), " ")).as("__tk"))
    val vocab = tok.groupBy("__tk").agg(count(lit(1)).as("__cnt"))
      .orderBy(col("__cnt").desc, col("__tk")).limit(vocabSize)
      .select(col("__tk"), lit(1).as("__in"))
    val agg = tok.join(broadcast(vocab), Seq("__tk"), "left")
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("__oov"))
    df.join(agg, df(idCol) === agg("__id"), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        try_divide(col("__oov").cast("double"), col("n_tokens")).as("oov_rate"))
  }

  /** DSIR-style target-affinity score over hashed unigram features
    * (Xie et al. 2023, "Data Selection for Language Models via Importance
    * Resampling" — the linear-weight variant: per-token mean of
    * p̂_target(bucket) − p̂_corpus(bucket), which ranks documents by how
    * target-like their token distribution is without the log-likelihood
    * form, keeping every operation IEEE-exact and oracle-replayable —
    * this engine's "no transcendentals in oracled outputs" rule, same
    * reason BM25 uses a log-free idf).
    *
    * `targetCol` marks the rows that define the target distribution (a
    * boolean over df's columns, e.g. lang = 'en'). Features are the
    * spread-hash of each token mod `buckets` — fixed-width, vocabulary-
    * free, so the feature table is ≤ `buckets` rows no matter the corpus.
    *
    * Scale shape: one token pass builds the bucket table (partial agg
    * collapses the exchange to ≤ buckets rows), which then BROADCASTS —
    * with its 1-row grand total — back onto the token stream; the per-doc
    * aggregate keys on the id alone so its exchange carries docs, never
    * tokens. The corpus is scanned twice and shuffled never.
    *
    * Output: (idCol, n_tokens, s_t, s_r, affinity) where s_t/s_r are the
    * doc's summed target/corpus bucket counts (exact longs) and affinity
    * = s_t/T_t/n − s_r/T_r/n, null for empty/null text.
    */
  def targetAffinity(df: org.apache.spark.sql.DataFrame,
                     idCol: String, textCol: String, targetCol: Column,
                     buckets: Int = 256): org.apache.spark.sql.DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val tok = df.select(col(idCol).as("__id"), targetCol.cast("boolean").as("__t"),
        explode(split(col(textCol), " ")).as("__tk"))
      .withColumn("__b", graft.operators.Mixture.spreadHash(col("__tk")) % buckets)
    val bt = tok.groupBy("__b").agg(
      count(lit(1)).as("__cr"),
      sum(when(col("__t"), 1L).otherwise(0L)).as("__ct"))
    val tot = bt.agg(sum("__cr").as("__tr"), sum("__ct").as("__tt"))
    val perDoc = tok.join(broadcast(bt), Seq("__b"))
      .groupBy("__id")
      .agg(count(lit(1)).as("n_tokens"),
        sum("__ct").as("s_t"), sum("__cr").as("s_r"))
      .crossJoin(broadcast(tot))
      .withColumn("affinity",
        col("s_t").cast("double") / col("__tt") / col("n_tokens")
          - col("s_r").cast("double") / col("__tr") / col("n_tokens"))
    df.join(perDoc, df(idCol) === perDoc("__id"), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("s_t"), col("s_r"), col("affinity"))
  }

  /** Exact per-group percentile profile of a numeric column (the corpus
    * length-distribution report every curation run starts from), computed
    * over the VALUE HISTOGRAM rather than the value stream: rows collapse
    * map-side to (group, value) counts, a per-group cumulative sum ranks
    * the distinct values, and each requested percentile interpolates
    * between the two bracketing values (the p·(n−1) linear-interpolation
    * definition — what both Spark `percentile` and DuckDB `quantile_cont`
    * compute).
    *
    * 100 TB shape: the only full-width work is the map-side (group, value)
    * collapse — the exchange carries distinct values per group, not rows,
    * so a 10¹¹-row corpus with ~10⁴ distinct lengths shuffles ~10⁴ rows
    * per group where Spark's own `percentile` aggregate would buffer every
    * row's value in the aggregation state. For genuinely continuous
    * metrics, bucket first (round/width_bucket) or reach for
    * `approx_percentile`; for the integral metrics a corpus report cares
    * about (chars, tokens, scores rounded to 4), this form is exact,
    * linear, and — all arithmetic integral until one interpolation —
    * replays bit-for-bit in a SQL oracle (q89).
    *
    * Output: (grpCol, n, p{25,50,75,95}… one column per requested
    * fraction, named by percent with a fractional part only when needed).
    * NULL values are excluded (SQL aggregate convention); a group that is
    * all-NULL vanishes with them.
    */
  def percentileProfile(df: org.apache.spark.sql.DataFrame,
                        grpCol: String, valCol: String,
                        ps: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.95))
      : org.apache.spark.sql.DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"percentile fractions must be within [0, 1], got $ps")
    def pname(p: Double): String = {
      val pct = p * 100
      if (pct == pct.floor) s"p${pct.toInt}"
      else s"p${pct}".replace('.', '_')
    }
    require(ps.map(pname).distinct.size == ps.size,
      s"duplicate percentile fractions: $ps")
    import org.apache.spark.sql.expressions.Window
    val h = df.filter(col(valCol).isNotNull)
      .groupBy(col(grpCol), col(valCol).cast("double").as("__v"))
      .agg(count(lit(1)).as("__c"))
    val byV = Window.partitionBy(col(grpCol)).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(col(grpCol))
    val cum = h.withColumn("__cum", sum(col("__c")).over(byV))
      .withColumn("__n", sum(col("__c")).over(whole))
    // bracketing values as aggregates: value at 0-based rank r is the
    // first distinct value whose cumulative count reaches r+1
    val aggs = ps.zipWithIndex.flatMap { case (p, i) =>
      val idx = lit(p) * (col("__n") - 1).cast("double")
      Seq(
        min(when(col("__cum") >= floor(idx) + 1, col("__v"))).as(s"__lo_$i"),
        min(when(col("__cum") >= ceil(idx) + 1, col("__v"))).as(s"__hi_$i"))
    }
    val agged = cum.groupBy(col(grpCol))
      .agg(max(col("__n")).as("n"), aggs: _*)
    val outCols = ps.zipWithIndex.map { case (p, i) =>
      val idx = lit(p) * (col("n") - 1).cast("double")
      (col(s"__lo_$i") + (idx - floor(idx)) * (col(s"__hi_$i") - col(s"__lo_$i")))
        .as(pname(p))
    }
    agged.select(col(grpCol) +: col("n") +: outCols: _*)
  }
}
