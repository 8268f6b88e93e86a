package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Corpus language-model operators for training-data curation: the
  * CCNet-style LM predictability score (the perplexity-filter primitive,
  * Wenzek et al. 2020 §4.3) and the BPE merge-candidate step (Sennrich et
  * al. 2016) — both built so every number replays exactly on an
  * independent SQL engine (no `log`, whose last-ulp behavior differs
  * across libm implementations; ratios, integer counts and exact decimal
  * folds only).
  */
object Lm {

  /** Per-document bigram predictability: train bigram counts on the WHOLE
    * corpus (the scored doc included — one corpus, one pass, no
    * train/apply split), then score each document by the count-weighted
    * mean of P(w_i | w_{i-1}) = c(w_{i-1}, w_i) / c(w_{i-1}) over its
    * bigram positions. High score = predictable, natural-language-like
    * text; gibberish and boilerplate-free noise score near zero. This is
    * the log-free stand-in for the CCNet perplexity filter: monotone in
    * the same per-position conditional probabilities, but every operation
    * (integer counts, one IEEE division per distinct bigram rounded to 6,
    * exact decimal weighted sum, one final division) replays
    * bit-identically in the DuckDB oracle, which `exp(mean log p)` would
    * not.
    *
    * 100 TB shape: tokens hash to longs map-side (`hash`, default the
    * engine-portable spread hash — pass xxhash64 at real scale, collision
    * note on [[graft.expressions.StrHash]]), so every exchange carries
    * fixed-width (id, h1, h2) rows — never token strings (the q83/q99
    * lesson). The raw occurrence stream feeds the model aggregates AND
    * joins them directly — there is deliberately NO per-document distinct
    * pre-aggregate (its (id, h1, h2) key is mostly unique, so it would
    * add a full corpus-sized exchange while shrinking nothing; removing
    * it cut the 100x replica wall ~40%, see the inline comment below).
    * Exchange profile: two corpus-sized shuffles total — the bigram-model
    * groupBy and the score join — plus the vocab-sized unigram exchange;
    * the zipfian head collapses map-side in both model aggregates. The
    * model tables join back on long keys; at bounded vocab the unigram
    * side is broadcastable, but the bigram join dominates and stays a
    * shuffle join by design.
    *
    * Output: (idCol, n_bigrams, lm_score); a document with fewer than two
    * tokens has n_bigrams = 0 and a NULL score (the mean is undefined —
    * never silently 0, which would look like measured gibberish).
    */
  def bigramLmScore(df: DataFrame, idCol: String, textCol: String,
      hash: Option[Column => Column] = None): DataFrame = {
    import org.apache.spark.sql.GraftColumnShim
    val text = coalesce(col(textCol), lit(""))
    // default path: ONE compiled scan (TokenSpreadHashes) — the
    // transform() lambda form is CodegenFallback and would evict the
    // projection from whole-stage codegen (the pinned q25/q77 lesson);
    // a custom hash (e.g. xxhash64 at production scale) takes the HOF
    val hashed = hash match {
      case Some(h) => transform(split(text, " "), t => h(t))
      case None => GraftColumnShim.column(graft.expressions.TokenSpreadHashes(
        GraftColumnShim.expression(text)))
    }
    val hs = df.select(col(idCol).as("__id"), hashed.as("__hs"))
    // adjacent pairs via two aligned slices (map-only; length guard keeps
    // one-token docs at zero pairs instead of a negative slice length)
    val m = greatest(size(col("__hs")) - lit(1), lit(0))
    val bg = hs.select(col("__id"),
        explode(arrays_zip(slice(col("__hs"), lit(1), m),
          slice(col("__hs"), lit(2), m))).as("__p"))
      .select(col("__id"), col("__p.0").as("h1"), col("__p.1").as("h2"))
    // model tables aggregate the RAW streams: the bigram/token counts are
    // zipfian, so partial aggregation collapses the head map-side. The
    // occurrence stream joins the models directly — a per-doc distinct
    // pre-aggregate would key on (id, h1, h2), which is mostly UNIQUE
    // (the q83 lesson: near-unique keys defeat partial aggregation), so
    // it would add a full corpus-sized exchange while shrinking nothing;
    // dropping it cut the 100× replica wall by ~40%. The map-only scan
    // re-runs once per consumer — one extra compiled pass is cheaper
    // than one extra 25M-row exchange.
    val c2 = bg.groupBy("h1", "h2").agg(count(lit(1)).as("c2"))
    val c1 = hs.select(explode(col("__hs")).as("h1"))
      .groupBy("h1").agg(count(lit(1)).as("c1"))
    val scored = bg
      .join(c2, Seq("h1", "h2"))
      .join(c1, Seq("h1"))
      .withColumn("__r",
        round(col("c2").cast("double") / col("c1").cast("double"), 6)
          .cast(DecimalType(18, 6)))
      .groupBy("__id")
      .agg(sum(col("__r")).as("__s"), count(lit(1)).as("n_bigrams"))
    df.select(col(idCol))
      .join(scored, df(idCol) === scored("__id"), "left")
      // the mean lands on 6 decimals via integer MICRO-UNITS: the decimal
      // weighted sum is an exact integer of millionths, `div` floors it
      // per bigram count, and the only floating op is one final /1e6 on
      // identical operands. A double ROUND here sat exactly on IEEE half
      // boundaries that Spark (exact decimal half-up) and DuckDB
      // (float-multiply) break differently — 3 docs in 50k at sf0.1.
      .withColumn("__sm", (col("__s") * lit(1000000)).cast("long"))
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        (expr("__sm div n_bigrams").cast("double") / lit(1000000.0))
          .as("lm_score"))
  }

  /** One BPE training step: the `topN` most frequent adjacent character
    * pairs across the corpus, weighted by word frequency — the candidates
    * the next merge would pick from. Ties break to the lexicographically
    * smallest pair so the ranking is total and replayable.
    *
    * 100 TB shape: pair counting runs over the VOCABULARY, not the
    * corpus — the corpus collapses to a (word, freq) table first (one
    * exchange whose partial aggregates do the heavy lifting map-side),
    * and the character-pair explosion multiplies the vocab table only.
    * At web scale vocab ≪ corpus by 4-5 orders of magnitude, which is
    * what makes iterated BPE training affordable at all; the final
    * pair-count exchange is alphabet²-bounded. The top-n is an
    * orderBy+limit (TakeOrderedAndProject: per-partition heaps), never a
    * global window sort.
    *
    * Output: (rank, pair, cnt) — `pair` rendered "a+b".
    */
  def bpeMergeCandidates(df: DataFrame, textCol: String,
      topN: Int = 20): DataFrame = {
    val vocab = df
      .select(explode(split(coalesce(col(textCol), lit("")), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("f"))
    val chars = split(col("w"), "")
    val m = greatest(size(chars) - lit(1), lit(0))
    val pairs = vocab.select(col("f"),
        explode(arrays_zip(slice(chars, lit(1), m), slice(chars, lit(2), m)))
          .as("__p"))
      // Java's zero-width split can emit a trailing "" element that
      // DuckDB's by-codepoint split never produces — drop any pair
      // touching it so both engines count identical pairs. (Both split
      // BMP characters identically; astral chars would differ — UTF-16
      // surrogates vs codepoints — which the fixture does not contain.)
      .filter(col("__p.0") =!= "" && col("__p.1") =!= "")
      .select(concat(col("__p.0"), lit("+"), col("__p.1")).as("pair"), col("f"))
      .groupBy("pair").agg(sum(col("f")).as("cnt"))
    val top = pairs.orderBy(col("cnt").desc, col("pair")).limit(topN)
    top.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("pair"))))
      .select(col("rank"), col("pair"), col("cnt"))
  }

  /** ITERATED BPE training (Sennrich et al. 2016): `rounds` greedy merge
    * rounds over the word-frequency vocabulary — the real training loop
    * whose single step [[bpeMergeCandidates]] previews. Returns one row
    * per learned merge `(rank, pair, cnt)` plus a final
    * `(rounds+1, "__symbols", Σ f·|symbols|)` summary row proving the
    * merge APPLICATION (not just the picks) ran correctly — though the
    * picks alone already pin it, since every round's counts are computed
    * over the PREVIOUS round's merged vocabulary.
    *
    * 100 TB shape: the corpus collapses to the (word, freq) vocabulary
    * FIRST (the q106 insight — iterated BPE over raw text would rescan
    * the corpus per round; over the vocab each round touches |vocab|
    * rows). The driver loop holds only the single best pair per round
    * (a 1-row collect); the vocabulary itself stays distributed, with a
    * localCheckpoint per round so round r doesn't replay rounds 1..r-1.
    *
    * Merge application semantics (engine-portable, documented): the
    * learned pair is applied by ONE left-to-right non-overlapping
    * string replace over the space-joined symbol string — identical in
    * Spark (`UTF8String.replace`) and any standard `replace()`. For a
    * symbol repeated ≥4 times consecutively this merges fewer
    * occurrences than the canonical longest-first BPE apply (the shared
    * boundary space is consumed); on natural-language vocabularies the
    * two coincide. Determinism: integer counts, ties broken by (a, b).
    */
  def bpeTrain(df: DataFrame, textCol: String, rounds: Int = 5): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val spark = df.sparkSession
    var vocab = df
      .select(explode(split(coalesce(col(textCol), lit("")), " ")).as("w"))
      .filter(length(col("w")) >= 2 && length(col("w")) < 64)
      .groupBy("w").agg(count(lit(1)).as("f"))
      // symbol string: chars joined by spaces (words contain no spaces by
      // construction, so the representation is unambiguous); the empty
      // trailing element of Java's zero-width split is dropped, matching
      // a by-codepoint oracle split (BMP fixtures — q106's guard)
      .select(concat_ws(" ",
        filter(split(col("w"), ""), x => x =!= lit(""))).as("s"), col("f"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val sp = split(col("s"), " ")
      val m = greatest(size(sp) - lit(1), lit(0))
      val best = vocab
        .select(col("f"),
          explode(arrays_zip(slice(sp, lit(1), m), slice(sp, lit(2), m))).as("__p"))
        .select(col("__p.0").as("a"), col("__p.1").as("b"), col("f"))
        .groupBy("a", "b").agg(sum(col("f")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect() // exactly one row — the round's winning pair
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, cnt) = (best.head.getString(0), best.head.getString(1), best.head.getLong(2))
        merges += ((r, s"$a+$b", cnt))
        vocab = vocab
          .withColumn("s", trim(replace(
            concat(lit(" "), col("s"), lit(" ")),
            lit(s" $a $b "), lit(s" $a$b "))))
          .localCheckpoint()
        r += 1
      }
    }
    val summary = vocab
      .agg(sum(col("f") * size(split(col("s"), " "))).as("cnt"))
      .select(lit(rounds + 1).as("rank"), lit("__symbols").as("pair"), col("cnt"))
    import spark.implicits._
    merges.result().toDF("rank", "pair", "cnt").unionByName(summary)
  }

  /** BPE ENCODE — apply an ORDERED list of learned merges to the corpus
    * (the other half of [[bpeTrain]]: training produces the merge list,
    * encoding tokenizes with it — the operator that turns "we trained a
    * tokenizer" into per-document token counts for mixture weighting and
    * packing). Per document: whitespace words → character symbols → each
    * merge applied in order by the SAME one-pass left-to-right
    * non-overlapping replace as training (engine-portable; see
    * [[bpeTrain]]'s apply note) → per-doc BPE token count.
    *
    * CAVEAT — one-pass variant, NOT canonical BPE application: each merge
    * runs a single non-overlapping replace, so CONSECUTIVE occurrences of
    * a pair that share a separator are merged every-other-one per merge
    * step ("a b a b" under merge (a,b) → "ab a b", 3 tokens, where
    * canonical BPE iterates to "ab ab", 2). The variant is deliberate:
    * train and encode share the exact same replace, so encode counts are
    * exactly consistent with what [[bpeTrain]] learned AND replayable in
    * plain SQL on any engine (the DuckDB oracle). Token counts WILL
    * diverge from a standard BPE tokenizer trained on the same merges on
    * inputs with runs of a repeated pair — treat the output as this
    * engine's tokenizer, not a drop-in for an external one.
    *
    * 100 TB shape: the k-replace merge chain runs over the DISTINCT-WORD
    * vocabulary, not the corpus (the training-side vocab-collapse lever
    * again: k·|vocab| ≪ k·corpus words), and per-word token counts
    * BROADCAST back onto the word stream — the corpus never carries
    * symbol strings through an exchange; its only shuffle is the per-doc
    * count fold. The char-split HOF lambda (interpreted, the q25/q77
    * caveat) also runs on the vocab side only.
    *
    * Output: (idCol, n_words, n_tokens); an empty/whitespace-only or
    * null document is (0, 0), never a dropped row.
    */
  def bpeEncode(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    require(merges.nonEmpty, "bpeEncode needs at least one merge")
    val words = df
      .select(col(idCol).as("__id"),
        explode(split(coalesce(col(textCol), lit("")), " ")).as("w"))
      .filter(col("w") =!= "")
    val vocab = words.select("w").distinct()
    // char symbols; Java's zero-width split can emit "" — filtered, the
    // q106/q122 BMP-fixture guard
    val sym0 = concat_ws(" ", filter(split(col("w"), ""), x => x =!= lit("")))
    val symN = merges.foldLeft(sym0) { case (s, (a, b)) =>
      trim(replace(concat(lit(" "), s, lit(" ")), lit(s" $a $b "), lit(s" $a$b ")))
    }
    val encoded = vocab.select(col("w"), size(split(symN, " ")).as("__tok"))
    words.join(broadcast(encoded), "w")
      .groupBy("__id")
      .agg(count(lit(1)).as("n_words"), sum(col("__tok")).as("n_tokens"))
      .join(df.select(col(idCol)), col("__id") === col(idCol), "right")
      .select(col(idCol),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
  }
}
