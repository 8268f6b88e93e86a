package graft

/** Pins the PHYSICAL PLAN shapes the 100 TB design depends on. A change
  * that silently turns a broadcast chain into a fact-table shuffle, drops
  * a rank pushdown, or un-prunes a scan passes every value-level spec —
  * these assertions make the plan itself part of the contract. */
class PlanShapeSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String = {
    val df = SparkEntry.queries(q)(spark, dir)
    df.collect() // materialize so AQE finalizes the executed plan
    // AdaptiveSparkPlan.toString prints the Final AND the Initial plan —
    // keep only the final one or every node would be counted twice
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  test("q36: the fact table joins only via broadcast — no lineitem shuffle") {
    val p = plan("q36_region_revenue")
    assert(p.contains("BroadcastHashJoin"), "expected broadcast joins")
    assert(!p.contains("SortMergeJoin"), s"fact side must not sort-merge:\n$p")
    // the only exchanges allowed are broadcast + the final tiny aggregation
    val shuffles = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).size
    assert(shuffles <= 1, s"expected at most the final agg shuffle, got $shuffles")
  }

  test("q11 kNN: top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = plan("q11_knn_cosine")
    assert(p.contains("TakeOrderedAndProject"), s"expected rank pushdown:\n$p")
  }

  test("q52 vocab: top-100 plans as TakeOrderedAndProject over the count agg") {
    val p = plan("q52_vocab_topk")
    assert(p.contains("TakeOrderedAndProject"), s"expected TakeOrdered:\n$p")
  }

  test("q66 bm25: top-n plans as TakeOrderedAndProject; the only Window is over the limited survivors") {
    val p = plan("q66_bm25_topk")
    assert(p.contains("TakeOrderedAndProject"),
      s"bm25 top-n must heap-select, not globally sort:\n$p")
    // the rank Window may exist, but only ABOVE the TakeOrdered (bounded
    // input): the unbounded score stream must never feed a
    // single-partition Window sort
    val lines = p.linesIterator.toSeq
    val winIdx = lines.indexWhere(_.contains("Window"))
    val takeIdx = lines.indexWhere(_.contains("TakeOrderedAndProject"))
    assert(winIdx >= 0 && takeIdx > winIdx,
      s"the Window must sit above the TakeOrderedAndProject (bounded rows):\n$p")
  }

  test("q17 upsert: latest-wins prunes map-side via Partial WindowGroupLimit") {
    val p = plan("q17_upsert_latest_wins")
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
      s"expected map-side group limit:\n$p")
  }

  test("q06 range filter reaches the parquet scan as PushedFilters") {
    val p = plan("q06_filter_range")
    // assert each pushed predicate individually — the list's order and
    // punctuation are Spark-version formatting, not behavior
    assert(p.contains("GreaterThan(n_chars,100)") && p.contains("LessThanOrEqual(n_chars,200)"),
      s"expected pushed range predicates:\n$p")
  }

  test("q01 projection prunes the scan to the selected columns") {
    val p = plan("q01_scan_project_cast")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("text")
      && !readSchema.contains("lang") && !readSchema.contains("n_chars"),
      s"expected pruned ReadSchema, got: $readSchema")
  }

  test("q56: the document-frequency side broadcasts back onto the token stream") {
    val p = plan("q56_distinctive_terms")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast df join:\n$p")
  }

  test("q62: bucketed fact⋈fact join is exchange-free; only the agg shuffles") {
    // broadcast off: otherwise the small sf0.001 side broadcasts and the
    // test would not prove the bucketed layout carries the join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan("q62_bucketed_join_revenue")
      assert(p.contains("SortMergeJoin"), s"expected the co-located SMJ:\n$p")
      val shuffles = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
      assert(shuffles <= 1, s"join sides must read pre-bucketed (only the agg may shuffle), got $shuffles:\n$p")
      assert(!p.contains("BroadcastHashJoin"))
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("q65 mean-pooling: (label,pos) sums combine map-side before the shuffle") {
    val p = plan("q65_label_centroid")
    assert(p.contains("partial_sum"),
      s"the exploded stream must partial-aggregate before shuffling:\n$p")
    // generate → partial agg → one (label,pos) shuffle → final agg →
    // one (label) reassembly shuffle → final sort; anything more means
    // the 64x-exploded rows crossed the wire unreduced
    val shuffles = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(shuffles <= 2, s"expected (label,pos) + (label) shuffles only, got $shuffles:\n$p")
  }

  // NOTE: only the ALLOWLIST join shape is pinned. The pair self-join
  // legitimately becomes a bucket-keyed shuffle join at scale — asserting
  // its small-data broadcast form here would pin the wrong contract.
  test("q64 multi-probe: the bucket allowlist joins via broadcast") {
    val p = plan("q64_neardup_multiprobe")
    assert(p.contains("BroadcastHashJoin"), s"allowlist must broadcast:\n$p")
  }

  test("collection IVF query prunes the scan to the probed cells (PartitionFilters)") {
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "plan-ivf").toString
    val cat = new graft.catalog.CollectionCatalog(spark, root, numBuckets = 4)
    val c = cat.getOrCreateCollection("p", "cosine")
    c.add(spark.read.parquet(sf("embeddings"))
      .select(col("vec_id").cast("string").as("id"), col("embedding")))
    c.buildIndexSeeded((0L until 8L).map(_.toString))
    val df = c.query(Seq.fill(64)(0.5f), 5, nprobe = 2)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val scanLine = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("cell") && scanLine.contains(" IN "),
      s"expected the probed-cell IN filter at the file-listing level, got: $scanLine\n$p")
    // ... and the pruned scan must not read the whole collection: only
    // the 2 probed cells' directories survive the listing. The layout is
    // two-level (cell=<c>/pb=<b>, the refresh axis), so count DISTINCT
    // cells among the selected leaf partitions, not raw partition count.
    val cells = df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.selectedPartitions.toPartitionArray.map(_.filePath.toString)
          .flatMap(_.split("/").find(_.startsWith("cell="))).toSet
    }
    assert(cells.exists(_.size == 2),
      s"expected files from exactly 2 of 8 cells selected, got $cells")
  }

  test("q71 mixture: the corpus never shuffles — rates broadcast back") {
    val p = plan("q71_source_mixture")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast rate join:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus must not sort-merge:\n$p")
    // one exchange for the tiny per-source aggregate is fine; the corpus
    // scan side must not hash-partition (its only exchange is broadcast)
    val shuffles = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(shuffles <= 1, s"expected only the rate-agg shuffle, got $shuffles:\n$p")
  }

  test("q87 source gate: the corpus never shuffles — source means broadcast back") {
    val p = plan("q87_source_quality_gate")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast gate join:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus must not sort-merge:\n$p")
    // one exchange for the ~|sources|-row mean aggregate; the corpus scan
    // side's only exchange is the broadcast
    val shuffles = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(shuffles <= 1, s"expected only the mean-agg shuffle, got $shuffles:\n$p")
  }

  test("q90 temperature mixture: corpus side only ever joins broadcasts") {
    val p = plan("q90_temperature_mixture")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast rate join:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus must not sort-merge:\n$p")
    // the totals aggregate may shuffle (twice — the rates table and the
    // wsum scalar both consume it; AQE reuses the stage), but every hash
    // exchange must partition on the TINY agg key, never the corpus rows
    val badEx = p.linesIterator.filter(_.contains("Exchange hashpartitioning"))
      .filterNot(_.contains("source"))
    assert(badEx.isEmpty, s"corpus-keyed exchange found: ${badEx.mkString("; ")}\n$p")
  }

  test("q88 embedding decontamination: eval side broadcasts, corpus never shuffles pre-agg") {
    val p = plan("q88_decontaminate_embedding")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast nested-loop against the eval set:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"corpus must not shuffle into the eval comparison:\n$p")
    // the only hash exchange is the flagged-row aggregate
    val shuffles = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(shuffles <= 1, s"expected only the hit-agg shuffle, got $shuffles:\n$p")
  }

  test("q91 group split: map-only — no exchange except the output order") {
    val p = plan("q91_group_split")
    assert(!p.contains("Exchange hashpartitioning"),
      s"split assignment is a pure hash of the group column:\n$p")
    assert(!p.linesIterator.exists(l => l.contains("Join")),
      s"no group table, no join:\n$p")
  }

  test("q89 percentiles: rows collapse to the value histogram before any window") {
    val p = plan("q89_length_percentiles")
    // the partial (group, value) count must combine map-side: a partial
    // HashAggregate below the exchange is the whole point of the
    // histogram form (the exchange carries distinct values, not rows)
    val lines = p.linesIterator.toSeq
    val exIdx = lines.indexWhere(_.contains("Exchange hashpartitioning"))
    val partialBelow = lines.drop(exIdx + 1)
      .exists(l => l.contains("HashAggregate") && l.contains("partial_count"))
    assert(exIdx >= 0 && partialBelow,
      s"expected a map-side partial count under the first exchange:\n$p")
  }

  test("q86 semdedup: pair expansion joins on cell — no broadcast of the corpus, no cartesian") {
    val p = plan("q86_semdedup")
    assert(!p.contains("CartesianProduct"),
      s"within-cell pairs must come from an equi-join on cell:\n$p")
    // drop-list anti-join: the drop ids are bounded by the corpus and the
    // anti side may broadcast; the pair join itself is the cell equi-join
    assert(p.contains("Join") && p.contains("cell"),
      s"expected the cell equi-join in the plan:\n$p")
  }

  test("q75 cluster sample: per-cell cap prunes map-side via WindowGroupLimit") {
    val p = plan("q75_cluster_sample")
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
      s"expected map-side group limit (rank<=k pushdown):\n$p")
  }

  test("q78 interval join: binning plans an equi-join, never a cross product") {
    val p = plan("q78_interval_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"range join must bin to an equi-join:\n$p")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"expected a keyed equi-join on (user, bin):\n$p")
  }

  // regression pin for the TextStats/lambda fixes: ONE CodegenFallback
  // lambda (a HOF like filter(), or array_compact which desugars to one)
  // evicts the whole projection from codegen, disabling the cross-column
  // subexpression elimination that collapses the shared text scan — the
  // sf1 point measured x26 (q25) and x8 (q77) from exactly this. Codegen'd
  // nodes print with a *(n) stage marker — an unstarred Project fails.
  test("q83 repetition: one compiled scan, zero shuffle — only the orderBy exchanges") {
    val p = plan("q83_repetition")
    assert(!p.contains("Window"), s"gram counting must never window-sort:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"per-doc repetition must not shuffle grams (RepetitionStats is per-row):\n$p")
    assert(p.contains("graft_repetition_stats") || p.contains("RepetitionStats"),
      s"expected the compiled RepetitionStats scan:\n$p")
  }

  test("q84 packing: the running sum windows per shard, never globally") {
    val p = plan("q84_sequence_packing")
    assert(p.contains("windowspecdefinition(shard"),
      s"the cumulative token sum must partition by shard (a global window " +
        s"single-partitions the corpus at scale):\n$p")
  }

  test("q85 repetition gate: one compiled scan, zero shuffle — only the orderBy exchanges") {
    val p = plan("q85_repetition_filter")
    assert(!p.contains("Exchange hashpartitioning"),
      s"the gate is per-row (RepetitionStats); nothing may shuffle:\n$p")
    assert(p.contains("graft_repetition_stats") || p.contains("RepetitionStats"),
      s"expected the compiled RepetitionStats scan:\n$p")
  }

  test("q94 pii scrub: map-only — no join, no exchange except the output order") {
    val p = plan("q94_pii_scrub")
    assert(!p.contains("Exchange hashpartitioning"),
      s"PII detect/redact is per-row regexp work; nothing may shuffle:\n$p")
    assert(!p.linesIterator.exists(_.contains("Join")),
      s"no lookup table, no join:\n$p")
  }

  test("q95 blocklist: the corpus anti-joins a broadcast — never sort-merges") {
    val p = plan("q95_domain_blocklist")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"the domain blocklist must broadcast into an anti probe:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus must not sort-merge:\n$p")
    // one exchange builds the distinct-source blocklist (collapsed by a
    // map-side partial agg); the corpus side's only exchange is broadcast
    val shuffles = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(shuffles <= 1, s"expected only the blocklist distinct, got $shuffles:\n$p")
  }

  test("q96 cluster reps: the per-cluster argmax is an aggregate, never a window sort") {
    val p = plan("q96_cluster_reps")
    assert(!p.contains("Window"),
      s"rep selection must be the struct-max aggregate (a per-cluster sort " +
        s"dies on the 10^7-member boilerplate cluster):\n$p")
    assert(!p.contains("CartesianProduct"), s"pairs stay bucket-confined:\n$p")
  }

  test("q97 affinity: bucket stats broadcast back; the token exchange is histogram-sized") {
    val p = plan("q97_target_affinity")
    assert(p.contains("BroadcastHashJoin"),
      s"the <=buckets-row feature table must broadcast onto the tokens:\n$p")
    // the bucket-count aggregate must combine map-side so its exchange
    // carries <=buckets rows, not the token stream (same pin as q89)
    val lines = p.linesIterator.toSeq
    val exIdx = lines.indexWhere(l => l.contains("Exchange hashpartitioning") && l.contains("__b"))
    val partialBelow = lines.drop(exIdx + 1)
      .exists(l => l.contains("HashAggregate") && l.contains("partial_count"))
    assert(exIdx >= 0 && partialBelow,
      s"expected a map-side partial count under the bucket exchange:\n$p")
  }

  test("q98 line filter: map-only — no join, no exchange except the output order") {
    val p = plan("q98_c4_line_filter")
    assert(!p.contains("Exchange hashpartitioning"),
      s"line filtering is one compiled scan; nothing may shuffle:\n$p")
    assert(!p.linesIterator.exists(_.contains("Join")), s"no join:\n$p")
    assert(p.contains("graft_line_filter_stats") || p.contains("LineFilterStats"),
      s"expected the compiled LineFilterStats scan:\n$p")
  }

  test("q99 line dedup: keys partial-aggregate map-side; docs rebuild via the compiled scan") {
    val p = plan("q99_line_dedup")
    assert(p.contains("graft_lines_at") || p.contains("LinesAt"),
      s"reconstruction must be the compiled LinesAt scan (line strings " +
        s"never cross an exchange):\n$p")
    assert(p.contains("partial_min"),
      s"the keep-first struct-min must combine map-side:\n$p")
    assert(!p.contains("Window") && !p.contains("CartesianProduct"),
      s"no window sort, no cross product:\n$p")
  }

  test("q102 winnowing: map-only — the sketch never shuffles") {
    val p = plan("q102_winnow_fingerprints")
    assert(!p.contains("Exchange hashpartitioning"),
      s"fingerprinting is one compiled scan; nothing may shuffle:\n$p")
    assert(p.contains("graft_winnow_fingerprints") || p.contains("WinnowFingerprints"),
      s"expected the compiled WinnowFingerprints scan:\n$p")
  }

  test("q103 kmv: the rank <= k prunes map-side via Partial WindowGroupLimit") {
    val p = plan("q103_kmv_distinct")
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
      s"the k-minimum set must prune under the exchange (<= k rows per " +
        s"group cross the wire):\n$p")
  }

  test("q100 funnel: every stage folds into ONE corpus scan") {
    val p = plan("q100_curation_funnel")
    val scans = p.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"expected a single documents scan, got $scans:\n$p")
    assert(!p.linesIterator.exists(_.contains("Join")),
      s"stage flags are one pass, not per-stage scans:\n$p")
  }

  for (q <- Seq("q25_quality_score", "q77_quality_filter", "q83_repetition",
      "q85_repetition_filter", "q98_c4_line_filter"))
    test(s"$q: the whole projection stays inside whole-stage codegen") {
      val p = plan(q)
      val unstarred = p.linesIterator
        .filter(l => l.contains(" Project [") || l.startsWith("Project ["))
        .filterNot(_.contains(") Project ["))
      assert(unstarred.isEmpty,
        s"projection fell out of whole-stage codegen:\n${unstarred.mkString("\n")}\n$p")
    }

  test("q105 bigram LM: model joins stay key-joins — no cross product, no corpus broadcast") {
    val p = plan("q105_bigram_lm")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"bigram/unigram model joins must be equi-joins on hash keys:\n$p")
    assert(p.contains("graft_token_spread_hashes"),
      s"token hashing must be the compiled one-pass scan, not a transform() lambda:\n$p")
  }

  test("q106 BPE: pair top-n heap-selects; the rank window sits above the bounded limit") {
    val p = plan("q106_bpe_merges")
    assert(p.contains("TakeOrderedAndProject"),
      s"vocab pair top-n must heap-select, not globally sort:\n$p")
    val lines = p.linesIterator.toSeq
    val winIdx = lines.indexWhere(_.contains("Window"))
    val takeIdx = lines.indexWhere(_.contains("TakeOrderedAndProject"))
    assert(winIdx >= 0 && takeIdx > winIdx,
      s"the rank Window must sit above the TakeOrderedAndProject:\n$p")
  }

  test("q107 kmv overlap: rank <= k prunes map-side; only sketch rows reach the pair stage") {
    val p = plan("q107_kmv_overlap")
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
      s"the k-minimum set must prune under the exchange:\n$p")
  }

  test("q108 retention: aggregates only — no window sort, no cross product") {
    val p = plan("q108_retention")
    assert(!p.contains("Window") && !p.contains("CartesianProduct"),
      s"cohorting is min-agg + counts, never a per-user window sort:\n$p")
  }

  test("q135 CMS: build combines map-side; the probe join broadcasts onto the sketch") {
    val p = plan("q135_cms_heavyhitters")
    // the corpus-sized token stream must PARTIAL-aggregate before its
    // exchange (the d·w-cell collapse is the whole point of the sketch)
    assert(p.contains("partial_count") || p.contains("Partial"),
      s"CMS cell counts must combine map-side:\n$p")
    // probes are a literal handful — their join against the sketch (and
    // the exact-count side) must broadcast, never shuffle the corpus agg
    assert(p.contains("BroadcastHashJoin"),
      s"probe lookups must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cross products:\n$p")
  }

  test("filtered keywordTopK keeps the sidecar's tp pruning; eligibility scan is column-pruned") {
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "plan-kwf").toString
    val cat = new graft.catalog.CollectionCatalog(spark, root, numBuckets = 4)
    val c = cat.getOrCreateCollection("pf")
    c.add(spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("string").as("id"),
        col("text").as("document"), col("lang"), col("source")))
    c.buildKeywordIndex()
    val df = c.keywordTopK(Seq("hash", "join"), 10,
      where = Some(graft.operators.ChromaFilter.Eq("lang", "en")))
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // the where must NOT cost the sidecar its partition pruning: the
    // postings read still lists only the query terms' tp dirs
    val tpLine = p.linesIterator
      .find(l => l.contains("PartitionFilters") && l.contains("tp")).getOrElse("")
    assert(tpLine.contains(" IN ") || tpLine.contains("tp#"),
      s"expected the tp IN pruning to survive the filtered path, got: $tpLine\n$p")
    // the eligibility side reads ONLY (id, lang) — never document/source:
    // a filter that re-read the text column would defeat the sidecar
    val eligScan = p.linesIterator.filter(_.contains("ReadSchema"))
      .find(l => l.contains("lang")).getOrElse("")
    assert(eligScan.nonEmpty && !eligScan.contains("document") &&
      !eligScan.contains("source"),
      s"eligibility scan must prune to id+lang, got: $eligScan\n$p")
  }

  test("$regex through the doc index: the postings read keeps gp partition pruning") {
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "plan-rgx").toString
    val cat = new graft.catalog.CollectionCatalog(spark, root, numBuckets = 4)
    val c = cat.getOrCreateCollection("rgx")
    c.add(spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("string").as("id"), col("text").as("document")))
    c.buildDocIndex()
    val df = c.get(whereDoc =
      Some(graft.operators.ChromaFilter.MatchesRegex("vector [a-z]+ table")))
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // the regex's required-literal grams must confine the postings read
    // to their gp partitions — a full postings scan per regex get() would
    // be the 100 TB regression this pin exists to catch
    val gpLine = p.linesIterator
      .find(l => l.contains("PartitionFilters") && l.contains("gp")).getOrElse("")
    assert(gpLine.contains(" IN ") || gpLine.contains("gp#"),
      s"expected gp IN pruning on the regex-confined postings read:\n$p")
    // the verbatim re-check still runs (RLike survives in the plan)
    assert(p.contains("RLIKE") || p.toLowerCase.contains("rlike"),
      s"the verbatim regex re-check must stay in the plan:\n$p")
  }

  test("q177 staged MaxSim: the shortlist confines via broadcast semi-join; chunks never sort-merge") {
    val p = plan("q177_maxsim_rerank")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"the top-50 shortlist must broadcast-semi-join the corpus:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no corpus-side sort-merge in the staged path:\n$p")
    // the per-(doc,token) max partial-aggregates before its exchange
    assert(p.contains("partial_max") || p.contains("Partial"),
      s"the max fold must combine map-side:\n$p")
  }
}
