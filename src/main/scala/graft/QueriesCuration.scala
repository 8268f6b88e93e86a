package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.catalog.{Collection, CollectionCatalog}
import graft.functions.{Distances, TextAnalysis}
import graft.operators.{Ann, Assemble, ChromaFilter, Dedup, Events, HashingEmbedder, Knn, Lm, Mixture, Multimodal, Retrieval, Sketches, Skew, TfIdfSrpEmbedder}

/** SURVEY §2.D query family: training-data curation — exact/near dedup
  * (MinHash/SimHash/SRP/SemDeDup/winnowing), decontamination,
  * mixtures/sampling/packing/splits, and the multimodal codecs.
  *
  * Pure code motion from the pre-r15 single-file SparkEntry (the 164/164
  * CORRECTNESS sweep is the refactoring harness — hashes unchanged);
  * [[SparkEntry]] composes the families back into the driver-contract
  * `queries`/`oracleSql` maps. Shared fixtures/helpers live in
  * [[EntryKit]].
  */
private[graft] trait QueriesCuration extends EntryKit {

  private[graft] def curationQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // C1 exact dedup (count distinct + keep-min-id dedup count)
    "q16_dedup_exact" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      docs.agg(countDistinct(col("text")).as("n_distinct")).crossJoin(
        Dedup.exactDedup(docs, Seq("text"), "doc_id").agg(count(lit(1)).as("n_after")))
    }),
    // C2 n-gram (word-set) Jaccard similarity over a sampled pair set
    "q28_jaccard_pairs" -> ((s, dir) => {
      val sample = t(s, dir, "documents").filter(pmod(col("doc_id"), lit(100)) === 0)
        .select(col("doc_id").as("id"), array_distinct(split(col("text"), " ")).as("toks"))
      sample.as("a").join(sample.as("b"), col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          roundz(Dedup.jaccard(col("a.toks"), col("b.toks")), 4).as("sim"))
        .orderBy("id_a", "id_b")
    }),
    // C2 embedding-cosine near-dup pairs over a sampled set
    "q29_embedding_neardup" -> ((s, dir) => {
      val sample = t(s, dir, "embeddings").filter(pmod(col("vec_id"), lit(10)) === 0)
      // -Inf (not -1.0): float cosine can land epsilon below -1, and the
      // oracle applies NO similarity filter — every pair must survive
      Dedup.embeddingNearDup(sample, "vec_id", "embedding", Double.NegativeInfinity)
        .select(col("id_a"), col("id_b"), roundz(col("sim"), 4).as("sim"))
        .orderBy("id_a", "id_b")
    }),
    // C2 MinHash+LSH near-dup candidates, portable-hash + equality-bucket
    // form so a DuckDB oracle replays the whole signature pipeline.
    // 8 bands × 2 rows: candidate-permissive (the fixture has no exact
    // dups) while still pruning ~all of the 125k-pair cross product.
    "q30_minhash_candidates" -> ((s, dir) => {
      val sample = t(s, dir, "documents").filter(pmod(col("doc_id"), lit(10)) === 0)
      Dedup.minHashCandidates(sample, "doc_id", "text",
          shingleSize = 3, numHashes = 16, numBands = 8,
          hashFn = Dedup.portableHash)
        .orderBy("id_a", "id_b")
    }),
    // C2 SimHash 64-bit signatures, relational portable form (one codegen
    // pass: explode tokens → 64 conditional sums → bit assembly)
    "q31_simhash" -> ((s, dir) =>
      Dedup.simHashes(
          t(s, dir, "documents").filter(pmod(col("doc_id"), lit(10)) === 0),
          "doc_id", "text")
        .select(col("id").as("doc_id"), col("simhash"))
        .orderBy("doc_id")),
    // C2 embedding near-dup AT SCALE: SRP-LSH buckets confine the pair
    // expansion (q29's all-pairs form stays a verify primitive); the whole
    // bucket→pair→cosine path replays in the DuckDB oracle
    "q61_embedding_neardup_lsh" -> ((s, dir) =>
      Dedup.embeddingNearDupLsh(t(s, dir, "embeddings"), "vec_id", "embedding",
          minSim = 0.2, dim = 64, nBits = 8)
        .select(col("id_a"), col("id_b"), roundz(col("sim"), 4).as("sim"))
        .orderBy("id_a", "id_b")),
    // The nBitsFor AUTO-SIZING dial under the oracle: bucket width sized
    // from the live corpus count (ceil-div + bit-length, integer-exact —
    // see nBitsFor's no-log rationale), then the same SRP pipeline as
    // q61. The emitted n_bits column pins the dial's own output, and the
    // oracle recomputes it from COUNT(*) with integer shifts — proving
    // the sizing rule itself is portable, not just one frozen width.
    "q113_autosized_lsh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val nb = Dedup.nBitsFor(emb.count(), targetBucket = 50)
      Dedup.embeddingNearDupLsh(emb, "vec_id", "embedding",
          minSim = 0.2, dim = 64, nBits = nb)
        .select(col("id_a"), col("id_b"), roundz(col("sim"), 4).as("sim"),
          lit(nb).as("n_bits"))
        .orderBy("id_a", "id_b")
    }),
    // Multi-probe recall dial: probes=2 additionally checks the bucket with
    // bit 0 flipped, reaching near-dup pairs that straddle one SRP
    // hyperplane (including rows that sit ALONE in their bucket) without
    // re-hashing anything — cost grows by one probed copy of side a only
    "q64_neardup_multiprobe" -> ((s, dir) =>
      Dedup.embeddingNearDupLsh(t(s, dir, "embeddings"), "vec_id", "embedding",
          minSim = 0.2, dim = 64, nBits = 8, probes = 2)
        .select(col("id_a"), col("id_b"), roundz(col("sim"), 4).as("sim"))
        .orderBy("id_a", "id_b")),
    // Multi-TABLE recall dial: L=4 independent SRP tables (disjoint runs of
    // the projection sequence) union their candidate pairs — recall
    // 1−(1−p^nBits)^L, the standard LSH amplification for true near-dups
    // (p→1) while random pairs stay excluded. The whole per-table
    // bucket→union→cosine path replays in the oracle; measured recall for
    // all three SRP configurations lands in the bench recall block.
    "q82_neardup_multitable" -> ((s, dir) =>
      Dedup.embeddingNearDupLsh(t(s, dir, "embeddings"), "vec_id", "embedding",
          minSim = 0.2, dim = 64, nBits = 8, tables = 4)
        .select(col("id_a"), col("id_b"), roundz(col("sim"), 4).as("sim"))
        .orderBy("id_a", "id_b")),
    // Ingest-time dedup gate: a batch (doc_id % 5 = 0) classified against
    // the already-stored corpus (the rest) — dup_exact / dup_near (LSH
    // band match + Jaccard >= 0.7) / kept. Every corpus pass is map-side
    // against a broadcast batch derivative; the corpus never shuffles.
    "q92_ingest_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.dedupAgainstCorpus(
          docs.filter(pmod(col("doc_id"), lit(5)) === 0),
          docs.filter(pmod(col("doc_id"), lit(5)) =!= 0),
          "doc_id", "text", minJaccard = 0.7,
          hashFn = Dedup.portableHash)
        .select(col("doc_id"), col("verdict"))
        .orderBy("doc_id")
    }),
    // SemDeDup (Abbas et al. 2023): seeded centroid cells (same
    // SQL-replayable assignment as q32/q60) confine the within-cell
    // pairwise cosine; a row drops iff a smaller-id cell-mate reaches
    // minSim. Cells, pairs and every keep decision replay in the oracle.
    // The cell count is SIZE-AWARE (Dedup.cellsFor — integer-only clamp
    // of n/250, the q148 dial discipline, recomputed by the oracle from
    // COUNT(*)): within-cell pair work is O(occupancy²), so the r12
    // posture of 16 pinned cells was quadratic in corpus growth — the
    // ORACLE now scales with the library path instead of fighting it.
    // Emitted as a column so the dial itself is hash-pinned.
    "q86_semdedup" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val nc = Dedup.cellsFor(emb.count())
      val m = Ann.buildIvfSeeded(emb, "vec_id", "embedding", 0L until nc.toLong)
      Dedup.semDedup(m.assigned, "vec_id", "embedding", minSim = 0.3)
        .select(col("vec_id"), col("cell"), lit(nc).cast("int").as("nc"))
        .orderBy("vec_id")
    }),
    // Embedding-space decontamination: the paraphrase-leakage check beside
    // q68's verbatim n-gram form. Eval vectors BROADCAST; the corpus side
    // pays one map-side nested-loop pass and never shuffles; only the
    // flagged aggregate exchanges. The eval set is label 0 CAPPED to the
    // first 500 ids — an eval/benchmark suite is FIXED-SIZE no matter how
    // far the corpus scales (the sf1 replica measured ×28 when both sides
    // grew with sf; with the cap the pass is linear in the corpus, which
    // is the real 100 TB shape).
    "q88_decontaminate_embedding" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Dedup.contaminatedEmbeddings(
          emb.filter(col("label") =!= 0), "vec_id", "embedding",
          emb.filter(col("label") === 0 && col("vec_id") < 500), "embedding",
          minSim = 0.3)
        .select(col("id").as("vec_id"), col("n_eval_hits"),
          roundz(col("max_sim"), 4).as("max_sim"))
        .orderBy("vec_id")
    }),
    // Token-budget sequence packing (concat-then-chunk causal-LM layout):
    // docs laid out in reshard order, each doc assigned to the sequence
    // its first token lands in. ONE per-shard window, integral `div`
    // math end to end — the assignment replays exactly in any engine.
    "q84_sequence_packing" -> ((s, dir) =>
      Mixture.packSequences(
        t(s, dir, "documents")
          .withColumn("n_tokens",
            TextAnalysis.tokenCount(coalesce(col("text"), lit("")))),
        "doc_id", "n_tokens", budget = 2048, nShards = 8)
        .orderBy("shard", "seq")),
    // Domain blocklist: URLs derived from fixture columns, blocklist
    // derived IN-ENGINE (spread-hash of the source ⇒ deterministic across
    // scales and engines), then the broadcast anti-join drop. The corpus
    // never shuffles — the 100 TB shape of every UT1-style domain filter.
    "q95_domain_blocklist" -> ((s, dir) => {
      val d = t(s, dir, "documents").withColumn("url",
        concat(lit("https://"), col("source"), lit(".example.com/doc/"),
          col("doc_id").cast("string")))
      val blocked = d.select(col("source")).distinct()
        .filter(Mixture.spreadHash(col("source")) % 5 < 2)
        .select(concat(col("source"), lit(".example.com")).as("domain"))
      TextAnalysis.blockByDomain(d, "url", blocked)
        .select(col("doc_id"), col("domain"))
        .orderBy("doc_id")
    }),
    // Dedup DECISION end-to-end: LSH pairs → connected components → keep
    // the highest-quality member per cluster (ties → smallest id) via one
    // struct-max aggregate — no per-cluster window sort anywhere.
    "q96_cluster_reps" -> ((s, dir) => {
      val pairs = Dedup.embeddingNearDupLsh(t(s, dir, "embeddings"),
        "vec_id", "embedding", minSim = 0.2, dim = 64, nBits = 8)
      val clusters = Dedup.dupClusters(pairs, "id_a", "id_b")
      val scored = t(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("score"))
      Dedup.clusterRepresentatives(clusters, "id", "cluster",
          scored, "doc_id", "score")
        .select(col("cluster"), col("n_members"), col("rep_id"),
          roundz(col("rep_score"), 4).as("rep_score"))
        .orderBy("cluster")
    }),
    // DSIR-style data selection: rank every doc by hashed-unigram
    // affinity to the English subset. Bucket table ≤256 rows, broadcasts;
    // per-doc exchange carries docs, never tokens.
    "q97_target_affinity" -> ((s, dir) =>
      TextAnalysis.targetAffinity(t(s, dir, "documents"), "doc_id", "text",
          col("lang") === "en", buckets = 256)
        .select(col("doc_id"), col("n_tokens"), col("s_t"), col("s_r"),
          roundz(col("affinity"), 6).as("affinity"))
        .orderBy("doc_id")),
    // Corpus-level line dedup (CCNet shape): 3-token planted lines give
    // ~19% cross-document duplicate mass on the fixture; keep-first is
    // the min (doc, idx) struct per line key, docs rebuild via the
    // compiled LinesAt scan. Line strings never cross an exchange.
    "q99_line_dedup" -> ((s, dir) => {
      val planted = t(s, dir, "documents").select(col("doc_id"),
        regexp_replace(col("text"), "((?:\\S+ ){2}\\S+) ", "$1\n").as("ptext"))
      Dedup.dedupLinesAcrossCorpus(planted, "doc_id", "ptext")
        .orderBy("doc_id")
    }),
    // URL canonicalization + dedup: planted URLs vary case, default port,
    // tracking params and fragments over a shared 100-path space; the
    // regex canonical form collapses them and exactDedup keeps the first.
    "q101_url_canon_dedup" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), concat(
          lit("HTTPS://WWW.Example.COM"),
          when(col("doc_id") % 4 === 0, ":443").otherwise(""),
          lit("/doc/"), (col("doc_id") % 100).cast("string"),
          when(col("doc_id") % 2 === 0,
            concat(lit("?utm_source=feed&ref="), col("source"))).otherwise(lit("")),
          when(col("doc_id") % 3 === 0, lit("#sec")).otherwise(lit(""))).as("url"))
        .select(col("doc_id"), TextAnalysis.canonicalizeUrl(col("url")).as("canon"))
      Dedup.exactDedup(d, Seq("canon"), "doc_id")
        .select(col("doc_id"), col("canon")).orderBy("doc_id")
    }),
    // Winnowing fingerprints (MOSS): the position-robust sketch — shared
    // substrings ≥ k+w−1 chars guarantee a common entry. Map-only
    // compiled scan; the oracle replays gram hashing, rightmost-min
    // window selection and the distinct-sort in pure list SQL. The
    // sorted fingerprint list is emitted as a comma-joined STRING —
    // the driver's value-sort compare cannot hash an array column
    // (the same constraint that put q65 in long form).
    "q102_winnow_fingerprints" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
          TextAnalysis.winnowFingerprints(col("text"), k = 12, w = 4).as("fps"))
        .select(col("doc_id"), size(col("fps")).cast("long").as("n_fps"),
          array_join(col("fps").cast("array<string>"), ",").as("fps"))
        .orderBy("doc_id")),
    // Winnowing overlap pairs — the MOSS decision surface. DECLARED
    // BOUNDED VERIFY PRIMITIVE (like q28/q29): all-pairs over a FIXED
    // sample (mod-50 within doc_id < 5000 — the q88 lesson: a sample
    // that grows with the corpus makes all-pairs quadratic, ×16.7 at the
    // 10× replica before the cap) verifies the sketch-intersection
    // semantics; the scale path is explode + join on the fingerprint
    // (bucket-confined), the same shape as the LSH candidate paths.
    "q104_winnow_overlap" -> ((s, dir) => {
      val f = t(s, dir, "documents")
        .filter(pmod(col("doc_id"), lit(50)) === 0 && col("doc_id") < 5000)
        .select(col("doc_id").as("id"),
          TextAnalysis.winnowFingerprints(col("text"), k = 12, w = 4).as("fps"))
      f.as("a").join(f.as("b"), col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          size(array_intersect(col("a.fps"), col("b.fps"))).cast("long").as("n_shared"))
        .filter(col("n_shared") >= 1)
        .orderBy("id_a", "id_b")
    }),
    // The planted-twin ground-truth eval, ORACLED: Recall.plantedUnion's
    // deterministic jittered twins (cosine ≈ 0.97) union the fixture,
    // and the 4-table SRP near-dup path must recover the (v, twin)
    // pairs at minSim = 0.9 — the bench's trust metric as a
    // hash-checked query. FIXED id cap (vec_id < 500): the eval set
    // must not grow with the corpus (the q88/q104 lesson).
    "q109_planted_neardup" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").filter(col("vec_id") < 500)
        .select(col("vec_id"), col("embedding"))
      Dedup.embeddingNearDupLsh(Recall.plantedUnion(emb), "vec_id",
          "embedding", minSim = 0.9, dim = 64, nBits = 8, tables = 4)
        .select(col("id_a"), col("id_b"), roundz(col("sim"), 4).as("sim"))
        .orderBy("id_a", "id_b")
    }),
    // Benchmark decontamination: docs leaking any 8-gram of the "eval"
    // slice (deterministic doc_id % 97 sample stands in for a benchmark).
    // Eval shingles broadcast; corpus rows never shuffle.
    "q68_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.contaminated(docs, "doc_id", "text",
          docs.filter(col("doc_id") % 97 === 0).select(col("text")), "text", n = 8)
        .orderBy("id")
    }),
    // Dataset curation: deterministic stratified systematic sample (1-in-10
    // per language stratum, by id order — reproducible without RNG state)
    "q41_stratified_sample" -> ((s, dir) => {
      val w = Window.partitionBy("lang").orderBy("doc_id")
      t(s, dir, "documents")
        .withColumn("rn", row_number().over(w))
        .filter(pmod(col("rn"), lit(10)) === 1)
        .select("doc_id", "lang", "rn").orderBy("doc_id")
    }),
    // LLM batch construction: greedy token packing into 512-token bins per
    // language stratum (running sum + integer division — exact both engines)
    "q42_token_packing" -> ((s, dir) => {
      val w = Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "documents")
        .withColumn("n_tok", TextAnalysis.tokenCount(col("text")))
        .withColumn("cum", sum(col("n_tok")).over(w))
        .select(col("doc_id"), col("lang"),
          expr("(cum - n_tok) div 512").as("bin"))
        .orderBy("doc_id")
    }),
    // C2 end-to-end near-dedup: LSH candidates → shingle-Jaccard verify
    // (≥ 0.7) → keep-min-id survivors; the full documents table
    "q54_near_dedup" -> ((s, dir) =>
      Dedup.nearDedup(t(s, dir, "documents"), "doc_id", "text", 0.7,
          hashFn = Dedup.portableHash)
        .select("doc_id").orderBy("doc_id")),
    // Deterministic hash sampling: StrHash(id) mod 100 < rate — stable
    // across runs/engines/partitionings (unlike RNG-based sample()), the
    // reproducible-split primitive for train/eval carving at 100 TB
    "q58_hash_sample" -> ((s, dir) =>
      t(s, dir, "documents")
        .filter(pmod(graft.expressions.GraftExtensions.strHash(
          col("doc_id").cast("string")), lit(100)) < 20)
        .select("doc_id", "lang").orderBy("doc_id")),
    // Curation: weighted source-mixture sampling to a token budget — the
    // data-mixing step of training-corpus assembly. The per-source rate
    // table broadcasts back onto the corpus scan (the corpus never
    // shuffles); the keep decision is the portable id hash, so the whole
    // mixture replays in the oracle.
    "q71_source_mixture" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("n_tok", TextAnalysis.tokenCount(col("text")))
      Mixture.sampleToBudget(docs, "doc_id", "source", "n_tok",
          Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2), budget = 2000L)
        .select(col("doc_id"), col("source"), roundz(col("rate"), 4).as("rate"))
        .orderBy("doc_id")
    }),
    // Temperature-scaled mixture (the multilingual-sampling rule): source
    // weights derived IN-ENGINE as sqrt(total tokens), normalized via an
    // order-free decimal sum — small sources upweighted, no giant source
    // dominating, and the whole rate computation replays in the oracle.
    "q90_temperature_mixture" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("n_tok", TextAnalysis.tokenCount(col("text")))
      Mixture.sampleTemperature(docs, "doc_id", "source", "n_tok",
          alpha = 0.5, budget = 2000L)
        .select(col("doc_id"), col("source"), roundz(col("rate"), 4).as("rate"))
        .orderBy("doc_id")
    }),
    // Leakage-safe train/val/test assignment: the split is a pure hash of
    // the SOURCE, so every document of an origin lands in the same split
    // (i.i.d. row splits leak near-dups across the boundary). Map-only.
    "q91_group_split" -> ((s, dir) =>
      Mixture.groupSplit(t(s, dir, "documents"), "source",
          Seq("train" -> 0.6, "val" -> 0.2, "test" -> 0.2))
        .select(col("doc_id"), col("source"), col("split"))
        .orderBy("doc_id")),
    // Curation: deterministic corpus shuffle into training shards — global
    // order and shard assignment are pure functions of the id, so the
    // shards are reproducible across runs/engines (and verifiable here)
    "q72_reshard" -> ((s, dir) =>
      Mixture.reshard(t(s, dir, "documents"), "doc_id", nShards = 8)
        .select(col("doc_id"), col("shard"), col("pos"))
        .orderBy("shard", "pos")),
    // Substring-level dedup signal (Lee et al. 2022): per-doc count of
    // 5-token passages that recur in other documents
    "q73_duplicate_passages" -> ((s, dir) =>
      Dedup.duplicatePassages(t(s, dir, "documents"), "doc_id", "text", n = 5)
        .select(col("id").as("doc_id"), col("n_dup_passages"), col("max_spread"))
        .orderBy("doc_id")),
    // Curation: cluster-balanced diversity sample — ≤10 rows per seeded
    // IVF cell (q32's deterministic assignment), chosen by portable hash
    "q75_cluster_sample" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val m = Ann.buildIvfSeeded(emb, "vec_id", "embedding", 0L until 8L)
      Mixture.cellBalancedSample(m.assigned, "vec_id", perCell = 10)
        .select(col("vec_id"), col("cell")).orderBy("vec_id")
    }),
    // Transitive dup clustering: connected components over the LSH
    // near-dup pairs (q61's pipeline) — cluster = min id, the canonical
    // representative cluster-level dedup keeps
    "q76_dup_clusters" -> ((s, dir) => {
      val pairs = Dedup.embeddingNearDupLsh(t(s, dir, "embeddings"),
        "vec_id", "embedding", minSim = 0.2, dim = 64, nBits = 8)
      Dedup.dupClusters(pairs, "id_a", "id_b")
        .select(col("id").as("vec_id"), col("cluster"))
        .orderBy("vec_id")
    }),
    // Multimodal with a REAL codec (no stub): payloads are genuine PNG
    // byte streams (deterministic pixel formula → javax.imageio encode),
    // and the query runs an ACTUAL ImageIO decode per row in the
    // per-partition batch shape, then per-channel raster means. PNG is
    // lossless on 8-bit RGB, so the oracle replays the features straight
    // from the pixel formula — the decode is verified end-to-end: any
    // codec corruption, channel swap, or dimension bug hash-mismatches.
    "q123_image_decode" -> ((s, dir) => {
      val media = Multimodal.syntheticPngFrame(
        t(s, dir, "documents").select("doc_id"), "doc_id")
      Multimodal.decodeImages(media).toDF()
        .select(col("media_id"), col("width"), col("height"),
          roundz(col("mean_r"), 4).as("mean_r"),
          roundz(col("mean_g"), 4).as("mean_g"),
          roundz(col("mean_b"), 4).as("mean_b"))
        .orderBy("media_id")
    }),
    "q132_audio_decode" -> ((s, dir) => {
      val media = Multimodal.syntheticWavFrame(
        t(s, dir, "documents").select("doc_id"), "doc_id")
      Multimodal.decodeAudio(media).toDF()
        .select(col("media_id"), col("sample_rate"), col("channels"),
          col("n_frames"), col("duration_ms"),
          roundz(col("rms_l"), 4).as("rms_l"),
          roundz(col("rms_r"), 4).as("rms_r"))
        .orderBy("media_id")
    }),
    // Multimodal: binary payload + typed metadata + (stub) decode features
    "q34_multimodal_features" -> ((s, dir) => {
      val media = Multimodal.fakeMediaFrame(t(s, dir, "documents"), "doc_id", "text")
      Multimodal.decodeStub(media).toDF()
        .select(col("media_id"), col("kind"), col("n_bytes"),
          roundz(col("mean_byte"), 4).as("mean_byte"))
        .orderBy("media_id")
    }),
    // The TRAINED quality-classifier rung (CCNet/fastText's slot, above
    // the rule gates q77/q85/q98): 3 batch-perceptron epochs on a seed-
    // labeled slice (doc_id < 500; label = the q77-style rule the model
    // must rediscover from hashed token counts), then ONE map-only
    // corpus scoring pass with the dim+1 integer weights as an array
    // literal. Pure-integer training (no sigmoid/log) is what makes the
    // fit itself — not just the scoring — bit-replayable in DuckDB: the
    // oracle unrolls all three epochs as exact BIGINT folds.
    "q175_quality_clf" -> ((s, dir) => {
      import graft.operators.QualityClassifier
      val d = t(s, dir, "documents")
      val txt = coalesce(col("text"), lit(""))
      val lab = d.filter(col("doc_id") < 500)
        .withColumn("label",
          !txt.contains("slow") && size(split(txt, " ")) >= 30)
      val w = QualityClassifier.trainPerceptron(
        lab, "doc_id", "text", "label", dim = 64, epochs = 3)
      QualityClassifier.score(d, "doc_id", "text", w).orderBy("doc_id")
    }),
  )

  private[graft] def curationOracles: Map[String, String] = Map(
    // q175: the whole TRAINING REPLAYED, not just the scoring — w1 is the
    // all-misclassified first step (w0 = 0), each later epoch joins the
    // margin fold back on the labeled features and adds the misclassified
    // gradient; every value is a BIGINT so the hash compare is exact.
    // Bucketing uses the pmod shape ((h % 64) + 64) % 64 — DuckDB's % keeps
    // sign, Spark's pmod doesn't.
    "q175_quality_clf" -> {
      val h = sqlSpreadHash("tm")
      s"""WITH lab AS MATERIALIZED (
         |  SELECT doc_id, CASE WHEN NOT contains(COALESCE(text, ''), 'slow')
         |         AND len(string_split(COALESCE(text, ''), ' ')) >= 30
         |         THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END AS y
         |  FROM documents WHERE doc_id < 500),
         |ltk AS (SELECT doc_id, $h AS hh FROM (
         |  SELECT doc_id, unnest(string_split(COALESCE(text, ''), ' ')) AS tm
         |  FROM documents WHERE doc_id < 500)),
         |lf AS MATERIALIZED (
         |  SELECT f.doc_id, l.y, f.b, f.c FROM (
         |    SELECT doc_id, CAST(((hh % 64) + 64) % 64 AS INTEGER) AS b,
         |           CAST(COUNT(*) AS BIGINT) AS c
         |    FROM ltk GROUP BY 1, 2
         |    UNION ALL SELECT doc_id, 64, 1 FROM lab) f
         |  JOIN lab l USING (doc_id)),
         |w1 AS MATERIALIZED (
         |  SELECT b, CAST(SUM(y * c) AS BIGINT) AS w FROM lf GROUP BY b),
         |m1 AS (SELECT lf.doc_id, lf.y, SUM(lf.c * COALESCE(w1.w, 0)) AS m
         |       FROM lf LEFT JOIN w1 USING (b) GROUP BY 1, 2),
         |g2 AS (SELECT lf.b, CAST(SUM(lf.y * lf.c) AS BIGINT) AS g
         |       FROM lf JOIN m1 USING (doc_id) WHERE m1.y * m1.m <= 0
         |       GROUP BY lf.b),
         |w2 AS MATERIALIZED (
         |  SELECT w1.b, w1.w + COALESCE(g2.g, 0) AS w
         |  FROM w1 LEFT JOIN g2 USING (b)),
         |m2 AS (SELECT lf.doc_id, lf.y, SUM(lf.c * COALESCE(w2.w, 0)) AS m
         |       FROM lf LEFT JOIN w2 USING (b) GROUP BY 1, 2),
         |g3 AS (SELECT lf.b, CAST(SUM(lf.y * lf.c) AS BIGINT) AS g
         |       FROM lf JOIN m2 USING (doc_id) WHERE m2.y * m2.m <= 0
         |       GROUP BY lf.b),
         |w3 AS MATERIALIZED (
         |  SELECT w2.b, w2.w + COALESCE(g3.g, 0) AS w
         |  FROM w2 LEFT JOIN g3 USING (b)),
         |ctk AS (SELECT doc_id, $h AS hh FROM (
         |  SELECT doc_id, unnest(string_split(COALESCE(text, ''), ' ')) AS tm
         |  FROM documents)),
         |cf AS (SELECT doc_id, CAST(((hh % 64) + 64) % 64 AS INTEGER) AS b,
         |              CAST(COUNT(*) AS BIGINT) AS c
         |       FROM ctk GROUP BY 1, 2
         |       UNION ALL SELECT doc_id, 64, 1 FROM documents),
         |sc AS (SELECT cf.doc_id, SUM(cf.c * COALESCE(w3.w, 0)) AS s
         |       FROM cf LEFT JOIN w3 USING (b) GROUP BY 1)
         |SELECT doc_id, CAST(s AS BIGINT) AS clf_score, s > 0 AS kept,
         |       CASE WHEN s > 0 THEN 'kept' ELSE 'clf_negative' END AS reason
         |FROM sc ORDER BY doc_id""".stripMargin
    },
    "q16_dedup_exact" ->
      """SELECT (SELECT COUNT(DISTINCT text) FROM documents) AS n_distinct,
        |(SELECT COUNT(*) FROM (SELECT text, MIN(doc_id) FROM documents GROUP BY text)) AS n_after""".stripMargin,
    // q95: same in-engine blocklist rule (spread-hash of source mod 5),
    // same authority-extraction regex
    "q95_domain_blocklist" ->
      s"""WITH d AS (SELECT doc_id, source,
         |  'https://' || source || '.example.com/doc/' || CAST(doc_id AS VARCHAR) AS url
         |  FROM documents),
         |bl AS (SELECT source || '.example.com' AS domain
         |       FROM (SELECT DISTINCT source FROM documents)
         |       WHERE ${sqlSpreadHash("source")} % 5 < 2),
         |x AS (SELECT doc_id,
         |      regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1) AS domain
         |      FROM d)
         |SELECT doc_id, domain FROM x
         |WHERE domain NOT IN (SELECT domain FROM bl) ORDER BY doc_id""".stripMargin,
    // q97: same spread-hash bucketing, same division order
    // (s/T/n left-assoc), +0.0 normalizes IEEE -0.0 after ROUND
    "q97_target_affinity" ->
      s"""WITH tok AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS t,
         |             ${sqlSpreadHash("tk")} % 256 AS b
         |             FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tk
         |                   FROM documents)),
         |bt AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS cr, CAST(SUM(t) AS BIGINT) AS ct
         |       FROM tok GROUP BY b),
         |tot AS (SELECT CAST(SUM(cr) AS BIGINT) AS tr, CAST(SUM(ct) AS BIGINT) AS tt FROM bt),
         |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |               CAST(SUM(bt.ct) AS BIGINT) AS s_t, CAST(SUM(bt.cr) AS BIGINT) AS s_r
         |        FROM tok JOIN bt USING (b) GROUP BY doc_id)
         |SELECT d.doc_id AS doc_id, COALESCE(agg.n_tokens, 0) AS n_tokens,
         |       agg.s_t AS s_t, agg.s_r AS s_r,
         |       ROUND(CAST(agg.s_t AS DOUBLE) / tot.tt / agg.n_tokens
         |             - CAST(agg.s_r AS DOUBLE) / tot.tr / agg.n_tokens, 6) + 0.0 AS affinity
         |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id CROSS JOIN tot
         |ORDER BY doc_id""".stripMargin,
    // q99: identical plant, identical (h1, h2) line key (spread hash of
    // the line and its reverse), keep-first via lexicographic struct MIN,
    // reconstruction by indexing the split list with the sorted kept idxs
    "q99_line_dedup" ->
      s"""WITH p AS (SELECT doc_id,
         |    regexp_replace(text, '((?:\\S+ ){2}\\S+) ', '\\1' || chr(10), 'g') AS pt
         |    FROM documents),
         |l AS (SELECT doc_id, unnest(list_transform(string_split(pt, chr(10)),
         |             (x, i) -> {'idx': i - 1, 'line': x}), recursive := true)
         |      FROM p),
         |k AS (SELECT doc_id, idx, ${sqlSpreadHash("line")} AS h1,
         |             ${sqlSpreadHash("reverse(line)")} AS h2 FROM l),
         |kp AS (SELECT MIN({'d': doc_id, 'i': idx}) AS m FROM k GROUP BY h1, h2),
         |ag AS (SELECT m.d AS doc_id, list_sort(list(m.i)) AS idxs,
         |              CAST(COUNT(*) AS BIGINT) AS n_kept FROM kp GROUP BY m.d)
         |SELECT p.doc_id AS doc_id,
         |  CAST(len(string_split(p.pt, chr(10))) AS BIGINT) AS n_lines,
         |  COALESCE(a.n_kept, 0) AS n_kept,
         |  COALESCE(array_to_string(list_transform(a.idxs,
         |    i -> string_split(p.pt, chr(10))[i + 1]), chr(10)), '') AS cleaned
         |FROM p LEFT JOIN ag a USING (doc_id) ORDER BY doc_id""".stripMargin,
    // q101: identical plant, identical regex chain in the same order
    // (fragment → tracking+repair → lowercase authority → default ports →
    // trailing slash), keep-first via MIN per canonical form
    "q101_url_canon_dedup" ->
      s"""WITH u AS (SELECT doc_id,
         |    'HTTPS://WWW.Example.COM'
         |    || CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END
         |    || '/doc/' || CAST(doc_id % 100 AS VARCHAR)
         |    || CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&ref=' || source ELSE '' END
         |    || CASE WHEN doc_id % 3 = 0 THEN '#sec' ELSE '' END AS url
         |    FROM documents),
         |t1 AS (SELECT doc_id, regexp_replace(url, '#.*', '') AS x FROM u),
         |t2 AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(x,
         |         '([?&])(?:utm_[A-Za-z0-9_]+|fbclid|gclid)=[^&#]*', '\\1', 'g'),
         |         '([?&])&+', '\\1', 'g'), '[?&]$$', '') AS x FROM t1),
         |t3 AS (SELECT doc_id,
         |         lower(regexp_extract(x, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1))
         |         || regexp_extract(x, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)', 1) AS x FROM t2),
         |t4 AS (SELECT doc_id, regexp_replace(regexp_replace(x,
         |         '^(https://[^/:?#]+):443([/?#].*)?$$', '\\1\\2'),
         |         '^(http://[^/:?#]+):80([/?#].*)?$$', '\\1\\2') AS x FROM t3),
         |c AS (SELECT doc_id,
         |        regexp_replace(x, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]+)/$$', '\\1') AS canon
         |      FROM t4)
         |SELECT MIN(doc_id) AS doc_id, canon FROM c GROUP BY canon ORDER BY doc_id""".stripMargin,
    // q102: gram hashes are the per-gram positional polynomial; the
    // rightmost minimal of window i is found via list_position on the
    // REVERSED slice (first hit in reverse = rightmost in order); short
    // docs collapse to one window of all grams (win = min(w, n_grams))
    "q102_winnow_fingerprints" ->
      s"""WITH g AS (SELECT doc_id, list_transform(range(length(text) - 12 + 1),
         |    i -> list_sum(list_transform(range(12),
         |         j -> ascii(substr(text, CAST(i + j + 1 AS INTEGER), 1))
         |              * (((j * 131) % 997) + 1)))) AS gh
         |    FROM documents),
         |w2 AS (SELECT doc_id, gh, LEAST(4, len(gh)) AS win FROM g),
         |f AS (SELECT doc_id, CASE WHEN len(gh) = 0 THEN CAST([] AS BIGINT[])
         |        ELSE list_sort(list_distinct(list_transform(
         |          range(len(gh) - win + 1), i ->
         |            CAST(gh[i + win - list_position(list_reverse(gh[i+1:i+win]),
         |                 list_min(gh[i+1:i+win])) + 1] AS BIGINT)))) END AS fps
         |      FROM w2)
         |SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fps,
         |       COALESCE(array_to_string(fps, ','), '') AS fps
         |FROM f ORDER BY doc_id""".stripMargin,
    // q104: the q102 fingerprint chain over the sampled docs, then
    // list_intersect sizes on a.id < b.id pairs
    "q104_winnow_overlap" ->
      s"""WITH g AS (SELECT doc_id, list_transform(range(length(text) - 12 + 1),
         |    i -> list_sum(list_transform(range(12),
         |         j -> ascii(substr(text, CAST(i + j + 1 AS INTEGER), 1))
         |              * (((j * 131) % 997) + 1)))) AS gh
         |    FROM documents WHERE doc_id % 50 = 0 AND doc_id < 5000),
         |w2 AS (SELECT doc_id, gh, LEAST(4, len(gh)) AS win FROM g),
         |f AS (SELECT doc_id, CASE WHEN len(gh) = 0 THEN CAST([] AS BIGINT[])
         |        ELSE list_sort(list_distinct(list_transform(
         |          range(len(gh) - win + 1), i ->
         |            CAST(gh[i + win - list_position(list_reverse(gh[i+1:i+win]),
         |                 list_min(gh[i+1:i+win])) + 1] AS BIGINT)))) END AS fps
         |      FROM w2)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |       CAST(len(list_intersect(a.fps, b.fps)) AS BIGINT) AS n_shared
         |FROM f a JOIN f b ON a.doc_id < b.doc_id
         |WHERE len(list_intersect(a.fps, b.fps)) >= 1
         |ORDER BY id_a, id_b""".stripMargin,
    // q109: the twin construction replayed digit-for-digit (integer LCG
    // jitter, same double op order, REAL cast), then q82's multi-table
    // bucket→pair→cosine chain at the near-dup threshold
    "q109_planted_neardup" -> {
      val sim = s"${sqlDot("a.e", "c.e")} / (sqrt(${sqlDot("a.e", "a.e")}) * sqrt(${sqlDot("c.e", "c.e")}))"
      s"""WITH base AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 500),
         |twin AS (SELECT b.vec_id + 10000000 AS vec_id,
         |           list_transform(range(64), j -> CAST(
         |             CAST(b.embedding[j+1] AS DOUBLE) * (1.0 + 0.4 *
         |               (CAST((1103515245*(b.vec_id*64 + j) + 12345) % 2001
         |                     - 1000 AS DOUBLE) / 1000.0))
         |             AS REAL)) AS embedding
         |         FROM base b),
         |u AS (SELECT * FROM base UNION ALL SELECT * FROM twin),
         |b AS (SELECT vec_id AS id, embedding AS e, t.tbl AS tbl,
         |             ${sqlSrpBucket("embedding", off = "t.tbl*8")} AS bucket
         |      FROM u, (SELECT range AS tbl FROM range(4)) t),
         |ok AS (SELECT tbl, bucket FROM b GROUP BY tbl, bucket
         |       HAVING COUNT(*) BETWEEN 2 AND 1000),
         |bb AS (SELECT b.id, b.e, b.tbl, b.bucket FROM b JOIN ok USING (tbl, bucket)),
         |p AS (SELECT DISTINCT a.id AS id_a, c.id AS id_b, $sim AS sim
         |      FROM bb a JOIN bb c ON a.tbl = c.tbl AND a.bucket = c.bucket AND a.id < c.id)
         |SELECT id_a, id_b, ROUND(sim, 4) + 0.0 AS sim FROM p
         |WHERE sim >= 0.9 ORDER BY id_a, id_b""".stripMargin
    },
    "q28_jaccard_pairs" ->
      """WITH s AS (SELECT doc_id AS id, list_distinct(string_split(text, ' ')) AS toks
        |           FROM documents WHERE doc_id % 100 = 0),
        |p AS (SELECT a.id AS id_a, b.id AS id_b,
        |        CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |        / (len(a.toks) + len(b.toks) - CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)) AS sim
        |      FROM s a, s b WHERE a.id < b.id)
        |SELECT id_a, id_b, ROUND(sim, 4) + 0.0 AS sim FROM p ORDER BY id_a, id_b""".stripMargin,
    "q29_embedding_neardup" -> {
      val sim = s"${sqlDot("a.e", "b.e")} / (sqrt(${sqlDot("a.e", "a.e")}) * sqrt(${sqlDot("b.e", "b.e")}))"
      s"""WITH s AS (SELECT vec_id AS id, embedding AS e FROM embeddings WHERE vec_id % 10 = 0),
         |p AS (SELECT a.id AS id_a, b.id AS id_b, $sim AS sim FROM s a, s b WHERE a.id < b.id)
         |SELECT id_a, id_b, ROUND(sim, 4) + 0.0 AS sim FROM p ORDER BY id_a, id_b""".stripMargin
    },
    // q61: the LSH-bucketed embedding near-dup — bucket assignment (q33's
    // arithmetic), hot-bucket exclusion, in-bucket pairs, cosine >= t.
    "q61_embedding_neardup_lsh" -> {
      val sim = s"${sqlDot("a.e", "c.e")} / (sqrt(${sqlDot("a.e", "a.e")}) * sqrt(${sqlDot("c.e", "c.e")}))"
      s"""WITH b AS (SELECT vec_id AS id, embedding AS e,
         |             ${sqlSrpBucket("embedding")} AS bucket FROM embeddings),
         |ok AS (SELECT bucket FROM b GROUP BY bucket HAVING COUNT(*) BETWEEN 2 AND 1000),
         |bb AS (SELECT b.id, b.e, b.bucket FROM b JOIN ok USING (bucket)),
         |p AS (SELECT a.id AS id_a, c.id AS id_b, $sim AS sim
         |      FROM bb a JOIN bb c ON a.bucket = c.bucket AND a.id < c.id)
         |SELECT id_a, id_b, ROUND(sim, 4) + 0.0 AS sim FROM p
         |WHERE sim >= 0.2 ORDER BY id_a, id_b""".stripMargin
    },
    "q113_autosized_lsh" -> {
      val sim = s"${sqlDot("a.e", "c.e")} / (sqrt(${sqlDot("a.e", "a.e")}) * sqrt(${sqlDot("c.e", "c.e")}))"
      // nb replayed INTEGER-EXACT from COUNT(*): ceil-div via (+49)//50,
      // bit-length via the smallest k with 2^k >= buckets (shift compare,
      // no log — the libm-ceil trap nBitsFor's scaladoc documents)
      s"""WITH nbv AS (SELECT ((COUNT(*) + 49) // 50) AS buckets FROM embeddings),
         |nbx AS (SELECT CASE WHEN buckets <= 2 THEN 1
         |               ELSE (SELECT MIN(k) FROM range(1,63) s(k)
         |                     WHERE (CAST(1 AS BIGINT) << CAST(k AS INT)) >= buckets) END AS nb
         |        FROM nbv),
         |b AS (SELECT vec_id AS id, embedding AS e,
         |        CAST(list_sum(list_transform(range((SELECT nb FROM nbx)), b ->
         |          CASE WHEN list_sum(list_transform(range(64), j ->
         |                 CAST(embedding[j+1] AS DOUBLE)
         |                 * (((1103515245 * (b*64 + j) + 12345) % 2001 - 1000) / 1000.0))) >= 0
         |               THEN CAST(POWER(2, b) AS BIGINT) ELSE 0 END)) AS BIGINT) AS bucket
         |      FROM embeddings),
         |ok AS (SELECT bucket FROM b GROUP BY bucket HAVING COUNT(*) BETWEEN 2 AND 1000),
         |bb AS (SELECT b.id, b.e, b.bucket FROM b JOIN ok USING (bucket)),
         |p AS (SELECT a.id AS id_a, c.id AS id_b, $sim AS sim
         |      FROM bb a JOIN bb c ON a.bucket = c.bucket AND a.id < c.id)
         |SELECT id_a, id_b, ROUND(sim, 4) + 0.0 AS sim, CAST((SELECT nb FROM nbx) AS INT) AS n_bits
         |FROM p WHERE sim >= 0.2 ORDER BY id_a, id_b""".stripMargin
    },
    "q64_neardup_multiprobe" -> {
      val sim = s"${sqlDot("a.e", "c.e")} / (sqrt(${sqlDot("a.e", "a.e")}) * sqrt(${sqlDot("c.e", "c.e")}))"
      // probes=2: side a is unioned with its bit-0-flipped bucket; the
      // occupancy floor drops to 1 (singletons stay reachable), DISTINCT
      // folds pairs found from both endpoints' probe sets
      s"""WITH b AS (SELECT vec_id AS id, embedding AS e,
         |             ${sqlSrpBucket("embedding")} AS bucket FROM embeddings),
         |ok AS (SELECT bucket FROM b GROUP BY bucket HAVING COUNT(*) <= 1000),
         |bb AS (SELECT b.id, b.e, b.bucket FROM b JOIN ok USING (bucket)),
         |pa AS (SELECT id, e, bucket FROM bb
         |       UNION ALL SELECT id, e, xor(bucket, 1) AS bucket FROM bb),
         |p AS (SELECT DISTINCT a.id AS id_a, c.id AS id_b, $sim AS sim
         |      FROM pa a JOIN bb c ON a.bucket = c.bucket AND a.id < c.id)
         |SELECT id_a, id_b, ROUND(sim, 4) + 0.0 AS sim FROM p
         |WHERE sim >= 0.2 ORDER BY id_a, id_b""".stripMargin
    },
    "q82_neardup_multitable" -> {
      val sim = s"${sqlDot("a.e", "c.e")} / (sqrt(${sqlDot("a.e", "a.e")}) * sqrt(${sqlDot("c.e", "c.e")}))"
      // tables=4: each row hashes once per table with the table's own run
      // of the projection sequence (offset tbl*nBits); pairs join within
      // (tbl, bucket), DISTINCT folds pairs co-located in several tables
      // (their sim is the same double on both engines, so it collapses)
      s"""WITH b AS (SELECT vec_id AS id, embedding AS e, t.tbl AS tbl,
         |             ${sqlSrpBucket("embedding", off = "t.tbl*8")} AS bucket
         |           FROM embeddings, (SELECT range AS tbl FROM range(4)) t),
         |ok AS (SELECT tbl, bucket FROM b GROUP BY tbl, bucket
         |       HAVING COUNT(*) BETWEEN 2 AND 1000),
         |bb AS (SELECT b.id, b.e, b.tbl, b.bucket FROM b JOIN ok USING (tbl, bucket)),
         |p AS (SELECT DISTINCT a.id AS id_a, c.id AS id_b, $sim AS sim
         |      FROM bb a JOIN bb c ON a.tbl = c.tbl AND a.bucket = c.bucket AND a.id < c.id)
         |SELECT id_a, id_b, ROUND(sim, 4) + 0.0 AS sim FROM p
         |WHERE sim >= 0.2 ORDER BY id_a, id_b""".stripMargin
    },
    "q68_decontaminate" ->
      """WITH t AS (SELECT doc_id AS id, string_split_regex(text, '\s+') AS toks FROM documents),
        |shl AS (SELECT id, CASE WHEN len(toks) < 8 THEN [array_to_string(toks, ' ')]
        |         ELSE list_transform(range(len(toks) - 7), i -> array_to_string(toks[i+1:i+8], ' ')) END AS shingles
        |        FROM t),
        |ev AS (SELECT DISTINCT unnest(shingles) AS sh FROM shl WHERE id % 97 = 0),
        |cs AS (SELECT id, unnest(shingles) AS sh FROM shl)
        |SELECT DISTINCT id FROM cs JOIN ev USING (sh) ORDER BY id""".stripMargin,
    // NOTE: byte-vs-codepoint parity of mean_byte relies on the fixture
    // text being ASCII (driver-generated, fixed); non-ASCII corpora would
    // need a bytes-based oracle (DuckDB lacks per-byte access on BLOB).
    "q34_multimodal_features" ->
      """SELECT doc_id AS media_id,
        |CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |ROUND(CAST(list_sum(list_transform(range(length(text)),
        |  i -> ascii(substr(text, CAST(i+1 AS INTEGER), 1)))) AS DOUBLE) / length(text), 4) AS mean_byte
        |FROM documents ORDER BY media_id""".stripMargin,
    // q123: the real-PNG decode replayed from the shared pixel formula
    // (PNG is lossless on 8-bit RGB, so decode∘encode = identity and the
    // formula IS the decoded raster). Integer pixel sums are exact in
    // both engines; ONE division by the fixed per-image pixel count
    // before ROUND(4) — group size never grows with the corpus.
    "q123_image_decode" ->
      """WITH px AS (
        |  SELECT d.doc_id, x.i AS x, y.i AS y
        |  FROM documents d
        |  CROSS JOIN (SELECT unnest(range(40)) AS i) x
        |  CROSS JOIN (SELECT unnest(range(16)) AS i) y
        |  WHERE x.i < 16 + (d.doc_id % 4) * 8)
        |SELECT doc_id AS media_id,
        |  CAST(16 + (doc_id % 4) * 8 AS INTEGER) AS width,
        |  CAST(16 AS INTEGER) AS height,
        |  ROUND(CAST(SUM((7 * doc_id + 3 * x + 5 * y) % 256) AS DOUBLE) / COUNT(*), 4) AS mean_r,
        |  ROUND(CAST(SUM((11 * doc_id + 13 * x + y) % 256) AS DOUBLE) / COUNT(*), 4) AS mean_g,
        |  ROUND(CAST(SUM((doc_id + x + 17 * y) % 256) AS DOUBLE) / COUNT(*), 4) AS mean_b
        |FROM px GROUP BY doc_id ORDER BY media_id""".stripMargin,
    // q132: the real-WAV decode replayed from the shared PCM sample
    // formula (PCM in a WAV container is lossless, so the formula IS the
    // decoded signal). Integer sums of squares are exact in both
    // engines; ONE division by the fixed per-clip frame count, then an
    // IEEE sqrt (correctly rounded in both) before ROUND(4). SUM is cast
    // to BIGINT — DuckDB integer SUM lands as HUGEINT/float64 otherwise.
    "q132_audio_decode" ->
      """WITH fr AS (
        |  SELECT d.doc_id, t.i AS t
        |  FROM documents d
        |  CROSS JOIN (SELECT unnest(range(2000)) AS i) t
        |  WHERE t.i < 800 + (d.doc_id % 4) * 400)
        |SELECT doc_id AS media_id,
        |  CAST(8000 AS INTEGER) AS sample_rate,
        |  CAST(2 AS INTEGER) AS channels,
        |  CAST(800 + (doc_id % 4) * 400 AS BIGINT) AS n_frames,
        |  CAST((800 + (doc_id % 4) * 400) // 8 AS BIGINT) AS duration_ms,
        |  ROUND(SQRT(CAST(CAST(SUM(((3 * doc_id + 7 * t) % 2001 - 1000)
        |      * ((3 * doc_id + 7 * t) % 2001 - 1000)) AS BIGINT) AS DOUBLE)
        |    / COUNT(*)), 4) AS rms_l,
        |  ROUND(SQRT(CAST(CAST(SUM(((5 * doc_id + 11 * t) % 2001 - 1000)
        |      * ((5 * doc_id + 11 * t) % 2001 - 1000)) AS BIGINT) AS DOUBLE)
        |    / COUNT(*)), 4) AS rms_r
        |FROM fr GROUP BY doc_id ORDER BY media_id""".stripMargin,
    "q41_stratified_sample" ->
      """WITH r AS (SELECT doc_id, lang,
        |  CAST(row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS INTEGER) AS rn
        |  FROM documents)
        |SELECT doc_id, lang, rn FROM r WHERE rn % 10 = 1 ORDER BY doc_id""".stripMargin,
    "q42_token_packing" ->
      """WITH d AS (SELECT doc_id, lang,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tok FROM documents),
        |c AS (SELECT doc_id, lang, n_tok,
        |  SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM d)
        |SELECT doc_id, lang, CAST((cum - n_tok) // 512 AS BIGINT) AS bin
        |FROM c ORDER BY doc_id""".stripMargin,
    "q58_hash_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE COALESCE(list_sum(list_transform(range(length(CAST(doc_id AS VARCHAR))),
        |  i -> ascii(substr(CAST(doc_id AS VARCHAR), CAST(i + 1 AS INTEGER), 1))
        |       * (((i * 131) % 997) + 1))), 0) % 100 < 20
        |ORDER BY doc_id""".stripMargin,
    // q30/q31: the dedup pipelines use the engine-portable StrHash
    // (graft.expressions.StrHash), so the ENTIRE signature pipeline —
    // shingling, hashing, permutations, banding, bucketing — replays in
    // DuckDB. p = 2^31−1; perm_k = ((k·1103515245 + 12345) mod (p−1)) + 1,
    // ((k·69069 + 362437) mod p), identical constants to Dedup.permA/B.
    "q30_minhash_candidates" -> {
      val P = 2147483647L
      s"""WITH t AS (SELECT doc_id AS id, string_split_regex(text, '\\s+') AS toks
         |           FROM documents WHERE doc_id % 10 = 0),
         |sh AS (SELECT id, unnest(CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
         |         ELSE list_transform(range(len(toks) - 2), i -> array_to_string(toks[i+1:i+3], ' ')) END) AS sh
         |       FROM t),
         |hh AS (SELECT id, COALESCE(list_sum(list_transform(range(length(sh)),
         |         i -> ascii(substr(sh, CAST(i + 1 AS INTEGER), 1)) * (((i * 131) % 997) + 1))), 0) % $P AS h
         |       FROM sh),
         |sig AS (SELECT id, k,
         |          MIN(((((k * 1103515245 + 12345) % ${P - 1}) + 1) * h + ((k * 69069 + 362437) % $P)) % $P) AS m
         |        FROM hh, (SELECT unnest(range(16)) AS k) GROUP BY id, k),
         |band AS (SELECT id, k // 2 AS band, list(m ORDER BY k ASC) AS rws FROM sig GROUP BY id, k // 2),
         |big AS (SELECT band, rws FROM band GROUP BY band, rws HAVING COUNT(*) > 1000),
         |pair AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |         FROM band a JOIN band b ON a.band = b.band AND a.rws = b.rws AND a.id < b.id
         |         LEFT JOIN big ON big.band = a.band AND big.rws = a.rws
         |         WHERE big.band IS NULL)
         |SELECT id_a, id_b FROM pair ORDER BY id_a, id_b""".stripMargin
    },
    "q31_simhash" -> {
      val P = 2147483647L
      s"""WITH t AS (SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS tk
         |           FROM documents WHERE doc_id % 10 = 0),
         |hh AS (SELECT doc_id, COALESCE(list_sum(list_transform(range(length(tk)),
         |         i -> ascii(substr(tk, CAST(i + 1 AS INTEGER), 1)) * (((i * 131) % 997) + 1))), 0) % $P AS h
         |       FROM t),
         |b AS (SELECT doc_id, j,
         |        SUM(CASE WHEN (((((j * 1103515245 + 12345) % ${P - 1}) + 1) * h + ((j * 69069 + 362437) % $P)) % $P) * 2 >= $P
         |            THEN 1 ELSE -1 END) AS s
         |      FROM hh, (SELECT unnest(range(64)) AS j) GROUP BY doc_id, j),
         |v AS (SELECT doc_id,
         |        SUM(CASE WHEN s > 0 THEN
         |          CASE WHEN j = 63 THEN -9223372036854775808 ELSE (CAST(1 AS BIGINT) << CAST(j AS INTEGER)) END
         |          ELSE 0 END) AS sh
         |      FROM b GROUP BY doc_id)
         |SELECT doc_id, CAST(sh AS BIGINT) AS simhash FROM v ORDER BY doc_id""".stripMargin
    },
    // q54: replays the WHOLE near-dedup pipeline — exact pre-collapse
    // (text groups fold to their min id; the other members drop
    // unconditionally), then signatures, banding, bucket join, Jaccard
    // verification (exact: integer set sizes, one IEEE division on both
    // engines), keep-min-id anti join. The collapse is replayed so the
    // oracle matches the implementation's cap semantics on ANY data, not
    // only on corpora whose buckets stay under maxBucketSize.
    "q54_near_dedup" -> {
      val P = 2147483647L
      s"""WITH rep AS (SELECT MIN(doc_id) AS id, text FROM documents
         |             WHERE text IS NOT NULL GROUP BY text),
         |nonrep AS (SELECT d.doc_id AS id FROM documents d
         |           JOIN rep r ON d.text = r.text WHERE d.doc_id <> r.id),
         |t AS (SELECT id, string_split_regex(text, '\\s+') AS toks FROM rep),
         |shl AS (SELECT id, CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
         |         ELSE list_transform(range(len(toks) - 2), i -> array_to_string(toks[i+1:i+3], ' ')) END AS shingles
         |        FROM t),
         |sh AS (SELECT id, unnest(shingles) AS sh FROM shl),
         |hh AS (SELECT id, COALESCE(list_sum(list_transform(range(length(sh)),
         |         i -> ascii(substr(sh, CAST(i + 1 AS INTEGER), 1)) * (((i * 131) % 997) + 1))), 0) % $P AS h
         |       FROM sh),
         |sig AS (SELECT id, k,
         |          MIN(((((k * 1103515245 + 12345) % ${P - 1}) + 1) * h + ((k * 69069 + 362437) % $P)) % $P) AS m
         |        FROM hh, (SELECT unnest(range(16)) AS k) GROUP BY id, k),
         |band AS (SELECT id, k // 2 AS band, list(m ORDER BY k ASC) AS rws FROM sig GROUP BY id, k // 2),
         |big AS (SELECT band, rws FROM band GROUP BY band, rws HAVING COUNT(*) > 1000),
         |pair AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |         FROM band a JOIN band b ON a.band = b.band AND a.rws = b.rws AND a.id < b.id
         |         LEFT JOIN big ON big.band = a.band AND big.rws = a.rws
         |         WHERE big.band IS NULL),
         |ds AS (SELECT id, list_distinct(shingles) AS dsh FROM shl),
         |drp AS (SELECT DISTINCT id_b AS id FROM pair
         |        JOIN ds x ON x.id = id_a JOIN ds y ON y.id = id_b
         |        WHERE CAST(len(list_intersect(x.dsh, y.dsh)) AS DOUBLE)
         |              / (len(x.dsh) + len(y.dsh) - len(list_intersect(x.dsh, y.dsh))) >= 0.7
         |        UNION SELECT id FROM nonrep)
         |SELECT doc_id FROM documents LEFT JOIN drp ON doc_id = drp.id
         |WHERE drp.id IS NULL ORDER BY doc_id""".stripMargin
    },
    // q92: the cross-frame minhash/banding chain replayed per side (the
    // q54 machinery with batch/corpus sources), exact precedence over
    // near, the matched-bucket cap mirrored
    "q92_ingest_dedup" -> {
      val P = 2147483647L
      def side(n: String, pred: String) =
        s"""${n}_t AS (SELECT doc_id AS id, string_split_regex(text, '\\s+') AS toks
           |           FROM documents WHERE $pred),
           |${n}_shl AS (SELECT id, CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
           |         ELSE list_transform(range(len(toks) - 2), i -> array_to_string(toks[i+1:i+3], ' ')) END AS shingles
           |        FROM ${n}_t),
           |${n}_sh AS (SELECT id, unnest(shingles) AS sh FROM ${n}_shl),
           |${n}_hh AS (SELECT id, COALESCE(list_sum(list_transform(range(length(sh)),
           |         i -> ascii(substr(sh, CAST(i + 1 AS INTEGER), 1)) * (((i * 131) % 997) + 1))), 0) % $P AS h
           |       FROM ${n}_sh),
           |${n}_sig AS (SELECT id, k,
           |          MIN(((((k * 1103515245 + 12345) % ${P - 1}) + 1) * h + ((k * 69069 + 362437) % $P)) % $P) AS m
           |        FROM ${n}_hh, (SELECT unnest(range(16)) AS k) GROUP BY id, k),
           |${n}_band AS (SELECT id, k // 2 AS band, list(m ORDER BY k ASC) AS rws FROM ${n}_sig GROUP BY id, k // 2),
           |${n}_ds AS (SELECT id, list_distinct(shingles) AS dsh FROM ${n}_shl)""".stripMargin
      s"""WITH ${side("b", "doc_id % 5 = 0")},
         |${side("c", "doc_id % 5 <> 0")},
         |ex AS (SELECT DISTINCT b.doc_id AS bid FROM documents b JOIN documents c
         |       ON b.text = c.text AND b.doc_id % 5 = 0 AND c.doc_id % 5 <> 0),
         |big AS (SELECT c.band, c.rws FROM c_band c
         |        JOIN (SELECT DISTINCT band, rws FROM b_band) bb
         |          ON c.band = bb.band AND c.rws = bb.rws
         |        GROUP BY c.band, c.rws HAVING COUNT(*) > 1000),
         |pair AS (SELECT DISTINCT c.id AS cid, b.id AS bid
         |         FROM c_band c JOIN b_band b ON c.band = b.band AND c.rws = b.rws
         |         LEFT JOIN big ON big.band = c.band AND big.rws = c.rws
         |         WHERE big.band IS NULL),
         |near AS (SELECT DISTINCT bid FROM pair
         |         JOIN c_ds x ON x.id = cid JOIN b_ds y ON y.id = bid
         |         WHERE CAST(len(list_intersect(x.dsh, y.dsh)) AS DOUBLE)
         |               / (len(x.dsh) + len(y.dsh) - len(list_intersect(x.dsh, y.dsh))) >= 0.7)
         |SELECT d.doc_id AS doc_id,
         |       CASE WHEN ex.bid IS NOT NULL THEN 'dup_exact'
         |            WHEN near.bid IS NOT NULL THEN 'dup_near'
         |            ELSE 'kept' END AS verdict
         |FROM documents d LEFT JOIN ex ON ex.bid = d.doc_id
         |LEFT JOIN near ON near.bid = d.doc_id
         |WHERE d.doc_id % 5 = 0 ORDER BY doc_id""".stripMargin
    },
    // q86: the seeded-cell assignment replayed (q32's `c`/`d`/`a` CTEs),
    // then SemDeDup's keep rule — drop iff a smaller-id cell-mate reaches
    // cosine sim 0.3 (sim = 1 − the cosine DISTANCE the helper builds).
    // The cell count replays Dedup.cellsFor's integer-only dial from
    // COUNT(*) (q148 discipline) — the oracle sizes cells WITH the corpus
    // instead of pinning 16 (r12's scale-weak posture: within-cell pair
    // work is occupancy², so pinned cells are quadratic in growth)
    "q86_semdedup" ->
      s"""WITH dial AS MATERIALIZED (
         |  SELECT CAST(LEAST(65536, GREATEST(16, COUNT(*) // 250)) AS INTEGER) AS nc
         |  FROM embeddings),
         |c AS MATERIALIZED (SELECT CAST(vec_id AS INTEGER) AS cell, embedding AS ce
         |           FROM embeddings WHERE vec_id BETWEEN 0 AND (SELECT nc FROM dial) - 1),
         |d AS (SELECT e.vec_id AS vec_id, e.embedding AS embedding, c.cell AS cell,
         |             ${sqlL2("e.embedding", "c.ce")} AS cd
         |      FROM embeddings e, c),
         |a AS MATERIALIZED (SELECT vec_id, embedding, cell FROM
         |        (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cd, cell) AS rn FROM d)
         |      WHERE rn = 1),
         |drops AS (SELECT DISTINCT x.vec_id AS vec_id FROM a x JOIN a y
         |          ON x.cell = y.cell AND y.vec_id < x.vec_id
         |          WHERE (1 - (${sqlCos("x.embedding", "y.embedding")})) >= 0.3)
         |SELECT a.vec_id AS vec_id, a.cell AS cell,
         |       (SELECT nc FROM dial) AS nc FROM a
         |WHERE NOT EXISTS (SELECT 1 FROM drops WHERE drops.vec_id = a.vec_id)
         |ORDER BY vec_id""".stripMargin,
    // q88: eval side = label 0 capped to the first 500 ids (fixed-size
    // benchmark suite), corpus side = the rest; per-corpus-row hit count
    // and max similarity against any eval vector
    "q88_decontaminate_embedding" ->
      s"""WITH ev AS (SELECT embedding AS ev FROM embeddings
         |            WHERE label = 0 AND vec_id < 500),
         |hits AS (SELECT e.vec_id AS vec_id,
         |                (1 - (${sqlCos("e.embedding", "ev.ev")})) AS sim
         |         FROM embeddings e, ev WHERE e.label <> 0),
         |flagged AS (SELECT vec_id, sim FROM hits WHERE sim >= 0.3)
         |SELECT vec_id, COUNT(*) AS n_eval_hits, ROUND(MAX(sim), 4) + 0.0 AS max_sim
         |FROM flagged GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    "q71_source_mixture" ->
      s"""WITH d AS (SELECT doc_id, source,
         |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
         |           FROM documents),
         |tot AS (SELECT source, CAST(SUM(n_tok) AS DOUBLE) AS tot FROM d GROUP BY source),
         |r AS (SELECT source, LEAST(1.0, 2000.0 * (CASE source WHEN 'src0' THEN 0.5
         |        WHEN 'src1' THEN 0.3 WHEN 'src2' THEN 0.2 ELSE 0.0 END) / tot) AS rate
         |      FROM tot)
         |SELECT d.doc_id AS doc_id, d.source AS source, ROUND(r.rate, 4) + 0.0 AS rate
         |FROM d JOIN r ON d.source = r.source
         |WHERE ${sqlSpreadHash("CAST(d.doc_id AS VARCHAR)")} % 1000000 < r.rate * 1e6
         |ORDER BY doc_id""".stripMargin,
    // q90: the temperature-rate chain replayed — integral token totals,
    // IEEE sqrt weights, decimal-summed normalizer, then the same
    // budget·(w/wsum)/tot parenthesization as the Spark side
    "q90_temperature_mixture" ->
      s"""WITH d AS (SELECT doc_id, source,
         |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
         |           FROM documents),
         |tot AS (SELECT source, CAST(SUM(n_tok) AS DOUBLE) AS tot FROM d GROUP BY source),
         |ws AS (SELECT CAST(SUM(CAST(sqrt(tot) AS DECIMAL(38,18))) AS DOUBLE) AS wsum FROM tot),
         |r AS (SELECT source,
         |        CASE WHEN sqrt(tot) = 0.0 OR wsum = 0.0 THEN 0.0
         |             ELSE LEAST(1.0, 2000.0 * (sqrt(tot) / wsum) / tot) END AS rate
         |      FROM tot, ws)
         |SELECT d.doc_id AS doc_id, d.source AS source, ROUND(r.rate, 4) + 0.0 AS rate
         |FROM d JOIN r ON d.source = r.source
         |WHERE ${sqlSpreadHash("CAST(d.doc_id AS VARCHAR)")} % 1000000 < r.rate * 1e6
         |ORDER BY doc_id""".stripMargin,
    // q91: same spread hash over the GROUP key; thresholds are the very
    // doubles the Scala side folded (spliced, not re-derived in SQL)
    "q91_group_split" ->
      s"""WITH h AS (SELECT doc_id, source,
         |             ${sqlSpreadHash("source")} % 1000000 AS hh FROM documents)
         |SELECT doc_id, source,
         |       CASE WHEN hh < ${0.6 * 1e6} THEN 'train'
         |            WHEN hh < ${(0.6 + 0.2) * 1e6} THEN 'val'
         |            ELSE 'test' END AS split
         |FROM h ORDER BY doc_id""".stripMargin,
    "q72_reshard" ->
      s"""WITH h AS (SELECT doc_id, ${sqlSpreadHash("CAST(doc_id AS VARCHAR)")} AS hh
         |           FROM documents)
         |SELECT doc_id, CAST(hh % 8 AS INTEGER) AS shard,
         |       CAST(row_number() OVER (PARTITION BY hh % 8 ORDER BY hh, doc_id) AS INTEGER) AS pos
         |FROM h ORDER BY shard, pos""".stripMargin,
    // q84: the packing layout replayed — same spread hash + per-shard
    // running token sum; integral // division, HUGEINT sums cast back
    "q84_sequence_packing" ->
      s"""WITH n AS (SELECT doc_id,
         |             CAST(len(string_split(COALESCE(text, ''), ' ')) AS BIGINT) AS nt,
         |             ${sqlSpreadHash("CAST(doc_id AS VARCHAR)")} AS hh
         |           FROM documents),
         |c AS (SELECT CAST(hh % 8 AS INTEGER) AS shard, nt,
         |             CAST(SUM(nt) OVER (PARTITION BY hh % 8 ORDER BY hh, doc_id
         |                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         |      FROM n)
         |SELECT shard, CAST((cum - nt) // 2048 AS BIGINT) AS seq,
         |       COUNT(*) AS n_docs, CAST(SUM(nt) AS BIGINT) AS seq_tokens
         |FROM c GROUP BY 1, 2 ORDER BY shard, seq""".stripMargin,
    "q73_duplicate_passages" ->
      """WITH t AS (SELECT doc_id AS id, string_split_regex(text, '\s+') AS toks FROM documents),
        |sh AS (SELECT DISTINCT id, unnest(CASE WHEN len(toks) < 5 THEN [array_to_string(toks, ' ')]
        |         ELSE list_transform(range(len(toks) - 4), i -> array_to_string(toks[i+1:i+5], ' ')) END) AS passage
        |       FROM t),
        |rec AS (SELECT passage, COUNT(DISTINCT id) AS n_docs FROM sh
        |        GROUP BY passage HAVING COUNT(DISTINCT id) >= 2)
        |SELECT sh.id AS doc_id, COUNT(*) AS n_dup_passages, MAX(rec.n_docs) AS max_spread
        |FROM sh JOIN rec ON sh.passage = rec.passage
        |GROUP BY sh.id ORDER BY doc_id""".stripMargin,
    "q75_cluster_sample" ->
      s"""WITH c AS (SELECT CAST(vec_id AS INTEGER) AS cell, embedding AS ce
         |           FROM embeddings WHERE vec_id BETWEEN 0 AND 7),
         |d AS (SELECT e.vec_id AS vec_id, c.cell AS cell, ${sqlL2("e.embedding", "c.ce")} AS cd
         |      FROM embeddings e, c),
         |a AS (SELECT vec_id, cell FROM
         |        (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cd, cell) AS rn FROM d)
         |      WHERE rn = 1),
         |h AS (SELECT vec_id, cell, ${sqlSpreadHash("CAST(vec_id AS VARCHAR)")} AS hh FROM a),
         |s AS (SELECT vec_id, cell,
         |        row_number() OVER (PARTITION BY cell ORDER BY hh, vec_id) AS rn FROM h)
         |SELECT vec_id, cell FROM s WHERE rn <= 10 ORDER BY vec_id""".stripMargin,
    // q76: q61's pair pipeline, then connected components as a recursive
    // reachability closure — cluster = LEAST(self, min reachable id)
    "q76_dup_clusters" -> {
      val sim = s"${sqlDot("a.e", "c.e")} / (sqrt(${sqlDot("a.e", "a.e")}) * sqrt(${sqlDot("c.e", "c.e")}))"
      s"""WITH RECURSIVE b AS (SELECT vec_id AS id, embedding AS e,
         |             ${sqlSrpBucket("embedding")} AS bucket FROM embeddings),
         |ok AS (SELECT bucket FROM b GROUP BY bucket HAVING COUNT(*) BETWEEN 2 AND 1000),
         |bb AS (SELECT b.id, b.e, b.bucket FROM b JOIN ok USING (bucket)),
         |p AS (SELECT a.id AS id_a, c.id AS id_b FROM bb a
         |      JOIN bb c ON a.bucket = c.bucket AND a.id < c.id
         |      WHERE $sim >= 0.2),
         |e AS (SELECT id_a AS s, id_b AS t FROM p UNION SELECT id_b, id_a FROM p),
         |reach(s, t) AS (SELECT s, t FROM e
         |                UNION SELECT r.s, e.t FROM reach r JOIN e ON r.t = e.s)
         |SELECT s AS vec_id, LEAST(s, MIN(t)) AS cluster FROM reach
         |GROUP BY s ORDER BY vec_id""".stripMargin
    },
    // q96: the q76 component chain (same LSH buckets, same recursive
    // closure) joined to the q25 quality chain (same rounded ratios),
    // argmax via lexicographic struct MAX — ties break to smallest id
    // because the struct carries -id
    "q96_cluster_reps" -> {
      val sim = s"${sqlDot("a.e", "c.e")} / (sqrt(${sqlDot("a.e", "a.e")}) * sqrt(${sqlDot("c.e", "c.e")}))"
      s"""WITH RECURSIVE b AS (SELECT vec_id AS id, embedding AS e,
         |             ${sqlSrpBucket("embedding")} AS bucket FROM embeddings),
         |ok AS (SELECT bucket FROM b GROUP BY bucket HAVING COUNT(*) BETWEEN 2 AND 1000),
         |bb AS (SELECT b.id, b.e, b.bucket FROM b JOIN ok USING (bucket)),
         |p AS (SELECT a.id AS id_a, c.id AS id_b FROM bb a
         |      JOIN bb c ON a.bucket = c.bucket AND a.id < c.id
         |      WHERE $sim >= 0.2),
         |e AS (SELECT id_a AS s, id_b AS t FROM p UNION SELECT id_b, id_a FROM p),
         |reach(s, t) AS (SELECT s, t FROM e
         |                UNION SELECT r.s, e.t FROM reach r JOIN e ON r.t = e.s),
         |memb AS (SELECT s AS id, LEAST(s, MIN(t)) AS cluster FROM reach GROUP BY s),
         |sq AS (SELECT doc_id,
         |  CAST(length(text) AS DOUBLE) AS n_chars,
         |  CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tokens,
         |  CAST(len(list_filter(string_split(text, ' '),
         |       tk -> lower(tk) IN ${sqlInList(enStop)})) AS DOUBLE) AS sw_hits,
         |  CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE) AS n_punct
         |  FROM documents),
         |sr AS (SELECT doc_id,
         |  ROUND(n_punct / n_chars, 4) AS punct_ratio,
         |  ROUND(sw_hits / n_tokens, 4) AS stopword_ratio,
         |  n_tokens FROM sq),
         |score AS (SELECT doc_id,
         |  ROUND((LEAST(n_tokens / 20.0, 1.0) + LEAST(stopword_ratio * 5.0, 1.0)
         |        + CASE WHEN punct_ratio <= 0.2 THEN 1.0 ELSE 0.5 END) / 3.0, 4) AS s
         |  FROM sr),
         |j AS (SELECT m.cluster, m.id,
         |             COALESCE(score.s, CAST('-infinity' AS DOUBLE)) AS s
         |      FROM memb m LEFT JOIN score ON m.id = score.doc_id),
         |a2 AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_members,
         |              MAX({'s': s, 'i': -id}) AS best
         |       FROM j GROUP BY cluster)
         |SELECT cluster, n_members, CAST(-(best.i) AS BIGINT) AS rep_id,
         |       ROUND(best.s, 4) + 0.0 AS rep_score
         |FROM a2 ORDER BY cluster""".stripMargin
    },
  )
}
