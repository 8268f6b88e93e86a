package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),   // near-dup of 1
    (3L, "completely different content about spark engines"),
    (4L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (5L, "another unrelated short text snippet entirely")
  ).toDF("doc_id", "text")

  test("exact dedup keeps min id per text; idempotent") {
    val once = Dedup.exactDedup(docs, Seq("text"), "doc_id")
    assert(once.count() == 4)
    assert(once.select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 3L, 5L))
    val twice = Dedup.exactDedup(once, Seq("text"), "doc_id")
    assert(twice.select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 3L, 5L))
  }

  test("exact dedup keeps exactly one survivor for a NULL key group") {
    val withNulls = Seq((1L, Some("x")), (2L, None), (3L, None), (4L, Some("x")))
      .toDF("doc_id", "text")
    val out = Dedup.exactDedup(withNulls, Seq("text"), "doc_id")
      .select("doc_id").as[Long].collect().toSet
    // null-unsafe semi-join would drop BOTH null rows; null-safe keeps min
    assert(out == Set(1L, 2L))
  }

  test("minHashCandidates rejects non-divisible or degenerate band configs") {
    intercept[IllegalArgumentException] {
      Dedup.minHashCandidates(docs, "doc_id", "text", numHashes = 16, numBands = 5)
    }
    intercept[IllegalArgumentException] {
      Dedup.minHashCandidates(docs, "doc_id", "text", numHashes = 16, numBands = 20)
    }
  }

  test("word shingles: count, content, short-text fallback") {
    val sh = docs.filter(col("doc_id") === 1)
      .select(Dedup.wordShingles(col("text"), 3).as("s")).as[Seq[String]].head()
    assert(sh.length == 7) // 9 tokens -> 7 trigrams
    assert(sh.head == "the quick brown" && sh.last == "the lazy dog")
    val short = Seq("one two").toDF("t")
      .select(Dedup.wordShingles(col("t"), 3).as("s")).as[Seq[String]].head()
    assert(short == Seq("one two"))
  }

  test("minhash signature: fixed length, deterministic, equal for equal text") {
    val sigs = docs.select(col("doc_id"),
        Dedup.minHashSignature(Dedup.wordShingles(col("text"), 3), 16).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sigs.values.forall(_.length == 16))
    assert(sigs(1L) == sigs(4L))          // identical text -> identical signature
    assert(sigs(1L) != sigs(3L))          // different text -> different signature
    val overlap12 = sigs(1L).zip(sigs(2L)).count { case (a, b) => a == b }
    val overlap13 = sigs(1L).zip(sigs(3L)).count { case (a, b) => a == b }
    assert(overlap12 > overlap13)         // near-dup shares more minhashes
  }

  test("relational minHashSignatures matches the lambda form exactly") {
    val lambda = docs.select(col("doc_id").as("id"),
        Dedup.minHashSignature(Dedup.wordShingles(col("text"), 3), 16).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val rel = Dedup.minHashSignatures(docs, "doc_id", "text", 3, 16)
      .as[(Long, Seq[Long])].collect().toMap
    assert(lambda == rel)
  }

  test("minhash LSH candidates include exact and near dups, not unrelated") {
    val cand = Dedup.minHashCandidates(docs, "doc_id", "text",
        shingleSize = 3, numHashes = 16, numBands = 8)
      .as[(Long, Long)].collect().toSet
    assert(cand.contains((1L, 4L)))       // exact dup always collides
    assert(!cand.contains((3L, 5L)))      // unrelated never collides
  }

  test("simhash: equal text -> equal hash; near-dup closer than unrelated") {
    val hs = docs.select(col("doc_id"), Dedup.simHash(split(col("text"), " ")).as("h"))
      .as[(Long, Long)].collect().toMap
    assert(hs(1L) == hs(4L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hs(1L), hs(2L)) < ham(hs(1L), hs(3L)))
  }

  test("hammingDist64 column matches bitCount") {
    val d = Seq((3L, 1L)).toDF("a", "b")
      .select(Dedup.hammingDist64(col("a"), col("b"))).as[Int].head()
    assert(d == 1)
  }

  test("jaccard on token arrays") {
    val j = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
      .select(Dedup.jaccard(col("x"), col("y"))).as[Double].head()
    assert(math.abs(j - 0.5) < 1e-12)     // |{b,c}| / |{a,b,c,d}|
  }

  test("embedding near-dup finds duplicate vectors above threshold") {
    val vecs = Seq((1L, Seq(1f, 0f)), (2L, Seq(1f, 0.01f)), (3L, Seq(0f, 1f)))
      .toDF("id", "vec")
    val pairs = Dedup.embeddingNearDup(vecs, "id", "vec", 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  private lazy val embFixture =
    spark.read.parquet(sf("embeddings")).select(col("vec_id"), col("embedding"))

  test("LSH embedding near-dup = all-pairs result restricted to shared buckets") {
    import graft.operators.Ann
    val lsh = Dedup.embeddingNearDupLsh(embFixture, "vec_id", "embedding",
        minSim = 0.2, dim = 64, nBits = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // ground truth: all-pairs sim join, then keep only same-bucket pairs
    val bk = embFixture.select(col("vec_id"),
      Ann.srpBucket(col("embedding"), 64, 8).as("bucket"))
    val expected = Dedup.embeddingNearDup(embFixture, "vec_id", "embedding", 0.2)
      .join(bk.select(col("vec_id").as("id_a"), col("bucket").as("ba")), Seq("id_a"))
      .join(bk.select(col("vec_id").as("id_b"), col("bucket").as("bb")), Seq("id_b"))
      .filter(col("ba") === col("bb"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh == expected, "bucketed form must equal the bucket-restricted all-pairs form")
    assert(lsh.nonEmpty, "fixture should produce at least one in-bucket pair")
  }

  test("LSH embedding near-dup: multi-probe is a superset of single-probe") {
    val p1 = Dedup.embeddingNearDupLsh(embFixture, "vec_id", "embedding",
        minSim = 0.2, dim = 64, nBits = 8, probes = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val p3 = Dedup.embeddingNearDupLsh(embFixture, "vec_id", "embedding",
        minSim = 0.2, dim = 64, nBits = 8, probes = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(p1.subsetOf(p3), "probing neighbor buckets can only ADD candidate pairs")
    assert(p3.size >= p1.size)
  }

  test("decontamination flags exactly the docs sharing an n-gram with the eval set") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps"),   // contains eval 3-gram
      (2L, "quick brown wolf runs far"),   // shares words but no 3-gram
      (3L, "an entirely different text")).toDF("doc_id", "text")
    val evalSet = Seq("lazy dogs and the quick brown fox of lore").toDF("text")
    val hit = Dedup.contaminated(corpus, "doc_id", "text", evalSet, "text", n = 3)
      .as[Long].collect().toSeq
    assert(hit == Seq(1L), s"only doc 1 shares a 3-gram, got $hit")
  }

  test("LSH embedding near-dup: multi-probe reaches pairs split across singleton buckets") {
    import graft.operators.Ann
    // two near-identical vectors straddling the single SRP hyperplane:
    // each is the SOLE occupant of its bucket, so same-bucket pairing can
    // never see them — only a bit-flip probe can
    val vecs = Seq((1L, Seq(1f, -0.8f)), (2L, Seq(1f, -0.65f))).toDF("id", "v")
    val bks = vecs.select(Ann.srpBucket(col("v"), 2, 1)).as[Long].collect().toSet
    assert(bks.size == 2, s"fixture precondition: vectors must bucket apart, got $bks")
    val p1 = Dedup.embeddingNearDupLsh(vecs, "id", "v",
      minSim = 0.9, dim = 2, nBits = 1, probes = 1)
    assert(p1.count() == 0, "single-probe cannot cross the hyperplane")
    val p2 = Dedup.embeddingNearDupLsh(vecs, "id", "v",
        minSim = 0.9, dim = 2, nBits = 1, probes = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(p2 == Set((1L, 2L)),
      "a singleton-bucket row must still be probe-able from the flipped bucket")
  }

  test("LSH embedding near-dup: hot buckets past maxBucketSize are excluded") {
    // nBits = 1 funnels ~half the corpus into each of 2 buckets
    val capped = Dedup.embeddingNearDupLsh(embFixture, "vec_id", "embedding",
      minSim = -2.0, dim = 64, nBits = 1, maxBucketSize = 10)
    assert(capped.count() == 0, "every bucket exceeds the cap, so no pairs may emerge")
  }

  test("LSH hot-bucket exclusion is never silent: observe fires, audit is exact") {
    import org.apache.spark.sql.Observation
    import graft.operators.Ann
    // TOTAL overflow: every bucket past the cap, result empty. AQE prunes
    // the observed histogram with the empty result, so the observation is
    // allowed to come back WITHOUT the key (indeterminate — documented);
    // the audit job must still report the full mass.
    val n = embFixture.count()
    val obs = Observation()
    Dedup.embeddingNearDupLsh(embFixture, "vec_id", "embedding",
      minSim = -2.0, dim = 64, nBits = 1, maxBucketSize = 10,
      dropObs = Some(obs)).write.mode("overwrite").format("noop").save()
    obs.get.get("excluded_rows") match {
      case None => () // pruned with the empty result: indeterminate, not zero
      case Some(v) => assert(v == n, s"if reported, the metric must be exact: got $v, want $n")
    }
    assert(Dedup.lshExcludedRows(embFixture, "vec_id", "embedding",
      dim = 64, nBits = 1, maxBucketSize = 10) == n,
      "the audit must account for every row when every bucket overflows")
    // PARTIAL overflow: cap chosen from the real histogram so at least one
    // bucket overflows while pairs still survive — the observed plan lives,
    // and the zero-cost metric must equal the audit exactly.
    val sizes = embFixture.select(Ann.srpBucket(col("embedding"), 64, 2).as("b"))
      .groupBy("b").count().as[(Long, Long)].collect().map(_._2).sorted
    assert(sizes.length >= 2 && sizes.head >= 2 && sizes.last > sizes.head,
      s"fixture precondition: want a splittable histogram, got ${sizes.toSeq}")
    val cap = sizes.head.toInt
    val obs2 = Observation()
    val survived = Dedup.embeddingNearDupLsh(embFixture, "vec_id", "embedding",
      minSim = -2.0, dim = 64, nBits = 2, maxBucketSize = cap,
      dropObs = Some(obs2)).count()
    assert(survived > 0, "fixture precondition: the under-cap bucket must yield pairs")
    val audited = Dedup.lshExcludedRows(embFixture, "vec_id", "embedding",
      dim = 64, nBits = 2, maxBucketSize = cap)
    assert(audited > 0, "at least one bucket must overflow the cap")
    assert(obs2.get("excluded_rows") == audited,
      s"live metric ${obs2.get} must equal the audit $audited")
    // no overflow → metric present and zero
    val obs3 = Observation()
    Dedup.embeddingNearDupLsh(embFixture, "vec_id", "embedding",
      minSim = 0.2, dim = 64, nBits = 8, maxBucketSize = 1000,
      dropObs = Some(obs3)).write.mode("overwrite").format("noop").save()
    assert(obs3.get("excluded_rows") == 0L)
  }

  test("minHash hot-bucket exclusion: observe matches the audit when pairs survive") {
    import org.apache.spark.sql.Observation
    // 5 identical 'a' docs overflow cap 3 in all 4 bands (mass 20);
    // 2 identical 'c' docs stay under it and yield a surviving pair, so
    // the observed plan is not pruned
    val docs = ((0 until 5).map(i => (i.toLong, "alpha text shared by every alpha doc")) ++
      Seq((10L, "camel text shared by both camel docs"),
          (11L, "camel text shared by both camel docs"))).toDF("doc_id", "text")
    val obs = Observation()
    val out = Dedup.minHashCandidates(docs, "doc_id", "text",
      maxBucketSize = 3, dropObs = Some(obs))
    assert(out.count() == 1, "the under-cap pair must survive")
    assert(obs.get("excluded_rows") == 20L,
      s"expected 5 docs x 4 bands excluded, got ${obs.get}")
    assert(Dedup.minHashExcludedRows(docs, "doc_id", "text", maxBucketSize = 3) == 20L)
    // total overflow: the audit still answers when the observation can't
    assert(Dedup.minHashExcludedRows(docs.filter(col("doc_id") < 5L), "doc_id", "text",
      maxBucketSize = 1) == 20L)
  }

  test("multi-table LSH recovers planted near-dups single-table SRP misses") {
    import graft.operators.Ann
    // plant a perturbed copy of every fixture vector: v' = v + noise with
    // deterministic per-element noise sized so cos(v, v') ≈ 0.95 — true
    // near-dups, the regime the tables dial exists for
    val base = embFixture.select(col("vec_id"), col("embedding"))
    val planted = base.select((col("vec_id") + 100000L).as("vec_id"),
      transform(col("embedding"),
        (x, j) => x + (pmod(col("vec_id") * 7 + j.cast("long"), lit(9L)) - 4L)
          .cast("float") * lit(0.11f)).as("embedding"))
    val corpus = base.unionByName(planted)
    val exact = Dedup.embeddingNearDup(corpus, "vec_id", "embedding", 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.size >= 20, s"fixture precondition: want >= 20 planted pairs, got ${exact.size}")
    def recallOf(tables: Int): Double = {
      val got = Dedup.embeddingNearDupLsh(corpus, "vec_id", "embedding",
          minSim = 0.9, dim = 64, nBits = 8, tables = tables)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got.subsetOf(exact), "LSH pairs must be a subset of the exact pairs")
      got.intersect(exact).size.toDouble / exact.size
    }
    val r1 = recallOf(1)
    val r8 = recallOf(8)
    assert(r8 > r1, s"8 tables must beat 1 table, got $r1 -> $r8")
    assert(r8 >= 0.9, s"8x8-bit tables should recall >= 0.9 of sim>=0.9 pairs, got $r8")
  }

  test("dupClusters with a reliable checkpoint dir matches the local form") {
    val pairs = Seq((2L, 3L), (3L, 7L), (10L, 11L), (7L, 20L)).toDF("id_a", "id_b")
    val local = Dedup.dupClusters(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    val ckDir = tmpDir("dupck")
    val reliable = Dedup.dupClusters(pairs, "id_a", "id_b",
        checkpointDir = Some(ckDir))
      .as[(Long, Long)].collect().toMap
    assert(reliable == local)
    // the reliable path must actually have written checkpoint state
    val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(ckDir))
    try assert(wrote.filter(java.nio.file.Files.isRegularFile(_)).count() > 0,
      "reliable mode must persist checkpoint files")
    finally wrote.close()
  }

  test("dupClusters: transitive components labeled by min id") {
    val pairs = Seq((2L, 3L), (3L, 7L), (10L, 11L)).toDF("id_a", "id_b")
    val out = Dedup.dupClusters(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(out == Map(2L -> 2L, 3L -> 2L, 7L -> 2L, 10L -> 10L, 11L -> 10L))
  }

  test("dupClusters: a long chain converges to the global min") {
    val pairs = (0 until 12).map(i => (i.toLong, i + 1L)).toDF("id_a", "id_b")
    val out = Dedup.dupClusters(pairs, "id_a", "id_b").as[(Long, Long)].collect()
    assert(out.length == 13 && out.forall(_._2 == 0L))
  }

  test("clusterRepresentatives: best score wins, ties break to smallest id, unscored lose") {
    val members = Seq(
      (10L, 1L), (11L, 1L), (12L, 1L),   // cluster 1: scores 0.5, 0.9, 0.9
      (20L, 2L), (21L, 2L),              // cluster 2: 21 unscored (-inf)
      (30L, 3L)                          // cluster 3: singleton, unscored
    ).toDF("id", "cluster")
    val scored = Seq((10L, 0.5), (11L, 0.9), (12L, 0.9), (20L, 0.1))
      .toDF("doc_id", "score")
    val out = Dedup.clusterRepresentatives(members, "id", "cluster",
        scored, "doc_id", "score")
      .orderBy("cluster").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 3L, 11L), (2L, 2L, 20L), (3L, 1L, 30L)))
    assert(out(0).getDouble(3) == 0.9)
    assert(out(1).getDouble(3) == 0.1)
    // a fully-unscored cluster still yields its smallest id, score -inf
    assert(out(2).getLong(2) == 30L && out(2).getDouble(3).isNegInfinity)
  }

  test("dedupLinesAcrossCorpus: keep-first across docs AND within a doc, order preserved") {
    val docs = Seq(
      (1L, "a\nb\nc"),
      (2L, "b\nd"),        // b seen in doc 1 -> only d survives
      (3L, "c\na\ne\ne"),  // c,a seen; first e kept, second e is a within-doc dup
      (4L, "a")            // fully duplicate doc -> empty, not null
    ).toDF("doc_id", "text")
    val out = Dedup.dedupLinesAcrossCorpus(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq ==
      Seq((1L, 3L, 3L, "a\nb\nc"), (2L, 2L, 1L, "d"),
          (3L, 4L, 1L, "e"), (4L, 1L, 0L, "")))
    // the 64-bit production hash yields the same decisions here
    val out2 = Dedup.dedupLinesAcrossCorpus(docs, "doc_id", "text",
      hash = org.apache.spark.sql.functions.xxhash64(_))
      .orderBy("doc_id").collect()
    assert(out.map(_.toSeq).toSeq == out2.map(_.toSeq).toSeq)
  }

  test("dupClusters: a 300-node chain converges within 30 rounds (adaptive jump)") {
    // propagate-only needs ~diameter rounds — 300 would exhaust maxIter;
    // the pointer jump engaging after round 8 must close it in O(log n)
    val pairs = (0 until 299).map(i => (i.toLong, i + 1L)).toDF("id_a", "id_b")
    val out = Dedup.dupClusters(pairs, "id_a", "id_b", maxIter = 30)
      .as[(Long, Long)].collect()
    assert(out.length == 300 && out.forall(_._2 == 0L))
  }

  test("dupClusters: exhausted rounds fail LOUD with a sample of moving ids") {
    // a 200-node path with the jump disabled by a tiny budget: 4 rounds of
    // propagate-only cannot close diameter 199 — the error must name the
    // budget, the moving-label count, and concrete unconverged ids
    val pairs = (0 until 199).map(i => (i.toLong, i + 1L)).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException] {
      Dedup.dupClusters(pairs, "id_a", "id_b", maxIter = 4).collect()
    }
    assert(e.getMessage.contains("did not converge in 4 rounds"))
    assert(e.getMessage.contains("sample ids:"))
    assert(e.getMessage.matches("(?s).*sample ids: \\d.*"),
      s"expected concrete ids in: ${e.getMessage}")
  }

  test("dedupAgainstCorpus: exact beats near; near needs band match AND jaccard") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely different corpus content about spark engines"),
      (3L, "short text")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog today"),  // exact
      (11L, "the quick brown fox jumps over the lazy dog now"),    // near of 1
      (12L, "entirely novel material nothing like the corpus")     // kept
    ).toDF("doc_id", "text")
    val out = Dedup.dedupAgainstCorpus(batch, corpus, "doc_id", "text",
        minJaccard = 0.5)
      .select("doc_id", "verdict").as[(Long, String)].collect().toMap
    assert(out == Map(10L -> "dup_exact", 11L -> "dup_near", 12L -> "kept"))
  }

  test("dedupAgainstCorpus: an oversized matched bucket is excluded from near") {
    // 1200 corpus docs share one text -> every band bucket they form
    // exceeds maxBucketSize=1000 and the batch near-dup goes undetected
    // (the guard trades that recall for bounded pair work); the EXACT
    // probe is unaffected — a verbatim copy still reports dup_exact
    val corpus = (1 to 1200).map(i => (i.toLong, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (5000L, "alpha beta gamma delta epsilon zeta"),      // exact, cap-immune
      (5001L, "alpha beta gamma delta epsilon eta")        // near, capped away
    ).toDF("doc_id", "text")
    val out = Dedup.dedupAgainstCorpus(batch, corpus, "doc_id", "text",
        minJaccard = 0.3)
      .select("doc_id", "verdict").as[(Long, String)].collect().toMap
    assert(out(5000L) == "dup_exact")
    assert(out(5001L) == "kept")
    // with the cap lifted the same near-dup IS found
    val uncapped = Dedup.dedupAgainstCorpus(batch, corpus, "doc_id", "text",
        minJaccard = 0.3, maxBucketSize = 5000)
      .select("doc_id", "verdict").as[(Long, String)].collect().toMap
    assert(uncapped(5001L) == "dup_near")
  }

  test("semDedup: drops larger-id near-identical cell-mates, keeps representatives") {
    import graft.operators.Ann
    val rows = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
      (2L, Seq(0.99f, 0.01f, 0.0f, 0.0f)), // near-dup of 0, lands in cell 0
      (3L, Seq(0.0f, 0.98f, 0.05f, 0.0f)), // near-dup of 1, lands in cell 1
      (4L, Seq(0.0f, 0.0f, 1.0f, 0.0f))    // own direction: kept wherever it lands
    ).toDF("vec_id", "embedding")
    val m = Ann.buildIvfSeeded(rows, "vec_id", "embedding", Seq(0L, 1L))
    val kept = Dedup.semDedup(m.assigned, "vec_id", "embedding", minSim = 0.9)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(0L, 1L, 4L))
    // idempotent: the survivors have no near-dup cell-mates left
    val again = Dedup.semDedup(
        Ann.assignCells(m.assigned.filter(col("vec_id").isin(kept.toSeq: _*))
          .drop("cell"), "embedding", m.centroids),
        "vec_id", "embedding", minSim = 0.9)
      .select("vec_id").as[Long].collect().toSet
    assert(again == kept)
  }

  test("semDedup requires a cell column") {
    intercept[IllegalArgumentException] {
      Dedup.semDedup(Seq((1L, Seq(1.0f))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", 0.9)
    }
  }

  test("contaminatedEmbeddings: hit count and max sim against the eval set") {
    val corpus = Seq(
      (10L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),  // hits both eval-A vectors
      (11L, Seq(0.0f, 0.0f, 1.0f, 0.0f)),  // orthogonal to all eval rows
      (12L, Seq(0.0f, 0.99f, 0.01f, 0.0f)) // hits eval-B only
    ).toDF("vec_id", "embedding")
    val eval = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Seq(0.99f, 0.05f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f, 0.0f))
    ).toDF("eval_id", "embedding")
    val out = Dedup.contaminatedEmbeddings(corpus, "vec_id", "embedding",
        eval, "embedding", minSim = 0.9)
      .select("id", "n_eval_hits", "max_sim")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(out.map(r => (r._1, r._2)).toSeq == Seq((10L, 2L), (12L, 1L)))
    assert(math.abs(out(0)._3 - 1.0) < 1e-9)        // exact self-similarity
    assert(out(1)._3 > 0.98 && out(1)._3 < 1.0)     // near but not exact
  }

  test("cellsFor sizes centroid cells to hold occupancy flat (integer-only)") {
    import Dedup.cellsFor
    // floor of 16, ceiling, and the n/target interior — all exact integers
    assert(cellsFor(0L) == 16 && cellsFor(500L) == 16 && cellsFor(4000L) == 16)
    assert(cellsFor(20000L) == 80)        // the sf1-replica point: dial moves
    assert(cellsFor(250L * 65536L * 2) == 65536)
    assert(cellsFor(1000L, targetOccupancy = 100L) == 16)
    assert(cellsFor(10000L, targetOccupancy = 100L) == 100)
    // occupancy stays ~constant as n grows 10× (the anti-quadratic property)
    val o1 = 100000L / cellsFor(100000L)
    val o2 = 1000000L / cellsFor(1000000L)
    assert(math.abs(o1 - o2) <= o1 / 4,
      s"occupancy drifted under 10x growth: $o1 vs $o2")
  }

  test("nBitsFor sizes the bucket space to hold expected occupancy flat") {
    // occupancy-targeted widths: 2^nBits buckets >= n / targetBucket
    assert(Dedup.nBitsFor(6000, 100) == 6)    // 60 buckets -> 64
    assert(Dedup.nBitsFor(600000, 100) == 13) // the sf10 q61 case: 8 was x32
    assert(Dedup.nBitsFor(0, 100) == 1)       // floor: degenerate inputs
    assert(Dedup.nBitsFor(1, 100) == 1)
    // monotone in n for fixed target — growing a corpus never narrows it
    val widths = Seq(1L, 10L, 100L, 1000L, 10000L, 100000L, 1000000L)
      .map(Dedup.nBitsFor(_, 50))
    assert(widths == widths.sorted)
    intercept[IllegalArgumentException](Dedup.nBitsFor(10, 0))
  }
}
