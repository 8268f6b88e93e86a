package graft

import org.apache.spark.sql.functions._

import graft.expressions.GraftExtensions
import graft.operators.{Ann, Dedup, Knn}

/** Specs for the engine-portable hash ([[graft.expressions.StrHash]]) and
  * the oracle-checkable operator variants built on it (portable MinHash,
  * relational SimHash, seeded IVF). */
class PortableHashSpec extends SparkTestBase {

  import spark.implicits._

  private def refHash(s: String): Long = {
    var h = 0L
    for (i <- 0 until s.length) h += s.charAt(i).toLong * (((i * 131) % 997) + 1)
    h
  }

  test("StrHash matches the reference formula (codegen path)") {
    val samples = Seq("", "a", "the quick brown fox", "Zz 09 ~!@#", "x" * 2000)
    val got = samples.toDF("s")
      .select(GraftExtensions.strHash(col("s")).as("h"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == samples.map(refHash))
  }

  test("StrHash null in, null out; registered as SQL graft_strhash") {
    GraftExtensions.register(spark)
    val r = spark.sql("SELECT graft_strhash(CAST(NULL AS STRING)) n, graft_strhash('ab') h")
      .collect().head
    assert(r.isNullAt(0))
    assert(r.getLong(1) == refHash("ab"))
  }

  test("portable minHashSignatures equals the lambda form with the same hash") {
    val docs = spark.read.parquet(sf("documents")).limit(50)
    val lam = docs.select(col("doc_id"), Dedup.minHashSignature(
        Dedup.wordShingles(col("text"), 3), 16, Dedup.portableHash).as("sig"))
      .orderBy("doc_id").collect().map(_.getSeq[Long](1))
    val rel = Dedup.minHashSignatures(docs, "doc_id", "text", 3, 16, Dedup.portableHash)
      .orderBy("id").collect().map(_.getSeq[Long](1))
    assert(lam.toSeq == rel.toSeq)
  }

  test("portable minHashCandidates surfaces an exact duplicate pair") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "totally different words entirely here now")).toDF("doc_id", "text")
    val pairs = Dedup.minHashCandidates(docs, "doc_id", "text",
        numHashes = 16, numBands = 8, hashFn = Dedup.portableHash)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) || !pairs.contains((2L, 3L)))
  }

  test("relational simHashes: identical docs agree, near-dups are close") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "the quick brown fox jumps over the lazy cat again and again"),
      (4L, "entirely unrelated text about spark catalyst partition pruning")).toDF("id", "t")
    val hs = Dedup.simHashes(docs, "id", "t").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hs(1L) == hs(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hs(1L), hs(3L)) < ham(hs(1L), hs(4L)),
      s"near-dup hamming ${ham(hs(1L), hs(3L))} should beat unrelated ${ham(hs(1L), hs(4L))}")
  }

  test("compiled StrShingles reproduces the HOF shingling exactly") {
    val docs = spark.read.parquet(sf("documents"))
    val fast = docs.select(Dedup.wordShingles(col("text"), 3).as("s"))
      .collect().map(_.getSeq[String](0)).toSeq
    val hof = docs.select(Dedup.wordShinglesHof(col("text"), 3).as("s"))
      .collect().map(_.getSeq[String](0)).toSeq
    assert(fast == hof)
    // short-text edge: fewer tokens than n -> one whole-text shingle
    val short = Seq("one two").toDF("t")
      .select(Dedup.wordShingles(col("t"), 3).as("s"))
      .collect().head.getSeq[String](0)
    assert(short == Seq("one two"))
  }

  test("nearDedup drops verified near-duplicates, keeps the min id") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (5L, "alpha beta gamma delta epsilon zeta eta theta"),     // exact dup of 1
      (3L, "alpha beta gamma delta epsilon zeta eta iota"),      // near-dup of 1
      (4L, "utterly different content with no shared shingles here")
    ).toDF("doc_id", "text")
    val kept = Dedup.nearDedup(docs, "doc_id", "text", 0.5, hashFn = Dedup.portableHash)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(1L) && kept.contains(4L))
    assert(!kept.contains(5L), "exact duplicate must be dropped")
    // idempotence: running again on the survivors changes nothing
    val again = Dedup.nearDedup(
        docs.filter(col("doc_id").isin(kept.toSeq: _*)), "doc_id", "text", 0.5,
        hashFn = Dedup.portableHash)
      .select("doc_id").as[Long].collect().toSet
    assert(again == kept)
  }

  test("SrpBucket bitOffset: codegen matches the tree form, tables are independent") {
    import graft.operators.Ann
    val emb = spark.read.parquet(sf("embeddings"))
    for (off <- Seq(8, 24)) {
      val fused = emb.select(col("vec_id"),
        Ann.srpBucket(col("embedding"), 64, 8, off).as("b")).orderBy("vec_id")
        .as[(Long, Long)].collect().toSeq
      val tree = emb.select(col("vec_id"),
        Ann.srpBucketHof(col("embedding"), 64, 8, off).as("b")).orderBy("vec_id")
        .as[(Long, Long)].collect().toSeq
      assert(fused == tree, s"offset $off: fused loop must equal the tree form")
    }
    // different offsets = different projections: buckets must not all agree
    val b0 = emb.select(Ann.srpBucket(col("embedding"), 64, 8, 0)).as[Long].collect()
    val b8 = emb.select(Ann.srpBucket(col("embedding"), 64, 8, 8)).as[Long].collect()
    assert(b0.zip(b8).exists { case (x, y) => x != y },
      "offset tables hashing identically would make multi-table LSH a no-op")
  }

  test("codegen SrpBucket reproduces the expression-tree form exactly") {
    val emb = spark.read.parquet(sf("embeddings"))
    val native = emb.select(col("vec_id"),
        Ann.srpBucket(col("embedding"), 64, 8).as("b")).orderBy("vec_id")
      .collect().map(_.getLong(1)).toSeq
    val hof = emb.select(col("vec_id"),
        Ann.srpBucketHof(col("embedding"), 64, 8).as("b")).orderBy("vec_id")
      .collect().map(_.getLong(1)).toSeq
    assert(native == hof)
  }

  test("seeded IVF: seeds land in their own cells; full probe == brute force") {
    val emb = spark.read.parquet(sf("embeddings"))
    val m = Ann.buildIvfSeeded(emb, "vec_id", "embedding", 0L until 8L)
    val seedCells = m.assigned.filter(col("vec_id") < 8)
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    (0 until 8).foreach(i => assert(seedCells(i.toLong) == i))
    val q = emb.filter(col("vec_id") === 3).select("embedding").head().getSeq[Float](0)
    val full = Ann.queryIvf(m.assigned, m, "vec_id", "embedding", q, 5,
        nprobe = 8, space = "cosine", excludeIds = Seq(3L))
      .select("vec_id").as[Long].collect().toSeq
    val brute = Knn.topK(emb, "vec_id", "embedding", q, 5, "cosine", excludeIds = Seq(3L))
      .select("vec_id").as[Long].collect().toSeq
    assert(full == brute)
  }

  test("seeded IVF pruning: nprobe cells only, subset of brute force universe") {
    val emb = spark.read.parquet(sf("embeddings"))
    val m = Ann.buildIvfSeeded(emb, "vec_id", "embedding", 0L until 8L)
    val q = emb.filter(col("vec_id") === 0).select("embedding").head().getSeq[Float](0)
    val cells = Ann.nearestCells(m, q, 2).toSet
    val res = Ann.queryIvf(m.assigned, m, "vec_id", "embedding", q, 10,
      nprobe = 2, space = "cosine", excludeIds = Seq(0L))
    val resIds = res.select("vec_id").as[Long].collect().toSet
    val allowed = m.assigned.filter(col("cell").isin(cells.toSeq: _*))
      .select("vec_id").as[Long].collect().toSet
    assert(resIds.subsetOf(allowed))
  }
}
