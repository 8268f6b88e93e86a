package graft

import org.apache.spark.sql.functions._

import graft.catalog.CollectionCatalog
import graft.operators.{KeywordIndex, Retrieval}

/** The keyword-statistics (BM25) sidecar — hybrid retrieval's scale path:
  * index-vs-scan BIT equality (the shared-fold contract), the reserved
  * stats partition's census, plan confinement (partition pruning on tp),
  * incremental refresh through the carry manifest, and the MVCC lifecycle
  * (stale sidecar never consulted, vacuum/compact cover the third kind). */
class KeywordIndexSpec extends SparkTestBase {
  import spark.implicits._

  // repeated terms (tf > 1), shared terms (df > 1), a doc with none of
  // the query terms, a null document, and length spread (dl variance)
  private val corpus = Seq(
    ("1", "spark joins hash joins and more joins"),
    ("2", "hash tables back the hash join"),
    ("3", "stream processing with watermarks"),
    ("4", "sort merge join versus hash join under skew skew skew"),
    ("5", "completely unrelated text about turtles"),
    ("6", null: String))
  private val terms = Seq("hash", "joins", "stream")

  private def freshColl(buckets: Int = 4): graft.catalog.Collection = {
    val cat = new CollectionCatalog(spark, tmpDir("kwx-test"), numBuckets = buckets)
    val c = cat.getOrCreateCollection("k")
    c.add(corpus.toDF("id", "document"))
    c
  }

  test("operator: indexed bm25TopK is BIT-equal to the Retrieval scan path") {
    val docs = corpus.toDF("id", "document")
    val path = tmpDir("kwx-op")
    KeywordIndex.writeWithPb(docs, "id", "document",
      pmod(xxhash64(col("id")), lit(4)), path)
    val scan = Retrieval.bm25TopK(docs, "id", "document", terms, 10)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    val indexed = KeywordIndex.bm25TopK(spark.read.parquet(path), terms, 10)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    assert(indexed.toSeq == scan.toSeq) // ranks AND raw double scores
    assert(scan.nonEmpty && scan.head._2 == 1)
  }

  test("stats partition: per-bucket census recomposes the scan's corpus stats") {
    val docs = corpus.toDF("id", "document")
    val path = tmpDir("kwx-stats")
    KeywordIndex.writeWithPb(docs, "id", "document",
      pmod(xxhash64(col("id")), lit(4)), path)
    val stats = spark.read.parquet(path)
      .filter(col("tp") === KeywordIndex.StatsTp)
      .agg(sum("tf").as("n_docs"), sum("dl").as("tot_dl"))
      .collect().head
    // the null doc explodes to nothing on BOTH paths: 5 docs, and tot_dl
    // = total whitespace tokens of the 5 non-null texts
    assert(stats.getLong(0) == 5)
    val tokens = corpus.flatMap(c => Option(c._2)).map(_.split("\\s+").length).sum
    assert(stats.getLong(1) == tokens)
    // stats rows never leak into a term read: tpOf < StatsTp always
    assert(terms.map(KeywordIndex.tpOf).forall(_ < KeywordIndex.StatsTp))
  }

  test("collection keywordTopK: scan fallback, then the sidecar serves identically") {
    val c = freshColl()
    val scan = c.keywordTopK(terms, 5).collect().map(r =>
      (r.getString(0), r.getInt(1), r.getDouble(2)))
    assert(!c.hasKeywordIndex)
    c.buildKeywordIndex()
    assert(c.hasKeywordIndex)
    val served = c.keywordTopK(terms, 5)
    val indexed = served.collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    assert(indexed.toSeq == scan.toSeq)
    // plan confinement: the postings read prunes to the query terms'
    // tp partitions (literal IN computed with the writer's own hash)
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("kwindex_v"), "the sidecar read must appear in the plan")
    assert(plan.contains("PartitionFilters") && plan.contains("tp"),
      s"expected tp partition pruning in:\n$plan")
  }

  test("mutation invalidates the sidecar; refresh rebuilds only touched buckets and carries the rest") {
    val c = freshColl()
    c.buildKeywordIndex()
    c.upsert(Seq(("7", "new hash heavy doc hash hash")).toDF("id", "document"))
    c.delete(ids = Seq("5"))
    assert(!c.hasKeywordIndex) // version moved past the build
    // fallback scan already serves the post-mutation truth
    val scanAfter = c.keywordTopK(terms, 5).collect().map(r =>
      (r.getString(0), r.getInt(1), r.getDouble(2)))
    val rebuilt = c.refreshKeywordIndex()
    assert(rebuilt >= 1 && rebuilt <= 2,
      s"expected only the touched buckets to rebuild, got $rebuilt of 4")
    assert(c.hasKeywordIndex)
    val indexed = c.keywordTopK(terms, 5).collect().map(r =>
      (r.getString(0), r.getInt(1), r.getDouble(2)))
    assert(indexed.toSeq == scanAfter.toSeq)
    // the refresh carried unchanged tp/pb slices by manifest, and stats
    // totals recomposed exactly (mutated bucket's stats row re-derived,
    // carried buckets' rows untouched): census over the new build
    val collDir = java.nio.file.Paths
      .get(c.get().inputFiles.head.stripPrefix("file:"))
      .getParent.getParent.getParent // file → pt=<b> → data_v<V> → <coll dir>
    val dir = new org.apache.hadoop.fs.Path(collDir.toString)
    val io = graft.catalog.StoreIO.of(dir, spark.sparkContext.hadoopConfiguration)
    val newest = io.list(dir).filter(_.name.startsWith("kwindex_v"))
      .map(_.path).sortBy(_.getName).last
    val carried = graft.catalog.Carry.read(io, newest)
    assert(carried.nonEmpty, "refresh must carry forward unchanged slices by manifest")
    assert(carried.keys.forall(_.startsWith("tp=")))
    // already current → no-op
    assert(c.refreshKeywordIndex() == 0)
  }

  test("vacuum reclaims superseded sidecar builds; compactIndexes repacks the third kind") {
    val c = freshColl()
    c.buildKeywordIndex()
    c.buildKeywordIndex() // superseded build of the same version
    c.upsert(Seq(("8", "more hash text here")).toDF("id", "document"))
    c.buildKeywordIndex()
    assert(c.vacuum() >= 2)
    assert(c.hasKeywordIndex)
    val before = c.keywordTopK(terms, 5).collect().map(r =>
      (r.getString(0), r.getInt(1), r.getDouble(2)))
    // repack to the read-optimized no-pb shape; answers must not move
    assert(c.compactIndexes(keepRefreshAxis = false) == 1)
    val after = c.keywordTopK(terms, 5).collect().map(r =>
      (r.getString(0), r.getInt(1), r.getDouble(2)))
    assert(after.toSeq == before.toSeq)
    // a no-pb build has no refresh basis: next refresh after a mutation
    // is the loud full rebuild, not a silent wrong carry
    c.upsert(Seq(("9", "hash again")).toDF("id", "document"))
    assert(c.refreshKeywordIndex() == 4)
    val scan9 = Retrieval.bm25TopK(c.toDF, "id", "document", terms, 5)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    assert(c.keywordTopK(terms, 5).collect().map(r =>
      (r.getString(0), r.getInt(1), r.getDouble(2))).toSeq == scan9.toSeq)
  }

  // ------------------------------------------------- one-call hybrid text

  /** A collection the hybrid path can drive end-to-end: documents embed
    * server-side (recorded embedding function — the vector leg's
    * requirement) and carry text (the keyword leg's). */
  private lazy val hybridColl: graft.catalog.Collection = {
    val cat = new CollectionCatalog(spark, tmpDir("kwx-hybrid"), numBuckets = 4)
    val c = cat.getOrCreateCollection("h")
    c.addDocuments(corpus.filter(_._2 != null).toDF("id", "document"),
      graft.operators.HashingEmbedder(8))
    c
  }
  private val hybridText = "hash joins stream"

  test("queryHybridText: one call == keywordTopK + queryText + rrf, and the sidecar never moves it") {
    val c = hybridColl
    val composed = {
      val kw = c.keywordTopK(Seq("hash", "joins", "stream"), 5)
        .select(col("id"), col("rnk"))
      val vr = c.queryText(Seq(hybridText), 5).select(col("id"), col("rnk"))
      Retrieval.rrf(Seq(kw, vr), "id", "rnk")
        .orderBy(col("rrf").desc, col("id")).limit(3)
        .collect().map(r => (r.getString(0), r.getDouble(1)))
    }
    assert(!c.hasKeywordIndex)
    val scanned = c.queryHybridText(hybridText, k = 3, fetchN = 5)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(scanned.toSeq == composed.toSeq)
    c.buildKeywordIndex()
    val indexed = c.queryHybridText(hybridText, k = 3, fetchN = 5)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(indexed.toSeq == composed.toSeq)
    assert(indexed.nonEmpty)
  }

  test("batch forms: keywordTopKBatch and queryHybridTextBatch equal the per-query loop, on both paths") {
    val c = hybridColl
    val queries = Seq(Seq("hash", "joins"), Seq("stream", "turtles"), Seq("skew"))
    def batchRows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2),
        java.lang.Double.doubleToRawLongBits(r.getDouble(3)))).toSeq.sorted
    def singles() = queries.zipWithIndex.flatMap { case (q, qi) =>
      c.keywordTopK(q, 4).collect().map(r =>
        (qi, r.getString(0), r.getInt(1),
          java.lang.Double.doubleToRawLongBits(r.getDouble(2))))
    }.sorted
    // scan fallback path (the hybridColl fixture may already carry a
    // sidecar from the earlier test — exercise whichever state it is in
    // first, then force the OTHER path)
    val before = batchRows(c.keywordTopKBatch(queries, 4))
    assert(before == singles(), "batch != per-query loop")
    if (!c.hasKeywordIndex) c.buildKeywordIndex() else c.dropKeywordIndex()
    val after = batchRows(c.keywordTopKBatch(queries, 4))
    assert(after == singles(), "batch != per-query loop after toggling the sidecar")
    assert(before == after, "sidecar presence moved batch answers")
    // hybrid batch ≡ the single-text call per qid (rrf values bit-equal)
    val texts = Seq("hash joins stream", "turtles skew hash")
    val hb = c.queryHybridTextBatch(texts, k = 3, fetchN = 5).collect()
      .map(r => (r.getInt(0), r.getString(1),
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)))).toSeq.sorted
    val hs = texts.zipWithIndex.flatMap { case (t, qi) =>
      c.queryHybridText(t, k = 3, fetchN = 5).collect().map(r =>
        (qi, r.getString(0), java.lang.Double.doubleToRawLongBits(r.getDouble(1))))
    }.sorted
    assert(hb == hs, "hybrid batch != per-text loop")
    intercept[IllegalArgumentException] { c.keywordTopKBatch(Seq(Seq("hash"), Seq()), 3) }
    intercept[IllegalArgumentException] { c.queryHybridTextBatch(Seq(), 3) }
  }

  test("queryHybridText: duplicate query tokens collapse; degenerate inputs fail loudly") {
    val c = hybridColl
    // BM25 scores a term once per DISTINCT query term: repeating a token
    // in the text must not double its keyword contribution. The vector
    // leg DOES see the repetition (the embedding is of the raw text), so
    // compare the keyword legs directly.
    val once = c.keywordTopK(Seq("hash", "joins"), 5)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    val kwOfDup = {
      val terms2 = "hash hash joins".toLowerCase.split("\\s+")
        .filter(_.nonEmpty).distinct.toSeq
      c.keywordTopK(terms2, 5)
        .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    }
    assert(kwOfDup.toSeq == once.toSeq)
    intercept[IllegalArgumentException] { c.queryHybridText("   ", k = 3) }
    intercept[IllegalArgumentException] {
      c.queryHybridText(hybridText, k = 5, fetchN = 3)
    }
    intercept[IllegalArgumentException] { c.queryHybridText(hybridText, k = 0) }
  }
}
