package graft

import org.apache.spark.sql.functions._

import graft.catalog.{Collection, CollectionCatalog}
import graft.operators.{ChromaFilter, HashingEmbedder}

/** Prefiltered keyword + hybrid retrieval (`where`/`whereDoc` on
  * keywordTopK / keywordTopKBatch / queryHybridText*): the filter picks
  * WHICH documents rank — between the score fold and the top-n rank —
  * never how they score (BM25 statistics stay corpus-global, the Lucene
  * filter-query rule). Pins: score invariance under filtering, sidecar ≡
  * scan under a filter, batch ≡ single, hybrid legs both confined, and
  * whereDoc riding the same path. */
class RetrievalFilterSpec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    ("1", "hash join stream hash", "en", 5L),
    ("2", "hash table scan", "en", 1L),
    ("3", "join join stream", "fr", 4L),
    ("4", "stream stream hash join", "fr", 2L),
    ("5", "vector index scan", "en", 3L),
    ("6", "hash hash hash", "de", 5L))

  private def mk(name: String): Collection = {
    val cat = new CollectionCatalog(spark, tmpDir("rfilter"), numBuckets = 4)
    val c = cat.getOrCreateCollection(name)
    c.add(corpus.toDF("id", "document", "lang", "rating"))
    c
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(String, Int, Double)] =
    df.collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSeq

  test("where confines WHICH docs rank; scores are filter-invariant") {
    val c = mk("f1")
    val terms = Seq("hash", "join")
    val all = rows(c.keywordTopK(terms, 10))
    val en = rows(c.keywordTopK(terms, 10, where = Some(ChromaFilter.Eq("lang", "en"))))
    assert(en.nonEmpty && en.map(_._1).toSet.subsetOf(Set("1", "2", "5")))
    // every filtered doc keeps its unfiltered SCORE (stats stay global);
    // only ranks re-pack over the eligible set
    val allScores = all.map(t => t._1 -> t._3).toMap
    en.foreach { case (id, _, s) => assert(allScores(id) == s) }
    assert(en.map(_._2) == (1 to en.size))
  }

  test("sidecar-served filtered read is BIT-equal to the scan path") {
    val c = mk("f2")
    val w = Some(ChromaFilter.Or(Seq(
      ChromaFilter.Eq("lang", "fr"), ChromaFilter.Gte("rating", 5L))))
    c.buildKeywordIndex()
    assert(c.hasKeywordIndex)
    val idx = rows(c.keywordTopK(Seq("hash", "stream"), 10, where = w))
    c.dropKeywordIndex()
    val scan = rows(c.keywordTopK(Seq("hash", "stream"), 10, where = w))
    assert(idx == scan && idx.nonEmpty)
    assert(idx.map(_._1).toSet.subsetOf(Set("1", "3", "4", "6")))
  }

  test("batch filtered read: each qid equals its single-query answer") {
    val c = mk("f3")
    c.buildKeywordIndex()
    val w = Some(ChromaFilter.Ne("lang", "de"))
    val qs = Seq(Seq("hash"), Seq("join", "stream"))
    val batch = c.keywordTopKBatch(qs, 5, where = w)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2), r.getDouble(3)))
      .toSeq.sortBy(t => (t._1, t._3))
    qs.zipWithIndex.foreach { case (q, qi) =>
      val single = rows(c.keywordTopK(q, 5, where = w))
      assert(batch.filter(_._1 == qi).map(t => (t._2, t._3, t._4)) == single)
    }
  }

  test("whereDoc prefilters keyword retrieval through the same path") {
    val c = mk("f4")
    val got = rows(c.keywordTopK(Seq("hash"), 10,
      whereDoc = Some(ChromaFilter.Contains("scan"))))
    assert(got.map(_._1).toSet == Set("2")) // only doc 2 has both hash + "scan"
  }

  test("hybrid where: both legs confined, fused ids all eligible") {
    val cat = new CollectionCatalog(spark, tmpDir("rfilter-h"), numBuckets = 4)
    val c = cat.getOrCreateCollection("h1", space = "cosine")
    c.addDocuments(corpus.toDF("id", "document", "lang", "rating"),
      HashingEmbedder(8))
    c.buildKeywordIndex()
    val w = Some(ChromaFilter.Eq("lang", "en"))
    val fused = c.queryHybridText("hash join", k = 3, where = w)
      .collect().map(_.getString(0)).toSeq
    assert(fused.nonEmpty && fused.toSet.subsetOf(Set("1", "2", "5")))
    // and equals the hand-fused filtered legs
    val kw = c.keywordTopK(Seq("hash", "join"), 50, where = w)
      .select(col("id"), col("rnk"))
    val vr = c.queryText(Seq("hash join"), 50, where = w)
      .select(col("id"), col("rnk"))
    val manual = graft.operators.Retrieval.rrf(Seq(kw, vr), "id", "rnk")
      .orderBy(col("rrf").desc, col("id")).limit(3)
      .collect().map(_.getString(0)).toSeq
    assert(fused == manual)
  }

  test("empty eligible set returns zero rows, not an error") {
    val c = mk("f5")
    assert(c.keywordTopK(Seq("hash"), 5,
      where = Some(ChromaFilter.Eq("lang", "zz"))).count() == 0)
  }
}
