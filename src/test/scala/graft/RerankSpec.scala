package graft

import org.apache.spark.sql.functions._

import graft.catalog.CollectionCatalog
import graft.operators.{HashingEmbedder, OnnxRerankFunction, OverlapRerank, Rerank, RerankFunction}

/** The rerank stage (retrieve → fuse → RERANK): pluggable pairwise
  * scoring over the bounded candidate list. Pins: OverlapRerank's rule,
  * batched scoring (one scoreBatch per ≤batchSize docs), stable
  * (score DESC, prior) ordering, loud nulls/miscounts, the one-call
  * queryRerankText ≡ the hand-composed pipeline, and the ONNX rung's
  * runtime gate. */
class RerankSpec extends SparkTestBase {
  import spark.implicits._

  test("OverlapRerank: distinct-token intersection, lowercase, whitespace") {
    val f = OverlapRerank()
    assert(f.scoreBatch("hash join stream",
      Seq("HASH hash join", "scan table", "join stream hash extra")) ==
      Seq(2.0, 0.0, 3.0))
    // duplicates collapse on BOTH sides
    assert(f.scoreBatch("hash hash", Seq("hash hash hash")) == Seq(1.0))
  }

  test("rerank: (score DESC, prior) order, k limit, batching") {
    // the function object serializes into the task closure — a plain
    // driver-side counter would tick in the deserialized COPY; an
    // accumulator reports back
    val calls = spark.sparkContext.longAccumulator("rerank-calls")
    val fn = new RerankFunction {
      override def name = "counting"
      override def batchSize = 2
      override def scoreBatch(q: String, docs: Seq[String]): Seq[Double] = {
        calls.add(1)
        assert(docs.size <= batchSize)
        docs.map(_.length.toDouble)
      }
    }
    val cands = Seq(
      ("a", "xxxx", 1), ("b", "xx", 2), ("c", "xxxx", 3), ("d", "x", 4),
      ("e", "xxxxxx", 5)).toDF("id", "document", "prior").coalesce(1)
    val out = Rerank.rerank(cands, "id", "document", "prior", "q", fn, 4)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSeq
    // e(6) first; a and c tie at 4 → prior breaks (a=1 before c=3); b(2)
    assert(out == Seq(("e", 1, 6.0), ("a", 2, 4.0), ("c", 3, 4.0), ("b", 4, 2.0)))
    assert(calls.value == 3) // 5 rows on one partition at batchSize 2
  }

  test("rerank: null documents and miscounted scores fail loudly") {
    val nullDoc = Seq(("a", null: String, 1)).toDF("id", "document", "prior")
    val e1 = intercept[Exception] {
      Rerank.rerank(nullDoc, "id", "document", "prior", "q", OverlapRerank(), 1).collect()
    }
    assert(e1.getMessage.contains("null"))
    val bad = new RerankFunction {
      override def name = "short"
      override def scoreBatch(q: String, docs: Seq[String]) = Seq(1.0)
    }
    val two = Seq(("a", "x", 1), ("b", "y", 2)).toDF("id", "document", "prior").coalesce(1)
    val e2 = intercept[Exception] {
      Rerank.rerank(two, "id", "document", "prior", "q", bad, 2).collect()
    }
    assert(e2.getMessage.contains("scores"))
    // a non-string doc column fails at the BOUNDARY, not as a bare
    // ClassCastException inside an executor task
    val bin = Seq(("a", Array[Byte](1, 2), 1)).toDF("id", "document", "prior")
    val e3 = intercept[IllegalArgumentException] {
      Rerank.rerank(bin, "id", "document", "prior", "q", OverlapRerank(), 1)
    }
    assert(e3.getMessage.contains("not string"))
  }

  test("queryRerankText: one call == hybrid + doc read + overlap + stable rank") {
    val cat = new CollectionCatalog(spark, tmpDir("rerank"), numBuckets = 4)
    val c = cat.getOrCreateCollection("rr", space = "cosine")
    c.addDocuments(Seq(
      ("1", "hash join stream hash"), ("2", "hash table scan"),
      ("3", "join join stream"), ("4", "stream stream hash join"),
      ("5", "vector index scan"), ("6", "hash hash hash")
    ).toDF("id", "document"), HashingEmbedder(8))
    val got = c.queryRerankText("hash join stream", k = 4,
        OverlapRerank(), fetchN = 6)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSeq
    // hand-composed: fused top-6 → prior order → overlap → stable re-rank
    val fused = c.queryHybridText("hash join stream", k = 6, fetchN = 6)
      .orderBy(col("rrf").desc, col("id"))
      .collect().map(_.getString(0)).toSeq
    val docs = Map("1" -> "hash join stream hash", "2" -> "hash table scan",
      "3" -> "join join stream", "4" -> "stream stream hash join",
      "5" -> "vector index scan", "6" -> "hash hash hash")
    val q = Set("hash", "join", "stream")
    val manual = fused.zipWithIndex
      .map { case (id, i) =>
        (id, i, docs(id).split("\\s+").toSet.intersect(q).size.toDouble) }
      .sortBy { case (_, prior, s) => (-s, prior) }
      .take(4).zipWithIndex.map { case ((id, _, s), r) => (id, r + 1, s) }
    assert(got == manual)
    // docs 1 and 4 carry all three terms — they must lead
    assert(got.take(2).map(_._1).toSet == Set("1", "4"))
  }

  test("queryRerankText: prefilters confine candidates; no-document collections fail") {
    val cat = new CollectionCatalog(spark, tmpDir("rerank-w"), numBuckets = 4)
    val c = cat.getOrCreateCollection("rw", space = "cosine")
    c.addDocuments(Seq(
      ("1", "hash join", "en"), ("2", "hash stream", "fr"),
      ("3", "join stream hash", "en")
    ).toDF("id", "document", "lang"), HashingEmbedder(8))
    val got = c.queryRerankText("hash join stream", k = 2, OverlapRerank(),
        fetchN = 3, where = Some(graft.operators.ChromaFilter.Eq("lang", "en")))
      .collect().map(_.getString(0)).toSeq
    assert(got.toSet.subsetOf(Set("1", "3")) && got.head == "3")
    // a filter that excludes everything: empty result, and NOT a full
    // corpus read (get(ids = Nil) would mean no id filter)
    assert(c.queryRerankText("hash join stream", k = 2, OverlapRerank(),
      fetchN = 3, where = Some(graft.operators.ChromaFilter.Eq("lang", "zz")))
      .count() == 0)
  }

  test("queryMaxSimText: one call == shortlist + chunk + embed + maxSimTopK; gates fire") {
    val cat = new CollectionCatalog(spark, tmpDir("maxsim"), numBuckets = 4)
    val c = cat.getOrCreateCollection("ms", space = "cosine")
    c.addDocuments(Seq(
      ("1", "hash join stream hash"), ("2", "hash table scan"),
      ("3", "join join stream"), ("4", "stream stream hash join"),
      ("5", "vector index scan"), ("6", "hash hash hash")
    ).toDF("id", "document"), HashingEmbedder(8))
    val got = c.queryMaxSimText("hash join stream", k = 4, fetchN = 6,
        chunkTokens = 2, overlap = 1)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    // hand-composed twin: BM25 shortlist → chunk(2,1) → hash-embed →
    // maxSimTopK over the candidate chunks with per-term query vectors
    val he = HashingEmbedder(8)
    val cand = c.keywordTopK(Seq("hash", "join", "stream"), 6)
      .select("id").collect().map(_.getString(0)).toSeq
    val docs = c.get(ids = cand, include = Some(Set("documents")))
      .select(col("id"), col("document"))
    val chunks = graft.functions.TextAnalysis.chunk(docs, "id", "document", 2, 1)
    val manual = graft.operators.Retrieval.maxSimTopK(
        he.embedFrame(chunks, "chunk_text", "cvec"), "id", "cvec",
        Seq("hash", "join", "stream").map(he.embedOne), 4)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(got == manual && got.nonEmpty)
    // docs carrying all three terms have a best-chunk for each → lead
    assert(got.head._1 == "1" || got.head._1 == "4")
    // a filter that excludes everything → empty, never a corpus read
    assert(c.queryMaxSimText("hash join stream", k = 2,
      whereDoc = Some(graft.operators.ChromaFilter.Contains("zzz"))).count() == 0)
    // no-embedding-function collections fail loudly
    val bare = cat.getOrCreateCollection("bare")
    bare.add(Seq(("1", "x y z")).toDF("id", "document"))
    val e = intercept[IllegalStateException] {
      bare.queryMaxSimText("x", k = 1)
    }
    assert(e.getMessage.contains("embedding function"))
    intercept[IllegalArgumentException](c.queryMaxSimText("hash", k = 5, fetchN = 2))
  }

  test("OnnxRerankFunction: loud at construction without the runtime jar") {
    assume(!graft.operators.OnnxEmbeddingFunction.runtimeAvailable)
    val e = intercept[IllegalStateException] {
      new OnnxRerankFunction("/models/x.onnx", "ce", (q, d) => Array(1L))
    }
    assert(e.getMessage.contains("ai.onnxruntime") &&
      e.getMessage.contains("OverlapRerank"))
  }
}
