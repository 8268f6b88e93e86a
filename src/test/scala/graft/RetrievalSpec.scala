package graft

import org.apache.spark.sql.functions._
import graft.operators.Retrieval

class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "a b"), (2L, "a a"), (3L, "c")).toDF("doc_id", "text")

  test("bm25 matches the hand-computed log-free scores") {
    // query 'a': df=2, N=3 → idf = (3-2+0.5)/(2+0.5) = 0.6
    // dl = [2,2,1], tot_dl = 5; norm(dl) = 0.25 + 0.75*dl*3/5
    // doc1 tf=1: 0.6*2.2 / (1 + 1.2*(0.25+0.9))  = 1.32/2.38
    // doc2 tf=2: 0.6*4.4 / (2 + 1.2*(0.25+0.9))  = 2.64/3.38
    val got = Retrieval.bm25(corpus, "doc_id", "text", Seq("a"))
      .orderBy("id").as[(Long, Double)].collect().toSeq
    assert(got.map(_._1) == Seq(1L, 2L), "only docs containing a term score")
    assert(math.abs(got(0)._2 - math.rint(1.32 / 2.38 * 1e6) / 1e6) < 1e-9)
    assert(math.abs(got(1)._2 - math.rint(2.64 / 3.38 * 1e6) / 1e6) < 1e-9)
  }

  test("bm25TopK ranks higher-tf docs first, rank ties by id") {
    val top = Retrieval.bm25TopK(corpus, "doc_id", "text", Seq("a"), 2)
      .orderBy("rnk").select("id", "rnk").as[(Long, Int)].collect().toSeq
    assert(top == Seq((2L, 1), (1L, 2)), "tf=2 in the same-length doc wins")
  }

  test("rrf fuses outer-merged rank lists with 1/(k+rnk) contributions") {
    val l1 = Seq((10L, 1), (20L, 2)).toDF("id", "rnk")
    val l2 = Seq((20L, 1), (30L, 2)).toDF("id", "rnk")
    val fused = Retrieval.rrf(Seq(l1, l2), "id", "rnk")
      .orderBy(col("rrf").desc, col("id")).as[(Long, Double)].collect().toSeq
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(fused.map(_._1) == Seq(20L, 10L, 30L), "both-list id outranks singles")
    assert(fused(0)._2 == r6(1.0 / 62 + 1.0 / 61))
    assert(fused(1)._2 == r6(1.0 / 61))
    assert(fused(2)._2 == r6(1.0 / 62))
  }

  test("maxSimTopK: hand-computed late-interaction scores, zero chunks dropped") {
    // doc 1: chunks aligned with qtok 0 and qtok 1; doc 2: one chunk
    // orthogonal to qtok 0, aligned with qtok 1; doc 3: only a zero
    // chunk (dropped entirely — no NaN poisoning)
    val chunks = Seq(
      (1L, Seq(1f, 0f)), (1L, Seq(0f, 1f)),
      (2L, Seq(0f, 2f)),
      (3L, Seq(0f, 0f))).toDF("doc_id", "cvec")
    val out = Retrieval.maxSimTopK(chunks, "doc_id", "cvec",
        Seq(Seq(1f, 0f), Seq(0f, 1f)), k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
    // doc 1: max sim 1.0 for both tokens -> 2.0; doc 2: 0.0 + 1.0 -> 1.0
    assert(out == List((1L, 2.0), (2L, 1.0)))
    // ties at the k boundary break by id ascending
    val tied = Seq((5L, Seq(1f, 0f)), (4L, Seq(1f, 0f)), (6L, Seq(1f, 0f)))
      .toDF("doc_id", "cvec")
    val top2 = Retrieval.maxSimTopK(tied, "doc_id", "cvec",
      Seq(Seq(1f, 0f)), k = 2).collect().map(_.getLong(0)).toList
    assert(top2 == List(4L, 5L))
  }

  test("maxSimTopK gates: zero query token, empty queries, bad k, ragged dims") {
    val chunks = Seq((1L, Seq(1f, 0f))).toDF("doc_id", "cvec")
    val zero = intercept[IllegalArgumentException] {
      Retrieval.maxSimTopK(chunks, "doc_id", "cvec", Seq(Seq(0f, 0f)), 1)
    }
    assert(zero.getMessage.contains("all-zero"))
    intercept[IllegalArgumentException](
      Retrieval.maxSimTopK(chunks, "doc_id", "cvec", Nil, 1))
    intercept[IllegalArgumentException](
      Retrieval.maxSimTopK(chunks, "doc_id", "cvec", Seq(Seq(1f, 0f)), 0))
    intercept[IllegalArgumentException](
      Retrieval.maxSimTopK(chunks, "doc_id", "cvec",
        Seq(Seq(1f, 0f), Seq(1f)), 1))
  }

  test("mmr excludes NaN-similarity candidates (zero vectors) instead of ranking them first") {
    // cosine(0-vec, q) = 0/0 = NaN, and Spark's desc ordering ranks NaN
    // ABOVE every real number — unfiltered, the garbage row would be
    // picked at rank 1 with a NaN score that keeps winning. plain query
    // is shielded (NaN dist sorts LAST under asc); mmr must filter.
    val vecs = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(0f, 0f)), (3L, Seq(0.6f, 0.8f)))
      .toDF("id", "vec")
    val picked = Retrieval.mmr(vecs, "id", "vec", Seq(1f, 0f), k = 3, fetchN = 10)
      .orderBy("rnk").select("id").as[Long].collect().toSeq
    assert(picked == Seq(1L, 3L), s"zero vector must be unrankable, got $picked")
  }

  test("mmr rejects a zero or non-finite QUERY vector loudly") {
    // the candidate-side NaN filter (test above) makes a degenerate QUERY
    // silently empty instead — the operator must gate it like
    // Collection.queryMmr does
    val vecs = Seq((1L, Seq(1f, 0f))).toDF("id", "vec")
    val e = intercept[IllegalArgumentException](
      Retrieval.mmr(vecs, "id", "vec", Seq(0f, 0f), k = 1, fetchN = 1))
    assert(e.getMessage.contains("all zeros"))
    intercept[IllegalArgumentException](
      Retrieval.mmr(vecs, "id", "vec", Seq(Float.NaN, 1f), k = 1, fetchN = 1))
    intercept[IllegalArgumentException](
      Retrieval.mmr(vecs, "id", "vec", Seq(Float.PositiveInfinity, 1f), k = 1, fetchN = 1))
  }

  test("mmr fetchN above MaxFetchN throws instead of collecting") {
    val vecs = Seq((1L, Seq(1f, 0f))).toDF("id", "vec")
    val e = intercept[IllegalArgumentException](
      Retrieval.mmr(vecs, "id", "vec", Seq(1f, 0f),
        k = 1, fetchN = Retrieval.MaxFetchN + 1))
    assert(e.getMessage.contains("MaxFetchN"))
    // the boundary itself is admitted
    assert(Retrieval.mmr(vecs, "id", "vec", Seq(1f, 0f),
      k = 1, fetchN = Retrieval.MaxFetchN).count() == 1)
  }

  test("bm25 rejects an empty query; rrf rejects a single list") {
    intercept[IllegalArgumentException] {
      Retrieval.bm25(corpus, "doc_id", "text", Nil)
    }
    intercept[IllegalArgumentException] {
      Retrieval.rrf(Seq(corpus), "doc_id", "text")
    }
  }

  test("fuseMinMax normalizes per list, weights, and outer-merges") {
    val a = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "score")
    val b = Seq((2L, 5.0), (4L, 15.0)).toDF("id", "score")
    val got = Retrieval.fuseMinMax(Seq(a -> 0.5, b -> 0.5), "id", "score")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // a normalizes to {1:0, 2:0.5, 3:1}; b to {2:0, 4:1}
    assert(got == Map(1L -> 0.0, 2L -> 0.25, 3L -> 0.5, 4L -> 0.5))
  }

  test("fuseMinMax: a constant-score list contributes full weight (no 0/0 NaN)") {
    val a = Seq((1L, 7.0), (2L, 7.0)).toDF("id", "score")
    val b = Seq((1L, 0.0), (2L, 1.0)).toDF("id", "score")
    val got = Retrieval.fuseMinMax(Seq(a -> 0.3, b -> 0.7), "id", "score")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 0.3, 2L -> 1.0))
  }

  test("fuseMinMax rejects single lists and negative weights") {
    val a = Seq((1L, 1.0)).toDF("id", "score")
    intercept[IllegalArgumentException] { Retrieval.fuseMinMax(Seq(a -> 1.0), "id", "score") }
    intercept[IllegalArgumentException] {
      Retrieval.fuseMinMax(Seq(a -> 1.0, a -> -0.1), "id", "score")
    }
  }
}
