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

  test("bm25 rejects an empty query; rrf rejects a single list") {
    intercept[IllegalArgumentException] {
      Retrieval.bm25(corpus, "doc_id", "text", Nil)
    }
    intercept[IllegalArgumentException] {
      Retrieval.rrf(Seq(corpus), "doc_id", "text")
    }
  }
}
