package graft

import org.apache.spark.sql.functions._
import graft.operators.Knn

class KnnSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)), (3L, Seq(1f, 1f)),
    (4L, Seq(-1f, 0f)), (5L, Seq(0.9f, 0.1f))
  ).toDF("id", "vec")

  test("cosine top-k ordering and tie-break by id") {
    val res = Knn.topK(corpus, "id", "vec", Seq(1f, 0f), 3, "cosine")
      .select("id").as[Long].collect()
    // nearest to (1,0): itself (id 1, dist 0), then (0.9,0.1), then (1,1)
    assert(res.toSeq == Seq(1L, 5L, 3L))
  }

  test("EXACT distance ties break by id ascending (oracle canonicalization)") {
    // ids 7 and 6 share one vector; 9 and 8 share another — identical
    // distances, so only the id tie-break determines order
    val tied = Seq(
      (7L, Seq(1f, 0f)), (6L, Seq(1f, 0f)),
      (9L, Seq(0f, 1f)), (8L, Seq(0f, 1f))
    ).toDF("id", "vec")
    val res = Knn.topK(tied, "id", "vec", Seq(1f, 0f), 4, "cosine")
      .select("id").as[Long].collect()
    assert(res.toSeq == Seq(6L, 7L, 8L, 9L))
    val batch = Knn.topKBatch(tied, "id", "vec",
        tied.filter(col("id") === 6), "id", "vec", 3, "cosine")
      .orderBy("rnk").select("id").as[Long].collect()
    assert(batch.toSeq == Seq(7L, 8L, 9L)) // self excluded; ties by id
  }

  test("excludeIds removes the query row") {
    val res = Knn.topK(corpus, "id", "vec", Seq(1f, 0f), 2, "cosine", excludeIds = Seq(1L))
      .select("id").as[Long].collect()
    assert(res.toSeq == Seq(5L, 3L))
  }

  test("result distances are monotone non-decreasing") {
    val d = Knn.topK(corpus, "id", "vec", Seq(0.5f, 0.5f), 5, "l2")
      .select("dist").as[Double].collect()
    assert(d.toSeq == d.sorted.toSeq)
  }

  test("preFilter restricts the candidate set before distance") {
    val withLabel = corpus.withColumn("lbl", col("id") % 2)
    val res = Knn.topK(withLabel, "id", "vec", Seq(1f, 0f), 5, "cosine",
      preFilter = Some(col("lbl") === 0)).select("id").as[Long].collect()
    assert(res.toSet == Set(2L, 4L))
  }

  test("batch kNN: per-query rank, self excluded") {
    val queries = corpus.filter(col("id") <= 2).select(col("id"), col("vec"))
    val res = Knn.topKBatch(corpus, "id", "vec", queries, "id", "vec", 2, "cosine")
      .select("qid", "rnk", "id").as[(Long, Int, Long)].collect().sorted
    assert(res.forall { case (qid, _, id) => qid != id })
    assert(res.count(_._1 == 1L) == 2 && res.count(_._1 == 2L) == 2)
    // query (1,0): nearest non-self is (0.9,0.1)=id5 at rnk 1, then (1,1)=id3
    assert(res.filter(_._1 == 1L).map(_._3).toSeq == Seq(5L, 3L))
  }

  test("batch kNN plans a broadcast of the query side") {
    val queries = corpus.limit(2)
    val plan = Knn.topKBatch(corpus, "id", "vec", queries, "id", "vec", 2, "cosine")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), s"expected broadcast join in plan:\n$plan")
  }

  test("hardNegatives: nearest DIFFERENT-label rows per query, broadcast") {
    val labeled = Seq(
      (1L, Seq(1f, 0f), 0), (2L, Seq(0.9f, 0.1f), 0), // query 1's own class
      (3L, Seq(0.95f, 0.05f), 1),                     // near miss, other class
      (4L, Seq(0f, 1f), 1), (5L, Seq(-1f, 0f), 2)
    ).toDF("id", "vec", "label")
    val q = labeled.filter(col("id") === 1)
    val res = Knn.hardNegatives(labeled, "id", "vec", "label",
        q, "id", "vec", "label", k = 2)
      .orderBy("rnk").select("id", "label").as[(Long, Int)].collect()
    // same-label 1/2 excluded; 3 is the hard negative, then 4
    assert(res.toSeq == Seq((3L, 1), (4L, 1)))
    val plan = Knn.hardNegatives(labeled, "id", "vec", "label",
        q, "id", "vec", "label", k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), s"expected broadcast join in plan:\n$plan")
  }
}
