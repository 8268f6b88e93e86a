package graft

import org.apache.spark.sql.functions._
import graft.expressions.GraftExtensions
import graft.functions.Distances

class VectorDistanceSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(sf("embeddings"))

  test("native expression matches the HOF reference bit-for-bit on real data") {
    // pair every vector with the vector of id 0
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    val pairs = emb.crossJoin(q)
    val diff = pairs.select(
        Distances.cosineDist(col("embedding"), col("qe")).as("n_cos"),
        Distances.cosineDistHof(col("embedding"), col("qe")).as("h_cos"),
        Distances.l2Sq(col("embedding"), col("qe")).as("n_l2"),
        Distances.l2SqHof(col("embedding"), col("qe")).as("h_l2"),
        Distances.ipDist(col("embedding"), col("qe")).as("n_ip"),
        Distances.ipDistHof(col("embedding"), col("qe")).as("h_ip"))
      .filter(col("n_cos") =!= col("h_cos") ||
              col("n_l2") =!= col("h_l2") ||
              col("n_ip") =!= col("h_ip"))
    assert(diff.count() == 0)
  }

  test("null contract matches zip_with/aggregate semantics") {
    val df = Seq(
      (1L, Some(Seq(1f, 2f)), Some(Seq(3f, 4f))),     // ok
      (2L, Some(Seq(1f, 2f, 3f)), Some(Seq(1f, 2f))), // length mismatch -> null
      (3L, None, Some(Seq(1f, 2f)))                    // null array -> null
    ).toDF("id", "a", "b")
    val r = df.select(col("id"), Distances.dot(col("a"), col("b")).as("d"))
      .orderBy("id").collect()
    assert(r(0).getDouble(1) == 11.0)
    assert(r(1).isNullAt(1) && r(2).isNullAt(1))
  }

  test("null element -> null (matches HOF)") {
    val df = Seq((Seq[java.lang.Float](1f, null, 3f), Seq[java.lang.Float](1f, 2f, 3f)))
      .toDF("a", "b")
    val r = df.select(
      Distances.dot(col("a"), col("b")).as("n"),
      Distances.dotHof(col("a"), col("b")).as("h")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("the distance scan stays inside WholeStageCodegen") {
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    val df = emb.crossJoin(broadcast(q))
      .select(Distances.cosineDist(col("embedding"), col("qe")).as("dist"))
    df.collect() // materialize so AQE finalizes the physical plan
    val plan = df.queryExecution.executedPlan.toString
    // '*(n)' prefix = operator runs inside WholeStageCodegen stage n
    assert("""\*\(\d+\) Project \[vector_dist""".r.findFirstIn(plan).isDefined,
      s"distance Project not inside a codegen stage:\n$plan")
    assert(!plan.toLowerCase.contains("codegenfallback"), s"fallback present:\n$plan")
  }

  test("SQL registration: graft_* functions callable from spark.sql") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_cosine_dist(array(1.0F, 0.0F), array(0.0F, 1.0F)) AS c,
        |       graft_l2_dist(array(1.0F, 2.0F), array(4.0F, 6.0F)) AS l,
        |       graft_ip_dist(array(1.0F, 0.0F), array(0.5F, 0.0F)) AS i,
        |       graft_dot(array(1.0F, 2.0F, 3.0F), array(4.0F, 5.0F, 6.0F)) AS d
        |""".stripMargin).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) == 25.0 && r.getDouble(2) == 0.5 && r.getDouble(3) == 32.0)
  }
}
