package graft

import org.apache.spark.sql.functions._

import graft.functions.TypedAggs

class TypedAggsSpec extends SparkTestBase {
  import spark.implicits._

  test("typed centroid equals the relational mean-pooling form per label") {
    val emb = spark.read.parquet(sf("embeddings"))
    val typed = emb.select(col("label"), col("embedding").cast("array<float>").as("embedding"))
      .as[(Int, Seq[Float])]
      .groupByKey(_._1).mapValues(_._2)
      .agg(TypedAggs.centroid)
      .collect().toMap
    val relational = emb
      .select(col("label"), posexplode(col("embedding").cast("array<double>")))
      .groupBy("label", "pos").agg(sum("col").as("s"), count(lit(1)).as("n"))
      .select(col("label"), col("pos"), (col("s") / col("n")).as("m"))
      .as[(Int, Int, Double)].collect()
      .groupBy(_._1).map { case (l, rows) => l -> rows.sortBy(_._2).map(_._3).toSeq }
    assert(typed.keySet == relational.keySet)
    for (l <- typed.keySet) {
      val (t, r) = (typed(l), relational(l))
      assert(t.length == r.length)
      t.zip(r).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-9, s"label $l centroid diverged: $a vs $b")
      }
    }
  }

  test("typed centroid rejects ragged vectors loudly") {
    val ds = Seq((1, Seq(1f, 2f)), (1, Seq(1f, 2f, 3f))).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      ds.groupByKey(_._1).mapValues(_._2).agg(TypedAggs.centroid).collect()
    }
    assert(e.getMessage.contains("ragged") ||
      Option(e.getCause).exists(_.getMessage.contains("ragged")))
  }

  test("typed centroid: empty vector in a group is ragged in EITHER order") {
    // regression: an empty vector used to read as "uninitialized buffer",
    // so [empty, v] silently diluted the centroid while [v, empty] threw
    for (rows <- Seq(Seq((1, Seq.empty[Float]), (1, Seq(2f, 4f))),
                     Seq((1, Seq(2f, 4f)), (1, Seq.empty[Float])))) {
      val e = intercept[org.apache.spark.SparkException] {
        rows.toDS().repartition(1).groupByKey(_._1).mapValues(_._2)
          .agg(TypedAggs.centroid).collect()
      }
      assert(e.getMessage.contains("ragged") ||
        Option(e.getCause).exists(_.getMessage.contains("ragged")))
    }
    // a group of ONLY empty vectors is well-defined: empty centroid
    val ok = Seq((1, Seq.empty[Float]), (1, Seq.empty[Float])).toDS()
      .groupByKey(_._1).mapValues(_._2).agg(TypedAggs.centroid).collect()
    assert(ok.head._2 == Seq.empty[Double])
  }
}
