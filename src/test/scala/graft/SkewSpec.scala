package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends SparkTestBase {
  import spark.implicits._

  // 90% of fact rows share one hot key
  private lazy val fact = ((1 to 900).map(i => (7L, i.toDouble)) ++
    (1 to 100).map(i => ((i % 5).toLong, i.toDouble))).toDF("k", "v")
  private lazy val dim = Seq((7L, "hot"), (0L, "a"), (1L, "b"), (2L, "c"),
    (3L, "d"), (4L, "e")).toDF("k", "name")

  test("salted join returns exactly the unsalted join's rows") {
    val plain = fact.join(dim, "k").select("k", "v", "name")
      .as[(Long, Double, String)].collect().sorted
    val salted = Skew.saltedJoin(fact, dim, "k", numSalts = 8)
      .select("k", "v", "name").as[(Long, Double, String)].collect().sorted
    assert(salted.toSeq == plain.toSeq)
  }

  test("salted join spreads the hot key over multiple salt values") {
    // drive the PRODUCTION salt expression, not a re-derived copy
    val salts = fact.withColumn("__salt", Skew.saltExpr("k", 8))
      .filter(col("k") === 7).select("__salt").distinct().count()
    assert(salts > 1, "hot key landed on a single salt")
  }

  test("two-phase agg equals single-phase for decomposable aggregates") {
    val plain = fact.groupBy("k").agg(
        sum("v").as("s"), count(lit(1)).as("c"), min("v").as("mn"), max("v").as("mx"))
      .as[(Long, Double, Long, Double, Double)].collect().sortBy(_._1)
    val two = Skew.twoPhaseAgg(fact, "k", 8, Map(
        "s" -> (col("v"), "sum"), "c" -> (lit(1), "count"),
        "mn" -> (col("v"), "min"), "mx" -> (col("v"), "max")))
      .select("k", "s", "c", "mn", "mx")
      .as[(Long, Double, Long, Double, Double)].collect().sortBy(_._1)
    assert(two.toSeq == plain.toSeq)
  }

  test("non-decomposable agg kind is rejected") {
    intercept[IllegalArgumentException] {
      Skew.twoPhaseAgg(fact, "k", 4, Map("bad" -> (col("v"), "avg"))).collect()
    }
  }
}
