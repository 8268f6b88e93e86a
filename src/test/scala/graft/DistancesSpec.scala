package graft

import org.apache.spark.sql.functions._
import graft.functions.Distances

class DistancesSpec extends SparkTestBase {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Double =
    Seq(1).toDF("x").select(c.as("d")).head.getDouble(0)

  private def vec(xs: Float*) = typedLit(xs.toSeq)

  test("dot product on known vectors") {
    assert(one(Distances.dot(vec(1f, 2f, 3f), vec(4f, 5f, 6f))) === 32.0)
  }

  test("squared L2 on known vectors") {
    assert(one(Distances.l2Sq(vec(1f, 2f), vec(4f, 6f))) === 25.0)
  }

  test("inner-product distance is 1 - dot") {
    assert(one(Distances.ipDist(vec(1f, 0f), vec(0.5f, 0f))) === 0.5)
  }

  test("cosine distance: identical vectors -> 0, orthogonal -> 1, opposite -> 2") {
    assert(math.abs(one(Distances.cosineDist(vec(1f, 2f, 3f), vec(1f, 2f, 3f)))) < 1e-12)
    assert(math.abs(one(Distances.cosineDist(vec(1f, 0f), vec(0f, 1f))) - 1.0) < 1e-12)
    assert(math.abs(one(Distances.cosineDist(vec(1f, 0f), vec(-1f, 0f))) - 2.0) < 1e-12)
  }

  test("distance symmetry d(a,b) = d(b,a)") {
    val a = vec(0.3f, -1.2f, 2.5f); val b = vec(1.1f, 0.4f, -0.7f)
    assert(one(Distances.cosineDist(a, b)) === one(Distances.cosineDist(b, a)))
    assert(one(Distances.l2Sq(a, b)) === one(Distances.l2Sq(b, a)))
  }

  test("bySpace rejects unknown space") {
    intercept[IllegalArgumentException] {
      Distances.bySpace("manhattan")(vec(1f), vec(1f))
    }
  }

  test("accumulates in Double even for float inputs") {
    // 1e7 as float squared then summed would lose the +2 in float32
    val v = vec(1e7f, 1f, 1f)
    assert(one(Distances.normSq(v)) === 1.0e14 + 2.0)
  }
}
