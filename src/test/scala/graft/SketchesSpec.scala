package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  test("kmvDistinct: exact below k, estimator within KMV error above, dup-invariant") {
    // group 'small': 10 distinct values (< k) -> exact count, est = count
    // group 'big': 5000 distinct values -> estimator branch
    val small = (0 until 10).map(i => ("small", s"s$i"))
    val big = (0 until 5000).map(i => ("big", s"value_$i"))
    val df = (small ++ big).toDF("g", "v")
    val out = Sketches.kmvDistinct(df, "g", col("v"), k = 64)
      .orderBy("g").collect()
    val bigRow = out(0); val smallRow = out(1)
    assert(smallRow.getString(0) == "small" && smallRow.getLong(1) == 10L
      && smallRow.getDouble(3) == 10.0)
    assert(bigRow.getString(0) == "big" && bigRow.getLong(1) == 64L)
    // KMV standard error is ~1/sqrt(k-1) ≈ 12.6%; 50% is a ~4σ guard that
    // still catches an off-by-order bug or a broken hash
    val est = bigRow.getDouble(3)
    assert(math.abs(est - 5000.0) / 5000.0 < 0.5,
      s"estimate $est too far from 5000")
    // duplicates must not move anything: the sketch sees distinct hashes
    val dup = df.union(df.filter(col("g") === "big").limit(500))
    val out2 = Sketches.kmvDistinct(dup, "g", col("v"), k = 64)
      .orderBy("g").collect()
    assert(out.map(_.toSeq).toSeq == out2.map(_.toSeq).toSeq)
  }
}
