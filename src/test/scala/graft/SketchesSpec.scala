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

  test("kmvPairwiseOverlap: exact branch below k reports true union/intersection") {
    // g1 = {a,b,c}, g2 = {b,c,d}, g3 = {x}: all sketches exhaustive at
    // k=16, so the estimator branch is bypassed and sizes are exact
    val df = Seq("g1" -> "a", "g1" -> "b", "g1" -> "c",
      "g2" -> "b", "g2" -> "c", "g2" -> "d", "g3" -> "x",
      "g1" -> "a" /* dup must not count */).toDF("g", "v")
    val out = Sketches.kmvPairwiseOverlap(df, "g", col("v"), k = 16)
      .orderBy("g_a", "g_b").collect()
    assert(out.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("g1", "g2"), ("g1", "g3"), ("g2", "g3")))
    val r12 = out(0)
    assert(r12.getLong(2) == 4L, "union sketch must hold all 4 distinct")
    assert(r12.getDouble(3) == 0.5, s"J({a,b,c},{b,c,d}) = 2/4, got $r12")
    assert(r12.getDouble(4) == 4.0 && r12.getDouble(5) == 2.0)
    val r13 = out(1)
    assert(r13.getDouble(3) == 0.0 && r13.getDouble(4) == 4.0
      && r13.getDouble(5) == 0.0)
  }

  test("kmvPairwiseOverlap: estimator branch tracks true overlap within KMV error") {
    // two 4000-value sets sharing half their values -> J = 1/3,
    // |union| = 6000; k=64 keeps the sketch well below the set sizes.
    // Long value strings: the default spread hash is a positional
    // polynomial whose range collapses on very short strings (the same
    // reason kmvDistinct's spec uses "value_%d" — and the scaladoc says
    // to use xxhash64 in production)
    val a = (0 until 4000).map(i => ("a", s"value_$i"))
    val b = (2000 until 6000).map(i => ("b", s"value_$i"))
    val out = Sketches.kmvPairwiseOverlap((a ++ b).toDF("g", "v"),
      "g", col("v"), k = 64).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getLong(2) == 64L, "union sketch must be full at k")
    val (j, u, inter) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
    assert(math.abs(j - 1.0 / 3) < 0.2, s"J estimate $j too far from 1/3")
    assert(math.abs(u - 6000.0) / 6000.0 < 0.5, s"union estimate $u too far")
    assert(math.abs(inter - 2000.0) / 2000.0 < 0.7, s"inter estimate $inter too far")
  }

  test("count-min sketch: never undercounts, exact when collision-free, absent reads 0") {
    // 20 tokens with known frequencies: tok_i appears i+1 times
    val toks = (0 until 20).flatMap(i => Seq.fill(i + 1)(s"tok_$i")).toDF("t")
    val exact = (0 until 20).map(i => s"tok_$i" -> (i + 1).toLong).toMap
    val probes = exact.keys.toSeq :+ "absent-token"
    // wide sketch (w >> vocab): collisions are possible but unlikely per
    // row, and with d=4 rows the MIN recovers the exact count
    val wide = Sketches.countMinSketch(toks, col("t"), d = 4, w = 4096)
    val wideEst = Sketches.countMinEstimate(wide, probes, d = 4, w = 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, n) =>
      assert(wideEst(t) == n, s"$t: wide-sketch estimate ${wideEst(t)} != exact $n")
    }
    assert(wideEst("absent-token") == 0L)
    // narrow sketch (w < vocab forces collisions): the CMS guarantee is
    // one-sided — estimates may exceed but NEVER undercount
    val narrow = Sketches.countMinSketch(toks, col("t"), d = 2, w = 8)
    val narrowEst = Sketches.countMinEstimate(narrow, probes, d = 2, w = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, n) =>
      assert(narrowEst(t) >= n, s"$t: CMS undercounted ${narrowEst(t)} < $n")
    }
    // total mass conservation per row: every row's cells sum to N tokens
    val n = toks.count()
    val perRow = narrow.groupBy("r").agg(sum("cnt").as("s"))
      .select("s").as[Long].collect()
    assert(perRow.length == 2 && perRow.forall(_ == n))
  }

  test("bottom-k quantiles: estimates land within rank tolerance of exact quantiles") {
    // values 1..1000 keyed by a string id: exact quantile q is ~1000q; the
    // 64-row hash sample estimates it within the +-O(1/sqrt(k)) rank band
    val rows = (1 to 1000).map(i => (s"key_$i", i)).toDF("id", "value")
    val got = Sketches.bottomKQuantiles(rows, col("id"), col("value"),
        k = 64, qs = Seq(0.25, 0.5, 0.75))
      .collect().map(r => r.getDouble(0) -> (r.getLong(1), r.getDouble(2))).toMap
    got.foreach { case (q, (n, est)) =>
      assert(n == 64L)
      // 3/sqrt(64) = 0.375 rank tolerance -> generous but non-vacuous
      assert(math.abs(est / 1000.0 - q) < 0.375, s"q=$q est=$est way off")
    }
  }

  test("bottom-k quantiles: k >= corpus degenerates to exact nearest-rank") {
    val rows = (1 to 10).map(i => (s"k$i", i * 10)).toDF("id", "value")
    val got = Sketches.bottomKQuantiles(rows, col("id"), col("value"),
        k = 100, qs = Seq(0.1, 0.5, 1.0))
      .collect().map(r => r.getDouble(0) -> r.getDouble(2)).toMap
    // nearest-rank over ALL 10 values: ceil(0.1*10)=1 -> 10,
    // ceil(0.5*10)=5 -> 50, ceil(1.0*10)=10 -> 100
    assert(got == Map(0.1 -> 10.0, 0.5 -> 50.0, 1.0 -> 100.0))
  }

  test("bottom-k quantiles: sample membership is deterministic across runs") {
    val rows = (1 to 500).map(i => (s"d$i", i.toDouble)).toDF("id", "value")
    def run() = Sketches.bottomKQuantiles(rows, col("id"), col("value"),
      k = 32, qs = Seq(0.5)).select("est").as[Double].head()
    assert(run() == run())
  }

  test("bottom-k quantiles rejects bad k and out-of-range quantiles") {
    val rows = Seq(("a", 1)).toDF("id", "value")
    intercept[IllegalArgumentException] {
      Sketches.bottomKQuantiles(rows, col("id"), col("value"), 1, Seq(0.5))
    }
    intercept[IllegalArgumentException] {
      Sketches.bottomKQuantiles(rows, col("id"), col("value"), 8, Seq(0.0))
    }
  }

  test("bottom-k quantiles exclude NULL values before sampling") {
    val rows = ((1 to 40).map(i => (s"k$i", Some(i * 10))) ++
      Seq(("knull1", None), ("knull2", None))).toDF("id", "value")
    val got = Sketches.bottomKQuantiles(rows, col("id"), col("value"),
        k = 64, qs = Seq(0.1, 1.0))
      .collect().map(r => r.getDouble(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // 40 non-null values, exact nearest-rank: q=0.1 -> rank 4 -> 40;
    // a sampled NULL would have nulled the low quantile instead
    assert(got(0.1) == (40L, 40.0))
    assert(got(1.0) == (40L, 400.0))
  }
}
