package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Events

class EventsSpec extends SparkTestBase {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("intervalJoin equals the direct theta-join on random event sets") {
    // timestamps drawn WIDER than the window so bins are exercised both
    // within and across boundaries; several keys, duplicates allowed
    val gen = Gen.listOfN(300, for {
      k <- Gen.chooseNum(1, 5)
      ts <- Gen.chooseNum(1000000L, 40000000L)
    } yield (k, ts))
    val rows = sample(gen, 3L).zipWithIndex.map { case ((k, ts), i) => (i.toLong, k, ts) }
    val l = rows.toDF("l_id", "k", "l_us")
    val r = rows.map { case (i, k, ts) => (i + 1000L, k, ts) }.toDF("r_id", "k", "r_us")
    val (lo, hi) = (0L, 5000000L)
    val binned = Events.intervalJoin(l, r, Seq("k"), "l_us", "r_us", lo, hi)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    val theta = l.join(r, Seq("k"))
      .filter(col("l_us") - col("r_us") >= lo && col("l_us") - col("r_us") <= hi)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    assert(binned == theta)
    assert(theta.nonEmpty, "degenerate fixture: no pairs at all")
  }

  test("intervalJoin rejects identically-named timestamp columns up front") {
    val l = Seq((1L, 1, 10L)).toDF("l_id", "k", "us")
    val r = Seq((2L, 1, 10L)).toDF("r_id", "k", "us")
    val e = intercept[IllegalArgumentException] {
      Events.intervalJoin(l, r, Seq("k"), "us", "us", 0L, 100L)
    }
    assert(e.getMessage.contains("rename"))
  }

  test("intervalJoin handles ts column names that need backtick quoting") {
    // dotted names parse as nested-field access unless quoted — the bin
    // expressions and the post-join filter must both survive them
    val l = Seq((1L, 1, 10000000L), (2L, 1, 20000000L)).toDF("l_id", "k", "l.us")
    val r = Seq((10L, 1, 9000000L), (11L, 1, 25000000L)).toDF("r_id", "k", "r us")
    val got = Events.intervalJoin(l, r, Seq("k"), "l.us", "r us", 0L, 2000000L)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L)))
  }

  test("intervalJoin rejects inputs already carrying a __bin column") {
    val l = Seq((1L, 1, 10L, 0L)).toDF("l_id", "k", "l_us", "__bin")
    val r = Seq((2L, 1, 10L)).toDF("r_id", "k", "r_us")
    val e = intercept[IllegalArgumentException] {
      Events.intervalJoin(l, r, Seq("k"), "l_us", "r_us", 0L, 100L)
    }
    assert(e.getMessage.contains("__bin"))
  }

  test("intervalJoin boundary deltas are inclusive; outside-by-1us excluded") {
    val l = Seq((1L, 1, 10000000L)).toDF("l_id", "k", "l_us")
    val r = Seq(
      (10L, 1, 10000000L),           // delta 0       -> in
      (11L, 1, 9000000L),            // delta 1s      -> in (== max)
      (12L, 1, 8999999L),            // delta max+1us -> out
      (13L, 1, 10000001L),           // delta -1us    -> out
      (14L, 2, 10000000L))           // other key     -> out
      .toDF("r_id", "k", "r_us")
    val got = Events.intervalJoin(l, r, Seq("k"), "l_us", "r_us", 0L, 1000000L)
      .select("r_id").as[Long].collect().toSet
    assert(got == Set(10L, 11L))
  }

  test("property: intervalJoin matches theta across random window shapes") {
    val rows = sample(Gen.listOfN(200, for {
      k <- Gen.chooseNum(1, 4)
      ts <- Gen.chooseNum(100000000L, 130000000L)
    } yield (k, ts)), 17L).zipWithIndex.map { case ((k, ts), i) => (i.toLong, k, ts) }
    val l = rows.toDF("l_id", "k", "l_us")
    val r = rows.map { case (i, k, ts) => (i + 1000L, k, ts) }.toDF("r_id", "k", "r_us")
    // windows spanning: tiny, zero-width, negative-lo, far-offset
    val windows = Seq((0L, 1L), (5L, 5L), (-7000000L, 3000000L),
      (10000000L, 11000000L), (-20000000L, -10000000L))
    for ((lo, hi) <- windows) {
      val binned = Events.intervalJoin(l, r, Seq("k"), "l_us", "r_us", lo, hi)
        .select("l_id", "r_id").as[(Long, Long)].collect().toSet
      val theta = l.join(r, Seq("k"))
        .filter(col("l_us") - col("r_us") >= lo && col("l_us") - col("r_us") <= hi)
        .select("l_id", "r_id").as[(Long, Long)].collect().toSet
      assert(binned == theta, s"window [$lo,$hi]: binned ${binned.size} != theta ${theta.size}")
    }
  }

  test("intervalJoin with a negative-min window (future events) matches theta") {
    val l = Seq((1L, 1, 10000000L), (2L, 1, 20000000L)).toDF("l_id", "k", "l_us")
    val r = (0 until 40).map(i => (100L + i, 1, 9500000L + i * 300000L))
      .toDF("r_id", "k", "r_us")
    val (lo, hi) = (-2000000L, 2000000L)
    val binned = Events.intervalJoin(l, r, Seq("k"), "l_us", "r_us", lo, hi)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    val theta = l.join(r, Seq("k"))
      .filter(col("l_us") - col("r_us") >= lo && col("l_us") - col("r_us") <= hi)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    assert(binned == theta && theta.nonEmpty)
  }

  test("retentionCohorts: hand-built triangle; re-activity within a day counts once") {
    val day = 86400000000L
    // u1: days 0,1 (twice on day 0 — must count once)
    // u2: day 0 only;  u3: days 1,2
    val ev = Seq(
      (1L, 0L * day + 5L), (1L, 0L * day + 99L), (1L, 1L * day + 1L),
      (2L, 0L * day + 7L),
      (3L, 1L * day + 3L), (3L, 2L * day + 3L)
    ).toDF("user_id", "us")
    val rs = Events.retentionCohorts(ev, "user_id", "us")
      .orderBy("cohort_day", "day_offset")
      .select("cohort_day", "day_offset", "cohort_n", "n_active", "retention")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(rs == Seq(
      (0L, 0L, 2L, 2L, 1.0),  // u1, u2
      (0L, 1L, 2L, 1L, 0.5),  // u1
      (1L, 0L, 1L, 1L, 1.0),  // u3
      (1L, 1L, 1L, 1L, 1.0))) // u3
  }
}
