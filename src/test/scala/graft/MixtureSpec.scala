package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ann, Mixture}

class MixtureSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus() = Seq(
    ("a1", "s1", 100L), ("a2", "s1", 100L), ("a3", "s1", 100L), ("a4", "s1", 100L),
    ("b1", "s2", 50L), ("b2", "s2", 50L),
    ("c1", "s3", 10L)
  ).toDF("id", "source", "cost")

  test("sampleToBudget caps rate at 1 and drops unweighted sources") {
    // s2 target = 1000*0.5 = 500 > its 100 total -> rate 1, all rows kept;
    // s3 has no weight -> rate 0, nothing kept
    val out = Mixture.sampleToBudget(corpus(), "id", "source", "cost",
      Map("s1" -> 0.5, "s2" -> 0.5), budget = 1000L)
    val kept = out.select("id", "rate").as[(String, Double)].collect().toMap
    assert(kept.keySet.filter(_.startsWith("b")) == Set("b1", "b2"))
    assert(kept("b1") == 1.0)
    assert(!kept.keySet.exists(_.startsWith("c")), "unweighted source must drop")
    // s1: rate = 1000*0.5/400 = 1.25 -> capped at 1 too
    assert(kept.keySet.filter(_.startsWith("a")).size == 4)
  }

  test("sampleToBudget drops an UNWEIGHTED all-zero-cost source (0/0 guard)") {
    // s3 has weight 0 and total cost 0: the raw rate is 0/0 = NaN, and
    // least(1.0, NaN) = 1.0 (NaN sorts greatest) would keep every row —
    // the when(w === 0, 0.0) guard must fire first
    val zeroCost = corpus().withColumn("cost",
      when(col("source") === "s3", lit(0L)).otherwise(col("cost")))
    val out = Mixture.sampleToBudget(zeroCost, "id", "source", "cost",
      Map("s1" -> 0.5, "s2" -> 0.5), budget = 1000L)
    val kept = out.select("id").as[String].collect().toSet
    assert(!kept.exists(_.startsWith("c")), "unweighted zero-cost source must drop")
    assert(kept.count(_.startsWith("b")) == 2, "weighted sources unaffected by the guard")
  }

  test("sampleToBudget subsamples an over-budget source deterministically") {
    val big = (0 until 200).map(i => (s"id$i", "s1", 10L)).toDF("id", "source", "cost")
    val out = Mixture.sampleToBudget(big, "id", "source", "cost",
      Map("s1" -> 1.0), budget = 500L) // rate = 500/2000 = 0.25
    val ids = out.select("id").as[String].collect().sorted
    assert(ids.nonEmpty && ids.length < 200, s"expected a strict subsample, got ${ids.length}")
    val again = Mixture.sampleToBudget(big.repartition(7), "id", "source", "cost",
      Map("s1" -> 1.0), budget = 500L).select("id").as[String].collect().sorted
    assert(ids.sameElements(again), "sample must be layout-independent")
  }

  test("sampleTemperature: alpha flattens the mixture toward small sources") {
    // totals: s1=400, s2=100, s3=10 (sum 510). At alpha=1 every source
    // keeps the same rate B/510 (natural proportions); at alpha=0 each
    // source gets an equal budget share; sqrt sits strictly between.
    // Rates are read off SURVIVING rows, so each source carries enough
    // rows that the deterministic hash keeps at least one at every rate.
    val df = ((1 to 200).map(i => (s"a$i", "s1", 2L)) ++
      (1 to 100).map(i => (s"b$i", "s2", 1L)) ++
      (1 to 10).map(i => (s"c$i", "s3", 1L))).toDF("id", "source", "cost")
    def ratesAt(alpha: Double): Map[String, Double] =
      Mixture.sampleTemperature(df, "id", "source", "cost", alpha, budget = 100L)
        .select("source", "rate").distinct().as[(String, Double)].collect().toMap
    val nat = ratesAt(1.0); val mid = ratesAt(0.5); val flat = ratesAt(0.0)
    // B·(tot/wsum)/tot is B/wsum mathematically but rounds per source —
    // equal to within an ulp, not bit-equal
    assert(nat.values.forall(r => math.abs(r - 100.0 / 510.0) < 1e-12))
    assert(math.abs(nat("s1") - 100.0 / 510.0) < 1e-12)
    // equal shares at alpha=0: s1 rate = (100/3)/400, s3 capped at 1
    assert(math.abs(flat("s1") - 100.0 / 3.0 / 400.0) < 1e-12)
    assert(flat("s3") == 1.0)
    // big source: flat < sqrt < natural; small source: natural < sqrt
    assert(flat("s1") < mid("s1") && mid("s1") < nat("s1"))
    assert(nat("s3") < mid("s3") && mid("s3") < flat("s3"))
  }

  test("sampleTemperature: zero-cost source rates 0, never NaN") {
    val df = Seq(("x1", "s1", 0L), ("x2", "s2", 100L)).toDF("id", "source", "cost")
    val out = Mixture.sampleTemperature(df, "id", "source", "cost",
      alpha = 0.5, budget = 10L)
    assert(!out.select("id").as[String].collect().contains("x1"))
    intercept[IllegalArgumentException] {
      Mixture.sampleTemperature(df, "id", "source", "cost", alpha = -0.1, budget = 10L)
    }
  }

  test("groupSplit: group-atomic, total, deterministic") {
    val df = (1 to 200).map(i => (i.toLong, s"src${i % 23}")).toDF("id", "source")
    val out = Mixture.groupSplit(df, "source",
      Seq("train" -> 0.6, "val" -> 0.2, "test" -> 0.2))
    // every row got a split; every source maps to exactly one split
    assert(out.filter(col("split").isNull).count() == 0)
    val perSrc = out.groupBy("source").agg(countDistinct(col("split")).as("k"))
    assert(perSrc.filter(col("k") =!= 1).count() == 0)
    // deterministic across evaluations
    val a = out.select("id", "split").as[(Long, String)].collect().toMap
    val b = Mixture.groupSplit(df, "source",
        Seq("train" -> 0.6, "val" -> 0.2, "test" -> 0.2))
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(a == b)
    // all three splits non-empty over 23 sources (hash-spread sanity)
    assert(out.select("split").distinct().count() == 3)
    intercept[IllegalArgumentException] {
      Mixture.groupSplit(df, "source", Seq("a" -> 0.5, "b" -> 0.4))
    }
    intercept[IllegalArgumentException] {
      Mixture.groupSplit(df, "source", Seq("a" -> 0.5, "a" -> 0.5))
    }
  }

  test("reshard: every row exactly once, pos contiguous from 1 per shard") {
    val docs = spark.read.parquet(sf("documents"))
    val out = Mixture.reshard(docs, "doc_id", 4).select("doc_id", "shard", "pos").cache()
    try {
      assert(out.count() == docs.count())
      assert(out.select("doc_id").distinct().count() == docs.count())
      val bad = out.groupBy("shard")
        .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"))
        .filter(col("mx") =!= col("n") || col("mn") =!= 1).count()
      assert(bad == 0, "pos must be 1..n within each shard")
    } finally out.unpersist()
  }

  test("cellBalancedSample keeps at most perCell rows per cell, deterministically") {
    val emb = spark.read.parquet(sf("embeddings"))
    val m = Ann.buildIvfSeeded(emb, "vec_id", "embedding", 0L until 4L)
    val out = Mixture.cellBalancedSample(m.assigned, "vec_id", perCell = 3)
    val perCell = out.groupBy("cell").count().as[(Int, Long)].collect().toMap
    assert(perCell.values.forall(_ <= 3))
    val a = out.select("vec_id").as[Long].collect().sorted
    val b = Mixture.cellBalancedSample(m.assigned.repartition(5), "vec_id", perCell = 3)
      .select("vec_id").as[Long].collect().sorted
    assert(a.sameElements(b), "sample must be layout-independent")
  }

  test("duplicatePassages finds only cross-doc recurring n-grams") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a quick brown fox jumps over nothing at all"),
      (3L, "completely unrelated words here nothing shared with others")
    ).toDF("doc_id", "text")
    val out = graft.operators.Dedup.duplicatePassages(docs, "doc_id", "text", n = 5)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // "quick brown fox jumps over" is the only shared 5-gram (docs 1,2)
    assert(out.toSeq == Seq((1L, 1L, 2L), (2L, 1L, 2L)))
  }

  test("duplicatePassages counts a doc's repeated passage once") {
    val docs = Seq(
      (1L, "x y z w v x y z w v"), // internal repeat of "x y z w v"
      (2L, "x y z w v and more tokens")
    ).toDF("doc_id", "text")
    val out = graft.operators.Dedup.duplicatePassages(docs, "doc_id", "text", n = 5)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.forall(_._2 >= 1))
    // doc 1's self-repeat must not inflate its dup count for that passage
    val doc1 = out.find(_._1 == 1L).get
    assert(doc1._3 == 2L, "spread counts distinct docs, not occurrences")
  }

  test("packSequences replays a local packing over reshard's own order") {
    val docs = (0L until 200L).map(i =>
      (i, ("w " * (1 + (i % 37).toInt)).trim)).toDF("doc_id", "text")
      .withColumn("n_tokens",
        graft.functions.TextAnalysis.tokenCount(col("text")))
    val budget = 50
    val nShards = 4
    val got = Mixture.packSequences(docs, "doc_id", "n_tokens", budget, nShards)
      .as[(Int, Long, Long, Long)].collect()
      .map { case (s, q, d, t) => (s, q) -> ((d, t)) }.toMap
    // reference: walk reshard's public (shard, pos) order, accumulate
    val order = Mixture.reshard(docs, "doc_id", nShards)
      .select("doc_id", "shard", "pos").as[(Long, Int, Int)].collect()
    val nt = docs.select("doc_id", "n_tokens").as[(Long, Int)].collect().toMap
    val want = scala.collection.mutable.Map[(Int, Long), (Long, Long)]()
    order.groupBy(_._2).foreach { case (shard, rows) =>
      var cum = 0L
      rows.sortBy(_._3).foreach { case (id, _, _) =>
        val n = nt(id).toLong
        val seq = cum / budget // start-offset assignment
        cum += n
        val (d, t) = want.getOrElse((shard, seq), (0L, 0L))
        want((shard, seq)) = (d + 1, t + n)
      }
    }
    assert(got == want.toMap)
    // conservation: every token lands in exactly one sequence
    assert(got.values.map(_._2).sum == nt.values.map(_.toLong).sum)
  }

  test("packSequences: an over-budget doc straddles; assignment matches the replay") {
    val docs = Seq((1L, 30), (2L, 5), (3L, 7)).toDF("doc_id", "n_tokens")
    val out = Mixture.packSequences(docs, "doc_id", "n_tokens",
      budget = 10, nShards = 1).as[(Int, Long, Long, Long)].collect()
    assert(out.map(_._3).sum == 3 && out.map(_._4).sum == 42L)
    // replay over reshard's public order (hash-order-independent check)
    val order = Mixture.reshard(docs, "doc_id", nShards = 1)
      .select("doc_id", "pos").as[(Long, Int)].collect().sortBy(_._2).map(_._1)
    val nt = Map(1L -> 30L, 2L -> 5L, 3L -> 7L)
    var cum = 0L
    val want = order.map { id => val s = cum / 10; cum += nt(id); (s, nt(id)) }
      .groupBy(_._1).map { case (s, xs) => s -> ((xs.length.toLong, xs.map(_._2).sum)) }
    assert(out.map(t => t._2 -> ((t._3, t._4))).toMap == want)
    // whatever the order, the last doc starts at offset >= 12 (the two
    // smaller docs total 12), so the 30-token straddle forces seq >= 1
    assert(out.map(_._2).max >= 1L)
  }

  test("packSequences: null token counts pack as zero-width docs") {
    val docs = Seq((1L, Some(5)), (2L, None), (3L, Some(6)))
      .toDF("doc_id", "n_tokens")
    val out = Mixture.packSequences(docs, "doc_id", "n_tokens",
      budget = 10, nShards = 1).as[(Int, Long, Long, Long)].collect()
    assert(out.map(_._3).sum == 3, "the null-count doc still takes a slot")
    assert(out.map(_._4).sum == 11L, "null contributes zero tokens, not NULL")
    assert(out.forall(_._2 >= 0L), "no NULL/negative sequence ids")
  }
}
