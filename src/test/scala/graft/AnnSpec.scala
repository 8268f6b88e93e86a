package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.{Ann, Knn}

class AnnSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(sf("embeddings"))

  test("IVF: every row assigned to a valid cell; centroids cover nlist") {
    val m = Ann.buildIvf(emb, "vec_id", "embedding", nlist = 8)
    assert(m.centroids.length == 8)
    assert(m.assigned.count() == emb.count())
    val cells = m.assigned.select("cell").distinct().as[Int].collect().toSet
    assert(cells.subsetOf((0 until 8).toSet))
  }

  test("IVF query recall vs brute force (nprobe=nlist means exact)") {
    val m = Ann.buildIvf(emb, "vec_id", "embedding", nlist = 8)
    val q = emb.filter(col("vec_id") === 7).select("embedding").as[Seq[Float]].head()
    val exact = Knn.topK(emb, "vec_id", "embedding", q, 10, "cosine")
      .select("vec_id").as[Long].collect().toSet
    // probing ALL cells must reproduce brute force exactly
    val all = Ann.queryIvf(m.assigned, m, "vec_id", "embedding", q, 10,
      nprobe = 8, space = "cosine").select("vec_id").as[Long].collect().toSet
    assert(all == exact)
    // probing 3/8 cells: approximate but should still recall most of top-10
    val approx = Ann.queryIvf(m.assigned, m, "vec_id", "embedding", q, 10,
      nprobe = 3, space = "cosine").select("vec_id").as[Long].collect().toSet
    assert(approx.intersect(exact).size >= 5,
      s"recall too low: ${approx.intersect(exact).size}/10")
  }

  test("IVF persisted layout partition-prunes at the scan") {
    val m = Ann.buildIvf(emb, "vec_id", "embedding", nlist = 4)
    val dir = Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "ivf").toString
    Ann.writeIvf(m, dir)
    val indexed = spark.read.parquet(dir)
    val q = emb.filter(col("vec_id") === 3).select("embedding").as[Seq[Float]].head()
    val res = Ann.queryIvf(indexed, m, "vec_id", "embedding", q, 5, nprobe = 1)
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"no partition pruning in:\n$plan")
    assert(res.count() == 5)
  }

  test("writeIvf never silently promotes a user 'pb' DATA column to index layout") {
    // the pb refresh axis is EXPLICIT opt-in (withPb): a corpus that
    // happens to carry a column named pb must keep it as data
    val withPbCol = emb.limit(20).withColumn("pb", lit(7))
    val m = Ann.buildIvf(withPbCol, "vec_id", "embedding", nlist = 2)
    val dir = Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "ivf-userpb").toString
    Ann.writeIvf(m, dir) // default: no layout promotion
    val back = spark.read.parquet(dir)
    assert(back.columns.contains("pb"), "user pb column must survive as data")
    assert(back.select("pb").distinct().as[Int].collect().toSeq == Seq(7))
    // and the on-disk layout is single-axis — no pb= partition dirs
    val cellDirs = new java.io.File(dir).listFiles().filter(_.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty &&
      cellDirs.forall(!_.listFiles().exists(_.getName.startsWith("pb="))))
    // the explicit axis without the column is LOUD, not a silent no-op
    val noPb = Ann.buildIvf(emb.limit(20), "vec_id", "embedding", nlist = 2)
    val e = intercept[IllegalArgumentException](
      Ann.writeIvf(noPb, dir + "-x", withPb = true))
    assert(e.getMessage.contains("pb"))
  }

  test("IvfPruneRule: brute-force kNN over an IVF layout auto-prunes when enabled") {
    import graft.expressions.GraftExtensions
    val m = Ann.buildIvf(emb, "vec_id", "embedding", nlist = 8)
    val dir = Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "ivf-rule").toString
    Ann.writeIvf(m, dir)
    val q = emb.filter(col("vec_id") === 11).select("embedding").as[Seq[Float]].head()
    GraftExtensions.register(spark)
    def knnPlan() = {
      val df = Knn.topK(spark.read.parquet(dir), "vec_id", "embedding", q, 5, "cosine")
      val rows = df.select("vec_id").as[Long].collect().toSeq
      (rows, df.queryExecution.executedPlan.toString)
    }
    try {
      // default off: full scan, exact result
      val (exact, offPlan) = knnPlan()
      assert(!offPlan.contains("cell IN"), s"pruned while disabled:\n$offPlan")
      // enabled: plan gains a cell IN partition filter; result = nprobe query
      spark.conf.set("spark.graft.ivf.autoPrune", "true")
      spark.conf.set("spark.graft.ivf.nprobe", "2")
      val (pruned, onPlan) = knnPlan()
      assert(onPlan.contains("cell IN") || onPlan.contains("cell#"),
        s"no cell pruning in:\n$onPlan")
      // the rewrite must PRESERVE the top-k shortcut (Limit+Sort intact):
      // rebuilding through Catalyst's Limit extractor would drop the
      // LocalLimit and degrade to a global sort
      assert(onPlan.contains("TakeOrderedAndProject"),
        s"top-k shortcut destroyed by the rewrite:\n$onPlan")
      val expected = Ann.queryIvf(spark.read.parquet(dir), m, "vec_id", "embedding",
        q, 5, nprobe = 2, space = "cosine").select("vec_id").as[Long].collect().toSeq
      assert(pruned == expected)
      // sanity: with all cells probed the rewrite reproduces brute force
      spark.conf.set("spark.graft.ivf.nprobe", "8")
      assert(knnPlan()._1 == exact)
      // convergence: nprobe=1 (OptimizeIn -> EqualTo) and nprobe=8 (-> InSet
      // when >10; here a multi-value In) must not stack duplicate filters —
      // the fixed-point batch would hit max iterations if the guard missed
      for (np <- Seq("1", "8")) {
        spark.conf.set("spark.graft.ivf.nprobe", np)
        val (_, plan) = knnPlan()
        val filters = "Filter".r.findAllIn(plan).length
        assert(filters <= 3, s"stacked filters at nprobe=$np:\n$plan")
      }
    } finally {
      // reset BOTH keys — a leftover nprobe would leak into later tests
      spark.conf.set("spark.graft.ivf.autoPrune", "false")
      spark.conf.unset("spark.graft.ivf.nprobe")
    }
  }

  test("SRP bucket is deterministic and groups identical vectors") {
    val df = Seq((1L, Seq(1f, 2f, 3f, 4f)), (2L, Seq(1f, 2f, 3f, 4f)),
      (3L, Seq(-1f, -2f, -3f, -4f))).toDF("id", "vec")
    val b = df.select(col("id"), Ann.srpBucket(col("vec"), 4, 8).as("bucket"))
      .as[(Long, Long)].collect().toMap
    assert(b(1L) == b(2L))
    assert(b(1L) != b(3L)) // opposite vectors flip every sign bit
    // re-evaluation gives the same buckets (pure arithmetic, no RNG state)
    val b2 = df.select(col("id"), Ann.srpBucket(col("vec"), 4, 8).as("bucket"))
      .as[(Long, Long)].collect().toMap
    assert(b == b2)
  }

  test("int8 quantization: per-element error <= scale/2; zero vector survives") {
    val vecs = Seq(
      (1L, Seq(0.5f, -1.0f, 0.037f, 0.99f)),
      (2L, Seq(100f, -0.001f, 3.7f, -42f)),
      (3L, Seq(0f, 0f, 0f, 0f))).toDF("id", "vec")
    val rows = vecs.select(col("id"), col("vec"),
        Ann.quantizeInt8(col("vec")).as("q"))
      .select(col("id"), col("vec"),
        Ann.dequantizeInt8(col("q")).as("de"), col("q.scale").as("s"))
      .as[(Long, Seq[Float], Seq[Double], Double)].collect()
    rows.foreach { case (id, v, de, s) =>
      v.zip(de).foreach { case (x, d) =>
        assert(math.abs(x.toDouble - d) <= s / 2 + 1e-12,
          s"id=$id: |$x - $d| must be <= scale/2 = ${s / 2}")
      }
    }
    assert(rows.find(_._1 == 3L).get._3 == Seq(0.0, 0.0, 0.0, 0.0))
  }

  test("writeQuantized/readQuantized round-trip serves the same kNN as inline") {
    val emb = spark.read.parquet(sf("embeddings"))
    val path = tmpDir("quant") + "/emb"
    Ann.writeQuantized(emb, "vec_id", "embedding", path)
    val stored = Ann.readQuantized(spark, path, "vec_id", "embedding")
    val qv = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0)
    val inline = emb.select(col("vec_id"),
      Ann.dequantizeInt8(Ann.quantizeInt8(col("embedding"))).as("embedding"))
    def top(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Knn.topK(df, "vec_id", "embedding", qv, 10,
        "cosine", excludeIds = Seq(0L)).select("vec_id").as[Long].collect().toSeq
    assert(top(stored) == top(inline),
      "the materialized int8 table must answer exactly like inline quantization")
  }

  test("seeded IVF at nprobe=2 (the q32/q60 config) keeps recall@10 >= 0.9") {
    val m = Ann.buildIvfSeeded(emb, "vec_id", "embedding", 0L until 8L)
    val q = emb.filter(col("vec_id") === 0).select("embedding").as[Seq[Float]].head()
    val exact = Knn.topK(emb, "vec_id", "embedding", q, 10, "cosine",
      excludeIds = Seq(0L))
    val approx = Ann.queryIvf(m.assigned, m, "vec_id", "embedding", q, 10,
      nprobe = 2, space = "cosine", excludeIds = Seq(0L))
    val r = Ann.recallAtK(approx, exact, "vec_id").as[Double].head()
    assert(r >= 0.9, s"nprobe=2 recall@10 must stay >= 0.9, got $r")
  }

  test("Recall.measure reports recall in [0,1] for every approximate suite entry") {
    val rs = Recall.measure(spark, "/root/testdata/sf0.001")
    assert(rs.map(_._1).toSet == Set(
      "q32_ivf_knn", "q69_quantized_knn", "q60_collection_ivf_knn",
      "q61_embedding_neardup_lsh", "q64_neardup_multiprobe", "q82_neardup_multitable",
      "q136_pq_adc_knn", "q139_ivfpq_knn", "q141_ivfpq_residual_knn",
      "q148_pq_autodial_knn", "pq_scaled", "pq_trained", "maxsim_vs_biencoder"))
    rs.foreach { case (n, v) =>
      assert(v >= 0.0 && v <= 1.0, s"$n recall out of range: $v") }
    val m = rs.toMap
    // the top-k approximate paths are near-exact on the fixture (pinned so
    // an nprobe/assignment regression surfaces here, not in the bench JSON)
    assert(m("q32_ivf_knn") >= 0.9 && m("q60_collection_ivf_knn") >= 0.9,
      s"IVF nprobe=2 recall must stay >= 0.9, got $m")
    // the size-aware store defaults (q148) must deliver what pq_scaled
    // promised — the dial rule regressing to frozen-dial recall fails HERE
    assert(m("q148_pq_autodial_knn") >= 0.9,
      s"size-aware PQ defaults must keep recall >= 0.9, got $m")
  }

  test("planted-pair recall: twins sit at cosine >= 0.9 and the LSH dials climb") {
    val rs = Recall.plantedPairRecall(spark, "/root/testdata/sf0.001").toMap
    assert(rs.keySet == Set("planted_single", "planted_multiprobe",
      "planted_multitable"))
    rs.foreach { case (n, v) =>
      assert(v >= 0.0 && v <= 1.0, s"$n recall out of range: $v") }
    // the construction must land in the regime the probe claims: every
    // planted twin is a genuine near-dup of its source (cosine >= 0.9 —
    // checked exactly, not via the LSH path under test)
    val emb = spark.read.parquet(sf("embeddings"))
      .filter(col("vec_id") < 2000).select("vec_id", "embedding")
    val planted = Recall.plantedUnion(emb)
      .filter(col("vec_id") >= Recall.PlantStride)
      .select((col("vec_id") - Recall.PlantStride).as("vec_id"),
        col("embedding").as("twin"))
    val sims = emb.join(planted, "vec_id")
      .select(graft.functions.Distances.cosineDist(
        col("embedding"), col("twin")).as("d"))
      .agg(org.apache.spark.sql.functions.max("d")).as[Double].head()
    assert(sims <= 0.1, s"worst planted twin cosine distance $sims > 0.1")
    // single-table 8-bit SRP at cosine ~0.97 collides per-bit with
    // p ≈ 0.92 → p^8 ≈ 0.5; a broken bucket path would read ~0 here
    assert(rs("planted_single") >= 0.3,
      s"single-table planted recall collapsed: ${rs("planted_single")}")
    // the recall dials must actually dial: 4 tables ≈ 1−(1−p8)^4 far
    // above one table; one extra probe strictly no worse
    assert(rs("planted_multitable") >= rs("planted_single"),
      s"multitable below single: $rs")
    assert(rs("planted_multiprobe") >= rs("planted_single"),
      s"multiprobe below single: $rs")
    assert(rs("planted_multitable") >= 0.75,
      s"4-table planted recall must reach 0.75: ${rs("planted_multitable")}")
  }

  test("recallAtK: exact-vs-exact is 1.0; disjoint lists are 0.0") {
    val exact = Seq(1L, 2L, 3L).toDF("id")
    assert(Ann.recallAtK(exact, exact, "id")
      .as[Double].head() == 1.0)
    assert(Ann.recallAtK(Seq(7L, 8L, 9L).toDF("id"), exact, "id")
      .as[Double].head() == 0.0)
    // quantized kNN keeps high recall vs the float corpus on the fixture
    val emb = spark.read.parquet(sf("embeddings"))
    val qv = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0)
    val dq = emb.select(col("vec_id"),
      Ann.dequantizeInt8(Ann.quantizeInt8(col("embedding"))).as("embedding"))
    val approx = graft.operators.Knn.topK(dq, "vec_id", "embedding", qv, 10,
      "cosine", excludeIds = Seq(0L))
    val exact10 = graft.operators.Knn.topK(emb, "vec_id", "embedding", qv, 10,
      "cosine", excludeIds = Seq(0L))
    val r = Ann.recallAtK(approx, exact10, "vec_id").as[Double].head()
    assert(r >= 0.8, s"int8 recall@10 on the fixture should stay high, got $r")
  }

  // q65 is oracled in LONG form (label,pos,m) — the driver's row-sorting
  // compare can't order an array column. This pins the ARRAY form: the
  // long output reassembles into exactly one dim-64 centroid per label,
  // and the values are the per-position means of the raw vectors.
  test("label centroid: long form reassembles into one dim-64 vector per label") {
    val long = SparkEntry.queries("q65_label_centroid")(spark, "/root/testdata/sf0.001")
    val wide = long.groupBy("label")
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("ps"))
      .select(col("label"), transform(col("ps"), p => p.getField("m")).as("centroid"))
    val cents = wide.collect()
      .map(r => r.getAs[Number](0).longValue -> r.getSeq[Double](1)).toMap
    assert(cents.values.forall(_.length == 64))
    val raw = emb.select(col("label"), col("embedding")).collect()
      .map(r => r.getAs[Number](0).longValue -> r.getSeq[Float](1))
    val byLabel = raw.groupBy(_._1)
    assert(cents.keySet == byLabel.keySet)
    for ((lab, vecs0) <- byLabel) {
      val vecs = vecs0.map(_._2)
      val mean0 = vecs.map(_.head.toDouble).sum / vecs.length
      assert(math.abs(cents(lab).head - mean0) < 1e-3,
        s"label $lab pos 0: ${cents(lab).head} vs $mean0")
    }
  }
}
