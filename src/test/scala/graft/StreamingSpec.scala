package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.catalog.CollectionCatalog
import graft.streaming.StreamingHydrator

class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(java.nio.file.Paths.get("/root/repo/target"), prefix).toString

  test("streaming hydrate: microbatches upsert; redelivered versions resolve by orderCol") {
    implicit val sqlCtx = spark.sqlContext
    val cat = new CollectionCatalog(spark, tmp("stream-cat"), numBuckets = 4)
    val coll = cat.getOrCreateCollection("s", "cosine")
    val mem = MemoryStream[(String, String, Seq[Float], Long)]
    mem.addData(("a", "doc a", Seq(1f, 0f), 1L), ("b", "doc b", Seq(0f, 1f), 1L))
    val rows = mem.toDF.toDF("id", "document", "embedding", "ver")
    val q1 = StreamingHydrator.hydrate(rows, coll, tmp("ckpt1"), Some("ver")).start()
    q1.awaitTermination(60000)
    assert(coll.count() == 2)
    // an at-least-once redelivery: ONE batch carrying BOTH versions of id
    // 'b' (stale + correction) — orderCol must make the newer version win
    // deterministically, not arrival luck
    mem.addData(
      ("b", "doc b stale", Seq(0f, 1f), 1L),
      ("b", "doc b v2", Seq(0f, 2f), 2L),
      ("c", "doc c", Seq(1f, 1f), 1L))
    val q2 = StreamingHydrator.hydrate(rows, coll, tmp("ckpt2"), Some("ver")).start()
    q2.awaitTermination(60000)
    assert(coll.count() == 3)
    assert(coll.get(ids = Seq("b")).select("document").as[String].head() == "doc b v2")
  }

  test("hydrateIndexed keeps the postings index current across microbatches") {
    implicit val sqlCtx = spark.sqlContext
    val cat = new CollectionCatalog(spark, tmp("stream-idx"), numBuckets = 4)
    val coll = cat.getOrCreateCollection("si")
    val mem = MemoryStream[(String, String, Long)]
    val rows = mem.toDF.toDF("id", "document", "ver")
    val q = StreamingHydrator.hydrateIndexed(rows, coll, tmp("ckpt-idx"),
      Some("ver"),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L)).start()
    try {
      mem.addData(("1", "quick brown fox", 1L), ("2", "lazy dog", 1L))
      q.processAllAvailable()
      assert(coll.hasDocIndex, "batch 1 must leave a committed index")
      mem.addData(("3", "another brown bear", 2L), ("2", "lazy brown dog", 2L))
      q.processAllAvailable()
      // the refresh landed on the NEW version — index serveable right away
      assert(coll.hasDocIndex, "batch 2's refresh must re-commit at the new version")
    } finally q.stop()
    // served THROUGH the refreshed index, post-stream truth
    assert(coll.get(whereDoc = Some(graft.operators.ChromaFilter.Contains("brown")))
      .select("id").as[String].collect().toSet == Set("1", "2", "3"))
  }

  test("hydrateIndexed keeps the keyword-stats sidecar current; served scores equal the scan") {
    implicit val sqlCtx = spark.sqlContext
    val cat = new CollectionCatalog(spark, tmp("stream-kwx"), numBuckets = 4)
    val coll = cat.getOrCreateCollection("sk")
    val mem = MemoryStream[(String, String, Long)]
    val rows = mem.toDF.toDF("id", "document", "ver")
    val q = StreamingHydrator.hydrateIndexed(rows, coll, tmp("ckpt-kwx"),
      Some("ver"), refreshDoc = false, refreshKeyword = true,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L)).start()
    try {
      mem.addData(("1", "spark hash join", 1L), ("2", "stream processing", 1L))
      q.processAllAvailable()
      assert(coll.hasKeywordIndex, "batch 1 must leave a committed keyword sidecar")
      mem.addData(("3", "hash tables everywhere", 2L), ("2", "hash stream rewrite", 2L))
      q.processAllAvailable()
      assert(coll.hasKeywordIndex, "batch 2's refresh must re-commit at the new version")
    } finally q.stop()
    val viaIdx = coll.keywordTopK(Seq("hash", "stream"), 5).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    val viaScan = graft.operators.Retrieval
      .bm25TopK(coll.toDF, "id", "document", Seq("hash", "stream"), 5)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    assert(viaIdx.toSeq == viaScan.toSeq)
  }

  test("hydrateIndexed serves embedding-only streams with refreshDoc=false; doc-less refreshDoc is LOUD") {
    implicit val sqlCtx = spark.sqlContext
    val cat = new CollectionCatalog(spark, tmp("stream-emb"), numBuckets = 4)
    val coll = cat.getOrCreateCollection("se", metadata = Map("ivf:nlist" -> "2"))
    val mem = MemoryStream[(String, Seq[Float], Long)]
    val rows = mem.toDF.toDF("id", "embedding", "ver")
    // refreshing NOTHING is rejected at construction, not silently inert
    intercept[IllegalArgumentException](StreamingHydrator.hydrateIndexed(
      rows, coll, tmp("ckpt-none"), Some("ver"),
      refreshIvf = false, refreshDoc = false))
    val q = StreamingHydrator.hydrateIndexed(rows, coll, tmp("ckpt-emb"),
      Some("ver"), refreshIvf = true, refreshDoc = false,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L)).start()
    try {
      mem.addData(("1", Seq(1f, 0f), 1L), ("2", Seq(0f, 1f), 1L))
      q.processAllAvailable()
      assert(coll.hasIndex, "IVF must be current for the embedding-only stream")
      assert(!coll.hasDocIndex)
    } finally q.stop()
    // default refreshDoc=true on a document-less collection: the first
    // batch fails with the EXPLICIT message, not a missing-column error
    val mem2 = MemoryStream[(String, Seq[Float], Long)]
    val q2 = StreamingHydrator.hydrateIndexed(
      mem2.toDF.toDF("id", "embedding", "ver"), coll, tmp("ckpt-loud"),
      Some("ver"),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L)).start()
    try {
      mem2.addData(("3", Seq(1f, 1f), 1L))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
        q2.processAllAvailable())
      assert(e.getMessage.contains("refreshDoc") ||
        Option(e.getCause).exists(_.getMessage.contains("refreshDoc")))
    } finally q2.stop()
  }

  test("hydrateIndexed(refreshIvf) keeps BOTH indexes current; first batch sizes via ivf:nlist") {
    implicit val sqlCtx = spark.sqlContext
    val cat = new CollectionCatalog(spark, tmp("stream-ivf"), numBuckets = 4)
    // the first batch's IVF refresh has no prior build → falls back to the
    // metadata-sized buildIndex(), so ivf:nlist MUST be set on the
    // collection for a refreshIvf sink (loud at batch 1 otherwise)
    val coll = cat.getOrCreateCollection("sv", space = "cosine",
      metadata = Map("ivf:nlist" -> "2"))
    val mem = MemoryStream[(String, String, Seq[Float], Long)]
    val rows = mem.toDF.toDF("id", "document", "embedding", "ver")
    val q = StreamingHydrator.hydrateIndexed(rows, coll, tmp("ckpt-ivf"),
      Some("ver"), refreshIvf = true,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L)).start()
    try {
      mem.addData(("1", "alpha doc", Seq(1f, 0f), 1L), ("2", "beta doc", Seq(0f, 1f), 1L))
      q.processAllAvailable()
      assert(coll.hasIndex && coll.hasDocIndex)
      mem.addData(("3", "gamma doc", Seq(0.9f, 0.1f), 2L))
      q.processAllAvailable()
      assert(coll.hasIndex && coll.hasDocIndex,
        "batch 2's refreshes must re-commit both indexes at the new version")
    } finally q.stop()
    // served through the refreshed IVF (probing all cells ≡ exact)
    val viaIdx = coll.query(Seq(1f, 0f), 3, nprobe = 2)
      .select("id").as[String].collect().toSeq
    val exact = coll.query(Seq(1f, 0f), 3, exact = true)
      .select("id").as[String].collect().toSeq
    assert(viaIdx == exact)
  }

  test("streaming sync: a replayed snapshot microbatch writes no store version") {
    implicit val sqlCtx = spark.sqlContext
    val cat = new CollectionCatalog(spark, tmp("sync-cat"), numBuckets = 4)
    val coll = cat.getOrCreateCollection("cdc")
    // each snapshot is its own stream: a fresh checkpoint re-reads a
    // MemoryStream from offset 0, so reusing one stream would smuggle
    // STALE rows into later "snapshots" (covered by the orderCol case in
    // the next assertion block instead)
    def snapshot(rows: Seq[(String, String)], ck: String): Unit = {
      val mem = MemoryStream[(String, String)]
      mem.addData(rows: _*)
      StreamingHydrator.sync(mem.toDF.toDF("id", "document"), coll, tmp(ck),
        Seq("document")).start().awaitTermination(60000)
    }
    snapshot(Seq(("a", "doc a"), ("b", "doc b")), "sck1")
    assert(coll.count() == 2)
    val v1 = coll.meta.version
    // the feed redelivers the same snapshot plus one real change: only the
    // change may write — and the version advances exactly once
    snapshot(Seq(("a", "doc a"), ("b", "doc b CHANGED")), "sck2")
    assert(coll.get(ids = Seq("b")).select("document").as[String].head() == "doc b CHANGED")
    assert(coll.meta.version == v1 + 1, "one changed row = exactly one new version")
    // a pure replay (no change at all) must leave the store untouched
    snapshot(Seq(("a", "doc a"), ("b", "doc b CHANGED")), "sck3")
    assert(coll.meta.version == v1 + 1, "unchanged replay must not write a version")
    // at-least-once redelivery: stale row NEXT TO its correction in one
    // batch — orderCol resolves latest-wins BEFORE the delta, so the stale
    // copy can neither regress the value nor force a spurious version
    val mem = MemoryStream[(String, String, Long)]
    mem.addData(("b", "doc b", 1L), ("b", "doc b CHANGED", 2L))
    StreamingHydrator.sync(mem.toDF.toDF("id", "document", "ver"), coll,
        tmp("sck4"), Seq("document"), orderCol = Some("ver"))
      .start().awaitTermination(60000)
    assert(coll.get(ids = Seq("b")).select("document").as[String].head() == "doc b CHANGED")
    assert(coll.meta.version == v1 + 1, "resolved-stale redelivery must not write")
  }

  test("streaming/batch parity: AvailableNow micro-batched hydration equals batch add") {
    implicit val sqlCtx = spark.sqlContext
    // the same 500-row fixture hydrates once as ONE batch add and once as
    // a MemoryStream drained in three microbatches; the stored artifacts
    // must match bit-for-bit (count + order-free content hash)
    val rows = spark.read.parquet(sf("documents"))
      .join(spark.read.parquet(sf("embeddings")), col("doc_id") === col("vec_id"))
      .select(col("doc_id").cast("string").as("id"), col("text").as("document"),
        col("embedding"))
    val batchCat = new CollectionCatalog(spark, tmp("parity-batch"), numBuckets = 4)
    val batchColl = batchCat.getOrCreateCollection("p", "cosine")
    batchColl.add(rows)

    val streamCat = new CollectionCatalog(spark, tmp("parity-stream"), numBuckets = 4)
    val streamColl = streamCat.getOrCreateCollection("p", "cosine")
    val chunks = rows.select("id", "document", "embedding")
      .as[(String, String, Seq[Float])].collect()
    val mem = MemoryStream[(String, String, Seq[Float])]
    chunks.grouped((chunks.length + 2) / 3).foreach(g => mem.addData(g.toSeq))
    val q = StreamingHydrator.hydrate(
      mem.toDF.toDF("id", "document", "embedding"), streamColl, tmp("parity-ckpt")).start()
    q.awaitTermination(120000)

    def fingerprint(c: graft.catalog.Collection): (Long, java.math.BigDecimal) = {
      // decimal sum: an ANSI long sum of 500 xxhash64 values overflows
      val h = c.toDF.select(xxhash64(col("id"), col("document"), col("embedding"))
        .cast("decimal(38,0)").as("h"))
      (c.count(), h.agg(sum("h")).head().getDecimal(0))
    }
    assert(fingerprint(streamColl) == fingerprint(batchColl),
      "micro-batched hydration must equal the one-shot batch hydration")
  }

  test("dropDuplicatesWithinWatermark removes in-horizon duplicate ids") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp, String)]
    val base = 1700000000000L
    mem.addData(
      ("a", new Timestamp(base), "v1"),
      ("a", new Timestamp(base + 1000), "v1-dup"),
      ("b", new Timestamp(base + 2000), "v2"))
    val out = StreamingHydrator.dedupedRows(
      mem.toDF.toDF("id", "ts", "document"), "ts", "10 minutes")
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").trigger(
        org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val ids = spark.table("dedup_out").select("id").as[String].collect().sorted
    assert(ids.toSeq == Seq("a", "b"))
  }

  test("session windows close after the gap and carry event counts") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val m = 60000L
    mem.addData(
      (new Timestamp(m * 10), 1L), (new Timestamp(m * 12), 1L),   // session A: 2 events
      (new Timestamp(m * 60), 1L),                                 // session B: 1 event
      (new Timestamp(m * 11), 2L),                                 // user 2: 1 event
      (new Timestamp(m * 600), 99L))                               // watermark pusher
    val out = StreamingHydrator.sessionCounts(
      mem.toDF.toDF("ts", "user_id"), "ts", "user_id", "10 minutes", "30 minutes")
    val q = out.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").trigger(
        org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val rows = spark.table("sess_out")
      .select("user_id", "session_start", "n_events")
      .as[(Long, Timestamp, Long)].collect().toSet
    assert(rows.contains((1L, new Timestamp(m * 10), 2L)))
    assert(rows.contains((1L, new Timestamp(m * 60), 1L)))
    assert(rows.contains((2L, new Timestamp(m * 11), 1L)))
  }

  test("mapGroupsWithState keeps a per-key high-water mark across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val out = StreamingHydrator.runningMax(mem.toDF.toDF("k", "v"), "k", "v")
    val q = out.writeStream.format("memory").queryName("hwm_out")
      .outputMode("update").start()
    mem.addData((1L, 5.0), (1L, 3.0), (2L, 1.0))
    q.processAllAvailable()
    mem.addData((1L, 4.0), (2L, 9.0)) // 1's hwm must stay 5, 2's rises to 9
    q.processAllAvailable()
    q.stop()
    // assert the FULL emitted multiset: a per-key max here would mask the
    // exact regression this test exists for (state lost between batches
    // would emit (1, 4.0) in batch 2 and max() would hide it)
    val emitted = spark.table("hwm_out").as[(String, Double)].collect().sorted.toSeq
    assert(emitted == Seq("1" -> 5.0, "1" -> 5.0, "2" -> 1.0, "2" -> 9.0).sorted)
  }

  test("windowed counts with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val h = 3600000L
    // last event pushes the watermark (13:00 - 1h = 12:00) past the ends of
    // the 10:00 and 11:00 windows so Append mode emits them
    mem.addData(
      (new Timestamp(h * 10), "view"), (new Timestamp(h * 10 + 60000), "view"),
      (new Timestamp(h * 10 + 120000), "click"), (new Timestamp(h * 11), "view"),
      (new Timestamp(h * 13), "sentinel"))
    val out = StreamingHydrator.windowedCounts(
      mem.toDF.toDF("ts", "event_type"), "ts", "1 hour", "1 hour")
    val q = out.writeStream.format("memory").queryName("win_out")
      .outputMode("append").trigger(
        org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val rows = spark.table("win_out")
      .select("window_start", "event_type", "cnt")
      .as[(Timestamp, String, Long)].collect().toSet
    assert(rows.contains((new Timestamp(h * 10), "view", 2L)))
    assert(rows.contains((new Timestamp(h * 10), "click", 1L)))
    assert(rows.contains((new Timestamp(h * 11), "view", 1L)))
  }

  test("stream-stream interval join: cross-batch matches emit, too-late rows drop") {
    import java.sql.Timestamp
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val day = 86400000L; val min = 60000L
    def ts(m: Long) = new Timestamp(day + m * min)
    val lMem = MemoryStream[(Long, Timestamp, Long)]
    val rMem = MemoryStream[(Long, Timestamp, Long)]
    val joined = StreamingHydrator.intervalJoinStream(
      lMem.toDF.toDF("k", "lts", "lv"), rMem.toDF.toDF("k", "rts", "rv"),
      "k", "lts", "rts", delay = "30 minutes", within = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L)).start()
    try {
      // batch 1: left-only — its match arrives in batch 2 (buffered state)
      lMem.addData((1L, ts(0), 100L), (2L, ts(0), 200L))
      q.processAllAvailable()
      // batch 2: right rows — k=1 inside the window, k=2 outside (11 > 10),
      // k=3 has no left partner
      rMem.addData((1L, ts(5), 500L), (2L, ts(11), 600L), (3L, ts(5), 700L))
      q.processAllAvailable()
      // batch 3: push both watermarks far ahead, then a too-late left row
      // whose k=3 partner is buffered — it must be DROPPED, not joined
      lMem.addData((9L, ts(10000), 1L)); rMem.addData((9L, ts(10001), 2L))
      q.processAllAvailable()
      lMem.addData((3L, ts(0), 300L))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("ssj_out").filter(col("k") =!= 9L)
      .select("k", "lv", "rv").as[(Long, Long, Long)].collect().toSet
    assert(rows == Set((1L, 100L, 500L)),
      s"expected only the in-window cross-batch match, got $rows")
  }

  test("stream-stream LEFT OUTER interval join: unmatched left emits null row on expiry") {
    import java.sql.Timestamp
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val day = 86400000L; val min = 60000L
    def ts(m: Long) = new Timestamp(day + m * min)
    val lMem = MemoryStream[(Long, Timestamp, Long)]
    val rMem = MemoryStream[(Long, Timestamp, Long)]
    val joined = StreamingHydrator.intervalJoinStream(
      lMem.toDF.toDF("k", "lts", "lv"), rMem.toDF.toDF("k", "rts", "rv"),
      "k", "lts", "rts", delay = "30 minutes", within = "10 minutes",
      joinType = "left_outer")
    val q = joined.writeStream.format("memory").queryName("ssj_lo_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L)).start()
    try {
      // k=1 will match in batch 2; k=2's partner lands OUTSIDE the window
      // (11 > 10) so k=2 must surface as a null row — but only after both
      // watermarks prove its interval expired, never before
      lMem.addData((1L, ts(0), 100L), (2L, ts(0), 200L))
      q.processAllAvailable()
      rMem.addData((1L, ts(5), 500L), (2L, ts(11), 600L))
      q.processAllAvailable()
      val early = spark.table("ssj_lo_out").filter(col("rv").isNull).count()
      assert(early == 0L, s"null rows emitted before watermark expiry: $early")
      // push both watermarks; the deferred expiry pass needs one more
      // batch after the push to sweep state (documented Spark behavior)
      lMem.addData((9L, ts(10000), 1L)); rMem.addData((9L, ts(10001), 2L))
      q.processAllAvailable()
      // a too-late left row must still DROP — outer-ness does not grant
      // late rows a null-row consolation prize
      lMem.addData((3L, ts(0), 300L))
      q.processAllAvailable()
      lMem.addData((9L, ts(10002), 3L)); rMem.addData((9L, ts(10003), 4L))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("ssj_lo_out").filter(col("k") =!= 9L)
      .select(col("k"), col("lv"), coalesce(col("rv"), lit(-1L)))
      .as[(Long, Long, Long)].collect().toSet
    assert(rows == Set((1L, 100L, 500L), (2L, 200L, -1L)),
      s"expected the match plus exactly one expiry null row, got $rows")
  }

  test("streamingSession: explicit state-store dial, clamped heuristic, parent untouched") {
    val parentBefore = spark.conf.get("spark.sql.shuffle.partitions")
    val pinned = StreamingHydrator.streamingSession(spark, partitions = 8)
    assert(pinned.conf.get("spark.sql.shuffle.partitions") == "8")
    // default heuristic: defaultParallelism/4 clamped to [8, 200] — on
    // the local[8] test session that clamps UP to the floor of 8
    val auto = StreamingHydrator.streamingSession(spark)
    val n = auto.conf.get("spark.sql.shuffle.partitions").toInt
    assert(n >= 8 && n <= 200)
    // conf isolation: the parent session's planner never sees the dial
    assert(spark.conf.get("spark.sql.shuffle.partitions") == parentBefore)
    assert(pinned.sparkContext eq spark.sparkContext)
  }
}
