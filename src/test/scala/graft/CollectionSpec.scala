package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.catalog.CollectionCatalog
import graft.operators.ChromaFilter

class CollectionSpec extends SparkTestBase {
  import spark.implicits._

  private def freshCatalog(): CollectionCatalog = {
    val root = Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "coll-test").toString
    new CollectionCatalog(spark, root, numBuckets = 4)
  }

  private def batch(rows: (String, String, Seq[Float])*) =
    rows.toSeq.toDF("id", "document", "embedding")

  test("get_or_create is idempotent; list/delete catalog ops") {
    val cat = freshCatalog()
    cat.getOrCreateCollection("c1", "cosine")
    cat.getOrCreateCollection("c1", "cosine")
    cat.getOrCreateCollection("c2")
    assert(cat.listCollections() == Seq("c1", "c2"))
    assert(cat.getCollection("c1").get.space == "cosine")
    assert(cat.getCollection("c2").get.space == "l2")
    assert(cat.deleteCollection("c2"))
    assert(cat.listCollections() == Seq("c1"))
    assert(!cat.deleteCollection("nope"))
    assert(cat.getCollection("nope").isEmpty)
  }

  test("add + count + get round-trip") {
    val c = freshCatalog().getOrCreateCollection("c")
    c.add(batch(("a", "doc a", Seq(1f, 0f)), ("b", "doc b", Seq(0f, 1f))))
    assert(c.count() == 2)
    assert(c.get(ids = Seq("a")).select("document").as[String].head() == "doc a")
  }

  test("queryBatch: per-query top-k matches per-vector query() results (B6 batch)") {
    val c = freshCatalog().getOrCreateCollection("c", "cosine")
    c.add(batch(("a", "d", Seq(1f, 0f)), ("b", "d", Seq(0.9f, 0.1f)),
      ("c", "d", Seq(0f, 1f)), ("d", "d", Seq(0.1f, 0.9f))))
    val qs = Seq(Seq(1f, 0f), Seq(0f, 1f))
    val got = c.queryBatch(qs, k = 2)
      .select("qid", "rnk", "id").as[(Int, Int, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    qs.zipWithIndex.foreach { case (q, i) =>
      val single = c.query(q, 2).select("id").as[String].collect().toSeq
      assert(got(i) == single, s"query $i batch/single mismatch")
    }
  }

  test("add rejects duplicate ids within batch and against collection (B1)") {
    val c = freshCatalog().getOrCreateCollection("c")
    intercept[IllegalArgumentException] {
      c.add(batch(("x", "1", Seq(1f)), ("x", "2", Seq(2f))))
    }
    c.add(batch(("x", "1", Seq(1f))))
    val e = intercept[IllegalArgumentException] { c.add(batch(("x", "3", Seq(3f)))) }
    assert(e.getMessage.contains("already exists"))
    assert(c.count() == 1)
  }

  test("upsert inserts new and replaces existing, latest wins (B2)") {
    val c = freshCatalog().getOrCreateCollection("c")
    c.add(batch(("a", "v1", Seq(1f)), ("b", "v1", Seq(2f))))
    c.upsert(batch(("b", "v2", Seq(9f)), ("c", "new", Seq(3f))))
    assert(c.count() == 3)
    val docs = c.toDF.select("id", "document").as[(String, String)].collect().toMap
    assert(docs == Map("a" -> "v1", "b" -> "v2", "c" -> "new"))
  }

  test("upsert resolves within-batch dupes by orderCol descending") {
    val c = freshCatalog().getOrCreateCollection("c")
    val b = Seq(("a", "old", Seq(1f), 1), ("a", "new", Seq(2f), 2))
      .toDF("id", "document", "embedding", "ver")
    c.upsert(b, orderCol = Some("ver"))
    assert(c.count() == 1)
    assert(c.toDF.select("document").as[String].head() == "new")
  }

  test("update replaces fields for existing ids only (B3)") {
    val c = freshCatalog().getOrCreateCollection("c")
    c.add(batch(("a", "v1", Seq(1f)), ("b", "v1", Seq(2f))))
    c.update(Seq(("a", "patched"), ("zz", "ignored")).toDF("id", "document"))
    val docs = c.toDF.select("id", "document").as[(String, String)].collect().toMap
    assert(docs == Map("a" -> "patched", "b" -> "v1"))
  }

  test("delete by ids and by metadata/document predicate (B4)") {
    val c = freshCatalog().getOrCreateCollection("c")
    c.add(batch(("a", "keep me", Seq(1f)), ("b", "drop me", Seq(2f)), ("c", "keep too", Seq(3f))))
    c.delete(ids = Seq("c"))
    assert(c.count() == 2)
    c.delete(whereDoc = Some(ChromaFilter.Contains("drop")))
    assert(c.toDF.select("id").as[String].collect().toSeq == Seq("a"))
  }

  test("delete combines ids and predicate with AND (Chroma parity), not OR") {
    val c = freshCatalog().getOrCreateCollection("c")
    c.add(Seq(("a", "en doc", Seq(1f), "en"), ("b", "en doc 2", Seq(2f), "en"),
      ("x", "fr doc", Seq(3f), "fr")).toDF("id", "document", "embedding", "lang"))
    // delete id 'a' ONLY IF lang=en: must remove exactly 'a', never every en row
    c.delete(ids = Seq("a"), where = Some(ChromaFilter.Eq("lang", "en")))
    assert(c.toDF.select("id").as[String].collect().toSet == Set("b", "x"))
    // restriction that matches nothing deletes nothing
    c.delete(ids = Seq("b"), where = Some(ChromaFilter.Eq("lang", "fr")))
    assert(c.count() == 2)
  }

  test("update rejects within-batch duplicate ids (join fan-out guard)") {
    val c = freshCatalog().getOrCreateCollection("c")
    c.add(batch(("a", "v1", Seq(1f))))
    intercept[IllegalArgumentException] {
      c.update(Seq(("a", "x"), ("a", "y")).toDF("id", "document"))
    }
  }

  test("vacuum rejects negative keepHistory (would delete the live version)") {
    val c = freshCatalog().getOrCreateCollection("c")
    c.add(batch(("a", "1", Seq(1f))))
    intercept[IllegalArgumentException] { c.vacuum(-1) }
    assert(c.count() == 1)
  }

  test("add rejects a null id loudly; a clash-rejected add leaves no orphan version dir") {
    val cat = freshCatalog()
    val c = cat.getOrCreateCollection("c")
    val e = intercept[IllegalArgumentException] {
      c.add(Seq((null.asInstanceOf[String], "x", Seq(1f)))
        .toDF("id", "document", "embedding"))
    }
    assert(e.getMessage.contains("null id"))
    // the upsert path must reject it too: a null-keyed row would survive
    // every later left_anti merge (null == null never matches)
    val e2 = intercept[IllegalArgumentException] {
      c.upsert(Seq((null.asInstanceOf[String], "x", Seq(1f)))
        .toDF("id", "document", "embedding"))
    }
    assert(e2.getMessage.contains("null id"))
    c.add(batch(("a", "1", Seq(1f))))
    val before = c.history()
    intercept[IllegalArgumentException] { c.add(batch(("a", "2", Seq(2f)))) }
    // the rejected write's claimed version dir must be cleaned up — it
    // sits ABOVE the live version, where vacuum can never reclaim it
    assert(c.history() == before, "clash-rejected add must not leave a version dir")
    assert(c.count() == 1)
  }

  test("time travel: history lists committed versions; toDFAt reads snapshots") {
    val c = freshCatalog().getOrCreateCollection("c")
    c.add(batch(("a", "v1", Seq(1f)), ("b", "v1", Seq(2f))))
    val v1 = c.meta.version
    c.upsert(batch(("b", "v2", Seq(3f)), ("c", "new", Seq(4f))))
    c.delete(ids = Seq("a"))
    assert(c.history() == Seq(v1, v1 + 1, v1 + 2))
    val snap = c.toDFAt(v1).select("id", "document").as[(String, String)].collect().toMap
    assert(snap == Map("a" -> "v1", "b" -> "v1"))
    assert(c.toDF.select("id").as[String].collect().toSet == Set("b", "c"))
    intercept[IllegalArgumentException] { c.toDFAt(v1 + 99) }
  }

  test("rollback rolls FORWARD to a new version with the old content") {
    val c = freshCatalog().getOrCreateCollection("c")
    c.add(batch(("a", "good", Seq(1f))))
    val good = c.meta.version
    c.upsert(batch(("a", "BAD", Seq(9f)), ("z", "junk", Seq(0f))))
    c.rollbackTo(good)
    assert(c.meta.version == good + 2, "rollback must advance, not rewind, the pointer")
    val docs = c.toDF.select("id", "document").as[(String, String)].collect().toMap
    assert(docs == Map("a" -> "good"))
    // the bad version stays in history for audit until vacuumed
    assert(c.history().contains(good + 1))
    assert(c.toDFAt(good + 1).count() == 2)
    intercept[IllegalArgumentException] { c.rollbackTo(c.meta.version) }
    // vacuum reclaims it; time travel to it then fails loudly
    c.vacuum(0)
    intercept[IllegalArgumentException] { c.toDFAt(good + 1) }
    assert(c.count() == 1)
  }

  test("vacuum frees superseded bytes; retained snapshot and current stay readable") {
    import java.nio.file.{Files, Path, Paths}
    val rootDir = Files.createTempDirectory(
      Paths.get("/root/repo/target"), "coll-vac").toString
    val cat = new CollectionCatalog(spark, rootDir, numBuckets = 4)
    val c = cat.getOrCreateCollection("c")
    c.add(batch(("a", "v1", Seq(1f)), ("b", "v1", Seq(2f))))
    (0 until 6).foreach { i => c.upsert(batch(("a", s"v${i + 2}", Seq(i.toFloat)))) }
    val snapshot = c.meta.version
    c.compact()
    def pathBytes(p: Path): Long = {
      val s = Files.walk(p)
      try s.filter(Files.isRegularFile(_)).mapToLong(Files.size(_)).sum()
      finally s.close()
    }
    val collDir = Paths.get(rootDir, "c")
    val before = pathBytes(collDir)
    val dropped = c.vacuum(keepHistory = 1)
    assert(dropped >= 5, s"six superseded versions existed, got $dropped dropped dirs")
    val after = pathBytes(collDir)
    assert(after < before, s"vacuum must free path bytes: $before -> $after")
    // the promised history survives: current + exactly one predecessor
    assert(c.history() == Seq(snapshot, snapshot + 1))
    assert(c.toDFAt(snapshot).count() == c.count())
    assert(c.toDF.select("id", "document").as[(String, String)].collect().toMap
      == Map("a" -> "v7", "b" -> "v1"))
    intercept[IllegalArgumentException] { c.toDFAt(snapshot - 1) }
    // link-count awareness: roll back (hard-linked commit), vacuum away
    // the link SOURCE version — the shared inodes must keep the rolled-
    // forward current readable
    c.rollbackTo(snapshot)
    c.vacuum(keepHistory = 0)
    assert(c.toDF.select("id", "document").as[(String, String)].collect().toMap
      == Map("a" -> "v7", "b" -> "v1"),
      "current must stay readable after its hard-link source is vacuumed")
  }

  test("metadata values with braces and newlines round-trip through meta.json") {
    val c = freshCatalog().getOrCreateCollection("c")
    val tricky = Map("note" -> "a}b{c", "desc" -> "line1\nline2", "quote" -> "say \"hi\"")
    c.modifyMetadata(tricky)
    assert(c.meta.metadata == tricky)
    c.modifyMetadata(Map("extra" -> "plain"))
    assert(c.meta.metadata == tricky + ("extra" -> "plain"))
  }

  test("get supports where/where_document/limit/offset paging (B5)") {
    val c = freshCatalog().getOrCreateCollection("c")
    c.add(batch(("a", "xx", Seq(1f)), ("b", "xy", Seq(2f)),
      ("c", "yy", Seq(3f)), ("d", "xz", Seq(4f))))
    val page = c.get(whereDoc = Some(ChromaFilter.Contains("x")), limit = Some(2), offset = 1)
    assert(page.select("id").as[String].collect().toSeq == Seq("b", "d"))
  }

  test("query returns top-k by the collection's distance space (B6)") {
    val c = freshCatalog().getOrCreateCollection("c", "cosine")
    c.add(batch(("a", "east", Seq(1f, 0f)), ("b", "north", Seq(0f, 1f)), ("c", "ne", Seq(1f, 1f))))
    val res = c.query(Seq(1f, 0f), 2).select("id").as[String].collect()
    assert(res.toSeq == Seq("a", "c"))
    val filtered = c.query(Seq(1f, 0f), 2,
      whereDoc = Some(ChromaFilter.NotContains("east"))).select("id").as[String].collect()
    assert(filtered.toSeq == Seq("c", "b"))
  }

  test("where keys resolve against a MAP metadata column (Chroma parity)") {
    val c = freshCatalog().getOrCreateCollection("c")
    val rows = Seq(
      ("a", "doc a", Seq(1f), Map("rating" -> "5", "src" -> "x")),
      ("b", "doc b", Seq(2f), Map("rating" -> "9", "src" -> "y")))
      .toDF("id", "document", "embedding", "metadata")
    c.add(rows)
    val hi = c.get(where = Some(ChromaFilter.Gt("rating", "5")))
    assert(hi.select("id").as[String].collect().toSeq == Seq("b"))
    val q = c.query(Seq(1f), 5, where = Some(ChromaFilter.Eq("src", "x")))
    assert(q.select("id").as[String].collect().toSeq == Seq("a"))
    c.delete(where = Some(ChromaFilter.Eq("rating", "9")))
    assert(c.toDF.select("id").as[String].collect().toSeq == Seq("a"))
  }

  test("peek returns first n by id (B10)") {
    val c = freshCatalog().getOrCreateCollection("c")
    c.add(batch(("b", "2", Seq(1f)), ("a", "1", Seq(2f)), ("c", "3", Seq(3f))))
    assert(c.peek(2).select("id").as[String].collect().toSeq == Seq("a", "b"))
  }

  test("modify updates collection metadata in meta.json (B11)") {
    val cat = freshCatalog()
    val c = cat.getOrCreateCollection("c")
    c.modifyMetadata(Map("owner" -> "graft", "dim" -> "2"))
    assert(c.meta.metadata == Map("owner" -> "graft", "dim" -> "2"))
    c.modifyMetadata(Map("owner" -> "other"))
    assert(c.meta.metadata == Map("owner" -> "other", "dim" -> "2"))
  }

  test("merge rewrites only affected buckets; others are carried by manifest") {
    val cat = freshCatalog()
    val c = cat.getOrCreateCollection("c")
    val rows = (0 until 40).map(i => (s"id$i", s"doc $i", Seq(i.toFloat)))
    c.add(rows.toDF("id", "document", "embedding"))
    val v1Dir = java.nio.file.Paths.get(
      c.toDF.inputFiles.head.stripPrefix("file:")).getParent.getParent
    def bucketFiles(dir: java.nio.file.Path): Map[String, Set[String]] = {
      import scala.jdk.CollectionConverters._
      Files.list(dir).iterator.asScala
        .filter(p => p.getFileName.toString.startsWith("pt="))
        .map(p => p.getFileName.toString ->
          Files.list(p).iterator.asScala.map(_.getFileName.toString)
            .filter(_.endsWith(".parquet")).toSet)
        .toMap
    }
    val before = bucketFiles(v1Dir)
    c.upsert(Seq(("id0", "patched", Seq(99f))).toDF("id", "document", "embedding"))
    val v2Dir = v1Dir.getParent.resolve(f"data_v${c.meta.version}%06d")
    val after = bucketFiles(v2Dir)
    // ONLY the bucket holding id0 is physically rewritten in the new
    // version; every other bucket travels as a carry-manifest entry
    // pointing at v1's dir — whose files are untouched (no data movement)
    assert(after.size == 1, s"expected 1 rewritten bucket, got ${after.keySet}")
    val carried = graft.catalog.Carry.read(
      graft.catalog.StoreIO.of(new org.apache.hadoop.fs.Path(v2Dir.toString),
        spark.sparkContext.hadoopConfiguration),
      new org.apache.hadoop.fs.Path(v2Dir.toString))
    assert(carried.keySet == before.keySet -- after.keySet,
      s"carried ${carried.keySet} vs expected ${before.keySet -- after.keySet}")
    assert(carried.values.toSet == Set(v1Dir.getFileName.toString))
    assert(bucketFiles(v1Dir) == before, "carry must not touch the owner's files")
    // and content is correct
    assert(c.count() == 40)
    assert(c.get(ids = Seq("id0")).select("document").as[String].head() == "patched")
  }

  test("maxRowsPerFile splits oversized bucket files (chunked add)") {
    val root = Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "coll-chunk").toString
    val cat = new CollectionCatalog(spark, root, numBuckets = 2, maxRowsPerFile = 5)
    val c = cat.getOrCreateCollection("c")
    // coalesce(1): one writer task, so any splitting comes from the
    // maxRecordsPerFile option, not task parallelism
    c.add((0 until 40).map(i => (s"id$i", s"doc $i", Seq(i.toFloat)))
      .toDF("id", "document", "embedding").coalesce(1))
    assert(c.count() == 40)
    // the real invariant: no file holds more than maxRowsPerFile rows
    val perFile = c.toDF.inputFiles.map { f =>
      spark.read.parquet(f).count()
    }
    assert(perFile.nonEmpty && perFile.forall(_ <= 5), s"oversized files: ${perFile.toSeq}")
    intercept[IllegalArgumentException] {
      new CollectionCatalog(spark, root, numBuckets = 2, maxRowsPerFile = 0)
    }
  }

  test("bucket count persists in meta; a differently-configured session honors it") {
    val root = Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "coll-bk").toString
    val c4 = new CollectionCatalog(spark, root, numBuckets = 4).getOrCreateCollection("c")
    c4.add(batch(("a", "1", Seq(1f)), ("b", "2", Seq(2f))))
    assert(c4.meta.buckets == 4)
    // reopen with a catalog configured for 32 buckets: merges must stay on 4
    val c32 = new CollectionCatalog(spark, root, numBuckets = 32).getCollection("c").get
    c32.upsert(batch(("a", "patched", Seq(9f))))
    val pts = c32.toDF.count()
    assert(pts == 2)
    assert(c32.get(ids = Seq("a")).select("document").as[String].head() == "patched")
    import scala.jdk.CollectionConverters._
    val bucketDirs = Files.list(java.nio.file.Paths.get(root, "c", f"data_v${c32.meta.version}%06d"))
      .iterator.asScala.map(_.getFileName.toString).filter(_.startsWith("pt=")).toSeq
    assert(bucketDirs.forall(_.stripPrefix("pt=").toInt < 4), s"bucket drift: $bucketDirs")
  }

  test("schema evolution: later batch adds a column, old linked files still read") {
    val c = freshCatalog().getOrCreateCollection("c")
    c.add(batch(("a", "1", Seq(1f))))
    val withExtra = Seq(("z", "new", Seq(2f), "en")).toDF("id", "document", "embedding", "lang")
    c.add(withExtra)
    val all = c.toDF.orderBy("id")
    assert(all.columns.contains("lang"))
    val rows = all.select("id", "lang").as[(String, Option[String])].collect().toMap
    assert(rows == Map("a" -> None, "z" -> Some("en")))
  }

  test("export round-trips parquet/json and flattens csv") {
    val c = freshCatalog().getOrCreateCollection("c")
    c.add(Seq(("a", "doc", Seq(1f, 2f), Map("k" -> "v")))
      .toDF("id", "document", "embedding", "metadata"))
    val base = Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "exp").toString
    c.export(base + "/p", "parquet")
    assert(spark.read.parquet(base + "/p").count() == 1)
    c.export(base + "/j", "json")
    assert(spark.read.json(base + "/j").select("id").as[String].head() == "a")
    c.export(base + "/c", "csv")
    val csv = spark.read.option("header", "true").csv(base + "/c").head()
    assert(csv.getAs[String]("embedding") == "1.0,2.0")
    assert(csv.getAs[String]("metadata").contains("\"k\":\"v\""))
    intercept[IllegalArgumentException] { c.export(base + "/x", "avro") }
  }

  test("importCollection round-trips an export; add-time invariants gate it") {
    val cat = freshCatalog()
    val c = cat.getOrCreateCollection("src", "cosine")
    c.add(Seq(
      ("a", "doc a", Seq(1f, 2f), Map("k" -> "v")),
      ("b", "doc b", Seq(3f, 4f), Map("k" -> "w")))
      .toDF("id", "document", "embedding", "metadata"))
    val base = Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "imp").toString
    c.export(base + "/p", "parquet")
    val back = cat.importCollection("copy", base + "/p", space = "cosine")
    assert(back.count() == 2)
    assert(back.get(ids = Seq("a")).select("document").head().getString(0) == "doc a")
    assert(back.space == "cosine")
    // existing name and id-less sources are rejected loudly
    intercept[IllegalArgumentException](cat.importCollection("copy", base + "/p"))
    Seq((1, "x")).toDF("n", "t").write.parquet(base + "/noid")
    intercept[IllegalArgumentException](cat.importCollection("c2", base + "/noid"))
    // a corrupted export (duplicate ids) fails through add's gate
    spark.read.parquet(base + "/p").unionAll(spark.read.parquet(base + "/p"))
      .write.parquet(base + "/dup")
    intercept[IllegalArgumentException](cat.importCollection("c3", base + "/dup"))
    // ADVICE r8: a rejected source must leave NO registered collection
    // behind (the import builds in a temp sibling and only adopts a
    // complete load) — the name stays free and the retry succeeds
    assert(cat.getCollection("c3").isEmpty, "rejected import left residue")
    assert(!cat.listCollections().contains("c3"))
    assert(cat.importCollection("c3", base + "/p").count() == 2)
  }

  test("rename moves the catalog entry and rewrites meta name (B11)") {
    val cat = freshCatalog()
    val c = cat.getOrCreateCollection("old", "cosine")
    c.add(batch(("a", "doc", Seq(1f))))
    assert(cat.renameCollection("old", "new"))
    assert(cat.listCollections() == Seq("new"))
    val renamed = cat.getCollection("new").get
    assert(renamed.name == "new" && renamed.space == "cosine" && renamed.count() == 1)
    assert(!cat.renameCollection("missing", "x"))
    cat.getOrCreateCollection("blocker")
    assert(!cat.renameCollection("new", "blocker")) // refuse to clobber
  }

  test("vacuum drops unreferenced versions, retires byte-store owners from history") {
    val cat = freshCatalog()
    val c = cat.getOrCreateCollection("c")
    c.add(batch(("a", "1", Seq(1f)), ("b", "2", Seq(2f))))
    c.upsert(batch(("a", "1b", Seq(3f))))
    c.upsert(batch(("b", "2b", Seq(4f))))
    assert(c.meta.version == 3)
    // v3's manifest still references a predecessor for physical bytes —
    // that owner survives as a byte store (retired from history); only
    // wholly-unreferenced dirs are reclaimed
    val removed = c.vacuum()
    assert(removed >= 1)
    assert(c.history() == Seq(3), s"byte-store owners must leave history: ${c.history()}")
    // current version fully readable through its manifest after vacuum
    val docs = c.toDF.select("id", "document").as[(String, String)].collect().toMap
    assert(docs == Map("a" -> "1b", "b" -> "2b"))
    assert(c.vacuum() == 0) // idempotent
  }

  test("copy-on-write: mutations bump version, data is hash-bucketed") {
    val cat = freshCatalog()
    val c = cat.getOrCreateCollection("c")
    c.add(batch(("a", "1", Seq(1f))))
    val v1 = c.meta.version
    c.upsert(batch(("a", "2", Seq(2f))))
    assert(c.meta.version == v1 + 1)
    // bucket partition column exists on disk but is hidden from readers
    assert(!c.toDF.columns.contains("pt"))
  }

  // 16 vectors in 4 tight axis-aligned clusters — cluster membership is
  // unambiguous, so the IVF assignment is stable under float noise
  private def clusterBatch() = {
    val axes = Seq(Seq(1f, 0f, 0f, 0f), Seq(0f, 1f, 0f, 0f),
      Seq(0f, 0f, 1f, 0f), Seq(0f, 0f, 0f, 1f))
    val rows = for (cl <- 0 until 4; i <- 0 until 4) yield {
      val v = axes(cl).zipWithIndex.map { case (x, j) =>
        x + (if (j == (cl + 1) % 4) 0.01f * (i + 1) else 0f) }
      (f"${cl * 4 + i}%02d", s"doc $cl$i", v)
    }
    batch(rows: _*)
  }

  test("IVF index: probing every cell reproduces the exact query bit-for-bit") {
    val c = freshCatalog().getOrCreateCollection("c", "cosine")
    c.add(clusterBatch())
    c.buildIndexSeeded(Seq("00", "04", "08", "12"))
    assert(c.hasIndex)
    val q = Seq(0.9f, 0.1f, 0f, 0f)
    val viaIndex = c.query(q, 5, nprobe = 4)
      .select("id", "dist").as[(String, Double)].collect().toSeq
    val exact = c.query(q, 5, exact = true)
      .select("id", "dist").as[(String, Double)].collect().toSeq
    assert(viaIndex == exact)
  }

  test("IVF index: nprobe=1 serves results from the nearest cell only") {
    val c = freshCatalog().getOrCreateCollection("c", "l2")
    c.add(clusterBatch())
    c.buildIndexSeeded(Seq("00", "04", "08", "12"))
    val got = c.query(Seq(1f, 0f, 0f, 0f), 8, nprobe = 1)
      .select("id").as[String].collect().toSet
    // cluster 0 = ids 00..03; a single probe cannot reach other cells
    assert(got == Set("00", "01", "02", "03"))
  }

  test("IVF index: where prefilter applies on the pruned read path") {
    val c = freshCatalog().getOrCreateCollection("c", "l2")
    c.add(clusterBatch())
    c.buildIndexSeeded(Seq("00", "04", "08", "12"))
    val got = c.query(Seq(1f, 0f, 0f, 0f), 8, nprobe = 4,
        where = Some(ChromaFilter.In("id", Seq("01", "05"))))
      .select("id").as[String].collect().toSet
    assert(got == Set("01", "05"))
  }

  test("IVF index: queryBatch through the index matches per-vector query()") {
    val c = freshCatalog().getOrCreateCollection("c", "cosine")
    c.add(clusterBatch())
    c.buildIndexSeeded(Seq("00", "04", "08", "12"))
    val qs = Seq(Seq(1f, 0f, 0f, 0f), Seq(0f, 0f, 1f, 0f))
    val got = c.queryBatch(qs, k = 3, nprobe = 2)
      .select("qid", "rnk", "id").as[(Int, Int, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    qs.zipWithIndex.foreach { case (q, i) =>
      val single = c.query(q, 3, nprobe = 2).select("id").as[String].collect().toSeq
      assert(got(i) == single, s"query $i batch/single mismatch through index")
    }
  }

  test("IVF index: any mutation invalidates it; reads fall back to exact") {
    val c = freshCatalog().getOrCreateCollection("c", "l2")
    c.add(clusterBatch())
    c.buildIndexSeeded(Seq("00", "04", "08", "12"))
    assert(c.hasIndex)
    // a new row nearly identical to the query vector
    c.upsert(batch(("zz", "late", Seq(1f, 0.001f, 0f, 0f))))
    assert(!c.hasIndex, "stale index must not serve the new version")
    val top = c.query(Seq(1f, 0f, 0f, 0f), 1).select("id").as[String].head()
    assert(top == "zz", "fallback must be the exact scan over CURRENT data")
    // rebuild over the new version restores the pruned path
    c.buildIndexSeeded(Seq("00", "04", "08", "12"))
    assert(c.hasIndex)
    assert(c.query(Seq(1f, 0f, 0f, 0f), 1, nprobe = 4)
      .select("id").as[String].head() == "zz")
  }

  test("IVF refreshIndex: touched buckets reassign, the rest hard-link, results stay exact") {
    val c = freshCatalog().getOrCreateCollection("c", "l2")
    c.add(clusterBatch())
    c.buildIndexSeeded(Seq("00", "04", "08", "12"))
    assert(c.hasIndex)
    // mutate: one new row near cluster 0 + delete one cluster-2 row —
    // two commits, at most 2 of the 4 id buckets touched
    c.upsert(batch(("zz", "late", Seq(1f, 0.001f, 0f, 0f))))
    c.delete(ids = Seq("09"))
    assert(!c.hasIndex)
    val rebuilt = c.refreshIndex()
    assert(rebuilt >= 1 && rebuilt <= 2,
      s"expected only the touched buckets to reassign, got $rebuilt of 4")
    assert(c.hasIndex)
    // the refreshed index must serve post-mutation truth through the
    // PRUNED path: new row found first, deleted row gone, and probing
    // every cell reproduces the exact scan bit-for-bit
    assert(c.query(Seq(1f, 0f, 0f, 0f), 1, nprobe = 4)
      .select("id").as[String].head() == "zz")
    val viaIndex = c.query(Seq(0f, 0f, 1f, 0f), 8, nprobe = 4)
      .select("id", "dist").as[(String, Double)].collect().toSeq
    val exact = c.query(Seq(0f, 0f, 1f, 0f), 8, exact = true)
      .select("id", "dist").as[(String, Double)].collect().toSeq
    assert(viaIndex == exact)
    assert(!viaIndex.map(_._1).contains("09"))
    // no pb leakage into the query output schema
    assert(!c.query(Seq(1f, 0f, 0f, 0f), 1, nprobe = 4).columns.contains("pb"))
    // already current → no-op
    assert(c.refreshIndex() == 0)
  }

  test("auto-compaction policy: a long point-upsert run stays under the file bound hands-off") {
    val cat = freshCatalog()
    val auto = cat.getOrCreateCollection("auto",
      metadata = Map("graft:autocompact.maxfiles" -> "6"))
    val manual = cat.getOrCreateCollection("manual")
    def nFiles(c: graft.catalog.Collection) =
      c.get().inputFiles.count(_.endsWith(".parquet"))
    (0 until 16).foreach { i =>
      val b = batch((f"id$i%02d", s"doc $i", Seq(i.toFloat, 1f)))
      auto.upsert(b); manual.upsert(b)
      // the policy runs AFTER each commit, so at every API boundary the
      // resolved file count sits at or under the bound
      assert(nFiles(auto) <= 6, s"round $i: ${nFiles(auto)} files escaped the bound")
    }
    assert(nFiles(manual) > 6,
      "control: without the policy the same run accumulates small files")
    // contents are untouched by the policy's compact/vacuum cycles
    assert(auto.get().orderBy("id").collect().toSeq ==
      manual.get().orderBy("id").collect().toSeq)
    // vacuum ran too: superseded versions were reclaimed along the way
    assert(auto.history().size < manual.history().size)
  }

  test("auto-compaction policy bounds index files across refresh chains") {
    val root = Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "coll-autoidx").toString
    val cat = new CollectionCatalog(spark, root, numBuckets = 4)
    def indexDiskFiles(name: String): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).fold(Seq.empty[java.io.File])(_.toSeq)
          .flatMap(walk)
        else Seq(f)
      Option(new java.io.File(s"$root/$name").listFiles()).fold(Seq.empty[java.io.File])(_.toSeq)
        .filter(_.getName.startsWith("index_v"))
        .flatMap(walk).count(_.getName.endsWith(".parquet"))
    }
    // floor: 4 data buckets, 2 cells x 4 pb slices = 8 index leaves;
    // bound 16 sits above both floors (a bound under the floor would
    // re-compact every commit — documented policy constraint). The
    // keephistory=1 keeps the data policy from also firing vacuums that
    // would confuse the comparison -- same chain runs on a control.
    def run(name: String, metadata: Map[String, String]): Unit = {
      // ivf:nlist makes the full-rebuild fallback legal: when the DATA
      // policy compacts (a full rewrite), the incremental diff basis is
      // gone by design and the next refresh re-trains — policy interplay,
      // not an error
      val c = cat.getOrCreateCollection(name,
        metadata = metadata + ("ivf:nlist" -> "2"))
      c.add(clusterBatch())
      c.buildIndexSeeded(Seq("00", "08"))
      (0 until 8).foreach { i =>
        c.upsert(batch((f"nx$i%02d", s"new $i", Seq(1f, 0.001f * i, 0f, 0f))))
        c.refreshIndex()
        assert(c.hasIndex)
      }
      // the index still answers exactly after any policy-driven compaction
      val viaIndex = c.query(Seq(1f, 0f, 0f, 0f), 5, nprobe = 2)
        .select("id").as[String].collect().toSeq
      val exact = c.query(Seq(1f, 0f, 0f, 0f), 5, exact = true)
        .select("id").as[String].collect().toSeq
      assert(viaIndex == exact, s"$name: pruned path diverged from exact")
    }
    run("pol", Map("graft:autocompact.maxfiles" -> "16"))
    run("ctl", Map.empty)
    val (pol, ctl) = (indexDiskFiles("pol"), indexDiskFiles("ctl"))
    assert(pol < ctl,
      s"policy should bound the refresh chain's index files: $pol vs control $ctl")
    // disk total = the RESOLVED set the policy bounds (<= 16 at every
    // refresh boundary) + superseded dirs still alive as carry targets
    // until the next policy vacuum — bounded by one compacted build's
    // floor (2 cells x 4 pb slices)
    assert(pol <= 16 + 8, s"resolved+superseded index files after the run: $pol")
  }

  test("refit(): trains on the current corpus, re-embeds, bumps the binding; stale paths fail loud") {
    import graft.operators.TfIdfSrpEmbedder
    val root = Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "coll-refit").toString
    val cat = new CollectionCatalog(spark, root, numBuckets = 4)
    val c = cat.getOrCreateCollection("rf") // l2: zero vectors legal
    val docsA = Seq(("1", "alpha beta gamma"), ("2", "alpha beta"), ("3", "delta"))
      .toDF("id", "document")
    val efA = TfIdfSrpEmbedder.fit(docsA, "document", dim = 8, vocabSize = 4)
    c.addDocuments(docsA, efA)
    // growing the corpus with the SAME model is allowed...
    c.addDocuments(Seq(("4", "epsilon zeta alpha epsilon"), ("5", "zeta zeta"))
      .toDF("id", "document"), efA)
    // ...and shifts the df statistics, so a re-fit learns a DIFFERENT model
    val vBefore = c.get(ids = Seq("1")).select("embedding")
      .as[Seq[Float]].head()
    val efB = c.refit(vocabSize = 4)
    assert(efB.modelText != efA.modelText,
      "refit on the grown corpus must produce a different model")
    assert(c.meta.metadata("embedding_function") == efA.name,
      "same family + dim → the binding NAME is unchanged")
    // every stored vector was re-embedded through the new model
    val vAfter = c.get(ids = Seq("1")).select("embedding").as[Seq[Float]].head()
    assert(vAfter == efB.embedOne("alpha beta gamma"))
    assert(vAfter != vBefore)
    // queryText resolves the NEW model (binding + sidecar + fp agree)
    assert(c.queryText(Seq("alpha epsilon"), k = 5).count() == 5)
    // a client still holding the PRE-refit function is rejected loudly
    val stale = intercept[IllegalArgumentException] {
      c.addDocuments(Seq(("9", "theta")).toDF("id", "document"), efA)
    }
    assert(stale.getMessage.contains("DIFFERS"))
    // crash-window detector: a sidecar that disagrees with the committed
    // fingerprint (here: hand-restored to the OLD model) fails loudly at
    // resolution instead of serving garbage distances
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "rf", "_embedder.txt"),
      efA.modelText.getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException](c.queryText(Seq("alpha"), k = 1))
    assert(e.getMessage.contains("stale"))
    // restoring the matching sidecar recovers
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "rf", "_embedder.txt"),
      efB.modelText.getBytes("UTF-8"))
    assert(c.queryText(Seq("alpha"), k = 1).count() == 1)
    // refit is fenced to fitted bindings
    val h = cat.getOrCreateCollection("hash", space = "cosine")
    h.addDocuments(Seq(("1", "alpha")).toDF("id", "document"),
      graft.operators.HashingEmbedder(8))
    intercept[IllegalArgumentException](h.refit())
    intercept[IllegalStateException](cat.getOrCreateCollection("unbound").refit())
  }

  test("parquet export/import carries collection identity: space, metadata, fitted model") {
    import graft.operators.TfIdfSrpEmbedder
    val root = Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "coll-xpid").toString
    val cat = new CollectionCatalog(spark, root, numBuckets = 4)
    val docs = Seq(("1", "alpha beta"), ("2", "beta gamma"), ("3", "alpha delta"))
      .toDF("id", "document")
    val src = cat.getOrCreateCollection("src", metadata = Map("team" -> "ml"))
    val ef = TfIdfSrpEmbedder.fit(docs, "document", dim = 8, vocabSize = 4)
    src.addDocuments(docs, ef)
    src.export(s"$root/xp", "parquet")
    val back = cat.importCollection("dst", s"$root/xp")
    // identity traveled: space, user metadata, binding AND the model
    assert(back.space == "l2")
    assert(back.meta.metadata("team") == "ml")
    assert(back.meta.metadata("embedding_function") == ef.name)
    def hits(c: graft.catalog.Collection) = c.queryText(Seq("alpha"), k = 3)
      .select("rnk", "id").as[(Int, String)].collect().toSeq.sorted
    assert(hits(back) == hits(src),
      "the imported collection must answer queryText like the source")
    // explicit caller args still win over the exported identity, per key
    val over = cat.importCollection("dst2", s"$root/xp",
      metadata = Map("team" -> "search"))
    assert(over.meta.metadata("team") == "search")
    assert(over.meta.metadata("embedding_function") == ef.name)
    // a tampered export (model sidecar removed) fails loudly at import,
    // not later as garbage distances
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(root, "xp", "_embedder.txt"))
    val e = intercept[IllegalArgumentException](
      cat.importCollection("dst3", s"$root/xp"))
    assert(e.getMessage.contains("sidecar"))
    // an export-less plain parquet dir still imports as before
    docs.write.mode("overwrite").parquet(s"$root/plain-src")
    assert(cat.importCollection("plain", s"$root/plain-src").count() == 3)
  }

  test("dot-prefixed collection names are rejected at creation/fork/rename") {
    val cat = freshCatalog()
    // reserved for in-flight build temps — an admitted dot name would be
    // invisible to listCollections and deletable by fork's temp reclaim
    intercept[IllegalArgumentException](cat.getOrCreateCollection(".archive"))
    cat.getOrCreateCollection("ok").add(batch(("1", "a", Seq(1f, 0f))))
    intercept[IllegalArgumentException](cat.forkCollection("ok", ".fork-tmp-x"))
    intercept[IllegalArgumentException](cat.renameCollection("ok", ".hidden"))
    assert(cat.listCollections() == Seq("ok"))
  }

  test("refreshIndexReport measures cell-occupancy drift; re-train restores balance") {
    val c = freshCatalog().getOrCreateCollection("c", "l2")
    c.add(clusterBatch())
    c.buildIndexSeeded(Seq("00", "04", "08", "12"))
    // baseline: 16 rows over 4 cells, 4 each — perfectly balanced
    val base = c.indexOccupancy().get
    assert(base.nCells == 4 && base.totalRows == 16 && base.maxCellRows == 4)
    assert(base.skew == 1.0)
    // deliberately DRIFT the corpus: 32 new rows piled onto cluster 0's
    // centroid — a refresh keeps the old centroids, so they all land in
    // one cell
    val drift = (0 until 32).map(i =>
      (f"dx$i%02d", s"drift $i", Seq(1f + 0.001f * i, 0f, 0f, 0f)))
    c.upsert(batch(drift: _*))
    val report = c.refreshIndexReport(driftThreshold = 2.0)
    assert(report.refreshedBuckets >= 1)
    // hot cell: original 4 cluster-0 rows + all 32 drifted = 36 of 48
    // rows over 4 cells (mean 12) → skew exactly 3.0, above threshold
    assert(report.occupancy.totalRows == 48)
    assert(report.occupancy.maxCellRows == 36)
    assert(report.skew == 3.0)
    // the signalled remedy — a re-train whose seeds span the drifted
    // region — restores balance below the drifted figure
    c.buildIndexSeeded(Seq("dx00", "dx31", "04", "08"))
    val after = c.indexOccupancy().get
    assert(after.skew < report.skew,
      s"re-train should rebalance: skew ${after.skew} vs drifted ${report.skew}")
    // results through the re-trained index stay exact
    val viaIndex = c.query(Seq(0f, 1f, 0f, 0f), 6, nprobe = 4)
      .select("id").as[String].collect().toSeq
    val exact = c.query(Seq(0f, 1f, 0f, 0f), 6, exact = true)
      .select("id").as[String].collect().toSeq
    assert(viaIndex == exact)
  }

  test("refreshIndex runs the same cell/pb clash guard as the full builds") {
    val c = freshCatalog().getOrCreateCollection("c", "l2")
    c.add(clusterBatch())
    c.buildIndexSeeded(Seq("00", "04", "08", "12"))
    // upsert's allowMissingColumns admits a NEW user column named 'cell';
    // an unguarded refresh would silently overwrite it in the rebuilt
    // slices via assignCells' withColumn("cell", ...)
    val poison = Seq(("zz", "late", Seq(1f, 0f, 0f, 0f), "user-data"))
      .toDF("id", "document", "embedding", "cell")
    c.upsert(poison)
    val e = intercept[IllegalArgumentException](c.refreshIndex())
    assert(e.getMessage.contains("cell"))
  }

  test("queryStruct: Chroma-shaped parallel lists match the long form; include filters") {
    val c = freshCatalog().getOrCreateCollection("c", "cosine")
    c.add(batch(("a", "d a", Seq(1f, 0f)), ("b", "d b", Seq(0.9f, 0.1f)),
      ("c", "d c", Seq(0f, 1f)), ("d", "d d", Seq(0.1f, 0.9f))))
    val qs = Seq(Seq(1f, 0f), Seq(0f, 1f))
    val long = c.queryBatch(qs, k = 2)
      .select("qid", "rnk", "id", "dist", "document")
      .as[(Int, Int, String, Double, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val wide = c.queryStruct(qs, k = 2).orderBy("qid")
      .select("qid", "ids", "documents", "distances")
      .as[(Int, Seq[String], Seq[String], Seq[Double])].collect()
    assert(wide.map(_._1).toSeq == Seq(0, 1))
    wide.foreach { case (qid, ids, docs, dists) =>
      assert(ids == long(qid).map(_._3).toSeq, s"ids mismatch for q$qid")
      assert(docs == long(qid).map(_._5).toSeq, s"documents mismatch for q$qid")
      assert(dists == long(qid).map(_._4).toSeq, s"distances mismatch for q$qid")
    }
    // include control: asking only for ids drops the other lists
    val idsOnly = c.queryStruct(qs, k = 2, include = Set.empty)
    assert(idsOnly.columns.toSeq == Seq("qid", "ids"))
    // include=["embeddings"] (r13): per-hit VECTORS ride back, id-aligned
    // (Chroma's query accepts it; the long form deliberately drops them)
    val withEmb = c.queryStruct(qs, k = 2, include = Set("embeddings"))
      .orderBy("qid")
      .select("qid", "ids", "embeddings")
      .as[(Int, Seq[String], Seq[Seq[Float]])].collect()
    withEmb.foreach { case (qid, ids, embs) =>
      assert(ids == long(qid).map(_._3).toSeq)
      assert(embs.length == ids.length)
      // rank-1 of query 0 is "a" = [1, 0]; of query 1 is "c" = [0, 1]
    }
    assert(withEmb(0)._3.head == Seq(1f, 0f))
    assert(withEmb(1)._3.head == Seq(0f, 1f))
    // unknown entries still fail loudly
    intercept[IllegalArgumentException] {
      c.queryStruct(qs, k = 2, include = Set("embedings"))
    }
  }

  test("queryStruct: a zero-hit query still gets its row, with empty lists") {
    val c = freshCatalog().getOrCreateCollection("c", "cosine")
    c.add(Seq(("a", "d a", Seq(1f, 0f), "en"), ("b", "d b", Seq(0f, 1f), "en"))
      .toDF("id", "document", "embedding", "lang"))
    // filter matches nothing: Chroma still returns one (empty) entry per query
    val out = c.queryStruct(Seq(Seq(1f, 0f), Seq(0f, 1f)), k = 2,
        where = Some(ChromaFilter.Eq("lang", "xx")))
      .select("qid", "ids", "distances")
      .as[(Int, Seq[String], Seq[Double])].collect().toSeq
    assert(out == Seq((0, Nil, Nil), (1, Nil, Nil)),
      "positional alignment with the query list must survive empty results")
  }

  test("IVF index: rebuilds never delete the adopted build in place; vacuum reclaims") {
    val root = tmpDir("coll-test")
    val c = new CollectionCatalog(spark, root, numBuckets = 4)
      .getOrCreateCollection("c", "l2")
    c.add(clusterBatch())
    c.buildIndexSeeded(Seq("00", "04", "08", "12"))
    c.buildIndexSeeded(Seq("01", "05", "09", "13"))  // rebuild, same version
    val idxDirs = Files.list(java.nio.file.Paths.get(root, "c")).iterator()
    val builds = scala.jdk.CollectionConverters.IteratorHasAsScala(idxDirs).asScala
      .map(_.getFileName.toString).filter(_.startsWith("index_v")).toSeq.sorted
    assert(builds.size == 2, s"a rebuild must claim a FRESH dir, got $builds")
    // readers adopt the newest committed build and the query still answers
    assert(c.hasIndex)
    assert(c.query(Seq(1f, 0f, 0f, 0f), 1).select("id").as[String].head() == "01"
      || c.query(Seq(1f, 0f, 0f, 0f), 1).select("id").as[String].head() == "00")
    // vacuum reclaims the superseded build, keeps the adopted one
    assert(c.vacuum() >= 1)
    val after = Files.list(java.nio.file.Paths.get(root, "c")).iterator()
    val left = scala.jdk.CollectionConverters.IteratorHasAsScala(after).asScala
      .map(_.getFileName.toString).filter(_.startsWith("index_v")).toSeq
    assert(left == Seq(builds.max), s"only the adopted build survives, got $left")
    assert(c.hasIndex, "vacuum must not break the live index")
  }

  test("racing index builds claim distinct dirs; both commit, reader adopts one") {
    val root = tmpDir("coll-race")
    val c = new CollectionCatalog(spark, root, numBuckets = 4)
      .getOrCreateCollection("c", "l2")
    c.add(clusterBatch())
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 2).map(_ => new Thread(() =>
      try c.buildIndexSeeded(Seq("00", "04", "08", "12"))
      catch { case e: Throwable => errs.add(e) }))
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"racing builders must both succeed: ${errs.peek()}")
    val builds = Files.list(java.nio.file.Paths.get(root, "c")).iterator()
    val names = scala.jdk.CollectionConverters.IteratorHasAsScala(builds).asScala
      .map(_.getFileName.toString).filter(_.startsWith("index_v")).toSeq
    assert(names.size == 2, s"each racer claims its own build dir, got $names")
    assert(c.hasIndex)
    assert(c.query(Seq(1f, 0f, 0f, 0f), 1).select("id").as[String].head() == "00")
  }

  test("getStruct: Chroma-shaped parallel lists match get(); include controls") {
    val c = freshCatalog().getOrCreateCollection("c", "l2")
    c.add(Seq(("b", "doc b", Seq(0f, 1f), "es"), ("a", "doc a", Seq(1f, 0f), "en"),
      ("c", "doc c", Seq(1f, 1f), "en")).toDF("id", "document", "embedding", "lang"))
    val long = c.get(where = Some(ChromaFilter.Eq("lang", "en")))
      .select("id", "document").as[(String, String)].collect().toSeq
    val (ids, docs, metas) = c.getStruct(where = Some(ChromaFilter.Eq("lang", "en")))
      .select("ids", "documents", "metadatas")
      .as[(Seq[String], Seq[String], Seq[Map[String, String]])].head()
    assert(ids == long.map(_._1))          // id-ordered, like get()
    assert(docs == long.map(_._2))
    assert(metas == Seq(Map("lang" -> "en"), Map("lang" -> "en")))
    // include=embeddings returns the vectors; empty include = ids only
    val e = c.getStruct(ids = Seq("a"), include = Set("embeddings"))
    assert(e.columns.toSeq == Seq("ids", "embeddings"))
    assert(e.select("embeddings").as[Seq[Seq[Float]]].head() == Seq(Seq(1f, 0f)))
    val zero = c.getStruct(where = Some(ChromaFilter.Eq("lang", "xx")))
    assert(zero.select("ids").as[Seq[String]].head() == Nil,
      "empty page still yields the single row with empty lists")
    intercept[IllegalArgumentException] { c.getStruct(include = Set("distances")) }
  }

  test("collection tuning metadata: hnsw:space sets the space; ivf:nlist/nprobe set index defaults") {
    val cat = freshCatalog()
    // Chroma's metadata-driven space convention
    val c = cat.getOrCreateCollection("tuned",
      metadata = Map("hnsw:space" -> "cosine", "ivf:nlist" -> "4", "ivf:nprobe" -> "4"))
    assert(c.meta.space == "cosine")
    intercept[IllegalArgumentException] {
      cat.getOrCreateCollection("clash", space = "ip", metadata = Map("hnsw:space" -> "cosine"))
    }
    // get_or_create on an existing collection keeps its own metadata
    assert(cat.getOrCreateCollection("tuned", metadata = Map("x" -> "y"))
      .meta.metadata.get("x").isEmpty)
    c.add((0 until 12).map(i => (s"id$i", s"doc $i", Seq(i.toFloat, (12 - i).toFloat)))
      .toDF("id", "document", "embedding"))
    // buildIndex() sizes itself from ivf:nlist
    c.buildIndex()
    assert(c.hasIndex)
    // nprobe default comes from ivf:nprobe=4 (all cells) → equals exact
    val exact = c.query(Seq(1f, 11f), k = 3, exact = true)
      .select("id").as[String].collect().toSeq
    val viaMeta = c.query(Seq(1f, 11f), k = 3).select("id").as[String].collect().toSeq
    assert(viaMeta == exact, "nprobe=nlist from metadata must reproduce the exact scan")
    // a collection WITHOUT ivf:nlist refuses the no-arg build loudly
    val bare = cat.getOrCreateCollection("bare2")
    bare.add(Seq(("a", "d", Seq(1f, 0f))).toDF("id", "document", "embedding"))
    val e = intercept[IllegalArgumentException] { bare.buildIndex() }
    assert(e.getMessage.contains("ivf:nlist"))
  }

  test("include uris/data: real columns come back; absent ones answer with nulls") {
    val c = freshCatalog().getOrCreateCollection("c", "l2")
    c.add(Seq(
      ("a", "doc a", Seq(1f, 0f), "s3://bucket/a.png", Array[Byte](1, 2), "en"),
      ("b", "doc b", Seq(0f, 1f), "s3://bucket/b.png", Array[Byte](3), "es"))
      .toDF("id", "document", "embedding", "uri", "data", "lang"))
    val got = c.getStruct(include = Set("uris", "data"))
      .select("ids", "uris", "data")
      .as[(Seq[String], Seq[String], Seq[Array[Byte]])].head()
    assert(got._1 == Seq("a", "b"))
    assert(got._2 == Seq("s3://bucket/a.png", "s3://bucket/b.png"))
    assert(got._3.map(_.toSeq) == Seq(Seq[Byte](1, 2), Seq[Byte](3)))
    // uri/data are record FIELDS in Chroma, not metadata — they must not
    // leak into the metadata map as stringified keys
    val metas = c.getStruct(include = Set("metadatas"))
      .select("metadatas").as[Seq[Map[String, String]]].head()
    assert(metas == Seq(Map("lang" -> "en"), Map("lang" -> "es")), s"got $metas")
    // the query surface carries them per hit too
    val q = c.queryStruct(Seq(Seq(1f, 0f)), k = 1, include = Set("uris"))
      .select("uris").as[Seq[String]].head()
    assert(q == Seq("s3://bucket/a.png"))
    // a collection without the columns still answers — with nulls, like a
    // Chroma collection whose records carry no uri/data
    val bare = freshCatalog().getOrCreateCollection("bare", "l2")
    bare.add(Seq(("x", "doc x", Seq(1f, 0f))).toDF("id", "document", "embedding"))
    val nulls = bare.getStruct(include = Set("uris", "data"))
      .select("uris", "data").as[(Seq[String], Seq[Array[Byte]])].head()
    assert(nulls._1 == Seq(null) && nulls._2 == Seq(null))
  }

  test("struct surfaces return MAP-layout metadata as real key/value maps") {
    // the hydrated layout (q00) carries Chroma's own MAP<STRING,STRING>
    // `metadata` column — it must come back AS the map, not stringified
    // into a {"metadata": "{k -> v}"} blob
    val c = freshCatalog().getOrCreateCollection("c", "cosine")
    c.add(Seq(("a", "d a", Seq(1f, 0f), Map("rating" -> "9.1")),
      ("b", "d b", Seq(0f, 1f), Map("rating" -> "8.2")))
      .toDF("id", "document", "embedding", "metadata"))
    val g = c.getStruct().select("metadatas")
      .as[Seq[Map[String, String]]].head()
    assert(g == Seq(Map("rating" -> "9.1"), Map("rating" -> "8.2")))
    val q = c.queryStruct(Seq(Seq(1f, 0f)), k = 1).select("metadatas")
      .as[Seq[Map[String, String]]].head()
    assert(q == Seq(Map("rating" -> "9.1")))
  }

  test("queryStruct: metadatas come back as one string map per hit") {
    val c = freshCatalog().getOrCreateCollection("c", "l2")
    c.add(Seq(("a", "d", Seq(1f, 0f), 3, "en"), ("b", "d", Seq(0f, 1f), 5, "es"))
      .toDF("id", "document", "embedding", "label", "lang"))
    val m = c.queryStruct(Seq(Seq(1f, 0f)), k = 2)
      .select("metadatas").as[Seq[Map[String, String]]].head()
    assert(m == Seq(Map("label" -> "3", "lang" -> "en"),
      Map("label" -> "5", "lang" -> "es")))
  }

  test("IVF index: k-means buildIndex variant answers queries (library path)") {
    val c = freshCatalog().getOrCreateCollection("c", "l2")
    c.add(clusterBatch())
    c.buildIndex(nlist = 4)
    val viaIndex = c.query(Seq(0f, 1f, 0f, 0f), 4, nprobe = 4)
      .select("id").as[String].collect().toSeq
    val exact = c.query(Seq(0f, 1f, 0f, 0f), 4, exact = true)
      .select("id").as[String].collect().toSeq
    assert(viaIndex == exact)
    assert(c.dropIndex() && !c.hasIndex)
  }

  test("forkCollection: hard-linked snapshot, isolated divergence, lineage") {
    val cat = freshCatalog()
    val src = cat.getOrCreateCollection("f", space = "cosine",
      metadata = Map("k" -> "v"))
    src.add(batch(("1", "a", Seq(1f, 0f)), ("2", "b", Seq(0f, 1f)),
      ("3", "c", Seq(1f, 1f))))
    val dst = cat.forkCollection("f", "f2")
    // fork carries content, space, metadata + lineage
    assert(dst.count() == 3)
    assert(dst.space == "cosine")
    assert(dst.meta.metadata("k") == "v")
    assert(dst.meta.metadata("forked_from") == "f@v1")
    // diverge the fork; the source must not move
    dst.upsert(batch(("2", "B", Seq(0f, 2f))))
    dst.delete(ids = Seq("3"))
    assert(dst.count() == 2)
    assert(src.count() == 3)
    assert(src.get(ids = Seq("2")).select("document").head().getString(0) == "b")
    assert(dst.get(ids = Seq("2")).select("document").head().getString(0) == "B")
    // ...and mutating the source must not move the fork
    src.upsert(batch(("1", "A2", Seq(2f, 0f))))
    assert(dst.get(ids = Seq("1")).select("document").head().getString(0) == "a")
    // double-fork and unknown-source are rejected
    intercept[IllegalArgumentException](cat.forkCollection("f", "f2"))
    intercept[IllegalArgumentException](cat.forkCollection("nope", "f3"))
    // forking an empty collection yields an empty fork with lineage
    cat.getOrCreateCollection("e")
    val ef = cat.forkCollection("e", "e2")
    assert(ef.count() == 0)
    assert(ef.meta.metadata("forked_from") == "e@v0")
  }

  test("forkCollection is crash-safe: temp-sibling residue is reclaimed, never listed") {
    val root = Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "coll-test")
    val cat = new CollectionCatalog(spark, root.toString, numBuckets = 4)
    val src = cat.getOrCreateCollection("cs", space = "l2")
    src.add(batch(("1", "a", Seq(1f, 0f)), ("2", "b", Seq(0f, 1f))))
    // simulate a crashed earlier fork: a half-built temp sibling with
    // claimed version + linked data but no completed adoption
    val tmp = root.resolve(".fork-tmp-cs2")
    Files.createDirectories(tmp.resolve("data_v000001"))
    Files.write(tmp.resolve("stale.bin"), Array[Byte](1, 2, 3))
    // residue must not surface as a collection
    assert(cat.listCollections() == Seq("cs"))
    // a retry reclaims the temp and completes: dstDir is absent-or-complete
    val dst = cat.forkCollection("cs", "cs2")
    assert(dst.count() == 2)
    assert(cat.listCollections() == Seq("cs", "cs2"))
    assert(!Files.exists(tmp), "stale temp must be reclaimed by the retry")
  }
}
