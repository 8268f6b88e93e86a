package graft.catalog

import java.nio.file.Files
import java.nio.file.Paths

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.functions._

import graft.operators.ChromaFilter

/** The carry-manifest carry-forward (`_graft_carry.json`): logical
  * ownership references instead of hard links, so the copy-on-write store
  * has NO POSIX-only dependency in any per-mutation path — a merge/
  * rollback/index-refresh commit is O(touched data) + O(partitions)
  * metadata on any filesystem (object stores included, where links don't
  * exist). These specs pin the structural invariants: one-hop resolution,
  * untouched owners, vacuum reachability, compaction collapse, and the
  * index-slice carry surviving vacuum. */
class CarrySpec extends graft.SparkTestBase {
  import spark.implicits._

  private val io: StoreIO = new StoreIO.Local

  private def fresh(buckets: Int = 4): (CollectionCatalog, Path) = {
    val root = Files.createTempDirectory(
      Paths.get("/root/repo/target"), "carry-test")
    (new CollectionCatalog(spark, root.toString, numBuckets = buckets),
      new Path(root.toString))
  }

  private def rows(ids: Range) =
    ids.map(i => (s"id$i", s"doc $i", Seq(i.toFloat, 1f))).toDF("id", "document", "embedding")

  private def dataDirs(coll: Path): Seq[String] =
    io.list(coll).filter(e => e.isDir && e.name.startsWith("data_v"))
      .map(_.name).sorted

  private def parquetCount(p: Path): Int =
    io.list(p).map(e =>
      if (e.isDir) parquetCount(e.path)
      else if (e.name.endsWith(".parquet")) 1 else 0).sum

  test("chained point upserts stay ONE-HOP resolved: every manifest entry names the physical owner") {
    val (cat, root) = fresh()
    val c = cat.getOrCreateCollection("c")
    c.add(rows(0 until 24))
    // three point mutations → three carried commits
    Seq("id1", "id2", "id3").foreach { id =>
      c.upsert(Seq((id, s"patched $id", Seq(9f, 9f))).toDF("id", "document", "embedding"))
    }
    val cur = new Path(new Path(root, "c"), f"data_v${c.meta.version}%06d")
    val manifest = Carry.read(io, cur)
    assert(manifest.nonEmpty)
    manifest.foreach { case (part, owner) =>
      val ownerDir = new Path(new Path(root, "c"), owner)
      val bucketDir = new Path(ownerDir, part)
      assert(io.isDir(bucketDir),
        s"manifest entry $part -> $owner does not name a physical bucket dir")
      assert(io.list(bucketDir).exists(_.name.endsWith(".parquet")),
        s"owner $owner/$part holds no parquet — a chained (unresolved) reference")
      // and the owner does NOT itself carry this partition onward
      assert(!Carry.read(io, ownerDir).contains(part),
        s"owner $owner re-carries $part — manifests must resolve in one hop")
    }
    assert(c.count() == 24)
    assert(c.get(ids = Seq("id2")).select("document").as[String].head() == "patched id2")
  }

  test("rollback commits a manifest-only version: zero data movement, identical reads") {
    val (cat, root) = fresh()
    val c = cat.getOrCreateCollection("c")
    c.add(rows(0 until 12))
    val v1 = c.toDF.orderBy("id").collect().toSeq
    c.upsert(Seq(("id0", "broken", Seq(0f, 0f))).toDF("id", "document", "embedding"))
    c.rollbackTo(1)
    val cur = new Path(new Path(root, "c"), f"data_v${c.meta.version}%06d")
    // the rollback version holds NO parquet of its own — only the manifest
    assert(parquetCount(cur) == 0)
    assert(Carry.read(io, cur).nonEmpty)
    assert(c.toDF.orderBy("id").collect().toSeq == v1)
  }

  test("vacuum keeps owner dirs a retained manifest references, reclaims superseded rewrites") {
    val (cat, root) = fresh()
    val c = cat.getOrCreateCollection("c")
    c.add(rows(0 until 24)) // v1
    // rewrite the SAME id twice: v2's bucket rewrite is superseded by
    // v3's, so v2 becomes unreferenced while v1 stays the physical owner
    // of every untouched bucket
    c.upsert(Seq(("id5", "p1", Seq(1f, 1f))).toDF("id", "document", "embedding")) // v2
    c.upsert(Seq(("id5", "p2", Seq(2f, 2f))).toDF("id", "document", "embedding")) // v3
    val before = c.get().orderBy("id").collect().toSeq
    val reclaimed = c.vacuum()
    val left = dataDirs(new Path(root, "c"))
    assert(left.contains("data_v000001"), s"referenced owner v1 must survive, left: $left")
    assert(!left.contains("data_v000002"), s"superseded v2 must be reclaimed, left: $left")
    assert(left.contains("data_v000003"))
    assert(reclaimed >= 1)
    assert(c.get().orderBy("id").collect().toSeq == before)
    assert(c.get(ids = Seq("id5")).select("document").as[String].head() == "p2")
  }

  test("compact collapses the owner spread; vacuum then reclaims every old dir") {
    val (cat, root) = fresh()
    val c = cat.getOrCreateCollection("c")
    c.add(rows(0 until 24))
    (0 until 6).foreach { i =>
      c.upsert(Seq((s"id$i", s"p$i", Seq(9f, 9f))).toDF("id", "document", "embedding"))
    }
    val before = c.get().orderBy("id").collect().toSeq
    c.compact()
    val cur = new Path(new Path(root, "c"), f"data_v${c.meta.version}%06d")
    assert(Carry.read(io, cur).isEmpty, "a compacted version must carry nothing")
    c.vacuum()
    assert(dataDirs(new Path(root, "c")) == Seq(f"data_v${c.meta.version}%06d"),
      "after compact+vacuum exactly one data dir remains")
    assert(c.get().orderBy("id").collect().toSeq == before)
  }

  test("compactIndexes repacks both builds manifest-free; answers unchanged; refresh stays incremental") {
    val (cat, root) = fresh()
    val c = cat.getOrCreateCollection("c", metadata = Map("ivf:nlist" -> "2"))
    c.add(rows(0 until 24))
    c.buildIndex(nlist = 2)
    c.buildDocIndex()
    // two refresh rounds → carry chains + per-refresh small files
    Seq("id3", "id4").foreach { id =>
      c.upsert(Seq((id, s"rewritten brown $id", Seq(7f, 7f)))
        .toDF("id", "document", "embedding"))
      assert(c.refreshIndex() >= 1)
      assert(c.refreshDocIndex() >= 1)
    }
    val knnBefore = c.query(Seq(7f, 7f), k = 5, nprobe = 2)
      .select("id", "dist").collect().toSeq
    val docBefore = c.get(whereDoc = Some(ChromaFilter.Contains("brown")))
      .select("id").as[String].collect().toSet
    assert(c.compactIndexes() == 2)
    val builds = io.list(new Path(root, "c"))
      .filter(e => e.name.startsWith("index_v") || e.name.startsWith("docindex_v"))
      .map(_.path)
    val newest = builds
      .groupBy(p => if (p.getName.startsWith("docindex_v")) "doc" else "ivf")
      .values.map(_.maxBy(_.getName)).toSeq
    newest.foreach { b =>
      assert(Carry.read(io, b).isEmpty, s"compacted build $b must carry nothing")
    }
    assert(c.query(Seq(7f, 7f), k = 5, nprobe = 2)
      .select("id", "dist").collect().toSeq == knnBefore)
    assert(c.get(whereDoc = Some(ChromaFilter.Contains("brown")))
      .select("id").as[String].collect().toSet == docBefore)
    // vacuum reclaims every superseded/carried-from build, keeps the two live
    c.vacuum()
    val after = io.list(new Path(root, "c"))
      .filter(e => e.name.startsWith("index_v") || e.name.startsWith("docindex_v"))
    assert(after.size == 2, s"expected only the compacted builds, got ${after.map(_.name)}")
    // pb axis kept by default → the next refresh is still INCREMENTAL
    c.upsert(Seq(("id9", "one more brown row", Seq(3f, 3f)))
      .toDF("id", "document", "embedding"))
    assert(c.refreshDocIndex() < 4, "compaction must preserve the refresh axis")
    assert(c.refreshIndex() < 4)
  }

  test("compactIndexes(keepRefreshAxis=false): read-optimized single axis; next refresh full-rebuilds") {
    val (cat, root) = fresh()
    val c = cat.getOrCreateCollection("c", metadata = Map("ivf:nlist" -> "2"))
    c.add(rows(0 until 24))
    c.buildIndex(nlist = 2)
    c.buildDocIndex()
    c.upsert(Seq(("id3", "patched brown doc", Seq(7f, 7f)))
      .toDF("id", "document", "embedding"))
    assert(c.refreshIndex() >= 1 && c.refreshDocIndex() >= 1)
    assert(c.compactIndexes(keepRefreshAxis = false) == 2)
    // queries serve unchanged from the single-axis layout
    assert(c.get(whereDoc = Some(ChromaFilter.Contains("patched brown")))
      .select("id").as[String].collect().toSet == Set("id3"))
    assert(c.query(Seq(7f, 7f), k = 1, nprobe = 2)
      .select("id").as[String].head() == "id3")
    // no pb slices left to diff against → refresh falls back to a full rebuild
    c.upsert(Seq(("id5", "another patched row", Seq(2f, 2f)))
      .toDF("id", "document", "embedding"))
    assert(c.refreshDocIndex() == 4, "single-axis layout must full-rebuild")
    assert(c.refreshIndex() == 4)
    assert(c.get(whereDoc = Some(ChromaFilter.Contains("another patched")))
      .select("id").as[String].collect().toSet == Set("id5"))
  }

  test("index refresh carries slices by manifest; the carried-from build survives vacuum") {
    val (cat, root) = fresh()
    val c = cat.getOrCreateCollection("c")
    c.add(rows(0 until 24))
    c.buildDocIndex()
    c.upsert(Seq(("id1", "a fresh brown bear doc", Seq(9f, 9f)))
      .toDF("id", "document", "embedding"))
    val rebuilt = c.refreshDocIndex()
    assert(rebuilt >= 1)
    // the refreshed build carries unchanged gp/pb slices from the OLD build
    val builds = io.list(new Path(root, "c"))
      .filter(_.name.startsWith("docindex_v")).map(_.path)
      .sortBy(_.getName)
    val newest = builds.last
    val carried = Carry.read(io, newest)
    assert(carried.nonEmpty, "refresh must carry unchanged slices by manifest")
    assert(carried.values.toSet.contains(builds.head.getName))
    // vacuum keeps the old build: the live build references its slices
    c.vacuum()
    assert(io.exists(builds.head), "carried-from build must survive vacuum")
    // and the index path still answers ≡ scan
    assert(c.get(whereDoc = Some(ChromaFilter.Contains("brown")))
      .select("id").as[String].collect().toSet == Set("id1"))
    assert(c.get(whereDoc = Some(ChromaFilter.Contains("doc 2")))
      .select("id").as[String].collect().toSet == Set("id2", "id20", "id21", "id22", "id23"))
  }
}
