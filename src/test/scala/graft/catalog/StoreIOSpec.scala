package graft.catalog

import org.apache.hadoop.fs.Path

import graft.operators.ChromaFilter

/** The per-scheme filesystem layer under the commit protocol. The Local
  * backend is exercised by every other suite; here the HADOOP backend's
  * primitives get direct coverage, and then the WHOLE collection
  * lifecycle — add, carried merge commits, both index builds and
  * incremental refreshes, compaction, rollback, vacuum, fork (copy
  * path), rename — runs end-to-end with the Hadoop backend FORCED over
  * local files: the `hdfs:` code path is proven working, not just
  * compiled. */
class StoreIOSpec extends graft.SparkTestBase {
  import spark.implicits._

  private def conf = spark.sparkContext.hadoopConfiguration

  private def hadoopIO(p: Path): StoreIO =
    new StoreIO.Hdfs(p.getFileSystem(conf), conf)

  test("Hadoop backend primitives: exclusive create, exclusive dir claim, replace") {
    val root = new Path(tmpDir("hio-prim"))
    val io = hadoopIO(root)
    val f = new Path(root, "claim")
    io.createExclusive(f, "a".getBytes)
    intercept[java.nio.file.FileAlreadyExistsException] {
      io.createExclusive(f, "b".getBytes)
    }
    assert(new String(io.readBytes(f)) == "a", "loser must not clobber the winner")
    val d = new Path(root, "build.b000")
    io.createDirExclusive(d)
    intercept[java.nio.file.FileAlreadyExistsException] { io.createDirExclusive(d) }
    // replace: atomic-pointer-swap semantics (new content, old gone)
    val tmp = new Path(root, "meta.tmp"); val dst = new Path(root, "meta")
    io.writeBytes(dst, "old".getBytes)
    io.writeBytes(tmp, "new".getBytes)
    io.replace(tmp, dst)
    assert(new String(io.readBytes(dst)) == "new")
    assert(!io.exists(tmp))
    // listing carries dir-ness from the single listing call
    val entries = io.list(root).map(e => e.name -> e.isDir).toMap
    assert(entries("claim") == false && entries("build.b000") == true)
  }

  test("whole collection lifecycle through the FORCED Hadoop backend on local files") {
    conf.set(StoreIO.ForceKey, "hadoop")
    try {
      val root = tmpDir("hio-life")
      val cat = new CollectionCatalog(spark, root, numBuckets = 4)
      val c = cat.getOrCreateCollection("h", metadata = Map("ivf:nlist" -> "2"))
      c.add((0 until 24).map(i => (s"id$i", s"doc $i", Seq(i.toFloat, 1f)))
        .toDF("id", "document", "embedding"))
      // carried merge commit + both index builds + incremental refreshes
      c.buildIndex(nlist = 2)
      c.buildDocIndex()
      c.upsert(Seq(("id3", "patched brown doc", Seq(7f, 7f)))
        .toDF("id", "document", "embedding"))
      assert(c.refreshIndex() >= 1 && c.refreshDocIndex() >= 1)
      assert(c.get(whereDoc = Some(ChromaFilter.Contains("patched")))
        .select("id").as[String].collect().toSet == Set("id3"))
      assert(c.query(Seq(7f, 7f), k = 1, nprobe = 2)
        .select("id").as[String].head() == "id3")
      // index + data compaction, vacuum, time travel, rollback
      assert(c.compactIndexes() == 2)
      val v = c.meta.version
      c.delete(ids = Seq("id4"))
      c.rollbackTo(v)
      assert(c.count() == 24)
      c.compact()
      c.vacuum()
      assert(c.count() == 24)
      assert(c.get(ids = Seq("id3")).select("document").as[String].head()
        == "patched brown doc")
      // fork takes the carryFile COPY path (no hard links in Hadoop FS)
      val f = cat.forkCollection("h", "h2")
      assert(f.count() == 24)
      f.delete(ids = Seq("id0"))
      assert(f.count() == 23 && c.count() == 24, "fork must be isolated")
      // catalog rename through moveDir
      assert(cat.renameCollection("h2", "h3"))
      assert(cat.getCollection("h3").get.count() == 23)
    } finally conf.unset(StoreIO.ForceKey)
  }
}
