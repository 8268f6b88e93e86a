package graft.catalog

import java.nio.file.FileAlreadyExistsException

import org.apache.hadoop.fs.Path

/** The copy-on-write commit protocol's serialization point: the
  * version-claim file move. A pure read-check-write CAS lets two racing
  * writers both pass the version check and both "commit" — the loser's
  * rows silently vanish. The claim move is first-writer-wins at the
  * filesystem level. */
class CatalogCasSpec extends graft.SparkTestBase {

  private val io: StoreIO = new StoreIO.Local
  private def tmpHPath(prefix: String): Path =
    new Path(java.nio.file.Files.createTempDirectory(prefix).toString)

  test("version claim is first-writer-wins (second claim fails loudly)") {
    val dir = tmpHPath("graft-cas")
    val m = CollectionMeta("c", "l2", 1, Map.empty)
    CollectionMeta.claimVersion(io, dir, m)
    intercept[FileAlreadyExistsException] {
      CollectionMeta.claimVersion(io, dir, m)
    }
    // a different version still claims fine
    CollectionMeta.claimVersion(io, dir, m.copy(version = 2))
  }

  test("read() recovers a COMMITTED claim when the pointer refresh was lost") {
    val dir = tmpHPath("graft-cas2")
    CollectionMeta.atomicWrite(io, dir, CollectionMeta("c", "l2", 1, Map.empty))
    // writer claimed v2, finished its data (marker), crashed before pointer
    CollectionMeta.claimVersion(io, dir, CollectionMeta("c", "l2", 2, Map.empty))
    io.mkdirs(CollectionMeta.commitMarker(dir, 2).getParent)
    io.writeBytes(CollectionMeta.commitMarker(dir, 2), Array.emptyByteArray)
    assert(CollectionMeta.read(io, dir).version == 2)
  }

  test("read() ignores a claim whose data write never finished (no marker)") {
    val dir = tmpHPath("graft-cas2b")
    CollectionMeta.atomicWrite(io, dir, CollectionMeta("c", "l2", 1, Map.empty))
    // writer claimed v2 then died mid-write: half-written data must not serve
    CollectionMeta.claimVersion(io, dir, CollectionMeta("c", "l2", 2, Map.empty))
    assert(CollectionMeta.read(io, dir).version == 1)
  }

  test("failed data write abandons its claim so the version can be retried") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-cas5").toString
    val c = new CollectionCatalog(spark, root).getOrCreateCollection("t")
    val good = Seq(("a", "doc")).toDF("id", "document")
      .withColumn("embedding", typedLit(Seq(1.0f)))
    // a batch whose WRITE fails mid-flight (runtime error inside the scan)
    val bad = Seq(("b", "doc")).toDF("id", "document")
      .withColumn("embedding", typedLit(Seq(1.0f)))
      .withColumn("boom", expr("assert_true(id != 'b')"))
    intercept[Throwable] { c.add(bad) }
    c.add(good) // claim v1 must have been abandoned, not left blocking
    assert(c.count() == 1L)
  }

  test("read() prefers the pointer on version ties (rename refreshes only it)") {
    val dir = tmpHPath("graft-cas3")
    CollectionMeta.claimVersion(io, dir, CollectionMeta("old", "l2", 3, Map.empty))
    CollectionMeta.atomicWrite(io, dir, CollectionMeta("renamed", "l2", 3, Map.empty))
    assert(CollectionMeta.read(io, dir).name == "renamed")
  }

  test("sequential mutations through separate handles advance versions") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-cas4").toString
    val c1 = new CollectionCatalog(spark, root).getOrCreateCollection("t")
    val c2 = new CollectionCatalog(spark, root).getOrCreateCollection("t")
    c1.add(Seq(("a", "doc a")).toDF("id", "document")
      .withColumn("embedding", typedLit(Seq(1.0f, 0.0f))))
    c2.add(Seq(("b", "doc b")).toDF("id", "document")
      .withColumn("embedding", typedLit(Seq(0.0f, 1.0f))))
    assert(c1.count() == 2L)
    assert(c1.meta.version == 2)
  }

  test("compact() repacks small files without changing contents") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val c = new CollectionCatalog(spark, root, numBuckets = 4).getOrCreateCollection("t")
    // many point upserts -> many tiny files in the touched buckets
    (0 until 12).foreach { i =>
      c.upsert(Seq((s"id$i", s"doc $i")).toDF("id", "document")
        .withColumn("embedding", typedLit(Seq(i.toFloat))))
    }
    val before = c.get().orderBy("id").collect().toSeq
    // RESOLVED file count (carry-manifest aware): the files the current
    // version actually reads, wherever they physically live
    def nFiles = c.get().inputFiles.count(_.endsWith(".parquet"))
    val filesBefore = nFiles
    c.compact()
    c.vacuum()
    assert(c.get().orderBy("id").collect().toSeq == before)
    assert(nFiles < filesBefore, s"expected fewer files after compact ($nFiles vs $filesBefore)")
  }
}
