package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.ChromaFilter

/** Id-bucket partition pruning on the collection's point-read paths:
  * `get(ids=…)` and `delete(ids=…)` must list/scan only the `pt=` dirs
  * the ids hash into — the driver-side replay of `bucketed()`'s
  * xxhash64 — while never changing results (the verbatim id filter
  * stays on top). */
class PtPruneSpec extends SparkTestBase {
  import spark.implicits._

  private def freshCatalog(buckets: Int = 8): CollectionCatalog = {
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "ptprune").toString
    new CollectionCatalog(spark, root, numBuckets = buckets)
  }

  private def seeded(buckets: Int = 8): Collection = {
    val c = freshCatalog(buckets).getOrCreateCollection("c")
    c.add((0 until 64).map(i => (s"id$i", s"doc $i", Seq(i.toFloat, 1f)))
      .toDF("id", "document", "embedding"))
    c
  }

  test("driver-side bucket eval matches the distributed write hash for every id") {
    val c = seeded()
    // the physical layout groups ids by bucketed()'s xxhash64; a get on
    // EACH id must find its row — if the driver-side eval ever diverged
    // from the write hash, the pruned scan would silently return empty
    (0 until 64).foreach { i =>
      val got = c.get(ids = Seq(s"id$i")).select("document").as[String].collect().toSeq
      assert(got == Seq(s"doc $i"), s"id$i lost under pruning")
    }
  }

  test("get by id prunes the file listing to the ids' own pt dirs") {
    val c = seeded()
    val df = c.get(ids = Seq("id0", "id1"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val scanLine = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("pt") && scanLine.contains(" IN "),
      s"expected a pt IN partition filter at the listing level, got: $scanLine\n$p")
    // the orderBy puts an exchange in the plan, so AQE wraps it — unwrap
    // to reach the file scan the adaptive plan actually executed
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scans(q.plan)
      case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(scans)
    }
    val pts = scans(df.queryExecution.executedPlan).headOption.map {
      s => s.selectedPartitions.toPartitionArray.map(_.filePath.toString)
        .flatMap(_.split("/").find(_.startsWith("pt="))).toSet
    }
    assert(pts.exists(_.size <= 2),
      s"two ids must select at most two pt dirs, got $pts")
  }

  test("get with ids AND where/whereDoc still prunes and still filters") {
    val c = seeded()
    val got = c.get(ids = Seq("id3", "id4"),
        whereDoc = Some(ChromaFilter.Contains("doc 3")))
      .select("id").as[String].collect().toSeq
    assert(got == Seq("id3"))
  }

  test("point delete discovers affected buckets from a pruned scan and deletes exactly the ids") {
    val c = seeded()
    c.delete(ids = Seq("id5", "id6"))
    assert(c.count() == 62)
    assert(c.get(ids = Seq("id5", "id6")).count() == 0)
    assert(c.get(ids = Seq("id7")).count() == 1)
  }

  test("non-string id layout conservatively skips pruning but stays correct") {
    val c = freshCatalog().getOrCreateCollection("legacy")
    // direct add() callers may write native-typed ids; the type-sensitive
    // hash means the string-literal prune must NOT engage for them
    c.add((0 until 16).map(i => (i.toLong, s"doc $i", Seq(i.toFloat)))
      .toDF("id", "document", "embedding"))
    val df = c.get(ids = Seq("3"))
    assert(df.select("document").as[String].collect().toSeq == Seq("doc 3"))
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val scanLine = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(!scanLine.contains(" IN "),
      s"non-string ids must not partition-prune (type-sensitive hash): $scanLine")
  }

  test("pruned get sees carried buckets across point upserts (manifest layout)") {
    val c = seeded()
    // a point upsert rewrites one bucket; every other bucket is a carry
    // manifest entry — the pruned read must resolve THROUGH the manifest
    c.upsert(Seq(("id9", "doc 9 v2", Seq(9f, 2f))).toDF("id", "document", "embedding"))
    assert(c.get(ids = Seq("id9")).select("document").as[String].head() == "doc 9 v2")
    // an id in an untouched (carried) bucket still reads correctly pruned
    (0 until 64).filter(_ != 9).take(8).foreach { i =>
      assert(c.get(ids = Seq(s"id$i")).count() == 1, s"carried id$i lost")
    }
  }
}
