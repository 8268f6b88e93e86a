package graft.catalog

import java.util.concurrent.{CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.ChromaFilter

/** The pluggable commit-coordination seam for S3-class stores: with
  * [[CommitCoordinator.ConfKey]] set, every exclusive create in the
  * store protocol runs inside the named coordinator's mutual exclusion
  * — proven here by running the whole collection lifecycle AND a live
  * two-writer race through a COUNTING coordinator (so the test fails if
  * the protocol ever bypasses the seam), over the forced Hadoop backend
  * (the backend an S3 deployment would actually use). */
class CommitCoordinatorSpec extends SparkTestBase {
  import spark.implicits._

  private def conf = spark.sparkContext.hadoopConfiguration

  /** InMemory semantics + a visible acquisition count. */
  private final class Counting extends CommitCoordinator {
    private val inner = new CommitCoordinator.InMemory
    val acquisitions = new AtomicInteger(0)
    def withLock[T](key: String)(body: => T): T = {
      acquisitions.incrementAndGet()
      inner.withLock(key)(body)
    }
  }

  test("unknown coordinator name fails LOUDLY at catalog construction") {
    conf.set(CommitCoordinator.ConfKey, "no-such-service")
    try {
      val e = intercept[IllegalArgumentException] {
        new CollectionCatalog(spark, tmpDir("coord-unknown"))
      }
      assert(e.getMessage.contains("no-such-service"))
    } finally conf.unset(CommitCoordinator.ConfKey)
  }

  test("whole collection lifecycle through the coordinator + forced Hadoop backend") {
    val counting = new Counting
    CommitCoordinator.register("test-counting", counting)
    conf.set(StoreIO.ForceKey, "hadoop")
    conf.set(CommitCoordinator.ConfKey, "test-counting")
    try {
      val cat = new CollectionCatalog(spark, tmpDir("coord-life"), numBuckets = 4)
      val c = cat.getOrCreateCollection("h", metadata = Map("ivf:nlist" -> "2"))
      c.add((0 until 24).map(i => (s"id$i", s"doc $i", Seq(i.toFloat, 1f)))
        .toDF("id", "document", "embedding"))
      c.buildIndex(nlist = 2)
      c.buildDocIndex()
      c.upsert(Seq(("id3", "patched brown doc", Seq(7f, 7f)))
        .toDF("id", "document", "embedding"))
      assert(c.refreshIndex() >= 1 && c.refreshDocIndex() >= 1)
      assert(c.get(whereDoc = Some(ChromaFilter.Contains("patched")))
        .select("id").as[String].collect().toSet == Set("id3"))
      assert(c.query(Seq(7f, 7f), k = 1, nprobe = 2)
        .select("id").as[String].head() == "id3")
      c.compact()
      c.vacuum()
      assert(c.count() == 24)
      // every claim — initial meta, 3 data versions (add/upsert/compact),
      // 4 build dirs (2 builds + 2 refreshes) — went through the
      // coordinator: the seam is in the path, not beside it
      assert(counting.acquisitions.get() >= 8,
        s"expected all protocol claims coordinated, saw ${counting.acquisitions.get()}")
    } finally {
      conf.unset(StoreIO.ForceKey)
      conf.unset(CommitCoordinator.ConfKey)
    }
  }

  test("live two-writer race arbitrated by the coordinator (forced Hadoop backend)") {
    val counting = new Counting
    CommitCoordinator.register("test-counting-race", counting)
    conf.set(StoreIO.ForceKey, "hadoop")
    conf.set(CommitCoordinator.ConfKey, "test-counting-race")
    try {
      val root = tmpDir("coord-race")
      val a = new CollectionCatalog(spark, root, numBuckets = 4)
        .getOrCreateCollection("c")
      val b = new CollectionCatalog(spark, root, numBuckets = 4)
        .getOrCreateCollection("c")
      a.add(Seq(("seed", "seed doc")).toDF("id", "document")
        .withColumn("embedding", typedLit(Seq(0f, 1f))))

      val aHoldsClaim = new CountDownLatch(1)
      val aMayCommit = new CountDownLatch(1)
      var aFailure: Throwable = null
      val writerA = new Thread(() => {
        try a.add(Seq(("a1", "doc from A")).toDF("id", "document")
          .withColumn("embedding", typedLit(Seq(1f, 1f))),
          beforeCommit = () => {
            aHoldsClaim.countDown()
            assert(aMayCommit.await(60, TimeUnit.SECONDS), "test deadlock")
          })
        catch { case t: Throwable => aFailure = t }
      }, "coord-writer-a")
      writerA.setDaemon(true)
      writerA.start()
      assert(aHoldsClaim.await(60, TimeUnit.SECONDS))

      // B's claim of the same version number is refused INSIDE the
      // coordinator's lock — the loser path S3 cannot provide natively
      intercept[java.util.ConcurrentModificationException] {
        b.upsert(Seq(("b1", "doc from B")).toDF("id", "document")
          .withColumn("embedding", typedLit(Seq(2f, 1f))))
      }
      aMayCommit.countDown()
      writerA.join(60000)
      assert(aFailure == null, s"writer A failed: $aFailure")
      b.upsert(Seq(("b1", "doc from B")).toDF("id", "document")
        .withColumn("embedding", typedLit(Seq(2f, 1f))))

      assert(a.meta.version == 3)
      assert(a.get().select("id").as[String].collect().toSet ==
        Set("seed", "a1", "b1"))
      assert(counting.acquisitions.get() >= 4,
        "the racing claims must have gone through the coordinator")
    } finally {
      conf.unset(StoreIO.ForceKey)
      conf.unset(CommitCoordinator.ConfKey)
    }
  }
}
