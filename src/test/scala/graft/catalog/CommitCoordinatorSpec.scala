package graft.catalog

import java.util.concurrent.{CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.fs.Path
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

  test("the coordinator turns an S3-shaped non-atomic create into a real CAS") {
    // An S3-shaped backend: createExclusive is check-THEN-act with a
    // window a racer can enter (exactly RawLocalFileSystem's hole, and
    // the semantics the Hadoop API exposes on S3). The barrier parks
    // BOTH racers between their exists checks and their writes, so
    // without coordination the race is not flaky — it is certain.
    final class NonAtomicIO(inner: StoreIO) extends StoreIO {
      val inWindow = new java.util.concurrent.CyclicBarrier(2)
      def createExclusive(p: Path, b: Array[Byte]): Unit = {
        val exists = inner.exists(p)
        // both racers reach here before either writes
        try inWindow.await(5, TimeUnit.SECONDS)
        catch { case _: java.util.concurrent.TimeoutException => ()
          case _: java.util.concurrent.BrokenBarrierException => () }
        if (exists) throw new java.nio.file.FileAlreadyExistsException(p.toString)
        inner.writeBytes(p, b)
      }
      def createDirExclusive(p: Path): Unit = createExclusive(new Path(p, ".claim"), Array.emptyByteArray)
      def exists(p: Path) = inner.exists(p)
      def isDir(p: Path) = inner.isDir(p)
      def mkdirs(p: Path) = inner.mkdirs(p)
      def list(p: Path) = inner.list(p)
      def deleteRecursively(p: Path) = inner.deleteRecursively(p)
      def deleteIfExists(p: Path) = inner.deleteIfExists(p)
      def readBytes(p: Path) = inner.readBytes(p)
      def writeBytes(p: Path, b: Array[Byte]) = inner.writeBytes(p, b)
      def replace(src: Path, dst: Path) = inner.replace(src, dst)
      def moveDir(src: Path, dst: Path) = inner.moveDir(src, dst)
      def modTime(p: Path) = inner.modTime(p)
      def carryFile(src: Path, dst: Path) = inner.carryFile(src, dst)
    }
    def race(io: StoreIO, p: Path): Seq[Boolean] = {
      val wins = new java.util.concurrent.ConcurrentLinkedQueue[Boolean]()
      val ts = (0 until 2).map(i => new Thread(() => {
        try { io.createExclusive(p, s"writer$i".getBytes); wins.add(true) }
        catch { case _: java.nio.file.FileAlreadyExistsException => wins.add(false) }
      }))
      ts.foreach(_.start()); ts.foreach(_.join(10000))
      import scala.jdk.CollectionConverters._
      wins.iterator.asScala.toSeq
    }
    val root = new Path(tmpDir("coord-s3sim"))
    // WITHOUT coordination: both racers win — the silent double-claim S3
    // would permit (this is the certainty the caveat describes)
    val bare = new NonAtomicIO(new StoreIO.Local)
    assert(race(bare, new Path(root, "claim-bare")).count(w => w) == 2,
      "the S3-shaped backend must exhibit the double-win without coordination")
    // WITH the coordinator wrapped around the same store: exactly one
    // wins. Note what this proves: Coordinated never touches the store's
    // (broken) exclusive create at all — it composes the lock with plain
    // exists+write, the two primitives EVERY store has, which is exactly
    // how an external coordinator makes S3 safe without asking the store
    // for atomicity it cannot give.
    val fixed = new StoreIO.Coordinated(
      new NonAtomicIO(new StoreIO.Local), new CommitCoordinator.InMemory)
    assert(race(fixed, new Path(root, "claim-coord")).count(w => w) == 1,
      "the coordinator must turn check-then-act into winner-take-one")
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
