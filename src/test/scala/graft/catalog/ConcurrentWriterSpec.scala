package graft.catalog

import java.util.concurrent.{CountDownLatch, CyclicBarrier, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** LIVE two-writer races through the commit protocol — the runtime form
  * of [[CatalogCasSpec]]'s single-threaded pins. Two real writers on two
  * real threads drive the one branch no unit test can: a mutation whose
  * version claim fails because a CONCURRENT writer holds it
  * (`Collection.claimNext`'s "claimed by a concurrent writer; retry"),
  * and the retry that follows. Both StoreIO backends run the same
  * scenarios (the Hadoop path via the forced-backend seam, like
  * [[StoreIOSpec]]).
  *
  * Guarantee being measured: per version number exactly one claim wins;
  * a loser fails with `ConcurrentModificationException` BEFORE writing
  * any data (the claim precedes the write, so a retry is clean); retried
  * to completion, the final contents equal a serial execution of the
  * same mutations. */
class ConcurrentWriterSpec extends SparkTestBase {
  import spark.implicits._

  private def conf = spark.sparkContext.hadoopConfiguration

  private def row(id: String, doc: String, v: Float) =
    Seq((id, doc)).toDF("id", "document")
      .withColumn("embedding", typedLit(Seq(v, 1.0f)))

  /** Run `body` in a thread, re-throwing its failure on join. */
  private def thread(name: String)(body: => Unit): Thread = {
    val t = new Thread(() => body, name)
    t.setDaemon(true)
    t
  }

  private def withBackend(backend: String)(body: String => Unit): Unit = {
    if (backend == "hadoop") conf.set(StoreIO.ForceKey, "hadoop")
    try body(backend) finally if (backend == "hadoop") conf.unset(StoreIO.ForceKey)
  }

  for (backend <- Seq("local", "hadoop")) {

    test(s"[$backend] loser of a live claim race hits the retry branch, retries clean") {
      withBackend(backend) { _ =>
        val root = tmpDir(s"race-det-$backend")
        val catA = new CollectionCatalog(spark, root, numBuckets = 4)
        val catB = new CollectionCatalog(spark, root, numBuckets = 4)
        val a = catA.getOrCreateCollection("c")
        val b = catB.getOrCreateCollection("c")
        a.add(row("seed", "seed doc", 0f)) // v1: both writers start from real data

        // writer A adds on its own thread and PARKS mid-commit (data
        // written, claim held, marker not yet written) via beforeCommit
        val aHoldsClaim = new CountDownLatch(1)
        val aMayCommit = new CountDownLatch(1)
        var aFailure: Throwable = null
        val writerA = thread("writer-a") {
          try a.add(row("a1", "doc from A", 1f), beforeCommit = () => {
            aHoldsClaim.countDown()
            assert(aMayCommit.await(60, TimeUnit.SECONDS), "test deadlock")
          })
          catch { case t: Throwable => aFailure = t }
        }
        writerA.start()
        assert(aHoldsClaim.await(60, TimeUnit.SECONDS), "writer A never reached its claim")

        // writer B, a LIVE concurrent writer: its claim of v2 must lose
        // to A's held claim — loudly, before writing any data
        val e = intercept[java.util.ConcurrentModificationException] {
          b.upsert(row("b1", "doc from B", 2f))
        }
        assert(e.getMessage.contains("claimed by a concurrent writer"))

        aMayCommit.countDown()
        writerA.join(60000)
        assert(aFailure == null, s"writer A failed: $aFailure")

        // the loser's RETRY lands on the next version, nothing lost
        b.upsert(row("b1", "doc from B", 2f))
        assert(a.meta.version == 3)
        assert(a.history() == Seq(1, 2, 3))
        assert(a.get().orderBy("id").select("id", "document").as[(String, String)]
          .collect().toSeq == Seq("a1" -> "doc from A", "b1" -> "doc from B",
            "seed" -> "seed doc"),
          "final contents must equal the serial execution A-then-B")
      }
    }

    test(s"[$backend] free-running race: N writers x K upserts serialize losslessly") {
      withBackend(backend) { _ =>
        val root = tmpDir(s"race-free-$backend")
        val retries = new AtomicInteger(0)
        val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
        val barrier = new CyclicBarrier(2)
        val perWriter = 3

        def writer(tag: String): Thread = thread(s"writer-$tag") {
          val cat = new CollectionCatalog(spark, root, numBuckets = 4)
          val c = cat.getOrCreateCollection("c")
          try (0 until perWriter).foreach { i =>
            barrier.await(60, TimeUnit.SECONDS) // line both writers up per round
            var done = false
            var attempts = 0
            while (!done) {
              try { c.upsert(row(s"$tag$i", s"doc $tag$i", i.toFloat)); done = true }
              catch { case _: java.util.ConcurrentModificationException =>
                retries.incrementAndGet()
                attempts += 1
                assert(attempts < 50, "retry storm — protocol is not making progress")
              }
            }
          } catch { case t: Throwable => failures.add(t) }
        }

        val (wa, wb) = (writer("a"), writer("b"))
        wa.start(); wb.start()
        wa.join(300000); wb.join(300000)
        assert(failures.isEmpty, s"writer died: ${failures.peek()}")

        val c = new CollectionCatalog(spark, root, numBuckets = 4)
          .getOrCreateCollection("c")
        // every upsert committed exactly once: 6 commits, 6 versions,
        // one claim file + one commit marker per version, full contents
        assert(c.meta.version == 2 * perWriter)
        assert(c.history() == (1 to 2 * perWriter))
        assert(c.get().select("id").as[String].collect().toSet ==
          (0 until perWriter).flatMap(i => Seq(s"a$i", s"b$i")).toSet)
        info(s"[$backend] live claim-race retries observed: ${retries.get()}")
      }
    }
  }
}
