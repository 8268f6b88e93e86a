package graft.catalog

import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.fs.Path

import graft.SparkTestBase

/** The MULTI-PROCESS commit coordinator (CommitCoordinator.LeaseFile):
  * in-JVM mutual-exclusion and orphan-recovery pins first, then the test
  * the seam existed for — TWO REAL JVMs racing upserts into one store
  * through `lease:<dir>`, with the store forced onto the Hadoop backend
  * so exclusion can only come from the leases (the local backend's own
  * O_EXCL would mask a broken coordinator). */
class LeaseCoordinatorSpec extends SparkTestBase {
  import spark.implicits._

  private def leaseOn(dir: String, ttlMs: Long = 60000L) =
    new CommitCoordinator.LeaseFile(new Path(dir), new StoreIO.Local, ttlMs = ttlMs)

  test("two threads, one key: critical sections never overlap") {
    val coord = leaseOn(tmpDir("lease-mx"))
    val inside = new AtomicInteger(0)
    val maxInside = new AtomicInteger(0)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ts = (0 until 4).map { i =>
      new Thread(() => {
        try (0 until 10).foreach { _ =>
          coord.withLock("shared-key") {
            val now = inside.incrementAndGet()
            maxInside.updateAndGet(m => math.max(m, now))
            Thread.sleep(1L)
            inside.decrementAndGet()
          }
        } catch { case t: Throwable => failures.add(t) }
      }, s"lease-racer-$i")
    }
    ts.foreach(_.start()); ts.foreach(_.join(120000))
    assert(failures.isEmpty, s"racer died: ${failures.peek()}")
    assert(maxInside.get() == 1,
      s"critical sections overlapped: max concurrent = ${maxInside.get()}")
  }

  test("distinct keys do not contend (parallel claims proceed)") {
    val coord = leaseOn(tmpDir("lease-para"))
    // holding key A must not block key B: take A, then take B on this
    // same thread — with per-key leases this returns immediately
    coord.withLock("key-a") {
      val v = coord.withLock("key-b")(42)
      assert(v == 42)
    }
  }

  test("an orphaned lease (crashed holder) is stolen after the TTL") {
    val dir = tmpDir("lease-steal")
    val io = new StoreIO.Local
    val coord = leaseOn(dir, ttlMs = 300L)
    // plant a foreign lease for the key, aged past the TTL — exactly
    // what a writer that died mid-commit leaves behind
    val sha = java.security.MessageDigest.getInstance("SHA-1")
      .digest("k".getBytes(UTF_8)).map("%02x".format(_)).mkString
    val lease = new Path(dir, s"$sha.lease")
    io.writeBytes(lease, "dead-writer@0".getBytes(UTF_8))
    java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(dir, s"$sha.lease"),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 10000L))
    val got = coord.withLock("k")("acquired")
    assert(got == "acquired")
  }

  test("release frees only this holder's lease — a thief's fresh lock survives") {
    val dir = tmpDir("lease-own")
    val io = new StoreIO.Local
    val coord = leaseOn(dir)
    val sha = java.security.MessageDigest.getInstance("SHA-1")
      .digest("k2".getBytes(UTF_8)).map("%02x".format(_)).mkString
    val lease = new Path(dir, s"$sha.lease")
    coord.withLock("k2") {
      // simulate a TTL steal while this holder is paused: the thief's
      // lease replaces ours
      io.deleteIfExists(lease)
      io.writeBytes(lease, "thief@99".getBytes(UTF_8))
    }
    // our release must NOT have deleted the thief's lease
    assert(io.exists(lease), "release deleted a lease it no longer owned")
    assert(new String(io.readBytes(lease), UTF_8) == "thief@99")
  }

  test("steals are single-winner: a racing contender can neither delete while " +
      "a stealer is mid-section nor delete the fresh lease it leaves behind") {
    val dir = tmpDir("lease-1winner")
    val io = new StoreIO.Local
    val ttl = 1000L
    val coord = leaseOn(dir, ttlMs = ttl)
    val sha = java.security.MessageDigest.getInstance("SHA-1")
      .digest("k3".getBytes(UTF_8)).map("%02x".format(_)).mkString
    val lease = new Path(dir, s"$sha.lease")
    val steal = new Path(dir, s"$sha.lease.steal")
    // an EXPIRED foreign lease (dead writer) …
    io.writeBytes(lease, "dead-writer@0".getBytes(UTF_8))
    java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(dir, s"$sha.lease"),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 10000L))
    // … and a LIVE .steal side-lock: another process's stealer mid-section
    io.writeBytes(steal, "other-stealer@1".getBytes(UTF_8))
    val acquiredAt = new java.util.concurrent.atomic.AtomicLong(0L)
    val t = new Thread(() => coord.withLock("k3") {
      acquiredAt.set(System.nanoTime())
    })
    val t0 = System.nanoTime()
    t.start()
    Thread.sleep(300L)
    // (a) while the side-lock is held, the contender must NOT have stolen
    assert(acquiredAt.get() == 0L, "contender acquired during a foreign steal section")
    assert(io.exists(lease), "contender deleted the lease while the side-lock was held")
    // the foreign stealer now finishes: deletes the orphan, creates its
    // OWN fresh lease, releases the side-lock — the r12 ADVICE interleave
    io.deleteIfExists(lease)
    io.writeBytes(lease, "thief@99".getBytes(UTF_8))
    io.deleteIfExists(steal)
    Thread.sleep(300L)
    // (b) the contender saw the OLD lease expired, but must revalidate and
    // leave the thief's FRESH lease alone
    assert(acquiredAt.get() == 0L, "contender acquired over the thief's fresh lease")
    assert(io.exists(lease) &&
      new String(io.readBytes(lease), UTF_8) == "thief@99",
      "contender deleted the thief's fresh lease (dual-hold corruption)")
    // thief releases normally; the contender must now win cleanly
    io.deleteIfExists(lease)
    t.join(10000L)
    assert(!t.isAlive && acquiredAt.get() > t0, "contender never acquired after release")
  }

  test("release falls back past YOUNG .steal debris — never leaves its own lease behind") {
    // a crashed process's side-lock younger than the TTL: release cannot
    // take the side-lock, but giving up would strand our own fresh lease
    // and block every writer for a full TTL — the fallback token-delete
    // must still free it (and must NOT touch the foreign debris)
    val dir = tmpDir("lease-fallback")
    val io = new StoreIO.Local
    val coord = leaseOn(dir, ttlMs = 60000L)
    val sha = java.security.MessageDigest.getInstance("SHA-1")
      .digest("k5".getBytes(UTF_8)).map("%02x".format(_)).mkString
    val lease = new Path(dir, s"$sha.lease")
    val steal = new Path(dir, s"$sha.lease.steal")
    coord.withLock("k5") {
      io.writeBytes(steal, "crashed-elsewhere@7".getBytes(UTF_8)) // fresh debris
    }
    assert(!io.exists(lease),
      "release must free its own lease even when the side-lock is debris-blocked")
    assert(io.exists(steal) &&
      new String(io.readBytes(steal), UTF_8) == "crashed-elsewhere@7",
      "the fallback must not delete a side-lock it does not own")
  }

  test("orphaned .steal debris (stealer crashed mid-section) is recovered") {
    val dir = tmpDir("lease-debris")
    val io = new StoreIO.Local
    val coord = leaseOn(dir, ttlMs = 300L)
    val sha = java.security.MessageDigest.getInstance("SHA-1")
      .digest("k4".getBytes(UTF_8)).map("%02x".format(_)).mkString
    // both the lease AND its steal side-lock left behind, both expired
    for (suffix <- Seq(".lease", ".lease.steal")) {
      io.writeBytes(new Path(dir, s"$sha$suffix"), "crashed@0".getBytes(UTF_8))
      java.nio.file.Files.setLastModifiedTime(
        java.nio.file.Paths.get(dir, s"$sha$suffix"),
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 10000L))
    }
    assert(coord.withLock("k4")("recovered") == "recovered")
  }

  test("TWO REAL JVMs race upserts through lease:<dir> on the forced-Hadoop store") {
    val root = tmpDir("lease-xproc")
    val perWriter = 3
    val jflags = Seq(
      "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
      "java.net", "java.nio", "java.util", "java.util.concurrent",
      "java.util.concurrent.atomic").map(p => s"--add-opens=java.base/$p=ALL-UNNAMED") ++
      Seq("sun.nio.ch", "sun.nio.cs", "sun.security.action", "sun.util.calendar")
        .map(p => s"--add-opens=java.base/$p=ALL-UNNAMED")
    // derive the child classpath from THIS JVM's (r12 ADVICE: the
    // hardcoded repo layout broke on any other checkout); the child only
    // needs main classes + Spark, but passing the full test classpath is
    // harmless and layout-proof. Caveat (documented, not defended): a
    // concurrent `sbt compile` rewriting classfiles while the children
    // run can still flake — don't build and test the same checkout at once.
    val cp = sys.props("java.class.path")
    def launch(tag: String): Process = {
      val cmd = (Seq("java", "-Xmx4g") ++ jflags ++
        Seq("-cp", cp, "graft.tools.LeaseRaceWriter", root, tag, perWriter.toString))
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectErrorStream(true)
      pb.redirectOutput(java.io.File.createTempFile(s"lease-writer-$tag", ".log",
        new java.io.File("/root/repo/target")))
      pb.start()
    }
    val (pa, pb) = (launch("a"), launch("b"))
    assert(pa.waitFor(300, java.util.concurrent.TimeUnit.SECONDS), "writer a timed out")
    assert(pb.waitFor(300, java.util.concurrent.TimeUnit.SECONDS), "writer b timed out")
    assert(pa.exitValue() == 0, s"writer a exited ${pa.exitValue()}")
    assert(pb.exitValue() == 0, s"writer b exited ${pb.exitValue()}")
    // every upsert committed exactly once across the two processes:
    // 6 versions, contiguous history, full contents — a serial execution
    val c = new CollectionCatalog(spark, root, numBuckets = 4)
      .getOrCreateCollection("c")
    assert(c.meta.version == 2 * perWriter,
      s"expected ${2 * perWriter} serialized commits, got version ${c.meta.version}")
    assert(c.history() == (1 to 2 * perWriter))
    assert(c.get().select("id").as[String].collect().toSet ==
      (0 until perWriter).flatMap(i => Seq(s"a$i", s"b$i")).toSet)
  }
}
