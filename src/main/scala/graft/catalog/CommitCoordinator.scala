package graft.catalog

/** Pluggable serialization point for the commit protocol's two CAS
  * primitives (version claims, build-dir claims).
  *
  * On POSIX and HDFS the filesystem itself is the coordinator —
  * `O_CREAT|O_EXCL` / `create(overwrite=false)` are atomic, and the
  * default store uses them directly. S3-class stores offer no
  * conditional create through the Hadoop API, so two racing writers can
  * both believe they claimed a version; the standard remedy (the one
  * Delta documents and implements for S3 multi-cluster) is an external
  * lock/claim service. This trait is that seam: register an
  * implementation backed by whatever your deployment has (DynamoDB,
  * ZooKeeper, a database row lock), point the Hadoop conf key
  * [[CommitCoordinator.ConfKey]] at its name, and every exclusive
  * create in the store's protocol layer runs inside the coordinator's
  * mutual exclusion — the exists-check-then-create becomes a true CAS
  * for all writers sharing the coordinator.
  *
  * Scope of the guarantee: claims of the same path through the SAME
  * coordinator never interleave. Writers bypassing the coordinator
  * (different conf) fall back to the raw filesystem semantics — the
  * caveat is per-deployment discipline, exactly as with Delta's
  * LogStore configuration. Spark's own data-file writes are not (and
  * need not be) coordinated: data dirs are claimed before writing and
  * never shared, so only the protocol layer's tiny claim files need the
  * CAS.
  */
trait CommitCoordinator {
  /** Run `body` while holding an exclusive lock on `key` — two calls
    * with the same key through this coordinator never overlap. `key` is
    * the full path string of the file/dir being claimed. */
  def withLock[T](key: String)(body: => T): T
}

object CommitCoordinator {

  /** Hadoop conf key selecting the coordinator for a store root.
    * Unset/empty/"fs" = the filesystem's own atomic create (default);
    * any other value must name a [[register]]ed implementation — an
    * unknown name fails LOUDLY at catalog construction (a typo that
    * silently fell back to raw S3 semantics would be a data-loss
    * footgun). */
  val ConfKey = "graft.store.commit.coordinator"

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, CommitCoordinator]()

  def register(name: String, c: CommitCoordinator): Unit = registry.put(name, c)
  def resolve(name: String): Option[CommitCoordinator] = Option(registry.get(name))

  /** In-JVM lock server: correct for all writers sharing one JVM
    * (multi-threaded pipelines, tests — the lifecycle spec runs the
    * whole store through it). A multi-process S3 deployment needs a
    * shared external service registered the same way; this is the
    * reference implementation of the contract, not that service. Lock
    * objects are retained per claimed key (claim keys are version/build
    * numbers — growth is the collection's own commit history, not
    * unbounded). */
  final class InMemory extends CommitCoordinator {
    private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
    def withLock[T](key: String)(body: => T): T =
      locks.computeIfAbsent(key, _ => new Object).synchronized(body)
  }

  register("memory", new InMemory)

  /** MULTI-PROCESS coordinator over lease files in a shared lock
    * directory — the contract's cross-JVM implementation, needing only
    * three primitives from the lease MEDIUM: exclusive create, read,
    * delete. Acquire = exclusive-create `<sha1(key)>.lease` carrying an
    * owner token (uuid@pid); contenders poll, and a lease whose mtime is
    * older than `ttlMs` is presumed orphaned by a crashed writer and
    * deleted for re-grab. Release deletes ONLY a lease that still
    * carries this holder's token — a holder that paused past its TTL
    * and was stolen from must not free the thief's lock.
    *
    * Guarantees and their honest edges:
    *  - Two LIVE holders of the same key never overlap, across any
    *    number of processes, PROVIDED the lock dir's filesystem gives a
    *    true exclusive create (POSIX O_EXCL, HDFS createFile) — point
    *    `lease:` at local disk or HDFS, NOT at the S3 bucket being
    *    protected (that would rebuild the lock on the hole it exists to
    *    cover, unless the connector exposes conditional PUT).
    *  - Every DELETE of a lease (TTL steal, release) runs under a
    *    short-lived exclusive `.steal` side-lock with revalidation
    *    inside it. A lease transitions absent→present only through the
    *    atomic exclusive create and present→absent only under the
    *    side-lock, so two contenders that both observed the same
    *    expired lease can never interleave as steal/create/steal —
    *    the second stealer revalidates under the lock, sees the fresh
    *    mtime, and aborts (the r12 ADVICE dual-hold scenario).
    *  - Residual window, documented not hidden: recovery of an
    *    ORPHANED `.steal` file (a stealer that crashed inside its
    *    milliseconds-long critical section) is itself a plain
    *    delete-if-expired. Dual hold now needs a process crash inside
    *    that tiny section PLUS two recoverers interleaving within it —
    *    versus the old protocol where two contenders merely had to stat
    *    the same expired lease. Filesystems expose no conditional
    *    delete; grounding the recursion needs a fencing CAS service
    *    (register one via the registry when that window matters).
    *  - The TTL steal assumes the expired holder is DEAD. A holder
    *    paused longer than ttlMs (GC, VM freeze) can overlap its thief
    *    for up to one body's duration — the classic lease caveat; set
    *    ttlMs far above worst-case pauses, or back the trait with a
    *    fencing CAS service via the registry when that window matters.
    *  - NOT reentrant (unlike [[InMemory]]'s monitors): a nested
    *    same-key withLock self-deadlocks until the acquire deadline
    *    (3 × ttlMs) throws LOUDLY. The store protocol takes one claim
    *    at a time, so this does not arise there.
    *
    * Selected without registry ceremony via the conf value
    * `lease:<lockDir>` — every JVM that resolves the same value
    * coordinates through the same directory, which is what makes the
    * multi-process story deployable (registries are per-JVM). */
  final class LeaseFile private[catalog] (lockDir: org.apache.hadoop.fs.Path,
      io: StoreIO, ttlMs: Long = 60000L, pollMs: Long = 20L)
      extends CommitCoordinator {
    private val owner = java.util.UUID.randomUUID().toString +
      "@" + ProcessHandle.current().pid()
    io.mkdirs(lockDir)

    private def leasePath(key: String): org.apache.hadoop.fs.Path = {
      val h = java.security.MessageDigest.getInstance("SHA-1")
        .digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
      new org.apache.hadoop.fs.Path(lockDir, s"$h.lease")
    }

    def withLock[T](key: String)(body: => T): T = {
      val lease = leasePath(key)
      acquire(lease, key)
      try body finally release(lease)
    }

    /** Run `body` while holding the exclusive `.steal` side-lock for
      * `lease` — the serialization point for every DELETE of that lease
      * (TTL steals and token-checked releases). Present lease content
      * cannot change while it is held: deletes need this lock, creates
      * only flip absent→present. Returns None when the side-lock is
      * contended (caller re-polls) — a live stealer finishes in
      * milliseconds. An orphaned side-lock (stealer crashed mid-section)
      * is recovered by delete-if-expired: the one residual
      * delete-vs-create window left in the protocol (class doc).
      *
      * The final delete is TOKEN-CHECKED, like release(): a stealer
      * paused past ttlMs inside its section gets its side-lock recovered
      * by a contender — when it resumes, an UNCONDITIONAL delete would
      * remove the contender's LIVE side-lock and re-open the dual-delete
      * race this lock exists to close. With the token check the resumed
      * stealer frees nothing that isn't its own (its lease delete is
      * equally guarded: revalidation reads fresh mtimes, and a stale
      * section's work is bounded by the same paused-holder caveat the
      * class doc states for leases). */
    private def withStealLock[T](lease: org.apache.hadoop.fs.Path)
        (body: => T): Option[T] = {
      val s = new org.apache.hadoop.fs.Path(lease.toString + ".steal")
      val got =
        try {
          io.createExclusive(s,
            owner.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            val orphaned =
              try System.currentTimeMillis() - io.modTime(s) > ttlMs
              catch { case _: Exception => false }
            if (orphaned) {
              try io.deleteIfExists(s) catch { case _: Exception => () }
            }
            false
        }
      if (!got) None
      else
        try Some(body)
        finally {
          try {
            val held = new String(io.readBytes(s),
              java.nio.charset.StandardCharsets.UTF_8)
            if (held == owner) io.deleteIfExists(s)
          } catch { case _: Exception => () } // recovered from us: not ours to free
        }
    }

    private def acquire(lease: org.apache.hadoop.fs.Path, key: String): Unit = {
      val deadline = System.nanoTime() + ttlMs * 3L * 1000000L
      while (true) {
        try {
          io.createExclusive(lease,
            owner.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          return
        } catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            val expired =
              try System.currentTimeMillis() - io.modTime(lease) > ttlMs
              catch { case _: Exception => false } // vanished between create and stat
            if (expired) {
              // single-winner orphan steal: the delete happens only under
              // the .steal side-lock, and only after REVALIDATING expiry
              // under it — a lease some other winner already stole and
              // re-created shows a fresh mtime here and the steal aborts,
              // so a racing pair can never delete each other's fresh
              // leases (r12 ADVICE: W1-del/W1-create/W2-del interleave).
              // The exclusive create back in the loop stays the sole
              // arbiter of who acquires after the delete.
              val stole = withStealLock(lease) {
                val stillExpired =
                  try System.currentTimeMillis() - io.modTime(lease) > ttlMs
                  catch { case _: Exception => false }
                if (stillExpired) {
                  try io.deleteIfExists(lease) catch { case _: Exception => () }
                }
              }
              if (System.nanoTime() > deadline) {
                throw new IllegalStateException(
                  s"could not acquire commit lease for '$key' at $lease within " +
                    s"${3 * ttlMs} ms — holder alive and stuck, or ttl misconfigured")
              } else if (stole.isEmpty) Thread.sleep(pollMs)
              // stole.isDefined: retry the exclusive create immediately
            } else if (System.nanoTime() > deadline) {
              throw new IllegalStateException(
                s"could not acquire commit lease for '$key' at $lease within " +
                  s"${3 * ttlMs} ms — holder alive and stuck, or ttl misconfigured")
            } else Thread.sleep(pollMs)
        }
      }
    }

    /** Deletes ONLY a lease that still carries this holder's token, and
      * preferentially under the `.steal` side-lock — so the
      * read-compare-delete cannot interleave with a TTL steal (the
      * thief's fresh lease is safe: deletes are serialized, and the token
      * no longer matches). After a short retry window (contention here
      * means either a thief mid-steal — nothing of ours remains to free —
      * or young side-lock DEBRIS from a crash), it falls back to the
      * UNGUARDED token-checked delete rather than give up: leaving our
      * own fresh lease behind would block every writer for up to a full
      * TTL (a liveness regression the pre-side-lock release never had).
      * The fallback re-opens only the original narrow read-vs-steal
      * window, only in the debris case, and only for a delete of a lease
      * carrying OUR token. */
    private def release(lease: org.apache.hadoop.fs.Path): Unit = {
      def tokenDelete(): Unit =
        try {
          val held = new String(io.readBytes(lease),
            java.nio.charset.StandardCharsets.UTF_8)
          if (held == owner) io.deleteIfExists(lease)
        } catch { case _: Exception => () } // stolen or vanished: not ours
      // NO early unguarded delete on a contended side-lock: token
      // inspection alone cannot distinguish young crash DEBRIS from a
      // LIVE thief mid-steal (the thief creates .steal, then deletes the
      // expired lease, then re-creates it via the exclusive create — a
      // release that saw "foreign .steal + our token" and deleted
      // unguarded could race past the thief's re-create and remove the
      // thief's LIVE lease, breaking mutual exclusion at the exact
      // moment a steal is in flight). The two cases resolve themselves
      // within the short retry window instead: a live thief's critical
      // section is a few IO ops (its .steal is gone by the next try),
      // and debris older than ttlMs is reclaimed by withStealLock's own
      // orphan recovery on the next attempt. Only YOUNG debris reaches
      // the terminal fallback — the documented narrow exposure, after
      // tries×pollMs (40 ms at defaults), never during a live steal.
      var tries = 2
      while (tries > 0) {
        val done = withStealLock(lease)(tokenDelete())
        if (done.isDefined) return
        tries -= 1
        if (tries > 0) Thread.sleep(pollMs)
      }
      tokenDelete() // fallback: never leave our own live lease behind
    }
  }

  private val leaseCache =
    new java.util.concurrent.ConcurrentHashMap[String, LeaseFile]()

  /** The coordinator for conf value `lease:<dir>` — cached per dir so
    * one JVM's writers share an instance (correct either way; the lease
    * protocol itself is cross-process). The lock dir's OWN filesystem
    * backend is chosen by scheme, never by [[StoreIO.ForceKey]]: the
    * lease medium must keep its true exclusive create even when the
    * STORE under test is forced through the non-atomic path. */
  private[catalog] def leaseFile(dir: String,
      conf: org.apache.hadoop.conf.Configuration): LeaseFile =
    leaseCache.computeIfAbsent(dir, d => {
      val p = new org.apache.hadoop.fs.Path(d)
      new LeaseFile(p, StoreIO.baseOf(p, conf, honorForce = false))
    })
}
