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
}
