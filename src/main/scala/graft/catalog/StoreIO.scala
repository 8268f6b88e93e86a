package graft.catalog

import java.nio.file.{Files, StandardCopyOption, StandardOpenOption}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, FileUtil, Options, Path}

/** One directory-listing entry — the two facts every call site needs,
  * fetched in the single listing RPC (no per-child stat). */
private[graft] final case class DirEntry(path: Path, isDir: Boolean) {
  def name: String = path.getName
}

/** Filesystem layer for the collection store's METADATA and commit
  * protocol. The data files themselves are written and read by Spark,
  * which already speaks Hadoop FS — this closes the other half: claims,
  * commit markers, meta pointers, carry manifests, catalog moves.
  *
  * Two implementations, chosen by the root path's filesystem — the same
  * per-scheme split Delta's LogStore uses, because the commit protocol
  * needs two primitives whose guarantees differ by store:
  *
  *  - `createExclusive` (the version-claim CAS): [[StoreIO.Local]] uses
  *    java.nio `CREATE_NEW` (true O_CREAT|O_EXCL). On HDFS,
  *    `FileSystem.create(overwrite = false)` is atomic at the NameNode —
  *    the protocol holds 1:1. On S3-like stores a conditional create is
  *    not offered through the Hadoop API: two racers can both "win", so
  *    multi-writer use there needs an external coordinator (the exact
  *    caveat Delta documents for S3 single-cluster mode). Single-writer
  *    pipelines — the reference's hydration shape — are safe everywhere.
  *  - `replace` (the meta.json pointer swap): atomic rename on POSIX,
  *    `FileContext.rename(OVERWRITE)` (an atomic journal op) on HDFS,
  *    copy-ish on S3A. The protocol tolerates a torn/lost pointer: -
  *    `CollectionMeta.read` recovers the newest COMMITTED claim, so the
  *    pointer is a cache, not the source of truth.
  *
  * Everything else (list/mkdirs/delete/read/write/copy) has identical
  * semantics on both backends.
  */
// not sealed: package-internal already, nothing matches exhaustively on
// it, and the commit-coordinator spec needs a deliberately-broken
// (S3-shaped check-then-act) test double
private[graft] trait StoreIO {
  def exists(p: Path): Boolean
  def isDir(p: Path): Boolean
  def mkdirs(p: Path): Unit
  /** Immediate children with their dir-ness; empty for a missing dir. */
  def list(p: Path): Seq[DirEntry]
  def deleteRecursively(p: Path): Unit
  /** Delete a file if present (never recursive). */
  def deleteIfExists(p: Path): Unit
  def readBytes(p: Path): Array[Byte]
  /** Create or overwrite. */
  def writeBytes(p: Path, b: Array[Byte]): Unit
  /** O_CREAT|O_EXCL create: of two racers exactly one succeeds, the
    * loser gets `FileAlreadyExistsException` (per-backend atomicity
    * caveats in the trait doc). */
  def createExclusive(p: Path, b: Array[Byte]): Unit
  /** Exclusive DIRECTORY claim — same winner-take-one contract. */
  def createDirExclusive(p: Path): Unit
  /** Replace file `dst` with sibling `src` (atomicity per trait doc). */
  def replace(src: Path, dst: Path): Unit
  /** Move a directory to a not-yet-existing destination (adoption /
    * catalog rename; call sites pre-check the destination). */
  def moveDir(src: Path, dst: Path): Unit
  def modTime(p: Path): Long
  /** Physical file carry for [[CollectionCatalog.forkCollection]]: hard
    * link where the FS supports it, copy otherwise. */
  def carryFile(src: Path, dst: Path): Unit
}

private[graft] object StoreIO {

  /** Conf key forcing the Hadoop backend even for local roots — the test
    * seam that lets the whole store lifecycle run through the `hdfs:`
    * code path against local files (no cluster in CI). */
  val ForceKey = "graft.store.io.force"

  /** Raw backend for `p`, no coordination: java.nio when it resolves to
    * the local filesystem, Hadoop FS otherwise. `honorForce = false`
    * ignores [[ForceKey]] — the lease-coordinator's lock dir uses this,
    * because the lease medium must keep its true exclusive create even
    * when the store under test is forced through the Hadoop path. */
  private[catalog] def baseOf(p: Path, conf: Configuration,
      honorForce: Boolean = true): StoreIO = {
    val fs = p.getFileSystem(conf)
    if (fs.getScheme == "file" && !(honorForce && conf.get(ForceKey) == "hadoop"))
      new Local
    else new Hdfs(fs, conf)
  }

  /** Backend for `p`: [[baseOf]], wrapped by a commit coordinator when
    * [[CommitCoordinator.ConfKey]] selects one — `lease:<lockDir>`
    * constructs the multi-process lease-file coordinator on that
    * directory (same conf value in every JVM = same coordinator); any
    * other non-"fs" value must name a REGISTERED implementation (the
    * S3-class external-service seam) — an unknown name fails loudly
    * here, at construction, never silently at commit time. */
  def of(p: Path, conf: Configuration): StoreIO = {
    val base = baseOf(p, conf)
    conf.get(CommitCoordinator.ConfKey) match {
      case null | "" | "fs" => base
      case lease if lease.startsWith("lease:") =>
        new Coordinated(base,
          CommitCoordinator.leaseFile(lease.stripPrefix("lease:"), conf))
      case name => new Coordinated(base, CommitCoordinator.resolve(name).getOrElse(
        throw new IllegalArgumentException(
          s"${CommitCoordinator.ConfKey}='$name' names no registered commit " +
            "coordinator — register it via CommitCoordinator.register(name, impl) " +
            "before constructing the catalog, or use 'lease:<lockDir>' for the " +
            "built-in multi-process lease-file coordinator")))
    }
  }

  /** [[StoreIO]] whose exclusive creates are serialized by an external
    * [[CommitCoordinator]]: under the lock, exists-check-then-create IS
    * a CAS for every writer sharing the coordinator — which is the whole
    * point on stores whose own create is not conditional. Everything
    * non-CAS passes straight through. */
  private[catalog] final class Coordinated(
      inner: StoreIO, coord: CommitCoordinator) extends StoreIO {
    def createExclusive(p: Path, b: Array[Byte]): Unit =
      coord.withLock(p.toString) {
        if (inner.exists(p))
          throw new java.nio.file.FileAlreadyExistsException(p.toString)
        inner.writeBytes(p, b)
      }
    def createDirExclusive(p: Path): Unit =
      coord.withLock(p.toString) {
        // the lock makes check-then-mkdirs atomic, so no sibling marker
        // scheme is needed on this path (see Hdfs.createDirExclusive)
        if (inner.exists(p))
          throw new java.nio.file.FileAlreadyExistsException(p.toString)
        inner.mkdirs(p)
      }
    def exists(p: Path): Boolean = inner.exists(p)
    def isDir(p: Path): Boolean = inner.isDir(p)
    def mkdirs(p: Path): Unit = inner.mkdirs(p)
    def list(p: Path): Seq[DirEntry] = inner.list(p)
    def deleteRecursively(p: Path): Unit = inner.deleteRecursively(p)
    def deleteIfExists(p: Path): Unit = inner.deleteIfExists(p)
    def readBytes(p: Path): Array[Byte] = inner.readBytes(p)
    def writeBytes(p: Path, b: Array[Byte]): Unit = inner.writeBytes(p, b)
    def replace(src: Path, dst: Path): Unit = inner.replace(src, dst)
    def moveDir(src: Path, dst: Path): Unit = inner.moveDir(src, dst)
    def modTime(p: Path): Long = inner.modTime(p)
    def carryFile(src: Path, dst: Path): Unit = inner.carryFile(src, dst)
  }

  /** java.nio backend — byte-for-byte the semantics the store always had
    * on POSIX (true exclusive creates, atomic replacing renames, hard
    * links for fork). */
  private[catalog] final class Local extends StoreIO {
    private def nio(p: Path): java.nio.file.Path =
      java.nio.file.Paths.get(p.toUri.getPath)
    def exists(p: Path): Boolean = Files.exists(nio(p))
    def isDir(p: Path): Boolean = Files.isDirectory(nio(p))
    def mkdirs(p: Path): Unit = Files.createDirectories(nio(p))
    def list(p: Path): Seq[DirEntry] = {
      val d = nio(p)
      if (!Files.isDirectory(d)) Nil
      else {
        // fd-safe: Files.list holds an open directory fd until closed
        val s = Files.list(d)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator.asScala
            .map(c => DirEntry(new Path(p, c.getFileName.toString), Files.isDirectory(c)))
            .toSeq
        } finally s.close()
      }
    }
    def deleteRecursively(p: Path): Unit = {
      val d = nio(p)
      if (Files.exists(d)) {
        val s = Files.walk(d)
        val all = try {
          import scala.jdk.CollectionConverters._
          s.iterator.asScala.toSeq
        } finally s.close()
        all.reverse.foreach(Files.delete)
      }
    }
    def deleteIfExists(p: Path): Unit = Files.deleteIfExists(nio(p))
    def readBytes(p: Path): Array[Byte] = Files.readAllBytes(nio(p))
    def writeBytes(p: Path, b: Array[Byte]): Unit = Files.write(nio(p), b)
    def createExclusive(p: Path, b: Array[Byte]): Unit =
      Files.write(nio(p), b, StandardOpenOption.CREATE_NEW)
    def createDirExclusive(p: Path): Unit = Files.createDirectory(nio(p))
    def replace(src: Path, dst: Path): Unit =
      Files.move(nio(src), nio(dst),
        StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    def moveDir(src: Path, dst: Path): Unit =
      Files.move(nio(src), nio(dst), StandardCopyOption.ATOMIC_MOVE)
    def modTime(p: Path): Long = Files.getLastModifiedTime(nio(p)).toMillis
    def carryFile(src: Path, dst: Path): Unit = {
      val (s, d) = (nio(src), nio(dst))
      try Files.createLink(d, s)
      catch { case _: UnsupportedOperationException | _: java.io.IOException =>
        Files.copy(s, d, StandardCopyOption.REPLACE_EXISTING) }
    }
  }

  /** Hadoop FS backend (`hdfs:`, `s3a:`, ...). */
  private[catalog] final class Hdfs(fs: FileSystem, conf: Configuration) extends StoreIO {
    // no .crc sidecars for protocol files: ChecksumFileSystem wrappers
    // (LocalFileSystem) would shadow every meta/claim/marker write with a
    // checksum file, and a FileContext rename moves only the data file —
    // the stale sidecar then fails later checksummed reads. ONLY on
    // checksum-wrapper filesystems: `fs` is the JVM-wide CACHED instance,
    // and flipping verifyChecksum on a real DFS client would silently
    // disable end-to-end checksum verification for every other read this
    // JVM makes through it (Spark's own parquet reads included) — far
    // beyond suppressing local .crc sidecars.
    fs match {
      case cfs: org.apache.hadoop.fs.ChecksumFileSystem =>
        cfs.setWriteChecksum(false)
        cfs.setVerifyChecksum(false)
      case _ => ()
    }
    def exists(p: Path): Boolean = fs.exists(p)
    def isDir(p: Path): Boolean =
      try fs.getFileStatus(p).isDirectory
      catch { case _: java.io.FileNotFoundException => false }
    def mkdirs(p: Path): Unit = fs.mkdirs(p)
    def list(p: Path): Seq[DirEntry] =
      if (!isDir(p)) Nil
      else fs.listStatus(p).toSeq.map(st => DirEntry(st.getPath, st.isDirectory))
    def deleteRecursively(p: Path): Unit = {
      fs.delete(p, true)
      // drop the dir's sibling claim marker (see createDirExclusive) so a
      // vacuumed build number does not stay permanently claimed
      val m = dirClaimMarker(p)
      if (fs.exists(m)) fs.delete(m, false)
    }
    def deleteIfExists(p: Path): Unit =
      if (fs.exists(p)) fs.delete(p, false)
    def readBytes(p: Path): Array[Byte] = {
      val in = fs.open(p)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](8192)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        buf.toByteArray
      } finally in.close()
    }
    def writeBytes(p: Path, b: Array[Byte]): Unit = {
      val out = fs.create(p, true)
      try out.write(b) finally out.close()
    }
    def createExclusive(p: Path, b: Array[Byte]): Unit = {
      // overwrite = false: atomic at the HDFS NameNode; see trait doc for
      // the S3 caveat. NOT atomic on the local scheme: RawLocalFileSystem
      // implements create(overwrite = false) as an exists CHECK followed
      // by an open — two racers can both pass the check and both "win"
      // (observed live under suite load: both claimed data_v1 and
      // collided in _temporary). Real HDFS does not have this hole, so
      // the forced-backend CI seam must not either: local paths route
      // through java.nio O_CREAT|O_EXCL, which IS the claimed semantic.
      if (fs.getScheme == "file") {
        Files.write(java.nio.file.Paths.get(p.toUri.getPath), b,
          StandardOpenOption.CREATE_NEW)
        return
      }
      // Normalize the failure type so call sites catch ONE exception
      // across backends.
      val out =
        try fs.create(p, false)
        catch { case e: org.apache.hadoop.fs.FileAlreadyExistsException =>
          throw new java.nio.file.FileAlreadyExistsException(p.toString)
        case e: java.io.IOException if fs.exists(p) =>
          throw new java.nio.file.FileAlreadyExistsException(p.toString) }
      try out.write(b) finally out.close()
    }
    private def dirClaimMarker(p: Path): Path =
      new Path(p.getParent, p.getName + ".dirclaim")
    def createDirExclusive(p: Path): Unit = {
      // mkdirs is idempotent (no exclusivity), so the claim is decided by
      // an exclusive marker create — a SIBLING `<dir>.dirclaim` file, NOT
      // a file inside the dir: the winner's later `mode(overwrite)`
      // parquet write deletes and recreates the claimed dir, and an
      // inside-the-dir marker vanished in that window, letting a second
      // claimer win the same build number mid-write. The sibling marker
      // is never touched by content writes; of two racers that both pass
      // the exists check, exactly one wins the marker create — the loser
      // gets FileAlreadyExists and moves on to the next build number.
      // Marker BEFORE mkdirs: a crash in between leaves a claimed number
      // with no dir, which later claimers skip (same recoverable shape as
      // a crashed data-version claim); deleteRecursively of the dir also
      // drops the marker, so vacuumed numbers become claimable again.
      if (fs.exists(p)) throw new java.nio.file.FileAlreadyExistsException(p.toString)
      createExclusive(dirClaimMarker(p), Array.emptyByteArray)
      fs.mkdirs(p)
    }
    def replace(src: Path, dst: Path): Unit =
      FileContext.getFileContext(dst.toUri, conf)
        .rename(src, dst, Options.Rename.OVERWRITE)
    def moveDir(src: Path, dst: Path): Unit = {
      if (!fs.rename(src, dst))
        throw new java.io.IOException(s"rename $src -> $dst failed")
    }
    def modTime(p: Path): Long = fs.getFileStatus(p).getModificationTime
    def carryFile(src: Path, dst: Path): Unit = {
      // no hard links in the Hadoop FS API — fork pays a copy here (admin
      // op; within a collection nothing copies, carries are manifests)
      FileUtil.copy(fs, src, fs, dst, false, true, conf)
    }
  }
}
