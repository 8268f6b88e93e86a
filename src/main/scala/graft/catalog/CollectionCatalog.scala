package graft.catalog

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{Column, DataFrame, Observation, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Ann, ChromaFilter, DocIndex, Embedder, EmbeddingFunction, KeywordIndex, Knn, Retrieval}

/** Logical carry-forward for copy-on-write versions: instead of hard-
  * linking every file of every untouched partition into the new version
  * dir (O(#files) filesystem ops, and hard links do not exist on object
  * stores/HDFS — the one POSIX coupling the r8 design had left), a new
  * version records the partitions it did NOT rewrite in a
  * `_graft_carry.json` manifest mapping partition dir → the SIBLING dir
  * that physically holds its files. Entries are written FULLY RESOLVED
  * (the recorded owner is the dir with the bytes, never another manifest),
  * so resolution is one hop and reference chains cannot form. A carry
  * commit is O(touched data) write + O(partitions) metadata on ANY
  * filesystem — strictly cheaper than the link walk it replaces.
  *
  * Readers group partitions by physical owner and read each owner once
  * (explicit partition-dir paths under `basePath`, so partition-column
  * inference and pruning behave exactly as a plain dir read); a version
  * with no manifest reads as one plain dir scan — the common case and
  * the same plan as always. [[Collection.compact]] rewrites everything
  * local, so it also collapses a long mutation history's owner spread
  * back to one dir; [[Collection.vacuum]] keeps any dir a retained
  * version's manifest references. */
private[graft] object Carry {
  val ManifestName = "_graft_carry.json"

  /** Record `entries` (partition dir name → physical owner dir name, a
    * sibling under the same collection dir) for `vdir`. Nothing carried →
    * no manifest file (the marker of the plain-read fast path). */
  /** Keys are partition dir paths (`pt=<n>`, `cell=<c>/pb=<b>`, ...);
    * values are sibling dir names (`data_v000003`, `index_v000001.b002`).
    * The hand-rolled JSON below does NO string escaping and [[read]]
    * parses with a regex — safe ONLY while both sides stay in this
    * dir-name alphabet, so the constraint is ASSERTED here rather than
    * trusted: a future partition value carrying a quote/backslash fails
    * loudly at write time instead of silently corrupting the manifest. */
  private val DirNameShape = "[A-Za-z0-9_.=/-]+".r

  def write(io: StoreIO, vdir: Path, entries: Map[String, String]): Unit =
    if (entries.nonEmpty) {
      entries.foreach { case (k, v) =>
        require(DirNameShape.matches(k) && DirNameShape.matches(v),
          s"carry-manifest entry '$k' -> '$v' leaves the partition-dir-name " +
            "alphabet the manifest format assumes")
      }
      val body = entries.toSeq.sorted
        .map { case (k, v) => s""""$k": "$v"""" }.mkString("{", ", ", "}")
      io.writeBytes(new Path(vdir, ManifestName),
        body.getBytes(StandardCharsets.UTF_8))
    }

  def read(io: StoreIO, vdir: Path): Map[String, String] = {
    val f = new Path(vdir, ManifestName)
    if (!io.exists(f)) Map.empty
    else "\"([^\"]+)\"\\s*:\\s*\"([^\"]+)\"".r
      .findAllMatchIn(new String(io.readBytes(f), StandardCharsets.UTF_8))
      .map(m => m.group(1) -> m.group(2)).toMap
  }

  /** Resolve `vdir` to partition-dir → PHYSICAL-owner-dir: partitions
    * present locally (name starts with `prefix`) own themselves; manifest
    * entries point at the owning sibling under collection dir `dir`.
    * Local presence wins on a (never-written) overlap. */
  def owners(io: StoreIO, dir: Path, vdir: Path, prefix: String): Map[String, Path] = {
    val local = io.list(vdir)
      .filter(e => e.isDir && e.name.startsWith(prefix)).map(_.name)
    read(io, vdir).map { case (part, owner) => part -> new Path(dir, owner) } ++
      local.map(part => part -> vdir).toMap
  }

  /** [[owners]] for the TWO-LEVEL index-slice layout (`<axis>=<a>/pb=<b>`
    * — IVF cells and postings gram partitions both carry the id-bucket
    * `pb` refresh axis): keys are the slice-relative paths. */
  def slicedOwners(io: StoreIO, dir: Path, build: Path): Map[String, Path] = {
    val local = io.list(build)
      .filter(e => e.isDir && e.name.contains("=")).flatMap { axis =>
        io.list(axis.path).filter(e => e.isDir && e.name.startsWith("pb="))
          .map(pb => s"${axis.name}/${pb.name}")
      }
    read(io, build).map { case (part, owner) => part -> new Path(dir, owner) } ++
      local.map(part => part -> build).toMap
  }

  /** Resolved parquet read of a possibly-carrying version/build dir. The
    * manifest-free case is the plain whole-dir scan (identical plan to a
    * layout with no carry history); otherwise each physical owner dir is
    * read once with explicit partition paths under `basePath` (partition
    * columns infer and prune exactly as on the plain scan), unioned by
    * name with missing columns admitted. */
  def readResolved(spark: SparkSession, io: StoreIO, vdir: Path,
                   ownersFor: => Map[String, Path]): DataFrame =
    if (read(io, vdir).isEmpty)
      spark.read.option("mergeSchema", "true").parquet(vdir.toString)
    else
      ownersFor.groupBy(_._2).toSeq.sortBy(_._1.toString)
        .map { case (base, parts) =>
          spark.read.option("mergeSchema", "true")
            .option("basePath", base.toString)
            .parquet(parts.keys.toSeq.sorted.map(p => new Path(base, p).toString): _*)
        }
        .reduce(_.unionByName(_, allowMissingColumns = true))
}

/** Parquet-backed vector-collection store with Chroma collection semantics.
  *
  * The reference bulk-loads a Chroma `PersistentClient` collection
  * (extras/...sas:126-132: `PersistentClient(path)`,
  * `get_or_create_collection(name)`; sas:177-190: `collection.add(...)`).
  * Chroma persists to SQLite + an HNSW segment on ONE node; that shape caps
  * out long before 100 TB. Here a collection is:
  *
  *   <root>/<name>/meta.json          {name, space, version, metadata}
  *   <root>/<name>/data_v<N>/         parquet, hash(id)-bucketed `pt` dirs
  *                                    (+ `_graft_carry.json`: buckets this
  *                                    version did NOT rewrite → the sibling
  *                                    dir physically holding them — see
  *                                    [[Carry]])
  *
  * Rows: id STRING (unique), document STRING, embedding ARRAY<FLOAT>,
  * metadata columns flattened as ordinary typed columns (filter pushdown
  * works on them; Chroma's flat str→scalar dict maps 1:1).
  *
  * Scale design:
  *  - id-hash partition column `pt` → merges (upsert/update/delete) rewrite
  *    ONLY the buckets containing affected ids (dynamic partition overwrite),
  *    and point-gets prune to one bucket.
  *  - Mutations are copy-on-write into a new `data_v<N>` dir; `meta.json` is
  *    swapped atomically (write temp + move) so readers never see a torn
  *    version. This replaces Chroma's single-writer SQLite transaction.
  *  - `add` validates duplicate ids with ONE ≤numBuckets-row aggregate over
  *    the incoming batch (per-bucket count vs distinct-count — an id repeat
  *    always lands in one bucket); the clash-vs-existing check rides the
  *    merge write itself as an `observe()` metric, so the affected buckets
  *    are scanned once, not once to validate and again to write.
  */
final class CollectionCatalog(
    val spark: SparkSession, rootDir: String, numBuckets: Int = 32,
    maxRowsPerFile: Long = 1L << 20) {

  require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
  // Spark treats maxRecordsPerFile <= 0 as "no limit" — reject it up front
  // rather than silently disabling the chunking the caller asked for.
  require(maxRowsPerFile > 0, s"maxRowsPerFile must be positive, got $maxRowsPerFile")

  private val root: Path = new Path(rootDir)
  private val io: StoreIO =
    StoreIO.of(root, spark.sparkContext.hadoopConfiguration)
  io.mkdirs(root)

  /** get-or-create (A9). `metadata` is stored at CREATION only (an
    * existing collection keeps its own — Chroma's get_or_create contract);
    * Chroma's `hnsw:space` metadata convention is honored as the space
    * when the `space` parameter is left at its default, and index-tuning
    * keys (`ivf:nlist`, `ivf:nprobe` — our IVF analog of Chroma's
    * `hnsw:construction_ef`/`hnsw:search_ef`) become the collection's
    * build/query defaults (see [[Collection.buildIndex]] / `query`). */
  def getOrCreateCollection(name: String, space: String = "l2",
                            metadata: Map[String, String] = Map.empty): Collection = {
    // dot-prefixed names are reserved for in-flight build temps (fork):
    // they are hidden from listCollections and subject to reclamation —
    // admitting one here would create a collection that can silently
    // disappear (chromadb likewise constrains collection names)
    require(!name.startsWith("."),
      s"collection name '$name' is invalid: dot-prefixed names are reserved")
    val dir = new Path(root, name)
    if (!io.exists(new Path(dir, "meta.json"))) {
      // validate BEFORE touching the filesystem: a conflict must not
      // leave a meta-less collection dir behind
      val effSpace = resolvedSpace(space, metadata)
      Collection.requireSpace(effSpace)
      // a typo'd analyzer must fail at creation, not years later as
      // silent whitespace tokenization on every keyword query
      metadata.get(Collection.AnalyzerKey)
        .foreach(graft.operators.Retrieval.requireAnalyzer)
      io.mkdirs(dir)
      // EXCLUSIVE initial create — two live callers get-or-creating the
      // same name race here, and first-writer-wins is exactly the
      // contract: the loser's space/metadata args are ignored the same
      // way they are when the collection already existed (a replacing
      // write instead would let the slower creator silently overwrite
      // the winner's space). Same CAS primitive as version claims —
      // the per-backend atomicity caveats in [[StoreIO]] apply alike.
      try io.createExclusive(new Path(dir, "meta.json"),
        CollectionMeta.toJson(CollectionMeta(name, effSpace, 0, metadata, numBuckets))
          .getBytes(StandardCharsets.UTF_8))
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
    }
    new Collection(spark, io, dir, maxRowsPerFile)
  }

  /** Chroma's `hnsw:space` metadata convention vs the `space` parameter:
    * metadata wins when the parameter is at its default; a real conflict
    * is LOUD (shared by every collection-creating entry point). */
  private def resolvedSpace(space: String, metadata: Map[String, String]): String =
    metadata.get("hnsw:space") match {
      case Some(s) if space == "l2" || space == s => s
      case Some(s) =>
        throw new IllegalArgumentException(
          s"conflicting spaces: parameter '$space' vs metadata hnsw:space '$s'")
      case None => space
    }

  def getCollection(name: String): Option[Collection] = {
    val dir = new Path(root, name)
    if (io.exists(new Path(dir, "meta.json")))
      Some(new Collection(spark, io, dir, maxRowsPerFile))
    else None
  }

  def listCollections(): Seq[String] =
    if (!io.exists(root)) Nil
    // dot-prefixed dirs are in-flight build temps (fork), never
    // collections — a crashed fork temp must not list as one
    else io.list(root)
      .filter(e => io.exists(new Path(e.path, "meta.json")) && !e.name.startsWith("."))
      .map(_.name).sorted

  def deleteCollection(name: String): Boolean = {
    val dir = new Path(root, name)
    if (!io.exists(dir)) false
    else {
      io.deleteRecursively(dir)
      true
    }
  }

  /** Collection fork: `to` is born at version 1 holding `from`'s
    * CURRENT snapshot with every data file carried physically — hard
    * links on POSIX (O(#files), no bytes moved; see [[StoreIO]]), a copy
    * on stores without links (admin-op cost, documented). Safe because committed COW versions are
    * immutable: the first mutation of either side rewrites only its own
    * affected buckets into its own next version, so the two collections
    * diverge without ever touching shared inodes (same mechanism as
    * [[Collection.vacuum]]'s retained snapshots). The 100 TB use case:
    * dev/experiment copies of a production collection for the cost of a
    * directory walk. Chroma parity: chromadb's `collection.fork()`.
    *
    * Committed sidecar INDEXES (IVF — plain or PQ-coded — and the
    * trigram postings) travel with the snapshot, re-keyed to the fork's
    * v1: assignment, codes, and postings are pure functions of the data
    * CONTENT, which the fork's v1 shares bit-for-bit with the source's
    * current version, so a resolved physical copy of the newest
    * committed build serves identical answers. (Before r12 they were
    * dropped as "rebuildable on demand" — false for a PQ build, whose
    * seeded codebooks are derived from seed IDS the fork no longer
    * knows; a forked PQ collection could only fail loudly.) Carry
    * manifests cannot cross the collection boundary (the data walk's
    * argument), so carried slices materialize physically. Lineage is
    * recorded as `forked_from = <src>@v<N>` in the fork's metadata.
    * Caveat (same as time travel): a concurrent writer+vacuum on the
    * source can reclaim the snapshot mid-walk; fork under that race
    * fails loudly on the missing file, never links half a version
    * silently (the commit marker is written only after a complete walk). */
  def forkCollection(from: String, to: String): Collection = {
    require(!to.startsWith("."),
      s"collection name '$to' is invalid: dot-prefixed names are reserved")
    val srcDir = new Path(root, from)
    require(io.exists(new Path(srcDir, "meta.json")), s"no such collection: $from")
    val dstDir = new Path(root, to)
    require(!io.exists(dstDir), s"collection '$to' already exists")
    // Crash-safe adoption: the fork is BUILT in a temp sibling and lands
    // via ONE atomic rename (the same pattern meta.json's atomicWrite
    // uses). The old in-place build had unretryable crash residue: a
    // death between createDirectories(dstDir) and the final meta write
    // left a meta-less dstDir holding a stale version claim — a retry
    // hit "already exists", and getOrCreateCollection would lay a v0
    // meta over orphaned v1 data. Now a crash leaves only the temp
    // (reclaimed on retry below); dstDir is either absent or complete.
    val tmpDir = new Path(root, s".fork-tmp-$to")
    if (io.exists(tmpDir)) io.deleteRecursively(tmpDir)
    val src = CollectionMeta.read(io, srcDir)
    val lineage = s"${src.name}@v${src.version}"
    io.mkdirs(tmpDir)
    val srcData = new Path(srcDir, f"data_v${src.version}%06d")
    if (!io.exists(srcData)) {
      // never-written source → an empty fork, lineage still recorded
      writeMeta(tmpDir, CollectionMeta(to, src.space, 0,
        src.metadata + ("forked_from" -> lineage), src.buckets))
    } else {
      val dst = CollectionMeta(to, src.space, 1,
        src.metadata + ("forked_from" -> lineage), src.buckets)
      CollectionMeta.claimVersion(io, tmpDir, dst)
      val dstData = new Path(tmpDir, f"data_v${1}%06d")
      io.mkdirs(dstData)
      // resolve the source's carry manifest: a carried bucket's files live
      // in an OLDER sibling dir, and the fork must carry the physical
      // files (a manifest cannot cross the collection boundary)
      Carry.owners(io, srcDir, srcData, "pt=").foreach { case (part, owner) =>
        val from = new Path(owner, part); val into = new Path(dstData, part)
        io.mkdirs(into)
        io.list(from).filterNot(_.isDir).foreach(f =>
          io.carryFile(f.path, new Path(into, f.name)))
      }
      // the embedding-function BINDING travels in metadata — the fitted
      // MODEL sidecar must travel with it or the fork cannot queryText
      val sidecar = new Path(srcDir, Collection.EmbedderSidecar)
      if (io.exists(sidecar))
        io.writeBytes(new Path(tmpDir, Collection.EmbedderSidecar),
          io.readBytes(sidecar))
      // committed sidecar indexes, re-keyed to v1 (see scaladoc): the
      // newest committed build of each family whose version == the
      // forked snapshot's version — an older build would answer for
      // stale content and must NOT carry
      def newestCommitted(versionedPrefix: String): Option[Path] = {
        def buildNo(p: Path): Int = {
          val n = p.getName; val dot = n.indexOf(".b")
          if (dot < 0) 0 else n.substring(dot + 2).toInt
        }
        io.list(srcDir).filter(e => e.isDir && (e.name == versionedPrefix ||
            e.name.startsWith(versionedPrefix + ".b"))).map(_.path)
          .filter(p => io.exists(new Path(p, "_graft_committed")))
          .sortBy(buildNo).lastOption
      }
      def copyResolvedBuild(srcBuild: Path, dstName: String): Unit = {
        val dstBuild = new Path(tmpDir, dstName)
        io.mkdirs(dstBuild)
        // two-level slices (cell|gp / pb), carry-manifest-resolved —
        // physical copies, the manifest itself does not travel
        Carry.slicedOwners(io, srcDir, srcBuild).foreach { case (slice, owner) =>
          val fromD = new Path(owner, slice); val into = new Path(dstBuild, slice)
          io.mkdirs(into)
          io.list(fromD).filterNot(_.isDir).foreach(f =>
            io.carryFile(f.path, new Path(into, f.name)))
        }
        // one-level slices (compactIndexes(keepRefreshAxis = false)
        // drops the pb axis; such builds are manifest-free)
        io.list(srcBuild).filter(e => e.isDir && e.name.contains("=")).foreach { axis =>
          val files = io.list(axis.path).filterNot(_.isDir)
          if (files.nonEmpty) {
            val into = new Path(dstBuild, axis.name); io.mkdirs(into)
            files.foreach(f => io.carryFile(f.path, new Path(into, f.name)))
          }
        }
        // top-level sidecars (centroids, PQ codebooks + residual flag):
        // everything but the carry manifest and the marker (written last)
        io.list(srcBuild).filterNot(_.isDir)
          .filterNot(e => e.name == "_graft_committed" || e.name == Carry.ManifestName)
          .foreach(e => io.writeBytes(new Path(dstBuild, e.name), io.readBytes(e.path)))
        io.writeBytes(new Path(dstBuild, "_graft_committed"), Array.emptyByteArray)
      }
      newestCommitted(f"index_v${src.version}%06d")
        .foreach(copyResolvedBuild(_, "index_v000001.b000"))
      newestCommitted(f"docindex_v${src.version}%06d")
        .foreach(copyResolvedBuild(_, "docindex_v000001.b000"))
      newestCommitted(f"kwindex_v${src.version}%06d")
        .foreach(copyResolvedBuild(_, "kwindex_v000001.b000"))
      io.writeBytes(CollectionMeta.commitMarker(tmpDir, 1), Array.emptyByteArray)
      CollectionMeta.atomicWrite(io, tmpDir, dst)
    }
    io.moveDir(tmpDir, dstDir)
    new Collection(spark, io, dstDir, maxRowsPerFile)
  }

  /** Import an [[Collection.export]]'d parquet directory as a NEW
    * collection — the round-trip inverse (move a collection between
    * roots/clusters through plain parquet, the interchange format both
    * sides already speak). The frame must carry the store's `id` column;
    * everything else travels as-is. The load goes through
    * [[Collection.add]], so every add-time invariant (unique non-null
    * ids, uniform dimensions) gates the import — a corrupted export
    * fails loudly instead of seeding a bad store. */
  def importCollection(name: String, path: String, space: String = "l2",
                       metadata: Map[String, String] = Map.empty): Collection = {
    require(!name.startsWith("."),
      s"collection name '$name' is invalid: dot-prefixed names are reserved")
    require(getCollection(name).isEmpty, s"collection '$name' already exists")
    val df = spark.read.parquet(path)
    require(df.columns.contains("id"),
      s"import source at $path carries no 'id' column")
    // a parquet export carries the source collection's identity sidecars
    // (see [[Collection.export]]): space + metadata from
    // `_graft_meta.json` fill whatever the CALLER left at defaults
    // (explicit args win, per-key for metadata), and a fitted embedding
    // model restores with its binding so the import can queryText. An
    // export-less plain parquet dir imports exactly as before.
    val exportedMetaPath = new Path(path, Collection.ExportMetaName)
    val exported: Option[CollectionMeta] =
      if (io.exists(exportedMetaPath))
        Some(CollectionMeta.fromJson(
          new String(io.readBytes(exportedMetaPath), StandardCharsets.UTF_8)))
      else None
    val effMetadata = exported.map(_.metadata).getOrElse(Map.empty) ++ metadata
    val effSpace =
      if (space != "l2") resolvedSpace(space, metadata)
      else exported.map(_.space).getOrElse(resolvedSpace(space, metadata))
    val exportedSidecar = new Path(path, Collection.EmbedderSidecar)
    if (effMetadata.get("embedding_function")
        .exists(_.startsWith(graft.operators.Embedder.TfIdfV1Prefix)))
      require(io.exists(exportedSidecar),
        s"import source records a fitted embedding function but carries no " +
          s"${Collection.EmbedderSidecar} sidecar — the model cannot be " +
          "reconstructed from the name; re-export the source collection")
    // Reject-safe adoption (same pattern as forkCollection): the load runs
    // against a dot-prefixed temp sibling and lands via ONE atomic rename,
    // so a rejected source (duplicate ids, ragged dims — add()'s gates) or
    // a crash leaves NO registered collection behind and the import stays
    // retryable. The old in-place build registered the collection BEFORE
    // add() gated the data, so a rejected source left an empty collection
    // whose retry died on 'already exists' — the same unretryable-residue
    // class forkCollection was fixed for.
    val tmpDir = new Path(root, s".import-tmp-$name")
    if (io.exists(tmpDir)) io.deleteRecursively(tmpDir)
    io.mkdirs(tmpDir)
    writeMeta(tmpDir, CollectionMeta(name, effSpace, 0, effMetadata, numBuckets))
    if (io.exists(exportedSidecar))
      io.writeBytes(new Path(tmpDir, Collection.EmbedderSidecar),
        io.readBytes(exportedSidecar))
    try new Collection(spark, io, tmpDir, maxRowsPerFile).add(df)
    catch { case e: Throwable =>
      // reclaim eagerly on a CAUGHT rejection (a crash leaves the temp for
      // the retry's reclamation above); best-effort — the rethrow wins
      try io.deleteRecursively(tmpDir)
      catch { case scala.util.control.NonFatal(_) => () }
      throw e
    }
    val dstDir = new Path(root, name)
    io.moveDir(tmpDir, dstDir)
    new Collection(spark, io, dstDir, maxRowsPerFile)
  }

  /** B11 rename: catalog-level move + meta.json name update (atomic dir
    * move on the same filesystem; data files untouched). */
  def renameCollection(from: String, to: String): Boolean = {
    require(!to.startsWith("."),
      s"collection name '$to' is invalid: dot-prefixed names are reserved")
    val src = new Path(root, from); val dst = new Path(root, to)
    if (!io.exists(new Path(src, "meta.json")) || io.exists(dst)) false
    else {
      io.moveDir(src, dst)
      val m = CollectionMeta.read(io, dst)
      CollectionMeta.atomicWrite(io, dst, m.copy(name = to))
      true
    }
  }

  private[catalog] def writeMeta(dir: Path, meta: CollectionMeta): Unit =
    CollectionMeta.atomicWrite(io, dir, meta)
}

final case class CollectionMeta(
    name: String,
    space: String,
    version: Int,
    metadata: Map[String, String],
    buckets: Int = 32)

object CollectionMeta {
  /** Minimal hand-rolled JSON (flat strings/ints only) — no extra deps.
    * Braces and control characters are \uXXXX-escaped so the regex reader
    * below can delimit the metadata object without a full JSON parser. */
  def toJson(m: CollectionMeta): String = {
    def q(s: String) = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' || c == '{' || c == '}' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val md = m.metadata.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ", ", "}")
    s"""{"name": ${q(m.name)}, "space": ${q(m.space)}, "version": ${m.version}, "buckets": ${m.buckets}, "metadata": $md}"""
  }

  private def unescape(raw: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < raw.length) {
      if (raw(i) == '\\' && i + 1 < raw.length) raw(i + 1) match {
        case 'u' => sb.append(Integer.parseInt(raw.substring(i + 2, i + 6), 16).toChar); i += 6
        case 'n' => sb.append('\n'); i += 2
        case c   => sb.append(c); i += 2
      } else { sb.append(raw(i)); i += 1 }
    }
    sb.toString
  }

  def fromJson(s: String): CollectionMeta = {
    def str(k: String) = ("\"" + k + "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").r
      .findFirstMatchIn(s).map(m => unescape(m.group(1)))
    def int(k: String) = ("\"" + k + "\"\\s*:\\s*(\\d+)").r
      .findFirstMatchIn(s).map(_.group(1).toInt)
    val mdBody = ("\"metadata\"\\s*:\\s*\\{([^}]*)\\}").r.findFirstMatchIn(s).map(_.group(1)).getOrElse("")
    val md = "\"((?:[^\"\\\\]|\\\\.)*)\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"".r
      .findAllMatchIn(mdBody).map(m => unescape(m.group(1)) -> unescape(m.group(2))).toMap
    CollectionMeta(str("name").get, str("space").getOrElse("l2"),
      int("version").getOrElse(0), md, int("buckets").getOrElse(32))
  }

  private[catalog] def claimFile(dir: Path, version: Int): Path =
    new Path(dir, f"meta.v$version%06d.json")

  private[catalog] def isClaimFile(name: String): Boolean =
    name.startsWith("meta.v") && name.endsWith(".json")

  private[catalog] def claimVersionOf(name: String): Int =
    name.stripPrefix("meta.v").stripSuffix(".json").toInt

  /** `data_v<N>/_graft_committed`: written after ALL data work for the
    * version (parquet write + carry manifest) — `_SUCCESS` alone is not
    * enough, Spark writes it before the carry pass. */
  private[catalog] def commitMarker(dir: Path, version: Int): Path =
    new Path(new Path(dir, f"data_v$version%06d"), "_graft_committed")

  /** Current meta = the `meta.json` pointer, unless a newer COMMITTED
    * claim exists (claim file + its version's completeness marker): a
    * writer that crashed between the marker and the pointer refresh
    * cannot lose its commit, and a claim whose data write never finished
    * is never served. The common path compares claim-file NAMES only —
    * no extra reads/parses when the pointer is current. Version ties
    * prefer the pointer (rename refreshes only the pointer's `name`). */
  def read(io: StoreIO, dir: Path): CollectionMeta = {
    val pointerPath = new Path(dir, "meta.json")
    val pointer =
      if (io.exists(pointerPath))
        Some(fromJson(new String(io.readBytes(pointerPath), StandardCharsets.UTF_8)))
      else None
    val floor = pointer.map(_.version).getOrElse(-1)
    val adopted = io.list(dir).filter(e => isClaimFile(e.name))
      .filter(e => claimVersionOf(e.name) > floor)
      .sortBy(e => claimVersionOf(e.name)).reverse
      .find(e => io.exists(commitMarker(dir, claimVersionOf(e.name))))
      .map(e => fromJson(new String(io.readBytes(e.path), StandardCharsets.UTF_8)))
    adopted.orElse(pointer).getOrElse(
      throw new java.nio.file.NoSuchFileException(pointerPath.toString))
  }

  /** Atomically claim `meta.version`: `O_CREAT|O_EXCL` create of the
    * version-numbered claim file — of two racing writers exactly one
    * create succeeds; the loser gets `FileAlreadyExistsException`. (A
    * `Files.move` without `REPLACE_EXISTING` is NOT a CAS on POSIX: the
    * provider stat-checks then rename(2)s, and rename silently replaces.)
    * This is the one true serialization point of the copy-on-write commit
    * protocol, taken BEFORE any data write. Claim content is only parsed
    * by readers after the commit marker exists, so the non-atomic content
    * write is safe. */
  private[catalog] def claimVersion(io: StoreIO, dir: Path, meta: CollectionMeta): Unit =
    io.createExclusive(claimFile(dir, meta.version),
      toJson(meta).getBytes(StandardCharsets.UTF_8))

  def atomicWrite(io: StoreIO, dir: Path, meta: CollectionMeta): Unit = {
    // tmp name is UNIQUE per call: two live writers refreshing the
    // pointer concurrently (commit of v2 racing commit of v3) must not
    // share a staging file — with a fixed name, one writer's replace
    // consumes the other's tmp and the victim fails AFTER its commit
    // marker landed (a commit reported as failed that actually
    // succeeded). With unique tmps both replaces land; whichever pointer
    // loses the last-rename race is harmless — the pointer is a cache,
    // read() recovers the newest COMMITTED claim above it.
    val tmp = new Path(dir, s"meta.json.tmp.${java.util.UUID.randomUUID}")
    io.writeBytes(tmp, toJson(meta).getBytes(StandardCharsets.UTF_8))
    io.replace(tmp, new Path(dir, "meta.json"))
  }
}

/** chromadb ≥0.4.15 tenant/database namespaces — the multi-team surface
  * (`chromadb.Client(tenant=..., database=...)`). A namespace is a PATH
  * PREFIX: collections of (tenant, database) live under
  * `<root>/.tenants/<tenant>/<database>/<name>`, so every store mechanism
  * (MVCC versions, commit claims, lease keys = full paths) isolates across
  * namespaces with zero new protocol. The `.tenants` dir is dot-prefixed —
  * already invisible to [[CollectionCatalog.listCollections]] and outside
  * fork-temp reclamation (which only touches `.fork-tmp-<name>`), so a
  * namespaced root coexists with the plain single-namespace layout (which
  * stays the default — most deployments are single-team; Chroma's own
  * defaults are `default_tenant`/`default_database`). */
object CollectionCatalog {
  val DefaultTenant = "default_tenant"
  val DefaultDatabase = "default_database"

  // chromadb-ish identifier rule: alnum start, then alnum/._-, ≤64 chars,
  // never dot-led (a dot-led segment would collide with reserved dirs)
  private def requireNs(kind: String, v: String): Unit =
    require(v.matches("[A-Za-z0-9][A-Za-z0-9._-]{0,63}"),
      s"$kind '$v' is invalid: want [A-Za-z0-9][A-Za-z0-9._-]{0,63}")

  private def nsPath(rootDir: String, tenant: String, database: String): Path = {
    requireNs("tenant", tenant); requireNs("database", database)
    new Path(new Path(new Path(rootDir), ".tenants"), s"$tenant/$database")
  }

  /** The catalog for one (tenant, database) namespace. Idempotent —
    * Chroma's create_database/get_or_create client shape. */
  def forNamespace(spark: SparkSession, rootDir: String,
                   tenant: String = DefaultTenant,
                   database: String = DefaultDatabase,
                   numBuckets: Int = 32,
                   maxRowsPerFile: Long = 1L << 20): CollectionCatalog =
    new CollectionCatalog(spark, nsPath(rootDir, tenant, database).toString,
      numBuckets, maxRowsPerFile)

  def listTenants(spark: SparkSession, rootDir: String): Seq[String] = {
    val p = new Path(new Path(rootDir), ".tenants")
    val io = StoreIO.of(new Path(rootDir), spark.sparkContext.hadoopConfiguration)
    if (!io.exists(p)) Nil else io.list(p).map(_.name).sorted
  }

  def listDatabases(spark: SparkSession, rootDir: String,
                    tenant: String): Seq[String] = {
    requireNs("tenant", tenant)
    val p = new Path(new Path(new Path(rootDir), ".tenants"), tenant)
    val io = StoreIO.of(new Path(rootDir), spark.sparkContext.hadoopConfiguration)
    if (!io.exists(p)) Nil else io.list(p).map(_.name).sorted
  }

  /** Drop a whole database (all its collections). Chroma's
    * delete_database; false when it never existed. */
  def deleteDatabase(spark: SparkSession, rootDir: String,
                     tenant: String, database: String): Boolean = {
    val p = nsPath(rootDir, tenant, database)
    val io = StoreIO.of(new Path(rootDir), spark.sparkContext.hadoopConfiguration)
    if (!io.exists(p)) false else { io.deleteRecursively(p); true }
  }
}

/** Cell-occupancy profile of a committed IVF build — the drift signal
  * for scheduling a [[Collection.buildIndex]] re-train. `nCells` is the
  * CENTROID count (empty cells count toward the mean: a cell the corpus
  * has drifted away from is drift, not a smaller denominator). */
final case class IvfOccupancy(nCells: Int, totalRows: Long, maxCellRows: Long) {
  def meanCellRows: Double =
    if (nCells == 0) 0.0 else totalRows.toDouble / nCells
  /** max/mean occupancy: 1.0 = perfectly balanced; grows as the corpus
    * drifts from the trained centroids (hot cells stop pruning — an
    * nprobe query over a skew-S index can touch ~S× the rows a balanced
    * one would). */
  def skew: Double =
    if (totalRows == 0L || nCells == 0) 1.0 else maxCellRows / meanCellRows
}

/** [[Collection.refreshIndexReport]]'s product: what the refresh did,
  * plus the occupancy the refreshed index now has. */
final case class IvfRefreshReport(refreshedBuckets: Int, occupancy: IvfOccupancy) {
  def skew: Double = occupancy.skew
}

/** One collection — the Chroma collection API surface (SURVEY §2.B). */
final class Collection(spark: SparkSession, io: StoreIO, dir: Path,
                       maxRowsPerFile: Long) {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(classOf[Collection])

  import ChromaFilter.{Where, WhereDocument}

  def meta: CollectionMeta = CollectionMeta.read(io, dir)

  /** The bucket count is part of the collection's on-disk identity: a
    * session configured differently must still merge against the layout the
    * data was written with, or bucket-pruned merges would corrupt it. */
  private def numBuckets: Int = meta.buckets
  def name: String = meta.name
  def space: String = meta.space

  private def dataDir(v: Int): Path = new Path(dir, f"data_v$v%06d")

  // Every mutation reads `meta` ONCE, derives its inputs from that
  // snapshot, and passes the same snapshot to the commit as the expected
  // CAS value — a fresh re-read at commit time would compare fresh
  // against fresh and wave through a concurrent commit (lost update).
  private def currentDataOf(m: CollectionMeta): Option[Path] = {
    val p = dataDir(m.version)
    if (io.exists(p)) Some(p) else None
  }
  private def currentData: Option[Path] = currentDataOf(meta)

  private def bucketed(df: DataFrame): DataFrame =
    df.withColumn("pt", pmod(xxhash64(col("id")), lit(numBuckets)).cast("int"))

  /** The pt buckets a literal id list can live in — the writer's own hash
    * ([[bucketed]]'s xxhash64-of-id) evaluated driver-side per id, so a
    * point read lists and scans ONLY the partition dirs that can hold its
    * rows: at numBuckets=32 a one-id `get` touches 1 directory instead of
    * 32 (and at 100 TB, 1/numBuckets of the corpus's files instead of all
    * of them — parquet row-group stats prune WITHIN files, but only
    * partition pruning prunes the listing itself). None (= scan all) when
    * the stored id column is not STRING: the hash is type-sensitive, and
    * a legacy non-string layout must stay correct over fast. */
  private def ptBucketsOf(cur: DataFrame, ids: Seq[String]): Option[Seq[Int]] =
    if (!cur.schema.fields.exists(f =>
        f.name == "id" && f.dataType == org.apache.spark.sql.types.StringType)) None
    else Some(ids.map(ptOfString).distinct)

  /** The write hash of one STRING id, evaluated driver-side: Spark's own
    * XxHash64 expression (same default seed 42 as the xxhash64() the
    * write path uses), then Pmod's non-negative form — bit-for-bit
    * [[bucketed]]'s hash. */
  private def ptOfString(id: String): Int = {
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          id, org.apache.spark.sql.types.StringType)), 42L)
      .eval(org.apache.spark.sql.catalyst.InternalRow.empty)
      .asInstanceOf[Long]
    val nb = numBuckets.toLong
    (((h % nb) + nb) % nb).toInt
  }

  /** Read ONE committed version's rows WITH the `pt` column, resolving
    * carried buckets through its [[Carry]] manifest: each distinct
    * physical owner dir contributes one parquet read of exactly its owned
    * bucket dirs (explicit partition paths under `basePath`, so `pt`
    * stays a real partition column and pruning behaves as on a plain dir
    * scan), unioned by name with missing columns admitted (cross-version
    * schema evolution, the same semantics per-dir `mergeSchema` gives).
    * The no-carry case — every fresh write, every compacted collection —
    * short-circuits to the plain whole-dir read: the identical plan to
    * the pre-manifest layout (PlanShapeSpec pins it). */
  private def readVersion(v: Int): DataFrame =
    Carry.readResolved(spark, io, dataDir(v),
      Carry.owners(io, dir, dataDir(v), "pt="))

  /** Resolved read of an index build dir (see [[readVersion]] — same
    * mechanics over the two-level `<axis>=<a>/pb=<b>` slice layout). */
  private def readIndexBuild(build: Path): DataFrame =
    Carry.readResolved(spark, io, build, Carry.slicedOwners(io, dir, build))

  /** Current contents (empty frame with canonical schema if never written). */
  def toDF: DataFrame = { val m = meta; currentDataOf(m) match {
    case Some(_) => readVersion(m.version).drop("pt")
    case None => spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.StringType, false),
        org.apache.spark.sql.types.StructField("document", org.apache.spark.sql.types.StringType, true),
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType), true))))
  } }

  /** Current contents WITH the bucket column (internal merge path). */
  private def currentWithPtOf(m: CollectionMeta): DataFrame =
    readVersion(m.version)

  /** Contents of ONE meta snapshot (empty canonical frame if never
    * written). Every read surface that also consults snapshot-bound
    * sidecars (IVF cells, posting lists) must scan THIS, not [[toDF]] —
    * toDF re-reads meta, and a commit landing in between would pair
    * version-N+1 data with version-N index artifacts. */
  private def snapshotDF(m: CollectionMeta): DataFrame = currentDataOf(m) match {
    case Some(_) => readVersion(m.version).drop("pt")
    case None => toDF // canonical empty frame (meta re-read harmless: no data)
  }

  /** Single-writer commit: the version-claim file move is the atomic CAS
    * (an `O_CREAT|O_EXCL` create of the version-claim file — exactly one
    * of two racing writers succeeds; the loser fails LOUDLY instead of
    * silently dropping the winner's rows).
    *
    * ORDER MATTERS: the claim is taken BEFORE any data is written, so a
    * losing writer cannot overwrite the winner's `data_v<N+1>` directory
    * during its (multi-second) Spark write — it never starts it. Commit
    * then = data write → `_graft_committed` marker → pointer refresh;
    * `read()` only adopts a claim whose marker exists, so a half-written
    * version is never served. A claim left by a writer that crashed
    * mid-write blocks that version until `vacuum()`/manual cleanup —
    * loud and recoverable, never silent corruption. */
  private def claimNext(expected: CollectionMeta): CollectionMeta = {
    if (meta.version != expected.version) throw new java.util.ConcurrentModificationException(
      s"collection '${expected.name}' advanced past v${expected.version} during this mutation; retry")
    val next = expected.copy(version = expected.version + 1)
    try CollectionMeta.claimVersion(io, dir, next)
    catch { case _: java.nio.file.FileAlreadyExistsException =>
      throw new java.util.ConcurrentModificationException(
        s"collection '${expected.name}' v${next.version} was claimed by a concurrent writer; retry")
    }
    next
  }

  /** Second half of the commit: completeness marker, then pointer. */
  private def commit(next: CollectionMeta): Unit = {
    io.writeBytes(CollectionMeta.commitMarker(dir, next.version), Array.emptyByteArray)
    CollectionMeta.atomicWrite(io, dir, next)
  }

  /** Drop a claim whose data write failed (nothing was committed — the
    * marker does not exist — so the version number can be re-claimed).
    * The partially-written data dir is deleted FIRST: it sits ABOVE the
    * current version number, so vacuum (which only reclaims v < current)
    * would never collect it — without this, every rejected write (id
    * clash, ragged-dim abort) permanently leaked a full copy of the
    * affected buckets. Claim release comes last so a concurrent writer
    * cannot re-claim the number while the dead dir still exists. */
  private def abandon(next: CollectionMeta): Unit = {
    // best-effort on the dir: abandon runs inside catch blocks that
    // rethrow the ORIGINAL failure, and the claim release must happen
    // even if the cleanup trips (a straggler task still flushing can race
    // the walk) — a leftover dir is harmless (the next writer's
    // mode(overwrite) replaces it) but a leaked claim wedges the
    // collection permanently (vacuum only reclaims v < current)
    try {
      val dead = dataDir(next.version)
      if (io.exists(dead)) io.deleteRecursively(dead)
    } catch { case scala.util.control.NonFatal(_) => () }
    finally io.deleteIfExists(CollectionMeta.claimFile(dir, next.version))
  }

  /** Full rewrite into a fresh version (first write / fallback /
    * compaction). `repack` routes every bucket to one task so the output
    * is exactly one file chain per bucket — without it each read task
    * emits a file per bucket it happens to hold (tasks x buckets files,
    * the opposite of compaction). */
  private def writeVersion(
      df: DataFrame, expected: CollectionMeta, repack: Boolean = false,
      beforeCommit: () => Unit = () => ()): Unit = {
    val next = claimNext(expected)
    try {
      val b = bucketed(df)
      val out = if (repack) b.repartition(numBuckets, col("pt")) else b
      out.write.mode("overwrite")
        .option("maxRecordsPerFile", maxRowsPerFile)
        .partitionBy("pt").parquet(dataDir(next.version).toString)
      beforeCommit()
    } catch { case e: Throwable => abandon(next); throw e }
    commit(next)
  }

  /** Partition-pruned copy-on-write (SURVEY §7.4.3): rewrite ONLY the id-hash
    * buckets named in `affected`; every other bucket is carried forward by
    * a [[Carry]] manifest entry pointing at the dir that physically holds
    * it (fully resolved — a bucket carried across ten commits still
    * records its one physical owner). At 100 TB a point upsert writes 1 of
    * `numBuckets` buckets plus one O(buckets) metadata file — no link
    * walk, no object-store copy storm. The meta.json swap stays atomic,
    * so readers see either the old or the new version, never a mix.
    *
    * @param mergedAffected replacement rows for the affected buckets only
    *                       (must already be exactly those buckets' content)
    */
  private def writeMergedVersion(
      mergedAffected: DataFrame, affected: Set[Int], expected: CollectionMeta,
      beforeCommit: () => Unit = () => ()): Unit = {
    val m = expected
    val next = claimNext(m)
    val newDir = dataDir(next.version)
    try {
      bucketed(mergedAffected.drop("pt")).write.mode("overwrite")
        .option("maxRecordsPerFile", maxRowsPerFile)
        .partitionBy("pt").parquet(newDir.toString)
      val carryEntries = Carry.owners(io, dir, dataDir(m.version), "pt=")
        .filterNot { case (part, _) =>
          affected.contains(part.stripPrefix("pt=").toInt) }
        .map { case (part, owner) => part -> owner.getName }
      Carry.write(io, newDir, carryEntries)
      beforeCommit()
    } catch { case e: Throwable => abandon(next); throw e }
    commit(next)
  }

  /** Distinct id-hash buckets hit by a batch (small driver-side collect). */
  private def bucketsOf(df: DataFrame): Set[Int] =
    bucketed(df).select("pt").distinct().collect().map(_.getInt(0)).toSet

  /** ONE job for both facts every mutation needs about its batch: the
    * id-hash buckets it touches (partition pruning) and whether any id
    * repeats within it. A repeated id always hashes to the same bucket, so
    * per-bucket `count vs count_distinct` detects the repeat without a
    * per-id grouping — the collect is ≤numBuckets rows regardless of batch
    * size. The offending id (error-path only) is looked up separately. */
  private def bucketStats(df: DataFrame): (Set[Int], Boolean) = {
    // count(id) counts NON-NULL ids: comparing count(*) against the
    // distinct count would misread a single null id as a "duplicate".
    // Null ids are detected as n != total per bucket (xxhash64 hashes a
    // NULL to a seed value, so a null id lands in an ordinary bucket) and
    // rejected loudly: the old per-id grouping silently admitted them,
    // and a keyed store with a null key corrupts every id-pruned read.
    val rows = bucketed(df).groupBy("pt")
      .agg(org.apache.spark.sql.functions.count(col("id")).as("n"),
        countDistinct(col("id")).as("d"),
        org.apache.spark.sql.functions.count(lit(1)).as("tot")).collect()
    if (rows.exists(r => r.getLong(1) != r.getLong(3)))
      throw new IllegalArgumentException(
        "null id in batch — collection ids must be non-null")
    (rows.map(_.getInt(0)).toSet, rows.exists(r => r.getLong(1) != r.getLong(2)))
  }

  /** Error path only: find one repeated id for the exception message. */
  private def firstDupId(df: DataFrame): String = {
    val d = df.groupBy("id").count().filter(col("count") > 1).limit(1).collect()
    String.valueOf(d.headOption.map(_.get(0)).orNull)
  }

  /** B1 add: batch insert; errors on duplicate ids (within the batch or vs
    * the collection) — Chroma `add()` semantics. Only the buckets receiving
    * new rows are rewritten.
    *
    * @param beforeCommit invoked AFTER the data write but BEFORE the commit
    *        marker: a throw abandons the version (nothing is ever served).
    *        This is the hook for single-scan invariants — attach an
    *        `observe()` to the batch, let the write be the scan, and reject
    *        the commit from the collected metrics (see [[graft.Hydrator]])
    *        instead of paying validation passes over the input up front.
    */
  def add(batch: DataFrame, beforeCommit: () => Unit = () => ()): Unit = {
    val m = meta
    val (affected, withinDup) = bucketStats(batch)
    if (withinDup)
      throw new IllegalArgumentException(s"duplicate id in batch: ${firstDupId(batch)}")
    currentDataOf(m) match {
      case None => writeVersion(batch, m, beforeCommit = beforeCommit)
      case Some(_) =>
        // clashes can only live in the batch's own buckets — probe those,
        // not the whole collection (point-inserts must stay O(affected)).
        // The probe is an observe() metric on the merge's own join, so the
        // pruned buckets are scanned exactly once: a clash abandons the
        // claimed version pre-commit (never served), same outcome as the
        // old pre-write check but one full pass cheaper.
        val curAffected = currentWithPtOf(m).filter(col("pt").isin(affected.toSeq: _*)).drop("pt")
        // the batch appears ONCE in the write plan (callers may have hung an
        // observe() on it — Hydrator does — and a second reference would
        // re-fire its metrics); the probe side is the pruned current scan,
        // column-pruned to id only
        val obs = Observation()
        val flaggedBatch = batch
          .join(curAffected.select(col("id"), lit(1).as("__clash")), Seq("id"), "left")
          .observe(obs, sum(col("__clash")).as("clashes"))
          .drop("__clash")
        writeMergedVersion(
          curAffected.unionByName(flaggedBatch, allowMissingColumns = true), affected, m,
          beforeCommit = () => {
            // fail CLOSED: only an empty batch (sum over zero rows = null)
            // may read as "no clash" — a missing or mistyped metric must
            // abort the commit, not silently admit a duplicate id
            val clashes = obs.get.get("clashes") match {
              case Some(l: java.lang.Long) => l.longValue()
              case Some(null) => 0L
              case other => throw new IllegalStateException(
                s"clash-probe metric missing or mistyped: $other")
            }
            if (clashes > 0L) {
              val clash = batch.join(curAffected.select("id"), Seq("id"), "left_semi")
                .limit(1).collect()
              throw new IllegalArgumentException(
                s"id already exists: ${String.valueOf(clash.headOption.map(_.get(0)).orNull)}")
            }
            beforeCommit()
          })
    }
    maybeAutoCompact()
  }

  /** Replace the collection's ENTIRE contents with `batch` as ONE MVCC
    * commit — the atomic whole-collection refresh behind
    * `df.write.format("graft").mode("overwrite")`. Unlike delete +
    * recreate, the previous version stays committed (and served) until
    * the new version's marker lands: a batch that fails the gates
    * (in-batch duplicate or null ids) or a Spark job that dies mid-write
    * abandons the claimed version and leaves the last committed state —
    * data, history, indexes — intact. Superseded versions and
    * version-stale index builds become history; reclaim with [[vacuum]].
    *
    * `space` optionally re-points the distance space WITH the same
    * commit (the delete-and-recreate this replaces applied the caller's
    * space too; a replace makes every index build version-stale anyway,
    * so the re-point cannot strand a served index). Collection identity
    * — name, bucket count, metadata — survives the replace, EXCEPT any
    * recorded embedding-function binding (`embedding_function` /
    * `embedding_model_fp` + the fitted sidecar): the replacing batch's
    * vectors are caller-provided, so a surviving binding would let
    * queryText embed queries with a function the stored vectors never
    * came from — silently meaningless distances (the old delete+recreate
    * destroyed the binding too). After a replace, queryText fails loudly
    * until re-bound (addDocuments / a fresh fit). */
  def replaceContents(batch: DataFrame, space: Option[String] = None): Unit = {
    val m = meta
    // validate BEFORE any write work: a typo'd space must not commit
    // (creation validates through the same gate)
    space.foreach(Collection.requireSpace)
    val (_, withinDup) = bucketStats(batch)
    if (withinDup)
      throw new IllegalArgumentException(s"duplicate id in batch: ${firstDupId(batch)}")
    val hadBinding = m.metadata.contains("embedding_function")
    val newSpace = space.getOrElse(m.space)
    val cleared0 = m.metadata -- Seq("embedding_function", "embedding_model_fp")
    // an explicit re-point rewrites the Chroma-convention hnsw:space
    // mirror in the SAME commit: a stale mirror would both mislead
    // convention readers and make the next modifyMetadata restating it
    // fail the space-consistency gate
    val cleared =
      if (cleared0.contains("hnsw:space") && newSpace != m.space)
        cleared0 + ("hnsw:space" -> newSpace)
      else cleared0
    writeVersion(batch, m.copy(space = newSpace, metadata = cleared))
    // the fitted-model sidecar pairs with the cleared fingerprint:
    // reclaim it post-commit, best-effort (an orphan is dormant without
    // a metadata binding, and a fresh fitted bind writes its own)
    if (hadBinding)
      io.deleteIfExists(new Path(dir, Collection.EmbedderSidecar))
    maybeAutoCompact()
  }

  /** Server-side embedding add — `collection.add(documents=...)` WITHOUT
    * precomputed vectors, the one public chromadb call shape the reference
    * never exercises (it always passes vectors, sas:177-190). The
    * embedding is a compiled per-row expression ([[graft.expressions
    * .HashEmbed]]) riding the add's own write scan: no extra pass, no
    * shuffle. The function's name is recorded in collection metadata
    * (`embedding_function`), chromadb-style, so [[queryText]] later
    * resolves the exact same function — and a second addDocuments with a
    * DIFFERENT function is rejected (vectors from two functions in one
    * collection compare as garbage, silently).
    *
    * Cosine space rejects zero-vector documents pre-commit (cosine is
    * undefined on them; Chroma's normalization raises the same way) via an
    * `observe()` on the write scan — detection costs no extra pass and a
    * rejection abandons the claimed version, nothing is ever served. */
  def addDocuments(batch: DataFrame, ef: EmbeddingFunction,
                   beforeCommit: () => Unit = () => ()): Unit = {
    require(!batch.columns.contains("embedding"),
      "addDocuments embeds server-side — use add() for precomputed vectors")
    require(batch.columns.contains("document"),
      "addDocuments needs a 'document' column to embed")
    val hadBinding = meta.metadata.get("embedding_function") match {
      case Some(n) =>
        require(n == ef.name,
          s"collection '$name' is bound to embedding function '$n', got '${ef.name}'")
        true
      case None => false
    }
    // FITTED functions carry corpus-learned state: when the collection is
    // already bound, the offered MODEL must equal the persisted sidecar
    // (same name is not enough — a re-fit on different data embeds
    // differently, and mixing its vectors with stored ones is silent
    // garbage). Checked BEFORE any embedding work.
    ef match {
      case f: graft.operators.FittedEmbeddingFunction if hadBinding =>
        val sidecar = new Path(dir, Collection.EmbedderSidecar)
        require(io.exists(sidecar),
          s"collection '$name' is bound to fitted '${ef.name}' but its model sidecar is missing")
        require(new String(io.readBytes(sidecar), StandardCharsets.UTF_8) == f.modelText,
          s"collection '$name' already carries a fitted model for '${ef.name}' and the " +
            "offered model DIFFERS — a re-fit would make previously stored vectors " +
            "unqueryable; create a fresh collection to re-fit")
      case _ => ()
    }
    // the same guard add() enforces for explicit vectors, checked BEFORE
    // any embedding work: a function of a different dimension would commit
    // a ragged store whose kNN reads return null-distance garbage
    dim().foreach { d =>
      require(d == ef.dim,
        s"embedding function dim ${ef.dim} != collection dimension $d")
    }
    // embedFrame: the compiled-expression embedders keep the zero-extra-
    // pass column path; a ModelEmbeddingFunction takes its per-partition
    // BATCHED inference shape here instead
    val embedded = ef.embedFrame(batch, "document", "embedding")
    // Null-document gate for EVERY space (chromadb raises on None
    // documents too): HashEmbed is null-safe, so a null document would
    // otherwise commit a null embedding silently — and null distances
    // sort NULLS FIRST under the ascending kNN order, so ONE such row
    // poisons the top-k of every later query. Same single-scan observe
    // discipline as the clash probe: detection rides the write, a
    // rejection abandons the claimed version pre-commit.
    val obs = Observation()
    val nullEmb = sum(when(col("embedding").isNull, 1L).otherwise(0L)).as("null_embeds")
    // zero-vector probe must not trip on nulls (exists(NULL) -> NULL):
    // nulls are counted — and rejected — by their own metric
    val zeroVec = col("embedding").isNotNull &&
      not(exists(col("embedding"), x => x =!= lit(0.0f)))
    val zeroCnt = sum(when(zeroVec, 1L).otherwise(0L)).as("zero_vecs")
    // fail CLOSED, like the add clash probe: a missing metric aborts;
    // only an empty batch (sum over zero rows = null) reads as clean
    def metric(name: String): Long = obs.get.get(name) match {
      case Some(l: java.lang.Long) => l.longValue()
      case Some(null) => 0L
      case other => throw new IllegalStateException(
        s"$name probe metric missing or mistyped: $other")
    }
    def gateNulls(): Unit = {
      val nulls = metric("null_embeds")
      require(nulls == 0L,
        s"$nulls document(s) are null — collection documents must be non-null " +
          "(chromadb add() rejects None documents the same way)")
    }
    if (space == "cosine") {
      add(embedded.observe(obs, nullEmb, zeroCnt),
        beforeCommit = () => {
          gateNulls()
          val zeros = metric("zero_vecs")
          require(zeros == 0L,
            s"$zeros document(s) embed to the zero vector — cosine distance is undefined; " +
              "drop them or use l2/ip space")
          beforeCommit()
        })
    } else add(embedded.observe(obs, nullEmb),
      beforeCommit = () => { gateNulls(); beforeCommit() })
    // binding recorded only AFTER a successful add: a rejected batch
    // (zero vectors, id clash) must not leave a permanent function
    // binding on a collection that stored nothing. Single-writer store
    // (the commit protocol serializes writers), so the stamp cannot race
    // another function's successful add. For a FITTED function the model
    // sidecar lands FIRST (binding implies sidecar; a crash in between
    // leaves an unbound collection whose orphan sidecar the next
    // successful bind overwrites).
    if (!hadBinding) {
      ef match {
        case f: graft.operators.FittedEmbeddingFunction =>
          io.writeBytes(new Path(dir, Collection.EmbedderSidecar),
            f.modelText.getBytes(StandardCharsets.UTF_8))
          // the fingerprint pairs the committed DATA with the model that
          // embedded it — [[resolveEmbedder]] refuses a sidecar whose
          // fingerprint disagrees (the refit crash-window detector)
          modifyMetadata(Map("embedding_function" -> ef.name,
            "embedding_model_fp" -> Collection.modelFp(f.modelText)))
        case _ =>
          modifyMetadata(Map("embedding_function" -> ef.name))
      }
    }
  }

  /** The SANCTIONED re-fit path for a fitted embedding function — the
    * counterpart of the re-fit REJECTION in [[addDocuments]] (an
    * unsanctioned second fit would silently mix vectors from two models;
    * this one re-embeds so it cannot): train a fresh model of the same
    * family and dimension on the CURRENT corpus, re-embed every document
    * through it (a full rewrite — the data-side analog of a
    * [[buildIndex]] re-train), and swap model sidecar + fingerprint with
    * the same commit.
    *
    * Crash safety: the sidecar lands between the data write and the
    * commit marker, and the new model's fingerprint rides the commit's
    * OWN meta (claim file + pointer). A crash after the sidecar write
    * but before the marker leaves old data + old fingerprint + NEW
    * sidecar — and [[resolveEmbedder]] then fails LOUD on the
    * fingerprint mismatch instead of silently querying old vectors with
    * the new model. Re-running refit() recovers.
    *
    * Indexes of the previous version are version-bound and simply stop
    * matching (reads fall back to exact until rebuilt) — same rule as
    * every mutation. Callers still holding the PRE-refit function object
    * get rejected loudly on their next addDocuments (model text differs
    * from the new sidecar). Returns the newly fitted function. */
  def refit(vocabSize: Int = Embedder.DefaultVocabSize): graft.operators.FittedEmbeddingFunction = {
    val m = meta
    val efName = m.metadata.getOrElse("embedding_function",
      throw new IllegalStateException(
        s"collection '$name' has no embedding-function binding — nothing to re-fit"))
    require(efName.startsWith(Embedder.TfIdfV1Prefix),
      s"collection '$name' is bound to '$efName', which is not a fitted " +
        "function family — only fitted functions re-fit")
    require(currentDataOf(m).nonEmpty,
      s"collection '$name' is empty — nothing to re-fit on")
    val cur = snapshotDF(m)
    require(cur.columns.contains("document"),
      s"collection '$name' carries no document column — nothing to re-fit on")
    // same family, same dimension: the binding NAME stays, the model
    // behind it changes (dim changes would be a different binding)
    val dim = resolveEmbedder(efName).dim
    val ef = graft.operators.TfIdfSrpEmbedder.fit(cur, "document", dim, vocabSize)
    val expected = m.copy(metadata =
      m.metadata + ("embedding_model_fp" -> Collection.modelFp(ef.modelText)))
    // in-place column REPLACE (refit's ef is always the fitted TF-IDF
    // family — compiled column path; embedFrame would append at the end
    // and silently reorder the stored layout)
    writeVersion(cur.withColumn("embedding", ef.embedText(col("document"))),
      expected, repack = true,
      beforeCommit = () => io.writeBytes(new Path(dir, Collection.EmbedderSidecar),
        ef.modelText.getBytes(StandardCharsets.UTF_8)))
    ef
  }

  /** Resolve the collection's recorded embedding-function name: stateless
    * families by name; FITTED families (tfidf) through the persisted
    * model sidecar — LOUD when the sidecar is missing or names disagree
    * (a wrong model silently yields garbage distances, never an error).
    */
  private def resolveEmbedder(efName: String): EmbeddingFunction =
    if (efName.startsWith(Embedder.TfIdfV1Prefix)) {
      val sidecar = new Path(dir, Collection.EmbedderSidecar)
      require(io.exists(sidecar),
        s"collection '$name' records fitted embedding function '$efName' " +
          "but its model sidecar is missing")
      val text = new String(io.readBytes(sidecar), StandardCharsets.UTF_8)
      // the committed meta's fingerprint pairs data with the model that
      // embedded it: a sidecar from a DIFFERENT fit (a refit that crashed
      // between sidecar write and commit, a hand-replaced file) must fail
      // LOUD here — stale-model queries would otherwise return garbage
      // distances with no error
      meta.metadata.get("embedding_model_fp").foreach { fp =>
        require(Collection.modelFp(text) == fp,
          s"collection '$name' records fitted-model fingerprint $fp but the " +
            s"sidecar's is ${Collection.modelFp(text)} — the model sidecar is " +
            "stale relative to the committed data (a refit crashed mid-swap, " +
            "or the sidecar was replaced); re-run refit() or restore the " +
            "matching sidecar")
      }
      val ef = Embedder.fromModelText(text)
      require(ef.name == efName,
        s"model sidecar is for '${ef.name}' but the collection records '$efName'")
      ef
    } else Embedder.fromName(efName)

  /** `query(query_texts=...)`: embed the texts driver-side with the
    * collection's RECORDED embedding function (never a caller-supplied
    * one — the binding is what guarantees query vectors and stored
    * vectors come from the same function), then the standard vector read
    * path: index-pruned, prefiltered, batched. */
  def queryText(texts: Seq[String], k: Int, where: Option[Where] = None,
                whereDoc: Option[WhereDocument] = None, nprobe: Int = 0,
                exact: Boolean = false): DataFrame = {
    require(texts.nonEmpty, "queryText needs at least one query text")
    val efName = meta.metadata.getOrElse("embedding_function",
      throw new IllegalStateException(
        s"collection '$name' has no registered embedding function — " +
          "hydrate via addDocuments, or query with explicit vectors"))
    val ef = resolveEmbedder(efName)
    val vecs = texts.map(t => ef.embedOne(t))
    // mirror the add-side gate: a zero query vector in cosine space would
    // make every distance NaN and the rank window would return k
    // arbitrary rows — reject loudly instead (symmetry with addDocuments)
    if (space == "cosine") vecs.zip(texts).foreach { case (v, t) =>
      require(v.exists(_ != 0f),
        s"query text '$t' embeds to the zero vector — cosine distance is undefined")
    }
    queryBatch(vecs, k, where, whereDoc, nprobe, exact)
  }

  /** `query(query_texts=...)` through the PQ-coded index: embed with the
    * collection's RECORDED function ([[queryText]]'s binding rule, zero-
    * vector gate included), then [[queryPqBatch]]'s codes-only ADC scan +
    * exact refine — the memory-side read path for text queries against a
    * hydrated-with-embedding-function collection. LOUD without a
    * committed PQ build (queryPqBatch's contract). */
  def queryTextPq(texts: Seq[String], k: Int, nprobe: Int = 0, fetchN: Int = 0,
                  where: Option[Where] = None,
                  whereDoc: Option[WhereDocument] = None): DataFrame = {
    require(texts.nonEmpty, "queryTextPq needs at least one query text")
    val efName = meta.metadata.getOrElse("embedding_function",
      throw new IllegalStateException(
        s"collection '$name' has no registered embedding function — " +
          "hydrate via addDocuments, or query with explicit vectors"))
    val ef = resolveEmbedder(efName)
    val vecs = texts.map(t => ef.embedOne(t))
    if (space == "cosine") vecs.zip(texts).foreach { case (v, t) =>
      require(v.exists(_ != 0f),
        s"query text '$t' embeds to the zero vector — cosine distance is undefined")
    }
    queryPqBatch(vecs, k, nprobe, fetchN, where, whereDoc)
  }

  /** [[queryStruct]] from TEXT queries — chromadb's
    * `query(query_texts=..., include=...)` returns the same parallel-list
    * shape as its vector form; this embeds through the recorded binding
    * ([[queryText]]'s rule, zero-vector gate included) and folds through
    * the one shared presentation path. */
  def queryTextStruct(texts: Seq[String], k: Int,
                      where: Option[Where] = None,
                      whereDoc: Option[WhereDocument] = None,
                      include: Set[String] = Set("documents", "distances", "metadatas"),
                      nprobe: Int = 0, exact: Boolean = false): DataFrame = {
    require(texts.nonEmpty, "queryTextStruct needs at least one query text")
    val efName = meta.metadata.getOrElse("embedding_function",
      throw new IllegalStateException(
        s"collection '$name' has no registered embedding function — " +
          "hydrate via addDocuments, or query with explicit vectors"))
    val ef = resolveEmbedder(efName)
    val vecs = texts.map(ef.embedOne)
    if (space == "cosine") vecs.zip(texts).foreach { case (v, t) =>
      require(v.exists(_ != 0f),
        s"query text '$t' embeds to the zero vector — cosine distance is undefined")
    }
    queryStruct(vecs, k, where, whereDoc, include, nprobe, exact)
  }

  /** Diversity-aware top-k (Maximal Marginal Relevance) over the store:
    * the candidate fetch takes the SAME pruned path as [[query]] (IVF
    * cells when a committed index matches, postings-confined whereDoc,
    * verbatim prefilters), then [[Retrieval.mmr]]'s bounded greedy
    * re-ranks the fetchN survivors. Cosine-space only — MMR's redundancy
    * term is a similarity, and mixing it with l2/ip relevance has no
    * standard semantics. */
  def queryMmr(queryVec: Seq[Float], k: Int, fetchN: Int = 100,
               lambda: Double = 0.5, where: Option[Where] = None,
               whereDoc: Option[WhereDocument] = None, nprobe: Int = 0,
               exact: Boolean = false): DataFrame = {
    require(space == "cosine",
      s"queryMmr requires a cosine-space collection, got '$space'")
    requireDim(queryVec.length)
    val m = meta
    val base = ivfOrScan(m, exact) match {
      case Some((idxPath, cents)) =>
        val cells = Ann.nearestCellsOf(cents, queryVec, resolveNprobe(m, nprobe))
        readIndexBuild(idxPath)
          .filter(col("cell").isin(cells: _*)).drop(indexLayoutCols(idxPath): _*)
      case None => snapshotDF(m)
    }
    val confined = docIndexConfine(base, m, whereDoc)
    val filtered = ChromaFilter.predicate(where, whereDoc, col("document"),
      keyResolver(confined)).map(confined.filter).getOrElse(confined)
    Retrieval.mmr(filtered, "id", "embedding", queryVec, k, fetchN, lambda)
      .withColumnRenamed("score", "mmr_score")
  }

  /** [[queryMmr]] from a TEXT query — the LangChain-on-Chroma
    * `max_marginal_relevance_search` call shape: the text embeds through
    * the collection's RECORDED embedding function (same binding rule as
    * [[queryText]] — never a caller-supplied one), then the standard MMR
    * path: pruned candidate fetch, bounded greedy re-rank. Cosine-only,
    * like queryMmr; the zero-vector gate mirrors queryText's. */
  def queryMmrText(text: String, k: Int, fetchN: Int = 100,
                   lambda: Double = 0.5, where: Option[Where] = None,
                   whereDoc: Option[WhereDocument] = None, nprobe: Int = 0,
                   exact: Boolean = false): DataFrame = {
    val efName = meta.metadata.getOrElse("embedding_function",
      throw new IllegalStateException(
        s"collection '$name' has no registered embedding function — " +
          "hydrate via addDocuments, or use queryMmr with an explicit vector"))
    val v = resolveEmbedder(efName).embedOne(text)
    require(v.exists(_ != 0f),
      s"query text '$text' embeds to the zero vector — cosine distance is undefined")
    queryMmr(v, k, fetchN, lambda, where, whereDoc, nprobe, exact)
  }

  /** B2 upsert: insert-or-replace by id; within-batch duplicates resolve
    * latest-wins by `orderCol` descending. Without an orderCol the winner is
    * arbitrary but DETERMINISTIC (content-hash order, independent of
    * partition layout) — a replayed microbatch picks the same row, which a
    * monotonically_increasing_id tie-break would not guarantee. Only
    * affected buckets are rewritten. */
  def upsert(batch: DataFrame, orderCol: Option[String] = None): Unit = {
    val contentOrder = xxhash64(struct(batch.columns.map(col): _*))
    val w = Window.partitionBy("id")
      .orderBy(orderCol.map(c => col(c).desc).getOrElse(contentOrder.desc))
    val dedupBatch = batch.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val m = meta
    // bucketStats, not bucketsOf: its null-id rejection must cover the
    // upsert path too (a null-keyed row would survive every later
    // left_anti merge — null == null never matches — and accumulate).
    // Its dup flag is ignored: within-batch dups are upsert's JOB to
    // resolve. Probing the RAW batch skips one window computation — the
    // dedup preserves the id set, so the buckets are identical.
    val (affected, _) = bucketStats(batch.select("id"))
    currentDataOf(m) match {
      case None => writeVersion(dedupBatch, m)
      case Some(_) =>
        val curAffected = currentWithPtOf(m).filter(col("pt").isin(affected.toSeq: _*)).drop("pt")
        val merged = curAffected.join(dedupBatch.select("id"), Seq("id"), "left_anti")
          .unionByName(dedupBatch, allowMissingColumns = true)
        writeMergedVersion(merged, affected, m)
    }
    maybeAutoCompact()
  }

  /** B3 update: replace non-null fields for EXISTING ids only. Only the
    * buckets containing updated ids are rewritten. */
  def update(batch: DataFrame): Unit = { val m = meta; currentDataOf(m).foreach { _ =>
    val (affected, dup) = bucketStats(batch.select("id"))
    if (dup) throw new IllegalArgumentException(
      s"duplicate id in update batch: ${firstDupId(batch)} — the left join would fan out")
    val cur = currentWithPtOf(m).filter(col("pt").isin(affected.toSeq: _*)).drop("pt")
    val upd = batch.columns.filter(_ != "id")
    val joined = cur.alias("c").join(batch.alias("u"), Seq("id"), "left")
    val merged = joined.select(
      col("id") +: cur.columns.filter(_ != "id").map { c =>
        if (upd.contains(c)) coalesce(col(s"u.$c"), col(s"c.$c")).as(c) else col(s"c.$c").as(c)
      }: _*)
    writeMergedVersion(merged, affected, m)
    maybeAutoCompact()
  } }

  /** B4 delete by id list and/or metadata predicate. Conditions COMBINE
    * WITH AND (Chroma semantics, matching `get`): an id list plus a `where`
    * deletes only the listed ids that ALSO satisfy the predicate — OR here
    * would turn a caller's restriction into a mass delete. Affected buckets
    * are discovered with one pruned scan; only buckets losing rows rewrite. */
  def delete(ids: Seq[String] = Nil, where: Option[Where] = None,
             whereDoc: Option[WhereDocument] = None): Unit = {
    val m = meta
    currentDataOf(m).foreach { _ =>
      val cur0 = currentWithPtOf(m)
      val byIds: Option[Column] = if (ids.nonEmpty) Some(col("id").isin(ids: _*)) else None
      val byPred = ChromaFilter.predicate(where, whereDoc, col("document"),
        keyResolver(cur0.drop("pt")))
      val cond = (byIds.toSeq ++ byPred.toSeq).reduceOption(_ && _)
      cond.foreach { c =>
        // id lists AND with the predicate, so the affected-bucket discovery
        // scan itself prunes to the ids' own partitions (1/numBuckets of
        // the listing for a point delete)
        val scan0 =
          if (ids.isEmpty) cur0
          else ptBucketsOf(cur0, ids).fold(cur0)(pts => cur0.filter(col("pt").isin(pts: _*)))
        val affected = scan0.filter(coalesce(c, lit(false)))
          .select("pt").distinct().collect().map(_.getInt(0)).toSet
        if (affected.nonEmpty) {
          val cur = cur0.filter(col("pt").isin(affected.toSeq: _*)).drop("pt")
          writeMergedVersion(cur.filter(!coalesce(c, lit(false))), affected, m)
          maybeAutoCompact()
        }
      }
    }
  }

  /** Chroma-faithful `where` key resolution: a key names a metadata entry.
    * Flat columns (the pushdown-friendly layout) resolve directly; a
    * `MAP<STRING,STRING>` metadata column resolves misses via element_at.
    *
    * DECLARED TYPES (Chroma metadata is str/int/float/bool, the map layout
    * stores strings): a collection-metadata entry `meta:type:<key>` =
    * long|double|boolean ([[declareMetadataTypes]]) makes the map lookup
    * `try_cast` to that type, so `$eq` on an int compares as int and
    * `$eq(flag, true)` works at all — without it a boolean literal against
    * a string map value is an ANSI cast error, and ints fall back to the
    * numeric-literal double route. try_cast keeps Chroma's typed
    * semantics: a stored value that doesn't parse simply doesn't match.
    * The lazy `declared` reads collection metadata at most once per query
    * and ONLY when a map lookup actually resolves — flat typed layouts
    * (the 100 TB-preferred one, full pushdown) never pay the meta read. */
  private def keyResolver(df: DataFrame): ChromaFilter.KeyResolver = {
    lazy val declared: Map[String, String] = meta.metadata.collect {
      case (k, t) if k.startsWith(Collection.MetaTypePrefix) =>
        k.stripPrefix(Collection.MetaTypePrefix) -> t
    }
    key =>
      if (df.columns.contains(key)) col(key)
      else if (df.columns.contains("metadata")) {
        val raw = element_at(col("metadata"), key)
        declared.get(key).fold(raw)(t => raw.try_cast(t))
      } else col(key)
  }

  /** Record Chroma's per-key metadata TYPES for the map layout, so `where`
    * filters compare typed ([[keyResolver]]). Flat typed columns don't
    * need this — their parquet types ARE the declaration; this is for
    * migrating users carrying Chroma's metadata dict as one map column. */
  def declareMetadataTypes(types: Map[String, String]): Unit = {
    val bad = types.values.toSet.diff(Set("string", "long", "double", "boolean"))
    require(bad.isEmpty,
      s"unsupported metadata types: ${bad.mkString(", ")} (string|long|double|boolean)")
    modifyMetadata(types.map { case (k, t) => (s"${Collection.MetaTypePrefix}$k", t) })
  }

  /** B5 get: point/filtered retrieval, deterministically paged by id.
    *
    * When a committed [[buildDocIndex postings index]] matches the current
    * version and `whereDoc` is gram-confinable, the scan is first confined
    * to the index's candidate ids (a left-semi join against the pruned
    * postings read); the verbatim predicate is ALWAYS still applied, so
    * the index can only shrink IO, never change the result.
    *
    * `include` is Chroma's projection contract (`include=["documents",
    * "metadatas", ...]`) made SCAN-real: None (default) returns every
    * stored column (the long-form contract so far); Some(set) projects to
    * id + the requested families BEFORE the page materializes, so
    * Catalyst's column pruning drops the unrequested columns from the
    * parquet ReadSchema itself. At 100 TB the embedding column IS the
    * collection's bulk — a documents+metadatas get must not read a single
    * embedding byte (GetIncludeSpec pins the pruned ReadSchema; filter
    * columns are still read, they gate the rows). Entries: `documents`,
    * `embeddings`, `metadatas` (= every stored column that isn't
    * id/document/embedding/uri/data, i.e. the flat typed layout, plus a
    * `metadata` map column when present), `uris`, `data`. */
  def get(ids: Seq[String] = Nil, where: Option[Where] = None,
          whereDoc: Option[WhereDocument] = None,
          limit: Option[Int] = None, offset: Int = 0,
          include: Option[Set[String]] = None): DataFrame = {
    // one meta snapshot for BOTH the data read and the index adoption: a
    // fresh re-read for the index could adopt a newer version than the
    // data scan and confine it with the wrong posting lists
    val m = meta
    // id point reads prune at the PARTITION level first: the id filter is
    // verbatim on top, so pruning can only shrink IO, never the result
    var df = if (ids.nonEmpty && currentDataOf(m).isDefined) {
      val cur = currentWithPtOf(m)
      ptBucketsOf(cur, ids)
        .fold(cur)(pts => cur.filter(col("pt").isin(pts: _*)))
        .drop("pt").filter(col("id").isin(ids: _*))
    } else {
      val base = snapshotDF(m)
      if (ids.nonEmpty) base.filter(col("id").isin(ids: _*)) else base
    }
    df = docIndexConfine(df, m, whereDoc)
    ChromaFilter.predicate(where, whereDoc, col("document"), keyResolver(df))
      .foreach(p => df = df.filter(p))
    // include projection BEFORE the sort/page: the select is what lets
    // Catalyst prune the scan — projecting after limit would be
    // presentation-only and still read the dropped columns
    include.foreach { inc =>
      val unknown = inc.diff(Set("documents", "embeddings", "metadatas", "uris", "data"))
      require(unknown.isEmpty, s"unknown include entries: ${unknown.mkString(", ")}")
      val reserved = Seq("id", "document", "embedding", "uri", "data")
      def ifHas(flag: String, c: String) =
        if (inc(flag) && df.columns.contains(c)) Seq(c) else Nil
      val metaCols =
        if (inc("metadatas")) df.columns.toSeq.filterNot(reserved.contains).sorted
        else Nil
      val keep = Seq("id") ++ ifHas("documents", "document") ++
        ifHas("embeddings", "embedding") ++ ifHas("uris", "uri") ++
        ifHas("data", "data") ++ metaCols
      df = df.select(keep.map(c => col(s"`$c`")): _*)
    }
    df = df.orderBy("id")
    if (offset > 0) df = df.offset(offset)
    limit.fold(df)(df.limit)
  }

  /** Chroma result-SHAPE parity for `get`: ONE row of parallel id-ordered
    * lists (`ids`, and under `include=` control `documents`, `embeddings`,
    * `metadatas` — get has no distances). Same presentation-only fold as
    * [[queryStruct]]; the page (`ids`/`where`/`limit`/`offset`) is bounded
    * by construction, so the single collect_list row is never corpus-sized
    * unless the caller asked for the whole corpus — exactly Chroma's own
    * contract (its get() materializes the full result client-side too). */
  def getStruct(ids: Seq[String] = Nil, where: Option[Where] = None,
                whereDoc: Option[WhereDocument] = None,
                limit: Option[Int] = None, offset: Int = 0,
                include: Set[String] = Set("documents", "metadatas")): DataFrame = {
    val unknown = include.diff(Set("documents", "embeddings", "metadatas", "uris", "data"))
    require(unknown.isEmpty, s"unknown include entries: ${unknown.mkString(", ")}")
    // push the include down to the long form so the scan pruning is real
    // (a documents+metadatas getStruct never reads the embedding column)
    val page = get(ids, where, whereDoc, limit, offset, Some(include))
    val fields: Seq[FoldField] =
      ("id", "ids", col("id")) +:
      (docField(page, include("documents")) ++
        (if (include("embeddings")) Seq(("embedding", "embeddings", col("embedding"))) else Nil) ++
        uriDataFields(page, include) ++
        metaField(page, include("metadatas"),
          exclude = Seq("id", "document", "embedding", "uri", "data")))
    // ids are unique, so a three-way string compare on the id alone is a
    // valid total order (the MAP field never enters the comparator)
    val rows = sortedRows(page, Nil, col("id"),
      (l, r) => when(l < r, -1).when(l > r, 1).otherwise(0), fields)
    extractLists(rows, Nil, fields)
  }

  // ---- IVF index: the collection's kNN scale path (SURVEY §4.3.3) ----
  //
  // Chroma serves `query()` from a single-node HNSW segment; the Spark-
  // native equivalent is a derived, CELL-partitioned copy of the data:
  //
  //   <dir>/index_v<V>.b<B>/cell=<c>/...parquet  (V = data version indexed,
  //   <dir>/index_v<V>.b<B>/_ivf_centroids.txt    B = build number)
  //   <dir>/index_v<V>.b<B>/_graft_committed     (written LAST)
  //
  // The index is valid only while meta.version == V: any mutation bumps the
  // version and the read path silently falls back to the exact scan until
  // `buildIndex` runs again — approximate answers are never served from
  // stale data, and a crashed build (no marker) is never adopted. Builds
  // follow the same MVCC discipline as data versions: each `buildIndex`
  // claims a FRESH build dir (`O_CREAT|O_EXCL` directory create = the CAS,
  // racing builders get distinct dirs), readers adopt the highest
  // marker-complete build, and nothing is ever deleted in place — a rebuild
  // racing an in-flight reader of the previous build cannot pull files out
  // from under its scan; superseded builds are reclaimed by [[vacuum]].
  // The base store stays id-hash (`pt`) partitioned so merges keep their
  // O(affected-buckets) cost; the index pays one extra corpus copy, the
  // normal price of any secondary index.

  // ---- machinery shared by ALL index families (`index_v` IVF/PQ,
  // `docindex_v` trigram postings, `kwindex_v` keyword stats): ONE
  // claim/adopt/commit discipline parameterized by family name, so a
  // protocol fix (claim race, marker handling, adoption rule) lands
  // once instead of once per family ----

  private def familyPrefix(family: String, v: Int): String = f"${family}_v$v%06d"
  private def familyBuildDir(family: String, v: Int, b: Int): Path =
    new Path(dir, f"${familyPrefix(family, v)}.b$b%03d")

  /** Build number of an index dir name; the legacy unsuffixed
    * `index_v<V>` layout reads as build 0. */
  private def buildNumberOf(p: Path): Int = {
    val n = p.getName
    val dot = n.indexOf(".b")
    if (dot < 0) 0 else n.substring(dot + 2).toInt
  }

  private def familyBuildsOf(family: String, v: Int): Seq[Path] =
    io.list(dir).filter { e =>
      val n = e.name
      e.isDir && (n == familyPrefix(family, v) ||
        n.startsWith(familyPrefix(family, v) + ".b"))
    }.map(_.path)

  /** Highest marker-complete build of one family for one version. */
  private def currentFamilyBuild(family: String, m: CollectionMeta): Option[Path] =
    familyBuildsOf(family, m.version)
      .filter(p => io.exists(new Path(p, "_graft_committed")))
      .sortBy(buildNumberOf).lastOption

  /** Claim the next build dir via O_CREAT|O_EXCL directory create —
    * racing builders each win a DISTINCT number, never share a dir. */
  private def claimFamilyBuild(family: String, version: Int): Path = {
    var b = familyBuildsOf(family, version)
      .map(buildNumberOf).maxOption.fold(0)(_ + 1)
    var claimed: Path = null
    while (claimed == null) {
      try {
        io.createDirExclusive(familyBuildDir(family, version, b))
        claimed = familyBuildDir(family, version, b)
      } catch { case _: java.nio.file.FileAlreadyExistsException => b += 1 }
    }
    claimed
  }

  private def indexPrefix(v: Int): String = familyPrefix("index", v)
  private def indexBuildDir(v: Int, b: Int): Path = familyBuildDir("index", v, b)
  /** Committed index for the CURRENT version: (path, centroids), if any —
    * the highest marker-complete build. Centroid sidecars are parsed once
    * per committed build (they are immutable after the marker lands), not
    * on every query. */
  private def currentIndex(m: CollectionMeta): Option[(Path, Array[(Int, Array[Double])])] =
    currentFamilyBuild("index", m)
      .flatMap { p =>
        Collection.cachedCentroids(io, p, spark.sparkContext.hadoopConfiguration)
          .map(c => (p, c))
      }

  def hasIndex: Boolean = currentIndex(meta).isDefined

  /** The IVF read choice every vector read makes — the committed
    * current-version index, or None for the exact corpus scan. The
    * version-STALE fallback (a build exists, just not for this version)
    * logs loudly via [[warnIfStale]]: correct answers, O(corpus) cost. */
  private def ivfOrScan(m: CollectionMeta,
                        exact: Boolean): Option[(Path, Array[(Int, Array[Double])])] =
    if (exact) None
    else currentIndex(m) match {
      case s @ Some(_) => s
      case None => warnIfStale("index", m); None
    }

  /** Build an IVF index over the current version with k-means centroids
    * (fit on `trainFraction` of the corpus — at scale you never train on
    * all of it; assignment is still exact for every row). The layout
    * carries the store's id bucket as a second partition axis
    * (`cell=<c>/pb=<b>`) so [[refreshIndex]] can later carry unchanged
    * slices forward; queries prune on `cell` alone. */
  def buildIndex(nlist: Int, seed: Long = 42L, trainFraction: Double = 1.0): Unit = {
    val m = indexableMeta()
    val df = currentWithPtOf(m).withColumnRenamed("pt", "pb")
    val ivf = Ann.buildIvf(df, "id", "embedding", nlist, seed, trainFraction)
    val pq = carriedPq(df)
    writeIndex(
      ivf.copy(assigned = pq.fold(ivf.assigned)(
        Ann.pqEncodeFor(ivf.assigned, "embedding", ivf.centroids, _))),
      m.version, pq)
  }

  /** [[buildIndex]] sized by the collection's `ivf:nlist` metadata —
    * Chroma-style collection-level index tuning (their analog:
    * `hnsw:construction_ef`/`hnsw:M` on the collection). Loud when the
    * key is absent: a silent default here would build a mis-sized index. */
  def buildIndex(): Unit = buildIndex(
    metaPositiveInt(meta, "ivf:nlist").getOrElse(
      throw new IllegalArgumentException(
        "collection carries no ivf:nlist metadata — pass nlist explicitly")))

  /** Deterministic IVF build: cells seeded by existing row ids (cell i =
    * the vector of seedIds(i)), argmin-L2 assignment, ties to the lowest
    * cell — the reproducible-anywhere form ([[Ann.buildIvfSeeded]]). */
  def buildIndexSeeded(seedIds: Seq[String]): Unit = {
    val m = indexableMeta()
    val df = currentWithPtOf(m).withColumnRenamed("pt", "pb")
    val ivf = Ann.buildIvfSeededAny(df, "id", "embedding", seedIds)
    // a PQ-coded collection keeps its codes/codebooks through an explicit
    // re-train: a plain rebuild here would strand queryPq() loudly-broken
    val pq = carriedPq(df)
    writeIndex(
      ivf.copy(assigned = pq.fold(ivf.assigned)(
        Ann.pqEncodeFor(ivf.assigned, "embedding", ivf.centroids, _))),
      m.version, pq)
  }

  private def indexableMeta(): CollectionMeta = {
    val m = meta
    require(currentDataOf(m).nonEmpty, s"collection '${m.name}' is empty — nothing to index")
    val clash = currentWithPtOf(m).columns.intersect(Seq("cell", "pb"))
    require(clash.isEmpty,
      s"collection has ${clash.mkString("/")} column(s), which collide with the index layout; rename them")
    m
  }

  private def claimIndexBuild(version: Int): Path =
    claimFamilyBuild("index", version)

  private def writeIndex(model: Ann.IvfModel, version: Int,
                         pq: Option[Ann.PqModel] = None): Unit = {
    val claimed = claimIndexBuild(version)
    // one shuffle BY CELL at build time: without it every write task emits
    // a file into every cell it happens to hold (tasks × nlist small files)
    val packed = model.copy(assigned = model.assigned.repartition(col("cell")))
    Ann.writeIvf(packed, claimed.toString, withPb = true)
    // PQ codebooks ride the build as a second sidecar (like the
    // centroids) — BEFORE the marker, so a committed build always has a
    // complete codebook for its codes column
    pq.foreach(p => Ann.writePqSidecar(claimed, p, spark.sparkContext.hadoopConfiguration))
    io.writeBytes(new Path(claimed, "_graft_committed"), Array.emptyByteArray)
    recordFamily("index")
  }

  /** PQ codebooks of a committed index build (None for a plain IVF one);
    * parsed once per committed build via the sidecar cache. */
  private def pqModelOf(build: Path): Option[Ann.PqModel] =
    Collection.cachedPqModel(io, build, spark.sparkContext.hadoopConfiguration)

  /** The newest committed build's PQ codebooks regardless of version —
    * what any REBUILD must carry forward: a rebuild that dropped them
    * would silently break every queryPq() caller. Plain codebooks are
    * corpus-trained (cell-independent), so re-encoding under new
    * centroids is exactly a fresh encode; RESIDUAL codebooks were
    * trained on the old cells' residuals, so after a re-seed they keep
    * serving (codes re-encode against the new centroids — well-defined,
    * and the exact refine keeps answers correct) but their fit decays
    * with centroid drift — re-run buildIndexPqResidualSeeded to re-train
    * when refreshIndexReport flags drift. */
  private def carriedPq(df: DataFrame): Option[Ann.PqModel] = {
    val pq = newestCommittedBuild("index_v").flatMap(pqModelOf)
    pq.foreach { _ =>
      require(!df.columns.contains("codes"),
        "collection gained a user 'codes' column after its PQ index was built — " +
          "rename it or dropIndex() before rebuilding")
    }
    pq
  }

  /** Deterministic IVF-PQ build (FAISS's IVFPQ, store-side): the seeded
    * IVF layout of [[buildIndexSeeded]] PLUS a `codes` column — every
    * row's m nearest-subcentroid codes under codebooks seeded by
    * `pqSeedIds` rows ([[Ann.buildPqSeeded]]). [[queryPq]] then ADC-scans
    * only (id, codes) inside the probed cells — at 100 TB: nprobe/nlist
    * of the directory listing × m bytes per row, with the raw embedding
    * column left unread until the fetchN refine — where [[query]] reads
    * dim floats per pruned row. Same MVCC build discipline; refresh and
    * compactIndexes carry codes and codebooks along. */
  /** TRAINED store PQ build — the production entry point ([[
    * buildIndexPqSeeded]] exists for oracle replay; hand-picking codebook
    * rows is not a user workflow): k-means cells ([[Ann.buildIvf]], fit on
    * `trainFraction`) + per-subspace k-means codebooks ([[Ann.buildPq]],
    * bounded deterministic sample). Size-aware defaults, all
    * integer-only rules: `ksub = 0` → [[Ann.pqKsubFor]](n); `nlist = 0` →
    * the collection's `ivf:nlist` metadata, else
    * [[graft.operators.Dedup.cellsFor]](n) (occupancy ≈ 250/cell, the
    * same dial the SemDeDup path uses). Same MVCC build discipline and
    * read path as the seeded form — queryPq/queryPqBatch/refresh/compact
    * serve either build identically (the codebook sidecar is the
    * contract, not the trainer). */
  def buildIndexPq(m: Int, ksub: Int = 0, nlist: Int = 0, seed: Long = 42L,
                   trainFraction: Double = 1.0): Unit = {
    val meta0 = indexableMeta()
    val df = currentWithPtOf(meta0).withColumnRenamed("pt", "pb")
    require(!df.columns.contains("codes"),
      "collection has a 'codes' column, which collides with the PQ index layout; rename it")
    val d = dim().getOrElse(throw new IllegalStateException(
      s"collection '$name' is empty — nothing to index"))
    val n = count()
    val ks = if (ksub > 0) ksub else Ann.pqKsubFor(n)
    val nl = if (nlist > 0) nlist
             else metaPositiveInt(meta0, "ivf:nlist")
               .getOrElse(graft.operators.Dedup.cellsFor(n))
    val ivf = Ann.buildIvf(df, "id", "embedding", nl, seed, trainFraction)
    val pq = Ann.buildPq(df, "id", "embedding", d, m, ks, seed)
    writeIndex(ivf.copy(assigned = Ann.pqEncode(ivf.assigned, "embedding", pq)),
      meta0.version, Some(pq))
  }

  /** TRAINED residual store build — [[buildIndexPq]]'s residual twin
    * (codes quantize v − centroid(cell) under codebooks trained on
    * sampled residuals): the production form of
    * [[buildIndexPqResidualSeeded]], same size-aware dials as
    * [[buildIndexPq]], same sidecar `residual` flag routing every read
    * and re-encode. */
  def buildIndexPqResidual(m: Int, ksub: Int = 0, nlist: Int = 0,
                           seed: Long = 42L,
                           trainFraction: Double = 1.0): Unit = {
    val meta0 = indexableMeta()
    val df = currentWithPtOf(meta0).withColumnRenamed("pt", "pb")
    require(!df.columns.contains("codes"),
      "collection has a 'codes' column, which collides with the PQ index layout; rename it")
    val d = dim().getOrElse(throw new IllegalStateException(
      s"collection '$name' is empty — nothing to index"))
    val n = count()
    val ks = if (ksub > 0) ksub else Ann.pqKsubFor(n)
    val nl = if (nlist > 0) nlist
             else metaPositiveInt(meta0, "ivf:nlist")
               .getOrElse(graft.operators.Dedup.cellsFor(n))
    val ivf = Ann.buildIvf(df, "id", "embedding", nl, seed, trainFraction)
    val pq = Ann.buildPqResidual(ivf.assigned, "id", "embedding",
      ivf.centroids, d, m, ks, seed)
    writeIndex(ivf.copy(assigned =
      Ann.pqEncodeResidual(ivf.assigned, "embedding", ivf.centroids, pq)),
      meta0.version, Some(pq))
  }

  def buildIndexPqSeeded(cellSeedIds: Seq[String], pqSeedIds: Seq[String],
                         m: Int): Unit = {
    val meta0 = indexableMeta()
    val df = currentWithPtOf(meta0).withColumnRenamed("pt", "pb")
    require(!df.columns.contains("codes"),
      "collection has a 'codes' column, which collides with the PQ index layout; rename it")
    val d = dim().getOrElse(throw new IllegalStateException(
      s"collection '$name' is empty — nothing to index"))
    val ivf = Ann.buildIvfSeededAny(df, "id", "embedding", cellSeedIds)
    val pq = Ann.buildPqSeeded(df, "id", "embedding", d, m, pqSeedIds)
    writeIndex(ivf.copy(assigned = Ann.pqEncode(ivf.assigned, "embedding", pq)),
      meta0.version, Some(pq))
  }

  /** The FULL Jégou construction as the collection index (residual
    * IVF-PQ): codes quantize `r = v − centroid(cell(v))` under codebooks
    * seeded by the `pqSeedIds` rows' OWN residuals — residuals
    * concentrate near 0 regardless of where cells sit, so the same ksub
    * codes spend their resolution on what the cell has not already
    * explained (measurably better ADC fidelity than [[buildIndexPqSeeded]]
    * at identical storage; q141 vs q139). The `residual` flag rides the
    * codebook sidecar, so [[queryPq]]/[[queryPqBatch]] pick the per-cell
    * ADC route and [[refreshIndex]]/rebuilds re-encode residuals — a
    * residual build can never be ADC'd against a raw-query table.
    * Keep pqSeedIds DISJOINT from cellSeedIds: a cell seed's residual is
    * the zero vector, and duplicate zero codebook entries waste codes. */
  def buildIndexPqResidualSeeded(cellSeedIds: Seq[String], pqSeedIds: Seq[String],
                                 m: Int): Unit = {
    val meta0 = indexableMeta()
    val df = currentWithPtOf(meta0).withColumnRenamed("pt", "pb")
    require(!df.columns.contains("codes"),
      "collection has a 'codes' column, which collides with the PQ index layout; rename it")
    val d = dim().getOrElse(throw new IllegalStateException(
      s"collection '$name' is empty — nothing to index"))
    val ivf = Ann.buildIvfSeededAny(df, "id", "embedding", cellSeedIds)
    val pq = Ann.buildPqResidualSeeded(ivf.assigned, "id", "embedding",
      ivf.centroids, d, m, pqSeedIds)
    writeIndex(ivf.copy(assigned =
      Ann.pqEncodeResidual(ivf.assigned, "embedding", ivf.centroids, pq)),
      meta0.version, Some(pq))
  }

  /** B6 through the PQ-coded index: ADC over the probed cells' (id,
    * codes) columns shortlists `fetchN` candidates (prefilters applied
    * BEFORE the shortlist, so k survivors exist whenever they exist in
    * the data), then exact `space` re-rank over the shortlist's raw
    * vectors fetched from the same pruned cells. Returns (id, adc, dist)
    * — the approximate path's audit trail rides along. LOUD without a
    * committed PQ-coded build for the current version: silently falling
    * back to brute force would hide exactly the cost this surface
    * exists to avoid. */
  def queryPq(queryVec: Seq[Float], k: Int, nprobe: Int = 0, fetchN: Int = 0,
              where: Option[Where] = None,
              whereDoc: Option[WhereDocument] = None): DataFrame = {
    requireDim(queryVec.length)
    val m = meta
    val (idxPath, cents) = currentIndex(m).getOrElse(throw new IllegalStateException(
      s"collection '$name' has no committed index for version ${m.version} — run buildIndexPqSeeded"))
    val pq = pqModelOf(idxPath).getOrElse(throw new IllegalStateException(
      s"index build $idxPath carries no PQ codebooks — built with buildIndex? " +
        "run buildIndexPqSeeded for the ADC path or query() for the plain one"))
    // fetchN = 0 → SIZE-AWARE default from the live corpus count
    // (Ann.pqFetchNFor, integer-only and oracle-replayable) — a frozen
    // k·4 measured recall 0.2 at bench scale where the scaled dial
    // measures ~1.0 (Recall.pq_scaled); count() on a parquet-backed
    // version is a footer-count job, listing-order work
    val fn = if (fetchN > 0) fetchN else Ann.pqFetchNFor(count(), k)
    require(fn >= k, s"fetchN ($fn) must be >= k ($k)")
    require(fn <= Ann.MaxFetchN,
      s"fetchN ($fn) exceeds MaxFetchN (${Ann.MaxFetchN}) — shortlists broadcast")
    val cells = Ann.nearestCellsOf(cents, queryVec, resolveNprobe(m, nprobe))
    val indexed = readIndexBuild(idxPath)
    val layoutCols = indexLayoutCols(idxPath)
    requireNoReserved(indexed.drop("codes" +: layoutCols: _*), Seq("dist", "adc"))
    val pruned0 = docIndexConfine(
      indexed.filter(col("cell").isin(cells: _*)), m, whereDoc)
    val pruned = ChromaFilter.predicate(where, whereDoc, col("document"),
      keyResolver(indexed)).map(pruned0.filter).getOrElse(pruned0)
    // ADC stage: column-pruned to (id, codes[, cell]) + whatever the
    // prefilters referenced; the embedding column stays unread until the
    // refine. A residual build routes through per-cell tables (the codes
    // encode v − centroid(cell), so the lut must be q − centroid(cell)).
    val shortlist =
      if (pq.residual)
        pruned.select(col("id"),
            Ann.pqAdcColByCell(pq, Ann.residualLuts(pq, cents, cells, queryVec)).as("adc"))
          .orderBy(col("adc"), col("id")).limit(fn)
      else Ann.queryPqAdc(pruned, pq, "id", queryVec, fn)
    pruned.select(col("id"), col("embedding"))
      .join(broadcast(shortlist), Seq("id"))
      .select(col("id"), col("adc"),
        graft.functions.Distances.bySpace(m.space)(col("embedding"),
          typedLit(queryVec)).as("__d"))
      .orderBy(col("__d"), col("id")).limit(k)
      // terminal ROUND on adc too (SURVEY §2.D rule 2): the round-6
      // DECIMAL fold is order-free but its raw L2 partials are not
      // engine-portable at the 0.5e-6 boundary — CORRECTNESS_r11 caught
      // exactly this (q140 hash flip); ordering stays on unrounded values.
      // roundz (rule 2c) also kills the signed zero: the stored query
      // vector IS a legal hit (Chroma returns the self row), its exact
      // cosine distance is a tiny NEGATIVE (float32 norm ≈ 1+ε), and a
      // sign-preserving round would emit −0.0 — CORRECTNESS_r12's only
      // red class (q140/q144/q145/q148/q149)
      .select(col("id"), graft.functions.Distances.roundz(col("adc"), 4).as("adc"),
        graft.functions.Distances.roundz(col("__d"), 4).as("dist"))
  }

  /** Batch form of [[queryPq]], shaped like [[queryBatch]]: ONE pruned
    * codes-only scan serves every query — each query's ADC lookup table
    * rides the broadcast query frame as a flattened m·ksub array, rows
    * pair with queries whose probe set contains their cell, and the
    * per-query fetchN shortlists (WindowGroupLimit under the exchange)
    * join back to the pruned cells once for the exact re-rank. Output:
    * (qid, rnk, id, adc, dist). */
  def queryPqBatch(queryVecs: Seq[Seq[Float]], k: Int, nprobe: Int = 0,
                   fetchN: Int = 0, where: Option[Where] = None,
                   whereDoc: Option[WhereDocument] = None): DataFrame = {
    require(queryVecs.nonEmpty, "queryPqBatch needs at least one query vector")
    require(queryVecs.map(_.length).distinct.size == 1,
      s"query vectors must share one dimension, got ${queryVecs.map(_.length).distinct}")
    requireDim(queryVecs.head.length)
    val m = meta
    val (idxPath, cents) = currentIndex(m).getOrElse(throw new IllegalStateException(
      s"collection '$name' has no committed index for version ${m.version} — run buildIndexPqSeeded"))
    val pq = pqModelOf(idxPath).getOrElse(throw new IllegalStateException(
      s"index build $idxPath carries no PQ codebooks — built with buildIndex? " +
        "run buildIndexPqSeeded for the ADC path or queryBatch() for the plain one"))
    // fetchN = 0 → the same size-aware default as queryPq (one count
    // job serves the whole batch)
    val fn = if (fetchN > 0) fetchN else Ann.pqFetchNFor(count(), k)
    require(fn >= k, s"fetchN ($fn) must be >= k ($k)")
    require(fn <= Ann.MaxFetchN,
      s"fetchN ($fn) exceeds MaxFetchN (${Ann.MaxFetchN}) — shortlists broadcast")
    val np = resolveNprobe(m, nprobe)
    val cellsPerQ = queryVecs.map(v => Ann.nearestCellsOf(cents, v, np))
    val allCells = cellsPerQ.flatten.distinct
    val indexed = readIndexBuild(idxPath)
    val layoutCols = indexLayoutCols(idxPath)
    requireNoReserved(indexed.drop("codes" +: layoutCols: _*),
      Seq("qid", "rnk", "dist", "adc", "__qvec", "__qcells", "__qluts", "__rn"))
    val pruned0 = docIndexConfine(
      indexed.filter(col("cell").isin(allCells: _*)), m, whereDoc)
    val pruned = ChromaFilter.predicate(where, whereDoc, col("document"),
      keyResolver(indexed)).map(pruned0.filter).getOrElse(pruned0)
    val spark0 = pruned.sparkSession
    import spark0.implicits._
    val ksub = pq.ksub
    // per-query ADC tables ride the broadcast query frame: for a plain
    // build one flattened m·ksub array per query; for a RESIDUAL build a
    // map cell → flattened array per probed cell (nprobe·m·ksub doubles
    // per query — still driver-cheap), since residual tables are
    // per-(query, cell) by construction
    val queries = queryVecs.zipWithIndex.map { case (v, i) =>
      val luts: Map[Int, Seq[Double]] =
        if (pq.residual)
          Ann.residualLuts(pq, cents, cellsPerQ(i), v)
            .map { case (c, lut) => c -> lut.flatten.toSeq }
        else Map(-1 -> Ann.pqLut(pq, v).flatten.toSeq)
      (i, v, cellsPerQ(i), luts)
    }.toDF("qid", "__qvec", "__qcells", "__qluts")
    import org.apache.spark.sql.types.DecimalType
    val lutCol = if (pq.residual) element_at(col("__qluts"), col("cell"))
                 else element_at(col("__qluts"), lit(-1))
    val adcCol = (0 until pq.m).map { s =>
      round(element_at(lutCol,
          (lit(s * ksub) + col("codes").getItem(s) + 1).cast("int")), 6)
        .cast(DecimalType(18, 6))
    }.reduce(_ + _).cast(DecimalType(18, 6)).cast("double")
    val wAdc = Window.partitionBy(col("qid")).orderBy(col("adc"), col("id"))
    val shortlist = pruned.select(col("id"), col("cell"), col("codes"))
      .join(broadcast(queries), array_contains(col("__qcells"), col("cell")))
      .withColumn("adc", adcCol)
      .withColumn("__rn", row_number().over(wAdc)).filter(col("__rn") <= fn)
      .select(col("qid"), col("id"), col("adc"), col("__qvec"))
    val wK = Window.partitionBy(col("qid")).orderBy(col("__d"), col("id"))
    pruned.select(col("id"), col("embedding"))
      .join(broadcast(shortlist), Seq("id"))
      .withColumn("__d",
        graft.functions.Distances.bySpace(m.space)(col("embedding"), col("__qvec")))
      .withColumn("rnk", row_number().over(wK))
      .filter(col("rnk") <= k)
      // roundz, not round: rule 2c (see queryPq) — the batch includes the
      // stored query vectors themselves, whose rounded distance is a zero
      // that must not carry DuckDB's sign bit
      .select(col("qid"), col("rnk"), col("id"),
        graft.functions.Distances.roundz(col("adc"), 4).as("adc"),
        graft.functions.Distances.roundz(col("__d"), 4).as("dist"))
  }

  /** Incrementally refresh the IVF index to the CURRENT version: keep the
    * prior build's CENTROIDS, re-run the exact argmin-L2 assignment ONLY
    * for the id buckets whose data changed since the indexed version, and
    * carry every other `cell=<c>/pb=<b>` slice from that build by carry-
    * manifest entry — O(touched data) compute + O(slices) metadata, where
    * today's alternative is a full O(corpus) re-train + re-assignment per
    * point mutation.
    *
    * Semantics: assignment is a pure function of (vector, centroids), and
    * unchanged rows were assigned against the SAME centroids, so the
    * refreshed index is bit-identical to a full re-assignment under those
    * centroids — pruned-query results are exactly what a fresh seeded
    * build with these centroids would serve. What a refresh does NOT do
    * is re-TRAIN: cell balance drifts as the corpus drifts — run
    * [[refreshIndexReport]] from a maintenance cadence to MEASURE that
    * drift (max/mean cell-occupancy skew) and trigger [[buildIndex]]
    * re-train on threshold instead of on faith.
    *
    * Changed-bucket detection, fallback rules, and the returned count
    * mirror [[refreshDocIndex]] (COW file-name diff). The full-rebuild
    * fallback goes through the metadata-sized [[buildIndex]]`()`, so a
    * collection without `ivf:nlist` metadata fails LOUDLY there — size it
    * or rebuild explicitly. */
  def refreshIndex(): Int = {
    // the same clash guard the full builds run (indexableMeta): a refresh
    // must not silently clobber a user column named cell/pb that a later
    // batch introduced (upsert's allowMissingColumns admits new columns)
    val m = indexableMeta()
    val prior = newestCommittedBuild("index_v")
    val priorCents = prior.flatMap(p =>
      Collection.cachedCentroids(io, p, spark.sparkContext.hadoopConfiguration))
    val refreshed = (prior, priorCents) match {
      case (Some(old), _) if indexVersionOf(old) == m.version =>
        0 // a committed build already serves this version
      case (Some(old), Some(cents)) if hasPbSlices(old, "cell=") &&
          io.exists(dataDir(indexVersionOf(old))) =>
        val changed = changedBucketsBetween(indexVersionOf(old), m.version)
        val claimed = claimIndexBuild(m.version)
        val touched = currentWithPtOf(m)
          .filter(col("pt").isin(changed.toSeq: _*))
          .withColumnRenamed("pt", "pb")
        // a PQ-coded build refreshes its codes too: touched rows re-encode
        // under the PRIOR codebooks (encode is a pure function of (vector,
        // codebooks), the same argument that lets assignment refresh) —
        // without this the refreshed slices would lack the codes column
        // and the union-by-name read would serve NULL codes to queryPq
        val priorPq = pqModelOf(old)
        priorPq.foreach { _ =>
          require(!touched.columns.contains("codes"),
            "collection gained a user 'codes' column after its PQ index was built — " +
              "rename it or dropIndex() before refreshing")
        }
        val assignedTouched = Ann.assignCells(touched, "embedding", cents)
        val withCodes = priorPq.fold(assignedTouched)(
          Ann.pqEncodeFor(assignedTouched, "embedding", cents, _))
        // writeIvf also rewrites the centroid sidecar into the new build
        // (same centroids — the sidecar is what later reads/refreshes use)
        Ann.writeIvf(Ann.IvfModel(cents, withCodes.repartition(col("cell"))),
          claimed.toString, withPb = true)
        priorPq.foreach(p =>
          Ann.writePqSidecar(claimed, p, spark.sparkContext.hadoopConfiguration))
        carryUnchangedSlices(old, claimed, changed)
        io.writeBytes(new Path(claimed, "_graft_committed"), Array.emptyByteArray)
        changed.size
      case (Some(old), Some(cents)) =>
        // prior build readable but not incrementally refreshable (no pb
        // axis, or the indexed version's data dir was vacuumed): FULL
        // re-assignment under the SAME centroids — refresh semantics,
        // never a silent re-train — and a PQ-coded build re-encodes and
        // keeps its codebooks instead of downgrading to plain IVF
        val df = currentWithPtOf(m).withColumnRenamed("pt", "pb")
        val assigned = Ann.assignCells(df, "embedding", cents)
        val priorPq = pqModelOf(old)
        priorPq.foreach { _ =>
          require(!df.columns.contains("codes"),
            "collection gained a user 'codes' column after its PQ index was built — " +
              "rename it or dropIndex() before refreshing")
        }
        writeIndex(Ann.IvfModel(cents,
          priorPq.fold(assigned)(Ann.pqEncodeFor(assigned, "embedding", cents, _))),
          m.version, priorPq)
        numBuckets
      case _ =>
        buildIndex() // no readable prior: re-train (ivf:nlist), PQ carried by buildIndex itself
        numBuckets
    }
    if (refreshed > 0) maybeAutoCompactIndexes()
    refreshed
  }

  /** Default skew (max/mean cell occupancy) above which
    * [[refreshIndexReport]] flags the index as drifted: a query probing
    * the hottest cell then reads ~4× the rows a balanced index would —
    * roughly the point where re-training pays for itself. */
  val DefaultDriftThreshold: Double = 4.0

  /** [[refreshIndex]] WITH the drift signal the refresh scaladoc
    * promises: refreshing keeps the old centroids, so cell balance
    * decays as the corpus drifts — this variant measures the refreshed
    * index's cell occupancy (max/mean skew) and WARNS loudly past
    * `driftThreshold`, so a deployment schedules [[buildIndex]] re-train
    * on a measured threshold instead of on faith.
    *
    * The occupancy probe groups by the `cell` partition column only —
    * column pruning reads no data pages, the scan is parquet footer
    * counts (O(#index files), the same order as the listing work the
    * refresh itself already does). Per-microbatch streaming refreshes
    * ([[graft.streaming.StreamingHydrator.hydrateIndexed]]) stay on the
    * plain [[refreshIndex]] and skip the probe; run THIS form from the
    * maintenance cadence that would also consider [[compactIndexes]]. */
  def refreshIndexReport(
      driftThreshold: Double = DefaultDriftThreshold): IvfRefreshReport = {
    val refreshed = refreshIndex()
    val occ = indexOccupancy().getOrElse(
      throw new IllegalStateException(
        s"collection '$name' has no committed IVF build after refresh"))
    if (occ.skew > driftThreshold)
      log.warn(s"IVF index of collection '$name' has drifted: cell-occupancy " +
        f"skew ${occ.skew}%.2f (max ${occ.maxCellRows} rows vs mean " +
        f"${occ.meanCellRows}%.1f over ${occ.nCells} cells) exceeds " +
        f"$driftThreshold%.2f — schedule buildIndex() to re-train centroids")
    IvfRefreshReport(refreshed, occ)
  }

  /** Cell-occupancy profile of the current committed IVF build (None
    * without one). Footer-count scan — see [[refreshIndexReport]]. */
  def indexOccupancy(): Option[IvfOccupancy] = {
    val m = meta
    currentIndex(m).map { case (build, cents) =>
      val r = readIndexBuild(build).groupBy("cell")
        .agg(org.apache.spark.sql.functions.count(lit(1)).as("n"))
        .agg(coalesce(sum("n"), lit(0L)).as("total"),
          coalesce(max("n"), lit(0L)).as("mx"))
        .head()
      IvfOccupancy(cents.length, r.getLong(0), r.getLong(1))
    }
  }

  // ---- auto-compaction policy (opt-in via collection metadata) ----
  //
  // `graft:autocompact.maxfiles = <n>`: after every successful mutation
  // commit, if the CURRENT version resolves to more than n data files,
  // the collection compacts and vacuums itself (LOUD log line); after an
  // index refresh, the same bound applies to that index's resolved
  // files via compactIndexes(). One policy key turns the three manual
  // admin ops (compact / compactIndexes / vacuum) into a set-once
  // property a pipeline can rely on — a long point-upsert run stays
  // under the file bound with no scheduled maintenance.
  //
  // Set n above the structural floor: a compacted collection still has
  // one file per id bucket (numBuckets), a compacted IVF build one per
  // cell×pb leaf slice, a postings build one per gp×pb slice — a bound
  // below the floor re-compacts on every commit (work, never progress).
  // `graft:autocompact.keephistory = <k>` (optional) is passed to the
  // policy's vacuum — time-travel readers keep k predecessor versions.

  /** Resolved data-file count of version `m.version` — a pure listing
    * walk over the carry-resolved owner dirs (no Spark job). */
  private def dataFileCount(m: CollectionMeta): Int =
    Carry.owners(io, dir, dataDir(m.version), "pt=").toSeq.map {
      case (part, owner) =>
        io.list(new Path(owner, part))
          .count(e => !e.isDir && e.name.endsWith(".parquet"))
    }.sum

  /** Resolved parquet-file count of an index build dir. */
  private def indexFileCount(build: Path): Int =
    Carry.slicedOwners(io, dir, build).toSeq.map { case (slice, owner) =>
      io.list(new Path(owner, slice))
        .count(e => !e.isDir && e.name.endsWith(".parquet"))
    }.sum

  private def autoCompactBound(m: CollectionMeta): Option[Int] =
    metaPositiveInt(m, "graft:autocompact.maxfiles")

  /** Data-side policy check, run after every public mutation's commit
    * (NOT inside the commit path itself — [[compact]] commits through
    * the same writeVersion and must never re-trigger the policy). */
  private def maybeAutoCompact(): Unit = {
    val m = meta
    autoCompactBound(m).foreach { bound =>
      if (currentDataOf(m).nonEmpty) {
        val files = dataFileCount(m)
        if (files > bound) {
          val keep = metaPositiveInt(m, "graft:autocompact.keephistory").getOrElse(0)
          log.warn(s"auto-compaction of collection '${m.name}': $files data " +
            s"files exceed graft:autocompact.maxfiles=$bound — " +
            s"compact() + vacuum(keepHistory=$keep)")
          compact()
          vacuum(keep)
        }
      }
    }
  }

  /** Index-side policy check, run after an incremental index refresh:
    * a long refresh chain accumulates one small file per refresh per
    * touched slice plus a carry-owner spread — past the bound, both
    * committed builds repack ([[compactIndexes]]) and vacuum reclaims
    * the superseded builds. */
  private def maybeAutoCompactIndexes(): Unit = {
    val m = meta
    autoCompactBound(m).foreach { bound =>
      val files = (currentIndex(m).map(_._1) ++ currentDocIndex(m) ++ currentKwIndex(m))
        .map(indexFileCount).sum
      if (files > bound) {
        val keep = metaPositiveInt(m, "graft:autocompact.keephistory").getOrElse(0)
        log.warn(s"auto-compaction of collection '${m.name}' indexes: $files " +
          s"resolved index files exceed graft:autocompact.maxfiles=$bound — " +
          s"compactIndexes() + vacuum(keepHistory=$keep)")
        compactIndexes()
        vacuum(keep)
      }
    }
  }

  /** LOUD when a read falls back to the full scan because every committed
    * build of `family` is version-stale: the answer stays correct (scan
    * semantics are the contract), but at 100 TB the SILENT cost cliff is
    * the bug — a SQL-only writer (`df.write.format("graft")`) advances
    * the version without any way to know the sidecars went stale. */
  private def warnIfStale(family: String, m: CollectionMeta): Unit = {
    // memoized per (collection, family, version) and JVM: the warning is
    // a log line, so probing once per version is enough — without the
    // memo EVERY scan-fallback read (including on collections that never
    // built the family at all) would pay a directory LIST purely to
    // decide not to log, a per-query I/O tax on object stores. A build
    // committed for the SAME version after the probe only suppresses the
    // (already moot) warning, never a serving decision.
    if (!Collection.staleProbe.add(s"$dir|$family|v${m.version}")) return
    if (Collection.staleProbe.size > 65536) Collection.staleProbe.clear()
    newestCommittedBuild(s"${family}_v") match {
      case Some(b) if indexVersionOf(b) != m.version =>
        log.warn(s"collection '${m.name}': newest committed $family build " +
          s"serves v${indexVersionOf(b)} but the collection is at " +
          s"v${m.version} — serving the full scan instead (correct, but " +
          "O(corpus)); refresh via refreshIndexes() or the SQL write " +
          "option refresh=true")
      case None if familyMarker(family) =>
        // the family was built once but NO build survives (an overwrite
        // made every build version-stale and vacuum reclaimed them) —
        // without this arm the cost cliff would be silent forever
        log.warn(s"collection '${m.name}': the $family index was built " +
          "once but no build survives (overwrite + vacuum) — serving the " +
          "full scan; refreshIndexes() or the SQL write option " +
          "refresh=true rebuilds it in full")
      case _ => ()
    }
  }

  /** Refresh EVERY index family that has ever been built — the one-call
    * freshness contract behind the SQL write surface's `refresh=true`
    * option (a plain-SQL user has no per-family handles). Family
    * detection is committed-build OR the durable [[recordFamily]] marker,
    * so an overwrite+vacuum that reclaimed every stale build still
    * rebuilds (full re-derivation — the refresh methods' own fallback).
    * Families never built are not built here (building is a sizing
    * decision — `ivf:nlist`, analyzer — the owner makes once); families
    * already current are O(listing) no-ops. Returns family → id buckets
    * rebuilt, for logging/specs. */
  def refreshIndexes(): Map[String, Int] = {
    def known(fam: String): Boolean = {
      val found = newestCommittedBuild(s"${fam}_v").isDefined
      if (found) recordFamily(fam) // self-heal pre-marker collections
      found || familyMarker(fam)
    }
    val out = Seq.newBuilder[(String, Int)]
    if (known("index")) {
      // the IVF full-rebuild fallback re-trains from ivf:nlist; a seeded
      // build wiped by overwrite+vacuum has no nlist to re-train from —
      // warn loudly instead of throwing the whole multi-family refresh
      if (newestCommittedBuild("index_v").isDefined ||
          meta.metadata.contains("ivf:nlist"))
        out += ("index" -> refreshIndex())
      else log.warn(s"collection '$name': the IVF index was built once " +
        "but no build survives and the collection carries no ivf:nlist " +
        "metadata to re-train from — rebuild explicitly via " +
        "buildIndex(nlist)/buildIndexSeeded")
    }
    if (known("docindex")) out += ("docindex" -> refreshDocIndex())
    if (known("kwindex")) out += ("kwindex" -> refreshKeywordIndex())
    out.result().toMap
  }

  /** Newest committed index build dir with the given name prefix
    * (highest (version, build)) — the refresh diff basis. */
  private def newestCommittedBuild(prefix: String): Option[Path] =
    io.list(dir).filter(e => e.isDir && e.name.startsWith(prefix)).map(_.path)
      .filter(p => io.exists(new Path(p, "_graft_committed")))
      .sortBy(p => (indexVersionOf(p), buildNumberOf(p))).lastOption

  /** Id buckets whose data changed between two committed versions (see
    * [[bucketSignatures]] for why an owner+file-name diff is the right
    * detector). */
  private def changedBucketsBetween(vOld: Int, vNew: Int): Set[Int] = {
    val o = bucketSignatures(vOld)
    val n = bucketSignatures(vNew)
    (o.keySet ++ n.keySet).filter(b => o.get(b) != n.get(b))
  }

  /** Carry the prior build's unchanged pb slices forward: every
    * `<axis>=<x>/pb=<b>` slice of `old` with b ∉ changed becomes a carry-
    * manifest entry of `claimed` pointing at the dir PHYSICALLY holding
    * it (old's own carries stay one-hop resolved) — O(slices) metadata,
    * no per-file work, works on any filesystem. MUST run after the
    * claimed build's parquet write: `mode(overwrite)` clears the dir. */
  private def carryUnchangedSlices(old: Path, claimed: Path,
                                   changed: Set[Int]): Unit =
    Carry.write(io, claimed, Carry.slicedOwners(io, dir, old)
      .filterNot { case (slice, _) =>
        changed.contains(slice.substring(slice.indexOf("/pb=") + 4).toInt) }
      .map { case (slice, owner) => slice -> owner.getName })

  /** Drop the IVF index (reads fall back to the exact scan). Explicit
    * user intent — unlike rebuild, this DOES delete: every build of the
    * family (stale versions included — they serve nothing, and a
    * surviving committed one would let [[refreshIndexes]]'s self-heal
    * resurrect the family) AND the durable [[recordFamily]] marker, so
    * `refreshIndexes()` / the SQL write option `refresh=true` honor the
    * drop instead of silently rebuilding in full, and [[warnIfStale]]
    * stays quiet on a deliberately index-less collection. */
  def dropIndex(): Boolean = dropFamily("index")

  /** [[dropIndex]]'s shared body: delete ALL builds of `family` (any
    * version, committed or claimed) plus its `_graft_has_<family>`
    * marker. Returns whether any build existed. */
  private def dropFamily(family: String): Boolean = {
    val builds = io.list(dir).filter { e =>
      e.isDir && e.name.startsWith(s"${family}_v")
    }.map(_.path)
    builds.foreach(io.deleteRecursively)
    val marker = new Path(dir, s"_graft_has_$family")
    if (io.exists(marker)) io.deleteRecursively(marker)
    builds.nonEmpty
  }

  // ---- where_document postings index (SURVEY §2.B B8's scale path) ----
  //
  // Same MVCC discipline as the IVF index: version-pinned build dirs
  // (`docindex_v<V>.b<B>/`, committed by `_graft_committed`), claimed via
  // O_CREAT|O_EXCL directory create, adopted only while meta.version == V,
  // superseded builds reclaimed by [[vacuum]]. Layout + query semantics:
  // [[graft.operators.DocIndex]] (trigram postings; index answers are
  // superset-prefilter + verbatim re-check, bit-identical to the scan).

  private def currentDocIndex(m: CollectionMeta): Option[Path] =
    currentFamilyBuild("docindex", m)

  def hasDocIndex: Boolean = currentDocIndex(meta).isDefined

  /** Build the `where_document` postings index over the current version.
    * Postings are sliced by the store's own id bucket (`gp=<g>/pb=<b>`)
    * so later [[refreshDocIndex]] calls can carry unchanged slices
    * forward instead of re-deriving the whole corpus. */
  def buildDocIndex(): Unit = buildPostingsFamily("docindex", DocIndex.writeWithPb)

  /** Shared build for the document-derived postings families ("docindex"
    * trigram postings, "kwindex" keyword stats): one claim/write/commit
    * discipline, the family's writer plugged in — a protocol fix lands
    * once. The writer receives ((id, document, pt) frame, idCol, docCol,
    * pbCol, path, maxRowsPerFile) — both writers share that signature. */
  private def buildPostingsFamily(family: String,
      writer: (DataFrame, String, String, Column, String, Long) => Unit,
      stamp: Option[(String, String)] = None): Unit = {
    val m = meta
    require(currentDataOf(m).nonEmpty,
      s"collection '${m.name}' is empty — nothing to index")
    val data = currentWithPtOf(m)
    require(data.columns.contains("document"),
      s"collection '${m.name}' carries no document column — nothing to index")
    val claimed = claimFamilyBuild(family, m.version)
    writer(data.select(col("id"), col("document"), col("pt")),
      "id", "document", col("pt"), claimed.toString, maxRowsPerFile)
    // family-specific build identity (e.g. the keyword analyzer stamp),
    // written BEFORE the marker — a build is never committed unstamped
    stamp.foreach { case (f, v) =>
      io.writeBytes(new Path(claimed, f), v.getBytes(StandardCharsets.UTF_8)) }
    io.writeBytes(new Path(claimed, "_graft_committed"), Array.emptyByteArray)
    recordFamily(family)
  }

  /** Durable "this family was built once" marker (`_graft_has_<family>`,
    * a flat file outside the versioned build dirs): the owner's sizing
    * decision survives even when [[vacuum]] reclaims every superseded
    * BUILD (an overwrite makes all builds version-stale, and an
    * overwrite+vacuum without refresh used to leave [[refreshIndexes]]
    * with nothing to detect the family by — refresh=true on the NEXT
    * write silently no-opped and the collection was stranded index-less
    * with no SQL-surface recovery). Written at every build commit;
    * self-healed by [[refreshIndexes]] for pre-marker collections. */
  private def recordFamily(family: String): Unit = {
    val p = new Path(dir, s"_graft_has_$family")
    if (!io.exists(p)) io.writeBytes(p, Array.emptyByteArray)
  }

  private def familyMarker(family: String): Boolean =
    io.exists(new Path(dir, s"_graft_has_$family"))

  /** Shared incremental refresh for the postings families (see
    * [[buildPostingsFamily]]): postings (and, for the keyword family, the
    * per-bucket stats rows) of CHANGED id buckets re-derive; every other
    * `<axis>=<a>/pb=<b>` slice carries from the last committed build by
    * manifest. Returns buckets rebuilt; full rebuild without a usable
    * prior build. */
  private def refreshPostingsFamily(family: String, axis: String,
      writer: (DataFrame, String, String, Column, String, Long) => Unit,
      stamp: Option[(String, String)] = None,
      priorUsable: Path => Boolean = _ => true): Int = {
    val m = meta
    require(currentDataOf(m).nonEmpty,
      s"collection '${m.name}' is empty — nothing to index")
    val refreshed = newestCommittedBuild(s"${family}_v") match {
      // `priorUsable` gates BOTH reuse paths: a build whose identity
      // stamp disagrees with the collection's current setting (the
      // keyword analyzer was re-pointed) must not satisfy the refresh —
      // and must never donate carried slices — or index ≡ scan breaks
      case Some(old) if indexVersionOf(old) == m.version && priorUsable(old) =>
        0 // a committed build already serves this version
      case Some(old) if priorUsable(old) && hasPbSlices(old, axis) &&
          io.exists(dataDir(indexVersionOf(old))) =>
        val changed = changedBucketsBetween(indexVersionOf(old), m.version)
        val claimed = claimFamilyBuild(family, m.version)
        if (changed.nonEmpty)
          writer(
            currentWithPtOf(m).filter(col("pt").isin(changed.toSeq: _*))
              .select(col("id"), col("document"), col("pt")),
            "id", "document", col("pt"), claimed.toString, maxRowsPerFile)
        // carry forward unchanged slices: manifest entries for <axis>/pb=<b>
        // for every b whose data bucket is byte-identical carry-over
        carryUnchangedSlices(old, claimed, changed)
        stamp.foreach { case (f, v) =>
          io.writeBytes(new Path(claimed, f), v.getBytes(StandardCharsets.UTF_8)) }
        io.writeBytes(new Path(claimed, "_graft_committed"), Array.emptyByteArray)
        changed.size
      case _ =>
        buildPostingsFamily(family, writer, stamp)
        numBuckets
    }
    if (refreshed > 0) maybeAutoCompactIndexes()
    refreshed
  }

  private def claimDocIndexBuild(version: Int): Path =
    claimFamilyBuild("docindex", version)

  /** Version number encoded in an index build dir name
    * (`docindex_v<V>[.b<B>]` / `index_v<V>[.b<B>]`). */
  private def indexVersionOf(p: Path): Int =
    p.getName.dropWhile(!_.isDigit).takeWhile(_.isDigit).toInt

  /** Per-bucket identity for change detection: (physical owner dir name,
    * file names). A carried bucket keeps its owner's identity, so a COW
    * carry reads as unchanged and a rewrite (fresh files in the new
    * version dir) reads as changed — the same contract the hard-link
    * layout had, where carried files kept their names in place. An owner
    * dir a concurrent vacuum already reclaimed reads as an empty file
    * set — conservatively "changed", never a crash. */
  private def bucketSignatures(v: Int): Map[Int, (String, Set[String])] =
    Carry.owners(io, dir, dataDir(v), "pt=").map { case (part, owner) =>
      val bdir = new Path(owner, part)
      val files =
        if (io.exists(bdir))
          io.list(bdir).filterNot(_.isDir).map(_.name).toSet
        else Set.empty[String]
      part.stripPrefix("pt=").toInt -> (owner.getName -> files)
    }

  /** Whether `build` uses the two-level refreshable layout: its first-
    * axis dirs (`gp=`/`cell=` per `prefix`) hold `pb=` slices — locally,
    * or via carry-manifest entries (a refresh that rewrote nothing has
    * ONLY carried slices). */
  private def hasPbSlices(build: Path, prefix: String): Boolean =
    io.list(build).find(e => e.isDir && e.name.startsWith(prefix)).exists(g =>
      io.list(g.path).exists(e => e.isDir && e.name.startsWith("pb="))) ||
      Carry.read(io, build).keys.exists(k => k.startsWith(prefix) && k.contains("/pb="))

  /** Incrementally refresh the postings index to the CURRENT version:
    * rebuild postings ONLY for the id buckets whose data changed since
    * the last committed build's version; every other `gp=<g>/pb=<b>`
    * slice is carried from that build by carry-manifest entry —
    * O(touched data) compute + O(slices) metadata, instead of the
    * O(corpus) full re-derivation that made every point-upsert pay a
    * whole-index rebuild at scale.
    *
    * Changed buckets are detected from the COW layout itself (no extra
    * bookkeeping): merge commits carry untouched buckets in place (same
    * physical owner, same file names), so a bucket changed iff its
    * (owner, file-name set) signature differs between the indexed
    * version and the current one ([[bucketSignatures]]).
    * Falls back to a full [[buildDocIndex]] when there is no usable
    * prior build (none committed, legacy un-sliced layout, or the
    * indexed version's data dir was vacuumed away).
    *
    * Returns the number of buckets rebuilt (numBuckets for the full-
    * rebuild fallback, 0 when the index is already current). Same MVCC
    * discipline as every build: fresh claimed dir, marker written LAST,
    * readers adopt only marker-complete builds of the current version.
    */
  def refreshDocIndex(): Int =
    refreshPostingsFamily("docindex", "gp=", DocIndex.writeWithPb)

  /** Drop the postings index — every build plus the durable family
    * marker (the [[dropIndex]] contract: a drop must not be undone by
    * `refreshIndexes()`). */
  def dropDocIndex(): Boolean = dropFamily("docindex")

  /** Confine `df` to the postings index's candidate ids when a committed
    * index matches snapshot `m` and `whereDoc` is gram-confinable; no-op
    * otherwise. Callers ALWAYS still apply the verbatim predicate — the
    * index shrinks IO, never changes answers. Shared by get/query/
    * queryBatch so every read surface takes the same scale path. */
  private def docIndexConfine(
      df: DataFrame, m: CollectionMeta,
      whereDoc: Option[WhereDocument]): DataFrame =
    (for {
      wd <- whereDoc
      sets <- DocIndex.gramSets(wd)
    } yield currentDocIndex(m) match {
      case Some(idx) => df.join(
        DocIndex.candidates(readIndexBuild(idx), sets), Seq("id"), "left_semi")
      case None => warnIfStale("docindex", m); df
    }).getOrElse(df)

  // ---- keyword-statistics (BM25) sidecar — hybrid retrieval's scale path ----
  //
  // Same MVCC discipline as the other two index families: version-pinned
  // build dirs (`kwindex_v<V>.b<B>/`, committed by `_graft_committed`),
  // claimed via O_CREAT|O_EXCL directory create, adopted only while
  // meta.version == V, superseded builds reclaimed by [[vacuum]]. Layout
  // + query semantics: [[graft.operators.KeywordIndex]] (term-hash-sliced
  // postings carrying tf/dl + per-bucket stats rows; served scores are
  // bit-identical to the Retrieval.bm25 scan by the shared-fold contract).

  private def currentKwIndex(m: CollectionMeta): Option[Path] =
    currentFamilyBuild("kwindex", m)

  def hasKeywordIndex: Boolean = currentKwIndex(meta).isDefined

  /** The collection's keyword ANALYZER setting ([[Collection.AnalyzerKey]]
    * metadata; absent = "whitespace") — the ONE tokenization rule the
    * corpus scan, the sidecar build and the query side all apply. */
  def analyzer: String = analyzerOf(meta)

  private def analyzerOf(m: CollectionMeta): String = {
    val a = m.metadata.getOrElse(Collection.AnalyzerKey, Retrieval.DefaultAnalyzer)
    Retrieval.requireAnalyzer(a) // stored values are validated, but a
    a                            // hand-edited meta.json must fail loudly
  }

  /** The analyzer a committed keyword build was tokenized with — its
    * [[KeywordIndex.AnalyzerStamp]] file (absent = "whitespace": builds
    * predate the setting, whose rule was the only one then). Cached per
    * build dir ([[Collection.kwStampCache]]): stamps are immutable once
    * the marker lands, and an uncached read would tax EVERY sidecar-path
    * keyword query with a small-file read. */
  private def kwAnalyzerOf(build: Path): String = {
    if (Collection.kwStampCache.size > 65536) Collection.kwStampCache.clear()
    Collection.kwStampCache.computeIfAbsent(build.toString, _ => {
      val p = new Path(build, KeywordIndex.AnalyzerStamp)
      if (io.exists(p)) new String(io.readBytes(p), StandardCharsets.UTF_8).trim
      else Retrieval.DefaultAnalyzer
    })
  }

  /** The kwindex family writer bound to one analyzer (the shared
    * build/refresh helpers fix the writer signature). */
  private def kwWriter(analyzer: String)
      : (DataFrame, String, String, Column, String, Long) => Unit =
    (df, idc, dc, pb, path, max) =>
      KeywordIndex.writeWithPb(df, idc, dc, pb, path, max, analyzer)

  /** Build the keyword-stats (BM25) sidecar over the current version,
    * tokenized with the collection's [[analyzer]] (stamped into the
    * build dir). Postings are sliced by the store's own id bucket
    * (`tp=<t>/pb=<b>`) so later [[refreshKeywordIndex]] calls can carry
    * unchanged slices forward instead of re-deriving the whole corpus. */
  def buildKeywordIndex(): Unit = {
    val a = analyzerOf(meta)
    buildPostingsFamily("kwindex", kwWriter(a),
      stamp = Some((KeywordIndex.AnalyzerStamp, a)))
  }

  private def claimKwIndexBuild(version: Int): Path =
    claimFamilyBuild("kwindex", version)

  /** Incrementally refresh the keyword sidecar to the CURRENT version —
    * the [[refreshDocIndex]] contract over the `tp=`/`pb=` layout:
    * postings AND the per-bucket stats rows of changed id buckets
    * re-derive; every other slice carries from the last committed build.
    * (Per-bucket stats are what make the carry SOUND: a bucket's
    * (n_docs, tot_dl) row lives in its own `pb` slice, so corpus totals
    * recompose exactly from rebuilt + carried slices.) Returns buckets
    * rebuilt; falls back to a full [[buildKeywordIndex]] without a
    * usable prior build — including when the prior build's analyzer
    * stamp disagrees with the collection's current [[analyzer]] (its
    * slices tokenize under a retired rule and must not be carried). */
  def refreshKeywordIndex(): Int = {
    val a = analyzerOf(meta)
    refreshPostingsFamily("kwindex", "tp=", kwWriter(a),
      stamp = Some((KeywordIndex.AnalyzerStamp, a)),
      priorUsable = b => kwAnalyzerOf(b) == a)
  }

  /** Drop the keyword sidecar — every build plus the durable family
    * marker (the [[dropIndex]] contract: a drop must not be undone by
    * `refreshIndexes()`). */
  def dropKeywordIndex(): Boolean = dropFamily("kwindex")

  /** The committed keyword build SERVABLE under snapshot `m`: current
    * version AND analyzer stamp = the collection's current setting. A
    * version-current build under a retired analyzer is stale the same
    * way a version-stale one is — both fall back to the (analyzer-
    * correct) scan, loudly, until a refresh rebuilds. */
  private def servableKwIndex(m: CollectionMeta, a: String): Option[Path] =
    currentKwIndex(m) match {
      case Some(idx) if kwAnalyzerOf(idx) == a => Some(idx)
      case Some(idx) =>
        // memoized like warnIfStale: the mismatch holds until a refresh
        // lands (which changes the newest build PATH, keying a new warn),
        // so warning once per (build, setting) is enough — unmemoized,
        // every keyword query would log the same line
        if (Collection.staleProbe.add(s"$dir|kwindex-analyzer|$idx|$a"))
          log.warn(s"keyword sidecar of collection '${m.name}' was built " +
            s"under analyzer '${kwAnalyzerOf(idx)}' but the collection is " +
            s"set to '$a' — serving the O(corpus) scan path; run " +
            "refreshKeywordIndex() to rebuild")
        None
      case None => warnIfStale("kwindex", m); None
    }

  /** Caller-provided terms normalized by the collection's analyzer
    * (stored postings are analyzed, so an unanalyzed query term — "Hash,"
    * — would silently match nothing): under "whitespace" terms pass
    * VERBATIM (the original contract — callers own casing); under any
    * other rule each term is normalized and terms that normalize away
    * are dropped, loudly when ALL do. */
  private def analyzedTerms(terms: Seq[String], a: String): Seq[String] =
    if (a == Retrieval.DefaultAnalyzer) terms
    else {
      val out = terms.map(t => Retrieval.normalizeTerm(t, a)).filter(_.nonEmpty)
      require(out.nonEmpty,
        s"no query term survives analyzer '$a': ${terms.mkString("[", ", ", "]")}")
      out
    }

  /** BM25 keyword top-n over the collection's `document` column:
    * (id, rnk, score). Terms are normalized by the collection's
    * [[analyzer]]; serves from the committed keyword sidecar when one
    * matches the current version AND the analyzer — per-query cost
    * O(matching postings) — and falls back to the exact
    * [[Retrieval.bm25TopK]] corpus scan otherwise; both paths return
    * bit-identical scores (the shared-fold contract
    * [[graft.operators.KeywordIndex]] documents).
    *
    * `where`/`whereDoc` confine WHICH documents rank (Chroma's query
    * prefilters, applied between the score fold and the top-n rank) —
    * never how they score: BM25 statistics stay corpus-global, the
    * Lucene filter-query rule, so a committed sidecar serves filtered
    * queries too and a document's score is filter-invariant
    * ([[keywordEligible]] documents the join shape). */
  def keywordTopK(queryTerms: Seq[String], n: Int,
                  k1: Double = 1.2, b: Double = 0.75,
                  where: Option[Where] = None,
                  whereDoc: Option[WhereDocument] = None): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val m = meta
    val a = analyzerOf(m)
    val terms = analyzedTerms(queryTerms, a)
    val scores = servableKwIndex(m, a) match {
      case Some(idx) =>
        KeywordIndex.bm25Scores(readIndexBuild(idx), terms, k1, b)
      case None =>
        Retrieval.bm25(keywordCorpus(m), "id", "document", terms, k1, b, a)
    }
    Retrieval.rankTopN(keywordEligible(scores, m, where, whereDoc), n)
  }

  private def keywordCorpus(m: CollectionMeta): DataFrame = {
    val df = snapshotDF(m)
    require(df.columns.contains("document"),
      s"collection '${m.name}' carries no document column — keyword " +
        "retrieval needs one")
    df
  }

  /** Confine a scored keyword frame (carrying `id`) to the documents
    * passing the prefilters, BEFORE the rank: eligibility is a
    * column-pruned snapshot scan (id + the filtered columns only — the
    * predicate pushes to parquet) semi-joined onto the O(matching
    * postings) score stream, so the sidecar path never re-reads the
    * corpus beyond the filter columns. whereDoc rides the trigram
    * postings index when one is committed ([[docIndexConfine]]), the
    * same scale path get/query take. No-op without filters. */
  private def keywordEligible(scores: DataFrame, m: CollectionMeta,
                              where: Option[Where],
                              whereDoc: Option[WhereDocument]): DataFrame =
    if (where.isEmpty && whereDoc.isEmpty) scores
    else {
      var snap = docIndexConfine(snapshotDF(m), m, whereDoc)
      ChromaFilter.predicate(where, whereDoc, col("document"), keyResolver(snap))
        .foreach(p => snap = snap.filter(p))
      scores.join(snap.select("id"), Seq("id"), "left_semi")
    }

  /** The BATCH form of [[keywordTopK]] — one pruned sidecar read (or one
    * corpus scan on the fallback path) serves every query in the batch:
    * (qid, id, rnk, score), each qid's rows exactly its single-query
    * [[keywordTopK]] answer (GLOBAL df, shared fold). */
  def keywordTopKBatch(queries: Seq[Seq[String]], n: Int,
                       k1: Double = 1.2, b: Double = 0.75,
                       where: Option[Where] = None,
                       whereDoc: Option[WhereDocument] = None): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val m = meta
    val a = analyzerOf(m)
    val analyzed = queries.map(q => analyzedTerms(q, a))
    val scores = servableKwIndex(m, a) match {
      case Some(idx) =>
        KeywordIndex.bm25ScoresBatch(readIndexBuild(idx), analyzed, k1, b)
      case None =>
        Retrieval.bm25Batch(keywordCorpus(m), "id", "document", analyzed, k1, b, a)
    }
    Retrieval.rankTopNBatch(keywordEligible(scores, m, where, whereDoc), n)
  }

  /** The corpus tokenization rule applied to a query text — the
    * collection's [[analyzer]] via the shared [[Retrieval.queryTerms]]
    * written form (UTF8String lowercase — the EXACT routine Spark's
    * lower() applies corpus-side — split, per-analyzer normalization,
    * duplicates collapsed: BM25 scores a term once per DISTINCT term). */
  private def queryTerms(text: String): Seq[String] =
    Retrieval.queryTerms(text, analyzerOf(meta))

  /** Hybrid retrieval — the full RAG read path as ONE collection call:
    * the query text drives BOTH legs. The KEYWORD leg tokenizes it with
    * the corpus rule (`lower` + whitespace split, duplicates collapsed —
    * BM25 scores a term once per distinct query term) and runs
    * [[keywordTopK]] (keyword sidecar when committed, scan otherwise —
    * same values either way); the VECTOR leg embeds it through the
    * collection's RECORDED embedding function ([[queryText]]'s binding
    * rule, zero-vector gate included) and takes the exact top-fetchN.
    * The two rank lists fuse by reciprocal-rank fusion
    * ([[Retrieval.rrf]]) — rank-only arithmetic, so the fusion is exact
    * whatever the legs' score scales are.
    *
    * 100 TB shape: the keyword leg reads O(matching postings) off the
    * tp-pruned sidecar, the vector leg is one corpus scan (or the PQ/IVF
    * routes via [[queryTextPq]] for callers that want the coded leg);
    * the fusion joins two ≤fetchN-row lists — driver never sees rows. */
  def queryHybridText(text: String, k: Int, fetchN: Int = 50,
                      rrfK: Int = 60,
                      where: Option[Where] = None,
                      whereDoc: Option[WhereDocument] = None): DataFrame =
    hybridFuse(text, k, fetchN, rrfK, where, whereDoc)(
      queryText(Seq(text), fetchN, where, whereDoc))

  /** The shared hybrid skeleton (see [[queryHybridText]] /
    * [[queryHybridTextPq]] — one written form of the gates, the keyword
    * leg and the fusion; only the vector leg is plugged in): tokenize
    * with the corpus rule, keyword top-fetchN, rrf-fuse with the given
    * vector leg's (id, rnk), top-k. `vectorLeg` is by-name so its gates
    * (e.g. the PQ index requirement) fire inside this call, loudly. */
  private def hybridFuse(text: String, k: Int, fetchN: Int, rrfK: Int,
                         where: Option[Where] = None,
                         whereDoc: Option[WhereDocument] = None)
                        (vectorLeg: => DataFrame): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(fetchN >= k, s"fetchN ($fetchN) must be >= k ($k)")
    val terms = queryTerms(text)
    require(terms.nonEmpty, s"query text '$text' has no tokens")
    // prefilters apply to BOTH legs before their top-fetchN (the caller
    // passes the same where/whereDoc into its vector leg), so every
    // fused id satisfies the filter and each leg's fetchN slots all go
    // to eligible documents — filtering the fused list instead would
    // silently return < k rows whenever ineligible docs crowd a leg
    val kw = keywordTopK(terms, fetchN, where = where, whereDoc = whereDoc)
      .select(col("id"), col("rnk"))
    val vr = vectorLeg.select(col("id"), col("rnk"))
    Retrieval.rrf(Seq(kw, vr), "id", "rnk", rrfK)
      .orderBy(col("rrf").desc, col("id")).limit(k)
  }

  /** [[queryHybridText]] with BOTH legs index-confined — the 100 TB
    * serving hybrid: the keyword leg reads O(matching postings) off the
    * tp-pruned keyword sidecar, the vector leg runs [[queryTextPq]]'s
    * codes-only ADC scan inside the probed IVF cells (m bytes/row, the
    * embedding column unread until the refine). Vector-leg ranks are the
    * PQ pipeline's REFINED ranks (approximate shortlist → exact re-rank),
    * so the fusion inherits PQ's recall dial (`nprobe`/`adcFetchN`) —
    * exactly the trade a serving stack tunes. `fetchN` is both legs'
    * list depth; `adcFetchN` the ADC shortlist (0 = size-aware default). */
  def queryHybridTextPq(text: String, k: Int, fetchN: Int = 50,
                        nprobe: Int = 0, adcFetchN: Int = 0,
                        rrfK: Int = 60,
                        where: Option[Where] = None,
                        whereDoc: Option[WhereDocument] = None): DataFrame =
    hybridFuse(text, k, fetchN, rrfK, where, whereDoc)(
      queryTextPq(Seq(text), fetchN, nprobe, adcFetchN, where, whereDoc))

  /** The BATCH form of [[queryHybridText]]: one sidecar read serves every
    * text's keyword leg ([[keywordTopKBatch]]), one [[queryText]] batch
    * serves every vector leg, and the fusion joins per (qid, id). Output
    * (qid, id, rrf) — each qid's rows exactly its single-text
    * [[queryHybridText]] answer. */
  def queryHybridTextBatch(texts: Seq[String], k: Int, fetchN: Int = 50,
                           rrfK: Int = 60,
                           where: Option[Where] = None,
                           whereDoc: Option[WhereDocument] = None): DataFrame = {
    require(texts.nonEmpty, "queryHybridTextBatch needs at least one text")
    require(k > 0, s"k must be positive, got $k")
    require(fetchN >= k, s"fetchN ($fetchN) must be >= k ($k)")
    val termSets = texts.map(queryTerms)
    termSets.zip(texts).foreach { case (ts, t) =>
      require(ts.nonEmpty, s"query text '$t' has no tokens") }
    val kw = keywordTopKBatch(termSets, fetchN, where = where, whereDoc = whereDoc)
      .select(col("qid"), col("id"), col("rnk"))
    val vr = queryText(texts, fetchN, where, whereDoc)
      .select(col("qid"), col("id"), col("rnk"))
    val fused = Retrieval.rrfKeyed(Seq(kw, vr), Seq("qid", "id"), "rnk", rrfK)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("rrf").desc, col("id"))
    fused.withColumn("__rk", row_number().over(w)).filter(col("__rk") <= k)
      .drop("__rk").orderBy(col("qid"), col("rrf").desc, col("id"))
  }

  /** Hybrid retrieval + cross-encoder RERANK as one call — the full
    * three-stage RAG read path (retrieve → fuse → rerank): the query
    * text drives [[queryHybridText]]'s fused top-fetchN (both legs,
    * same prefilters), the candidates' documents are point-read with
    * the get(ids) bucket pruning, and `fn` re-scores every (text,
    * document) pair — [[graft.operators.Rerank.rerank]]'s batched
    * mapPartitions, ties broken by the fused prior rank (stable).
    * Returns (id, rnk, score), rnk 1..k by reranked order.
    *
    * Bounded by construction: the candidate list is ≤ fetchN rows (the
    * retrieval contract), so the id collect, the pruned document read
    * and the rank window are all client-sized — the corpus never feeds
    * the scorer. Like [[queryBatchOf]]'s embeddings path, the fused
    * kNN executes eagerly at call time (the candidate ids prune the
    * document read). */
  def queryRerankText(text: String, k: Int, fn: graft.operators.RerankFunction,
                      fetchN: Int = 50, rrfK: Int = 60,
                      where: Option[Where] = None,
                      whereDoc: Option[WhereDocument] = None): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(fetchN >= k, s"fetchN ($fetchN) must be >= k ($k)")
    val m = meta
    require(snapshotDF(m).columns.contains("document"),
      s"collection '${m.name}' carries no document column — rerank scores " +
        "(query, document) pairs")
    val fused = queryHybridText(text, fetchN, fetchN, rrfK, where, whereDoc)
    // prior = the fused order (rrf desc, id) — the tie-break rerank
    // preserves among equal scores; bounded collect (≤ fetchN rows)
    val prior = fused.orderBy(col("rrf").desc, col("id"))
      .collect().map(_.getAs[String]("id")).zipWithIndex
      .map { case (id, i) => (id, i + 1) }
    val spark = snapshotDF(m).sparkSession
    import spark.implicits._
    if (prior.isEmpty)
      // zero candidates (a prefilter excluded everything): empty result —
      // get(ids = Nil) means NO id filter and would scan the whole corpus
      // just to inner-join it against nothing
      return Seq.empty[(String, Int, Double)].toDF("id", "rnk", "score")
    val cands = broadcast(prior.toSeq.toDF("id", "prior"))
    val docs = get(ids = prior.map(_._1).toSeq,
      include = Some(Set("documents"))).select(col("id"), col("document"))
    graft.operators.Rerank.rerank(
      cands.join(docs, Seq("id"), "inner"), "id", "document", "prior",
      text, fn, k)
  }

  /** Late-interaction read path (ColBERT MaxSim) as ONE call — the rung
    * between the fused/keyword retrieval and the cross-encoder rerank:
    * keyword shortlist (sidecar-served when current, prefilters applied
    * at the same rank boundary as every keyword read) → candidates'
    * documents point-read (`get(ids)` bucket pruning, the rerank path's
    * discipline) → chunked (`chunkTokens`/`overlap` windows) → chunks
    * embedded with the collection's RECORDED embedding function → each
    * query TERM embedded alone (ColBERT's per-token query encoding, the
    * analyzer's own tokenization) → score(doc) = Σ over terms of the
    * best-chunk cosine ([[graft.operators.Retrieval.maxSimTopK]]).
    * Every stage past the shortlist is bounded by fetchN — the staged
    * shape that holds at 100 TB (BASELINE r16: whole-corpus MaxSim is
    * ×52 at 100× rows; this path's cost is the shortlist's). */
  def queryMaxSimText(text: String, k: Int, fetchN: Int = 50,
                      chunkTokens: Int = 32, overlap: Int = 8,
                      where: Option[Where] = None,
                      whereDoc: Option[WhereDocument] = None): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(fetchN >= k, s"fetchN ($fetchN) must be >= k ($k)")
    val m = meta
    require(snapshotDF(m).columns.contains("document"),
      s"collection '${m.name}' carries no document column — MaxSim scores " +
        "chunk vectors of the document text")
    val efName = m.metadata.getOrElse("embedding_function",
      throw new IllegalStateException(
        s"collection '$name' has no registered embedding function — " +
          "hydrate via addDocuments; MaxSim embeds chunks AND query tokens"))
    val ef = resolveEmbedder(efName)
    val terms = graft.operators.Retrieval.queryTerms(text, analyzerOf(m))
    require(terms.nonEmpty, s"query text '$text' has no tokens under the " +
      s"'${analyzerOf(m)}' analyzer")
    // bounded collect (≤ fetchN rows) — same contract as the rerank prior
    val cand = keywordTopK(terms, fetchN, where = where, whereDoc = whereDoc)
      .select("id").collect().map(_.getString(0)).toSeq
    val spark = snapshotDF(m).sparkSession
    import spark.implicits._
    if (cand.isEmpty)
      return Seq.empty[(String, Double)].toDF("id", "score")
    val docs = get(ids = cand, include = Some(Set("documents")))
      .select(col("id"), col("document"))
    val chunks = graft.functions.TextAnalysis.chunk(
      docs, "id", "document", chunkTokens, overlap)
    graft.operators.Retrieval.maxSimTopK(
      ef.embedFrame(chunks, "chunk_text", "cvec"), "id", "cvec",
      terms.map(ef.embedOne), k)
  }

  /** The layout-owned columns of an index build dir: always `cell`, plus
    * `pb` ONLY when the build actually has pb slices (r8+ layouts) — a
    * pre-r8 legacy build cannot own a `pb` column, so one appearing there
    * is USER data and must survive the read (indexableMeta rejects the
    * name for every new build, so the ambiguity cannot recur). */
  private def indexLayoutCols(build: Path): Seq[String] =
    if (hasPbSlices(build, "cell=")) Seq("cell", "pb") else Seq("cell")

  /** B6 query: top-k nearest neighbors with optional prefilters. When a
    * committed index matches the current version, the scan prunes to the
    * `nprobe` nearest cells (Chroma parity: its HNSW read path is also
    * approximate); `exact = true` forces the full brute-force scan. */
  /** Guard against the silent-garbage failure mode of a dimension
    * mismatch: VectorDistance yields NULL when lengths differ, and a rank
    * window sorts nulls first — the caller would get k arbitrary rows
    * with null distances instead of an error. One-row probe, Chroma-add
    * parity (Chroma rejects mismatched dimensions at query time too). */
  private def requireDim(qdim: Int): Unit =
    dim().foreach { d =>
      require(d == qdim,
        s"query vector dimension $qdim != collection dimension $d")
    }

  /** The collection's embedding dimension (None while empty): a one-row
    * probe, valid because add/hydrate enforce uniform dimensions. */
  def dim(): Option[Int] =
    currentData.flatMap(_ =>
      toDF.select(size(col("embedding")).as("d")).limit(1).collect()
        .headOption.map(_.getInt(0)))

  /** A positive-integer tuning key from collection metadata. LOUD on a
    * present-but-malformed value: silently falling back to a default on a
    * typo'd `ivf:nprobe` would be an invisible recall regression. */
  private def metaPositiveInt(m: CollectionMeta, key: String): Option[Int] =
    m.metadata.get(key).map { raw =>
      val v = scala.util.Try(raw.trim.toInt).getOrElse(
        throw new IllegalArgumentException(
          s"collection metadata $key='$raw' is not an integer"))
      require(v > 0, s"collection metadata $key must be positive, got $v")
      v
    }

  /** Per-call nprobe resolution: a positive value wins; 0 (the default)
    * falls back to the collection's `ivf:nprobe` metadata (Chroma-style
    * collection-level tuning, our analog of `hnsw:search_ef`), then 4. */
  private def resolveNprobe(m: CollectionMeta, nprobe: Int): Int = {
    require(nprobe >= 0, s"nprobe must be >= 0 (0 = collection default), got $nprobe")
    if (nprobe > 0) nprobe else metaPositiveInt(m, "ivf:nprobe").getOrElse(4)
  }

  private def requireNoReserved(df: DataFrame, reserved: Seq[String]): Unit = {
    val clash = df.columns.intersect(reserved)
    require(clash.isEmpty,
      s"collection columns ${clash.mkString(", ")} collide with kNN output names; rename them")
  }

  def query(queryVec: Seq[Float], k: Int, where: Option[Where] = None,
            whereDoc: Option[WhereDocument] = None, nprobe: Int = 0,
            exact: Boolean = false): DataFrame = {
    requireDim(queryVec.length)
    val m = meta
    ivfOrScan(m, exact) match {
      case Some((idxPath, cents)) =>
        val cells = Ann.nearestCellsOf(cents, queryVec, resolveNprobe(m, nprobe))
        val indexed = readIndexBuild(idxPath)
        // `codes` on a PQ-coded build (= the codebook sidecar exists) is
        // index layout like cell/pb — the exact read path must not leak it
        // into results; keyed on the SIDECAR, not the column name, so a
        // plain IVF build over a user data column named codes keeps it
        val layoutCols = indexLayoutCols(idxPath) ++
          (if (pqModelOf(idxPath).isDefined) Seq("codes") else Nil)
        requireNoReserved(indexed.drop(layoutCols: _*), Seq("dist"))
        // `cell` is the index layout's partition column — the isin lands in
        // the scan as a PartitionFilter, so only the probed cells' files
        // are even listed (PlanShapeSpec pins this)
        val pruned = docIndexConfine(
          indexed.filter(col("cell").isin(cells: _*)), m, whereDoc)
        Knn.topK(pruned, "id", "embedding", queryVec, k, m.space,
          ChromaFilter.predicate(where, whereDoc, col("document"), keyResolver(indexed)))
          .drop(layoutCols: _*)
      case None =>
        val df = docIndexConfine(snapshotDF(m), m, whereDoc)
        requireNoReserved(df, Seq("dist"))
        Knn.topK(df, "id", "embedding", queryVec, k, m.space,
          ChromaFilter.predicate(where, whereDoc, col("document"), keyResolver(df)))
    }
  }

  /** B6 batch form: Chroma's `query` accepts a LIST of query embeddings
    * and returns per-query result sets. `qid` is the 0-based position of
    * the query vector; results carry `(qid, rnk, id, dist, ...)`. One
    * broadcast of the (tiny) query set against one corpus scan — never a
    * per-query rescan. */
  def queryBatch(queryVecs: Seq[Seq[Float]], k: Int, where: Option[Where] = None,
                 whereDoc: Option[WhereDocument] = None, nprobe: Int = 0,
                 exact: Boolean = false): DataFrame =
    queryBatchOf(meta, queryVecs, k, where, whereDoc, nprobe, exact)

  /** [[queryBatch]] against ONE caller-held meta snapshot — the entry
    * point for read surfaces that pair the hit set with OTHER reads of
    * the same snapshot (queryStruct's embeddings join): both sides must
    * see the same version, per the snapshot rule at [[snapshotDF]]. */
  private def queryBatchOf(m: CollectionMeta, queryVecs: Seq[Seq[Float]], k: Int,
                           where: Option[Where], whereDoc: Option[WhereDocument],
                           nprobe: Int, exact: Boolean): DataFrame = {
    require(queryVecs.nonEmpty, "queryBatch needs at least one query vector")
    require(queryVecs.map(_.length).distinct.size == 1,
      s"query vectors must share one dimension, got ${queryVecs.map(_.length).distinct}")
    requireDim(queryVecs.head.length)
    ivfOrScan(m, exact) match {
      case Some((idxPath, cents)) =>
        // per-query probe sets, chosen driver-side from the tiny centroid
        // table; the corpus scan prunes to the UNION of probed cells at the
        // file-listing level, and the broadcast join condition then keeps
        // each (query, row) pair only when the row's cell is in THAT
        // query's probe set — one pruned scan serves the whole batch.
        val np = resolveNprobe(m, nprobe)
        val cellsPerQ = queryVecs.map(v => Ann.nearestCellsOf(cents, v, np))
        val allCells = cellsPerQ.flatten.distinct
        val indexed = readIndexBuild(idxPath)
        // see query(): codes is index layout iff the PQ sidecar exists
        val layoutCols = indexLayoutCols(idxPath) ++
          (if (pqModelOf(idxPath).isDefined) Seq("codes") else Nil)
        requireNoReserved(indexed.drop(layoutCols: _*),
          Seq("qid", "rnk", "dist", "__qvec", "__qcells", "__na", "__nq"))
        val pruned = docIndexConfine(
          indexed.filter(col("cell").isin(allCells: _*)), m, whereDoc)
        ChromaFilter.predicate(where, whereDoc, col("document"), keyResolver(indexed))
          .map(pruned.filter).getOrElse(pruned) match { case base =>
            val spark0 = base.sparkSession
            import spark0.implicits._
            val queries = queryVecs.zipWithIndex
              .map { case (v, i) => (i, v, cellsPerQ(i)) }.toDF("qid", "__qvec", "__qcells")
            val w = Window.partitionBy(col("qid")).orderBy(col("dist"), col("id"))
            base.join(broadcast(queries), array_contains(col("__qcells"), col("cell")))
              .withColumn("dist",
                graft.functions.Distances.bySpace(m.space)(col("embedding"), col("__qvec")))
              .withColumn("rnk", row_number().over(w))
              .filter(col("rnk") <= k)
              .drop("embedding" +: "__qvec" +: "__qcells" +: layoutCols: _*)
        }
      case None =>
        val df = docIndexConfine(snapshotDF(m), m, whereDoc)
        requireNoReserved(df, Seq("qid", "rnk", "dist", "__qvec", "__na", "__nq"))
        val spark0 = df.sparkSession
        import spark0.implicits._
        val queries = queryVecs.zipWithIndex.map(_.swap).toDF("qid", "qvec")
        Knn.topKBatch(df, "id", "embedding", queries, "qid", "qvec", k, m.space,
          ChromaFilter.predicate(where, whereDoc, col("document"), keyResolver(df)),
          excludeSelf = false)
    }
  }

  /** Chroma result-SHAPE parity: `collection.query` returns parallel
    * per-query lists (`ids`, and — under `include=` control — `documents`,
    * `distances`, `metadatas`). This is a thin fold over [[queryBatch]]'s
    * long form: one `collect_list` per query id (k elements each, never
    * corpus-sized), rank-ordered via the struct's leading `rnk` field.
    * Metadata = every stored column that isn't id/document/embedding,
    * stringified into one map per hit (the flat typed columns stay the
    * pushdown layout; this is presentation only).
    *
    * Laziness caveat: with include("embeddings") the call is EAGER — the
    * kNN executes (and any error surfaces) at call time, because the hit
    * set (≤ nq·k rows, client-sized by contract) is materialized once to
    * dedup the expensive search out of the vector join-back below. Every
    * other include set returns the usual lazy frame.
    */
  def queryStruct(queryVecs: Seq[Seq[Float]], k: Int,
                  where: Option[Where] = None,
                  whereDoc: Option[WhereDocument] = None,
                  include: Set[String] = Set("documents", "distances", "metadatas"),
                  nprobe: Int = 0, exact: Boolean = false): DataFrame = {
    val unknown = include.diff(
      Set("documents", "distances", "metadatas", "embeddings", "uris", "data"))
    require(unknown.isEmpty, s"unknown include entries: ${unknown.mkString(", ")}")
    val m = meta
    val long0 = queryBatchOf(m, queryVecs, k, where, whereDoc, nprobe, exact)
    // Chroma's query(include=["embeddings"]) returns per-hit VECTORS; the
    // long form deliberately drops them (k vectors per query would bloat
    // every read that doesn't ask) — join them back by id against one
    // column-pruned (id, embedding) scan of the SAME snapshot the hits
    // came from (a toDF here would re-read meta; a commit landing in
    // between would pair old-vector distances with newer vectors — the
    // rule at [[snapshotDF]]). The hit set is MATERIALIZED once (bounded:
    // ≤ nq·k rows — this is the presentation path, whose whole output is
    // client-sized by contract) so the expensive kNN executes a single
    // time: referencing long0 twice in one plan would run the entire
    // search twice (the two subtrees differ, ReuseExchange cannot
    // deduplicate them). The id literals confine the embedding scan via
    // parquet pushdown, and the LEFT join preserves every hit row: a hit
    // can never silently drop to fewer than k entries.
    val long = if (!include("embeddings")) long0
      else {
        val hitRows = long0.collect()
        val hits = spark.createDataFrame(
          spark.sparkContext.parallelize(hitRows.toIndexedSeq, 1), long0.schema)
        val hitIds = hitRows.map(_.getAs[Any]("id")).distinct.toSeq
        val embs = snapshotDF(m).select(col("id"), col("embedding").as("__emb"))
          .filter(col("id").isin(hitIds: _*))
        hits.join(broadcast(embs), Seq("id"), "left")
      }
    val fields: Seq[FoldField] =
      ("id", "ids", col("id")) +:
      (docField(long, include("documents")) ++
        (if (include("distances")) Seq(("dist", "distances", col("dist"))) else Nil) ++
        (if (include("embeddings")) Seq(("embedding", "embeddings", col("__emb"))) else Nil) ++
        uriDataFields(long, include) ++
        metaField(long, include("metadatas"),
          exclude = Seq("qid", "rnk", "id", "dist", "document", "embedding", "__emb", "uri", "data")))
    // rnk is a dense per-query row_number, so subtraction is a valid
    // total-order comparator (the default struct ordering cannot sort a
    // payload carrying a MAP field)
    val rows = sortedRows(long, Seq("qid"), col("rnk"), (l, r) => l - r, fields)
    // Chroma returns one entry PER QUERY VECTOR — a query whose filter
    // leaves zero hits gets empty lists, not a missing row (the groupBy
    // alone would drop it and misalign positional zips in the caller)
    val allQ = spark.range(queryVecs.size.toLong)
      .select(col("id").cast("int").as("qid"))
    val full = allQ.join(rows, Seq("qid"), "left")
      .withColumn("rows", coalesce(col("rows"), array()))
    extractLists(full, Seq("qid"), fields).orderBy("qid")
  }

  // ---- shared presentation fold for queryStruct/getStruct ----
  // (payload field name, output list name, source expression)
  private type FoldField = (String, String, Column)

  /** Chroma's multimodal record fields (`include=["uris","data"]`): `uris`
    * surfaces a `uri` column, `data` a binary `data` column. A collection
    * without the column still answers the include — with nulls, exactly
    * like a Chroma collection whose records carry no uri/data. */
  private def uriDataFields(df: DataFrame, include: Set[String]): Seq[FoldField] = {
    def f(colName: String, listName: String, tpe: String): Seq[FoldField] =
      if (!include(listName)) Nil
      else if (df.columns.contains(colName)) Seq((colName, listName, col(colName)))
      else Seq((colName, listName, lit(null).cast(tpe)))
    f("uri", "uris", "string") ++ f("data", "data", "binary")
  }

  private def docField(df: DataFrame, on: Boolean): Seq[FoldField] =
    if (on && df.columns.contains("document"))
      Seq(("document", "documents", col("document"))) else Nil

  /** The per-hit metadata map: a collection either flattens metadata into
    * typed columns (stringified here) or carries Chroma's own
    * MAP<STRING,STRING> `metadata` column (returned AS the map — callers
    * get real key/values, not a stringified blob); both layouts may even
    * coexist (map_concat, duplicate keys rejected by Spark's policy). */
  private def metaField(df: DataFrame, on: Boolean,
                        exclude: Seq[String]): Seq[FoldField] = {
    if (!on) return Nil
    val hasMap = df.schema.fields.exists(f =>
      f.name == "metadata" && f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
    val flat = df.columns.filterNot((exclude :+ "metadata").contains).sorted
    val flatMap =
      if (flat.isEmpty) None
      else Some(map(flat.flatMap(c => Seq(lit(c), col(c).cast("string"))): _*))
    val m = (hasMap, flatMap) match {
      case (true, Some(f)) => Some(map_concat(f, col("metadata").cast("map<string,string>")))
      case (true, None)    => Some(col("metadata").cast("map<string,string>"))
      case (false, f)      => f
    }
    m.map(("meta", "metadatas", _)).toSeq
  }

  /** Collect each group's rows into ONE array sorted by `sortKey` under
    * `cmp`; returns `groupKeys :+ rows`. */
  private def sortedRows(page: DataFrame, groupKeys: Seq[String],
                         sortKey: Column, cmp: (Column, Column) => Column,
                         fields: Seq[FoldField]): DataFrame = {
    val payload = struct(sortKey.as("__k") +: fields.map { case (f, _, e) => e.as(f) }: _*)
    val sorted = array_sort(collect_list(payload),
      (l, r) => cmp(l.getField("__k"), r.getField("__k"))).as("rows")
    if (groupKeys.isEmpty) page.agg(sorted)
    else page.groupBy(groupKeys.map(col): _*).agg(sorted)
  }

  /** Re-extract parallel per-field lists from the sorted rows array. */
  private def extractLists(grouped: DataFrame, groupKeys: Seq[String],
                           fields: Seq[FoldField]): DataFrame =
    grouped.select(groupKeys.map(col) ++ fields.map { case (f, o, _) =>
      transform(col("rows"), _.getField(f)).as(o)
    }: _*)

  /** B10 count / peek. */
  def count(): Long = currentData.fold(0L)(_ => toDF.count())
  def peek(n: Int = 10): DataFrame = toDF.orderBy("id").limit(n)

  /** B11 modify: rename is a catalog move; metadata is a meta.json update. */
  def modifyMetadata(kv: Map[String, String]): Unit = {
    val m = meta
    // the creation-time space/hnsw:space consistency check must not be
    // bypassable through the mutation path: a collection advertising one
    // space in Chroma-convention metadata while querying with another is
    // exactly the inconsistency it exists to prevent
    kv.get("hnsw:space").foreach(s => require(s == m.space,
      s"hnsw:space '$s' conflicts with the collection's space '${m.space}'"))
    // re-pointing the analyzer is legal (the keyword sidecar's per-build
    // stamp makes a stale build fall back to the scan path and the next
    // refresh rebuild in full) — but only to a rule that exists
    kv.get(Collection.AnalyzerKey)
      .foreach(graft.operators.Retrieval.requireAnalyzer)
    CollectionMeta.atomicWrite(io, dir, m.copy(metadata = m.metadata ++ kv))
  }

  /** Export the collection's current contents to an external sink
    * (parquet | csv | json). csv cannot carry array/map columns, so the
    * embedding is serialized to a comma-joined string and metadata to a
    * JSON string — a lossy but loadable interchange form. */
  def export(path: String, format: String = "parquet"): Unit = {
    val df = toDF
    format match {
      case "parquet" =>
        df.write.mode("overwrite").parquet(path)
        // identity sidecars ride the parquet export (underscore names —
        // both Spark and DuckDB parquet readers skip them as metadata):
        // space + metadata travel in `_graft_meta.json`, and a fitted
        // embedding model in `_embedder.txt` — without them an exported
        // collection imports as data-only and loses queryText (the
        // binding names a model only the source collection held)
        val m = meta
        io.writeBytes(new Path(path, Collection.ExportMetaName),
          CollectionMeta.toJson(m).getBytes(StandardCharsets.UTF_8))
        val sidecar = new Path(dir, Collection.EmbedderSidecar)
        if (io.exists(sidecar))
          io.writeBytes(new Path(path, Collection.EmbedderSidecar),
            io.readBytes(sidecar))
      case "json" => df.write.mode("overwrite").json(path)
      case "csv" =>
        val flat = df.columns.foldLeft(df) { (acc, c) =>
          acc.schema(c).dataType.typeName match {
            case "array" => acc.withColumn(c, concat_ws(",", col(c)))
            case "map"   => acc.withColumn(c, to_json(col(c)))
            case _       => acc
          }
        }
        flat.write.mode("overwrite").option("header", "true").csv(path)
      case other => throw new IllegalArgumentException(
        s"unknown export format '$other' (parquet|csv|json)")
    }
  }

  /** Committed versions still on disk, ascending — the time-travel axis.
    * Copy-on-write already retains every superseded version until
    * [[vacuum]]; this lists the ones whose commit marker AND data dir
    * both survive (an uncommitted claim or a vacuumed dir is not
    * readable history). */
  def history(): Seq[Int] = io.list(dir)
    .filter(e => e.isDir && e.name.startsWith("data_v"))
    .map(e => e.name.stripPrefix("data_v").toInt)
    .filter(v => io.exists(CollectionMeta.commitMarker(dir, v)))
    .sorted

  /** Time-travel read: the collection exactly as committed at `version`.
    * Free — the COW layout IS the snapshot; nothing is copied. */
  def toDFAt(version: Int): DataFrame = {
    require(io.exists(dataDir(version)) &&
        io.exists(CollectionMeta.commitMarker(dir, version)),
      s"version $version is not a committed on-disk version " +
        s"(available: ${history().mkString(", ")})")
    readVersion(version).drop("pt")
  }

  /** Resolved PHYSICAL leaf dirs (`<owner>/pt=<b>`) of one committed
    * version's data, carry manifest applied — the binding surface for
    * [[graft.sources.GraftDataSource]] (`spark.read.format("graft")`):
    * a plain parquet relation over these dirs reads exactly [[toDFAt]]'s
    * content (leaf dirs as scan ROOTS, so the internal `pt` bucket
    * column never infers — the same shape toDF's drop produces). */
  private[graft] def leafDataDirs(version: Int): Seq[String] = {
    require(io.exists(dataDir(version)) &&
        io.exists(CollectionMeta.commitMarker(dir, version)),
      s"version $version is not a committed on-disk version " +
        s"(available: ${history().mkString(", ")})")
    Carry.owners(io, dir, dataDir(version), "pt=").toSeq.sortBy(_._1)
      .map { case (part, owner) => new Path(owner, part).toString }
  }

  /** [[leafDataDirs]] confined to the `pt` buckets a literal id list can
    * live in (the writer's own hash, evaluated driver-side — exactly
    * [[ptBucketsOf]]'s point-read rule, surfaced for the SQL read path's
    * `ids` option): the result is a SUPERSET binding — whole buckets, not
    * rows — so callers must still filter by id. Falls back to every leaf
    * dir when the stored id column is not STRING (the hash is
    * type-sensitive; a legacy layout must stay correct over fast).
    *
    * Schema caveat (documented at the SQL surface too): a relation bound
    * over the pruned dirs infers its schema from THEIR footers only — a
    * column that union-by-name evolution introduced in unbound buckets
    * only is invisible through this binding. Inferring from the full
    * listing instead would pay the O(all files) footer pass the option
    * exists to avoid; the contract is therefore rows-superset,
    * schema-of-the-pruned-buckets. */
  private[graft] def leafDataDirsForIds(version: Int, ids: Seq[String]): Seq[String] = {
    val all = leafDataDirs(version)
    // id TYPE probed from ONE leaf dir's footers — the key column is
    // written in every bucket of every version, so one dir suffices; a
    // carry-resolved whole-version read here would pay the O(all files)
    // footer pass this option exists to avoid. Non-string legacy layouts
    // fall back to the full listing (the hash is type-sensitive —
    // correct over fast), as does an unreadable probe.
    val idIsString = scala.util.Try(spark.read.parquet(all.head).schema).toOption
      .flatMap(_.fields.find(_.name == "id"))
      .exists(_.dataType == org.apache.spark.sql.types.StringType)
    if (!idIsString) all
    else {
      val want = ids.map(ptOfString).distinct.map(b => s"pt=$b").toSet
      val pruned = all.filter(d => want.contains(new Path(d).getName))
      // every wanted bucket dir may be absent (ids hashing to buckets
      // that never received rows): the true answer is empty, but a V1
      // relation needs >= 1 root to carry a schema — bind ONE bucket
      // (cheapest correct superset; the caller's id filter empties it)
      if (pruned.nonEmpty) pruned else all.take(1)
    }
  }

  /** Roll back by rolling FORWARD: commit a NEW version whose content is
    * `version`'s — every bucket carried by [[Carry]] manifest (O(buckets)
    * metadata, zero data movement on any filesystem). The claim protocol
    * stays monotonic — readers never see the pointer move backwards,
    * history keeps the bad versions for the audit trail, and a concurrent
    * writer conflicts loudly instead of silently losing the rollback. Any
    * index on the current version is NOT carried (it describes the
    * rolled-back-FROM content); rebuild after rolling back. */
  def rollbackTo(version: Int): Unit = {
    val m = meta
    require(version != m.version, s"already at version $version")
    require(io.exists(dataDir(version)) &&
        io.exists(CollectionMeta.commitMarker(dir, version)),
      s"cannot roll back to non-committed/vacuumed version $version " +
        s"(available: ${history().mkString(", ")})")
    val next = claimNext(m)
    val newDir = dataDir(next.version)
    try {
      io.mkdirs(newDir)
      Carry.write(io, newDir, Carry.owners(io, dir, dataDir(version), "pt=")
        .map { case (part, owner) => part -> owner.getName })
    } catch { case e: Throwable => abandon(next); throw e }
    commit(next)
  }

  /** Rewrite the current version into a fresh one with freshly-packed
    * files: every point upsert/delete leaves one-or-few-row files in the
    * touched buckets, and after thousands of mutations scan parallelism
    * degrades into a small-files problem. Compaction is a normal commit
    * (claim → rewrite all buckets → marker → pointer), so it is safe
    * against concurrent writers and readers; follow with [[vacuum]] to
    * reclaim the superseded bytes. */
  def compact(): Unit = {
    val m = meta
    currentDataOf(m).foreach { _ =>
      // full local rewrite: the new version carries NOTHING, so compaction
      // also collapses a long mutation history's carry-manifest owner
      // spread back to one dir (run vacuum after to reclaim the old dirs)
      val df = readVersion(m.version).drop("pt")
      writeVersion(df, m, repack = true)
    }
  }

  /** Repack the CURRENT version's committed index builds into fresh
    * manifest-free builds with one file per leaf slice — the index-side
    * analog of [[compact]]. A long refresh chain leaves (a) a carry-
    * owner spread across superseded build dirs and (b) one small file
    * per refresh in every touched slice; both multiply per-file listing
    * and footer costs at read time (the `nlist × numBuckets` dir count
    * is the structural part; this removes the per-refresh multiplier and
    * collapses the spread so the next [[vacuum]] reclaims every
    * carried-from build).
    *
    * `keepRefreshAxis = false` additionally drops the `pb` id-bucket
    * axis (layout `cell=<c>` / `gp=<g>` only — numBuckets× fewer leaf
    * dirs), the read-optimized shape for a serving-frozen collection:
    * queries are unchanged, but the NEXT refresh after a mutation pays a
    * full rebuild (no pb slices left to diff against).
    *
    * Returns the number of builds compacted (0-3). Same MVCC discipline
    * as every build: fresh claimed dir at the SAME version, marker last,
    * readers adopt only the newest committed build — a concurrent reader
    * never sees a partial compaction. */
  def compactIndexes(keepRefreshAxis: Boolean = true): Int = {
    val m = meta
    var n = 0
    currentIndex(m).foreach { case (old, cents) =>
      val claimed = claimIndexBuild(m.version)
      val assigned0 = readIndexBuild(old)
      val withPb = keepRefreshAxis && assigned0.columns.contains("pb")
      val assigned = if (withPb) assigned0 else assigned0.drop("pb")
      // one task per cell → exactly one file per leaf slice
      Ann.writeIvf(Ann.IvfModel(cents, assigned.repartition(col("cell"))),
        claimed.toString, withPb = withPb)
      // a PQ-coded build keeps its codebooks through the repack (codes
      // ride automatically — they are a data column)
      pqModelOf(old).foreach(p =>
        Ann.writePqSidecar(claimed, p, spark.sparkContext.hadoopConfiguration))
      io.writeBytes(new Path(claimed, "_graft_committed"), Array.emptyByteArray)
      n += 1
    }
    currentDocIndex(m).foreach { old =>
      val claimed = claimDocIndexBuild(m.version)
      val postings0 = readIndexBuild(old)
      val withPb = keepRefreshAxis && postings0.columns.contains("pb")
      val postings = if (withPb) postings0 else postings0.drop("pb")
      val parts = if (withPb) Seq("gp", "pb") else Seq("gp")
      postings.repartition(col("gp")).write.mode("overwrite")
        .option("maxRecordsPerFile", maxRowsPerFile)
        .partitionBy(parts: _*).parquet(claimed.toString)
      io.writeBytes(new Path(claimed, "_graft_committed"), Array.emptyByteArray)
      n += 1
    }
    currentKwIndex(m).foreach { old =>
      val claimed = claimKwIndexBuild(m.version)
      val postings0 = readIndexBuild(old)
      val withPb = keepRefreshAxis && postings0.columns.contains("pb")
      // dropping the pb axis merges the per-bucket STATS rows' slices
      // too — they keep their reserved tp partition, and queries sum
      // them regardless of slicing, so corpus totals are unchanged
      val postings = if (withPb) postings0 else postings0.drop("pb")
      val parts = if (withPb) Seq("tp", "pb") else Seq("tp")
      postings.repartition(col("tp")).write.mode("overwrite")
        .option("maxRecordsPerFile", maxRowsPerFile)
        .partitionBy(parts: _*).parquet(claimed.toString)
      io.writeBytes(new Path(claimed, "_graft_committed"), Array.emptyByteArray)
      n += 1
    }
    n
  }

  /** Drop superseded copy-on-write versions, keeping the current one plus
    * `keepHistory` predecessors. A superseded dir that a retained
    * version's carry manifest still references for physical bytes
    * survives (reachability, not link counts) — only truly dead dirs are
    * freed, at whole-dir granularity; `compact()` first when minimal
    * footprint matters. Storage hygiene for long-lived collections under
    * frequent upserts. */
  def vacuum(keepHistory: Int = 0): Int = {
    require(keepHistory >= 0,
      s"keepHistory must be >= 0, got $keepHistory (negative would delete the LIVE version)")
    val current = meta.version
    val cutoff = current - keepHistory
    def versionOf(p: Path): Int =
      p.getName.dropWhile(!_.isDigit).takeWhile(_.isDigit).toInt
    // both index KINDS (IVF `index_v`, postings `docindex_v`) follow the
    // same build discipline and are vacuumed alike; live-build tracking is
    // keyed (kind, version) so the kinds never shadow each other.
    // ORDER MATTERS in kindOf: "docindex_v" would also prefix-match a
    // startsWith("index_v")==false, but keep the longer prefix first
    // anyway so the intent is explicit.
    def kindOf(p: Path): Option[String] = {
      val n = p.getName
      if (n.startsWith("docindex_v")) Some("docindex")
      else if (n.startsWith("kwindex_v")) Some("kwindex")
      else if (n.startsWith("index_v")) Some("index")
      else None
    }
    val versioned = io.list(dir)
      .filter(e => e.isDir && (e.name.startsWith("data_v") || kindOf(e.path).isDefined))
      .map(_.path)
    // retained versions still shed superseded/crashed index BUILDS — only
    // the highest committed build (the one readers adopt) survives
    val liveBuild: Map[(String, Int), Int] = versioned
      .filter(p => kindOf(p).isDefined && io.exists(new Path(p, "_graft_committed")))
      .groupBy(p => (kindOf(p).get, versionOf(p)))
      .view.mapValues(_.map(buildNumberOf).max).toMap
    val provisionallyDead = versioned.filter { p =>
      val v = versionOf(p)
      v < cutoff || kindOf(p).exists(k =>
        liveBuild.get((k, v)).exists(buildNumberOf(p) < _))
    }.toSet
    // Carry-manifest reachability: a superseded dir stays ALIVE while any
    // retained dir's manifest still points at it for physical bytes.
    // Manifests record direct physical owners (never chains), so one hop
    // from the retained set covers every live reference. (The retained
    // bytes are whole dirs — after long point-mutation runs, compact()
    // then vacuum() to collapse the owner spread and reclaim fully.)
    val referenced: Set[String] = versioned.filterNot(provisionallyDead)
      .flatMap(p => Carry.read(io, p).values).toSet
    val dead = provisionallyDead
      .filterNot(p => referenced.contains(p.getName)).toSeq
    dead.foreach(io.deleteRecursively)
    // A dir retained ONLY for its referenced bytes is RETIRED from
    // history: dropping its commit marker makes time travel / rollback /
    // build adoption refuse it, while its files keep serving the retained
    // manifests that point at them. Without this, a traveler could read a
    // byte-store dir whose OWN manifest references dirs this vacuum just
    // reclaimed — a torn snapshot. Retired ≠ reclaimed: it is not counted
    // in the returned total.
    provisionallyDead.filter(p => referenced.contains(p.getName))
      .foreach(p => io.deleteIfExists(new Path(p, "_graft_committed")))
    // retired version-claim files (cutoff <= current, so the commit record
    // of the live version always survives)
    io.list(dir).filter(e => CollectionMeta.isClaimFile(e.name))
      .filter(e => CollectionMeta.claimVersionOf(e.name) < cutoff)
      .foreach(e => io.deleteIfExists(e.path))
    dead.size
  }
}

object Collection {

  /** The fitted embedding-function model sidecar (see
    * [[graft.operators.FittedEmbeddingFunction]]): persisted at first
    * successful bind, required by every later resolution, carried by
    * fork. Unversioned file, versioned CONTRACT: the only sanctioned way
    * to change it is [[Collection.refit]], which re-embeds the whole
    * corpus in the same commit and pairs data with model via the
    * `embedding_model_fp` metadata fingerprint — ad-hoc re-fits are
    * rejected, and a sidecar that disagrees with the committed
    * fingerprint fails loudly at resolution. */
  val EmbedderSidecar = "_embedder.txt"

  /** Collection-identity sidecar of a parquet [[Collection.export]]
    * (underscore name — parquet readers skip it as metadata). */
  val ExportMetaName = "_graft_meta.json"

  /** Collection-metadata key prefix recording a metadata key's declared
    * Chroma type for the MAP layout ([[Collection.declareMetadataTypes]]). */
  val MetaTypePrefix = "meta:type:"

  /** Collection-metadata key naming the keyword-retrieval ANALYZER (one
    * of [[graft.operators.Retrieval.Analyzers]]; absent = "whitespace").
    * ONE tokenization rule for all three keyword sides — the corpus scan,
    * the persisted sidecar build (stamped per build,
    * [[graft.operators.KeywordIndex.AnalyzerStamp]]) and the query text —
    * recorded at collection level so every session resolves the same
    * rule. Same convention altitude as Chroma's `hnsw:space`. */
  val AnalyzerKey = "graft:analyzer"

  /** The distance spaces the engine implements (the Chroma set). Every
    * entry point that ACCEPTS a space name validates against this —
    * creation and the SQL surface's overwrite re-point — so a typo'd
    * space fails at the call, not years later as an 'unknown space'
    * analysis error on the first vector query against a committed meta. */
  val Spaces: Set[String] = Set("l2", "cosine", "ip")

  def requireSpace(s: String): Unit =
    require(Spaces.contains(s),
      s"unknown space '$s' — supported: ${Spaces.toSeq.sorted.mkString(", ")}")

  /** Keyword-sidecar analyzer stamps, cached per committed build dir: a
    * build is immutable once its marker lands, so the one-file read never
    * changes — without the cache EVERY keyword query on the sidecar path
    * pays a small-file read just to re-learn the same stamp (an object-
    * store tax). Coarse clear bounds the size, like [[staleProbe]]. */
  private[catalog] val kwStampCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Fingerprint pairing committed data with the model that embedded it
    * (first 8 SHA-256 bytes of the sidecar text, hex). */
  private[catalog] def modelFp(text: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map(b => f"$b%02x").mkString

  /** [[Collection]]'s stale-index warn memo: (dir, family, version)
    * triples already probed this JVM (see warnIfStale — bounds the
    * fallback-read listing tax to one LIST per version per family).
    * Size-capped by coarse clear: re-probing is the only cost. */
  private[catalog] val staleProbe =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Centroid sidecars parsed once per committed build. A committed build
    * dir is immutable, but a path CAN be reborn (drop collection →
    * recreate → rebuild lands on the same name), so the cache key carries
    * the commit marker's mtime as a nonce. */
  private val centroidCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[(Int, Array[Double])]]()

  private[catalog] def cachedCentroids(
      io: StoreIO, build: Path,
      hadoopConf: org.apache.hadoop.conf.Configuration): Option[Array[(Int, Array[Double])]] = {
    val marker = new Path(build, "_graft_committed")
    val key = s"$build@${io.modTime(marker)}"
    Option(centroidCache.get(key)).orElse {
      val parsed = graft.operators.Ann.readCentroids(build.toString, hadoopConf)
      parsed.foreach(centroidCache.put(key, _))
      parsed
    }
  }

  /** PQ codebook sidecars, cached like [[cachedCentroids]] (same
    * immutable-once-committed argument, same reborn-path nonce). The
    * None result is cached too — plain IVF builds would otherwise pay a
    * filesystem probe on every query/queryBatch layout decision. */
  private val pqCache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[graft.operators.Ann.PqModel]]()

  private[catalog] def cachedPqModel(
      io: StoreIO, build: Path,
      hadoopConf: org.apache.hadoop.conf.Configuration): Option[graft.operators.Ann.PqModel] = {
    val marker = new Path(build, "_graft_committed")
    val key = s"$build@${io.modTime(marker)}"
    Option(pqCache.get(key)).getOrElse {
      val parsed = graft.operators.Ann.readPqSidecar(build, hadoopConf)
      pqCache.put(key, parsed)
      parsed
    }
  }
}
