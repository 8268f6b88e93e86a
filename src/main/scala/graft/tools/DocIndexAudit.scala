package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.catalog.CollectionCatalog
import graft.operators.ChromaFilter

/** Scale evidence for the where_document postings index: hydrate the
  * documents table into a collection, then time `get($contains)` as a
  * LINEAR SCAN vs through the TRIGRAM POSTINGS INDEX (steady min of
  * `runs` each, count() consumption), plus the one-time index build
  * cost. Run at sf0.1 and the 10x replica to show the scan grows with
  * the corpus while the index path grows with the match set.
  *
  * Usage: DocIndexAudit <sfDir> [runs]
  */
object DocIndexAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val runs = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // 64 buckets: the refresh audit below needs touched ≪ total to show
    // confinement (a production store sizes buckets ≫ typical batch spread)
    val cat = new CollectionCatalog(spark, "/root/repo/target/docindex-audit", numBuckets = 64)
    cat.deleteCollection("dxa")
    val coll = cat.getOrCreateCollection("dxa")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("string").as("id"), col("text").as("document"))
    coll.add(docs)
    val n = coll.count()
    def secMin(f: => Long): (Double, Long) = {
      var best = Double.MaxValue; var rows = 0L
      (1 to runs).foreach { _ =>
        val t0 = System.nanoTime(); rows = f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (best, rows)
    }
    val phrase = "vector table"
    val wd = Some(ChromaFilter.Contains(phrase): ChromaFilter.WhereDocument)
    val (scanS, scanRows) = secMin(coll.get(whereDoc = wd).count())
    val t0 = System.nanoTime()
    coll.buildDocIndex()
    val buildS = (System.nanoTime() - t0) / 1e9
    val (idxS, idxRows) = secMin(coll.get(whereDoc = wd).count())
    require(scanRows == idxRows, s"index changed answers: $scanRows vs $idxRows")
    // IO-confinement facts — the 100 TB argument wall-clock cannot show at
    // fixture scale (where one full scan is milliseconds of IO and the
    // index path pays more FIXED stage setup): the scan touches every
    // corpus row on every call; the index path touches only the query
    // grams' gp partitions and their postings rows, independent of the
    // rest of the corpus.
    import graft.operators.DocIndex
    import graft.expressions.CharGrams
    val grams = CharGrams.gramsOf(phrase, DocIndex.N)
    val gps = grams.map(DocIndex.gpOf).distinct
    val idxDir = java.nio.file.Files.list(
        java.nio.file.Paths.get("/root/repo/target/docindex-audit/dxa"))
    val postingsPath = try {
      import scala.jdk.CollectionConverters._
      idxDir.iterator.asScala.filter(_.getFileName.toString.startsWith("docindex_v"))
        .toSeq.sortBy(_.getFileName.toString).last.toString
    } finally idxDir.close()
    // resolved read: a refreshed build carries unchanged slices by
    // manifest, so a plain dir read would miss them
    val buildPath = new org.apache.hadoop.fs.Path(postingsPath)
    val bio = graft.catalog.StoreIO.of(buildPath,
      spark.sparkContext.hadoopConfiguration)
    val postings = graft.catalog.Carry.readResolved(spark, bio, buildPath,
      graft.catalog.Carry.slicedOwners(bio, buildPath.getParent, buildPath))
    val totalPostings = postings.count()
    val readPostings = postings
      .filter(col("gp").isin(gps: _*)).filter(col("gram").isin(grams: _*)).count()
    println(f"""{"docindex_audit":{"sf":"$sfDir","corpus_rows":$n,"match_rows":$scanRows,"scan_s":$scanS%.3f,"build_s":$buildS%.3f,"indexed_s":$idxS%.3f,"postings_rows_total":$totalPostings,"postings_rows_read":$readPostings,"gp_partitions_read":${gps.size},"gp_partitions_total":${DocIndex.GpCount},"runs":$runs}}""")
    // ---- incremental-refresh cost: bounded by the touched-bucket ----
    // fraction, not the corpus. Mutate ~1/1000 of the ids (a point-ish
    // upsert batch), refresh, and compare against the full rebuild the
    // same mutation used to force. Also a SINGLE-id upsert — the
    // worst-case ratio for full rebuilds, the best case for refresh.
    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    val slice = docs.orderBy("id").limit(5)
      .withColumn("document", concat(col("document"), lit(" refreshed")))
    val sliceN = slice.count()
    coll.upsert(slice)
    val (refreshS, rebuilt) = timed(coll.refreshDocIndex())
    val (idxS2, idxRows2) = secMin(coll.get(whereDoc = wd).count())
    coll.upsert(docs.filter(col("id") === "0")
      .withColumn("document", concat(col("document"), lit(" again"))))
    val (refresh1S, rebuilt1) = timed(coll.refreshDocIndex())
    // ---- compactIndexes: collapse the refresh chain's carry spread ----
    // and per-refresh file accumulation; re-time the indexed read after
    def buildStats(): (Int, Long) = {
      val collDir = new org.apache.hadoop.fs.Path(
        "/root/repo/target/docindex-audit/dxa")
      val bio = graft.catalog.StoreIO.of(collDir,
        spark.sparkContext.hadoopConfiguration)
      val newest = bio.list(collDir)
        .filter(_.name.startsWith("docindex_v")).map(_.path)
        .sortBy(_.getName).last
      val owners = graft.catalog.Carry.slicedOwners(bio, collDir, newest)
      val files = owners.map { case (slice, owner) =>
        bio.list(new org.apache.hadoop.fs.Path(owner, slice))
          .count(_.name.endsWith(".parquet")).toLong }.sum
      (owners.values.map(_.getName).toSet.size, files)
    }
    val (spreadBefore, filesBefore) = buildStats()
    val (compS, _) = timed(coll.compactIndexes())
    val (spreadAfter, filesAfter) = buildStats()
    val (idxS3, idxRows3) = secMin(coll.get(whereDoc = wd).count())
    require(idxRows3 == idxRows2, s"compaction changed answers: $idxRows3 vs $idxRows2")
    // full-rebuild basis on the SAME final content
    val (fullS, _) = timed(coll.buildDocIndex())
    println(f"""{"docindex_refresh_audit":{"sf":"$sfDir","corpus_rows":$n,"slice_rows":$sliceN,"buckets_total":64,"slice_refresh_s":$refreshS%.3f,"slice_buckets_rebuilt":$rebuilt,"single_id_refresh_s":$refresh1S%.3f,"single_id_buckets_rebuilt":$rebuilt1,"full_rebuild_s":$fullS%.3f,"indexed_after_refresh_s":$idxS2%.3f,"indexed_rows_after_refresh":$idxRows2,"compact_s":$compS%.3f,"owner_dirs_before":$spreadBefore,"owner_dirs_after":$spreadAfter,"slice_files_before":$filesBefore,"slice_files_after":$filesAfter,"indexed_after_compact_s":$idxS3%.3f}}""")
    cat.deleteCollection("dxa")
    spark.stop()
  }
}
