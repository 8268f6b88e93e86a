package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.catalog.CollectionCatalog

/** Write-path scale audit: commit-protocol cost as COW versions
  * accumulate. The read/compute suite is covered by the sf1/sf10 sweeps;
  * this drives the MUTATION surface the way a long-lived hydration
  * pipeline would — many point upserts against one collection — and
  * reports whether per-commit cost, current-read cost and the
  * meta-pointer resolution stay FLAT in version count, and what
  * compact+vacuum reclaim costs at the end.
  *
  * Usage: CommitAudit <sfDir> <nVersions> [batchRows]
  * Prints one line per phase + a JSON tail for BASELINE.md.
  */
object CommitAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val nVersions = if (args.length > 1) args(1).toInt else 100
    val batchRows = if (args.length > 2) args(2).toInt else 50
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = s"/root/repo/target/commit-audit"
    val cat = new CollectionCatalog(spark, root, numBuckets = 8)
    cat.deleteCollection("audit")
    val coll = cat.getOrCreateCollection("audit")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("string").as("id"),
        col("text").as("document"), col("lang"), col("n_chars"))
    docs.cache().count()
    def ms[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e6)
    }
    val (_, baseMs) = ms(coll.add(docs))
    println(f"base add: $baseMs%.0f ms")
    val commitTimes = new Array[Double](nVersions)
    var i = 0
    while (i < nVersions) {
      // rotating point batch: same shape a CDC/streaming sink commits
      val batch = docs.filter(col("id").cast("long") % nVersions === i).limit(batchRows)
        .withColumn("lang", lit(s"v$i"))
      val (_, t) = ms(coll.upsert(batch))
      commitTimes(i) = t
      i += 1
    }
    def stats(xs: Array[Double]) = {
      val s = xs.sorted
      (s.head, s(s.length / 2), s(s.length - 1),
        xs.take(5).sum / 5, xs.takeRight(5).sum / 5)
    }
    val (mn, md, mx, first5, last5) = stats(commitTimes)
    println(f"commits n=$nVersions min=$mn%.0f med=$md%.0f max=$mx%.0f " +
      f"first5avg=$first5%.0f last5avg=$last5%.0f ms")
    val (_, metaMs) = ms { var j = 0; while (j < 50) { coll.meta; j += 1 } }
    val (cnt, readMs) = ms(coll.get().count())
    val (_, compactMs) = ms(coll.compact())
    val (reclaimed, vacMs) = ms(coll.vacuum(keepHistory = 1))
    val (cnt2, readMs2) = ms(coll.get().count())
    println(f"meta x50: $metaMs%.0f ms; read: $readMs%.0f ms ($cnt rows); " +
      f"compact: $compactMs%.0f ms; vacuum: $vacMs%.0f ms ($reclaimed dirs); " +
      f"read after: $readMs2%.0f ms ($cnt2 rows)")
    println(s"""{"commit_audit":{"sf":"$sfDir","versions":$nVersions,""" +
      f""""base_add_ms":$baseMs%.0f,"commit_min_ms":$mn%.0f,"commit_med_ms":$md%.0f,""" +
      f""""commit_max_ms":$mx%.0f,"commit_first5_ms":$first5%.0f,"commit_last5_ms":$last5%.0f,""" +
      f""""meta50_ms":$metaMs%.0f,"read_ms":$readMs%.0f,"compact_ms":$compactMs%.0f,""" +
      f""""vacuum_ms":$vacMs%.0f,"reclaimed":$reclaimed,"read_after_ms":$readMs2%.0f}}}""")
    cat.deleteCollection("audit")
    spark.stop()
  }
}
