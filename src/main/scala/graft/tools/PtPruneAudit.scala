package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.catalog.CollectionCatalog

/** Point-read scale audit: what id-bucket pruning buys `get(ids=…)`.
  * Hydrates a collection from the sf lineitem table (the largest
  * fixture), then times point lookups through the PRUNED get() against
  * the pre-r11 shape (the full-listing scan with only the id filter —
  * exactly what `toDF.filter` still is). Also reports how many pt dirs
  * each path's executed scan actually selected.
  *
  * Usage: PtPruneAudit <sfDir> [numBuckets] [nLookups]
  * Prints phase lines + a JSON tail for BASELINE.md.
  */
object PtPruneAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val numBuckets = if (args.length > 1) args(1).toInt else 32
    val nLookups = if (args.length > 2) args(2).toInt else 20
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = "/root/repo/target/ptprune-audit"
    val cat = new CollectionCatalog(spark, root, numBuckets = numBuckets)
    cat.deleteCollection("audit")
    val coll = cat.getOrCreateCollection("audit")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(concat_ws("_", col("l_orderkey"), col("l_linenumber")).as("id"),
        concat_ws(" ", col("l_returnflag"), col("l_linestatus")).as("document"),
        col("l_quantity").cast("string").as("qty"))
      .dropDuplicates("id") // the synthetic lineitem repeats (orderkey, linenumber)
    val n = li.count()
    coll.add(li)
    println(s"hydrated $n rows into $numBuckets buckets")

    def ms[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e6)
    }
    val probeIds = li.select("id").orderBy(rand(42)).limit(nLookups)
      .collect().map(_.getString(0)).toSeq
    // warm both paths once (parquet footers, FS caches) so the timed loop
    // compares plan shape, not first-touch listing
    coll.get(ids = Seq(probeIds.head)).collect()
    coll.toDF.filter(col("id") === probeIds.head).collect()

    // IO actually performed, from the executed scan's own metrics — at
    // single-JVM fixture scale the ~0.3 s fixed job overhead hides the
    // pruning in wall-clock; files/bytes read are the structural signal
    // that scales (a 1000-executor cluster pays listing + footer + read
    // per file, and 100 TB corpora pay it 10⁶ times over)
    def scanIo(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      def scans(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
        case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
        case other => other.children.flatMap(scans)
      }
      scans(df.queryExecution.executedPlan).map { s =>
        (s.metrics.get("numFiles").fold(0L)(_.value),
          s.metrics.get("filesSize").fold(0L)(_.value))
      }.foldLeft((0L, 0L)) { case ((f, b), (f2, b2)) => (f + f2, b + b2) }
    }

    var prunedMs = 0.0; var fullMs = 0.0
    var prunedFiles = 0L; var prunedBytes = 0L; var fullFiles = 0L; var fullBytes = 0L
    probeIds.foreach { id =>
      val pdf = coll.get(ids = Seq(id))
      val (r1, t1) = ms(pdf.collect())
      require(r1.length == 1, s"pruned get lost id $id")
      prunedMs += t1
      val (pf, pb) = scanIo(pdf); prunedFiles += pf; prunedBytes += pb
      // the pre-r11 shape: full-listing scan, id filter only (row-group
      // pruning still applies — this is NOT a strawman full materialize)
      val fdf = coll.toDF.filter(col("id") === id)
      val (r2, t2) = ms(fdf.collect())
      require(r2.length == 1, s"full-scan get lost id $id")
      fullMs += t2
      val (ff, fb) = scanIo(fdf); fullFiles += ff; fullBytes += fb
    }
    println(f"pruned get:    ${prunedMs / nLookups}%.1f ms/lookup, " +
      f"${prunedFiles / nLookups} files, ${prunedBytes / nLookups / 1024} KiB scanned")
    println(f"full-scan get: ${fullMs / nLookups}%.1f ms/lookup, " +
      f"${fullFiles / nLookups} files, ${fullBytes / nLookups / 1024} KiB scanned")
    println(s"""{"ptprune_audit":{"sf":"$sfDir","rows":$n,"buckets":$numBuckets,""" +
      s""""n_lookups":$nLookups,""" +
      f""""pruned_ms_per_lookup":${prunedMs / nLookups}%.1f,""" +
      f""""fullscan_ms_per_lookup":${fullMs / nLookups}%.1f,""" +
      s""""pruned_files_per_lookup":${prunedFiles / nLookups},""" +
      s""""fullscan_files_per_lookup":${fullFiles / nLookups},""" +
      s""""pruned_kib_per_lookup":${prunedBytes / nLookups / 1024},""" +
      s""""fullscan_kib_per_lookup":${fullBytes / nLookups / 1024}}}""")
    spark.stop()
    sys.exit(0)
  }
}
