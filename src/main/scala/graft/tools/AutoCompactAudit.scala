package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.catalog.CollectionCatalog

/** Auto-compaction policy audit at bench scale: the spec pins the
  * policy's INVARIANT (resolved files never exceed the bound at an API
  * boundary) on tiny fixtures; this measures its COST/BENEFIT the way a
  * long-lived pipeline would feel it — the same point-upsert stream
  * against a policy collection and an unmanaged control, reporting per-
  * arm mutation wall time, final resolved-file counts, end-state read
  * cost, and on-disk version spread. The expected shape: the policy arm
  * pays periodic compaction inside its mutation total and buys back a
  * bounded file count + flat read cost; the control mutates faster but
  * degrades its read path and retains every superseded version until a
  * manual vacuum.
  *
  * Usage: AutoCompactAudit <sfDir> <nUpserts> [maxfiles]
  * Prints one JSON line for BASELINE.md.
  */
object AutoCompactAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val nUpserts = if (args.length > 1) args(1).toInt else 40
    val maxFiles = if (args.length > 2) args(2).toInt else 24
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = "/root/repo/target/autocompact-audit"
    val cat = new CollectionCatalog(spark, root, numBuckets = 8)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("string").as("id"),
        col("text").as("document"), col("lang"))
    docs.cache().count()

    def ms[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e6)
    }

    def run(name: String, metadata: Map[String, String]): (Double, Int, Double, Int) = {
      cat.deleteCollection(name)
      val c = cat.getOrCreateCollection(name, metadata = metadata)
      c.add(docs)
      val (_, mutMs) = ms {
        (0 until nUpserts).foreach { i =>
          c.upsert(docs.filter(col("id") === lit(i.toString))
            .withColumn("document", concat(col("document"), lit(s" [rev $i]"))))
        }
      }
      val files = c.get().inputFiles.count(_.endsWith(".parquet"))
      val (_, readMs) = ms(c.get().agg(count(lit(1))).collect())
      (mutMs, files, readMs, c.history().size)
    }

    val (polMut, polFiles, polRead, polHist) =
      run("pol", Map("graft:autocompact.maxfiles" -> maxFiles.toString))
    val (ctlMut, ctlFiles, ctlRead, ctlHist) = run("ctl", Map.empty)
    println(f"""{"autocompact_audit":{"sf":"$sfDir","n_upserts":$nUpserts,"maxfiles":$maxFiles,"policy_mutation_s":${polMut / 1000}%.2f,"control_mutation_s":${ctlMut / 1000}%.2f,"policy_files":$polFiles,"control_files":$ctlFiles,"policy_read_ms":$polRead%.0f,"control_read_ms":$ctlRead%.0f,"policy_versions_on_disk":$polHist,"control_versions_on_disk":$ctlHist}}""")
    spark.stop()
    sys.exit(0)
  }
}
