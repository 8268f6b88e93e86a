package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.catalog.CollectionCatalog

/** Bulk-hydration throughput audit — the number this engine exists to
  * move: the reference hydrates its collection with ONE in-process
  * `collection.add` call (extras/...sas:177), serialized through a
  * single Python process; the record's q00 headline (~1.2k rows/s at
  * fixture scale) measures per-query overhead, not sustained ingest.
  * This audit measures the SUSTAINED pipeline at replica scale, the way
  * a 100 TB operator would run it:
  *
  *   1. bulk hydrate: documents ⋈ embeddings assemble → add (one MVCC
  *      commit, autocompact policy ON — the long-lived-pipeline setting)
  *   2. index the corpus: keyword sidecar + trigram postings builds
  *   3. live maintenance: an upsert slice + incremental refreshes
  *      (touched buckets only) — the steady-state mutation shape
  *   4. end-state read probes: count + a sidecar-served BM25 top-k
  *
  * Reports rows/s per phase and the file/version end state. Usage:
  *   HydrationThroughputAudit <sfDir> [maxfiles]
  * Prints one JSON line for BASELINE.md.
  */
object HydrationThroughputAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/repo/target/sf10"
    val maxFiles = if (args.length > 1) args(1).toInt else 64
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = "/root/repo/target/hydration-audit"
    val cat = new CollectionCatalog(spark, root, numBuckets = 32)
    cat.deleteCollection("bulk")

    def s[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // q00's assemble shape: id cast, text, metadata columns, the vector
    // joined in where one exists (left join — documents without vectors
    // hydrate documents-only, Chroma's own add shape)
    val frame = docs.join(embs, col("doc_id") === col("vec_id"), "left")
      .select(col("doc_id").cast("string").as("id"),
        col("text").as("document"), col("lang"), col("n_chars"),
        col("embedding"))
    val n = docs.count()

    val c = cat.getOrCreateCollection("bulk",
      metadata = Map("graft:autocompact.maxfiles" -> maxFiles.toString))
    val (_, addS) = s { c.add(frame) }
    require(c.count() == n, s"count conservation: expected $n, got ${c.count()}")
    val (_, kwS) = s { c.buildKeywordIndex() }
    val (_, dxS) = s { c.buildDocIndex() }

    // steady-state maintenance: re-write ~1/64 of the corpus, refresh both
    // families incrementally (carried slices make this O(touched buckets))
    val slice = frame.filter(col("id").cast("long") % 64 === 7)
      .withColumn("document", concat(col("document"), lit(" [rev]")))
    val nSlice = slice.count()
    val (_, upS) = s { c.upsert(slice) }
    val (kwB, kwRefS) = s { c.refreshKeywordIndex() }
    val (dxB, dxRefS) = s { c.refreshDocIndex() }

    val files = c.get().inputFiles.count(_.endsWith(".parquet"))
    val (_, readS) = s { c.get().agg(count(lit(1))).collect() }
    val (_, bm25S) = s { c.keywordTopK(Seq("hash", "join", "stream"), 10).collect() }

    def rps(secs: Double, rows: Long) = (rows / secs).round
    println(
      s"""{"hydration_audit":{"sf":"$sfDir","rows":$n,""" +
      s""""add_s":${f"$addS%.1f"},"add_rows_per_s":${rps(addS, n)},""" +
      s""""kwindex_s":${f"$kwS%.1f"},"kwindex_rows_per_s":${rps(kwS, n)},""" +
      s""""docindex_s":${f"$dxS%.1f"},"docindex_rows_per_s":${rps(dxS, n)},""" +
      s""""hydrate_plus_index_s":${f"${addS + kwS + dxS}%.1f"},""" +
      s""""hydrate_plus_index_rows_per_s":${rps(addS + kwS + dxS, n)},""" +
      s""""upsert_rows":$nSlice,"upsert_s":${f"$upS%.1f"},""" +
      s""""kw_refresh_s":${f"$kwRefS%.1f"},"kw_refresh_buckets":$kwB,""" +
      s""""dx_refresh_s":${f"$dxRefS%.1f"},"dx_refresh_buckets":$dxB,""" +
      s""""resolved_files":$files,"count_read_s":${f"$readS%.2f"},""" +
      s""""bm25_topk_s":${f"$bm25S%.2f"}}}""")
    spark.stop()
    sys.exit(0)
  }
}
