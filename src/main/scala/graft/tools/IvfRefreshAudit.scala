package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.catalog.CollectionCatalog

/** Scale evidence for the IVF index's incremental refresh (the mirror of
  * [[DocIndexAudit]]'s refresh table): hydrate the embeddings table,
  * build a seeded IVF index, then compare a FULL rebuild against
  * [[graft.catalog.Collection.refreshIndex]] after a 5-id upsert and
  * after a single-id upsert. Refresh cost must be bounded by the touched
  * id buckets (+ fixed stage setup), not the corpus; full rebuild is
  * corpus-linear. Also re-times the pruned query after the refresh and
  * checks it still equals the exact scan.
  *
  * Usage: IvfRefreshAudit <sfDir> [runs]
  */
object IvfRefreshAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val runs = if (args.length > 1) args(1).toInt else 2
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // 64 buckets for the same reason as DocIndexAudit: touched ≪ total
    val cat = new CollectionCatalog(spark, "/root/repo/target/ivf-refresh-audit",
      numBuckets = 64)
    cat.deleteCollection("ira")
    val coll = cat.getOrCreateCollection("ira", "cosine")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").cast("string").as("id"), col("embedding"))
    coll.add(emb)
    val n = coll.count()
    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    def secMin(f: => Long): (Double, Long) = {
      var best = Double.MaxValue; var rows = 0L
      (1 to runs).foreach { _ =>
        val t0 = System.nanoTime(); rows = f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (best, rows)
    }
    val seeds = (0L until 16L).map(_.toString)
    val (buildS, _) = timed(coll.buildIndexSeeded(seeds))
    val qv = emb.filter(col("id") === "1").select("embedding")
      .head().getSeq[Float](0)
    val (q0S, _) = secMin(coll.query(qv, 10, nprobe = 4).count())
    // 5-id mutation → refresh touches ≤5 of 64 buckets
    val slice = emb.orderBy(length(col("id")), col("id")).limit(5)
      .withColumn("embedding", transform(col("embedding"), x => x * lit(1.01f)))
    coll.upsert(slice)
    val (refresh5S, rebuilt5) = timed(coll.refreshIndex())
    // single-id mutation → 1 of 64 buckets
    coll.upsert(emb.filter(col("id") === "3")
      .withColumn("embedding", transform(col("embedding"), x => x * lit(0.99f))))
    val (refresh1S, rebuilt1) = timed(coll.refreshIndex())
    // pruned query through the REFRESHED (carry-manifest) artifact
    val (qrS, qrRows) = secMin(coll.query(qv, 10, nprobe = 4).count())
    // compaction collapses the refresh chain; answers must not move
    val (compS, _) = timed(coll.compactIndexes())
    val (qcS, qcRows) = secMin(coll.query(qv, 10, nprobe = 4).count())
    require(qcRows == qrRows, s"compaction changed answers: $qcRows vs $qrRows")
    // full rebuild basis on the SAME final content
    val (fullS, _) = timed(coll.buildIndexSeeded(seeds))
    // pruned-vs-exact equality THROUGH the rebuilt artifact, and its cost
    val (qS, qRows) = secMin(coll.query(qv, 10, nprobe = 4).count())
    val exactRows = coll.query(qv, 10, nprobe = 4, exact = true).count()
    require(qRows == exactRows, s"refreshed index changed answers: $qRows vs $exactRows")
    println(f"""{"ivf_refresh_audit":{"sf":"$sfDir","corpus_rows":$n,"buckets_total":64,"build_s":$buildS%.3f,"slice_refresh_s":$refresh5S%.3f,"slice_buckets_rebuilt":$rebuilt5,"single_id_refresh_s":$refresh1S%.3f,"single_id_buckets_rebuilt":$rebuilt1,"full_rebuild_s":$fullS%.3f,"query_before_s":$q0S%.3f,"query_after_refresh_s":$qrS%.3f,"compact_s":$compS%.3f,"query_after_compact_s":$qcS%.3f,"query_after_rebuild_s":$qS%.3f,"runs":$runs}}""")
    cat.deleteCollection("ira")
    spark.stop()
  }
}
