package graft

import org.apache.spark.sql.SparkSession

import graft.expressions.GraftExtensions

/** Canonical session bootstrap (the A18 surface: the reference's
  * connect-with-token/session-reuse machinery, sas:86-90, sas:283-311,
  * collapses to `SparkSession.builder.getOrCreate` here).
  *
  * Encodes every setting this engine relies on:
  *  - shuffle partitions sized to cores (local mode), AQE on (runtime
  *    coalesce + skew-join split),
  *  - UTC session time zone (oracle parity),
  *  - `nanosAsLong` so TIMESTAMP(NANOS) parquet (the events table) reads,
  *  - graft SQL functions + the IVF prune rule registered.
  */
object GraftSession {

  def builder(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.ui.enabled", "false")
      // Spark 4's streaming checkpoint checksum layer doubles every WAL
      // file op (offsets/commits each get a sidecar checksum write) and
      // allocates a named thread pool PER checkpoint-file-manager instance
      // — across a many-query suite these pools accumulated to hundreds of
      // idle threads (measured r7: ~850 by suite end), and the extra
      // serial file ops land on exactly the latency-sensitive path
      // (per-microbatch commit). Corruption detection on a local/HDFS
      // checkpoint dir is a deployment choice, not an engine semantic —
      // re-enable it per-job where the checkpoint store warrants it.
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")

  /** Get-or-create with graft functions registered even when an existing
    * session (built elsewhere, e.g. by the driver) is returned. */
  def getOrCreate(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession = {
    val spark = builder(master, shufflePartitions).getOrCreate()
    GraftExtensions.register(spark) // no-op if the extensions path already ran
    spark
  }
}
