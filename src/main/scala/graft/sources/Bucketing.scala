package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout for repeated co-located joins (SURVEY §2's
  * "Partitioning & shuffle" mandate).
  *
  * A 100 TB fact⋈fact equi-join shuffles BOTH sides every query. Writing
  * both sides bucketed by the join key (`bucketBy` + `sortBy`) pins rows to
  * hash buckets at write time, so every later join on that key plans with
  * ZERO Exchange on the bucketed sides — the shuffle is paid once at
  * ingestion instead of per-query. This is the Spark-native replacement for
  * the co-located storage a single-node engine gets for free.
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted table in the session catalog.
    *
    * The write first repartitions BY THE BUCKET FUNCTION (`repartition(n,
    * key)` is the same Murmur3-pmod hash the bucket id uses), so each task
    * holds exactly one bucket: one file per bucket and a per-bucket sort,
    * instead of every input task sorting its whole partition and emitting
    * a file into all `n` buckets (tasks × buckets small files — the shape
    * that killed the first sf1 measurement of this path). Write
    * parallelism = numBuckets; at scale you size buckets in the hundreds
    * anyway, so nothing is lost. */
  def writeBucketed(
      df: DataFrame, table: String, key: String, numBuckets: Int,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.repartition(numBuckets, df(key))
      .write.mode(mode)
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** [[writeBucketed]] with idempotent re-create: drops the catalog entry
    * AND clears an orphaned warehouse dir a previous session may have left
    * behind (the in-memory catalog forgets tables on restart but their
    * files remain, and CTAS refuses a non-empty location). */
  def rewriteBucketed(
      spark: SparkSession, df: DataFrame, table: String, key: String,
      numBuckets: Int): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // resolve the orphan's location the way the catalog will: database-
    // aware (`<warehouse>/<db>.db/<name>` when a USE is in effect), not a
    // hand-built default-database path that misses everywhere else
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(ident))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    writeBucketed(df, table, key, numBuckets)
  }

  /** [[rewriteBucketed]] unless the table already exists in this session's
    * catalog — the bucketing contract is "shuffle paid ONCE at ingestion",
    * so a repeated pipeline run over the same immutable source must reuse
    * the layout, not re-ingest it. Only safe for content-stable inputs
    * (the caller encodes the source identity in the table name); a source
    * that can change between runs needs [[rewriteBucketed]]. */
  def ensureBucketed(
      spark: SparkSession, df: => DataFrame, table: String, key: String,
      numBuckets: Int): Unit =
    if (!spark.catalog.tableExists(table))
      rewriteBucketed(spark, df, table, key, numBuckets)

  /** Join two bucketed tables on their bucket key — shuffle-free when both
    * were written with the same bucket count. */
  def colocatedJoin(
      spark: SparkSession, leftTable: String, rightTable: String,
      key: String, joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)
}
