package graft

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.{Collection, CollectionCatalog}
import graft.operators.Assemble

/** The reference step's parameter surface: 9 UI-configurable values
  * (extras/Vector_Databases_Hydrate_ChromaDB_Collection.sas:21-30, the
  * `.step` JSON `ui.values`). CAS addressing (caslib/host/port) maps to a
  * table path + catalog root in the Spark world.
  *
  * @param inputTable       parquet path or registered table name  (inputTable+lib, sas:21-22)
  * @param textVar          document text column                    (sas:23)
  * @param docId            id column, cast to string               (sas:24)
  * @param embeddingPattern wide-column name substring              (sas:25)
  * @param metadataColumn   optional metadata column → {"rating": v} (sas:26)
  * @param collectionName   target collection                       (sas:27)
  * @param persistentPath   collection store root                   (sas:28)
  * @param space            distance space of the collection (Chroma hnsw:space)
  * @param runTrigger       the step's run-time gate                (sas:527-538)
  * @param maxRowsPerFile   parquet file-size cap for collection writes
  * @param embeddingFunction when set (an [[graft.operators.Embedder]] name,
  *                          e.g. `graft-hash-v1/16`), the input carries NO
  *                          embedding columns: vectors are computed
  *                          server-side inside the add's write scan and the
  *                          binding is recorded on the collection
  *                          (chromadb's `add(documents=...)` route — the
  *                          one public call shape the reference never
  *                          uses). `embeddingPattern` is ignored.
  */
final case class HydrateConfig(
    inputTable: String,
    textVar: String,
    docId: String,
    embeddingPattern: String,
    metadataColumn: Option[String] = None,
    collectionName: String,
    persistentPath: String,
    space: String = "l2",
    runTrigger: Boolean = true,
    maxRowsPerFile: Long = 1L << 20,
    embeddingFunction: Option[String] = None)

/** The reference's whole life, Spark-first: validate → project/assemble →
  * add → count check (sas:423-511 orchestration + sas:126-193 payload).
  *
  * Differences from the reference, by design:
  *  - no client-side materialization: the table never leaves the cluster
  *    (the reference pulls everything into one pandas process, sas:161);
  *  - validation is fail-fast BEFORE any job is submitted (mirrors the
  *    error-flag short-circuiting of sas:429-489);
  *  - the add is a distributed bucketed write, not one giant
  *    `collection.add` batch (sas:177).
  */
object Hydrator {

  /** The reference accepts `server:/path` persistence references and strips
    * the scheme with `scan(ref, 2, ":")` (sas:395, sas:415 — operator A14);
    * bare paths pass through, anything else falls back to a default
    * (`/tmp` in the reference, sas:473-489). */
  def resolvePersistentPath(ref: String, default: String = "/tmp"): String = {
    val parts = ref.split(":", 2)
    val path = if (parts.length == 2) parts(1) else parts(0)
    if (path.startsWith("/")) path else default
  }

  /** A15-style validation gates. Returns the list of failures (empty = ok). */
  def validate(spark: SparkSession, cfg: HydrateConfig): Seq[String] = {
    val errs = Seq.newBuilder[String]
    // A12/A18 analogue: the session must be alive before any work is planned
    if (spark.sparkContext.isStopped) errs += "SparkSession is stopped"
    if (cfg.collectionName.trim.isEmpty) errs += "collectionName must be non-empty"
    if (!Seq("l2", "ip", "cosine").contains(cfg.space))
      errs += s"space '${cfg.space}' not one of l2|ip|cosine"
    // A13 analogue: catalog lookup for table-name inputs (the reference
    // resolves libref→caslib through dictionary.libnames, sas:329-332)
    if (!cfg.inputTable.contains("/") && !spark.catalog.tableExists(cfg.inputTable))
      errs += s"table '${cfg.inputTable}' not found in the session catalog"
    val input: Option[DataFrame] =
      try Some(readInput(spark, cfg.inputTable))
      catch { case e: Exception => errs += s"input table unreadable: ${e.getMessage}"; None }
    input.foreach { df =>
      val cols = df.columns.toSet
      if (!cols.contains(cfg.textVar)) errs += s"text column '${cfg.textVar}' not in input"
      if (!cols.contains(cfg.docId)) errs += s"id column '${cfg.docId}' not in input"
      cfg.metadataColumn.foreach { m =>
        if (!cols.contains(m)) errs += s"metadata column '$m' not in input" }
      // with a server-side embedding function there ARE no wide columns to
      // match — the pattern gate applies only to the reference's route
      if (cfg.embeddingFunction.isEmpty &&
          Assemble.columnsLike(df, cfg.embeddingPattern).isEmpty)
        errs += s"no columns match embedding pattern '${cfg.embeddingPattern}'"
    }
    cfg.embeddingFunction.foreach { n =>
      // a fit-spec (graft-tfidf-srp-v1/<dim>[?vocab=<n>]) is FITTED on
      // this run's input — validated structurally here, resolved in run();
      // everything else must resolve by name
      try { if (graft.operators.Embedder.fitSpec(n).isEmpty)
        graft.operators.Embedder.fromName(n) }
      catch { case e: IllegalArgumentException => errs += e.getMessage }
    }
    errs.result()
  }

  /** Input resolution: catalog table name, or a path whose format follows
    * its extension (parquet default; csv with header+inferSchema; json
    * lines) — the source surface a step like the reference exposes. */
  private def readInput(spark: SparkSession, table: String): DataFrame =
    if (!table.contains("/")) spark.table(table)
    else if (table.endsWith(".csv"))
      spark.read.option("header", "true").option("inferSchema", "true").csv(table)
    else if (table.endsWith(".json") || table.endsWith(".jsonl"))
      spark.read.json(table)
    else spark.read.parquet(table)

  /** Run the hydration. Returns the hydrated collection, or None when the
    * run trigger is off (the reference's no-op branch, sas:244-255). Throws
    * on validation failure with every gate message (not just the first). */
  def run(spark: SparkSession, cfg: HydrateConfig): Option[Collection] = {
    if (!cfg.runTrigger) return None // _hcdc_run_trigger=0 → whole step skipped
    val errs = validate(spark, cfg)
    if (errs.nonEmpty)
      throw new IllegalArgumentException(s"hydration config invalid: ${errs.mkString("; ")}")
    val input = readInput(spark, cfg.inputTable)
    cfg.embeddingFunction.foreach { efName =>
      // a fit-spec trains the embedder ON THIS INPUT's text column before
      // hydrating through it (the model persists as the collection's
      // sidecar via addDocuments); a later re-hydration into the same
      // collection from different data re-fits a DIFFERENT model and is
      // rejected by the sidecar-equality gate — by design, stored vectors
      // must never mix models
      val ef = graft.operators.Embedder.fitSpec(efName) match {
        case Some((dim, vocab)) => graft.operators.TfIdfSrpEmbedder.fit(
          input, cfg.textVar, dim, vocab)
        case None => graft.operators.Embedder.fromName(efName)
      }
      return Some(runWithEmbedder(spark, cfg, input, ef))
    }
    val frame = Assemble.hydrationFrame(
      input, cfg.docId, cfg.textVar, cfg.embeddingPattern, cfg.metadataColumn)
    // Single-scan hydration: the Chroma-faithful invariants (uniform
    // embedding dimension, row count) ride the add's own scan as observe()
    // metrics instead of paying dedicated validation passes — a separate
    // `validateUniformDim` + `input.count()` would be two extra full reads
    // of a 100 TB input. The dim check runs BEFORE the commit marker via
    // the add's beforeCommit hook, so ragged data still never becomes
    // visible (the claimed version is abandoned, Chroma-reject parity).
    val obs = Observation()
    val observed = frame.observe(obs,
      count(lit(1)).as("n"),
      min(size(col("embedding"))).as("dmin"),
      max(size(col("embedding"))).as("dmax"),
      sum(when(col("embedding").isNull, 1L).otherwise(0L)).as("n_null"))
    // A14: accept reference-style `server:/path` references here too — a
    // raw Paths.get would otherwise create a literal './server:' directory
    val cat = new CollectionCatalog(spark, resolvePersistentPath(cfg.persistentPath),
      maxRowsPerFile = cfg.maxRowsPerFile)
    val coll = cat.getOrCreateCollection(cfg.collectionName, cfg.space)
    val before = coll.count()
    // a uniform batch must ALSO match what the collection already holds —
    // without this, hydrating dim-N into a dim-M collection commits a
    // ragged store whose kNN reads return null-distance garbage
    val existingDim = coll.dim()
    coll.add(observed, beforeCommit = () => {
      val m = obs.get // first action over the batch has completed by now
      if (m("n").asInstanceOf[Long] > 0) {
        if (m("n_null").asInstanceOf[Long] > 0) throw new IllegalArgumentException(
          "null embedding — Chroma add() requires a vector per row")
        val (dmin, dmax) = (m("dmin").asInstanceOf[Int], m("dmax").asInstanceOf[Int])
        if (dmin != dmax) throw new IllegalArgumentException(
          s"ragged embedding dimensions [$dmin..$dmax] — Chroma add() requires uniform dim")
        existingDim.foreach { d =>
          if (dmax != d) throw new IllegalArgumentException(
            s"embedding dimension $dmax != collection dimension $d — Chroma add() rejects the batch")
        }
      }
    })
    val after = coll.count()
    val added = obs.get("n").asInstanceOf[Long]
    // the reference's operational correctness signal: count conservation
    // (sas:134 pre-count, sas:193 post-count, README.md:93)
    require(after - before == added,
      s"count conservation violated: before=$before after=$after added=$added")
    Some(coll)
  }

  /** The server-side-embedding route: documents-only projection, vectors
    * computed in the add's own write scan, binding recorded on the
    * collection ([[graft.catalog.Collection.addDocuments]] — which also
    * carries the cosine zero-vector gate AND the dim-vs-existing-collection
    * guard). The ragged-dim observe of the wide route is unnecessary here —
    * the function emits one fixed dim. Count conservation as in the main
    * route. */
  private def runWithEmbedder(spark: SparkSession, cfg: HydrateConfig,
      input: DataFrame, ef: graft.operators.EmbeddingFunction): Collection = {
    val frame = Assemble.documentsFrame(input, cfg.docId, cfg.textVar, cfg.metadataColumn)
    val obs = Observation()
    val observed = frame.observe(obs, count(lit(1)).as("n"))
    val cat = new CollectionCatalog(spark, resolvePersistentPath(cfg.persistentPath),
      maxRowsPerFile = cfg.maxRowsPerFile)
    val coll = cat.getOrCreateCollection(cfg.collectionName, cfg.space)
    // dim-vs-existing-collection and the cosine zero-vector gate are
    // enforced by addDocuments itself (single source of truth)
    val before = coll.count()
    coll.addDocuments(observed, ef)
    val after = coll.count()
    val added = obs.get("n").asInstanceOf[Long]
    require(after - before == added,
      s"count conservation violated: before=$before after=$after added=$added")
    coll
  }

  /** CDC-style delta: classify `incoming` against `current` into inserts
    * (id unseen) and updates (id present but some compared column differs,
    * null-safely); unchanged rows drop out entirely. The reference re-runs
    * its whole bulk load on every trigger (sas:126-193) — at 100 TB the
    * affordable shape is this ONE id-keyed left join (co-located when both
    * sides are id-hash bucketed, e.g. the collection store's layout)
    * followed by a write that touches only real changes.
    *
    * At scale, pass a stored content-fingerprint column as the single
    * compare column instead of wide payloads: same plan, narrower scan.
    *
    * Output = changed `incoming` rows + an `action` column (insert/update).
    */
  def delta(current: DataFrame, incoming: DataFrame, idCol: String,
            compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "delta needs at least one compare column")
    // 'action' is this function's output column: silently overwriting a
    // payload column of the same name (and sync then dropping it) would
    // null that field in every synced row
    // case-INSENSITIVE: Spark's default resolver is case-insensitive, so
    // withColumn("action", ...) would clobber a payload column 'Action'
    require(!incoming.columns.exists(_.equalsIgnoreCase("action")),
      "incoming batch may not carry a column named 'action' (reserved for the delta classification); rename it first")
    val cur = current.select(col(idCol).cast("string").as("__cur_id") +:
      compareCols.map(c => col(c).as(s"__cur_$c")): _*)
    val changed = compareCols.map(c => !(col(c) <=> col(s"__cur_$c"))).reduce(_ || _)
    incoming
      .join(cur, col(idCol).cast("string") === col("__cur_id"), "left")
      .withColumn("action",
        when(col("__cur_id").isNull, lit("insert"))
          .when(changed, lit("update")))
      .filter(col("action").isNotNull)
      .drop("__cur_id" +: compareCols.map(c => s"__cur_$c"): _*)
  }

  /** Incremental hydration: apply only the [[delta]] of `batch` against
    * what `coll` already holds. When nothing changed, NO new store version
    * is written — re-hydrating an unchanged source is a metadata no-op,
    * which is the idempotence a scheduled 100 TB pipeline needs (the
    * reference rewrites the collection every run). Returns
    * (inserted, updated).
    *
    * A batch carrying several versions of one id (an at-least-once feed
    * redelivering a stale row next to its correction) MUST pass `orderCol`:
    * latest-wins resolves before the delta, so the stale copy cannot be
    * classified as a fresh "update" and regress the stored value. */
  def sync(coll: Collection, batch: DataFrame, compareCols: Seq[String],
           orderCol: Option[String] = None): (Long, Long) = {
    val b = orderCol.fold(batch) { oc =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("id").orderBy(col(oc).desc)
      batch.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    }
    // ONE materialization of the delta join: the action census, the
    // store's bucket probe, and the merged write all read the cache
    // instead of each re-running the id join over the collection scan
    // (three passes over the CDC hot path otherwise). persist — not
    // localCheckpoint — keeps the lineage, so a lost executor recomputes
    // instead of failing the sync; released in finally so a hot loop
    // cannot accumulate dead blocks.
    val d = delta(coll.toDF, b, "id", compareCols).persist()
    try {
      val counts = d.groupBy("action").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val (ins, upd) = (counts.getOrElse("insert", 0L), counts.getOrElse("update", 0L))
      if (ins + upd > 0) coll.upsert(d.drop("action"), orderCol)
      (ins, upd)
    } finally d.unpersist(blocking = false)
  }
}
