package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.catalog.{Collection, CollectionCatalog}
import graft.operators.ChromaFilter.JsonMini

/** INGRESS adapter: read an EXISTING collection out of a live Chroma
  * server over its public REST surface — the other direction of
  * [[ChromaRestSink]] (DESIGN.md ADR-2 covered egress only). This is the
  * migration path a real user of the reference needs: the reference's
  * output artifact IS a hydrated Chroma collection
  * (extras/Vector_Databases_Hydrate_ChromaDB_Collection.sas:126-132, the
  * `PersistentClient` collection its SAS step fills), and moving onto
  * this engine means pulling that collection INTO the store, not only
  * pushing curated sets out.
  *
  * API shapes — both public chromadb generations, [[ChromaRestSink]]'s
  * negotiation reused verbatim (one heartbeat probe per baseUrl):
  *   v1:  GET  /api/v1/collections/{name}  → {"id": ..., "metadata": ...}
  *        GET  /api/v1/collections/{id}/count
  *        POST /api/v1/collections/{id}/get   {"limit","offset","include"}
  *   v2:  same under /api/v2/tenants/{t}/databases/{d}/...
  * The get response is Chroma's parallel-array shape
  * ({"ids":[..],"embeddings":[[..]]|null,"documents":[..]|null,
  *   "metadatas":[{..}]|null}), parsed with the same dependency-free
  * [[JsonMini]] reader the where-JSON grammar uses.
  *
  * 100 TB shape — and the honest ceiling: the server is a single-node
  * SQLite+HNSW install, so IT bounds throughput, not Spark. What the
  * design still owes the cluster: the driver does exactly TWO tiny calls
  * (resolve id, count); every page fetch runs ON EXECUTORS — the page
  * list `[0, ceil(count/pageSize))` becomes a DataFrame partitioned into
  * `parallelism` tasks, each task POSTs its own offset/limit pages over
  * one keep-alive socket and emits rows. No corpus ever rides the driver,
  * and ingest (the downstream `add`) stays fully distributed.
  *
  * Snapshot contract: offset/limit paging is only stable against a
  * QUIESCED collection (Chroma orders get() by its internal id, but a
  * concurrent writer shifts pages). The import takes count ONCE and
  * reads exactly [0, count); a server mutated mid-import can yield a
  * torn copy — the same contract every offset-paged exporter has. The
  * count conservation check in [[importInto]] catches the common case
  * loudly (row total ≠ resolved count → fail, nothing adopted).
  */
object ChromaRestSource {

  /** The imported frame's fixed schema — the store's hydrated layout
    * (q00): nullable document/embedding/metadata, metadata as
    * MAP<STRING,STRING> (Chroma-typed values stringified; the map layout
    * resolves typed comparisons via the try_cast rule, q153). */
  val schema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("document", StringType, nullable = true),
    StructField("embedding", ArrayType(FloatType, containsNull = false),
      nullable = true),
    StructField("metadata", MapType(StringType, StringType,
      valueContainsNull = false), nullable = true)))

  /** Distributed paged read of a remote collection as a DataFrame.
    * Driver does resolve+count; executors fetch pages. */
  def read(spark: SparkSession, baseUrl: String, collectionName: String,
           tenant: String = "default_tenant",
           database: String = "default_database",
           pageSize: Int = 2000,
           parallelism: Int = 8,
           timeoutMs: Int = 60000,
           apiVersion: String = "auto"): DataFrame = {
    val v = ChromaRestSink.resolveApiVersion(baseUrl, apiVersion, timeoutMs)
    val collId = ChromaRestSink.resolveExistingCollectionId(
      baseUrl, collectionName, tenant, database, timeoutMs, v)
    val total = count(baseUrl, v, tenant, database, collId, timeoutMs)
    pagedRows(spark, recordsUrl(baseUrl, v, tenant, database, collId),
      total, pageSize, parallelism, timeoutMs)
  }

  /** The executor-side paged fetch against an already-resolved endpoint
    * and ONE count snapshot — [[read]] and [[importInto]] share it so the
    * import's conservation gate compares against the exact total its
    * pages were planned from (a second count would be a different
    * snapshot), and so importInto never re-resolves what it already
    * resolved. */
  private def pagedRows(spark: SparkSession, getUrl: String, total: Long,
                        pageSize: Int, parallelism: Int,
                        timeoutMs: Int): DataFrame = {
    require(pageSize > 0, s"pageSize must be positive, got $pageSize")
    require(parallelism > 0, s"parallelism must be positive, got $parallelism")
    val nPages = ((total + pageSize - 1) / pageSize).toInt
    val pages = spark.range(0L, nPages.toLong.max(0L),
      1L, math.min(parallelism, math.max(nPages, 1)))
    val rows = pages.rdd.mapPartitions { it =>
      it.flatMap { page =>
        val offset = page * pageSize
        val lim = math.min(pageSize.toLong, total - offset)
        fetchPage(getUrl, offset, lim.toInt, timeoutMs)
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** One-call migration: read the remote collection and hydrate it into
    * the local store THROUGH the normal invariant gates (`add` — dup-id
    * rejection, uniform dims), as one committed MVCC version. The remote
    * `hnsw:space` metadata becomes the local space; remaining remote
    * collection metadata carries over. Fails loudly (nothing adopted —
    * add is all-or-nothing per commit) when the paged row total drifts
    * from the resolved count (concurrent server writes). Returns the
    * hydrated collection. */
  def importInto(cat: CollectionCatalog, baseUrl: String,
                 collectionName: String, localName: String = null,
                 tenant: String = "default_tenant",
                 database: String = "default_database",
                 pageSize: Int = 2000,
                 parallelism: Int = 8,
                 timeoutMs: Int = 60000,
                 apiVersion: String = "auto"): Collection = {
    val spark = cat.spark
    // one negotiation, one id resolve, one count — read() would redo all
    // three, and a SECOND count could disagree with the snapshot the
    // pages were planned from (the torn gate must compare like-for-like)
    val v = ChromaRestSink.resolveApiVersion(baseUrl, apiVersion, timeoutMs)
    val collId = ChromaRestSink.resolveExistingCollectionId(
      baseUrl, collectionName, tenant, database, timeoutMs, v)
    val remoteMeta = collectionMetadata(baseUrl, v, tenant, database,
      collectionName, timeoutMs)
    val space = remoteMeta.getOrElse("hnsw:space", "l2")
    val total = count(baseUrl, v, tenant, database, collId, timeoutMs)
    val df = pagedRows(spark, recordsUrl(baseUrl, v, tenant, database, collId),
      total, pageSize, parallelism, timeoutMs)
    val name = Option(localName).getOrElse(collectionName)
    val local = cat.getOrCreateCollection(name, space = space,
      metadata = (remoteMeta - "hnsw:space") +
        ("imported_from" -> s"$baseUrl/$tenant/$database/$collectionName"))
    // columns that are null for EVERY imported row drop before add —
    // Chroma distinguishes absent from null (a documents-less collection
    // must not grow an all-null document column locally)
    val present = presentColumns(df)
    local.add(df.select(present.head, present.tail: _*))
    val got = local.count()
    require(got == total,
      s"import of '$collectionName' from $baseUrl is torn: server count " +
        s"$total, imported $got — was the collection written during the " +
        "import? Re-run against a quiesced server.")
    local
  }

  /** `id` + every optional column with at least one non-null value. One
    * tiny aggregate (3 longs) decides; the corpus is read once either
    * way by the downstream add. */
  private def presentColumns(df: DataFrame): Seq[String] = {
    import org.apache.spark.sql.{functions => F}
    val c = df.agg(
      F.count(F.col("document")).as("d"),
      F.count(F.col("embedding")).as("e"),
      F.count(F.col("metadata")).as("m")).head()
    Seq("id") ++
      (if (c.getLong(0) > 0) Seq("document") else Nil) ++
      (if (c.getLong(1) > 0) Seq("embedding") else Nil) ++
      (if (c.getLong(2) > 0) Seq("metadata") else Nil)
  }

  // ---- endpoint shapes (the sink's URL grammar, read-side verbs) ----

  private def recordsUrl(base: String, v: String, tenant: String,
                         database: String, collId: String): String = v match {
    case "v1" => s"$base/api/v1/collections/$collId/get"
    case _ => s"$base/api/v2/tenants/${enc(tenant)}/databases/${enc(database)}" +
      s"/collections/$collId/get"
  }

  private def countUrl(base: String, v: String, tenant: String,
                       database: String, collId: String): String = v match {
    case "v1" => s"$base/api/v1/collections/$collId/count"
    case _ => s"$base/api/v2/tenants/${enc(tenant)}/databases/${enc(database)}" +
      s"/collections/$collId/count"
  }

  private def enc(s: String): String = java.net.URLEncoder.encode(s, "UTF-8")

  private def count(base: String, v: String, tenant: String, database: String,
                    collId: String, timeoutMs: Int): Long = {
    val (code, body) = ChromaRestSink.getBody(
      countUrl(base, v, tenant, database, collId), timeoutMs)
    require(code / 100 == 2, s"count of collection $collId failed: HTTP $code $body")
    body.trim.toLong
  }

  /** The remote collection's metadata object (GET by name), stringified
    * values — absent/null metadata → empty. */
  private def collectionMetadata(base: String, v: String, tenant: String,
                                 database: String, name: String,
                                 timeoutMs: Int): Map[String, String] = {
    val url = v match {
      case "v1" => s"$base/api/v1/collections/${enc(name)}" +
        s"?tenant=${enc(tenant)}&database=${enc(database)}"
      case _ => s"$base/api/v2/tenants/${enc(tenant)}/databases/" +
        s"${enc(database)}/collections/${enc(name)}"
    }
    val (code, body) = ChromaRestSink.getBody(url, timeoutMs)
    require(code / 100 == 2, s"GET $url failed: HTTP $code $body")
    val (parsed, end) = JsonMini.parse(body)
    JsonMini.requireEnd(end, body)
    parsed match {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]].get("metadata") match {
        case Some(mm: Map[_, _]) => mm.asInstanceOf[Map[String, Any]]
          .map { case (k, v2) => k -> metaStr(v2) }
        case _ => Map.empty
      }
      case other => throw new IllegalStateException(
        s"unexpected collection response from $url: $other")
    }
  }

  /** One page: POST the get body, parse the parallel arrays into rows.
    * Runs on executors; fails loudly on any non-2xx (the sink's post
    * contract) — a dropped page would be an invisible hole in the
    * migrated collection. */
  private[sources] def fetchPage(getUrl: String, offset: Long, limit: Int,
                                 timeoutMs: Int): Seq[Row] = {
    if (limit <= 0) return Nil
    val body = s"""{"limit":$limit,"offset":$offset,""" +
      """"include":["embeddings","documents","metadatas"]}"""
    val resp = ChromaRestSink.postWithRetry(getUrl, body, maxRetries = 5, timeoutMs)
    parseGetResponse(resp)
  }

  /** Chroma's get response → rows of [[schema]]. Null top-level arrays
    * (an include the server cannot serve, e.g. no documents) yield null
    * column values; ragged parallel arrays fail loudly. */
  private[graft] def parseGetResponse(resp: String): Seq[Row] = {
    val (parsed, end) = JsonMini.parse(resp)
    JsonMini.requireEnd(end, resp)
    val obj = parsed match {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
      case other => throw new IllegalStateException(
        s"Chroma get returned a non-object: $other")
    }
    val ids = obj.get("ids") match {
      case Some(xs: Seq[_]) => xs.map(x => String.valueOf(x))
      case _ => throw new IllegalStateException(
        s"Chroma get response carries no ids array: $resp")
    }
    def parallel(key: String): Option[Seq[Any]] = obj.get(key) match {
      case Some(xs: Seq[_]) =>
        require(xs.size == ids.size,
          s"ragged get response: ${ids.size} ids but ${xs.size} $key")
        Some(xs.asInstanceOf[Seq[Any]])
      case _ => None // absent or JSON null — the include wasn't served
    }
    val docs = parallel("documents")
    val embs = parallel("embeddings")
    val metas = parallel("metadatas")
    ids.indices.map { i =>
      val doc = docs.map(_(i)).flatMap(Option(_)).map {
        case s: String => s
        case other => throw new IllegalStateException(s"non-string document: $other")
      }.orNull
      val emb = embs.map(_(i)).flatMap(Option(_)).map {
        case v: Seq[_] => v.map(floatOf).toArray
        case other => throw new IllegalStateException(s"non-array embedding: $other")
      }.orNull
      val meta = metas.map(_(i)).flatMap(Option(_)).map {
        case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
          .map { case (k, v) => k -> metaStr(v) }
        case other => throw new IllegalStateException(s"non-object metadata: $other")
      }.orNull
      Row(ids(i), doc, emb, meta)
    }
  }

  private def floatOf(v: Any): Float = v match {
    case d: Double => d.toFloat
    case l: Long => l.toFloat
    case other => throw new IllegalStateException(s"non-numeric embedding value: $other")
  }

  /** Typed metadata values stringified for the MAP layout: booleans and
    * strings verbatim; integral numbers without a trailing `.0` (JsonMini
    * yields Long for integral literals, so this is just toString). */
  private def metaStr(v: Any): String = v match {
    case null => throw new IllegalStateException(
      "null metadata value in a Chroma get response (Chroma metadata has no nulls)")
    case other => String.valueOf(other)
  }
}
