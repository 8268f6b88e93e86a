package graft.sources

import java.io.{ByteArrayOutputStream, IOException}
import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** EGRESS adapter: bulk-`add` a hydration frame into an EXTERNAL Chroma
  * server over its public REST surface — the deployment shape the
  * reference's own README suggests for larger installs (README.md:34,60
  * "separate Chroma server") and the one public chromadb call path this
  * library's in-process store replaces (SURVEY A10's alternative sink).
  *
  * API shapes — BOTH public chromadb generations are spoken, because the
  * reference's README requires `chromadb` UNPINNED (README.md:52): a
  * fresh install gets ≥0.6/1.x, which REMOVED the v1 endpoints (410),
  * while long-lived 0.4.x/0.5.x servers have only v1.
  *   v1:  POST /api/v1/collections?tenant=..&database=..
  *        POST /api/v1/collections/{id}/{add|upsert|delete}
  *   v2:  POST /api/v2/tenants/{t}/databases/{d}/collections
  *        POST /api/v2/tenants/{t}/databases/{d}/collections/{id}/{add|upsert|delete}
  * Record payloads are identical across generations
  * ({"ids":[..], "embeddings":[[..]], "documents":[..], "metadatas":[{..}]}).
  * `apiVersion` picks the leg: "v1" / "v2" explicitly, or "auto" (the
  * default) — one driver-side GET of /api/v2/heartbeat per baseUrl
  * decides (2xx → v2; 404/410/etc → v1), cached for the JVM's lifetime.
  *
  * 100 TB shape — and its honest ceiling: each PARTITION posts its own
  * rows in `batchSize` chunks over one keep-alive connection
  * (`foreachPartition`; the driver only resolves the collection id), so
  * ingest parallelism is the frame's partitioning. But the server is a
  * single-node SQLite+HNSW install — IT is the bottleneck, not Spark;
  * this is an egress adapter for pushing a CURATED (already deduped,
  * filtered, capped) result set out to a serving Chroma, not a bulk-load
  * path for the corpus itself. Size `repartition(n)` to what the server
  * can absorb; chromadb's own client batches at ~5k records (the
  * `batchSize` default mirrors it).
  *
  * Failure contract: every batch retries `maxRetries` times with
  * exponential backoff on IOException/5xx, then FAILS THE TASK loudly —
  * a silently dropped batch would be an invisible hole in the served
  * collection. Retries make the add AT-LEAST-ONCE: pair with server-side
  * unique ids (Chroma rejects duplicate ids within a collection, so a
  * replayed batch surfaces as a per-record rejection, not silent dups).
  *
  * Columns: `id` (string, required); optional `embedding ARRAY<FLOAT/
  * DOUBLE>`, `document STRING`; every OTHER column rides as a metadata
  * key, with str/long/double/bool kept TYPED in the JSON (Chroma metadata
  * is typed — q153's declared-type discipline, applied at the egress
  * boundary). No Spark JSON machinery: payloads are hand-assembled with
  * the same minimal escaper Verify uses, so the sink has zero extra
  * dependencies and a bit-stable wire format tests can pin.
  */
object ChromaRestSink {

  // ---- API-generation negotiation + endpoint shapes ----

  /** Per-baseUrl negotiated generation (driver-side; one probe ever). */
  private val negotiated =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Resolve `apiVersion` ("v1" | "v2" | "auto") against `baseUrl`.
    * Auto probes GET /api/v2/heartbeat ONCE per baseUrl: a 2xx means the
    * server speaks v2; 404/405/410 mean the PATH does not exist — a v1
    * (0.4/0.5) server. Nothing else is a version signal: a TRANSPORT
    * failure (refused, DNS, timeout) propagates, and so does any other
    * status (a 503 during a server restart is the server being briefly
    * unhealthy, not it being v1 — caching "v1" off it would pin every
    * later call of this JVM to /api/v1 and fail 410 against a recovered
    * v2-only server). Only a definitive verdict is ever cached. */
  private[graft] def resolveApiVersion(baseUrl: String, apiVersion: String,
                                       timeoutMs: Int): String =
    apiVersion match {
      case "v1" | "v2" => apiVersion
      case "auto" => negotiated.computeIfAbsent(baseUrl, b =>
        getStatus(s"$b/api/v2/heartbeat", timeoutMs) match {
          case ok if ok / 100 == 2 => "v2"
          case 404 | 405 | 410 => "v1"
          case other => throw new java.io.IOException(
            s"$b/api/v2/heartbeat returned HTTP $other — neither a v2 " +
              "server (2xx) nor a v1 path-miss (404/405/410); not " +
              "caching a version off a transient status. Retry, or pin " +
              "apiVersion=v1|v2 explicitly.")
        })
      case other => throw new IllegalArgumentException(
        s"apiVersion must be v1, v2 or auto, got '$other'")
    }

  private def createUrl(base: String, v: String,
                        tenant: String, database: String): String = v match {
    case "v1" => s"$base/api/v1/collections?tenant=${enc(tenant)}&database=${enc(database)}"
    case _ => s"$base/api/v2/tenants/${enc(tenant)}/databases/${enc(database)}/collections"
  }

  private def recordsUrl(base: String, v: String, tenant: String,
                         database: String, collId: String, verb: String): String = v match {
    case "v1" => s"$base/api/v1/collections/$collId/$verb"
    case _ => s"$base/api/v2/tenants/${enc(tenant)}/databases/${enc(database)}" +
      s"/collections/$collId/$verb"
  }

  /** Resolve (get-or-create) the server-side collection id — driver-side,
    * one call. `space` rides as Chroma's `hnsw:space` metadata. */
  def resolveCollectionId(baseUrl: String, name: String,
                          space: String = "l2",
                          tenant: String = "default_tenant",
                          database: String = "default_database",
                          timeoutMs: Int = 30000,
                          apiVersion: String = "auto"): String = {
    val v = resolveApiVersion(baseUrl, apiVersion, timeoutMs)
    val body = s"""{"name":${jstr(name)},"get_or_create":true,""" +
      s""""metadata":{"hnsw:space":${jstr(space)}}}"""
    val resp = post(createUrl(baseUrl, v, tenant, database), body, timeoutMs)
    // minimal extraction of "id":"..." — the response is a flat object;
    // a full JSON parser would be the sink's only dependency
    val m = """"id"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(resp)
    m.map(_.group(1)).getOrElse(throw new IllegalStateException(
      s"Chroma server returned no collection id for '$name': $resp"))
  }

  /** Resolve an EXISTING collection's id by name — the delete-side
    * resolution (see [[deleteIds]]): GET by name, 404/410 fail loudly
    * instead of creating anything. */
  private[sources] def resolveExistingCollectionId(
      baseUrl: String, name: String, tenant: String, database: String,
      timeoutMs: Int, v: String): String = {
    val url = v match {
      case "v1" => s"$baseUrl/api/v1/collections/${enc(name)}" +
        s"?tenant=${enc(tenant)}&database=${enc(database)}"
      case _ => s"$baseUrl/api/v2/tenants/${enc(tenant)}/databases/" +
        s"${enc(database)}/collections/${enc(name)}"
    }
    val (code, resp) = getBody(url, timeoutMs)
    if (code == 404 || code == 410) throw new NoSuchElementException(
      s"collection '$name' does not exist on $baseUrl (HTTP $code) — " +
        "deleteIds never creates; check the name/tenant/database")
    if (code >= 500) throw new IOException(s"HTTP $code from $url: $resp")
    if (code / 100 != 2) throw new IllegalStateException(
      s"unexpected HTTP $code resolving collection '$name' at $url: $resp")
    val m = """"id"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(resp)
    m.map(_.group(1)).getOrElse(throw new IllegalStateException(
      s"Chroma server returned no collection id for '$name': $resp"))
  }

  /** Bulk add: every partition posts its rows in `batchSize` chunks.
    * Returns the row count pushed — an AT-LEAST-ONCE audit line (a task
    * retry re-adds its partition's count, exactly as its rows re-post). */
  def add(df: DataFrame, baseUrl: String, collectionName: String,
          space: String = "l2",
          tenant: String = "default_tenant",
          database: String = "default_database",
          batchSize: Int = 5000,
          maxRetries: Int = 5,
          timeoutMs: Int = 60000,
          apiVersion: String = "auto"): Long =
    pushRecords(df, baseUrl, collectionName, space, tenant, database,
      batchSize, maxRetries, timeoutMs, apiVersion, "add")

  /** Bulk upsert — the same wire payload as [[add]] to the `/upsert`
    * endpoint: existing ids REPLACE, new ids insert (Chroma's upsert
    * semantics). This is the replay-safe verb for refreshing a curated
    * export — add's duplicate-id rejection would refuse the second push
    * of a re-curated set, upsert makes the whole job IDEMPOTENT (exactly-
    * once effect under at-least-once delivery). */
  def upsert(df: DataFrame, baseUrl: String, collectionName: String,
             space: String = "l2",
             tenant: String = "default_tenant",
             database: String = "default_database",
             batchSize: Int = 5000,
             maxRetries: Int = 5,
             timeoutMs: Int = 60000,
             apiVersion: String = "auto"): Long =
    pushRecords(df, baseUrl, collectionName, space, tenant, database,
      batchSize, maxRetries, timeoutMs, apiVersion, "upsert")

  /** Bulk delete by id: every partition posts its `id` column in
    * `{"ids":[..]}` batches to the `/delete` endpoint — the retire half
    * of a curated refresh (upsert the new cut, delete the rows that fell
    * out of it). Deleting an absent id is a server-side no-op, so
    * at-least-once replays are harmless; returns ids pushed.
    *
    * The collection is resolved MUST-EXIST (GET by name), never
    * get-or-create: a typo'd name would otherwise silently create an
    * empty server-side collection, every delete would no-op against it,
    * and the stale rows the caller meant to retire would stay live with
    * zero errors — a data-retention hole. Absent collections fail LOUD. */
  def deleteIds(df: DataFrame, baseUrl: String, collectionName: String,
                space: String = "l2",
                tenant: String = "default_tenant",
                database: String = "default_database",
                batchSize: Int = 5000,
                maxRetries: Int = 5,
                timeoutMs: Int = 60000,
                apiVersion: String = "auto"): Long = {
    require(df.columns.contains("id"), "ChromaRestSink.deleteIds needs an `id` column")
    val v = resolveApiVersion(baseUrl, apiVersion, timeoutMs)
    val collId = resolveExistingCollectionId(baseUrl, collectionName, tenant,
      database, timeoutMs, v)
    val url = recordsUrl(baseUrl, v, tenant, database, collId, "delete")
    val ids = df.select("id")
    val schema = ids.schema
    pushPartitions(ids, url, batchSize, maxRetries, timeoutMs,
      "chroma_rest_deletes", (batch, _) => idsJson(batch, schema))
  }

  private def pushRecords(df: DataFrame, baseUrl: String, collectionName: String,
                          space: String, tenant: String, database: String,
                          batchSize: Int, maxRetries: Int, timeoutMs: Int,
                          apiVersion: String, verb: String): Long = {
    val v = resolveApiVersion(baseUrl, apiVersion, timeoutMs)
    val collId = resolveCollectionId(baseUrl, collectionName, space, tenant,
      database, timeoutMs, v)
    recordsResolved(df, recordsUrl(baseUrl, v, tenant, database, collId, verb),
      batchSize, maxRetries, timeoutMs)
  }

  /** [[add]]/[[upsert]] against an already-resolved endpoint URL (the
    * streaming form resolves once and reuses). */
  private def recordsResolved(df: DataFrame, url: String,
                              batchSize: Int, maxRetries: Int,
                              timeoutMs: Int): Long = {
    require(df.columns.contains("id"), "ChromaRestSink needs an `id` column")
    // LOUD on a reserved name with the wrong type: a STRING `embedding`
    // (say a JSON-serialized vector) qualifies neither as embeddings nor
    // as metadata (reserved name) — it would vanish from the wire
    // silently, the data-hole failure mode this sink forbids
    df.schema.fields.find(_.name == "embedding").foreach(f => require(
      f.dataType.isInstanceOf[ArrayType],
      s"`embedding` must be ARRAY<FLOAT/DOUBLE>, got ${f.dataType.simpleString} — " +
        "rename the column if it is not the vector"))
    df.schema.fields.find(_.name == "document").foreach(f => require(
      f.dataType == StringType,
      s"`document` must be STRING, got ${f.dataType.simpleString} — " +
        "rename the column if it is not the document text"))
    pushPartitions(df, url, batchSize, maxRetries, timeoutMs,
      "chroma_rest_rows", batchJson)
  }

  /** The shared per-partition batch loop: `bodyOf` renders one batch. */
  private def pushPartitions(df: DataFrame, url: String, batchSize: Int,
                             maxRetries: Int, timeoutMs: Int,
                             counterName: String,
                             bodyOf: (Seq[Row], StructType) => String): Long = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    val schema = df.schema
    val counter = df.sparkSession.sparkContext.longAccumulator(counterName)
    df.foreachPartition { rows: Iterator[Row] =>
      rows.grouped(batchSize).foreach { batch =>
        postWithRetry(url, bodyOf(batch, schema), maxRetries, timeoutMs)
        counter.add(batch.size.toLong)
      }
    }
    counter.value
  }

  /** Streaming form: a foreachBatch body pushing each microbatch. Use as
    * `stream.writeStream.foreachBatch(ChromaRestSink.foreachBatchAdd(url, name))`.
    * The collection id resolves ONCE, on the first non-empty microbatch,
    * and is reused — not one driver round trip per trigger. At-least-once
    * like [[add]] — Chroma's duplicate-id rejection is the replay guard. */
  def foreachBatchAdd(baseUrl: String, collectionName: String,
                      space: String = "l2",
                      tenant: String = "default_tenant",
                      database: String = "default_database",
                      batchSize: Int = 5000,
                      maxRetries: Int = 5,
                      timeoutMs: Int = 60000,
                      apiVersion: String = "auto"): (DataFrame, Long) => Unit = {
    // driver-side one-slot cache; foreachBatch bodies run on the driver
    var addUrl: Option[String] = None
    (batch, _) => {
      if (!batch.isEmpty) {
        if (addUrl.isEmpty) {
          val v = resolveApiVersion(baseUrl, apiVersion, timeoutMs)
          val collId = resolveCollectionId(baseUrl, collectionName, space,
            tenant, database, timeoutMs, v)
          addUrl = Some(recordsUrl(baseUrl, v, tenant, database, collId, "add"))
        }
        recordsResolved(batch, addUrl.get, batchSize, maxRetries, timeoutMs)
      }
      (): Unit
    }
  }

  // ---- wire format ----

  /** One add-payload for a batch of rows: parallel arrays, Chroma's add
    * body shape. Omits `embeddings`/`documents` entirely when the frame
    * has no such column (Chroma treats absent and null differently). */
  private[sources] def batchJson(batch: Seq[Row], schema: StructType): String = {
    val idIdx = schema.fieldIndex("id")
    val embIdx = schema.fields.indexWhere(f => f.name == "embedding" &&
      f.dataType.isInstanceOf[ArrayType])
    val docIdx = schema.fields.indexWhere(_.name == "document")
    val metaIdxs = schema.fields.zipWithIndex.collect {
      case (f, i) if f.name != "id" && f.name != "embedding" && f.name != "document" => i
    }
    val sb = new StringBuilder(1024)
    sb.append("{\"ids\":[")
    // LOUD on a null id: String.valueOf(null) would serialize the literal
    // string "null" — a silent garbage id in the served collection, the
    // data-hole class this sink forbids (same posture as the reserved-name
    // type checks in addResolved)
    appendJoined(sb, batch) { r =>
      require(!r.isNullAt(idIdx),
        "ChromaRestSink: null `id` in an add batch — filter or fill ids before the sink")
      sb.append(jstr(String.valueOf(r.get(idIdx))))
    }
    sb.append(']')
    if (embIdx >= 0) {
      sb.append(",\"embeddings\":[")
      appendJoined(sb, batch) { r =>
        // LOUD, named failure instead of the opaque NPE getSeq(null).foreach
        // would throw: Chroma's add has no null entry in `embeddings` —
        // rows without vectors must drop the column (or the row) upstream
        require(!r.isNullAt(embIdx),
          "ChromaRestSink: null `embedding` in an add batch — drop the column " +
            "(documents-only add) or filter the null rows before the sink")
        sb.append('[')
        val seq = r.getSeq[Any](embIdx)
        var first = true
        seq.foreach { v =>
          if (!first) sb.append(',')
          first = false
          sb.append(numJson(v))
        }
        sb.append(']')
      }
      sb.append(']')
    }
    if (docIdx >= 0) {
      sb.append(",\"documents\":[")
      appendJoined(sb, batch) { r =>
        if (r.isNullAt(docIdx)) sb.append("null")
        else sb.append(jstr(r.getString(docIdx)))
      }
      sb.append(']')
    }
    if (metaIdxs.nonEmpty) {
      sb.append(",\"metadatas\":[")
      appendJoined(sb, batch) { r =>
        sb.append('{')
        var first = true
        metaIdxs.foreach { i =>
          if (!r.isNullAt(i)) { // Chroma metadata has no null values — omit
            if (!first) sb.append(',')
            first = false
            sb.append(jstr(schema.fields(i).name)).append(':')
            sb.append(metaJson(r.get(i)))
          }
        }
        sb.append('}')
      }
      sb.append(']')
    }
    sb.append('}')
    sb.toString
  }

  /** One delete-payload: `{"ids":[..]}` — same null-id posture as add. */
  private[sources] def idsJson(batch: Seq[Row], schema: StructType): String = {
    val idIdx = schema.fieldIndex("id")
    val sb = new StringBuilder(256)
    sb.append("{\"ids\":[")
    appendJoined(sb, batch) { r =>
      require(!r.isNullAt(idIdx),
        "ChromaRestSink: null `id` in a delete batch — filter ids before the sink")
      sb.append(jstr(String.valueOf(r.get(idIdx))))
    }
    sb.append("]}")
    sb.toString
  }

  private def appendJoined(sb: StringBuilder, batch: Seq[Row])(one: Row => Unit): Unit = {
    var first = true
    batch.foreach { r =>
      if (!first) sb.append(',')
      first = false
      one(r)
    }
  }

  /** Typed metadata values on the wire: str/long/double/bool stay typed
    * (Chroma's metadata types); everything else stringifies. */
  private def metaJson(v: Any): String = v match {
    case b: java.lang.Boolean => b.toString
    case n @ (_: java.lang.Long | _: java.lang.Integer |
              _: java.lang.Short | _: java.lang.Byte) => n.toString
    case d: java.lang.Double => numJson(d)
    case f: java.lang.Float => numJson(f)
    case d: java.math.BigDecimal => d.toPlainString
    case other => jstr(String.valueOf(other))
  }

  /** Floats on the wire: shortest-roundtrip decimal (Java toString), with
    * non-finite values REJECTED loudly — JSON has no NaN/Infinity and
    * Chroma would 400 the whole batch with a less useful message. */
  private def numJson(v: Any): String = {
    val d = v match {
      case f: java.lang.Float => f.doubleValue
      case d: java.lang.Double => d.doubleValue
      case n: java.lang.Number => n.doubleValue
      case other => throw new IllegalArgumentException(s"not numeric: $other")
    }
    require(!d.isNaN && !d.isInfinite,
      s"non-finite value $d cannot ride a JSON add payload")
    // integral doubles print as "1.0" via toString — fine for JSON numbers
    v match {
      case f: java.lang.Float => f.toString
      case _ => d.toString
    }
  }

  /** Minimal JSON string escape (same contract as Verify's): backslash,
    * quote, and all control chars below 0x20. */
  private[sources] def jstr(s: String): String = {
    val sb = new StringBuilder(s.length + 2).append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")

  // ---- transport (JDK-only: HttpURLConnection, keep-alive by default) ----

  /** One GET returning the HTTP status (the negotiation probe). Response
    * body is drained so the connection returns to the keep-alive pool;
    * transport failures propagate (see [[resolveApiVersion]]). */
  private[sources] def getStatus(url: String, timeoutMs: Int): Int = {
    val conn = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
    try {
      conn.setRequestMethod("GET")
      conn.setConnectTimeout(timeoutMs)
      conn.setReadTimeout(timeoutMs)
      val code = conn.getResponseCode
      val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
      if (stream != null) {
        val tmp = new Array[Byte](8192)
        while (stream.read(tmp) >= 0) ()
        stream.close()
      }
      code
    } catch {
      case e: Throwable => conn.disconnect(); throw e
    }
  }

  /** One GET returning (status, body) — the must-exist collection lookup.
    * Body fully drained (keep-alive); transport failures propagate. */
  private[sources] def getBody(url: String, timeoutMs: Int): (Int, String) = {
    val conn = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
    try {
      conn.setRequestMethod("GET")
      conn.setConnectTimeout(timeoutMs)
      conn.setReadTimeout(timeoutMs)
      val code = conn.getResponseCode
      val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
      val buf = new ByteArrayOutputStream()
      if (stream != null) {
        val tmp = new Array[Byte](8192)
        var n = stream.read(tmp)
        while (n >= 0) { buf.write(tmp, 0, n); n = stream.read(tmp) }
        stream.close()
      }
      (code, new String(buf.toByteArray, UTF_8))
    } catch {
      case e: Throwable => conn.disconnect(); throw e
    }
  }

  private[sources] def post(url: String, body: String, timeoutMs: Int): String = {
    val conn = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
    try {
      conn.setRequestMethod("POST")
      conn.setConnectTimeout(timeoutMs)
      conn.setReadTimeout(timeoutMs)
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "application/json")
      val bytes = body.getBytes(UTF_8)
      conn.setFixedLengthStreamingMode(bytes.length)
      val out = conn.getOutputStream
      try out.write(bytes) finally out.close()
      val code = conn.getResponseCode
      val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
      val buf = new ByteArrayOutputStream()
      if (stream != null) {
        val tmp = new Array[Byte](8192)
        var n = stream.read(tmp)
        while (n >= 0) { buf.write(tmp, 0, n); n = stream.read(tmp) }
        stream.close()
      }
      val resp = new String(buf.toByteArray, UTF_8)
      if (code >= 500) throw new IOException(s"HTTP $code from $url: $resp")
      if (code >= 400) throw new IllegalStateException(
        s"Chroma server rejected the request (HTTP $code, NOT retried — " +
          s"a 4xx replays identically): $resp")
      // ONLY 2xx is success: a 3xx (e.g. an http→https redirect the JDK
      // won't follow cross-protocol) would otherwise swallow the whole
      // batch as 'pushed' — the exact invisible hole the loud-failure
      // contract forbids. Misconfigured baseUrl fails the FIRST batch.
      if (code / 100 != 2) throw new IllegalStateException(
        s"unexpected HTTP $code from $url (redirect/misconfigured baseUrl? " +
          s"point baseUrl at the server's final scheme+host): $resp")
      resp
      // NO disconnect(): the response stream was fully drained and closed,
      // which returns the connection to the JDK keep-alive cache — the
      // per-partition batch loop reuses one socket, as documented.
      // disconnect() would tear it down after every batch.
    } catch {
      case e: Throwable => conn.disconnect(); throw e
    }
  }

  /** Retry on IOException/5xx with exponential backoff (100ms · 2^attempt,
    * capped 5s); 4xx NEVER retries (the payload is wrong, not the wire).
    * After `maxRetries` failures the LAST cause propagates — the task
    * fails, Spark retries the task, and at-least-once holds. */
  private[sources] def postWithRetry(url: String, body: String,
                                     maxRetries: Int, timeoutMs: Int): String = {
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt <= maxRetries) {
      try return post(url, body, timeoutMs)
      catch {
        case e: IOException =>
          lastErr = e
          attempt += 1
          if (attempt <= maxRetries)
            Thread.sleep(math.min(5000L, 100L << math.min(attempt, 6)))
      }
    }
    throw new IOException(
      s"Chroma add batch failed after ${maxRetries + 1} attempts to $url", lastErr)
  }
}
