package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.{ConcurrentLinkedQueue, atomic}

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._

import graft.sources.ChromaRestSink

/** The egress sink against a REAL local HTTP server (JDK HttpServer):
  * collection resolution, per-partition batching, the typed wire format,
  * 5xx retry with at-least-once, and LOUD 4xx/exhaustion failures. No
  * network egress — the server lives on a loopback ephemeral port. */
class ChromaRestSinkSpec extends SparkTestBase {

  /** A capturing fake Chroma: answers get_or_create with a fixed id and
    * records every add body. `failFirst` makes the add endpoint 500 that
    * many times before succeeding (retry exercise). */
  private def withFakeChroma[T](failFirst: Int = 0)(
      body: (String, ConcurrentLinkedQueue[String]) => T): T = {
    val adds = new ConcurrentLinkedQueue[String]()
    val failures = new atomic.AtomicInteger(failFirst)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    def readBody(ex: HttpExchange): String = {
      val b = ex.getRequestBody.readAllBytes(); new String(b, UTF_8)
    }
    def respond(ex: HttpExchange, code: Int, payload: String): Unit = {
      val bytes = payload.getBytes(UTF_8)
      ex.sendResponseHeaders(code, bytes.length)
      val os = ex.getResponseBody
      try os.write(bytes) finally os.close()
    }
    server.createContext("/api/v1/collections", (ex: HttpExchange) => {
      val path = ex.getRequestURI.getPath
      val payload = readBody(ex)
      if (ex.getRequestMethod == "GET") {
        // must-exist resolution (deleteIds): only 'docs' exists
        if (path.endsWith("/collections/docs"))
          respond(ex, 200, """{"id":"fake-coll-id","name":"docs"}""")
        else respond(ex, 404, """{"error":"collection not found"}""")
      } else if (path.endsWith("/add")) {
        if (failures.getAndDecrement() > 0) respond(ex, 500, """{"error":"flaky"}""")
        else { adds.add(payload); respond(ex, 201, "true") }
      } else if (path.endsWith("/collections")) {
        respond(ex, 200, s"""{"id":"fake-coll-id","name":"x","metadata":null}""")
      } else respond(ex, 404, """{"error":"nope"}""")
    })
    server.setExecutor(null)
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}", adds)
    finally server.stop(0)
  }

  private def frame(n: Int) = {
    import org.apache.spark.sql.types._
    spark.range(n.toLong).select(
      col("id").cast("string").as("id"),
      array(col("id").cast("float"), lit(0.5f)).as("embedding"),
      concat(lit("doc "), col("id")).as("document"),
      when(col("id") % 2 === 0, "en").otherwise("fr").as("lang"),
      (col("id") % 5).as("stars"),
      (col("id") % 3 === 0).as("flagged"),
      when(col("id") % 7 === 0, lit(null).cast(StringType))
        .otherwise(concat(lit("s"), col("id") % 2)).as("source"))
  }

  test("add resolves the collection once and posts every row, batched") {
    withFakeChroma() { (url, adds) =>
      val pushed = ChromaRestSink.add(frame(25).repartition(3), url, "docs",
        batchSize = 4)
      assert(pushed == 25)
      val bodies = adds.toArray(Array.empty[String])
      // 3 partitions × ceil-division batching: total ids across bodies = 25
      val idCount = bodies.map(b => """"ids":\[([^\]]*)\]""".r
        .findFirstMatchIn(b).get.group(1).count(_ == '"') / 2).sum
      assert(idCount == 25)
      // each body's batch is at most batchSize rows
      bodies.foreach { b =>
        val ids = """"ids":\[([^\]]*)\]""".r.findFirstMatchIn(b).get.group(1)
        assert(ids.count(_ == '"') / 2 <= 4, s"oversized batch: $b")
      }
    }
  }

  test("wire format: parallel arrays, typed metadata, nulls omitted") {
    withFakeChroma() { (url, adds) =>
      ChromaRestSink.add(frame(8).coalesce(1), url, "docs", batchSize = 100)
      val b = adds.peek()
      assert(b.contains(""""ids":["""") && b.contains(""""embeddings":[["""))
      assert(b.contains(""""documents":["doc """))
      // typed metadata: long unquoted, bool unquoted, string quoted
      assert(b.contains(""""stars":0""") || b.contains(""""stars":1"""))
      assert(b.contains(""""flagged":true""") && b.contains(""""flagged":false"""))
      assert(b.contains(""""lang":"en""""))
      // id 0 and 7 have null source → the key is OMITTED, never "null"
      assert(!b.contains(""""source":null"""))
      // embeddings carry shortest-roundtrip floats
      assert(b.contains("0.5"))
    }
  }

  test("a 5xx add retries with backoff and still lands exactly the payload") {
    withFakeChroma(failFirst = 2) { (url, adds) =>
      val pushed = ChromaRestSink.add(frame(5).coalesce(1), url, "docs",
        batchSize = 100, maxRetries = 4)
      assert(pushed == 5)
      assert(adds.size() == 1, "exactly one SUCCESSFUL add recorded")
    }
  }

  test("retry exhaustion fails the job loudly (no silent holes)") {
    withFakeChroma(failFirst = 100) { (url, _) =>
      val e = intercept[org.apache.spark.SparkException] {
        ChromaRestSink.add(frame(3).coalesce(1), url, "docs",
          batchSize = 100, maxRetries = 1)
      }
      assert(e.getMessage.contains("failed") || e.getCause != null)
    }
  }

  test("non-finite embedding values are rejected before they hit the wire") {
    withFakeChroma() { (url, adds) =>
      val bad = spark.range(1).select(col("id").cast("string").as("id"),
        array(lit(Float.NaN)).as("embedding"))
      intercept[org.apache.spark.SparkException] {
        ChromaRestSink.add(bad, url, "docs")
      }
      assert(adds.isEmpty, "a NaN payload must never be posted")
    }
  }

  test("a 3xx response fails the batch loudly — redirects never swallow adds") {
    // an http->https 301 the JDK won't follow cross-protocol: the sink
    // must refuse, not count the batch as pushed
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api/v1/collections", (ex: HttpExchange) => {
      ex.getRequestBody.readAllBytes()
      if (ex.getRequestURI.getPath.endsWith("/add")) {
        ex.getResponseHeaders.add("Location", "https://elsewhere.example/add")
        ex.sendResponseHeaders(301, -1); ex.close()
      } else {
        val b = """{"id":"fake-coll-id"}""".getBytes(UTF_8)
        ex.sendResponseHeaders(200, b.length)
        val os = ex.getResponseBody; try os.write(b) finally os.close()
      }
    })
    server.setExecutor(null); server.start()
    try {
      val e = intercept[org.apache.spark.SparkException] {
        ChromaRestSink.add(frame(2).coalesce(1),
          s"http://127.0.0.1:${server.getAddress.getPort}", "docs")
      }
      assert(e.getMessage.contains("301") ||
        Option(e.getCause).exists(_.getMessage.contains("301")))
    } finally server.stop(0)
  }

  test("reserved-name columns with the wrong type fail loudly, never vanish") {
    withFakeChroma() { (url, adds) =>
      val badEmb = spark.range(1).select(col("id").cast("string").as("id"),
        lit("[0.1,0.2]").as("embedding"))
      val e1 = intercept[IllegalArgumentException] {
        ChromaRestSink.add(badEmb, url, "docs")
      }
      assert(e1.getMessage.contains("embedding"))
      val badDoc = spark.range(1).select(col("id").cast("string").as("id"),
        col("id").as("document"))
      val e2 = intercept[IllegalArgumentException] {
        ChromaRestSink.add(badDoc, url, "docs")
      }
      assert(e2.getMessage.contains("document"))
      assert(adds.isEmpty)
    }
  }

  /** A v2-shaped fake Chroma (chromadb >= 0.6/1.x): /api/v2/heartbeat
    * answers, collections nest under tenant/database path segments, and —
    * like a real current server — every /api/v1 path answers 410 Gone.
    * Records each (verb, body) it accepts. */
  private def withFakeChromaV2[T](
      body: (String, ConcurrentLinkedQueue[(String, String)]) => T): T = {
    val recorded = new ConcurrentLinkedQueue[(String, String)]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    def respond(ex: HttpExchange, code: Int, payload: String): Unit = {
      val bytes = payload.getBytes(UTF_8)
      ex.sendResponseHeaders(code, bytes.length)
      val os = ex.getResponseBody
      try os.write(bytes) finally os.close()
    }
    server.createContext("/api/v1", (ex: HttpExchange) => {
      ex.getRequestBody.readAllBytes()
      respond(ex, 410, """{"error":"Gone: v1 API is removed, use /api/v2"}""")
    })
    server.createContext("/api/v2/heartbeat", (ex: HttpExchange) => {
      ex.getRequestBody.readAllBytes()
      respond(ex, 200, """{"nanosecond heartbeat":1}""")
    })
    server.createContext("/api/v2/tenants", (ex: HttpExchange) => {
      val path = ex.getRequestURI.getPath
      val payload = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      // only the canonical nested shape is answered — a malformed path
      // (e.g. the v1 query-param form against v2) must fail the test
      val okBase = path.startsWith("/api/v2/tenants/t1/databases/db1/collections")
      if (!okBase) respond(ex, 404, s"""{"error":"bad path $path"}""")
      else if (ex.getRequestMethod == "GET") {
        // must-exist resolution (deleteIds): only 'docs' exists
        if (path.endsWith("/collections/docs"))
          respond(ex, 200, """{"id":"v2-coll-id","name":"docs"}""")
        else respond(ex, 404, """{"error":"collection not found"}""")
      } else if (path.endsWith("/collections")) {
        recorded.add(("create", payload))
        respond(ex, 200, """{"id":"v2-coll-id","name":"docs"}""")
      } else {
        val verb = path.substring(path.lastIndexOf('/') + 1)
        if (!path.contains("/collections/v2-coll-id/"))
          respond(ex, 404, """{"error":"unknown collection"}""")
        else { recorded.add((verb, payload)); respond(ex, 201, "true") }
      }
    })
    server.setExecutor(null)
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}", recorded)
    finally server.stop(0)
  }

  test("auto-negotiation: a v2 server is detected and spoken through the nested path") {
    withFakeChromaV2 { (url, recorded) =>
      val pushed = ChromaRestSink.add(frame(6).coalesce(1), url, "docs",
        tenant = "t1", database = "db1", batchSize = 4)
      assert(pushed == 6)
      val ops = recorded.toArray(Array.empty[(String, String)])
      assert(ops.head._1 == "create" && ops.head._2.contains("\"get_or_create\":true"))
      assert(ops.count(_._1 == "add") == 2) // 6 rows, batchSize 4
    }
  }

  test("explicit apiVersion=v1 against a v2-only server fails loudly with the 410") {
    withFakeChromaV2 { (url, _) =>
      val e = intercept[IllegalStateException] {
        ChromaRestSink.add(frame(2).coalesce(1), url, "docs",
          tenant = "t1", database = "db1", apiVersion = "v1")
      }
      assert(e.getMessage.contains("410"))
    }
  }

  test("upsert posts the add payload shape to /upsert (idempotent refresh verb)") {
    withFakeChromaV2 { (url, recorded) =>
      val pushed = ChromaRestSink.upsert(frame(5).coalesce(1), url, "docs",
        tenant = "t1", database = "db1")
      assert(pushed == 5)
      val ups = recorded.toArray(Array.empty[(String, String)]).filter(_._1 == "upsert")
      assert(ups.length == 1)
      assert(ups.head._2.contains("\"ids\":[") &&
        ups.head._2.contains("\"embeddings\":[["))
    }
  }

  test("deleteIds posts id-only batches to /delete; null ids fail loudly") {
    withFakeChromaV2 { (url, recorded) =>
      val pushed = ChromaRestSink.deleteIds(
        frame(7).select(col("id")).coalesce(1), url, "docs",
        tenant = "t1", database = "db1", batchSize = 3)
      assert(pushed == 7)
      val dels = recorded.toArray(Array.empty[(String, String)]).filter(_._1 == "delete")
      assert(dels.length == 3) // 7 ids, batchSize 3
      dels.foreach { case (_, b) =>
        assert(b.startsWith("{\"ids\":[") && !b.contains("embeddings"))
      }
      val withNull = spark.range(2).select(
        when(col("id") === 0, lit(null)).otherwise(col("id"))
          .cast("string").as("id"))
      intercept[org.apache.spark.SparkException] {
        ChromaRestSink.deleteIds(withNull.coalesce(1), url, "docs",
          tenant = "t1", database = "db1")
      }
    }
  }

  test("deleteIds against a missing collection fails loudly and never creates one") {
    withFakeChromaV2 { (url, recorded) =>
      val e = intercept[NoSuchElementException] {
        ChromaRestSink.deleteIds(frame(3).select(col("id")).coalesce(1),
          url, "docs-typo", tenant = "t1", database = "db1")
      }
      assert(e.getMessage.contains("docs-typo") && e.getMessage.contains("does not exist"))
      val ops = recorded.toArray(Array.empty[(String, String)])
      assert(!ops.exists(_._1 == "create"),
        "a delete-side resolution must never get-or-create")
      assert(!ops.exists(_._1 == "delete"), "no delete batch may be posted")
    }
  }

  test("a transient 5xx heartbeat is never cached as a version verdict") {
    // a restarting v2 server briefly 503s its heartbeat: auto must
    // propagate, and once the server recovers the SAME baseUrl must
    // negotiate v2 — a cached 'v1' verdict would pin every later call
    // of this JVM to /api/v1 (410 against the recovered server)
    val healthy = new atomic.AtomicBoolean(false)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    def respond(ex: HttpExchange, code: Int, payload: String): Unit = {
      val bytes = payload.getBytes(UTF_8)
      ex.sendResponseHeaders(code, bytes.length)
      val os = ex.getResponseBody
      try os.write(bytes) finally os.close()
    }
    server.createContext("/api/v2/heartbeat", (ex: HttpExchange) => {
      ex.getRequestBody.readAllBytes()
      if (healthy.get()) respond(ex, 200, """{"nanosecond heartbeat":1}""")
      else respond(ex, 503, """{"error":"warming up"}""")
    })
    server.setExecutor(null); server.start()
    val url = s"http://127.0.0.1:${server.getAddress.getPort}"
    try {
      val e = intercept[java.io.IOException] {
        ChromaRestSink.resolveApiVersion(url, "auto", 5000)
      }
      assert(e.getMessage.contains("503"))
      healthy.set(true)
      assert(ChromaRestSink.resolveApiVersion(url, "auto", 5000) == "v2")
    } finally server.stop(0)
  }

  test("a v1-only server keeps negotiating to the v1 leg (back-compat intact)") {
    withFakeChroma() { (url, adds) =>
      // no /api/v2/heartbeat on the fake → probe 404s → v1 chosen
      val pushed = ChromaRestSink.add(frame(3).coalesce(1), url, "docs")
      assert(pushed == 3 && adds.size() == 1)
    }
  }

  test("streaming foreachBatch form pushes each microbatch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    withFakeChroma() { (url, adds) =>
      implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
      import spark.implicits._
      val mem = MemoryStream[(String, String)]
      val q = mem.toDF().toDF("id", "document").writeStream
        .outputMode("append")
        .option("checkpointLocation", tmpDir("chroma-rest-ckpt"))
        .trigger(Trigger.ProcessingTime(0L))
        .foreachBatch(ChromaRestSink.foreachBatchAdd(url, "docs"))
        .start()
      try {
        mem.addData(("1", "a"), ("2", "b"))
        q.processAllAvailable()
        mem.addData(("3", "c"))
        q.processAllAvailable()
      } finally q.stop()
      val all = adds.toArray(Array.empty[String]).mkString("\n")
      assert(Seq("\"1\"", "\"2\"", "\"3\"").forall(all.contains))
    }
  }
}
